"""Gesture synthesis server.

Usage: python scripts/serve.py <checkpoint.bin> [port]

Loads the checkpoint, compiles the synthesis window step once, then
serves POST /synthesize and GET /healthz (see synthesis/server.py).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gesture_generation_from_trimodal_context_tpu.synthesis.server import main
from gesture_generation_from_trimodal_context_tpu.utils import (
    compile_cache, platforms)
from gesture_generation_from_trimodal_context_tpu.utils.logging_utils import (
    set_logger)

if __name__ == "__main__":
    set_logger()
    compile_cache.enable()  # warm restarts skip the window-step compile
    platforms.enable_host_cpu()  # eager init runs locally, not tunneled
    main(sys.argv)
