#!/usr/bin/env python
"""Convert one of this framework's msgpack checkpoints into a reference
PyTorch checkpoint (torch.save format, reference
scripts/utils/train_utils.py:147-149).

Usage:
    python tools/export_torch_checkpoint.py <our_ckpt.bin> <out_torch.bin>

The exported blob loads in the reference environment unchanged
(``load_state_dict(strict=True)`` on its torch modules, vocabs pickled
under ``model.vocab.Vocab``), so a model trained here can be rendered
and evaluated with the reference toolchain — including its Blender rig.
The inverse of tools/import_torch_checkpoint.py; the export self-checks
by converting its output back and comparing bit-for-bit.
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    logging.basicConfig(level=logging.INFO)
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("our_ckpt")
    ap.add_argument("out_path")
    ns = ap.parse_args()

    from gesture_generation_from_trimodal_context_tpu.interop import (
        torch_export)
    torch_export.export_checkpoint(ns.our_ckpt, ns.out_path)
    print("wrote", ns.out_path)


if __name__ == "__main__":
    main()
