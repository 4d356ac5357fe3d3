#!/usr/bin/env python
"""Convert a reference PyTorch checkpoint (.bin, torch.save format —
reference scripts/utils/train_utils.py:147-149) into this framework's
msgpack checkpoint.

Usage:
    python tools/import_torch_checkpoint.py <torch_ckpt.bin> <out.msgpack>

Works on the released multimodal_context generator checkpoints and the
train_h36m_gesture_autoencoder FGD net (and the seq2seq / speech2gesture /
joint_embed baselines).  Note that synthesize.py / eval_net_path also
accept the torch .bin directly — they auto-detect and convert in memory;
this tool just persists the conversion.
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    logging.basicConfig(level=logging.INFO)
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("torch_ckpt")
    ap.add_argument("out_path")
    ns = ap.parse_args()

    from gesture_generation_from_trimodal_context_tpu.interop import (
        torch_import)
    torch_import.import_checkpoint(ns.torch_ckpt, ns.out_path)
    print("wrote", ns.out_path)


if __name__ == "__main__":
    main()
