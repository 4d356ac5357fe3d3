"""Print a checkpoint's embedded metadata and parameter inventory.

Usage: python tools/inspect_checkpoint.py <checkpoint.bin>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from flax import serialization

from gesture_generation_from_trimodal_context_tpu.train import checkpoint as ckpt_lib
from gesture_generation_from_trimodal_context_tpu.models import factory


def main():
    path = sys.argv[1]
    ckpt = ckpt_lib.load_checkpoint(path)
    args = ckpt["args"]
    print("model:        ", args.model)
    print("epoch:        ", ckpt["epoch"])
    print("pose_dim:     ", ckpt["pose_dim"])
    lang = ckpt["lang_model"]
    print("vocab:        ", getattr(lang, "n_words", None))
    spk = ckpt["speaker_model"]
    print("speakers:     ", getattr(spk, "n_words", spk))
    print("has dis vars: ", len(ckpt["dis_vars_bytes"]) > 0)
    print("has opt state:", len(ckpt["gen_opt_bytes"]) > 0)

    import jax
    bundle = factory.init_model(args, lang, spk, ckpt["pose_dim"])
    template = factory.generator_init_variables(bundle, args,
                                                jax.random.PRNGKey(0), 1)
    gen_vars = serialization.from_bytes(template, ckpt["gen_vars_bytes"])
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(gen_vars["params"]))
    print("gen params:   ", "{:,}".format(n_params))
    print("top-level scopes:")
    for name, sub in gen_vars["params"].items():
        n = sum(int(np.prod(x.shape))
                for x in jax.tree_util.tree_leaves(sub))
        print("  %-28s %12s" % (name, "{:,}".format(n)))


if __name__ == "__main__":
    main()
