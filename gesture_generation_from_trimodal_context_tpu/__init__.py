"""TPU-native gesture-generation framework.

A from-scratch JAX/XLA/Pallas rebuild of the trimodal speech-gesture
generation system ("Speech Gesture Generation from the Trimodal Context of
Text, Audio, and Speaker Identity", SIGGRAPH Asia 2020).  The reference
implementation (PyTorch, /root/reference) defines the behavioral contract;
every module here is a TPU-first redesign, not a port:

- compute path: flax.linen modules, GRUs as fused-projection ``lax.scan``
  (optionally Pallas-fused), all train steps jitted end-to-end (D+G updates
  in one compiled step),
- parallelism: data parallelism over a ``jax.sharding.Mesh`` (ICI
  collectives inserted by XLA), replacing the reference's
  ``torch.nn.DataParallel`` (reference scripts/train.py:93-96),
- data path: fixed-shape memory-mapped record store with a C++ gather
  kernel, replacing LMDB + legacy pyarrow,
- checkpoints: self-describing msgpack blobs (args + vocabs + params),
  mirroring the reference's self-describing torch.save checkpoints
  (reference scripts/utils/train_utils.py:147-183).
"""

__version__ = "0.1.0"
