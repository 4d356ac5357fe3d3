"""Async checkpoint writer: snapshot isolation, equivalence, failure
propagation (train/async_ckpt.py).

The writer exists because synchronous saves measured ~6-9 s/epoch on the
TED-scale recipe (device->host of the full state + 90 MB encode+write);
correctness contract: a snapshot taken before a donating train step must
be unaffected by the donation, the written file must be byte-identical
to a synchronous save of the same state, and worker failures must
surface instead of silently dropping checkpoints.
"""

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gesture_generation_from_trimodal_context_tpu.train import async_ckpt
from gesture_generation_from_trimodal_context_tpu.train import (
    checkpoint as ckpt_lib)


def test_snapshot_survives_donation():
    """Donating the original buffers must not disturb the snapshot."""
    tree = {"a": jnp.arange(8, dtype=jnp.float32),
            "b": {"c": jnp.ones((4, 4), jnp.float32)}}
    expect = jax.device_get(tree)
    snap = async_ckpt.snapshot_device_tree(tree)

    @jax.jit
    def clobber(t):
        return jax.tree.map(lambda x: x * -999.0 + 3.0, t)

    donating = jax.jit(lambda t: clobber(t), donate_argnums=(0,))
    _ = donating(tree)  # original buffers now aliased/overwritten
    got = jax.device_get(snap)
    np.testing.assert_array_equal(got["a"], expect["a"])
    np.testing.assert_array_equal(got["b"]["c"], expect["b"]["c"])


def test_async_write_matches_sync(tmp_path):
    """The worker-written file equals a synchronous save_checkpoint."""
    class _Args:
        pass
    # save_checkpoint pickles args via args_to_dict; use the real parser
    from gesture_generation_from_trimodal_context_tpu.config import (
        parse_args_mod as parse_args)
    args = parse_args.parse_args(["--config",
                                  str(_find_config("multimodal_context"))])
    gen_vars = {"params": {"w": jnp.arange(6, dtype=jnp.float32)},
                "batch_stats": {}}
    host = {"args": args, "epoch": 3, "lang_model": None,
            "speaker_model": None, "pose_dim": 27}

    sync_path = tmp_path / "sync.bin"
    state = dict(host)
    state.update({"gen_vars": jax.device_get(gen_vars), "dis_vars": None,
                  "gen_opt": None, "dis_opt": None})
    ckpt_lib.save_checkpoint(state, str(sync_path))

    w = async_ckpt.AsyncCheckpointWriter()
    snap = async_ckpt.snapshot_device_tree(
        {"gen_vars": gen_vars, "dis_vars": None,
         "gen_opt": None, "dis_opt": None})
    async_path = tmp_path / "async.bin"
    w.submit(ckpt_lib.save_checkpoint, snap, host, str(async_path))
    w.close()

    assert async_path.read_bytes() == sync_path.read_bytes()
    # and it loads
    ck = ckpt_lib.load_checkpoint(str(async_path))
    assert ck["epoch"] == 3 and ck["pose_dim"] == 27


def test_writer_error_propagates(tmp_path):
    w = async_ckpt.AsyncCheckpointWriter()

    def boom(state, filename):
        raise IOError("disk full")

    w.submit(boom, {}, {}, str(tmp_path / "x.bin"))
    with pytest.raises(RuntimeError, match="checkpoint writer failed"):
        w.drain()
    # writer is reusable after the error is surfaced
    ok = tmp_path / "ok.bin"
    w.submit(lambda s, f: open(f, "wb").write(b"hi"), {}, {}, str(ok))
    w.close()
    assert ok.read_bytes() == b"hi"


def test_atomic_write_no_tmp_left(tmp_path):
    """save_checkpoint goes through tmp+rename and cleans up."""
    from gesture_generation_from_trimodal_context_tpu.config import (
        parse_args_mod as parse_args)
    args = parse_args.parse_args(["--config",
                                  str(_find_config("multimodal_context"))])
    path = tmp_path / "ck.bin"
    ckpt_lib.save_checkpoint(
        {"args": args, "epoch": 0, "lang_model": None,
         "speaker_model": None, "pose_dim": 27,
         "gen_vars": {"params": {}, "batch_stats": {}},
         "dis_vars": None, "gen_opt": None, "dis_opt": None}, str(path))
    assert path.exists()
    assert not (tmp_path / "ck.bin.tmp").exists()


def _find_config(name):
    import pathlib
    root = pathlib.Path(__file__).resolve().parents[1]
    for cand in (root / "config" / f"{name}.yml",
                 root / "gesture_generation_from_trimodal_context_tpu"
                 / "config" / f"{name}.yml"):
        if cand.exists():
            return cand
    raise FileNotFoundError(name)
