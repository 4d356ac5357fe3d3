"""--eval_full_set: evaluate the final partial validation batch instead
of dropping it.

The reference's eval DataLoader uses drop_last=True (reference
scripts/train.py:219-224), so up to batch_size-1 tail samples are
excluded from val loss / FGD every epoch.  With --eval_full_set the tail
runs at its natural (smaller) batch shape on a single-device mesh — exact
math, one extra jit specialization — or padded + masked on a multi-device
one (train/loops.py evaluate_testset, train/eval_steps.py mask support).
"""

from types import SimpleNamespace

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gesture_generation_from_trimodal_context_tpu.data.dataset import (
    BatchIterator)
from gesture_generation_from_trimodal_context_tpu.models import factory
from gesture_generation_from_trimodal_context_tpu.parallel import (
    mesh as mesh_lib)
from gesture_generation_from_trimodal_context_tpu.train import resident
from gesture_generation_from_trimodal_context_tpu.train.eval_steps import (
    make_eval_step)
from gesture_generation_from_trimodal_context_tpu.train.loops import (
    evaluate_testset)


class _IdxDataset:
    """make_batch returns each sample's global index as its value."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def make_batch(self, idx):
        return {"target_vec": np.asarray(idx, np.float32)[:, None]}


# ---------------------------------------------------------------- host


@pytest.mark.parametrize("kw", [dict(prefetch=0), dict(prefetch=2),
                                dict(prefetch=2, workers=2)])
def test_batch_iterator_tail(kw):
    """All three iteration paths (inline, prefetch thread, worker pool)
    yield the tail batch exactly once, at its natural size."""
    it = BatchIterator(_IdxDataset(10), 4, shuffle=False,
                       include_tail=True, **kw)
    batches = list(it)
    assert [b["target_vec"].shape[0] for b in batches] == [4, 4, 2]
    seen = np.concatenate([b["target_vec"][:, 0] for b in batches])
    assert sorted(seen.tolist()) == [float(i) for i in range(10)]


def test_batch_iterator_drop_last_default():
    it = BatchIterator(_IdxDataset(10), 4, shuffle=False, prefetch=0)
    assert [b["target_vec"].shape[0] for b in it] == [4, 4]


def test_batch_iterator_tail_no_remainder():
    it = BatchIterator(_IdxDataset(8), 4, shuffle=False, prefetch=0,
                       include_tail=True)
    assert [b["target_vec"].shape[0] for b in it] == [4, 4]


# ------------------------------------------------------------ resident


def test_resident_tail_single_device():
    rows = np.arange(10 * 4, dtype=np.float32).reshape(10, 4)
    data = {"target_vec": jax.device_put(rows)}
    it = resident.ResidentBatchIterator(data, 10, 4, include_tail=True)
    batches = list(it)
    assert [b["target_vec"].shape[0] for b in batches] == [4, 4, 2]
    assert all("__mask__" not in b for b in batches)
    got = np.concatenate([np.asarray(b["target_vec"]) for b in batches])
    np.testing.assert_array_equal(got, rows)


def test_resident_tail_multi_device():
    """13 samples round-robin sharded over 8 devices, batch 8: the tail
    (rows 8..12, fewer rows than devices) comes back device-block
    permuted with a __mask__ flagging exactly the 5 real rows."""
    mesh = mesh_lib.get_mesh(8)
    n = 13
    rows = (np.arange(n, dtype=np.float32)[:, None]
            * np.ones((1, 8), np.float32))
    data, _ = resident.shard_host_data({"target_vec": rows}, mesh=mesh)
    it = resident.ResidentBatchIterator(data, n, 8, mesh=mesh,
                                        include_tail=True)
    batches = list(it)
    assert len(batches) == 2
    np.testing.assert_array_equal(
        np.asarray(batches[0]["target_vec"])[:, 0],
        np.arange(8, dtype=np.float32))
    tail = dict(batches[1])
    mask = np.asarray(tail.pop("__mask__"))
    vals = np.asarray(tail["target_vec"])[:, 0]
    assert sorted(vals[mask > 0.5].tolist()) == [8.0, 9.0, 10.0, 11.0, 12.0]
    # every padded row duplicates a resident row (never uninitialized)
    assert set(vals[mask < 0.5].tolist()) <= set(range(n))


def test_resident_tail_absent_without_flag():
    rows = np.zeros((10, 4), np.float32)
    it = resident.ResidentBatchIterator(
        {"target_vec": jax.device_put(rows)}, 10, 4)
    assert [b["target_vec"].shape[0] for b in it] == [4, 4]


# ----------------------------------------------- evaluate_testset math


def _stub_eval_step(gen_vars, batch, vids, rng, mask=None):
    t = batch["target_vec"]
    per = jnp.mean(t.reshape(t.shape[0], -1), axis=1)
    loss = jnp.mean(per) if mask is None else \
        jnp.sum(per * mask) / jnp.sum(mask)
    return loss, t, loss, loss, jnp.float32(jnp.nan)


def _run_eval(loader, mesh):
    bundle = SimpleNamespace(model_name="multimodal_context")
    return evaluate_testset(loader, {}, _stub_eval_step, bundle,
                            SimpleNamespace(), None, None, mesh,
                            np.random.RandomState(0), jax.random.PRNGKey(0))


def test_evaluate_testset_full_set_single_device():
    """Sample values are their indices, so full-set loss == mean(0..9)."""
    loader = BatchIterator(_IdxDataset(10), 4, shuffle=False, prefetch=0,
                           include_tail=True)
    ret = _run_eval(loader, mesh_lib.get_mesh(1))
    assert ret["loss"] == pytest.approx(4.5, abs=1e-6)


def test_evaluate_testset_drop_last_matches_reference():
    loader = BatchIterator(_IdxDataset(10), 4, shuffle=False, prefetch=0)
    ret = _run_eval(loader, mesh_lib.get_mesh(1))
    # reference semantics: first 8 samples only -> mean(0..7)
    assert ret["loss"] == pytest.approx(3.5, abs=1e-6)


def test_evaluate_testset_full_set_multi_device():
    """A 2-row tail on an 8-device mesh is padded to 8 and masked; the
    weighted average still equals the exact full-set mean."""
    loader = BatchIterator(_IdxDataset(10), 8, shuffle=False, prefetch=0,
                           include_tail=True)
    ret = _run_eval(loader, mesh_lib.get_mesh(8))
    assert ret["loss"] == pytest.approx(4.5, abs=1e-6)


# ------------------------------------------------- FGD trainer driver


def test_fgd_trainer_eval_full_set():
    """scripts/train_feature_extractor.evaluate_testset honors
    --eval_full_set with a natural-size tail batch."""
    import scripts.train_feature_extractor as fx

    ds = _IdxDataset(10)

    def eval_step(params, stats, batch, rng):
        return jnp.mean(batch["target_vec"]), None

    gen_vars = {"params": {}, "batch_stats": {}}
    full = fx.evaluate_testset(ds, eval_step, gen_vars, 4, full_set=True)
    assert full["loss"] == pytest.approx(4.5, abs=1e-6)
    ref = fx.evaluate_testset(ds, eval_step, gen_vars, 4)
    assert ref["loss"] == pytest.approx(3.5, abs=1e-6)


# --------------------------------------------- real eval_step, masked


def test_eval_step_mask_matches_natural_size():
    """Padded+masked tail == the same rows evaluated at natural size
    (the two --eval_full_set execution paths agree on a real model)."""
    args = SimpleNamespace(
        model="gesture_autoencoder", n_poses=34, n_pre_poses=4,
        motion_resampling_framerate=15, hidden_size=32, n_layers=2,
        dropout_prob=0.3, input_context="both", z_type="speaker",
        wordembed_dim=16, freeze_wordembed=False, learning_rate=5e-4,
        discriminator_lr_weight=0.2, loss_regression_weight=500.0,
        loss_gan_weight=5.0, loss_kld_weight=0.1, loss_reg_weight=0.05,
        loss_warmup=10, GAN_noise_size=0)
    bundle = factory.init_model(args, None, None, 27)
    gvars = factory.generator_init_variables(bundle, args,
                                             jax.random.PRNGKey(0), 8)
    step = make_eval_step(bundle, args, np.zeros(27, np.float32))
    rng = jax.random.PRNGKey(7)
    target = 0.1 * np.random.RandomState(0).randn(6, 34, 27)
    target = target.astype(np.float32)
    padded = np.concatenate([target, np.repeat(target[-1:], 2, axis=0)])
    mask = np.array([1.0] * 6 + [0.0] * 2, np.float32)

    loss_m, out_m, mae_m, acc_m, _ = step(
        gvars, {"target_vec": jnp.asarray(padded)}, None, rng,
        jnp.asarray(mask))
    loss_n, out_n, mae_n, acc_n, _ = step(
        gvars, {"target_vec": jnp.asarray(target)}, None, rng)

    np.testing.assert_allclose(float(loss_m), float(loss_n), rtol=1e-5)
    np.testing.assert_allclose(float(mae_m), float(mae_n), rtol=1e-5)
    np.testing.assert_allclose(float(acc_m), float(acc_n), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_m)[:6], np.asarray(out_n),
                               rtol=1e-5, atol=1e-6)
