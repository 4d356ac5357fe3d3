"""Train-step tests: each jitted step runs, updates parameters, and (for
the autoencoder) reduces its loss on a fixed batch."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from types import SimpleNamespace

from gesture_generation_from_trimodal_context_tpu.models import factory
from gesture_generation_from_trimodal_context_tpu.train import state as state_lib
from gesture_generation_from_trimodal_context_tpu.train.gan import make_gan_train_step
from gesture_generation_from_trimodal_context_tpu.train.embed import (
    make_embed_train_step, make_embed_eval_step)
from gesture_generation_from_trimodal_context_tpu.train.seq2seq_step import (
    make_seq2seq_train_step)
from gesture_generation_from_trimodal_context_tpu.train.s2g import make_s2g_train_step
from gesture_generation_from_trimodal_context_tpu.data.vocab import Vocab


def tiny_args(**over):
    d = dict(model="multimodal_context", n_poses=34, n_pre_poses=4,
             motion_resampling_framerate=15, hidden_size=32, n_layers=2,
             dropout_prob=0.3, input_context="both", z_type="speaker",
             wordembed_dim=16, freeze_wordembed=False, learning_rate=5e-4,
             discriminator_lr_weight=0.2, loss_regression_weight=500.0,
             loss_gan_weight=5.0, loss_kld_weight=0.1, loss_reg_weight=0.05,
             loss_warmup=10, GAN_noise_size=0)
    d.update(over)
    return SimpleNamespace(**d)


def tiny_vocab(n=30):
    v = Vocab("words")
    for i in range(n - 4):
        v.index_word("w%d" % i)
    return v


def tiny_speakers(n=6):
    v = Vocab("vid", insert_default_tokens=False)
    for i in range(n - 1):
        v.index_word("vid%d" % i)
    return v


def make_batch(rng, b=4, n=34, pose_dim=27, audio_len=36267, n_words=30,
               n_speakers=6, word_len=9, spec_len=70):
    return {
        "in_text": jnp.asarray(rng.randint(0, n_words, (b, n)), jnp.int32),
        "in_audio": jnp.asarray(rng.randn(b, audio_len), jnp.float32),
        "target_vec": jnp.asarray(0.1 * rng.randn(b, n, pose_dim),
                                  jnp.float32),
        "vid_indices": jnp.asarray(rng.randint(0, n_speakers, (b,)),
                                   jnp.int32),
        "word_seq": jnp.asarray(rng.randint(0, n_words, (b, word_len)),
                                jnp.int32),
        "word_lengths": jnp.asarray([word_len] * b, jnp.int32),
        "in_spec": jnp.asarray(rng.randn(b, 128, spec_len), jnp.float32),
    }


def param_l2_delta(a, b):
    leaves_a = jax.tree_util.tree_leaves(a)
    leaves_b = jax.tree_util.tree_leaves(b)
    return sum(float(jnp.sum((x - y) ** 2)) for x, y in zip(leaves_a, leaves_b))


def test_gan_train_step(rng):
    args = tiny_args()
    bundle = factory.init_model(args, tiny_vocab(), tiny_speakers(), 27)
    key = jax.random.PRNGKey(0)
    gvars = factory.generator_init_variables(bundle, args, key, batch_size=4)
    dvars = factory.discriminator_init_variables(bundle, args, key,
                                                 batch_size=4)
    step, gen_tx, dis_tx = make_gan_train_step(bundle, args)
    gen_state = state_lib.make_net_state(gvars, gen_tx)
    dis_state = state_lib.make_net_state(dvars, dis_tx)
    batch = make_batch(rng)

    g0 = jax.tree_util.tree_map(lambda x: x.copy(), gen_state.params)
    d0 = jax.tree_util.tree_map(lambda x: x.copy(), dis_state.params)

    # warmup epoch: no D update, no GAN term
    gen_state, dis_state, m = step(gen_state, dis_state, batch,
                                   jax.random.PRNGKey(1), train_d=False,
                                   add_gan=False)
    assert np.isfinite(float(m["loss"]))
    assert "dis" not in m and "gen" not in m
    assert "KLD" in m and "DIV_REG" in m
    assert param_l2_delta(g0, gen_state.params) > 0
    assert param_l2_delta(d0, dis_state.params) == 0  # D untouched in warmup

    # steady state: D + GAN
    gen_state, dis_state, m = step(gen_state, dis_state, batch,
                                   jax.random.PRNGKey(2), train_d=True,
                                   add_gan=True)
    assert np.isfinite(float(m["dis"])) and np.isfinite(float(m["gen"]))
    assert param_l2_delta(d0, dis_state.params) > 0


@pytest.mark.parametrize("mode", ["faithful", "fused", "fold"])
def test_noisy_target_d_step(rng, mode):
    """--use_noisy_target (the reference's implemented-but-hard-disabled
    N(0, 0.1) D-input noise, train_gan.py:8-10,17): enabling it perturbs
    ONLY the D loss — the G-step losses see clean inputs, like the
    reference — in every step variant."""
    import copy

    def run(noisy):
        args = tiny_args(z_type="none", dropout_prob=0.0, loss_warmup=0,
                         use_noisy_target=noisy,
                         fused_gen_forwards=(mode == "fused"),
                         fold_all_forwards=(mode == "fold"))
        bundle = factory.init_model(args, tiny_vocab(), None, 27)
        key = jax.random.PRNGKey(7)
        gvars = factory.generator_init_variables(bundle, args, key, 2)
        dvars = factory.discriminator_init_variables(bundle, args, key, 2)
        step, gen_tx, dis_tx = make_gan_train_step(bundle, args)
        gen_state = state_lib.make_net_state(copy.deepcopy(gvars), gen_tx)
        dis_state = state_lib.make_net_state(copy.deepcopy(dvars), dis_tx)
        batch = {k: make_batch(rng_)[k]
                 for k in ("in_text", "in_audio", "target_vec")}
        _, _, m = step(gen_state, dis_state, batch, jax.random.PRNGKey(13),
                       train_d=True, add_gan=True)
        return {k: float(v) for k, v in m.items()}

    rng_ = np.random.RandomState(3)
    clean = run(False)
    rng_ = np.random.RandomState(3)
    noisy = run(True)
    assert all(np.isfinite(v) for v in noisy.values())
    assert abs(clean["dis"] - noisy["dis"]) > 1e-7
    # G-step metrics are computed from clean inputs in both cases
    np.testing.assert_allclose(clean["loss"], noisy["loss"], rtol=1e-6)


def test_autoencoder_loss_decreases(rng):
    args = tiny_args(model="gesture_autoencoder", learning_rate=1e-3)
    bundle = factory.init_model(args, None, None, 27)
    key = jax.random.PRNGKey(0)
    gvars = factory.generator_init_variables(bundle, args, key, batch_size=4)
    step, tx = make_embed_train_step(bundle, args)
    st = state_lib.make_net_state(gvars, tx)
    batch = {"target_vec": jnp.asarray(0.1 * rng.randn(4, 34, 27),
                                       jnp.float32)}
    losses = []
    for i in range(30):
        st, m = step(st, batch, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.8, losses[:3] + losses[-3:]


def test_embed_eval_step(rng):
    args = tiny_args(model="gesture_autoencoder")
    bundle = factory.init_model(args, None, None, 27)
    gvars = factory.generator_init_variables(bundle, args,
                                             jax.random.PRNGKey(0), 4)
    eval_step = make_embed_eval_step(bundle)
    batch = {"target_vec": jnp.asarray(0.1 * rng.randn(4, 34, 27),
                                       jnp.float32)}
    loss, recon = eval_step(gvars["params"], gvars.get("batch_stats", {}),
                            batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert recon.shape == (4, 34, 27)


def test_joint_embed_train_step(rng):
    args = tiny_args(model="joint_embedding")
    bundle = factory.init_model(args, tiny_vocab(), None, 27)
    gvars = factory.generator_init_variables(bundle, args,
                                             jax.random.PRNGKey(0), 4)
    step, tx = make_embed_train_step(bundle, args, mode="random")
    st = state_lib.make_net_state(gvars, tx)
    batch = make_batch(rng)
    st, m = step(st, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))


def test_seq2seq_train_step(rng):
    args = tiny_args(model="seq2seq", hidden_size=32, n_layers=2,
                     dropout_prob=0.1, loss_regression_weight=250.0,
                     loss_kld_weight=0.1, loss_reg_weight=25.0)
    bundle = factory.init_model(args, tiny_vocab(), None, 27)
    gvars = factory.generator_init_variables(bundle, args,
                                             jax.random.PRNGKey(0), 4)
    step, tx = make_seq2seq_train_step(bundle, args)
    st = state_lib.make_net_state(gvars, tx)
    batch = make_batch(rng)
    p0 = jax.tree_util.tree_map(lambda x: x.copy(), st.params)
    st, m = step(st, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
    assert param_l2_delta(p0, st.params) > 0


def test_s2g_train_step(rng):
    args = tiny_args(model="speech2gesture", loss_regression_weight=100.0,
                     loss_gan_weight=10.0, learning_rate=1e-3)
    bundle = factory.init_model(args, None, None, 27)
    key = jax.random.PRNGKey(0)
    gvars = factory.generator_init_variables(bundle, args, key, 4)
    dvars = factory.discriminator_init_variables(bundle, args, key, 4)
    step, gen_tx, dis_tx = make_s2g_train_step(bundle, args)
    gen_state = state_lib.make_net_state(gvars, gen_tx)
    dis_state = state_lib.make_net_state(dvars, dis_tx)
    batch = make_batch(rng)
    gen_state, dis_state, m = step(gen_state, dis_state, batch,
                                   jax.random.PRNGKey(1))
    for k in ("loss", "gen", "dis"):
        assert np.isfinite(float(m[k])), k


def test_fused_gan_step_matches_faithful_exactly():
    """--fused_gen_forwards AND --fold_all_forwards: with z_type='none'
    and dropout off the generator forward is deterministic, so losses,
    updated params, and the BN running-stat chains of both batched
    variants must match the faithful step (up to float-op reordering of
    the vmapped/batched matmuls; one Adam step amplifies ulp noise, hence
    the param tolerance)."""
    import copy
    from types import SimpleNamespace
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gesture_generation_from_trimodal_context_tpu.models import factory
    from gesture_generation_from_trimodal_context_tpu.train.gan import (
        make_gan_train_step)
    from gesture_generation_from_trimodal_context_tpu.train.state import (
        make_net_state)
    from gesture_generation_from_trimodal_context_tpu.data.vocab import Vocab

    lang = Vocab("w")
    for w in ("alpha", "beta", "gamma"):
        lang.index_word(w)

    def mk_args(mode):
        return SimpleNamespace(
            model="multimodal_context", n_poses=34, n_pre_poses=4,
            hidden_size=24, n_layers=2, dropout_prob=0.0,
            input_context="both", freeze_wordembed=False, wordembed_dim=16,
            motion_resampling_framerate=15, z_type="none",
            learning_rate=5e-4, discriminator_lr_weight=0.2,
            loss_regression_weight=500.0, loss_gan_weight=5.0,
            loss_kld_weight=0.1, loss_reg_weight=0.05, loss_warmup=0,
            fused_gen_forwards=(mode == "fused"),
            fold_all_forwards=(mode == "fold"))

    rng = np.random.RandomState(0)
    batch = {
        "in_text": jnp.asarray(rng.randint(0, lang.n_words, (4, 34)),
                               jnp.int32),
        "in_audio": jnp.asarray(0.1 * rng.randn(4, 36267), jnp.float32),
        "target_vec": jnp.asarray(0.1 * rng.randn(4, 34, 27), jnp.float32),
    }

    results = []
    for mode in ("faithful", "fused", "fold"):
        args = mk_args(mode)
        bundle = factory.init_model(args, lang, None, 27)
        gvars = factory.generator_init_variables(bundle, args,
                                                 jax.random.PRNGKey(7), 2)
        dvars = factory.discriminator_init_variables(bundle, args,
                                                     jax.random.PRNGKey(7), 2)
        step, gen_tx, dis_tx = make_gan_train_step(bundle, args)
        gen_state = make_net_state(copy.deepcopy(gvars), gen_tx)
        dis_state = make_net_state(copy.deepcopy(dvars), dis_tx)
        gen_state, dis_state, metrics = step(
            gen_state, dis_state, batch, jax.random.PRNGKey(13),
            train_d=True, add_gan=True)
        results.append((gen_state, dis_state, metrics))

    (g0, d0, m0) = results[0]
    for variant, (g1, d1, m1) in zip(("fused", "fold"), results[1:]):
        assert set(m0) == set(m1), variant
        for k in m0:
            np.testing.assert_allclose(
                np.asarray(m0[k]), np.asarray(m1[k]), rtol=3e-4, atol=1e-5,
                err_msg="%s/%s" % (variant, k))
        for name, atol, t0, t1 in (
                # one Adam step moves a weight by up to ~lr regardless of
                # gradient magnitude, so a low-bit gradient difference
                # (float-op reordering in the batched forward) can shift
                # single params by O(lr)=5e-4; tolerance = a few Adam quanta
                ("gen_params", 2e-3, g0.params, g1.params),
                ("gen_bn", 1e-4, g0.batch_stats, g1.batch_stats),
                ("dis_params", 2e-3, d0.params, d1.params),
                ("dis_bn", 1e-4, d0.batch_stats, d1.batch_stats)):
            jax.tree_util.tree_map(
                lambda a, b, _atol=atol, _n=name + "/" + variant:
                    np.testing.assert_allclose(
                        np.asarray(a), np.asarray(b), atol=_atol,
                        err_msg=_n),
                t0, t1)


def test_fused_gan_step_speaker_z_runs():
    """fused path with z_type='speaker': different RNG streams than the
    faithful path (documented), but must train with finite metrics and
    the same metric keys."""
    from types import SimpleNamespace
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gesture_generation_from_trimodal_context_tpu.models import factory
    from gesture_generation_from_trimodal_context_tpu.train.gan import (
        make_gan_train_step)
    from gesture_generation_from_trimodal_context_tpu.train.state import (
        make_net_state)
    from gesture_generation_from_trimodal_context_tpu.data.vocab import Vocab

    lang = Vocab("w")
    for w in ("alpha", "beta"):
        lang.index_word(w)
    spk = Vocab("v", insert_default_tokens=False)
    for i in range(4):
        spk.index_word("vid%d" % i)

    args = SimpleNamespace(
        model="multimodal_context", n_poses=34, n_pre_poses=4,
        hidden_size=24, n_layers=2, dropout_prob=0.3,
        input_context="both", freeze_wordembed=False, wordembed_dim=16,
        motion_resampling_framerate=15, z_type="speaker",
        learning_rate=5e-4, discriminator_lr_weight=0.2,
        loss_regression_weight=500.0, loss_gan_weight=5.0,
        loss_kld_weight=0.1, loss_reg_weight=0.05, loss_warmup=0,
        fused_gen_forwards=True, fold_all_forwards=False)
    bundle = factory.init_model(args, lang, spk, 27)
    gvars = factory.generator_init_variables(bundle, args,
                                             jax.random.PRNGKey(0), 2)
    dvars = factory.discriminator_init_variables(bundle, args,
                                                 jax.random.PRNGKey(0), 2)
    import copy
    gvars2, dvars2 = copy.deepcopy(gvars), copy.deepcopy(dvars)
    step, gen_tx, dis_tx = make_gan_train_step(bundle, args)
    gen_state = make_net_state(gvars, gen_tx)
    dis_state = make_net_state(dvars, dis_tx)

    rng = np.random.RandomState(1)
    batch = {
        "in_text": jnp.asarray(rng.randint(0, lang.n_words, (4, 34)),
                               jnp.int32),
        "in_audio": jnp.asarray(0.1 * rng.randn(4, 36267), jnp.float32),
        "target_vec": jnp.asarray(0.1 * rng.randn(4, 34, 27), jnp.float32),
        "vid_indices": jnp.asarray(rng.randint(0, 4, (4,)), jnp.int32),
    }
    gen_state, dis_state, metrics = step(gen_state, dis_state, batch,
                                         jax.random.PRNGKey(3),
                                         train_d=True, add_gan=True)
    assert {"loss", "gen", "dis", "KLD", "DIV_REG"} <= set(metrics)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k

    # folded variant (--fold_all_forwards) on the same speaker-z setup
    # (param copies snapshotted above: the first step donated its buffers)
    args.fold_all_forwards = True
    step2, gen_tx2, dis_tx2 = make_gan_train_step(bundle, args)
    gen_state2 = make_net_state(gvars2, gen_tx2)
    dis_state2 = make_net_state(dvars2, dis_tx2)
    gen_state2, dis_state2, metrics2 = step2(gen_state2, dis_state2, batch,
                                             jax.random.PRNGKey(3),
                                             train_d=True, add_gan=True)
    assert {"loss", "gen", "dis", "KLD", "DIV_REG"} <= set(metrics2)
    for k, v in metrics2.items():
        assert np.isfinite(float(v)), "fold/" + k


def test_resident_multi_step_matches_per_batch():
    """make_gan_resident_multi_step on (K,B) index stacks must reproduce
    the per-batch jit step exactly (same math, in-graph gather; int16
    audio decodes to the same values both ways)."""
    import copy
    from types import SimpleNamespace
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gesture_generation_from_trimodal_context_tpu.models import factory
    from gesture_generation_from_trimodal_context_tpu.train.gan import (
        make_gan_resident_multi_step, make_gan_train_step)
    from gesture_generation_from_trimodal_context_tpu.train.state import (
        make_net_state)
    from gesture_generation_from_trimodal_context_tpu.data.vocab import Vocab

    lang = Vocab("w")
    for w in ("alpha", "beta", "gamma"):
        lang.index_word(w)
    args = SimpleNamespace(
        model="multimodal_context", n_poses=34, n_pre_poses=4,
        hidden_size=24, n_layers=2, dropout_prob=0.0,
        input_context="both", freeze_wordembed=False, wordembed_dim=16,
        motion_resampling_framerate=15, z_type="none",
        learning_rate=5e-4, discriminator_lr_weight=0.2,
        loss_regression_weight=500.0, loss_gan_weight=5.0,
        loss_kld_weight=0.1, loss_reg_weight=0.05, loss_warmup=0,
        fused_gen_forwards=True)
    bundle = factory.init_model(args, lang, None, 27)
    gvars = factory.generator_init_variables(bundle, args,
                                             jax.random.PRNGKey(7), 2)
    dvars = factory.discriminator_init_variables(bundle, args,
                                                 jax.random.PRNGKey(7), 2)

    rng = np.random.RandomState(0)
    N, B, K = 10, 4, 2
    audio_f32 = (0.1 * rng.randn(N, 36267)).astype(np.float32)
    audio_i16 = np.rint(np.clip(audio_f32 * 32767.0, -32767.0,
                                32767.0)).astype(np.int16)
    data = {
        "in_text": jnp.asarray(rng.randint(0, lang.n_words, (N, 34)),
                               jnp.int32),
        "in_audio": jnp.asarray(audio_i16),
        "target_vec": jnp.asarray(0.1 * rng.randn(N, 34, 27), jnp.float32),
    }
    idx_stack = np.asarray([[0, 3, 5, 9], [2, 4, 6, 8]], np.int32)

    # resident fused path
    res_step, gen_tx, dis_tx = make_gan_resident_multi_step(bundle, args, K)
    g1 = make_net_state(copy.deepcopy(gvars), gen_tx)
    d1 = make_net_state(copy.deepcopy(dvars), dis_tx)
    root = jax.random.PRNGKey(13)
    g1, d1, m1 = res_step(g1, d1, data, idx_stack, root,
                          train_d=True, add_gan=True)

    # per-batch path on the identical gathered host batches
    step, gen_tx2, dis_tx2 = make_gan_train_step(bundle, args)
    g2 = make_net_state(copy.deepcopy(gvars), gen_tx2)
    d2 = make_net_state(copy.deepcopy(dvars), dis_tx2)
    host = jax.device_get(data)
    for k in range(K):
        idx = idx_stack[k]
        batch = {key: jnp.asarray(v[idx]) for key, v in host.items()}
        g2, d2, mk = step(g2, d2, batch, jax.random.fold_in(root, k),
                          train_d=True, add_gan=True)
    # deterministic forward (z_type none, dropout 0).  Tolerances: one
    # Adam step moves a weight by up to ~lr regardless of gradient
    # magnitude, so low-bit float-reorder diffs (scan+gather fusion vs
    # standalone jit) shift params by O(lr)=5e-4 per step — same bound
    # as test_fused_gan_step_matches_faithful_exactly.
    for name, atol, t1, t2 in (("gen", 4e-3, g1.params, g2.params),
                               ("dis", 4e-3, d1.params, d2.params),
                               ("gen_bn", 1e-3, g1.batch_stats,
                                g2.batch_stats)):
        jax.tree_util.tree_map(
            lambda a, b, _n=name, _atol=atol: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=_atol, err_msg=_n),
            t1, t2)
    np.testing.assert_allclose(np.asarray(m1["loss"][-1]),
                               np.asarray(mk["loss"]), rtol=1e-3)


def test_resident_sharded_multi_step_matches_per_batch():
    """Round-robin sharded resident data on the 8-virtual-device mesh
    (train/resident.py shard_host_data + the shard_map'd gather in
    make_gan_resident_multi_step) must reproduce the per-batch jit step
    on the equivalent global batches assembled in device-block order."""
    import copy
    from types import SimpleNamespace
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gesture_generation_from_trimodal_context_tpu.models import factory
    from gesture_generation_from_trimodal_context_tpu.parallel import (
        mesh as mesh_lib)
    from gesture_generation_from_trimodal_context_tpu.train import resident
    from gesture_generation_from_trimodal_context_tpu.train.gan import (
        make_gan_resident_multi_step, make_gan_train_step)
    from gesture_generation_from_trimodal_context_tpu.train.state import (
        make_net_state)
    from gesture_generation_from_trimodal_context_tpu.data.vocab import Vocab

    lang = Vocab("w")
    for w in ("alpha", "beta", "gamma"):
        lang.index_word(w)
    args = SimpleNamespace(
        model="multimodal_context", n_poses=34, n_pre_poses=4,
        hidden_size=24, n_layers=2, dropout_prob=0.0,
        input_context="both", freeze_wordembed=False, wordembed_dim=16,
        motion_resampling_framerate=15, z_type="none",
        learning_rate=5e-4, discriminator_lr_weight=0.2,
        loss_regression_weight=500.0, loss_gan_weight=5.0,
        loss_kld_weight=0.1, loss_reg_weight=0.05, loss_warmup=0,
        fused_gen_forwards=True)
    bundle = factory.init_model(args, lang, None, 27)
    gvars = factory.generator_init_variables(bundle, args,
                                             jax.random.PRNGKey(7), 2)
    dvars = factory.discriminator_init_variables(bundle, args,
                                                 jax.random.PRNGKey(7), 2)

    rng = np.random.RandomState(0)
    DP, N, B, K = 8, 19, 8, 2  # N % DP != 0 exercises wrap padding
    bsl = B // DP
    audio_f32 = (0.1 * rng.randn(N, 36267)).astype(np.float32)
    audio_i16 = np.rint(np.clip(audio_f32 * 32767.0, -32767.0,
                                32767.0)).astype(np.int16)
    host = {
        "in_text": rng.randint(0, lang.n_words, (N, 34)).astype(np.int32),
        "in_audio": audio_i16,
        "target_vec": (0.1 * rng.randn(N, 34, 27)).astype(np.float32),
    }
    mesh = mesh_lib.get_mesh(DP)
    data, meta = resident.shard_host_data(host, mesh, label="test")
    assert meta.dp == DP and meta.n == N
    # per-device LOCAL indices; column block j//bsl belongs to device
    # j//bsl and must stay inside that shard's valid (non-padding) rows
    idx_stack = np.asarray(
        [[rng.randint(0, meta.valid_local[j // bsl]) for j in range(B)]
         for _ in range(K)], np.int32)

    res_step, gen_tx, dis_tx = make_gan_resident_multi_step(
        bundle, args, K, mesh=mesh)
    g1 = make_net_state(copy.deepcopy(gvars), gen_tx)
    d1 = make_net_state(copy.deepcopy(dvars), dis_tx)
    root = jax.random.PRNGKey(13)
    with mesh:
        g1, d1, m1 = res_step(g1, d1, data, idx_stack, root,
                              train_d=True, add_gan=True)

    # per-batch path: global rows in the same device-block order
    # (round-robin layout: device d local L holds global row L*DP + d)
    step, gen_tx2, dis_tx2 = make_gan_train_step(bundle, args)
    g2 = make_net_state(copy.deepcopy(gvars), gen_tx2)
    d2 = make_net_state(copy.deepcopy(dvars), dis_tx2)
    for k in range(K):
        gidx = np.asarray([int(idx_stack[k, j]) * DP + j // bsl
                           for j in range(B)])
        batch = {key: jnp.asarray(v[gidx]) for key, v in host.items()}
        g2, d2, mk = step(g2, d2, batch, jax.random.fold_in(root, k),
                          train_d=True, add_gan=True)
    for name, atol, t1, t2 in (("gen", 4e-3, g1.params, g2.params),
                               ("dis", 4e-3, d1.params, d2.params),
                               ("gen_bn", 1e-3, g1.batch_stats,
                                g2.batch_stats)):
        jax.tree_util.tree_map(
            lambda a, b, _n=name, _atol=atol: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=_atol, err_msg=_n),
            t1, t2)
    np.testing.assert_allclose(np.asarray(m1["loss"][-1]),
                               np.asarray(mk["loss"]), rtol=1e-3)


def test_resident_shard_layout_round_trip():
    """shard_host_data's round-robin layout: gathering local row L on
    every device returns global rows [L*dp, L*dp+1, ..., L*dp+dp-1] in
    device order, and the sharded ResidentBatchIterator reproduces the
    host iterator's batch COMPOSITION exactly."""
    import jax
    import numpy as np
    from gesture_generation_from_trimodal_context_tpu.parallel import (
        mesh as mesh_lib)
    from gesture_generation_from_trimodal_context_tpu.train import resident

    DP, N = 8, 21
    host = {"x": np.arange(N, dtype=np.float32).reshape(N, 1)}
    mesh = mesh_lib.get_mesh(DP)
    data, meta = resident.shard_host_data(host, mesh, label="layout")
    # residue d holds rows d, d+8, d+16 (<21): d<5 -> 3 rows, d>=5 -> 2
    assert meta.n_local == 3 and meta.valid_local[0] == 3
    assert meta.valid_local[-1] == 2
    it = resident.ResidentBatchIterator(data, N, DP, mesh=mesh)
    batches = [np.sort(np.asarray(b["x"]).ravel()) for b in it]
    assert len(batches) == N // DP
    np.testing.assert_array_equal(batches[0], np.arange(8.0))
    np.testing.assert_array_equal(batches[1], np.arange(8.0, 16.0))


def test_gan_prob_clamp_bounds_saturated_d():
    """--gan_prob_clamp: with a saturated discriminator (huge logits ->
    exact 0/1 sigmoid outputs) the reference loss is inf; the clamped
    loss and its gradients stay finite.  clamp=0 keeps reference math."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    EPS = 1e-8

    def mk_loss(clamp):
        def log_d(p):
            if clamp > 0:
                p = jnp.clip(p, clamp, 1.0 - clamp)
            return jnp.log(p + EPS)

        def log_1md(p):
            if clamp > 0:
                p = jnp.clip(p, clamp, 1.0 - clamp)
            return jnp.log(1.0 - p + EPS)

        def loss(logits_real, logits_fake):
            return -jnp.mean(log_d(jax.nn.sigmoid(logits_real))
                             + log_1md(jax.nn.sigmoid(logits_fake)))
        return loss

    # saturated D: sigmoid(+-60) rounds to exact 1/0 in fp32.  EPS keeps
    # the reference LOSS finite, but its gradient through the probability
    # is -1/(p+eps) ~ 1e8 — the weight-explosion mechanism observed at
    # epoch 39 of the synthetic full-recipe run (RESULTS.md).
    real = jnp.asarray([60.0, 60.0])
    fake = jnp.asarray([60.0, -60.0])  # one fake confidently 'real'

    def prob_grad(clamp):
        # gradient of -log(p) w.r.t. the probability itself (worst case;
        # the sigmoid jacobian only rescales it)
        def f(p):
            if clamp > 0:
                p = jnp.clip(p, clamp, 1 - clamp)
            return -jnp.mean(jnp.log(p + EPS))
        return jax.grad(f)(jnp.asarray([1e-8, 0.5]))

    g_ref = prob_grad(0.0)
    g_clamped = prob_grad(1e-4)
    assert float(jnp.abs(g_ref).max()) > 1e7       # unbounded reference
    assert float(jnp.abs(g_clamped).max()) < 1e5   # bounded under clamp

    # end-to-end: both losses finite, clamped gradients finite/bounded
    clamped, grads = jax.value_and_grad(mk_loss(1e-4), argnums=(0, 1))(
        real, fake)
    assert np.isfinite(float(clamped))
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()


def test_scan_multi_step_matches_per_step_all_families():
    """Host-path --steps_per_call fusion for the non-GAN families
    (train/resident.py scan_single_state / scan_two_state): the fused
    K-step program must land where K per-batch steps land (identical
    rng schedule: fold_in(rng, k))."""
    import copy
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gesture_generation_from_trimodal_context_tpu.models import factory
    from gesture_generation_from_trimodal_context_tpu.train import (
        state as state_lib)
    from gesture_generation_from_trimodal_context_tpu.train.resident import (
        scan_single_state, scan_two_state)
    from gesture_generation_from_trimodal_context_tpu.train.seq2seq_step \
        import make_seq2seq_train_step
    from gesture_generation_from_trimodal_context_tpu.train.s2g import (
        make_s2g_train_step)

    rng = np.random.RandomState(2)
    K = 2
    root = jax.random.PRNGKey(5)

    def stack(batches, keys):
        return {k: jnp.stack([b[k] for b in batches]) for k in keys}

    # ---- seq2seq (single-state; dropout 0 -> deterministic) ----
    args = tiny_args(model="seq2seq", hidden_size=24, n_layers=2,
                     dropout_prob=0.0, loss_regression_weight=250.0,
                     loss_kld_weight=0.1, loss_reg_weight=25.0)
    bundle = factory.init_model(args, tiny_vocab(), None, 27)
    gvars = factory.generator_init_variables(bundle, args,
                                             jax.random.PRNGKey(0), 4)
    step, tx = make_seq2seq_train_step(bundle, args)
    batches = [make_batch(rng) for _ in range(K)]
    keys = ("word_seq", "word_lengths", "target_vec")

    st1 = state_lib.make_net_state(copy.deepcopy(gvars), tx)
    multi = scan_single_state(step.body)
    st1, m1 = multi(st1, stack(batches, keys), root)

    st2 = state_lib.make_net_state(copy.deepcopy(gvars), tx)
    for k in range(K):
        st2, mk = step(st2, {key: batches[k][key] for key in keys},
                       jax.random.fold_in(root, k))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3),
        st1.params, st2.params)
    np.testing.assert_allclose(np.asarray(m1["loss"][-1]),
                               np.asarray(mk["loss"]), rtol=1e-4)

    # ---- speech2gesture (two-state) ----
    args = tiny_args(model="speech2gesture", loss_regression_weight=100.0,
                     loss_gan_weight=10.0, learning_rate=1e-3,
                     dropout_prob=0.0)
    bundle = factory.init_model(args, None, None, 27)
    key = jax.random.PRNGKey(0)
    gvars = factory.generator_init_variables(bundle, args, key, 4)
    dvars = factory.discriminator_init_variables(bundle, args, key, 4)
    step, gtx, dtx = make_s2g_train_step(bundle, args)
    keys = ("in_spec", "target_vec")

    g1 = state_lib.make_net_state(copy.deepcopy(gvars), gtx)
    d1 = state_lib.make_net_state(copy.deepcopy(dvars), dtx)
    multi2 = scan_two_state(step.body)
    g1, d1, m1 = multi2(g1, d1, stack(batches, keys), root)

    g2 = state_lib.make_net_state(copy.deepcopy(gvars), gtx)
    d2 = state_lib.make_net_state(copy.deepcopy(dvars), dtx)
    for k in range(K):
        g2, d2, mk = step(g2, d2, {key: batches[k][key] for key in keys},
                          jax.random.fold_in(root, k))
    # tolerance: one Adam step moves a weight by up to ~lr regardless of
    # gradient magnitude (see test_resident_multi_step_matches_per_batch),
    # so K=2 steps at lr=1e-3 amplify scan-vs-jit float reordering to
    # O(K * lr) per param
    for t1, t2 in ((g1.params, g2.params), (d1.params, d2.params)):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=6e-3),
            t1, t2)
    np.testing.assert_allclose(np.asarray(m1["loss"][-1]),
                               np.asarray(mk["loss"]), rtol=1e-3)
