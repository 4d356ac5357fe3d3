"""The reference's dormant recurrent Discriminator
(multimodal_context_net.py:163-204), rebuilt as
models/multimodal_context.GRUDiscriminator.

The no-text path is parity-tested against the EXECUTED reference class;
the text path cannot be constructed upstream (the TextEncoderTCN call at
:170 passes misaligned positionals), so its tests cover training
integration and export/import layout instead.
"""

import copy
import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from gesture_generation_from_trimodal_context_tpu.data.vocab import Vocab
from gesture_generation_from_trimodal_context_tpu.models import factory
from gesture_generation_from_trimodal_context_tpu.models.multimodal_context import (
    GRUDiscriminator)
from gesture_generation_from_trimodal_context_tpu.train.gan import (
    make_gan_train_step)
from gesture_generation_from_trimodal_context_tpu.train.state import (
    make_net_state)

REF = "/root/reference/scripts"


@pytest.fixture(scope="module")
def ref_mmc():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    if "fasttext" not in sys.modules:
        sys.modules["fasttext"] = types.ModuleType("fasttext")
    import model.embedding_net  # noqa: F401 (circular-import order)
    import model.multimodal_context_net as mmc
    return mmc


def _set_linear(tlin, scope):
    tlin.weight.data = torch.tensor(np.asarray(scope["Dense_0"]["kernel"]).T)
    tlin.bias.data = torch.tensor(np.asarray(scope["Dense_0"]["bias"]))


def _set_gru(tgru, scope, n_layers):
    for layer in range(n_layers):
        for sfx in ("l%d" % layer, "l%d_reverse" % layer):
            for kind in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
                getattr(tgru, "%s_%s" % (kind, sfx)).data = torch.tensor(
                    np.asarray(scope["%s_%s" % (kind, sfx)]))


def _lang(n=20):
    v = Vocab("w")
    for i in range(n - 4):
        v.index_word("w%d" % i)
    return v


def test_gru_discriminator_matches_reference(ref_mmc):
    """No-text path vs the executed reference Discriminator (the only
    configuration the reference class can instantiate)."""
    hidden, layers, pose_dim, n_poses = 24, 2, 27, 34
    ours = GRUDiscriminator(input_size=pose_dim, hidden_size=hidden,
                            n_layers=layers, dropout_prob=0.3)
    rng = np.random.RandomState(0)
    poses = jnp.asarray(0.1 * rng.randn(2, n_poses, pose_dim), jnp.float32)
    v = ours.init({"params": jax.random.PRNGKey(0)}, poses)
    out = ours.apply(v, poses, train=False)

    args = SimpleNamespace(hidden_size=hidden, n_layers=layers,
                           dropout_prob=0.3, n_poses=n_poses)
    ref = ref_mmc.Discriminator(args, input_size=pose_dim)
    p = v["params"]
    _set_gru(ref.gru, p["GRU_0"], layers)
    _set_linear(ref.out, p["TorchDense_0"])
    _set_linear(ref.out2, p["TorchDense_1"])
    ref.eval()
    with torch.no_grad():
        t_out = ref(torch.tensor(np.asarray(poses)))
    np.testing.assert_allclose(np.asarray(out), t_out.numpy(), atol=1e-3)
    assert np.abs(np.asarray(out) - t_out.numpy()).max() < 3e-4


def test_reference_text_branch_is_unconstructible(ref_mmc):
    """Pin the upstream defect that justifies rebuilding the text path:
    Discriminator(..., n_words, word_embed_size) crashes inside
    TextEncoderTCN because n_words lands in the ``args`` slot (so
    word_embed_size becomes n_words and nn.Embedding gets a None
    embedding dim)."""
    args = SimpleNamespace(hidden_size=24, n_layers=2, dropout_prob=0.3,
                           n_poses=34)
    with pytest.raises((TypeError, AttributeError)):
        ref_mmc.Discriminator(args, input_size=27, n_words=20,
                              word_embed_size=16)


def _mk_args(mode, dis_type):
    return SimpleNamespace(
        model="multimodal_context", n_poses=34, n_pre_poses=4,
        hidden_size=24, n_layers=2, dropout_prob=0.0,
        input_context="both", freeze_wordembed=False, wordembed_dim=16,
        motion_resampling_framerate=15, z_type="none",
        learning_rate=5e-4, discriminator_lr_weight=0.2,
        loss_regression_weight=500.0, loss_gan_weight=5.0,
        loss_kld_weight=0.1, loss_reg_weight=0.05, loss_warmup=0,
        discriminator_type=dis_type,
        fused_gen_forwards=(mode == "fused"),
        fold_all_forwards=(mode == "fold"))


@pytest.mark.parametrize("dis_type", ["gru", "gru_text"])
def test_gan_variants_match_faithful_with_gru_discriminator(dis_type):
    """The fused/folded step bodies must stay equivalent to the faithful
    one with the recurrent discriminators too (same pinning as
    test_train_steps.py::test_fused_gan_step_matches_faithful_exactly)."""
    lang = _lang()
    rng = np.random.RandomState(0)
    batch = {
        "in_text": jnp.asarray(rng.randint(0, lang.n_words, (4, 34)),
                               jnp.int32),
        "in_audio": jnp.asarray(0.1 * rng.randn(4, 36267), jnp.float32),
        "target_vec": jnp.asarray(0.1 * rng.randn(4, 34, 27), jnp.float32),
    }

    results = []
    for mode in ("faithful", "fused", "fold"):
        args = _mk_args(mode, dis_type)
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
                ("gen_params", 2e-3, g0.params, g1.params),
                ("dis_params", 2e-3, d0.params, d1.params)):
            jax.tree_util.tree_map(
                lambda a, b, _atol=atol, _n=name + "/" + variant:
                    np.testing.assert_allclose(
                        np.asarray(a), np.asarray(b), atol=_atol,
                        err_msg=_n),
                t0, t1)


def test_gru_discriminator_export_strict_loads_reference(ref_mmc):
    """Export the no-text GRU discriminator and strict-load it into the
    actual reference class; outputs must agree."""
    from gesture_generation_from_trimodal_context_tpu.interop.torch_export import (
        export_variables)

    hidden, layers, pose_dim, n_poses = 24, 2, 27, 34
    ours = GRUDiscriminator(input_size=pose_dim, hidden_size=hidden,
                            n_layers=layers, dropout_prob=0.3)
    rng = np.random.RandomState(1)
    poses = jnp.asarray(0.1 * rng.randn(2, n_poses, pose_dim), jnp.float32)
    v = ours.init({"params": jax.random.PRNGKey(3)}, poses)
    out = ours.apply(v, poses, train=False)

    sd = export_variables("multimodal_context", v, "discriminator")
    args = SimpleNamespace(hidden_size=hidden, n_layers=layers,
                           dropout_prob=0.3, n_poses=n_poses)
    ref = ref_mmc.Discriminator(args, input_size=pose_dim)
    ref.load_state_dict(
        {k: torch.from_numpy(np.array(w)) for k, w in sd.items()},
        strict=True)
    ref.eval()
    with torch.no_grad():
        t_out = ref(torch.tensor(np.asarray(poses)))
    np.testing.assert_allclose(np.asarray(out), t_out.numpy(), atol=1e-3)


def test_gru_text_discriminator_export_import_roundtrip():
    """The text-conditioned variant has no loadable reference module, but
    export -> import must be the identity on the variable tree
    (export_variables is self-verifying; this pins the converters agree
    on the text-encoder sub-tree too)."""
    from gesture_generation_from_trimodal_context_tpu.interop.torch_export import (
        export_variables)

    lang = _lang()
    ours = GRUDiscriminator(input_size=27, hidden_size=24, n_layers=2,
                            dropout_prob=0.3, use_text=True,
                            n_words=lang.n_words, word_embed_size=16)
    rng = np.random.RandomState(2)
    poses = jnp.asarray(0.1 * rng.randn(2, 34, 27), jnp.float32)
    in_text = jnp.asarray(rng.randint(0, lang.n_words, (2, 34)), jnp.int32)
    v = ours.init({"params": jax.random.PRNGKey(5)}, poses, in_text)
    sd = export_variables("multimodal_context", v, "discriminator")
    assert any(k.startswith("text_encoder.") for k in sd)
    assert "out.weight" in sd and "out2.weight" in sd
