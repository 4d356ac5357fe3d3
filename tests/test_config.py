"""Config system tests: YAML + CLI merged namespace, configargparse-style
semantics (reference config/parse_args.py:16-68)."""

import os

import numpy as np
import pytest

from gesture_generation_from_trimodal_context_tpu.config import parse_args_mod as parse_args

def _cfg(name):
    import gesture_generation_from_trimodal_context_tpu.config as cfg_pkg
    return os.path.join(os.path.dirname(cfg_pkg.__file__), name)


def test_parse_multimodal_context_config():
    args = parse_args.parse_args(["--config", _cfg("multimodal_context.yml")])
    assert args.model == "multimodal_context"
    assert args.n_layers == 4
    assert args.hidden_size == 300
    assert args.z_type == "speaker"
    assert args.batch_size == 128
    assert args.loss_regression_weight == 500
    assert args.loss_warmup == 10
    # append semantics: scalar paths become 1-element lists
    assert args.train_data_path == ["data/ted_dataset/lmdb_train"]
    # nargs='*' float lists become nested lists; squeeze yields 27 floats
    mdv = np.array(args.mean_dir_vec).squeeze()
    assert mdv.shape == (27,)
    assert abs(mdv[0] - 0.0154009) < 1e-9
    assert np.array(args.mean_pose).squeeze().shape == (30,)


def test_cli_overrides_yaml():
    args = parse_args.parse_args(
        ["--config", _cfg("multimodal_context.yml"), "--batch_size", "16",
         "--input_context", "audio"])
    assert args.batch_size == 16
    assert args.input_context == "audio"


def test_defaults_applied():
    args = parse_args.parse_args(["--config", _cfg("multimodal_context.yml")])
    assert args.dropout_prob == 0.3  # not in YAML -> reference default
    assert args.GAN_noise_size == 0
    assert args.discriminator_lr_weight == 0.2


@pytest.mark.parametrize("name,model", [
    ("seq2seq.yml", "seq2seq"),
    ("speech2gesture.yml", "speech2gesture"),
    ("joint_embed.yml", "joint_embedding"),
    ("gesture_autoencoder.yml", "gesture_autoencoder"),
])
def test_all_configs_parse(name, model):
    args = parse_args.parse_args(["--config", _cfg(name)])
    assert args.model == model
    assert args.n_poses == 34
    assert args.n_pre_poses == 4
    assert args.motion_resampling_framerate == 15


def test_roundtrip_args_dict():
    args = parse_args.parse_args(["--config", _cfg("seq2seq.yml")])
    d = parse_args.args_to_dict(args)
    back = parse_args.args_from_dict(d)
    assert back.model == args.model
    assert back.mean_dir_vec == args.mean_dir_vec
