"""Experiment configuration: YAML config file + CLI flags in one namespace.

Behavioral contract: every option of the reference config system
(reference config/parse_args.py:16-68, built on configargparse) is
accepted with the same name, type, and default, so the five published
YAML experiment files drive this framework unchanged.  configargparse is
not available in this environment, so this is a small self-contained
reimplementation on top of argparse + PyYAML with the same precedence
rule: command line > config file > defaults.

TPU-specific additions (all defaulted so reference configs run as-is)
are grouped at the bottom of ``build_parser``.
"""

import argparse
import os
from types import SimpleNamespace

import yaml


def str2bool(v):
    """Parse flexible boolean CLI/YAML values ('yes', 'true', '1', ...)."""
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")


class _Opt:
    def __init__(self, name, type=str, default=None, required=False,
                 append=False, nargs=None):
        self.name = name
        self.type = type
        self.default = default
        self.required = required
        self.append = append
        self.nargs = nargs


def _reference_options():
    """All options of the reference CLI (config/parse_args.py:16-68)."""
    o = []
    add = o.append
    add(_Opt("name", str, "main"))
    add(_Opt("train_data_path", str, append=True))
    add(_Opt("val_data_path", str, append=True))
    add(_Opt("test_data_path", str, append=True))
    add(_Opt("model_save_path", str, required=True))
    add(_Opt("pose_representation", str, "3d_vec"))
    add(_Opt("mean_dir_vec", float, append=True, nargs="*"))
    add(_Opt("mean_pose", float, append=True, nargs="*"))
    add(_Opt("random_seed", int, -1))
    add(_Opt("save_result_video", str2bool, True))
    # word embedding
    add(_Opt("wordembed_path", str, None))
    add(_Opt("wordembed_dim", int, 100))
    add(_Opt("freeze_wordembed", str2bool, False))
    # model
    add(_Opt("model", str, required=True))
    add(_Opt("epochs", int, 10))
    add(_Opt("batch_size", int, 50))
    add(_Opt("dropout_prob", float, 0.3))
    add(_Opt("n_layers", int, 2))
    add(_Opt("hidden_size", int, 200))
    add(_Opt("z_type", str, "none"))
    add(_Opt("input_context", str, "both"))
    # dataset
    add(_Opt("motion_resampling_framerate", int, 24))
    add(_Opt("n_poses", int, 50))
    add(_Opt("n_pre_poses", int, 5))
    add(_Opt("subdivision_stride", int, 5))
    add(_Opt("loader_workers", int, 0))
    # GAN
    add(_Opt("GAN_noise_size", int, 0))
    # training
    add(_Opt("learning_rate", float, 0.001))
    add(_Opt("discriminator_lr_weight", float, 0.2))
    add(_Opt("loss_regression_weight", float, 50))
    add(_Opt("loss_gan_weight", float, 1.0))
    add(_Opt("loss_kld_weight", float, 0.1))
    add(_Opt("loss_reg_weight", float, 0.01))
    add(_Opt("loss_warmup", int, -1))
    # eval
    add(_Opt("eval_net_path", str, ""))
    return o


def _tpu_options():
    """Options new to the TPU framework (defaults keep reference behavior)."""
    o = []
    add = o.append
    add(_Opt("resume_checkpoint", str, ""))    # orbax/msgpack resume path ('' = fresh start, like the reference)
    add(_Opt("dp_devices", int, -1))           # data-parallel mesh size; -1 = all local devices
    # 'jit' (default): batch sharded over the data mesh, global-batch BN
    # statistics (documented deviation, parallel/mesh.py).  'shard_map':
    # explicit-SPMD DataParallel-faithful step — per-shard BN batch stats
    # and dropout like per-GPU torch replicas, psum'd grads (train/gan.py,
    # train/embed.py; multimodal_context + embed families only)
    add(_Opt("dp_strategy", str, "jit"))
    # embedding tensor parallelism: row-shard (vocab, dim) tables over a
    # 'model' mesh axis of this size (2-D mesh, requires dp_strategy=jit)
    add(_Opt("tp_devices", int, 1))
    # Pallas-fused GRU kernels for TRAINING (default off: the XLA scan
    # is ~parity at batch, RESULTS.md).  The synthesis engine chooses
    # its kernel independently of this (and of the value recorded in a
    # checkpoint's args): pallas on a TPU backend — measured 1.22x at
    # B=1 — with a GG_USE_PALLAS=0/1 env override (synthesis/engine.py)
    add(_Opt("use_pallas", str2bool, None))
    add(_Opt("prefetch_batches", int, 2))      # host->device prefetch depth
    add(_Opt("steps_per_call", int, 1))        # train steps fused per jit call (lax.scan over microbatches)
    # DOCUMENTED DEVIATION: batches the adversarial step's no-grad
    # generator forwards (D-step fake + diversity-regularizer draw) and the
    # D-step's real/fake discriminator forwards; identical loss math but
    # BatchNorm running stats update once on the combined batch instead of
    # sequentially per forward (train/gan.py fused_step_body)
    add(_Opt("fused_gen_forwards", str2bool, False))
    # DOCUMENTED DEVIATION (stronger form): ALL generator forwards of the
    # adversarial step run as one (1+train_d+use_div)*B-batched forward
    # captured with jax.vjp; gradients flow through slice 0 only.  Exact
    # loss math, minimal sequential scan chains (train/gan.py
    # folded_step_body); takes precedence over fused_gen_forwards
    add(_Opt("fold_all_forwards", str2bool, False))
    # lax.scan unroll factor for the recurrent GRU loops (compile time vs
    # per-iteration while-loop overhead; ops/recurrent.set_scan_unroll)
    add(_Opt("scan_unroll", int, 1))
    # DOCUMENTED DEVIATION (default ON since round 4): bfloat16 compute
    # inside the recurrent loops (carries/gates/recurrent matmul); params
    # and optimizer state stay fp32 (ops/recurrent.set_rnn_dtype).
    # Evidence for the default (PRECISION_r04.json + RESULTS.md): the
    # bf16 gradient error is 20-230x below each family's minibatch noise
    # floor at random init AND at a trained checkpoint, and the 30-epoch
    # TED-scale FGD/loss trajectories match fp32 within run-to-run noise
    # while steps run ~19% faster.  --rnn_bf16 false restores the
    # reference's exact fp32 recurrent math.
    add(_Opt("rnn_bf16", str2bool, True))
    # DOCUMENTED DEVIATION: clamp discriminator probabilities into
    # [c, 1-c] before the ns-GAN logs; 0 (default) = exact reference
    # math, whose log(0) hits inf when D saturates (train/gan.py)
    add(_Opt("gan_prob_clamp", float, 0.0))
    # collapse playbook: when resuming from a run that aborted via the
    # non-finite guard (collapse_info.json marker), auto-enable the
    # clamp so long unattended runs recover without intervention
    # (train/loops.py _apply_collapse_playbook); only active on
    # --resume_checkpoint, and an explicit --gan_prob_clamp wins
    add(_Opt("collapse_playbook", str2bool, True))
    # upload the ENTIRE train+val sets to HBM once (int16 audio; the
    # published TED cache fits a v5e chip) and gather microbatches
    # in-graph — per-call host->device traffic becomes a few hundred
    # bytes of indices (train/resident.py; all five families; on a
    # multi-device data mesh the rows are round-robin sharded over the
    # mesh and gathered per shard)
    add(_Opt("device_resident_data", str2bool, False))
    # ship raw audio host->device as int16 PCM (half the bytes of fp32;
    # bit-exact for audio decoded from 16-bit PCM sources like the TED
    # recordings); jitted steps decode in-graph (train/common.decode_audio)
    add(_Opt("audio_int16_transfer", str2bool, False))
    # gaussian-noise augmentation for H3.6M training windows
    # (train_feature_extractor.py).  The reference implements this path
    # but never enables it (reference h36m_loader.py:44-48,100-104);
    # default off for parity
    add(_Opt("h36m_augment", str2bool, False))
    # the reference's dormant noisy-target D-step path: train_gan.py
    # hard-codes use_noisy_target=False but implements N(0, 0.1) noise
    # on the discriminator's real/fake inputs (reference
    # train_gan.py:8-10,17,32-39); exposed as a flag, default off =
    # reference behavior
    add(_Opt("use_noisy_target", str2bool, False))
    # multimodal_context discriminator: 'conv' (default, what the
    # reference trains), 'gru' (the reference's dormant recurrent
    # Discriminator class, multimodal_context_net.py:163-204), or
    # 'gru_text' (the same with its text-conditioning branch, which the
    # reference defines but cannot construct as written, rebuilt working
    # — models/multimodal_context.GRUDiscriminator)
    add(_Opt("discriminator_type", str, "conv"))
    # run the validation/FGD pass every N epochs instead of every epoch
    # (default 1 = reference behavior; the final epoch always evaluates).
    # The TED-scale eval pass costs ~10 s/epoch — ~20% of the 100-epoch
    # recipe's wall time (RESULTS.md)
    add(_Opt("eval_interval", int, 1))
    # include the final partial validation batch in the val/FGD pass
    # instead of dropping it (the reference's eval DataLoader uses
    # drop_last=True, train.py:219-224, so up to batch_size-1 tail
    # samples are excluded per epoch); default off = reference
    # semantics.  Exact math: the tail runs at its natural (smaller)
    # batch shape on a single-device mesh, or padded + masked on a
    # multi-device one (train/loops.py evaluate_testset)
    add(_Opt("eval_full_set", str2bool, False))
    # resident-data mode, single-device data mesh: run the WHOLE
    # validation pass (in-HBM gathers + eval forwards + FGD embedding)
    # as one jitted lax.scan — one device dispatch per epoch instead of
    # ~3 per batch over the device tunnel.  Same math, same rng stream
    # as the per-batch path (train/eval_steps.make_fused_eval_pass);
    # default on, disable to fall back to per-batch eval
    add(_Opt("fused_eval_pass", str2bool, True))
    # write checkpoints from a background thread: the main loop takes a
    # one-dispatch on-device snapshot of the state and keeps training
    # while the device->host transfer + msgpack encode + write happen
    # concurrently (train/async_ckpt.py).  Pure IO change, zero effect
    # on training math; saves measured ~6-9 s/epoch synchronous on the
    # TED-scale recipe (RESULTS.md round 4).  false = synchronous saves
    add(_Opt("async_checkpoint", str2bool, True))
    add(_Opt("deterministic_tb_dir", str2bool, False))  # stable tensorboard dir name (tests)
    return o


ALL_OPTIONS = _reference_options() + _tpu_options()


def build_parser():
    parser = argparse.ArgumentParser(
        description="TPU-native trimodal gesture generation")
    parser.add_argument("-c", "--config", required=True,
                        help="YAML config file path")
    for opt in ALL_OPTIONS:
        kwargs = {}
        if opt.append:
            kwargs["action"] = "append"
            if opt.nargs:
                kwargs["nargs"] = opt.nargs
        parser.add_argument("--" + opt.name, type=opt.type, default=None,
                            **kwargs)
    return parser


def _coerce_yaml_value(opt, value):
    """Convert a YAML value to the namespace representation configargparse
    would have produced for the same option declaration."""
    if opt.append:
        # 'append' options come out as a list; a YAML scalar becomes a
        # one-element list (e.g. train_data_path), a YAML list of numbers
        # becomes a nested list (e.g. mean_dir_vec with nargs='*'), matching
        # how the reference consumes them (args.train_data_path[0],
        # np.array(args.mean_dir_vec).squeeze()).
        if isinstance(value, list):
            if opt.nargs:
                return [[opt.type(v) for v in value]]
            return [opt.type(v) for v in value]
        return [opt.type(value)]
    if value is None:
        return None
    if opt.type is str2bool:
        return str2bool(str(value))
    return opt.type(value)


def parse_args(argv=None):
    """Parse CLI + YAML into a flat namespace (CLI > YAML > defaults)."""
    parser = build_parser()
    cli = parser.parse_args(argv)

    if not os.path.exists(cli.config):
        raise FileNotFoundError("config file not found: {}".format(cli.config))
    with open(cli.config) as f:
        file_cfg = yaml.safe_load(f) or {}

    ns = {}
    known = {opt.name: opt for opt in ALL_OPTIONS}
    for key in file_cfg:
        if key not in known:
            raise ValueError("unknown config key: {}".format(key))

    for name, opt in known.items():
        cli_val = getattr(cli, name)
        if cli_val is not None:
            if opt.append and opt.nargs and cli_val and not isinstance(cli_val[0], list):
                cli_val = [cli_val]
            ns[name] = cli_val
        elif name in file_cfg:
            ns[name] = _coerce_yaml_value(opt, file_cfg[name])
        else:
            if opt.required:
                raise ValueError("missing required option: {}".format(name))
            ns[name] = [opt.default] if (opt.append and opt.default is not None) \
                else (opt.default if not opt.append else None)

    ns["config"] = cli.config
    return SimpleNamespace(**ns)


def args_to_dict(args):
    """Namespace -> plain dict (for self-describing checkpoints)."""
    return dict(vars(args))


def args_from_dict(d):
    """Inverse of args_to_dict (checkpoint loading)."""
    return SimpleNamespace(**dict(d))
