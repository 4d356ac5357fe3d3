"""Epoch driver: the training loop for all five model families.

Behavioral contract: reference scripts/train.py:67-329 —
- evaluate the validation set FIRST each epoch (train.py:114-116),
- TensorBoard scalars per loss key and per val metric, best-value
  tracking by FGD when available else val loss (train.py:118-134),
- checkpoint on best and every 20 epochs, sample videos every 10
  (train.py:136-163),
- per-batch dispatch to the model-specific jitted train step,
- AverageMeter windows printed 5x per epoch with samples/s.

TPU-native differences (SURVEY.md §5/§7): batches are host-assembled then
sharded over the data mesh; parameters/optimizer state are replicated;
the whole iteration (D+G) is one compiled program; optional true resume
from a checkpoint with optimizer state (the reference cannot resume).
"""

import atexit
import datetime
import logging
import os
import time
from pathlib import Path

import numpy as np
import jax

from ..data.vocab import Vocab
from ..models import factory
from ..models.evaluator import EmbeddingSpaceEvaluator
from ..parallel import mesh as mesh_lib
from ..utils.average_meter import AverageMeter
from ..utils.logging_utils import time_since
from ..utils.tb import MetricWriter
from . import async_ckpt
from . import checkpoint as ckpt_lib
from .embed import make_embed_train_step
from .eval_steps import make_eval_step, make_fused_eval_pass
from .gan import make_gan_train_step
from .s2g import make_s2g_train_step
from .seq2seq_step import make_seq2seq_train_step
from .state import make_net_state

LOSS_METER_NAMES = ("loss", "var_loss", "gen", "dis", "KLD", "DIV_REG")


def _device_batch(batch, mesh):
    """Ship the numeric parts of a host batch to the mesh.

    Entries that are already device arrays (resident-data eval batches,
    train/resident.py) pass through untouched."""
    num = {k: v for k, v in batch.items()
           if isinstance(v, np.ndarray) and v.dtype != object
           and not k.startswith("aux_")}
    out = dict(mesh_lib.shard_batch(num, mesh))
    for k, v in batch.items():
        if isinstance(v, jax.Array):
            out[k] = v
    return out


def _random_vids(speaker_model, batch_size, rs):
    """Vectorized random speaker draw (reference train.py:259)."""
    vals = getattr(speaker_model, "_vid_index_values", None)
    if vals is None:
        vals = np.fromiter(speaker_model.word2index.values(), np.int32,
                           len(speaker_model.word2index))
        speaker_model._vid_index_values = vals
    return vals[rs.randint(len(vals), size=batch_size)].astype(np.int32)


# default --gan_prob_clamp applied by the collapse playbook: bounds the
# ns-GAN losses once D saturates (the value that recovered the real
# epoch-39 collapse, RESULTS.md round 2)
COLLAPSE_PLAYBOOK_CLAMP = 1e-3


def _write_collapse_marker(args, key, scalar, iteration, epoch):
    """Record a non-finite-abort next to the checkpoints so a resume can
    auto-apply the recovery playbook (beyond the reference, which
    silently trains on -inf: reference train_eval/train_gan.py:33-39)."""
    import json
    info = {"metric": key, "value": repr(scalar), "iteration": iteration,
            "epoch": epoch,
            "suggestion": "--gan_prob_clamp %g" % COLLAPSE_PLAYBOOK_CLAMP}
    try:
        path = Path(args.model_save_path) / "collapse_info.json"
        path.parent.mkdir(parents=True, exist_ok=True)
        with open(path, "w") as f:
            json.dump(info, f)
    except OSError as e:
        logging.warning("could not write collapse marker: %s", e)


def _apply_collapse_playbook(args, model):
    """On resume from a run that aborted via the non-finite guard
    (collapse_info.json next to the resume checkpoint), auto-enable the
    GAN probability clamp so the restarted run survives the saturated-D
    basin unattended (VERDICT r2 item 7; --collapse_playbook false
    opts out, an explicit --gan_prob_clamp wins)."""
    resume_path = getattr(args, "resume_checkpoint", "") or ""
    if not resume_path or model != "multimodal_context":
        return
    if not getattr(args, "collapse_playbook", True):
        return
    if getattr(args, "gan_prob_clamp", 0.0):
        return  # explicit operator choice wins
    marker = Path(resume_path).parent / "collapse_info.json"
    if not marker.exists():
        return
    import json
    with open(marker) as f:
        info = json.load(f)
    args.gan_prob_clamp = COLLAPSE_PLAYBOOK_CLAMP
    logging.warning(
        "collapse playbook: the previous run aborted on non-finite %s at "
        "epoch %s (collapse_info.json); auto-enabling --gan_prob_clamp %g "
        "for this resume (disable with --collapse_playbook false, or set "
        "--gan_prob_clamp explicitly)", info.get("metric"),
        info.get("epoch"), COLLAPSE_PLAYBOOK_CLAMP)


def _dataset_vid_indices(dataset, speaker_model):
    """Precompute each sample's speaker index once so per-batch vid
    lookup is a vectorized array gather instead of a per-element dict
    walk (the batches carry ``aux_idx`` sample indices)."""
    store = getattr(dataset, "store", None)
    if store is None or not hasattr(store, "vids"):
        return None
    w2i = speaker_model.word2index
    return np.fromiter((w2i[v] for v in store.vids), np.int32,
                       len(store.vids))


def train_epochs(args, train_loader, test_loader, lang_model, pose_dim,
                 speaker_model=None, trial_epochs=None, device_mesh=None):
    start = time.time()
    loss_meters = [AverageMeter(n) for n in LOSS_METER_NAMES]
    best_val_loss = (1e10, 0)

    tb_name = args.name if getattr(args, "deterministic_tb_dir", False) else \
        args.name + "_" + datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
    tb_writer = MetricWriter(str(Path(args.model_save_path).parent /
                                 "tensorboard_runs" / tb_name))

    n_epochs = trial_epochs or args.epochs
    print_interval = max(1, int(len(train_loader) / 5))
    save_sample_interval = 10
    save_model_interval = 20
    eval_interval = max(1, int(getattr(args, "eval_interval", 1) or 1))

    speaker_model = factory.resolve_speaker_model(args, speaker_model)

    from ..ops.recurrent import set_gru_impl
    if getattr(args, "use_pallas", None):
        # Pallas-fused GRU kernels for every forward built below (fastest
        # for inference-heavy loops; training backward re-runs the scan
        # math, see ops/pallas_gru.py)
        set_gru_impl("pallas")
    else:
        # None (auto) means scan for TRAINING (measured ~parity at batch,
        # RESULTS.md); also resets impl state a prior synthesis call in
        # this process may have switched to pallas
        set_gru_impl("scan")
    if (getattr(args, "scan_unroll", 1) or 1) > 1:
        from ..ops.recurrent import set_scan_unroll
        set_scan_unroll(args.scan_unroll)
    from ..ops.recurrent import set_rnn_dtype
    if getattr(args, "rnn_bf16", False):
        import jax.numpy as _jnp
        set_rnn_dtype(_jnp.bfloat16)
    else:
        # explicit reset: --rnn_bf16 false must restore exact fp32 math
        # even if an earlier call in this process enabled bf16
        set_rnn_dtype(None)

    # mesh strategy validation first (before any model building)
    dp_strategy = getattr(args, "dp_strategy", "jit") or "jit"
    tp_devices = max(1, getattr(args, "tp_devices", 1) or 1)
    if dp_strategy not in ("jit", "shard_map"):
        raise ValueError("dp_strategy must be jit or shard_map, got %r"
                         % dp_strategy)
    if dp_strategy == "shard_map" and tp_devices > 1:
        raise ValueError("dp_strategy=shard_map is the DataParallel-"
                         "faithful pure-DP path; combine tensor "
                         "parallelism (--tp_devices) with dp_strategy=jit")

    # model + mesh (SURVEY.md §5: 1-D data mesh by default; optional 2-D
    # data x model mesh for embedding tensor parallelism)
    bundle = factory.init_model(args, lang_model, speaker_model, pose_dim)
    if device_mesh is not None:
        mesh = device_mesh
    elif tp_devices > 1:
        from ..parallel import sharding_rules
        dp = getattr(args, "dp_devices", -1)
        if dp is None or dp <= 0:
            dp = max(1, len(jax.devices()) // tp_devices)
        mesh = sharding_rules.get_mesh_2d(dp, tp_devices)
        logging.info("2-D mesh: %d data x %d model", dp, tp_devices)
    else:
        mesh = mesh_lib.get_mesh(getattr(args, "dp_devices", -1))
    seed = args.random_seed if args.random_seed >= 0 else \
        np.random.randint(0, 2 ** 31 - 1)
    root_rng = jax.random.PRNGKey(seed)
    rs = np.random.RandomState(seed)

    # Module/optimizer init runs EAGERLY (flax init is not jitted): on a
    # tunneled device every tiny op is a ~100 ms roundtrip — measured
    # ~2 min of TED-scale startup.  Run it on the host cpu platform
    # instead (utils/platforms.py); optimizer init follows the
    # cpu-committed params, and mesh replicate/shard below uploads the
    # finished state in one transfer.  PRNGKey(seed) is backend-
    # independent key data, so init draws are unchanged in distribution.
    from ..utils import platforms
    with platforms.host_init_context():
        init_rng = jax.random.PRNGKey(seed)
        gvars = factory.generator_init_variables(bundle, args, init_rng)
        gvars = factory.load_pretrained_word_embedding(
            gvars, lang_model.word_embedding_weights
            if lang_model is not None else None)
        dvars = factory.discriminator_init_variables(bundle, args,
                                                     init_rng)
        if getattr(bundle.discriminator, "use_text", False):
            # the text-conditioned discriminator carries its own
            # TextEncoderTCN embedding table; seed it like the generator's
            dvars = factory.load_pretrained_word_embedding(
                dvars, lang_model.word_embedding_weights
                if lang_model is not None else None)

        # FGD evaluator (its embed-net template init is eager too)
        embed_space_evaluator = None
        if args.eval_net_path and len(args.eval_net_path) > 0 and \
                os.path.exists(args.eval_net_path):
            embed_space_evaluator = EmbeddingSpaceEvaluator(
                args, args.eval_net_path, lang_model)
        elif args.eval_net_path:
            logging.warning("eval_net_path %s not found; FGD disabled",
                            args.eval_net_path)

    # train/eval steps + states
    model = args.model
    # must run BEFORE step building: gan_prob_clamp is baked into the
    # compiled step bodies
    _apply_collapse_playbook(args, model)
    dis_state = None
    steps_per_call = max(1, getattr(args, "steps_per_call", 1))
    multi_step_fn = None
    use_shard_map = dp_strategy == "shard_map"
    if model == "multimodal_context":
        if use_shard_map:
            # DataParallel-faithful per-shard BN/dropout (train/gan.py)
            from .gan import make_gan_train_step_shardmap
            step_fn, gen_tx, dis_tx = make_gan_train_step_shardmap(
                bundle, args, mesh)
        else:
            step_fn, gen_tx, dis_tx = make_gan_train_step(bundle, args)
        if steps_per_call > 1:
            if use_shard_map:
                # scan inside the shard_map'd body: per-step semantics
                # unchanged, dispatch amortized over steps_per_call
                from .gan import make_gan_multi_step_shardmap
                multi_step_fn, _, _ = make_gan_multi_step_shardmap(
                    bundle, args, mesh, steps_per_call)
            else:
                from .gan import make_gan_multi_step
                multi_step_fn, _, _ = make_gan_multi_step(bundle, args,
                                                          steps_per_call)
        gen_state = make_net_state(gvars, gen_tx)
        dis_state = make_net_state(dvars, dis_tx)
    elif model in ("joint_embedding", "gesture_autoencoder"):
        mode = "random" if model == "joint_embedding" else None
        if use_shard_map:
            from .embed import (make_embed_multi_step_shardmap,
                                make_embed_train_step_shardmap)
            step_fn, gen_tx = make_embed_train_step_shardmap(
                bundle, args, mesh, mode=mode)
            if steps_per_call > 1:
                multi_step_fn, _ = make_embed_multi_step_shardmap(
                    bundle, args, mesh, steps_per_call, mode=mode)
        else:
            step_fn, gen_tx = make_embed_train_step(bundle, args, mode=mode)
            if steps_per_call > 1:
                from .resident import scan_single_state
                multi_step_fn = scan_single_state(step_fn.body)
        gen_state = make_net_state(gvars, gen_tx)
    elif model == "seq2seq":
        if use_shard_map:
            from .seq2seq_step import (make_seq2seq_multi_step_shardmap,
                                       make_seq2seq_train_step_shardmap)
            step_fn, gen_tx = make_seq2seq_train_step_shardmap(
                bundle, args, mesh)
            if steps_per_call > 1:
                multi_step_fn, _ = make_seq2seq_multi_step_shardmap(
                    bundle, args, mesh, steps_per_call)
        else:
            step_fn, gen_tx = make_seq2seq_train_step(bundle, args)
            if steps_per_call > 1:
                from .resident import scan_single_state
                multi_step_fn = scan_single_state(step_fn.body)
        gen_state = make_net_state(gvars, gen_tx)
    elif model == "speech2gesture":
        if use_shard_map:
            from .s2g import (make_s2g_multi_step_shardmap,
                              make_s2g_train_step_shardmap)
            step_fn, gen_tx, dis_tx = make_s2g_train_step_shardmap(
                bundle, args, mesh)
            if steps_per_call > 1:
                multi_step_fn, _, _ = make_s2g_multi_step_shardmap(
                    bundle, args, mesh, steps_per_call)
        else:
            step_fn, gen_tx, dis_tx = make_s2g_train_step(bundle, args)
            if steps_per_call > 1:
                from .resident import scan_two_state
                multi_step_fn = scan_two_state(step_fn.body)
        gen_state = make_net_state(gvars, gen_tx)
        dis_state = make_net_state(dvars, dis_tx)
    else:
        raise ValueError(model)

    eval_step = make_eval_step(bundle, args,
                               np.array(args.mean_dir_vec).squeeze())

    # ---- device-resident dataset mode (train/resident.py): the whole
    # train + val sets live in HBM; steps gather microbatches in-graph ----
    resident_train = None
    fused_eval = None  # set in resident mode (make_fused_eval_pass)
    video_loader = test_loader  # sample videos keep the host loader
    if getattr(args, "device_resident_data", False):
        if tp_devices > 1:
            raise ValueError("--device_resident_data requires "
                             "tp_devices=1")
        from . import resident
        res_fields = resident.MODEL_FIELDS[model]
        res_dp = resident.mesh_dp(mesh)
        if res_dp > 1 and args.batch_size % res_dp:
            raise ValueError("--device_resident_data on a %d-device data "
                             "mesh needs batch_size %% %d == 0"
                             % (res_dp, res_dp))
        est = resident.estimate_bytes(train_loader.dataset) \
            + resident.estimate_bytes(test_loader.dataset)
        logging.info("device-resident data: ~%.2f GB estimated (%.2f GB "
                     "per device)", est / 1e9, est / 1e9 / res_dp)
        res_vids = (model == "multimodal_context"
                    and isinstance(speaker_model, Vocab))
        resident_train, resident_meta = resident.build_resident_data(
            train_loader.dataset, speaker_model, include_vids=res_vids,
            label="train", mesh=mesh, fields=res_fields)
        resident_val, _ = resident.build_resident_data(
            test_loader.dataset, speaker_model, include_vids=False,
            label="val", mesh=mesh, fields=res_fields)
        n_val_resident = len(test_loader.dataset)
        val_audio_len = test_loader.dataset.expected_audio_length
        test_loader = resident.ResidentBatchIterator(
            resident_val, n_val_resident, args.batch_size,
            audio_len=val_audio_len, mesh=mesh,
            include_tail=getattr(args, "eval_full_set", False))

        # --fused_eval_pass (default on): the whole val pass — gathers,
        # eval forwards, FGD embedding — runs as ONE jitted scan instead
        # of ~3 dispatches per batch over the device tunnel
        # (train/eval_steps.make_fused_eval_pass).  On a >1-device data
        # mesh the in-scan gathers are shard_map'd per resident shard
        # (VERDICT r3 item 5: the gate that reverted v5e-8 eval to
        # per-batch dispatch is gone).
        if getattr(args, "fused_eval_pass", True):
            fused_embed_apply = fused_embed_vars = None
            if embed_space_evaluator and model != "gesture_autoencoder":
                fused_embed_apply = embed_space_evaluator._embed
                fused_embed_vars = embed_space_evaluator.net_vars
            fused_eval = make_fused_eval_pass(
                bundle, args, np.array(args.mean_dir_vec).squeeze(),
                audio_len=val_audio_len,
                use_vids=(model == "multimodal_context"
                          and isinstance(speaker_model, Vocab)),
                embed_apply=fused_embed_apply, mesh=mesh)

        def _make_resident_fn():
            # shard_map strategy: same two-program shape (in-HBM gather
            # + fused scan), with the DataParallel-faithful per-shard
            # step bodies (VERDICT r3 item 6)
            if model == "multimodal_context":
                if use_shard_map:
                    from .gan import make_gan_resident_multi_step_shardmap
                    return make_gan_resident_multi_step_shardmap(
                        bundle, args, mesh)[0]
                from .gan import make_gan_resident_multi_step
                return make_gan_resident_multi_step(
                    bundle, args, steps_per_call, mesh=mesh)[0]
            if model in ("joint_embedding", "gesture_autoencoder"):
                emb_mode = "random" if model == "joint_embedding" else None
                if use_shard_map:
                    from .embed import (
                        make_embed_resident_multi_step_shardmap)
                    return make_embed_resident_multi_step_shardmap(
                        bundle, args, mesh, mode=emb_mode)[0]
                from .embed import make_embed_resident_multi_step
                return make_embed_resident_multi_step(
                    bundle, args, mode=emb_mode, mesh=mesh)[0]
            if model == "seq2seq":
                if use_shard_map:
                    from .seq2seq_step import (
                        make_seq2seq_resident_multi_step_shardmap)
                    return make_seq2seq_resident_multi_step_shardmap(
                        bundle, args, mesh)[0]
                from .seq2seq_step import make_seq2seq_resident_multi_step
                return make_seq2seq_resident_multi_step(bundle, args,
                                                        mesh=mesh)[0]
            if use_shard_map:
                from .s2g import make_s2g_resident_multi_step_shardmap
                return make_s2g_resident_multi_step_shardmap(
                    bundle, args, mesh)[0]
            from .s2g import make_s2g_resident_multi_step
            return make_s2g_resident_multi_step(bundle, args, mesh=mesh)[0]

        _resident_step = _make_resident_fn()

        def _resident_fn(k):  # jit respecializes per (K,B) stack shape
            return _resident_step

    # ---- optional true resume (beyond the reference, SURVEY.md §5: the
    # reference always restarts from epoch 0 after a crash) ----
    start_epoch = 0
    resume_path = getattr(args, "resume_checkpoint", "") or ""
    if resume_path:
        from flax import serialization
        ckpt = ckpt_lib.load_checkpoint(resume_path)
        start_epoch = ckpt["epoch"] + 1
        gen_tmpl = {"params": gen_state.params,
                    "batch_stats": gen_state.batch_stats}
        restored = serialization.from_bytes(gen_tmpl,
                                            ckpt["gen_vars_bytes"])
        gen_state = gen_state.replace(params=restored["params"],
                                      batch_stats=restored["batch_stats"])
        if ckpt["gen_opt_bytes"]:
            gen_state = gen_state.replace(opt_state=serialization.from_bytes(
                gen_state.opt_state, ckpt["gen_opt_bytes"]))
        if dis_state is not None and ckpt["dis_vars_bytes"]:
            dis_tmpl = {"params": dis_state.params,
                        "batch_stats": dis_state.batch_stats}
            restored_d = serialization.from_bytes(dis_tmpl,
                                                  ckpt["dis_vars_bytes"])
            dis_state = dis_state.replace(
                params=restored_d["params"],
                batch_stats=restored_d["batch_stats"])
            if ckpt["dis_opt_bytes"]:
                dis_state = dis_state.replace(
                    opt_state=serialization.from_bytes(
                        dis_state.opt_state, ckpt["dis_opt_bytes"]))
        logging.info("resumed from %s at epoch %d", resume_path, start_epoch)

    train_vid_indices = None
    if isinstance(speaker_model, Vocab) and \
            hasattr(train_loader, "dataset"):
        train_vid_indices = _dataset_vid_indices(train_loader.dataset,
                                                 speaker_model)

    # checkpoint writer: async (background device_get+encode+write from
    # an on-device snapshot; ~6-9 s/epoch measured synchronous at TED
    # scale) unless --async_checkpoint false.  atexit drain is the
    # safety net for exceptional exits so no queued save is ever lost.
    ckpt_writer = None
    if getattr(args, "async_checkpoint", True):
        ckpt_writer = async_ckpt.AsyncCheckpointWriter()
        atexit.register(ckpt_writer.drain)

    def _save_state_checkpoint(save_name, epoch, gen_state, dis_state):
        os.makedirs(args.model_save_path, exist_ok=True)
        device_tree = {
            "gen_vars": {"params": gen_state.params,
                         "batch_stats": gen_state.batch_stats},
            "gen_opt": gen_state.opt_state,
            "dis_vars": ({"params": dis_state.params,
                          "batch_stats": dis_state.batch_stats}
                         if dis_state is not None else None),
            "dis_opt": (dis_state.opt_state
                        if dis_state is not None else None),
        }
        host_state = {"args": args, "epoch": epoch,
                      "lang_model": lang_model,
                      "speaker_model": speaker_model, "pose_dim": pose_dim}
        if ckpt_writer is not None:
            snap = async_ckpt.snapshot_device_tree(device_tree)
            ckpt_writer.submit(ckpt_lib.save_checkpoint, snap, host_state,
                               save_name)
        else:
            state = dict(host_state)
            state.update(jax.device_get(device_tree))
            ckpt_lib.save_checkpoint(state, save_name)

    with mesh:
        if tp_devices > 1:
            # embedding tensor parallelism: large (vocab, dim) tables
            # row-shard over 'model'; XLA all-gathers looked-up rows on ICI
            from ..parallel import sharding_rules
            gen_state = sharding_rules.shard_state(gen_state, mesh)
            if dis_state is not None:
                dis_state = sharding_rules.shard_state(dis_state, mesh)
        else:
            gen_state = mesh_lib.replicate(gen_state, mesh)
            if dis_state is not None:
                dis_state = mesh_lib.replicate(dis_state, mesh)

        global_iter = start_epoch * len(train_loader)
        best_values = {}
        for epoch in range(start_epoch, n_epochs):
            # ---- evaluate FIRST (reference train.py:114-116) ----
            def current_gen_vars():
                return {"params": gen_state.params,
                        "batch_stats": gen_state.batch_stats}

            def _save_last_checkpoint():
                """Overwrite <name>_checkpoint_last.bin after each epoch's
                train pass: crash recovery / chunked --resume_checkpoint
                (beyond the reference, which can only restart from 0)."""
                _save_state_checkpoint(
                    "{}/{}_checkpoint_last.bin".format(
                        args.model_save_path, args.name),
                    epoch, gen_state, dis_state)

            # --eval_interval N (default 1 = the reference's every-epoch
            # eval): the TED-scale eval pass costs ~10 s/epoch (~20% of
            # the 100-epoch recipe's wall time); the final epoch always
            # evaluates so long runs end with a scored model
            is_best = False
            if epoch % eval_interval == 0 or epoch == n_epochs - 1:
                if fused_eval is not None:
                    val_metrics = evaluate_testset_resident_fused(
                        fused_eval, resident_val, n_val_resident,
                        fused_embed_vars, args, bundle,
                        current_gen_vars(), embed_space_evaluator,
                        speaker_model, rs, root_rng, mesh=mesh)
                else:
                    val_metrics = evaluate_testset(
                        test_loader, current_gen_vars(), eval_step,
                        bundle, args, embed_space_evaluator,
                        speaker_model, mesh, rs, root_rng)

                for key, value in val_metrics.items():
                    tb_writer.add_scalar(key + "/validation", value,
                                         global_iter)
                    # beat alignment and diversity score HIGHER-is-better
                    # (ops/quality.py, models/evaluator.get_diversity);
                    # everything else (losses, FGD, MAE) lower-is-better
                    hib = key in ("beat_align", "diversity",
                                  "diversity_real")
                    if key not in best_values or \
                            (value > best_values[key][0] if hib
                             else value < best_values[key][0]):
                        best_values[key] = (value, epoch)

                val_loss = val_metrics.get("frechet", val_metrics["loss"])
                is_best = val_loss < best_val_loss[0]
                if is_best:
                    logging.info("  *** BEST VALIDATION LOSS: %.3f", val_loss)
                    best_val_loss = (val_loss, epoch)
                else:
                    logging.info("  best validation loss so far: %.3f at "
                                 "EPOCH %d", best_val_loss[0],
                                 best_val_loss[1])
            else:
                logging.info("  (skipping eval at epoch %d, "
                             "--eval_interval %d)", epoch, eval_interval)

            # ---- checkpoint (reference train.py:136-157) ----
            if is_best or (epoch % save_model_interval == 0 and epoch > 0):
                if is_best:
                    save_name = "{}/{}_checkpoint_best.bin".format(
                        args.model_save_path, args.name)
                else:
                    save_name = "{}/{}_checkpoint_{:03d}.bin".format(
                        args.model_save_path, args.name, epoch)
                # optimizer state included: true resume (beyond reference)
                _save_state_checkpoint(save_name, epoch, gen_state,
                                       dis_state)

            # ---- sample videos (reference train.py:160-163) ----
            if args.save_result_video and epoch % save_sample_interval == 0:
                try:
                    evaluate_sample_and_save_video(
                        epoch, args.name, video_loader, current_gen_vars(),
                        eval_step, args, lang_model, speaker_model, rs)
                except Exception as e:  # video writing must never kill a run
                    logging.warning("sample video failed: %s", e)

            # ---- train pass ----
            # optional profiler capture (SURVEY.md §5 tracing: the
            # reference has none; we expose jax.profiler traces)
            profile_dir = os.environ.get("GG_PROFILE_DIR")
            if profile_dir and epoch == start_epoch:
                jax.profiler.start_trace(profile_dir)
                profiling = True
            else:
                profiling = False

            # device-side metric buffer: metrics stay on device between
            # print intervals so the train loop never blocks on a host
            # sync (the reference syncs every iteration via .item())
            pending = []

            def flush_pending():
                for it, bs, ld in jax.device_get(pending):
                    first = next(iter(ld.values()))
                    n_sub = len(first) if np.ndim(first) > 0 else 1
                    for k in range(n_sub):
                        for meter in loss_meters:
                            if meter.name in ld:
                                v = ld[meter.name]
                                meter.update(
                                    float(v[k] if np.ndim(v) else v), bs)
                        for key, value in ld.items():
                            scalar = float(value[k] if np.ndim(value)
                                           else value)
                            # failure detection (SURVEY.md §5: absent in
                            # the reference): a non-finite loss means the
                            # run is diverging — stop with context rather
                            # than silently training on garbage
                            if not np.isfinite(scalar):
                                _write_collapse_marker(
                                    args, key, scalar,
                                    it - n_sub + 1 + k, epoch)
                                if ckpt_writer is not None:
                                    # the "last good checkpoint" promise
                                    # below must hold before we abort
                                    ckpt_writer.drain()
                                raise FloatingPointError(
                                    "non-finite train metric %s=%r at "
                                    "iteration %d (epoch %d); last good "
                                    "checkpoint is in %s — resuming from "
                                    "it auto-applies the collapse "
                                    "playbook (see collapse_info.json)"
                                    % (key, scalar, it - n_sub + 1 + k,
                                       epoch, args.model_save_path))
                            tb_writer.add_scalar(key + "/train", scalar,
                                                 it - n_sub + 1 + k)
                pending.clear()

            def add_vids(batch):
                if speaker_model and isinstance(speaker_model, Vocab):
                    if train_vid_indices is not None and "aux_idx" in batch:
                        vids = train_vid_indices[batch["aux_idx"]]
                    else:
                        vids = np.asarray(
                            [speaker_model.word2index[v]
                             for v in batch["aux_vids"]], np.int32)
                    return dict(batch, vid_indices=vids)
                return batch

            def grouped_batches():
                """Yield lists of host batches: steps_per_call-sized groups
                for the fused multi-step path, singletons otherwise."""
                group = []
                for b in train_loader:
                    if multi_step_fn is None:
                        yield [b]
                        continue
                    group.append(b)
                    if len(group) == steps_per_call:
                        yield group
                        group = []
                if group:
                    for b in group:  # remainder runs as single steps
                        yield [b]

            interval_start_time = time.time()
            iter_idx = -1
            interval_iters = 0

            if resident_train is not None:
                # ---- device-resident train pass: only (K, B) int32
                # index stacks cross the host->device boundary ----
                train_d = (epoch > args.loss_warmup
                           and args.loss_gan_weight > 0.0)
                add_gan = epoch > args.loss_warmup
                batch_size = args.batch_size
                n_batches = len(train_loader)
                if resident_meta.dp > 1:
                    # per-device LOCAL permutations over each round-robin
                    # shard (documented deviation: the shuffle domain is
                    # per-shard — every batch draws batch_size/dp samples
                    # from each residue class i%dp — vs the reference's
                    # global RandomSampler)
                    bsl = batch_size // resident_meta.dp
                    idx_matrix = np.concatenate(
                        [rs.permutation(v)[:n_batches * bsl]
                         .reshape(n_batches, bsl)
                         for v in resident_meta.valid_local],
                        axis=1).astype(np.int32)
                else:
                    perm = rs.permutation(len(train_loader.dataset))
                    perm = perm[:n_batches * batch_size].astype(np.int32)
                    idx_matrix = perm.reshape(n_batches, batch_size)
                for s in range(0, n_batches, steps_per_call):
                    stack = idx_matrix[s:s + steps_per_call]
                    k = stack.shape[0]
                    iter_idx += k
                    interval_iters += k
                    rng = jax.random.fold_in(root_rng, global_iter + 1)
                    global_iter += k
                    if model == "multimodal_context":
                        gen_state, dis_state, loss_dict = _resident_fn(k)(
                            gen_state, dis_state, resident_train, stack,
                            rng, train_d=train_d, add_gan=add_gan)
                    elif model == "speech2gesture":
                        gen_state, dis_state, loss_dict = _resident_fn(k)(
                            gen_state, dis_state, resident_train, stack,
                            rng)
                    else:
                        gen_state, loss_dict = _resident_fn(k)(
                            gen_state, resident_train, stack, rng)
                    pending.append((global_iter, batch_size, loss_dict))
                    if profiling:
                        # one fused call (<= steps_per_call steps) is a
                        # full trace; stop so the file gets written
                        jax.profiler.stop_trace()
                        profiling = False
                    if interval_iters >= print_interval:
                        flush_pending()
                        summary = ("EP {} ({:3d}) | {:>8s}, "
                                   "{:.0f} samples/s | ").format(
                            epoch, iter_idx + 1, time_since(start),
                            batch_size * interval_iters
                            / max(1e-6, time.time() - interval_start_time))
                        for meter in loss_meters:
                            if meter.count > 0:
                                summary += "{}: {:.3f}, ".format(
                                    meter.name, meter.avg)
                                meter.reset()
                        logging.info(summary)
                        interval_start_time = time.time()
                        interval_iters = 0
                flush_pending()
                _save_last_checkpoint()
                continue

            for group in grouped_batches():
                iter_idx += len(group)
                interval_iters += len(group)
                if profiling and iter_idx >= 8:
                    jax.profiler.stop_trace()
                    profiling = False
                batch_size = group[0]["target_vec"].shape[0]
                train_d = (epoch > args.loss_warmup
                           and args.loss_gan_weight > 0.0) \
                    if model == "multimodal_context" else False
                add_gan = epoch > args.loss_warmup

                if multi_step_fn is not None and len(group) == steps_per_call:
                    # fused path: one compiled program runs the whole group
                    batches = [add_vids(b) for b in group]
                    keys = [k for k in batches[0]
                            if isinstance(batches[0][k], np.ndarray)
                            and batches[0][k].dtype != object
                            and not k.startswith("aux_")]
                    stacked = {k: np.stack([b[k] for b in batches])
                               for k in keys}
                    # shard the microbatch axis-1 (batch) over the mesh
                    from jax.sharding import NamedSharding, PartitionSpec
                    sh = NamedSharding(
                        mesh, PartitionSpec(None, mesh_lib.DATA_AXIS))
                    stacked = {k: jax.device_put(v, sh)
                               for k, v in stacked.items()}
                    rng = jax.random.fold_in(root_rng, global_iter + 1)
                    global_iter += len(group)
                    if model == "multimodal_context":
                        gen_state, dis_state, loss_dict = multi_step_fn(
                            gen_state, dis_state, stacked, rng,
                            train_d=train_d, add_gan=add_gan)
                    elif model == "speech2gesture":
                        gen_state, dis_state, loss_dict = multi_step_fn(
                            gen_state, dis_state, stacked, rng)
                    else:
                        gen_state, loss_dict = multi_step_fn(
                            gen_state, stacked, rng)
                    pending.append((global_iter, batch_size, loss_dict))
                else:
                    for batch in group:
                        global_iter += 1
                        batch = add_vids(batch)
                        dbatch = _device_batch(batch, mesh)
                        rng = jax.random.fold_in(root_rng, global_iter)
                        if model == "multimodal_context":
                            gen_state, dis_state, loss_dict = step_fn(
                                gen_state, dis_state, dbatch, rng,
                                train_d=train_d, add_gan=add_gan)
                        elif model == "speech2gesture":
                            gen_state, dis_state, loss_dict = step_fn(
                                gen_state, dis_state, dbatch, rng)
                        else:
                            gen_state, loss_dict = step_fn(gen_state, dbatch,
                                                           rng)
                        pending.append((global_iter, batch_size, loss_dict))

                if interval_iters >= print_interval:
                    flush_pending()  # one host sync per interval
                    summary = "EP {} ({:3d}) | {:>8s}, {:.0f} samples/s | ".format(
                        epoch, iter_idx + 1, time_since(start),
                        batch_size * interval_iters
                        / max(1e-6, time.time() - interval_start_time))
                    for meter in loss_meters:
                        if meter.count > 0:
                            summary += "{}: {:.3f}, ".format(meter.name,
                                                             meter.avg)
                            meter.reset()
                    logging.info(summary)
                    interval_start_time = time.time()
                    interval_iters = 0

            flush_pending()
            _save_last_checkpoint()
            if profiling:
                jax.profiler.stop_trace()

    if ckpt_writer is not None:
        ckpt_writer.close()
        atexit.unregister(ckpt_writer.drain)
    tb_writer.close()
    logging.info("--------- best loss values ---------")
    for key in best_values:
        logging.info("%s: %.3f at EPOCH %d", key, best_values[key][0],
                     best_values[key][1])
    return gen_state, dis_state, best_values


def evaluate_testset(test_loader, gen_vars, eval_step, bundle, args,
                     embed_space_evaluator, speaker_model, mesh, rs,
                     root_rng):
    """Validation pass (reference train.py:234-329)."""
    if embed_space_evaluator:
        embed_space_evaluator.reset()
    losses = AverageMeter("loss")
    joint_mae = AverageMeter("mae_on_joint")
    accel = AverageMeter("accel")
    beat = AverageMeter("beat_align")
    start = time.time()

    # per-batch metrics stay on device; ONE host sync per eval pass at the
    # end (the train loop got this treatment in round 1, the eval loop
    # synced float(loss) every batch)
    dp = mesh_lib.data_parallel_size(mesh)
    pending = []  # (n_valid, loss, mae, acc, beat) with device scalars
    for i, batch in enumerate(test_loader):
        # --eval_full_set tail handling: the final partial batch arrives
        # either at its natural smaller size (host iterator / resident
        # dp==1 — exact, jit respecializes once per remainder size) or
        # pre-masked by the resident iterator (__mask__).  A smaller
        # host batch that does not divide a >1-device data mesh is
        # padded (repeat-last) and masked here.
        mask = batch.pop("__mask__", None) if isinstance(batch, dict) \
            else None
        n_valid = int(mask.sum()) if mask is not None \
            else batch["target_vec"].shape[0]
        if mask is None and dp > 1 and batch["target_vec"].shape[0] % dp:
            r_pad = -(-n_valid // dp) * dp
            num = {k: v for k, v in batch.items()
                   if isinstance(v, np.ndarray) and v.dtype != object
                   and not k.startswith("aux_")}
            batch, _ = mesh_lib.pad_batch_to(num, r_pad)
            mask = (np.arange(r_pad) < n_valid).astype(np.float32)
        batch_size = batch["target_vec"].shape[0]
        vids = None
        if speaker_model and isinstance(speaker_model, Vocab):
            vids = _random_vids(speaker_model, batch_size, rs)
        dbatch = _device_batch(batch, mesh)
        dvids = mesh_lib.shard_batch(vids, mesh) if vids is not None else None
        dmask = mesh_lib.shard_batch(mask, mesh) if mask is not None else None
        rng = jax.random.fold_in(root_rng, 777_000 + i)

        loss, out, mae, acc, bt = eval_step(gen_vars, dbatch, dvids, rng,
                                            dmask)
        if bundle.model_name != "gesture_autoencoder" and \
                embed_space_evaluator:
            # feature embedding also stays on device (evaluator syncs
            # once in get_scores)
            embed_space_evaluator.push_samples(
                dbatch.get("in_text"), dbatch.get("in_audio"), out,
                dbatch["target_vec"], mask=dmask)
        pending.append((n_valid, loss, mae, acc, bt))

    for batch_size, loss, mae, acc, bt in jax.device_get(pending):
        losses.update(float(loss), batch_size)
        if bundle.model_name != "gesture_autoencoder":
            joint_mae.update(float(mae), batch_size)
            accel.update(float(acc), batch_size)
            if np.isfinite(bt):  # NaN = audio-less model (eval_steps)
                beat.update(float(bt), batch_size)

    return _finish_eval(losses, joint_mae, accel, embed_space_evaluator,
                        start, beat=beat)


def _finish_eval(losses, joint_mae, accel, embed_space_evaluator, start,
                 beat=None):
    """Shared validation-pass epilogue (metrics dict + [VAL] log line).

    Beyond the reference's loss/MAE/FGD (train.py:234-329) this reports
    beat alignment (ops/quality.py) and feature-space diversity
    (models/evaluator.get_diversity) — complementary quality axes so
    late-run regressions register after FGD saturates (VERDICT r4
    item 5)."""
    if losses.count == 0:
        # val set smaller than one batch (drop-last iterator yields
        # nothing): don't report 0.0 or crown an untrained net "best"
        logging.warning("val pass saw no full batches; reporting inf loss")
        return {"loss": float("inf"), "joint_mae": float("inf")}
    ret = {"loss": losses.avg, "joint_mae": joint_mae.avg}
    extra = ""
    if beat is not None and beat.count > 0:
        ret["beat_align"] = beat.avg
        extra += ", beat: %.3f" % beat.avg
    elapsed = time.time() - start
    if embed_space_evaluator and embed_space_evaluator.get_no_of_samples() > 0:
        frechet_dist, feat_dist = embed_space_evaluator.get_scores()
        div_gen, div_real = embed_space_evaluator.get_diversity()
        logging.info(
            "[VAL] loss: %.3f, joint mae: %.5f, accel diff: %.5f, "
            "FGD: %.3f, feat_D: %.3f, div: %.3f/%.3f%s (%d samples) "
            "/ %.1fs",
            losses.avg, joint_mae.avg, accel.avg, frechet_dist, feat_dist,
            div_gen, div_real, extra, losses.count, elapsed)
        ret["frechet"] = frechet_dist
        ret["feat_dist"] = feat_dist
        ret["diversity"] = div_gen
        ret["diversity_real"] = div_real
    else:
        logging.info("[VAL] loss: %.3f, joint mae: %.3f%s (%d samples) "
                     "/ %.1fs", losses.avg, joint_mae.avg, extra,
                     losses.count, elapsed)
    return ret


def evaluate_testset_resident_fused(fused_pass, resident_val, n_val,
                                    embed_vars, args, bundle, gen_vars,
                                    embed_space_evaluator, speaker_model,
                                    rs, root_rng, batch_size=None,
                                    mesh=None):
    """The resident-data validation pass in ONE device dispatch
    (train/eval_steps.make_fused_eval_pass).

    Identical numbers to evaluate_testset over a ResidentBatchIterator:
    same batch composition (sequential row ranges, drop-last unless
    --eval_full_set appends the masked tail), same per-batch rng stream
    (fold_in(root_rng, 777000+k)), same host speaker draws.  What
    changes is dispatch count: the per-batch path costs ~3 tunnel
    round-trips per batch; this costs one per epoch.

    On a >1-device data mesh (VERDICT r3 item 5) index rows use the
    iterator's LOCAL layout — device d's block at columns [d*B/dp,
    (d+1)*B/dp), which under the round-robin sharding gathers exactly
    the global rows [bi*B, (bi+1)*B) — and the --eval_full_set tail row
    embeds resident.tail_local_layout's per-device rows (masked), the
    same sample set the per-batch path evaluates."""
    from .resident import mesh_dp, tail_local_layout
    if embed_space_evaluator:
        embed_space_evaluator.reset()
    losses = AverageMeter("loss")
    joint_mae = AverageMeter("mae_on_joint")
    accel = AverageMeter("accel")
    beat = AverageMeter("beat_align")
    start = time.time()

    bs = batch_size or args.batch_size
    dp = mesh_dp(mesh)
    bsl = bs // dp
    n_full = n_val // bs
    if dp > 1:
        idx_rows = [np.tile(np.arange(bi * bsl, (bi + 1) * bsl,
                                      dtype=np.int32), dp)
                    for bi in range(n_full)]
    else:
        idx_rows = [np.arange(bi * bs, (bi + 1) * bs, dtype=np.int32)
                    for bi in range(n_full)]
    mask_rows = [np.ones(bs, np.float32)] * n_full
    tail_vids_n = None  # dp>1 tail: vids drawn like the per-batch path
    r = n_val - n_full * bs
    if getattr(args, "eval_full_set", False) and r > 0:
        if dp > 1:
            t_idx, t_mask = tail_local_layout(n_val, n_full * bs, dp)
            r_local = t_idx.shape[1]
            row_i = np.zeros(bs, np.int32)
            row_m = np.zeros(bs, np.float32)
            for d in range(dp):
                row_i[d * bsl:d * bsl + r_local] = t_idx[d]
                row_m[d * bsl:d * bsl + r_local] = t_mask[d]
            idx_rows.append(row_i)
            mask_rows.append(row_m)
            tail_vids_n = dp * r_local
        else:
            tail = np.arange(n_full * bs, n_val, dtype=np.int32)
            idx_rows.append(np.concatenate(
                [tail, np.full(bs - r, tail[-1], np.int32)]))
            mask_rows.append(np.concatenate(
                [np.ones(r, np.float32), np.zeros(bs - r, np.float32)]))
    if not idx_rows:
        logging.warning("val pass saw no full batches; reporting inf loss")
        return {"loss": float("inf"), "joint_mae": float("inf")}
    idx_stack = np.stack(idx_rows)
    mask_stack = np.stack(mask_rows)
    n_batches = idx_stack.shape[0]
    if speaker_model and isinstance(speaker_model, Vocab):
        # one rs draw per batch, like the per-batch path; the dp>1 tail
        # batch draws the per-batch path's (smaller) count and scatters
        # the blocks into the local layout so real rows pair with the
        # same speaker draws
        vids_rows = []
        for bi in range(n_batches):
            if tail_vids_n is not None and bi == n_batches - 1:
                draws = _random_vids(speaker_model, tail_vids_n, rs)
                r_local = tail_vids_n // dp
                row = np.zeros(bs, np.int32)
                for d in range(dp):
                    row[d * bsl:d * bsl + r_local] = \
                        draws[d * r_local:(d + 1) * r_local]
                vids_rows.append(row)
            else:
                vids_rows.append(_random_vids(speaker_model, bs, rs))
        vids_stack = np.stack(vids_rows)
    else:
        vids_stack = np.zeros((n_batches, bs), np.int32)

    ys = fused_pass(gen_vars, embed_vars, resident_val, idx_stack,
                    vids_stack, mask_stack, root_rng)
    if embed_space_evaluator and "gen_feat" in ys:
        embed_space_evaluator.push_feature_stack(
            ys["gen_feat"], ys["real_feat"], ys["recon_fake"],
            ys["recon_real"], mask=mask_stack)
    loss_k, mae_k, acc_k, beat_k, cnt_k = jax.device_get(
        (ys["loss"], ys["mae"], ys["accel"], ys["beat"], ys["count"]))
    for i in range(n_batches):
        n = int(cnt_k[i])
        losses.update(float(loss_k[i]), n)
        if bundle.model_name != "gesture_autoencoder":
            joint_mae.update(float(mae_k[i]), n)
            accel.update(float(acc_k[i]), n)
            if np.isfinite(beat_k[i]):
                beat.update(float(beat_k[i]), n)
    return _finish_eval(losses, joint_mae, accel, embed_space_evaluator,
                        start, beat=beat)


def evaluate_sample_and_save_video(epoch, prefix, test_loader, gen_vars,
                                   eval_step, args, lang_model,
                                   speaker_model, rs, n_save=None,
                                   save_path=None):
    """Render a few val samples to MP4 (reference train.py:332-428)."""
    from ..utils.video import create_video_and_save
    if not n_save:
        n_save = 1 if epoch <= 0 else 5

    out_raw = []
    for iter_idx, batch in enumerate(test_loader):
        if iter_idx >= n_save:
            break
        one = {k: (v[:1] if isinstance(v, np.ndarray) else v[:1])
               for k, v in batch.items()}
        vids = None
        if speaker_model and isinstance(speaker_model, Vocab):
            vids = _random_vids(speaker_model, 1, rs)
        rng = jax.random.PRNGKey(9000 + iter_idx)
        num = {k: v for k, v in one.items()
               if isinstance(v, np.ndarray) and v.dtype != object}
        _, out, *_ = eval_step(gen_vars, num, vids, rng)

        sentence = ""
        if lang_model is not None and "in_text" in one:
            words = [lang_model.index2word[int(w)]
                     for w in one["in_text"][0] if int(w) > 0]
            sentence = " ".join(words)

        target = np.asarray(one["target_vec"][0])
        out_vec = np.asarray(out[0])
        mean_data = np.array(args.mean_dir_vec).squeeze().reshape(-1, 3)
        save_dir = save_path or args.model_save_path
        os.makedirs(save_dir, exist_ok=True)
        audio = one.get("in_audio")
        audio_npy = np.asarray(audio[0]) if audio is not None else None
        if audio_npy is not None and audio_npy.dtype == np.int16:
            # int16 PCM transfer mode (--audio_int16_transfer)
            from .common import AUDIO_INT16_SCALE
            audio_npy = audio_npy.astype(np.float32) / AUDIO_INT16_SCALE

        # time-range overlay (reference train.py:376-380)
        aux_str = None
        if "aux_vids" in one and "aux_times" in one:
            t0, t1 = (float(x) for x in np.asarray(one["aux_times"])[0])
            aux_str = "({}, time: {}-{})".format(
                one["aux_vids"][0],
                str(datetime.timedelta(seconds=t0)),
                str(datetime.timedelta(seconds=t1)))

        create_video_and_save(
            save_dir, epoch, prefix, iter_idx, target, out_vec, mean_data,
            sentence, audio=audio_npy, aux_str=aux_str)
        # artifact contract (reference train.py:415-423): dir-vecs as
        # (T, 9, 3) + mean, plus audio and the aux string
        out_raw.append({
            "sentence": sentence,
            "audio": audio_npy,
            "human_dir_vec": target.reshape(target.shape[0], -1, 3)
            + mean_data,
            "out_dir_vec": out_vec.reshape(out_vec.shape[0], -1, 3)
            + mean_data,
            "aux_info": aux_str,
        })
    return out_raw
