"""FGD feature-extractor trainer (H3.6M pose autoencoder).

Behavioral contract: reference scripts/train_feature_extractor.py:100-237 —
`python scripts/train_feature_extractor.py --config=config/gesture_autoencoder.yml`
trains EmbeddingNet(mode='pose') on Human3.6M windows with recon +
pose-diff L1 loss, eval-first epochs, best-checkpointing, sample videos.
"""

import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from gesture_generation_from_trimodal_context_tpu.config.parse_args import parse_args
from gesture_generation_from_trimodal_context_tpu.data.h36m import Human36M
from gesture_generation_from_trimodal_context_tpu.models import factory
from gesture_generation_from_trimodal_context_tpu.train import checkpoint as ckpt_lib
from gesture_generation_from_trimodal_context_tpu.train.embed import (
    make_embed_eval_step, make_embed_train_step)
from gesture_generation_from_trimodal_context_tpu.train.state import make_net_state
from gesture_generation_from_trimodal_context_tpu.utils.average_meter import AverageMeter
from gesture_generation_from_trimodal_context_tpu.utils.logging_utils import (
    set_logger, set_random_seed, time_since)

POSE_DIM = 27
H36M_PATH = "data/h36m/data_3d_h36m.npz"


def evaluate_testset(dataset, eval_step, gen_vars, batch_size,
                     full_set=False):
    losses = AverageMeter("loss")
    start = time.time()
    n_batches = len(dataset) // batch_size
    if len(dataset) == 0:
        logging.warning("val set is empty; reporting inf loss")
        return {"loss": float("inf")}
    if n_batches == 0:
        # val set smaller than one batch (tiny/smoke datasets): evaluate
        # all rows in a single short batch instead of silently reporting
        # 0.0 and checkpointing an untrained net as "best"
        batch_size = len(dataset)
        n_batches = 1
        logging.warning("val set (%d) smaller than batch; evaluating one "
                        "short batch", batch_size)
    spans = [(bi * batch_size, (bi + 1) * batch_size)
             for bi in range(n_batches)]
    if full_set and n_batches * batch_size < len(dataset):
        # --eval_full_set: the tail runs at its natural smaller size
        # (one extra jit specialization, constant across epochs)
        spans.append((n_batches * batch_size, len(dataset)))
    pending = []  # device scalars; ONE host sync for the whole pass
    for bi, (lo, hi) in enumerate(spans):
        batch = dataset.make_batch(np.arange(lo, hi))
        loss, _ = eval_step(gen_vars["params"], gen_vars["batch_stats"],
                            {"target_vec": batch["target_vec"]},
                            jax.random.PRNGKey(bi))
        pending.append((hi - lo, loss))
    for n, loss in jax.device_get(pending):
        losses.update(float(loss), n)
    logging.info("[VAL] loss: %.3f (%d samples) / %.1fs", losses.avg,
                 losses.count, time.time() - start)
    return {"loss": losses.avg}


def main(args, h36m_path=None, trial_epochs=None):
    if args.random_seed >= 0:
        set_random_seed(args.random_seed)
    set_logger(args.model_save_path, "train_feature_extractor.log")

    path = h36m_path or H36M_PATH
    mean_dir_vec = np.squeeze(np.array(args.mean_dir_vec))
    # --h36m_augment: gaussian joint noise on training windows.  The
    # reference implements but never enables this (h36m_loader.py:44-56);
    # default off for parity.
    augment = bool(getattr(args, "h36m_augment", False))
    train_dataset = Human36M(path, mean_dir_vec, is_train=True,
                             augment=augment)
    val_dataset = Human36M(path, mean_dir_vec, is_train=False, augment=False)
    aug_rs = np.random.RandomState(max(args.random_seed, 0)) if augment \
        else None
    logging.info("h36m windows: train %d, val %d", len(train_dataset),
                 len(val_dataset))

    from gesture_generation_from_trimodal_context_tpu.utils import (
        compile_cache, platforms)
    compile_cache.enable()
    platforms.enable_host_cpu()
    bundle = factory.init_model(args, None, None, POSE_DIM)
    # eager flax/optax init on the host cpu (utils/platforms.py), then
    # one bulk device_put of the finished state
    rng = jax.random.PRNGKey(max(args.random_seed, 0))
    with platforms.host_init_context():
        init_rng = jax.random.PRNGKey(max(args.random_seed, 0))
        gvars = factory.generator_init_variables(bundle, args, init_rng)
    # pose-diff term enabled (reference train_feature_extractor.py:67-70)
    step_fn, tx = make_embed_train_step(bundle, args, use_pose_diff=True)
    eval_step = make_embed_eval_step(bundle)
    with platforms.host_init_context():
        state = make_net_state(gvars, tx)
    default_dev = jax.devices()[0]
    if default_dev.platform != "cpu":
        state = jax.device_put(state, default_dev)
    # --steps_per_call K: fuse K iterations per dispatch (same scan
    # fusion the main driver uses; amortizes per-call dispatch latency)
    steps_per_call = max(1, getattr(args, "steps_per_call", 1) or 1)
    multi_step = None
    if steps_per_call > 1:
        from gesture_generation_from_trimodal_context_tpu.train.resident \
            import scan_single_state
        multi_step = scan_single_state(step_fn.body)

    start = time.time()
    best_val_loss = (1e10, 0)
    batch_size = args.batch_size
    n_epochs = trial_epochs or args.epochs
    n_batches = len(train_dataset) // batch_size
    print_interval = max(1, int(n_batches / 5))
    loss_meter = AverageMeter("loss")
    rs = np.random.RandomState(max(args.random_seed, 0))

    global_iter = 0
    for epoch in range(n_epochs):
        gen_vars = {"params": state.params, "batch_stats": state.batch_stats}
        val_metrics = evaluate_testset(
            val_dataset, eval_step, gen_vars, batch_size,
            full_set=getattr(args, "eval_full_set", False))
        val_loss = val_metrics["loss"]
        is_best = val_loss < best_val_loss[0]
        if is_best:
            logging.info("  *** BEST VALIDATION LOSS: %.3f", val_loss)
            best_val_loss = (val_loss, epoch)
            os.makedirs(args.model_save_path, exist_ok=True)
            save_name = "{}/{}_checkpoint_best.bin".format(
                args.model_save_path, args.name)
            ckpt_lib.save_checkpoint({
                "args": args, "epoch": epoch, "lang_model": None,
                "speaker_model": None, "pose_dim": POSE_DIM,
                "gen_vars": jax.device_get(gen_vars), "dis_vars": None,
            }, save_name)
        else:
            logging.info("  best validation loss so far: %.3f at EPOCH %d",
                         best_val_loss[0], best_val_loss[1])

        order = np.arange(len(train_dataset))
        rs.shuffle(order)
        interval_start = time.time()
        interval_iters = 0
        pending = []  # (n_steps, loss device array); sync per interval

        def flush_pending():
            for k, loss in jax.device_get(pending):
                for j in range(k):
                    loss_meter.update(
                        float(loss[j] if np.ndim(loss) else loss),
                        batch_size)
            pending.clear()

        bi = 0
        while bi < n_batches:
            k = steps_per_call if multi_step is not None else 1
            k = min(k, n_batches - bi)
            if multi_step is not None and k == steps_per_call:
                stacked = np.stack([
                    train_dataset.make_batch(
                        order[(bi + j) * batch_size:
                              (bi + j + 1) * batch_size],
                        rng=aug_rs)["target_vec"] for j in range(k)])
                global_iter += k
                state, metrics = multi_step(
                    state, {"target_vec": stacked},
                    jax.random.fold_in(rng, global_iter))
                pending.append((k, metrics["loss"]))
            else:
                k = 1
                global_iter += 1
                batch = train_dataset.make_batch(
                    order[bi * batch_size:(bi + 1) * batch_size],
                    rng=aug_rs)
                state, metrics = step_fn(
                    state, {"target_vec": batch["target_vec"]},
                    jax.random.fold_in(rng, global_iter))
                pending.append((1, metrics["loss"]))
            bi += k
            interval_iters += k
            if interval_iters >= print_interval:
                flush_pending()
                logging.info(
                    "EP %d (%3d) | %8s, %.0f samples/s | loss: %.3f",
                    epoch, bi, time_since(start),
                    batch_size * interval_iters
                    / max(1e-6, time.time() - interval_start),
                    loss_meter.avg)
                loss_meter.reset()
                interval_start = time.time()
                interval_iters = 0
        flush_pending()

    return best_val_loss


if __name__ == "__main__":
    main(parse_args())
