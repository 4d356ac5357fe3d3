"""Arbitrary-length gesture synthesis via sliding-window autoregression.

Behavioral contract: reference scripts/synthesize.py:36-209
(generate_gestures):
- windows of n_poses frames with stride n_poses - n_pre_poses,
  num_subdivision = ceil((clip_len - unit_time)/stride_time) + 1,
- per window: fixed-length audio slice (zero-pad at the end), word
  tensors from the word/timestamp list, previous window's last
  n_pre_poses outputs as the next seed (constraint bit = 1),
- linear crossfade over the n_pre_poses-frame overlap,
- seq2seq extra cubic-polyfit smoothing at window joins,
- optional fade-out to the mean pose near the padded tail.

TPU design: all per-window inputs are precomputed on the host and the
WHOLE autoregressive window chain runs as ONE jitted `lax.scan` whose
carry is the n_pre_poses-frame seed (the only inter-window dependency) —
one device dispatch per clip instead of one per window, which matters
wherever dispatch latency dwarfs the ~0.25 ms window forward (the axon
tunnel costs ~100 ms/roundtrip; a real TPU host still pays a launch per
window).  Window counts are padded up to power-of-two buckets so any
clip length hits one of a few compiled programs (padded windows repeat
the last real window's inputs and are discarded on the host).  The
per-window host-loop path is kept (`fused=False` / GG_FUSED_SYNTH=0)
and is equivalence-pinned against the fused scan in
tests/test_fused_synthesis.py.

Known reference bug NOT reproduced: the speech2gesture spectrogram window
start is computed against spectrogram.shape[0] (=128 mel bins) instead of
the time axis (reference synthesize.py:90); we index the time axis.
"""

import logging
import math
import os
import random
import time

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import audio as audio_ops


WORD_CAP = 64  # fixed word capacity per window (single compile)


def _apply_window(bundle, args, gen_vars, pre_seq, extended, in_audio,
                  in_spec, word_ids, word_lengths, vid, rng):
    """One generator forward on one (batch-1) window; shared by the
    per-window jit path and the fused-scan body (reference
    synthesize.py:128-143 model dispatch)."""
    gen, model = bundle.generator, bundle.model_name
    rngs = {"noise": rng, "dropout": jax.random.fold_in(rng, 1)}
    if model == "multimodal_context":
        out, *_ = gen.apply(gen_vars, pre_seq, extended, in_audio, vid,
                            train=False, rngs=rngs)
    elif model == "joint_embedding":
        res = gen.apply(gen_vars, extended, in_audio,
                        pre_seq[:, :args.n_pre_poses, :-1], None,
                        "speech", train=False, rngs=rngs)
        out = res[6]
    elif model == "seq2seq":
        out = gen.apply(gen_vars, word_ids, word_lengths,
                        pre_seq[:, :, :-1], train=False, rngs=rngs)
    elif model == "speech2gesture":
        out = gen.apply(gen_vars, in_spec,
                        pre_seq[:, :args.n_pre_poses, :-1],
                        train=False, rngs=rngs)
    else:
        raise ValueError(model)
    return out


def _fn_cache(bundle):
    # ModelBundle is a plain dataclass; stash compiled fns on the
    # instance so repeated generate_gestures calls (e.g. from_db_clip
    # over many clips, the server loop) reuse the jit trace instead of
    # re-tracing per call.
    return bundle.__dict__.setdefault("_synth_fn_cache", {})


def _get_window_fn(bundle, args, impl):
    cache = _fn_cache(bundle)
    key = ("window", impl)
    if key not in cache:
        def run(gen_vars, pre_seq, in_text, in_audio, in_spec, word_seq,
                word_lengths, vid, rng):
            return _apply_window(bundle, args, gen_vars, pre_seq, in_text,
                                 in_audio, in_spec, word_seq, word_lengths,
                                 vid, rng)
        cache[key] = jax.jit(run)
    return cache[key]


def _get_fused_fn(bundle, args, n_windows, impl):
    cache = _fn_cache(bundle)
    key = ("fused", n_windows, impl)
    if key not in cache:
        n_pre = args.n_pre_poses

        def fused(gen_vars, extended, in_audio, in_spec, word_ids,
                  word_lengths, init_tail, init_con, vid, rng):
            n_frames = extended.shape[1]
            pose_dim = init_tail.shape[-1]

            def body(carry, xs):
                tail, con = carry
                i, ext, aud, spec, wids, wlen = xs
                pre_seq = jnp.zeros((1, n_frames, pose_dim + 1),
                                    jnp.float32)
                pre_seq = pre_seq.at[0, :n_pre, :-1].set(tail)
                pre_seq = pre_seq.at[0, :n_pre, -1].set(con)
                out = _apply_window(
                    bundle, args, gen_vars, pre_seq, ext[None], aud[None],
                    spec[None], wids[None], wlen[None], vid,
                    jax.random.fold_in(rng, i))
                new_carry = (out[0, -n_pre:],
                             jnp.ones((n_pre,), jnp.float32))
                return new_carry, out[0]

            xs = (jnp.arange(n_windows, dtype=jnp.int32), extended,
                  in_audio, in_spec, word_ids, word_lengths)
            _, outs = jax.lax.scan(body, (init_tail, init_con), xs)
            return outs

        cache[key] = jax.jit(fused)
    return cache[key]


def _bucket(n):
    """Pad window counts to power-of-two buckets: any clip length maps
    to one of ~log2(max windows) compiled fused programs."""
    return 1 << max(0, (n - 1).bit_length())


def _get_batched_fused_fn(bundle, args, n_windows, n_clips, impl):
    """Fused window chain with a CLIP batch axis: C independent clips
    (same padded window count) advance their seed carries in lockstep
    through one scan.  The body `jax.vmap`s the single-clip window
    forward over the clip axis with PER-CLIP rng keys, so each lane
    computes exactly what its single-clip run would (vmap of the B=1
    apply == stacked B=1 applies) while the per-step matmuls carry C
    rows instead of 1 — the B=1 window forward badly underfills the
    MXU (measured 0.25-0.30 ms ~ dispatch floor), so test-set-scale
    generation throughput rises ~linearly in C until the MXU fills."""
    cache = _fn_cache(bundle)
    key = ("fused_batch", n_windows, n_clips, impl)
    if key not in cache:
        n_pre = args.n_pre_poses

        def fused(gen_vars, extended, in_audio, in_spec, word_ids,
                  word_lengths, init_tail, init_con, vid, rngs):
            # window-major stacking: extended (W, C, T), audio (W, C, L),
            # spec (W, C, M, S), word_ids (W, C, cap), word_lengths (W, C);
            # init_tail (C, n_pre, D), init_con (C, n_pre), vid (C,),
            # rngs (C,) PRNG keys
            n_frames = extended.shape[-1]
            pose_dim = init_tail.shape[-1]

            def one_clip(tail, con, ext, aud, spec, wids, wlen, v, key):
                pre_seq = jnp.zeros((1, n_frames, pose_dim + 1),
                                    jnp.float32)
                pre_seq = pre_seq.at[0, :n_pre, :-1].set(tail)
                pre_seq = pre_seq.at[0, :n_pre, -1].set(con)
                out = _apply_window(
                    bundle, args, gen_vars, pre_seq, ext[None], aud[None],
                    spec[None], wids[None], wlen[None], v[None], key)
                return out[0]

            def body(carry, xs):
                tail, con = carry
                i, ext, aud, spec, wids, wlen = xs
                keys = jax.vmap(
                    lambda k: jax.random.fold_in(k, i))(rngs)
                out = jax.vmap(one_clip)(tail, con, ext, aud, spec, wids,
                                         wlen, vid, keys)
                new_carry = (out[:, -n_pre:],
                             jnp.ones(out.shape[:1] + (n_pre,),
                                      jnp.float32))
                return new_carry, out

            xs = (jnp.arange(n_windows, dtype=jnp.int32), extended,
                  in_audio, in_spec, word_ids, word_lengths)
            _, outs = jax.lax.scan(body, (init_tail, init_con), xs)
            return outs  # (W, C, n_frames, pose_dim)

        cache[key] = jax.jit(fused)
    return cache[key]


def _prepare_windows(args, bundle, lang_model, audio, words, audio_sr,
                     num_subdivision, unit_time, stride_time, clip_length,
                     audio_sample_length, spectrogram_sample_length,
                     spectrogram, use_spectrogram):
    """Host-side assembly of every window's model inputs, stacked on a
    leading window axis (reference synthesize.py:84-126, minus the seed
    chaining which is the scan carry / host loop)."""
    from ..data.preprocessor import get_words_in_time_range

    n_frames = args.n_poses
    n = num_subdivision
    ext_all = np.zeros((n, n_frames), np.int32)
    wid_all = np.zeros((n, WORD_CAP), np.int32)
    wlen_all = np.zeros((n,), np.int32)
    aud_all = np.zeros((n, audio_sample_length), np.float32)
    if use_spectrogram:
        spec_all = np.zeros((n, audio_ops.N_MELS,
                             spectrogram_sample_length), np.float32)
    else:
        # unused by the model dispatch; keep the device transfer tiny
        spec_all = np.zeros((n, 1, 1), np.float32)
    end_padding_duration = 0

    for i in range(n):
        start_time = i * stride_time
        end_time = start_time + unit_time

        if use_spectrogram:
            a0 = math.floor(start_time / clip_length * spectrogram.shape[1])
            a1 = a0 + spectrogram_sample_length
            sl = spectrogram[:, a0:a1]
            spec_all[i, :, :sl.shape[1]] = sl

        a0 = math.floor(start_time / clip_length * len(audio))
        a1 = a0 + audio_sample_length
        in_audio = audio[a0:a1]
        if len(in_audio) < audio_sample_length:
            if i == n - 1:
                end_padding_duration = audio_sample_length - len(in_audio)
            in_audio = np.pad(in_audio,
                              (0, audio_sample_length - len(in_audio)),
                              "constant")
        aud_all[i] = in_audio.astype(np.float32)

        # text windows (reference synthesize.py:106-119)
        word_seq = get_words_in_time_range(words, start_time, end_time)
        wid_all[i, 0] = lang_model.SOS_token
        frame_duration = (end_time - start_time) / n_frames
        w_count = 1
        for word in word_seq:
            idx = max(0, int(np.floor((word[1] - start_time)
                                      / frame_duration)))
            if idx < n_frames:
                ext_all[i, idx] = lang_model.get_word_index(word[0])
            if w_count < WORD_CAP - 1:
                wid_all[i, w_count] = lang_model.get_word_index(word[0])
                w_count += 1
        wid_all[i, w_count] = lang_model.EOS_token
        wlen_all[i] = w_count + 1

    return (ext_all, wid_all, wlen_all, aud_all, spec_all,
            end_padding_duration)


class _Plan:
    """Host-side synthesis plan: chosen kernel impl, window schedule,
    stacked per-window inputs, and the window-0 seed."""
    pass


def _make_plan(args, bundle, lang_model, audio, words, audio_sr, vid,
               seed_seq, rng):
    p = _Plan()
    p.n_frames = args.n_poses
    p.n_pre = args.n_pre_poses
    mean_dir_vec = np.array(args.mean_dir_vec).squeeze()
    p.pose_dim = mean_dir_vec.size
    clip_length = len(audio) / audio_sr
    p.rng = rng if rng is not None else jax.random.PRNGKey(
        random.randrange(2 ** 31))

    use_spectrogram = bundle.model_name == "speech2gesture"
    from ..ops import recurrent
    from ..ops.recurrent import is_tpu_backend, set_gru_impl
    # The checkpoint's args record the TRAINING-time --use_pallas; the
    # inference kernel choice is made here instead (numerics are
    # parity-pinned either way): GG_USE_PALLAS=0/1 overrides, else AUTO —
    # the fused on-core kernel wins the B=1 window forward on a TPU
    # backend (measured 1.22x, RESULTS.md), scan elsewhere (where pallas
    # would only run interpreted).
    env = os.environ.get("GG_USE_PALLAS")
    if env is not None:
        use_pallas = env.lower() in ("1", "true", "yes")
    else:
        use_pallas = is_tpu_backend()
    flag = getattr(args, "use_pallas", None)
    if flag is not None and bool(flag) != use_pallas:
        logging.info(
            "args.use_pallas=%s is the training-time setting and does "
            "not govern synthesis; chose %s (override with "
            "GG_USE_PALLAS=0/1)", flag,
            "pallas" if use_pallas else "scan")
    set_gru_impl("pallas" if use_pallas else "scan")
    p.impl = recurrent._GRU_IMPL

    sr = audio_ops.SR
    spectrogram = None
    if use_spectrogram:
        spectrogram = audio_ops.extract_melspectrogram(audio, sr)

    unit_time = args.n_poses / args.motion_resampling_framerate
    stride_time = (args.n_poses - args.n_pre_poses) / \
        args.motion_resampling_framerate
    if clip_length < unit_time:
        num_subdivision = 1
    else:
        num_subdivision = math.ceil((clip_length - unit_time)
                                    / stride_time) + 1
    p.num_subdivision = num_subdivision
    spectrogram_sample_length = int(round(unit_time * sr / 512))
    audio_sample_length = int(unit_time * audio_sr)

    # speaker input (reference synthesize.py:70-76)
    if args.z_type == "speaker":
        if not vid:
            vid = random.randrange(bundle.generator.n_speakers)
        logging.info("vid: %s", vid)
        p.vid_arr = np.array([vid], np.int32)
    else:
        p.vid_arr = np.zeros((1,), np.int32)

    logging.info("%s, %s, %s, %s, %s", num_subdivision, unit_time,
                 clip_length, stride_time, audio_sample_length)

    (p.ext_all, p.wid_all, p.wlen_all, p.aud_all, p.spec_all,
     p.end_padding_duration) = _prepare_windows(
        args, bundle, lang_model, audio, words, audio_sr, num_subdivision,
        unit_time, stride_time, clip_length, audio_sample_length,
        spectrogram_sample_length, spectrogram, use_spectrogram)

    # window-0 seed (reference synthesize.py:47-50): the carry of the
    # fused scan / the mutable pre_seq head of the host loop
    if seed_seq is not None:
        p.init_tail = np.asarray(seed_seq[:p.n_pre], np.float32)
        p.init_con = np.ones((p.n_pre,), np.float32)
    else:
        p.init_tail = np.zeros((p.n_pre, p.pose_dim), np.float32)
        p.init_con = np.zeros((p.n_pre,), np.float32)
    return p


def _blend_head(out_seq, last_poses):
    """Linear crossfade of the overlap (reference synthesize.py:145-153):
    out_seq's first len(last_poses) frames blend with the previous
    window's raw tail.  Mutates and returns out_seq."""
    n = len(last_poses)
    for j in range(n):
        out_seq[j] = (last_poses[j] * (n - j) / (n + 1)
                      + out_seq[j] * (j + 1) / (n + 1))
    return out_seq


def generate_gestures(args, bundle, gen_vars, lang_model, audio, words,
                      audio_sr=16000, vid=None, seed_seq=None,
                      fade_out=False, rng=None, fused=None):
    if fused is None:
        env = os.environ.get("GG_FUSED_SYNTH")
        fused = env.lower() not in ("0", "false", "no") if env else True
    p = _make_plan(args, bundle, lang_model, audio, words, audio_sr, vid,
                   seed_seq, rng)
    logging.info("synthesis GRU impl: %s (%s window chain)",
                 p.impl, "fused" if fused else "per-window")
    num_subdivision, n_pre = p.num_subdivision, p.n_pre
    rng = p.rng
    (ext_all, wid_all, wlen_all, aud_all, spec_all, vid_arr, init_tail,
     init_con, pose_dim, n_frames, impl, end_padding_duration) = (
        p.ext_all, p.wid_all, p.wlen_all, p.aud_all, p.spec_all, p.vid_arr,
        p.init_tail, p.init_con, p.pose_dim, p.n_frames, p.impl,
        p.end_padding_duration)

    start = time.time()
    if fused:
        n_pad = _bucket(num_subdivision)
        if n_pad > num_subdivision:
            # repeat the last real window's (always-valid) inputs; the
            # padded outputs are sliced away below
            reps = n_pad - num_subdivision
            ext_all = np.concatenate(
                [ext_all, np.repeat(ext_all[-1:], reps, 0)])
            wid_all = np.concatenate(
                [wid_all, np.repeat(wid_all[-1:], reps, 0)])
            wlen_all = np.concatenate(
                [wlen_all, np.repeat(wlen_all[-1:], reps, 0)])
            aud_all = np.concatenate(
                [aud_all, np.repeat(aud_all[-1:], reps, 0)])
            spec_all = np.concatenate(
                [spec_all, np.repeat(spec_all[-1:], reps, 0)])
        fused_fn = _get_fused_fn(bundle, args, n_pad, impl)
        outs = np.asarray(fused_fn(
            gen_vars, jnp.asarray(ext_all), jnp.asarray(aud_all),
            jnp.asarray(spec_all), jnp.asarray(wid_all),
            jnp.asarray(wlen_all), jnp.asarray(init_tail),
            jnp.asarray(init_con), jnp.asarray(vid_arr), rng))
        raw_windows = [outs[i] for i in range(num_subdivision)]
    else:
        window_fn = _get_window_fn(bundle, args, impl)
        pre_seq = np.zeros((1, n_frames, pose_dim + 1), np.float32)
        pre_seq[0, :n_pre, :-1] = init_tail
        pre_seq[0, :n_pre, -1] = init_con
        raw_windows = []
        for i in range(num_subdivision):
            if i > 0:
                pre_seq[0, :n_pre, :-1] = raw_windows[-1][-n_pre:]
                pre_seq[0, :n_pre, -1] = 1
            out = np.asarray(window_fn(
                gen_vars, jnp.asarray(pre_seq), jnp.asarray(ext_all[i:i+1]),
                jnp.asarray(aud_all[i:i+1]), jnp.asarray(spec_all[i:i+1]),
                jnp.asarray(wid_all[i:i+1]), jnp.asarray(wlen_all[i:i+1]),
                jnp.asarray(vid_arr), jax.random.fold_in(rng, i)))
            raw_windows.append(out[0])
    logging.info("generation took %.2f s",
                 (time.time() - start) / num_subdivision)

    return _finalize(args, bundle, raw_windows, p, fade_out, audio_sr)


def _finalize(args, bundle, raw_windows, p, fade_out, audio_sr):
    """Host post-passes shared by the single-clip and batched paths:
    crossfade, seq2seq join smoothing, optional fade-out."""
    num_subdivision, n_pre = p.num_subdivision, p.n_pre

    # crossfade the n_pre_poses overlap (reference synthesize.py:145-153);
    # identical math for both paths: the blend consumes the PREVIOUS
    # window's raw tail (the same frames that seed the next window), so
    # it can run after the whole chain
    out_list = []
    for raw in raw_windows:
        out_seq = np.array(raw, np.float32, copy=True)
        if out_list:
            last_poses = out_list[-1][-n_pre:]
            out_list[-1] = out_list[-1][:-n_pre]
            _blend_head(out_seq, last_poses)
        out_list.append(out_seq)
    out_dir_vec = np.vstack(out_list)

    # seq2seq join smoothing (reference synthesize.py:163-185)
    if bundle.model_name == "seq2seq":
        n_smooth = args.n_pre_poses
        for i in range(num_subdivision):
            start_frame = args.n_pre_poses + \
                i * (args.n_poses - args.n_pre_poses) - n_smooth
            if start_frame < 0:
                start_frame = 0
                end_frame = start_frame + n_smooth * 2
            else:
                end_frame = start_frame + n_smooth * 3
            y = out_dir_vec[start_frame:end_frame]
            x = np.arange(y.shape[0])
            coeffs = np.polyfit(x, y, 3)
            interpolated = np.stack(
                [np.poly1d(coeffs[:, k])(x) for k in range(y.shape[1])],
                axis=1)
            out_dir_vec[start_frame:end_frame] = interpolated

    # fade out to the mean pose (reference synthesize.py:188-207)
    if fade_out:
        n_smooth = args.n_pre_poses
        start_frame = len(out_dir_vec) - int(
            p.end_padding_duration / audio_sr
            * args.motion_resampling_framerate)
        end_frame = start_frame + n_smooth * 2
        if len(out_dir_vec) < end_frame:
            out_dir_vec = np.pad(
                out_dir_vec, [(0, end_frame - len(out_dir_vec)), (0, 0)],
                mode="constant")
        out_dir_vec[end_frame - n_smooth:] = \
            np.zeros(p.pose_dim)  # fade to mean pose
        y = out_dir_vec[start_frame:end_frame]
        x = np.arange(y.shape[0])
        w = np.ones(len(y))
        w[0] = 5
        w[-1] = 5
        coeffs = np.polyfit(x, y, 2, w=w)
        interpolated = np.stack(
            [np.poly1d(coeffs[:, k])(x) for k in range(y.shape[1])], axis=1)
        out_dir_vec[start_frame:end_frame] = interpolated

    return out_dir_vec


def generate_gestures_batch(args, bundle, gen_vars, lang_model, clips,
                            audio_sr=16000, fade_out=False, mesh=None):
    """Synthesize MANY independent clips per device dispatch.

    `clips` is a list of dicts with keys `audio` and `words` (the
    `generate_gestures` inputs) plus optional `vid`, `seed_seq`, `rng`.
    Returns the per-clip `out_dir_vec` arrays in input order — each
    equal to that clip's own `generate_gestures(..., fused=True)` run
    (per-clip rng streams are preserved through per-lane `fold_in`;
    pinned in tests/test_batch_synthesis.py).

    TPU design: clips group by their padded window bucket and each
    group runs as ONE scan whose per-step forward carries a clip batch
    axis (see _get_batched_fused_fn).  Clip counts pad to power-of-two
    buckets too (repeating the last clip; padded lanes are discarded),
    so a test-set sweep compiles O(log W * log C) programs total.  The
    GRU impl is pinned to the XLA scan here: Pallas' measured win is
    the B=1 dispatch-bound forward (RESULTS.md), and batched windows
    are exactly the MXU-bound regime where the scan is the production
    path.

    Multi-chip: pass a 1-D data `mesh` (parallel/mesh.get_mesh) and the
    CLIP axis shards over it — clips are fully independent, so the
    scan partitions along C with zero cross-device collectives (each
    chip runs its own clips' window chains; the only sync is the final
    host gather).  Clip counts pad up to a mesh-size multiple; lanes
    are discarded like single-device padding.  Equivalence on an
    8-virtual-device CPU mesh is pinned in tests/test_batch_synthesis.py."""
    from ..ops.recurrent import set_gru_impl
    from ..parallel import mesh as mesh_lib

    plans = []
    for clip in clips:
        plans.append(_make_plan(
            args, bundle, lang_model, clip["audio"], clip["words"],
            audio_sr, clip.get("vid"), clip.get("seed_seq"),
            clip.get("rng")))
    set_gru_impl("scan")

    n_dev = mesh_lib.data_parallel_size(mesh)
    if n_dev > 1:
        # params replicated once per call; clip-axis shardings below
        gen_vars = mesh_lib.replicate(gen_vars, mesh)
        clip_sh = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(mesh_lib.DATA_AXIS))
        wmajor_sh = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(None, mesh_lib.DATA_AXIS))
    else:
        clip_sh = wmajor_sh = None

    def dev(x, sharding):
        x = jnp.asarray(x)
        return jax.device_put(x, sharding) if sharding is not None else x

    groups = {}
    for idx, p in enumerate(plans):
        groups.setdefault(_bucket(p.num_subdivision), []).append(idx)

    results = [None] * len(plans)
    for n_pad, idxs in sorted(groups.items()):
        c_pad = _bucket(len(idxs))
        # mesh-size multiple so the clip shard is even (power-of-two
        # meshes — the TPU case — already divide any c_pad >= n_dev)
        c_pad = max(c_pad, n_dev)
        c_pad += (-c_pad) % n_dev
        sel = idxs + [idxs[-1]] * (c_pad - len(idxs))

        def stack(field):
            # (W, C, ...) window-major so the scan slices a (C, ...)
            # block per step; pad each clip's windows like the
            # single-clip fused path (repeat the last real window)
            cols = []
            for i in sel:
                a = getattr(plans[i], field)
                reps = n_pad - a.shape[0]
                if reps:
                    a = np.concatenate([a, np.repeat(a[-1:], reps, 0)])
                cols.append(a)
            return dev(np.stack(cols, 1), wmajor_sh)

        vid = dev(np.stack(
            [plans[i].vid_arr[0] for i in sel]).astype(np.int32), clip_sh)
        rngs = dev(jnp.stack([plans[i].rng for i in sel]), clip_sh)
        init_tail = dev(np.stack(
            [plans[i].init_tail for i in sel]), clip_sh)
        init_con = dev(np.stack([plans[i].init_con for i in sel]), clip_sh)

        fn = _get_batched_fused_fn(bundle, args, n_pad, c_pad, "scan")
        outs = np.asarray(fn(
            gen_vars, stack("ext_all"), stack("aud_all"),
            stack("spec_all"), stack("wid_all"), stack("wlen_all"),
            init_tail, init_con, vid, rngs))
        for ci, i in enumerate(idxs):
            p = plans[i]
            raw = [outs[w, ci] for w in range(p.num_subdivision)]
            results[i] = _finalize(args, bundle, raw, p, fade_out,
                                   audio_sr)
    return results


def generate_gestures_stream(args, bundle, gen_vars, lang_model, audio,
                             words, audio_sr=16000, vid=None, seed_seq=None,
                             rng=None):
    """Stream the clip window by window: yields (start_frame, frames)
    as each window's frames FINALIZE, i.e. after the linear crossfade
    with the next seed chain step — concatenating all chunks equals
    `generate_gestures(..., fused=False)` exactly (pinned in
    tests/test_fused_synthesis.py).  First motion arrives after one
    window forward (~0.25 ms compute + one dispatch) instead of after
    the whole clip; each subsequent chunk covers stride_time
    (= (n_poses - n_pre_poses)/fps, 2 s at the published recipe) of
    motion, so streaming runs ahead of real time whenever a window
    forward beats the stride.

    Batch-only post-passes do not apply here: the seq2seq join
    smoothing and fade_out both rewrite frames across chunk boundaries
    after the fact (reference synthesize.py:163-207); use
    generate_gestures for those semantics.
    """
    p = _make_plan(args, bundle, lang_model, audio, words, audio_sr, vid,
                   seed_seq, rng)
    logging.info("synthesis GRU impl: %s (streaming window chain)", p.impl)
    n_pre = p.n_pre
    window_fn = _get_window_fn(bundle, args, p.impl)

    pre_seq = np.zeros((1, p.n_frames, p.pose_dim + 1), np.float32)
    pre_seq[0, :n_pre, :-1] = p.init_tail
    pre_seq[0, :n_pre, -1] = p.init_con

    # window k's frames are final up to its last n_pre (those get
    # crossfade-replaced by window k+1's blended head), so each window
    # emits its first n_frames - n_pre frames immediately
    prev_raw = None  # previous window's raw output (seed + blend source)
    start_frame = 0
    for i in range(p.num_subdivision):
        if i > 0:
            pre_seq[0, :n_pre, :-1] = prev_raw[-n_pre:]
            pre_seq[0, :n_pre, -1] = 1
        out = np.asarray(window_fn(
            gen_vars, jnp.asarray(pre_seq), jnp.asarray(p.ext_all[i:i+1]),
            jnp.asarray(p.aud_all[i:i+1]), jnp.asarray(p.spec_all[i:i+1]),
            jnp.asarray(p.wid_all[i:i+1]), jnp.asarray(p.wlen_all[i:i+1]),
            jnp.asarray(p.vid_arr), jax.random.fold_in(p.rng, i)))[0]
        out_seq = out.copy()
        if prev_raw is not None:
            _blend_head(out_seq, prev_raw[-n_pre:])
        chunk = out_seq if i == p.num_subdivision - 1 else out_seq[:-n_pre]
        yield start_frame, chunk
        start_frame += len(chunk)
        prev_raw = out
