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

TPU design: the per-window model call is one jitted function with fixed
shapes (host code only prepares numpy inputs), so any clip length runs
without recompilation; the 4-frame seed chain keeps windows sequential
(SURVEY.md §5 long-context note).

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


def _make_window_fn(bundle, args):
    gen = bundle.generator
    model = bundle.model_name

    @jax.jit
    def run(gen_vars, pre_seq, in_text, in_audio, in_spec, word_seq,
            word_lengths, vid, rng):
        rngs = {"noise": rng, "dropout": jax.random.fold_in(rng, 1)}
        if model == "multimodal_context":
            out, *_ = gen.apply(gen_vars, pre_seq, in_text, in_audio, vid,
                                train=False, rngs=rngs)
        elif model == "joint_embedding":
            res = gen.apply(gen_vars, in_text, in_audio,
                            pre_seq[:, :args.n_pre_poses, :-1], None,
                            "speech", train=False, rngs=rngs)
            out = res[6]
        elif model == "seq2seq":
            out = gen.apply(gen_vars, word_seq, word_lengths,
                            pre_seq[:, :, :-1], train=False, rngs=rngs)
        elif model == "speech2gesture":
            out = gen.apply(gen_vars, in_spec,
                            pre_seq[:, :args.n_pre_poses, :-1],
                            train=False, rngs=rngs)
        else:
            raise ValueError(model)
        return out

    return run


WORD_CAP = 64  # fixed word capacity per window (single compile)




def generate_gestures(args, bundle, gen_vars, lang_model, audio, words,
                      audio_sr=16000, vid=None, seed_seq=None,
                      fade_out=False, rng=None):
    out_list = []
    n_frames = args.n_poses
    mean_dir_vec = np.array(args.mean_dir_vec).squeeze()
    pose_dim = mean_dir_vec.size
    clip_length = len(audio) / audio_sr
    rng = rng if rng is not None else jax.random.PRNGKey(
        random.randrange(2 ** 31))

    use_spectrogram = bundle.model_name == "speech2gesture"
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
    logging.info("synthesis GRU impl: %s",
                 "pallas" if use_pallas else "scan")
    window_fn = _make_window_fn(bundle, args)

    # seed pre-seq (reference synthesize.py:47-50)
    pre_seq = np.zeros((1, n_frames, pose_dim + 1), np.float32)
    if seed_seq is not None:
        pre_seq[0, 0:args.n_pre_poses, :-1] = seed_seq[0:args.n_pre_poses]
        pre_seq[0, 0:args.n_pre_poses, -1] = 1

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
    spectrogram_sample_length = int(round(unit_time * sr / 512))
    audio_sample_length = int(unit_time * audio_sr)
    end_padding_duration = 0

    # speaker input (reference synthesize.py:70-76)
    if args.z_type == "speaker":
        if not vid:
            vid = random.randrange(bundle.generator.n_speakers)
        logging.info("vid: %s", vid)
        vid_arr = np.array([vid], np.int32)
    else:
        vid_arr = np.zeros((1,), np.int32)

    logging.info("%s, %s, %s, %s, %s", num_subdivision, unit_time,
                 clip_length, stride_time, audio_sample_length)

    out_dir_vec = None
    start = time.time()
    for i in range(num_subdivision):
        start_time = i * stride_time
        end_time = start_time + unit_time

        # spectrogram window
        in_spec = np.zeros((1, audio_ops.N_MELS, spectrogram_sample_length),
                           np.float32)
        if use_spectrogram:
            a0 = math.floor(start_time / clip_length * spectrogram.shape[1])
            a1 = a0 + spectrogram_sample_length
            sl = spectrogram[:, a0:a1]
            in_spec[0, :, :sl.shape[1]] = sl

        # audio window
        a0 = math.floor(start_time / clip_length * len(audio))
        a1 = a0 + audio_sample_length
        in_audio = audio[a0:a1]
        if len(in_audio) < audio_sample_length:
            if i == num_subdivision - 1:
                end_padding_duration = audio_sample_length - len(in_audio)
            in_audio = np.pad(in_audio,
                              (0, audio_sample_length - len(in_audio)),
                              "constant")
        in_audio = in_audio[None].astype(np.float32)

        # text windows (reference synthesize.py:106-119)
        from ..data.preprocessor import get_words_in_time_range
        word_seq = get_words_in_time_range(words, start_time, end_time)
        extended = np.zeros((1, n_frames), np.int32)
        word_ids = np.zeros((1, WORD_CAP), np.int32)
        word_ids[0, 0] = lang_model.SOS_token
        frame_duration = (end_time - start_time) / n_frames
        w_count = 1
        for word in word_seq:
            idx = max(0, int(np.floor((word[1] - start_time)
                                      / frame_duration)))
            if idx < n_frames:
                extended[0, idx] = lang_model.get_word_index(word[0])
            if w_count < WORD_CAP - 1:
                word_ids[0, w_count] = lang_model.get_word_index(word[0])
                w_count += 1
        word_ids[0, w_count] = lang_model.EOS_token
        word_lengths = np.array([w_count + 1], np.int32)

        # seed chaining (reference synthesize.py:121-126)
        if i > 0:
            pre_seq[0, 0:args.n_pre_poses, :-1] = \
                out_dir_vec[0, -args.n_pre_poses:]
            pre_seq[0, 0:args.n_pre_poses, -1] = 1

        out_dir_vec = np.asarray(window_fn(
            gen_vars, jnp.asarray(pre_seq), jnp.asarray(extended),
            jnp.asarray(in_audio), jnp.asarray(in_spec),
            jnp.asarray(word_ids), jnp.asarray(word_lengths),
            jnp.asarray(vid_arr), jax.random.fold_in(rng, i)))
        out_seq = out_dir_vec[0].copy()

        # crossfade the n_pre_poses overlap (reference synthesize.py:145-153)
        if len(out_list) > 0:
            last_poses = out_list[-1][-args.n_pre_poses:]
            out_list[-1] = out_list[-1][:-args.n_pre_poses]
            n = len(last_poses)
            for j in range(n):
                out_seq[j] = (last_poses[j] * (n - j) / (n + 1)
                              + out_seq[j] * (j + 1) / (n + 1))
        out_list.append(out_seq)

    logging.info("generation took %.2f s",
                 (time.time() - start) / num_subdivision)
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
            end_padding_duration / audio_sr
            * args.motion_resampling_framerate)
        end_frame = start_frame + n_smooth * 2
        if len(out_dir_vec) < end_frame:
            out_dir_vec = np.pad(
                out_dir_vec, [(0, end_frame - len(out_dir_vec)), (0, 0)],
                mode="constant")
        out_dir_vec[end_frame - n_smooth:] = \
            np.zeros(pose_dim)  # fade to mean pose
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
