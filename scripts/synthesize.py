"""Synthesis entry point.

Behavioral contract: reference scripts/synthesize.py:232-441 — same CLI
(`python scripts/synthesize.py {eval,from_db_clip,from_text} <ckpt> [opt]`)
and the same artifact set: side-by-side MP4, WAV, and a PKL dict with keys
{sentence, audio, out_dir_vec, out_poses, aux_info[, human_dir_vec]}.
"""

import datetime
import logging
import os
import pickle
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from gesture_generation_from_trimodal_context_tpu.data.dataset import (
    BatchIterator, SpeechMotionDataset)
from gesture_generation_from_trimodal_context_tpu.data.storage import open_raw_store
from gesture_generation_from_trimodal_context_tpu.models.evaluator import (
    EmbeddingSpaceEvaluator)
from gesture_generation_from_trimodal_context_tpu.ops import skeleton
from gesture_generation_from_trimodal_context_tpu.ops.text import remove_tags_marks
from gesture_generation_from_trimodal_context_tpu.parallel import mesh as mesh_lib
from gesture_generation_from_trimodal_context_tpu.synthesis.engine import (
    generate_gestures, generate_gestures_batch)
from gesture_generation_from_trimodal_context_tpu.synthesis.tts import (
    TTSHelper, align_words, load_wav_16k)
from gesture_generation_from_trimodal_context_tpu.train import checkpoint as ckpt_lib
from gesture_generation_from_trimodal_context_tpu.train.eval_steps import make_eval_step
from gesture_generation_from_trimodal_context_tpu.train.loops import evaluate_testset
from gesture_generation_from_trimodal_context_tpu.utils.logging_utils import set_logger
from gesture_generation_from_trimodal_context_tpu.utils.video import (
    create_video_and_save)

TEXT_EXAMPLES = [
    'yesterday i heard a wonderful story about a little robot learning '
    'to wave at people',
    'together we can bring clean water to every village in the region',
    'think about how far we have come in just ten years. imagine the '
    'next ten.',
    'when you raise your hand to ask a question the whole room leans '
    'in to listen',
    '[Enter a new text]',
]


def main(mode, checkpoint_path, option, data_base="data/ted_dataset",
         text=None):
    from gesture_generation_from_trimodal_context_tpu.utils import (
        compile_cache, platforms)
    compile_cache.enable()  # warm reruns skip the multi-minute compiles
    platforms.enable_host_cpu()  # eager init runs locally, not tunneled
    args, bundle, gen_vars, lang_model, speaker_model, pose_dim = \
        ckpt_lib.load_checkpoint_and_model(checkpoint_path,
                                           jax.random.PRNGKey(0))
    result_save_path = "output/generation_results"
    mean_pose = np.array(args.mean_pose).squeeze()
    mean_dir_vec = np.array(args.mean_dir_vec).squeeze()

    # prefer the dataset-built vocab cache when present
    # (reference synthesize.py:242-244)
    vocab_cache_path = os.path.join(data_base, "vocab_cache.pkl")
    if os.path.exists(vocab_cache_path):
        with open(vocab_cache_path, "rb") as f:
            lang_model = pickle.load(f)

    if mode == "eval":
        # full-set eval (include the final partial val batch) follows the
        # checkpoint's --eval_full_set; GG_EVAL_FULL_SET=0/1 overrides
        # (checkpoints trained elsewhere — e.g. torch imports — predate
        # the flag)
        env_full = os.environ.get("GG_EVAL_FULL_SET")
        if env_full is not None:
            args.eval_full_set = env_full.strip().lower() not in (
                "0", "false", "")
        # likewise for the fused one-dispatch val pass (default on for
        # the resident path; GG_FUSED_EVAL_PASS=0 -> per-batch eval)
        env_fused = os.environ.get("GG_FUSED_EVAL_PASS")
        if env_fused is not None:
            args.fused_eval_pass = env_fused.strip().lower() not in (
                "0", "false", "")
        val_data_path = os.path.join(data_base, "lmdb_val")
        embed_space_evaluator = None
        if args.eval_net_path and os.path.exists(args.eval_net_path):
            embed_space_evaluator = EmbeddingSpaceEvaluator(
                args, args.eval_net_path, lang_model)
        val_dataset = SpeechMotionDataset(
            val_data_path, n_poses=args.n_poses,
            subdivision_stride=args.subdivision_stride,
            pose_resampling_fps=args.motion_resampling_framerate,
            speaker_model=speaker_model, mean_pose=mean_pose,
            mean_dir_vec=mean_dir_vec)
        val_dataset.set_lang_model(lang_model)
        mesh = mesh_lib.get_mesh(1)
        if option == "host":
            # reference-style host pipeline (per-batch host->device
            # transfer, reference synthesize.py:263-272)
            loader = BatchIterator(
                val_dataset, 32, shuffle=False,
                include_tail=getattr(args, "eval_full_set", False))
        else:
            # device-resident eval (default; TPU-native): upload the val
            # set once, gather eval batches in-graph — identical batch
            # composition, no per-batch transfer (train/resident.py)
            from gesture_generation_from_trimodal_context_tpu.train import (
                resident)
            fields = resident.MODEL_FIELDS.get(args.model,
                                               resident.TRAIN_FIELDS)
            res_val, _ = resident.build_resident_data(
                val_dataset, speaker_model, include_vids=False,
                label="val", mesh=mesh, fields=fields)
            loader = resident.ResidentBatchIterator(
                res_val, len(val_dataset), 32,
                audio_len=val_dataset.expected_audio_length, mesh=mesh,
                include_tail=getattr(args, "eval_full_set", False))
        if option != "host" and getattr(args, "fused_eval_pass", True):
            # one-dispatch fused val pass (gathers + forwards + FGD
            # embedding in a single jitted scan, train/eval_steps.py)
            from gesture_generation_from_trimodal_context_tpu.train.loops \
                import evaluate_testset_resident_fused
            from gesture_generation_from_trimodal_context_tpu.train.eval_steps \
                import make_fused_eval_pass
            from gesture_generation_from_trimodal_context_tpu.data.vocab \
                import Vocab as _Vocab
            embed_apply = embed_vars = None
            if embed_space_evaluator and \
                    args.model != "gesture_autoencoder":
                embed_apply = embed_space_evaluator._embed
                embed_vars = embed_space_evaluator.net_vars
            fused = make_fused_eval_pass(
                bundle, args, mean_dir_vec,
                audio_len=val_dataset.expected_audio_length,
                use_vids=(args.model == "multimodal_context"
                          and isinstance(speaker_model, _Vocab)),
                embed_apply=embed_apply)
            with mesh:
                evaluate_testset_resident_fused(
                    fused, res_val, len(val_dataset), embed_vars, args,
                    bundle, gen_vars, embed_space_evaluator,
                    speaker_model, np.random.RandomState(0),
                    jax.random.PRNGKey(0), batch_size=32)
        else:
            eval_step = make_eval_step(bundle, args, mean_dir_vec)
            with mesh:
                evaluate_testset(loader, gen_vars, eval_step, bundle,
                                 args, embed_space_evaluator,
                                 speaker_model, mesh,
                                 np.random.RandomState(0),
                                 jax.random.PRNGKey(0))

    elif mode == "from_text":
        random.seed()
        voice = option if option else "en-female"
        vid = random.sample(range(speaker_model.n_words), 1)[0] \
            if speaker_model is not None and hasattr(speaker_model,
                                                     "n_words") else None
        tts = TTSHelper(cache_path="output/cached_wav")

        if text is not None:
            # non-interactive scripted path (--text "..."), stdin-free
            if not text.strip():
                raise SystemExit("--text requires a non-empty sentence")
            input_text = text
        else:
            for i, example in enumerate(TEXT_EXAMPLES):
                print("(%d) %s" % (i, example))
            try:
                select = int(input("select: "))
            except ValueError:
                return
            if select == len(TEXT_EXAMPLES) - 1:
                input_text = input("text: ")
            elif select >= len(TEXT_EXAMPLES) or select < 0:
                print("Please input a valid number. Exiting...")
                return
            else:
                input_text = TEXT_EXAMPLES[select]

        text_without_tags = remove_tags_marks(input_text)
        print(text_without_tags)

        tts_filename = tts.synthesis(input_text, voice_name=voice)
        _, duration = tts.get_sound_obj(tts_filename)
        print("TTS complete (audio length: {0:.1f}s)".format(duration))
        audio, audio_sr = load_wav_16k(tts_filename)
        words_with_timestamps = align_words(audio, text_without_tags)

        dir_vec = generate_gestures(args, bundle, gen_vars, lang_model,
                                    audio, words_with_timestamps, vid=vid,
                                    fade_out=False)

        os.makedirs(result_save_path, exist_ok=True)
        prefix = "{}_vid_{}_{}".format(text_without_tags[:50], vid, voice)
        out_pos, _ = create_video_and_save(
            result_save_path, 0, prefix, 0, None, dir_vec, mean_dir_vec,
            text_without_tags, audio=audio,
            clipping_to_shortest_stream=True, delete_audio_file=False)
        save_dict = {
            "sentence": words_with_timestamps, "audio": audio,
            "out_dir_vec": dir_vec + mean_dir_vec, "out_poses": out_pos,
            "aux_info": "",
        }
        with open(os.path.join(result_save_path, prefix + ".pkl"),
                  "wb") as f:
            pickle.dump(save_dict, f)

    elif mode == "from_db_clip":
        test_data_path = os.path.join(data_base, "lmdb_test")
        save_path = result_save_path
        clip_duration_range = [5, 12]
        random.seed()
        n_generations = int(option) if option else 5

        # phase 1: draw clips that satisfy the duration filter
        # (reference synthesize.py:303-330 draws and generates one at a
        # time; the draw semantics are unchanged here)
        selected = []
        store = open_raw_store(test_data_path)
        keys = store.keys()
        attempts = 0
        max_attempts = max(50, 10 * len(keys))
        while len(selected) < n_generations:
            attempts += 1
            if attempts > max_attempts:
                # beyond-reference guard: the reference loops forever when
                # no clip satisfies the 5-12 s duration window
                raise SystemExit(
                    "no clip in %s satisfies the %s s duration filter "
                    "after %d draws" % (test_data_path,
                                        clip_duration_range, attempts - 1))
            key = random.choice(keys)
            video = store.get(key)
            vid = video["vid"]
            clips = video["clips"]
            if len(clips) == 0:
                continue
            clip = clips[random.randrange(len(clips))]
            clip_poses = clip["skeletons_3d"]
            clip_audio = clip["audio_raw"]
            clip_words = [list(w) for w in clip["words"]]
            clip_time = [clip["start_time"], clip["end_time"]]

            clip_duration = clip_time[1] - clip_time[0]
            if not (clip_duration_range[0] <= clip_duration
                    <= clip_duration_range[1]):
                continue

            clip_poses = skeleton.resample_pose_seq(
                clip_poses, clip_duration, args.motion_resampling_framerate)
            target_dir_vec = skeleton.convert_pose_seq_to_dir_vec_np(
                clip_poses)
            target_dir_vec = target_dir_vec.reshape(
                target_dir_vec.shape[0], -1) - mean_dir_vec

            for w in clip_words:  # zero-base word times
                w[1] -= clip_time[0]
                w[2] -= clip_time[0]

            vid_idx = random.sample(range(speaker_model.n_words), 1)[0] \
                if speaker_model is not None and hasattr(speaker_model,
                                                         "n_words") else None
            selected.append(dict(
                vid=vid, vid_idx=vid_idx, audio=clip_audio,
                words=clip_words, time=clip_time,
                target_dir_vec=target_dir_vec))
        store.close()

        # phase 2: generate — batched across clips by default (one fused
        # scan per window/clip bucket, synthesis/engine.py
        # generate_gestures_batch); GG_BATCH_SYNTH=0 or GG_FUSED_SYNTH=0
        # falls back to per-clip generation
        env_batch = os.environ.get("GG_BATCH_SYNTH", "1").lower()
        env_fused = os.environ.get("GG_FUSED_SYNTH", "1").lower()
        use_batch = (len(selected) > 1
                     and env_batch not in ("0", "false", "no")
                     and env_fused not in ("0", "false", "no"))
        if use_batch:
            # clip-parallel over the device mesh when >1 chip is attached
            # (clips are independent: zero-collective data parallelism;
            # GG_SYNTH_DP=0 keeps it single-device)
            env_dp = os.environ.get("GG_SYNTH_DP", "1").lower()
            synth_mesh = None
            if (jax.device_count() > 1
                    and env_dp not in ("0", "false", "no")):
                synth_mesh = mesh_lib.get_mesh()
            outs = generate_gestures_batch(
                args, bundle, gen_vars, lang_model,
                [dict(audio=s["audio"], words=s["words"], vid=s["vid_idx"],
                      seed_seq=s["target_dir_vec"][0:args.n_pre_poses])
                 for s in selected],
                mesh=synth_mesh)
        else:
            outs = [generate_gestures(
                args, bundle, gen_vars, lang_model, s["audio"], s["words"],
                vid=s["vid_idx"],
                seed_seq=s["target_dir_vec"][0:args.n_pre_poses],
                fade_out=False) for s in selected]

        # phase 3: artifacts (identical to the reference's per-clip set)
        for n_saved, (s, out_dir_vec) in enumerate(zip(selected, outs)):
            vid, vid_idx = s["vid"], s["vid_idx"]
            clip_audio, clip_time = s["audio"], s["time"]
            target_dir_vec = s["target_dir_vec"]
            sentence = " ".join(w[0] for w in s["words"])
            os.makedirs(save_path, exist_ok=True)
            filename_prefix = "{}_{}_{}".format(vid, vid_idx, n_saved)
            aux_str = "({}, time: {}-{})".format(
                vid, str(datetime.timedelta(seconds=clip_time[0])),
                str(datetime.timedelta(seconds=clip_time[1])))
            create_video_and_save(
                save_path, 0, filename_prefix, 0, target_dir_vec,
                out_dir_vec, mean_dir_vec, sentence, audio=clip_audio,
                aux_str=aux_str, clipping_to_shortest_stream=True,
                delete_audio_file=False)

            out_dir_vec = out_dir_vec + mean_dir_vec
            out_poses = skeleton.convert_dir_vec_to_pose_np(out_dir_vec)
            save_dict = {
                "sentence": sentence,
                "audio": np.asarray(clip_audio, np.float32),
                "out_dir_vec": out_dir_vec, "out_poses": out_poses,
                "aux_info": filename_prefix,
                "human_dir_vec": target_dir_vec + mean_dir_vec,
            }
            with open(os.path.join(save_path, filename_prefix + ".pkl"),
                      "wb") as f:
                pickle.dump(save_dict, f)
    else:
        raise SystemExit("wrong mode (expected eval|from_db_clip|from_text)")


if __name__ == "__main__":
    # reference CLI: synthesize.py {eval,from_db_clip,from_text} <ckpt>
    # [option]; beyond-reference: --text "..." makes from_text
    # non-interactive (stdin-free, for scripted use)
    argv = list(sys.argv[1:])
    text_arg = None
    for i, a in enumerate(argv):
        if a == "--text":
            if i + 1 >= len(argv):
                raise SystemExit("--text requires a value")
            text_arg = argv[i + 1]
            del argv[i:i + 2]
            break
        if a.startswith("--text="):
            text_arg = a[len("--text="):]
            del argv[i]
            break
    mode_arg = argv[0]
    ckpt_arg = argv[1]
    option_arg = argv[2] if len(argv) > 2 else None
    set_logger()
    main(mode_arg, ckpt_arg, option_arg, text=text_arg)
