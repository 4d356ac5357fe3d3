"""Artifact writer: side-by-side human-vs-generated skeleton video + WAV.

Behavioral contract: reference scripts/utils/train_utils.py:59-144 —
matplotlib 3-D animation at 15 fps (dpi 80), WAV at 16 kHz, ffmpeg audio
mux.  soundfile is unavailable here; WAV output uses scipy.io.wavfile
(float32 PCM, same content).  ffmpeg is invoked when present, otherwise
the silent video is kept.
"""

import logging
import os
import shutil
import subprocess
import time
from textwrap import wrap

import numpy as np

from ..ops import skeleton


def save_wav(path, audio, sr=16000):
    from scipy.io import wavfile
    wavfile.write(path, sr, np.asarray(audio, np.float32))


def create_video_and_save(save_path, epoch, prefix, iter_idx, target, output,
                          mean_data, title, audio=None, aux_str=None,
                          clipping_to_shortest_stream=False,
                          delete_audio_file=True):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import matplotlib.animation as animation

    logging.info("rendering a video...")
    start = time.time()

    fig = plt.figure(figsize=(8, 4))
    axes = [fig.add_subplot(1, 2, 1, projection="3d"),
            fig.add_subplot(1, 2, 2, projection="3d")]
    axes[0].view_init(elev=20, azim=-60)
    axes[1].view_init(elev=20, azim=-60)
    fig_title = title
    if aux_str:
        fig_title += "\n" + aux_str
    fig.suptitle("\n".join(wrap(fig_title, 75)), fontsize="medium")

    mean_data = np.asarray(mean_data).flatten()
    output = output + mean_data
    output_poses = skeleton.convert_dir_vec_to_pose_np(output)
    target_poses = None
    if target is not None:
        target = target + mean_data
        target_poses = skeleton.convert_dir_vec_to_pose_np(target)

    def animate(i):
        for k, name in enumerate(["human", "generated"]):
            if name == "human" and target is not None and i < len(target):
                pose = target_poses[i]
            elif name == "generated" and i < len(output):
                pose = output_poses[i]
            else:
                pose = None
            if pose is not None:
                axes[k].clear()
                for parent, child, _ in skeleton.DIR_VEC_PAIRS:
                    axes[k].plot([pose[parent, 0], pose[child, 0]],
                                 [pose[parent, 2], pose[child, 2]],
                                 [pose[parent, 1], pose[child, 1]],
                                 zdir="z", linewidth=5)
                axes[k].set_xlim3d(-0.5, 0.5)
                axes[k].set_ylim3d(0.5, -0.5)
                axes[k].set_zlim3d(0.5, -0.5)
                axes[k].set_xlabel("x")
                axes[k].set_ylabel("z")
                axes[k].set_zlabel("y")
                axes[k].set_title("{} ({}/{})".format(name, i + 1,
                                                      len(output)))

    num_frames = max(len(target), len(output)) if target is not None \
        else len(output)
    ani = animation.FuncAnimation(fig, animate, interval=30,
                                  frames=num_frames, repeat=False)

    audio_path = None
    if audio is not None:
        audio = np.asarray(audio, np.float32)
        audio_path = "{}/{}_{:03d}_{}.wav".format(save_path, prefix, epoch,
                                                  iter_idx)
        save_wav(audio_path, audio)

    # mp4 via ffmpeg when available (reference behavior); animated GIF via
    # Pillow otherwise so artifact generation works on minimal machines
    have_ffmpeg = animation.writers.is_available("ffmpeg")
    ext = "mp4" if have_ffmpeg else "gif"
    video_path = "{}/temp_{}_{:03d}_{}.{}".format(save_path, prefix, epoch,
                                                  iter_idx, ext)
    ani.save(video_path, fps=15, dpi=80)
    del ani
    plt.close(fig)

    if audio is not None and have_ffmpeg and shutil.which("ffmpeg"):
        merged = "{}/{}_{:03d}_{}.mp4".format(save_path, prefix, epoch,
                                              iter_idx)
        cmd = ["ffmpeg", "-loglevel", "panic", "-y", "-i", video_path,
               "-i", audio_path, "-strict", "-2", merged]
        if clipping_to_shortest_stream:
            cmd.insert(len(cmd) - 1, "-shortest")
        subprocess.call(cmd)
        if delete_audio_file and os.path.exists(audio_path):
            os.remove(audio_path)
        os.remove(video_path)
    elif audio is not None:
        final = "{}/{}_{:03d}_{}.{}".format(save_path, prefix, epoch,
                                            iter_idx, ext)
        os.replace(video_path, final)
        logging.info("ffmpeg not found; wrote silent %s + wav", final)

    logging.info("done, took %.1f seconds", time.time() - start)
    return output_poses, target_poses
