"""Video artifact writer: blit-rendered frames into a Pillow GIF (no
ffmpeg) or a single rawvideo-pipe ffmpeg mux (reference
train_utils.py:59-144 renders the same frames via FuncAnimation)."""

import os
import stat

import numpy as np
import pytest

from gesture_generation_from_trimodal_context_tpu.utils import video


def _data(n_out=12, n_tgt=9):
    rs = np.random.RandomState(0)
    out = rs.randn(n_out, 27).astype(np.float32) * 0.05
    tgt = rs.randn(n_tgt, 27).astype(np.float32) * 0.05
    return tgt, out, np.zeros(27, np.float32)


def test_gif_fallback(tmp_path, monkeypatch):
    monkeypatch.setenv("GG_FFMPEG", "definitely-not-a-real-binary")
    tgt, out, mean = _data()
    op, tp = video.create_video_and_save(
        str(tmp_path), 3, "clip", 7, tgt, out, mean, "hello world",
        audio=np.zeros(16000, np.float32), delete_audio_file=False)
    assert op.shape == (12, 10, 3) and tp.shape == (9, 10, 3)
    gif = tmp_path / "clip_003_7.gif"
    wav = tmp_path / "clip_003_7.wav"
    assert gif.exists() and wav.exists()
    from PIL import Image
    im = Image.open(gif)
    # num_frames = max(len(target), len(output)); 640x320 = 8x4in @ 80dpi
    assert im.n_frames == 12
    assert im.size == (640, 320)


def test_gif_without_target_or_audio(tmp_path, monkeypatch):
    monkeypatch.setenv("GG_FFMPEG", "definitely-not-a-real-binary")
    _, out, mean = _data()
    op, tp = video.create_video_and_save(
        str(tmp_path), 0, "x", 0, None, out, mean, "t", audio=None)
    assert tp is None
    from PIL import Image
    assert Image.open(tmp_path / "x_000_0.gif").n_frames == 12


def test_ffmpeg_rawvideo_pipe(tmp_path, monkeypatch):
    # stub ffmpeg: consume stdin, record argv + byte count, create output
    stub = tmp_path / "ffmpeg-stub"
    stub.write_text(
        "#!/bin/sh\n"
        'for out in "$@"; do :; done\n'
        'nbytes=$(wc -c)\n'
        'printf "%s\\n" "$@" > "$out.args"\n'
        'echo $nbytes > "$out.bytes"\n'
        ': > "$out"\n')
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("GG_FFMPEG", str(stub))

    tgt, out, mean = _data()
    video.create_video_and_save(
        str(tmp_path), 0, "clip", 0, tgt, out, mean, "t",
        audio=np.zeros(16000, np.float32),
        clipping_to_shortest_stream=True, delete_audio_file=True)
    mp4 = tmp_path / "clip_000_0.mp4"
    assert mp4.exists()
    args = (tmp_path / "clip_000_0.mp4.args").read_text().splitlines()
    assert "-shortest" in args
    assert "640x320" in args
    assert str(tmp_path / "clip_000_0.wav") in args  # audio muxed in
    assert not (tmp_path / "clip_000_0.wav").exists()  # deleted after
    nbytes = int((tmp_path / "clip_000_0.mp4.bytes").read_text().split()[0])
    assert nbytes == 12 * 640 * 320 * 4  # rgba frames


def test_ffmpeg_failure_raises(tmp_path, monkeypatch):
    stub = tmp_path / "ffmpeg-bad"
    stub.write_text("#!/bin/sh\ncat > /dev/null\nexit 3\n")
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("GG_FFMPEG", str(stub))
    tgt, out, mean = _data(4, 4)
    with pytest.raises(RuntimeError, match="ffmpeg failed"):
        video.create_video_and_save(
            str(tmp_path), 0, "c", 0, tgt, out, mean, "t", audio=None)
