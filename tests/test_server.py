"""Synthesis HTTP server test: boot with a tiny checkpoint, synthesize."""

import json
import threading
import http.client

import numpy as np
import pytest
import jax

from gesture_generation_from_trimodal_context_tpu.config import (
    parse_args_mod as cfg)
from gesture_generation_from_trimodal_context_tpu.models import factory
from gesture_generation_from_trimodal_context_tpu.train import checkpoint as ckpt_lib
from gesture_generation_from_trimodal_context_tpu.synthesis import server as srv
from tests.test_synthesis import _cfg, tiny_speakers, tiny_vocab


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    args = cfg.parse_args([
        "--config", _cfg("multimodal_context.yml"),
        "--model_save_path", "unused", "--hidden_size", "32",
        "--n_layers", "2", "--wordembed_dim", "16"])
    lang, spk = tiny_vocab(), tiny_speakers()
    bundle = factory.init_model(args, lang, spk, 27)
    gvars = factory.generator_init_variables(bundle, args,
                                             jax.random.PRNGKey(0), 1)
    path = tmp_path_factory.mktemp("srv") / "ckpt.bin"
    ckpt_lib.save_checkpoint({
        "args": args, "epoch": 0, "lang_model": lang, "speaker_model": spk,
        "pose_dim": 27, "gen_vars": jax.device_get(gvars), "dis_vars": None,
    }, str(path))
    return str(path)


def test_server_roundtrip(tiny_ckpt):
    server = srv.serve(tiny_ckpt, port=0, warmup=True)  # ephemeral port
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("GET", "/healthz")
        health = json.loads(conn.getresponse().read())
        assert health["status"] == "ok"
        assert health["model"] == "multimodal_context"
        assert health["warm"] is True

        audio = np.zeros(16000, np.float32).tolist()
        body = json.dumps({"audio": audio,
                           "words": [["w1", 0.1, 0.3], ["w2", 0.5, 0.8]],
                           "vid": 1})
        conn.request("POST", "/synthesize", body=body,
                     headers={"Content-Type": "application/json"})
        resp = json.loads(conn.getresponse().read())
        assert resp["frames"] == 34  # 1 s clip -> single window
        out = np.asarray(resp["out_dir_vec"])
        assert out.shape == (34, 27)
        assert np.isfinite(out).all()
        assert np.asarray(resp["out_poses"]).shape == (34, 10, 3)
        assert resp["latency_ms"] > 0

        # BVH character-animation output on the same warm server
        body = json.dumps({"audio": audio, "words": [["w1", 0.1, 0.3]],
                           "vid": 1, "format": "bvh", "scale": 100.0})
        conn.request("POST", "/synthesize", body=body,
                     headers={"Content-Type": "application/json"})
        resp = json.loads(conn.getresponse().read())
        assert "out_dir_vec" not in resp
        assert resp["bvh"].startswith("HIERARCHY")
        assert "Frames: 34" in resp["bvh"]
        assert "MOTION" in resp["bvh"]

        # error path stays alive
        conn.request("POST", "/synthesize", body="not json")
        r = conn.getresponse()
        r.read()  # keep-alive: drain before reusing the connection
        assert r.status == 500
        conn.request("GET", "/healthz")
        assert json.loads(conn.getresponse().read())["status"] == "ok"
    finally:
        server.shutdown()


def test_server_b64_seed_and_404(tiny_ckpt):
    import base64
    server = srv.serve(tiny_ckpt, port=0, warmup=False)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        # base64 audio + explicit 4-frame seed sequence
        audio = (0.05 * np.random.RandomState(0)
                 .randn(16000)).astype(np.float32)
        seed = (0.01 * np.random.RandomState(1)
                .randn(4, 27)).astype(np.float32)
        body = json.dumps({
            "audio_b64": base64.b64encode(audio.tobytes()).decode(),
            "words": [["w1", 0.2, 0.4]],
            "seed_seq": seed.tolist()})
        conn.request("POST", "/synthesize", body=body,
                     headers={"Content-Type": "application/json"})
        resp = json.loads(conn.getresponse().read())
        assert np.isfinite(np.asarray(resp["out_dir_vec"])).all()
        assert resp["frames"] == 34

        # unknown paths 404 on both verbs
        conn.request("GET", "/nope")
        r = conn.getresponse()
        r.read()
        assert r.status == 404
        conn.request("POST", "/nope", body="{}")
        r = conn.getresponse()
        r.read()
        assert r.status == 404
    finally:
        server.shutdown()


def test_server_concurrent_requests(tiny_ckpt):
    """Two simultaneous requests (one streaming, one batch) both
    complete — the service lock serializes device use per request while
    ThreadingHTTPServer handles the connections concurrently."""
    server = srv.serve(tiny_ckpt, port=0, warmup=False)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    results = {}

    def hit(name, path, n_sec):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        audio = np.zeros(16000 * n_sec, np.float32).tolist()
        body = json.dumps({"audio": audio, "words": [["w1", 0.2, 0.6]],
                           "vid": 1})
        conn.request("POST", path, body=body,
                     headers={"Content-Type": "application/json"})
        r = conn.getresponse()
        data = r.read().decode()
        if path == "/synthesize_stream":
            frames = sum(json.loads(ln)["frames"]
                         for ln in data.splitlines() if ln.strip())
        else:
            frames = json.loads(data)["frames"]
        results[name] = (r.status, frames)

    try:
        threads = [threading.Thread(target=hit,
                                    args=("a", "/synthesize_stream", 4)),
                   threading.Thread(target=hit, args=("b", "/synthesize", 4))]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=300)
        assert results["a"] == (200, 64)  # 4 s -> 2 windows -> 30+34
        assert results["b"] == (200, 64)
    finally:
        server.shutdown()


def test_server_dynamic_batching(tiny_ckpt):
    """Concurrent /synthesize requests coalesce into ONE batched device
    dispatch (DynamicBatcher + engine.generate_gestures_batch): all
    succeed with per-request outputs, and healthz reports the batch."""
    server = srv.serve(tiny_ckpt, port=0, warmup=False,
                       batch_window_ms=300.0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    results = {}

    def hit(i):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        audio = (0.05 * np.random.RandomState(i)
                 .randn(16000 * 4)).astype(np.float32)
        body = json.dumps({"audio": audio.tolist(),
                           "words": [["w%d" % i, 0.2, 0.6]], "vid": 1})
        conn.request("POST", "/synthesize", body=body,
                     headers={"Content-Type": "application/json"})
        r = conn.getresponse()
        results[i] = (r.status, json.loads(r.read()))

    try:
        threads = [threading.Thread(target=hit, args=(i,))
                   for i in range(3)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=300)
        outs = []
        for i in range(3):
            status, resp = results[i]
            assert status == 200
            out = np.asarray(resp["out_dir_vec"])
            assert out.shape == (64, 27) and np.isfinite(out).all()
            outs.append(out)
        # distinct audio -> distinct gestures (no cross-lane mixing)
        assert not np.allclose(outs[0], outs[1])
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("GET", "/healthz")
        health = json.loads(conn.getresponse().read())
        assert health["batching"]["batched_calls"] >= 1
        assert health["batching"]["largest_batch"] >= 2
    finally:
        server.shutdown()


def test_server_streaming(tiny_ckpt):
    server = srv.serve(tiny_ckpt, port=0, warmup=False)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        audio = (0.05 * np.random.RandomState(0)
                 .randn(16000 * 8)).astype(np.float32).tolist()
        body = json.dumps({"audio": audio,
                           "words": [["w1", 0.5, 1.0], ["w2", 3.0, 3.5]],
                           "vid": 1})
        conn.request("POST", "/synthesize_stream", body=body,
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 200
        assert resp.headers["Content-Type"] == "application/x-ndjson"
        lines = [json.loads(ln) for ln in
                 resp.read().decode().splitlines() if ln]
        assert len(lines) == 4  # 8 s -> 4 windows
        assert [ln["start_frame"] for ln in lines] == [0, 30, 60, 90]
        assert [ln["frames"] for ln in lines] == [30, 30, 30, 34]
        total = np.vstack([np.asarray(ln["out_dir_vec"]) for ln in lines])
        assert total.shape == (124, 27) and np.isfinite(total).all()
        assert np.asarray(lines[0]["out_poses"]).shape == (30, 10, 3)
        assert lines[-1]["elapsed_ms"] >= lines[0]["elapsed_ms"]

        # demo page + words-only (silence_s) request body
        conn.request("GET", "/")
        r = conn.getresponse()
        page = r.read().decode()
        assert r.status == 200 and "streaming demo" in page
        assert "multimodal_context" in page
        body = json.dumps({"silence_s": 1.0, "words": [["w1", 0.2, 0.5]],
                           "vid": 1})
        conn.request("POST", "/synthesize", body=body,
                     headers={"Content-Type": "application/json"})
        resp = json.loads(conn.getresponse().read())
        assert resp["frames"] == 34

        # mid-parse failure before headers -> clean 500, server alive
        conn.request("POST", "/synthesize_stream", body="not json")
        r = conn.getresponse()
        r.read()
        assert r.status == 500
        conn.request("GET", "/healthz")
        assert json.loads(conn.getresponse().read())["status"] == "ok"
    finally:
        server.shutdown()
