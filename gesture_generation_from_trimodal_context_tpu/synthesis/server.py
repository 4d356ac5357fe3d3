"""Synthesis server: persistent-model gesture generation over HTTP.

Serving counterpart to the batch CLI (beyond the reference, which only
ships offline scripts — SURVEY.md §1.7).  The model is loaded and the
per-window function compiled once at startup; requests then run at
steady-state latency.  Concurrent /synthesize requests are DYNAMICALLY
BATCHED (DynamicBatcher): requests arriving within a short window run
as one batched device dispatch whose fused window scan carries a clip
batch axis, multiplying serving throughput under load (2.3x at 8
concurrent clips on one chip, RESULTS.md).

Endpoints (JSON over stdlib http.server, no extra deps):
- GET  /healthz            -> {"status": "ok", "model": ..., "pose_dim": N}
- POST /synthesize         body {"audio": [float...] (16 kHz) OR
                                 "audio_b64": base64 float32 LE,
                                 "words": [[word, start_s, end_s], ...],
                                 "vid": optional int,
                                 "seed_seq": optional [[...pose_dim]x4],
                                 "format": optional "bvh" (+ "scale")}
  -> {"out_dir_vec": [[...]], "out_poses": [[[x,y,z]x10]], "frames": N,
      "latency_ms": ...}   or {"bvh": "...", "frames": N, ...}
- POST /synthesize_stream  same body (format/scale ignored)
  -> chunked NDJSON, one line per finalized window:
     {"start_frame": F, "frames": n, "out_dir_vec": ..., "out_poses":
      ..., "elapsed_ms": ...} — first motion after ONE window forward;
     each later line covers stride_time (2 s at the published recipe).
"""

import base64
import json
import logging
import os
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import jax

from ..ops import skeleton
from ..train import checkpoint as ckpt_lib
from .engine import (generate_gestures, generate_gestures_batch,
                     generate_gestures_stream)


class SynthesisService:
    """Holds the loaded model; thread-safe generate()."""

    def __init__(self, checkpoint_path):
        (self.args, self.bundle, self.gen_vars, self.lang_model,
         self.speaker_model, self.pose_dim) = \
            ckpt_lib.load_checkpoint_and_model(checkpoint_path,
                                               jax.random.PRNGKey(0))
        self.mean_dir_vec = np.array(self.args.mean_dir_vec).squeeze()
        self._lock = threading.Lock()
        self._warm = False

    def warmup(self, buckets=(1,)):
        """Pre-compile the fused window-chain program for the given
        window-count buckets (engine._bucket) so first requests at any
        clip length under the largest bucket run at steady state."""
        unit = self.args.n_poses / self.args.motion_resampling_framerate
        stride = (self.args.n_poses - self.args.n_pre_poses) / \
            self.args.motion_resampling_framerate
        for n in buckets:
            secs = 1.0 if n <= 1 else unit + (n - 1) * stride
            audio = np.zeros(int(secs * 16000), np.float32)
            self.generate(audio, [["hello", 0.1, 0.4]], vid=0)
        # the streaming endpoint runs the per-window program; one pass
        # compiles it too
        for _ in self.generate_stream(np.zeros(16000, np.float32),
                                      [["hello", 0.1, 0.4]], vid=0):
            pass
        self._warm = True

    def generate(self, audio, words, vid=None, seed_seq=None):
        with self._lock:  # jitted fns are thread-safe, state donation is not
            t0 = time.time()
            dir_vec = generate_gestures(
                self.args, self.bundle, self.gen_vars, self.lang_model,
                np.asarray(audio, np.float32), words, vid=vid,
                seed_seq=seed_seq, rng=jax.random.PRNGKey(int(t0 * 1e3) % (2**31)))
            latency = (time.time() - t0) * 1000.0
        out = dir_vec + self.mean_dir_vec
        poses = skeleton.convert_dir_vec_to_pose_np(out)
        return dir_vec, poses, latency

    def generate_many(self, requests):
        """One batched device dispatch for MANY queued requests
        (engine.generate_gestures_batch: the fused window scan carries a
        clip batch axis, so N concurrent clips cost ~one clip's chain).
        `requests` is a list of dicts with audio/words/vid/seed_seq/rng;
        returns [(dir_vec, poses, latency_ms_of_the_batch), ...]."""
        with self._lock:
            t0 = time.time()
            outs = generate_gestures_batch(
                self.args, self.bundle, self.gen_vars, self.lang_model,
                requests)
            latency = (time.time() - t0) * 1000.0
        results = []
        for dir_vec in outs:
            poses = skeleton.convert_dir_vec_to_pose_np(
                dir_vec + self.mean_dir_vec)
            results.append((dir_vec, poses, latency))
        return results

    def generate_stream(self, audio, words, vid=None, seed_seq=None):
        """Yield (start_frame, dir_vec_chunk, poses_chunk, elapsed_ms)
        as windows finalize (engine.generate_gestures_stream)."""
        with self._lock:
            t0 = time.time()
            stream = generate_gestures_stream(
                self.args, self.bundle, self.gen_vars, self.lang_model,
                np.asarray(audio, np.float32), words, vid=vid,
                seed_seq=seed_seq,
                rng=jax.random.PRNGKey(int(t0 * 1e3) % (2 ** 31)))
            for start, chunk in stream:
                poses = skeleton.convert_dir_vec_to_pose_np(
                    chunk + self.mean_dir_vec)
                yield start, chunk, poses, (time.time() - t0) * 1000.0


class DynamicBatcher:
    """Coalesce concurrent /synthesize requests into ONE batched device
    dispatch (production dynamic batching).

    A lone request waits at most `window_ms` for company, then runs on
    the already-warm single-clip program (no extra compile, no batching
    overhead).  When >=2 requests arrive inside the window they run as
    one `generate_gestures_batch` call — the fused window scan carries
    a clip batch axis, so N concurrent clips cost about one clip's
    chain instead of N (measured in tools/bench_synthesis.py --batch).
    Batched (window-bucket, clip-bucket) programs compile once on first
    use and persist in the compile cache across restarts."""

    def __init__(self, service, window_ms=15.0, max_batch=16):
        self.service = service
        self.window_s = window_ms / 1000.0
        self.max_batch = max_batch
        self.queue = queue.Queue()
        self.stats = {"batched_calls": 0, "largest_batch": 0,
                      "single_calls": 0}
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="synth-batcher")
        self._thread.start()

    def submit(self, audio, words, vid=None, seed_seq=None):
        """Enqueue one request; blocks until its result is ready.
        Returns (dir_vec, poses, latency_ms) like service.generate."""
        item = {
            "audio": np.asarray(audio, np.float32), "words": words,
            "vid": vid, "seed_seq": seed_seq,
            "rng": jax.random.PRNGKey(time.time_ns() % (2 ** 31 - 1)),
            "event": threading.Event(), "result": None, "error": None,
        }
        self.queue.put(item)
        item["event"].wait()
        if item["error"] is not None:
            raise item["error"]
        return item["result"]

    def _run(self):
        while True:
            first = self.queue.get()
            batch = [first]
            deadline = time.time() + self.window_s
            while len(batch) < self.max_batch:
                remaining = deadline - time.time()
                if remaining <= 0:
                    break
                try:
                    batch.append(self.queue.get(timeout=remaining))
                except queue.Empty:
                    break
            try:
                if len(batch) == 1:
                    it = batch[0]
                    it["result"] = self.service.generate(
                        it["audio"], it["words"], vid=it["vid"],
                        seed_seq=it["seed_seq"])
                    self.stats["single_calls"] += 1
                else:
                    results = self.service.generate_many(
                        [{k: it[k] for k in
                          ("audio", "words", "vid", "seed_seq", "rng")}
                         for it in batch])
                    for it, res in zip(batch, results):
                        it["result"] = res
                    self.stats["batched_calls"] += 1
                    self.stats["largest_batch"] = max(
                        self.stats["largest_batch"], len(batch))
            except Exception as e:  # noqa: BLE001 — report to all waiters
                logging.exception("batched synthesis failed (%d reqs)",
                                  len(batch))
                for it in batch:
                    it["error"] = e
            finally:
                for it in batch:
                    it["event"].set()


def make_handler(service: SynthesisService, batcher: DynamicBatcher = None):
    class Handler(BaseHTTPRequestHandler):
        # chunked transfer (the streaming endpoint) requires HTTP/1.1;
        # the JSON endpoints all send Content-Length
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):
            logging.info("http: " + fmt, *args)

        def _json(self, code, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                payload = {"status": "ok",
                           "model": service.bundle.model_name,
                           "pose_dim": service.pose_dim,
                           "warm": service._warm}
                if batcher is not None:
                    payload["batching"] = dict(batcher.stats)
                self._json(200, payload)
            elif self.path in ("/", "/demo"):
                from .demo_page import demo_html
                body = demo_html(service.bundle.model_name).encode()
                self.send_response(200)
                self.send_header("Content-Type",
                                 "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self._json(404, {"error": "not found"})

        def _parse_request(self):
            length = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(length))
            if "audio_b64" in req:
                audio = np.frombuffer(
                    base64.b64decode(req["audio_b64"]), np.float32)
            elif "silence_s" in req:
                # words-only requests (e.g. the demo page): synthesize
                # over silent audio of the given duration
                audio = np.zeros(int(float(req["silence_s"]) * 16000),
                                 np.float32)
            else:
                audio = np.asarray(req["audio"], np.float32)
            words = [[w[0], float(w[1]), float(w[2])]
                     for w in req.get("words", [])]
            seed = (np.asarray(req["seed_seq"], np.float32)
                    if "seed_seq" in req else None)
            return req, audio, words, seed

        def _do_stream(self):
            """NDJSON over chunked transfer: one line per finalized
            window — first motion after ONE window forward instead of
            the whole clip."""
            try:
                req, audio, words, seed = self._parse_request()
                stream = service.generate_stream(
                    audio, words, vid=req.get("vid"), seed_seq=seed)
                first = next(stream)  # fail before headers if we can't run
            except Exception as e:
                logging.exception("synthesize_stream failed")
                self._json(500, {"error": str(e)})
                return
            self.send_response(200)
            self.send_header("Content-Type", "application/x-ndjson")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()

            def write_chunk(payload):
                data = (json.dumps(payload) + "\n").encode()
                self.wfile.write(b"%x\r\n" % len(data))
                self.wfile.write(data)
                self.wfile.write(b"\r\n")

            import itertools
            for start, chunk, poses, elapsed in itertools.chain(
                    [first], stream):
                write_chunk({
                    "start_frame": int(start),
                    "frames": int(chunk.shape[0]),
                    "out_dir_vec": chunk.tolist(),
                    "out_poses": poses.tolist(),
                    "elapsed_ms": round(elapsed, 2),
                })
            self.wfile.write(b"0\r\n\r\n")

        def do_POST(self):
            if self.path == "/synthesize_stream":
                self._do_stream()
                return
            if self.path != "/synthesize":
                self._json(404, {"error": "not found"})
                return
            try:
                req, audio, words, seed = self._parse_request()
                if batcher is not None:
                    dir_vec, poses, latency = batcher.submit(
                        audio, words, vid=req.get("vid"), seed_seq=seed)
                else:
                    dir_vec, poses, latency = service.generate(
                        audio, words, vid=req.get("vid"), seed_seq=seed)
                payload = {
                    "frames": int(dir_vec.shape[0]),
                    "latency_ms": round(latency, 2),
                }
                if req.get("format") == "bvh":
                    # character-animation document (interop/bvh_export):
                    # importable by Blender/Maya/MotionBuilder
                    from ..interop.bvh_export import bvh_string
                    payload["bvh"] = bvh_string(
                        dir_vec + service.mean_dir_vec,
                        fps=service.args.motion_resampling_framerate,
                        scale=float(req.get("scale", 1.0)))
                else:
                    payload["out_dir_vec"] = dir_vec.tolist()
                    payload["out_poses"] = poses.tolist()
                self._json(200, payload)
            except Exception as e:  # report, don't crash the server
                logging.exception("synthesize failed")
                self._json(500, {"error": str(e)})

    return Handler


def serve(checkpoint_path, host="127.0.0.1", port=8765, warmup=True,
          warmup_buckets=(1,), batch_window_ms=15.0, max_batch=16):
    """batch_window_ms > 0 enables dynamic batching on /synthesize
    (GG_SERVE_BATCH_MS env overrides; 0 disables): concurrent requests
    coalesce into one batched dispatch, lone requests pay at most the
    window before running on the single-clip program."""
    service = SynthesisService(checkpoint_path)
    if warmup:
        logging.info("warming up (compiling window-chain buckets %s)...",
                     warmup_buckets)
        service.warmup(warmup_buckets)
    env_ms = os.environ.get("GG_SERVE_BATCH_MS")
    if env_ms is not None:
        batch_window_ms = float(env_ms)
    batcher = (DynamicBatcher(service, batch_window_ms, max_batch)
               if batch_window_ms > 0 else None)
    server = ThreadingHTTPServer((host, port),
                                 make_handler(service, batcher))
    logging.info("serving %s on http://%s:%d (dynamic batching: %s)",
                 checkpoint_path, host, port,
                 "%.0f ms window, max %d" % (batch_window_ms, max_batch)
                 if batcher else "off")
    return server


def main(argv):
    ckpt = argv[1]
    port = int(argv[2]) if len(argv) > 2 else 8765
    # pre-compile up to 8-window (~16 s) clips; longer first requests
    # compile their bucket once (persistent cache makes restarts warm)
    server = serve(ckpt, port=port, warmup_buckets=(1, 4, 8))
    server.serve_forever()
