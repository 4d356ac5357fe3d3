"""Synthesis server: persistent-model gesture generation over HTTP.

Serving counterpart to the batch CLI (beyond the reference, which only
ships offline scripts — SURVEY.md §1.7).  The model is loaded and the
per-window function compiled once at startup; requests then run at
steady-state latency.

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
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import jax

from ..ops import skeleton
from ..train import checkpoint as ckpt_lib
from .engine import generate_gestures, generate_gestures_stream


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


def make_handler(service: SynthesisService):
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
                self._json(200, {"status": "ok",
                                 "model": service.bundle.model_name,
                                 "pose_dim": service.pose_dim,
                                 "warm": service._warm})
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
          warmup_buckets=(1,)):
    service = SynthesisService(checkpoint_path)
    if warmup:
        logging.info("warming up (compiling window-chain buckets %s)...",
                     warmup_buckets)
        service.warmup(warmup_buckets)
    server = ThreadingHTTPServer((host, port), make_handler(service))
    logging.info("serving %s on http://%s:%d", checkpoint_path, host, port)
    return server


def main(argv):
    ckpt = argv[1]
    port = int(argv[2]) if len(argv) > 2 else 8765
    # pre-compile up to 8-window (~16 s) clips; longer first requests
    # compile their bucket once (persistent cache makes restarts warm)
    server = serve(ckpt, port=port, warmup_buckets=(1, 4, 8))
    server.serve_forever()
