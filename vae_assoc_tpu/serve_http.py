"""Stdlib HTTP serving front end over `serve.Predictor` + `MicroBatcher`.

The reference deploys its model through bespoke robot scripts; a
production framework needs a network-serving surface. This one is
dependency-free (http.server + json), threaded, and routes every request
through the `MicroBatcher`, so concurrent small requests coalesce into
batched device calls exactly like the in-process API
(`docs/API.md` "Serving").

    python -m vae_assoc_tpu.serve_http /path/to/save_model_dir --port 8000

Endpoints (JSON in / JSON out):

  GET  /healthz                  → {"status": "ok", "modalities": [...]}
  POST /v1/transform             {"inputs": [[...], ...] per modality}
                                 → {"latents": [[...], ...] per modality}
  POST /v1/generate              {"latents": [[...]], "modality": "image"}
                                 → {"outputs": [[...]]}
  POST /v1/reconstruct           {"inputs": [[...]], "modality": "image"}
                                 → {"outputs": [[...]]}
  POST /v1/cross_generate        {"inputs": [[...]], "src": "image",
                                  "dst": "trajectory"}
                                 → {"outputs": [[...]]}

Errors return 400 with {"error": "..."} for malformed requests (unknown
modality, wrong feature width, bad JSON); 404 for unknown routes. The
server is intentionally minimal — TLS, auth, and horizontal scaling
belong to the deployment layer in front of it.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from vae_assoc_tpu.serve import MicroBatcher, Predictor


def _pad_rows(x: np.ndarray, n: int) -> np.ndarray:
    if x.shape[0] >= n:
        return x
    return np.concatenate(
        [x, np.zeros((n - x.shape[0],) + x.shape[1:], x.dtype)], axis=0
    )


class ModelServer:
    """Owns the Predictor + MicroBatcher and serves them over HTTP.

    Compiles are a STARTUP concern, never a request-thread one: the
    batcher pads every dispatch to at least `min_batch` rows, which makes
    the reachable bucket set the finite {min_batch, 2·min_batch, …,
    max_batch}, and `warm=True` (default) pre-compiles every endpoint
    program over exactly that set before the server binds. This is the
    right production shape anyway (bounded, pre-verified program set) and
    on high-latency tunnel TPU backends it is load-bearing: an XLA
    compile triggered from a worker/handler thread was measured to take
    10×+ a main-thread compile (see docs/PERF.md "Serving").
    """

    def __init__(self, predictor: Predictor, *, max_batch: int = 1024,
                 max_wait_ms: float = 2.0, min_batch: int = 64,
                 warm: bool = True):
        self.predictor = predictor
        min_batch = min(min_batch, max_batch)
        self.batcher = MicroBatcher(
            predictor, max_batch=max_batch, max_wait_ms=max_wait_ms,
            min_batch=min_batch,
        )
        if warm:
            b, buckets = max(1, min_batch), []
            while b <= max_batch:
                buckets.append(b)
                b *= 2
            predictor.warmup(buckets, all_endpoints=True)
        self._httpd = None

    # -- request handling (pure: dict in → (status, dict) out) --------------
    def handle(self, path: str, payload: dict):
        cfg = self.predictor.cfg
        mb = self.batcher.min_batch
        try:
            if path == "/v1/transform":
                xs = [np.asarray(x, np.float32) for x in payload["inputs"]]
                if len(xs) != len(cfg.modalities):
                    raise ValueError(
                        f"expected {len(cfg.modalities)} modality input "
                        f"arrays, got {len(xs)}"
                    )
                # Pad to the warmed bucket floor — direct endpoints must
                # stay inside the pre-compiled program set too.
                n = xs[0].shape[0]
                xs = [_pad_rows(x, mb) for x in xs]
                zs = self.predictor.transform(xs)
                return 200, {"latents": [z[:n].tolist() for z in zs]}
            if path == "/v1/generate":
                z = np.asarray(payload["latents"], np.float32)
                n = z.shape[0]
                out = self.predictor.generate(
                    _pad_rows(z, mb), payload["modality"]
                )
                return 200, {"outputs": out[:n].tolist()}
            if path == "/v1/reconstruct":
                x = np.asarray(payload["inputs"], np.float32)
                m = payload["modality"]
                # reconstruct == cross_generate(m, m): route it through the
                # batcher so concurrent callers coalesce.
                out = self.batcher.cross_generate(x, m, m)
                return 200, {"outputs": out.tolist()}
            if path == "/v1/cross_generate":
                x = np.asarray(payload["inputs"], np.float32)
                out = self.batcher.cross_generate(
                    x, payload["src"], payload["dst"]
                )
                return 200, {"outputs": out.tolist()}
        except (KeyError, ValueError, TypeError) as e:
            return 400, {"error": str(e)}
        return 404, {"error": f"no route {path}"}

    # -- lifecycle -----------------------------------------------------------
    def serve(self, host: str = "127.0.0.1", port: int = 8000):
        """Blocking serve_forever (Ctrl-C to stop)."""
        with self._make_httpd(host, port):
            self._httpd.serve_forever()

    def start(self, host: str = "127.0.0.1", port: int = 0) -> int:
        """Background-thread server (tests); returns the bound port."""
        self._make_httpd(host, port)
        t = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        t.start()
        return self._httpd.server_address[1]

    def _make_httpd(self, host, port):
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet by default
                pass

            def _send(self, status: int, obj: dict):
                body = json.dumps(obj).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    self._send(200, {
                        "status": "ok",
                        "modalities": [m.name for m in
                                       server.predictor.cfg.modalities],
                    })
                else:
                    self._send(404, {"error": f"no route {self.path}"})

            def do_POST(self):
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    payload = json.loads(self.rfile.read(n) or b"{}")
                except (ValueError, json.JSONDecodeError) as e:
                    self._send(400, {"error": f"bad JSON: {e}"})
                    return
                status, obj = server.handle(self.path, payload)
                self._send(status, obj)

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        return self._httpd

    def close(self):
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
        self.batcher.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(
        prog="vae_assoc_tpu.serve_http", description=__doc__
    )
    p.add_argument("model_dir", help="save_model directory (model_config.json)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max-batch", type=int, default=1024)
    p.add_argument("--min-batch", type=int, default=64,
                   help="dispatch-padding floor; with --max-batch it bounds "
                        "the compile set warmed at startup")
    p.add_argument("--max-wait-ms", type=float, default=2.0)
    p.add_argument("--no-warm", action="store_true",
                   help="skip the startup warmup (requests may then "
                        "compile on worker threads — slow on tunnel TPU)")
    args = p.parse_args(argv)

    pred = Predictor.load(args.model_dir)
    with ModelServer(pred, max_batch=args.max_batch,
                     min_batch=args.min_batch,
                     max_wait_ms=args.max_wait_ms,
                     warm=not args.no_warm) as server:
        print(f"serving {args.model_dir} on http://{args.host}:{args.port}",
              flush=True)
        try:
            server.serve(args.host, args.port)
        except KeyboardInterrupt:
            pass
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
