"""Minimal inference server over an AOT serving bundle.

The deployment end of the export pipeline (sednet_tpu.export): a
single-process HTTP server that loads a bundle (type + inst artifacts),
pads incoming point clouds to the exported (B, N, C) shape, runs the
forward(s), optionally clusters the instance embedding with the guarded
mean-shift, and returns JSON. The reference has no serving path at all —
its inference is a research script (generate_predictions_aug.py).

Design notes (TPU serving):
  * the artifact's shape is static — requests are padded up to B shapes
    of N points each (shorter clouds are padded by repeating their last
    point, a no-op for kNN/type outputs of the real points, and the
    response slices back to the true lengths);
  * stdlib http.server only — zero dependencies beyond jax/numpy;
    single-threaded handler = natural request serialization onto the
    one-chip executor (no device contention);
  * protocol: POST /predict, body = JSON {"points": [[x,y,z,(nx,ny,nz)]
    ...] per shape, ...} or an npz payload (Content-Type:
    application/x-npz, arrays "points" (B', N', C)); response JSON with
    per-shape type predictions and optional instance labels.

CLI:
    python -m sednet_tpu.serve bundle_dir [--port 8765] [--cluster]
"""
from __future__ import annotations

import json
import io
import threading

import numpy as np
import jax
import jax.numpy as jnp


class BundleServer:
    """Wraps a loaded bundle with padding/batching + optional clustering."""

    def __init__(self, bundle_dir: str, *, cluster: bool = False,
                 ms_quantile: float = 0.015, ms_iterations: int = 50,
                 max_clusters: int = 49):
        from sednet_tpu.export import load_bundle

        self.meta, self.fns = load_bundle(bundle_dir)
        self.cluster = cluster
        self.ms_quantile = ms_quantile
        self.ms_iterations = ms_iterations
        self.max_clusters = max_clusters
        # exported input spec: "float32[B,N,C]"
        spec = self.meta["models"]["type_model"]["in_avals"][0]
        dims = spec[spec.index("[") + 1:spec.index("]")].split(",")
        self.batch, self.num_points, self.channels = map(int, dims)
        self._key = jax.random.PRNGKey(0)
        self._lock = threading.Lock()

    def _pad(self, shapes: list[np.ndarray]) -> tuple[np.ndarray, list[int]]:
        if len(shapes) > self.batch:
            raise ValueError(
                f"got {len(shapes)} shapes; artifact batch is {self.batch}")
        x = np.zeros((self.batch, self.num_points, self.channels),
                     np.float32)
        lengths = []
        for i, s in enumerate(shapes):
            s = np.asarray(s, np.float32)
            if s.ndim != 2 or s.shape[1] != self.channels:
                raise ValueError(
                    f"shape {i}: expected (n, {self.channels}), got {s.shape}")
            n = min(s.shape[0], self.num_points)
            x[i, :n] = s[:n]
            if n < self.num_points:   # repeat the last real point
                x[i, n:] = s[n - 1]
            lengths.append(n)
        for i in range(len(shapes), self.batch):  # pad batch with shape 0
            x[i] = x[0]
        return x, lengths

    def predict(self, shapes: list[np.ndarray]) -> list[dict]:
        x, lengths = self._pad(shapes)
        xj = jnp.asarray(x)
        with self._lock:
            tout = self.fns["type_model"](xj)
            types = np.asarray(jnp.argmax(tout["type_log_prob"], -1))
            results = [{"types": types[i, :lengths[i]].tolist()}
                       for i in range(len(shapes))]
            if "edge_logits" in tout:
                edges = np.asarray(jnp.argmax(tout["edge_logits"], -1))
                for i, r in enumerate(results):
                    r["edges"] = edges[i, :lengths[i]].tolist()
            if self.cluster:
                from sednet_tpu.cluster.mean_shift import guard_mean_shift

                iout = self.fns["inst_model"](xj)
                emb = iout["embedding"]
                emb = emb / jnp.clip(
                    jnp.linalg.norm(emb, axis=-1, keepdims=True), min=1e-12)
                self._key, k = jax.random.split(self._key)
                for i in range(len(shapes)):
                    res = guard_mean_shift(
                        k, emb[i], num_samples=self.num_points,
                        quantile=self.ms_quantile,
                        iterations=self.ms_iterations,
                        max_clusters=self.max_clusters)
                    results[i]["instances"] = np.asarray(
                        res.labels)[:lengths[i]].tolist()
                    results[i]["num_instances"] = int(res.num_clusters)
        return results


def _parse_body(content_type: str, body: bytes) -> list[np.ndarray]:
    if content_type.startswith("application/x-npz"):
        with np.load(io.BytesIO(body)) as d:
            pts = d["points"]
        return [pts[i] for i in range(pts.shape[0])]
    payload = json.loads(body)
    shapes = payload["points"]
    if shapes and not isinstance(shapes[0][0], (list, tuple)):
        shapes = [shapes]   # single shape given flat
    return [np.asarray(s, np.float32) for s in shapes]


def make_http_server(server: BundleServer, port: int = 8765):
    from http.server import BaseHTTPRequestHandler, HTTPServer

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code: int, obj):
            blob = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(blob)))
            self.end_headers()
            self.wfile.write(blob)

        def do_GET(self):
            if self.path == "/health":
                self._send(200, {"ok": True,
                                 "batch": server.batch,
                                 "num_points": server.num_points,
                                 "channels": server.channels})
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/predict":
                self._send(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                shapes = _parse_body(
                    self.headers.get("Content-Type", ""),
                    self.rfile.read(n))
                self._send(200, {"results": server.predict(shapes)})
            except Exception as e:  # noqa: BLE001 — report to client
                self._send(400, {"error": str(e)})

    return HTTPServer(("127.0.0.1", port), Handler)


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("bundle")
    ap.add_argument("--port", type=int, default=8765)
    ap.add_argument("--cluster", action="store_true",
                    help="also mean-shift the instance embedding")
    args = ap.parse_args(argv)
    srv = BundleServer(args.bundle, cluster=args.cluster)
    httpd = make_http_server(srv, args.port)
    print(json.dumps({"serving": args.bundle, "port": args.port,
                      "batch": srv.batch, "num_points": srv.num_points}))
    httpd.serve_forever()


if __name__ == "__main__":
    main()
