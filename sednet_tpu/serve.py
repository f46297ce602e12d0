"""Minimal inference server over an AOT serving bundle.

The deployment end of the export pipeline (sednet_tpu.export): a
single-process HTTP server that loads a bundle (type + inst artifacts),
pads incoming point clouds to the exported (B, N, C) shape, runs the
forward(s), optionally clusters the instance embedding with the guarded
mean-shift, and returns JSON. The reference has no serving path at all —
its inference is a research script (generate_predictions_aug.py).

Design notes (TPU serving):
  * the artifact's shape is static — requests are padded up to B shapes
    of N points each and the response slices back to the true lengths.
    Padding repeats the last real point, which is an APPROXIMATION for
    short clouds: pad copies can enter real points' kNN neighbourhoods
    and perturb their features (export an artifact at the shape you
    serve for exact outputs). Clustering always runs on the real-length
    slice only. Clouds longer than the artifact's N are rejected;
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

    def __init__(self, bundle_dir: str, *, cluster: bool = False):
        import dataclasses

        from sednet_tpu.config import Config
        from sednet_tpu.export import load_bundle

        self.meta, self.fns = load_bundle(bundle_dir)
        self.cluster = cluster
        # clustering knobs come from the bundle's config snapshot — the
        # server reproduces the predict.py pipeline the bundle's offline
        # evaluation (and audit) actually ran, hpnet enrichment included
        known = {f.name for f in dataclasses.fields(Config)}
        self.cfg = Config(**{k: v for k, v in self.meta["config"].items()
                             if k in known})
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
            n = s.shape[0]
            if n < 1:
                raise ValueError(f"shape {i}: empty point cloud")
            if n > self.num_points:
                raise ValueError(
                    f"shape {i}: {n} points exceeds the artifact's "
                    f"{self.num_points} (re-export at a larger shape)")
            x[i, :n] = s
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
                from sednet_tpu.cluster.spectral import hpnet_process
                from sednet_tpu.predict import spectral_embed

                cfg = self.cfg
                iout = self.fns["inst_model"](xj)
                self._key, k = jax.random.split(self._key)
                for i in range(len(shapes)):
                    # real-length slice ONLY: padded duplicate rows would
                    # collapse the bandwidth estimate and corrupt labels.
                    # Distinct lengths compile distinct programs — pad
                    # client-side to a few bucket sizes if that matters
                    n = lengths[i]
                    emb = iout["embedding"][i, :n]
                    if cfg.hpnet_embed and self.channels >= 6:
                        v, ent = spectral_embed(xj[i, :n, :3],
                                                xj[i, :n, 3:6], cfg,
                                                key=jax.random.fold_in(k, i))
                        emb = hpnet_process(
                            emb, xj[i, :n, :3], xj[i, :n, 3:6],
                            normal_smooth_w=cfg.normal_smooth_w,
                            cached_eigvecs=v, cached_eig_entropy=ent)
                    emb = emb / jnp.clip(
                        jnp.linalg.norm(emb, axis=-1, keepdims=True),
                        min=1e-12)
                    res = guard_mean_shift(
                        jax.random.fold_in(k, i), emb,
                        num_samples=min(cfg.ms_num_samples, n),
                        quantile=cfg.ms_quantile,
                        iterations=cfg.ms_iterations,
                        max_clusters=cfg.ms_max_clusters - 1,
                        retry_factor=cfg.ms_retry_factor,
                        bf16=cfg.ms_bf16, tol=cfg.ms_tol)
                    results[i]["instances"] = np.asarray(
                        res.labels).tolist()
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
