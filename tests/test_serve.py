"""Serving-path tests: bundle server padding/batching, HTTP round trip."""
import json
import io
import threading
import urllib.request

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sednet_tpu.config import Config
from sednet_tpu.export import export_serving_bundle
from sednet_tpu.serve import BundleServer, make_http_server
from sednet_tpu.train import build_model

N, K = 136, 8


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    cfg = Config(num_points=N, knn=K, embed=16, batch_size=2,
                 ms_num_samples=N)
    model = build_model(cfg)
    x = jnp.zeros((2, N, 6), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    d = str(tmp_path_factory.mktemp("bundle"))
    export_serving_bundle(cfg, params, params, d, platforms=["cpu"])
    return d, model, params


def test_server_pads_and_slices(bundle):
    d, model, params = bundle
    srv = BundleServer(d)
    rng = np.random.RandomState(0)
    short = rng.randn(N - 30, 6).astype(np.float32)
    full = rng.randn(N, 6).astype(np.float32)
    out = srv.predict([short, full])
    assert len(out) == 2
    assert len(out[0]["types"]) == N - 30
    assert len(out[1]["types"]) == N
    # full-length shape must match a direct forward exactly
    ref = model.apply({"params": params}, jnp.asarray(full)[None])
    np.testing.assert_array_equal(
        np.asarray(out[1]["types"]),
        np.asarray(jnp.argmax(ref.type_log_prob[0], -1)))


def test_server_cluster_labels(bundle):
    d, _, _ = bundle
    srv = BundleServer(d, cluster=True)
    rng = np.random.RandomState(1)
    pts = rng.randn(N, 6).astype(np.float32)
    pts[:, 3:] /= np.linalg.norm(pts[:, 3:], axis=1, keepdims=True)
    out = srv.predict([pts])
    assert len(out[0]["instances"]) == N
    assert out[0]["num_instances"] >= 1
    # short cloud: clustering runs on the REAL slice only (padded
    # duplicate rows would collapse the bandwidth estimate)
    out2 = srv.predict([pts[:N - 40]])
    assert len(out2[0]["instances"]) == N - 40


def test_server_rejects_bad_requests(bundle):
    d, _, _ = bundle
    srv = BundleServer(d)
    pts = np.zeros((N, 6), np.float32)
    with pytest.raises(ValueError):            # over batch
        srv.predict([pts, pts, pts])
    with pytest.raises(ValueError):            # over length
        srv.predict([np.zeros((N + 1, 6), np.float32)])
    with pytest.raises(ValueError):            # empty cloud
        srv.predict([np.zeros((0, 6), np.float32)])


def test_http_round_trip(bundle):
    d, _, _ = bundle
    srv = BundleServer(d)
    httpd = make_http_server(srv, port=0)   # ephemeral port
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/health") as r:
            h = json.loads(r.read())
        assert h["num_points"] == N

        pts = np.random.RandomState(2).randn(N, 6).astype(np.float32)
        # JSON body
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict",
            data=json.dumps({"points": pts.tolist()}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            res = json.loads(r.read())
        assert len(res["results"][0]["types"]) == N

        # npz body
        buf = io.BytesIO()
        np.savez(buf, points=pts[None])
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=buf.getvalue(),
            headers={"Content-Type": "application/x-npz"})
        with urllib.request.urlopen(req) as r:
            res2 = json.loads(r.read())
        assert res2["results"][0]["types"] == res["results"][0]["types"]
    finally:
        httpd.shutdown()
