"""AOT export / serving bundle tests (sednet_tpu.export).

The reference has no serving path; these pin the TPU-native addition:
jax.export round trip, cross-platform (TPU-from-CPU-host) lowering with
the Pallas kernel path embedded, and the CLI."""
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sednet_tpu.config import Config
from sednet_tpu.export import (export_serving_bundle, load_bundle, main)
from sednet_tpu.train import build_model, save_params_npz

# unique shape: the force_backend("tpu") trace in the cross-export test
# must not collide with cached CPU-path traces of other tests' shapes
N, K = 136, 8


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    cfg = Config(num_points=N, knn=K, embed=16, batch_size=2)
    model = build_model(cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(2, N, 6).astype(
        np.float32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    return cfg, model, params, x


def test_bundle_round_trip_matches_apply(tiny, tmp_path):
    cfg, model, params, x = tiny
    d = str(tmp_path / "bundle")
    export_serving_bundle(cfg, params, params, d, platforms=["cpu"])
    meta, fns = load_bundle(d)
    assert set(fns) == {"type_model", "inst_model"}
    out = fns["type_model"](x)
    ref = model.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out["embedding"]),
                               np.asarray(ref.embedding), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["type_log_prob"]),
                               np.asarray(ref.type_log_prob), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["edge_logits"]),
                               np.asarray(ref.edge_logits), atol=1e-5)
    # meta records shapes + platforms for the serving process
    m = meta["models"]["type_model"]
    assert m["platforms"] == ["cpu"]
    assert f"float32[2,{N},6]" in m["in_avals"][0]


def test_tpu_export_from_cpu_host_embeds_pallas(tiny, tmp_path):
    """platforms=["tpu"] on a CPU host: the trace runs under
    force_backend("tpu"), so the artifact carries the Mosaic custom
    calls of the fused kNN kernels — the path the serving chip wants."""
    cfg, model, params, x = tiny
    d = str(tmp_path / "bundle_tpu")
    export_serving_bundle(cfg, params, params, d, platforms=["tpu"])
    with open(os.path.join(d, "meta.json")) as f:
        meta = json.load(f)
    assert meta["models"]["type_model"]["platforms"] == ["tpu"]
    blob = open(os.path.join(d, "type_model.jaxexport"), "rb").read()
    assert b"tpu_custom_call" in blob or b"mosaic" in blob


def test_export_cli(tiny, tmp_path):
    cfg, model, params, x = tiny
    cfg_path = str(tmp_path / "cfg.json")
    cfg.save(cfg_path)
    ck = str(tmp_path / "ck.npz")
    save_params_npz(ck, params)
    out = str(tmp_path / "bundle_cli")
    main([cfg_path, "--type-ckpt", ck, "--inst-ckpt", ck, "--out", out,
          "--batch", "2", "--platforms", "cpu"])
    meta, fns = load_bundle(out)
    res = fns["inst_model"](x)
    assert res["embedding"].shape == (2, N, 16)
