"""Tests for the index-free fused edge conv (ops.fused_edgeconv).

The fused inference encoder must reproduce the standard flax path
(kNN -> gather -> conv -> GN -> LeakyReLU -> max, reference:
src/PointNet.py:140-171 + src/SEDNet.py:78-98) without materializing
indices or the (B, N, K, C) tensor. Interpret mode on CPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sednet_tpu.ops.fused_edgeconv import (encoder_apply_fused,
                                           fused_edge_conv,
                                           fused_edge_reductions)


def _brute_reductions(geom, a, k):
    """Reference: threshold = k-th smallest squared distance (ties join)."""
    d = np.sum((geom[:, None, :] - geom[None, :, :]) ** 2, axis=-1)
    t = np.sort(d, axis=1)[:, k - 1]
    hit = d <= t[:, None]
    mx = np.max(np.where(hit[:, :, None], a[None, :, :], -np.inf), axis=1)
    sm = (hit.astype(np.float64) @ a.astype(np.float64)).astype(np.float32)
    sq = (hit.astype(np.float64) @ (a.astype(np.float64) ** 2)).astype(
        np.float32)
    cnt = hit.sum(axis=1).astype(np.float32)
    return mx, sm, sq, cnt


@pytest.mark.parametrize("n,c,k", [(200, 16, 8), (384, 64, 16)])
def test_fused_reductions_match_brute_force(n, c, k):
    rng = np.random.default_rng(0)
    geom = rng.standard_normal((n, 3)).astype(np.float32)
    a = rng.standard_normal((n, c)).astype(np.float32)
    mx, sm, sq, cnt = fused_edge_reductions(
        jnp.asarray(geom), jnp.asarray(a), k, interpret=True)
    rmx, rsm, rsq, rcnt = _brute_reductions(geom, a, k)
    np.testing.assert_array_equal(np.asarray(cnt), rcnt)
    np.testing.assert_allclose(np.asarray(mx), rmx, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sm), rsm, atol=1e-3)
    np.testing.assert_allclose(np.asarray(sq), rsq, atol=1e-3)


def test_fused_edge_conv_matches_flax_layer():
    """Single layer vs models.backbone.EdgeConv on identical params."""
    from sednet_tpu.models.backbone import EdgeConv
    from sednet_tpu.ops.knn import knn_indices

    rng = np.random.default_rng(1)
    n, c_in, c_out, k = 256, 6, 64, 12
    x = jnp.asarray(rng.standard_normal((1, n, c_in)).astype(np.float32))
    layer = EdgeConv(c_out, groups=2, k=k)
    vars_ = layer.init(jax.random.PRNGKey(0), x, knn_indices(x, k))
    ref = layer.apply(vars_, x, knn_indices(x, k))
    out = fused_edge_conv(
        x[0], x[0], vars_["params"]["conv"]["kernel"],
        vars_["params"]["gn"]["scale"], vars_["params"]["gn"]["bias"], k,
        groups=2, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref[0]),
                               atol=2e-5)


def test_fused_edge_conv_negative_gn_scale():
    """Channels with negative GN scale need the min (not max) of the
    pre-activation — exercised by flipping half the scales."""
    from sednet_tpu.models.backbone import EdgeConv
    from sednet_tpu.ops.knn import knn_indices

    rng = np.random.default_rng(2)
    n, c_in, c_out, k = 200, 3, 16, 8
    x = jnp.asarray(rng.standard_normal((1, n, c_in)).astype(np.float32))
    layer = EdgeConv(c_out, groups=2, k=k)
    vars_ = layer.init(jax.random.PRNGKey(0), x, knn_indices(x, k))
    scale = jnp.asarray(
        rng.choice([-1.0, 1.0], size=c_out).astype(np.float32)
        * (0.5 + rng.random(c_out).astype(np.float32)))
    vars_ = jax.tree_util.tree_map(lambda v: v, vars_)
    vars_["params"]["gn"]["scale"] = scale
    ref = layer.apply(vars_, x, knn_indices(x, k))
    out = fused_edge_conv(
        x[0], x[0], vars_["params"]["conv"]["kernel"], scale,
        vars_["params"]["gn"]["bias"], k, groups=2, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref[0]),
                               atol=2e-5)


@pytest.mark.parametrize("mode,cdim", [(0, 3), (5, 6)])
def test_encoder_apply_fused_matches_flax(mode, cdim):
    from sednet_tpu.models.backbone import DGCNNEncoder

    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 320, cdim)).astype(np.float32)
    if cdim == 6:
        x[..., 3:] /= np.linalg.norm(x[..., 3:], axis=-1, keepdims=True)
    x = jnp.asarray(x)
    enc = DGCNNEncoder(mode=mode, k=16)
    vars_ = enc.init(jax.random.PRNGKey(0), x)
    gref, fref = enc.apply(vars_, x)
    gfus, ffus = encoder_apply_fused(
        vars_["params"], x, mode=mode, k=16, interpret=True)
    np.testing.assert_allclose(np.asarray(ffus), np.asarray(fref),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(gfus), np.asarray(gref),
                               atol=5e-5)


def test_make_forward_fused_flag():
    """predict.make_forward(fused=True) (config.fused_encoder) runs and
    agrees with the standard forward on CPU."""
    from sednet_tpu.models.sednet import SEDNet
    from sednet_tpu.predict import make_forward

    rng = np.random.default_rng(5)
    x = rng.standard_normal((1, 256, 6)).astype(np.float32)
    x[..., 3:] /= np.linalg.norm(x[..., 3:], axis=-1, keepdims=True)
    x = jnp.asarray(x)
    model = SEDNet(mode=5, k=12)
    vars_ = model.init(jax.random.PRNGKey(0), x)
    lp0, emb0, el0 = make_forward(model)(vars_["params"], x)
    lp1, emb1, el1 = make_forward(model, fused=True)(vars_["params"], x)
    np.testing.assert_allclose(np.asarray(lp1), np.asarray(lp0), atol=5e-5)
    np.testing.assert_allclose(np.asarray(emb1), np.asarray(emb0),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(el1), np.asarray(el0), atol=5e-5)


def test_apply_fused_full_model():
    from sednet_tpu.models.sednet import SEDNet, apply_fused

    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 320, 6)).astype(np.float32)
    x[..., 3:] /= np.linalg.norm(x[..., 3:], axis=-1, keepdims=True)
    x = jnp.asarray(x)
    model = SEDNet(mode=5, k=16)
    vars_ = model.init(jax.random.PRNGKey(0), x)
    ref = model.apply(vars_, x)
    fus = apply_fused(model, vars_, x, interpret=True)
    for name in ("embedding", "type_log_prob", "edge_logits"):
        np.testing.assert_allclose(
            np.asarray(getattr(fus, name)),
            np.asarray(getattr(ref, name)), atol=5e-5)


def test_fused_reductions_duplicated_points_all_ties():
    """Exact duplicates tie the k-th distance; every duplicate must join
    the neighbour set regardless of which streamed tile holds it
    (regression: strict '<' tracking skipped late tie-only tiles)."""
    rng = np.random.default_rng(7)
    base = rng.standard_normal((80, 3)).astype(np.float32)
    geom = np.concatenate([base, base, base])          # every point x3
    a = rng.standard_normal((240, 8)).astype(np.float32)
    k = 6  # k-th distance ties across duplicates
    mx, sm, sq, cnt = fused_edge_reductions(
        jnp.asarray(geom), jnp.asarray(a), k, interpret=True)
    rmx, rsm, rsq, rcnt = _brute_reductions(geom, a, k)
    np.testing.assert_array_equal(np.asarray(cnt), rcnt)
    np.testing.assert_allclose(np.asarray(sm), rsm, atol=1e-3)
