"""Model-layer tests: shapes, jit-ability, gradient flow, GroupNorm parity."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sednet_tpu.models import SEDNet, DGCNNEncoder, SplineNet

B, N, K = 2, 64, 8


@pytest.fixture(scope="module")
def sednet_vars():
    model = SEDNet(emb_size=32, num_primitives=6, mode=5, k=K)
    rng = np.random.RandomState(0)
    pts = rng.randn(B, N, 3).astype(np.float32)
    nrm = rng.randn(B, N, 3).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    x = jnp.asarray(np.concatenate([pts, nrm], -1))
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables, x


def test_sednet_shapes(sednet_vars):
    model, variables, x = sednet_vars
    out = jax.jit(model.apply)(variables, x)
    assert out.embedding.shape == (B, N, 32)
    assert out.type_log_prob.shape == (B, N, 6)
    assert out.edge_logits.shape == (B, N, 2)
    # log-softmax normalization
    np.testing.assert_allclose(
        np.asarray(jnp.exp(out.type_log_prob).sum(-1)), 1.0, atol=1e-4
    )
    assert np.isfinite(np.asarray(out.embedding)).all()


def test_sednet_mode0_and_normals_head():
    model = SEDNet(emb_size=16, num_primitives=6, mode=0, k=4, predict_normal=True)
    x = jnp.asarray(np.random.RandomState(1).randn(1, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.normals_pred.shape == (1, 64, 3)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(out.normals_pred, axis=-1)), 1.0, atol=1e-5
    )


def test_sednet_grads_flow(sednet_vars):
    model, variables, x = sednet_vars

    def loss_fn(params):
        out = model.apply({"params": params}, x)
        return (
            jnp.sum(out.embedding ** 2)
            + jnp.sum(out.type_log_prob)
            + jnp.sum(out.edge_logits ** 2)
        )

    g = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # every parameter gets a gradient signal (encoder + all heads)
    nonzero = [float(jnp.abs(l).max()) > 0 for l in leaves]
    assert np.mean(nonzero) > 0.95


def test_late_fusion_stops_gradient():
    """Gradient of the embedding w.r.t. type-head params must flow only via
    the early-fusion (asis) path; late-fusion input is stop_gradient'd."""
    model = SEDNet(emb_size=8, num_primitives=6, mode=0, k=4,
                   combine_label_prim=False, late_fusion=True)
    x = jnp.asarray(np.random.RandomState(2).randn(1, 32, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)

    def emb_loss(params):
        return jnp.sum(model.apply({"params": params}, x).embedding ** 2)

    g = jax.grad(emb_loss)(variables["params"])
    assert float(jnp.abs(g["mlp_prim_prob2"]["kernel"]).max()) == 0.0


def test_encoder_output_shapes():
    enc = DGCNNEncoder(mode=0, k=4)
    x = jnp.asarray(np.random.RandomState(3).randn(2, 40, 3).astype(np.float32))
    variables = enc.init(jax.random.PRNGKey(0), x)
    g, f = enc.apply(variables, x)
    assert g.shape == (2, 1024)
    assert f.shape == (2, 40, 256)


def test_splinenet_shapes_and_weighted_pool():
    model = SplineNet(grid_size=5, k=4)
    x = jnp.asarray(np.random.RandomState(4).randn(2, 30, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    cp = model.apply(variables, x)
    assert cp.shape == (2, 25, 3)
    assert (np.abs(np.asarray(cp)) <= 1.0).all()
    w = jnp.ones((2, 30))
    cp_w = model.apply(variables, x, weights=w)
    np.testing.assert_allclose(np.asarray(cp_w), np.asarray(cp), atol=1e-5)


def test_groupnorm_matches_torch():
    """flax GroupNorm on (B, N, K, C) must match torch GroupNorm on (B, C, N, K)."""
    import torch
    import flax.linen as nn

    rng = np.random.RandomState(5)
    x = rng.randn(2, 7, 5, 64).astype(np.float32)
    gn = nn.GroupNorm(num_groups=2)
    variables = gn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = np.asarray(gn.apply(variables, jnp.asarray(x)))

    tg = torch.nn.GroupNorm(2, 64)
    with torch.no_grad():
        theirs = tg(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_encoder_sorted_path_matches_unsorted():
    """The shared-permutation encoder (one Morton sort at entry, inverse
    gather at exit) is exactly permutation-equivariant: forcing the sorted
    path on CPU must reproduce the unsorted output up to f32 reduction
    order — including when a precomputed idx1 graph (original point ids)
    is supplied and must be re-expressed in sorted space."""
    from sednet_tpu.ops.knn import knn_indices_points_normals

    rng = np.random.RandomState(3)
    pts = rng.randn(B, N, 3).astype(np.float32)
    nrm = rng.randn(B, N, 3).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    x = jnp.asarray(np.concatenate([pts, nrm], -1))

    enc_ref = DGCNNEncoder(mode=5, k=K, sort_points=False)
    enc_srt = DGCNNEncoder(mode=5, k=K, sort_points=True)
    variables = enc_ref.init(jax.random.PRNGKey(0), x)

    g0, f0 = jax.jit(enc_ref.apply)(variables, x)
    g1, f1 = jax.jit(enc_srt.apply)(variables, x)
    np.testing.assert_allclose(np.asarray(f0), np.asarray(f1),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1),
                               rtol=1e-4, atol=1e-5)

    idx1 = knn_indices_points_normals(x, K)
    g2, f2 = jax.jit(enc_srt.apply)(variables, x, idx1)
    np.testing.assert_allclose(np.asarray(f0), np.asarray(f2),
                               rtol=1e-4, atol=1e-5)


def test_sednet_bf16_matches_f32(sednet_vars):
    """Mixed-precision forward (config.model_bf16): same f32 parameter
    tree, bf16 activations — outputs must stay f32-typed and within
    bf16-quantization tolerance of the full-precision forward, and the
    kNN graphs must be built identically (f32 values by design)."""
    model, variables, x = sednet_vars
    ref = jax.jit(model.apply)(variables, x)
    mb = SEDNet(emb_size=32, num_primitives=6, mode=5, k=K,
                dtype=jnp.bfloat16)
    out = jax.jit(mb.apply)(variables, x)
    assert out.embedding.dtype == jnp.float32
    assert out.type_log_prob.dtype == jnp.float32
    assert out.edge_logits.dtype == jnp.float32
    # activations pass ~10 GN/Dense stages in bf16 (rel step 2^-8);
    # head outputs are O(1) scaled, so absolute tolerance ~0.15
    np.testing.assert_allclose(np.asarray(out.embedding),
                               np.asarray(ref.embedding), atol=0.2)
    np.testing.assert_allclose(np.asarray(out.type_log_prob),
                               np.asarray(ref.type_log_prob), atol=0.3)


def test_train_step_bf16_runs_and_updates():
    """A train step with model_bf16: grads flow through the bf16 compute
    into the f32 params; every param update is finite and f32."""
    from sednet_tpu.config import Config
    from sednet_tpu.train import (TrainState, build_model, make_optimizer,
                                  make_train_step, model_input)

    cfg = Config(num_points=N, knn=K, embed=16, batch_size=B,
                 model_bf16=True, edge_topk=16)
    model = build_model(cfg)
    rng = np.random.RandomState(1)
    pts = rng.randn(B, N, 3).astype(np.float32)
    nrm = rng.randn(B, N, 3).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    batch = {"points": pts, "normals": nrm,
             "labels": rng.randint(0, 3, (B, N)).astype(np.int32),
             "prim": rng.randint(0, 6, (B, N)).astype(np.int32),
             "edges": rng.randint(0, 2, (B, N)).astype(np.int32),
             "edges_w": np.ones((B, N), np.float32)}
    params = model.init(jax.random.PRNGKey(0),
                        model_input(batch, True))["params"]
    opt = make_optimizer(cfg)
    state = TrainState(params, opt.init(params), 0)
    step = make_train_step(model, opt, cfg)
    # the step donates its input state — snapshot before stepping
    params = jax.tree.map(np.asarray, params)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    leaves = jax.tree.leaves(new_state.params)
    assert all(l.dtype == jnp.float32 for l in leaves)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # at least some params moved
    moved = sum(float(np.abs(np.asarray(a) - np.asarray(b)).max()) > 0
                for a, b in zip(jax.tree.leaves(params), leaves))
    assert moved > 0


def test_factored_gn_matches_direct(sednet_vars):
    """The factored edge-conv GroupNorm (one gather pass, stats
    reconstructed from sum/sumsq/extremum — ops.graph.edge_conv_factored)
    must reproduce the direct nn.GroupNorm path on the SAME parameter
    tree, for outputs AND gradients."""
    model, variables, x = sednet_vars
    fac = SEDNet(emb_size=32, num_primitives=6, mode=5, k=K,
                 factored_gn=True)
    out_d = model.apply(variables, x)
    out_f = fac.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out_f.embedding),
                               np.asarray(out_d.embedding),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_f.type_log_prob),
                               np.asarray(out_d.type_log_prob),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_f.edge_logits),
                               np.asarray(out_d.edge_logits),
                               rtol=2e-4, atol=2e-4)

    def loss(m):
        def f(v):
            o = m.apply(v, x)
            return (jnp.sum(o.embedding ** 2)
                    + jnp.sum(o.type_log_prob * o.type_log_prob)
                    + jnp.sum(o.edge_logits ** 2))
        return f

    g_d = jax.grad(loss(model))(variables)
    g_f = jax.grad(loss(fac))(variables)
    flat_d = jax.tree_util.tree_leaves(g_d)
    flat_f = jax.tree_util.tree_leaves(g_f)
    for a, b in zip(flat_d, flat_f):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=5e-3)


def test_factored_gn_negative_scale_extremum():
    """A NEGATIVE GroupNorm scale flips the channel's monotone direction:
    max_k leaky(GN(f)) must come from the per-channel MINIMUM of the
    pre-GN values. Pin it by surgically negating one scale entry."""
    model = SEDNet(emb_size=16, num_primitives=6, mode=0, k=K)
    fac = SEDNet(emb_size=16, num_primitives=6, mode=0, k=K,
                 factored_gn=True)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, N, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(1), x)
    import flax
    flat = flax.traverse_util.flatten_dict(variables["params"])
    kscale = ("encoder", "conv1", "gn", "scale")
    s = np.array(flat[kscale])
    s[: s.shape[0] // 2] = -np.abs(s[: s.shape[0] // 2]) - 0.5
    flat[kscale] = jnp.asarray(s)
    variables = {"params": flax.traverse_util.unflatten_dict(flat)}
    out_d = model.apply(variables, x)
    out_f = fac.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out_f.embedding),
                               np.asarray(out_d.embedding),
                               rtol=2e-4, atol=2e-4)
