"""Loss-layer tests: semantic checks + parity with straightforward numpy math."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sednet_tpu.losses import (
    TripletConfig,
    edge_cls_loss,
    edge_embedding_loss,
    evaluate_type_miou,
    label_smoothing_nll,
    primitive_nll,
    pull_push_embedding_loss,
    triplet_loss,
)


def _clustered_embedding(rng, B, N, E, n_seg, spread=0.01):
    labels = rng.randint(0, n_seg, size=(B, N)).astype(np.int32)
    centers = rng.randn(n_seg, E).astype(np.float32) * 3
    emb = centers[labels] + rng.randn(B, N, E).astype(np.float32) * spread
    return jnp.asarray(emb), jnp.asarray(labels)


def test_triplet_loss_separated_vs_collapsed(rng):
    key = jax.random.PRNGKey(0)
    cfg = TripletConfig(max_segments=8, samples_per_segment=10, num_pairs=16)
    emb_good, labels = _clustered_embedding(rng, 2, 200, 16, 4)
    loss_good = float(triplet_loss(key, emb_good, labels, cfg))
    emb_bad = jnp.ones_like(emb_good)  # all identical -> margin violated always
    loss_bad = float(triplet_loss(key, emb_bad, labels, cfg))
    assert loss_good < 0.1
    assert loss_bad > 0.5 * loss_good + 0.1
    assert loss_bad > 0.2


def test_triplet_loss_single_segment_is_zero(rng):
    key = jax.random.PRNGKey(1)
    emb = jnp.asarray(rng.randn(2, 50, 8).astype(np.float32))
    labels = jnp.zeros((2, 50), dtype=jnp.int32)
    cfg = TripletConfig(max_segments=4, samples_per_segment=5, num_pairs=4)
    assert float(triplet_loss(key, emb, labels, cfg)) == 0.0


def test_triplet_loss_grad_finite(rng):
    key = jax.random.PRNGKey(2)
    # overlapping clusters -> some triplet violations -> nonzero gradient
    emb, labels = _clustered_embedding(rng, 1, 80, 8, 3, spread=3.0)
    cfg = TripletConfig(max_segments=4, samples_per_segment=6, num_pairs=8)
    g = jax.grad(lambda e: triplet_loss(key, e, labels, cfg))(emb)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_edge_cls_loss_matches_numpy(rng):
    B, N = 3, 40
    logits = rng.randn(B, N, 2).astype(np.float32)
    labels = rng.randint(0, 2, size=(B, N)).astype(np.int32)
    w = rng.rand(B, N).astype(np.float32)
    w[2] = 0.0  # third shape fully masked
    got = float(edge_cls_loss(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(w)))

    # numpy reference
    e = np.exp(logits - logits.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    nll = -np.log(p[np.arange(B)[:, None], np.arange(N)[None], labels])
    per_shape = (nll * w).mean(-1)
    per_shape[2] = 0.0
    np.testing.assert_allclose(got, per_shape.mean(), rtol=1e-5)


def test_pull_push_loss_behavior(rng):
    # tight clusters, far apart -> ~0 loss
    emb, labels = _clustered_embedding(rng, 2, 100, 8, 3, spread=0.01)
    loss, pull, push = pull_push_embedding_loss(emb, labels, max_segments=8)
    assert float(pull) < 0.05
    # collapsed centers -> push active
    emb2 = jnp.zeros_like(emb)
    loss2, pull2, push2 = pull_push_embedding_loss(emb2, labels, max_segments=8)
    assert float(push2) == pytest.approx(1.5, rel=1e-5)
    assert float(pull2) == 0.0


def test_pull_push_handles_noise_label(rng):
    emb = jnp.asarray(rng.randn(1, 30, 4).astype(np.float32))
    labels = jnp.asarray(np.concatenate([
        -np.ones(10, np.int32), np.zeros(10, np.int32), np.ones(10, np.int32)
    ])[None])
    loss, pull, push = pull_push_embedding_loss(emb, labels, max_segments=8)
    assert np.isfinite(float(loss))


def test_edge_embedding_loss_with_type(rng):
    B, N, E, C = 2, 64, 8, 6
    emb, labels = _clustered_embedding(rng, B, N, E, 3)
    edge_logits = jnp.asarray(rng.randn(B, N, 2).astype(np.float32))
    prim = jnp.asarray(rng.randint(0, C, size=(B, N)).astype(np.int32))
    lp = jax.nn.log_softmax(jnp.asarray(rng.randn(B, N, C).astype(np.float32)))
    loss = edge_embedding_loss(edge_logits, emb, labels, edges_num=16,
                               use_type=True, primitives=prim, type_log_prob=lp,
                               max_segments=8)
    assert np.isfinite(float(loss))
    loss_no = edge_embedding_loss(edge_logits, emb, labels, edges_num=16,
                                  max_segments=8)
    assert float(loss) > float(loss_no)  # includes an extra NLL term


def test_label_smoothing_matches_numpy(rng):
    B, N, C = 2, 30, 6
    logits = rng.randn(B, N, C).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits)))
    target = rng.randint(0, C, size=(B, N)).astype(np.int32)
    got = float(label_smoothing_nll(jnp.asarray(lp), jnp.asarray(target), 0.025))
    nll = -lp[np.arange(B)[:, None], np.arange(N)[None], target]
    smooth = -lp.mean(-1)
    ref = (0.975 * nll + 0.025 * smooth).mean()
    np.testing.assert_allclose(got, ref, rtol=1e-5)
    got_nll = float(primitive_nll(jnp.asarray(lp), jnp.asarray(target)))
    np.testing.assert_allclose(got_nll, nll.mean(), rtol=1e-5)


def test_evaluate_type_miou_perfect_and_disjoint():
    gt = jnp.asarray(np.array([[0, 1, 2, 3, 4, 5]] * 2, np.int32))
    perfect = jax.nn.one_hot(gt, 6) * 10.0
    miou = float(evaluate_type_miou(gt, jnp.log(jax.nn.softmax(perfect))))
    assert miou == pytest.approx(1.0, abs=1e-5)
    wrong = jax.nn.one_hot((gt + 1) % 6, 6) * 10.0
    miou_w = float(evaluate_type_miou(gt, jnp.log(jax.nn.softmax(wrong))))
    assert miou_w < 0.01
