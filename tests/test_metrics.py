"""Metric-stack golden tests."""
import numpy as np
import jax.numpy as jnp
import pytest

from sednet_tpu.metrics import (
    compute_type_miou_abc,
    hungarian_match,
    mean_iou_one_sample,
    primitive_type_per_segment,
    relaxed_iou_fast,
    siou_matched_segments,
    siou_matched_segments_usecd,
    to_one_hot,
)


def test_to_one_hot():
    oh = to_one_hot(np.array([0, 2, 2]), 4)
    np.testing.assert_array_equal(
        oh, [[1, 0, 0, 0], [0, 0, 1, 0], [0, 0, 1, 0]])


def test_relaxed_iou_identity():
    labels = np.array([0, 0, 1, 1, 2])
    oh = to_one_hot(labels, 3)
    r = np.asarray(relaxed_iou_fast(jnp.asarray(oh[None]), jnp.asarray(oh[None])))[0]
    np.testing.assert_allclose(np.diag(r), 1.0, atol=1e-5)
    assert (r - np.diag(np.diag(r))).max() < 1e-6


def test_hungarian_permutation():
    perm = np.array([2, 0, 1, 3])
    cost = 1.0 - np.eye(4)[:, perm]  # zero cost where perm[col] == row
    rows, cols = hungarian_match(cost)
    assert (cols[np.argsort(rows)] == np.argsort(perm)).all()


def test_primitive_type_per_segment():
    # 6 points: segment 0 mostly type 1, segment 1 mostly type 5
    prim = to_one_hot(np.array([1, 1, 3, 5, 5, 5]), 10)
    seg = to_one_hot(np.array([0, 0, 0, 1, 1, 1]), 2)
    t = primitive_type_per_segment(prim, seg)
    assert t.tolist() == [1, 5]


def _perfect_case(rng, n=600, k=3):
    gt = rng.randint(0, k, n)
    # pred = permuted gt ids
    perm = rng.permutation(k)
    pred = perm[gt]
    prim_gt = np.where(gt == 0, 1, np.where(gt == 1, 4, 5))
    prim_pred = prim_gt.copy()
    points = rng.randn(n, 3).astype(np.float32)
    return gt, pred, prim_pred, prim_gt, points


def test_siou_perfect_prediction(rng):
    gt, pred, prim_pred, prim_gt, points = _perfect_case(rng)
    w = to_one_hot(pred, 50)
    seg_iou, type_iou, matching, pairs, recall = siou_matched_segments(
        gt, pred, prim_pred, prim_gt, w)
    assert seg_iou == pytest.approx(1.0, abs=1e-6)
    assert type_iou == pytest.approx(1.0)
    assert recall == pytest.approx(1.0, abs=1e-6)

    seg_iou2, type_iou2, _, _, recall2 = siou_matched_segments_usecd(
        gt, pred, prim_pred, prim_gt, w, points)
    assert seg_iou2 == pytest.approx(1.0, abs=1e-6)
    assert recall2 == pytest.approx(1.0)


def test_siou_type_remap_equivalence(rng):
    """Types {0,6,7} all remap to 9 — predicting 6 where gt is 7 must count
    as correct (reference: segment_utils.py:156-164)."""
    n = 300
    gt = np.zeros(n, np.int64)
    gt[n // 2:] = 1
    pred = gt.copy()
    prim_gt = np.where(gt == 0, 7, 8)
    prim_pred = np.where(gt == 0, 6, 2)
    w = to_one_hot(pred, 50)
    _, type_iou, _, _, _ = siou_matched_segments(gt, pred, prim_pred, prim_gt, w)
    assert type_iou == pytest.approx(1.0)


def test_siou_small_segments_dropped_vs_kept(rng):
    n = 300
    gt = np.zeros(n, np.int64)
    gt[:50] = 1          # small gt segment (<100 points)
    pred = gt.copy()
    pred[:50] = 1
    prim = np.ones(n, np.int64)
    w = to_one_hot(pred, 50)
    points = rng.randn(n, 3).astype(np.float32)
    # plain variant drops the small segment from the average
    seg_iou, _, _, pairs, _ = siou_matched_segments(gt, pred, prim, prim, w)
    assert len(pairs) == 1
    # usecd keeps it
    _, _, _, pairs2, _ = siou_matched_segments_usecd(
        gt, pred, prim, prim, w, points)
    assert len(pairs2) == 2


def test_mean_iou_one_sample():
    gt = np.array([0, 0, 1, 1])
    pred = np.array([0, 1, 1, 1])
    v = mean_iou_one_sample(pred, gt, 2)
    assert v == pytest.approx((0.5 + 2 / 3) / 2, rel=1e-5)


def test_compute_type_miou_abc(rng):
    n = 200
    i_gt = rng.randint(0, 3, n)
    cluster = i_gt.copy()
    t_gt = np.where(i_gt == 0, 1, np.where(i_gt == 1, 4, 5)).astype(np.int64)
    scores = to_one_hot(t_gt, 10) * 5.0
    v = compute_type_miou_abc(scores, t_gt.copy(), cluster, i_gt)
    assert v == pytest.approx(1.0)


def test_masked_chamfer_pairs_matches_per_pair():
    """The batched padded chamfer must equal per-pair chamfer_distance
    (regression: per-pair dynamic shapes retraced every size signature)."""
    from sednet_tpu.metrics.segmentation import _masked_chamfer_pairs
    from sednet_tpu.ops.chamfer import chamfer_distance

    rng = np.random.default_rng(0)
    pairs = [(rng.standard_normal((17 + 9 * i, 3)).astype(np.float32),
              rng.standard_normal((23 + 5 * i, 3)).astype(np.float32))
             for i in range(5)]
    # skewed sizes spanning several pow2 buckets: one large pair must not
    # inflate (or corrupt) the small pairs, and results stay in input order
    pairs += [(rng.standard_normal((1000, 3)).astype(np.float32),
               rng.standard_normal((40, 3)).astype(np.float32)),
              (rng.standard_normal((3, 3)).astype(np.float32),
               rng.standard_normal((2100, 3)).astype(np.float32))]
    got = _masked_chamfer_pairs(pairs)
    for i, (a, b) in enumerate(pairs):
        ref = float(chamfer_distance(jnp.asarray(a[None]),
                                     jnp.asarray(b[None])))
        np.testing.assert_allclose(got[i], ref, rtol=1e-5, atol=1e-7)


def test_siou_usecd_batch_matches_per_shape(rng):
    """The batched (2-dispatch) metric path must be numerically identical
    to calling siou_matched_segments_usecd shape by shape."""
    from sednet_tpu.metrics import siou_matched_segments_usecd_batch

    shapes = []
    for i in range(4):
        n = 500
        k = 2 + i
        gt = rng.randint(0, k, n)
        pred = gt.copy()
        # corrupt a tenth of the labels so IoU < 1 and matching is nontrivial
        bad = rng.choice(n, n // 10, replace=False)
        pred[bad] = rng.randint(0, k, bad.shape[0])
        prim_gt = rng.randint(0, 10, n)
        prim_pred = prim_gt.copy()
        prim_pred[bad] = rng.randint(0, 10, bad.shape[0])
        points = rng.randn(n, 3).astype(np.float32)
        shapes.append((gt, pred, prim_pred, prim_gt, points))

    batched = siou_matched_segments_usecd_batch(
        [s[0] for s in shapes], [s[1] for s in shapes],
        [s[2] for s in shapes], [s[3] for s in shapes],
        [s[4] for s in shapes])

    for (gt, pred, prim_pred, prim_gt, points), got in zip(shapes, batched):
        w = to_one_hot(pred, int(pred.max()) + 1)
        want = siou_matched_segments_usecd(
            gt, pred, prim_pred, prim_gt, w, points)
        assert got[0] == pytest.approx(want[0], abs=1e-6)   # seg iou
        assert got[1] == pytest.approx(want[1], abs=1e-6)   # type iou
        assert got[4] == pytest.approx(want[4], abs=1e-6)   # recall
        assert got[3] == want[3]                            # prim pairs
