"""Hungarian-matched segmentation / type metrics.

Rebuild of reference src/segment_utils.py. The soft-IoU cost matrix is an
XLA matmul (relaxed_iou_fast, reference :609-627); the Hungarian solve runs
on host via scipy.linear_sum_assignment over the <=50x50 cost (the reference
uses lapsolver.solve_dense, :173-176) — this is the designed device/host cut:
everything upstream is batched device math, the assignment is O(50^3) host
work per shape.

Type remap semantics ({0,6,7}->9, 8->2) follow reference :156-164. These
functions MUTATE nothing — unlike the reference, which remaps its input
arrays in place.
"""
from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

from sednet_tpu.ops.chamfer import chamfer_distance


def to_one_hot(target: np.ndarray, maxx: int = 50) -> np.ndarray:
    """(N,) int -> (N, maxx) one-hot (reference: src/segment_utils.py:536-545)."""
    n = target.shape[0]
    out = np.zeros((n, maxx), np.float32)
    out[np.arange(n), target.astype(np.int64)] = 1.0
    return out


def relaxed_iou_fast(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Soft IoU between one-hot segmentations.

    pred: (B, N, K), gt: (B, N, K') -> (B, K, K')
    (reference: src/segment_utils.py:609-627)."""
    dots = jnp.einsum("bnk,bnl->bkl", pred, gt)
    norms_p = pred.sum(1)[:, :, None]
    norms_g = gt.sum(1)[:, None, :]
    return dots / (norms_p + norms_g - dots + 1e-7)


@jax.jit
def _relaxed_cost_from_labels(preds: jnp.ndarray,
                              targets: jnp.ndarray) -> jnp.ndarray:
    """(B, N) int32 pred + GT labels -> (B, 50, 50) 1 - relaxed-IoU cost,
    with the one-hots built ON DEVICE. The host-built (B, N, 50) f32
    one-hots are 32 MB per batch-8 at N=10k — measured ~176 ms of the
    reference-default eval's metric stage was just pushing them through
    the device relay; the int labels are 100x smaller. Same math as
    relaxed_iou_fast over to_one_hot (labels >= 50 simply contribute no
    membership instead of raising, as the guard caps clusters below 50)."""
    k = jnp.arange(50, dtype=jnp.int32)
    ph = (preds[..., None] == k).astype(jnp.float32)
    gh = (targets[..., None] == k).astype(jnp.float32)
    return 1.0 - relaxed_iou_fast(ph, gh)


def _prim_type_per_segment_np(pred_labels: np.ndarray,
                              prims_pred: np.ndarray,
                              n_seg: int = 50, n_type: int = 10) -> np.ndarray:
    """primitive_type_per_segment without materializing the (N, 50) and
    (N, 10) one-hots: counts[k, t] = |{i: label_i == k and prim_i == t}|,
    argmax over t with the same first-index tie rule as the one-hot
    matmul's argmax(0) over (T, K)."""
    counts = np.bincount(
        pred_labels.astype(np.int64) * n_type + prims_pred.astype(np.int64),
        minlength=n_seg * n_type).reshape(n_seg, n_type)
    return counts.argmax(1)


def hungarian_match(cost: np.ndarray):
    """rows, cols minimizing total cost (reference uses lapsolver.solve_dense,
    src/segment_utils.py:173-176)."""
    rids, cids = linear_sum_assignment(cost)
    return rids, cids


def primitive_type_per_segment(prim_one_hot: np.ndarray,
                               weights: np.ndarray) -> np.ndarray:
    """Majority primitive type per predicted segment.

    prim_one_hot: (N, T) per-point type one-hot; weights: (N, K) segment
    membership -> (K,) type id (reference: src/segment_utils.py:509-517)."""
    d = (prim_one_hot[:, :, None] * weights[:, None, :]).sum(0)  # (T, K)
    return d.argmax(0)


def _remap_eval(t: np.ndarray) -> np.ndarray:
    out = t.copy()
    out[(out == 0) | (out == 6) | (out == 7)] = 9
    out[out == 8] = 2
    return out


def _collect_matched(target, pred_labels, prim_pred_per_seg, primitives,
                     cost, points=None, min_gt_points=100,
                     use_chamfer=False):
    """Hungarian + matched-pair loop given a precomputed cost matrix.
    Returns everything EXCEPT the chamfer verdicts — cd_pairs are handed
    back so callers can batch the chamfer across shapes (one device
    dispatch per batch instead of one per shape; each dispatch pays a
    full relay round-trip on the remote TPU)."""
    rows, cols = hungarian_match(cost)

    iou_b, prim_ok, prim_pairs = [], [], []
    recall_b = []
    cd_pairs = []  # (pred point set, gt point set) for ONE batched chamfer
    for r, c in zip(rows, cols):
        pred_i = pred_labels == r
        gt_i = target == c
        if gt_i.sum() == 0 or pred_i.sum() == 0:
            continue
        if not use_chamfer and gt_i.sum() < min_gt_points:
            continue
        tp = np.logical_and(pred_i, gt_i).sum()
        iou = tp / (np.logical_or(pred_i, gt_i).sum() + 1e-8)
        iou_b.append(iou)
        if use_chamfer:
            cd_pairs.append((points[pred_i], points[gt_i]))
        else:
            fn = np.logical_and(~pred_i, gt_i).sum()
            recall_b.append(tp / (tp + fn + 1e-8))
        gt_type = primitives[gt_i][0]
        pred_type = prim_pred_per_seg[r]
        prim_ok.append(gt_type == pred_type)
        prim_pairs.append([gt_type, pred_type])

    seg_iou = float(np.mean(iou_b)) if iou_b else float("nan")
    prim_iou = float(np.mean(prim_ok)) if prim_ok else float("nan")
    recall = float(np.mean(recall_b)) if recall_b else float("nan")
    return seg_iou, prim_iou, (rows, cols), prim_pairs, recall, cd_pairs


def _matched_iou_core(target, pred_labels, prim_pred_per_seg, primitives,
                      points=None, min_gt_points=100, use_chamfer=False):
    """Shared loop of mean_IOU_primitive_segment[_usecd]
    (reference: src/segment_utils.py:359-419 and :424-494)."""
    cost = np.asarray(_relaxed_cost_from_labels(
        jnp.asarray(np.asarray(pred_labels).astype(np.int32)[None]),
        jnp.asarray(np.asarray(target).astype(np.int32)[None])))[0]
    seg_iou, prim_iou, matching, prim_pairs, recall, cd_pairs = \
        _collect_matched(target, pred_labels, prim_pred_per_seg, primitives,
                         cost, points=points, min_gt_points=min_gt_points,
                         use_chamfer=use_chamfer)
    if use_chamfer:
        recall_pos = 0
        if cd_pairs:
            # one padded masked call for every matched pair: per-pair
            # dynamic shapes retraced the blocked-NN program for nearly
            # every (|pred|, |gt|) signature on a real test set
            cds = _masked_chamfer_pairs(cd_pairs) / 2.0
            recall_pos = int((cds < 0.1).sum())
        recall = recall_pos / np.unique(target).shape[0]
    return seg_iou, prim_iou, matching, prim_pairs, recall


def _pow2(n: int, lo: int = 64) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


def _masked_chamfer_pairs(pairs) -> np.ndarray:
    """Symmetric chamfer for a list of (a (Na,3), b (Nb,3)) pairs, padded
    into per-size pow2 buckets (a handful of compile signatures ever).
    Bucketing by each pair's OWN pow2 sizes — not the global max — keeps
    one large segment from inflating every small pair's quadratic cost;
    all bucket dispatches go out before the single host sync so they
    pipeline on the device. Padding uses far-away sentinels so pads never
    win an argmin, and the per-direction means are mask-weighted —
    identical to ops.chamfer.chamfer_distance pair by pair."""
    s = len(pairs)
    groups: dict = {}
    for i, (x, y) in enumerate(pairs):
        groups.setdefault((_pow2(x.shape[0]), _pow2(y.shape[0])),
                          []).append(i)
    pending = []
    for (pa, pb), idxs in groups.items():
        sp = _pow2(len(idxs), lo=8)
        a = np.zeros((sp, pa, 3), np.float32)
        ma = np.zeros((sp, pa), np.float32)
        b = np.zeros((sp, pb, 3), np.float32)
        mb = np.zeros((sp, pb), np.float32)
        for j, i in enumerate(idxs):
            x, y = pairs[i]
            a[j, : x.shape[0]] = x
            ma[j, : x.shape[0]] = 1.0
            b[j, : y.shape[0]] = y
            mb[j, : y.shape[0]] = 1.0
        pending.append((idxs, _masked_chamfer_jit(
            jnp.asarray(a), jnp.asarray(ma), jnp.asarray(b),
            jnp.asarray(mb))))
    out = np.zeros((s,), np.float32)
    for idxs, r in pending:  # host syncs only after every dispatch is out
        out[np.asarray(idxs)] = np.asarray(r)[: len(idxs)]
    return out


@jax.jit
def _masked_chamfer_jit(a, ma, b, mb):
    from sednet_tpu.ops.chamfer import nn_distance

    fa = a + (1.0 - ma[..., None]) * 1e6
    fb = b + (1.0 - mb[..., None]) * 1e6
    d1, d2, _, _ = nn_distance(fa, fb)
    m1 = jnp.sum(d1 * ma, axis=1) / jnp.clip(jnp.sum(ma, axis=1), min=1e-8)
    m2 = jnp.sum(d2 * mb, axis=1) / jnp.clip(jnp.sum(mb, axis=1), min=1e-8)
    return 0.5 * (m1 + m2)


def siou_matched_segments(target, pred_labels, primitives_pred, primitives,
                          weights):
    """Reference SIOU_matched_segments (src/segment_utils.py:140-188).

    target/pred_labels: (N,) instance ids; primitives_pred/primitives: (N,)
    type labels (pre-remap); weights: (N, K) predicted-cluster one-hot.
    Returns (seg_iou, type_iou, matching, prim_pairs, seg_recall)."""
    primitives = _remap_eval(np.asarray(primitives))
    primitives_pred = _remap_eval(np.asarray(primitives_pred))
    prim_hot = to_one_hot(primitives_pred, 10)
    prim_per_seg = primitive_type_per_segment(prim_hot, np.asarray(weights))
    seg_iou, prim_iou, matching, pairs, recall = _matched_iou_core(
        np.asarray(target), np.asarray(pred_labels), prim_per_seg, primitives)
    return seg_iou, prim_iou, matching, pairs, recall


def siou_matched_segments_usecd(target, pred_labels, primitives_pred,
                                primitives, weights, points):
    """Chamfer-recall variant, keeps small segments
    (reference: src/segment_utils.py:194-242)."""
    primitives = _remap_eval(np.asarray(primitives))
    primitives_pred = _remap_eval(np.asarray(primitives_pred))
    prim_hot = to_one_hot(primitives_pred, 10)
    prim_per_seg = primitive_type_per_segment(prim_hot, np.asarray(weights))
    seg_iou, prim_iou, matching, pairs, recall = _matched_iou_core(
        np.asarray(target), np.asarray(pred_labels), prim_per_seg, primitives,
        points=np.asarray(points), use_chamfer=True)
    return seg_iou, prim_iou, matching, pairs, recall


def siou_matched_segments_usecd_batch(targets, pred_labels, primitives_pred,
                                      primitives, points, cost_all=None):
    """siou_matched_segments_usecd for a BATCH of shapes with exactly two
    device dispatches total: one (B, 50, 50) relaxed-IoU cost matrix and
    one padded masked chamfer over every matched pair of every shape.
    The per-shape form pays 2+ remote-TPU round-trips per shape; on a
    relay-attached chip that was the single largest stage of the
    reference-default eval path (~150 ms/shape measured round 3).

    targets/pred_labels/primitives_pred/primitives: (B, N) int arrays;
    points: (B, N, 3). Returns a list of (seg_iou, type_iou, matching,
    prim_pairs, recall) tuples, numerically identical to calling
    siou_matched_segments_usecd per shape.

    cost_all: optional precomputed (B, 50, 50) _relaxed_cost_from_labels
    result for these exact labels — lets a pipelined caller enqueue the
    device dispatch ahead of time (predict_shapes_async) instead of
    queueing it behind the NEXT batch's device programs."""
    bsz = len(targets)
    p_arr = np.stack([np.asarray(p).astype(np.int32) for p in pred_labels])
    if cost_all is None:
        t_arr = np.stack([np.asarray(t).astype(np.int32) for t in targets])
        cost_all = np.asarray(_relaxed_cost_from_labels(
            jnp.asarray(p_arr), jnp.asarray(t_arr)))
    else:
        cost_all = np.asarray(cost_all)

    partial = []
    all_pairs = []
    spans = []  # (start, count) into all_pairs per shape
    for i in range(bsz):
        prims = _remap_eval(np.asarray(primitives[i]))
        prims_pred = _remap_eval(np.asarray(primitives_pred[i]))
        # per-segment majority over the predicted clusters (bincount form
        # of primitive_type_per_segment over 50-col one-hots: extra
        # all-zero columns add zero votes and unmatched rows are skipped)
        prim_per_seg = _prim_type_per_segment_np(p_arr[i], prims_pred)
        seg_iou, prim_iou, matching, prim_pairs, _, cd_pairs = \
            _collect_matched(np.asarray(targets[i]),
                             np.asarray(pred_labels[i]), prim_per_seg,
                             prims, cost_all[i],
                             points=np.asarray(points[i]), use_chamfer=True)
        spans.append((len(all_pairs), len(cd_pairs)))
        all_pairs.extend(cd_pairs)
        partial.append((seg_iou, prim_iou, matching, prim_pairs))

    cds = (_masked_chamfer_pairs(all_pairs) / 2.0 if all_pairs
           else np.zeros((0,), np.float32))
    out = []
    for i, (seg_iou, prim_iou, matching, prim_pairs) in enumerate(partial):
        s0, cnt = spans[i]
        recall_pos = int((cds[s0:s0 + cnt] < 0.1).sum())
        recall = recall_pos / np.unique(np.asarray(targets[i])).shape[0]
        out.append((seg_iou, prim_iou, matching, prim_pairs, recall))
    return out


def mean_iou_one_sample(pred: np.ndarray, gt: np.ndarray, c: int) -> float:
    """Per-class IoU average (reference: src/segment_utils.py:124-137)."""
    eps = np.finfo(np.float32).eps
    iou = 0.0
    for k in range(c):
        gi, pi = gt == k, pred == k
        iou += (np.logical_and(gi, pi).sum() + eps) / (
            np.logical_or(gi, pi).sum() + eps)
    return iou / c


def _mode(a: np.ndarray):
    vals, counts = np.unique(a, return_counts=True)
    return vals[np.argmax(counts)]


def compute_type_miou_abc(type_per_point: np.ndarray, t_gt: np.ndarray,
                          cluster_pred: np.ndarray, i_gt: np.ndarray) -> float:
    """HPNet-style per-instance type accuracy
    (reference: src/segment_utils.py:300-355).

    type_per_point: (N, C) scores or (N,) ids; t_gt, cluster_pred, i_gt: (N,)."""
    t_pred = (type_per_point.argmax(-1) if type_per_point.ndim == 2
              else type_per_point).copy()
    t_pred[(t_pred == 6) | (t_pred == 7) | (t_pred == 9)] = 0
    t_pred[t_pred == 8] = 2
    t_gt = t_gt.copy()
    t_gt[(t_gt == 6) | (t_gt == 7) | (t_gt == 9)] = 0
    t_gt[t_gt == 8] = 2

    pred_hot = to_one_hot(cluster_pred, int(cluster_pred.max()) + 1)
    if i_gt.min() == -1:
        gt_hot = to_one_hot(i_gt + 1, int(i_gt.max()) + 2)[:, 1:]
    else:
        gt_hot = to_one_hot(i_gt, int(i_gt.max()) + 1)
    cost = 1.0 - np.asarray(relaxed_iou_fast(
        jnp.asarray(pred_hot[None]), jnp.asarray(gt_hot[None])))[0]
    rows, cols = hungarian_match(cost)

    ok, cnt = 0, 0
    for p_ind, g_ind in zip(rows, cols):
        gt_sel = t_gt[i_gt == g_ind]
        pr_sel = t_pred[cluster_pred == p_ind]
        if gt_sel.size == 0 or pr_sel.size == 0:
            continue
        ok += int(_mode(gt_sel) == _mode(pr_sel))
        cnt += 1
    return ok / max(cnt, 1)
