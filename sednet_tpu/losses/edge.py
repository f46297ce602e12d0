"""Edge-classification and HPNet-style pull/push embedding losses.

TPU-native rebuild of reference src/My_edge_loss.py, with the per-batch /
per-class Python loops replaced by masked fixed-shape reductions.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def edge_cls_loss(edge_logits: jax.Array, edge_labels: jax.Array,
                  edge_weights: jax.Array) -> jax.Array:
    """Weighted per-point cross-entropy; shapes whose weights sum to zero are
    dropped (reference: src/My_edge_loss.py:14-25).

    edge_logits: (B, N, 2) raw logits; edge_labels: (B, N) in {0,1};
    edge_weights: (B, N) per-point BCE weight.
    """
    logp = jax.nn.log_softmax(edge_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, edge_labels[..., None].astype(jnp.int32),
                               axis=-1)[..., 0]                   # (B, N)
    per_shape = jnp.mean(nll * edge_weights, axis=-1)              # (B,)
    nonzero = edge_weights.sum(-1) != 0
    per_shape = jnp.where(nonzero, per_shape, 0.0)
    return jnp.mean(per_shape)


@functools.partial(jax.jit, static_argnames=("max_segments",))
def pull_push_embedding_loss(
    pred_feat: jax.Array,   # (B, N, E)
    gt_label: jax.Array,    # (B, N) int; -1 allowed as a noise class
    t_pull: float = 0.5,
    t_push: float = 1.5,
    max_segments: int = 51,
):
    """HPNet pull/push loss (reference: src/My_edge_loss.py:29-84).

    pull: mean over classes of mean_i relu(||f_i - center_c|| - t_pull)
    push: mean over present class pairs of relu(t_push - ||c_a - c_b||)
    Returns (loss, pull, push).
    """
    B, N, E = pred_feat.shape
    S = max_segments
    cls = gt_label.astype(jnp.int32) + 1  # -1 noise -> class 0
    member = cls[:, None, :] == jnp.arange(S, dtype=jnp.int32)[None, :, None]
    memberf = member.astype(pred_feat.dtype)                      # (B, S, N)
    count = memberf.sum(-1)                                       # (B, S)
    present = count > 0
    centers = jnp.einsum("bsn,bne->bse", memberf, pred_feat) / jnp.clip(
        count[..., None], min=1.0)                                # (B, S, E)

    # pull: distance of each point to its own class center
    own_center = jnp.take_along_axis(centers, cls[..., None], axis=1)  # (B,N,E)
    d = jnp.linalg.norm(pred_feat - own_center, axis=-1)          # (B, N)
    viol = jax.nn.relu(d - t_pull)
    per_class = jnp.einsum("bsn,bn->bs", memberf, viol) / jnp.clip(
        count, min=1.0)                                           # (B, S)
    n_present = present.sum(-1).astype(pred_feat.dtype)           # (B,)
    pull = (per_class * present).sum(-1) / jnp.clip(n_present, min=1.0)

    # push: pairwise center distances among present classes
    diff = centers[:, :, None, :] - centers[:, None, :, :]
    dist = jnp.sqrt(jnp.clip(jnp.sum(diff * diff, -1), min=1e-12))
    pair_mask = (present[:, :, None] & present[:, None, :]
                 & ~jnp.eye(S, dtype=bool)[None])
    viol = jax.nn.relu(t_push - dist) * pair_mask
    n_pairs = pair_mask.sum((-1, -2)).astype(pred_feat.dtype)
    push = jnp.where(n_pairs > 0, viol.sum((-1, -2)) / jnp.clip(n_pairs, min=1.0), 0.0)
    # reference skips push for single-class shapes (My_edge_loss.py:68-69)

    pull_loss = pull.mean()
    push_loss = push.mean()
    return pull_loss + push_loss, pull_loss, push_loss


@functools.partial(jax.jit, static_argnames=("edges_num", "use_type", "max_segments"))
def edge_embedding_loss(
    edge_logits: jax.Array,     # (B, N, 2)
    pred_feat: jax.Array,       # (B, N, E)
    gt_label: jax.Array,        # (B, N) instance labels
    edges_num: int = 2000,
    use_type: bool = False,
    primitives: jax.Array | None = None,        # (B, N) type labels
    type_log_prob: jax.Array | None = None,     # (B, N, C)
    max_segments: int = 51,
) -> jax.Array:
    """Pull/push on the `edges_num` most-edge-like points (+ optional type NLL
    on the same subset). Reference: src/My_edge_loss.py:89-105."""
    _, top_idx = jax.lax.top_k(edge_logits[:, :, 1], edges_num)   # (B, K)
    feat = jnp.take_along_axis(pred_feat, top_idx[..., None], axis=1)
    label = jnp.take_along_axis(gt_label, top_idx, axis=1)
    loss = pull_push_embedding_loss(feat, label, max_segments=max_segments)[0]
    if not use_type:
        return loss
    lp = jnp.take_along_axis(type_log_prob, top_idx[..., None], axis=1)
    prim = jnp.take_along_axis(primitives, top_idx, axis=1)
    nll = -jnp.take_along_axis(lp, prim[..., None].astype(jnp.int32), axis=-1)
    return jnp.mean(nll) + loss
