"""Triplet embedding loss, fixed-shape and fully on-device.

TPU-native rebuild of the reference's EmbeddingLoss.triplet_loss
(reference: src/segment_loss.py:21-126), which round-trips labels to numpy
and loops over segments/pairs in Python. Here segment sampling is a masked
categorical draw and the random segment pairs are a fixed-size batch of
gathers, so the whole loss jits and vmaps.

Semantics preserved:
  * <=30 sampled points per GT segment, with replacement
    (segment_loss.py:66-74; with N=10000 the reference's
    min(N // n_segments + 1, 30) is always 30);
  * `num_pairs` random (seg_a, seg_b) draws, pairs with a == b skipped
    (segment_loss.py:95-99);
  * per-pair loss: relu(d_pos - d_neg + margin), diagonal removed, divided
    by (#violations + 1) detached (segment_loss.py:110-121);
  * normalized by valid pair count, then by #shapes with >1 segment
    (segment_loss.py:123-125).

Labels must be canonical: integers in [0, max_segments) (the data pipeline
remaps arbitrary h5 ids; see sednet_tpu.data).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp

NEG_INF = -1e30


@dataclass(frozen=True)
class TripletConfig:
    margin: float = 1.0
    max_segments: int = 50
    samples_per_segment: int = 30
    num_pairs: int = 25  # reference: max_segments(5)^2 iterations


@functools.partial(jax.jit, static_argnames=("cfg",))
def triplet_loss(
    key: jax.Array,
    embedding: jax.Array,   # (B, N, E)
    labels: jax.Array,      # (B, N) int32 in [0, cfg.max_segments)
    cfg: TripletConfig = TripletConfig(),
) -> jax.Array:
    B, N, E = embedding.shape
    S, M, P = cfg.max_segments, cfg.samples_per_segment, cfg.num_pairs
    emb = embedding / jnp.clip(
        jnp.linalg.norm(embedding, axis=-1, keepdims=True), min=1e-12)

    seg_ids = jnp.arange(S, dtype=labels.dtype)
    member = labels[:, None, :] == seg_ids[None, :, None]        # (B, S, N)
    present = member.any(-1)                                      # (B, S)

    k_samp, k_a, k_b = jax.random.split(key, 3)
    # uniform-with-replacement draw of M point indices per segment
    samp_logits = jnp.where(member[:, :, None, :], 0.0, NEG_INF)  # (B, S, 1, N)
    sample_idx = jax.random.categorical(
        k_samp, samp_logits, axis=-1, shape=(B, S, M))            # (B, S, M)
    samples = jnp.take_along_axis(
        emb[:, None], sample_idx[..., None], axis=2)              # (B, S, M, E)

    # random segment pairs, uniform over *present* segments
    pair_logits = jnp.where(present, 0.0, NEG_INF)[:, None, :]    # (B, 1, S)
    seg_a = jax.random.categorical(k_a, pair_logits, axis=-1, shape=(B, P))
    seg_b = jax.random.categorical(k_b, pair_logits, axis=-1, shape=(B, P))
    valid_pair = (seg_a != seg_b).astype(emb.dtype)               # (B, P)

    pred_a = jnp.take_along_axis(samples, seg_a[:, :, None, None], axis=1)
    pred_b = jnp.take_along_axis(samples, seg_b[:, :, None, None], axis=1)
    # (B, P, M, E) each

    def sqd(u, v):
        return jnp.sum((u[:, :, :, None, :] - v[:, :, None, :, :]) ** 2, -1)

    d_pos = sqd(pred_a, pred_a)                                   # (B, P, M, M)
    d_neg = sqd(pred_a, pred_b)
    constraint = jax.nn.relu(d_pos - d_neg + cfg.margin)
    pair_loss = constraint.sum((-1, -2)) - jnp.einsum("bpmm->bp", constraint)
    satisfied = (constraint > 0).sum((-1, -2)).astype(emb.dtype) + 1.0
    pair_loss = pair_loss / jax.lax.stop_gradient(satisfied) * valid_pair

    normalization = valid_pair.sum(-1)                            # (B,)
    shape_loss = pair_loss.sum(-1) / (normalization + 1e-8)
    shape_valid = (present.sum(-1) > 1).astype(emb.dtype)
    return (shape_loss * shape_valid).sum() / (shape_valid.sum() + 1e-8)
