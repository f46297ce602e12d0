"""DGCNN backbone encoder.

TPU-native rebuild of the reference's DGCNNEncoderGn
(reference: src/SEDNet.py:19-98). Channels-last (B, N, C) layout — the
channel axis rides the 128-lane dimension; the 1x1 convolutions of the
reference become Dense layers whose matmuls hit the MXU directly; kNN is
the blocked streaming op from sednet_tpu.ops.knn instead of the reference's
per-batch-item NxN Python loop.

Parity notes (magic numbers from reference src/SEDNet.py:31-48):
  edge convs: 2*C_in->64 (GN 2), 128->64 (GN 2), 128->128 (GN 2),
  all bias-free + LeakyReLU(0.2), max over k neighbours;
  final 256->1024 1x1 conv (GN 8) + ReLU + global max.
Returns (global (B,1024), per-point features (B,N,256)).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from sednet_tpu.ops.graph import edge_conv_features
from sednet_tpu.ops.knn import knn_indices, knn_indices_points_normals


class EdgeConv(nn.Module):
    """One DGCNN edge convolution: kNN -> [x_j - x_i, x_i] -> 1x1 conv -> GN
    -> LeakyReLU -> max over neighbours. The 1x1 conv is factored through
    the neighbour gather (see ops.graph.edge_conv_features) — K x fewer
    matmul FLOPs, identical parameters and math."""

    out_channels: int
    groups: int
    k: int
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, x: jax.Array, idx: jax.Array) -> jax.Array:
        dense = nn.Dense(self.out_channels, use_bias=False, name="conv")
        f = edge_conv_features(x, idx, dense)  # (B, N, K, C_out)
        f = nn.GroupNorm(num_groups=self.groups, name="gn")(f)
        f = nn.leaky_relu(f, negative_slope=self.negative_slope)
        return jnp.max(f, axis=2)  # (B, N, C_out)


class DGCNNEncoder(nn.Module):
    """3 edge convs + 1x1 conv to 1024 + global max pooling.

    mode 0: x is (B, N, 3) xyz only.
    mode 5: x is (B, N, 6) xyz ++ normals; the first-layer kNN uses the
            position*(1 + W*normal) metric (reference: src/PointNet.py:90-137)
            but the edge features still cover all 6 channels.
    """

    mode: int = 5
    k: int = 64
    normal_metric_w: float = 1.0

    @nn.compact
    def __call__(self, x: jax.Array, idx1: jax.Array | None = None):
        """idx1: optional precomputed first-layer kNN indices (B, N, k).
        Uniform scalings and rotations of the input leave the first-layer
        neighbour ordering unchanged (both reference metrics scale every
        pairwise value by the same factor), so TTA votes reuse the base
        forward's graph instead of rebuilding it."""
        if idx1 is None:
            if self.mode == 5:
                idx1 = knn_indices_points_normals(
                    x, self.k, normal_metric_w=self.normal_metric_w
                )
            else:
                idx1 = knn_indices(x, self.k)
        x1 = EdgeConv(64, groups=2, k=self.k, name="conv1")(x, idx1)

        idx2 = knn_indices(x1, self.k)
        x2 = EdgeConv(64, groups=2, k=self.k, name="conv2")(x1, idx2)

        idx3 = knn_indices(x2, self.k)
        x3 = EdgeConv(128, groups=2, k=self.k, name="conv3")(x2, idx3)

        feats = jnp.concatenate([x1, x2, x3], axis=-1)  # (B, N, 256)
        h = nn.Dense(1024, name="mlp1")(feats)
        h = nn.GroupNorm(num_groups=8, name="gn_mlp1")(h)
        h = nn.relu(h)
        global_feat = jnp.max(h, axis=1)  # (B, 1024)
        return global_feat, feats
