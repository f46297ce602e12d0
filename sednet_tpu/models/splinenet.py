"""SplineNet: control-point grid prediction for open/closed B-spline patches.

TPU-native rebuild of the reference's DGCNNControlPoints (mode 0)
(reference: src/model.py:56-180): 4 edge convs (BatchNorm2d + LeakyReLU 0.2)
-> 1x1 conv to 1024 -> *weighted* global max pool (per-point membership
weights multiply the pooled features, src/model.py:165-169) -> two 1024 MLPs
(BatchNorm1d + ReLU) -> 3*grid^2 -> tanh -> (B, grid^2, 3) control grid.

BatchNorm is faithful to the reference (SplineNet is the one sub-network the
reference trains with BN, not GN); use `train=False` for inference with the
running statistics.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from sednet_tpu.ops.graph import edge_conv_features
from sednet_tpu.ops.knn import knn_indices


class _BNEdgeConv(nn.Module):
    out_channels: int
    k: int

    @nn.compact
    def __call__(self, x, train: bool):
        idx = knn_indices(x, self.k)
        dense = nn.Dense(self.out_channels, use_bias=False, name="conv")
        f = edge_conv_features(x, idx, dense)  # (B, N, K, C_out)
        f = nn.BatchNorm(use_running_average=not train, name="bn")(f)
        f = nn.leaky_relu(f, negative_slope=0.2)
        return jnp.max(f, axis=2)


class SplineNet(nn.Module):
    """Predicts a (grid x grid) control-point grid from a point patch."""

    grid_size: int = 20
    k: int = 10

    @nn.compact
    def __call__(self, x: jax.Array, weights: jax.Array | None = None,
                 train: bool = False) -> jax.Array:
        """x: (B, N, 3); weights: optional (B, N) per-point membership.

        Returns (B, grid^2, 3) control points in [-1, 1] (tanh).
        """
        x1 = _BNEdgeConv(64, self.k, name="conv1")(x, train)
        x2 = _BNEdgeConv(64, self.k, name="conv2")(x1, train)
        x3 = _BNEdgeConv(128, self.k, name="conv3")(x2, train)
        x4 = _BNEdgeConv(256, self.k, name="conv4")(x3, train)

        h = jnp.concatenate([x1, x2, x3, x4], axis=-1)  # (B, N, 512)
        h = nn.Dense(1024, use_bias=False, name="conv5")(h)
        h = nn.BatchNorm(use_running_average=not train, name="bn5")(h)
        h = nn.leaky_relu(h, negative_slope=0.2)

        if weights is not None:
            h = h * weights[..., None]
        g = jnp.max(h, axis=1)  # (B, 1024)

        g = nn.relu(nn.BatchNorm(use_running_average=not train, name="bn6")(
            nn.Dense(1024, name="conv6")(g)))
        g = nn.relu(nn.BatchNorm(use_running_average=not train, name="bn7")(
            nn.Dense(1024, name="conv7")(g)))
        g = jnp.tanh(nn.Dense(3 * self.grid_size ** 2, name="conv8")(g))
        return g.reshape(x.shape[0], self.grid_size ** 2, 3)
