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

from sednet_tpu.ops.flash_topk import pallas_topk_supported
from sednet_tpu.ops.graph import edge_conv_factored, edge_conv_features
from sednet_tpu.ops.knn import knn_indices, knn_indices_points_normals
from sednet_tpu.ops.dispatch import target_backend


class _GNParams(nn.Module):
    """Parameter holder matching nn.GroupNorm's tree ({scale, bias}) so the
    factored edge-conv path (ops.graph.edge_conv_factored) reads the SAME
    checkpoint slots the direct nn.GroupNorm path trains — the two paths
    are interchangeable on one parameter tree."""

    features: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return s, b


class EdgeConv(nn.Module):
    """One DGCNN edge convolution: kNN -> [x_j - x_i, x_i] -> 1x1 conv -> GN
    -> LeakyReLU -> max over neighbours. The 1x1 conv is factored through
    the neighbour gather (see ops.graph.edge_conv_features) — K x fewer
    matmul FLOPs, identical parameters and math."""

    out_channels: int
    groups: int
    k: int
    negative_slope: float = 0.2
    # compute dtype (params stay f32). bf16 halves the bandwidth of the
    # layer's real cost — the (B, N, K, C') gather + GN/max sweeps — and
    # runs the factored matmuls on the MXU's native input type; GroupNorm
    # statistics stay f32 (flax upcasts stats for sub-f32 dtypes)
    dtype: jnp.dtype = jnp.float32
    # factored GroupNorm: reconstruct the GN statistics from one
    # gather-pass of (sum, sum-of-squares, signed extremum) reductions so
    # the (B, N, K, C) tensor never exists (ops.graph.edge_conv_factored;
    # exact up to float reassociation, same parameter tree). f32 only —
    # under bf16 compute the direct path's rounding points diverge
    factored_gn: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, idx: jax.Array) -> jax.Array:
        dense = nn.Dense(self.out_channels, use_bias=False, name="conv",
                         dtype=self.dtype)
        if self.factored_gn and self.dtype == jnp.float32:
            scale, bias = _GNParams(self.out_channels, name="gn")()
            return edge_conv_factored(
                x, idx, dense, scale, bias, groups=self.groups,
                negative_slope=self.negative_slope)
        f = edge_conv_features(x.astype(self.dtype), idx, dense)
        f = nn.GroupNorm(num_groups=self.groups, name="gn",
                         dtype=self.dtype)(f)      # (B, N, K, C_out)
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
    # compute dtype for the conv/GN stack (opt-in mixed precision,
    # config.model_bf16). kNN graph builds always run on f32 values —
    # neighbour selection is a discrete decision we keep independent of
    # the compute dtype (ties flip under quantization)
    dtype: jnp.dtype = jnp.float32
    # None = auto (on when the fused TPU kernel serves the kNN builds);
    # tests force True on CPU to pin the permutation-equivariance of the
    # sorted-order path against the unsorted one
    sort_points: bool | None = None
    # see EdgeConv.factored_gn
    factored_gn: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, idx1: jax.Array | None = None):
        """idx1: optional precomputed first-layer kNN indices (B, N, k).
        Uniform scalings and rotations of the input leave the first-layer
        neighbour ordering unchanged (both reference metrics scale every
        pairwise value by the same factor), so TTA votes reuse the base
        forward's graph instead of rebuilding it.

        On TPU the whole encoder runs in xyz-Morton-sorted point order:
        every layer of the network is permutation-equivariant (per-point
        matmuls, GroupNorm stats over all points, neighbour max, global
        max), so ONE permutation at entry + ONE inverse gather of the
        (B, N, 256) output replaces the sort/unsort glue that each of the
        three fused kNN builds would otherwise pay internally (PCA of the
        feature map + argsort + 3 gathers per call — measured ~40% of the
        per-call cost), and the two feature-space builds inherit the
        GEOMETRIC locality order, which prunes their distance tiles better
        than feature-PCA does (features are smooth over the surface)."""
        use_sort = self.sort_points
        if use_sort is None:
            use_sort = (target_backend() == "tpu"
                        and pallas_topk_supported(x.shape[1], x.shape[2],
                                                  self.k))
        if use_sort:
            from sednet_tpu.ops.flash_topk import _locality_order

            perm = jax.vmap(_locality_order)(x[..., :3])        # (B, N)
            inv = jnp.argsort(perm, axis=1)
            x = jnp.take_along_axis(x, perm[..., None], axis=1)
            if idx1 is not None:
                # re-express a caller-supplied graph (original point ids)
                # in sorted space: new[b,i,j] = inv[b, old[b, perm[b,i], j]]
                b, n, kk = idx1.shape
                rows = jnp.take_along_axis(idx1, perm[..., None], axis=1)
                idx1 = jnp.take_along_axis(
                    inv, rows.reshape(b, n * kk), axis=1).reshape(b, n, kk)
        sort_kw = dict(spatial_sort=False) if use_sort else {}
        if idx1 is None:
            if self.mode == 5:
                idx1 = knn_indices_points_normals(
                    x, self.k, normal_metric_w=self.normal_metric_w,
                    **sort_kw)
            else:
                idx1 = knn_indices(x, self.k, **sort_kw)
        x1 = EdgeConv(64, groups=2, k=self.k, dtype=self.dtype,
                      factored_gn=self.factored_gn, name="conv1")(x, idx1)

        idx2 = knn_indices(x1.astype(jnp.float32), self.k, **sort_kw)
        x2 = EdgeConv(64, groups=2, k=self.k, dtype=self.dtype,
                      factored_gn=self.factored_gn, name="conv2")(x1, idx2)

        idx3 = knn_indices(x2.astype(jnp.float32), self.k, **sort_kw)
        x3 = EdgeConv(128, groups=2, k=self.k, dtype=self.dtype,
                      factored_gn=self.factored_gn, name="conv3")(x2, idx3)

        feats = jnp.concatenate([x1, x2, x3], axis=-1)  # (B, N, 256)
        h = nn.Dense(1024, name="mlp1", dtype=self.dtype)(feats)
        h = nn.GroupNorm(num_groups=8, name="gn_mlp1", dtype=self.dtype)(h)
        h = nn.relu(h)
        global_feat = jnp.max(h, axis=1)  # (B, 1024) — order-invariant
        if use_sort:
            feats = jnp.take_along_axis(feats, inv[..., None], axis=1)
        return global_feat, feats
