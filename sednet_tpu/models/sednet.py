"""SEDNet: type / edge / instance-embedding heads over the DGCNN encoder.

TPU-native rebuild of the reference's SEDNet module
(reference: src/SEDNet.py:216-343). Differences from the reference that are
deliberate design, not behavior changes:
  * channels-last (B, N, C); 1x1 convs are Dense layers (MXU matmuls);
  * the embedding loss is computed outside the model (the reference computes
    it inside forward only to appease torch DataParallel, SEDNet.py:332-335);
  * outputs are a named struct instead of a mode-dependent list.

Head wiring parity (reference line numbers):
  trunk: concat(tile(global), feats) 1280 -> 512 (GN 8) -> 256 (GN 4) = x_all
         (SEDNet.py:300-304)
  type:  x_all -> 256 (GN 4, ReLU) = x_type -> num_primitives logits,
         log-softmax (SEDNet.py:311-314)
  edge:  x_type -> 128 (GN 4, NO activation) -> 2 logits (SEDNet.py:247-253,316-317)
  embed: x_all -> 256 (GN 4, ReLU); early fusion += w * asis(x_type) where
         asis = 256->256 (GN 4, ReLU) (SEDNet.py:255-261,320-322); late fusion
         += w * relu(Dense(8->256)(concat(stop_grad(type_logit),
         stop_grad(edge_logit)))) (SEDNet.py:287-290,324-326); -> emb_size
  normal (optional): x_all -> 128 (GN 4, NO activation) -> 3, L2-normalized
         (SEDNet.py:276-282,306-307)
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from sednet_tpu.models.backbone import DGCNNEncoder
from sednet_tpu.ops.dispatch import target_backend


@flax.struct.dataclass
class SEDNetOutput:
    embedding: jax.Array            # (B, N, emb_size)
    type_log_prob: jax.Array        # (B, N, num_primitives) log-softmax
    type_logits: jax.Array          # (B, N, num_primitives)
    edge_logits: Optional[jax.Array] = None   # (B, N, 2)
    normals_pred: Optional[jax.Array] = None  # (B, N, 3) unit


class SEDNet(nn.Module):
    emb_size: int = 128
    num_primitives: int = 6
    mode: int = 5                 # 0: xyz, 5: xyz+normals
    k: int = 64
    normal_metric_w: float = 1.0
    w_pos_enc: float = 0.2
    edge_module: bool = True
    late_fusion: bool = True
    combine_label_prim: bool = True
    predict_normal: bool = False
    # compute dtype (config.model_bf16): bf16 activations through the
    # encoder and head stacks with f32 params, f32 GroupNorm statistics
    # and f32 outputs — the standard TPU mixed-precision recipe. The
    # reference has no equivalent (f32 CUDA throughout)
    dtype: jnp.dtype = jnp.float32
    # reconstruct edge-conv GroupNorm stats from one gather pass instead
    # of materializing (B, N, K, C) (see models.backbone.EdgeConv)
    factored_gn: bool = False

    @nn.compact
    def __call__(self, points: jax.Array,
                 idx1: jax.Array | None = None,
                 encoder_out: tuple[jax.Array, jax.Array] | None = None,
                 ) -> SEDNetOutput:
        """points: (B, N, 3) or (B, N, 6) channels-last; idx1 optionally
        reuses a precomputed first-layer kNN graph (see DGCNNEncoder);
        encoder_out optionally injects precomputed (global_feat, feats) —
        the index-free fused inference encoder
        (ops.fused_edgeconv.encoder_apply_fused) enters here via
        apply_fused below."""
        num_points = points.shape[1]
        if encoder_out is not None:
            global_feat, feats = encoder_out
        else:
            global_feat, feats = DGCNNEncoder(
                mode=self.mode, k=self.k,
                normal_metric_w=self.normal_metric_w, dtype=self.dtype,
                factored_gn=self.factored_gn, name="encoder",
            )(points, idx1)

        dt = self.dtype
        x = jnp.concatenate(
            [jnp.broadcast_to(global_feat[:, None, :].astype(dt),
                              (points.shape[0], num_points, 1024)),
             feats.astype(dt)],
            axis=-1,
        )  # (B, N, 1280)
        x = nn.relu(nn.GroupNorm(num_groups=8, name="gn1", dtype=dt)(
            nn.Dense(512, name="conv1", dtype=dt)(x)))
        x_all = nn.relu(nn.GroupNorm(num_groups=4, name="gn2", dtype=dt)(
            nn.Dense(256, name="conv2", dtype=dt)(x)))

        # type head. Logits and log-probs leave the model in f32: the
        # loss/metric stack and log_softmax run full precision
        x_type = nn.relu(nn.GroupNorm(num_groups=4, name="gn_prim", dtype=dt)(
            nn.Dense(256, name="mlp_prim_prob1", dtype=dt)(x_all)))
        type_logits = nn.Dense(self.num_primitives,
                               name="mlp_prim_prob2")(x_type.astype(
                                   jnp.float32))
        type_log_prob = jax.nn.log_softmax(type_logits, axis=-1)

        # edge head (conv -> GN -> conv, no activation in between:
        # reference SEDNet.py:249-253 Sequential)
        edge_logits = None
        if self.edge_module:
            e = nn.Dense(128, name="edge_conv1", dtype=dt)(x_type)
            e = nn.GroupNorm(num_groups=4, name="edge_gn", dtype=dt)(e)
            edge_logits = nn.Dense(2, name="edge_conv2")(e.astype(
                jnp.float32))

        # embedding head
        x = nn.relu(nn.GroupNorm(num_groups=4, name="gn_seg", dtype=dt)(
            nn.Dense(256, name="mlp_seg_prob1", dtype=dt)(x_all)))
        if self.combine_label_prim:
            asis = nn.relu(nn.GroupNorm(num_groups=4, name="asis_gn",
                                        dtype=dt)(
                nn.Dense(256, name="asis_conv", dtype=dt)(x_type)))
            x = self.w_pos_enc * asis + x
        if self.late_fusion:
            fuse_in = jax.lax.stop_gradient(type_logits)
            if self.edge_module:
                fuse_in = jnp.concatenate(
                    [fuse_in, jax.lax.stop_gradient(edge_logits)], axis=-1)
            fuse = nn.relu(nn.Dense(256, name="prim_encoding",
                                    dtype=dt)(fuse_in.astype(dt)))
            x = x + self.w_pos_enc * fuse
        embedding = nn.Dense(self.emb_size,
                             name="mlp_seg_prob2")(x.astype(jnp.float32))

        normals_pred = None
        if self.predict_normal:
            nr = nn.Dense(128, name="normal_conv1", dtype=dt)(x_all)
            nr = nn.GroupNorm(num_groups=4, name="normal_gn", dtype=dt)(nr)
            nr = nn.Dense(3, name="normal_conv2")(nr.astype(jnp.float32))
            normals_pred = nr / jnp.clip(
                jnp.linalg.norm(nr, axis=-1, keepdims=True), min=1e-12)

        return SEDNetOutput(
            embedding=embedding,
            type_log_prob=type_log_prob,
            type_logits=type_logits,
            edge_logits=edge_logits,
            normals_pred=normals_pred,
        )


def apply_fused(model: SEDNet, variables, points: jax.Array, *,
                interpret: bool | None = None) -> SEDNetOutput:
    """Inference forward through the index-free fused encoder.

    Runs ops.fused_edgeconv.encoder_apply_fused (no kNN index
    materialization, no (B, N, K, C) gather) on the SAME trained parameter
    tree, then the flax heads. Inference-only: the encoder output carries
    no gradients. Matches model.apply(variables, points) to float
    tolerance (ties at the k-th neighbour distance aside)."""
    from sednet_tpu.ops.fused_edgeconv import encoder_apply_fused

    if interpret is None:
        interpret = target_backend() != "tpu"
    enc = encoder_apply_fused(
        variables["params"]["encoder"], points, mode=model.mode, k=model.k,
        normal_metric_w=model.normal_metric_w, interpret=interpret)
    return model.apply(variables, points, encoder_out=enc)
