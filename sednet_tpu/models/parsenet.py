"""Legacy ParseNet-style segmentation model.

Rebuild of the reference's PrimitivesEmbeddingDGCNGn
(reference: src/SEDNet.py:101-213; older copy src/PointNet.py:330-479).
Differences from SEDNet (models/sednet.py):
  * edge head hangs off x_all, not x_type (SEDNet.py:182-183);
  * early fusion adds asis(x_type) unweighted (no w_pos_enc, :199-200);
  * "late fusion" CONCATENATES softmax(type) (+ softmax(edge)) onto the
    embedding instead of adding a learned projection (:204-207), so the
    output embedding has emb_size (+num_primitives)(+2) channels.

The e2e variant (PrimitivesEmbeddingDGCNGne2e) computed the fitting loss
inside forward to appease DataParallel; here e2e training lives in
sednet_tpu.parsenet_e2e instead.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from sednet_tpu.models.backbone import DGCNNEncoder
from sednet_tpu.models.sednet import SEDNetOutput


class ParseNetEmbedding(nn.Module):
    emb_size: int = 128
    num_primitives: int = 6
    mode: int = 5
    k: int = 64
    normal_metric_w: float = 1.0
    edge_module: bool = True
    late_fusion: bool = True
    combine_label_prim: bool = True

    @nn.compact
    def __call__(self, points: jax.Array) -> SEDNetOutput:
        num_points = points.shape[1]
        global_feat, feats = DGCNNEncoder(
            mode=self.mode, k=self.k, normal_metric_w=self.normal_metric_w,
            name="encoder")(points)
        x = jnp.concatenate(
            [jnp.broadcast_to(global_feat[:, None, :],
                              (points.shape[0], num_points, 1024)), feats],
            axis=-1)
        x = nn.relu(nn.GroupNorm(num_groups=8, name="gn1")(
            nn.Dense(512, name="conv1")(x)))
        x_all = nn.relu(nn.GroupNorm(num_groups=4, name="gn2")(
            nn.Dense(256, name="conv2")(x)))

        edge_logits = None
        if self.edge_module:
            e = nn.Dense(128, name="edge_conv1")(x_all)
            e = nn.GroupNorm(num_groups=4, name="edge_gn")(e)
            edge_logits = nn.Dense(2, name="edge_conv2")(e)

        x_type = nn.relu(nn.GroupNorm(num_groups=4, name="gn_prim")(
            nn.Dense(256, name="mlp_prim_prob1")(x_all)))
        type_logits = nn.Dense(self.num_primitives, name="mlp_prim_prob2")(x_type)
        type_log_prob = jax.nn.log_softmax(type_logits, axis=-1)

        x = nn.relu(nn.GroupNorm(num_groups=4, name="gn_seg")(
            nn.Dense(256, name="mlp_seg_prob1")(x_all)))
        if self.combine_label_prim:
            asis = nn.relu(nn.GroupNorm(num_groups=4, name="asis_gn")(
                nn.Dense(256, name="asis_conv")(x_type)))
            x = asis + x
        embedding = nn.Dense(self.emb_size, name="mlp_seg_prob2")(x)
        if self.late_fusion:
            embedding = jnp.concatenate(
                [embedding, jax.nn.softmax(type_logits, axis=-1)], axis=-1)
            if self.edge_module:
                embedding = jnp.concatenate(
                    [embedding, jax.nn.softmax(edge_logits, axis=-1)],
                    axis=-1)

        return SEDNetOutput(embedding=embedding, type_log_prob=type_log_prob,
                            type_logits=type_logits, edge_logits=edge_logits,
                            normals_pred=None)
