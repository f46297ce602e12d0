"""Numerical parity of the SEDNet forward against a torch replica.

Builds the reference architecture (per its spec: src/SEDNet.py:216-343,
src/PointNet.py:62-171) in torch, transplants our flax weights into it, and
compares all outputs on the same input. This pins down every wiring choice:
knn metric, edge features, GroupNorm groups, fusion weights, head order.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from sednet_tpu.models import SEDNet

B, N, K, C6, EMB = 2, 64, 8, 6, 16


def torch_knn(x, k):
    # x: (B, C, N) -> (B, N, k) plain sq-euclid knn (src/PointNet.py:62-87)
    inner = -2 * torch.matmul(x.transpose(2, 1), x)
    xx = torch.sum(x ** 2, dim=1, keepdim=True)
    neg_d = -xx - inner - xx.transpose(2, 1)
    return neg_d.topk(k=k, dim=-1)[1]


def torch_knn_points_normals(x, k, w=1.0):
    # src/PointNet.py:90-137
    p, n = x[:, 0:3], x[:, 3:6]
    inner = 2 * torch.matmul(p.transpose(2, 1), p)
    xx = torch.sum(p ** 2, dim=1, keepdim=True)
    dp = xx - inner + xx.transpose(2, 1)
    dn = 2 - 2 * torch.matmul(n.transpose(2, 1), n)
    return (-(dp * (1 + w * dn))).topk(k=k, dim=-1)[1]


def torch_graph_feature(x, idx):
    # src/PointNet.py:140-171: (B, C, N), (B, N, k) -> (B, 2C, N, k)
    b, c, n = x.shape
    k = idx.shape[-1]
    base = torch.arange(b).view(-1, 1, 1) * n
    flat = (idx + base).view(-1)
    xt = x.transpose(2, 1).contiguous().view(b * n, c)
    feat = xt[flat].view(b, n, k, c)
    ctr = xt.view(b, n, 1, c).repeat(1, 1, k, 1)
    return torch.cat((feat - ctr, ctr), dim=3).permute(0, 3, 1, 2)


class TorchSEDNet(nn.Module):
    """Reference-spec SEDNet at reduced size."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(12, 64, 1, bias=False)
        self.gn1 = nn.GroupNorm(2, 64)
        self.conv2 = nn.Conv2d(128, 64, 1, bias=False)
        self.gn2 = nn.GroupNorm(2, 64)
        self.conv3 = nn.Conv2d(128, 128, 1, bias=False)
        self.gn3 = nn.GroupNorm(2, 128)
        self.mlp1 = nn.Conv1d(256, 1024, 1)
        self.gnm = nn.GroupNorm(8, 1024)
        self.hconv1 = nn.Conv1d(1280, 512, 1)
        self.hgn1 = nn.GroupNorm(8, 512)
        self.hconv2 = nn.Conv1d(512, 256, 1)
        self.hgn2 = nn.GroupNorm(4, 256)
        self.prim1 = nn.Conv1d(256, 256, 1)
        self.pgn = nn.GroupNorm(4, 256)
        self.prim2 = nn.Conv1d(256, C6, 1)
        self.edge1 = nn.Conv1d(256, 128, 1)
        self.egn = nn.GroupNorm(4, 128)
        self.edge2 = nn.Conv1d(128, 2, 1)
        self.asis1 = nn.Conv1d(256, 256, 1)
        self.agn = nn.GroupNorm(4, 256)
        self.seg1 = nn.Conv1d(256, 256, 1)
        self.sgn = nn.GroupNorm(4, 256)
        self.seg2 = nn.Conv1d(256, EMB, 1)
        self.prim_enc = nn.Conv1d(8, 256, 1)
        self.w = 0.2

    def forward(self, x):  # x: (B, 6, N)
        lrelu = lambda t: F.leaky_relu(t, 0.2)
        idx = torch_knn_points_normals(x, K)
        h = lrelu(self.gn1(self.conv1(torch_graph_feature(x, idx))))
        x1 = h.max(dim=-1)[0]
        idx = torch_knn(x1, K)
        h = lrelu(self.gn2(self.conv2(torch_graph_feature(x1, idx))))
        x2 = h.max(dim=-1)[0]
        idx = torch_knn(x2, K)
        h = lrelu(self.gn3(self.conv3(torch_graph_feature(x2, idx))))
        x3 = h.max(dim=-1)[0]
        feats = torch.cat((x1, x2, x3), dim=1)
        g = F.relu(self.gnm(self.mlp1(feats))).max(dim=2)[0]

        h = torch.cat([g.unsqueeze(2).repeat(1, 1, x.shape[2]), feats], 1)
        h = F.relu(self.hgn1(self.hconv1(h)))
        x_all = F.relu(self.hgn2(self.hconv2(h)))
        x_type = F.relu(self.pgn(self.prim1(x_all)))
        type_logit = self.prim2(x_type)
        log_prob = F.log_softmax(type_logit, dim=1)
        edges = self.edge2(self.egn(self.edge1(x_type)))
        e = F.relu(self.sgn(self.seg1(x_all)))
        e = self.w * F.relu(self.agn(self.asis1(x_type))) + e
        fuse = F.relu(self.prim_enc(
            torch.cat((type_logit.detach(), edges.detach()), dim=1)))
        e = e + self.w * fuse
        emb = self.seg2(e)
        return emb, log_prob, edges


def _copy(dst_torch, kernel, bias=None):
    # flax Dense kernel (Cin, Cout) -> torch conv1d weight (Cout, Cin, 1)
    w = np.asarray(kernel).T
    dst_torch.weight.data = torch.from_numpy(
        w.reshape(*w.shape, *([1] * (dst_torch.weight.dim() - 2))).copy())
    if bias is not None:
        dst_torch.bias.data = torch.from_numpy(np.asarray(bias).copy())


def _copy_gn(dst, scale, gbias):
    dst.weight.data = torch.from_numpy(np.asarray(scale).copy())
    dst.bias.data = torch.from_numpy(np.asarray(gbias).copy())


def test_sednet_matches_torch_replica(rng):
    model = SEDNet(emb_size=EMB, num_primitives=C6, mode=5, k=K)
    pts = rng.randn(B, N, 3).astype(np.float32)
    nrm = rng.randn(B, N, 3).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    x = np.concatenate([pts, nrm], -1)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    out = model.apply({"params": params}, jnp.asarray(x))

    t = TorchSEDNet()
    enc = params["encoder"]
    for name, conv, gn in (("conv1", t.conv1, t.gn1), ("conv2", t.conv2, t.gn2),
                           ("conv3", t.conv3, t.gn3)):
        _copy(conv, enc[name]["conv"]["kernel"])
        _copy_gn(gn, enc[name]["gn"]["scale"], enc[name]["gn"]["bias"])
    _copy(t.mlp1, enc["mlp1"]["kernel"], enc["mlp1"]["bias"])
    _copy_gn(t.gnm, enc["gn_mlp1"]["scale"], enc["gn_mlp1"]["bias"])
    _copy(t.hconv1, params["conv1"]["kernel"], params["conv1"]["bias"])
    _copy_gn(t.hgn1, params["gn1"]["scale"], params["gn1"]["bias"])
    _copy(t.hconv2, params["conv2"]["kernel"], params["conv2"]["bias"])
    _copy_gn(t.hgn2, params["gn2"]["scale"], params["gn2"]["bias"])
    _copy(t.prim1, params["mlp_prim_prob1"]["kernel"],
          params["mlp_prim_prob1"]["bias"])
    _copy_gn(t.pgn, params["gn_prim"]["scale"], params["gn_prim"]["bias"])
    _copy(t.prim2, params["mlp_prim_prob2"]["kernel"],
          params["mlp_prim_prob2"]["bias"])
    _copy(t.edge1, params["edge_conv1"]["kernel"], params["edge_conv1"]["bias"])
    _copy_gn(t.egn, params["edge_gn"]["scale"], params["edge_gn"]["bias"])
    _copy(t.edge2, params["edge_conv2"]["kernel"], params["edge_conv2"]["bias"])
    _copy(t.asis1, params["asis_conv"]["kernel"], params["asis_conv"]["bias"])
    _copy_gn(t.agn, params["asis_gn"]["scale"], params["asis_gn"]["bias"])
    _copy(t.seg1, params["mlp_seg_prob1"]["kernel"],
          params["mlp_seg_prob1"]["bias"])
    _copy_gn(t.sgn, params["gn_seg"]["scale"], params["gn_seg"]["bias"])
    _copy(t.seg2, params["mlp_seg_prob2"]["kernel"],
          params["mlp_seg_prob2"]["bias"])
    _copy(t.prim_enc, params["prim_encoding"]["kernel"],
          params["prim_encoding"]["bias"])

    with torch.no_grad():
        emb_t, lp_t, edges_t = t(torch.from_numpy(x).permute(0, 2, 1))

    np.testing.assert_allclose(np.asarray(out.type_log_prob),
                               lp_t.permute(0, 2, 1).numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.edge_logits),
                               edges_t.permute(0, 2, 1).numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.embedding),
                               emb_t.permute(0, 2, 1).numpy(), atol=2e-4)
