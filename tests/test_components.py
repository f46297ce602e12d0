"""Tests for the completeness components: pointnet2 ops, IoU losses,
surfaces/bit-mapping, baselines, gen_vis, tracing."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sednet_tpu.ops.pointnet2 import (ball_query, furthest_point_sampling,
                                      gather_operation, group_points,
                                      interpolation_weights, three_interpolate,
                                      three_nn)


def test_fps_spreads_points(rng):
    # two far clusters: FPS with 2 samples must pick one from each
    a = rng.randn(50, 3) * 0.01
    b = rng.randn(50, 3) * 0.01 + 10
    pts = jnp.asarray(np.concatenate([a, b])[None].astype(np.float32))
    idx = np.asarray(furthest_point_sampling(pts, 2))[0]
    assert (idx[0] < 50) != (idx[1] < 50)
    idx8 = np.asarray(furthest_point_sampling(pts, 8))[0]
    assert len(set(idx8.tolist())) == 8


def test_three_nn_and_interpolate(rng):
    unknown = jnp.asarray(rng.randn(1, 20, 3).astype(np.float32))
    known = jnp.asarray(rng.randn(1, 9, 3).astype(np.float32))
    dist, idx = three_nn(unknown, known)
    assert dist.shape == (1, 20, 3) and idx.shape == (1, 20, 3)
    full = np.sqrt(((np.asarray(unknown)[0][:, None]
                     - np.asarray(known)[0][None]) ** 2).sum(-1))
    np.testing.assert_allclose(np.asarray(dist)[0, :, 0], full.min(1),
                               atol=1e-5)
    feats = jnp.asarray(rng.randn(1, 9, 4).astype(np.float32))
    w = interpolation_weights(dist)
    out = three_interpolate(feats, idx, w)
    assert out.shape == (1, 20, 4)
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=1e-5)


def test_ball_query_and_group(rng):
    centers = jnp.asarray(np.zeros((1, 1, 3), np.float32))
    pts = np.concatenate([rng.rand(10, 3) * 0.01,
                          rng.rand(30, 3) + 5]).astype(np.float32)
    idx, count = ball_query(centers, jnp.asarray(pts[None]), radius=0.5,
                            n_sample=16)
    assert int(count[0, 0]) == 10
    got = set(np.asarray(idx)[0, 0].tolist())
    assert got <= set(range(10))  # padding repeats in-ball hits
    grouped = group_points(jnp.asarray(pts[None]), idx)
    assert grouped.shape == (1, 1, 16, 3)
    g = gather_operation(jnp.asarray(pts[None]),
                         jnp.asarray([[0, 5]], jnp.int32))
    np.testing.assert_allclose(np.asarray(g)[0], pts[[0, 5]])


def test_miou_losses(rng):
    from sednet_tpu.losses.iou_loss import (miou_loss, miou_loss_edge,
                                            miou_loss_weighted,
                                            reorder_pred_idx)

    b, c, n = 2, 4, 60
    target = rng.randint(0, 3, (b, n))
    t_oh = np.eye(c, dtype=np.float32)[target].transpose(0, 2, 1)
    perfect = jnp.asarray(t_oh)
    assert float(miou_loss(perfect, jnp.asarray(t_oh))) < 0.3  # absent ch
    gt_mask = jnp.asarray(t_oh.sum(-1) > 0)
    assert float(miou_loss(perfect, jnp.asarray(t_oh),
                           gt_mask=gt_mask)) < 1e-6
    # weighted variant averages iou over ALL C channels (reference
    # my_iou_loss.py:95-96): perfect pred with 3/4 channels present -> 0.25
    assert float(miou_loss_weighted(perfect, jnp.asarray(t_oh),
                                    gt_mask=gt_mask)) == pytest.approx(0.25,
                                                                       abs=1e-5)

    # permuted channels recovered by reorder
    perm = np.array([2, 0, 1, 3])
    scores = t_oh[:, perm, :]
    match_idx, nums = reorder_pred_idx(scores, target)
    gathered = np.take_along_axis(scores, match_idx.transpose(0, 2, 1),
                                  axis=1)
    assert float(miou_loss(jnp.asarray(gathered), jnp.asarray(t_oh),
                           gt_mask=gt_mask)) < 1e-6

    pts = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))
    el = jnp.asarray(rng.randn(b, n, 2).astype(np.float32))
    v = miou_loss_edge(pts, perfect, el)
    assert 0.0 <= float(v) <= 1.0


def test_surfaces_bit_mapping(rng):
    from sednet_tpu.fit.surfaces import (bernstein_basis, bezier_surface,
                                         boundary_parameterization,
                                         grid_bit_mask,
                                         regular_parameterization,
                                         tessellate_points_fast,
                                         trimmed_surface_mesh)

    p = regular_parameterization(5, 4)
    assert p.shape == (20, 2) and p.max() == 1.0
    bp = boundary_parameterization(6)
    assert (np.abs(bp - 0.5).max(1) == 0.5).all()  # all on the boundary

    # grid over [0,1]^2 plane; input covers only x < 0.5
    u, v = np.meshgrid(np.linspace(0, 1, 9), np.linspace(0, 1, 9),
                       indexing="ij")
    grid = np.stack([u.ravel(), v.ravel(), np.zeros(81)], 1)
    inputs = np.c_[rng.rand(400) * 0.5, rng.rand(400), np.zeros(400)]
    mask = grid_bit_mask(inputs, grid, 9, 9, thresh=0.08)
    assert mask[:3].all()
    assert not mask[-2:].any()
    verts, tris = tessellate_points_fast(grid, 9, 9, mask)
    assert len(tris) == 2 * mask.sum()
    assert verts.shape[0] <= 81

    verts2, tris2 = trimmed_surface_mesh(inputs, grid, 9, 9, kind="plane")
    assert len(tris2) > 0

    bb = bernstein_basis(3, np.linspace(0, 1, 7))
    np.testing.assert_allclose(bb.sum(1), 1.0, atol=1e-9)
    ctrl = np.zeros((3, 3, 3))
    ctrl[..., 0], ctrl[..., 1] = np.meshgrid(range(3), range(3), indexing="ij")
    surf = bezier_surface(ctrl, 5, 5)
    np.testing.assert_allclose(surf[:, 2], 0.0, atol=1e-9)


def test_cluster_baselines(rng):
    from sednet_tpu.cluster.baselines import cluster

    a = rng.randn(40, 3) * 0.1
    b = rng.randn(40, 3) * 0.1 + 5
    x = np.concatenate([a, b])
    y = cluster(x, 2, alg="kmeans")
    assert len(np.unique(y)) == 2
    assert len(np.unique(y[:40])) == 1


def test_gen_vis_tool(tmp_path, rng):
    src = str(tmp_path)
    n = 50
    pts = rng.randn(n, 6)
    np.savetxt(os.path.join(src, "0_GT_points.txt"), pts, delimiter=";")
    np.savetxt(os.path.join(src, "0_type.txt"), rng.randint(0, 6, n), fmt="%d")
    np.savetxt(os.path.join(src, "0_inst.txt"), rng.randint(0, 4, n), fmt="%d")
    from sednet_tpu.gen_vis import gen_total_vis

    dst = gen_total_vis(src, workers=2)
    assert os.path.exists(os.path.join(dst, "0_pred_type.txt"))
    arr = np.loadtxt(os.path.join(dst, "0_pred_inst.txt"), delimiter=";")
    assert arr.shape == (n, 6)


def test_tracing_utils():
    from sednet_tpu.utils.tracing import check_finite, trace

    timings = {}
    with trace("stage", timings):
        _ = jnp.ones(4).sum()
    assert timings["stage"] > 0

    check_finite({"a": np.ones(3)}, "ok")
    with pytest.raises(FloatingPointError):
        check_finite({"a": np.array([1.0, np.nan])}, "bad")


def test_grid_vis_pointclouds_and_meshes(tmp_path, rng):
    """Offscreen grid renderer: images have the right shape, per-point
    colors land in the scatter, meshes paint non-background pixels
    (reference behavior: VisUtils.py vis_batch_in_grid/:202-243)."""
    from sednet_tpu.utils import (render_meshes_grid,
                                  render_pointclouds_grid,
                                  save_images_rotations, vis_batch_in_grid)
    from sednet_tpu.utils.mesh import tessellate_points

    clouds = [rng.randn(200, 3) for _ in range(3)]
    colors = [np.tile([[255.0, 0.0, 0.0]], (200, 1)) for _ in range(3)]
    p = str(tmp_path / "pc.png")
    img = render_pointclouds_grid(clouds, p, colors=colors, width_px=256)
    assert os.path.exists(p) and img.ndim == 3 and img.shape[2] == 3
    assert img.shape[1] == 256
    # red points must be visible: some pixel strongly red
    red = (img[..., 0].astype(int) - img[..., 1].astype(int)) > 80
    assert red.any()

    # a UV grid tessellated into a surface renders non-white pixels
    u = np.linspace(0, 1, 8)
    gx, gy = np.meshgrid(u, u)
    grid = np.stack([gx, gy, gx * gy], -1).reshape(-1, 3)
    v, f = tessellate_points(grid, 8, 8)
    pm = str(tmp_path / "mesh.png")
    img2 = render_meshes_grid([(v, np.asarray(f))], pm, width_px=256)
    assert os.path.exists(pm)
    assert (img2 < 250).any()

    # batch entry point mirrors the reference's sqrt(B) layout
    img3 = vis_batch_in_grid(np.stack([grid] * 4), tessellate=True,
                             width_px=256)
    assert img3.ndim == 3
    paths = save_images_rotations(clouds, str(tmp_path / "rot_{}.png"),
                                  n_views=2, width_px=128)
    assert all(os.path.exists(q) for q in paths)


def test_gen_vis_tool_images(tmp_path, rng):
    src = str(tmp_path)
    n = 50
    pts = rng.randn(n, 6)
    np.savetxt(os.path.join(src, "0_GT_points.txt"), pts, delimiter=";")
    np.savetxt(os.path.join(src, "0_type.txt"), rng.randint(0, 6, n), fmt="%d")
    np.savetxt(os.path.join(src, "0_inst.txt"), rng.randint(0, 4, n), fmt="%d")
    from sednet_tpu.gen_vis import gen_total_vis

    dst = gen_total_vis(src, workers=2, images=True)
    assert os.path.exists(os.path.join(dst, "grid_pred_type.png"))
    assert os.path.exists(os.path.join(dst, "grid_pred_inst.png"))
