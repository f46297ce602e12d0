"""Data-layer tests: geometry, augmentation, synthetic fixtures, h5 loaders."""
import numpy as np
import pytest

from sednet_tpu.data import (
    Augmentor,
    BatchLoader,
    EdgeDataset,
    MixedDataset,
    ParseNetDataset,
    canonicalize_instance_labels,
    make_synthetic_shape,
    normalize_points,
    pca_align,
    remap_type_labels_eval,
    remap_type_labels_train,
    rotation_matrix_a_to_b,
    write_edge_h5,
    write_parsenet_h5,
)


def test_rotation_a_to_b(rng):
    for _ in range(5):
        a = rng.randn(3)
        a /= np.linalg.norm(a)
        b = rng.randn(3)
        b /= np.linalg.norm(b)
        r = rotation_matrix_a_to_b(a, b)
        np.testing.assert_allclose(r @ a, b, atol=1e-6)
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)


def test_normalize_points(rng):
    pts = rng.randn(100, 3) * 5 + 3
    out = normalize_points(pts)
    np.testing.assert_allclose(out.mean(0), 0, atol=1e-6)
    assert (out.max(0) - out.min(0)).max() == pytest.approx(1.0, rel=1e-5)


def test_pca_align_maps_smallest_axis_to_x(rng):
    # thin slab: z is the smallest principal axis
    pts = rng.randn(500, 3) * np.array([3.0, 2.0, 0.05])
    out, _, r = pca_align(pts)
    ext = out.max(0) - out.min(0)
    assert ext[0] == pytest.approx(ext.min())
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)


def test_augmentor_rotates_normals_but_never_shifts_them(rng):
    aug = Augmentor(np.random.RandomState(3))
    pts = rng.randn(50, 3).astype(np.float32)
    nrm = rng.randn(50, 3).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    for _ in range(20):
        _, n2 = aug(pts, nrm)
        np.testing.assert_allclose(np.linalg.norm(n2, axis=1), 1.0, atol=1e-5)


def test_canonicalize_labels():
    labels = np.array([7, 7, 3, 100, 3, 7])
    out = canonicalize_instance_labels(labels, max_segments=50)
    assert out.tolist() == [1, 1, 0, 2, 0, 1]


def test_type_remaps():
    prim = np.arange(10)
    tr = remap_type_labels_train(prim)
    assert tr[9] == 0 and tr[6] == 0 and tr[7] == 0 and tr[8] == 2
    ev = remap_type_labels_eval(prim)
    assert ev[0] == 9 and ev[6] == 9 and ev[7] == 9 and ev[8] == 2


def test_synthetic_shape_consistency(rng):
    d = make_synthetic_shape(rng, n_points=400, n_segments=4)
    assert d["points"].shape == (400, 3)
    assert set(np.unique(d["labels"])) == {0, 1, 2, 3}
    np.testing.assert_allclose(
        np.linalg.norm(d["normals"], axis=1), 1.0, atol=1e-5)
    assert d["edges"].sum() > 0  # some boundary points found
    assert len(d["params"]) == 4


def test_h5_roundtrip_and_loader(tmp_path):
    root = str(tmp_path)
    write_parsenet_h5(root, n_shapes=3, n_points=128)
    write_edge_h5(root, n_shapes=3, n_points=128)

    ds = ParseNetDataset(root, train=True, num_points=96, seed=0)
    item = ds[0]
    assert item["points"].shape == (96, 3)
    assert item["labels"].max() < 50
    assert np.abs(item["points"]).max() < 3.0

    ds_edge = EdgeDataset(root, train=True, num_points=96, seed=0)
    item2 = ds_edge[1]
    assert item2["edges"].shape == (96,)
    assert item2["edges_w"].max() == 1.0

    mixed = MixedDataset(ds, ds_edge)
    assert len(mixed) == 6
    loader = BatchLoader(mixed, batch_size=2, seed=0)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0]["points"].shape == (2, 96, 3)
    assert batches[0]["prim"].dtype == np.int32


def test_eval_mode_is_deterministic(tmp_path):
    root = str(tmp_path)
    write_parsenet_h5(root, n_shapes=2, n_points=64)
    ds = ParseNetDataset(root, train=False)
    a, b = ds[0], ds[0]
    np.testing.assert_array_equal(a["points"], b["points"])


def test_edge_dataset_ret_edges1w(tmp_path):
    """The optional "edge" channel: a separate edge-point cloud, centered
    with the shape's point mean, not shuffled with the per-point permutation
    (reference: src/dataset_segments_my.py:394-410)."""
    from sednet_tpu.data import EdgeDataset, write_edge_h5

    root = str(tmp_path)
    write_edge_h5(root, n_shapes=2, n_points=128)
    ds = EdgeDataset(root, train=True, ret_edges1w=True, num_points=64)
    item = ds[0]
    assert item["edges1w"].shape == (128, 3)
    assert item["points"].shape == (64, 3)  # points subsampled, edge cloud not
    assert np.isfinite(item["edges1w"]).all()
    ds2 = EdgeDataset(root, train=True, ret_edges1w=False, num_points=64)
    assert "edges1w" not in ds2[0]


def test_prefetch_loader_preserves_batches(tmp_path):
    """PrefetchLoader yields the same batches in the same order as the
    wrapped loader (reference analogue: DataLoader(num_workers=8),
    train_sed_net.py:185-187)."""
    from sednet_tpu.data import (BatchLoader, ParseNetDataset,
                                 PrefetchLoader, write_parsenet_h5)

    root = str(tmp_path)
    write_parsenet_h5(root, n_shapes=6, n_points=64)
    ds = ParseNetDataset(root, train=False, num_points=64)
    a = list(BatchLoader(ds, 2, shuffle=False, drop_last=False))
    b = list(PrefetchLoader(BatchLoader(ds, 2, shuffle=False,
                                        drop_last=False)))
    assert len(a) == len(b) == 3
    for ba, bb in zip(a, b):
        for k in ba:
            np.testing.assert_array_equal(ba[k], bb[k])


def test_prefetch_loader_propagates_errors():
    from sednet_tpu.data import PrefetchLoader

    def bad():
        yield {"x": np.zeros(1)}
        raise RuntimeError("boom")

    class L:
        def __iter__(self):
            return bad()

    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="boom"):
        list(PrefetchLoader(L()))


def test_edges1w_rides_the_same_frame():
    """The edges1w cloud must follow the points through extent scale,
    augmentation draws and PCA rotation (reference:
    src/dataset_segments_my.py:430-462) — regression: it was only
    mean-centered."""
    from sednet_tpu.data.datasets import _H5Dataset

    rng = np.random.RandomState(7)
    pts = rng.randn(2, 128, 3).astype(np.float32) * 3.0 + 1.0
    labels = np.zeros((2, 128), np.int64)
    prim = np.zeros((2, 128), np.int64)
    # edge cloud IS the point cloud: after identical transforms the rows
    # must match exactly (eval: no augmentation, no shuffle)
    ds = _H5Dataset(pts, labels, None, prim, edges1w=pts.copy(),
                    train=False, num_points=128)
    item = ds[0]
    np.testing.assert_allclose(item["edges1w"], item["points"], atol=1e-6)

    # train mode: augmentation draws are shared, rows only shuffled on the
    # points side — the transformed sets must be equal
    ds_t = _H5Dataset(pts, labels, None, prim, edges1w=pts.copy(),
                      train=True, num_points=128, seed=3)
    item = ds_t[0]
    a = np.asarray(sorted(map(tuple, np.round(item["points"], 5))))
    b = np.asarray(sorted(map(tuple, np.round(item["edges1w"], 5))))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_prefetch_loader_abandoned_early():
    """Breaking out of a PrefetchLoader iteration must not leave the worker
    thread blocked on the bounded queue (regression: q.put deadlock)."""
    import threading
    import time

    from sednet_tpu.data.datasets import PrefetchLoader

    n_before = threading.active_count()
    loader = PrefetchLoader([{"a": np.zeros(1)} for _ in range(50)], depth=1)
    it = iter(loader)
    next(it)
    it.close()  # GeneratorExit at the yield -> finally must unblock worker
    deadline = time.time() + 5.0
    while threading.active_count() > n_before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= n_before
