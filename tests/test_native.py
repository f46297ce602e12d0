"""Native C++ preprocessing library tests (skipped if no compiler)."""
import numpy as np
import pytest

from sednet_tpu.data.native import available, preprocess_batch

pytestmark = pytest.mark.skipif(not available(),
                                reason="native library unavailable")


def test_native_matches_numpy_pipeline(rng):
    from sednet_tpu.data.geometry import normalize_points, pca_align

    pts = (rng.randn(3, 400, 3) * [3, 2, 0.1] + 1).astype(np.float32)
    nrm = rng.randn(3, 400, 3).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    p2, n2 = preprocess_batch(pts.copy(), nrm.copy(), augment=False)
    for b in range(3):
        ref = normalize_points(pts[b])
        ref, _, _ = pca_align(ref, nrm[b])
        # rotation sign is ambiguous; compare the extent spectrum and the
        # smallest-axis-to-x invariant
        np.testing.assert_allclose(np.sort(ref.max(0) - ref.min(0)),
                                   np.sort(p2[b].max(0) - p2[b].min(0)),
                                   atol=1e-4)
        ext = p2[b].max(0) - p2[b].min(0)
        assert ext[0] == pytest.approx(ext.min())
        np.testing.assert_allclose(np.linalg.norm(n2[b], axis=1), 1.0,
                                   atol=1e-4)


def test_native_augment_preserves_normals(rng):
    pts = rng.randn(2, 300, 3).astype(np.float32)
    nrm = rng.randn(2, 300, 3).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    p2, n2 = preprocess_batch(pts, nrm, augment=True, seed=7)
    np.testing.assert_allclose(np.linalg.norm(n2, axis=-1), 1.0, atol=1e-4)
    assert np.isfinite(p2).all()


def test_dataset_native_path(tmp_path, rng):
    from sednet_tpu.data import ParseNetDataset, write_parsenet_h5

    write_parsenet_h5(str(tmp_path), n_shapes=2, n_points=128)
    ds = ParseNetDataset(str(tmp_path), train=False, use_native=True)
    assert ds.use_native
    item = ds[0]
    assert np.isfinite(item["points"]).all()
    # normalized: max-extent was scaled to ~1 (rotation may redistribute the
    # axis-aligned extents, and variance-PCA need not match extent ordering)
    assert np.abs(item["points"]).max() < 2.0
    ext = item["points"].max(0) - item["points"].min(0)
    assert ext.max() == pytest.approx(1.0, abs=0.35)


def test_native_pca_align_degenerate_parallel_axis():
    """A cloud whose smallest principal axis is exactly +-x must survive
    the native PCA alignment (regression: the rank-1 F G F^T collapsed
    every point to the origin; the numpy twin falls back to identity)."""
    from sednet_tpu.data import native

    if not native.available():
        pytest.skip("native library not built")
    rng = np.random.default_rng(0)
    pts = np.zeros((1, 500, 3), np.float32)
    pts[0, :, 1:] = rng.standard_normal((500, 2)).astype(np.float32)
    out, _ = native.preprocess_batch(pts.copy(), None, augment=False,
                                     seed=0, threads=1)
    ext = out[0].max(0) - out[0].min(0)
    assert ext.max() > 0.5, ext


def test_savetxt_fast_matches_numpy(tmp_path):
    """The native dump writer must produce byte-identical files to
    np.savetxt for the two formats the predict dump vocabulary uses
    ("%d" and "%0.4f" with ";"), including 1-D inputs and negative
    values, and silently fall back for unsupported formats."""
    import numpy as np

    from sednet_tpu.data import native

    rng = np.random.RandomState(0)
    cases = [
        (rng.randn(257, 6).astype(np.float32), "%0.4f", ";"),
        (rng.randn(100).astype(np.float32), "%0.4f", ";"),
        (rng.randint(-3, 50, (257,)).astype(np.int64), "%d", " "),
        (rng.randn(40, 2).astype(np.float32), "%.6e", ";"),  # fallback
    ]
    for i, (arr, fmt, delim) in enumerate(cases):
        fa = str(tmp_path / f"fast_{i}.txt")
        fb = str(tmp_path / f"ref_{i}.txt")
        native.savetxt_fast(fa, arr, fmt=fmt, delimiter=delim)
        np.savetxt(fb, arr, fmt=fmt, delimiter=delim)
        assert open(fa).read() == open(fb).read(), (i, fmt)
