"""Pallas kernel parity tests (interpret mode on the CPU test mesh)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sednet_tpu.ops.pallas_kernels import (mean_shift_step_pallas,
                                           mean_shift_step_pallas_batched)
from sednet_tpu.ops.guard import guard_exp


def _xla_step(new_x, x, b):
    dist = 2.0 - 2.0 * new_x @ x.T
    k = guard_exp(-dist / (b * b) / 2.0)
    d = 1.0 / jnp.sum(k, axis=1, keepdims=True)
    out = (k @ x) * d
    return out / jnp.linalg.norm(out, axis=1, keepdims=True)


@pytest.mark.parametrize("n,e,bw", [(300, 16, 0.3), (1111, 8, 0.05)])
def test_mean_shift_step_matches_xla(rng, n, e, bw):
    x = rng.randn(n, e).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    xj = jnp.asarray(x)
    ref = np.asarray(_xla_step(xj, xj, jnp.float32(bw)))
    got = np.asarray(mean_shift_step_pallas(
        xj, xj, jnp.float32(bw), row_block=128, col_block=256,
        interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_mean_shift_step_batched_matches_per_shape(rng):
    b, n, e = 3, 200, 8
    x = rng.randn(b, n, e).astype(np.float32)
    x /= np.linalg.norm(x, axis=-1, keepdims=True)
    xj = jnp.asarray(x)
    bw = jnp.asarray([0.3, 0.5, 0.08], jnp.float32)
    got = np.asarray(mean_shift_step_pallas_batched(
        xj, xj, bw, row_block=64, col_block=128, interpret=True))
    for i in range(b):
        ref = np.asarray(_xla_step(xj[i], xj[i], bw[i]))
        np.testing.assert_allclose(got[i], ref, atol=3e-5)


def test_mean_shift_step_padding_is_masked(rng):
    """n not divisible by blocks: padded fake points must not contribute."""
    n, e = 130, 8
    x = rng.randn(n, e).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    xj = jnp.asarray(x)
    ref = np.asarray(_xla_step(xj, xj, jnp.float32(0.5)))
    got = np.asarray(mean_shift_step_pallas(
        xj, xj, jnp.float32(0.5), row_block=64, col_block=128,
        interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_mean_shift_step_bf16_close_and_labels_stable(rng):
    """The opt-in bf16 fast path (config.ms_bf16): one step stays within
    bf16-quantization-amplified tolerance of the f32 step, and a full
    clustering run lands on the identical partition on well-separated
    embeddings (the production audit in scripts/audit_clustering.py pins
    the label IoU at 10k points)."""
    from sednet_tpu.cluster.mean_shift import mean_shift_iterate, nms

    n, e, k = 400, 16, 4
    dirs = rng.randn(k, e)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    lab = rng.randint(0, k, n)
    x = dirs[lab] + 0.05 * rng.randn(n, e)
    x = jnp.asarray((x / np.linalg.norm(x, axis=1, keepdims=True)).astype(
        np.float32))
    bw = jnp.float32(0.25)
    f32 = np.asarray(mean_shift_step_pallas(
        x, x, bw, row_block=128, col_block=256, interpret=True))
    b16 = np.asarray(mean_shift_step_pallas(
        x, x, bw, row_block=128, col_block=256, bf16=True, interpret=True))
    assert b16.dtype == np.float32
    # one step: bf16 rel-err ~8e-3 on s amplified by exp(ds/(2 b^2))
    np.testing.assert_allclose(b16, f32, atol=5e-2)
    sp = mean_shift_iterate(x, bw, 50, backend="pallas", interpret=True)
    sb = mean_shift_iterate(x, bw, 50, backend="pallas", bf16=True,
                            interpret=True)
    lp = np.asarray(nms(sp, x, bw)[0])
    lb = np.asarray(nms(sb, x, bw)[0])
    mapping = {}
    for a, b in zip(lp.tolist(), lb.tolist()):
        assert mapping.setdefault(a, b) == b, (a, b, mapping)
    # bijective: bf16 must not merge two f32 clusters either
    assert len(set(mapping.values())) == len(mapping)


def test_cluster_level_backend_parity(rng):
    """Full 50-iteration mean-shift: the fused Pallas backend and the
    reference-shaped XLA backend must produce the SAME cluster labels and
    near-identical shifted points (SURVEY §7.4 item 3 pinned by test; the
    production-scale TPU audit lives in scripts/audit_clustering.py)."""
    import jax
    import jax.numpy as jnp

    from sednet_tpu.cluster.mean_shift import (compute_bandwidth,
                                               mean_shift_iterate, nms)

    n, e, k = 512, 16, 5
    dirs = rng.randn(k, e)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    lab = rng.randint(0, k, n)
    x = dirs[lab] + 0.05 * rng.randn(n, e)
    x = jnp.asarray((x / np.linalg.norm(x, axis=1, keepdims=True)).astype(
        np.float32))
    bw = jnp.clip(compute_bandwidth(jax.random.PRNGKey(0), x, n,
                                    jnp.float32(0.05)), min=0.003)
    sp = mean_shift_iterate(x, bw, 50, backend="pallas", interpret=True)
    sx = mean_shift_iterate(x, bw, 50, backend="xla")
    drift = float(np.abs(np.asarray(sp) - np.asarray(sx)).max())
    assert drift < 1e-4, drift
    lp, _, np_p = nms(sp, x, bw)
    lx, _, np_x = nms(sx, x, bw)
    assert int(np_p) == int(np_x)
    # identical PARTITION (compact ids may permute with which center row
    # survives NMS under float drift)
    lp, lx = np.asarray(lp), np.asarray(lx)
    mapping = {}
    for a, b in zip(lp.tolist(), lx.tolist()):
        assert mapping.setdefault(a, b) == b, (a, b, mapping)
    assert len(mapping) == int(np_p)


def _xla_colmax(rows, cols, bias, thresh, gain):
    from sednet_tpu.cluster.mean_shift import _blocked_colmax

    def score(sim, cid):
        return jnp.where(2.0 - 2.0 * sim < thresh,
                         gain * sim + bias[cid[0]][None, :], -jnp.inf)

    return _blocked_colmax(rows, cols, score)


@pytest.mark.parametrize("mode", ["membership", "vote", "survivor"])
def test_colmax_pallas_matches_blocked_xla(rng, mode):
    """The fused NMS colmax kernel reproduces _blocked_colmax on all three
    pass configurations, including padded tails and first-index ties."""
    from sednet_tpu.ops.pallas_kernels import colmax_pallas

    r, c, e = 203, 157, 8
    rows = rng.randn(r, e).astype(np.float32)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    cols = rng.randn(c, e).astype(np.float32)
    # duplicated columns force exact ties -> first-index semantics checked
    cols[40] = cols[7]
    cols[41] = cols[7]
    cols /= np.linalg.norm(cols, axis=1, keepdims=True)
    rows[:3] = cols[7]  # rows exactly on the tied columns
    inf = jnp.float32(jnp.inf)
    if mode == "membership":
        bias, thresh, gain = jnp.zeros((c,), jnp.float32), inf, 1.0
    elif mode == "vote":
        counts = jnp.asarray(rng.randint(0, 9, size=c).astype(np.float32))
        bias, thresh, gain = counts, jnp.float32(0.4), 0.0
    else:
        mask = jnp.where(jnp.asarray(rng.rand(c) > 0.5), 0.0, -jnp.inf)
        bias, thresh, gain = mask.astype(jnp.float32), inf, 1.0
    rj, cj = jnp.asarray(rows), jnp.asarray(cols)
    gain = jnp.float32(gain)
    ref_v, ref_i = _xla_colmax(rj, cj, bias, thresh, gain)
    got_v, got_i = colmax_pallas(rj, cj, bias, thresh, gain,
                                 row_block=64, col_block=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(ref_v),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(ref_i))


def test_colmax_pallas_all_masked_rows(rng):
    """Rows whose every column is masked out return (-inf, 0) like the
    XLA blocked scan's init state."""
    from sednet_tpu.ops.pallas_kernels import colmax_pallas

    r, c, e = 17, 33, 4
    rows = rng.randn(r, e).astype(np.float32)
    cols = rng.randn(c, e).astype(np.float32)
    bias = jnp.full((c,), -jnp.inf, jnp.float32)
    v, i = colmax_pallas(jnp.asarray(rows), jnp.asarray(cols), bias,
                         jnp.float32(jnp.inf), jnp.float32(1.0),
                         row_block=8, col_block=128, interpret=True)
    assert np.all(np.asarray(v) == -np.inf)
    assert np.all(np.asarray(i) == 0)


@pytest.mark.parametrize("tile", [128, 512])
@pytest.mark.parametrize("method", ["mxu", "roll"])
def test_segsum_sorted_scan_pallas_matches_scatter(rng, tile, method):
    """The one-pass Pallas segmented scan must reproduce the scatter
    segment sums — including segments that SPAN multiple tiles (the
    quirk-mode affinity's in-degree skew makes kilolong segments the
    norm: measured max in-degree 4861 of N=10000) and empty
    destinations. Both intra-tile reductions (one-hot MXU matmul /
    lane-roll scan) must agree with the scatter reference."""
    from sednet_tpu.ops.pallas_kernels import segsum_sorted_scan_pallas

    n, m = 97, 7
    # skewed destinations: a few ids soak up most entries, many ids empty
    parts = [rng.randint(0, n, size=300),
             np.full(700, 3), np.full(450, 91), np.full(5, 0)]
    dest = np.sort(np.concatenate(parts)).astype(np.int32)
    e = dest.shape[0]
    vals = (rng.randn(e, m) * 10.0 ** rng.uniform(-3, 3, (e, 1))
            ).astype(np.float32)  # wide dynamic range like the quirk rsq

    ref = np.zeros((n, m), np.float64)
    np.add.at(ref, dest, vals.astype(np.float64))

    counts = np.bincount(dest, minlength=n)
    ends = jnp.asarray(np.cumsum(counts).astype(np.int32))
    got = np.asarray(segsum_sorted_scan_pallas(
        jnp.asarray(vals.T), jnp.asarray(dest), ends, tile=tile,
        interpret=True, method=method))
    np.testing.assert_allclose(got, ref.astype(np.float32),
                               rtol=2e-4, atol=1e-5)
    assert np.all(got[counts == 0] == 0.0)


def test_segsum_sorted_scan_pallas_vmap(rng):
    """The mesh/batched enrich path vmaps the kernel — the sequential
    carry must reset per batch element (program_id remapping under the
    pallas batching rule)."""
    import functools

    from sednet_tpu.ops.pallas_kernels import segsum_sorted_scan_pallas

    bsz, n, m, e = 3, 50, 5, 400
    dest = np.stack([np.sort(rng.randint(0, n, size=e)) for _ in range(bsz)]
                    ).astype(np.int32)
    vals = rng.randn(bsz, e, m).astype(np.float32)
    ends = np.stack([np.cumsum(np.bincount(d, minlength=n))
                     for d in dest]).astype(np.int32)
    f = functools.partial(segsum_sorted_scan_pallas, tile=128,
                          interpret=True)
    out = np.asarray(jax.vmap(f)(
        jnp.asarray(vals.transpose(0, 2, 1)), jnp.asarray(dest),
        jnp.asarray(ends)))
    for b in range(bsz):
        ref = np.zeros((n, m), np.float64)
        np.add.at(ref, dest[b], vals[b])
        np.testing.assert_allclose(out[b], ref.astype(np.float32),
                                   rtol=1e-4, atol=1e-5)
