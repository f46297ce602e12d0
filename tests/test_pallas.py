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
