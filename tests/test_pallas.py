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
