"""Numerical guards (reference: src/guard.py:7-14), as jit-safe clamps."""
import jax.numpy as jnp


def guard_exp(x, max_value: float = 75.0, min_value: float = -75.0):
    return jnp.exp(jnp.clip(x, min_value, max_value))


def guard_sqrt(x, minimum: float = 1e-5):
    return jnp.sqrt(jnp.clip(x, min=minimum))
