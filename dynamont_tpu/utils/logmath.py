"""Log-space numeric helpers shared by all DP kernels."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

LOG_2PI = 1.8378770664093453
NEG_INF = -np.inf


def log_normal_pdf(x, mean, stdev):
    """log N(x; mean, stdev^2), formulated exactly as the reference
    (ref: utils.hpp:198-215): -0.5*(log2pi + 2*log(s) + ((x-m)/s)^2)."""
    s_inv = 1.0 / stdev
    diff = (x - mean) * s_inv
    return -0.5 * (LOG_2PI + 2.0 * jnp.log(stdev) + diff * diff)


def log_normal_pdf_c(x, mean, c1, c2):
    """log N with precomputed c1 = -0.5*log2pi - log(s), c2 = 0.5/s^2."""
    diff = x - mean
    return c1 - c2 * diff * diff


def logaddexp(a, b):
    """log(exp(a)+exp(b)); jnp.logaddexp already handles -inf pairs."""
    return jnp.logaddexp(a, b)


def logsumexp(a, axis=None, keepdims=False):
    """-inf-safe logsumexp (jax.nn.logsumexp returns nan gradient corners we
    don't need; this direct form matches iterative logPlus folding)."""
    amax = jnp.max(a, axis=axis, keepdims=True)
    amax_safe = jnp.where(jnp.isfinite(amax), amax, 0.0)
    out = jnp.log(jnp.sum(jnp.exp(a - amax_safe), axis=axis, keepdims=True)) + amax_safe
    out = jnp.where(jnp.isfinite(amax), out, amax)
    if not keepdims and axis is not None:
        out = jnp.squeeze(out, axis=axis)
    elif not keepdims:
        out = jnp.squeeze(out)
    return out
