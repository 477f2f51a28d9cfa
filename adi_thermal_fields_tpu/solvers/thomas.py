"""Batched tridiagonal (Thomas) solvers as XLA-friendly scans.

The reference solves tridiagonal systems three ways:
  * a scalar per-pencil Thomas under Numba (adi3d_numba_coeff.py:120-130),
  * a CuPy batch vectorized across pencils with a Python loop over the solve
    axis (adi3d_gpu_coeff.py:140-152),
  * a NumPy batch for cylindrical sweeps (adi3d_cyl_phi_v3.py:71-89).

On TPU the idiomatic formulation is the batched one: every pencil
perpendicular to the solve axis is a system, all solved simultaneously by the
VPU, with the inherently sequential recurrence expressed as ``lax.scan`` over
the *leading* axis so each scan step is one fused elementwise op over the
(batch...) trailing dims (sublane x lane friendly).  A fused Pallas kernel
replaces this on the performance path (see solvers/pallas_sweeps.py) —
this module is the semantics reference and the fallback.

Conventions: for systems ``a[i] x[i-1] + b[i] x[i] + c[i] x[i+1] = d[i]``,
``a[0]`` and ``c[n-1]`` are ignored (treated as zero).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["thomas", "thomas_along_axis", "cyclic_thomas"]


def thomas(a: jax.Array, b: jax.Array, c: jax.Array, d: jax.Array) -> jax.Array:
    """Solve tridiagonal systems along axis 0; trailing axes are batch.

    All inputs share one shape ``(n, *batch)``.  Returns ``x`` of that shape.
    Standard Thomas forward elimination + back substitution, batched:
    ``cp[i] = c[i]/(b[i]-a[i]*cp[i-1])``, ``dp[i] = (d[i]-a[i]*dp[i-1])/(...)``,
    then ``x[i] = dp[i] - cp[i]*x[i+1]``.
    """
    zero = jnp.zeros(d.shape[1:], d.dtype)

    def fwd(carry, abcd):
        cp_prev, dp_prev = carry
        a_i, b_i, c_i, d_i = abcd
        denom = b_i - a_i * cp_prev
        cp = c_i / denom
        dp = (d_i - a_i * dp_prev) / denom
        return (cp, dp), (cp, dp)

    _, (cp, dp) = lax.scan(fwd, (zero, zero), (a, b, c, d))

    def bwd(x_next, cpdp):
        cp_i, dp_i = cpdp
        x = dp_i - cp_i * x_next
        return x, x

    _, x = lax.scan(bwd, zero, (cp, dp), reverse=True)
    return x


def thomas_along_axis(a, b, c, d, axis: int) -> jax.Array:
    """Solve tridiagonal systems along an arbitrary axis of nd arrays."""
    if axis == 0:
        return thomas(a, b, c, d)
    mv = lambda t: jnp.moveaxis(t, axis, 0)
    x = thomas(mv(a), mv(b), mv(c), mv(d))
    return jnp.moveaxis(x, 0, axis)


def cyclic_thomas(a, b, c, d, alpha=None, beta=None) -> jax.Array:
    """Solve batched *cyclic* (periodic) tridiagonal systems along axis 0.

    System: ``a[i] x[i-1] + b[i] x[i] + c[i] x[i+1] = d[i]`` with wrap-around
    couplings ``beta * x[n-1]`` in row 0 and ``alpha * x[0]`` in row n-1.
    ``alpha``/``beta`` broadcast against the batch shape; they default to the
    natural periodic couplings ``alpha = c[n-1]``, ``beta = a[0]``, in which
    case ``a[0]`` and ``c[n-1]`` are zeroed internally.

    Sherman–Morrison rank-1 correction, mirroring the reference's (dead-code)
    ``_cyclic_thomas_batch_np`` (adi3d_cyl_phi_v3.py:92-123) but with the
    textbook-correct perturbation vector: solve ``B y = d`` and ``B z = u``
    where ``B = A - u v^T``, ``u = (g, ..., alpha)``, ``v = (1, ..., beta/g)``
    with gauge ``g = -b[0]``, then ``x = y - z (v^T y)/(1 + v^T z)``.
    """
    n = d.shape[0]
    if beta is None:
        beta = a[0]
        a = a.at[0].set(0.0)
    if alpha is None:
        alpha = c[n - 1]
        c = c.at[n - 1].set(0.0)

    alpha = jnp.broadcast_to(alpha, d.shape[1:]).astype(d.dtype)
    beta = jnp.broadcast_to(beta, d.shape[1:]).astype(d.dtype)

    gamma = -b[0]
    b_mod = b.at[0].add(-gamma).at[n - 1].add(-alpha * beta / gamma)

    y = thomas(a, b_mod, c, d)

    u = jnp.zeros_like(d).at[0].set(gamma).at[n - 1].set(alpha)
    z = thomas(a, b_mod, c, u)

    fact = (y[0] + beta * y[n - 1] / gamma) / (1.0 + z[0] + beta * z[n - 1] / gamma)
    return y - fact[None, ...] * z
