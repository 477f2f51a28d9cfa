"""Fused Pallas stencil kernel for the explicit theta-pass.

Computes ``R0 = T + c * (Lx + Ly + Lz) T`` with mask-aware Laplacians
(step/cartesian.masked_laplacian_1d semantics; reference lap1D_x/y/z,
adi3d_numba_coeff.py:239-288) in ONE pass over HBM:

  * the grid walks x-planes; each (ny, nz) plane of T and the int8 mask is
    DMA'd exactly once (contiguous 1-plane blocks);
  * the two planes below the input are carried in a VMEM ring buffer, so the
    x-direction neighbors never re-read HBM — step ``i`` computes plane
    ``i-1`` from {ring[i-2], ring[i-1], input[i]};
  * y/z neighbors are in-plane sublane/lane shifts on the VPU.

HBM traffic: read T (4B) + mask (1B), write R0 (4B) = 9 B/cell, vs the XLA
path's ~3 materialized shifted laplacians (~28 B/cell measured ~10 ms at
512^3 f32 on v5e; this kernel targets the ~1.5 ms roofline).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["theta_rhs"]


def _shift_lo(x, axis):
    """Value of the (axis-index - 1) neighbor; 0 beyond the domain edge."""
    zeros = jnp.zeros_like(lax.slice_in_dim(x, 0, 1, axis=axis))
    return lax.concatenate(
        [zeros, lax.slice_in_dim(x, 0, x.shape[axis] - 1, axis=axis)],
        dimension=axis)


def _shift_hi(x, axis):
    """Value of the (axis-index + 1) neighbor; 0 beyond the domain edge."""
    zeros = jnp.zeros_like(lax.slice_in_dim(x, 0, 1, axis=axis))
    return lax.concatenate(
        [lax.slice_in_dim(x, 1, x.shape[axis], axis=axis), zeros],
        dimension=axis)


def _theta_rhs_kernel(scal_ref, seed_ref, T_ref, M_ref, out_ref, Tbuf,
                      Mbuf, *, nx):
    """Grid = (nx + 1,); step i computes R0 for plane p = i - 1.

    Ring protocol: before the rotate at step i, {Tbuf,Mbuf}[(i-1) % 2] hold
    plane i-1 and slot i % 2 holds plane i-2 (zeroed at i=0 so the i=1 read
    is a clean 0-mask).  After compute, the input plane i overwrites slot
    i % 2.  Masks are carried as f32 0/1 so the whole hot path is VPU
    multiply-adds — no int compares or selects (0*T == 0 and 1*T == T
    exactly for the finite fields, so this is bitwise the XLA semantics)."""
    c = scal_ref[0]        # dt*kappa*(1-theta)
    iv_x = scal_ref[1]     # per-axis 1/d^2 (equal for cubic voxels)
    iv_y = scal_ref[2]
    iv_z = scal_ref[3]
    i = pl.program_id(0)
    f32 = scal_ref.dtype   # compute dtype (f32 for bf16 state)
    if seed_ref is not None:
        pltpu.prng_seed(seed_ref[0] + i)
    # one int8 -> f32 conversion per plane (int8 ops barely legalize)
    Mh_f = M_ref[0].astype(jnp.int32).astype(f32)

    @pl.when(i == 0)
    def _init():
        Tbuf[1] = jnp.zeros_like(Tbuf[1])
        Mbuf[1] = jnp.zeros_like(Mbuf[1])

    @pl.when(i >= 1)
    def _compute():
        s_c = (i - 1) % 2
        s_l = i % 2
        Tc = Tbuf[s_c].astype(f32)
        Mc_f = Mbuf[s_c]
        hi_f = jnp.where(i <= nx - 1, 1.0, 0.0).astype(f32)  # plane p+1 exists
        Ml_f = Mbuf[s_l]               # zero at i=1 (init) => no lo neighbor
        Mhv = Mh_f * hi_f

        # x-direction: neighbors live in the adjacent planes.  Accumulate in
        # a staging scratch plane between axes to bound the live-temporary
        # VMEM (acc is f32 even when the state is bf16).
        sx = Ml_f * Tbuf[s_l].astype(f32) + Mhv * T_ref[0].astype(f32)
        acc = (sx - (Ml_f + Mhv) * Tc) * iv_x
        # y (sublane) and z (lane) directions: in-plane shifts
        for ax, iv in ((0, iv_y), (1, iv_z)):
            ml = _shift_lo(Mc_f, ax)
            mh = _shift_hi(Mc_f, ax)
            s = ml * _shift_lo(Tc, ax) + mh * _shift_hi(Tc, ax)
            acc = acc + (s - (ml + mh) * Tc) * iv

        res = Tc + (c * Mc_f) * acc
        if seed_ref is not None:
            bits = pltpu.bitcast(pltpu.prng_random_bits(res.shape),
                                 jnp.uint32)
            out_ref[0] = pltpu.stochastic_round(res, bits,
                                                target_dtype=out_ref.dtype)
        else:
            out_ref[0] = res.astype(out_ref.dtype)

    @pl.when(i <= nx - 1)
    def _rotate():
        Tbuf[i % 2] = T_ref[0]
        Mbuf[i % 2] = Mh_f


def _round_up(v, m):
    return -(-v // m) * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def theta_rhs(T, mask_i8, c, inv_dx2, rng_seed=None, *,
              interpret: bool = False):
    """``R0 = T + c * (Lx+Ly+Lz) T`` with mask-aware Laplacians, one HBM pass.

    ``c`` is the scalar ``dt*kappa*(1-theta)`` and ``inv_dx2`` either the
    scalar ``1/dx^2`` or a 3-sequence of per-axis ``1/d^2`` (anisotropic
    voxels; kept separate to match the XLA reference's rounding order
    bit-for-bit); ``mask_i8`` is the solid mask as int8 (nonzero =
    in-mask).  Void cells return T unchanged."""
    nx, ny, nz = T.shape
    dtype = T.dtype
    inv3 = jnp.broadcast_to(jnp.asarray(inv_dx2), (3,))

    p1 = _round_up(ny, 8) - ny
    p2 = _round_up(nz, 128) - nz
    if p1 or p2:
        pad = ((0, 0), (0, p1), (0, p2))
        T = jnp.pad(T, pad)
        mask_i8 = jnp.pad(mask_i8, pad)  # padded cells void -> passthrough
    Py, Pz = T.shape[1], T.shape[2]

    cdt = jnp.promote_types(dtype, jnp.float32)  # solve precision
    scal = jnp.concatenate([jnp.asarray(c, cdt).reshape(1),
                            inv3.astype(cdt)])
    blk = (1, Py, Pz)
    in_idx = lambda i: (jnp.minimum(i, nx - 1), 0, 0)
    out_idx = lambda i: (jnp.maximum(i - 1, 0), 0, 0)

    # stochastic bf16 stores (unbiased; kills sub-quantum update dropout)
    stochastic = (rng_seed is not None
                  and dtype != jnp.promote_types(dtype, jnp.float32))
    if stochastic:
        body = functools.partial(_theta_rhs_kernel, nx=nx)
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM)]
        inputs = [scal, jnp.asarray(rng_seed, jnp.int32).reshape(1)]
    else:
        body = (lambda scal, T_ref, M_ref, out_ref, Tb, Mb:
                functools.partial(_theta_rhs_kernel, nx=nx)(
                    scal, None, T_ref, M_ref, out_ref, Tb, Mb))
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
        inputs = [scal]
    in_specs += [
        pl.BlockSpec(blk, in_idx, memory_space=pltpu.VMEM),
        pl.BlockSpec(blk, in_idx, memory_space=pltpu.VMEM),
    ]
    inputs += [T, mask_i8]

    out = pl.pallas_call(
        body,
        grid=(nx + 1,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(blk, out_idx, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nx, Py, Pz), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, Py, Pz), dtype),  # T planes (state dtype)
            pltpu.VMEM((2, Py, Pz), cdt),    # masks carried as 0/1 at cdt
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)

    if p1 or p2:
        out = out[:, :ny, :nz]
    return out
