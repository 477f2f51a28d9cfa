"""Fused Pallas TPU kernels for the masked implicit ADI sweeps.

One sweep of the Cartesian theta-scheme solves, per pencil along the sweep
axis, the tridiagonal system built from the mask/BC state
(step/cartesian.implicit_sweep).  The XLA reference path materializes
a, b, c, d and the Thomas cp/dp recurrences through HBM (~20 memory passes
per sweep); this kernel fuses coefficient construction + forward elimination
+ back substitution into a single pass:

  * inputs per cell: rhs (4B), Robin coeff (4B), and a 3-bit mask code
    (int8: 1 = coupled to i-1, 2 = coupled to i+1, 4 = Dirichlet-pinned);
  * a/b/c are built in registers per line position: ``a = -tg*low``,
    ``c = -tg*high``, ``b = 1 + tg*(low+high) + dt*coeff`` (void rows have no
    couplings and zero coeff, so b = 1 and d = rhs carries through — identity
    rows for free);
  * dp lives in VMEM scratch; cp is staged in the OUTPUT block during the
    forward pass and overwritten by x on the way back, so the whole solve
    fits the 16 MB VMEM budget with double-buffered blocks at n = 512;
  * Neumann sources and Dirichlet values, when present, are folded into the
    rhs by a fused XLA prepass (kernel stays 4-input);
  * HBM traffic: read rhs+coeff+code (9B), write x (4B) ~= 13B/cell/sweep.

Layout: arrays are (n, B1, B2) with the solve axis leading; per-position
slices are (B1, B2) = (8, 128) sublane x lane tiles.  y/z sweeps move their
axis to the front (XLA transpose) before the call; the mask codes are
precomputed per axis in the transposed layout (they only change on birth
events).  Mosaic note: int8 vector shifts don't legalize — bits are tested
with compares on int32.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["sweep_code", "fused_sweep", "fused_sweep_axis0",
           "fused_sweep_axis0_v2", "fused_sweep_axis1_v2",
           "fused_sweep_axis2_v2",
           "fused_sweep_const", "fused_cyclic_const",
           "fused_cyclic_const_nat", "fused_cyclic_phi"]

_LOW, _HIGH, _PIN, _INMASK = np.int8(1), np.int8(2), np.int8(4), np.int8(8)


def sweep_code(mask: jax.Array, dir_mask: jax.Array | None, axis: int, *,
               stencil_bits: bool = False) -> jax.Array:
    """int8 per-cell sweep code for ``axis``, in the (axis-first) layout.

    Bits: 1 = coupling to the i-1 neighbor, 2 = coupling to i+1,
    4 = Dirichlet-pinned row, 8 = cell is in-mask.  Built once per mask
    change (birth event).  Bit 8 lets the "plan-lite" kernels derive the
    scalar-h Robin coefficient entirely from the code — the number of
    exposed faces along the sweep axis is ``(2 - low - high)`` for in-mask
    cells (bc/packs.build_coeff_packs semantics; reference
    adi3d_numba_coeff.py:93-99) — so no coefficient field is streamed.
    Pinned rows carry ONLY bit 4 (their Robin sink is folded away, matching
    the field path's ``coeff = where(pin, 0, coeff)``).

    ``stencil_bits`` (axis-0 codes only): also pack the OTHER two axes'
    neighbor couplings — bits 16/32 = coupling to the (axis+1)∓1 neighbor,
    bits 64/128 = coupling to the (axis+2)∓1 neighbor — so the fused
    theta+sweep kernel (solvers/pallas_theta_sweep.py) derives every
    mask-aware Laplacian term of the explicit pass from this one byte, with
    no mask array or code halos streamed.  Bit 128 is the int8 sign bit:
    the byte is assembled in uint8 and bitcast (kernels sign-extend to
    int32, where ``& 128`` still isolates the bit).  Consumers of the plain
    4-bit code ignore the high bits."""
    from ..bc.faces import shift_in

    mask = mask.astype(bool)
    low = mask & shift_in(mask, axis, -1, fill=False)
    high = mask & shift_in(mask, axis, +1, fill=False)
    if stencil_bits:
        u8 = jnp.uint8
        code = (low.astype(u8) * u8(1) | high.astype(u8) * u8(2)
                | mask.astype(u8) * u8(8))
        for nth, bit_lo, bit_hi in (((axis + 1) % 3, 16, 32),
                                    ((axis + 2) % 3, 64, 128)):
            nlo = mask & shift_in(mask, nth, -1, fill=False)
            nhi = mask & shift_in(mask, nth, +1, fill=False)
            code = code | nlo.astype(u8) * u8(bit_lo) \
                | nhi.astype(u8) * u8(bit_hi)
        if dir_mask is not None:
            pin = dir_mask.astype(bool) & mask
            code = jnp.where(pin, u8(4), code)
        code = jax.lax.bitcast_convert_type(code, jnp.int8)
        return jnp.moveaxis(code, axis, 0)
    code = ((low.astype(jnp.int8) * _LOW) | (high.astype(jnp.int8) * _HIGH)
            | (mask.astype(jnp.int8) * _INMASK))
    if dir_mask is not None:
        pin = dir_mask.astype(bool) & mask
        code = jnp.where(pin, _PIN, code)  # pinned rows have no couplings
    return jnp.moveaxis(code, axis, 0)


def _sweep_kernel(scal_ref, d_ref, code_ref, coeff_ref, out_ref, dp_ref, *, n):
    """scal_ref: SMEM (4,) = [theta_gam, dt, t_inf, unused].

    Forward stages cp into out_ref; backward overwrites it with x."""
    tg = scal_ref[0]
    dt = scal_ref[1]
    t_inf = scal_ref[2]
    f32 = d_ref.dtype

    def coeffs_at(i):
        code = code_ref[i].astype(jnp.int32)
        one = jnp.ones((), f32)
        zero_s = jnp.zeros((), f32)
        low = jnp.where((code & 1) > 0, one, zero_s)
        high = jnp.where((code & 2) > 0, one, zero_s)
        pin = jnp.where((code & 4) > 0, one, zero_s)
        cf = coeff_ref[i]
        a = -tg * low
        c = -tg * high
        b = 1.0 + tg * (low + high) + dt * cf
        b = b * (1.0 - pin) + pin  # pinned rows: identity
        d = d_ref[i] + dt * cf * t_inf
        return a, b, c, d

    def fwd(i, carry):
        cp_prev, dp_prev = carry
        a, b, c, d = coeffs_at(i)
        inv = 1.0 / (b - a * cp_prev)
        cp = c * inv
        dp = (d - a * dp_prev) * inv
        out_ref[i] = cp
        dp_ref[i] = dp
        return cp, dp

    zero = jnp.zeros(d_ref.shape[1:], f32)
    lax.fori_loop(0, n, fwd, (zero, zero))

    def bwd(j, x_next):
        i = n - 1 - j
        x = dp_ref[i] - out_ref[i] * x_next
        out_ref[i] = x
        return x

    lax.fori_loop(0, n, bwd, zero)


def _sweep_kernel_axis1(scal_ref, d_ref, code_ref, coeff_ref, out_ref,
                        dp_ref, *, n):
    """Same solve as _sweep_kernel, but the line runs along axis 1 of
    (B1, n, B2) blocks, letting the y-sweep run on the natural (x, y, z)
    layout with no transposes (and the z-sweep with only a last-two-dims
    swap).  Mosaic only allows sublane-dim ref indices that are multiples of
    8, so the recurrence processes GROUPS of 8 line positions: each group is
    loaded/stored as a (B1, 8, B2) ref slice and the 8 sequential updates
    index the loaded values (register level, unconstrained)."""
    tg = scal_ref[0]
    dt = scal_ref[1]
    t_inf = scal_ref[2]
    f32 = d_ref.dtype
    b1 = d_ref.shape[0]
    b2 = d_ref.shape[2]
    G = 8
    n_grp = n // G  # n is padded to a multiple of 8 by the wrapper

    one = jnp.ones((), f32)
    zero_s = jnp.zeros((), f32)

    def fwd(g, carry):
        cp_prev, dp_prev = carry
        s = pl.multiple_of(g * G, G)
        code_g = code_ref[:, pl.ds(s, G), :].astype(jnp.int32)
        cf_g = coeff_ref[:, pl.ds(s, G), :]
        d_g = d_ref[:, pl.ds(s, G), :]
        low = jnp.where((code_g & 1) > 0, one, zero_s)
        high = jnp.where((code_g & 2) > 0, one, zero_s)
        pin = jnp.where((code_g & 4) > 0, one, zero_s)
        # one group swapaxes makes the row slices free leading-dim views
        # (measured 38% faster than per-row sublane extracts)
        a_g = jnp.swapaxes(-tg * low, 0, 1)
        c_g = jnp.swapaxes(-tg * high, 0, 1)
        b_g = jnp.swapaxes(
            (1.0 + tg * (low + high) + dt * cf_g) * (1.0 - pin) + pin, 0, 1)
        dd_g = jnp.swapaxes(d_g + dt * cf_g * t_inf, 0, 1)

        cps, dps = [], []
        for r in range(G):
            inv = 1.0 / (b_g[r] - a_g[r] * cp_prev)
            cp_prev = c_g[r] * inv
            dp_prev = (dd_g[r] - a_g[r] * dp_prev) * inv
            cps.append(cp_prev)
            dps.append(dp_prev)
        out_ref[:, pl.ds(s, G), :] = jnp.swapaxes(jnp.stack(cps), 0, 1)
        dp_ref[:, pl.ds(s, G), :] = jnp.swapaxes(jnp.stack(dps), 0, 1)
        return cp_prev, dp_prev

    zero = jnp.zeros((b1, b2), f32)
    lax.fori_loop(0, n_grp, fwd, (zero, zero))

    def bwd(j, x_next):
        g = n_grp - 1 - j
        s = pl.multiple_of(g * G, G)
        cp_g = jnp.swapaxes(out_ref[:, pl.ds(s, G), :], 0, 1)
        dp_g = jnp.swapaxes(dp_ref[:, pl.ds(s, G), :], 0, 1)
        xs = [None] * G
        for r in range(G - 1, -1, -1):
            x_next = dp_g[r] - cp_g[r] * x_next
            xs[r] = x_next
        out_ref[:, pl.ds(s, G), :] = jnp.swapaxes(jnp.stack(xs), 0, 1)
        return x_next

    lax.fori_loop(0, n_grp, bwd, zero)


@functools.partial(jax.jit, static_argnames=("interpret", "block_b1", "block_b2"))
def fused_sweep_axis1(rhs, code, coeff, theta_gam, dt, t_inf,
                      qflux=None, dir_val=None, *, interpret: bool = False,
                      block_b1: int = 8, block_b2: int = 128):
    """Fused masked tridiagonal sweep along axis 1 of (B1, n, B2) arrays —
    same math as fused_sweep_axis0, transpose-free layout."""
    b1, n, b2 = rhs.shape
    dtype = rhs.dtype

    if qflux is not None:
        rhs = rhs + jnp.asarray(dt, dtype) * qflux
    if dir_val is not None:
        pin = (code & _PIN) > 0
        rhs = jnp.where(pin, dir_val, rhs)
        coeff = jnp.where(pin, 0.0, coeff)

    p1 = _round_up(b1, block_b1) - b1
    p2 = _round_up(b2, block_b2) - b2
    pn = _round_up(n, 8) - n  # kernel processes groups of 8 line positions
    if p1 or p2 or pn:
        pad = ((0, p1), (0, pn), (0, p2))
        rhs = jnp.pad(rhs, pad)
        code = jnp.pad(code, pad)  # padded positions: identity rows
        coeff = jnp.pad(coeff, pad)
    P1, P2 = rhs.shape[0], rhs.shape[2]
    n_pad = rhs.shape[1]

    scal = jnp.stack([jnp.asarray(theta_gam, dtype), jnp.asarray(dt, dtype),
                      jnp.asarray(t_inf, dtype), jnp.zeros((), dtype)])

    grid = (P1 // block_b1, P2 // block_b2)
    blk = (block_b1, n_pad, block_b2)
    vspec = pl.BlockSpec(blk, lambda i, j: (i, 0, j), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_sweep_kernel_axis1, n=n_pad),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), vspec, vspec, vspec],
        out_specs=vspec,
        out_shape=jax.ShapeDtypeStruct((P1, n_pad, P2), dtype),
        scratch_shapes=[pltpu.VMEM(blk, dtype)],
        interpret=interpret,
    )(scal, rhs, code, coeff)

    if p1 or p2 or pn:
        out = out[:b1, :n, :b2]
    return out


def _round_up(v, m):
    return -(-v // m) * m


def _v2_body(kern, *, stochastic: bool, mixed: bool, lite: bool):
    """Positional-ref adapter for the chunked-DMA kernels: maps the
    pallas_call ref list (which omits seed/coeff/fbuf/obuf refs depending on
    the mode) onto the full kernel signature."""
    def body(*refs):
        it = iter(refs)
        scal = next(it)
        seed = next(it) if stochastic else None
        d = next(it)
        c = next(it)
        f = None if lite else next(it)
        o = next(it)
        xb, dp, db, cb = next(it), next(it), next(it), next(it)
        fb = None if lite else next(it)
        ob = next(it) if mixed else None
        isem, osem = next(it), next(it)
        return kern(scal, seed, d, c, f, o, xb, dp, db, cb, fb, ob,
                    isem, osem)
    return body


@functools.partial(jax.jit, static_argnames=("interpret", "block_b1", "block_b2"))
def fused_sweep_axis0(rhs, code, coeff, theta_gam, dt, t_inf,
                      qflux=None, dir_val=None, *, interpret: bool = False,
                      block_b1: int = 8, block_b2: int = 128):
    """Fused masked tridiagonal sweep along axis 0 of (n, B1, B2) arrays."""
    n, b1, b2 = rhs.shape
    dtype = rhs.dtype

    # Fold optional Neumann source / Dirichlet values into rhs and coeff so
    # the kernel itself is always 4-input (one fused elementwise XLA pass).
    if qflux is not None:
        rhs = rhs + jnp.asarray(dt, dtype) * qflux
    if dir_val is not None:
        pin = (code & _PIN) > 0
        rhs = jnp.where(pin, dir_val, rhs)
        coeff = jnp.where(pin, 0.0, coeff)

    p1 = _round_up(b1, block_b1) - b1
    p2 = _round_up(b2, block_b2) - b2
    if p1 or p2:
        pad = ((0, 0), (0, p1), (0, p2))
        rhs = jnp.pad(rhs, pad)
        code = jnp.pad(code, pad)  # padded cells: code 0, coeff 0 -> identity
        coeff = jnp.pad(coeff, pad)
    P1, P2 = rhs.shape[1], rhs.shape[2]

    scal = jnp.stack([jnp.asarray(theta_gam, dtype), jnp.asarray(dt, dtype),
                      jnp.asarray(t_inf, dtype), jnp.zeros((), dtype)])

    grid = (P1 // block_b1, P2 // block_b2)
    blk = (n, block_b1, block_b2)
    idx = lambda i, j: (0, i, j)
    vspec = pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_sweep_kernel, n=n),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars
            vspec,                                   # rhs/d
            pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM),  # code (int8)
            vspec,                                   # coeff
        ],
        out_specs=vspec,
        out_shape=jax.ShapeDtypeStruct((n, P1, P2), dtype),
        scratch_shapes=[
            pltpu.VMEM((n, block_b1, block_b2), dtype),  # dp
        ],
        interpret=interpret,
    )(scal, rhs, code, coeff)

    if p1 or p2:
        out = out[:, :b1, :b2]
    return out


def _sweep_kernel_v2(scal_ref, seed_ref, d_hbm, code_hbm, coeff_hbm,
                     out_hbm, xbuf, dpbuf, dbuf, cbuf, fbuf, obuf, in_sem,
                     out_sem, *, n, cn, b1, b2, grp_rows=8, has_pin=True):
    """Chunked-DMA fused sweep along axis 0 (the bandwidth-tuned variant).

    Inputs stay in HBM; chunks of ``cn`` line positions are double-buffered
    into VMEM so only the cp/dp line buffers scale with n — the batch tile
    can widen to (8, 256), doubling both the DMA burst length and the
    independent lanes hiding the divide latency of the Thomas recurrence.
    cp is staged in ``xbuf`` and overwritten by x on the backward pass, which
    streams finished chunks back to HBM chunk-by-chunk (overlapping the
    remaining back-substitution).

    bf16 mode: when the HBM dtype is narrower than the compute dtype
    (xbuf.dtype), inputs are upcast per chunk and finished output chunks are
    downcast into the small ``obuf`` staging ring before their DMA — state
    traffic halves while the whole solve runs at f32.

    Plan-lite mode (``coeff_hbm is None``): the Robin coefficient is derived
    in-registers from the code's in-mask bit as ``rob_c * (2 - low - high)``
    with ``rob_c = scal[3]`` — the scalar-h flagship configuration needs no
    coefficient field at all, cutting the sweep to 9 B/cell."""
    tg = scal_ref[0]
    dt = scal_ref[1]
    t_inf = scal_ref[2]
    f32 = xbuf.dtype                 # compute dtype
    mixed = obuf is not None         # HBM dtype narrower than compute dtype
    stochastic = seed_ref is not None
    lite = coeff_hbm is None         # derive Robin coeff from the code bits
    i = pl.program_id(0)
    j = pl.program_id(1)
    r0 = i * b1
    c0 = j * b2
    nchunks = n // cn
    if stochastic:
        # decorrelate tiles; unbiased rounding kills the sub-quantum update
        # dropout of round-to-nearest in bf16 mode
        pltpu.prng_seed(seed_ref[0] + i * pl.num_programs(1) + j)

    def in_dmas(slot, k, r0=r0, c0=c0):
        s = k * cn
        src = lambda ref: ref.at[pl.ds(s, cn), pl.ds(r0, b1), pl.ds(c0, b2)]
        dmas = (
            pltpu.make_async_copy(src(d_hbm), dbuf.at[slot], in_sem.at[slot, 0]),
            pltpu.make_async_copy(src(code_hbm), cbuf.at[slot], in_sem.at[slot, 1]),
        )
        if not lite:
            dmas += (pltpu.make_async_copy(src(coeff_hbm), fbuf.at[slot],
                                           in_sem.at[slot, 2]),)
        return dmas

    def out_dma(k):
        s = k * cn
        src = obuf.at[k % 2] if mixed else xbuf.at[pl.ds(s, cn)]
        return pltpu.make_async_copy(
            src,
            out_hbm.at[pl.ds(s, cn), pl.ds(r0, b1), pl.ds(c0, b2)],
            out_sem.at[k])

    for dma in in_dmas(0, 0):
        dma.start()
    if nchunks > 1:
        for dma in in_dmas(1, 1):
            dma.start()

    one = jnp.ones((), f32)
    zero_s = jnp.zeros((), f32)
    zero = jnp.zeros((b1, b2), f32)
    G = grp_rows  # rows per iteration: bulk coefficient build + reg. chain
    carry = (zero, zero)
    for k in range(nchunks):
        slot = k % 2
        for dma in in_dmas(slot, k):
            dma.wait()

        def grp(g, carry, *, slot=slot, base=k * cn):
            cp_prev, dp_prev = carry
            s = g * G
            code_g = cbuf[slot, pl.ds(s, G)].astype(jnp.int32)
            low = jnp.where((code_g & 1) > 0, one, zero_s)
            high = jnp.where((code_g & 2) > 0, one, zero_s)
            if lite:
                inm = jnp.where((code_g & 8) > 0, one, zero_s)
                cf_g = scal_ref[3] * ((2.0 - low - high) * inm)
            else:
                cf_g = fbuf[slot, pl.ds(s, G)].astype(f32)
            a_g = -tg * low
            c_g = -tg * high
            dtcf = dt * cf_g
            b_g = 1.0 + tg * (low + high) + dtcf
            if has_pin:  # static: skipped when the code carries no pin bits
                pin = jnp.where((code_g & 4) > 0, one, zero_s)
                b_g = b_g * (1.0 - pin) + pin
            dd_g = dbuf[slot, pl.ds(s, G)].astype(f32) + dtcf * t_inf
            cps, dps = [], []
            for r in range(G):
                inv = 1.0 / (b_g[r] - a_g[r] * cp_prev)
                cp_prev = c_g[r] * inv
                dp_prev = (dd_g[r] - a_g[r] * dp_prev) * inv
                cps.append(cp_prev)
                dps.append(dp_prev)
            xbuf[pl.ds(base + s, G)] = jnp.stack(cps)
            dpbuf[pl.ds(base + s, G)] = jnp.stack(dps)
            return cp_prev, dp_prev

        carry = lax.fori_loop(0, cn // G, grp, carry)
        if k + 2 < nchunks:
            for dma in in_dmas(slot, k + 2):
                dma.start()

    x_next = zero
    for k in range(nchunks - 1, -1, -1):
        base = k * cn

        def grp_b(gg, x_next, *, base=base):
            s = (cn // G - 1 - gg) * G
            cp_g = xbuf[pl.ds(base + s, G)]
            dp_g = dpbuf[pl.ds(base + s, G)]
            xs = [None] * G
            for r in range(G - 1, -1, -1):
                x_next = dp_g[r] - cp_g[r] * x_next
                xs[r] = x_next
            xbuf[pl.ds(base + s, G)] = jnp.stack(xs)
            return x_next

        x_next = lax.fori_loop(0, cn // G, grp_b, x_next)
        if mixed:
            if k + 2 < nchunks:
                out_dma(k + 2).wait()   # staging slot free?
            xk = xbuf[pl.ds(base, cn)]
            if stochastic:
                bits = pltpu.bitcast(pltpu.prng_random_bits(xk.shape),
                                     jnp.uint32)
                obuf[k % 2] = pltpu.stochastic_round(xk, bits,
                                                     target_dtype=obuf.dtype)
            else:
                obuf[k % 2] = xk.astype(obuf.dtype)
        out_dma(k).start()

    for k in range(min(nchunks, 2) if mixed else nchunks):
        out_dma(k).wait()


def _sweep_kernel_v2t(scal_ref, seed_ref, d_hbm, code_hbm, coeff_hbm,
                      out_hbm, xbuf, dpbuf, dbuf, cbuf, fbuf, obuf, in_sem,
                      out_sem, *, n, cn, b1, b2, grp_rows=8, has_pin=True):
    """Twisted (two-sided) elimination variant of _sweep_kernel_v2.

    Factorizes from BOTH ends toward the middle m = n/2: the top half runs
    the standard downward recurrence (x_i = dp_i - cp_i x_{i+1}), the bottom
    half the mirrored upward one (x_i = ep_i - fp_i x_{i-1}).  The two chains
    are data-independent, so interleaving them in the register loop doubles
    the ILP hiding the divide latency of the sequential Thomas chain — the
    dominant cost of the one-sided kernel (NOTES.md lever #2).  At the
    junction the two relations for rows m-1/m give a closed 2x2 solve:

        x_m = (ep_m - fp_m dp_{m-1}) / (1 - fp_m cp_{m-1})

    after which back-substitution proceeds outward in both directions, again
    interleaved.  Chunks are streamed in PAIRS (k, nchunks-1-k), four DMA
    slots instead of two; finished output chunks stream back middle-out.
    Requires nchunks even (wrapper pads; padded rows are identity rows).
    Identical math to one-sided Thomas in exact arithmetic; rounding differs
    by ulps (different accumulation order)."""
    tg = scal_ref[0]
    dt = scal_ref[1]
    t_inf = scal_ref[2]
    f32 = xbuf.dtype
    mixed = obuf is not None
    stochastic = seed_ref is not None
    lite = coeff_hbm is None
    i = pl.program_id(0)
    j = pl.program_id(1)
    r0 = i * b1
    c0 = j * b2
    nchunks = n // cn
    npairs = nchunks // 2
    if stochastic:
        pltpu.prng_seed(seed_ref[0] + i * pl.num_programs(1) + j)

    def in_dmas(slot, k):
        s = k * cn
        src = lambda ref: ref.at[pl.ds(s, cn), pl.ds(r0, b1), pl.ds(c0, b2)]
        dmas = (
            pltpu.make_async_copy(src(d_hbm), dbuf.at[slot], in_sem.at[slot, 0]),
            pltpu.make_async_copy(src(code_hbm), cbuf.at[slot], in_sem.at[slot, 1]),
        )
        if not lite:
            dmas += (pltpu.make_async_copy(src(coeff_hbm), fbuf.at[slot],
                                           in_sem.at[slot, 2]),)
        return dmas

    def pair_dmas(p):
        st = 2 * (p % 2)
        return in_dmas(st, p) + in_dmas(st + 1, nchunks - 1 - p)

    def out_dma(k, oslot=None):
        s = k * cn
        src = xbuf.at[pl.ds(s, cn)] if oslot is None else obuf.at[oslot]
        return pltpu.make_async_copy(
            src,
            out_hbm.at[pl.ds(s, cn), pl.ds(r0, b1), pl.ds(c0, b2)],
            out_sem.at[k])

    for dma in pair_dmas(0):
        dma.start()
    if npairs > 1:
        for dma in pair_dmas(1):
            dma.start()

    one = jnp.ones((), f32)
    zero_s = jnp.zeros((), f32)
    zero = jnp.zeros((b1, b2), f32)
    G = grp_rows

    def decode(slot, s):
        code_g = cbuf[slot, pl.ds(s, G)].astype(jnp.int32)
        low = jnp.where((code_g & 1) > 0, one, zero_s)
        high = jnp.where((code_g & 2) > 0, one, zero_s)
        if lite:
            inm = jnp.where((code_g & 8) > 0, one, zero_s)
            cf_g = scal_ref[3] * ((2.0 - low - high) * inm)
        else:
            cf_g = fbuf[slot, pl.ds(s, G)].astype(f32)
        a_g = -tg * low
        c_g = -tg * high
        dtcf = dt * cf_g
        b_g = 1.0 + tg * (low + high) + dtcf
        if has_pin:  # static: skipped when the code carries no pin bits
            pin = jnp.where((code_g & 4) > 0, one, zero_s)
            b_g = b_g * (1.0 - pin) + pin
        dd_g = dbuf[slot, pl.ds(s, G)].astype(f32) + dtcf * t_inf
        return a_g, b_g, c_g, dd_g

    carry = (zero, zero, zero, zero)   # cp, dp (top) / fp, ep (bottom)
    for p in range(npairs):
        st = 2 * (p % 2)
        for dma in pair_dmas(p):
            dma.wait()

        def grp(g, carry, *, st=st, tbase=p * cn,
                bbase=(nchunks - 1 - p) * cn):
            cp_prev, dp_prev, fp_prev, ep_prev = carry
            s_t = g * G
            s_b = cn - (g + 1) * G      # bottom chunk consumed high-to-low
            at_, bt_, ct_, ddt_ = decode(st, s_t)
            ab_, bb_, cb_, ddb_ = decode(st + 1, s_b)
            cps, dps, fps, eps = [], [], [], []
            for r in range(G):
                rb = G - 1 - r
                # top chain (downward elimination) ...
                invt = 1.0 / (bt_[r] - at_[r] * cp_prev)
                cp_prev = ct_[r] * invt
                dp_prev = (ddt_[r] - at_[r] * dp_prev) * invt
                # ... interleaved with the independent bottom chain (upward)
                invb = 1.0 / (bb_[rb] - cb_[rb] * fp_prev)
                fp_prev = ab_[rb] * invb
                ep_prev = (ddb_[rb] - cb_[rb] * ep_prev) * invb
                cps.append(cp_prev)
                dps.append(dp_prev)
                fps.append(fp_prev)
                eps.append(ep_prev)
            xbuf[pl.ds(tbase + s_t, G)] = jnp.stack(cps)
            dpbuf[pl.ds(tbase + s_t, G)] = jnp.stack(dps)
            xbuf[pl.ds(bbase + s_b, G)] = jnp.stack(fps[::-1])
            dpbuf[pl.ds(bbase + s_b, G)] = jnp.stack(eps[::-1])
            return cp_prev, dp_prev, fp_prev, ep_prev

        carry = lax.fori_loop(0, cn // G, grp, carry)
        if p + 2 < npairs:
            for dma in pair_dmas(p + 2):
                dma.start()

    cp_m1, dp_m1, fp_m, ep_m = carry
    x_m = (ep_m - fp_m * dp_m1) / (1.0 - fp_m * cp_m1)
    x_next = x_m                    # top backward enters row m-1 with x_m
    x_prev = dp_m1 - cp_m1 * x_m    # = x_{m-1}; bottom backward re-derives
    #                                 x_m = ep_m - fp_m x_{m-1} consistently

    for p in range(npairs - 1, -1, -1):
        tbase = p * cn
        kb = nchunks - 1 - p
        bbase = kb * cn

        def grp_b(gg, carry, *, tbase=tbase, bbase=bbase):
            x_next, x_prev = carry
            s_t = (cn // G - 1 - gg) * G
            s_b = gg * G
            cp_g = xbuf[pl.ds(tbase + s_t, G)]
            dp_g = dpbuf[pl.ds(tbase + s_t, G)]
            fp_g = xbuf[pl.ds(bbase + s_b, G)]
            ep_g = dpbuf[pl.ds(bbase + s_b, G)]
            xs_t = [None] * G
            xs_b = [None] * G
            for r in range(G - 1, -1, -1):
                rb = G - 1 - r
                x_next = dp_g[r] - cp_g[r] * x_next
                xs_t[r] = x_next
                x_prev = ep_g[rb] - fp_g[rb] * x_prev
                xs_b[rb] = x_prev
            xbuf[pl.ds(tbase + s_t, G)] = jnp.stack(xs_t)
            xbuf[pl.ds(bbase + s_b, G)] = jnp.stack(xs_b)
            return x_next, x_prev

        x_next, x_prev = lax.fori_loop(0, cn // G, grp_b, (x_next, x_prev))
        if mixed:
            ot = 2 * (p % 2)
            if p + 2 < npairs:          # staging slots free?
                out_dma(p + 2, ot).wait()
                out_dma(nchunks - 3 - p, ot + 1).wait()
            xk_t = xbuf[pl.ds(tbase, cn)]
            xk_b = xbuf[pl.ds(bbase, cn)]
            if stochastic:
                bits = pltpu.bitcast(pltpu.prng_random_bits(xk_t.shape),
                                     jnp.uint32)
                obuf[ot] = pltpu.stochastic_round(xk_t, bits,
                                                  target_dtype=obuf.dtype)
                bits = pltpu.bitcast(pltpu.prng_random_bits(xk_b.shape),
                                     jnp.uint32)
                obuf[ot + 1] = pltpu.stochastic_round(xk_b, bits,
                                                      target_dtype=obuf.dtype)
            else:
                obuf[ot] = xk_t.astype(obuf.dtype)
                obuf[ot + 1] = xk_b.astype(obuf.dtype)
            out_dma(p, ot).start()
            out_dma(kb, ot + 1).start()
        else:
            out_dma(p).start()
            out_dma(kb).start()

    if mixed:
        for p in range(min(npairs, 2)):
            out_dma(p, 2 * (p % 2)).wait()
            out_dma(nchunks - 1 - p, 2 * (p % 2) + 1).wait()
    else:
        for k in range(nchunks):
            out_dma(k).wait()


@functools.partial(jax.jit, static_argnames=("interpret", "block_b1",
                                             "block_b2", "chunk",
                                             "grp_rows", "twisted"))
def fused_sweep_axis0_v2(rhs, code, coeff, theta_gam, dt, t_inf,
                         qflux=None, dir_val=None, rng_seed=None, rob_c=None,
                         *, interpret: bool = False,
                         block_b1: int = 8, block_b2: int | None = None,
                         chunk: int = 64, grp_rows: int = 8,
                         twisted: bool | None = None):
    """Bandwidth-tuned fused masked sweep along axis 0 of (n, B1, B2) arrays.

    Same math as fused_sweep_axis0; inputs are streamed from HBM in
    double-buffered chunks so VMEM holds only the cp/dp line buffers at the
    (wider) batch tile.  bfloat16 inputs solve at float32 internally and
    store bfloat16 (half the HBM traffic).

    ``twisted``: two-sided elimination (see _sweep_kernel_v2t) — halves the
    sequential chain length by running two independent recurrences; default
    picks it whenever the line is long enough to pair chunks.

    Plan-lite mode: pass ``coeff=None`` and the scalar ``rob_c`` =
    ``h/(rho cp dx)`` [1/s per exposed face]; the kernel derives the Robin
    coefficient from the code's in-mask bit — no coefficient field is
    streamed (9 B/cell instead of 13).  The code must carry bit 8
    (sweep_code sets it)."""
    n, b1, b2 = rhs.shape
    dtype = rhs.dtype
    lite = coeff is None
    if lite and rob_c is None:
        raise ValueError("plan-lite sweep (coeff=None) requires rob_c")

    if qflux is not None:
        rhs = rhs + jnp.asarray(dt, dtype) * qflux
    if dir_val is not None:
        pin = (code & _PIN) > 0
        rhs = jnp.where(pin, dir_val, rhs)
        if not lite:   # lite: pinned rows carry no in-mask bit -> coeff 0
            coeff = jnp.where(pin, 0.0, coeff)

    if block_b2 is None:
        # keep xbuf+dpbuf (2 * n_pad * 8 * B2 * itemsize) within ~10 MB,
        # and prefer the tile that pads the lane dimension least (a (8,256)
        # tile on b2 = 576 would pad to 768: +33% wasted work)
        cands = [c for c in (256, 128) if n <= 640 or c == 128]
        block_b2 = min(cands, key=lambda c: (_round_up(b2, c), -c))
    cn = min(chunk, _round_up(n, 8))
    if twisted is None:
        # Measured on v5e at 512^3: twisted is neutral-to-slightly-negative
        # at f32 (4.54 vs 4.40 ms — the kernel is not divide-latency bound)
        # but wins in the bf16 bandwidth mode (3.44 vs 3.60 ms), so it is
        # the default only for mixed-precision states.
        twisted = (jnp.promote_types(dtype, jnp.float32) != dtype
                   and _round_up(n, 8) >= 2 * grp_rows)
    if twisted:
        # pairing needs an EVEN chunk count; pick the chunk size (multiples
        # of the row group, up to `chunk`) that minimizes padded rows,
        # largest winning ties
        cands = range(grp_rows, cn + 1, grp_rows)
        cn = min(cands, key=lambda c: (_round_up(n, 2 * c), -c))
        pn = _round_up(n, 2 * cn) - n
    else:
        pn = _round_up(n, cn) - n
    p1 = _round_up(b1, block_b1) - b1
    p2 = _round_up(b2, block_b2) - b2
    if p1 or p2 or pn:
        pad = ((0, pn), (0, p1), (0, p2))
        rhs = jnp.pad(rhs, pad)
        code = jnp.pad(code, pad)  # padded rows: identity, x = 0
        if not lite:
            coeff = jnp.pad(coeff, pad)
    n_pad, P1, P2 = rhs.shape

    cdt = jnp.promote_types(dtype, jnp.float32)   # solve precision
    mixed = cdt != dtype
    scal = jnp.stack([jnp.asarray(theta_gam, cdt), jnp.asarray(dt, cdt),
                      jnp.asarray(t_inf, cdt),
                      jnp.asarray(0.0 if rob_c is None else rob_c, cdt)])

    grid = (P1 // block_b1, P2 // block_b2)
    hbm = pl.BlockSpec(memory_space=pl.ANY)

    # twisted pairing is only possible with >= 2 chunks after padding
    twisted = twisted and n_pad // cn >= 2
    stochastic = mixed and rng_seed is not None
    kern_fn = _sweep_kernel_v2t if twisted else _sweep_kernel_v2
    nslots = 4 if twisted else 2    # chunk pairs need twice the DMA slots
    kern = functools.partial(kern_fn, n=n_pad, cn=cn, b1=block_b1,
                             b2=block_b2, grp_rows=grp_rows,
                             has_pin=dir_val is not None)
    scratch = [
        pltpu.VMEM((n_pad, block_b1, block_b2), cdt),          # x / cp
        pltpu.VMEM((n_pad, block_b1, block_b2), cdt),          # dp
        pltpu.VMEM((nslots, cn, block_b1, block_b2), dtype),   # rhs chunks
        pltpu.VMEM((nslots, cn, block_b1, block_b2), jnp.int8),  # code chunks
    ]
    if not lite:
        scratch.append(
            pltpu.VMEM((nslots, cn, block_b1, block_b2), dtype))  # coeff
    if mixed:
        scratch.append(
            pltpu.VMEM((nslots, cn, block_b1, block_b2), dtype))  # obuf
    body = _v2_body(kern, stochastic=stochastic, mixed=mixed, lite=lite)
    scratch += [pltpu.SemaphoreType.DMA((nslots, 3)),
                pltpu.SemaphoreType.DMA((n_pad // cn,))]

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    inputs = [scal]
    if stochastic:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(jnp.asarray(rng_seed, jnp.int32).reshape(1))
    in_specs += [hbm, hbm]
    inputs += [rhs, code]
    if not lite:
        in_specs.append(hbm)
        inputs.append(coeff)

    out = pl.pallas_call(
        body,
        grid=grid,
        in_specs=in_specs,
        out_specs=hbm,
        out_shape=jax.ShapeDtypeStruct((n_pad, P1, P2), dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)

    if p1 or p2 or pn:
        out = out[:n, :b1, :b2]
    return out


def _sweep_kernel_z2(scal_ref, d_hbm, code_hbm, out_hbm, xbuf, dpbuf,
                     tbuf, wbuf, cbuf, obuf, in_sem, out_sem, *,
                     n, cn, b1, b2, grp_rows=8, has_pin=True):
    """Chunked-DMA fused sweep along the LAST axis of a NATURAL-layout
    (B1, B2, n) rhs — the z sweep without the step-level transpose pair.

    The round-3 trace (BASELINE.md:95-101) showed the 512^3 const-prop step
    spending 3.22 ms (24%) in the XLA z-transpose pair around the axis-0
    kernel.  This kernel reads the rhs in its natural layout — HBM slices
    (b1, b2, cn) with both tiled dims aligned — and relays each chunk to
    the solve layout IN VMEM: per sublane row, one 2-D (b2, cn) -> (cn, b2)
    transpose (Mosaic's transpose unit), then the solve's group reads use a
    cheap dim-0/1 swap.  The backward pass restages finished chunks through
    the same relayout before their output DMA, so the solution is written
    in natural layout too.  The sweep CODE is precomputed per axis in the
    z-leading layout (build_sweep_plan), so it streams without relayout.
    Traffic: read rhs + code, write x = 9 B/cell (plan-lite) with ZERO
    step-level transposes.

    bf16 states widen at the relayout, narrow on the restage (the
    STOCHASTIC bf16 mode keeps the transposed axis-0 path — no PRNG
    stores here)."""
    tg = scal_ref[0]
    dt = scal_ref[1]
    t_inf = scal_ref[2]
    f32 = xbuf.dtype
    i = pl.program_id(0)
    j = pl.program_id(1)
    r0 = i * b1
    c0 = j * b2
    nchunks = n // cn

    def in_dmas(slot, k):
        s = k * cn
        return (
            pltpu.make_async_copy(
                d_hbm.at[pl.ds(r0, b1), pl.ds(c0, b2), pl.ds(s, cn)],
                tbuf.at[slot], in_sem.at[slot, 0]),
            pltpu.make_async_copy(
                code_hbm.at[pl.ds(s, cn), pl.ds(r0, b1), pl.ds(c0, b2)],
                cbuf.at[slot], in_sem.at[slot, 1]),
        )

    def out_dma(k):
        return pltpu.make_async_copy(
            obuf.at[k % 2],
            out_hbm.at[pl.ds(r0, b1), pl.ds(c0, b2), pl.ds(k * cn, cn)],
            out_sem.at[k])

    for dma in in_dmas(0, 0):
        dma.start()
    if nchunks > 1:
        for dma in in_dmas(1, 1):
            dma.start()

    one = jnp.ones((), f32)
    zero_s = jnp.zeros((), f32)
    zero = jnp.zeros((b1, b2), f32)
    G = grp_rows
    carry = (zero, zero)
    for k in range(nchunks):
        slot = k % 2
        for dma in in_dmas(slot, k):
            dma.wait()
        # chunk relayout (b1, b2, cn) -> (b1, cn, b2): b1 independent 2-D
        # lane<->sublane transposes (static python loop — b1 is 8)
        for r in range(b1):
            # cast BEFORE the 2-D transpose: the transpose unit's f32 path
            # is the chip-gated one; bf16 states widen here (znat bf16)
            wbuf[r] = jnp.transpose(tbuf[slot][r].astype(f32), (1, 0))

        def grp(g, carry, *, slot=slot, base=k * cn):
            cp_prev, dp_prev = carry
            s = g * G
            code_g = cbuf[slot, pl.ds(s, G)].astype(jnp.int32)
            low = jnp.where((code_g & 1) > 0, one, zero_s)
            high = jnp.where((code_g & 2) > 0, one, zero_s)
            inm = jnp.where((code_g & 8) > 0, one, zero_s)
            cf_g = scal_ref[3] * ((2.0 - low - high) * inm)
            a_g = -tg * low
            c_g = -tg * high
            dtcf = dt * cf_g
            b_g = 1.0 + tg * (low + high) + dtcf
            if has_pin:
                pin = jnp.where((code_g & 4) > 0, one, zero_s)
                b_g = b_g * (1.0 - pin) + pin
            # (b1, G, b2) group view of the relaid chunk -> (G, b1, b2)
            dd_g = (jnp.swapaxes(wbuf[:, pl.ds(s, G)], 0, 1)
                    + dtcf * t_inf)
            cps, dps = [], []
            for r in range(G):
                inv = 1.0 / (b_g[r] - a_g[r] * cp_prev)
                cp_prev = c_g[r] * inv
                dp_prev = (dd_g[r] - a_g[r] * dp_prev) * inv
                cps.append(cp_prev)
                dps.append(dp_prev)
            xbuf[pl.ds(base + s, G)] = jnp.stack(cps)
            dpbuf[pl.ds(base + s, G)] = jnp.stack(dps)
            return cp_prev, dp_prev

        carry = lax.fori_loop(0, cn // G, grp, carry)
        if k + 2 < nchunks:
            for dma in in_dmas(slot, k + 2):
                dma.start()

    x_next = zero
    for k in range(nchunks - 1, -1, -1):
        base = k * cn

        def grp_b(gg, x_next, *, base=base):
            s = (cn // G - 1 - gg) * G
            cp_g = xbuf[pl.ds(base + s, G)]
            dp_g = dpbuf[pl.ds(base + s, G)]
            xs = [None] * G
            for r in range(G - 1, -1, -1):
                x_next = dp_g[r] - cp_g[r] * x_next
                xs[r] = x_next
            xbuf[pl.ds(base + s, G)] = jnp.stack(xs)
            return x_next

        x_next = lax.fori_loop(0, cn // G, grp_b, x_next)
        if k + 2 < nchunks:
            out_dma(k + 2).wait()          # staging slot free?
        # restage (cn, b1, b2) -> natural (b1, b2, cn) via the same 2-D
        # transposes (dim-0/1 swap first is free-ish; per-row transpose)
        xk = jnp.swapaxes(xbuf[pl.ds(base, cn)], 0, 1)   # (b1, cn, b2)
        for r in range(b1):
            obuf[k % 2, r] = jnp.transpose(xk[r], (1, 0)).astype(obuf.dtype)
        out_dma(k).start()

    for k in range(min(nchunks, 2)):
        out_dma(k).wait()


def fused_sweep_axis2_v2(rhs, code, theta_gam, dt, t_inf, rob_c,
                         *, interpret: bool = False,
                         block_b1: int = 8, block_b2: int | None = None,
                         chunk: int = 128, grp_rows: int = 8,
                         has_pin: bool = True):
    """Natural-layout z sweep: solve along the LAST axis of the (B1, B2, n)
    rhs, writing the solution in the same layout — replaces the
    ``transpose -> fused_sweep_axis0_v2 -> transpose`` chain and its
    16 B/cell of pure layout traffic (see _sweep_kernel_z2).

    Plan-lite only (scalar-h Robin: ``rob_c = h/(rho cp dz)``); ``code``
    comes from the plan's axis-2 entry, ALREADY in the (z, x, y) layout.
    bf16 states widen to f32 at the in-kernel relayout and narrow on the
    output restage (round-to-nearest; the stochastic bf16 mode keeps the
    transposed axis-0 path — this kernel has no PRNG stores)."""
    b1f, b2f, n = rhs.shape
    dtype = rhs.dtype

    if block_b2 is None:
        cands = [c for c in (256, 128) if n <= 640 or c == 128]
        block_b2 = min(cands, key=lambda c: (_round_up(b2f, c), -c))
    # chunk slices the LANE dim of the natural rhs -> must stay 128-aligned
    # (sub-tile lane slices fail Mosaic DMA legalization)
    cn = max(128, min(_round_up(chunk, 128), _round_up(n, 128)))
    pn = _round_up(n, cn) - n
    p1 = _round_up(b1f, block_b1) - b1f
    p2 = _round_up(b2f, block_b2) - b2f
    if p1 or p2 or pn:
        rhs = jnp.pad(rhs, ((0, p1), (0, p2), (0, pn)))
        code = jnp.pad(code, ((0, pn), (0, p1), (0, p2)))
    P1, P2, n_pad = rhs.shape

    cdt = jnp.promote_types(dtype, jnp.float32)   # f64 on CPU/x64 paths
    scal = jnp.stack([jnp.asarray(theta_gam, cdt), jnp.asarray(dt, cdt),
                      jnp.asarray(t_inf, cdt), jnp.asarray(rob_c, cdt)])
    grid = (P1 // block_b1, P2 // block_b2)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    kern = functools.partial(_sweep_kernel_z2, n=n_pad, cn=cn, b1=block_b1,
                             b2=block_b2, grp_rows=grp_rows, has_pin=has_pin)
    scratch = [
        pltpu.VMEM((n_pad, block_b1, block_b2), cdt),       # x / cp
        pltpu.VMEM((n_pad, block_b1, block_b2), cdt),       # dp
        pltpu.VMEM((2, block_b1, block_b2, cn), dtype),     # rhs in (nat)
        pltpu.VMEM((block_b1, cn, block_b2), cdt),          # relaid chunk
        pltpu.VMEM((2, cn, block_b1, block_b2), jnp.int8),  # code chunks
        pltpu.VMEM((2, block_b1, block_b2, cn), dtype),     # out stage (nat)
        pltpu.SemaphoreType.DMA((2, 2)),
        pltpu.SemaphoreType.DMA((n_pad // cn,)),
    ]

    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), hbm, hbm],
        out_specs=hbm,
        out_shape=jax.ShapeDtypeStruct((P1, P2, n_pad), dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(scal, rhs, code)

    if p1 or p2 or pn:
        out = out[:b1f, :b2f, :n]
    return out


def _sweep_kernel_axis1_v2(scal_ref, seed_ref, d_hbm, code_hbm, coeff_hbm,
                           out_hbm, xbuf, dpbuf, dbuf, cbuf, fbuf, obuf,
                           in_sem, out_sem, *, n, cn, b1, b2, has_pin=True):
    """Chunked-DMA fused sweep along axis 1 of (B1, n, B2) arrays — the
    y-sweep on the natural (x, y, z) layout, no transposes.  Same streaming
    scheme as _sweep_kernel_v2; the line dimension is the sublane dim, so
    rows are processed in groups of 8 (register-level indexing inside each
    loaded (b1, 8, b2) group, as in _sweep_kernel_axis1).

    Layout notes (measured at 512^3): decoding AFTER one swap of the raw
    code/rhs group (2-3 shuffles instead of swapping each derived
    coefficient, 4) is ~0.8 ms faster; keeping the cp/dp scratch line-major
    to eliminate the group-store swaps entirely is ~1.2 ms SLOWER (the
    per-chunk (cn, b1, b2) output restage lowers much worse than the small
    per-group swaps) — rejected."""
    tg = scal_ref[0]
    dt = scal_ref[1]
    t_inf = scal_ref[2]
    f32 = xbuf.dtype
    mixed = obuf is not None
    stochastic = seed_ref is not None
    lite = coeff_hbm is None
    i = pl.program_id(0)
    j = pl.program_id(1)
    r0 = i * b1
    c0 = j * b2
    nchunks = n // cn
    G = 8
    if stochastic:
        pltpu.prng_seed(seed_ref[0] + i * pl.num_programs(1) + j)

    def in_dmas(slot, k):
        s = k * cn
        src = lambda ref: ref.at[pl.ds(r0, b1), pl.ds(s, cn), pl.ds(c0, b2)]
        dmas = (
            pltpu.make_async_copy(src(d_hbm), dbuf.at[slot], in_sem.at[slot, 0]),
            pltpu.make_async_copy(src(code_hbm), cbuf.at[slot], in_sem.at[slot, 1]),
        )
        if not lite:
            dmas += (pltpu.make_async_copy(src(coeff_hbm), fbuf.at[slot],
                                           in_sem.at[slot, 2]),)
        return dmas

    def out_dma(k):
        s = k * cn
        src = obuf.at[k % 2] if mixed else xbuf.at[:, pl.ds(s, cn), :]
        return pltpu.make_async_copy(
            src,
            out_hbm.at[pl.ds(r0, b1), pl.ds(s, cn), pl.ds(c0, b2)],
            out_sem.at[k])

    for dma in in_dmas(0, 0):
        dma.start()
    if nchunks > 1:
        for dma in in_dmas(1, 1):
            dma.start()

    one = jnp.ones((), f32)
    zero_s = jnp.zeros((), f32)
    zero = jnp.zeros((b1, b2), f32)
    carry = (zero, zero)
    for k in range(nchunks):
        slot = k % 2
        for dma in in_dmas(slot, k):
            dma.wait()

        def grp(g, carry, *, slot=slot, base=k * cn):
            cp_prev, dp_prev = carry
            s = pl.multiple_of(g * G, G)
            # swap the RAW inputs to (G, b1, b2) once and decode in that
            # layout: the row slices of every derived array are then free
            # leading-dim views with only 2-3 shuffles per group instead of
            # the 4 of swapping each derived coefficient (elementwise decode
            # is layout-independent, so this is bitwise identical)
            code_g = jnp.swapaxes(
                cbuf[slot, :, pl.ds(s, G), :].astype(jnp.int32), 0, 1)
            low = jnp.where((code_g & 1) > 0, one, zero_s)
            high = jnp.where((code_g & 2) > 0, one, zero_s)
            if lite:
                inm = jnp.where((code_g & 8) > 0, one, zero_s)
                cf_g = scal_ref[3] * ((2.0 - low - high) * inm)
            else:
                cf_g = jnp.swapaxes(
                    fbuf[slot, :, pl.ds(s, G), :].astype(f32), 0, 1)
            a_g = -tg * low
            c_g = -tg * high
            dtcf = dt * cf_g
            b_g = 1.0 + tg * (low + high) + dtcf
            if has_pin:  # static: skipped when the code carries no pin bits
                pin = jnp.where((code_g & 4) > 0, one, zero_s)
                b_g = b_g * (1.0 - pin) + pin
            dd_g = (jnp.swapaxes(dbuf[slot, :, pl.ds(s, G), :], 0, 1)
                    .astype(f32) + dtcf * t_inf)
            cps, dps = [], []
            for r in range(G):
                inv = 1.0 / (b_g[r] - a_g[r] * cp_prev)
                cp_prev = c_g[r] * inv
                dp_prev = (dd_g[r] - a_g[r] * dp_prev) * inv
                cps.append(cp_prev)
                dps.append(dp_prev)
            xbuf[:, pl.ds(base + s, G), :] = jnp.swapaxes(jnp.stack(cps), 0, 1)
            dpbuf[:, pl.ds(base + s, G), :] = jnp.swapaxes(jnp.stack(dps), 0, 1)
            return cp_prev, dp_prev

        carry = lax.fori_loop(0, cn // G, grp, carry)
        if k + 2 < nchunks:
            for dma in in_dmas(slot, k + 2):
                dma.start()

    x_next = zero
    for k in range(nchunks - 1, -1, -1):
        base = k * cn

        def grp_b(gg, x_next, *, base=base):
            s = pl.multiple_of((cn // G - 1 - gg) * G, G)
            cp_g = jnp.swapaxes(xbuf[:, pl.ds(base + s, G), :], 0, 1)
            dp_g = jnp.swapaxes(dpbuf[:, pl.ds(base + s, G), :], 0, 1)
            xs = [None] * G
            for r in range(G - 1, -1, -1):
                x_next = dp_g[r] - cp_g[r] * x_next
                xs[r] = x_next
            xbuf[:, pl.ds(base + s, G), :] = jnp.swapaxes(jnp.stack(xs), 0, 1)
            return x_next

        x_next = lax.fori_loop(0, cn // G, grp_b, x_next)
        if mixed:
            if k + 2 < nchunks:
                out_dma(k + 2).wait()   # staging slot free?
            xk = xbuf[:, pl.ds(base, cn), :]
            if stochastic:
                bits = pltpu.bitcast(pltpu.prng_random_bits(xk.shape),
                                     jnp.uint32)
                obuf[k % 2] = pltpu.stochastic_round(xk, bits,
                                                     target_dtype=obuf.dtype)
            else:
                obuf[k % 2] = xk.astype(obuf.dtype)
        out_dma(k).start()

    for k in range(min(nchunks, 2) if mixed else nchunks):
        out_dma(k).wait()


def _sweep_kernel_axis1_v2t(scal_ref, seed_ref, d_hbm, code_hbm, coeff_hbm,
                            out_hbm, xbuf, dpbuf, dbuf, cbuf, fbuf, obuf,
                            in_sem, out_sem, *, n, cn, b1, b2, has_pin=True):
    """Twisted (two-sided) elimination variant of _sweep_kernel_axis1_v2 —
    the bf16 lever for the y-sweep (VERDICT r2 #5).

    Identical pairing/junction scheme to _sweep_kernel_v2t (chunks streamed
    in pairs (k, nchunks-1-k), top chain eliminates downward, bottom chain
    upward, closed 2x2 solve at the middle, back-substitution outward both
    ways) applied to the axis-1 layout: the line runs along the sublane
    dimension, so rows are processed in groups of 8 with one swapaxes per
    loaded group as in the one-sided axis-1 kernel.  Interleaving the two
    independent recurrences doubles the ILP hiding the serial divide
    latency.  Requires an even chunk count (wrapper pads; padded rows are
    identity).  Same math as one-sided Thomas; rounding differs by ulps."""
    tg = scal_ref[0]
    dt = scal_ref[1]
    t_inf = scal_ref[2]
    f32 = xbuf.dtype
    mixed = obuf is not None
    stochastic = seed_ref is not None
    lite = coeff_hbm is None
    i = pl.program_id(0)
    j = pl.program_id(1)
    r0 = i * b1
    c0 = j * b2
    nchunks = n // cn
    npairs = nchunks // 2
    G = 8
    if stochastic:
        pltpu.prng_seed(seed_ref[0] + i * pl.num_programs(1) + j)

    def in_dmas(slot, k):
        s = k * cn
        src = lambda ref: ref.at[pl.ds(r0, b1), pl.ds(s, cn), pl.ds(c0, b2)]
        dmas = (
            pltpu.make_async_copy(src(d_hbm), dbuf.at[slot], in_sem.at[slot, 0]),
            pltpu.make_async_copy(src(code_hbm), cbuf.at[slot], in_sem.at[slot, 1]),
        )
        if not lite:
            dmas += (pltpu.make_async_copy(src(coeff_hbm), fbuf.at[slot],
                                           in_sem.at[slot, 2]),)
        return dmas

    def pair_dmas(p):
        st = 2 * (p % 2)
        return in_dmas(st, p) + in_dmas(st + 1, nchunks - 1 - p)

    def out_dma(k, oslot=None):
        s = k * cn
        src = (xbuf.at[:, pl.ds(s, cn), :] if oslot is None
               else obuf.at[oslot])
        return pltpu.make_async_copy(
            src,
            out_hbm.at[pl.ds(r0, b1), pl.ds(s, cn), pl.ds(c0, b2)],
            out_sem.at[k])

    for dma in pair_dmas(0):
        dma.start()
    if npairs > 1:
        for dma in pair_dmas(1):
            dma.start()

    one = jnp.ones((), f32)
    zero_s = jnp.zeros((), f32)
    zero = jnp.zeros((b1, b2), f32)

    def decode(slot, s):
        # swap the RAW group once and decode in (G, b1, b2) layout — see
        # _sweep_kernel_axis1_v2's layout notes
        code_g = jnp.swapaxes(
            cbuf[slot, :, pl.ds(s, G), :].astype(jnp.int32), 0, 1)
        low = jnp.where((code_g & 1) > 0, one, zero_s)
        high = jnp.where((code_g & 2) > 0, one, zero_s)
        if lite:
            inm = jnp.where((code_g & 8) > 0, one, zero_s)
            cf_g = scal_ref[3] * ((2.0 - low - high) * inm)
        else:
            cf_g = jnp.swapaxes(
                fbuf[slot, :, pl.ds(s, G), :].astype(f32), 0, 1)
        a_g = -tg * low
        c_g = -tg * high
        dtcf = dt * cf_g
        b_g = 1.0 + tg * (low + high) + dtcf
        if has_pin:
            pin = jnp.where((code_g & 4) > 0, one, zero_s)
            b_g = b_g * (1.0 - pin) + pin
        dd_g = (jnp.swapaxes(dbuf[slot, :, pl.ds(s, G), :], 0, 1)
                .astype(f32) + dtcf * t_inf)
        return a_g, b_g, c_g, dd_g

    carry = (zero, zero, zero, zero)   # cp, dp (top) / fp, ep (bottom)
    for p in range(npairs):
        st = 2 * (p % 2)
        for dma in pair_dmas(p):
            dma.wait()

        def grp(g, carry, *, st=st, tbase=p * cn,
                bbase=(nchunks - 1 - p) * cn):
            cp_prev, dp_prev, fp_prev, ep_prev = carry
            s_t = pl.multiple_of(g * G, G)
            s_b = pl.multiple_of(cn - (g + 1) * G, G)
            at_, bt_, ct_, ddt_ = decode(st, s_t)
            ab_, bb_, cb_, ddb_ = decode(st + 1, s_b)
            cps, dps, fps, eps = [], [], [], []
            for r in range(G):
                rb = G - 1 - r
                # top chain (downward elimination) ...
                invt = 1.0 / (bt_[r] - at_[r] * cp_prev)
                cp_prev = ct_[r] * invt
                dp_prev = (ddt_[r] - at_[r] * dp_prev) * invt
                # ... interleaved with the independent bottom chain (upward)
                invb = 1.0 / (bb_[rb] - cb_[rb] * fp_prev)
                fp_prev = ab_[rb] * invb
                ep_prev = (ddb_[rb] - cb_[rb] * ep_prev) * invb
                cps.append(cp_prev)
                dps.append(dp_prev)
                fps.append(fp_prev)
                eps.append(ep_prev)
            xbuf[:, pl.ds(tbase + s_t, G), :] = \
                jnp.swapaxes(jnp.stack(cps), 0, 1)
            dpbuf[:, pl.ds(tbase + s_t, G), :] = \
                jnp.swapaxes(jnp.stack(dps), 0, 1)
            xbuf[:, pl.ds(bbase + s_b, G), :] = \
                jnp.swapaxes(jnp.stack(fps[::-1]), 0, 1)
            dpbuf[:, pl.ds(bbase + s_b, G), :] = \
                jnp.swapaxes(jnp.stack(eps[::-1]), 0, 1)
            return cp_prev, dp_prev, fp_prev, ep_prev

        carry = lax.fori_loop(0, cn // G, grp, carry)
        if p + 2 < npairs:
            for dma in pair_dmas(p + 2):
                dma.start()

    cp_m1, dp_m1, fp_m, ep_m = carry
    x_m = (ep_m - fp_m * dp_m1) / (1.0 - fp_m * cp_m1)
    x_next = x_m                    # top backward enters row m-1 with x_m
    x_prev = dp_m1 - cp_m1 * x_m    # = x_{m-1}; bottom backward re-derives
    #                                 x_m = ep_m - fp_m x_{m-1} consistently

    for p in range(npairs - 1, -1, -1):
        tbase = p * cn
        kb = nchunks - 1 - p
        bbase = kb * cn

        def grp_b(gg, carry, *, tbase=tbase, bbase=bbase):
            x_next, x_prev = carry
            s_t = pl.multiple_of((cn // G - 1 - gg) * G, G)
            s_b = pl.multiple_of(gg * G, G)
            cp_g = jnp.swapaxes(xbuf[:, pl.ds(tbase + s_t, G), :], 0, 1)
            dp_g = jnp.swapaxes(dpbuf[:, pl.ds(tbase + s_t, G), :], 0, 1)
            fp_g = jnp.swapaxes(xbuf[:, pl.ds(bbase + s_b, G), :], 0, 1)
            ep_g = jnp.swapaxes(dpbuf[:, pl.ds(bbase + s_b, G), :], 0, 1)
            xs_t = [None] * G
            xs_b = [None] * G
            for r in range(G - 1, -1, -1):
                rb = G - 1 - r
                x_next = dp_g[r] - cp_g[r] * x_next
                xs_t[r] = x_next
                x_prev = ep_g[rb] - fp_g[rb] * x_prev
                xs_b[rb] = x_prev
            xbuf[:, pl.ds(tbase + s_t, G), :] = \
                jnp.swapaxes(jnp.stack(xs_t), 0, 1)
            xbuf[:, pl.ds(bbase + s_b, G), :] = \
                jnp.swapaxes(jnp.stack(xs_b), 0, 1)
            return x_next, x_prev

        x_next, x_prev = lax.fori_loop(0, cn // G, grp_b, (x_next, x_prev))
        if mixed:
            ot = 2 * (p % 2)
            if p + 2 < npairs:          # staging slots free?
                out_dma(p + 2, ot).wait()
                out_dma(nchunks - 3 - p, ot + 1).wait()
            xk_t = xbuf[:, pl.ds(tbase, cn), :]
            xk_b = xbuf[:, pl.ds(bbase, cn), :]
            if stochastic:
                bits = pltpu.bitcast(pltpu.prng_random_bits(xk_t.shape),
                                     jnp.uint32)
                obuf[ot] = pltpu.stochastic_round(xk_t, bits,
                                                  target_dtype=obuf.dtype)
                bits = pltpu.bitcast(pltpu.prng_random_bits(xk_b.shape),
                                     jnp.uint32)
                obuf[ot + 1] = pltpu.stochastic_round(xk_b, bits,
                                                      target_dtype=obuf.dtype)
            else:
                obuf[ot] = xk_t.astype(obuf.dtype)
                obuf[ot + 1] = xk_b.astype(obuf.dtype)
            out_dma(p, ot).start()
            out_dma(kb, ot + 1).start()
        else:
            out_dma(p).start()
            out_dma(kb).start()

    if mixed:
        for p in range(min(npairs, 2)):
            out_dma(p, 2 * (p % 2)).wait()
            out_dma(nchunks - 1 - p, 2 * (p % 2) + 1).wait()
    else:
        for k in range(nchunks):
            out_dma(k).wait()


@functools.partial(jax.jit, static_argnames=("interpret", "block_b1",
                                             "block_b2", "chunk", "twisted"))
def fused_sweep_axis1_v2(rhs, code, coeff, theta_gam, dt, t_inf,
                         qflux=None, dir_val=None, rng_seed=None, rob_c=None,
                         *, interpret: bool = False,
                         block_b1: int = 8, block_b2: int | None = None,
                         chunk: int = 64, twisted: bool | None = None):
    """Bandwidth-tuned fused masked sweep along axis 1 of (B1, n, B2) arrays
    (transpose-free y-sweep; same math as fused_sweep_axis1).

    Plan-lite: pass ``coeff=None`` + scalar ``rob_c`` (see
    fused_sweep_axis0_v2).

    ``twisted``: two-sided elimination (_sweep_kernel_axis1_v2t) — default
    matches axis 0: on for mixed-precision (bf16) states only, where the
    halved serial chain is a measured win."""
    b1, n, b2 = rhs.shape
    dtype = rhs.dtype
    lite = coeff is None
    if lite and rob_c is None:
        raise ValueError("plan-lite sweep (coeff=None) requires rob_c")

    if qflux is not None:
        rhs = rhs + jnp.asarray(dt, dtype) * qflux
    if dir_val is not None:
        pin = (code & _PIN) > 0
        rhs = jnp.where(pin, dir_val, rhs)
        if not lite:
            coeff = jnp.where(pin, 0.0, coeff)

    if block_b2 is None:
        cands = [c for c in (256, 128) if n <= 640 or c == 128]
        block_b2 = min(cands, key=lambda c: (_round_up(b2, c), -c))
    cn = min(chunk, _round_up(n, 8))
    G = 8
    if twisted is None:
        twisted = (jnp.promote_types(dtype, jnp.float32) != dtype
                   and _round_up(n, 8) >= 2 * G)
    if twisted:
        # pairing needs an EVEN chunk count; pick the chunk size (multiples
        # of the row group, up to `chunk`) that minimizes padded rows,
        # largest winning ties
        cands = range(G, cn + 1, G)
        cn = min(cands, key=lambda c: (_round_up(n, 2 * c), -c))
        pn = _round_up(n, 2 * cn) - n
    else:
        pn = _round_up(n, cn) - n
    p1 = _round_up(b1, block_b1) - b1
    p2 = _round_up(b2, block_b2) - b2
    if p1 or p2 or pn:
        pad = ((0, p1), (0, pn), (0, p2))
        rhs = jnp.pad(rhs, pad)
        code = jnp.pad(code, pad)
        if not lite:
            coeff = jnp.pad(coeff, pad)
    P1, n_pad, P2 = rhs.shape

    cdt = jnp.promote_types(dtype, jnp.float32)
    mixed = cdt != dtype
    scal = jnp.stack([jnp.asarray(theta_gam, cdt), jnp.asarray(dt, cdt),
                      jnp.asarray(t_inf, cdt),
                      jnp.asarray(0.0 if rob_c is None else rob_c, cdt)])

    grid = (P1 // block_b1, P2 // block_b2)
    hbm = pl.BlockSpec(memory_space=pl.ANY)

    # twisted pairing is only possible with >= 2 chunks after padding
    twisted = twisted and n_pad // cn >= 2
    stochastic = mixed and rng_seed is not None
    kern_fn = _sweep_kernel_axis1_v2t if twisted else _sweep_kernel_axis1_v2
    nslots = 4 if twisted else 2    # chunk pairs need twice the DMA slots
    kern = functools.partial(kern_fn, n=n_pad, cn=cn,
                             b1=block_b1, b2=block_b2,
                             has_pin=dir_val is not None)
    scratch = [
        pltpu.VMEM((block_b1, n_pad, block_b2), cdt),          # x / cp
        pltpu.VMEM((block_b1, n_pad, block_b2), cdt),          # dp
        pltpu.VMEM((nslots, block_b1, cn, block_b2), dtype),   # rhs chunks
        pltpu.VMEM((nslots, block_b1, cn, block_b2), jnp.int8),  # code chunks
    ]
    if not lite:
        scratch.append(
            pltpu.VMEM((nslots, block_b1, cn, block_b2), dtype))  # coeff
    if mixed:
        scratch.append(
            pltpu.VMEM((nslots, block_b1, cn, block_b2), dtype))  # obuf
    body = _v2_body(kern, stochastic=stochastic, mixed=mixed, lite=lite)
    scratch += [pltpu.SemaphoreType.DMA((nslots, 3)),
                pltpu.SemaphoreType.DMA((n_pad // cn,))]

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    inputs = [scal]
    if stochastic:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(jnp.asarray(rng_seed, jnp.int32).reshape(1))
    in_specs += [hbm, hbm]
    inputs += [rhs, code]
    if not lite:
        in_specs.append(hbm)
        inputs.append(coeff)

    out = pl.pallas_call(
        body,
        grid=grid,
        in_specs=in_specs,
        out_specs=hbm,
        out_shape=jax.ShapeDtypeStruct((P1, n_pad, P2), dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)

    if p1 or p2 or pn:
        out = out[:b1, :n, :b2]
    return out


def _const_sweep_kernel(a_ref, b_ref, c_ref, radd_ref, d_ref, out_ref,
                        dp_ref, *, n):
    """Tridiagonal solve with per-row SCALAR coefficients (SMEM vectors) —
    the cylindrical core's r/z sweeps, where the matrix depends only on the
    line position (radius/row) and the Robin ghost terms are already folded
    into a/b/c and the per-row RHS addition ``radd``.

    Forward stages cp in out_ref; backward overwrites with x.
    HBM traffic: read rhs (4B) + write x (4B) = 8B/cell/sweep."""
    f32 = d_ref.dtype

    def fwd(i, carry):
        cp_prev, dp_prev = carry
        a = a_ref[i]
        inv = 1.0 / (b_ref[i] - a * cp_prev)
        cp = c_ref[i] * inv
        dp = (d_ref[i] + radd_ref[i] - a * dp_prev) * inv
        out_ref[i] = cp
        dp_ref[i] = dp
        return cp, dp

    zero = jnp.zeros(d_ref.shape[1:], f32)
    lax.fori_loop(0, n, fwd, (zero, zero))

    def bwd(j, x_next):
        i = n - 1 - j
        x = dp_ref[i] - out_ref[i] * x_next
        out_ref[i] = x
        return x

    lax.fori_loop(0, n, bwd, zero)


def _const_sweep_kernel_nat(a_ref, b_ref, c_ref, radd_ref, d_ref, out_ref,
                            wbuf, zbuf, dp_ref, *, n):
    """Natural-layout variant of _const_sweep_kernel: the rhs block is
    (b1, b2, n) — the z solve without its step-level moveaxis pair.  The
    block is relaid in VMEM (b1 independent 2-D lane<->sublane transposes
    into (b1, n, b2), then one cheap dim-0/1 swap to the solve layout) and
    the solution is restaged back the same way (chip-gated relayout
    pattern, scripts/znat_chip.py)."""
    f32 = zbuf.dtype
    b1 = d_ref.shape[0]

    for r in range(b1):
        # (b2, n) -> (n, b2)
        wbuf[r] = jnp.transpose(d_ref[r], (1, 0)).astype(f32)
    zbuf[...] = jnp.swapaxes(wbuf[...], 0, 1)          # (n, b1, b2)

    def fwd(i, carry):
        cp_prev, dp_prev = carry
        a = a_ref[i]
        inv = 1.0 / (b_ref[i] - a * cp_prev)
        cp = c_ref[i] * inv
        dp = (zbuf[i] + radd_ref[i] - a * dp_prev) * inv
        zbuf[i] = cp
        dp_ref[i] = dp
        return cp, dp

    zero = jnp.zeros(zbuf.shape[1:], f32)
    lax.fori_loop(0, n, fwd, (zero, zero))

    def bwd(j, x_next):
        i = n - 1 - j
        x = dp_ref[i] - zbuf[i] * x_next
        zbuf[i] = x
        return x

    lax.fori_loop(0, n, bwd, zero)
    wbuf[...] = jnp.swapaxes(zbuf[...], 0, 1)          # (b1, n, b2)
    for r in range(b1):
        # natural (b2, n)
        out_ref[r] = jnp.transpose(wbuf[r], (1, 0)).astype(out_ref.dtype)


def _adaptive_b2(n, b2, bufs, itemsize=4, budget=64 * 1024 * 1024):
    """Lane tile minimizing padding over legal multiples of 128, preferring
    the largest whose estimated VMEM residency (``bufs`` revolving/scratch
    line buffers of (n, 8, cand)) fits the budget."""
    cands = [c for c in (512, 384, 256, 128)
             if bufs * n * 8 * c * itemsize <= budget]
    if not cands:
        return 128
    return min(cands, key=lambda c: (_round_up(b2, c), -c))


@functools.partial(jax.jit, static_argnames=("interpret", "block_b1",
                                             "block_b2", "nat_rhs_out"))
def fused_sweep_const(rhs, a, b, c, radd=None, *, interpret: bool = False,
                      block_b1: int = 8, block_b2: int | None = None,
                      nat_rhs_out: bool = False):
    """Tridiagonal sweep along axis 0 of (n, B1, B2) rhs with per-row scalar
    coefficient vectors a, b, c (shape (n,)) and optional per-row RHS
    additions ``radd``.

    nat_rhs_out: rhs passed — and solution returned — in the NATURAL
    (B1, B2, n) layout (in-VMEM relayout; no step-level transpose pair).

    block_b2=None: ADAPTIVE lane tile — minimize padding over
    (512, 384, 256, 128) under a VMEM budget, preferring the largest
    (chip A/B at (128,512,512): the r sweep ran 0.88/0.49/0.38 ms at
    128/256/512 — the fixed 128 default was a 2.3x cliff)."""
    if nat_rhs_out:
        if block_b2 is None:
            block_b2 = 128        # natural-block geometry: own tuning
        b1, b2, n = rhs.shape
        dtype = rhs.dtype
        if radd is None:
            radd = jnp.zeros((n,), dtype)
        p1 = _round_up(b1, block_b1) - b1
        p2 = _round_up(b2, block_b2) - b2
        pn = _round_up(n, 128) - n     # lane dim of the natural block
        if p1 or p2 or pn:
            rhs = jnp.pad(rhs, ((0, p1), (0, p2), (0, pn)))
            # padded rows: a = c = 0, b = 1 -> identities
            a = jnp.pad(a, (0, pn))
            c = jnp.pad(c, (0, pn))
            b = jnp.pad(b, (0, pn), constant_values=1.0)
            radd = jnp.pad(radd, (0, pn))
        P1, P2, n_pad = rhs.shape
        grid = (P1 // block_b1, P2 // block_b2)
        blk = (block_b1, block_b2, n_pad)
        vspec = pl.BlockSpec(blk, lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM)
        sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
        cdt = jnp.promote_types(dtype, jnp.float32)
        out = pl.pallas_call(
            functools.partial(_const_sweep_kernel_nat, n=n_pad),
            grid=grid,
            in_specs=[sspec, sspec, sspec, sspec, vspec],
            out_specs=vspec,
            out_shape=jax.ShapeDtypeStruct((P1, P2, n_pad), dtype),
            scratch_shapes=[
                pltpu.VMEM((block_b1, n_pad, block_b2), cdt),
                pltpu.VMEM((n_pad, block_b1, block_b2), cdt),
                pltpu.VMEM((n_pad, block_b1, block_b2), cdt),
            ],
            interpret=interpret,
        )(a.astype(dtype), b.astype(dtype), c.astype(dtype),
          radd.astype(dtype), rhs)
        if p1 or p2 or pn:
            out = out[:b1, :b2, :n]
        return out
    n, b1, b2 = rhs.shape
    dtype = rhs.dtype
    if radd is None:
        radd = jnp.zeros((n,), dtype)
    if block_b2 is None:
        # in + out (pipeline-revolving, ~2x each) + dp scratch
        block_b2 = _adaptive_b2(n, b2, 5)

    p1 = _round_up(b1, block_b1) - b1
    p2 = _round_up(b2, block_b2) - b2
    if p1 or p2:
        rhs = jnp.pad(rhs, ((0, 0), (0, p1), (0, p2)))
    P1, P2 = rhs.shape[1], rhs.shape[2]

    grid = (P1 // block_b1, P2 // block_b2)
    blk = (n, block_b1, block_b2)
    vspec = pl.BlockSpec(blk, lambda i, j: (0, i, j), memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)

    out = pl.pallas_call(
        functools.partial(_const_sweep_kernel, n=n),
        grid=grid,
        in_specs=[sspec, sspec, sspec, sspec, vspec],
        out_specs=vspec,
        out_shape=jax.ShapeDtypeStruct((n, P1, P2), dtype),
        scratch_shapes=[pltpu.VMEM((n, block_b1, block_b2), dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(a.astype(dtype), b.astype(dtype), c.astype(dtype), radd.astype(dtype),
      rhs)

    if p1 or p2:
        out = out[:, :b1, :b2]
    return out


def _cyclic_const_kernel(fac_ref, d_ref, out_ref, cp_ref, dpz_ref, *, n):
    """Periodic tridiagonal solve along axis 0 with per-SYSTEM constant
    coefficients ``a = c = -fac``, ``b = 1 + 2 fac`` (the periodic-phi
    implicit operator; fac varies over the batch only).  Sherman-Morrison:
    solve ``B y = d`` and ``B z = u`` with one shared cp recurrence, then
    ``x = y - z (y0 + beta y_{n-1}/gamma) / (1 + z0 + beta z_{n-1}/gamma)``
    with ``gamma = -b0``, wrap couplings alpha = beta = -fac.

    y is staged in out_ref; z in dpz scratch; cp in cp scratch.  HBM:
    read rhs (4B) + write x (4B) = 8 B/cell — replaces the XLA FFT path
    which is ~7x slower at (128, 512, 512).
    """
    f32 = d_ref.dtype
    fac = fac_ref[0]                     # (B1, B2)
    a = -fac
    b = 1.0 + 2.0 * fac
    gamma = -b
    b0_mod = 2.0 * b                     # b - gamma
    bn_mod = b - a * a / gamma           # b - alpha*beta/gamma

    def b_at(i):
        bi = jnp.where(i == 0, b0_mod, b)
        return jnp.where(i == n - 1, bn_mod, bi)

    def u_at(i):
        u = jnp.where(i == 0, gamma, jnp.zeros_like(gamma))
        return jnp.where(i == n - 1, a, u)

    def fwd(i, carry):
        cp_prev, dy_prev, dz_prev = carry
        a_i = jnp.where((i == 0), 0.0, a)       # a[0] unused (wrap via u)
        c_i = jnp.where(i == n - 1, 0.0, a)     # c = a (symmetric)
        inv = 1.0 / (b_at(i) - a_i * cp_prev)
        cp = c_i * inv
        dy = (d_ref[i] - a_i * dy_prev) * inv
        dz = (u_at(i) - a_i * dz_prev) * inv
        cp_ref[i] = cp
        out_ref[i] = dy
        dpz_ref[i] = dz
        return cp, dy, dz

    zero = jnp.zeros(d_ref.shape[1:], f32)
    lax.fori_loop(0, n, fwd, (zero, zero, zero))

    def bwd(j, carry):
        y_next, z_next = carry
        i = n - 1 - j
        cp = cp_ref[i]
        y = out_ref[i] - cp * y_next
        z = dpz_ref[i] - cp * z_next
        out_ref[i] = y
        dpz_ref[i] = z
        return y, z

    y0, z0 = lax.fori_loop(0, n, bwd, (zero, zero))
    # combine: x = y - fact * z  (beta = a, wrap from first to last row)
    yn = out_ref[n - 1]
    zn = dpz_ref[n - 1]
    fact = (y0 + a * yn / gamma) / (1.0 + z0 + a * zn / gamma)

    def fix(i, _):
        out_ref[i] = out_ref[i] - fact * dpz_ref[i]
        return 0

    lax.fori_loop(0, n, fix, 0)


@functools.partial(jax.jit, static_argnames=("interpret", "block_b1", "block_b2"))
def fused_cyclic_const(rhs, fac, *, interpret: bool = False,
                       block_b1: int = 8, block_b2: int | None = None):
    """Solve the periodic implicit operator ``(I - fac*L_per) x = rhs`` along
    axis 0 of (n, B1, B2) arrays, where ``L_per`` is the periodic second
    difference and ``fac`` is a per-system (B1, B2) field (e.g.
    ``theta*dt*alpha/(r^2 dphi^2)`` for the phi sweep).

    block_b2=None: adaptive lane tile (fused_sweep_const note)."""
    n, b1, b2 = rhs.shape
    dtype = rhs.dtype
    if block_b2 is None:
        # in + out (revolving) + cp + dpz scratch
        block_b2 = _adaptive_b2(n, b2, 6)
    p1 = _round_up(b1, block_b1) - b1
    p2 = _round_up(b2, block_b2) - b2
    if p1 or p2:
        rhs = jnp.pad(rhs, ((0, 0), (0, p1), (0, p2)))
        fac = jnp.pad(fac, ((0, p1), (0, p2)))
    P1, P2 = rhs.shape[1], rhs.shape[2]

    grid = (P1 // block_b1, P2 // block_b2)
    blk = (n, block_b1, block_b2)
    vspec = pl.BlockSpec(blk, lambda i, j: (0, i, j), memory_space=pltpu.VMEM)
    fspec = pl.BlockSpec((1, block_b1, block_b2), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_cyclic_const_kernel, n=n),
        grid=grid,
        in_specs=[fspec, vspec],
        out_specs=vspec,
        out_shape=jax.ShapeDtypeStruct((n, P1, P2), dtype),
        scratch_shapes=[pltpu.VMEM(blk, dtype), pltpu.VMEM(blk, dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(fac[None].astype(dtype), rhs)

    if p1 or p2:
        out = out[:, :b1, :b2]
    return out


def _cyclic_const_kernel_axis1(fac_ref, d_ref, out_ref, cp_ref, dpz_ref, *, n):
    """Axis-1 variant of _cyclic_const_kernel on (B1, n, B2) blocks: the phi
    sweep runs on the natural (r, phi, z) layout with no transposes.  Grouped
    sublane access as in _sweep_kernel_axis1 (n must be a multiple of 8)."""
    f32 = d_ref.dtype
    fac = fac_ref[:, 0, :]
    a = -fac
    b = 1.0 + 2.0 * fac
    gamma = -b
    b0_mod = 2.0 * b
    bn_mod = b - a * a / gamma
    G = 8
    n_grp = n // G
    zero = jnp.zeros(fac.shape, f32)

    def coeffs(i):
        bi = jnp.where(i == 0, b0_mod, b)
        bi = jnp.where(i == n - 1, bn_mod, bi)
        a_i = jnp.where(i == 0, 0.0, a)
        c_i = jnp.where(i == n - 1, 0.0, a)
        u_i = jnp.where(i == 0, gamma, jnp.where(i == n - 1, a, zero))
        return a_i, bi, c_i, u_i

    def fwd(g, carry):
        cp_prev, dy_prev, dz_prev = carry
        s = pl.multiple_of(g * G, G)
        # one group swapaxes -> free leading-dim row views (see
        # _sweep_kernel_axis1; measured far cheaper than sublane extracts)
        d_g = jnp.swapaxes(d_ref[:, pl.ds(s, G), :], 0, 1)
        cps, dys, dzs = [], [], []
        for r in range(G):
            i = s + r
            a_i, b_i, c_i, u_i = coeffs(i)
            inv = 1.0 / (b_i - a_i * cp_prev)
            cp_prev = c_i * inv
            dy_prev = (d_g[r] - a_i * dy_prev) * inv
            dz_prev = (u_i - a_i * dz_prev) * inv
            cps.append(cp_prev)
            dys.append(dy_prev)
            dzs.append(dz_prev)
        cp_ref[:, pl.ds(s, G), :] = jnp.swapaxes(jnp.stack(cps), 0, 1)
        out_ref[:, pl.ds(s, G), :] = jnp.swapaxes(jnp.stack(dys), 0, 1)
        dpz_ref[:, pl.ds(s, G), :] = jnp.swapaxes(jnp.stack(dzs), 0, 1)
        return cp_prev, dy_prev, dz_prev

    lax.fori_loop(0, n_grp, fwd, (zero, zero, zero))

    def bwd(j, carry):
        y_next, z_next = carry
        g = n_grp - 1 - j
        s = pl.multiple_of(g * G, G)
        cp_g = jnp.swapaxes(cp_ref[:, pl.ds(s, G), :], 0, 1)
        dy_g = jnp.swapaxes(out_ref[:, pl.ds(s, G), :], 0, 1)
        dz_g = jnp.swapaxes(dpz_ref[:, pl.ds(s, G), :], 0, 1)
        ys = [None] * G
        zs = [None] * G
        for r in range(G - 1, -1, -1):
            y_next = dy_g[r] - cp_g[r] * y_next
            z_next = dz_g[r] - cp_g[r] * z_next
            ys[r] = y_next
            zs[r] = z_next
        out_ref[:, pl.ds(s, G), :] = jnp.swapaxes(jnp.stack(ys), 0, 1)
        dpz_ref[:, pl.ds(s, G), :] = jnp.swapaxes(jnp.stack(zs), 0, 1)
        return y_next, z_next

    y0, z0 = lax.fori_loop(0, n_grp, bwd, (zero, zero))
    yn = out_ref[:, pl.ds(n - G, G), :][:, G - 1, :]
    zn = dpz_ref[:, pl.ds(n - G, G), :][:, G - 1, :]
    fact = (y0 + a * yn / gamma) / (1.0 + z0 + a * zn / gamma)

    def fix(g, _):
        s = pl.multiple_of(g * G, G)
        out_ref[:, pl.ds(s, G), :] = (out_ref[:, pl.ds(s, G), :]
                                      - fact[:, None, :]
                                      * dpz_ref[:, pl.ds(s, G), :])
        return 0

    lax.fori_loop(0, n_grp, fix, 0)


@functools.partial(jax.jit, static_argnames=("interpret", "block_b1", "block_b2"))
def fused_cyclic_const_axis1(rhs, fac, *, interpret: bool = False,
                             block_b1: int = 8, block_b2: int = 128):
    """Periodic constant-coefficient solve along axis 1 of (B1, n, B2)
    arrays; ``fac`` is (B1, B2).  Requires n % 8 == 0 (cyclic systems cannot
    be padded along the ring)."""
    b1, n, b2 = rhs.shape
    if n % 8:
        raise ValueError("axis-1 cyclic kernel requires n % 8 == 0")
    dtype = rhs.dtype
    p1 = _round_up(b1, block_b1) - b1
    p2 = _round_up(b2, block_b2) - b2
    if p1 or p2:
        rhs = jnp.pad(rhs, ((0, p1), (0, 0), (0, p2)))
        fac = jnp.pad(fac, ((0, p1), (0, p2)))
    P1, P2 = rhs.shape[0], rhs.shape[2]

    grid = (P1 // block_b1, P2 // block_b2)
    blk = (block_b1, n, block_b2)
    vspec = pl.BlockSpec(blk, lambda i, j: (i, 0, j), memory_space=pltpu.VMEM)
    fspec = pl.BlockSpec((block_b1, 1, block_b2), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_cyclic_const_kernel_axis1, n=n),
        grid=grid,
        in_specs=[fspec, vspec],
        out_specs=vspec,
        out_shape=jax.ShapeDtypeStruct((P1, n, P2), dtype),
        scratch_shapes=[pltpu.VMEM(blk, dtype), pltpu.VMEM(blk, dtype)],
        interpret=interpret,
    )(fac[:, None, :].astype(dtype), rhs)

    if p1 or p2:
        out = out[:b1, :, :b2]
    return out


def _cyclic_const_kernel_nat(fac_ref, d_ref, out_ref, zbuf, cp_ref, dpz_ref,
                             *, n):
    """NATURAL-layout (B1, n, B2) periodic solve — the phi leg without its
    XLA transpose pair.  One full-buffer dim-0/1 swap relays the block into
    the (n, B1, B2) solve layout (the chip-gated relayout pattern of
    _const_sweep_kernel_nat; B2 stays the lane dim, so NO lane<->sublane
    transposes are needed — unlike the z relayout), the axis-0
    Sherman-Morrison recurrences run on cheap leading-dim row views, and one
    swap restages the solution.  Replaces _cyclic_const_kernel_axis1's
    per-group swaps (three line buffers tripled the swap overhead —
    module-history note below)."""
    f32 = zbuf.dtype
    fac = fac_ref[:, 0, :]               # (B1, B2)
    a = -fac
    b = 1.0 + 2.0 * fac
    gamma = -b
    b0_mod = 2.0 * b                     # b - gamma
    bn_mod = b - a * a / gamma           # b - alpha*beta/gamma

    zbuf[...] = jnp.swapaxes(d_ref[...], 0, 1).astype(f32)  # (n, B1, B2)

    def b_at(i):
        bi = jnp.where(i == 0, b0_mod, b)
        return jnp.where(i == n - 1, bn_mod, bi)

    def u_at(i):
        u = jnp.where(i == 0, gamma, jnp.zeros_like(gamma))
        return jnp.where(i == n - 1, a, u)

    def fwd(i, carry):
        cp_prev, dy_prev, dz_prev = carry
        a_i = jnp.where(i == 0, 0.0, a)         # a[0] unused (wrap via u)
        c_i = jnp.where(i == n - 1, 0.0, a)     # c = a (symmetric)
        inv = 1.0 / (b_at(i) - a_i * cp_prev)
        cp = c_i * inv
        dy = (zbuf[i] - a_i * dy_prev) * inv    # row consumed -> y staged
        dz = (u_at(i) - a_i * dz_prev) * inv
        cp_ref[i] = cp
        zbuf[i] = dy
        dpz_ref[i] = dz
        return cp, dy, dz

    zero = jnp.zeros(fac.shape, f32)
    lax.fori_loop(0, n, fwd, (zero, zero, zero))

    def bwd(j, carry):
        y_next, z_next = carry
        i = n - 1 - j
        cp = cp_ref[i]
        y = zbuf[i] - cp * y_next
        z = dpz_ref[i] - cp * z_next
        zbuf[i] = y
        dpz_ref[i] = z
        return y, z

    y0, z0 = lax.fori_loop(0, n, bwd, (zero, zero))
    yn = zbuf[n - 1]
    zn = dpz_ref[n - 1]
    fact = (y0 + a * yn / gamma) / (1.0 + z0 + a * zn / gamma)

    def fix(i, _):
        zbuf[i] = zbuf[i] - fact * dpz_ref[i]
        return 0

    lax.fori_loop(0, n, fix, 0)
    out_ref[...] = jnp.swapaxes(zbuf[...], 0, 1).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "block_b1",
                                             "block_b2"))
def fused_cyclic_const_nat(rhs, fac, *, interpret: bool = False,
                           block_b1: int = 8, block_b2: int = 128):
    """Periodic constant-coefficient solve along axis 1 of NATURAL
    (B1, n, B2) arrays via the in-VMEM dim-0/1 relayout; ``fac`` is
    (B1, B2).  The ring length n cannot be padded (periodicity), but needs
    no alignment: the solve indexes single rows of the untiled leading dim
    of the relaid scratch."""
    b1, n, b2 = rhs.shape
    dtype = rhs.dtype
    p1 = _round_up(b1, block_b1) - b1
    p2 = _round_up(b2, block_b2) - b2
    if p1 or p2:
        rhs = jnp.pad(rhs, ((0, p1), (0, 0), (0, p2)))
        # padded systems need a well-conditioned matrix; fac=0 -> identity
        fac = jnp.pad(fac, ((0, p1), (0, p2)))
    P1, P2 = rhs.shape[0], rhs.shape[2]

    grid = (P1 // block_b1, P2 // block_b2)
    blk = (block_b1, n, block_b2)
    vspec = pl.BlockSpec(blk, lambda i, j: (i, 0, j), memory_space=pltpu.VMEM)
    fspec = pl.BlockSpec((block_b1, 1, block_b2), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM)
    cdt = jnp.promote_types(dtype, jnp.float32)
    sblk = (n, block_b1, block_b2)

    out = pl.pallas_call(
        functools.partial(_cyclic_const_kernel_nat, n=n),
        grid=grid,
        in_specs=[fspec, vspec],
        out_specs=vspec,
        out_shape=jax.ShapeDtypeStruct((P1, n, P2), dtype),
        scratch_shapes=[pltpu.VMEM(sblk, cdt), pltpu.VMEM(sblk, cdt),
                        pltpu.VMEM(sblk, cdt)],
        interpret=interpret,
    )(fac[:, None, :].astype(cdt), rhs)

    if p1 or p2:
        out = out[:b1, :, :b2]
    return out


# Natural-layout phi: REFUTED on chip 2026-08-21 03:20 (scripts/
# r5_cyl_be.py, (128,512,512), same-session slope; parity bitwise): leg
# nat 2.84 ms vs t2 1.93; step 4.65 vs 3.77 — the triple-scratch
# relayout costs more than the XLA transpose pair it removes (unlike the
# OPEN nat-z solve, the cyclic solve touches THREE line buffers).  Stays
# OFF; the kernel remains for layouts where a transpose is impossible.
PHI_NAT_DEFAULT = False


def fused_cyclic_phi(X, fac, *, interpret: bool = False):
    """Periodic phi solve on the natural (r, phi, z) layout.

    History: the axis-0 kernel plus an XLA transpose pair (3.8 ms standalone
    at (128, 512, 512) v5e) beat the first transpose-free axis-1 kernel
    (4.6 ms) — the cyclic solve carries THREE line buffers, so that
    kernel's per-group swap overhead tripled where the open sweep's halved.
    Round 5 replaces the per-group swaps with ONE full-buffer dim-0/1
    relayout (_cyclic_const_kernel_nat, the chip-gated pattern of the
    natural-z solves); PHI_NAT_DEFAULT routes it once chip-gated."""
    if PHI_NAT_DEFAULT:
        return fused_cyclic_const_nat(X, fac, interpret=interpret)
    out = fused_cyclic_const(jnp.transpose(X, (1, 0, 2)), fac,
                             interpret=interpret)
    return jnp.transpose(out, (1, 0, 2))


def fused_sweep(rhs, code_ax0, coeff, theta_gam, dt, t_inf, axis: int,
                qflux=None, dir_val=None, *, interpret: bool = False,
                block_b2: int = 128):
    """Masked implicit sweep along ``axis`` of (nx, ny, nz) arrays.

    ``code_ax0`` must already be in the axis-first layout (from sweep_code);
    rhs/coeff/qflux/dir_val are in natural (x, y, z) layout and are
    transposed here.
    """
    mv = lambda t: (t if (t is None or axis == 0) else jnp.moveaxis(t, axis, 0))
    out = fused_sweep_axis0(mv(rhs), code_ax0, mv(coeff), theta_gam, dt,
                            t_inf, qflux=mv(qflux), dir_val=mv(dir_val),
                            interpret=interpret, block_b2=block_b2)
    return out if axis == 0 else jnp.moveaxis(out, 0, axis)
