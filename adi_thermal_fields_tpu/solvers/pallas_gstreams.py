"""G-stream variable-property tier: pre-multiplied coupling streams.

The fused varprop kernels (solvers/pallas_varprop.py) are VPU-issue-bound,
not HBM-bound: each sweep re-derives its tridiagonal coefficients per cell
from ``code + fc + w (+ h)`` — a decode (3 compare+selects), a sink build,
a row-lagged shift chain (4 concats/group), and ~10 multiplies (measured
round 3: 6.9 ms/sweep at 384^3 against the constant-coefficient kernels'
3-4 ms at the same traffic class).

This tier moves ALL of that math into the (HBM-bound, VPU-idle) fields
pass.  ``gstream_fields`` evaluates k(T)/cp(T) clamp-sums in registers and
emits, per axis,

    g_lo[ax][cell] = theta*dt/d_ax^2 * w[cell] * fc_lo[ax][cell]
    g_hi[ax][cell] = theta*dt/d_ax^2 * w[cell] * fc_hi[ax][cell]
    sw[ax][cell]   = dt/d_ax * h[cell] * w[cell] * n_exposed[ax][cell]

with ``fc`` the pre-masked harmonic face conductivity, ``w = 1/(rho cp)``,
``n_exposed`` the per-axis count of Robin-exposed faces, and the radiative
film ``h(T) = eps*sigma*(Tk+Tik)(Tk^2+Tik^2) + h_conv`` (bc/radiation.py)
evaluated IN REGISTERS when requested — the engine's separate XLA
radiative-h pass (8 B/cell) and the per-sweep h streams (12 B/cell)
disappear.  Every downstream kernel then reduces to a pure FMA stream:

    a = -g_lo,  c = -g_hi,  b = 1 + g_lo + g_hi + sw,  d = rhs + sw*t_inf

  * identity rows fall out free (out-of-mask cells have all-zero streams),
    so the sweeps need NO plan codes at all;
  * the upper coupling g_hi is cell-local (the fields pass did the +1
    shift), so the sweeps shed the one-row lag machinery;
  * the theta-pass faces are ``(1-theta)/theta * g`` (one scalar ratio),
    so the fused theta+x ring kernel streams g instead of fc/w/code and
    drops its fy/fz RINGS — face validity is baked into g (zero across
    void/domain boundaries), which also removes the stale-slot validity
    selects.  Only T still rides the ring.

Per-step HBM traffic at 384^3 radiative f32 (vs the pallas_varprop tier):
fields 41 B (was 21+8 rad pass), theta+x ring 36 (was 33), y sweep 20
(was 21), z re-lay 32 (was 34), z sweep 20 (was 21) = ~149 B/cell — a few
bytes MORE, but every pass is now streaming FMA work the VPU issues at
line rate.  theta > 0 is required (theta = 0 has no implicit factor to
fold into; the framework's schemes are theta in {0.5, 1}).

No reference analogue (the reference is constant-coefficient CUDA/numba,
adi3d_numba_coeff.py:21-23); the tier is an original TPU design.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_varprop import _clamp_sum, _harm, _shift_lo, _shift_hi

__all__ = ["gstream_fields", "gstream_sweep", "gstream_sweep_axis1",
           "gstream_theta_sweep"]

_SB = 5.670374419e-8   # Stefan-Boltzmann [W/m^2/K^4] (bc/radiation.py)


def _round_up(v, m):
    return -(-v // m) * m


# ---------------------------------------------------------------------------
# fields pass
# ---------------------------------------------------------------------------

def _gfields_kernel(scal_ref, T_ref, M_ref, h_ref, s_ref,
                    gxlo_ref, gxhi_ref, gylo_ref, gyhi_ref,
                    gzlo_ref, gzhi_ref, swx_ref, swy_ref, swz_ref,
                    sp_ref, Tbuf, kbuf, mbuf, *, k_spec, cp_spec, rho,
                    h_mode, nx):
    """One x-plane per grid step, ONE PLANE LAGGED: the step loading plane
    ``i`` emits plane ``p = i-1`` (its x-high face needs k at plane i).
    Two-plane carries of T / k / mask; y/z faces are in-plane sublane/lane
    shifts (zero-filled — domain edges vanish)."""
    tgx, tgy, tgz = scal_ref[0], scal_ref[1], scal_ref[2]
    skx, sky, skz = scal_ref[3], scal_ref[4], scal_ref[5]
    hpar = scal_ref[6]     # rob_c (const) / emissivity (rad)
    t_inf = scal_ref[7]    # ambient [C] for the radiative film
    h_conv = scal_ref[8]
    dt = scal_ref[9]
    i = pl.program_id(0)
    f32 = jnp.float32

    @pl.when(i == 0)
    def _init():
        Tbuf[...] = jnp.zeros_like(Tbuf)
        kbuf[...] = jnp.zeros_like(kbuf)
        mbuf[...] = jnp.zeros_like(mbuf)

    # plane i (the input index map clamps i to nx-1; kill the clamped
    # re-read at i == nx so the last plane's x-high face vanishes)
    T_i = T_ref[0].astype(f32)
    valid = jnp.where(i <= nx - 1, 1.0, 0.0).astype(f32)
    m_i = M_ref[0].astype(jnp.int32).astype(f32) * valid
    k_i = (_clamp_sum(T_i, *k_spec) if isinstance(k_spec, tuple)
           else jnp.full_like(T_i, float(k_spec)))

    @pl.when(i >= 1)
    def _emit():
        sp_c = (i - 1) % 2   # plane p = i-1 (stored at step i-1)
        sq_c = i % 2         # plane p-1   (stored at step i-2)
        Tc = Tbuf[sp_c]
        k_p = kbuf[sp_c]
        m_p = mbuf[sp_c]
        k_q = kbuf[sq_c]
        m_q = mbuf[sq_c]
        cp_p = (_clamp_sum(Tc, *cp_spec) if isinstance(cp_spec, tuple)
                else jnp.full_like(Tc, float(cp_spec)))
        w = 1.0 / (rho * cp_p)
        odt = gxlo_ref.dtype

        # x faces (plane p-1 below, plane i above)
        cx_lo = m_q * m_p
        cx_hi = m_p * m_i
        tw = tgx * w
        gxlo_ref[0] = (tw * (_harm(k_q, k_p) * cx_lo)).astype(odt)
        gxhi_ref[0] = (tw * (_harm(k_p, k_i) * cx_hi)).astype(odt)
        # y faces: sublane shifts of the plane
        cy_lo = m_p * _shift_lo(m_p, 0)
        cy_hi = m_p * _shift_hi(m_p, 0)
        tw = tgy * w
        gylo_ref[0] = (tw * (_harm(_shift_lo(k_p, 0), k_p) * cy_lo)).astype(odt)
        gyhi_ref[0] = (tw * (_harm(_shift_hi(k_p, 0), k_p) * cy_hi)).astype(odt)
        # z faces: lane shifts
        cz_lo = m_p * _shift_lo(m_p, 1)
        cz_hi = m_p * _shift_hi(m_p, 1)
        tw = tgz * w
        gzlo_ref[0] = (tw * (_harm(_shift_lo(k_p, 1), k_p) * cz_lo)).astype(odt)
        gzhi_ref[0] = (tw * (_harm(_shift_hi(k_p, 1), k_p) * cz_hi)).astype(odt)

        # Robin sinks: h * w * (exposed faces along the axis), in-mask only
        if h_mode == "rad":
            Tk = Tc + 273.15
            Tik = t_inf + 273.15
            hloc = hpar * _SB * (Tk + Tik) * (Tk * Tk + Tik * Tik) + h_conv
        elif h_mode == "stream":
            hloc = h_ref[0].astype(f32)
        else:
            hloc = hpar
        hw = hloc * (w * m_p)
        swx_ref[0] = (skx * hw * (2.0 - cx_lo - cx_hi)).astype(odt)
        swy_ref[0] = (sky * hw * (2.0 - cy_lo - cy_hi)).astype(odt)
        swz_ref[0] = (skz * hw * (2.0 - cz_lo - cz_hi)).astype(odt)
        if s_ref is not None:
            sp_ref[0] = (dt * (w * m_p) * s_ref[0].astype(f32)).astype(odt)

    @pl.when(i <= nx - 1)
    def _rotate():
        Tbuf[i % 2] = T_i
        kbuf[i % 2] = k_i
        mbuf[i % 2] = m_i


@functools.partial(jax.jit, static_argnames=("k_spec", "cp_spec", "rho",
                                             "h_mode", "interpret"))
def gstream_fields(T, mask_i8, tg3, sk3, hpar, t_inf, h_conv, dt,
                   h=None, src=None, *, k_spec, cp_spec, rho: float,
                   h_mode: str = "const", interpret: bool = False):
    """Build the nine g-stream fields (+ optional pre-scaled source) in ONE
    HBM pass: read T (4 B) + mask (1 B) [+ h 4][+ src 4], write
    g_lo/g_hi x 3 axes + sw x 3 axes (36 B) [+ src_pre 4].

    tg3 : per-axis theta*dt/d_ax^2 (traced, shape (3,))
    sk3 : per-axis dt/d_ax (traced, shape (3,))
    h_mode : "const" (hpar = scalar film), "stream" (per-cell ``h``), or
             "rad" (hpar = emissivity; the Stefan-Boltzmann film
             h(T) = eps*sigma*(Tk+Tik)(Tk^2+Tik^2) + h_conv is evaluated
             in registers — bc/radiation.radiative_h, celsius convention)
    src : optional volumetric source; emits ``dt * w * mask * src``.

    Returns ``(g_lo3, g_hi3, sw3, src_pre)`` (src_pre None without src),
    each in the NATURAL (x, y, z) layout, dtype T.dtype.
    """
    nx, ny, nz = T.shape
    dtype = T.dtype
    has_h = h_mode == "stream"
    has_src = src is not None
    if has_h and h is None:
        raise ValueError("h_mode='stream' needs the h field")

    p1 = _round_up(ny, 8) - ny
    p2 = _round_up(nz, 128) - nz
    if p1 or p2:
        pad = ((0, 0), (0, p1), (0, p2))
        T = jnp.pad(T, pad)
        mask_i8 = jnp.pad(mask_i8, pad)   # pad mask 0: faces/sinks vanish
        h = None if h is None else jnp.pad(h, pad)
        src = None if src is None else jnp.pad(src, pad)
    Py, Pz = T.shape[1], T.shape[2]

    cdt = jnp.promote_types(dtype, jnp.float32)
    scal = jnp.concatenate([
        jnp.broadcast_to(jnp.asarray(tg3), (3,)).astype(cdt),
        jnp.broadcast_to(jnp.asarray(sk3), (3,)).astype(cdt),
        jnp.stack([jnp.asarray(hpar, cdt), jnp.asarray(t_inf, cdt),
                   jnp.asarray(h_conv, cdt), jnp.asarray(dt, cdt)])])

    blk = (1, Py, Pz)
    vin = pl.BlockSpec(blk, lambda i: (jnp.minimum(i, nx - 1), 0, 0),
                       memory_space=pltpu.VMEM)
    vout = pl.BlockSpec(blk, lambda i: (jnp.maximum(i - 1, 0), 0, 0),
                        memory_space=pltpu.VMEM)

    def body(*refs):
        it = iter(refs)
        scal_ = next(it)
        T_, M_ = next(it), next(it)
        h_ = next(it) if has_h else None
        s_ = next(it) if has_src else None
        outs = [next(it) for _ in range(9)]
        sp_ = next(it) if has_src else None
        Tb, kb, mb = next(it), next(it), next(it)
        return _gfields_kernel(scal_, T_, M_, h_, s_, *outs, sp_, Tb, kb,
                               mb, k_spec=k_spec, cp_spec=cp_spec, rho=rho,
                               h_mode=h_mode, nx=nx)

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM), vin, vin]
    inputs = [scal, T, mask_i8]
    if has_h:
        in_specs.append(vout)   # h is consumed on the emitted plane
        inputs.append(h)
    if has_src:
        in_specs.append(vout)
        inputs.append(src)

    shp = jax.ShapeDtypeStruct((nx, Py, Pz), dtype)
    n_out = 9 + (1 if has_src else 0)
    outs = pl.pallas_call(
        body,
        grid=(nx + 1,),
        in_specs=in_specs,
        out_specs=[vout] * n_out,
        out_shape=[shp] * n_out,
        scratch_shapes=[
            pltpu.VMEM((2, Py, Pz), jnp.float32),    # T plane carries
            pltpu.VMEM((2, Py, Pz), jnp.float32),    # k plane carries
            pltpu.VMEM((2, Py, Pz), jnp.float32),    # mask plane carries
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)

    if p1 or p2:
        outs = [a[:, :ny, :nz] for a in outs]
    g_lo = (outs[0], outs[2], outs[4])
    g_hi = (outs[1], outs[3], outs[5])
    sw = (outs[6], outs[7], outs[8])
    return g_lo, g_hi, sw, (outs[9] if has_src else None)


# ---------------------------------------------------------------------------
# slim sweeps
# ---------------------------------------------------------------------------

def _gsweep_kernel(scal_ref, seed_ref, d_hbm, lo_hbm, hi_hbm, sw_hbm,
                   out_hbm, xbuf, dpbuf, obuf, dbuf, lbuf, ubuf, sbuf,
                   in_sem, out_sem, *, n, cn, b1, b2):
    """Axis-0 g-stream sweep: 4 input streams, all coefficients local
    (a = -g_lo, c = -g_hi, b = 1 + g_lo + g_hi + sw, d = rhs + sw*t_inf) —
    no plan codes, no row lag, no h stream.  Out-of-mask and padded rows
    have all-zero streams and are identity rows by construction."""
    t_inf = scal_ref[0]
    f32 = xbuf.dtype
    mixed = obuf is not None
    stochastic = seed_ref is not None
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
        src = lambda ref: ref.at[pl.ds(s, cn), pl.ds(r0, b1), pl.ds(c0, b2)]
        return (
            pltpu.make_async_copy(src(d_hbm), dbuf.at[slot], in_sem.at[slot, 0]),
            pltpu.make_async_copy(src(lo_hbm), lbuf.at[slot], in_sem.at[slot, 1]),
            pltpu.make_async_copy(src(hi_hbm), ubuf.at[slot], in_sem.at[slot, 2]),
            pltpu.make_async_copy(src(sw_hbm), sbuf.at[slot], in_sem.at[slot, 3]),
        )

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

    zero = jnp.zeros((b1, b2), f32)
    carry = (zero, zero)
    for k in range(nchunks):
        slot = k % 2
        for dma in in_dmas(slot, k):
            dma.wait()

        def grp(g, carry, *, slot=slot, base=k * cn):
            cp_prev, dp_prev = carry
            s = pl.multiple_of(g * G, G)
            lo_g = lbuf[slot, pl.ds(s, G)].astype(f32)
            hi_g = ubuf[slot, pl.ds(s, G)].astype(f32)
            sw_g = sbuf[slot, pl.ds(s, G)].astype(f32)
            d_g = dbuf[slot, pl.ds(s, G)].astype(f32)
            b_g = 1.0 + lo_g + hi_g + sw_g
            dd_g = d_g + sw_g * t_inf
            cps, dps = [], []
            for r in range(G):
                inv = 1.0 / (b_g[r] + lo_g[r] * cp_prev)
                cp_prev = -hi_g[r] * inv
                dp_prev = (dd_g[r] + lo_g[r] * dp_prev) * inv
                cps.append(cp_prev)
                dps.append(dp_prev)
            xbuf[pl.ds(base + s, G)] = jnp.stack(cps)
            dpbuf[pl.ds(base + s, G)] = jnp.stack(dps)
            return cp_prev, dp_prev

        carry = lax.fori_loop(0, cn // G, grp, carry)
        if k + 2 < nchunks:
            for dma in in_dmas(slot, k + 2):
                dma.start()

    # backward substitution, rows n-1 .. 0 (x_{n-1} = dp: its cp is 0
    # because the last row's g_hi is a domain-edge face = 0)
    x_next = zero
    for k in range(nchunks - 1, -1, -1):
        base = k * cn

        def grp_b(gg, x_next, *, base=base):
            s = pl.multiple_of((cn // G - 1 - gg) * G, G)
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
                out_dma(k + 2).wait()
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


@functools.partial(jax.jit, static_argnames=("interpret", "block_b1",
                                             "block_b2", "chunk"))
def gstream_sweep(rhs, g_lo, g_hi, sw, t_inf, rng_seed=None, *,
                  interpret: bool = False, block_b1: int = 8,
                  block_b2: int | None = None, chunk: int = 64):
    """G-stream implicit sweep along axis 0 of (n, B1, B2) arrays.

    Solves, per pencil, ``-g_lo x_{i-1} + (1+g_lo+g_hi+sw) x_i - g_hi
    x_{i+1} = rhs_i + sw_i t_inf`` with the streams from gstream_fields.
    bf16 inputs solve at f32 and stochastically round stores when
    ``rng_seed`` is given."""
    n, b1, b2 = rhs.shape
    dtype = rhs.dtype
    mixed = jnp.promote_types(dtype, jnp.float32) != dtype
    stochastic = mixed and rng_seed is not None
    if stochastic and interpret:
        raise NotImplementedError(
            "stochastic rounding needs the TPU PRNG (pltpu.prng does not "
            "lower in interpret mode)")
    if block_b2 is None:
        # minimize lane padding (a 256 tile on b2=384 pads to 512: an
        # extra XLA pad+slice HBM pass per stream — measured 3.6x slower
        # than the 128 tile at 384^3), prefer the wider tile on ties
        # (fewer per-tile fixed costs: 2.06 vs 3.58 ms at 512^3); long
        # lines cap at 128 for VMEM (cp/dp line buffers)
        cands = [c for c in (256, 128) if n <= 640 or c == 128]
        block_b2 = min(cands, key=lambda c: (_round_up(b2, c), -c))
    cn = min(chunk, _round_up(n, 8))
    pn = _round_up(n, cn) - n
    p1 = _round_up(b1, block_b1) - b1
    p2 = _round_up(b2, block_b2) - b2
    if p1 or p2 or pn:
        pad = ((0, pn), (0, p1), (0, p2))
        rhs, g_lo, g_hi, sw = (jnp.pad(a, pad)
                               for a in (rhs, g_lo, g_hi, sw))
    n_pad, P1, P2 = rhs.shape
    cdt = jnp.promote_types(dtype, jnp.float32)

    scal = jnp.asarray(t_inf, cdt).reshape(1)
    grid = (P1 // block_b1, P2 // block_b2)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)

    scratch = [
        pltpu.VMEM((n_pad, block_b1, block_b2), cdt),       # x / cp
        pltpu.VMEM((n_pad, block_b1, block_b2), cdt),       # dp
        pltpu.VMEM((2, cn, block_b1, block_b2), dtype),     # rhs chunks
        pltpu.VMEM((2, cn, block_b1, block_b2), dtype),     # g_lo chunks
        pltpu.VMEM((2, cn, block_b1, block_b2), dtype),     # g_hi chunks
        pltpu.VMEM((2, cn, block_b1, block_b2), dtype),     # sw chunks
    ]
    if mixed:
        scratch.append(pltpu.VMEM((2, cn, block_b1, block_b2), dtype))
    scratch += [pltpu.SemaphoreType.DMA((2, 4)),
                pltpu.SemaphoreType.DMA((n_pad // cn,))]

    inputs = [scal]
    in_specs = [sspec]
    if stochastic:
        inputs.append(jnp.asarray(rng_seed, jnp.int32).reshape(1))
        in_specs.append(sspec)
    inputs += [rhs, g_lo, g_hi, sw]
    in_specs += [hbm] * 4

    def body(*refs):
        it = iter(refs)
        scal_ = next(it)
        seed_ = next(it) if stochastic else None
        d_, l_, u_, s_ = (next(it) for _ in range(4))
        o_ = next(it)
        xb, dp, db, lb, ub, sb = (next(it) for _ in range(6))
        ob = next(it) if mixed else None
        isem, osem = next(it), next(it)
        return _gsweep_kernel(scal_, seed_, d_, l_, u_, s_, o_, xb, dp,
                              ob, db, lb, ub, sb, isem, osem,
                              n=n_pad, cn=cn, b1=block_b1, b2=block_b2)

    out = pl.pallas_call(
        body, grid=grid,
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


def _gsweep_kernel_axis1(scal_ref, seed_ref, d_hbm, lo_hbm, hi_hbm, sw_hbm,
                         out_hbm, xbuf, dpbuf, obuf, dbuf, lbuf, ubuf, sbuf,
                         in_sem, out_sem, *, n, cn, b1, b2):
    """Axis-1 g-stream sweep in the NATURAL (B1, n, B2) layout: raw groups
    are swapped to (G, b1, b2) once (the cheap Mosaic dim-0/1 swap), the
    elimination runs in the axis-0 shape, finished groups swap back into a
    natural staging buffer whose chunk DMAs slice the tiled sublane dim at
    chunk-aligned offsets only."""
    t_inf = scal_ref[0]
    f32 = xbuf.dtype
    stochastic = seed_ref is not None
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
        return (
            pltpu.make_async_copy(src(d_hbm), dbuf.at[slot], in_sem.at[slot, 0]),
            pltpu.make_async_copy(src(lo_hbm), lbuf.at[slot], in_sem.at[slot, 1]),
            pltpu.make_async_copy(src(hi_hbm), ubuf.at[slot], in_sem.at[slot, 2]),
            pltpu.make_async_copy(src(sw_hbm), sbuf.at[slot], in_sem.at[slot, 3]),
        )

    def out_dma(k):
        s = k * cn
        return pltpu.make_async_copy(
            obuf.at[:, pl.ds(s, cn), :],
            out_hbm.at[pl.ds(r0, b1), pl.ds(s, cn), pl.ds(c0, b2)],
            out_sem.at[k])

    for dma in in_dmas(0, 0):
        dma.start()
    if nchunks > 1:
        for dma in in_dmas(1, 1):
            dma.start()

    zero = jnp.zeros((b1, b2), f32)
    carry = (zero, zero)
    for k in range(nchunks):
        slot = k % 2
        for dma in in_dmas(slot, k):
            dma.wait()

        def grp(g, carry, *, slot=slot, base=k * cn):
            cp_prev, dp_prev = carry
            s = pl.multiple_of(g * G, G)
            lo_g = jnp.swapaxes(lbuf[slot, :, pl.ds(s, G), :], 0, 1) \
                .astype(f32)
            hi_g = jnp.swapaxes(ubuf[slot, :, pl.ds(s, G), :], 0, 1) \
                .astype(f32)
            sw_g = jnp.swapaxes(sbuf[slot, :, pl.ds(s, G), :], 0, 1) \
                .astype(f32)
            d_g = jnp.swapaxes(dbuf[slot, :, pl.ds(s, G), :], 0, 1) \
                .astype(f32)
            b_g = 1.0 + lo_g + hi_g + sw_g
            dd_g = d_g + sw_g * t_inf
            cps, dps = [], []
            for r in range(G):
                inv = 1.0 / (b_g[r] + lo_g[r] * cp_prev)
                cp_prev = -hi_g[r] * inv
                dp_prev = (dd_g[r] + lo_g[r] * dp_prev) * inv
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
            s = pl.multiple_of((cn // G - 1 - gg) * G, G)
            cp_g = xbuf[pl.ds(base + s, G)]
            dp_g = dpbuf[pl.ds(base + s, G)]
            xs = [None] * G
            for r in range(G - 1, -1, -1):
                x_next = dp_g[r] - cp_g[r] * x_next
                xs[r] = x_next
            xg = jnp.swapaxes(jnp.stack(xs), 0, 1)
            if stochastic:
                bits = pltpu.bitcast(pltpu.prng_random_bits(xg.shape),
                                     jnp.uint32)
                xg = pltpu.stochastic_round(xg, bits,
                                            target_dtype=obuf.dtype)
            obuf[:, pl.ds(base + s, G), :] = xg.astype(obuf.dtype)
            return x_next

        x_next = lax.fori_loop(0, cn // G, grp_b, x_next)
        out_dma(k).start()

    for k in range(nchunks):
        out_dma(k).wait()


@functools.partial(jax.jit, static_argnames=("interpret", "block_b1",
                                             "block_b2", "chunk"))
def gstream_sweep_axis1(rhs, g_lo, g_hi, sw, t_inf, rng_seed=None, *,
                        interpret: bool = False, block_b1: int = 8,
                        block_b2: int | None = None, chunk: int = 64):
    """G-stream implicit sweep along AXIS 1 of (B1, n, B2) arrays (the
    y-sweep with no transposes).  Streams must be in the same natural
    layout; semantics match ``gstream_sweep``."""
    b1, n, b2 = rhs.shape
    dtype = rhs.dtype
    mixed = jnp.promote_types(dtype, jnp.float32) != dtype
    stochastic = mixed and rng_seed is not None
    if stochastic and interpret:
        raise NotImplementedError(
            "stochastic rounding needs the TPU PRNG (pltpu.prng does not "
            "lower in interpret mode)")
    if block_b2 is None:
        # minimize lane padding (a 256 tile on b2=384 pads to 512: an
        # extra XLA pad+slice HBM pass per stream — measured 3.6x slower
        # than the 128 tile at 384^3), prefer the wider tile on ties
        # (fewer per-tile fixed costs: 2.06 vs 3.58 ms at 512^3); long
        # lines cap at 128 for VMEM (cp/dp line buffers)
        cands = [c for c in (256, 128) if n <= 640 or c == 128]
        block_b2 = min(cands, key=lambda c: (_round_up(b2, c), -c))
    cn = min(chunk, _round_up(n, 8))
    pn = _round_up(n, cn) - n
    p1 = _round_up(b1, block_b1) - b1
    p2 = _round_up(b2, block_b2) - b2
    if p1 or p2 or pn:
        pad = ((0, p1), (0, pn), (0, p2))
        rhs, g_lo, g_hi, sw = (jnp.pad(a, pad)
                               for a in (rhs, g_lo, g_hi, sw))
    P1, n_pad, P2 = rhs.shape
    cdt = jnp.promote_types(dtype, jnp.float32)

    scal = jnp.asarray(t_inf, cdt).reshape(1)
    grid = (P1 // block_b1, P2 // block_b2)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)

    scratch = [
        pltpu.VMEM((n_pad, block_b1, block_b2), cdt),           # cp
        pltpu.VMEM((n_pad, block_b1, block_b2), cdt),           # dp
        pltpu.VMEM((block_b1, n_pad, block_b2), dtype),         # x staging
        pltpu.VMEM((2, block_b1, cn, block_b2), dtype),         # rhs
        pltpu.VMEM((2, block_b1, cn, block_b2), dtype),         # g_lo
        pltpu.VMEM((2, block_b1, cn, block_b2), dtype),         # g_hi
        pltpu.VMEM((2, block_b1, cn, block_b2), dtype),         # sw
    ]
    scratch += [pltpu.SemaphoreType.DMA((2, 4)),
                pltpu.SemaphoreType.DMA((n_pad // cn,))]

    inputs = [scal]
    in_specs = [sspec]
    if stochastic:
        inputs.append(jnp.asarray(rng_seed, jnp.int32).reshape(1))
        in_specs.append(sspec)
    inputs += [rhs, g_lo, g_hi, sw]
    in_specs += [hbm] * 4

    def body(*refs):
        it = iter(refs)
        scal_ = next(it)
        seed_ = next(it) if stochastic else None
        d_, l_, u_, s_ = (next(it) for _ in range(4))
        o_ = next(it)
        xb, dp, ob, db, lb, ub, sb = (next(it) for _ in range(7))
        isem, osem = next(it), next(it)
        return _gsweep_kernel_axis1(scal_, seed_, d_, l_, u_, s_, o_, xb,
                                    dp, ob, db, lb, ub, sb, isem, osem,
                                    n=n_pad, cn=cn, b1=block_b1,
                                    b2=block_b2)

    out = pl.pallas_call(
        body, grid=grid,
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


# ---------------------------------------------------------------------------
# fused theta-pass + x-sweep ring kernel
# ---------------------------------------------------------------------------

def _gring_kernel(scal_ref, seed_ref, T_hbm, gxlo_hbm, gxhi_hbm, gylo_hbm,
                  gyhi_hbm, gzlo_hbm, gzhi_hbm, swx_hbm, sp_hbm, out_hbm,
                  ring, xlobuf, xhibuf, ylobuf, yhibuf, zlobuf, zhibuf,
                  swbuf, spbuf, xbuf, dpbuf, obuf, yrow, t_sem, c_sems,
                  out_sem, *, n, b1, b2, nt1, nt2, R, stochastic):
    """Ring-buffer fused theta-pass + x-sweep on G-STREAMS — only T rides
    the ring (protocol of pallas_varprop._vp_ring_kernel, whose fy/fz rings
    and validity selects this kernel sheds: face validity is baked into the
    g fields, zero across every void/domain boundary).  The completed
    tile's eight g/sw streams are single-slot completion-time DMAs with
    one-tile prefetch.  Explicit part:

        d = T + rr * sum_ax [g_lo(T_lo - T) + g_hi(T_hi - T)]  (+ src_pre)

    with ``rr = (1-theta)/theta`` (the g fields carry theta*dt*iv*w*fc);
    implicit part exactly gstream_sweep's.  HBM: read T(4) + 7 streams(28)
    [+src 4], write U(4) = 36-40 B/cell."""
    rr = scal_ref[0]
    t_inf = scal_ref[1]
    f32 = xbuf.dtype
    has_src = sp_hbm is not None
    G = 8
    i = pl.program_id(0)
    j = pl.program_id(1)
    s = i * nt2 + j
    first = (i == 0) & (j == 0)
    last = (i == nt1) & (j == nt2 - 1)

    def tile_coords(t):
        return (t // nt2) * b1, (t % nt2) * b2

    def load_dma(t):
        r0, c0 = tile_coords(t)
        return pltpu.make_async_copy(
            T_hbm.at[:, pl.ds(r0, b1), pl.ds(c0, b2)],
            ring.at[t % R, pl.ds(0, n)], t_sem)

    def comp_dmas(t):
        r0, c0 = tile_coords(t)
        at = lambda ref: ref.at[:, pl.ds(r0, b1), pl.ds(c0, b2)]
        srcs = [(gxlo_hbm, xlobuf), (gxhi_hbm, xhibuf), (gylo_hbm, ylobuf),
                (gyhi_hbm, yhibuf), (gzlo_hbm, zlobuf), (gzhi_hbm, zhibuf),
                (swx_hbm, swbuf)]
        if has_src:
            srcs.append((sp_hbm, spbuf))
        return [pltpu.make_async_copy(at(h), b, c_sems.at[ix])
                for ix, (h, b) in enumerate(srcs)]

    def out_dma(t):
        r0, c0 = tile_coords(t)
        return pltpu.make_async_copy(
            obuf, out_hbm.at[:, pl.ds(r0, b1), pl.ds(c0, b2)], out_sem)

    @pl.when(first)
    def _init():
        # the ring must never expose non-finite garbage (0 * NaN = NaN)
        # and the x-overlap pad rows n..n+G must read as zero forever
        for r in range(R):
            ring[r] = jnp.zeros_like(ring[r])
        yrow[...] = jnp.zeros_like(yrow)
        load_dma(0).start()

    @pl.when(i < nt1)
    def _wait_load():
        load_dma(s).wait()

    i2 = i + (j + 1 == nt2).astype(jnp.int32)

    @pl.when(i2 < nt1)
    def _start_load():
        load_dma(s + 1).start()

    @pl.when(s == nt2 - 1)
    def _first_comp():
        for dma in comp_dmas(0):
            dma.start()

    @pl.when(i >= 1)
    def _complete():
        c = s - nt2
        sc = c % R
        sp_s = (c - 1) % R
        shi = (c + 1) % R
        scur = s % R
        for dma in comp_dmas(c):
            dma.wait()
        if stochastic:
            pltpu.prng_seed(seed_ref[0] + c)

        @pl.when(i * nt2 + j >= nt2 + 1)
        def _wait_prev_out():
            out_dma(c - 1).wait()

        zero = jnp.zeros((b1, b2), f32)

        def grp(g, carry):
            cp_prev, dp_prev, T_prev = carry
            gs = g * G
            Tg = ring[sc, pl.ds(gs, G + 1)].astype(f32)     # (G+1, b1, b2)
            T_c = Tg[:G]
            lo_g = xlobuf[pl.ds(gs, G)].astype(f32)
            hi_g = xhibuf[pl.ds(gs, G)].astype(f32)
            # explicit theta pass: x faces, then y, then z
            T_xlo = jnp.concatenate([T_prev[None], Tg[:G - 1]], axis=0)
            acc = (lo_g * (T_xlo - T_c) + hi_g * (Tg[1:G + 1] - T_c))
            ylo_g = ylobuf[pl.ds(gs, G)].astype(f32)
            yhi_g = yhibuf[pl.ds(gs, G)].astype(f32)
            ylo_T = yrow[j, pl.ds(gs, G)].astype(f32)[:, None, :]
            yhi_T = ring[scur, pl.ds(gs, G), 0:1, :].astype(f32)
            T_ylo = jnp.concatenate([ylo_T, T_c[:, :b1 - 1, :]], axis=1)
            T_yhi = jnp.concatenate([T_c[:, 1:, :], yhi_T], axis=1)
            acc = acc + (ylo_g * (T_ylo - T_c) + yhi_g * (T_yhi - T_c))
            zlo_g = zlobuf[pl.ds(gs, G)].astype(f32)
            zhi_g = zhibuf[pl.ds(gs, G)].astype(f32)
            zlo_T = ring[sp_s, pl.ds(gs, G), :, b2 - 1:b2].astype(f32)
            zhi_T = ring[shi, pl.ds(gs, G), :, 0:1].astype(f32)
            T_zlo = jnp.concatenate([zlo_T, T_c[:, :, :b2 - 1]], axis=2)
            T_zhi = jnp.concatenate([T_c[:, :, 1:], zhi_T], axis=2)
            acc = acc + (zlo_g * (T_zlo - T_c) + zhi_g * (T_zhi - T_c))
            d_g = T_c + rr * acc
            if has_src:
                d_g = d_g + spbuf[pl.ds(gs, G)].astype(f32)
            sw_g = swbuf[pl.ds(gs, G)].astype(f32)
            b_g = 1.0 + lo_g + hi_g + sw_g
            dd_g = d_g + sw_g * t_inf
            cps, dps = [], []
            for r in range(G):
                inv = 1.0 / (b_g[r] + lo_g[r] * cp_prev)
                cp_prev = -hi_g[r] * inv
                dp_prev = (dd_g[r] + lo_g[r] * dp_prev) * inv
                cps.append(cp_prev)
                dps.append(dp_prev)
            xbuf[pl.ds(gs, G)] = jnp.stack(cps)
            dpbuf[pl.ds(gs, G)] = jnp.stack(dps)
            return cp_prev, dp_prev, Tg[G - 1]

        lax.fori_loop(0, n // G, grp, (zero, zero, zero))
        # this tile's bottom row becomes the y-lo value row for the tile
        # below (read above BEFORE this overwrite — same-step order safe)
        yrow[j] = ring[sc, pl.ds(0, n), b1 - 1, :]

        @pl.when(c + 1 < nt1 * nt2)
        def _next_comp():
            for dma in comp_dmas(c + 1):
                dma.start()

        def grp_b(gg, x_next):
            gs = (n // G - 1 - gg) * G
            cp_g = xbuf[pl.ds(gs, G)]
            dp_g = dpbuf[pl.ds(gs, G)]
            xs = [None] * G
            for r in range(G - 1, -1, -1):
                x_next = dp_g[r] - cp_g[r] * x_next
                xs[r] = x_next
            xk = jnp.stack(xs)
            if stochastic:
                bits = pltpu.bitcast(pltpu.prng_random_bits(xk.shape),
                                     jnp.uint32)
                obuf[pl.ds(gs, G)] = pltpu.stochastic_round(
                    xk, bits, target_dtype=obuf.dtype)
            else:
                obuf[pl.ds(gs, G)] = xk.astype(obuf.dtype)
            return x_next

        lax.fori_loop(0, n // G, grp_b, zero)
        out_dma(c).start()

        @pl.when(last)
        def _drain():
            out_dma(c).wait()


@functools.partial(jax.jit, static_argnames=("interpret", "block_b1",
                                             "block_b2"))
def gstream_theta_sweep(T, gx_lo, gx_hi, gy_lo, gy_hi, gz_lo, gz_hi, sw_x,
                        rr, t_inf, src_pre=None, rng_seed=None, *,
                        interpret: bool = False, block_b1: int = 8,
                        block_b2: int | None = None):
    """``U = A_x^{-1}[(I + rr*G) T (+ src_pre) + sw_x*t_inf]`` in ONE fused
    HBM pass on g-streams (see _gring_kernel).  ``rr = (1-theta)/theta``;
    all g/sw/src_pre fields from ``gstream_fields`` in the natural
    (x, y, z) layout."""
    n, b1, b2 = T.shape
    dtype = T.dtype
    G = 8
    has_src = src_pre is not None
    if block_b2 is None:
        # same padding-minimizing rule as the sweeps; the ring kernel keeps
        # its (historically validated) 128 tile on ties
        block_b2 = min((256, 128), key=lambda c: (_round_up(b2, c),
                                                  c != 128))

    pn = _round_up(n, G) - n
    p1 = _round_up(b1, block_b1) - b1
    p2 = _round_up(b2, block_b2) - b2
    arrs = [T, gx_lo, gx_hi, gy_lo, gy_hi, gz_lo, gz_hi, sw_x]
    if p1 or p2 or pn:
        pad = ((0, pn), (0, p1), (0, p2))
        arrs = [jnp.pad(a, pad) for a in arrs]
        src_pre = jnp.pad(src_pre, pad) if has_src else None
    T = arrs[0]
    n_pad, P1, P2 = T.shape
    nt1 = P1 // block_b1
    nt2 = P2 // block_b2
    R = nt2 + 3

    cdt = jnp.promote_types(dtype, jnp.float32)
    mixed = cdt != dtype
    stochastic = mixed and rng_seed is not None
    if stochastic and interpret:
        raise NotImplementedError(
            "stochastic rounding needs the TPU PRNG (pltpu.prng does not "
            "lower in interpret mode)")
    scal = jnp.stack([jnp.asarray(rr, cdt), jnp.asarray(t_inf, cdt)])

    hbm = pl.BlockSpec(memory_space=pl.ANY)
    kern = functools.partial(_gring_kernel, n=n_pad, b1=block_b1,
                             b2=block_b2, nt1=nt1, nt2=nt2, R=R,
                             stochastic=stochastic)

    def body(*refs):
        it = iter(refs)
        scal_ = next(it)
        seed_ = next(it) if stochastic else None
        hbms = [next(it) for _ in range(8)]
        sp_ = next(it) if has_src else None
        o_ = next(it)
        ring = next(it)
        bufs = [next(it) for _ in range(7)]
        spb = next(it) if has_src else None
        xb, dp, ob, yr = (next(it) for _ in range(4))
        tsem, csems, osem = next(it), next(it), next(it)
        return kern(scal_, seed_, *hbms, sp_, o_, ring, *bufs, spb, xb,
                    dp, ob, yr, tsem, csems, osem)

    scratch = [pltpu.VMEM((R, n_pad + G, block_b1, block_b2), dtype)]  # T
    n_streams = 7 + (1 if has_src else 0)
    scratch += [pltpu.VMEM((n_pad, block_b1, block_b2), dtype)
                for _ in range(n_streams)]
    scratch += [
        pltpu.VMEM((n_pad, block_b1, block_b2), cdt),            # cp
        pltpu.VMEM((n_pad, block_b1, block_b2), cdt),            # dp
        pltpu.VMEM((n_pad, block_b1, block_b2), dtype),          # out stage
        pltpu.VMEM((nt2, n_pad, block_b2), dtype),               # y-lo rows
        pltpu.SemaphoreType.DMA,                                 # T loads
        pltpu.SemaphoreType.DMA((n_streams,)),                   # comp
        pltpu.SemaphoreType.DMA,                                 # out
    ]

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    inputs = [scal]
    if stochastic:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(jnp.asarray(rng_seed, jnp.int32).reshape(1))
    inputs += arrs
    in_specs += [hbm] * 8
    if has_src:
        inputs.append(src_pre)
        in_specs.append(hbm)

    out = pl.pallas_call(
        body,
        grid=(nt1 + 1, nt2),
        in_specs=in_specs,
        out_specs=hbm,
        out_shape=jax.ShapeDtypeStruct((n_pad, P1, P2), dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)

    if p1 or p2 or pn:
        out = out[:n, :b1, :b2]
    return out
