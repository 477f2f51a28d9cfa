"""Fused explicit-theta-pass + x-sweep Pallas kernel.

The theta-scheme ADI step (reference adi3d_numba_coeff.py:290-302) computes
``R0 = T + c (Lx+Ly+Lz) T`` and immediately consumes it as the x-sweep RHS —
the stencil kernel writes 4 B/cell of R0 that the sweep kernel re-reads, and
both decode the same mask state.  This kernel fuses the two: chunks of T
stream from HBM once, the masked Laplacian is computed in-registers (mask
structure from ONE augmented code byte — ``sweep_code(stencil_bits=True)``
packs all six neighbor couplings plus pin/in-mask), and the result feeds the
fused Thomas recurrence directly.  Drops the step's HBM traffic model from
~44 to ~35 B/cell and removes one kernel launch.

Streaming layout (per (8, B2) batch tile of the (n, B1, B2) x-sweep layout):

  * the center chunk DMA reads ``cn + 1`` line positions (one row of x-high
    overlap; ~1.6% re-read at cn=64) — the x-low neighbor of a chunk's first
    row is carried in registers across chunks;
  * y/z neighbor VALUES come from four thin halo DMAs per chunk
    ((cn, 1, B2) sublane rows at tile-row ∓1; (cn, 8, 1) lane columns at
    tile-column ∓1), with edge tiles CLAMPED to row/column 0 — always
    in-bounds, always finite, and the clamped garbage contribution is
    multiplied by the code's neighbor bit, which is 0 exactly where the
    clamp engaged (domain edges have no coupling, sweep_code fill=False);
  * y/z neighbor MASKS need no halos at all: bits 16/32/64/128 of the
    center cell's own code byte.

The accumulation order (x, then y, then z; masks as 0/1 multiplies) matches
solvers/pallas_stencil.theta_rhs term-for-term, so the fused kernel is
BITWISE identical to the unfused stencil + sweep chain (asserted in
tests/test_theta_sweep.py).

Scope: the plan-lite configuration (scalar-h Robin, no Neumann, no
Dirichlet) — the flagship WAAM BC set.  bf16 states solve at f32 and store
bf16 (optionally stochastically rounded, seeded per tile).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_theta_sweep_axis0"]


def _round_up(v, m):
    return -(-v // m) * m


def _theta_sweep_kernel(scal_ref, seed_ref, T_hbm, code_hbm, out_hbm,
                        xbuf, dpbuf, Tbuf, cbuf, ylbuf, yhbuf, zlbuf, zhbuf,
                        obuf, in_sem, out_sem, *, n, cn, b1, b2, grp_rows):
    """scal layout (SMEM, compute dtype):
    [0]=theta_gam_x [1]=dt [2]=t_inf [3]=rob_c_x [4]=c_exp [5..7]=inv_d2."""
    tg = scal_ref[0]
    dt = scal_ref[1]
    t_inf = scal_ref[2]
    rob_c = scal_ref[3]
    c_exp = scal_ref[4]
    iv_x, iv_y, iv_z = scal_ref[5], scal_ref[6], scal_ref[7]
    f32 = xbuf.dtype                 # compute dtype
    mixed = obuf is not None
    stochastic = seed_ref is not None
    i = pl.program_id(0)
    j = pl.program_id(1)
    r0 = i * b1
    c0 = j * b2
    # clamped halo source rows/columns; the code's neighbor bits are zero
    # wherever the clamp engages (domain edge), so the duplicated (finite)
    # values never contribute
    rym1 = jnp.maximum(r0 - 1, 0)
    ryp = jnp.minimum(r0 + b1, pl.num_programs(0) * b1 - 1)
    czm1 = jnp.maximum(c0 - 1, 0)
    czp = jnp.minimum(c0 + b2, pl.num_programs(1) * b2 - 1)
    nchunks = n // cn
    if stochastic:
        pltpu.prng_seed(seed_ref[0] + i * pl.num_programs(1) + j)

    def in_dmas(slot, k):
        s = k * cn
        # last chunk: no x-overlap row exists (row n would be OOB); its
        # absence is safe because row n-1 has no x-high coupling, but the
        # stale buffer row cn is explicitly zeroed before the group loop
        nrow = cn + 1 if k + 1 < nchunks else cn
        return (
            pltpu.make_async_copy(
                T_hbm.at[pl.ds(s, nrow), pl.ds(r0, b1), pl.ds(c0, b2)],
                Tbuf.at[slot, pl.ds(0, nrow)], in_sem.at[slot, 0]),
            pltpu.make_async_copy(
                code_hbm.at[pl.ds(s, cn), pl.ds(r0, b1), pl.ds(c0, b2)],
                cbuf.at[slot], in_sem.at[slot, 1]),
            pltpu.make_async_copy(
                T_hbm.at[pl.ds(s, cn), pl.ds(rym1, 1), pl.ds(c0, b2)],
                ylbuf.at[slot], in_sem.at[slot, 2]),
            pltpu.make_async_copy(
                T_hbm.at[pl.ds(s, cn), pl.ds(ryp, 1), pl.ds(c0, b2)],
                yhbuf.at[slot], in_sem.at[slot, 3]),
            pltpu.make_async_copy(
                T_hbm.at[pl.ds(s, cn), pl.ds(r0, b1), pl.ds(czm1, 1)],
                zlbuf.at[slot], in_sem.at[slot, 4]),
            pltpu.make_async_copy(
                T_hbm.at[pl.ds(s, cn), pl.ds(r0, b1), pl.ds(czp, 1)],
                zhbuf.at[slot], in_sem.at[slot, 5]),
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

    one = jnp.ones((), f32)
    zero_s = jnp.zeros((), f32)
    zero = jnp.zeros((b1, b2), f32)
    G = grp_rows
    carry = (zero, zero, zero)       # cp, dp, T(x-1) plane
    for k in range(nchunks):
        slot = k % 2
        for dma in in_dmas(slot, k):
            dma.wait()
        if k + 1 == nchunks:
            # the last chunk has no x-overlap row; the stale/uninitialized
            # buffer row cn could hold NaN bit patterns and 0 * NaN would
            # poison row n-1 (its x-high bit is 0 only as a multiplier)
            Tbuf[slot, cn] = jnp.zeros(Tbuf.shape[2:], Tbuf.dtype)

        def grp(g, carry, *, slot=slot, base=k * cn):
            cp_prev, dp_prev, T_prev = carry
            s = g * G
            Tg = Tbuf[slot, pl.ds(s, G + 1)].astype(f32)    # (G+1, b1, b2)
            code_g = cbuf[slot, pl.ds(s, G)].astype(jnp.int32)
            low = jnp.where((code_g & 1) > 0, one, zero_s)
            high = jnp.where((code_g & 2) > 0, one, zero_s)
            inm = jnp.where((code_g & 8) > 0, one, zero_s)
            T_c = Tg[:G]
            # explicit theta pass, accumulated in the SAME order as
            # pallas_stencil._theta_rhs_kernel (x, then y, then z) so the
            # fused RHS is bitwise the unfused one
            T_xlo = jnp.concatenate([T_prev[None], Tg[:G - 1]], axis=0)
            sx = low * T_xlo + high * Tg[1:G + 1]
            acc = (sx - (low + high) * T_c) * iv_x
            m_ylo = jnp.where((code_g & 16) > 0, one, zero_s)
            m_yhi = jnp.where((code_g & 32) > 0, one, zero_s)
            T_ylo = jnp.concatenate(
                [ylbuf[slot, pl.ds(s, G)].astype(f32), T_c[:, :b1 - 1, :]],
                axis=1)
            T_yhi = jnp.concatenate(
                [T_c[:, 1:, :], yhbuf[slot, pl.ds(s, G)].astype(f32)],
                axis=1)
            sy = m_ylo * T_ylo + m_yhi * T_yhi
            acc = acc + (sy - (m_ylo + m_yhi) * T_c) * iv_y
            m_zlo = jnp.where((code_g & 64) > 0, one, zero_s)
            m_zhi = jnp.where((code_g & 128) > 0, one, zero_s)
            T_zlo = jnp.concatenate(
                [zlbuf[slot, pl.ds(s, G)].astype(f32), T_c[:, :, :b2 - 1]],
                axis=2)
            T_zhi = jnp.concatenate(
                [T_c[:, :, 1:], zhbuf[slot, pl.ds(s, G)].astype(f32)],
                axis=2)
            sz = m_zlo * T_zlo + m_zhi * T_zhi
            acc = acc + (sz - (m_zlo + m_zhi) * T_c) * iv_z
            d_g = T_c + (c_exp * inm) * acc
            # plan-lite sweep coefficients (as _sweep_kernel_v2, lite mode)
            cf_g = rob_c * ((2.0 - low - high) * inm)
            a_g = -tg * low
            c_g = -tg * high
            dtcf = dt * cf_g
            b_g = 1.0 + tg * (low + high) + dtcf
            dd_g = d_g + dtcf * t_inf
            cps, dps = [], []
            for r in range(G):
                inv = 1.0 / (b_g[r] - a_g[r] * cp_prev)
                cp_prev = c_g[r] * inv
                dp_prev = (dd_g[r] - a_g[r] * dp_prev) * inv
                cps.append(cp_prev)
                dps.append(dp_prev)
            xbuf[pl.ds(base + s, G)] = jnp.stack(cps)
            dpbuf[pl.ds(base + s, G)] = jnp.stack(dps)
            return cp_prev, dp_prev, Tg[G - 1]

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


def _body(kern, *, stochastic, mixed):
    """Positional-ref adapter: maps the pallas_call ref list (which omits
    the seed/obuf refs depending on mode) onto the kernel signature."""
    def body(*refs):
        it = iter(refs)
        scal = next(it)
        seed = next(it) if stochastic else None
        T = next(it)
        c = next(it)
        o = next(it)
        xb, dp, Tb, cb, yl, yh, zl, zh = (next(it) for _ in range(8))
        ob = next(it) if mixed else None
        isem, osem = next(it), next(it)
        return kern(scal, seed, T, c, o, xb, dp, Tb, cb, yl, yh, zl, zh,
                    ob, isem, osem)
    return body


def _theta_sweep_ring_kernel(scal_ref, seed_ref, T_hbm, code_hbm, out_hbm,
                             ring, cbuf, xbuf, dpbuf, obuf, yrow,
                             in_sem, code_sem, out_sem, *,
                             n, b1, b2, nt1, nt2, R, stochastic):
    """Ring-buffer formulation of the fused theta+x-sweep — ZERO halo DMAs.

    The TPU Pallas grid is a sequential loop and VMEM scratch persists
    across grid steps, so neighbor VALUES at batch-tile boundaries can come
    from tiles that are simply still resident: grid = (nt1+1, nt2) walks the
    (y, z) batch tiles row-major while ``ring`` keeps the last R = nt2+3
    full-line T tiles (n+G, b1, b2).  The tile loaded at step s is COMPLETED
    (theta RHS + x-sweep) at step s+nt2, when all four of its neighbors are
    available:

      y-lo : row b1-1 of tile (i-1, j), saved to ``yrow[j]`` when that tile
             was completed one i-row earlier (zero HBM cost);
      y-hi : row 0 of tile (i+1, j) = the tile loaded THIS step;
      z-lo / z-hi : boundary lanes of tiles c-1 / c+1, both still in the
             ring (their coupling code bits are 0 at domain edges, so the
             wrong-column values read at j wrap-around never contribute).

    HBM traffic: read T (4 B) + code (1 B) + write U (4 B) = 9 B/cell — the
    same per-pass cost as the plain stencil kernel, with the whole x-sweep
    riding along.  This replaces the thin-halo-DMA design whose (cn, 1, b2)
    sub-tile slices Mosaic rejects on real hardware at some shapes.

    Accumulation order (x, then y, then z, masks as 0/1 multiplies) is
    identical to solvers/pallas_stencil.theta_rhs, so the result is BITWISE
    the unfused stencil + sweep chain (tests/test_theta_sweep.py).

    DMA protocol (single-slot, one in flight per stream): load(s) waited at
    step s, load(s+1) started right after; code(c) waited before the
    forward pass, code(c+1) started after it (cbuf is single-slot — the
    start must follow the last cbuf read); out(c-1) waited before obuf is
    restaged, out(c) started after the backward pass."""
    tg = scal_ref[0]
    dt = scal_ref[1]
    t_inf = scal_ref[2]
    rob_c = scal_ref[3]
    c_exp = scal_ref[4]
    iv_x, iv_y, iv_z = scal_ref[5], scal_ref[6], scal_ref[7]
    f32 = xbuf.dtype
    G = 8
    i = pl.program_id(0)
    j = pl.program_id(1)
    s = i * nt2 + j                       # linear grid step
    ntiles = nt1 * nt2
    first = (i == 0) & (j == 0)
    last = (i == nt1) & (j == nt2 - 1)

    def tile_coords(t):
        """(row0, col0) of linear tile t (traced)."""
        return (t // nt2) * b1, (t % nt2) * b2

    def load_dma(t):
        r0, c0 = tile_coords(t)
        return pltpu.make_async_copy(
            T_hbm.at[:, pl.ds(r0, b1), pl.ds(c0, b2)],
            ring.at[t % R, pl.ds(0, n)], in_sem)

    def code_dma(t):
        r0, c0 = tile_coords(t)
        return pltpu.make_async_copy(
            code_hbm.at[:, pl.ds(r0, b1), pl.ds(c0, b2)], cbuf, code_sem)

    def out_dma(t):
        r0, c0 = tile_coords(t)
        return pltpu.make_async_copy(
            obuf, out_hbm.at[:, pl.ds(r0, b1), pl.ds(c0, b2)], out_sem)

    @pl.when(first)
    def _init():
        # zero the ring (pad rows n..n+G stay zero forever -> the x-overlap
        # read at the last group is finite; slot R-1 is read as z-lo of
        # tile 0 before any load targets it) and the y-lo row carries
        for r in range(R):
            ring[r] = jnp.zeros_like(ring[r])
        yrow[...] = jnp.zeros_like(yrow)
        load_dma(0).start()

    # loads: wait this step's tile, then prefetch the next one
    @pl.when(i < nt1)
    def _wait_load():
        load_dma(s).wait()

    jp1 = j + 1
    wrap = jp1 == nt2
    i2 = i + wrap.astype(jnp.int32)
    s2 = s + 1

    @pl.when(i2 < nt1)
    def _start_load():
        load_dma(s2).start()

    @pl.when(s == nt2 - 1)
    def _first_code():
        code_dma(0).start()

    @pl.when(i >= 1)
    def _complete():
        c = s - nt2                       # tile being completed
        sc = c % R
        sp = (c - 1) % R                  # z-lo source (j wrap: code bit 0)
        shi = (c + 1) % R                 # z-hi source
        scur = s % R                      # y-hi source (row 0 of tile s)
        code_dma(c).wait()
        if stochastic:
            pltpu.prng_seed(seed_ref[0] + c)

        @pl.when(i * nt2 + j >= nt2 + 1)
        def _wait_prev_out():
            out_dma(c - 1).wait()

        one = jnp.ones((), f32)
        zero_s = jnp.zeros((), f32)
        zero = jnp.zeros((b1, b2), f32)

        def grp(g, carry):
            cp_prev, dp_prev, T_prev = carry
            gs = g * G
            Tg = ring[sc, pl.ds(gs, G + 1)].astype(f32)     # (G+1, b1, b2)
            code_g = cbuf[pl.ds(gs, G)].astype(jnp.int32)
            low = jnp.where((code_g & 1) > 0, one, zero_s)
            high = jnp.where((code_g & 2) > 0, one, zero_s)
            inm = jnp.where((code_g & 8) > 0, one, zero_s)
            T_c = Tg[:G]
            # explicit theta pass, accumulated in the SAME order as
            # pallas_stencil._theta_rhs_kernel (x, then y, then z) so the
            # fused RHS is bitwise the unfused one
            T_xlo = jnp.concatenate([T_prev[None], Tg[:G - 1]], axis=0)
            sx = low * T_xlo + high * Tg[1:G + 1]
            acc = (sx - (low + high) * T_c) * iv_x
            m_ylo = jnp.where((code_g & 16) > 0, one, zero_s)
            m_yhi = jnp.where((code_g & 32) > 0, one, zero_s)
            ylo_g = yrow[j, pl.ds(gs, G)].astype(f32)[:, None, :]
            yhi_g = ring[scur, pl.ds(gs, G), 0:1, :].astype(f32)
            T_ylo = jnp.concatenate([ylo_g, T_c[:, :b1 - 1, :]], axis=1)
            T_yhi = jnp.concatenate([T_c[:, 1:, :], yhi_g], axis=1)
            sy = m_ylo * T_ylo + m_yhi * T_yhi
            acc = acc + (sy - (m_ylo + m_yhi) * T_c) * iv_y
            m_zlo = jnp.where((code_g & 64) > 0, one, zero_s)
            m_zhi = jnp.where((code_g & 128) > 0, one, zero_s)
            zlo_g = ring[sp, pl.ds(gs, G), :, b2 - 1:b2].astype(f32)
            zhi_g = ring[shi, pl.ds(gs, G), :, 0:1].astype(f32)
            T_zlo = jnp.concatenate([zlo_g, T_c[:, :, :b2 - 1]], axis=2)
            T_zhi = jnp.concatenate([T_c[:, :, 1:], zhi_g], axis=2)
            sz = m_zlo * T_zlo + m_zhi * T_zhi
            acc = acc + (sz - (m_zlo + m_zhi) * T_c) * iv_z
            d_g = T_c + (c_exp * inm) * acc
            # plan-lite sweep coefficients (as _sweep_kernel_v2, lite mode)
            cf_g = rob_c * ((2.0 - low - high) * inm)
            a_g = -tg * low
            c_g = -tg * high
            dtcf = dt * cf_g
            b_g = 1.0 + tg * (low + high) + dtcf
            dd_g = d_g + dtcf * t_inf
            cps, dps = [], []
            for r in range(G):
                inv = 1.0 / (b_g[r] - a_g[r] * cp_prev)
                cp_prev = c_g[r] * inv
                dp_prev = (dd_g[r] - a_g[r] * dp_prev) * inv
                cps.append(cp_prev)
                dps.append(dp_prev)
            xbuf[pl.ds(gs, G)] = jnp.stack(cps)
            dpbuf[pl.ds(gs, G)] = jnp.stack(dps)
            return cp_prev, dp_prev, Tg[G - 1]

        lax.fori_loop(0, n // G, grp, (zero, zero, zero))
        # save this tile's top row as the y-lo halo for tile (i, j) (read
        # happens above, BEFORE this overwrite — same-step order is safe)
        yrow[j] = ring[sc, pl.ds(0, n), b1 - 1, :]

        @pl.when(c + 1 < ntiles)
        def _next_code():
            code_dma(c + 1).start()

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
                                             "block_b2", "chunk",
                                             "grp_rows", "ring"))
def fused_theta_sweep_axis0(T, code, c_exp, inv_d2, theta_gam, dt, t_inf,
                            rob_c, rng_seed=None, *, interpret: bool = False,
                            block_b1: int = 8, block_b2: int | None = None,
                            chunk: int = 64, grp_rows: int = 8,
                            ring: bool = True):
    """``U = A_x^{-1} [(I + c_exp L) T + dt*cf*t_inf]`` in one fused pass:
    the explicit masked-Laplacian theta-RHS and the plan-lite x-sweep.

    T : (n, B1, B2) field in the x-sweep layout (natural (x, y, z)).
    code : int8 codes from ``sweep_code(mask, None, 0, stencil_bits=True)``.
    c_exp : ``dt * kappa * (1 - theta)``; inv_d2 : per-axis ``1/d^2`` (3,).
    theta_gam : ``theta * kappa * dt * inv_d2[0]``; rob_c : per-exposed-face
    Robin sink ``h/(rho cp dx)`` for THIS axis.

    ``ring`` (default): the ring-buffer kernel — a true 9 B/cell pass with
    no halo DMAs (see _theta_sweep_ring_kernel).  ``ring=False`` keeps the
    thin-halo-DMA variant, whose sub-tile halo slices Mosaic rejects on
    real hardware at some shapes — retained for A/B only.

    Restrictions (callers fall back to the unfused chain otherwise): no
    Neumann fold, no Dirichlet pins, plan-lite only."""
    n, b1, b2 = T.shape
    dtype = T.dtype

    if block_b2 is None:
        cands = [c for c in (256, 128) if n <= 640 or c == 128]
        block_b2 = min(cands, key=lambda c: (_round_up(b2, c), -c))

    if ring:
        return _theta_sweep_ring(T, code, c_exp, inv_d2, theta_gam, dt,
                                 t_inf, rob_c, rng_seed,
                                 interpret=interpret, block_b1=block_b1,
                                 block_b2=block_b2)
    cn = min(chunk, _round_up(n, grp_rows))
    pn = _round_up(n, cn) - n
    p1 = _round_up(b1, block_b1) - b1
    p2 = _round_up(b2, block_b2) - b2
    if p1 or p2 or pn:
        pad = ((0, pn), (0, p1), (0, p2))
        T = jnp.pad(T, pad)       # pad cells: code 0 -> identity rows, no
        code = jnp.pad(code, pad)  # couplings into or out of the padding
    n_pad, P1, P2 = T.shape

    cdt = jnp.promote_types(dtype, jnp.float32)
    mixed = cdt != dtype
    inv3 = jnp.broadcast_to(jnp.asarray(inv_d2), (3,)).astype(cdt)
    scal = jnp.concatenate([
        jnp.stack([jnp.asarray(theta_gam, cdt), jnp.asarray(dt, cdt),
                   jnp.asarray(t_inf, cdt), jnp.asarray(rob_c, cdt),
                   jnp.asarray(c_exp, cdt)]), inv3])

    grid = (P1 // block_b1, P2 // block_b2)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    stochastic = mixed and rng_seed is not None

    kern = functools.partial(_theta_sweep_kernel, n=n_pad, cn=cn,
                             b1=block_b1, b2=block_b2, grp_rows=grp_rows)
    scratch = [
        pltpu.VMEM((n_pad, block_b1, block_b2), cdt),            # x / cp
        pltpu.VMEM((n_pad, block_b1, block_b2), cdt),            # dp
        pltpu.VMEM((2, cn + 1, block_b1, block_b2), dtype),      # T chunks
        pltpu.VMEM((2, cn, block_b1, block_b2), jnp.int8),       # codes
        pltpu.VMEM((2, cn, 1, block_b2), dtype),                 # y-lo halo
        pltpu.VMEM((2, cn, 1, block_b2), dtype),                 # y-hi halo
        pltpu.VMEM((2, cn, block_b1, 1), dtype),                 # z-lo halo
        pltpu.VMEM((2, cn, block_b1, 1), dtype),                 # z-hi halo
    ]
    if mixed:
        scratch.append(pltpu.VMEM((2, cn, block_b1, block_b2), dtype))
    scratch += [pltpu.SemaphoreType.DMA((2, 6)),
                pltpu.SemaphoreType.DMA((n_pad // cn,))]

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    inputs = [scal]
    if stochastic:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(jnp.asarray(rng_seed, jnp.int32).reshape(1))
    in_specs += [hbm, hbm]
    inputs += [T, code]

    out = pl.pallas_call(
        _body(kern, stochastic=stochastic, mixed=mixed),
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


def _theta_sweep_ring(T, code, c_exp, inv_d2, theta_gam, dt, t_inf, rob_c,
                      rng_seed, *, interpret: bool, block_b1: int,
                      block_b2: int):
    """Ring-buffer dispatch of fused_theta_sweep_axis0 (see
    _theta_sweep_ring_kernel).  Grid (nt1+1, nt2) is SEQUENTIAL on TPU
    ("arbitrary" dimension semantics), which the ring protocol requires."""
    n, b1, b2 = T.shape
    dtype = T.dtype
    G = 8

    pn = _round_up(n, G) - n
    p1 = _round_up(b1, block_b1) - b1
    p2 = _round_up(b2, block_b2) - b2
    if p1 or p2 or pn:
        pad = ((0, pn), (0, p1), (0, p2))
        T = jnp.pad(T, pad)        # pad cells: code 0 -> identity rows, no
        code = jnp.pad(code, pad)  # couplings into or out of the padding
    n_pad, P1, P2 = T.shape
    nt1 = P1 // block_b1
    nt2 = P2 // block_b2
    R = nt2 + 3   # ring depth: completion lags the load by nt2 steps and
    #               reads slots {c-1, c, c+1, s}; the in-flight load targets
    #               (s+1) % R, distinct from all four for R = nt2+3

    cdt = jnp.promote_types(dtype, jnp.float32)
    mixed = cdt != dtype
    stochastic = mixed and rng_seed is not None
    inv3 = jnp.broadcast_to(jnp.asarray(inv_d2), (3,)).astype(cdt)
    scal = jnp.concatenate([
        jnp.stack([jnp.asarray(theta_gam, cdt), jnp.asarray(dt, cdt),
                   jnp.asarray(t_inf, cdt), jnp.asarray(rob_c, cdt),
                   jnp.asarray(c_exp, cdt)]), inv3])

    hbm = pl.BlockSpec(memory_space=pl.ANY)
    kern = functools.partial(
        _theta_sweep_ring_kernel, n=n_pad, b1=block_b1, b2=block_b2,
        nt1=nt1, nt2=nt2, R=R, stochastic=stochastic)

    def body(*refs):
        it = iter(refs)
        scal_ = next(it)
        seed = next(it) if stochastic else None
        T_, c_, o_ = next(it), next(it), next(it)
        ring, cb, xb, dp, ob, yr = (next(it) for _ in range(6))
        isem, csem, osem = next(it), next(it), next(it)
        return kern(scal_, seed, T_, c_, o_, ring, cb, xb, dp, ob, yr,
                    isem, csem, osem)

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    inputs = [scal]
    if stochastic:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(jnp.asarray(rng_seed, jnp.int32).reshape(1))
    in_specs += [hbm, hbm]
    inputs += [T, code]

    out = pl.pallas_call(
        body,
        grid=(nt1 + 1, nt2),
        in_specs=in_specs,
        out_specs=hbm,
        out_shape=jax.ShapeDtypeStruct((n_pad, P1, P2), dtype),
        scratch_shapes=[
            pltpu.VMEM((R, n_pad + G, block_b1, block_b2), dtype),  # ring
            pltpu.VMEM((n_pad, block_b1, block_b2), jnp.int8),      # codes
            pltpu.VMEM((n_pad, block_b1, block_b2), cdt),           # cp
            pltpu.VMEM((n_pad, block_b1, block_b2), cdt),           # dp
            pltpu.VMEM((n_pad, block_b1, block_b2), dtype),         # out stage
            pltpu.VMEM((nt2, n_pad, block_b2), dtype),              # y-lo rows
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)

    if p1 or p2 or pn:
        out = out[:n, :b1, :b2]
    return out
