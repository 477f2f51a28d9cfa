"""Compressed variable-property FIELD-coefficient sweep kernels.

The first cylindrical varprop tier (step/cylindrical_varprop.py) materializes
per-cell a/b/c/d tridiagonal fields in XLA and solves them with the generic
field kernels (solvers/pallas_fields.fused_tridiag_fields): ~16 B/cell of
coefficient writes + 20 B/cell of kernel reads per sweep.  These kernels
rebuild the coefficients in registers from the PHYSICAL streams instead —
the same compression the Cartesian varprop kernels apply
(solvers/pallas_varprop.py), generalized to per-row geometry columns so the
cylindrical metric terms ride in SMEM:

    row i:  a_i = -dw_i * glo[i] * f_lo,   f_lo = f_hi of row i-1 (carried),
            c_i = -dw_i * ghi[i] * f_hi,   f_hi = fhi[i] (streamed),
            b_i = 1 + dw_i * (glo[i] f_lo + ghi[i] f_hi + sink_i),
            d_i = rhs_i + dw_i * srhs_i

with 5 streamed f32 fields (rhs, fhi, dw, sink, srhs) and one output:
24 B/cell/sweep, no coefficient materialization, no int8 code — boundary
semantics are carried by the DATA:

  * harmonic face conductivities are zero across void and at domain edges
    (step/cartesian_varprop._face_g), so the face-lag carry starts at 0 and
    void rows are identities holding their rhs;
  * Robin rows (domain boundary AND material/void interfaces, each against
    its own ambient) stream ``sink = sum h A/V`` and ``srhs = sum h A/V
    T_inf`` — exact mixed-ambient composition;
  * Dirichlet end rows zero their STATIC geometry column entries
    (glo[i] = ghi[i] = 0) and prefold the pin value into rhs — the shared
    face conductivity stays live, so the neighbor row keeps its coupling
    into the pinned value, bit-matching the scan formulation.

The sequential solve itself follows the chip-proven chunked-DMA structure
of solvers/pallas_fields._masked_sweep_kernel (double-buffered input
chunks, G=8 row groups, f32 cp/dp line buffers).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_vp_fields_sweep", "fused_vp_fields_cyclic_axis1"]


def _round_up(v, m):
    return -(-v // m) * m


def _vp_fields_kernel(glo_ref, ghi_ref, d_hbm, f_hbm, w_hbm, sink_hbm,
                      srhs_hbm, out_hbm, xbuf, dpbuf, dbuf, fbuf, wbuf,
                      sbuf, rbuf, tbuf, qbuf, obuf, in_sem, out_sem, *,
                      n, cn, b1, b2):
    """Open-line sweep along axis 0 of (n, B1, B2) streams (docstring).

    ``tbuf/qbuf/obuf`` non-None = NATURAL rhs/out mode (the cylindrical z
    solve without its transpose pair): the rhs is read from a NATURAL
    (B1, B2, n) array — chunks land in tbuf and are relaid in VMEM via b1
    independent 2-D lane<->sublane transposes (chip-gated pattern,
    scripts/znat_chip.py) — and the solution is restaged through obuf back
    to the natural layout.  The derived streams (fhi/dw/sink/srhs) keep
    the solve-axis-leading layout they are rebuilt in (session H)."""
    f32 = xbuf.dtype
    nat = tbuf is not None            # natural-layout rhs/out
    i = pl.program_id(0)
    j = pl.program_id(1)
    r0 = i * b1
    c0 = j * b2
    nchunks = n // cn
    G = 8

    def in_dmas(slot, k):
        s = k * cn
        src = lambda ref: ref.at[pl.ds(s, cn), pl.ds(r0, b1), pl.ds(c0, b2)]
        d_dma = (pltpu.make_async_copy(
            d_hbm.at[pl.ds(r0, b1), pl.ds(c0, b2), pl.ds(s, cn)],
            tbuf.at[slot], in_sem.at[slot, 0]) if nat else
            pltpu.make_async_copy(src(d_hbm), dbuf.at[slot],
                                  in_sem.at[slot, 0]))
        return (
            d_dma,
            pltpu.make_async_copy(src(f_hbm), fbuf.at[slot],
                                  in_sem.at[slot, 1]),
            pltpu.make_async_copy(src(w_hbm), wbuf.at[slot],
                                  in_sem.at[slot, 2]),
            pltpu.make_async_copy(src(sink_hbm), sbuf.at[slot],
                                  in_sem.at[slot, 3]),
            pltpu.make_async_copy(src(srhs_hbm), rbuf.at[slot],
                                  in_sem.at[slot, 4]),
        )

    def out_dma(k):
        s = k * cn
        if nat:
            return pltpu.make_async_copy(
                obuf.at[k % 2],
                out_hbm.at[pl.ds(r0, b1), pl.ds(c0, b2), pl.ds(s, cn)],
                out_sem.at[k])
        return pltpu.make_async_copy(
            xbuf.at[pl.ds(s, cn)],
            out_hbm.at[pl.ds(s, cn), pl.ds(r0, b1), pl.ds(c0, b2)],
            out_sem.at[k])

    for dma in in_dmas(0, 0):
        dma.start()
    if nchunks > 1:
        for dma in in_dmas(1, 1):
            dma.start()

    zero = jnp.zeros((b1, b2), f32)
    # carry: (cp_prev, dp_prev, f_lo of the next row = f_hi of this row)
    carry = (zero, zero, zero)
    for k in range(nchunks):
        slot = k % 2
        for dma in in_dmas(slot, k):
            dma.wait()
        if nat:
            # (b1, b2, cn) -> (b1, cn, b2): b1 independent 2-D transposes
            for r in range(b1):
                qbuf[r] = jnp.transpose(tbuf[slot][r], (1, 0)).astype(f32)

        def grp(g, carry, *, slot=slot, base=k * cn):
            cp_prev, dp_prev, f_lo = carry
            s = g * G
            d_g = (jnp.swapaxes(qbuf[:, pl.ds(s, G)], 0, 1) if nat
                   else dbuf[slot, pl.ds(s, G)].astype(f32))
            f_g = fbuf[slot, pl.ds(s, G)].astype(f32)
            w_g = wbuf[slot, pl.ds(s, G)].astype(f32)
            sink_g = sbuf[slot, pl.ds(s, G)].astype(f32)
            srhs_g = rbuf[slot, pl.ds(s, G)].astype(f32)
            cps, dps = [], []
            for r in range(G):
                glo = glo_ref[base + s + r]
                ghi = ghi_ref[base + s + r]
                f_hi = f_g[r]
                al = glo * f_lo
                ch = ghi * f_hi
                dw_r = w_g[r]
                a_r = -dw_r * al
                c_r = -dw_r * ch
                b_r = 1.0 + dw_r * (al + ch + sink_g[r])
                d_r = d_g[r] + dw_r * srhs_g[r]
                inv = 1.0 / (b_r - a_r * cp_prev)
                cp_prev = c_r * inv
                dp_prev = (d_r - a_r * dp_prev) * inv
                cps.append(cp_prev)
                dps.append(dp_prev)
                f_lo = f_hi
            xbuf[pl.ds(base + s, G)] = jnp.stack(cps)
            dpbuf[pl.ds(base + s, G)] = jnp.stack(dps)
            return cp_prev, dp_prev, f_lo

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
        if nat:
            if k + 2 < nchunks:
                out_dma(k + 2).wait()          # staging slot free?
            xk = jnp.swapaxes(xbuf[pl.ds(base, cn)], 0, 1)   # (b1, cn, b2)
            for r in range(b1):
                obuf[k % 2, r] = jnp.transpose(xk[r], (1, 0)).astype(
                    obuf.dtype)
        out_dma(k).start()

    for k in range(min(nchunks, 2) if nat else nchunks):
        out_dma(k).wait()


def fused_vp_fields_sweep(rhs, fhi, dw, sink, srhs, geo_lo, geo_hi, *,
                          interpret: bool = False, block_b1: int = 8,
                          block_b2: int = 256, chunk: int = 64,
                          pipelined: bool | None = None,
                          nat_rhs_out: bool = False):
    """Variable-property implicit sweep along axis 0 of (n, B1, B2) arrays
    with per-row geometry columns (module docstring).

    rhs:    right-hand side; void rows hold their old value, Dirichlet end
            rows hold the (act-gated) pin value.
    fhi:    hi-face harmonic conductivity field (zero across void/domain
            edges); the lo face of row i is fhi[i-1], carried in-kernel.
    dw:     per-cell dt / (rho cp(T^n)).
    sink:   per-cell sum of Robin films h*(A/V) (geometry included, dw NOT).
    srhs:   per-cell sum of h*(A/V)*T_inf (matching ambients per surface).
    geo_lo/geo_hi: (n,) static metric columns (r_imh/(r dr^2) etc.); zeroed
            entries express Dirichlet end rows.
    nat_rhs_out: rhs is passed — and the solution returned — in the
            NATURAL (B1, B2, n) layout; the kernel relays chunks in VMEM
            (no step-level transpose pair).  The derived streams stay
            solve-axis-leading.
    """
    if nat_rhs_out:
        b1, b2, n = rhs.shape
    else:
        n, b1, b2 = rhs.shape
    dtype = rhs.dtype
    if jnp.dtype(dtype).itemsize < 4:
        raise ValueError(
            "fused_vp_fields kernels take f32/f64 streams (their stores "
            "and line buffers are f32); upcast sub-f32 states first — "
            "adi_step_cyl_varprop does this automatically")
    if nat_rhs_out:
        # chunks slice the natural rhs's LANE dim: stay 128-aligned
        cn = max(128, min(_round_up(chunk, 128), _round_up(n, 128)))
    else:
        cn = min(chunk, _round_up(n, 8))
    pn = _round_up(n, cn) - n
    p1 = _round_up(b1, block_b1) - b1
    p2 = _round_up(b2, block_b2) - b2
    if p1 or p2 or pn:
        pad = ((0, pn), (0, p1), (0, p2))
        rhs = jnp.pad(rhs, ((0, p1), (0, p2), (0, pn)) if nat_rhs_out
                      else pad)
        fhi = jnp.pad(fhi, pad)    # zero faces -> padded rows identities
        dw = jnp.pad(dw, pad)
        sink = jnp.pad(sink, pad)
        srhs = jnp.pad(srhs, pad)
    if pn:
        geo_lo = jnp.pad(geo_lo, (0, pn))
        geo_hi = jnp.pad(geo_hi, (0, pn))
    n_pad, P1, P2 = fhi.shape
    cdt = jnp.promote_types(dtype, jnp.float32)

    grid = (P1 // block_b1, P2 // block_b2)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)

    # short lines (whole line = one chunk) have zero DMA/compute overlap in
    # the streaming form — pipeline across batch tiles instead whenever the
    # whole-line tile buffers fit (the masked family's measured ~18% win)
    itemsz = jnp.dtype(dtype).itemsize
    tile_bytes = n_pad * block_b1 * block_b2 * (
        2 * 5 * itemsz                  # 2 slots x 5 streams
        + 2 * jnp.dtype(cdt).itemsize   # cp/dp line buffers
        + itemsz)                       # obuf
    if pipelined is None:
        pipelined = (not nat_rhs_out and n_pad <= cn
                     and tile_bytes <= 48 * 1024 * 1024)

    if pipelined:
        scratch = [
            pltpu.VMEM((n_pad, block_b1, block_b2), cdt),        # x / cp
            pltpu.VMEM((n_pad, block_b1, block_b2), cdt),        # dp
            pltpu.VMEM((2, n_pad, block_b1, block_b2), dtype),   # rhs tiles
            pltpu.VMEM((2, n_pad, block_b1, block_b2), dtype),   # fhi tiles
            pltpu.VMEM((2, n_pad, block_b1, block_b2), dtype),   # dw tiles
            pltpu.VMEM((2, n_pad, block_b1, block_b2), dtype),   # sink tiles
            pltpu.VMEM((2, n_pad, block_b1, block_b2), dtype),   # srhs tiles
            pltpu.VMEM((n_pad, block_b1, block_b2), dtype),      # out stage
            pltpu.SemaphoreType.DMA((5,)),
            pltpu.SemaphoreType.DMA,
        ]
        out = pl.pallas_call(
            functools.partial(_vp_fields_pipe_kernel, n=n_pad,
                              b1=block_b1, b2=block_b2,
                              nt1=P1 // block_b1, nt2=P2 // block_b2),
            grid=grid,
            in_specs=[sspec, sspec, hbm, hbm, hbm, hbm, hbm],
            out_specs=hbm,
            out_shape=jax.ShapeDtypeStruct((n_pad, P1, P2), dtype),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(geo_lo.astype(cdt), geo_hi.astype(cdt), rhs, fhi, dw, sink, srhs)
        if p1 or p2 or pn:
            out = out[:n, :b1, :b2]
        return out

    nat = nat_rhs_out
    scratch = [
        pltpu.VMEM((n_pad, block_b1, block_b2), cdt),    # x / cp
        pltpu.VMEM((n_pad, block_b1, block_b2), cdt),    # dp
        (None if nat else
         pltpu.VMEM((2, cn, block_b1, block_b2), dtype)),  # rhs chunks
        pltpu.VMEM((2, cn, block_b1, block_b2), dtype),  # fhi chunks
        pltpu.VMEM((2, cn, block_b1, block_b2), dtype),  # dw chunks
        pltpu.VMEM((2, cn, block_b1, block_b2), dtype),  # sink chunks
        pltpu.VMEM((2, cn, block_b1, block_b2), dtype),  # srhs chunks
        (pltpu.VMEM((2, block_b1, block_b2, cn), dtype)
         if nat else None),                              # nat rhs in
        (pltpu.VMEM((block_b1, cn, block_b2), cdt)
         if nat else None),                              # relaid chunk
        (pltpu.VMEM((2, block_b1, block_b2, cn), dtype)
         if nat else None),                              # nat out stage
        pltpu.SemaphoreType.DMA((2, 5)),
        pltpu.SemaphoreType.DMA((n_pad // cn,)),
    ]

    def body(glo_r, ghi_r, d_r, f_r, w_r, sink_r, srhs_r, out_r,
             xb, dp, *rest):
        if nat:
            fb, wb, sb, rb, tb, qb, ob, isem, osem = rest
            db = None
        else:
            db, fb, wb, sb, rb, isem, osem = rest
            tb = qb = ob = None
        return _vp_fields_kernel(glo_r, ghi_r, d_r, f_r, w_r, sink_r,
                                 srhs_r, out_r, xb, dp, db, fb, wb, sb, rb,
                                 tb, qb, ob, isem, osem, n=n_pad, cn=cn,
                                 b1=block_b1, b2=block_b2)

    out = pl.pallas_call(
        body,
        grid=grid,
        in_specs=[sspec, sspec, hbm, hbm, hbm, hbm, hbm],
        out_specs=hbm,
        out_shape=jax.ShapeDtypeStruct((P1, P2, n_pad) if nat
                                       else (n_pad, P1, P2), dtype),
        scratch_shapes=[s for s in scratch if s is not None],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(geo_lo.astype(cdt), geo_hi.astype(cdt), rhs, fhi, dw, sink, srhs)

    if p1 or p2 or pn:
        out = (out[:b1, :b2, :n] if nat else out[:n, :b1, :b2])
    return out


def _vp_cyclic_axis1_kernel(geo_ref, d_hbm, flo_hbm, fhi_hbm, w_hbm,
                            sink_hbm, srhs_hbm, out_hbm, ybuf, zbuf, cpbuf,
                            dbuf, lbuf, hbuf, wbuf, sbuf, rbuf, bbuf, in_sem,
                            out_sem, *, n, n_pad, cn, b1, b2):
    """Variable-property CYCLIC sweep along AXIS 1 of (B1, n, B2) streams —
    the phi solve in the NATURAL (r, phi, z) layout.  Sherman-Morrison
    double solve exactly as pallas_fields._masked_cyclic_axis1_kernel, with
    the coefficients rebuilt from the physical streams:

        a_i = -dw_i geo f_lo[i],  c_i = -dw_i geo f_hi[i]
        b_i = 1 + dw_i (geo (f_lo[i] + f_hi[i]) + sink_i)
        d_i = rhs_i + dw_i srhs_i

    Forward (hi) faces: by periodicity f_hi[i] = f_lo[i+1 mod n], so when
    ``fhi_hbm is None`` the kernel DERIVES them from the flo stream — a
    register shift inside each row group, the pre-gathered group-boundary
    row ``bbuf[t] = flo[(t+1)G mod n]`` at group ends, and ``bbuf[-1] =
    flo[0]`` for the wrap row n-1.  This sheds the XLA roll pass AND the
    second face stream (~12 B/cell).  The streamed-fhi mode remains for
    non-periodic derivations."""
    f32 = ybuf.dtype
    derive = bbuf is not None   # fhi_hbm then carries the boundary rows
    i = pl.program_id(0)
    j = pl.program_id(1)
    r0 = i * b1
    c0 = j * b2
    nchunks = n_pad // cn
    G = 8
    geo = geo_ref[...].astype(f32)          # (b1, b2)

    def in_dmas(slot, k):
        s = k * cn
        src = lambda ref: ref.at[pl.ds(r0, b1), pl.ds(s, cn), pl.ds(c0, b2)]
        dmas = (
            pltpu.make_async_copy(src(d_hbm), dbuf.at[slot],
                                  in_sem.at[slot, 0]),
            pltpu.make_async_copy(src(flo_hbm), lbuf.at[slot],
                                  in_sem.at[slot, 1]),
            pltpu.make_async_copy(src(w_hbm), wbuf.at[slot],
                                  in_sem.at[slot, 3]),
            pltpu.make_async_copy(src(sink_hbm), sbuf.at[slot],
                                  in_sem.at[slot, 4]),
            pltpu.make_async_copy(src(srhs_hbm), rbuf.at[slot],
                                  in_sem.at[slot, 5]),
        )
        if not derive:
            dmas += (pltpu.make_async_copy(src(fhi_hbm), hbuf.at[slot],
                                           in_sem.at[slot, 2]),)
        return dmas

    def out_dma(k):
        s = k * cn
        return pltpu.make_async_copy(
            ybuf.at[:, pl.ds(s, cn), :],
            out_hbm.at[pl.ds(r0, b1), pl.ds(s, cn), pl.ds(c0, b2)],
            out_sem.at[k])

    if derive:
        # group-boundary rows + wrap row: ONE DMA per tile (sem slot (0,2)
        # is free in derive mode — the fhi stream is gone)
        bdma = pltpu.make_async_copy(
            fhi_hbm.at[:, pl.ds(r0, b1), pl.ds(c0, b2)],
            bbuf, in_sem.at[0, 2])
        bdma.start()
    for dma in in_dmas(0, 0):
        dma.start()
    if nchunks > 1:
        for dma in in_dmas(1, 1):
            dma.start()
    if derive:
        bdma.wait()

    zero = jnp.zeros((b1, b2), f32)
    carry = (zero, zero, zero, jnp.full((b1, b2), -1.0, f32), zero)
    for k in range(nchunks):
        slot = k % 2
        for dma in in_dmas(slot, k):
            dma.wait()

        def grp(g, carry, *, slot=slot, base=k * cn):
            cp_prev, dy_prev, dz_prev, gamma, beta = carry
            s = pl.multiple_of(g * G, G)
            sw = lambda ref: jnp.swapaxes(
                ref[slot, :, pl.ds(s, G), :], 0, 1).astype(f32)
            d_g, flo_g = sw(dbuf), sw(lbuf)
            w_g, sink_g, srhs_g = sw(wbuf), sw(sbuf), sw(rbuf)
            if derive:
                gt = k * (cn // G) + g       # global group index
                bnd_g = bbuf[gt].astype(f32)
                flo0 = bbuf[n_pad // G].astype(f32)
                fhi_rows = [flo_g[r + 1] for r in range(G - 1)] + [bnd_g]
            else:
                fhi_g = sw(hbuf)
                fhi_rows = [fhi_g[r] for r in range(G)]
            cps, dys, dzs = [], [], []
            for r in range(G):
                row = base + s + r
                first = row == 0
                last = row == n - 1
                dw_r = w_g[r]
                fhi_r = (jnp.where(last, flo0, fhi_rows[r]) if derive
                         else fhi_rows[r])
                al = dw_r * (geo * flo_g[r])
                ch = dw_r * (geo * fhi_r)
                b_r = 1.0 + dw_r * (geo * (flo_g[r] + fhi_r)
                                    + sink_g[r])
                d_r = d_g[r] + dw_r * srhs_g[r]
                gamma = jnp.where(first, -b_r, gamma)
                beta = jnp.where(first, -al, beta)
                alpha = -ch
                a_r = jnp.where(first, 0.0, -al)
                c_r = jnp.where(last, 0.0, -ch)
                b_r = b_r + jnp.where(first, -gamma, 0.0) \
                    + jnp.where(last, -alpha * beta / gamma, 0.0)
                u_r = jnp.where(first, gamma,
                                jnp.where(last, alpha, zero))
                inv = 1.0 / (b_r - a_r * cp_prev)
                cp_prev = c_r * inv
                dy_prev = (d_r - a_r * dy_prev) * inv
                dz_prev = (u_r - a_r * dz_prev) * inv
                cps.append(cp_prev)
                dys.append(dy_prev)
                dzs.append(dz_prev)
            cpbuf[:, pl.ds(base + s, G), :] = \
                jnp.swapaxes(jnp.stack(cps), 0, 1)
            ybuf[:, pl.ds(base + s, G), :] = \
                jnp.swapaxes(jnp.stack(dys), 0, 1)
            zbuf[:, pl.ds(base + s, G), :] = \
                jnp.swapaxes(jnp.stack(dzs), 0, 1)
            return cp_prev, dy_prev, dz_prev, gamma, beta

        carry = lax.fori_loop(0, cn // G, grp, carry)
        if k + 2 < nchunks:
            for dma in in_dmas(slot, k + 2):
                dma.start()

    _, _, _, gamma, beta = carry
    bcar = (zero, zero, zero, zero)         # y_next, z_next, yn, zn
    for k in range(nchunks - 1, -1, -1):
        base = k * cn

        def grp_b(gg, carry, *, base=base):
            y_next, z_next, yn, zn = carry
            s = pl.multiple_of((cn // G - 1 - gg) * G, G)
            cp_g = jnp.swapaxes(cpbuf[:, pl.ds(base + s, G), :], 0, 1)
            dy_g = jnp.swapaxes(ybuf[:, pl.ds(base + s, G), :], 0, 1)
            dz_g = jnp.swapaxes(zbuf[:, pl.ds(base + s, G), :], 0, 1)
            ys, zs = [None] * G, [None] * G
            for r in range(G - 1, -1, -1):
                row = base + s + r
                y_next = dy_g[r] - cp_g[r] * y_next
                z_next = dz_g[r] - cp_g[r] * z_next
                last = row == n - 1
                yn = jnp.where(last, y_next, yn)
                zn = jnp.where(last, z_next, zn)
                ys[r] = y_next
                zs[r] = z_next
            ybuf[:, pl.ds(base + s, G), :] = jnp.swapaxes(jnp.stack(ys), 0, 1)
            zbuf[:, pl.ds(base + s, G), :] = jnp.swapaxes(jnp.stack(zs), 0, 1)
            return y_next, z_next, yn, zn

        bcar = lax.fori_loop(0, cn // G, grp_b, bcar)

    y_next, z_next, yn, zn = bcar
    fact = (y_next + beta * yn / gamma) / (1.0 + z_next + beta * zn / gamma)

    for k in range(nchunks):
        base = k * cn

        def fix(g, _, *, base=base):
            s = pl.multiple_of(g * G, G)
            ybuf[:, pl.ds(base + s, G), :] = (
                ybuf[:, pl.ds(base + s, G), :]
                - fact[:, None, :] * zbuf[:, pl.ds(base + s, G), :])
            return 0

        lax.fori_loop(0, cn // G, fix, 0)
        out_dma(k).start()

    for k in range(nchunks):
        out_dma(k).wait()


def fused_vp_fields_cyclic_axis1(rhs, flo, fhi, dw, sink, srhs, geo, *,
                                 interpret: bool = False, block_b1: int = 8,
                                 block_b2: int = 128, chunk: int = 64):
    """Variable-property CYCLIC sweep along axis 1 of (B1, n, B2) arrays in
    the NATURAL layout (no transposes); see _vp_cyclic_axis1_kernel.

    flo/fhi: lo/hi-face harmonic conductivities along the periodic axis
    (flo[:, 0] and fhi[:, n-1] are the wrap faces; all-zero lines are
    identities — full-disk axis rows, void lines).  ``fhi=None`` derives
    the hi faces IN-KERNEL from flo by periodicity (f_hi[i] = f_lo[i+1
    mod n]) — sheds the XLA roll pass and the second face stream
    (~12 B/cell); pass an explicit fhi only when it is NOT the periodic
    shift of flo.
    geo: per-system (B1, B2) metric 1/(r dphi)^2 field.
    """
    import numpy as np

    b1, n, b2 = rhs.shape
    dtype = rhs.dtype
    if jnp.dtype(dtype).itemsize < 4:
        raise ValueError(
            "fused_vp_fields kernels take f32/f64 streams (their stores "
            "and line buffers are f32); upcast sub-f32 states first — "
            "adi_step_cyl_varprop does this automatically")
    derive = fhi is None
    cn = min(chunk, _round_up(n, 8))
    pn = _round_up(n, cn) - n
    p1 = _round_up(b1, block_b1) - b1
    p2 = _round_up(b2, block_b2) - b2
    if p1 or p2 or pn:
        pad = ((0, p1), (0, pn), (0, p2))
        rhs = jnp.pad(rhs, pad)
        flo = jnp.pad(flo, pad)    # zero faces -> padded rows identities
        if not derive:
            fhi = jnp.pad(fhi, pad)
        dw = jnp.pad(dw, pad)
        sink = jnp.pad(sink, pad)
        srhs = jnp.pad(srhs, pad)
        geo = jnp.pad(geo, ((0, p1), (0, p2)))
    P1, n_pad, P2 = rhs.shape
    cdt = jnp.promote_types(dtype, jnp.float32)
    G = 8
    if derive:
        # pre-gathered group-boundary rows (tiny: 1/G of the field) + the
        # wrap row flo[:, 0, :] in the last slot; layout (ng+1, B1, B2) so
        # per-group kernel reads index the UNTILED leading dim
        ng = n_pad // G
        idx = np.arange(1, ng + 1) * G
        idx = np.where(idx < n, idx, 0) % n   # rows past n-1: value unused
        fhi = jnp.moveaxis(
            jnp.concatenate([flo[:, idx, :], flo[:, :1, :]], axis=1), 1, 0)

    grid = (P1 // block_b1, P2 // block_b2)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    gspec = pl.BlockSpec((block_b1, block_b2), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((block_b1, n_pad, block_b2), cdt),    # y / dy
        pltpu.VMEM((block_b1, n_pad, block_b2), cdt),    # z / dz
        pltpu.VMEM((block_b1, n_pad, block_b2), cdt),    # cp
        pltpu.VMEM((2, block_b1, cn, block_b2), dtype),  # rhs chunks
        pltpu.VMEM((2, block_b1, cn, block_b2), dtype),  # flo chunks
        (None if derive else
         pltpu.VMEM((2, block_b1, cn, block_b2), dtype)),  # fhi chunks
        pltpu.VMEM((2, block_b1, cn, block_b2), dtype),  # dw chunks
        pltpu.VMEM((2, block_b1, cn, block_b2), dtype),  # sink chunks
        pltpu.VMEM((2, block_b1, cn, block_b2), dtype),  # srhs chunks
        (pltpu.VMEM((n_pad // G + 1, block_b1, block_b2), dtype)
         if derive else None),                           # boundary rows
        pltpu.SemaphoreType.DMA((2, 6)),
        pltpu.SemaphoreType.DMA((n_pad // cn,)),
    ]

    def body(geo_r, d_r, flo_r, fhi_r, w_r, sink_r, srhs_r, out_r, yb, zb,
             cpb, db, lb, *rest):
        if derive:
            wb, sb, rb, bb, isem, osem = rest
            hb = None
        else:
            hb, wb, sb, rb, isem, osem = rest
            bb = None
        return _vp_cyclic_axis1_kernel(
            geo_r, d_r, flo_r, fhi_r, w_r, sink_r, srhs_r, out_r, yb, zb,
            cpb, db, lb, hb, wb, sb, rb, bb, isem, osem,
            n=n, n_pad=n_pad, cn=cn, b1=block_b1, b2=block_b2)

    out = pl.pallas_call(
        body,
        grid=grid,
        in_specs=[gspec, hbm, hbm, hbm, hbm, hbm, hbm],
        out_specs=hbm,
        out_shape=jax.ShapeDtypeStruct((P1, n_pad, P2), dtype),
        scratch_shapes=[s for s in scratch if s is not None],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(geo.astype(cdt), rhs, flo, fhi, dw, sink, srhs)

    if p1 or p2 or pn:
        out = out[:b1, :n, :b2]
    return out


def _vp_fields_pipe_kernel(glo_ref, ghi_ref, d_hbm, f_hbm, w_hbm, sink_hbm,
                           srhs_hbm, out_hbm, xbuf, dpbuf, dbuf, fbuf, wbuf,
                           sbuf, rbuf, obuf, in_sem, out_sem, *,
                           n, b1, b2, nt1, nt2):
    """Cross-grid-step PIPELINED variant of _vp_fields_kernel for short
    lines (whole line = one chunk — e.g. the cylindrical r sweep's
    nr ~ 64): the per-program streaming form has ZERO DMA/compute overlap
    at nchunks == 1, so this form pipelines across batch tiles exactly
    like pallas_fields._masked_sweep_pipe_kernel — tile q+1 prefetches
    while q computes; q-1's output drains during q's forward pass."""
    f32 = xbuf.dtype
    G = 8
    i = pl.program_id(0)
    j = pl.program_id(1)
    q = i * nt2 + j
    ntiles = nt1 * nt2
    slot = q % 2

    def coords(t):
        return (t // nt2) * b1, (t % nt2) * b2

    def in_dmas(t):
        r0, c0 = coords(t)
        sl = t % 2
        src = lambda ref: ref.at[:, pl.ds(r0, b1), pl.ds(c0, b2)]
        return (
            pltpu.make_async_copy(src(d_hbm), dbuf.at[sl], in_sem.at[0]),
            pltpu.make_async_copy(src(f_hbm), fbuf.at[sl], in_sem.at[1]),
            pltpu.make_async_copy(src(w_hbm), wbuf.at[sl], in_sem.at[2]),
            pltpu.make_async_copy(src(sink_hbm), sbuf.at[sl], in_sem.at[3]),
            pltpu.make_async_copy(src(srhs_hbm), rbuf.at[sl], in_sem.at[4]),
        )

    def out_dma(t):
        r0, c0 = coords(t)
        return pltpu.make_async_copy(
            obuf, out_hbm.at[:, pl.ds(r0, b1), pl.ds(c0, b2)], out_sem)

    @pl.when(q == 0)
    def _first():
        for dma in in_dmas(0):
            dma.start()

    for dma in in_dmas(q):
        dma.wait()

    @pl.when(q + 1 < ntiles)
    def _prefetch():
        for dma in in_dmas(q + 1):
            dma.start()

    zero = jnp.zeros((b1, b2), f32)

    # compute body emitted twice under parity guards: static slot indices
    # keep the hot per-group loads statically addressed (pallas_fields
    # pipe-kernel note: a traced slot measured ~20% slower)
    def forward(sl):
        def grp(g, carry):
            cp_prev, dp_prev, f_lo = carry
            s = pl.multiple_of(g * G, G)
            d_g = dbuf[sl, pl.ds(s, G)].astype(f32)
            f_g = fbuf[sl, pl.ds(s, G)].astype(f32)
            w_g = wbuf[sl, pl.ds(s, G)].astype(f32)
            sink_g = sbuf[sl, pl.ds(s, G)].astype(f32)
            srhs_g = rbuf[sl, pl.ds(s, G)].astype(f32)
            cps, dps = [], []
            for r in range(G):
                glo = glo_ref[s + r]
                ghi = ghi_ref[s + r]
                f_hi = f_g[r]
                al = glo * f_lo
                ch = ghi * f_hi
                dw_r = w_g[r]
                a_r = -dw_r * al
                c_r = -dw_r * ch
                b_r = 1.0 + dw_r * (al + ch + sink_g[r])
                d_r = d_g[r] + dw_r * srhs_g[r]
                inv = 1.0 / (b_r - a_r * cp_prev)
                cp_prev = c_r * inv
                dp_prev = (d_r - a_r * dp_prev) * inv
                cps.append(cp_prev)
                dps.append(dp_prev)
                f_lo = f_hi
            xbuf[pl.ds(s, G)] = jnp.stack(cps)
            dpbuf[pl.ds(s, G)] = jnp.stack(dps)
            return cp_prev, dp_prev, f_lo

        lax.fori_loop(0, n // G, grp, (zero, zero, zero))

    @pl.when(slot == 0)
    def _fwd0():
        forward(0)

    @pl.when(slot == 1)
    def _fwd1():
        forward(1)

    @pl.when(q >= 1)
    def _drain_prev():
        out_dma(q - 1).wait()

    def grp_b(gg, x_next):
        s = pl.multiple_of((n // G - 1 - gg) * G, G)
        cp_g = xbuf[pl.ds(s, G)]
        dp_g = dpbuf[pl.ds(s, G)]
        xs = [None] * G
        for r in range(G - 1, -1, -1):
            x_next = dp_g[r] - cp_g[r] * x_next
            xs[r] = x_next
        obuf[pl.ds(s, G)] = jnp.stack(xs)
        return x_next

    lax.fori_loop(0, n // G, grp_b, zero)
    out_dma(q).start()

    @pl.when(q == ntiles - 1)
    def _drain_last():
        out_dma(q).wait()
