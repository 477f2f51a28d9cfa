"""Fused variable-property sweep kernel: coefficients built in-registers.

The variable-property ADI step (step/cartesian_varprop.py, reference has no
analogue — beyond-reference capability) needs per-cell tridiagonal
coefficients a/b/c derived from the temperature-dependent conductivity and
heat capacity:

    g_lo[i] = dt * fc[i] * w[i] / d_ax^2              (w = 1/(rho cp))
    g_hi[i] = dt * fc[i+1] * w[i] / d_ax^2
    a[i] = -theta*g_lo[i],  c[i] = -theta*g_hi[i]
    b[i] = 1 + theta*(g_lo+g_hi) + sink[i],  d[i] = rhs[i] + sink[i]*T_inf
    sink[i] = dt * h[i]/d_ax * w[i] * n_exposed[i]          (Robin faces)

where ``fc[i] = harm(k[i-1], k[i]) * coupled(i-1, i)`` is the PRE-MASKED
harmonic face conductivity along the sweep axis, computed once per step in
a fused XLA pass (step/cartesian_varprop.build_varprop_fields) and
streamed — the same bytes as streaming raw k(T), but the kernel sheds the
per-group harmonic build (a vector divide + shift/select chain, the
dominant op-count delta vs the constant-coefficient sweeps).

Materializing full a/b/c/d fields in XLA and solving with the generic
field-coefficient kernel costs ~350 B/cell/step (measured round 3:
1.0 Gcell/s at 384^3 through the engine).  This kernel instead streams only
``rhs + code + fc + w (+ h)`` = 17-21 B/cell and rebuilds a/b/c/d in
registers, reusing the plan-lite sweep codes (solvers/pallas_sweeps.
sweep_code: bits 1/2 = lo/hi coupling, 8 = in-mask; Dirichlet pins are NOT
supported here — the varprop flagship runs Robin-only).

Row i's UPPER coefficient needs fc[i+1], so the kernel runs ONE ROW
LAGGED: the group loading current rows [s, s+G) COMPLETES rows
[s-1, s+G-1) (their upper face is the newly loaded one).  Completed row r is stored at line-buffer index r+1, which
keeps every VMEM group store/load 8-row aligned; the output DMA simply
reads the line buffer at a +1 offset (dim 0 is untiled, so arbitrary
offsets are legal — the Mosaic sub-tile hazard only bites dims 1/2,
NOTES.md round 3).  A one-row epilogue completes the last row with a zero
upper face.

Numerics match step/cartesian_varprop.adi_step_varprop (same formulas,
different accumulation order — tests pin a small rtol vs the scan path).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_varprop_sweep", "fused_varprop_sweep_axis1",
           "varprop_theta_rhs", "fused_varprop_theta_sweep",
           "varprop_fields"]


def _round_up(v, m):
    return -(-v // m) * m


def _varprop_kernel(scal_ref, seed_ref, d_hbm, code_hbm, f_hbm, w_hbm,
                    h_hbm, out_hbm, xbuf, dpbuf, obuf, dbuf, cbuf, fbuf,
                    wbuf, hbuf, tbuf, qbuf, in_sem, out_sem, *,
                    n, cn, b1, b2):
    tg = scal_ref[0]        # theta * dt / d_ax^2
    sk = scal_ref[1]        # dt / d_ax (Robin sink scale)
    t_inf = scal_ref[2]
    rob_c = scal_ref[3]     # scalar h (used when no h stream)
    f32 = xbuf.dtype
    has_h = h_hbm is not None
    nat = tbuf is not None           # NATURAL rhs/out (z without transposes)
    mixed = not nat and obuf is not None   # bf16 state, f32 solve
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
        d_dma = (pltpu.make_async_copy(
            d_hbm.at[pl.ds(r0, b1), pl.ds(c0, b2), pl.ds(s, cn)],
            tbuf.at[slot], in_sem.at[slot, 0]) if nat else
            pltpu.make_async_copy(src(d_hbm), dbuf.at[slot],
                                  in_sem.at[slot, 0]))
        dmas = (
            d_dma,
            pltpu.make_async_copy(src(code_hbm), cbuf.at[slot], in_sem.at[slot, 1]),
            pltpu.make_async_copy(src(f_hbm), fbuf.at[slot], in_sem.at[slot, 2]),
            pltpu.make_async_copy(src(w_hbm), wbuf.at[slot], in_sem.at[slot, 3]),
        )
        if has_h:
            dmas += (pltpu.make_async_copy(src(h_hbm), hbuf.at[slot],
                                           in_sem.at[slot, 4]),)
        return dmas

    def out_dma(k):
        s = k * cn
        if nat:
            return pltpu.make_async_copy(
                obuf.at[k % 2],
                out_hbm.at[pl.ds(r0, b1), pl.ds(c0, b2), pl.ds(s, cn)],
                out_sem.at[k])
        # completed row r lives at xbuf[r + 1]: +1 offset on the UNTILED
        # dim 0 — legal for DMA at any offset.  Mixed mode stages a
        # downcast copy (the DMA itself cannot narrow dtypes).
        src = obuf.at[k % 2] if mixed else xbuf.at[pl.ds(s + 1, cn)]
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
    # carry: elimination chain + the previous row's pending quantities
    # (w, rhs, sink, lower-face) — row -1 is a synthetic identity row
    carry = (zero, zero, zero, zero, zero, zero)
    for k in range(nchunks):
        slot = k % 2
        for dma in in_dmas(slot, k):
            dma.wait()
        if nat:
            # (b1, b2, cn) -> (b1, cn, b2): b1 independent 2-D transposes
            # (the chip-gated relayout pattern, scripts/znat_chip.py).
            # Upcast BEFORE transposing: sub-f32 states relay in f32 (a
            # bf16 2-D transpose has different Mosaic tile constraints;
            # no-op for f32 states)
            for r in range(b1):
                qbuf[r] = jnp.transpose(tbuf[slot][r].astype(f32), (1, 0))

        def grp(g, carry, *, slot=slot, base=k * cn):
            cp_prev, dp_prev, wc, dc, sc, fcc = carry
            s = pl.multiple_of(g * G, G)
            code_g = cbuf[slot, pl.ds(s, G)].astype(jnp.int32)
            low = jnp.where((code_g & 1) > 0, one, zero_s)
            high = jnp.where((code_g & 2) > 0, one, zero_s)
            inm = jnp.where((code_g & 8) > 0, one, zero_s)
            # pre-masked harmonic lower faces (XLA-precomputed; zero across
            # mask/domain boundaries, so no `low` multiply needed)
            fc_g = fbuf[slot, pl.ds(s, G)].astype(f32)
            w_g = wbuf[slot, pl.ds(s, G)].astype(f32)
            d_g = (jnp.swapaxes(qbuf[:, pl.ds(s, G)], 0, 1) if nat
                   else dbuf[slot, pl.ds(s, G)].astype(f32))
            if has_h:
                h_g = hbuf[slot, pl.ds(s, G)].astype(f32)
            else:
                h_g = rob_c
            # Robin sink on this row (h * dt/d * n_exposed, in-mask only)
            sink_g = (sk * h_g) * ((2.0 - low - high) * inm)
            # completed rows = current shifted one down
            w_s = jnp.concatenate([wc[None], w_g[:-1]], axis=0)
            d_s = jnp.concatenate([dc[None], d_g[:-1]], axis=0)
            s_s = jnp.concatenate([sc[None], sink_g[:-1]], axis=0)
            f_s = jnp.concatenate([fcc[None], fc_g[:-1]], axis=0)
            tw = tg * w_s
            a_s = -tw * f_s
            c_s = -tw * fc_g
            sw = s_s * w_s
            b_s = 1.0 + tw * (f_s + fc_g) + sw
            dd_s = d_s + sw * t_inf
            cps, dps = [], []
            for r in range(G):
                inv = 1.0 / (b_s[r] - a_s[r] * cp_prev)
                cp_prev = c_s[r] * inv
                dp_prev = (dd_s[r] - a_s[r] * dp_prev) * inv
                cps.append(cp_prev)
                dps.append(dp_prev)
            xbuf[pl.ds(base + s, G)] = jnp.stack(cps)
            dpbuf[pl.ds(base + s, G)] = jnp.stack(dps)
            return (cp_prev, dp_prev, w_g[G - 1], d_g[G - 1],
                    sink_g[G - 1], fc_g[G - 1])

        carry = lax.fori_loop(0, cn // G, grp, carry)
        if k + 2 < nchunks:
            for dma in in_dmas(slot, k + 2):
                dma.start()

    # epilogue: complete the final row (upper face = 0, c = 0)
    cp_prev, dp_prev, wc, dc, sc, fcc = carry
    twc = tg * wc
    a_n = -twc * fcc
    b_n = 1.0 + twc * fcc + sc * wc
    d_n = dc + sc * wc * t_inf
    inv = 1.0 / (b_n - a_n * cp_prev)
    x_last = (d_n - a_n * dp_prev) * inv    # x_{n-1} = dp (its cp = 0)
    xbuf[pl.ds(n, 1)] = x_last[None]

    # backward substitution, rows n-2 .. 0 == xbuf indices n-1 .. 1
    x_next = x_last
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
        if nat:
            if k + 2 < nchunks:
                out_dma(k + 2).wait()   # staging slot free?
            xk = jnp.swapaxes(xbuf[pl.ds(base + 1, cn)], 0, 1)  # (b1,cn,b2)
            for r in range(b1):
                xr = jnp.transpose(xk[r], (1, 0))
                if stochastic:
                    # bf16 natural-out: stochastic-round the downcast (the
                    # round-to-nearest cooling-freeze hazard, NOTES.md)
                    bits = pltpu.bitcast(
                        pltpu.prng_random_bits(xr.shape), jnp.uint32)
                    obuf[k % 2, r] = pltpu.stochastic_round(
                        xr, bits, target_dtype=obuf.dtype)
                else:
                    obuf[k % 2, r] = xr.astype(obuf.dtype)
        elif mixed:
            if k + 2 < nchunks:
                out_dma(k + 2).wait()   # staging slot free?
            xk = xbuf[pl.ds(base + 1, cn)]
            if stochastic:
                bits = pltpu.bitcast(pltpu.prng_random_bits(xk.shape),
                                     jnp.uint32)
                obuf[k % 2] = pltpu.stochastic_round(xk, bits,
                                                     target_dtype=obuf.dtype)
            else:
                obuf[k % 2] = xk.astype(obuf.dtype)
        out_dma(k).start()

    for k in range(min(nchunks, 2) if (mixed or nat) else nchunks):
        out_dma(k).wait()


@functools.partial(jax.jit, static_argnames=("interpret", "block_b1",
                                             "block_b2", "chunk",
                                             "nat_rhs_out"))
def fused_varprop_sweep(rhs, code, fc, w, tg, sk, t_inf, h=None,
                        rob_c=0.0, rng_seed=None, *,
                        interpret: bool = False,
                        block_b1: int = 8, block_b2: int | None = None,
                        chunk: int = 64, nat_rhs_out: bool = False):
    """Variable-property implicit sweep along axis 0 of (n, B1, B2) arrays.

    rhs  : right-hand side (the theta-scheme explicit field / previous sweep)
    code : int8 plan-lite sweep codes for this axis's layout
           (solvers/pallas_sweeps.sweep_code; pins unsupported)
    fc   : PRE-MASKED harmonic face conductivity along axis 0 in this
           layout: fc[i] = harm(k[i-1], k[i]) where rows i-1, i are
           mask-coupled, else 0 (step/cartesian_varprop.build_varprop_fields)
    w    : 1/(rho*cp(T)) in this layout
    tg   : theta * dt / d_ax^2
    sk   : dt / d_ax
    h    : optional per-cell film coefficient field (radiation); scalar-h
           runs stream-free via ``rob_c``
    nat_rhs_out : rhs passed — and solution returned — in the NATURAL
           (B1, B2, n) layout; the kernel relays chunks in VMEM so the z
           solve pays no step-level transpose pair (the code/fc/w/h
           streams stay solve-axis-leading).  Sub-f32 states relay in
           f32 (upcast before the input transpose, downcast — with
           optional stochastic rounding — in the output staging).
    """
    if nat_rhs_out:
        b1, b2, n = rhs.shape
    else:
        n, b1, b2 = rhs.shape
    dtype = rhs.dtype
    mixed = jnp.promote_types(dtype, jnp.float32) != dtype
    stochastic = mixed and rng_seed is not None
    if stochastic and interpret:
        raise NotImplementedError(
            "stochastic rounding needs the TPU PRNG (pltpu.prng does not "
            "lower in interpret mode)")
    has_h = h is not None
    if block_b2 is None:
        # minimize lane padding (a 256 tile on b2=384 pads to 512 and costs
        # an extra XLA pad+slice HBM pass per stream — the 6.9 ms/sweep
        # mystery of NOTES session F), prefer 256 on ties; long lines cap
        # at 128 for VMEM
        cands = [c for c in (256, 128) if n <= 640 or c == 128]
        block_b2 = min(cands, key=lambda c: (_round_up(b2, c), -c))
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
        code = jnp.pad(code, pad)   # padded rows: code 0 -> identity
        fc = jnp.pad(fc, pad)       # padded faces stay zero (uncoupled)
        w = jnp.pad(w, pad)
        if has_h:
            h = jnp.pad(h, pad)
    n_pad, P1, P2 = code.shape
    cdt = jnp.promote_types(dtype, jnp.float32)

    scal = jnp.stack([jnp.asarray(tg, cdt), jnp.asarray(sk, cdt),
                      jnp.asarray(t_inf, cdt), jnp.asarray(rob_c, cdt)])
    grid = (P1 // block_b1, P2 // block_b2)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)

    nat = nat_rhs_out
    scratch = [
        pltpu.VMEM((n_pad + 8, block_b1, block_b2), cdt),   # x / cp (+1 lag)
        pltpu.VMEM((n_pad + 8, block_b1, block_b2), cdt),   # dp
        (None if nat else
         pltpu.VMEM((2, cn, block_b1, block_b2), dtype)),   # rhs chunks
        pltpu.VMEM((2, cn, block_b1, block_b2), jnp.int8),  # code chunks
        pltpu.VMEM((2, cn, block_b1, block_b2), dtype),     # face chunks
        pltpu.VMEM((2, cn, block_b1, block_b2), dtype),     # w chunks
    ]
    if has_h:
        scratch.append(pltpu.VMEM((2, cn, block_b1, block_b2), dtype))
    if mixed or nat:        # downcast staging / natural out staging
        scratch.append(pltpu.VMEM((2, block_b1, block_b2, cn) if nat
                                  else (2, cn, block_b1, block_b2), dtype))
    if nat:
        scratch.append(pltpu.VMEM((2, block_b1, block_b2, cn), dtype))  # in
        scratch.append(pltpu.VMEM((block_b1, cn, block_b2), cdt))  # relaid
    scratch += [pltpu.SemaphoreType.DMA((2, 5 if has_h else 4)),
                pltpu.SemaphoreType.DMA((n_pad // cn,))]

    inputs = [scal]
    in_specs = [sspec]
    if stochastic:
        inputs.append(jnp.asarray(rng_seed, jnp.int32).reshape(1))
        in_specs.append(sspec)
    inputs += [rhs, code, fc, w]
    in_specs += [hbm, hbm, hbm, hbm]
    if has_h:
        inputs.append(h)
        in_specs.append(hbm)

    def body(*refs):
        it = iter(refs)
        scal_ = next(it)
        seed_ = next(it) if stochastic else None
        d_, c_, f_, w_ = (next(it) for _ in range(4))
        h_ = next(it) if has_h else None
        o_ = next(it)
        xb, dp = next(it), next(it)
        db = None if nat else next(it)
        cb, fb, wb = (next(it) for _ in range(3))
        hb = next(it) if has_h else None
        ob = next(it) if (mixed or nat) else None
        tb = next(it) if nat else None
        qb = next(it) if nat else None
        isem, osem = next(it), next(it)
        return _varprop_kernel(scal_, seed_, d_, c_, f_, w_, h_, o_, xb,
                               dp, ob, db, cb, fb, wb, hb, tb, qb,
                               isem, osem,
                               n=n_pad, cn=cn, b1=block_b1, b2=block_b2)

    out = pl.pallas_call(
        body, grid=grid,
        in_specs=in_specs,
        out_specs=hbm,
        out_shape=jax.ShapeDtypeStruct((P1, P2, n_pad) if nat
                                       else (n_pad, P1, P2), dtype),
        scratch_shapes=[s for s in scratch if s is not None],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)
    if p1 or p2 or pn:
        out = (out[:b1, :b2, :n] if nat else out[:n, :b1, :b2])
    return out


def _shift_lo(x, axis):
    zeros = jnp.zeros_like(lax.slice_in_dim(x, 0, 1, axis=axis))
    return lax.concatenate(
        [zeros, lax.slice_in_dim(x, 0, x.shape[axis] - 1, axis=axis)],
        dimension=axis)


def _shift_hi(x, axis):
    zeros = jnp.zeros_like(lax.slice_in_dim(x, 0, 1, axis=axis))
    return lax.concatenate(
        [lax.slice_in_dim(x, 1, x.shape[axis], axis=axis), zeros],
        dimension=axis)


def _vp_rhs_kernel(scal_ref, seed_ref, T_ref, Fx_ref, Fy_ref, Fz_ref,
                   M_ref, W_ref, S_ref, out_ref, Tbuf, Fbuf, *, nx):
    """Plane-carry explicit theta-pass with PRE-MASKED harmonic face fields:

        R0_p = T_p + cw * w_p * M_p * sum_ax [fc_lo (T_lo - T_p)
                                              + fc_hi (T_hi - T_p)] / d_ax^2
               (+ cd * w_p * M_p * src_p)

    Ring protocol identical to pallas_stencil._theta_rhs_kernel (x-planes,
    two carried planes of T and fx); fy, fz, w, mask, and the optional
    source stream with the OUTPUT plane's index map — they are only needed
    on the computed plane p = i - 1, so they need no ring at all.  fy[p]
    holds the face between in-plane rows y-1 and y (columns z-1, z for fz);
    the high face is its +1 shift, zero-filled — faces beyond the domain
    edge or across void vanish by construction, so the kernel needs NO
    neighbor masks and NO harmonic divides (6 per cell in the k-streaming
    formulation this replaced)."""
    cw = scal_ref[0]        # (1 - theta) * dt
    cd = scal_ref[1]        # dt (source scale)
    iv_x = scal_ref[2]
    iv_y = scal_ref[3]
    iv_z = scal_ref[4]
    i = pl.program_id(0)
    f32 = scal_ref.dtype
    if seed_ref is not None:
        pltpu.prng_seed(seed_ref[0] + i)

    @pl.when(i == 0)
    def _init():
        Tbuf[1] = jnp.zeros_like(Tbuf[1])
        Fbuf[1] = jnp.zeros_like(Fbuf[1])

    @pl.when(i >= 1)
    def _compute():
        s_c = (i - 1) % 2
        s_l = i % 2
        Tc = Tbuf[s_c].astype(f32)
        f_lo = Fbuf[s_c].astype(f32)            # fx[p] = face (p-1, p)
        hi_f = jnp.where(i <= nx - 1, 1.0, 0.0).astype(f32)
        f_hi = Fx_ref[0].astype(f32) * hi_f     # fx[p+1]; clamp killed
        acc = (f_lo * (Tbuf[s_l].astype(f32) - Tc)
               + f_hi * (T_ref[0].astype(f32) - Tc)) * iv_x
        # y (sublane) / z (lane) faces: the plane's own face field is the
        # low face; its +1 shift (zero-filled) the high face
        for ax, iv, fref in ((0, iv_y, Fy_ref), (1, iv_z, Fz_ref)):
            fp = fref[0].astype(f32)
            acc = acc + (fp * (_shift_lo(Tc, ax) - Tc)
                         + _shift_hi(fp, ax)
                         * (_shift_hi(Tc, ax) - Tc)) * iv
        gain = W_ref[0].astype(f32) * M_ref[0].astype(jnp.int32).astype(f32)
        res = Tc + cw * gain * acc
        if S_ref is not None:
            res = res + cd * gain * S_ref[0].astype(f32)
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
        Fbuf[i % 2] = Fx_ref[0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def varprop_theta_rhs(T, fx, fy, fz, w, mask_i8, cw, inv_d2,
                      src=None, dt=None, rng_seed=None, *,
                      interpret: bool = False):
    """Explicit varprop theta-pass ``R0 = T + cw*w*mask*sum fc*(T_nbr-T)/d^2``
    in ONE HBM pass (T + fx + fy + fz + mask + w [+ src] streamed).

    ``fx/fy/fz`` are the PRE-MASKED per-axis harmonic face-conductivity
    fields (step/cartesian_varprop.build_varprop_fields): fc_ax[i] =
    harm(k[i-1], k[i]) between mask-coupled cells, 0 across void/domain
    boundaries — anisotropic conductivity is simply different face fields.
    ``cw = (1-theta)*dt``; ``inv_d2`` scalar or per-axis; ``src`` adds
    ``dt*w*mask*src`` (volumetric heat)."""
    nx, ny, nz = T.shape
    dtype = T.dtype
    inv3 = jnp.broadcast_to(jnp.asarray(inv_d2), (3,))

    p1 = _round_up(ny, 8) - ny
    p2 = _round_up(nz, 128) - nz
    if p1 or p2:
        pad = ((0, 0), (0, p1), (0, p2))
        T = jnp.pad(T, pad)
        fx = jnp.pad(fx, pad)
        fy = jnp.pad(fy, pad)   # zero faces: padded cells stay uncoupled
        fz = jnp.pad(fz, pad)
        w = jnp.pad(w, pad)
        mask_i8 = jnp.pad(mask_i8, pad)
        src = None if src is None else jnp.pad(src, pad)
    Py, Pz = T.shape[1], T.shape[2]

    cdt = jnp.promote_types(dtype, jnp.float32)
    scal = jnp.concatenate([jnp.asarray(cw, cdt).reshape(1),
                            jnp.asarray(0.0 if dt is None else dt,
                                        cdt).reshape(1),
                            inv3.astype(cdt)])
    blk = (1, Py, Pz)
    in_idx = lambda i: (jnp.minimum(i, nx - 1), 0, 0)
    out_idx = lambda i: (jnp.maximum(i - 1, 0), 0, 0)
    vin = pl.BlockSpec(blk, in_idx, memory_space=pltpu.VMEM)
    vout = pl.BlockSpec(blk, out_idx, memory_space=pltpu.VMEM)

    has_src = src is not None
    # stochastic bf16 stores (unbiased; kills sub-quantum update dropout)
    stochastic = (rng_seed is not None and dtype != cdt)
    if stochastic and interpret:
        raise NotImplementedError(
            "stochastic rounding needs the TPU PRNG (pltpu.prng does not "
            "lower in interpret mode)")

    def body(*refs):
        it = iter(refs)
        scal_ = next(it)
        seed_ = next(it) if stochastic else None
        T_, Fx_, Fy_, Fz_, M_, W_ = (next(it) for _ in range(6))
        S_ = next(it) if has_src else None
        out_, Tb, Fb = (next(it) for _ in range(3))
        return _vp_rhs_kernel(scal_, seed_, T_, Fx_, Fy_, Fz_, M_, W_, S_,
                              out_, Tb, Fb, nx=nx)

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    inputs = [scal]
    if stochastic:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(jnp.asarray(rng_seed, jnp.int32).reshape(1))
    in_specs += [vin, vin, vout, vout, vout, vout]
    inputs += [T, fx, fy, fz, mask_i8, w]
    if has_src:
        in_specs.append(vout)
        inputs.append(src)

    out = pl.pallas_call(
        body,
        grid=(nx + 1,),
        in_specs=in_specs,
        out_specs=vout,
        out_shape=jax.ShapeDtypeStruct((nx, Py, Pz), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, Py, Pz), dtype),       # T planes
            pltpu.VMEM((2, Py, Pz), dtype),       # fx planes
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)

    if p1 or p2:
        out = out[:, :ny, :nz]
    return out


def _varprop_kernel_axis1(scal_ref, seed_ref, d_hbm, code_hbm, f_hbm,
                          w_hbm, h_hbm, out_hbm, xbuf, dpbuf, obuf, dbuf,
                          cbuf, fbuf, wbuf, hbuf, in_sem, out_sem, *,
                          n, cn, b1, b2):
    """Axis-1 variant of _varprop_kernel: the y-sweep in the NATURAL
    (B1, n, B2) layout — no transposes of rhs/k/w/h.  Raw input groups are
    swapped to (G, b1, b2) once and everything downstream reuses the axis-0
    lag machinery (decode-after-swap, _sweep_kernel_axis1_v2 notes).  cp/dp
    live in the axis-0-style (n+8, b1, b2) scratch whose dim 0 is UNTILED,
    so the +1-lagged stores stay aligned and the backward pass reads at a
    +1 offset for free; finished x groups are swapped back into a
    natural-layout staging buffer whose chunk DMAs slice the tiled sublane
    dim only at chunk-aligned offsets (the Mosaic sub-tile hazard)."""
    tg = scal_ref[0]
    sk = scal_ref[1]
    t_inf = scal_ref[2]
    rob_c = scal_ref[3]
    f32 = xbuf.dtype
    has_h = h_hbm is not None
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
        dmas = (
            pltpu.make_async_copy(src(d_hbm), dbuf.at[slot], in_sem.at[slot, 0]),
            pltpu.make_async_copy(src(code_hbm), cbuf.at[slot], in_sem.at[slot, 1]),
            pltpu.make_async_copy(src(f_hbm), fbuf.at[slot], in_sem.at[slot, 2]),
            pltpu.make_async_copy(src(w_hbm), wbuf.at[slot], in_sem.at[slot, 3]),
        )
        if has_h:
            dmas += (pltpu.make_async_copy(src(h_hbm), hbuf.at[slot],
                                           in_sem.at[slot, 4]),)
        return dmas

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

    one = jnp.ones((), f32)
    zero_s = jnp.zeros((), f32)
    zero = jnp.zeros((b1, b2), f32)
    carry = (zero, zero, zero, zero, zero, zero)
    for k in range(nchunks):
        slot = k % 2
        for dma in in_dmas(slot, k):
            dma.wait()

        def grp(g, carry, *, slot=slot, base=k * cn):
            cp_prev, dp_prev, wc, dc, sc, fcc = carry
            s = pl.multiple_of(g * G, G)
            code_g = jnp.swapaxes(
                cbuf[slot, :, pl.ds(s, G), :].astype(jnp.int32), 0, 1)
            low = jnp.where((code_g & 1) > 0, one, zero_s)
            high = jnp.where((code_g & 2) > 0, one, zero_s)
            inm = jnp.where((code_g & 8) > 0, one, zero_s)
            # pre-masked harmonic lower faces (XLA-precomputed)
            fc_g = jnp.swapaxes(fbuf[slot, :, pl.ds(s, G), :], 0, 1) \
                .astype(f32)
            w_g = jnp.swapaxes(wbuf[slot, :, pl.ds(s, G), :], 0, 1) \
                .astype(f32)
            d_g = jnp.swapaxes(dbuf[slot, :, pl.ds(s, G), :], 0, 1) \
                .astype(f32)
            if has_h:
                h_g = jnp.swapaxes(hbuf[slot, :, pl.ds(s, G), :], 0, 1) \
                    .astype(f32)
            else:
                h_g = rob_c
            sink_g = (sk * h_g) * ((2.0 - low - high) * inm)
            w_s = jnp.concatenate([wc[None], w_g[:-1]], axis=0)
            d_s = jnp.concatenate([dc[None], d_g[:-1]], axis=0)
            s_s = jnp.concatenate([sc[None], sink_g[:-1]], axis=0)
            f_s = jnp.concatenate([fcc[None], fc_g[:-1]], axis=0)
            tw = tg * w_s
            a_s = -tw * f_s
            c_s = -tw * fc_g
            sw = s_s * w_s
            b_s = 1.0 + tw * (f_s + fc_g) + sw
            dd_s = d_s + sw * t_inf
            cps, dps = [], []
            for r in range(G):
                inv = 1.0 / (b_s[r] - a_s[r] * cp_prev)
                cp_prev = c_s[r] * inv
                dp_prev = (dd_s[r] - a_s[r] * dp_prev) * inv
                cps.append(cp_prev)
                dps.append(dp_prev)
            xbuf[pl.ds(base + s, G)] = jnp.stack(cps)
            dpbuf[pl.ds(base + s, G)] = jnp.stack(dps)
            return (cp_prev, dp_prev, w_g[G - 1], d_g[G - 1],
                    sink_g[G - 1], fc_g[G - 1])

        carry = lax.fori_loop(0, cn // G, grp, carry)
        if k + 2 < nchunks:
            for dma in in_dmas(slot, k + 2):
                dma.start()

    cp_prev, dp_prev, wc, dc, sc, fcc = carry
    twc = tg * wc
    a_n = -twc * fcc
    b_n = 1.0 + twc * fcc + sc * wc
    d_n = dc + sc * wc * t_inf
    inv = 1.0 / (b_n - a_n * cp_prev)
    x_last = (d_n - a_n * dp_prev) * inv
    # row-index n slot: cp = 0, dp = x so the row-aligned backward group
    # covering the last row recomputes x_{n-1} = dp - 0*x_next = x_last
    xbuf[pl.ds(n, 1)] = zero[None]
    dpbuf[pl.ds(n, 1)] = x_last[None]

    # backward: row-aligned groups; the +1-lagged cp/dp reads ride the
    # UNTILED dim 0 of the scratch, the swapped x stores land sublane-
    # aligned in the natural staging buffer
    x_next = zero
    for k in range(nchunks - 1, -1, -1):
        base = k * cn

        def grp_b(gg, x_next, *, base=base):
            s = pl.multiple_of((cn // G - 1 - gg) * G, G)
            cp_g = xbuf[pl.ds(base + s + 1, G)]
            dp_g = dpbuf[pl.ds(base + s + 1, G)]
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
def fused_varprop_sweep_axis1(rhs, code, fc, w, tg, sk, t_inf, h=None,
                              rob_c=0.0, rng_seed=None, *,
                              interpret: bool = False,
                              block_b1: int = 8, block_b2: int | None = None,
                              chunk: int = 64):
    """Variable-property implicit sweep along AXIS 1 of (B1, n, B2) arrays
    in the natural layout (the y-sweep with no transposes of rhs/fc/w/h).
    Same math/semantics as ``fused_varprop_sweep``; ``code`` must be the
    NATURAL-layout axis-1 sweep code (moveaxis(sweep_code(mask, None, 1),
    0, 1) — i.e. couplings along axis 1, array in (B1, n, B2)); ``fc`` the
    pre-masked axis-1 face conductivities in the same layout."""
    b1, n, b2 = rhs.shape
    dtype = rhs.dtype
    mixed = jnp.promote_types(dtype, jnp.float32) != dtype
    stochastic = mixed and rng_seed is not None
    if stochastic and interpret:
        raise NotImplementedError(
            "stochastic rounding needs the TPU PRNG (pltpu.prng does not "
            "lower in interpret mode)")
    has_h = h is not None
    if block_b2 is None:
        # minimize lane padding (a 256 tile on b2=384 pads to 512 and costs
        # an extra XLA pad+slice HBM pass per stream — the 6.9 ms/sweep
        # mystery of NOTES session F), prefer 256 on ties; long lines cap
        # at 128 for VMEM
        cands = [c for c in (256, 128) if n <= 640 or c == 128]
        block_b2 = min(cands, key=lambda c: (_round_up(b2, c), -c))
    cn = min(chunk, _round_up(n, 8))
    pn = _round_up(n, cn) - n
    p1 = _round_up(b1, block_b1) - b1
    p2 = _round_up(b2, block_b2) - b2
    if p1 or p2 or pn:
        pad = ((0, p1), (0, pn), (0, p2))
        rhs = jnp.pad(rhs, pad)
        code = jnp.pad(code, pad)
        fc = jnp.pad(fc, pad)
        w = jnp.pad(w, pad)
        if has_h:
            h = jnp.pad(h, pad)
    P1, n_pad, P2 = rhs.shape
    cdt = jnp.promote_types(dtype, jnp.float32)

    scal = jnp.stack([jnp.asarray(tg, cdt), jnp.asarray(sk, cdt),
                      jnp.asarray(t_inf, cdt), jnp.asarray(rob_c, cdt)])
    grid = (P1 // block_b1, P2 // block_b2)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)

    scratch = [
        pltpu.VMEM((n_pad + 8, block_b1, block_b2), cdt),       # cp (+1 lag)
        pltpu.VMEM((n_pad + 8, block_b1, block_b2), cdt),       # dp
        pltpu.VMEM((block_b1, n_pad, block_b2), dtype),         # x staging
        pltpu.VMEM((2, block_b1, cn, block_b2), dtype),         # rhs chunks
        pltpu.VMEM((2, block_b1, cn, block_b2), jnp.int8),      # code
        pltpu.VMEM((2, block_b1, cn, block_b2), dtype),         # faces
        pltpu.VMEM((2, block_b1, cn, block_b2), dtype),         # w
    ]
    if has_h:
        scratch.append(pltpu.VMEM((2, block_b1, cn, block_b2), dtype))
    scratch += [pltpu.SemaphoreType.DMA((2, 5 if has_h else 4)),
                pltpu.SemaphoreType.DMA((n_pad // cn,))]

    inputs = [scal]
    in_specs = [sspec]
    if stochastic:
        inputs.append(jnp.asarray(rng_seed, jnp.int32).reshape(1))
        in_specs.append(sspec)
    inputs += [rhs, code, fc, w]
    in_specs += [hbm, hbm, hbm, hbm]
    if has_h:
        inputs.append(h)
        in_specs.append(hbm)

    def body(*refs):
        it = iter(refs)
        scal_ = next(it)
        seed_ = next(it) if stochastic else None
        d_, c_, f_, w_ = (next(it) for _ in range(4))
        h_ = next(it) if has_h else None
        o_ = next(it)
        xb, dp, ob, db, cb, fb, wb = (next(it) for _ in range(7))
        hb = next(it) if has_h else None
        isem, osem = next(it), next(it)
        return _varprop_kernel_axis1(scal_, seed_, d_, c_, f_, w_, h_, o_,
                                     xb, dp, ob, db, cb, fb, wb, hb, isem,
                                     osem, n=n_pad, cn=cn, b1=block_b1,
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


def _vp_ring_kernel(scal_ref, seed_ref, T_hbm, code_hbm, fx_hbm, fy_hbm,
                    fz_hbm, w_hbm, h_hbm, s_hbm, out_hbm,
                    ring, fyring, fzring, cbuf, fxbuf, wbuf, hbuf, sbuf,
                    xbuf, dpbuf, obuf, yrow, t_sem, fy_sem, fz_sem, c_sem,
                    fx_sem, w_sem, h_sem, s_sem, out_sem, *,
                    n, b1, b2, nt1, nt2, R, stochastic):
    """Ring-buffer fused varprop theta-pass + x-sweep — ZERO halo DMAs.

    Same ring protocol as pallas_theta_sweep._theta_sweep_ring_kernel (the
    TPU Pallas grid is sequential and VMEM scratch persists across steps;
    grid (nt1+1, nt2) walks the (y, z) batch tiles row-major, completing
    tile c = s - nt2 at step s when all its neighbors are resident), with
    the constant-coefficient decode replaced by streamed PRE-MASKED
    harmonic face fields (build_varprop_fields):

      * T rides the deep ring (R = nt2+3): y-lo row from ``yrow`` (saved at
        the completion one tile-row up), y-hi row 0 of the tile loaded THIS
        step, z-lo/z-hi boundary lanes of ring slots c-1 / c+1;
      * fy/fz ride their own rings — the y-hi face of row b1-1 is fy row 0
        of the tile BELOW (slot s), the z-hi face of lane b2-1 is fz lane 0
        of tile c+1.  Wrap/stale reads need no masks: a face field is zero
        across every void/domain boundary BY CONSTRUCTION, except the two
        genuinely stale slots (y-hi past the last tile row, z-hi past the
        last tile) which a traced scalar validity select zeroes — the ring
        holds only finite values (zero-initialised, then real tiles), so
        the select is a correctness fix, not a NaN guard;
      * fx / w / code (+ h, + src) are needed only on the completed tile:
        single-slot completion-time streams with one-tile prefetch, exactly
        the code protocol of the constant-coefficient ring kernel.

    HBM traffic: read T(4) + code(1) + fx/fy/fz/w(16) [+h 4][+src 4], write
    U(4) = 25-33 B/cell — replacing the varprop stencil (25) + x-sweep (17+)
    chain and its R0 round trip.  The explicit accumulation order (x faces,
    then y, then z) and the sweep formulas match _vp_rhs_kernel and
    _varprop_kernel term-for-term, so f32 results are BITWISE the unfused
    chain's (bf16 skips R0's intermediate quantisation — strictly more
    accurate, tested to tolerance)."""
    cw = scal_ref[0]        # (1 - theta) * dt
    cd = scal_ref[1]        # dt (source scale)
    tg = scal_ref[2]        # theta * dt / dx^2
    sk = scal_ref[3]        # dt / dx (Robin sink scale)
    t_inf = scal_ref[4]
    rob_c = scal_ref[5]
    iv_x, iv_y, iv_z = scal_ref[6], scal_ref[7], scal_ref[8]
    f32 = xbuf.dtype
    has_h = h_hbm is not None
    has_src = s_hbm is not None
    G = 8
    i = pl.program_id(0)
    j = pl.program_id(1)
    s = i * nt2 + j
    ntiles = nt1 * nt2
    first = (i == 0) & (j == 0)
    last = (i == nt1) & (j == nt2 - 1)

    def tile_coords(t):
        return (t // nt2) * b1, (t % nt2) * b2

    def load_dmas(t):
        r0, c0 = tile_coords(t)
        at = lambda ref: ref.at[:, pl.ds(r0, b1), pl.ds(c0, b2)]
        return (
            pltpu.make_async_copy(at(T_hbm), ring.at[t % R, pl.ds(0, n)],
                                  t_sem),
            pltpu.make_async_copy(at(fy_hbm), fyring.at[t % R], fy_sem),
            pltpu.make_async_copy(at(fz_hbm), fzring.at[t % R], fz_sem),
        )

    def comp_dmas(t):
        r0, c0 = tile_coords(t)
        at = lambda ref: ref.at[:, pl.ds(r0, b1), pl.ds(c0, b2)]
        dmas = (
            pltpu.make_async_copy(at(code_hbm), cbuf, c_sem),
            pltpu.make_async_copy(at(fx_hbm), fxbuf.at[pl.ds(0, n)], fx_sem),
            pltpu.make_async_copy(at(w_hbm), wbuf, w_sem),
        )
        if has_h:
            dmas += (pltpu.make_async_copy(at(h_hbm), hbuf, h_sem),)
        if has_src:
            dmas += (pltpu.make_async_copy(at(s_hbm), sbuf, s_sem),)
        return dmas

    def out_dma(t):
        r0, c0 = tile_coords(t)
        return pltpu.make_async_copy(
            obuf, out_hbm.at[:, pl.ds(r0, b1), pl.ds(c0, b2)], out_sem)

    @pl.when(first)
    def _init():
        # rings must never expose non-finite garbage (0 * NaN = NaN) and
        # the x-overlap pad rows n..n+G must read as zero forever; fxbuf's
        # pad rows are written once here (its DMA covers rows [0, n) only)
        for r in range(R):
            ring[r] = jnp.zeros_like(ring[r])
            fyring[r] = jnp.zeros_like(fyring[r])
            fzring[r] = jnp.zeros_like(fzring[r])
        yrow[...] = jnp.zeros_like(yrow)
        fxbuf[pl.ds(n, G)] = jnp.zeros((G, b1, b2), fxbuf.dtype)
        for dma in load_dmas(0):
            dma.start()

    @pl.when(i < nt1)
    def _wait_load():
        for dma in load_dmas(s):
            dma.wait()

    i2 = i + (j + 1 == nt2).astype(jnp.int32)

    @pl.when(i2 < nt1)
    def _start_load():
        for dma in load_dmas(s + 1):
            dma.start()

    @pl.when(s == nt2 - 1)
    def _first_comp():
        for dma in comp_dmas(0):
            dma.start()

    @pl.when(i >= 1)
    def _complete():
        c = s - nt2
        sc = c % R
        sp = (c - 1) % R
        shi = (c + 1) % R
        scur = s % R
        for dma in comp_dmas(c):
            dma.wait()
        if stochastic:
            pltpu.prng_seed(seed_ref[0] + c)

        @pl.when(i * nt2 + j >= nt2 + 1)
        def _wait_prev_out():
            out_dma(c - 1).wait()

        one = jnp.ones((), f32)
        zero_s = jnp.zeros((), f32)
        zero = jnp.zeros((b1, b2), f32)
        # stale-slot validity (see docstring): y-hi needs tile s, z-hi
        # needs tile c+1; past the end of the walk the true faces are
        # domain edges (= 0), so zero the streamed face instead
        v_y = jnp.where(s < ntiles, one, zero_s)
        v_z = jnp.where(c + 1 < ntiles, one, zero_s)

        def grp(g, carry):
            cp_prev, dp_prev, T_prev = carry
            gs = g * G
            Tg = ring[sc, pl.ds(gs, G + 1)].astype(f32)      # (G+1, b1, b2)
            fx_g = fxbuf[pl.ds(gs, G + 1)].astype(f32)
            code_g = cbuf[pl.ds(gs, G)].astype(jnp.int32)
            low = jnp.where((code_g & 1) > 0, one, zero_s)
            high = jnp.where((code_g & 2) > 0, one, zero_s)
            inm = jnp.where((code_g & 8) > 0, one, zero_s)
            T_c = Tg[:G]
            f_lo = fx_g[:G]
            f_hi = fx_g[1:G + 1]
            # explicit theta pass, accumulated in the SAME order as
            # _vp_rhs_kernel (x faces, then y, then z) — bitwise-equal RHS
            T_xlo = jnp.concatenate([T_prev[None], Tg[:G - 1]], axis=0)
            acc = (f_lo * (T_xlo - T_c)
                   + f_hi * (Tg[1:G + 1] - T_c)) * iv_x
            fy_g = fyring[sc, pl.ds(gs, G)].astype(f32)
            ylo_g = yrow[j, pl.ds(gs, G)].astype(f32)[:, None, :]
            yhi_T = ring[scur, pl.ds(gs, G), 0:1, :].astype(f32)
            yhi_f = fyring[scur, pl.ds(gs, G), 0:1, :].astype(f32) * v_y
            T_ylo = jnp.concatenate([ylo_g, T_c[:, :b1 - 1, :]], axis=1)
            T_yhi = jnp.concatenate([T_c[:, 1:, :], yhi_T], axis=1)
            f_yhi = jnp.concatenate([fy_g[:, 1:, :], yhi_f], axis=1)
            acc = acc + (fy_g * (T_ylo - T_c)
                         + f_yhi * (T_yhi - T_c)) * iv_y
            fz_g = fzring[sc, pl.ds(gs, G)].astype(f32)
            zlo_T = ring[sp, pl.ds(gs, G), :, b2 - 1:b2].astype(f32)
            zhi_T = ring[shi, pl.ds(gs, G), :, 0:1].astype(f32)
            zhi_f = fzring[shi, pl.ds(gs, G), :, 0:1].astype(f32) * v_z
            T_zlo = jnp.concatenate([zlo_T, T_c[:, :, :b2 - 1]], axis=2)
            T_zhi = jnp.concatenate([T_c[:, :, 1:], zhi_T], axis=2)
            f_zhi = jnp.concatenate([fz_g[:, :, 1:], zhi_f], axis=2)
            acc = acc + (fz_g * (T_zlo - T_c)
                         + f_zhi * (T_zhi - T_c)) * iv_z
            w_g = wbuf[pl.ds(gs, G)].astype(f32)
            gain = w_g * inm
            d_g = T_c + cw * gain * acc
            if has_src:
                d_g = d_g + cd * gain * sbuf[pl.ds(gs, G)].astype(f32)
            # implicit sweep coefficients: exactly _varprop_kernel's
            # formulas, unlagged (fx is fully resident, f_hi = fx[i+1])
            if has_h:
                h_g = hbuf[pl.ds(gs, G)].astype(f32)
            else:
                h_g = rob_c
            sink_g = (sk * h_g) * ((2.0 - low - high) * inm)
            tw = tg * w_g
            a_g = -tw * f_lo
            c_g = -tw * f_hi
            sw = sink_g * w_g
            b_g = 1.0 + tw * (f_lo + f_hi) + sw
            dd_g = d_g + sw * t_inf
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
        # this tile's bottom row becomes the y-lo value row for the tile
        # below (read above BEFORE this overwrite — same-step order safe)
        yrow[j] = ring[sc, pl.ds(0, n), b1 - 1, :]

        @pl.when(c + 1 < ntiles)
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
def fused_varprop_theta_sweep(T, code, fx, fy, fz, w, cw, inv_d2, tg, sk,
                              t_inf, h=None, rob_c=0.0, src=None, dt=None,
                              rng_seed=None, *, interpret: bool = False,
                              block_b1: int = 8, block_b2: int = 128):
    """``U = A_x^{-1}[(I + cw W L) T (+ dt W src) + sink*t_inf]`` in ONE
    fused HBM pass: the varprop explicit theta-RHS and the varprop x-sweep
    (see _vp_ring_kernel).  Replaces the varprop_theta_rhs +
    fused_varprop_sweep chain and its R0 round trip.

    T : (n, B1, B2) state in the natural (x, y, z) layout.
    code : int8 x-axis sweep codes (sweep_code(mask, None, 0) — plain bits
           1/2/8; face masking is carried by the fc fields, so NO stencil
           bits are needed).
    fx/fy/fz : pre-masked per-axis harmonic face fields, natural layout
           (step/cartesian_varprop.build_varprop_fields).
    w : 1/(rho cp(T)); cw : (1-theta)*dt; inv_d2 : per-axis 1/d^2 (3,);
    tg : theta*dt/dx^2; sk : dt/dx; src : optional volumetric source
    (needs dt); h : optional per-cell film field (radiation)."""
    n, b1, b2 = T.shape
    dtype = T.dtype
    G = 8
    has_h = h is not None
    has_src = src is not None

    pn = _round_up(n, G) - n
    p1 = _round_up(b1, block_b1) - b1
    p2 = _round_up(b2, block_b2) - b2
    if p1 or p2 or pn:
        pad = ((0, pn), (0, p1), (0, p2))
        T = jnp.pad(T, pad)
        code = jnp.pad(code, pad)   # pad rows: code 0 -> identity rows
        fx = jnp.pad(fx, pad)       # pad faces stay zero (uncoupled)
        fy = jnp.pad(fy, pad)
        fz = jnp.pad(fz, pad)
        w = jnp.pad(w, pad)
        h = jnp.pad(h, pad) if has_h else None
        src = jnp.pad(src, pad) if has_src else None
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
    inv3 = jnp.broadcast_to(jnp.asarray(inv_d2), (3,)).astype(cdt)
    scal = jnp.concatenate([
        jnp.stack([jnp.asarray(cw, cdt),
                   jnp.asarray(0.0 if dt is None else dt, cdt),
                   jnp.asarray(tg, cdt), jnp.asarray(sk, cdt),
                   jnp.asarray(t_inf, cdt), jnp.asarray(rob_c, cdt)]),
        inv3])

    hbm = pl.BlockSpec(memory_space=pl.ANY)
    kern = functools.partial(_vp_ring_kernel, n=n_pad, b1=block_b1,
                             b2=block_b2, nt1=nt1, nt2=nt2, R=R,
                             stochastic=stochastic)

    def body(*refs):
        it = iter(refs)
        scal_ = next(it)
        seed_ = next(it) if stochastic else None
        T_, c_, fx_, fy_, fz_, w_ = (next(it) for _ in range(6))
        h_ = next(it) if has_h else None
        s_ = next(it) if has_src else None
        o_ = next(it)
        ring, fyr, fzr, cb, fxb, wb = (next(it) for _ in range(6))
        hb = next(it) if has_h else None
        sb = next(it) if has_src else None
        xb, dp, ob, yr = (next(it) for _ in range(4))
        tsem, fysem, fzsem, csem, fxsem, wsem = (next(it) for _ in range(6))
        hsem = next(it) if has_h else None
        ssem = next(it) if has_src else None
        osem = next(it)
        return kern(scal_, seed_, T_, c_, fx_, fy_, fz_, w_, h_, s_, o_,
                    ring, fyr, fzr, cb, fxb, wb, hb, sb, xb, dp, ob, yr,
                    tsem, fysem, fzsem, csem, fxsem, wsem, hsem, ssem, osem)

    scratch = [
        pltpu.VMEM((R, n_pad + G, block_b1, block_b2), dtype),   # T ring
        pltpu.VMEM((R, n_pad, block_b1, block_b2), dtype),       # fy ring
        pltpu.VMEM((R, n_pad, block_b1, block_b2), dtype),       # fz ring
        pltpu.VMEM((n_pad, block_b1, block_b2), jnp.int8),       # codes
        pltpu.VMEM((n_pad + G, block_b1, block_b2), dtype),      # fx (+pad)
        pltpu.VMEM((n_pad, block_b1, block_b2), dtype),          # w
    ]
    if has_h:
        scratch.append(pltpu.VMEM((n_pad, block_b1, block_b2), dtype))
    if has_src:
        scratch.append(pltpu.VMEM((n_pad, block_b1, block_b2), dtype))
    scratch += [
        pltpu.VMEM((n_pad, block_b1, block_b2), cdt),            # cp
        pltpu.VMEM((n_pad, block_b1, block_b2), cdt),            # dp
        pltpu.VMEM((n_pad, block_b1, block_b2), dtype),          # out stage
        pltpu.VMEM((nt2, n_pad, block_b2), dtype),               # y-lo rows
    ]
    scratch += [pltpu.SemaphoreType.DMA] * (6 + has_h + has_src + 1)

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    inputs = [scal]
    if stochastic:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(jnp.asarray(rng_seed, jnp.int32).reshape(1))
    inputs += [T, code, fx, fy, fz, w]
    in_specs += [hbm] * 6
    if has_h:
        inputs.append(h)
        in_specs.append(hbm)
    if has_src:
        inputs.append(src)
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


def _clamp_sum(Tc, pts, vals):
    """Static piecewise-linear table as a clamp-sum FMA chain (the
    step/cartesian_varprop.PropertyTable evaluation, with the breakpoints
    baked as kernel immediates; slopes precomputed in f64 on the host)."""
    acc = jnp.full_like(Tc, float(vals[0]))
    for i in range(len(pts) - 1):
        dp = float(pts[i + 1]) - float(pts[i])
        dv = float(vals[i + 1]) - float(vals[i])
        if dv == 0.0:
            continue
        if dp > 0.0:
            acc = acc + (dv / dp) * jnp.clip(Tc - float(pts[i]), 0.0, dp)
        else:   # duplicate abscissae: a value step at p_i
            acc = acc + dv * (Tc > float(pts[i])).astype(Tc.dtype)
    return acc


def _harm(ka, kb):
    den = ka + kb
    return jnp.where(den > 0, 2.0 * ka * kb / jnp.where(den > 0, den, 1.0),
                     0.0)


def _vp_fields_kernel(T_ref, M_ref, fx_ref, fy_ref, fz_ref, w_ref,
                      *rest, k_spec, cp_spec, rho, rad=None):
    """One x-plane per grid step: evaluate k(T)/cp(T) clamp-sums in
    registers, build the three PRE-MASKED harmonic face fields + 1/(rho cp).
    fx needs the previous plane's k and mask — a one-plane carry; fy/fz are
    in-plane sublane/lane shifts (zero-filled: domain edges vanish).

    rad: static ``(emissivity, t_inf, h_conv)`` — also emit the Picard
    radiative film h(T) (bc/radiation.radiative_h) as a 5th output,
    folding the step's separate XLA radiative pass (a full T re-read)
    into this one."""
    if rad is None:
        kbuf, mbuf = rest
        h_ref = None
    else:
        h_ref, kbuf, mbuf = rest
    i = pl.program_id(0)
    f32 = jnp.float32
    Tc = T_ref[0].astype(f32)
    m = M_ref[0].astype(jnp.int32).astype(f32)

    @pl.when(i == 0)
    def _init():
        kbuf[0] = jnp.zeros_like(kbuf[0])
        mbuf[0] = jnp.zeros_like(mbuf[0])

    k = (_clamp_sum(Tc, *k_spec) if isinstance(k_spec, tuple)
         else jnp.full_like(Tc, float(k_spec)))
    cp = (_clamp_sum(Tc, *cp_spec) if isinstance(cp_spec, tuple)
          else jnp.full_like(Tc, float(cp_spec)))
    w_ref[0] = (1.0 / (rho * cp)).astype(w_ref.dtype)
    if rad is not None:
        eps, tinf, hconv = rad
        Tk = Tc + 273.15
        Tik = tinf + 273.15
        h_ref[0] = (eps * 5.670374419e-8 * (Tk + Tik)
                    * (Tk * Tk + Tik * Tik) + hconv).astype(h_ref.dtype)

    k_prev = kbuf[0]
    m_prev = mbuf[0]
    fx_ref[0] = (_harm(k_prev, k) * (m_prev * m)).astype(fx_ref.dtype)
    fy_ref[0] = (_harm(_shift_lo(k, 0), k)
                 * (_shift_lo(m, 0) * m)).astype(fy_ref.dtype)
    fz_ref[0] = (_harm(_shift_lo(k, 1), k)
                 * (_shift_lo(m, 1) * m)).astype(fz_ref.dtype)
    kbuf[0] = k
    mbuf[0] = m


@functools.partial(jax.jit, static_argnames=("k_spec", "cp_spec", "rho",
                                             "rad", "interpret"))
def varprop_fields(T, mask_i8, *, k_spec, cp_spec, rho: float,
                   rad: tuple | None = None, interpret: bool = False):
    """The build_varprop_fields pass as ONE Pallas HBM pass: stream
    T (4 B) + mask (1 B), write fx/fy/fz/w (16 B) — the XLA formulation
    materializes k(T) and re-reads it shifted for every face direction
    (measured round 3 at 384^3 f32: 8.65 ms XLA even with the clamp-sum
    tables vs ~21 B/cell here).

    ``k_spec``/``cp_spec``: a float (constant property) or a static
    ``(points, values)`` tuple-of-tuples — the PropertyTable contents,
    baked as kernel immediates.  Compute is f32; outputs are ``T.dtype``.
    Returns ``(fx, fy, fz), w`` exactly like build_varprop_fields —
    plus the radiative film h(T) when ``rad=(eps, t_inf, h_conv)``
    (kernel docstring), shedding the step's separate XLA radiative pass."""
    nx, ny, nz = T.shape
    dtype = T.dtype

    p1 = _round_up(ny, 8) - ny
    p2 = _round_up(nz, 128) - nz
    if p1 or p2:
        pad = ((0, 0), (0, p1), (0, p2))
        T = jnp.pad(T, pad)
        mask_i8 = jnp.pad(mask_i8, pad)   # pad mask 0: faces vanish there
    Py, Pz = T.shape[1], T.shape[2]

    blk = (1, Py, Pz)
    idx = lambda i: (i, 0, 0)
    vspec = pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM)

    nout = 4 if rad is None else 5
    shp = jax.ShapeDtypeStruct((nx, Py, Pz), dtype)
    outs = pl.pallas_call(
        functools.partial(_vp_fields_kernel, k_spec=k_spec, cp_spec=cp_spec,
                          rho=rho, rad=rad),
        grid=(nx,),
        in_specs=[vspec, vspec],
        out_specs=[vspec] * nout,
        out_shape=[shp] * nout,
        scratch_shapes=[
            pltpu.VMEM((1, Py, Pz), jnp.float32),    # k plane carry
            pltpu.VMEM((1, Py, Pz), jnp.float32),    # mask plane carry
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(T, mask_i8)

    if p1 or p2:
        outs = [a[:, :ny, :nz] for a in outs]
    fx, fy, fz, w = outs[:4]
    if rad is None:
        return (fx, fy, fz), w
    return (fx, fy, fz), w, outs[4]
