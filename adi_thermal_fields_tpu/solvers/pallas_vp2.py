"""Tier-2 fully-fused variable-property sweep kernels (vp2).

The vp-fields tier (solvers/pallas_vpfields.py) streams five prebuilt
physical fields per sweep — rhs, hi-face harmonic conductivity, dt/(rho cp),
Robin sink, Robin srhs — ~24 B/cell/sweep, plus the XLA passes that BUILD
those streams from T^n (~58 B/cell/step measured in the round-3/4 traffic
models).  These kernels derive every per-cell quantity IN REGISTERS from
T^n and a 1-byte face code instead:

    k(T), cp(T):   static piecewise-linear clamp-sum chains (the
                   PropertyTable evaluation, breakpoints baked as kernel
                   immediates — solvers/pallas_varprop._clamp_sum);
    faces:         harmonic mean of adjacent k's with a one-row lookahead
                   (group-internal rows + pre-gathered chunk/group boundary
                   rows), lo faces carried row-to-row — exactly
                   step/cartesian_varprop._face_g's values;
    dw:            (dt/rho) / cp(T), streamed dt via SMEM;
    radiative h:   Picard-linearized Stefan-Boltzmann film
                   eps sig (Tk+Tik)(Tk^2+Tik^2) per cell (bc/radiation.
                   radiative_h), evaluated against each surface's ambient;
    sink/srhs:     material/void interface films from code exposure bits x
                   per-row A/V geometry columns; domain-edge Robin films as
                   static first/last-row terms, mask-gated by the act bit.

Per sweep the HBM traffic is read rhs (4) + T (4) + code (1) + write x (4)
= 13 B/cell — 9 B when the rhs IS T (the first sweep of a BE chain) — and
the XLA stream-build passes disappear entirely.  Step-level model for the
cylindrical varprop BE step: ~45 B/cell vs the vp-fields tier's ~130.

Code bits (int8, built by ``build_vp2_code``):

    1   hi-face coupling live (both cells active; domain hi edge: 0;
        periodic axes wrap)
    2   lo face exposed to void (material/void interface film h_lo)
    4   hi face exposed to void (film h_hi)
    8   cell active (identity row when 0; gates domain-edge films)
    16  lo-face coupling live (consumed only by the cyclic kernel's wrap
        row 0 — open sweeps carry lo faces from the previous row's hi)

Boundary semantics are identical to the vp-fields tier: Dirichlet end rows
zero their static geometry column entries and pre-pin the rhs; Robin edge
rows cancel the boundary conductivity by ghost elimination so no k(T)
enters the films.  Reference semantics: adi3d_numba_coeff.py:290-302
(coefficient construction), quick_spiral_deposition_gif_v5.py:31-70
(masked cylindrical clamp model).

The sequential solve follows the chip-proven chunked-DMA structure of
pallas_vpfields (double-buffered input chunks, G=8 row groups, f32 cp/dp
line buffers, optional NATURAL rhs/out relayout for the z sweep).

Round 5: SCALED-ROW elimination — each tridiagonal row is multiplied by
1/dw = cp(T)/dtor (Thomas cp/dp and Sherman-Morrison are row-scale
invariant), turning the per-row dw divide into a multiply; rows with no
live coupling keep scale 1 so identity/Dirichlet/padded rows pass their
rhs through bitwise.  Cross-tier parity vs pallas_vpfields is therefore
round-off-level (<= a few e-3 K at 1500 C), not bitwise.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_varprop import _clamp_sum, _harm

__all__ = ["build_vp2_code", "fused_vp2_sweep", "fused_vp2_cyclic_axis1",
           "fused_vp2_sweep_axis1", "vp2_streams_xla",
           "vp2_cyclic_streams_xla"]

G = 8
_SB = 5.670374419e-8
_T0K = 273.15


def _round_up(v, m):
    return -(-v // m) * m


# ---------------------------------------------------------------------------
# code construction + XLA stream oracle (also the custom-VJP rebuild path)
# ---------------------------------------------------------------------------

def build_vp2_code(act, axis: int, *, periodic: bool = False,
                   clear_rows=(), edge_exposed: bool = False) -> jax.Array:
    """int8 face code along ``axis`` from the active mask (module bits).

    act: bool field (any rank); ``None`` is not accepted here — pass
    ``jnp.ones(shape, bool)`` for unmasked domains (the constant-fold is
    free under jit).  periodic: wrap neighbors (phi).  clear_rows: row
    indices along ``axis`` whose FILM bits (2|4: exposures) are cleared —
    Dirichlet pins carry no Robin films, but their coupling-live bits must
    SURVIVE: the neighbor row's lo face is this row's hi face, and the
    shared face conductivity stays live so the neighbor keeps its coupling
    into the pinned value (the vp-fields tier's Dirichlet contract).
    Full identity rows (axis regularity) instead zero the code entirely at
    the call site.  edge_exposed: domain-edge faces count as EXPOSED (the
    Cartesian family's Robin convention, bc/faces.exposed_face fill=False
    — every mask-boundary face cools, including at the domain edge); the
    cylindrical family keeps them film-free (dedicated edge Robin rows)."""
    act = act.astype(bool)
    if periodic:
        nb_hi = jnp.roll(act, -1, axis=axis)
        nb_lo = jnp.roll(act, 1, axis=axis)
        ex_hi, ex_lo = nb_hi, nb_lo       # every neighbor exists
    else:
        from ..bc.faces import shift_in

        nb_hi = shift_in(act, axis, +1, fill=False)
        nb_lo = shift_in(act, axis, -1, fill=False)
        if edge_exposed:
            ex_hi, ex_lo = nb_hi, nb_lo
        else:
            # domain-edge faces are NOT exposed (fill=True)
            ex_hi = shift_in(act, axis, +1, fill=True)
            ex_lo = shift_in(act, axis, -1, fill=True)
    code = ((act & nb_hi).astype(jnp.int8)
            + 2 * (act & ~ex_lo).astype(jnp.int8)
            + 4 * (act & ~ex_hi).astype(jnp.int8)
            + 8 * act.astype(jnp.int8)
            + 16 * (act & nb_lo).astype(jnp.int8))
    for idx in clear_rows:
        sl = [slice(None)] * code.ndim
        sl[axis] = idx
        code = code.at[tuple(sl)].set(code[tuple(sl)] & jnp.int8(~6))
    return code


def _ev_spec(spec, Tc):
    if isinstance(spec, tuple):
        return _clamp_sum(Tc, *spec)
    return jnp.full_like(Tc, float(spec))


def _rad(Tc, eps: float, tinf: float):
    """Picard-linearized radiative film (bc/radiation.radiative_h,
    celsius convention)."""
    Tk = Tc + _T0K
    Tik = tinf + _T0K
    return (eps * _SB) * (Tk + Tik) * (Tk * Tk + Tik * Tik)


def vp2_streams_xla(T, code, gs_lo, gs_hi, dtor, *, k_spec, cp_spec,
                    h_lo: float, h_hi: float, tinf_void: float,
                    emissivity: float = 0.0, edge0=None, edge1=None):
    """XLA reference of the in-kernel derivations for the OPEN sweep:
    (fhi, dw, sink, srhs) along axis 0 of (n, B1, B2) T/code — the
    custom-VJP rebuild path (solvers/differentiable.vp2_sweep_solve) and
    the interpret-mode test oracle.  gs_lo/gs_hi: (n,) sink A/V geometry;
    dtor: traced dt/rho scalar; edge0/edge1: None or static
    (h, geo, t_inf) domain films at rows 0 / n-1."""
    f32 = jnp.promote_types(T.dtype, jnp.float32)
    Tc = T.astype(f32)
    c = code.astype(jnp.int32)
    bit = lambda b: ((c & b) > 0).astype(f32)
    k = _ev_spec(k_spec, Tc)
    k_up = jnp.concatenate([k[1:], k[-1:]], axis=0)
    fhi = _harm(k, k_up) * bit(1)
    dw = dtor / _ev_spec(cp_spec, Tc)
    hr_v = _rad(Tc, emissivity, tinf_void) if emissivity > 0.0 else 0.0
    col = lambda v: jnp.asarray(v, f32)[:, None, None]
    sink = (bit(2) * col(gs_lo) * (h_lo + hr_v)
            + bit(4) * col(gs_hi) * (h_hi + hr_v))
    srhs = sink * tinf_void
    for idx, edge in ((0, edge0), (-1, edge1)):
        if edge is None:
            continue
        h_e, g_e, tinf_e = (float(v) for v in edge)
        hr_e = _rad(Tc[idx], emissivity, tinf_e) if emissivity > 0.0 else 0.0
        s_e = bit(8)[idx] * g_e * (h_e + hr_e)
        sink = sink.at[idx].add(s_e)
        srhs = srhs.at[idx].add(s_e * tinf_e)
    return fhi, dw, sink, srhs


def vp2_cyclic_streams_xla(T, code, gs2, dtor, *, k_spec, cp_spec,
                           h_void: float, tinf_void: float,
                           emissivity: float = 0.0):
    """XLA reference for the CYCLIC sweep along axis 1 of (B1, n, B2)
    T/code: (flo, dw, sink, srhs); gs2 is the (B1, B2) sink geometry."""
    f32 = jnp.promote_types(T.dtype, jnp.float32)
    Tc = T.astype(f32)
    c = code.astype(jnp.int32)
    bit = lambda b: ((c & b) > 0).astype(f32)
    k = _ev_spec(k_spec, Tc)
    flo = _harm(jnp.roll(k, 1, axis=1), k) * bit(16)
    dw = dtor / _ev_spec(cp_spec, Tc)
    hr_v = _rad(Tc, emissivity, tinf_void) if emissivity > 0.0 else 0.0
    sink = (bit(2) + bit(4)) * gs2[:, None, :].astype(f32) * (h_void + hr_v)
    return flo, dw, sink, sink * tinf_void


# ---------------------------------------------------------------------------
# open sweep kernel (axis 0 of (n, B1, B2); optional NATURAL rhs/out)
# ---------------------------------------------------------------------------

def _vp2_kernel(scal_ref, glo_ref, ghi_ref, gsl_ref, gsh_ref, d_hbm, t_hbm,
                code_hbm, tb_hbm, out_hbm, xbuf, dpbuf, dbuf, tbuf, cbuf,
                bbuf, dnat, tnat, qd, qt, obuf, in_sem, bsem, out_sem, *,
                n, n_true, cn, b1, b2, spec):
    """Open-line vp2 sweep (module docstring).  ``dnat/tnat/qd/qt/obuf``
    non-None = NATURAL rhs/out mode: rhs and T are read from NATURAL
    (B1, B2, n) arrays and relaid in VMEM (the chip-gated chunk-relayout
    pattern, scripts/znat_chip.py); code and the solution layouts follow
    pallas_vpfields._vp_fields_kernel.  ``dbuf/dnat`` None = rhs IS T
    (the first sweep of a BE chain: one stream fewer)."""
    (k_spec, cp_spec, h_lo, h_hi, tinf_void, eps, edge0, edge1) = spec
    f32 = xbuf.dtype
    nat = tnat is not None
    has_d = (dbuf is not None) or (dnat is not None)
    i = pl.program_id(0)
    j = pl.program_id(1)
    r0 = i * b1
    c0 = j * b2
    nchunks = n // cn
    dtor = scal_ref[0]
    inv_dtor = 1.0 / dtor          # one scalar divide per kernel call

    def in_dmas(slot, k):
        s = k * cn
        src = lambda ref: ref.at[pl.ds(s, cn), pl.ds(r0, b1), pl.ds(c0, b2)]
        natsrc = lambda ref: ref.at[pl.ds(r0, b1), pl.ds(c0, b2),
                                    pl.ds(s, cn)]
        dmas = ()
        if has_d:
            dmas += ((pltpu.make_async_copy(natsrc(d_hbm), dnat.at[slot],
                                            in_sem.at[slot, 0]) if nat else
                      pltpu.make_async_copy(src(d_hbm), dbuf.at[slot],
                                            in_sem.at[slot, 0])),)
        dmas += (
            (pltpu.make_async_copy(natsrc(t_hbm), tnat.at[slot],
                                   in_sem.at[slot, 1]) if nat else
             pltpu.make_async_copy(src(t_hbm), tbuf.at[slot],
                                   in_sem.at[slot, 1])),
            pltpu.make_async_copy(src(code_hbm), cbuf.at[slot],
                                  in_sem.at[slot, 2]),
        )
        return dmas

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

    # chunk-boundary rows of T (nchunks, b1, b2): one DMA per tile
    bdma = pltpu.make_async_copy(
        tb_hbm.at[:, pl.ds(r0, b1), pl.ds(c0, b2)], bbuf, bsem)
    bdma.start()
    for dma in in_dmas(0, 0):
        dma.start()
    if nchunks > 1:
        for dma in in_dmas(1, 1):
            dma.start()
    bdma.wait()

    zero = jnp.zeros((b1, b2), f32)
    # carry: cp', dp', f_lo of the next row (= f_hi of this row), k carry
    carry = (zero, zero, zero)
    for k in range(nchunks):
        slot = k % 2
        for dma in in_dmas(slot, k):
            dma.wait()
        if nat:
            # (b1, b2, cn) -> (b1, cn, b2): b1 independent 2-D transposes
            for r in range(b1):
                if has_d:
                    qd[r] = jnp.transpose(dnat[slot][r], (1, 0)).astype(f32)
                qt[r] = jnp.transpose(tnat[slot][r], (1, 0)).astype(f32)
        # next-chunk boundary row of T (value unused for the last chunk:
        # the hi-live bit of row n-1 is always 0)
        t_bnd_chunk = bbuf[k].astype(f32)

        def grp(g, carry, *, slot=slot, base=k * cn,
                t_bnd_chunk=t_bnd_chunk):
            cp_prev, dp_prev, f_lo = carry
            s = pl.multiple_of(g * G, G)
            if nat:
                t_g = jnp.swapaxes(qt[:, pl.ds(s, G)], 0, 1)
                d_g = (jnp.swapaxes(qd[:, pl.ds(s, G)], 0, 1) if has_d
                       else t_g)
                # next group's first row (aligned G-slice, row 0); the
                # clamp keeps the slice in bounds — the clamped value is
                # only consumed when g is NOT the chunk's last group
                nb = pl.multiple_of(jnp.minimum(s + G, cn - G), G)
                t_nxt = jnp.swapaxes(qt[:, pl.ds(nb, G)], 0, 1)[0]
            else:
                t_g = tbuf[slot, pl.ds(s, G)].astype(f32)
                d_g = (dbuf[slot, pl.ds(s, G)].astype(f32) if has_d
                       else t_g)
                nb = jnp.minimum(s + G, cn - 1)
                t_nxt = tbuf[slot, nb].astype(f32)
            code_g = cbuf[slot, pl.ds(s, G)].astype(jnp.int32)
            in_chunk = s + G < cn
            t_bnd = jnp.where(in_chunk, t_nxt, t_bnd_chunk)
            ks = [_ev_spec(k_spec, t_g[r]) for r in range(G)]
            k_bnd = _ev_spec(k_spec, t_bnd)
            cps, dps = [], []
            for r in range(G):
                row = base + s + r
                c_r32 = code_g[r]
                bit = lambda b: ((c_r32 & b) > 0).astype(f32)
                k_next = ks[r + 1] if r + 1 < G else k_bnd
                f_hi = _harm(ks[r], k_next) * bit(1)
                hr_v = _rad(t_g[r], eps, tinf_void) if eps > 0.0 else 0.0
                sink = (bit(2) * gsl_ref[row] * (h_lo + hr_v)
                        + bit(4) * gsh_ref[row] * (h_hi + hr_v))
                srhs = sink * tinf_void
                if edge0 is not None:
                    h_e, g_e, tinf_e = edge0
                    hr_e = (hr_v if (eps <= 0.0 or tinf_e == tinf_void)
                            else _rad(t_g[r], eps, tinf_e))
                    s_e = jnp.where(row == 0,
                                    bit(8) * g_e * (h_e + hr_e), 0.0)
                    sink = sink + s_e
                    srhs = srhs + s_e * tinf_e
                if edge1 is not None:
                    h_e, g_e, tinf_e = edge1
                    hr_e = (hr_v if (eps <= 0.0 or tinf_e == tinf_void)
                            else _rad(t_g[r], eps, tinf_e))
                    s_e = jnp.where(row == n_true - 1,
                                    bit(8) * g_e * (h_e + hr_e), 0.0)
                    sink = sink + s_e
                    srhs = srhs + s_e * tinf_e
                al = glo_ref[row] * f_lo
                ch = ghi_ref[row] * f_hi
                # SCALED-ROW elimination (round 5): multiply the row by
                # 1/dw = cp(T)/dtor — Thomas cp/dp are row-scale invariant,
                # so the dw DIVIDE becomes a multiply.  Rows with no live
                # coupling keep scale 1 so identity/Dirichlet rows pass
                # rhs through BITWISE (the regularity contract).
                coup = al + ch + sink
                w_r = jnp.where(coup > 0.0,
                                _ev_spec(cp_spec, t_g[r]) * inv_dtor, 1.0)
                b_r = w_r + coup
                d_r = d_g[r] * w_r + srhs
                inv = 1.0 / (b_r + al * cp_prev)
                cp_prev = -ch * inv
                dp_prev = (d_r + al * dp_prev) * inv
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
                out_dma(k + 2).wait()          # staging slot free?
            xk = jnp.swapaxes(xbuf[pl.ds(base, cn)], 0, 1)   # (b1, cn, b2)
            for r in range(b1):
                obuf[k % 2, r] = jnp.transpose(xk[r], (1, 0)).astype(
                    obuf.dtype)
        out_dma(k).start()

    for k in range(min(nchunks, 2) if nat else nchunks):
        out_dma(k).wait()


def _as_spec(v):
    if isinstance(v, tuple):
        return tuple((tuple(float(x) for x in v[0]),
                      tuple(float(x) for x in v[1])))
    return float(v)


@functools.partial(jax.jit, static_argnames=(
    "k_spec", "cp_spec", "h_lo", "h_hi", "tinf_void", "emissivity",
    "edge0", "edge1", "nat_rhs_out", "interpret", "block_b1", "block_b2",
    "chunk", "pipelined"))
def fused_vp2_sweep(rhs, T, code, geo_lo, geo_hi, gs_lo, gs_hi, dtor, *,
                    k_spec, cp_spec, h_lo: float = 0.0, h_hi: float = 0.0,
                    tinf_void: float = 0.0, emissivity: float = 0.0,
                    edge0=None, edge1=None, nat_rhs_out: bool = False,
                    interpret: bool = False, block_b1: int = 8,
                    block_b2: int | None = None, chunk: int | None = None,
                    pipelined: bool | None = None):
    """Fully-fused variable-property sweep along axis 0 of (n, B1, B2)
    T/code (module docstring).

    rhs: the chained right-hand side, or ``None`` when it IS T (first BE
         sweep: sheds the stream).  With ``nat_rhs_out``, rhs and T are
         passed — and the solution returned — in the NATURAL (B1, B2, n)
         layout (code stays solve-axis-leading; in-VMEM chunk relayout).
    geo_lo/geo_hi: (n,) coupling metric columns (zeros = Dirichlet rows).
    gs_lo/gs_hi: (n,) interface-film A/V geometry columns.
    dtor: traced dt/rho scalar.
    k_spec/cp_spec: float or (points, values) tuples (PropertyTable).
    edge0/edge1: None or static (h, geo, t_inf) domain Robin films folded
         into rows 0 / n-1 (act-gated by code bit 8).
    """
    has_d = rhs is not None
    if nat_rhs_out:
        if not has_d:
            raise ValueError("nat_rhs_out needs an explicit rhs (the z "
                             "sweep rhs is never T)")
        b1, b2, n = T.shape
    else:
        n, b1, b2 = T.shape
    dtype = T.dtype
    if jnp.dtype(dtype).itemsize != 4:
        raise ValueError("vp2 kernels take f32 streams; upcast/downcast "
                         "around them (adi_step_cyl_varprop does)")
    if chunk is None:
        chunk = 128 if nat_rhs_out else 64
    if nat_rhs_out:
        cn = max(128, min(_round_up(chunk, 128), _round_up(n, 128)))
    else:
        cn = min(chunk, _round_up(n, G))
    if block_b2 is None:
        # ADAPTIVE lane tile: minimize padding over legal 128-multiples —
        # a fixed 256 padded the Cartesian 384^3 z solve's lanes
        # 384 -> 512 (33% wasted relayout+compute, the round-3 fixed-tile
        # cliff class).  Tie preference by FORM (chip tune (64,512,1024)):
        # streaming/nat prefers the largest (nat-z b2=512/cn=128 1.20 ms
        # vs 256 1.31); the cross-tile-pipelined short-line form prefers
        # 256 (r leg 0.43 ms at 256 vs 0.61 at 512 — more tiles, more
        # overlap).
        short_line = (not nat_rhs_out) and _round_up(n, cn) <= cn
        cands = ((256, 128, 512, 384) if short_line
                 else (512, 384, 256, 128))
        block_b2 = min(cands,
                       key=lambda c: (_round_up(b2, c), cands.index(c)))
    pn = _round_up(n, cn) - n
    p1 = _round_up(b1, block_b1) - b1
    p2 = _round_up(b2, block_b2) - b2
    if p1 or p2 or pn:
        natpad = ((0, p1), (0, p2), (0, pn))
        lead = ((0, pn), (0, p1), (0, p2))
        T = jnp.pad(T, natpad if nat_rhs_out else lead)
        if has_d:
            rhs = jnp.pad(rhs, natpad if nat_rhs_out else lead)
        code = jnp.pad(code, lead)     # padded rows: code 0 -> identities
    if pn:
        geo_lo = jnp.pad(geo_lo, (0, pn))
        geo_hi = jnp.pad(geo_hi, (0, pn))
        gs_lo = jnp.pad(gs_lo, (0, pn))
        gs_hi = jnp.pad(gs_hi, (0, pn))
    n_pad, P1, P2 = code.shape
    nchunks = n_pad // cn
    cdt = jnp.float32

    # chunk-boundary T rows (tiny: 1/cn of the field), leading dim untiled
    if nat_rhs_out:
        tb = jnp.moveaxis(T[:, :, cn::cn], 2, 0)
    else:
        tb = T[cn::cn]
    if tb.shape[0] < nchunks:      # last chunk's slot: value unused
        tb = jnp.concatenate(
            [tb, jnp.zeros((nchunks - tb.shape[0], P1, P2), dtype)], axis=0)

    scal = jnp.asarray(dtor, cdt).reshape(1)
    spec = (_as_spec(k_spec), _as_spec(cp_spec), float(h_lo), float(h_hi),
            float(tinf_void), float(emissivity),
            None if edge0 is None else tuple(float(v) for v in edge0),
            None if edge1 is None else tuple(float(v) for v in edge1))

    # short lines (whole line = one chunk) have ZERO DMA/compute overlap
    # in the streaming form — pipeline across batch tiles instead (the
    # masked family's measured ~18% win; the cylindrical r solve at
    # nr ~ 64 is exactly this shape)
    itemsz = 4
    tile_bytes = n_pad * block_b1 * block_b2 * (
        2 * (2 + has_d) * itemsz + 2 * 1    # stream slots + code
        + 2 * itemsz + itemsz)              # cp/dp lines + obuf
    if pipelined is None:
        pipelined = (not nat_rhs_out and n_pad <= cn
                     and tile_bytes <= 48 * 1024 * 1024)
    if pipelined:
        assert not nat_rhs_out, "the pipelined form is solve-leading only"
        grid = (P1 // block_b1, P2 // block_b2)
        hbm = pl.BlockSpec(memory_space=pl.ANY)
        sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
        scratch = [
            pltpu.VMEM((n_pad, block_b1, block_b2), cdt),        # x / cp
            pltpu.VMEM((n_pad, block_b1, block_b2), cdt),        # dp
            (pltpu.VMEM((2, n_pad, block_b1, block_b2), dtype)
             if has_d else None),                                # rhs tiles
            pltpu.VMEM((2, n_pad, block_b1, block_b2), dtype),   # T tiles
            pltpu.VMEM((2, n_pad, block_b1, block_b2), jnp.int8),  # codes
            pltpu.VMEM((n_pad, block_b1, block_b2), dtype),      # out stage
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA,
        ]

        def pbody(scal_, glo_, ghi_, gsl_, gsh_, *rest):
            it = iter(rest)
            d_ = next(it) if has_d else None
            t_, c_, o_ = (next(it) for _ in range(3))
            xb, dp = next(it), next(it)
            db = next(it) if has_d else None
            tbc, cb, ob = next(it), next(it), next(it)
            isem, osem = next(it), next(it)
            return _vp2_pipe_kernel(
                scal_, glo_, ghi_, gsl_, gsh_, d_, t_, c_, o_, xb, dp, db,
                tbc, cb, ob, isem, osem, n=n_pad, n_true=n, b1=block_b1,
                b2=block_b2, nt1=P1 // block_b1, nt2=P2 // block_b2,
                spec=spec)

        inputs = [scal, geo_lo.astype(cdt), geo_hi.astype(cdt),
                  gs_lo.astype(cdt), gs_hi.astype(cdt)]
        in_specs = [sspec, sspec, sspec, sspec, sspec]
        if has_d:
            inputs.append(rhs)
            in_specs.append(hbm)
        inputs += [T, code]
        in_specs += [hbm, hbm]
        out = pl.pallas_call(
            pbody,
            grid=grid,
            in_specs=in_specs,
            out_specs=hbm,
            out_shape=jax.ShapeDtypeStruct((n_pad, P1, P2), dtype),
            scratch_shapes=[s for s in scratch if s is not None],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(*inputs)
        if p1 or p2 or pn:
            out = out[:n, :b1, :b2]
        return out

    grid = (P1 // block_b1, P2 // block_b2)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    nat = nat_rhs_out
    scratch = [
        pltpu.VMEM((n_pad, block_b1, block_b2), cdt),    # x / cp
        pltpu.VMEM((n_pad, block_b1, block_b2), cdt),    # dp
        (pltpu.VMEM((2, cn, block_b1, block_b2), dtype)
         if has_d and not nat else None),                # rhs chunks
        (None if nat else
         pltpu.VMEM((2, cn, block_b1, block_b2), dtype)),  # T chunks
        pltpu.VMEM((2, cn, block_b1, block_b2), jnp.int8),  # code chunks
        pltpu.VMEM((nchunks, block_b1, block_b2), dtype),   # T boundary
        (pltpu.VMEM((2, block_b1, block_b2, cn), dtype)
         if nat and has_d else None),                    # nat rhs in
        (pltpu.VMEM((2, block_b1, block_b2, cn), dtype)
         if nat else None),                              # nat T in
        (pltpu.VMEM((block_b1, cn, block_b2), cdt)
         if nat and has_d else None),                    # relaid rhs
        (pltpu.VMEM((block_b1, cn, block_b2), cdt)
         if nat else None),                              # relaid T
        (pltpu.VMEM((2, block_b1, block_b2, cn), dtype)
         if nat else None),                              # nat out stage
        pltpu.SemaphoreType.DMA((2, 3)),
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA((nchunks,)),
    ]

    def body(scal_, glo_, ghi_, gsl_, gsh_, *rest):
        it = iter(rest)
        d_ = next(it) if has_d else None
        t_, c_, tb_, o_ = (next(it) for _ in range(4))
        xb, dp = next(it), next(it)
        db = next(it) if has_d and not nat else None
        tbch = None if nat else next(it)
        cb, bb = next(it), next(it)
        dn = next(it) if nat and has_d else None
        tn = next(it) if nat else None
        qdb = next(it) if nat and has_d else None
        qtb = next(it) if nat else None
        ob = next(it) if nat else None
        isem, bsm, osem = next(it), next(it), next(it)
        return _vp2_kernel(scal_, glo_, ghi_, gsl_, gsh_, d_, t_, c_, tb_,
                           o_, xb, dp, db, tbch, cb, bb, dn, tn, qdb, qtb,
                           ob, isem, bsm, osem, n=n_pad, n_true=n, cn=cn,
                           b1=block_b1, b2=block_b2, spec=spec)

    inputs = [scal, geo_lo.astype(cdt), geo_hi.astype(cdt),
              gs_lo.astype(cdt), gs_hi.astype(cdt)]
    in_specs = [sspec, sspec, sspec, sspec, sspec]
    if has_d:
        inputs.append(rhs)
        in_specs.append(hbm)
    inputs += [T, code, tb]
    in_specs += [hbm, hbm, hbm]

    out = pl.pallas_call(
        body,
        grid=grid,
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


# ---------------------------------------------------------------------------
# cyclic sweep kernel (axis 1 of (B1, n, B2), natural layout — phi)
# ---------------------------------------------------------------------------

def _vp2_cyclic_kernel(scal_ref, geo_ref, gs_ref, d_hbm, t_hbm, code_hbm,
                       tb_hbm, out_hbm, ybuf, zbuf, cpbuf, dbuf, tbuf, cbuf,
                       bbuf, in_sem, out_sem, *, n, n_pad, cn, b1, b2, spec):
    """Cyclic vp2 sweep along axis 1 of natural (B1, n, B2) T/rhs/code:
    Sherman-Morrison double solve exactly as pallas_vpfields.
    _vp_cyclic_axis1_kernel, with k/cp/films derived in registers.

    tb_hbm -> bbuf: pre-gathered T rows, leading dim untiled —
    bbuf[t] = T[:, (t+1)G mod n, :] for t < ngroups (hi lookahead at group
    ends; the last group's boundary is the wrap row 0), bbuf[ng] = T[:, 0]
    (hi face of row n-1), bbuf[ng+1] = T[:, n-1] (lo face of row 0)."""
    (k_spec, cp_spec, h_void, tinf_void, eps) = spec
    f32 = ybuf.dtype
    i = pl.program_id(0)
    j = pl.program_id(1)
    r0 = i * b1
    c0 = j * b2
    nchunks = n_pad // cn
    dtor = scal_ref[0]
    inv_dtor = 1.0 / dtor          # one scalar divide per kernel call
    geo = geo_ref[...].astype(f32)          # (b1, b2) coupling metric
    gs = gs_ref[...].astype(f32)            # (b1, b2) film A/V metric

    def in_dmas(slot, k):
        s = k * cn
        src = lambda ref: ref.at[pl.ds(r0, b1), pl.ds(s, cn), pl.ds(c0, b2)]
        return (
            pltpu.make_async_copy(src(d_hbm), dbuf.at[slot],
                                  in_sem.at[slot, 0]),
            pltpu.make_async_copy(src(t_hbm), tbuf.at[slot],
                                  in_sem.at[slot, 1]),
            pltpu.make_async_copy(src(code_hbm), cbuf.at[slot],
                                  in_sem.at[slot, 2]),
        )

    def out_dma(k):
        s = k * cn
        return pltpu.make_async_copy(
            ybuf.at[:, pl.ds(s, cn), :],
            out_hbm.at[pl.ds(r0, b1), pl.ds(s, cn), pl.ds(c0, b2)],
            out_sem.at[k])

    bdma = pltpu.make_async_copy(
        tb_hbm.at[:, pl.ds(r0, b1), pl.ds(c0, b2)], bbuf, in_sem.at[0, 3])
    bdma.start()
    for dma in in_dmas(0, 0):
        dma.start()
    if nchunks > 1:
        for dma in in_dmas(1, 1):
            dma.start()
    bdma.wait()

    ng = n_pad // G
    k_wrap_hi = _ev_spec(k_spec, bbuf[ng].astype(f32))      # k at row 0
    k_wrap_lo = _ev_spec(k_spec, bbuf[ng + 1].astype(f32))  # k at row n-1

    zero = jnp.zeros((b1, b2), f32)
    carry = (zero, zero, zero, jnp.full((b1, b2), -1.0, f32), zero, zero)
    for k in range(nchunks):
        slot = k % 2
        for dma in in_dmas(slot, k):
            dma.wait()

        def grp(g, carry, *, slot=slot, base=k * cn):
            cp_prev, dy_prev, dz_prev, gamma, beta, f_lo = carry
            s = pl.multiple_of(g * G, G)
            sw = lambda ref: jnp.swapaxes(
                ref[slot, :, pl.ds(s, G), :], 0, 1)
            d_g = sw(dbuf).astype(f32)
            t_g = sw(tbuf).astype(f32)
            code_g = sw(cbuf).astype(jnp.int32)
            gt = k * (cn // G) + g       # global group index
            k_bnd = _ev_spec(k_spec, bbuf[gt].astype(f32))
            ks = [_ev_spec(k_spec, t_g[r]) for r in range(G)]
            cps, dys, dzs = [], [], []
            for r in range(G):
                row = base + s + r
                first = row == 0
                last = row == n - 1
                c_r32 = code_g[r]
                bit = lambda b: ((c_r32 & b) > 0).astype(f32)
                k_next = ks[r + 1] if r + 1 < G else k_bnd
                k_next = jnp.where(last, k_wrap_hi, k_next)
                f_hi = _harm(ks[r], k_next) * bit(1)
                f_lo_r = jnp.where(
                    first, _harm(k_wrap_lo, ks[r]) * bit(16), f_lo)
                hr_v = _rad(t_g[r], eps, tinf_void) if eps > 0.0 else 0.0
                sink = (bit(2) + bit(4)) * gs * (h_void + hr_v)
                # SCALED-ROW form (open-kernel note): rows scaled by
                # 1/dw = cp(T)/dtor — Sherman-Morrison applies unchanged
                # to the scaled cyclic system (its own gamma/beta/alpha);
                # coupling-free rows keep scale 1 (bitwise regularity).
                al = geo * f_lo_r
                ch = geo * f_hi
                coup = al + ch + sink
                w_r = jnp.where(coup > 0.0,
                                _ev_spec(cp_spec, t_g[r]) * inv_dtor, 1.0)
                b_r = w_r + coup
                d_r = d_g[r] * w_r + sink * tinf_void
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
                f_lo = f_hi
            cpbuf[:, pl.ds(base + s, G), :] = \
                jnp.swapaxes(jnp.stack(cps), 0, 1)
            ybuf[:, pl.ds(base + s, G), :] = \
                jnp.swapaxes(jnp.stack(dys), 0, 1)
            zbuf[:, pl.ds(base + s, G), :] = \
                jnp.swapaxes(jnp.stack(dzs), 0, 1)
            return cp_prev, dy_prev, dz_prev, gamma, beta, f_lo

        carry = lax.fori_loop(0, cn // G, grp, carry)
        if k + 2 < nchunks:
            for dma in in_dmas(slot, k + 2):
                dma.start()

    _, _, _, gamma, beta, _ = carry
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


@functools.partial(jax.jit, static_argnames=(
    "k_spec", "cp_spec", "h_void", "tinf_void", "emissivity", "interpret",
    "block_b1", "block_b2", "chunk"))
def fused_vp2_cyclic_axis1(rhs, T, code, geo2, gs2, dtor, *, k_spec,
                           cp_spec, h_void: float = 0.0,
                           tinf_void: float = 0.0, emissivity: float = 0.0,
                           interpret: bool = False, block_b1: int = 8,
                           block_b2: int | None = None, chunk: int = 128):
    """Fully-fused variable-property CYCLIC sweep along axis 1 of natural
    (B1, n, B2) rhs/T/code (module docstring; the phi solve).

    geo2/gs2: (B1, B2) coupling / film metric fields (1/(r dphi)^2 and
    1/(r dphi) broadcast over z).  Defaults (b2 adaptive-prefer-256,
    cn=128) from the 2026-08-21 chip tune at (64,512,1024): 2.33 ms vs
    2.66 at the old (128, 64)."""
    b1, n, b2 = T.shape
    dtype = T.dtype
    if jnp.dtype(dtype).itemsize != 4:
        raise ValueError("vp2 kernels take f32 streams; upcast/downcast "
                         "around them (adi_step_cyl_varprop does)")
    if block_b2 is None:
        cands = (256, 128, 512, 384)
        block_b2 = min(cands,
                       key=lambda c: (_round_up(b2, c), cands.index(c)))
    cn = min(chunk, _round_up(n, G))
    pn = _round_up(n, cn) - n
    p1 = _round_up(b1, block_b1) - b1
    p2 = _round_up(b2, block_b2) - b2
    if p1 or p2 or pn:
        pad = ((0, p1), (0, pn), (0, p2))
        rhs = jnp.pad(rhs, pad)
        T = jnp.pad(T, pad)
        code = jnp.pad(code, pad)      # padded rows: code 0 -> identities
        geo2 = jnp.pad(geo2, ((0, p1), (0, p2)))
        gs2 = jnp.pad(gs2, ((0, p1), (0, p2)))
    P1, n_pad, P2 = T.shape
    ng = n_pad // G
    # pre-gathered boundary T rows (docstring)
    idx = np.arange(1, ng + 1) * G
    idx = np.where(idx < n, idx, 0) % n     # rows past n-1: value unused
    tb = jnp.moveaxis(
        jnp.concatenate([T[:, idx, :], T[:, :1, :], T[:, n - 1:n, :]],
                        axis=1), 1, 0)

    scal = jnp.asarray(dtor, jnp.float32).reshape(1)
    spec = (_as_spec(k_spec), _as_spec(cp_spec), float(h_void),
            float(tinf_void), float(emissivity))

    grid = (P1 // block_b1, P2 // block_b2)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    gspec = pl.BlockSpec((block_b1, block_b2), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)
    cdt = jnp.float32
    scratch = [
        pltpu.VMEM((block_b1, n_pad, block_b2), cdt),    # y / dy
        pltpu.VMEM((block_b1, n_pad, block_b2), cdt),    # z / dz
        pltpu.VMEM((block_b1, n_pad, block_b2), cdt),    # cp
        pltpu.VMEM((2, block_b1, cn, block_b2), dtype),  # rhs chunks
        pltpu.VMEM((2, block_b1, cn, block_b2), dtype),  # T chunks
        pltpu.VMEM((2, block_b1, cn, block_b2), jnp.int8),  # code chunks
        pltpu.VMEM((ng + 2, block_b1, block_b2), dtype),    # boundary rows
        pltpu.SemaphoreType.DMA((2, 4)),
        pltpu.SemaphoreType.DMA((n_pad // cn,)),
    ]

    def body(scal_, geo_, gs_, d_, t_, c_, tb_, o_, yb, zb, cpb, db, tbc,
             cb, bb, isem, osem):
        return _vp2_cyclic_kernel(scal_, geo_, gs_, d_, t_, c_, tb_, o_,
                                  yb, zb, cpb, db, tbc, cb, bb, isem, osem,
                                  n=n, n_pad=n_pad, cn=cn, b1=block_b1,
                                  b2=block_b2, spec=spec)

    out = pl.pallas_call(
        body,
        grid=grid,
        in_specs=[sspec, gspec, gspec, hbm, hbm, hbm, hbm],
        out_specs=hbm,
        out_shape=jax.ShapeDtypeStruct((P1, n_pad, P2), dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(scal, geo2.astype(cdt), gs2.astype(cdt), rhs, T, code, tb)

    if p1 or p2 or pn:
        out = out[:b1, :n, :b2]
    return out


# ---------------------------------------------------------------------------
# open axis-1 sweep (the Cartesian y solve in its natural (B1, n, B2) layout)
# ---------------------------------------------------------------------------

def _vp2_axis1_kernel(scal_ref, d_hbm, t_hbm, code_hbm, tb_hbm, out_hbm,
                      xbuf, dpbuf, dbuf, tbuf, cbuf, bbuf, in_sem, out_sem,
                      *, n, n_true, cn, b1, b2, spec):
    """Open vp2 sweep along AXIS 1 of natural (B1, n, B2) rhs/T/code — the
    Cartesian y solve with uniform static geometry (glo/ghi = theta/dy^2,
    gs = 1/dy baked as immediates); otherwise the derivations of
    _vp2_kernel on the _vp2_cyclic_kernel chunk layout."""
    (k_spec, cp_spec, h_lo, h_hi, tinf_void, eps, glo, ghi, gsl,
     gsh) = spec
    f32 = xbuf.dtype
    i = pl.program_id(0)
    j = pl.program_id(1)
    r0 = i * b1
    c0 = j * b2
    nchunks = n // cn
    dtor = scal_ref[0]
    inv_dtor = 1.0 / dtor          # one scalar divide per kernel call

    def in_dmas(slot, k):
        s = k * cn
        src = lambda ref: ref.at[pl.ds(r0, b1), pl.ds(s, cn), pl.ds(c0, b2)]
        return (
            pltpu.make_async_copy(src(d_hbm), dbuf.at[slot],
                                  in_sem.at[slot, 0]),
            pltpu.make_async_copy(src(t_hbm), tbuf.at[slot],
                                  in_sem.at[slot, 1]),
            pltpu.make_async_copy(src(code_hbm), cbuf.at[slot],
                                  in_sem.at[slot, 2]),
        )

    def out_dma(k):
        s = k * cn
        return pltpu.make_async_copy(
            xbuf.at[:, pl.ds(s, cn), :],
            out_hbm.at[pl.ds(r0, b1), pl.ds(s, cn), pl.ds(c0, b2)],
            out_sem.at[k])

    bdma = pltpu.make_async_copy(
        tb_hbm.at[:, pl.ds(r0, b1), pl.ds(c0, b2)], bbuf, in_sem.at[0, 3])
    bdma.start()
    for dma in in_dmas(0, 0):
        dma.start()
    if nchunks > 1:
        for dma in in_dmas(1, 1):
            dma.start()
    bdma.wait()

    zero = jnp.zeros((b1, b2), f32)
    carry = (zero, zero, zero)        # cp', dp', f_lo of the next row
    for k in range(nchunks):
        slot = k % 2
        for dma in in_dmas(slot, k):
            dma.wait()

        def grp(g, carry, *, slot=slot, base=k * cn):
            cp_prev, dp_prev, f_lo = carry
            s = pl.multiple_of(g * G, G)
            sw = lambda ref: jnp.swapaxes(
                ref[slot, :, pl.ds(s, G), :], 0, 1)
            d_g = sw(dbuf).astype(f32)
            t_g = sw(tbuf).astype(f32)
            code_g = sw(cbuf).astype(jnp.int32)
            gt = k * (cn // G) + g
            k_bnd = _ev_spec(k_spec, bbuf[gt].astype(f32))
            ks = [_ev_spec(k_spec, t_g[r]) for r in range(G)]
            cps, dps = [], []
            for r in range(G):
                c_r32 = code_g[r]
                bit = lambda b: ((c_r32 & b) > 0).astype(f32)
                k_next = ks[r + 1] if r + 1 < G else k_bnd
                f_hi = _harm(ks[r], k_next) * bit(1)
                hr_v = _rad(t_g[r], eps, tinf_void) if eps > 0.0 else 0.0
                sink = (bit(2) * gsl * (h_lo + hr_v)
                        + bit(4) * gsh * (h_hi + hr_v))
                # SCALED-ROW form (open-kernel note)
                al = glo * f_lo
                ch = ghi * f_hi
                coup = al + ch + sink
                w_r = jnp.where(coup > 0.0,
                                _ev_spec(cp_spec, t_g[r]) * inv_dtor, 1.0)
                b_r = w_r + coup
                d_r = d_g[r] * w_r + sink * tinf_void
                inv = 1.0 / (b_r + al * cp_prev)
                cp_prev = -ch * inv
                dp_prev = (d_r + al * dp_prev) * inv
                cps.append(cp_prev)
                dps.append(dp_prev)
                f_lo = f_hi
            xbuf[:, pl.ds(base + s, G), :] = \
                jnp.swapaxes(jnp.stack(cps), 0, 1)
            dpbuf[:, pl.ds(base + s, G), :] = \
                jnp.swapaxes(jnp.stack(dps), 0, 1)
            return cp_prev, dp_prev, f_lo

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
            xbuf[:, pl.ds(base + s, G), :] = \
                jnp.swapaxes(jnp.stack(xs), 0, 1)
            return x_next

        x_next = lax.fori_loop(0, cn // G, grp_b, x_next)
        out_dma(k).start()

    for k in range(nchunks):
        out_dma(k).wait()


@functools.partial(jax.jit, static_argnames=(
    "k_spec", "cp_spec", "h_lo", "h_hi", "tinf_void", "emissivity",
    "glo", "ghi", "gs_lo", "gs_hi", "interpret", "block_b1", "block_b2",
    "chunk"))
def fused_vp2_sweep_axis1(rhs, T, code, dtor, *, k_spec, cp_spec,
                          glo: float, ghi: float, gs_lo: float,
                          gs_hi: float, h_lo: float = 0.0,
                          h_hi: float = 0.0, tinf_void: float = 0.0,
                          emissivity: float = 0.0, interpret: bool = False,
                          block_b1: int = 8, block_b2: int | None = None,
                          chunk: int = 64):
    """Fully-fused vp2 sweep along AXIS 1 of natural (B1, n, B2)
    rhs/T/code with UNIFORM static geometry (the Cartesian y solve:
    glo = ghi = theta/dy^2, gs = 1/dy as kernel immediates)."""
    b1, n, b2 = T.shape
    dtype = T.dtype
    if jnp.dtype(dtype).itemsize != 4:
        raise ValueError("vp2 kernels take f32 streams; upcast/downcast "
                         "around them")
    if block_b2 is None:
        cands = [c for c in (256, 128) if n <= 640 or c == 128]
        block_b2 = min(cands, key=lambda c: (_round_up(b2, c), -c))
    cn = min(chunk, _round_up(n, G))
    pn = _round_up(n, cn) - n
    p1 = _round_up(b1, block_b1) - b1
    p2 = _round_up(b2, block_b2) - b2
    if p1 or p2 or pn:
        pad = ((0, p1), (0, pn), (0, p2))
        rhs = jnp.pad(rhs, pad)
        T = jnp.pad(T, pad)
        code = jnp.pad(code, pad)      # padded rows: code 0 -> identities
    P1, n_pad, P2 = T.shape
    ng = n_pad // G
    idx = np.minimum(np.arange(1, ng + 1) * G, n - 1)
    tb = jnp.moveaxis(T[:, idx, :], 1, 0)   # chunk/group boundary rows

    scal = jnp.asarray(dtor, jnp.float32).reshape(1)
    spec = (_as_spec(k_spec), _as_spec(cp_spec), float(h_lo), float(h_hi),
            float(tinf_void), float(emissivity), float(glo), float(ghi),
            float(gs_lo), float(gs_hi))

    grid = (P1 // block_b1, P2 // block_b2)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    cdt = jnp.float32
    scratch = [
        pltpu.VMEM((block_b1, n_pad, block_b2), cdt),    # x / cp
        pltpu.VMEM((block_b1, n_pad, block_b2), cdt),    # dp
        pltpu.VMEM((2, block_b1, cn, block_b2), dtype),  # rhs chunks
        pltpu.VMEM((2, block_b1, cn, block_b2), dtype),  # T chunks
        pltpu.VMEM((2, block_b1, cn, block_b2), jnp.int8),  # code chunks
        pltpu.VMEM((ng, block_b1, block_b2), dtype),     # boundary rows
        pltpu.SemaphoreType.DMA((2, 4)),
        pltpu.SemaphoreType.DMA((n_pad // cn,)),
    ]

    def body(scal_, d_, t_, c_, tb_, o_, xb, dp, db, tbc, cb, bb, isem,
             osem):
        return _vp2_axis1_kernel(scal_, d_, t_, c_, tb_, o_, xb, dp, db,
                                 tbc, cb, bb, isem, osem, n=n_pad,
                                 n_true=n, cn=cn, b1=block_b1,
                                 b2=block_b2, spec=spec)

    out = pl.pallas_call(
        body,
        grid=grid,
        in_specs=[sspec, hbm, hbm, hbm, hbm],
        out_specs=hbm,
        out_shape=jax.ShapeDtypeStruct((P1, n_pad, P2), dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(scal, rhs, T, code, tb)

    if p1 or p2 or pn:
        out = out[:b1, :n, :b2]
    return out


# ---------------------------------------------------------------------------
# cross-tile pipelined open sweep (short lines: the cylindrical r solve)
# ---------------------------------------------------------------------------

def _vp2_pipe_kernel(scal_ref, glo_ref, ghi_ref, gsl_ref, gsh_ref, d_hbm,
                     t_hbm, code_hbm, out_hbm, xbuf, dpbuf, dbuf, tbuf,
                     cbuf, obuf, in_sem, out_sem, *, n, n_true, b1, b2,
                     nt1, nt2, spec):
    """Short-line vp2 sweep (whole line = one chunk): zero DMA/compute
    overlap in the streaming form, so this variant pipelines across batch
    tiles exactly like pallas_vpfields._vp_fields_pipe_kernel — tile q+1
    prefetches while q computes; q-1's output drains during q's forward
    pass.  The whole line is VMEM-resident, so the hi-face lookahead reads
    the line buffer directly (no boundary-row prefetch)."""
    (k_spec, cp_spec, h_lo, h_hi, tinf_void, eps, edge0, edge1) = spec
    f32 = xbuf.dtype
    has_d = dbuf is not None
    i = pl.program_id(0)
    j = pl.program_id(1)
    q = i * nt2 + j
    ntiles = nt1 * nt2
    slot = q % 2
    dtor = scal_ref[0]
    inv_dtor = 1.0 / dtor          # one scalar divide per kernel call

    def coords(t):
        return (t // nt2) * b1, (t % nt2) * b2

    def in_dmas(t):
        r0, c0 = coords(t)
        sl = t % 2
        src = lambda ref: ref.at[:, pl.ds(r0, b1), pl.ds(c0, b2)]
        dmas = ()
        if has_d:
            dmas += (pltpu.make_async_copy(src(d_hbm), dbuf.at[sl],
                                           in_sem.at[0]),)
        return dmas + (
            pltpu.make_async_copy(src(t_hbm), tbuf.at[sl], in_sem.at[1]),
            pltpu.make_async_copy(src(code_hbm), cbuf.at[sl],
                                  in_sem.at[2]),
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
            t_g = tbuf[sl, pl.ds(s, G)].astype(f32)
            d_g = (dbuf[sl, pl.ds(s, G)].astype(f32) if has_d else t_g)
            code_g = cbuf[sl, pl.ds(s, G)].astype(jnp.int32)
            nb = jnp.minimum(s + G, n - 1)
            t_bnd = tbuf[sl, nb].astype(f32)
            ks = [_ev_spec(k_spec, t_g[r]) for r in range(G)]
            k_bnd = _ev_spec(k_spec, t_bnd)
            cps, dps = [], []
            for r in range(G):
                row = s + r
                c_r32 = code_g[r]
                bit = lambda b: ((c_r32 & b) > 0).astype(f32)
                k_next = ks[r + 1] if r + 1 < G else k_bnd
                f_hi = _harm(ks[r], k_next) * bit(1)
                hr_v = _rad(t_g[r], eps, tinf_void) if eps > 0.0 else 0.0
                sink = (bit(2) * gsl_ref[row] * (h_lo + hr_v)
                        + bit(4) * gsh_ref[row] * (h_hi + hr_v))
                srhs = sink * tinf_void
                if edge0 is not None:
                    h_e, g_e, tinf_e = edge0
                    hr_e = (hr_v if (eps <= 0.0 or tinf_e == tinf_void)
                            else _rad(t_g[r], eps, tinf_e))
                    s_e = jnp.where(row == 0,
                                    bit(8) * g_e * (h_e + hr_e), 0.0)
                    sink = sink + s_e
                    srhs = srhs + s_e * tinf_e
                if edge1 is not None:
                    h_e, g_e, tinf_e = edge1
                    hr_e = (hr_v if (eps <= 0.0 or tinf_e == tinf_void)
                            else _rad(t_g[r], eps, tinf_e))
                    s_e = jnp.where(row == n_true - 1,
                                    bit(8) * g_e * (h_e + hr_e), 0.0)
                    sink = sink + s_e
                    srhs = srhs + s_e * tinf_e
                al = glo_ref[row] * f_lo
                ch = ghi_ref[row] * f_hi
                # SCALED-ROW form (open-kernel note)
                coup = al + ch + sink
                w_r = jnp.where(coup > 0.0,
                                _ev_spec(cp_spec, t_g[r]) * inv_dtor, 1.0)
                b_r = w_r + coup
                d_r = d_g[r] * w_r + srhs
                inv = 1.0 / (b_r + al * cp_prev)
                cp_prev = -ch * inv
                dp_prev = (d_r + al * dp_prev) * inv
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
