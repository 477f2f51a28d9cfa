"""Event-driven simulation engine shared by the CLI apps.

Host orchestrates the event list (births U frames) — exactly the structure of
the reference's WAAM loop (waam_from_stl_v7_mm.py:515-551) — while everything
between events runs on device: `make_cartesian_advance` folds the functional
pack rebuild AND the sub-step loop into one jitted program
(``lax.fori_loop`` with a traced trip count, so event-aligned dt and varying
sub-step counts never retrace).  Births are pure data updates against a
precomputed activation-time field (birth/*.py).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import lax

from ..bc.packs import build_coeff_packs
from ..core.grid import CartesianGrid
from ..core.material import Material
from ..step.cartesian import adi_step

__all__ = ["make_cartesian_engine", "make_cartesian_advance", "EventLoop"]

# host-readout reductions under jit: the reduced scalar is fully addressable
# even for multi-process sharded fields (XLA inserts the collective), where
# an eager jnp.max/isfinite on a multi-host array raises
_masked_max = jax.jit(lambda T, m: jnp.max(jnp.where(m, T, -jnp.inf)))
_masked_finite = jax.jit(
    lambda T, m: jnp.isfinite(jnp.where(m, T, 0.0)).all())


def history_update(pk, ta, T, dt, tc, multi):
    """One sub-step of the per-voxel thermal-history state: running peak
    and dt-weighted time-above-threshold (leading threshold axis on ``ta``
    when ``multi``).  The SINGLE definition of the history semantics —
    shared by the engine's fused advance loop and the spiral_tube app."""
    import jax.numpy as jnp

    pk = jnp.maximum(pk, T)
    if multi:
        above = T[None] > tc[(slice(None),) + (None,) * T.ndim]
    else:
        above = T > tc[0]
    ta = ta + jnp.asarray(dt, ta.dtype) * above
    return pk, ta


def make_cartesian_engine(grid: CartesianGrid, mat: Material, *,
                          theta: float = 0.5, t_inf: float = 20.0,
                          robin_h=None, neumann=None,
                          dirichlet_mask=None, dirichlet_value=None,
                          source_fn=None, implementation: str = "auto",
                          mesh=None, dtype=None, interpret: bool = False,
                          history_t_crit: float | None = None,
                          stochastic_rounding: bool = False,
                          k_table=None, cp_table=None, emissivity=None,
                          radiation_scale=None):
    """Split engine: ``prepare(active) -> prep`` (jitted pack/plan rebuild,
    needed only when the mask changes — i.e. on birth events) and
    ``advance(T, prep, dt, n_sub[, t0]) -> T`` (jitted sub-step loop).

    interpret: run the fused kernels in Pallas interpret mode (CPU testing
    of the single-device pallas branch; the mesh branch derives its own).

    The reference rebuilds BC packs inside every time segment (per *column*
    in single_track_on_plate.py:163); splitting keeps the rebuild off the
    steady-state critical path for large grids.

    source_fn: optional traceable ``t -> volumetric heat field [W/m^3]``.
    implementation: "pallas" (fused TPU kernels), "xla" (lax.scan reference),
    or "auto" (pallas on TPU, xla elsewhere).
    mesh: optional ``jax.sharding.Mesh`` — prepare and advance then run
    multi-chip with per-sweep batch-axis layouts (dist/cartesian*.py).
    dtype: pack dtype (defaults to the field dtype at first advance; pass
    explicitly when preparing before the first advance with non-default
    precision).
    stochastic_rounding: for bfloat16 states on the pallas paths (single
    device AND mesh), stochastic-round every store (seeded per sub-step
    from an integer step counter).  ESSENTIAL for long bf16 runs:
    round-to-nearest silently drops per-step updates smaller than the
    bf16 quantum (~8 K at 1500 C), freezing slow cooling entirely.  Not
    differentiable.  Raises on branches that cannot honor it (xla,
    interpret) — a silently-ignored flag here is a correctness hazard.
    history_t_crit: enable per-voxel THERMAL-HISTORY tracking — the advance
    signature becomes ``advance(T, prep, dt, n_sub, t0, hist) -> (T, hist)``
    with ``hist = (T_peak, t_above)`` updated every sub-step: running peak
    temperature and cumulative seconds above ``history_t_crit``.  A tuple of
    thresholds tracks each: ``t_above`` then has a leading threshold axis,
    e.g. ``(800.0, 500.0)`` yields the classic steel t8/5 cooling time as
    ``t_above[1] - t_above[0]`` for monotone cooling (the inputs
    to microstructure/HAZ estimates in WAAM).  Elementwise updates fused
    into the sub-step loop; EventLoop(history=True) threads the state and
    RESETS a cell's history at its birth (pre-birth placeholder values are
    meaningless).  NEVER-born cells still accumulate from their placeholder
    temperatures — consumers must mask by the final active state (the WAAM
    app writes them as 0 in waam_history.vtk).

    VARIABLE-PROPERTY PHYSICS (the regime that dominates real WAAM at
    1500 C; library: step/cartesian_varprop.py, bc/radiation.py):
    k_table / cp_table: T-dependent conductivity / heat capacity
    (PropertyTable, scalar, or a per-axis k 3-tuple).  Use
    ``apparent_cp(...)`` for latent heat and ``melt_pool_enhanced_k(...)``
    for the melt-pool convection proxy.
    emissivity: enable the radiative boundary film
    ``h_rad(T) = eps*sigma*(T+T_inf)(T^2+T_inf^2)`` in ADDITION to the
    convective ``robin_h`` (Picard-refreshed every SUB-STEP from the
    live field — tighter than the per-segment refresh of
    make_cartesian_advance(robin_h_fn=...)).  ``robin_h`` may be a scalar
    (fully-fused kernels) or a per-face dict / 3-D field — e.g. the STL
    area-corrected fields (geometry/bc_correction.py) — in which case the
    engine runs the materialized field-coefficient formulation and the
    total film is ``robin_h + h_rad(T) * radiation_scale``.
    radiation_scale: per-face dict (or field) of true/voxel area ratios
    applied to the RADIATIVE film — pass ``corrected_robin_fields``'s
    second output so radiation sees the same geometric-area correction as
    the corrected convective fields (the reference's contract is that
    corrected Robin output is simply another h field flowing through the
    unified machinery, voxel_bc_correction.py:207-225).  Requires
    ``emissivity``; defaults to 1 (uncorrected radiation).
    Any of these switches the engine onto the varprop step.  The flagship
    BC set (Robin-only scalar h / radiative film, implementation='pallas')
    runs FULLY FUSED — per-cell Picard coefficients k(T^n)/cp(T^n) rebuilt
    in kernel registers (solvers/pallas_varprop.py), per shard on a
    ``mesh`` (dist/varprop.py), with bf16 + stochastic_rounding on both —
    composing with history tracking.  Neumann /
    Dirichlet / field-h configurations keep the materialized
    field-coefficient formulation (no stochastic_rounding there)."""
    import jax.numpy as jnp

    if implementation == "auto":
        # the fused kernels are TPU Mosaic; every other backend gets XLA
        implementation = "pallas" if jax.default_backend() == "tpu" else "xla"
    pack_dtype = dtype or jnp.result_type(float)

    def _packs(active):
        return build_coeff_packs(active, grid, mat, robin_h=robin_h,
                                 neumann=neumann,
                                 dirichlet_mask=dirichlet_mask,
                                 dirichlet_value=dirichlet_value,
                                 dtype=pack_dtype)

    # plan-lite: a plain-scalar (or absent) Robin h needs no coefficient
    # fields at all — the fused kernels derive the per-axis sink from the
    # sweep code (pallas_sweeps.sweep_code bit 8).  Dict/field h keeps the
    # general field path.
    lite_c = None
    if robin_h is None or isinstance(robin_h, (int, float)):
        # per-axis h/(rho cp d_axis) — exposed-face A/V differs per axis on
        # anisotropic voxels; a scalar h still needs no coefficient fields.
        # Computed with the SAME op order as bc/packs.build_coeff_packs
        # (dtype(h) * dtype(1/(rho cp d))) so the lite path is bitwise equal
        # to the field path by construction, not by luck — h/(rho cp d) as
        # one f64 divide differs by 1 ulp for many parameter choices.
        # Solve precision (>= f32) even for bf16 states: the constant is a
        # kernel scalar, not a streamed field.
        lite_dtype = jnp.promote_types(pack_dtype, jnp.float32)
        lite_c = tuple(jnp.asarray(float(robin_h or 0.0), lite_dtype)
                       * jnp.asarray(1.0 / (mat.rho * mat.cp * d), lite_dtype)
                       for d in grid.spacing)
    # packs are still needed for Neumann sources / Dirichlet pins
    lite_needs_packs = neumann is not None or dirichlet_mask is not None

    varprop = (k_table is not None or cp_table is not None
               or emissivity is not None)
    if radiation_scale is not None and emissivity is None:
        raise ValueError("radiation_scale scales the RADIATIVE film and "
                         "therefore requires emissivity; for a corrected "
                         "convective film pass the corrected h fields as "
                         "robin_h")
    if varprop:
        from ..bc.radiation import radiative_h
        from ..step.cartesian_varprop import adi_step_varprop

        # interpret mode keeps the pallas varprop kernels (CI-testable);
        # the mesh path runs the fused kernels per shard (dist/varprop)
        # when eligible, else falls back to the scan/XLA formulation
        impl_vp = implementation
        scalar_conv = robin_h is None or isinstance(robin_h, (int, float))
        h_conv = (float(robin_h or 0.0)
                  if emissivity is not None and scalar_conv else None)

        def _compose_h(T):
            """Total Robin film entering this sub-step's packs: convective
            (per-face dict or 3-D field, e.g. the STL area-corrected
            fields) plus the Picard radiative film, itself scaled by the
            per-face true/voxel area ratios when given — radiation sees
            the same geometric correction as convection."""
            h_rad = radiative_h(T, emissivity, t_inf,
                                h_conv=0.0 if h_conv is None else h_conv)
            if scalar_conv:
                return h_rad
            if isinstance(robin_h, dict):
                sc = radiation_scale or {}
                return {f: v + h_rad * sc.get(f, 1.0)
                        for f, v in robin_h.items()}
            return robin_h + h_rad * (1.0 if radiation_scale is None
                                      else radiation_scale)

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            am, bm = mesh.axis_names
            sh0 = NamedSharding(mesh, P(None, am, bm))
            constrain = (lambda x: jax.lax.with_sharding_constraint(x, sh0))
        else:
            constrain = (lambda x: x)

        # fully-fused varprop path (solvers/pallas_varprop): per-cell
        # coefficients rebuilt in kernel registers from streamed k(T) and
        # 1/(rho cp(T)), Robin sink from the plan-lite codes — eligible for
        # the flagship BC set: Robin-only h (scalar, per-face dict, or 3-D
        # field — per-face corrected fields ride the per-axis A/B streams
        # of build_face_h_axes) / radiative film.  Measured 384^3:
        # 64 -> 38 ms/step vs the materialized field-coefficient path.  On
        # a mesh the same kernels run per shard (dist/varprop) with
        # XLA-collective halos/re-lays (scalar h only — field h keeps the
        # materialized formulation there).
        fused_vp = (impl_vp == "pallas" and neumann is None
                    and dirichlet_mask is None
                    and (scalar_conv or mesh is None))
        if stochastic_rounding and not fused_vp:
            raise ValueError("stochastic_rounding on the varprop path needs "
                             "the fused kernels (implementation='pallas', "
                             "Robin-only scalar h / radiative film, no "
                             "Neumann/Dirichlet); this configuration falls "
                             "back to the field-coefficient formulation "
                             "which has no PRNG stores")
        if fused_vp:
            from ..step.cartesian_pallas import pad_domain
            from ..step.cartesian_varprop import (adi_step_varprop_fused,
                                                  build_varprop_codes)

            if mesh is not None:
                from ..dist.varprop import sharded_adi_step_varprop_fused

                interp_vp = interpret or jax.default_backend() != "tpu"
                sh_step = sharded_adi_step_varprop_fused(
                    grid, mat, mesh, k_table=k_table, cp_table=cp_table,
                    theta=theta, t_inf=t_inf,
                    robin_h=float(robin_h or 0.0), interpret=interp_vp)
            # pad-to-tile (single device): hostile lane counts otherwise
            # pay a jnp.pad+slice HBM pass per stream per kernel call —
            # measured 89.6 ms = 30% of the model at 576^3 (round 4) vs
            # 58% at 512^3; padding cells are void (identity rows).  The
            # mesh path keeps exact shapes (padding a sharded dim would
            # change the layout contract).
            pad_vp = mesh is None

            if scalar_conv:
                @jax.jit
                def prepare(active):
                    active = active.astype(bool)
                    if pad_vp:
                        active = pad_domain(active)
                    return (active, build_varprop_codes(active), None)
            else:
                # per-face/field h: fold the static convective fields and
                # radiative area scales into per-axis A/B streams
                # (build_face_h_axes) at plan-build time.  The 3-D field
                # values are passed as jit ARGUMENTS — closing over them
                # embeds HLO constants the remote compile service rejects
                # at size (HTTP 413, NOTES.md); scalars/None stay static.
                from ..bc.packs import _normalize_per_face
                from ..step.cartesian_varprop import build_face_h_axes

                h_pf = _normalize_per_face(robin_h)
                s_pf = (_normalize_per_face(radiation_scale)
                        if emissivity is not None else None)

                def _split(pf):
                    if pf is None:
                        return {}, None
                    arrs = {f: jnp.asarray(v) for f, v in pf.items()
                            if v is not None
                            and not isinstance(v, (int, float))}
                    consts = {f: v for f, v in pf.items()
                              if f not in arrs}
                    return arrs, consts

                h_arr, h_const = _split(h_pf)
                s_arr, s_const = _split(s_pf)
                h_dtype = jnp.promote_types(pack_dtype, jnp.float32)

                @jax.jit
                def _prep(active, h_arr, s_arr):
                    active = active.astype(bool)
                    if pad_vp:
                        active = pad_domain(active)
                        h_arr = {f: pad_domain(v)
                                 for f, v in h_arr.items()}
                        s_arr = {f: pad_domain(v)
                                 for f, v in s_arr.items()}
                    h_spec = {**h_const, **h_arr}
                    s_spec = (None if s_pf is None
                              else {**s_const, **s_arr})
                    h_ab = build_face_h_axes(active, h_spec, s_spec,
                                             dtype=h_dtype)
                    return (active, build_varprop_codes(active), h_ab)

                def prepare(active):
                    return _prep(active, h_arr, s_arr)

            def step1(T, prep, dt, t, istep):
                active, codes, h_ab = prep
                T = constrain(T)
                src = None if source_fn is None else source_fn(t)
                if pad_vp and src is not None:
                    src = pad_domain(src)
                seed = istep if stochastic_rounding else None
                if mesh is not None:
                    hf = (radiative_h(T, emissivity, t_inf, h_conv=h_conv)
                          if emissivity is not None else None)
                    return sh_step(T, active, codes, dt, h_field=hf,
                                   source=src, rng_seed=seed)
                # emissivity passes through UNBUILT (h_field=None): the
                # g-stream tier folds the radiative film in-register, and
                # the classic tier builds it itself — knowing the film is
                # pointwise-in-T lets its z solve REBUILD it in the
                # z-leading layout instead of transposing the stream
                return constrain(adi_step_varprop_fused(
                    T, active, codes, grid, mat, k_table=k_table,
                    cp_table=cp_table, dt=dt, theta=theta, t_inf=t_inf,
                    robin_h=(float(robin_h or 0.0) if scalar_conv else 0.0),
                    h_field=None, h_axes=h_ab,
                    emissivity=emissivity, h_conv=h_conv, source=src,
                    rng_seed=seed,
                    # None = auto (interpret off-TPU); True forces it
                    interpret=True if interpret else None))
            pad = pad_domain if pad_vp else None
        else:
            impl_vp = "xla" if mesh is not None else implementation
            @jax.jit
            def prepare(active):
                active = active.astype(bool)
                # radiation rebuilds packs per sub-step from the live field;
                # otherwise they depend on the mask only
                packs = None if emissivity is not None else _packs(active)
                return (active, packs)

            def step1(T, prep, dt, t, istep):
                active, packs = prep
                T = constrain(T)
                if emissivity is not None:
                    packs = build_coeff_packs(
                        active, grid, mat, robin_h=_compose_h(T),
                        neumann=neumann,
                        dirichlet_mask=dirichlet_mask,
                        dirichlet_value=dirichlet_value,
                        dtype=jnp.promote_types(T.dtype, pack_dtype))
                src = None if source_fn is None else source_fn(t)
                return constrain(adi_step_varprop(
                    T, active, packs, grid, mat, k_table=k_table,
                    cp_table=cp_table, dt=dt, theta=theta, t_inf=t_inf,
                    source=src, implementation=impl_vp))
            pad = None

    elif mesh is not None and implementation == "pallas":
        from ..dist.cartesian_pallas import (shard_plan,
                                             sharded_adi_step_pallas)
        from ..step.cartesian_pallas import build_sweep_plan

        interpret = jax.default_backend() != "tpu"
        if stochastic_rounding and interpret:
            raise ValueError("stochastic_rounding needs the TPU PRNG "
                             "(pltpu.prng does not lower in interpret mode)")
        inner = sharded_adi_step_pallas(grid, mat, mesh, theta=theta,
                                        t_inf=t_inf, interpret=interpret)

        @jax.jit
        def prepare(active):
            active = active.astype(bool)
            packs = (_packs(active)
                     if lite_c is None or lite_needs_packs else None)
            return shard_plan(build_sweep_plan(
                active, packs, has_neumann=neumann is not None,
                has_dirichlet=dirichlet_mask is not None,
                robin_const=lite_c), mesh, traced=True)

        def step1(T, prep, dt, t, istep):
            src = None if source_fn is None else source_fn(t)
            seed = istep if stochastic_rounding else None
            return inner(T, prep, dt, src, rng_seed=seed)
        pad = None

    elif mesh is not None:
        from ..dist.cartesian import sharded_adi_step

        if stochastic_rounding:
            raise ValueError("stochastic_rounding is a pallas-kernel "
                             "feature; the mesh+xla branch would silently "
                             "round-to-nearest (bf16 cooling freeze hazard)")
        inner = sharded_adi_step(grid, mat, mesh, theta=theta)

        @jax.jit
        def prepare(active):
            active = active.astype(bool)
            return (active, _packs(active))

        def step1(T, prep, dt, t, istep):
            active, packs = prep
            src = None if source_fn is None else source_fn(t)
            return inner(T, active, packs, dt, jnp.asarray(t_inf, T.dtype),
                         src)
        pad = None

    elif implementation == "pallas":
        from ..step.cartesian_pallas import (adi_step_pallas, build_sweep_plan,
                                             pad_domain)

        if stochastic_rounding and interpret:
            raise ValueError("stochastic_rounding needs the TPU PRNG "
                             "(pltpu.prng does not lower in interpret mode)")

        @jax.jit
        def prepare(active):
            active = active.astype(bool)
            packs = (_packs(active)
                     if lite_c is None or lite_needs_packs else None)
            # pad_to_tile: hostile (non-multiple-of-8/128) grids otherwise
            # pay a pad+slice HBM pass in every kernel call (measured 2x at
            # 576^3); a no-op for tile-friendly shapes
            return build_sweep_plan(active, packs,
                                    has_neumann=neumann is not None,
                                    has_dirichlet=dirichlet_mask is not None,
                                    robin_const=lite_c, pad_to_tile=True)

        def step1(Tp, prep, dt, t, istep):
            src = None if source_fn is None else pad_domain(source_fn(t))
            # per-sub-step seed from the INTEGER step counter; deriving it
            # from t/dt in the state dtype re-correlated consecutive bf16
            # sub-steps (8-bit mantissa: t/dt quantizes to ~64-step plateaus
            # past step 256, reintroducing the rounding freeze)
            seed = istep if stochastic_rounding else None
            return adi_step_pallas(Tp, prep, grid, mat, dt=dt, theta=theta,
                                   t_inf=t_inf, source=src, rng_seed=seed,
                                   interpret=interpret)
        # pad once per event segment; the sub-step loop runs pad-free
        pad = pad_domain

    else:
        if stochastic_rounding:
            raise ValueError("stochastic_rounding is a pallas-kernel "
                             "feature; the xla branch would silently "
                             "round-to-nearest (bf16 cooling freeze hazard)")

        @jax.jit
        def prepare(active):
            active = active.astype(bool)
            return (active, _packs(active))

        def step1(T, prep, dt, t, istep):
            active, packs = prep
            src = None if source_fn is None else source_fn(t)
            return adi_step(T, active, packs, grid, mat, dt=dt,
                            theta=theta, t_inf=t_inf, source=src)
        pad = None

    # one advance builder for all branches: fori over step1, optional
    # domain padding (pallas pad-to-tile), optional thermal-history fusion
    unpad = ((lambda x, shape: x[:shape[0], :shape[1], :shape[2]])
             if pad is not None else (lambda x, shape: x))
    padf = pad if pad is not None else (lambda x: x)

    def _clock(state_dtype, dt, t0):
        """Sub-step clock OUTSIDE the state dtype.  At bf16 (8-bit mantissa)
        t, dt and i quantize: past step ~256 whole plateaus of sub-steps saw
        the identical time — and the identical t/dt-derived rounding seed,
        re-correlating the stochastic rounding the mode depends on.  Returns
        ``i -> (t_i, istep_i)`` with t_i at >=f32 and istep_i an int32
        counter offset by the segment's global step index."""
        tdt = jnp.promote_types(state_dtype, jnp.float32)
        t0f = jnp.asarray(t0, tdt)
        dtf = jnp.asarray(dt, tdt)
        base = jnp.asarray(jnp.round(t0f / dtf), jnp.int32)
        return lambda i: (t0f + i * dtf, base + i)

    if history_t_crit is None:
        @jax.jit
        def advance(T, prep, dt, n_sub, t0=0.0):
            shape = T.shape
            Tp = padf(T)
            clock = _clock(T.dtype, dt, t0)

            def body(i, Tp):
                return step1(Tp, prep, dt, *clock(i))

            return unpad(lax.fori_loop(0, n_sub, body, Tp), shape)
    else:
        multi = isinstance(history_t_crit, (tuple, list))
        t_crits = tuple(float(t) for t in (history_t_crit if multi
                                           else (history_t_crit,)))

        @jax.jit
        def advance(T, prep, dt, n_sub, t0=0.0, hist=None):
            shape = T.shape
            pk, ta = hist
            # ta carries a leading threshold axis in multi mode
            pad_ta = ((lambda x: jnp.stack([padf(x[i])
                                            for i in range(len(t_crits))]))
                      if multi else padf)
            unpad_ta = ((lambda x, sh: jnp.stack(
                [unpad(x[i], sh) for i in range(len(t_crits))]))
                if multi else unpad)
            tc = jnp.asarray(t_crits, jnp.promote_types(T.dtype, jnp.float32))
            carry = (padf(T), padf(pk), pad_ta(ta))
            clock = _clock(T.dtype, dt, t0)

            def body(i, carry):
                Tp, pk, ta = carry
                Tp = step1(Tp, prep, dt, *clock(i))
                pk, ta = history_update(pk, ta, Tp, dt, tc, multi)
                return (Tp, pk, ta)

            Tp, pk, ta = lax.fori_loop(0, n_sub, body, carry)
            return unpad(Tp, shape), (unpad(pk, shape), unpad_ta(ta, shape))

    # plain-function wrapper so EventLoop can introspect the engine's
    # configuration (jitted callables reject attribute assignment)
    _advance = advance

    def advance(*a, **k):
        return _advance(*a, **k)

    # EventLoop reads this to size the t_above state — avoids having to
    # specify the threshold tuple twice
    advance.history_thresholds = (t_crits if history_t_crit is not None
                                  and multi else None)
    # EventLoop(interpass_T=...) refuses engines with a continuous source:
    # the torch would keep burning at the frozen schedule time during dwell
    advance.has_source = source_fn is not None

    return prepare, advance


def make_cartesian_advance(grid: CartesianGrid, mat: Material, *,
                           theta: float = 0.5, t_inf: float = 20.0,
                           robin_h=None, neumann=None,
                           dirichlet_mask=None, dirichlet_value=None,
                           source_fn=None, implementation: str = "auto",
                           mesh=None, robin_h_fn=None):
    """Fused convenience form: ``advance(T, active, dt, n_sub[, t0]) -> T``
    rebuilds packs for the current activation mask on every call, then takes
    ``n_sub`` ADI steps.  Prefer make_cartesian_engine + EventLoop(prepare=…)
    for large grids — the rebuild then happens on birth events only.

    robin_h_fn: optional traceable ``T -> h`` (scalar | face dict | field)
    giving a temperature-dependent film — e.g. radiation via
    ``bc.radiation.radiative_h`` — evaluated at the field entering each
    advance call (Picard refresh per event segment).  Replaces ``robin_h``;
    fold any constant convective film in via its ``h_conv`` argument."""
    cache = {}

    def advance(T, active, dt, n_sub, t0=0.0):
        key = T.dtype                      # packs follow the field dtype
        if key not in cache:
            if robin_h_fn is None:
                prepare, advance2 = make_cartesian_engine(
                    grid, mat, theta=theta, t_inf=t_inf, robin_h=robin_h,
                    neumann=neumann, dirichlet_mask=dirichlet_mask,
                    dirichlet_value=dirichlet_value, source_fn=source_fn,
                    implementation=implementation, mesh=mesh, dtype=key)
                cache[key] = jax.jit(
                    lambda T, active, dt, n_sub, t0=0.0:
                    advance2(T, prepare(active), dt, n_sub, t0))
            else:
                # T-dependent film: rebuild the engine's prep WITH the field
                impl = implementation
                if impl == "auto":
                    impl = ("pallas" if jax.default_backend() == "tpu"
                            else "xla")

                @jax.jit
                def fused(T, active, dt, n_sub, t0=0.0, *, _key=key):
                    prepare, advance2 = make_cartesian_engine(
                        grid, mat, theta=theta, t_inf=t_inf,
                        robin_h=robin_h_fn(T), neumann=neumann,
                        dirichlet_mask=dirichlet_mask,
                        dirichlet_value=dirichlet_value, source_fn=source_fn,
                        implementation=impl, mesh=mesh, dtype=_key)
                    return advance2(T, prepare(active), dt, n_sub, t0)

                cache[key] = fused
        return cache[key](T, active, dt, n_sub, t0)

    return advance


@dataclasses.dataclass
class EventLoop:
    """Run an element-birth simulation through its event schedule.

    advance : jitted (T, active, dt, n_sub) -> T; with ``prepare`` set, the
        signature is (T, prep, dt, n_sub, t0) and ``prepare(active) -> prep``
        is called only when the mask changes (birth events) — the pack/plan
        rebuild then leaves the steady-state critical path entirely.
    activation_times : device array broadcastable to the field shape;
        cell born when ``activation_times < t`` (substrate = -inf).
    deposit_T : temperature assigned to newborn cells.
    dt_cap : max sub-step (event segments are split evenly to respect it,
        waam_from_stl_v7_mm.py:526-528).
    check_finite : raise on NaN/Inf with simulation context.  The check
        syncs device->host, so it runs at frame boundaries and the final
        event (not per event) — birth bookkeeping itself is sync-free.
    history : thread per-voxel thermal-history state (requires an advance
        built with ``make_cartesian_engine(history_t_crit=...)`` and
        ``prepare``); after ``run`` the (T_peak, t_above) arrays are in
        ``self.history_state``.  Newborn deposits register their deposit
        temperature in the peak.
    interpass_T : optional INTERPASS TEMPERATURE CONTROL [C] — before each
        birth event the loop holds deposition and keeps cooling the current
        part in ``interpass_dwell``-second increments until its maximum
        temperature drops to this threshold (or ``interpass_max_dwell``
        seconds of dwell accrue), the standard WAAM practice for
        controlling bead geometry and microstructure.  Dwell cooling is
        inserted ON TOP of the print schedule (the schedule clock and
        activation times are unchanged); per-layer dwells are recorded in
        ``self.dwell_log`` as (event_time, dwell_seconds).  One
        device->host sync per dwell check per layer.  Meant for
        deposition-driven heating only: ``run`` raises when the advance
        was built with a continuous ``source_fn`` (the torch would keep
        burning at the frozen schedule time during the dwell).
    """

    advance: Callable
    activation_times: Any
    deposit_T: float
    dt_cap: float
    check_finite: bool = True
    prepare: Callable | None = None
    history: bool = False
    history_state: Any = None
    history_thresholds: tuple | None = None   # set for multi-threshold mode
    interpass_T: float | None = None
    interpass_dwell: float = 5.0
    interpass_max_dwell: float = 600.0
    dwell_log: Any = None

    def run(self, T, *, frame_times, t_end: float | None = None,
            on_frame: Callable | None = None, extra_events=(),
            start_t: float = 0.0, history_state=None):
        """``history_state``: optional (T_peak, t_above) to resume
        thermal-history accumulation from (checkpoint restore); default
        seeds the peak from the entering field and zero time-above."""
        act = self.activation_times
        eps = 1e-12
        # NOTE inclusive comparisons against event times throughout: event
        # times come from act's own (often float32) values, and `act < te +
        # 1e-12` is FALSE for act == te in f32 (the epsilon vanishes in the
        # cast) — with strict compares every layer activated one event late
        # and the final layer never deposited at all.
        finite = jnp.isfinite(act) & (act >= start_t)
        births = jnp.unique(jnp.where(finite, act, jnp.inf))
        births = [float(b) for b in births if math.isfinite(float(b))]
        frame_times = [float(t) for t in frame_times]
        t_end = t_end if t_end is not None else (max(frame_times) if frame_times else 0.0)
        # tolerate float32 rounding of a birth time landing a hair above the
        # (float64) t_end — that layer must still deposit
        birth_set = set(b for b in births
                        if b <= t_end + 1e-6 * max(1.0, abs(t_end)))
        events = sorted(birth_set | set(frame_times) | set(extra_events)
                        | {t_end})
        frames = set(frame_times)
        final_event = events[-1] if events else None

        if self.interpass_T is not None and self.interpass_dwell <= 0:
            raise ValueError("interpass_dwell must be positive (a zero or "
                             "negative increment would dwell forever)")
        if self.interpass_T is not None and getattr(self.advance,
                                                    "has_source", False):
            raise ValueError(
                "interpass_T cannot be combined with a continuous source_fn: "
                "during the dwell the engine keeps evaluating the source at "
                "the frozen schedule time (the torch never switches off), so "
                "the part may never cool to the threshold.  Model deposition "
                "heating via birth deposits (deposit_T) when using interpass "
                "control")
        t = start_t
        active = act <= t
        # layers whose birth time coincides with the start are deposited now
        born_now = active & jnp.isfinite(act) & (act >= start_t)
        T = jnp.where(born_now, self.deposit_T, T)
        active_any = bool(jnp.any(active))     # one sync at start only
        prep = (self.prepare(jnp.broadcast_to(active, T.shape))
                if self.prepare is not None else None)
        if self.history:
            if prep is None:
                raise ValueError("EventLoop(history=True) requires prepare + "
                                 "an advance from make_cartesian_engine("
                                 "history_t_crit=...)")
            # t_above accumulates many small dt increments — keep it at
            # solve precision even for bf16 states (bf16's 8-bit mantissa
            # absorbs increments after ~256 steps).  With a tuple of
            # thresholds it carries a leading threshold axis.
            if history_state is not None:
                self.history_state = history_state
            else:
                ths = (self.history_thresholds
                       if self.history_thresholds is not None
                       else getattr(self.advance, "history_thresholds", None))
                nth = len(ths) if ths else None
                ta_shape = T.shape if nth is None else (nth,) + tuple(T.shape)
                self.history_state = (T, jnp.zeros(
                    ta_shape, jnp.promote_types(T.dtype, jnp.float32)))
        if t in frames and on_frame is not None:
            on_frame(t, T, jnp.broadcast_to(active, T.shape))

        def check(t):
            if not bool(_masked_finite(T, jnp.broadcast_to(active, T.shape))):
                raise FloatingPointError(
                    f"non-finite temperature detected at t={t:.6g} s "
                    f"(dt_cap={self.dt_cap:.3g}; check material/BC magnitudes)")

        for te in events:
            if te <= t + eps:
                continue
            seg = te - t
            if active_any:
                n_sub = max(1, int(math.ceil(seg / self.dt_cap)))
                dt = seg / n_sub
                if self.history:
                    T, self.history_state = self.advance(
                        T, prep, jnp.asarray(dt, T.dtype),
                        jnp.asarray(n_sub, jnp.int32),
                        jnp.asarray(t, T.dtype), self.history_state)
                elif prep is not None:
                    T = self.advance(T, prep, jnp.asarray(dt, T.dtype),
                                     jnp.asarray(n_sub, jnp.int32),
                                     jnp.asarray(t, T.dtype))
                else:
                    T = self.advance(T, jnp.broadcast_to(active, T.shape),
                                     jnp.asarray(dt, T.dtype),
                                     jnp.asarray(n_sub, jnp.int32),
                                     jnp.asarray(t, T.dtype))
            t = te
            if te in birth_set:
                if self.interpass_T is not None and active_any:
                    dwell = 0.0
                    n_dw = max(1, int(math.ceil(self.interpass_dwell
                                                / self.dt_cap)))
                    dt_dw = self.interpass_dwell / n_dw
                    act_b = jnp.broadcast_to(active, T.shape)
                    while dwell < self.interpass_max_dwell:
                        tmax = float(_masked_max(T, act_b))
                        if tmax <= self.interpass_T:
                            break
                        if self.history:
                            T, self.history_state = self.advance(
                                T, prep, jnp.asarray(dt_dw, T.dtype),
                                jnp.asarray(n_dw, jnp.int32),
                                jnp.asarray(t, T.dtype), self.history_state)
                        elif prep is not None:
                            T = self.advance(T, prep,
                                             jnp.asarray(dt_dw, T.dtype),
                                             jnp.asarray(n_dw, jnp.int32),
                                             jnp.asarray(t, T.dtype))
                        else:
                            T = self.advance(T, act_b,
                                             jnp.asarray(dt_dw, T.dtype),
                                             jnp.asarray(n_dw, jnp.int32),
                                             jnp.asarray(t, T.dtype))
                        dwell += self.interpass_dwell
                    if dwell > 0.0:
                        if self.dwell_log is None:
                            self.dwell_log = []
                        self.dwell_log.append((te, dwell))
                new_active = act <= t
                newborn = new_active & ~active
                T = jnp.where(newborn, self.deposit_T, T)
                if self.history:
                    # newborn history STARTS at deposit: void cells carry
                    # placeholder temperatures through the solver's identity
                    # rows, so anything accumulated pre-birth is bogus
                    pk, ta = self.history_state
                    pk = jnp.where(newborn, T, jnp.maximum(pk, T))
                    ta = jnp.where(newborn, 0.0, ta)  # broadcasts over axis 0
                    self.history_state = (pk, ta)
                active = new_active
                active_any = True          # a birth event implies new cells
                if self.prepare is not None:
                    prep = self.prepare(jnp.broadcast_to(active, T.shape))
            if self.check_finite and (te in frames or te == final_event):
                check(t)
            if te in frames and on_frame is not None:
                on_frame(t, T, jnp.broadcast_to(active, T.shape))
        return T, active, t
