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


def make_cartesian_engine(grid: CartesianGrid, mat: Material, *,
                          theta: float = 0.5, t_inf: float = 20.0,
                          robin_h=None, neumann=None,
                          dirichlet_mask=None, dirichlet_value=None,
                          source_fn=None, implementation: str = "auto",
                          mesh=None, dtype=None, interpret: bool = False):
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
    precision)."""
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
        lite_c = float(robin_h or 0.0) / (mat.rho * mat.cp * grid.dx)
    # packs are still needed for Neumann sources / Dirichlet pins
    lite_needs_packs = neumann is not None or dirichlet_mask is not None

    if mesh is not None and implementation == "pallas":
        from ..dist.cartesian_pallas import (shard_plan,
                                             sharded_adi_step_pallas)
        from ..step.cartesian_pallas import build_sweep_plan

        interpret = jax.default_backend() != "tpu"
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

        @jax.jit
        def advance(T, prep, dt, n_sub, t0=0.0):
            def body(i, T):
                src = (None if source_fn is None
                       else source_fn(jnp.asarray(t0, T.dtype) + i * dt))
                return inner(T, prep, dt, src)

            return lax.fori_loop(0, n_sub, body, T)

    elif mesh is not None:
        from ..dist.cartesian import sharded_adi_step

        inner = sharded_adi_step(grid, mat, mesh, theta=theta)

        @jax.jit
        def prepare(active):
            active = active.astype(bool)
            return (active, _packs(active))

        @jax.jit
        def advance(T, prep, dt, n_sub, t0=0.0):
            active, packs = prep
            t_inf_ = jnp.asarray(t_inf, T.dtype)

            def body(i, T):
                src = (None if source_fn is None
                       else source_fn(jnp.asarray(t0, T.dtype) + i * dt))
                return inner(T, active, packs, dt, t_inf_, src)

            return lax.fori_loop(0, n_sub, body, T)

    elif implementation == "pallas":
        from ..step.cartesian_pallas import (adi_step_pallas, build_sweep_plan,
                                             pad_domain)

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

        @jax.jit
        def advance(T, prep, dt, n_sub, t0=0.0):
            # pad once per event segment; the sub-step loop runs pad-free
            shape = T.shape
            Tp = pad_domain(T)

            def body(i, Tp):
                src = (None if source_fn is None
                       else source_fn(jnp.asarray(t0, Tp.dtype) + i * dt))
                if src is not None:
                    src = pad_domain(src)
                return adi_step_pallas(Tp, prep, grid, mat, dt=dt, theta=theta,
                                       t_inf=t_inf, source=src,
                                       interpret=interpret)

            Tp = lax.fori_loop(0, n_sub, body, Tp)
            return Tp[:shape[0], :shape[1], :shape[2]]

    else:
        @jax.jit
        def prepare(active):
            active = active.astype(bool)
            return (active, _packs(active))

        @jax.jit
        def advance(T, prep, dt, n_sub, t0=0.0):
            active, packs = prep

            def body(i, T):
                src = (None if source_fn is None
                       else source_fn(jnp.asarray(t0, T.dtype) + i * dt))
                return adi_step(T, active, packs, grid, mat, dt=dt,
                                theta=theta, t_inf=t_inf, source=src)

            return lax.fori_loop(0, n_sub, body, T)

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
    """

    advance: Callable
    activation_times: Any
    deposit_T: float
    dt_cap: float
    check_finite: bool = True
    prepare: Callable | None = None

    def run(self, T, *, frame_times, t_end: float | None = None,
            on_frame: Callable | None = None, extra_events=(),
            start_t: float = 0.0):
        act = self.activation_times
        eps = 1e-12
        finite = jnp.isfinite(act) & (act > start_t - eps)
        births = jnp.unique(jnp.where(finite, act, jnp.inf))
        births = [float(b) for b in births if math.isfinite(float(b))]
        frame_times = [float(t) for t in frame_times]
        t_end = t_end if t_end is not None else (max(frame_times) if frame_times else 0.0)
        birth_set = set(b for b in births if b <= t_end)
        events = sorted(birth_set | set(frame_times) | set(extra_events)
                        | {t_end})
        frames = set(frame_times)
        final_event = events[-1] if events else None

        t = start_t
        active = act < t + eps
        # layers whose birth time coincides with the start are deposited now
        born_now = active & jnp.isfinite(act) & (act > start_t - eps)
        T = jnp.where(born_now, self.deposit_T, T)
        active_any = bool(jnp.any(active))     # one sync at start only
        prep = (self.prepare(jnp.broadcast_to(active, T.shape))
                if self.prepare is not None else None)
        if t in frames and on_frame is not None:
            on_frame(t, T, jnp.broadcast_to(active, T.shape))

        def check(t):
            if not bool(jnp.isfinite(
                    jnp.where(jnp.broadcast_to(active, T.shape), T, 0.0)).all()):
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
                if prep is not None:
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
                new_active = act < t + eps
                newborn = new_active & ~active
                T = jnp.where(newborn, self.deposit_T, T)
                active = new_active
                active_any = True          # a birth event implies new cells
                if self.prepare is not None:
                    prep = self.prepare(jnp.broadcast_to(active, T.shape))
            if self.check_finite and (te in frames or te == final_event):
                check(t)
            if te in frames and on_frame is not None:
                on_frame(t, T, jnp.broadcast_to(active, T.shape))
        return T, active, t
