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

__all__ = ["make_cartesian_advance", "EventLoop"]


def make_cartesian_advance(grid: CartesianGrid, mat: Material, *,
                           theta: float = 0.5, t_inf: float = 20.0,
                           robin_h=None, neumann=None,
                           dirichlet_mask=None, dirichlet_value=None,
                           source_fn=None, implementation: str = "auto",
                           mesh=None):
    """Jitted ``advance(T, active, dt, n_sub[, t0]) -> T``: rebuild packs for
    the current activation mask, then take ``n_sub`` ADI steps of ``dt``.

    source_fn: optional traceable ``t -> volumetric heat field [W/m^3]``
    (e.g. a moving Goldak torch); evaluated at each sub-step time.
    implementation: "pallas" (fused TPU kernels), "xla" (lax.scan reference),
    or "auto" (pallas on TPU, xla elsewhere).
    mesh: optional ``jax.sharding.Mesh`` — the whole advance (pack rebuild,
    birth-driven plan rebuild, and every sweep) then runs multi-chip with
    per-sweep batch-axis layouts (dist/cartesian*.py)."""
    if implementation == "auto":
        # the fused kernels are TPU Mosaic; every other backend gets XLA
        implementation = "pallas" if jax.default_backend() == "tpu" else "xla"
    if mesh is not None and source_fn is not None:
        raise NotImplementedError("source_fn with mesh: add the source term "
                                  "to the sharded steps first")

    if mesh is not None:
        if implementation == "pallas":
            from ..dist.cartesian_pallas import (shard_plan,
                                                 sharded_adi_step_pallas)
            from ..step.cartesian_pallas import build_sweep_plan

            interpret = jax.default_backend() != "tpu"
            inner = sharded_adi_step_pallas(grid, mat, mesh, theta=theta,
                                            t_inf=t_inf, interpret=interpret)

            @jax.jit
            def advance(T, active, dt, n_sub, t0=0.0):
                active = active.astype(bool)
                packs = build_coeff_packs(active, grid, mat, robin_h=robin_h,
                                          neumann=neumann,
                                          dirichlet_mask=dirichlet_mask,
                                          dirichlet_value=dirichlet_value,
                                          dtype=T.dtype)
                plan = shard_plan(build_sweep_plan(
                    active, packs, has_neumann=neumann is not None,
                    has_dirichlet=dirichlet_mask is not None),
                    mesh, traced=True)
                return lax.fori_loop(
                    0, n_sub, lambda i, T: inner(T, plan, dt), T)
        else:
            from ..dist.cartesian import sharded_adi_step

            inner = sharded_adi_step(grid, mat, mesh, theta=theta)

            @jax.jit
            def advance(T, active, dt, n_sub, t0=0.0):
                active = active.astype(bool)
                packs = build_coeff_packs(active, grid, mat, robin_h=robin_h,
                                          neumann=neumann,
                                          dirichlet_mask=dirichlet_mask,
                                          dirichlet_value=dirichlet_value,
                                          dtype=T.dtype)
                t_inf_ = jnp.asarray(t_inf, T.dtype)
                return lax.fori_loop(
                    0, n_sub,
                    lambda i, T: inner(T, active, packs, dt, t_inf_), T)
        return advance

    @jax.jit
    def advance(T, active, dt, n_sub, t0=0.0):
        active = active.astype(bool)
        packs = build_coeff_packs(active, grid, mat, robin_h=robin_h,
                                  neumann=neumann,
                                  dirichlet_mask=dirichlet_mask,
                                  dirichlet_value=dirichlet_value,
                                  dtype=T.dtype)

        def src_at(i):
            if source_fn is None:
                return None
            return source_fn(jnp.asarray(t0, T.dtype) + i * dt)

        if implementation == "pallas":
            from ..step.cartesian_pallas import (adi_step_pallas,
                                                 build_sweep_plan)

            plan = build_sweep_plan(active, packs,
                                    has_neumann=neumann is not None,
                                    has_dirichlet=dirichlet_mask is not None)

            def body(i, T):
                return adi_step_pallas(T, plan, grid, mat, dt=dt,
                                       theta=theta, t_inf=t_inf,
                                       source=src_at(i))
        else:
            def body(i, T):
                return adi_step(T, active, packs, grid, mat, dt=dt,
                                theta=theta, t_inf=t_inf, source=src_at(i))

        return lax.fori_loop(0, n_sub, body, T)

    return advance


@dataclasses.dataclass
class EventLoop:
    """Run an element-birth simulation through its event schedule.

    advance : jitted (T, active, dt, n_sub) -> T
    activation_times : device array broadcastable to the field shape;
        cell born when ``activation_times < t`` (substrate = -inf).
    deposit_T : temperature assigned to newborn cells.
    dt_cap : max sub-step (event segments are split evenly to respect it,
        waam_from_stl_v7_mm.py:526-528).
    """

    advance: Callable
    activation_times: Any
    deposit_T: float
    dt_cap: float
    check_finite: bool = True   # raise on NaN/Inf with simulation context

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
        events = sorted(set(b for b in births if b <= t_end)
                        | set(frame_times) | set(extra_events) | {t_end})
        frames = set(frame_times)

        t = start_t
        active = act < t + eps
        # layers whose birth time coincides with the start are deposited now
        born_now = active & jnp.isfinite(act) & (act > start_t - eps)
        T = jnp.where(born_now, self.deposit_T, T)
        if t in frames and on_frame is not None:
            on_frame(t, T, jnp.broadcast_to(active, T.shape))

        for te in events:
            if te <= t + eps:
                continue
            seg = te - t
            has_active = bool(jnp.any(active))
            if has_active:
                n_sub = max(1, int(math.ceil(seg / self.dt_cap)))
                dt = seg / n_sub
                T = self.advance(T, jnp.broadcast_to(active, T.shape),
                                 jnp.asarray(dt, T.dtype),
                                 jnp.asarray(n_sub, jnp.int32),
                                 jnp.asarray(t, T.dtype))
            t = te
            if self.check_finite and not bool(jnp.isfinite(
                    jnp.where(jnp.broadcast_to(active, T.shape), T, 0.0)).all()):
                raise FloatingPointError(
                    f"non-finite temperature detected at t={t:.6g} s "
                    f"(dt_cap={self.dt_cap:.3g}; check material/BC magnitudes)")
            new_active = act < t + eps
            newborn = new_active & ~active
            T = jnp.where(newborn, self.deposit_T, T)
            active = new_active
            if te in frames and on_frame is not None:
                on_frame(t, T, jnp.broadcast_to(active, T.shape))
        return T, active, t
