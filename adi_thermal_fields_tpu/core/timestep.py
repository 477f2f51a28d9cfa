"""Time-stepping controls.

Mirrors the reference ``Params`` (adi3d_numba_coeff.py:25-27 Cartesian;
adi3d_cyl_phi_v3.py:52-54 cylindrical, which adds ``scheme``).

Unlike the reference — where callers mutate ``prm.dt`` between steps
(tests/test_spiral_vs_analytic.py:105) — the actual ``dt`` used by a step is
always a *runtime argument* to the step functions here, so sub-stepping with
event-aligned dt never retraces the XLA program.  ``TimeControls`` carries the
static knobs (theta, scheme) plus a default dt for convenience.
"""
from __future__ import annotations

import dataclasses

__all__ = ["TimeControls"]


@dataclasses.dataclass(frozen=True)
class TimeControls:
    dt: float
    theta: float = 0.5
    scheme: str = "be"  # cylindrical only: "be" (backward Euler) | "douglas"

    def __post_init__(self):
        object.__setattr__(self, "dt", float(self.dt))
        object.__setattr__(self, "theta", float(self.theta))
        object.__setattr__(self, "scheme", str(self.scheme).lower())
