"""Binary morphology on voxel masks (6-connectivity), SciPy-free.

Ports the reference's mask-conditioning pipeline
(waam_from_stl_v7_mm.py:73-183): dilate/erode/closing, outside-air flood
fill, and the shell-vs-solid ``solidify_mask`` heuristic that turns leaky STL
shells into watertight voxel solids.  All vectorized numpy (the reference's
were too); these run once per geometry load on the host, off the device
critical path.
"""
from __future__ import annotations

import numpy as np

__all__ = ["dilate6", "erode6", "closing6", "flood_fill_outside",
           "fill_enclosed", "solidify_mask"]


def _shift(m: np.ndarray, axis: int, direction: int) -> np.ndarray:
    out = np.zeros_like(m)
    src = [slice(None)] * m.ndim
    dst = [slice(None)] * m.ndim
    if direction > 0:
        src[axis] = slice(0, -1)
        dst[axis] = slice(1, None)
    else:
        src[axis] = slice(1, None)
        dst[axis] = slice(0, -1)
    out[tuple(dst)] = m[tuple(src)]
    return out


def dilate6(m: np.ndarray, iterations: int = 1) -> np.ndarray:
    m = np.asarray(m, bool)
    for _ in range(iterations):
        out = m.copy()
        for ax in range(3):
            out |= _shift(m, ax, +1)
            out |= _shift(m, ax, -1)
        m = out
    return m


def erode6(m: np.ndarray, iterations: int = 1) -> np.ndarray:
    return ~dilate6(~np.asarray(m, bool), iterations)


def closing6(m: np.ndarray, iterations: int = 1) -> np.ndarray:
    return erode6(dilate6(m, iterations), iterations)


def flood_fill_outside(solid: np.ndarray, max_iters: int | None = None,
                       use_native: bool = True) -> np.ndarray:
    """Boolean field of 'outside air': void cells 6-connected to the domain
    boundary.  Native O(N) BFS when available; otherwise iterated dilation
    on a padded array (waam_from_stl_v7_mm.py:105-131)."""
    solid = np.asarray(solid, bool)
    if use_native and max_iters is None:
        from ..native.loader import flood_fill_outside_native

        out = flood_fill_outside_native(solid)
        if out is not None:
            return out
    free = ~solid
    pad = np.pad(free, 1, constant_values=True)
    out = np.zeros_like(pad)
    out[0, :, :] = out[-1, :, :] = True
    out[:, 0, :] = out[:, -1, :] = True
    out[:, :, 0] = out[:, :, -1] = True
    out &= pad
    it = 0
    # expand strictly to the fixpoint: a serpentine channel's 6-connected
    # path can be O(N) long, far beyond the domain diameter, and stopping
    # early would wrongly solidify open channels.  The loop always
    # terminates: `out` grows monotonically within the padded volume.
    limit = max_iters if max_iters is not None else pad.size
    while True:
        grown = dilate6(out) & pad
        if (grown == out).all() or it >= limit:
            break
        out = grown
        it += 1
    return out[1:-1, 1:-1, 1:-1]


def fill_enclosed(solid: np.ndarray) -> np.ndarray:
    """Solid plus every void region not connected to the outside."""
    outside = flood_fill_outside(solid)
    return np.asarray(solid, bool) | ~outside


def solidify_mask(mask: np.ndarray, mode: str = "auto",
                  closing_iters: int = 1) -> np.ndarray:
    """Condition a voxelized mask into a watertight solid.

    Modes (waam_from_stl_v7_mm.py:133-183 semantics):
      "none"        : as-is
      "fill"        : fill enclosed cavities
      "close_flood" : morphological closing, then fill enclosed cavities
      "auto"        : detect thin shells / failed fills — erosion survival
                      ratio < 0.25 or fill fraction < 0.02 — and escalate to
                      close_flood; otherwise fill.
    """
    mask = np.asarray(mask, bool)
    if mode == "none":
        return mask
    if mode == "fill":
        return fill_enclosed(mask)
    if mode == "close_flood":
        return fill_enclosed(closing6(mask, closing_iters))
    if mode != "auto":
        raise ValueError(f"unknown solidify mode: {mode!r}")

    filled = fill_enclosed(mask)
    n_mask = int(mask.sum())
    if n_mask == 0:
        return mask
    erosion_ratio = float(erode6(filled).sum()) / max(1, int(filled.sum()))
    fill_frac = float((filled & ~mask).sum()) / n_mask
    if erosion_ratio < 0.25 or fill_frac < 0.02:
        return fill_enclosed(closing6(mask, closing_iters))
    return filled
