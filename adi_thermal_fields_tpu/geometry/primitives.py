"""Procedural triangle meshes for tests, demos, and benchmarks."""
from __future__ import annotations

import numpy as np

from .stl import TriMesh

__all__ = ["box_mesh", "uv_sphere_mesh", "cylinder_mesh"]


def _quads_to_tris(quads: np.ndarray) -> np.ndarray:
    """(N, 4, 3) quads -> (2N, 3, 3) triangles."""
    a, b, c, d = quads[:, 0], quads[:, 1], quads[:, 2], quads[:, 3]
    return np.concatenate([np.stack([a, b, c], 1), np.stack([a, c, d], 1)])


def box_mesh(size=(1.0, 1.0, 1.0), center=(0.0, 0.0, 0.0)) -> TriMesh:
    sx, sy, sz = np.asarray(size, float) / 2.0
    cx, cy, cz = center
    # 8 corners
    p = np.array([[x, y, z] for x in (cx - sx, cx + sx)
                  for y in (cy - sy, cy + sy)
                  for z in (cz - sz, cz + sz)])
    # outward-wound quads
    quads = np.array([
        [p[0], p[1], p[3], p[2]],  # x-
        [p[4], p[6], p[7], p[5]],  # x+
        [p[0], p[4], p[5], p[1]],  # y-
        [p[2], p[3], p[7], p[6]],  # y+
        [p[0], p[2], p[6], p[4]],  # z-
        [p[1], p[5], p[7], p[3]],  # z+
    ])
    return TriMesh(_quads_to_tris(quads))


def uv_sphere_mesh(radius: float = 1.0, center=(0.0, 0.0, 0.0),
                   n_theta: int = 32, n_phi: int = 64) -> TriMesh:
    th = np.linspace(0.0, np.pi, n_theta + 1)
    ph = np.linspace(0.0, 2 * np.pi, n_phi, endpoint=False)
    T, PH = np.meshgrid(th, ph, indexing="ij")
    X = radius * np.sin(T) * np.cos(PH) + center[0]
    Y = radius * np.sin(T) * np.sin(PH) + center[1]
    Z = radius * np.cos(T) + center[2]
    P = np.stack([X, Y, Z], axis=-1)  # (n_theta+1, n_phi, 3)
    tris = []
    for i in range(n_theta):
        a = P[i]
        b = P[i + 1]
        a2 = np.roll(a, -1, axis=0)
        b2 = np.roll(b, -1, axis=0)
        if i > 0:
            tris.append(np.stack([a, b, a2], axis=1))
        if i < n_theta - 1:
            tris.append(np.stack([a2, b, b2], axis=1))
    return TriMesh(np.concatenate(tris))


def cylinder_mesh(radius: float = 1.0, height: float = 1.0,
                  center=(0.0, 0.0, 0.0), n_phi: int = 96) -> TriMesh:
    ph = np.linspace(0.0, 2 * np.pi, n_phi, endpoint=False)
    x = radius * np.cos(ph) + center[0]
    y = radius * np.sin(ph) + center[1]
    zb = center[2] - height / 2.0
    zt = center[2] + height / 2.0
    bot = np.stack([x, y, np.full_like(x, zb)], axis=1)
    top = np.stack([x, y, np.full_like(x, zt)], axis=1)
    bot2 = np.roll(bot, -1, axis=0)
    top2 = np.roll(top, -1, axis=0)
    side = np.concatenate([np.stack([bot, bot2, top], axis=1),
                           np.stack([bot2, top2, top], axis=1)])
    cb = np.array([center[0], center[1], zb])
    ct = np.array([center[0], center[1], zt])
    cap_b = np.stack([np.broadcast_to(cb, bot.shape), bot2, bot], axis=1)
    cap_t = np.stack([np.broadcast_to(ct, top.shape), top, top2], axis=1)
    return TriMesh(np.concatenate([side, cap_b, cap_t]))
