"""Radiative boundary conditions via an equivalent film coefficient.

The reference supports convective Robin films only; at WAAM deposit
temperatures (1500 C+) radiation dominates convection.  The Stefan-
Boltzmann flux factors EXACTLY as a temperature-dependent Robin film:

    q = eps*sigma*(T^4 - T_inf^4) = h_rad(T) * (T - T_inf),
    h_rad(T) = eps*sigma*(T + T_inf)*(T^2 + T_inf^2)

so evaluating ``h_rad`` at the current field (Picard linearization) turns
radiation into the existing unified Robin machinery — refresh it per event
segment via ``make_cartesian_advance(robin_h_fn=...)``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["STEFAN_BOLTZMANN", "radiative_h"]

STEFAN_BOLTZMANN = 5.670374419e-8  # W/m^2/K^4


def radiative_h(T: jax.Array, emissivity, t_inf, *, celsius: bool = True,
                h_conv=0.0) -> jax.Array:
    """Per-cell film coefficient making Robin exactly reproduce radiation
    (plus an optional additive convective film ``h_conv``).

    celsius: temperatures are C (the framework's unit convention) and are
    shifted by 273.15 K for the T^4 law."""
    off = 273.15 if celsius else 0.0
    Tk = T + off
    Tik = jnp.asarray(t_inf, T.dtype) + off
    h = emissivity * STEFAN_BOLTZMANN * (Tk + Tik) * (Tk * Tk + Tik * Tik)
    return h + h_conv
