"""CND: thermal conduction + mechanical heat dispersion (GWE analog of DSP).

Behavioral parity target: src/Model/GroundWaterEnergy/gwe-cnd.f90:
  - calcdispellipse  gwe-cnd.f90:636-759: d11 = al*q*sat*eqnsclfac + ktbulk
    with ktbulk = porosity*sat*ktw + (1-porosity)*kts — the tensor is in
    energy-conductance units, so the cnd_fc fill (gwe-cnd.f90:263-303) adds
    the connection coefficient WITHOUT further eqnsclfac scaling.
  - calcdispcoef     gwe-cnd.f90:763-...: identical connection-conductance
    combination as GWT DSP (shared here via dsp.edge_dispersion_conductance).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ...constants import DONE, DPI, DZERO
from ..gwt import dsp as dsp_mod


@partial(jax.tree_util.register_dataclass,
         data_fields=["alh", "alv", "ath1", "ath2", "atv", "ktw", "kts"],
         meta_fields=["idisp", "iktw", "ikts"])
@dataclasses.dataclass(frozen=True)
class CndData:
    """CND griddata (gwe-cnd.f90 read_data)."""

    alh: jax.Array   # f64[N] longitudinal dispersivity, horizontal flow
    alv: jax.Array
    ath1: jax.Array
    ath2: jax.Array
    atv: jax.Array
    ktw: jax.Array   # f64[N] thermal conductivity of water
    kts: jax.Array   # f64[N] thermal conductivity of solid
    idisp: int = 0
    iktw: int = 0
    ikts: int = 0


def thermal_ellipse(cnd: CndData, porosity, sat, eqnsclfac, qx, qy, qz,
                    active):
    """Per-cell thermal dispersion tensor (gwe-cnd.f90 calcdispellipse)."""
    qsq = qx * qx + qy * qy + qz * qz
    q = jnp.where(qsq > DZERO, jnp.sqrt(qsq), DZERO)

    ktbulk = jnp.zeros_like(porosity)
    if cnd.iktw:
        ktbulk = ktbulk + porosity * cnd.ktw * sat
    if cnd.ikts:
        ktbulk = ktbulk + (DONE - porosity) * cnd.kts

    if cnd.idisp:
        qzoq2 = jnp.where(q > DZERO, (qz / jnp.where(q > 0, q, 1.0)) ** 2,
                          DZERO)
        al = cnd.alh * (DONE - qzoq2) + cnd.alv * qzoq2
        at1 = cnd.ath1 * (DONE - qzoq2) + cnd.atv * qzoq2
        at2 = cnd.ath2 * (DONE - qzoq2) + cnd.atv * qzoq2
        al = jnp.where(q > DZERO, al, DZERO)
        at1 = jnp.where(q > DZERO, at1, DZERO)
        at2 = jnp.where(q > DZERO, at2, DZERO)
    else:
        al = at1 = at2 = jnp.zeros_like(q)

    qsw = q * sat * eqnsclfac
    d11 = al * qsw + ktbulk
    d22 = at1 * qsw + ktbulk
    d33 = at2 * qsw + ktbulk

    if cnd.idisp:
        a2 = jnp.arcsin(jnp.where(q > DZERO, qz / jnp.where(q > 0, q, 1.0),
                                  DZERO))
        den = q * jnp.cos(a2)
        a = jnp.where(den != DZERO, qx / jnp.where(den != 0, den, 1.0), DZERO)
        ang1 = jnp.where(a <= -DONE, DPI,
                         jnp.where(a >= DONE, DZERO,
                                   jnp.arccos(jnp.clip(a, -DONE, DONE))))
        ang2 = a2
    else:
        ang1 = ang2 = jnp.zeros_like(q)
    ang3 = jnp.zeros_like(q)

    def z(x):
        return jnp.where(active, x, DZERO)
    return z(d11), z(d22), z(d33), z(ang1), z(ang2), z(ang3)


def edge_conductance(dtopo, cnd: CndData, porosity, eqnsclfac, fields,
                     ibound, top, bot):
    """Per-step thermal dispersion/conduction conductance per edge."""
    active = (ibound != 0) & (fields.sat > DZERO)
    qx, qy, qz = dsp_mod.cell_spdis(dtopo, fields.q_edge, fields.sat, top,
                                    bot)
    d11, d22, d33, a1, a2, a3 = thermal_ellipse(
        cnd, porosity, fields.sat, eqnsclfac, qx, qy, qz, active)
    return dsp_mod.edge_dispersion_conductance(
        dtopo, d11, d22, d33, a1, a2, a3, fields.sat, top, bot, active)
