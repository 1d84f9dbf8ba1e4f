"""EST: energy storage and transfer (the GWE analog of GWT's MST).

Behavioral parity targets in the reference:
  - est_fc_sto        src/Model/GroundWaterEnergy/gwe-est.f90:202-244
    (aqueous heat storage scaled by eqnsclfac=rhow*cpw plus solid-phase
     storage rhos*cps*(1-porosity)*vcell)
  - est_fc_dcy_water  gwe-est.f90:250-292 (zero-order energy sink, water)
  - est_fc_dcy_solid  gwe-est.f90:298-341 (zero-order energy sink, solid)

GWE supports zero-order decay only (an energy source/sink rate); there is
no sorption — the solid phase participates through its heat capacity.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ...constants import DONE, DZERO

DECAY_OFF = 0
DECAY_ZERO_ORDER = 1

DECAY_WATER = 1
DECAY_SOLID = 2
DECAY_BOTH = 3


@dataclasses.dataclass(frozen=True)
class EstOptions:
    idcy: int = DECAY_OFF
    idcysrc: int = 0
    rhow: float = 1000.0
    cpw: float = 4184.0
    latheatvap: float = 0.0

    @property
    def eqnsclfac(self) -> float:
        return self.rhow * self.cpw


@partial(jax.tree_util.register_dataclass,
         data_fields=["porosity", "cps", "rhos", "decay_water",
                      "decay_solid"],
         meta_fields=[])
@dataclasses.dataclass(frozen=True)
class EstArrays:
    porosity: jax.Array     # θ
    cps: jax.Array          # solid heat capacity
    rhos: jax.Array         # solid density
    decay_water: jax.Array  # zero-order energy decay rate, aqueous
    decay_solid: jax.Array  # zero-order energy decay rate, solid


def storage_terms(opts: EstOptions, arrays: EstArrays, fields, ibound,
                  top, bot, area, delt):
    """est_fc_sto: (hcof[N], rhs_coeff[N]) with rhs_add = rhs_coeff * told.

    Aqueous storage (tracks the flow model's water volumes, including the
    GWF storage-rate correction for vold) + solid storage rhos*cps*vsolid.
    """
    tled = DONE / delt
    vcell = area * (top - bot)
    vnew = vcell * fields.sat * arrays.porosity
    vold = vnew + (fields.strg_ss + fields.strg_sy) * delt
    vsolid = vcell * (DONE - arrays.porosity)
    term = arrays.rhos * arrays.cps * vsolid
    act = ibound > 0
    hcof = jnp.where(act, -(opts.eqnsclfac * vnew + term) * tled, DZERO)
    rhs_coeff = jnp.where(act, -(opts.eqnsclfac * vold + term) * tled, DZERO)
    return hcof, rhs_coeff


def decay_terms(opts: EstOptions, arrays: EstArrays, fields, ibound,
                top, bot, area):
    """est_fc_dcy_water + est_fc_dcy_solid: rhs_add[N] (already an energy
    rate — no eqnsclfac scaling, gwe-est.f90:284-288)."""
    vcell = area * (top - bot)
    act = ibound > 0
    rhs = jnp.zeros_like(vcell)
    if opts.idcy == DECAY_ZERO_ORDER:
        if opts.idcysrc in (DECAY_WATER, DECAY_BOTH):
            rhs = rhs + jnp.where(
                act, arrays.decay_water * vcell * fields.sat * arrays.porosity,
                DZERO)
        if opts.idcysrc in (DECAY_SOLID, DECAY_BOTH):
            rhs = rhs + jnp.where(
                act,
                arrays.decay_solid * vcell * (DONE - arrays.porosity)
                * arrays.rhos,
                DZERO)
    return rhs
