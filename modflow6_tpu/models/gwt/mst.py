"""MST: mobile storage and transfer — storage, decay, sorption.

Behavioral parity targets in the reference:
  - mst_fc_sto   src/Model/GroundWaterTransport/gwt-mst.f90:215-255
  - mst_fc_dcy   gwt-mst.f90:261-313
  - mst_fc_srb / mst_srb_term  gwt-mst.f90:319-446
  - mst_fc_dcy_srb             gwt-mst.f90:452-520
  - zero-order decay limiting  get_zero_order_decay
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ...constants import DHALF, DONE, DZERO

DECAY_OFF = 0
DECAY_FIRST_ORDER = 1
DECAY_ZERO_ORDER = 2

SORPTION_OFF = 0
SORPTION_LINEAR = 1
SORPTION_FREUND = 2
SORPTION_LANG = 3


@dataclasses.dataclass(frozen=True)
class MstOptions:
    idcy: int = DECAY_OFF
    isrb: int = SORPTION_OFF


@partial(jax.tree_util.register_dataclass,
         data_fields=["porosity", "decay", "decay_sorbed", "bulk_density",
                      "distcoef", "sp2"],
         meta_fields=[])
@dataclasses.dataclass(frozen=True)
class MstArrays:
    porosity: jax.Array      # θ mobile
    decay: jax.Array
    decay_sorbed: jax.Array
    bulk_density: jax.Array
    distcoef: jax.Array
    sp2: jax.Array


def storage_terms(arrays, fields, ibound, top, bot, area, delt):
    """mst_fc_sto: (diag_add, rhs_add(cold) multiplier form).

    Returns (hcof[N], rhs_coeff[N]) where rhs_add = rhs_coeff * cold.
    """
    tled = DONE / delt
    vnew = area * (top - bot) * fields.sat * arrays.porosity
    vold = vnew + (fields.strg_ss + fields.strg_sy) * delt
    act = ibound > 0
    hcof = jnp.where(act, -vnew * tled, DZERO)
    rhs_coeff = jnp.where(act, -vold * tled, DZERO)
    return hcof, rhs_coeff


def decay_terms(opts, arrays, fields, ibound, top, bot, area, cold, cnew,
                delt, kiter_is_first, decaylast):
    """mst_fc_dcy: (diag_add, rhs_add, decaylast_new)."""
    vcell = area * (top - bot)
    sw = fields.sat
    act = ibound > 0
    if opts.idcy == DECAY_FIRST_ORDER:
        hcof = jnp.where(act, -arrays.decay * vcell * sw * arrays.porosity,
                         DZERO)
        return hcof, jnp.zeros_like(cold), decaylast
    if opts.idcy == DECAY_ZERO_ORDER:
        # limit the rate so concentrations cannot be driven negative
        # (reference get_zero_order_decay)
        decay_rate = jnp.where(kiter_is_first, arrays.decay, decaylast)
        cmid = DHALF * (cold + cnew)
        max_rate = jnp.where(delt > 0, cmid / delt * 2.0, arrays.decay)
        rate = jnp.clip(decay_rate, DZERO, jnp.maximum(max_rate, DZERO))
        rhs = jnp.where(act, rate * vcell * sw * arrays.porosity, DZERO)
        return jnp.zeros_like(cold), rhs, rate
    return jnp.zeros_like(cold), jnp.zeros_like(cold), decaylast


def sorption_terms(opts, arrays, fields, ibound, top, bot, area, cold, cnew,
                   delt):
    """mst_fc_srb: (diag_add, rhs_add)."""
    tled = DONE / delt
    vcell = area * (top - bot)
    swnew = fields.sat
    swold = fields.sat_old
    act = ibound > 0
    rhob = arrays.bulk_density
    volfracm = DONE  # no immobile domain yet (IST reduces this)
    if opts.isrb == SORPTION_LINEAR:
        term = -volfracm * rhob * vcell * tled * arrays.distcoef
        hcof = term * swnew
        rhs = term * swold * cold
    else:
        cavg = DHALF * (cold + cnew)
        safe = jnp.maximum(cavg, 1e-30)
        if opts.isrb == SORPTION_FREUND:
            cbarnew = arrays.distcoef * jnp.maximum(cnew, DZERO) ** arrays.sp2
            cbarold = arrays.distcoef * jnp.maximum(cold, DZERO) ** arrays.sp2
            derv = arrays.sp2 * arrays.distcoef * safe ** (arrays.sp2 - DONE)
        else:  # langmuir
            cbarnew = (arrays.distcoef * arrays.sp2 * cnew
                       / (DONE + arrays.distcoef * cnew))
            cbarold = (arrays.distcoef * arrays.sp2 * cold
                       / (DONE + arrays.distcoef * cold))
            derv = (arrays.distcoef * arrays.sp2
                    / (DONE + arrays.distcoef * cavg) ** 2)
        term = -volfracm * rhob * vcell * tled
        cbaravg = DHALF * (cbarold + cbarnew)
        swavg = DHALF * (swnew + swold)
        hcof = term * derv * swavg
        rhs = term * derv * swavg * cold - term * cbaravg * (swnew - swold)
    return jnp.where(act, hcof, DZERO), jnp.where(act, rhs, DZERO)


def decay_sorbed_terms(opts, arrays, fields, ibound, top, bot, area, cold,
                       cnew, delt):
    """mst_fc_dcy_srb (first-order linear-sorption case)."""
    if opts.idcy != DECAY_FIRST_ORDER or opts.isrb != SORPTION_LINEAR:
        return jnp.zeros_like(cold), jnp.zeros_like(cold)
    vcell = area * (top - bot)
    act = ibound > 0
    swnew = fields.sat
    hcof = -arrays.decay_sorbed * arrays.bulk_density * arrays.distcoef \
        * swnew * vcell
    return jnp.where(act, hcof, DZERO), jnp.zeros_like(cold)
