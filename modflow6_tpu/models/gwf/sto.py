"""STO: storage package — transient diagonal/rhs terms.

Behavioral parity targets in the reference:
  - sto_fc  src/Model/GroundWaterFlow/gwf-sto.f90:226-345
  - sto_fn  gwf-sto.f90:353-440
  - storage maths  src/Model/ModelUtilities/GwfStorageUtils.f90
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ...constants import DONE, DZERO
from ...ops.smoothing import quadratic_saturation, quadratic_saturation_derivative
from ...ops.storage import ss_capacity, ss_terms, sy_capacity, sy_terms


@dataclasses.dataclass(frozen=True)
class StoOptions:
    """Static STO flags."""

    istor_coef: int = 0     # STORAGECOEFFICIENT option
    iconf_ss: int = 0       # SS_CONFINED_ONLY
    iorig_ss: int = 0       # ORIGINAL_SPECIFIC_STORAGE (dev)
    inewton: int = 0
    integratechanges: int = 0  # TVS integration (oldss/oldsy differ)
    satomega: float = 0.0


@partial(jax.tree_util.register_dataclass,
         data_fields=["iconvert", "ss", "sy", "top", "bot", "area"],
         meta_fields=[])
@dataclasses.dataclass(frozen=True)
class StoArrays:
    iconvert: jax.Array  # i32[N] convertible flag
    ss: jax.Array        # f64[N] specific storage (or storage coefficient)
    sy: jax.Array        # f64[N] specific yield
    top: jax.Array
    bot: jax.Array
    area: jax.Array


def assemble(opts: StoOptions, arrays: StoArrays, head, head_old, ibound, delt,
             oldss=None, oldsy=None):
    """sto_fc: (diag_add[N], rhs_add[N]) for the current time step length."""
    tled = DONE / delt
    tp, bt = arrays.top, arrays.bot
    is_conv = arrays.iconvert != 0

    snold = jnp.where(
        is_conv, quadratic_saturation(tp, bt, head_old, opts.satomega), DONE)
    snnew = jnp.where(
        is_conv, quadratic_saturation(tp, bt, head, opts.satomega), DONE)

    sc1 = ss_capacity(opts.istor_coef, tp, bt, arrays.area, arrays.ss)
    rho1 = sc1 * tled
    if opts.integratechanges and oldss is not None:
        rho1old = ss_capacity(opts.istor_coef, tp, bt, arrays.area, oldss) * tled
    else:
        rho1old = rho1
    aterm, rhsterm = ss_terms(arrays.iconvert, opts.iorig_ss, opts.iconf_ss,
                              tp, bt, rho1, rho1old, snnew, snold, head, head_old)

    sc2 = sy_capacity(arrays.area, arrays.sy)
    rho2 = sc2 * tled
    if opts.integratechanges and oldsy is not None:
        rho2old = sy_capacity(arrays.area, oldsy) * tled
    else:
        rho2old = rho2
    aterm2, rhsterm2 = sy_terms(tp, bt, rho2, rho2old, snnew, snold)
    aterm = aterm + jnp.where(is_conv, aterm2, DZERO)
    rhsterm = rhsterm + jnp.where(is_conv, rhsterm2, DZERO)

    active = ibound >= 1
    return jnp.where(active, aterm, DZERO), jnp.where(active, rhsterm, DZERO)


def newton_terms(opts: StoOptions, arrays: StoArrays, head, ibound, delt):
    """sto_fn: storage Newton terms (diag_add, rhs_add).

    Mirrors gwf-sto.f90:353-440: derivative of the SS (and SY when
    convertible) storage volume w.r.t. head for partially saturated cells.
    """
    tled = DONE / delt
    tp, bt = arrays.top, arrays.bot
    tthk = tp - bt
    h = head
    # sto_fn uses the default smoothing width, not satomega (gwf-sto.f90:398)
    snnew = quadratic_saturation(tp, bt, h)
    derv = quadratic_saturation_derivative(tp, bt, h)

    sc1 = ss_capacity(opts.istor_coef, tp, bt, arrays.area, arrays.ss)
    rho1 = sc1 * tled
    if opts.iconf_ss == 0:
        if opts.iorig_ss == 0:
            ss_drterm = -rho1 * derv * (h - bt) + rho1 * tthk * snnew * derv
        else:
            ss_drterm = -(rho1 * derv * h)
        ss_diag = ss_drterm
        ss_rhs = ss_drterm * h
    else:
        ss_diag = jnp.zeros_like(h)
        ss_rhs = jnp.zeros_like(h)

    sc2 = sy_capacity(arrays.area, arrays.sy)
    rho2 = sc2 * tled
    partially = (snnew < DONE) & (snnew > DZERO)
    sy_rterm = -rho2 * tthk * snnew
    sy_drterm = -rho2 * tthk * derv
    sy_diag = jnp.where(partially, sy_drterm + rho2, DZERO)
    sy_rhs = jnp.where(partially, -sy_rterm + sy_drterm * h + rho2 * bt, DZERO)

    is_conv = (arrays.iconvert != 0) & (ibound > 0)
    diag_add = jnp.where(is_conv, ss_diag + sy_diag, DZERO)
    rhs_add = jnp.where(is_conv, ss_rhs + sy_rhs, DZERO)
    return diag_add, rhs_add
