"""IST: immobile storage and transfer (dual-domain transport).

Behavioral parity target: src/Model/GroundWaterTransport/gwt-ist.f90 —
the immobile-domain balance (get_ddterm:..., eq. 9-9 of the MF6
supplemental technical information) is solved per cell in closed form
given the mobile concentration, contributing

    hcof = ζ²V s/f − ζV s          rhs = −(ζV s/f)·[(T₁+T₃)·cim_old − γ…]

to the mobile equation (get_hcofrhs), and the immobile concentration
updates as cim_new = [(T₁+T₃)·cim_old + ζVs·c_new − γ…]/f (get_ddconc).
Linear, Freundlich, and Langmuir immobile isotherms (via the effective
kd(cim) linearization of gwt-mst.f90 get_freundlich_kd/get_langmuir_kd)
and first/zero-order decay in the immobile domain are supported.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ...constants import DZERO


@partial(jax.tree_util.register_dataclass,
         data_fields=["thetaim", "zetaim", "volfrac", "bulk_density",
                      "distcoef", "decay", "decay_sorbed", "sp2"],
         meta_fields=["idcy", "isrb"])
@dataclasses.dataclass(frozen=True)
class IstData:
    thetaim: jax.Array        # immobile-domain porosity
    zetaim: jax.Array         # mobile↔immobile transfer rate
    volfrac: jax.Array        # immobile volume fraction (sorption)
    bulk_density: jax.Array
    distcoef: jax.Array       # linear Kd / freundlich Kf / langmuir Kl
    decay: jax.Array          # aqueous decay rate
    decay_sorbed: jax.Array
    sp2: jax.Array = None     # freundlich exponent / langmuir sbar
    idcy: int = 0             # 0 off, 1 first-order, 2 zero-order
    isrb: int = 0             # 0 off, 1 linear, 2 freundlich, 3 langmuir


def make_ist(n, thetaim=0.0, zetaim=0.0, volfrac=0.0, bulk_density=0.0,
             distcoef=0.0, decay=0.0, decay_sorbed=None, sp2=1.0, idcy=0,
             isrb=0) -> IstData:
    if isrb not in (0, 1, 2, 3):
        raise ValueError("isrb must be 0 (off), 1 (linear), "
                         "2 (freundlich) or 3 (langmuir)")
    full = lambda v: jnp.broadcast_to(                      # noqa: E731
        jnp.asarray(v, jnp.float64), (n,))
    return IstData(full(thetaim), full(zetaim), full(volfrac),
                   full(bulk_density), full(distcoef), full(decay),
                   full(decay_sorbed if decay_sorbed is not None else decay),
                   full(sp2), idcy=int(idcy), isrb=int(isrb))


def effective_kd(ist: IstData, cim):
    """Effective immobile distribution coefficient at the lagged
    immobile concentration (get_freundlich_kd / get_langmuir_kd,
    gwt-mst.f90; the nonlinear isotherms linearize through kd(cim) like
    the reference's per-iteration update — here lagged one step, the
    sequential-coupling analog)."""
    if ist.isrb == 0:
        return jnp.zeros_like(ist.distcoef)
    if ist.isrb == 1:
        return ist.distcoef
    c = jnp.maximum(cim, DZERO)
    if ist.isrb == 2:      # freundlich: cbar = Kf c^a
        return jnp.where(c > DZERO,
                         ist.distcoef * c ** (ist.sp2 - 1.0), DZERO)
    # langmuir: cbar = Kl sbar c / (1 + Kl c)
    return jnp.where(c > DZERO,
                     ist.distcoef * ist.sp2
                     / (1.0 + ist.distcoef * c), DZERO)


def _ddterms(ist: IstData, sat, area, top, bot, conc_old, cim_old, delt):
    """The nine balance terms + denominator f (get_ddterm)."""
    tled = 1.0 / delt
    vcell = area * (top - bot)
    kd = effective_kd(ist, cim_old)
    vfrho = (ist.volfrac * ist.bulk_density if ist.isrb
             else jnp.zeros_like(ist.volfrac))
    lam1 = ist.decay if ist.idcy == 1 else DZERO
    lam2 = ist.decay_sorbed if (ist.idcy == 1 and ist.isrb) else DZERO
    gam1 = ist.decay if ist.idcy == 2 else DZERO
    gam2 = ist.decay_sorbed if (ist.idcy == 2 and ist.isrb) else DZERO
    t1 = ist.thetaim * vcell * tled
    t3 = vfrho * vcell * kd * tled
    t5 = ist.thetaim * lam1 * vcell
    t6 = lam2 * vfrho * kd * vcell
    t7 = ist.thetaim * gam1 * vcell
    t8 = gam2 * vfrho * vcell
    t9 = vcell * sat * ist.zetaim
    f = t1 + t3 + t5 + t6 + t9
    return t1, t3, t7, t8, t9, f


def ist_terms(ist: IstData, sat, area, top, bot, ibound, conc_old, cim_old,
              delt):
    """(hcof, rhs) contributions to the mobile equation (get_hcofrhs)."""
    t1, t3, t7, t8, t9, f = _ddterms(ist, sat, area, top, bot, conc_old,
                                     cim_old, delt)
    fsafe = jnp.where(f != 0.0, f, 1.0)
    hcof = t9 * t9 / fsafe - t9
    rhs = ((t1 + t3) * cim_old - t7 - t8) * t9 / fsafe
    act = ibound > 0
    return (jnp.where(act, hcof, DZERO), jnp.where(act, -rhs, DZERO))


def ist_update(ist: IstData, sat, area, top, bot, ibound, conc_old,
               cim_old, conc_new, delt):
    """Advance cim to the end of the step (get_ddconc)."""
    t1, t3, t7, t8, t9, f = _ddterms(ist, sat, area, top, bot, conc_old,
                                     cim_old, delt)
    fsafe = jnp.where(f != 0.0, f, 1.0)
    cim_new = ((t1 + t3) * cim_old + t9 * conc_new - t7 - t8) / fsafe
    return jnp.where(ibound > 0, cim_new, cim_old)
