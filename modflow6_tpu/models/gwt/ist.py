"""IST: immobile storage and transfer (dual-domain transport).

Behavioral parity target: src/Model/GroundWaterTransport/gwt-ist.f90 —
the immobile-domain balance (get_ddterm:..., eq. 9-9 of the MF6
supplemental technical information) is solved per cell in closed form
given the mobile concentration, contributing

    hcof = ζ²V s/f − ζV s          rhs = −(ζV s/f)·[(T₁+T₃)·cim_old − γ…]

to the mobile equation (get_hcofrhs), and the immobile concentration
updates as cim_new = [(T₁+T₃)·cim_old + ζVs·c_new − γ…]/f (get_ddconc).
Linear sorption and first/zero-order decay in the immobile domain are
supported; Freundlich/Langmuir immobile isotherms are not (loud error).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ...constants import DZERO


@partial(jax.tree_util.register_dataclass,
         data_fields=["thetaim", "zetaim", "volfrac", "bulk_density",
                      "distcoef", "decay", "decay_sorbed"],
         meta_fields=["idcy", "isrb"])
@dataclasses.dataclass(frozen=True)
class IstData:
    thetaim: jax.Array        # immobile-domain porosity
    zetaim: jax.Array         # mobile↔immobile transfer rate
    volfrac: jax.Array        # immobile volume fraction (sorption)
    bulk_density: jax.Array
    distcoef: jax.Array       # linear Kd
    decay: jax.Array          # aqueous decay rate
    decay_sorbed: jax.Array
    idcy: int = 0             # 0 off, 1 first-order, 2 zero-order
    isrb: int = 0             # 0 off, 1 linear


def make_ist(n, thetaim=0.0, zetaim=0.0, volfrac=0.0, bulk_density=0.0,
             distcoef=0.0, decay=0.0, decay_sorbed=None, idcy=0,
             isrb=0) -> IstData:
    if isrb not in (0, 1):
        raise NotImplementedError(
            "IST supports linear immobile-domain sorption only "
            "(gwt-ist.f90 freundlich/langmuir paths not implemented)")
    full = lambda v: jnp.broadcast_to(                      # noqa: E731
        jnp.asarray(v, jnp.float64), (n,))
    return IstData(full(thetaim), full(zetaim), full(volfrac),
                   full(bulk_density), full(distcoef), full(decay),
                   full(decay_sorbed if decay_sorbed is not None else decay),
                   idcy=int(idcy), isrb=int(isrb))


def _ddterms(ist: IstData, sat, area, top, bot, conc_old, cim_old, delt):
    """The nine balance terms + denominator f (get_ddterm)."""
    tled = 1.0 / delt
    vcell = area * (top - bot)
    kd = ist.distcoef if ist.isrb else jnp.zeros_like(ist.distcoef)
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
