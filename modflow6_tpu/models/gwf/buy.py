"""BUY: buoyancy (variable-density flow) package.

Behavioral parity target: src/Model/GroundWaterFlow/gwf-buy.f90 —
density from concentration(s) via the linear EOS (calcdens:81-98), and
per-connection buoyancy terms added to the flow system:

- iform 0: the "equivalent freshwater head" rhs-only term
  (calcbuy:1102-1180): rhs(n) -= cond·(ρ̄−ρref)/ρref·(elev_m − elev_n);
- iform 1: hydraulic-head formulation, h-terms lagged to the rhs
  (calchhterms:1184-1273 with HHFORMULATION_RHS) — symmetric matrix;
- iform 2 (reference default): hydraulic-head formulation on the lhs —
  asymmetric matrix (use BiCGSTAB).

Everything is vectorized over the symmetric-half edge list; both
(n,m) and (m,n) direction terms are produced per edge, matching the
reference's double loop in buy_fc:811-847.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ...constants import DONE, DZERO


@partial(jax.tree_util.register_dataclass,
         data_fields=["denseref", "drhodc", "crhoref"],
         meta_fields=["iform"])
@dataclasses.dataclass(frozen=True)
class BuyData:
    """Linear equation-of-state coefficients (one or more species).

    dense = denseref + Σ_i drhodc[i]·(conc_i − crhoref[i])
    """

    denseref: jax.Array        # scalar
    drhodc: jax.Array          # f64[nspecies]
    crhoref: jax.Array         # f64[nspecies]
    iform: int = 2


def make_buy(denseref=1000.0, drhodc=0.7, crhoref=0.0, iform=2) -> BuyData:
    drhodc = jnp.atleast_1d(jnp.asarray(drhodc, jnp.float64))
    crhoref = jnp.broadcast_to(jnp.asarray(crhoref, jnp.float64),
                               drhodc.shape)
    return BuyData(jnp.asarray(denseref, jnp.float64), drhodc, crhoref,
                   iform=int(iform))


def calcdens(buy: BuyData, conc) -> jax.Array:
    """ρ(c) linear EOS (reference calcdens, gwf-buy.f90:81-98).

    ``conc``: f64[N] (single species) or f64[nspecies, N]."""
    c = jnp.atleast_2d(jnp.asarray(conc))
    return buy.denseref + jnp.sum(
        buy.drhodc[:, None] * (c - buy.crhoref[:, None]), axis=0)


def assemble_buy(dtopo, buy: BuyData, dense, cond, sat, top, bot, ibound,
                 head, diag, off, rhs):
    """Add buoyancy terms to the assembled system (buy_fc role).

    ``cond``: per-edge conductance (the same hcond/vcond value NPF used,
    via npf.edge_conductance); ``dense``: per-cell density; ``head`` is
    the current iterate (needed by the iform-1 lagged h terms).

    Derivation per ordered direction (calchhterms:1184-1273): for the
    canonical half-edge (n<m), wt = cl1/(cl1+cl2) weights toward n; the
    reverse direction (m,n) has wt' = 1−wt and Δρ' = −Δρ.  rhoterm and
    hphi are direction-symmetric; elevnm is not.
    """
    n, m = dtopo.edge_n, dtopo.edge_m
    act = (ibound[n] != 0) & (ibound[m] != 0)
    cond = jnp.where(act, cond, DZERO)

    wt = dtopo.cl1 / jnp.where(dtopo.cl1 + dtopo.cl2 > 0,
                               dtopo.cl1 + dtopo.cl2, DONE)
    dn, dm = dense[n], dense[m]

    # saturated-midpoint elevations (ireadelev=0 path; buy_ad)
    elev = bot + 0.5 * sat * (top - bot)
    en, em = elev[n], elev[m]

    if buy.iform == 0:
        avgdense = wt * dn + (DONE - wt) * dm
        b = cond * (avgdense - buy.denseref) / buy.denseref * (em - en)
        rhs = rhs.at[n].add(-b)
        rhs = rhs.at[m].add(b)
        return diag, off, rhs

    rhon = dn / buy.denseref
    rhom = dm / buy.denseref
    drho = rhom - rhon
    rhoterm = wt * rhon + (DONE - wt) * rhom
    amat_sym = cond * (rhoterm - DONE)   # amatnn = amatnm, both directions
    N, K = off.shape
    diag = diag.at[n].add(-amat_sym).at[m].add(-amat_sym)
    offf = off.reshape(-1)
    offf = offf.at[dtopo.slot_nm].add(amat_sym)
    offf = offf.at[dtopo.slot_mn].add(amat_sym)

    elev_nm = (DONE - wt) * en + wt * em          # direction (n,m)
    elev_mn = (DONE - (DONE - wt)) * em + (DONE - wt) * en  # direction (m,n)
    rhsterm_nm = -cond * drho * elev_nm
    rhsterm_mn = cond * drho * elev_mn

    if buy.iform == 1:
        # lag h to the rhs: hphi is the same in both directions
        hphi = (DONE - wt) * head[n] + wt * head[m]
        rhsterm_nm = rhsterm_nm + cond * hphi * drho
        rhsterm_mn = rhsterm_mn - cond * hphi * drho
    else:
        # iform 2: lhs corrections (asymmetric matrix)
        diag = diag.at[n].add(cond * (DONE - wt) * drho)
        offf = offf.at[dtopo.slot_nm].add(cond * wt * drho)
        diag = diag.at[m].add(-cond * wt * drho)
        offf = offf.at[dtopo.slot_mn].add(-cond * (DONE - wt) * drho)

    rhs = rhs.at[n].add(-rhsterm_nm)
    rhs = rhs.at[m].add(-rhsterm_mn)
    return diag, offf.reshape(N, K), rhs


def edge_flow_correction(dtopo, buy: BuyData, dense, cond, sat, top, bot,
                         ibound, head):
    """ΔQ per canonical half-edge (positive into cell n) — the buy_cq
    flowja correction (gwf-buy.f90 buy_cq): without it the transport
    velocity field is non-conservative and the density coupling diverges.

    iform 0:   ΔQ = cond·(ρ̄−ρref)/ρref·(elev_m − elev_n)
    iform 1/2: ΔQ = cond·(rhoterm−1)·(h_m − h_n)
                    + cond·Δρ'·(hphi − elev_nm)
    """
    n, m = dtopo.edge_n, dtopo.edge_m
    act = (ibound[n] != 0) & (ibound[m] != 0)
    cond = jnp.where(act, cond, DZERO)
    wt = dtopo.cl1 / jnp.where(dtopo.cl1 + dtopo.cl2 > 0,
                               dtopo.cl1 + dtopo.cl2, DONE)
    dn, dm = dense[n], dense[m]
    elev = bot + 0.5 * sat * (top - bot)
    en, em = elev[n], elev[m]
    if buy.iform == 0:
        avgdense = wt * dn + (DONE - wt) * dm
        return cond * (avgdense - buy.denseref) / buy.denseref * (em - en)
    rhon = dn / buy.denseref
    rhom = dm / buy.denseref
    drho = rhom - rhon
    rhoterm = wt * rhon + (DONE - wt) * rhom
    elev_nm = (DONE - wt) * en + wt * em
    hphi = (DONE - wt) * head[n] + wt * head[m]
    return (cond * (rhoterm - DONE) * (head[m] - head[n])
            + cond * drho * (hphi - elev_nm))
