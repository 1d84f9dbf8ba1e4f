"""ADV: advection — upstream / central / TVD weighting.

Behavioral parity targets:
  - adv_fc / adv_weight  src/Model/TransportModel/tsp-adv.f90:193-229,504-539
  - advtvd / advqtvd     tsp-adv.f90:236-325
  - adv_cq               tsp-adv.f90:329-360

Vectorized over the symmetric-half edge list; both matrix rows of each
connection are filled in one pass.  The reference's central-weighting
convention (cl1/cl2 read from the symmetric array for both orientations)
is reproduced exactly.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...constants import C3D_VERTICAL, DHALF, DONE, DPREC, DTWO, DZERO

UPSTREAM = 0
CENTRAL = 1
TVD = 2


def _weights(dtopo, iadvwt, q_nm, top, bot):
    """Per-edge omega for row n and row m (reference adv_weight)."""
    n, m = dtopo.edge_n, dtopo.edge_m
    if iadvwt == CENTRAL:
        is_vert = dtopo.ihc == C3D_VERTICAL
        thk_n = DHALF * (top[n] - bot[n])
        thk_m = DHALF * (top[m] - bot[m])
        # horizontal: both orientations read (cl1, cl2) from the symmetric
        # arrays, so omega is cl2/(cl1+cl2) for both rows (reference quirk);
        # vertical: per-row thicknesses swap properly.
        om_h = dtopo.cl2 / (dtopo.cl1 + dtopo.cl2)
        om_n = jnp.where(is_vert, thk_m / (thk_n + thk_m), om_h)
        om_m = jnp.where(is_vert, thk_n / (thk_n + thk_m), om_h)
        return om_n, om_m
    # upstream (also the implicit part of TVD)
    om_n = jnp.where(q_nm > DZERO, DZERO, DONE)
    om_m = jnp.where(-q_nm > DZERO, DZERO, DONE)
    return om_n, om_m


def assemble(dtopo, iadvwt, fields, ibound, top, bot, eqnsclfac=1.0):
    """adv_fc matrix terms → (diag_add[N], off_add[N*K flat], as updates).

    Returns (diag, off_flat) contributions to ADD into the system.
    """
    N, K = dtopo.nodes, dtopo.max_degree
    n, m = dtopo.edge_n, dtopo.edge_m
    act = (ibound[n] != 0) & (ibound[m] != 0)
    q_nm = jnp.where(act, fields.q_edge * eqnsclfac, DZERO)
    om_n, om_m = _weights(dtopo, iadvwt, q_nm, top, bot)

    q_mn = -q_nm
    diag = jnp.zeros(N).at[n].add(q_nm * om_n).at[m].add(q_mn * om_m)
    off = jnp.zeros(N * K)
    off = off.at[dtopo.slot_nm].add(q_nm * (DONE - om_n))
    off = off.at[dtopo.slot_mn].add(q_mn * (DONE - om_m))
    return diag, off.reshape(N, K)


def tvd_rhs(dtopo, fields, ibound, cnew, eqnsclfac=1.0):
    """TVD limiter rhs correction (advtvd, tsp-adv.f90:236-264).

    Needs, per node, the neighbor with the largest inflow (the
    second-upstream cell): computed with one masked ELL reduction.
    """
    N, K = dtopo.nodes, dtopo.max_degree
    n, m = dtopo.edge_n, dtopo.edge_m

    # per-slot inflow into each node + edge length through each slot
    inflow = jnp.zeros(N * K)
    inflow = inflow.at[dtopo.slot_nm].add(jnp.where(ibound[m] != 0,
                                                    fields.q_edge, DZERO))
    inflow = inflow.at[dtopo.slot_mn].add(jnp.where(ibound[n] != 0,
                                                    -fields.q_edge, DZERO))
    el = jnp.zeros(N * K)
    el = el.at[dtopo.slot_nm].set(dtopo.cl1 + dtopo.cl2)
    el = el.at[dtopo.slot_mn].set(dtopo.cl1 + dtopo.cl2)
    inflow = inflow.reshape(N, K)
    el = el.reshape(N, K)
    best = jnp.argmax(inflow, axis=1)
    rows = jnp.arange(N)
    qmax = inflow[rows, best]
    i2up_all = dtopo.nbr[rows, best]        # second-upstream node per node
    el2_all = el[rows, best]
    has2 = qmax > DZERO

    # per-edge TVD flux correction
    q = fields.q_edge
    ups_is_m = q > DZERO                     # positive into n → m upstream
    iup = jnp.where(ups_is_m, m, n)
    idn = jnp.where(ups_is_m, n, m)
    elupdn = dtopo.cl1 + dtopo.cl2
    i2up = i2up_all[iup]
    el2 = el2_all[iup]
    valid = has2[iup] & (ibound[n] != 0) & (ibound[m] != 0)

    cdiff = jnp.abs(cnew[idn] - cnew[iup])
    denom = jnp.where(cdiff > DPREC, cnew[idn] - cnew[iup], DONE)
    smooth = jnp.where(
        cdiff > DPREC,
        (cnew[iup] - cnew[i2up]) / jnp.where(el2 != 0, el2, DONE)
        * elupdn / denom,
        DZERO)
    alim = DTWO * smooth / (DONE + smooth)
    qtvd = jnp.where(valid & (smooth > DZERO),
                     DHALF * alim * q * (cnew[idn] - cnew[iup]) * eqnsclfac,
                     DZERO)
    # rhs(n) -= qtvd ; rhs(m) += qtvd
    rhs = jnp.zeros(N).at[n].add(-qtvd).at[m].add(qtvd)
    return rhs


def adv_dtmax(dtopo, fields, ibound, porosity, area, top, bot,
              ats_percel=1.0):
    """Courant stability limit for ATS (reference adv_dt,
    tsp-adv.f90:128-187): per active cell,
    dt = V·sat·θ / max(Σ inflow, Σ outflow), scaled by ats_percel;
    returns the minimum over cells (inf when no flow)."""
    import jax.numpy as jnp
    n, m = dtopo.edge_n, dtopo.edge_m
    q = fields.q_edge   # positive into n
    act_edge = (ibound[n] != 0) & (ibound[m] != 0)
    q = jnp.where(act_edge, q, 0.0)
    N = ibound.shape[0]
    pos = jnp.zeros(N).at[n].add(jnp.maximum(q, 0.0)) \
        .at[m].add(jnp.maximum(-q, 0.0))
    neg = jnp.zeros(N).at[n].add(jnp.maximum(-q, 0.0)) \
        .at[m].add(jnp.maximum(q, 0.0))
    flowmax = jnp.maximum(pos, neg)
    vol = area * (top - bot) * fields.sat * porosity
    act = (ibound != 0) & (flowmax > 1e-300)
    dt = jnp.where(act, vol / jnp.where(flowmax > 0, flowmax, 1.0),
                   jnp.inf)
    return jnp.min(dt) * ats_percel
