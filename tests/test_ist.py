"""IST (dual-domain) transport tests.

Batch-reactor anchor: with no flow, no decay, no sorption, the coupled
mobile/immobile balance

    θm·V·dc/dt  = −ζV·(c − cim)
    θim·V·dcim/dt =  ζV·(c − cim)

conserves θm·c + θim·cim exactly (also true of the discrete backward-Euler
scheme, gwt-ist.f90 get_ddterm/get_hcofrhs/get_ddconc) and relaxes to the
mass-weighted equilibrium c∞ = θm·c0/(θm+θim).
"""

import dataclasses

import numpy as np

import jax.numpy as jnp

from modflow6_tpu.models.discretization import DisGrid
from modflow6_tpu.models.gwt.builder import build_gwt
from modflow6_tpu.models.gwt import ist as ist_mod
from modflow6_tpu.models.gwt.fmi import FlowFields
from modflow6_tpu.solution import ImsSettings, NumericalSolution


def no_flow_fields(N, E, cim):
    z = jnp.zeros
    return FlowFields(q_edge=z(E), sat=jnp.ones(N), sat_old=jnp.ones(N),
                      strg_ss=z(N), strg_sy=z(N),
                      bound_q=z(1), bound_node=jnp.zeros(1, jnp.int32),
                      bound_mask=jnp.zeros(1, bool), bound_conc=z(1),
                      cim=cim)


def test_batch_dual_domain_exchange():
    thetam, thetaim, zeta = 0.25, 0.10, 0.3
    c0 = 1.0
    g = DisGrid.create(1, 1, 2, 1.0, 1.0, 1.0, np.zeros((1, 1, 2)))
    gwt = build_gwt("ist", g, porosity=thetam, strt=c0,
                    ist=dict(thetaim=thetaim, zetaim=zeta))
    sol = NumericalSolution(gwt, ImsSettings(
        outer_dvclose=1e-10, inner_dvclose=1e-12, inner_rclose=1e-12,
        inner_maximum=200, linear_acceleration="bicgstab"))
    E = gwt.dtopo.edge_n.shape[0]
    conc = jnp.asarray(gwt.strt)
    cim = gwt.cim
    delt = 0.5
    ib = jnp.ones(2, jnp.int32)
    for _ in range(60):
        fields = no_flow_fields(2, E, cim)
        gwt.set_flows(fields)
        conc_new, info, _ = sol.solve_timestep(conc, delt, iss=False,
                                               pkgs=fields)
        assert info.converged
        cim = ist_mod.ist_update(gwt.ist, fields.sat, gwt.area, gwt.top,
                                 gwt.bot, ib, conc, cim, conc_new, delt)
        conc = conc_new
        # exact discrete mass conservation per step
        total = thetam * np.asarray(conc) + thetaim * np.asarray(cim)
        np.testing.assert_allclose(total, thetam * c0, rtol=1e-9)
    ceq = thetam * c0 / (thetam + thetaim)
    np.testing.assert_allclose(np.asarray(conc), ceq, atol=1e-4)
    np.testing.assert_allclose(np.asarray(cim), ceq, atol=1e-4)


def test_ist_decay_depletes_mass():
    """First-order decay in the immobile domain removes mass from the
    coupled system (idcy=1 path)."""
    g = DisGrid.create(1, 1, 2, 1.0, 1.0, 1.0, np.zeros((1, 1, 2)))
    gwt = build_gwt("istd", g, porosity=0.25, strt=1.0,
                    ist=dict(thetaim=0.1, zetaim=0.5, decay=0.2, idcy=1))
    sol = NumericalSolution(gwt, ImsSettings(
        outer_dvclose=1e-10, inner_dvclose=1e-12, inner_rclose=1e-12,
        inner_maximum=200, linear_acceleration="bicgstab"))
    E = gwt.dtopo.edge_n.shape[0]
    conc, cim = jnp.asarray(gwt.strt), gwt.cim
    ib = jnp.ones(2, jnp.int32)
    masses = []
    for _ in range(20):
        fields = no_flow_fields(2, E, cim)
        gwt.set_flows(fields)
        conc_new, info, _ = sol.solve_timestep(conc, 0.5, iss=False,
                                               pkgs=fields)
        assert info.converged
        cim = ist_mod.ist_update(gwt.ist, fields.sat, gwt.area, gwt.top,
                                 gwt.bot, ib, conc, cim, conc_new, 0.5)
        conc = conc_new
        masses.append(float(0.25 * conc[0] + 0.1 * cim[0]))
    assert all(np.diff(masses) < 0), "decay must deplete total mass"
    assert masses[-1] < masses[0] * 0.9


def test_ist_nonlinear_isotherms_equilibrate():
    """Freundlich and Langmuir immobile isotherms: the mobile↔immobile
    transfer still equilibrates cim → c (the isotherm only changes the
    storage capacity), and the effective kd matches the closed forms."""
    import jax.numpy as jnp
    from modflow6_tpu.models.gwt import ist as ist_mod

    n = 1
    sat = jnp.ones(n)
    area = jnp.ones(n) * 100.0
    top, bot = jnp.ones(n) * 10.0, jnp.zeros(n)
    ib = jnp.ones(n, int)
    c = jnp.full(n, 2.5)
    for isrb, kd_expect in (
            (2, 0.8 * 2.5 ** (0.7 - 1.0)),           # Kf c^(a-1)
            (3, (0.6 * 1.2) / (1.0 + 0.6 * 2.5))):   # Kl sbar/(1+Kl c)
        ist = ist_mod.make_ist(n, thetaim=0.1, zetaim=0.5, volfrac=0.3,
                               bulk_density=1600.0,
                               distcoef=0.8 if isrb == 2 else 0.6,
                               sp2=0.7 if isrb == 2 else 1.2, isrb=isrb)
        kd = float(ist_mod.effective_kd(ist, c)[0])
        np.testing.assert_allclose(kd, kd_expect, rtol=1e-12)
        cim = jnp.zeros(n)
        for _ in range(400):
            cim = ist_mod.ist_update(ist, sat, area, top, bot, ib, c,
                                     cim, c, delt=100.0)
        np.testing.assert_allclose(np.asarray(cim), 2.5, rtol=1e-6)
        # at equilibrium the mobile-equation source vanishes
        hcof, rhs = ist_mod.ist_terms(ist, sat, area, top, bot, ib, c,
                                      cim, delt=100.0)
        np.testing.assert_allclose(float(hcof[0] * 2.5 - rhs[0]), 0.0,
                                   atol=1e-8)
