"""GWT transport tests: advection schemes, storage, decay, sorption, SSM.

Mirrors the role of reference autotests test_gwt_adv01 / test_gwt_mst /
test_gwt_dsp01.  The transport system with upstream/central weighting is
linear per step, so scipy direct solves of the same assembled system act as
an exact oracle (same strategy as the flow tests).
"""

import numpy as np
import scipy.sparse.linalg as spla

import jax.numpy as jnp

from modflow6_tpu.models.discretization import DisGrid
from modflow6_tpu.models.gwf.builder import build_gwf
from modflow6_tpu.models.gwt.builder import CoupledGwfGwt, build_gwt
from modflow6_tpu.models.gwt import mst as mst_mod
from modflow6_tpu.ops.system import apply_dirichlet, to_scipy_csr
from modflow6_tpu.solution import ImsSettings


def make_flow_column(ncol=40, q=1.0, delr=10.0):
    """1D column with fixed heads driving uniform flow left→right."""
    g = DisGrid.create(1, 1, ncol, delr=delr, delc=1.0, top=1.0,
                       botm=np.zeros((1, 1, ncol)))
    k = 10.0
    # head drop to drive specific discharge q per unit width: q = K*b*dh/dx
    dh = q * (ncol - 1) * delr / (k * 1.0)
    gwf = build_gwf("flow", g, k=k, strt=10.0,
                    chd=[(0, 10.0 + dh), (ncol - 1, 10.0)])
    return g, gwf


def step_transport(gwt, sol, fields, conc, delt, nsteps):
    concs = [np.asarray(conc)]
    for _ in range(nsteps):
        gwt.set_flows(fields)
        conc, info, _ = sol.solve_timestep(conc, delt, iss=False, pkgs=fields)
        assert info.converged
        concs.append(np.asarray(conc))
    return jnp.asarray(concs[-1]), concs


def tight(acc="bicgstab"):
    return ImsSettings(outer_dvclose=1e-10, outer_maximum=50,
                       inner_dvclose=1e-12, inner_rclose=1e-10,
                       inner_maximum=2000, linear_acceleration=acc)


def solve_flow_and_fields(g, gwf, delt=1.0):
    from modflow6_tpu.models.gwt.fmi import from_gwf_step
    from modflow6_tpu.solution import NumericalSolution
    sol = NumericalSolution(gwf, tight("cg"))
    head, info, aux = sol.solve_timestep(gwf.strt, delt, iss=True)
    assert info.converged
    fields = from_gwf_step(gwf, head, head, aux["ibound"], aux["cond"],
                           delt, True, ssm_spec={})
    return head, fields


def test_advection_upstream_vs_direct():
    from modflow6_tpu.solution import NumericalSolution
    g, gwf = make_flow_column()
    head, fields = solve_flow_and_fields(g, gwf)
    gwt = build_gwt("t", g, porosity=0.3, strt=0.0, scheme="upstream",
                    cnc=[(0, 1.0)])
    sol = NumericalSolution(gwt, tight())
    gwt.set_flows(fields)

    delt, nsteps = 5.0, 8
    conc = jnp.asarray(gwt.strt)
    for _ in range(nsteps):
        conc_old = conc
        conc, info, _ = sol.solve_timestep(conc_old, delt, iss=False,
                                           pkgs=fields)
        assert info.converged
        # oracle: direct solve of the same linear system
        ib, c0 = gwt.boundary_state(conc_old)
        diag, off, rhs = gwt.assemble(c0, c0, ib, delt, False, fields)
        active = jnp.where(ib > 0, 1, jnp.where(ib < 0, -1, 0))
        d2, o2, r2 = apply_dirichlet(gwt.dtopo.nbr, active, diag, off, rhs,
                                     c0, symmetric=False)
        amat = to_scipy_csr(gwt.topo, np.asarray(d2), np.asarray(o2))
        x = spla.spsolve(amat.tocsc(), np.asarray(r2))
        np.testing.assert_allclose(np.asarray(conc), x, atol=1e-9)

    c = np.asarray(conc)
    # front props downstream, concentrations bounded, monotone for upstream
    assert c[0] == 1.0
    assert np.all(c <= 1.0 + 1e-9) and np.all(c >= -1e-9)
    assert np.all(np.diff(c) <= 1e-9)


def test_advection_mass_balance():
    from modflow6_tpu.solution import NumericalSolution
    g, gwf = make_flow_column(ncol=30)
    head, fields = solve_flow_and_fields(g, gwf)
    gwt = build_gwt("t", g, porosity=0.25, strt=0.0, scheme="upstream",
                    cnc=[(0, 1.0)])
    sol = NumericalSolution(gwt, tight())
    delt, nsteps = 2.0, 10
    conc = jnp.asarray(gwt.strt)
    q = float(np.asarray(fields.q_edge)[0])  # uniform flow
    outflux_cum = 0.0
    for _ in range(nsteps):
        conc, info, _ = sol.solve_timestep(conc, delt, iss=False, pkgs=fields)
        assert info.converged
        # mass leaves through the last CHD? no — last cell is CHD head;
        # outflow happens via the chd cell: flux * conc at second-last cell
    c = np.asarray(conc)
    # total mass in storage = sum(c * V * theta * sat)
    vol = 10.0 * 1.0 * 1.0 * 0.25
    mass = float((c[1:-1] * vol).sum())
    # influx = |q| * c_upstream(=1 at cell 0 chd) * t, minus what's still
    # upstream of the front — just check mass is positive and bounded by
    # influx
    influx = abs(q) * 1.0 * delt * nsteps
    assert 0 < mass <= influx + 1e-6


def test_tvd_bounded_and_sharper():
    from modflow6_tpu.solution import NumericalSolution
    g, gwf = make_flow_column(ncol=60)
    head, fields = solve_flow_and_fields(g, gwf)
    results = {}
    for scheme in ("upstream", "tvd"):
        gwt = build_gwt("t", g, porosity=0.3, strt=0.0, scheme=scheme,
                        cnc=[(0, 1.0)])
        sol = NumericalSolution(gwt, tight())
        conc = jnp.asarray(gwt.strt)
        for _ in range(12):
            conc, info, _ = sol.solve_timestep(conc, 3.0, iss=False,
                                               pkgs=fields)
            assert info.converged
        results[scheme] = np.asarray(conc)
    c_up, c_tvd = results["upstream"], results["tvd"]
    assert np.all(c_tvd <= 1.0 + 1e-6) and np.all(c_tvd >= -1e-6)
    # TVD front is sharper: steeper maximum gradient
    assert np.max(np.abs(np.diff(c_tvd))) > np.max(np.abs(np.diff(c_up)))


def test_first_order_decay_closed_cell():
    from modflow6_tpu.solution import NumericalSolution
    g = DisGrid.create(1, 1, 1, 1.0, 1.0, 1.0, np.zeros((1, 1, 1)))
    gwf = build_gwf("f", g, k=1.0, strt=0.5)
    head, fields = solve_flow_and_fields(g, gwf)
    lam = 0.05
    gwt = build_gwt("t", g, porosity=0.4, strt=1.0,
                    decay=(mst_mod.DECAY_FIRST_ORDER, lam))
    sol = NumericalSolution(gwt, tight())
    conc = jnp.asarray(gwt.strt)
    delt, nsteps = 0.5, 20
    for _ in range(nsteps):
        conc, info, _ = sol.solve_timestep(conc, delt, iss=False, pkgs=fields)
        assert info.converged
    # backward-Euler decay: c_n = c0 / (1 + lam*dt)^n
    expected = 1.0 / (1.0 + lam * delt) ** nsteps
    np.testing.assert_allclose(np.asarray(conc)[0], expected, rtol=1e-10)


def test_linear_sorption_retardation():
    from modflow6_tpu.solution import NumericalSolution
    g, gwf = make_flow_column(ncol=60)
    head, fields = solve_flow_and_fields(g, gwf)
    theta = 0.3
    rhob, kd = 1.6, 0.1875  # R = 1 + rhob*kd/theta = 2
    R = 1 + rhob * kd / theta

    def front_position(sorption):
        gwt = build_gwt("t", g, porosity=theta, strt=0.0, scheme="upstream",
                        cnc=[(0, 1.0)], sorption=sorption)
        sol = NumericalSolution(gwt, tight())
        conc = jnp.asarray(gwt.strt)
        for _ in range(10):
            conc, info, _ = sol.solve_timestep(conc, 4.0, iss=False,
                                               pkgs=fields)
            assert info.converged
        c = np.asarray(conc)
        # center of mass of the front
        return float((c[1:] * np.arange(1, len(c))).sum() / max(c[1:].sum(), 1e-12))

    x_plain = front_position(None)
    x_sorb = front_position(dict(isrb=mst_mod.SORPTION_LINEAR,
                                 bulk_density=rhob, distcoef=kd))
    np.testing.assert_allclose(x_plain / x_sorb, R, rtol=0.2)


def test_coupled_gwf_gwt_ssm():
    # recharge carries solute into the aquifer; coupled stepping
    n = 10
    g = DisGrid.create(1, 1, n, 10.0, 10.0, 10.0, np.zeros((1, 1, n)))
    gwf = build_gwf("f", g, k=5.0, strt=5.0,
                    storage={"ss": 1e-4, "iconvert": 0},
                    chd=[(n - 1, 5.0)], rch=[(j, 1e-3) for j in range(n)])
    gwt = build_gwt("t", g, porosity=0.3, strt=0.0, scheme="upstream",
                    ssm_spec={"RCH": 2.0})
    coupled = CoupledGwfGwt(gwf, gwt)
    head = jnp.asarray(gwf.strt)
    conc = jnp.asarray(gwt.strt)
    for kstp in range(1, 6):
        head, conc, finfo, tinfo = coupled.step(head, conc, 10.0, kstp)
        assert finfo.converged and tinfo.converged
    c = np.asarray(conc)
    assert np.all(c > 0)           # recharge mass entered everywhere
    assert np.all(c <= 2.0 + 1e-6)  # bounded by source concentration
