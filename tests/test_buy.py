"""BUY (variable-density) package tests.

Analytic anchor: static equilibrium of a salt layer under fresh water.
For the hydraulic-head formulation (gwf-buy.f90 calchhterms) the vertical
flow between stacked nodes n (top) and m (bottom) is

    q = cond·[ρ̄'·(h_m − h_n) + Δρ'·(hphi − elev_nm)]

with ρ̄' = wt·ρ'_n + (1−wt)·ρ'_m, Δρ' = ρ'_m − ρ'_n (primes = normalized
by denseref), hphi = (1−wt)·h_n + wt·h_m, elev_nm = (1−wt)·elev_n +
wt·elev_m.  Zero flow with h_n pinned gives a closed-form h_m.
"""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from modflow6_tpu.models.discretization import DisGrid
from modflow6_tpu.models.gwf.builder import build_gwf
from modflow6_tpu.solution import ImsSettings, NumericalSolution


def tight(acc="bicgstab"):
    return ImsSettings(outer_dvclose=1e-10, outer_maximum=200,
                       inner_dvclose=1e-12, inner_rclose=1e-11,
                       inner_maximum=2000, linear_acceleration=acc)


@pytest.mark.parametrize("iform", [1, 2])
def test_static_density_equilibrium(iform):
    """Two stacked cells, salt below fresh: solved bottom head matches the
    closed-form equilibrium; no spurious flow."""
    denseref, drhodc = 1000.0, 0.7
    conc_bot = 35.0
    g = DisGrid.create(2, 1, 1, 10.0, 10.0, 20.0,
                       np.array([10.0, 0.0])[:, None, None]
                       * np.ones((2, 1, 1)))
    model = build_gwf("buy", g, k=1.0, strt=0.0, chd=[(0, 0.0)],
                      buy=dict(denseref=denseref, drhodc=drhodc,
                               crhoref=0.0, iform=iform))
    conc = jnp.asarray([0.0, conc_bot])
    pkgs = dataclasses.replace(model.packages, buy_conc=conc)
    sol = NumericalSolution(model, tight())
    head, info, _ = sol.solve_timestep(model.strt, delt=1.0, iss=True,
                                       pkgs=pkgs)
    assert info.converged
    hn = 0.0
    rho_n, rho_m = 1.0, (denseref + drhodc * conc_bot) / denseref
    wt = 0.5
    rhoterm = wt * rho_n + (1 - wt) * rho_m
    drho = rho_m - rho_n
    elev_n, elev_m = 15.0, 5.0
    elev_nm = (1 - wt) * elev_n + wt * elev_m
    # 0 = rhoterm·(hm − hn) + drho·((1−wt)·hn + wt·hm − elev_nm)
    hm = (rhoterm * hn - drho * ((1 - wt) * hn - elev_nm)) \
        / (rhoterm + drho * wt)
    np.testing.assert_allclose(float(head[1]), hm, atol=1e-9)


def test_buy_deactivates_without_conc():
    """No buy_conc supplied → plain freshwater solve (terms gated off)."""
    g = DisGrid.create(1, 1, 5, 10.0, 10.0, 10.0, np.zeros((1, 1, 5)))
    kw = dict(k=2.0, strt=5.0, chd=[(0, 6.0), (4, 4.0)])
    plain = build_gwf("p", g, **kw)
    withbuy = build_gwf("b", g, buy=dict(denseref=1000.0, drhodc=0.7),
                        **kw)
    s = tight("cg")
    h1, i1, _ = NumericalSolution(plain, s).solve_timestep(
        plain.strt, 1.0, iss=True)
    h2, i2, _ = NumericalSolution(withbuy, tight()).solve_timestep(
        withbuy.strt, 1.0, iss=True)
    assert i1.converged and i2.converged
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h1), atol=1e-9)


def test_henry_like_interface():
    """Coupled GWF(BUY)+GWT cross-section: fresh inflow left, salt CHD
    right.  The density field must drive salt landward along the bottom —
    bottom-row salinity extends further inland than top-row (the classic
    Henry interface shape)."""
    from modflow6_tpu.models.gwt.builder import build_gwt
    from modflow6_tpu.models.simulation import Simulation
    from modflow6_tpu.timing.tdis import StressPeriod, Tdis

    nlay, ncol = 10, 20
    dz, dx = 0.1, 0.1
    g = DisGrid.create(nlay, 1, ncol, dx, 1.0, 1.0,
                       np.linspace(1.0 - dz, 0.0, nlay)[:, None, None]
                       * np.ones((nlay, 1, ncol)))
    csalt = 35.0
    # sea boundary: rightmost column CHD at equivalent freshwater heads of
    # sea level 1.0 with salt water: hf = z + (rho/rhof)(hsea - z)
    rho_s = 1.0 + 0.7 * csalt / 1000.0
    zc = np.linspace(1.0 - dz / 2, dz / 2, nlay)
    chd = [(k * ncol + ncol - 1, float(zc[k] + rho_s * (1.0 - zc[k])))
           for k in range(nlay)]
    wel = [(k * ncol, 5.702 / nlay) for k in range(nlay)]  # fresh inflow
    model = build_gwf("henry", g, k=864.0, strt=1.0, chd=chd, wel=wel,
                      storage={"ss": 1e-5, "iconvert": 0},
                      buy=dict(denseref=1000.0, drhodc=0.7, crhoref=0.0,
                               iform=2))
    gwt = build_gwt("henryt", g, porosity=0.35, strt=0.0,
                    scheme="upstream", dsp={"diffc": 0.57024},
                    cnc=[(k * ncol + ncol - 1, csalt) for k in range(nlay)],
                    ssm_spec={"WEL": 0.0})
    tdis = Tdis((StressPeriod(0.5, 50, 1.0),))
    sim = Simulation(tdis, model, tight(), gwt=gwt, gwt_settings=tight())
    recs = sim.run()
    assert all(r.converged for r in recs)
    conc = sim.conc_records[-1].reshape(nlay, ncol)
    # interface slopes landward with depth: the 17.5 isochlor sits further
    # left at the bottom than at the top
    half = csalt / 2
    def extent(row):
        idx = np.where(row >= half)[0]
        return idx.min() if idx.size else ncol
    assert extent(conc[-1]) < extent(conc[0])
    # salt toe reaches inland along the bottom
    assert conc[-1, ncol // 2] > 1.0


def test_vsc_scales_conductance():
    """VSC: cold/viscous water halves effective K — the flow through a
    1-D column with uniform conc c where visc(c)=2·viscref must equal the
    plain model's flow with K/2 (update_k_with_vsc semantics)."""
    g = DisGrid.create(1, 1, 6, 10.0, 10.0, 10.0, np.zeros((1, 1, 6)))
    kw = dict(strt=5.0, chd=[(0, 6.0), (5, 4.0)])
    base = build_gwf("vref", g, k=1.0, **kw)       # K already halved
    model = build_gwf("v", g, k=2.0,
                      vsc=dict(viscref=1.0, dviscdc=0.1, cviscref=0.0),
                      **kw)
    conc = jnp.full(6, 10.0)   # visc = 1 + 0.1*10 = 2 → ratio 0.5
    pkgs = dataclasses.replace(model.packages, buy_conc=conc)
    s = tight()
    h1, i1, a1 = NumericalSolution(base, tight("cg")).solve_timestep(
        base.strt, 1.0, iss=True)
    h2, i2, a2 = NumericalSolution(model, s).solve_timestep(
        model.strt, 1.0, iss=True, pkgs=pkgs)
    assert i1.converged and i2.converged
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h1), atol=1e-9)
    # uniform ratio → heads identical; flows must equal the K/2 model's
    q1 = np.asarray(base.edge_flows(h1, a1["ibound"]))
    q2 = np.asarray(model.edge_flows(h2, a2["ibound"], pkgs=pkgs))
    np.testing.assert_allclose(q2, q1, atol=1e-9)


def test_solution_group_mxiter_density_coupling():
    """SOLUTIONGROUP MXITER > 1: the flow re-solves at the updated
    concentration until the density coupling settles (sgp_ca role);
    the converged state is self-consistent (re-solving flow at the
    final conc changes heads below the group tolerance)."""
    import dataclasses as dc
    import jax.numpy as jnp
    from modflow6_tpu.models.simulation import Simulation
    from modflow6_tpu.models.gwt.builder import build_gwt
    from modflow6_tpu.models.gwf.buy import make_buy
    from modflow6_tpu.timing.tdis import StressPeriod, Tdis

    def run_with(mxiter):
        g = DisGrid.create(1, 1, 12, 10.0, 10.0, 10.0,
                           np.zeros((1, 1, 12)))
        model = build_gwf("b", g, k=5.0, strt=8.0,
                          storage={"ss": 1e-4, "iconvert": 0},
                          chd=[(0, 8.2), (11, 8.0)])
        model.buy = make_buy(denseref=1000.0, drhodc=[0.7],
                             crhoref=[0.0])
        gwt = build_gwt("t", g, porosity=0.3, strt=0.0, cnc=[(0, 30.0)])
        tdis = Tdis((StressPeriod(200.0, 4, 1.0),))
        sim = Simulation(tdis, model, tight(), gwt=gwt)
        sim.sgp_mxiter = mxiter
        recs = sim.run()
        assert all(r.converged for r in recs)
        # self-consistency error: re-solve flow at the final conc
        pkgs = dc.replace(model.packages, buy_conc=sim.conc)
        h2, info, _ = sim.solution.solve_timestep(
            jnp.asarray(recs[-2].head), 50.0, kstp=4, iss=False,
            pkgs=pkgs)
        assert info.converged
        err = float(np.max(np.abs(np.asarray(h2) - recs[-1].head)))
        assert np.max(np.asarray(sim.conc)) > 1.0   # solute intruded
        return err

    err_lagged = run_with(1)
    err_group = run_with(10)
    # the group Picard shrinks the flow/density inconsistency
    assert err_group < 0.3 * err_lagged
