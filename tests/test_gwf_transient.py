"""Transient GWF tests: storage terms, time stepping, budgets.

Mirrors the role of reference autotests test_gwf_sto01 / test_gwf_newton01.
"""

import numpy as np
from scipy.special import erfc

from modflow6_tpu.models.discretization import DisGrid
from modflow6_tpu.models.gwf.builder import build_gwf
from modflow6_tpu.models.simulation import Simulation
from modflow6_tpu.solution import ImsSettings
from modflow6_tpu.timing import StressPeriod, Tdis


def settings():
    return ImsSettings(outer_dvclose=1e-8, outer_maximum=100,
                       inner_dvclose=1e-10, inner_rclose=1e-9,
                       inner_maximum=1000)


def test_tdis_step_lengths():
    p = StressPeriod(perlen=10.0, nstp=5, tsmult=1.5)
    dts = p.step_lengths()
    assert abs(dts.sum() - 10.0) < 1e-12
    np.testing.assert_allclose(dts[1:] / dts[:-1], 1.5)
    dt0 = 10.0 * 0.5 / (1.5**5 - 1.0)
    assert abs(dts[0] - dt0) < 1e-12


def test_1d_confined_diffusion_vs_analytic():
    # semi-infinite aquifer, initial h=0, boundary suddenly raised to 1 at x=0
    # h(x,t) = erfc(x / (2 sqrt(D t))), D = T/S
    ncol = 200
    dx = 5.0
    k, b, ss = 10.0, 10.0, 1e-1
    T = k * b
    S = ss * b
    D = T / S
    g = DisGrid.create(1, 1, ncol, delr=dx, delc=1.0, top=b,
                       botm=np.zeros((1, 1, ncol)))
    m = build_gwf("tr1", g, k=k, strt=0.0,
                  storage={"ss": ss, "iconvert": 0},
                  chd=[(0, 1.0)])
    tdis = Tdis((StressPeriod(perlen=200.0, nstp=100, tsmult=1.0),))
    sim = Simulation(tdis, m, settings(), transient=[True])
    recs = sim.run()
    assert all(r.converged for r in recs)
    t = 200.0
    xc = (np.arange(ncol) + 0.5) * dx
    # shift: the CHD cell center is at x=dx/2 where h=1
    analytic = erfc((xc - xc[0]) / (2.0 * np.sqrt(D * t)))
    h = recs[-1].head
    # front must not have reached the far boundary
    assert h[-1] < 1e-4
    np.testing.assert_allclose(h, analytic, atol=3e-3)


def test_budget_discrepancy_small():
    # transient drawdown with a well; percent discrepancy must be ~0
    n = 15
    g = DisGrid.create(1, n, n, delr=10.0, delc=10.0, top=10.0,
                       botm=np.zeros((1, n, n)))
    m = build_gwf("tr2", g, k=1.0, strt=5.0,
                  storage={"ss": 1e-4, "iconvert": 0},
                  chd=[(i * n, 5.0) for i in range(n)],
                  wel=[(n * n // 2, -20.0)])
    tdis = Tdis((StressPeriod(perlen=10.0, nstp=10, tsmult=1.2),))
    sim = Simulation(tdis, m, settings(), transient=[True])
    recs = sim.run()
    assert all(r.converged for r in recs)
    assert abs(sim.budget.percent_discrepancy()) < 1e-6


def test_unconfined_sy_mass_balance():
    # closed unconfined bucket with recharge: water table rises by
    # recharge*t/sy (specific yield controls)
    g = DisGrid.create(1, 1, 1, delr=100.0, delc=100.0, top=50.0,
                       botm=np.zeros((1, 1, 1)))
    rch_rate = 0.01
    sy = 0.2
    m = build_gwf("tr3", g, k=1.0, strt=10.0, icelltype=1, newton=True,
                  storage={"ss": 0.0, "sy": sy, "iconvert": 1},
                  rch=[(0, rch_rate)])
    s = ImsSettings(outer_dvclose=1e-10, outer_maximum=200,
                    inner_dvclose=1e-12, inner_rclose=1e-10,
                    inner_maximum=100, linear_acceleration="bicgstab")
    tdis = Tdis((StressPeriod(perlen=100.0, nstp=20, tsmult=1.0),))
    sim = Simulation(tdis, m, s, transient=[True])
    recs = sim.run()
    assert all(r.converged for r in recs)
    expected = 10.0 + rch_rate * 100.0 / sy
    np.testing.assert_allclose(recs[-1].head[0], expected, rtol=1e-6)  # smoothed saturation (eps=1e-6) shifts the exact balance


def test_steady_then_transient_periods():
    # period 1 steady (establish gradient), period 2 transient (relax after
    # boundary change) — exercises per-period iss switching
    ncol = 20
    g = DisGrid.create(1, 1, ncol, delr=10.0, delc=10.0, top=10.0,
                       botm=np.zeros((1, 1, ncol)))
    m = build_gwf("tr4", g, k=5.0, strt=5.0,
                  storage={"ss": 1e-3, "iconvert": 0},
                  chd=[(0, 8.0), (ncol - 1, 5.0)])
    tdis = Tdis((StressPeriod(1.0, 1), StressPeriod(50.0, 20)))
    sim = Simulation(tdis, m, settings(), transient=[False, True])
    recs = sim.run()
    assert all(r.converged for r in recs)
    # steady state is linear; transient relaxes towards the same profile
    lin = np.linspace(8.0, 5.0, ncol)
    np.testing.assert_allclose(recs[0].head, lin, atol=1e-7)
    np.testing.assert_allclose(recs[-1].head, lin, atol=1e-6)


def test_hds_output_roundtrip(tmp_path):
    from modflow6_tpu.utils.binary import read_head_file
    ncol = 5
    g = DisGrid.create(1, 1, ncol, 1.0, 1.0, 1.0, np.zeros((1, 1, ncol)))
    m = build_gwf("tr5", g, k=1.0, strt=0.5,
                  storage={"ss": 1e-4, "iconvert": 0},
                  chd=[(0, 1.0), (ncol - 1, 0.0)])
    tdis = Tdis((StressPeriod(5.0, 3),))
    hds = tmp_path / "out.hds"
    sim = Simulation(tdis, m, settings(), transient=[True], hds_path=str(hds))
    recs = sim.run()
    data = read_head_file(str(hds))
    assert len(data) == 3  # one layer, three steps
    np.testing.assert_allclose(data[-1]["data"].reshape(-1), recs[-1].head)
    assert data[0]["kper"] == 1 and data[0]["kstp"] == 1


def test_evt_segmented_matches_hand_calc():
    """Segmented EVT (NSEG=2): hcof/rhs follow the evt_cf segloop math
    (gwf-evt.f90): proportions (pxdp=0.3, petm=0.5) — steeper ET decline
    in the upper 30% of the extinction depth."""
    import jax.numpy as jnp
    from modflow6_tpu.models.gwf import bnd
    from modflow6_tpu.models.gwf.builder import evt_data

    # cell with head 1.5 below surface, depth 10 → dfrac 0.15 (segment 1)
    evt = evt_data([(0, 10.0, 0.004, 10.0, 0.3, 0.5)])
    head = jnp.asarray([8.5])
    ib = jnp.ones(1, jnp.int32)
    area = jnp.asarray([100.0])
    hcof, rhs = bnd.evt_terms(evt, head, ib, area)
    c = 0.004 * 100.0
    # segment 1: pxdp1=0, petm1=1 → pxdp2=0.3, petm2=0.5
    thcof = -(1.0 - 0.5) * c / (0.3 * 10.0)
    trhs = thcof * (10.0 - 0.0) + 1.0 * c
    np.testing.assert_allclose(float(hcof[0]), thcof)
    np.testing.assert_allclose(float(rhs[0]), trhs)
    # deeper head → segment 2: dfrac 0.6
    hcof, rhs = bnd.evt_terms(evt, jnp.asarray([4.0]), ib, area)
    thcof = -(0.5 - 0.0) * c / ((1.0 - 0.3) * 10.0)
    trhs = thcof * (10.0 - 0.3 * 10.0) + 0.5 * c
    np.testing.assert_allclose(float(hcof[0]), thcof)
    np.testing.assert_allclose(float(rhs[0]), trhs)
    # q continuity at the breakpoint (h = s - 0.3*x)
    h_bp = jnp.asarray([10.0 - 3.0 - 1e-9])
    h_bp2 = jnp.asarray([10.0 - 3.0 + 1e-9])
    q1 = (lambda hc, r: float(hc[0] * h_bp[0] - r[0]))(
        *bnd.evt_terms(evt, h_bp, ib, area))
    q2 = (lambda hc, r: float(hc[0] * h_bp2[0] - r[0]))(
        *bnd.evt_terms(evt, h_bp2, ib, area))
    np.testing.assert_allclose(q1, q2, atol=1e-8)


def test_tvk_changes_conductivity_between_periods():
    """TVK: halving K in period 2 doubles the head gradient needed to
    carry the same well discharge (steady periods, gwf-tvk.f90 role)."""
    from modflow6_tpu.models.simulation import Simulation
    from modflow6_tpu.timing.tdis import StressPeriod, Tdis

    ncol = 9
    g = DisGrid.create(1, 1, ncol, 10.0, 10.0, 10.0, np.zeros((1, 1, ncol)))
    model = build_gwf("tvk", g, k=4.0, strt=5.0,
                      chd=[(0, 8.0)], wel=[(ncol - 1, -16.0)])
    tdis = Tdis((StressPeriod(1.0, 1, 1.0), StressPeriod(1.0, 1, 1.0)))
    sim = Simulation(tdis, model, ImsSettings(
        outer_dvclose=1e-9, inner_dvclose=1e-11, inner_rclose=1e-10,
        inner_maximum=500), transient=[False, False])
    sim.tvk = {2: [(j, "K", 2.0) for j in range(ncol)]}
    recs = sim.run()
    assert all(r.converged for r in recs)
    h1, h2 = recs[0].head, recs[1].head
    drop1 = h1[0] - h1[-1]
    drop2 = h2[0] - h2[-1]
    np.testing.assert_allclose(drop2, 2 * drop1, rtol=1e-8)


def test_tvs_changes_storage_between_periods():
    """TVS: smaller SS in period 2 speeds the transient response."""
    from modflow6_tpu.models.simulation import Simulation
    from modflow6_tpu.timing.tdis import StressPeriod, Tdis

    ncol = 9
    g = DisGrid.create(1, 1, ncol, 10.0, 10.0, 10.0, np.zeros((1, 1, ncol)))
    def build():
        return build_gwf("tvs", g, k=4.0, strt=5.0,
                         storage={"ss": 1e-2, "iconvert": 0},
                         chd=[(0, 8.0)])
    tdis = Tdis((StressPeriod(0.1, 1, 1.0), StressPeriod(0.1, 1, 1.0)))
    s = ImsSettings(outer_dvclose=1e-9, inner_dvclose=1e-11,
                    inner_rclose=1e-10, inner_maximum=500)
    base = Simulation(tdis, build(), s)
    recs0 = base.run()
    sim = Simulation(tdis, build(), s)
    sim.tvs = {2: [(j, "SS", 1e-5) for j in range(ncol)]}
    recs = sim.run()
    # with tiny storage the period-2 head jumps much closer to equilibrium
    assert recs[1].head[-1] > recs0[1].head[-1] + 0.1
