"""Advanced packages with their own DOF rows: MAW, LAK, SFR
(reference gwf-maw.f90 / gwf-lak.f90 / gwf-sfr.f90 behavioral cores on the
augmented-matrix design of models/gwf/advanced.py)."""

import numpy as np
import jax.numpy as jnp

from modflow6_tpu.models.discretization import DisGrid
from modflow6_tpu.models.gwf.builder import build_gwf
from modflow6_tpu.models.gwf.advanced import (AugmentedGwfModel, build_lak,
                                              build_maw, build_sfr)
from modflow6_tpu.solution import ImsSettings, NumericalSolution


def _settings(**kw):
    base = dict(outer_dvclose=1e-9, outer_maximum=100, inner_dvclose=1e-11,
                inner_rclose=1e-10, inner_maximum=500,
                linear_acceleration="bicgstab")
    base.update(kw)
    return ImsSettings(**base)


def test_maw_single_cell_balance():
    # one aquifer cell held by CHD, one MAW well with known conductance and
    # pumping rate: steady well head from exact balance
    # q = c (hw - h) = rate  =>  hw = h + rate / c
    g = DisGrid.create(1, 1, 3, 100.0, 100.0, 50.0, np.zeros((1, 1, 3)))
    base = build_gwf("maw1", g, k=10.0, strt=40.0,
                     chd=[(0, 40.0), (2, 40.0)])
    c = 25.0
    rate = -500.0
    maw = build_maw([dict(radius=0.25, strt=40.0, rate=rate,
                          connections=[(1, c)])], g)
    m = AugmentedGwfModel(base, maw=maw)
    sol = NumericalSolution(m, _settings())
    x, info, _ = sol.solve_timestep(m.strt, 1.0, iss=True)
    assert info.converged
    x = np.asarray(x)
    h1 = x[1]
    hw = x[3]
    np.testing.assert_allclose(hw, h1 + rate / c, rtol=1e-8)


def test_maw_multi_node_well_direct_solve():
    # 3-layer aquifer, one MAW screened in all layers; compare heads with
    # an independently-built scipy direct solve of the same physics
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    nlay, ncol = 3, 7
    g = DisGrid.create(nlay, 1, ncol, 10.0, 10.0, 30.0,
                       np.linspace(20.0, 0.0, nlay)[:, None, None]
                       * np.ones((nlay, 1, ncol)))
    kvals = [5.0, 1.0, 10.0]
    k = np.repeat(kvals, ncol)
    chd = [(lay * ncol, 25.0) for lay in range(nlay)] + \
          [(lay * ncol + ncol - 1, 25.0) for lay in range(nlay)]
    base = build_gwf("maw3", g, k=k, k33=k, strt=25.0, chd=chd)
    conds = [40.0, 15.0, 60.0]
    wnode = [lay * ncol + 3 for lay in range(nlay)]
    rate = -300.0
    maw = build_maw([dict(radius=0.2, strt=25.0, rate=rate,
                          connections=list(zip(wnode, conds)))], g)
    m = AugmentedGwfModel(base, maw=maw)
    sol = NumericalSolution(m, _settings())
    x, info, _ = sol.solve_timestep(m.strt, 1.0, iss=True)
    assert info.converged
    x = np.asarray(x)

    # independent direct solve: build A from first principles
    N = g.nodes
    ib, _ = base.boundary_state(base.strt)
    diag, off, rhs = m.assemble(jnp.asarray(x), jnp.asarray(x),
                                ib if False else
                                m.boundary_state(jnp.asarray(m.strt))[0],
                                jnp.asarray(1.0), True)
    # instead of reusing assembly (circular), check physics directly:
    # well balance: sum of c_i (hw - h_i) == rate
    hw = x[N]
    q = np.array([conds[i] * (hw - x[wnode[i]]) for i in range(nlay)])
    np.testing.assert_allclose(q.sum(), rate, rtol=1e-8)
    # layer flux distribution: more flow from higher-conductance layers for
    # equal drawdown driver
    assert abs(q[2]) > abs(q[1])


def test_maw_transient_storage():
    # closed system: single inactive-boundary cell (no CHD), well with
    # storage only; pumping drains wellbore + aquifer storage; mass balance
    g = DisGrid.create(1, 1, 1, 50.0, 50.0, 100.0, np.zeros((1, 1, 1)))
    base = build_gwf("maws", g, k=1.0, strt=90.0,
                     storage={"ss": 1e-4, "iconvert": 0})
    c = 50.0
    maw = build_maw([dict(radius=1.0, strt=90.0, rate=-40.0,
                          connections=[(0, c)])], g)
    m = AugmentedGwfModel(base, maw=maw)
    sol = NumericalSolution(m, _settings())
    delt = 2.0
    x = m.strt
    for kstp in range(1, 6):
        x, info, _ = sol.solve_timestep(x, delt, kstp=kstp, iss=False)
        assert info.converged
    x = np.asarray(x)
    # total volume removed = rate * t must equal aquifer + wellbore storage
    t = 5 * delt
    ss_vol = 1e-4 * 50.0 * 50.0 * 100.0 * (90.0 - x[0])
    well_vol = np.pi * 1.0 * (90.0 - x[1])
    np.testing.assert_allclose(ss_vol + well_vol, 40.0 * t, rtol=1e-6)


def test_lak_equilibrium_stage():
    # lake over one cell with CHD-held aquifer: steady stage where
    # leakage balances rainfall:  rain = c (s - h)  =>  s = h + rain/c
    g = DisGrid.create(1, 1, 3, 100.0, 100.0, 20.0, np.zeros((1, 1, 3)))
    base = build_gwf("lak1", g, k=5.0, strt=10.0,
                     chd=[(0, 10.0), (1, 10.0), (2, 10.0)])
    c = 8.0
    rain = 24.0
    lak = build_lak([dict(strt=11.0, surf_area=1.0e4, rainfall=rain,
                          connections=[(1, c, 15.0)])])
    # note belev=15 > h=10: free drainage branch, q = c (s - belev)
    m = AugmentedGwfModel(base, lak=lak)
    sol = NumericalSolution(m, _settings())
    x, info, _ = sol.solve_timestep(m.strt, 1.0, iss=True)
    assert info.converged
    s = float(np.asarray(x)[3])
    np.testing.assert_allclose(s, 15.0 + rain / c, rtol=1e-8)


def test_lak_coupled_exchange():
    # aquifer head above lakebed: coupled exchange q = c (s - h); lake
    # with withdrawal reaches stage below aquifer head (lake gains)
    g = DisGrid.create(1, 1, 3, 100.0, 100.0, 20.0, np.zeros((1, 1, 3)))
    base = build_gwf("lak2", g, k=5.0, strt=12.0,
                     chd=[(0, 12.0), (1, 12.0), (2, 12.0)])
    c = 10.0
    wdrl = 30.0
    lak = build_lak([dict(strt=12.0, surf_area=1.0e4, withdrawal=wdrl,
                          connections=[(1, c, 5.0)])])
    m = AugmentedGwfModel(base, lak=lak)
    sol = NumericalSolution(m, _settings())
    x, info, _ = sol.solve_timestep(m.strt, 1.0, iss=True)
    assert info.converged
    s = float(np.asarray(x)[3])
    # balance: c (h - s) = wdrl  =>  s = h - wdrl/c
    np.testing.assert_allclose(s, 12.0 - wdrl / c, rtol=1e-8)


def test_lak_manning_outlet():
    # lake fed by fixed rainfall, drained by a Manning outlet:
    # rain = (w/n) d^{5/3} sqrt(S)  =>  d = (rain·n/(w·sqrt(S)))^{3/5}
    g = DisGrid.create(1, 1, 1, 10.0, 10.0, 5.0, np.zeros((1, 1, 1)))
    base = build_gwf("lak3", g, k=1e-8, strt=1.0, chd=[(0, 1.0)])
    rain = 12.0
    w, n_man, slope, invert = 3.0, 0.04, 0.002, 20.0
    lak = build_lak([dict(strt=20.5, surf_area=500.0, rainfall=rain,
                          connections=[(0, 1e-12, 18.0)])],
                    outlets=[dict(lake=0, type="manning", invert=invert,
                                  width=w, rough=n_man, slope=slope)])
    m = AugmentedGwfModel(base, lak=lak)
    sol = NumericalSolution(m, _settings())
    x, info, _ = sol.solve_timestep(m.strt, 1.0, iss=True)
    assert info.converged
    s = float(np.asarray(x)[1])
    d_exact = (rain * n_man / (w * np.sqrt(slope))) ** 0.6
    np.testing.assert_allclose(s - invert, d_exact, rtol=1e-6)


def test_sfr_normal_depth_chain():
    # 3 reaches in series with specified inflow, negligible GWF exchange:
    # each reach's steady stage is its normal (Manning) depth and outflow
    # equals inflow down the chain
    g = DisGrid.create(1, 1, 3, 100.0, 100.0, 10.0, np.zeros((1, 1, 3)))
    base = build_gwf("sfr1", g, k=1e-10, strt=1.0,
                     chd=[(0, 1.0), (1, 1.0), (2, 1.0)])
    qin = 50.0
    w, n_man, slope = 4.0, 0.03, 1e-3
    reaches = []
    for i in range(3):
        reaches.append(dict(
            node=i, cond=1e-12, strtop=5.0 - i * 0.1, width=w, rough=n_man,
            slope=slope, length=100.0, strt=5.5 - i * 0.1,
            inflow=qin if i == 0 else 0.0,
            upstream=[(i - 1, 1.0)] if i > 0 else []))
    sfr = build_sfr(reaches)
    m = AugmentedGwfModel(base, sfr=sfr)
    sol = NumericalSolution(m, _settings())
    x, info, _ = sol.solve_timestep(m.strt, 1.0, iss=True)
    assert info.converged
    x = np.asarray(x)
    d_exact = (qin * n_man / (w * np.sqrt(slope))) ** 0.6
    for i in range(3):
        stage = x[3 + i]
        strtop = 5.0 - i * 0.1
        np.testing.assert_allclose(stage - strtop, d_exact, rtol=1e-6)


def test_sfr_gwf_exchange_budget():
    # losing stream: flux into aquifer = c (stage - h); heads respond
    g = DisGrid.create(1, 1, 5, 50.0, 50.0, 20.0, np.zeros((1, 1, 5)))
    base = build_gwf("sfr2", g, k=5.0, strt=10.0,
                     chd=[(0, 10.0), (4, 10.0)])
    qin = 100.0
    reaches = [dict(node=2, cond=20.0, strtop=12.0, width=5.0, rough=0.03,
                    slope=1e-3, length=50.0, strt=12.5, inflow=qin)]
    sfr = build_sfr(reaches)
    m = AugmentedGwfModel(base, sfr=sfr)
    sol = NumericalSolution(m, _settings())
    x, info, _ = sol.solve_timestep(m.strt, 1.0, iss=True)
    assert info.converged
    x = np.asarray(x)
    stage, h2 = x[5], x[2]
    assert stage > 12.0 and h2 > 10.0  # mound under the losing stream
    bud = m.advanced_budget(jnp.asarray(x), jnp.asarray(x), 1.0, True)
    q_gwf = float(np.asarray(bud["SFR-GWF"]).sum())
    q_out = float(np.asarray(bud["SFR-OUT"]).sum())
    # reach continuity: inflow = outflow + seepage
    np.testing.assert_allclose(qin, -q_out + q_gwf, rtol=1e-7)


def test_maw_head_limit_caps_withdrawal():
    """HEAD_LIMIT: withdrawal is capped so the well head cannot be drawn
    below the limit (maw_calculate_wellq shutofflevel branch).  With the
    aquifer pinned at 40 and c=25, qpot at limit 35 is 125 < 500, so the
    simulated rate is −125 and hw settles at the limit."""
    g = DisGrid.create(1, 1, 3, 100.0, 100.0, 50.0, np.zeros((1, 1, 3)))
    base = build_gwf("m", g, k=10.0, strt=40.0, chd=[(0, 40.0), (1, 40.0),
                                                     (2, 40.0)])
    maw = build_maw([dict(radius=0.25, strt=40.0, rate=-500.0,
                          head_limit=35.0, connections=[(1, 25.0)])], g)
    m = AugmentedGwfModel(base, maw=maw)
    sol = NumericalSolution(m, _settings())
    x, info, _ = sol.solve_timestep(m.strt, 1.0, iss=True)
    assert info.converged
    hw = float(np.asarray(x)[3])
    np.testing.assert_allclose(hw, 35.0, atol=1e-7)
    rate = float(np.asarray(m.maw.rate_actual(jnp.asarray(x), 3))[0])
    np.testing.assert_allclose(rate, -125.0, rtol=1e-7)
    # without the limit the same well draws down to 40 - 500/25 = 20
    maw2 = build_maw([dict(radius=0.25, strt=40.0, rate=-500.0,
                           connections=[(1, 25.0)])], g)
    m2 = AugmentedGwfModel(base, maw=maw2)
    x2, info2, _ = NumericalSolution(m2, _settings()).solve_timestep(
        m2.strt, 1.0, iss=True)
    assert info2.converged
    np.testing.assert_allclose(float(np.asarray(x2)[3]), 20.0, atol=1e-7)


def test_maw_rate_scaling():
    """RATE_SCALING: pumping ramps down smoothly as hw approaches the
    pump elevation (sQSaturation over reduction_length)."""
    from modflow6_tpu.ops.smoothing import sq_saturation
    g = DisGrid.create(1, 1, 3, 100.0, 100.0, 50.0, np.zeros((1, 1, 3)))
    base = build_gwf("m", g, k=10.0, strt=40.0,
                     chd=[(0, 40.0), (1, 40.0), (2, 40.0)])
    maw = build_maw([dict(radius=0.25, strt=40.0, rate=-800.0,
                          pumpelev=20.0, reduction_length=10.0,
                          connections=[(1, 25.0)])], g)
    m = AugmentedGwfModel(base, maw=maw)
    # iterates jump across the scaling ramp where the derivative is flat:
    # damp with DBD under-relaxation (the reference's COMPLEX preset role)
    sol = NumericalSolution(m, _settings(under_relaxation="dbd", theta=0.7,
                                         akappa=1e-3, gamma=0.0,
                                         amomentum=0.0))
    x, info, _ = sol.solve_timestep(m.strt, 1.0, iss=True)
    assert info.converged
    hw = float(np.asarray(x)[3])
    # converged: c(h - hw) = -rate_actual = 800·sat(hw)
    sat = float(sq_saturation(jnp.asarray(30.0), jnp.asarray(20.0),
                              jnp.asarray(hw)))
    np.testing.assert_allclose(25.0 * (40.0 - hw), 800.0 * sat, rtol=1e-6)
    assert 20.0 < hw < 30.0   # inside the ramp: pumping partially reduced


def test_maw_flowing_well():
    """FLOWING_WELLS: artesian discharge q = fwcond·(fwelev − hw) when
    hw rises above the spill elevation; steady balance against the
    aquifer exchange."""
    g = DisGrid.create(1, 1, 3, 100.0, 100.0, 50.0, np.zeros((1, 1, 3)))
    base = build_gwf("m", g, k=10.0, strt=45.0,
                     chd=[(0, 45.0), (1, 45.0), (2, 45.0)])
    maw = build_maw([dict(radius=0.25, strt=45.0, rate=0.0,
                          flowing=dict(elev=41.0, cond=5.0, rlen=0.5),
                          connections=[(1, 25.0)])], g)
    m = AugmentedGwfModel(base, maw=maw)
    sol = NumericalSolution(m, _settings())
    x, info, _ = sol.solve_timestep(m.strt, 1.0, iss=True)
    assert info.converged
    hw = float(np.asarray(x)[3])
    assert 41.0 < hw < 45.0
    bud = m.advanced_budget(jnp.asarray(x), jnp.asarray(x), 1.0, True)
    q_gwf = float(np.asarray(bud["MAW-GWF"]).sum())   # into aquifer
    q_fw = float(np.asarray(bud["MAW-FW"]).sum())     # out of the well
    # well continuity: inflow from aquifer = flowing-well discharge
    np.testing.assert_allclose(-q_gwf, -q_fw, rtol=1e-8)
    assert q_fw < -0.1


def test_lak_table_storage_mass_balance():
    """Stage/volume/sarea table (lak_calculate_vol): backward-Euler mass
    balance V(s_n) − V(s_0) = inflow·t holds exactly for a nonlinear
    table because storage is assembled from the interpolated volumes."""
    g = DisGrid.create(1, 1, 3, 100.0, 100.0, 50.0, np.zeros((1, 1, 3)))
    base = build_gwf("m", g, k=10.0, strt=40.0,
                     chd=[(0, 40.0), (1, 40.0), (2, 40.0)])
    # V ~ quadratic in stage: sarea grows linearly 100 -> 300 over 10 m
    table = [(20.0 + z, 100.0 * z + 10.0 * z * z, 100.0 + 20.0 * z)
             for z in np.linspace(0.0, 10.0, 11)]
    lak = build_lak([dict(strt=21.0, bottom=20.0, surf_area=0.0,
                          rainfall=50.0, table=table,
                          connections=[(1, 1e-9, 20.0)])])
    m = AugmentedGwfModel(base, lak=lak)
    sol = NumericalSolution(m, _settings())
    x = m.strt
    v0 = float(np.asarray(m.lak.volume_of(jnp.asarray([21.0])))[0])
    t = 0.0
    for k in range(5):
        x, info, _ = sol.solve_timestep(x, delt=2.0, kstp=k + 1, iss=False)
        assert info.converged
        t += 2.0
    s_end = float(np.asarray(x)[3])
    v_end = float(np.asarray(m.lak.volume_of(jnp.asarray([s_end])))[0])
    np.testing.assert_allclose(v_end - v0, 50.0 * t, rtol=1e-8)
    # sanity: interpolated sarea at the final stage matches the table law
    z = s_end - 20.0
    np.testing.assert_allclose(
        float(np.asarray(m.lak.sarea_of(jnp.asarray([s_end])))[0]),
        100.0 + 20.0 * z, rtol=1e-9)


def test_lak_weir_outlet_steady():
    """WEIR outlet (lak_calculate_outlet_outflow case 2):
    steady stage satisfies (2/3)·0.61·w·√(2g)·d^1.5 = inflow."""
    g = DisGrid.create(1, 1, 3, 100.0, 100.0, 50.0, np.zeros((1, 1, 3)))
    base = build_gwf("m", g, k=10.0, strt=40.0,
                     chd=[(0, 40.0), (1, 40.0), (2, 40.0)])
    qin = 5.0
    lak = build_lak([dict(strt=30.5, bottom=28.0, surf_area=1e4,
                          rainfall=qin, connections=[(1, 1e-9, 28.0)])],
                    outlets=[dict(lake=0, to=-1, type="weir", invert=30.0,
                                  width=2.0)])
    m = AugmentedGwfModel(base, lak=lak)
    sol = NumericalSolution(m, _settings())
    x = m.strt
    for k in range(80):
        x, info, _ = sol.solve_timestep(x, delt=5e3, kstp=k + 1, iss=False)
        assert info.converged
    d = float(np.asarray(x)[3]) - 30.0
    q_weir = (2.0 / 3.0) * 0.61 * 2.0 * np.sqrt(2.0 * 9.80665) * d ** 1.5
    np.testing.assert_allclose(q_weir, qin, rtol=1e-6)


def test_lak_cascade_jacobian_coupled():
    """Two-lake cascade with Jacobian-coupled outlets: upper manning
    outlet feeds the lower lake; lower weir discharges externally.  At
    steady state both outlets pass the upper lake's inflow."""
    g = DisGrid.create(1, 1, 4, 100.0, 100.0, 50.0, np.zeros((1, 1, 4)))
    base = build_gwf("m", g, k=10.0, strt=40.0,
                     chd=[(i, 40.0) for i in range(4)])
    qin = 3.0
    lak = build_lak(
        [dict(strt=32.2, bottom=30.0, surf_area=5e3, rainfall=qin,
              connections=[(1, 1e-9, 30.0)]),
         dict(strt=25.3, bottom=24.0, surf_area=5e3,
              connections=[(2, 1e-9, 24.0)])],
        outlets=[dict(lake=0, to=1, type="manning", invert=32.0,
                      width=3.0, rough=0.03, slope=1e-3),
                 dict(lake=1, to=-1, type="weir", invert=25.0, width=2.0)])
    m = AugmentedGwfModel(base, lak=lak)
    assert m.lak.out_slot is not None and m.lak.out_slot[0] >= 0
    sol = NumericalSolution(m, _settings())
    x = m.strt
    for k in range(100):
        x, info, _ = sol.solve_timestep(x, delt=2e4, kstp=k + 1, iss=False)
        assert info.converged
    q0 = float(np.asarray(m.lak.outlet_flow(jnp.asarray(x), 4, 0)[0]))
    q1 = float(np.asarray(m.lak.outlet_flow(jnp.asarray(x), 4, 1)[0]))
    np.testing.assert_allclose(q0, qin, rtol=1e-6)
    np.testing.assert_allclose(q1, qin, rtol=1e-6)


def test_sfr_npoint_xsection_normal_depth():
    """Triangular n-point cross section: steady uniform flow satisfies
    C(d)·√S = Q with the composite conveyance of SwfCxsUtils."""
    from modflow6_tpu.ops import cxs as cxs_mod
    g = DisGrid.create(1, 1, 6, 100.0, 100.0, 50.0, np.zeros((1, 1, 6)))
    base = build_gwf("m", g, k=10.0, strt=30.0,
                     chd=[(0, 30.0), (5, 30.0)])
    qin, s0, nman = 2.0, 1e-3, 0.03
    # symmetric V-notch: width 4, apex at center (xsection stations are
    # fractions of width)
    xsec = ([0.0, 0.5, 1.0], [2.0, 0.0, 2.0])
    reaches = [dict(node=1 + r, cond=0.0, strtop=40.0 - 0.1 * r, width=4.0,
                    rough=nman, slope=s0, length=100.0,
                    strt=40.5 - 0.1 * r,
                    inflow=qin if r == 0 else 0.0, xsection=xsec,
                    upstream=[(r - 1, 1.0)] if r > 0 else [])
               for r in range(4)]
    m = AugmentedGwfModel(base, sfr=build_sfr(reaches))
    sol = NumericalSolution(m, _settings())
    x = m.strt
    for k in range(60):
        x, info, _ = sol.solve_timestep(x, delt=1e4, kstp=k + 1, iss=False)
        assert info.converged
    # every reach passes qin at its normal depth
    stage = np.asarray(x)[6:]
    d = stage - np.asarray([40.0 - 0.1 * r for r in range(4)])
    assert (d > 0.01).all()
    st = jnp.asarray([[0.0, 2.0, 4.0]] * 4)
    ht = jnp.asarray([[2.0, 0.0, 2.0]] * 4)
    conv = cxs_mod.conveyance(st, ht, jnp.ones((4, 2)),
                              jnp.full(4, nman), jnp.asarray(d))
    q = np.asarray(conv) * np.sqrt(s0)
    np.testing.assert_allclose(q, qin, rtol=1e-6)


def test_sfr_diversion_rules():
    """UPTO diversion takes its specified flow off the top; the remaining
    outflow routes downstream (sfr_calc_div)."""
    g = DisGrid.create(1, 1, 6, 100.0, 100.0, 50.0, np.zeros((1, 1, 6)))
    base = build_gwf("m", g, k=10.0, strt=30.0, chd=[(0, 30.0), (5, 30.0)])
    qin = 3.0
    reaches = [
        dict(node=1, cond=0.0, strtop=40.0, width=3.0, rough=0.03,
             slope=1e-3, length=100.0, strt=40.4, inflow=qin,
             diversions=[dict(to=2, cprior="upto", flow=1.0)]),
        dict(node=2, cond=0.0, strtop=39.9, width=3.0, rough=0.03,
             slope=1e-3, length=100.0, strt=40.3, upstream=[(0, 1.0)]),
        dict(node=3, cond=0.0, strtop=39.9, width=3.0, rough=0.03,
             slope=1e-3, length=100.0, strt=40.3),
    ]
    m = AugmentedGwfModel(base, sfr=build_sfr(reaches))
    sol = NumericalSolution(m, _settings())
    x = m.strt
    for k in range(50):
        x, info, _ = sol.solve_timestep(x, delt=1e4, kstp=k + 1, iss=False)
        assert info.converged
    q, _ = m.sfr._manning(jnp.asarray(x)[6:])
    q = np.asarray(q)
    np.testing.assert_allclose(q[0], qin, rtol=1e-6)      # all inflow out
    np.testing.assert_allclose(q[1], qin - 1.0, rtol=1e-6)  # remainder
    np.testing.assert_allclose(q[2], 1.0, rtol=1e-6)        # diverted


def test_lak_horizontal_connection_wetted_scaling():
    """HORIZONTAL lake connections scale the saturated conductance by the
    quadratic wetted fraction at vv = ½(min(s,telev)+min(h,telev))
    (lak_calculate_conn_conductance / lak_calculate_cond_head)."""
    import jax.numpy as jnp
    from modflow6_tpu.models.gwf.advanced import AugmentedGwfModel, build_lak
    from modflow6_tpu.ops.smoothing import quadratic_saturation

    g = DisGrid.create(1, 1, 4, 100.0, 100.0, 50.0, np.zeros((1, 1, 4)))
    base = build_gwf("h", g, k=5.0, strt=30.0, icelltype=1,
                     chd=[(0, 30.0)])
    belev, telev = 28.0, 36.0
    # (node, cond, belev, telev, ictype=1 horizontal)
    lakes = [dict(strt=32.0, bottom=belev, surf_area=500.0, rainfall=5.0,
                  connections=[(2, 40.0, belev, telev, 1)])]
    aug = AugmentedGwfModel(base, lak=build_lak(lakes))
    d = aug.lak
    s = jnp.asarray([32.0])
    h = jnp.asarray([0.0, 0.0, 31.0, 0.0])[d.conn_node]
    vv = 0.5 * (min(32.0, telev) + min(31.0, telev))
    sat = float(quadratic_saturation(jnp.asarray([telev]),
                                     jnp.asarray([belev]),
                                     jnp.asarray([vv]))[0])
    c_eff = float(np.asarray(d.conn_cond(s[d.conn_lake], h))[0])
    np.testing.assert_allclose(c_eff, 40.0 * sat, rtol=1e-12)
    assert 0.1 < sat < 1.0      # genuinely partial wetting

    # and the coupled model still converges with the scaling active
    sol = NumericalSolution(aug, _settings(
        linear_acceleration="bicgstab"))
    x, info, _ = sol.solve_timestep(jnp.asarray(aug.strt), 100.0,
                                    iss=False)
    assert info.converged


def test_maw_shut_off_hysteresis():
    """SHUT_OFF minrate/maxrate: the head-limited well shuts when its
    potential rate drops below minrate and reopens only above maxrate
    (gwf-maw.f90 shutoffmin/shutoffmax hysteresis, advanced per step)."""
    import dataclasses as dc
    from modflow6_tpu.models.gwf.advanced import AugmentedGwfModel, build_maw
    from modflow6_tpu.models.gwf.builder import chd_data
    from modflow6_tpu.models.gwf.model import PackageData
    from modflow6_tpu.models.simulation import Simulation
    from modflow6_tpu.timing.tdis import StressPeriod, Tdis

    g = DisGrid.create(1, 1, 3, 100.0, 100.0, 50.0, np.zeros((1, 1, 3)))
    base = build_gwf("so", g, k=20.0, strt=30.0,
                     storage={"ss": 1e-5, "iconvert": 0},
                     chd=[(0, 30.0), (2, 30.0)])
    maw = build_maw([dict(radius=0.3, strt=30.0, rate=-100.0,
                          head_limit=25.0, shut_off=(40.0, 60.0),
                          connections=[(1, 10.0)])], g)
    aug = AugmentedGwfModel(base, maw=maw)
    tdis = Tdis(tuple(StressPeriod(50.0, 3, 1.0) for _ in range(3)))
    sim = Simulation(tdis, aug, _settings(linear_acceleration="bicgstab"))
    # period 2: aquifer drops to 27 → qpot ≈ cond·(27−25) = 20 < minrate
    sim.period_data[2] = PackageData(chd=chd_data([(0, 27.0), (2, 27.0)]))
    # period 3: back to 32 → qpot ≈ 10·(32−25) = 70 > maxrate → reopen
    sim.period_data[3] = PackageData(chd=chd_data([(0, 32.0), (2, 32.0)]))

    shut_log = []

    def log_hook(kper, kstp, delt):
        shut_log.append((kper, kstp, bool(np.asarray(sim.model.maw.shut)[0])))

    sim.step_hooks.append(log_hook)
    recs = sim.run()
    assert all(r.converged for r in recs)
    by_per = {}
    for kper, kstp, shut in shut_log:
        by_per.setdefault(kper, []).append(shut)
    assert by_per[1][0] is False          # starts open
    assert by_per[2][-1] is True          # shut during the low period
    assert bool(np.asarray(sim.model.maw.shut)[0]) is False  # reopened


def test_maw_condeqn_variants_match_reference_formulas():
    """THIEM/SKIN/CUMULATIVE/MEAN conductances reproduce the
    maw_calculate_satcond closed forms (gwf-maw.f90 eqns 1-4)."""
    from modflow6_tpu.models.gwf.advanced import build_maw

    g = DisGrid.create(1, 1, 3, 100.0, 100.0, 10.0, np.zeros((1, 1, 3)))
    k11v, k22v = 8.0, 2.0
    k11 = np.full(3, k11v)
    k22 = np.full(3, k22v)
    r, srad, hks = 0.25, 0.75, 0.5
    thka, area = 10.0, 100.0 * 100.0
    sqrtk = np.sqrt(k11v * k22v)
    T2pi = 2 * np.pi * thka * sqrtk
    erad = np.sqrt(area / (8 * np.pi))
    lc1 = np.log(erad / r) / T2pi
    tcontrast = (sqrtk * thka) / (hks * thka)
    lc2 = (tcontrast - 1.0) * np.log(srad / r) / T2pi

    def one(eqn):
        conn = (1, dict(condeqn=eqn, scrn_top=10.0, scrn_bot=0.0,
                        hk_skin=hks, radius_skin=srad))
        spec = build_maw([dict(radius=r, strt=5.0,
                               connections=[conn])], g,
                         k11=k11, k22=k22)
        return float(spec["cond"][0])

    np.testing.assert_allclose(one("THIEM"), 1.0 / lc1, rtol=1e-12)
    np.testing.assert_allclose(one("SKIN"), 1.0 / lc2, rtol=1e-12)
    np.testing.assert_allclose(one("CUMULATIVE"), 1.0 / (lc1 + lc2),
                               rtol=1e-12)
    ravg, slen = 0.5 * (r + srad), srad - r
    np.testing.assert_allclose(one("MEAN"),
                               hks * 2 * np.pi * ravg * thka / slen,
                               rtol=1e-12)
