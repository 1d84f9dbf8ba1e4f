"""SWF (CHF channel / OLF overland diffusive-wave) model tests.

Analytic anchor: steady uniform flow in a prismatic channel reaches
normal depth d_n with Q = (1/n)·w·d^(5/3)·√S0 (Manning; the DFW
conductance of swf-dfw.f90 get_cond_n with r = depth).
"""

import numpy as np

import jax.numpy as jnp

from modflow6_tpu.models.swf import Disv1dGrid, build_chf, build_olf
from modflow6_tpu.models.discretization import DisGrid
from modflow6_tpu.solution import ImsSettings, NumericalSolution


def settings():
    return ImsSettings(outer_dvclose=1e-8, outer_maximum=300,
                       inner_dvclose=1e-10, inner_rclose=1e-9,
                       inner_maximum=500, linear_acceleration="bicgstab",
                       no_ptc=True, under_relaxation="dbd", theta=0.9,
                       akappa=1e-4, gamma=0.0, amomentum=0.0)


def march_to_steady(model, delt=200.0, nstep=60):
    sol = NumericalSolution(model, settings())
    stage = jnp.asarray(model.strt)
    for k in range(nstep):
        stage, info, _ = sol.solve_timestep(stage, delt=delt, kstp=k + 1,
                                            iss=False)
        assert info.converged
    return stage, sol


def test_chf_normal_depth():
    nreach = 20
    dx, width, s0, nman = 100.0, 5.0, 1e-3, 0.03
    qin = 2.0
    bot = np.arange(nreach)[::-1] * dx * s0   # sloping bed
    g = Disv1dGrid.chain(np.full(nreach, dx), width, bot)
    dn = (qin * nman / (width * np.sqrt(s0))) ** 0.6   # normal depth
    model = build_chf("chan", g, manningsn=nman, strt=bot + 0.5 * dn,
                      flw=[(0, qin)],
                      zdg=[(nreach - 1, width, s0, nman)])
    stage, sol = march_to_steady(model)
    depth = np.asarray(stage) - bot
    # interior reaches sit at normal depth (ends feel the boundaries)
    np.testing.assert_allclose(depth[3:-3], dn, rtol=2e-2)
    # steady mass balance: ZDG outflow equals inflow
    ib = jnp.ones(nreach, jnp.int32)
    qout = float(np.asarray(model._zdg_q(stage)).sum())
    np.testing.assert_allclose(-qout, qin, rtol=1e-6)


def test_chf_backwater_monotone():
    """A downstream constant-stage (reservoir) backs water up the channel:
    stages decrease monotonically downstream and exceed normal depth."""
    nreach = 15
    dx, width, s0, nman = 50.0, 4.0, 2e-3, 0.03
    qin = 1.0
    bot = np.arange(nreach)[::-1] * dx * s0
    g = Disv1dGrid.chain(np.full(nreach, dx), width, bot)
    dn = (qin * nman / (width * np.sqrt(s0))) ** 0.6
    pool = bot[-1] + 4 * dn
    model = build_chf("bw", g, manningsn=nman, strt=bot + 2 * dn,
                      flw=[(0, qin)], chd=[(nreach - 1, pool)])
    stage, _ = march_to_steady(model, delt=50.0, nstep=120)
    st = np.asarray(stage)
    assert np.all(np.diff(st) < 0), "stage decreases downstream"
    assert st[-2] - bot[-2] > 1.5 * dn, "backwater raises depth above dn"


def test_olf_plane_mass_balance():
    """Overland flow on a sloping plane: rainfall-style inflow over the
    raster drains through a ZDG strip; steady outflow equals inflow and
    stages are symmetric across the plane."""
    nrow, ncol = 6, 10
    dx, s0, nman = 10.0, 1e-3, 0.05
    surf = (np.arange(ncol)[::-1] * dx * s0)[None, :] * np.ones((nrow, 1))
    g = DisGrid.create(1, nrow, ncol, dx, dx, surf.max() + 1.0,
                       surf[None, :, :])
    qcell = 0.002
    flw = [(i * ncol + j, qcell) for i in range(nrow)
           for j in range(ncol - 1)]
    zdg = [(i * ncol + ncol - 1, dx, s0, nman) for i in range(nrow)]
    model = build_olf("plane", g, manningsn=nman,
                      strt=surf.reshape(-1) + 0.01,
                      flw=flw, zdg=zdg)
    stage, _ = march_to_steady(model, delt=50.0, nstep=150)
    st = np.asarray(stage).reshape(nrow, ncol)
    depth = st - surf
    assert np.all(depth > 0)
    # symmetry across rows
    np.testing.assert_allclose(st, st[::-1, :], atol=1e-8)
    # mass balance
    qin = qcell * nrow * (ncol - 1)
    qout = -float(np.asarray(model._zdg_q(stage)).sum())
    np.testing.assert_allclose(qout, qin, rtol=1e-5)


def test_swf_transient_volume_balance():
    """Filling a flat closed basin: stored volume equals integrated
    inflow every step (swf-sto bookkeeping)."""
    nreach = 5
    g = Disv1dGrid.chain(np.full(nreach, 10.0), 2.0, np.zeros(nreach))
    qin = 0.5
    model = build_chf("fill", g, manningsn=0.03, strt=np.full(nreach, 1e-6),
                      flw=[(2, qin)])
    sol = NumericalSolution(model, settings())
    stage = jnp.asarray(model.strt)
    area = np.asarray(g.area)
    delt = 5.0
    vol0 = float((np.asarray(stage) * area).sum())
    for k in range(10):
        stage, info, _ = sol.solve_timestep(stage, delt=delt, kstp=k + 1,
                                            iss=False)
        assert info.converged
        vol = float(((np.asarray(stage)) * area).sum())
        np.testing.assert_allclose(vol - vol0, qin * delt * (k + 1),
                                   rtol=1e-6)


def test_chf_gwf_exchange_mass_balance():
    """Losing stream over an aquifer (exg-chfgwf role): at steady state,
    channel inflow = channel outflow + aquifer leakage, and the aquifer
    budget closes with the leakage as recharge."""
    from modflow6_tpu.models.swf.exchange import CoupledSwfGwf, SwfGwfExchange
    from modflow6_tpu.models.gwf.builder import build_gwf

    nreach = 10
    dx, width, s0, nman = 100.0, 5.0, 1e-3, 0.03
    qin = 2.0
    bot = np.arange(nreach)[::-1] * dx * s0 + 5.0   # channel bed above aquifer
    g1 = Disv1dGrid.chain(np.full(nreach, dx), width, bot)
    chan = build_chf("chan", g1, manningsn=nman, strt=bot + 0.3,
                     flw=[(0, qin)],
                     zdg=[(nreach - 1, width, s0, nman)])

    gaq = DisGrid.create(1, 3, nreach, dx, dx, 5.0,
                         -20.0 * np.ones((1, 3, nreach)))
    gwf = build_gwf("aq", gaq, k=5.0, strt=0.0,
                    chd=[(i * nreach, 0.0) for i in range(3)]
                    + [(i * nreach + nreach - 1, 0.0) for i in range(3)])
    # channel overlies the middle row
    exg = SwfGwfExchange(
        swf_node=np.arange(nreach), gwf_node=nreach + np.arange(nreach),
        cond=np.full(nreach, 0.02))
    cpl = CoupledSwfGwf(chan, gwf, exg)
    stage, head = jnp.asarray(chan.strt), jnp.asarray(gwf.strt)
    info = None
    for k in range(40):
        stage, head, info = cpl.step(stage, head, delt=500.0, kstp=k + 1,
                                     iss_gwf=True)
        assert info["converged"]
    q_leak = float(np.asarray(info["q"]).sum())
    assert q_leak > 0.01, "stream must lose water to the aquifer"
    q_out = -float(np.asarray(chan._zdg_q(stage)).sum())
    np.testing.assert_allclose(q_out + q_leak, qin, rtol=1e-4)
    # aquifer gains show up as mounding under the channel
    h = np.asarray(head).reshape(3, nreach)
    assert h[1].max() > 1e-3


def test_swf_boundary_budget_with_lkg():
    """boundary_budget must work for SWF-GWF-coupled models (pkgs.lkg set)
    and report the LKG term = cond·(bhead − stage) with dry smoothing
    (regression: this used to raise UnboundLocalError)."""
    from modflow6_tpu.models.swf.model import SwfPackageData, _squadratic

    nreach = 6
    bot = np.arange(nreach)[::-1] * 0.1 + 5.0
    g1 = Disv1dGrid.chain(np.full(nreach, 50.0), 4.0, bot)
    chan = build_chf("c", g1, manningsn=0.03, strt=bot + 0.5,
                     flw=[(0, 1.0)], zdg=[(nreach - 1, 4.0, 1e-3, 0.03)])
    stage = jnp.asarray(chan.strt)
    ib, st = chan.boundary_state(stage)
    node = jnp.arange(nreach, dtype=jnp.int32)
    bhead = jnp.asarray(bot + 1.0)       # aquifer head above stage
    cond = jnp.full(nreach, 0.02)
    out = chan.boundary_budget(
        st, ib, pkgs=SwfPackageData(flw=chan.flw, lkg=(node, bhead, cond)))
    assert set(out) == {"FLW", "ZDG", "LKG"}
    # bhead > stage everywhere -> exfiltration into the reach, unsmoothed
    expect = np.asarray(cond * (bhead - st[node]))
    np.testing.assert_allclose(np.asarray(out["LKG"]), expect, rtol=1e-12)
    # infiltration direction picks up the dry-depth smoothing factor
    bhead_lo = jnp.asarray(bot - 1.0)
    out2 = chan.boundary_budget(
        st, ib, pkgs=SwfPackageData(flw=chan.flw,
                                    lkg=(node, bhead_lo, cond)))
    depth = st[node] - chan.bot[node]
    f = _squadratic(depth, 1e-4)
    expect2 = np.asarray(cond * f * (bhead_lo - st[node]))
    np.testing.assert_allclose(np.asarray(out2["LKG"]), expect2, rtol=1e-12)


def test_chf_cxs_triangular_normal_depth():
    """CXS n-point sections in the DFW conveyance (swf-cxs.f90 role):
    a triangular channel's steady normal depth satisfies
    C(d)·√S0 = Q with the composite conveyance."""
    from modflow6_tpu.ops import cxs as cxs_mod

    nreach, dx, s0, nman, qin = 12, 100.0, 1e-3, 0.03, 1.5
    bot = np.arange(nreach)[::-1] * dx * s0
    g1 = Disv1dGrid.chain(np.full(nreach, dx), 4.0, bot)
    # V-notch: stations as fractions of the width-4 channel
    sec = ([0.0, 0.5, 1.0], [2.0, 0.0, 2.0])
    # start near normal depth: a centrally-weighted diffusive wave cannot
    # advance into a fully dry downstream reach (harmonic conductance → 0),
    # so the march must not dry the outlet first
    chan = build_chf("cxs", g1, manningsn=nman, strt=bot + 1.4,
                     icentral=0,     # upstream-in-space (the DFW default):
                     # central weighting chokes at the thin outlet because
                     # the V-notch conveyance vanishes quadratically
                     flw=[(0, qin)],
                     zdg=[(nreach - 1, 4.0, s0, nman)],
                     cxs_sections=[sec],
                     idcxs=np.ones(nreach, np.int64))
    stage, sol = march_to_steady(chan, delt=300.0, nstep=120)
    d = np.asarray(stage - chan.bot)
    # steady mass balance: ZDG outflow equals the inflow
    qout = -float(np.asarray(chan._zdg_q(jnp.asarray(stage))).sum())
    np.testing.assert_allclose(qout, qin, rtol=1e-5)
    # the upstream reaches approach the triangular-section normal depth
    # (C(d_n)·√S0 = Q); the outlet end rides an M2 drawdown curve
    st = jnp.asarray([[0.0, 2.0, 4.0]] * nreach)
    ht = jnp.asarray([[2.0, 0.0, 2.0]] * nreach)
    conv = cxs_mod.conveyance(st, ht, jnp.ones((nreach, 2)),
                              jnp.full(nreach, nman), jnp.asarray(d))
    q = np.asarray(conv) * np.sqrt(s0)
    np.testing.assert_allclose(q[1:4], qin, rtol=0.06)
    assert np.all(np.diff(q[1:]) < 0), "drawdown toward the free outfall"
    # and the depth differs clearly from the rectangular-channel answer
    d_rect = (qin * nman / (4.0 * np.sqrt(s0))) ** 0.6
    assert abs(d[2] - d_rect) > 0.05


def test_chf_pcp_evp_cdb():
    """PCP rain feeds a flat channel; CDB critical-depth outlet drains
    it.  Steady state: outlet discharge = net (PCP − EVP) input, and the
    outlet depth is the critical depth d = (q²/(g·w²))^(1/3)
    (swf-pcp/evp/cdb.f90 closed forms)."""
    nreach, dx, width = 10, 100.0, 5.0
    g = Disv1dGrid.chain(np.full(nreach, dx), width, np.zeros(nreach))
    rain, evap = 1e-4, 2e-5
    model = build_chf(
        "c", g, manningsn=0.03, strt=0.3,
        pcp=[(i, rain) for i in range(nreach)],
        evp=[(i, evap) for i in range(nreach)],
        cdb=[(nreach - 1, width)])
    stage, sol = march_to_steady(model, delt=500.0, nstep=80)
    ib, st = model.boundary_state(stage)
    bud = model.boundary_budget(st, ib)
    q_pcp = float(np.asarray(bud["PCP"]).sum())
    q_evp = float(np.asarray(bud["EVP"]).sum())
    q_cdb = float(np.asarray(bud["CDB"]).sum())
    area_tot = nreach * dx * width
    np.testing.assert_allclose(q_pcp, rain * area_tot, rtol=1e-12)
    np.testing.assert_allclose(q_evp, -evap * area_tot, rtol=1e-6)
    # steady mass balance: outflow = net input
    np.testing.assert_allclose(-q_cdb, q_pcp + q_evp, rtol=1e-6)
    # critical depth at the outlet
    qn = q_pcp + q_evp
    d_crit = (qn ** 2 / (9.80665 * width ** 2)) ** (1.0 / 3.0)
    np.testing.assert_allclose(float(np.asarray(stage)[-1]), d_crit,
                               rtol=1e-6)


def test_olf_disv2d_matches_dis2d():
    """OLF on a DISV2D quad mesh that replicates a DIS2D raster gives
    identical stages (Disv2d.f90 role via the one-layer DISV topology)."""
    from modflow6_tpu.models.discretization.disv2d import Disv2dGrid

    nr, nc, d = 4, 6, 10.0
    slope_bot = np.repeat(np.arange(nc)[::-1] * 0.01 * d, 1)
    bot2d = np.tile(slope_bot, (nr, 1))
    gdis = DisGrid.create(1, nr, nc, d, d, float(bot2d.max()) + 1.0,
                          bot2d[None])
    verts = [(j * d, -i * d) for i in range(nr + 1) for j in range(nc + 1)]
    cells = []
    for i in range(nr):
        for j in range(nc):
            v0 = i * (nc + 1) + j
            ids = [v0, v0 + 1, v0 + nc + 2, v0 + nc + 1]
            xs = [verts[v][0] for v in ids]
            ys = [verts[v][1] for v in ids]
            cells.append((sum(xs) / 4.0, sum(ys) / 4.0, ids))
    gdv = Disv2dGrid.create(np.asarray(verts), cells, bot2d.reshape(-1))

    kw = dict(manningsn=0.05,
              flw=[(i * nc, 0.05) for i in range(nr)],
              chd=[(i * nc + nc - 1, slope_bot[-1] + 0.05)
                   for i in range(nr)])
    m1 = build_olf("a", gdis, strt=bot2d.reshape(-1) + 0.05, **kw)
    m2 = build_olf("b", gdv, strt=bot2d.reshape(-1) + 0.05, **kw)
    s1, _ = march_to_steady(m1, delt=100.0, nstep=40)
    s2, _ = march_to_steady(m2, delt=100.0, nstep=40)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1), atol=1e-8)
