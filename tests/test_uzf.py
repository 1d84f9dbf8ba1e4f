"""UZF kinematic-wave column tests.

Analytic anchor (the reference's documented wave solution, gwf-uzf.f90 /
UzfCellGroup.f90 physics): constant infiltration i < vks into a column at
residual water content forms a sharp wetting front with content
θf = θr + (θs−θr)·(i/vks)^(1/eps) moving at the shock speed
v = i/(θf−θr); recharge at depth L begins at t* = L·(θf−θr)/i and then
equals i.

The hard-half tests pin the water-table coupling (watab from heads,
uz_rise release), unsaturated ET bounded by extwc, and the groundwater
seepage drain (gwseep).
"""

import numpy as np

import jax.numpy as jnp

from modflow6_tpu.models.discretization import DisGrid
from modflow6_tpu.models.gwf.builder import build_gwf
from modflow6_tpu.models.gwf import uzf as uzf_mod
from modflow6_tpu.models.simulation import Simulation
from modflow6_tpu.solution import ImsSettings
from modflow6_tpu.timing.tdis import StressPeriod, Tdis


def test_wetting_front_arrival_analytic():
    vks, thtr, thts, eps = 1.0, 0.05, 0.35, 3.5
    L, finf = 10.0, 0.25
    uzf = uzf_mod.make_uzf([(0, vks, thtr, thts, thtr, eps, L, 1.0, finf)],
                           nz=120)
    thetaf = thtr + (thts - thtr) * (finf / vks) ** (1.0 / eps)
    t_star = L * (thetaf - thtr) / finf

    theta = uzf_mod.initial_theta(uzf)
    delt = t_star / 40
    t, rch_hist = 0.0, []
    for _ in range(80):
        res = uzf_mod.advance(uzf, theta, delt)
        theta = res.theta
        t += delt
        rch_hist.append((t, float(res.rch[0])))
        assert float(res.rej[0]) == 0.0
    times = np.array([x[0] for x in rch_hist])
    rates = np.array([x[1] for x in rch_hist])
    # before the front arrives: essentially no recharge
    assert rates[times < 0.8 * t_star].max() < 0.02 * finf
    # after arrival (+ smearing): full infiltration rate
    assert rates[times > 1.3 * t_star].min() > 0.95 * finf
    # numerical arrival time (first step exceeding i/2) near analytic
    t_num = times[np.argmax(rates > finf / 2)]
    np.testing.assert_allclose(t_num, t_star, rtol=0.1)


def test_mass_conservation_in_column():
    """Stored water + cumulative recharge = cumulative infiltration."""
    vks, thtr, thts, eps = 2.0, 0.1, 0.4, 4.0
    L, finf = 5.0, 0.6
    uzf = uzf_mod.make_uzf([(0, vks, thtr, thts, 0.15, eps, L, 1.0, finf)],
                           nz=60)
    theta = uzf_mod.initial_theta(uzf)
    dz = L / 60
    stored0 = float(theta.sum()) * dz
    cum_in = cum_out = 0.0
    for _ in range(30):
        res = uzf_mod.advance(uzf, theta, 0.3)
        theta = res.theta
        cum_in += (finf - float(res.rej[0])) * 0.3
        cum_out += float(res.rch[0]) * 0.3
    stored = float(theta.sum()) * dz
    np.testing.assert_allclose(stored - stored0 + cum_out, cum_in,
                               rtol=1e-8)


def test_rejected_infiltration_above_vks():
    """finf > vks: the excess is rejected at the surface (uzf seepage)."""
    uzf = uzf_mod.make_uzf([(0, 1.0, 0.05, 0.35, 0.05, 3.5, 5.0, 1.0, 2.5)],
                           nz=30)
    theta = uzf_mod.initial_theta(uzf)
    res = uzf_mod.advance(uzf, theta, 1.0)
    np.testing.assert_allclose(float(res.rej[0]), 1.5, rtol=1e-6)


def test_water_table_shortens_column():
    """With the water table halfway up the column, the wetting front only
    has to travel half the distance (UzfCellGroup sethead: the unsat zone
    spans [watab, celtop])."""
    vks, thtr, thts, eps = 1.0, 0.05, 0.35, 3.5
    finf = 0.25
    col = dict(node=0, vks=vks, thtr=thtr, thts=thts, thti=thtr, eps=eps,
               celtop=10.0, celbot=0.0, area=1.0, finf=finf)
    uzf = uzf_mod.make_uzf([col], nz=120)
    thetaf = thtr + (thts - thtr) * (finf / vks) ** (1.0 / eps)
    head = jnp.asarray([5.0])          # watab at z=5 → travel depth 5
    t_star = 5.0 * (thetaf - thtr) / finf
    theta = uzf_mod.initial_theta(uzf)
    delt = t_star / 40
    t, times, rates = 0.0, [], []
    for _ in range(80):
        res = uzf_mod.advance(uzf, theta, delt, head=head)
        theta = res.theta
        t += delt
        times.append(t)
        rates.append(float(res.rch[0]))
    times, rates = np.array(times), np.array(rates)
    t_num = times[np.argmax(rates > finf / 2)]
    np.testing.assert_allclose(t_num, t_star, rtol=0.12)


def test_uz_rise_releases_stored_water():
    """A rising water table converts the unsat storage it floods into
    recharge (UzfCellGroup uz_rise)."""
    col = dict(node=0, vks=1.0, thtr=0.05, thts=0.35, thti=0.20, eps=3.5,
               celtop=10.0, celbot=0.0, area=1.0, finf=0.0)
    uzf = uzf_mod.make_uzf([col], nz=100)
    theta = uzf_mod.initial_theta(uzf)
    # WT jumps from 2.0 to 6.0: (θ−θr)·Δd = 0.15·4.0 released over delt
    res = uzf_mod.advance(uzf, theta, 0.5, head=jnp.asarray([6.0]),
                          watab_old=jnp.asarray([2.0]))
    # drainage of the θi=0.20 > field-capacity profile adds a little more
    released = float(res.rch[0]) * 0.5
    assert released >= 0.15 * 4.0 - 1e-8
    np.testing.assert_allclose(released, 0.15 * 4.0, rtol=0.15)


def test_unsat_et_bounded_by_extwc():
    """SIMULATE_ET: PET is drawn from the profile above the extinction
    depth and stops at extwc (routewaves ietflag branch)."""
    # vks tiny so gravity drainage is negligible and only ET acts
    col = dict(node=0, vks=1e-9, thtr=0.05, thts=0.35, thti=0.30, eps=3.5,
               celtop=4.0, celbot=0.0, area=1.0, finf=0.0,
               pet=0.05, extdp=2.0, extwc=0.10)
    uzf = uzf_mod.make_uzf([col], nz=40, ietflag=1)
    theta = uzf_mod.initial_theta(uzf)
    cum_et = 0.0
    for _ in range(200):
        res = uzf_mod.advance(uzf, theta, 1.0, nsub=1)
        theta = res.theta
        cum_et += float(res.uzet[0]) * 1.0
    # cells inside the extinction zone drop exactly to extwc, not below
    zc = 4.0 - (np.arange(40) + 0.5) * 0.1
    in_zone = zc > 2.0
    th = np.asarray(theta)[0]
    np.testing.assert_allclose(th[in_zone], 0.10, atol=1e-5)
    # cells below the extinction depth are untouched (up to the tiny
    # residual vks drainage)
    np.testing.assert_allclose(th[~in_zone], 0.30, atol=1e-5)
    # cumulative ET = drawdown (0.30−0.10) over the 2.0 extinction depth
    np.testing.assert_allclose(cum_et, 0.2 * 2.0, rtol=1e-3)
    # the residual PET shows up in gwpet once the zone is dry
    np.testing.assert_allclose(float(res.gwpet[0]), 0.05, rtol=1e-6)


def test_gwseep_discharges_when_head_above_land():
    """SIMULATE_GWSEEP: head above celtop drives a vks-scaled drain
    (UzfCellGroup gwseep): seep = scale·A·vks·(h−celtop)/surfdep."""
    col = dict(node=0, vks=2.0, thtr=0.05, thts=0.35, thti=0.05, eps=3.5,
               celtop=10.0, celbot=5.0, surfdep=0.5, area=3.0, finf=0.0)
    uzf = uzf_mod.make_uzf([col], nz=20, iseepflag=1)
    theta = uzf_mod.initial_theta(uzf)
    head = jnp.asarray([10.4])
    res = uzf_mod.advance(uzf, theta, 1.0, head=head)
    step = uzf_mod.make_step(uzf, res)
    hcof, rhs, parts = uzf_mod.uzf_matrix_terms(
        step, head, jnp.ones(1, jnp.int32))
    x = 10.4 - 10.0
    xs = x / 0.5
    scale = -(xs ** 3) + 2 * xs ** 2
    expect = -scale * 3.0 * 2.0 * x / 0.5
    np.testing.assert_allclose(float(parts["UZF-GWD"][0]), expect,
                               rtol=1e-12)
    # and the matrix terms reproduce q = hcof·h − rhs
    np.testing.assert_allclose(float(hcof[0] * head[0] - rhs[0]),
                               expect, rtol=1e-12)


def test_uzf_recharges_gwf_model():
    """Coupled: column recharge raises aquifer heads and the budget
    closes with the UZF inflow included."""
    nrow, ncol = 3, 5
    g = DisGrid.create(1, nrow, ncol, 10.0, 10.0, 20.0,
                       np.zeros((1, nrow, ncol)))
    model = build_gwf("uz", g, k=5.0, strt=5.0,
                      storage={"ss": 1e-3, "iconvert": 0},
                      chd=[(i * ncol, 5.0) for i in range(nrow)])
    tdis = Tdis((StressPeriod(40.0, 8, 1.0),))
    sim = Simulation(tdis, model, ImsSettings(
        outer_dvclose=1e-8, inner_dvclose=1e-10, inner_rclose=1e-9,
        inner_maximum=500))
    # one column over the cell farthest from the CHD
    node = 1 * ncol + ncol - 1
    sim.uzf = uzf_mod.make_uzf(
        [dict(node=node, vks=1.0, thtr=0.05, thts=0.35, thti=0.05,
              eps=3.5, celtop=20.0, celbot=18.0, area=100.0, finf=0.3)],
        nz=40)
    recs = sim.run()
    assert all(r.converged for r in recs)
    assert abs(sim.budget.percent_discrepancy()) < 1e-4
    # after the front arrives the cell mounds above strt
    assert recs[-1].head[node] > 5.05


def test_uzf_seepage_caps_mound():
    """Coupled with SIMULATE_GWSEEP: heavy recharge mounds the head up to
    land surface, where the seepage drain holds it (gwseep balance)."""
    nrow, ncol = 1, 5
    g = DisGrid.create(1, nrow, ncol, 10.0, 10.0, 12.0,
                       np.zeros((1, nrow, ncol)))
    model = build_gwf("sp", g, k=0.02, strt=5.0,
                      storage={"ss": 1e-4, "iconvert": 0},
                      chd=[(0, 5.0)])
    tdis = Tdis((StressPeriod(2000.0, 40, 1.05),))
    sim = Simulation(tdis, model, ImsSettings(
        outer_dvclose=1e-8, inner_dvclose=1e-10, inner_rclose=1e-9,
        inner_maximum=500, outer_maximum=100))
    sim.uzf = uzf_mod.make_uzf(
        [dict(node=4, vks=0.5, thtr=0.05, thts=0.35, thti=0.05, eps=3.5,
              celtop=10.0, celbot=8.0, surfdep=0.2, area=100.0,
              finf=0.05)],
        nz=30, iseepflag=1)
    recs = sim.run()
    assert all(r.converged for r in recs)
    h_end = float(recs[-1].head[4])
    # head mounds to land surface but the seepage drain caps it within
    # the surfdep smoothing band
    assert 10.0 - 0.05 < h_end < 10.0 + 0.25
    assert abs(sim.budget.percent_discrepancy()) < 0.01
