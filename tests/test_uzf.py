"""UZF kinematic-wave column tests.

Analytic anchor (the reference's documented wave solution, gwf-uzf.f90 /
UzfCellGroup.f90 physics): constant infiltration i < vks into a column at
residual water content forms a sharp wetting front with content
θf = θr + (θs−θr)·(i/vks)^(1/eps) moving at the shock speed
v = i/(θf−θr); recharge at depth L begins at t* = L·(θf−θr)/i and then
equals i.
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
        theta, rch, rej = uzf_mod.advance(uzf, theta, delt)
        t += delt
        rch_hist.append((t, float(rch[0])))
        assert float(rej[0]) == 0.0
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
        theta, rch, rej = uzf_mod.advance(uzf, theta, 0.3)
        cum_in += (finf - float(rej[0])) * 0.3
        cum_out += float(rch[0]) * 0.3
    stored = float(theta.sum()) * dz
    np.testing.assert_allclose(stored - stored0 + cum_out, cum_in,
                               rtol=1e-8)


def test_rejected_infiltration_above_vks():
    """finf > vks: the excess is rejected at the surface (uzf seepage)."""
    uzf = uzf_mod.make_uzf([(0, 1.0, 0.05, 0.35, 0.05, 3.5, 5.0, 1.0, 2.5)],
                           nz=30)
    theta = uzf_mod.initial_theta(uzf)
    theta, rch, rej = uzf_mod.advance(uzf, theta, 1.0)
    np.testing.assert_allclose(float(rej[0]), 1.5, rtol=1e-6)


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
        [(node, 1.0, 0.05, 0.35, 0.05, 3.5, 2.0, 100.0, 0.3)], nz=40)
    recs = sim.run()
    assert all(r.converged for r in recs)
    assert abs(sim.budget.percent_discrepancy()) < 1e-4
    # after the front arrives the cell mounds above strt
    assert recs[-1].head[node] > 5.05
