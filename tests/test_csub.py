"""CSUB compaction/subsidence tests.

Head-based analytic anchors (gwf-csub.f90 HEAD_BASED option, f ≡ 1, with
a fully confined cell where geostatic stress is constant so Δes = −Δh):

- elastic interbed: compaction = Sske·b·Δh;
- inelastic switching: once the effective stress exceeds the initial
  preconsolidation stress (head drawdown > pcs_offset), further
  compaction accrues at Ssv·b per unit drawdown.
"""

import numpy as np

import jax.numpy as jnp

from modflow6_tpu.models.discretization import DisGrid
from modflow6_tpu.models.gwf.builder import build_gwf
from modflow6_tpu.models.gwf import csub as csub_mod
from modflow6_tpu.models.simulation import Simulation
from modflow6_tpu.solution import ImsSettings
from modflow6_tpu.timing.tdis import StressPeriod, Tdis


def tight():
    return ImsSettings(outer_dvclose=1e-10, outer_maximum=100,
                       inner_dvclose=1e-12, inner_rclose=1e-11,
                       inner_maximum=500)


def drawdown_sim(dh_per_period, nper, *, sske=1e-4, ssv=1e-2, thick=5.0,
                 pcs_offset=0.0, h0=50.0):
    """1x1x2 confined model: cell 0 is CHD-driven down dh per period;
    one no-delay interbed in cell 1 (same head via high-K connection)."""
    g = DisGrid.create(1, 1, 2, 10.0, 10.0, 20.0, np.zeros((1, 1, 2)))
    model = build_gwf(
        "cs", g, k=1e4, strt=h0, storage={"ss": 0.0, "iconvert": 0},
        chd=[(0, h0)],
        csub=dict(sgm=1.7, sgs=2.0, cg_ske_cr=0.0, cg_theta=0.2,
                  interbeds=[(1, thick, sske, ssv, 0.3)],
                  head_based=True, pcs_offset=pcs_offset))
    tdis = Tdis(tuple(StressPeriod(1.0, 1, 1.0) for _ in range(nper)))
    sim = Simulation(tdis, model, tight())
    for kp in range(2, nper + 1):
        from modflow6_tpu.models.gwf.builder import chd_data
        from modflow6_tpu.models.gwf.model import PackageData
        sim.period_data[kp] = PackageData(
            chd=chd_data([(0, h0 - dh_per_period * (kp - 1))]))
    return sim, model


def test_elastic_compaction_headbased():
    sske, thick, dh = 1e-4, 5.0, 2.0
    sim, model = drawdown_sim(dh, 4, sske=sske, ssv=1e-2,
                              thick=thick, pcs_offset=1e6)  # stay elastic
    recs = sim.run()
    assert all(r.converged for r in recs)
    # head in cell 1 tracks the CHD cell (huge K)
    np.testing.assert_allclose(recs[-1].head[1], 50.0 - 3 * dh, atol=1e-6)
    comp = float(np.asarray(sim.csub_state.comp)[0])
    np.testing.assert_allclose(comp, sske * thick * 3 * dh, rtol=1e-6)


def test_inelastic_switch_headbased():
    """Drawdown crosses the preconsolidation stress: elastic rate before,
    virgin (Ssv) rate after; unloading afterwards is elastic again."""
    sske, ssv, thick, dh = 1e-4, 1e-2, 5.0, 2.0
    pcs_off = 3.0      # inelastic once drawdown exceeds 3
    sim, model = drawdown_sim(dh, 5, sske=sske, ssv=ssv, thick=thick,
                              pcs_offset=pcs_off)
    recs = sim.run()
    assert all(r.converged for r in recs)
    comp = float(np.asarray(sim.csub_state.comp)[0])
    # period 2: Δh=2 elastic (es still below pcs)
    # period 3: Δh=2, of which 1 elastic (reaching pcs) + 1 virgin
    # period 4: Δh=2 virgin; period 5: Δh=2 virgin
    expected = (sske * thick * 3.0) + (ssv * thick * 5.0)
    # rtol 1e-4: the interbed cell's head lags the CHD cell by q/cond
    np.testing.assert_allclose(comp, expected, rtol=1e-4)
    # preconsolidation stress advanced to the max effective stress
    pcs = float(np.asarray(sim.csub_state.pcs)[0])
    es = float(np.asarray(sim.csub_state.es0)[1])
    np.testing.assert_allclose(pcs, es, rtol=1e-12)


def test_csub_budget_closes():
    """Transient pumping with CSUB water release: budget discrepancy ~0."""
    g = DisGrid.create(1, 3, 5, 10.0, 10.0, 20.0, np.zeros((1, 3, 5)))
    model = build_gwf(
        "csb", g, k=5.0, strt=30.0, storage={"ss": 1e-5, "iconvert": 0},
        chd=[(i * 5, 30.0) for i in range(3)],
        wel=[(7, -5.0)],
        csub=dict(sgm=1.7, sgs=2.0, cg_ske_cr=1e-5, cg_theta=0.2,
                  interbeds=[(7, 3.0, 1e-4, 1e-2, 0.3),
                             (8, 2.0, 1e-4, 1e-2, 0.3)],
                  head_based=True, pcs_offset=0.5))
    tdis = Tdis((StressPeriod(10.0, 5, 1.2),))
    sim = Simulation(tdis, model, tight())
    recs = sim.run()
    assert all(r.converged for r in recs)
    assert abs(sim.budget.percent_discrepancy()) < 1e-3
    assert float(np.asarray(sim.csub_state.comp).sum()) > 0


def test_effective_stress_mode_stress_fields():
    """Effective-stress formulation: gs accumulates down the column and
    es falls as head rises (csub_cg_calc_stress math)."""
    g = DisGrid.create(3, 1, 1, 10.0, 10.0, 30.0,
                       np.array([20.0, 10.0, 0.0])[:, None, None]
                       * np.ones((3, 1, 1)))
    model = build_gwf("ces", g, k=1.0, strt=25.0,
                      csub=dict(sgm=1.7, sgs=2.0, cg_ske_cr=1e-5,
                                cg_theta=0.2, interbeds=[],
                                head_based=False))
    csub = model.csub
    top = jnp.asarray(np.asarray(g.top).reshape(-1))
    bot = jnp.asarray(np.asarray(g.bot).reshape(-1))
    ib = jnp.ones(3, jnp.int32)
    gs1, es1 = csub_mod.calc_stress(csub, top, bot, jnp.full(3, 25.0), ib)
    gs2, es2 = csub_mod.calc_stress(csub, top, bot, jnp.full(3, 28.0), ib)
    g1 = np.asarray(gs1)
    assert g1[2] > g1[1] > g1[0], "geostatic stress grows with depth"
    # top cell (water table inside): gs = (top−h)·sgm + (h−bot)·sgs
    np.testing.assert_allclose(g1[0], 5.0 * 1.7 + 5.0 * 2.0)
    assert np.all(np.asarray(es2)[1:] < np.asarray(es1)[1:]), \
        "higher heads reduce effective stress in saturated cells"


def _delay_drive(model, nstep, delt, settings=None):
    """March the model with manual CSUB state advance (the Simulation
    inner loop, simulation.py finish-step block), recording delay-bed
    compaction after each step."""
    import dataclasses
    from modflow6_tpu.solution import NumericalSolution

    sol = NumericalSolution(model, settings or tight())
    state = model.csub_state0
    a = model.npf_arrays
    area = jnp.asarray(model.grid.area)
    head = jnp.asarray(model.strt)
    hist = []
    for k in range(nstep):
        pkgs = dataclasses.replace(model.packages, csub_state=state)
        head_old = head
        head, info, aux = sol.solve_timestep(head, delt, kstp=k + 1,
                                             iss=False, pkgs=pkgs)
        assert info.converged
        ib, _ = model.boundary_state(head)
        state = csub_mod.advance_state_jit(model.csub, state, a.top,
                                           a.bot, area, a.icelltype, head,
                                           head_old, ib, delt)
        hist.append(float(np.asarray(state.db_comp)[0]))
    return np.asarray(hist), state, head


def _terzaghi_U(Tv, nterms=50):
    m = np.arange(nterms)
    M = np.pi * (2 * m + 1) / 2.0
    return 1.0 - np.sum(2.0 / M**2 * np.exp(-M[None, :]**2
                                            * np.asarray(Tv)[:, None]),
                        axis=1)


def test_delay_interbed_terzaghi():
    """Delay interbed vs the Terzaghi consolidation closed form: an
    elastic head-based delay column under a step head drop consolidates
    with U(Tv) = 1 − Σ 2/M² exp(−M²Tv), Tv = cv·t/H², cv = kv/Ss,
    H = b/2 (drained at both faces).  This exercises the full delay
    machinery: csub_delay_assemble_fc tridiagonal + csub_delay_sln
    iteration + csub_delay_fc cell coupling + compaction accumulation."""
    h0, dh = 50.0, 2.0
    b, kv, ss = 5.0, 0.01, 1e-3
    g = DisGrid.create(1, 1, 2, 10.0, 10.0, 20.0, np.zeros((1, 1, 2)))
    model = build_gwf(
        "dt", g, k=1e5, strt=h0, storage={"ss": 0.0, "iconvert": 0},
        chd=[(0, h0 - dh)],
        csub=dict(sgm=1.7, sgs=2.0, cg_ske_cr=0.0, cg_theta=0.2,
                  head_based=True,
                  delay_interbeds=[dict(node=1, thick=b, kv=kv,
                                        sske_cr=ss, ssv_cc=ss,
                                        theta=0.3)],
                  ndelaycells=19))
    cv = kv / ss
    H = b / 2.0
    delt = 0.005
    nstep = 120
    hist, state, head = _delay_drive(model, nstep, delt)
    comp_ult = ss * b * dh
    t = delt * np.arange(1, nstep + 1)
    U = _terzaghi_U(cv * t / H**2)
    # compare the consolidation curve (skip the first few steps where the
    # backward-Euler time error is largest relative to small U)
    ratio = hist / comp_ult
    np.testing.assert_allclose(ratio[5:], U[5:], atol=0.03)
    # consolidation degree at the end matches the series (Tv ≈ 0.96)
    np.testing.assert_allclose(ratio[-1], U[-1], atol=0.01)
    assert ratio[-1] > 0.9


def test_delay_interbed_inelastic_ratchet():
    """Inelastic delay bed: drawdown compacts at the virgin rate; full
    head recovery rebounds only the elastic share (pcs ratchet per
    delay node, csub_delay_calc_ssksske idbconvert)."""
    h0, dh = 50.0, 3.0
    b, kv = 4.0, 0.02
    sske, ssv = 1e-4, 1e-2
    g = DisGrid.create(1, 1, 2, 10.0, 10.0, 20.0, np.zeros((1, 1, 2)))

    def mk(chd_head):
        return build_gwf(
            "di", g, k=1e5, strt=h0, storage={"ss": 0.0, "iconvert": 0},
            chd=[(0, chd_head)],
            csub=dict(sgm=1.7, sgs=2.0, cg_ske_cr=0.0, cg_theta=0.2,
                      head_based=True, pcs_offset=0.0,
                      delay_interbeds=[dict(node=1, thick=b, kv=kv,
                                            sske_cr=sske, ssv_cc=ssv,
                                            theta=0.3)],
                      ndelaycells=19))

    import dataclasses
    from modflow6_tpu.solution import NumericalSolution
    model = mk(h0 - dh)
    hist, state, head = _delay_drive(model, 120, 0.04)
    comp_load = hist[-1]
    np.testing.assert_allclose(comp_load, ssv * b * dh, rtol=0.02)
    # now recover: swap CHD back to h0, continue from the ratcheted state
    from modflow6_tpu.models.gwf import bnd
    model2 = mk(h0)
    model2.csub_state0 = state
    a = model2.npf_arrays
    sol = NumericalSolution(model2, tight())
    area = jnp.asarray(model2.grid.area)
    for k in range(80):
        pkgs = dataclasses.replace(model2.packages, csub_state=state)
        head_old = head
        head, info, _ = sol.solve_timestep(head, 0.02, kstp=k + 1,
                                           iss=False, pkgs=pkgs)
        assert info.converged
        ib, _ = model2.boundary_state(head)
        state = csub_mod.advance_state_jit(model2.csub, state, a.top,
                                           a.bot, area, a.icelltype, head,
                                           head_old, ib, 0.02)
    comp_final = float(np.asarray(state.db_comp)[0])
    rebound = comp_load - comp_final
    # rebound is elastic only: sske·b·dh ≪ compaction
    np.testing.assert_allclose(rebound, sske * b * dh, rtol=0.05)
    assert comp_final > 0.9 * comp_load
