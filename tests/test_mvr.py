"""MVR water mover tests (reference gwf-mvr.f90 / Mover.f90).

Rule math pinned against Mover.f90 qrcalc; integration scenarios assert
steady-state mass balance through provider→receiver chains.
"""

import numpy as np
import jax.numpy as jnp

from modflow6_tpu.models.discretization import DisGrid
from modflow6_tpu.models.gwf.builder import build_gwf
from modflow6_tpu.models.gwf.advanced import (AugmentedGwfModel, build_lak,
                                              build_maw, build_sfr)
from modflow6_tpu.models.gwf.mvr import MvrData, build_mvr, run_movers
from modflow6_tpu.solution import ImsSettings, NumericalSolution


def _settings(**kw):
    base = dict(outer_dvclose=1e-9, outer_maximum=200, inner_dvclose=1e-11,
                inner_rclose=1e-10, inner_maximum=500,
                linear_acceleration="bicgstab")
    base.update(kw)
    return ImsSettings(**base)


def _run(movers, avail):
    mvr = build_mvr(movers)
    avail = {k: jnp.asarray(v, jnp.float64) for k, v in avail.items()}
    sizes = {"sfr": 4, "lak": 2, "maw": 2}
    qp, qto, qfrom = run_movers(mvr, avail, sizes)
    return (np.asarray(qp), {k: np.asarray(v) for k, v in qto.items()},
            {k: np.asarray(v) for k, v in qfrom.items()})


def test_mvr_rules():
    """The four qrcalc rules (Mover.f90 qrcalc select case)."""
    avail = {"drn": [10.0, 4.0]}
    # FACTOR: qr = qta*value
    qp, _, _ = _run([dict(provider="drn", iprov=0, receiver="sfr", ircv=0,
                          mvrtype="factor", value=0.25)], avail)
    np.testing.assert_allclose(qp, [2.5])
    # EXCESS: qr = max(qa - value, 0)
    qp, _, _ = _run([dict(provider="drn", iprov=0, receiver="sfr", ircv=0,
                          mvrtype="excess", value=7.0)], avail)
    np.testing.assert_allclose(qp, [3.0])
    qp, _, _ = _run([dict(provider="drn", iprov=1, receiver="sfr", ircv=0,
                          mvrtype="excess", value=7.0)], avail)
    np.testing.assert_allclose(qp, [0.0])
    # THRESHOLD: qr = value if qa >= value else 0
    qp, _, _ = _run([dict(provider="drn", iprov=0, receiver="sfr", ircv=0,
                          mvrtype="threshold", value=6.0)], avail)
    np.testing.assert_allclose(qp, [6.0])
    qp, _, _ = _run([dict(provider="drn", iprov=1, receiver="sfr", ircv=0,
                          mvrtype="threshold", value=6.0)], avail)
    np.testing.assert_allclose(qp, [0.0])
    # UPTO: qr = min(qa, value)
    qp, _, _ = _run([dict(provider="drn", iprov=1, receiver="sfr", ircv=0,
                          mvrtype="upto", value=6.0)], avail)
    np.testing.assert_allclose(qp, [4.0])


def test_mvr_sequential_consumption():
    """Movers on one provider entry consume availability in order
    (update_provider qformvr reduction); FACTOR is computed from the
    TOTAL available but capped by what remains."""
    avail = {"drn": [10.0]}
    movers = [
        dict(provider="drn", iprov=0, receiver="sfr", ircv=0,
             mvrtype="upto", value=6.0),
        dict(provider="drn", iprov=0, receiver="lak", ircv=0,
             mvrtype="upto", value=6.0),        # only 4 left
        dict(provider="drn", iprov=0, receiver="maw", ircv=0,
             mvrtype="factor", value=0.5),      # 0.5*10=5 but 0 left
    ]
    qp, qto, qfrom = _run(movers, avail)
    np.testing.assert_allclose(qp, [6.0, 4.0, 0.0])
    np.testing.assert_allclose(qto["drn"], [10.0])
    np.testing.assert_allclose(qfrom["sfr"], [6.0, 0, 0, 0])
    np.testing.assert_allclose(qfrom["lak"], [4.0, 0])
    np.testing.assert_allclose(qfrom["maw"], [0.0, 0])


def _chain_model(mvr=None, qin=2.0, nreach=4):
    """3-cell aquifer held by CHD + a short SFR chain above it."""
    g = DisGrid.create(1, 1, 8, 100.0, 100.0, 50.0, np.zeros((1, 1, 8)))
    base = build_gwf("m", g, k=5.0, strt=30.0,
                     chd=[(0, 30.0), (7, 30.0)],
                     drn=[(3, 35.0, 2.0)])  # dry drain (elev above head)
    reaches = []
    for r in range(nreach):
        reaches.append(dict(
            node=r + 2, cond=0.0, strtop=40.0 + 0.1 * (nreach - r),
            width=3.0, rough=0.03, slope=1e-3, length=100.0,
            strt=40.3 + 0.1 * (nreach - r),
            inflow=qin if r == 0 else 0.0,
            upstream=[(r - 1, 1.0)] if r > 0 else []))
    return base, reaches


def test_mvr_sfr_to_lak_to_maw_chain():
    """SFR terminal outflow → LAK, LAK outlet → MAW injection: the full
    provider chain balances at steady state (the VERDICT done-criterion
    deck shape)."""
    base, reaches = _chain_model(qin=2.0)
    lakes = [dict(strt=20.0, surf_area=1e4, bottom=15.0,
                  connections=[(5, 1e-6, 18.0)])]
    outlets = [dict(lake=0, to=-1, type="specified", rate=0.8)]
    maw = build_maw([dict(radius=0.2, strt=30.0, rate=0.0,
                          connections=[(6, 10.0)])], None
                    if False else base.grid)
    movers = [
        # all of the last reach's outflow into the lake
        dict(provider="sfr", iprov=3, receiver="lak", ircv=0,
             mvrtype="factor", value=1.0),
        # the lake's specified-outlet release into the MAW well
        dict(provider="lak", iprov=0, receiver="maw", ircv=0,
             mvrtype="factor", value=1.0),
    ]
    m = AugmentedGwfModel(base, maw=maw,
                          lak=dict(**_lak_spec(lakes, outlets)),
                          sfr=build_sfr(reaches), mvr=movers)
    sol = NumericalSolution(m, _settings())
    x = m.strt
    for k in range(60):
        x, info, _ = sol.solve_timestep(x, delt=2e4, kstp=k + 1, iss=False)
        assert info.converged
    ib, _ = m.boundary_state(x)
    qp, qto, qfrom = m.eval_movers(x, ib)
    qp = np.asarray(qp)
    # steady state: everything routed down the chain reaches the lake
    np.testing.assert_allclose(qp[0], 2.0, rtol=1e-6)  # sfr -> lak
    np.testing.assert_allclose(qp[1], 0.8, rtol=1e-6)  # lak -> maw (outlet)
    # lake storage balance: inflow 2.0, outlet 0.8 -> lake still filling,
    # but the MOVED water must appear in the budget terms exactly
    bud = m.advanced_budget(x, x, 2e4, False)
    np.testing.assert_allclose(float(np.asarray(
        bud["LAK-FROM-MVR"]).sum()), 2.0, rtol=1e-6)
    np.testing.assert_allclose(float(np.asarray(
        bud["LAK-TO-MVR"]).sum()), -0.8, rtol=1e-6)
    np.testing.assert_allclose(float(np.asarray(
        bud["MAW-FROM-MVR"]).sum()), 0.8, rtol=1e-6)
    np.testing.assert_allclose(float(np.asarray(
        bud["SFR-TO-MVR"]).sum()), -2.0, rtol=1e-6)
    # SFR-OUT is fully consumed by the mover
    np.testing.assert_allclose(float(np.asarray(bud["SFR-OUT"])[-1]), 0.0,
                               atol=1e-9)


def _lak_spec(lakes, outlets):
    return build_lak(lakes, outlets)


def test_mvr_drn_to_sfr_mass_balance():
    """Discharging drain feeds a stream: at steady state the terminal
    reach outflow = specified inflow + moved drain discharge."""
    g = DisGrid.create(1, 1, 8, 100.0, 100.0, 50.0, np.zeros((1, 1, 8)))
    base = build_gwf("m", g, k=5.0, strt=30.0,
                     chd=[(0, 30.0), (7, 30.0)],
                     drn=[(3, 25.0, 4.0)])   # below ambient -> discharges
    reaches = [dict(node=2, cond=0.0, strtop=40.0, width=3.0, rough=0.03,
                    slope=1e-3, length=100.0, strt=40.2, inflow=1.0),
               dict(node=3, cond=0.0, strtop=39.9, width=3.0, rough=0.03,
                    slope=1e-3, length=100.0, strt=40.1,
                    upstream=[(0, 1.0)])]
    movers = [dict(provider="drn", iprov=0, receiver="sfr", ircv=1,
                   mvrtype="factor", value=1.0)]
    m = AugmentedGwfModel(base, sfr=build_sfr(reaches), mvr=movers)
    sol = NumericalSolution(m, _settings())
    x = m.strt
    for k in range(40):
        x, info, _ = sol.solve_timestep(x, delt=5e4, kstp=k + 1, iss=False)
        assert info.converged
    ib, hh = m.boundary_state(x)
    # drain discharge at converged heads
    h3 = float(np.asarray(x)[3])
    qdrn = 4.0 * (h3 - 25.0)
    assert qdrn > 0.1
    qp, _, _ = m.eval_movers(x, ib)
    np.testing.assert_allclose(float(np.asarray(qp)[0]), qdrn, rtol=1e-9)
    # terminal reach outflow = inflow + moved water
    bud = m.advanced_budget(x, x, 5e4, False)
    q_out_term = -float(np.asarray(bud["SFR-OUT"])[1])
    np.testing.assert_allclose(q_out_term, 1.0 + qdrn, rtol=1e-6)
    # provider package budget is reduced by the moved slice
    bb = m.boundary_budget(x, ib)
    np.testing.assert_allclose(float(np.asarray(bb["DRN"]).sum()), 0.0,
                               atol=1e-12)
    np.testing.assert_allclose(
        float(np.asarray(bud["DRN-TO-MVR"]).sum()), -qdrn, rtol=1e-9)


def test_mvr_validation():
    g = DisGrid.create(1, 1, 4, 100.0, 100.0, 50.0, np.zeros((1, 1, 4)))
    base = build_gwf("m", g, k=5.0, strt=30.0, chd=[(0, 30.0)])
    import pytest
    with pytest.raises(ValueError, match="provider"):
        AugmentedGwfModel(base, sfr=build_sfr([dict(
            node=1, cond=0.0, strtop=40.0, width=3.0, rough=0.03,
            slope=1e-3, length=100.0, strt=40.2, inflow=1.0)]),
            mvr=[dict(provider="drn", iprov=0, receiver="sfr", ircv=0,
                      mvrtype="factor", value=1.0)])
