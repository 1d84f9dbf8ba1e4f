"""ATS adaptive-time-stepping tests (role of reference autotest
test_gwf_ats* family; parity targets ats.f90 + mf6core.f90 retryloop)."""

import numpy as np

from modflow6_tpu.models.discretization import DisGrid
from modflow6_tpu.models.gwf.builder import build_gwf
from modflow6_tpu.models.simulation import Simulation
from modflow6_tpu.solution import ImsSettings
from modflow6_tpu.timing.ats import AtsPeriod
from modflow6_tpu.timing.tdis import StressPeriod, Tdis


def make_sim(outer_maximum=60, **sim_kw):
    n = 15
    g = DisGrid.create(1, 1, n, 10.0, 10.0, 10.0, np.zeros((1, 1, n)))
    gwf = build_gwf("m", g, k=2.0, strt=6.0,
                    storage={"ss": 1e-3, "iconvert": 0},
                    chd=[(0, 9.0), (n - 1, 5.0)])
    tdis = Tdis([StressPeriod(perlen=100.0, nstp=5, tsmult=1.0)])
    settings = ImsSettings(outer_dvclose=1e-8, inner_dvclose=1e-10,
                           inner_rclose=1e-9, inner_maximum=500,
                           outer_maximum=outer_maximum)
    return Simulation(tdis, gwf, settings, **sim_kw)


def test_ats_covers_period_exactly():
    sim = make_sim()
    sim.ats[1] = AtsPeriod(dt0=5.0, dtmin=0.5, dtmax=30.0, dtadj=2.0)
    recs = sim.run()
    assert all(r.converged for r in recs)
    np.testing.assert_allclose(recs[-1].totim, 100.0, rtol=1e-12)
    # step growth happened (fast linear convergence → dtadj growth)
    delts = np.diff([0.0] + [r.totim for r in recs])
    assert delts.max() > 5.0
    assert delts.max() <= 30.0 + 1e-12      # dtmax respected
    # same physics as fixed stepping: final steady-ish heads match
    fixed = make_sim().run()
    np.testing.assert_allclose(recs[-1].head, fixed[-1].head, atol=1e-4)


def test_ats_failed_step_retry():
    """With a tiny outer_maximum the first large step fails; ATS shrinks by
    dtfailadj and re-solves (mf6core.f90 sim_step_retry)."""
    sim = make_sim(outer_maximum=2)
    # under-relaxation off, 2 outers: a big first step from a poor initial
    # guess can fail; small steps converge in 1-2 outers
    sim.ats[1] = AtsPeriod(dt0=100.0, dtmin=1e-3, dtmax=100.0, dtadj=1.0,
                           dtfailadj=10.0)
    recs = sim.run()
    assert all(r.converged for r in recs)
    np.testing.assert_allclose(recs[-1].totim, 100.0, rtol=1e-12)


def test_ats_respects_dtmin_truncation():
    sim = make_sim()
    sim.ats[1] = AtsPeriod(dt0=40.0, dtmin=1.0, dtmax=40.0, dtadj=1.0)
    recs = sim.run()
    # 40 + 40 + 20 (truncated at period end)
    delts = np.diff([0.0] + [r.totim for r in recs])
    np.testing.assert_allclose(delts, [40.0, 40.0, 20.0], rtol=1e-12)
