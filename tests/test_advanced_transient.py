"""Transient advanced-package PERIOD blocks (kper>1) through the deck
loader: settings persist until redefined and the augmented model is
rebuilt at the period boundary (reference <pkg>_rp re-read semantics)."""

import numpy as np

from modflow6_tpu.utils.mf6io import load_simulation

from test_advanced_decks import _sim_files, write


def test_sfr_inflow_changes_per_period(tmp_path):
    ws = str(tmp_path)
    _sim_files(ws, "  SFR6 model.sfr sfr-1", nper=2,
               perlen="50000.0 10 1.0")
    write(ws, "model.sfr", """
BEGIN OPTIONS
END OPTIONS
BEGIN DIMENSIONS
  NREACHES 2
END DIMENSIONS
BEGIN PACKAGEDATA
  1 1 1 3 100.0 3.0 1.0e-3 40.0 1.0 0.0 0.03 1 1.0 0
  2 1 1 4 100.0 3.0 1.0e-3 39.9 1.0 0.0 0.03 1 1.0 0
END PACKAGEDATA
BEGIN CONNECTIONDATA
  1 -2
  2 1
END CONNECTIONDATA
BEGIN PERIOD 1
  1 INFLOW 1.0
END PERIOD
BEGIN PERIOD 2
  1 INFLOW 5.0
END PERIOD
""")
    sim = load_simulation(ws)
    np.testing.assert_allclose(np.asarray(sim.model.sfr.inflow), [1.0, 0.0])
    recs = sim.run()
    assert all(r.converged for r in recs)
    # period-2 rebuild applied the new inflow
    np.testing.assert_allclose(np.asarray(sim.model.sfr.inflow), [5.0, 0.0])
    # terminal reach routes the period-2 inflow (steady by end of period)
    import jax.numpy as jnp
    x, info, _ = sim.solution.solve_timestep(
        jnp.asarray(sim.model.strt), delt=5e4, kstp=1, iss=False)
    q_man, _ = sim.model.sfr._manning(jnp.asarray(x)[8:])
    # terminal reach carries ~the full period-2 inflow (rhk=0: no
    # aquifer losses), far above the period-1 value of 1.0
    np.testing.assert_allclose(float(np.asarray(q_man)[1]), 5.0, rtol=0.01)


def test_maw_rate_changes_per_period(tmp_path):
    ws = str(tmp_path)
    _sim_files(ws, "  MAW6 model.maw maw-1", nper=2,
               perlen="1000.0 10 1.0")
    write(ws, "model.maw", """
BEGIN OPTIONS
END OPTIONS
BEGIN DIMENSIONS
  NMAWWELLS 1
END DIMENSIONS
BEGIN PACKAGEDATA
  1 0.25 0.0 29.0 SPECIFIED 1
END PACKAGEDATA
BEGIN CONNECTIONDATA
  1 1 1 1 5 50.0 0.0 50.0 0.0
END CONNECTIONDATA
BEGIN PERIOD 1
  1 RATE -10.0
END PERIOD
BEGIN PERIOD 2
  1 RATE -80.0
END PERIOD
""")
    sim = load_simulation(ws)
    np.testing.assert_allclose(np.asarray(sim.model.maw.rate), [-10.0])
    recs = sim.run()
    assert all(r.converged for r in recs)
    np.testing.assert_allclose(np.asarray(sim.model.maw.rate), [-80.0])
    # higher pumping in period 2 draws the aquifer down further
    h_p1 = recs[9].head[4]
    h_p2 = recs[-1].head[4]
    assert h_p2 < h_p1 - 0.05
