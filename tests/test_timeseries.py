"""TimeSeries interpolation tests (reference TimeSeries.f90 semantics)."""

import numpy as np
import pytest

from modflow6_tpu.utils.timeseries import (LINEAR, STEPWISE, TimeSeries)


def test_linear_step_average():
    ts = TimeSeries.create("q", [0.0, 10.0], [0.0, 10.0], "linear")
    # average of a linear ramp over [2, 6] is the midpoint value 4
    np.testing.assert_allclose(ts.step_value(2.0, 6.0), 4.0)
    np.testing.assert_allclose(ts.value_at(3.5), 3.5)


def test_stepwise_average_across_knot():
    ts = TimeSeries.create("q", [0.0, 5.0, 10.0], [2.0, 4.0, 4.0],
                           "stepwise")
    # [3, 7]: 2 units at value 2 + 2 units at value 4 → avg 3
    np.testing.assert_allclose(ts.step_value(3.0, 7.0), 3.0)
    np.testing.assert_allclose(ts.value_at(4.999), 2.0)
    np.testing.assert_allclose(ts.value_at(5.0), 4.0)


def test_linearend_takes_end_value():
    ts = TimeSeries.create("q", [0.0, 10.0], [0.0, 10.0], "linearend")
    np.testing.assert_allclose(ts.step_value(2.0, 6.0), 6.0)


def test_clamping_and_validation():
    ts = TimeSeries.create("q", [1.0, 2.0], [5.0, 6.0])
    np.testing.assert_allclose(ts.value_at(0.0), 5.0)   # clamped
    np.testing.assert_allclose(ts.value_at(9.0), 6.0)
    with pytest.raises(ValueError):
        TimeSeries.create("bad", [1.0, 1.0], [0.0, 0.0])


def test_linear_average_across_knots_exact():
    ts = TimeSeries.create("q", [0.0, 2.0, 4.0], [0.0, 4.0, 0.0], "linear")
    # symmetric triangle over [0,4]: average = 2
    np.testing.assert_allclose(ts.step_value(0.0, 4.0), 2.0)


def test_ts6_per_entry_binding(tmp_path):
    """A WEL rate given as a TS6 series name follows the series
    (utl-ts per-entry attachment, TsManager role)."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_advanced_decks import _sim_files, write
    from modflow6_tpu.utils.mf6io import load_simulation

    ws = str(tmp_path)
    _sim_files(ws, "  WEL6 model.wel wel-1", nper=1, perlen="4.0 4 1.0")
    write(ws, "model.wel", """
BEGIN OPTIONS
  TS6 FILEIN model.ts
END OPTIONS
BEGIN DIMENSIONS
  MAXBOUND 1
END DIMENSIONS
BEGIN PERIOD 1
  1 1 4 pumprate
END PERIOD
""")
    write(ws, "model.ts", """
BEGIN ATTRIBUTES
  NAME pumprate
  METHOD STEPWISE
END ATTRIBUTES
BEGIN TIMESERIES
  0.0 -10.0
  2.0 -40.0
  4.0 -40.0
END TIMESERIES
""")
    sim = load_simulation(ws)
    qlog = []

    def spy(kper, kstp, delt):
        pass

    recs = sim.run()
    assert all(r.converged for r in recs)
    # head at the well cell drops when the rate steps from -10 to -40
    h = [r.head.reshape(-1)[3] for r in recs]
    dd_early = h[0]
    dd_late = h[-1]
    assert dd_late < dd_early - 0.01
    # and the bound value in the active package data is the late rate
    q = float(np.asarray(sim.period_packages(1).wel.q)[0])
    np.testing.assert_allclose(q, -40.0)
