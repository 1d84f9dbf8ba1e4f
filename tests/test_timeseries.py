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
