"""Time series: STEPWISE / LINEAR / LINEAREND interpolation of stress data.

Behavioral parity target: src/Utilities/TimeSeries/TimeSeries.f90 —
a named series of (time, value) records with an interpolation method;
the value bound to a package entry for a time step is the series'
time-average over [t0, t1] (STEPWISE integrates the piecewise-constant
function, LINEAR the piecewise-linear one) or the value at the step end
(LINEAREND), matching GetTimeSeriesValue/get_integrated_value semantics.
"""

from __future__ import annotations

import dataclasses

import numpy as np

STEPWISE = 0
LINEAR = 1
LINEAREND = 2

_METHODS = {"stepwise": STEPWISE, "linear": LINEAR, "linearend": LINEAREND}


@dataclasses.dataclass(frozen=True)
class TimeSeries:
    name: str
    times: np.ndarray      # strictly increasing
    values: np.ndarray
    method: int = LINEAR

    @classmethod
    def create(cls, name, times, values, method="linear"):
        t = np.asarray(times, float)
        v = np.asarray(values, float)
        if np.any(np.diff(t) <= 0):
            raise ValueError("time series times must be increasing")
        m = _METHODS[method.lower()] if isinstance(method, str) else method
        return cls(name, t, v, m)

    # -------------------------------------------------------------- values

    def value_at(self, t: float) -> float:
        """Pointwise value (clamped to the series range)."""
        t = min(max(t, self.times[0]), self.times[-1])
        if self.method == STEPWISE:
            i = np.searchsorted(self.times, t, "right") - 1
            return float(self.values[max(i, 0)])
        return float(np.interp(t, self.times, self.values))

    def step_value(self, t0: float, t1: float) -> float:
        """The value a package entry receives for the step [t0, t1]."""
        if self.method == LINEAREND:
            return self.value_at(t1)
        if t1 <= t0:
            return self.value_at(t1)
        return self._integral(t0, t1) / (t1 - t0)

    def _integral(self, t0: float, t1: float) -> float:
        """∫ value dt over [t0, t1] of the interpolated function."""
        knots = self.times[(self.times > t0) & (self.times < t1)]
        pts = np.concatenate([[t0], knots, [t1]])
        total = 0.0
        for a, b in zip(pts[:-1], pts[1:]):
            if self.method == STEPWISE:
                total += self.value_at(a) * (b - a)
            else:
                total += 0.5 * (self.value_at(a) + self.value_at(b)) * (b - a)
        return total


def bind_series(sim, ts: TimeSeries, setter):
    """Register per-step time-series application on a Simulation: before
    each step the interpolated value is handed to ``setter(value)`` (the
    TsManager ad-phase role).  Returns the hook for chaining."""
    orig = sim.solve_step

    def hooked(head_old, kper, kstp, delt):
        totim0 = sum(r.totim for r in sim.records[-1:])  # last accepted totim
        setter(ts.step_value(totim0, totim0 + delt))
        return orig(head_old, kper, kstp, delt)

    sim.solve_step = hooked
    return hooked
