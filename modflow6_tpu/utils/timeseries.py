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


@dataclasses.dataclass(frozen=True)
class TimeArraySeries:
    """TAS: a time series of whole arrays (utl-tas.dfn / reference
    TimeArraySeries.f90): the array bound to an array-package variable
    (RCH/EVT recharge, rates…) for a step is the time-average of the
    interpolated array over [t0, t1] (LINEAR) or the piecewise-constant
    value (STEPWISE); SFAC scales the result."""

    name: str
    times: np.ndarray       # f64[nt], strictly increasing
    arrays: np.ndarray      # f64[nt, ...]
    method: int = LINEAR
    sfac: float = 1.0

    @classmethod
    def create(cls, name, times, arrays, method="linear", sfac=1.0):
        t = np.asarray(times, float)
        a = np.asarray(arrays, float)
        if np.any(np.diff(t) <= 0):
            raise ValueError("TAS times must be increasing")
        if a.shape[0] != t.shape[0]:
            raise ValueError("TAS needs one array per time")
        m = _METHODS[method.lower()] if isinstance(method, str) else method
        if m == LINEAREND:
            raise ValueError("TAS supports LINEAR or STEPWISE")
        return cls(name, t, a, m, float(sfac))

    def value_at(self, t: float) -> np.ndarray:
        t = min(max(t, self.times[0]), self.times[-1])
        if self.method == STEPWISE:
            i = max(np.searchsorted(self.times, t, "right") - 1, 0)
            return self.arrays[i] * self.sfac
        i = np.searchsorted(self.times, t, "right")
        i = min(max(i, 1), len(self.times) - 1)
        t0, t1 = self.times[i - 1], self.times[i]
        w = (t - t0) / (t1 - t0)
        return ((1 - w) * self.arrays[i - 1] + w * self.arrays[i]) \
            * self.sfac

    def step_value(self, t0: float, t1: float) -> np.ndarray:
        """Time-averaged array over the step (get_integrated_value)."""
        if t1 <= t0:
            return self.value_at(t1)
        knots = self.times[(self.times > t0) & (self.times < t1)]
        pts = np.concatenate([[t0], knots, [t1]])
        total = np.zeros_like(self.arrays[0])
        for a, b in zip(pts[:-1], pts[1:]):
            if self.method == STEPWISE:
                total = total + self.value_at(a) * (b - a)
            else:
                total = total + 0.5 * (self.value_at(a)
                                       + self.value_at(b)) * (b - a)
        return total / (t1 - t0)


def load_tas(path, shape, base_dir="."):
    """Read a utl-tas TAS6 file → TimeArraySeries (ATTRIBUTES + one
    READARRAY per TIME block)."""
    from .mf6io.reader import BlockFile
    from .mf6io.arrays import ArrayReader

    bf = BlockFile(path)
    name, method, sfac = "tas", "linear", 1.0
    attrs = bf.get("ATTRIBUTES")
    if attrs is not None:
        for toks in attrs.lines:
            key = toks[0].upper()
            if key == "NAME":
                name = toks[1]
            elif key == "METHOD":
                method = toks[1].lower()
            elif key == "SFAC":
                sfac = float(toks[1])
    times, arrays = [], []
    n = int(np.prod(shape))
    for b in bf.get_all("TIME"):
        times.append(float(b.index))
        rdr = ArrayReader(base_dir)
        arr, _ = rdr.read(b.lines, 0, n)
        arrays.append(arr.reshape(shape))
    return TimeArraySeries.create(name, times, arrays, method, sfac)


def bind_array_series(sim, tas: TimeArraySeries, setter):
    """Per-step TAS application on a Simulation (TasManager ad role):
    ``setter(array)`` receives the step-averaged array before every
    solve attempt AND before the step's package snapshot (step_hooks),
    so budgets and outputs see the same array the solve used."""
    def hook(kper, kstp, delt):
        totim0 = sum(r.totim for r in sim.records[-1:])
        setter(tas.step_value(totim0, totim0 + delt))

    sim.step_hooks.append(hook)
    return hook


def load_ts6(path):
    """utl-ts TS6 file → {name: TimeSeries} (reference TimeSeries.f90 /
    utl-ts.dfn: ATTRIBUTES names/methods/sfacs + TIMESERIES rows)."""
    from .mf6io.reader import BlockFile

    bf = BlockFile(path)
    attrs = bf.get("ATTRIBUTES")
    names, methods, sfacs = [], [], []
    for toks in attrs.lines:
        kw = toks[0].upper()
        if kw in ("NAME", "NAMES"):
            names = [t for t in toks[1:]]
        elif kw in ("METHOD", "METHODS"):
            methods = [t.lower() for t in toks[1:]]
        elif kw in ("SFAC", "SFACS"):
            sfacs = [float(t) for t in toks[1:]]
    if not methods:
        methods = ["linear"]
    if len(methods) == 1:
        methods = methods * len(names)
    if not sfacs:
        sfacs = [1.0] * len(names)
    rows = [[float(v) for v in toks]
            for toks in bf.get("TIMESERIES").lines]
    arr = np.asarray(rows, float)
    out = {}
    for i, nm in enumerate(names):
        out[nm.upper()] = TimeSeries.create(
            nm, arr[:, 0], arr[:, i + 1] * sfacs[i], method=methods[i])
    return out
