"""OBS: continuous observations.

Behavioral parity target: ObsType (reference src/Utilities/Observation/
Obs.f90:108-209): named observations of model values (HEAD / DRAWDOWN at a
cell; package flows by boundary entry) written one row per time step to a
CSV file whose header carries the observation names — directly loadable by
pandas/FloPy like the reference's obs csv output.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class ObsRecord:
    """One continuous observation (obsname, obstype, location)."""

    name: str
    kind: str      # "head" | "drawdown"
    node: int


class ObsManager:
    """Collects per-step observation values and writes the CSV."""

    def __init__(self, records, csv_path, digits=10):
        self.records = list(records)
        self.csv_path = csv_path
        self.digits = digits
        self._rows = []
        self._strt = None

    def set_initial(self, strt):
        self._strt = np.asarray(strt)

    def record(self, totim, head):
        h = np.asarray(head)
        vals = []
        for r in self.records:
            kind = r.kind.lower()
            if kind == "head":
                vals.append(h[r.node])
            elif kind == "drawdown":
                vals.append(self._strt[r.node] - h[r.node])
            else:
                raise ValueError(f"unknown observation type {r.kind!r}")
        self._rows.append((totim, vals))

    def close(self):
        with open(self.csv_path, "w") as f:
            f.write("time," + ",".join(r.name for r in self.records) + "\n")
            for totim, vals in self._rows:
                f.write(f"{totim:.{self.digits}g},"
                        + ",".join(f"{v:.{self.digits}g}" for v in vals)
                        + "\n")
