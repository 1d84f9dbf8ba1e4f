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
    """One continuous observation (obsname, obstype, location).

    kind: "head" | "drawdown" (dependent variable) or "flow" with ``pkg``
    naming the boundary package whose flow at the cell is observed
    (the per-package *-obs wiring of Obs.f90:158-245)."""

    name: str
    kind: str
    node: int = None
    pkg: str = None
    row: int = None    # package entry row (boundname-resolved flow obs)


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

    def record(self, totim, head, flows=None):
        """``flows``: dict PKG → (nodes i64[B], q f64[B]) boundary flows
        of this step (positive into the model), for flow observations."""
        h = np.asarray(head)
        vals = []
        for r in self.records:
            kind = r.kind.lower()
            if kind == "head":
                vals.append(h[r.node])
            elif kind == "drawdown":
                vals.append(self._strt[r.node] - h[r.node])
            elif kind == "flow":
                if flows is None or r.pkg not in flows:
                    vals.append(0.0)
                elif r.row is not None:
                    vals.append(float(flows[r.pkg][1][r.row]))
                else:
                    nodes, q = flows[r.pkg]
                    vals.append(float(np.sum(q[nodes == r.node])))
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


class ObsGroup:
    """Several ObsManagers behind the single Simulation obs slot (one
    OBS6 file can hold multiple CONTINUOUS FILEOUT blocks, Obs.f90)."""

    def __init__(self, managers):
        self.managers = list(managers)

    def set_initial(self, strt):
        for m in self.managers:
            m.set_initial(strt)

    def record(self, totim, head, flows=None):
        for m in self.managers:
            m.record(totim, head, flows=flows)

    def close(self):
        for m in self.managers:
            m.close()


def _parse_obs6(path, cellid, base_dir="."):
    """Tokenize an OBS6 file keeping CONTINUOUS header tails."""
    from .mf6io.reader import tokenize_line

    blocks = []     # (fileout, [record token lists])
    digits = 10
    cur = None
    in_opts = False
    with open(path) as f:
        for line in f:
            toks = tokenize_line(line)
            if not toks:
                continue
            kw = toks[0].upper()
            if kw == "BEGIN":
                name = toks[1].upper()
                if name == "OPTIONS":
                    in_opts = True
                elif name == "CONTINUOUS":
                    if len(toks) < 4 or toks[2].upper() != "FILEOUT":
                        raise ValueError(
                            f"{path}: CONTINUOUS needs FILEOUT <file>")
                    cur = (toks[3], [])
            elif kw == "END":
                if cur is not None:
                    blocks.append(cur)
                cur = None
                in_opts = False
            elif in_opts:
                if kw == "DIGITS":
                    digits = int(toks[1])
            elif cur is not None:
                cur[1].append(toks)
    return blocks, digits


# boundary-flow observation types (per-package *-obs wiring): obstype →
# the boundary_budget key whose flow at the cell is observed
_FLOW_TYPES = {"WEL": "WEL", "DRN": "DRN", "RIV": "RIV", "GHB": "GHB",
               "RCH": "RCH", "EVT": "EVT", "CHD": "CHD",
               "TO-MVR": "TO-MVR"}

_DEPVAR_TYPES = ("HEAD", "CONCENTRATION", "TEMPERATURE", "STAGE")


def load_obs6(path, cellid, base_dir=".", depvar="HEAD",
              bname_rows=None):
    """Parse a utl-obs OBS6 file → ObsGroup.

    ``cellid``: callable(tokens, start) → (node, ntokens) — the grid's
    cell-id reader from the deck loader.  ``depvar``: the model's
    dependent-variable obstype (HEAD / CONCENTRATION / TEMPERATURE /
    STAGE) — requesting a different dependent variable raises (the
    reference's per-model obs type registry, Obs.f90:158-245).
    Supported obstypes: the dependent variable, DRAWDOWN (HEAD models),
    and boundary flows (WEL/DRN/RIV/GHB/RCH/EVT/CHD) identified by a
    cellid or a BOUNDNAME (``bname_rows``: NAME → (PKG, entry row))."""
    import os

    blocks, digits = _parse_obs6(path, cellid, base_dir)
    records_by_file = []
    for fileout, lines in blocks:
        recs = []
        for toks in lines:
            name = toks[0]
            kind = toks[1].upper()
            if kind in _DEPVAR_TYPES:
                if kind != depvar.upper():
                    raise ValueError(
                        f"{path}: observation type {kind} is not this "
                        f"model's dependent variable ({depvar})")
                node, _ = cellid(toks, start=2)
                recs.append(ObsRecord(name, "head", node))
            elif kind == "DRAWDOWN":
                if depvar.upper() != "HEAD":
                    raise ValueError(
                        f"{path}: DRAWDOWN observations need a HEAD model")
                node, _ = cellid(toks, start=2)
                recs.append(ObsRecord(name, "drawdown", node))
            elif kind in _FLOW_TYPES:
                ident = toks[2].upper()
                if bname_rows and ident in bname_rows:
                    # boundname ID (the reference obs ID processor,
                    # Obs.f90 + per-package obsid handling)
                    pkg, row = bname_rows[ident]
                    recs.append(ObsRecord(name, "flow", pkg=pkg,
                                          row=row))
                else:
                    node, _ = cellid(toks, start=2)
                    recs.append(ObsRecord(name, "flow", node,
                                          pkg=_FLOW_TYPES[kind]))
            else:
                raise NotImplementedError(
                    f"observation type {kind} not supported yet")
        records_by_file.append((fileout, recs))
    managers = [ObsManager(recs, os.path.join(base_dir, fileout),
                           digits=digits)
                for fileout, recs in records_by_file]
    return ObsGroup(managers)
