"""Zone budget post-processor.

Behavioral parity target: the zbud6 companion executable
(reference utils/zonebudget/src/zbud6.f90 + zone/budget processing):
aggregate cell-by-cell flows by user-assigned integer zones — inter-zone
exchange flows from the FLOW-JA-FACE array plus per-zone boundary-package
and storage totals — and print a zone-budget table with in/out/percent-
discrepancy columns.

Operates directly on the in-memory step results (edge flows + package
flows), the natural form here; the reference reads the same data back from
the .cbc file.
"""

from __future__ import annotations

import numpy as np


class ZoneBudget:
    """Aggregate one time step's flows by zone.

    zones: int array [nodes]; zone 0 is excluded (like zbud6).
    """

    def __init__(self, topo, zones):
        self.topo = topo
        self.zones = np.asarray(zones, np.int64).reshape(-1)
        self.nzones = int(self.zones.max(initial=0))

    def interzone(self, q_edge):
        """Zone-to-zone flow matrix F[z1, z2] = total flow z1 → z2
        (1-based zones; index 0 row/col unused)."""
        q = np.asarray(q_edge)
        zn = self.zones[self.topo.edge_n]
        zm = self.zones[self.topo.edge_m]
        nz = self.nzones + 1
        F = np.zeros((nz, nz))
        # q_edge is positive into n (flowja convention) → flow m→n = q
        sel = (zn != zm)
        for z1, z2, qq in zip(zm[sel], zn[sel], q[sel]):
            if qq >= 0:
                F[z1, z2] += qq
            else:
                F[z2, z1] -= qq
        return F

    def package_totals(self, flows_by_package):
        """Per-zone in/out totals of each boundary package.

        flows_by_package: {name: (nodes, q)} with q positive into the model.
        Returns {name: (zin[nz+1], zout[nz+1])}.
        """
        out = {}
        for name, (nodes, q) in flows_by_package.items():
            nodes = np.asarray(nodes)
            q = np.asarray(q)
            zin = np.zeros(self.nzones + 1)
            zout = np.zeros(self.nzones + 1)
            z = self.zones[nodes]
            np.add.at(zin, z, np.where(q > 0, q, 0.0))
            np.add.at(zout, z, np.where(q < 0, -q, 0.0))
            out[name] = (zin, zout)
        return out

    def table(self, q_edge, flows_by_package=None) -> str:
        """Formatted zone-budget table (zbud6 listing role)."""
        F = self.interzone(q_edge)
        pk = self.package_totals(flows_by_package or {})
        lines = []
        for z in range(1, self.nzones + 1):
            lines.append(f"ZONE {z}")
            tin = tout = 0.0
            for name, (zin, zout) in pk.items():
                lines.append(f"  {name:<16s} IN {zin[z]:15.6e}   "
                             f"OUT {zout[z]:15.6e}")
                tin += zin[z]
                tout += zout[z]
            for z2 in range(1, self.nzones + 1):
                if z2 == z:
                    continue
                fin, fout = F[z2, z], F[z, z2]
                if fin or fout:
                    lines.append(f"  FROM ZONE {z2:<6d} IN {fin:15.6e}   "
                                 f"OUT {fout:15.6e}")
                    tin += fin
                    tout += fout
            denom = 0.5 * (tin + tout)
            pdiff = 100.0 * (tin - tout) / denom if denom > 0 else 0.0
            lines.append(f"  TOTAL            IN {tin:15.6e}   "
                         f"OUT {tout:15.6e}   PERCENT DISCREPANCY "
                         f"{pdiff:10.4f}")
            lines.append("")
        return "\n".join(lines)


def read_cbc_step(topo, cbc_path, kstp, kper):
    """Extract one step's (q_edge, flows_by_package) from a .cbc file —
    the zbud6 post-processing entry point (reads the same ubdsv1/ubdsv06
    records the reference's BudgetFileReader.f90 consumes).

    q_edge is recovered from the FLOW-JA-FACE full-CSR record via the
    topology's symmetric-half positions; imeth=6 records become
    {pakname: (nodes, q)} with storage (STO-*) records passed through too.
    """
    from .binary import read_budget_file

    q_edge = None
    flows = {}
    ia, ja, pos_nm, pos_mn = topo.csr
    for rec in read_budget_file(cbc_path):
        if rec["kstp"] != kstp or rec["kper"] != kper:
            continue
        if rec["text"] == "FLOW-JA-FACE" and rec["imeth"] == 1:
            q_edge = rec["data"][pos_nm]
        elif rec["imeth"] == 6:
            id1, _, q, _ = rec["data"]
            flows[rec["text"]] = (id1, q)
    if q_edge is None:
        raise ValueError(f"no FLOW-JA-FACE record for kstp={kstp} "
                         f"kper={kper} in {cbc_path}")
    return q_edge, flows


def zonebudget_from_cbc(topo, zones, cbc_path, kstp, kper) -> str:
    """zbud6 role: zone-budget table straight from a run's .cbc file."""
    zb = ZoneBudget(topo, zones)
    q_edge, flows = read_cbc_step(topo, cbc_path, kstp, kper)
    return zb.table(q_edge, flows)
