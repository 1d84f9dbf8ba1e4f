"""DISV: layered vertex (polygon) discretization.

Equivalent in capability to the reference's DISV package
(src/Model/Discretization/Disv.f90): ncpl polygon cells per layer × nlay
layers.  Horizontal connections are discovered from shared polygon edges;
connection lengths are the distances from each cell center to the shared
edge, and hwva is the shared edge length.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .topology import Topology


@dataclasses.dataclass(frozen=True)
class DisvGrid:
    nlay: int
    ncpl: int
    vertices: np.ndarray   # f64[nvert, 2]
    cell_verts: list       # list of int arrays, one per cell (ccw or cw order)
    xc: np.ndarray         # f64[ncpl] cell center x
    yc: np.ndarray         # f64[ncpl] cell center y
    top_surf: np.ndarray   # f64[ncpl]
    botm: np.ndarray       # f64[nlay, ncpl]
    idomain: np.ndarray    # int32[nlay, ncpl]

    @staticmethod
    def create(nlay, ncpl, vertices, cell2d, top, botm, idomain=None):
        """``cell2d`` rows: (xc, yc, [vertex ids 0-based])."""
        vertices = np.asarray(vertices, np.float64)
        xc = np.array([c[0] for c in cell2d], np.float64)
        yc = np.array([c[1] for c in cell2d], np.float64)
        cell_verts = [np.asarray(c[2], np.int64) for c in cell2d]
        top = np.broadcast_to(np.asarray(top, np.float64), (ncpl,)).copy()
        botm = np.broadcast_to(np.asarray(botm, np.float64), (nlay, ncpl)).copy()
        if idomain is None:
            idomain = np.ones((nlay, ncpl), np.int32)
        else:
            idomain = np.broadcast_to(np.asarray(idomain, np.int32), (nlay, ncpl)).copy()
        return DisvGrid(nlay, ncpl, vertices, cell_verts, xc, yc, top, botm, idomain)

    @property
    def shape(self):
        return (self.nlay, self.ncpl)

    @property
    def nodes(self):
        return self.nlay * self.ncpl

    @property
    def top(self) -> np.ndarray:
        tops = np.concatenate([self.top_surf[None], self.botm[:-1]], axis=0)
        return tops.reshape(-1)

    @property
    def bot(self) -> np.ndarray:
        return self.botm.reshape(-1)

    @property
    def area(self) -> np.ndarray:
        areas = np.empty(self.ncpl, np.float64)
        for c in range(self.ncpl):
            v = self.vertices[self.cell_verts[c]]
            x, y = v[:, 0], v[:, 1]
            areas[c] = 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
        return np.tile(areas, self.nlay)

    def build_topology(self) -> Topology:
        nlay, ncpl = self.nlay, self.ncpl
        act = self.idomain != 0

        # --- find shared polygon edges (host setup, once per grid)
        edge_map = {}  # (vmin, vmax) -> (cell, edge geometry)
        horiz = []     # (c1, c2, cl1, cl2, length, anglex of c1→c2 normal)
        for c in range(ncpl):
            vs = self.cell_verts[c]
            for a, b in zip(vs, np.roll(vs, -1)):
                key = (min(a, b), max(a, b))
                if key in edge_map:
                    c0 = edge_map.pop(key)
                    pa, pb = self.vertices[key[0]], self.vertices[key[1]]
                    mid = 0.5 * (pa + pb)
                    length = float(np.hypot(*(pb - pa)))
                    cl_0 = float(np.hypot(self.xc[c0] - mid[0], self.yc[c0] - mid[1]))
                    cl_c = float(np.hypot(self.xc[c] - mid[0], self.yc[c] - mid[1]))
                    lo, hi = (c0, c) if c0 < c else (c, c0)
                    cl_lo, cl_hi = (cl_0, cl_c) if c0 < c else (cl_c, cl_0)
                    ang = float(np.arctan2(self.yc[hi] - self.yc[lo],
                                           self.xc[hi] - self.xc[lo]))
                    horiz.append((lo, hi, cl_lo, cl_hi, length, ang))
                else:
                    edge_map[key] = c

        e_n, e_m, ihc, cl1, cl2, hwva, direction, anglex = ([] for _ in range(8))
        # horizontal connections in every layer
        for k in range(nlay):
            off = k * ncpl
            for (lo, hi, cl_lo, cl_hi, length, ang) in horiz:
                if act[k, lo] and act[k, hi]:
                    e_n.append(off + lo)
                    e_m.append(off + hi)
                    ihc.append(1)
                    cl1.append(cl_lo)
                    cl2.append(cl_hi)
                    hwva.append(length)
                    direction.append(-1)
                    anglex.append(ang)
        # vertical connections with passthrough skipping
        areas = self.area[:ncpl]
        top_full = self.top.reshape(nlay, ncpl)
        for k in range(nlay - 1):
            for c in range(ncpl):
                if self.idomain[k, c] <= 0:
                    continue
                kk = k + 1
                while kk < nlay and self.idomain[kk, c] < 0:
                    kk += 1
                if kk >= nlay or self.idomain[kk, c] <= 0:
                    continue
                e_n.append(k * ncpl + c)
                e_m.append(kk * ncpl + c)
                ihc.append(0)
                cl1.append(0.5 * (top_full[k, c] - self.botm[k, c]))
                cl2.append(0.5 * (top_full[kk, c] - self.botm[kk, c]))
                hwva.append(float(areas[c]))
                direction.append(2)
                anglex.append(0.0)

        edge_n = np.asarray(e_n, np.int64)
        edge_m = np.asarray(e_m, np.int64)
        order = np.lexsort((edge_m, edge_n))
        return Topology(
            nodes=self.nodes,
            edge_n=edge_n[order].astype(np.int32),
            edge_m=edge_m[order].astype(np.int32),
            ihc=np.asarray(ihc, np.int32)[order],
            cl1=np.asarray(cl1, np.float64)[order],
            cl2=np.asarray(cl2, np.float64)[order],
            hwva=np.asarray(hwva, np.float64)[order],
            direction=np.asarray(direction, np.int32)[order],
            anglex=np.asarray(anglex, np.float64)[order],
        )
