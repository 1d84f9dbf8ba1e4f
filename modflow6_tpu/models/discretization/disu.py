"""DISU: fully unstructured discretization.

Equivalent in capability to the reference's DISU package
(src/Model/Discretization/Disu.f90): the user supplies the connectivity
(iac/ja) and per-connection geometry (ihc/cl12/hwva/angldegx) directly.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .topology import Topology


@dataclasses.dataclass(frozen=True)
class DisuGrid:
    nodes: int
    top: np.ndarray   # f64[nodes]
    bot: np.ndarray   # f64[nodes]
    area: np.ndarray  # f64[nodes]
    idomain: np.ndarray  # int32[nodes]
    _topology: Topology

    @staticmethod
    def create(top, bot, area, iac, ja, ihc, cl12, hwva, angldegx=None, idomain=None):
        """Build from MF6 DISU CONNECTIONDATA arrays.

        ``ja`` is 0-based here, with each row listing the cell itself first
        (the reference uses 1-based with negative flag for the diagonal; the
        mf6io reader normalizes before calling this).  ``cl12``/``hwva``/
        ``ihc``/``angldegx`` are parallel to ``ja``.
        """
        top = np.asarray(top, np.float64)
        nodes = top.shape[0]
        bot = np.asarray(bot, np.float64)
        area = np.asarray(area, np.float64)
        iac = np.asarray(iac, np.int64)
        ja = np.asarray(ja, np.int64)
        ihc = np.asarray(ihc, np.int64)
        cl12 = np.asarray(cl12, np.float64)
        hwva = np.asarray(hwva, np.float64)
        angldegx = (np.zeros_like(cl12) if angldegx is None
                    else np.asarray(angldegx, np.float64))
        if idomain is None:
            idomain = np.ones(nodes, np.int32)
        ia = np.zeros(nodes + 1, np.int64)
        ia[1:] = np.cumsum(iac)

        e_n, e_m, e_ihc, e_cl1, e_cl2, e_w, e_ang = [], [], [], [], [], [], []
        # host-side setup loop over rows; runs once per grid
        for n in range(nodes):
            row = ja[ia[n] + 1:ia[n + 1]]
            for idx, m in enumerate(row):
                pos = ia[n] + 1 + idx
                if m <= n:
                    continue  # symmetric half only; cl2 read from m's row below
                # find reciprocal position in row m for cl2
                mrow = ja[ia[m] + 1:ia[m + 1]]
                rpos = ia[m] + 1 + int(np.nonzero(mrow == n)[0][0])
                e_n.append(n)
                e_m.append(int(m))
                e_ihc.append(int(ihc[pos]))
                e_cl1.append(float(cl12[pos]))
                e_cl2.append(float(cl12[rpos]))
                e_w.append(float(hwva[pos]))
                e_ang.append(float(np.deg2rad(angldegx[pos])))
        topo = Topology(
            nodes=nodes,
            edge_n=np.asarray(e_n, np.int32),
            edge_m=np.asarray(e_m, np.int32),
            ihc=np.asarray(e_ihc, np.int32),
            cl1=np.asarray(e_cl1, np.float64),
            cl2=np.asarray(e_cl2, np.float64),
            hwva=np.asarray(e_w, np.float64),
            direction=np.full(len(e_n), -1, np.int32),
            anglex=np.asarray(e_ang, np.float64),
        )
        return DisuGrid(nodes, top, bot, area, np.asarray(idomain, np.int32), topo)

    @property
    def shape(self):
        return (self.nodes,)

    def build_topology(self) -> Topology:
        return self._topology
