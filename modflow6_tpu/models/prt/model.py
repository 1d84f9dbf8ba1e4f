"""PRT model: particle tracking on GWF flow fields.

Behavioral parity target: PrtModelType (reference
src/Model/ParticleTracking/prt.f90:41, explicit ``model_solve`` per step
prt.f90:62-85) with the PRP release-point package (prt-prp.f90) and MIP
porosity.  The tracking itself lives in tracking.py (Pollock kernels);
this module is the host-side orchestration: build face flows from the
solved GWF step (the exg-gwfprt / FMI wiring) and advance all particles by
one time step's budget.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..gwf import npf as npf_mod
from . import tracking


@dataclasses.dataclass
class ReleasePoints:
    """PRP: particle release points in model coordinates (prt-prp.f90)."""

    x: np.ndarray
    y: np.ndarray
    z: np.ndarray


@dataclasses.dataclass
class PrtModel:
    """Host-side particle-tracking model over a DIS grid."""

    name: str
    grid: object                 # DisGrid
    porosity: object             # f64[N] (MIP package)
    prp: ReleasePoints

    def locate(self):
        """Map release coordinates to (lay, row, col) (host-side setup)."""
        g = self.grid
        delr = np.asarray(g.delr, float)
        delc = np.asarray(g.delc, float)
        xedge = np.concatenate([[0.0], np.cumsum(delr)])
        ytot = delc.sum()
        yedge = ytot - np.concatenate([[0.0], np.cumsum(delc)])
        col = np.clip(np.searchsorted(xedge, self.prp.x, "right") - 1,
                      0, len(delr) - 1)
        # yedge is decreasing; row r spans [yedge[r+1], yedge[r])
        row = np.clip(len(delc) - np.searchsorted(yedge[::-1], self.prp.y,
                                                  "left"),
                      0, len(delc) - 1)
        top3 = np.asarray(g.top).reshape(g.shape)
        bot3 = np.asarray(g.bot).reshape(g.shape)
        nlay = g.shape[0]
        lay = np.zeros_like(col)
        for L in range(nlay):
            above = self.prp.z < bot3[L, row, col]
            lay = np.where(above, L + 1, lay)
        lay = np.clip(lay, 0, nlay - 1)
        return (lay.astype(np.int32), row.astype(np.int32),
                col.astype(np.int32))

    def make_step(self, gwf_model):
        """Build the jittable swarm step: (head, ibound, cond, state, dt) →
        new particle state dict."""
        g = self.grid
        dtopo = gwf_model.dtopo
        top3 = jnp.asarray(g.top).reshape(g.shape)
        bot3 = jnp.asarray(g.bot).reshape(g.shape)

        def step(head, ibound, cond, x, y, z, lay, row, col, dt):
            q_edge = npf_mod.flowja(dtopo, cond, head)
            sat = npf_mod.compute_saturation(gwf_model.npf_opts,
                                             gwf_model.npf_arrays, head,
                                             ibound)
            flows = tracking.build_cell_flows(gwf_model.topo, g, q_edge,
                                              self.porosity, sat)
            track = tracking.make_tracker(flows)
            return track(x, y, z, lay, row, col, top3, bot3, dt)

        return step

    def initial_state(self):
        lay, row, col = self.locate()
        return (jnp.asarray(self.prp.x, jnp.float64),
                jnp.asarray(self.prp.y, jnp.float64),
                jnp.asarray(self.prp.z, jnp.float64),
                jnp.asarray(lay), jnp.asarray(row), jnp.asarray(col))
