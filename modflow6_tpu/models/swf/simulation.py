"""SWF standalone simulation driver: walks TDIS, solves each step with
NumericalSolution, tracks the volumetric budget, and writes stage/.lst
outputs — the role the reference's RunControl + NumericalSolution play
for a single CHF/OLF model (chf.f90/olf.f90 over swf.f90).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from ...solution.ims import ImsSettings, NumericalSolution
from ...utils.budget import Budget
from .model import _squadratic


@dataclasses.dataclass
class SwfStepRecord:
    kper: int
    kstp: int
    totim: float
    stage: np.ndarray
    converged: bool


class SwfSimulation:
    """Single-model CHF/OLF run loop (deck or programmatic)."""

    def __init__(self, tdis, model, settings: ImsSettings = None,
                 sto_periods=None, has_sto=False, hds_path=None, oc=None):
        self.tdis = tdis
        self.model = model
        self.settings = settings or ImsSettings(
            outer_dvclose=1e-8, outer_maximum=300, inner_dvclose=1e-10,
            inner_rclose=1e-9, inner_maximum=500,
            linear_acceleration="bicgstab", no_ptc=True,
            under_relaxation="dbd", theta=0.9, akappa=1e-4, gamma=0.0,
            amomentum=0.0)
        self.solution = NumericalSolution(model, self.settings)
        # per-period steady/transient flags (swf-sto PERIOD blocks);
        # without a STO6 package the model is steady (swf.f90 iss default)
        self.sto_periods = sto_periods or {}
        self.has_sto = has_sto
        self.hds_path = hds_path
        self.oc = oc
        self.budget = Budget()
        self.records = []

    def _iss(self, kper):
        if not self.has_sto:
            return True
        flag = None
        for k in sorted(self.sto_periods):
            if k <= kper:
                flag = self.sto_periods[k]
        return not flag if flag is not None else False

    def _volume(self, stage):
        area = jnp.asarray(self.model.grid.area)
        d = stage - self.model.bot
        return area * d * _squadratic(d)

    def run(self):
        model = self.model
        stage = jnp.asarray(model.strt)
        writer = None
        if self.hds_path:
            from ...utils.binary import HeadFileWriter
            writer = HeadFileWriter(self.hds_path, text="STAGE")
        for kper, kstp, delt, pertim, totim in self.tdis.walk():
            iss = self._iss(kper)
            stage_old = stage
            stage, info, aux = self.solution.solve_timestep(
                stage, delt=delt, kstp=kstp, iss=iss)
            ibound = aux["ibound"]
            flows = model.boundary_budget(stage, ibound)
            for name, q in flows.items():
                self.budget.add_entries(name, np.asarray(q), delt)
            if pkg_chd := model.chd:
                # CHD from the flowja residual at constant-stage reaches
                q_edges = np.asarray(model.edge_flows(stage, ibound))
                en = np.asarray(model.topo.edge_n)
                em = np.asarray(model.topo.edge_m)
                into = np.zeros(model.nodes)
                np.add.at(into, en, q_edges)
                np.add.at(into, em, -q_edges)
                node, _, mask = pkg_chd
                qchd = [-into[n] for n, mk in zip(np.asarray(node),
                                                  np.asarray(mask)) if mk]
                self.budget.add_entries("CHD", qchd, delt)
            if not iss:
                dv = np.asarray(self._volume(stage)
                                - self._volume(jnp.asarray(stage_old)))
                self.budget.add_entries("STO", -dv / delt, delt)
            save = True
            if self.oc is not None:
                nstp = self.tdis.periods[kper - 1].nstp
                save = self.oc.active("SAVE", "STAGE", kper, kstp, nstp) \
                    or self.oc.active("SAVE", "HEAD", kper, kstp, nstp)
            if writer is not None and save:
                writer.write_step(kstp, kper, pertim, totim,
                                  np.asarray(stage)[None, None, :]
                                  if np.asarray(stage).ndim == 1
                                  else np.asarray(stage))
            self.records.append(SwfStepRecord(
                kper=kper, kstp=kstp, totim=totim,
                stage=np.asarray(stage), converged=bool(info.converged)))
        if writer is not None:
            writer.close()
        return self.records
