"""SWF-GWF exchange: surface-water ↔ groundwater leakage coupling.

Behavioral parity target: src/Exchange/exg-swfgwf.f90 (and the CHF-GWF /
OLF-GWF thin types): per linked (swf cell, gwf cell) pair a vertical
leakage conductance couples the two models,

    q = cond · (stage − head)        (positive = into the aquifer)

with the surface cell's contribution smoothly shut off as it dries.  The
reference assembles both models into one global matrix; here the two
models are solved sequentially inside a Picard loop over the exchange
(the reference's solution-group mxiter pattern, SolutionGroup.f90:48-106)
— each sweep the GWF model sees the leakage as a RIV-like term and the
SWF model sees the equal-and-opposite term.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from ...constants import DZERO
from ...solution.ims import ImsSettings, NumericalSolution
from .model import SwfModel, _squadratic


@dataclasses.dataclass
class SwfGwfExchange:
    """Linked cell pairs (exg-swfgwf exchangedata)."""

    swf_node: np.ndarray   # i32[B]
    gwf_node: np.ndarray   # i32[B]
    cond: np.ndarray       # f64[B] = bedleak · cfact


class CoupledSwfGwf:
    """Sequential CHF/OLF ↔ GWF stepping with exchange Picard iteration."""

    def __init__(self, swf: SwfModel, gwf, exchange: SwfGwfExchange,
                 swf_settings=None, gwf_settings=None, mxiter=30,
                 dvclose=1e-7):
        self.swf = swf
        self.gwf = gwf
        self.exg = exchange
        self.mxiter = mxiter
        self.dvclose = dvclose
        self.swf_sol = NumericalSolution(swf, swf_settings or ImsSettings(
            outer_dvclose=1e-8, inner_dvclose=1e-10, inner_rclose=1e-9,
            inner_maximum=500, outer_maximum=100,
            linear_acceleration="bicgstab", no_ptc=True,
            under_relaxation="dbd", theta=0.9, akappa=1e-4))
        self.gwf_sol = NumericalSolution(gwf, gwf_settings or ImsSettings(
            outer_dvclose=1e-8, inner_dvclose=1e-10, inner_rclose=1e-9,
            inner_maximum=500, outer_maximum=100))
        self._sn = jnp.asarray(self.exg.swf_node, jnp.int32)
        self._gn = jnp.asarray(self.exg.gwf_node, jnp.int32)
        self._c = jnp.asarray(self.exg.cond)

    def leakage(self, stage, head):
        """q per pair, positive into the aquifer, dry-cell smoothed."""
        depth = stage[self._sn] - self.swf.bot[self._sn]
        f = _squadratic(depth, 1e-4)
        dh = stage[self._sn] - head[self._gn]
        # infiltration shuts off as the surface cell dries; exfiltration
        # (head above stage) stays active
        return self._c * jnp.where(dh > 0, f * dh, dh)

    def step(self, stage_old, head_old, delt, kstp=1, iss_gwf=False):
        """One coupled time step: Picard over the exchange flux."""
        from .model import SwfPackageData
        stage, head = stage_old, head_old
        base_flw = self.swf.flw
        for it in range(self.mxiter):
            # SWF solves with the leakage as a head-dependent (GHB-like)
            # term at the current aquifer heads — Newton-robust, unlike a
            # lagged fixed flux which can pump a reach dry
            lkg = (self._sn, head[self._gn], self._c)
            stage_new, sinfo, _ = self.swf_sol.solve_timestep(
                stage_old, delt, kstp=kstp, iss=False,
                pkgs=SwfPackageData(flw=base_flw, lkg=lkg))
            q = self.leakage(stage_new, head)

            # GWF sees +q as well-like inflow at the linked cells
            from ..gwf import bnd
            wel = bnd.WelData(self._gn, q, jnp.ones_like(q, bool))
            pkgs = dataclasses.replace(self.gwf.packages, wel=(
                wel if self.gwf.wel is None else bnd.WelData(
                    jnp.concatenate([self.gwf.wel.node, self._gn]),
                    jnp.concatenate([self.gwf.wel.q, q]),
                    jnp.concatenate([self.gwf.wel.mask,
                                     jnp.ones_like(q, bool)]))))
            head_new, ginfo, _ = self.gwf_sol.solve_timestep(
                head_old, delt, kstp=kstp, iss=iss_gwf, pkgs=pkgs)

            dmax = max(float(jnp.max(jnp.abs(stage_new - stage))),
                       float(jnp.max(jnp.abs(head_new - head))))
            stage, head = stage_new, head_new
            if sinfo.converged and ginfo.converged and dmax <= self.dvclose:
                return stage, head, dict(converged=True, exg_iters=it + 1,
                                         q=q)
        return stage, head, dict(converged=False, exg_iters=self.mxiter,
                                 q=self.leakage(stage, head))
