"""GWE model: groundwater energy (heat) transport on a GWF flow field.

Behavioral parity target: GweModelType (reference
src/Model/GroundWaterEnergy/gwe.f90:33) with packages ADV (shared with GWT,
scaled by eqnsclfac=rhow*cpw), CND (conduction + thermal dispersion),
EST (energy storage incl. the solid phase), CTP (constant temperature,
the CNC analog), ESL (energy source loading, the SRC analog), and SSM over
the GWF boundary flows.  Shares the transport infrastructure with GWT
(reference tsp.f90:30-55 base-class pattern): same FMI FlowFields, same
ELL assembly, same NumericalSolution interface.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

from ...constants import DZERO
from ..gwf import npf as npf_mod
from ..gwt import adv as adv_mod
from ..gwt.model import CncData, SrcData
from . import cnd as cnd_mod
from . import est as est_mod


@dataclasses.dataclass
class GweModel:
    """Heat-transport model container (same interface as GwtModel)."""

    name: str
    grid: object
    topo: object
    dtopo: npf_mod.DeviceTopology
    strt: object                  # initial temperature
    ibound0: object
    est_opts: est_mod.EstOptions
    est_arrays: est_mod.EstArrays
    iadvwt: int = adv_mod.UPSTREAM
    cnd: Optional[cnd_mod.CndData] = None
    ctp: Optional[CncData] = None   # constant temperature (gwe-ctp)
    esl: Optional[SrcData] = None   # energy source loading (gwe-esl)
    ssm_on: bool = True
    ssm_spec: Optional[dict] = None  # pkg name → source temperature
    top: object = None
    bot: object = None
    area: object = None
    inewton: int = 0
    use_structured: bool = False

    @property
    def nodes(self) -> int:
        return self.dtopo.nodes

    @property
    def eqnsclfac(self) -> float:
        return self.est_opts.eqnsclfac

    @property
    def packages(self):
        return None

    def boundary_state(self, temp, pkgs=None):
        """CTP: pin constant-temperature cells (reference gwe-ctp.f90)."""
        ibound = jnp.asarray(self.ibound0, jnp.int32)
        if self.ctp is not None:
            ibound = ibound.at[self.ctp.node].set(
                jnp.where(self.ctp.mask, -1, ibound[self.ctp.node]))
            temp = temp.at[self.ctp.node].set(
                jnp.where(self.ctp.mask, self.ctp.conc, temp[self.ctp.node]))
        return ibound, temp

    def set_flows(self, fields):
        self._fields = fields

    def assemble(self, temp, temp_old, ibound, delt, iss: bool, pkgs=None):
        """Build the energy-transport system at the current iterate."""
        fields = pkgs if pkgs is not None else self._fields
        N, K = self.nodes, self.dtopo.max_degree
        top, bot, area = self.top, self.bot, self.area
        scl = self.eqnsclfac

        # ADV: advective energy flux = q * rhow * cpw * T
        diag, off = adv_mod.assemble(self.dtopo, self.iadvwt, fields, ibound,
                                     top, bot, scl)
        rhs = jnp.zeros(N)
        if self.iadvwt == adv_mod.TVD:
            rhs = rhs + adv_mod.tvd_rhs(self.dtopo, fields, ibound, temp, scl)

        # CND: conduction + thermal dispersion — conductance is already in
        # energy units (gwe-cnd.f90 cnd_fc adds dispcoef unscaled)
        if self.cnd is not None:
            n, m = self.dtopo.edge_n, self.dtopo.edge_m
            dcond = cnd_mod.edge_conductance(
                self.dtopo, self.cnd, self.est_arrays.porosity, scl, fields,
                ibound, top, bot)
            act = (ibound[n] != 0) & (ibound[m] != 0)
            dcond = jnp.where(act, dcond, DZERO)
            off_flat = off.reshape(N * K)
            off_flat = off_flat.at[self.dtopo.slot_nm].add(dcond)
            off_flat = off_flat.at[self.dtopo.slot_mn].add(dcond)
            off = off_flat.reshape(N, K)
            diag = diag.at[n].add(-dcond).at[m].add(-dcond)

        # EST storage (aqueous + solid phase)
        hcof, rhs_coeff = est_mod.storage_terms(self.est_opts,
                                                self.est_arrays, fields,
                                                ibound, top, bot, area, delt)
        diag = diag + hcof
        rhs = rhs + rhs_coeff * temp_old

        # EST zero-order energy decay
        if self.est_opts.idcy != est_mod.DECAY_OFF:
            rhs = rhs + est_mod.decay_terms(self.est_opts, self.est_arrays,
                                            fields, ibound, top, bot, area)

        # SSM: boundary flows carry energy at source/cell temperature
        if self.ssm_on:
            q = fields.bound_q * scl
            node = fields.bound_node
            act = fields.bound_mask & (ibound[node] > 0)
            inflow = q >= DZERO
            rhs = rhs.at[node].add(
                jnp.where(act & inflow, -q * fields.bound_conc, DZERO))
            diag = diag.at[node].add(jnp.where(act & ~inflow, q, DZERO))

        # ESL: direct energy loading rate (no eqnsclfac — already energy)
        if self.esl is not None:
            act = self.esl.mask & (ibound[self.esl.node] > 0)
            rhs = rhs.at[self.esl.node].add(
                jnp.where(act, -self.esl.q, DZERO))

        return diag, off, rhs

    def edge_conductances(self, temp, ibound, pkgs=None):
        return jnp.zeros_like(self.dtopo.cl1)
