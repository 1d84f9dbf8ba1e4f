"""GWT model: solute transport on a GWF flow field.

Behavioral parity target: the GwtModelType phase methods (reference
src/Model/GroundWaterTransport/gwt.f90) with packages ADV, MST, SSM,
CNC (constant concentration), SRC (mass loading) on the FMI flow fields.
The same structure serves GWE heat transport via `eqnsclfac` scaling and
relabeled inputs (reference tsp.f90:30-55).

Per time step the transport system is linear in concentration unless
nonlinear sorption is active — the outer loop then converges in one
(or few) iterations, matching the reference.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ...constants import DZERO
from ..gwf import npf as npf_mod
from . import adv as adv_mod
from . import dsp as dsp_mod
from . import mst as mst_mod
from .fmi import FlowFields


from functools import partial as _partial
import jax as _jax


@_partial(_jax.tree_util.register_dataclass,
          data_fields=["node", "conc", "mask"], meta_fields=[])
@dataclasses.dataclass
class CncData:
    node: object
    conc: object
    mask: object


@_partial(_jax.tree_util.register_dataclass,
          data_fields=["node", "q", "mask"], meta_fields=[])
@dataclasses.dataclass
class SrcData:
    node: object
    q: object      # mass loading rate
    mask: object


@dataclasses.dataclass
class GwtModel:
    """Transport model container (mirrors GwfModel's role)."""

    name: str
    grid: object
    topo: object
    dtopo: npf_mod.DeviceTopology
    strt: object                  # initial concentration
    ibound0: object
    mst_opts: mst_mod.MstOptions
    mst_arrays: mst_mod.MstArrays
    iadvwt: int = adv_mod.UPSTREAM
    eqnsclfac: float = 1.0
    dsp: Optional[dsp_mod.DspData] = None
    cnc: Optional[CncData] = None
    src: Optional[SrcData] = None
    ssm_on: bool = True                 # apply SSM to GWF boundary flows
    ssm_spec: Optional[dict] = None     # pkg name → source concentration
    ist: object = None                  # ist.IstData immobile domain
    cim: object = None                  # immobile conc state (host-updated)
    top: object = None
    bot: object = None
    area: object = None
    inewton: int = 0
    use_structured: bool = False  # transport fill is edge-based (flows are
    #                               per-edge); scatter cost is fine since the
    #                               matrix is rebuilt once per (linear) solve

    @property
    def nodes(self) -> int:
        return self.dtopo.nodes

    @property
    def packages(self):
        return None

    def boundary_state(self, conc, pkgs=None):
        ibound = jnp.asarray(self.ibound0, jnp.int32)
        if self.cnc is not None:
            ibound = ibound.at[self.cnc.node].set(
                jnp.where(self.cnc.mask, -1, ibound[self.cnc.node]))
            conc = conc.at[self.cnc.node].set(
                jnp.where(self.cnc.mask, self.cnc.conc, conc[self.cnc.node]))
        return ibound, conc

    def set_flows(self, fields: FlowFields):
        self._fields = fields

    def assemble(self, conc, conc_old, ibound, delt, iss: bool, pkgs=None):
        """Build the transport system at the current concentration iterate.

        ``pkgs`` carries the FlowFields pytree (the per-step coupling data,
        analogous to GWF's per-period PackageData) so flow updates pass
        through jit as arguments rather than stale closure constants.
        """
        fields = pkgs if pkgs is not None else self._fields
        N, K = self.nodes, self.dtopo.max_degree
        top, bot, area = self.top, self.bot, self.area

        # ADV
        diag, off = adv_mod.assemble(self.dtopo, self.iadvwt, fields, ibound,
                                     top, bot, self.eqnsclfac)
        rhs = jnp.zeros(N)
        if self.iadvwt == adv_mod.TVD:
            rhs = rhs + adv_mod.tvd_rhs(self.dtopo, fields, ibound, conc,
                                        self.eqnsclfac)

        # DSP (dispersion): per-step velocity-dependent conductance
        # (dsp_ad → calcdispellipse → calcdispcoef chain, then the dsp_fc
        # conductance-style fill)
        if self.dsp is not None:
            n, m = self.dtopo.edge_n, self.dtopo.edge_m
            dcond = dsp_mod.edge_conductance(
                self.dtopo, self.dsp, self.mst_arrays.porosity, fields,
                ibound, self.top, self.bot) * self.eqnsclfac
            act = (ibound[n] != 0) & (ibound[m] != 0)
            dcond = jnp.where(act, dcond, DZERO)
            off_flat = off.reshape(N * K)
            off_flat = off_flat.at[self.dtopo.slot_nm].add(dcond)
            off_flat = off_flat.at[self.dtopo.slot_mn].add(dcond)
            off = off_flat.reshape(N, K)
            diag = diag.at[n].add(-dcond).at[m].add(-dcond)

        # MST storage
        hcof, rhs_coeff = mst_mod.storage_terms(self.mst_arrays, fields,
                                                ibound, top, bot, area, delt)
        diag = diag + hcof
        rhs = rhs + rhs_coeff * conc_old

        # decay
        if self.mst_opts.idcy != mst_mod.DECAY_OFF:
            dl = getattr(self, "_decaylast", self.mst_arrays.decay)
            hcof, r, dl_new = mst_mod.decay_terms(
                self.mst_opts, self.mst_arrays, fields, ibound, top, bot,
                area, conc_old, conc, delt, True, dl)
            diag = diag + hcof
            rhs = rhs + r

        # sorption
        if self.mst_opts.isrb != mst_mod.SORPTION_OFF:
            hcof, r = mst_mod.sorption_terms(
                self.mst_opts, self.mst_arrays, fields, ibound, top, bot,
                area, conc_old, conc, delt)
            diag = diag + hcof
            rhs = rhs + r
            hcof, r = mst_mod.decay_sorbed_terms(
                self.mst_opts, self.mst_arrays, fields, ibound, top, bot,
                area, conc_old, conc, delt)
            diag = diag + hcof
            rhs = rhs + r

        # SSM: boundary sources/sinks at GWF package flows
        # (reference tsp-ssm.f90 ssm_fc: inflow adds mass at source conc to
        # rhs; outflow leaves at cell conc via the diagonal)
        if self.ssm_on:
            q = fields.bound_q * self.eqnsclfac
            node = fields.bound_node
            act = fields.bound_mask & (ibound[node] > 0)
            inflow = q >= DZERO
            rhs = rhs.at[node].add(
                jnp.where(act & inflow, -q * fields.bound_conc, DZERO))
            diag = diag.at[node].add(jnp.where(act & ~inflow, q, DZERO))

        # IST immobile-domain transfer (gwt-ist.f90 ist_fc; cim rides the
        # FlowFields pytree so per-step updates don't retrace)
        if self.ist is not None and getattr(fields, "cim", None) is not None:
            from . import ist as ist_mod
            hcof, r = ist_mod.ist_terms(self.ist, fields.sat, area, top,
                                        bot, ibound, conc_old, fields.cim,
                                        delt)
            diag = diag + hcof
            rhs = rhs + r

        # SRC mass loading
        if self.src is not None:
            act = self.src.mask & (ibound[self.src.node] > 0)
            rhs = rhs.at[self.src.node].add(
                jnp.where(act, -self.src.q * self.eqnsclfac, DZERO))

        return diag, off, rhs

    def edge_conductances(self, conc, ibound, pkgs=None):
        """Advective 'conductance' per edge is flow-dependent; for budget
        output we return the advective flux coefficients (placeholder)."""
        return jnp.zeros_like(self.dtopo.cl1)
