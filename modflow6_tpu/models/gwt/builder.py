"""Programmatic GWT model construction + the coupled GWF→GWT step driver."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ...solution.ims import ImsSettings, NumericalSolution
from ..gwf import npf as npf_mod
from . import adv as adv_mod
from . import dsp as dsp_mod
from . import mst as mst_mod
from .fmi import from_gwf_step
from .model import CncData, GwtModel, SrcData


def _full(val, n, dtype=np.float64):
    return jnp.asarray(np.broadcast_to(np.asarray(val, dtype), (n,)).copy())


def build_gwt(
    name,
    grid,
    *,
    porosity=0.3,
    strt=0.0,
    scheme="upstream",           # upstream|central|tvd
    decay=None,                  # (idcy, rate) or None
    sorption=None,               # dict(isrb=..., bulk_density, distcoef, sp2)
    cnc=None,                    # [(node, conc)]
    src=None,                    # [(node, massrate)]
    ssm_spec=None,               # dict GWF-package-name → source conc
    dsp=None,                    # dict(alh=..., ath1=..., diffc=...)
    ist=None,                    # dict(thetaim, zetaim, ...) immobile domain
    eqnsclfac=1.0,
) -> GwtModel:
    topo = grid.build_topology()
    dtopo = npf_mod.DeviceTopology.from_host(topo)
    N = grid.nodes

    iadvwt = {"upstream": adv_mod.UPSTREAM, "central": adv_mod.CENTRAL,
              "tvd": adv_mod.TVD}[scheme]
    idcy = 0
    decay_arr = jnp.zeros(N)
    if decay is not None:
        idcy, rate = decay
        decay_arr = _full(rate, N)
    isrb = 0
    bd = jnp.zeros(N)
    kd = jnp.zeros(N)
    sp2 = jnp.zeros(N)
    if sorption is not None:
        isrb = int(sorption.get("isrb", mst_mod.SORPTION_LINEAR))
        bd = _full(sorption.get("bulk_density", 0.0), N)
        kd = _full(sorption.get("distcoef", 0.0), N)
        sp2 = _full(sorption.get("sp2", 0.0), N)

    def pack(entries):
        if not entries:
            return None
        arr = np.asarray(entries, np.float64)
        b = arr.shape[0]
        return (jnp.asarray(arr[:, 0].astype(np.int32)),
                jnp.asarray(arr[:, 1]), jnp.ones(b, bool))

    cnc_d = pack(cnc)
    src_d = pack(src)

    model = GwtModel(
        name=name, grid=grid, topo=topo, dtopo=dtopo,
        strt=_full(strt, N),
        ibound0=jnp.asarray((grid.idomain.reshape(-1) > 0).astype(np.int32)),
        mst_opts=mst_mod.MstOptions(idcy=idcy, isrb=isrb),
        mst_arrays=mst_mod.MstArrays(
            porosity=_full(porosity, N), decay=decay_arr,
            decay_sorbed=decay_arr, bulk_density=bd, distcoef=kd, sp2=sp2),
        iadvwt=iadvwt, eqnsclfac=eqnsclfac,
        cnc=CncData(*cnc_d) if cnc_d else None,
        src=SrcData(*src_d) if src_d else None,
        ssm_spec=ssm_spec,
        top=jnp.asarray(grid.top), bot=jnp.asarray(grid.bot),
        area=jnp.asarray(grid.area))

    if dsp is not None:
        model.dsp = make_dsp(N, dsp)
    if ist is not None:
        from .ist import make_ist
        model.ist = make_ist(N, **ist)
        model.cim = jnp.zeros(N)
    return model


def make_dsp(N, dsp: dict) -> dsp_mod.DspData:
    """DSP griddata with the reference's defaulting rules
    (gwt-dsp.f90 source_griddata: alv←alh, ath2←ath1, atv←0)."""
    idisp = 1 if any(k in dsp for k in ("alh", "alv", "ath1", "ath2", "atv")) \
        else 0
    idiffc = 1 if "diffc" in dsp else 0
    alh = _full(dsp.get("alh", 0.0), N)
    ath1 = _full(dsp.get("ath1", 0.0), N)
    return dsp_mod.DspData(
        alh=alh,
        alv=_full(dsp["alv"], N) if "alv" in dsp else alh,
        ath1=ath1,
        ath2=_full(dsp["ath2"], N) if "ath2" in dsp else ath1,
        atv=_full(dsp.get("atv", 0.0), N),
        diffc=_full(dsp.get("diffc", 0.0), N),
        idisp=idisp, idiffc=idiffc)


class CoupledGwfGwt:
    """Sequential flow→transport stepping (reference solution-group pattern:
    GWF solved first, FMI hands flows to GWT within the same time step —
    SURVEY §2.8 checklist (c))."""

    def __init__(self, gwf_model, gwt_model, gwf_settings=None,
                 gwt_settings=None):
        self.gwf = gwf_model
        self.gwt = gwt_model
        self.gwf_sol = NumericalSolution(
            gwf_model, gwf_settings or ImsSettings(
                outer_dvclose=1e-8, inner_dvclose=1e-10, inner_rclose=1e-9,
                inner_maximum=1000, outer_maximum=100))
        self.gwt_sol = NumericalSolution(
            gwt_model, gwt_settings or ImsSettings(
                outer_dvclose=1e-8, inner_dvclose=1e-10, inner_rclose=1e-9,
                inner_maximum=1000, outer_maximum=50,
                linear_acceleration="bicgstab"))

    def step(self, head_old, conc_old, delt, kstp=1, iss_flow=False):
        head, finfo, aux = self.gwf_sol.solve_timestep(
            head_old, delt, kstp=kstp, iss=iss_flow)
        fields = from_gwf_step(self.gwf, head, jnp.asarray(head_old),
                               aux["ibound"], aux["cond"], delt, iss_flow,
                               ssm_spec=self.gwt.ssm_spec)
        self.gwt.set_flows(fields)
        # flows ride the pkgs pytree slot → no retrace between steps
        conc, tinfo, taux = self.gwt_sol.solve_timestep(
            conc_old, delt, kstp=kstp, iss=False, pkgs=fields)
        return head, conc, finfo, tinfo
