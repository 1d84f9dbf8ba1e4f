"""Programmatic GWE model construction + coupled GWF→GWE stepping."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ...solution.ims import ImsSettings, NumericalSolution
from ..gwf import npf as npf_mod
from ..gwt import adv as adv_mod
from ..gwt.builder import CoupledGwfGwt
from ..gwt.model import CncData, SrcData
from . import cnd as cnd_mod
from . import est as est_mod
from .model import GweModel


def _full(val, n, dtype=np.float64):
    return jnp.asarray(np.broadcast_to(np.asarray(val, dtype), (n,)).copy())


def build_gwe(
    name,
    grid,
    *,
    porosity=0.3,
    strt=0.0,                    # initial temperature
    scheme="upstream",
    rhow=1000.0,                 # water density
    cpw=4184.0,                  # water heat capacity
    rhos=2650.0,                 # solid density
    cps=800.0,                   # solid heat capacity
    latheatvap=0.0,
    decay=None,                  # (idcysrc, rate_water, rate_solid) or None
    cnd=None,                    # dict(alh=, ath1=, ktw=, kts=, ...)
    ctp=None,                    # [(node, temperature)]
    esl=None,                    # [(node, energy rate)]
    ssm_spec=None,               # dict GWF-package-name → source temperature
) -> GweModel:
    topo = grid.build_topology()
    dtopo = npf_mod.DeviceTopology.from_host(topo)
    N = grid.nodes

    iadvwt = {"upstream": adv_mod.UPSTREAM, "central": adv_mod.CENTRAL,
              "tvd": adv_mod.TVD}[scheme]

    idcy, idcysrc = est_mod.DECAY_OFF, 0
    dw = jnp.zeros(N)
    ds = jnp.zeros(N)
    if decay is not None:
        idcy = est_mod.DECAY_ZERO_ORDER
        idcysrc, rate_w, rate_s = decay
        dw = _full(rate_w, N)
        ds = _full(rate_s, N)

    def pack(entries):
        if not entries:
            return None
        arr = np.asarray(entries, np.float64)
        b = arr.shape[0]
        return (jnp.asarray(arr[:, 0].astype(np.int32)),
                jnp.asarray(arr[:, 1]), jnp.ones(b, bool))

    ctp_d = pack(ctp)
    esl_d = pack(esl)

    model = GweModel(
        name=name, grid=grid, topo=topo, dtopo=dtopo,
        strt=_full(strt, N),
        ibound0=jnp.asarray((grid.idomain.reshape(-1) > 0).astype(np.int32)),
        est_opts=est_mod.EstOptions(idcy=idcy, idcysrc=idcysrc, rhow=rhow,
                                    cpw=cpw, latheatvap=latheatvap),
        est_arrays=est_mod.EstArrays(
            porosity=_full(porosity, N), cps=_full(cps, N),
            rhos=_full(rhos, N), decay_water=dw, decay_solid=ds),
        iadvwt=iadvwt,
        ctp=CncData(*ctp_d) if ctp_d else None,
        esl=SrcData(*esl_d) if esl_d else None,
        ssm_spec=ssm_spec,
        top=jnp.asarray(grid.top), bot=jnp.asarray(grid.bot),
        area=jnp.asarray(grid.area))

    if cnd is not None:
        model.cnd = make_cnd(N, cnd)
    return model


def make_cnd(N, cnd: dict) -> cnd_mod.CndData:
    """CND griddata with the reference's defaulting rules
    (gwe-cnd.f90 read_data: alv←alh, ath2←ath1, atv←0)."""
    idisp = 1 if any(k in cnd for k in ("alh", "alv", "ath1", "ath2", "atv")) \
        else 0
    alh = _full(cnd.get("alh", 0.0), N)
    ath1 = _full(cnd.get("ath1", 0.0), N)
    return cnd_mod.CndData(
        alh=alh,
        alv=_full(cnd["alv"], N) if "alv" in cnd else alh,
        ath1=ath1,
        ath2=_full(cnd["ath2"], N) if "ath2" in cnd else ath1,
        atv=_full(cnd.get("atv", 0.0), N),
        ktw=_full(cnd.get("ktw", 0.0), N),
        kts=_full(cnd.get("kts", 0.0), N),
        idisp=idisp,
        iktw=1 if "ktw" in cnd else 0,
        ikts=1 if "kts" in cnd else 0)


class CoupledGwfGwe(CoupledGwfGwt):
    """Sequential flow→energy stepping: identical orchestration to
    CoupledGwfGwt (the GweModel implements the same transport-model
    interface; reference exg-gwfgwe wiring)."""

    def __init__(self, gwf_model, gwe_model, gwf_settings=None,
                 gwe_settings=None):
        super().__init__(gwf_model, gwe_model, gwf_settings, gwe_settings)
