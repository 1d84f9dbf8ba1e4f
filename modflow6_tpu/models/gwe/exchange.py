"""GWE-GWE exchange: merge energy-transport models over a merged GWF
composite (reference src/Exchange/exg-gwegwe.f90 role — advective +
conductive coupling across the interface, realized here by assembling
one union system like the reference's interface-model path; the GWT
analog lives in gwt/exchange.py merge_gwt_models)."""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from ..gwt.model import CncData, SrcData
from . import cnd as cnd_mod
from . import est as est_mod
from .model import GweModel


def _cat(get, models):
    return jnp.concatenate([jnp.asarray(get(m)) for m in models])


def merge_gwe_models(models, gwf_merged) -> GweModel:
    """Union of GWE models over a merged GWF composite's topology
    (member ordering must match merge_gwf_models)."""
    offsets = list(gwf_merged._offsets)
    m0 = models[0]
    if any(m.iadvwt != m0.iadvwt for m in models):
        raise ValueError("exchange requires a consistent ADV scheme")
    if any((m.cnd is None) != (m0.cnd is None) for m in models):
        raise ValueError("exchange requires consistent CND usage")
    if any(m.est_opts != m0.est_opts for m in models):
        raise ValueError("exchange requires identical EST options "
                         "(rhow/cpw/decay mode)")

    def cat_pkg(cls, get):
        live = [(get(m), off) for m, off in zip(models, offsets)
                if get(m) is not None]
        if not live:
            return None
        fields = [f.name for f in dataclasses.fields(cls)]
        out = {}
        for f in fields:
            parts = []
            for d, off in live:
                v = jnp.asarray(getattr(d, f))
                if f == "node":
                    v = v + off
                parts.append(v)
            out[f] = jnp.concatenate(parts)
        return cls(**out)

    cnd = None
    if m0.cnd is not None:
        cnd = cnd_mod.CndData(
            alh=_cat(lambda m: m.cnd.alh, models),
            alv=_cat(lambda m: m.cnd.alv, models),
            ath1=_cat(lambda m: m.cnd.ath1, models),
            ath2=_cat(lambda m: m.cnd.ath2, models),
            atv=_cat(lambda m: m.cnd.atv, models),
            ktw=_cat(lambda m: m.cnd.ktw, models),
            kts=_cat(lambda m: m.cnd.kts, models),
            idisp=max(m.cnd.idisp for m in models),
            iktw=max(m.cnd.iktw for m in models),
            ikts=max(m.cnd.ikts for m in models))

    merged = GweModel(
        name="+".join(m.name for m in models),
        grid=gwf_merged.grid, topo=gwf_merged.topo, dtopo=gwf_merged.dtopo,
        strt=_cat(lambda m: m.strt, models),
        ibound0=_cat(lambda m: m.ibound0, models),
        est_opts=m0.est_opts,
        est_arrays=est_mod.EstArrays(
            porosity=_cat(lambda m: m.est_arrays.porosity, models),
            cps=_cat(lambda m: m.est_arrays.cps, models),
            rhos=_cat(lambda m: m.est_arrays.rhos, models),
            decay_water=_cat(lambda m: m.est_arrays.decay_water, models),
            decay_solid=_cat(lambda m: m.est_arrays.decay_solid, models)),
        iadvwt=m0.iadvwt, cnd=cnd,
        ctp=cat_pkg(CncData, lambda m: m.ctp),
        esl=cat_pkg(SrcData, lambda m: m.esl),
        ssm_spec=m0.ssm_spec,
        top=jnp.asarray(np.asarray(gwf_merged.grid.top).reshape(-1)),
        bot=jnp.asarray(np.asarray(gwf_merged.grid.bot).reshape(-1)),
        area=jnp.asarray(np.asarray(gwf_merged.grid.area).reshape(-1)))
    merged._offsets = offsets
    return merged
