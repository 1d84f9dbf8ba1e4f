"""Convenience builder: construct a GwfModel from plain arrays.

This is the programmatic API the tests (and later the mf6io deck loader)
use; it plays the role of the reference's package create/allocate-read
phase (gwf_cr + package *_ar) without file I/O.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .model import GwfModel
from . import bnd, npf, sto
from .buy import make_buy
from .vsc import make_vsc


def _full(val, n, dtype=np.float64):
    return jnp.asarray(np.broadcast_to(np.asarray(val, dtype), (n,)).copy())


def _pack_bound(entries, fields, maxbound=None):
    """Pad per-entry boundary data to a static maxbound with a mask."""
    b = len(entries)
    mb = maxbound or max(b, 1)
    node = np.zeros(mb, np.int32)
    cols = {f: np.zeros(mb, np.float64) for f in fields}
    mask = np.zeros(mb, bool)
    if b:
        arr = np.asarray(entries, np.float64)
        node[:b] = arr[:, 0].astype(np.int32)
        for i, f in enumerate(fields):
            cols[f][:b] = arr[:, 1 + i]
        mask[:b] = True
    return (jnp.asarray(node), *(jnp.asarray(cols[f]) for f in fields),
            jnp.asarray(mask))


def chd_data(entries, maxbound=None):
    node, head, mask = _pack_bound(entries, ["head"], maxbound)
    return bnd.ChdData(node, head, mask)


def wel_data(entries, maxbound=None):
    node, q, mask = _pack_bound(entries, ["q"], maxbound)
    return bnd.WelData(node, q, mask)


def rch_data(entries, maxbound=None):
    node, recharge, mask = _pack_bound(entries, ["recharge"], maxbound)
    return bnd.RchData(node, recharge, mask)


def drn_data(entries, maxbound=None):
    """entries: (node, elev, cond) or (node, elev, cond, ddrn)."""
    entries = [e if len(e) == 4 else (*e, 0.0) for e in entries]
    node, elev, cond, ddrn, mask = _pack_bound(
        entries, ["elev", "cond", "ddrn"], maxbound)
    return bnd.DrnData(node, elev, cond, ddrn, mask)


def riv_data(entries, maxbound=None):
    node, stage, cond, rbot, mask = _pack_bound(
        entries, ["stage", "cond", "rbot"], maxbound)
    return bnd.RivData(node, stage, cond, rbot, mask)


def ghb_data(entries, maxbound=None):
    node, bhead, cond, mask = _pack_bound(entries, ["bhead", "cond"], maxbound)
    return bnd.GhbData(node, bhead, cond, mask)


def evt_data(entries, maxbound=None):
    """entries: (node, surface, rate, depth[, pxdp*(nseg-1), petm*(nseg-1)])."""
    nextra = max((len(e) - 4 for e in entries), default=0)
    node, surface, rate, depth, mask = _pack_bound(
        [e[:4] for e in entries], ["surface", "rate", "depth"], maxbound)
    pxdp = petm = None
    if nextra > 0:
        assert nextra % 2 == 0, "segmented EVT needs pxdp+petm pairs"
        ns1 = nextra // 2
        mb = maxbound or max(len(entries), 1)
        pxdp_a = np.zeros((mb, ns1))
        petm_a = np.zeros((mb, ns1))
        for i, e in enumerate(entries):
            pxdp_a[i] = e[4:4 + ns1]
            petm_a[i] = e[4 + ns1:4 + 2 * ns1]
        pxdp, petm = jnp.asarray(pxdp_a), jnp.asarray(petm_a)
    return bnd.EvtData(node, surface, rate, depth, mask, pxdp, petm)


def build_gwf(
    name,
    grid,
    *,
    icelltype=0,
    k=1.0,
    k22=None,
    k33=None,
    strt=0.0,
    newton=False,
    icellavg=0,
    ivarcv=0,
    idewatcv=0,
    iperched=0,
    thickstrt=False,
    storage=None,       # dict(ss=..., sy=..., iconvert=..., istor_coef=0)
    chd=None,           # list of (node, head)
    wel=None,           # list of (node, q)
    rch=None,           # list of (node, recharge)
    drn=None,
    riv=None,
    ghb=None,
    evt=None,
    wel_auto_flow_reduce=None,
    buy=None,            # dict(denseref, drhodc, crhoref, iform) buoyancy
    csub=None,           # dict(sgm, sgs, cg_ske_cr, interbeds, ...) CSUB
    vsc=None,            # dict(viscref, dviscdc, cviscref, ivisc) viscosity
    hfb=None,            # list of (n, m, hydchr) barriers
    xt3d=0,              # 0=off 1=full-tensor 2=rhs-only (npf XT3D option)
    angle1=0.0,          # rotated-anisotropy angles, degrees (npf angle1/2/3)
    angle2=0.0,
    angle3=0.0,
    rewetting=None,      # dict(wetdry=f64[N], wetfct, iwetit, ihdwet) —
    #                      the NPF REWET option (gwf-npf.f90 wetting logic)
) -> GwfModel:
    topo = grid.build_topology()
    dtopo = npf.DeviceTopology.from_host(topo)
    N = grid.nodes

    ibound0 = jnp.asarray((grid.idomain.reshape(-1) > 0).astype(np.int32))
    # newton: False | True | "under_relaxation"
    newton_ur = (isinstance(newton, str)
                 and newton.lower() == "under_relaxation")
    newton = bool(newton)
    satomega = 1e-6 if newton else 0.0
    k11 = _full(k, N)
    opts = npf.NpfOptions(
        icellavg=icellavg, inewton=int(newton), ivarcv=ivarcv,
        idewatcv=idewatcv, iperched=iperched,
        ik22=k22 is not None, ik33=k33 is not None,
        thickstrt=thickstrt, satomega=satomega,
        iangle1=int(np.any(np.asarray(angle1) != 0.0)),
        iangle2=int(np.any(np.asarray(angle2) != 0.0)),
        iangle3=int(np.any(np.asarray(angle3) != 0.0)))
    arrays = npf.NpfArrays(
        icelltype=_full(icelltype, N, np.int32),
        k11=k11,
        k22=_full(k22, N) if k22 is not None else k11,
        k33=_full(k33, N) if k33 is not None else k11,
        angle1=_full(angle1, N), angle2=_full(angle2, N),
        angle3=_full(angle3, N),
        condsat=jnp.zeros(dtopo.edge_n.shape[0]),
        top=jnp.asarray(grid.top), bot=jnp.asarray(grid.bot))

    sto_opts = sto_arrays = None
    if storage is not None:
        sto_opts = sto.StoOptions(
            istor_coef=int(storage.get("istor_coef", 0)),
            iconf_ss=int(storage.get("iconf_ss", 0)),
            inewton=int(newton), satomega=satomega)
        sto_arrays = sto.StoArrays(
            iconvert=_full(storage.get("iconvert", 0), N, np.int32),
            ss=_full(storage.get("ss", 0.0), N),
            sy=_full(storage.get("sy", 0.0), N),
            top=arrays.top, bot=arrays.bot,
            area=jnp.asarray(grid.area))

    model = GwfModel(
        name=name, grid=grid, topo=topo, dtopo=dtopo,
        npf_opts=opts, npf_arrays=arrays,
        strt=_full(strt, N), ibound0=ibound0,
        sto_opts=sto_opts, sto_arrays=sto_arrays,
        chd=chd_data(chd) if chd else None,
        wel=wel_data(wel) if wel else None,
        rch=rch_data(rch) if rch else None,
        drn=drn_data(drn) if drn else None,
        riv=riv_data(riv) if riv else None,
        ghb=ghb_data(ghb) if ghb else None,
        evt=evt_data(evt) if evt else None,
        inewton=int(newton), inewtonur=int(newton_ur),
        wel_iflowred=int(wel_auto_flow_reduce is not None),
        wel_flowred=float(wel_auto_flow_reduce or 0.0),
        buy=None if buy is None else make_buy(**buy),
        vsc=None if vsc is None else make_vsc(**vsc),
        hfb=hfb, ixt3d=int(xt3d),
        wetdry=None if rewetting is None else jnp.asarray(
            np.broadcast_to(np.asarray(rewetting["wetdry"], np.float64),
                            (N,)).copy()),
        rewet_opts=(1.0, 1, 0) if rewetting is None else (
            float(rewetting.get("wetfct", 1.0)),
            int(rewetting.get("iwetit", 1)),
            int(rewetting.get("ihdwet", 0))))
    if csub is not None:
        from .csub import make_csub
        cdata, cstate = make_csub(grid, strt=np.asarray(model.strt),
                                  **csub)
        model.csub = cdata
        model.csub_state0 = cstate
    model.finalize_setup()
    return model
