"""Stress (boundary) packages: CHD, WEL, DRN, RIV, GHB, RCH, EVT.

Each package computes per-entry (hcof, rhs) pairs that are scatter-added to
the system diagonal and right-hand side — the vectorized equivalent of the
reference's ``bnd_cf`` + ``bnd_fc`` phases
(src/Model/ModelUtilities/BoundaryPackage.f90:449-482).

Behavioral parity targets:
  - CHD  src/Model/GroundWaterFlow/gwf-chd.f90 (fixes ibound<0 + head)
  - WEL  gwf-wel.f90:296-332 (wel_cf incl. AUTO_FLOW_REDUCE), :378-424 (wel_fn)
  - DRN  gwf-drn.f90:340-373 (drn_cf), :534-574 (get_drain_factor)
  - RIV  gwf-riv.f90:270-299
  - GHB  gwf-ghb.f90:245-265
  - RCH  gwf-rch.f90:303-353
  - EVT  gwf-evt.f90 (evt_cf, segmented or trapezoidal ET)

Entries are padded to a static ``maxbound`` with ``mask=False`` so period
data changes never retrigger compilation.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ...constants import DONE, DZERO
from ...ops.smoothing import (
    quadratic_saturation,
    sq_saturation,
    sq_saturation_derivative,
)


def _bound_dataclass(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    return partial(jax.tree_util.register_dataclass, data_fields=fields,
                   meta_fields=[])(cls)


@_bound_dataclass
@dataclasses.dataclass(frozen=True)
class ChdData:
    node: jax.Array   # i32[B]
    head: jax.Array   # f64[B]
    mask: jax.Array   # bool[B]


@_bound_dataclass
@dataclasses.dataclass(frozen=True)
class WelData:
    node: jax.Array
    q: jax.Array
    mask: jax.Array


@_bound_dataclass
@dataclasses.dataclass(frozen=True)
class RchData:
    node: jax.Array
    recharge: jax.Array  # flux per unit area
    mask: jax.Array


@_bound_dataclass
@dataclasses.dataclass(frozen=True)
class DrnData:
    node: jax.Array
    elev: jax.Array
    cond: jax.Array
    ddrn: jax.Array  # drainage depth (0 unless AUXDEPTHNAME)
    mask: jax.Array


@_bound_dataclass
@dataclasses.dataclass(frozen=True)
class RivData:
    node: jax.Array
    stage: jax.Array
    cond: jax.Array
    rbot: jax.Array
    mask: jax.Array


@_bound_dataclass
@dataclasses.dataclass(frozen=True)
class GhbData:
    node: jax.Array
    bhead: jax.Array
    cond: jax.Array
    mask: jax.Array


@_bound_dataclass
@dataclasses.dataclass(frozen=True)
class EvtData:
    node: jax.Array
    surface: jax.Array
    rate: jax.Array
    depth: jax.Array
    mask: jax.Array
    # segmented ET (NSEG>1, gwf-evt.f90 evt_cf segloop): per-entry interior
    # breakpoints as depth fractions (pxdp, ascending) and rate proportions
    # (petm); None → single linear segment
    pxdp: object = None   # f64[B, nseg-1] or None
    petm: object = None   # f64[B, nseg-1] or None


def apply_chd(ibound, head, chd: ChdData):
    """CHD rp/ad: mark cells constant-head (ibound=-1) and pin their heads."""
    ib = ibound.at[chd.node].set(
        jnp.where(chd.mask, -1, ibound[chd.node]))
    h = head.at[chd.node].set(jnp.where(chd.mask, chd.head, head[chd.node]))
    return ib, h


def wel_terms(wel: WelData, head, ibound, icelltype, top, bot,
              iflowred: int = 0, flowred: float = 0.0):
    """WEL hcof/rhs with optional AUTO_FLOW_REDUCE Newton smoothing."""
    act = wel.mask & (ibound[wel.node] > 0)
    q = wel.q
    if iflowred:
        ict = icelltype[wel.node]
        tp0, bt = top[wel.node], bot[wel.node]
        tp = bt + flowred * (tp0 - bt)
        qmult = sq_saturation(tp, bt, head[wel.node])
        q = jnp.where((ict != 0) & (q < DZERO), q * qmult, q)
    hcof = jnp.zeros_like(q)
    rhs = jnp.where(act, -q, DZERO)
    return hcof, rhs


def wel_newton(wel: WelData, head, ibound, icelltype, top, bot,
               iflowred: int, flowred: float):
    """WEL Newton terms (hcof_add, rhs_add) for AUTO_FLOW_REDUCE (wel_fn)."""
    act = wel.mask & (ibound[wel.node] > 0)
    ict = icelltype[wel.node]
    tp0, bt = top[wel.node], bot[wel.node]
    tp = bt + flowred * (tp0 - bt)
    drterm = sq_saturation_derivative(tp, bt, head[wel.node]) * wel.q
    use = act & (ict != 0) & (wel.q < DZERO) if iflowred else jnp.zeros_like(act)
    hcof = jnp.where(use, drterm, DZERO)
    rhs = jnp.where(use, drterm * head[wel.node], DZERO)
    return hcof, rhs


def rch_terms(rch: RchData, ibound, area):
    act = rch.mask & (ibound[rch.node] > 0)
    hcof = jnp.zeros_like(rch.recharge)
    rhs = jnp.where(act, -rch.recharge * area[rch.node], DZERO)
    return hcof, rhs


def drn_terms(drn: DrnData, head, ibound, icubic_scaling: int = 0):
    act = drn.mask & (ibound[drn.node] > 0)
    x = head[drn.node]
    drnbot = drn.elev
    drntop = drn.elev + drn.ddrn
    has_depth = drn.ddrn != DZERO
    if icubic_scaling:
        fact_smooth = sq_saturation(drntop, drnbot, x, c1=-1.0, c2=2.0)
    else:
        fact_smooth = quadratic_saturation(drntop, drnbot, x, 0.0)
    fact_step = jnp.where(x <= drnbot, DZERO, DONE)
    fact = jnp.where(has_depth, fact_smooth, fact_step)
    hcof = jnp.where(act, -fact * drn.cond, DZERO)
    rhs = jnp.where(act, -fact * drn.cond * drnbot, DZERO)
    return hcof, rhs


def riv_terms(riv: RivData, head, ibound):
    act = riv.mask & (ibound[riv.node] > 0)
    below = head[riv.node] <= riv.rbot
    hcof = jnp.where(act & ~below, -riv.cond, DZERO)
    rhs = jnp.where(
        act,
        jnp.where(below, -riv.cond * (riv.stage - riv.rbot), -riv.cond * riv.stage),
        DZERO)
    return hcof, rhs


def ghb_terms(ghb: GhbData, ibound):
    act = ghb.mask & (ibound[ghb.node] > 0)
    hcof = jnp.where(act, -ghb.cond, DZERO)
    rhs = jnp.where(act, -ghb.cond * ghb.bhead, DZERO)
    return hcof, rhs


def evt_terms(evt: EvtData, head, ibound, area):
    """EVT: linear or segmented ET-vs-depth (reference gwf-evt.f90 evt_cf).

    Single segment: full rate above the ET surface, linear to zero at
    surface − depth.  Segmented (pxdp/petm present): piecewise-linear rate
    proportion between breakpoints, per the evt_cf segloop:
      thcof = −(petm1−petm2)·c/((pxdp2−pxdp1)·x)
      trhs  = thcof·(s − pxdp1·x) + petm1·c
    """
    act = evt.mask & (ibound[evt.node] > 0)
    h = head[evt.node]
    s = evt.surface
    c = evt.rate * area[evt.node]          # max ET volume rate (positive)
    x = jnp.where(evt.depth != 0, evt.depth, DONE)
    above = h >= s
    d = s - h
    below_ext = d >= x

    if evt.pxdp is None:
        thcof = -c / x
        trhs = c - c * s / x
    else:
        nseg1 = evt.pxdp.shape[1]
        ones = jnp.ones((evt.pxdp.shape[0], 1))
        zeros = jnp.zeros((evt.pxdp.shape[0], 1))
        px = jnp.concatenate([zeros, evt.pxdp, ones], axis=1)
        pe = jnp.concatenate([ones, evt.petm, zeros], axis=1)
        dfrac = (d / x)[:, None]
        idx = jnp.sum(dfrac > px[:, 1:-1], axis=1)  # segment index [0, nseg)
        take = lambda a, i: jnp.take_along_axis(   # noqa: E731
            a, i[:, None], axis=1)[:, 0]
        pxdp1 = take(px, idx)
        pxdp2 = take(px, idx + 1)
        petm1 = take(pe, idx)
        petm2 = take(pe, idx + 1)
        seg = jnp.where(pxdp2 - pxdp1 > 0, pxdp2 - pxdp1, DONE)
        thcof = -(petm1 - petm2) * c / (seg * x)
        trhs = thcof * (s - pxdp1 * x) + petm1 * c

    mid = act & ~above & ~below_ext
    hcof = jnp.where(mid, thcof, DZERO)
    rhs = jnp.where(mid, trhs, jnp.where(act & above, c, DZERO))
    return hcof, rhs


def scatter_terms(diag, rhs_vec, node, mask, hcof, rhs):
    """bnd_fc: add per-entry hcof→diag, rhs→rhs at each entry's node."""
    diag = diag.at[node].add(jnp.where(mask, hcof, DZERO))
    rhs_vec = rhs_vec.at[node].add(jnp.where(mask, rhs, DZERO))
    return diag, rhs_vec


def bound_flows(node, mask, hcof, rhs, head, ibound):
    """Per-entry flow rate q = hcof*h - rhs (reference bnd_cq)."""
    q = hcof * head[node] - rhs
    return jnp.where(mask & (ibound[node] > 0), q, DZERO)
