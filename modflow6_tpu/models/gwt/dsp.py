"""DSP: hydrodynamic dispersion — mechanical dispersion + molecular diffusion.

Behavioral parity target: the reference's non-XT3D dispersion path
(src/Model/GroundWaterTransport/gwt-dsp.f90):
  - calcdispellipse  gwt-dsp.f90:636-743  (per-cell tensor d11/d22/d33 +
    rotation angles from the specific-discharge direction)
  - calcdispcoef     gwt-dsp.f90:747-873  (per-connection conductance from
    the two half-cell effective coefficients, hyeff w/ arithmetic averaging)
  - dsp_fc           gwt-dsp.f90:254-295  (conductance-style matrix fill,
    applied by GwtModel.assemble)

All computations are vectorized over cells / symmetric-half edges; the
specific discharge is recovered from the edge flow field with a
component-wise least-squares average of face-normal fluxes (exact for
orthogonal DIS grids; the reference's calc_spdis full least-squares is an
upgrade path for heavily distorted DISU grids).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ...constants import DHALF, DONE, DPI, DZERO
from ..gwf.npf import _hyeff
from ...ops.conductance import staggered_thkfrac

C3D_VERTICAL = 0
C3D_STAGGERED = 2


@partial(jax.tree_util.register_dataclass,
         data_fields=["alh", "alv", "ath1", "ath2", "atv", "diffc"],
         meta_fields=["idisp", "idiffc"])
@dataclasses.dataclass(frozen=True)
class DspData:
    """DSP griddata (reference dsp_ar / read_data)."""

    alh: jax.Array    # f64[N] longitudinal dispersivity, horizontal flow
    alv: jax.Array    # f64[N] longitudinal, vertical flow (defaults alh)
    ath1: jax.Array   # f64[N] transverse horizontal 1
    ath2: jax.Array   # f64[N] transverse horizontal 2 (defaults ath1)
    atv: jax.Array    # f64[N] transverse vertical
    diffc: jax.Array  # f64[N] molecular diffusion coefficient
    idisp: int = 0    # mechanical dispersion active
    idiffc: int = 0   # molecular diffusion active


def cell_spdis(dtopo, q_edge, sat, top, bot):
    """Specific-discharge vector (qx, qy, qz) per cell from edge flows.

    Component-wise least squares over the faces of each cell: for each
    component i, q_i = sum_f(qhat_f * n_i) / sum_f(n_i^2) with qhat_f the
    face-normal specific discharge (flow / saturated face area).  Plays the
    role of the reference's calc_spdis (gwf-npf.f90:745-771 + SpdisWorkArray);
    exact for face-orthogonal grids.
    """
    n, m = dtopo.edge_n, dtopo.edge_m
    is_vert = dtopo.ihc == C3D_VERTICAL
    thksat = DHALF * (sat[n] * (top[n] - bot[n]) + sat[m] * (top[m] - bot[m]))
    area = jnp.where(is_vert, dtopo.hwva, dtopo.hwva * thksat)
    qhat = -q_edge / jnp.where(area > DZERO, area, DONE)
    qhat = jnp.where(area > DZERO, qhat, DZERO)
    # unit normal pointing n -> m: horizontal from anglex; vertical is -z
    # (m is the deeper cell; reference z is positive upward)
    nx = jnp.where(is_vert, DZERO, jnp.cos(dtopo.anglex))
    ny = jnp.where(is_vert, DZERO, jnp.sin(dtopo.anglex))
    nz = jnp.where(is_vert, -DONE, DZERO)

    N = dtopo.nodes
    qx = jnp.zeros(N)
    qy = jnp.zeros(N)
    qz = jnp.zeros(N)
    wx = jnp.zeros(N)
    wy = jnp.zeros(N)
    wz = jnp.zeros(N)
    def accum(q_acc, w_acc, ncomp):
        q_acc = q_acc.at[n].add(qhat * ncomp).at[m].add(qhat * ncomp)
        w_acc = w_acc.at[n].add(ncomp * ncomp).at[m].add(ncomp * ncomp)
        return q_acc, w_acc
    qx, wx = accum(qx, wx, nx)
    qy, wy = accum(qy, wy, ny)
    qz, wz = accum(qz, wz, nz)
    qx = jnp.where(wx > DZERO, qx / jnp.where(wx > 0, wx, 1.0), DZERO)
    qy = jnp.where(wy > DZERO, qy / jnp.where(wy > 0, wy, 1.0), DZERO)
    qz = jnp.where(wz > DZERO, qz / jnp.where(wz > 0, wz, 1.0), DZERO)
    return qx, qy, qz


def dispersion_ellipse(dsp: DspData, porosity, qx, qy, qz, active):
    """Per-cell dispersion tensor diagonal + rotation angles
    (reference calcdispellipse, gwt-dsp.f90:636-743)."""
    qsq = qx * qx + qy * qy + qz * qz
    q = jnp.where(qsq > DZERO, jnp.sqrt(qsq), DZERO)

    dstar = jnp.where(dsp.idiffc > 0, dsp.diffc * porosity, DZERO) \
        if dsp.idiffc else jnp.zeros_like(porosity)

    if dsp.idisp:
        qzoq2 = jnp.where(q > DZERO, (qz / jnp.where(q > 0, q, 1.0)) ** 2,
                          DZERO)
        al = dsp.alh * (DONE - qzoq2) + dsp.alv * qzoq2
        at1 = dsp.ath1 * (DONE - qzoq2) + dsp.atv * qzoq2
        at2 = dsp.ath2 * (DONE - qzoq2) + dsp.atv * qzoq2
        al = jnp.where(q > DZERO, al, DZERO)
        at1 = jnp.where(q > DZERO, at1, DZERO)
        at2 = jnp.where(q > DZERO, at2, DZERO)
    else:
        al = at1 = at2 = jnp.zeros_like(q)

    d11 = al * q + dstar
    d22 = at1 * q + dstar
    d33 = at2 * q + dstar

    # rotation angles: reference clamps acos to [0, pi] losing qy's sign —
    # reproduced exactly (gwt-dsp.f90:709-741)
    if dsp.idisp:
        a2 = jnp.arcsin(jnp.where(q > DZERO, qz / jnp.where(q > 0, q, 1.0),
                                  DZERO))
        den = q * jnp.cos(a2)
        a = jnp.where(den != DZERO, qx / jnp.where(den != 0, den, 1.0), DZERO)
        ang1 = jnp.where(a <= -DONE, DPI,
                         jnp.where(a >= DONE, DZERO,
                                   jnp.arccos(jnp.clip(a, -DONE, DONE))))
        ang2 = a2
    else:
        ang1 = ang2 = jnp.zeros_like(q)
    ang3 = jnp.zeros_like(q)

    zero = ~active
    def z(x):
        return jnp.where(zero, DZERO, x)
    return z(d11), z(d22), z(d33), z(ang1), z(ang2), z(ang3)


def edge_dispersion_conductance(dtopo, d11, d22, d33, ang1, ang2, ang3,
                                sat, top, bot, active):
    """Per-edge dispersion conductance (reference calcdispcoef,
    gwt-dsp.f90:747-873): project each cell's tensor onto the connection
    normal (hyeff, arithmetic averaging), then combine the two half-cell
    conductances harmonically with saturated areas."""
    n, m = dtopo.edge_n, dtopo.edge_m
    is_vert = dtopo.ihc == C3D_VERTICAL
    is_stag = dtopo.ihc == C3D_STAGGERED

    # connection normal (sign-free under iavgmeth=1 squaring)
    vg1 = jnp.where(is_vert, DZERO, jnp.cos(dtopo.anglex))
    vg2 = jnp.where(is_vert, DZERO, jnp.sin(dtopo.anglex))
    vg3 = jnp.where(is_vert, DONE, DZERO)

    dn = _hyeff(d11[n], d22[n], d33[n], ang1[n], ang2[n], ang3[n],
                vg1, vg2, vg3, iavgmeth=1)
    dm = _hyeff(d11[m], d22[m], d33[m], ang1[m], ang2[m], ang3[m],
                vg1, vg2, vg3, iavgmeth=1)

    topn, topm = top[n], top[m]
    botn, botm = bot[n], bot[m]
    satn, satm = sat[n], sat[m]

    # vertical: half-thickness path lengths; area drops if either side
    # convertible & partially saturated (reference :809-829; with n < m the
    # "n > m" branch never triggers so only satm<1 or sat==0 zero the area)
    clnm_v = satn * (topn - botn) * DHALF
    clmn_v = satm * (topm - botm) * DHALF
    anm_v = jnp.where((satn == DZERO) | (satm == DZERO) | (satm < DONE),
                      DZERO, dtopo.hwva)
    amn_v = anm_v

    # horizontal: saturated-thickness areas (staggered-aware)
    thksatn = jnp.where(is_stag,
                        staggered_thkfrac(topn, botn, satn, topm, botm),
                        (topn - botn) * satn)
    thksatm = jnp.where(is_stag,
                        staggered_thkfrac(topm, botm, satm, topn, botn),
                        (topm - botm) * satm)
    dry = (satn == DZERO) | (satm == DZERO)
    anm_h = jnp.where(dry, DZERO, thksatn * dtopo.hwva)
    amn_h = jnp.where(dry, DZERO, thksatm * dtopo.hwva)

    clnm = jnp.where(is_vert, clnm_v, dtopo.cl1)
    clmn = jnp.where(is_vert, clmn_v, dtopo.cl2)
    anm = jnp.where(is_vert, anm_v, anm_h)
    amn = jnp.where(is_vert, amn_v, amn_h)

    cn = jnp.where(clnm > DZERO, dn * anm / jnp.where(clnm > 0, clnm, 1.0),
                   DZERO)
    cm = jnp.where(clmn > DZERO, dm * amn / jnp.where(clmn > 0, clmn, 1.0),
                   DZERO)
    denom = cn + cm
    cond = jnp.where(denom > DZERO, cn * cm / jnp.where(denom > 0, denom, 1.0),
                     DZERO)
    return jnp.where(active[n] & active[m], cond, DZERO)


def edge_conductance(dtopo, dsp: DspData, porosity, fields, ibound,
                     top, bot):
    """Full per-step dispersion conductance from the flow fields
    (the dsp_ad → calcdispellipse → calcdispcoef chain)."""
    active = (ibound != 0) & (fields.sat > DZERO)
    qx, qy, qz = cell_spdis(dtopo, fields.q_edge, fields.sat, top, bot)
    d11, d22, d33, a1, a2, a3 = dispersion_ellipse(dsp, porosity, qx, qy, qz,
                                                   active)
    return edge_dispersion_conductance(dtopo, d11, d22, d33, a1, a2, a3,
                                       fields.sat, top, bot, active)
