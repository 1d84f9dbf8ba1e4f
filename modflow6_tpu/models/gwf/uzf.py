"""UZF: unsaturated-zone flow columns (kinematic wave).

Behavioral parity target: src/Model/GroundWaterFlow/gwf-uzf.f90 (3,063
LoC) + UzfCellGroup.f90: vertical unsaturated columns under the land
surface accept infiltration, percolate it downward by the kinematic-wave
approximation of Richards' equation with a Brooks-Corey relative
permeability,

    ∂θ/∂t + ∂q(θ)/∂z = 0,     q(θ) = vks·((θ−θr)/(θs−θr))^eps,

and deliver recharge to the water table (plus rejected infiltration when
the surface flux exceeds vks).

TPU-native redesign (NOT a port): the reference solves the PDE by exact
method-of-characteristics wave tracking — per-cell dynamic lists of
trailing/lead waves, deeply sequential and shape-dynamic.  Here the same
PDE is solved with a conservative first-order upwind finite-volume
discretization over ``nz`` sub-cells per column, vectorized over all
columns and advanced by a fixed number of CFL-limited sub-steps inside
``lax.scan``.  Kinematic waves travel strictly downward, so upwinding is
exact and the scheme converges to the same wave solutions the reference
tracks analytically (tests pin the analytic front-arrival time).

Coupling: the bottom flux of each column is groundwater recharge applied
to its GWF cell; the Simulation driver advances the columns each time
step and injects the recharge (the reference couples the same terms
through uzf_fc with its own package-convergence loop).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


@partial(jax.tree_util.register_dataclass,
         data_fields=["node", "thtr", "thts", "thti", "eps", "vks",
                      "depth", "area", "finf"],
         meta_fields=["nz"])
@dataclasses.dataclass(frozen=True)
class UzfColumns:
    """Static column parameters (uzf packagedata)."""

    node: jax.Array    # i32[C] GWF cell receiving the recharge
    thtr: jax.Array    # residual water content
    thts: jax.Array    # saturated water content
    thti: jax.Array    # initial water content
    eps: jax.Array     # Brooks-Corey exponent
    vks: jax.Array     # vertical saturated K
    depth: jax.Array   # unsaturated column length
    area: jax.Array    # column plan-view area
    finf: jax.Array    # infiltration rate (period data)
    nz: int = 20


def make_uzf(entries, nz=20):
    """entries: (node, vks, thtr, thts, thti, eps, depth, area, finf)."""
    a = np.asarray(entries, np.float64)
    return UzfColumns(
        node=jnp.asarray(a[:, 0].astype(np.int32)),
        vks=jnp.asarray(a[:, 1]), thtr=jnp.asarray(a[:, 2]),
        thts=jnp.asarray(a[:, 3]), thti=jnp.asarray(a[:, 4]),
        eps=jnp.asarray(a[:, 5]), depth=jnp.asarray(a[:, 6]),
        area=jnp.asarray(a[:, 7]), finf=jnp.asarray(a[:, 8]), nz=int(nz))


def initial_theta(uzf: UzfColumns) -> jax.Array:
    return jnp.broadcast_to(uzf.thti[:, None],
                            (uzf.thti.shape[0], uzf.nz))


def _flux(uzf, theta):
    """q(θ) per sub-cell (UzfCellGroup rate function)."""
    srel = jnp.clip((theta - uzf.thtr[:, None])
                    / (uzf.thts - uzf.thtr)[:, None], 0.0, 1.0)
    return uzf.vks[:, None] * srel ** uzf.eps[:, None]


def advance(uzf: UzfColumns, theta, delt, nsub=None):
    """March the columns through one GWF time step.

    Returns (theta_new, recharge_rate[C] time-averaged bottom flux,
    rejected[C] time-averaged rejected infiltration rate).  Fluxes are
    per unit area; multiply by ``area`` for volumetric rates.
    """
    C, nz = theta.shape
    dz = uzf.depth / nz
    # CFL: max wave speed dq/dθ = vks·eps/(θs−θr) at saturation
    vmax = uzf.vks * uzf.eps / (uzf.thts - uzf.thtr)
    if nsub is None:
        nsub = int(np.ceil(float(jnp.max(vmax * delt / dz)) * 1.05)) + 1
    dt = delt / nsub

    def substep(carry, _):
        th, rch_acc, rej_acc = carry
        q = _flux(uzf, th)
        # surface inflow limited by vks (excess rejected, uzf seepage role)
        fin_top = jnp.minimum(uzf.finf, uzf.vks)
        rej = uzf.finf - fin_top
        # capacity limit: don't overfill the top cell in one substep
        cap = (uzf.thts - th[:, 0]) * dz / dt + q[:, 0]
        fin_top = jnp.minimum(fin_top, cap)
        rej = rej + (jnp.minimum(uzf.finf, uzf.vks) - fin_top)
        # interface fluxes: strictly-downward kinematic wave → upwind from
        # above; f[:, k] = flux INTO sub-cell k
        f_in = jnp.concatenate([fin_top[:, None], q[:, :-1]], axis=1)
        f_out = q
        th_new = th + dt / dz[:, None] * (f_in - f_out)
        th_new = jnp.clip(th_new, uzf.thtr[:, None], uzf.thts[:, None])
        return (th_new, rch_acc + q[:, -1] * dt, rej_acc + rej * dt), None

    (theta, rch, rej), _ = lax.scan(
        substep, (theta, jnp.zeros(C), jnp.zeros(C)), None, length=nsub)
    return theta, rch / delt, rej / delt


def recharge_wells(uzf: UzfColumns, rch_rate):
    """Volumetric recharge per column as WEL-style (node, q, mask)."""
    q = rch_rate * uzf.area
    return uzf.node, q, jnp.ones_like(q, bool)
