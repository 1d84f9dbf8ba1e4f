"""VSC: viscosity package — scales hydraulic conductivity by
viscref/viscosity(concentration, temperature).

Behavioral parity target: src/Model/GroundWaterFlow/gwf-vsc.f90 —
calc_visc:97-133 (linear per-species terms plus the one nonlinear
temperature correction mu = viscref·a2^expon) and update_k_with_vsc:
824-845 (K11/K22/K33 = user K × viscref/visc, condsat rebuilt).  Here the
scaling happens functionally inside assemble with the lagged
concentration field, so no mutable K state exists.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.tree_util.register_dataclass,
         data_fields=["viscref", "dviscdc", "cviscref"],
         meta_fields=["ivisc", "a2", "a3", "a4"])
@dataclasses.dataclass(frozen=True)
class VscData:
    viscref: jax.Array     # scalar reference viscosity
    dviscdc: jax.Array     # f64[nspecies] linear slope
    cviscref: jax.Array    # f64[nspecies] reference conc/temperature
    ivisc: tuple = (1,)    # per-species: 1=linear, 2=nonlinear temperature
    a2: float = 10.0       # nonlinear temperature-correction constants
    a3: float = 248.37     # (vsc-options defaults, gwf-vsc.dfn)
    a4: float = 133.15


def make_vsc(viscref=1.0, dviscdc=0.0, cviscref=0.0, ivisc=None,
             a2=10.0, a3=248.37, a4=133.15) -> VscData:
    dviscdc = jnp.atleast_1d(jnp.asarray(dviscdc, jnp.float64))
    cviscref = jnp.broadcast_to(jnp.asarray(cviscref, jnp.float64),
                                dviscdc.shape)
    if ivisc is None:
        ivisc = (1,) * dviscdc.shape[0]
    return VscData(jnp.asarray(viscref, jnp.float64), dviscdc, cviscref,
                   ivisc=tuple(int(i) for i in ivisc),
                   a2=float(a2), a3=float(a3), a4=float(a4))


def calc_visc(vsc: VscData, conc) -> jax.Array:
    """Per-cell viscosity (calc_visc, gwf-vsc.f90:97-133).

    ``conc``: f64[N] or f64[nspecies, N]."""
    c = jnp.atleast_2d(jnp.asarray(conc))
    visc = jnp.full(c.shape[1], vsc.viscref)
    for i, kind in enumerate(vsc.ivisc):
        if kind == 1:
            visc = visc + vsc.dviscdc[i] * (c[i] - vsc.cviscref[i])
        else:
            expon = -vsc.a3 * ((c[i] - vsc.cviscref[i])
                               / ((c[i] + vsc.a4) * (vsc.cviscref[i]
                                                     + vsc.a4)))
            mu_t = vsc.viscref * vsc.a2 ** expon
            visc = (visc - vsc.viscref) + mu_t
    return visc


def viscosity_ratio(vsc: VscData, conc) -> jax.Array:
    """viscref / visc — the K multiplier (calc_q_visc role)."""
    visc = calc_visc(vsc, conc)
    return vsc.viscref / jnp.where(visc != 0.0, visc, vsc.viscref)
