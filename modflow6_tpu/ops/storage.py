"""Storage (STO) capacity and matrix/rhs term math, vectorized over cells.

Behavioral parity targets in the reference:
  - SsCapacity / SyCapacity  src/Model/ModelUtilities/GwfStorageUtils.f90:141-183
  - SsTerms                  GwfStorageUtils.f90:32-89
  - SyTerms                  GwfStorageUtils.f90:99-135
"""

import jax.numpy as jnp

from ..constants import DHALF, DONE, DZERO


def ss_capacity(istor_coef, top, bot, area, ss):
    """Specific storage capacity SC1 = ss * thickness * area.

    ``istor_coef`` static: if nonzero, ``ss`` is a storage coefficient and
    thickness is taken as 1.
    """
    thick = (top - bot) if istor_coef == 0 else DONE
    return ss * thick * area


def sy_capacity(area, sy):
    """Specific yield capacity SC2 = sy * area."""
    return sy * area


def ss_terms(iconvert, iorig_ss, iconf_ss, top, bot, rho1, rho1old, snnew, snold, hnew, hold):
    """Specific-storage contribution (aterm, rhsterm) per cell.

    ``iorig_ss``/``iconf_ss`` are static option flags; ``iconvert`` is an
    array (cell convertibility).  Returns the diagonal coefficient ``aterm``
    and right-hand-side ``rhsterm`` with the same sign conventions as the
    reference (aterm added to the diagonal, rhsterm added to rhs).
    """
    aterm = -rho1 * snnew
    rhs_nonconv = -rho1old * snold * hold

    if iorig_ss == 0:
        if iconf_ss == 0:
            tthk = top - bot
            zold = bot + DHALF * tthk * snold
            znew = bot + DHALF * tthk * snnew
            rhs_conv = -rho1old * snold * (hold - zold) - rho1 * snnew * znew
            aterm_conv = aterm
        else:
            rhs_conv = jnp.where(snold == DONE, -rho1old * (hold - top), DZERO)
            rhs_conv = rhs_conv + jnp.where(snnew == DONE, -rho1 * top, DZERO)
            aterm_conv = jnp.where(snnew == DONE, aterm, DZERO)
    else:
        rhs_conv = rhs_nonconv
        aterm_conv = aterm

    is_conv = iconvert != 0
    aterm_out = jnp.where(is_conv, aterm_conv, aterm)
    rhsterm = jnp.where(is_conv, rhs_conv, rhs_nonconv)
    return aterm_out, rhsterm


def sy_terms(top, bot, rho2, rho2old, snnew, snold):
    """Specific-yield contribution (aterm, rhsterm) per cell."""
    tthk = top - bot
    partially_sat = (snnew < DONE) & (snnew > DZERO)
    dry = snnew <= DZERO

    aterm = jnp.where(partially_sat, -rho2, DZERO)
    rhs_partial = -rho2old * tthk * snold - rho2 * bot
    rhs_dry = tthk * (DZERO - rho2old * snold)
    rhs_full = tthk * (rho2 * snnew - rho2old * snold)
    rhsterm = jnp.where(partially_sat, rhs_partial, jnp.where(dry, rhs_dry, rhs_full))
    return aterm, rhsterm
