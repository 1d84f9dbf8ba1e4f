"""TPU-friendly preconditioners for the Krylov solvers.

The reference IMS preconditions with ILU(0)/ILUT (ImsLinearBase.f90:928-1042)
— inherently sequential triangular solves that do not map to TPU vector
units.  Following the design target, the TPU build replaces them with
vectorizable preconditioners with comparable iteration-count behavior:

- ``jacobi``: M = diag(A); one multiply per application;
- ``neumann``: truncated Neumann-series polynomial on the Jacobi-scaled
  matrix, M⁻¹ ≈ (I + N + … + Nᵖ) D⁻¹ with N = I - D⁻¹A; p SpMVs per
  application, no setup;
- ``ssor``-like sweeps are deliberately omitted (sequential).

All preconditioners are pure functions of the assembled ELL matrix and are
applied inside ``lax.while_loop`` Krylov iterations.
"""

from __future__ import annotations

import jax.numpy as jnp


def jacobi_precondition(diag):
    """Return apply(r) -> D^{-1} r. Safe for zero diagonals (identity there)."""
    safe = jnp.where(diag != 0.0, diag, 1.0)
    inv = 1.0 / safe

    def apply(r):
        return inv * r

    return apply


def neumann_precondition(matvec, diag, order=2):
    """Truncated Neumann polynomial preconditioner.

    z = (I + N + N^2 + ... + N^order) D^{-1} r,  N = I - D^{-1} A.
    Equivalent to ``order`` Jacobi-iteration refinements; symmetric when A is
    symmetrically scaled, and close enough in spirit to keep CG happy for
    diagonally dominant CVFD systems.  ``matvec`` is the same A·v used by
    the Krylov loop (structured/gather/halo variants all work).
    """
    safe = jnp.where(diag != 0.0, diag, 1.0)
    inv = 1.0 / safe

    def apply(r):
        z = inv * r
        acc = z
        for _ in range(order):
            # N z = z - D^{-1} A z
            z = z - inv * matvec(z)
            acc = acc + z
        return acc

    return apply


def make_preconditioner(kind, matvec, diag, **kw):
    if kind in ("jacobi", "diag"):
        return jacobi_precondition(diag)
    if kind == "neumann":
        return neumann_precondition(matvec, diag, order=kw.get("order", 2))
    if kind == "none":
        return lambda r: r
    raise ValueError(f"unknown preconditioner {kind!r}")
