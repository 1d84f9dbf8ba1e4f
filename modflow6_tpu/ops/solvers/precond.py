"""TPU-friendly preconditioners for the Krylov solvers.

The reference IMS preconditions with ILU(0)/ILUT (ImsLinearBase.f90:928-1042)
— inherently sequential triangular solves that do not map to TPU vector
units.  Following the design target, the TPU build replaces them with
vectorizable preconditioners with comparable iteration-count behavior:

- ``jacobi``: M = diag(A); one multiply per application;
- ``neumann``: truncated Neumann-series polynomial on the Jacobi-scaled
  matrix, M⁻¹ ≈ (I + N + … + Nᵖ) D⁻¹ with N = I - D⁻¹A; p SpMVs per
  application, no setup;
- ``chebyshev``: Chebyshev polynomial of degree ``order`` on the
  Jacobi-scaled operator Â = D⁻¹A, with the spectral upper bound λmax
  estimated by on-device power iteration (a handful of extra SpMVs per
  outer iteration) and λmin = λmax / eig_ratio.  This is the classic
  TPU/GPU substitute for ILU smoothing (cf. hypre/AMG Chebyshev
  smoothers): optimal among fixed-degree polynomials on [λmin, λmax],
  SPD whenever A is, so CG stays valid;
- ``ssor``-like sweeps are deliberately omitted (sequential).

All preconditioners are pure functions of the assembled ELL matrix and are
applied inside ``lax.while_loop`` Krylov iterations.

Sign note: the CVFD matrix follows the MODFLOW convention (negative
definite: negative diagonals on active rows, +1 identity rows on
Dirichlet/inactive cells).  D⁻¹A therefore has a *positive* spectrum on
both blocks, so the polynomial constructions below need no sign fixups;
M⁻¹ inherits A's sign structure exactly like plain Jacobi does.
"""

from __future__ import annotations

import jax
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


def estimate_lambda_max(matvec, diag, iters=10):
    """Largest eigenvalue of D⁻¹A by power iteration, on device.

    Plays the role of the eigenvalue estimation inside AMG/hypre Chebyshev
    smoother setup.  A fixed iteration count keeps the computation static
    for jit; the 1.05 safety factor absorbs the remaining estimation error
    (Chebyshev tolerates λmax overestimates gracefully, underestimates
    poorly).
    """
    safe = jnp.where(diag != 0.0, diag, 1.0)
    inv = 1.0 / safe
    n = diag.shape[0]
    # deterministic rough-start vector with content in many modes
    v0 = jnp.where(jnp.arange(n) % 2 == 0, 1.0, -0.6) * (
        1.0 + 0.1 * jnp.cos(jnp.arange(n, dtype=diag.dtype)))
    v0 = v0 / jnp.sqrt(jnp.sum(v0 * v0))

    def body(_, v):
        w = inv * matvec(v)
        return w / jnp.maximum(jnp.sqrt(jnp.sum(w * w)), 1e-300)

    v = jax.lax.fori_loop(0, iters, body, v0)
    w = inv * matvec(v)
    lmax = jnp.sum(v * w) / jnp.maximum(jnp.sum(v * v), 1e-300)
    return jnp.maximum(lmax, 1e-30) * 1.05


def chebyshev_precondition(matvec, diag, order=4, eig_ratio=30.0,
                           power_iters=10):
    """Chebyshev polynomial preconditioner on the Jacobi-scaled operator.

    z = q(Â) D⁻¹ r with Â = D⁻¹A and q the degree-``order`` Chebyshev
    approximation of 1/λ on [λmax/eig_ratio, λmax] — the standard
    three-term recurrence (Saad, Iterative Methods §12.3; the role ILU0
    plays in the reference, ImsLinearBase.f90:928-1042).  SPD for SPD A,
    so valid inside CG; ``order`` SpMVs per application.
    """
    safe = jnp.where(diag != 0.0, diag, 1.0)
    inv = 1.0 / safe
    lmax = estimate_lambda_max(matvec, diag, iters=power_iters)
    lmin = lmax / eig_ratio
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma = theta / delta

    def apply(r):
        rs = inv * r
        d = rs / theta
        z = d
        rho = 1.0 / sigma
        for _ in range(order - 1):
            rho_new = 1.0 / (2.0 * sigma - rho)
            resid = rs - inv * matvec(z)
            d = rho_new * rho * d + (2.0 * rho_new / delta) * resid
            z = z + d
            rho = rho_new
        return z

    return apply


def make_preconditioner(kind, matvec, diag, **kw):
    if kind in ("jacobi", "diag"):
        return jacobi_precondition(diag)
    if kind == "neumann":
        return neumann_precondition(matvec, diag, order=kw.get("order", 2))
    if kind == "chebyshev":
        return chebyshev_precondition(
            matvec, diag, order=kw.get("order", 4),
            eig_ratio=kw.get("eig_ratio", 30.0),
            power_iters=kw.get("power_iters", 10))
    if kind == "none":
        return lambda r: r
    raise ValueError(f"unknown preconditioner {kind!r}")
