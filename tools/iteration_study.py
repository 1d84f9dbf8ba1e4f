"""Time-to-solution evidence vs the reference solver (VERDICT r3 #6).

Measures total inner (Krylov) iterations and wall-clock per time step on
the npf01-class lognormal-K problem at 75x75 and at the 4.2M-cell bench
config, for each TPU-friendly preconditioner (jacobi / chebyshev / mg),
and compares iteration counts against an ILU(0)-preconditioned scipy CG
on the same matrix — the honest single-core proxy for the reference's
IMS ILU0 (ImsLinearBase.f90:928-1042).

Usage: python tools/iteration_study.py [--big]
Writes a markdown table to stdout (paste into BASELINE.md).
"""

import argparse
import time

import numpy as np


def build(nlay, nrow, ncol):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    from modflow6_tpu.models.discretization import DisGrid
    from modflow6_tpu.models.gwf.builder import build_gwf

    rng = np.random.default_rng(75)
    g = DisGrid.create(nlay, nrow, ncol, delr=10.0, delc=10.0, top=50.0,
                       botm=np.linspace(0.0, -50.0, nlay)[:, None, None]
                       * np.ones((nlay, nrow, ncol)))
    kfield = np.exp(rng.normal(0.0, 1.0, size=nlay * nrow * ncol))
    return build_gwf(
        "study", g, k=kfield, strt=40.0,
        storage={"ss": 1e-5, "iconvert": 0},
        chd=[(i * ncol, 45.0) for i in range(nrow)]
        + [(i * ncol + ncol - 1, 35.0) for i in range(nrow)],
        wel=[((nrow // 2) * ncol + ncol // 2, -500.0)],
        rch=[(n, 1e-4) for n in range(nrow * ncol)])


def tpu_case(model, precond, precision, steps=3):
    import jax
    import jax.numpy as jnp
    from modflow6_tpu.solution import ImsSettings
    from modflow6_tpu.solution.fused import make_fused_run

    settings = ImsSettings(outer_dvclose=1e-5, outer_maximum=50,
                           inner_dvclose=1e-7, inner_rclose=1e-5,
                           inner_maximum=1000, precision=precision,
                           preconditioner=precond,
                           preconditioner_order=4)
    run = jax.jit(make_fused_run(model, settings, iss=False, nsteps=steps))
    delts = jnp.asarray(np.full(steps, 5.0))
    h0 = jnp.asarray(model.strt)
    out = run(h0, delts)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    head, kiters, inners, convs = run(h0, delts)
    jax.block_until_ready(head)
    dt = time.perf_counter() - t0
    inner = int(np.asarray(inners).sum())
    return dict(inner=inner, wall=dt, per_step=dt / steps,
                conv=bool(np.asarray(convs).all()))


def scipy_ilu_case(model):
    """ILU(0)-class preconditioned CG iterations on the same matrix."""
    import jax
    import jax.numpy as jnp
    import scipy.sparse.linalg as spla
    from modflow6_tpu.ops.system import to_scipy_csr, apply_dirichlet

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        h = jnp.asarray(np.asarray(model.strt))
        ib, hh = model.boundary_state(h)
        diag, off, rhs = model.assemble(hh, hh, ib, 5.0, False)
        active = jnp.where(ib > 0, 1, jnp.where(ib < 0, -1, 0))
        diag, off, rhs = apply_dirichlet(model.dtopo.nbr, active, diag,
                                         off, rhs, hh)
    amat = (-to_scipy_csr(model.topo, np.asarray(diag),
                          np.asarray(off))).tolil()
    b = -np.asarray(rhs)
    # Dirichlet identity rows carry +1 diagonals in the CVFD convention;
    # after negation flip them back so -A is SPD for CG
    dg = amat.diagonal()
    flip = np.flatnonzero(dg < 0)
    for i in flip:
        amat[i, i] = -dg[i]
        b[i] = -b[i]
    amat = amat.tocsc()
    ilu = spla.spilu(amat, fill_factor=1.0, drop_tol=0.0)   # ILU(0)-like
    M = spla.LinearOperator(amat.shape, ilu.solve)
    it = {"n": 0}

    def cb(xk):
        it["n"] += 1

    # spilu's factorization is unsymmetric (pivoting), so pair it with
    # BiCGSTAB — the reference's own asymmetric-path combination
    # (ims_base_bcgs + ilu0)
    t0 = time.perf_counter()
    x, info = spla.bicgstab(amat.tocsr(), b, x0=np.asarray(hh), rtol=1e-8,
                            maxiter=2000, M=M, callback=cb)
    wall = time.perf_counter() - t0
    return dict(inner=it["n"], wall=wall, conv=info == 0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--big", action="store_true",
                    help="include the 4.2M-cell config")
    args = ap.parse_args()
    cases = [("75x75", (1, 75, 75))]
    if args.big:
        cases.append(("4.2M", (4, 1024, 1024)))
    print("| config | solver | inner iters (3 steps) | wall/step |")
    print("|---|---|---|---|")
    for name, shape in cases:
        model = build(*shape)
        for pc in ("jacobi", "chebyshev", "mg"):
            for prec in (["mixed"] if args.big else ["f64", "mixed"]):
                r = tpu_case(model, pc, prec)
                print(f"| {name} | {pc}-CG ({prec}) | {r['inner']} "
                      f"| {r['per_step']*1e3:.1f} ms |", flush=True)
        if shape[0] * shape[1] * shape[2] <= 400_000:
            r = scipy_ilu_case(model)
            print(f"| {name} | scipy ILU(0)-CG (1 solve, rtol 1e-8) "
                  f"| {r['inner']} | {r['wall']*1e3:.1f} ms (1 core) |",
                  flush=True)


if __name__ == "__main__":
    main()
