"""Benchmark: grid-cell Krylov-iteration throughput of the IMS-equivalent
implicit solve (the north-star metric from BASELINE.md).

Prints ONE JSON line:
  {"metric": "ims_cell_iters_per_s", "value": N, "unit": "cell-iter/s",
   "vs_baseline": R}

- value: grid cells × inner (Krylov) iterations per wall-clock second of
  the fully-fused transient solve (assembly + fixups + preconditioned
  CG inner loop), float64, on the default JAX device (TPU under axon).
- vs_baseline: ratio against a single-core scipy CSR implementation of the
  same Jacobi-CG iteration on the same matrix (a host-CPU proxy for the
  reference's Fortran IMS loop, which the environment cannot build).

Usage: python bench.py [--nlay N] [--nrow N] [--ncol N] [--steps N] [--f32]
"""

import argparse
import json
import sys
import time

import numpy as np


def build(nlay, nrow, ncol, precision="mixed"):
    import jax
    # persistent compilation cache: the fused step is a large program and
    # the first XLA compile dominates otherwise
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from modflow6_tpu.models.discretization import DisGrid
    from modflow6_tpu.models.gwf.builder import build_gwf
    from modflow6_tpu.solution import ImsSettings
    from modflow6_tpu.solution.fused import make_fused_run

    rng = np.random.default_rng(75)
    g = DisGrid.create(nlay, nrow, ncol, delr=10.0, delc=10.0, top=50.0,
                       botm=np.linspace(0.0, -50.0, nlay)[:, None, None]
                       * np.ones((nlay, nrow, ncol)))
    kfield = np.exp(rng.normal(0.0, 1.0, size=nlay * nrow * ncol))
    model = build_gwf(
        "bench", g, k=kfield, strt=40.0,
        storage={"ss": 1e-5, "iconvert": 0},
        chd=[(i * ncol, 45.0) for i in range(nrow)]
        + [(i * ncol + ncol - 1, 35.0) for i in range(nrow)],
        wel=[((nrow // 2) * ncol + ncol // 2, -500.0)],
        rch=[(n, 1e-4) for n in range(nrow * ncol)])
    settings = ImsSettings(outer_dvclose=1e-5, outer_maximum=50,
                           inner_dvclose=1e-7, inner_rclose=1e-5,
                           inner_maximum=400, precision=precision)
    return model, settings, make_fused_run


def scipy_baseline_rate(model, iters=60):
    """Single-core Jacobi-CG iteration rate with scipy CSR (cells·iter/s).

    Runs the one-off matrix assembly on the LOCAL CPU backend: jitting it on
    the axon-tunneled TPU would bake the multi-million-cell model arrays into
    the XLA program and overflow the remote-compile proxy (HTTP 413).
    """
    import jax
    import jax.numpy as jnp
    from modflow6_tpu.ops.system import to_scipy_csr, apply_dirichlet

    cpu = jax.devices("cpu")[0]

    def prep(head):
        ib, h = model.boundary_state(head)
        diag, off, rhs = model.assemble(h, h, ib, 1.0, False)
        active = jnp.where(ib > 0, 1, jnp.where(ib < 0, -1, 0))
        return (*apply_dirichlet(model.dtopo.nbr, active, diag, off, rhs, h),
                h)

    with jax.default_device(cpu):
        diag, off, rhs, h = jax.jit(prep)(jnp.asarray(np.asarray(model.strt)))
    amat = to_scipy_csr(model.topo, np.asarray(diag), np.asarray(off)).tocsr()
    b = np.asarray(rhs)
    n = b.size
    minv = 1.0 / amat.diagonal()
    x = np.asarray(h).copy()
    r = b - amat @ x
    p = np.zeros_like(x)
    rho0 = 0.0
    t0 = time.perf_counter()
    for it in range(iters):
        z = minv * r
        rho = r @ z
        beta = 0.0 if it == 0 else rho / rho0
        p = z + beta * p
        q = amat @ p
        alpha = rho / (p @ q)
        x += alpha * p
        r -= alpha * q
        rho0 = rho
    dt = time.perf_counter() - t0
    return n * iters / dt


def main():
    ap = argparse.ArgumentParser()
    # default = the BASELINE.md "multi-million-cell DIS scale-up" config
    # (4.2M cells); first compile ~7 min, cached in /tmp/jaxcache after
    ap.add_argument("--nlay", type=int, default=4)
    ap.add_argument("--nrow", type=int, default=1024)
    ap.add_argument("--ncol", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--precision", choices=["f64", "mixed"], default="mixed",
                    help="mixed = f32 Krylov inner loop + f64 iterative "
                    "refinement (TPU v5e+ has no hardware f64; final heads "
                    "still satisfy the f64 IMS convergence criteria)")
    ap.add_argument("--skip-baseline", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    model, settings, make_fused_run = build(args.nlay, args.nrow, args.ncol,
                                            args.precision)
    ncells = model.nodes
    run = jax.jit(make_fused_run(model, settings, iss=False,
                                 nsteps=args.steps))
    delts = jnp.asarray(np.full(args.steps, 5.0))
    h0 = jnp.asarray(model.strt)

    # compile + warmup
    out = run(h0, delts)
    jax.block_until_ready(out)
    # timed
    t0 = time.perf_counter()
    head, kiters, inners, convs = run(h0, delts)
    jax.block_until_ready(head)
    elapsed = time.perf_counter() - t0
    total_inner = int(np.asarray(inners).sum())
    rate = ncells * total_inner / elapsed

    # The measured TPU rate is the deliverable: never let the host-side
    # baseline comparison (best-effort context) take it down with it.
    ratio = 0.0
    if not args.skip_baseline:
        try:
            base = scipy_baseline_rate(model)
            ratio = rate / base
        except Exception as exc:  # noqa: BLE001 - report and move on
            print(f"# scipy baseline failed ({type(exc).__name__}): {exc}",
                  file=sys.stderr)

    print(json.dumps({
        "metric": "ims_cell_iters_per_s",
        "value": rate,
        "unit": "cell-iter/s",
        "vs_baseline": ratio,
    }))
    print(f"# cells={ncells} steps={args.steps} inner_total={total_inner} "
          f"elapsed={elapsed:.3f}s converged={bool(np.asarray(convs).all())} "
          f"device={jax.devices()[0].platform}", file=sys.stderr)


if __name__ == "__main__":
    main()
