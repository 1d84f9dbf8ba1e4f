"""Halo-exchange cost study on the virtual device mesh (VERDICT r4 #2).

Measures, at bench-class scale:
  1. structural traffic: ppermute shift buffers vs the former all-pairs
     all_to_all volume;
  2. wall-clock: sharded general-path solve vs the single-device solve
     of the same model (same settings), per inner iteration.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python tools/halo_study.py [--nlay 4] [--nrow 512] [--ncol 512]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nlay", type=int, default=4)
    ap.add_argument("--nrow", type=int, default=512)
    ap.add_argument("--ncol", type=int, default=512)
    ap.add_argument("--shards", type=int, default=8)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from modflow6_tpu.models.discretization import DisGrid
    from modflow6_tpu.models.gwf.builder import build_gwf
    from modflow6_tpu.parallel.general import (GeneralShardedSolution,
                                               partition_general)
    from modflow6_tpu.solution import ImsSettings, NumericalSolution

    nlay, nrow, ncol = args.nlay, args.nrow, args.ncol
    N = nlay * nrow * ncol
    rng = np.random.default_rng(75)
    g = DisGrid.create(nlay, nrow, ncol, delr=10.0, delc=10.0, top=50.0,
                       botm=np.linspace(0.0, -50.0, nlay)[:, None, None]
                       * np.ones((nlay, nrow, ncol)))
    kfield = np.exp(rng.normal(0.0, 1.0, size=N))
    model = build_gwf(
        "halo", g, k=kfield, strt=40.0,
        storage={"ss": 1e-5, "iconvert": 0},
        chd=[(i * ncol, 45.0) for i in range(nrow)]
        + [(i * ncol + ncol - 1, 35.0) for i in range(nrow)],
        wel=[((nrow // 2) * ncol + ncol // 2, -500.0)],
        rch=[(n, 1e-4) for n in range(nrow * ncol)])
    settings = ImsSettings(outer_dvclose=1e-5, outer_maximum=8,
                           inner_dvclose=1e-7, inner_rclose=1e-5,
                           inner_maximum=150, precision="mixed")

    t0 = time.time()
    part = partition_general(model, args.shards)
    t_part = time.time() - t0
    P = args.shards
    shift_slots = [int(s.shape[1]) for s in part.halo_send]
    total_shift = sum(shift_slots)
    S_pair = int(part.send_idx.shape[2])
    allpairs = P * (P - 1) * S_pair
    print(f"partition: N={N} shards={P} n_local={part.n_local} "
          f"({t_part:.1f}s)")
    print(f"halo shifts: {len(shift_slots)} rounds, per-shift slots "
          f"{shift_slots}, total per-exchange slots/shard "
          f"{total_shift} (ppermute)")
    print(f"former all_to_all volume: {P - 1} destinations x {S_pair} "
          f"slots = {(P - 1) * S_pair} slots/shard "
          f"({(P - 1) * S_pair / max(total_shift, 1):.1f}x more traffic)")

    # ---- sharded timing
    gsol = GeneralShardedSolution(part, settings)
    hs = gsol.scatter_heads(np.asarray(model.strt))
    hs1, info = gsol.solve_timestep(hs, delt=1.0, kstp=1, iss=False)
    t0 = time.time()
    reps = 3
    for k in range(reps):
        hs1, info = gsol.solve_timestep(hs, delt=1.0, kstp=1, iss=False)
    jax.block_until_ready(hs1)
    dt_sh = (time.time() - t0) / reps
    it_sh = max(info["inner"], 1)
    print(f"sharded:   {dt_sh:.3f} s/step, {info} -> "
          f"{N * it_sh / dt_sh:.3e} cell-iter/s")

    # ---- single-device timing
    sol = NumericalSolution(model, settings)
    h1, sinfo, _ = sol.solve_timestep(model.strt, 1.0, kstp=1, iss=False)
    t0 = time.time()
    for k in range(reps):
        h1, sinfo, _ = sol.solve_timestep(model.strt, 1.0, kstp=1,
                                          iss=False)
    jax.block_until_ready(h1)
    dt_1 = (time.time() - t0) / reps
    it_1 = max(sinfo.inner_iterations, 1)
    print(f"single:    {dt_1:.3f} s/step, inner={it_1} -> "
          f"{N * it_1 / dt_1:.3e} cell-iter/s")
    print(json.dumps(dict(
        N=N, shards=P, shifts=len(shift_slots),
        slots_ppermute=total_shift, slots_allpairs=(P - 1) * S_pair,
        sharded_s_per_step=dt_sh, sharded_inner=it_sh,
        single_s_per_step=dt_1, single_inner=it_1,
        sharded_cell_iter_s=N * it_sh / dt_sh,
        single_cell_iter_s=N * it_1 / dt_1)))


if __name__ == "__main__":
    main()
