"""Sharded augmented-model equivalence: MAW + LAK + SFR feature rows
distributed to their host-cell shards (replicated feature tables,
owner-masked rows) must reproduce the single-chip solve.

Role of the reference's parallel advanced-package coverage (virtual
models carry their packages; interface models carry the coupling)."""

import numpy as np
import jax.numpy as jnp

from modflow6_tpu.models.discretization import DisGrid
from modflow6_tpu.models.gwf.builder import build_gwf
from modflow6_tpu.models.gwf.advanced import (AugmentedGwfModel, build_lak,
                                              build_maw, build_sfr)
from modflow6_tpu.parallel.augmented import (ShardedAugmentedSolution,
                                             partition_augmented)
from modflow6_tpu.solution import ImsSettings, NumericalSolution


def tight():
    return ImsSettings(outer_dvclose=1e-9, outer_maximum=200,
                       inner_dvclose=1e-11, inner_rclose=1e-10,
                       inner_maximum=2000,
                       linear_acceleration="bicgstab")


def _aug_model(nrow=10, ncol=12, seed=4):
    rng = np.random.default_rng(seed)
    g = DisGrid.create(1, nrow, ncol, 10.0, 10.0, 20.0,
                       np.zeros((1, nrow, ncol)))
    base = build_gwf(
        "a", g, k=np.exp(rng.normal(0, 0.5, size=nrow * ncol)), strt=12.0,
        storage={"ss": 1e-4, "iconvert": 0},
        chd=[(i * ncol, 14.0) for i in range(nrow)]
        + [(i * ncol + ncol - 1, 10.0) for i in range(nrow)])
    # MAW well near the west, pumping
    maw = build_maw([dict(radius=0.25, strt=12.0, rate=-30.0,
                          connections=[(2 * ncol + 2, 50.0)])], g)
    # two lakes coupled by a weir outlet, cells straddling shard cuts
    lakes = [dict(strt=13.2, bottom=12.4, surf_area=400.0, rainfall=8.0,
                  connections=[(4 * ncol + 5, 30.0, 12.4),
                               (4 * ncol + 6, 30.0, 12.4)]),
             dict(strt=12.8, bottom=12.2, surf_area=300.0,
                  connections=[(7 * ncol + 8, 25.0, 12.2)])]
    outlets = [dict(lake=0, to=1, type="weir", invert=13.0, width=2.0,
                    rough=0.03, slope=1e-3)]
    lak = build_lak(lakes, outlets)
    # SFR chain along a row, crossing the whole domain, leaky bed
    reaches = [dict(node=8 * ncol + j, cond=5.0, strtop=12.5 - 0.02 * j,
                    width=3.0, rough=0.03, slope=1e-3, length=10.0,
                    strt=12.8 - 0.02 * j,
                    inflow=3.0 if j == 1 else 0.0,
                    upstream=[(j - 2, 1.0)] if j > 1 else [])
               for j in range(1, ncol - 1)]
    sfr = build_sfr(reaches)
    return AugmentedGwfModel(base, maw=maw, lak=lak, sfr=sfr)


def test_sharded_augmented_matches_single():
    aug = _aug_model()
    s = tight()
    sol = NumericalSolution(aug, s)
    x = jnp.asarray(aug.strt)
    refs = []
    for k in range(3):
        x, info, _ = sol.solve_timestep(x, 25.0, kstp=k + 1, iss=False)
        assert info.converged
        refs.append(np.asarray(x))

    apart = partition_augmented(aug, 4)
    asol = ShardedAugmentedSolution(apart, s)
    xs = asol.scatter(np.asarray(aug.strt))
    for k in range(3):
        xs, sinfo = asol.solve_timestep(xs, 25.0, kstp=k + 1, iss=False)
        assert sinfo["converged"]
    shd = asol.gather(xs)
    np.testing.assert_allclose(shd, refs[-1], atol=5e-7)
    # the features actually did something
    feats = refs[-1][aug.n_grid:]
    assert feats[0] < 12.0          # pumped well drew down
    assert abs(feats[1] - 13.0) < 0.5   # lake 0 near weir invert


def test_sharded_augmented_two_shards():
    aug = _aug_model(seed=8)
    s = tight()
    sol = NumericalSolution(aug, s)
    x, info, _ = sol.solve_timestep(jnp.asarray(aug.strt), 50.0, iss=False)
    assert info.converged

    apart = partition_augmented(aug, 2)
    asol = ShardedAugmentedSolution(apart, s)
    xs, sinfo = asol.solve_timestep(asol.scatter(np.asarray(aug.strt)),
                                    50.0, iss=False)
    assert sinfo["converged"]
    np.testing.assert_allclose(asol.gather(xs), np.asarray(x), atol=5e-7)
