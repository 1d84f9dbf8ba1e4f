"""Sharded (domain-decomposed) solve equivalence tests.

Strategy mirrors the reference's parallel tests (autotest/test_par_gwf01.py):
solve the same physical problem unpartitioned and split across a device
mesh, and require matching heads.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from modflow6_tpu.models.discretization import DisGrid
from modflow6_tpu.models.gwf.builder import build_gwf
from modflow6_tpu.parallel import partition_model
from modflow6_tpu.parallel.sharded import ShardedSolution
from modflow6_tpu.solution import ImsSettings, NumericalSolution


def tight():
    return ImsSettings(outer_dvclose=1e-8, outer_maximum=100,
                       inner_dvclose=1e-10, inner_rclose=1e-9,
                       inner_maximum=2000)


def make_model(nrow=16, ncol=12, kfield=None, transient=False, newton=False):
    g = DisGrid.create(1, nrow, ncol, delr=10.0, delc=10.0, top=20.0,
                       botm=np.zeros((1, nrow, ncol)))
    kw = dict(
        k=kfield if kfield is not None else 3.0,
        strt=8.0,
        chd=[(i * ncol, 10.0) for i in range(nrow)]
        + [(i * ncol + ncol - 1, 6.0) for i in range(nrow)],
        wel=[(nrow // 2 * ncol + ncol // 2, -40.0)],
        rch=[(n, 1e-4) for n in range(nrow * ncol)],
    )
    if transient:
        kw["storage"] = {"ss": 1e-4, "iconvert": 0}
    if newton:
        kw.update(icelltype=1, newton=True)
    return build_gwf("par", g, **kw)


@pytest.mark.parametrize("nshards", [2, 4])
def test_sharded_steady_matches_single(nshards):
    rng = np.random.default_rng(7)
    nrow, ncol = 16, 12
    kfield = np.exp(rng.normal(0, 0.8, size=nrow * ncol))
    model = make_model(nrow, ncol, kfield)
    sol = NumericalSolution(model, tight())
    head_ref, info, _ = sol.solve_timestep(model.strt, delt=1.0, iss=True)
    assert info.converged

    part = partition_model(model, nshards)
    ssol = ShardedSolution(part, tight())
    h0 = ssol.scatter_heads(np.asarray(model.strt))
    hs, sinfo = ssol.solve_timestep(h0, delt=1.0, iss=True)
    assert sinfo["converged"]
    head_sharded = ssol.gather_heads(hs)
    np.testing.assert_allclose(head_sharded, np.asarray(head_ref), atol=1e-7)


def test_sharded_transient_matches_single():
    model = make_model(transient=True)
    sol = NumericalSolution(model, tight())
    part = partition_model(model, 4)
    ssol = ShardedSolution(part, tight())

    head = jnp.asarray(model.strt)
    hs = ssol.scatter_heads(np.asarray(model.strt))
    for kstp, delt in enumerate([0.5, 1.0, 2.0], start=1):
        head, info, _ = sol.solve_timestep(head, delt=delt, kstp=kstp,
                                           iss=False)
        hs, sinfo = ssol.solve_timestep(hs, delt=delt, kstp=kstp, iss=False)
        assert info.converged and sinfo["converged"]
    np.testing.assert_allclose(ssol.gather_heads(hs), np.asarray(head),
                               atol=1e-7)


def test_sharded_all_bnd_packages_match():
    """DRN/RIV/GHB/EVT/HFB in the sharded path must reproduce the
    single-chip solve (sharded feature parity, VERDICT r2 item 2)."""
    rng = np.random.default_rng(11)
    nrow, ncol = 16, 12
    g = DisGrid.create(1, nrow, ncol, delr=10.0, delc=10.0, top=20.0,
                       botm=np.zeros((1, nrow, ncol)))
    kfield = np.exp(rng.normal(0, 0.5, size=nrow * ncol))
    kw = dict(
        k=kfield, strt=8.0,
        storage={"ss": 1e-4, "iconvert": 0},
        chd=[(i * ncol, 10.0) for i in range(nrow)],
        wel=[(5 * ncol + 4, -30.0)],
        rch=[(n, 5e-5) for n in range(nrow * ncol)],
        drn=[(3 * ncol + 7, 7.5, 2.0), (9 * ncol + 2, 7.0, 1.5)],
        riv=[(i * ncol + ncol - 1, 6.5, 4.0, 5.0) for i in range(nrow)],
        ghb=[(12 * ncol + 6, 9.0, 0.8)],
        evt=[(n, 20.0, 1e-5, 15.0) for n in range(nrow * ncol)],
        hfb=[(6 * ncol + 3, 7 * ncol + 3, 1e-6)],
    )
    model = build_gwf("parbnd", g, **kw)
    sol = NumericalSolution(model, tight())
    part = partition_model(model, 4)
    ssol = ShardedSolution(part, tight())

    head = jnp.asarray(model.strt)
    hs = ssol.scatter_heads(np.asarray(model.strt))
    for kstp, delt in enumerate([0.5, 2.0], start=1):
        head, info, _ = sol.solve_timestep(head, delt=delt, kstp=kstp,
                                           iss=False)
        hs, sinfo = ssol.solve_timestep(hs, delt=delt, kstp=kstp, iss=False)
        assert info.converged and sinfo["converged"]
    np.testing.assert_allclose(ssol.gather_heads(hs), np.asarray(head),
                               atol=1e-7)


def test_sharded_mixed_precision_matches():
    """The f32+refinement sharded solve must agree with the f64 single-chip
    solve to outer_dvclose-level accuracy."""
    rng = np.random.default_rng(3)
    nrow, ncol = 16, 12
    kfield = np.exp(rng.normal(0, 0.8, size=nrow * ncol))
    model = make_model(nrow, ncol, kfield)
    sol = NumericalSolution(model, tight())
    head_ref, info, _ = sol.solve_timestep(model.strt, delt=1.0, iss=True)
    assert info.converged

    s = ImsSettings(outer_dvclose=1e-8, outer_maximum=100,
                    inner_dvclose=1e-10, inner_rclose=1e-9,
                    inner_maximum=2000, precision="mixed")
    part = partition_model(model, 4)
    ssol = ShardedSolution(part, s)
    hs, sinfo = ssol.solve_timestep(
        ssol.scatter_heads(np.asarray(model.strt)), delt=1.0, iss=True)
    assert sinfo["converged"]
    np.testing.assert_allclose(ssol.gather_heads(hs), np.asarray(head_ref),
                               atol=1e-6)


def test_partition_rejects_unsupported():
    """Unsupported features must fail loudly, not drop physics silently."""
    g = DisGrid.create(1, 8, 6, delr=10.0, delc=10.0, top=20.0,
                       botm=np.zeros((1, 8, 6)))
    model = build_gwf("parx", g, k=1.0, strt=8.0,
                      chd=[(0, 10.0), (47, 6.0)], xt3d=1)
    with pytest.raises(NotImplementedError):
        partition_model(model, 2)


def test_sharded_newton_matches_single():
    model = make_model(newton=True)
    s = ImsSettings(outer_dvclose=1e-8, outer_maximum=200,
                    inner_dvclose=1e-10, inner_rclose=1e-9,
                    inner_maximum=2000, linear_acceleration="bicgstab")
    sol = NumericalSolution(model, s)
    head_ref, info, _ = sol.solve_timestep(model.strt, delt=1.0, iss=True)
    assert info.converged

    part = partition_model(model, 2)
    ssol = ShardedSolution(part, s)
    hs, sinfo = ssol.solve_timestep(ssol.scatter_heads(np.asarray(model.strt)),
                                    delt=1.0, iss=True)
    assert sinfo["converged"]
    np.testing.assert_allclose(ssol.gather_heads(hs), np.asarray(head_ref),
                               atol=2e-6)


# ------------------------------------------------------- general sharding

def _solve_both(model, nshards, iss=True, delt=1.0, nstep=1,
                settings=None):
    from modflow6_tpu.parallel.general import (GeneralShardedSolution,
                                               partition_general)
    s = settings or tight()
    sol = NumericalSolution(model, s)
    head_ref = jnp.asarray(model.strt)
    for k in range(nstep):
        head_ref, info, _ = sol.solve_timestep(head_ref, delt=delt,
                                               kstp=k + 1, iss=iss)
        assert info.converged
    part = partition_general(model, nshards)
    gsol = GeneralShardedSolution(part, s)
    hs = gsol.scatter_heads(np.asarray(model.strt))
    for k in range(nstep):
        hs, sinfo = gsol.solve_timestep(hs, delt=delt, kstp=k + 1, iss=iss)
        assert sinfo["converged"]
    return np.asarray(head_ref), gsol.gather_heads(hs)


def test_general_sharded_dis_matches_single():
    """Gather-based sharding reproduces the single-chip DIS solve."""
    rng = np.random.default_rng(3)
    model = make_model(12, 10, np.exp(rng.normal(0, 0.8, size=120)))
    ref, shd = _solve_both(model, 4)
    np.testing.assert_allclose(shd, ref, atol=1e-7)


def test_general_sharded_disv_matches_single():
    """DISV (vertex grid) sharding — the gather matvec + halo index
    exchange the row-sharded path cannot do (VERDICT r3 #5)."""
    from modflow6_tpu.models.discretization import DisvGrid

    # 6x6 quad vertex grid as DISV
    nr = nc = 6
    verts = [(j * 10.0, -i * 10.0) for i in range(nr + 1)
             for j in range(nc + 1)]
    cells = []
    for i in range(nr):
        for j in range(nc):
            v0 = i * (nc + 1) + j
            ids = [v0, v0 + 1, v0 + nc + 2, v0 + nc + 1]
            xs = [verts[v][0] for v in ids]
            ys = [verts[v][1] for v in ids]
            cells.append((sum(xs) / 4.0, sum(ys) / 4.0, ids))
    g = DisvGrid.create(2, nr * nc, np.asarray(verts), cells,
                        top=20.0, botm=np.stack([
                            10.0 * np.ones(nr * nc), np.zeros(nr * nc)]))
    rng = np.random.default_rng(5)
    model = build_gwf(
        "dv", g, k=np.exp(rng.normal(0, 0.6, size=2 * nr * nc)), strt=8.0,
        chd=[(i * nc, 10.0) for i in range(nr)]
        + [(i * nc + nc - 1, 6.0) for i in range(nr)],
        wel=[(nr * nc + 14, -20.0)])
    ref, shd = _solve_both(model, 3)
    np.testing.assert_allclose(shd, ref, atol=1e-7)


def test_general_sharded_xt3d_matches_single():
    """XT3D full mode sharded with depth-2 halos matches single-chip
    (GridConnection.f90:31-80 stencil-depth-2 role)."""
    nrow, ncol = 10, 8
    g = DisGrid.create(1, nrow, ncol, 10.0, 10.0, 20.0,
                       np.zeros((1, nrow, ncol)))
    rng = np.random.default_rng(11)
    model = build_gwf(
        "xt", g, k=np.exp(rng.normal(0, 0.5, size=nrow * ncol)),
        k22=np.exp(rng.normal(0, 0.5, size=nrow * ncol)),
        angle1=30.0, xt3d=1, strt=8.0,
        chd=[(i * ncol, 10.0) for i in range(nrow)]
        + [(i * ncol + ncol - 1, 6.0) for i in range(nrow)])
    s = ImsSettings(outer_dvclose=1e-8, outer_maximum=100,
                    inner_dvclose=1e-10, inner_rclose=1e-9,
                    inner_maximum=2000, linear_acceleration="bicgstab")
    ref, shd = _solve_both(model, 3, settings=s)
    np.testing.assert_allclose(shd, ref, atol=1e-7)


def test_general_sharded_two_model_composite():
    """Two GWF models + GWF-GWF exchange, merged then sharded so the
    partition boundary crosses the exchange (DistributedSim.f90:202-292
    multi-model distribution role)."""
    from modflow6_tpu.models.gwf.exchange import (ExchangePair,
                                                  GwfGwfExchange,
                                                  merge_gwf_models)
    ncol, nrow = 8, 8
    g = DisGrid.create(1, nrow, ncol, 10.0, 10.0, 20.0,
                       np.zeros((1, nrow, ncol)))
    west = build_gwf("w", g, k=2.0, strt=8.0,
                     chd=[(i * ncol, 10.0) for i in range(nrow)])
    east = build_gwf("e", g, k=4.0, strt=8.0,
                     chd=[(i * ncol + ncol - 1, 6.0) for i in range(nrow)],
                     wel=[(3 * ncol + 2, -15.0)])
    pairs = [ExchangePair(i * ncol + ncol - 1, i * ncol, ihc=1, cl1=5.0,
                          cl2=5.0, hwva=10.0) for i in range(nrow)]
    merged = merge_gwf_models([west, east], [GwfGwfExchange(0, 1, pairs)])
    ref, shd = _solve_both(merged, 4)
    np.testing.assert_allclose(shd, ref, atol=1e-7)


def test_general_sharded_transient_newton():
    """Newton unconfined + transient storage through the general path."""
    model = make_model(12, 10, transient=True, newton=True)
    s = ImsSettings(outer_dvclose=1e-8, outer_maximum=200,
                    inner_dvclose=1e-10, inner_rclose=1e-9,
                    inner_maximum=2000, linear_acceleration="bicgstab")
    ref, shd = _solve_both(model, 4, iss=False, delt=0.5, nstep=3,
                           settings=s)
    np.testing.assert_allclose(shd, ref, atol=1e-7)
