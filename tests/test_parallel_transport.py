"""Sharded coupled flow→transport equivalence (distributed GWT/GWE on the
general partition vs the single-chip sequential coupling).

Role of the reference's parallel transport autotests
(autotest/test_par_gwt01.py): same problem, unpartitioned vs sharded,
matching concentrations/temperatures.
"""

import numpy as np
import jax.numpy as jnp

from modflow6_tpu.models.discretization import DisGrid
from modflow6_tpu.models.gwf.builder import build_gwf
from modflow6_tpu.models.gwt.builder import build_gwt
from modflow6_tpu.models.gwe.builder import build_gwe
from modflow6_tpu.models.gwt.fmi import from_gwf_step
from modflow6_tpu.parallel.transport import (GeneralCoupledSolution,
                                             partition_coupled)
from modflow6_tpu.solution import ImsSettings, NumericalSolution


def tight():
    return ImsSettings(outer_dvclose=1e-8, outer_maximum=100,
                       inner_dvclose=1e-11, inner_rclose=1e-10,
                       inner_maximum=2000)


def ttight():
    return ImsSettings(outer_dvclose=1e-8, outer_maximum=50,
                       inner_dvclose=1e-11, inner_rclose=1e-10,
                       inner_maximum=2000, linear_acceleration="bicgstab")


def _flow_model(nrow=12, ncol=10, seed=3):
    rng = np.random.default_rng(seed)
    g = DisGrid.create(1, nrow, ncol, delr=10.0, delc=10.0, top=20.0,
                       botm=np.zeros((1, nrow, ncol)))
    return build_gwf(
        "f", g, k=np.exp(rng.normal(0, 0.6, size=nrow * ncol)), strt=8.0,
        chd=[(i * ncol, 10.0) for i in range(nrow)]
        + [(i * ncol + ncol - 1, 6.0) for i in range(nrow)],
        rch=[(n, 2e-4) for n in range(nrow * ncol)]), g


def _reference_coupled(gwf, gwt, nstep, delt, ssm_spec):
    sol_f = NumericalSolution(gwf, tight())
    sol_t = NumericalSolution(gwt, ttight())
    head = jnp.asarray(gwf.strt)
    conc = jnp.asarray(gwt.strt)
    for k in range(nstep):
        head_new, info, aux = sol_f.solve_timestep(head, delt, kstp=k + 1,
                                                   iss=True)
        assert info.converged
        fields = from_gwf_step(gwf, head_new, head, aux["ibound"],
                               aux["cond"], delt, True,
                               ssm_spec=ssm_spec)
        gwt.set_flows(fields)
        conc, tinfo, _ = sol_t.solve_timestep(conc, delt, kstp=k + 1,
                                              iss=False, pkgs=fields)
        assert tinfo.converged
        head = head_new
    return np.asarray(head), np.asarray(conc)


def _sharded_coupled(gwf, gwt, nshards, nstep, delt, ssm_spec):
    part = partition_coupled(gwf, gwt, nshards)
    csol = GeneralCoupledSolution(part, gwt, tight(), ttight(),
                                  ssm_spec=ssm_spec)
    hs = csol.scatter(np.asarray(gwf.strt))
    cs = csol.scatter(np.asarray(gwt.strt))
    for k in range(nstep):
        hs, cs, info = csol.solve_timestep(hs, cs, delt, kstp=k + 1,
                                           iss=True)
        assert info["converged"]
    return csol.gather(hs), csol.gather(cs)


def test_coupled_gwt_sharded_matches_single():
    """GWF→GWT with advection + dispersion + CNC + SSM, 3 shards."""
    gwf, g = _flow_model()
    ssm = {"RCH": 0.25}
    N = g.nodes

    def mk_gwt():
        return build_gwt(
            "t", g, porosity=0.3, strt=0.0, scheme="upstream",
            cnc=[(i * 10, 1.0) for i in range(12)],
            dsp=dict(alh=np.full(N, 1.0), ath1=np.full(N, 0.1),
                     diffc=np.full(N, 1e-4)))

    ref_h, ref_c = _reference_coupled(gwf, mk_gwt(), 3, 50.0, ssm)
    shd_h, shd_c = _sharded_coupled(gwf, mk_gwt(), 3, 3, 50.0, ssm)
    np.testing.assert_allclose(shd_h, ref_h, atol=1e-7)
    np.testing.assert_allclose(shd_c, ref_c, atol=1e-7)
    assert np.max(ref_c) > 0.01      # transport actually moved mass


def test_coupled_gwe_sharded_matches_single():
    """GWF→GWE (heat) with conduction + CTP, 4 shards."""
    gwf, g = _flow_model(seed=11)

    def mk_gwe():
        return build_gwe(
            "e", g, porosity=0.3, strt=5.0, scheme="upstream",
            rhow=1000.0, cpw=4184.0, rhos=2650.0, cps=800.0,
            ctp=[(i * 10, 25.0) for i in range(12)],
            cnd=dict(alh=0.5, ath1=0.05, ktw=0.6, kts=2.0))

    ref_h, ref_t = _reference_coupled(gwf, mk_gwe(), 2, 100.0, None)
    shd_h, shd_t = _sharded_coupled(gwf, mk_gwe(), 4, 2, 100.0, None)
    np.testing.assert_allclose(shd_h, ref_h, atol=1e-7)
    np.testing.assert_allclose(shd_t, ref_t, atol=1e-6)
    assert np.max(ref_t) > 5.5


# ---------------------------------------------------- BUY / CSUB sharding

def test_sharded_buy_matches_single():
    """BUY density coupling sharded: lagged concentration passed per
    solve (the reference distributes BUY inside each rank's model)."""
    import dataclasses
    from modflow6_tpu.models.gwf.buy import make_buy
    from modflow6_tpu.parallel.general import (GeneralShardedSolution,
                                               partition_general)

    gwf, g = _flow_model(seed=5)
    gwf.buy = make_buy(denseref=1000.0, drhodc=[0.7], crhoref=[0.0])
    conc = jnp.asarray(np.linspace(0.0, 35.0, g.nodes))
    s = tight()
    sol = NumericalSolution(gwf, s)
    pkgs = dataclasses.replace(gwf.packages, buy_conc=conc)
    ref, info, _ = sol.solve_timestep(gwf.strt, 20.0, iss=True, pkgs=pkgs)
    assert info.converged

    part = partition_general(gwf, 3)
    gsol = GeneralShardedSolution(part, s)
    hs, sinfo = gsol.solve_timestep(
        gsol.scatter_heads(np.asarray(gwf.strt)), 20.0, iss=True,
        conc=gsol.scatter_heads(np.asarray(conc)))
    assert sinfo["converged"]
    np.testing.assert_allclose(gsol.gather_heads(hs), np.asarray(ref),
                               atol=1e-7)


def test_sharded_csub_matches_single():
    """CSUB no-delay interbeds sharded: column-aligned split + up-chain
    geostatic accumulation matches the single-chip reshape/cumsum."""
    import dataclasses
    from modflow6_tpu.models.gwf.builder import build_gwf as _bg
    from modflow6_tpu.parallel.general import (GeneralShardedSolution,
                                               partition_general)

    rng = np.random.default_rng(9)
    nlay, nrow, ncol = 2, 6, 8
    g = DisGrid.create(nlay, nrow, ncol, 10.0, 10.0, 20.0,
                       np.stack([10.0 * np.ones((nrow, ncol)),
                                 np.zeros((nrow, ncol))]))
    ncpl = nrow * ncol
    model = _bg(
        "cs", g, k=np.exp(rng.normal(0, 0.5, size=2 * ncpl)), strt=18.0,
        storage={"ss": 1e-5, "iconvert": 0},
        chd=[(i * ncol, 19.0) for i in range(nrow)],
        wel=[(ncpl + 20, -30.0)],
        csub=dict(sgm=1.7, sgs=2.0, cg_ske_cr=1e-5, cg_theta=0.2,
                  interbeds=[(ncpl + 10, 4.0, 1e-4, 1e-2, 0.3),
                             (5, 3.0, 2e-4, 5e-3, 0.25)]))
    state0 = model.csub_state0
    s = tight()
    sol = NumericalSolution(model, s)
    pkgs = dataclasses.replace(model.packages, csub_state=state0)
    ref, info, _ = sol.solve_timestep(model.strt, 5.0, iss=False,
                                      pkgs=pkgs)
    assert info.converged

    part = partition_general(model, 4)
    gsol = GeneralShardedSolution(part, s)
    hs, sinfo = gsol.solve_timestep(
        gsol.scatter_heads(np.asarray(model.strt)), 5.0, iss=False,
        csub_state=gsol.scatter_csub_state(state0))
    assert sinfo["converged"]
    np.testing.assert_allclose(gsol.gather_heads(hs), np.asarray(ref),
                               atol=1e-7)


def test_coupled_buy_sharded_matches_single():
    """Density-coupled (BUY) flow→transport sharded: the lagged
    concentration feeds the sharded flow solve each step."""
    import dataclasses as dc
    from modflow6_tpu.models.gwf.buy import make_buy

    gwf, g = _flow_model(seed=21)
    gwf.buy = make_buy(denseref=1000.0, drhodc=[0.7], crhoref=[0.0])

    def mk_gwt():
        return build_gwt("t", g, porosity=0.3, strt=0.0,
                         scheme="upstream",
                         cnc=[(i * 10, 20.0) for i in range(12)])

    # single-chip reference with the same lagged coupling order
    gwt = mk_gwt()
    sol_f = NumericalSolution(gwf, tight())
    sol_t = NumericalSolution(gwt, ttight())
    head = jnp.asarray(gwf.strt)
    conc = jnp.asarray(gwt.strt)
    for k in range(3):
        pk = dc.replace(gwf.packages, buy_conc=conc)
        head_new, info, aux = sol_f.solve_timestep(head, 40.0, kstp=k + 1,
                                                   iss=True, pkgs=pk)
        assert info.converged
        fields = from_gwf_step(gwf, head_new, head, aux["ibound"], None,
                               40.0, True, pkgs=pk)
        conc, tinfo, _ = sol_t.solve_timestep(conc, 40.0, kstp=k + 1,
                                              iss=False, pkgs=fields)
        assert tinfo.converged
        head = head_new

    part = partition_coupled(gwf, mk_gwt(), 3)
    csol = GeneralCoupledSolution(part, mk_gwt(), tight(), ttight())
    hs = csol.scatter(np.asarray(gwf.strt))
    cs = csol.scatter(np.zeros(g.nodes))
    for k in range(3):
        hs, cs, info = csol.solve_timestep(hs, cs, 40.0, kstp=k + 1,
                                           iss=True)
        assert info["converged"]
    np.testing.assert_allclose(csol.gather(hs), np.asarray(head),
                               atol=1e-7)
    np.testing.assert_allclose(csol.gather(cs), np.asarray(conc),
                               atol=1e-7)
    assert np.max(np.asarray(conc)) > 1.0
