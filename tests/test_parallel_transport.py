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
