"""Solver robustness machinery: Chebyshev preconditioning, PTC,
backtracking (reference NumericalSolution.f90 sln_calc_ptc:2936,
sln_backtracking:2680; ImsLinearBase.f90 preconditioner role)."""

import numpy as np
import jax.numpy as jnp

from modflow6_tpu.models.discretization import DisGrid
from modflow6_tpu.models.gwf.builder import build_gwf
from modflow6_tpu.models.simulation import Simulation
from modflow6_tpu.ops.solvers import cg
from modflow6_tpu.ops.solvers.precond import (chebyshev_precondition,
                                              estimate_lambda_max,
                                              jacobi_precondition)
from modflow6_tpu.solution import ImsSettings, NumericalSolution
from modflow6_tpu.timing import StressPeriod, Tdis


def _laplacian_system(n, rng):
    """1-D heterogeneous CVFD-style negative-definite system."""
    k = np.exp(rng.normal(0.0, 2.0, n + 1))
    a = np.zeros((n, n))
    for i in range(n):
        a[i, i] = -(k[i] + k[i + 1])
        if i > 0:
            a[i, i - 1] = k[i]
        if i < n - 1:
            a[i, i + 1] = k[i + 1]
    return a


def test_lambda_max_estimate():
    rng = np.random.default_rng(5)
    a = _laplacian_system(128, rng)
    d = np.diag(a)
    matvec = lambda v: jnp.asarray(a) @ v  # noqa: E731
    lmax = float(estimate_lambda_max(matvec, jnp.asarray(d), iters=30))
    true = np.max(np.abs(np.linalg.eigvals(np.diag(1.0 / d) @ a)))
    # must be a (slight) overestimate of the true spectral bound
    assert true * 0.95 <= lmax <= true * 1.3


def test_chebyshev_cuts_iterations():
    rng = np.random.default_rng(6)
    n = 256
    a = _laplacian_system(n, rng)
    b = rng.normal(size=n)
    matvec = lambda v: jnp.asarray(a) @ v  # noqa: E731
    diag = jnp.asarray(np.diag(a))
    kw = dict(itmax=2000, dvclose=1e-9, rclose=1e-8)
    res_j = cg(matvec, jnp.asarray(b), jnp.zeros(n),
               jacobi_precondition(diag), **kw)
    res_c = cg(matvec, jnp.asarray(b), jnp.zeros(n),
               chebyshev_precondition(matvec, diag, order=4), **kw)
    assert bool(res_j.converged) and bool(res_c.converged)
    x = np.linalg.solve(a, b)
    np.testing.assert_allclose(np.asarray(res_c.x), x, atol=1e-6)
    # degree-4 Chebyshev should need far fewer Krylov iterations
    assert int(res_c.iters) < int(res_j.iters) / 2


def test_chebyshev_in_simulation():
    # same steady problem solved with jacobi and chebyshev must agree
    ncol = 40
    g = DisGrid.create(1, 1, ncol, 10.0, 10.0, 10.0, np.zeros((1, 1, ncol)))
    rng = np.random.default_rng(7)
    k = np.exp(rng.normal(0.0, 1.0, ncol))
    heads = {}
    for pc, order in [("jacobi", 2), ("chebyshev", 4)]:
        m = build_gwf(f"cheb_{pc}", g, k=k, strt=5.0,
                      chd=[(0, 10.0), (ncol - 1, 0.0)])
        s = ImsSettings(outer_dvclose=1e-8, inner_dvclose=1e-9,
                        inner_rclose=1e-8, inner_maximum=400,
                        preconditioner=pc, preconditioner_order=order)
        sol = NumericalSolution(m, s)
        h, info, _ = sol.solve_timestep(m.strt, 1.0, iss=True)
        assert info.converged
        heads[pc] = np.asarray(h)
    np.testing.assert_allclose(heads["chebyshev"], heads["jacobi"], atol=1e-6)


def test_ptc_steady_newton_converges():
    # steep unconfined Newton problem, steady: PTC stabilizes early
    # iterations (gwf_ptc gwf.f90:625-687).  Same answer with/without on
    # this solvable case; with PTC must converge and match.
    ncol = 30
    g = DisGrid.create(1, 1, ncol, delr=50.0, delc=50.0, top=50.0,
                       botm=np.zeros((1, 1, ncol)))

    def make():
        return build_gwf("ptc", g, k=5.0, strt=45.0, icelltype=1,
                         newton=True,
                         chd=[(0, 45.0), (ncol - 1, 12.0)])

    s_ptc = ImsSettings(outer_dvclose=1e-8, outer_maximum=200,
                        inner_dvclose=1e-10, inner_rclose=1e-9,
                        inner_maximum=200, linear_acceleration="bicgstab")
    sol = NumericalSolution(make(), s_ptc)
    assert sol._use_ptc(True, kper=1)
    h_ptc, info, _ = sol.solve_timestep(make().strt, 1.0, iss=True)
    assert info.converged

    s_off = ImsSettings(outer_dvclose=1e-8, outer_maximum=200,
                        inner_dvclose=1e-10, inner_rclose=1e-9,
                        inner_maximum=200, linear_acceleration="bicgstab",
                        no_ptc="all")
    sol2 = NumericalSolution(make(), s_off)
    assert not sol2._use_ptc(True, kper=1)
    h_off, info2, _ = sol2.solve_timestep(make().strt, 1.0, iss=True)
    assert info2.converged
    np.testing.assert_allclose(np.asarray(h_ptc), np.asarray(h_off),
                               atol=1e-5)
    # analytic check: Dupuit parabola h^2 linear in x between the CHDs
    h2 = np.asarray(h_ptc) ** 2
    lin = np.linspace(h2[0], h2[-1], ncol)
    np.testing.assert_allclose(h2[1:-1], lin[1:-1], rtol=4e-2)


def test_no_ptc_first_period_gate():
    g = DisGrid.create(1, 1, 4, 1.0, 1.0, 1.0, np.zeros((1, 1, 4)))
    m = build_gwf("gate", g, k=1.0, strt=0.5, icelltype=1, newton=True,
                  chd=[(0, 1.0), (3, 0.2)])
    s = ImsSettings(no_ptc="first", linear_acceleration="bicgstab")
    sol = NumericalSolution(m, s)
    assert not sol._use_ptc(True, kper=1)
    assert sol._use_ptc(True, kper=2)
    assert not sol._use_ptc(False, kper=2)  # transient: never


def test_backtracking_path_converges():
    # COMPLEX-preset-style settings with backtracking enabled must converge
    # to the same solution as the plain path
    ncol = 25
    g = DisGrid.create(1, 1, ncol, 10.0, 10.0, 20.0, np.zeros((1, 1, ncol)))
    rng = np.random.default_rng(8)
    k = np.exp(rng.normal(0.0, 1.5, ncol))

    def make():
        return build_gwf("bt", g, k=k, strt=15.0, icelltype=1, newton=True,
                         chd=[(0, 18.0), (ncol - 1, 6.0)],
                         rch=[(i, 1e-3) for i in range(ncol)])

    s_bt = ImsSettings(outer_dvclose=1e-8, outer_maximum=300,
                       inner_dvclose=1e-10, inner_rclose=1e-9,
                       inner_maximum=300, linear_acceleration="bicgstab",
                       backtracking_number=10, backtracking_tolerance=1.05,
                       backtracking_reduction_factor=0.5,
                       backtracking_residual_limit=0.002)
    sol_bt = NumericalSolution(make(), s_bt)
    h_bt, info_bt, _ = sol_bt.solve_timestep(make().strt, 1.0, iss=True)
    assert info_bt.converged

    s0 = ImsSettings(outer_dvclose=1e-8, outer_maximum=300,
                     inner_dvclose=1e-10, inner_rclose=1e-9,
                     inner_maximum=300, linear_acceleration="bicgstab")
    sol0 = NumericalSolution(make(), s0)
    h0, info0, _ = sol0.solve_timestep(make().strt, 1.0, iss=True)
    assert info0.converged
    np.testing.assert_allclose(np.asarray(h_bt), np.asarray(h0), atol=1e-5)


def test_fused_matches_ims_with_ptc():
    # fused (while_loop) path and diagnostic path agree on a Newton
    # steady-state problem where PTC is active in both
    import jax
    from modflow6_tpu.solution.fused import make_fused_step

    ncol = 15
    g = DisGrid.create(1, 1, ncol, 20.0, 20.0, 30.0, np.zeros((1, 1, ncol)))
    m = build_gwf("fp", g, k=2.0, strt=25.0, icelltype=1, newton=True,
                  chd=[(0, 28.0), (ncol - 1, 8.0)])
    s = ImsSettings(outer_dvclose=1e-9, outer_maximum=150,
                    inner_dvclose=1e-11, inner_rclose=1e-10,
                    inner_maximum=300, linear_acceleration="bicgstab")
    sol = NumericalSolution(m, s)
    h_ims, info, _ = sol.solve_timestep(m.strt, 1.0, iss=True)
    assert info.converged
    step = jax.jit(make_fused_step(m, s, iss=True, kper=2))
    h_fused, kiter, inner, conv = step(m.strt, jnp.asarray(1.0),
                                       jnp.asarray(1, jnp.int32))
    assert bool(conv)
    np.testing.assert_allclose(np.asarray(h_fused), np.asarray(h_ims),
                               atol=1e-7)


def test_mg_preconditioner_2d():
    # lognormal-K steady problem: MG-CG must agree with Jacobi-CG and use
    # dramatically fewer inner iterations
    nrow = ncol = 48
    g = DisGrid.create(1, nrow, ncol, 10.0, 10.0, 10.0,
                       np.zeros((1, nrow, ncol)))
    rng = np.random.default_rng(9)
    k = np.exp(rng.normal(0.0, 1.0, nrow * ncol))
    chd = ([(i * ncol, 12.0) for i in range(nrow)]
           + [(i * ncol + ncol - 1, 2.0) for i in range(nrow)])

    infos = {}
    heads = {}
    for pc in ("jacobi", "mg"):
        m = build_gwf(f"mg_{pc}", g, k=k, strt=8.0, chd=chd,
                      wel=[(nrow // 2 * ncol + ncol // 2, -80.0)])
        s = ImsSettings(outer_dvclose=1e-7, inner_dvclose=1e-9,
                        inner_rclose=1e-8, inner_maximum=3000,
                        preconditioner=pc)
        sol = NumericalSolution(m, s)
        h, info, _ = sol.solve_timestep(m.strt, 1.0, iss=True)
        assert info.converged, (pc, info)
        infos[pc] = info
        heads[pc] = np.asarray(h)
    np.testing.assert_allclose(heads["mg"], heads["jacobi"], atol=1e-5)
    assert infos["mg"].inner_iterations < infos["jacobi"].inner_iterations / 5


def test_mg_odd_sizes_and_3d():
    # odd row/col counts exercise the padding path; nlay>1 the
    # semi-coarsening.  CHDs pin every layer so the steady uniform-K
    # solution is a linear profile (pinning only layer 0 makes the true
    # answer a curved 3-D field, which this test previously asserted
    # against incorrectly); heads must also match the Jacobi path exactly.
    nlay, nrow, ncol = 3, 21, 17
    ncpl = nrow * ncol
    g = DisGrid.create(nlay, nrow, ncol, 10.0, 10.0, 30.0,
                       np.linspace(20.0, -10.0, nlay)[:, None, None]
                       * np.ones((nlay, nrow, ncol)))
    chd = [(lay * ncpl + i * ncol, 28.0)
           for lay in range(nlay) for i in range(nrow)] \
        + [(lay * ncpl + i * ncol + ncol - 1, 22.0)
           for lay in range(nlay) for i in range(nrow)]
    heads = {}
    for pc in ("jacobi", "mg"):
        m = build_gwf(f"mg3d_{pc}", g, k=5.0, strt=25.0, chd=chd)
        s = ImsSettings(outer_dvclose=1e-7, inner_dvclose=1e-9,
                        inner_rclose=1e-8, inner_maximum=500,
                        preconditioner=pc)
        sol = NumericalSolution(m, s)
        h, info, _ = sol.solve_timestep(m.strt, 1.0, iss=True)
        assert info.converged, (pc, info)
        heads[pc] = np.asarray(h)
    np.testing.assert_allclose(heads["mg"], heads["jacobi"], atol=1e-6)
    h3 = heads["mg"].reshape(nlay, nrow, ncol)
    lin = np.linspace(28.0, 22.0, ncol)
    for lay in range(nlay):
        np.testing.assert_allclose(h3[lay, 10], lin, atol=1e-5)


def test_npf_rewetting_two_layer():
    """WETDRY rewetting (gwf-npf.f90 sgwf_npf_wetdry + rewet_check, the
    test_gwf_npf02_rewet scenario class): the upper layer starts dry,
    rewets from below as the water table rises, and the standard
    formulation with rewetting matches the Newton solution of the same
    unconfined problem."""
    import numpy as np
    import jax.numpy as jnp
    from modflow6_tpu.models.discretization import DisGrid
    from modflow6_tpu.models.gwf.builder import build_gwf
    from modflow6_tpu.solution import ImsSettings, NumericalSolution

    nlay, ncol = 2, 9
    botm = np.zeros((nlay, 1, ncol))
    botm[0] = 10.0
    g = DisGrid.create(nlay, 1, ncol, 10.0, 10.0, 20.0, botm)

    def chd(hL, hR):
        return [(ncol, hL), (2 * ncol - 1, hR)]   # layer-2 end cells

    # oracle: Newton unconfined, all cells stay active
    mN = build_gwf("nwt", g, k=5.0, k33=5.0, strt=5.0, icelltype=1,
                   newton=True, chd=chd(18.0, 12.0))
    sN = ImsSettings(outer_dvclose=1e-8, outer_maximum=200,
                     inner_dvclose=1e-10, inner_rclose=1e-9,
                     inner_maximum=500, linear_acceleration="bicgstab")
    hN, infoN, _ = NumericalSolution(mN, sN).solve_timestep(
        mN.strt, 1.0, iss=True)
    assert infoN.converged

    # standard formulation with rewetting: strt=5 dries layer 1 at the
    # first sweep; the rising table rewets it from below and horizontally
    # (wetdry=+1; CHD neighbors never trigger rewetting — rewet_check
    # requires ibdm > 0 — so the corner cells wet from their horizontal
    # neighbors)
    wetdry = np.zeros(g.nodes)
    wetdry[:ncol] = 1.0
    mR = build_gwf("rew", g, k=5.0, k33=5.0, strt=5.0, icelltype=1,
                   chd=chd(18.0, 12.0),
                   rewetting=dict(wetdry=wetdry, wetfct=1.0, iwetit=1,
                                  ihdwet=0))
    sR = ImsSettings(outer_dvclose=1e-8, outer_maximum=300,
                     inner_dvclose=1e-10, inner_rclose=1e-9,
                     inner_maximum=500, linear_acceleration="bicgstab",
                     under_relaxation="dbd", theta=0.9, akappa=1e-4,
                     gamma=0.0, amomentum=0.0)
    sol = NumericalSolution(mR, sR)
    hR, infoR, aux = sol.solve_timestep(mR.strt, 1.0, iss=True)
    assert infoR.converged
    ib = np.asarray(aux["ibound"])
    hR = np.asarray(hR)
    hN = np.asarray(hN)
    # layer-1 cells under a high water table rewetted; the dry tail stays
    # inactive where the Newton water table sits below layer-1 bottom + 1
    assert (ib[:ncol] > 0).any(), "no upper-layer cell rewetted"
    wt = hN[ncol:]            # water table from the Newton oracle
    for j in range(ncol):
        if wt[j] > 11.5:
            assert ib[j] > 0, f"col {j} should have rewetted"
        if wt[j] < 10.5:
            assert ib[j] == 0, f"col {j} should be dry"
    # heads agree with the Newton oracle on active cells
    act = ib > 0
    np.testing.assert_allclose(hR[act], hN[act], atol=0.05)

    # dry-status persistence across steps (ibound_in carry)
    h2, info2, aux2 = sol.solve_timestep(
        jnp.asarray(hR), 1.0, iss=True, ibound_in=jnp.asarray(ib))
    assert info2.converged
    np.testing.assert_allclose(np.asarray(h2)[act], hN[act], atol=0.05)


def test_continue_option_failure_semantics(tmp_path):
    """Without CONTINUE a nonconverging deck aborts (Sim.f90 ustop
    role); with CONTINUE it runs through and flags the listing."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    import pytest
    from test_advanced_decks import _sim_files, write
    from modflow6_tpu.utils.mf6io import load_simulation

    def build(ws, cont):
        _sim_files(ws, "  WEL6 model.wel wel-1", nper=1,
                   perlen="10.0 1 1.0")
        write(ws, "model.wel", """
BEGIN DIMENSIONS
  MAXBOUND 1
END DIMENSIONS
BEGIN PERIOD 1
  1 1 4 -50.0
END PERIOD
""")
        # sabotage: an unreachable outer tolerance with one iteration
        ims = open(os.path.join(ws, "sim.ims")).read().replace(
            "OUTER_MAXIMUM 200", "OUTER_MAXIMUM 1").replace(
            "OUTER_DVCLOSE 1.0e-8", "OUTER_DVCLOSE 1.0e-30").replace(
            "INNER_MAXIMUM 500", "INNER_MAXIMUM 2")
        write(ws, "sim.ims", ims)
        if cont:
            nam = open(os.path.join(ws, "mfsim.nam")).read().replace(
                "BEGIN OPTIONS", "BEGIN OPTIONS\n  CONTINUE", 1)
            write(ws, "mfsim.nam", nam)

    ws1 = str(tmp_path / "a")
    os.makedirs(ws1)
    build(ws1, cont=False)
    sim = load_simulation(ws1)
    with pytest.raises(RuntimeError, match="CONTINUE"):
        sim.run()

    ws2 = str(tmp_path / "b")
    os.makedirs(ws2)
    build(ws2, cont=True)
    sim2 = load_simulation(ws2)
    recs = sim2.run()
    assert len(recs) == 1 and not recs[0].converged
