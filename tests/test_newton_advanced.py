"""Newton completeness: XT3D Newton fill (xt3d_fn) and Newton through
advanced packages (the previously-raising combinations, VERDICT r4 #4)."""

import numpy as np
import jax.numpy as jnp

from modflow6_tpu.models.discretization import DisGrid
from modflow6_tpu.models.gwf.builder import build_gwf
from modflow6_tpu.models.gwf.advanced import AugmentedGwfModel, build_maw
from modflow6_tpu.solution import ImsSettings, NumericalSolution


def settings():
    return ImsSettings(outer_dvclose=1e-8, outer_maximum=300,
                       inner_dvclose=1e-10, inner_rclose=1e-9,
                       inner_maximum=2000,
                       linear_acceleration="bicgstab")


def _grid(nrow=8, ncol=10, top=20.0):
    return DisGrid.create(1, nrow, ncol, 10.0, 10.0, top,
                          np.zeros((1, nrow, ncol)))


def _xt3d_model(newton, icelltype, top=20.0):
    rng = np.random.default_rng(2)
    g = _grid(top=top)
    n = g.nodes
    return build_gwf(
        "x", g, k=np.exp(rng.normal(0, 0.5, size=n)),
        k22=np.exp(rng.normal(0, 0.5, size=n)) * 0.5,
        angle1=np.full(n, 30.0), strt=15.0,
        icelltype=icelltype, newton=newton, xt3d=True,
        chd=[(i * 10, 16.0) for i in range(8)]
        + [(i * 10 + 9, 12.0) for i in range(8)],
        wel=[(4 * 10 + 5, -20.0)])


def test_xt3d_newton_confined_matches_picard_exactly():
    """Confined cells: the Newton xt3d system reduces to the Picard one
    (sat ≡ 1, fn terms gated off by icelltype==0) — heads identical."""
    ref = _xt3d_model(newton=False, icelltype=0)
    sol = NumericalSolution(ref, settings())
    h_ref, info, _ = sol.solve_timestep(ref.strt, 1.0, iss=True)
    assert info.converged

    newt = _xt3d_model(newton=True, icelltype=0)
    soln = NumericalSolution(newt, settings())
    h_new, ninfo, _ = soln.solve_timestep(newt.strt, 1.0, iss=True)
    assert ninfo.converged
    np.testing.assert_allclose(np.asarray(h_new), np.asarray(h_ref),
                               atol=1e-7)


def test_xt3d_newton_unconfined_converges():
    """Unconfined XT3D Newton: converges, stays close to the Picard
    formulation (they discretize saturation differently — upstream vs
    per-cell weighting — so only near-agreement is expected), and the
    water table sits inside the cell (genuinely unconfined)."""
    newt = _xt3d_model(newton=True, icelltype=1)
    soln = NumericalSolution(newt, settings())
    h_new, ninfo, _ = soln.solve_timestep(newt.strt, 1.0, iss=True)
    assert ninfo.converged
    ref = _xt3d_model(newton=False, icelltype=1)
    sol = NumericalSolution(ref, settings())
    h_ref, info, _ = sol.solve_timestep(ref.strt, 1.0, iss=True)
    assert info.converged
    h_new = np.asarray(h_new)
    assert h_new.max() < 20.0        # water table below the top
    np.testing.assert_allclose(h_new, np.asarray(h_ref), atol=0.05)


def test_newton_with_maw_converges_and_matches_picard():
    """Newton + MAW (the previously-unexpressible hard-deck combo):
    converges and lands within htol-class distance of the Picard twin."""
    def make(newton):
        g = _grid(top=20.0)
        base = build_gwf(
            "nm", g, k=5.0, strt=15.0, icelltype=1, newton=newton,
            chd=[(i * 10, 16.0) for i in range(8)])
        maw = build_maw([dict(radius=0.3, strt=15.0, rate=-40.0,
                              connections=[(3 * 10 + 6, 80.0)])], g)
        return AugmentedGwfModel(base, maw=maw)

    newt = make(True)
    assert newt.inewton == 1 or newt.inewton is True
    soln = NumericalSolution(newt, settings())
    x_new, ninfo, _ = soln.solve_timestep(jnp.asarray(newt.strt), 1.0,
                                          iss=True)
    assert ninfo.converged

    pic = make(False)
    solp = NumericalSolution(pic, settings())
    x_pic, pinfo, _ = solp.solve_timestep(jnp.asarray(pic.strt), 1.0,
                                          iss=True)
    assert pinfo.converged
    np.testing.assert_allclose(np.asarray(x_new), np.asarray(x_pic),
                               atol=0.05)
    # the pumped well row drew down below the aquifer around it
    assert np.asarray(x_new)[-1] < np.asarray(x_new)[3 * 10 + 6]
