"""XT3D full-tensor flux tests.

Mirrors the role of reference autotests test_gwf_xt3d01/02 and
test_gwf_ifmod_xt3d01: linear-field patch tests (XT3D is exact for linear
head fields with constant full-tensor K on any grid) and reduction to the
standard two-point scheme on orthogonal grids.
"""

import numpy as np
import jax.numpy as jnp

from modflow6_tpu.models.discretization import DisGrid, DisvGrid
from modflow6_tpu.models.gwf.builder import build_gwf
from modflow6_tpu.models.gwf import xt3d as xt3d_mod
from modflow6_tpu.solution import ImsSettings, NumericalSolution


def _settings():
    return ImsSettings(outer_dvclose=1e-9, outer_maximum=60,
                       inner_dvclose=1e-11, inner_rclose=1e-10,
                       inner_maximum=600, linear_acceleration="bicgstab")


def _boundary_nodes(nrow, ncol):
    nodes = set()
    for i in range(nrow):
        nodes.add(i * ncol)
        nodes.add(i * ncol + ncol - 1)
    for j in range(ncol):
        nodes.add(j)
        nodes.add((nrow - 1) * ncol + j)
    return sorted(nodes)


def _linear_field(grid, a, b):
    x, y, _ = xt3d_mod.cell_centers(grid)
    return 100.0 + a * x + b * y


def test_xt3d_matches_standard_on_orthogonal_grid():
    # axis-aligned K on a rectangular grid: XT3D reduces exactly to the
    # harmonic-mean two-point scheme (bhat terms vanish; chat01 becomes the
    # harmonic mean)
    nrow, ncol = 12, 15
    g = DisGrid.create(1, nrow, ncol, 10.0, 8.0, 10.0,
                       np.zeros((1, nrow, ncol)))
    rng = np.random.default_rng(11)
    k = np.exp(rng.normal(0.0, 1.0, nrow * ncol))
    chd = [(i * ncol, 10.0) for i in range(nrow)] + \
          [(i * ncol + ncol - 1, 2.0) for i in range(nrow)]
    heads = {}
    for mode in (0, 1):
        m = build_gwf(f"x{mode}", g, k=k, strt=5.0, chd=chd, xt3d=mode)
        sol = NumericalSolution(m, _settings())
        h, info, _ = sol.solve_timestep(m.strt, 1.0, iss=True)
        assert info.converged
        heads[mode] = np.asarray(h)
    np.testing.assert_allclose(heads[1], heads[0], atol=1e-7)


def test_xt3d_patch_rotated_anisotropy():
    # linear head field with strongly rotated anisotropic K must be
    # reproduced to solver tolerance (XT3D consistency; the standard
    # two-point scheme fails this badly)
    nrow = ncol = 12
    g = DisGrid.create(1, nrow, ncol, 10.0, 10.0, 10.0,
                       np.zeros((1, nrow, ncol)))
    hfield = _linear_field(g, 0.03, -0.02)
    bnodes = _boundary_nodes(nrow, ncol)
    chd = [(n, float(hfield[n])) for n in bnodes]
    m = build_gwf("patch", g, k=10.0, k22=1.0, angle1=30.0, strt=100.0,
                  chd=chd, xt3d=1)
    sol = NumericalSolution(m, _settings())
    h, info, _ = sol.solve_timestep(m.strt, 1.0, iss=True)
    assert info.converged
    np.testing.assert_allclose(np.asarray(h), hfield, atol=1e-6)

    # flux check: XT3D must produce the exact full-tensor flux for the
    # linear field, which differs from the two-point flux.  For
    # grad h = (a, b) and K rotated by θ, qx = -(Kxx·a + Kxy·b).
    ibound, _ = m.boundary_state(m.strt)
    q = np.asarray(m.edge_flows(jnp.asarray(hfield), ibound))
    th = np.deg2rad(30.0)
    kxx = 10.0 * np.cos(th) ** 2 + 1.0 * np.sin(th) ** 2
    kxy = (10.0 - 1.0) * np.sin(th) * np.cos(th)
    qx_exact = -(kxx * 0.03 + kxy * (-0.02)) * 10.0 * 10.0  # ×(width·thick)
    en = np.asarray(m.topo.edge_n)
    em = np.asarray(m.topo.edge_m)
    # pick an interior eastward edge in the middle of the grid
    mid = (nrow // 2) * ncol + ncol // 2
    e = int(np.where((en == mid) & (em == mid + 1))[0][0])
    # q is positive into n; eastward flux out of n = -q
    np.testing.assert_allclose(-q[e], qx_exact, rtol=1e-8)


def test_xt3d_rhs_mode_matches_full():
    nrow = ncol = 10
    g = DisGrid.create(1, nrow, ncol, 10.0, 10.0, 10.0,
                       np.zeros((1, nrow, ncol)))
    hfield = _linear_field(g, 0.02, 0.01)
    chd = [(n, float(hfield[n])) for n in _boundary_nodes(nrow, ncol)]
    heads = {}
    for mode in (1, 2):
        m = build_gwf(f"r{mode}", g, k=5.0, k22=0.5, angle1=-25.0,
                      strt=100.0, chd=chd, xt3d=mode)
        s = _settings()
        sol = NumericalSolution(m, s)
        h, info, _ = sol.solve_timestep(m.strt, 1.0, iss=True)
        assert info.converged, mode
        heads[mode] = np.asarray(h)
    np.testing.assert_allclose(heads[2], heads[1], atol=1e-6)
    np.testing.assert_allclose(heads[1], hfield, atol=1e-6)


def _skewed_disv(nrow, ncol, dx=10.0, dy=10.0, skew=0.35):
    """Parallelogram (skewed) quadrilateral grid — non-orthogonal, so the
    two-point scheme is inconsistent on it but XT3D is exact for linear
    fields."""
    verts = []
    for i in range(nrow + 1):
        for j in range(ncol + 1):
            verts.append((j * dx + skew * i * dx, -i * dy))
    cell2d = []
    for i in range(nrow):
        for j in range(ncol):
            v00 = i * (ncol + 1) + j
            ids = [v00, v00 + 1, v00 + ncol + 2, v00 + ncol + 1]
            xs = [verts[v][0] for v in ids]
            ys = [verts[v][1] for v in ids]
            cell2d.append((sum(xs) / 4.0, sum(ys) / 4.0, ids))
    return DisvGrid.create(1, nrow * ncol, np.array(verts), cell2d,
                           top=10.0, botm=np.zeros((1, nrow * ncol)))


def test_xt3d_patch_on_skewed_disv():
    nrow = ncol = 8
    g = _skewed_disv(nrow, ncol)
    hfield = _linear_field(g, 0.01, 0.02)
    chd = [(n, float(hfield[n])) for n in _boundary_nodes(nrow, ncol)]
    m = build_gwf("disv_patch", g, k=3.0, strt=100.0, chd=chd, xt3d=1)
    sol = NumericalSolution(m, _settings())
    h, info, _ = sol.solve_timestep(m.strt, 1.0, iss=True)
    assert info.converged
    np.testing.assert_allclose(np.asarray(h), hfield, atol=1e-6)


def test_xt3d_budget_closure():
    # flowja from the multi-point expression must close the budget at CHDs
    nrow = ncol = 9
    g = DisGrid.create(1, nrow, ncol, 10.0, 10.0, 10.0,
                       np.zeros((1, nrow, ncol)))
    chd = [(i * ncol, 10.0) for i in range(nrow)] + \
          [(i * ncol + ncol - 1, 4.0) for i in range(nrow)]
    m = build_gwf("bud", g, k=2.0, k22=0.4, angle1=20.0, strt=7.0,
                  chd=chd, xt3d=1)
    sol = NumericalSolution(m, _settings())
    h, info, _ = sol.solve_timestep(m.strt, 1.0, iss=True)
    assert info.converged
    ibound, _ = m.boundary_state(m.strt)
    q = np.asarray(m.edge_flows(h, ibound))
    en, em = np.asarray(m.topo.edge_n), np.asarray(m.topo.edge_m)
    into = np.zeros(m.nodes)
    np.add.at(into, en, q)
    np.add.at(into, em, -q)
    # interior cells: zero net flow (continuity); CHD cells balance
    chd_nodes = {n for n, _ in chd}
    interior = np.array([n for n in range(m.nodes) if n not in chd_nodes])
    assert np.max(np.abs(into[interior])) < 1e-7
    assert abs(into.sum()) < 1e-7
