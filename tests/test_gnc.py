"""GNC ghost-node correction (src/Exchange/GhostNode.f90).

LGR-style validation: a coarse column (2×2 cells) abuts a 1×1 fine grid.
The plain two-point flux across the refinement interface is inexact for
fields with a gradient component along the interface; the ghost-node
correction interpolates the driving head to the fine cell's offset and
makes the interface flux exact for linear fields — so with GNC the
composite grid reproduces an exact linear solution to solver tolerance,
while without it the interface error is orders of magnitude larger.
"""

import numpy as np
import jax.numpy as jnp

from modflow6_tpu.models.discretization.disu import DisuGrid
from modflow6_tpu.models.gwf.builder import build_gwf
from modflow6_tpu.models.gwf.gnc import build_gnc
from modflow6_tpu.solution import ImsSettings, NumericalSolution


def _lgr_grid():
    """3 coarse 2×2 cells (west) + 6×3 fine 1×1 cells (east), 1 layer."""
    centers = []
    # coarse ids 0..2: centers (1, 2i+1), area 4
    for i in range(3):
        centers.append((1.0, 2.0 * i + 1.0, 4.0))
    # fine ids 3..20: row r (y = r+0.5), col c (x = 2.5 + c)
    for r in range(6):
        for c in range(3):
            centers.append((2.5 + c, r + 0.5, 1.0))

    def fid(r, c):
        return 3 + r * 3 + c

    edges = []   # (n, m, ihc, cl1, cl2, hwva)
    for i in range(2):
        edges.append((i, i + 1, 1, 1.0, 1.0, 2.0))        # coarse-coarse
    for r in range(6):
        for c in range(3):
            if c + 1 < 3:
                edges.append((fid(r, c), fid(r, c + 1), 1, 0.5, 0.5, 1.0))
            if r + 1 < 6:
                edges.append((fid(r, c), fid(r + 1, c), 1, 0.5, 0.5, 1.0))
    iface = []
    for i in range(3):
        for dr in (0, 1):
            f = fid(2 * i + dr, 0)
            edges.append((i, f, 1, 1.0, 0.5, 1.0))
            iface.append((i, f, dr))

    N = len(centers)
    adj = [[] for _ in range(N)]
    for e, (n, m, ihc, c1, c2, hw) in enumerate(edges):
        adj[n].append((m, ihc, c1, hw))
        adj[m].append((n, ihc, c2, hw))
    iac, ja, ihc_l, cl12, hwva = [], [], [], [], []
    for n in range(N):
        iac.append(1 + len(adj[n]))
        ja.append(n)
        ihc_l.append(0)
        cl12.append(0.0)
        hwva.append(0.0)
        for m, ih, cl, hw in adj[n]:
            ja.append(m)
            ihc_l.append(ih)
            cl12.append(cl)
            hwva.append(hw)
    grid = DisuGrid.create(np.ones(N), np.zeros(N),
                           np.asarray([c[2] for c in centers]),
                           iac, ja, ihc_l, cl12, hwva)
    return grid, centers, iface


def _solve(gnc_entries):
    grid, centers, iface = _lgr_grid()
    hfield = np.asarray([x + 0.5 * y for x, y, _ in centers])
    # free cells: the fine cells nearest the interface (the coarse column
    # edge cells must stay CHD — their west face is a domain boundary, so
    # the linear field needs prescribed heads there); everything else is
    # CHD at the exact linear field
    free = {3 + 2 * 3 + 0, 3 + 3 * 3 + 0, 3 + 2 * 3 + 1, 3 + 3 * 3 + 1}
    chd = [(n, float(hfield[n])) for n in range(grid.nodes) if n not in free]
    model = build_gwf("lgr", grid, k=1.0, strt=float(hfield.mean()),
                      chd=chd)
    if gnc_entries:
        model.gnc = build_gnc(model.topo, gnc_entries)
    s = ImsSettings(outer_dvclose=1e-10, outer_maximum=100,
                    inner_dvclose=1e-12, inner_rclose=1e-11,
                    inner_maximum=500, linear_acceleration="bicgstab")
    h, info, _ = NumericalSolution(model, s).solve_timestep(
        model.strt, 1.0, iss=True)
    assert info.converged
    err = np.abs(np.asarray(h) - hfield)
    return max(err[n] for n in free)


def test_gnc_lgr_matches_linear_field():
    grid, centers, iface = _lgr_grid()
    # ghost node at the fine cell's y: interpolate toward the coarse
    # neighbor above/below with α = (0.5 offset)/(2.0 spacing) = 0.25
    entries = []
    for i, f, dr in iface:
        j = i - 1 if dr == 0 else i + 1
        contribs = [(j, 0.25)] if 0 <= j < 3 else []
        entries.append((i, f, contribs or [(i, 0.0)]))
    err_gnc = _solve(entries)
    err_plain = _solve(None)
    assert err_plain > 1e-3, f"interface error unexpectedly small: {err_plain}"
    assert err_gnc < 5e-9, f"GNC should reproduce the linear field: {err_gnc}"
    assert err_gnc < err_plain / 1e4
