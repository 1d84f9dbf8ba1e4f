"""DISV ternary tracking tests (MethodCellTernary/TernarySolveTrack.f90
role): RT0 triangle-fan fields with closed-form exponential exits.

Oracles: uniform flow (straight-line trajectories, exact travel times)
and cross-validation against the DIS Pollock tracker on an identical
rectangular geometry with a pumping well.
"""

import numpy as np
import jax.numpy as jnp

from modflow6_tpu.models.discretization import DisGrid
from modflow6_tpu.models.discretization.disv import DisvGrid
from modflow6_tpu.models.gwf.builder import build_gwf
from modflow6_tpu.models.gwf import npf as npf_mod
from modflow6_tpu.models.prt import tracking, tracking_disv
from modflow6_tpu.models.prt.model import PrtModel, ReleasePoints
from modflow6_tpu.solution import ImsSettings, NumericalSolution


def rect_disv(nrow, ncol, d=1.0):
    """ncpl = nrow*ncol unit squares as a DISV mesh (row-major)."""
    verts = [(c * d, (nrow - r) * d) for r in range(nrow + 1)
             for c in range(ncol + 1)]
    cell2d = []
    W = ncol + 1
    for r in range(nrow):
        for c in range(ncol):
            vul = r * W + c
            cell2d.append(((c + 0.5) * d, (nrow - r - 0.5) * d,
                           [vul, vul + 1, vul + 1 + W, vul + W]))
    return DisvGrid.create(1, nrow * ncol, np.asarray(verts, float),
                           cell2d, 1.0, np.zeros((1, nrow * ncol)))


def solve_flow(gwf):
    sol = NumericalSolution(gwf, ImsSettings(
        outer_dvclose=1e-10, outer_maximum=50, inner_dvclose=1e-12,
        inner_rclose=1e-10, inner_maximum=2000))
    head, info, aux = sol.solve_timestep(gwf.strt, 1.0, iss=True)
    assert info.converged
    return head, aux


def _run(gwf, g, theta, pts, tmax):
    head, aux = solve_flow(gwf)
    ib = aux["ibound"]
    q_edge = gwf.edge_flows(head, ib, aux["cond"])
    sat = npf_mod.compute_saturation(gwf.npf_opts, gwf.npf_arrays, head,
                                     ib).reshape(g.nlay, g.ncpl)
    fan = tracking_disv.build_fan(g, gwf.topo, np.full(g.nodes, theta))
    Qout, u, qzt, qzb = tracking_disv.fan_fluxes(fan, q_edge)
    lay, cell, tri = tracking_disv.locate(fan, *pts)
    track = tracking_disv.make_tracker_disv(fan)
    return track(jnp.asarray(pts[0], float), jnp.asarray(pts[1], float),
                 jnp.asarray(pts[2], float), jnp.asarray(lay),
                 jnp.asarray(cell), jnp.asarray(tri), Qout, u, qzt, qzb,
                 sat, tmax)


def test_disv_uniform_flow_straight_line():
    """Uniform x-flow on a DISV strip: exact straight-line advection."""
    nrow, ncol, theta, q, k = 3, 20, 0.25, 0.5, 10.0
    g = rect_disv(nrow, ncol)
    dh = q * (ncol - 1) / k
    chd = [(r * ncol, 10.0 + dh) for r in range(nrow)] \
        + [(r * ncol + ncol - 1, 10.0) for r in range(nrow)]
    gwf = build_gwf("f", g, k=k, strt=10.0, chd=chd)
    v = q / theta
    t = 4.0
    out = _run(gwf, g, theta,
               (np.array([2.5, 3.3]), np.array([1.5, 0.7]),
                np.array([0.5, 0.5])), t)
    np.testing.assert_allclose(np.asarray(out["x"]),
                               [2.5 + v * t, 3.3 + v * t], rtol=1e-9)
    np.testing.assert_allclose(np.asarray(out["y"]), [1.5, 0.7],
                               atol=1e-9)
    assert all(int(s) == tracking_disv.TERM_TIMEOUT
               for s in np.asarray(out["status"]))
    np.testing.assert_allclose(np.asarray(out["time"]), t, rtol=1e-12)


def test_disv_travel_time_matches_dis_pollock():
    """A pumping well in the center of a square: travel time from a
    release point to the sink agrees between the DISV ternary tracker
    and the DIS Pollock tracker on the identical geometry."""
    n, theta = 11, 0.3
    # DIS version
    gd = DisGrid.create(1, n, n, 1.0, 1.0, 1.0, np.zeros((1, n, n)))
    chd = ([(i, 10.0) for i in range(n)]
           + [((n - 1) * n + i, 10.0) for i in range(n)]
           + [(r * n, 10.0) for r in range(1, n - 1)]
           + [(r * n + n - 1, 10.0) for r in range(1, n - 1)])
    well = (n // 2) * n + n // 2
    gwf_d = build_gwf("d", gd, k=10.0, strt=10.0, chd=chd,
                      wel=[(well, -3.0)])
    head, aux = solve_flow(gwf_d)
    prt = PrtModel("p", gd, np.full(gd.nodes, theta),
                   ReleasePoints(x=np.array([2.3]), y=np.array([5.5]),
                                 z=np.array([0.5])))
    step = prt.make_step(gwf_d)
    st = prt.initial_state()
    out_d = step(head, aux["ibound"], aux["cond"], *st, 1e9)
    assert int(out_d["status"][0]) == tracking.TERM_WEAK
    t_dis = float(out_d["time"][0])

    # DISV version of the same problem
    gv = rect_disv(n, n)
    gwf_v = build_gwf("v", gv, k=10.0, strt=10.0, chd=chd,
                      wel=[(well, -3.0)])
    out_v = _run(gwf_v, gv, theta,
                 (np.array([2.3]), np.array([5.5]), np.array([0.5])), 1e9)
    assert int(out_v["status"][0]) == tracking_disv.TERM_WEAK
    t_disv = float(out_v["time"][0])
    # the two interpolations differ inside cells (bilinear Pollock vs
    # triangle-fan RT0 — both exact only for cellwise-linear fields), so
    # the travel times agree to interpolation error, not exactly
    np.testing.assert_allclose(t_disv, t_dis, rtol=0.08)
    # and the particle dies in the well cell
    assert int(out_v["cell"][0]) == well


def test_disv_internal_fan_chain_mass_balance():
    """fan_fluxes: every subtriangle of every cell is in exact mass
    balance (TernarySolveTrack subcell setup invariant)."""
    nrow, ncol = 3, 4
    g = rect_disv(nrow, ncol)
    chd = [(r * ncol, 11.0) for r in range(nrow)] \
        + [(r * ncol + ncol - 1, 10.0) for r in range(nrow)]
    gwf = build_gwf("f", g, k=3.0, strt=10.0, chd=chd,
                    wel=[(5, -0.7)])
    head, aux = solve_flow(gwf)
    q_edge = gwf.edge_flows(head, aux["ibound"], aux["cond"])
    fan = tracking_disv.build_fan(g, gwf.topo, np.full(g.nodes, 0.3))
    Qout, u, qzt, qzb = tracking_disv.fan_fluxes(fan, q_edge)
    # balance includes the distributed residual (boundary sink) share
    share = fan.tri_area / fan.cell_area[:, None]
    resid = jnp.sum(Qout, axis=2)   # nlay=1, no vertical faces here
    u_prev = jnp.roll(u, 1, axis=2)   # u_{i-1} with wraparound (maxv=nact)
    bal = Qout + qzt + qzb - resid[:, :, None] * share[None] + u - u_prev
    bal = np.asarray(jnp.where(fan.valid[None], bal, 0.0))
    np.testing.assert_allclose(bal, 0.0, atol=1e-12)
