"""Zone-budget tests (zbud6 companion-tool role)."""

import numpy as np

import jax.numpy as jnp

from modflow6_tpu.models.discretization import DisGrid
from modflow6_tpu.models.gwf import npf as npf_mod
from modflow6_tpu.models.gwf.builder import build_gwf
from modflow6_tpu.solution import ImsSettings, NumericalSolution
from modflow6_tpu.utils.zonebudget import ZoneBudget


def test_interzone_flow_uniform_column():
    """Uniform flow through a column split into two zones: the inter-zone
    flow equals the column throughflow, and each zone's budget closes."""
    n, q = 12, 0.5
    g = DisGrid.create(1, 1, n, 1.0, 1.0, 1.0, np.zeros((1, 1, n)))
    k = 10.0
    dh = q * (n - 1) / k
    gwf = build_gwf("m", g, k=k, strt=10.0,
                    chd=[(0, 10.0 + dh), (n - 1, 10.0)])
    sol = NumericalSolution(gwf, ImsSettings(
        outer_dvclose=1e-10, inner_dvclose=1e-12, inner_rclose=1e-11,
        inner_maximum=500))
    head, info, aux = sol.solve_timestep(gwf.strt, 1.0, iss=True)
    assert info.converged
    q_edge = npf_mod.flowja(gwf.dtopo, aux["cond"], head)

    zones = np.where(np.arange(n) < n // 2, 1, 2)
    zb = ZoneBudget(gwf.topo, zones)
    F = zb.interzone(q_edge)
    # flow moves left→right: zone 1 → zone 2 at rate q
    np.testing.assert_allclose(F[1, 2], q, rtol=1e-9)
    np.testing.assert_allclose(F[2, 1], 0.0, atol=1e-12)

    # boundary flows: CHD influx in zone 1, outflux in zone 2
    flows = gwf.boundary_budget(head, aux["ibound"])
    into = np.zeros(n)
    en, em = np.asarray(gwf.topo.edge_n), np.asarray(gwf.topo.edge_m)
    np.add.at(into, en, np.asarray(q_edge))
    np.add.at(into, em, -np.asarray(q_edge))
    chd_nodes = np.asarray(gwf.chd.node)
    pkg = {"CHD": (chd_nodes, -into[chd_nodes])}
    totals = zb.package_totals(pkg)
    zin, zout = totals["CHD"]
    np.testing.assert_allclose(zin[1], q, rtol=1e-9)
    np.testing.assert_allclose(zout[2], q, rtol=1e-9)

    table = zb.table(q_edge, pkg)
    assert "ZONE 1" in table and "PERCENT DISCREPANCY" in table
    # discrepancies ≈ 0 for both zones
    for line in table.splitlines():
        if "PERCENT DISCREPANCY" in line:
            assert abs(float(line.split()[-1])) < 1e-6


def test_zone_zero_excluded():
    n = 6
    g = DisGrid.create(1, 1, n, 1.0, 1.0, 1.0, np.zeros((1, 1, n)))
    gwf = build_gwf("m", g, k=1.0, strt=1.0)
    zones = np.array([0, 0, 1, 1, 2, 2])
    zb = ZoneBudget(gwf.topo, zones)
    F = zb.interzone(jnp.ones(gwf.topo.nedges))
    assert F.shape == (3, 3)
    # flows touching zone 0 appear only in rows/cols 0 (ignored by table)
    assert "ZONE 1" in zb.table(jnp.ones(gwf.topo.nedges))
