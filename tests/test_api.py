"""BMI/XMI API-layer tests (role of reference test_libmf6_* / xmipy-driven
autotests) + observability (profiler sections, convergence CSV) + HFB.
"""

import os

import numpy as np

import jax.numpy as jnp

from modflow6_tpu.api import Mf6Api
from modflow6_tpu.models.discretization import DisGrid
from modflow6_tpu.models.gwf.builder import build_gwf
from modflow6_tpu.models.simulation import Simulation
from modflow6_tpu.solution import ImsSettings
from modflow6_tpu.timing.tdis import StressPeriod, Tdis


def make_sim(tmp_path=None, **sim_kw):
    n = 12
    g = DisGrid.create(1, 1, n, 10.0, 10.0, 10.0, np.zeros((1, 1, n)))
    gwf = build_gwf("model", g, k=5.0, strt=6.0,
                    storage={"ss": 1e-4, "iconvert": 0},
                    chd=[(0, 8.0), (n - 1, 5.0)])
    tdis = Tdis([StressPeriod(perlen=40.0, nstp=4, tsmult=1.0)])
    settings = ImsSettings(outer_dvclose=1e-8, inner_dvclose=1e-10,
                           inner_rclose=1e-9, inner_maximum=500)
    return Simulation(tdis, gwf, settings, **sim_kw), gwf


def test_bmi_update_matches_run():
    sim1, _ = make_sim()
    recs = sim1.run()
    final_direct = recs[-1].head

    sim2, _ = make_sim()
    api = Mf6Api().initialize(sim2)
    nsteps = 0
    while api.update():
        nsteps += 1
    api.finalize()
    assert nsteps == 4
    np.testing.assert_allclose(api.get_value("MODEL/X"), final_direct,
                               rtol=1e-12)
    assert api.get_current_time() == api.get_end_time() == 40.0


def test_bmi_var_access():
    sim, gwf = make_sim()
    api = Mf6Api().initialize(sim)
    addr = api.get_var_address("K11", "model", "NPF")
    assert addr == "MODEL/NPF/K11"
    np.testing.assert_allclose(api.get_value(addr), 5.0)
    # live update: double K and confirm faster equilibration is reflected
    api.set_value(addr, jnp.full(gwf.nodes, 10.0))
    np.testing.assert_allclose(api.get_value(addr), 10.0)
    # package access
    np.testing.assert_allclose(api.get_value("MODEL/CHD/HEAD"), [8.0, 5.0])
    assert api.get_grid_size() == 12
    assert api.get_grid_shape() == (1, 1, 12)


def test_xmi_fine_grained_loop():
    sim1, _ = make_sim()
    final_direct = sim1.run()[-1].head

    sim2, _ = make_sim()
    api = Mf6Api().initialize(sim2)
    while api.prepare_time_step():
        api.prepare_solve()
        ok = api.solve()
        assert ok
        api.finalize_solve()
    api.finalize()
    np.testing.assert_allclose(api.get_value("MODEL/X"), final_direct,
                               rtol=1e-12)


def test_update_until():
    sim, _ = make_sim()
    api = Mf6Api().initialize(sim)
    api.update_until(20.0)
    assert api.get_current_time() == 20.0
    api.update_until(1e9)
    assert api.get_current_time() == 40.0


def test_outer_csv_and_profiler(tmp_path):
    csv_path = tmp_path / "outer.csv"
    sim, _ = make_sim(outer_csv_path=str(csv_path),
                      lst_path=str(tmp_path / "sim.lst"), profile="summary")
    sim.run()
    lines = csv_path.read_text().strip().splitlines()
    assert lines[0].startswith("total_inner_iterations,totim")
    assert len(lines) > 4          # ≥1 outer row per step
    lst = (tmp_path / "sim.lst").read_text()
    assert "Profiler timings" in lst and "solve" in lst


def test_hfb_blocks_flow():
    """A near-impermeable barrier mid-column: heads split into two plateaus
    (reference autotest test_gwf_hfb semantics)."""
    n = 10
    g = DisGrid.create(1, 1, n, 10.0, 10.0, 10.0, np.zeros((1, 1, n)))
    settings = ImsSettings(outer_dvclose=1e-10, inner_dvclose=1e-12,
                           inner_rclose=1e-11, inner_maximum=500)
    from modflow6_tpu.solution import NumericalSolution
    gwf_open = build_gwf("m", g, k=5.0, strt=6.0, chd=[(0, 8.0), (n - 1, 5.0)])
    head_open, info, _ = NumericalSolution(gwf_open, settings).solve_timestep(
        gwf_open.strt, 1.0, iss=True)
    assert info.converged

    gwf_hfb = build_gwf("m", g, k=5.0, strt=6.0, chd=[(0, 8.0), (n - 1, 5.0)],
                        hfb=[(4, 5, 1e-8)])
    head_hfb, info, _ = NumericalSolution(gwf_hfb, settings).solve_timestep(
        gwf_hfb.strt, 1.0, iss=True)
    assert info.converged
    ho = np.asarray(head_open)
    hb = np.asarray(head_hfb)
    # open column: smooth gradient; barrier: almost all drop across the wall
    assert ho[4] - ho[5] < 0.5
    assert hb[4] - hb[5] > 2.5
    np.testing.assert_allclose(hb[:5], 8.0, atol=0.01)   # upstream plateau
    np.testing.assert_allclose(hb[5:], 5.0, atol=0.01)   # downstream plateau


def test_hfb_multiplier_semantics():
    """hydchr < 0 is a direct conductance multiplier (gwf-hfb.f90:326)."""
    n = 6
    g = DisGrid.create(1, 1, n, 10.0, 10.0, 10.0, np.zeros((1, 1, n)))
    gwf = build_gwf("m", g, k=5.0, strt=6.0, hfb=[(2, 3, -0.5)])
    gwf2 = build_gwf("m", g, k=5.0, strt=6.0)
    cs = np.asarray(gwf.npf_arrays.condsat)
    cs2 = np.asarray(gwf2.npf_arrays.condsat)
    e = [i for i, (a, b) in enumerate(zip(gwf.topo.edge_n, gwf.topo.edge_m))
         if (a, b) == (2, 3)][0]
    np.testing.assert_allclose(cs[e], 0.5 * cs2[e], rtol=1e-12)
    others = np.ones(len(cs), bool)
    others[e] = False
    np.testing.assert_allclose(cs[others], cs2[others], rtol=1e-12)


def test_get_var_names_registry():
    """The BMI exposes the memory registry: every addressable variable
    enumerates with shape/dtype, and listed addresses resolve."""
    sim, _ = make_sim()
    bmi = Mf6Api().initialize(sim)
    names = bmi.get_var_names()
    addrs = [a for a, _, _ in names]
    assert any(a.endswith("/X") for a in addrs)
    assert any("/NPF/K11" in a for a in addrs)
    # every enumerated package/grid address must resolve through get_value
    for a, shape, _ in names:
        if a.endswith("/IBOUND"):
            continue
        v = bmi.get_value(a)
        assert tuple(np.shape(v)) == shape
