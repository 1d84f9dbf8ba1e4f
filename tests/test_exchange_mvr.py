"""Exchange mover (GwfExchangeMover.f90 role): MVR water crossing a
GWF6-GWF6 exchange between two models' SFR networks, via the merged
composite's combined feature numbering."""

import os

import numpy as np

from modflow6_tpu.utils.mf6io import load_simulation

from test_advanced_decks import write


def _model_files(ws, tag, h):
    write(ws, f"{tag}.nam", f"""
BEGIN OPTIONS
END OPTIONS
BEGIN PACKAGES
  DIS6 {tag}.dis dis
  IC6 {tag}.ic ic
  NPF6 {tag}.npf npf
  CHD6 {tag}.chd chd
  SFR6 {tag}.sfr sfr-1
END PACKAGES
""")
    write(ws, f"{tag}.dis", """
BEGIN OPTIONS
END OPTIONS
BEGIN DIMENSIONS
  NLAY 1
  NROW 1
  NCOL 4
END DIMENSIONS
BEGIN GRIDDATA
  DELR CONSTANT 100.0
  DELC CONSTANT 100.0
  TOP CONSTANT 50.0
  BOTM CONSTANT 0.0
END GRIDDATA
""")
    write(ws, f"{tag}.ic", f"""
BEGIN GRIDDATA
  STRT CONSTANT {h}
END GRIDDATA
""")
    write(ws, f"{tag}.npf", """
BEGIN OPTIONS
END OPTIONS
BEGIN GRIDDATA
  ICELLTYPE CONSTANT 0
  K CONSTANT 1.0e-8
END GRIDDATA
""")
    write(ws, f"{tag}.chd", f"""
BEGIN DIMENSIONS
  MAXBOUND 1
END DIMENSIONS
BEGIN PERIOD 1
  1 1 1 {h}
END PERIOD
""")


def test_exchange_mover_sfr_to_sfr(tmp_path):
    ws = str(tmp_path)
    write(ws, "mfsim.nam", """
BEGIN OPTIONS
END OPTIONS
BEGIN TIMING
  TDIS6 sim.tdis
END TIMING
BEGIN MODELS
  GWF6 a.nam M1
  GWF6 b.nam M2
END MODELS
BEGIN EXCHANGES
  GWF6-GWF6 ab.exg M1 M2
END EXCHANGES
BEGIN SOLUTIONGROUP 1
  IMS6 sim.ims M1 M2
END SOLUTIONGROUP
""")
    write(ws, "sim.tdis", """
BEGIN OPTIONS
END OPTIONS
BEGIN DIMENSIONS
  NPER 1
END DIMENSIONS
BEGIN PERIODDATA
  20000.0 20 1.0
END PERIODDATA
""")
    write(ws, "sim.ims", """
BEGIN OPTIONS
END OPTIONS
BEGIN NONLINEAR
  OUTER_DVCLOSE 1.0e-8
  OUTER_MAXIMUM 200
END NONLINEAR
BEGIN LINEAR
  INNER_MAXIMUM 500
  INNER_DVCLOSE 1.0e-10
  INNER_RCLOSE 1.0e-9
  LINEAR_ACCELERATION BICGSTAB
END LINEAR
""")
    _model_files(ws, "a", 30.0)
    _model_files(ws, "b", 30.0)
    write(ws, "ab.exg", """
BEGIN OPTIONS
  MVR6 FILEIN ab.mvr
END OPTIONS
BEGIN DIMENSIONS
  NEXG 1
END DIMENSIONS
BEGIN EXCHANGEDATA
  1 1 4 1 1 1 1 50.0 50.0 100.0
END EXCHANGEDATA
""")
    # reaches: model A gets inflow 2.0 on reach 1; the exchange mover
    # sends A's terminal-reach outflow into B's first reach
    for tag, inflow in (("a", "  1 INFLOW 2.0\n"), ("b", "")):
        write(ws, f"{tag}.sfr", f"""
BEGIN OPTIONS
END OPTIONS
BEGIN DIMENSIONS
  NREACHES 2
END DIMENSIONS
BEGIN PACKAGEDATA
  1 1 1 2 100.0 3.0 1.0e-3 40.0 1.0 0.0 0.03 1 1.0 0
  2 1 1 3 100.0 3.0 1.0e-3 39.9 1.0 0.0 0.03 1 1.0 0
END PACKAGEDATA
BEGIN CONNECTIONDATA
  1 -2
  2 1
END CONNECTIONDATA
BEGIN PERIOD 1
{inflow}END PERIOD
""")
    write(ws, "ab.mvr", """
BEGIN OPTIONS
  MODELNAMES
END OPTIONS
BEGIN DIMENSIONS
  MAXMVR 1
  MAXPACKAGES 2
END DIMENSIONS
BEGIN PACKAGES
  M1 SFR-1
  M2 SFR-1
END PACKAGES
BEGIN PERIOD 1
  M1 SFR-1 2 M2 SFR-1 1 FACTOR 1.0
END PERIOD
""")
    sim = load_simulation(ws)
    from modflow6_tpu.models.gwf.advanced import AugmentedGwfModel
    assert isinstance(sim.model, AugmentedGwfModel)
    assert sim.model.sfr.nreaches == 4
    assert sim.model.mvr is not None
    recs = sim.run()
    assert all(r.converged for r in recs)
    import jax.numpy as jnp
    x = jnp.asarray(
        np.concatenate([recs[-1].head,
                        np.zeros(sim.model.nodes - recs[-1].head.size)]))
    x, info, _ = sim.solution.solve_timestep(jnp.asarray(sim.model.strt),
                                             2e4, iss=False)
    assert info.converged
    # B's terminal reach (combined index 3) carries ~the moved 2.0
    q_man, _ = sim.model.sfr._manning(jnp.asarray(x)[8:])
    np.testing.assert_allclose(float(np.asarray(q_man)[3]), 2.0,
                               rtol=1e-3)
    # A's terminal reach flow was fully consumed by the mover
    ib, _ = sim.model.boundary_state(x)
    qp, _, _ = sim.model.eval_movers(x, ib)
    np.testing.assert_allclose(float(np.asarray(qp)[0]),
                               float(np.asarray(q_man)[1]), rtol=1e-9)
