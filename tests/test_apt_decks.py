"""APT deck files (SFT6/LKT6/... in a GWT model nam, gwt-sft.dfn etc.):
augmented transport built from deck input runs through the Simulation
driver (reference tsp-apt.f90 + SimulationCreate wiring)."""

import numpy as np

from modflow6_tpu.utils.mf6io import load_simulation

from test_advanced_decks import write


def test_sft_deck_stream_flushes_to_inflow_conc(tmp_path):
    """SFT deck: stream chain fed at concentration 1 flushes to 1
    (same oracle as the programmatic test_apt sft test)."""
    ws = str(tmp_path)
    write(ws, "mfsim.nam", """
BEGIN OPTIONS
END OPTIONS
BEGIN TIMING
  TDIS6 sim.tdis
END TIMING
BEGIN MODELS
  GWF6 flow.nam m1
  GWT6 trans.nam t1
END MODELS
BEGIN EXCHANGES
  GWF6-GWT6 sim.exg m1 t1
END EXCHANGES
BEGIN SOLUTIONGROUP 1
  IMS6 sim.ims m1
  IMS6 sim.ims t1
END SOLUTIONGROUP
""")
    write(ws, "sim.exg", """
BEGIN OPTIONS
END OPTIONS
""")
    write(ws, "sim.tdis", """
BEGIN OPTIONS
END OPTIONS
BEGIN DIMENSIONS
  NPER 1
END DIMENSIONS
BEGIN PERIODDATA
  30000.0 60 1.0
END PERIODDATA
""")
    write(ws, "sim.ims", """
BEGIN OPTIONS
END OPTIONS
BEGIN NONLINEAR
  OUTER_DVCLOSE 1.0e-8
  OUTER_MAXIMUM 100
END NONLINEAR
BEGIN LINEAR
  INNER_MAXIMUM 500
  INNER_DVCLOSE 1.0e-10
  INNER_RCLOSE 1.0e-9
  LINEAR_ACCELERATION BICGSTAB
END LINEAR
""")
    write(ws, "flow.nam", """
BEGIN OPTIONS
END OPTIONS
BEGIN PACKAGES
  DIS6 flow.dis dis
  IC6 flow.ic ic
  NPF6 flow.npf npf
  CHD6 flow.chd chd
  SFR6 flow.sfr sfr-1
END PACKAGES
""")
    write(ws, "flow.dis", """
BEGIN OPTIONS
END OPTIONS
BEGIN DIMENSIONS
  NLAY 1
  NROW 1
  NCOL 6
END DIMENSIONS
BEGIN GRIDDATA
  DELR CONSTANT 100.0
  DELC CONSTANT 100.0
  TOP CONSTANT 50.0
  BOTM CONSTANT 0.0
END GRIDDATA
""")
    write(ws, "flow.ic", """
BEGIN GRIDDATA
  STRT CONSTANT 30.0
END GRIDDATA
""")
    write(ws, "flow.npf", """
BEGIN OPTIONS
END OPTIONS
BEGIN GRIDDATA
  ICELLTYPE CONSTANT 0
  K CONSTANT 1.0e-8
END GRIDDATA
""")
    write(ws, "flow.chd", """
BEGIN DIMENSIONS
  MAXBOUND 2
END DIMENSIONS
BEGIN PERIOD 1
  1 1 1 30.0
  1 1 6 30.0
END PERIOD
""")
    write(ws, "flow.sfr", """
BEGIN OPTIONS
END OPTIONS
BEGIN DIMENSIONS
  NREACHES 3
END DIMENSIONS
BEGIN PACKAGEDATA
  1 1 1 2 100.0 3.0 1.0e-3 40.0 1.0 0.0 0.03 1 1.0 0
  2 1 1 3 100.0 3.0 1.0e-3 39.9 1.0 0.0 0.03 2 1.0 0
  3 1 1 4 100.0 3.0 1.0e-3 39.8 1.0 0.0 0.03 1 1.0 0
END PACKAGEDATA
BEGIN CONNECTIONDATA
  1 -2
  2 1 -3
  3 2
END CONNECTIONDATA
BEGIN PERIOD 1
  1 INFLOW 2.0
END PERIOD
""")
    write(ws, "trans.nam", """
BEGIN OPTIONS
END OPTIONS
BEGIN PACKAGES
  DIS6 trans.dis dis
  IC6 trans.ic ic
  ADV6 trans.adv adv
  MST6 trans.mst mst
  SFT6 trans.sft sft-1
END PACKAGES
""")
    write(ws, "trans.dis", open(f"{ws}/flow.dis").read())
    write(ws, "trans.ic", """
BEGIN GRIDDATA
  STRT CONSTANT 0.0
END GRIDDATA
""")
    write(ws, "trans.adv", """
BEGIN OPTIONS
  SCHEME UPSTREAM
END OPTIONS
""")
    write(ws, "trans.mst", """
BEGIN OPTIONS
END OPTIONS
BEGIN GRIDDATA
  POROSITY CONSTANT 0.3
END GRIDDATA
""")
    write(ws, "trans.sft", """
BEGIN OPTIONS
  FLOW_PACKAGE_NAME sfr-1
END OPTIONS
BEGIN PACKAGEDATA
  1 0.0
  2 0.0
  3 0.0
END PACKAGEDATA
BEGIN PERIOD 1
  1 INFLOW 1.0
END PERIOD
""")
    sim = load_simulation(ws)
    from modflow6_tpu.models.gwt.apt import AugmentedGwtModel
    assert isinstance(sim.gwt, AugmentedGwtModel)
    recs = sim.run()
    assert all(r.converged for r in recs)
    cf = np.asarray(sim.conc)[6:]
    np.testing.assert_allclose(cf, 1.0, rtol=1e-4)
