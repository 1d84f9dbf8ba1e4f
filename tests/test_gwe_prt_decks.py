"""GWE6 and PRT6 model deck loading end-to-end (mfsim.nam naming GWE/PRT
models, reference SimulationCreate.f90:200-349 gwe_cr/prt_cr paths).

Oracles: steady heat conduction between two constant-temperature cells is
linear in x; Pollock tracking in uniform flow is exact.
"""

import os

import numpy as np

from modflow6_tpu.utils.mf6io import load_simulation


def write(ws, name, text):
    path = os.path.join(ws, name)
    with open(path, "w") as f:
        f.write("\n".join(line.rstrip() for line in text.splitlines())
                + "\n")
    return path


def _common(ws, models, nper=1, perlen="2000.0 20 1.2"):
    write(ws, "mfsim.nam", f"""
BEGIN OPTIONS
END OPTIONS
BEGIN TIMING
  TDIS6 sim.tdis
END TIMING
BEGIN MODELS
{models}
END MODELS
BEGIN EXCHANGES
END EXCHANGES
BEGIN SOLUTIONGROUP 1
  IMS6 sim.ims m1
END SOLUTIONGROUP
""")
    pdata = "\n".join(f"  {perlen}" for _ in range(nper))
    write(ws, "sim.tdis", f"""
BEGIN OPTIONS
END OPTIONS
BEGIN DIMENSIONS
  NPER {nper}
END DIMENSIONS
BEGIN PERIODDATA
{pdata}
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


def _gwf_files(ws, ncol=11, h_left=10.0, h_right=10.0, k=10.0):
    write(ws, "flow.nam", """
BEGIN OPTIONS
END OPTIONS
BEGIN PACKAGES
  DIS6 flow.dis dis
  IC6 flow.ic ic
  NPF6 flow.npf npf
  CHD6 flow.chd chd
END PACKAGES
""")
    write(ws, "flow.dis", f"""
BEGIN OPTIONS
END OPTIONS
BEGIN DIMENSIONS
  NLAY 1
  NROW 1
  NCOL {ncol}
END DIMENSIONS
BEGIN GRIDDATA
  DELR CONSTANT 1.0
  DELC CONSTANT 1.0
  TOP CONSTANT 1.0
  BOTM CONSTANT 0.0
END GRIDDATA
""")
    write(ws, "flow.ic", """
BEGIN GRIDDATA
  STRT CONSTANT 10.0
END GRIDDATA
""")
    write(ws, "flow.npf", f"""
BEGIN OPTIONS
END OPTIONS
BEGIN GRIDDATA
  ICELLTYPE CONSTANT 0
  K CONSTANT {k}
END GRIDDATA
""")
    write(ws, "flow.chd", f"""
BEGIN OPTIONS
END OPTIONS
BEGIN DIMENSIONS
  MAXBOUND 2
END DIMENSIONS
BEGIN PERIOD 1
  1 1 1 {h_left}
  1 1 {ncol} {h_right}
END PERIOD
""")


def test_gwe_deck_conduction_linear(tmp_path):
    """GWE6 deck: no-flow conduction between CTP cells → linear profile
    (gwe-cnd.f90 steady conduction closed form)."""
    ws = str(tmp_path)
    _common(ws, "  GWF6 flow.nam m1\n  GWE6 heat.nam e1")
    _gwf_files(ws)
    write(ws, "heat.nam", """
BEGIN OPTIONS
END OPTIONS
BEGIN PACKAGES
  DIS6 heat.dis dis
  IC6 heat.ic ic
  EST6 heat.est est
  CND6 heat.cnd cnd
  CTP6 heat.ctp ctp
  OC6 heat.oc oc
END PACKAGES
""")
    write(ws, "heat.dis", open(os.path.join(ws, "flow.dis")).read())
    write(ws, "heat.ic", """
BEGIN GRIDDATA
  STRT CONSTANT 0.0
END GRIDDATA
""")
    write(ws, "heat.est", """
BEGIN OPTIONS
  DENSITY_WATER 1.0
  HEAT_CAPACITY_WATER 1.0
END OPTIONS
BEGIN GRIDDATA
  POROSITY CONSTANT 0.3
  DENSITY_SOLID CONSTANT 1.0
  HEAT_CAPACITY_SOLID CONSTANT 1.0
END GRIDDATA
""")
    write(ws, "heat.cnd", """
BEGIN OPTIONS
END OPTIONS
BEGIN GRIDDATA
  KTW CONSTANT 1.0
  KTS CONSTANT 1.0
END GRIDDATA
""")
    write(ws, "heat.ctp", """
BEGIN OPTIONS
END OPTIONS
BEGIN DIMENSIONS
  MAXBOUND 2
END DIMENSIONS
BEGIN PERIOD 1
  1 1 1 100.0
  1 1 11 0.0
END PERIOD
""")
    write(ws, "heat.oc", """
BEGIN OPTIONS
  TEMPERATURE FILEOUT heat.tem
END OPTIONS
BEGIN PERIOD 1
  SAVE TEMPERATURE ALL
END PERIOD
""")
    sim = load_simulation(ws)
    sim.run()
    temp = np.asarray(sim.conc)
    expect = np.linspace(100.0, 0.0, 11)
    np.testing.assert_allclose(temp, expect, atol=0.05)
    assert os.path.exists(os.path.join(ws, "heat.tem"))
    # temperature file carries the TEMPERATURE text record
    from modflow6_tpu.utils.binary import read_head_file
    recs = list(read_head_file(os.path.join(ws, "heat.tem")))
    assert recs and recs[-1]["text"].strip() == "TEMPERATURE"
    np.testing.assert_allclose(recs[-1]["data"].reshape(-1), expect,
                               atol=0.05)


def test_prt_deck_uniform_flow(tmp_path):
    """PRT6 deck: uniform-flow Pollock tracking is exact; TRACKCSV rows
    appear (prt-prp.dfn track_filerecord)."""
    ws = str(tmp_path)
    _common(ws, "  GWF6 flow.nam m1\n  PRT6 part.nam p1",
            perlen="4.0 1 1.0")
    q, k, theta, ncol = 0.5, 10.0, 0.25, 20
    dh = q * (ncol - 1) / k
    _gwf_files(ws, ncol=ncol, h_left=10.0 + dh, h_right=10.0, k=k)
    write(ws, "part.nam", """
BEGIN OPTIONS
END OPTIONS
BEGIN PACKAGES
  DIS6 part.dis dis
  MIP6 part.mip mip
  PRP6 part.prp prp
END PACKAGES
""")
    write(ws, "part.dis", open(os.path.join(ws, "flow.dis")).read())
    write(ws, "part.mip", f"""
BEGIN OPTIONS
END OPTIONS
BEGIN GRIDDATA
  POROSITY CONSTANT {theta}
END GRIDDATA
""")
    write(ws, "part.prp", """
BEGIN OPTIONS
  TRACKCSV FILEOUT part.trk.csv
END OPTIONS
BEGIN DIMENSIONS
  NRELEASEPTS 1
  NRELEASETIMES 0
END DIMENSIONS
BEGIN PACKAGEDATA
  1 1 1 3 2.5 0.5 0.5
END PACKAGEDATA
BEGIN PERIOD 1
  FIRST
END PERIOD
""")
    sim = load_simulation(ws)
    sim.run()
    drv = sim.prt_drivers[0]
    v = q / theta
    np.testing.assert_allclose(np.asarray(drv.x), 2.5 + v * 4.0,
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(drv.y), 0.5, atol=1e-12)
    np.testing.assert_allclose(drv.ttrack, 4.0, rtol=1e-12)
    path = os.path.join(ws, "part.trk.csv")
    assert os.path.exists(path)
    lines = open(path).read().strip().splitlines()
    assert len(lines) >= 2       # header + at least one record
    last = lines[-1].split(",")
    np.testing.assert_allclose(float(last[12]), 2.5 + v * 4.0, rtol=1e-10)


def test_prt_deck_release_times_and_stop(tmp_path):
    """RELEASETIMES mid-step release + STOPTIME termination."""
    ws = str(tmp_path)
    _common(ws, "  GWF6 flow.nam m1\n  PRT6 part.nam p1",
            perlen="4.0 2 1.0")
    q, k, theta, ncol = 0.5, 10.0, 0.25, 40
    dh = q * (ncol - 1) / k
    _gwf_files(ws, ncol=ncol, h_left=10.0 + dh, h_right=10.0, k=k)
    write(ws, "part.nam", """
BEGIN OPTIONS
END OPTIONS
BEGIN PACKAGES
  DIS6 part.dis dis
  MIP6 part.mip mip
  PRP6 part.prp prp
END PACKAGES
""")
    write(ws, "part.dis", open(os.path.join(ws, "flow.dis")).read())
    write(ws, "part.mip", f"""
BEGIN OPTIONS
END OPTIONS
BEGIN GRIDDATA
  POROSITY CONSTANT {theta}
END GRIDDATA
""")
    # release at t=1.0 (mid-step 1), stop tracking at t=3.5
    write(ws, "part.prp", """
BEGIN OPTIONS
  STOPTIME 3.5
END OPTIONS
BEGIN DIMENSIONS
  NRELEASEPTS 1
  NRELEASETIMES 1
END DIMENSIONS
BEGIN PACKAGEDATA
  1 1 1 3 2.5 0.5 0.5
END PACKAGEDATA
BEGIN RELEASETIMES
  1.0
END RELEASETIMES
""")
    sim = load_simulation(ws)
    sim.run()
    drv = sim.prt_drivers[0]
    v = q / theta
    # released at t=1, tracking halts at STOPTIME 3.5: travel time 2.5
    np.testing.assert_allclose(drv.trelease, [1.0])
    np.testing.assert_allclose(np.asarray(drv.x), 2.5 + v * 2.5,
                               rtol=1e-7)
    from modflow6_tpu.models.prt.simulation import TERM_STOPTIME
    assert int(drv.status[0]) == TERM_STOPTIME


def test_prt_disv_deck_uniform_flow(tmp_path):
    """PRT6 deck on a DISV grid: the ternary tracker drives deck-loaded
    release points (MethodCellTernary via prt-disv.dfn)."""
    ws = str(tmp_path)
    _common(ws, "  GWF6 flow.nam m1\n  PRT6 part.nam p1",
            perlen="4.0 1 1.0")
    nrow, ncol, q, k, theta = 3, 12, 0.5, 10.0, 0.25
    dh = q * (ncol - 1) / k
    # rectangular DISV mesh deck shared by both models
    W = ncol + 1
    verts = "\n".join(
        f"  {r * W + c + 1} {c}.0 {nrow - r}.0"
        for r in range(nrow + 1) for c in range(ncol + 1))
    cells = "\n".join(
        f"  {r * ncol + c + 1} {c + 0.5} {nrow - r - 0.5} 4 "
        f"{r * W + c + 1} {r * W + c + 2} {(r + 1) * W + c + 2} "
        f"{(r + 1) * W + c + 1}"
        for r in range(nrow) for c in range(ncol))
    disv = f"""
BEGIN OPTIONS
END OPTIONS
BEGIN DIMENSIONS
  NCPL {nrow * ncol}
  NLAY 1
  NVERT {(nrow + 1) * (ncol + 1)}
END DIMENSIONS
BEGIN GRIDDATA
  TOP CONSTANT 1.0
  BOTM CONSTANT 0.0
END GRIDDATA
BEGIN VERTICES
{verts}
END VERTICES
BEGIN CELL2D
{cells}
END CELL2D
"""
    write(ws, "flow.disv", disv)
    write(ws, "part.disv", disv)
    write(ws, "flow.nam", """
BEGIN OPTIONS
END OPTIONS
BEGIN PACKAGES
  DISV6 flow.disv dis
  IC6 flow.ic ic
  NPF6 flow.npf npf
  CHD6 flow.chd chd
END PACKAGES
""")
    write(ws, "flow.ic", "BEGIN GRIDDATA\n  STRT CONSTANT 10.0\n"
          "END GRIDDATA\n")
    write(ws, "flow.npf", f"""
BEGIN OPTIONS
END OPTIONS
BEGIN GRIDDATA
  ICELLTYPE CONSTANT 0
  K CONSTANT {k}
END GRIDDATA
""")
    chd_rows = "\n".join(
        [f"  1 {r * ncol + 1} {10.0 + dh}" for r in range(nrow)]
        + [f"  1 {r * ncol + ncol} 10.0" for r in range(nrow)])
    write(ws, "flow.chd", f"""
BEGIN DIMENSIONS
  MAXBOUND {2 * nrow}
END DIMENSIONS
BEGIN PERIOD 1
{chd_rows}
END PERIOD
""")
    write(ws, "part.nam", """
BEGIN OPTIONS
END OPTIONS
BEGIN PACKAGES
  DISV6 part.disv dis
  MIP6 part.mip mip
  PRP6 part.prp prp
END PACKAGES
""")
    write(ws, "part.mip", f"""
BEGIN OPTIONS
END OPTIONS
BEGIN GRIDDATA
  POROSITY CONSTANT {theta}
END GRIDDATA
""")
    write(ws, "part.prp", """
BEGIN OPTIONS
END OPTIONS
BEGIN DIMENSIONS
  NRELEASEPTS 1
  NRELEASETIMES 0
END DIMENSIONS
BEGIN PACKAGEDATA
  1 1 3 2.5 1.5 0.5
END PACKAGEDATA
BEGIN PERIOD 1
  FIRST
END PERIOD
""")
    sim = load_simulation(ws)
    sim.run()
    drv = sim.prt_drivers[0]
    assert drv.is_disv
    v = q / theta
    np.testing.assert_allclose(np.asarray(drv.x), 2.5 + v * 4.0,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(drv.y), 1.5, atol=1e-9)
