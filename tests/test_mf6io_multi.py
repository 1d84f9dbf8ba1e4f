"""Deck-loader breadth: multi-model GWF exchanges, GWF+GWT coupling,
DISV grids, and OC PERIOD selection — all end-to-end from mfsim.nam
(reference SimulationCreate.f90:200-729 instantiates arbitrary model
mixes; VERDICT r2 item 4)."""

import os

import numpy as np

from modflow6_tpu.utils.mf6io import load_simulation
from modflow6_tpu.utils.binary import read_head_file


def write(ws, name, text):
    path = os.path.join(ws, name)
    with open(path, "w") as f:
        f.write("\n".join(line.rstrip() for line in text.splitlines()) + "\n")
    return path


IMS = """
BEGIN OPTIONS
END OPTIONS
BEGIN NONLINEAR
  OUTER_DVCLOSE 1.0e-8
  OUTER_MAXIMUM 100
END NONLINEAR
BEGIN LINEAR
  INNER_MAXIMUM 500
  INNER_DVCLOSE 1.0e-10
  INNER_RCLOSE 1.0e-8
  LINEAR_ACCELERATION CG
END LINEAR
"""

TDIS1 = """
BEGIN DIMENSIONS
  NPER 1
END DIMENSIONS
BEGIN PERIODDATA
  1.0 1 1.0
END PERIODDATA
"""


def _dis(nrow, ncol, delr=100.0):
    return f"""
BEGIN DIMENSIONS
  NLAY 1
  NROW {nrow}
  NCOL {ncol}
END DIMENSIONS
BEGIN GRIDDATA
  DELR
    CONSTANT {delr}
  DELC
    CONSTANT {delr}
  TOP
    CONSTANT 0.0
  BOTM
    CONSTANT -100.0
END GRIDDATA
"""


def _gwf_nam(prefix, extra=""):
    return f"""
BEGIN OPTIONS
END OPTIONS
BEGIN PACKAGES
  DIS6 {prefix}.dis dis
  IC6 {prefix}.ic ic
  NPF6 {prefix}.npf npf
{extra}
END PACKAGES
"""


def build_split_deck(ws, nrow=6, ncol=10):
    """Full domain 6x10 split into west (cols 1-5) and east (cols 6-10)
    models joined by a GWF6-GWF6 exchange — the .mf6minsim/par_gwf01
    pattern."""
    half = ncol // 2
    write(ws, "mfsim.nam", """
BEGIN TIMING
  TDIS6 sim.tdis
END TIMING
BEGIN MODELS
  GWF6 west.nam WEST
  GWF6 east.nam EAST
END MODELS
BEGIN EXCHANGES
  GWF6-GWF6 we.exg WEST EAST
END EXCHANGES
BEGIN SOLUTIONGROUP 1
  IMS6 sim.ims WEST EAST
END SOLUTIONGROUP
""")
    write(ws, "sim.tdis", TDIS1)
    write(ws, "sim.ims", IMS)
    for prefix, chd_col, chd_head in (("west", 1, 10.0),
                                      ("east", half, 4.0)):
        write(ws, f"{prefix}.nam", _gwf_nam(
            prefix, f"  CHD6 {prefix}.chd chd"))
        write(ws, f"{prefix}.dis", _dis(nrow, half))
        write(ws, f"{prefix}.ic", """
BEGIN GRIDDATA
  STRT
    CONSTANT 7.0
END GRIDDATA
""")
        write(ws, f"{prefix}.npf", """
BEGIN GRIDDATA
  ICELLTYPE
    CONSTANT 0
  K
    CONSTANT 5.0
END GRIDDATA
""")
        lines = "\n".join(f"  1 {i + 1} {chd_col} {chd_head}"
                          for i in range(nrow))
        write(ws, f"{prefix}.chd", f"""
BEGIN DIMENSIONS
  MAXBOUND {nrow}
END DIMENSIONS
BEGIN PERIOD 1
{lines}
END PERIOD
""")
    # exchange: west col `half` ↔ east col 1, per row
    exg_lines = "\n".join(
        f"  1 {i + 1} {half} 1 {i + 1} 1 1 50.0 50.0 100.0"
        for i in range(nrow))
    write(ws, "we.exg", f"""
BEGIN OPTIONS
END OPTIONS
BEGIN DIMENSIONS
  NEXG {nrow}
END DIMENSIONS
BEGIN EXCHANGEDATA
{exg_lines}
END EXCHANGEDATA
""")


def test_two_model_exchange_matches_single(tmp_path):
    nrow, ncol = 6, 10
    build_split_deck(str(tmp_path), nrow, ncol)
    sim = load_simulation(str(tmp_path))
    recs = sim.run()
    assert all(r.converged for r in recs)
    merged = recs[-1].head
    assert merged.size == nrow * ncol

    # single-model oracle: same physics on the unsplit grid
    from modflow6_tpu.models.discretization import DisGrid
    from modflow6_tpu.models.gwf.builder import build_gwf
    from modflow6_tpu.solution import ImsSettings, NumericalSolution
    g = DisGrid.create(1, nrow, ncol, 100.0, 100.0, 0.0,
                       -100.0 * np.ones((1, nrow, ncol)))
    ref = build_gwf("ref", g, k=5.0, strt=7.0,
                    chd=[(i * ncol, 10.0) for i in range(nrow)]
                    + [(i * ncol + ncol - 1, 4.0) for i in range(nrow)])
    sol = NumericalSolution(ref, ImsSettings(
        outer_dvclose=1e-8, inner_dvclose=1e-10, inner_rclose=1e-8,
        inner_maximum=500))
    h_ref, info, _ = sol.solve_timestep(ref.strt, delt=1.0, iss=True)
    assert info.converged

    # composite numbering: west nodes then east nodes
    half = ncol // 2
    h3 = np.zeros((nrow, ncol))
    west = merged[:nrow * half].reshape(nrow, half)
    east = merged[nrow * half:].reshape(nrow, half)
    h3[:, :half] = west
    h3[:, half:] = east
    np.testing.assert_allclose(h3.reshape(-1), np.asarray(h_ref), atol=1e-7)


def test_gwf_gwt_coupled_deck(tmp_path):
    """1-D steady flow + advective transport from a constant-conc inflow
    cell (the test_gwt_adv01 pattern): front migrates at pore velocity."""
    ws = str(tmp_path)
    ncol = 40
    write(ws, "mfsim.nam", """
BEGIN TIMING
  TDIS6 sim.tdis
END TIMING
BEGIN MODELS
  GWF6 flow.nam FLOW
  GWT6 trans.nam TRANS
END MODELS
BEGIN EXCHANGES
  GWF6-GWT6 ft.exg FLOW TRANS
END EXCHANGES
BEGIN SOLUTIONGROUP 1
  IMS6 sim.ims FLOW
END SOLUTIONGROUP
BEGIN SOLUTIONGROUP 2
  IMS6 trans.ims TRANS
END SOLUTIONGROUP
""")
    write(ws, "sim.tdis", """
BEGIN DIMENSIONS
  NPER 1
END DIMENSIONS
BEGIN PERIODDATA
  200.0 10 1.0
END PERIODDATA
""")
    write(ws, "sim.ims", IMS)
    write(ws, "trans.ims", IMS.replace("CG", "BICGSTAB"))
    write(ws, "ft.exg", """
BEGIN OPTIONS
END OPTIONS
""")
    write(ws, "flow.nam", _gwf_nam(
        "flow", "  CHD6 flow.chd chd\n  STO6 flow.sto sto"))
    write(ws, "flow.dis", _dis(1, ncol, delr=10.0))
    write(ws, "flow.ic", """
BEGIN GRIDDATA
  STRT
    CONSTANT 10.0
END GRIDDATA
""")
    write(ws, "flow.npf", """
BEGIN GRIDDATA
  ICELLTYPE
    CONSTANT 0
  K
    CONSTANT 10.0
END GRIDDATA
""")
    write(ws, "flow.sto", """
BEGIN GRIDDATA
  ICONVERT
    CONSTANT 0
  SS
    CONSTANT 0.0
END GRIDDATA
BEGIN PERIOD 1
  STEADY-STATE
END PERIOD
""")
    write(ws, "flow.chd", f"""
BEGIN DIMENSIONS
  MAXBOUND 2
END DIMENSIONS
BEGIN PERIOD 1
  1 1 1 11.0
  1 1 {ncol} 10.0
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
  CNC6 trans.cnc cnc
  OC6 trans.oc oc
END PACKAGES
""")
    write(ws, "trans.dis", _dis(1, ncol, delr=10.0))
    write(ws, "trans.ic", """
BEGIN GRIDDATA
  STRT
    CONSTANT 0.0
END GRIDDATA
""")
    write(ws, "trans.adv", """
BEGIN OPTIONS
  SCHEME UPSTREAM
END OPTIONS
""")
    write(ws, "trans.mst", """
BEGIN GRIDDATA
  POROSITY
    CONSTANT 0.1
END GRIDDATA
""")
    write(ws, "trans.cnc", """
BEGIN DIMENSIONS
  MAXBOUND 1
END DIMENSIONS
BEGIN PERIOD 1
  1 1 1 1.0
END PERIOD
""")
    write(ws, "trans.oc", """
BEGIN OPTIONS
  CONCENTRATION FILEOUT trans.ucn
END OPTIONS
""")
    sim = load_simulation(ws)
    assert sim.gwt is not None
    recs = sim.run()
    assert all(r.converged for r in recs)
    conc = sim.conc_records[-1].reshape(-1)
    # monotone front: conc 1 at source decaying downstream, not yet at exit
    assert conc[0] > 0.99
    assert np.all(np.diff(conc) <= 1e-9)
    assert conc[-1] < 0.5
    assert conc[5] > 0.4   # front has moved well past cell 5
    ucn = read_head_file(os.path.join(ws, "trans.ucn"))
    assert len(ucn) == 10
    assert ucn[-1]["text"] == "CONCENTRATION"
    np.testing.assert_allclose(ucn[-1]["data"].reshape(-1), conc)


def test_oc_period_save_selection(tmp_path):
    """OC PERIOD blocks: SAVE HEAD LAST writes only the final step of each
    period (OutputControl.f90:16-37 semantics incl. persistence)."""
    ws = str(tmp_path)
    write(ws, "mfsim.nam", """
BEGIN TIMING
  TDIS6 sim.tdis
END TIMING
BEGIN MODELS
  GWF6 m.nam M
END MODELS
BEGIN SOLUTIONGROUP 1
  IMS6 sim.ims M
END SOLUTIONGROUP
""")
    write(ws, "sim.tdis", """
BEGIN DIMENSIONS
  NPER 2
END DIMENSIONS
BEGIN PERIODDATA
  3.0 3 1.0
  4.0 4 1.0
END PERIODDATA
""")
    write(ws, "sim.ims", IMS)
    write(ws, "m.nam", _gwf_nam(
        "m", "  CHD6 m.chd chd\n  STO6 m.sto sto\n  OC6 m.oc oc"))
    write(ws, "m.dis", _dis(4, 5))
    write(ws, "m.ic", """
BEGIN GRIDDATA
  STRT
    CONSTANT 5.0
END GRIDDATA
""")
    write(ws, "m.npf", """
BEGIN GRIDDATA
  ICELLTYPE
    CONSTANT 0
  K
    CONSTANT 1.0
END GRIDDATA
""")
    write(ws, "m.sto", """
BEGIN GRIDDATA
  ICONVERT
    CONSTANT 0
  SS
    CONSTANT 1.0e-4
END GRIDDATA
BEGIN PERIOD 1
  TRANSIENT
END PERIOD
""")
    write(ws, "m.chd", """
BEGIN DIMENSIONS
  MAXBOUND 2
END DIMENSIONS
BEGIN PERIOD 1
  1 1 1 6.0
  1 4 5 4.0
END PERIOD
""")
    write(ws, "m.oc", """
BEGIN OPTIONS
  HEAD FILEOUT m.hds
END OPTIONS
BEGIN PERIOD 1
  SAVE HEAD LAST
END PERIOD
""")
    sim = load_simulation(ws)
    recs = sim.run()
    assert len(recs) == 7
    hds = read_head_file(os.path.join(ws, "m.hds"))
    # LAST persists into period 2: one record per period
    assert [(r["kper"], r["kstp"]) for r in hds] == [(1, 3), (2, 4)]


def test_disv_deck_loads_and_solves(tmp_path):
    """DISV deck (rectangular cells expressed as polygons) loads and
    reproduces the DIS solution."""
    ws = str(tmp_path)
    nrow, ncol = 3, 4
    ncpl = nrow * ncol
    nvert = (nrow + 1) * (ncol + 1)
    d = 10.0

    def vid(i, j):
        return i * (ncol + 1) + j

    vert_lines = []
    for i in range(nrow + 1):
        for j in range(ncol + 1):
            vert_lines.append(f"  {vid(i, j) + 1} {j * d} {(nrow - i) * d}")
    cell_lines = []
    for i in range(nrow):
        for j in range(ncol):
            c = i * ncol + j
            ivs = [vid(i, j), vid(i, j + 1), vid(i + 1, j + 1), vid(i + 1, j)]
            cell_lines.append(
                f"  {c + 1} {(j + 0.5) * d} {(nrow - i - 0.5) * d} 4 "
                + " ".join(str(v + 1) for v in ivs))
    write(ws, "mfsim.nam", """
BEGIN TIMING
  TDIS6 sim.tdis
END TIMING
BEGIN MODELS
  GWF6 m.nam M
END MODELS
BEGIN SOLUTIONGROUP 1
  IMS6 sim.ims M
END SOLUTIONGROUP
""")
    write(ws, "sim.tdis", TDIS1)
    write(ws, "sim.ims", IMS)
    write(ws, "m.nam", """
BEGIN OPTIONS
END OPTIONS
BEGIN PACKAGES
  DISV6 m.disv disv
  IC6 m.ic ic
  NPF6 m.npf npf
  CHD6 m.chd chd
END PACKAGES
""")
    write(ws, "m.disv", f"""
BEGIN DIMENSIONS
  NCPL {ncpl}
  NLAY 1
  NVERT {nvert}
END DIMENSIONS
BEGIN GRIDDATA
  TOP
    CONSTANT 0.0
  BOTM
    CONSTANT -10.0
END GRIDDATA
BEGIN VERTICES
{chr(10).join(vert_lines)}
END VERTICES
BEGIN CELL2D
{chr(10).join(cell_lines)}
END CELL2D
""")
    write(ws, "m.ic", """
BEGIN GRIDDATA
  STRT
    CONSTANT 5.0
END GRIDDATA
""")
    write(ws, "m.npf", """
BEGIN GRIDDATA
  ICELLTYPE
    CONSTANT 0
  K
    CONSTANT 2.0
END GRIDDATA
""")
    # DISV cellid = (layer, cell2d)
    chd_lines = "\n".join(
        [f"  1 {i * ncol + 1} 8.0" for i in range(nrow)]
        + [f"  1 {i * ncol + ncol} 2.0" for i in range(nrow)])
    write(ws, "m.chd", f"""
BEGIN DIMENSIONS
  MAXBOUND {2 * nrow}
END DIMENSIONS
BEGIN PERIOD 1
{chd_lines}
END PERIOD
""")
    sim = load_simulation(ws)
    recs = sim.run()
    assert all(r.converged for r in recs)
    h = recs[-1].head.reshape(nrow, ncol)
    # 1-D linear gradient 8 → 2 across 4 columns
    np.testing.assert_allclose(h, np.tile([8.0, 6.0, 4.0, 2.0], (nrow, 1)),
                               atol=1e-7)


def test_hpc_partitions_spec(tmp_path):
    """HPC6 FILEIN PARTITIONS: the model→rank spec loads and drives the
    general partition's owner vector (utl-hpc.dfn role)."""
    import os
    ws = str(tmp_path)
    build_split_deck(ws)
    # append the HPC record to mfsim.nam
    nam = open(os.path.join(ws, "mfsim.nam")).read()
    nam = "BEGIN OPTIONS\n  HPC6 FILEIN sim.hpc\nEND OPTIONS\n" + nam
    open(os.path.join(ws, "mfsim.nam"), "w").write(nam)
    open(os.path.join(ws, "sim.hpc"), "w").write("""
BEGIN OPTIONS
END OPTIONS
BEGIN PARTITIONS
  WEST 0
  EAST 1
END PARTITIONS
""")
    sim = load_simulation(ws)
    assert sim.hpc_partitions == {"WEST": 0, "EAST": 1}
    from modflow6_tpu.parallel.general import (GeneralShardedSolution,
                                               owner_from_partitions,
                                               partition_general)
    from modflow6_tpu.solution import ImsSettings, NumericalSolution
    import jax.numpy as jnp
    owner = owner_from_partitions(sim.hpc_partitions, sim.model_offsets,
                                  sim.model_sizes, sim.model.nodes)
    assert set(np.unique(owner)) == {0, 1}
    s = ImsSettings(outer_dvclose=1e-8, outer_maximum=100,
                    inner_dvclose=1e-10, inner_rclose=1e-9,
                    inner_maximum=1000)
    sol = NumericalSolution(sim.model, s)
    ref, info, _ = sol.solve_timestep(jnp.asarray(sim.model.strt), 1.0,
                                      iss=True)
    assert info.converged
    part = partition_general(sim.model, 2, owner=owner)
    gsol = GeneralShardedSolution(part, s)
    hs, sinfo = gsol.solve_timestep(
        gsol.scatter_heads(np.asarray(sim.model.strt)), 1.0, iss=True)
    assert sinfo["converged"]
    np.testing.assert_allclose(gsol.gather_heads(hs), np.asarray(ref),
                               atol=1e-7)
