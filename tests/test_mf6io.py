"""MF6 deck loading end-to-end: parse → build → solve → validate.

The flagship scenario mirrors the reference's autotest
test_gwf_npf01_75x75 case b (confined, transient): since each time step of
the confined case is a *linear* solve, per-step scipy direct solves of the
same assembled systems provide an exact oracle for the full
deck→loader→assembly→Krylov pipeline.
"""

import os

import numpy as np
import pytest
import scipy.sparse.linalg as spla

import jax.numpy as jnp

from modflow6_tpu.utils.mf6io import BlockFile, load_simulation
from modflow6_tpu.utils.mf6io.arrays import read_grid_array


def write(ws, name, text):
    path = os.path.join(ws, name)
    with open(path, "w") as f:
        f.write("\n".join(line.rstrip() for line in text.splitlines()) + "\n")
    return path


def build_npf01b_deck(ws, nrow=20, ncol=20):
    """A scaled-down npf01b_75x75: confined, lognormal K, 3 periods."""
    np.random.seed(9001)
    hk = np.random.lognormal(5.0, 1.23, (nrow, ncol))
    delr = 20000.0 / nrow
    k_lines = "\n".join(" ".join(f"{v:.8e}" for v in row) for row in hk)

    write(ws, "mfsim.nam", f"""
# generated test deck
BEGIN OPTIONS
END OPTIONS
BEGIN TIMING
  TDIS6 sim.tdis
END TIMING
BEGIN MODELS
  GWF6 model.nam npf01b
END MODELS
BEGIN EXCHANGES
END EXCHANGES
BEGIN SOLUTIONGROUP 1
  IMS6 sim.ims npf01b
END SOLUTIONGROUP
""")
    write(ws, "sim.tdis", """
BEGIN OPTIONS
  TIME_UNITS DAYS
END OPTIONS
BEGIN DIMENSIONS
  NPER 3
END DIMENSIONS
BEGIN PERIODDATA
  1.0 1 1.0
  1000.0 10 1.5
  1.0 1 1.0
END PERIODDATA
""")
    write(ws, "sim.ims", """
BEGIN OPTIONS
  PRINT_OPTION SUMMARY
END OPTIONS
BEGIN NONLINEAR
  OUTER_DVCLOSE 1.0e-6
  OUTER_MAXIMUM 100
  UNDER_RELAXATION NONE
END NONLINEAR
BEGIN LINEAR
  INNER_MAXIMUM 300
  INNER_DVCLOSE 1.0e-8
  INNER_RCLOSE 1.0e-4
  LINEAR_ACCELERATION CG
  RELAXATION_FACTOR 1.0
END LINEAR
""")
    write(ws, "model.nam", """
BEGIN OPTIONS
END OPTIONS
BEGIN PACKAGES
  DIS6 model.dis dis
  IC6 model.ic ic
  NPF6 model.npf npf
  STO6 model.sto sto
  CHD6 model.chd chd-1
  WEL6 model.wel wel-1
  OC6 model.oc oc
END PACKAGES
""")
    write(ws, "model.dis", f"""
BEGIN OPTIONS
END OPTIONS
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
  IDOMAIN
    CONSTANT 1
END GRIDDATA
""")
    write(ws, "model.ic", """
BEGIN GRIDDATA
  STRT
    CONSTANT 40.0
END GRIDDATA
""")
    write(ws, "model.npf", f"""
BEGIN OPTIONS
END OPTIONS
BEGIN GRIDDATA
  ICELLTYPE
    CONSTANT 0
  K
    INTERNAL FACTOR 1.0
{k_lines}
  K33
    OPEN/CLOSE k33.txt FACTOR 1.0
END GRIDDATA
""")
    write(ws, "k33.txt", k_lines)
    write(ws, "model.sto", """
BEGIN OPTIONS
END OPTIONS
BEGIN GRIDDATA
  ICONVERT
    CONSTANT 0
  SS
    CONSTANT 1.0e-4
  SY
    CONSTANT 0.0
END GRIDDATA
BEGIN PERIOD 1
  STEADY-STATE
END PERIOD
BEGIN PERIOD 2
  TRANSIENT
END PERIOD
BEGIN PERIOD 3
  STEADY-STATE
END PERIOD
""")
    chd_lines = "\n".join(
        f"  1 {i + 1} 1 48.0\n  1 {i + 1} {ncol} 40.0" for i in range(nrow))
    write(ws, "model.chd", f"""
BEGIN DIMENSIONS
  MAXBOUND {2 * nrow}
END DIMENSIONS
BEGIN PERIOD 1
{chd_lines}
END PERIOD
""")
    nc = (nrow - 1) // 2 + 1
    write(ws, "model.wel", f"""
BEGIN DIMENSIONS
  MAXBOUND 1
END DIMENSIONS
BEGIN PERIOD 2
  1 {nc + 1} {nc + 1} -1000.0
END PERIOD
""")
    write(ws, "model.oc", """
BEGIN OPTIONS
  HEAD FILEOUT model.hds
  BUDGET FILEOUT model.cbc
END OPTIONS
BEGIN PERIOD 1
  SAVE HEAD ALL
  SAVE BUDGET ALL
END PERIOD
""")
    return hk


def test_blockfile_parsing(tmp_path):
    p = write(tmp_path, "x.ims", """
# comment
BEGIN OPTIONS
  PRINT_OPTION SUMMARY
END OPTIONS
BEGIN NONLINEAR
  OUTER_DVCLOSE 1.0e-6
END NONLINEAR
""")
    bf = BlockFile(p)
    assert bf.options() == {"PRINT_OPTION": "SUMMARY"}
    assert bf.get("NONLINEAR").lines == [["OUTER_DVCLOSE", "1.0e-6"]]


def test_array_readers(tmp_path):
    write(tmp_path, "ext.txt", "5.0 6.0\n7.0 8.0\n")
    p = write(tmp_path, "g.dis", """
BEGIN GRIDDATA
  A
    CONSTANT 3.5
  B
    INTERNAL FACTOR 2.0
      1.0 2.0
      3.0 4.0
  C
    OPEN/CLOSE ext.txt
  D LAYERED
    CONSTANT 1.0
    CONSTANT 2.0
END GRIDDATA
""")
    bf = BlockFile(p)
    np.testing.assert_allclose(
        read_grid_array(bf, "GRIDDATA", "A", (2, 2), str(tmp_path)), 3.5)
    np.testing.assert_allclose(
        read_grid_array(bf, "GRIDDATA", "B", (2, 2), str(tmp_path)),
        [[2.0, 4.0], [6.0, 8.0]])
    np.testing.assert_allclose(
        read_grid_array(bf, "GRIDDATA", "C", (2, 2), str(tmp_path)),
        [[5.0, 6.0], [7.0, 8.0]])
    np.testing.assert_allclose(
        read_grid_array(bf, "GRIDDATA", "D", (2, 2, 2), str(tmp_path)),
        [[[1.0, 1.0], [1.0, 1.0]], [[2.0, 2.0], [2.0, 2.0]]])


def test_npf01b_deck_vs_direct_solve(tmp_path):
    """Load the deck and march; every step must match a scipy direct solve."""
    hk = build_npf01b_deck(str(tmp_path))
    sim = load_simulation(str(tmp_path))
    assert sim.tdis.nper == 3
    assert sim.transient == [False, True, False]
    assert sim.solution.s.linear_acceleration == "cg"
    assert sim.solution.s.outer_dvclose == 1e-6

    model = sim.model
    np.testing.assert_allclose(
        np.asarray(model.npf_arrays.k11).reshape(20, 20), hk)

    recs = sim.run()
    assert all(r.converged for r in recs)
    assert abs(sim.budget.percent_discrepancy()) < 1e-4

    # exact oracle: re-march with scipy direct solves (linear per step)
    from modflow6_tpu.ops.system import apply_dirichlet, to_scipy_csr
    head = jnp.asarray(model.strt)
    irec = 0
    for kper, kstp, delt, pertim, totim in sim.tdis.walk():
        pkgs = sim.period_packages(kper)
        iss = not sim.transient[kper - 1]
        ib, h = model.boundary_state(head, pkgs)
        diag, off, rhs = model.assemble(h, h, ib, delt, iss, pkgs)
        active = jnp.where(ib > 0, 1, jnp.where(ib < 0, -1, 0))
        diag, off, rhs = apply_dirichlet(model.dtopo.nbr, active, diag, off,
                                         rhs, h)
        amat = to_scipy_csr(model.topo, np.asarray(diag), np.asarray(off))
        x = spla.spsolve(amat.tocsc(), np.asarray(rhs))
        np.testing.assert_allclose(recs[irec].head, x, atol=5e-6)
        head = jnp.asarray(x)
        irec += 1

    # output files exist and contain all steps
    from modflow6_tpu.utils.binary import read_head_file
    hds = read_head_file(os.path.join(str(tmp_path), "model.hds"))
    assert len(hds) == 12  # 1 + 10 + 1 steps × 1 layer
    np.testing.assert_allclose(hds[-1]["data"].reshape(-1), recs[-1].head)


def test_wel_appears_only_in_period2(tmp_path):
    build_npf01b_deck(str(tmp_path))
    sim = load_simulation(str(tmp_path))
    p1 = sim.period_packages(1)
    p2 = sim.period_packages(2)
    assert not bool(np.asarray(p1.wel.mask).any())
    assert bool(np.asarray(p2.wel.mask).any())
    # persistence: period 3 keeps the period-2 well
    p3 = sim.period_packages(3)
    assert bool(np.asarray(p3.wel.mask).any())


def test_dfn_schema_rejects_misspelled_option(tmp_path):
    """-m validate role: a keyword not in the dfn spec raises in strict
    mode and warns otherwise (dfn2f90.py single-source-of-truth role)."""
    import warnings
    import pytest
    from modflow6_tpu.utils.mf6io.schema import (check_options, set_strict,
                                                 UnknownKeywordError)

    opts = {"SAVE_FLOWS": True, "ALTERNATVE_CELL_AVERAGING": "LOGARITHMIC"}
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        unknown = check_options("gwf-npf", opts, "npf file")
    assert unknown == ["ALTERNATVE_CELL_AVERAGING"]
    assert any("ALTERNATVE" in str(w.message) for w in rec)
    set_strict(True)
    try:
        with pytest.raises(UnknownKeywordError):
            check_options("gwf-npf", opts, "npf file")
    finally:
        set_strict(False)
    # a clean OPTIONS dict passes silently
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        assert check_options("gwf-npf", {"SAVE_FLOWS": True,
                                         "XT3D": True}) == []
    assert not rec


def test_dfn_schema_covers_all_reference_components():
    from modflow6_tpu.utils.mf6io.schema import load_schema
    sch = load_schema()
    assert len(sch) == 142   # every reference dfn spec distilled
    for comp in ("gwf-npf", "gwf-maw", "gwf-sfr", "gwf-lak", "gwf-uzf",
                 "gwf-csub", "gwt-mst", "gwe-cnd", "prt-prp", "sln-ims",
                 "sim-tdis", "exg-gwfgwf", "utl-ats", "chf-dfw"):
        assert comp in sch, comp
        assert "options" in sch[comp] or "dimensions" in sch[comp]
