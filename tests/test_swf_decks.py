"""CHF6/OLF6 deck loading end-to-end (chf-*/olf-* dfn block formats):
the deck-loaded model must reproduce the programmatic build_chf
normal-depth solution (tests/test_swf.py analytic anchor)."""

import os

import numpy as np

from modflow6_tpu.utils.mf6io import load_simulation


def write(ws, name, text):
    with open(os.path.join(ws, name), "w") as f:
        f.write(text + "\n")


def _sim_files(ws, mtype, mfile):
    write(ws, "mfsim.nam", f"""
BEGIN OPTIONS
END OPTIONS
BEGIN TIMING
  TDIS6 sim.tdis
END TIMING
BEGIN MODELS
  {mtype} {mfile} chan
END MODELS
BEGIN SOLUTIONGROUP 1
  IMS6 sim.ims chan
END SOLUTIONGROUP
""")
    write(ws, "sim.tdis", """
BEGIN OPTIONS
END OPTIONS
BEGIN DIMENSIONS
  NPER 1
END DIMENSIONS
BEGIN PERIODDATA
  12000.0 60 1.0
END PERIODDATA
""")
    write(ws, "sim.ims", """
BEGIN OPTIONS
END OPTIONS
BEGIN NONLINEAR
  OUTER_DVCLOSE 1.0e-8
  OUTER_MAXIMUM 300
END NONLINEAR
BEGIN LINEAR
  INNER_MAXIMUM 500
  INNER_DVCLOSE 1.0e-10
  INNER_RCLOSE 1.0e-9
  LINEAR_ACCELERATION BICGSTAB
END LINEAR
""")


def test_chf_deck_normal_depth(tmp_path):
    ws = str(tmp_path)
    nreach, dx, width, s0, nman, qin = 20, 100.0, 5.0, 1e-3, 0.03, 2.0
    bot = np.arange(nreach)[::-1] * dx * s0
    dn = (qin * nman / (width * np.sqrt(s0))) ** 0.6
    _sim_files(ws, "CHF6", "chan.nam")
    write(ws, "chan.nam", """
BEGIN OPTIONS
END OPTIONS
BEGIN PACKAGES
  DISV1D6 chan.disv1d
  DFW6 chan.dfw
  STO6 chan.sto
  IC6 chan.ic
  FLW6 chan.flw
  ZDG6 chan.zdg
  OC6 chan.oc
END PACKAGES
""")
    verts = "\n".join(f"  {i + 1} {i * dx} 0.0" for i in range(nreach + 1))
    cells = "\n".join(f"  {i + 1} 0.5 2 {i + 1} {i + 2}"
                      for i in range(nreach))
    width_line = f"    CONSTANT {width}"
    bot_lines = "    INTERNAL\n      " + " ".join(str(b) for b in bot)
    write(ws, "chan.disv1d", f"""
BEGIN OPTIONS
END OPTIONS
BEGIN DIMENSIONS
  NODES {nreach}
  NVERT {nreach + 1}
END DIMENSIONS
BEGIN GRIDDATA
  WIDTH
{width_line}
  BOTTOM
{bot_lines}
END GRIDDATA
BEGIN VERTICES
{verts}
END VERTICES
BEGIN CELL1D
{cells}
END CELL1D
""")
    write(ws, "chan.dfw", f"""
BEGIN OPTIONS
  CENTRAL_IN_SPACE
END OPTIONS
BEGIN GRIDDATA
  MANNINGSN
    CONSTANT {nman}
  IDCXS
    CONSTANT 0
END GRIDDATA
""")
    write(ws, "chan.sto", """
BEGIN OPTIONS
END OPTIONS
BEGIN PERIOD 1
  TRANSIENT
END PERIOD
""")
    strt = bot + 0.5 * dn
    write(ws, "chan.ic", """
BEGIN OPTIONS
END OPTIONS
BEGIN GRIDDATA
  STRT
    INTERNAL
      """ + " ".join(f"{s:.8f}" for s in strt) + """
END GRIDDATA
""")
    write(ws, "chan.flw", f"""
BEGIN OPTIONS
END OPTIONS
BEGIN DIMENSIONS
  MAXBOUND 1
END DIMENSIONS
BEGIN PERIOD 1
  1 {qin}
END PERIOD
""")
    write(ws, "chan.zdg", f"""
BEGIN OPTIONS
END OPTIONS
BEGIN DIMENSIONS
  MAXBOUND 1
END DIMENSIONS
BEGIN PERIOD 1
  {nreach} 0 {width} {s0} {nman}
END PERIOD
""")
    write(ws, "chan.oc", """
BEGIN OPTIONS
  STAGE FILEOUT chan.stage
END OPTIONS
BEGIN PERIOD 1
  SAVE STAGE LAST
END PERIOD
""")
    sim = load_simulation(ws)
    recs = sim.run()
    assert all(r.converged for r in recs)
    depth = recs[-1].stage - bot
    np.testing.assert_allclose(depth[3:-3], dn, rtol=2e-2)
    # stage file written with only the LAST step (OC selection)
    from modflow6_tpu.utils.binary import read_head_file
    out = read_head_file(os.path.join(ws, "chan.stage"))
    assert len(out) == 1 and out[0]["text"] == "STAGE"
    np.testing.assert_allclose(out[0]["data"].reshape(-1),
                               recs[-1].stage, rtol=1e-12)
    # volumetric budget closes (FLW in = ZDG out + storage change)
    assert abs(sim.budget.percent_discrepancy()) < 0.01


def test_olf_deck_plane(tmp_path):
    """OLF deck on a DIS2D raster: rain drains through a ZDG strip;
    steady outflow equals inflow."""
    ws = str(tmp_path)
    nrow, ncol, dx, s0, nman = 4, 8, 10.0, 1e-3, 0.05
    surf = (np.arange(ncol)[::-1] * dx * s0)[None, :] * np.ones((nrow, 1))
    qcell = 0.02
    _sim_files(ws, "OLF6", "plane.nam")
    write(ws, "plane.nam", """
BEGIN OPTIONS
END OPTIONS
BEGIN PACKAGES
  DIS2D6 plane.dis2d
  DFW6 plane.dfw
  STO6 plane.sto
  IC6 plane.ic
  FLW6 plane.flw
  ZDG6 plane.zdg
END PACKAGES
""")
    bot_rows = "\n".join("      " + " ".join(f"{v:.6f}" for v in row)
                         for row in surf)
    write(ws, "plane.dis2d", f"""
BEGIN OPTIONS
END OPTIONS
BEGIN DIMENSIONS
  NROW {nrow}
  NCOL {ncol}
END DIMENSIONS
BEGIN GRIDDATA
  DELR
    CONSTANT {dx}
  DELC
    CONSTANT {dx}
  BOTTOM
    INTERNAL
{bot_rows}
END GRIDDATA
""")
    write(ws, "plane.dfw", f"""
BEGIN OPTIONS
  CENTRAL_IN_SPACE
END OPTIONS
BEGIN GRIDDATA
  MANNINGSN
    CONSTANT {nman}
  IDCXS
    CONSTANT 0
END GRIDDATA
""")
    write(ws, "plane.sto", """
BEGIN OPTIONS
END OPTIONS
BEGIN PERIOD 1
  TRANSIENT
END PERIOD
""")
    strt_rows = "\n".join("      " + " ".join(f"{v + 0.02:.6f}" for v in row)
                          for row in surf)
    write(ws, "plane.ic", f"""
BEGIN OPTIONS
END OPTIONS
BEGIN GRIDDATA
  STRT
    INTERNAL
{strt_rows}
END GRIDDATA
""")
    flw_lines = "\n".join(f"  {r + 1} {c + 1} {qcell}"
                          for r in range(nrow) for c in range(ncol - 1))
    write(ws, "plane.flw", f"""
BEGIN OPTIONS
END OPTIONS
BEGIN DIMENSIONS
  MAXBOUND {nrow * (ncol - 1)}
END DIMENSIONS
BEGIN PERIOD 1
{flw_lines}
END PERIOD
""")
    zdg_lines = "\n".join(f"  {r + 1} {ncol} 0 {dx} {s0} {nman}"
                          for r in range(nrow))
    write(ws, "plane.zdg", f"""
BEGIN OPTIONS
END OPTIONS
BEGIN DIMENSIONS
  MAXBOUND {nrow}
END DIMENSIONS
BEGIN PERIOD 1
{zdg_lines}
END PERIOD
""")
    sim = load_simulation(ws)
    recs = sim.run()
    assert all(r.converged for r in recs)
    qin = nrow * (ncol - 1) * qcell
    import jax.numpy as jnp
    qout = float(np.asarray(
        sim.model._zdg_q(jnp.asarray(recs[-1].stage))).sum())
    np.testing.assert_allclose(-qout, qin, rtol=1e-4)


def test_chf_deck_pcp_evp_cdb(tmp_path):
    """PCP6/EVP6/CDB6 deck files load and balance: critical-depth outlet
    passes the net rain input (swf-pcp/evp/cdb dfn period formats)."""
    ws = str(tmp_path)
    nreach, dx, width = 8, 100.0, 5.0
    _sim_files(ws, "CHF6", "chan.nam")
    write(ws, "chan.nam", """
BEGIN OPTIONS
END OPTIONS
BEGIN PACKAGES
  DISV1D6 chan.disv1d
  DFW6 chan.dfw
  STO6 chan.sto
  IC6 chan.ic
  PCP6 chan.pcp
  EVP6 chan.evp
  CDB6 chan.cdb
END PACKAGES
""")
    verts = "\n".join(f"  {i + 1} {i * dx} 0.0" for i in range(nreach + 1))
    cells = "\n".join(f"  {i + 1} 0.5 2 {i + 1} {i + 2}"
                      for i in range(nreach))
    write(ws, "chan.disv1d", f"""
BEGIN OPTIONS
END OPTIONS
BEGIN DIMENSIONS
  NODES {nreach}
  NVERT {nreach + 1}
END DIMENSIONS
BEGIN GRIDDATA
  WIDTH
    CONSTANT {width}
  BOTTOM
    CONSTANT 0.0
END GRIDDATA
BEGIN VERTICES
{verts}
END VERTICES
BEGIN CELL1D
{cells}
END CELL1D
""")
    write(ws, "chan.dfw", """
BEGIN OPTIONS
END OPTIONS
BEGIN GRIDDATA
  MANNINGSN
    CONSTANT 0.03
END GRIDDATA
""")
    write(ws, "chan.sto", """
BEGIN OPTIONS
END OPTIONS
""")
    write(ws, "chan.ic", """
BEGIN GRIDDATA
  STRT
    CONSTANT 0.3
END GRIDDATA
""")
    write(ws, "chan.pcp", f"""
BEGIN OPTIONS
END OPTIONS
BEGIN DIMENSIONS
  MAXBOUND {nreach}
END DIMENSIONS
BEGIN PERIOD 1
""" + "\n".join(f"  {i + 1} 1.0e-4" for i in range(nreach)) + """
END PERIOD
""")
    write(ws, "chan.evp", f"""
BEGIN OPTIONS
END OPTIONS
BEGIN DIMENSIONS
  MAXBOUND {nreach}
END DIMENSIONS
BEGIN PERIOD 1
""" + "\n".join(f"  {i + 1} 2.0e-5" for i in range(nreach)) + """
END PERIOD
""")
    write(ws, "chan.cdb", f"""
BEGIN OPTIONS
END OPTIONS
BEGIN DIMENSIONS
  MAXBOUND 1
END DIMENSIONS
BEGIN PERIOD 1
  {nreach} 0 {width}
END PERIOD
""")
    from modflow6_tpu.utils.mf6io import load_simulation
    sim = load_simulation(ws)
    recs = sim.run()
    assert all(r.converged for r in recs)
    model = sim.model
    import jax.numpy as jnp
    ib, st = model.boundary_state(jnp.asarray(recs[-1].stage))
    bud = model.boundary_budget(st, ib)
    qnet = float(np.asarray(bud["PCP"]).sum()
                 + np.asarray(bud["EVP"]).sum())
    np.testing.assert_allclose(-float(np.asarray(bud["CDB"]).sum()),
                               qnet, rtol=1e-3)   # near-steady by sim end
