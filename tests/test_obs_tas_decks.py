"""OBS6 observation files, READASARRAYS recharge, and TAS6 time-array
series loaded from decks (utl-obs.dfn, gwf-rcha.dfn, utl-tas.dfn)."""

import os

import numpy as np

from modflow6_tpu.utils.mf6io import load_simulation


def write(ws, name, text):
    with open(os.path.join(ws, name), "w") as f:
        f.write(text + "\n")


def _base_deck(ws, nper=1, perlen="100.0 4 1.0", extra_pkgs="",
               rch_file=None):
    write(ws, "mfsim.nam", """
BEGIN OPTIONS
END OPTIONS
BEGIN TIMING
  TDIS6 sim.tdis
END TIMING
BEGIN MODELS
  GWF6 model.nam m1
END MODELS
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
  INNER_MAXIMUM 300
  INNER_DVCLOSE 1.0e-10
  INNER_RCLOSE 1.0e-9
END LINEAR
""")
    write(ws, "model.nam", f"""
BEGIN OPTIONS
END OPTIONS
BEGIN PACKAGES
  DIS6 model.dis
  IC6 model.ic
  NPF6 model.npf
  STO6 model.sto
  CHD6 model.chd
{extra_pkgs}
END PACKAGES
""")
    write(ws, "model.dis", """
BEGIN OPTIONS
END OPTIONS
BEGIN DIMENSIONS
  NLAY 1
  NROW 1
  NCOL 5
END DIMENSIONS
BEGIN GRIDDATA
  DELR
    CONSTANT 100.0
  DELC
    CONSTANT 100.0
  TOP
    CONSTANT 50.0
  BOTM
    CONSTANT 0.0
END GRIDDATA
""")
    write(ws, "model.ic", """
BEGIN OPTIONS
END OPTIONS
BEGIN GRIDDATA
  STRT
    CONSTANT 10.0
END GRIDDATA
""")
    write(ws, "model.npf", """
BEGIN OPTIONS
END OPTIONS
BEGIN GRIDDATA
  ICELLTYPE
    CONSTANT 0
  K
    CONSTANT 5.0
END GRIDDATA
""")
    write(ws, "model.sto", """
BEGIN OPTIONS
END OPTIONS
BEGIN GRIDDATA
  ICONVERT
    CONSTANT 0
  SS
    CONSTANT 1.0e-4
  SY
    CONSTANT 0.1
END GRIDDATA
BEGIN PERIOD 1
  TRANSIENT
END PERIOD
""")
    write(ws, "model.chd", """
BEGIN OPTIONS
END OPTIONS
BEGIN DIMENSIONS
  MAXBOUND 1
END DIMENSIONS
BEGIN PERIOD 1
  1 1 1 10.0
END PERIOD
""")


def test_obs6_continuous_head_csv(tmp_path):
    ws = str(tmp_path)
    _base_deck(ws, extra_pkgs="  OBS6 model.obs\n  RCH6 model.rch")
    write(ws, "model.rch", """
BEGIN OPTIONS
END OPTIONS
BEGIN DIMENSIONS
  MAXBOUND 1
END DIMENSIONS
BEGIN PERIOD 1
  1 1 5 0.002
END PERIOD
""")
    write(ws, "model.obs", """
BEGIN OPTIONS
  DIGITS 12
END OPTIONS
BEGIN CONTINUOUS FILEOUT heads.csv
  h_end HEAD 1 1 5
  dd_mid DRAWDOWN 1 1 3
END CONTINUOUS
BEGIN CONTINUOUS FILEOUT second.csv
  h_first HEAD 1 1 1
END CONTINUOUS
""")
    sim = load_simulation(ws)
    recs = sim.run()
    assert all(r.converged for r in recs)
    lines = open(os.path.join(ws, "heads.csv")).read().splitlines()
    assert lines[0] == "time,h_end,dd_mid"
    assert len(lines) == 1 + len(recs)
    last = lines[-1].split(",")
    np.testing.assert_allclose(float(last[1]), recs[-1].head[4],
                               rtol=1e-10)
    # drawdown = strt − head
    np.testing.assert_allclose(float(last[2]), 10.0 - recs[-1].head[2],
                               rtol=1e-8, atol=1e-12)
    lines2 = open(os.path.join(ws, "second.csv")).read().splitlines()
    assert lines2[0] == "time,h_first"


def test_rcha_with_tas(tmp_path):
    """READASARRAYS recharge bound to a TAS6 linear series: each step
    receives the time-averaged array; heads rise accordingly and the
    budget's RCH inflow matches the series integral."""
    ws = str(tmp_path)
    _base_deck(ws, extra_pkgs="  RCH6 model.rch")
    write(ws, "model.rch", """
BEGIN OPTIONS
  READASARRAYS
  TAS6 FILEIN model.tas
END OPTIONS
BEGIN PERIOD 1
  RECHARGE TIMEARRAYSERIES rts
END PERIOD
""")
    write(ws, "model.tas", """
BEGIN ATTRIBUTES
  NAME rts
  METHOD LINEAR
END ATTRIBUTES
BEGIN TIME 0.0
  CONSTANT 0.0
END TIME
BEGIN TIME 100.0
  CONSTANT 0.004
END TIME
""")
    sim = load_simulation(ws)
    recs = sim.run()
    assert all(r.converged for r in recs)
    # the linear ramp 0→0.004 over 100 d averages 0.002 over the run;
    # RCH counts the 4 non-CHD cells (recharge at a constant-head cell
    # is excluded from the budget, bnd_cq ibound gate)
    rch = sim.budget.terms["RCH"]
    np.testing.assert_allclose(rch.cum_in, 0.002 * 100 * 4 * 1e4,
                               rtol=1e-10)
    assert recs[-1].head[4] > 10.0


def test_rcha_static_array(tmp_path):
    """READASARRAYS without TAS: a plain per-cell recharge array."""
    ws = str(tmp_path)
    _base_deck(ws, extra_pkgs="  RCH6 model.rch")
    write(ws, "model.rch", """
BEGIN OPTIONS
  READASARRAYS
END OPTIONS
BEGIN PERIOD 1
  RECHARGE
    INTERNAL
      0.0 0.001 0.002 0.003 0.004
END PERIOD
""")
    sim = load_simulation(ws)
    recs = sim.run()
    assert all(r.converged for r in recs)
    rch = sim.budget.terms["RCH"]
    np.testing.assert_allclose(
        rch.cum_in, (0.001 + 0.002 + 0.003 + 0.004) * 1e4 * 100,
        rtol=1e-10)
