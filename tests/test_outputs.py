"""Output-parity and aux-subsystem tests: boundary .cbc records, budget
file reader, zonebudget from .cbc, offline FMI, .grb writer,
checkpoint/resume, CLI entry, memory report."""

import os
import struct

import numpy as np

import jax.numpy as jnp

from modflow6_tpu.models.discretization import DisGrid
from modflow6_tpu.models.gwf.builder import build_gwf
from modflow6_tpu.models.simulation import Simulation
from modflow6_tpu.solution import ImsSettings
from modflow6_tpu.timing.tdis import StressPeriod, Tdis
from modflow6_tpu.utils.binary import read_budget_file, read_head_file


def tight():
    return ImsSettings(outer_dvclose=1e-8, outer_maximum=100,
                       inner_dvclose=1e-10, inner_rclose=1e-9,
                       inner_maximum=2000)


def make_sim(tmp_path, nper=2, gwt=False):
    nrow, ncol = 6, 8
    g = DisGrid.create(1, nrow, ncol, 10.0, 10.0, 20.0,
                       np.zeros((1, nrow, ncol)))
    model = build_gwf(
        "outm", g, k=3.0, strt=8.0,
        storage={"ss": 1e-4, "iconvert": 0},
        chd=[(i * ncol, 10.0) for i in range(nrow)]
        + [(i * ncol + ncol - 1, 6.0) for i in range(nrow)],
        wel=[(3 * ncol + 4, -20.0)],
        rch=[(n, 5e-5) for n in range(nrow * ncol)])
    tdis = Tdis(tuple(StressPeriod(2.0, 2, 1.0) for _ in range(nper)))
    kw = {}
    if gwt:
        from modflow6_tpu.models.gwt.builder import build_gwt
        gwtm = build_gwt("outt", g, porosity=0.2, strt=0.0,
                         scheme="upstream",
                         ssm_spec={"WEL": 0.0, "RCH": 1.0})
        kw = dict(gwt=gwtm, gwt_settings=tight())
    sim = Simulation(tdis, model, tight(),
                     hds_path=os.path.join(str(tmp_path), "m.hds"),
                     cbc_path=os.path.join(str(tmp_path), "m.cbc"),
                     lst_path=os.path.join(str(tmp_path), "m.lst"), **kw)
    return sim, model


def test_boundary_cbc_records_and_reader(tmp_path):
    sim, model = make_sim(tmp_path)
    recs = sim.run()
    assert all(r.converged for r in recs)
    cbc = read_budget_file(os.path.join(str(tmp_path), "m.cbc"))
    texts = {r["text"] for r in cbc}
    # flowja + every boundary package + storage
    assert {"FLOW-JA-FACE", "CHD", "WEL", "RCH", "STO-SS"} <= texts
    # WEL flow round-trips exactly
    wel = [r for r in cbc if r["text"] == "WEL"][-1]
    id1, id2, q, aux = wel["data"]
    assert id1.tolist() == [3 * 8 + 4]
    np.testing.assert_allclose(q, [-20.0])
    # budget closure from the file alone: all inflows+outflows ≈ 0
    last = [r for r in cbc if (r["kstp"], r["kper"]) == (2, 2)]
    total = 0.0
    for r in last:
        if r["imeth"] == 6:
            total += r["data"][2].sum()
    assert abs(total) < 1e-6


def test_zonebudget_from_cbc_matches_memory(tmp_path):
    from modflow6_tpu.utils.zonebudget import (ZoneBudget, read_cbc_step,
                                               zonebudget_from_cbc)
    sim, model = make_sim(tmp_path)
    recs = sim.run()
    zones = np.ones(model.nodes, np.int64)
    zones[model.nodes // 2:] = 2
    q_edge, flows = read_cbc_step(model.topo,
                                  os.path.join(str(tmp_path), "m.cbc"),
                                  2, 2)
    zb = ZoneBudget(model.topo, zones)
    F = zb.interzone(q_edge)
    # sanity: inter-zone flow exists and the table renders
    assert F[1, 2] + F[2, 1] > 0
    table = zonebudget_from_cbc(model.topo, zones,
                                os.path.join(str(tmp_path), "m.cbc"), 2, 2)
    assert "ZONE 1" in table and "PERCENT DISCREPANCY" in table


def test_fmi_offline_matches_inline(tmp_path):
    """Offline transport from .hds+.cbc must match the inline coupled run
    (reference FMI file mode, FlowModelInterface.f90:255-266)."""
    sim, model = make_sim(tmp_path, gwt=True)
    recs = sim.run()
    conc_inline = sim.conc_records[-1]

    from modflow6_tpu.models.gwt.builder import build_gwt
    from modflow6_tpu.models.gwt.fmi import fields_from_files
    from modflow6_tpu.solution import NumericalSolution
    gwt2 = build_gwt("off", model.grid, porosity=0.2, strt=0.0,
                     scheme="upstream")
    sol = NumericalSolution(gwt2, tight())
    steps = fields_from_files(model,
                              os.path.join(str(tmp_path), "m.hds"),
                              os.path.join(str(tmp_path), "m.cbc"),
                              ssm_spec={"WEL": 0.0, "RCH": 1.0})
    assert len(steps) == 4
    conc = jnp.asarray(gwt2.strt)
    for kstp, kper, delt, fields in steps:
        gwt2.set_flows(fields)
        conc, info, _ = sol.solve_timestep(conc, delt, kstp=kstp,
                                           iss=False, pkgs=fields)
        assert info.converged
    np.testing.assert_allclose(np.asarray(conc), conc_inline, atol=1e-9)


def test_grb_writer_roundtrip(tmp_path):
    from modflow6_tpu.utils.grb import write_grb_dis
    g = DisGrid.create(2, 3, 4, 10.0, 20.0, 5.0,
                       np.array([0.0, -10.0])[:, None, None]
                       * np.ones((2, 3, 4)))
    path = os.path.join(str(tmp_path), "m.grb")
    write_grb_dis(path, g)
    with open(path, "rb") as f:
        assert f.read(50).decode().startswith("GRID DIS")
        assert f.read(50).decode().startswith("VERSION 1")
        ntxt = int(f.read(50).decode().split()[1])
        assert int(f.read(50).decode().split()[1]) == 100  # lentxt
        defs = [f.read(100).decode().split() for _ in range(ntxt)]
        names = [d[0] for d in defs]
        assert names[:5] == ["NCELLS", "NLAY", "NROW", "NCOL", "NJA"]
        ncells, nlay, nrow, ncol, nja = struct.unpack("<5i", f.read(20))
        assert (ncells, nlay, nrow, ncol) == (24, 2, 3, 4)
        f.read(24)  # origins/angrot
        delr = np.frombuffer(f.read(8 * ncol), "<f8")
        np.testing.assert_allclose(delr, 10.0)
        delc = np.frombuffer(f.read(8 * nrow), "<f8")
        np.testing.assert_allclose(delc, 20.0)
        top2d = np.frombuffer(f.read(8 * nrow * ncol), "<f8")
        np.testing.assert_allclose(top2d, 5.0)
        f.read(8 * ncells)  # botm
        ia = np.frombuffer(f.read(4 * (ncells + 1)), "<i4")
        assert ia[0] == 1 and ia[-1] == nja + 1
        ja = np.frombuffer(f.read(4 * nja), "<i4")
        assert ja.min() >= 1 and ja.max() <= ncells


def test_checkpoint_resume_bitexact(tmp_path):
    from modflow6_tpu.utils.checkpoint import (load_checkpoint,
                                               resume_simulation,
                                               save_checkpoint)
    sim, model = make_sim(tmp_path, nper=2)
    # continuous run
    recs = sim.run()
    h_final = recs[-1].head

    # two-stage run with a checkpoint between periods
    sim1, model1 = make_sim(tmp_path, nper=1)
    recs1 = sim1.run()
    ck = os.path.join(str(tmp_path), "ck.npz")
    save_checkpoint(ck, recs1[-1].head, kper=1, kstp=2, totim=2.0)
    snap = load_checkpoint(ck)
    assert snap["totim"] == 2.0

    sim2, model2 = make_sim(tmp_path, nper=1)
    resume_simulation(sim2, ck)
    recs2 = sim2.run()
    np.testing.assert_allclose(recs2[-1].head, h_final, atol=1e-12)


def test_cli_runs_deck(tmp_path, capsys):
    from tests.test_mf6io_multi import build_split_deck
    from modflow6_tpu.__main__ import main
    build_split_deck(str(tmp_path))
    assert main(["--mode", "validate", str(tmp_path)]) == 0
    assert main([str(tmp_path)]) == 0
    outp = capsys.readouterr().out
    assert "Normal termination" in outp
    assert main(["--version"]) == 0


def test_memory_report(tmp_path):
    sim, model = make_sim(tmp_path)
    sim.run()
    lst = open(os.path.join(str(tmp_path), "m.lst")).read()
    assert "MEMORY USAGE" in lst and "NPF_ARRAYS" in lst


def test_grb_disv_and_disu(tmp_path):
    """DISV/DISU .grb writers follow the reference field lists
    (Disv.f90 write_grb:716-840, Disu.f90 write_grb)."""
    from modflow6_tpu.utils.grb import write_grb_disu, write_grb_disv
    from modflow6_tpu.models.discretization.disv import DisvGrid
    from modflow6_tpu.models.discretization.disu import DisuGrid

    # 2x2 quad DISV, one layer
    verts = [(0, 0), (1, 0), (2, 0), (0, 1), (1, 1), (2, 1),
             (0, 2), (1, 2), (2, 2)]
    cell2d = [(0.5, 0.5, [0, 1, 4, 3]), (1.5, 0.5, [1, 2, 5, 4]),
              (0.5, 1.5, [3, 4, 7, 6]), (1.5, 1.5, [4, 5, 8, 7])]
    gv = DisvGrid.create(1, 4, np.asarray(verts, float), cell2d, 1.0,
                         np.zeros((1, 4)))
    path = os.path.join(str(tmp_path), "v.grb")
    write_grb_disv(path, gv)
    with open(path, "rb") as f:
        assert f.read(50).decode().startswith("GRID DISV")
        f.read(50)
        ntxt = int(f.read(50).decode().split()[1])
        f.read(50)
        names = [f.read(100).decode().split()[0] for _ in range(ntxt)]
        assert names[:6] == ["NCELLS", "NLAY", "NCPL", "NVERT",
                             "NJAVERT", "NJA"]
        ncells, nlay, ncpl, nvert, njavert, nja = struct.unpack(
            "<6i", f.read(24))
        assert (ncells, nlay, ncpl, nvert) == (4, 1, 4, 9)
        assert njavert == 4 * 5        # closed loops
        f.read(24)                     # origins + angrot
        top = np.frombuffer(f.read(8 * ncpl), "<f8")
        np.testing.assert_allclose(top, 1.0)
        botm = np.frombuffer(f.read(8 * ncells), "<f8")
        np.testing.assert_allclose(botm, 0.0)
        vxy = np.frombuffer(f.read(8 * 2 * nvert), "<f8").reshape(nvert, 2)
        np.testing.assert_allclose(vxy, np.asarray(verts, float))

    # DISU from the same topology (three chained cells)
    gu = DisuGrid.create(
        top=[1.0, 1.0, 1.0], bot=[0.0, 0.0, 0.0], area=[1.0, 1.0, 1.0],
        iac=[2, 3, 2], ja=[0, 1, 1, 0, 2, 2, 1],
        ihc=[0, 1, 0, 1, 1, 0, 1], cl12=[0, 0.5, 0, 0.5, 0.5, 0, 0.5],
        hwva=[0, 1.0, 0, 1.0, 1.0, 0, 1.0])
    pathu = os.path.join(str(tmp_path), "u.grb")
    write_grb_disu(pathu, gu)
    with open(pathu, "rb") as f:
        assert f.read(50).decode().startswith("GRID DISU")
        f.read(50)
        ntxt = int(f.read(50).decode().split()[1])
        f.read(50)
        names = [f.read(100).decode().split()[0] for _ in range(ntxt)]
        assert names[:2] == ["NODES", "NJA"]
        nodes, nja = struct.unpack("<2i", f.read(8))
        assert nodes == 3 and nja == 7


def test_inner_csv_and_oc_print(tmp_path):
    """CSV_INNER_OUTPUT writes one row per inner iteration with
    decreasing residual norms; OC PRINT HEAD puts formatted layer
    arrays in the listing (ulaprw role)."""
    from modflow6_tpu.models.gwf.builder import build_gwf
    from modflow6_tpu.models.simulation import Simulation
    from modflow6_tpu.solution import ImsSettings
    from modflow6_tpu.timing.tdis import StressPeriod, Tdis
    from modflow6_tpu.utils.oc import OutputControl, parse_spec

    g = DisGrid.create(1, 5, 5, 10.0, 10.0, 10.0, np.zeros((1, 5, 5)))
    model = build_gwf("m", g, k=1.0, strt=5.0,
                      chd=[(0, 6.0), (24, 4.0)])
    inner_csv = str(tmp_path / "inner.csv")
    lst = str(tmp_path / "m.lst")
    oc = OutputControl()
    oc.set_period(1, {("PRINT", "HEAD"): parse_spec(["LAST"]),
                      ("SAVE", "HEAD"): parse_spec(["LAST"])})
    sim = Simulation(Tdis((StressPeriod(1.0, 2, 1.0),)), model,
                     ImsSettings(outer_dvclose=1e-8, inner_dvclose=1e-10,
                                 inner_rclose=1e-9, inner_maximum=200,
                                 csv_inner_path=inner_csv),
                     lst_path=lst, oc=oc,
                     hds_path=str(tmp_path / "m.hds"))
    recs = sim.run()
    assert all(r.converged for r in recs)
    lines = open(inner_csv).read().splitlines()
    assert lines[0] == "totim,kper,kstp,kouter,kinner,dvmax,rmax,l2norm"
    assert len(lines) > 2
    # kinner increments within an outer iteration; l2norm decreases
    rows = [ln.split(",") for ln in lines[1:]]
    first_outer = [r for r in rows
                   if r[1] == "1" and r[2] == "1" and r[3] == "1"]
    l2 = [float(r[7]) for r in first_outer]
    assert l2[-1] < l2[0]
    assert [int(r[4]) for r in first_outer] == list(
        range(1, len(first_outer) + 1))
    # OC PRINT HEAD appears once (LAST of 2 steps) in the listing
    text = open(lst).read()
    assert text.count("HEAD IN LAYER") == 1
    assert "LAYER 1" in text
    # .grb written beside the .hds
    assert os.path.exists(str(tmp_path / "m.grb"))
