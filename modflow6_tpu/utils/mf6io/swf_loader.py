"""Deck loading for the SWF model family: CHF6 (channel) and OLF6
(overland) model files and their packages.

Parity targets: the chf-*/olf-* dfn specs (doc/mf6io/mf6ivar/dfn/) and
the IDM loaders they generate — DISV1D6 (chf-disv1d.dfn: vertices +
cell1d polylines), DIS2D6 (olf-dis2d.dfn), DFW6 (manningsn/idcxs
griddata, CENTRAL_IN_SPACE), CXS6 (swf-cxs.f90 n-point sections), STO6,
IC6, FLW6/CHD6/ZDG6 stress packages, OC6.

The SWF family shares one loader because the reference's CHF and OLF
are the same SwfModule compiled under two names (chf.f90/olf.f90 both
extend swf.f90).
"""

from __future__ import annotations

import os

import numpy as np

from .reader import BlockFile
from .arrays import read_grid_array
from . import schema
from .advanced_loader import _period_blocks, _only_first_period


def _load_disv1d(path, base_dir):
    """DISV1D6 → (Disv1dGrid, idomain) with reach lengths from the
    cell1d polylines and connectivity from shared end vertices."""
    from ...models.swf.model import Disv1dGrid

    bf = BlockFile(path)
    schema.check_options("swf-disv1d", bf.options(), path)
    dims = bf.dimensions()
    n = int(dims["NODES"])
    width = read_grid_array(bf, "GRIDDATA", "WIDTH", (n,), base_dir)
    bottom = read_grid_array(bf, "GRIDDATA", "BOTTOM", (n,), base_dir)
    idom = read_grid_array(bf, "GRIDDATA", "IDOMAIN", (n,), base_dir,
                           dtype=np.int64, default=1)
    verts = {}
    vb = bf.get("VERTICES")
    if vb is not None:
        for toks in vb.lines:
            verts[int(toks[0])] = (float(toks[1]), float(toks[2]))
    length = np.zeros(n)
    endpoints = []          # (first_vertex, last_vertex) per reach
    cb = bf.get("CELL1D")
    if cb is None:
        raise ValueError(f"{path}: DISV1D needs a CELL1D block")
    for toks in cb.lines:
        ic = int(toks[0]) - 1
        ncvert = int(toks[2])
        chain = [int(t) for t in toks[3:3 + ncvert]]
        pts = [verts[v] for v in chain]
        length[ic] = sum(
            ((pts[i + 1][0] - pts[i][0]) ** 2
             + (pts[i + 1][1] - pts[i][1]) ** 2) ** 0.5
            for i in range(len(pts) - 1))
        endpoints.append((ic, chain[0], chain[-1]))
    # reaches sharing a vertex endpoint are connected
    by_vertex = {}
    for ic, v0, v1 in endpoints:
        by_vertex.setdefault(v0, []).append(ic)
        by_vertex.setdefault(v1, []).append(ic)
    pairs = set()
    for cells in by_vertex.values():
        for i in range(len(cells)):
            for j in range(i + 1, len(cells)):
                a, b = sorted((cells[i], cells[j]))
                if a != b:
                    pairs.add((a, b))
    grid = Disv1dGrid(n, length, np.asarray(width, np.float64),
                      np.asarray(bottom, np.float64), sorted(pairs))
    return grid, np.asarray(idom, np.int64)


def _load_dis2d(path, base_dir):
    """DIS2D6 → DisGrid (nlay=1, botm = land surface) for OLF."""
    from ...models.discretization import DisGrid

    bf = BlockFile(path)
    schema.check_options("swf-dis2d", bf.options(), path)
    dims = bf.dimensions()
    nrow, ncol = int(dims["NROW"]), int(dims["NCOL"])
    delr = read_grid_array(bf, "GRIDDATA", "DELR", (ncol,), base_dir)
    delc = read_grid_array(bf, "GRIDDATA", "DELC", (nrow,), base_dir)
    botm = read_grid_array(bf, "GRIDDATA", "BOTTOM", (nrow, ncol),
                           base_dir)
    idom = read_grid_array(bf, "GRIDDATA", "IDOMAIN", (nrow, ncol),
                           base_dir, dtype=np.int64, default=1)
    top = float(np.max(botm)) + 1.0     # nominal; OLF uses botm as land
    grid = DisGrid.create(1, nrow, ncol, delr, delc, top,
                          botm[None, :, :],
                          idomain=np.asarray(idom, np.int64)[None, :, :])
    return grid


def _load_cxs(path, base_dir):
    """CXS6 → (sections list for build_chf/olf cxs_sections=)."""
    bf = BlockFile(path)
    schema.check_options("swf-cxs", bf.options(), path)
    counts = {}
    order = []
    for toks in bf.get("PACKAGEDATA").lines:
        idcxs = int(toks[0])
        counts[idcxs] = int(toks[1])
        order.append(idcxs)
    rows = [(float(t[0]), float(t[1]),
             float(t[2]) if len(t) > 2 else 1.0)
            for t in bf.get("CROSSSECTIONDATA").lines]
    sections = {}
    pos = 0
    for idcxs in order:
        k = counts[idcxs]
        chunk = rows[pos:pos + k]
        pos += k
        sections[idcxs] = (np.asarray([r[0] for r in chunk]),
                           np.asarray([r[1] for r in chunk]),
                           np.asarray([r[2] for r in chunk]))
    # build_chf wants a dense 1-based list
    return [sections[i] for i in sorted(sections)]


def _cellid(toks, start, grid_kind, ncol):
    if grid_kind in ("disv1d", "disv2d"):
        return int(toks[start]) - 1, 1
    row, col = int(toks[start]) - 1, int(toks[start + 1]) - 1
    return row * ncol + col, 2


def _load_disv2d(path, base_dir):
    """DISV2D file (olf-disv2d.dfn + Disv2d.f90): DIMENSIONS NODES/NVERT,
    GRIDDATA bottom/idomain, VERTICES, CELL2D."""
    from ...models.discretization.disv2d import Disv2dGrid

    bf = BlockFile(path)
    schema.check_options("olf-disv2d", bf.options(), path)
    d = bf.dimensions()
    nodes, nvert = d["NODES"], d["NVERT"]
    verts = np.zeros((nvert, 2))
    for toks in bf.get("VERTICES").lines:
        verts[int(toks[0]) - 1] = (float(toks[1]), float(toks[2]))
    cell2d = [None] * nodes
    for toks in bf.get("CELL2D").lines:
        ic = int(toks[0]) - 1
        ncv = int(toks[3])
        ivs = [int(t) - 1 for t in toks[4:4 + ncv]]
        if len(ivs) > 1 and ivs[0] == ivs[-1]:
            ivs = ivs[:-1]
        cell2d[ic] = (float(toks[1]), float(toks[2]), ivs)
    bottom = read_grid_array(bf, "GRIDDATA", "BOTTOM", (nodes,), base_dir)
    idom = read_grid_array(bf, "GRIDDATA", "IDOMAIN", (nodes,), base_dir,
                           dtype=np.int64, default=1)
    return Disv2dGrid.create(verts, cell2d, bottom.reshape(-1),
                             idomain=idom.reshape(1, -1))


def load_swf_model(ws, mfname, mname, mtype):
    """Load one CHF6/OLF6 model file → dict bundle (model, grid, oc,
    transient flags, output paths)."""
    from ...models.swf.model import build_chf, build_olf

    path = os.path.join(ws, mfname)
    base_dir = os.path.dirname(path)
    nam = BlockFile(path)
    comp = "chf-nam" if mtype == "CHF6" else "olf-nam"
    schema.check_options(comp, nam.options(), path)
    pkg_files = {}
    for toks in nam.get("PACKAGES").lines:
        ftype = toks[0].upper()
        pkg_files.setdefault(ftype, []).append(
            os.path.join(base_dir, toks[1]))

    grid_kind = None
    if "DISV1D6" in pkg_files:
        grid, idom = _load_disv1d(pkg_files["DISV1D6"][0], base_dir)
        grid_kind = "disv1d"
        ncol = None
        n = grid.nodes
    elif "DIS2D6" in pkg_files:
        grid = _load_dis2d(pkg_files["DIS2D6"][0], base_dir)
        grid_kind = "dis2d"
        ncol = grid.shape[2]
        n = grid.nodes
    elif "DISV2D6" in pkg_files:
        grid = _load_disv2d(pkg_files["DISV2D6"][0], base_dir)
        grid_kind = "disv2d"
        ncol = None
        n = grid.nodes
    else:
        raise NotImplementedError(
            f"{mname}: SWF needs DISV1D6, DIS2D6, or DISV2D6 (got "
            f"{sorted(pkg_files)})")

    # DFW (required): roughness, cross-section ids, spatial weighting
    dfw = BlockFile(pkg_files["DFW6"][0])
    dfw_opts = dfw.options()
    schema.check_options("swf-dfw", dfw_opts, pkg_files["DFW6"][0])
    shp = (n,) if grid_kind in ("disv1d", "disv2d") \
        else grid.shape[1:]
    manningsn = read_grid_array(dfw, "GRIDDATA", "MANNINGSN", shp,
                                base_dir).reshape(-1)
    idcxs = read_grid_array(dfw, "GRIDDATA", "IDCXS", shp, base_dir,
                            dtype=np.int64, default=0)
    icentral = int("CENTRAL_IN_SPACE" in dfw_opts)
    # Manning unit conversion (swf-dfw.f90 unitconv): lconv^(1/3)/tconv
    lconv = float(dfw_opts.get("LENGTH_CONVERSION", 1.0) or 1.0)
    tconv = float(dfw_opts.get("TIME_CONVERSION", 1.0) or 1.0)
    unitconv = lconv ** (1.0 / 3.0) / tconv if (lconv != 1.0
                                                or tconv != 1.0) else 1.0

    # IC
    strt = None
    if "IC6" in pkg_files:
        ic = BlockFile(pkg_files["IC6"][0])
        schema.check_options("swf-ic", ic.options(), pkg_files["IC6"][0])
        strt = read_grid_array(ic, "GRIDDATA", "STRT", shp,
                               base_dir).reshape(-1)

    # CXS
    cxs_sections = None
    if "CXS6" in pkg_files:
        cxs_sections = _load_cxs(pkg_files["CXS6"][0], base_dir)

    # stress packages (first-period data, advanced_loader convention)
    flw = chd = zdg = None
    if "FLW6" in pkg_files:
        bf = BlockFile(pkg_files["FLW6"][0])
        schema.check_options("swf-flw", bf.options(), pkg_files["FLW6"][0])
        flw = []
        for toks in _only_first_period(_period_blocks(bf), "FLW"):
            node, nt = _cellid(toks, 0, grid_kind, ncol)
            flw.append((node, float(toks[nt])))
    if "CHD6" in pkg_files:
        bf = BlockFile(pkg_files["CHD6"][0])
        schema.check_options("swf-chd", bf.options(), pkg_files["CHD6"][0])
        chd = []
        for toks in _only_first_period(_period_blocks(bf), "CHD"):
            node, nt = _cellid(toks, 0, grid_kind, ncol)
            chd.append((node, float(toks[nt])))
    if "ZDG6" in pkg_files:
        bf = BlockFile(pkg_files["ZDG6"][0])
        schema.check_options("swf-zdg", bf.options(), pkg_files["ZDG6"][0])
        zdg = []
        for toks in _only_first_period(_period_blocks(bf), "ZDG"):
            node, nt = _cellid(toks, 0, grid_kind, ncol)
            if int(toks[nt]) != 0:
                raise NotImplementedError(
                    "ZDG with a CXS section (idcxs>0) not supported yet")
            zdg.append((node, float(toks[nt + 1]), float(toks[nt + 2]),
                        float(toks[nt + 3])))
    pcp = evp = cdb = None
    if "PCP6" in pkg_files:
        bf = BlockFile(pkg_files["PCP6"][0])
        schema.check_options("swf-pcp", bf.options(), pkg_files["PCP6"][0])
        pcp = []
        for toks in _only_first_period(_period_blocks(bf), "PCP"):
            node, nt = _cellid(toks, 0, grid_kind, ncol)
            pcp.append((node, float(toks[nt])))
    if "EVP6" in pkg_files:
        bf = BlockFile(pkg_files["EVP6"][0])
        schema.check_options("swf-evp", bf.options(), pkg_files["EVP6"][0])
        evp = []
        for toks in _only_first_period(_period_blocks(bf), "EVP"):
            node, nt = _cellid(toks, 0, grid_kind, ncol)
            evp.append((node, float(toks[nt])))
    if "CDB6" in pkg_files:
        bf = BlockFile(pkg_files["CDB6"][0])
        schema.check_options("swf-cdb", bf.options(), pkg_files["CDB6"][0])
        cdb = []
        for toks in _only_first_period(_period_blocks(bf), "CDB"):
            node, nt = _cellid(toks, 0, grid_kind, ncol)
            if int(toks[nt]) != 0:
                raise NotImplementedError(
                    "CDB with a CXS section (idcxs>0) not supported yet")
            cdb.append((node, float(toks[nt + 1])))

    # STO: per-period steady-state/transient flags
    sto_periods = {}
    has_sto = "STO6" in pkg_files
    if has_sto:
        bf = BlockFile(pkg_files["STO6"][0])
        schema.check_options("swf-sto", bf.options(), pkg_files["STO6"][0])
        for kper, lines in _period_blocks(bf).items():
            for toks in lines:
                sto_periods[kper] = toks[0].upper() != "STEADY-STATE"

    # OC
    oc = None
    hds_path = os.path.join(ws, f"{mname.lower()}.stage")
    if "OC6" in pkg_files:
        from .loader import load_oc
        dv, _, oc = load_oc(pkg_files["OC6"][0], base_dir,
                            component="swf-oc")
        if dv:
            hds_path = dv

    build = build_chf if mtype == "CHF6" else build_olf
    kw = {}
    if cxs_sections is not None:
        kw["cxs_sections"] = cxs_sections
        kw["idcxs"] = np.asarray(idcxs).reshape(-1)
    model = build(mname.lower(), grid, manningsn=manningsn, strt=strt,
                  unitconv=unitconv, icentral=icentral, flw=flw, chd=chd,
                  zdg=zdg, pcp=pcp, evp=evp, cdb=cdb, **kw)
    return dict(model=model, grid=grid, grid_kind=grid_kind, oc=oc,
                sto_periods=sto_periods, has_sto=has_sto,
                hds_path=hds_path, name=mname)
