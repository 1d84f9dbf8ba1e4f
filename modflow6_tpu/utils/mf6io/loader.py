"""Load a full MF6 simulation from an mfsim.nam workspace.

Behavioral parity target: the reference's IDM load + SimulationCreate path
(src/Utilities/Idm/IdmLoad.f90 simnam_load/simtdis_load/load_models,
src/SimulationCreate.f90:200-729): parse mfsim.nam, TDIS, IMS, the model
nam file and its packages, and assemble a runnable Simulation.

Round-1 scope: one GWF model, DIS grid, packages
DIS/NPF/IC/STO/CHD/WEL/DRN/RIV/GHB/RCH/EVT/OC (list-based input,
stress-period blocks with MF6 persistence semantics).
"""

from __future__ import annotations

import os

import numpy as np

from ...models.discretization import DisGrid
from ...models.gwf import builder
from ...models.gwf.model import PackageData
from ...models.simulation import Simulation
from ...solution.ims import ImsSettings
from ...timing.tdis import StressPeriod, Tdis
from .arrays import read_grid_array
from .reader import BlockFile


def _f(tok):
    return float(tok)


def load_tdis(path):
    bf = BlockFile(path)
    dims = bf.dimensions()
    nper = dims.get("NPER", 1)
    b = bf.get("PERIODDATA")
    periods = []
    for toks in b.lines[:nper]:
        periods.append(StressPeriod(float(toks[0]), int(toks[1]),
                                    float(toks[2])))
    opts = bf.options()
    return Tdis(tuple(periods),
                time_units=str(opts.get("TIME_UNITS", "UNKNOWN")),
                start_date_time=str(opts.get("START_DATE_TIME", "")))


def load_ims(path) -> ImsSettings:
    bf = BlockFile(path)
    opts = bf.options()
    complexity = opts.get("COMPLEXITY", "SIMPLE")
    if isinstance(complexity, bool):
        complexity = "SIMPLE"
    s = ImsSettings.from_complexity(str(complexity))

    nl = bf.get("NONLINEAR")
    if nl is not None:
        kv = {t[0].upper(): t[1:] for t in nl.lines}
        if "OUTER_DVCLOSE" in kv:
            s.outer_dvclose = _f(kv["OUTER_DVCLOSE"][0])
        if "OUTER_HCLOSE" in kv:  # deprecated alias
            s.outer_dvclose = _f(kv["OUTER_HCLOSE"][0])
        if "OUTER_MAXIMUM" in kv:
            s.outer_maximum = int(kv["OUTER_MAXIMUM"][0])
        if "UNDER_RELAXATION" in kv:
            ur = kv["UNDER_RELAXATION"][0].upper()
            s.under_relaxation = {"NONE": "none", "SIMPLE": "simple",
                                  "COOLEY": "cooley", "DBD": "dbd"}[ur]
        if "UNDER_RELAXATION_GAMMA" in kv:
            s.gamma = _f(kv["UNDER_RELAXATION_GAMMA"][0])
        if "UNDER_RELAXATION_THETA" in kv:
            s.theta = _f(kv["UNDER_RELAXATION_THETA"][0])
        if "UNDER_RELAXATION_KAPPA" in kv:
            s.akappa = _f(kv["UNDER_RELAXATION_KAPPA"][0])
        if "UNDER_RELAXATION_MOMENTUM" in kv:
            s.amomentum = _f(kv["UNDER_RELAXATION_MOMENTUM"][0])
        if "BACKTRACKING_NUMBER" in kv:
            s.backtracking_number = int(kv["BACKTRACKING_NUMBER"][0])
        if "BACKTRACKING_TOLERANCE" in kv:
            s.backtracking_tolerance = _f(kv["BACKTRACKING_TOLERANCE"][0])
        if "BACKTRACKING_REDUCTION_FACTOR" in kv:
            s.backtracking_reduction_factor = _f(
                kv["BACKTRACKING_REDUCTION_FACTOR"][0])
        if "BACKTRACKING_RESIDUAL_LIMIT" in kv:
            s.backtracking_residual_limit = _f(
                kv["BACKTRACKING_RESIDUAL_LIMIT"][0])

    lin = bf.get("LINEAR")
    if lin is not None:
        kv = {t[0].upper(): t[1:] for t in lin.lines}
        if "INNER_MAXIMUM" in kv:
            s.inner_maximum = int(kv["INNER_MAXIMUM"][0])
        if "INNER_DVCLOSE" in kv:
            s.inner_dvclose = _f(kv["INNER_DVCLOSE"][0])
        if "INNER_HCLOSE" in kv:
            s.inner_dvclose = _f(kv["INNER_HCLOSE"][0])
        if "INNER_RCLOSE" in kv:
            s.inner_rclose = _f(kv["INNER_RCLOSE"][0])
            if len(kv["INNER_RCLOSE"]) > 1:
                opt = kv["INNER_RCLOSE"][1].upper()
                s.icnvgopt = {"STRICT": 1, "L2NORM_RHS": 2,
                              "RELATIVE_RCLOSE": 3,
                              "L2NORM_RELATIVE_RCLOSE": 4}.get(opt, 0)
        if "LINEAR_ACCELERATION" in kv:
            acc = kv["LINEAR_ACCELERATION"][0].upper()
            s.linear_acceleration = "cg" if acc == "CG" else "bicgstab"
        if "RELAXATION_FACTOR" in kv:
            s.relaxation_factor = _f(kv["RELAXATION_FACTOR"][0])
            if s.relaxation_factor != 0.0:
                # the reference uses this as the MILU(0)/MILUT relax in its
                # ILU factorization (ImsLinearBase.f90 ims_base_pcu); the
                # TPU build preconditions with Jacobi/Chebyshev polynomials
                # instead, where no such knob exists.  Warn loudly rather
                # than silently diverge from deck intent.
                import warnings
                warnings.warn(
                    "IMS RELAXATION_FACTOR applies to the reference's ILU "
                    "preconditioner; the TPU build uses polynomial "
                    "preconditioning and ignores it (iteration counts may "
                    "differ, results do not)", stacklevel=2)
        if "NUMBER_ORTHOGONALIZATIONS" in kv:
            s.north = int(kv["NUMBER_ORTHOGONALIZATIONS"][0])
        if "PRECONDITIONER_LEVELS" in kv or "PRECONDITIONER_DROP_TOLERANCE" in kv:
            import warnings
            warnings.warn(
                "IMS PRECONDITIONER_LEVELS/DROP_TOLERANCE configure the "
                "reference's ILUT; the TPU build maps them to a Chebyshev "
                "polynomial preconditioner of matching cost", stacklevel=2)
            s.preconditioner = "chebyshev"
            s.preconditioner_order = 4

    # NO_PTC lives in the OPTIONS block (sln-ims.dfn:134-156)
    no_ptc = opts.get("NO_PTC")
    if no_ptc is not None:
        val = str(no_ptc).upper()
        s.no_ptc = "first" if val == "FIRST" else "all"
    return s


def load_dis(path) -> DisGrid:
    bf = BlockFile(path)
    base = os.path.dirname(path)
    d = bf.dimensions()
    nlay, nrow, ncol = d["NLAY"], d["NROW"], d["NCOL"]
    delr = read_grid_array(bf, "GRIDDATA", "DELR", (ncol,), base)
    delc = read_grid_array(bf, "GRIDDATA", "DELC", (nrow,), base)
    top = read_grid_array(bf, "GRIDDATA", "TOP", (nrow, ncol), base)
    botm = read_grid_array(bf, "GRIDDATA", "BOTM", (nlay, nrow, ncol), base)
    idomain = read_grid_array(bf, "GRIDDATA", "IDOMAIN", (nlay, nrow, ncol),
                              base, dtype=np.int64, default=1)
    opts = bf.options()
    return DisGrid.create(nlay, nrow, ncol, delr, delc, top, botm, idomain,
                          xorigin=float(opts.get("XORIGIN", 0.0)),
                          yorigin=float(opts.get("YORIGIN", 0.0)),
                          angrot=float(opts.get("ANGROT", 0.0)))


def _cellid_to_node(toks, grid, start=0):
    """Parse a cellid (1-based) → 0-based node; returns (node, ntok)."""
    if isinstance(grid, DisGrid):
        k, i, j = (int(toks[start]) - 1, int(toks[start + 1]) - 1,
                   int(toks[start + 2]) - 1)
        return int(grid.node_number(k, i, j)), 3
    if hasattr(grid, "ncpl"):
        k, c = int(toks[start]) - 1, int(toks[start + 1]) - 1
        return k * grid.ncpl + c, 2
    return int(toks[start]) - 1, 1


def _load_period_lists(path, grid, ncols, colnames):
    """Read a list-based stress package file.

    Returns (options, dimensions, {kper: [(node, v1, v2, ...)]}).
    """
    bf = BlockFile(path)
    opts = bf.options()
    dims = bf.dimensions()
    periods = {}
    for b in bf.get_all("PERIOD"):
        entries = []
        for toks in bf.expand_open_close(b):
            node, ntok = _cellid_to_node(toks, grid)
            vals = [float(t) for t in toks[ntok:ntok + ncols]]
            entries.append((node, *vals))
        periods[b.index] = entries
    return opts, dims, periods


_LIST_PACKAGES = {
    "CHD6": ("chd", 1, builder.chd_data),
    "WEL6": ("wel", 1, builder.wel_data),
    "DRN6": ("drn", 2, builder.drn_data),
    "RIV6": ("riv", 3, builder.riv_data),
    "GHB6": ("ghb", 2, builder.ghb_data),
    "RCH6": ("rch", 1, builder.rch_data),
    "EVT6": ("evt", 3, builder.evt_data),
}


def load_simulation(workspace, hds_path=None, cbc_path=None, lst_path=None):
    """Load mfsim.nam and everything it references → Simulation."""
    ws = os.path.abspath(workspace)
    sim = BlockFile(os.path.join(ws, "mfsim.nam"))

    # timing
    timing = sim.get("TIMING")
    tdis = load_tdis(os.path.join(ws, timing.lines[0][1]))

    # models (round-1: exactly one GWF)
    models_blk = sim.get("MODELS")
    assert models_blk is not None and len(models_blk.lines) >= 1
    mtype, mfname = models_blk.lines[0][0].upper(), models_blk.lines[0][1]
    mname = (models_blk.lines[0][2] if len(models_blk.lines[0]) > 2
             else "MODEL1")
    assert mtype == "GWF6", f"round-1 loader supports GWF6 models, got {mtype}"
    if len(models_blk.lines) > 1:
        raise NotImplementedError("multi-model simulations not yet loadable")

    # solution group → ims settings
    settings = ImsSettings()
    for sg in sim.get_all("SOLUTIONGROUP"):
        for toks in sg.lines:
            if toks[0].upper() in ("IMS6", "SLN"):
                if toks[0].upper() == "IMS6":
                    settings = load_ims(os.path.join(ws, toks[1]))

    # model nam file
    mnam = BlockFile(os.path.join(ws, mfname))
    mdir = os.path.dirname(os.path.join(ws, mfname))
    newton = False
    under_relax_newton = False
    mopts = mnam.options()
    if "NEWTON" in mopts:
        newton = True
        v = mopts["NEWTON"]
        if v is not True and "UNDER_RELAXATION" in [
                str(x).upper() for x in (v if isinstance(v, list) else [v])]:
            under_relax_newton = True

    pkg_files = {}
    for toks in mnam.get("PACKAGES").lines:
        ftype = toks[0].upper()
        pkg_files.setdefault(ftype, []).append(os.path.join(mdir, toks[1]))

    # --- required: DIS + IC + NPF
    if "DIS6" not in pkg_files:
        raise NotImplementedError("loader currently requires a DIS6 package")
    grid = load_dis(pkg_files["DIS6"][0])
    N = grid.nodes
    shp = grid.shape
    base = mdir

    ic_bf = BlockFile(pkg_files["IC6"][0])
    strt = read_grid_array(ic_bf, "GRIDDATA", "STRT", shp, base, default=0.0)

    npf_bf = BlockFile(pkg_files["NPF6"][0])
    nopts = npf_bf.options()
    icellavg = 0
    if "ALTERNATIVE_CELL_AVERAGING" in nopts:
        icellavg = {"LOGARITHMIC": 1, "AMT-LMK": 2, "AMT-HMK": 3}[
            str(nopts["ALTERNATIVE_CELL_AVERAGING"]).upper()]
    icelltype = read_grid_array(npf_bf, "GRIDDATA", "ICELLTYPE", shp, base,
                                dtype=np.int64, default=0)
    k = read_grid_array(npf_bf, "GRIDDATA", "K", shp, base, default=1.0)
    k22 = read_grid_array(npf_bf, "GRIDDATA", "K22", shp, base)
    k33 = read_grid_array(npf_bf, "GRIDDATA", "K33", shp, base)
    if k33 is not None and "K33OVERK" in nopts:
        k33 = k33 * k
    if k22 is not None and "K22OVERK" in nopts:
        k22 = k22 * k

    storage = None
    sto_periods = {}
    if "STO6" in pkg_files:
        sto_bf = BlockFile(pkg_files["STO6"][0])
        sopts = sto_bf.options()
        storage = dict(
            iconvert=read_grid_array(sto_bf, "GRIDDATA", "ICONVERT", shp,
                                     base, dtype=np.int64, default=0).reshape(-1),
            ss=read_grid_array(sto_bf, "GRIDDATA", "SS", shp, base,
                               default=0.0).reshape(-1),
            sy=read_grid_array(sto_bf, "GRIDDATA", "SY", shp, base,
                               default=0.0).reshape(-1),
            istor_coef=1 if "STORAGECOEFFICIENT" in sopts else 0,
            iconf_ss=1 if "SS_CONFINED_ONLY" in sopts else 0)
        for b in sto_bf.get_all("PERIOD"):
            kw = b.lines[0][0].upper() if b.lines else "TRANSIENT"
            sto_periods[b.index] = (kw == "TRANSIENT")

    # --- stress packages with period data
    pkg_periods = {}   # attr -> {kper: entries}
    pkg_opts = {}
    for ftype, (attr, ncols, mk) in _LIST_PACKAGES.items():
        if ftype not in pkg_files:
            continue
        all_periods = {}
        for path in pkg_files[ftype]:   # multiple instances merge
            opts, dims, periods = _load_period_lists(path, grid, ncols, None)
            pkg_opts[attr] = opts
            for kper, entries in periods.items():
                all_periods.setdefault(kper, []).extend(entries)
        pkg_periods[attr] = all_periods

    # maxbound across periods per package (static shapes)
    first_pkgs = {}
    maxbound = {}
    for attr, periods in pkg_periods.items():
        mb = max((len(v) for v in periods.values()), default=1)
        maxbound[attr] = mb
        mk = {a: f for _, (a, _, f) in _LIST_PACKAGES.items()}[attr]
        # period-1 state: empty (all-masked) unless the package defines
        # PERIOD 1 — later periods activate via period_data
        first_pkgs[attr] = mk(periods.get(1, []), maxbound=mb)

    wel_afr = None
    if "wel" in pkg_opts and "AUTO_FLOW_REDUCE" in pkg_opts["wel"]:
        wel_afr = float(pkg_opts["wel"]["AUTO_FLOW_REDUCE"])

    model = builder.build_gwf(
        mname, grid,
        icelltype=icelltype.reshape(-1), k=k.reshape(-1),
        k22=k22.reshape(-1) if k22 is not None else None,
        k33=k33.reshape(-1) if k33 is not None else None,
        strt=strt.reshape(-1), newton=newton,
        icellavg=icellavg,
        ivarcv=1 if "VARIABLECV" in nopts else 0,
        idewatcv=1 if (isinstance(nopts.get("VARIABLECV"), (list, str))
                       and "DEWATERED" in str(nopts["VARIABLECV"]).upper())
        else 0,
        iperched=1 if "PERCHED" in nopts else 0,
        thickstrt="THICKSTRT" in nopts,
        storage=storage,
        wel_auto_flow_reduce=wel_afr,
        **{a: None for a in ()})

    # attach first-period package data
    for attr, data in first_pkgs.items():
        setattr(model, attr, data)

    # transient flags per period (default: previous persists; initial
    # default steady if STO absent, first STO period setting otherwise)
    transient = []
    cur = storage is not None
    if sto_periods:
        cur = sto_periods.get(min(sto_periods), cur)
    for kper in range(1, tdis.nper + 1):
        if kper in sto_periods:
            cur = sto_periods[kper]
        transient.append(cur)

    # --- OC output files
    if "OC6" in pkg_files:
        oc_bf = BlockFile(pkg_files["OC6"][0])
        oopts = oc_bf.options()
        def _fileout(key):
            v = oopts.get(key)
            if isinstance(v, list) and v[0].upper() == "FILEOUT":
                return os.path.join(mdir, v[1])
            return None
        hds_path = hds_path or _fileout("HEAD")
        cbc_path = cbc_path or _fileout("BUDGET")

    simulation = Simulation(tdis, model, settings, transient=transient,
                            hds_path=hds_path, cbc_path=cbc_path,
                            lst_path=lst_path)

    # per-period package data with MF6 persistence semantics
    all_kpers = sorted({kp for periods in pkg_periods.values()
                        for kp in periods})
    if all_kpers:
        current = dict(first_pkgs)
        for kper in all_kpers:
            for attr, periods in pkg_periods.items():
                if kper in periods:
                    mk = {a: f for _, (a, _, f) in _LIST_PACKAGES.items()}[attr]
                    current[attr] = mk(periods[kper], maxbound=maxbound[attr])
            simulation.period_data[kper] = PackageData(**{
                a: current.get(a) for a in
                ("chd", "wel", "rch", "drn", "riv", "ghb", "evt")})
    return simulation
