"""NetCDF export/input (classic NetCDF-3 via scipy.io).

Behavioral parity targets:
- src/Utilities/Export/NCModel.f90 + DisNCStructured.f90 (5,067 LoC):
  the NETCDF_STRUCTURED FILEOUT model-nam option exports the dependent
  variable per saved step on (time, z, y, x) with CF-style coordinates;
  DISV models export over a flattened face dimension (the mesh export
  role of MeshDisModel).
- src/Idm/netcdf/ (1,281 LoC): griddata arrays tagged NETCDF read from
  the model's NETCDF FILEIN file, variables named <package>_<variable>
  (e.g. ``npf_k``, ``ic_strt``).

The reference writes NetCDF-4 through the netcdf-fortran library; this
environment carries scipy's classic NetCDF-3 writer, which xarray/scipy
read identically for these layouts — the format major version is the
only divergence (documented here rather than hidden).
"""

from __future__ import annotations

import numpy as np


class NetcdfExporter:
    """Accumulates per-step dependent-variable arrays and writes one
    classic-NetCDF file at close (NCModel export role)."""

    def __init__(self, path, grid, varname="head"):
        self.path = path
        self.grid = grid
        self.varname = varname
        self.times = []
        self.arrays = []

    def record(self, totim, values):
        self.times.append(float(totim))
        self.arrays.append(np.asarray(values, np.float64).reshape(-1))

    def close(self):
        from scipy.io import netcdf_file

        g = self.grid
        f = netcdf_file(self.path, "w")
        try:
            f.history = "modflow6-tpu structured export"
            nt = len(self.times)
            f.createDimension("time", nt)
            tv = f.createVariable("time", "d", ("time",))
            tv[:] = np.asarray(self.times)
            tv.units = "time"
            shp = g.shape
            if len(shp) == 3:
                nlay, nrow, ncol = shp
                f.createDimension("z", nlay)
                f.createDimension("y", nrow)
                f.createDimension("x", ncol)
                xs = np.concatenate([[0.0], np.cumsum(
                    np.asarray(g.delr, float))])
                ys = np.concatenate([[0.0], np.cumsum(
                    np.asarray(g.delc, float))])
                xv = f.createVariable("x", "d", ("x",))
                xv[:] = 0.5 * (xs[:-1] + xs[1:])
                yv = f.createVariable("y", "d", ("y",))
                ytot = ys[-1]
                yv[:] = ytot - 0.5 * (ys[:-1] + ys[1:])
                bv = f.createVariable("botm", "d", ("z", "y", "x"))
                bv[:] = np.asarray(g.bot, float).reshape(shp)
                iv = f.createVariable("idomain", "i", ("z", "y", "x"))
                iv[:] = np.asarray(g.idomain, np.int32).reshape(shp)
                hv = f.createVariable(self.varname, "d",
                                      ("time", "z", "y", "x"))
                for i, a in enumerate(self.arrays):
                    hv[i] = a.reshape(shp)
            elif getattr(g, "cell_verts", None) is not None:
                # DISV: UGRID 2-D layered-mesh topology
                # (MeshNCModel.f90 + DisvNCMesh role: mesh_topology var,
                # node coordinates, face_node_connectivity, one variable
                # per layer attached to the mesh faces)
                verts = np.asarray(g.vertices, float)
                ncpl = g.ncpl
                nlay = shp[0]
                maxnv = max(len(cv) for cv in g.cell_verts)
                f.createDimension("nmesh_node", verts.shape[0])
                f.createDimension("nmesh_face", ncpl)
                f.createDimension("max_nmesh_face_nodes", maxnv)
                f.createDimension("nlay", nlay)
                mesh = f.createVariable("mesh", "i", ())
                mesh.cf_role = "mesh_topology"
                mesh.topology_dimension = 2
                mesh.node_coordinates = "mesh_node_x mesh_node_y"
                mesh.face_node_connectivity = "mesh_face_nodes"
                nx = f.createVariable("mesh_node_x", "d", ("nmesh_node",))
                nx[:] = verts[:, 0]
                ny = f.createVariable("mesh_node_y", "d", ("nmesh_node",))
                ny[:] = verts[:, 1]
                fn = f.createVariable(
                    "mesh_face_nodes", "i",
                    ("nmesh_face", "max_nmesh_face_nodes"))
                conn = np.full((ncpl, maxnv), -1, np.int32)
                for c, cv in enumerate(g.cell_verts):
                    conn[c, :len(cv)] = np.asarray(cv)
                fn[:] = conn
                fn._FillValue = -1
                fn.start_index = 0
                bv = f.createVariable("botm", "d", ("nlay", "nmesh_face"))
                bv[:] = np.asarray(g.bot, float).reshape(nlay, ncpl)
                hv = None
                for k in range(nlay):
                    lv = f.createVariable(f"{self.varname}_l{k + 1}", "d",
                                          ("time", "nmesh_face"))
                    lv.mesh = "mesh"
                    lv.location = "face"
                    lv.long_name = f"{self.varname} layer {k + 1}"
                    for i, a in enumerate(self.arrays):
                        lv[i] = a.reshape(nlay, ncpl)[k]
                    hv = lv
            else:
                # DISU: flattened cell dimension (mesh export role)
                n = int(np.prod(shp))
                f.createDimension("ncells", n)
                bv = f.createVariable("botm", "d", ("ncells",))
                bv[:] = np.asarray(g.bot, float).reshape(-1)
                hv = f.createVariable(self.varname, "d",
                                      ("time", "ncells"))
                for i, a in enumerate(self.arrays):
                    hv[i] = a
            hv.long_name = self.varname
        finally:
            f.close()


def read_netcdf_array(path, varname):
    """Read one variable from a NetCDF input file (Idm/netcdf role:
    griddata arrays tagged NETCDF, variables named <pkg>_<var>)."""
    from scipy.io import netcdf_file

    f = netcdf_file(path, "r", mmap=False)
    try:
        names = {k.lower(): k for k in f.variables}
        key = names.get(varname.lower())
        if key is None:
            raise KeyError(
                f"{path}: no variable {varname!r} (has {sorted(names)})")
        return np.array(f.variables[key][:], np.float64)
    finally:
        f.close()


def read_netcdf_structured(path, varname="head"):
    """Read back a structured export → (times, values[nt, ...])."""
    from scipy.io import netcdf_file

    f = netcdf_file(path, "r", mmap=False)
    try:
        times = np.array(f.variables["time"][:], float)
        vals = np.array(f.variables[varname][:], float)
        return times, vals
    finally:
        f.close()
