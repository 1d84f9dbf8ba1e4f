"""NetCDF export/input (NCModel.f90 / Idm netcdf roles, classic
NetCDF-3 via scipy)."""

import os

import numpy as np

from modflow6_tpu.utils.mf6io import load_simulation
from test_obs_tas_decks import _base_deck, write


def test_netcdf_structured_export(tmp_path):
    """NETCDF_STRUCTURED FILEOUT: saved heads land on (time,z,y,x) and
    read back equal to the run's head records."""
    ws = str(tmp_path)
    _base_deck(ws)
    # add the export option to the model nam
    write(ws, "model.nam", """
BEGIN OPTIONS
  NETCDF_STRUCTURED FILEOUT model.nc
END OPTIONS
BEGIN PACKAGES
  DIS6 model.dis
  IC6 model.ic
  NPF6 model.npf
  STO6 model.sto
  CHD6 model.chd
  OC6 model.oc
END PACKAGES
""")
    write(ws, "model.oc", """
BEGIN OPTIONS
  HEAD FILEOUT model.hds
END OPTIONS
BEGIN PERIOD 1
  SAVE HEAD ALL
END PERIOD
""")
    sim = load_simulation(ws)
    recs = sim.run()
    assert all(r.converged for r in recs)
    from modflow6_tpu.utils.netcdf import read_netcdf_structured
    times, vals = read_netcdf_structured(os.path.join(ws, "model.nc"))
    assert vals.shape == (len(recs), 1, 1, 5)
    np.testing.assert_allclose(times, [r.totim for r in recs])
    np.testing.assert_allclose(vals[-1].reshape(-1), recs[-1].head,
                               rtol=1e-12)


def test_netcdf_griddata_input(tmp_path):
    """GRIDDATA arrays tagged NETCDF read from the model's NETCDF FILEIN
    file, variables named <pkg>_<var> (Idm/netcdf role)."""
    from scipy.io import netcdf_file

    ws = str(tmp_path)
    _base_deck(ws)
    k_arr = np.array([1.0, 2.0, 4.0, 8.0, 16.0])
    strt_arr = np.array([10.0, 10.5, 11.0, 11.5, 12.0])
    f = netcdf_file(os.path.join(ws, "in.nc"), "w")
    f.createDimension("ncol", 5)
    v = f.createVariable("npf_k", "d", ("ncol",))
    v[:] = k_arr
    v = f.createVariable("ic_strt", "d", ("ncol",))
    v[:] = strt_arr
    f.close()
    write(ws, "model.nam", """
BEGIN OPTIONS
  NETCDF FILEIN in.nc
END OPTIONS
BEGIN PACKAGES
  DIS6 model.dis
  IC6 model.ic
  NPF6 model.npf
  STO6 model.sto
  CHD6 model.chd
END PACKAGES
""")
    write(ws, "model.ic", """
BEGIN OPTIONS
END OPTIONS
BEGIN GRIDDATA
  STRT NETCDF
END GRIDDATA
""")
    write(ws, "model.npf", """
BEGIN OPTIONS
END OPTIONS
BEGIN GRIDDATA
  ICELLTYPE
    CONSTANT 0
  K NETCDF
END GRIDDATA
""")
    sim = load_simulation(ws)
    np.testing.assert_allclose(
        np.asarray(sim.model.npf_arrays.k11).reshape(-1), k_arr)
    np.testing.assert_allclose(np.asarray(sim.model.strt).reshape(-1),
                               strt_arr)
    recs = sim.run()
    assert all(r.converged for r in recs)


def test_disv_ugrid_mesh_export(tmp_path):
    """DISV export carries UGRID mesh topology (MeshNCModel/DisvNCMesh
    role): mesh_topology variable, node coordinates, face-node
    connectivity, per-layer face variables."""
    from modflow6_tpu.models.discretization.disv import DisvGrid
    from modflow6_tpu.utils.netcdf import NetcdfExporter
    from scipy.io import netcdf_file

    verts = [(0, 0), (1, 0), (2, 0), (0, 1), (1, 1), (2, 1)]
    cells = [(0.5, 0.5, [0, 1, 4, 3]), (1.5, 0.5, [1, 2, 5, 4])]
    g = DisvGrid.create(2, 2, np.asarray(verts, float), cells,
                        top=2.0, botm=np.asarray([[1.0, 1.0],
                                                  [0.0, 0.0]]))
    path = str(tmp_path / "m.nc")
    ex = NetcdfExporter(path, g)
    ex.record(1.0, np.asarray([1.0, 2.0, 3.0, 4.0]))
    ex.record(2.0, np.asarray([5.0, 6.0, 7.0, 8.0]))
    ex.close()
    f = netcdf_file(path, "r", mmap=False)
    try:
        mesh = f.variables["mesh"]
        assert mesh.cf_role == b"mesh_topology"
        conn = np.array(f.variables["mesh_face_nodes"][:])
        np.testing.assert_array_equal(conn[0], [0, 1, 4, 3])
        h1 = np.array(f.variables["head_l1"][:])
        h2 = np.array(f.variables["head_l2"][:])
        np.testing.assert_allclose(h1[1], [5.0, 6.0])
        np.testing.assert_allclose(h2[0], [3.0, 4.0])
        assert f.variables["head_l1"].mesh == b"mesh"
    finally:
        f.close()
