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
