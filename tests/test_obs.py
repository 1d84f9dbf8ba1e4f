"""OBS continuous-observation tests (reference Obs.f90 csv output role)."""

import numpy as np

from modflow6_tpu.models.discretization import DisGrid
from modflow6_tpu.models.gwf.builder import build_gwf
from modflow6_tpu.models.simulation import Simulation
from modflow6_tpu.solution import ImsSettings
from modflow6_tpu.timing.tdis import StressPeriod, Tdis
from modflow6_tpu.utils.obs import ObsManager, ObsRecord


def test_obs_csv_matches_step_records(tmp_path):
    n = 10
    g = DisGrid.create(1, 1, n, 10.0, 10.0, 10.0, np.zeros((1, 1, n)))
    gwf = build_gwf("m", g, k=4.0, strt=6.0,
                    storage={"ss": 1e-4, "iconvert": 0},
                    chd=[(0, 8.0), (n - 1, 5.0)])
    obs_path = tmp_path / "heads.obs.csv"
    obs = ObsManager([ObsRecord("h3", "head", 3),
                      ObsRecord("dd7", "drawdown", 7)], str(obs_path))
    sim = Simulation(Tdis([StressPeriod(30.0, 3, 1.0)]), gwf, ImsSettings(),
                     obs=obs)
    recs = sim.run()
    lines = obs_path.read_text().strip().splitlines()
    assert lines[0] == "time,h3,dd7"
    assert len(lines) == 1 + len(recs)
    for line, rec in zip(lines[1:], recs):
        t, h3, dd7 = map(float, line.split(","))
        np.testing.assert_allclose(t, rec.totim, rtol=1e-9)
        np.testing.assert_allclose(h3, rec.head[3], rtol=1e-9)
        np.testing.assert_allclose(dd7, 6.0 - rec.head[7], rtol=1e-9,
                                   atol=1e-12)
