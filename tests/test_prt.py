"""PRT particle-tracking tests (role of reference autotest test_prt_* +
the MethodCellPollock semantics).

Oracles: closed-form trajectories on uniform and linearly-varying velocity
fields (Pollock's method is exact there).
"""

import numpy as np

import jax.numpy as jnp

from modflow6_tpu.models.discretization import DisGrid
from modflow6_tpu.models.gwf.builder import build_gwf
from modflow6_tpu.models.prt import tracking
from modflow6_tpu.models.prt.model import PrtModel, ReleasePoints
from modflow6_tpu.solution import ImsSettings, NumericalSolution


def solve_flow(g, gwf):
    sol = NumericalSolution(gwf, ImsSettings(
        outer_dvclose=1e-10, outer_maximum=50, inner_dvclose=1e-12,
        inner_rclose=1e-10, inner_maximum=2000))
    head, info, aux = sol.solve_timestep(gwf.strt, 1.0, iss=True)
    assert info.converged
    return head, aux


def make_uniform_x(ncol=20, nrow=1, q=0.5, theta=0.25):
    g = DisGrid.create(1, nrow, ncol, 1.0, 1.0, 1.0,
                       np.zeros((1, nrow, ncol)))
    k = 10.0
    dh = q * (ncol - 1) / k
    chd = [(r * ncol, 10.0 + dh) for r in range(nrow)] \
        + [(r * ncol + ncol - 1, 10.0) for r in range(nrow)]
    gwf = build_gwf("f", g, k=k, strt=10.0, chd=chd)
    return g, gwf, q / theta


def test_uniform_flow_exact_position():
    theta = 0.25
    g, gwf, v = make_uniform_x(theta=theta)
    head, aux = solve_flow(g, gwf)
    prt = PrtModel("p", g, np.full(g.nodes, theta),
                   ReleasePoints(x=np.array([2.5]), y=np.array([0.5]),
                                 z=np.array([0.5])))
    step = prt.make_step(gwf)
    x, y, z, lay, row, col = prt.initial_state()
    t = 4.0
    out = step(head, aux["ibound"], aux["cond"], x, y, z, lay, row, col, t)
    np.testing.assert_allclose(np.asarray(out["x"]), 2.5 + v * t, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out["y"]), 0.5, atol=1e-12)
    assert int(out["status"][0]) == tracking.TERM_TIMEOUT
    np.testing.assert_allclose(np.asarray(out["time"]), t, rtol=1e-12)


def test_travel_time_to_boundary():
    theta = 0.25
    ncol = 20
    g, gwf, v = make_uniform_x(ncol=ncol, theta=theta)
    head, aux = solve_flow(g, gwf)
    prt = PrtModel("p", g, np.full(g.nodes, theta),
                   ReleasePoints(x=np.array([0.5]), y=np.array([0.5]),
                                 z=np.array([0.5])))
    step = prt.make_step(gwf)
    state = prt.initial_state()
    out = step(head, aux["ibound"], aux["cond"], *state, 1e9)
    # Pollock semantics: in the west CHD (source) cell the velocity ramps
    # from 0 at the west face to v at the east face (A = v/dx), so the exit
    # time from x=0.5 is ln(2)/(v/dx*... ) = ln(2)/2 here; the east CHD
    # column is a sink cell (outflow leaves via the BC, not a face) so the
    # particle terminates on entry
    t_cell0 = np.log(2.0) / (v / 1.0)     # vp = v/2 at x=0.5 → ln(2)/A
    np.testing.assert_allclose(np.asarray(out["time"]),
                               t_cell0 + (ncol - 2) / v, rtol=1e-10)
    assert int(out["status"][0]) == tracking.TERM_WEAK
    np.testing.assert_allclose(np.asarray(out["x"]), ncol - 1, rtol=1e-12)


def test_swarm_many_particles_vectorized():
    theta = 0.3
    g, gwf, v = make_uniform_x(ncol=40, nrow=5, theta=theta)
    head, aux = solve_flow(g, gwf)
    npart = 256
    rng = np.random.default_rng(7)
    x0 = rng.uniform(1.5, 5.0, npart)  # clear of the source-cell velocity ramp
    y0 = rng.uniform(0.1, 4.9, npart)
    prt = PrtModel("p", g, np.full(g.nodes, theta),
                   ReleasePoints(x=x0, y=y0, z=np.full(npart, 0.5)))
    step = prt.make_step(gwf)
    state = prt.initial_state()
    t = 3.0
    out = step(head, aux["ibound"], aux["cond"], *state, t)
    np.testing.assert_allclose(np.asarray(out["x"]), x0 + v * t, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(out["y"]), y0, atol=1e-9)


def test_pollock_exit_time_linear_field():
    """Cell with differing face velocities: exact exponential exit time
    t = ln(v2/v1)/A for a particle starting at the inflow face."""
    # build directly on CellFlows to control the face flows
    g = DisGrid.create(1, 1, 1, 2.0, 1.0, 1.0, np.zeros((1, 1, 1)))
    flows = tracking.CellFlows(
        qleft=jnp.full((1, 1, 1), 0.1), qright=jnp.full((1, 1, 1), 0.4),
        qfront=jnp.zeros((1, 1, 1)), qback=jnp.zeros((1, 1, 1)),
        qtop=jnp.zeros((1, 1, 1)), qbot=jnp.zeros((1, 1, 1)),
        porosity=jnp.full((1, 1, 1), 1.0), sat=jnp.ones((1, 1, 1)),
        active_cell=jnp.ones((1, 1, 1), bool), shape=(1, 1, 1),
        delr=(2.0,), delc=(1.0,))
    track = tracking.make_tracker(flows)
    top3 = jnp.ones((1, 1, 1))
    bot3 = jnp.zeros((1, 1, 1))
    out = track(jnp.array([0.0]), jnp.array([0.5]), jnp.array([0.5]),
                jnp.array([0], jnp.int32), jnp.array([0], jnp.int32),
                jnp.array([0], jnp.int32), top3, bot3, 1e9)
    # v1=0.1, v2=0.4 (area=1), dx=2 → A=0.15, t_exit = ln(4)/0.15
    np.testing.assert_allclose(np.asarray(out["time"]),
                               np.log(4.0) / 0.15, rtol=1e-12)
    assert int(out["status"][0]) == tracking.TERM_BOUNDARY


def test_weak_sink_termination():
    """All faces inflowing (a sink cell): particle terminates in place."""
    flows = tracking.CellFlows(
        qleft=jnp.full((1, 1, 1), 0.2), qright=jnp.full((1, 1, 1), -0.2),
        qfront=jnp.full((1, 1, 1), 0.1), qback=jnp.full((1, 1, 1), -0.1),
        qtop=jnp.zeros((1, 1, 1)), qbot=jnp.zeros((1, 1, 1)),
        porosity=jnp.full((1, 1, 1), 1.0), sat=jnp.ones((1, 1, 1)),
        active_cell=jnp.ones((1, 1, 1), bool), shape=(1, 1, 1),
        delr=(1.0,), delc=(1.0,))
    track = tracking.make_tracker(flows)
    out = track(jnp.array([0.3]), jnp.array([0.5]), jnp.array([0.5]),
                jnp.array([0], jnp.int32), jnp.array([0], jnp.int32),
                jnp.array([0], jnp.int32), jnp.ones((1, 1, 1)),
                jnp.zeros((1, 1, 1)), 1e9)
    assert int(out["status"][0]) == tracking.TERM_WEAK


def test_track_file_roundtrip(tmp_path):
    """Binary track records follow the reference layout (TrackFile.f90
    TRACKDTYPES) and round-trip through the numpy structured read."""
    from modflow6_tpu.models.prt import trackfile as tf

    path = str(tmp_path / "p.trk")
    w = tf.TrackFileWriter(path)
    w.write(kper=1, kstp=2, irpt=np.array([1, 2]),
            ilay=np.array([1, 1]), icell=np.array([5, 9]),
            istatus=np.array([0, 1]), ireason=tf.REASON_TIMESTEP,
            trelease=np.array([0.0, 0.5]), t=np.array([3.5, 3.5]),
            x=np.array([1.25, 2.5]), y=np.array([0.5, 0.75]),
            z=np.array([0.5, 0.25]), name="pt")
    w.close()
    rec = tf.read_track_file(path)
    assert rec.shape == (2,)
    assert rec["kper"].tolist() == [1, 1]
    assert rec["icell"].tolist() == [5, 9]
    np.testing.assert_allclose(rec["x"], [1.25, 2.5])
    assert rec["name"][0].decode().startswith("pt")
    assert rec.dtype.itemsize == 10 * 4 + 5 * 8 + 40

    # CSV variant carries the documented header
    cpath = str(tmp_path / "p.csv")
    w = tf.TrackFileWriter(cpath, csv=True)
    w.write(kper=1, kstp=1, irpt=np.array([1]), ilay=np.array([1]),
            icell=np.array([3]), istatus=np.array([0]), ireason=0,
            trelease=np.array([0.0]), t=np.array([1.0]),
            x=np.array([0.1]), y=np.array([0.2]), z=np.array([0.3]))
    w.close()
    lines = open(cpath).read().splitlines()
    assert lines[0] == tf.TRACK_HEADER
    assert len(lines) == 2


def test_release_schedule():
    """PRP period release settings: ALL/FIRST/FREQUENCY/STEPS/FRACTION
    plus explicit RELEASETIMES (prt-prp.f90 prp_rp semantics)."""
    from modflow6_tpu.models.prt.trackfile import ReleaseSchedule
    from modflow6_tpu.timing.tdis import StressPeriod, Tdis

    tdis = Tdis((StressPeriod(10.0, 5, 1.0), StressPeriod(10.0, 2, 1.0)))
    # period 1: first step; period 2: all steps at mid-step fraction
    rs = ReleaseSchedule(
        period_settings={1: [("first",)],
                         2: [("all",), ("fraction", 0.5)]},
        times=(3.25,))
    t = rs.release_times(tdis)
    np.testing.assert_allclose(t, [0.0, 3.25, 12.5, 17.5])

    # period settings persist until replaced (mf6 period semantics):
    # STEPS 2 4 also selects step 2 of period 2 (starts at t=15)
    rs2 = ReleaseSchedule(period_settings={1: [("steps", [2, 4])]})
    np.testing.assert_allclose(rs2.release_times(tdis), [2.0, 6.0, 15.0])

    rs3 = ReleaseSchedule(period_settings={1: [("frequency", 2)]})
    # period 1 steps 1,3,5 (t=0,4,8); persisted into period 2: step 1
    np.testing.assert_allclose(rs3.release_times(tdis),
                               [0.0, 4.0, 8.0, 10.0])


def test_pass_to_bottom_dry_cell():
    """A particle released in a dry upper layer drops straight to the
    layer below with zero elapsed time and keeps tracking there
    (MethodCellPassToBot.f90 role)."""
    nlay, ncol = 2, 10
    g = DisGrid.create(nlay, 1, ncol, 1.0, 1.0, 2.0,
                       np.stack([np.full((1, ncol), 1.0),
                                 np.zeros((1, ncol))]))
    k, q, theta = 10.0, 0.5, 0.25
    dh = q * (ncol - 1) / k
    # water table inside the BOTTOM layer: upper layer dry
    chd = [(ncol, 0.5 + dh), (2 * ncol - 1, 0.5)]
    gwf = build_gwf("p", g, k=k, strt=0.5, icelltype=1, newton=True,
                    chd=chd)
    head, aux = solve_flow(g, gwf)
    prt = PrtModel("t", g, np.full(g.nodes, theta),
                   ReleasePoints(x=np.array([2.5]), y=np.array([0.5]),
                                 z=np.array([1.5])))   # in the DRY layer
    step = prt.make_step(gwf)
    x, y, z, lay, row, col = prt.initial_state()
    t = 2.0
    out = step(head, aux["ibound"], aux["cond"], x, y, z, lay, row, col, t)
    assert int(out["lay"][0]) == 1            # dropped to the lower layer
    v = q / theta / 0.5                       # sat thickness ≈ 0.5
    # advected in the lower layer for the full time budget
    assert float(out["x"][0]) > 2.5 + 0.5 * v * t * 0.5
