"""DSP dispersion tests (role of reference autotest test_gwt_dsp01 family).

Strategy: moment analysis of a pulse on a uniform flow field.  For the
advection-dispersion equation the second spatial moment of the plume grows
exactly at 2*D_eff per unit time, and for linear schemes the numerical
dispersion is additive — so differencing runs with/without dispersivity
isolates the physical contribution regardless of scheme error.
"""

import numpy as np

import jax.numpy as jnp

from modflow6_tpu.models.discretization import DisGrid
from modflow6_tpu.models.gwf.builder import build_gwf
from modflow6_tpu.models.gwt import dsp as dsp_mod
from modflow6_tpu.models.gwt.builder import build_gwt, make_dsp
from modflow6_tpu.solution import ImsSettings, NumericalSolution


def tight(acc="bicgstab"):
    return ImsSettings(outer_dvclose=1e-10, outer_maximum=50,
                       inner_dvclose=1e-12, inner_rclose=1e-10,
                       inner_maximum=3000, linear_acceleration=acc)


def flow_fields(g, gwf, delt=1.0):
    from modflow6_tpu.models.gwt.fmi import from_gwf_step
    sol = NumericalSolution(gwf, tight("cg"))
    head, info, aux = sol.solve_timestep(gwf.strt, delt, iss=True)
    assert info.converged
    return from_gwf_step(gwf, head, head, aux["ibound"], aux["cond"],
                         delt, True, ssm_spec={})


def run_transport(g, fields, strt, delt, nsteps, **gwt_kw):
    gwt = build_gwt("t", g, strt=strt, **gwt_kw)
    sol = NumericalSolution(gwt, tight())
    conc = jnp.asarray(gwt.strt)
    for _ in range(nsteps):
        conc, info, _ = sol.solve_timestep(conc, delt, iss=False, pkgs=fields)
        assert info.converged
    return np.asarray(conc)


def moments(c, x):
    m0 = c.sum()
    mu = (c * x).sum() / m0
    var = (c * (x - mu) ** 2).sum() / m0
    return m0, mu, var


def test_dsp_edge_conductance_two_cells():
    """Hand-check: two unit cells, pure diffusion → cond = D*theta*A/L."""
    g = DisGrid.create(1, 1, 2, 1.0, 1.0, 1.0, np.zeros((1, 1, 2)))
    gwf = build_gwf("f", g, k=1.0, strt=0.5)
    fields = flow_fields(g, gwf)
    gwt = build_gwt("t", g, porosity=0.4, strt=0.0,
                    dsp={"diffc": 2.5})
    ib = jnp.ones(2, jnp.int32)
    dcond = dsp_mod.edge_conductance(gwt.dtopo, gwt.dsp,
                                     gwt.mst_arrays.porosity, fields, ib,
                                     gwt.top, gwt.bot)
    # dstar = 2.5*0.4 = 1.0 per cell; half-cell cond = dstar*A/cl = 1/0.5 = 2
    # harmonic combination = 1.0
    np.testing.assert_allclose(np.asarray(dcond), [1.0], rtol=1e-12)


def test_dsp_pure_diffusion_variance():
    """No flow: pulse spreads with var growth exactly 2*diffc*t (the discrete
    Laplacian preserves the second-moment identity); mass conserved."""
    ncol = 101
    g = DisGrid.create(1, 1, ncol, 1.0, 1.0, 1.0, np.zeros((1, 1, ncol)))
    gwf = build_gwf("f", g, k=1.0, strt=0.5)  # flat head → q = 0
    fields = flow_fields(g, gwf)
    assert np.all(np.abs(np.asarray(fields.q_edge)) < 1e-12)

    strt = np.zeros(ncol)
    strt[ncol // 2] = 1.0
    diffc, delt, nsteps = 0.5, 2.0, 10
    c = run_transport(g, fields, strt, delt, nsteps, porosity=0.3,
                      scheme="central", dsp={"diffc": diffc})
    x = np.arange(ncol, dtype=float)
    m0, mu, var = moments(c, x)
    np.testing.assert_allclose(m0, 1.0, rtol=1e-5)        # mass conserved
    np.testing.assert_allclose(mu, ncol // 2, atol=1e-6)  # symmetric
    # cell-center moments start at exactly 0 for a one-cell pulse, and the
    # discrete Laplacian grows the second moment at exactly 2*D per unit time
    np.testing.assert_allclose(var, 2 * diffc * delt * nsteps, rtol=1e-4)


def test_dsp_longitudinal_mechanical():
    """Uniform flow: differencing runs with/without alh isolates the
    mechanical contribution 2*(alh*v)*t to the variance growth."""
    ncol, delr, theta = 201, 1.0, 0.25
    q = 0.5                       # specific discharge
    v = q / theta                 # pore velocity = 2.0
    g = DisGrid.create(1, 1, ncol, delr, 1.0, 1.0, np.zeros((1, 1, ncol)))
    k, dh = 10.0, 0.5 * (ncol - 1) * 1.0 / 10.0
    gwf = build_gwf("f", g, k=k, strt=10.0,
                    chd=[(0, 10.0 + dh), (ncol - 1, 10.0)])
    fields = flow_fields(g, gwf)
    np.testing.assert_allclose(np.asarray(fields.q_edge), -q, rtol=1e-8)

    strt = np.zeros(ncol)
    strt[40] = 1.0
    alh, delt, nsteps = 0.5, 0.25, 40
    t = delt * nsteps
    kw = dict(porosity=theta, scheme="central")
    c0 = run_transport(g, fields, strt, delt, nsteps, **kw)
    c1 = run_transport(g, fields, strt, delt, nsteps, dsp={"alh": alh}, **kw)
    x = np.arange(ncol, dtype=float)
    _, mu0, var0 = moments(c0, x)
    m1, mu1, var1 = moments(c1, x)
    np.testing.assert_allclose(m1, 1.0, rtol=1e-5)
    # centroid advects at v (same for both runs)
    np.testing.assert_allclose(mu1 - 40.0, v * t, rtol=0.02)
    # D_eff in the concentration equation = alh*q/theta = alh*v
    np.testing.assert_allclose(var1 - var0, 2 * alh * v * t, rtol=0.05)


def test_dsp_transverse_spreading():
    """2D uniform x-flow: ath1 spreads the plume laterally at 2*(ath1*v)*t."""
    nrow, ncol, theta = 31, 41, 0.25
    q = 0.5
    v = q / theta
    g = DisGrid.create(1, nrow, ncol, 1.0, 1.0, 1.0,
                       np.zeros((1, nrow, ncol)))
    k = 10.0
    dh = q * (ncol - 1) / k
    chd = [(r * ncol, 10.0 + dh) for r in range(nrow)] \
        + [(r * ncol + ncol - 1, 10.0) for r in range(nrow)]
    gwf = build_gwf("f", g, k=k, strt=10.0, chd=chd)
    fields = flow_fields(g, gwf)

    strt = np.zeros((nrow, ncol))
    strt[nrow // 2, 8] = 1.0
    alh, ath1, delt, nsteps = 0.2, 0.1, 0.25, 24
    t = delt * nsteps
    kw = dict(porosity=theta, scheme="central")
    c0 = run_transport(g, fields, strt.ravel(), delt, nsteps, **kw)
    c1 = run_transport(g, fields, strt.ravel(), delt, nsteps,
                       dsp={"alh": alh, "ath1": ath1}, **kw)
    y = np.repeat(np.arange(nrow, dtype=float), ncol)
    _, muy0, vary0 = moments(c0, y)
    m1, muy1, vary1 = moments(c1, y)
    np.testing.assert_allclose(m1, 1.0, rtol=1e-5)
    np.testing.assert_allclose(muy1, nrow // 2, atol=1e-4)   # symmetric in y
    np.testing.assert_allclose(vary1 - vary0, 2 * ath1 * v * t, rtol=0.05)


def test_dsp_defaulting_rules():
    d = make_dsp(4, {"alh": 1.0, "ath1": 0.3})
    np.testing.assert_allclose(np.asarray(d.alv), 1.0)   # alv ← alh
    np.testing.assert_allclose(np.asarray(d.ath2), 0.3)  # ath2 ← ath1
    np.testing.assert_allclose(np.asarray(d.atv), 0.0)
    assert d.idisp == 1 and d.idiffc == 0
