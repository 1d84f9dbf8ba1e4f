"""GWE heat-transport tests (role of reference autotest test_gwe_* family).

Physics oracles: thermal diffusivity from the bulk conductivity/heat
capacity, thermal retardation of the advected front, and zero-order energy
decay in a closed cell.
"""

import numpy as np

import jax.numpy as jnp

from modflow6_tpu.models.discretization import DisGrid
from modflow6_tpu.models.gwf.builder import build_gwf
from modflow6_tpu.models.gwe import est as est_mod
from modflow6_tpu.models.gwe.builder import CoupledGwfGwe, build_gwe
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


def run_energy(g, fields, strt, delt, nsteps, **kw):
    gwe = build_gwe("e", g, strt=strt, **kw)
    sol = NumericalSolution(gwe, tight())
    temp = jnp.asarray(gwe.strt)
    for _ in range(nsteps):
        temp, info, _ = sol.solve_timestep(temp, delt, iss=False, pkgs=fields)
        assert info.converged
    return np.asarray(temp)


def moments(c, x):
    m0 = c.sum()
    mu = (c * x).sum() / m0
    return m0, mu, (c * (x - mu) ** 2).sum() / m0


# SI-ish properties used throughout
THETA = 0.25
RHOW, CPW = 1000.0, 4000.0
RHOS, CPS = 2600.0, 900.0
BULK_CAP = THETA * RHOW * CPW + (1 - THETA) * RHOS * CPS


def test_gwe_conduction_variance():
    """Still water: temperature pulse spreads with thermal diffusivity
    ktbulk / (theta*rhow*cpw + (1-theta)*rhos*cps)."""
    ncol = 101
    g = DisGrid.create(1, 1, ncol, 1.0, 1.0, 1.0, np.zeros((1, 1, ncol)))
    gwf = build_gwf("f", g, k=1.0, strt=0.5)  # flat head → no flow
    fields = flow_fields(g, gwf)

    ktw, kts = 0.6, 3.0
    ktbulk = THETA * ktw + (1 - THETA) * kts
    alpha = ktbulk / BULK_CAP              # thermal diffusivity

    strt = np.zeros(ncol)
    strt[ncol // 2] = 1.0
    delt, nsteps = 5e4, 10
    t = run_energy(g, fields, strt, delt, nsteps, porosity=THETA,
                   scheme="central", rhow=RHOW, cpw=CPW, rhos=RHOS, cps=CPS,
                   cnd={"ktw": ktw, "kts": kts})
    x = np.arange(ncol, dtype=float)
    m0, mu, var = moments(t, x)
    np.testing.assert_allclose(mu, ncol // 2, atol=1e-6)
    np.testing.assert_allclose(var, 2 * alpha * delt * nsteps, rtol=1e-4)


def test_gwe_thermal_retardation():
    """Uniform flow: the thermal front advects at v * theta*rhow*cpw /
    bulk heat capacity (heat is 'sorbed' by the solid matrix)."""
    ncol, q = 201, 0.5
    v = q / THETA
    retard = BULK_CAP / (THETA * RHOW * CPW)
    g = DisGrid.create(1, 1, ncol, 1.0, 1.0, 1.0, np.zeros((1, 1, ncol)))
    k = 10.0
    dh = q * (ncol - 1) / k
    gwf = build_gwf("f", g, k=k, strt=10.0,
                    chd=[(0, 10.0 + dh), (ncol - 1, 10.0)])
    fields = flow_fields(g, gwf)

    strt = np.zeros(ncol)
    strt[30] = 1.0
    delt, nsteps = 2.0, 30
    t_end = delt * nsteps
    temp = run_energy(g, fields, strt, delt, nsteps, porosity=THETA,
                      scheme="central", rhow=RHOW, cpw=CPW, rhos=RHOS,
                      cps=CPS)
    x = np.arange(ncol, dtype=float)
    m0, mu, var = moments(temp, x)
    np.testing.assert_allclose(mu - 30.0, v * t_end / retard, rtol=0.02)


def test_gwe_zero_order_decay_closed_cell():
    """Closed cell: zero-order aqueous energy sink cools linearly at
    rate*theta / bulk heat capacity per unit time."""
    g = DisGrid.create(1, 1, 1, 1.0, 1.0, 1.0, np.zeros((1, 1, 1)))
    gwf = build_gwf("f", g, k=1.0, strt=0.5)
    fields = flow_fields(g, gwf)
    gamma = 2.0e5   # energy sink rate per aqueous volume
    delt, nsteps = 10.0, 8
    temp = run_energy(g, fields, np.array([20.0]), delt, nsteps,
                      porosity=THETA, rhow=RHOW, cpw=CPW, rhos=RHOS, cps=CPS,
                      decay=(est_mod.DECAY_WATER, gamma, 0.0))
    dTdt = gamma * THETA / BULK_CAP
    expected = 20.0 - dTdt * delt * nsteps
    np.testing.assert_allclose(temp[0], expected, rtol=1e-10)


def test_gwe_coupled_ssm_recharge_temperature():
    """Coupled GWF→GWE: warm recharge raises aquifer temperatures toward
    (but never past) the source temperature."""
    n = 10
    g = DisGrid.create(1, 1, n, 10.0, 10.0, 10.0, np.zeros((1, 1, n)))
    gwf = build_gwf("f", g, k=5.0, strt=5.0,
                    storage={"ss": 1e-4, "iconvert": 0},
                    chd=[(n - 1, 5.0)], rch=[(j, 1e-3) for j in range(n)])
    gwe = build_gwe("e", g, porosity=THETA, strt=10.0, scheme="upstream",
                    rhow=RHOW, cpw=CPW, rhos=RHOS, cps=CPS,
                    ssm_spec={"RCH": 25.0})
    coupled = CoupledGwfGwe(gwf, gwe)
    head = jnp.asarray(gwf.strt)
    temp = jnp.asarray(gwe.strt)
    for kstp in range(1, 6):
        head, temp, finfo, tinfo = coupled.step(head, temp, 50.0, kstp)
        assert finfo.converged and tinfo.converged
    t = np.asarray(temp)
    assert np.all(t > 10.0)          # warmed everywhere
    assert np.all(t <= 25.0 + 1e-6)  # bounded by recharge temperature
