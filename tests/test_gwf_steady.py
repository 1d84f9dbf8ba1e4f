"""End-to-end GWF steady-state tests (physics + solver path).

Mirrors the role of the reference's autotest scenarios
(autotest/test_gwf_npf01_75x75.py etc.): build a model, solve, assert
heads against analytic solutions / direct sparse solves / budget closure.
"""

import numpy as np
import scipy.sparse.linalg as spla

import jax.numpy as jnp

from modflow6_tpu.models.discretization import DisGrid
from modflow6_tpu.models.gwf.builder import build_gwf
from modflow6_tpu.ops.system import to_scipy_csr, apply_dirichlet
from modflow6_tpu.solution import ImsSettings, NumericalSolution


def solve_steady(model, settings=None):
    s = settings or ImsSettings(outer_dvclose=1e-8, outer_maximum=100,
                                inner_dvclose=1e-9, inner_rclose=1e-8,
                                inner_maximum=600)
    sol = NumericalSolution(model, s)
    head, info, aux = sol.solve_timestep(model.strt, delt=1.0, kstp=1, iss=True)
    return np.asarray(head), info, aux


def test_1d_confined_linear():
    # 1 layer, 1 row, 11 cols; CHD h=10 at j=0, h=5 at j=10; confined K=25
    ncol = 11
    g = DisGrid.create(1, 1, ncol, delr=10.0, delc=1.0, top=50.0,
                       botm=np.zeros((1, 1, ncol)))
    m = build_gwf("t1", g, k=25.0, strt=8.0,
                  chd=[(0, 10.0), (ncol - 1, 5.0)])
    head, info, _ = solve_steady(m)
    assert info.converged
    expected = np.linspace(10.0, 5.0, ncol)
    np.testing.assert_allclose(head, expected, atol=1e-7)


def test_2d_lognormal_k_vs_direct():
    # 20x20 steady confined with lognormal K, CHD on left/right edges
    rng = np.random.default_rng(42)
    n = 20
    kfield = np.exp(rng.normal(0.0, 1.0, size=(1, n, n)))
    g = DisGrid.create(1, n, n, delr=5.0, delc=5.0, top=10.0,
                       botm=np.zeros((1, n, n)))
    chd = [(i * n, 12.0) for i in range(n)] + [(i * n + n - 1, 10.0) for i in range(n)]
    m = build_gwf("t2", g, k=kfield.reshape(-1), strt=11.0, chd=chd)
    head, info, aux = solve_steady(m)
    assert info.converged

    # independently solve the same assembled system with scipy
    ib, h0 = m.boundary_state(jnp.asarray(m.strt))
    diag, off, rhs = m.assemble(jnp.asarray(head), jnp.asarray(head), ib,
                                1.0, True)
    active = jnp.where(ib > 0, 1, jnp.where(ib < 0, -1, 0))
    diag2, off2, rhs2 = apply_dirichlet(m.dtopo.nbr, active, diag, off, rhs,
                                        jnp.asarray(head))
    amat = to_scipy_csr(m.topo, np.asarray(diag2), np.asarray(off2))
    x_direct = spla.spsolve(amat.tocsc(), np.asarray(rhs2))
    np.testing.assert_allclose(head, x_direct, atol=1e-6)


def test_budget_closure_rch_chd():
    # recharge over a strip domain discharging to one CHD: sum(RCH) == CHD out
    ncol, nrow = 15, 5
    g = DisGrid.create(1, nrow, ncol, delr=10.0, delc=10.0, top=20.0,
                       botm=np.zeros((1, nrow, ncol)))
    rch_rate = 1e-3
    rch = [(i * ncol + j, rch_rate) for i in range(nrow) for j in range(ncol)
           if j > 0]
    chd = [(i * ncol, 10.0) for i in range(nrow)]
    m = build_gwf("t3", g, k=5.0, strt=10.0, chd=chd, rch=rch)
    head, info, aux = solve_steady(m)
    assert info.converged

    total_rch = rch_rate * 10.0 * 10.0 * len(rch)
    # CHD outflow: flow across edges incident to CHD cells
    from modflow6_tpu.models.gwf.npf import flowja
    cond = aux["cond"]
    q = np.asarray(flowja(m.dtopo, cond, jnp.asarray(head)))
    ib = np.asarray(aux["ibound"])
    en, em = np.asarray(m.topo.edge_n), np.asarray(m.topo.edge_m)
    chd_nodes = set(c[0] for c in chd)
    chd_in = 0.0
    for e in range(len(en)):
        if en[e] in chd_nodes and ib[em[e]] > 0:
            chd_in += -q[e]  # q positive into n
        elif em[e] in chd_nodes and ib[en[e]] > 0:
            chd_in += q[e]
    np.testing.assert_allclose(chd_in, -total_rch, rtol=1e-8)


def test_unconfined_newton_dupuit():
    # unconfined steady flow between two fixed heads; compare with Dupuit:
    # h(x)^2 = h0^2 + (hL^2 - h0^2) * x / L
    ncol = 41
    L = 400.0
    delr = L / ncol
    g = DisGrid.create(1, 1, ncol, delr=delr, delc=1.0, top=30.0,
                       botm=np.zeros((1, 1, ncol)))
    m = build_gwf("t4", g, k=2.0, strt=20.0, icelltype=1, newton=True,
                  chd=[(0, 20.0), (ncol - 1, 10.0)])
    s = ImsSettings(outer_dvclose=1e-8, outer_maximum=200,
                    inner_dvclose=1e-9, inner_rclose=1e-8, inner_maximum=600,
                    linear_acceleration="bicgstab")
    head, info, _ = solve_steady(m, s)
    assert info.converged
    xc = (np.arange(ncol) + 0.5) * delr
    # cell-centered Dupuit between the two CHD cell centers
    x0, xL = xc[0], xc[-1]
    h_dupuit = np.sqrt(20.0**2 + (10.0**2 - 20.0**2) * (xc - x0) / (xL - x0))
    np.testing.assert_allclose(head, h_dupuit, rtol=2e-3)


def test_3layer_vertical_flow():
    # three layers, flow driven vertically by CHD top/bottom; heads linear in
    # resistance; confined
    g = DisGrid.create(3, 1, 1, delr=1.0, delc=1.0, top=0.0,
                       botm=np.array([-1.0, -2.0, -3.0])[:, None, None])
    m = build_gwf("t5", g, k=1.0, k33=2.0, strt=0.0,
                  chd=[(0, 10.0), (2, 4.0)])
    head, info, _ = solve_steady(m)
    assert info.converged
    # equal conductances between layers → middle head is the average
    np.testing.assert_allclose(head[1], 7.0, atol=1e-8)
