"""Topology construction and ELL SpMV correctness."""

import numpy as np
import scipy.sparse as sp

import jax.numpy as jnp

from modflow6_tpu.models.discretization import DisGrid
from modflow6_tpu.ops.system import spmv, to_scipy_csr


def make_grid(nlay=2, nrow=3, ncol=4):
    return DisGrid.create(nlay, nrow, ncol, delr=100.0, delc=50.0,
                          top=10.0, botm=np.linspace(0, -10, nlay)[:, None, None]
                          * np.ones((nlay, nrow, ncol)))


def test_dis_edge_count():
    g = make_grid()
    t = g.build_topology()
    nlay, nrow, ncol = 2, 3, 4
    expected = (nlay * nrow * (ncol - 1) + nlay * (nrow - 1) * ncol
                + (nlay - 1) * nrow * ncol)
    assert t.nedges == expected
    assert t.nodes == nlay * nrow * ncol
    # upper-triangle, sorted
    assert (t.edge_n < t.edge_m).all()
    order = np.lexsort((t.edge_m, t.edge_n))
    assert (order == np.arange(t.nedges)).all()


def test_dis_idomain_excludes_edges():
    g = make_grid()
    idom = np.ones(g.shape, np.int32)
    idom[0, 1, 1] = 0
    g2 = DisGrid.create(2, 3, 4, g.delr, g.delc, g.top_surf, g.botm, idom)
    t2 = g2.build_topology()
    dead = g2.node_number(0, 1, 1)
    assert dead not in t2.edge_n and dead not in t2.edge_m


def test_vertical_passthrough():
    # middle layer inactive with idomain=-1: layers 0 and 2 connect directly
    nlay, nrow, ncol = 3, 1, 1
    idom = np.ones((nlay, nrow, ncol), np.int32)
    idom[1] = -1
    botm = np.array([[-1.0]], np.float64) * np.arange(1, nlay + 1)[:, None, None]
    g = DisGrid.create(nlay, nrow, ncol, 1.0, 1.0, 0.0, botm, idom)
    t = g.build_topology()
    assert t.nedges == 1
    assert t.edge_n[0] == 0 and t.edge_m[0] == 2
    assert t.ihc[0] == 0


def test_ell_spmv_matches_scipy():
    rng = np.random.default_rng(0)
    g = make_grid()
    t = g.build_topology()
    N, K = t.nodes, t.max_degree
    assert K == 6 or K <= 6

    # random symmetric matrix on the topology
    vals = rng.normal(size=t.nedges)
    diag = rng.normal(size=N) + 10.0
    off = np.zeros(N * K)
    off[t.slot_nm] = vals
    off[t.slot_mn] = vals
    off = off.reshape(N, K)

    x = rng.normal(size=N)
    y = spmv(jnp.asarray(t.nbr), jnp.asarray(diag), jnp.asarray(off),
             jnp.asarray(x))

    mat = to_scipy_csr(t, diag, off)
    np.testing.assert_allclose(np.asarray(y), mat @ x, rtol=1e-13)


def test_csr_pattern():
    g = make_grid()
    t = g.build_topology()
    ia, ja, pos_nm, pos_mn = t.csr
    N = t.nodes
    # diagonal first in each row
    assert (ja[ia[:-1]] == np.arange(N)).all()
    # each edge's entries land in the right rows with the right columns
    for e in range(t.nedges):
        assert ja[pos_nm[e]] == t.edge_m[e]
        assert ja[pos_mn[e]] == t.edge_n[e]
        n = t.edge_n[e]
        assert ia[n] <= pos_nm[e] < ia[n + 1]


def test_structured_spmv_matches_gather():
    from modflow6_tpu.ops.system import spmv_structured
    rng = np.random.default_rng(5)
    g = make_grid(3, 5, 7)
    t = g.build_topology()
    assert t.structured and t.max_degree == 6
    N, K = t.nodes, 6
    vals_nm = rng.normal(size=t.nedges)
    vals_mn = rng.normal(size=t.nedges)  # asymmetric
    diag = rng.normal(size=N)
    off = np.zeros(N * K)
    off[t.slot_nm] = vals_nm
    off[t.slot_mn] = vals_mn
    off = off.reshape(N, K)
    x = rng.normal(size=N)
    y_gather = spmv(jnp.asarray(t.nbr), jnp.asarray(diag), jnp.asarray(off),
                    jnp.asarray(x))
    y_struct = spmv_structured(t.grid_shape, jnp.asarray(diag),
                               jnp.asarray(off), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y_struct), np.asarray(y_gather),
                               rtol=1e-14)
    mat = to_scipy_csr(t, diag, off)
    np.testing.assert_allclose(np.asarray(y_struct), mat @ x, rtol=1e-12)


def test_idomain_hole_still_structured():
    g = make_grid(2, 4, 4)
    idom = np.ones(g.shape, np.int32)
    idom[0, 1, 1] = 0
    g2 = DisGrid.create(2, 4, 4, g.delr, g.delc, g.top_surf, g.botm, idom)
    t = g2.build_topology()
    assert t.structured  # holes just zero coefficients, shifts stay valid
