"""GWF-GWF exchange tests: the same physical problem solved as one model
and as two coupled models must match (the reference's parallel-test
strategy, autotest/test_par_gwf01.py / .mf6minsim — SURVEY §4.4)."""

import numpy as np

import jax.numpy as jnp

from modflow6_tpu.models.discretization import DisGrid
from modflow6_tpu.models.gwf.builder import build_gwf
from modflow6_tpu.models.gwf.exchange import (
    ExchangePair, GwfGwfExchange, merge_gwf_models, split_heads)
from modflow6_tpu.solution import ImsSettings, NumericalSolution


def settings():
    return ImsSettings(outer_dvclose=1e-10, outer_maximum=60,
                       inner_dvclose=1e-12, inner_rclose=1e-11,
                       inner_maximum=2000)


def test_two_model_1d_matches_single():
    """1d two-model CHD problem (test_par_gwf01 1d case)."""
    ncol = 20
    g_full = DisGrid.create(1, 1, ncol, 10.0, 10.0, 10.0,
                            np.zeros((1, 1, ncol)))
    full = build_gwf("full", g_full, k=4.0, strt=6.0,
                     chd=[(0, 9.0), (ncol - 1, 5.0)])
    h_full, info, _ = NumericalSolution(full, settings()).solve_timestep(
        full.strt, 1.0, iss=True)
    assert info.converged

    half = ncol // 2
    gl = DisGrid.create(1, 1, half, 10.0, 10.0, 10.0, np.zeros((1, 1, half)))
    gr = DisGrid.create(1, 1, half, 10.0, 10.0, 10.0, np.zeros((1, 1, half)))
    left = build_gwf("left", gl, k=4.0, strt=6.0, chd=[(0, 9.0)])
    right = build_gwf("right", gr, k=4.0, strt=6.0, chd=[(half - 1, 5.0)])
    exg = GwfGwfExchange(0, 1, [ExchangePair(
        node1=half - 1, node2=0, ihc=1, cl1=5.0, cl2=5.0, hwva=10.0,
        angldegx=0.0)])
    merged = merge_gwf_models([left, right], [exg])
    h, info, _ = NumericalSolution(merged, settings()).solve_timestep(
        merged.strt, 1.0, iss=True)
    assert info.converged
    hl, hr = split_heads(merged, h)
    np.testing.assert_allclose(np.concatenate([hl, hr]),
                               np.asarray(h_full), rtol=1e-10)


def test_two_model_2d_transient_matches_single():
    """2d split with storage + well, multiple steps."""
    nrow, ncol = 8, 12
    g_full = DisGrid.create(1, nrow, ncol, 10.0, 10.0, 10.0,
                            np.zeros((1, nrow, ncol)))
    kw = dict(k=2.5, strt=6.0, storage={"ss": 1e-4, "iconvert": 0})
    full = build_gwf(
        "full", g_full,
        chd=[(r * ncol, 9.0) for r in range(nrow)],
        wel=[(3 * ncol + 9, -40.0)], **kw)

    half = ncol // 2
    gl = DisGrid.create(1, nrow, half, 10.0, 10.0, 10.0,
                        np.zeros((1, nrow, half)))
    gr = DisGrid.create(1, nrow, half, 10.0, 10.0, 10.0,
                        np.zeros((1, nrow, half)))
    left = build_gwf("l", gl, chd=[(r * half, 9.0) for r in range(nrow)],
                     **kw)
    right = build_gwf("r", gr, wel=[(3 * half + (9 - half), -40.0)], **kw)
    pairs = [ExchangePair(node1=r * half + half - 1, node2=r * half,
                          ihc=1, cl1=5.0, cl2=5.0, hwva=10.0)
             for r in range(nrow)]
    merged = merge_gwf_models([left, right],
                              [GwfGwfExchange(0, 1, pairs)])

    sol_f = NumericalSolution(full, settings())
    sol_m = NumericalSolution(merged, settings())
    hf = jnp.asarray(full.strt)
    hm = jnp.asarray(merged.strt)
    for kstp in range(1, 5):
        hf, inf_f, _ = sol_f.solve_timestep(hf, 5.0, kstp=kstp, iss=False)
        hm, inf_m, _ = sol_m.solve_timestep(hm, 5.0, kstp=kstp, iss=False)
        assert inf_f.converged and inf_m.converged
    hl, hr = split_heads(merged, hm)
    full_grid = np.asarray(hf).reshape(nrow, ncol)
    np.testing.assert_allclose(hl.reshape(nrow, half),
                               full_grid[:, :half], rtol=1e-9)
    np.testing.assert_allclose(hr.reshape(nrow, half),
                               full_grid[:, half:], rtol=1e-9)


def test_exchange_requires_matching_options():
    g = DisGrid.create(1, 1, 4, 10.0, 10.0, 10.0, np.zeros((1, 1, 4)))
    a = build_gwf("a", g, k=1.0, strt=1.0)
    b = build_gwf("b", g, k=1.0, strt=1.0, newton=True, icelltype=1)
    try:
        merge_gwf_models([a, b], [GwfGwfExchange(0, 1, [ExchangePair(3, 0)])])
    except ValueError:
        return
    raise AssertionError("expected ValueError for mismatched options")


def test_gwt_gwt_exchange_matches_single():
    """Two GWT models over two exchanged GWF halves reproduce the
    single-model transport solution (exg-gwtgwt.f90 role via the merged
    composite)."""
    import dataclasses
    import jax.numpy as jnp
    from modflow6_tpu.models.discretization import DisGrid
    from modflow6_tpu.models.gwf.builder import build_gwf
    from modflow6_tpu.models.gwf.exchange import (ExchangePair,
                                                  GwfGwfExchange,
                                                  merge_gwf_models)
    from modflow6_tpu.models.gwt.builder import build_gwt, CoupledGwfGwt
    from modflow6_tpu.models.gwt.exchange import merge_gwt_models

    ncol = 20
    half = ncol // 2

    def gwf_kw(icol0, chd):
        return dict(k=2.0, strt=5.0, chd=chd,
                    storage={"ss": 0.0, "iconvert": 0})

    g_half = DisGrid.create(1, 1, half, 10.0, 1.0, 1.0,
                            np.zeros((1, 1, half)))
    gwf_w = build_gwf("w", g_half, **gwf_kw(0, [(0, 6.0)]))
    gwf_e = build_gwf("e", g_half, **gwf_kw(half, [(half - 1, 4.0)]))
    pairs = [ExchangePair(half - 1, 0, ihc=1, cl1=5.0, cl2=5.0, hwva=1.0)]
    gwf_m = merge_gwf_models([gwf_w, gwf_e],
                             [GwfGwfExchange(0, 1, pairs)])

    gwt_w = build_gwt("tw", g_half, porosity=0.2, strt=0.0,
                      scheme="upstream", cnc=[(0, 1.0)])
    gwt_e = build_gwt("te", g_half, porosity=0.2, strt=0.0,
                      scheme="upstream")
    gwt_m = merge_gwt_models([gwt_w, gwt_e], gwf_m)

    cpl = CoupledGwfGwt(gwf_m, gwt_m)
    head = jnp.asarray(gwf_m.strt)
    conc = jnp.asarray(gwt_m.strt)
    for k in range(8):
        head, conc, fi, ti = cpl.step(head, conc, delt=5.0, kstp=k + 1,
                                      iss_flow=True)
        assert fi.converged and ti.converged

    # single-model oracle
    g_full = DisGrid.create(1, 1, ncol, 10.0, 1.0, 1.0,
                            np.zeros((1, 1, ncol)))
    gwf_s = build_gwf("s", g_full, k=2.0, strt=5.0,
                      chd=[(0, 6.0), (ncol - 1, 4.0)],
                      storage={"ss": 0.0, "iconvert": 0})
    gwt_s = build_gwt("ts", g_full, porosity=0.2, strt=0.0,
                      scheme="upstream", cnc=[(0, 1.0)])
    cpl_s = CoupledGwfGwt(gwf_s, gwt_s)
    head_s = jnp.asarray(gwf_s.strt)
    conc_s = jnp.asarray(gwt_s.strt)
    for k in range(8):
        head_s, conc_s, fi, ti = cpl_s.step(head_s, conc_s, delt=5.0,
                                            kstp=k + 1, iss_flow=True)
    np.testing.assert_allclose(np.asarray(head), np.asarray(head_s),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(conc), np.asarray(conc_s),
                               atol=1e-8)


def test_gwe_gwe_exchange_matches_single():
    """Two GWE models over two exchanged GWF halves reproduce the
    single-model heat-transport solution (exg-gwegwe.f90 role via the
    merged composite, gwe/exchange.py merge_gwe_models)."""
    import jax.numpy as jnp
    from modflow6_tpu.models.discretization import DisGrid
    from modflow6_tpu.models.gwf.builder import build_gwf
    from modflow6_tpu.models.gwf.exchange import (ExchangePair,
                                                  GwfGwfExchange,
                                                  merge_gwf_models)
    from modflow6_tpu.models.gwe.builder import CoupledGwfGwe, build_gwe
    from modflow6_tpu.models.gwe.exchange import merge_gwe_models

    ncol = 20
    half = ncol // 2
    g_half = DisGrid.create(1, 1, half, 10.0, 1.0, 1.0,
                            np.zeros((1, 1, half)))
    gwf_w = build_gwf("w", g_half, k=2.0, strt=5.0, chd=[(0, 6.0)],
                      storage={"ss": 0.0, "iconvert": 0})
    gwf_e = build_gwf("e", g_half, k=2.0, strt=5.0,
                      chd=[(half - 1, 4.0)],
                      storage={"ss": 0.0, "iconvert": 0})
    pairs = [ExchangePair(half - 1, 0, ihc=1, cl1=5.0, cl2=5.0, hwva=1.0)]
    gwf_m = merge_gwf_models([gwf_w, gwf_e],
                             [GwfGwfExchange(0, 1, pairs)])
    kw = dict(porosity=0.2, scheme="upstream",
              cnd=dict(ktw=0.6, kts=2.5))
    gwe_w = build_gwe("ew", g_half, strt=10.0, ctp=[(0, 20.0)], **kw)
    gwe_e = build_gwe("ee", g_half, strt=10.0, **kw)
    gwe_m = merge_gwe_models([gwe_w, gwe_e], gwf_m)
    cpl = CoupledGwfGwe(gwf_m, gwe_m)
    head = jnp.asarray(gwf_m.strt)
    temp = jnp.asarray(gwe_m.strt)
    for k in range(8):
        head, temp, fi, ti = cpl.step(head, temp, delt=5.0, kstp=k + 1,
                                      iss_flow=True)
        assert fi.converged and ti.converged

    g_full = DisGrid.create(1, 1, ncol, 10.0, 1.0, 1.0,
                            np.zeros((1, 1, ncol)))
    gwf_s = build_gwf("s", g_full, k=2.0, strt=5.0,
                      chd=[(0, 6.0), (ncol - 1, 4.0)],
                      storage={"ss": 0.0, "iconvert": 0})
    gwe_s = build_gwe("es", g_full, strt=10.0, ctp=[(0, 20.0)], **kw)
    cpl_s = CoupledGwfGwe(gwf_s, gwe_s)
    head_s = jnp.asarray(gwf_s.strt)
    temp_s = jnp.asarray(gwe_s.strt)
    for k in range(8):
        head_s, temp_s, fi, ti = cpl_s.step(head_s, temp_s, delt=5.0,
                                            kstp=k + 1, iss_flow=True)
    np.testing.assert_allclose(np.asarray(temp), np.asarray(temp_s),
                               atol=1e-8)
