"""Advanced-package transport (LKT/SFT/MWT, tsp-apt.f90) and mover
transport (MVT, tsp-mvt.f90) on the augmented GWT system."""

import numpy as np
import jax.numpy as jnp

from modflow6_tpu.models.discretization import DisGrid
from modflow6_tpu.models.gwf.builder import build_gwf
from modflow6_tpu.models.gwf.advanced import (AugmentedGwfModel, build_lak,
                                              build_maw, build_sfr)
from modflow6_tpu.models.gwt.builder import build_gwt
from modflow6_tpu.models.gwt.apt import AugmentedGwtModel, CoupledAugmented


def _grid(n=6):
    return DisGrid.create(1, 1, n, 100.0, 100.0, 50.0, np.zeros((1, 1, n)))


def test_sft_stream_flushes_to_inflow_conc():
    """SFT: a stream chain fed at conc 1 flushes to 1 everywhere; the
    terminal outflow removes mass at the reach concentration."""
    g = _grid()
    base = build_gwf("f", g, k=1e-8, strt=30.0, chd=[(0, 30.0), (5, 30.0)])
    reaches = [dict(node=1 + r, cond=0.0, strtop=40.0 - 0.1 * r, width=3.0,
                    rough=0.03, slope=1e-3, length=100.0,
                    strt=40.4 - 0.1 * r,
                    inflow=2.0 if r == 0 else 0.0,
                    upstream=[(r - 1, 1.0)] if r > 0 else [])
               for r in range(3)]
    gwf = AugmentedGwfModel(base, sfr=build_sfr(reaches))
    gwt_base = build_gwt("t", g, porosity=0.3, strt=0.0, scheme="upstream")
    gwt = AugmentedGwtModel(gwt_base, gwf)
    cpl = CoupledAugmented(gwf, gwt, ext_conc={"sfr": 1.0})
    xf = gwf.strt
    xc = gwt.strt
    for k in range(120):
        xf, xc, fi, ti, flows = cpl.step(xf, xc, delt=500.0, kstp=k + 1)
        assert fi.converged and ti.converged
    cf = np.asarray(xc)[g.nodes:]
    np.testing.assert_allclose(cf, 1.0, rtol=1e-6)
    # mass balance at steady state: external inflow mass = terminal
    # outflow mass (reach-to-reach routing is internal and cancels)
    bud = gwt.feature_budget(jnp.asarray(xc), jnp.asarray(xc), 500.0, flows)
    m_in = float(np.asarray(bud["APT-IN"]).sum())
    m_out_term = float(np.asarray(bud["APT-OUT"])[-1])
    np.testing.assert_allclose(m_in, -m_out_term, rtol=1e-6)


def test_lkt_evapoconcentration():
    """LKT: evaporation removes water but not mass, so the steady lake
    concentration exceeds the rainfall concentration by
    rain/(rain − evap) (tsp-apt evaporation handling)."""
    g = _grid(3)
    base = build_gwf("f", g, k=1e-8, strt=30.0, chd=[(0, 30.0)])
    rain, evap = 10.0, 4.0
    lak = build_lak([dict(strt=32.3, bottom=30.0, surf_area=1e3,
                          rainfall=rain, evap=evap,
                          connections=[(1, 1e-10, 30.0)])],
                    outlets=[dict(lake=0, to=-1, type="manning",
                                  invert=32.0, width=2.0, rough=0.03,
                                  slope=1e-3)])
    gwf = AugmentedGwfModel(base, lak=lak)
    gwt_base = build_gwt("t", g, porosity=0.3, strt=0.0)
    gwt = AugmentedGwtModel(gwt_base, gwf)
    crain = 0.5
    cpl = CoupledAugmented(gwf, gwt, ext_conc={"lak": crain})
    xf, xc = gwf.strt, gwt.strt
    for k in range(250):
        xf, xc, fi, ti, flows = cpl.step(xf, xc, delt=2e3, kstp=k + 1)
        assert fi.converged and ti.converged
    cf = float(np.asarray(xc)[g.nodes])
    np.testing.assert_allclose(cf, crain * rain / (rain - evap), rtol=1e-4)


def test_mwt_pumped_well_reaches_aquifer_conc():
    """MWT: a pumping well's concentration equals the flow-weighted
    aquifer concentration it draws."""
    g = _grid(3)
    base = build_gwf("f", g, k=10.0, strt=40.0,
                     chd=[(0, 40.0), (1, 40.0), (2, 40.0)])
    maw = build_maw([dict(radius=0.2, strt=40.0, rate=-50.0,
                          connections=[(1, 25.0)])], g)
    gwf = AugmentedGwfModel(base, maw=maw)
    gwt_base = build_gwt("t", g, porosity=0.3, strt=0.8,
                         cnc=[(0, 0.8), (1, 0.8), (2, 0.8)])
    gwt = AugmentedGwtModel(gwt_base, gwf)
    cpl = CoupledAugmented(gwf, gwt)
    xf, xc = gwf.strt, gwt.strt
    for k in range(80):
        xf, xc, fi, ti, flows = cpl.step(xf, xc, delt=50.0, kstp=k + 1)
        assert fi.converged and ti.converged
    cw = float(np.asarray(xc)[g.nodes])
    np.testing.assert_allclose(cw, 0.8, rtol=1e-6)


def test_mvt_mover_carries_mass_stream_to_lake():
    """MVT: water moved by MVR from a stream to a lake carries the
    stream's concentration; with the mover as the lake's only inflow,
    the lake equilibrates to the stream concentration."""
    g = _grid(8)
    base = build_gwf("f", g, k=1e-8, strt=30.0, chd=[(0, 30.0)])
    reaches = [dict(node=1, cond=0.0, strtop=40.0, width=3.0, rough=0.03,
                    slope=1e-3, length=100.0, strt=40.3, inflow=2.0)]
    lakes = [dict(strt=25.4, bottom=25.0, surf_area=1e3,
                  connections=[(3, 1e-10, 25.0)])]
    outlets = [dict(lake=0, to=-1, type="manning", invert=25.3, width=2.0,
                    rough=0.03, slope=1e-3)]
    movers = [dict(provider="sfr", iprov=0, receiver="lak", ircv=0,
                   mvrtype="factor", value=1.0)]
    gwf = AugmentedGwfModel(base, lak=build_lak(lakes, outlets),
                            sfr=build_sfr(reaches), mvr=movers)
    gwt_base = build_gwt("t", g, porosity=0.3, strt=0.0)
    gwt = AugmentedGwtModel(gwt_base, gwf)
    cpl = CoupledAugmented(gwf, gwt, ext_conc={"sfr": 2.5})
    xf, xc = gwf.strt, gwt.strt
    for k in range(250):
        xf, xc, fi, ti, flows = cpl.step(xf, xc, delt=2e3, kstp=k + 1)
        assert fi.converged and ti.converged
    feats = np.asarray(xc)[g.nodes:]
    # feature order: lak (1) then sfr (1)
    c_lak, c_sfr = feats[0], feats[1]
    np.testing.assert_allclose(c_sfr, 2.5, rtol=1e-6)
    np.testing.assert_allclose(c_lak, 2.5, rtol=1e-4)


def test_gwe_feature_energy_scaling():
    """GWE analog (LKE/SFE role): the same feature equations scaled by
    eqnsclfac reach the same steady temperature."""
    g = _grid()
    base = build_gwf("f", g, k=1e-8, strt=30.0, chd=[(0, 30.0)])
    reaches = [dict(node=1, cond=0.0, strtop=40.0, width=3.0, rough=0.03,
                    slope=1e-3, length=100.0, strt=40.3, inflow=2.0)]
    gwf = AugmentedGwfModel(base, sfr=build_sfr(reaches))
    gwt_base = build_gwt("t", g, porosity=0.3, strt=5.0,
                         eqnsclfac=4.184e6)    # ρw·cw, the GWE scaling
    gwt = AugmentedGwtModel(gwt_base, gwf)
    cpl = CoupledAugmented(gwf, gwt, ext_conc={"sfr": 18.0})
    xf, xc = gwf.strt, gwt.strt + 5.0
    for k in range(100):
        xf, xc, fi, ti, flows = cpl.step(xf, xc, delt=500.0, kstp=k + 1)
        assert fi.converged and ti.converged
    t_reach = float(np.asarray(xc)[g.nodes])
    np.testing.assert_allclose(t_reach, 18.0, rtol=1e-6)


def test_uzt_column_delivers_mass_to_aquifer():
    """UZT (gwt-uzt.f90 role): infiltration at conc 1 percolates through
    an unsaturated column; after the wetting front arrives the column
    concentration flushes to 1 and at steady state the external mass
    inflow equals the recharge mass delivered to the aquifer."""
    from modflow6_tpu.models.gwf import uzf as uzf_mod

    g = _grid(3)
    base = build_gwf("f", g, k=10.0, strt=30.0,
                     chd=[(0, 30.0), (1, 30.0), (2, 30.0)],
                     storage={"ss": 1e-5, "sy": 0.2, "iconvert": 1})
    uzf = uzf_mod.make_uzf(
        [dict(node=1, vks=1.0, thtr=0.05, thts=0.35, thti=0.05, eps=3.5,
              celtop=45.0, celbot=40.0, area=100.0, finf=0.2)], nz=40)
    gwf = AugmentedGwfModel(base)
    gwt_base = build_gwt("t", g, porosity=0.3, strt=0.0)
    gwt = AugmentedGwtModel(gwt_base, gwf, uzf=uzf)
    assert gwt.n_extra == 1
    cpl = CoupledAugmented(gwf, gwt, ext_conc={"uzf": 1.0})
    xf, xc = gwf.strt, gwt.strt
    for k in range(120):
        xf, xc, fi, ti, flows = cpl.step(xf, xc, delt=50.0, kstp=k + 1)
        assert fi.converged and ti.converged
    cu = float(np.asarray(xc)[g.nodes])
    np.testing.assert_allclose(cu, 1.0, rtol=1e-4)
    # steady state: infiltration mass in = recharge mass out to the cell
    bud = gwt.feature_budget(jnp.asarray(xc), jnp.asarray(xc), 50.0, flows)
    m_in = float(np.asarray(bud["APT-IN"])[0])
    m_gwf = float(np.asarray(bud["APT-GWF"])[0])
    assert m_in > 0
    np.testing.assert_allclose(m_in, -m_gwf, rtol=1e-3)


def test_uze_column_temperature():
    """UZE: the same feature rows on a GWE base carry energy — the
    eqnsclfac scaling rides through (gwe-uze.f90 role)."""
    from modflow6_tpu.models.gwe.builder import build_gwe
    from modflow6_tpu.models.gwf import uzf as uzf_mod

    g = _grid(3)
    base = build_gwf("f", g, k=10.0, strt=30.0,
                     chd=[(0, 30.0), (1, 30.0), (2, 30.0)],
                     storage={"ss": 1e-5, "sy": 0.2, "iconvert": 1})
    uzf = uzf_mod.make_uzf(
        [dict(node=1, vks=1.0, thtr=0.05, thts=0.35, thti=0.05, eps=3.5,
              celtop=45.0, celbot=40.0, area=100.0, finf=0.2)], nz=40)
    gwf = AugmentedGwfModel(base)
    gwe_base = build_gwe("e", g, porosity=0.3, strt=5.0)
    gwe = AugmentedGwtModel(gwe_base, gwf, uzf=uzf)
    cpl = CoupledAugmented(gwf, gwe, ext_conc={"uzf": 25.0})
    xf, xt = gwf.strt, gwe.strt
    xt = jnp.asarray(xt).at[:].set(5.0)
    for k in range(120):
        xf, xt, fi, ti, flows = cpl.step(xf, xt, delt=50.0, kstp=k + 1)
        assert fi.converged and ti.converged
    tu = float(np.asarray(xt)[g.nodes])
    np.testing.assert_allclose(tu, 25.0, rtol=1e-4)


def test_lke_rain_fed_lake_temperature():
    """LKE (gwe-lke.f90 role): a rain-fed lake with an outlet equilibrates
    to the rainfall temperature on a GWE base."""
    from modflow6_tpu.models.gwe.builder import build_gwe

    g = _grid(3)
    base = build_gwf("f", g, k=1e-8, strt=30.0, chd=[(0, 30.0)])
    lak = build_lak([dict(strt=32.3, bottom=30.0, surf_area=1e3,
                          rainfall=10.0,
                          connections=[(1, 1e-10, 30.0)])],
                    outlets=[dict(lake=0, to=-1, type="manning",
                                  invert=32.0, width=2.0, rough=0.03,
                                  slope=1e-3)])
    gwf = AugmentedGwfModel(base, lak=lak)
    gwe_base = build_gwe("e", g, porosity=0.3, strt=4.0)
    gwe = AugmentedGwtModel(gwe_base, gwf)
    cpl = CoupledAugmented(gwf, gwe, ext_conc={"lak": 18.0})
    xf, xt = gwf.strt, gwe.strt
    xt = jnp.asarray(xt).at[:].set(4.0)
    for k in range(250):
        xf, xt, fi, ti, flows = cpl.step(xf, xt, delt=2e3, kstp=k + 1)
        assert fi.converged and ti.converged
    tl = float(np.asarray(xt)[g.nodes])
    np.testing.assert_allclose(tl, 18.0, rtol=1e-4)
