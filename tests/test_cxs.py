"""N-point cross-section hydraulics vs closed forms
(SwfCxsUtils.f90 get_composite_conveyance parity)."""

import numpy as np
import jax.numpy as jnp

from modflow6_tpu.ops import cxs


def test_rectangular_section_matches_closed_form():
    """Rectangle w=4: A = w·d, P = w + 2d (walls wetted),
    C = A/n · (A/P)^(2/3)."""
    w, n = 4.0, 0.03
    st = jnp.asarray([0.0, 0.0, w, w])
    ht = jnp.asarray([2.0, 0.0, 0.0, 2.0])
    rf = jnp.ones(3)
    for d in (0.3, 1.0, 1.9):
        a, p = cxs.segment_wetted(st, ht, d)
        np.testing.assert_allclose(float(a.sum()), w * d, rtol=1e-12)
        np.testing.assert_allclose(float(p.sum()), w + 2 * d, rtol=1e-12)
        c = float(cxs.conveyance(st, ht, rf, jnp.asarray(n), d,
                                 rect_mask=jnp.asarray(True)))
        a_, p_ = w * d, w + 2 * d
        np.testing.assert_allclose(c, a_ / n * (a_ / p_) ** (2 / 3),
                                   rtol=1e-12)


def test_triangular_section():
    """Symmetric V-notch, side slope 1H:1V: A = d², P = 2·d·√2."""
    st = jnp.asarray([0.0, 2.0, 4.0])
    ht = jnp.asarray([2.0, 0.0, 2.0])
    rf = jnp.ones(2)
    for d in (0.5, 1.0, 1.5):
        a, p = cxs.segment_wetted(st, ht, d)
        np.testing.assert_allclose(float(a.sum()), d * d, rtol=1e-12)
        np.testing.assert_allclose(float(p.sum()), 2 * d * np.sqrt(2.0),
                                   rtol=1e-12)


def test_depth_above_section_extends_walls():
    """Above the section top the area keeps growing with full width
    (d > dmax branch of get_cross_section_areas)."""
    st = jnp.asarray([0.0, 2.0, 4.0])
    ht = jnp.asarray([1.0, 0.0, 1.0])
    d = 1.5
    a, _ = cxs.segment_wetted(st, ht, d)
    # full triangle (2*0.5*1*2/2=1... area of V to rim) + rectangle above
    a_tri = 2 * (0.5 * 1.0 * 2.0)
    a_rect = 4.0 * 0.5
    np.testing.assert_allclose(float(a.sum()), a_tri + a_rect, rtol=1e-12)


def test_compound_roughness_fractions():
    """Segments with rf=2 contribute half the conveyance of rf=1."""
    w, n = 2.0, 0.03
    st = jnp.asarray([0.0, w])
    ht = jnp.asarray([0.0, 0.0])
    d = 1.0
    c1 = float(cxs.conveyance(st, ht, jnp.ones(1), jnp.asarray(n), d))
    c2 = float(cxs.conveyance(st, ht, 2 * jnp.ones(1), jnp.asarray(n), d))
    np.testing.assert_allclose(c1, 2 * c2, rtol=1e-12)


def test_pack_sections_padding_is_inert():
    st, ht, rf, rect = cxs.pack_sections([
        ([0.0, 0.0, 4.0, 4.0], [2.0, 0.0, 0.0, 2.0], None),
        ([0.0, 2.0], [0.0, 0.0], None),   # padded to 4 points
    ])
    a, p = cxs.segment_wetted(jnp.asarray(st), jnp.asarray(ht), 1.0)
    a = np.asarray(a)
    # second (short) section: area = 2*1 rect; padding segments add 0
    np.testing.assert_allclose(a[1].sum(), 2.0, rtol=1e-12)
    np.testing.assert_allclose(a[0].sum(), 4.0, rtol=1e-12)
    assert rect[0] and not rect[1]


def test_batched_matches_single():
    st, ht, rf, rect = cxs.pack_sections([
        ([0.0, 0.0, 4.0, 4.0], [2.0, 0.0, 0.0, 2.0], None),
        ([0.0, 2.0, 4.0], [2.0, 0.0, 2.0], None),
    ])
    st, ht, rf = jnp.asarray(st), jnp.asarray(ht), jnp.asarray(rf)
    rough = jnp.asarray([0.03, 0.05])
    d = jnp.asarray([0.7, 1.2])
    c = np.asarray(cxs.conveyance(st, ht, rf, rough, d))
    for i in range(2):
        ci = float(cxs.conveyance(st[i], ht[i], rf[i], rough[i], d[i]))
        np.testing.assert_allclose(c[i], ci, rtol=1e-12)
