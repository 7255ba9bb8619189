"""Soft shadows + ambient occlusion (opt-in extensions; reference has only
the hard boolean shadow, scene.cpp:45-50).

Contracts:
  * soft_shadow_k = 0 / ao_strength = 0 reproduce the reference-parity
    pipeline exactly (the defaults — every parity test keeps covering it);
  * k -> inf converges the penumbra factor to the hard boolean;
  * the mega kernel's in-kernel factor tracking matches the jnp oracle;
  * gradients still flow (factors are stop-gradient by definition) and the
    mega backward replay agrees with the jnp autodiff path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from raymarching_tpu import RenderConfig
from raymarching_tpu.api import render_tables
from raymarching_tpu.scene.compile import compile_tree
from raymarching_tpu.scene.csg import Box, ListNode, Mode, Sphere, bounds
from raymarching_tpu.scene.objects import Camera, Light
import pytest

CFG = RenderConfig(width=24, height=16, ssaa=2, iterations=80,
                   shadows=True, normal_mode="fd")


def _world():
    # sphere floating over a floor: real penumbrae + contact occlusion
    tree = ListNode(Mode.UNION, [
        bounds(60.0),
        Sphere((0.0, 0.0, -6.0), 1.8, color=(0.9, 0.4, 0.2)),
        Box((0.0, -3.0, -6.0), (10.0, 1.0, 10.0), color=(0.6, 0.6, 0.9)),
    ])
    return compile_tree(tree, [Light((6.0, 8.0, 4.0)),
                               Light((-5.0, 6.0, 0.0))],
                        Camera(position=(0, 2, 6), fov=55.0))


def _img(plan, tables, cfg, backend):
    return np.asarray(render_tables(plan, tables, cfg, backend=backend,
                                    interpret=True))


def test_zero_k_is_reference_parity():
    plan, tables = _world()
    base = _img(plan, tables, CFG, "ref")
    off = _img(plan, tables, CFG.replace(soft_shadow_k=0.0, ao_strength=0.0),
               "ref")
    np.testing.assert_array_equal(base, off)


def test_huge_k_converges_to_hard_shadow():
    plan, tables = _world()
    hard = _img(plan, tables, CFG, "ref")
    soft = _img(plan, tables, CFG.replace(soft_shadow_k=1e6), "ref")
    np.testing.assert_allclose(soft, hard, atol=1e-5)


def test_soft_shadow_mega_matches_jnp_oracle():
    plan, tables = _world()
    cfg = CFG.replace(soft_shadow_k=8.0)
    a = _img(plan, tables, cfg, "ref")
    b = _img(plan, tables, cfg, "mega")
    np.testing.assert_allclose(b, a, atol=1e-4)


def test_ao_mega_matches_jnp_oracle():
    plan, tables = _world()
    cfg = CFG.replace(ao_strength=1.0)
    a = _img(plan, tables, cfg, "ref")
    b = _img(plan, tables, cfg, "mega")
    np.testing.assert_allclose(b, a, atol=1e-4)


def test_soft_and_ao_combined_mega_matches_jnp_oracle():
    plan, tables = _world()
    cfg = CFG.replace(soft_shadow_k=4.0, ao_strength=0.7)
    a = _img(plan, tables, cfg, "ref")
    b = _img(plan, tables, cfg, "mega")
    np.testing.assert_allclose(b, a, atol=1e-4)


def test_soft_shadow_produces_penumbra():
    """Finite k visibly widens/attenuates the shadow edge.  (No pointwise
    <= claim: a per-light Lambert term can be NEGATIVE, so attenuating it
    can RAISE the total — the factor scales, the clamp sums.)"""
    plan, tables = _world()
    hard = _img(plan, tables, CFG, "ref")
    soft = _img(plan, tables, CFG.replace(soft_shadow_k=4.0), "ref")
    assert np.abs(hard - soft).max() > 0.05


def test_ao_darkens_contact_regions():
    """AO multiplies the clamped (>= saturation > 0) light by a factor in
    [0, 1]: pointwise ao <= base, with a real effect near the
    sphere-floor contact."""
    plan, tables = _world()
    cfg = CFG.replace(ao_strength=2.0, ao_delta=0.3)
    base = _img(plan, tables, CFG, "ref")
    ao = _img(plan, tables, cfg, "ref")
    assert (ao <= base + 1e-6).all()
    assert (base - ao).max() > 5e-3


def test_soft_ao_gradients_fused_analytic_winner_bwd():
    """soft shadows + AO through the single-launch fused winner backward
    (pallas_render._fused_analytic_bwd): the saved sfac/aofac factors must
    replay as stop-gradient constants exactly as on the jnp route.  The
    world needs a generator so the fused path is live."""
    from raymarching_tpu.scene.generators import death_star

    tree = ListNode(Mode.UNION, [
        bounds(60.0),
        Sphere((0.0, 0.0, -6.0), 1.8, color=(0.9, 0.4, 0.2)),
        death_star((2.8, 0.5, -5.0), 1.0, color=(0.3, 0.4, 0.9)),
        Box((0.0, -3.0, -6.0), (10.0, 1.0, 10.0), color=(0.6, 0.6, 0.9)),
    ])
    plan, tables = compile_tree(tree, [Light((6.0, 8.0, 4.0))],
                                Camera(position=(0, 2, 6), fov=55.0))
    cfg = CFG.replace(soft_shadow_k=6.0, ao_strength=0.8,
                      fused_generators=True, normal_mode="analytic")

    def loss(t, backend, interpret=False):
        img = render_tables(plan, t, cfg, backend=backend,
                            interpret=interpret, differentiable=True)
        return jnp.mean(img * img)

    gm = jax.grad(lambda t: loss(t, "mega", True))(tables)
    gj = jax.grad(lambda t: loss(t, "jnp"))(tables)
    for field in ("prim_pos", "prim_aux", "light_pos"):
        a = np.asarray(getattr(gm, field), np.float64)
        b = np.asarray(getattr(gj, field), np.float64)
        assert np.isfinite(a).all(), f"non-finite mega grad in {field}"
        scale = max(np.abs(b).max(), 1e-8)
        np.testing.assert_allclose(
            a, b, rtol=0.02, atol=0.02 * scale,
            err_msg=f"fused-analytic soft/AO mismatch in {field}")


def test_soft_ao_gradients_mega_match_jnp():
    plan, tables = _world()
    cfg = CFG.replace(soft_shadow_k=6.0, ao_strength=0.8)

    def loss(t, backend, interpret=False):
        img = render_tables(plan, t, cfg, backend=backend,
                            interpret=interpret, differentiable=True)
        return jnp.mean(img * img)

    gm = jax.grad(lambda t: loss(t, "mega", True))(tables)
    gj = jax.grad(lambda t: loss(t, "jnp"))(tables)
    for field in ("prim_pos", "prim_aux", "prim_color", "light_pos",
                  "cam_position", "cam_direction", "cam_up", "cam_fov"):
        a = np.asarray(getattr(gm, field), np.float64)
        b = np.asarray(getattr(gj, field), np.float64)
        assert np.isfinite(a).all(), f"non-finite mega grad in {field}"
        scale = max(np.abs(b).max(), 1e-8)
        np.testing.assert_allclose(
            a, b, rtol=0.02, atol=0.005 * scale,
            err_msg=f"mega gradient mismatch in {field}")


@pytest.mark.slow
def test_soft_ao_gradients_ref_oracle_matches_jnp():
    """The unrolled-autodiff oracle (scan march + stop-gradient factors)
    and the IFT fast path agree on gradients with soft+AO on.  (No FD
    check: FD sees the penumbra/occlusion motion that stop_gradient
    deliberately treats as constant — by design, matching the boolean
    shadow's gradient policy.)"""
    plan, tables = _world()
    cfg = CFG.replace(width=12, height=8, ssaa=1, iterations=60,
                      soft_shadow_k=6.0, ao_strength=0.8)

    def loss(t, backend):
        img = render_tables(plan, t, cfg, backend=backend,
                            differentiable=True)
        return jnp.mean(img)

    gr = jax.grad(lambda t: loss(t, "ref"))(tables)
    gj = jax.grad(lambda t: loss(t, "jnp"))(tables)
    for field in ("prim_pos", "prim_aux", "prim_color", "light_pos"):
        a = np.asarray(getattr(gr, field), np.float64)
        b = np.asarray(getattr(gj, field), np.float64)
        assert np.isfinite(a).all() and np.isfinite(b).all()
        scale = max(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(
            b, a, rtol=0.02, atol=0.005 * scale,
            err_msg=f"ref-vs-jnp gradient mismatch in {field}")
