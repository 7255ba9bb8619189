"""Surface-eval Pallas kernel (color argmin + FD normals) and exact shadow
early-termination: equivalence against the jnp oracle (interpret mode)."""

import jax
import numpy as np
import pytest

from raymarching_tpu import RenderConfig
from raymarching_tpu.api import make_render_hooks, render_tables
from raymarching_tpu.core import shading
from raymarching_tpu.core.march import march_while
from raymarching_tpu.core.render import render_image
from raymarching_tpu.core.sdf import scene_sd, scene_surface
from raymarching_tpu.ops.pallas_march import pallas_surface_eval
from raymarching_tpu.scene.compile import compile_tree
from raymarching_tpu.scene.csg import Box, ListNode, Mode, Sphere, bounds
from raymarching_tpu.scene.generators import death_star
from raymarching_tpu.scene.objects import Camera, Light


def _world():
    tree = ListNode(Mode.UNION, [
        bounds(60.0),
        Sphere((0.0, 0.0, -6.0), 2.5, color=(0.9, 0.4, 0.2)),
        death_star((4.0, 1.0, -8.0), 2.0, color=(0.2, 0.4, 0.9)),
        Box((0.0, -3.0, -6.0), (10.0, 1.0, 10.0), color=(0.6, 0.6, 0.9)),
    ])
    return compile_tree(tree, [Light((6.0, 8.0, 4.0)),
                               Light((-5.0, 6.0, 0.0))],
                        Camera(position=(0, 0, 6), fov=55.0))


def _pts(n=200, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(-8, 8, size=(n, 3)).astype(np.float32)


def test_surface_eval_color_index_matches_oracle():
    plan, tables = _world()
    p = _pts()
    sd, cidx, _ = pallas_surface_eval(plan.kernel, 1e-3, 8, p, tables,
                                      with_color=True, with_normal=False,
                                      interpret=True)
    sd_ref, color_ref = scene_surface(plan, tables, p)
    np.testing.assert_allclose(np.asarray(sd), np.asarray(sd_ref),
                               rtol=1e-6, atol=1e-5)
    color = np.where(np.asarray(cidx)[:, None] >= 0,
                     tables.prim_color[np.clip(np.asarray(cidx), 0, None)],
                     0.0)
    np.testing.assert_allclose(color, np.asarray(color_ref), atol=1e-6)


def test_surface_eval_fd_normal_matches_oracle():
    plan, tables = _world()
    p = _pts(seed=1)
    _, _, g = pallas_surface_eval(plan.kernel, 1e-3, 8, p, tables,
                                  with_color=False, with_normal=True,
                                  interpret=True)
    sd_fn = lambda q: scene_sd(plan, tables, q)
    g_ref = shading.normal_fd(sd_fn, p, 1e-3)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-3)


def test_shadow_tmax_boolean_exact():
    """Early termination at the light must give the identical shadow
    boolean as the reference's full march for every sample point."""
    plan, tables = _world()
    sd_fn = lambda p: scene_sd(plan, tables, p)
    rng = np.random.default_rng(2)
    # surface-ish points with upward-ish normals
    p = rng.uniform(-5, 5, size=(300, 3)).astype(np.float32)
    n = rng.normal(size=(300, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    for light in np.asarray(tables.light_pos):
        ray = light - (p + n * 2e-3)
        ray = ray / np.linalg.norm(ray, axis=-1, keepdims=True)
        start = p + n * 2e-3
        tmax = np.linalg.norm(light - start, axis=-1)
        full = march_while(sd_fn, start, ray, 1000, 1e-3)
        fast = march_while(sd_fn, start, ray, 1000, 1e-3, tmax=tmax)
        b_full = np.sum((light - np.asarray(full.position)) * ray, -1) > 0
        b_fast = np.sum((light - np.asarray(fast.position)) * ray, -1) > 0
        np.testing.assert_array_equal(b_fast, b_full)


def test_full_pallas_backend_render_and_grads_match_oracle():
    plan, tables = _world()
    cfg = RenderConfig(width=24, height=16, ssaa=2, iterations=80,
                       shadows=True, normal_mode="fd")
    img_p = np.asarray(render_tables(plan, tables, cfg, backend="pallas",
                                     interpret=True))
    img_r = np.asarray(render_tables(plan, tables, cfg, backend="ref"))
    # f32 fold-order differences at grazing rays can shift isolated pixels
    # by a few 1e-4; the image-level contract is tolerance-based.
    np.testing.assert_allclose(img_p, img_r, atol=5e-4)

    def loss(t, backend, interpret=False):
        img = render_tables(plan, t, cfg, backend=backend,
                            differentiable=True, interpret=interpret)
        return (img * img).mean()

    g_p = jax.grad(lambda t: loss(t, "pallas", True))(tables)
    g_j = jax.grad(lambda t: loss(t, "jnp"))(tables)
    g_r = jax.grad(lambda t: loss(t, "ref"))(tables)

    # The pallas kernels must reproduce the jnp IFT fast path tightly —
    # same backward formulation, kernel forwards plugged in.
    for field in ("prim_pos", "prim_aux", "prim_color", "light_pos",
                  "cam_position", "cam_fov"):
        a = np.asarray(getattr(g_p, field), np.float64)
        b = np.asarray(getattr(g_j, field), np.float64)
        scale = max(np.abs(b).max(), 1e-8)
        np.testing.assert_allclose(
            a, b, rtol=0.02, atol=0.005 * scale,
            err_msg=f"pallas-vs-jnp gradient mismatch in {field}")

    # Against the unrolled-autodiff oracle compare only the shading-side
    # fields: unrolled sphere-tracing gradients are ill-conditioned at
    # silhouettes (per-step Jacobians amplify ~1/(grad f . d)), polluting
    # every geometry-dependent parameter (positions, sizes, camera) on this
    # ssaa=2 scene; the IFT route is the well-behaved formulation.
    # test_grad.py compares the full set on a silhouette-light config.
    for field in ("prim_color", "light_pos"):
        a = np.asarray(getattr(g_p, field), np.float64)
        b = np.asarray(getattr(g_r, field), np.float64)
        scale = max(np.abs(b).max(), 1e-8)
        np.testing.assert_allclose(
            a, b, rtol=0.08, atol=0.03 * scale,
            err_msg=f"pallas-vs-ref gradient mismatch in {field}")
