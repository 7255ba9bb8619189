"""Arbitrary ray bundles (api.render_rays) and batched multi-frame
rendering (api.render_frames): per-ray origins through the mega kernel
(three VMEM streams instead of the SMEM origin broadcast) — no reference
equivalent (its rays only come from the camera grid, render.cpp:92-101)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raymarching_tpu import RenderConfig, parse_scene
from raymarching_tpu.api import render_frames, render_rays, render_tables
from raymarching_tpu.core import camera as cam
from raymarching_tpu.scene.compile import compile_scene

SCENE = """
Bounds 60
Light 0 8 2
Color 0.9 0.1 0.1
Sphere -1.2 0 -6 1.5
Color 0.9 0.9 0.9
Box 0 -2.5 -6 8 0.5 8
Camera Position 0 1.5 2
"""

CFG = RenderConfig(width=32, height=24, ssaa=1, iterations=150)


@pytest.fixture(scope="module")
def world():
    return compile_scene(parse_scene(SCENE))


def _camera_bundle(tables, cfg):
    o, d = cam.generate_rays(tables, cfg)
    return np.asarray(o), np.asarray(d.reshape(-1, 3))


def test_shared_origin_matches_mega_bitwise(world):
    plan, tables = world
    o, flat = _camera_bundle(tables, CFG)
    colors = np.asarray(render_rays(plan, tables, o, flat, CFG))
    img = np.asarray(render_tables(plan, tables, CFG, backend="mega",
                                   interpret=True))
    np.testing.assert_array_equal(
        colors.reshape(CFG.height, CFG.width, 3), img)


def test_per_ray_origins_equal_shared(world):
    plan, tables = world
    o, flat = _camera_bundle(tables, CFG)
    shared = np.asarray(render_rays(plan, tables, o, flat, CFG))
    per_ray = np.asarray(render_rays(
        plan, tables, np.broadcast_to(o, flat.shape).copy(), flat, CFG))
    np.testing.assert_array_equal(per_ray, shared)


def test_mixed_origin_bundle_matches_separate_renders(world):
    plan, tables = world
    o1, d1 = _camera_bundle(tables, CFG)
    o2 = o1 + np.array([0.5, 0.2, 1.0], np.float32)
    t2 = tables._replace(cam_position=jnp.asarray(o2))
    _, d2 = _camera_bundle(t2, CFG)
    bundle_o = np.concatenate([np.broadcast_to(o1, d1.shape),
                               np.broadcast_to(o2, d2.shape)])
    bundle_d = np.concatenate([d1, d2])
    colors = np.asarray(render_rays(plan, tables, bundle_o, bundle_d, CFG))
    H, W = CFG.height, CFG.width
    img1 = np.asarray(render_tables(plan, tables, CFG, backend="mega",
                                    interpret=True))
    img2 = np.asarray(render_tables(plan, t2, CFG, backend="mega",
                                    interpret=True))
    np.testing.assert_array_equal(colors[:d1.shape[0]].reshape(H, W, 3),
                                  img1)
    np.testing.assert_array_equal(colors[d1.shape[0]:].reshape(H, W, 3),
                                  img2)


def test_chunked_equals_unchunked_and_grads_flow(world):
    plan, tables = world
    o, flat = _camera_bundle(tables, CFG)
    bundle_o = np.broadcast_to(o, flat.shape).copy()
    whole = np.asarray(render_rays(plan, tables, bundle_o, flat, CFG))
    cfgc = CFG.replace(ray_chunk=256)
    chunked = np.asarray(render_rays(plan, tables, bundle_o, flat, cfgc))
    np.testing.assert_array_equal(chunked, whole)

    g = jax.grad(lambda t: jnp.mean(
        render_rays(plan, t, bundle_o, flat, cfgc)))(tables)
    gp = np.asarray(g.prim_pos)
    assert np.isfinite(gp).all() and np.abs(gp).sum() > 0


def test_per_ray_origin_gradients_match_broadcast(world):
    """A [R,3] all-equal origin bundle must produce the same tables
    gradient as the [3] broadcast origin (the backward's per-ray o_bar
    branch vs the summed one)."""
    plan, tables = world
    cfg = CFG.replace(width=16, height=8)
    o, flat = _camera_bundle(tables, cfg)

    g_shared = jax.grad(lambda t: jnp.mean(
        render_rays(plan, t, o, flat, cfg)))(tables)
    g_perray = jax.grad(lambda t: jnp.mean(
        render_rays(plan, t, np.broadcast_to(o, flat.shape).copy(),
                    flat, cfg)))(tables)
    for f in ("prim_pos", "prim_color", "light_pos"):
        np.testing.assert_allclose(np.asarray(getattr(g_perray, f)),
                                   np.asarray(getattr(g_shared, f)),
                                   atol=1e-7, err_msg=f)


def test_origin_and_dir_gradients_match_unrolled_oracle(world):
    """The pose route: cotangents w.r.t. the ray ORIGINS and DIRECTIONS
    themselves (what camera-pose fitting / bundle adjustment
    differentiates) must agree with unrolled autodiff through the jnp
    oracle.  Ground truth is core.render._shade_rays with
    differentiable=True, which marches per-ray origins by unrolling."""
    from raymarching_tpu.core.render import _shade_rays

    plan, tables = world
    cfg = CFG.replace(width=16, height=8, iterations=120)
    o, flat = _camera_bundle(tables, cfg)
    bundle_o = jnp.asarray(np.broadcast_to(o, flat.shape).copy())
    dirs = jnp.asarray(flat)
    w = jnp.asarray(np.random.default_rng(0).standard_normal(
        (flat.shape[0], 3)), jnp.float32)

    def loss_mega(oo, dd):
        return jnp.mean(w * render_rays(plan, tables, oo, dd, cfg))

    def loss_ref(oo, dd):
        return jnp.mean(w * _shade_rays(plan, tables, cfg, oo, dd,
                                        differentiable=True))

    go_m, gd_m = jax.grad(loss_mega, argnums=(0, 1))(bundle_o, dirs)
    go_r, gd_r = jax.grad(loss_ref, argnums=(0, 1))(bundle_o, dirs)
    for name, a, b in (("origins", go_r, go_m), ("dirs", gd_r, gd_m)):
        a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
        assert np.isfinite(b).all(), name
        scale = np.abs(a).max() + 1e-12
        # IFT vs unrolled: small per-element noise near silhouettes
        assert np.abs(a - b).max() / scale < 0.08, name
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30)
        assert cos > 0.995, (name, cos)


def test_reflections_through_per_ray_origins(world):
    plan, tables = world
    cfg = CFG.replace(reflect_strength=0.4)
    o, flat = _camera_bundle(tables, cfg)
    colors = np.asarray(render_rays(
        plan, tables, np.broadcast_to(o, flat.shape).copy(), flat, cfg))
    img = np.asarray(render_tables(plan, tables, cfg, backend="mega",
                                   interpret=True))
    np.testing.assert_array_equal(
        colors.reshape(cfg.height, cfg.width, 3), img)


def test_render_frames_matches_sequential(world):
    plan, tables = world
    o = np.asarray(tables.cam_position, np.float32)
    poses = np.stack([o, o + [0.5, 0.2, 1.0], o + [0, 1, 0]])
    d = np.asarray(tables.cam_direction, np.float32)
    dirs = np.stack([d, d, d])
    frames = np.asarray(render_frames(plan, tables, CFG, poses, dirs))
    assert frames.shape == (3, CFG.height, CFG.width, 3)
    for i in range(3):
        ti = tables._replace(cam_position=jnp.asarray(poses[i]),
                             cam_direction=jnp.asarray(dirs[i]))
        ref = np.asarray(render_tables(plan, ti, CFG, backend="mega",
                                       interpret=True))
        np.testing.assert_array_equal(frames[i], ref)
