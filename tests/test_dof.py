"""Thin-lens depth of field (cfg.aperture / cfg.focus_dist): a pure
framework extension — the reference camera is an ideal pinhole
(render.cpp:92-101).  Model: every SSAA sample's origin moves to a
deterministic sunflower point on the lens disk and is re-aimed at the
pinhole ray's focal point, so the existing SSAA mean integrates the lens.

Contracts: lens geometry (origins on the disk, unit dirs, focal-point
convergence), focus plane stays sharp while off-plane geometry blurs,
mega == jnp oracle, gradients flow through the bundle, and aperture=0
is the untouched pinhole path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raymarching_tpu import RenderConfig, parse_scene
from raymarching_tpu.api import render_tables
from raymarching_tpu.core import camera as cam
from raymarching_tpu.scene.compile import compile_scene


def _scene(z):
    return compile_scene(parse_scene(f"""
Bounds 80
Light 4 10 4
Color 0.9 0.2 0.1
Sphere 0 0 {z} 1.0
Camera Position 0 0 6
"""))


CFG = RenderConfig(width=48, height=36, ssaa=3, iterations=200,
                   aperture=0.25, focus_dist=10.0, shadows=False)


def test_lens_geometry():
    plan, tables = _scene(-4.0)
    o, d = cam.generate_rays_dof(tables, CFG)
    assert o.shape == d.shape == (36, 48, 9, 3)
    # unit directions
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=-1),
                               1.0, atol=1e-5)
    # origins on the lens disk around the camera position
    r = np.linalg.norm(np.asarray(o) - np.asarray(tables.cam_position),
                       axis=-1)
    assert r.max() <= CFG.aperture + 1e-6
    assert r.min() > 0.0                     # every sample offset (s+0.5)
    # each DOF ray crosses the focus plane at ITS pinhole ray's focal
    # point: o' lies in the lens plane ((o'-o).fwd = 0), so the crossing
    # is o' + (F / d'.fwd) d' and must equal o_pin + (F / d_pin.fwd) d_pin
    _, d_pin = cam.generate_rays(tables, CFG)
    R = cam.camera_rotation(tables.cam_direction, tables.cam_up)
    fwd = -np.asarray(R[:, 2])
    cpos = np.asarray(tables.cam_position)
    t_pin = CFG.focus_dist / np.einsum("...k,k->...", np.asarray(d_pin),
                                       fwd)
    pf_pin = cpos + t_pin[..., None] * np.asarray(d_pin)
    t_dof = CFG.focus_dist / np.einsum("...k,k->...", np.asarray(d), fwd)
    pf_dof = np.asarray(o) + t_dof[..., None] * np.asarray(d)
    np.testing.assert_allclose(pf_dof, pf_pin, atol=1e-4)


def test_focus_plane_sharp_blur_off_plane():
    """A sphere ON the focus plane barely changes vs the pinhole render;
    the same sphere far off-plane changes a lot (defocus blur)."""
    pin = CFG.replace(aperture=0.0)
    # camera at z=6, focus_dist=10 -> focus plane at z=-4
    diffs = {}
    for z in (-4.0, -34.0):
        plan, tables = _scene(z)
        a = np.asarray(render_tables(plan, tables, pin, backend="jnp"))
        b = np.asarray(render_tables(plan, tables, CFG, backend="jnp"))
        diffs[z] = np.abs(a - b).mean()
    assert diffs[-34.0] > 4.0 * max(diffs[-4.0], 1e-6), diffs


def test_mega_matches_jnp():
    plan, tables = _scene(-13.0)
    a = np.asarray(render_tables(plan, tables, CFG, backend="jnp"))
    m = np.asarray(render_tables(plan, tables, CFG, backend="mega",
                                 interpret=True))
    np.testing.assert_allclose(a, m, atol=2e-3)


def test_dof_gradients_flow():
    plan, tables = _scene(-13.0)
    cfg = CFG.replace(width=16, height=12, ssaa=2, iterations=120)
    g = jax.grad(lambda t: jnp.mean(render_tables(
        plan, t, cfg, backend="mega", interpret=True)))(tables)
    gp = np.asarray(g.prim_pos)
    assert np.isfinite(gp).all()
    assert np.abs(gp).max() > 0.0


def test_chunked_matches_unchunked():
    plan, tables = _scene(-13.0)
    cfg = CFG.replace(width=16, height=12, ssaa=2, iterations=120)
    a = np.asarray(render_tables(plan, tables, cfg, backend="jnp"))
    b = np.asarray(render_tables(plan, tables,
                                 cfg.replace(ray_chunk=128), backend="jnp"))
    # chunked/unchunked compile to different XLA fusions; isolated pixels
    # can move by float-reassociation noise (measured 4e-6 max)
    np.testing.assert_allclose(a, b, atol=1e-5)
