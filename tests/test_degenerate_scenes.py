"""Degenerate-scene robustness: the reference NaNs on scenes without Bounds
(rays march to infinity, scene.cpp:36-40 with no termination) and on empty
scenes (+inf SDF).  Our framework degrades gracefully: the march step clamp
and safe normalize keep every pixel finite, without perturbing any bounded
scene (the clamp is far beyond any real SDF value)."""

import numpy as np

from raymarching_tpu import RenderConfig, parse_scene, render_ref

CFG = RenderConfig(width=16, height=8, ssaa=1, iterations=50)


def test_empty_scene_black_finite():
    img = np.asarray(render_ref(parse_scene(""), CFG))
    assert np.all(np.isfinite(img))
    np.testing.assert_allclose(img, 0.0)


def test_unbounded_scene_finite():
    img = np.asarray(render_ref(parse_scene("Sphere 0 0 -5 1"), CFG))
    assert np.all(np.isfinite(img))


def test_lights_only_scene_finite():
    img = np.asarray(render_ref(parse_scene("Light 0 10 0"), CFG))
    assert np.all(np.isfinite(img))


def test_zero_light_scene_backends_agree():
    """compile_tree pads zero-light scenes with one all-white origin row so
    the kernel ABI always has a [>=1, 3] light table; the pad must never
    shade.  The kernels loop over the static plan.num_lights and were
    always immune — the oracle once looped over the padded table rows and
    lit a phantom light at the origin (regression, r2)."""
    from raymarching_tpu.api import render_tables
    from raymarching_tpu.scene.compile import compile_scene

    plan, tables = compile_scene(parse_scene("Sphere 0 0 -5 1"))
    imgs = {be: np.asarray(render_tables(plan, tables, CFG, backend=be,
                                         interpret=True))
            for be in ("ref", "jnp", "pallas", "mega")}
    # no light: every converged pixel sits exactly at the saturation floor
    assert imgs["ref"].max() <= CFG.saturation + 1e-6
    for be, img in imgs.items():
        np.testing.assert_allclose(img, imgs["ref"], atol=1e-5,
                                   err_msg=be)
