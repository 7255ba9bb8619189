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
