"""Colored lights (the ``LightColor`` scene-format extension).

The reference declares a per-light color field but never parses a value for
it (object.h:24, scene.cpp:154-158) — every reference light is white, and
``light*color`` shading ignores light color entirely.  Here the field is
wired: a ``LightColor`` line colors subsequent lights, shading accumulates
per channel, and gradients flow to ``tables.light_color``.  White-light
scenes take the scalar path (plan.colored_lights=False), which is
bit-identical — the reference parity surface is untouched.
"""

import jax
import jax.numpy as jnp
import numpy as np

from raymarching_tpu import RenderConfig, parse_scene
from raymarching_tpu.api import render_tables
from raymarching_tpu.scene.compile import compile_scene

CFG = RenderConfig(width=32, height=24, ssaa=1, iterations=80,
                   shadows=True, normal_mode="fd")

SCENE = """
Bounds 60.0
Camera Position 0 0 8
LightColor 1 0.2 0.2
Light 6 8 5
LightColor 0.2 0.2 1
Light -6 8 5
Color 0.9 0.9 0.9
Sphere 0 0 -4 2
Box 0 -3 -4 12 1 12
"""


def _world():
    scene = parse_scene(SCENE)
    assert [l.color for l in scene.lights] == [(1.0, 0.2, 0.2),
                                               (0.2, 0.2, 1.0)]
    return compile_scene(scene)


def test_parser_and_plan_flag():
    plan, tables = _world()
    assert plan.colored_lights
    np.testing.assert_allclose(tables.light_color,
                               [[1, 0.2, 0.2], [0.2, 0.2, 1]], rtol=1e-6)
    white = compile_scene(parse_scene("Light 1 2 3\nSphere 0 0 -4 1"))[0]
    assert not white.colored_lights


def test_colored_render_is_actually_colored():
    plan, tables = _world()
    img = np.asarray(render_tables(plan, tables, CFG, backend="ref"))
    lit = img[img.max(axis=-1) > 0.2]
    # red light from +x, blue from -x: channels must differ somewhere
    assert np.abs(lit[:, 0] - lit[:, 2]).max() > 0.1


def test_colored_backends_agree():
    plan, tables = _world()
    r = np.asarray(render_tables(plan, tables, CFG, backend="ref"))
    j = np.asarray(render_tables(plan, tables, CFG, backend="jnp"))
    m = np.asarray(render_tables(plan, tables, CFG, backend="mega",
                                 interpret=True))
    np.testing.assert_allclose(j, r, atol=5e-4)
    diff = np.abs(m - r).max(axis=-1)
    assert (diff < 5e-3).mean() > 0.99
    assert np.median(diff) < 1e-4


def test_light_color_gradients_flow():
    plan, tables = _world()

    def loss(t, backend, interpret=False):
        img = render_tables(plan, t, CFG, backend=backend,
                            interpret=interpret, differentiable=True)
        return jnp.mean(img * img)

    gj = jax.grad(lambda t: loss(t, "jnp"))(tables)
    assert float(np.abs(np.asarray(gj.light_color)).max()) > 1e-6
    gm = jax.grad(lambda t: loss(t, "mega", True))(tables)
    a = np.asarray(gm.light_color, np.float64)
    b = np.asarray(gj.light_color, np.float64)
    np.testing.assert_allclose(a, b, rtol=0.02,
                               atol=0.005 * np.abs(b).max())


def test_white_lights_identical_scalar_path():
    """A white-light scene renders identically whether or not the colored
    machinery exists (guards the parity surface)."""
    scene = parse_scene(SCENE.replace("LightColor 1 0.2 0.2", "")
                        .replace("LightColor 0.2 0.2 1", ""))
    plan, tables = compile_scene(scene)
    assert not plan.colored_lights
    import dataclasses
    forced = dataclasses.replace(plan, colored_lights=True)
    a = np.asarray(render_tables(plan, tables, CFG, backend="ref"))
    b = np.asarray(render_tables(forced, tables, CFG, backend="ref"))
    np.testing.assert_array_equal(a, b)


def test_writer_roundtrip_light_color():
    from raymarching_tpu.scene.writer import scene_to_text

    scene = parse_scene(SCENE)
    text = scene_to_text(scene)
    again = parse_scene(text)
    assert [l.color for l in again.lights] == [l.color for l in scene.lights]
    assert [l.position for l in again.lights] == \
        [l.position for l in scene.lights]


def test_native_parser_lightcolor_parity():
    """The C++ twin parses the LightColor extension: running color state
    applied to subsequent Light lines, white default, crossing the ABI in
    the light_colors lane."""
    import pytest

    from raymarching_tpu import compile_scene
    from raymarching_tpu.native import available, native_parse_scene

    if not available():
        pytest.skip("native library not built")
    text = ("Light 1 2 3\n"                      # before any LightColor
            "LightColor 1 0 0\n"
            "Light 6 8 5\n"
            "LightColor 0.2 0.4 1\n"
            "Light -4 2 0\n"
            "Sphere 0 0 -5 1\n")
    res = native_parse_scene(text)
    plan, tables = compile_scene(parse_scene(text))
    np.testing.assert_allclose(res["light_colors"], tables.light_color,
                               atol=0)
    np.testing.assert_allclose(res["lights"], tables.light_pos, atol=0)
