"""Named materials (``Material <name> <r> <g> <b>`` + ``Color <name>``):
a scene-format extension, pure sugar over the reference's running-color
state (scene.cpp:99,183-185) — materials never reach the compiled tables."""

import numpy as np
import pytest

from raymarching_tpu import compile_scene, parse_scene

SCENE = """
Material steel 0.6 0.6 0.65
Material lava 0.9 0.2 0.05
Bounds 60
Color steel
Sphere 0 0 -5 1
Color lava
Box 2 0 -5 1 1 1
Color 0.1 0.8 0.1
Sphere -2 0 -5 1
"""


def test_material_colors_land_on_prims():
    scene = parse_scene(SCENE)
    _, tables = compile_scene(scene)
    colors = np.asarray(tables.prim_color)
    # prims: bounds box (black), steel sphere, lava box, numeric sphere
    np.testing.assert_allclose(colors[1], [0.6, 0.6, 0.65])
    np.testing.assert_allclose(colors[2], [0.9, 0.2, 0.05])
    np.testing.assert_allclose(colors[3], [0.1, 0.8, 0.1])


def test_unknown_material_is_parse_error():
    with pytest.raises(ValueError, match="malformed scene line"):
        parse_scene("Color chrome\nSphere 0 0 -5 1\n")


def test_malformed_material_is_parse_error():
    with pytest.raises(ValueError, match="malformed scene line"):
        parse_scene("Material steel 0.5 0.5\n")


def test_redefinition_later_wins():
    scene = parse_scene("Material m 1 0 0\n"
                        "Color m\nSphere 0 0 -5 1\n"
                        "Material m 0 0 1\n"
                        "Color m\nSphere 2 0 -5 1\n")
    _, tables = compile_scene(scene)
    colors = np.asarray(tables.prim_color)
    np.testing.assert_allclose(colors[0], [1, 0, 0])
    np.testing.assert_allclose(colors[1], [0, 0, 1])


def test_light_color_by_material_name():
    scene = parse_scene("Material warm 1 0.8 0.6\n"
                        "LightColor warm\nLight 5 8 5\n"
                        "Sphere 0 0 -5 1\n")
    np.testing.assert_allclose(scene.lights[0].color, [1, 0.8, 0.6])


def test_native_parser_material_parity():
    """The C++ twin resolves material names to the same prim colors."""
    from raymarching_tpu.native import available, native_parse_scene

    if not available():
        pytest.skip("native library not built")
    res = native_parse_scene(SCENE)
    _, tables = compile_scene(parse_scene(SCENE))
    np.testing.assert_allclose(res["prim_color"], tables.prim_color, atol=0)


def test_native_parser_unknown_material_fails():
    from raymarching_tpu.native import available, native_parse_scene

    if not available():
        pytest.skip("native library not built")
    with pytest.raises(ValueError):
        native_parse_scene("Color chrome\nSphere 0 0 -5 1\n")
