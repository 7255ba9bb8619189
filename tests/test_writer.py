"""Scene writer: text round trip and fitted-tables serialization."""

import numpy as np

from raymarching_tpu import compile_scene, parse_scene
from raymarching_tpu.core.sdf import scene_sd
from raymarching_tpu.scene.writer import scene_to_text, tables_to_text


def _points(n=64, seed=0, lo=-40, hi=40):
    rng = np.random.default_rng(seed)
    return rng.uniform(lo, hi, size=(n, 3)).astype(np.float32)


def test_demo_round_trip(demo_scene_text):
    scene = parse_scene(demo_scene_text)
    text2 = scene_to_text(scene)
    scene2 = parse_scene(text2)
    assert scene2.num_primitives == scene.num_primitives
    assert scene2.camera.fov == scene.camera.fov
    assert [l.position for l in scene2.lights] == \
        [l.position for l in scene.lights]

    plan1, tables1 = compile_scene(scene)
    plan2, tables2 = compile_scene(scene2)
    assert plan1 == plan2
    pts = _points()
    np.testing.assert_allclose(np.asarray(scene_sd(plan1, tables1, pts)),
                               np.asarray(scene_sd(plan2, tables2, pts)),
                               rtol=1e-6, atol=1e-5)


def test_fitted_tables_serialize(demo_scene_text):
    scene = parse_scene(demo_scene_text)
    plan, tables = compile_scene(scene)
    # nudge a primitive and a light, write, re-read
    pos = np.array(tables.prim_pos)
    pos[2, 0] += 0.25       # red sphere x (leaf 2 = deathstar base? safe)
    lp = np.array(tables.light_pos)
    lp[0, 1] -= 1.0
    tables = tables._replace(prim_pos=pos, light_pos=lp)

    text = tables_to_text(scene, tables)
    scene2 = parse_scene(text)
    _, tables2 = compile_scene(scene2)
    assert abs(float(tables2.light_pos[0, 1])
               - float(lp[0, 1])) < 1e-5
    # the nudged primitive's position survives (deathstar base sphere)
    assert abs(float(tables2.prim_pos[2, 0]) - float(pos[2, 0])) < 1e-5


def test_writer_output_loads_in_reference_grammar(demo_scene_text):
    """The emitted text uses ONLY reference grammar commands."""
    text = scene_to_text(parse_scene(demo_scene_text))
    allowed = {"Bounds", "Camera", "Light", "Color", "Sphere", "Box",
               "Cross", "DeathStar", "MengerSponge"}
    for line in text.splitlines():
        if line.strip():
            assert line.split()[0] in allowed, line
