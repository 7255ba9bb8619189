"""When the upstream reference checkout is present, parse ITS scene file
directly and check it produces identical tables to our committed mirror —
proving 'existing objects.txt files run unchanged'."""

import os

import numpy as np
import pytest

from raymarching_tpu import compile_scene, parse_scene

REF = "/root/reference/scene/objects.txt"

pytestmark = pytest.mark.skipif(not os.path.exists(REF),
                                reason="reference checkout not present")


def test_reference_objects_txt_loads_identically(demo_scene_text):
    ref_scene = parse_scene(open(REF).read())
    ours = parse_scene(demo_scene_text)
    assert ref_scene.num_primitives == ours.num_primitives == 428

    plan_r, tables_r = compile_scene(ref_scene)
    plan_o, tables_o = compile_scene(ours)
    assert plan_r == plan_o
    for field in tables_r._fields:
        np.testing.assert_array_equal(np.asarray(getattr(tables_r, field)),
                                      np.asarray(getattr(tables_o, field)),
                                      err_msg=field)
