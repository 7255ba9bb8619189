"""Scene parser tests against the demo scene (reference scene/objects.txt
semantics, loader at scene.cpp:92-190)."""

import numpy as np
import pytest

from raymarching_tpu.scene.csg import (Box, Cross, ListNode, Mode, Sphere,
                                       count_primitives)
from raymarching_tpu.scene.parser import parse_scene


def test_demo_scene_structure(demo_scene_text):
    sc = parse_scene(demo_scene_text)
    root = sc.tree
    assert root.mode == Mode.UNION
    # Bounds, floor box, DeathStar, 2 spheres, MengerSponge
    assert len(root.children) == 6
    assert count_primitives(root) == 428
    assert len(sc.lights) == 2
    assert sc.lights[0].position == (-15.0, 40.0, -20.0)
    assert sc.lights[0].color == (1.0, 1.0, 1.0)  # parser never sets color

    bounds_node, floor, ds, red, green, menger = root.children
    assert isinstance(bounds_node, ListNode)
    assert bounds_node.mode == Mode.COMPLEMENT
    assert bounds_node.children[0].size == (200.0, 200.0, 200.0)
    assert bounds_node.children[0].color == (0.0, 0.0, 0.0)

    assert isinstance(floor, Box) and floor.color == (1.0, 1.0, 1.0)
    assert isinstance(ds, ListNode) and ds.mode == Mode.DIFFERENCE
    assert ds.children[0].color == (0.0, 0.0, 1.0)
    assert isinstance(red, Sphere) and red.color == (1.0, 0.0, 0.0)
    assert red.radius == 7.0
    assert isinstance(green, Sphere) and green.color == (0.0, 1.0, 0.0)
    assert isinstance(menger, ListNode)
    assert count_primitives(menger) == 422
    assert menger.children[0].color == (1.0, 1.0, 1.0)


def test_camera_parsing(demo_scene_text):
    cam = parse_scene(demo_scene_text).camera
    assert cam.position == (50.0, 35.0, -2.5)
    assert cam.direction == (-1.0, -0.5, -1.0)
    assert cam.up == (0.0, 1.0, 0.0)
    assert cam.fov == 75.0


def test_camera_defaults():
    cam = parse_scene("Sphere 0 0 0 1").camera
    assert cam.position == (0.0, 0.0, 0.0)
    assert cam.direction == (0.0, 0.0, -1.0)
    assert cam.up == (0.0, 1.0, 0.0)
    assert cam.fov == 90.0


def test_color_state_machine():
    sc = parse_scene("""
Sphere 0 0 0 1
Color 0.5 0.25 0.125
Sphere 1 0 0 1
Sphere 2 0 0 1
""")
    a, b, c = sc.tree.children
    assert a.color == (1.0, 1.0, 1.0)  # default white before any Color
    assert b.color == (0.5, 0.25, 0.125)
    assert c.color == (0.5, 0.25, 0.125)  # color persists


def test_unknown_keywords_ignored():
    sc = parse_scene("""# a comment-ish line
NotACommand 1 2 3
Sphere 0 0 0 1
""")
    assert count_primitives(sc.tree) == 1


def test_camera_lookat_matrix(demo_scene_text):
    """Look-at construction vs hand-computed values (object.cpp:23-33)."""
    cam = parse_scene(demo_scene_text).camera
    d = np.array([-1.0, -0.5, -1.0])
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(d, up)
    right /= np.linalg.norm(right)
    up2 = np.cross(right, d)
    up2 /= np.linalg.norm(up2)
    fwd = d / np.linalg.norm(d)
    R = cam.rotation()
    np.testing.assert_allclose(R[:, 0], right, atol=1e-6)
    np.testing.assert_allclose(R[:, 1], up2, atol=1e-6)
    np.testing.assert_allclose(R[:, 2], -fwd, atol=1e-6)
    # rotation matrix sanity
    np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-6)
    # focal = 2 tan(75 deg / 2)
    assert cam.focal == pytest.approx(2.0 * np.tan(np.deg2rad(37.5)), rel=1e-6)
    # view() applies rotation (+ offset for points)
    v = cam.view((0.0, 0.0, -1.0), offset=False)
    np.testing.assert_allclose(v, fwd, atol=1e-6)
    p = cam.view((0.0, 0.0, 0.0), offset=True)
    np.testing.assert_allclose(p, cam.position, atol=1e-6)
