"""Scene compiler + vectorized jnp SDF evaluation vs the pure-Python tree
oracle — the differential-testing backbone (SURVEY §4: dual-implementation
cross-check, formalized)."""

import numpy as np
import pytest

from raymarching_tpu.core.sdf import (scene_sd, scene_sd_kernel_form,
                                      scene_surface)
from raymarching_tpu.scene.compile import MIN, compile_scene, compile_tree
from raymarching_tpu.scene.csg import Box, Cross, ListNode, Mode, Sphere
from raymarching_tpu.scene.objects import Camera, Light
from raymarching_tpu.scene.parser import parse_scene


def _tree_eval(tree, pts):
    sd = np.array([tree.sdf(tuple(p))[0] for p in pts], np.float32)
    col = np.array([tree.sdf(tuple(p))[1] for p in pts], np.float32)
    return sd, col


def _check(tree, pts, rtol=1e-5, atol=2e-5):
    plan, tables = compile_tree(tree, [], Camera())
    sd_ref, col_ref = _tree_eval(tree, pts)
    sd = np.asarray(scene_sd(plan, tables, pts))
    scale = np.maximum(np.abs(sd_ref), 1.0)
    np.testing.assert_allclose(sd, sd_ref, rtol=rtol, atol=atol)
    sd2, col = scene_surface(plan, tables, pts)
    np.testing.assert_allclose(np.asarray(sd2), sd_ref, rtol=rtol, atol=atol)
    np.testing.assert_allclose(np.asarray(col), col_ref, rtol=rtol, atol=atol)
    if plan.kernel is not None:
        sdk = np.asarray(scene_sd_kernel_form(plan, tables, pts))
        np.testing.assert_allclose(sdk, sd, rtol=0, atol=0)
    return plan


def _pts(n=100, lo=-30, hi=30, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(lo, hi, size=(n, 3)).astype(np.float32)


def test_demo_scene_allclose(demo_scene_text):
    sc = parse_scene(demo_scene_text)
    plan, tables = compile_scene(sc)
    assert plan.num_primitives == 428
    assert plan.kernel is not None
    # bounds / [floor box] / DeathStar / [sphere+sphere] / Menger — the
    # floor and the two plain spheres are non-adjacent (generator groups
    # between them), so trivial-group merging (compile.py
    # _merge_trivial_groups) coalesces nothing but adjacency-split pairs;
    # demo lowers to 5 groups since the two mid-scene spheres merged.
    assert len(plan.kernel.groups) == 5
    pts = _pts(200, -60, 60)
    sd_ref, col_ref = _tree_eval(sc.tree, pts)
    sd = np.asarray(scene_sd(plan, tables, pts))
    np.testing.assert_allclose(sd, sd_ref, rtol=1e-5, atol=2e-5)
    sdk = np.asarray(scene_sd_kernel_form(plan, tables, pts))
    np.testing.assert_allclose(sdk, sd, rtol=0, atol=0)
    _, col = scene_surface(plan, tables, pts)
    np.testing.assert_allclose(np.asarray(col), col_ref, atol=1e-6)


@pytest.mark.parametrize("mode", list(Mode))
def test_single_level_modes(mode):
    tree = ListNode(mode, [
        Sphere((0, 0, 0), 2.0, color=(1, 0, 0)),
        Box((1, 1, 0), (2, 3, 4), color=(0, 1, 0)),
        Cross((-1, 0, 1), (2, 2, 2), color=(0, 0, 1)),
    ])
    _check(tree, _pts(100, -6, 6, seed=mode.value))


def test_nested_depth3_generic_plan():
    """Depth-3 tree exercises the generic post-order plan (no kernel form)."""
    inner = ListNode(Mode.DIFFERENCE, [
        Sphere((0, 0, 0), 3.0, color=(1, 0, 0)),
        Sphere((2, 0, 0), 2.0, color=(0, 1, 0)),
    ])
    mid = ListNode(Mode.INTERSECTION, [
        inner,
        Box((0, 0, 0), (5, 5, 5), color=(0, 0, 1)),
    ])
    root = ListNode(Mode.UNION, [
        mid,
        Sphere((6, 6, 6), 1.0, color=(1, 1, 0)),
    ])
    plan = _check(root, _pts(150, -8, 8, seed=3))
    assert plan.kernel is None


def test_complement_root():
    root = ListNode(Mode.COMPLEMENT, [
        Sphere((0, 0, 0), 2.0, color=(1, 0, 0)),
        Box((3, 0, 0), (2, 2, 2), color=(0, 1, 0)),
    ])
    plan = _check(root, _pts(100, -5, 5, seed=4))
    assert plan.kernel is not None


def test_difference_root_with_sublist():
    sub = ListNode(Mode.UNION, [
        Sphere((1, 0, 0), 1.0, color=(0, 1, 0)),
        Sphere((-1, 0, 0), 1.0, color=(0, 0, 1)),
    ])
    root = ListNode(Mode.DIFFERENCE, [
        Box((0, 0, 0), (6, 6, 6), color=(1, 0, 0)),
        sub,
    ])
    plan = _check(root, _pts(100, -4, 4, seed=5))
    assert plan.kernel is not None


def test_empty_root():
    plan, tables = compile_tree(ListNode(Mode.UNION, []), [], Camera())
    pts = _pts(4)
    sd = np.asarray(scene_sd(plan, tables, pts))
    assert np.all(np.isinf(sd)) and np.all(sd > 0)
    _, col = scene_surface(plan, tables, pts)
    np.testing.assert_array_equal(np.asarray(col), 0.0)  # black (body.cpp:67-70)


def test_empty_sublist_falls_back_to_generic():
    root = ListNode(Mode.UNION, [
        Sphere((0, 0, 0), 1.0, color=(1, 0, 0)),
        ListNode(Mode.UNION, []),
    ])
    plan = _check(root, _pts(50, -3, 3, seed=6))
    assert plan.kernel is None


def test_tie_break_color_first_wins():
    tree = ListNode(Mode.UNION, [
        Sphere((0, 0, 0), 1.0, color=(1, 0, 0)),
        Sphere((0, 0, 0), 1.0, color=(0, 1, 0)),
    ])
    plan, tables = compile_tree(tree, [], Camera())
    pts = np.array([[0.0, 0.0, 2.0]], np.float32)
    _, col = scene_surface(plan, tables, pts)
    np.testing.assert_allclose(np.asarray(col)[0], [1, 0, 0])


def test_tables_shapes(demo_scene_text):
    sc = parse_scene(demo_scene_text)
    plan, tables = compile_scene(sc)
    P = plan.num_primitives
    assert tables.prim_pos.shape == (P, 3)
    assert tables.prim_aux.shape == (P, 3)
    assert tables.prim_color.shape == (P, 3)
    assert tables.light_pos.shape == (2, 3)
    assert tables.cam_position.shape == (3,)
    assert tables.cam_fov.shape == ()
    # jit-staticness: plans must be hashable and equal across recompiles
    plan2, _ = compile_scene(parse_scene(demo_scene_text))
    assert hash(plan) == hash(plan2) and plan == plan2


def test_lights_table():
    plan, tables = compile_tree(
        ListNode(Mode.UNION, [Sphere((0, 0, 0), 1.0)]),
        [Light((1, 2, 3)), Light((4, 5, 6))], Camera())
    assert plan.num_lights == 2
    np.testing.assert_allclose(tables.light_pos, [[1, 2, 3], [4, 5, 6]])
    np.testing.assert_allclose(tables.light_color, 1.0)
