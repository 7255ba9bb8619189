"""Unit tests for the CSG body model: closed-form SDFs, fold semantics,
generators.  Closed-form subjects per SURVEY §4 (sphere/box/cross SDFs at
known points, Menger body counts 1 + sum 20^k)."""

import math

import pytest

from raymarching_tpu.scene import generators
from raymarching_tpu.scene.csg import (BLACK, Box, Cross, ListNode, Mode,
                                       Sphere, bounds, count_primitives,
                                       iter_primitives, tree_depth)


def test_sphere_sdf_closed_form():
    s = Sphere(position=(1.0, 2.0, 3.0), radius=2.0)
    assert s.sdf((1.0, 2.0, 3.0)) == pytest.approx(-2.0)
    assert s.sdf((1.0, 2.0, 6.0)) == pytest.approx(1.0)
    assert s.sdf((1.0, 4.0, 3.0)) == pytest.approx(0.0)


def test_box_sdf_is_chebyshev():
    # Reference box SDF is the Chebyshev metric max(|p-c| - s/2)
    # (body.cpp:41-45) — NOT the Euclidean exterior distance.
    b = Box(position=(0.0, 0.0, 0.0), size=(2.0, 4.0, 6.0))
    assert b.sdf((0.0, 0.0, 0.0)) == pytest.approx(-1.0)
    assert b.sdf((2.0, 0.0, 0.0)) == pytest.approx(1.0)
    # corner point: Chebyshev gives max of per-axis excess, not the norm
    assert b.sdf((2.0, 3.0, 4.0)) == pytest.approx(1.0)


def test_cross_sdf_median_formula():
    # cross SD = sum - min - max = the MEDIAN of per-axis excesses
    # (body.cpp:51-57): inside the infinite slab pair on two axes.
    c = Cross(position=(0.0, 0.0, 0.0), size=(2.0, 2.0, 2.0))
    assert c.sdf((0.0, 0.0, 0.0)) == pytest.approx(-1.0)
    # far along one axis only: other two axes stay inside -> negative median
    assert c.sdf((5.0, 0.0, 0.0)) == pytest.approx(-1.0)
    # outside on two axes: median positive
    assert c.sdf((5.0, 5.0, 0.0)) == pytest.approx(4.0)


def test_union_min_and_first_wins_tie():
    a = Sphere((0, 0, 0), 1.0, color=(1, 0, 0))
    b = Sphere((0, 0, 0), 1.0, color=(0, 1, 0))
    sd, col = ListNode(Mode.UNION, [a, b]).sdf((0.0, 0.0, 3.0))
    assert sd == pytest.approx(2.0)
    assert col == (1, 0, 0)  # tie: earlier child wins (strict < fold)


def test_complement_negates_all_children():
    a = Sphere((0, 0, 0), 1.0, color=(1, 0, 0))
    sd, col = ListNode(Mode.COMPLEMENT, [a]).sdf((0.0, 0.0, 0.5))
    assert sd == pytest.approx(0.5)  # inside sphere -> positive complement
    assert col == (1, 0, 0)


def test_intersection_max():
    a = Sphere((0, 0, 0), 2.0)
    b = Sphere((1, 0, 0), 2.0)
    sd, _ = ListNode(Mode.INTERSECTION, [a, b]).sdf((0.0, 0.0, 0.0))
    assert sd == pytest.approx(-1.0)  # max(-2, -1)


def test_difference_first_minus_rest():
    a = Sphere((0, 0, 0), 2.0, color=(1, 1, 1))
    b = Sphere((0, 0, 0), 1.0, color=(0, 0, 1))
    node = ListNode(Mode.DIFFERENCE, [a, b])
    sd, col = node.sdf((0.0, 0.0, 0.0))
    assert sd == pytest.approx(1.0)  # max(-2, +1): inside the carved hole
    assert col == (0, 0, 1)
    sd, col = node.sdf((0.0, 0.0, 1.5))
    assert sd == pytest.approx(-0.5)  # in the shell
    assert col == (1, 1, 1)


def test_empty_list_inf_black():
    sd, col = ListNode(Mode.UNION, []).sdf((0.0, 0.0, 0.0))
    assert math.isinf(sd) and sd > 0
    assert col == BLACK


def test_bounds_is_inverted_black_box():
    node = bounds(200.0)
    assert node.mode == Mode.COMPLEMENT
    sd, col = node.sdf((0.0, 0.0, 0.0))
    assert sd == pytest.approx(100.0)  # inside the room: distance to walls
    assert col == BLACK
    sd, _ = node.sdf((150.0, 0.0, 0.0))
    assert sd == pytest.approx(-50.0)


@pytest.mark.parametrize("iters,count", [(1, 2), (2, 22), (3, 422)])
def test_menger_counts(iters, count):
    node = generators.menger_sponge((0, 0, 0), 9.0, iters)
    assert count_primitives(node) == count
    assert generators.menger_body_count(iters) == count
    assert node.mode == Mode.DIFFERENCE
    prims = list(iter_primitives(node))
    assert isinstance(prims[0], Box)
    assert all(isinstance(p, Cross) for p in prims[1:])


def test_menger_geometry():
    node = generators.menger_sponge((0, 0, 0), 9.0, 2)
    sd, _ = node.sdf((0.0, 0.0, 0.0))
    assert sd > 0  # centre is carved out by the big cross
    sd, _ = node.sdf((4.0, 4.0, 4.0))
    assert sd < 0  # corner subcube is solid
    sd, _ = node.sdf((20.0, 0.0, 0.0))
    assert sd > 0


def test_death_star():
    node = generators.death_star((0, 0, 0), 2.0, color=(0, 0, 1))
    assert count_primitives(node) == 2
    prims = list(iter_primitives(node))
    assert prims[1].position == (3.0, 0.0, 0.0)  # +1.5 r in x
    sd, _ = node.sdf((0.0, 0.0, 0.0))
    assert sd == pytest.approx(-1.0)  # max(-2, -(3-2)) = -1
    sd, _ = node.sdf((1.9, 0.0, 0.0))
    assert sd > 0  # inside the carved crater


def test_tree_depth():
    assert tree_depth(Sphere((0, 0, 0), 1.0)) == 0
    assert tree_depth(ListNode(Mode.UNION, [Sphere((0, 0, 0), 1.0)])) == 1
    nested = ListNode(Mode.UNION, [ListNode(Mode.DIFFERENCE,
                                            [Sphere((0, 0, 0), 1.0)])])
    assert tree_depth(nested) == 2
