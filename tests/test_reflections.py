"""Mirror reflections (cfg.reflect_strength / reflect_bounces): a pure
framework extension — the reference pipeline is single-bounce Lambert only
(render.cpp:104-115).  Tinted-mirror model: c = color * ((1-s) light +
s c_reflected), bounce origin pushed off the surface like a shadow ray.

Contracts covered here: jnp == ref oracle, mega kernel == jnp (in-kernel
bounce loop), pallas multi-kernel == jnp (hook recursion with per-ray
origins), s=0 bit-parity with the baseline, and differentiability on all
three routes — ref (unrolled), pallas (IFT through the hook recursion),
and mega (anchored-replay chain backward, ops.pallas_render._reflect_bwd)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raymarching_tpu import RenderConfig, parse_scene
from raymarching_tpu.api import render_aovs, render_tables
from raymarching_tpu.scene.compile import compile_scene

SCENE = """
Bounds 60
Light 0 8 2
Color 0.9 0.1 0.1
Sphere -1.2 0 -6 1.5
Color 0.2 0.9 0.3
Sphere 1.8 -0.5 -7 1.0
Color 0.9 0.9 0.9
Box 0 -2.5 -6 8 0.5 8
Camera Position 0 1.5 2
"""

CFG = RenderConfig(width=48, height=32, ssaa=1, iterations=200,
                   reflect_strength=0.4)


@pytest.fixture(scope="module")
def world():
    return compile_scene(parse_scene(SCENE))


def test_zero_strength_is_baseline_bitwise(world):
    plan, tables = world
    base = render_tables(plan, tables, CFG.replace(reflect_strength=0.0),
                         backend="jnp")
    off = render_tables(plan, tables,
                        CFG.replace(reflect_strength=0.0,
                                    reflect_bounces=3), backend="jnp")
    np.testing.assert_array_equal(np.asarray(base), np.asarray(off))


def test_reflections_change_the_image_and_tint(world):
    plan, tables = world
    a = np.asarray(render_tables(plan, tables,
                                 CFG.replace(reflect_strength=0.0),
                                 backend="jnp"))
    b = np.asarray(render_tables(plan, tables, CFG, backend="jnp"))
    assert np.abs(a - b).max() > 0.05          # mirror images visible
    # the white floor must gain net red+green from the spheres it mirrors
    floor = slice(24, 32)
    gain = (b[floor] - a[floor]).mean(axis=(0, 1))
    assert gain[0] != 0.0 and np.isfinite(b).all()


def test_ref_oracle_matches_jnp(world):
    plan, tables = world
    a = np.asarray(render_tables(plan, tables, CFG, backend="ref"))
    b = np.asarray(render_tables(plan, tables, CFG, backend="jnp"))
    np.testing.assert_allclose(a, b, atol=2e-4)


@pytest.mark.parametrize("bounces", [1, 2])
def test_mega_matches_jnp(world, bounces):
    plan, tables = world
    cfg = CFG.replace(reflect_bounces=bounces)
    a = np.asarray(render_tables(plan, tables, cfg, backend="jnp"))
    m = np.asarray(render_tables(plan, tables, cfg, backend="mega",
                                 interpret=True))
    np.testing.assert_allclose(a, m, atol=2e-3)


def test_two_bounces_differ_from_one(world):
    plan, tables = world
    one = np.asarray(render_tables(plan, tables, CFG, backend="mega",
                                   interpret=True))
    two = np.asarray(render_tables(plan, tables,
                                   CFG.replace(reflect_bounces=2),
                                   backend="mega", interpret=True))
    assert np.abs(one - two).max() > 1e-4


def test_pallas_matches_jnp(world):
    plan, tables = world
    a = np.asarray(render_tables(plan, tables, CFG, backend="jnp"))
    p = np.asarray(render_tables(plan, tables, CFG, backend="pallas",
                                 interpret=True))
    np.testing.assert_allclose(a, p, atol=2e-3)


def test_combined_soft_shadow_ao_reflect_mega(world):
    plan, tables = world
    cfg = CFG.replace(width=32, height=24, iterations=150,
                      soft_shadow_k=8.0, ao_strength=0.5,
                      reflect_strength=0.3)
    a = np.asarray(render_tables(plan, tables, cfg, backend="jnp"))
    m = np.asarray(render_tables(plan, tables, cfg, backend="mega",
                                 interpret=True))
    np.testing.assert_allclose(a, m, atol=2e-3)


def test_aov_color_matches_beauty_with_reflections(world):
    plan, tables = world
    cfg = CFG.replace(ssaa=2)
    aovs = render_aovs(plan, tables, cfg)
    beauty = render_tables(plan, tables, cfg, backend="mega",
                           interpret=True)
    np.testing.assert_array_equal(np.asarray(aovs["color"]),
                                  np.asarray(beauty))


def test_gradients_ref_vs_pallas_ift(world):
    plan, tables = world
    cfg = CFG.replace(width=16, height=12, iterations=150)

    def loss(backend, diff):
        return lambda t: jnp.mean(render_tables(
            plan, t, cfg, backend=backend, differentiable=diff,
            interpret=True))

    gref = jax.grad(loss("ref", True))(tables)
    gpal = jax.grad(loss("pallas", False))(tables)
    for f in ("prim_pos", "prim_color", "light_pos"):
        ga = np.asarray(getattr(gref, f)).ravel()
        gb = np.asarray(getattr(gpal, f)).ravel()
        assert np.isfinite(gb).all()
        # IFT vs unrolled autodiff: small per-element noise is expected
        # (the bounce chains the normal estimator's eps differences), so
        # check magnitude agreement loosely and direction tightly.
        scale = np.abs(ga).max() + 1e-12
        assert np.abs(ga - gb).max() / scale < 0.08, f
        cos = ga @ gb / (np.linalg.norm(ga) * np.linalg.norm(gb) + 1e-30)
        assert cos > 0.995, (f, cos)


@pytest.mark.parametrize("bounces", [1, 2])
def test_gradients_ref_vs_mega(world, bounces):
    """The mega backward (_reflect_bwd anchored-replay chain) must agree
    with unrolled autodiff through the ref oracle — including the
    second-order terms through the reflected direction."""
    plan, tables = world
    cfg = CFG.replace(width=16, height=12, iterations=150,
                      reflect_bounces=bounces)

    def loss(backend, diff):
        return lambda t: jnp.mean(render_tables(
            plan, t, cfg, backend=backend, differentiable=diff,
            interpret=True))

    gref = jax.grad(loss("ref", True))(tables)
    gmeg = jax.grad(loss("mega", False))(tables)
    for f in ("prim_pos", "prim_color", "light_pos"):
        ga = np.asarray(getattr(gref, f)).ravel()
        gb = np.asarray(getattr(gmeg, f)).ravel()
        assert np.isfinite(gb).all(), f
        scale = np.abs(ga).max() + 1e-12
        assert np.abs(ga - gb).max() / scale < 0.08, f
        cos = ga @ gb / (np.linalg.norm(ga) * np.linalg.norm(gb) + 1e-30)
        assert cos > 0.995, (f, cos)


@pytest.mark.slow
def test_mega_full_extension_stack_gradients(scenes_dir):
    """Every opt-in mode at once — named materials, colored lights,
    mirror bounce, soft shadows, AO — through the mega kernel and its
    anchored-replay backward: gradients finite and nonzero, including to
    light_color (the colored-light route through the bounce replay)."""
    from raymarching_tpu import load_scene
    from raymarching_tpu.scene.compile import compile_scene as cs

    plan, tables = cs(load_scene(str(scenes_dir / "mirror.txt")))
    cfg = RenderConfig(width=24, height=16, ssaa=1, iterations=120,
                       reflect_strength=0.4, reflect_bounces=1,
                       soft_shadow_k=8.0, ao_strength=0.5)
    g = jax.grad(lambda t: jnp.mean(render_tables(
        plan, t, cfg, backend="mega", interpret=True)))(tables)
    for f in ("prim_pos", "prim_color", "light_pos", "light_color"):
        arr = np.asarray(getattr(g, f))
        assert np.isfinite(arr).all(), f
        assert np.abs(arr).max() > 0.0, f


def test_mega_reflect_grad_analytic_normals(world):
    """Analytic normal mode routes the replay through jax.grad of the
    field (second-order under vjp) — must stay finite and nonzero."""
    plan, tables = world
    cfg = CFG.replace(width=16, height=12, iterations=150,
                      normal_mode="analytic")
    g = jax.grad(lambda t: jnp.mean(render_tables(
        plan, t, cfg, backend="mega", interpret=True)))(tables)
    gp = np.asarray(g.prim_pos)
    assert np.isfinite(gp).all()
    assert np.abs(gp).max() > 0.0
