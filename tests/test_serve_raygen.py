"""In-kernel raygen serving path (RenderConfig.serve_raygen): the mega
kernel generates primary-ray directions from the ray index
(ops.pallas_render._raygen_dirs) — same corner-biased camera math as
core.camera.generate_rays (render.cpp:104-105), evaluated in VMEM so a
serving frame skips the jnp raygen pass, the to_blocked reorder, and the
[R, 3] HBM dirs stream.  Images must match the standard path to raygen
ulps on every layout (blocked / scan / chunked), and the path is
PRIMAL-ONLY by design (training keeps standard raygen; the backward
would have to replay it anyway)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raymarching_tpu import RenderConfig, compile_scene, load_scene
from raymarching_tpu.api import render_tables

SCENE = "scenes/config4.txt"


def _plan():
    return compile_scene(load_scene(SCENE))


@pytest.mark.parametrize("over", [
    dict(width=64, height=48, ssaa=2),              # blocked order
    dict(width=16, height=8, ssaa=1),               # too small: scan
    dict(width=64, height=48, ssaa=2, ray_chunk=4096),   # chunked map
])
def test_serve_matches_standard(over):
    plan, tables = _plan()
    cfg = RenderConfig(iterations=120, shadows=True, **over)
    a = np.asarray(render_tables(plan, tables, cfg, backend="mega",
                                 interpret=True))
    b = np.asarray(render_tables(plan, tables,
                                 cfg.replace(serve_raygen=True),
                                 backend="mega", interpret=True))
    # same formulas, different op fusion: ulp-level direction noise can
    # move a march by one step at silhouettes — the suite's standard
    # cross-backend contract
    diff = np.abs(a - b).max(axis=-1)
    assert (diff < 5e-3).mean() > 0.995
    assert np.median(diff) < 1e-4


def test_serve_fused_analytic_regime():
    plan, tables = _plan()
    cfg = RenderConfig(width=64, height=48, ssaa=2, iterations=120,
                       shadows=True, fused_generators=True,
                       normal_mode="analytic")
    a = np.asarray(render_tables(plan, tables, cfg, backend="mega",
                                 interpret=True))
    b = np.asarray(render_tables(plan, tables,
                                 cfg.replace(serve_raygen=True),
                                 backend="mega", interpret=True))
    diff = np.abs(a - b).max(axis=-1)
    assert (diff < 5e-3).mean() > 0.995


def test_serve_is_primal_only():
    plan, tables = _plan()
    cfg = RenderConfig(width=32, height=16, ssaa=1, iterations=60,
                       serve_raygen=True)
    with pytest.raises(Exception):
        jax.grad(lambda t: jnp.mean(render_tables(
            plan, t, cfg, backend="mega", interpret=True)))(tables)


def test_serve_falls_back_outside_envelope():
    # aperture > 0 routes to the DoF path before the serve branch; the
    # standard (differentiable) result must come back unchanged
    plan, tables = _plan()
    cfg = RenderConfig(width=32, height=16, ssaa=1, iterations=60,
                       aperture=0.1, focus_dist=10.0)
    a = np.asarray(render_tables(plan, tables, cfg, backend="mega",
                                 interpret=True))
    b = np.asarray(render_tables(plan, tables,
                                 cfg.replace(serve_raygen=True),
                                 backend="mega", interpret=True))
    np.testing.assert_array_equal(a, b)
