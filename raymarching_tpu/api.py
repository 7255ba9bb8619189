"""High-level rendering API with backend dispatch.

Backends (RenderConfig.backend or the ``backend=`` argument):
  * ``"ref"``    — pure-jnp oracle: scan/while march, autodiff by unrolling.
    The allclose ground truth (the analogue of the reference CPU path).
  * ``"jnp"``    — fast path on XLA: while-loop forward march wrapped in the
    implicit-function custom VJP (ops.march_op).
  * ``"pallas"`` — fast path with the fused Pallas TPU march kernel as the
    forward driver (same IFT backward).
  * ``"auto"``   — pallas on TPU, jnp elsewhere.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from .config import RenderConfig
from .core.render import render_image
from .core.sdf import scene_sd
from .ops.march_op import make_march_fn
from .scene.compile import ScenePlan, SceneTables
from .scene.parser import Scene


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def resolve_backend(backend: str) -> str:
    if backend == "auto":
        return "pallas" if _on_tpu() else "jnp"
    return backend


def make_render_march_fn(plan: ScenePlan, tables: SceneTables,
                         cfg: RenderConfig, backend: str):
    """Build the march_fn hook for the requested backend (None = oracle)."""
    backend = resolve_backend(backend)
    if backend == "ref":
        return None
    forward_impl = None
    if backend == "pallas":
        from .ops.pallas_march import make_pallas_march
        forward_impl = make_pallas_march(plan, cfg)
    sd_fn = lambda tb, p: scene_sd(plan, tb, p)
    return make_march_fn(sd_fn, cfg.iterations, cfg.surface_precision,
                         tables, forward_impl=forward_impl)


def render_tables(plan: ScenePlan, tables: SceneTables,
                  cfg: Optional[RenderConfig] = None, *,
                  backend: Optional[str] = None,
                  differentiable: bool = False) -> jnp.ndarray:
    """Render compiled tables -> [H, W, 3].  Differentiable w.r.t. every
    array in ``tables`` on all backends (IFT backward on the fast paths,
    unrolled autodiff on ``ref`` with differentiable=True)."""
    cfg = cfg or RenderConfig()
    backend = resolve_backend(backend or cfg.backend)
    march_fn = make_render_march_fn(plan, tables, cfg, backend)
    return render_image(plan, tables, cfg,
                        differentiable=differentiable and backend == "ref",
                        march_fn=march_fn)


@partial(jax.jit, static_argnames=("plan", "cfg", "backend",
                                   "differentiable"))
def render_tables_jit(plan: ScenePlan, tables: SceneTables,
                      cfg: RenderConfig, backend: str = "auto",
                      differentiable: bool = False) -> jnp.ndarray:
    return render_tables(plan, tables, cfg, backend=backend,
                         differentiable=differentiable)


def render(scene: Scene, cfg: Optional[RenderConfig] = None, *,
           backend: Optional[str] = None, jit: bool = True) -> jnp.ndarray:
    """Render a parsed Scene -> [H, W, 3] image array."""
    from .scene.compile import compile_scene

    cfg = cfg or RenderConfig()
    plan, tables = compile_scene(scene)
    if jit:
        return render_tables_jit(plan, tables, cfg,
                                 resolve_backend(backend or cfg.backend))
    return render_tables(plan, tables, cfg, backend=backend)
