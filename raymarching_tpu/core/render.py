"""The reference renderer: full forward pass in pure jax.numpy.

This is the oracle — the allclose contract for every faster path (Pallas
kernels, sharded execution) per SURVEY §4.  Pipeline per SSAA sample
(scene.cpp:26-32 + render.cpp:82-120):

    march -> surface color (at the pre-step point) -> normal -> shadow/
    lighting -> light * color; average the k x k samples into the pixel.

The march batch is the flattened H*W*S ray grid; optional chunking bounds
the [rays, primitives] working set.  ``differentiable=True`` switches the
march to the scan-based driver so ``jax.grad`` flows through the whole
image — this is the CPU autodiff reference for gradient checks.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..config import RenderConfig
from ..scene.compile import ScenePlan, SceneTables
from . import camera as cam
from . import shading
from .march import march
from .sdf import scene_sd, scene_surface


def _shade_rays(plan: ScenePlan, tables: SceneTables, cfg: RenderConfig,
                origin: jnp.ndarray, dirs: jnp.ndarray,
                differentiable: bool,
                march_fn: Optional[Callable] = None,
                shadow_fn: Optional[Callable] = None,
                surface_fn: Optional[Callable] = None,
                normal_fn: Optional[Callable] = None,
                _bounces: Optional[int] = None) -> jnp.ndarray:
    """Render a flat batch of rays. origin [3] or [R,3]; dirs [R,3] -> [R,3].

    Optional fused-implementation hooks (e.g. Pallas kernels via ops.*):
      march_fn(origin, dirs) -> MarchResult          primary, differentiable
      shadow_fn(origin, dirs, tmax) -> MarchResult   forward-only
      surface_fn(p) -> (sd, color)                   color lookup
      normal_fn(p) -> unnormalized SDF gradient
    All hooks accept per-ray origins, so the reflection recursion (see
    RenderConfig.reflect_strength) reuses them unchanged.
    """
    sd_fn = lambda p: scene_sd(plan, tables, p)
    o = jnp.broadcast_to(origin, dirs.shape)

    if march_fn is None:
        march_fn = lambda oo, dd: march(
            sd_fn, oo, dd, cfg.iterations, cfg.surface_precision,
            differentiable=differentiable, early_exit=cfg.early_exit)

    res = march_fn(o, dirs)
    # Name the march outputs so the chunked remat policy can SAVE them:
    # re-running a 1000-step march inside the backward sweep would double
    # the dominant cost, while the shading that follows is cheap to
    # recompute.
    from jax.ad_checkpoint import checkpoint_name
    res = type(res)(position=checkpoint_name(res.position, "march"),
                    sd=checkpoint_name(res.sd, "march"),
                    converged=res.converged)
    p_hit = res.position
    # The reference returns the surface evaluated one step back
    # (scene.cpp:34-42); reconstruct that point and evaluate color there.
    # (sd clamp mirrors the march's step clamp for degenerate +inf scenes.)
    from .march import MAX_STEP
    p_color = p_hit - jnp.minimum(res.sd, MAX_STEP)[..., None] * dirs
    if surface_fn is None:
        _, color = scene_surface(plan, tables, p_color)
    else:
        _, color = surface_fn(p_color)

    if normal_fn is not None:
        g = normal_fn(p_hit)
    elif cfg.normal_mode == "analytic":
        g = shading.normal_analytic(sd_fn, p_hit)
    else:
        g = shading.normal_fd(sd_fn, p_hit, cfg.fd_h)
    n = shading.normalize(g)

    # Slice to the REAL light count: compile_tree pads zero-light scenes
    # with one all-white row at the origin so the kernel ABI always has a
    # [>=1, 3] table — the pad must never shade (the kernels loop over the
    # static plan.num_lights and were already immune; this keeps the
    # oracles in agreement, tests/test_degenerate_scenes.py).
    light = shading.lighting(
        sd_fn, tables.light_pos[:plan.num_lights], p_hit, n,
        iterations=cfg.iterations, surface_eps=cfg.surface_precision,
        offset_eps=cfg.offset_precision, saturation=cfg.saturation,
        shadows=cfg.shadows, early_exit=cfg.early_exit and not differentiable,
        shadow_fn=shadow_fn,
        light_colors=(tables.light_color[:plan.num_lights]
                      if plan.colored_lights else None),
        soft_shadow_k=cfg.soft_shadow_k, ao_strength=cfg.ao_strength,
        ao_samples=cfg.ao_samples, ao_delta=cfg.ao_delta)

    light = light if plan.colored_lights else light[..., None]
    base = light * color

    # Tinted-mirror reflections (extension, cfg.reflect_strength > 0):
    # c = color * ((1-s) * light + s * c_reflected); the bounce re-enters
    # this same function (same hooks) with per-ray origins pushed off the
    # surface.  d and n are unit, so the mirrored direction needs no
    # renormalization.
    s = cfg.reflect_strength
    bounces = cfg.reflect_bounces if _bounces is None else _bounces
    if s > 0.0 and bounces > 0:
        off = cfg.surface_precision + cfg.offset_precision
        ddot = jnp.sum(dirs * n, axis=-1, keepdims=True)
        rdir = dirs - 2.0 * ddot * n
        c_ref = _shade_rays(plan, tables, cfg, p_hit + off * n, rdir,
                            differentiable, march_fn, shadow_fn,
                            surface_fn, normal_fn, _bounces=bounces - 1)
        return (1.0 - s) * base + s * color * c_ref
    return base


def render_image(plan: ScenePlan, tables: SceneTables, cfg: RenderConfig,
                 *, differentiable: bool = False,
                 march_fn: Optional[Callable] = None,
                 shadow_fn: Optional[Callable] = None,
                 surface_fn: Optional[Callable] = None,
                 normal_fn: Optional[Callable] = None) -> jnp.ndarray:
    """Render the full frame -> [H, W, 3] float32 (linear, unclamped)."""
    origin, dirs = cam.generate_rays(tables, cfg)      # [H, W, S, 3]
    S = cfg.samples_per_pixel
    R = cfg.height * cfg.width * S
    flat = dirs.reshape(R, 3)

    shade = partial(_shade_rays, plan, tables, cfg, origin,
                    differentiable=differentiable, march_fn=march_fn,
                    shadow_fn=shadow_fn, surface_fn=surface_fn,
                    normal_fn=normal_fn)

    chunk = cfg.ray_chunk
    if chunk and R > chunk:
        pad = (-R) % chunk
        padded = jnp.concatenate(
            [flat, jnp.broadcast_to(flat[-1:], (pad, 3))]) if pad else flat
        blocks = padded.reshape(-1, chunk, 3)
        # checkpoint per chunk: reverse-mode recomputes a chunk's shading
        # instead of holding every chunk's [chunk, prims] residuals live —
        # the standard remat memory/FLOPs trade (SURVEY §5).  The policy
        # saves the (small) march outputs so the backward sweep never
        # re-runs a 1000-step march.
        policy = jax.checkpoint_policies.save_only_these_names("march")
        colors = lax.map(jax.checkpoint(lambda d: shade(dirs=d),
                                        policy=policy), blocks)
        colors = colors.reshape(-1, 3)[:R]
    else:
        colors = shade(dirs=flat)

    samples = colors.reshape(cfg.height, cfg.width, S, 3)
    return jnp.mean(samples, axis=2)


@partial(jax.jit, static_argnames=("plan", "cfg", "differentiable"))
def render_image_jit(plan: ScenePlan, tables: SceneTables, cfg: RenderConfig,
                     differentiable: bool = False) -> jnp.ndarray:
    return render_image(plan, tables, cfg, differentiable=differentiable)
