"""Surface normals, shadows, and Lambertian multi-light shading.

Reference semantics:
  * Normal = normalize(6-point central difference of the scene SDF, h=1e-3)
    (scene.cpp:70-89); we also offer an analytic mode (one reverse-mode
    gradient of the SDF — 1 eval instead of 6, exact).
  * Shadow (scene.cpp:45-50): offset the hit point by
    normal * (surface_eps + offset_eps), re-march toward the light; the point
    is SHADOWED iff the march stopped before passing the light:
    dot(light - endpoint, ray) > 0.
  * Lighting (scene.cpp:53-62): sum over unshadowed lights of
    dot(normal, normalize(light - p)), clamped to [saturation, 1] — the
    clamp's lower bound acts as the ambient floor.

Gradients: the shadow predicate is a boolean — autodiff of the reference
yields zero gradient through it, so we wrap the shadow march in
``stop_gradient`` (same gradients, no wasted backward sweep through a second
1000-step march).  The Lambert dot term and clamp remain differentiable
(clamp has the usual zero-outside-range subgradient).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from .march import march


def normal_fd(scene_sd: Callable, p: jnp.ndarray, h: float) -> jnp.ndarray:
    """Central-difference gradient of the SDF, normalized. p: [..., 3]."""
    eye = jnp.eye(3, dtype=p.dtype) * h
    comps = []
    for a in range(3):
        comps.append(scene_sd(p + eye[a]) - scene_sd(p - eye[a]))
    g = jnp.stack(comps, axis=-1) / (2.0 * h)
    return g


def normal_analytic(scene_sd: Callable, p: jnp.ndarray) -> jnp.ndarray:
    """Exact SDF gradient via one reverse-mode sweep."""
    _, vjp = jax.vjp(lambda q: scene_sd(q), p)
    (g,) = vjp(jnp.ones(p.shape[:-1], p.dtype))
    return g


def normalize(v: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Safe normalize: zero / non-finite vectors map to zero instead of NaN
    (reachable only in degenerate scenes — empty lists, marches to infinity —
    where the reference produces NaN pixels; SURVEY §2 fine print)."""
    v = jnp.where(jnp.isfinite(v), v, 0.0)
    norm = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return v / jnp.maximum(norm, jnp.finfo(v.dtype).tiny)


def shadowed(scene_sd: Callable, light_pos: jnp.ndarray, p: jnp.ndarray,
             n: jnp.ndarray, iterations: int, surface_eps: float,
             offset_eps: float, *, early_exit: bool = True,
             march_fn: Callable = None) -> jnp.ndarray:
    """Boolean shadow test by re-marching toward the light. p, n: [..., 3].

    ``march_fn`` ((origin, dirs, tmax) -> MarchResult) overrides the jnp
    march — the fast path routes shadow rays through the same fused kernel
    as primary rays (the reference likewise reuses its march for shadows,
    scene.cpp:45-50).

    Both paths stop the march once it has passed the light (t >= tmax):
    the shadow boolean is provably identical (any endpoint at/beyond the
    light yields dot <= 0 = lit, and the reference march only ever moves
    forward from there) while saving the reference's long pointless march
    to the far Bounds wall."""
    ray = normalize(light_pos - p)
    start = p + n * (surface_eps + offset_eps)
    tmax = jnp.linalg.norm(light_pos - start, axis=-1)
    if march_fn is None:
        res = march(scene_sd, start, ray, iterations, surface_eps,
                    differentiable=False, early_exit=early_exit, tmax=tmax)
    else:
        res = march_fn(start, ray, tmax)
    return jnp.sum((light_pos - res.position) * ray, axis=-1) > 0


def lighting(scene_sd: Callable, light_positions: jnp.ndarray,
             p: jnp.ndarray, n: jnp.ndarray, *, iterations: int,
             surface_eps: float, offset_eps: float, saturation: float,
             shadows: bool = True, early_exit: bool = True,
             shadow_fn: Callable = None,
             light_colors: jnp.ndarray = None) -> jnp.ndarray:
    """Total Lambertian lighting in [saturation, 1]. p, n: [..., 3] -> [...].

    ``light_positions``: [L, 3]; L is static and small, so the loop over
    lights is a Python loop (fully unrolled under jit), exactly mirroring the
    reference's per-light loop (scene.cpp:55-61).

    ``light_colors`` [L, 3] (scene-format extension — the reference parses
    per-light color but never sets it, scene.cpp:154-158): when given, each
    light's Lambert term is weighted per channel and the clamp applies per
    channel; returns [..., 3].  With all-white lights this is exactly the
    scalar path broadcast, so reference scenes are bit-identical either way.
    """
    colored = light_colors is not None
    shape = p.shape if colored else p.shape[:-1]
    total = jnp.zeros(shape, p.dtype)
    for l in range(light_positions.shape[0]):
        lp = light_positions[l]
        lambert = jnp.sum(n * normalize(lp - p), axis=-1)
        if shadows:
            from jax.ad_checkpoint import checkpoint_name
            mask = lax.stop_gradient(
                shadowed(scene_sd, lp, lax.stop_gradient(p),
                         lax.stop_gradient(n), iterations, surface_eps,
                         offset_eps, early_exit=early_exit,
                         march_fn=shadow_fn))
            # Saved under the remat policy (core.render): shadow re-marches
            # are the most expensive thing a backward recompute could do,
            # and the mask is one byte per ray.
            mask = checkpoint_name(mask, "march")
            lambert = jnp.where(mask, 0.0, lambert)
        if colored:
            total = total + lambert[..., None] * light_colors[l]
        else:
            total = total + lambert
    return jnp.clip(total, saturation, 1.0)
