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

from .march import MAX_STEP, march


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
    # The floor must sit INSIDE the sqrt: max(sqrt(x), tiny) still reverse-
    # differentiates sqrt at x=0 (VJP = inf, and inf * the max's zeroed
    # cotangent = NaN, poisoning autodiff through analytic normals when the
    # winner gradient vanishes, e.g. inside a Mandelbox fold).  With the
    # floor on x the max's subgradient zeroes the cotangent BEFORE the
    # sqrt; values are identical for every norm >= 1e-19.
    sq = jnp.sum(v * v, axis=axis, keepdims=True)
    norm = jnp.sqrt(jnp.maximum(sq, jnp.finfo(v.dtype).tiny))
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


def _soft_step(scene_sd, ray, eps, k, tmax, state):
    """One soft-shadow march step: standard sphere-trace step plus the
    penumbra tracker pen = min over steps of clamp(k * sd / t, 0, 1)
    (Quilez's distance-based soft shadow; t = distance marched so far,
    floored at eps so the first evaluation at t=0 stays finite)."""
    p, sd_last, done, t, pen = state
    sd = scene_sd(p)
    active = jnp.logical_not(done)
    ratio = jnp.clip(k * sd / jnp.maximum(t, eps), 0.0, 1.0)
    pen = jnp.where(active, jnp.minimum(pen, ratio), pen)
    step = jnp.where(active, jnp.minimum(sd, MAX_STEP), 0.0)
    p = p + step[..., None] * ray
    t = t + step
    sd_last = jnp.where(active, sd, sd_last)
    done = jnp.logical_or(done, sd_last < eps)
    done = jnp.logical_or(done, t >= tmax)
    return p, sd_last, done, t, pen


def soft_shadow_factor(scene_sd: Callable, light_pos: jnp.ndarray,
                       p: jnp.ndarray, n: jnp.ndarray, iterations: int,
                       surface_eps: float, offset_eps: float, k: float,
                       *, early_exit: bool = True) -> jnp.ndarray:
    """Penumbra factor in [0, 1] for each ray (scene-format EXTENSION —
    the reference has only the boolean test above; opt-in via
    RenderConfig.soft_shadow_k).

    Semantics: re-march toward the light exactly like ``shadowed``; a ray
    whose march stops before passing the light returns 0 (the hard-shadow
    boolean), otherwise min over its steps of clamp(k * sd / t, 0, 1).
    As k -> inf this converges to the hard boolean (1 iff lit).  Callers
    treat the factor as locally constant (stop_gradient), mirroring the
    boolean path's gradient semantics.

    ``early_exit=False`` uses a fixed-length scan — required when tracing
    under reverse-mode autodiff (while_loop cannot carry tangents, even
    zero-cotangent ones from the light position / scene tables)."""
    ray = normalize(light_pos - p)
    start = p + n * (surface_eps + offset_eps)
    tmax = jnp.linalg.norm(light_pos - start, axis=-1)
    batch = start.shape[:-1]
    state0 = (start, jnp.full(batch, jnp.inf, start.dtype),
              jnp.zeros(batch, bool), jnp.zeros(batch, start.dtype),
              jnp.ones(batch, start.dtype))
    if early_exit:
        def cond(s):
            it, st = s
            return jnp.logical_and(it < iterations,
                                   jnp.logical_not(jnp.all(st[2])))

        def body(s):
            it, st = s
            return it + 1, _soft_step(scene_sd, ray, surface_eps, k,
                                      tmax, st)

        _, state = lax.while_loop(cond, body, (jnp.zeros((), jnp.int32),
                                               state0))
    else:
        state, _ = lax.scan(
            lambda st, _: (_soft_step(scene_sd, ray, surface_eps, k,
                                      tmax, st), None),
            state0, None, length=iterations)
    q, _, _, _, pen = state
    lit = jnp.sum((light_pos - q) * ray, axis=-1) <= 0
    return jnp.where(lit, pen, 0.0)


def ambient_occlusion(scene_sd: Callable, p: jnp.ndarray, n: jnp.ndarray,
                      strength: float, samples: int, delta: float
                      ) -> jnp.ndarray:
    """5-tap (by default) SDF ambient-occlusion factor in [0, 1]
    (extension; opt-in via RenderConfig.ao_strength):

        occ = sum_i 2^-i * (i*delta - sd(p + i*delta*n)),  i = 1..samples
        ao  = clamp(1 - strength * occ, 0, 1)

    Open geometry has sd(p + d n) = d along the normal -> occ = 0 -> 1;
    nearby surfaces shrink sd below the cone distance and darken.  Callers
    stop_gradient the factor (same policy as shadows)."""
    occ = jnp.zeros(p.shape[:-1], p.dtype)
    for i in range(1, samples + 1):
        d = i * delta
        occ = occ + (2.0 ** -i) * (d - scene_sd(p + d * n))
    return jnp.clip(1.0 - strength * occ, 0.0, 1.0)


def lighting(scene_sd: Callable, light_positions: jnp.ndarray,
             p: jnp.ndarray, n: jnp.ndarray, *, iterations: int,
             surface_eps: float, offset_eps: float, saturation: float,
             shadows: bool = True, early_exit: bool = True,
             shadow_fn: Callable = None,
             light_colors: jnp.ndarray = None,
             soft_shadow_k: float = 0.0, ao_strength: float = 0.0,
             ao_samples: int = 5, ao_delta: float = 0.1) -> jnp.ndarray:
    """Total Lambertian lighting in [saturation, 1]. p, n: [..., 3] -> [...].

    ``light_positions``: [L, 3]; L is static and small, so the loop over
    lights is a Python loop (fully unrolled under jit), exactly mirroring the
    reference's per-light loop (scene.cpp:55-61).

    ``light_colors`` [L, 3] (scene-format extension — the reference parses
    per-light color but never sets it, scene.cpp:154-158): when given, each
    light's Lambert term is weighted per channel and the clamp applies per
    channel; returns [..., 3].  With all-white lights this is exactly the
    scalar path broadcast, so reference scenes are bit-identical either way.

    ``soft_shadow_k > 0`` (extension) replaces the boolean shadow mask with
    the penumbra factor from ``soft_shadow_factor`` — computed with the jnp
    soft march even when a ``shadow_fn`` kernel hook is installed (the hook
    protocol returns only a MarchResult; the mega backend instead tracks
    the factor inside its own kernel).  ``ao_strength > 0`` (extension)
    scales the final clamped light by ``ambient_occlusion``.  Both factors
    are stop_gradient'd, matching the boolean path's gradient policy.
    """
    colored = light_colors is not None
    shape = p.shape if colored else p.shape[:-1]
    total = jnp.zeros(shape, p.dtype)
    for l in range(light_positions.shape[0]):
        lp = light_positions[l]
        lambert = jnp.sum(n * normalize(lp - p), axis=-1)
        if shadows and soft_shadow_k > 0.0:
            from jax.ad_checkpoint import checkpoint_name
            fac = lax.stop_gradient(
                soft_shadow_factor(scene_sd, lp, lax.stop_gradient(p),
                                   lax.stop_gradient(n), iterations,
                                   surface_eps, offset_eps, soft_shadow_k,
                                   early_exit=early_exit))
            fac = checkpoint_name(fac, "march")
            lambert = lambert * fac
        elif shadows:
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
    out = jnp.clip(total, saturation, 1.0)
    if ao_strength > 0.0:
        ao = lax.stop_gradient(
            ambient_occlusion(scene_sd, lax.stop_gradient(p),
                              lax.stop_gradient(n), ao_strength,
                              ao_samples, ao_delta))
        out = out * (ao[..., None] if colored else ao)
    return out
