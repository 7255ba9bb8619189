"""Fused Pallas TPU march kernel.

The hot loop of the whole framework: sphere-trace a tile of rays against the
compiled CSG scene.  This replaces the reference's GLSL compute kernel
(shader.comp:226-297) — but where the GLSL walks the CSG tree with a
divergent per-thread stack interpreter (the single biggest thing that must
NOT be translated to TPU, SURVEY §3.4), this kernel is generated from the
static ScenePlan at trace time:

  * Rays live as (tile_sublanes, 128) f32 registers/VMEM scratch — every
    VPU lane owns one ray; march state updates are full-width vector ops.
  * Primitive parameters sit in SMEM and are broadcast as scalars into the
    vector ops (the TPU analogue of the reference's read-only SSBO broadcast,
    render.cpp:439-445) — the [rays, prims] distance matrix that makes the
    XLA jnp path HBM-bound is never materialized.
  * The CSG fold is compiled structure: a static Python loop over groups and
    same-type runs, ``lax.fori_loop`` over primitives within a run, running
    min in registers.  No data-dependent control flow, no divergence.
  * Early exit is per-TILE: a ``lax.while_loop`` whose carry holds the
    iteration count and an all-converged flag — converged rays freeze
    (mask semantics identical to the reference's per-ray break,
    scene.cpp:36-40) and the tile stops as soon as every lane converged.

Grid: 1-D over ray tiles; each program handles tile_sublanes*128 rays.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RenderConfig
from ..core.march import MAX_STEP, MarchResult
from ..scene.compile import MIN, KernelPlan, ScenePlan, SceneTables
from ..scene.csg import PrimType

LANES = 128


def _prim_sd(ptype: int, tbl, i, px, py, pz):
    """Distance of primitive ``i`` (scalars from SMEM) to rays (vectors)."""
    cx, cy, cz = tbl[i, 0], tbl[i, 1], tbl[i, 2]
    if ptype == int(PrimType.SPHERE):
        dx, dy, dz = px - cx, py - cy, pz - cz
        return jnp.sqrt(dx * dx + dy * dy + dz * dz) - tbl[i, 3]
    hx, hy, hz = tbl[i, 3] * 0.5, tbl[i, 4] * 0.5, tbl[i, 5] * 0.5
    bx = jnp.abs(px - cx) - hx
    by = jnp.abs(py - cy) - hy
    bz = jnp.abs(pz - cz) - hz
    mx = jnp.maximum(jnp.maximum(bx, by), bz)
    if ptype == int(PrimType.BOX):
        return mx
    mn = jnp.minimum(jnp.minimum(bx, by), bz)
    return bx + by + bz - mn - mx  # cross: median of the three excesses


def _scene_sd_tile(kp: KernelPlan, tbl, px, py, pz, dtype):
    """Scene SDF for a tile: static unroll over groups/runs, fori over
    primitives within a run, all reductions as running minima in registers."""
    inf = jnp.array(jnp.inf, dtype)
    rsign = 1.0 if kp.root_op == MIN else -1.0
    running = jnp.full(px.shape, jnp.inf, dtype)
    for g in kp.groups:
        gmin = jnp.full(px.shape, jnp.inf, dtype)
        for (ptype, start, count, scale) in g.runs:
            if count == 1:
                sd = _prim_sd(ptype, tbl, start, px, py, pz)
                gmin = jnp.minimum(gmin, float(scale) * sd)
            else:
                def body(i, acc, _ptype=ptype, _scale=float(scale)):
                    sd = _prim_sd(_ptype, tbl, i, px, py, pz)
                    return jnp.minimum(acc, _scale * sd)
                gmin = jax.lax.fori_loop(start, start + count, body, gmin)
        gval = float(g.gsign) * gmin
        running = jnp.minimum(running, rsign * gval)
    return rsign * running


def _march_kernel(kp: KernelPlan, iterations: int, eps: float,
                  tbl_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                  px_ref, py_ref, pz_ref, sd_ref, done_ref):
    dtype = ox_ref.dtype
    px_ref[...] = ox_ref[...]
    py_ref[...] = oy_ref[...]
    pz_ref[...] = oz_ref[...]
    sd_ref[...] = jnp.full(ox_ref.shape, jnp.inf, dtype)
    done_ref[...] = jnp.zeros(ox_ref.shape, dtype)   # f32 mask: 0 = active

    def cond(carry):
        it, all_done = carry
        return jnp.logical_and(it < iterations, jnp.logical_not(all_done))

    def body(carry):
        it, _ = carry
        px, py, pz = px_ref[...], py_ref[...], pz_ref[...]
        done = done_ref[...]
        sd = _scene_sd_tile(kp, tbl_ref, px, py, pz, dtype)
        active = done < 0.5
        step = jnp.where(active, jnp.minimum(sd, MAX_STEP), 0.0)
        px_ref[...] = px + step * dx_ref[...]
        py_ref[...] = py + step * dy_ref[...]
        pz_ref[...] = pz + step * dz_ref[...]
        sd_new = jnp.where(active, sd, sd_ref[...])
        sd_ref[...] = sd_new
        done_new = jnp.where(sd_new < eps, 1.0, done)
        done_ref[...] = done_new
        return it + 1, jnp.min(done_new) > 0.5

    jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.asarray(False)))


def _build_table(tables: SceneTables) -> jnp.ndarray:
    """[P, 8] SMEM-resident primitive table: centre xyz, aux xyz, padding."""
    P = tables.prim_pos.shape[0]
    pad = jnp.zeros((P, 2), tables.prim_pos.dtype)
    return jnp.concatenate(
        [jnp.asarray(tables.prim_pos), jnp.asarray(tables.prim_aux), pad],
        axis=1)


@functools.lru_cache(maxsize=64)
def _compiled_call(kp: KernelPlan, iterations: int, eps: float,
                   tile_sublanes: int, num_tiles: int, interpret: bool):
    rows = num_tiles * tile_sublanes
    block = (tile_sublanes, LANES)
    ray_spec = pl.BlockSpec(block, lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)

    kernel = functools.partial(_march_kernel, kp, iterations, eps)
    return pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [ray_spec] * 6,
        out_specs=(ray_spec,) * 5,
        out_shape=(out_shape,) * 5,
        interpret=interpret,
    )


def pallas_march(kp: KernelPlan, iterations: int, eps: float,
                 tile_sublanes: int, origin: jnp.ndarray, ray: jnp.ndarray,
                 tables: SceneTables, *, interpret: bool = False
                 ) -> MarchResult:
    """March a flat batch of rays. origin/ray: [R, 3] -> MarchResult."""
    R = origin.shape[0]
    tile = tile_sublanes * LANES
    num_tiles = max(1, -(-R // tile))
    padded = num_tiles * tile

    def prep(v):
        # edge-pad: padding lanes replay the last real ray, so they converge
        # with it and never hold a tile's early exit hostage
        v = jnp.pad(v, ((0, padded - R),), mode="edge")
        return v.reshape(num_tiles * tile_sublanes, LANES)

    comps = [prep(origin[:, a]) for a in range(3)]
    comps += [prep(ray[:, a]) for a in range(3)]
    tbl = _build_table(tables)

    call = _compiled_call(kp, iterations, eps, tile_sublanes, num_tiles,
                          interpret)
    px, py, pz, sd, done = call(tbl, *comps)

    def unprep(v):
        return v.reshape(padded)[:R]

    p = jnp.stack([unprep(px), unprep(py), unprep(pz)], axis=-1)
    return MarchResult(position=p, sd=unprep(sd),
                       converged=unprep(done) > 0.5)


def make_pallas_march(plan: ScenePlan, cfg: RenderConfig,
                      *, interpret: bool = False) -> Callable:
    """forward_impl for ops.march_op: (origin, ray, tables) -> MarchResult.

    Requires the two-level kernel normal form (every reference scene
    qualifies; deeper trees use the jnp path — api.resolve falls back)."""
    if plan.kernel is None:
        raise ValueError("scene is not in two-level kernel normal form; "
                         "use the jnp backend for depth>2 CSG trees")

    def forward_impl(origin, ray, tables):
        shape = origin.shape
        res = pallas_march(plan.kernel, cfg.iterations,
                           cfg.surface_precision, cfg.tile_sublanes,
                           origin.reshape(-1, 3), ray.reshape(-1, 3),
                           tables, interpret=interpret)
        return MarchResult(position=res.position.reshape(shape),
                           sd=res.sd.reshape(shape[:-1]),
                           converged=res.converged.reshape(shape[:-1]))

    return forward_impl
