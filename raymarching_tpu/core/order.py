"""Ray-ordering: map camera-grid samples to hardware tiles as pixel blocks.

The Pallas kernels process rays in (tile_sublanes, 128) tiles, and a tile
keeps marching until its SLOWEST lane converges (the TPU analogue of warp
divergence in the reference's GLSL kernel, shader.comp:288-297 — there a
diverged warp, here a whole tile).  In flat scan order one tile at the
512x512/SSAA-2 bench config is one full image row: background lanes that
converge in a handful of steps sit behind fractal-silhouette lanes for
dozens, a measured 4.1x issued-vs-active eval bound (benchmarks/roofline.py).
Reordering samples so each tile covers a compact ~square pixel block cuts
the same profile's bound to 2.3x.

The reorder is expressed as RESHAPE + TRANSPOSE (block dims divide the
frame by construction: they are chosen among the divisors of H and W), NOT
as a gather with an index array: a transpose's VJP is the inverse
transpose — a fast contiguous copy — while a 1M-row gather's VJP is a
scatter that costs more than the reorder saves (measured: gather-based
ordering LOST 35% end-to-end; scatter-adds at this row count are ~0.3 s
class on this chip).

Results are inverse-permuted on the way out, so rendered images are
BIT-EXACT identical to scan order: per-ray arithmetic never depends on
tile composition, and the kernel's cull/early-exit decisions are
value-exact proofs.  (Cotangents that REDUCE over rays — table gradients —
see a different FP summation order: reduction-order noise only.)
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Optional, Tuple

import jax.numpy as jnp


@lru_cache(maxsize=64)
def block_dims(H: int, W: int, S: int, tile_rays: int
               ) -> Optional[Tuple[int, int]]:
    """Pixel-block shape (bh, bw) with bh | H and bw | W, sized so one
    block holds ~tile_rays samples with ~square aspect; None when the
    frame is too small for ordering to matter or no useful split exists.
    """
    R = H * W * S
    if R < 2 * tile_rays:
        return None
    P = max(1, tile_rays // S)              # target pixels per tile
    divs_h = [d for d in range(1, H + 1) if H % d == 0]
    divs_w = [d for d in range(1, W + 1) if W % d == 0]
    bh = min(divs_h, key=lambda d: abs(d - math.sqrt(P)))
    bw = min(divs_w, key=lambda d: abs(d - P / bh))
    if (bh, bw) in ((H, W), (1, W)):        # degenerate: scan already
        return None
    return bh, bw


def to_blocked(x: jnp.ndarray, H: int, W: int, S: int,
               bh: int, bw: int) -> jnp.ndarray:
    """[H*W*S, ...] scan-order samples -> block-major order (pure
    reshape/transpose; VJP is the inverse transpose, no scatter)."""
    tail = x.shape[1:]
    x = x.reshape(H // bh, bh, W // bw, bw, S, *tail)
    x = jnp.transpose(x, (0, 2, 1, 3, 4) + tuple(
        5 + i for i in range(len(tail))))
    return x.reshape((H * W * S,) + tail)


def from_blocked(x: jnp.ndarray, H: int, W: int, S: int,
                 bh: int, bw: int) -> jnp.ndarray:
    """Inverse of to_blocked."""
    tail = x.shape[1:]
    x = x.reshape(H // bh, W // bw, bh, bw, S, *tail)
    x = jnp.transpose(x, (0, 2, 1, 3, 4) + tuple(
        5 + i for i in range(len(tail))))
    return x.reshape((H * W * S,) + tail)


def resolve_ray_order(cfg, backend: str) -> bool:
    """Whether the camera-grid path should use block ordering."""
    if cfg.ray_order == "scan":
        return False
    if cfg.ray_order == "block":
        return True
    if cfg.ray_order == "auto":
        return backend == "mega"
    raise ValueError(f"unknown ray_order {cfg.ray_order!r}")
