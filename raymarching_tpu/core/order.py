"""Ray-ordering permutations: map camera-grid samples to hardware tiles.

The Pallas kernels process rays in (tile_sublanes, 128) tiles, and a tile
keeps marching until its SLOWEST lane converges (the TPU analogue of warp
divergence in the reference's GLSL kernel, shader.comp:288-297 — there a
diverged warp, here a whole tile).  In flat scan order one tile at the
512x512/SSAA-2 bench config is one full image row: background lanes that
converge in a handful of steps sit behind fractal-silhouette lanes for
dozens, a measured 4.1x issued-vs-active eval bound (benchmarks/roofline.py).

``block_permutation`` reorders the flattened [H, W, S] samples so each
tile covers a compact, roughly square pixel block — spatially coherent
rays have similar march depth, cutting the same profile's bound to 2.3x.
The permutation is static per (H, W, S, tile) — computed once in numpy at
trace time — and results are inverse-permuted on the way out, so rendered
images are BIT-EXACT identical to scan order (per-ray arithmetic never
depends on tile composition; the kernel's cull/early-exit proofs are
value-exact by construction).
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Optional, Tuple

import numpy as np


@lru_cache(maxsize=32)
def block_permutation(H: int, W: int, S: int, tile_rays: int
                      ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """(perm, inv) int32 arrays over H*W*S flat sample indices, ordering
    samples block-major so ``tile_rays`` consecutive samples cover a
    compact pixel block; None when the frame is too small to matter.

    perm[i] = flat index of the sample that hardware slot i processes;
    out_scan = out_blocked[inv] restores scan order.
    """
    R = H * W * S
    if R < 2 * tile_rays:
        return None
    # Target pixels per tile; blocks aim for a ~square aspect.  Exact
    # divisibility is NOT required: ragged edge blocks are simply smaller
    # and a tile then spans two adjacent blocks — still spatially compact.
    P = max(1, tile_rays // S)
    bh = 1 << max(0, int(math.floor(math.log2(max(1.0, math.sqrt(P))))))
    bh = min(bh, H)
    bw = max(1, P // bh)

    idx = np.arange(R, dtype=np.int32).reshape(H, W, S)
    rows = []
    for y in range(0, H, bh):
        for x in range(0, W, bw):
            rows.append(idx[y:y + bh, x:x + bw].ravel())
    perm = np.concatenate(rows)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(R, dtype=np.int32)
    return perm, inv


def resolve_ray_order(cfg, backend: str) -> bool:
    """Whether the camera-grid path should use block ordering."""
    if cfg.ray_order == "scan":
        return False
    if cfg.ray_order == "block":
        return True
    if cfg.ray_order == "auto":
        return backend == "mega"
    raise ValueError(f"unknown ray_order {cfg.ray_order!r}")
