"""Fused-gate offender classification (r5 verdict item #5).

The fused-generator fast mode folds Menger/DeathStar carves into
conservative closed-form distances: same zero set, different fold
association.  Where a marginal SSAA sample's convergence decision flips
(an ulp-scale field difference at a silhouette crossing), the fused and
exact images can disagree by a full shade at isolated pixels — benign,
geometry-edge-confined.  A disagreement in a smooth INTERIOR region would
instead mean the folded field is wrong somewhere on the surface — a bug.

This module classifies every gate offender (pixel whose max-channel color
difference exceeds the gate threshold) against the exact path's own AOVs
(api.render_aovs: object id, depth, SSAA coverage):

  silhouette pixel :=  partial SSAA coverage (0 < hit < 1)
                    OR object id differs from a 4-neighbor
                    OR hit/miss state differs from a 4-neighbor
                    OR relative depth jump > ``depth_rel`` to a 4-neighbor
  … dilated by ``dilate`` pixels (an offender within 1 px of an edge is
  edge-class: the fused image's edge lands one sample over).

Pure numpy on host — runs identically under the bench's TPU renders and
the CPU interpret-mode test (tests/test_gate_offenders.py pins it on the
demo scene).
"""

from __future__ import annotations

import numpy as np


def silhouette_mask(objid: np.ndarray, depth: np.ndarray, hit: np.ndarray,
                    *, depth_rel: float = 0.05, dilate: int = 1
                    ) -> np.ndarray:
    """[H, W] bool: pixels on (or within ``dilate`` px of) a geometry
    discontinuity of the exact render.  Edges are detected symmetrically
    (a jump marks both sides), so the pre-dilation mask is already
    two-sided; dilation adds the sub-pixel slack SSAA edge shifts need."""
    objid = np.asarray(objid)
    depth = np.asarray(depth)
    hit = np.asarray(hit)
    edge = (hit > 0.0) & (hit < 1.0)
    fin = np.isfinite(depth)
    for ax in (0, 1):
        for sh in (1, -1):
            nb_id = np.roll(objid, sh, axis=ax)
            nb_d = np.roll(depth, sh, axis=ax)
            nb_fin = np.roll(fin, sh, axis=ax)
            edge |= nb_id != objid
            edge |= nb_fin != fin
            both = fin & nb_fin
            with np.errstate(invalid="ignore"):
                rel = np.abs(nb_d - depth) / np.maximum(
                    np.minimum(np.abs(nb_d), np.abs(depth)), 1e-6)
            edge |= both & (rel > depth_rel)
    # np.roll wraps: a frame-edge pixel may compare against the opposite
    # border.  Image borders count as discontinuities anyway (the frame
    # crops geometry), so mark them rather than special-case the wrap.
    edge[0, :] = edge[-1, :] = True
    edge[:, 0] = edge[:, -1] = True
    out = edge.copy()
    for _ in range(dilate):
        d = out.copy()
        for ax in (0, 1):
            for sh in (1, -1):
                d |= np.roll(out, sh, axis=ax)
        out = d
    return out


def classify_offenders(diff: np.ndarray, thresh: float,
                       objid: np.ndarray, depth: np.ndarray,
                       hit: np.ndarray, *, depth_rel: float = 0.05,
                       dilate: int = 1) -> dict:
    """Classify every gate offender (diff >= thresh) as silhouette-class
    or interior-class.  Returns a JSON-ready dict:

      offenders              total count
      offenders_on_silhouette  count on/near a geometry discontinuity
      offenders_interior       count in smooth regions (bug if > 0)
      interior_yx              up to 16 [y, x] coords of interior ones
      all_on_silhouette        the headline boolean the gate records
    """
    diff = np.asarray(diff)
    mask = silhouette_mask(objid, depth, hit,
                           depth_rel=depth_rel, dilate=dilate)
    off = diff >= thresh
    n = int(off.sum())
    on_sil = int((off & mask).sum())
    interior = np.argwhere(off & ~mask)
    return {
        "offenders": n,
        "offenders_on_silhouette": on_sil,
        "offenders_interior": n - on_sil,
        "interior_yx": [[int(y), int(x)] for y, x in interior[:16]],
        "all_on_silhouette": bool(n == on_sil),
    }
