"""Deterministic generator for scenes/scatter1k.txt — the wide-UNION
cull rung (LADDER rung 7).

1,000 scattered spheres in a 70-unit slab plus a floor and bounds: the
scene shape the reference's O(N) per-evaluation UNION fold
(body.cpp:66-111) handles worst — every ray pays all 1,000 SDFs per march
step there.  Our wide-UNION chunk cull (scene/compile.py GroupPlan.bvh)
bounds it: rays skip chunks whose live bounding box provably cannot win.

Rerun ``python scenes/make_scatter.py`` to regenerate (bit-identical).
"""

import os

import numpy as np


def main():
    rng = np.random.RandomState(20260820)
    lines = [
        "Bounds 400.0", "",
        "Camera Position 0.0 30.0 60.0",
        "Camera Direction 0.0 -0.45 -1.0",
        "Camera Up 0.0 1.0 0.0",
        "Camera FOV 70", "",
        "Light -30.0 60.0 30.0",
        "Light 40.0 55.0 -10.0", "",
        "Box 0.0 -1.0 -35.0 160.0 2.0 160.0", "",
    ]
    # Morton-order the emission so leaf order is spatially coherent —
    # chunk bounding boxes stay tight (GroupPlan.bvh docstring: the chunk
    # partition is static over leaf order).
    n = 1000
    p = np.empty((n, 3))
    p[:, 0] = rng.uniform(-55, 55, n)
    p[:, 1] = rng.uniform(1.0, 26.0, n)
    p[:, 2] = rng.uniform(-75, -5, n)
    r = rng.uniform(0.35, 1.1, n)
    c = rng.uniform(0.15, 1.0, (n, 3))

    def morton(q):
        g = np.clip(((q - q.min(0)) / (np.ptp(q, 0) + 1e-9) * 1023), 0,
                    1023).astype(np.uint32)
        key = np.zeros(len(q), np.uint64)
        for b in range(10):
            for a in range(3):
                key |= ((g[:, a].astype(np.uint64) >> b) & 1) << np.uint64(
                    3 * b + a)
        return np.argsort(key, kind="stable")

    for i in morton(p):
        lines.append(f"Color {c[i,0]:.4f} {c[i,1]:.4f} {c[i,2]:.4f}")
        lines.append(f"Sphere {p[i,0]:.4f} {p[i,1]:.4f} {p[i,2]:.4f} "
                     f"{r[i]:.4f}")
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "scatter1k.txt")
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {n} spheres")


if __name__ == "__main__":
    main()
