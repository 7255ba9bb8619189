"""One-process A/B for the value-bound idx/grad subtree walk
(_menger_subtree_vbound_fold) on the menger4 rung (r5 verdict #2).

r4's per-subtree collapse made menger4's VALUE folds ~10x faster but the
idx/grad fold family (the backward's winner/stencil workhorse) kept the
r4 recursive margin-bound walk — the backward became ~62% of the frame.
The vbound walk adds the collapsed value min m_j as an EXACT second-level
skip: margin-live-but-not-winning subtrees skip their whole 421-leaf
idx/grad fold for ~490 straight-line ops.

Variants (kernel lru caches cleared between them, ab_bvh pattern):
  * vbound     — shipped default (_SUBTREE_VBOUND = True)
  * recursive  — the r4 idx/grad path (margin-bound recursion)

Run on the TPU host: ``python benchmarks/ab_vbound.py [--json out.json]``.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ab_bvh import _clear_kernel_caches  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import bench
    import raymarching_tpu.ops.pallas_march as pm
    from raymarching_tpu import RenderConfig, compile_scene, load_scene
    from raymarching_tpu.api import resolve_backend

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    backend = resolve_backend("auto")
    out = {"workload": "512x512 ssaa2 exact_fd menger4, pipelined",
           "roundtrip_floor_s": bench._roundtrip_floor()}

    def measure(tag, plan, tables, cfg, forward_only=False):
        t0 = time.perf_counter()
        r = bench._measure(plan, tables, cfg, backend, reps=args.reps,
                           forward_only=forward_only)
        r["compile_s"] = round(time.perf_counter() - t0, 1)
        out[tag] = r
        print(f"{tag:28s} {r['median']:8.3f} Mrays/s "
              f"(spread {r['spread_pct']:.2f}%, compile "
              f"{r['compile_s']}s)", flush=True)

    cfg = RenderConfig(width=512, height=512, ssaa=2, iterations=1000,
                       shadows=True, normal_mode="fd", ray_chunk=65536)
    scene = load_scene(os.path.join(here, "scenes", "menger4.txt"))
    plan, tables = compile_scene(scene)

    assert pm._SUBTREE_VBOUND
    measure("menger4_vbound", plan, tables, cfg)
    measure("menger4_vbound_fwd", plan, tables, cfg, forward_only=True)
    pm._SUBTREE_VBOUND = False
    _clear_kernel_caches()
    try:
        measure("menger4_recursive", plan, tables, cfg)
        measure("menger4_recursive_fwd", plan, tables, cfg,
                forward_only=True)
    finally:
        pm._SUBTREE_VBOUND = True
        _clear_kernel_caches()
    out["speedup_fwdbwd"] = round(out["menger4_vbound"]["median"]
                                  / out["menger4_recursive"]["median"], 4)
    out["speedup_fwd"] = round(out["menger4_vbound_fwd"]["median"]
                               / out["menger4_recursive_fwd"]["median"], 4)

    print(json.dumps({k: v for k, v in out.items()
                      if not isinstance(v, dict)}))
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
