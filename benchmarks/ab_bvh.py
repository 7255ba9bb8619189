"""One-process A/B for the two exact structure culls added in r4:

  * wide-UNION chunk cull (scene/compile.py GroupPlan.bvh) on the
    scatter1k rung (1,000 scattered spheres) — cull on vs the same plan
    with the partition stripped;
  * recursive Menger subtree cull (_menger_subtree_fold /
    _SUBTREE_RECURSE_MIN) on the menger4 rung (8,422 prims) — depth-2
    recursion vs the r3 flat 20-subtree cull (recursion disabled).

Both A/Bs render the rung workload (512^2 SSAA2 fwd+bwd exact_fd, plus
forward-only) under bench.py's pipelined protocol, in ONE process (the
tunnel's bench-to-bench variance exceeds the effects otherwise).  The
stripped/flat variants change the KernelPlan structure or a module
constant, so the kernel lru caches are cleared between variants.

Run on the TPU host: ``python benchmarks/ab_bvh.py [--json out.json]``.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _clear_kernel_caches():
    """Flipping pm._SUBTREE_RECURSE_MIN changes TRACE behavior without
    changing the KernelPlan cache keys — every plan-keyed lru cache in the
    ops layer must be dropped or the flat variant would silently reuse
    the recursive kernels."""
    import raymarching_tpu.ops.march_op as mo
    import raymarching_tpu.ops.pallas_march as pm
    import raymarching_tpu.ops.pallas_render as pr
    import raymarching_tpu.ops.scene_vjp as sv
    for mod in (pm, pr, mo, sv):
        for name in dir(mod):
            fn = getattr(mod, name)
            if hasattr(fn, "cache_clear"):
                fn.cache_clear()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import bench
    import raymarching_tpu.ops.pallas_march as pm
    from raymarching_tpu import RenderConfig, compile_scene, load_scene
    from raymarching_tpu.api import resolve_backend
    from raymarching_tpu.scene.compile import iter_bvh_chunks

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    backend = resolve_backend("auto")
    out = {"workload": "512x512 ssaa2 fwd+bwd exact_fd, pipelined",
           "roundtrip_floor_s": bench._roundtrip_floor()}

    def measure(tag, plan, tables, cfg, forward_only=False):
        t0 = time.perf_counter()
        r = bench._measure(plan, tables, cfg, backend, reps=args.reps,
                           forward_only=forward_only)
        r["compile_s"] = round(time.perf_counter() - t0, 1)
        out[tag] = r
        print(f"{tag:28s} {r['median']:8.2f} Mrays/s "
              f"(spread {r['spread_pct']:.2f}%, compile "
              f"{r['compile_s']}s)", flush=True)

    cfg = RenderConfig(width=512, height=512, ssaa=2, iterations=1000,
                       shadows=True, normal_mode="fd", ray_chunk=65536)

    # --- wide-UNION chunk cull on scatter1k ---
    scene = load_scene(os.path.join(here, "scenes", "scatter1k.txt"))
    plan, tables = compile_scene(scene)
    nchunks = len(iter_bvh_chunks(plan.kernel))
    assert nchunks, "scatter1k must carry a bvh partition"
    out["scatter1k_chunks"] = nchunks
    stripped = dataclasses.replace(
        plan, kernel=dataclasses.replace(
            plan.kernel,
            groups=tuple(dataclasses.replace(g, bvh=None)
                         for g in plan.kernel.groups)))
    measure("scatter1k_bvh", plan, tables, cfg)
    measure("scatter1k_bvh_fwd", plan, tables, cfg, forward_only=True)
    measure("scatter1k_plain", stripped, tables, cfg)
    measure("scatter1k_plain_fwd", stripped, tables, cfg,
            forward_only=True)
    out["scatter1k_speedup"] = round(
        out["scatter1k_bvh"]["median"] / out["scatter1k_plain"]["median"],
        4)

    # --- recursive subtree cull on menger4 ---
    scene = load_scene(os.path.join(here, "scenes", "menger4.txt"))
    plan, tables = compile_scene(scene)
    measure("menger4_recursive", plan, tables, cfg)
    old = pm._SUBTREE_RECURSE_MIN
    pm._SUBTREE_RECURSE_MIN = 10 ** 9          # r3 flat 20-subtree cull
    _clear_kernel_caches()
    try:
        measure("menger4_flat", plan, tables, cfg)
    finally:
        pm._SUBTREE_RECURSE_MIN = old
        _clear_kernel_caches()
    out["menger4_speedup"] = round(
        out["menger4_recursive"]["median"] / out["menger4_flat"]["median"],
        4)

    print(json.dumps({k: v for k, v in out.items()
                      if not isinstance(v, dict)}))
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
