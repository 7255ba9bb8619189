"""One-process A/B: cost-ordered tile scheduling vs plain block ordering.

Measures the bench workload (demo 512^2 SSAA2 fwd+bwd, pipelined protocol
from bench.py) in four regimes — {exact_fd, fused_analytic} x {block,
cost-ordered} — plus the one-time cost of building the permutation
(plan_cost_order's step-counting march).  Run on the TPU host:
``python benchmarks/ab_cost_order.py [--json out.json]``.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import bench
    from raymarching_tpu import RenderConfig, compile_scene, load_scene
    from raymarching_tpu.api import plan_cost_order, resolve_backend

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scene = load_scene(os.path.join(here, "scenes", "demo.txt"))
    plan, tables = compile_scene(scene)
    backend = resolve_backend("auto")
    cfg = RenderConfig(width=512, height=512, ssaa=2, iterations=1000,
                       shadows=True, normal_mode="fd", ray_chunk=65536)
    fcfg = cfg.replace(fused_generators=True, normal_mode="analytic")

    out = {"workload": "demo 512x512 ssaa2 fwd+bwd, pipelined",
           "roundtrip_floor_s": bench._roundtrip_floor()}

    for name, c in (("exact_fd", cfg), ("fused_analytic", fcfg)):
        t0 = time.perf_counter()
        perm = plan_cost_order(plan, tables, c)
        out[f"{name}_perm_build_s"] = round(time.perf_counter() - t0, 3)
        base = bench._measure(plan, tables, c, backend)
        cost = bench._measure(plan, tables, c, backend, ray_perm=perm)
        out[f"{name}_block"] = base
        out[f"{name}_cost"] = cost
        out[f"{name}_speedup"] = round(cost["median"] / base["median"], 4)
        print(f"[{name}] block {base['median']:.2f} -> cost "
              f"{cost['median']:.2f} Mrays/s "
              f"({out[f'{name}_speedup']:.3f}x), perm build "
              f"{out[f'{name}_perm_build_s']:.1f}s", flush=True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items()
                      if not isinstance(v, dict)}))


if __name__ == "__main__":
    main()
