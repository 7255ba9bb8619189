"""Regenerate the golden images (run manually, never in CI):

    python tests/make_goldens.py

Renders each golden scene on the jnp-oracle path at the configurations in
GOLDENS and writes PNGs into tests/golden/.  Commit the outputs only after
verifying the renders are correct (the reference-artifact test is the
independent anchor for the demo scene).
"""

import os
import pathlib
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from raymarching_tpu import RenderConfig, load_scene, render_ref  # noqa: E402
from raymarching_tpu.io.image import to_uint8  # noqa: E402
from raymarching_tpu.io.png import write_png  # noqa: E402

# (scene file, golden name, config).  Sizes are chosen to exercise SSAA,
# shadow offsets, and the convergence tail (full 1000-iteration budget)
# within the CI time budget: the 428-primitive demo scene costs ~2 ms/ray
# on this CPU, so its golden is 128x96 (36k rays with SSAA 2x2); the
# ladder configs have <=22 primitives and afford 192x144.
GOLDENS = [
    ("config1.txt", "config1_192x144_ssaa2",
     RenderConfig(width=192, height=144, ssaa=2, iterations=1000,
                  shadows=False)),
    ("config2.txt", "config2_192x144_ssaa2",
     RenderConfig(width=192, height=144, ssaa=2, iterations=1000)),
    ("config3.txt", "config3_192x144_ssaa2",
     RenderConfig(width=192, height=144, ssaa=2, iterations=1000)),
    ("config4.txt", "config4_192x144_ssaa2",
     RenderConfig(width=192, height=144, ssaa=2, iterations=1000)),
    ("demo.txt", "demo_128x96_ssaa2",
     RenderConfig(width=128, height=96, ssaa=2, iterations=1000,
                  ray_chunk=65536)),
    # the full extension stack in one frame: named materials, colored
    # lights, tinted-mirror bounces, soft shadows, ambient occlusion —
    # pins cross-version drift of every opt-in mode on the oracle path
    ("mirror.txt", "mirror_96x72_ssaa2_fx",
     RenderConfig(width=96, height=72, ssaa=2, iterations=1000,
                  reflect_strength=0.5, reflect_bounces=2,
                  soft_shadow_k=8.0, ao_strength=0.6, ray_chunk=65536)),
]


def main():
    out_dir = REPO / "tests" / "golden"
    out_dir.mkdir(exist_ok=True)
    for scene_file, name, cfg in GOLDENS:
        scene = load_scene(str(REPO / "scenes" / scene_file))
        img = to_uint8(np.asarray(render_ref(scene, cfg)), cfg.gamma)
        path = out_dir / f"{name}.png"
        write_png(str(path), img)
        print(f"{path.name}: {img.shape[1]}x{img.shape[0]} "
              f"mean={img.mean():.1f}")


if __name__ == "__main__":
    main()
