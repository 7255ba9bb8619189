"""Golden-image regression: every ladder scene rendered by the oracle must
stay pixel-stable (the formalization of the reference's committed
out_cpu.png / out_gpu.png visual-diff strategy, SURVEY §4 — the demo scene
is additionally anchored to the reference's own artifact in
tests/test_reference_artifact.py).

Goldens run at SSAA 2x2 with the full 1000-iteration march budget so SSAA
sampling, shadow-offset, and convergence-tail regressions are all visible;
regenerate with ``python tests/make_goldens.py`` after an intentional
semantic change (sizes are bounded by CPU cost — the 428-primitive demo
scene renders at ~2 ms/ray on CI hardware, see make_goldens.py)."""

import numpy as np
import pytest

from raymarching_tpu import load_scene, render_ref
from raymarching_tpu.io.image import to_uint8
from raymarching_tpu.io.png import read_png

from make_goldens import GOLDENS


@pytest.mark.parametrize("scene_file,name,cfg",
                         GOLDENS, ids=[g[1] for g in GOLDENS])
@pytest.mark.slow
def test_matches_golden(scenes_dir, scene_file, name, cfg):
    golden = read_png(f"tests/golden/{name}.png")
    scene = load_scene(str(scenes_dir / scene_file))
    img = to_uint8(np.asarray(render_ref(scene, cfg)), cfg.gamma)
    diff = np.abs(img.astype(int) - golden[..., :3].astype(int))
    # float-level churn may move isolated boundary pixels by a few counts
    assert np.median(diff) == 0
    assert (diff > 4).mean() < 0.005, f"max diff {diff.max()}"
    assert (diff == 0).mean() > 0.95
