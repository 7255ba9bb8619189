"""Test harness configuration.

Forces JAX onto the host CPU with 8 virtual devices BEFORE jax imports, so:
  * the suite runs identically on TPU hosts and CPU-only CI;
  * multi-chip sharding tests get a fake 8-device mesh (the standard
    ``xla_force_host_platform_device_count`` fake-cluster technique —
    needed because the reference has no multi-device story at all,
    SURVEY §4).
"""

import os
import pathlib
import sys

# NOTE: on axon hosts a sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon already set, so plain env manipulation here is too late.
# Backends initialize lazily, though — jax.config.update before the first
# device use reliably pins the suite to CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import pytest  # noqa: E402

REPO = pathlib.Path(__file__).resolve().parent.parent
SCENES = REPO / "scenes"


@pytest.fixture(scope="session")
def demo_scene_text():
    return (SCENES / "demo.txt").read_text()


@pytest.fixture(scope="session")
def scenes_dir():
    return SCENES
