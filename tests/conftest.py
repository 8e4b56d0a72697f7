"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding tests run anywhere (the real-TPU bench path is exercised by
bench.py, not the unit suite).

Note: this image pre-imports jax via sitecustomize and pins
JAX_PLATFORMS=axon (the tunneled TPU). Unit tests must override BOTH the
env var and the already-imported config before any backend initializes,
otherwise every op round-trips through the TPU tunnel.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

REFERENCE_SCENES = pathlib.Path("/root/reference/scenes")


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.default_backend() == "cpu", (
        "unit tests must run on CPU; backend initialized too early")


@pytest.fixture(scope="session")
def cornell_scene_path():
    p = REFERENCE_SCENES / "cornell_box" / "scene.json"
    if not p.exists():
        pytest.skip("reference cornell_box scene not available")
    return str(p)


@pytest.fixture(scope="session")
def cornell_scene(cornell_scene_path):
    from gpu_pathtracer_tpu.scene.parse import load_scene
    return load_scene(cornell_scene_path)
