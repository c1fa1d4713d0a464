"""Test harness: force an 8-device virtual CPU platform BEFORE jax imports.

Multi-chip sharding semantics (DP psum-mean gradients, host-sharded data) are
exercised on a virtual CPU mesh per SURVEY.md §4 — no TPU pod needed.
"""

import os

# The harness presets JAX_PLATFORMS=axon (TPU tunnel) and a sitecustomize
# prepends the axon backend; both env override and a post-import config
# update are needed to actually land on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs


# ---- constrained-sandbox smoke tier (-m smoke) ----
# Curated module list rather than per-test marks: these files are numerics/
# data/host-logic only (no full-geometry compiles, no subprocess pods) and
# together run in well under 3 minutes on ONE cpu (timed table in README).
# `slow`-marked tests inside them stay excluded.
SMOKE_MODULES = {
    "test_schedule", "test_data", "test_data_verify",
    "test_transforms_golden", "test_tokenizer", "test_eval",
    "test_native_decode", "test_diagnostics", "test_bench_retry",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__ if item.module else ""
        if mod in SMOKE_MODULES and "slow" not in item.keywords:
            item.add_marker(pytest.mark.smoke)
