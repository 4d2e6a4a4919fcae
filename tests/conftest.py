"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharding tests work without TPU hardware."""

import os

# force-override: the environment may pin JAX_PLATFORMS to a TPU platform
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def lfr_paths():
    base = "/root/reference/example"
    return {
        "network": f"{base}/LFR-network-n1000-k28.txt",
        "ground_truth": f"{base}/LFR-ground-truth-n1000-k28.txt",
    }


@pytest.fixture(scope="session")
def assort_path():
    return "/root/reference/example/assort-75-4.txt"
