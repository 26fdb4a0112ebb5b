"""Test harness: force an 8-virtual-device CPU platform so the data-parallel mesh path is
exercised without TPUs (SURVEY.md section 4, item 5) and no test ever dispatches ops to a
live TPU.

NB: this environment pre-imports jax via a sitecustomize hook that registers a remote TPU
backend, so env vars alone come too late — we must also update jax.config before any backend
initializes."""

import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platform_name", "cpu")
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
