"""Test config: run JAX on an 8-device virtual CPU mesh (SURVEY.md §4.3).

Must set env vars before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon PJRT plugin presets JAX_PLATFORMS=axon in the environment and the
# env var alone does not win; force the CPU platform via config.
jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache (VERDICT r4 weak #3: the "fast" tier was
# 52 min, compile-dominated). Keyed by HLO hash — correctness-neutral; warm
# runs skip the CPU backend's serial compiles entirely (measured 12x on the
# dryrun core tier). Gitignored: unlike the committed .jax_cache driver
# cache, this one grows with the whole suite's program corpus.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_tests"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
