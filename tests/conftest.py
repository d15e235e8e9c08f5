"""Test configuration: run on a virtual 8-device CPU mesh.

The standard JAX trick for exercising pjit/shard_map multi-chip code paths
without a pod (SURVEY.md §4): tests must behave identically on TPU.
Note: the axon TPU plugin overrides JAX_PLATFORMS, so we must force the
platform through jax.config, not the environment.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

# Force the ENV VAR, not just jax.config: assistive_gym_tpu.__init__
# re-applies JAX_PLATFORMS from the environment (to protect training runs
# from stray scripts), so a bare `pytest` under the terminal's default
# JAX_PLATFORMS=axon would clobber the config update below at first
# package import and dial the TPU tunnel from inside the test suite.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

# NOTE: do NOT enable the persistent compilation cache here.  This
# XLA:CPU build segfaults both SERIALIZING (put_executable_and_time,
# deterministic on the coop train-step executable) and DESERIALIZING
# (get_executable_and_time, on a cached robot-matrix executable) large
# executables — three distinct suite crashes in round 3.  Opt in
# explicitly via AGT_JAX_CACHE at your own risk.
if os.environ.get("AGT_JAX_CACHE"):
    jax.config.update("jax_compilation_cache_dir", os.environ["AGT_JAX_CACHE"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
