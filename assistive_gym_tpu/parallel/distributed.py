"""Multi-host runtime scaffolding (SURVEY.md §2.3: per-host driver
processes under jax.distributed.initialize).

The reference has no distributed machinery at all (SURVEY.md §2.3); the
TPU-native design is: one Python driver per host, all joined into a single
JAX runtime by jax.distributed.initialize, with ONE global 1-D 'env' mesh
over every device in the slice.  Rollouts are env-sharded so they need
zero cross-host communication; only the learner's gradient all-reduce
crosses chips, and XLA routes it over ICI from the sharding annotations.

Tested without a pod by the 2-process CPU integration test
(tests/test_multihost.py): two subprocesses, each given 4 virtual CPU
devices, join a local coordinator and run a real sharded train step over
the global 8-device mesh.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# environment contract for the per-host driver processes
ENV_COORDINATOR = "AGT_COORDINATOR"      # e.g. "10.0.0.1:8476"
ENV_NUM_PROCESSES = "AGT_NUM_PROCESSES"
ENV_PROCESS_ID = "AGT_PROCESS_ID"


def initialize_from_env() -> bool:
    """Join the multi-host runtime when the AGT_* env contract is present.

    Returns True when running multi-process (after
    jax.distributed.initialize), False for the ordinary single-process
    path.  Must be called before the first jax.devices() query.
    """
    if ENV_COORDINATOR not in os.environ:
        return False
    jax.distributed.initialize(
        coordinator_address=os.environ[ENV_COORDINATOR],
        num_processes=int(os.environ[ENV_NUM_PROCESSES]),
        process_id=int(os.environ[ENV_PROCESS_ID]),
    )
    return True


def env_mesh() -> Mesh:
    """The global 1-D 'env' mesh over every device in the runtime
    (all hosts; jax.devices() is global after initialize)."""
    return Mesh(np.array(jax.devices()), axis_names=("env",))


def is_primary() -> bool:
    return jax.process_index() == 0


def make_global(host_array: np.ndarray, mesh: Mesh,
                spec: Optional[P] = None) -> jax.Array:
    """Build a global jax.Array from identical per-host numpy data.

    Every process must hold the SAME full array (e.g. PRNG keys derived
    from a shared seed); each materializes only its addressable shards —
    the multi-host-safe replacement for device_put(x, sharding).
    """
    x = np.asarray(host_array)
    sharding = NamedSharding(mesh, P("env") if spec is None else spec)
    return jax.make_array_from_callback(x.shape, sharding,
                                        lambda idx: x[idx])
