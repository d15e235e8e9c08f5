"""2-process multi-host integration test (VERDICT round-1 missing #4).

Two driver subprocesses — each with 4 virtual CPU devices — join a local
jax.distributed coordinator and run a REAL sharded PPO train step over the
global 8-device 'env' mesh: the per-host-driver design of SURVEY.md §2.3
exercised without a pod.  Asserts both processes complete and agree on the
(replicated) update metrics.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["AGT_COORDINATOR"] = sys.argv[1]
os.environ["AGT_NUM_PROCESSES"] = "2"
os.environ["AGT_PROCESS_ID"] = sys.argv[2]
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from assistive_gym_tpu.parallel import distributed, ppo
from assistive_gym_tpu.registry import load

assert distributed.initialize_from_env()
assert jax.process_count() == 2
mesh = distributed.env_mesh()
assert mesh.size == 8, mesh.size

cfg = ppo.PPOConfig(num_envs=8, rollout_len=2, num_epochs=1,
                    num_minibatches=1)
task = load("ScratchItchJaco-v0")
ts, env_state = ppo.init(task, cfg, jax.random.PRNGKey(0), mesh)
train_step = ppo.make_train_step(task, cfg, mesh)
ts, env_state, metrics = train_step(ts, env_state)
ret = float(np.asarray(jax.device_get(metrics["mean_return"])))
print(f"MULTIHOST_METRIC {ret:.6f}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_train_step():
    coord = f"localhost:{_free_port()}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))
    procs = [
        subprocess.Popen([sys.executable, "-c", _WORKER, coord, str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1500)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-4000:]}"
    metrics = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("MULTIHOST_METRIC")]
        assert lines, out[-2000:]
        metrics.append(float(lines[0].split()[1]))
    # the update metrics are replicated over the global mesh: both hosts
    # must see the identical value
    assert metrics[0] == metrics[1], metrics
    assert np.isfinite(metrics[0])
