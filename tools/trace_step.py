"""Capture a jax.profiler (xprof/perfetto) device trace of the hot step.

Closes the SURVEY.md §5 tracing gap: wall-clock phase timers
(profile_step.py) say WHERE time goes at the component level; this tool
records the real XLA op-level timeline so kernel-level optimization is
data-driven.

    python tools/trace_step.py --env FeedingJaco-v0 --steps 20 \
        --out /tmp/agt_trace

View with xprof / tensorboard-profile (the trace directory contains
.xplane.pb), or convert the .trace.json.gz to Perfetto.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--env", default="FeedingJaco-v0")
    ap.add_argument("--num-envs", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--out", default="/tmp/agt_trace")
    args = ap.parse_args()

    from assistive_gym_tpu.registry import load

    task = load(args.env)
    keys = jax.random.split(jax.random.PRNGKey(0), args.num_envs)
    state, _ = jax.jit(jax.vmap(task.reset))(keys)
    step = (jax.jit(task.step_batched) if hasattr(task, "step_batched")
            else jax.jit(jax.vmap(task.step)))
    acts = jax.random.uniform(
        jax.random.PRNGKey(1), (args.num_envs, task.spec.action_len),
        jnp.float32, -1, 1)

    # warm up (compile outside the trace)
    state, *_ = step(state, acts)
    jax.block_until_ready(state)

    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        for _ in range(args.steps):
            state, obs, rew, done, info = step(state, acts)
        jax.block_until_ready(rew)
    print(f"trace written to {args.out} "
          f"({args.steps} steps x {args.num_envs} envs)")


if __name__ == "__main__":
    main()
