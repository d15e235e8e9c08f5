"""Benchmark: aggregate env-steps/s on the flagship config.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Flagship config per BASELINE.json: FeedingJaco-v0 (falls back to
ScratchItchJaco-v0 if feeding is not yet built), 4096 envs, random-policy
steps.  vs_baseline is measured against the reference's practical CPU
throughput: PyBullet Assistive Gym runs one env per process at roughly
~150 control-steps/s (50-250 Hz physics / frame_skip, single core, measured
class of engine) — the reference publishes no numbers (BASELINE.md), so we
use 150 steps/s/process as the 1x baseline.
"""
import json
import time

import jax
import jax.numpy as jnp

REFERENCE_STEPS_PER_SEC = 150.0  # see module docstring
BATCH = 4096
MEASURE_STEPS = 30


def main():
    from assistive_gym_tpu.envs import build_task

    try:
        task = build_task("feeding", "jaco", False)
        env_id = "FeedingJaco-v0"
    except Exception:
        task = build_task("scratch_itch", "jaco", False)
        env_id = "ScratchItchJaco-v0"

    keys = jax.random.split(jax.random.PRNGKey(0), BATCH)
    reset = jax.jit(jax.vmap(task.reset))
    # batched step: fused Pallas dynamics path when available; the state
    # carry is donated — every caller rebinds it, so XLA reuses the env
    # buffers in place instead of copying
    if hasattr(task, "step_batched"):
        step = jax.jit(task.step_batched, donate_argnums=(0,))
    else:
        step = jax.jit(jax.vmap(task.step), donate_argnums=(0,))
    state, obs = reset(keys)
    jax.block_until_ready(obs)

    n_act = task.spec.action_len
    akey = jax.random.PRNGKey(1)
    actions = jax.random.uniform(akey, (BATCH, n_act), jnp.float32, -1.0, 1.0)

    # warm-up / compile
    state, obs, *_ = step(state, actions)
    jax.block_until_ready(obs)

    t0 = time.time()
    for _ in range(MEASURE_STEPS):
        state, obs, rew, done, info = step(state, actions)
    jax.block_until_ready(obs)
    dt = time.time() - t0

    steps_per_sec = MEASURE_STEPS * BATCH / dt
    print(json.dumps({
        "metric": f"env-steps/s ({env_id}, {BATCH} envs, 1 chip)",
        "value": round(steps_per_sec, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(steps_per_sec / REFERENCE_STEPS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
