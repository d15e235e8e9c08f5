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

Outage-proof by contract: the axon TPU tunnel can go down for hours
(round 3 lost its whole bench artifact to a bare rc=124).  Device init and
the total run are bounded by watchdog threads; on timeout or error this
script still prints one well-formed JSON line (with an "error" field) and
exits nonzero — the round artifact is an explicit failure record, never
an empty file.
"""
import json
import os
import sys
import threading
import time

REFERENCE_STEPS_PER_SEC = 150.0  # see module docstring
BATCH = 4096
MEASURE_STEPS = 30
DEVICE_INIT_BUDGET_S = 240.0   # tunnel-down jax.devices() blocks ~28 min
TOTAL_BUDGET_S = 1500.0        # compile (~2 min warm tunnel) + measure


def _fail(reason):
    print(json.dumps({
        "metric": "env-steps/s (FeedingJaco-v0, 4096 envs, 1 chip)",
        "value": 0,
        "unit": "env-steps/s",
        "vs_baseline": 0,
        "error": reason,
    }), flush=True)
    # os._exit: the stuck TPU-client thread cannot be joined
    os._exit(3)


def _watchdog(budget_s, reason, done_event):
    def run():
        if not done_event.wait(budget_s):
            _fail(reason)
    t = threading.Thread(target=run, daemon=True)
    t.start()
    return t


def main():
    total_done = threading.Event()
    _watchdog(TOTAL_BUDGET_S, "bench_timeout: run exceeded %ds" % TOTAL_BUDGET_S,
              total_done)

    import jax
    import jax.numpy as jnp

    init_done = threading.Event()
    _watchdog(DEVICE_INIT_BUDGET_S,
              "tpu_unreachable: device init exceeded %ds (axon tunnel down?)"
              % DEVICE_INIT_BUDGET_S, init_done)
    try:
        devices = jax.devices()
    except Exception as e:
        init_done.set()
        _fail("tpu_unreachable: %r" % (str(e)[:200],))
    init_done.set()

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
    }), flush=True)
    total_done.set()


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        _fail("bench_error: %r" % (str(e)[:300],))
