"""Component-ablation timing of the batched env step (drinking attack).

jax.profiler device traces may be unavailable through the axon tunnel, so
this measures where step time goes by DIFFERENCING jit'd variants of the
same step with one component statically removed (spec is a frozen
dataclass baked into the jit, so `dataclasses.replace` gives a clean
ablation with zero runtime branching):

    full step_batched      (reward/obs + physics)
    take_step_batched      (physics only)           -> _finish cost
    ... hook=None          (no water/food particles)-> particle-hook cost
    ... human_controllable=() (no human dynamics)   -> human-side cost
    ... pairs=EMPTY        (no contact narrowphase) -> contact cost

Prints one JSON line per variant with ms/step and env-steps/s.

    python tools/bench_step_parts.py --env DrinkingJaco-v0 --steps 20
"""
import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def time_step(step, state, actions, steps):
    nxt = lambda out: out[0] if isinstance(out, tuple) else out
    out = step(state, actions)          # compile + warm
    state = nxt(out)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.time()
    for _ in range(steps):
        out = step(state, actions)
        state = nxt(out)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    return (time.time() - t0) / steps


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--env", default="DrinkingJaco-v0")
    ap.add_argument("--num-envs", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from assistive_gym_tpu.registry import load
    from assistive_gym_tpu.envs import base
    from assistive_gym_tpu.physics import contact as con

    task = load(args.env)
    spec = task.spec
    B = args.num_envs
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    state, _ = jax.jit(jax.vmap(task.reset))(keys)
    actions = jax.random.uniform(jax.random.PRNGKey(1),
                                 (B, spec.action_len), jnp.float32, -1, 1)

    # one pair per kind (an all-empty table breaks the per-kind merge):
    # the "no_contacts" variant measures the step with narrowphase reduced
    # to ~zero pairs, so full - no_contacts ~= the contact pipeline cost.
    keep = np.zeros(len(spec.pairs.kind), bool)
    for k in np.unique(spec.pairs.kind):
        keep[int(np.argmax(spec.pairs.kind == k))] = True
    tiny_pairs = dataclasses.replace(
        spec.pairs,
        a=spec.pairs.a[keep], b=spec.pairs.b[keep], kind=spec.pairs.kind[keep],
        stiffness=spec.pairs.stiffness[keep], damping=spec.pairs.damping[keep],
        friction=spec.pairs.friction[keep], group=spec.pairs.group[keep],
        perm=np.arange(int(keep.sum()), dtype=np.int32))

    variants = [
        ("full_step", lambda: jax.jit(task.step_batched, donate_argnums=(0,))),
        ("physics_only", lambda: jax.jit(
            lambda s, a: base.take_step_batched(spec, s, a)[0])),
        ("no_particles", lambda: jax.jit(
            lambda s, a, sp=dataclasses.replace(
                spec, substep_hook=None, substep_hook_batched=None):
            base.take_step_batched(sp, s, a)[0])),
        ("no_human_dyn", lambda: jax.jit(
            lambda s, a, sp=dataclasses.replace(spec, human_controllable=()):
            base.take_step_batched(sp, s, a)[0])),
        ("no_contacts", lambda: jax.jit(
            lambda s, a, sp=dataclasses.replace(spec, pairs=tiny_pairs):
            base.take_step_batched(sp, s, a)[0])),
    ]

    results = []
    fout = open(args.out, "a") if args.out else None
    for name, mk in variants:
        try:
            st = jax.tree.map(lambda x: jnp.array(x), state)  # donation-safe copy
            dt = time_step(mk(), st, actions, args.steps)
            rec = {"env": args.env, "variant": name, "envs": B,
                   "ms_per_step": round(dt * 1e3, 2),
                   "steps_per_s": round(B / dt, 1)}
        except Exception as e:
            rec = {"env": args.env, "variant": name, "error": repr(e)[:200]}
        results.append(rec)
        print(json.dumps(rec), flush=True)
        if fout:
            fout.write(json.dumps(rec) + "\n")
            fout.flush()
    if fout:
        fout.close()


if __name__ == "__main__":
    main()
