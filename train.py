"""Train a PPO policy on any registered env, sharded over all local devices.

The reference trained with an external PPO repo (SURVEY.md §0: no training
code in-tree, README.md:45-48); this is the in-tree TPU-native trainer:

    python train.py --env FeedingJaco-v0 --updates 200 \
        --num-envs 4096 --log-dir runs/feeding --ckpt-dir ckpts/feeding

Resumes automatically from the newest checkpoint in --ckpt-dir.
One update = one full 200-step episode across all envs + a clipped-PPO
update; envs are sharded over a 1-D device mesh ('env' axis) and gradients
all-reduce over ICI via the pjit sharding annotations (SURVEY.md §2.3).
"""
from __future__ import annotations

import argparse
import time

import jax
import numpy as np
from jax.sharding import Mesh

from assistive_gym_tpu.registry import ENV_IDS, load
from assistive_gym_tpu.parallel import ppo, checkpoint, distributed
from assistive_gym_tpu.utils.metrics import MetricsLogger


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--env", default="ScratchItchJaco-v0", choices=sorted(ENV_IDS))
    p.add_argument("--updates", type=int, default=100)
    p.add_argument("--num-envs", type=int, default=4096)
    p.add_argument("--rollout-len", type=int, default=200)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--entropy-coef", type=float, default=0.0)
    p.add_argument("--lr-decay", action="store_true",
                   help="linear lr decay to 0 over --updates")
    p.add_argument("--no-norm", action="store_true",
                   help="disable obs/reward normalization")
    p.add_argument("--shaping-coef", type=float, default=0.0,
                   help="training-time potential-based shaping coefficient "
                        "(tasks exposing shaping_potential; annealed to 0)")
    p.add_argument("--shaping-decay", type=int, default=0,
                   help="updates over which the shaping coef anneals to 0 "
                        "(0 = constant)")
    p.add_argument("--curriculum-decay", type=int, default=0,
                   help="updates over which the task curriculum anneals "
                        "back to reference parity (tasks exposing "
                        "curriculum(state, c); 0 = disabled)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-dir", default=None)
    p.add_argument("--ckpt-dir", default=None)
    p.add_argument("--ckpt-every", type=int, default=10)
    p.add_argument("--init-from", default=None, metavar="CKPT_DIR",
                   help="warm-start params + obs/ret normalization stats from "
                        "another run's checkpoint (fresh optimizer, fresh lr/"
                        "shaping schedules); ignored when resuming")
    p.add_argument("--log-std-max", type=float, default=0.0,
                   help="upper clamp on the policy log_std parameter "
                        "(default 0.0 = sigma <= 1; e.g. -0.7 caps sigma at "
                        "0.5 so late training refines the mean instead of "
                        "re-averaging noise — the anti-plateau lever from "
                        "ROUND5_NOTES.md)")
    p.add_argument("--no-mesh", action="store_true",
                   help="single-device, no sharding (debug)")
    p.add_argument("--debug-nans", action="store_true",
                   help="enable jax_debug_nans: fail fast with a traceback "
                        "at the first NaN-producing op (failure-detection "
                        "harness, SURVEY.md §5)")
    p.add_argument("--coop", action="store_true",
                   help="dual-policy co-optimization (requires a *Human-v0 env)")
    return p.parse_args()


def main():
    args = parse_args()
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    # multi-host: join the runtime when the AGT_* env contract is present
    # (per-host driver processes, SURVEY.md §2.3); must precede jax.devices()
    multihost = distributed.initialize_from_env()
    task = load(args.env)

    devices = jax.devices()        # global across hosts after initialize
    mesh = None
    if not args.no_mesh and len(devices) >= 1:
        n = len(devices)
        num_envs = (args.num_envs // n) * n or n
        mesh = Mesh(np.array(devices), axis_names=("env",))
    else:
        num_envs = args.num_envs
    if multihost:
        print(f"multihost: process {jax.process_index()}/{jax.process_count()} "
              f"local_devices={jax.local_device_count()}")
    cfg = ppo.PPOConfig(num_envs=num_envs, rollout_len=args.rollout_len,
                        lr=args.lr, entropy_coef=args.entropy_coef,
                        normalize_obs=not args.no_norm,
                        normalize_reward=not args.no_norm,
                        total_updates=args.updates if args.lr_decay else 0,
                        shaping_coef=args.shaping_coef,
                        shaping_decay_updates=args.shaping_decay,
                        curriculum_decay_updates=args.curriculum_decay,
                        log_std_max=args.log_std_max)
    print(f"env={args.env} devices={len(devices)} num_envs={num_envs}")

    if args.coop:
        from assistive_gym_tpu.parallel import coop as algo
        if not task.spec.human_control:
            raise SystemExit("--coop requires a *Human-v0 env id")
    else:
        algo = ppo
    ts, env_state = algo.init(task, cfg, jax.random.PRNGKey(args.seed), mesh)
    train_step = algo.make_train_step(task, cfg, mesh)

    start = 0
    if args.ckpt_dir and checkpoint.latest_step(args.ckpt_dir) is not None:
        start, ts, es = checkpoint.restore(
            args.ckpt_dir, ts, None if multihost else env_state)
        if es is not None:
            env_state = es
        print(f"resumed from update {start}")
    elif args.init_from:
        # warm start: policy/value params + normalization stats only; the
        # optimizer, lr schedule, update counter (shaping anneal), and PRNG
        # key keep their fresh-init values
        src_step, ts = checkpoint.restore_train_state(
            args.init_from, ts, skip=("opt_state", "update_i", "key"))
        print(f"warm-started params/rms from {args.init_from} @ {src_step}")

    primary = distributed.is_primary()
    logger = MetricsLogger(args.log_dir) if (args.log_dir and primary) else None
    steps_per_update = cfg.num_envs * cfg.rollout_len
    # multihost: env_state is sharded across hosts — checkpoint the
    # replicated train state only (process 0; has_env_state=False sidecar)
    def save(step):
        if args.ckpt_dir and primary:
            checkpoint.save(args.ckpt_dir, step, ts,
                            env_state if not multihost else None)

    for i in range(start, args.updates):
        t0 = time.time()
        ts, env_state, metrics = train_step(ts, env_state)
        jax.block_until_ready(metrics)
        dt = time.time() - t0
        sps = steps_per_update / dt
        if logger:
            logger.log(i + 1, metrics, extra={"env_steps_per_s": round(sps, 1)})
        elif primary:
            m = {k: float(np.asarray(v).mean()) for k, v in metrics.items()}
            print(f"[{i + 1}/{args.updates}] return={m.get('mean_return', 0):.2f} "
                  f"success={m.get('success_rate', 0):.3f} {sps:,.0f} steps/s",
                  flush=True)
        if (i + 1) % args.ckpt_every == 0:
            save(i + 1)

    save(args.updates)


if __name__ == "__main__":
    main()
