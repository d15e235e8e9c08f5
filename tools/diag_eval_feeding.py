"""Instrumented FeedingJaco eval: WHY do episodes fail?

For each eval episode (deterministic policy) records:
  - delivered food count (task_success counter, 0..8)
  - spilled count (8 - delivered - alive_at_end)
  - alive-at-end count (food still on/near the spoon, never delivered)
  - min over the episode of ||tip - mouth|| and ||base - mouth||
  - first step at which any food was delivered

Usage:  python tools/diag_eval_feeding.py --ckpt-dir ckpts/feeding_r2b
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import assistive_gym_tpu  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--step", type=int, default=None)
    ap.add_argument("--episodes", type=int, default=256)
    ap.add_argument("--horizon", type=int, default=200)
    ap.add_argument("--seed", type=int, default=123)
    args = ap.parse_args()

    from assistive_gym_tpu.registry import load
    from assistive_gym_tpu.parallel import checkpoint, ppo
    from assistive_gym_tpu.envs import base

    task = load("FeedingJaco-v0")
    spec = task.spec
    net = ppo.ActorCritic(task.spec.action_len, ppo.PPOConfig().hidden)
    ts_template, _ = ppo.init(task, ppo.PPOConfig(num_envs=2, rollout_len=2),
                              jax.random.PRNGKey(0))
    step_i, ts = checkpoint.restore_train_state(args.ckpt_dir, ts_template,
                                                args.step)
    print(f"loaded {args.ckpt_dir} @ update {step_i}")

    env_step = task.step_batched

    def policy(obs):
        nobs = ts.obs_rms.normalize(obs) if ts.obs_rms is not None else obs
        mean, _, _ = jax.vmap(lambda o: net.apply(ts.params, o))(nobs)
        return mean

    def dists(state):
        def one(s):
            fk_h, fk_r = base.scene_fk(spec, s)
            mouth = base.transform_point_on_link(fk_h, 23, s.human["mouth_pos"])
            tip = fk_r.pos[spec.tool_tip_link]
            b = fk_r.pos[spec.tool_base_link]
            return (jnp.linalg.norm(tip - mouth), jnp.linalg.norm(b - mouth))
        return jax.vmap(one)(state)

    def reset_features(state):
        """Per-episode reset conditions, for failure clustering (VERDICT r4
        ask: is success decided by head pose, bowl position, or the IK
        solution? — docs/training/feeding_diagnosis_r3.md)."""
        def one(s):
            fk_h, fk_r = base.scene_fk(spec, s)
            mouth = base.transform_point_on_link(fk_h, 23, s.human["mouth_pos"])
            tip = fk_r.pos[spec.tool_tip_link]
            bowl = jnp.mean(s.aux["food_pos"], 0)     # food spawns in the bowl
            return dict(
                head=s.human_q[jnp.asarray([21, 22, 23])],
                mouth=mouth, bowl=bowl, tip0=tip,
                d_tip_mouth0=jnp.linalg.norm(tip - mouth),
                impairment=s.human["impairment"].astype(jnp.float32),
                gender=s.human["gender_male"].astype(jnp.float32),
                limit_scale=s.human["limit_scale"],
                strength=s.human["strength"])
        return jax.vmap(one)(state)

    @jax.jit
    def rollout(key):
        keys = jax.random.split(key, args.episodes)
        state, obs = jax.vmap(task.reset)(keys)
        feats = reset_features(state)

        def body(carry, t):
            state, obs, mind_tip, mind_base, first_del = carry
            a = policy(obs)
            state, obs, rew, done, info = env_step(state, a)
            dt_, db_ = dists(state)
            mind_tip = jnp.minimum(mind_tip, dt_)
            mind_base = jnp.minimum(mind_base, db_)
            delivered = state.task_success > 0
            first_del = jnp.where((first_del < 0) & delivered, t, first_del)
            return (state, obs, mind_tip, mind_base, first_del), dict(
                reward=rew, success=info["task_success"])

        B = args.episodes
        init = (state, obs, jnp.full(B, 1e9), jnp.full(B, 1e9),
                jnp.full(B, -1, jnp.int32))
        (state, _, mind_tip, mind_base, first_del), traj = jax.lax.scan(
            body, init, jnp.arange(args.horizon))
        return dict(
            delivered=state.task_success,
            alive=state.aux["food_alive"].sum(-1),
            hit=state.aux["food_hit"].sum(-1),
            mind_tip=mind_tip, mind_base=mind_base, first_del=first_del,
            returns=traj["reward"].sum(0), success=traj["success"][-1],
            **{f"f_{k}": v for k, v in feats.items()})

    r = {k: np.asarray(v) for k, v in rollout(jax.random.PRNGKey(args.seed)).items()}
    delivered = r["delivered"].astype(int)
    alive = r["alive"].astype(int)
    spilled = 8 - delivered - alive
    succ = r["success"] > 0.5
    print(f"episodes={args.episodes}  success={succ.mean():.3f}  "
          f"return mean={r['returns'].mean():.1f}")
    print("delivered histogram (0..8):", np.bincount(delivered, minlength=9))
    for name, mask in [("SUCCESS", succ), ("FAIL", ~succ)]:
        if mask.sum() == 0:
            continue
        print(f"--- {name} (n={mask.sum()}) ---")
        print(f"  delivered {delivered[mask].mean():.2f}  "
              f"spilled {spilled[mask].mean():.2f}  "
              f"alive@end {alive[mask].mean():.2f}  hit {r['hit'][mask].mean():.2f}")
        print(f"  min d(tip,mouth)  mean {r['mind_tip'][mask].mean():.3f}  "
              f"p50 {np.median(r['mind_tip'][mask]):.3f}  "
              f"p90 {np.percentile(r['mind_tip'][mask], 90):.3f}")
        print(f"  min d(base,mouth) mean {r['mind_base'][mask].mean():.3f}  "
              f"p50 {np.median(r['mind_base'][mask]):.3f}")
        fd = r["first_del"][mask]
        print(f"  first delivery step: {np.median(fd[fd >= 0]) if (fd >= 0).any() else 'never'}"
              f"  (never in {(fd < 0).mean() * 100:.0f}% of these)")

    # ---- reset-condition clustering: which reset feature predicts failure?
    scalar_feats = {
        "head_yaw": r["f_head"][:, 2], "head_pitch": r["f_head"][:, 0],
        "head_roll": r["f_head"][:, 1],
        "mouth_x": r["f_mouth"][:, 0], "mouth_y": r["f_mouth"][:, 1],
        "mouth_z": r["f_mouth"][:, 2],
        "bowl_x": r["f_bowl"][:, 0], "bowl_y": r["f_bowl"][:, 1],
        "d(tip,mouth)@reset": r["f_d_tip_mouth0"],
        "impairment": r["f_impairment"], "gender": r["f_gender"],
        "limit_scale": r["f_limit_scale"], "strength": r["f_strength"],
    }
    if succ.any() and (~succ).any():
        print("--- reset-condition separation (SUCCESS vs FAIL) ---")
        rows = []
        for name, x in scalar_feats.items():
            xs, xf = x[succ], x[~succ]
            sd = x.std() + 1e-9
            d = abs(xs.mean() - xf.mean()) / sd          # Cohen-d-ish
            # AUC via rank statistic (prob a success ep outranks a fail ep)
            order = np.argsort(np.argsort(x))
            auc = (order[succ].mean() - order[~succ].mean()) / len(x) + 0.5
            rows.append((d, name, xs.mean(), xf.mean(), auc))
        for d, name, ms, mf, auc in sorted(rows, reverse=True):
            print(f"  {name:20s} effect={d:5.2f}  succ_mean={ms:+.3f}  "
                  f"fail_mean={mf:+.3f}  auc={auc:.2f}")
        top = max(rows)[1]
        x = scalar_feats[top]
        qs = np.quantile(x, [0, 0.25, 0.5, 0.75, 1.0])
        print(f"--- success rate by {top} quartile ---")
        for i in range(4):
            m = (x >= qs[i]) & (x <= qs[i + 1])
            print(f"  [{qs[i]:+.3f},{qs[i+1]:+.3f}] n={m.sum():3d} "
                  f"success={succ[m].mean():.2f}")
    out = os.path.join(os.path.dirname(args.ckpt_dir) or ".",
                       f"diag_feeding_{os.path.basename(args.ckpt_dir)}.npz")
    np.savez(out, **{k: v for k, v in r.items()}, success_bool=succ)
    print(f"per-episode dump: {out}")


if __name__ == "__main__":
    main()
