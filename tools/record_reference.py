"""Record fixed-seed golden trajectories from the PyBullet reference.

THIS SCRIPT CANNOT RUN IN THE BUILD ENVIRONMENT (pybullet is not
installable there — zero egress).  It is the documented offline procedure
for producing the reference-side half of the physics-parity comparison
(PARITY_PHYSICS.md): run it on any machine with

    pip install pybullet gym==0.15.4 numpy keras tensorflow screeninfo
    pip install -e <reference assistive-gym checkout>

then copy the produced .npz files into tests/goldens/reference/ and run

    python -m pytest tests/test_physics_parity.py::test_reference_goldens

Usage (on the pybullet machine):

    python tools/record_reference.py --env ScratchItchJaco-v0 --seed 1001 \
        --episodes 3 --out tests/goldens/reference/

Each file contains, per episode, the full fixed-seed record needed to
replay and compare against assistive_gym_tpu:
  actions  f32[T, A]   the exact action sequence applied (seeded RNG)
  obs      f32[T+1, O] observation after reset and after each step
  rewards  f32[T]
  total_force_on_human f32[T]   (the getContactPoints c[9] sums)
  task_success         f32[T]
  seed     i64         the env seed
"""
import argparse
import os

import numpy as np


def record(env_id: str, seed: int, episodes: int, out_dir: str):
    import gym
    import assistive_gym  # noqa: F401  (registers the envs)

    env = gym.make(env_id)
    env.seed(seed)
    rng = np.random.RandomState(seed)
    os.makedirs(out_dir, exist_ok=True)

    for ep in range(episodes):
        obs = env.reset()
        obs_list, act_list, rew_list, force_list, succ_list = [obs], [], [], [], []
        done = False
        while not done:
            a = rng.uniform(-1, 1, size=env.action_space.shape).astype(np.float32)
            obs, r, done, info = env.step(a)
            obs_list.append(obs)
            act_list.append(a)
            rew_list.append(r)
            force_list.append(info.get("total_force_on_human", np.nan))
            succ_list.append(info.get("task_success", 0.0))
        path = os.path.join(out_dir, f"{env_id}_s{seed}_ep{ep}.npz")
        np.savez(path,
                 obs=np.asarray(obs_list, np.float32),
                 actions=np.asarray(act_list, np.float32),
                 rewards=np.asarray(rew_list, np.float32),
                 total_force_on_human=np.asarray(force_list, np.float32),
                 task_success=np.asarray(succ_list, np.float32),
                 seed=np.int64(seed))
        print(f"wrote {path} ({len(rew_list)} steps)")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--env", default="ScratchItchJaco-v0")
    ap.add_argument("--seed", type=int, default=1001)
    ap.add_argument("--episodes", type=int, default=3)
    ap.add_argument("--out", default="tests/goldens/reference/")
    args = ap.parse_args()
    record(args.env, args.seed, args.episodes, args.out)


if __name__ == "__main__":
    main()
