"""Dual-agent co-optimization: robot + human policies trained in lockstep.

The reference's *Human-v0 envs concatenate robot and human actions into one
vector (env.py:28,99-110) and obs into robot||human segments (e.g.
scratch_itch.py:10 obs 30 robot / +34 human); the paper's co-optimization
trained two PPO policies simultaneously on their own observation slices
(arXiv:1910.04700 §VIII).  The reference repo itself contains no trainer.

TPU-native design: ONE jitted train step rolls out both policies against the
shared env batch (each reads its obs slice, actions concatenate before
task.step), then runs two independent clipped-PPO updates from the shared
reward — the paper's cooperative formulation where both agents optimize the
same scalar reward.  Same mesh/sharding story as ppo.py.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from . import ppo
from .ppo import ActorCritic, PPOConfig, _gaussian_logp


@struct.dataclass
class CoopTrainState:
    robot: ppo.TrainState
    human: ppo.TrainState
    key: jax.Array
    # shared full-obs / discounted-return rms (reward is shared, so one
    # scale serves both policies); same VecNormalize semantics as ppo.py
    obs_rms: ppo.RunningStat = None
    ret_rms: ppo.RunningStat = None


def _slices(task):
    s = task.spec
    return ((0, s.obs_robot_len), (s.obs_robot_len, s.obs_len),
            (0, s.action_robot_len), (s.action_robot_len, s.action_len))


def init(task, cfg: PPOConfig, key: jax.Array, mesh: Mesh = None):
    assert task.spec.human_control, "co-optimization needs a *Human-v0 env"
    (or0, or1), (oh0, oh1), (ar0, ar1), (ah0, ah1) = _slices(task)
    k_r, k_h, k_env, k_state = jax.random.split(key, 4)
    tx = cfg.make_tx()

    def sub_state(k, obs_len, act_len):
        net = ActorCritic(act_len, cfg.hidden, cfg.log_std_max)
        params = net.init(k, jnp.zeros((obs_len,), jnp.float32))
        return ppo.TrainState(params=params, opt_state=tx.init(params),
                              key=jax.random.fold_in(k, 1),
                              update_i=jnp.zeros((), jnp.int32))

    ts = CoopTrainState(
        robot=sub_state(k_r, or1 - or0, ar1 - ar0),
        human=sub_state(k_h, oh1 - oh0, ah1 - ah0),
        key=k_state,
        obs_rms=ppo.RunningStat.create((task.spec.obs_len,)),
        ret_rms=ppo.RunningStat.create(()))

    if mesh is not None:
        from . import distributed as dist
        sh = NamedSharding(mesh, P("env"))
        keys = dist.make_global(
            np.asarray(jax.random.split(k_env, cfg.num_envs)), mesh)
        state_shardings = ppo._env_state_shardings(task, sh)
        env_state, _ = jax.jit(jax.vmap(task.reset),
                               out_shardings=(state_shardings, sh))(keys)
    else:
        keys = jax.random.split(k_env, cfg.num_envs)
        env_state, _ = jax.jit(jax.vmap(task.reset))(keys)
    return ts, env_state


def make_train_step(task, cfg: PPOConfig, mesh: Mesh = None):
    (or0, or1), (oh0, oh1), (ar0, ar1), (ah0, ah1) = _slices(task)
    net_r = ActorCritic(ar1 - ar0, cfg.hidden, cfg.log_std_max)
    net_h = ActorCritic(ah1 - ah0, cfg.hidden, cfg.log_std_max)
    tx = cfg.make_tx()
    # same batched-env-step selection as ppo.make_train_step
    if hasattr(task, "step_batched"):
        if mesh is None or mesh.size == 1:
            env_step = task.step_batched
        else:
            env_step = ppo._shard_mapped_step(task, cfg, mesh)
    else:
        env_step = jax.vmap(task.step)

    def policy_out(net, params, obs):
        mean, log_std, value = jax.vmap(lambda o: net.apply(params, o))(obs)
        return mean, log_std, value

    # training-time potential-based shaping (same contract as ppo.py):
    # both agents share the scalar reward, so one shaped stream serves both
    use_shaping = cfg.shaping_coef > 0.0 and hasattr(task, "shaping_potential")
    if use_shaping:
        phi_fn = jax.vmap(task.shaping_potential)

    def rollout(ts: CoopTrainState, env_state, obs0, key):
        if use_shaping:
            if cfg.shaping_decay_updates > 0:
                frac = (1.0 - ts.robot.update_i.astype(jnp.float32)
                        / cfg.shaping_decay_updates)
                coef = cfg.shaping_coef * jnp.maximum(frac, 0.0)
            else:
                coef = jnp.asarray(cfg.shaping_coef, jnp.float32)

        def body(carry, _):
            env_state, obs, ret, key = carry
            key, kr, kh = jax.random.split(key, 3)
            nobs = ts.obs_rms.normalize(obs) if cfg.normalize_obs else obs
            obs_r, obs_h = nobs[:, or0:or1], nobs[:, oh0:oh1]
            mr, sr, vr = policy_out(net_r, ts.robot.params, obs_r)
            mh, sh_, vh = policy_out(net_h, ts.human.params, obs_h)
            a_r = mr + jax.random.normal(kr, mr.shape, mr.dtype) * jnp.exp(sr)
            a_h = mh + jax.random.normal(kh, mh.shape, mh.dtype) * jnp.exp(sh_)
            action = jnp.concatenate([a_r, a_h], -1)
            if use_shaping:
                phi_s = phi_fn(env_state)
            env_state, obs_next, reward, done, info = env_step(env_state, action)
            raw_reward = reward
            if use_shaping:
                reward = reward + coef * (cfg.gamma * phi_fn(env_state) - phi_s)
            # rms return carry on the RAW reward (see ppo.py rollout note)
            ret = ret * cfg.gamma + raw_reward
            out = dict(obs_r=obs_r, obs_h=obs_h, a_r=a_r, a_h=a_h,
                       logp_r=_gaussian_logp(mr, sr, a_r),
                       logp_h=_gaussian_logp(mh, sh_, a_h),
                       v_r=vr, v_h=vh, reward=reward, raw_reward=raw_reward,
                       raw_obs=obs,
                       ret_carry=ret, success=info["task_success"])
            return (env_state, obs_next, ret, key), out

        ret0 = jnp.zeros((obs0.shape[0],), jnp.float32)
        (env_state, last_obs, _, _), traj = jax.lax.scan(
            body, (env_state, obs0, ret0, key), None, length=cfg.rollout_len)
        return env_state, last_obs, traj

    def gae(reward, value, last_value):
        def body(carry, x):
            adv_next, v_next = carry
            r, v = x
            delta = r + cfg.gamma * v_next - v
            adv = delta + cfg.gamma * cfg.gae_lambda * adv_next
            return (adv, v), adv
        (_, _), advs = jax.lax.scan(body, (jnp.zeros_like(last_value), last_value),
                                    (reward, value), reverse=True)
        return advs

    def ppo_update(sub: ppo.TrainState, net, obs, act, logp, value, adv, ret):
        T, B = adv.shape
        flat = jax.tree.map(lambda x: x.reshape((T * B,) + x.shape[2:]),
                            dict(obs=obs, action=act, logp=logp, value=value,
                                 adv=(adv - adv.mean()) / (adv.std() + 1e-8),
                                 ret=ret))

        def loss_fn(params, mb):
            mean, log_std, v = jax.vmap(lambda o: net.apply(params, o))(mb["obs"])
            lp = _gaussian_logp(mean, log_std, mb["action"])
            ratio = jnp.exp(lp - mb["logp"])
            pg = -jnp.mean(jnp.minimum(
                ratio * mb["adv"],
                jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps) * mb["adv"]))
            v_clip = mb["value"] + jnp.clip(v - mb["value"], -cfg.clip_eps, cfg.clip_eps)
            v_loss = 0.5 * jnp.mean(jnp.maximum((v - mb["ret"]) ** 2,
                                                (v_clip - mb["ret"]) ** 2))
            ent = jnp.mean(jnp.sum(log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e), -1))
            return pg + cfg.value_coef * v_loss - cfg.entropy_coef * ent, pg

        def epoch_body(carry, _):
            params, opt_state, key = carry
            key, k_perm = jax.random.split(key)
            perm = jax.random.permutation(k_perm, T * B)
            mb_size = (T * B) // cfg.num_minibatches

            def mb_body(c, i):
                params, opt_state = c
                idx = jax.lax.dynamic_slice_in_dim(perm, i * mb_size, mb_size)
                mb = jax.tree.map(lambda x: x[idx], flat)
                (_, pg), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, mb)
                updates, opt_state = tx.update(grads, opt_state, params)
                return (optax.apply_updates(params, updates), opt_state), pg

            (params, opt_state), pg = jax.lax.scan(
                mb_body, (params, opt_state), jnp.arange(cfg.num_minibatches))
            return (params, opt_state, key), pg

        (params, opt_state, key), pg = jax.lax.scan(
            epoch_body, (sub.params, sub.opt_state, sub.key), None,
            length=cfg.num_epochs)
        return (ppo.TrainState(params=params, opt_state=opt_state, key=key,
                               update_i=sub.update_i + 1), pg.mean())

    def train_step(ts: CoopTrainState, env_state):
        # independent subkeys per phase; the stored key is derived once up
        # front so no stream collides across updates (ADVICE.md round-1 #2)
        key_next, k_reset, k_roll = jax.random.split(ts.key, 3)
        ts = ts.replace(key=key_next)
        keys = jax.random.split(k_reset, cfg.num_envs)
        env_state, obs0 = jax.vmap(task.reset)(keys)
        # training-time task curriculum (same contract as ppo.py)
        if cfg.curriculum_decay_updates > 0 and hasattr(task, "curriculum"):
            c = jnp.maximum(1.0 - ts.robot.update_i.astype(jnp.float32)
                            / cfg.curriculum_decay_updates, 0.0)
            env_state = jax.vmap(lambda s: task.curriculum(s, c))(env_state)
        env_state, last_obs, traj = rollout(ts, env_state, obs0, k_roll)
        nlast = ts.obs_rms.normalize(last_obs) if cfg.normalize_obs else last_obs
        _, _, lv_r = policy_out(net_r, ts.robot.params, nlast[:, or0:or1])
        _, _, lv_h = policy_out(net_h, ts.human.params, nlast[:, oh0:oh1])
        reward = (ts.ret_rms.scale(traj["reward"]) if cfg.normalize_reward
                  else traj["reward"])
        adv_r = gae(reward, traj["v_r"], lv_r)
        adv_h = gae(reward, traj["v_h"], lv_h)
        robot, pg_r = ppo_update(ts.robot, net_r, traj["obs_r"], traj["a_r"],
                                 traj["logp_r"], traj["v_r"], adv_r,
                                 adv_r + traj["v_r"])
        human, pg_h = ppo_update(ts.human, net_h, traj["obs_h"], traj["a_h"],
                                 traj["logp_h"], traj["v_h"], adv_h,
                                 adv_h + traj["v_h"])
        obs_rms, ret_rms = ts.obs_rms, ts.ret_rms
        if cfg.normalize_obs:
            T, B = traj["reward"].shape
            obs_rms = obs_rms.update(
                traj["raw_obs"].reshape((T * B, traj["raw_obs"].shape[-1])))
        if cfg.normalize_reward:
            ret_rms = ret_rms.update(traj["ret_carry"].reshape((-1,)))
        ts = CoopTrainState(robot=robot, human=human, key=key_next,
                            obs_rms=obs_rms, ret_rms=ret_rms)
        metrics = dict(pg_loss_robot=pg_r, pg_loss_human=pg_h,
                       mean_return=traj["raw_reward"].sum(0).mean(),
                       success_rate=traj["success"][-1].mean())
        return ts, env_state, metrics

    if mesh is not None:
        env_sharded = NamedSharding(mesh, P("env"))
        repl = NamedSharding(mesh, P())
        state_shardings = ppo._env_state_shardings(task, env_sharded)
        return jax.jit(train_step,
                       in_shardings=(repl, state_shardings),
                       out_shardings=(repl, state_shardings, repl),
                       donate_argnums=(0, 1))
    # donate loop-carried (ts, env_state) — see ppo.make_train_step
    return jax.jit(train_step, donate_argnums=(0, 1))
