"""PPO on TPU: anakin-style fused rollout + update, sharded over the env axis.

The reference ships no training code (SURVEY.md §2.3: PPO lived in an
external repo, README.md:45-48); this is the first-class TPU-native design:
one jitted train_step = (lockstep episode rollout via lax.scan over the
vmapped env) + (GAE) + (minibatched clipped-PPO update), with the env batch
sharded over a 1-D device mesh.  Parameters are replicated; XLA inserts the
gradient all-reduce over ICI automatically from the sharding annotations
(the pjit path — SURVEY.md §2.3 communication backend).

Policy/value nets are the paper-era 2x64-tanh MLPs (arXiv:1910.04700 §VI).
Episodes are fixed 200-step TimeLimit horizons with no early termination
(all reference envs return done=False, e.g. scratch_itch.py:40), so every
env resets in lockstep — rollouts need zero cross-chip communication and
no per-step reset branching.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    num_envs: int = 4096
    rollout_len: int = 200          # = max_episode_steps (one full episode)
    lr: float = 3e-4
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    entropy_coef: float = 0.0
    value_coef: float = 0.5
    num_epochs: int = 4
    num_minibatches: int = 8
    max_grad_norm: float = 0.5
    hidden: int = 64


class ActorCritic(nn.Module):
    action_dim: int
    hidden: int = 64

    @nn.compact
    def __call__(self, obs):
        x = obs
        for _ in range(2):
            x = nn.tanh(nn.Dense(self.hidden)(x))
        mean = nn.Dense(self.action_dim,
                        kernel_init=nn.initializers.orthogonal(0.01))(x)
        log_std = self.param("log_std", nn.initializers.constant(-0.5),
                             (self.action_dim,))
        v = obs
        for _ in range(2):
            v = nn.tanh(nn.Dense(self.hidden)(v))
        value = nn.Dense(1, kernel_init=nn.initializers.orthogonal(1.0))(v)
        return mean, log_std, jnp.squeeze(value, -1)


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    key: jax.Array
    update_i: jax.Array


def _gaussian_logp(mean, log_std, a):
    var = jnp.exp(2 * log_std)
    return jnp.sum(-0.5 * ((a - mean) ** 2 / var + 2 * log_std
                           + jnp.log(2 * jnp.pi)), -1)


def init(task, cfg: PPOConfig, key: jax.Array, mesh: Mesh = None):
    net = ActorCritic(task.spec.action_len, cfg.hidden)
    k_params, k_env, k_state = jax.random.split(key, 3)
    obs0 = jnp.zeros((task.spec.obs_len,), jnp.float32)
    params = net.init(k_params, obs0)
    tx = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm),
                     optax.adam(cfg.lr))
    opt_state = tx.init(params)
    ts = TrainState(params=params, opt_state=opt_state, key=k_state,
                    update_i=jnp.zeros((), jnp.int32))

    keys = jax.random.split(k_env, cfg.num_envs)
    if mesh is not None:
        sh = NamedSharding(mesh, P("env"))
        keys = jax.device_put(keys, sh)
        env_state, _ = jax.jit(jax.vmap(task.reset))(keys)
        # every EnvState leaf has a leading env axis: pin it to the mesh
        env_state = jax.device_put(env_state, jax.tree.map(lambda _: sh, env_state))
    else:
        env_state, _ = jax.jit(jax.vmap(task.reset))(keys)
    return ts, env_state


def make_train_step(task, cfg: PPOConfig, mesh: Mesh = None):
    net = ActorCritic(task.spec.action_len, cfg.hidden)
    tx = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm),
                     optax.adam(cfg.lr))
    # Batched env step: the fused Pallas dynamics path when the task provides
    # it.  Under a multi-device mesh the batched step is shard_mapped over
    # the env axis (each device runs the kernel on its local shard — pallas
    # custom calls can't be partitioned by pjit itself); zero cross-chip
    # communication, matching the rollout design of SURVEY.md §2.3.
    if hasattr(task, "step_batched"):
        if mesh is None or mesh.size == 1:
            env_step = task.step_batched
        else:
            env_step = _shard_mapped_step(task, cfg, mesh)
    else:
        env_step = jax.vmap(task.step)

    def rollout(ts: TrainState, env_state, obs0):
        def body(carry, _):
            env_state, obs, key = carry
            key, k_act = jax.random.split(key)
            mean, log_std, value = jax.vmap(lambda o: net.apply(ts.params, o))(obs)
            noise = jax.random.normal(k_act, mean.shape, mean.dtype)
            action = mean + noise * jnp.exp(log_std)
            logp = _gaussian_logp(mean, log_std, action)
            env_state, obs_next, reward, done, info = env_step(env_state, action)
            out = dict(obs=obs, action=action, logp=logp, value=value,
                       reward=reward, success=info["task_success"])
            return (env_state, obs_next, key), out

        (env_state, last_obs, _), traj = jax.lax.scan(
            body, (env_state, obs0, ts.key), None, length=cfg.rollout_len)
        return env_state, last_obs, traj

    def update(ts: TrainState, traj, last_value):
        # GAE over the time axis (time-limit truncation -> bootstrap V)
        def gae_body(carry, x):
            adv_next, v_next = carry
            r, v = x
            delta = r + cfg.gamma * v_next - v
            adv = delta + cfg.gamma * cfg.gae_lambda * adv_next
            return (adv, v), adv

        (_, _), advs = jax.lax.scan(
            gae_body, (jnp.zeros_like(last_value), last_value),
            (traj["reward"], traj["value"]), reverse=True)
        returns = advs + traj["value"]
        adv_norm = (advs - advs.mean()) / (advs.std() + 1e-8)

        T, B = traj["reward"].shape
        flat = jax.tree.map(lambda x: x.reshape((T * B,) + x.shape[2:]),
                            dict(obs=traj["obs"], action=traj["action"],
                                 logp=traj["logp"], value=traj["value"],
                                 adv=adv_norm, ret=returns))

        def loss_fn(params, mb):
            mean, log_std, value = jax.vmap(lambda o: net.apply(params, o))(mb["obs"])
            logp = _gaussian_logp(mean, log_std, mb["action"])
            ratio = jnp.exp(logp - mb["logp"])
            pg1 = ratio * mb["adv"]
            pg2 = jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps) * mb["adv"]
            pg_loss = -jnp.mean(jnp.minimum(pg1, pg2))
            v_clip = mb["value"] + jnp.clip(value - mb["value"],
                                            -cfg.clip_eps, cfg.clip_eps)
            v_loss = 0.5 * jnp.mean(jnp.maximum((value - mb["ret"]) ** 2,
                                                (v_clip - mb["ret"]) ** 2))
            entropy = jnp.mean(jnp.sum(log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e), -1))
            loss = pg_loss + cfg.value_coef * v_loss - cfg.entropy_coef * entropy
            return loss, dict(pg_loss=pg_loss, v_loss=v_loss, entropy=entropy)

        def epoch_body(carry, _):
            params, opt_state, key = carry
            key, k_perm = jax.random.split(key)
            perm = jax.random.permutation(k_perm, T * B)
            mb_size = (T * B) // cfg.num_minibatches

            def mb_body(carry, i):
                params, opt_state = carry
                idx = jax.lax.dynamic_slice_in_dim(perm, i * mb_size, mb_size)
                mb = jax.tree.map(lambda x: x[idx], flat)
                (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, mb)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), aux

            (params, opt_state), aux = jax.lax.scan(
                mb_body, (params, opt_state), jnp.arange(cfg.num_minibatches))
            return (params, opt_state, key), aux

        (params, opt_state, key), aux = jax.lax.scan(
            epoch_body, (ts.params, ts.opt_state, ts.key), None,
            length=cfg.num_epochs)
        metrics = jax.tree.map(lambda x: x.mean(), aux)
        metrics["mean_return"] = traj["reward"].sum(0).mean()
        metrics["success_rate"] = traj["success"][-1].mean()
        ts = TrainState(params=params, opt_state=opt_state, key=key,
                        update_i=ts.update_i + 1)
        return ts, metrics

    def train_step(ts: TrainState, env_state):
        """One full episode rollout + PPO update; envs reset in lockstep."""
        key, k_reset = jax.random.split(ts.key)
        ts = ts.replace(key=key)
        keys = jax.random.split(k_reset, cfg.num_envs)
        env_state, obs0 = jax.vmap(task.reset)(keys)
        env_state, last_obs, traj = rollout(ts, env_state, obs0)
        _, _, last_value = jax.vmap(lambda o: net.apply(ts.params, o))(last_obs)
        ts, metrics = update(ts, traj, last_value)
        return ts, env_state, metrics

    if mesh is not None:
        env_sharded = NamedSharding(mesh, P("env"))
        repl = NamedSharding(mesh, P())
        state_shardings = _env_state_shardings(task, env_sharded)
        return jax.jit(
            train_step,
            in_shardings=(repl, state_shardings),
            out_shardings=(repl, state_shardings, repl),
        )
    return jax.jit(train_step)


def _shard_mapped_step(task, cfg, mesh: Mesh):
    """task.step_batched wrapped in shard_map over the 'env' mesh axis: each
    device steps its local env shard with the fused kernel; no collectives."""
    from jax.experimental.shard_map import shard_map

    env_spec = P("env")
    state_struct = _state_structure(task)
    state_specs = jax.tree.map(lambda _: env_spec, state_struct)

    # output structure: (state, obs, reward, done, info) — probed via
    # eval_shape (the state template batch is 8; shapes only set the pytree)
    act_struct = jax.ShapeDtypeStruct((8, task.spec.action_len), jnp.float32)
    out_struct = jax.eval_shape(jax.vmap(task.step), state_struct, act_struct)
    out_specs = jax.tree.map(lambda _: env_spec, out_struct)

    return shard_map(task.step_batched, mesh=mesh,
                     in_specs=(state_specs, env_spec),
                     out_specs=out_specs, check_rep=False)


def _env_state_shardings(task, sharding):
    """Every EnvState leaf has a leading env axis -> shard it."""
    return jax.tree.map(lambda _: sharding, _state_structure(task))


_STRUCT_CACHE: Dict[int, Any] = {}


def _state_structure(task):
    tid = id(task)
    if tid not in _STRUCT_CACHE:
        state, _ = jax.eval_shape(jax.vmap(task.reset),
                                  jax.random.split(jax.random.PRNGKey(0), 8))
        _STRUCT_CACHE[tid] = state
    return _STRUCT_CACHE[tid]
