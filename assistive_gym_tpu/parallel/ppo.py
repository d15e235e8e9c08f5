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
    # VecNormalize-style running obs/reward normalization (the external
    # paper-era PPO harness normalized both; decisive for task success)
    normalize_obs: bool = True
    normalize_reward: bool = True
    # linear lr decay to 0 over this many updates (0 = constant lr)
    total_updates: int = 0
    # training-time potential-based reward shaping (Ng et al. 1999):
    # r' = r + c_t * (gamma * Phi(s') - Phi(s)) with Phi supplied by the
    # task (task.shaping_potential); preserves the optimal policy and is
    # annealed linearly to 0 by shaping_decay_updates, so late training and
    # all evaluation run on the true reference reward.  Only the training
    # signal changes — env semantics / reward parity are untouched.
    shaping_coef: float = 0.0
    shaping_decay_updates: int = 0
    # training-time task curriculum: when > 0 and the task exposes
    # curriculum(state, c), apply it after every reset with
    # c = max(1 - update_i / curriculum_decay_updates, 0) — tasks use c to
    # relax a knife-edge success criterion early (e.g. drinking's in_mouth
    # shell) and anneal back to reference parity.  Evaluation always runs
    # the task's parity semantics (reset leaves the curriculum at c=0).
    curriculum_decay_updates: int = 0
    # upper clamp for the policy log_std (see ActorCritic.log_std_max)
    log_std_max: float = 0.0

    def make_tx(self):
        if self.total_updates > 0:
            total = self.total_updates * self.num_epochs * self.num_minibatches
            lr = optax.linear_schedule(self.lr, 0.0, total)
        else:
            lr = self.lr
        return optax.chain(optax.clip_by_global_norm(self.max_grad_norm),
                           optax.adam(lr))


class ActorCritic(nn.Module):
    action_dim: int
    hidden: int = 64
    # upper clamp on the state-independent log_std parameter.  0.0 keeps the
    # historical behavior; a tighter cap (e.g. -0.7 -> sigma 0.5) is the
    # anti-plateau lever for tasks where entropy pins near the cap and
    # sampled rollouts stay noise-dominated while the deterministic mean is
    # competent (every feeding run: entropy ~8.8, per-dim sigma ~0.9 on
    # [-1,1]-clipped actions — ROUND5_NOTES.md).
    log_std_max: float = 0.0

    @nn.compact
    def __call__(self, obs):
        x = obs
        for _ in range(2):
            x = nn.tanh(nn.Dense(self.hidden)(x))
        mean = nn.Dense(self.action_dim,
                        kernel_init=nn.initializers.orthogonal(0.01))(x)
        log_std = self.param("log_std", nn.initializers.constant(-0.5),
                             (self.action_dim,))
        # clamp: with an entropy bonus the unconstrained parameter can run
        # away once lr decay freezes the policy gradient (seen on the
        # feeding run: std ~1.3 saturates the [-1,1] action clip)
        log_std = jnp.clip(log_std, -5.0, self.log_std_max)
        v = obs
        for _ in range(2):
            v = nn.tanh(nn.Dense(self.hidden)(v))
        value = nn.Dense(1, kernel_init=nn.initializers.orthogonal(1.0))(v)
        return mean, log_std, jnp.squeeze(value, -1)


@struct.dataclass
class RunningStat:
    """Batched Welford/parallel-variance accumulator (VecNormalize rms)."""
    mean: jax.Array
    var: jax.Array
    count: jax.Array

    @staticmethod
    def create(shape=()):
        return RunningStat(mean=jnp.zeros(shape, jnp.float32),
                           var=jnp.ones(shape, jnp.float32),
                           count=jnp.asarray(1e-4, jnp.float32))

    def update(self, batch: jax.Array) -> "RunningStat":
        """Fold a [N, ...] batch in (Chan et al. parallel combine)."""
        n = jnp.asarray(batch.shape[0], jnp.float32)
        b_mean = batch.mean(0)
        b_var = batch.var(0)
        delta = b_mean - self.mean
        tot = self.count + n
        mean = self.mean + delta * n / tot
        m2 = (self.var * self.count + b_var * n
              + delta ** 2 * self.count * n / tot)
        return RunningStat(mean=mean, var=m2 / tot, count=tot)

    def normalize(self, x, clip=10.0):
        return jnp.clip((x - self.mean) / jnp.sqrt(self.var + 1e-8),
                        -clip, clip)

    def scale(self, x, clip=10.0):
        """Reward scaling: divide by running std (no mean shift)."""
        return jnp.clip(x / jnp.sqrt(self.var + 1e-8), -clip, clip)


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    key: jax.Array
    update_i: jax.Array
    obs_rms: RunningStat = None
    ret_rms: RunningStat = None


def _gaussian_logp(mean, log_std, a):
    var = jnp.exp(2 * log_std)
    return jnp.sum(-0.5 * ((a - mean) ** 2 / var + 2 * log_std
                           + jnp.log(2 * jnp.pi)), -1)


def init(task, cfg: PPOConfig, key: jax.Array, mesh: Mesh = None):
    net = ActorCritic(task.spec.action_len, cfg.hidden, cfg.log_std_max)
    k_params, k_env, k_state = jax.random.split(key, 3)
    obs0 = jnp.zeros((task.spec.obs_len,), jnp.float32)
    params = net.init(k_params, obs0)
    tx = cfg.make_tx()
    opt_state = tx.init(params)
    ts = TrainState(params=params, opt_state=opt_state, key=k_state,
                    update_i=jnp.zeros((), jnp.int32),
                    obs_rms=RunningStat.create((task.spec.obs_len,)),
                    ret_rms=RunningStat.create(()))

    if mesh is not None:
        # multi-host-safe placement: every process derives the same key
        # array from the shared seed and materializes only its addressable
        # shards; reset runs as one pjit over the global mesh so EnvState
        # is born sharded (no host->device round trip)
        from . import distributed as dist
        sh = NamedSharding(mesh, P("env"))
        keys = dist.make_global(
            np.asarray(jax.random.split(k_env, cfg.num_envs)), mesh)
        state_shardings = _env_state_shardings(task, sh)
        env_state, _ = jax.jit(jax.vmap(task.reset),
                               out_shardings=(state_shardings, sh))(keys)
    else:
        keys = jax.random.split(k_env, cfg.num_envs)
        env_state, _ = jax.jit(jax.vmap(task.reset))(keys)
    return ts, env_state


def make_train_step(task, cfg: PPOConfig, mesh: Mesh = None):
    net = ActorCritic(task.spec.action_len, cfg.hidden, cfg.log_std_max)
    tx = cfg.make_tx()
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

    def norm_obs(ts: TrainState, obs):
        return ts.obs_rms.normalize(obs) if cfg.normalize_obs else obs

    use_shaping = cfg.shaping_coef > 0.0 and hasattr(task, "shaping_potential")
    if use_shaping:
        phi_fn = jax.vmap(task.shaping_potential)

    def shaping_coef_now(ts: TrainState):
        if cfg.shaping_decay_updates > 0:
            frac = 1.0 - ts.update_i.astype(jnp.float32) / cfg.shaping_decay_updates
            return cfg.shaping_coef * jnp.maximum(frac, 0.0)
        return jnp.asarray(cfg.shaping_coef, jnp.float32)

    def rollout(ts: TrainState, env_state, obs0, key):
        coef = shaping_coef_now(ts) if use_shaping else None

        def body(carry, _):
            env_state, obs, ret, key = carry
            key, k_act = jax.random.split(key)
            mean, log_std, value = jax.vmap(
                lambda o: net.apply(ts.params, o))(norm_obs(ts, obs))
            noise = jax.random.normal(k_act, mean.shape, mean.dtype)
            action = mean + noise * jnp.exp(log_std)
            logp = _gaussian_logp(mean, log_std, action)
            if use_shaping:
                phi_s = phi_fn(env_state)
            env_state, obs_next, reward, done, info = env_step(env_state, action)
            raw_reward = reward
            if use_shaping:
                reward = reward + coef * (cfg.gamma * phi_fn(env_state) - phi_s)
            # per-env discounted return carry, for the reward-scale rms —
            # fitted on the RAW reward so the normalization scale stays on
            # the true reward across the shaping anneal (ADVICE.md round-3
            # #4; the shaping delta is transient and same-magnitude, so
            # scaling the shaped stream by raw-fitted stats is sound)
            ret = ret * cfg.gamma + raw_reward
            out = dict(obs=obs, action=action, logp=logp, value=value,
                       reward=reward, raw_reward=raw_reward, ret_carry=ret,
                       success=info["task_success"])
            return (env_state, obs_next, ret, key), out

        ret0 = jnp.zeros((obs0.shape[0],), jnp.float32)
        (env_state, last_obs, _, _), traj = jax.lax.scan(
            body, (env_state, obs0, ret0, key), None, length=cfg.rollout_len)
        return env_state, last_obs, traj

    def update(ts: TrainState, traj, last_value, key):
        reward = traj["reward"]
        if cfg.normalize_reward:
            reward = ts.ret_rms.scale(reward)

        # GAE over the time axis (time-limit truncation -> bootstrap V)
        def gae_body(carry, x):
            adv_next, v_next = carry
            r, v = x
            delta = r + cfg.gamma * v_next - v
            adv = delta + cfg.gamma * cfg.gae_lambda * adv_next
            return (adv, v), adv

        (_, _), advs = jax.lax.scan(
            gae_body, (jnp.zeros_like(last_value), last_value),
            (reward, traj["value"]), reverse=True)
        returns = advs + traj["value"]
        adv_norm = (advs - advs.mean()) / (advs.std() + 1e-8)

        T, B = traj["reward"].shape
        flat = jax.tree.map(lambda x: x.reshape((T * B,) + x.shape[2:]),
                            dict(obs=norm_obs(ts, traj["obs"]),
                                 action=traj["action"],
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

        (params, opt_state, _), aux = jax.lax.scan(
            epoch_body, (ts.params, ts.opt_state, key), None,
            length=cfg.num_epochs)
        metrics = jax.tree.map(lambda x: x.mean(), aux)
        # mean_return is always the TRUE env return (shaping excluded)
        metrics["mean_return"] = traj["raw_reward"].sum(0).mean()
        metrics["success_rate"] = traj["success"][-1].mean()

        # fold this rollout's raw obs / discounted returns into the rms
        # AFTER the update (VecNormalize order: stats used this update were
        # the pre-rollout ones for both the rollout and the minibatches)
        obs_rms, ret_rms = ts.obs_rms, ts.ret_rms
        if cfg.normalize_obs:
            obs_rms = obs_rms.update(
                traj["obs"].reshape((T * B, traj["obs"].shape[-1])))
        if cfg.normalize_reward:
            ret_rms = ret_rms.update(traj["ret_carry"].reshape((T * B,)))

        ts = ts.replace(params=params, opt_state=opt_state,
                        update_i=ts.update_i + 1,
                        obs_rms=obs_rms, ret_rms=ret_rms)
        return ts, metrics

    def train_step(ts: TrainState, env_state):
        """One full episode rollout + PPO update; envs reset in lockstep.

        Keys: independent subkeys per phase, with the next state's key
        derived once up front — no stream collision between the rollout's
        split(key)[0:2] chain and the next update (ADVICE.md round-1 #2).
        """
        key_next, k_reset, k_roll, k_upd = jax.random.split(ts.key, 4)
        ts = ts.replace(key=key_next)
        keys = jax.random.split(k_reset, cfg.num_envs)
        env_state, obs0 = jax.vmap(task.reset)(keys)
        if cfg.curriculum_decay_updates > 0 and hasattr(task, "curriculum"):
            c = jnp.maximum(1.0 - ts.update_i.astype(jnp.float32)
                            / cfg.curriculum_decay_updates, 0.0)
            env_state = jax.vmap(lambda s: task.curriculum(s, c))(env_state)
        env_state, last_obs, traj = rollout(ts, env_state, obs0, k_roll)
        _, _, last_value = jax.vmap(
            lambda o: net.apply(ts.params, o))(norm_obs(ts, last_obs))
        ts, metrics = update(ts, traj, last_value, k_upd)
        return ts, env_state, metrics

    if mesh is not None:
        env_sharded = NamedSharding(mesh, P("env"))
        repl = NamedSharding(mesh, P())
        state_shardings = _env_state_shardings(task, env_sharded)
        return jax.jit(
            train_step,
            in_shardings=(repl, state_shardings),
            out_shardings=(repl, state_shardings, repl),
            donate_argnums=(0, 1),
        )
    # donate (ts, env_state): both are threaded loop-carried — the caller
    # always rebinds them — so XLA may alias params/opt-state/env buffers
    # in place of a copy (halves peak HBM for the big env-state pytree;
    # a no-op on CPU). Donation-correctness is pinned by
    # tests/test_parallel.py::test_train_step_donation.
    return jax.jit(train_step, donate_argnums=(0, 1))


def _shard_mapped_step(task, cfg, mesh: Mesh):
    """task.step_batched wrapped in shard_map over the 'env' mesh axis: each
    device steps its local env shard with the fused kernel; no collectives."""
    from jax import shard_map

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
                     out_specs=out_specs, check_vma=False)


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
