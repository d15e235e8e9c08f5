"""Sharded training, checkpointing, and determinism tests.

Runs on the virtual 8-device CPU mesh (conftest.py) — the standard JAX
pattern for exercising the pjit/shard_map multi-chip path without a pod
(SURVEY.md §4).
"""
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from assistive_gym_tpu.envs import build_task
from assistive_gym_tpu.parallel import checkpoint, ppo


@pytest.fixture(scope="module")
def task():
    return build_task("scratch_itch", "jaco", False)


@pytest.fixture(scope="module")
def tiny_cfg():
    return ppo.PPOConfig(num_envs=8, rollout_len=2, num_minibatches=2,
                         num_epochs=1)


def test_train_step_sharded_8dev(task, tiny_cfg):
    """Full train step jitted over an 8-device mesh: compiles, runs, and the
    env state stays sharded over the 'env' axis."""
    assert len(jax.devices()) == 8, "conftest must fake 8 CPU devices"
    mesh = Mesh(np.array(jax.devices()), axis_names=("env",))
    ts, env_state = ppo.init(task, tiny_cfg, jax.random.PRNGKey(0), mesh)
    train_step = ppo.make_train_step(task, tiny_cfg, mesh)
    ts, env_state, metrics = train_step(ts, env_state)
    jax.block_until_ready(metrics)
    for v in jax.tree.leaves(metrics):
        assert np.all(np.isfinite(np.asarray(v)))
    # env axis sharded over all 8 devices
    assert len(env_state.robot_q.sharding.device_set) == 8


def test_train_step_matches_unsharded(task, tiny_cfg):
    """Mesh vs no-mesh training from identical keys: same metrics (the
    sharding is a layout annotation, not a semantic change)."""
    mesh = Mesh(np.array(jax.devices()), axis_names=("env",))
    ts_m, es_m = ppo.init(task, tiny_cfg, jax.random.PRNGKey(7), mesh)
    ts_s, es_s = ppo.init(task, tiny_cfg, jax.random.PRNGKey(7), None)
    _, _, m_mesh = ppo.make_train_step(task, tiny_cfg, mesh)(ts_m, es_m)
    _, _, m_single = ppo.make_train_step(task, tiny_cfg, None)(ts_s, es_s)
    for a, b in zip(jax.tree.leaves(m_mesh), jax.tree.leaves(m_single)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_checkpoint_roundtrip(task, tiny_cfg):
    ts, env_state = ppo.init(task, tiny_cfg, jax.random.PRNGKey(1), None)
    with tempfile.TemporaryDirectory() as d:
        checkpoint.save(d, 5, ts, env_state)
        assert checkpoint.latest_step(d) == 5
        step, ts2, es2 = checkpoint.restore(d, ts, env_state)
    assert step == 5
    for a, b in zip(jax.tree.leaves(ts), jax.tree.leaves(ts2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(env_state), jax.tree.leaves(es2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_prune_and_latest(task, tiny_cfg):
    ts, env_state = ppo.init(task, tiny_cfg, jax.random.PRNGKey(2), None)
    with tempfile.TemporaryDirectory() as d:
        for s in (1, 2, 3, 4):
            checkpoint.save(d, s, ts, keep=2)
        steps = sorted(int(n.split("_")[1].split(".")[0])
                       for n in os.listdir(d) if n.endswith(".msgpack"))
        assert steps == [3, 4]


def test_warm_start_skip_recurses_into_coop(tiny_cfg):
    """--init-from for coop: the skip set must apply INSIDE robot/human
    sub-states too — otherwise a coop warm start silently resumes the inner
    optimizer state / lr-decay / shaping-anneal counters (ADVICE r3 #1)."""
    from assistive_gym_tpu.parallel import coop
    htask = build_task("scratch_itch", "jaco", True)
    ts_trained, _ = coop.init(htask, tiny_cfg, jax.random.PRNGKey(0), None)
    # simulate a trained checkpoint: bumped counters + perturbed params
    ts_trained = ts_trained.replace(
        robot=ts_trained.robot.replace(
            update_i=jnp.asarray(7, jnp.int32),
            params=jax.tree.map(lambda p: p + 1.0, ts_trained.robot.params)),
        human=ts_trained.human.replace(update_i=jnp.asarray(7, jnp.int32)))
    ts_fresh, _ = coop.init(htask, tiny_cfg, jax.random.PRNGKey(1), None)
    with tempfile.TemporaryDirectory() as d:
        checkpoint.save(d, 7, ts_trained)
        _, ts2 = checkpoint.restore_train_state(
            d, ts_fresh, skip=("opt_state", "update_i", "key"))
    # params warm-started from the checkpoint...
    for a, b in zip(jax.tree.leaves(ts2.robot.params),
                    jax.tree.leaves(ts_trained.robot.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # ...but the nested schedules stay fresh
    assert int(ts2.robot.update_i) == 0
    assert int(ts2.human.update_i) == 0
    np.testing.assert_array_equal(np.asarray(ts2.robot.key),
                                  np.asarray(ts_fresh.robot.key))


def test_restore_fills_missing_env_state_fields(task, tiny_cfg):
    """Old checkpoints predating an env_state aux addition (e.g. feeding's
    tip_pos) must restore with the missing field filled from the template
    instead of failing the resume (ADVICE r3 #2)."""
    from flax import serialization
    ts, env_state = ppo.init(task, tiny_cfg, jax.random.PRNGKey(1), None)
    _, env_tmpl = ppo.init(task, tiny_cfg, jax.random.PRNGKey(11), None)
    with tempfile.TemporaryDirectory() as d:
        checkpoint.save(d, 3, ts, env_state)
        path = os.path.join(d, "ckpt_3.msgpack")
        with open(path, "rb") as f:
            raw = serialization.msgpack_restore(f.read())
        dropped = sorted(raw["env_state"].keys())[0]   # simulate old format
        del raw["env_state"][dropped]
        with open(path, "wb") as f:
            f.write(serialization.msgpack_serialize(raw))
        step, _, es2 = checkpoint.restore(d, ts, env_tmpl)
    assert step == 3
    # the dropped field came from the TEMPLATE (different reset key)...
    for a, b in zip(jax.tree.leaves(getattr(es2, dropped)),
                    jax.tree.leaves(getattr(env_tmpl, dropped))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # ...every other field from the checkpoint
    for name in sorted(raw["env_state"].keys()):
        for a, b in zip(jax.tree.leaves(getattr(es2, name)),
                        jax.tree.leaves(getattr(env_state, name))):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_rollout_determinism(task):
    """Same PRNG key ⇒ bit-identical rollout (SURVEY.md §7 hard part 5)."""
    keys = jax.random.split(jax.random.PRNGKey(3), 4)
    reset = jax.jit(jax.vmap(task.reset))
    step = jax.jit(jax.vmap(task.step))
    acts = jax.random.uniform(jax.random.PRNGKey(9),
                              (4, task.spec.action_len), jnp.float32, -1, 1)

    def run():
        state, obs = reset(keys)
        for _ in range(3):
            state, obs, rew, done, info = step(state, acts)
        return np.asarray(obs), np.asarray(rew)

    o1, r1 = run()
    o2, r2 = run()
    np.testing.assert_array_equal(o1, o2)
    np.testing.assert_array_equal(r1, r2)


def test_coop_train_step(tiny_cfg):
    """Dual-policy co-optimization on a *Human-v0 env (SURVEY.md §7.12)."""
    from assistive_gym_tpu.parallel import coop
    htask = build_task("scratch_itch", "jaco", True)
    ts, env_state = coop.init(htask, tiny_cfg, jax.random.PRNGKey(0), None)
    train_step = coop.make_train_step(htask, tiny_cfg, None)
    # serializing THIS executable into the persistent compilation cache
    # segfaults XLA-CPU deterministically (upstream bug, reproduced three
    # times at put_executable_and_time; the jax_enable_compilation_cache
    # flag does not gate the write path in this jax version) — bypass the
    # cache write itself for this one compile
    # private symbol — guard so a jax upgrade degrades to running unpatched
    # (conftest leaves the persistent cache off by default, so the write
    # path is normally never hit anyway); validated on jax 0.9.x
    from jax._src import compilation_cache as _cc
    _patched = hasattr(_cc, "put_executable_and_time")
    if _patched:
        _orig_put = _cc.put_executable_and_time
        _cc.put_executable_and_time = lambda *a, **k: None
    try:
        ts, env_state, metrics = train_step(ts, env_state)
        jax.block_until_ready(metrics)
    finally:
        if _patched:
            _cc.put_executable_and_time = _orig_put
    for v in jax.tree.leaves(metrics):
        assert np.all(np.isfinite(np.asarray(v)))
    assert int(ts.robot.update_i) == 1 and int(ts.human.update_i) == 1


def test_vmap_matches_single_env(task):
    """Batched step == single-env step on the same state (bit-level)."""
    keys = jax.random.split(jax.random.PRNGKey(4), 3)
    state, obs = jax.jit(jax.vmap(task.reset))(keys)
    acts = jax.random.uniform(jax.random.PRNGKey(5),
                              (3, task.spec.action_len), jnp.float32, -1, 1)
    _, obs_b, rew_b, _, _ = jax.jit(jax.vmap(task.step))(state, acts)

    one = jax.tree.map(lambda x: x[1], state)
    _, obs_1, rew_1, _, _ = jax.jit(task.step)(one, acts[1])
    # determinism contract (PARITY.md §5): same key + same program/batch
    # width => bit-identical (test_rollout_determinism); across DIFFERENT
    # programs (vmapped vs single-env) XLA reassociates reductions per
    # layout, so agreement is at float-reassociation level (~1 ulp)
    np.testing.assert_allclose(np.asarray(obs_b[1]), np.asarray(obs_1),
                               rtol=3e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rew_b[1]), np.asarray(rew_1),
                               rtol=1e-5, atol=1e-6)


def test_shaping_potential_train_step():
    """Potential-based shaping: train step runs with the feeding task's
    tip-to-mouth potential, mean_return reports the TRUE (unshaped) return,
    and the annealing schedule hits exactly 0 after shaping_decay_updates."""
    task_f = build_task("feeding", "jaco", False)
    cfg = ppo.PPOConfig(num_envs=4, rollout_len=2, num_minibatches=2,
                        num_epochs=1, shaping_coef=5.0,
                        shaping_decay_updates=10)
    ts, env_state = ppo.init(task_f, cfg, jax.random.PRNGKey(0))
    train_step = ppo.make_train_step(task_f, cfg)
    ts, env_state, metrics = train_step(ts, env_state)
    assert np.isfinite(float(metrics["mean_return"]))

    # Phi is -||tip - mouth||: nonpositive, finite, batched by vmap
    phi = jax.vmap(task_f.shaping_potential)(env_state)
    assert phi.shape == (cfg.num_envs,)
    assert np.all(np.asarray(phi) <= 0.0) and np.all(np.isfinite(phi))


def test_drinking_shaping_potential():
    """Drinking's water-to-mouth potential: nonpositive, finite, batched,
    and insensitive to dead particles (a particle removed from the alive
    mask must not change Phi through the masked mean)."""
    task_d = build_task("drinking", "jaco", False)
    env_state, _ = jax.vmap(task_d.reset)(
        jax.random.split(jax.random.PRNGKey(0), 2))
    phi = jax.vmap(task_d.shaping_potential)(env_state)
    assert phi.shape == (2,)
    assert np.all(np.asarray(phi) <= 0.0) and np.all(np.isfinite(phi))

    # kill one particle far from the mouth -> Phi must strictly improve
    aux = dict(env_state.aux)
    mouth = aux["target_pos"]                              # [2,3]
    d = np.linalg.norm(np.asarray(aux["water_pos"] - mouth[:, None]), axis=-1)
    far = int(np.argmax(d[0]))
    alive = np.asarray(aux["water_alive"]).copy()
    alive[0, far] = False
    aux["water_alive"] = jnp.asarray(alive)
    phi2 = jax.vmap(task_d.shaping_potential)(env_state.replace(aux=aux))
    assert float(phi2[0]) > float(phi[0])
    np.testing.assert_allclose(float(phi2[1]), float(phi[1]), rtol=1e-6)


def test_bed_shaping_potential():
    """Bed bathing's tool-to-nearest-unwiped-target potential: nonpositive,
    finite, batched, consistent with the aux cache across a step, and
    strictly improved by zeroing the cached distance (wiped-out bound)."""
    task_b = build_task("bed_bathing", "jaco", False)
    env_state, _ = jax.vmap(task_b.reset)(
        jax.random.split(jax.random.PRNGKey(0), 2))
    phi = jax.vmap(task_b.shaping_potential)(env_state)
    assert phi.shape == (2,)
    assert np.all(np.asarray(phi) <= 0.0) and np.all(np.isfinite(phi))
    # reset places the tool near-but-off the arm: distance in (0, 2) m
    d0 = -np.asarray(phi)
    assert np.all(d0 > 0.0) and np.all(d0 < 2.0)

    # a step refreshes the cache through _finish; still valid
    env_state2, _, _, _, _ = task_b.step_batched(
        env_state, jnp.zeros((2, task_b.spec.action_len), jnp.float32))
    phi2 = jax.vmap(task_b.shaping_potential)(env_state2)
    assert np.all(np.asarray(phi2) <= 0.0) and np.all(np.isfinite(phi2))

    # all targets wiped -> the cached distance is defined as 0 (bounded Phi)
    aux = dict(env_state2.aux)
    aux["min_target_dist"] = jnp.zeros_like(aux["min_target_dist"])
    phi3 = jax.vmap(task_b.shaping_potential)(env_state2.replace(aux=aux))
    np.testing.assert_allclose(np.asarray(phi3), 0.0)


def test_curriculum_hook_applies_and_anneals():
    """PPOConfig.curriculum_decay_updates drives task.curriculum(state, c)
    between reset and rollout: at update 0 the widened shell must be live
    inside the rollout, and past the decay horizon the task must run at
    reference parity (c=0)."""
    task_d = build_task("drinking", "jaco", False)
    cfg = ppo.PPOConfig(num_envs=4, rollout_len=2, num_minibatches=2,
                        num_epochs=1, curriculum_decay_updates=10)
    ts, es = ppo.init(task_d, cfg, jax.random.PRNGKey(0), None)
    step = ppo.make_train_step(task_d, cfg, None)
    ts, es, _ = step(ts, es)
    np.testing.assert_allclose(np.asarray(es.aux["mouth_r"]), 0.10, atol=1e-6)
    ts = ts.replace(update_i=jnp.asarray(50, jnp.int32))   # past the horizon
    ts, es, _ = step(ts, es)
    np.testing.assert_allclose(np.asarray(es.aux["mouth_r"]), 0.03, atol=1e-6)


def test_train_step_donation(task, tiny_cfg):
    """Donation correctness (SURVEY §5): (ts, env_state) are donated to the
    jitted train step.  Chained rebinding must thread cleanly; where the
    backend honors donation, the stale carries must be invalidated so any
    accidental reuse fails loudly instead of silently reading aliased
    memory."""
    ts, es = ppo.init(task, tiny_cfg, jax.random.PRNGKey(11), None)
    step = ppo.make_train_step(task, tiny_cfg, None)
    ts2, es2, m1 = step(ts, es)
    ts3, es3, m2 = step(ts2, es2)      # second step reuses donated buffers
    for v in jax.tree.leaves(m2):
        assert np.all(np.isfinite(np.asarray(v)))
    stale = jax.tree.leaves(ts)[0]
    if stale.is_deleted():             # backend honored the donation
        with pytest.raises(Exception):
            np.asarray(jax.tree.leaves(ts2)[0])  # ts2 was donated to step 2


def test_dryrun_multichip_catches_sharding_divergence(monkeypatch):
    """__graft_entry__.dryrun_multichip asserts sharded-vs-unsharded metric
    agreement (VERDICT r4 weak #5).  Prove the assertion actually fires:
    seed a divergence bug (the mesh path initialised from a different PRNG
    key — the observable signature of per-shard RNG desync) and the dryrun
    must raise instead of printing ok."""
    import __graft_entry__ as graft

    real_init = ppo.init

    def desynced_init(task, cfg, key, mesh=None):
        if mesh is not None:
            key = jax.random.fold_in(key, 1)   # the seeded bug
        return real_init(task, cfg, key, mesh)

    monkeypatch.setattr(ppo, "init", desynced_init)
    with pytest.raises(AssertionError, match="sharded-vs-unsharded"):
        graft.dryrun_multichip(8)


def test_log_std_cap_clamps_sampling_std():
    """--log-std-max lever (ROUND5_NOTES.md): a tighter upper clamp on the
    state-independent log_std must bound the sampling std without touching
    the parameter pytree (checkpoints stay warm-start compatible)."""
    key = jax.random.PRNGKey(0)
    obs = jnp.zeros((17,), jnp.float32)
    net0 = ppo.ActorCritic(7, 64)                    # historical default
    netc = ppo.ActorCritic(7, 64, log_std_max=-0.7)  # capped
    params = net0.init(key, obs)
    # same param pytree works under both modules (cap is a module field)
    _, ls0, _ = net0.apply(params, obs)
    _, lsc, _ = netc.apply(params, obs)
    # init constant is -0.5: uncapped passes through, cap pulls it to -0.7
    assert np.allclose(np.asarray(ls0), -0.5)
    assert np.allclose(np.asarray(lsc), -0.7)
    # force the parameter above both limits and re-check the clamp
    hot = jax.tree.map(lambda x: x, params)
    hot["params"]["log_std"] = jnp.full((7,), 2.0)
    _, ls0, _ = net0.apply(hot, obs)
    _, lsc, _ = netc.apply(hot, obs)
    assert np.allclose(np.asarray(ls0), 0.0)
    assert np.allclose(np.asarray(lsc), -0.7)
