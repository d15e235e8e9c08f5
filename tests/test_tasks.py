"""Per-task smoke + semantics tests (jaco variants keep compile time sane)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from assistive_gym_tpu.envs import build_task

# (task, robot, human_control, obs, act)  — dims from the reference task
# __init__ signatures (scratch_itch.py:10, bed_bathing.py:10, feeding.py:10,
# drinking.py:10, dressing.py:10, arm_manipulation.py:10)
CASES = [
    ("scratch_itch", "jaco", True, 64, 17),
    ("bed_bathing", "jaco", False, 24, 7),
    ("feeding", "jaco", False, 25, 7),
    ("feeding", "jaco", True, 48, 11),
    ("drinking", "jaco", False, 25, 7),
    ("dressing", "jaco", False, 24, 7),
    ("arm_manipulation", "jaco", False, 45, 14),
]


@pytest.mark.parametrize("task_name,robot,hc,n_obs,n_act", CASES)
def test_task_shapes_and_determinism(task_name, robot, hc, n_obs, n_act):
    task = build_task(task_name, robot, hc)
    assert task.spec.obs_len == n_obs
    assert task.spec.action_len == n_act
    reset = jax.jit(task.reset)
    step = jax.jit(task.step)
    outs = []
    for _ in range(2):
        state, obs = reset(jax.random.PRNGKey(3))
        assert obs.shape == (n_obs,)
        a = jnp.full(n_act, 0.2)
        for _ in range(2):
            state, obs, rew, done, info = step(state, a)
        assert np.isfinite(np.asarray(obs)).all()
        assert np.isfinite(float(rew))
        outs.append((np.asarray(obs), float(rew)))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    assert outs[0][1] == outs[1][1]
    for k in ("total_force_on_human", "task_success"):
        assert k in info


def test_feeding_food_stays_in_scoop():
    task = build_task("feeding", "jaco", False)
    state, _ = jax.jit(task.reset)(jax.random.PRNGKey(0))
    step = jax.jit(task.step)
    s = state
    for _ in range(10):
        s, *_ = step(s, jnp.zeros(7))
    assert int(np.asarray(s.aux["food_alive"]).sum()) == 8


def test_drinking_water_contained():
    task = build_task("drinking", "jaco", False)
    state, _ = jax.jit(task.reset)(jax.random.PRNGKey(0))
    step = jax.jit(task.step)
    s = state
    for _ in range(5):
        s, *_ = step(s, jnp.zeros(7))
    assert int(np.asarray(s.aux["water_alive"]).sum()) == 64


def test_drinking_mouth_window_scores():
    """The in_mouth scoring path (drinking.py:70-74 parity: escaped water
    within 3 cm of the mouth at the 10 Hz check) must actually fire.
    Bypasses arm control: free particles released just above the mouth
    target must register task_success within a few control steps.  Guards
    the escape->in_mouth->task_success pipeline end to end (round-5
    drinking diagnosis, docs/training/drinking_diagnosis_r5.md)."""
    task = build_task("drinking", "jaco", False)
    state, _ = jax.jit(task.reset)(jax.random.PRNGKey(0))
    mouth = np.asarray(state.aux["target_pos"])
    n = np.asarray(state.aux["water_pos"]).shape[0]
    rng = np.random.default_rng(0)
    pos = mouth[None] + np.array([0.0, 0.0, 0.02]) \
        + rng.uniform(-0.004, 0.004, size=(n, 3))
    state = state.replace(aux=dict(
        state.aux,
        water_pos=jnp.asarray(pos, jnp.float32),
        water_vel=jnp.zeros((n, 3), jnp.float32)))
    step = jax.jit(task.step)
    s = state
    for _ in range(3):
        s, *_ = step(s, jnp.zeros(7))
    scored = float(np.asarray(s.task_success))
    # Measured capture physics (drinking_diagnosis_r5.md): a free-falling
    # particle spends ~30 ms inside the 3 cm window but the reward check
    # runs at 10 Hz, so even a perfect release over the mouth captures
    # ~12% per batch (8/64 measured).  The assertion guards that the
    # pipeline FIRES — a regression to 0 means escape/in_mouth/task_success
    # wiring broke — not that a free drop solves the task.
    assert scored >= 4.0, \
        f"only {scored}/{n} particles scored in_mouth from 2 cm above the mouth"


def test_drinking_curriculum_widens_capture():
    """curriculum(state, c) widens the in_mouth shell for training only:
    c=0 must be an exact no-op (mouth_r stays at the 0.03 reference-parity
    value, reward trace bitwise-identical to a plain reset), c=1 must give
    the 10 cm shell and capture strictly more of the same free release
    (docs/training/drinking_diagnosis_r5.md levers (b))."""
    task = build_task("drinking", "jaco", False)
    state, _ = jax.jit(task.reset)(jax.random.PRNGKey(0))
    assert abs(float(state.aux["mouth_r"]) - 0.03) < 1e-7

    s_par = task.curriculum(state, jnp.asarray(0.0))
    assert abs(float(s_par.aux["mouth_r"]) - 0.03) < 1e-7
    s_wide = task.curriculum(state, jnp.asarray(1.0))
    assert abs(float(s_wide.aux["mouth_r"]) - 0.10) < 1e-7

    # identical free release above the mouth through both shells
    mouth = np.asarray(state.aux["target_pos"])
    n = np.asarray(state.aux["water_pos"]).shape[0]
    rng = np.random.default_rng(0)
    pos = mouth[None] + np.array([0.0, 0.0, 0.02]) \
        + rng.uniform(-0.004, 0.004, size=(n, 3))
    step = jax.jit(task.step)

    def run(s0):
        s = s0.replace(aux=dict(
            s0.aux,
            water_pos=jnp.asarray(pos, jnp.float32),
            water_vel=jnp.zeros((n, 3), jnp.float32)))
        rews = []
        for _ in range(3):
            s, _, r, *_ = step(s, jnp.zeros(7))
        return float(np.asarray(s.task_success))

    scored_par, scored_c0 = run(state), run(s_par)
    scored_wide = run(s_wide)
    assert scored_c0 == scored_par          # c=0 is parity, bit for bit
    assert scored_wide > scored_par, \
        f"10 cm shell captured {scored_wide} <= parity {scored_par}"


def test_drinking_shaping_tilt_gate():
    """shaping_potential pays for tilt only near the mouth: moving the
    cached cup pose inside the 10 cm gate with a large tilt error must
    raise phi; the same tilt far from the mouth must not."""
    task = build_task("drinking", "jaco", False)
    state, _ = jax.jit(task.reset)(jax.random.PRNGKey(0))
    mouth = state.aux["target_pos"]

    def phi(cup_top, tilt):
        s = state.replace(aux=dict(
            state.aux, cup_top=cup_top, tilt_err=jnp.asarray(tilt, jnp.float32)))
        return float(task.shaping_potential(s))

    near = mouth + jnp.asarray([0.0, 0.0, 0.02], jnp.float32)
    far = mouth + jnp.asarray([0.0, 0.0, 0.50], jnp.float32)
    assert phi(near, 2.0) - phi(near, 0.0) > 0.3      # gated tilt pays
    assert abs(phi(far, 2.0) - phi(far, 0.0)) < 0.01  # far tilt doesn't


def test_feeding_curriculum_widens_delivery():
    """Feeding curriculum: c=0 keeps the 2 cm reference-parity shell
    (feeding.py:58), c=1 widens to 6 cm so a 4 cm near-miss delivers during
    early training only (docs/training/feeding_diagnosis_r3.md bimodality)."""
    task = build_task("feeding", "jaco", False)
    state, _ = jax.jit(task.reset)(jax.random.PRNGKey(0))
    assert abs(float(state.aux["mouth_r"]) - 0.02) < 1e-7
    assert abs(float(task.curriculum(state, jnp.asarray(0.0)).aux["mouth_r"])
               - 0.02) < 1e-7
    s_wide = task.curriculum(state, jnp.asarray(1.0))
    assert abs(float(s_wide.aux["mouth_r"]) - 0.06) < 1e-7

    # one food particle released beside the mouth: after the control step's
    # ~5 cm free fall it sits ~5 cm away — outside the 2 cm parity shell,
    # inside the 6 cm curriculum shell
    mouth = np.asarray(state.aux["target_pos"])
    n = np.asarray(state.aux["food_pos"]).shape[0]
    pos = np.tile(mouth + np.array([0.0, 0.0, 0.5]), (n, 1))
    pos[0] = mouth + np.array([0.05, 0.0, 0.05])
    step = jax.jit(task.step)

    def delivered(s0):
        s = s0.replace(aux=dict(
            s0.aux,
            food_pos=jnp.asarray(pos, jnp.float32),
            food_vel=jnp.zeros((n, 3), jnp.float32)))
        s, *_ = step(s, jnp.zeros(7))
        return float(np.asarray(s.task_success))

    assert delivered(state) == 0.0          # parity: 4 cm is a miss
    assert delivered(s_wide) >= 1.0         # curriculum: 4 cm delivers


def test_bed_bathing_human_on_bed():
    from assistive_gym_tpu.envs import base
    task = build_task("bed_bathing", "jaco", False)
    state, _ = jax.jit(task.reset)(jax.random.PRNGKey(1))
    fk_h, _ = base.scene_fk(task.spec, state)
    z = np.asarray(fk_h.pos[:, 2])
    assert z.min() > 0.70 and z.max() < 1.0   # lying on the mattress


def test_human_testing_sweep():
    task = build_task("human_testing", "none", False)
    state, obs = jax.jit(task.reset)(jax.random.PRNGKey(0))
    step = jax.jit(task.step)
    q0 = np.asarray(state.human_q).copy()
    for _ in range(5):
        state, obs, *_ = step(state, jnp.zeros(1))
    q1 = np.asarray(state.human_q)
    assert not np.allclose(q0[4:7], q1[4:7])   # joints swept
    lo, hi = np.asarray(state.lower), np.asarray(state.upper)
    assert (q1 >= lo - 1e-6).all() and (q1 <= hi + 1e-6).all()


def test_arm_limits_classifier():
    from assistive_gym_tpu.ops import arm_limits
    # neutral hanging arm is a valid pose
    feats = arm_limits.right_arm_features(
        jnp.asarray(0.3), jnp.asarray(-0.2), jnp.asarray(0.0), jnp.asarray(-0.5))
    assert bool(arm_limits.is_valid(feats))


def test_link_reach_bound_dominates_fk():
    """The static pair-prune bound (base.link_reach_bound) must upper-bound
    the true FK distance from the base for EVERY link over random joint
    configurations — otherwise the prune could drop reachable furniture
    pairs and silently lose contacts."""
    from assistive_gym_tpu.envs import base
    from assistive_gym_tpu.physics import kinematics as kin

    task = build_task("feeding", "jaco", False)
    robot = task.spec.robot
    lo, hi = (np.asarray(a) for a in robot.dof_limits())
    # unlimited (continuous) dofs: sample a full turn
    unlimited = hi < lo
    lo = np.where(unlimited, -np.pi, lo)
    hi = np.where(unlimited, np.pi, hi)
    bounds = np.asarray([base.link_reach_bound(robot, l)
                         for l in range(robot.nlinks)])
    base_pos = jnp.zeros(3)
    base_quat = jnp.asarray([0.0, 0.0, 0.0, 1.0])
    rng = np.random.RandomState(0)
    qs = rng.uniform(lo, hi, size=(64, robot.ndof)).astype(np.float32)
    fk_pos = jax.vmap(lambda q: kin.fk(robot, q, base_pos, base_quat).pos)(
        jnp.asarray(qs))
    d = np.linalg.norm(np.asarray(fk_pos), axis=-1)      # [64, L]
    assert (d <= bounds[None] + 1e-5).all(), \
        (d.max(0) - bounds).max()
