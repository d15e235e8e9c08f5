"""Environment registry: id grammar parity with the reference.

Reference registers 49 envs (assistive_gym/__init__.py:4-344):
{Task}{Robot}[Human]-v0 for Task in {ScratchItch, BedBathing, Feeding,
Drinking, Dressing, ArmManipulation} x Robot in {PR2, Baxter, Sawyer, Jaco}
(+ ArmManipulationKinovaGen3[Human]) plus HumanTesting-v0; all with
max_episode_steps=200.
"""
from __future__ import annotations

from typing import Dict, Tuple

TASKS = {
    "ScratchItch": "scratch_itch",
    "BedBathing": "bed_bathing",
    "Feeding": "feeding",
    "Drinking": "drinking",
    "Dressing": "dressing",
    "ArmManipulation": "arm_manipulation",
}
ROBOTS = {
    "PR2": "pr2",
    "Baxter": "baxter",
    "Sawyer": "sawyer",
    "Jaco": "jaco",
}
MAX_EPISODE_STEPS = 200


def _build_ids() -> Dict[str, Tuple[str, str, bool]]:
    ids: Dict[str, Tuple[str, str, bool]] = {}
    for tname, task in TASKS.items():
        robots = dict(ROBOTS)
        if task == "arm_manipulation":
            robots["KinovaGen3"] = "kinova_gen3"
        for rname, robot in robots.items():
            ids[f"{tname}{rname}-v0"] = (task, robot, False)
            ids[f"{tname}{rname}Human-v0"] = (task, robot, True)
    ids["HumanTesting-v0"] = ("human_testing", "none", False)
    return ids


ENV_IDS = _build_ids()


def load(env_id: str):
    """Return the batched, functional task object for an env id."""
    if env_id not in ENV_IDS:
        raise KeyError(f"Unknown env id {env_id!r}; known: {sorted(ENV_IDS)}")
    task, robot, human_control = ENV_IDS[env_id]
    from .envs import build_task

    return build_task(task, robot, human_control)


def make(env_id: str, seed: int = 1001):
    """Gym-style single-env adapter over the batched functional core."""
    from .envs.gym_api import GymEnv

    return GymEnv(load(env_id), seed=seed, max_episode_steps=MAX_EPISODE_STEPS)
