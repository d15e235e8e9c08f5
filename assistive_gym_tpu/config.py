"""Task constants: parity with the reference's config.ini.

Same parameter names and values as assistive_gym/config.ini:1-70, compiled
into frozen dataclasses so they bake into jitted programs (SURVEY.md §5
config system).
"""
from __future__ import annotations

import dataclasses
from typing import Dict


@dataclasses.dataclass(frozen=True)
class HumanPreferences:
    """[human_preferences] (config.ini:52-59), weights C_* (env.py:34-40)."""
    velocity_weight: float = 0.25
    force_nontarget_weight: float = 0.01
    high_forces_weight: float = 0.05
    food_hit_weight: float = 1.0
    food_velocities_weight: float = 1.0
    dressing_force_weight: float = 0.01
    high_pressures_weight: float = 0.01


@dataclasses.dataclass(frozen=True)
class TaskConfig:
    robot_forces: float
    robot_gains: float
    action_weight: float
    task_success_threshold: float
    distance_weight: float = 0.0
    tool_force_weight: float = 0.0
    scratch_reward_weight: float = 0.0
    wiping_reward_weight: float = 0.0
    food_reward_weight: float = 0.0
    cup_tilt_weight: float = 0.0
    drinking_reward_weight: float = 0.0
    dressing_reward_weight: float = 0.0
    distance_human_weight: float = 0.0
    distance_end_effector_weight: float = 0.0


TASK_CONFIGS: Dict[str, TaskConfig] = {
    # config.ini:3-10
    "scratch_itch": TaskConfig(
        robot_forces=1.0, robot_gains=0.05, distance_weight=1.0,
        action_weight=0.01, tool_force_weight=0.01, scratch_reward_weight=2.0,
        task_success_threshold=25.0),
    # config.ini:12-18
    "bed_bathing": TaskConfig(
        robot_forces=1.0, robot_gains=0.05, distance_weight=1.0,
        action_weight=0.01, wiping_reward_weight=5.0,
        task_success_threshold=0.3),
    # config.ini:20-26
    "feeding": TaskConfig(
        robot_forces=1.0, robot_gains=0.0005, distance_weight=1.0,
        action_weight=0.01, food_reward_weight=1.0,
        task_success_threshold=0.75),
    # config.ini:28-35
    "drinking": TaskConfig(
        robot_forces=1.0, robot_gains=0.0005, distance_weight=1.0,
        action_weight=0.01, cup_tilt_weight=0.1, drinking_reward_weight=1.0,
        task_success_threshold=0.75),
    # config.ini:37-42
    "dressing": TaskConfig(
        robot_forces=1.0, robot_gains=0.001, dressing_reward_weight=1.0,
        action_weight=0.01, task_success_threshold=0.4),
    # config.ini:44-50
    "arm_manipulation": TaskConfig(
        robot_forces=5.0, robot_gains=0.05, distance_human_weight=0.5,
        distance_end_effector_weight=0.25, action_weight=0.01,
        task_success_threshold=-0.7),
}

PREFERENCES = HumanPreferences()

# [human_male]/[human_female] (config.ini:61-69)
HUMAN_MASS = {"male": 78.4, "female": 62.5}
