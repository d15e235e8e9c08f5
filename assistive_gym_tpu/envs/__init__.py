"""Task builders: dispatch (task, robot, human_control) -> functional task."""
from __future__ import annotations

import functools


@functools.lru_cache(maxsize=None)
def build_task(task: str, robot: str, human_control: bool):
    if task == "scratch_itch":
        from . import scratch_itch
        return scratch_itch.build(robot, human_control)
    if task == "bed_bathing":
        from . import bed_bathing
        return bed_bathing.build(robot, human_control)
    if task == "feeding":
        from . import feeding
        return feeding.build(robot, human_control)
    if task == "drinking":
        from . import drinking
        return drinking.build(robot, human_control)
    if task == "dressing":
        from . import dressing
        return dressing.build(robot, human_control)
    if task == "arm_manipulation":
        from . import arm_manipulation
        return arm_manipulation.build(robot, human_control)
    if task == "human_testing":
        from . import human_testing
        return human_testing.build()
    raise KeyError(task)
