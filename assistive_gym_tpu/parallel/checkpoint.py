"""Checkpoint / resume for the PPO loop.

The reference has no checkpointing (SURVEY.md §5: policies were trained and
saved by an external PPO repo; trained_models/ppo/__init__.py is an empty
placeholder).  Here checkpointing is first-class: the full training state —
policy/optimizer params, PRNG key, update counter, and optionally the entire
sharded EnvState pytree — serializes losslessly, so mid-rollout resume is
exact (same key ⇒ bit-identical continuation).

Format: flax.serialization msgpack for the pytree payload + a small JSON
sidecar with step metadata.  No orbax dependency so checkpoints stay
readable in any environment with flax installed; files are written
atomically (tmp + rename) so a killed host never leaves a torn checkpoint
(the failure-recovery story: restart from the newest valid checkpoint,
SURVEY.md §5 "failure detection").
"""
from __future__ import annotations

import dataclasses
import json
import os
import re
import tempfile
from typing import Any, Optional, Tuple

import jax
import numpy as np
from flax import serialization

_CKPT_RE = re.compile(r"^ckpt_(\d+)\.msgpack$")


def _host_gather(tree):
    """Fetch a (possibly sharded) pytree to host numpy arrays."""
    return jax.tree.map(lambda x: np.asarray(jax.device_get(x)), tree)


def save(ckpt_dir: str, step: int, train_state, env_state=None,
         extra: Optional[dict] = None, keep: int = 3) -> str:
    """Write ckpt_{step}.msgpack atomically; prune to the newest `keep`."""
    os.makedirs(ckpt_dir, exist_ok=True)
    payload = {"train_state": _host_gather(train_state)}
    if env_state is not None:
        payload["env_state"] = _host_gather(env_state)
    blob = serialization.to_bytes(payload)

    path = os.path.join(ckpt_dir, f"ckpt_{step}.msgpack")
    fd, tmp = tempfile.mkstemp(dir=ckpt_dir, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)

    meta = {"step": step, "has_env_state": env_state is not None}
    meta.update(extra or {})
    mfd, mtmp = tempfile.mkstemp(dir=ckpt_dir, suffix=".tmp")
    with os.fdopen(mfd, "w") as f:
        json.dump(meta, f)
    os.replace(mtmp, os.path.join(ckpt_dir, f"ckpt_{step}.json"))

    _prune(ckpt_dir, keep)
    return path


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [int(m.group(1)) for n in os.listdir(ckpt_dir)
             if (m := _CKPT_RE.match(n))]
    return max(steps) if steps else None


def _overlay(tmpl_sd, stored):
    """Recursive dict overlay: stored values win where the template has the
    key; template values fill keys the (older) checkpoint lacks; stored keys
    with no template slot are dropped."""
    if isinstance(tmpl_sd, dict) and isinstance(stored, dict):
        return {k: (_overlay(v, stored[k]) if k in stored else v)
                for k, v in tmpl_sd.items()}
    return stored


def restore(ckpt_dir: str, train_state_template, env_state_template=None,
            step: Optional[int] = None) -> Tuple[int, Any, Any]:
    """Restore (step, train_state, env_state) onto the templates' structure.

    Templates supply pytree structure and shardings: restored leaves are
    device_put with each template leaf's sharding, so a resumed run lands
    back on the same mesh layout.
    """
    if step is None:
        step = latest_step(ckpt_dir)
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {ckpt_dir!r}")
    with open(os.path.join(ckpt_dir, f"ckpt_{step}.msgpack"), "rb") as f:
        blob = f.read()
    # the sidecar records whether env_state was saved: only include it in
    # the deserialization template when present, so restoring a
    # params-only checkpoint with an env_state template returns es=None
    # instead of an opaque flax structure error (ADVICE.md round-1 #3)
    has_env_state = env_state_template is not None
    meta_path = os.path.join(ckpt_dir, f"ckpt_{step}.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            has_env_state = has_env_state and json.load(f).get(
                "has_env_state", True)
    raw = serialization.msgpack_restore(blob)
    payload = {"train_state": serialization.from_state_dict(
        _host_gather(train_state_template), raw["train_state"])}
    if has_env_state and "env_state" in raw:
        # lenient on env_state: new env versions may ADD aux fields (e.g.
        # feeding's tip_pos) — fill anything missing from the template
        # instead of failing the whole resume on a pre-change checkpoint
        # (ADVICE.md round-3 #2); extra stored keys are dropped likewise
        env_tmpl = _host_gather(env_state_template)
        merged = _overlay(serialization.to_state_dict(env_tmpl),
                          raw["env_state"])
        payload["env_state"] = serialization.from_state_dict(env_tmpl, merged)

    def _place(host_leaf, tmpl_leaf):
        sh = getattr(tmpl_leaf, "sharding", None)
        return jax.device_put(host_leaf, sh) if sh is not None else jax.device_put(host_leaf)

    ts = jax.tree.map(_place, payload["train_state"], train_state_template)
    es = None
    if has_env_state and "env_state" in payload:
        es = jax.tree.map(_place, payload["env_state"], env_state_template)
    return step, ts, es


def _restore_fields(tmpl, stored: dict, skip) -> Any:
    """Apply a stored state-dict onto a train-state dataclass field-by-field,
    dropping `skip` fields AT EVERY NESTING LEVEL: CoopTrainState nests full
    TrainStates under .robot/.human, so a top-level-only skip would silently
    restore the inner optimizer state and update counters (resuming the
    lr-decay / shaping-anneal schedules mid-way) on a coop warm start
    (ADVICE.md round-3 #1)."""
    for name, sub in stored.items():
        if name in skip or not hasattr(tmpl, name):
            continue
        tmpl_leaf = getattr(tmpl, name)
        if dataclasses.is_dataclass(tmpl_leaf) and isinstance(sub, dict):
            tmpl = tmpl.replace(**{name: _restore_fields(tmpl_leaf, sub, skip)})
        else:
            restored = serialization.from_state_dict(tmpl_leaf, sub)
            tmpl = tmpl.replace(
                **{name: jax.tree.map(jax.device_put, restored)})
    return tmpl


def restore_train_state(ckpt_dir: str, train_state_template,
                        step: Optional[int] = None,
                        skip=("opt_state",)) -> Tuple[int, Any]:
    """Restore the train state field-by-field (recursively — nested coop
    sub-states honor the same skip set), ignoring env_state and any fields
    in `skip` — the policy-evaluation path (tools/eval_policy.py): eval
    needs params + normalization stats but not the optimizer state, whose
    structure depends on the training lr schedule."""
    if step is None:
        step = latest_step(ckpt_dir)
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {ckpt_dir!r}")
    with open(os.path.join(ckpt_dir, f"ckpt_{step}.msgpack"), "rb") as f:
        raw = serialization.msgpack_restore(f.read())["train_state"]
    return step, _restore_fields(train_state_template, raw, skip)


def _prune(ckpt_dir: str, keep: int) -> None:
    steps = sorted(int(m.group(1)) for n in os.listdir(ckpt_dir)
                   if (m := _CKPT_RE.match(n)))
    for s in steps[:-keep] if keep > 0 else []:
        for suffix in (".msgpack", ".json"):
            p = os.path.join(ckpt_dir, f"ckpt_{s}{suffix}")
            if os.path.exists(p):
                os.unlink(p)
