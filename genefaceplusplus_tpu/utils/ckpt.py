"""Checkpoint store: step-stamped, atomic, self-describing directories.

Behavioural contract mirrored from /root/reference:
  * utils/commons/ckpt_utils.py:7-26  — get_last_checkpoint globs
    model_ckpt_steps_{N}.ckpt and picks max N
  * ckpt_utils.py:29-76 — load handles dir-or-file, sub-model extraction,
    and lenient shape-mismatch pruning
  * utils/commons/trainer.py:511-567 — atomic write (.part + os.replace),
    keep newest `num_ckpt_keep` plus every `ckpt_milestone_interval`
    milestone; the checkpoint dir carries its config.yaml
    (hparams.py:110-127) so inference can self-configure.

Serialisation: flax msgpack of numpy-ified pytrees (portable, no pickle).
"""

from __future__ import annotations

import glob
import os
import re
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

from genefaceplusplus_tpu.config import save_config


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def checkpoint_path(work_dir: str, step: int) -> str:
    return os.path.join(work_dir, f"model_ckpt_steps_{step}.ckpt")


def get_all_ckpts(work_dir: str) -> list:
    paths = glob.glob(os.path.join(work_dir, "model_ckpt_steps_*.ckpt"))
    return sorted(paths, key=lambda p: -int(re.findall(r"steps_(\d+)\.ckpt", p)[0]))


def get_last_checkpoint(work_dir: str, steps: Optional[int] = None):
    """Return (ckpt_dict, path) of the newest (or step-specified) checkpoint."""
    if steps is not None:
        path = checkpoint_path(work_dir, steps)
        paths = [path] if os.path.exists(path) else []
    else:
        paths = get_all_ckpts(work_dir)
    if not paths:
        return None, None
    return load_ckpt_file(paths[0]), paths[0]


def load_ckpt_file(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def save_checkpoint(
    work_dir: str,
    step: int,
    state: Dict[str, Any],
    config=None,
    num_ckpt_keep: int = 1,
    milestone_interval: int = 100_000,
) -> str:
    """Atomically write a step-stamped checkpoint + retention policy."""
    os.makedirs(work_dir, exist_ok=True)
    if config is not None:
        save_config(config, work_dir)
    payload = dict(state)
    payload["global_step"] = step
    blob = serialization.msgpack_serialize(_to_numpy(payload))
    path = checkpoint_path(work_dir, step)
    tmp = path + ".part"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)

    # retention: newest num_ckpt_keep + milestones
    for old in get_all_ckpts(work_dir)[num_ckpt_keep:]:
        old_step = int(re.findall(r"steps_(\d+)\.ckpt", old)[0])
        if milestone_interval and old_step % milestone_interval == 0:
            continue
        os.remove(old)
    return path


_MISSING = object()


def restore_into(template_tree, loaded_tree, strict: bool = False, _path: str = ""):
    """Copy loaded leaves into the template where names+shapes match;
    lenient pruning on mismatch (ckpt_utils.py:56-72). Preserves the full
    template structure (incl. empty subtrees like optax MaskedNode)."""
    if isinstance(template_tree, dict):
        loaded = loaded_tree if isinstance(loaded_tree, dict) else {}
        return {
            k: restore_into(v, loaded.get(k, _MISSING), strict, f"{_path}{k}/")
            for k, v in template_tree.items()
        }
    if isinstance(template_tree, (list, tuple)):
        loaded = loaded_tree if isinstance(loaded_tree, (list, tuple, dict)) else []
        if isinstance(loaded, dict):  # msgpack may store lists as index dicts
            loaded = [loaded.get(str(i), _MISSING) for i in range(len(template_tree))]
        out = [
            restore_into(v, loaded[i] if i < len(loaded) else _MISSING, strict, f"{_path}{i}/")
            for i, v in enumerate(template_tree)
        ]
        return type(template_tree)(out)
    # leaf
    if loaded_tree is _MISSING or isinstance(loaded_tree, dict) or loaded_tree is None:
        return template_tree
    if tuple(np.shape(loaded_tree)) == tuple(np.shape(template_tree)):
        return np.asarray(loaded_tree).astype(np.asarray(template_tree).dtype)
    if strict:
        raise ValueError(
            f"shape mismatch at {_path}: {np.shape(loaded_tree)} vs {np.shape(template_tree)}"
        )
    return template_tree


def _flatten(tree, prefix="") -> Dict[str, Any]:
    if isinstance(tree, dict):
        out = {}
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
        return out
    return {prefix[:-1]: tree}


def _unflatten(flat: Dict[str, Any]):
    out: Dict[str, Any] = {}
    for k, v in flat.items():
        node = out
        parts = k.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out
