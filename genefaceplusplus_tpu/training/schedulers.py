"""LR schedules and the grouped RAD-NeRF optimizer.

Parity: /root/reference/utils/nn/schedulers.py —
  ExponentialSchedule (:64), ExponentialScheduleForRADNeRF (:113: param
  groups net x1 / grid x10 / att x5, decay 0.1^(t/250k), floor 1e-5),
  RSQRT (:24), Warmup (:46), Cosine (:180);
and Adam betas/eps from tasks/radnerfs/radnerf.py:51-69 (eps=1e-15).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import optax


def exponential_schedule(lr: float, warmup_updates: int = 0, floor: float = 1e-5,
                         decay_steps: int = 250_000) -> Callable:
    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        decayed = lr * (0.1 ** (step / decay_steps))
        out = jnp.maximum(decayed, floor)
        if warmup_updates > 0:
            warm = jnp.maximum(lr * jnp.minimum(step / warmup_updates, 1.0), floor)
            out = jnp.where(step <= warmup_updates, warm, out)
        return out

    return sched


def rsqrt_schedule(lr: float, warmup_updates: int = 10000, hidden_size: int = 256) -> Callable:
    def sched(step):
        step = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
        constant = lr * warmup_updates ** 0.5 * hidden_size ** -0.5
        return constant * jnp.minimum(step * warmup_updates ** -1.5, step ** -0.5)

    return sched


def warmup_schedule(lr: float, warmup_updates: int = 10000) -> Callable:
    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        return lr * jnp.minimum(step / max(warmup_updates, 1), 1.0)

    return sched


def cosine_schedule(lr: float, total_steps: int, eta_min: float = 1e-5) -> Callable:
    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        t = jnp.clip(step / total_steps, 0.0, 1.0)
        return eta_min + 0.5 * (lr - eta_min) * (1.0 + jnp.cos(jnp.pi * t))

    return sched


def _radnerf_group(path) -> str:
    keys = [getattr(p, "key", str(p)) for p in path]
    joined = "/".join(str(k) for k in keys)
    if "position_embedder" in joined or "ambient_embedder" in joined or "torso_embedder" in joined:
        return "grid"
    if "cond_att_net" in joined:
        return "att"
    return "net"


def grad_norms_by_group(grads, group_fn=_radnerf_group):
    """Per-param-group L2 grad norms + total, as a metrics dict.

    Parity: the reference's per-group grad monitoring
    (/root/reference/tasks/radnerfs/radnerf.py:215-226, utils/nn/grad.py)."""
    import jax

    sq = {}
    def visit(path, leaf):
        g = group_fn(path)
        sq[g] = sq.get(g, 0.0) + jnp.sum(jnp.square(leaf.astype(jnp.float32)))
        return leaf

    jax.tree_util.tree_map_with_path(visit, grads)
    out = {f"grad_norm/{k}": jnp.sqrt(v) for k, v in sq.items()}
    out["grad_norm/total"] = jnp.sqrt(sum(sq.values()))
    return out


def make_radnerf_optimizer(
    lr: float = 5e-4,
    warmup_updates: int = 0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-15,
) -> optax.GradientTransformation:
    """Adam with RAD-NeRF param groups: grid x10, att x5, rest x1."""
    import jax

    base = exponential_schedule(lr, warmup_updates)

    def adam_with_mult(mult: float):
        return optax.adam(lambda s: base(s) * mult, b1=b1, b2=b2, eps=eps)

    def label_fn(params):
        return jax.tree_util.tree_map_with_path(lambda path, _: _radnerf_group(path), params)

    return optax.multi_transform(
        {"net": adam_with_mult(1.0), "grid": adam_with_mult(10.0), "att": adam_with_mult(5.0)},
        label_fn,
    )
