"""Head-NeRF training step (functional, jit/pjit-able).

Parity: RADNeRFTask, /root/reference/tasks/radnerfs/radnerf.py:25-232 —
losses (mse + weights-entropy + masked ambient with 250k ramp), Adam with
grouped lrs, density-grid refresh cadence handled by the Trainer
(training/trainer.py), perturbed marching at train time.

TPU-native: the step is a pure function of (TrainState, batch, occupancy);
rays shard over the mesh ray axis, params replicated, gradients psum'd by
XLA. batch size == n_rays (65536 by default), not images — the reference's
batch=1-image restriction disappears.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from genefaceplusplus_tpu.models.radnerf import RADNeRF
from genefaceplusplus_tpu.models.renderer import RenderOptions, render_rays
from genefaceplusplus_tpu.training import losses as L


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    global_step: jnp.ndarray  # int32 scalar
    lambda_ambient: jnp.ndarray  # f32 scalar (adaptive controller)
    rng: jax.Array


@dataclasses.dataclass(frozen=True)
class TaskHParams:
    lambda_weights_entropy: float = 1e-4
    lambda_ambient: float = 1.0  # initial value of the adaptive lambda
    target_ambient_loss: float = 1e-8
    lr_lambda_ambient: float = 0.01
    ambient_loss_mode: str = "mae"
    ambient_ramp_total: int = 250_000


def create_train_state(model: RADNeRF, tx: optax.GradientTransformation, rng: jax.Array,
                       hp: TaskHParams = TaskHParams()) -> TrainState:
    cfg = model.cfg
    cond = jnp.zeros((cfg.smo_win_size, cfg.cond_win_size, cfg.cond_in_dim))
    params = model.init(rng, jnp.zeros((8, 3)), jnp.ones((8, 3)), cond)
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        global_step=jnp.asarray(0, jnp.int32),
        lambda_ambient=jnp.asarray(hp.lambda_ambient, jnp.float32),
        rng=rng,
    )


def head_loss_fn(
    params,
    model: RADNeRF,
    batch: Dict[str, jnp.ndarray],
    occupancy: jnp.ndarray,
    opts: RenderOptions,
    hp: TaskHParams,
    global_step: jnp.ndarray,
    lambda_ambient: jnp.ndarray,
    noise: jnp.ndarray,
    use_fused_field: bool = False,
    fused_tile: int = 1024,
    fused_interpret: bool = False,
    remat_field: bool = False,
):
    cfg = model.cfg

    def apply(method, *args, **kw):
        return model.apply(params, *args, method=method, **kw)

    cond_feat = apply(RADNeRF.cal_cond_feat, batch["cond"], batch.get("eye_area_percent"))
    ind_code = apply(RADNeRF.get_individual_code, batch["idx"])

    if use_fused_field:
        # the whole field as ONE Pallas kernel (fwd + custom-VJP bwd);
        # grads flow into params through the differentiable weight folding
        from genefaceplusplus_tpu.ops.pallas.fused_field import (
            fused_field_train,
            weights_from_params_jnp,
        )

        weights = weights_from_params_jnp(params, cfg, bound=cfg.bound)

        def field_fn(xyz, dirs):
            return fused_field_train(
                xyz, dirs, cond_feat, ind_code, weights,
                amb_dim=cfg.ambient_coord_dim, bound=cfg.bound,
                tile=fused_tile, interpret=fused_interpret,
            )
    else:
        def field_fn(xyz, dirs):
            return apply(RADNeRF.field, xyz, dirs, cond_feat, ind_code)

    if remat_field:
        # rematerialise the field in the backward pass: the [R*S, 256..384]
        # inter-matmul activations otherwise round-trip HBM; recomputing
        # them can beat re-reading them when the bwd is bandwidth-bound
        field_fn = jax.checkpoint(field_fn)

    out = render_rays(
        field_fn,
        batch["rays_o"],
        batch["rays_d"],
        occupancy,
        bound=cfg.bound,
        min_near=cfg.min_near,
        bg_color=batch["bg_color"],
        opts=opts,
        noise=noise,
    )

    mse = L.mse_loss(out.rgb_map, batch["gt_rgb"])
    went = L.weights_entropy_loss(out.weights_sum)
    amb = L.ambient_loss(out.ambient_sum, batch["face_mask"], hp.ambient_loss_mode)
    amb = jnp.where(jnp.isnan(amb), 0.0, amb)
    ramp = L.ambient_ramp(global_step, hp.ambient_ramp_total)
    total = mse + hp.lambda_weights_entropy * went + ramp * lambda_ambient * amb
    metrics = {
        "mse_loss": mse,
        "weights_entropy_loss": went,
        "ambient_loss": amb,
        "head_psnr": L.mse2psnr(mse),
        "total_loss": total,
    }
    return total, metrics


def make_train_step(model: RADNeRF, tx: optax.GradientTransformation,
                    opts: RenderOptions, hp: TaskHParams = TaskHParams(),
                    use_fused_field: bool = False, fused_tile: int = 1024,
                    fused_interpret: bool = False, remat_field: bool = False):
    """Returns train_step(state, batch, occupancy) -> (state, metrics)."""

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], occupancy: jnp.ndarray
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        rng, sub = jax.random.split(state.rng)
        noise = jax.random.uniform(sub, batch["rays_o"].shape[:1]) if opts.perturb else None

        (_, metrics), grads = jax.value_and_grad(head_loss_fn, has_aux=True)(
            state.params, model, batch, occupancy, opts, hp,
            state.global_step, state.lambda_ambient, noise,
            use_fused_field, fused_tile, fused_interpret, remat_field,
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_lambda = L.adaptive_lambda_ambient(
            state.lambda_ambient, metrics["ambient_loss"],
            hp.target_ambient_loss, hp.lr_lambda_ambient,
        )
        metrics["lambda_ambient"] = new_lambda
        from genefaceplusplus_tpu.training.schedulers import grad_norms_by_group

        metrics.update(grad_norms_by_group(grads))
        new_state = TrainState(
            params=new_params,
            opt_state=new_opt_state,
            global_step=state.global_step + 1,
            lambda_ambient=new_lambda,
            rng=rng,
        )
        return new_state, metrics

    return train_step
