"""Analysis-by-synthesis 3DMM fitting: 2D landmarks -> (id, exp, euler, trans).

Parity: fit_3dmm_for_a_video,
/root/reference/data_gen/utils/process_video/fit_3dmm_landmark.py:131-358 —
Adam on (id [1,80] shared, exp [T,64], euler [T,3], trans [T,3]) against
detected 2D landmarks; weighted per-region MSE (eyes/mouth upweighted,
cal_lan_loss_mp :93-111), Laplacian temporal regularisation (:64-74),
200 pose-only iterations then joint refinement.

TPU-native: the whole video fits in ONE jitted optax loop (the reference
chunks 50-frame batches to fit GPU memory; landmark fitting is tiny on TPU).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from genefaceplusplus_tpu.data.face3d import Face3DHelper
from genefaceplusplus_tpu.data.landmarks import (
    INDEX_EYE_FROM_LM478,
    INDEX_INNERLIP_FROM_LM478,
    INDEX_OUTERLIP_FROM_LM478,
    UNMATCH_MASK_FROM_LM478,
)


def landmark_weights(n_points: int) -> np.ndarray:
    """Per-landmark loss weights (fit_3dmm_landmark.py:93-111): eyes x5,
    lips x3, unmatched boundary x0."""
    w = np.ones(n_points, np.float32)
    if n_points >= 468:
        w[INDEX_EYE_FROM_LM478] = 5.0
        w[INDEX_INNERLIP_FROM_LM478] = 3.0
        w[INDEX_OUTERLIP_FROM_LM478] = 3.0
        w[UNMATCH_MASK_FROM_LM478] = 0.0
    else:  # lm68: eyes 36-47, mouth 48-67
        w[36:48] = 5.0
        w[48:68] = 3.0
    return w / w.mean()


def laplacian_loss(x: jnp.ndarray) -> jnp.ndarray:
    """Temporal second-difference regulariser over axis 0."""
    if x.shape[0] < 3:
        return jnp.asarray(0.0)
    lap = x[:-2] - 2 * x[1:-1] + x[2:]
    return (lap ** 2).mean()


@dataclasses.dataclass
class FitConfig:
    lr_pose: float = 0.1
    lr_joint: float = 0.01
    iters_pose: int = 200
    iters_joint: int = 200
    lambda_lap: float = 0.3
    lambda_reg_id: float = 0.001
    lambda_reg_exp: float = 0.001


def fit_3dmm_for_video(
    lm2d: np.ndarray,  # [T, K, 2] detected landmarks in [0, 1]
    helper: Face3DHelper,
    cfg: FitConfig = FitConfig(),
    init: Optional[Dict[str, np.ndarray]] = None,
) -> Dict[str, np.ndarray]:
    """Fit BFM coefficients to a landmark track. Returns the coeff dict in
    the binarizer's schema: id [T,80] (shared row repeated), exp [T,64],
    euler [T,3], trans [T,3]."""
    T, K, _ = lm2d.shape
    target = jnp.asarray(lm2d, jnp.float32)
    w = jnp.asarray(landmark_weights(K))[None, :, None]

    params = {
        "id": jnp.zeros((1, 80)),
        "exp": jnp.zeros((T, 64)),
        "euler": jnp.zeros((T, 3)),
        "trans": jnp.zeros((T, 3)),
    }
    if init:
        params.update({k: jnp.asarray(v) for k, v in init.items() if k in params})

    def project(p):
        id_coeff = jnp.broadcast_to(p["id"], (T, 80))
        return helper.reconstruct_lm2d(id_coeff, p["exp"], p["euler"], p["trans"])

    def loss_fn(p, joint: bool):
        pred = project(p)
        lan = (w * (pred - target) ** 2).mean()
        reg = cfg.lambda_reg_id * (p["id"] ** 2).mean() + cfg.lambda_reg_exp * (p["exp"] ** 2).mean()
        lap = cfg.lambda_lap * (laplacian_loss(p["euler"]) + laplacian_loss(p["trans"])
                                + (laplacian_loss(p["exp"]) if joint else 0.0))
        return lan + reg + lap

    def run_phase(params, lr, iters, mask_keys, joint):
        tx = optax.adam(lr)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state):
            loss, grads = jax.value_and_grad(lambda p: loss_fn(p, joint))(params)
            grads = {k: (g if k in mask_keys else jnp.zeros_like(g)) for k, g in grads.items()}
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        loss = None
        for _ in range(iters):
            params, opt_state, loss = step(params, opt_state)
        return params, float(loss) if loss is not None else float("nan")

    params, pose_loss = run_phase(params, cfg.lr_pose, cfg.iters_pose, {"euler", "trans"}, joint=False)
    params, joint_loss = run_phase(
        params, cfg.lr_joint, cfg.iters_joint, {"id", "exp", "euler", "trans"}, joint=True
    )

    return {
        "id": np.tile(np.asarray(params["id"]), (T, 1)).astype(np.float32),
        "exp": np.asarray(params["exp"], np.float32),
        "euler": np.asarray(params["euler"], np.float32),
        "trans": np.asarray(params["trans"], np.float32),
        "final_loss": joint_loss,
        "pose_loss": pose_loss,
    }
