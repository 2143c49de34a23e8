"""BFM09 3DMM helper: landmark / mesh reconstruction from id+exp coefficients.

Parity: Face3DHelper, /root/reference/data_util/face3d_helper.py —
  * load_3dmm (:18-47): BFM_model_front.mat basis (mean_shape recentred,
    id_base [3N,80], exp_base [3N,64], 68-keypoint subsets)
  * split_coeff (:49-61): 257-d deep3drecon coefficient layout
  * reconstruct_idexp_lm3d (:207-222): (id_base@id + exp_base@exp) * 10
  * reconstruct_lm2d / _nerf (:126-169): rotate+translate, z -> 10 - z,
    perspective projection (focal 1015, center 112), y-flip, /224, and the
    nerf variant flips x and y (:120-124)
  * compute_rotation (:171-205) == utils.rotation.compute_bfm_rotation

When the BFM .mat is unavailable (no redistributable license), a
deterministic synthetic basis with the same shapes supports the full
pipeline and tests; `from_mat` loads the real thing.
"""

from __future__ import annotations

import os
from typing import Dict

import jax.numpy as jnp
import numpy as np

from genefaceplusplus_tpu.utils.rotation import compute_bfm_rotation

N_VERTS = 35709
N_ID, N_EXP = 80, 64


def perspective_projection(focal: float = 1015.0, center: float = 112.0) -> np.ndarray:
    """[3,3] transposed intrinsics: points @ P (bfm.py:12-18)."""
    P = np.array([[focal, 0, center], [0, focal, center], [0, 0, 1]], np.float32)
    return P.T


def split_coeff(coeff: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """257-d deep3drecon coefficients -> named parts (face3d_helper.py:49-61)."""
    return {
        "identity": coeff[..., :80],
        "expression": coeff[..., 80:144],
        "texture": coeff[..., 144:224],
        "euler": coeff[..., 224:227],
        "gamma": coeff[..., 227:254],
        "translation": coeff[..., 254:257],
    }


class Face3DHelper:
    """Holds the (key-point subset of the) BFM basis as jnp arrays."""

    def __init__(
        self,
        key_mean_shape: np.ndarray,  # [K, 3]
        key_id_base: np.ndarray,  # [3K, 80]
        key_exp_base: np.ndarray,  # [3K, 64]
        keypoint_mode: str = "lm68",
    ):
        self.keypoint_mode = keypoint_mode
        self.key_mean_shape = jnp.asarray(key_mean_shape, jnp.float32)
        self.key_id_base = jnp.asarray(key_id_base, jnp.float32)
        self.key_exp_base = jnp.asarray(key_exp_base, jnp.float32)
        self.persc_proj = jnp.asarray(perspective_projection())
        self.n_keypoints = self.key_mean_shape.shape[0]

    # -- constructors --------------------------------------------------
    @classmethod
    def from_mat(cls, bfm_dir: str, keypoint_mode: str = "lm68") -> "Face3DHelper":
        from scipy.io import loadmat

        model = loadmat(os.path.join(bfm_dir, "BFM_model_front.mat"))
        mean_shape = model["meanshape"].reshape(-1, 3).astype(np.float32)
        mean_shape = mean_shape - mean_shape.mean(0, keepdims=True)
        id_base = model["idBase"].astype(np.float32)  # [3N, 80]
        exp_base = model["exBase"].astype(np.float32)  # [3N, 64]
        if keypoint_mode == "mediapipe":
            kp = np.load(os.path.join(bfm_dir, "index_mp468_from_mesh35709.npy")).astype(np.int64)
            kp[kp < 0] = 0
        else:
            kp = model["keypoints"].squeeze().astype(np.int64)
        key_mean = mean_shape[kp]
        key_id = id_base.reshape(-1, 3, N_ID)[kp].reshape(-1, N_ID)
        key_exp = exp_base.reshape(-1, 3, N_EXP)[kp].reshape(-1, N_EXP)
        return cls(key_mean, key_id, key_exp, keypoint_mode)

    @classmethod
    def synthetic(cls, keypoint_mode: str = "lm68", seed: int = 0) -> "Face3DHelper":
        """Deterministic stand-in basis (BFM09 is not redistributable)."""
        K = {"lm68": 68, "lm131": 131, "lm468": 468, "mediapipe": 468}[keypoint_mode]
        rng = np.random.RandomState(seed)
        key_mean = rng.randn(K, 3).astype(np.float32) * 0.3
        key_id = (rng.randn(3 * K, N_ID) * 0.01).astype(np.float32)
        key_exp = (rng.randn(3 * K, N_EXP) * 0.01).astype(np.float32)
        return cls(key_mean, key_id, key_exp, keypoint_mode)

    @classmethod
    def load(cls, bfm_dir: str = "deep_3drecon/BFM", keypoint_mode: str = "lm68") -> "Face3DHelper":
        if os.path.exists(os.path.join(bfm_dir, "BFM_model_front.mat")):
            return cls.from_mat(bfm_dir, keypoint_mode)
        return cls.synthetic(keypoint_mode)

    # -- reconstruction -------------------------------------------------
    def reconstruct_idexp_lm3d(self, id_coeff: jnp.ndarray, exp_coeff: jnp.ndarray) -> jnp.ndarray:
        """[T,80],[T,64] -> identity+expression landmark offsets [T,K,3] x10."""
        diff = id_coeff @ self.key_id_base.T + exp_coeff @ self.key_exp_base.T  # [T, 3K]
        return diff.reshape(diff.shape[0], -1, 3) * 10.0

    def reconstruct_key_lm3d(self, id_coeff, exp_coeff, euler, trans, to_camera: bool = True):
        """Posed keypoint landmarks in camera space [T,K,3]."""
        diff = id_coeff @ self.key_id_base.T + exp_coeff @ self.key_exp_base.T
        face = self.key_mean_shape.reshape(1, -1, 3) + diff.reshape(diff.shape[0], -1, 3)
        rot = compute_bfm_rotation(euler)  # [T, 3, 3], points @ rot
        lm3d = face @ rot + trans[:, None, :]
        if to_camera:
            lm3d = lm3d.at[..., -1].set(10.0 - lm3d[..., -1])
        return lm3d

    def reconstruct_lm2d(self, id_coeff, exp_coeff, euler, trans, to_camera: bool = True):
        """Projected 2D landmarks in [0,1]^2 (origin top-left, /224)."""
        btc = id_coeff.ndim == 3
        if btc:
            b, t = id_coeff.shape[:2]
            id_coeff, exp_coeff = id_coeff.reshape(b * t, -1), exp_coeff.reshape(b * t, -1)
            euler, trans = euler.reshape(b * t, -1), trans.reshape(b * t, -1)
        lm3d = self.reconstruct_key_lm3d(id_coeff, exp_coeff, euler, trans, to_camera)
        proj = lm3d @ self.persc_proj
        lm2d = proj[..., :2] / proj[..., 2:]
        lm2d = lm2d.at[..., 1].set(224.0 - lm2d[..., 1]) / 224.0
        if btc:
            lm2d = lm2d.reshape(b, t, -1, 2)
        return lm2d

    def reconstruct_lm2d_nerf(self, id_coeff, exp_coeff, euler, trans):
        """NeRF-convention 2D landmarks: both axes flipped (:120-124)."""
        lm2d = self.reconstruct_lm2d(id_coeff, exp_coeff, euler, trans, to_camera=False)
        return 1.0 - lm2d

    def project_lm3d_nerf(self, lm3d, euler, trans):
        """NeRF-convention projection of GIVEN canonical landmarks [T,K,3]
        — the motion_type=idexp_lm3d direct-drive path, where the driving
        landmarks exist without id/exp coefficients. Same pose + projection
        math as reconstruct_lm2d_nerf minus the basis reconstruction."""
        rot = compute_bfm_rotation(euler)
        posed = lm3d @ rot + trans[:, None, :]
        proj = posed @ self.persc_proj
        lm2d = proj[..., :2] / proj[..., 2:]
        lm2d = lm2d.at[..., 1].set(224.0 - lm2d[..., 1]) / 224.0
        return 1.0 - lm2d
