"""Rotation math: euler <-> matrix, pose conversions.

Parity targets in /root/reference:
  * euler_angles_to_matrix / matrix_to_euler_angles (XYZ convention),
    modules/radnerfs/utils.py:117-260 (pytorch3d copy)
  * convert_poses -> [euler(3) | trans(3)] 6-d, modules/radnerfs/utils.py:264-270
  * nerf_matrix_to_ngp axis permute + scale, modules/radnerfs/utils.py:53-60
  * compute_rotation (BFM fitting), deep_3drecon/deep_3drecon_models/bfm.py:200-235

Pure jnp; vectorised over leading batch dims.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _axis_rotation(angle: jnp.ndarray, axis: str) -> jnp.ndarray:
    """Rotation matrices [..., 3, 3] about a named axis for angles [...]."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(c), jnp.zeros_like(c)
    if axis == "X":
        rows = ((one, zero, zero), (zero, c, -s), (zero, s, c))
    elif axis == "Y":
        rows = ((c, zero, s), (zero, one, zero), (-s, zero, c))
    elif axis == "Z":
        rows = ((c, -s, zero), (s, c, zero), (zero, zero, one))
    else:
        raise ValueError(axis)
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)


def euler_angles_to_matrix(euler: jnp.ndarray, convention: str = "XYZ") -> jnp.ndarray:
    """euler [..., 3] (radians) -> rotation matrices [..., 3, 3].

    Matches pytorch3d semantics: R = R(c0, a0) @ R(c1, a1) @ R(c2, a2).
    """
    ms = [
        _axis_rotation(euler[..., i], convention[i]) for i in range(3)
    ]
    return ms[0] @ ms[1] @ ms[2]


def matrix_to_euler_angles(matrix: jnp.ndarray, convention: str = "XYZ") -> jnp.ndarray:
    """Rotation matrices [..., 3, 3] -> euler angles [..., 3] (XYZ only)."""
    if convention != "XYZ":
        raise NotImplementedError("only XYZ convention is used by the pipeline")
    # For XYZ (tait-bryan): central angle from -asin? pytorch3d:
    # central = asin(matrix[..., i0, i2] * (-1)^(i0 in odd)) -- for XYZ:
    # angle_y = asin(m[0, 2]); angle_x = atan2(-m[1,2], m[2,2]); angle_z = atan2(-m[0,1], m[0,0])
    central = jnp.arcsin(jnp.clip(matrix[..., 0, 2], -1.0, 1.0))
    ax = jnp.arctan2(-matrix[..., 1, 2], matrix[..., 2, 2])
    az = jnp.arctan2(-matrix[..., 0, 1], matrix[..., 0, 0])
    return jnp.stack([ax, central, az], axis=-1)


def convert_poses(poses: jnp.ndarray) -> jnp.ndarray:
    """c2w poses [B, 4, 4] -> compact [B, 6] = [euler_xyz | translation]."""
    eul = matrix_to_euler_angles(poses[:, :3, :3])
    return jnp.concatenate([eul, poses[:, :3, 3]], axis=-1)


def nerf_matrix_to_ngp(pose: np.ndarray, scale: float = 4.0, offset=(0.0, 0.0, 0.0)) -> np.ndarray:
    """OpenGL NeRF c2w -> instant-NGP axis convention (y,z,x cycle, flip)."""
    pose = np.asarray(pose)
    new_pose = np.array(
        [
            [pose[1, 0], -pose[1, 1], -pose[1, 2], pose[1, 3] * scale + offset[0]],
            [pose[2, 0], -pose[2, 1], -pose[2, 2], pose[2, 3] * scale + offset[1]],
            [pose[0, 0], -pose[0, 1], -pose[0, 2], pose[0, 3] * scale + offset[2]],
            [0, 0, 0, 1],
        ],
        dtype=np.float32,
    )
    return new_pose


def compute_bfm_rotation(angles: jnp.ndarray) -> jnp.ndarray:
    """BFM fitting rotation (deep_3drecon bfm.py:200-235): angles [B, 3]
    (x,y,z radians) -> R [B, 3, 3] with R = (Rz @ Ry @ Rx)^T."""
    rx = _axis_rotation(angles[..., 0], "X")
    ry = _axis_rotation(angles[..., 1], "Y")
    rz = _axis_rotation(angles[..., 2], "Z")
    rot = rz @ ry @ rx
    return jnp.swapaxes(rot, -1, -2)
