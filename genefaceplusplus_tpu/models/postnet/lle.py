"""Locally-linear-embedding projection of predicted landmarks onto the
training-video landmark manifold.

Parity: /root/reference/modules/postnet/lle.py —
  find_k_nearest_neighbors (:8-28): brute-force L2 top-K
  solve_LLE_projection_batch (:30-78): constrained least squares (weights
    sum to 1) via normal equations
  compute_LLE_projection (:80-95)

Pure jnp; batched linear algebra (batched solves on the MXU).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def find_k_nearest_neighbors(feats: jnp.ndarray, feat_database: jnp.ndarray, K: int = 10) -> jnp.ndarray:
    """feats [N, C], database [M, C] -> [N, K] indices of nearest rows."""
    import jax

    d_norm = (feat_database ** 2).sum(-1)
    f_norm = (feats ** 2).sum(-1)
    dist = f_norm[:, None] + d_norm[None, :] - 2.0 * feats @ feat_database.T
    _, idx = jax.lax.top_k(-dist, K)
    return idx


def solve_lle_projection_batch(feat: jnp.ndarray, feat_base: jnp.ndarray,
                               reg: float = 1e-4
                               ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """feat [N, C], feat_base [N, K, C] -> (feat_fuse [N,C], errors [N], weights [N,K]).

    The reference solves the unregularized normal equations
    (modules/postnet/lle.py:30-78), which silently assumes the K neighbours
    span a (K-1)-dim affine subspace. On low-intrinsic-dimension manifolds
    (K-1 > manifold dim — e.g. a synthetic identity whose landmarks move on
    a ~3-dof articulation) the Gram matrix is singular and the solve returns
    NaN, which would poison every downstream condition. Tikhonov-condition
    it the way scikit-learn's LLE does (barycenter_weights: G += reg*tr(G)*I):
    a relative ridge leaves well-conditioned systems unchanged to ~reg and
    bounds the weights on degenerate ones."""
    N, K, C = feat_base.shape
    if K == 1:
        return feat_base[:, 0], jnp.zeros((N,)), jnp.ones((N, 1))
    B = feat - feat_base[:, 0, :]  # [N, C]
    A = jnp.swapaxes(feat_base[:, 1:, :] - feat_base[:, 0:1, :], 1, 2)  # [N, C, K-1]
    AT = jnp.swapaxes(A, 1, 2)  # [N, K-1, C]
    ATA = AT @ A  # [N, K-1, K-1]
    ATB = (AT @ B[..., None])  # [N, K-1, 1]
    trace = jnp.trace(ATA, axis1=-2, axis2=-1)  # [N]
    ridge = reg * trace + 1e-12  # absolute floor for all-identical neighbours
    ATA = ATA + ridge[:, None, None] * jnp.eye(K - 1, dtype=ATA.dtype)
    X = jnp.linalg.solve(ATA, ATB)[..., 0]  # [N, K-1]
    w0 = 1.0 - X.sum(axis=-1, keepdims=True)
    weights = jnp.concatenate([w0, X], axis=-1)  # [N, K]
    feat_fuse = (weights[:, None, :] @ feat_base)[:, 0]  # [N, C]
    errors = jnp.abs((A @ X[..., None])[..., 0] - B).mean(axis=-1)
    return feat_fuse, errors, weights


def compute_lle_projection(feats: jnp.ndarray, feat_database: jnp.ndarray, K: int = 10
                           ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Project each feat onto the affine hull of its K nearest database rows."""
    import jax

    d_norm = (feat_database ** 2).sum(-1)
    f_norm = (feats ** 2).sum(-1)
    dist = f_norm[:, None] + d_norm[None, :] - 2.0 * feats @ feat_database.T
    _, idx = jax.lax.top_k(-dist, K)  # [N, K]
    feat_base = feat_database[idx]
    return solve_lle_projection_batch(feats, feat_base)
