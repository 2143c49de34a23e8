"""exp with gradient-clamped backward (instant-NGP trick).

Parity: _trunc_exp, /root/reference/modules/radnerfs/utils.py:36-49 —
forward exp(x) in f32, backward g * exp(clip(x, -15, 15)).
"""

import jax
import jax.numpy as jnp


@jax.custom_vjp
def trunc_exp(x):
    return jnp.exp(x.astype(jnp.float32))


def _fwd(x):
    x32 = x.astype(jnp.float32)
    return jnp.exp(x32), x32


def _bwd(x32, g):
    return (g * jnp.exp(jnp.clip(x32, -15.0, 15.0)),)


trunc_exp.defvjp(_fwd, _bwd)
