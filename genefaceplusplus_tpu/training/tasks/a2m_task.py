"""Audio2motion (flow-VAE) training task.

The reference ships only inference for its audio2motion model (the training
code was never released — /root/reference/README.md:70); this task completes
the capability: reconstruction + KL(flow-prior) training of
PitchContourVAEModel / VAEModel on binarized talking-head data
(hubert [2T,1024] + f0 [2T] -> exp [T,64] windows).

Loss: masked MSE + lambda_kl * flow-prior KL (the standard FVAE objective,
modules/audio2motion/vae.py:232-240), with KL annealing.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import flax
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from genefaceplusplus_tpu.data.dataset import RADNeRFDataset
from genefaceplusplus_tpu.models.audio2motion.vae_model import PitchContourVAEModel, VAEModel


@flax.struct.dataclass
class A2MTrainState:
    variables: dict  # params + batch_stats
    opt_state: dict
    global_step: jnp.ndarray
    rng: jax.Array


@dataclasses.dataclass
class A2MTaskConfig:
    lr: float = 5e-4
    lambda_kl: float = 0.02
    kl_anneal_steps: int = 20_000
    seq_len: int = 64  # motion frames per training clip (25 Hz)
    batch_size: int = 8
    use_pitch: bool = True
    audio_in_dim: int = 1024
    in_out_dim: int = 64
    hidden_channels: int = 256
    enc_n_layers: int = 8
    dec_n_layers: int = 4
    flow_hidden: int = 64
    flow_n_blocks: int = 4


class A2MTask:
    def __init__(self, dataset: RADNeRFDataset, cfg: A2MTaskConfig = A2MTaskConfig(), seed: int = 9999):
        self.dataset = dataset
        self.cfg = cfg
        size_kw = dict(hidden_channels=cfg.hidden_channels, enc_n_layers=cfg.enc_n_layers,
                       dec_n_layers=cfg.dec_n_layers, flow_hidden=cfg.flow_hidden,
                       flow_n_blocks=cfg.flow_n_blocks)
        if cfg.use_pitch:
            self.model = PitchContourVAEModel(in_out_dim=cfg.in_out_dim, audio_in_dim=cfg.audio_in_dim, **size_kw)
        else:
            self.model = VAEModel(in_out_dim=cfg.in_out_dim, audio_in_dim=cfg.audio_in_dim, **size_kw)
        self.tx = optax.adam(cfg.lr, b1=0.9, b2=0.98)
        self.np_rng = np.random.RandomState(seed)
        self.seed = seed
        self._train_step = jax.jit(self._make_step())

        ds = dataset.ds
        self.hubert = np.asarray(ds["hubert"], np.float32)
        self.f0 = np.asarray(ds["f0"], np.float32)
        self.exp = np.asarray(ds["exp"], np.float32)
        self.T = min(len(self.hubert) // 2, len(self.exp))

    def create_state(self) -> A2MTrainState:
        batch = self._dummy_batch()
        variables = self.model.init(jax.random.PRNGKey(self.seed), batch, train=True,
                                    rng=jax.random.PRNGKey(self.seed + 1))
        return A2MTrainState(
            variables=variables,
            opt_state=self.tx.init(variables["params"]),
            global_step=jnp.asarray(0, jnp.int32),
            rng=jax.random.PRNGKey(self.seed + 2),
        )

    def _dummy_batch(self):
        c = self.cfg
        return {
            "audio": jnp.zeros((1, 2 * c.seq_len, c.audio_in_dim)),
            "f0": jnp.zeros((1, 2 * c.seq_len)),
            "y_mask": jnp.ones((1, c.seq_len)),
            "y": jnp.zeros((1, c.seq_len, c.in_out_dim)),
        }

    def _make_step(self):
        model, tx, cfg = self.model, self.tx, self.cfg

        def loss_fn(params, batch_stats, batch, rng, step):
            variables = {"params": params, **({"batch_stats": batch_stats} if batch_stats else {})}
            (recon, aux), mutated = model.apply(
                variables, batch, train=True, rng=rng, mutable=["batch_stats"]
            )
            mask = batch["y_mask"][..., None]
            mse = (((recon - batch["y"]) ** 2) * mask).sum() / mask.sum() / recon.shape[-1]
            anneal = jnp.minimum(step / cfg.kl_anneal_steps, 1.0)
            total = mse + cfg.lambda_kl * anneal * aux["loss_kl"]
            metrics = {"mse_loss": mse, "kl_loss": aux["loss_kl"], "total_loss": total}
            return total, (metrics, mutated.get("batch_stats", {}))

        def step(state: A2MTrainState, batch):
            rng, sub = jax.random.split(state.rng)
            params = state.variables["params"]
            bstats = state.variables.get("batch_stats", {})
            (_, (metrics, new_bstats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, bstats, batch, sub, state.global_step
            )
            updates, new_opt = tx.update(grads, state.opt_state, params)
            new_params = optax.apply_updates(params, updates)
            new_vars = {"params": new_params}
            if new_bstats:
                new_vars["batch_stats"] = new_bstats
            return (
                A2MTrainState(new_vars, new_opt, state.global_step + 1, rng),
                metrics,
            )

        return step

    def sample_train_batch(self) -> Dict:
        c = self.cfg
        L = c.seq_len
        starts = self.np_rng.randint(0, max(1, self.T - L), size=c.batch_size)
        audio = np.stack([self.hubert[2 * s : 2 * (s + L)] for s in starts])
        f0 = np.stack([self.f0[2 * s : 2 * (s + L)] for s in starts])
        y = np.stack([self.exp[s : s + L] for s in starts])
        return {
            "audio": jnp.asarray(audio),
            "f0": jnp.asarray(f0),
            "y_mask": jnp.ones((c.batch_size, L)),
            "y": jnp.asarray(y),
        }

    def train_step(self, state, batch):
        return self._train_step(state, batch)

    def update_extra_state(self, state):
        pass

    def validate(self, state, max_frames: int = 0):
        return {}

    def extra_state_dict(self):
        return {}

    def load_extra_state(self, d):
        pass
