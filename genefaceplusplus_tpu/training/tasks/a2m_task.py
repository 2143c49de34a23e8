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
    # prediction target: "exp" (reference motion_type, 64-d 3DMM coeffs) or
    # "idexp_lm3d" (204-d landmark space — enables a direct LMD val metric;
    # in_out_dim must match: 64 / 204)
    target: str = "exp"


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
        self.exp = np.asarray(ds[cfg.target], np.float32)
        assert self.exp.shape[-1] == cfg.in_out_dim, (
            f"target {cfg.target} is {self.exp.shape[-1]}-d but in_out_dim="
            f"{cfg.in_out_dim}")
        self.T = min(len(self.hubert) // 2, len(self.exp))
        # held-out temporal split: last 1/11 of the timeline, mirroring the
        # binarizer's frame split (binarizer_nerf.py:279-282). Training
        # windows never start inside it; validate() slides over it.
        self.T_val = max(cfg.seq_len, self.T // 11) if self.T > 2 * cfg.seq_len else 0
        self.T_train = self.T - self.T_val
        self._val_fns = None

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

        L = cfg.seq_len

        def gather(data, starts):
            # on-device batch assembly: the full track lives on the device
            # (hubert [2T,1024] is only a few MB), the host sends B int32
            # window starts per step. Host-side np.stack + transfer was
            # ~4 MB/step through the network device tunnel and throttled
            # training to ~1 step/s once the tunnel send buffer filled
            # (round-4 measurement); this is the same fix the head/SR/torso
            # tasks got in round 3.
            def one(s):
                audio = jax.lax.dynamic_slice(
                    data["hubert"], (2 * s, 0), (2 * L, data["hubert"].shape[1]))
                f0 = jax.lax.dynamic_slice(data["f0"], (2 * s,), (2 * L,))
                y = jax.lax.dynamic_slice(
                    data["exp"], (s, 0), (L, data["exp"].shape[1]))
                return audio, f0, y

            audio, f0, y = jax.vmap(one)(starts)
            return {"audio": audio, "f0": f0, "y": y,
                    "y_mask": jnp.ones((starts.shape[0], L))}

        def step(state: A2MTrainState, batch, data=None):
            if data is not None:
                batch = gather(data, batch["starts"])
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

    def _device_data(self) -> Dict:
        """Device-resident copies of the full tracks, rebuilt if the host
        arrays are swapped after construction (quality_production's
        stage_train_a2m replaces task.hubert/f0 with the synthesized
        track)."""
        ids = (id(self.hubert), id(self.f0), id(self.exp))
        if getattr(self, "_dev_ids", None) != ids:
            self._dev = {"hubert": jnp.asarray(self.hubert),
                         "f0": jnp.asarray(self.f0),
                         "exp": jnp.asarray(self.exp)}
            self._dev_ids = ids
        return self._dev

    def sample_train_batch(self) -> Dict:
        c = self.cfg
        starts = self.np_rng.randint(0, max(1, self.T_train - c.seq_len),
                                     size=c.batch_size)
        return {"starts": jnp.asarray(starts, jnp.int32)}

    def train_step(self, state, batch):
        if "starts" in batch:
            return self._train_step(state, batch, self._device_data())
        return self._train_step(state, batch)

    def update_extra_state(self, state):
        pass

    def _build_val_fns(self):
        model = self.model

        def recon_fn(variables, batch):
            # posterior path (encoder -> decoder) on held-out audio+motion;
            # BN in batch mode, mutations discarded (pure metric)
            (recon, aux), _ = model.apply(variables, batch, train=True,
                                          rng=jax.random.PRNGKey(0),
                                          mutable=["batch_stats"])
            return recon, aux["loss_kl"]

        def gen_fn(variables, batch):
            # inference path: z_p ~ N(0, T) with temperature 0 -> the
            # deterministic prior mode through the inverse flow
            recon, _ = model.apply(variables, batch, train=False,
                                   temperature=0.0, rng=jax.random.PRNGKey(0))
            return recon

        self._val_fns = (jax.jit(recon_fn), jax.jit(gen_fn))

    def validate(self, state, max_frames: int = 0, save_dir: str = ""):
        """Held-out metrics on the last-1/11 temporal split (never sampled
        by training): posterior reconstruction MSE, deterministic
        prior-sample L1, and — when the target is landmark space — LMD
        (mean 3D landmark distance, the BASELINE.md north-star metric;
        idexp_lm3d stores landmarks x10 so distances divide by 10)."""
        if self.T_val == 0:
            return {}
        if self._val_fns is None:
            self._build_val_fns()
        recon_fn, gen_fn = self._val_fns
        c = self.cfg
        L = c.seq_len
        starts = list(range(self.T_train, self.T - L + 1, L)) or [self.T - L]
        mses, gen_l1s, lmds, kls = [], [], [], []
        for s in starts:
            batch = {
                "audio": jnp.asarray(self.hubert[2 * s : 2 * (s + L)][None]),
                "f0": jnp.asarray(self.f0[2 * s : 2 * (s + L)][None]),
                "y_mask": jnp.ones((1, L)),
                "y": jnp.asarray(self.exp[s : s + L][None]),
            }
            recon, kl = recon_fn(state.variables, batch)
            gen = gen_fn(state.variables, batch)
            gt = batch["y"]
            mses.append(float(jnp.mean((recon - gt) ** 2)))
            gen_l1s.append(float(jnp.mean(jnp.abs(gen - gt))))
            kls.append(float(kl))
            if c.target == "idexp_lm3d":
                d = (gen.reshape(1, L, 68, 3) - gt.reshape(1, L, 68, 3)) / 10.0
                lmds.append(float(jnp.mean(jnp.linalg.norm(d, axis=-1))))
        out = {
            "val_recon_mse": float(np.mean(mses)),
            "val_gen_l1": float(np.mean(gen_l1s)),
            "val_kl": float(np.mean(kls)),
        }
        if lmds:
            out["val_lmd"] = float(np.mean(lmds))
        return out

    def extra_state_dict(self):
        return {}

    def load_extra_state(self, d):
        pass
