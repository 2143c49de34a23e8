"""Postnet training task: pitch-conditioned landmark refinement.

The reference imports PitchContourCNNPostNet at inference
(/root/reference/inference/genefacepp_infer.py:155) but never released its
training code or module. This task completes the capability: given a
trained audio2motion model, train the postnet to map RAW a2m-predicted
idexp_lm3d sequences onto the ground-truth landmarks of the target
identity, conditioned on the pitch contour — a person-specific refiner.

Loss: L1 on the refined landmarks + a temporal smoothness term (first-order
difference match), both standard for landmark refiners.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from genefaceplusplus_tpu.data.dataset import RADNeRFDataset
from genefaceplusplus_tpu.models.postnet.models import PitchContourCNNPostNet


@flax.struct.dataclass
class PostnetTrainState:
    params: dict
    opt_state: dict
    global_step: jnp.ndarray
    rng: jax.Array


@dataclasses.dataclass
class PostnetTaskConfig:
    lr: float = 1e-4
    out_dim: int = 204
    hidden: int = 256
    n_layers: int = 4
    seq_len: int = 64
    batch_size: int = 4
    lambda_temporal: float = 0.2
    # perturbation used to synthesise "raw predictions" when no a2m model is
    # supplied: gt + smooth noise (a2m residuals are low-frequency)
    noise_scale: float = 0.1


class PostnetTask:
    def __init__(self, dataset: RADNeRFDataset, cfg: PostnetTaskConfig = PostnetTaskConfig(),
                 predict_fn: Optional[Callable] = None, seed: int = 9999,
                 raw_bank: Optional[np.ndarray] = None):
        """predict_fn(hubert [2T,C], f0 [2T], rng) -> raw lm3d [T, out_dim];
        when None, raw predictions are synthesised as gt + smooth noise.

        raw_bank [K, T, out_dim]: optional pre-generated full-track a2m
        predictions aligned to the gt track; training windows then slice
        the bank instead of calling predict_fn per batch element. Through
        the TPU tunnel a per-element predict_fn costs ~1.6 s/call
        (0.15 steps/s measured) — K full-track dispatches up front buy the
        same sample diversity at device-speed training. predict_fn is
        still used for validation (few windows, once per val interval)."""
        self.dataset = dataset
        self.cfg = cfg
        self.predict_fn = predict_fn
        self.raw_bank = None if raw_bank is None else np.asarray(raw_bank, np.float32)
        self.model = PitchContourCNNPostNet(
            out_dim=cfg.out_dim, hidden=cfg.hidden, n_layers=cfg.n_layers
        )
        # held-out temporal split (last 1/11, binarizer_nerf.py:279-282):
        # training windows never start inside it; validate() covers it
        T = len(np.asarray(dataset.ds["idexp_lm3d"]))
        self.T = T
        self.T_val = max(cfg.seq_len, T // 11) if T > 2 * cfg.seq_len else 0
        self.T_train = T - self.T_val
        self.tx = optax.adam(cfg.lr)
        self.np_rng = np.random.RandomState(seed)
        self.seed = seed
        self._train_step = jax.jit(self._make_step())

    def create_state(self) -> PostnetTrainState:
        cfg = self.cfg
        params = self.model.init(
            jax.random.PRNGKey(self.seed),
            jnp.zeros((1, cfg.seq_len, cfg.out_dim)),
            jnp.zeros((1, 2 * cfg.seq_len, 1)),
        )
        return PostnetTrainState(
            params=params,
            opt_state=self.tx.init(params),
            global_step=jnp.asarray(0, jnp.int32),
            rng=jax.random.PRNGKey(self.seed),
        )

    def _make_step(self):
        model, tx, cfg = self.model, self.tx, self.cfg

        def loss_fn(params, batch):
            refined = model.apply(params, batch["raw"], batch["pitch"])
            l1 = jnp.abs(refined - batch["gt"]).mean()
            dt_pred = refined[:, 1:] - refined[:, :-1]
            dt_gt = batch["gt"][:, 1:] - batch["gt"][:, :-1]
            temporal = jnp.abs(dt_pred - dt_gt).mean()
            total = l1 + cfg.lambda_temporal * temporal
            return total, {"l1_loss": l1, "temporal_loss": temporal, "total_loss": total}

        def step(state: PostnetTrainState, batch):
            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, batch)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            return (
                PostnetTrainState(new_params, new_opt, state.global_step + 1, state.rng),
                metrics,
            )

        return step

    def _smooth_noise(self, shape):
        """Low-frequency noise: random walk smoothed by a moving average."""
        n = self.np_rng.randn(*shape).astype(np.float32)
        k = 9
        kern = np.ones(k, np.float32) / k
        n = np.apply_along_axis(lambda s: np.convolve(s, kern, mode="same"), 1, n)
        return n * self.cfg.noise_scale

    def sample_train_batch(self) -> Dict:
        ds = self.dataset
        cfg = self.cfg
        lm = np.asarray(ds.ds["idexp_lm3d"], np.float32)  # [T, 204]
        f0 = np.asarray(ds.ds["f0"], np.float32)  # [2T]
        T = self.T_train if self.T_val else len(lm)
        L = min(cfg.seq_len, T)
        gts, raws, pitches = [], [], []
        for _ in range(cfg.batch_size):
            s = int(self.np_rng.randint(0, max(1, T - L + 1)))
            gt = lm[s : s + L]
            if self.raw_bank is not None:
                raw = self.raw_bank[self.np_rng.randint(len(self.raw_bank)),
                                    s : s + L]
            elif self.predict_fn is not None:
                hubert = np.asarray(ds.ds["hubert"], np.float32)[2 * s : 2 * (s + L)]
                raw = np.asarray(self.predict_fn(hubert, f0[2 * s : 2 * (s + L)],
                                                 self.np_rng.randint(1 << 30)))
            else:
                raw = gt + self._smooth_noise(gt.shape)
            gts.append(gt)
            raws.append(raw)
            pitches.append(f0[2 * s : 2 * (s + L), None] / 400.0)
        return {
            "gt": jnp.asarray(np.stack(gts)),
            "raw": jnp.asarray(np.stack(raws)),
            "pitch": jnp.asarray(np.stack(pitches)),
        }

    def train_step(self, state, batch):
        return self._train_step(state, batch)

    def update_extra_state(self, state):
        pass

    def validate(self, state, max_frames: int = 0, save_dir: str = ""):
        """Refinement gain on the HELD-OUT split (last 1/11, disjoint from
        every training window): postnet L1 vs identity L1, deterministic
        (fixed noise seed / a2m rng) so the metric is comparable across
        steps. Empty when the sequence is too short to hold out."""
        if self.T_val == 0:
            return {}
        ds, cfg = self.dataset, self.cfg
        lm = np.asarray(ds.ds["idexp_lm3d"], np.float32)
        f0 = np.asarray(ds.ds["f0"], np.float32)
        L = cfg.seq_len
        starts = list(range(self.T_train, self.T - L + 1, L)) or [self.T - L]
        val_rng = np.random.RandomState(1234)
        l1_post, l1_raw, lmds = [], [], []
        for s in starts:
            gt = lm[s : s + L]
            if self.predict_fn is not None:
                hubert = np.asarray(ds.ds["hubert"], np.float32)[2 * s : 2 * (s + L)]
                raw = np.asarray(self.predict_fn(hubert, f0[2 * s : 2 * (s + L)], 1234))
            else:
                saved = self.np_rng
                self.np_rng = val_rng
                raw = gt + self._smooth_noise(gt.shape)
                self.np_rng = saved
            pitch = f0[2 * s : 2 * (s + L), None] / 400.0
            refined = self.model.apply(state.params, jnp.asarray(raw[None]),
                                       jnp.asarray(pitch[None]))
            l1_post.append(float(jnp.abs(refined - gt[None]).mean()))
            l1_raw.append(float(np.abs(raw - gt).mean()))
            d = (np.asarray(refined).reshape(L, 68, 3) - gt.reshape(L, 68, 3)) / 10.0
            lmds.append(float(np.mean(np.linalg.norm(d, axis=-1))))
        return {"val_l1_refined": float(np.mean(l1_post)),
                "val_l1_raw": float(np.mean(l1_raw)),
                "val_lmd": float(np.mean(lmds))}

    def extra_state_dict(self):
        return {}

    def load_extra_state(self, d):
        pass
