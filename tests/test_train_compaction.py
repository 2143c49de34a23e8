"""Train-side live-sample compaction (HeadTaskConfig.train_compact_start).

The compacted train step evaluates the field on only a static budget of
live marcher samples (renderer.py compact_frac) — the TPU-native analogue
of the reference's CUDA stream compaction in march_rays_train
(/root/reference/modules/radnerfs/raymarching/src/raymarching.cu), applied
to TRAINING: gather/scatter are differentiable, so gradients are EXACT
whenever the live count fits the budget.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from genefaceplusplus_tpu.data.dataset import RADNeRFDataset, synthetic
from genefaceplusplus_tpu.models.radnerf import RADNeRFConfig
from genefaceplusplus_tpu.training.radnerf_task import TaskHParams, make_train_step
from genefaceplusplus_tpu.training.tasks.head_task import HeadNeRFTask, HeadTaskConfig


def _task(**cfg_kw):
    ds = RADNeRFDataset(synthetic(num_frames=12, H=24, W=24), split="train",
                        smo_win_size=3, with_sr=False)
    mcfg = RADNeRFConfig(
        grid_size=16, individual_embedding_num=16, smo_win_size=3,
        fourier_pos_features=16, fourier_amb_features=8,
        hidden_dim_sigma=32, hidden_dim_ambient=32, hidden_dim_color=32,
        geo_feat_dim=16,
    )
    tcfg = HeadTaskConfig(n_rays=256, num_coarse=16, num_samples=8, lr=5e-3,
                          **cfg_kw)
    return HeadNeRFTask(ds, mcfg, tcfg, TaskHParams(ambient_ramp_total=100))


def _blob_occupancy(g=16, r2=0.16):
    xx, yy, zz = np.meshgrid(*([np.linspace(-1, 1, g)] * 3), indexing="ij")
    return jnp.asarray((xx ** 2 + (2.0 * yy) ** 2 + zz ** 2) < r2)


def test_compacted_step_matches_full_slot():
    """With a covering budget, the compacted step reproduces the full-slot
    step's loss AND updated params (same rng -> same perturb noise)."""
    task = _task()
    task.occupancy = _blob_occupancy()
    frac = task._live_frac_probe(n_probes=4)
    budget = min(0.99, 2.0 * frac + 0.05)
    assert budget < 0.99, f"blob occupancy too dense for the test (live={frac})"

    from genefaceplusplus_tpu.training.radnerf_task import head_loss_fn

    opts_c = dataclasses.replace(task.opts, compact_frac=budget)
    gather = task._make_ray_gather()

    state = task.create_state()
    frames = task._device_frames()
    b = task.sample_train_batch()
    idx = jnp.asarray(b["frame_idx"], jnp.int32)
    inds = jnp.asarray(b["inds"], jnp.int32)
    batch = gather(frames, idx, inds)
    noise = jax.random.uniform(jax.random.PRNGKey(3), (task.task_cfg.n_rays,))

    def loss_and_grads(opts):
        def f(params):
            return head_loss_fn(params, task.model, batch, task.occupancy,
                                opts, task.hp, state.global_step,
                                state.lambda_ambient, noise)
        return jax.jit(jax.value_and_grad(f, has_aux=True))(state.params)

    (l_full, m_full), g_full = loss_and_grads(task.opts)
    (l_comp, m_comp), g_comp = loss_and_grads(opts_c)

    # gradients compared directly (NOT post-Adam params: Adam normalises by
    # sqrt(v)+eps, so a 1e-9 reduction-order difference in a near-zero grad
    # flips the update sign — numerically meaningless). Compaction gradients
    # are EXACT: verified to machine epsilon under jax_enable_x64, including
    # the duplicate pad-slot writes in the scatter (the at[].set transpose
    # handles duplicated src indices without double-counting). In f32 the
    # gather/scatter reorders reductions whose intermediates are O(1), so
    # a few-ulp (~5e-7) absolute drift on ~1e-4-magnitude grads remains.
    assert np.allclose(float(l_full), float(l_comp), rtol=1e-5, atol=1e-6)
    assert np.allclose(float(m_full["head_psnr"]), float(m_comp["head_psnr"]),
                       rtol=1e-5)
    for a, c in zip(jax.tree.leaves(g_full), jax.tree.leaves(g_comp)):
        a, c = np.asarray(a), np.asarray(c)
        scale = max(np.abs(a).max(), np.abs(c).max(), 1e-8)
        assert np.abs(a - c).max() <= 5e-3 * scale + 5e-7


def test_task_switches_at_compact_start():
    """train_step flips to the compacted graph at train_compact_start and
    surfaces the measured budget as telemetry."""
    task = _task(train_compact_start=2, train_compact_margin=1.5)
    task.occupancy = _blob_occupancy()
    state = task.create_state()
    metrics = {}
    for _ in range(3):
        state, metrics = task.train_step(state, task.sample_train_batch())
    assert task._compact_step is not None
    assert "compact/budget_frac" in metrics
    assert 0.0 < metrics["compact/budget_frac"] < 0.85
    assert np.isfinite(float(metrics["total_loss"]))
    # grid refresh after the switch re-probes the live fraction (overflow guard)
    task.update_extra_state(state)
    assert "compact/probe_live_frac" in task._compact_telemetry


def test_sr_task_switches_to_compacted_step():
    """The SR (flagship) task inherits the switch: full-frame batches, so
    the live fraction is the head's screen coverage."""
    from genefaceplusplus_tpu.training.tasks.sr_task import SRHeadNeRFTask, SRTaskConfig

    ds = RADNeRFDataset(synthetic(num_frames=8, H=16, W=16), split="train",
                        smo_win_size=3, with_sr=True)
    mcfg = RADNeRFConfig(
        grid_size=16, individual_embedding_num=16, smo_win_size=3,
        fourier_pos_features=16, fourier_amb_features=8,
        hidden_dim_sigma=32, hidden_dim_ambient=32, hidden_dim_color=32,
        geo_feat_dim=16,
    )
    tcfg = SRTaskConfig(n_rays=256, num_coarse=8, num_samples=4, lr=1e-3,
                        sr_start_iters=0, lpips_start_iters=10_000,
                        train_compact_start=2, train_compact_margin=1.2)
    task = SRHeadNeRFTask(ds, mcfg, tcfg, TaskHParams())
    task.occupancy = _blob_occupancy(r2=0.06)
    state = task.create_state()
    metrics = {}
    for _ in range(3):
        state, metrics = task.train_step(state, task.sample_train_batch())
    assert task._compact_step is not None
    if task._compact_step is not task._train_step:  # engaged (not aliased)
        assert 0.0 < metrics["compact/budget_frac"] < 0.85
    assert np.isfinite(float(metrics["total_loss"]))
    assert np.isfinite(float(metrics["sr_mse_loss"]))


def test_compacted_train_step_under_mesh():
    """The compacted train step must compile and run with rays sharded over
    the 8-virtual-device mesh (the dryrun_multichip sharding plan): the
    flat cumsum/gather/scatter become cross-shard collectives under GSPMD
    — correct, though a shard-local compaction would avoid them (noted in
    docs/DESIGN.md). Loss must match the unsharded compacted step."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from genefaceplusplus_tpu.parallel.mesh import make_mesh

    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    task = _task()
    task.occupancy = _blob_occupancy()
    opts_c = dataclasses.replace(task.opts, compact_frac=0.5, perturb=False)
    step = make_train_step(task.model, task.tx, opts_c, task.hp)

    state = task.create_state()
    frames = task._device_frames()
    gather = task._make_ray_gather()
    b = task.sample_train_batch()
    batch = gather(frames, jnp.asarray(b["frame_idx"], jnp.int32),
                   jnp.asarray(b["inds"], jnp.int32))

    _, m_single = jax.jit(step)(state, batch, task.occupancy)

    mesh = make_mesh(8)
    ray1 = NamedSharding(mesh, P("rays"))
    ray2 = NamedSharding(mesh, P("rays", None))
    rep = NamedSharding(mesh, P())
    sharded_batch = dict(batch)
    for k, s in (("rays_o", ray2), ("rays_d", ray2), ("gt_rgb", ray2),
                 ("bg_color", ray2), ("face_mask", ray1)):
        sharded_batch[k] = jax.device_put(batch[k], s)
    state_r = jax.device_put(state, rep)
    occ_r = jax.device_put(task.occupancy, rep)
    _, m_mesh = jax.jit(step)(state_r, sharded_batch, occ_r)

    assert np.allclose(float(m_single["total_loss"]), float(m_mesh["total_loss"]),
                       rtol=1e-4, atol=1e-6)


def test_dense_grid_aliases_to_full_slot():
    """When the measured live fraction leaves no compaction headroom
    (budget >= 85%), the switch must fall back to the full-slot step."""
    task = _task(train_compact_start=1, train_compact_margin=1.35)
    task._live_frac_probe = lambda n_probes=8: 0.9  # dense-grid scenario
    task._enable_train_compaction()
    assert task._compact_step is task._train_step
    assert task._compact_telemetry["compact/budget_frac"] >= 0.85
