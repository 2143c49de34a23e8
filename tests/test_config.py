import os

import pytest

from genefaceplusplus_tpu.config import Config, load_config, save_config, set_hparams
from genefaceplusplus_tpu.config.config import apply_overrides


def test_base_config_inheritance(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text("a: 1\nb: {x: 1, y: 2}\nc: base\n")
    child = tmp_path / "child.yaml"
    child.write_text(f"base_config: {base}\nb: {{y: 3}}\nd: child\n")
    cfg = load_config(str(child))
    assert cfg["a"] == 1
    assert cfg["b"] == {"x": 1, "y": 3}
    assert cfg["c"] == "base"
    assert cfg["d"] == "child"


def test_base_config_cycle_raises(tmp_path):
    a = tmp_path / "a.yaml"
    b = tmp_path / "b.yaml"
    a.write_text(f"base_config: {b}\n")
    b.write_text(f"base_config: {a}\n")
    with pytest.raises(ValueError):
        load_config(str(a))


def test_dotted_overrides():
    cfg = {"lr": 0.1, "model": {"dim": 8}}
    apply_overrides(cfg, "lr=0.2,model.dim=16,new.flag=true,lst=[1,2,3],name=hello")
    assert cfg["lr"] == 0.2
    assert cfg["model"]["dim"] == 16
    assert cfg["new"]["flag"] is True
    assert cfg["lst"] == [1, 2, 3]
    assert cfg["name"] == "hello"


def test_workdir_roundtrip(tmp_path):
    cfg = Config({"lr": 0.001, "video_id": "May"})
    save_config(cfg, str(tmp_path))
    restored = set_hparams(work_dir=str(tmp_path))
    assert restored["lr"] == 0.001
    assert restored.video_id == "May"
    # reset=True ignores saved config
    fresh = set_hparams(work_dir=str(tmp_path), reset=True, hparams_str="lr=5")
    assert fresh["lr"] == 5
    assert "video_id" not in fresh


def test_saved_config_is_overridden_by_explicit_yaml(tmp_path):
    work = tmp_path / "work"
    os.makedirs(work)
    save_config({"lr": 1, "k": "old"}, str(work))
    new_yaml = tmp_path / "new.yaml"
    new_yaml.write_text("lr: 2\n")
    cfg = set_hparams(config=str(new_yaml), work_dir=str(work))
    assert cfg["lr"] == 2
    assert cfg["k"] == "old"


def test_all_shipped_egs_configs_resolve():
    """Every YAML under egs/ loads through the inheritance chain and maps
    task_cls to a registered task (config-surface parity with the
    reference's egs/ tree, incl. the non-SR head/torso variants)."""
    import glob

    from genefaceplusplus_tpu.training.run import TASK_REGISTRY

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    yamls = sorted(glob.glob(os.path.join(repo, "egs", "**", "*.yaml"), recursive=True))
    assert len(yamls) >= 13
    old = os.getcwd()
    os.chdir(repo)  # base_config paths are repo-relative
    try:
        for path in yamls:
            cfg = load_config(path)
            if "egs_bases" in path and os.path.basename(path) == "base.yaml":
                continue  # abstract bases need not name a task
            kind = cfg.get("task_cls", "head")
            assert kind in TASK_REGISTRY, f"{path}: unknown task_cls {kind!r}"
    finally:
        os.chdir(old)


def test_may_non_sr_variants_match_reference_surface():
    """The May identity ships the same 4 radnerf configs as the reference
    (head / head+SR / torso / torso+SR, egs/datasets/May/)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    may = os.path.join(repo, "egs", "datasets", "May")
    old = os.getcwd()
    os.chdir(repo)
    try:
        head = load_config(os.path.join(may, "lm3d_radnerf.yaml"))
        torso = load_config(os.path.join(may, "lm3d_radnerf_torso.yaml"))
    finally:
        os.chdir(old)
    assert head.get("with_sr", False) is False and head["task_cls"] == "head"
    assert torso.get("with_sr", True) is False and torso["task_cls"] == "torso"
    assert torso["head_model_dir"]


def test_override_type_coercion_fails_loudly():
    """Junk values for typed keys raise (reference hparams.py:130-162
    casts overrides to the existing value's type)."""
    cfg = {"lr": 0.1, "flag": True, "name": "x"}
    with pytest.raises(ValueError):
        apply_overrides(dict(cfg), "lr==bad")
    with pytest.raises(ValueError):
        apply_overrides(dict(cfg), "flag=maybe")
    with pytest.raises(ValueError):
        apply_overrides(dict(cfg), "=3")
    out = apply_overrides(dict(cfg), "name=7,lr=1e-3,flag=false")
    assert out["name"] == "7" or out["name"] == 7  # untyped strings stay lenient
    assert out["lr"] == 1e-3 and out["flag"] is False


def test_fourier_capacity_roundtrip(tmp_path):
    """The ckpt-dir-carries-config contract must rebuild a capacity-ablated
    field (fourier_pos_features/max_scale != defaults) exactly — the
    round-5 ablation legs depend on it (scripts/quality_production.py
    GFPP_FOURIER_POS_FEATURES knob; defaults in models/radnerf.py)."""
    from genefaceplusplus_tpu.models.radnerf import RADNeRFConfig

    save_config({"grid_type": "fourier", "fourier_pos_features": 256,
                 "fourier_pos_max_scale": 256.0,
                 "individual_embedding_num": 7}, str(tmp_path))
    hp = set_hparams(work_dir=str(tmp_path))
    cfg = RADNeRFConfig.from_hparams(hp)
    assert cfg.fourier_pos_features == 256
    assert cfg.fourier_pos_max_scale == 256.0
    assert cfg.individual_embedding_num == 7
    # defaults stay defaults when the keys are absent
    save_config({"grid_type": "fourier"}, str(tmp_path / "plain"))
    cfg2 = RADNeRFConfig.from_hparams(set_hparams(work_dir=str(tmp_path / "plain")))
    assert cfg2.fourier_pos_features == 128
    assert cfg2.fourier_pos_max_scale == 128.0
