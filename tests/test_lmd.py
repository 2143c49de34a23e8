"""Unit tests for the packaged LMD instrument (metrics/lmd.py).

The reference grades quality with an externally pretrained landmark
detector (paper metrics linked from /root/reference/README.md:3-5); ours
is trained in-repo per identity. These tests cover the package API —
model construction, measurement math, serialization round-trip — not the
training loop (scripts/quality_production.py stage_lmd, exercised by the
production chain).
"""

import numpy as np
import pytest

from genefaceplusplus_tpu.metrics import lmd


def _rand_frames(n=3, size=512, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 255, (n, size, size, 3), dtype=np.uint8)


def test_to_detector_input_resizes_and_scales():
    x = lmd.to_detector_input(_rand_frames(1)[0])
    assert x.shape == (128, 128, 3)
    assert x.dtype == np.float32
    assert 0.0 <= x.min() and x.max() <= 1.0
    # already-128 float input passes through unscaled
    y = lmd.to_detector_input(np.full((128, 128, 3), 0.5, np.float32))
    assert np.allclose(y, 0.5)


def test_detector_shapes_and_conf():
    import jax

    for arch, n_params_min in (("v1", 10), ("v2", 10)):
        det = lmd.lm_detector(arch)
        params = det.init(jax.random.PRNGKey(0), np.zeros((1, 128, 128, 3), np.float32))
        out = det.apply(params, np.zeros((2, 128, 128, 3), np.float32))
        assert out.shape == (2, 136)
    det = lmd.lm_detector("v2", return_conf=True)
    params = det.init(jax.random.PRNGKey(0), np.zeros((1, 128, 128, 3), np.float32))
    out, conf = det.apply(params, np.zeros((2, 128, 128, 3), np.float32))
    assert out.shape == (2, 136) and conf.shape == (2, 68)
    # heatmap peak probability: a valid probability, and for an untrained
    # (near-uniform) map it sits near the 1/(32*32) "no detection" floor
    c = np.asarray(conf)
    assert (c > 0).all() and (c <= 1).all()
    assert c.max() < 0.2


def test_unknown_arch_raises():
    with pytest.raises(ValueError):
        lmd.lm_detector("v3")


def test_detect_lmd_math_and_roundtrip(tmp_path):
    import jax
    from flax import serialization

    det = lmd.lm_detector("v1")
    params = det.init(jax.random.PRNGKey(1), np.zeros((1, 128, 128, 3), np.float32))
    path = str(tmp_path / "det.msgpack")
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(
            serialization.to_state_dict(params)))

    frames = _rand_frames(3)
    # ground truth = the detector's own prediction => error must be ~0
    pred = lmd.detect_lms(frames, path, arch="v1")
    err0 = lmd.detect_lmd(frames, pred, path, arch="v1")
    assert err0 < 1e-3, err0
    # shifting GT by 1/512 in x shifts the error by exactly 1 px at 512
    gt = pred + np.array([1.0 / 512.0, 0.0])
    err1 = lmd.detect_lmd(frames, gt, path, arch="v1")
    assert abs(err1 - 1.0) < 1e-3, err1
    # per-landmark matrix shape
    mat = lmd.detect_lmd(frames, gt, path, arch="v1", per_landmark=True)
    assert mat.shape == (3, 68)
    assert np.allclose(mat, 1.0, atol=1e-3)


def test_detect_lmd_with_conf(tmp_path):
    import jax
    from flax import serialization

    det = lmd.lm_detector("v2", return_conf=True)
    params = det.init(jax.random.PRNGKey(2), np.zeros((1, 128, 128, 3), np.float32))
    path = str(tmp_path / "det2.msgpack")
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(
            serialization.to_state_dict(params)))
    frames = _rand_frames(2)
    gt = np.zeros((2, 68, 2), np.float32)
    err, conf = lmd.detect_lmd(frames, gt, path, arch="v2",
                               per_landmark=True, with_conf=True)
    assert err.shape == (2, 68) and conf.shape == (2, 68)
    assert np.isfinite(err).all()
