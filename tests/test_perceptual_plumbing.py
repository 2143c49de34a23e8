"""Config-driven perceptual weights: the task-level plumbing must reach
PerceptualLoss, never silently fall back to the random surrogate.

Reference mechanism: tasks/radnerfs/losses.py:128-186 builds the vgg19 (+
vggface) LPIPS from pretrained weights; our tasks build their loss through
perceptual_from_task_config(task_cfg) from the hparams surface
(perceptual_arch / vgg_weights_path / vggface_weights_path).
"""

import numpy as np
import pytest
from flax import serialization

from genefaceplusplus_tpu.training.perceptual import (
    PerceptualLoss,
    perceptual_from_task_config,
)
from genefaceplusplus_tpu.training.tasks.head_task import HeadTaskConfig
from genefaceplusplus_tpu.utils.convert_torch_ckpt import convert_vgg19

VGG19_WIDTHS = (64, 64, 128, 128, 256, 256, 256, 256,
                512, 512, 512, 512, 512, 512, 512, 512)
TV_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30, 32, 34)


def _fake_torchvision_vgg19():
    """Synthesize a torchvision-layout vgg19 state dict (random values —
    the test checks plumbing/identity, not ImageNet features)."""
    rng = np.random.RandomState(7)
    state = {}
    in_c = 3
    for tv, out_c in zip(TV_CONV_IDX, VGG19_WIDTHS):
        state[f"features.{tv}.weight"] = (
            rng.randn(out_c, in_c, 3, 3).astype(np.float32) * 0.05)
        state[f"features.{tv}.bias"] = rng.randn(out_c).astype(np.float32) * 0.01
        in_c = out_c
    return state


@pytest.fixture(scope="module")
def vgg_msgpack(tmp_path_factory):
    path = tmp_path_factory.mktemp("vgg") / "vgg19_flax.msgpack"
    variables = convert_vgg19(_fake_torchvision_vgg19())
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(variables))
    return str(path)


def test_weights_path_reaches_the_loss(vgg_msgpack):
    """vgg_weights_path set -> arch becomes vgg19 and the CONVERTED kernels
    are loaded (bitwise), i.e. the random surrogate is NOT silently used."""
    cfg = HeadTaskConfig(vgg_weights_path=vgg_msgpack)
    loss = perceptual_from_task_config(cfg)
    assert loss.arch == "vgg19"
    src = _fake_torchvision_vgg19()
    want = np.transpose(src["features.0.weight"], (2, 3, 1, 0))
    got = np.asarray(loss.params["params"]["Conv_0"]["kernel"])
    np.testing.assert_array_equal(got, want)
    # and it differs from what the random init would have produced
    rand = PerceptualLoss(seed=0, arch="vgg19")
    assert not np.array_equal(
        got, np.asarray(rand.params["params"]["Conv_0"]["kernel"]))


def test_missing_weights_path_fails_loudly(tmp_path):
    cfg = HeadTaskConfig(vgg_weights_path=str(tmp_path / "nope.msgpack"))
    with pytest.raises(FileNotFoundError, match="surrogate"):
        perceptual_from_task_config(cfg)
    cfg2 = HeadTaskConfig(perceptual_arch="vgg19",
                          vggface_weights_path=str(tmp_path / "nor_this.msgpack"))
    with pytest.raises(FileNotFoundError, match="vggface_weights_path"):
        perceptual_from_task_config(cfg2)


def test_default_is_surrogate():
    loss = perceptual_from_task_config(HeadTaskConfig())
    assert loss.arch == "small"


def test_surrogate_vs_vgg19_ab(vgg_msgpack):
    """A/B on a fixture image pair: both backends must behave like a
    perceptual distance (zero at identity, monotone in distortion). The
    absolute scales differ — recorded in docs/DESIGN.md."""
    rng = np.random.RandomState(3)
    img = rng.rand(1, 64, 64, 3).astype(np.float32)
    small = perceptual_from_task_config(HeadTaskConfig())
    vgg = perceptual_from_task_config(HeadTaskConfig(vgg_weights_path=vgg_msgpack))
    for loss in (small, vgg):
        d0 = float(loss(img, img))
        d1 = float(loss(np.clip(img + 0.05 * rng.randn(*img.shape), 0, 1)
                        .astype(np.float32), img))
        d2 = float(loss(np.clip(img + 0.20 * rng.randn(*img.shape), 0, 1)
                        .astype(np.float32), img))
        assert d0 < 1e-5
        assert 0 < d1 < d2
