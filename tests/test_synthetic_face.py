"""Production-scale synthetic identity: schema, determinism, and the
landmark<->render consistency that makes it usable as quality-parity
evidence (docs/QUALITY_PARITY.md)."""

import numpy as np
import pytest

from genefaceplusplus_tpu.data.dataset import RADNeRFDataset
from genefaceplusplus_tpu.data.synthetic_face import synthetic_face

BINARIZER_KEYS = (
    "bg_img", "H", "W", "focal", "cx", "cy", "id", "exp", "euler", "trans",
    "eye_area_percent", "idexp_lm3d", "idexp_lm3d_mean", "idexp_lm3d_std",
    "hubert", "mel", "f0", "train_samples", "val_samples",
)


@pytest.fixture(scope="module")
def ds_dict():
    return synthetic_face(num_frames=12, size=128)


def test_schema_and_determinism(ds_dict):
    for k in BINARIZER_KEYS:
        assert k in ds_dict, k
    s = ds_dict["train_samples"][0]
    for k in ("idx", "c2w", "face_rect", "lip_rect", "lms", "gt_img", "torso_img"):
        assert k in s, k
    assert s["gt_img"].shape == (128, 128, 3) and s["gt_img"].dtype == np.uint8
    assert s["torso_img"].shape == (128, 128, 4)
    again = synthetic_face(num_frames=12, size=128)
    np.testing.assert_array_equal(again["train_samples"][3]["gt_img"],
                                  ds_dict["train_samples"][3]["gt_img"])
    np.testing.assert_array_equal(again["idexp_lm3d"], ds_dict["idexp_lm3d"])


def test_landmarks_track_the_render(ds_dict):
    """The mouth landmarks and the rendered mouth pixels must move together:
    the frame with the widest jaw opening shows a larger lip-ring vertical
    extent AND darker mouth-interior pixels than the most-closed frame."""
    jaw = ds_dict["exp"][:, 0]
    hi, lo = int(np.argmax(jaw)), int(np.argmin(jaw))
    assert jaw[hi] - jaw[lo] > 0.5, "schedule must exercise the jaw"
    samples = ds_dict["train_samples"] + ds_dict["val_samples"]

    def mouth_height(s):
        ys = s["lms"][48:, 1] * 128
        return ys.max() - ys.min()

    def mouth_darkness(s):
        r0, r1, c0, c1 = s["lip_rect"]
        return s["gt_img"][r0:r1, c0:c1].mean()

    assert mouth_height(samples[hi]) > mouth_height(samples[lo]) + 1.0
    assert mouth_darkness(samples[hi]) < mouth_darkness(samples[lo])


def test_landmarks_on_the_head(ds_dict):
    """Projected landmarks must land on rendered head pixels (not bg): the
    conditioning and the camera convention agree with pixel_rays."""
    s = ds_dict["train_samples"][0]
    bg = ds_dict["bg_img"].astype(np.int16)
    px = np.clip((s["lms"] * 128).astype(int), 0, 127)
    on_head = 0
    for x, y in px:
        if np.abs(s["gt_img"][y, x].astype(np.int16) - bg[y, x]).max() > 12:
            on_head += 1
    assert on_head >= 60, f"only {on_head}/68 landmarks on rendered head"


def test_dataset_integration_and_full_res(ds_dict):
    ds = RADNeRFDataset(ds_dict, split="train", with_sr=True)
    assert ds.H == 64  # SR renders at half res
    gt = ds.load_image(0, "gt")
    assert gt.shape == (64, 64, 3)
    gt2x = ds.load_image(0, "gt", full_res=True)
    assert gt2x.shape == (128, 128, 3)
    # the stored full-res image carries detail an upsample cannot: it must
    # differ from upsampled-gt (the SR target bug this option fixes)
    import cv2

    up = cv2.resize(gt, (128, 128))
    assert np.abs(gt2x - up).max() > 0.05
    # torso-as-background composite exists
    assert ds.frame_bg_torso(0) is not None


def test_blink_closes_eyes(ds_dict):
    """eye_area_percent minima must coincide with visibly changed eye
    pixels (lid texture covers the sclera)."""
    eap = ds_dict["eye_area_percent"][:, 0]
    hi, lo = int(np.argmax(eap)), int(np.argmin(eap))
    assert eap[lo] < 0.1 < eap[hi]
    samples = ds_dict["train_samples"] + ds_dict["val_samples"]

    def eye_patch(s):
        xs = s["lms"][36:42, 0] * 128
        ys = s["lms"][36:42, 1] * 128
        x0, y0 = int(xs.mean()), int(ys.mean())
        return s["gt_img"][max(0, y0 - 3):y0 + 3, max(0, x0 - 4):x0 + 4]

    a, b = eye_patch(samples[hi]), eye_patch(samples[lo])
    assert np.abs(a.astype(np.int16) - b.astype(np.int16)).mean() > 4
