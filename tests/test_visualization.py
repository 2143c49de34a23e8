"""Debug visualisation helpers: overlays, error metric, fit video."""

import os

import numpy as np

from genefaceplusplus_tpu.data.visualization import (
    debug_fit_video,
    draw_landmarks,
    landmark_error_px,
    side_by_side,
)


def test_draw_landmarks_normalised_and_pixel():
    img = np.zeros((32, 32, 3), np.uint8)
    out = draw_landmarks(img, np.asarray([[0.5, 0.5]]), color=(255, 0, 0))
    assert out[16, 16, 0] == 255
    out2 = draw_landmarks(img, np.asarray([[8.0, 4.0]]), color=(0, 255, 0))
    assert out2[4, 8, 1] == 255
    assert (img == 0).all()  # input untouched


def test_landmark_error_px():
    # pixel coords: plain L2 mean
    pred = np.asarray([[3.0, 4.0], [10.0, 10.0]])
    gt = np.asarray([[0.0, 0.0] , [10.0, 10.0]]) + 1e3 * 0  # pixel scale
    gt[0] = [0.0, 2.0]  # keep max > 1.5 so no rescale
    err = landmark_error_px(pred, gt, 32, 32)
    expect = (np.linalg.norm([3.0, 2.0]) + 0.0) / 2
    assert abs(err - expect) < 1e-5
    # normalised coords get scaled by [W, H] first
    assert abs(landmark_error_px(np.asarray([[0.5, 0.5]]),
                                 np.asarray([[0.25, 0.5]]), 32, 32) - 8.0) < 1e-5


def test_side_by_side():
    a = np.zeros((8, 4, 3), np.uint8)
    b = np.ones((8, 6, 3), np.uint8)
    out = side_by_side(a, b)
    assert out.shape == (8, 10, 3)


def test_debug_fit_video_end_to_end(tmp_path):
    import cv2
    import jax

    from genefaceplusplus_tpu.data.face3d import Face3DHelper
    from genefaceplusplus_tpu.data.fit_3dmm import fit_3dmm_for_video

    # synthesize a processed dir: frames + detected landmarks + a quick fit
    d = str(tmp_path)
    os.makedirs(os.path.join(d, "gt_imgs"))
    helper = Face3DHelper.synthetic(keypoint_mode="lm68")
    rng = np.random.RandomState(0)
    T = 3
    import jax.numpy as jnp

    ids = jnp.zeros((T, 80))
    exps = jnp.asarray(rng.randn(T, 64) * 0.05, jnp.float32)
    eulers = jnp.zeros((T, 3))
    transs = jnp.zeros((T, 3))
    lm2d = np.asarray(helper.reconstruct_lm2d(ids, exps, eulers, transs))
    np.save(os.path.join(d, "lms_2d.npy"), (lm2d * 64).astype(np.float32))
    np.save(os.path.join(d, "coeff_fit_mp.npy"),
            {"id": np.zeros((T, 80), np.float32),
             "exp": np.asarray(exps, np.float32),
             "euler": np.zeros((T, 3), np.float32),
             "trans": np.zeros((T, 3), np.float32)}, allow_pickle=True)
    for i in range(T):
        cv2.imwrite(os.path.join(d, "gt_imgs", f"{i:08d}.jpg"),
                    rng.randint(0, 255, (64, 64, 3), np.uint8))

    # monkeypatch helper loading onto the synthetic basis
    import genefaceplusplus_tpu.data.visualization as V

    orig = Face3DHelper.load
    Face3DHelper.load = classmethod(lambda cls, *a, **kw: helper)
    try:
        out = debug_fit_video(d)
    finally:
        Face3DHelper.load = orig
    assert os.path.exists(out)
    assert os.path.getsize(out) > 0


def test_draw_camera_trajectory():
    """Top-down camera plot: deterministic shape, draws all poses, highlight
    distinguishable (fit_3dmm_landmark.py:397-451 camera panel equivalent)."""
    import numpy as np

    from genefaceplusplus_tpu.data.visualization import draw_camera_trajectory

    T = 12
    poses = np.tile(np.eye(4, dtype=np.float32), (T, 1, 1))
    ang = np.linspace(-0.4, 0.4, T)
    for i, a in enumerate(ang):
        R = np.asarray([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                        [-np.sin(a), 0, np.cos(a)]], np.float32)
        poses[i, :3, :3] = R
        poses[i, :3, 3] = -2.5 * R @ np.asarray([0, 0, 1], np.float32)

    img = draw_camera_trajectory(poses, size=256, highlight=3)
    assert img.shape == (256, 256, 3) and img.dtype == np.uint8
    # background is dark grey; drawing happened
    assert (img != 24).any()
    img2 = draw_camera_trajectory(poses, size=256, highlight=7)
    assert (img != img2).any()  # highlight moves
