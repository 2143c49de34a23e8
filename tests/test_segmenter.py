"""Segmentation-guided data prep: segmap codecs, KNN background, inpainting."""

import numpy as np

from genefaceplusplus_tpu.data import segmenter as S


def _scene(H=48, W=48, fg_col=10):
    """A gradient background with a head-over-torso figure at column fg_col."""
    bg = np.zeros((H, W, 3), np.uint8)
    bg[..., 0] = np.linspace(0, 255, W, dtype=np.uint8)[None, :]
    bg[..., 1] = np.linspace(255, 0, H, dtype=np.uint8)[:, None]
    cat = np.zeros((H, W), np.int64)  # 0 = background
    # head (face-skin=3) rows 8..20, torso (clothes=4) rows 26..47, neck
    # (body-skin=2) rows 20..26 — all in columns fg..fg+12
    c0, c1 = fg_col, fg_col + 12
    cat[8:20, c0:c1] = 3
    cat[20:26, c0:c1] = 2
    cat[26:, c0:c1] = 4
    img = bg.copy()
    img[cat == 3] = (200, 160, 140)
    img[cat == 2] = (180, 140, 120)
    img[cat == 4] = (40, 40, 160)
    return img, S.onehot_from_categories(cat), bg


def test_segmap_codec_roundtrip():
    _, segmap, _ = _scene()
    img = S.encode_segmap_image(segmap)
    back = S.decode_segmap_image(img)
    np.testing.assert_array_equal(segmap, back)


def test_segment_out_modes():
    img, segmap, _ = _scene()
    head, head_mask = S.segment_out(img, segmap, "head")
    torso, torso_mask = S.segment_out(img, segmap, "torso")
    person, person_mask = S.segment_out(img, segmap, "person")
    # head keeps only face rows; torso keeps neck+clothes; person = union
    assert head_mask[10, 15] and not head_mask[30, 15]
    assert torso_mask[30, 15] and torso_mask[22, 15] and not torso_mask[10, 15]
    assert person_mask[10, 15] and person_mask[30, 15] and not person_mask[10, 40]
    assert (head[~head_mask] == 0).all()
    assert (person[person_mask] == img[person_mask]).all()


def test_extract_background_recovers_static_bg():
    # the figure moves, so every pixel is background in some frame
    frames, segmaps = [], []
    true_bg = None
    for col in (2, 16, 30):
        img, segmap, bg = _scene(fg_col=col)
        frames.append(img)
        segmaps.append(segmap)
        true_bg = bg
    out = S.extract_background(frames, segmaps, dist_thresh=3.0, select_interval=1)
    err = np.abs(out.astype(float) - true_bg.astype(float)).mean()
    assert err < 10.0, err
    # and specifically the pixels that were covered in frame 0 are recovered
    assert np.abs(out[30, 8].astype(float) - true_bg[30, 8].astype(float)).max() < 30


def test_inpaint_torso_paints_up_and_darkens():
    img, segmap, _ = _scene()
    out, mask = S.inpaint_torso(img, segmap)
    # the torso/neck region is kept
    assert mask[30, 15] and mask[22, 15]
    # pixels above the original neck top (row 20) get painted (inpainting
    # grows upward into the removed-head area)
    assert mask[16, 15]
    # the painted pixels derive from the below color, geometrically darkened
    assert (out[16, 15] <= np.asarray((180, 140, 120))).all()
    assert out[16, 15].sum() > 0
    # pure background stays zeroed outside the torso mask
    assert (out[~mask] == 0).all()
    # columns away from the figure are never painted
    assert not mask[:, 40].any()


def test_generate_segment_images_writes_all(tmp_path):
    import cv2

    img, segmap, _ = _scene()
    S.generate_segment_images(str(tmp_path), "00000000.jpg", img, segmap)
    for sub in ("segmaps", "head_imgs", "torso_imgs", "person_imgs", "inpaint_torso_imgs"):
        p = tmp_path / sub / "00000000.png"
        assert p.exists(), sub
    # segmap png decodes back exactly
    loaded = S.load_segmap(str(tmp_path / "segmaps" / "00000000.png"))
    np.testing.assert_array_equal(loaded, segmap)
    # RGBA crops carry alpha
    rgba = cv2.imread(str(tmp_path / "head_imgs" / "00000000.png"), cv2.IMREAD_UNCHANGED)
    assert rgba.shape[-1] == 4
    assert rgba[..., 3].max() == 255 and rgba[..., 3].min() == 0
