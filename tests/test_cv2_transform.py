"""cv2_transform parity tests (reference ``lib/datasets/cv2_transform.py``):
box arithmetic, short-side scale rounding, crop geometry, photometric ops."""

import numpy as np
import pytest

from procedurevrl_tpu.datasets import cv2_transform as cvt


def test_scale_short_side_floor_rounding():
    img = np.zeros((100, 50, 3), np.float32)
    out = cvt.scale(30, img)
    # width < height: new_h = floor(100/50 * 30) = 60
    assert out.shape == (60, 30, 3)
    # no-op when short side already == size
    same = np.zeros((40, 30, 3), np.float32)
    assert cvt.scale(30, same) is same


def test_scale_boxes_matches_image_factor():
    boxes = np.array([[10.0, 20.0, 30.0, 40.0]])
    out = cvt.scale_boxes(30, boxes, height=100, width=50)
    np.testing.assert_allclose(out, boxes * (60.0 / 100.0))


def test_flip_boxes_mirror():
    boxes = np.array([[10.0, 5.0, 20.0, 15.0]])
    out = cvt.flip_boxes(boxes, im_width=100)
    np.testing.assert_allclose(out, [[100 - 20 - 1, 5.0, 100 - 10 - 1, 15.0]])
    # involution up to the -1 convention: flipping twice restores
    np.testing.assert_allclose(cvt.flip_boxes(out, 100), boxes)


def test_clip_boxes_to_image():
    boxes = np.array([[-5.0, -3.0, 150.0, 90.0]])
    out = cvt.clip_boxes_to_image(boxes, height=80, width=120)
    np.testing.assert_allclose(out, [[0.0, 0.0, 119.0, 79.0]])


def test_spatial_shift_crop_positions_and_boxes():
    imgs = [np.arange(8 * 6 * 3, dtype=np.float32).reshape(8, 6, 3)]
    boxes = [np.array([[2.0, 3.0, 4.0, 5.0]])]
    # height > width: shift moves y; size 6 -> offsets 0 / 1 / 2
    left, b0 = cvt.spatial_shift_crop_list(6, imgs, 0, [boxes[0].copy()])
    mid, b1 = cvt.spatial_shift_crop_list(6, imgs, 1, [boxes[0].copy()])
    right, b2 = cvt.spatial_shift_crop_list(6, imgs, 2, [boxes[0].copy()])
    np.testing.assert_array_equal(left[0], imgs[0][0:6])
    np.testing.assert_array_equal(mid[0], imgs[0][1:7])
    np.testing.assert_array_equal(right[0], imgs[0][2:8])
    # boxes shift by (x_offset=0, y_offset)
    np.testing.assert_allclose(b1[0], [[2.0, 2.0, 4.0, 4.0]])


def test_random_crop_list_shared_offsets_and_boxes():
    rng = np.random.RandomState(0)
    imgs = [np.random.RandomState(i).rand(3, 10, 12).astype(np.float32)
            for i in range(4)]
    boxes = [np.array([[4.0, 5.0, 8.0, 9.0]]) for _ in range(4)]
    out, out_boxes = cvt.random_crop_list(imgs, 8, order="CHW",
                                          boxes=boxes, rng=rng)
    assert all(o.shape == (3, 8, 8) for o in out)
    # all frames share one offset: recover it from frame 0 and verify frame 3
    dy = dx = None
    for y in range(3):
        for x in range(5):
            if np.array_equal(imgs[0][:, y:y + 8, x:x + 8], out[0]):
                dy, dx = y, x
    assert dy is not None
    np.testing.assert_array_equal(imgs[3][:, dy:dy + 8, dx:dx + 8], out[3])
    np.testing.assert_allclose(out_boxes[0],
                               [[4.0 - dx, 5.0 - dy, 8.0 - dx, 9.0 - dy]])


def test_grayscale_bgr_luminance():
    img = np.zeros((3, 2, 2), np.float32)
    img[0] = 1.0  # B
    img[1] = 2.0  # G
    img[2] = 3.0  # R
    gray = cvt.grayscale(img)
    lum = 0.299 * 3.0 + 0.587 * 2.0 + 0.114 * 1.0
    np.testing.assert_allclose(gray, np.full((3, 2, 2), lum), rtol=1e-6)


def test_brightness_contrast_saturation_alpha_semantics():
    img = np.full((3, 2, 2), 2.0, np.float32)

    class FixedRng:
        def uniform(self, a=0.0, b=1.0, size=None):
            return 0.5 if size is None else np.full(size, 0.5)

    # alpha = 1.5: brightness blends toward zeros -> 2*1.5 + 0*(-.5)
    out = cvt.brightness(1.0, img, rng=FixedRng())
    np.testing.assert_allclose(out, np.full_like(img, 3.0))
    # saturation of a uniform gray image is identity for any alpha
    out = cvt.saturation(1.0, img, rng=FixedRng())
    np.testing.assert_allclose(out, img, rtol=1e-6)


def test_lighting_list_bgr_index_order():
    eigval = [0.2175, 0.0188, 0.0045]
    eigvec = [[-0.5675, 0.7192, 0.4009],
              [-0.5808, -0.0045, -0.8140],
              [-0.5836, -0.6948, 0.4203]]
    alpha = np.array([[0.1, -0.2, 0.3]])
    img = np.zeros((3, 2, 2), np.float32)
    out = cvt.lighting_list([img.copy()], 0.1, eigval, eigvec, alpha=alpha)[0]
    rgb = np.sum(np.array(eigvec) * np.repeat(alpha, 3, 0)
                 * np.repeat(np.reshape(eigval, (1, 3)), 3, 0), axis=1)
    for idx in range(3):
        np.testing.assert_allclose(out[idx], np.full((2, 2), rgb[2 - idx]),
                                   rtol=1e-6)


def test_center_crop_and_pad():
    img = np.arange(7 * 9 * 3, dtype=np.float32).reshape(7, 9, 3)
    out = cvt.center_crop(5, img)
    np.testing.assert_array_equal(out, img[1:6, 2:7])
    padded = cvt.pad_image(np.zeros((3, 4, 4), np.float32), 2, order="CHW")
    assert padded.shape == (3, 8, 8)


def test_random_sized_crop_list_shared_geometry():
    rng = np.random.RandomState(1)
    imgs = [np.random.RandomState(i).rand(16, 16, 3).astype(np.float32)
            for i in range(3)]
    out = cvt.random_sized_crop_list(imgs, 8, rng=rng)
    assert all(o.shape == (8, 8, 3) for o in out)


def test_revert_scaled_boxes():
    boxes = np.array([[2.0, 2.0, 4.0, 4.0]])
    out = cvt.revert_scaled_boxes(4, boxes, img_height=16, img_width=32)
    np.testing.assert_allclose(out, boxes * 4.0)
