"""Coordinate-space conversion tests (shrink-and-crop is the metrically
important one: 640x360 -> 480x480 loses 140px per side, the syn-mode
evaluation gap)."""

import numpy as np
import pytest

from sgtapose_tpu.data import image_space as isp


def test_shrink_and_crop_resolution_640x360_to_480():
    cropped, coords = isp.shrink_and_crop_resolution((640, 360), (480, 480))
    assert cropped == (360, 360)
    assert coords == (140, 0)  # the 140px syn gap


def test_raw_netin_round_trip_shrink_and_crop():
    pts = np.array([[320.0, 180.0], [200.0, 100.0], [450.0, 300.0]])
    netin = isp.convert_keypoints_to_netin_from_raw(pts, (640, 360), (480, 480), "shrink-and-crop")
    back = isp.convert_keypoints_to_raw_from_netin(netin, (480, 480), (640, 360), "shrink-and-crop")
    np.testing.assert_allclose(back, pts, atol=1e-9)
    # raw center maps to netin center
    np.testing.assert_allclose(netin[0], [240.0, 240.0], atol=1e-9)


def test_netin_netout_scaling():
    pts = np.array([[480.0, 480.0], [120.0, 240.0]])
    out = isp.convert_keypoints_to_netout_from_netin(pts, (480, 480), (120, 120))
    np.testing.assert_allclose(out, [[120.0, 120.0], [30.0, 60.0]])
    back = isp.convert_keypoints_to_netin_from_netout(out, (120, 120), (480, 480))
    np.testing.assert_allclose(back, pts)


def test_resolution_after_preprocessing():
    assert isp.resolution_after_preprocessing((640, 360), (480, 480), "none") == (640, 360)
    assert isp.resolution_after_preprocessing((640, 360), (480, 480), "resize") == (480, 480)
    assert isp.resolution_after_preprocessing((640, 360), (480, 480), "shrink") == (853, 480)
    assert isp.resolution_after_preprocessing((640, 360), (480, 480), "shrink-and-crop") == (480, 480)


def test_preprocess_image_modes():
    from PIL import Image

    img = Image.new("RGB", (640, 360), (10, 20, 30))
    assert isp.preprocess_image(img, (480, 480), "none").size == (640, 360)
    assert isp.preprocess_image(img, (480, 480), "resize").size == (480, 480)
    assert isp.preprocess_image(img, (480, 480), "shrink").size == (853, 480)
    assert isp.preprocess_image(img, (480, 480), "shrink-and-crop").size == (480, 480)
