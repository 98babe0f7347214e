"""utils/debugger.py — the task-reachable Debugger surface (C26).

Capability tests for every call the reference detector debug path makes
(ref sgta_detector.py:960-1032): registry, colormaps, blends, keypoint /
arrow / id annotations, mask, save_all_imgs.
"""

import os

import numpy as np
import pytest

from sgtapose_tpu.utils.debugger import Debugger


@pytest.fixture
def img():
    rng = np.random.RandomState(0)
    return rng.randint(0, 255, (48, 64, 3), np.uint8)


def test_registry_and_save(tmp_path, img):
    d = Debugger(num_classes=7)
    d.add_img(img, "generic")
    assert d.imgs["generic"].shape == (48, 64, 3)
    d.add_img(img, "rev", revert_color=True)
    np.testing.assert_array_equal(d.imgs["rev"], 255 - img)
    d.save_all_imgs(str(tmp_path), prefix="f0_")
    assert sorted(os.listdir(tmp_path)) == ["f0_generic.png", "f0_rev.png"]
    p = d.save_img("generic", str(tmp_path))
    assert os.path.exists(p)
    d.clear()
    assert d.imgs == {}


def test_colormap_shapes_and_peaks(img):
    d = Debugger(num_classes=7)
    hm = np.zeros((12, 16, 7), np.float32)
    hm[4, 5, 2] = 1.0
    cm = d.gen_colormap(hm, output_res=(64, 48))
    assert cm.shape == (48, 64, 3) and cm.dtype == np.uint8
    # the peak pixel region carries class 2's color, the rest is black
    assert cm.max() > 100 and cm[0, 0].sum() == 0
    # channel-first input accepted too (ref passes (C, H, W)) — explicit flag
    cm2 = d.gen_colormap(np.moveaxis(hm, -1, 0), channel_first=True)
    assert cm2.shape == (12, 16, 3)
    np.testing.assert_array_equal(cm2, d.gen_colormap(hm))
    cm_hp = d.gen_colormap_hp(hm)
    assert cm_hp.shape == (12, 16, 3)
    # hp palette is rolled: peak color differs from the hm palette's
    assert not np.array_equal(cm_hp[4, 5], cm2[4, 5])


def test_blend_and_mask(img):
    d = Debugger()
    fore = np.zeros((12, 16, 3), np.uint8)
    fore[..., 0] = 255
    d.add_blend_img(img, fore, "blend", trans=0.7)
    b = d.imgs["blend"]
    assert b.shape == img.shape
    # red channel lifted towards 0.3*255, others darkened
    assert b[..., 0].mean() > img[..., 0].mean() * 0.7
    mask = np.zeros((48, 64)); mask[:10] = 1
    d.add_mask(mask, img, "mask")
    assert d.imgs["mask"].shape == img.shape


def test_annotations(img):
    d = Debugger(num_classes=7)
    d.add_img(img, "generic")
    before = d.imgs["generic"].copy()
    kps = np.array([[10.0, 10.0], [-999.999, -999.999], [40.0, 30.0]])
    d.add_keypoints(kps, "generic", scores=np.array([0.9, -1.0, 0.8]))
    d.add_arrow((10, 10), (15, 5), "generic")
    d.add_tracking_id((40, 30), 3, "generic")
    after = d.imgs["generic"]
    assert (after != before).any()
    assert after.shape == before.shape
    with pytest.raises(KeyError):
        d.add_keypoints(kps, "nonexistent")
