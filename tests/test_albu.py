"""Albu pipeline transform on the in-repo mini-albumentations backend
(reference transforms.py:705-817; package absent from the image)."""
import numpy as np
import pytest

from hvrnet_tpu.data.albu_mini import AlbuCompose, build_albu
from hvrnet_tpu.data.pipelines import Albu


def data(img=None, boxes=None):
    if img is None:
        img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    d = dict(image=img,
             bboxes=np.asarray(boxes if boxes is not None
                               else [[1, 1, 3, 3]], np.float32))
    return d


def test_horizontal_flip_bboxes():
    t = build_albu(dict(type="HorizontalFlip", p=1.0))
    out = t(data())
    np.testing.assert_array_equal(out["image"],
                                  np.arange(72, dtype=np.uint8)
                                  .reshape(4, 6, 3)[:, ::-1])
    np.testing.assert_allclose(out["bboxes"], [[3, 1, 5, 3]])  # w=6


def test_rotate90_bbox_roundtrip():
    img = np.random.default_rng(0).integers(0, 255, (4, 6, 3)).astype(np.uint8)
    t = build_albu(dict(type="RandomRotate90", p=1.0))
    np.random.seed(3)   # draws k
    out = t(dict(image=img.copy(), bboxes=np.asarray([[1., 1., 3., 2.]])))
    k = out["image"].shape[:2] != img.shape[:2] or not np.array_equal(
        out["image"], img)
    # whatever k was drawn, box corners must land on the rotated pixels:
    # verify by rotating a mask the same way
    mask = np.zeros(img.shape[:2], np.uint8)
    mask[1:2, 1:3] = 1
    np.random.seed(3)
    out2 = build_albu(dict(type="RandomRotate90", p=1.0))(
        dict(image=mask[..., None], bboxes=np.zeros((0, 4), np.float32)))
    rm = out2["image"][..., 0]
    ys, xs = np.nonzero(rm)
    b = out["bboxes"][0]
    assert b[0] <= xs.min() and xs.max() < b[2]
    assert b[1] <= ys.min() and ys.max() < b[3]


def test_shift_scale_rotate_pure_shift():
    np.random.seed(0)
    t = build_albu(dict(type="ShiftScaleRotate", shift_limit=(0.5, 0.5),
                        scale_limit=(0.0, 0.0), rotate_limit=(0.0, 0.0),
                        p=1.0))
    img = np.zeros((8, 8, 3), np.uint8)
    out = t(dict(image=img, bboxes=np.asarray([[0., 0., 2., 2.]])))
    np.testing.assert_allclose(out["bboxes"], [[4, 4, 6, 6]], atol=1e-4)


def test_oneof_applies_exactly_one():
    np.random.seed(1)
    t = build_albu(dict(type="OneOf", p=1.0, transforms=[
        dict(type="HorizontalFlip", p=1.0),
        dict(type="VerticalFlip", p=1.0)]))
    img = np.arange(72, dtype=np.uint8).reshape(4, 6, 3)
    out = t(data(img.copy()))
    flipped_h = np.array_equal(out["image"], img[:, ::-1])
    flipped_v = np.array_equal(out["image"], img[::-1])
    assert flipped_h != flipped_v   # exactly one applied


def test_compose_min_visibility_filters():
    comp = AlbuCompose(
        [dict(type="ShiftScaleRotate", shift_limit=(0.75, 0.75),
              scale_limit=(0., 0.), rotate_limit=(0., 0.), p=1.0)],
        bbox_params=dict(format="pascal_voc", min_visibility=0.5,
                         label_fields=["labels"]))
    np.random.seed(0)
    out = comp(image=np.zeros((8, 8, 3), np.uint8),
               bboxes=np.asarray([[0., 0., 3., 3.],      # shifted out
                                  [0., 0., 8., 8.]]),    # 25% visible
               labels=np.asarray([1, 2]))
    assert len(out["bboxes"]) == 0
    assert len(out["labels"]) == 0


def test_albu_pipeline_transform_end_to_end():
    np.random.seed(0)
    albu = Albu(
        transforms=[
            dict(type="RandomBrightnessContrast", brightness_limit=[0.1, 0.3],
                 contrast_limit=[0.1, 0.3], p=1.0),
            dict(type="ChannelShuffle", p=0.5),
            dict(type="OneOf", transforms=[
                dict(type="Blur", blur_limit=3, p=1.0),
                dict(type="MedianBlur", blur_limit=3, p=1.0)], p=0.5),
        ],
        bbox_params=dict(type="BboxParams", format="pascal_voc",
                         label_fields=["gt_labels"], min_visibility=0.0,
                         filter_lost_elements=True),
        keymap=dict(img="image", gt_bboxes="bboxes"),
        update_pad_shape=False, skip_img_without_anno=True)
    rng = np.random.default_rng(2)
    results = dict(
        img=rng.integers(0, 255, (32, 48, 3)).astype(np.uint8),
        gt_bboxes=np.asarray([[2., 2., 20., 20.], [10., 5., 40., 30.]],
                             np.float32),
        gt_labels=np.asarray([3, 7]))
    out = albu(results)
    assert out is not None
    assert out["img"].shape == (32, 48, 3)
    assert out["gt_bboxes"].shape == (2, 4)
    assert list(out["gt_labels"]) == [3, 7]
    assert out["img_shape"] == (32, 48, 3)


def test_albu_unknown_transform_raises():
    with pytest.raises(KeyError):
        Albu(transforms=[dict(type="ElasticTransform", p=1.0)])


def test_gauss_noise_hsv_shapes():
    for cfg in (dict(type="GaussNoise", var_limit=(5., 10.), p=1.0),
                dict(type="HueSaturationValue", p=1.0)):
        t = build_albu(cfg)
        img = np.random.default_rng(1).integers(0, 255, (6, 6, 3)) \
            .astype(np.uint8)
        out = t(dict(image=img, bboxes=np.zeros((0, 4), np.float32)))
        assert out["image"].shape == img.shape
        assert out["image"].dtype == np.uint8
