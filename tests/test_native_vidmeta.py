"""Native C++ XML scanner vs the ElementTree reference parser."""
import os.path as osp
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from hvrnet_tpu.data.native import load_library, parse_xml_fast
from hvrnet_tpu.data.vid_dataset import VID_WNIDS


def write_xml(path, w, h, objs):
    root = ET.Element("annotation")
    size = ET.SubElement(root, "size")
    ET.SubElement(size, "width").text = str(w)
    ET.SubElement(size, "height").text = str(h)
    for name, box in objs:
        obj = ET.SubElement(root, "object")
        ET.SubElement(obj, "name").text = name
        # VID XMLs carry extra tags the scanner must skip
        ET.SubElement(obj, "trackid").text = "0"
        ET.SubElement(obj, "occluded").text = "1"
        bnd = ET.SubElement(obj, "bndbox")
        for k, v in zip(("xmax", "xmin", "ymax", "ymin"),
                        (box[2], box[0], box[3], box[1])):
            ET.SubElement(bnd, k).text = str(v)
    ET.ElementTree(root).write(path)


@pytest.mark.skipif(load_library() is None,
                    reason="native library unavailable (no toolchain)")
def test_native_parse_matches_elementtree(tmp_path):
    class_to_index = {c: i + 1 for i, c in enumerate(VID_WNIDS)}
    class_to_index["__background__"] = 0
    p = str(tmp_path / "f.xml")
    write_xml(p, 640, 360, [("n02691156", (10, 20, 200, 180)),
                            ("n02958343", (5, 6, 50, 60)),
                            ("unknown_wnid", (1, 1, 9, 9))])  # skipped
    out = parse_xml_fast(p, class_to_index)
    assert out is not None
    ann, (w, h), n = out
    assert (w, h) == (640, 360)
    assert n == 2
    np.testing.assert_array_equal(ann["bboxes"][0], [9, 19, 199, 179])
    np.testing.assert_array_equal(ann["labels"], [1, 7])


@pytest.mark.skipif(load_library() is None,
                    reason="native library unavailable")
def test_native_parse_empty(tmp_path):
    class_to_index = {c: i + 1 for i, c in enumerate(VID_WNIDS)}
    p = str(tmp_path / "empty.xml")
    write_xml(p, 100, 80, [])
    ann, wh, n = parse_xml_fast(p, class_to_index)
    assert n == 0
    assert ann["bboxes"].shape == (0, 4)


@pytest.mark.skipif(load_library() is None,
                    reason="native library unavailable")
def test_native_missing_file():
    class_to_index = {c: i + 1 for i, c in enumerate(VID_WNIDS)}
    assert parse_xml_fast("/nonexistent/file.xml", class_to_index) is None
