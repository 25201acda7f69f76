"""ctypes bindings for the native vidmeta annotation scanner.

Loads `native/libvidmeta.so` (built by `native/build.sh`; auto-built on first
use when a toolchain is available).  Falls back transparently — callers use
``parse_xml_fast`` which matches `vid_dataset.parse_vid_xml` semantics
(0-based boxes, 1-based labels).
"""
from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
from typing import Dict, Optional, Tuple

import numpy as np

_LIB = None
_LIB_CLASSES = None
_MAX_OBJ = 256


def _lib_path() -> str:
    root = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))
    return osp.join(root, "native", "libvidmeta.so")


def load_library() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    path = _lib_path()
    if not osp.isfile(path):
        build = osp.join(osp.dirname(path), "build.sh")
        if osp.isfile(build):
            try:
                subprocess.run([build], check=True, capture_output=True,
                               timeout=120)
            except Exception:
                return None
    if not osp.isfile(path):
        return None
    lib = ctypes.CDLL(path)
    lib.vidmeta_set_classes.argtypes = [ctypes.c_char_p]
    lib.vidmeta_parse_xml.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int)]
    lib.vidmeta_parse_xml.restype = ctypes.c_int
    lib.vidmeta_count_objects.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int)]
    lib.vidmeta_count_objects.restype = ctypes.c_int
    _LIB = lib
    return lib


def _ensure_classes(lib, class_to_index: Dict[str, int]):
    """Push the class table (ordered by index) into the library once."""
    global _LIB_CLASSES
    ordered = sorted((i, c) for c, i in class_to_index.items() if i > 0)
    key = tuple(c for _, c in ordered)
    if _LIB_CLASSES != key:
        lib.vidmeta_set_classes("\n".join(key).encode())
        _LIB_CLASSES = key


def parse_xml_fast(xml_path: str, class_to_index: Dict[str, int]):
    """Native-path equivalent of `parse_vid_xml`; returns None when the
    library is unavailable or the file is unreadable."""
    lib = load_library()
    if lib is None:
        return None
    _ensure_classes(lib, class_to_index)
    out = (ctypes.c_int * (_MAX_OBJ * 5))()
    wh = (ctypes.c_int * 2)()
    n = lib.vidmeta_parse_xml(xml_path.encode(), out, _MAX_OBJ, wh)
    if n < 0:
        return None
    arr = np.ctypeslib.as_array(out).reshape(_MAX_OBJ, 5)[:n]
    if n:
        bboxes = arr[:, :4].astype(np.float32) - 1
        labels = arr[:, 4].astype(np.int64)
    else:
        bboxes = np.zeros((0, 4), np.float32)
        labels = np.zeros((0,), np.int64)
    ann = dict(bboxes=bboxes, labels=labels,
               bboxes_ignore=np.zeros((0, 4), np.float32),
               labels_ignore=np.zeros((0,), np.int64))
    return ann, (int(wh[0]), int(wh[1])), int(n)
