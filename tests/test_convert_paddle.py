"""Tests for the offline Paddle weight extractor on the one real weights file
shipped in the reference snapshot (V3 ch_det_fast; everything else is
LFS-stripped, SURVEY.md §2.5)."""

import os
import struct

import numpy as np
import pytest

import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import convert_paddle  # noqa: E402

REF_DIR = "/root/reference/backend/models/V3/ch_det_fast"


def _write_tensor(buf, arr):
    buf += struct.pack("<I", 0)  # lod version
    buf += struct.pack("<Q", 0)  # lod level
    buf += struct.pack("<I", 0)  # tensor version
    # TensorDesc proto: field1 varint dtype=5 (fp32), field2 packed dims
    dims = b""
    for d in arr.shape:
        v = d
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                dims += bytes([b | 0x80])
            else:
                dims += bytes([b])
                break
    proto = bytes([0x08, 0x05, 0x12, len(dims)]) + dims
    buf += struct.pack("<i", len(proto))
    buf += proto
    buf += arr.astype(np.float32).tobytes()
    return buf


def test_parse_synthetic_stream(tmp_path):
    a = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    b = np.ones((5,), np.float32) * 7
    buf = b""
    buf = _write_tensor(buf, a)
    buf = _write_tensor(buf, b)
    p = tmp_path / "inference.pdiparams"
    p.write_bytes(buf)
    tensors = convert_paddle.parse_pdiparams(str(p))
    assert len(tensors) == 2
    np.testing.assert_array_equal(tensors[0], a)
    np.testing.assert_array_equal(tensors[1], b)


@pytest.mark.skipif(not os.path.exists(REF_DIR), reason="reference not mounted")
def test_convert_real_det_weights():
    weights = convert_paddle.convert(REF_DIR)
    assert len(weights) == 288
    # the stream must align: bn stats are 1-D, conv kernels 4-D
    for k, v in weights.items():
        if k.endswith(("bn.weight", "bn.bias", "bn._mean", "bn._variance")):
            assert v.ndim == 1, k
        if k.endswith("conv.weight"):
            assert v.ndim == 4, k
    # known architecture facts of the PP-OCRv3 mobile det:
    assert weights["backbone.conv.conv.weight"].shape[1] == 3  # RGB stem
    assert all(not k.startswith("head.thresh") for k in weights)  # pruned
    # bn variances must be positive (catches misaligned pairing)
    assert (weights["backbone.conv.bn._variance"] > 0).all()
