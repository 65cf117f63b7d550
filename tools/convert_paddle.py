#!/usr/bin/env python
"""Offline Paddle-inference -> numpy/JAX weight extractor.

Replaces the reference's *runtime* model conversion (reference
backend/tools/paddle_model_config.py:108-151 converts Paddle->ONNX on first
use) with an *offline* one-shot extraction that needs neither paddle nor
onnx: the combined `inference.pdiparams` stream is parsed directly
(per-tensor: u32 version, u64 lod-level, u32 tensor version, i32 proto len,
VarType.TensorDesc proto {data_type, dims}, raw data), and parameter names
come from the pickled `inference.pdiparams.info` sidecar (original name ->
structured_name like 'backbone.conv.conv.weight').

Usage:
  python tools/convert_paddle.py <model_dir> -o weights.npz

The npz maps structured names to arrays; a separate per-architecture mapping
loads them into flax param trees (round-2 work: PP-OCR-compatible module
naming).
"""

from __future__ import annotations

import argparse
import os
import pickle
import struct
import sys
from typing import Dict, List, Tuple

import numpy as np

# paddle VarType.Type data_type enum -> numpy dtype (subset)
PADDLE_DTYPES = {
    0: np.bool_,   # BOOL
    1: np.int16,   # INT16
    2: np.int32,   # INT32
    3: np.int64,   # INT64
    4: np.float16, # FP16
    5: np.float32, # FP32
    6: np.float64, # FP64
    20: np.uint8,  # UINT8
    21: np.int8,   # INT8
}


def _read_varint(buf: bytes, i: int) -> Tuple[int, int]:
    val = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        shift += 7
        if not b & 0x80:
            return val, i


def _parse_tensor_desc(proto: bytes) -> Tuple[int, List[int]]:
    """Minimal protobuf walk of VarType.TensorDesc: field 1 = data_type
    (varint), field 2 = dims (repeated int64, packed or unpacked)."""
    i = 0
    dtype = None
    dims: List[int] = []
    while i < len(proto):
        key = proto[i]
        i += 1
        fieldno, wt = key >> 3, key & 7
        if wt == 0:
            val, i = _read_varint(proto, i)
            if fieldno == 1:
                dtype = val
            elif fieldno == 2:
                dims.append(val)
        elif wt == 2:
            ln, i = _read_varint(proto, i)
            sub = proto[i : i + ln]
            i += ln
            if fieldno == 2:
                j = 0
                while j < len(sub):
                    val, j = _read_varint(sub, j)
                    dims.append(val)
        else:
            raise ValueError(f"unexpected wire type {wt} (field {fieldno})")
    if dtype is None:
        raise ValueError("TensorDesc without data_type")
    return dtype, dims


def parse_pdiparams(path: str) -> List[np.ndarray]:
    """Parse a combined params stream into tensors (file order)."""
    with open(path, "rb") as f:
        data = f.read()
    off = 0
    tensors: List[np.ndarray] = []
    while off < len(data):
        ver = struct.unpack_from("<I", data, off)[0]
        off += 4
        lod_level = struct.unpack_from("<Q", data, off)[0]
        off += 8
        if ver != 0 or lod_level != 0:
            raise ValueError(f"unsupported tensor header at {off}: {ver}/{lod_level}")
        off += 4  # tensor version
        plen = struct.unpack_from("<i", data, off)[0]
        off += 4
        dtype_id, dims = _parse_tensor_desc(data[off : off + plen])
        off += plen
        np_dtype = PADDLE_DTYPES.get(dtype_id)
        if np_dtype is None:
            raise ValueError(f"unsupported paddle dtype {dtype_id}")
        n = int(np.prod(dims)) if dims else 1
        nbytes = n * np.dtype(np_dtype).itemsize
        arr = np.frombuffer(data, np_dtype, count=n, offset=off).reshape(dims)
        off += nbytes
        tensors.append(arr)
    return tensors


def load_info(path: str) -> Dict[str, str]:
    """pdiparams.info: original var name -> structured name."""
    with open(path, "rb") as f:
        info = pickle.load(f)
    return {k: v.get("structured_name", k) for k, v in info.items()}


def convert(model_dir: str) -> Dict[str, np.ndarray]:
    params_path = os.path.join(model_dir, "inference.pdiparams")
    info_path = params_path + ".info"
    model_path = os.path.join(model_dir, "inference.pdmodel")
    tensors = parse_pdiparams(params_path)
    out: Dict[str, np.ndarray] = {}
    if os.path.exists(info_path):
        names = load_info(info_path)
        ordered = sorted(names)
        if len(ordered) != len(tensors) and os.path.exists(model_path):
            # the inference program prunes branches (e.g. the DB thresh head);
            # pruned vars stay in .info but not in the stream. The program
            # proto names every persistable var it uses — filter against it.
            with open(model_path, "rb") as f:
                program = f.read()
            ordered = sorted(n for n in names if n.encode() in program)
        if len(ordered) != len(tensors):
            raise ValueError(
                f"cannot align {len(tensors)} tensors with {len(ordered)} names"
            )
        for name, arr in zip(ordered, tensors):
            out[names[name]] = arr
    else:
        for i, arr in enumerate(tensors):
            out[f"param_{i}"] = arr
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model_dir")
    ap.add_argument("-o", "--output", default=None)
    args = ap.parse_args()
    weights = convert(args.model_dir)
    out = args.output or os.path.join(args.model_dir, "weights.npz")
    np.savez(out, **weights)
    total = sum(v.size for v in weights.values())
    print(f"extracted {len(weights)} tensors ({total:,} params) -> {out}")


if __name__ == "__main__":
    main()
