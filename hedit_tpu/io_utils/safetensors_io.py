"""Minimal pure-numpy safetensors reader (no external dependency).

Format: 8-byte little-endian header length, JSON header mapping tensor name ->
{dtype, shape, data_offsets}, then a flat byte buffer.  Sufficient for loading
HF-hub checkpoint files (SD UNet/VAE/CLIP) for the weight port.
"""

from __future__ import annotations

import json
import struct
from typing import Dict

import numpy as np

_DTYPES = {
    "F64": np.float64,
    "F32": np.float32,
    "F16": np.float16,
    "I64": np.int64,
    "I32": np.int32,
    "I16": np.int16,
    "I8": np.int8,
    "U8": np.uint8,
    "BOOL": np.bool_,
    # BF16 has no numpy dtype; widened to float32 on load.
    "BF16": None,
}


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    with open(path, "rb") as f:
        (header_len,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(header_len))
        buf = f.read()
    out: Dict[str, np.ndarray] = {}
    for name, meta in header.items():
        if name == "__metadata__":
            continue
        start, end = meta["data_offsets"]
        raw = buf[start:end]
        shape = meta["shape"]
        dt = meta["dtype"]
        if dt == "BF16":
            u16 = np.frombuffer(raw, dtype=np.uint16)
            arr = (u16.astype(np.uint32) << 16).view(np.float32)
        else:
            arr = np.frombuffer(raw, dtype=_DTYPES[dt])
        out[name] = arr.reshape(shape)
    return out


_DTYPE_NAMES = {
    np.dtype(np.float64): "F64",
    np.dtype(np.float32): "F32",
    np.dtype(np.float16): "F16",
    np.dtype(np.int64): "I64",
    np.dtype(np.int32): "I32",
    np.dtype(np.int16): "I16",
    np.dtype(np.int8): "I8",
    np.dtype(np.uint8): "U8",
    np.dtype(np.bool_): "BOOL",
}


def save_safetensors(path: str, tensors: Dict[str, np.ndarray],
                     bf16_keys=()) -> None:
    """Write the safetensors container (header-length + JSON header + flat
    buffer).  ``bf16_keys``: tensor names stored as BF16 (truncated from f32
    by dropping the low mantissa bits) — numpy has no bf16, so the round-trip
    through ``load_safetensors`` widens them back to f32.  Used to serialize
    converted/test checkpoints and to exercise the BF16 load path."""
    header = {}
    chunks = []
    offset = 0
    for name, arr in tensors.items():
        arr = np.ascontiguousarray(arr)
        if name in bf16_keys:
            u32 = arr.astype(np.float32).view(np.uint32)
            raw = (u32 >> 16).astype(np.uint16).tobytes()
            dt = "BF16"
        else:
            raw = arr.tobytes()
            dt = _DTYPE_NAMES[arr.dtype]
        header[name] = {
            "dtype": dt,
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + len(raw)],
        }
        chunks.append(raw)
        offset += len(raw)
    hdr = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hdr)))
        f.write(hdr)
        for c in chunks:
            f.write(c)
