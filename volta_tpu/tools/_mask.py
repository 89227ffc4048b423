"""ctypes bindings for the native RLE mask codec (+ polygon rasterizer).

reference: tools/refer/external/maskApi.c and _mask.pyx (Cython). The C++
library is compiled on first use and cached next to the source; a pure-numpy
fallback covers environments without a compiler.

RLE objects are dicts {"size": [h, w], "counts": str|bytes|list} like
pycocotools. Masks are uint8 [h, w] arrays (decoded from the column-major
runs, returned C-order).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, List, Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(os.path.dirname(os.path.dirname(_HERE)), "native",
                    "maskrle.cpp")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so_path = os.path.join(os.path.dirname(_SRC), "libmaskrle.so")
    try:
        if not os.path.exists(so_path) or \
                os.path.getmtime(so_path) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", _SRC, "-o", so_path],
                check=True, capture_output=True)
        lib = ctypes.CDLL(so_path)
        u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        lib.rle_decode.argtypes = [u32p, ctypes.c_int64, u8p, ctypes.c_int64]
        lib.rle_encode.restype = ctypes.c_int64
        lib.rle_encode.argtypes = [u8p, ctypes.c_int64, u32p, ctypes.c_int64]
        lib.rle_area.restype = ctypes.c_uint64
        lib.rle_area.argtypes = [u32p, ctypes.c_int64]
        lib.rle_to_bbox.argtypes = [u32p, ctypes.c_int64, ctypes.c_int64,
                                    f64p]
        lib.rle_merge.restype = ctypes.c_int64
        lib.rle_merge.argtypes = [u32p, i64p, i64p, ctypes.c_int64,
                                  ctypes.c_int64, ctypes.c_int,
                                  u32p, ctypes.c_int64]
        lib.rle_fr_string.restype = ctypes.c_int64
        lib.rle_fr_string.argtypes = [ctypes.c_char_p, u32p, ctypes.c_int64]
        lib.rle_to_string.restype = ctypes.c_int64
        lib.rle_to_string.argtypes = [u32p, ctypes.c_int64, ctypes.c_char_p,
                                      ctypes.c_int64]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


# ----------------------------------------------------------------- helpers
def _counts_array(rle: Dict) -> np.ndarray:
    counts = rle["counts"]
    if isinstance(counts, (bytes, str)):
        s = counts.encode() if isinstance(counts, str) else counts
        lib = _load()
        buf = np.zeros(len(s) + 2, np.uint32)
        if lib is not None:
            m = lib.rle_fr_string(s, buf, len(buf))
            if m < 0:
                raise ValueError("counts overflow")
            return buf[:m]
        return _fr_string_py(s)
    return np.asarray(counts, np.uint32)


def _fr_string_py(s: bytes) -> np.ndarray:
    counts = []
    p = 0
    while p < len(s):
        x, k, more = 0, 0, True
        while more:
            c = s[p] - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            p += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return np.asarray(counts, np.uint32)


# --------------------------------------------------------------------- API
def decode(rle: Dict) -> np.ndarray:
    """RLE -> uint8 mask [h, w]."""
    h, w = rle["size"]
    counts = np.ascontiguousarray(_counts_array(rle))
    flat = np.zeros(h * w, np.uint8)
    lib = _load()
    if lib is not None:
        lib.rle_decode(counts, len(counts), flat, h * w)
    else:
        pos, val = 0, 0
        for run in counts:
            flat[pos: pos + int(run)] = val
            pos += int(run)
            val = 1 - val
    return flat.reshape(w, h).T  # column-major runs


def encode(mask: np.ndarray) -> Dict:
    """uint8 mask [h, w] -> RLE with raw counts list."""
    h, w = mask.shape
    flat = np.ascontiguousarray(mask.T.reshape(-1).astype(np.uint8))
    lib = _load()
    if lib is not None:
        buf = np.zeros(h * w + 2, np.uint32)
        m = lib.rle_encode(flat, h * w, buf, len(buf))
        counts = buf[:m]
    else:
        change = np.flatnonzero(np.diff(flat)) + 1
        edges = np.concatenate([[0], change, [flat.size]])
        counts = np.diff(edges).astype(np.uint32)
        if flat[0] == 1:
            counts = np.concatenate([[0], counts]).astype(np.uint32)
    return {"size": [h, w], "counts": counts.tolist()}


def area(rle: Dict) -> int:
    counts = np.ascontiguousarray(_counts_array(rle))
    lib = _load()
    if lib is not None:
        return int(lib.rle_area(counts, len(counts)))
    return int(counts[1::2].sum())


def to_bbox(rle: Dict) -> np.ndarray:
    h, _ = rle["size"]
    counts = np.ascontiguousarray(_counts_array(rle))
    lib = _load()
    if lib is not None:
        out = np.zeros(4, np.float64)
        lib.rle_to_bbox(counts, len(counts), h, out)
        return out
    mask = decode(rle)
    ys, xs = np.nonzero(mask)
    if len(xs) == 0:
        return np.zeros(4)
    return np.array([xs.min(), ys.min(), xs.max() - xs.min() + 1,
                     ys.max() - ys.min() + 1], np.float64)


def merge(rles: List[Dict], intersect: bool = False) -> Dict:
    if not rles:
        raise ValueError("empty merge")
    h, w = rles[0]["size"]
    counts_list = [np.ascontiguousarray(_counts_array(r)) for r in rles]
    lib = _load()
    if lib is not None:
        all_counts = np.concatenate(counts_list).astype(np.uint32)
        lengths = np.array([len(c) for c in counts_list], np.int64)
        offsets = np.concatenate([[0], np.cumsum(lengths)[:-1]]).astype(
            np.int64)
        out = np.zeros(int(all_counts.sum()) + 8, np.uint32)
        m = lib.rle_merge(all_counts, offsets, lengths, len(rles), h * w,
                          int(intersect), out, len(out))
        if m >= 0:
            return {"size": [h, w], "counts": out[:m].tolist()}
    masks = [decode(r) for r in rles]
    acc = masks[0]
    for mk in masks[1:]:
        acc = (acc & mk) if intersect else (acc | mk)
    return encode(acc)


def fr_poly(polys: List[List[float]], h: int, w: int) -> List[Dict]:
    """Polygon(s) -> RLE via even-odd scanline rasterisation at pixel
    centres (host-side data prep; reference: maskApi.c rleFrPoly)."""
    out = []
    for poly in polys:
        xy = np.asarray(poly, np.float64).reshape(-1, 2)
        mask = _rasterize(xy, h, w)
        out.append(encode(mask))
    return out


def _rasterize(xy: np.ndarray, h: int, w: int) -> np.ndarray:
    mask = np.zeros((h, w), np.uint8)
    n = len(xy)
    if n < 3:
        return mask
    ys = np.arange(h) + 0.5
    x0, y0 = xy[:, 0], xy[:, 1]
    x1, y1 = np.roll(x0, -1), np.roll(y0, -1)
    for row, yc in enumerate(ys):
        cond = (y0 <= yc) != (y1 <= yc)
        if not cond.any():
            continue
        xint = x0[cond] + (yc - y0[cond]) * (x1[cond] - x0[cond]) / \
            (y1[cond] - y0[cond])
        xint = np.sort(xint)
        for a, b in zip(xint[::2], xint[1::2]):
            lo = max(int(np.ceil(a - 0.5)), 0)
            hi = min(int(np.floor(b - 0.5)) + 1, w)
            if hi > lo:
                mask[row, lo:hi] = 1
    return mask


def to_string(rle: Dict) -> bytes:
    counts = np.ascontiguousarray(_counts_array(rle))
    lib = _load()
    if lib is not None:
        buf = ctypes.create_string_buffer(len(counts) * 8 + 16)
        m = lib.rle_to_string(counts, len(counts), buf, len(buf))
        if m >= 0:
            return buf.value
    # python fallback mirrors the C encoding
    out = bytearray()
    prev2 = 0
    cl = counts.astype(np.int64)
    for i, c in enumerate(cl):
        x = int(c) - (int(cl[i - 2]) if i > 2 else 0)
        more = True
        while more:
            cc = x & 0x1F
            x >>= 5
            more = (x != -1) if (cc & 0x10) else (x != 0)
            if more:
                cc |= 0x20
            out.append(cc + 48)
    return bytes(out)
