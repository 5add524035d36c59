"""Minimal MATLAB Level-5 MAT-file reader/writer (pure numpy + zlib).

Covers exactly the subset SynthText's ``gt.mat`` uses
(``mindocr/data/det_dataset.py:162-180`` reads it via scipy.io.loadmat,
which is absent in this environment): double/single numeric arrays, char
arrays, cell arrays, and miCOMPRESSED envelopes. Format per the public
"MAT-File Format" specification (MathWorks R2019b doc): 128-byte header,
8-byte-aligned tagged data elements, small-data-element packing, miMATRIX
with array-flags/dimensions/name subelements, column-major data.

The writer emits the same subset (always little-endian, compressed
optional) and exists so the reader is testable end-to-end without scipy;
both live here so any format fix touches one file.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# data types
MI_INT8, MI_UINT8, MI_INT16, MI_UINT16 = 1, 2, 3, 4
MI_INT32, MI_UINT32, MI_SINGLE, MI_DOUBLE = 5, 6, 7, 9
MI_MATRIX, MI_COMPRESSED, MI_UTF8 = 14, 15, 16
# array classes
MX_CELL, MX_CHAR, MX_DOUBLE, MX_SINGLE = 1, 4, 6, 7

_NUMERIC_DTYPES = {
    MI_INT8: np.int8, MI_UINT8: np.uint8, MI_INT16: np.int16,
    MI_UINT16: np.uint16, MI_INT32: np.int32, MI_UINT32: np.uint32,
    MI_SINGLE: np.float32, MI_DOUBLE: np.float64,
}


def _read_element(buf: bytes, pos: int) -> tuple[int, bytes, int]:
    """One tagged data element -> (mi_type, raw bytes, next_pos)."""
    dtype_word = struct.unpack_from("<I", buf, pos)[0]
    if dtype_word >> 16:  # small data element: size/type packed in the tag
        nbytes = dtype_word >> 16
        mi = dtype_word & 0xFFFF
        data = buf[pos + 4 : pos + 4 + nbytes]
        return mi, data, pos + 8
    mi = dtype_word
    nbytes = struct.unpack_from("<I", buf, pos + 4)[0]
    data = buf[pos + 8 : pos + 8 + nbytes]
    end = pos + 8 + nbytes
    end += (8 - end % 8) % 8  # elements are 8-byte aligned
    return mi, data, end


def _parse_matrix(data: bytes):
    """miMATRIX body -> (name, value). Values: numpy array (numeric),
    list-of-row-strings (char), numpy object array (cell)."""
    pos = 0
    mi, flags_raw, pos = _read_element(data, pos)
    flags = struct.unpack_from("<I", flags_raw, 0)[0]
    mx_class = flags & 0xFF
    mi, dims_raw, pos = _read_element(data, pos)
    dims = list(np.frombuffer(dims_raw, dtype="<i4"))
    mi, name_raw, pos = _read_element(data, pos)
    name = name_raw.tobytes().decode("ascii") if isinstance(name_raw, np.ndarray) else bytes(name_raw).decode("ascii")

    if mx_class == MX_CELL:
        n = int(np.prod(dims)) if dims else 0
        cells = np.empty(n, dtype=object)
        for i in range(n):
            mi, cell_raw, pos = _read_element(data, pos)
            if mi != MI_MATRIX:
                raise ValueError(f"cell element is mi type {mi}, not miMATRIX")
            _, cells[i] = _parse_matrix(cell_raw)
        return name, cells.reshape(dims, order="F")

    if mx_class == MX_CHAR:
        mi, chars_raw, pos = _read_element(data, pos)
        if mi in (MI_UINT16, MI_INT16):
            codes = np.frombuffer(chars_raw, dtype="<u2")
            text = "".join(chr(c) for c in codes)
        elif mi in (MI_UINT8, MI_INT8, MI_UTF8):
            text = bytes(chars_raw).decode("utf-8")
        else:
            raise ValueError(f"unsupported char storage mi type {mi}")
        rows, cols = (dims + [1, 1])[:2]
        # column-major char matrix -> list of row strings
        grid = np.array(list(text), dtype=object).reshape(rows, cols, order="F") if text else np.empty((rows, cols), dtype=object)
        return name, ["".join(grid[r]) for r in range(rows)]

    if mx_class in (MX_DOUBLE, MX_SINGLE):
        mi, pr_raw, pos = _read_element(data, pos)
        if mi not in _NUMERIC_DTYPES:
            raise ValueError(f"unsupported numeric storage mi type {mi}")
        arr = np.frombuffer(bytes(pr_raw), dtype=_NUMERIC_DTYPES[mi])
        target = np.float64 if mx_class == MX_DOUBLE else np.float32
        return name, arr.astype(target).reshape(dims, order="F")

    raise ValueError(f"unsupported mxClass {mx_class}")


def loadmat(path: str) -> dict:
    """Read a MAT-5 file -> {variable name: value} (subset; see module doc)."""
    with open(path, "rb") as f:
        buf = f.read()
    if len(buf) < 128:
        raise ValueError("not a MAT-5 file (short header)")
    version, endian = struct.unpack_from("<HH", buf, 124)
    if endian != 0x4D49:  # 'IM' little-endian
        raise ValueError("big-endian MAT files not supported")
    out: dict = {}
    pos = 128
    while pos + 8 <= len(buf):
        mi, raw, pos = _read_element(buf, pos)
        if mi == MI_COMPRESSED:
            inner = zlib.decompress(bytes(raw))
            mi2, raw2, _ = _read_element(inner, 0)
            if mi2 != MI_MATRIX:
                continue
            name, value = _parse_matrix(raw2)
        elif mi == MI_MATRIX:
            name, value = _parse_matrix(raw)
        else:
            continue  # skip unknown top-level elements
        out[name] = value
    return out


# --- writer (test harness for the reader; same subset) -------------------


def _element(mi: int, payload: bytes) -> bytes:
    if len(payload) <= 4:
        return struct.pack("<HH", mi, len(payload)) + payload.ljust(4, b"\0")
    pad = (8 - len(payload) % 8) % 8
    return struct.pack("<II", mi, len(payload)) + payload + b"\0" * pad


def _matrix(name: str, value) -> bytes:
    if isinstance(value, np.ndarray) and value.dtype == object:
        dims = np.array(value.shape if value.ndim > 1 else (1, value.size), dtype="<i4")
        body = _element(MI_UINT32, struct.pack("<II", MX_CELL, 0))
        body += _element(MI_INT32, dims.tobytes())
        body += _element(MI_INT8, name.encode("ascii"))
        for cell in value.reshape(-1, order="F"):
            body += _matrix("", cell)
        return _element(MI_MATRIX, body)
    if isinstance(value, str):
        value = [value]
    if isinstance(value, list) and all(isinstance(s, str) for s in value):
        rows = len(value)
        cols = max((len(s) for s in value), default=0)
        padded = [s.ljust(cols) for s in value]
        grid = np.array([list(s) for s in padded], dtype=object).reshape(rows, cols) if rows else np.empty((0, 0), dtype=object)
        codes = np.array(
            [ord(grid[r][c]) for c in range(cols) for r in range(rows)], dtype="<u2"
        )  # column-major
        body = _element(MI_UINT32, struct.pack("<II", MX_CHAR, 0))
        body += _element(MI_INT32, np.array([rows, cols], dtype="<i4").tobytes())
        body += _element(MI_INT8, name.encode("ascii"))
        body += _element(MI_UINT16, codes.tobytes())
        return _element(MI_MATRIX, body)
    arr = np.asarray(value, dtype=np.float64)
    dims = np.array(arr.shape if arr.ndim > 1 else (1, arr.size), dtype="<i4")
    body = _element(MI_UINT32, struct.pack("<II", MX_DOUBLE, 0))
    body += _element(MI_INT32, dims.tobytes())
    body += _element(MI_INT8, name.encode("ascii"))
    body += _element(MI_DOUBLE, arr.reshape(-1, order="F").tobytes())
    return _element(MI_MATRIX, body)


def savemat(path: str, variables: dict, compress: bool = True) -> None:
    header = b"MATLAB 5.0 MAT-file, written by mindocr_spark mat5.py"
    header = header.ljust(116)[:116] + b"\0" * 8 + struct.pack("<HH", 0x0100, 0x4D49)
    out = bytearray(header)
    for name, value in variables.items():
        elem = _matrix(name, value)
        if compress:
            comp = zlib.compress(elem)
            out += struct.pack("<II", MI_COMPRESSED, len(comp)) + comp
            out += b"\0" * ((8 - len(out) % 8) % 8)
        else:
            out += elem
    with open(path, "wb") as f:
        f.write(bytes(out))
