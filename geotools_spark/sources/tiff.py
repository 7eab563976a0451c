"""Minimal pure-NumPy reader for uncompressed strip TIFFs.

Implemented from the public TIFF 6.0 specification — just enough to
load the NAD83v6VG velocity grid (little-endian, Compression=1,
PlanarConfig=contig, one strip per row, float32 samples) plus the
GeoTIFF ModelPixelScale / ModelTiepoint tags that define the affine
geotransform. GDAL is not available in this environment (SURVEY.md §7),
and this 200-line reader removes the dependency for the one raster the
transform pipeline needs (reference loads the same file via GDAL at
src/las2csrs.cpp:96-136).
"""

from __future__ import annotations

import struct

import numpy as np

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}
_TYPE_FMT = {3: "H", 4: "I", 8: "h", 9: "i", 11: "f", 12: "d"}


def _read_tag_values(buf: bytes, bo: str, typ: int, count: int, val_off: int, inline: bytes):
    size = _TYPE_SIZES[typ] * count
    raw = inline[:size] if size <= 4 else buf[val_off : val_off + size]
    if typ in _TYPE_FMT:
        return list(struct.unpack(bo + _TYPE_FMT[typ] * count, raw))
    if typ == 5:  # RATIONAL
        ints = struct.unpack(bo + "I" * (2 * count), raw)
        return [ints[2 * i] / ints[2 * i + 1] for i in range(count)]
    return raw


def read_strip_tiff(path: str):
    """Read bands + geotransform from an uncompressed strip TIFF file.

    Returns (data, transform): data is float64 ndarray (height, width,
    samples); transform is the 6-element GDAL-style affine
    (originX, pixelW, 0, originY, 0, -pixelH).
    """
    with open(path, "rb") as fh:
        return read_strip_tiff_bytes(fh.read())


def read_strip_tiff_bytes(buf: bytes):
    """Bytes entry point for in-memory payloads (operators/media.py):
    same contract as :func:`read_strip_tiff`, plus uint8 samples
    (BitsPerSample 8 / SampleFormat 1) next to the float32 grid case."""
    if buf[:2] == b"II":
        bo = "<"
    elif buf[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF")
    magic, ifd_off = struct.unpack(bo + "HI", buf[2:8])
    if magic != 42:
        raise ValueError("not a classic TIFF")
    tags: dict[int, list] = {}
    n = struct.unpack(bo + "H", buf[ifd_off : ifd_off + 2])[0]
    for i in range(n):
        e = buf[ifd_off + 2 + i * 12 : ifd_off + 14 + i * 12]
        tag, typ, count = struct.unpack(bo + "HHI", e[:8])
        val_off = struct.unpack(bo + "I", e[8:12])[0]
        tags[tag] = _read_tag_values(buf, bo, typ, count, val_off, e[8:12])

    width = int(tags[256][0])
    height = int(tags[257][0])
    spp = int(tags.get(277, [1])[0])
    bps = tags[258]
    fmt = tags.get(339, [1] * spp)
    if int(tags.get(259, [1])[0]) != 1:
        raise NotImplementedError("only uncompressed TIFFs supported")
    if int(tags.get(284, [1])[0]) != 1:
        raise NotImplementedError("only contiguous planar config supported")
    if all(int(b) == 32 for b in bps) and all(int(f) == 3 for f in fmt):
        dt = np.dtype(bo + "f4")
    elif all(int(b) == 8 for b in bps) and all(int(f) == 1 for f in fmt):
        dt = np.dtype("u1")
    else:
        raise NotImplementedError("only float32 or uint8 samples supported")

    offsets = tags[273]
    counts = tags[279]
    rows_per_strip = int(tags.get(278, [height])[0])
    data = np.empty((height, width, spp), dtype=np.float64)
    row = 0
    for off, cnt in zip(offsets, counts):
        nrows = min(rows_per_strip, height - row)
        strip = np.frombuffer(buf, dtype=dt, count=nrows * width * spp, offset=int(off))
        data[row : row + nrows] = strip.reshape(nrows, width, spp).astype(np.float64)
        row += nrows

    scale = tags.get(33550, [1.0, 1.0, 0.0])
    tie = tags.get(33922, [0.0] * 6)
    # ModelTiepoint: raster (i,j,k) -> model (x,y,z); GDAL transform:
    transform = (
        tie[3] - tie[0] * scale[0],
        scale[0],
        0.0,
        tie[4] + tie[1] * scale[1],
        0.0,
        -scale[1],
    )
    return data, transform
