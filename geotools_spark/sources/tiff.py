"""Minimal pure-NumPy reader for strip TIFFs.

Implemented from the public TIFF 6.0 specification — enough to load
the NAD83v6VG velocity grid (little-endian, PlanarConfig=contig, one
strip per row, float32 samples) plus the GeoTIFF ModelPixelScale /
ModelTiepoint tags that define the affine geotransform. Compression:
none (1), LZW (5, TIFF 6.0 §13 with early change — GDAL's default
``COMPRESS=LZW``), Deflate (8 / 32946, stdlib zlib), and PackBits
(32773), with the horizontal-differencing Predictor (tag 317=2) real
compressed GeoTIFFs use (VERDICT r04 #5). GDAL is not available in this environment (SURVEY.md §7),
and this 200-line reader removes the dependency for the one raster the
transform pipeline needs (reference loads the same file via GDAL at
src/las2csrs.cpp:96-136).
"""

from __future__ import annotations

import struct

import numpy as np

_TYPE_SIZES = {
    1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4,
    12: 8, 16: 8, 17: 8, 18: 8,  # 16-18: BigTIFF LONG8/SLONG8/IFD8
}
_TYPE_FMT = {3: "H", 4: "I", 8: "h", 9: "i", 11: "f", 12: "d", 16: "Q", 17: "q", 18: "Q"}


def _read_tag_values(
    buf: bytes, bo: str, typ: int, count: int, val_off: int, inline: bytes
):
    size = _TYPE_SIZES[typ] * count
    raw = inline[:size] if size <= len(inline) else buf[val_off : val_off + size]
    if typ in _TYPE_FMT:
        return list(struct.unpack(bo + _TYPE_FMT[typ] * count, raw))
    if typ == 5:  # RATIONAL
        ints = struct.unpack(bo + "I" * (2 * count), raw)
        return [ints[2 * i] / ints[2 * i + 1] for i in range(count)]
    return raw


def _lzw_decode(src: bytes, want: int) -> bytes:
    """TIFF 6.0 §13 LZW: MSB-first bit packing, 9..12-bit codes,
    ClearCode=256, EOI=257, with TIFF's *early-change* convention (the
    code width grows one entry early, when the table reaches
    ``(1 << width) - 1``). This is the compression most real-world
    GeoTIFFs ship with (GDAL's default ``COMPRESS=LZW``)."""
    out = bytearray()
    table: list[bytes] = []
    width = 9
    bitbuf = 0
    nbits = 0
    pos = 0
    old: bytes | None = None

    def reset():
        nonlocal table, width, old
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        old = None

    reset()
    n = len(src)
    while len(out) < want:
        while nbits < width:
            if pos >= n:
                return bytes(out)
            bitbuf = (bitbuf << 8) | src[pos]
            pos += 1
            nbits += 8
        code = (bitbuf >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == 256:  # ClearCode
            reset()
            continue
        if code == 257:  # EndOfInformation
            break
        if old is None:  # first code after a Clear is a literal
            entry = table[code]
            out += entry
            old = entry
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):  # KwKwK case
                entry = old + old[:1]
            else:
                raise ValueError("corrupt LZW stream")
            out += entry
            table.append(old + entry[:1])
            old = entry
        # early change: the decoder's table lags the encoder's by one
        # entry, so it must widen when ITS table reaches (1<<w)-2 —
        # i.e. right after adding entry 510/1022/2046 (verified by
        # exhaustive round-trip against the libtiff-counter encoder in
        # sources/codecs._lzw_encode; offsets 0 and 1 desync)
        if width < 12 and len(table) >= (1 << width) - 2:
            width += 1
    return bytes(out)


def _packbits_decode(src: bytes, want: int) -> bytes:
    """TIFF 6.0 PackBits: n in [0,127] -> copy n+1 literal bytes;
    n in [-127,-1] -> repeat next byte 1-n times; -128 is a no-op."""
    out = bytearray()
    i = 0
    while i < len(src) and len(out) < want:
        n = src[i]
        i += 1
        if n < 128:
            out += src[i : i + n + 1]
            i += n + 1
        elif n > 128:
            out += bytes([src[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    return bytes(out)


def _decompress(buf: bytes, off: int, cnt: int, comp: int, want: int) -> bytes:
    """Decode one strip/tile payload to exactly ``want`` raw bytes."""
    if comp == 1:
        return buf[off : off + want]
    if comp == 5:  # LZW (TIFF 6.0 §13)
        return _lzw_decode(buf[off : off + cnt], want)
    if comp in (8, 32946):  # Adobe Deflate / Deflate: zlib stream
        import zlib

        return zlib.decompress(buf[off : off + cnt])
    return _packbits_decode(buf[off : off + cnt], want)  # 32773 PackBits


def _undo_predictor(raw: bytes, nrows: int, width: int, spp: int, dt, predictor: int):
    """Raw strip/tile bytes -> (nrows, width, spp) ndarray of ``dt``,
    undoing TIFF horizontal differencing (predictor 2, per-channel
    modular cumsum along the row) or the TechNote-3 floating-point
    predictor (3): per row, bytes are cumsummed with stride ``spp``
    then the four byte-significance streams (MSB first) reassemble
    into big-endian float32 — the libtiff fpAcc layout."""
    if predictor == 3:
        cc = width * spp * 4
        b = np.frombuffer(raw, np.uint8, nrows * cc).reshape(nrows, cc)
        # byte-wise accumulate with stride spp across the whole row
        acc = (
            np.cumsum(b.reshape(nrows, cc // spp, spp).astype(np.uint64), axis=1)
            & 0xFF
        ).astype(np.uint8)
        # streams: row = [all MSBs][byte1s][byte2s][all LSBs]
        streams = acc.reshape(nrows, 4, width * spp)
        be = np.ascontiguousarray(np.transpose(streams, (0, 2, 1)))
        return be.view(">f4").reshape(nrows, width, spp)
    block = np.frombuffer(raw, dtype=dt, count=nrows * width * spp).reshape(
        nrows, width, spp
    )
    if predictor == 2:
        # horizontal differencing: each sample stores the delta to its
        # left neighbor (per channel); undo with a modular cumsum
        # (astype back to dt wraps at the sample width)
        block = np.cumsum(block.astype(np.uint64), axis=1).astype(dt)
    return block


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
    magic = struct.unpack(bo + "H", buf[2:4])[0]
    tags: dict[int, list] = {}
    if magic == 42:  # classic TIFF: 4-byte offsets, 12-byte entries
        ifd_off = struct.unpack(bo + "I", buf[4:8])[0]
        n = struct.unpack(bo + "H", buf[ifd_off : ifd_off + 2])[0]
        for i in range(n):
            e = buf[ifd_off + 2 + i * 12 : ifd_off + 14 + i * 12]
            tag, typ, count = struct.unpack(bo + "HHI", e[:8])
            val_off = struct.unpack(bo + "I", e[8:12])[0]
            tags[tag] = _read_tag_values(buf, bo, typ, count, val_off, e[8:12])
    elif magic == 43:  # BigTIFF: 8-byte offsets, 20-byte entries —
        # what GDAL writes for >4 GB rasters (BIGTIFF=YES / IF_SAFER)
        offsize, zero, ifd_off = struct.unpack(bo + "HHQ", buf[4:16])
        if offsize != 8 or zero != 0:
            raise ValueError("malformed BigTIFF header")
        n = struct.unpack(bo + "Q", buf[ifd_off : ifd_off + 8])[0]
        for i in range(n):
            e = buf[ifd_off + 8 + i * 20 : ifd_off + 28 + i * 20]
            tag, typ = struct.unpack(bo + "HH", e[:4])
            count = struct.unpack(bo + "Q", e[4:12])[0]
            val_off = struct.unpack(bo + "Q", e[12:20])[0]
            tags[tag] = _read_tag_values(buf, bo, typ, count, val_off, e[12:20])
    else:
        raise ValueError("not a TIFF (bad version)")

    width = int(tags[256][0])
    height = int(tags[257][0])
    spp = int(tags.get(277, [1])[0])
    bps = tags[258]
    fmt = tags.get(339, [1] * spp)
    comp = int(tags.get(259, [1])[0])
    predictor = int(tags.get(317, [1])[0])
    if comp not in (1, 5, 8, 32946, 32773):
        raise NotImplementedError(
            f"TIFF compression {comp} unsupported "
            "(none/LZW/Deflate/PackBits only)"
        )
    planar = int(tags.get(284, [1])[0])
    if planar not in (1, 2):
        raise NotImplementedError(f"TIFF planar config {planar} unsupported")
    if all(int(b) == 32 for b in bps) and all(int(f) == 3 for f in fmt):
        dt = np.dtype(bo + "f4")
    elif all(int(b) == 8 for b in bps) and all(int(f) == 1 for f in fmt):
        dt = np.dtype("u1")
    elif all(int(b) == 16 for b in bps) and all(int(f) == 1 for f in fmt):
        dt = np.dtype(bo + "u2")
    else:
        raise NotImplementedError("only float32, uint8, or uint16 samples supported")
    if predictor == 2 and dt.kind != "u":
        # TIFF 6.0 horizontal differencing is defined on integer data;
        # float data uses predictor 3 (byte-split, below)
        raise NotImplementedError("predictor 2 on non-integer samples")
    if predictor == 3 and dt.kind != "f":
        raise NotImplementedError("predictor 3 on non-float samples")
    if predictor not in (1, 2, 3):
        raise NotImplementedError(f"TIFF predictor {predictor} unsupported")

    data = np.empty((height, width, spp), dtype=np.float64)
    # planar config 2 (separate planes, GDAL INTERLEAVE=BAND): each
    # strip/tile carries ONE sample plane, plane-major block order;
    # predictors run within the plane (effective spp = 1)
    blk_spp = 1 if planar == 2 else spp
    if 322 in tags:  # tiled organization (TIFF 6.0 §15) — GDAL's
        # default layout for large GeoTIFFs (TILED=YES, 256x256)
        tw = int(tags[322][0])
        th = int(tags[323][0])
        offsets = tags[324]
        counts = tags[325]
        tiles_across = (width + tw - 1) // tw
        tiles_down = (height + th - 1) // th
        per_plane = tiles_across * tiles_down
        want = th * tw * blk_spp * dt.itemsize  # tiles padded to full size
        for idx, (off, cnt) in enumerate(zip(offsets, counts)):
            raw = _decompress(buf, int(off), int(cnt), comp, want)
            block = _undo_predictor(raw, th, tw, blk_spp, dt, predictor)
            plane, ti = divmod(idx, per_plane) if planar == 2 else (None, idx)
            ty, tx = divmod(ti, tiles_across)
            y0, x0 = ty * th, tx * tw
            vh = min(th, height - y0)
            vw = min(tw, width - x0)
            tgt = block[:vh, :vw].astype(np.float64)
            if planar == 2:
                data[y0 : y0 + vh, x0 : x0 + vw, plane] = tgt[:, :, 0]
            else:
                data[y0 : y0 + vh, x0 : x0 + vw] = tgt
    else:  # strip organization
        offsets = tags[273]
        counts = tags[279]
        rows_per_strip = int(tags.get(278, [height])[0])
        strips_per_plane = (
            (height + rows_per_strip - 1) // rows_per_strip
            if planar == 2
            else len(offsets)
        )
        row = 0
        for idx, (off, cnt) in enumerate(zip(offsets, counts)):
            plane, si = (
                divmod(idx, strips_per_plane) if planar == 2 else (None, idx)
            )
            row = si * rows_per_strip
            nrows = min(rows_per_strip, height - row)
            want = nrows * width * blk_spp * dt.itemsize
            raw = _decompress(buf, int(off), int(cnt), comp, want)
            block = _undo_predictor(raw, nrows, width, blk_spp, dt, predictor)
            if planar == 2:
                data[row : row + nrows, :, plane] = block.astype(np.float64)[
                    :, :, 0
                ]
            else:
                data[row : row + nrows] = block.astype(np.float64)

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
