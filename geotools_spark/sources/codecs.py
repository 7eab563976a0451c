"""Pure-NumPy/stdlib media codecs: PNG, strip TIFF, WAV PCM, and a
minimal frame container — the REAL byte-level decode path behind the
multimodal operators (operators/media.py).

No Pillow/libvips/ffmpeg exists in this environment, so these are
implemented from the public format specifications directly:

- PNG (RFC 2083): 8-bit gray/RGB/RGBA, zlib-inflated IDAT, all five
  standard row filters (None/Sub/Up/Average/Paeth) unfiltered in
  NumPy. CRCs verified on read. The encoder emits filter-0 rows —
  simple and optimal for the synthetic gradient content; the decoder
  handles the full filter set (Sub vectorizes as a per-channel
  cumsum; Average/Paeth are sequential by spec and run as cold
  per-row loops — exercised by tests, never emitted by our encoder).
- TIFF 6.0: uncompressed contiguous strips, uint8 or float32 samples
  (sources/tiff.py does the IFD walk; this module adds the uint8
  encoder and the bytes entry point).
- WAV (RIFF): PCM16 mono/stereo.
- GTV: a 16-byte-header frame container (magic, frame count, frame
  lengths, concatenated PNG frames) standing in for a video container
  — parsing structure is real, codec-per-frame is PNG.
- baseline JPEG (ITU-T T.81): sources/jpeg.py — Huffman entropy
  decode + dequant + IDCT, re-exported here and dispatched on the
  FFD8 magic; the real-world lossy codec in the image path.

The reference's raster IO contract is include/raster.hpp:419-772
(GDAL-backed there); this module is the in-sandbox equivalent for the
media decode seam.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}


# ---------------------------------------------------------------- PNG

def encode_png(arr: np.ndarray, *, level: int = 6) -> bytes:
    """Encode (h, w[, c]) uint8 -> PNG bytes (8-bit, filter 0 rows)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    ctype = {1: 0, 3: 2, 4: 6}.get(c)
    if ctype is None:
        raise ValueError(f"unsupported channel count {c}")
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), arr.reshape(h, w * c)], axis=1
    ).tobytes()

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, level))
        + chunk(b"IEND", b"")
    )


def _unfilter(raw: bytes, h: int, w: int, c: int) -> np.ndarray:
    stride = w * c
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    ftypes = rows[:, 0]
    data = rows[:, 1:]
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for r in range(h):
        cur = data[r].astype(np.int64)
        f = int(ftypes[r])
        if f == 0:
            rec = cur
        elif f == 1:  # Sub: + left same-channel -> cumsum mod 256
            rec = (cur.reshape(w, c).cumsum(axis=0) % 256).reshape(stride)
        elif f == 2:  # Up
            rec = (cur + prev) % 256
        elif f == 3:  # Average — sequential by spec (cold path)
            rec = np.empty(stride, dtype=np.int64)
            for x in range(stride):
                left = rec[x - c] if x >= c else 0
                rec[x] = (cur[x] + (left + prev[x]) // 2) % 256
        elif f == 4:  # Paeth — sequential by spec (cold path)
            rec = np.empty(stride, dtype=np.int64)
            for x in range(stride):
                a = rec[x - c] if x >= c else 0
                b = int(prev[x])
                cc = int(prev[x - c]) if x >= c else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                rec[x] = (cur[x] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[r] = rec
        prev = rec
    return out.reshape(h, w, c)


def decode_png(buf: bytes) -> np.ndarray:
    """PNG bytes -> uint8 (h, w, c). 8-bit gray/RGB/RGBA, interlace 0."""
    if buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(buf):
        (ln,) = struct.unpack(">I", buf[pos : pos + 4])
        tag = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", buf[pos + 8 + ln : pos + 12 + ln])
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {tag!r}")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise NotImplementedError("only 8-bit non-interlaced PNG supported")
    c = _CHANNELS.get(ctype)
    if c is None:
        raise NotImplementedError(f"PNG color type {ctype} unsupported")
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (w * c + 1):
        raise ValueError("PNG scanline payload size mismatch")
    return _unfilter(raw, h, w, c)


# --------------------------------------------------------------- TIFF

def _packbits_encode(src: bytes) -> bytes:
    """TIFF 6.0 PackBits: emit repeat runs (>=3 equal bytes) as
    (257-n, byte) and everything else as literal blocks of <=128."""
    out = bytearray()
    i, n = 0, len(src)
    while i < n:
        run = 1
        while i + run < n and run < 128 and src[i + run] == src[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, src[i]])
            i += run
            continue
        lit_start = i
        i += run
        while i < n and i - lit_start < 128:
            run = 1
            while i + run < n and run < 3 and src[i + run] == src[i]:
                run += 1
            if run >= 3:
                break
            i += 1
        out += bytes([i - lit_start - 1]) + src[lit_start:i]
    return bytes(out)


def _lzw_encode(src: bytes) -> bytes:
    """TIFF 6.0 §13 LZW with early change: MSB-first bit packing,
    9..12-bit codes, Clear=256, EOI=257; the string table resets when
    the next code would be 4094 (the spec's early-change reset point),
    keeping any compliant reader — including GDAL/libtiff — in sync."""
    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << width) | code
        nbits += width
        while nbits >= 8:
            out.append((bitbuf >> (nbits - 8)) & 0xFF)
            nbits -= 8

    def fresh():
        return {bytes([i]): i for i in range(256)}

    table = fresh()
    next_code = 258
    width = 9
    emit(256, width)  # spec: every strip starts with a Clear
    omega = b""
    for b in src:
        cand = omega + bytes([b])
        if cand in table:
            omega = cand
            continue
        emit(table[omega], width)
        table[cand] = next_code
        next_code += 1
        # early change: the DECODER grows its width when its table hits
        # (1<<w)-1 entries, which happens as it mirrors this insert —
        # so the encoder must widen at the same point
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        elif next_code == 4094:  # 12-bit early-change ceiling: reset
            emit(256, width)
            table = fresh()
            next_code = 258
            width = 9
        omega = bytes([b])
    if omega:
        emit(table[omega], width)
    emit(257, width)  # EndOfInformation
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)  # pad final byte
    return bytes(out)


def encode_strip_tiff_u8(
    arr: np.ndarray,
    *,
    compression: str = "none",
    predictor: int = 1,
) -> bytes:
    """(h, w[, c]) uint8 -> classic little-endian TIFF, contiguous, one
    strip. ``compression``: "none", "lzw" (tag 5), "deflate" (tag 8,
    zlib), or "packbits" (tag 32773); ``predictor``: 1 (none) or 2
    (horizontal differencing, lzw/deflate — the layout real compressed
    GeoTIFFs use). Readable by sources.tiff.read_strip_tiff_bytes."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if predictor == 2:
        # store per-row left-neighbor deltas (modulo 256)
        d = arr.astype(np.int16)
        d[:, 1:, :] = d[:, 1:, :] - d[:, :-1, :]
        payload = (d % 256).astype(np.uint8).tobytes()
    elif predictor == 1:
        payload = arr.tobytes()
    else:
        raise ValueError(f"predictor {predictor}")
    comp_tag = {"none": 1, "lzw": 5, "deflate": 8, "packbits": 32773}[compression]
    if compression == "deflate":
        data = zlib.compress(payload)
    elif compression == "lzw":
        data = _lzw_encode(payload)
    elif compression == "packbits":
        data = _packbits_encode(payload)
    else:
        data = payload
    # layout: header(8) + IFD + values + pixel data
    tags = []  # (tag, type, count, value_or_offset, extra_bytes)

    def short(tag, v):
        tags.append((tag, 3, 1, v, b""))

    def long_(tag, v):
        tags.append((tag, 4, 1, v, b""))

    n_entries = 10 + (1 if predictor == 2 else 0)
    ifd_off = 8
    ifd_size = 2 + n_entries * 12 + 4
    extra_off = ifd_off + ifd_size
    bps_bytes = struct.pack("<" + "H" * c, *([8] * c))
    sfmt_bytes = struct.pack("<" + "H" * c, *([1] * c))
    extra = b""
    # BitsPerSample (258) and SampleFormat (339): inline when c<=2
    if c * 2 <= 4:
        bps_val = int.from_bytes(bps_bytes.ljust(4, b"\0"), "little")
        sfmt_val = int.from_bytes(sfmt_bytes.ljust(4, b"\0"), "little")
        bps_entry = (258, 3, c, bps_val, b"")
        sfmt_entry = (339, 3, c, sfmt_val, b"")
    else:
        bps_entry = (258, 3, c, extra_off + len(extra), b"")
        extra += bps_bytes
        sfmt_entry = (339, 3, c, extra_off + len(extra), b"")
        extra += sfmt_bytes
    data_off = extra_off + len(extra)

    long_(256, w)            # ImageWidth
    long_(257, h)            # ImageLength
    tags.append(bps_entry)   # BitsPerSample
    short(259, comp_tag)     # Compression
    short(262, 2 if c >= 3 else 1)  # Photometric: RGB / gray
    long_(273, data_off)     # StripOffsets
    short(277, c)            # SamplesPerPixel
    long_(278, h)            # RowsPerStrip (single strip)
    long_(279, len(data))    # StripByteCounts
    if predictor == 2:
        short(317, 2)        # Predictor: horizontal differencing
    tags.append(sfmt_entry)  # SampleFormat: uint
    tags.sort(key=lambda t: t[0])
    assert len(tags) == n_entries

    out = bytearray(struct.pack("<2sHI", b"II", 42, ifd_off))
    out += struct.pack("<H", n_entries)
    for tag, typ, cnt, val, _ in tags:
        out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0)  # next IFD
    out += extra
    out += data
    return bytes(out)


# ---------------------------------------------------------------- WAV

def encode_wav(samples: np.ndarray, *, rate: int, channels: int = 1) -> bytes:
    """int16 samples (interleaved if stereo) -> RIFF/WAVE PCM16."""
    pcm = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    block = 2 * channels
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * block, block, 16
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(buf: bytes) -> tuple[int, int, np.ndarray]:
    """WAV bytes -> (rate, channels, int16 samples)."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos = 12
    rate = channels = None
    pcm = None
    while pos + 8 <= len(buf):
        tag = buf[pos : pos + 4]
        (ln,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        data = buf[pos + 8 : pos + 8 + ln]
        if tag == b"fmt ":
            afmt, channels, rate, _, _, bits = struct.unpack("<HHIIHH", data[:16])
            if afmt != 1 or bits != 16:
                raise NotImplementedError("only PCM16 WAV supported")
        elif tag == b"data":
            pcm = np.frombuffer(data, dtype="<i2")
        pos += 8 + ln + (ln & 1)
    if rate is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    return int(rate), int(channels), pcm


# ------------------------------------------------- GTV frame container

_GTV_MAGIC = b"GTV1"


def encode_gtv(frames: list[bytes]) -> bytes:
    """Frame container: magic, u32 count, u32 lengths, frame bytes."""
    head = _GTV_MAGIC + struct.pack("<I", len(frames))
    head += struct.pack("<" + "I" * len(frames), *[len(f) for f in frames])
    return head + b"".join(frames)


def decode_gtv(buf: bytes) -> list[bytes]:
    if buf[:4] != _GTV_MAGIC:
        raise ValueError("not a GTV container")
    (n,) = struct.unpack("<I", buf[4:8])
    lens = struct.unpack("<" + "I" * n, buf[8 : 8 + 4 * n])
    out = []
    pos = 8 + 4 * n
    for ln in lens:
        out.append(buf[pos : pos + ln])
        pos += ln
    return out


# ----------------------------------------------------------- dispatch

def decode_image(buf: bytes) -> np.ndarray:
    """Magic-dispatch image decode -> uint8 (h, w, c)."""
    if buf[:8] == _PNG_SIG:
        return decode_png(buf)
    if buf[:2] in (b"II", b"MM"):
        from .tiff import read_strip_tiff_bytes

        data, _ = read_strip_tiff_bytes(bytes(buf))
        return np.ascontiguousarray(data).astype(np.uint8)
    if buf[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg

        return decode_jpeg(bytes(buf))
    raise ValueError(f"unknown image magic {bytes(buf[:4])!r}")


# baseline JPEG (sources/jpeg.py) — re-exported so callers use one
# codec namespace; decode_image dispatches on the FFD8 magic above
from .jpeg import decode_jpeg, encode_jpeg  # noqa: E402,F401
