"""Pure-NumPy baseline JPEG (ITU-T T.81 sequential DCT) — the
real-world lossy codec in the media decode path (VERDICT r03 #6; the
reference's multi-format raster contract is GDAL-backed,
include/raster.hpp:419-772).

Scope (honest subset, like the other codecs in this package):

- 8-bit baseline sequential (SOF0), Huffman entropy coding with the
  Annex-K luminance table pair, one uniform quantization table.
- 1 (gray) or 3 components. Encoder default (and all hash-gated
  fixtures): 1x1 sampling, NO color transform — 3-component images
  coded as R,G,B planes with component ids 'R','G','B' (JFIF's YCbCr
  transform would make the synthetic-oracle arithmetic irrational).
- Real-world streams (VERDICT r04 #4): the decoder handles arbitrary
  sampling factors (4:2:0/4:2:2, replicate upsampling), restart
  intervals, and inverts the BT.601 YCbCr transform when component
  ids are 1/2/3; the encoder can produce all three via
  ``subsample="420"``, ``restart_interval=N``, ``ycbcr=True``.
- Progressive (SOF2, T.81 Annex G): decoder handles all four scan
  kinds (DC first/refine, AC first/refine with EOBn run symbols) via
  a cross-scan coefficient store, including restart markers inside
  progressive scans; encoder emits a libjpeg-style spectral-selection
  + successive-approximation scan script (``progressive=True``) that
  decodes bit-identically to the baseline stream.
- Baseline non-interleaved streams (one sequential scan per
  component, T.81 A.2.2) decode through the same coefficient store;
  ``interleaved=False`` emits them.
- 16-bit quantization tables (DQT precision 1) decode and are emitted
  automatically for ``quant > 255``. Arithmetic coding still raises
  NotImplementedError rather than mis-decoding.

Exactness property used by the hash-gated oracle fixtures: a block
whose 64 samples are CONSTANT has only a DC coefficient; with the
uniform quant step q=1 the DC round-trips exactly and the IDCT of a
DC-only block is exactly flat — so block-flat content (the jpeg
variant of the synthetic gradient, constant within each 8-row band)
survives encode->decode BIT-EXACTLY, and the DuckDB oracle can
predict decoded statistics in closed form while Spark earns them by
entropy-decoding real JPEG bytes. General content round-trips within
+/-1 per sample at q=1 (forward-DCT rounding), pinned by tests.
"""

from __future__ import annotations

import struct

import numpy as np

# Annex K (K.3.1/K.3.2) luminance Huffman tables: BITS = number of
# codes per length 1..16, VALS = symbols in canonical order.
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# zigzag scan order (T.81 Figure 5): _ZIGZAG[i] = raster index of the
# i-th zigzag coefficient
_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# orthonormal 8x8 DCT-II basis: S = C @ s @ C.T, s = C.T @ S @ C
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _C[_u, _x] = (
            (np.sqrt(0.125) if _u == 0 else 0.5)
            * np.cos((2 * _x + 1) * _u * np.pi / 16.0)
        )


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) canonical assignment (T.81 C.2)."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_ENC = _canonical_codes(_DC_BITS, _DC_VALS)
_AC_ENC = _canonical_codes(_AC_BITS, _AC_VALS)

# Progressive AC table: Annex K lacks the EOBn (n>=1) symbols that
# progressive scans emit, so the progressive encoder ships its own
# DHT covering ALL 256 run/size symbols — 128 codes at 8 bits + 128
# at 9 (Kraft sum 0.75, all-ones codeword unused). Unoptimized on
# purpose: fixture plumbing, not the unit under test (real files
# carry optimized per-scan tables; the decoder reads whatever DHT
# says).
_PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 128, 128, 0, 0, 0, 0, 0, 0, 0]
_PROG_AC_VALS = list(range(256))
_PROG_AC_ENC = _canonical_codes(_PROG_AC_BITS, _PROG_AC_VALS)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            b = (self._acc >> (self._n - 8)) & 0xFF
            self._n -= 8
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.put((1 << pad) - 1, pad)  # 1-fill per spec


def _magnitude(v: int) -> tuple[int, int]:
    """(size, appended-bits) per T.81 F.1.2.1/F.1.2.2."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    return size, (v if v >= 0 else v + (1 << size) - 1)


def _emit_seq_block(bw: _BitWriter, zz, last_nz: int, pred: int) -> int:
    """Baseline sequential entropy coding of one block (DC diff + AC
    run-length with ZRL/EOB) -> new DC predictor. Shared by the
    interleaved MCU loop and non-interleaved per-component scans."""
    diff = zz[0] - pred
    size, extra = _magnitude(diff)
    code, ln = _DC_ENC[size]
    bw.put(code, ln)
    if size:
        bw.put(extra, size)
    run = 0
    for k in range(1, last_nz + 1):
        val = zz[k]
        if val == 0:
            run += 1
            continue
        while run > 15:
            code, ln = _AC_ENC[0xF0]  # ZRL
            bw.put(code, ln)
            run -= 16
        size, extra = _magnitude(val)
        code, ln = _AC_ENC[(run << 4) | size]
        bw.put(code, ln)
        bw.put(extra, size)
        run = 0
    if last_nz < 63:
        code, ln = _AC_ENC[0x00]  # EOB
        bw.put(code, ln)
    return zz[0]


def _to_blocks(chan: np.ndarray) -> np.ndarray:
    """(h, w) -> (nby*nbx, 8, 8) with edge replication padding."""
    h, w = chan.shape
    ph, pw = (-h) % 8, (-w) % 8
    if ph or pw:
        chan = np.pad(chan, ((0, ph), (0, pw)), mode="edge")
    hh, ww = chan.shape
    return (
        chan.reshape(hh // 8, 8, ww // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def _encode_progressive(
    rows, samp, nbx_c, mcux, mcuy, h, w, c, comp_ids, ri=0, lasts=None
) -> list[tuple[bytes, bytes]]:
    """Emit a libjpeg-style progressive scan script over quantized
    zigzag coefficients -> [(SOS payload, entropy bytes)] per scan.

    Script: interleaved DC first (Al=1); per-component AC first split
    Ss=1-5 / 6-63 at Al=2; AC refine to Al=1; DC refine to Al=0; AC
    refine to Al=0 — all four T.81 G.1.2 scan kinds, two successive-
    approximation levels, spectral selection. Successive approximation
    of integer coefficients is exact once fully refined, so the
    progressive stream decodes BIT-IDENTICALLY to the baseline stream
    of the same image (the cross-check the tests pin)."""
    hmax = max(s[0] for s in samp[:c])
    vmax = max(s[1] for s in samp[:c])
    ntrue = []
    for ci in range(c):
        hi, vi = samp[ci]
        cw = (w * hi + hmax - 1) // hmax
        ch = (h * vi + vmax - 1) // vmax
        ntrue.append(((ch + 7) // 8, (cw + 7) // 8))

    rstseq = [0]  # RSTn modulo counter, shared across a scan's markers

    def emit_rst(bw: _BitWriter) -> None:
        bw.flush()
        bw.out += bytes([0xFF, 0xD0 + (rstseq[0] & 7)])
        rstseq[0] += 1

    def dc_scan(al, refine: bool) -> bytes:
        bw = _BitWriter()
        rstseq[0] = 0
        pred = [0] * c
        if c > 1:  # interleaved: MCU order; restarts count MCUs
            units = []
            for m in range(mcuy * mcux):
                my, mx = divmod(m, mcux)
                unit = []
                for ci in range(c):
                    hi, vi = samp[ci]
                    for v in range(vi):
                        for hh in range(hi):
                            unit.append(
                                (ci, (my * vi + v) * nbx_c[ci] + (mx * hi + hh))
                            )
                units.append(unit)
        else:  # single component: true grid; restarts count blocks
            nby_t, nbx_t = ntrue[0]
            units = [
                [(0, by * nbx_c[0] + bx)]
                for by in range(nby_t)
                for bx in range(nbx_t)
            ]
        for m, unit in enumerate(units):
            if ri and m and m % ri == 0:
                emit_rst(bw)
                pred = [0] * c
            for ci, bi in unit:
                v0 = rows[ci][bi][0]
                if refine:
                    bw.put((v0 >> al) & 1, 1)
                    continue
                val = v0 >> al  # DC point transform: arithmetic shift
                diff = val - pred[ci]
                pred[ci] = val
                size, extra = _magnitude(diff)
                code, ln = _DC_ENC[size]
                bw.put(code, ln)
                if size:
                    bw.put(extra, size)
        bw.flush()
        return bytes(bw.out)

    def ac_first(ci, ss, se, al) -> bytes:
        bw = _BitWriter()
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                rb = eobrun.bit_length() - 1
                code, ln = _PROG_AC_ENC[rb << 4]
                bw.put(code, ln)
                if rb:
                    bw.put(eobrun - (1 << rb), rb)
                eobrun = 0

        nby_t, nbx_t = ntrue[ci]
        rstseq[0] = 0
        cnt = 0
        for by in range(nby_t):
            for bx in range(nbx_t):
                if ri and cnt and cnt % ri == 0:
                    flush_eob()
                    emit_rst(bw)
                cnt += 1
                bi = by * nbx_c[ci] + bx
                if lasts is not None and lasts[ci][bi] < ss:
                    # whole band zero (DC-only blocks dominate flat
                    # content): O(1) join of the EOB run
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
                    continue
                zz = rows[ci][bi]
                r, wrote = 0, False
                for k in range(ss, se + 1):
                    v = zz[k]
                    t = abs(v) >> al  # AC point transform: magnitude shift
                    if t == 0:
                        r += 1
                        continue
                    flush_eob()
                    while r > 15:
                        code, ln = _PROG_AC_ENC[0xF0]
                        bw.put(code, ln)
                        r -= 16
                    size, extra = _magnitude(t if v > 0 else -t)
                    code, ln = _PROG_AC_ENC[(r << 4) | size]
                    bw.put(code, ln)
                    bw.put(extra, size)
                    r, wrote = 0, True
                if r > 0 or not wrote:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
        flush_eob()
        bw.flush()
        return bytes(bw.out)

    def ac_refine(ci, ss, se, al) -> bytes:
        # libjpeg encode_mcu_AC_refine structure: correction bits for
        # already-nonzero coefficients buffer until the next emitted
        # symbol (cur) or travel with the pending EOB run (run_bits)
        bw = _BitWriter()
        eobrun = 0
        run_bits: list[int] = []

        def flush_eob():
            nonlocal eobrun, run_bits
            if eobrun:
                rb = eobrun.bit_length() - 1
                code, ln = _PROG_AC_ENC[rb << 4]
                bw.put(code, ln)
                if rb:
                    bw.put(eobrun - (1 << rb), rb)
                eobrun = 0
                for b in run_bits:
                    bw.put(b, 1)
                run_bits = []

        nby_t, nbx_t = ntrue[ci]
        rstseq[0] = 0
        cnt = 0
        for by in range(nby_t):
            for bx in range(nbx_t):
                if ri and cnt and cnt % ri == 0:
                    flush_eob()  # run_bits travel with the EOBn symbol
                    emit_rst(bw)
                cnt += 1
                bi = by * nbx_c[ci] + bx
                if lasts is not None and lasts[ci][bi] < ss:
                    # whole band zero: joins the EOB run with no
                    # correction bits
                    eobrun += 1
                    if eobrun == 0x7FFF or len(run_bits) > 900:
                        flush_eob()
                    continue
                zz = rows[ci][bi]
                absv = [abs(zz[k]) >> al for k in range(ss, se + 1)]
                eobpos = ss - 1
                for k in range(ss, se + 1):
                    if absv[k - ss] == 1:
                        eobpos = k
                r, cur = 0, []
                for k in range(ss, se + 1):
                    t = absv[k - ss]
                    if t == 0:
                        r += 1
                        continue
                    while r > 15 and k <= eobpos:
                        flush_eob()
                        code, ln = _PROG_AC_ENC[0xF0]
                        bw.put(code, ln)
                        r -= 16
                        for b in cur:
                            bw.put(b, 1)
                        cur = []
                    if t > 1:  # history coefficient: buffer correction bit
                        cur.append(t & 1)
                        continue
                    flush_eob()
                    code, ln = _PROG_AC_ENC[(r << 4) | 1]
                    bw.put(code, ln)
                    bw.put(0 if zz[k] < 0 else 1, 1)
                    for b in cur:
                        bw.put(b, 1)
                    cur, r = [], 0
                if r > 0 or cur:
                    eobrun += 1
                    run_bits.extend(cur)
                    if eobrun == 0x7FFF or len(run_bits) > 900:
                        flush_eob()
        flush_eob()
        bw.flush()
        return bytes(bw.out)

    script: list[tuple[list[int], int, int, int, int]] = [
        (list(range(c)), 0, 0, 0, 1)
    ]
    script += [([ci], 1, 5, 0, 2) for ci in range(c)]
    script += [([ci], 6, 63, 0, 2) for ci in range(c)]
    script += [([ci], 1, 63, 2, 1) for ci in range(c)]
    script += [(list(range(c)), 0, 0, 1, 0)]
    script += [([ci], 1, 63, 1, 0) for ci in range(c)]

    out = []
    for comp_list, ss, se, ah, al in script:
        sos = (
            struct.pack(">B", len(comp_list))
            + b"".join(
                struct.pack(">BB", comp_ids[ci], 0x00) for ci in comp_list
            )
            + struct.pack(">BBB", ss, se, (ah << 4) | al)
        )
        if ss == 0:
            data = dc_scan(al, refine=ah > 0)
        elif ah == 0:
            data = ac_first(comp_list[0], ss, se, al)
        else:
            data = ac_refine(comp_list[0], ss, se, al)
        out.append((sos, data))
    return out


def encode_jpeg(
    arr: np.ndarray,
    *,
    quant: int = 1,
    subsample: str = "444",
    ycbcr: bool = False,
    restart_interval: int = 0,
    progressive: bool = False,
    interleaved: bool = True,
) -> bytes:
    """Encode (h, w[, c]) uint8 (c in {1, 3}) -> baseline JPEG bytes.

    Defaults reproduce the round-4 stream byte-for-byte (RGB planes,
    1x1 sampling, uniform quant table, no restarts — the hash-gated
    fixtures depend on that). New real-world knobs (VERDICT r04 #4):
    ``subsample="420"`` codes component 0 at 2x2 sampling factors with
    box-averaged 2x1x1 chroma (the layout of most camera JPEGs),
    ``ycbcr=True`` applies the JFIF BT.601 color transform and labels
    components 1/2/3 so the decoder inverts it, ``restart_interval=N``
    emits RSTn markers every N MCUs (DRI)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if c not in (1, 3):
        raise ValueError(f"unsupported channel count {c}")
    if subsample not in ("444", "420"):
        raise ValueError(f"unsupported subsample {subsample}")
    sub = subsample == "420" and c == 3
    q = int(quant)
    qtab = np.full(64, q, dtype=np.int64)

    planes = [arr[:, :, ci].astype(np.float64) for ci in range(c)]
    if ycbcr and c == 3:
        R, G, B = planes
        planes = [
            0.299 * R + 0.587 * G + 0.114 * B,
            -0.168736 * R - 0.331264 * G + 0.5 * B + 128.0,
            0.5 * R - 0.418688 * G - 0.081312 * B + 128.0,
        ]
    planes = [np.clip(np.rint(p), 0.0, 255.0) for p in planes]

    samp = [(2, 2), (1, 1), (1, 1)] if sub else [(1, 1)] * c
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # per-component: (down)sample, pad to its MCU-aligned grid, batched
    # forward DCT + quantize + zigzag, vectorized last-nonzero-AC (the
    # per-block numpy calls otherwise dominate on flat-block fixtures)
    rows, lasts, nbx_c = [], [], []
    for ci in range(c):
        hi, vi = samp[ci]
        p = planes[ci]
        if (hi, vi) != (hmax, vmax):
            fy, fx = vmax // vi, hmax // hi
            py, px = (-p.shape[0]) % fy, (-p.shape[1]) % fx
            if py or px:
                p = np.pad(p, ((0, py), (0, px)), mode="edge")
            p = p.reshape(
                p.shape[0] // fy, fy, p.shape[1] // fx, fx
            ).mean(axis=(1, 3))
            p = np.clip(np.rint(p), 0.0, 255.0)
        th, tw = mcuy * 8 * vi, mcux * 8 * hi
        p = np.pad(
            p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge"
        )
        blocks = _to_blocks(p) - 128.0
        coef = np.matmul(_C, np.matmul(blocks, _C.T))  # batched S = C s C^T
        zz_all = np.round(coef / q).astype(np.int64).reshape(-1, 64)[:, _ZIGZAG]
        nzmask = zz_all[:, 1:] != 0
        has = nzmask.any(axis=1)
        last = np.zeros(len(zz_all), dtype=np.int64)
        if has.any():
            last[has] = 63 - np.argmax(nzmask[has][:, ::-1], axis=1)
        rows.append(zz_all.tolist())
        lasts.append(last.tolist())
        nbx_c.append(tw // 8)

    bw = _BitWriter()
    pred = [0] * c
    rst = 0
    n_mcu = mcuy * mcux
    skip_mcu_loop = progressive or (not interleaved and c > 1)
    for m in range(0 if skip_mcu_loop else n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            bw.flush()
            bw.out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            pred = [0] * c
        my, mx = divmod(m, mcux)
        for ci in range(c):
            hi, vi = samp[ci]
            for v in range(vi):
                for hh in range(hi):
                    bi = (my * vi + v) * nbx_c[ci] + (mx * hi + hh)
                    pred[ci] = _emit_seq_block(
                        bw, rows[ci][bi], lasts[ci][bi], pred[ci]
                    )
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    if ycbcr and c == 3:
        comp_ids = [1, 2, 3]
    else:
        comp_ids = [0x52, 0x47, 0x42][:c] if c == 3 else [0x47]
    if q > 255:  # DQT precision 1: 16-bit big-endian elements
        dqt = seg(
            0xFFDB,
            bytes([0x10]) + b"".join(struct.pack(">H", int(v)) for v in qtab),
        )
    else:
        dqt = seg(0xFFDB, bytes([0x00]) + bytes(int(v) for v in qtab))
    ac_bits, ac_vals = (
        (_PROG_AC_BITS, _PROG_AC_VALS) if progressive else (_AC_BITS, _AC_VALS)
    )
    dht = seg(
        0xFFC4,
        bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
        + bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals),
    )
    sof = seg(
        0xFFC2 if progressive else 0xFFC0,
        struct.pack(">BHHB", 8, h, w, c)
        + b"".join(
            struct.pack(">BBB", cid, (s[0] << 4) | s[1], 0)
            for cid, s in zip(comp_ids, samp)
        ),
    )
    dri = (
        seg(0xFFDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    if progressive:
        body = b"".join(
            seg(0xFFDA, sospay) + data
            for sospay, data in _encode_progressive(
                rows, samp, nbx_c, mcux, mcuy, h, w, c, comp_ids,
                ri=restart_interval, lasts=lasts,
            )
        )
        return b"\xff\xd8" + dqt + dht + sof + dri + body + b"\xff\xd9"
    if not interleaved and c > 1:
        # baseline non-interleaved: one sequential scan per component
        # over its true (un-padded) block grid (T.81 A.2.2)
        body = b""
        for ci in range(c):
            bw2 = _BitWriter()
            pred2, cnt, rst2 = 0, 0, 0
            hi, vi = samp[ci]
            cw = (w * hi + hmax - 1) // hmax
            ch = (h * vi + vmax - 1) // vmax
            for by in range((ch + 7) // 8):
                for bx in range((cw + 7) // 8):
                    if (
                        restart_interval
                        and cnt
                        and cnt % restart_interval == 0
                    ):
                        bw2.flush()
                        bw2.out += bytes([0xFF, 0xD0 + (rst2 & 7)])
                        rst2 += 1
                        pred2 = 0
                    cnt += 1
                    bi = by * nbx_c[ci] + bx
                    pred2 = _emit_seq_block(
                        bw2, rows[ci][bi], lasts[ci][bi], pred2
                    )
            bw2.flush()
            sospay = (
                struct.pack(">B", 1)
                + struct.pack(">BB", comp_ids[ci], 0x00)
                + struct.pack(">BBB", 0, 63, 0)
            )
            body += seg(0xFFDA, sospay) + bytes(bw2.out)
        return b"\xff\xd8" + dqt + dht + sof + dri + body + b"\xff\xd9"
    sos = seg(
        0xFFDA,
        struct.pack(">B", c)
        + b"".join(struct.pack(">BB", cid, 0x00) for cid in comp_ids)
        + struct.pack(">BBB", 0, 63, 0),
    )
    return (
        b"\xff\xd8" + dqt + dht + sof + dri + sos + bytes(bw.out) + b"\xff\xd9"
    )


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def _fill(self) -> None:
        while self._n <= 24:
            if self.pos >= len(self.data):
                self._acc = (self._acc << 8) | 0
                self._n += 8
                continue
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1  # stuffed FF
                else:  # marker: entropy data ended, feed 1-bits
                    self.pos -= 1
                    self._acc = (self._acc << 8) | 0xFF
                    self._n += 8
                    continue
            self._acc = (self._acc << 8) | b
            self._n += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill()
        v = (self._acc >> (self._n - n)) & ((1 << n) - 1)
        self._n -= n
        self._acc &= (1 << self._n) - 1
        return v

    def peek16(self) -> int:
        self._fill()  # keeps >= 24 bits buffered (1-fill past the end)
        return (self._acc >> (self._n - 16)) & 0xFFFF

    def consume(self, n: int) -> None:
        self._n -= n
        self._acc &= (1 << self._n) - 1

    def restart(self) -> None:
        """Byte-align at a restart boundary and skip the RSTn marker.
        Buffered bits are padding (and possibly 1-fill from peeking at
        the marker, which _fill never consumes); ``pos`` is therefore
        at or before the marker — scan forward for FFD0-FFD7, which
        cannot occur inside entropy data (FF is always stuffed)."""
        self._acc = 0
        self._n = 0
        p = self.pos
        while p + 1 < len(self.data) and not (
            self.data[p] == 0xFF and 0xD0 <= self.data[p + 1] <= 0xD7
        ):
            p += 1
        self.pos = p + 2


def _decode_tables(bits: list[int], vals: list[int]):
    """16-bit lookup tables for one-shot canonical Huffman decode:
    sym_lut[peek16] = symbol, len_lut[peek16] = code length (0 marks
    an invalid prefix). JPEG codes are <= 16 bits, so a single peek
    resolves any symbol — ~30x faster than bit-by-bit range walking
    on the per-block hot path."""
    sym_lut = np.zeros(1 << 16, dtype=np.int16)
    len_lut = np.zeros(1 << 16, dtype=np.uint8)
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = lo + (1 << (16 - length))
            sym_lut[lo:hi] = vals[k]
            len_lut[lo:hi] = length
            code += 1
            k += 1
        code <<= 1
    return sym_lut.tolist(), len_lut.tolist()


def _huff_decode(br: _BitReader, dec, vals: list[int]) -> int:
    sym_lut, len_lut = dec
    idx = br.peek16()
    ln = len_lut[idx]
    if ln == 0:
        raise ValueError("invalid Huffman code in entropy stream")
    br.consume(ln)
    return sym_lut[idx]


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _comp_index(comps, cs: int) -> int:
    """SOF component index for a scan-header component id."""
    for i, (cid, *_r) in enumerate(comps):
        if cid == cs:
            return i
    raise ValueError(f"scan references unknown component id {cs}")


def _entropy_end(buf: bytes, start: int) -> int:
    """Index of the first real marker (not stuffed FF00, not RSTn)
    after ``start`` — the end of one scan's entropy-coded segment."""
    p, n = start, len(buf)
    while p < n - 1:
        if buf[p] == 0xFF:
            nxt = buf[p + 1]
            if nxt != 0x00 and not (0xD0 <= nxt <= 0xD7):
                return p
            p += 2
        else:
            p += 1
    return n


class _ProgState:
    """Per-component coefficient store for progressive (SOF2) decode.

    Coefficients accumulate across scans in ZIGZAG order, int32, one
    row per 8x8 block on the MCU-padded grid; pixels materialize only
    at EOI (T.81 G.2). ``ntrue`` is each component's un-padded block
    grid (non-interleaved scans cover exactly that, G.2 / A.2.2)."""

    def __init__(self, comps, h, w):
        self.hmax = max(hi for _, hi, _, _ in comps)
        self.vmax = max(vi for _, _, vi, _ in comps)
        for _, hi, vi, _ in comps:
            if not hi or not vi or self.hmax % hi or self.vmax % vi:
                raise NotImplementedError("non-integral sampling ratio")
        self.mcux = (w + 8 * self.hmax - 1) // (8 * self.hmax)
        self.mcuy = (h + 8 * self.vmax - 1) // (8 * self.vmax)
        self.nbx_pad = [self.mcux * hi for _, hi, _, _ in comps]
        self.nby_pad = [self.mcuy * vi for _, _, vi, _ in comps]
        self.ntrue = []
        for _, hi, vi, _ in comps:
            cw = (w * hi + self.hmax - 1) // self.hmax
            ch = (h * vi + self.vmax - 1) // self.vmax
            self.ntrue.append(((ch + 7) // 8, (cw + 7) // 8))
        self.coefs = [
            np.zeros((self.nby_pad[i] * self.nbx_pad[i], 64), dtype=np.int32)
            for i in range(len(comps))
        ]


def _prog_decode_scan(
    st: _ProgState, data: bytes, scan, comps, htabs, ss, se, ah, al, ri
) -> None:
    """Decode one progressive scan into the coefficient store.

    Implements the four T.81 G.2 scan kinds: DC first (G.2.1, point
    transform = arithmetic shift), DC refine (one raw bit per block),
    AC first (G.2.2, EOBn run symbols), AC refine (correction bits
    interleaved with the zero-run walk). AC scans are single-component
    and walk the component's true (un-padded) block grid."""
    br = _BitReader(data)
    if ss == 0:  # DC scan (first or refine); spec: Se must be 0
        if se != 0:
            raise ValueError("invalid progressive scan header (Ss=0, Se!=0)")
        info = []
        for cs, td, _ta in scan:
            ci = _comp_index(comps, cs)
            _, hi, vi, _ = comps[ci]
            info.append((ci, hi, vi, htabs[(0, td)] if ah == 0 else None))
        pred = {ci: 0 for ci, *_r in info}

        def dc_block(ci, dcd, bi):
            col = st.coefs[ci]
            if ah == 0:
                size = _huff_decode(br, dcd[0], dcd[1])
                diff = _extend(br.bits(size), size) if size else 0
                pred[ci] += diff
                col[bi, 0] = pred[ci] << al
            elif br.bits(1):
                col[bi, 0] = int(col[bi, 0]) | (1 << al)

        if len(info) > 1:  # interleaved: MCU order over the padded grid
            for m in range(st.mcuy * st.mcux):
                if ri and m and m % ri == 0:
                    br.restart()
                    pred = {ci: 0 for ci in pred}
                my, mx = divmod(m, st.mcux)
                for ci, hi, vi, dcd in info:
                    for v in range(vi):
                        for hh in range(hi):
                            bi = (my * vi + v) * st.nbx_pad[ci] + (mx * hi + hh)
                            dc_block(ci, dcd, bi)
        else:  # non-interleaved: true block grid
            ci, hi, vi, dcd = info[0]
            nby_t, nbx_t = st.ntrue[ci]
            cnt = 0
            for by in range(nby_t):
                for bx in range(nbx_t):
                    if ri and cnt and cnt % ri == 0:
                        br.restart()
                        pred[ci] = 0
                    cnt += 1
                    dc_block(ci, dcd, by * st.nbx_pad[ci] + bx)
        return

    # AC scan: always one component (T.81 B.2.3 note 2)
    if len(scan) != 1:
        raise ValueError("interleaved progressive AC scan")
    cs, _td, ta = scan[0]
    ci = _comp_index(comps, cs)
    acd, acv = htabs[(1, ta)]
    col = st.coefs[ci]
    nby_t, nbx_t = st.ntrue[ci]
    eobrun = 0
    p1, m1 = 1 << al, -(1 << al)
    cnt = 0
    for by in range(nby_t):
        for bx in range(nbx_t):
            if ri and cnt and cnt % ri == 0:
                br.restart()
                eobrun = 0
            cnt += 1
            bi = by * st.nbx_pad[ci] + bx
            if ah == 0:  # AC first
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = _huff_decode(br, acd, acv)
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r < 15:
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += br.bits(r)
                            break
                        k += 16  # ZRL
                    else:
                        k += r
                        if k > se:
                            raise ValueError("AC index overrun")
                        col[bi, k] = _extend(br.bits(s), s) << al
                        k += 1
                continue
            # AC refine (libjpeg decode_mcu_AC_refine structure)
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = _huff_decode(br, acd, acv)
                    r, s = rs >> 4, rs & 0xF
                    newval = 0
                    if s == 0:
                        if r < 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += br.bits(r)
                            break
                        # r == 15: ZRL — skip 16 zero-history coeffs
                    else:
                        if s != 1:
                            raise ValueError("AC refine size != 1")
                        newval = p1 if br.bits(1) else m1
                    while k <= se:
                        c = int(col[bi, k])
                        if c != 0:
                            if br.bits(1) and (c & p1) == 0:
                                col[bi, k] = c + (p1 if c >= 0 else m1)
                        else:
                            r -= 1
                            if r < 0:
                                break
                        k += 1
                    if newval:
                        if k > se:
                            raise ValueError("AC refine placement overrun")
                        col[bi, k] = newval
                    k += 1
            if eobrun > 0:
                # correction bits are consumed only at nonzero-history
                # coefficients; skip the per-coefficient walk when the
                # rest of the band is all zero (the dominant case)
                if k <= se and col[bi, k : se + 1].any():
                    while k <= se:
                        c = int(col[bi, k])
                        if c != 0:
                            if br.bits(1) and (c & p1) == 0:
                                col[bi, k] = c + (p1 if c >= 0 else m1)
                        k += 1
                eobrun -= 1


def _seq_decode_scan(
    st: _ProgState, data: bytes, scan, comps, htabs, ri
) -> None:
    """Decode one baseline NON-interleaved scan (full DC+AC per block,
    single component, true block grid — T.81 A.2.2) into the
    coefficient store; pixels materialize at EOI like progressive."""
    if len(scan) != 1:
        raise NotImplementedError("partially-interleaved sequential scan")
    cs, td, ta = scan[0]
    ci = _comp_index(comps, cs)
    dcd, dcv = htabs[(0, td)]
    acd, acv = htabs[(1, ta)]
    br = _BitReader(data)
    col = st.coefs[ci]
    nby_t, nbx_t = st.ntrue[ci]
    pred = 0
    cnt = 0
    for by in range(nby_t):
        for bx in range(nbx_t):
            if ri and cnt and cnt % ri == 0:
                br.restart()
                pred = 0
            cnt += 1
            bi = by * st.nbx_pad[ci] + bx
            size = _huff_decode(br, dcd, dcv)
            pred += _extend(br.bits(size), size) if size else 0
            col[bi, 0] = pred
            k = 1
            while k <= 63:
                rs = _huff_decode(br, acd, acv)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r != 15:
                        break  # EOB
                    k += 16  # ZRL
                else:
                    k += r
                    if k > 63:
                        raise ValueError("AC index overrun")
                    col[bi, k] = _extend(br.bits(s), s)
                    k += 1


def _prog_finalize(st: _ProgState, comps, qtabs, h, w) -> np.ndarray:
    """Dequantize + batched IDCT the accumulated coefficient store and
    assemble the image (shared tail with the baseline path)."""
    planes = []
    for ci, (_cid, _hi, _vi, tq) in enumerate(comps):
        deq = st.coefs[ci].astype(np.float64) * qtabs[tq][None, :].astype(
            np.float64
        )
        full = np.zeros_like(deq)
        full[:, _ZIGZAG] = deq
        blocks = full.reshape(-1, 8, 8)
        # same association as the baseline per-block path
        # ((C^T @ S) @ C) so both decode routes are bit-identical
        pix = np.matmul(np.matmul(_C.T, blocks), _C) + 128.0
        nby, nbx = st.nby_pad[ci], st.nbx_pad[ci]
        planes.append(
            pix.reshape(nby, nbx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(nby * 8, nbx * 8)
        )
    return _planes_to_image(planes, comps, h, w, st.hmax, st.vmax)


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Decode baseline JPEG bytes -> uint8 (h, w, c).

    Handles arbitrary sampling factors (4:4:4 / 4:2:2 / 4:2:0 —
    chroma is replicate-upsampled), restart intervals (DRI/RSTn), and
    the JFIF YCbCr->RGB inverse when the stream's component ids are
    1/2/3 (the camera-JPEG convention; id 'R','G','B' streams stay
    untransformed planes), and progressive (SOF2) streams via the
    coefficient-store multi-scan path. Subset guard: arithmetic-coded
    streams raise NotImplementedError."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], tuple[dict, list[int]]] = {}
    sof = None
    progressive = False
    prog: _ProgState | None = None
    restart_interval = 0
    while pos < len(buf):
        if buf[pos] != 0xFF:
            raise ValueError("marker sync lost")
        marker = buf[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI: progressive pixels materialize here
            if prog is not None:
                h, w, comps = sof
                return _prog_finalize(prog, comps, qtabs, h, w)
            continue
        if marker == 0xD8:
            continue
        (seglen,) = struct.unpack_from(">H", buf, pos)
        payload = buf[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                p += 1
                if pq:  # precision 1: 16-bit big-endian elements
                    qtabs[tq] = np.frombuffer(
                        payload[p : p + 128], dtype=">u2"
                    ).astype(np.int64)
                    p += 128
                else:
                    qtabs[tq] = np.frombuffer(
                        payload[p : p + 64], dtype=np.uint8
                    ).astype(np.int64)
                    p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0xF
                p += 1
                bits = list(payload[p : p + 16])
                p += 16
                nv = sum(bits)
                vals = list(payload[p : p + nv])
                p += nv
                htabs[(tc, th)] = (_decode_tables(bits, vals), vals)
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            prec, h, w, nc = struct.unpack_from(">BHHB", payload, 0)
            if prec != 8:
                raise NotImplementedError("non-8-bit precision")
            comps = []
            for i in range(nc):
                cid, samp, tq = struct.unpack_from(">BBB", payload, 6 + 3 * i)
                comps.append((cid, samp >> 4, samp & 0xF, tq))
            sof = (h, w, comps)
            progressive = marker == 0xC2
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError("non-baseline SOF")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", payload, 0)
        elif marker == 0xDA:  # SOS: entropy data follows
            if sof is None:
                raise ValueError("SOS before SOF")
            ns = payload[0]
            scan = []
            for i in range(ns):
                cs, tt = payload[1 + 2 * i], payload[2 + 2 * i]
                scan.append((cs, tt >> 4, tt & 0xF))
            h, w, comps = sof
            if progressive:
                ss_, se_, ahl = struct.unpack_from(">BBB", payload, 1 + 2 * ns)
                if prog is None:
                    prog = _ProgState(comps, h, w)
                end = _entropy_end(buf, pos + seglen)
                _prog_decode_scan(
                    prog,
                    buf[pos + seglen : end],
                    scan,
                    comps,
                    htabs,
                    ss_,
                    se_,
                    ahl >> 4,
                    ahl & 0xF,
                    restart_interval,
                )
                pos = end
                continue
            if ns != len(comps):
                # baseline non-interleaved: accumulate per-component
                # scans in the coefficient store, finalize at EOI
                if prog is None:
                    prog = _ProgState(comps, h, w)
                end = _entropy_end(buf, pos + seglen)
                _seq_decode_scan(
                    prog,
                    buf[pos + seglen : end],
                    scan,
                    comps,
                    htabs,
                    restart_interval,
                )
                pos = end
                continue
            hmax = max(hi for _, hi, _, _ in comps)
            vmax = max(vi for _, _, vi, _ in comps)
            for _, hi, vi, _ in comps:
                if not hi or not vi or hmax % hi or vmax % vi:
                    raise NotImplementedError("non-integral sampling ratio")
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            br = _BitReader(buf[pos + seglen :])
            planes = [
                np.zeros((mcuy * 8 * vi, mcux * 8 * hi), dtype=np.float64)
                for _, hi, vi, _ in comps
            ]
            pred = [0] * len(comps)
            qt = [qtabs[tq] for *_, tq in comps]
            # scan order follows SOS; map each scan entry to its SOF
            # component for sampling factors and quant table
            info = []
            for cs, td, ta in scan:
                ci = _comp_index(comps, cs)
                _, hi, vi, _ = comps[ci]
                info.append((ci, hi, vi, htabs[(0, td)], htabs[(1, ta)]))
            zz = np.zeros(64, dtype=np.int64)
            c00 = _C[0, 0]
            for m in range(mcuy * mcux):
                if restart_interval and m and m % restart_interval == 0:
                    br.restart()
                    pred = [0] * len(comps)
                my, mx = divmod(m, mcux)
                for ci, hi, vi, (dcd, dcv), (acd, acv) in info:
                    for v in range(vi):
                        for hh in range(hi):
                            y0 = (my * vi + v) * 8
                            x0 = (mx * hi + hh) * 8
                            size = _huff_decode(br, dcd, dcv)
                            diff = (
                                _extend(br.bits(size), size) if size else 0
                            )
                            pred[ci] += diff
                            rs = _huff_decode(br, acd, acv)
                            if rs == 0x00:
                                # DC-only block (EOB right after DC) —
                                # the dominant case for flat content.
                                # Replicate the full IDCT's exact float
                                # ops (every element is
                                # (C00*dcq)*C00 + 128), so the shortcut
                                # is bit-identical to the slow path
                                dcq = float(pred[ci] * int(qt[ci][0]))
                                planes[ci][y0 : y0 + 8, x0 : x0 + 8] = (
                                    c00 * dcq
                                ) * c00 + 128.0
                                continue
                            zz[:] = 0
                            zz[0] = pred[ci]
                            k = 1
                            while True:
                                r, s = rs >> 4, rs & 0xF
                                if s == 0:
                                    if r != 15:
                                        break  # EOB
                                    k += 16  # ZRL
                                else:
                                    k += r
                                    if k > 63:
                                        raise ValueError("AC index overrun")
                                    zz[k] = _extend(br.bits(s), s)
                                    k += 1
                                if k > 63:
                                    break
                                rs = _huff_decode(br, acd, acv)
                            coef = np.zeros(64, dtype=np.float64)
                            coef[_ZIGZAG] = zz * qt[ci]
                            blk = _C.T @ coef.reshape(8, 8) @ _C + 128.0
                            planes[ci][y0 : y0 + 8, x0 : x0 + 8] = blk
            return _planes_to_image(planes, comps, h, w, hmax, vmax)
        pos += seglen
    raise ValueError("no scan data found")


def _planes_to_image(planes, comps, h, w, hmax, vmax) -> np.ndarray:
    """Shared decode tail: replicate-upsample subsampled components,
    crop MCU padding, invert YCbCr when ids are 1/2/3, clip to uint8."""
    chans = []
    for ci, (_, hi, vi, _) in enumerate(comps):
        p = planes[ci]
        fy, fx = vmax // vi, hmax // hi
        if fy > 1 or fx > 1:  # replicate (nearest) upsampling
            p = np.repeat(np.repeat(p, fy, axis=0), fx, axis=1)
        chans.append(p[:h, :w])
    if len(comps) == 3 and [cid for cid, *_r in comps] == [1, 2, 3]:
        # JFIF component ids 1/2/3 = YCbCr: invert BT.601
        ych, cb, cr = chans
        chans = [
            ych + 1.402 * (cr - 128.0),
            ych - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
            ych + 1.772 * (cb - 128.0),
        ]
    out = np.empty((h, w, len(comps)), dtype=np.uint8)
    for ci, p in enumerate(chans):
        t = np.rint(p)
        np.clip(t, 0, 255, out=t)
        out[:, :, ci] = t
    return out
