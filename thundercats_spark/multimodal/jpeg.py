"""Pure-stdlib baseline JPEG codec (decode + encode twin for tests).

Closes the dominant real-world gap in the no-lib decoder chain
(multimodal/binary.py): sequential-DCT, 8-bit, Huffman-coded baseline
JPEG (SOF0/SOF1) decodes for REAL here — marker walk, DQT/DHT/DRI/SOS
parsing, canonical-Huffman entropy decode with byte-unstuffing and
restart markers, dequantize + IDCT, chroma upsample, JFIF YCbCr→RGB.
Progressive (SOF2), arithmetic-coded, hierarchical, and 12-bit variants
return None and fall through to the PIL-or-stub branch exactly like the
PNG decoder's 16-bit/interlaced gaps.

This is the CORRECTNESS path, not the throughput path (the per-bit
Huffman loop is Python): when Pillow is importable the `_decoder` chain
in binary.py prefers it for JPEG-sized throughput; at 100 TB the decode
cost is the same either way — one narrow mapInPandas stage, payload
bytes never shuffle.

The encode twin exists so round-trip tests pin the decoder against
ground-truth pixels with NO reference binaries: with a unit quant table
the only loss is float DCT + rounding (max |err| a couple of counts),
and with 2x2 subsampling the chroma box-average/replicate cycle is
exact on chroma-constant images. The encoder uses simple fixed-length
canonical Huffman tables (valid per the spec's canonical construction;
suboptimal size, zero transcription risk) — the decoder reads whatever
DHT the file carries, so its generality is independent of the
encoder's table choice.

Reference parity: the reference has no media codecs at all; this is
brief-mandated multimodal completeness (decode step of the
image-column pipeline).
"""

from __future__ import annotations

import struct

import numpy as np

# Zigzag scan order: position k in the coded stream maps to flat index
# _ZIGZAG[k] of the natural-order 8x8 block.
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix T: forward F = T B T', inverse
    B = T' F T."""
    k = np.arange(8)
    t = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    t[0] *= np.sqrt(1 / 8)
    t[1:] *= np.sqrt(2 / 8)
    return t


_T = _dct_matrix()


class _Corrupt(Exception):
    """Internal: malformed/unsupported entropy data — the public
    decode_jpeg converts this to None (fall through the decoder chain,
    never kill the mapInPandas task)."""


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment, undoing
    0xFF00 byte stuffing; any other marker mid-stream is corruption
    (restart markers are consumed explicitly at MCU boundaries)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.cur = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise _Corrupt("EOF in entropy data")
            b = self.data[self.pos]
            if b == 0xFF:
                if self.pos + 1 >= len(self.data):
                    raise _Corrupt("EOF after 0xFF")
                nxt = self.data[self.pos + 1]
                if nxt != 0x00:
                    raise _Corrupt("marker inside entropy data")
                self.pos += 2
            else:
                self.pos += 1
            self.cur = b
            self.n = 8
        self.n -= 1
        return (self.cur >> self.n) & 1

    def bits(self, count: int) -> int:
        v = 0
        for _ in range(count):
            v = (v << 1) | self.bit()
        return v

    def align_and_expect_rst(self, m: int) -> None:
        """Byte-align and consume the next restart marker, which must be
        RSTm (markers cycle 0-7); spec-legal 0xFF fill bytes before the
        marker are skipped."""
        self.n = 0
        d, p = self.data, self.pos
        while p + 1 < len(d) and d[p] == 0xFF and d[p + 1] == 0xFF:
            p += 1
        if p + 1 >= len(d) or d[p] != 0xFF or d[p + 1] != 0xD0 + (m & 7):
            raise _Corrupt("expected restart marker")
        self.pos = p + 2


def _build_huffman(bits: list[int], vals: bytes) -> dict:
    """Canonical Huffman (length, code) → symbol, per spec C.2."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise _Corrupt("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """Spec EXTEND: map t received bits to the signed coefficient."""
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _decode_block(br, dc_tab, ac_tab, qt, pred: int):
    """One 8x8 data unit → (spatial block float64, new DC predictor)."""
    t = _huff_decode(br, dc_tab)
    if t > 11:
        raise _Corrupt("DC category > 11")
    diff = _extend(br.bits(t), t) if t else 0
    pred += diff
    coeffs = np.zeros(64, dtype=np.float64)
    coeffs[0] = pred * qt[0]
    k = 1
    while k < 64:
        rs = _huff_decode(br, ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if rs == 0x00:  # EOB
                break
            if rs == 0xF0:  # ZRL: 16 zeros
                k += 16
                continue
            raise _Corrupt("bad AC run/size")
        k += r
        if k > 63:
            raise _Corrupt("AC index past 63")
        coeffs[_ZIGZAG[k]] = _extend(br.bits(s), s) * qt[_ZIGZAG[k]]
        k += 1
    block = _T.T @ coeffs.reshape(8, 8) @ _T
    return block, pred


def decode_jpeg(data: bytes):
    """REAL decoder for baseline JPEG (sequential DCT, 8-bit, Huffman;
    grayscale or YCbCr with 1-2x sampling factors, restart markers,
    0xFF00 stuffing). Returns (width, height, 'JPEG', float32 pixels,
    raw 0-255 — the chain's shared scale convention) or None for
    non-JPEG / progressive / arithmetic / 12-bit payloads."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        return None
    try:
        return _decode_jpeg_inner(data)
    except (_Corrupt, IndexError, ValueError, KeyError, struct.error):
        return None


def _decode_jpeg_inner(data: bytes):
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    restart_interval = 0
    frame = None
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise _Corrupt("expected marker")
        # ITU T.81 B.1.1.2: any number of 0xFF FILL bytes may precede a
        # marker — skip them (review r09: a conforming file with one
        # fill byte before SOS decoded as None and fell to the stub)
        while pos + 4 <= len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI before any scan
            return None
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        seg = data[pos + 4 : pos + 2 + seglen]
        if len(seg) != seglen - 2:
            raise _Corrupt("truncated segment")
        if marker in (0xC0, 0xC1):  # baseline / extended-sequential
            precision, h, w, nf = struct.unpack_from(">BHHB", seg, 0)
            if precision != 8 or nf not in (1, 3) or w == 0 or h == 0:
                return None
            comps = []
            for i in range(nf):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * i)
                comps.append([cid, hv >> 4, hv & 0x0F, tq])
            if nf == 1:  # sampling factors are moot for one component
                comps[0][1] = comps[0][2] = 1
            frame = (w, h, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            return None  # progressive / lossless / arithmetic — gated
        elif marker == 0xC4:  # DHT, possibly several tables
            off = 0
            while off < len(seg):
                tc_th = seg[off]
                bits = list(seg[off + 1 : off + 17])
                n = sum(bits)
                vals = seg[off + 17 : off + 17 + n]
                if len(vals) != n:
                    raise _Corrupt("truncated DHT")
                htabs[(tc_th >> 4, tc_th & 0x0F)] = _build_huffman(bits, vals)
                off += 17 + n
        elif marker == 0xDB:  # DQT, possibly several tables
            off = 0
            while off < len(seg):
                pq_tq = seg[off]
                if pq_tq >> 4 != 0:
                    return None  # 16-bit quant table → 12-bit JPEG
                q = np.zeros(64, dtype=np.float64)
                q[_ZIGZAG] = np.frombuffer(seg, np.uint8, 64, off + 1)
                qtabs[pq_tq & 0x0F] = q
                off += 65
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS → entropy-coded data follows
            if frame is None:
                raise _Corrupt("SOS before SOF")
            ns = seg[0]
            scan = {}
            for i in range(ns):
                cs, td_ta = struct.unpack_from(">BB", seg, 1 + 2 * i)
                scan[cs] = (td_ta >> 4, td_ta & 0x0F)
            return _decode_scan(
                data, pos + 2 + seglen, frame, scan, qtabs, htabs,
                restart_interval,
            )
        pos += 2 + seglen
    raise _Corrupt("no SOS marker")


def _decode_scan(data, pos, frame, scan, qtabs, htabs, restart_interval):
    w, h, comps = frame
    if len(scan) != len(comps):
        return None  # non-interleaved multi-scan — not baseline-typical
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    tables = []
    for cid, hc, vc, tq in comps:
        if hmax % hc or vmax % vc:
            raise _Corrupt("non-integer sampling ratio")
        planes.append(
            np.zeros((mcuy * vc * 8, mcux * hc * 8), dtype=np.float64)
        )
        td, ta = scan[cid]
        tables.append((
            htabs[(0, td)], htabs[(1, ta)], qtabs[tq],
        ))
    br = _BitReader(data, pos)
    preds = [0] * len(comps)
    rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            br.align_and_expect_rst(rst)
            rst = (rst + 1) & 7
            preds = [0] * len(comps)
        my, mx = divmod(m, mcux)
        for ci, (cid, hc, vc, tq) in enumerate(comps):
            dc_tab, ac_tab, qt = tables[ci]
            for by in range(vc):
                for bx in range(hc):
                    block, preds[ci] = _decode_block(
                        br, dc_tab, ac_tab, qt, preds[ci]
                    )
                    y0 = (my * vc + by) * 8
                    x0 = (mx * hc + bx) * 8
                    planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
    # level shift, upsample to full resolution, crop
    full = []
    for (cid, hc, vc, tq), plane in zip(comps, planes):
        p = plane + 128.0
        if hc != hmax:
            p = np.repeat(p, hmax // hc, axis=1)
        if vc != vmax:
            p = np.repeat(p, vmax // vc, axis=0)
        full.append(p[:h, :w])
    if len(full) == 1:
        out = np.clip(np.rint(full[0]), 0, 255)
        return w, h, "JPEG", out.astype(np.float32).ravel()
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack(
        [np.clip(np.rint(r), 0, 255), np.clip(np.rint(g), 0, 255),
         np.clip(np.rint(b), 0, 255)],
        axis=-1,
    )
    return w, h, "JPEG", rgb.astype(np.float32).ravel()


# ---------------------------------------------------------------------------
# Encode twin (tests / synthetic corpora).
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        if self.n:
            self.acc <<= 8 - self.n
            self.acc |= (1 << (8 - self.n)) - 1  # pad with 1-bits per spec
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0


# Fixed-length canonical Huffman tables: 12 DC categories at 4 bits
# (Kraft 12/16), all 162 baseline AC symbols at 8 bits (162/256). Valid
# canonical tables with zero spec-transcription risk; the decoder reads
# them from DHT, so file-reading generality doesn't depend on them.
_DC_SYMS = list(range(12))
_AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]


def _fixed_table(symbols: list[int], length: int):
    bits = [0] * 16
    bits[length - 1] = len(symbols)
    codes = {sym: (i, length) for i, sym in enumerate(symbols)}
    return bits, bytes(symbols), codes


_DC_BITS, _DC_VALS, _DC_CODES = _fixed_table(_DC_SYMS, 4)
_AC_BITS, _AC_VALS, _AC_CODES = _fixed_table(_AC_SYMS, 8)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(bw: _BitWriter, block: np.ndarray, qt: np.ndarray,
                  pred: int) -> int:
    coeffs = _T @ (block - 128.0) @ _T.T
    q = np.rint(coeffs.ravel() / qt).astype(np.int64)
    dc = int(q[0])
    diff = dc - pred
    t = _category(diff)
    code, ln = _DC_CODES[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    zz = q[_ZIGZAG[1:]]
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz) else -1
    for k in range(last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = _AC_CODES[0xF0]
            bw.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = _AC_CODES[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 62:
        code, ln = _AC_CODES[0x00]
        bw.write(code, ln)
    return dc


def _pad_to_blocks(plane: np.ndarray, bh: int, bw_: int) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, bh - h), (0, bw_ - w)), mode="edge")


def encode_jpeg(
    w: int,
    h: int,
    pixels: np.ndarray,
    channels: int = 3,
    subsampling: tuple[int, int] = (1, 1),
    quant: int = 1,
    restart_interval: int = 0,
) -> bytes:
    """Minimal baseline JPEG writer — the encode twin of
    ``decode_jpeg`` for round-trip tests and synthetic corpora.
    ``subsampling=(2, 2)`` boxes chroma 4:2:0; ``quant`` fills both
    quant tables uniformly (1 = near-lossless, only DCT float +
    rounding loss); ``restart_interval`` > 0 emits DRI + RSTn markers
    so the decoder's restart path can be exercised."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 (gray) or 3 (RGB)")
    if not 1 <= int(quant) <= 255:
        # quant=0 divides by zero in _encode_block (NaN/inf
        # coefficients); quant>255 wraps in the uint8 DQT write, so the
        # file's STORED table would mismatch the table used to
        # quantize, silently corrupting every decoded pixel (ADVICE r09)
        raise ValueError(f"quant must be in [1, 255], got {quant!r}")
    sh, sv = subsampling
    if channels == 1:
        sh = sv = 1
    arr = np.asarray(pixels, dtype=np.float64).reshape(h, w, channels)
    if channels == 3:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        yp = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if (sh, sv) != (1, 1):
            ph = -(-h // sv) * sv
            pw = -(-w // sh) * sh
            cb = _pad_to_blocks(cb, ph, pw)
            cr = _pad_to_blocks(cr, ph, pw)
            cb = cb.reshape(ph // sv, sv, pw // sh, sh).mean(axis=(1, 3))
            cr = cr.reshape(ph // sv, sv, pw // sh, sh).mean(axis=(1, 3))
        planes = [yp, cb, cr]
        samps = [(sh, sv), (1, 1), (1, 1)]
        qids = [0, 1, 1]
    else:
        planes = [arr[..., 0]]
        samps = [(1, 1)]
        qids = [0]

    qt = np.full(64, float(quant))
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = []
    for (hc, vc), plane in zip(samps, planes):
        padded.append(_pad_to_blocks(plane, mcuy * vc * 8, mcux * hc * 8))

    out = bytearray(b"\xff\xd8")

    def segment(marker: int, payload: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(payload) + 2))
        out.extend(payload)

    zz_q = np.zeros(64, dtype=np.uint8)
    zz_q[np.arange(64)] = qt[_ZIGZAG].astype(np.uint8)
    segment(0xDB, bytes([0x00]) + zz_q.tobytes())
    if channels == 3:
        segment(0xDB, bytes([0x01]) + zz_q.tobytes())
    sof = struct.pack(">BHHB", 8, h, w, channels)
    for i, (hc, vc) in enumerate(samps):
        sof += struct.pack(">BBB", i + 1, (hc << 4) | vc, qids[i])
    segment(0xC0, sof)
    for tc_th, bits, vals in (
        ((0 << 4) | 0, _DC_BITS, _DC_VALS),
        ((1 << 4) | 0, _AC_BITS, _AC_VALS),
    ):
        segment(0xC4, bytes([tc_th]) + bytes(bits) + vals)
    if channels == 3:
        for tc_th, bits, vals in (
            ((0 << 4) | 1, _DC_BITS, _DC_VALS),
            ((1 << 4) | 1, _AC_BITS, _AC_VALS),
        ):
            segment(0xC4, bytes([tc_th]) + bytes(bits) + vals)
    if restart_interval:
        segment(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([channels])
    for i in range(channels):
        td_ta = 0 if i == 0 else 0x11
        sos += struct.pack(">BB", i + 1, td_ta)
    sos += bytes([0, 63, 0])
    segment(0xDA, sos)

    bw = _BitWriter()
    preds = [0] * channels
    rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            bw.flush()
            out.extend(bw.out)
            bw = _BitWriter()
            out.extend(bytes([0xFF, 0xD0 + rst]))
            rst = (rst + 1) & 7
            preds = [0] * channels
        my, mx = divmod(m, mcux)
        for ci, (hc, vc) in enumerate(samps):
            for by in range(vc):
                for bx in range(hc):
                    y0 = (my * vc + by) * 8
                    x0 = (mx * hc + bx) * 8
                    preds[ci] = _encode_block(
                        bw, padded[ci][y0 : y0 + 8, x0 : x0 + 8], qt,
                        preds[ci],
                    )
    bw.flush()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")
    return bytes(out)
