"""Baseline JPEG codec — stdlib + numpy only (no PIL in this container).

Decoder (`decode_jpeg`): JFIF marker walk → DQT / DHT / SOF0 / DRI /
SOS → Huffman-decoded interleaved MCUs (generic canonical tables from
DHT, restart-marker aware) → dequantize → inverse zigzag → float IDCT →
nearest-neighbor chroma upsample → fixed-point integer YCbCr→RGB.
Covers baseline sequential DCT (SOF0), 8-bit, grayscale or YCbCr with
luma sampling 1x1 / 2x1 / 1x2 / 2x2; progressive (SOF2), arithmetic
coding, and 12-bit precision raise NotImplementedError so callers
surface decode_ok=false per row (the SlsParser boundary discipline —
ref sp/input/SlsParser.java:13-303).

Encoder (`encode_jpeg_baseline`): the test-fixture twin — RGB →
fixed-point YCbCr → 8x8 FDCT → half-away quantization → canonical
fixed-length Huffman tables emitted via DHT (12 DC symbols at 4 bits,
162 AC symbols at 8 bits — deliberately NOT the Annex K tables, so the
decoder's generic DHT path is what gets exercised). 4:4:4 and 4:2:0.

Every rounding step is pinned to integer arithmetic so a SQL oracle
can reproduce flat-block decodes exactly:
  - color transforms use /65536 fixed point with floor shifts
    (division by a power of two is exact in doubles, so DuckDB
    floor(x/65536.0) matches numpy's >> 16 bit-for-bit);
  - quantization rounds half away from zero via the integer form
    sign(F) * ((2|F| + Q) // (2Q));
  - the demo quant table is uniform 16, so a DC-only block
    reconstructs to exactly 2*qdc + 128 (16/8 = 2) with no float
    rounding ambiguity in the IDCT.

At 100 TB the hot path swaps this pure-Python entropy loop for
libjpeg-turbo behind the identical (content → pixels) contract; the
Spark-side plumbing (Arrow mapInPandas, schema, decode_ok) is the part
that carries over unchanged.
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_SIGNATURE = b"\xff\xd8\xff"


def _zigzag() -> "list[tuple[int, int]]":
    out = []
    for s in range(15):
        rng = list(range(max(0, s - 7), min(s, 7) + 1))
        if s % 2 == 0:
            rng.reverse()
        out.extend((r, s - r) for r in rng)
    return out


ZIGZAG = _zigzag()  # scan index -> (row, col)

_T = np.zeros((8, 8))
for _u in range(8):
    _c = (1 / np.sqrt(2)) if _u == 0 else 1.0
    for _x in range(8):
        _T[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _fdct(block: np.ndarray) -> np.ndarray:
    out = _T @ block @ _T.T
    # The DC term is sum/8 — exact in doubles for integer-valued blocks
    # (power-of-two divide), where the matrix product carries ~1e-13 of
    # rounding. Pinning it keeps half-step quantization deterministic,
    # which the closed-form flat-block oracle depends on.
    out[0, 0] = block.sum() / 8.0
    return out


def _idct(coef: np.ndarray) -> np.ndarray:
    return _T.T @ coef @ _T


# fixed-point color constants (/65536), floor-shift rounding with +32768
_Y_R, _Y_G, _Y_B = 19595, 38470, 7471
_CB_R, _CB_G, _CB_B = -11059, -21709, 32768
_CR_R, _CR_G, _CR_B = 32768, -27439, -5329
_R_CR = 91881
_G_CB, _G_CR = 22554, 46802
_B_CB = 116130


def rgb_to_ycbcr(arr: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 RGB → (h, w, 3) uint8 YCbCr, integer fixed point."""
    r = arr[:, :, 0].astype(np.int64)
    g = arr[:, :, 1].astype(np.int64)
    b = arr[:, :, 2].astype(np.int64)
    y = (_Y_R * r + _Y_G * g + _Y_B * b + 32768) >> 16
    cb = 128 + ((_CB_R * r + _CB_G * g + _CB_B * b + 32768) >> 16)
    cr = 128 + ((_CR_R * r + _CR_G * g + _CR_B * b + 32768) >> 16)
    return np.clip(np.stack([y, cb, cr], axis=-1), 0, 255).astype(np.uint8)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    """(h, w, 3) int YCbCr → (h, w, 3) uint8 RGB, integer fixed point."""
    y = ycc[:, :, 0].astype(np.int64)
    cb = ycc[:, :, 1].astype(np.int64) - 128
    cr = ycc[:, :, 2].astype(np.int64) - 128
    r = y + ((_R_CR * cr + 32768) >> 16)
    g = y - ((_G_CB * cb + _G_CR * cr + 32768) >> 16)
    b = y + ((_B_CB * cb + 32768) >> 16)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def quantize(coefs: np.ndarray, qtable: np.ndarray) -> np.ndarray:
    """Round half away from zero, integer-exact: sign(F)*((2|F|+Q)//(2Q))
    evaluated in floats only up to the absolute value (the DCT output)."""
    a = np.abs(coefs)
    q = np.floor((2.0 * a + qtable) / (2.0 * qtable)).astype(np.int32)
    return np.where(coefs < 0, -q, q)


DEMO_QTABLE = np.full((8, 8), 16, dtype=np.int32)


# ---------------------------------------------------------------------------
# Huffman machinery (canonical, per ITU T.81 Annex C code assignment)
# ---------------------------------------------------------------------------


def _canonical_codes(counts: "list[int]", symbols: "list[int]"):
    """DHT (counts-per-length, symbol list) → {symbol: (code, length)}."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(counts: "list[int]", symbols: "list[int]"):
    """DHT → {(length, code): symbol} for the bit-serial decoder."""
    enc = _canonical_codes(counts, symbols)
    return {(ln, code): sym for sym, (code, ln) in enc.items()}


class _BitReader:
    """MSB-first reader over the entropy-coded segment. 0xFF00 stuffing
    is undone; RST markers terminate the current interval (the caller
    resets DC predictors and realigns)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.bitbuf = (self.bitbuf << 8) | 0xFF  # pad per spec
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:  # stuffed literal 0xFF
                    self.pos += 2
                else:  # a real marker: stop consuming, pad with 1s
                    self.bitbuf = (self.bitbuf << 8) | 0xFF
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.bitbuf = (self.bitbuf << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise NotImplementedError("JPEG: invalid Huffman stream")

    def align_to_marker(self) -> int:
        """Skip to the next marker (for RST handling); returns its code."""
        self.bitbuf = 0
        self.nbits = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and self.data[self.pos + 1] != 0x00:
                marker = self.data[self.pos + 1]
                self.pos += 2
                return marker
            self.pos += 1
        return 0xD9


def _extend(v: int, size: int) -> int:
    """T.81 EXTEND: map `size`-bit magnitude v to its signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_jpeg(content: bytes) -> np.ndarray:
    """Baseline JPEG bytes → (h, w, 3) uint8 RGB."""
    if content[:3] != JPEG_SIGNATURE[:3] and content[:2] != b"\xff\xd8":
        raise NotImplementedError("JPEG: missing SOI")
    qtables: "dict[int, np.ndarray]" = {}
    dc_tabs: "dict[int, dict]" = {}
    ac_tabs: "dict[int, dict]" = {}
    restart_interval = 0
    frame = None
    pos = 2
    while pos + 4 <= len(content):
        if content[pos] != 0xFF:
            raise NotImplementedError("JPEG: marker desync")
        marker = content[pos + 1]
        if marker == 0xD8:
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", content, pos + 2)
        body = content[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0xF
                if pq != 0:
                    raise NotImplementedError("JPEG: 16-bit quant tables")
                t = np.zeros((8, 8), dtype=np.int32)
                for k in range(64):
                    r, c = ZIGZAG[k]
                    t[r, c] = body[off + 1 + k]
                qtables[tq] = t
                off += 65
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0xF
                counts = list(body[off + 1 : off + 17])
                n = sum(counts)
                symbols = list(body[off + 17 : off + 17 + n])
                (dc_tabs if tc == 0 else ac_tabs)[th] = _decode_table(counts, symbols)
                off += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            precision, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if precision != 8:
                raise NotImplementedError("JPEG: only 8-bit precision")
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * ci)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError("JPEG: only baseline sequential (SOF0)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise NotImplementedError("JPEG: SOS before SOF0")
            ns = body[0]
            scan = {}
            for si in range(ns):
                cs, tt = body[1 + 2 * si], body[2 + 2 * si]
                scan[cs] = (tt >> 4, tt & 0xF)
            return _decode_scan(
                content, pos, frame, scan, qtables, dc_tabs, ac_tabs,
                restart_interval,
            )
        elif marker == 0xD9:  # EOI before SOS
            break
        # APPn/COM/others: skipped via seglen
    raise NotImplementedError("JPEG: no scan data")


def _decode_scan(data, pos, frame, scan, qtables, dc_tabs, ac_tabs, restart):
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    max_h = max(c["h"] for c in comps)
    max_v = max(c["v"] for c in comps)
    if max_h > 2 or max_v > 2:
        raise NotImplementedError("JPEG: sampling factors > 2")
    mcus_x = -(-w // (8 * max_h))
    mcus_y = -(-h // (8 * max_v))
    planes = []
    for c in comps:
        pw, ph = mcus_x * c["h"] * 8, mcus_y * c["v"] * 8
        planes.append(np.zeros((ph, pw), dtype=np.int32))

    reader = _BitReader(data, pos)
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and mcu_count and mcu_count % restart == 0:
                marker = reader.align_to_marker()
                if not (0xD0 <= marker <= 0xD7):
                    raise NotImplementedError("JPEG: expected RST marker")
                preds = [0] * len(comps)
            for ci, c in enumerate(comps):
                dct, act = scan[c["id"]]
                qt = qtables[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        block = _decode_block(
                            reader, dc_tabs[dct], ac_tabs[act], qt, preds, ci
                        )
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1

    full = []
    for c, plane in zip(comps, planes):
        if c["h"] < max_h or c["v"] < max_v:  # nearest upsample
            plane = plane.repeat(max_v // c["v"], axis=0).repeat(
                max_h // c["h"], axis=1
            )
        full.append(plane[:h, :w])
    if len(comps) == 1:
        g = np.clip(full[0], 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    return ycbcr_to_rgb(np.stack(full, axis=-1))


def _decode_block(reader, dc_tab, ac_tab, qtable, preds, ci) -> np.ndarray:
    coefs = np.zeros((8, 8), dtype=np.float64)
    size = reader.read_symbol(dc_tab)
    diff = _extend(reader.receive(size), size)
    preds[ci] += diff
    coefs[0, 0] = preds[ci] * qtable[0, 0]
    k = 1
    while k < 64:
        rs = reader.read_symbol(ac_tab)
        run, size = rs >> 4, rs & 0xF
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise NotImplementedError("JPEG: AC index overflow")
        r, c = ZIGZAG[k]
        coefs[r, c] = _extend(reader.receive(size), size) * qtable[r, c]
        k += 1
    pix = np.round(_idct(coefs)) + 128
    return np.clip(pix, 0, 255).astype(np.int32)


# ---------------------------------------------------------------------------
# encoder (test fixtures)
# ---------------------------------------------------------------------------

_DC_SYMBOLS = list(range(12))  # categories 0..11, all 4-bit codes
_DC_COUNTS = [0, 0, 0, 12] + [0] * 12
_AC_SYMBOLS = [(r << 4) | s for r in range(16) for s in range(1, 11)]
_AC_SYMBOLS += [0x00, 0xF0]  # EOB, ZRL
_AC_COUNTS = [0] * 7 + [len(_AC_SYMBOLS)] + [0] * 8  # all 8-bit codes
_DC_CODES = _canonical_codes(_DC_COUNTS, _DC_SYMBOLS)
_AC_CODES = _canonical_codes(_AC_COUNTS, _AC_SYMBOLS)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.out)

    def flush_segment(self) -> bytes:
        """Byte-align and emit the pending entropy bytes (before an RST
        marker), then reset for the next restart interval."""
        data = self.flush()
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0
        return data


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _encode_block(writer: _BitWriter, block: np.ndarray, qtable, pred: int) -> int:
    coefs = quantize(_fdct(block.astype(np.float64) - 128.0), qtable)
    zz = [int(coefs[r, c]) for r, c in ZIGZAG]
    diff = zz[0] - pred
    size = _category(diff)
    writer.write(*_DC_CODES[size])
    if size:
        writer.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, last_nz + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            writer.write(*_AC_CODES[0xF0])
            run -= 16
        size = _category(zz[k])
        writer.write(*_AC_CODES[(run << 4) | size])
        v = zz[k]
        writer.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        writer.write(*_AC_CODES[0x00])  # EOB
    return zz[0]


def _dht_segment() -> bytes:
    body = b""
    for tc_th, counts, symbols in (
        (0x00, _DC_COUNTS, _DC_SYMBOLS),
        (0x10, _AC_COUNTS, _AC_SYMBOLS),
        (0x01, _DC_COUNTS, _DC_SYMBOLS),
        (0x11, _AC_COUNTS, _AC_SYMBOLS),
    ):
        body += bytes([tc_th]) + bytes(counts) + bytes(symbols)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg_baseline(
    arr: np.ndarray,
    qtable: "np.ndarray | None" = None,
    subsampling: str = "444",
    restart_every: int = 0,
) -> bytes:
    """(h, w, 3) uint8 RGB → baseline JFIF bytes. 4:4:4 needs h, w
    multiples of 8; 4:2:0 multiples of 16 (fixture encoder — no edge
    padding). Same quant table for luma and chroma. `restart_every` > 0
    emits a DRI segment and RSTn markers every that-many MCUs (resets
    DC predictors + byte-aligns), exercising the decoder's restart
    path."""
    qt = DEMO_QTABLE if qtable is None else np.asarray(qtable, dtype=np.int32)
    h, w = arr.shape[:2]
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    mcu = 8 if subsampling == "444" else 16
    if h % mcu or w % mcu:
        raise ValueError(f"fixture encoder needs dims multiple of {mcu}")
    ycc = rgb_to_ycbcr(arr).astype(np.float64)
    yp, cb, cr = ycc[:, :, 0], ycc[:, :, 1], ycc[:, :, 2]
    if subsampling == "420":
        cb = cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
        cr = cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
        cb = np.floor(cb + 0.5)
        cr = np.floor(cr + 0.5)
        samp_y = 0x22
    else:
        samp_y = 0x11

    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    zz_q = bytes(int(qt[r, c]) for r, c in ZIGZAG)
    out += b"\xff\xdb" + struct.pack(">H", 2 + 2 * 65)
    out += b"\x00" + zz_q + b"\x01" + zz_q
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * 3, 8, h, w, 3)
    out += bytes([1, samp_y, 0, 2, 0x11, 1, 3, 0x11, 1])
    out += _dht_segment()
    if restart_every:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_every)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * 3, 3)
    out += bytes([1, 0x00, 2, 0x11, 3, 0x11]) + b"\x00\x3f\x00"

    writer = _BitWriter()
    preds = [0, 0, 0]
    mcu_count = 0
    rst_idx = 0

    def maybe_restart() -> None:
        nonlocal preds, rst_idx
        if restart_every and mcu_count and mcu_count % restart_every == 0:
            nonlocal out
            out += writer.flush_segment()
            out += bytes([0xFF, 0xD0 + rst_idx])
            rst_idx = (rst_idx + 1) % 8
            preds = [0, 0, 0]

    if subsampling == "444":
        for my in range(h // 8):
            for mx in range(w // 8):
                maybe_restart()
                for ci, plane in enumerate((yp, cb, cr)):
                    blk = plane[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
                    preds[ci] = _encode_block(writer, blk, qt, preds[ci])
                mcu_count += 1
    else:
        for my in range(h // 16):
            for mx in range(w // 16):
                maybe_restart()
                for by in range(2):
                    for bx in range(2):
                        y0, x0 = my * 16 + by * 8, mx * 16 + bx * 8
                        blk = yp[y0 : y0 + 8, x0 : x0 + 8]
                        preds[0] = _encode_block(writer, blk, qt, preds[0])
                for ci, plane in ((1, cb), (2, cr)):
                    blk = plane[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
                    preds[ci] = _encode_block(writer, blk, qt, preds[ci])
                mcu_count += 1
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)
