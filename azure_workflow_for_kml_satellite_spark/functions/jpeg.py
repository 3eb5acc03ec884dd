"""From-scratch baseline JPEG (JFIF) codec — pure numpy/stdlib.

No PIL/libjpeg exists in this container, so (like the PNG decoder in
functions/png.py and the GeoTIFF codec in functions/geotiff.py) the engine
carries its own implementation of the public format:

- ``decode_jpeg``: baseline sequential DCT JPEG (SOF0), 8-bit, grayscale or
  YCbCr with sampling factors up to 2x2 (covers 4:4:4 / 4:2:2 / 4:2:0 —
  what cameras and web encoders actually emit), restart markers (DRI/RSTn),
  Huffman + quantization tables read from the stream. Progressive (SOF2),
  arithmetic and 12-bit variants raise ValueError (quarantined upstream).
- ``encode_jpeg``: baseline 4:4:4 encoder used by tests and synthetic data
  generation; emits its own (valid, simple) canonical Huffman tables in DHT
  rather than the Annex-K defaults — any conformant decoder reads tables
  from the stream, so interchange is unaffected (compression ratio is not
  the point here; correctness is).

The decoder's IDCT is the float DCT-III of the orthonormal DCT-II the
encoder applies, so encode→decode error is bounded by quantization alone
(tested: flat blocks near-exact, smooth gradients within the quant step).
"""

from __future__ import annotations

import struct

import numpy as np

# ── shared constants ─────────────────────────────────────────────────────────

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
UNZIGZAG = np.argsort(ZIGZAG)

# mild flat quantization tables (stored in DQT; any decoder reads them back)
QUANT_LUMA = np.full(64, 12, dtype=np.uint8)
QUANT_LUMA[0] = 8
QUANT_CHROMA = np.full(64, 16, dtype=np.uint8)
QUANT_CHROMA[0] = 8

# DCT-II orthonormal basis (8-point), used by both encoder and decoder
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16.0) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


def _dct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


def _idct2(coef: np.ndarray) -> np.ndarray:
    return _C.T @ coef @ _C


# ── Huffman ──────────────────────────────────────────────────────────────────


def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """JPEG canonical Huffman: {symbol: (code, length)} from the DHT BITS
    (count of codes per length 1..16) + value list."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    vi = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[vi]] = (code, length)
            code += 1
            vi += 1
        code <<= 1
    return codes


def _simple_tables() -> tuple[tuple[list[int], list[int]], tuple[list[int], list[int]]]:
    """(dc, ac) encoder tables: all 12 DC categories at 4 bits, all 162 AC
    (run,size) symbols at 8 bits — valid canonical codes (Kraft < 1)."""
    dc_bits = [0, 0, 0, 12] + [0] * 12
    dc_vals = list(range(12))
    ac_vals = [0x00, 0xF0]
    for run in range(16):
        for size in range(1, 11):
            ac_vals.append((run << 4) | size)
    ac_bits = [0] * 16
    ac_bits[7] = len(ac_vals)  # all at length 8
    return (dc_bits, dc_vals), (ac_bits, ac_vals)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_eat_restart(self) -> None:
        """Drop pad bits and consume one RSTn marker."""
        self.nbits = 0
        while self.data[self.pos] == 0xFF and self.data[self.pos + 1] == 0x00:
            self.pos += 2
        if self.data[self.pos] != 0xFF or not (0xD0 <= self.data[self.pos + 1] <= 0xD7):
            raise ValueError("expected restart marker")
        self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


class _HuffDecoder:
    """Code → symbol via (length, code) lookup built from DHT."""

    def __init__(self, bits: list[int], values: list[int]) -> None:
        self.lut: dict[tuple[int, int], int] = {}
        code = 0
        vi = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lut[(length, code)] = values[vi]
                code += 1
                vi += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            sym = self.lut.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy stream")


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length() if v < 0 else 0


def _encode_magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: (extra bits value, category)."""
    cat = _category(v)
    if v < 0:
        v = v + (1 << cat) - 1
    return v, cat


def _extend(v: int, cat: int) -> int:
    if cat == 0:
        return 0
    if v < (1 << (cat - 1)):
        return v - (1 << cat) + 1
    return v


# ── encoder ──────────────────────────────────────────────────────────────────


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    f = img.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def _pad_to_8(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def _encode_block(bw, block, q_nat, pred, dc_codes, ac_codes) -> int:
    coef = _dct2(block - 128.0)
    qc = np.rint(coef / q_nat).astype(np.int64)
    zz = qc.flatten()[ZIGZAG]
    diff = int(zz[0]) - pred
    extra, cat = _encode_magnitude(diff)
    code, length = dc_codes[cat]
    bw.write(code, length)
    if cat:
        bw.write(extra, cat)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c0, l0 = ac_codes[0xF0]
            bw.write(c0, l0)
            run -= 16
        extra, cat = _encode_magnitude(v)
        c1, l1 = ac_codes[(run << 4) | cat]
        bw.write(c1, l1)
        bw.write(extra, cat)
        run = 0
    if run:
        c2, l2 = ac_codes[0x00]  # EOB
        bw.write(c2, l2)
    return int(zz[0])


def encode_jpeg(
    img: np.ndarray,
    subsample: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """HxWx3 uint8 RGB (or HxW grayscale) → baseline JFIF bytes.

    ``subsample``: '4:4:4' (1x1 chroma), '4:2:2' (2x1 luma factors) or
    '4:2:0' (2x2) — chroma is box-averaged. ``restart_interval`` > 0 emits
    DRI + RSTn markers every N MCUs (resets DC prediction), exercising the
    decoder's restart path."""
    if img.ndim == 2:
        img = np.stack([img, img, img], axis=-1)
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_jpeg expects HxWx3 uint8 (or HxW grayscale)")
    h, w = img.shape[:2]
    if h > 65535 or w > 65535 or h == 0 or w == 0:
        raise ValueError(f"image dimensions {w}x{h} outside JPEG's 1..65535 range")
    factors = {"4:4:4": (1, 1), "4:2:2": (2, 1), "4:2:0": (2, 2)}
    if subsample not in factors:
        raise ValueError(f"unsupported subsampling {subsample!r}")
    hf, vf = factors[subsample]
    ycc = _rgb_to_ycbcr(img)

    def _downsample(plane: np.ndarray) -> np.ndarray:
        if hf == 1 and vf == 1:
            return plane
        ph = (plane.shape[0] + vf - 1) // vf * vf
        pw = (plane.shape[1] + hf - 1) // hf * hf
        p = np.pad(plane, ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])), mode="edge")
        return p.reshape(ph // vf, vf, pw // hf, hf).mean(axis=(1, 3))

    comps = [
        {"plane": ycc[..., 0], "h": hf, "v": vf, "tq": 0, "q": QUANT_LUMA},
        {"plane": _downsample(ycc[..., 1]), "h": 1, "v": 1, "tq": 1, "q": QUANT_CHROMA},
        {"plane": _downsample(ycc[..., 2]), "h": 1, "v": 1, "tq": 1, "q": QUANT_CHROMA},
    ]
    mcux = (w + 8 * hf - 1) // (8 * hf)
    mcuy = (h + 8 * vf - 1) // (8 * vf)
    for c in comps:
        need_h, need_w = mcuy * c["v"] * 8, mcux * c["h"] * 8
        p = c["plane"]
        c["plane"] = np.pad(
            p, ((0, need_h - p.shape[0]), (0, need_w - p.shape[1])), mode="edge"
        )
        c["q_nat"] = c["q"][UNZIGZAG].reshape(8, 8)

    (dc_bits, dc_vals), (ac_bits, ac_vals) = _simple_tables()
    dc_codes = _canonical_codes(dc_bits, dc_vals)
    ac_codes = _canonical_codes(ac_bits, ac_vals)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    entropy = bytearray()
    bw = _BitWriter()
    preds = [0, 0, 0]
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                entropy += bw.flush()
                entropy += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                bw = _BitWriter()
                preds = [0, 0, 0]
            for ci, c in enumerate(comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        block = c["plane"][y0 : y0 + 8, x0 : x0 + 8]
                        preds[ci] = _encode_block(
                            bw, block, c["q_nat"], preds[ci], dc_codes, ac_codes
                        )
            mcu_count += 1
    entropy += bw.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(QUANT_LUMA))
    out += seg(0xDB, bytes([1]) + bytes(QUANT_CHROMA))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, c in zip((1, 2, 3), comps):
        sof += struct.pack(">BBB", cid, (c["h"] << 4) | c["v"], c["tq"])
    out += seg(0xC0, sof)
    for cls_id, (bits, vals) in (
        ((0 << 4) | 0, (dc_bits, dc_vals)),
        ((1 << 4) | 0, (ac_bits, ac_vals)),
        ((0 << 4) | 1, (dc_bits, dc_vals)),
        ((1 << 4) | 1, (ac_bits, ac_vals)),
    ):
        out += seg(0xC4, bytes([cls_id]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = struct.pack(">B", 3)
    for cid, tables in ((1, 0x00), (2, 0x11), (3, 0x11)):
        sos += struct.pack(">BB", cid, tables)
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ── decoder ──────────────────────────────────────────────────────────────────


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes → HxWxC uint8 (C = 1 or 3). Raises ValueError on
    non-baseline variants or corrupt streams."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    frame = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1  # legal 0xFF fill bytes before a marker
        if pos + 1 >= len(data):
            raise ValueError("truncated JPEG stream")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("EOI before SOS")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        (length,) = struct.unpack_from(">H", data, pos)
        payload = data[pos + 2 : pos + length]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                p += 1
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                quant[tq] = np.frombuffer(payload, np.uint8, 64, p).astype(np.int32)
                p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0x0F
                bits = list(payload[p + 1 : p + 17])
                n = sum(bits)
                vals = list(payload[p + 17 : p + 17 + n])
                dec = _HuffDecoder(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = dec
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", payload, 0)
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", payload, 6 + 3 * i)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("progressive/extended JPEG unsupported (baseline only)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", payload, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = payload[0]
            scan = []
            for i in range(ns):
                cs, tables = struct.unpack_from(">BB", payload, 1 + 2 * i)
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append({**comp, "td": tables >> 4, "ta": tables & 0x0F})
            return _decode_scan(
                data, pos + length, frame, scan, quant, huff_dc, huff_ac, restart_interval
            )
        pos += length
    raise ValueError("no SOS marker found")


def _decode_scan(data, pos, frame, scan, quant, huff_dc, huff_ac, restart_interval):
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    if hmax > 2 or vmax > 2 or any(c["h"] < 1 or c["v"] < 1 for c in scan):
        raise ValueError("sampling factors beyond 2x2 unsupported")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in scan:
        planes.append(
            np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        )
    br = _BitReader(data, pos)
    preds = [0] * len(scan)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.align_and_eat_restart()
                preds = [0] * len(scan)
            try:
                for ci, c in enumerate(scan):
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            zz = np.zeros(64, dtype=np.int64)
                            sym = huff_dc[c["td"]].decode(br)
                            diff = _extend(br.read_bits(sym), sym) if sym else 0
                            preds[ci] += diff
                            zz[0] = preds[ci]
                            k = 1
                            while k < 64:
                                rs = huff_ac[c["ta"]].decode(br)
                                if rs == 0x00:  # EOB
                                    break
                                if rs == 0xF0:  # ZRL
                                    k += 16
                                    continue
                                k += rs >> 4
                                size = rs & 0x0F
                                if k > 63:
                                    raise ValueError("AC index overrun")
                                zz[k] = _extend(br.read_bits(size), size)
                                k += 1
                            coef = np.zeros(64, dtype=np.float64)
                            coef[ZIGZAG] = zz * quant[c["tq"]][np.arange(64)]
                            block = _idct2(coef.reshape(8, 8)) + 128.0
                            y0 = (my * c["v"] + by) * 8
                            x0 = (mx * c["h"] + bx) * 8
                            planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
            except _RestartMarker:
                raise ValueError("unexpected restart marker placement") from None
            mcu_count += 1
    # upsample to full resolution and crop
    full = []
    for ci, c in enumerate(scan):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)[..., None]
    if len(full) == 3:
        return _ycbcr_to_rgb(np.stack(full, axis=-1))
    raise ValueError(f"unsupported component count {len(full)}")
