"""From-scratch FLAC frame codec (multimodal audio column support).

Decoder implements the full published FLAC bitstream for audio frames —
frame-header parse (blocking strategy, coded block size / sample rate /
channel assignment / sample size, UTF-8-coded frame number, CRC-8),
subframes (CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32, wasted
bits), Rice-coded residual partitions (4- and 5-bit parameters with raw
escape), stereo decorrelation (left/side, right/side, mid/side) and the
frame CRC-16 — so ``audio_metadata`` emits true rms/peak for compressed
FLAC payloads, not just the STREAMINFO walk.

The encoder is a deliberately small subset used by tests and the synthetic
corpus (constant / verbatim / fixed-order Rice subframes, independent or
mid/side stereo); the decoder does not depend on it.

Spec: the public FLAC format specification (RFC 9639 / xiph.org). The
reference repo has no audio at all — this surface is brief-scope
(multimodal training-data columns), SURVEY.md §6.
"""

from __future__ import annotations

import struct

import numpy as np

# ── CRCs (FLAC frame header CRC-8 poly 0x07, frame CRC-16 poly 0x8005) ──────


def _crc_table(poly: int, width: int) -> list[int]:
    mask = (1 << width) - 1
    top = 1 << (width - 1)
    table = []
    for byte in range(256):
        reg = byte << (width - 8)
        for _ in range(8):
            reg = ((reg << 1) ^ poly) & mask if reg & top else (reg << 1) & mask
        table.append(reg)
    return table


_CRC8_TABLE = _crc_table(0x07, 8)
_CRC16_TABLE = _crc_table(0x8005, 16)


def crc8(data: bytes) -> int:
    reg = 0
    for b in data:
        reg = _CRC8_TABLE[reg ^ b]
    return reg


def crc16(data: bytes) -> int:
    reg = 0
    for b in data:
        reg = ((reg << 8) & 0xFFFF) ^ _CRC16_TABLE[(reg >> 8) ^ b]
    return reg


# ── bit IO ───────────────────────────────────────────────────────────────────


class _BitReader:
    def __init__(self, data: bytes, byte_pos: int = 0):
        self.data = data
        self.pos = byte_pos  # byte index
        self.bit = 0  # bits consumed in current byte (0-7)

    def read(self, n: int) -> int:
        out = 0
        data = self.data
        while n > 0:
            if self.pos >= len(data):
                raise ValueError("FLAC bitstream truncated")
            avail = 8 - self.bit
            take = avail if avail < n else n
            cur = data[self.pos]
            out = (out << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            n -= take
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return out

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def read_unary(self) -> int:
        count = 0
        while True:
            if self.pos >= len(self.data):
                raise ValueError("FLAC bitstream truncated in unary code")
            if self.read(1):
                return count
            count += 1
            if count > 1 << 24:
                raise ValueError("implausible FLAC unary run")

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


def _read_utf8_number(r: _BitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    n_cont = 0
    probe = b0
    while probe & 0x40:
        n_cont += 1
        probe <<= 1
    if n_cont == 0 or n_cont > 6:
        raise ValueError("invalid FLAC UTF-8-coded number")
    val = b0 & (0x3F >> n_cont)
    for _ in range(n_cont):
        c = r.read(8)
        if (c & 0xC0) != 0x80:
            raise ValueError("invalid FLAC UTF-8 continuation byte")
        val = (val << 6) | (c & 0x3F)
    return val


# ── frame decode ────────────────────────────────────────────────────────────

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _decode_residual(r: _BitReader, block_size: int, order: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise ValueError(f"reserved FLAC residual method {method}")
    pbits, escape = (4, 0xF) if method == 0 else (5, 0x1F)
    po = r.read(4)
    n_parts = 1 << po
    if block_size % n_parts:
        raise ValueError("FLAC block size not divisible by partitions")
    out: list[int] = []
    for p in range(n_parts):
        n = (block_size >> po) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("FLAC partition underflow")
        param = r.read(pbits)
        if param == escape:
            raw = r.read(5)
            if raw == 0:
                out.extend([0] * n)
            else:
                for _ in range(n):
                    out.append(r.read_signed(raw))
        else:
            for _ in range(n):
                q = r.read_unary()
                u = (q << param) | r.read(param)
                out.append((u >> 1) ^ -(u & 1))
    return out


def _decode_subframe(r: _BitReader, block_size: int, bps: int) -> list[int]:
    if r.read(1):
        raise ValueError("FLAC subframe padding bit set")
    stype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = 1 + r.read_unary()
    eff = bps - wasted
    if eff <= 0:
        raise ValueError("FLAC wasted bits exceed sample size")
    if stype == 0:  # CONSTANT
        v = r.read_signed(eff)
        out = [v] * block_size
    elif stype == 1:  # VERBATIM
        out = [r.read_signed(eff) for _ in range(block_size)]
    elif 8 <= stype <= 12:  # FIXED
        order = stype & 0x7
        warm = [r.read_signed(eff) for _ in range(order)]
        resid = _decode_residual(r, block_size, order)
        out = list(warm)
        coefs = _FIXED_COEFS[order]
        for i in range(order, block_size):
            acc = resid[i - order]
            for j, c in enumerate(coefs):
                acc += c * out[i - 1 - j]
            out.append(acc)
    elif stype >= 32:  # LPC
        order = (stype & 0x1F) + 1
        warm = [r.read_signed(eff) for _ in range(order)]
        prec = r.read(4)
        if prec == 0xF:
            raise ValueError("invalid FLAC LPC precision")
        prec += 1
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [r.read_signed(prec) for _ in range(order)]
        resid = _decode_residual(r, block_size, order)
        out = list(warm)
        for i in range(order, block_size):
            acc = 0
            for j in range(order):
                acc += coefs[j] * out[i - 1 - j]
            out.append(resid[i - order] + (acc >> shift))
    else:
        raise ValueError(f"reserved FLAC subframe type {stype}")
    if wasted:
        out = [v << wasted for v in out]
    return out


_BLOCK_SIZE_BASE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                    13: 8192, 14: 16384, 15: 32768}
_RATE_CODES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
               7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}
_SIZE_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def decode_frames(
    data: bytes, byte_pos: int, si_rate: int, si_channels: int, si_bps: int
) -> np.ndarray:
    """Decode every audio frame from ``byte_pos`` to EOF. Returns an
    (n_samples, channels) int64 array; raises ValueError on any bitstream
    or CRC inconsistency."""
    chunks: list[list[list[int]]] = []
    pos = byte_pos
    while pos + 2 <= len(data):
        if data[pos] != 0xFF or (data[pos + 1] & 0xFC) != 0xF8:
            raise ValueError("bad FLAC frame sync")
        r = _BitReader(data, pos)
        r.read(14)  # sync
        if r.read(1):
            raise ValueError("reserved FLAC frame bit set")
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        rate_code = r.read(4)
        chan_code = r.read(4)
        size_code = r.read(3)
        if r.read(1):
            raise ValueError("reserved FLAC frame header bit set")
        _read_utf8_number(r)
        if bs_code == 0:
            raise ValueError("reserved FLAC block size code")
        elif bs_code == 6:
            block_size = r.read(8) + 1
        elif bs_code == 7:
            block_size = r.read(16) + 1
        else:
            block_size = _BLOCK_SIZE_BASE[bs_code]
        if rate_code == 0:
            pass
        elif rate_code in _RATE_CODES:
            pass
        elif rate_code == 12:
            r.read(8)
        elif rate_code in (13, 14):
            r.read(16)
        else:
            raise ValueError("invalid FLAC sample rate code")
        if size_code == 0:
            bps = si_bps
        elif size_code in _SIZE_CODES:
            bps = _SIZE_CODES[size_code]
        else:
            raise ValueError("reserved FLAC sample size code")
        r.align()
        header_crc = r.read(8)
        if crc8(data[pos : r.pos - 1]) != header_crc:
            raise ValueError("FLAC frame header CRC-8 mismatch")
        if chan_code <= 7:
            n_ch = chan_code + 1
            if n_ch != si_channels:
                raise ValueError("FLAC frame channel count != STREAMINFO")
            subs = [_decode_subframe(r, block_size, bps) for _ in range(n_ch)]
        elif chan_code in (8, 9, 10):
            if si_channels != 2:
                raise ValueError("FLAC stereo decorrelation in non-stereo stream")
            extra0 = 1 if chan_code == 9 else 0
            extra1 = 1 if chan_code in (8, 10) else 0
            s0 = _decode_subframe(r, block_size, bps + extra0)
            s1 = _decode_subframe(r, block_size, bps + extra1)
            if chan_code == 8:  # left/side
                subs = [s0, [left - side for left, side in zip(s0, s1)]]
            elif chan_code == 9:  # side/right
                subs = [[right + side for side, right in zip(s0, s1)], s1]
            else:  # mid/side
                left_ch, right_ch = [], []
                for mid, side in zip(s0, s1):
                    m2 = (mid << 1) | (side & 1)
                    left_ch.append((m2 + side) >> 1)
                    right_ch.append((m2 - side) >> 1)
                subs = [left_ch, right_ch]
        else:
            raise ValueError(f"reserved FLAC channel assignment {chan_code}")
        r.align()
        frame_crc = r.read(16)
        if crc16(data[pos : r.pos - 2]) != frame_crc:
            raise ValueError("FLAC frame CRC-16 mismatch")
        chunks.append(subs)
        pos = r.pos
    if pos != len(data):
        # consistent strictness: 1 trailing byte is as much garbage as 2+
        raise ValueError("trailing bytes after last FLAC frame")
    if not chunks:
        raise ValueError("FLAC stream has no audio frames")
    n_channels = len(chunks[0])
    cols = [
        np.concatenate([np.array(c[ch], dtype=np.int64) for c in chunks])
        for ch in range(n_channels)
    ]
    return np.stack(cols, axis=1)


# ── encoder subset (tests + synthetic corpus) ───────────────────────────────


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


def _utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    for n_cont in range(1, 7):
        payload_bits = 6 * n_cont + (6 - n_cont)
        if n < (1 << payload_bits):
            lead_mask = (0xFF << (7 - n_cont)) & 0xFF
            out = [lead_mask | (n >> (6 * n_cont))]
            for i in range(n_cont - 1, -1, -1):
                out.append(0x80 | ((n >> (6 * i)) & 0x3F))
            return bytes(out)
    raise ValueError("frame number too large for UTF-8 coding")


def _write_rice(w: _BitWriter, resid: list[int], param: int) -> None:
    for v in resid:
        u = (abs(v) << 1) - (1 if v < 0 else 0)  # zigzag
        q, rem = u >> param, u & ((1 << param) - 1)
        if q:
            w.write(0, q)
        w.write(1, 1)
        if param:
            w.write(rem, param)


def _best_rice_param(resid: list[int]) -> int:
    best_p, best_cost = 0, None
    for p in range(15):
        cost = 0
        for v in resid:
            u = (abs(v) << 1) - (1 if v < 0 else 0)
            cost += (u >> p) + 1 + p
            if cost > 1 << 28:
                break
        if best_cost is None or cost < best_cost:
            best_p, best_cost = p, cost
    return best_p


def _encode_subframe(w: _BitWriter, s: list[int], bps: int, mode: str) -> None:
    if mode == "constant":
        w.write(0, 1)
        w.write(0, 6)
        w.write(0, 1)
        w.write(s[0], bps)
        return
    if mode == "verbatim":
        w.write(0, 1)
        w.write(1, 6)
        w.write(0, 1)
        for v in s:
            w.write(v, bps)
        return
    order = 2 if mode == "fixed2" and len(s) > 2 else 1
    if len(s) <= order:
        order = 0
    w.write(0, 1)
    w.write(8 + order, 6)
    w.write(0, 1)
    for v in s[:order]:
        w.write(v, bps)
    coefs = _FIXED_COEFS[order]
    resid = []
    for i in range(order, len(s)):
        pred = 0
        for j, c in enumerate(coefs):
            pred += c * s[i - 1 - j]
        resid.append(s[i] - pred)
    param = _best_rice_param(resid)
    w.write(0, 2)  # 4-bit rice
    w.write(0, 4)  # partition order 0
    w.write(param, 4)
    _write_rice(w, resid, param)


def encode_flac(
    samples: np.ndarray,
    rate: int = 44100,
    bps: int = 16,
    block: int = 256,
    mode: str = "fixed2",
    stereo_mode: str = "independent",
) -> bytes:
    """Encode (n, channels) integer samples. ``mode``: constant-aware
    'fixed2' / 'verbatim'; ``stereo_mode``: 'independent' or 'mid-side'."""
    samples = np.asarray(samples)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, channels = samples.shape
    si = bytearray()
    si += struct.pack(">HH", block, block)
    si += b"\x00\x00\x00" * 2  # min/max frame size unknown
    packed = (rate << 44) | ((channels - 1) << 41) | ((bps - 1) << 36) | n
    si += struct.pack(">Q", packed)[0:8]
    si += b"\x00" * 16  # md5 unset
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(si).to_bytes(3, "big") + si
    rate_code = {88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5, 22050: 6,
                 24000: 7, 32000: 8, 44100: 9, 48000: 10, 96000: 11}.get(rate, 0)
    size_code = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps]
    frame_no = 0
    for start in range(0, n, block):
        blk = samples[start : start + block]
        bs = len(blk)
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocksize strategy
        if bs == block and block in {v: k for k, v in _BLOCK_SIZE_BASE.items()}:
            bs_code = {v: k for k, v in _BLOCK_SIZE_BASE.items()}[block]
            w.write(bs_code, 4)
            bs_tail = None
        else:
            w.write(7, 4)
            bs_tail = bs - 1
        w.write(rate_code, 4)
        ms = stereo_mode == "mid-side" and channels == 2
        w.write(10 if ms else channels - 1, 4)
        w.write(size_code, 3)
        w.write(0, 1)
        for b in _utf8_number(frame_no):
            w.write(b, 8)
        if bs_tail is not None:
            w.write(bs_tail, 16)
        w.align()
        head = w.bytes()
        head += bytes([crc8(head)])
        w2 = _BitWriter()
        if ms:
            left = [int(v) for v in blk[:, 0]]
            right = [int(v) for v in blk[:, 1]]
            mid = [(lv + rv) >> 1 for lv, rv in zip(left, right)]
            side = [lv - rv for lv, rv in zip(left, right)]
            _encode_subframe(w2, mid, bps, _pick(mode, mid))
            _encode_subframe(w2, side, bps + 1, _pick(mode, side))
        else:
            for ch in range(channels):
                s = [int(v) for v in blk[:, ch]]
                _encode_subframe(w2, s, bps, _pick(mode, s))
        w2.align()
        frame = head + w2.bytes()
        frame += struct.pack(">H", crc16(frame))
        out += frame
        frame_no += 1
    return bytes(out)


def _pick(mode: str, s: list[int]) -> str:
    if len(set(s)) == 1:
        return "constant"
    return mode
