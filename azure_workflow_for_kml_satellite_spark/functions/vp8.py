"""From-scratch VP8 (lossy WebP) keyframe decoder — RFC 6386.

Decodes the intra-only keyframe that every lossy WebP file contains: bool
(arithmetic) decoder, keyframe headers (segmentation, loop-filter params,
token-probability updates, quantizers), per-macroblock intra modes,
DCT/WHT coefficient decode, dequantization, inverse transforms, all
intra predictors (16x16, chroma 8x8, and the ten 4x4 B modes), and the
normal + simple in-loop deblocking filters — so the decode is bit-exact
against libwebp's reconstruction (asserted in tests/test_vp8.py via a
ctypes differential against the system libwebp, when present).

Reference parity note: the reference pipeline decodes whole rasters from
bytes when needed (treesight ndvi.py:571-693 walks PNG bytes by hand);
this module extends the same from-scratch discipline to the web's
dominant lossy image codec so image_metadata/mean_luma/phash are real for
VP8 payloads instead of stubbed.

Only keyframes ("VP8 " chunks in WebP are always keyframes) and 4:2:0
YUV are supported — that is the entire lossy-WebP universe.
"""

from __future__ import annotations

import numpy as np

from azure_workflow_for_kml_satellite_spark.functions.vp8_tables import (
    AC_QLOOKUP,
    COEFF_PROBS,
    COEFF_UPDATE_PROBS,
    DC_QLOOKUP,
    KF_BMODE_PROBS,
)

# ── mode / tree constants (RFC 6386 §8.2, §11.2) ────────────────────────────

DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = 0, 1, 2, 3, 4
(
    B_DC_PRED,
    B_TM_PRED,
    B_VE_PRED,
    B_HE_PRED,
    B_LD_PRED,
    B_RD_PRED,
    B_VR_PRED,
    B_VL_PRED,
    B_HD_PRED,
    B_HU_PRED,
) = range(10)

# intra-mode trees (RFC 6386 §11.2; leaves are -mode)
KF_YMODE_TREE = (-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
KF_YMODE_PROB = (145, 156, 163, 128)
UV_MODE_TREE = (-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)
KF_UV_MODE_PROB = (142, 114, 183)
BMODE_TREE = (
    -B_DC_PRED, 2,
    -B_TM_PRED, 4,
    -B_VE_PRED, 6,
    8, 12,
    -B_HE_PRED, 10,
    -B_RD_PRED, -B_VR_PRED,
    -B_LD_PRED, 14,
    -B_VL_PRED, 16,
    -B_HD_PRED, -B_HU_PRED,
)
SEGMENT_TREE = (2, 4, -0, -1, -2, -3)

# the 16x16 mode of an i16 macroblock, seen as the "B mode" of each of its
# subblocks for the purposes of neighbouring-context selection (§11.3)
_I16_TO_B = {DC_PRED: B_DC_PRED, V_PRED: B_VE_PRED, H_PRED: B_HE_PRED, TM_PRED: B_TM_PRED}

# KF_BMODE_PROBS context-index permutation: the table (vp8_tables.py) is
# stored in the mode order used by the libwebp transcription it was
# cross-checked against, which enumerates {RD, VR, LD} where this module's
# RFC-order enum has {LD, RD, VR} — remap before indexing
_BMODE_CTX = (0, 1, 2, 3, 6, 4, 5, 7, 8, 9)

# ── token constants (RFC 6386 §13.2-13.3) ───────────────────────────────────

COEFF_TREE = (
    -11, 2,       # -dct_eob(=11 sentinel), ...
    -0, 4,        # DCT_0
    -1, 6,        # DCT_1
    8, 12,
    -2, 10,       # DCT_2
    -3, -4,       # DCT_3, DCT_4
    14, 16,
    -5, -6,       # cat1, cat2
    18, 20,
    -7, -8,       # cat3, cat4
    -9, -10,      # cat5, cat6
)
EOB_TOKEN = 11
CAT_BASES = {5: 5, 6: 7, 7: 11, 8: 19, 9: 35, 10: 67}
CAT_PROBS = {
    5: (159,),
    6: (165, 145),
    7: (173, 148, 140),
    8: (176, 155, 140, 135),
    9: (180, 157, 141, 134, 130),
    10: (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129),
}
COEFF_BANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)
ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

# block types: 0 = luma AC (i16 Y, coeffs start at 1), 1 = Y2 (WHT),
# 2 = chroma, 3 = luma with DC (B_PRED Y)


class BoolDecoder:
    """RFC 6386 §7 boolean (arithmetic) decoder."""

    __slots__ = ("data", "pos", "range", "value", "bit_count")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 2
        self.range = 255
        b0 = data[0] if len(data) > 0 else 0
        b1 = data[1] if len(data) > 1 else 0
        self.value = (b0 << 8) | b1
        self.bit_count = 0

    def read_bool(self, prob: int) -> int:
        rng = self.range
        value = self.value
        split = 1 + (((rng - 1) * prob) >> 8)
        big = split << 8
        if value >= big:
            ret = 1
            rng -= split
            value -= big
        else:
            ret = 0
            rng = split
        if rng < 128:
            bit_count = self.bit_count
            data = self.data
            pos = self.pos
            ndata = len(data)
            while rng < 128:
                value = (value << 1) & 0xFFFF
                rng <<= 1
                bit_count += 1
                if bit_count == 8:
                    bit_count = 0
                    value |= data[pos] if pos < ndata else 0
                    pos += 1
            self.bit_count = bit_count
            self.pos = pos
        self.range = rng
        self.value = value
        return ret

    def read_literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bool(128)
        return v

    def read_signed(self, n: int) -> int:
        v = self.read_literal(n)
        return -v if self.read_bool(128) else v

    def read_flagged_signed(self, n: int) -> int:
        return self.read_signed(n) if self.read_bool(128) else 0

    def read_tree(self, tree, probs, start: int = 0) -> int:
        i = start
        while True:
            i = tree[i + self.read_bool(probs[i >> 1])]
            if i <= 0:
                return -i


def _clamp255(a):
    return np.clip(a, 0, 255)


# ── inverse transforms (RFC 6386 §14.3-14.4) ────────────────────────────────


def idct4x4(coeffs) -> np.ndarray:
    """Exact integer inverse DCT on a length-16 coefficient list (row-major
    after zigzag), returning a 4x4 int array of residuals."""
    ip = list(coeffs)
    tmp = [0] * 16
    for i in range(4):  # columns
        i0, i4, i8, i12 = ip[i], ip[i + 4], ip[i + 8], ip[i + 12]
        a1 = i0 + i8
        b1 = i0 - i8
        t1 = (i4 * 35468) >> 16
        t2 = i12 + ((i12 * 20091) >> 16)
        c1 = t1 - t2
        t1 = i4 + ((i4 * 20091) >> 16)
        t2 = (i12 * 35468) >> 16
        d1 = t1 + t2
        tmp[i] = a1 + d1
        tmp[i + 12] = a1 - d1
        tmp[i + 4] = b1 + c1
        tmp[i + 8] = b1 - c1
    out = np.empty((4, 4), dtype=np.int32)
    for i in range(4):  # rows
        i0, i1, i2, i3 = tmp[4 * i], tmp[4 * i + 1], tmp[4 * i + 2], tmp[4 * i + 3]
        a1 = i0 + i2
        b1 = i0 - i2
        t1 = (i1 * 35468) >> 16
        t2 = i3 + ((i3 * 20091) >> 16)
        c1 = t1 - t2
        t1 = i1 + ((i1 * 20091) >> 16)
        t2 = (i3 * 35468) >> 16
        d1 = t1 + t2
        out[i, 0] = (a1 + d1 + 4) >> 3
        out[i, 3] = (a1 - d1 + 4) >> 3
        out[i, 1] = (b1 + c1 + 4) >> 3
        out[i, 2] = (b1 - c1 + 4) >> 3
    return out


def iwht4x4(coeffs) -> list:
    """Inverse Walsh-Hadamard for the Y2 block; returns the 16 DC values in
    subblock raster order."""
    ip = list(coeffs)
    tmp = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[i + 12]
        b1 = ip[i + 4] + ip[i + 8]
        c1 = ip[i + 4] - ip[i + 8]
        d1 = ip[i] - ip[i + 12]
        tmp[i] = a1 + b1
        tmp[i + 4] = c1 + d1
        tmp[i + 8] = a1 - b1
        tmp[i + 12] = d1 - c1
    out = [0] * 16
    for i in range(4):
        a1 = tmp[4 * i] + tmp[4 * i + 3]
        b1 = tmp[4 * i + 1] + tmp[4 * i + 2]
        c1 = tmp[4 * i + 1] - tmp[4 * i + 2]
        d1 = tmp[4 * i] - tmp[4 * i + 3]
        out[4 * i] = (a1 + b1 + 3) >> 3
        out[4 * i + 1] = (c1 + d1 + 3) >> 3
        out[4 * i + 2] = (a1 - b1 + 3) >> 3
        out[4 * i + 3] = (d1 - c1 + 3) >> 3
    return out


# ── intra predictors ────────────────────────────────────────────────────────


def _pred16_or_8(mode, above, left, corner, size, have_above, have_left):
    """16x16 luma / 8x8 chroma whole-block predictor. ``above``/``left`` are
    int arrays of length ``size``; ``corner`` the above-left pixel."""
    if mode == DC_PRED:
        if have_above and have_left:
            dc = (int(above.sum()) + int(left.sum()) + size) >> {8: 4, 16: 5}[size]
        elif have_above:
            dc = (int(above.sum()) + (size >> 1)) >> {8: 3, 16: 4}[size]
        elif have_left:
            dc = (int(left.sum()) + (size >> 1)) >> {8: 3, 16: 4}[size]
        else:
            dc = 128
        return np.full((size, size), dc, dtype=np.int32)
    if mode == V_PRED:
        return np.tile(above, (size, 1)).astype(np.int32)
    if mode == H_PRED:
        return np.tile(left[:, None], (1, size)).astype(np.int32)
    # TM_PRED
    return _clamp255(left[:, None].astype(np.int32) + above[None, :].astype(np.int32) - int(corner))


def _pred4(mode, a, al, l, ar):
    """4x4 B-mode predictor. a = above[0..3], al = above-left, l = left[0..3],
    ar = above-right[0..3]; all plain ints. Returns 4x4 int array."""
    out = np.empty((4, 4), dtype=np.int32)
    A0, A1, A2, A3 = a
    L0, L1, L2, L3 = l
    R0, R1, R2, R3 = ar
    P = al
    if mode == B_DC_PRED:
        out[:] = (A0 + A1 + A2 + A3 + L0 + L1 + L2 + L3 + 4) >> 3
    elif mode == B_TM_PRED:
        for r, lv in enumerate((L0, L1, L2, L3)):
            for c, av in enumerate((A0, A1, A2, A3)):
                out[r, c] = min(255, max(0, lv + av - P))
    elif mode == B_VE_PRED:
        e0 = (P + 2 * A0 + A1 + 2) >> 2
        e1 = (A0 + 2 * A1 + A2 + 2) >> 2
        e2 = (A1 + 2 * A2 + A3 + 2) >> 2
        e3 = (A2 + 2 * A3 + R0 + 2) >> 2
        out[:] = (e0, e1, e2, e3)
    elif mode == B_HE_PRED:
        out[0, :] = (P + 2 * L0 + L1 + 2) >> 2
        out[1, :] = (L0 + 2 * L1 + L2 + 2) >> 2
        out[2, :] = (L1 + 2 * L2 + L3 + 2) >> 2
        out[3, :] = (L2 + 2 * L3 + L3 + 2) >> 2
    elif mode == B_LD_PRED:
        p = (A0, A1, A2, A3, R0, R1, R2, R3)
        for r in range(4):
            for c in range(4):
                i = r + c
                if i < 6:
                    out[r, c] = (p[i] + 2 * p[i + 1] + p[i + 2] + 2) >> 2
                else:
                    out[r, c] = (p[6] + 3 * p[7] + 2) >> 2
    elif mode == B_RD_PRED:
        e = (
            (L3 + 2 * L2 + L1 + 2) >> 2,
            (L2 + 2 * L1 + L0 + 2) >> 2,
            (L1 + 2 * L0 + P + 2) >> 2,
            (L0 + 2 * P + A0 + 2) >> 2,
            (P + 2 * A0 + A1 + 2) >> 2,
            (A0 + 2 * A1 + A2 + 2) >> 2,
            (A1 + 2 * A2 + A3 + 2) >> 2,
        )
        for r in range(4):
            for c in range(4):
                out[r, c] = e[c - r + 3]
    elif mode == B_VR_PRED:
        v = [0] * 10
        v[0] = (L2 + 2 * L1 + L0 + 2) >> 2
        v[1] = (L1 + 2 * L0 + P + 2) >> 2
        v[2] = (L0 + 2 * P + A0 + 2) >> 2
        v[3] = (P + A0 + 1) >> 1
        v[4] = (A0 + A1 + 1) >> 1
        v[5] = (A1 + A2 + 1) >> 1
        v[6] = (A2 + A3 + 1) >> 1
        v[7] = (P + 2 * A0 + A1 + 2) >> 2
        v[8] = (A0 + 2 * A1 + A2 + 2) >> 2
        v[9] = (A1 + 2 * A2 + A3 + 2) >> 2
        out[0, :] = (v[3], v[4], v[5], v[6])
        out[1, :] = (v[2], v[7], v[8], v[9])
        out[2, :] = (v[1], v[3], v[4], v[5])
        out[3, :] = (v[0], v[2], v[7], v[8])
    elif mode == B_VL_PRED:
        v = [0] * 10
        v[0] = (A0 + A1 + 1) >> 1
        v[1] = (A1 + A2 + 1) >> 1
        v[2] = (A2 + A3 + 1) >> 1
        v[3] = (A3 + R0 + 1) >> 1
        v[4] = (A0 + 2 * A1 + A2 + 2) >> 2
        v[5] = (A1 + 2 * A2 + A3 + 2) >> 2
        v[6] = (A2 + 2 * A3 + R0 + 2) >> 2
        v[7] = (A3 + 2 * R0 + R1 + 2) >> 2
        v[8] = (R0 + 2 * R1 + R2 + 2) >> 2
        v[9] = (R1 + 2 * R2 + R3 + 2) >> 2
        out[0, :] = (v[0], v[1], v[2], v[3])
        out[1, :] = (v[4], v[5], v[6], v[7])
        out[2, :] = (v[1], v[2], v[3], v[8])
        out[3, :] = (v[5], v[6], v[7], v[9])
    elif mode == B_HD_PRED:
        v = [0] * 10
        v[0] = (L3 + L2 + 1) >> 1
        v[1] = (L3 + 2 * L2 + L1 + 2) >> 2
        v[2] = (L2 + L1 + 1) >> 1
        v[3] = (L2 + 2 * L1 + L0 + 2) >> 2
        v[4] = (L1 + L0 + 1) >> 1
        v[5] = (L1 + 2 * L0 + P + 2) >> 2
        v[6] = (L0 + P + 1) >> 1
        v[7] = (L0 + 2 * P + A0 + 2) >> 2
        v[8] = (P + 2 * A0 + A1 + 2) >> 2
        v[9] = (A0 + 2 * A1 + A2 + 2) >> 2
        out[0, :] = (v[6], v[7], v[8], v[9])
        out[1, :] = (v[4], v[5], v[6], v[7])
        out[2, :] = (v[2], v[3], v[4], v[5])
        out[3, :] = (v[0], v[1], v[2], v[3])
    elif mode == B_HU_PRED:
        v = [0] * 8
        v[0] = (L0 + L1 + 1) >> 1
        v[1] = (L0 + 2 * L1 + L2 + 2) >> 2
        v[2] = (L1 + L2 + 1) >> 1
        v[3] = (L1 + 2 * L2 + L3 + 2) >> 2
        v[4] = (L2 + L3 + 1) >> 1
        v[5] = (L2 + 2 * L3 + L3 + 2) >> 2
        v[6] = L3
        v[7] = L3
        out[0, :] = (v[0], v[1], v[2], v[3])
        out[1, :] = (v[2], v[3], v[4], v[5])
        out[2, :] = (v[4], v[5], v[6], v[7])
        out[3, :] = (v[6], v[7], v[7], v[7])
    else:
        raise ValueError(f"unknown 4x4 mode {mode}")
    return out


# ── loop filter (RFC 6386 §15) ──────────────────────────────────────────────


def _s(x):
    """uint8 → signed value-space used by the filters (subtract 128)."""
    return x.astype(np.int32) - 128


def _u(x):
    return np.clip(x + 128, 0, 255)


def _c(x):
    """clamp to signed-char range (the filters' arithmetic wraps there)."""
    return np.clip(x, -128, 127)


def _filter_mask(limit, ilimit, p3, p2, p1, p0, q0, q1, q2, q3):
    m = (
        (np.abs(p3 - p2) <= ilimit)
        & (np.abs(p2 - p1) <= ilimit)
        & (np.abs(p1 - p0) <= ilimit)
        & (np.abs(q3 - q2) <= ilimit)
        & (np.abs(q2 - q1) <= ilimit)
        & (np.abs(q1 - q0) <= ilimit)
        & (np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1) <= limit)
    )
    return m


def _hev(thresh, p1, p0, q0, q1):
    return (np.abs(p1 - p0) > thresh) | (np.abs(q1 - q0) > thresh)


def _common_adjust(use_outer, p1, p0, q0, q1):
    """RFC §15.2 common_adjust on signed values; returns (F, new_q0, new_p0).
    The (p1 - q1) difference is clamped to signed-char range BEFORE the
    outer-tap multiply, exactly as the spec's nested c() does."""
    a = _c(_c(p1 - q1) * use_outer + 3 * (q0 - p0))
    f = _c(a + 4) >> 3
    e = _c(a + 3) >> 3
    return f, _c(q0 - f), _c(p0 + e)


def _normal_edge(y, axis, pos, edge_limit, ilimit, hev_t, mb_edge):
    """Apply the normal filter across one edge of plane ``y`` (int32,
    signed-space NOT used — raw 0..255). ``pos`` is the index of q0 along
    ``axis``; vectorized along the other axis."""
    if axis == 0:
        rows = [y[pos + d, :] for d in (-4, -3, -2, -1, 0, 1, 2, 3)]
    else:
        rows = [y[:, pos + d] for d in (-4, -3, -2, -1, 0, 1, 2, 3)]
    p3, p2, p1, p0, q0, q1, q2, q3 = [r.astype(np.int32) for r in rows]
    mask = _filter_mask(edge_limit, ilimit, p3, p2, p1, p0, q0, q1, q2, q3)
    hev = _hev(hev_t, p1, p0, q0, q1)
    sp1, sp0, sq0, sq1 = _s(p1), _s(p0), _s(q0), _s(q1)
    sp2, sq2 = _s(p2), _s(q2)
    if not mb_edge:
        f1, nq0, np0 = _common_adjust(hev.astype(np.int32), sp1, sp0, sq0, sq1)
        a = _c(f1 + 1) >> 1
        a = np.where(hev, 0, a)
        nq1 = _c(sq1 - a)
        np1 = _c(sp1 + a)
        outs = {
            -2: np.where(mask, _u(np1), p1),
            -1: np.where(mask, _u(np0), p0),
            0: np.where(mask, _u(nq0), q0),
            1: np.where(mask, _u(nq1), q1),
        }
    else:
        # hev pixels: common adjust with outer taps; non-hev: wide filter
        f1, nq0_h, np0_h = _common_adjust(np.ones_like(sp0), sp1, sp0, sq0, sq1)
        w = _c(_c(sp1 - sq1) + 3 * (sq0 - sp0))
        a27 = _c((27 * w + 63) >> 7)
        nq0_w = _c(sq0 - a27)
        np0_w = _c(sp0 + a27)
        a18 = _c((18 * w + 63) >> 7)
        nq1_w = _c(sq1 - a18)
        np1_w = _c(sp1 + a18)
        a9 = _c((9 * w + 63) >> 7)
        nq2_w = _c(sq2 - a9)
        np2_w = _c(sp2 + a9)
        outs = {
            -3: np.where(mask & ~hev, _u(np2_w), p2),
            -2: np.where(mask & ~hev, _u(np1_w), p1),
            -1: np.where(mask, np.where(hev, _u(np0_h), _u(np0_w)), p0),
            0: np.where(mask, np.where(hev, _u(nq0_h), _u(nq0_w)), q0),
            1: np.where(mask & ~hev, _u(nq1_w), q1),
            2: np.where(mask & ~hev, _u(nq2_w), q2),
        }
    for d, v in outs.items():
        if axis == 0:
            y[pos + d, :] = v
        else:
            y[:, pos + d] = v


def _simple_edge(y, axis, pos, edge_limit):
    if axis == 0:
        rows = [y[pos + d, :] for d in (-2, -1, 0, 1)]
    else:
        rows = [y[:, pos + d] for d in (-2, -1, 0, 1)]
    p1, p0, q0, q1 = [r.astype(np.int32) for r in rows]
    mask = np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1) <= edge_limit
    f1, nq0, np0 = _common_adjust(np.ones_like(p0), _s(p1), _s(p0), _s(q0), _s(q1))
    o = {-1: np.where(mask, _u(np0), p0), 0: np.where(mask, _u(nq0), q0)}
    for d, v in o.items():
        if axis == 0:
            y[pos + d, :] = v
        else:
            y[:, pos + d] = v


# ── frame decode ────────────────────────────────────────────────────────────


def _dq(idx, table):
    return table[min(127, max(0, idx))]


class _Header:
    pass


def decode_frame(data: bytes):
    """Decode a VP8 keyframe bitstream (the payload of a WebP 'VP8 ' chunk).
    Returns (width, height, Y, U, V) with full-resolution uint8 planes
    cropped to the frame dimensions (U/V at (w+1)//2 x (h+1)//2)."""
    if len(data) < 10:
        raise ValueError("VP8 payload too short")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    frame_type = tag & 1
    part1_size = tag >> 5
    if frame_type != 0:
        raise ValueError("not a VP8 keyframe")
    if data[3:6] != b"\x9d\x01\x2a":
        raise ValueError("bad VP8 keyframe start code")
    w_code = data[6] | (data[7] << 8)
    h_code = data[8] | (data[9] << 8)
    width, height = w_code & 0x3FFF, h_code & 0x3FFF
    if width == 0 or height == 0:
        raise ValueError("bad VP8 dimensions")
    if width * height > (1 << 22):
        # same policy as the other from-scratch decoders (vp8l.py): the
        # bound is sized for TIME as much as memory — token decode is
        # per-coefficient Python, so the cap keeps a worst-case crafted
        # (or merely huge) frame to tens of seconds, not minutes; bigger
        # frames quarantine per-row with this message
        raise ValueError("VP8 dimensions exceed decoder budget")
    part1 = data[10 : 10 + part1_size]
    if len(part1) < part1_size:
        raise ValueError("truncated VP8 first partition")
    bd = BoolDecoder(part1)

    h = _Header()
    bd.read_bool(128)  # color space
    bd.read_bool(128)  # clamping type

    # segmentation (§9.3)
    h.seg_enabled = bd.read_bool(128)
    h.update_map = 0
    h.seg_abs = 0
    h.seg_quant = [0, 0, 0, 0]
    h.seg_lf = [0, 0, 0, 0]
    h.seg_tree_probs = [255, 255, 255]
    if h.seg_enabled:
        h.update_map = bd.read_bool(128)
        update_data = bd.read_bool(128)
        if update_data:
            h.seg_abs = bd.read_bool(128)
            for i in range(4):
                h.seg_quant[i] = bd.read_flagged_signed(7)
            for i in range(4):
                h.seg_lf[i] = bd.read_flagged_signed(6)
        if h.update_map:
            for i in range(3):
                h.seg_tree_probs[i] = bd.read_literal(8) if bd.read_bool(128) else 255

    # loop filter (§9.4)
    h.filter_simple = bd.read_bool(128)
    h.filter_level = bd.read_literal(6)
    h.sharpness = bd.read_literal(3)
    h.lf_delta_enabled = bd.read_bool(128)
    h.ref_delta = [0, 0, 0, 0]
    h.mode_delta = [0, 0, 0, 0]
    if h.lf_delta_enabled:
        if bd.read_bool(128):  # delta update
            for i in range(4):
                if bd.read_bool(128):
                    h.ref_delta[i] = bd.read_signed(6)
            for i in range(4):
                if bd.read_bool(128):
                    h.mode_delta[i] = bd.read_signed(6)

    # residual partitions (§9.5)
    n_parts = 1 << bd.read_literal(2)
    part2_off = 10 + part1_size
    sizes_bytes = (n_parts - 1) * 3
    offs = []
    pos = part2_off + sizes_bytes
    for i in range(n_parts - 1):
        o = part2_off + 3 * i
        if o + 3 > len(data):
            raise ValueError("truncated VP8 partition size table")
        sz = data[o] | (data[o + 1] << 8) | (data[o + 2] << 16)
        offs.append((pos, sz))
        pos += sz
    offs.append((pos, len(data) - pos))
    if any(o + s > len(data) or s < 0 for o, s in offs):
        raise ValueError("truncated VP8 residual partition")
    residuals = [BoolDecoder(data[o : o + s]) for o, s in offs]

    # quantizers (§9.6)
    h.y_ac_qi = bd.read_literal(7)
    h.y_dc_delta = bd.read_flagged_signed(4)
    h.y2_dc_delta = bd.read_flagged_signed(4)
    h.y2_ac_delta = bd.read_flagged_signed(4)
    h.uv_dc_delta = bd.read_flagged_signed(4)
    h.uv_ac_delta = bd.read_flagged_signed(4)

    bd.read_bool(128)  # refresh entropy probs (keyframe: value ignored)

    # token probability updates (§13.4)
    probs = list(COEFF_PROBS)
    k = 0
    for _t in range(4):
        for _b in range(8):
            for _c in range(3):
                for _p in range(11):
                    if bd.read_bool(COEFF_UPDATE_PROBS[k]):
                        probs[k] = bd.read_literal(8)
                    k += 1

    h.mb_no_skip = bd.read_bool(128)
    h.prob_skip_false = bd.read_literal(8) if h.mb_no_skip else 0

    mb_w = (width + 15) >> 4
    mb_h = (height + 15) >> 4

    # per-segment dequant factors
    def quant_for(seg):
        if h.seg_enabled:
            q = h.seg_quant[seg] if h.seg_abs else h.y_ac_qi + h.seg_quant[seg]
        else:
            q = h.y_ac_qi
        q = min(127, max(0, q))
        y1dc = _dq(q + h.y_dc_delta, DC_QLOOKUP)
        y1ac = _dq(q, AC_QLOOKUP)
        y2dc = _dq(q + h.y2_dc_delta, DC_QLOOKUP) * 2
        y2ac = max(8, (_dq(q + h.y2_ac_delta, AC_QLOOKUP) * 155) // 100)
        uvdc = min(132, _dq(q + h.uv_dc_delta, DC_QLOOKUP))
        uvac = _dq(q + h.uv_ac_delta, AC_QLOOKUP)
        return (y1dc, y1ac), (y2dc, y2ac), (uvdc, uvac)

    quants = [quant_for(s) for s in range(4)]

    # ── pass 1: per-MB modes from partition 1 ───────────────────────────────
    mb_seg = np.zeros((mb_h, mb_w), dtype=np.int32)
    mb_skip_flag = np.zeros((mb_h, mb_w), dtype=bool)
    mb_ymode = np.zeros((mb_h, mb_w), dtype=np.int32)
    mb_uvmode = np.zeros((mb_h, mb_w), dtype=np.int32)
    bmodes = np.zeros((mb_h, mb_w, 4, 4), dtype=np.int32)
    above_b = np.full((mb_w, 4), B_DC_PRED, dtype=np.int32)
    for my in range(mb_h):
        left_b = np.full(4, B_DC_PRED, dtype=np.int32)
        for mx in range(mb_w):
            if h.update_map:
                mb_seg[my, mx] = bd.read_tree(SEGMENT_TREE, h.seg_tree_probs)
            if h.mb_no_skip:
                mb_skip_flag[my, mx] = bool(bd.read_bool(h.prob_skip_false))
            ym = bd.read_tree(KF_YMODE_TREE, KF_YMODE_PROB)
            mb_ymode[my, mx] = ym
            if ym == B_PRED:
                for sy in range(4):
                    for sx in range(4):
                        a = above_b[mx, sx] if sy == 0 else bmodes[my, mx, sy - 1, sx]
                        lft = left_b[sy] if sx == 0 else bmodes[my, mx, sy, sx - 1]
                        base = (_BMODE_CTX[a] * 10 + _BMODE_CTX[lft]) * 9
                        m = bd.read_tree(BMODE_TREE, KF_BMODE_PROBS[base : base + 9])
                        bmodes[my, mx, sy, sx] = m
            else:
                bmodes[my, mx, :, :] = _I16_TO_B[ym]
            above_b[mx] = bmodes[my, mx, 3, :]
            left_b[:] = bmodes[my, mx, :, 3]
            mb_uvmode[my, mx] = bd.read_tree(UV_MODE_TREE, KF_UV_MODE_PROB)

    # ── pass 2: residuals + reconstruction ──────────────────────────────────
    # planes with a 1-MB border used for prediction edges
    yw, yh = mb_w * 16, mb_h * 16
    cw, ch = mb_w * 8, mb_h * 8
    Y = np.empty((yh + 5, yw + 8), dtype=np.int32)
    U = np.empty((ch + 5, cw + 8), dtype=np.int32)
    V = np.empty((ch + 5, cw + 8), dtype=np.int32)
    # plane layout: row 0 is the "above" row; col 0..3 are "left" cols;
    # pixel (0,0)-area hosts above-left. Actual image at [1:, 4:].
    Y[0, :] = 127
    U[0, :] = 127
    V[0, :] = 127
    Y[:, :4] = 129
    U[:, :4] = 129
    V[:, :4] = 129
    Y[0, :4] = 127
    U[0, :4] = 127
    V[0, :4] = 127

    # nonzero-coefficient contexts, per subblock column/row
    above_nz_y = np.zeros((mb_w, 4), dtype=np.int32)
    above_nz_u = np.zeros((mb_w, 2), dtype=np.int32)
    above_nz_v = np.zeros((mb_w, 2), dtype=np.int32)
    above_nz_y2 = np.zeros(mb_w, dtype=np.int32)

    # per-MB loop-filter metadata
    mb_has_coeffs = np.zeros((mb_h, mb_w), dtype=bool)

    def decode_coeffs(r, typ, ctx, first, dcq, acq):
        """Decode one 4x4 block's coefficients; returns (int16[16] in raster
        order after dezigzag & dequant, has_nonzero)."""
        out = [0] * 16
        i = first
        nz = False
        start = 0
        probs_base = typ * 264
        rb = r.read_bool
        while i < 16:
            p = probs_base + COEFF_BANDS[i] * 33 + ctx * 11
            t = start
            while True:  # inline tree walk (hot path — avoids slicing)
                t = COEFF_TREE[t + rb(probs[p + (t >> 1)])]
                if t <= 0:
                    break
            tok = -t
            if tok == EOB_TOKEN:
                break
            if tok == 0:
                ctx = 0
                start = 2  # no EOB after a zero run token
                i += 1
                continue
            start = 0
            if tok <= 4:
                val = tok
            else:
                extra = CAT_PROBS[tok]
                val = 0
                for pb in extra:
                    val = (val << 1) | r.read_bool(pb)
                val += CAT_BASES[tok]
            if r.read_bool(128):
                val = -val
            q = dcq if i == 0 else acq
            out[ZIGZAG[i]] = val * q
            nz = True
            ctx = 1 if (val == 1 or val == -1) else 2
            i += 1
        return out, nz, ctx

    # right margin of the top border row: above-right of the frame's
    # top-right MB reads here (127 like the rest of the border)
    Y[0, 4 + yw :] = 127
    for my in range(mb_h):
        r = residuals[my % n_parts]
        left_nz_y = np.zeros(4, dtype=np.int32)
        left_nz_u = np.zeros(2, dtype=np.int32)
        left_nz_v = np.zeros(2, dtype=np.int32)
        left_nz_y2 = 0
        for mx in range(mb_w):
            seg = int(mb_seg[my, mx])
            (y1dc, y1ac), (y2dc, y2ac), (uvdc, uvac) = quants[seg]
            ym = int(mb_ymode[my, mx])
            is_i4 = ym == B_PRED
            skip = bool(mb_skip_flag[my, mx])

            y_blocks = [[None] * 4 for _ in range(4)]
            u_blocks = [[None] * 2 for _ in range(2)]
            v_blocks = [[None] * 2 for _ in range(2)]
            any_nz = False
            if not skip:
                first = 0
                dcs = None
                if not is_i4:
                    ctx = above_nz_y2[mx] + left_nz_y2
                    coef, nz, _ = decode_coeffs(r, 1, int(ctx), 0, y2dc, y2ac)
                    above_nz_y2[mx] = left_nz_y2 = int(nz)
                    any_nz |= nz
                    dcs = iwht4x4(coef)
                    first = 1
                typ = 3 if is_i4 else 0
                for sy in range(4):
                    for sx in range(4):
                        ctx = above_nz_y[mx, sx] + left_nz_y[sy]
                        coef, nz, _ = decode_coeffs(
                            r, typ, int(ctx), first, y1dc, y1ac
                        )
                        if dcs is not None:
                            coef[0] = dcs[sy * 4 + sx]
                        y_blocks[sy][sx] = coef
                        # context tracks token-level nonzero only (§13.3)
                        above_nz_y[mx, sx] = left_nz_y[sy] = int(nz)
                        any_nz |= nz or (dcs is not None and coef[0] != 0)
                for plane, blocks, a_nz, l_nz in (
                    ("u", u_blocks, above_nz_u, left_nz_u),
                    ("v", v_blocks, above_nz_v, left_nz_v),
                ):
                    for sy in range(2):
                        for sx in range(2):
                            ctx = a_nz[mx, sx] + l_nz[sy]
                            coef, nz, _ = decode_coeffs(
                                r, 2, int(ctx), 0, uvdc, uvac
                            )
                            blocks[sy][sx] = coef
                            a_nz[mx, sx] = l_nz[sy] = int(nz)
                            any_nz |= nz
            else:
                # skipped MB: zero coefficients; reset contexts (Y2 context
                # persists for B_PRED MBs, which have no Y2 block)
                above_nz_y[mx, :] = 0
                left_nz_y[:] = 0
                above_nz_u[mx, :] = 0
                left_nz_u[:] = 0
                above_nz_v[mx, :] = 0
                left_nz_v[:] = 0
                if not is_i4:
                    above_nz_y2[mx] = 0
                    left_nz_y2 = 0
            mb_has_coeffs[my, mx] = any_nz

            # ── reconstruction ──────────────────────────────────────────────
            y0, x0 = my * 16 + 1, mx * 16 + 4
            have_above = my > 0
            have_left = mx > 0
            if not is_i4:
                above = Y[y0 - 1, x0 : x0 + 16]
                left = Y[y0 : y0 + 16, x0 - 1]
                corner = Y[y0 - 1, x0 - 1]
                pred = _pred16_or_8(ym, above, left, corner, 16, have_above, have_left)
                if skip:
                    Y[y0 : y0 + 16, x0 : x0 + 16] = pred
                else:
                    rec = pred.copy()
                    for sy in range(4):
                        for sx in range(4):
                            blk = y_blocks[sy][sx]
                            if any(blk):
                                rec[sy * 4 : sy * 4 + 4, sx * 4 : sx * 4 + 4] += idct4x4(blk)
                    Y[y0 : y0 + 16, x0 : x0 + 16] = _clamp255(rec)
            else:
                # 4x4 prediction: above-right of every subblock row comes
                # from the row ABOVE the macroblock (§12.3); beyond the last
                # MB column that row is the 127 border (top row) or the
                # above MB row's last reconstructed pixels
                for sy in range(4):
                    for sx in range(4):
                        by, bx = y0 + sy * 4, x0 + sx * 4
                        a = [int(v) for v in Y[by - 1, bx : bx + 4]]
                        al = int(Y[by - 1, bx - 1])
                        lft = [int(v) for v in Y[by : by + 4, bx - 1]]
                        if sx == 3:
                            ar_row = y0 - 1  # top row of the macroblock
                            ar = [int(v) for v in Y[ar_row, x0 + 16 : x0 + 20]]
                        else:
                            ar = [int(v) for v in Y[by - 1, bx + 4 : bx + 8]]
                        mode = int(bmodes[my, mx, sy, sx])
                        pred = _pred4(mode, a, al, lft, ar)
                        blk = None if skip else y_blocks[sy][sx]
                        if blk is not None and any(blk):
                            rec = pred + idct4x4(blk)
                        else:
                            rec = pred
                        Y[by : by + 4, bx : bx + 4] = _clamp255(rec)
            # chroma
            c0, cx0 = my * 8 + 1, mx * 8 + 4
            uvm = int(mb_uvmode[my, mx])
            for plane, blocks in ((U, u_blocks), (V, v_blocks)):
                above = plane[c0 - 1, cx0 : cx0 + 8]
                left = plane[c0 : c0 + 8, cx0 - 1]
                corner = plane[c0 - 1, cx0 - 1]
                pred = _pred16_or_8(uvm, above, left, corner, 8, have_above, have_left)
                if skip:
                    plane[c0 : c0 + 8, cx0 : cx0 + 8] = pred
                else:
                    rec = pred.copy()
                    for sy in range(2):
                        for sx in range(2):
                            blk = blocks[sy][sx]
                            if any(blk):
                                rec[sy * 4 : sy * 4 + 4, sx * 4 : sx * 4 + 4] += idct4x4(blk)
                    plane[c0 : c0 + 8, cx0 : cx0 + 8] = _clamp255(rec)

        # extend the row's bottom edge rightward: the above-right read of
        # the NEXT row's rightmost MB lands in this margin (frame edge —
        # replicate the last reconstructed pixel)
        Y[my * 16 + 16, 4 + yw :] = Y[my * 16 + 16, 3 + yw]

    # ── loop filter ─────────────────────────────────────────────────────────
    if h.filter_level > 0:
        _loop_filter(h, Y, U, V, mb_w, mb_h, mb_seg, mb_ymode, mb_has_coeffs)

    yimg = Y[1 : 1 + height, 4 : 4 + width].astype(np.uint8)
    cw_out, ch_out = (width + 1) >> 1, (height + 1) >> 1
    uimg = U[1 : 1 + ch_out, 4 : 4 + cw_out].astype(np.uint8)
    vimg = V[1 : 1 + ch_out, 4 : 4 + cw_out].astype(np.uint8)
    return width, height, yimg, uimg, vimg


def _loop_filter(h, Y, U, V, mb_w, mb_h, mb_seg, mb_ymode, mb_has_coeffs):
    """In-loop deblocking (§15), applied MB by MB in raster order."""
    for my in range(mb_h):
        for mx in range(mb_w):
            seg = int(mb_seg[my, mx])
            if h.seg_enabled:
                level = h.seg_lf[seg] if h.seg_abs else h.filter_level + h.seg_lf[seg]
            else:
                level = h.filter_level
            if h.lf_delta_enabled:
                level += h.ref_delta[0]  # keyframes: every MB references INTRA
                if mb_ymode[my, mx] == B_PRED:
                    level += h.mode_delta[0]
            level = min(63, max(0, level))
            if level == 0:
                continue
            ilimit = level
            if h.sharpness:
                ilimit >>= 2 if h.sharpness > 4 else 1
                ilimit = min(ilimit, 9 - h.sharpness)
            ilimit = max(1, ilimit)
            hev_t = 2 if level >= 40 else (1 if level >= 15 else 0)
            mb_lim = ((level + 2) * 2) + ilimit
            sub_lim = (level * 2) + ilimit
            skip_inner = (not mb_has_coeffs[my, mx]) and mb_ymode[my, mx] != B_PRED

            y0, x0 = my * 16 + 1, mx * 16 + 4
            c0, cx0 = my * 8 + 1, mx * 8 + 4
            ysl = Y[y0 : y0 + 16, :]
            csu = U[c0 : c0 + 8, :]
            csv = V[c0 : c0 + 8, :]
            if h.filter_simple:
                if mx > 0:
                    _simple_edge(ysl, 1, x0, mb_lim)
                if not skip_inner:
                    for dx in (4, 8, 12):
                        _simple_edge(ysl, 1, x0 + dx, sub_lim)
                if my > 0:
                    _simple_edge(Y[:, x0 : x0 + 16], 0, y0, mb_lim)
                if not skip_inner:
                    for dy in (4, 8, 12):
                        _simple_edge(Y[:, x0 : x0 + 16], 0, y0 + dy, sub_lim)
                continue
            if mx > 0:
                _normal_edge(ysl, 1, x0, mb_lim, ilimit, hev_t, True)
                _normal_edge(csu, 1, cx0, mb_lim, ilimit, hev_t, True)
                _normal_edge(csv, 1, cx0, mb_lim, ilimit, hev_t, True)
            if not skip_inner:
                for dx in (4, 8, 12):
                    _normal_edge(ysl, 1, x0 + dx, sub_lim, ilimit, hev_t, False)
                _normal_edge(csu, 1, cx0 + 4, sub_lim, ilimit, hev_t, False)
                _normal_edge(csv, 1, cx0 + 4, sub_lim, ilimit, hev_t, False)
            if my > 0:
                _normal_edge(Y[:, x0 : x0 + 16], 0, y0, mb_lim, ilimit, hev_t, True)
                _normal_edge(U[:, cx0 : cx0 + 8], 0, c0, mb_lim, ilimit, hev_t, True)
                _normal_edge(V[:, cx0 : cx0 + 8], 0, c0, mb_lim, ilimit, hev_t, True)
            if not skip_inner:
                for dy in (4, 8, 12):
                    _normal_edge(Y[:, x0 : x0 + 16], 0, y0 + dy, sub_lim, ilimit, hev_t, False)
                _normal_edge(U[:, cx0 : cx0 + 8], 0, c0 + 4, sub_lim, ilimit, hev_t, False)
                _normal_edge(V[:, cx0 : cx0 + 8], 0, c0 + 4, sub_lim, ilimit, hev_t, False)


def decode_vp8(data: bytes):
    """Public entry: decode a VP8 keyframe payload → (Y, U, V) uint8 planes
    (Y at full w×h; U/V at (w+1)//2 × (h+1)//2)."""
    _w, _h, y, u, v = decode_frame(data)
    return y, u, v


def yuv_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """BT.601 full-swing-ish conversion with nearest-neighbour chroma
    upsampling (for thumbnails; metadata stats use the Y plane directly)."""
    h, w = y.shape
    uu = u.repeat(2, axis=0).repeat(2, axis=1)[:h, :w].astype(np.int32) - 128
    vv = v.repeat(2, axis=0).repeat(2, axis=1)[:h, :w].astype(np.int32) - 128
    yy = y.astype(np.int32)
    r = yy + ((91881 * vv) >> 16)
    g = yy - ((22554 * uu + 46802 * vv) >> 16)
    b = yy + ((116130 * uu) >> 16)
    return np.stack([_clamp255(r), _clamp255(g), _clamp255(b)], axis=2).astype(np.uint8)
