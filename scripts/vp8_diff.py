"""Dev harness: differential-test functions/vp8.py against the system
libwebp (encode real VP8 streams, compare YUV planes bit-for-bit)."""

from __future__ import annotations

import ctypes
import sys

import numpy as np

LIB = ctypes.CDLL("libwebp.so.7")
LIB.WebPEncodeRGB.restype = ctypes.c_size_t
LIB.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)


def webp_encode_rgb(rgb: np.ndarray, quality: float) -> bytes:
    h, w, _ = rgb.shape
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = LIB.WebPEncodeRGB(
        np.ascontiguousarray(rgb).ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        w, h, 3 * w, ctypes.c_float(quality), ctypes.byref(out),
    )
    if n == 0:
        raise RuntimeError("libwebp encode failed")
    data = bytes(bytearray(ctypes.cast(out, ctypes.POINTER(ctypes.c_uint8 * n)).contents))
    LIB.WebPFree(out)
    return data


def webp_decode_yuv(data: bytes):
    W = ctypes.c_int(); H = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_uint8)(); v = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int(); uvstride = ctypes.c_int()
    y = LIB.WebPDecodeYUV(data, ctypes.c_size_t(len(data)), ctypes.byref(W),
                          ctypes.byref(H), ctypes.byref(u), ctypes.byref(v),
                          ctypes.byref(stride), ctypes.byref(uvstride))
    if not y:
        raise RuntimeError("libwebp decode failed")
    w, h = W.value, H.value
    cw, ch = (w + 1) // 2, (h + 1) // 2
    Y = np.ctypeslib.as_array(y, shape=(h, stride.value))[:, :w].copy()
    U = np.ctypeslib.as_array(u, shape=(ch, uvstride.value))[:, :cw].copy()
    V = np.ctypeslib.as_array(v, shape=(ch, uvstride.value))[:, :cw].copy()
    LIB.WebPFree(y)
    return Y, U, V


def vp8_payload(webp: bytes) -> bytes:
    assert webp[:4] == b"RIFF" and webp[8:12] == b"WEBP"
    pos = 12
    while pos + 8 <= len(webp):
        tag = webp[pos:pos+4]
        size = int.from_bytes(webp[pos+4:pos+8], "little")
        if tag == b"VP8 ":
            return webp[pos+8:pos+8+size]
        pos += 8 + size + (size & 1)
    raise ValueError("no VP8 chunk")


def run_case(name, rgb, quality):
    from azure_workflow_for_kml_satellite_spark.functions import vp8

    data = webp_encode_rgb(rgb, quality)
    Yr, Ur, Vr = webp_decode_yuv(data)
    try:
        Ym, Um, Vm = vp8.decode_vp8(vp8_payload(data))
    except Exception as exc:
        print(f"{name}: DECODE ERROR {type(exc).__name__}: {exc}")
        return False
    ok = True
    for pname, ref, mine in (("Y", Yr, Ym), ("U", Ur, Um), ("V", Vr, Vm)):
        if ref.shape != mine.shape:
            print(f"{name} {pname}: shape {mine.shape} vs ref {ref.shape}")
            ok = False
            continue
        diff = (ref.astype(int) - mine.astype(int))
        nbad = int((diff != 0).sum())
        if nbad:
            idx = np.argwhere(diff != 0)
            r0, c0 = idx[0]
            print(f"{name} {pname}: {nbad}/{diff.size} mismatched, max|d|={np.abs(diff).max()}"
                  f" first at ({r0},{c0}) ref={ref[r0,c0]} mine={mine[r0,c0]}")
            ok = False
    if ok:
        print(f"{name}: OK ({rgb.shape[1]}x{rgb.shape[0]} q={quality})")
    return ok


def main():
    rng = np.random.default_rng(7)
    cases = []
    flat = np.full((16, 16, 3), 120, dtype=np.uint8)
    cases.append(("flat16", flat, 75))
    grad = np.zeros((32, 48, 3), dtype=np.uint8)
    grad[..., 0] = np.linspace(0, 255, 48)[None, :]
    grad[..., 1] = np.linspace(0, 255, 32)[:, None]
    grad[..., 2] = 128
    cases.append(("grad48x32", grad, 75))
    noise = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    cases.append(("noise64x48", noise, 60))
    photo = np.zeros((56, 72, 3), dtype=np.uint8)
    yy, xx = np.mgrid[0:56, 0:72]
    photo[..., 0] = (128 + 100 * np.sin(xx / 7.0) * np.cos(yy / 5.0)).astype(np.uint8)
    photo[..., 1] = (128 + 80 * np.cos(xx / 11.0)).astype(np.uint8)
    photo[..., 2] = ((xx * 3 + yy * 2) % 256).astype(np.uint8)
    cases.append(("waves72x56", photo, 85))
    odd = rng.integers(0, 256, (21, 35, 3), dtype=np.uint8)
    cases.append(("odd35x21", odd, 50))
    for q in (10, 30, 95):
        cases.append((f"waves_q{q}", photo, q))
    nok = sum(run_case(*c[:2], c[2]) for c in cases)
    print(f"{nok}/{len(cases)} cases OK")
    return 0 if nok == len(cases) else 1


if __name__ == "__main__":
    sys.exit(main())
