"""VP8 (lossy WebP) intra keyframe codec — RFC 6386 from-spec decode
plus a bounded fixture encoder, NumPy/pure-Python, executor-local.

Scope (r10 verdict "What's missing #1", keyframe-only by design):

- boolean arithmetic coder, both directions (RFC 6386 §7/§8)
- full keyframe header grammar (§9): segmentation, loop-filter
  params, partition count, quantizer indices + deltas, coefficient
  probability updates, skip flag
- intra modes: the 4 full-MB luma modes (DC/V/H/TM §12.2), the 10
  subblock modes (§12.3, including the above-right-from-MB-row
  quirk for right-column subblocks), 4 chroma modes
- DCT coefficient tokens (§13): 12-token tree, category extra bits,
  band mapping, zigzag, per-coefficient context evolution, Y2/WHT
- dequantization (§14) with the dc/ac lookup ramps, Y2 and chroma
  scaling rules (y2dc x2, y2ac x155/100 min 8, uvdc cap 132)
- inverse transforms: 4x4 iDCT (20091/35468 fixed-point) and the
  inverse Walsh-Hadamard (§14.3/§14.4)
- loop filter (§15): simple + normal variants, interior/edge/hev
  limits, MB- and subblock-edge application order

Table adjudication (the brotli/blosc precedent, SCALE.md): the three
LARGE probability tables — ``default_coef_probs`` (1056 entries),
``coef_update_probs`` (1056) and ``kf_bmode_prob`` beyond the
(B_DC, B_DC) context (891) — are NOT claimed to be spec-exact
transcriptions.  This container ships no reference VP8 decoder
(no Pillow/libwebp/libvpx — re-verified round 11), so a from-memory
1000+-constant transcription could not be validated and would be
self-consistent rather than correct.  Instead this module pins them
to DOCUMENTED values (flat 128 coefficient priors, 255 update-flag
priors, the RFC's (B_DC,B_DC) row plus a flat fill) used symmetrically
by encoder and decoder; probabilities affect only entropy-coding
efficiency, never reconstruction, so every analytic-truth pixel check
and round-trip test is exact regardless.  Streams produced by OTHER
encoders that rely on the true RFC defaults are therefore out of
contract (decode_vp8_frame documents this); the moment an environment
provides a reference codec, a golden fixture upgrades the tables
(watch-item, same protocol as blosc).

Everything else — every structural rule above — is the normative RFC
6386 behavior and is exercised by hand-built bitstreams in
tests/test_vp8.py the way sources/webp.py's VP8L decoder was.

Reference parity note: the reference repo (nandish1999/
atlas-upscaling-dask) has no image codecs at all; this module is
extension scope for crawl-corpus media profiling, wired into the same
pHash/decode kernels as the PNG/GIF/JPEG/VP8L paths.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# boolean arithmetic coder (RFC 6386 §7 decode, §8 encode)


class BoolDecoder:
    """RFC 6386 §7.3: 8-bit-probability binary arithmetic decoder.
    Reads past the end of the buffer as zero bytes (the spec's
    decoders tolerate this; the final bits of a stream never need
    them to be meaningful)."""

    __slots__ = ("data", "pos", "value", "range", "bit_count")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 2
        b0 = data[0] if len(data) > 0 else 0
        b1 = data[1] if len(data) > 1 else 0
        self.value = (b0 << 8) | b1
        self.range = 255
        self.bit_count = 0

    def bool(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                self.pos += 1
                self.value |= nxt
        return ret

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bool(128)
        return v

    def signed_literal(self, n: int) -> int:
        v = self.literal(n)
        return -v if self.bool(128) else v

    def tree(self, tree: tuple, probs) -> int:
        i = 0
        while True:
            i = tree[i + self.bool(probs[i >> 1])]
            if i <= 0:
                return -i


def _norm_shift(r: int) -> int:
    """Left shifts to renormalize range into [128, 255]."""
    return 0 if r >= 128 else 8 - r.bit_length()


class BoolEncoder:
    """RFC 6386 §8 bool encoder (libvpx boolhuff shape: 24-bit low
    window, carry propagation through finished 0xFF bytes)."""

    __slots__ = ("low", "range", "count", "buf")

    def __init__(self):
        self.low = 0
        self.range = 255
        self.count = -24
        self.buf = bytearray()

    def bool(self, bit: int, prob: int) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.low += split
            self.range -= split
        else:
            self.range = split
        shift = _norm_shift(self.range)
        self.range <<= shift
        self.count += shift
        if self.count >= 0:
            offset = shift - self.count
            if (self.low << (offset - 1)) & 0x80000000:
                x = len(self.buf) - 1
                while x >= 0 and self.buf[x] == 0xFF:
                    self.buf[x] = 0
                    x -= 1
                if x >= 0:
                    self.buf[x] += 1
            self.buf.append((self.low >> (24 - offset)) & 0xFF)
            self.low <<= offset
            shift = self.count
            self.low &= 0xFFFFFF
            self.count -= 8
        self.low = (self.low << shift) & 0xFFFFFFFF

    def literal(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bool((value >> i) & 1, 128)

    def signed_literal(self, value: int, n: int) -> None:
        self.literal(abs(value), n)
        self.bool(1 if value < 0 else 0, 128)

    def tree(self, tree: tuple, probs, symbol: int, paths: dict) -> None:
        for idx, bit in paths[symbol]:
            self.bool(bit, probs[idx])

    def getvalue(self) -> bytes:
        # flush: 32 zero bits at prob 1/2 push every meaningful bit out
        for _ in range(32):
            self.bool(0, 128)
        return bytes(self.buf)


def tree_paths(tree: tuple) -> dict:
    """symbol -> [(prob_index, bit), ...] for encoding with a token
    tree laid out in the RFC's paired-node form."""
    paths: dict[int, list] = {}

    def walk(i: int, acc: list) -> None:
        for bit in (0, 1):
            nxt = tree[i + bit]
            step = acc + [(i >> 1, bit)]
            if nxt <= 0:
                paths[-nxt] = step
            else:
                walk(nxt, step)

    walk(0, [])
    return paths


# ---------------------------------------------------------------------------
# trees and fixed tables

# luma 16x16 modes
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = 0, 1, 2, 3, 4
KF_YMODE_TREE = (-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
KF_YMODE_PROB = (145, 156, 163, 128)

UV_MODE_TREE = (-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)
KF_UV_MODE_PROB = (142, 114, 183)

# 4x4 subblock modes
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

# kf_bmode_prob[above_mode][left_mode][9]: the (B_DC, B_DC) context is
# the RFC 6386 row; the other 99 contexts carry a flat fill under the
# module-docstring adjudication (used symmetrically by both ends, so
# round-trips and analytic rows are exact; spec-default-reliant
# foreign streams are out of contract).
_KF_BMODE_DC_DC = (231, 120, 48, 89, 115, 113, 120, 152, 112)
KF_BMODE_PROB = tuple(
    tuple(
        _KF_BMODE_DC_DC if (a == 0 and l == 0) else (128,) * 9
        for l in range(10)
    )
    for a in range(10)
)

# DCT tokens (§13.2)
(
    ZERO_TOKEN,
    ONE_TOKEN,
    TWO_TOKEN,
    THREE_TOKEN,
    FOUR_TOKEN,
    CAT1,
    CAT2,
    CAT3,
    CAT4,
    CAT5,
    CAT6,
    EOB_TOKEN,
) = range(12)
COEF_TREE = (
    -EOB_TOKEN, 2,
    -ZERO_TOKEN, 4,
    -ONE_TOKEN, 6,
    8, 12,
    -TWO_TOKEN, 10,
    -THREE_TOKEN, -FOUR_TOKEN,
    14, 16,
    -CAT1, -CAT2,
    18, 20,
    -CAT3, -CAT4,
    -CAT5, -CAT6,
)
CAT_BASE = {CAT1: 5, CAT2: 7, CAT3: 11, CAT4: 19, CAT5: 35, CAT6: 67}
# category extra-bit probabilities (RFC 6386 §13.2 Pcat1..Pcat6)
CAT_PROBS = {
    CAT1: (159,),
    CAT2: (165, 145),
    CAT3: (173, 148, 140),
    CAT4: (176, 155, 140, 135),
    CAT5: (180, 157, 141, 134, 130),
    CAT6: (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129),
}
TOKEN_FOR_ABS = {1: ONE_TOKEN, 2: TWO_TOKEN, 3: THREE_TOKEN, 4: FOUR_TOKEN}

COEF_BANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)
ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

# block ("plane") types: 0 = Y after Y2, 1 = Y2, 2 = chroma, 3 = Y w/ DC
PLANE_Y_NO_DC, PLANE_Y2, PLANE_UV, PLANE_Y_WITH_DC = 0, 1, 2, 3

# coefficient probability tables [4][8][3][11] — documented working
# values (module docstring adjudication): flat 128 priors, 255
# update-flag priors.  The header's update mechanism (§13.4) is fully
# implemented, so a stream may transmit any probabilities explicitly.
DEFAULT_COEF_PROBS = [
    [[[128] * 11 for _ in range(3)] for _ in range(8)] for _ in range(4)
]
COEF_UPDATE_PROBS = [
    [[[255] * 11 for _ in range(3)] for _ in range(8)] for _ in range(4)
]

# dequantization ramps (§14.1)
DC_QLOOKUP = (
    4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15, 16, 17, 17,
    18, 19, 20, 20, 21, 21, 22, 22, 23, 23, 24, 25, 25, 26, 27, 28,
    29, 30, 31, 32, 33, 34, 35, 36, 37, 37, 38, 39, 40, 41, 42, 43,
    44, 45, 46, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58,
    59, 60, 61, 62, 63, 64, 65, 66, 67, 68, 69, 70, 71, 72, 73, 74,
    75, 76, 76, 77, 78, 79, 80, 81, 82, 83, 84, 85, 86, 87, 88, 89,
    91, 93, 95, 96, 98, 100, 101, 102, 104, 106, 108, 110, 112, 114,
    116, 118, 122, 124, 126, 128, 130, 132, 134, 136, 138, 140, 143,
    145, 148, 151, 154, 157,
)
AC_QLOOKUP = (
    4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19,
    20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35,
    36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47, 48, 49, 50, 51,
    52, 53, 54, 55, 56, 57, 58, 60, 62, 64, 66, 68, 70, 72, 74, 76,
    78, 80, 82, 84, 86, 88, 90, 92, 94, 96, 98, 100, 102, 104, 106,
    108, 110, 112, 114, 116, 119, 122, 125, 128, 131, 134, 137, 140,
    143, 146, 149, 152, 155, 158, 161, 164, 167, 170, 173, 177, 181,
    185, 189, 193, 197, 201, 205, 209, 213, 217, 221, 225, 229, 234,
    239, 245, 249, 254, 259, 264, 269, 274, 279, 284,
)


def _clamp_q(qi: int) -> int:
    return 0 if qi < 0 else (127 if qi > 127 else qi)


def dequant_factors(
    y_ac_qi: int,
    y_dc_delta: int = 0,
    y2_dc_delta: int = 0,
    y2_ac_delta: int = 0,
    uv_dc_delta: int = 0,
    uv_ac_delta: int = 0,
) -> dict:
    """(dc, ac) dequant pairs per plane class (§14.1): Y2 DC doubles,
    Y2 AC scales 155/100 with an 8 floor, chroma DC caps at 132."""
    ydc = DC_QLOOKUP[_clamp_q(y_ac_qi + y_dc_delta)]
    yac = AC_QLOOKUP[_clamp_q(y_ac_qi)]
    y2dc = DC_QLOOKUP[_clamp_q(y_ac_qi + y2_dc_delta)] * 2
    y2ac = AC_QLOOKUP[_clamp_q(y_ac_qi + y2_ac_delta)] * 155 // 100
    if y2ac < 8:
        y2ac = 8
    uvdc = DC_QLOOKUP[_clamp_q(y_ac_qi + uv_dc_delta)]
    if uvdc > 132:
        uvdc = 132
    uvac = AC_QLOOKUP[_clamp_q(y_ac_qi + uv_ac_delta)]
    return {"y": (ydc, yac), "y2": (y2dc, y2ac), "uv": (uvdc, uvac)}


# ---------------------------------------------------------------------------
# inverse transforms (§14.3, §14.4)

_COSPI8SQRT2MINUS1 = 20091
_SINPI8SQRT2 = 35468


def idct4x4(coeffs) -> np.ndarray:
    """RFC 6386 §14.3 integer iDCT on a length-16 raster-order block
    of DEQUANTIZED coefficients; returns a 4x4 int array."""
    ip = [int(c) for c in coeffs]
    tmp = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[i + 8]
        b1 = ip[i] - ip[i + 8]
        t1 = (ip[i + 4] * _SINPI8SQRT2) >> 16
        t2 = ip[i + 12] + ((ip[i + 12] * _COSPI8SQRT2MINUS1) >> 16)
        c1 = t1 - t2
        t1 = ip[i + 4] + ((ip[i + 4] * _COSPI8SQRT2MINUS1) >> 16)
        t2 = (ip[i + 12] * _SINPI8SQRT2) >> 16
        d1 = t1 + t2
        tmp[i] = a1 + d1
        tmp[i + 12] = a1 - d1
        tmp[i + 4] = b1 + c1
        tmp[i + 8] = b1 - c1
    out = np.zeros((4, 4), dtype=np.int64)
    for i in range(4):
        r = 4 * i
        a1 = tmp[r] + tmp[r + 2]
        b1 = tmp[r] - tmp[r + 2]
        t1 = (tmp[r + 1] * _SINPI8SQRT2) >> 16
        t2 = tmp[r + 3] + ((tmp[r + 3] * _COSPI8SQRT2MINUS1) >> 16)
        c1 = t1 - t2
        t1 = tmp[r + 1] + ((tmp[r + 1] * _COSPI8SQRT2MINUS1) >> 16)
        t2 = (tmp[r + 3] * _SINPI8SQRT2) >> 16
        d1 = t1 + t2
        out[i, 0] = (a1 + d1 + 4) >> 3
        out[i, 3] = (a1 - d1 + 4) >> 3
        out[i, 1] = (b1 + c1 + 4) >> 3
        out[i, 2] = (b1 - c1 + 4) >> 3
    return out


def iwht4x4(coeffs) -> np.ndarray:
    """RFC 6386 §14.4 inverse Walsh-Hadamard for the Y2 block; returns
    the 16 subblock DC values in raster order (4x4)."""
    ip = [int(c) for c in coeffs]
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
    out = np.zeros((4, 4), dtype=np.int64)
    for i in range(4):
        r = 4 * i
        a1 = tmp[r] + tmp[r + 3]
        b1 = tmp[r + 1] + tmp[r + 2]
        c1 = tmp[r + 1] - tmp[r + 2]
        d1 = tmp[r] - tmp[r + 3]
        out[i, 0] = (a1 + b1 + 3) >> 3
        out[i, 1] = (c1 + d1 + 3) >> 3
        out[i, 2] = (a1 - b1 + 3) >> 3
        out[i, 3] = (d1 - c1 + 3) >> 3
    return out


# ---------------------------------------------------------------------------
# intra predictors

def _clip255(v):
    return 0 if v < 0 else (255 if v > 255 else v)


def predict_block_dc(above, left, shift_both=5, have_above=True,
                     have_left=True):
    """DC predictor core for 16x16 (shift 5) / 8x8 (shift 4) blocks
    with RFC edge fallbacks (half-shift single-edge, 128 no-edge)."""
    if have_above and have_left:
        total = int(np.sum(above)) + int(np.sum(left))
        return (total + (1 << (shift_both - 1))) >> shift_both
    if have_above:
        return (int(np.sum(above)) + (1 << (shift_both - 2))) >> (
            shift_both - 1
        )
    if have_left:
        return (int(np.sum(left)) + (1 << (shift_both - 2))) >> (
            shift_both - 1
        )
    return 128


def predict_mb(mode: int, above, left, above_left: int, size: int,
               have_above: bool, have_left: bool) -> np.ndarray:
    """Whole-block intra prediction (§12.2) for 16x16 luma / 8x8
    chroma.  `above`/`left` are length-`size` arrays (synthesized
    127/129 borders already applied by the caller for keyframes —
    have_above/have_left only matter for the DC edge fallbacks)."""
    if mode == DC_PRED:
        shift = 5 if size == 16 else 4
        v = predict_block_dc(above, left, shift, have_above, have_left)
        return np.full((size, size), v, dtype=np.int64)
    if mode == V_PRED:
        return np.tile(np.asarray(above, dtype=np.int64), (size, 1))
    if mode == H_PRED:
        return np.tile(
            np.asarray(left, dtype=np.int64).reshape(size, 1), (1, size)
        )
    if mode == TM_PRED:
        a = np.asarray(above, dtype=np.int64)
        lft = np.asarray(left, dtype=np.int64).reshape(size, 1)
        return np.clip(lft + a - int(above_left), 0, 255)
    raise ValueError(f"not a whole-block intra mode: {mode}")


def predict_subblock(mode: int, A, L, P: int) -> np.ndarray:
    """4x4 subblock intra prediction (§12.3).  ``A`` is the 8 above
    pixels (A[4:] = above-right), ``L`` the 4 left pixels, ``P`` the
    above-left corner."""
    A = [int(x) for x in A]
    L = [int(x) for x in L]
    P = int(P)
    out = np.zeros((4, 4), dtype=np.int64)
    if mode == B_DC_PRED:
        out[:, :] = (sum(A[:4]) + sum(L) + 4) >> 3
    elif mode == B_TM_PRED:
        for r in range(4):
            for c in range(4):
                out[r, c] = _clip255(L[r] + A[c] - P)
    elif mode == B_VE_PRED:
        e = [P] + A[:5]
        for c in range(4):
            col = (e[c] + 2 * e[c + 1] + e[c + 2] + 2) >> 2
            out[:, c] = col
    elif mode == B_HE_PRED:
        e = [P] + L + [L[3]]
        for r in range(4):
            out[r, :] = (e[r] + 2 * e[r + 1] + e[r + 2] + 2) >> 2
    elif mode == B_LD_PRED:
        for r in range(4):
            for c in range(4):
                i = r + c
                if i < 6:
                    out[r, c] = (A[i] + 2 * A[i + 1] + A[i + 2] + 2) >> 2
                else:
                    out[r, c] = (A[6] + 3 * A[7] + 2) >> 2
    elif mode == B_RD_PRED:
        pp = [L[3], L[2], L[1], L[0], P, A[0], A[1], A[2], A[3]]
        for r in range(4):
            for c in range(4):
                i = 4 + c - r
                out[r, c] = (pp[i - 1] + 2 * pp[i] + pp[i + 1] + 2) >> 2
    elif mode == B_VR_PRED:
        pp = [L[3], L[2], L[1], L[0], P, A[0], A[1], A[2], A[3]]
        out[3, 0] = (pp[1] + 2 * pp[2] + pp[3] + 2) >> 2
        out[2, 0] = (pp[2] + 2 * pp[3] + pp[4] + 2) >> 2
        out[3, 1] = out[1, 0] = (pp[3] + 2 * pp[4] + pp[5] + 2) >> 2
        out[2, 1] = out[0, 0] = (pp[4] + pp[5] + 1) >> 1
        out[3, 2] = out[1, 1] = (pp[4] + 2 * pp[5] + pp[6] + 2) >> 2
        out[2, 2] = out[0, 1] = (pp[5] + pp[6] + 1) >> 1
        out[3, 3] = out[1, 2] = (pp[5] + 2 * pp[6] + pp[7] + 2) >> 2
        out[2, 3] = out[0, 2] = (pp[6] + pp[7] + 1) >> 1
        out[1, 3] = (pp[6] + 2 * pp[7] + pp[8] + 2) >> 2
        out[0, 3] = (pp[7] + pp[8] + 1) >> 1
    elif mode == B_VL_PRED:
        out[0, 0] = (A[0] + A[1] + 1) >> 1
        out[1, 0] = (A[0] + 2 * A[1] + A[2] + 2) >> 2
        out[2, 0] = out[0, 1] = (A[1] + A[2] + 1) >> 1
        out[1, 1] = out[3, 0] = (A[1] + 2 * A[2] + A[3] + 2) >> 2
        out[2, 1] = out[0, 2] = (A[2] + A[3] + 1) >> 1
        out[3, 1] = out[1, 2] = (A[2] + 2 * A[3] + A[4] + 2) >> 2
        out[2, 2] = out[0, 3] = (A[3] + A[4] + 1) >> 1
        out[3, 2] = out[1, 3] = (A[3] + 2 * A[4] + A[5] + 2) >> 2
        out[2, 3] = (A[4] + 2 * A[5] + A[6] + 2) >> 2
        out[3, 3] = (A[5] + 2 * A[6] + A[7] + 2) >> 2
    elif mode == B_HD_PRED:
        pp = [L[3], L[2], L[1], L[0], P, A[0], A[1], A[2]]
        out[3, 0] = (pp[0] + pp[1] + 1) >> 1
        out[3, 1] = (pp[0] + 2 * pp[1] + pp[2] + 2) >> 2
        out[2, 0] = out[3, 2] = (pp[1] + pp[2] + 1) >> 1
        out[2, 1] = out[3, 3] = (pp[1] + 2 * pp[2] + pp[3] + 2) >> 2
        out[2, 2] = out[1, 0] = (pp[2] + pp[3] + 1) >> 1
        out[2, 3] = out[1, 1] = (pp[2] + 2 * pp[3] + pp[4] + 2) >> 2
        out[1, 2] = out[0, 0] = (pp[3] + pp[4] + 1) >> 1
        out[1, 3] = out[0, 1] = (pp[3] + 2 * pp[4] + pp[5] + 2) >> 2
        out[0, 2] = (pp[4] + 2 * pp[5] + pp[6] + 2) >> 2
        out[0, 3] = (pp[5] + 2 * pp[6] + pp[7] + 2) >> 2
    elif mode == B_HU_PRED:
        out[0, 0] = (L[0] + L[1] + 1) >> 1
        out[0, 1] = (L[0] + 2 * L[1] + L[2] + 2) >> 2
        out[0, 2] = out[1, 0] = (L[1] + L[2] + 1) >> 1
        out[0, 3] = out[1, 1] = (L[1] + 2 * L[2] + L[3] + 2) >> 2
        out[1, 2] = out[2, 0] = (L[2] + L[3] + 1) >> 1
        out[1, 3] = out[2, 1] = (L[2] + 3 * L[3] + 2) >> 2
        out[2, 2] = out[2, 3] = L[3]
        out[3, :] = L[3]
    else:
        raise ValueError(f"unknown 4x4 intra mode {mode}")
    return out


# ---------------------------------------------------------------------------
# loop filter (§15)


def _s8(v: int) -> int:
    """Clamp to signed 8-bit (the spec's c() operator)."""
    return -128 if v < -128 else (127 if v > 127 else v)


def _u2s(v: int) -> int:
    return int(v) - 128


def _s2u(v: int) -> int:
    return _clip255(v + 128)


def _common_adjust(use_outer_taps: bool, px: list) -> int:
    """§15.2 common_adjust on [p1, p0, q0, q1] (signed domain, edits
    p0/q0 in place, returns the a term used by the subblock filter)."""
    p1, p0, q0, q1 = px
    a = _s8((p1 - q1 if use_outer_taps else 0) + 3 * (q0 - p0))
    f1 = _s8(a + 4) >> 3
    f2 = _s8(a + 3) >> 3
    px[2] = _s8(q0 - f1)
    px[1] = _s8(p0 + f2)
    return f1


def _simple_segment(edge_limit: int, px: list) -> None:
    """§15.1 simple filter on [p1, p0, q0, q1]."""
    p1, p0, q0, q1 = px
    if abs(p0 - q0) * 2 + abs(p1 - q1) // 2 <= edge_limit:
        _common_adjust(True, px)


def _filter_mask(interior: int, edge: int, p) -> bool:
    """Normal-filter mask over [p3 p2 p1 p0 q0 q1 q2 q3] (§15.2)."""
    p3, p2, p1, p0, q0, q1, q2, q3 = p
    return (
        abs(p0 - q0) * 2 + abs(p1 - q1) // 2 <= edge
        and abs(p3 - p2) <= interior
        and abs(p2 - p1) <= interior
        and abs(p1 - p0) <= interior
        and abs(q1 - q0) <= interior
        and abs(q2 - q1) <= interior
        and abs(q3 - q2) <= interior
    )


def _hev(thresh: int, p1: int, p0: int, q0: int, q1: int) -> bool:
    return abs(p1 - p0) > thresh or abs(q1 - q0) > thresh


def _subblock_filter(hev_t: int, interior: int, edge: int, p) -> None:
    """§15.2 subblock_filter, in place on the signed 8-list."""
    if not _filter_mask(interior, edge, p):
        return
    hv = _hev(hev_t, p[2], p[3], p[4], p[5])
    seg = [p[2], p[3], p[4], p[5]]
    a = _common_adjust(hv, seg)
    p[3], p[4] = seg[1], seg[2]
    if not hv:
        a = (a + 1) >> 1
        p[5] = _s8(p[5] - a)
        p[2] = _s8(p[2] + a)


def _mbfilter(hev_t: int, interior: int, edge: int, p) -> None:
    """§15.2 MBfilter (macroblock-edge variant), in place."""
    if not _filter_mask(interior, edge, p):
        return
    if _hev(hev_t, p[2], p[3], p[4], p[5]):
        seg = [p[2], p[3], p[4], p[5]]
        _common_adjust(True, seg)
        p[3], p[4] = seg[1], seg[2]
        return
    w = _s8(_s8(p[2] - p[5]) + 3 * (p[4] - p[3]))
    a = _s8((27 * w + 63) >> 7)
    p[4] = _s8(p[4] - a)
    p[3] = _s8(p[3] + a)
    a = _s8((18 * w + 63) >> 7)
    p[5] = _s8(p[5] - a)
    p[2] = _s8(p[2] + a)
    a = _s8((9 * w + 63) >> 7)
    p[6] = _s8(p[6] - a)
    p[1] = _s8(p[1] + a)


def filter_limits(level: int, sharpness: int) -> tuple[int, int, int, int]:
    """(interior, mb_edge, sub_edge, hev_threshold) per §15.1/§15.2,
    keyframe hev rule."""
    interior = level
    if sharpness:
        interior >>= 2 if sharpness > 4 else 1
        cap = 9 - sharpness
        if interior > cap:
            interior = cap
    if interior < 1:
        interior = 1
    if level >= 40:
        hev = 2
    elif level >= 15:
        hev = 1
    else:
        hev = 0
    return interior, (level + 2) * 2 + interior, level * 2 + interior, hev


def _edge_iter_v(plane, x: int, y0: int, n: int, taps: int):
    """Vertical edge at column x: yields per-row signed pixel lists
    [..p1 p0 | q0 q1..] of width 2*taps and a writeback slot."""
    for y in range(y0, y0 + n):
        idx = list(range(x - taps, x + taps))
        px = [_u2s(plane[y, i]) for i in idx]
        yield px, ("v", y, idx)


def _edge_iter_h(plane, y: int, x0: int, n: int, taps: int):
    for x in range(x0, x0 + n):
        idx = list(range(y - taps, y + taps))
        px = [_u2s(plane[i, x]) for i in idx]
        yield px, ("h", x, idx)


def _writeback(plane, px, slot) -> None:
    kind, fixed, idx = slot
    for k, i in enumerate(idx):
        if kind == "v":
            plane[fixed, i] = _s2u(px[k])
        else:
            plane[i, fixed] = _s2u(px[k])


def apply_loop_filter(
    y: np.ndarray,
    u: np.ndarray,
    v: np.ndarray,
    level: int,
    sharpness: int,
    filter_type: int,
    mb_info: list,
    mb_cols: int,
    mb_rows: int,
) -> None:
    """In-place §15 loop filter over reconstructed planes.  `mb_info`
    holds per-MB dicts with `has_coeffs`, `mode` and optionally a
    per-SEGMENT `level` override (§10 segmentation feature data);
    interior (subblock) edges are skipped for coefficient-free
    non-B_PRED MBs, MB edges always filter, and a level-0 MB is not
    filtered at all.  filter_type 1 = simple (luma only)."""
    limits_cache: dict[int, tuple] = {}
    planes_y = [(y, 16)]
    planes_uv = [(u, 8), (v, 8)]
    for my in range(mb_rows):
        for mx in range(mb_cols):
            mb = mb_info[my * mb_cols + mx]
            lvl = mb.get("level", level)
            if lvl == 0:
                continue
            if lvl not in limits_cache:
                limits_cache[lvl] = filter_limits(lvl, sharpness)
            interior, mb_lim, sub_lim, hev_t = limits_cache[lvl]
            inner = mb["has_coeffs"] or mb["mode"] == B_PRED
            if filter_type == 1:  # simple: luma only, 2-tap window
                for plane, size in planes_y:
                    bx, by = mx * size, my * size
                    if mx:
                        for px, slot in _edge_iter_v(plane, bx, by, size, 2):
                            _simple_segment(mb_lim, px)
                            _writeback(plane, px, slot)
                    if inner:
                        for off in (4, 8, 12):
                            for px, slot in _edge_iter_v(
                                plane, bx + off, by, size, 2
                            ):
                                _simple_segment(sub_lim, px)
                                _writeback(plane, px, slot)
                    if my:
                        for px, slot in _edge_iter_h(plane, by, bx, size, 2):
                            _simple_segment(mb_lim, px)
                            _writeback(plane, px, slot)
                    if inner:
                        for off in (4, 8, 12):
                            for px, slot in _edge_iter_h(
                                plane, by + off, bx, size, 2
                            ):
                                _simple_segment(sub_lim, px)
                                _writeback(plane, px, slot)
                continue
            for plane, size in planes_y + planes_uv:
                bx, by = mx * size, my * size
                sub_offs = (4, 8, 12) if size == 16 else (4,)
                if mx:
                    for px, slot in _edge_iter_v(plane, bx, by, size, 4):
                        _mbfilter(hev_t, interior, mb_lim, px)
                        _writeback(plane, px, slot)
                if inner:
                    for off in sub_offs:
                        for px, slot in _edge_iter_v(
                            plane, bx + off, by, size, 4
                        ):
                            _subblock_filter(hev_t, interior, sub_lim, px)
                            _writeback(plane, px, slot)
                if my:
                    for px, slot in _edge_iter_h(plane, by, bx, size, 4):
                        _mbfilter(hev_t, interior, mb_lim, px)
                        _writeback(plane, px, slot)
                if inner:
                    for off in sub_offs:
                        for px, slot in _edge_iter_h(
                            plane, by + off, bx, size, 4
                        ):
                            _subblock_filter(hev_t, interior, sub_lim, px)
                            _writeback(plane, px, slot)


# ---------------------------------------------------------------------------
# keyframe decode (§9 header grammar, §11 modes, §13 tokens, §14 recon)

MB_SEGMENT_TREE = (2, 4, -0, -1, -2, -3)
# 16x16 modes imply these subblock modes for neighbor context (§11.3)
_IMPLIED_BMODE = {DC_PRED: B_DC_PRED, V_PRED: B_VE_PRED,
                  H_PRED: B_HE_PRED, TM_PRED: B_TM_PRED}

_COEF_PATHS = tree_paths(COEF_TREE)
_YMODE_PATHS = tree_paths(KF_YMODE_TREE)
_UVMODE_PATHS = tree_paths(UV_MODE_TREE)
_BMODE_PATHS = tree_paths(BMODE_TREE)
_SEGMENT_PATHS = tree_paths(MB_SEGMENT_TREE)


def _parse_frame_tag(payload: bytes) -> dict:
    if len(payload) < 10:
        raise ValueError("VP8 payload too short for a keyframe header")
    tag = payload[0] | (payload[1] << 8) | (payload[2] << 16)
    if tag & 1:
        raise ValueError("VP8 interframe: keyframe-only decoder (module "
                         "contract; a crawl profile keeps stills only)")
    if payload[3:6] != b"\x9d\x01\x2a":
        raise ValueError("VP8 keyframe start code missing")
    (w_raw,) = struct.unpack_from("<H", payload, 6)
    (h_raw,) = struct.unpack_from("<H", payload, 8)
    return {
        "version": (tag >> 1) & 7,
        "show_frame": (tag >> 4) & 1,
        "first_part_size": tag >> 5,
        "width": w_raw & 0x3FFF,
        "height": h_raw & 0x3FFF,
    }


def _parse_header(bd: BoolDecoder) -> dict:
    """First-partition keyframe header (§9.2-§9.11). Returns the
    decode state: quantizers, working coef probs, skip prob, filter
    params, segmentation."""
    hdr: dict = {}
    hdr["color_space"] = bd.bool(128)
    hdr["clamping_type"] = bd.bool(128)
    seg = {"enabled": bool(bd.bool(128)), "update_map": False,
           "tree_probs": [255, 255, 255]}
    if seg["enabled"]:
        seg["update_map"] = bool(bd.bool(128))
        update_data = bd.bool(128)
        if update_data:
            seg["abs_delta"] = bd.bool(128)
            seg["q_deltas"] = [
                bd.signed_literal(7) if bd.bool(128) else 0 for _ in range(4)
            ]
            seg["lf_deltas"] = [
                bd.signed_literal(6) if bd.bool(128) else 0 for _ in range(4)
            ]
        if seg["update_map"]:
            seg["tree_probs"] = [
                bd.literal(8) if bd.bool(128) else 255 for _ in range(3)
            ]
    hdr["segmentation"] = seg
    hdr["filter_type"] = bd.bool(128)
    hdr["filter_level"] = bd.literal(6)
    hdr["sharpness"] = bd.literal(3)
    if bd.bool(128):  # loop filter adjustments enabled
        if bd.bool(128):  # deltas updated
            hdr["ref_lf_deltas"] = [
                bd.signed_literal(6) if bd.bool(128) else 0 for _ in range(4)
            ]
            hdr["mode_lf_deltas"] = [
                bd.signed_literal(6) if bd.bool(128) else 0 for _ in range(4)
            ]
    hdr["log2_parts"] = bd.literal(2)
    y_ac_qi = bd.literal(7)
    deltas = [bd.signed_literal(4) if bd.bool(128) else 0 for _ in range(5)]
    hdr["quant"] = dequant_factors(y_ac_qi, *deltas)
    hdr["quant_deltas"] = deltas
    hdr["y_ac_qi"] = y_ac_qi
    hdr["refresh_entropy"] = bd.bool(128)
    probs = [
        [[list(c3) for c3 in band] for band in plane]
        for plane in DEFAULT_COEF_PROBS
    ]
    for i in range(4):
        for j in range(8):
            for k in range(3):
                for l in range(11):
                    if bd.bool(COEF_UPDATE_PROBS[i][j][k][l]):
                        probs[i][j][k][l] = bd.literal(8)
    hdr["coef_probs"] = probs
    hdr["mb_no_coeff_skip"] = bool(bd.bool(128))
    hdr["prob_skip_false"] = bd.literal(8) if hdr["mb_no_coeff_skip"] else 0
    return hdr


def _parse_mb_headers(bd: BoolDecoder, hdr: dict, mb_cols: int,
                      mb_rows: int) -> list:
    """Keyframe per-MB prediction records (§11): segment id, skip,
    luma mode (+ 16 submodes for B_PRED with above/left context),
    chroma mode."""
    seg = hdr["segmentation"]
    mbs: list[dict] = []
    # submode context rows: above[mb_cols*4], left[4]
    above_sub = [[B_DC_PRED] * 4 for _ in range(mb_cols)]
    for my in range(mb_rows):
        left_sub = [B_DC_PRED] * 4
        for mx in range(mb_cols):
            mb: dict = {"segment": 0, "skip": False}
            if seg["enabled"] and seg["update_map"]:
                mb["segment"] = bd.tree(MB_SEGMENT_TREE, seg["tree_probs"])
            if hdr["mb_no_coeff_skip"]:
                mb["skip"] = bool(bd.bool(hdr["prob_skip_false"]))
            ymode = bd.tree(KF_YMODE_TREE, KF_YMODE_PROB)
            mb["ymode"] = ymode
            if ymode == B_PRED:
                bmodes = []
                for r in range(4):
                    for c in range(4):
                        above_m = (
                            bmodes[(r - 1) * 4 + c]
                            if r else above_sub[mx][c]
                        )
                        left_m = (
                            bmodes[r * 4 + (c - 1)] if c else left_sub[r]
                        )
                        bmodes.append(
                            bd.tree(BMODE_TREE, KF_BMODE_PROB[above_m][left_m])
                        )
                mb["bmodes"] = bmodes
                above_sub[mx] = bmodes[12:16]
                for r in range(4):
                    left_sub[r] = bmodes[r * 4 + 3]
            else:
                implied = _IMPLIED_BMODE[ymode]
                above_sub[mx] = [implied] * 4
                left_sub = [implied] * 4
            mb["uv_mode"] = bd.tree(UV_MODE_TREE, KF_UV_MODE_PROB)
            mbs.append(mb)
    return mbs


def _decode_block_tokens(bd: BoolDecoder, probs, plane: int, ctx: int,
                         first: int, qdc: int, qac: int):
    """One block's token run (§13.3): returns (raster-order
    DEQUANTIZED 16-coeff list, eob)."""
    out = [0] * 16
    i = first
    c = ctx
    skip_eob = False
    eob = first
    while i < 16:
        p = probs[plane][COEF_BANDS[i]][c]
        node = 2 if skip_eob else 0
        while True:
            node = COEF_TREE[node + bd.bool(p[node >> 1])]
            if node <= 0:
                break
        tok = -node
        if tok == EOB_TOKEN:
            break
        if tok == ZERO_TOKEN:
            c = 0
            skip_eob = True
            i += 1
            eob = i
            continue
        skip_eob = False
        if tok <= FOUR_TOKEN:
            av = tok  # ONE..FOUR tokens carry their value
        else:
            extra = 0
            for pb in CAT_PROBS[tok]:
                extra = (extra << 1) | bd.bool(pb)
            av = CAT_BASE[tok] + extra
        if bd.bool(128):
            av = -av
        c = 1 if abs(av) == 1 else 2
        out[ZIGZAG[i]] = av * (qdc if i == 0 else qac)
        i += 1
        eob = i
    return out, eob


def decode_vp8_frame(payload: bytes, loop_filter: bool = True) -> dict:
    """VP8 chunk payload -> dict with uint8 planes ``y`` (h, w), ``u``,
    ``v`` ((h+1)//2, (w+1)//2) plus header info.  Keyframe-only;
    streams relying on the RFC's default probability tables are out of
    contract (module docstring adjudication) — fixture and test
    streams transmit any non-flat probabilities explicitly."""
    tag = _parse_frame_tag(payload)
    w, h = tag["width"], tag["height"]
    if w == 0 or h == 0:
        raise ValueError("VP8 frame with zero dimension")
    if tag["first_part_size"] == 0:
        # a header-only census stub (or a truncated fetch) — decoding
        # zero bits would silently fabricate a frame
        raise ValueError("VP8 frame with empty first partition")
    first = payload[10 : 10 + tag["first_part_size"]]
    if len(first) < tag["first_part_size"]:
        raise ValueError("truncated VP8 first partition")
    bd = BoolDecoder(first)
    hdr = _parse_header(bd)
    mb_cols = (w + 15) // 16
    mb_rows = (h + 15) // 16
    mbs = _parse_mb_headers(bd, hdr, mb_cols, mb_rows)

    rest = payload[10 + tag["first_part_size"]:]
    n_parts = 1 << hdr["log2_parts"]
    parts: list[BoolDecoder] = []
    if n_parts == 1:
        parts = [BoolDecoder(rest)]
    else:
        sizes = []
        off = 3 * (n_parts - 1)
        for i in range(n_parts - 1):
            sizes.append(
                rest[3 * i] | (rest[3 * i + 1] << 8) | (rest[3 * i + 2] << 16)
            )
        for i in range(n_parts):
            ln = sizes[i] if i < n_parts - 1 else len(rest) - off
            parts.append(BoolDecoder(rest[off : off + ln]))
            off += ln

    # per-segment feature application (§9.3/§10): quantizer index and
    # loop-filter level come from the MB's segment when segmentation
    # carries feature data (absolute or delta per abs_delta)
    seg = hdr["segmentation"]
    abs_d = seg.get("abs_delta", 0)
    if seg["enabled"] and "q_deltas" in seg:
        seg_quants = [
            dequant_factors(
                _clamp_q(qd if abs_d else hdr["y_ac_qi"] + qd),
                *hdr["quant_deltas"],
            )
            for qd in seg["q_deltas"]
        ]
    else:
        seg_quants = [hdr["quant"]] * 4
    if seg["enabled"] and "lf_deltas" in seg:
        seg_filter_levels = [
            max(0, min(63, ld if abs_d else hdr["filter_level"] + ld))
            for ld in seg["lf_deltas"]
        ]
    else:
        seg_filter_levels = [hdr["filter_level"]] * 4
    probs = hdr["coef_probs"]

    # padded reconstruction planes: +1 top/left border, +4 right ext
    W16, H16 = mb_cols * 16, mb_rows * 16
    W8, H8 = mb_cols * 8, mb_rows * 8
    yp = np.empty((H16 + 1, W16 + 5), dtype=np.int64)
    up = np.empty((H8 + 1, W8 + 1), dtype=np.int64)
    vp = np.empty((H8 + 1, W8 + 1), dtype=np.int64)
    for pl in (yp, up, vp):
        pl[0, :] = 127
        pl[1:, 0] = 129
    yp[0, 0] = up[0, 0] = vp[0, 0] = 127

    # nonzero contexts: above per MB column, left per MB (reset rowly)
    za_y = [[0] * 4 for _ in range(mb_cols)]
    za_u = [[0] * 2 for _ in range(mb_cols)]
    za_v = [[0] * 2 for _ in range(mb_cols)]
    za_y2 = [0] * mb_cols
    mb_filter_info = []

    for my in range(mb_rows):
        zl_y = [0] * 4
        zl_u = [0] * 2
        zl_v = [0] * 2
        zl_y2 = 0
        tb = parts[my % n_parts]
        for mx in range(mb_cols):
            mb = mbs[my * mb_cols + mx]
            ymode = mb["ymode"]
            q = seg_quants[mb["segment"]]
            qy, qy2, quv = q["y"], q["y2"], q["uv"]
            has_y2 = ymode != B_PRED
            y_plane_type = PLANE_Y_NO_DC if has_y2 else PLANE_Y_WITH_DC
            y_first = 1 if has_y2 else 0
            y_blocks = [[0] * 16 for _ in range(16)]
            u_blocks = [[0] * 16 for _ in range(4)]
            v_blocks = [[0] * 16 for _ in range(4)]
            wht_dc = None
            has_coeffs = False
            if mb["skip"]:
                za_y[mx] = [0] * 4
                zl_y = [0] * 4
                za_u[mx] = [0] * 2
                zl_u = [0] * 2
                za_v[mx] = [0] * 2
                zl_v = [0] * 2
                if has_y2:
                    za_y2[mx] = 0
                    zl_y2 = 0
            else:
                if has_y2:
                    ctx = za_y2[mx] + zl_y2
                    coefs, eob = _decode_block_tokens(
                        tb, probs, PLANE_Y2, ctx, 0, qy2[0], qy2[1]
                    )
                    nz = 1 if eob != 0 else 0
                    za_y2[mx] = zl_y2 = nz
                    has_coeffs |= bool(nz)
                    wht_dc = iwht4x4(coefs)
                for sb in range(16):
                    r, c = divmod(sb, 4)
                    ctx = za_y[mx][c] + zl_y[r]
                    coefs, eob = _decode_block_tokens(
                        tb, probs, y_plane_type, ctx, y_first, qy[0], qy[1]
                    )
                    nz = 1 if eob != y_first else 0
                    za_y[mx][c] = zl_y[r] = nz
                    has_coeffs |= bool(nz)
                    y_blocks[sb] = coefs
                for plane_blocks, za, zl in (
                    (u_blocks, za_u, zl_u),
                    (v_blocks, za_v, zl_v),
                ):
                    for sb in range(4):
                        r, c = divmod(sb, 2)
                        ctx = za[mx][c] + zl[r]
                        coefs, eob = _decode_block_tokens(
                            tb, probs, PLANE_UV, ctx, 0, quv[0], quv[1]
                        )
                        nz = 1 if eob != 0 else 0
                        za[mx][c] = zl[r] = nz
                        has_coeffs |= bool(nz)
                        plane_blocks[sb] = coefs
            mb_filter_info.append(
                {
                    "mode": ymode,
                    "has_coeffs": has_coeffs,
                    "level": seg_filter_levels[mb["segment"]],
                }
            )

            # ---- reconstruct luma
            x0, y0 = 1 + mx * 16, 1 + my * 16
            if has_y2:
                pred = predict_mb(
                    ymode,
                    yp[y0 - 1, x0 : x0 + 16],
                    yp[y0 : y0 + 16, x0 - 1],
                    yp[y0 - 1, x0 - 1],
                    16,
                    my > 0,
                    mx > 0,
                )
                block = np.array(pred)
                if not mb["skip"]:
                    for sb in range(16):
                        r, c = divmod(sb, 4)
                        coefs = y_blocks[sb]
                        if wht_dc is not None:
                            coefs = list(coefs)
                            coefs[0] = int(wht_dc[r, c])
                        res = idct4x4(coefs)
                        block[r * 4 : r * 4 + 4, c * 4 : c * 4 + 4] += res
                yp[y0 : y0 + 16, x0 : x0 + 16] = np.clip(block, 0, 255)
            else:
                for sb in range(16):
                    r, c = divmod(sb, 4)
                    sx, sy = x0 + c * 4, y0 + r * 4
                    if c < 3:
                        arow = yp[sy - 1, sx : sx + 8]
                    else:
                        # right-column quirk: above-right always comes
                        # from the row directly above the MACROBLOCK
                        arow = np.concatenate(
                            [
                                yp[sy - 1, sx : sx + 4],
                                yp[y0 - 1, x0 + 16 : x0 + 20],
                            ]
                        )
                    pred = predict_subblock(
                        mb["bmodes"][sb],
                        arow,
                        yp[sy : sy + 4, sx - 1],
                        yp[sy - 1, sx - 1],
                    )
                    if not mb["skip"]:
                        pred = pred + idct4x4(y_blocks[sb])
                    yp[sy : sy + 4, sx : sx + 4] = np.clip(pred, 0, 255)

            # ---- reconstruct chroma
            for plane, blocks in ((up, u_blocks), (vp, v_blocks)):
                cx0, cy0 = 1 + mx * 8, 1 + my * 8
                pred = predict_mb(
                    mb["uv_mode"],
                    plane[cy0 - 1, cx0 : cx0 + 8],
                    plane[cy0 : cy0 + 8, cx0 - 1],
                    plane[cy0 - 1, cx0 - 1],
                    8,
                    my > 0,
                    mx > 0,
                )
                block = np.array(pred)
                if not mb["skip"]:
                    for sb in range(4):
                        r, c = divmod(sb, 2)
                        res = idct4x4(blocks[sb])
                        block[r * 4 : r * 4 + 4, c * 4 : c * 4 + 4] += res
                plane[cy0 : cy0 + 8, cx0 : cx0 + 8] = np.clip(block, 0, 255)
        # fill the 4-px right extension for this MB row (above-right
        # source for the next row's rightmost subblocks)
        rows = slice(1 + my * 16, 1 + my * 16 + 16)
        yp[rows, W16 + 1 :] = yp[rows, W16 : W16 + 1]

    yr = yp[1:, 1 : W16 + 1].astype(np.uint8)
    ur = up[1:, 1:].astype(np.uint8)
    vr = vp[1:, 1:].astype(np.uint8)
    if loop_filter and any(i["level"] for i in mb_filter_info):
        yr = yr.copy()
        ur = ur.copy()
        vr = vr.copy()
        apply_loop_filter(
            yr, ur, vr, hdr["filter_level"], hdr["sharpness"],
            hdr["filter_type"], mb_filter_info, mb_cols, mb_rows,
        )
    cw, ch = (w + 1) // 2, (h + 1) // 2
    return {
        "width": w,
        "height": h,
        "y": yr[:h, :w],
        "u": ur[:ch, :cw],
        "v": vr[:ch, :cw],
        "header": hdr,
        "mbs": mbs,
    }


def yuv_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Full-range BT.601 integer conversion with nearest (2x2 box)
    chroma upsampling.  Documented module conversion — u = v = 128 is
    EXACTLY grayscale (r = g = b = y), which the alpha/parity fixtures
    rely on; libwebp's fancy upsampler is not bit-matched (no
    in-container reference — module docstring adjudication)."""
    h, w = y.shape
    uu = np.repeat(np.repeat(u, 2, axis=0), 2, axis=1)[:h, :w].astype(np.int64)
    vv = np.repeat(np.repeat(v, 2, axis=0), 2, axis=1)[:h, :w].astype(np.int64)
    yy = y.astype(np.int64)
    cr = vv - 128
    cb = uu - 128
    r = yy + ((91881 * cr + 32768) >> 16)
    g = yy - ((22554 * cb + 46802 * cr + 32768) >> 16)
    b = yy + ((116130 * cb + 32768) >> 16)
    return np.stack(
        [np.clip(p, 0, 255).astype(np.uint8) for p in (r, g, b)], axis=2
    )


# ---------------------------------------------------------------------------
# bounded fixture encoder (§8 mirror of the decode grammar)


def _encode_block_tokens(be: BoolEncoder, probs, plane: int, ctx: int,
                         first: int, levels) -> int:
    """Emit one block's QUANTIZED levels (raster order, zigzag-scanned
    here) mirroring _decode_block_tokens exactly; returns eob."""
    scan = [int(levels[ZIGZAG[i]]) for i in range(16)]
    lastnz = -1
    for i in range(first, 16):
        if scan[i]:
            lastnz = i
    i = first
    c = ctx
    skip_eob = False
    while i < 16:
        p = probs[plane][COEF_BANDS[i]][c]
        if lastnz < i:
            if skip_eob:
                raise ValueError(
                    "trailing zero run must end in a coefficient, not EOB"
                )
            for idx, bit in _COEF_PATHS[EOB_TOKEN]:
                be.bool(bit, p[idx])
            return i
        v = scan[i]
        av = abs(v)
        if av == 0:
            tok = ZERO_TOKEN
        elif av <= 4:
            tok = TOKEN_FOR_ABS[av]
        elif av <= 6:
            tok = CAT1
        elif av <= 10:
            tok = CAT2
        elif av <= 18:
            tok = CAT3
        elif av <= 34:
            tok = CAT4
        elif av <= 66:
            tok = CAT5
        elif av <= 2114:
            tok = CAT6
        else:
            raise ValueError(f"coefficient level {v} out of CAT6 range")
        path = _COEF_PATHS[tok]
        if skip_eob:
            # the post-ZERO tree starts at node 2: drop the EOB branch
            path = path[1:]
        for idx, bit in path:
            be.bool(bit, p[idx])
        if tok == ZERO_TOKEN:
            c = 0
            skip_eob = True
            i += 1
            continue
        skip_eob = False
        if tok >= CAT1:
            extra = av - CAT_BASE[tok]
            cat = CAT_PROBS[tok]
            for bi, pb in enumerate(cat):
                be.bool((extra >> (len(cat) - 1 - bi)) & 1, pb)
        be.bool(1 if v < 0 else 0, 128)
        c = 1 if av == 1 else 2
        i += 1
    return 16


def encode_vp8_keyframe(
    width: int,
    height: int,
    mbs: list,
    y_ac_qi: int = 0,
    filter_level: int = 0,
    sharpness: int = 0,
    filter_type: int = 0,
    mb_no_coeff_skip: bool = False,
    prob_skip_false: int = 128,
    coef_prob_updates: dict | None = None,
    log2_parts: int = 0,
    segmentation: dict | None = None,
) -> bytes:
    """Assemble a spec-grammar VP8 keyframe from explicit per-MB
    prediction records and QUANTIZED levels.  Each entry of ``mbs``
    (raster order): ``{"ymode", "bmodes" (16, B_PRED only), "uv_mode",
    "skip", "y_levels" (16x16 raster), "y2_levels" (16, non-B_PRED),
    "u_levels"/"v_levels" (4x16), "segment" (with segmentation)}``.
    Levels are what the decoder multiplies by the dequant factors —
    the caller owns exactness (per-SEGMENT factors when segmentation
    carries q_deltas).  ``segmentation``: ``{"abs_delta": 0|1,
    "q_deltas": [4], "lf_deltas": [4], "tree_probs": [3]}`` — emits
    the §9.3 grammar and the per-MB segment ids."""
    mb_cols = (width + 15) // 16
    mb_rows = (height + 15) // 16
    if len(mbs) != mb_cols * mb_rows:
        raise ValueError("mbs must cover the full macroblock grid")
    updates = coef_prob_updates or {}
    probs = [
        [[list(c3) for c3 in band] for band in plane]
        for plane in DEFAULT_COEF_PROBS
    ]
    for (i, j, k, l), pv in updates.items():
        probs[i][j][k][l] = pv

    # ---- first partition: header + MB prediction records
    be = BoolEncoder()
    be.bool(0, 128)  # color space
    be.bool(0, 128)  # clamping
    if segmentation is None:
        be.bool(0, 128)  # segmentation disabled
    else:
        seg_tree_probs = segmentation.get("tree_probs", [128, 128, 128])
        be.bool(1, 128)  # enabled
        be.bool(1, 128)  # update_mb_segmentation_map
        has_data = (
            "q_deltas" in segmentation or "lf_deltas" in segmentation
        )
        be.bool(1 if has_data else 0, 128)
        if has_data:
            be.bool(segmentation.get("abs_delta", 0), 128)
            for qd in segmentation.get("q_deltas", [0, 0, 0, 0]):
                if qd or "q_deltas" in segmentation:
                    be.bool(1, 128)
                    be.signed_literal(qd, 7)
                else:
                    be.bool(0, 128)
            for ld in segmentation.get("lf_deltas", [0, 0, 0, 0]):
                if ld or "lf_deltas" in segmentation:
                    be.bool(1, 128)
                    be.signed_literal(ld, 6)
                else:
                    be.bool(0, 128)
        for tp in seg_tree_probs:
            be.bool(1, 128)
            be.literal(tp, 8)
    be.bool(filter_type & 1, 128)
    be.literal(filter_level, 6)
    be.literal(sharpness, 3)
    be.bool(0, 128)  # no loop-filter adjustments
    be.literal(log2_parts, 2)
    be.literal(y_ac_qi, 7)
    for _ in range(5):
        be.bool(0, 128)  # no quantizer deltas
    be.bool(0, 128)  # refresh entropy (keyframe: value ignored on read)
    for i in range(4):
        for j in range(8):
            for k in range(3):
                for l in range(11):
                    if (i, j, k, l) in updates:
                        be.bool(1, COEF_UPDATE_PROBS[i][j][k][l])
                        be.literal(updates[(i, j, k, l)], 8)
                    else:
                        be.bool(0, COEF_UPDATE_PROBS[i][j][k][l])
    be.bool(1 if mb_no_coeff_skip else 0, 128)
    if mb_no_coeff_skip:
        be.literal(prob_skip_false, 8)

    above_sub = [[B_DC_PRED] * 4 for _ in range(mb_cols)]
    for my in range(mb_rows):
        left_sub = [B_DC_PRED] * 4
        for mx in range(mb_cols):
            mb = mbs[my * mb_cols + mx]
            if segmentation is not None:
                be.tree(
                    MB_SEGMENT_TREE,
                    segmentation.get("tree_probs", [128, 128, 128]),
                    mb.get("segment", 0),
                    _SEGMENT_PATHS,
                )
            if mb_no_coeff_skip:
                be.bool(1 if mb.get("skip") else 0, prob_skip_false)
            ymode = mb["ymode"]
            be.tree(KF_YMODE_TREE, KF_YMODE_PROB, ymode, _YMODE_PATHS)
            if ymode == B_PRED:
                bmodes = mb["bmodes"]
                for r in range(4):
                    for c in range(4):
                        above_m = (
                            bmodes[(r - 1) * 4 + c]
                            if r else above_sub[mx][c]
                        )
                        left_m = (
                            bmodes[r * 4 + (c - 1)] if c else left_sub[r]
                        )
                        be.tree(
                            BMODE_TREE,
                            KF_BMODE_PROB[above_m][left_m],
                            bmodes[r * 4 + c],
                            _BMODE_PATHS,
                        )
                above_sub[mx] = list(bmodes[12:16])
                for r in range(4):
                    left_sub[r] = bmodes[r * 4 + 3]
            else:
                implied = _IMPLIED_BMODE[ymode]
                above_sub[mx] = [implied] * 4
                left_sub = [implied] * 4
            be.tree(UV_MODE_TREE, KF_UV_MODE_PROB, mb["uv_mode"],
                    _UVMODE_PATHS)
    first_part = be.getvalue()

    # ---- token partitions (MB row r -> partition r % n)
    n_parts = 1 << log2_parts
    encs = [BoolEncoder() for _ in range(n_parts)]
    za_y = [[0] * 4 for _ in range(mb_cols)]
    za_u = [[0] * 2 for _ in range(mb_cols)]
    za_v = [[0] * 2 for _ in range(mb_cols)]
    za_y2 = [0] * mb_cols
    for my in range(mb_rows):
        zl_y = [0] * 4
        zl_u = [0] * 2
        zl_v = [0] * 2
        zl_y2 = 0
        tb = encs[my % n_parts]
        for mx in range(mb_cols):
            mb = mbs[my * mb_cols + mx]
            ymode = mb["ymode"]
            has_y2 = ymode != B_PRED
            if mb.get("skip"):
                if not mb_no_coeff_skip:
                    raise ValueError("skip requires mb_no_coeff_skip")
                za_y[mx] = [0] * 4
                zl_y = [0] * 4
                za_u[mx] = [0] * 2
                zl_u = [0] * 2
                za_v[mx] = [0] * 2
                zl_v = [0] * 2
                if has_y2:
                    za_y2[mx] = 0
                    zl_y2 = 0
                continue
            if has_y2:
                eob = _encode_block_tokens(
                    tb, probs, PLANE_Y2, za_y2[mx] + zl_y2, 0,
                    mb.get("y2_levels") or [0] * 16,
                )
                za_y2[mx] = zl_y2 = 1 if eob != 0 else 0
            y_plane_type = PLANE_Y_NO_DC if has_y2 else PLANE_Y_WITH_DC
            y_first = 1 if has_y2 else 0
            y_levels = mb.get("y_levels") or [[0] * 16 for _ in range(16)]
            for sb in range(16):
                r, c = divmod(sb, 4)
                eob = _encode_block_tokens(
                    tb, probs, y_plane_type, za_y[mx][c] + zl_y[r],
                    y_first, y_levels[sb],
                )
                za_y[mx][c] = zl_y[r] = 1 if eob != y_first else 0
            for key, za, zl in (("u_levels", za_u, zl_u),
                                ("v_levels", za_v, zl_v)):
                blocks = mb.get(key) or [[0] * 16 for _ in range(4)]
                for sb in range(4):
                    r, c = divmod(sb, 2)
                    eob = _encode_block_tokens(
                        tb, probs, PLANE_UV, za[mx][c] + zl[r], 0, blocks[sb]
                    )
                    za[mx][c] = zl[r] = 1 if eob != 0 else 0
    token_parts = [e.getvalue() for e in encs]

    tag = (len(first_part) << 5) | (1 << 4)  # keyframe, ver 0, shown
    out = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
    out += b"\x9d\x01\x2a"
    out += struct.pack("<H", width) + struct.pack("<H", height)
    out += first_part
    for part in token_parts[:-1]:
        out += bytes(
            [len(part) & 0xFF, (len(part) >> 8) & 0xFF,
             (len(part) >> 16) & 0xFF]
        )
    for part in token_parts[:-1]:
        out += part
    out += token_parts[-1]
    return out


def encode_vp8_gray_blocks(block_vals: np.ndarray,
                           filter_level: int = 0) -> bytes:
    """The analytic-oracle fixture: a grayscale keyframe whose DECODED
    luma is EXACTLY ``block_vals`` upsampled 4x (each entry paints one
    4x4 block).  Construction: B_PRED/B_DC_PRED everywhere, DC-only
    residuals at y_ac_qi=0 (dc quant 4): level 2t reconstructs
    (8t+4)>>3 == t exactly, and with values in [0, 255] no clamp ever
    engages; chroma residuals are zero (u = v = 128 propagates from
    the synthesized borders).  The B_PRED choice keeps every bmode
    context at (B_DC, B_DC) — the one RFC-transcribed kf_bmode row."""
    bv = np.asarray(block_vals, dtype=np.int64)
    bh, bw = bv.shape
    if bh % 4 or bw % 4:
        raise ValueError("block grid must tile whole macroblocks")
    if bv.min() < 0 or bv.max() > 255:
        raise ValueError("block values must be in [0, 255]")
    mb_rows, mb_cols = bh // 4, bw // 4
    # simulate B_DC_PRED over the block-constant grid to get residuals
    pred = np.zeros_like(bv)
    for r in range(bh):
        for c in range(bw):
            above = bv[r - 1, c] if r else 127
            left = bv[r, c - 1] if c else 129
            pred[r, c] = (4 * above + 4 * left + 4) >> 3
    t = bv - pred
    mbs = []
    for my in range(mb_rows):
        for mx in range(mb_cols):
            y_levels = []
            for sb in range(16):
                r, c = divmod(sb, 4)
                lv = [0] * 16
                lv[0] = 2 * int(t[my * 4 + r, mx * 4 + c])
                y_levels.append(lv)
            mbs.append(
                {
                    "ymode": B_PRED,
                    "bmodes": [B_DC_PRED] * 16,
                    "uv_mode": DC_PRED,
                    "y_levels": y_levels,
                }
            )
    return encode_vp8_keyframe(
        bw * 4, bh * 4, mbs, y_ac_qi=0, filter_level=filter_level
    )
