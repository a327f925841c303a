"""Pure-NumPy baseline JPEG codec (ITU-T T.81 / ISO 10918-1).

The last big gap in the multimodal decode family (``sources/png.py``,
``sources/tiff.py``, ``sources/wav.py``): real crawl corpora are
JPEG-dominated, so ``image_phash`` / ``resize_images`` /
``extract_features`` need the format even though the dask reference has
no media decode at all (this is extension-brief surface, not reference
parity — the reference reads TIFF only, ``anno_upsampling.py:33``).

Implemented from the public specification:

* **Decoder** — sequential DCT (SOF0; SOF1 accepted, its Huffman path
  is identical) AND progressive DCT (SOF2: spectral selection +
  successive approximation, DC/AC first and refinement scans, EOB
  runs — T.81 Annex G), canonical Huffman entropy decode via a
  16-bit-peek lookup table, byte destuffing and restart markers,
  8- and 16-bit quantization tables, interleaved and non-interleaved
  scans, grayscale and JFIF YCbCr with any integer sampling factors
  (4:4:4 / 4:2:2 / 4:2:0 tested).  Lossless (SOF3/7/11/15),
  hierarchical and arithmetic-coded (SOF9-11/13-15, DAC) frames raise
  ``NotImplementedError`` — clearly-marked contract boundaries, same
  policy as the mp4/mkv video containers.
* **Encoder** — baseline sequential or progressive
  (``progressive=True``: DC at Al=1 + refinement, per-component AC
  band + refinement — decode output is bit-identical to the
  sequential encoding, which the tests fuzz), grayscale or RGB,
  optional chroma subsampling and restart intervals (sequential),
  Annex-K-style default quantization tables scaled by libjpeg's
  quality curve.  Entropy tables are built per image/scan (every used
  symbol coded at one fixed length, the all-ones code left unused per
  T.81 C.2), embedded in DHT — any conforming decoder reads them back.

The iDCT is the exact orthonormal 2-D DCT (T.81 A.3.3 equals the
orthonormal transform: forward ``S = M s Mᵀ``, inverse ``s = Mᵀ S M``
with ``M`` the 8-point orthonormal DCT-II matrix), batched over all
blocks of a component in one einsum — entropy decode is the only
per-symbol Python loop, so the codec is honest about where its
throughput ceiling is (see SCALE.md).

Driver/executor-local NumPy only — no Spark dependency — so the same
functions serve fixture writers, tests, and ``mapInPandas`` kernels.
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_SOI = b"\xff\xd8"

#: zigzag scan: ZIGZAG[k] = flat (u*8+v) index of the k-th coefficient
def _zigzag() -> np.ndarray:
    order: list[int] = []
    for s in range(15):
        diag = [
            (s - j, j)
            for j in range(s + 1)
            if 0 <= s - j < 8 and 0 <= j < 8
        ]
        if s % 2:
            diag.reverse()
        order.extend(u * 8 + v for u, v in diag)
    return np.array(order, dtype=np.int64)


ZIGZAG = _zigzag()

#: Annex K example quantization tables (luminance / chrominance)
K1_LUM = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)
K2_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int64,
)

_NOT_BASELINE = {
    0xC3: "lossless sequential (SOF3)",
    0xC5: "differential sequential (SOF5)",
    0xC6: "differential progressive (SOF6)",
    0xC7: "differential lossless (SOF7)",
    0xC9: "arithmetic-coded sequential (SOF9)",
    0xCA: "arithmetic-coded progressive (SOF10)",
    0xCB: "arithmetic-coded lossless (SOF11)",
    0xCD: "differential arithmetic sequential (SOF13)",
    0xCE: "differential arithmetic progressive (SOF14)",
    0xCF: "differential arithmetic lossless (SOF15)",
}


def _dct8() -> np.ndarray:
    """8-point orthonormal DCT-II matrix (T.81 A.3.3 normalization)."""
    x = 2 * np.arange(8) + 1
    u = np.arange(8)[:, None]
    m = np.cos(np.pi * u * x[None, :] / 16.0) * 0.5
    m[0] *= np.sqrt(0.5)
    return m


_M8 = _dct8()


class _HuffTable:
    """Canonical Huffman table with a 16-bit-peek decode LUT."""

    __slots__ = ("lut_len", "lut_sym", "codes")

    def __init__(self, bits: list[int], vals: list[int]):
        self.lut_len = np.zeros(1 << 16, dtype=np.uint8)
        self.lut_sym = np.zeros(1 << 16, dtype=np.uint8)
        self.codes: dict[int, tuple[int, int]] = {}  # sym -> (code, len)
        code = 0
        k = 0
        for length in range(1, 17):
            if code >= (1 << length):
                raise ValueError("jpeg: overfull Huffman table")
            for _ in range(bits[length - 1]):
                if k >= len(vals):
                    raise ValueError("jpeg: DHT counts exceed symbols")
                sym = vals[k]
                k += 1
                lo = code << (16 - length)
                hi = (code + 1) << (16 - length)
                if hi > (1 << 16):
                    raise ValueError("jpeg: Huffman code overflows 16 bits")
                self.lut_len[lo:hi] = length
                self.lut_sym[lo:hi] = sym
                self.codes[sym] = (code, length)
                code += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over destuffed entropy-coded bytes."""

    __slots__ = ("data", "pos", "buf", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.buf = 0
        self.n = 0

    def _fill(self, need: int) -> None:
        while self.n < need:
            if self.pos < len(self.data):
                self.buf = (self.buf << 8) | self.data[self.pos]
                self.pos += 1
            else:
                self.buf <<= 8  # tail padding; valid streams never use it
            self.n += 8

    def decode(self, table: _HuffTable) -> int:
        self._fill(16)
        peek = (self.buf >> (self.n - 16)) & 0xFFFF
        length = int(table.lut_len[peek])
        if length == 0:
            raise ValueError("jpeg: invalid Huffman code in scan")
        self.n -= length
        self.buf &= (1 << self.n) - 1
        return int(table.lut_sym[peek])

    def receive(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        self._fill(nbits)
        v = (self.buf >> (self.n - nbits)) & ((1 << nbits) - 1)
        self.n -= nbits
        self.buf &= (1 << self.n) - 1
        return v


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the s-bit magnitude to a signed value."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _split_scan(data: bytes, start: int) -> tuple[list[bytes], int]:
    """Destuff the entropy-coded bytes from ``start``: returns the list
    of restart segments (0xFF00 unstuffed, RSTn boundaries split) and
    the offset of the terminating marker."""
    a = np.frombuffer(data, dtype=np.uint8)[start:]
    ff = np.flatnonzero(a == 0xFF)
    nxt = np.full(ff.shape, 0xD9, dtype=np.uint8)  # EOF acts like EOI
    inside = ff + 1 < len(a)
    nxt[inside] = a[ff[inside] + 1]
    is_rst = (nxt >= 0xD0) & (nxt <= 0xD7)
    is_stuff = nxt == 0x00
    term = np.flatnonzero(~is_rst & ~is_stuff & (nxt != 0xFF))
    end = int(ff[term[0]]) if len(term) else len(a)
    segs: list[bytes] = []
    seg_start = 0
    for i in np.flatnonzero(is_rst):
        p = int(ff[i])
        if p >= end:
            break
        segs.append(_destuff(a[seg_start:p]))
        seg_start = p + 2
    segs.append(_destuff(a[seg_start:end]))
    return segs, start + end


def _destuff(a: np.ndarray) -> bytes:
    """Drop the 0x00 byte after each 0xFF (T.81 F.1.2.3 byte stuffing)."""
    ff = np.flatnonzero(a[:-1] == 0xFF) + 1 if len(a) else np.array([], int)
    stuffed = ff[a[ff] == 0x00] if len(ff) else ff
    return np.delete(a, stuffed).tobytes() if len(stuffed) else a.tobytes()


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode baseline JPEG bytes to ``uint8``: 2-D for grayscale,
    H×W×3 RGB for color (JFIF YCbCr, CCIR 601 conversion)."""
    if data[:2] != JPEG_SOI:
        raise ValueError("jpeg: missing SOI marker")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}
    frame = None  # (h, w, comps) with comps = [(cid, hs, vs, tq)]
    restart_interval = 0
    coeffs: dict[int, np.ndarray] = {}  # cid -> (bh, bw, 64) int32
    pos = 2
    n = len(data)
    while pos < n:
        if data[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at byte {pos}")
        while pos < n and data[pos] == 0xFF:
            pos += 1  # fill bytes
        marker = data[pos]
        pos += 1
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # TEM / stray RST: no segment body
        if marker in _NOT_BASELINE:
            raise NotImplementedError(
                f"jpeg: {_NOT_BASELINE[marker]} is outside baseline "
                "sequential; only SOF0/SOF1 Huffman frames decode"
            )
        if marker == 0xCC:  # DAC
            raise NotImplementedError(
                "jpeg: arithmetic coding conditioning (DAC) is outside "
                "baseline sequential"
            )
        (seg_len,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0xF
                off += 1
                if pq:
                    tbl = np.frombuffer(
                        seg[off : off + 128], dtype=">u2"
                    ).astype(np.int64)
                    off += 128
                else:
                    tbl = np.frombuffer(
                        seg[off : off + 64], dtype=np.uint8
                    ).astype(np.int64)
                    off += 64
                dz = np.zeros(64, dtype=np.int64)
                dz[ZIGZAG] = tbl  # stored in zigzag order per spec
                qt[tq] = dz.reshape(8, 8)
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0 / SOF1 / SOF2
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError(
                    f"jpeg: {prec}-bit precision is extended sequential; "
                    "8-bit frames decode"
                )
            h, w = struct.unpack(">HH", seg[1:5])
            if h == 0:
                raise NotImplementedError(
                    "jpeg: deferred height via DNL is not supported"
                )
            ncomp = seg[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (h, w, comps)
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 0xF
                bits = list(seg[off + 1 : off + 17])
                nv = sum(bits)
                vals = list(seg[off + 17 : off + 17 + nv])
                huff[(tc, th)] = _HuffTable(bits, vals)
                off += 17 + nv
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cs, tables = seg[1 + 2 * i : 3 + 2 * i]
                scan_comps.append((cs, tables >> 4, tables & 0xF))
            ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
            segs, pos = _split_scan(data, pos + seg_len)
            _decode_scan(
                segs, frame, scan_comps, huff, coeffs, restart_interval,
                ss, se, ahal >> 4, ahal & 0xF,
            )
            continue
        pos += seg_len
    if frame is None or not coeffs:
        raise ValueError("jpeg: no decodable frame found")
    return _reconstruct(frame, qt, coeffs)


def _comp_geometry(frame) -> dict[int, tuple[int, int, int, int, int, int]]:
    """Per component: (h_samp, v_samp, width, height, bw, bh) where
    bw/bh are MCU-padded block-grid dims (T.81 A.2.4)."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    out = {}
    for cid, hs, vs, _tq in comps:
        cw = -(-w * hs // hmax)
        ch = -(-h * vs // vmax)
        out[cid] = (hs, vs, cw, ch, mcux * hs, mcuy * vs)
    return out


class _EobState:
    """AC end-of-band run, shared across blocks within a restart segment
    (T.81 G.1.2.2)."""

    __slots__ = ("run",)

    def __init__(self):
        self.run = 0


def _decode_scan(
    segs, frame, scan_comps, huff, coeffs, restart_interval,
    ss=0, se=63, ah=0, al=0,
):
    """One entropy-coded scan into the coefficient store.  Dispatch is
    scan-header-driven (T.81 Annex F baseline, Annex G progressive):
    (0,63) = full sequential block; (0,0) = progressive DC first/refine;
    ss>=1 = progressive AC band first/refine with EOB runs."""
    h, w, comps = frame
    geom = _comp_geometry(frame)
    by_id = {c[0]: c for c in comps}
    for cs, _td, _ta in scan_comps:
        if cs not in by_id:
            raise ValueError(f"jpeg: scan references unknown component {cs}")
        _hs, _vs, _cw, _ch, bw, bh = geom[cs]
        coeffs.setdefault(cs, np.zeros((bh, bw, 64), dtype=np.int32))
    if ss > 0 and len(scan_comps) != 1:
        raise ValueError("jpeg: progressive AC scans must be single-component")
    if ss > se or se > 63:
        raise ValueError(f"jpeg: invalid spectral band [{ss}, {se}]")

    # scan MCU order: interleaved when Ns > 1, the component's true
    # (unpadded) block grid when Ns == 1 (T.81 A.2)
    if len(scan_comps) == 1:
        cs, td, ta = scan_comps[0]
        _hs, _vs, cw, ch, _bw, _bh = geom[cs]
        nx, ny = -(-cw // 8), -(-ch // 8)
        units = [
            (cs, td, ta, y, x) for y in range(ny) for x in range(nx)
        ]
        per_mcu = 1
    else:
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
        units = []
        for my in range(mcuy):
            for mx in range(mcux):
                for cs, td, ta in scan_comps:
                    hs, vs = geom[cs][0], geom[cs][1]
                    for dy in range(vs):
                        for dx in range(hs):
                            units.append(
                                (cs, td, ta, my * vs + dy, mx * hs + dx)
                            )
        per_mcu = sum(geom[cs][0] * geom[cs][1] for cs, _t, _a in scan_comps)
        mcux_total = mcux * mcuy
        if restart_interval and len(segs) != -(
            -mcux_total // restart_interval
        ):
            raise ValueError(
                f"jpeg: {len(segs)} restart segments for {mcux_total} MCUs "
                f"at interval {restart_interval}"
            )

    mcu_per_seg = restart_interval if restart_interval else None
    seg_iter = iter(segs)
    reader = _BitReader(next(seg_iter))
    preds = dict.fromkeys(coeffs, 0)
    eob = _EobState()
    done_in_seg = 0
    full = (ss, se) == (0, 63)
    for i in range(0, len(units), per_mcu):
        if mcu_per_seg and done_in_seg == mcu_per_seg:
            try:
                reader = _BitReader(next(seg_iter))
            except StopIteration:
                raise ValueError(
                    "jpeg: scan ends before all restart intervals"
                ) from None
            preds = dict.fromkeys(preds, 0)
            eob = _EobState()
            done_in_seg = 0
        for cs, td, ta, by, bx in units[i : i + per_mcu]:
            blk = coeffs[cs][by, bx]
            if full:
                dc_tbl = huff.get((0, td))
                ac_tbl = huff.get((1, ta))
                if dc_tbl is None or ac_tbl is None:
                    raise ValueError(
                        "jpeg: scan uses an undefined Huffman table"
                    )
                s = reader.decode(dc_tbl)
                preds[cs] += _extend(reader.receive(s), s)
                blk[0] = preds[cs]
                k = 1
                while k < 64:
                    rs = reader.decode(ac_tbl)
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r == 15:  # ZRL: 16 zeros
                            k += 16
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        raise ValueError("jpeg: AC run past coefficient 63")
                    blk[ZIGZAG[k]] = _extend(reader.receive(s), s)
                    k += 1
            elif ss == 0:  # progressive DC
                if ah == 0:
                    dc_tbl = huff.get((0, td))
                    if dc_tbl is None:
                        raise ValueError(
                            "jpeg: DC scan uses an undefined Huffman table"
                        )
                    s = reader.decode(dc_tbl)
                    preds[cs] += _extend(reader.receive(s), s)
                    blk[0] = preds[cs] << al
                elif reader.receive(1):  # refinement: one bit per block
                    blk[0] |= 1 << al
            else:  # progressive AC band
                ac_tbl = huff.get((1, ta))
                if ac_tbl is None:
                    raise ValueError(
                        "jpeg: AC scan uses an undefined Huffman table"
                    )
                if ah == 0:
                    _ac_first(blk, reader, ac_tbl, eob, ss, se, al)
                else:
                    _ac_refine(blk, reader, ac_tbl, eob, ss, se, al)
        done_in_seg += 1


def _ac_first(blk, reader, ac_tbl, eob, ss, se, al):
    """First scan of an AC spectral band (T.81 G.1.2.2)."""
    if eob.run > 0:
        eob.run -= 1
        return
    k = ss
    while k <= se:
        rs = reader.decode(ac_tbl)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eob.run = (1 << r) - 1  # EOBn: run counts THIS block too
            if r:
                eob.run += reader.receive(r)
            break
        k += r
        if k > se:
            raise ValueError("jpeg: AC run past the spectral band")
        blk[ZIGZAG[k]] = _extend(reader.receive(s), s) << al
        k += 1


def _ac_refine(blk, reader, ac_tbl, eob, ss, se, al):
    """Successive-approximation refinement of an AC band (T.81
    G.1.2.3): newly-nonzero coefficients arrive as ±1<<al; every
    nonzero-history coefficient passed on the way reads one correction
    bit."""
    p1 = 1 << al
    k = ss
    if eob.run == 0:
        while k <= se:
            rs = reader.decode(ac_tbl)
            r, s = rs >> 4, rs & 0xF
            newval = 0
            if s == 0:
                if r != 15:
                    eob.run = 1 << r
                    if r:
                        eob.run += reader.receive(r)
                    break
                # r == 15: ZRL skips 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError(
                        "jpeg: refinement magnitude must be 1"
                    )
                newval = p1 if reader.receive(1) else -p1
            while k <= se:
                pos = ZIGZAG[k]
                if blk[pos] != 0:
                    if reader.receive(1) and not (blk[pos] & p1):
                        blk[pos] += p1 if blk[pos] >= 0 else -p1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval:
                if k > se:
                    raise ValueError("jpeg: refinement run past the band")
                blk[ZIGZAG[k]] = newval
            k += 1
    if eob.run > 0:
        while k <= se:
            pos = ZIGZAG[k]
            if blk[pos] != 0:
                if reader.receive(1) and not (blk[pos] & p1):
                    blk[pos] += p1 if blk[pos] >= 0 else -p1
            k += 1
        eob.run -= 1


def _reconstruct(frame, qt, coeffs) -> np.ndarray:
    h, w, comps = frame
    geom = _comp_geometry(frame)
    planes = []
    for cid, _hs, _vs, tq in comps:
        if tq not in qt:
            raise ValueError(f"jpeg: component {cid} uses undefined DQT {tq}")
        _h, _v, cw, ch, bw, bh = geom[cid]
        c = coeffs.get(cid)
        if c is None:
            raise ValueError(f"jpeg: no scan decoded component {cid}")
        deq = c.reshape(bh, bw, 8, 8).astype(np.float64) * qt[tq][None, None]
        pix = np.einsum("ji,xyjk,kl->xyil", _M8, deq, _M8, optimize=True)
        plane = pix.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8) + 128.0
        plane = np.clip(np.round(plane), 0, 255).astype(np.uint8)
        plane = plane[:ch, :cw]
        if (cw, ch) != (w, h):  # chroma upsample by index replication
            plane = plane[(np.arange(h) * ch) // h][
                :, (np.arange(w) * cw) // w
            ]
        planes.append(plane.astype(np.float64))
    if len(planes) == 1:
        return planes[0].astype(np.uint8)
    if len(planes) != 3:
        raise NotImplementedError(
            f"jpeg: {len(planes)}-component frames (CMYK/unknown) are not "
            "supported; grayscale and YCbCr are"
        )
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def parse_jpeg_info(data: bytes) -> dict:
    """Header-only metadata parse: walk the marker stream to the first
    SOF and return ``{"width", "height", "n_components", "baseline",
    "progressive"}`` WITHOUT entropy-decoding a single bit — the
    planning-side op (profile a 100 TB image corpus's dimensions at
    marker-walk speed, decode only what a kernel actually needs)."""
    if data[:2] != JPEG_SOI:
        raise ValueError("jpeg: missing SOI marker")
    pos = 2
    n = len(data)
    sofs = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
    while pos < n:
        if data[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at byte {pos}")
        while pos < n and data[pos] == 0xFF:
            pos += 1
        marker = data[pos]
        pos += 1
        if marker == 0xD9 or marker == 0xDA:
            break  # EOI / SOS before any SOF
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        if pos + 2 > n:
            raise ValueError("jpeg: truncated marker segment")
        (seg_len,) = struct.unpack(">H", data[pos : pos + 2])
        if marker in sofs:
            seg = data[pos + 2 : pos + seg_len]
            h, w = struct.unpack(">HH", seg[1:5])
            return {
                "width": int(w),
                "height": int(h),
                "n_components": int(seg[5]),
                "baseline": marker in (0xC0, 0xC1),
                "progressive": marker in (0xC2, 0xC6, 0xCA, 0xCE),
            }
        pos += seg_len
    raise ValueError("jpeg: no SOF marker found")


# ---------------------------------------------------------------------------
# encoder


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """Annex-K tables through libjpeg's quality curve."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (K1_LUM, K2_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


class _BitWriter:
    __slots__ = ("out", "buf", "n")

    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.buf = (self.buf << length) | code
        self.n += length
        while self.n >= 8:
            b = (self.buf >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.buf &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.put(((1 << pad) - 1), pad)  # pad with 1s per spec


def _fixed_table(symbols: set[int]) -> tuple[list[int], list[int]]:
    """bits/huffval for a valid canonical table coding every used symbol
    at one fixed length, the all-ones code unused (T.81 C.2)."""
    syms = sorted(symbols) if symbols else [0]
    length = max(1, (len(syms) + 1 - 1).bit_length())
    while (1 << length) - 1 < len(syms):
        length += 1
    bits = [0] * 16
    bits[length - 1] = len(syms)
    return bits, syms


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _dht_seg(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    return _seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))


def _headers(
    h: int, w: int, samp, qsel, qtabs, n_tables: int, sof_marker: int
) -> bytearray:
    """SOI + JFIF APP0 + DQT(s) + SOF — shared by the sequential and
    progressive encoders."""
    out = bytearray(JPEG_SOI)
    out += _seg(
        0xE0, b"JFIF\x00" + struct.pack(">BBBHHBB", 1, 1, 0, 1, 1, 0, 0)
    )
    for tq, tbl in enumerate(qtabs[:n_tables]):
        zz = tbl.reshape(-1)[ZIGZAG]
        if zz.max() > 255:  # Pq=1: 16-bit big-endian table entries
            out += _seg(
                0xDB, bytes([(1 << 4) | tq]) + zz.astype(">u2").tobytes()
            )
        else:
            out += _seg(0xDB, bytes([tq]) + zz.astype(np.uint8).tobytes())
    sof = struct.pack(">BHHB", 8, h, w, len(samp))
    for ci, (hs, vs) in enumerate(samp):
        sof += bytes([ci + 1, (hs << 4) | vs, qsel[ci]])
    out += _seg(sof_marker, sof)
    return out


def _downsample(plane: np.ndarray, fx: int, fy: int) -> np.ndarray:
    """Box-mean downsample by integer factors (pad by edge replication)."""
    h, w = plane.shape
    ph, pw = -(-h // fy) * fy, -(-w // fx) * fx
    p = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    return (
        p.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
    )


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    quant_tables: tuple[np.ndarray, np.ndarray] | None = None,
    subsampling: tuple[int, int] = (1, 1),
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """Encode a uint8 image (2-D grayscale or H×W×3 RGB) as baseline
    sequential JPEG — or, with ``progressive=True``, as a progressive
    (SOF2) stream exercising both spectral selection and successive
    approximation: DC first at Al=1 + DC refinement, then per component
    one AC band scan at Al=1 + one AC refinement — the same quantized
    coefficients reorganized, so decode output is BIT-IDENTICAL to the
    sequential encoding's.  ``quant_tables`` overrides the
    quality-scaled Annex-K defaults with explicit (luma, chroma) 8×8
    tables — all-ones tables give near-lossless output (fixtures use
    this).  ``subsampling`` is the luma sampling factor pair:
    (1,1)=4:4:4, (2,1)=4:2:2, (2,2)=4:2:0."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError(f"jpeg: encoder takes uint8, got {img.dtype}")
    color = img.ndim == 3
    if color and img.shape[2] != 3:
        raise ValueError("jpeg: color input must be H×W×3 RGB")
    fx, fy = subsampling
    if fx < 1 or fy < 1 or fx > 4 or fy > 4:
        raise ValueError("jpeg: sampling factors must be in 1..4")
    if quant_tables is None:
        qlum, qchr = _quality_tables(quality)
    else:
        qlum = np.asarray(quant_tables[0], dtype=np.int64).reshape(8, 8)
        qchr = np.asarray(quant_tables[1], dtype=np.int64).reshape(8, 8)
    h, w = img.shape[:2]

    if color:
        f = img.astype(np.float64)
        yp = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
        cb = 128.0 - 0.168736 * f[..., 0] - 0.331264 * f[..., 1] + 0.5 * f[..., 2]
        cr = 128.0 + 0.5 * f[..., 0] - 0.418688 * f[..., 1] - 0.081312 * f[..., 2]
        planes = [yp, _downsample(cb, fx, fy), _downsample(cr, fx, fy)]
        samp = [(fx, fy), (1, 1), (1, 1)]
        qsel = [0, 1, 1]
    else:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
        qsel = [0]
        fx = fy = 1

    # block-quantized coefficients per component, MCU-padded grid
    mcux, mcuy = -(-w // (8 * fx)), -(-h // (8 * fy))
    qtabs = [qlum, qchr]
    comp_blocks = []
    for plane, (hs, vs), qi in zip(planes, samp, qsel):
        bw, bh = mcux * hs, mcuy * vs
        ph, pw = plane.shape
        p = np.pad(
            plane, ((0, bh * 8 - ph), (0, bw * 8 - pw)), mode="edge"
        )
        blocks = p.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3) - 128.0
        coef = np.einsum("ij,xyjk,lk->xyil", _M8, blocks, _M8, optimize=True)
        q = np.round(coef / qtabs[qi][None, None]).astype(np.int64)
        flat = q.reshape(bh, bw, 64)
        # AC magnitudes are capped at 10 bits in baseline (T.81 F.1.2.2);
        # DC values legitimately reach ±1024 — their DIFFs stay within
        # category 11, which baseline DC tables allow
        if np.abs(flat[..., 1:]).max() > 1023:
            raise ValueError(
                "jpeg: quantized AC coefficient exceeds baseline's 10-bit "
                "range; use a larger quantization table"
            )
        comp_blocks.append(flat)

    def mcu_units():
        for my in range(mcuy):
            for mx in range(mcux):
                unit = []
                for ci, (hs, vs) in enumerate(samp):
                    for dy in range(vs):
                        for dx in range(hs):
                            unit.append((ci, my * vs + dy, mx * hs + dx))
                yield unit

    n_tables = 2 if color else 1
    tsel = [0, 1, 1] if color else [0]

    if progressive:
        if restart_interval:
            raise ValueError(
                "jpeg: restart intervals are not supported with "
                "progressive encode"
            )
        true_grids = [
            (-(-p.shape[0] // 8), -(-p.shape[1] // 8)) for p in planes
        ]
        return _encode_progressive(
            h, w, samp, qsel, qtabs, n_tables, tsel,
            comp_blocks, mcu_units, true_grids,
        )

    # symbol streams (two-pass: collect, build tables, emit)
    dc_syms: list[set[int]] = [set() for _ in range(n_tables)]
    ac_syms: list[set[int]] = [set() for _ in range(n_tables)]
    events: list[list[tuple]] = []  # per MCU: (kind, tbl, sym, extra, nbits)
    preds = [0] * len(planes)
    mcu_count = 0
    for unit in mcu_units():
        if restart_interval and mcu_count and mcu_count % restart_interval == 0:
            preds = [0] * len(planes)
        ev: list[tuple] = []
        for ci, by, bx in unit:
            t = tsel[ci]
            blk = comp_blocks[ci][by, bx]
            diff = int(blk[0]) - preds[ci]
            preds[ci] = int(blk[0])
            s = _category(diff)
            dc_syms[t].add(s)
            extra = diff if diff >= 0 else diff + (1 << s) - 1
            ev.append(("dc", t, s, extra, s))
            zz = blk[ZIGZAG]
            nz = np.flatnonzero(zz[1:]) + 1
            k_prev = 0
            for k in nz:
                run = int(k) - k_prev - 1
                while run >= 16:
                    ac_syms[t].add(0xF0)
                    ev.append(("ac", t, 0xF0, 0, 0))
                    run -= 16
                v = int(zz[k])
                s = _category(v)
                rs = (run << 4) | s
                ac_syms[t].add(rs)
                extra = v if v >= 0 else v + (1 << s) - 1
                ev.append(("ac", t, rs, extra, s))
                k_prev = int(k)
            if k_prev != 63:
                ac_syms[t].add(0x00)
                ev.append(("ac", t, 0x00, 0, 0))
        events.append(ev)
        mcu_count += 1

    dc_tables = [_fixed_table(s) for s in dc_syms]
    ac_tables = [_fixed_table(s) for s in ac_syms]
    dc_huff = [_HuffTable(b, v) for b, v in dc_tables]
    ac_huff = [_HuffTable(b, v) for b, v in ac_tables]

    wr = _BitWriter()
    rst = 0
    for i, ev in enumerate(events):
        if restart_interval and i and i % restart_interval == 0:
            wr.flush()
            wr.out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
        for kind, t, sym, extra, nbits in ev:
            code, length = (dc_huff if kind == "dc" else ac_huff)[t].codes[sym]
            wr.put(code, length)
            if nbits:
                wr.put(extra, nbits)
    wr.flush()

    # --- container
    out = _headers(h, w, samp, qsel, qtabs, n_tables, 0xC0)
    for t in range(n_tables):
        for tc, (bits, vals) in ((0, dc_tables[t]), (1, ac_tables[t])):
            out += _dht_seg(tc, t, bits, vals)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    ncomp = len(planes)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, (tsel[ci] << 4) | tsel[ci]])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += wr.out
    out += b"\xff\xd9"
    return bytes(out)


def _encode_progressive(
    h, w, samp, qsel, qtabs, n_tables, tsel, comp_blocks, mcu_units,
    true_grids,
) -> bytes:
    """Progressive (SOF2) emission of already-quantized coefficients:

    1. DC of all components, interleaved, successive approximation
       Al=1 (T.81 G.1.2.1 point transform = arithmetic shift).
    2. DC refinement (Ah=1, Al=0): one raw bit per block, no entropy
       tables.
    3. Per component: the full AC band [1,63] at Al=1 with EOB runs.
    4. Per component: AC refinement (Ah=1, Al=0) — correction bits for
       known coefficients, run-length-coded ±1 newcomers.

    AC scans iterate the component's TRUE block grid (non-interleaved
    scans are never MCU-padded, T.81 A.2.2); the interleaved DC scan
    covers the padded grid.  Per-scan Huffman tables are rebuilt and
    re-emitted before each SOS (legal: DHT redefines the slot)."""
    out = _headers(h, w, samp, qsel, qtabs, n_tables, 0xC2)
    ncomp = len(comp_blocks)

    def sos_seg(comps_tbl: list[tuple[int, int, int]], ss, se, ah, al):
        sos = bytes([len(comps_tbl)])
        for cid, td, ta in comps_tbl:
            sos += bytes([cid, (td << 4) | ta])
        sos += bytes([ss, se, (ah << 4) | al])
        return _seg(0xDA, sos)

    # --- scan 1: interleaved DC first, Al=1
    events: list[tuple[int, int, int, int]] = []  # (tbl, sym, extra, bits)
    dc_syms: list[set[int]] = [set() for _ in range(n_tables)]
    preds = [0] * ncomp
    for unit in mcu_units():
        for ci, by, bx in unit:
            v = int(comp_blocks[ci][by, bx][0]) >> 1
            diff = v - preds[ci]
            preds[ci] = v
            s = _category(diff)
            dc_syms[tsel[ci]].add(s)
            extra = diff if diff >= 0 else diff + (1 << s) - 1
            events.append((tsel[ci], s, extra, s))
    tables = [_fixed_table(sy) for sy in dc_syms]
    hufs = [_HuffTable(b, v) for b, v in tables]
    for t, (bits, vals) in enumerate(tables):
        out += _dht_seg(0, t, bits, vals)
    out += sos_seg(
        [(ci + 1, tsel[ci], 0) for ci in range(ncomp)], 0, 0, 0, 1
    )
    wr = _BitWriter()
    for t, sym, extra, nbits in events:
        code, length = hufs[t].codes[sym]
        wr.put(code, length)
        if nbits:
            wr.put(extra, nbits)
    wr.flush()
    out += wr.out

    # --- scan 2: DC refinement, raw bits (no entropy tables)
    out += sos_seg(
        [(ci + 1, 0, 0) for ci in range(ncomp)], 0, 0, 1, 0
    )
    wr = _BitWriter()
    for unit in mcu_units():
        for ci, by, bx in unit:
            wr.put(int(comp_blocks[ci][by, bx][0]) & 1, 1)
    wr.flush()
    out += wr.out

    # --- per component: AC first (Al=1) then AC refinement (Ah=1)
    for ci in range(ncomp):
        ny, nx = true_grids[ci]
        blocks = [
            comp_blocks[ci][by, bx][ZIGZAG]
            for by in range(ny)
            for bx in range(nx)
        ]

        # first scan: point-transformed values, runs + per-block EOB
        ev: list[tuple] = []  # ('s', sym) | ('b', val, nbits)
        syms: set[int] = set()
        for zz in blocks:
            t1 = np.sign(zz) * (np.abs(zz) >> 1)
            run = 0
            for k in range(1, 64):
                v = int(t1[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    syms.add(0xF0)
                    ev.append(("s", 0xF0))
                    run -= 16
                s = _category(v)
                rs = (run << 4) | s
                syms.add(rs)
                ev.append(("s", rs))
                ev.append(("b", v if v >= 0 else v + (1 << s) - 1, s))
                run = 0
            if run:
                syms.add(0x00)
                ev.append(("s", 0x00))
        bits, vals = _fixed_table(syms)
        huf = _HuffTable(bits, vals)
        out += _dht_seg(1, tsel[ci], bits, vals)
        out += sos_seg([(ci + 1, 0, tsel[ci])], 1, 63, 0, 1)
        wr = _BitWriter()
        for e in ev:
            if e[0] == "s":
                code, length = huf.codes[e[1]]
                wr.put(code, length)
            else:
                wr.put(e[1], e[2])
        wr.flush()
        out += wr.out

        # refinement scan: correction bits + ±1 newcomers.  Pending
        # ZRLs drain at EVERY nonzero position (history or newcomer) —
        # but only while a later newcomer exists (k <= eob_k): the
        # decoder's ZRL advance needs 16 zero-history skips ahead, and
        # the interleaved correction bits must land on the decoder's
        # side of each emitted symbol (T.81 G.1.2.3 / the libjpeg
        # buffered-bits discipline, reimplemented)
        ev = []
        syms = set()
        for zz in blocks:
            eob_k = 0
            for k in range(1, 64):
                if abs(int(zz[k])) == 1:
                    eob_k = k
            run = 0
            br: list[int] = []
            for k in range(1, 64):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15 and k <= eob_k:
                    syms.add(0xF0)
                    ev.append(("s", 0xF0))
                    ev.extend(("b", b, 1) for b in br)
                    br = []
                    run -= 16
                if abs(v) >> 1:  # nonzero history: one correction bit
                    br.append(abs(v) & 1)
                    continue
                # |v| == 1: newly nonzero at this precision
                rs = (run << 4) | 1
                syms.add(rs)
                ev.append(("s", rs))
                ev.append(("b", 1 if v > 0 else 0, 1))
                ev.extend(("b", b, 1) for b in br)
                br = []
                run = 0
            if run or br:
                syms.add(0x00)
                ev.append(("s", 0x00))
                ev.extend(("b", b, 1) for b in br)
        bits, vals = _fixed_table(syms)
        huf = _HuffTable(bits, vals)
        out += _dht_seg(1, tsel[ci], bits, vals)
        out += sos_seg([(ci + 1, 0, tsel[ci])], 1, 63, 1, 0)
        wr = _BitWriter()
        for e in ev:
            if e[0] == "s":
                code, length = huf.codes[e[1]]
                wr.put(code, length)
            else:
                wr.put(e[1], e[2])
        wr.flush()
        out += wr.out

    out += b"\xff\xd9"
    return bytes(out)
