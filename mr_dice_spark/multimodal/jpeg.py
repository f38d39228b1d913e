"""Pure-stdlib JPEG codec (numpy + struct only — no Pillow, no
libjpeg): the entropy-coded pixel decode that closes the last
multimodal boundary (codecs.decode_pixels previously stubbed JPEG).

Decoder (`decode_jpeg_pixels`): baseline sequential DCT (SOF0/1) AND
progressive DCT (SOF2, ITU-T T.81 Annex G: spectral selection,
successive approximation for DC and AC, EOB-run coding, restart
resync), 8-bit, 1-component grayscale or 3-component YCbCr at 4:4:4 /
4:2:2 / 4:2:0, arbitrary DQT/DHT tables from the stream, DRI/RSTn
restart markers, FF00 byte unstuffing. Anything outside that envelope
(arithmetic coding, lossless/hierarchical SOF3+, 12-bit, CMYK) returns
None — the caller falls back to the stub path, the same
honest-downgrade contract as the BMP / PNG decoders in
codecs.decode_pixels. The baseline pipeline: marker walk → canonical
Huffman tables → MCU entropy decode (DC prediction, AC run-length,
EXTEND sign recovery) → dezigzag → dequantize → 2-D IDCT (separable
orthonormal DCT-III as an 8x8 matrix sandwich) → +128 level shift →
chroma upsample (sample replication) → BT.601 YCbCr→RGB. Progressive
streams accumulate quantized coefficients across scans
(_ProgressiveState) and run the same dequantize/IDCT tail once at EOI,
so a fully-transmitted progressive stream decodes to EXACTLY the same
pixels as the baseline encoding of the same coefficients.

Encoders (`encode_jpeg_baseline`, `encode_jpeg_progressive`): the
fixture generators (same role as codecs.encode_mp4_stub /
encode_avi_stub) — JFIF with the spec's Annex K Huffman tables
(progressive AC scans use a flat 9-bit table because Annex K's
baseline AC tables lack the EOBn symbols), caller-supplied or flat
quantization, 4:4:4 or 4:2:0. Encoder and decoder share only the
constant tables; entropy coding is written twice (bit writer vs bit
reader), so a coefficient-level round-trip test is a genuine
cross-check — and baseline-vs-progressive pixel equality on the same
input is a second, independent one (identical quantized coefficients
must survive two entirely different entropy codings).

DETERMINISM: both directions are fixed float64 arithmetic with a fixed
rounding rule — byte-identical across runs and hosts, which is what
lets goldens hash over decoded pixels. EXACTNESS WINDOW: an 8x8 block
that is a single constant value has only a DC coefficient; with a
flat-1 quant table the decode reproduces the constant EXACTLY
(round(c·cos-sum) of a DC-only block is the constant back), so
block-constant fixtures round-trip bit-perfectly — the lever the
SQL-oracled golden uses. General content round-trips within the usual
quantization error (property-tested bounds, not hashed).

Scale shape: decoding runs inside Arrow-batched pandas UDFs
(multimodal/ops.py) — a narrow per-row map with no shuffle, exactly
like the BMP/PNG path; a 100 TB image corpus decodes in the scan
stage.

Reference behavior parity: the reference repo has no image codecs —
this module serves the beyond-reference multimodal surface (SURVEY.md
§2.9 extension).
"""

from __future__ import annotations

import struct
from typing import Optional

# zigzag order: index i of the scan -> (row, col) in the 8x8 block
_ZIGZAG = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]

# ITU-T T.81 Annex K.3 typical Huffman tables: (bits[1..16], values)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _dct_matrix():
    """8x8 orthonormal DCT-II matrix M: forward DCT = M @ block @ M.T,
    inverse = M.T @ coeff @ M (M is orthogonal)."""
    import numpy as np

    M = np.zeros((8, 8))
    for u in range(8):
        c = (1 / 8) ** 0.5 if u == 0 else (2 / 8) ** 0.5
        for x in range(8):
            M[u, x] = c * float(np.cos((2 * x + 1) * u * np.pi / 16))
    return M


def _canonical_codes(bits, values):
    """JPEG canonical Huffman assignment: {(length, code): value}."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return out


class _BitReader:
    """MSB-first reader over an already-unstuffed entropy segment."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise EOFError("entropy segment exhausted")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _read_huffman(reader: _BitReader, table: dict) -> int:
    length, code = 0, 0
    while length < 16:
        code = (code << 1) | reader.read_bit()
        length += 1
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """JPEG EXTEND (F.2.2.1): recover signed value from t magnitude bits."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _split_scan(payload: bytes, start: int):
    """Entropy-coded intervals from ``start``: FF00 unstuffed, split at
    RSTn; stops at the next real marker. Returns (intervals, end_pos)."""
    intervals, cur = [], bytearray()
    i = start
    n = len(payload)
    while i < n:
        b = payload[i]
        if b == 0xFF:
            if i + 1 >= n:
                break
            m = payload[i + 1]
            if m == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= m <= 0xD7:  # restart marker
                intervals.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # real marker: scan over
        cur.append(b)
        i += 1
    intervals.append(bytes(cur))
    return intervals, i


def decode_jpeg_pixels(payload: Optional[bytes]):
    """Decode a baseline sequential JPEG to an (H, W, C) uint8 ndarray
    (C=1 grayscale, C=3 RGB). None for anything outside the supported
    envelope (see module docstring) — caller falls back to the stub."""
    import numpy as np

    if payload is None or len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return None
    try:
        return _decode(payload, np)
    except (ValueError, EOFError, IndexError, struct.error, ZeroDivisionError):
        return None


def _decode(payload: bytes, np):
    qt: dict[int, object] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    prog = None
    restart_interval = 0
    i = 2
    n = len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            return None
        marker = payload[i + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
        body = payload[i + 4 : i + 2 + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                prec, tid = body[p] >> 4, body[p] & 0x0F
                p += 1
                if prec == 0:
                    vals = list(body[p : p + 64])
                    p += 64
                else:
                    vals = [
                        struct.unpack(">H", body[p + 2 * k : p + 2 * k + 2])[0]
                        for k in range(64)
                    ]
                    p += 128
                tbl = np.zeros((8, 8))
                for k, (r, c) in enumerate(_ZIGZAG):
                    tbl[r, c] = vals[k]
                if (tbl <= 0).any():
                    return None
                qt[tid] = tbl
        elif marker == 0xC4:  # DHT
            p = 0
            while p + 17 <= len(body):
                cls, tid = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1 : p + 17])
                cnt = sum(bits)
                values = list(body[p + 17 : p + 17 + cnt])
                p += 17 + cnt
                (huff_dc if cls == 0 else huff_ac)[tid] = _canonical_codes(
                    bits, values
                )
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, H, W, nc = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            if prec != 8 or nc not in (1, 3) or H == 0 or W == 0:
                return None
            comps = []
            for k in range(nc):
                cid, hv, tq = body[6 + 3 * k : 9 + 3 * k]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {"H": H, "W": W, "comps": comps,
                     "progressive": marker == 0xC2}
        elif 0xC3 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            return None  # arithmetic / lossless / hierarchical: out of scope
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[0:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                return None
            ns = body[0]
            scomps = []
            for k in range(ns):
                cs, tt = body[1 + 2 * k : 3 + 2 * k]
                scomps.append({"cs": cs, "td": tt >> 4, "ta": tt & 0x0F})
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            scan_start = i + 2 + seg_len
            if not frame["progressive"]:
                return _decode_scan(
                    payload, scan_start, frame, scomps, qt, huff_dc, huff_ac,
                    restart_interval, np,
                )
            if prog is None:
                prog = _ProgressiveState(frame, np)
            i = prog.decode_scan(
                payload, scan_start, scomps,
                ss, se, ahal >> 4, ahal & 0x0F,
                huff_dc, huff_ac, restart_interval,
            )
            continue
        i += 2 + seg_len
    if frame is not None and frame["progressive"] and prog is not None:
        return prog.reconstruct(qt)
    return None


def _decode_scan(
    payload, start, frame, scomps, qt, huff_dc, huff_ac, restart_interval, np
):
    H, W, comps = frame["H"], frame["W"], frame["comps"]
    by_id = {c["id"]: c for c in comps}
    if len(scomps) != len(comps):
        return None  # multi-scan baseline: out of scope
    for sc in scomps:
        if sc["cs"] not in by_id:
            return None
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax not in (1, 2) or vmax not in (1, 2):
        return None
    if len(comps) == 1:
        hmax = vmax = comps[0]["h"] = comps[0]["v"] = 1
    mcus_x = -(-W // (8 * hmax))
    mcus_y = -(-H // (8 * vmax))
    M = _dct_matrix()
    planes = {}
    for c in comps:
        planes[c["id"]] = np.zeros(
            (mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64
        )
        if c["tq"] not in qt:
            return None
    intervals, _end = _split_scan(payload, start)
    total_mcus = mcus_x * mcus_y
    per_interval = restart_interval if restart_interval else total_mcus
    mcu = 0
    for seg in intervals:
        if mcu >= total_mcus:
            break
        reader = _BitReader(seg)
        pred = {c["id"]: 0 for c in comps}
        for _ in range(min(per_interval, total_mcus - mcu)):
            my, mx = divmod(mcu, mcus_x)
            for sc in scomps:
                c = by_id[sc["cs"]]
                dc_tab = huff_dc.get(sc["td"])
                ac_tab = huff_ac.get(sc["ta"])
                if dc_tab is None or ac_tab is None:
                    return None
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coeff = _decode_block(reader, dc_tab, ac_tab, pred, c["id"], np)
                        block = M.T @ (coeff * q) @ M + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu += 1
    if mcu < total_mcus:
        return None
    # assemble: upsample each component to full MCU-padded geometry by
    # sample replication, then crop to (H, W)
    full = []
    for c in comps:
        p = planes[c["id"]]
        p = np.repeat(p, hmax // c["h"], axis=1)
        p = np.repeat(p, vmax // c["v"], axis=0)
        full.append(p[:H, :W])
    if len(full) == 1:
        gray = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return gray[:, :, None]
    Y, Cb, Cr = full
    r = Y + 1.402 * (Cr - 128.0)
    g = Y - 0.344136 * (Cb - 128.0) - 0.714136 * (Cr - 128.0)
    b = Y + 1.772 * (Cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _decode_block(reader, dc_tab, ac_tab, pred, cid, np):
    coeff = np.zeros((8, 8))
    t = _read_huffman(reader, dc_tab)
    diff = _extend(reader.read_bits(t), t) if t else 0
    pred[cid] += diff
    coeff[0, 0] = pred[cid]
    k = 1
    while k < 64:
        rs = _read_huffman(reader, ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past block end")
        coeff[_ZIGZAG[k]] = _extend(reader.read_bits(s), s)
        k += 1
    return coeff


def _finish_image(comps, planes, H, W, hmax, vmax, np):
    """Shared tail: upsample each component plane by replication, crop to
    (H, W), convert to gray/RGB uint8."""
    full = []
    for c in comps:
        p = planes[c["id"]]
        p = np.repeat(p, hmax // c["h"], axis=1)
        p = np.repeat(p, vmax // c["v"], axis=0)
        full.append(p[:H, :W])
    if len(full) == 1:
        gray = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return gray[:, :, None]
    Y, Cb, Cr = full
    r = Y + 1.402 * (Cr - 128.0)
    g = Y - 0.344136 * (Cb - 128.0) - 0.714136 * (Cr - 128.0)
    b = Y + 1.772 * (Cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


class _ProgressiveState:
    """Coefficient accumulator for SOF2 progressive decoding (ITU-T T.81
    Annex G): every scan deposits or refines quantized coefficients
    (stored in zigzag order, full two's-complement values after each
    successive-approximation pass); reconstruction dequantizes + IDCTs
    once at EOI. Spectral selection (Ss..Se bands), successive
    approximation (Ah/Al bit planes, DC and AC), interleaved and
    non-interleaved DC scans, per-scan EOBRUN state, and restart-marker
    resync are all handled; a truncated scan sequence reconstructs the
    partial-precision image, as real progressive renderers do."""

    def __init__(self, frame, np):
        self.np = np
        self.frame = frame
        comps = frame["comps"]
        if len(comps) == 1:
            comps[0]["h"] = comps[0]["v"] = 1
        self.hmax = max(c["h"] for c in comps)
        self.vmax = max(c["v"] for c in comps)
        if self.hmax not in (1, 2) or self.vmax not in (1, 2):
            raise ValueError("unsupported sampling")
        H, W = frame["H"], frame["W"]
        self.mcus_x = -(-W // (8 * self.hmax))
        self.mcus_y = -(-H // (8 * self.vmax))
        self.coefs = {}
        for c in comps:
            bw = self.mcus_x * c["h"]
            bh = self.mcus_y * c["v"]
            self.coefs[c["id"]] = np.zeros((bh, bw, 64), dtype=np.int64)
            # non-interleaved scans cover only the component's true extent
            c["bw_ni"] = -(-(W * c["h"]) // (self.hmax * 8))
            c["bh_ni"] = -(-(H * c["v"]) // (self.vmax * 8))

    def decode_scan(
        self, payload, start, scomps, ss, se, ah, al,
        huff_dc, huff_ac, restart_interval,
    ):
        by_id = {c["id"]: c for c in self.frame["comps"]}
        for sc in scomps:
            if sc["cs"] not in by_id:
                raise ValueError("scan references unknown component")
        intervals, end = _split_scan(payload, start)
        if ss == 0:
            if se != 0:
                raise ValueError("DC scan must have Se=0")
            self._dc_scan(intervals, scomps, by_id, ah, al, huff_dc,
                          restart_interval)
        else:
            if len(scomps) != 1:
                raise ValueError("AC scans are non-interleaved")
            self._ac_scan(intervals, scomps[0], by_id, ss, se, ah, al,
                          huff_ac, restart_interval)
        return end

    # -- DC scans ----------------------------------------------------------
    def _dc_units(self, scomps, by_id):
        """Yield (comp, by, bx) block coordinates in scan order, grouped
        into MCUs (one yield-list per MCU/unit for restart accounting)."""
        if len(scomps) == 1:
            c = by_id[scomps[0]["cs"]]
            for y in range(c["bh_ni"]):
                for x in range(c["bw_ni"]):
                    yield [(c, y, x)]
        else:
            for my in range(self.mcus_y):
                for mx in range(self.mcus_x):
                    unit = []
                    for sc in scomps:
                        c = by_id[sc["cs"]]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                unit.append(
                                    (c, my * c["v"] + by, mx * c["h"] + bx)
                                )
                    yield unit

    def _dc_scan(self, intervals, scomps, by_id, ah, al, huff_dc, ri):
        tables = {sc["cs"]: huff_dc.get(sc["td"]) for sc in scomps}
        units = list(self._dc_units(scomps, by_id))
        per = ri if ri else len(units)
        done = 0
        for seg in intervals:
            if done >= len(units):
                break
            reader = _BitReader(seg)
            pred = {sc["cs"]: 0 for sc in scomps}
            for unit in units[done : done + per]:
                for c, y, x in unit:
                    blk = self.coefs[c["id"]][y, x]
                    if ah == 0:
                        tab = tables[c["id"]]
                        if tab is None:
                            raise ValueError("missing DC table")
                        t = _read_huffman(reader, tab)
                        diff = _extend(reader.read_bits(t), t) if t else 0
                        pred[c["id"]] += diff
                        blk[0] = pred[c["id"]] << al
                    else:
                        if reader.read_bit():
                            blk[0] |= 1 << al
            done += per

    # -- AC scans ----------------------------------------------------------
    def _ac_blocks(self, c):
        for y in range(c["bh_ni"]):
            for x in range(c["bw_ni"]):
                yield self.coefs[c["id"]][y, x]

    def _ac_scan(self, intervals, sc, by_id, ss, se, ah, al, huff_ac, ri):
        c = by_id[sc["cs"]]
        tab = huff_ac.get(sc["ta"])
        if tab is None:
            raise ValueError("missing AC table")
        blocks = list(self._ac_blocks(c))
        per = ri if ri else len(blocks)
        done = 0
        for seg in intervals:
            if done >= len(blocks):
                break
            reader = _BitReader(seg)
            eobrun = 0
            for blk in blocks[done : done + per]:
                if ah == 0:
                    eobrun = self._ac_first(reader, tab, blk, ss, se, al,
                                            eobrun)
                else:
                    eobrun = self._ac_refine(reader, tab, blk, ss, se, al,
                                             eobrun)
            done += per

    @staticmethod
    def _ac_first(reader, tab, blk, ss, se, al, eobrun):
        if eobrun > 0:
            return eobrun - 1
        k = ss
        while k <= se:
            rs = _read_huffman(reader, tab)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r != 15:
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += reader.read_bits(r)
                    return eobrun
                k += 16  # ZRL
                continue
            k += r
            if k > se:
                raise ValueError("AC run past band end")
            blk[k] = _extend(reader.read_bits(s), s) << al
            k += 1
        return 0

    @staticmethod
    def _ac_refine(reader, tab, blk, ss, se, al, eobrun):
        p1 = 1 << al
        m1 = -1 << al
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = _read_huffman(reader, tab)
                r, s = rs >> 4, rs & 0x0F
                val = 0
                if s:
                    if s != 1:
                        raise ValueError("AC refine size must be 1")
                    val = p1 if reader.read_bit() else m1
                else:
                    if r != 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += reader.read_bits(r)
                        break  # remaining coefficients via EOB logic below
                    # r == 15: ZRL — skip 16 zero-history positions
                while k <= se:
                    if blk[k] != 0:
                        if reader.read_bit() and (blk[k] & p1) == 0:
                            blk[k] += p1 if blk[k] >= 0 else m1
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val:
                    blk[k] = val
                k += 1
        if eobrun > 0:
            while k <= se:
                if blk[k] != 0:
                    if reader.read_bit() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
                k += 1
            eobrun -= 1
        return eobrun

    # -- reconstruction ----------------------------------------------------
    def reconstruct(self, qt):
        np = self.np
        frame = self.frame
        comps = frame["comps"]
        M = _dct_matrix()
        zz_rows = np.array([rc[0] for rc in _ZIGZAG])
        zz_cols = np.array([rc[1] for rc in _ZIGZAG])
        planes = {}
        for c in comps:
            if c["tq"] not in qt:
                return None
            q = qt[c["tq"]]
            arr = self.coefs[c["id"]]
            bh, bw = arr.shape[:2]
            plane = np.zeros((bh * 8, bw * 8), dtype=np.float64)
            for y in range(bh):
                for x in range(bw):
                    coeff = np.zeros((8, 8))
                    coeff[zz_rows, zz_cols] = arr[y, x]
                    plane[y * 8 : y * 8 + 8, x * 8 : x * 8 + 8] = (
                        M.T @ (coeff * q) @ M + 128.0
                    )
            planes[c["id"]] = plane
        return _finish_image(
            comps, planes, frame["H"], frame["W"], self.hmax, self.vmax, np
        )


# ---------------------------------------------------------------------------
# encoder (fixture generator)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> bytes:
        if self.nbits:
            self.acc = (self.acc << (8 - self.nbits)) | ((1 << (8 - self.nbits)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _encode_codes(bits, values):
    """{value: (code, length)} under canonical assignment."""
    table = _canonical_codes(bits, values)
    return {v: (code, length) for (length, code), v in table.items()}


def _magnitude(v: int) -> tuple[int, int]:
    """(category t, t-bit code) for EXTEND-compatible encoding."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    code = v if v > 0 else v + (1 << t) - 1
    return t, code


def _encode_block(bw, coeff, pred, cid, dc_codes, ac_codes):
    dc = int(coeff[0, 0])
    diff = dc - pred[cid]
    pred[cid] = dc
    t, code = _magnitude(diff)
    c, ln = dc_codes[t]
    bw.write(c, ln)
    if t:
        bw.write(code, t)
    run = 0
    last_nz = 0
    zz = [int(coeff[_ZIGZAG[k]]) for k in range(64)]
    for k in range(63, 0, -1):
        if zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]
            bw.write(c, ln)
            run -= 16
        t, code = _magnitude(v)
        c, ln = ac_codes[(run << 4) | t]
        bw.write(c, ln)
        bw.write(code, t)
        run = 0
    if last_nz < 63:
        c, ln = ac_codes[0x00]
        bw.write(c, ln)


def encode_jpeg_baseline(
    img, quant=None, subsampling: str = "444", restart_interval: int = 0
) -> bytes:
    """Encode an (H, W) / (H, W, 1) grayscale or (H, W, 3) RGB uint8
    array as a baseline JFIF JPEG with the Annex K Huffman tables.
    ``quant``: an (8, 8) quantization table applied to every component
    (default: all ones — maximum fidelity, and EXACT round-trip for
    block-constant content). ``subsampling``: '444' or '420' (RGB only;
    chroma is 2x2 box-averaged). Edge-replication pads to the MCU grid.
    ``restart_interval``: emit DRI + RSTn markers every that many MCUs
    (0 = none) — the resync structure real encoders add for error
    resilience, and the decoder path worth its own test.
    """
    import numpy as np

    comps, H, W, mcus_x, mcus_y, q = _prepare_planes(img, quant, subsampling, np)
    M = _dct_matrix()
    zz_q = [q[_ZIGZAG[k]] for k in range(64)]
    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(
        ">HH", 1, 1
    ) + b"\x00\x00"
    # DQT (table 0, 8-bit unless any entry > 255)
    wide = any(v > 255 for v in zz_q)
    if wide:
        out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 128)
        out += bytes([0x10])
        for v in zz_q:
            out += struct.pack(">H", int(v))
    else:
        out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64)
        out += bytes([0x00]) + bytes(int(v) for v in zz_q)
    # SOF0
    nc = len(comps)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, H, W, nc)
    for c in comps:
        out += bytes([c["id"], (c["h"] << 4) | c["v"], 0])
    # DHT: luma DC/AC as tables 0, chroma DC/AC as tables 1 (when color)
    tables = [(0x00, _DC_LUMA), (0x10, _AC_LUMA)]
    if nc == 3:
        tables += [(0x01, _DC_CHROMA), (0x11, _AC_CHROMA)]
    for tc, (bits, values) in tables:
        out += b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + len(values))
        out += bytes([tc]) + bytes(bits) + bytes(values)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for idx, c in enumerate(comps):
        tsel = 0x00 if idx == 0 else 0x11
        out += bytes([c["id"], tsel])
    out += bytes([0, 63, 0])

    dc_l = _encode_codes(*_DC_LUMA)
    ac_l = _encode_codes(*_AC_LUMA)
    dc_c = _encode_codes(*_DC_CHROMA)
    ac_c = _encode_codes(*_AC_CHROMA)
    bw = _BitWriter()
    pred = {c["id"]: 0 for c in comps}
    total_mcus = mcus_x * mcus_y
    done = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for idx, c in enumerate(comps):
                dc_codes = dc_l if idx == 0 else dc_c
                ac_codes = ac_l if idx == 0 else ac_c
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        block = c["plane"][y0 : y0 + 8, x0 : x0 + 8] - 128.0
                        coeff = M @ block @ M.T
                        qc = _np_round_half_away(coeff / q)
                        _encode_block(bw, qc, pred, c["id"], dc_codes, ac_codes)
            done += 1
            if (
                restart_interval
                and done % restart_interval == 0
                and done < total_mcus
            ):
                out += bw.flush()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                bw = _BitWriter()
                pred = {c["id"]: 0 for c in comps}
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder (fixture generator for the SOF2 decode path)
# ---------------------------------------------------------------------------

# Progressive AC scans emit EOBn symbols (n << 4 for n = 1..14), which the
# baseline Annex K AC tables do not contain — use a near-flat canonical
# table over all 256 symbols: 255 at 9 bits plus one at 10 (DHT's BITS
# counts are single bytes, so 256-at-one-length is unrepresentable; the
# all-ones-code reservation also holds: last code is 0b111111110 << 1).
# Wasteful, but this is a fixture generator, not a production encoder.
_AC_PROG = ([0] * 8 + [255, 1] + [0] * 6, list(range(256)))


def _zz_coefficients(comps, q, M, np):
    """Quantized zigzag coefficients per component on the MCU grid:
    c['coef'] is an int (bh, bw, 64) array, same quantizer rule as the
    baseline encoder (_np_round_half_away)."""
    for c in comps:
        plane = c["plane"]
        ph, pw = plane.shape
        bh, bw = ph // 8, pw // 8
        coef = np.zeros((bh, bw, 64), dtype=np.int64)
        for y in range(bh):
            for x in range(bw):
                block = plane[y * 8 : y * 8 + 8, x * 8 : x * 8 + 8] - 128.0
                qc = _np_round_half_away((M @ block @ M.T) / q)
                for k, rc in enumerate(_ZIGZAG):
                    coef[y, x, k] = int(qc[rc])
        c["coef"] = coef


class _ScanWriter:
    """One progressive scan's entropy stream: restart segmentation plus
    the per-segment state the spec resets at RSTn (DC predictors, EOB
    run, buffered AC correction bits). Correction bits are split the way
    libjpeg's jcphuff does (BE vs BR): ``corr_old`` holds bits already
    committed to the pending EOB run (they must be emitted WITH the EOBn
    symbol, because the decoder consumes them while sweeping the
    eob-covered blocks), ``corr_new`` holds the current block's bits
    (emitted after the current ZRL / newly-nonzero symbol, where the
    decoder's run sweep consumes them)."""

    def __init__(self, out: bytearray, ac_codes):
        self.out = out
        self.ac_codes = ac_codes
        self.bw = _BitWriter()
        self.rst = 0
        self.eobrun = 0
        self.corr_old: list[int] = []
        self.corr_new: list[int] = []

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            c, ln = self.ac_codes[nbits << 4]
            self.bw.write(c, ln)
            if nbits:
                self.bw.write(self.eobrun & ((1 << nbits) - 1), nbits)
            self.eobrun = 0
            for b in self.corr_old:
                self.bw.write(b, 1)
            self.corr_old = []

    def flush_corr_new(self) -> None:
        for b in self.corr_new:
            self.bw.write(b, 1)
        self.corr_new = []

    def end_block(self, pending: bool) -> None:
        """Commit the block's tail to the EOB run (T.81 G.1.2.3)."""
        if pending:
            self.eobrun += 1
            self.corr_old += self.corr_new
            self.corr_new = []
            if self.eobrun == 0x7FFF:
                self.flush_eobrun()

    def restart(self) -> None:
        self.flush_eobrun()
        self.out += self.bw.flush()
        self.out += bytes([0xFF, 0xD0 + self.rst])
        self.rst = (self.rst + 1) % 8
        self.bw = _BitWriter()

    def finish(self) -> None:
        self.flush_eobrun()
        self.out += self.bw.flush()


def _prog_dc_units(scan_comps, mcus_x, mcus_y):
    """(comp, by, bx) block coordinates in scan order, one list per
    restart unit — mirrors _ProgressiveState._dc_units exactly."""
    if len(scan_comps) == 1:
        c = scan_comps[0]
        for y in range(c["bh_ni"]):
            for x in range(c["bw_ni"]):
                yield [(c, y, x)]
    else:
        for my in range(mcus_y):
            for mx in range(mcus_x):
                unit = []
                for c in scan_comps:
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            unit.append((c, my * c["v"] + by, mx * c["h"] + bx))
                yield unit


def _prog_dc_scan(sw, scan_comps, mcus_x, mcus_y, ah, al, dc_codes_for, ri):
    preds = {c["id"]: 0 for c in scan_comps}
    done = 0
    for unit in _prog_dc_units(scan_comps, mcus_x, mcus_y):
        if ri and done and done % ri == 0:
            sw.restart()
            preds = {c["id"]: 0 for c in scan_comps}
        for c, y, x in unit:
            dc = int(c["coef"][y, x, 0])
            if ah == 0:
                v = dc >> al  # arithmetic floor shift, as in T.81 G.1.2.1
                diff = v - preds[c["id"]]
                preds[c["id"]] = v
                t, code = _magnitude(diff)
                hc, ln = dc_codes_for(c)[t]
                sw.bw.write(hc, ln)
                if t:
                    sw.bw.write(code, t)
            else:
                sw.bw.write((dc >> al) & 1, 1)
        done += 1
    sw.finish()


def _prog_ac_first_block(sw, zz, ss, se, al):
    r = 0
    wrote = False
    for k in range(ss, se + 1):
        v = int(zz[k])
        mag = abs(v) >> al
        if mag == 0:
            r += 1
            continue
        sw.flush_eobrun()
        while r > 15:
            c, ln = sw.ac_codes[0xF0]
            sw.bw.write(c, ln)
            r -= 16
        t, code = _magnitude(mag if v > 0 else -mag)
        c, ln = sw.ac_codes[(r << 4) | t]
        sw.bw.write(c, ln)
        sw.bw.write(code, t)
        r = 0
        wrote = True
    sw.end_block(r > 0 or not wrote)


def _prog_ac_refine_block(sw, zz, ss, se, al):
    mags = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    eob = ss - 1  # index of the last NEWLY-nonzero coefficient
    for idx, m in enumerate(mags):
        if m == 1:
            eob = ss + idx
    r = 0
    for k in range(ss, se + 1):
        m = mags[k - ss]
        if m == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            sw.flush_eobrun()
            c, ln = sw.ac_codes[0xF0]
            sw.bw.write(c, ln)
            r -= 16
            sw.flush_corr_new()
        if m > 1:  # nonzero history: buffer the next magnitude bit
            sw.corr_new.append(m & 1)
            continue
        sw.flush_eobrun()
        c, ln = sw.ac_codes[(r << 4) | 1]
        sw.bw.write(c, ln)
        sw.bw.write(1 if int(zz[k]) > 0 else 0, 1)
        sw.flush_corr_new()
        r = 0
    sw.end_block(r > 0 or bool(sw.corr_new))


def _prog_ac_scan(sw, comp, ss, se, ah, al, ri):
    enc = _prog_ac_refine_block if ah else _prog_ac_first_block
    done = 0
    for y in range(comp["bh_ni"]):
        for x in range(comp["bw_ni"]):
            if ri and done and done % ri == 0:
                sw.restart()
            enc(sw, comp["coef"][y, x], ss, se, al)
            done += 1
    sw.finish()


def encode_jpeg_progressive(
    img, quant=None, subsampling: str = "444", restart_interval: int = 0
) -> bytes:
    """Encode as a progressive (SOF2) JFIF JPEG with libjpeg's default
    scan script: interleaved DC at Al=1 → luma AC band 1-5 at Al=2 →
    chroma AC full-band at Al=1 → luma AC band 6-63 at Al=2 → luma AC
    refine Ah=2,Al=1 → DC refine → per-component AC refine to Al=0.
    Quantized coefficients are computed with the exact quantizer rule
    of ``encode_jpeg_baseline``, so on the same input the two encoders
    transmit identical coefficients through entirely different entropy
    structures — and must decode to identical pixels.
    ``restart_interval`` applies to every scan (DRI counts MCUs in the
    interleaved DC scan, blocks in non-interleaved scans, per T.81)."""
    import numpy as np

    comps, H, W, mcus_x, mcus_y, q = _prepare_planes(img, quant, subsampling, np)
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    for c in comps:
        c["bw_ni"] = -(-(W * c["h"]) // (hmax * 8))
        c["bh_ni"] = -(-(H * c["v"]) // (vmax * 8))
    _zz_coefficients(comps, q, _dct_matrix(), np)
    zz_q = [q[_ZIGZAG[k]] for k in range(64)]

    nc = len(comps)
    out = bytearray()
    out += b"\xff\xd8"
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(
        ">HH", 1, 1
    ) + b"\x00\x00"
    wide = any(v > 255 for v in zz_q)
    if wide:
        out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 128) + bytes([0x10])
        for v in zz_q:
            out += struct.pack(">H", int(v))
    else:
        out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64)
        out += bytes([0x00]) + bytes(int(v) for v in zz_q)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * nc, 8, H, W, nc)
    for c in comps:
        out += bytes([c["id"], (c["h"] << 4) | c["v"], 0])
    tables = [(0x00, _DC_LUMA), (0x10, _AC_PROG)]
    if nc == 3:
        tables.append((0x01, _DC_CHROMA))
    for tc, (bits, values) in tables:
        out += b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + len(values))
        out += bytes([tc]) + bytes(bits) + bytes(values)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    dc_l = _encode_codes(*_DC_LUMA)
    dc_c = _encode_codes(*_DC_CHROMA)
    ac_codes = _encode_codes(*_AC_PROG)

    def dc_codes_for(c):
        return dc_l if c is comps[0] else dc_c

    def sos(scan_comps, ss, se, ah, al):
        out.extend(b"\xff\xda")
        out.extend(struct.pack(">HB", 6 + 2 * len(scan_comps), len(scan_comps)))
        for c in scan_comps:
            td = 0 if (ss > 0 or c is comps[0]) else 1
            out.extend(bytes([c["id"], (td << 4) | 0]))
        out.extend(bytes([ss, se, (ah << 4) | al]))
        return _ScanWriter(out, ac_codes)

    ri = restart_interval
    # scan script (libjpeg default shape)
    sw = sos(comps, 0, 0, 0, 1)
    _prog_dc_scan(sw, comps, mcus_x, mcus_y, 0, 1, dc_codes_for, ri)
    if nc == 3:
        _prog_ac_scan(sos([comps[0]], 1, 5, 0, 2), comps[0], 1, 5, 0, 2, ri)
        _prog_ac_scan(sos([comps[2]], 1, 63, 0, 1), comps[2], 1, 63, 0, 1, ri)
        _prog_ac_scan(sos([comps[1]], 1, 63, 0, 1), comps[1], 1, 63, 0, 1, ri)
        _prog_ac_scan(sos([comps[0]], 6, 63, 0, 2), comps[0], 6, 63, 0, 2, ri)
        _prog_ac_scan(sos([comps[0]], 1, 63, 2, 1), comps[0], 1, 63, 2, 1, ri)
    else:
        _prog_ac_scan(sos([comps[0]], 1, 63, 0, 1), comps[0], 1, 63, 0, 1, ri)
    sw = sos(comps, 0, 0, 1, 0)
    _prog_dc_scan(sw, comps, mcus_x, mcus_y, 1, 0, dc_codes_for, ri)
    _prog_ac_scan(sos([comps[0]], 1, 63, 1, 0), comps[0], 1, 63, 1, 0, ri)
    if nc == 3:
        _prog_ac_scan(sos([comps[2]], 1, 63, 1, 0), comps[2], 1, 63, 1, 0, ri)
        _prog_ac_scan(sos([comps[1]], 1, 63, 1, 0), comps[1], 1, 63, 1, 0, ri)
    out += b"\xff\xd9"
    return bytes(out)


def _prepare_planes(img, quant, subsampling: str, np):
    """Shared encoder front half: validate, BT.601 color-convert,
    optionally 4:2:0 box-average chroma, and edge-pad every component
    plane to the MCU grid. Returns (comps, H, W, mcus_x, mcus_y, q)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    if img.ndim != 3 or img.shape[2] not in (1, 3):
        raise ValueError("encode_jpeg: need HxW, HxWx1, or HxWx3")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    H, W = img.shape[:2]
    if H == 0 or W == 0:
        raise ValueError("empty image")
    q = np.ones((8, 8)) if quant is None else np.asarray(quant, dtype=np.float64)
    if q.shape != (8, 8) or (q < 1).any() or (q > 65535).any():
        raise ValueError("quant must be 8x8 with entries in [1, 65535]")
    gray = img.shape[2] == 1
    if gray:
        comps = [{"id": 1, "h": 1, "v": 1, "plane": img[:, :, 0].astype(np.float64)}]
    else:
        f = img.astype(np.float64)
        R, G, B = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        Y = 0.299 * R + 0.587 * G + 0.114 * B
        Cb = 128.0 - 0.168736 * R - 0.331264 * G + 0.5 * B
        Cr = 128.0 + 0.5 * R - 0.418688 * G - 0.081312 * B
        if subsampling == "420":
            # pad to even dims by edge replication, then 2x2 box average
            Cbp = _pad_to(Cb, 2, np)
            Crp = _pad_to(Cr, 2, np)
            Cb = (
                Cbp[0::2, 0::2] + Cbp[0::2, 1::2] + Cbp[1::2, 0::2] + Cbp[1::2, 1::2]
            ) / 4.0
            Cr = (
                Crp[0::2, 0::2] + Crp[0::2, 1::2] + Crp[1::2, 0::2] + Crp[1::2, 1::2]
            ) / 4.0
            comps = [
                {"id": 1, "h": 2, "v": 2, "plane": Y},
                {"id": 2, "h": 1, "v": 1, "plane": Cb},
                {"id": 3, "h": 1, "v": 1, "plane": Cr},
            ]
        else:
            comps = [
                {"id": 1, "h": 1, "v": 1, "plane": Y},
                {"id": 2, "h": 1, "v": 1, "plane": Cb},
                {"id": 3, "h": 1, "v": 1, "plane": Cr},
            ]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-W // (8 * hmax))
    mcus_y = -(-H // (8 * vmax))
    # per-component padded planes on the MCU grid
    for c in comps:
        ph = mcus_y * c["v"] * 8
        pw = mcus_x * c["h"] * 8
        c["plane"] = _pad_to_shape(c["plane"], ph, pw, np)
    return comps, H, W, mcus_x, mcus_y, q


def _np_round_half_away(a):
    """Round half away from zero (libjpeg's quantizer rule), elementwise —
    np.round's banker's rounding would make .5 boundaries depend on
    parity."""
    import numpy as np

    return np.sign(a) * np.floor(np.abs(a) + 0.5)


def _pad_to(plane, mult: int, np):
    h, w = plane.shape
    ph = -(-h // mult) * mult
    pw = -(-w // mult) * mult
    return _pad_to_shape(plane, ph, pw, np)


def _pad_to_shape(plane, ph: int, pw: int, np):
    h, w = plane.shape
    if ph == h and pw == w:
        return plane
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
