"""Pure-stdlib GIF codec (struct + numpy only — no Pillow): LZW pixel
decode for the remaining classic raster format next to the BMP / PNG /
JPEG decoders in this package.

Decoder (`decode_gif_pixels`): GIF87a/89a, global or local color table,
variable-width LSB-first LZW (code growth per the spec convention every
mainstream decoder implements: the decoder bumps its code width when its
NEXT table slot reaches 2^width — one table entry "behind" the encoder's
bump, which is exactly the decoder/encoder lag LZW creates), deferred
4096-entry table saturation, CLEAR/EOI handling, sub-block reassembly,
interlaced row de-permutation (the four-pass 8/8/4/2 scheme), and
extension-block skipping. Decodes the FIRST image frame; the frame must
cover the full logical screen (animation compositing — partial frames,
disposal methods, transparency overlay — is out of scope and returns
None; a GCE transparency index is ignored, the palette color shows).
Everything else fails closed to None — the caller falls back to the
stub, the same honest-downgrade contract as the other decoders.

Encoder (`encode_gif`): the fixture generator — palette built from the
image's unique colors (<= 256 required; GIF is an indexed format), real
dictionary LZW compression with in-spec width growth and CLEAR-on-full,
optional interlacing, a comment extension so decoders must actually skip
extension blocks, 255-byte sub-block chunking.

DETERMINISM + EXACTNESS: GIF is LOSSLESS — any image with <= 256 unique
colors round-trips BYTE-EXACT through encode -> decode (unlike JPEG's
DC-only exactness window), which is what lets goldens hash over decoded
pixels with no quantization argument at all.

Scale shape: decoding runs inside Arrow-batched pandas UDFs
(multimodal/ops.py) — a narrow per-row map with no shuffle, the same
envelope as the BMP/PNG/JPEG paths.

Reference behavior parity: the reference repo has no image codecs — this
module serves the beyond-reference multimodal surface (SURVEY.md §2.9
extension).
"""

from __future__ import annotations

import struct
from typing import Optional

_MAX_CODE_WIDTH = 12


def decode_gif_pixels(payload: Optional[bytes]):
    """Decode the first frame of a GIF to an (H, W, 3) uint8 ndarray.
    None for anything outside the supported envelope (see module doc)."""
    import numpy as np

    if payload is None or len(payload) < 13 or payload[:6] not in (
        b"GIF87a",
        b"GIF89a",
    ):
        return None
    try:
        return _decode(payload, np)
    except (ValueError, EOFError, IndexError, struct.error):
        return None


def _decode(payload: bytes, np):
    W, H, packed, _bg, _aspect = struct.unpack("<HHBBB", payload[6:13])
    if W == 0 or H == 0:
        return None
    i = 13
    global_palette = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        global_palette = payload[i : i + 3 * n]
        if len(global_palette) < 3 * n:
            return None
        i += 3 * n
    while i < len(payload):
        b = payload[i]
        if b == 0x3B:  # trailer before any image
            return None
        if b == 0x21:  # extension: label + sub-blocks
            i += 2
            while i < len(payload) and payload[i] != 0:
                i += 1 + payload[i]
            i += 1  # block terminator
            continue
        if b != 0x2C:  # image descriptor is the only other valid block
            return None
        left, top, w, h, ipacked = struct.unpack("<HHHHB", payload[i + 1 : i + 10])
        i += 10
        if (left, top, w, h) != (0, 0, W, H):
            return None  # partial frame: animation compositing, out of scope
        palette = global_palette
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            palette = payload[i : i + 3 * n]
            if len(palette) < 3 * n:
                return None
            i += 3 * n
        if palette is None:
            return None
        interlaced = bool(ipacked & 0x40)
        mcs = payload[i]
        i += 1
        if not 2 <= mcs <= 11:
            return None
        # reassemble the LZW stream from sub-blocks
        data = bytearray()
        while True:
            if i >= len(payload):
                return None
            ln = payload[i]
            i += 1
            if ln == 0:
                break
            data += payload[i : i + ln]
            if len(payload) < i + ln:
                return None
            i += ln
        indices = _lzw_decode(bytes(data), mcs, w * h)
        if indices is None:
            return None
        n_colors = len(palette) // 3
        idx = np.frombuffer(bytes(indices), dtype=np.uint8)
        if int(idx.max(initial=0)) >= n_colors:
            return None
        pal = np.frombuffer(palette[: 3 * n_colors], dtype=np.uint8).reshape(-1, 3)
        img = pal[idx].reshape(h, w, 3)
        if interlaced:
            img = img[_deinterlace_order(h), :, :]
        return img.copy()
    return None


def _interlace_order(h: int) -> list:
    """Row order in which an interlaced GIF STORES rows (the four-pass
    8-8-4-2 scheme)."""
    rows = list(range(0, h, 8))
    rows += list(range(4, h, 8))
    rows += list(range(2, h, 4))
    rows += list(range(1, h, 2))
    return rows


def _deinterlace_order(h: int):
    """Permutation p with stored[p[r]] = display row r."""
    order = _interlace_order(h)
    inv = [0] * h
    for stored_pos, display_row in enumerate(order):
        inv[display_row] = stored_pos
    return inv


class _LsbBitReader:
    """LSB-first variable-width code reader (GIF packs codes starting at
    the least significant bit — the opposite of JPEG's MSB-first)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, width: int) -> int:
        while self.nbits < width:
            if self.pos >= len(self.data):
                raise EOFError("LZW stream exhausted")
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.nbits -= width
        return v


def _lzw_decode(data: bytes, mcs: int, expected: int):
    """GIF LZW decode to exactly ``expected`` indices (None on any
    structural violation)."""
    clear = 1 << mcs
    end = clear + 1
    reader = _LsbBitReader(data)
    out = bytearray()

    def reset():
        return {c: bytes([c]) for c in range(clear)}, end + 1, mcs + 1

    table, next_code, width = reset()
    prev: Optional[bytes] = None
    while len(out) < expected:
        code = reader.read(width)
        if code == clear:
            table, next_code, width = reset()
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table.get(code)
            if entry is None:
                return None  # first code must be a literal
        elif code < next_code:
            entry = table.get(code)
            if entry is None:
                return None
            if next_code < 4096:
                table[next_code] = prev + entry[:1]
                next_code += 1
        elif code == next_code and next_code < 4096:
            entry = prev + prev[:1]
            table[next_code] = entry
            next_code += 1
        else:
            return None
        # the decoder bumps when its NEXT slot reaches 2^width — one
        # entry behind the encoder's bump (the inherent LZW lag)
        if next_code == (1 << width) and width < _MAX_CODE_WIDTH:
            width += 1
        out += entry
        prev = entry
    if len(out) != expected:
        return None
    return out


# ---------------------------------------------------------------------------
# encoder (fixture generator)
# ---------------------------------------------------------------------------


class _LsbBitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _lzw_encode(indices, mcs: int) -> bytes:
    clear = 1 << mcs
    end = clear + 1
    bw = _LsbBitWriter()

    def reset():
        return {(c,): c for c in range(clear)}, end + 1, mcs + 1

    table, next_code, width = reset()
    bw.write(clear, width)
    seq: tuple = ()
    for ix in indices:
        cand = seq + (int(ix),)
        if cand in table:
            seq = cand
            continue
        bw.write(table[seq], width)
        if next_code < 4096:
            table[cand] = next_code
            # encoder bumps when the JUST-ASSIGNED code fills 2^width
            if next_code == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
            next_code += 1
        else:
            # table full: hand the decoder a fresh dictionary
            bw.write(clear, width)
            table, next_code, width = reset()
        seq = (int(ix),)
    if seq:
        bw.write(table[seq], width)
    bw.write(end, width)
    return bw.flush()


def encode_gif(img, interlace: bool = False) -> bytes:
    """Encode an (H, W) / (H, W, 1) grayscale or (H, W, 3) RGB uint8
    array as a single-frame GIF89a. The palette is the image's unique
    colors in lexicographic order (<= 256 required — GIF is indexed);
    a comment extension is always emitted so decoders must skip
    extension blocks. ``interlace=True`` stores rows in the four-pass
    order."""
    import numpy as np

    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    if img.ndim != 3 or img.shape[2] not in (1, 3):
        raise ValueError("encode_gif: need HxW, HxWx1, or HxWx3")
    if img.shape[2] == 1:
        img = np.repeat(img, 3, axis=2)
    H, W = img.shape[:2]
    if H == 0 or W == 0:
        raise ValueError("empty image")
    flat = img.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"encode_gif: {len(colors)} unique colors > 256")
    # palette size = power of two >= max(2, n_colors); mcs >= 2 per spec
    bits = 1
    while (1 << bits) < len(colors):
        bits += 1
    bits = max(bits, 1)
    n_pal = 1 << bits
    mcs = max(bits, 2)
    pal = bytearray()
    for c in colors:
        pal += bytes(int(v) for v in c)
    pal += bytes(3 * (n_pal - len(colors)))

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", W, H, 0x80 | ((bits - 1) & 0x07), 0, 0)
    out += pal
    comment = b"mr_dice_spark fixture"
    out += b"\x21\xfe" + bytes([len(comment)]) + comment + b"\x00"
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, W, H, 0x40 if interlace else 0)
    idx = inverse.reshape(H, W)
    if interlace:
        idx = idx[_interlace_order(H), :]
    out += bytes([mcs])
    lzw = _lzw_encode(idx.reshape(-1).tolist(), mcs)
    for k in range(0, len(lzw), 255):
        chunk = lzw[k : k + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)
