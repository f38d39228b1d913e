"""Codec layer: real decoders when the libraries exist, deterministic
STUB decoders otherwise.

The container has no image/audio libraries, so the codec step is a
clearly-marked stub: ``FAKE_*`` functions derive metadata and "pixels"
deterministically from the raw bytes (length + rolling checksum). The
Spark-side plumbing (schemas, Arrow batching, partitioning) is identical
for real and fake codecs — swapping in Pillow/librosa/PyAV is a pure
function replacement here, nothing upstream changes.

The fake arithmetic is intentionally simple enough to restate in ANSI SQL,
so the multimodal pipeline is oracle-checkable end-to-end (DuckDB computes
the same metadata from octet_length/checksum).
"""

from __future__ import annotations

from typing import Optional

try:  # pragma: no cover - not installed in this container
    from PIL import Image  # type: ignore

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def byte_checksum(payload: bytes) -> int:
    """Sum of bytes mod 2^31 — cheap, CONTENT-sensitive but
    order-INSENSITIVE (a permutation of the same bytes collides by
    design: summation commutes), and expressible in SQL over an unnested
    byte array (or precomputed at ingest). Fine for the stub decoders'
    deterministic fake metadata; a real pipeline would use a positional
    hash (xxhash64) if reordered content must be distinguished."""
    return sum(payload) % (2**31)


# -- image ------------------------------------------------------------------

def fake_decode_image(payload: Optional[bytes]) -> Optional[dict]:
    """STUB image decode: metadata derived from byte length/checksum.

    width  = 64 + len  % 512
    height = 64 + csum % 512
    channels = 1 + (len % 3)  -> 1/2/3
    format: 'png' if payload starts with the PNG magic else 'jpeg'
    """
    if payload is None:
        return None
    n, csum = len(payload), byte_checksum(payload)
    return {
        "width": 64 + n % 512,
        "height": 64 + csum % 512,
        "channels": 1 + n % 3,
        "format": "png" if payload[:4] == b"\x89PNG" else "jpeg",
    }


def decode_image(payload: Optional[bytes]) -> Optional[dict]:
    if payload is None:
        return None
    if HAVE_PIL:  # pragma: no cover
        try:
            import io

            with Image.open(io.BytesIO(payload)) as im:
                return {
                    "width": im.width,
                    "height": im.height,
                    "channels": len(im.getbands()),
                    "format": (im.format or "unknown").lower(),
                }
        except Exception:
            return None
    return fake_decode_image(payload)


def fake_image_features(payload: Optional[bytes], dim: int = 8) -> Optional[list[float]]:
    """STUB feature extraction: a ``dim``-length float vector from strided
    byte sums — stands in for a CNN/CLIP embedding. Deterministic, so
    downstream similarity-search operators are testable on it."""
    if payload is None:
        return None
    if not payload:
        return [0.0] * dim
    return [sum(payload[i::dim]) % 997 / 997.0 for i in range(dim)]


# -- video ------------------------------------------------------------------

def fake_decode_video(payload: Optional[bytes]) -> Optional[dict]:
    """STUB video probe: n_frames = 1 + csum % 300, fps 24.0/30.0 by
    length parity, frame geometry like the image stub."""
    if payload is None:
        return None
    n, csum = len(payload), byte_checksum(payload)
    return {
        "width": 64 + n % 512,
        "height": 64 + csum % 512,
        "fps": 24.0 if n % 2 == 0 else 30.0,
        "n_frames": 1 + csum % 300,
        "format": "fake-mp4",
    }


def real_decode_video(payload):  # pragma: no cover
    """Real video decode requires PyAV/ffmpeg — not available here."""
    raise NotImplementedError(
        "video decode needs PyAV/ffmpeg; wire it in here and ops.py is unchanged"
    )


# -- audio ------------------------------------------------------------------

def fake_decode_audio(payload: Optional[bytes]) -> Optional[dict]:
    """STUB audio probe: sample_rate from a small standard set chosen by
    checksum; n_samples proportional to byte length."""
    if payload is None:
        return None
    n, csum = len(payload), byte_checksum(payload)
    rates = (8000, 16000, 22050, 44100, 48000)
    return {
        "sample_rate": rates[csum % 5],
        "n_samples": n * 128,
        "n_channels": 1 + n % 2,
        "format": "fake-wav",
    }
