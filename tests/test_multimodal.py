"""Multimodal plumbing tests: schemas, Arrow batch shape, determinism,
null handling, and the ASCII invariant the golden oracles rely on."""

import duckdb
import pytest
from pyspark.sql import functions as F

from mr_dice_spark.catalog import Catalog
from mr_dice_spark.multimodal import (
    IMAGE_META,
    image_features,
    media_table_schema,
    payload_from_text,
    probe_images,
    probe_videos,
    resize_images,
    sample_frames,
)
from mr_dice_spark.multimodal.codecs import (
    byte_checksum,
    fake_decode_image,
    fake_decode_video,
    fake_image_features,
    real_decode_video,
)


def _media(spark, sf_dir):
    docs = Catalog(spark, sf_dir).documents
    return docs.select("doc_id", payload_from_text(F.col("text")).alias("payload"))


def test_documents_are_ascii(sf_dir):
    # the golden oracles equate ascii(char) with byte value; this is the
    # invariant that makes the DuckDB restatement of the stub exact
    con = duckdb.connect()
    bad = con.sql(
        f"SELECT count(*) FROM '{sf_dir}/documents.parquet' "
        "WHERE octet_length(encode(text)) <> length(text)"
    ).fetchone()[0]
    assert bad == 0


def test_codec_stub_determinism():
    p = b"hello multimodal world"
    assert fake_decode_image(p) == fake_decode_image(p)
    m = fake_decode_image(p)
    assert m["width"] == 64 + len(p) % 512
    assert m["height"] == 64 + byte_checksum(p) % 512
    assert m["channels"] in (1, 2, 3)
    assert fake_decode_image(b"\x89PNGxxxx")["format"] == "png"
    assert fake_decode_image(None) is None
    v = fake_image_features(p, dim=8)
    assert len(v) == 8 and all(0.0 <= x <= 1.0 for x in v)
    assert fake_image_features(b"", dim=4) == [0.0] * 4


def test_real_video_decode_boundaries():
    # no container sample table at all -> still the tested boundary
    with pytest.raises(NotImplementedError):
        real_decode_video(b"anything")
    # a real container whose frames are NOT self-contained JPEGs (the
    # inter-frame-codec case) -> boundary too: pixels need PyAV/ffmpeg
    from mr_dice_spark.multimodal.codecs import encode_avi_stub

    p = encode_avi_stub(64, 48, 0, 10.0, samples=[b"\x00\x01h264ish", b"\x02"])
    with pytest.raises(NotImplementedError):
        real_decode_video(p)


def test_real_video_decode_mjpeg_roundtrip():
    # MJPEG frames (self-contained baseline JPEGs muxed as 00dc chunks)
    # decode for real, bit-exact on block-constant images
    np = pytest.importorskip("numpy")
    from mr_dice_spark.multimodal.codecs import encode_avi_stub
    from mr_dice_spark.multimodal.jpeg import encode_jpeg_baseline

    imgs = []
    for base in (7, 130):
        img = np.zeros((16, 16), dtype=np.uint8)
        img[:8, :8], img[:8, 8:], img[8:, :8], img[8:, 8:] = (
            base, base + 40, base + 80, base + 120,
        )
        imgs.append(img)
    p = encode_avi_stub(
        16, 16, 0, 10.0, samples=[encode_jpeg_baseline(i) for i in imgs]
    )
    frames = real_decode_video(p)
    assert [i for i, _ in frames] == [0, 1]
    for (_, got), want in zip(frames, imgs):
        assert got.shape == (16, 16, 1)
        assert np.array_equal(got[:, :, 0], want)
    # a corrupt frame among good ones is skipped, not fatal
    mixed = encode_avi_stub(
        16, 16, 0, 10.0,
        samples=[b"\xff\xd8garbage", encode_jpeg_baseline(imgs[0])],
    )
    frames = real_decode_video(mixed)
    assert [i for i, _ in frames] == [1]


def test_real_probe_mp4_roundtrip():
    from mr_dice_spark.multimodal.codecs import (
        decode_video,
        encode_mp4_stub,
        real_probe_video,
    )

    p = encode_mp4_stub(width=640, height=360, n_frames=240, fps=24.0)
    got = real_probe_video(p)
    assert got == {
        "width": 640, "height": 360, "fps": 24.0, "n_frames": 240,
        "format": "mp4",
    }
    assert decode_video(p) == got  # dispatch takes the real path
    # trailing mdat after moov does not confuse the walk
    import struct

    with_mdat = p + struct.pack(">I", 8 + 32) + b"mdat" + bytes(32)
    assert real_probe_video(with_mdat) == got


def test_real_probe_avi_roundtrip():
    from mr_dice_spark.multimodal.codecs import decode_video, encode_avi_stub, real_probe_video

    p = encode_avi_stub(width=320, height=240, n_frames=750, fps=25.0)
    got = real_probe_video(p)
    assert got == {
        "width": 320, "height": 240, "fps": 25.0, "n_frames": 750,
        "format": "avi",
    }
    assert decode_video(p) == got


def test_real_probe_video_rejects_text_and_truncation():
    from mr_dice_spark.multimodal.codecs import (
        decode_video,
        encode_avi_stub,
        encode_mp4_stub,
        fake_decode_video,
        real_probe_video,
    )

    # arbitrary text: never claimed as a container; stub path is taken
    text = b"the quick brown fox jumps over the lazy dog, repeatedly" * 3
    assert real_probe_video(text) is None
    assert decode_video(text) == fake_decode_video(text)
    # truncated containers -> None (stub fallback), never a crash
    mp4 = encode_mp4_stub(640, 360, 240, 24.0)
    avi = encode_avi_stub(320, 240, 750, 25.0)
    for cut in (4, 12, 40, len(mp4) // 2, len(mp4) - 5):
        assert real_probe_video(mp4[:cut]) is None, cut
    for cut in (4, 11, 20, len(avi) // 2):
        assert real_probe_video(avi[:cut]) is None, cut


def test_real_probe_video_adversarial_headers():
    import struct

    from mr_dice_spark.multimodal.codecs import (
        MAX_DIM,
        MAX_FRAMES,
        encode_avi_stub,
        encode_mp4_stub,
        real_probe_video,
    )

    # lying box size: moov claims to extend past the payload -> walk stops
    good = encode_mp4_stub(640, 360, 240, 24.0)
    moov_at = good.index(b"moov") - 4
    lying = bytearray(good)
    lying[moov_at : moov_at + 4] = struct.pack(">I", len(good) * 10)
    assert real_probe_video(bytes(lying)) is None
    # tkhd claiming absurd geometry -> None (int32-safe stub path)
    huge = encode_mp4_stub(MAX_DIM + 1, 360, 240, 24.0)
    assert real_probe_video(huge) is None
    # stsz claiming an absurd frame count -> None
    bomb = encode_mp4_stub(640, 360, MAX_FRAMES + 1, 24.0)
    assert real_probe_video(bomb) is None
    # AVI with absurd dimensions -> None
    assert real_probe_video(encode_avi_stub(MAX_DIM + 1, 240, 10, 25.0)) is None
    # zero-size box loops are impossible: size=0 means to-end-of-scope,
    # and a nested zero-size garbage box simply ends that scope's walk
    weird = bytearray(good)
    tkhd_at = good.index(b"tkhd") - 4
    weird[tkhd_at : tkhd_at + 4] = struct.pack(">I", 0)
    assert real_probe_video(bytes(weird)) is None  # tkhd swallows the trak


def test_real_probe_mp4_audio_track_first():
    """An MP4 whose moov lists an audio trak first (0x0 tkhd geometry,
    'soun' handler) followed by a video trak WITHOUT an hdlr box must
    still report the geometry-bearing track — the fallback branch of the
    track-selection heuristic (round-3 review finding)."""
    import struct

    from mr_dice_spark.multimodal.codecs import encode_mp4_stub, real_probe_video

    def box(fourcc, body):
        return struct.pack(">I", 8 + len(body)) + fourcc + body

    good = encode_mp4_stub(640, 360, 240, 24.0)
    # audio trak: zero geometry, explicit 'soun' handler
    tkhd_a = box(b"tkhd", bytes(4) + bytes(72) + struct.pack(">II", 0, 0))
    hdlr_a = box(b"hdlr", bytes(8) + b"soun" + bytes(12) + b"\x00")
    mdia_a = box(b"mdia", hdlr_a)
    trak_a = box(b"trak", tkhd_a + mdia_a)
    # video trak stripped of its hdlr box: geometry + stsz + mdhd only
    ftyp_end = 8 + struct.unpack(">I", good[0:4])[0] - 8  # ftyp box size
    ftyp_len = struct.unpack(">I", good[0:4])[0]
    moov = good[ftyp_len:]
    moov_body = moov[8:]
    # locate the original trak inside moov and drop its hdlr
    trak_at = moov_body.index(b"trak") - 4
    trak_len = struct.unpack(">I", moov_body[trak_at : trak_at + 4])[0]
    trak_v = moov_body[trak_at : trak_at + trak_len]
    h_at = trak_v.index(b"hdlr") - 4
    h_len = struct.unpack(">I", trak_v[h_at : h_at + 4])[0]
    trak_v_nohdlr = trak_v[:h_at] + trak_v[h_at + h_len :]
    # shrink the trak and mdia size fields by the removed hdlr length
    tv = bytearray(trak_v_nohdlr)
    tv[0:4] = struct.pack(">I", trak_len - h_len)
    m_at = trak_v.index(b"mdia") - 4
    m_len = struct.unpack(">I", trak_v[m_at : m_at + 4])[0]
    tv[m_at : m_at + 4] = struct.pack(">I", m_len - h_len)
    mvhd_part = moov_body[:trak_at]
    new_moov_body = mvhd_part + trak_a + bytes(tv)
    payload = good[:ftyp_len] + box(b"moov", new_moov_body)
    got = real_probe_video(payload)
    assert got is not None and got["format"] == "mp4"
    assert (got["width"], got["height"], got["n_frames"]) == (640, 360, 240)
    assert got["fps"] == 24.0


def test_mp4_sample_extraction_roundtrip_and_bounds():
    import struct

    from mr_dice_spark.multimodal.codecs import (
        encode_mp4_stub,
        extract_mp4_sample,
        mp4_sample_slices,
        real_probe_video,
    )

    samples = [bytes([65 + i % 26]) * (3 + i % 9) for i in range(23)]
    p = encode_mp4_stub(320, 240, 0, 24.0, samples=samples, samples_per_chunk=4)
    # probe reads stsz's count, not the n_frames argument
    assert real_probe_video(p)["n_frames"] == 23
    sl = mp4_sample_slices(p)
    assert len(sl) == 23
    assert [extract_mp4_sample(p, i) for i in range(23)] == samples
    # out-of-range and non-MP4 -> None
    assert extract_mp4_sample(p, 23) is None
    assert extract_mp4_sample(b"plain text", 0) is None
    # truncated mdat: tail samples clamp out, never read past the payload
    cut = p[: len(p) - 25]
    sl2 = mp4_sample_slices(cut)
    assert 0 < len(sl2) < 23
    assert all(o + s <= len(cut) for o, s in sl2)
    # corrupt stsc (non-ascending first_chunk) -> whole table rejected
    bad = bytearray(p)
    at = p.index(b"stsc") + 4 + 4  # body: ver/flags then entry_count
    bad[at : at + 4] = struct.pack(">I", 2)  # claim 2 runs, body has 1
    assert mp4_sample_slices(bytes(bad)) is None
    # headerless stub file (no sample table) -> None, probe still works
    plain = encode_mp4_stub(320, 240, 10, 24.0)
    assert mp4_sample_slices(plain) is None
    assert real_probe_video(plain)["n_frames"] == 10


def test_mp4_sample_slices_adversarial_tables():
    """Second-review regressions: (a) a tiny payload declaring a huge
    fixed-size stsz must be rejected BEFORE allocating (total declared
    sample bytes > file size); (b) out-of-file-order chunks with a
    truncated download truncate at the FIRST out-of-bounds slice so no
    later sample is served under the wrong index; (c) a video trak
    without an stbl must not fall back to another trak's sample table —
    probe and slicer take the stub path together."""
    import struct
    import time

    from mr_dice_spark.multimodal.codecs import (
        _probe_mp4,
        encode_mp4_stub,
        mp4_sample_slices,
    )

    def box(fourcc, body):
        return struct.pack(">I", 8 + len(body)) + fourcc + body

    good = encode_mp4_stub(64, 64, 0, 24.0, samples=[b"abcd"] * 3)
    # (a) allocation bomb: fixed=1, count=2^27 in a ~300-byte file
    bomb = bytearray(good)
    at = good.index(b"stsz") + 4 + 4  # body: ver/flags | fixed | count
    bomb[at : at + 8] = struct.pack(">II", 1, 1 << 27)
    t0 = time.monotonic()
    assert mp4_sample_slices(bytes(bomb)) is None
    assert time.monotonic() - t0 < 0.5  # rejected, not allocated

    # (b) out-of-order chunk offsets: chunk 1 points past a truncation
    # cut, chunk 2 is still in-bounds -> EVERYTHING from the first OOB
    # slice on is dropped (index alignment), not just the OOB ones
    samples = [bytes([i]) * 4 for i in range(8)]
    p = encode_mp4_stub(64, 64, 0, 24.0, samples=samples, samples_per_chunk=4)
    sl = mp4_sample_slices(p)
    reordered = bytearray(p)
    at = p.index(b"stco") + 4 + 8  # body: ver/flags | count | offsets
    o1, o2 = struct.unpack(">II", p[at : at + 8])
    reordered[at : at + 8] = struct.pack(">II", o2, o1)  # swap chunk order
    # relocate the mdat bytes to match the swapped offsets
    ch1 = p[o1 : o1 + 16]
    ch2 = p[o2 : o2 + 16]
    reordered[o1 : o1 + 16] = ch2
    reordered[o2 : o2 + 16] = ch1
    full = bytes(reordered)
    assert [full[o : o + s] for o, s in mp4_sample_slices(full)] == samples
    # truncate just below chunk 1's (highest) offset: samples 0-3 are
    # out of bounds while chunk 2 (samples 4-7, at the LOWER offset) is
    # still fully present — everything must drop, never chunk 2's bytes
    # relabeled as samples 0..3
    assert mp4_sample_slices(full[:o2]) == []
    # truncating INSIDE chunk 1 keeps only its in-bounds prefix, aligned
    sl_prefix = mp4_sample_slices(full[: o2 + 8])
    assert [full[o : o + s] for o, s in sl_prefix] == samples[:2]

    # (c) explicit video trak WITHOUT an stbl, after a non-video trak
    # that HAS one: selection must pick the video trak in both surfaces,
    # so the probe fails (no frame count) AND the slicer returns None —
    # never another trak's sample table under the video trak's identity
    tkhd_v = box(b"tkhd", bytes(4) + bytes(72) + struct.pack(">II", 64 << 16, 64 << 16))
    hdlr_v = box(b"hdlr", bytes(8) + b"vide" + bytes(12) + b"\x00")
    trak_v = box(b"trak", tkhd_v + box(b"mdia", hdlr_v))  # no minf/stbl
    demoted = good.replace(b"vide", b"soun")  # trak A: geometry+stbl, non-video
    ftyp_len = struct.unpack(">I", demoted[0:4])[0]
    moov_len = struct.unpack(">I", demoted[ftyp_len : ftyp_len + 4])[0]
    old_body = demoted[ftyp_len + 8 : ftyp_len + moov_len]
    mixed = (
        demoted[:ftyp_len]
        + box(b"moov", old_body + trak_v)
        + demoted[ftyp_len + moov_len :]
    )
    assert _probe_mp4(mixed) is None        # selected video trak: no frames
    assert mp4_sample_slices(mixed) is None  # and no borrowed sample table
    # sanity: without the video trak, the demoted geometry trak IS usable
    assert _probe_mp4(demoted) is not None
    assert mp4_sample_slices(demoted) is not None


def test_mp4_sample_slices_corruption_fuzz():
    """Single-byte corruptions anywhere in a sampled MP4 must never make
    the slicer raise or emit an out-of-bounds slice (deterministic sweep,
    every 7th offset — full coverage is the adversarial test above)."""
    from mr_dice_spark.multimodal.codecs import encode_mp4_stub, mp4_sample_slices

    samples = [bytes([i]) * (4 + i % 5) for i in range(9)]
    p = encode_mp4_stub(64, 64, 0, 24.0, samples=samples)
    for off in range(0, len(p), 7):
        for flip in (0x01, 0xFF):
            mutated = bytearray(p)
            mutated[off] ^= flip
            mb = bytes(mutated)
            sl = mp4_sample_slices(mb)  # must not raise
            if sl is not None:
                assert all(o >= 0 and s >= 0 and o + s <= len(mb) for o, s in sl), (off, flip)


def test_extract_frames_real_mp4_samples(spark):
    from mr_dice_spark.multimodal.codecs import encode_mp4_stub
    from mr_dice_spark.multimodal.ops import extract_frames, probe_videos, sample_frames

    samples = [f"sample-{i:02d}".encode() for i in range(12)]
    df = spark.createDataFrame(
        [(1, encode_mp4_stub(320, 240, 0, 24.0, samples=samples)),
         (2, b"not a video; takes the stub window path")],
        "media_id long, payload binary",
    )
    probed = probe_videos(df)
    sampled = sample_frames(probed, target=4)
    got = {(r["media_id"], r["frame_idx"]): bytes(r["frame_bytes"])
           for r in extract_frames(df, sampled).collect()}
    # media 1: true encoded samples at the strided indices (stride 3)
    for idx in (0, 3, 6, 9):
        assert got[(1, idx)] == samples[idx]
    # media 2: stub 16-byte window (no sample table)
    assert all(len(v) <= 16 for (m, _), v in got.items() if m == 2)


def test_probe_videos_mixed_real_and_stub(spark):
    from mr_dice_spark.multimodal.codecs import (
        encode_avi_stub,
        encode_mp4_stub,
        fake_decode_video,
    )
    from mr_dice_spark.multimodal.ops import probe_videos

    text = b"not a video at all"
    df = spark.createDataFrame(
        [
            (1, encode_mp4_stub(640, 360, 240, 24.0)),
            (2, encode_avi_stub(320, 240, 750, 25.0)),
            (3, text),
            (4, None),
        ],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r.asDict() for r in probe_videos(df).collect()}
    assert rows[1] == {"media_id": 1, "width": 640, "height": 360,
                       "fps": 24.0, "n_frames": 240, "format": "mp4"}
    assert rows[2] == {"media_id": 2, "width": 320, "height": 240,
                       "fps": 25.0, "n_frames": 750, "format": "avi"}
    stub = fake_decode_video(text)
    assert rows[3]["format"] == "fake-mp4" and rows[3]["width"] == stub["width"]
    assert rows[4]["width"] is None


def test_probe_images_schema_and_null(spark):
    df = spark.createDataFrame(
        [(1, b"abcdef"), (2, None)], "media_id long, payload binary"
    )
    out = probe_images(df)
    assert [f.name for f in out.schema.fields] == [
        "media_id", "width", "height", "channels", "format"
    ]
    rows = {r["media_id"]: r for r in out.collect()}
    assert rows[1]["width"] == 64 + 6 % 512
    assert rows[2]["width"] is None  # null payload -> null metadata


def test_probe_prunes_payload_from_plan(spark, sf_dir):
    # payload isolation: the probe's scan must not read unrelated columns
    docs = Catalog(spark, sf_dir).documents
    media = docs.select("doc_id", payload_from_text(F.col("text")).alias("payload"),
                        "lang", "source")
    plan = probe_images(media, id_cols=["doc_id"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "lang" not in plan.split("ReadSchema")[-1][:300]


def test_image_features_column(spark):
    df = spark.createDataFrame([(1, b"abcdefgh" * 4)], "media_id long, payload binary")
    out = image_features(df, dim=8).select("media_id", "embedding").first()
    assert out["embedding"] == pytest.approx(fake_image_features(b"abcdefgh" * 4, 8), abs=1e-6)


def test_resize_stub(spark):
    df = spark.createDataFrame(
        [(1, b"abc"), (2, None)], "media_id long, payload binary"
    )
    rows = {r["media_id"]: r for r in resize_images(df, 224, 224).collect()}
    assert rows[1]["width"] == rows[1]["height"] == 224
    assert rows[1]["resized"] is True and bytes(rows[1]["payload"]) == b"abc"
    assert rows[2]["resized"] is False


def test_sample_frames_bounds(spark, sf_dir):
    probed = probe_videos(_media(spark, sf_dir), id_cols=["doc_id"])
    sampled = sample_frames(probed, target=8, id_cols=["doc_id"])
    agg = (
        sampled.join(probed.select("doc_id", "n_frames"), "doc_id")
        .groupBy("doc_id", "n_frames")
        .agg(F.count(F.lit(1)).alias("k"), F.max("frame_idx").alias("max_idx"))
    )
    stride = F.greatest(F.lit(1), F.ceil(F.col("n_frames") / 8).cast("int"))
    expected_k = F.least(F.lit(8), F.floor((F.col("n_frames") - 1) / stride) + 1)
    bad = agg.where(
        (F.col("k") != expected_k) | (F.col("max_idx") >= F.col("n_frames"))
    ).count()
    assert bad == 0


def test_media_table_schema_shape():
    s = media_table_schema(meta=IMAGE_META)
    assert [f.name for f in s.fields] == ["media_id", "uri", "payload", "meta"]
    assert s["payload"].dataType.typeName() == "binary"


def test_read_media_dir(spark, tmp_path):
    from mr_dice_spark.multimodal import read_media_dir

    (tmp_path / "a.bin").write_bytes(b"\x01\x02\x03")
    (tmp_path / "b.txt").write_bytes(b"skip-me")
    out = read_media_dir(spark, str(tmp_path), glob="*.bin").collect()
    assert len(out) == 1
    assert bytes(out[0]["payload"]) == b"\x01\x02\x03" and out[0]["n_bytes"] == 3


def test_extract_frames_second_pass(spark, sf_dir):
    from mr_dice_spark.multimodal import extract_frames

    media = _media(spark, sf_dir).limit(50)
    probed = probe_videos(media, id_cols=["doc_id"])
    sampled = sample_frames(probed, target=4, id_cols=["doc_id"])
    frames = extract_frames(media, sampled, id_cols=["doc_id"])
    got = frames.collect()
    expected = sampled.count()
    assert len(got) == expected
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc, rows in by_doc.items():
        assert len({r["frame_idx"] for r in rows}) == len(rows)  # unique indices
        assert all(0 < len(bytes(r["frame_bytes"])) <= 16 for r in rows)
    # determinism: same frame -> same bytes on a re-run
    again = {(r["doc_id"], r["frame_idx"]): bytes(r["frame_bytes"])
             for r in extract_frames(media, sampled, id_cols=["doc_id"]).collect()}
    for r in got:
        assert again[(r["doc_id"], r["frame_idx"])] == bytes(r["frame_bytes"])


def test_real_wav_probe_roundtrip(spark, tmp_path):
    """A genuine PCM WAV (written with the stdlib wave module) must probe
    to its REAL sample rate / channels / sample count, while non-WAV
    payloads keep the deterministic stub path."""
    import io
    import wave

    from mr_dice_spark.multimodal.ops import probe_audio

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(22050)
        w.writeframes(b"\x00\x01" * 2 * 441)  # 441 stereo frames
    wav_bytes = buf.getvalue()

    df = spark.createDataFrame(
        [(1, bytearray(wav_bytes)), (2, bytearray(b"not audio at all"))],
        "media_id long, payload binary",
    )
    got = {r["media_id"]: r.asDict() for r in probe_audio(df).collect()}
    assert got[1]["sample_rate"] == 22050
    assert got[1]["n_channels"] == 2
    assert got[1]["n_samples"] == 441
    assert got[1]["format"] == "wav"
    assert got[2]["format"] == "fake-wav"  # stub fallback


def test_real_image_header_probe(spark):
    import struct

    from mr_dice_spark.multimodal.ops import probe_images

    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR"
        + struct.pack(">II", 320, 200) + bytes([8, 2, 0, 0, 0])  # 8-bit RGB
        + b"\x00" * 8
    )
    bmp = (
        b"BM" + struct.pack("<IHHI", 0, 0, 0, 54)
        + struct.pack("<IiiHH", 40, 640, -480, 1, 24) + b"\x00" * 24
    )
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        + b"\xff\xc0" + struct.pack(">H", 11) + bytes([8])
        + struct.pack(">HH", 480, 640) + bytes([3, 0, 0])
        + b"\xff\xd9"
    )
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(bmp)), (3, bytearray(jpeg)),
         (4, bytearray(b"opaque-blob"))],
        "media_id long, payload binary",
    )
    got = {r["media_id"]: r.asDict() for r in probe_images(df).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["channels"], got[1]["format"]) == (320, 200, 3, "png")
    assert (got[2]["width"], got[2]["height"], got[2]["channels"], got[2]["format"]) == (640, 480, 3, "bmp")
    assert (got[3]["width"], got[3]["height"], got[3]["channels"], got[3]["format"]) == (640, 480, 3, "jpeg")
    assert got[4]["format"] in ("jpeg", "png")  # stub fallback naming


def test_real_bmp_png_pixel_roundtrip_and_resize(spark):
    """decode_pixels must invert encode_bmp exactly; a real BMP through
    resize_images comes back as a genuine BMP at the target geometry whose
    pixels equal the numpy nearest-neighbor reference; undecodable
    payloads keep stub passthrough."""
    import struct
    import zlib

    import numpy as np

    from mr_dice_spark.multimodal import codecs
    from mr_dice_spark.multimodal.ops import probe_images, resize_images

    rng = np.random.RandomState(7)
    img = rng.randint(0, 255, size=(10, 7, 3), dtype=np.uint8)
    bmp = codecs.encode_bmp(img)
    assert np.array_equal(codecs.decode_pixels(bmp), img)

    # PNG with per-row filters 0..4 exercises the whole unfilter path
    stride = 7 * 3
    raw = bytearray()
    for y in range(10):
        f = y % 5
        line = img[y].reshape(-1).astype(np.int32)
        prior = img[y - 1].reshape(-1).astype(np.int32) if y else np.zeros(stride, np.int32)
        enc = np.zeros(stride, np.int32)
        for x in range(stride):
            a = line[x - 3] if x >= 3 else 0
            b = prior[x]
            c = prior[x - 3] if x >= 3 else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            enc[x] = (line[x] - pred) & 0xFF
        raw.append(f)
        raw.extend(enc.astype(np.uint8).tobytes())
    idat = zlib.compress(bytes(raw))
    def chunk(cid, body):
        return struct.pack(">I", len(body)) + cid + body + struct.pack(">I", zlib.crc32(cid + body))
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 7, 10, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(codecs.decode_pixels(png), img)

    df = spark.createDataFrame(
        [(1, bytearray(bmp)), (2, bytearray(png)), (3, bytearray(b"opaque"))],
        "media_id long, payload binary",
    )
    out = {r["media_id"]: r for r in resize_images(df, 4, 5).collect()}
    ref = codecs.resize_pixels(img, 4, 5)
    for mid in (1, 2):
        resized = codecs.decode_pixels(bytes(out[mid]["payload"]))
        assert np.array_equal(resized, ref)
        assert (out[mid]["width"], out[mid]["height"]) == (4, 5)
    assert bytes(out[3]["payload"]) == b"opaque"  # stub passthrough
    # and the probe reads the REAL new geometry back from the re-encoded BMP
    probed = {r["media_id"]: r for r in probe_images(
        spark.createDataFrame([(1, bytearray(out[1]["payload"]))], "media_id long, payload binary")
    ).collect()}
    assert (probed[1]["width"], probed[1]["height"], probed[1]["format"]) == (4, 5, "bmp")


def test_real_image_features_from_pixels(spark):
    import numpy as np

    from mr_dice_spark.multimodal import codecs
    from mr_dice_spark.multimodal.ops import image_features

    img = np.zeros((4, 8, 3), dtype=np.uint8)
    img[:, 4:, :] = 255  # left half black, right half white
    bmp = codecs.encode_bmp(img)
    df = spark.createDataFrame(
        [(1, bytearray(bmp)), (2, bytearray(b"opaque"))],
        "media_id long, payload binary",
    )
    got = {r["media_id"]: r["embedding"] for r in image_features(df, dim=2).collect()}
    # row-major flatten: each row is half black half white -> both cells 0.5
    assert got[1] == pytest.approx([0.5, 0.5], abs=1e-3)
    assert got[2] == pytest.approx(codecs.fake_image_features(b"opaque", 2), abs=1e-6)


def test_audio_features_real_wav(spark):
    import io
    import wave

    import numpy as np

    from mr_dice_spark.multimodal.ops import audio_features

    t = np.arange(8000) / 8000.0
    sig = (0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(sig.tobytes())
    df = spark.createDataFrame(
        [(1, bytearray(buf.getvalue())), (2, bytearray(b"not-audio")), (3, None)],
        "media_id long, payload binary",
    )
    got = {r["media_id"]: r for r in audio_features(df).collect()}
    assert got[1]["duration_s"] == pytest.approx(1.0)
    assert got[1]["rms"] == pytest.approx(0.5 / 2 ** 0.5, rel=1e-3)  # sine RMS = A/sqrt(2)
    assert got[1]["peak"] == pytest.approx(0.5, rel=1e-3)
    assert got[2]["rms"] is None and got[3]["rms"] is None


def test_codec_adversarial_payloads_fall_back_not_crash(spark):
    """Findings from the round-2 codec review: grayscale/gray+alpha PNGs
    must resize (encode_bmp handles 1/2 channels), sample_rate=0 WAVs and
    huge-dimension PNG headers must fall back instead of crashing, 'BM'-
    prefixed ASCII text must stay on the stub path, fill-byte-padded
    JPEGs must parse, and zlib-bomb PNGs must not inflate unbounded."""
    import struct
    import zlib

    import numpy as np

    from mr_dice_spark.multimodal import codecs
    from mr_dice_spark.multimodal.ops import audio_features, probe_images, resize_images

    # 1-channel image end-to-end through encode_bmp
    gray = np.arange(20, dtype=np.uint8).reshape(4, 5, 1)
    assert codecs.decode_pixels(codecs.encode_bmp(gray)).shape == (4, 5, 3)

    # zero sample_rate WAV: NULL stats, task survives
    bad_wav = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 0, 0, 1, 16)
        + b"data" + struct.pack("<I", 4) + b"\x00" * 4
    )
    df = spark.createDataFrame([(1, bytearray(bad_wav))], "media_id long, payload binary")
    assert audio_features(df).first()["rms"] is None

    # huge declared PNG dims: stub fallback (int32-safe), not 4-billion width
    huge = (
        b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
        + struct.pack(">II", 2**32 - 1, 2**32 - 1) + bytes([8, 2, 0, 0, 0]) + b"\x00" * 8
    )
    df = spark.createDataFrame([(1, bytearray(huge))], "media_id long, payload binary")
    assert probe_images(df).first()["width"] < 1024  # stub range

    # 'BM'-prefixed ASCII text stays on the stub path (golden invariant)
    txt = b"BM the market rallied today as bulls charged ahead strongly"
    assert codecs.real_probe_image(txt) is None

    # fill-byte-padded JPEG parses for real
    jpeg = (
        b"\xff\xd8" + b"\xff\xff\xff\xc0" + struct.pack(">H", 11) + bytes([8])
        + struct.pack(">HH", 10, 20) + bytes([3, 0, 0]) + b"\xff\xd9"
    )
    assert codecs.real_probe_image(jpeg) == {
        "width": 20, "height": 10, "channels": 3, "format": "jpeg"
    }

    # zlib bomb: tiny payload declaring modest dims but inflating huge data
    bomb_raw = zlib.compress(b"\x00" * (50 * 1024 * 1024))
    def chunk(cid, body):
        return struct.pack(">I", len(body)) + cid + body + struct.pack(">I", zlib.crc32(cid + body))
    bomb = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", bomb_raw) + chunk(b"IEND", b"")
    )
    out = codecs.decode_pixels(bomb)  # capped inflate: only 14 bytes out
    assert out is not None and out.shape == (2, 2, 3)

    # truncated WAV: n_samples/duration from bytes PRESENT, not declared
    good = (
        b"RIFF" + struct.pack("<I", 36 + 8000) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", 8000) + b"\x00\x01" * 1000  # 2000 of 8000 bytes
    )
    meta = codecs.real_probe_wav(good)
    assert meta["n_samples"] == 1000
    stats = codecs.wav_signal_stats(good)
    assert stats["duration_s"] == pytest.approx(1000 / 8000)


def test_jpeg_truncated_fill_bytes_return_none_not_crash():
    """Fill-byte skip must re-check bounds: a truncated run of 0xFF ending
    at the payload edge crashed real_probe_image with struct.error before
    the round-2 final review fix."""
    from mr_dice_spark.multimodal import codecs

    assert codecs.real_probe_image(b"\xff\xd8" + b"\xff" * 9 + b"\xc0") is None
    assert codecs.real_probe_image(b"\xff\xd8" + b"\xff" * 20) is None


def test_decode_pixels_agrees_with_probe_on_bmp_plausibility():
    """probe and pixel decode must classify the same payloads as BMP: a
    'BM' payload with an implausible DIB header (data_off overlapping the
    header) is rejected by BOTH, not really-decoded by one and stubbed by
    the other."""
    import struct

    from mr_dice_spark.multimodal import codecs

    bogus = (
        b"BM" + struct.pack("<IHHI", 0, 0, 0, 10)  # data_off 10 < 54
        + struct.pack("<IiiHH", 99, 4, 4, 1, 24) + b"\x00" * 100
    )
    assert codecs.real_probe_image(bogus) is None
    assert codecs.decode_pixels(bogus) is None


def test_avi_sample_slices_round_trip_and_adversarial():
    """movi chunk walk: exact round trip (including empty and odd-sized
    word-aligned samples), tail truncation on a cut download, None for
    non-AVI / header-only AVI, MP4-vs-AVI dispatch, and a lying LIST
    size clamped to the payload."""
    import struct

    from mr_dice_spark.multimodal.codecs import (
        avi_sample_slices,
        encode_avi_stub,
        encode_mp4_stub,
        video_sample_slices,
    )

    pieces = [b"hello", b"", b"x" * 33, b"odd"]
    p = encode_avi_stub(320, 240, 0, 25.0, samples=pieces)
    sl = avi_sample_slices(p)
    assert [p[o : o + s] for o, s in sl] == pieces
    assert video_sample_slices(p) == sl
    # cut mid-third-sample: only the first two survive (tail truncation,
    # never a mid-list gap)
    cut = avi_sample_slices(p[: sl[2][0] + 5])
    assert [p[o : o + s] for o, s in cut] == pieces[:2]
    assert avi_sample_slices(b"RIFFxxxxWAVE") is None          # not AVI
    assert avi_sample_slices(encode_avi_stub(64, 64, 9, 25.0)) is None  # no movi
    m = encode_mp4_stub(64, 64, 0, 24.0, samples=pieces)
    assert [m[o : o + s] for o, s in video_sample_slices(m)] == pieces
    # lying movi LIST size (larger than the file): walk clamps, no raise
    lying = bytearray(p)
    list_pos = p.find(b"movi") - 8
    struct.pack_into("<I", lying, list_pos + 4, 0x7FFFFFFF)
    sl2 = avi_sample_slices(bytes(lying))
    assert sl2 is not None
    assert all(o + s <= len(lying) for o, s in sl2)


def test_avi_sample_slices_corruption_fuzz():
    """Single-byte corruptions anywhere in a sampled AVI must never make
    the slicer raise or emit an out-of-bounds slice."""
    from mr_dice_spark.multimodal.codecs import avi_sample_slices, encode_avi_stub

    samples = [bytes([i]) * (3 + i % 7) for i in range(9)]
    p = encode_avi_stub(64, 64, 0, 25.0, samples=samples)
    for off in range(0, len(p), 3):
        for flip in (0x01, 0xFF):
            mutated = bytearray(p)
            mutated[off] ^= flip
            mb = bytes(mutated)
            sl = avi_sample_slices(mb)  # must not raise
            if sl is not None:
                assert all(o >= 0 and s >= 0 and o + s <= len(mb) for o, s in sl), (off, flip)


def test_average_hash_properties_and_dedup(spark):
    """aHash: uniform images hash to all-zeros (integer threshold is
    strict); a pixel-doubled upscale of the same image hashes identically
    (re-encode/resolution-invariance — the property that makes it a
    dedup key); undecodable payloads keep a NULL hash and stay canonical
    rather than collapsing together."""
    import numpy as np

    from mr_dice_spark.multimodal.codecs import average_hash_bits, encode_bmp
    from mr_dice_spark.multimodal.ops import image_dedup_ahash

    rng = np.random.RandomState(3)
    base = rng.randint(0, 256, (8, 8, 3), dtype=np.uint8)
    assert average_hash_bits(np.full((8, 8, 3), 7, dtype=np.uint8)) == "0" * 64
    up = base.repeat(2, axis=0).repeat(2, axis=1)  # 16x16 pixel-doubled
    assert average_hash_bits(base) == average_hash_bits(up)
    # gray (2-D) path scales the single channel
    g = rng.randint(0, 256, (8, 8), dtype=np.uint8)
    assert len(average_hash_bits(g)) == 64

    df = spark.createDataFrame(
        [
            (1, encode_bmp(base)),
            (2, encode_bmp(up)),          # near-dup of 1 -> not canonical
            (3, b"not an image at all"),  # NULL hash, canonical
            (4, None),                    # NULL payload, canonical
        ],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in image_dedup_ahash(df).collect()}
    assert rows[1]["ahash_bits"] == rows[2]["ahash_bits"] is not None
    assert rows[1]["is_canonical"] and not rows[2]["is_canonical"]
    assert rows[3]["ahash_bits"] is None and rows[3]["is_canonical"]
    assert rows[4]["ahash_bits"] is None and rows[4]["is_canonical"]


def test_avi_sample_slices_rec_groups_and_stream_selection():
    """Interleaved AVIs wrap frame runs in 'LIST rec ' groups and may
    carry multiple streams; the walk must descend into rec groups (no
    mid-list index gaps) and keep only the FIRST dc/db stream id so the
    index stays aligned with the probe's frame count (review findings)."""
    import struct

    from mr_dice_spark.multimodal.codecs import avi_sample_slices, encode_avi_stub

    def chunk(fourcc, body):
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(kind, body):
        return b"LIST" + struct.pack("<I", 4 + len(body)) + kind + body

    header = encode_avi_stub(64, 64, 3, 25.0)  # hdrl only (no movi)
    # movi: [rec [00dc 'AAAA'][01wb audio]][00dc 'BBB'][01dc 'ZZ'][rec [00dc 'CC']]
    movi_body = (
        lst(b"rec ", chunk(b"00dc", b"AAAA") + chunk(b"01wb", b"au"))
        + chunk(b"00dc", b"BBB")
        + chunk(b"01dc", b"ZZ")      # second video stream: excluded
        + lst(b"rec ", chunk(b"00dc", b"CC"))
    )
    p = header + lst(b"movi", movi_body)
    # patch the RIFF size to cover the appended movi
    p = p[:4] + struct.pack("<I", len(p) - 8) + p[8:]
    sl = avi_sample_slices(p)
    assert [p[o : o + s] for o, s in sl] == [b"AAAA", b"BBB", b"CC"]
    # a LIST declaring a sub-4-byte body whose FOLLOWING bytes spell
    # 'movi' must not be adopted as the movi list (size >= 4 guard);
    # the walk advances past it and finds the real movi
    decoy = header + b"LIST" + struct.pack("<I", 2) + b"mo" + lst(
        b"movi", chunk(b"00dc", b"REAL")
    )
    decoy = decoy[:4] + struct.pack("<I", len(decoy) - 8) + decoy[8:]
    sl2 = avi_sample_slices(decoy)
    assert sl2 is not None and [decoy[o : o + s] for o, s in sl2] == [b"REAL"]


def test_image_dedup_ahash_null_rows_avoid_window(spark):
    """NULL-hash rows must not enter the dedup window (straggler hazard);
    plan check: the window input filters on ahash_bits IS NOT NULL."""
    from mr_dice_spark.multimodal import ahash_images, image_dedup_ahash  # re-export

    df = spark.createDataFrame(
        [(1, b"junk1"), (2, b"junk2")], "media_id long, payload binary"
    )
    out = image_dedup_ahash(df)
    rows = {r["media_id"]: r for r in out.collect()}
    assert all(r["ahash_bits"] is None and r["is_canonical"] for r in rows.values())
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "isnotnull(ahash_bits" in plan


def test_avi_sample_slices_declared_frame_count_cap():
    """avih's nonzero frame count bounds the movi walk (ADVICE r3), by
    TRUNCATION: dwTotalFrames is advisory and real muxers understate it,
    so extra chunks are dropped (indexes stay probe-aligned) rather than
    the whole file rejected; declared == actual and declared == 0
    (unknown) round-trip in full."""
    from mr_dice_spark.multimodal.codecs import avi_sample_slices, encode_avi_stub

    pieces = [b"f0", b"f1", b"f2", b"f3"]
    honest = encode_avi_stub(64, 64, 4, 25.0, samples=pieces)
    sl = avi_sample_slices(honest)
    assert [honest[o : o + s] for o, s in sl] == pieces
    # the stub forces n_frames = len(samples); patch dwTotalFrames (16
    # bytes into the avih body) down to 2 to forge an understating header
    import struct

    lying = bytearray(honest)
    struct.pack_into("<I", lying, honest.find(b"avih") + 8 + 16, 2)
    cut = avi_sample_slices(bytes(lying))
    assert [bytes(lying)[o : o + s] for o, s in cut] == pieces[:2]
    # and up to 0 = unknown: the cap falls back to len(payload)//8
    struct.pack_into("<I", lying, honest.find(b"avih") + 8 + 16, 0)
    assert len(avi_sample_slices(bytes(lying))) == 4


# ---------------------------------------------------------------------------
# baseline JPEG codec (multimodal/jpeg.py)
# ---------------------------------------------------------------------------


def test_jpeg_zigzag_is_the_standard_scan():
    """Regenerate the zigzag order algorithmically and compare — a wrong
    table would still round-trip (encoder and decoder share it) but the
    streams would not be conformant JPEG."""
    from mr_dice_spark.multimodal.jpeg import _ZIGZAG

    expect, r, c, up = [], 0, 0, True
    for _ in range(64):
        expect.append((r, c))
        if up:
            if c == 7:
                r, up = r + 1, False
            elif r == 0:
                c, up = c + 1, False
            else:
                r, c = r - 1, c + 1
        else:
            if r == 7:
                c, up = c + 1, True
            elif c == 0:
                r, up = r + 1, True
            else:
                r, c = r + 1, c - 1
    assert _ZIGZAG == expect


def test_jpeg_block_constant_roundtrip_is_exact():
    import numpy as np

    from mr_dice_spark.multimodal.jpeg import (
        decode_jpeg_pixels,
        encode_jpeg_baseline,
    )

    img = np.zeros((16, 24), dtype=np.uint8)
    vals = iter([0, 17, 64, 127, 128, 255])
    for by in range(2):
        for bx in range(3):
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = next(vals)
    for rst in (0, 1, 2):
        dec = decode_jpeg_pixels(encode_jpeg_baseline(img, restart_interval=rst))
        assert dec.shape == (16, 24, 1)
        assert np.array_equal(dec[:, :, 0], img), f"rst={rst}"


def test_jpeg_roundtrip_error_bounds():
    """quant=1 keeps every coefficient: reconstruction error is pure
    float/rounding noise (<=1); a 16x quant table stays within its
    quantization radius on smooth content."""
    import numpy as np

    from mr_dice_spark.multimodal.jpeg import (
        decode_jpeg_pixels,
        encode_jpeg_baseline,
    )

    rng = np.random.default_rng(42)
    gray = rng.integers(0, 256, (21, 35), dtype=np.uint8)
    dec = decode_jpeg_pixels(encode_jpeg_baseline(gray))
    assert dec.shape == (21, 35, 1)
    assert np.abs(dec[:, :, 0].astype(int) - gray.astype(int)).max() <= 1

    rgb = rng.integers(0, 256, (13, 19, 3), dtype=np.uint8)
    dec = decode_jpeg_pixels(encode_jpeg_baseline(rgb))
    assert dec.shape == (13, 19, 3)
    assert np.abs(dec.astype(int) - rgb.astype(int)).max() <= 2  # colorspace trip

    x = np.linspace(0, 255, 40)
    smooth = np.clip(np.round(np.add.outer(x, x) / 2), 0, 255).astype(np.uint8)
    q = np.full((8, 8), 16)
    dec = decode_jpeg_pixels(encode_jpeg_baseline(smooth, quant=q))
    assert np.abs(dec[:, :, 0].astype(int) - smooth.astype(int)).max() <= 16


def test_jpeg_subsampling_420_geometry_and_bounds():
    import numpy as np

    from mr_dice_spark.multimodal.jpeg import (
        decode_jpeg_pixels,
        encode_jpeg_baseline,
    )

    # odd dims force both chroma padding and MCU-grid cropping
    x = np.linspace(0, 250, 33)
    y = np.linspace(0, 250, 41)
    base = np.clip(np.round(np.add.outer(x, y) / 2), 0, 255)
    img = np.stack([base, base[::-1], np.fliplr(base)], axis=2).astype(np.uint8)
    dec = decode_jpeg_pixels(
        encode_jpeg_baseline(img, subsampling="420", restart_interval=3)
    )
    assert dec.shape == (33, 41, 3)
    # gradient content: replicate-upsample of box-averaged chroma moves a
    # pixel by at most ~2 chroma steps of the gradient
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 12


def test_jpeg_unsupported_and_corrupt_payloads_return_none():
    import numpy as np

    from mr_dice_spark.multimodal.jpeg import (
        decode_jpeg_pixels,
        encode_jpeg_baseline,
    )

    img = np.full((8, 8), 77, dtype=np.uint8)
    enc = bytearray(encode_jpeg_baseline(img))
    # flip SOF0 to SOF3 (lossless): out of the supported envelope
    i = enc.find(b"\xff\xc0")
    lossless = bytes(enc[:i]) + b"\xff\xc3" + bytes(enc[i + 2 :])
    assert decode_jpeg_pixels(lossless) is None
    # flip SOF0 to SOF2 (progressive) WITHOUT restructuring the scans:
    # a baseline-shaped SOS (Ss=0, Se=63) is malformed progressive — the
    # decoder must fail closed, not misread the baseline scan
    malformed = bytes(enc[:i]) + b"\xff\xc2" + bytes(enc[i + 2 :])
    assert decode_jpeg_pixels(malformed) is None
    # truncate mid-scan: fail closed
    assert decode_jpeg_pixels(bytes(enc[: len(enc) - 10])) is None
    # not a JPEG at all
    assert decode_jpeg_pixels(b"plain text") is None
    assert decode_jpeg_pixels(None) is None


def test_jpeg_decode_pixels_routing_and_probe_agreement():
    """codecs.decode_pixels must route JPEG to the real decoder and agree
    with real_probe_image on geometry."""
    import numpy as np

    from mr_dice_spark.multimodal.codecs import decode_pixels, real_probe_image
    from mr_dice_spark.multimodal.jpeg import encode_jpeg_baseline

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (10, 14, 3), dtype=np.uint8)
    enc = encode_jpeg_baseline(img)
    probe = real_probe_image(enc)
    dec = decode_pixels(enc)
    assert probe["format"] == "jpeg"
    assert dec.shape == (probe["height"], probe["width"], probe["channels"])
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2


def test_jpeg_decoder_determinism():
    import numpy as np

    from mr_dice_spark.multimodal.jpeg import (
        decode_jpeg_pixels,
        encode_jpeg_baseline,
    )

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (17, 9), dtype=np.uint8)
    enc1 = encode_jpeg_baseline(img)
    enc2 = encode_jpeg_baseline(img)
    assert enc1 == enc2
    assert np.array_equal(decode_jpeg_pixels(enc1), decode_jpeg_pixels(enc2))


def test_jpeg_flows_through_resize_and_features(spark):
    """decode_pixels routing means resize_images and image_features get
    REAL pixels from JPEG payloads with no op-level changes — the chain
    JPEG -> decode -> nearest resize -> BMP re-encode -> features must
    produce the same features as the equivalent BMP input."""
    import numpy as np

    from mr_dice_spark.multimodal.codecs import encode_bmp
    from mr_dice_spark.multimodal.jpeg import encode_jpeg_baseline
    from mr_dice_spark.multimodal.ops import image_features, resize_images

    img = np.zeros((16, 16), dtype=np.uint8)
    for by in range(2):
        for bx in range(2):
            img[by * 8 :, bx * 8 :][:8, :8] = 30 + 60 * (2 * by + bx)
    # block-constant -> JPEG decode is bit-exact -> gray x3 equals RGB BMP
    jp = encode_jpeg_baseline(img, restart_interval=1)
    bm = encode_bmp(np.repeat(img[:, :, None], 3, axis=2))
    df = spark.createDataFrame(
        [(1, bytearray(jp)), (2, bytearray(bm))], "media_id long, payload binary"
    )
    rs = resize_images(df, 8, 8, id_cols=["media_id"])
    geo = {r["media_id"]: (r["width"], r["height"]) for r in rs.collect()}
    assert geo == {1: (8, 8), 2: (8, 8)}
    feats = {
        r["media_id"]: r["embedding"]
        for r in image_features(df).select("media_id", "embedding").collect()
    }
    assert feats[1] == feats[2]


# ---------------------------------------------------------------------------
# progressive JPEG (SOF2) decode — multimodal/jpeg.py _ProgressiveState
# ---------------------------------------------------------------------------


def test_jpeg_progressive_equals_baseline_exactly():
    """Progressive and baseline encodings of the same image carry the
    SAME quantized coefficients through entirely different entropy
    structures (spectral bands, successive approximation, EOB runs vs
    one sequential scan) — the decoded pixels must be byte-identical."""
    import numpy as np

    from mr_dice_spark.multimodal.jpeg import (
        decode_jpeg_pixels,
        encode_jpeg_baseline,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(11)
    cases = [
        (rng.integers(0, 256, (16, 16), dtype=np.uint8), "444", 0),
        (rng.integers(0, 256, (17, 9), dtype=np.uint8), "444", 0),  # gray, ragged
        (rng.integers(0, 256, (24, 40, 3), dtype=np.uint8), "444", 0),
        (rng.integers(0, 256, (24, 40, 3), dtype=np.uint8), "420", 0),
        (rng.integers(0, 256, (19, 21, 3), dtype=np.uint8), "420", 2),  # RSTn
        (rng.integers(0, 256, (32, 8), dtype=np.uint8), "444", 1),
    ]
    for img, sub, rst in cases:
        base = decode_jpeg_pixels(
            encode_jpeg_baseline(img, subsampling=sub, restart_interval=rst)
        )
        prog = decode_jpeg_pixels(
            encode_jpeg_progressive(img, subsampling=sub, restart_interval=rst)
        )
        assert prog is not None and base is not None
        assert np.array_equal(prog, base), (img.shape, sub, rst)


def test_jpeg_progressive_quantized_and_smooth_content():
    """With a real (non-flat) quantization table many AC coefficients
    shrink to the 1-3 range that only materializes in the refinement
    scans (successive approximation newly-nonzero path) — and long zero
    tails exercise EOB-run accounting across blocks."""
    import numpy as np

    from mr_dice_spark.multimodal.jpeg import (
        decode_jpeg_pixels,
        encode_jpeg_baseline,
        encode_jpeg_progressive,
    )

    y, x = np.mgrid[0:24, 0:40]
    smooth = ((np.sin(x / 5.0) + np.cos(y / 7.0)) * 60 + 128).astype(np.uint8)
    rgb = np.stack([smooth, smooth.T[:24, :40] if False else smooth, 255 - smooth], axis=2)
    q = np.clip(np.arange(64).reshape(8, 8) * 2 + 1, 1, 255)
    for img, sub in [(smooth, "444"), (rgb, "444"), (rgb, "420")]:
        base = decode_jpeg_pixels(encode_jpeg_baseline(img, quant=q, subsampling=sub))
        prog = decode_jpeg_pixels(
            encode_jpeg_progressive(img, quant=q, subsampling=sub)
        )
        assert np.array_equal(prog, base)


def test_jpeg_progressive_block_constant_is_bit_exact():
    """DC-only content with a flat-1 quant table round-trips EXACTLY
    through the progressive path (DC first scan at Al=1 + DC refine),
    the same exactness window the baseline golden relies on."""
    import numpy as np

    from mr_dice_spark.multimodal.jpeg import (
        decode_jpeg_pixels,
        encode_jpeg_progressive,
    )

    img = np.zeros((16, 16), dtype=np.uint8)
    for i, v in enumerate([13, 250, 128, 77]):
        img[(i // 2) * 8 :, (i % 2) * 8 :][:8, :8] = v
    dec = decode_jpeg_pixels(encode_jpeg_progressive(img, restart_interval=2))
    assert np.array_equal(dec[:, :, 0], img)


def test_jpeg_progressive_determinism_and_probe():
    import numpy as np

    from mr_dice_spark.multimodal.codecs import real_probe_image
    from mr_dice_spark.multimodal.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, (11, 13, 3), dtype=np.uint8)
    enc1 = encode_jpeg_progressive(img)
    enc2 = encode_jpeg_progressive(img)
    assert enc1 == enc2
    assert real_probe_image(enc1) == {
        "width": 13, "height": 11, "channels": 3, "format": "jpeg"
    }


def test_jpeg_progressive_truncated_fails_closed():
    import numpy as np

    from mr_dice_spark.multimodal.jpeg import (
        decode_jpeg_pixels,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    enc = encode_jpeg_progressive(img)
    assert decode_jpeg_pixels(enc[: len(enc) - 12]) is None


# ---------------------------------------------------------------------------
# GIF codec (multimodal/gif.py) — lossless LZW, byte-exact round-trips
# ---------------------------------------------------------------------------


def test_gif_roundtrip_byte_exact_incl_interlace_and_saturation():
    """GIF is lossless: any <=256-color image round-trips BYTE-EXACT,
    including interlaced storage and images large enough to saturate the
    4096-entry LZW table (forcing mid-stream CLEAR resets)."""
    import numpy as np

    from mr_dice_spark.multimodal.gif import decode_gif_pixels, encode_gif

    rng = np.random.default_rng(31)
    pal = rng.integers(0, 256, (17, 3), dtype=np.uint8)
    for shape, inter in [((1, 1), False), ((9, 13), False), ((9, 13), True),
                         ((33, 7), True)]:
        img = pal[rng.integers(0, 17, shape)]
        dec = decode_gif_pixels(encode_gif(img, interlace=inter))
        assert np.array_equal(dec, img), (shape, inter)
    big = pal[rng.integers(0, 17, (150, 320))]
    assert np.array_equal(decode_gif_pixels(encode_gif(big)), big)
    # 256-color edge and 2-color edge
    pal256 = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    img = pal256[np.arange(256).reshape(16, 16)]
    assert np.array_equal(decode_gif_pixels(encode_gif(img)), img)
    two = np.where(rng.integers(0, 2, (8, 8, 1)).astype(bool), 255, 0).astype(np.uint8)
    dec = decode_gif_pixels(encode_gif(two[:, :, 0]))
    assert np.array_equal(dec[:, :, 0], two[:, :, 0])


def test_gif_unsupported_and_corrupt_fail_closed():
    import numpy as np
    import pytest

    from mr_dice_spark.multimodal.gif import decode_gif_pixels, encode_gif

    rng = np.random.default_rng(3)
    img = rng.integers(0, 2, (10, 10), dtype=np.uint8) * 200
    enc = bytearray(encode_gif(img))
    assert decode_gif_pixels(bytes(enc[: len(enc) - 6])) is None  # truncated
    assert decode_gif_pixels(b"GIF89a") is None
    assert decode_gif_pixels(b"plain text that is long enough") is None
    assert decode_gif_pixels(None) is None
    # partial frame (animation compositing) is out of scope: shrink the
    # image descriptor's width field
    at = bytes(enc).index(b"\x2c")
    mod = bytearray(enc)
    mod[at + 5] = mod[at + 5] - 1  # w low byte
    assert decode_gif_pixels(bytes(mod)) is None
    with pytest.raises(ValueError, match="256"):
        encode_gif(rng.integers(0, 256, (32, 32, 3), dtype=np.uint8))


def test_gif_probe_and_decode_pixels_dispatch():
    import numpy as np

    from mr_dice_spark.multimodal.codecs import decode_pixels, real_probe_image
    from mr_dice_spark.multimodal.gif import encode_gif

    rng = np.random.default_rng(5)
    pal = np.array([[10, 20, 30], [200, 100, 0], [5, 5, 5]], dtype=np.uint8)
    img = pal[rng.integers(0, 3, (11, 17))]
    enc = encode_gif(img)
    assert real_probe_image(enc) == {
        "width": 17, "height": 11, "channels": 3, "format": "gif"
    }
    assert np.array_equal(decode_pixels(enc), img)


def test_tiff_probe_both_endians_and_fail_closed():
    """real_probe_image walks a classic TIFF's first IFD in either byte
    order; truncated or geometry-less TIFFs fail closed to the stub."""
    from mr_dice_spark.multimodal.codecs import encode_tiff_stub, real_probe_image

    for be in (False, True):
        p = encode_tiff_stub(640, 480, 3, big_endian=be)
        assert real_probe_image(p) == {
            "width": 640, "height": 480, "channels": 3, "format": "tiff"
        }, be
    gray = encode_tiff_stub(12, 7, 1)
    assert real_probe_image(gray)["channels"] == 1
    p = encode_tiff_stub(640, 480)
    assert real_probe_image(p[:9]) is None          # truncated IFD
    assert real_probe_image(b"II*\x00\xff\xff\xff\xff") is None  # wild offset
    # IFD without geometry tags
    import struct
    bad = b"II*\x00" + struct.pack("<I", 8) + struct.pack("<H", 1) \
        + struct.pack("<HHI", 277, 4, 1) + struct.pack("<I", 3) + struct.pack("<I", 0)
    assert real_probe_image(bad) is None


def test_mp3_probe_frame_walk_and_dispatch():
    """real_probe_mp3 walks consecutive Layer III frame headers (with or
    without an ID3v2 tag), reports exact sample counts, demands >= 2
    frames so binary noise with one sync bigram stays on the stub path,
    and stops cleanly at truncation."""
    from mr_dice_spark.multimodal.codecs import (
        decode_audio,
        encode_mp3_stub,
        fake_decode_audio,
        real_probe_mp3,
    )

    p = encode_mp3_stub(n_frames=10, bitrate_kbps=128, sample_rate=44100)
    got = real_probe_mp3(p)
    assert got == {
        "sample_rate": 44100, "n_samples": 11520, "n_channels": 2,
        "format": "mp3",
    }
    assert decode_audio(p) == got  # dispatch takes the real path
    # ID3v2 tag skipped; mono flag honored
    q = encode_mp3_stub(n_frames=3, stereo=False, id3_size=57)
    gq = real_probe_mp3(q)
    assert gq["n_channels"] == 1 and gq["n_samples"] == 3 * 1152
    # one lone frame: not claimed
    assert real_probe_mp3(encode_mp3_stub(n_frames=1)) is None
    # truncation mid-frame reports only the complete frames
    cut = real_probe_mp3(p[: len(p) - 10])
    assert cut is not None and cut["n_samples"] == 9 * 1152
    # arbitrary text and a fake 0xFF sync in noise -> stub path
    assert real_probe_mp3(b"not audio at all, just text bytes") is None
    assert decode_audio(b"\xff\xfbxx" + b"z" * 50) == fake_decode_audio(b"\xff\xfbxx" + b"z" * 50)


def test_wav_samples_roundtrip_and_bounds():
    np = pytest.importorskip("numpy")
    from mr_dice_spark.multimodal.codecs import encode_wav, wav_samples

    vals = [0, 1, -1, 32767, -32768, 1234]
    got = wav_samples(encode_wav(vals, rate=8000, bits=16))
    assert got.tolist() == vals
    # 8-bit path (stored offset-128)
    got8 = wav_samples(encode_wav([0, 127, -128], rate=8000, bits=8))
    assert got8.tolist() == [0, 127, -128]
    # odd-length 8-bit data chunk is word-aligned without corrupting samples
    got8b = wav_samples(encode_wav([5, -5, 9], rate=8000, bits=8))
    assert got8b.tolist() == [5, -5, 9]
    assert wav_samples(b"not a wav") is None
    # stereo payloads yield the first channel
    import struct
    frames = b"".join(struct.pack("<hh", i, -i) for i in (3, 7, 11))
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(frames)) + frames)
    stereo = b"RIFF" + struct.pack("<I", len(body)) + body
    assert wav_samples(stereo).tolist() == [3, 7, 11]


def test_audio_tone_powers_finds_planted_bin(spark):
    np = pytest.importorskip("numpy")
    from mr_dice_spark.multimodal.codecs import encode_wav
    from mr_dice_spark.multimodal.ops import audio_tone_powers

    def square(k, amp=8000, n=256):
        return encode_wav(
            [amp if (k * i) % n < n // 2 else -amp for i in range(n)], rate=8000
        )

    rows = [
        ("a", square(5)),
        ("b", square(20)),
        ("short", encode_wav([1, 2, 3], rate=8000)),   # < n_fft -> NULL
        ("junk", b"\x00\x01\x02not audio at all" * 10),  # non-WAV -> NULL
        ("none", None),
    ]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    out = {
        r["media_id"]: (r["bin_powers"], r["n_used"])
        for r in audio_tone_powers(df, bins=[5, 20], n_fft=256).collect()
    }
    pa, _ = out["a"]
    pb, _ = out["b"]
    assert pa[0] > 100 * pa[1] and pb[1] > 100 * pb[0]
    assert out["a"][1] == 256
    for k in ("short", "junk", "none"):
        assert out[k] == (None, None)


def test_encode_png_filter_cycle_roundtrip_and_validation():
    """encode_png must round-trip bit-exact through decode_pixels for
    EVERY individual filter type and the default 5-filter cycle, on
    grayscale and RGB, square and asymmetric shapes; bad inputs fail
    fast."""
    import numpy as np
    import pytest

    from mr_dice_spark.multimodal.codecs import decode_pixels, encode_png

    rng = np.random.RandomState(11)
    for shape in ((8, 8, 3), (5, 11), (16, 3, 3), (1, 1)):
        img = rng.randint(0, 256, shape).astype(np.uint8)
        ref = img if img.ndim == 3 else img[:, :, None]
        for cyc in ((0,), (1,), (2,), (3,), (4,), (0, 1, 2, 3, 4)):
            dec = decode_pixels(encode_png(img, cyc))
            assert dec is not None and dec.shape == ref.shape
            assert (dec == ref).all(), (shape, cyc)
    with pytest.raises(ValueError, match="channel count"):
        encode_png(rng.randint(0, 256, (4, 4, 4)).astype(np.uint8))
    with pytest.raises(ValueError, match="filter_cycle"):
        encode_png(rng.randint(0, 256, (4, 4)).astype(np.uint8), (7,))
