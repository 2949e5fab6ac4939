"""Multimodal plumbing tests: the Spark side (schemas, batching, error rows,
frame explosion) is real; codecs are stubbed per the environment."""

import pytest
from pyspark.sql import functions as F

from database_migration_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    attach_media_metadata,
    extract_features,
    resize_stub,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, b"\x89PNG\r\n" + b"x" * 100, "image", 64, 64, None, "png"),
        (2, b"RIFF" + b"y" * 200, "audio", None, None, 3000, "wav"),
        (3, b"\x00\x00\x00 ftyp" + b"z" * 300, "video", 320, 240, 10000, "mp4"),
        (4, None, "image", None, None, None, None),  # broken row
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_metadata_jvm_side(spark, media):
    out = attach_media_metadata(media)
    m = {r.media_id: r for r in out.collect()}
    assert m[1].n_bytes == 106
    assert m[1].container_magic == "89504E47"  # PNG magic
    assert m[2].container_magic == "52494646"  # RIFF


def test_extract_features_deterministic_and_isolated(spark, media):
    out = extract_features(media).collect()
    by_id = {r.media_id: r for r in out}
    assert len(out) == 4
    assert by_id[1].error is None and len(by_id[1].feature) == 8
    # deterministic: same payload -> same feature
    again = {r.media_id: r for r in extract_features(media).collect()}
    assert again[1].feature == by_id[1].feature
    assert by_id[1].sha256 != by_id[2].sha256
    # null payload handled as empty, not a crash
    assert by_id[4].error is None


def test_extract_features_error_rows(spark, media):
    def bad_decoder(payload, mtype):
        if mtype == "audio":
            raise ValueError("unsupported codec")
        return [0.0]

    out = {r.media_id: r for r in extract_features(media, decoder=bad_decoder).collect()}
    assert out[2].error and "unsupported codec" in out[2].error
    assert out[1].error is None


def test_resize_stub_is_loud(spark, media):
    out = resize_stub(media.where(F.col("payload").isNotNull()), 32, 32).collect()
    assert all(r.error and "NotImplementedError" in r.error for r in out)


def test_sample_frames_explosion(spark, media):
    frames = sample_frames(media.where(F.col("duration_ms").isNotNull()), every_ms=1000)
    per = {
        r.media_id: r.n for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    }
    assert per[2] == 3  # 3000ms / 1000
    assert per[3] == 10
    first = frames.where((F.col("media_id") == 3) & (F.col("frame_idx") == 4)).collect()[0]
    assert first.ts_ms == 4000


def _png(w, h):
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    chunk = struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
    chunk += struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    return b"\x89PNG\r\n\x1a\n" + chunk


def _bmp(w, h):
    import struct

    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, 0, 2835, 2835, 0, 0)
    header = b"BM" + struct.pack("<IHHI", 54, 0, 0, 54)
    return header + info


def _gif(w, h):
    import struct

    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 5


def _wav(duration_ms, rate=8000, channels=1, bits=16, canonical=True):
    import struct

    byte_rate = rate * channels * bits // 8
    data_size = byte_rate * duration_ms // 1000
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, channels, rate, byte_rate, channels * bits // 8, bits
    )
    data = b"data" + struct.pack("<I", data_size) + b"\x00" * data_size
    if canonical:
        body = fmt + data
    else:
        # a LIST chunk before fmt — legal WAV the fixed-offset JVM path
        # must NULL and the chunk-walking parser must still handle
        body = b"LIST" + struct.pack("<I", 4) + b"INFO" + fmt + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_container_header_parsing_real_dimensions(spark):
    """Round-6 de-stub: PNG/BMP/GIF dims and WAV duration parse for REAL
    from synthesized container fixtures — JVM fixed-offset path and the
    stdlib chunk-walking parser agree; the chunk-reordered WAV is NULL on
    the JVM fast path but parsed by the Python walk."""
    from database_migration_spark.operators.multimodal import (
        extract_media_metadata,
        parse_container_header,
    )

    rows = [
        (1, _png(640, 480), "image", None, None, None, None),
        (2, _bmp(320, 200), "image", None, None, None, None),
        (3, _gif(99, 44), "image", None, None, None, None),
        (4, _wav(2500), "audio", None, None, None, None),
        (5, _wav(1250, canonical=False), "audio", None, None, None, None),
        (6, b"not a container at all", "blob", None, None, None, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)

    # pure-Python parser ground truth
    p = parse_container_header
    assert p(_png(640, 480))["width"] == 640
    assert p(_png(640, 480))["height"] == 480
    assert p(_bmp(320, 200)) == {"container": "bmp", "width": 320,
                                 "height": 200, "duration_ms": None,
                                 "codec": "bmp"}
    assert p(_gif(99, 44))["width"] == 99
    wav = p(_wav(2500))
    assert wav["duration_ms"] == 2500 and wav["codec"] == "pcm"
    assert wav["sample_rate"] == 8000 and wav["channels"] == 1
    assert p(_wav(1250, canonical=False))["duration_ms"] == 1250
    assert p(b"junk") is None

    # JVM fixed-offset path (no Python in the plan)
    jvm = {r.media_id: r for r in attach_media_metadata(media).collect()}
    assert (jvm[1].sniffed_type, jvm[1].sniffed_width, jvm[1].sniffed_height) \
        == ("png", 640, 480)
    assert (jvm[2].sniffed_type, jvm[2].sniffed_width, jvm[2].sniffed_height) \
        == ("bmp", 320, 200)
    assert (jvm[3].sniffed_type, jvm[3].sniffed_width, jvm[3].sniffed_height) \
        == ("gif", 99, 44)
    assert jvm[4].sniffed_type == "wav" and jvm[4].sniffed_duration_ms == 2500
    # reordered chunks: recognized as wav, duration deliberately NULL
    assert jvm[5].sniffed_type == "wav" and jvm[5].sniffed_duration_ms is None
    assert jvm[6].sniffed_type is None

    # robust mapInPandas path handles the reordered WAV too
    meta = {r.media_id: r for r in extract_media_metadata(media).collect()}
    assert (meta[1].width, meta[1].height) == (640, 480)
    assert meta[4].duration_ms == 2500
    assert meta[5].duration_ms == 1250 and meta[5].container == "wav"
    assert meta[6].container is None and "unrecognized" in meta[6].error


def test_default_decoder_uses_real_header_features(spark):
    """extract_features' default decoder featurizes on REAL header fields
    when the container parses (width/height/duration lead the vector) and
    falls back to digest features otherwise."""
    rows = [
        (1, _png(640, 480), "image", None, None, None, None),
        (2, b"opaque blob", "blob", None, None, None, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r for r in extract_features(media).collect()}
    assert out[1].feature[0] == 640.0 and out[1].feature[1] == 480.0
    assert len(out[1].feature) == 8 and len(out[2].feature) == 8
    assert out[1].error is None and out[2].error is None


def test_truncated_container_dims_null(spark):
    """A payload truncated after the magic must sniff its type but yield
    NULL dimensions — a partial field would otherwise parse into a
    plausible-but-wrong value (the low bytes of the true width)."""
    from database_migration_spark.operators.multimodal import (
        attach_media_metadata,
    )

    png_magic = bytes.fromhex("89504E470D0A1A0A")
    rows = [
        (1, png_magic + b"\x00" * 12),   # 20 bytes: magic ok, IHDR cut
        (2, b"BM" + b"\x00" * 10),       # 12-byte BMP stub
        (3, b"GIF89a"),                  # 6-byte GIF stub
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r.media_id: (r.sniffed_type, r.sniffed_width, r.sniffed_height)
           for r in attach_media_metadata(df).collect()}
    assert out[1] == ("png", None, None)
    assert out[2] == ("bmp", None, None)
    assert out[3] == ("gif", None, None)


# ---------------------------------------------------------------------------
# round 7: REAL pixel/sample decoding (stdlib-only BMP + PCM WAV de-stub)


def _bmp_px(pixels):
    """Build a real bottom-up 24-bit BMP from a top-to-bottom RGB grid."""
    import struct

    h, w = len(pixels), len(pixels[0])
    stride = (w * 3 + 3) & ~3
    body = b""
    for row in reversed(pixels):  # bottom-up storage
        raw = b"".join(bytes((b_, g, r)) for (r, g, b_) in row)  # BGR
        body += raw + b"\x00" * (stride - len(raw))
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                       2835, 2835, 0, 0)
    header = b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
    return header + info + body


def _wav_px(samples, rate=8000, bits=16):
    """Build a real PCM WAV around explicit sample values."""
    import struct

    if bits == 16:
        data = struct.pack(f"<{len(samples)}h", *samples)
    else:
        data = bytes(s + 128 for s in samples)
    byte_rate = rate * bits // 8
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, byte_rate,
                                bits // 8, bits)
    body = fmt + b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_bmp_pixel_decode_vs_independent_reference():
    """decode_bmp_pixels round-trips a synthesized 24-bit BMP exactly —
    differential vs an independent top-down int.from_bytes reference that
    shares no code with the operator."""
    from database_migration_spark.operators.multimodal import decode_bmp_pixels

    import struct

    grid = [
        [(255, 0, 0), (0, 255, 0), (0, 0, 255)],
        [(10, 20, 30), (40, 50, 60), (70, 80, 90)],
    ]
    payload = _bmp_px(grid)
    w, h, rows = decode_bmp_pixels(payload)
    assert (w, h) == (3, 2)
    assert rows == grid

    # independent reference: walk the file with raw offsets
    off = struct.unpack("<I", payload[10:14])[0]
    ww, hh = struct.unpack("<ii", payload[18:26])
    stride = (ww * 3 + 3) & ~3
    ref = []
    for ri in range(hh):
        base = off + (hh - 1 - ri) * stride
        ref.append([
            (payload[base + i * 3 + 2], payload[base + i * 3 + 1],
             payload[base + i * 3])
            for i in range(ww)
        ])
    assert rows == ref

    # top-down (negative height) layout decodes to the same logical grid
    neg = bytearray(payload)
    # rebuild body without the reversed() storage + height = -2
    top_body = b""
    for row in grid:
        raw = b"".join(bytes((b_, g, r)) for (r, g, b_) in row)
        top_body += raw + b"\x00" * (stride - len(raw))
    neg = payload[:54] + top_body
    neg = neg[:22] + struct.pack("<i", -2) + neg[26:]
    w2, h2, rows2 = decode_bmp_pixels(bytes(neg))
    assert (w2, h2) == (3, 2) and rows2 == grid

    # compressed/non-24bpp stays a loud plug-in seam
    import pytest as _pytest

    bad = payload[:28] + struct.pack("<H", 8) + payload[30:]
    with _pytest.raises(NotImplementedError, match="24-bit"):
        decode_bmp_pixels(bytes(bad))


def test_wav_sample_decode_vs_stdlib_wave_module():
    """decode_wav_samples agrees with the stdlib `wave` module (a genuinely
    independent reference decoder) on 16-bit PCM, and decodes 8-bit PCM
    with the unsigned->centered shift."""
    import io
    import struct
    import wave

    from database_migration_spark.operators.multimodal import decode_wav_samples

    samples = [0, 1000, -1000, 32767, -32768, 42, -42, 0]
    payload = _wav_px(samples, rate=16000, bits=16)
    rate, channels, got = decode_wav_samples(payload)
    assert (rate, channels) == (16000, 1)
    assert got == samples

    with wave.open(io.BytesIO(payload)) as wf:
        assert wf.getframerate() == 16000
        assert wf.getnchannels() == 1
        raw = wf.readframes(wf.getnframes())
    ref = list(struct.unpack(f"<{len(raw)//2}h", raw))
    assert got == ref

    # 8-bit: unsigned storage, centered output
    payload8 = _wav_px([-128, 0, 127], rate=8000, bits=8)
    rate8, _, got8 = decode_wav_samples(payload8)
    assert rate8 == 8000 and got8 == [-128, 0, 127]

    # non-PCM is a loud seam
    import pytest as _pytest

    float_fmt = bytearray(payload)
    float_fmt[20:22] = struct.pack("<H", 3)  # IEEE float tag
    with _pytest.raises(NotImplementedError, match="PCM"):
        decode_wav_samples(bytes(float_fmt))


def test_extract_features_true_content_statistics(spark):
    """The verdict #6 'done' check: extract_features with the stdlib
    content decoder returns TRUE pixel/sample statistics for BMP/WAV
    fixtures; compressed containers come back as error rows (the
    documented plug-in seam), never fake features."""
    from database_migration_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
        stdlib_content_decoder,
    )

    grid = [[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (255, 255, 255)]]
    samples = [0, 100, -100, 200]
    rows = [
        (1, _bmp_px(grid), "image", None, None, None, None),
        (2, _wav_px(samples, rate=8000, bits=16), "audio",
         None, None, None, None),
        # GIF is the remaining LZW seam (PNG decodes for real since round 8)
        (3, _gif(8, 8), "image", None, None, None, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {
        r.media_id: r
        for r in extract_features(media, decoder=stdlib_content_decoder).collect()
    }

    bmp = out[1]
    assert bmp.error is None
    f = [round(x, 3) for x in bmp.feature]
    # [w, h, n, mean_r, mean_g, mean_b, min_luma, max_luma]
    assert f[:3] == [2.0, 2.0, 4.0]
    assert f[3:6] == [127.5, 127.5, 127.5]  # each channel: 255 twice / 4
    assert f[6] == round(min(
        (299 * r + 587 * g + 114 * b) / 1000 for row in grid for r, g, b in row
    ), 3)
    assert f[7] == 255.0  # white pixel

    wav = out[2]
    assert wav.error is None
    g = [round(x, 3) for x in wav.feature]
    # [rate, channels, n, mean, min, max, rms, zero_crossings]
    assert g[:3] == [8000.0, 1.0, 4.0]
    assert g[3] == round(sum(samples) / 4, 3)
    assert (g[4], g[5]) == (-100.0, 200.0)
    assert g[7] == 2.0  # 100->-100 and -100->200

    gif = out[3]
    assert gif.feature is None
    assert "NotImplementedError" in gif.error and "compressed" in gif.error


# round 8: stdlib PNG pixel decode (verdict #5 — IDAT is zlib + five
# scanline filters; no codec library needed for non-interlaced 8-bit)


def _png_px(grid, ctype=2, filters=None, interlace=0, depth=8):
    """Reference PNG ENCODER (pure Python, independent of the decoder):
    applies the chosen scanline filter per row (forward direction — the
    decoder must invert it exactly), zlib-compresses, wraps in real
    chunks with CRCs."""
    import struct
    import zlib

    h = len(grid)
    w = len(grid[0]) if h else 0
    nch = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
    raw = bytearray()
    prev = bytes(w * nch)
    for ri, row in enumerate(grid):
        flat = bytes(
            v for px in row
            for v in (px if isinstance(px, (tuple, list)) else (px,))
        )
        ft = filters[ri % len(filters)] if filters else 0
        raw.append(ft)
        for i in range(len(flat)):
            a = flat[i - nch] if i >= nch else 0
            b = prev[i]
            c = prev[i - nch] if i >= nch else 0
            if ft == 0:
                v = flat[i]
            elif ft == 1:
                v = (flat[i] - a) & 0xFF
            elif ft == 2:
                v = (flat[i] - b) & 0xFF
            elif ft == 3:
                v = (flat[i] - ((a + b) >> 1)) & 0xFF
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = (flat[i] - pred) & 0xFF
            raw.append(v)
        prev = flat

    def chunk(typ, data):
        import struct as _s
        return (_s.pack(">I", len(data)) + typ + data
                + _s.pack(">I", zlib.crc32(typ + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def _test_grid(w, h, nch):
    # deterministic, gradient-ish so every filter produces distinct bytes
    return [
        [tuple((13 * x + 41 * y + 7 * ch) % 256 for ch in range(nch))
         for x in range(w)]
        for y in range(h)
    ]


def test_png_decode_inverts_every_filter_type():
    """One image, five encodings (rows cycling through filters 0-4 in one,
    then each filter exclusively): the decoder must reconstruct the SAME
    pixels from all of them — the filters are lossless re-encodings."""
    from database_migration_spark.operators.multimodal import decode_png_pixels

    grid = _test_grid(6, 5, 3)
    want = [[tuple(px) for px in row] for row in grid]
    for filters in ([0, 1, 2, 3, 4], [0], [1], [2], [3], [4]):
        w, h, nch, rows = decode_png_pixels(_png_px(grid, filters=filters))
        assert (w, h, nch) == (6, 5, 3), filters
        assert rows == want, f"filters={filters}"


def test_png_decode_grayscale_and_rgba():
    from database_migration_spark.operators.multimodal import decode_png_pixels

    gray = _test_grid(4, 3, 1)
    w, h, nch, rows = decode_png_pixels(
        _png_px(gray, ctype=0, filters=[2, 4])
    )
    assert (w, h, nch) == (4, 3, 1)
    assert rows == [[tuple(px) for px in row] for row in gray]

    rgba = _test_grid(5, 4, 4)
    w, h, nch, rows = decode_png_pixels(
        _png_px(rgba, ctype=6, filters=[1, 3, 4])
    )
    assert (w, h, nch) == (5, 4, 4)
    assert rows == [[tuple(px) for px in row] for row in rgba]


def test_png_decode_rejects_unsupported_variants():
    import pytest as _pytest

    from database_migration_spark.operators.multimodal import decode_png_pixels

    grid = _test_grid(3, 3, 3)
    with _pytest.raises(NotImplementedError, match="interlace"):
        decode_png_pixels(_png_px(grid, interlace=1))
    with _pytest.raises(NotImplementedError, match="depth=16"):
        decode_png_pixels(_png_px(grid, depth=16))
    with _pytest.raises(ValueError, match="not a PNG"):
        decode_png_pixels(b"BM" + b"\x00" * 60)
    # corrupt filter byte -> loud ValueError, never garbage pixels
    import struct
    import zlib
    raw = bytes([7]) + bytes(9)  # filter type 7 does not exist
    ihdr = struct.pack(">IIBBBBB", 3, 1, 8, 2, 0, 0, 0)

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data)))

    bad = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    with _pytest.raises(ValueError, match="filter"):
        decode_png_pixels(bad)


def test_png_features_match_bmp_features_for_same_pixels(spark):
    """Cross-container differential: the SAME pixel grid through the PNG
    path (zlib + filters) and the BMP path (raw bytes) must yield
    identical feature vectors — two independent decode pipelines, one
    truth."""
    from database_migration_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
        stdlib_content_decoder,
    )

    grid = [[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (255, 255, 255)]]
    rows = [
        (1, _bmp_px(grid), "image", None, None, None, None),
        (2, _png_px(grid, filters=[4]), "image", None, None, None, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {
        r.media_id: r
        for r in extract_features(
            media, decoder=stdlib_content_decoder
        ).collect()
    }
    assert out[1].error is None and out[2].error is None
    assert out[1].feature == out[2].feature


# round 11: perceptual image hashing + near-dup pairs


def test_encode_bmp_roundtrips_decode():
    import numpy as np

    from database_migration_spark.operators.multimodal import (
        decode_bmp_array,
        encode_bmp,
    )

    rng = np.random.RandomState(7)
    for w, h in ((16, 16), (9, 8), (33, 21)):  # incl. stride padding
        px = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        got_w, got_h, back = decode_bmp_array(encode_bmp(w, h, px))
        assert (got_w, got_h) == (w, h) and (back == px).all()


def _py_dhash(px):
    """Independent per-cell reference (explicit box loops — the
    operator uses whole-plane reduceat; agreement is the point)."""
    h, w = px.shape[0], px.shape[1]
    g = [
        [
            (int(px[y][x][0]) * 299 + int(px[y][x][1]) * 587
             + int(px[y][x][2]) * 114) // 1000
            for x in range(w)
        ]
        for y in range(h)
    ]
    means = [[0] * 9 for _ in range(8)]
    for r in range(8):
        for c in range(9):
            y0, y1 = r * h // 8, (r + 1) * h // 8
            x0, x1 = c * w // 9, (c + 1) * w // 9
            vals = [g[y][x] for y in range(y0, y1) for x in range(x0, x1)]
            means[r][c] = sum(vals) // len(vals)
    lo = hi = 0
    for r in range(8):
        for c in range(8):
            if means[r][c] > means[r][c + 1]:
                i = r * 8 + c
                if i < 32:
                    lo |= 1 << i
                else:
                    hi |= 1 << (i - 32)
    return lo, hi


def test_dhash_matches_independent_reference():
    import numpy as np

    from database_migration_spark.operators.multimodal import (
        dhash_halves,
        encode_bmp,
    )

    rng = np.random.RandomState(20260816)
    for w, h in ((16, 16), (9, 8), (37, 23), (64, 48)):
        px = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        assert dhash_halves(encode_bmp(w, h, px)) == _py_dhash(px)
    # too-small images raise, not hash
    import pytest as _pt

    with _pt.raises(ValueError, match="dhash grid"):
        dhash_halves(encode_bmp(8, 8, np.zeros((8, 8, 3), np.uint8)))


def test_image_near_dup_pairs_differential(spark):
    """The Spark path (mapInPandas dhash + banded Hamming join) must
    equal brute-force local hashing over the same payloads; planted
    perceptual near-dups pair up even though their BYTES (and sha256)
    differ; undecodable rows isolate as error rows, never failed
    tasks."""
    import numpy as np

    from database_migration_spark.operators.multimodal import (
        dhash_halves,
        encode_bmp,
        image_near_dup_pairs,
        perceptual_dhash,
    )

    rng = np.random.RandomState(11)
    payloads = {}
    for i in range(40):
        px = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
        payloads[i] = encode_bmp(16, 16, px)
        if i % 8 == 0:  # planted: +2 brightness band, bytes differ
            px2 = px.copy()
            px2[:4] = np.minimum(px2[:4].astype(np.int64) + 2, 255).astype(
                np.uint8
            )
            payloads[1000 + i] = encode_bmp(16, 16, px2)
    rows = [(k, bytearray(v)) for k, v in payloads.items()]
    rows += [(9999, bytearray(b"not an image"))]
    df = spark.createDataFrame(rows, "media_id LONG, payload BINARY")

    got = {
        (r.id_a, r.id_b): r.hamming
        for r in image_near_dup_pairs(df, max_hamming=3).collect()
    }
    # brute force over locally computed signatures
    sigs = {k: dhash_halves(v) for k, v in payloads.items()}
    want = {}
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d = bin(sigs[a][0] ^ sigs[b][0]).count("1") + bin(
                sigs[a][1] ^ sigs[b][1]
            ).count("1")
            if d <= 3:
                want[(a, b)] = d
    assert got == want
    for i in range(0, 40, 8):  # every planted pair found, bytes differ
        assert (i, 1000 + i) in got
        assert payloads[i] != payloads[1000 + i]
    # the undecodable payload is an error ROW with the cause named
    errs = {
        r.id: r.error
        for r in perceptual_dhash(df).where("error IS NOT NULL").collect()
    }
    assert set(errs) == {9999} and "container" in errs[9999]
