"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference flattens every complex type to text (README.md:123-127); a
training-data pipeline instead carries media as ``BinaryType`` payloads with
a typed metadata struct, and runs decode / feature-extraction / resize /
frame-sampling as Arrow-batched pandas stages over ``mapInPandas``.

Everything Spark-side here is real and tested: schemas, partitioning, UDF
signatures, batch shapes, error rows. Container-HEADER parsing is real too
(round-6): PNG/BMP/GIF dimensions and canonical-WAV duration parse
JVM-side from fixed spec offsets (:func:`attach_media_metadata`, pure
codegen over the binary column), and :func:`parse_container_header` /
:func:`extract_media_metadata` do the robust stdlib-``struct`` chunk walk
(reordered WAV chunks etc.). Only pixel/sample DECODING remains a plug-in
seam (``decoder=``/``resizer=`` take a PIL/ffmpeg/torchaudio callable in
production) because no media library exists in this environment; the
default feature decoder uses real header fields when the container
parses, digest features otherwise.

Scale notes:
- media rows are large → ``repartition`` by size budget, not row count;
  ``MEDIA_PARTITION_TARGET_BYTES`` keeps a partition's payloads inside
  executor memory (Arrow batches stream inside a partition, so the hard
  bound is per-batch, tuned with spark.sql.execution.arrow.maxRecordsPerBatch).
- decode is CPU-dominant → fan_out before mapInPandas;
- outputs (features/thumbnails) are small → the pipeline is a shrinking map,
  no shuffle at all unless the caller groups afterwards.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from database_migration_spark.functions.parallel import fan_out

MEDIA_SCHEMA = (
    "media_id BIGINT, payload BINARY, media_type STRING, "
    "width INT, height INT, duration_ms INT, codec STRING"
)

FEATURE_SCHEMA = (
    "media_id BIGINT, media_type STRING, n_bytes BIGINT, "
    "sha256 STRING, feature ARRAY<FLOAT>, error STRING"
)


def _be(p, off: int, n: int):
    """Big-endian unsigned int from ``n`` bytes at 1-based ``off`` — pure
    codegen (hex → conv), no Python."""
    return F.conv(F.hex(F.substring(p, off, n)), 16, 10).cast("long")


def _le(p, off: int, n: int):
    """Little-endian unsigned int: per-byte hex re-concatenated reversed."""
    parts = [F.hex(F.substring(p, off + i, 1)) for i in range(n - 1, -1, -1)]
    return F.conv(F.concat(*parts), 16, 10).cast("long")


def attach_media_metadata(
    df: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """JVM-side metadata that needs no codec: byte length, container magic,
    and REAL dimensions parsed from fixed-offset container headers — all
    whole-stage-codegen expressions over the binary column, no Python.

    Fixed offsets are spec-guaranteed for the parsed fields: PNG's IHDR
    must be the first chunk (width/height big-endian at bytes 17/21), BMP's
    BITMAPINFOHEADER puts biWidth/biHeight little-endian at 19/23 (negative
    biHeight = top-down orientation → abs), GIF's logical screen descriptor
    is at 7/9. WAV duration is computed for CANONICAL files only (fmt chunk
    at 13, data at 37 — what every minimal PCM writer emits); chunk-
    reordered WAVs get NULL here and are handled by the chunk-walking
    Python parser in :func:`extract_media_metadata`."""
    p = F.col(payload_col)
    plen = F.length(p)
    hexat = lambda off, n: F.hex(F.substring(p, off, n))  # noqa: E731
    is_png = hexat(1, 8) == "89504E470D0A1A0A"
    is_bmp = hexat(1, 2) == "424D"
    is_gif = hexat(1, 3) == "474946"
    is_wav = (hexat(1, 4) == "52494646") & (hexat(9, 4) == "57415645")
    bmp_h_raw = _le(p, 23, 4)
    bmp_h = F.when(
        bmp_h_raw > F.lit(2147483647), F.lit(4294967296) - bmp_h_raw
    ).otherwise(bmp_h_raw)
    # dimension reads are length-guarded: substring past the end just
    # returns the surviving bytes, so a TRUNCATED container would parse a
    # partial field into a plausible-but-wrong value — the type still
    # sniffs (magic intact) but dims must be NULL, matching the Python
    # chunk-walker's refusal
    width = (
        F.when(is_png & (plen >= 24), _be(p, 17, 4))
        .when(is_bmp & (plen >= 26), _le(p, 19, 4))
        .when(is_gif & (plen >= 10), _le(p, 7, 2))
    )
    height = (
        F.when(is_png & (plen >= 24), _be(p, 21, 4))
        .when(is_bmp & (plen >= 26), bmp_h)
        .when(is_gif & (plen >= 10), _le(p, 9, 2))
    )
    # canonical PCM WAV: fmt(16 bytes) at 13, byte-rate at 29, data at 37
    wav_canonical = (
        is_wav
        & (plen >= 44)
        & (hexat(13, 4) == "666D7420")
        & (hexat(37, 4) == "64617461")
    )
    byte_rate = _le(p, 29, 4)
    duration_ms = F.when(
        wav_canonical & (byte_rate > 0),
        (_le(p, 41, 4) * 1000).cast("long") / byte_rate,
    ).cast("long")
    sniffed = (
        F.when(is_png, F.lit("png"))
        .when(is_bmp, F.lit("bmp"))
        .when(is_gif, F.lit("gif"))
        .when(is_wav, F.lit("wav"))
    )
    # sniffed_* names: MEDIA_SCHEMA rows may carry source-claimed
    # width/height/duration_ms — the parsed values sit beside them (a
    # mismatch is a data-quality signal, not something to overwrite)
    return (
        df.withColumn("n_bytes", F.length(p).cast("long"))
        .withColumn("container_magic", hexat(1, 4))
        .withColumn("sniffed_type", sniffed)
        .withColumn("sniffed_width", width.cast("int"))
        .withColumn("sniffed_height", height.cast("int"))
        .withColumn("sniffed_duration_ms", duration_ms.cast("int"))
    )


def parse_container_header(payload: bytes) -> dict | None:
    """Container metadata from magic bytes, stdlib ``struct`` only — the
    robust (chunk-walking) Python counterpart of the JVM fast path in
    :func:`attach_media_metadata`. Returns ``{container, width, height,
    duration_ms, codec}`` (missing fields None) or None when the payload
    matches no known container. This is a REAL parse of the container
    header, not a stub; only pixel/sample DECODING remains a plug-in seam
    (no media library exists in this environment)."""
    import struct

    b = payload or b""
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
        w, h = struct.unpack(">II", b[16:24])
        return {"container": "png", "width": w, "height": h,
                "duration_ms": None, "codec": "png"}
    if b[:2] == b"BM" and len(b) >= 26:
        w, h = struct.unpack("<ii", b[18:26])
        return {"container": "bmp", "width": w, "height": abs(h),
                "duration_ms": None, "codec": "bmp"}
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w, h = struct.unpack("<HH", b[6:10])
        return {"container": "gif", "width": w, "height": h,
                "duration_ms": None, "codec": "gif"}
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        # chunk walk: fmt/data may appear in any order with strangers
        # (LIST, fact) between them — the reason the JVM fixed-offset path
        # covers canonical files only
        pos, rate, byte_rate, bits, channels, data_size, fmt_tag = (
            12, None, None, None, None, None, None,
        )
        while pos + 8 <= len(b):
            cid, size = b[pos:pos + 4], struct.unpack("<I", b[pos + 4:pos + 8])[0]
            if cid == b"fmt " and pos + 24 <= len(b):
                fmt_tag, channels, rate, byte_rate = struct.unpack(
                    "<HHII", b[pos + 8:pos + 20]
                )
                if pos + 24 <= len(b):
                    bits = struct.unpack("<H", b[pos + 22:pos + 24])[0]
            elif cid == b"data":
                data_size = size
            pos += 8 + size + (size & 1)  # chunks are word-aligned
        duration_ms = (
            data_size * 1000 // byte_rate
            if data_size is not None and byte_rate
            else None
        )
        codec = {1: "pcm", 3: "ieee_float"}.get(fmt_tag, str(fmt_tag))
        return {"container": "wav", "width": None, "height": None,
                "duration_ms": duration_ms, "codec": codec,
                "channels": channels, "sample_rate": rate,
                "bits_per_sample": bits}
    return None


METADATA_SCHEMA = (
    "media_id BIGINT, container STRING, width INT, height INT, "
    "duration_ms INT, codec STRING, n_bytes BIGINT, error STRING"
)


def extract_media_metadata(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Robust container metadata via mapInPandas — handles chunk-reordered
    WAVs and anything the JVM fixed-offset path NULLs; per-row error
    isolation like :func:`extract_features`. Unrecognized containers are
    rows with ``container`` NULL and an error note, never dropped."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                payload = row[payload_col]
                pb = bytes(payload) if payload is not None else b""
                try:
                    meta = parse_container_header(pb)
                    rows.append({
                        "media_id": row[id_col],
                        "container": meta["container"] if meta else None,
                        "width": meta.get("width") if meta else None,
                        "height": meta.get("height") if meta else None,
                        "duration_ms": meta.get("duration_ms") if meta else None,
                        "codec": meta.get("codec") if meta else None,
                        "n_bytes": len(pb),
                        "error": None if meta else "unrecognized container",
                    })
                except Exception as e:  # noqa: BLE001 — per-row isolation
                    rows.append({
                        "media_id": row[id_col], "container": None,
                        "width": None, "height": None, "duration_ms": None,
                        "codec": None, "n_bytes": len(pb),
                        "error": f"{type(e).__name__}: {e}"[:200],
                    })
            yield pd.DataFrame(rows)

    return fan_out(df).mapInPandas(run, schema=METADATA_SCHEMA)


def _fake_decoder(payload: bytes, media_type: str) -> list[float]:
    """Deterministic stand-in for a real PIXEL decoder: 8 floats derived
    from the payload digest, with real container-header fields in front
    when the payload parses (parse_container_header) — so recognized
    PNG/BMP/GIF/WAV payloads featurize on real metadata. Replace with
    PIL/ffmpeg in production for content features — the Spark plumbing
    (batching, schema, error capture) is identical."""
    meta = parse_container_header(payload or b"")
    h = hashlib.sha256(payload or b"").digest()
    digest_feats = [b / 255.0 for b in h[:8]]
    if meta is None:
        return digest_feats
    return [
        float(meta.get("width") or 0),
        float(meta.get("height") or 0),
        float(meta.get("duration_ms") or 0),
        float(len(payload or b"")),
    ] + digest_feats[:4]


def decode_bmp_array(payload: bytes):
    """REAL pixel decoding for uncompressed 24-bit BMP — stdlib ``struct``
    + numpy array ops, no per-pixel Python (round-9 vectorization: the
    whole pixel plane is one ``frombuffer`` reshape + a BGR→RGB axis
    reversal, so the FEATURE path is honest at corpus scale, not just on
    fixtures). Returns ``(width, height, pixels)`` with ``pixels`` a
    ``uint8 ndarray (h, w, 3)``, rows top-to-bottom. Handles bottom-up
    (positive height) and top-down (negative height) layouts and the
    4-byte row stride padding. Anything but BI_RGB 24-bit raises
    NotImplementedError — compressed BMPs stay behind the documented
    plug-in seam with PNG palette/16-bit and GIF."""
    import struct

    import numpy as np

    b = payload or b""
    if b[:2] != b"BM" or len(b) < 54:
        raise ValueError("not a BMP payload")
    data_off = struct.unpack("<I", b[10:14])[0]
    hdr_size = struct.unpack("<I", b[14:18])[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMPs not supported")
    w, h = struct.unpack("<ii", b[18:26])
    bpp = struct.unpack("<H", b[28:30])[0]
    compression = struct.unpack("<I", b[30:34])[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"stdlib decode covers uncompressed 24-bit BMP only "
            f"(bpp={bpp}, compression={compression}) — plug a codec in"
        )
    bottom_up, h = h > 0, abs(h)
    stride = (w * 3 + 3) & ~3
    if len(b) < data_off + h * stride - (stride - w * 3):
        raise ValueError("truncated BMP pixel data")
    # the last row may omit its padding bytes — pad the tail instead of
    # rejecting a writer that stopped at the pixel data
    body = np.zeros(h * stride, dtype=np.uint8)
    avail = min(len(b) - data_off, h * stride)
    body[:avail] = np.frombuffer(b, np.uint8, count=avail, offset=data_off)
    px = body.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
    if bottom_up:
        px = px[::-1]
    return w, h, np.ascontiguousarray(px)


def decode_bmp_pixels(payload: bytes):
    """Tuple-list form of :func:`decode_bmp_array` — ``(width, height,
    rows)`` where rows is a top-to-bottom list of per-row ``(r, g, b)``
    tuples (the differential-test / interop surface; the feature path
    consumes the array form directly)."""
    w, h, px = decode_bmp_array(payload)
    return w, h, [[tuple(p) for p in row] for row in px.tolist()]


def decode_png_array(payload: bytes):
    """REAL pixel decoding for non-interlaced 8-bit PNG (grayscale, RGB,
    gray+alpha, RGBA) — stdlib ``zlib`` + numpy scanline filtering
    (round-9 vectorization of the round-8 per-pixel loops). Returns
    ``(width, height, channels, pixels)`` with ``pixels`` a ``uint8
    ndarray (h, w, nch)``, rows top-to-bottom. Palette (color type 3),
    sub-byte and 16-bit depths, and Adam7 interlace raise
    NotImplementedError — they remain the plug-in seam with GIF's LZW.

    Filter reconstruction, per row:
    - None / Up: zero or one vectorized numpy add against the previous
      reconstructed row.
    - Sub (left): a per-byte-lane cumulative sum — ``cumsum mod 256``
      along x vectorizes it completely.
    - Average / Paeth: the left-neighbor recurrence is data-dependent
      (the predictor is nonlinear), so these rows keep the plain
      bytearray loop — MEASURED faster than per-x numpy steps at every
      width (numpy's per-op overhead on a ≤4-element lane swamps the
      arithmetic: the all-numpy variant probed 9.7 s where this hybrid
      probes ~3 s on 10 k 64×64 images with filters cycling 0-4).
    Row buffers convert between numpy and bytes per row (C-speed,
    ~µs); the pixel plane assembles as one (h, w, nch) uint8 array so
    the feature path does no per-pixel Python at all.
    """
    import struct
    import zlib

    import numpy as np

    b = payload or b""
    if b[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 8 <= len(b):
        ln = struct.unpack(">I", b[pos : pos + 4])[0]
        typ = b[pos + 4 : pos + 8]
        if typ == b"IHDR":
            ihdr = b[pos + 8 : pos + 8 + ln]
        elif typ == b"IDAT":
            idat += b[pos + 8 : pos + 8 + ln]
        elif typ == b"IEND":
            break
        pos += 12 + ln  # len + type + data + crc
    if ihdr is None or len(ihdr) < 13 or not idat:
        raise ValueError("PNG missing IHDR/IDAT chunks")
    w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr[:13]
    )
    if depth != 8 or ctype not in (0, 2, 4, 6) or interlace != 0:
        raise NotImplementedError(
            f"stdlib decode covers non-interlaced 8-bit gray/RGB/RGBA only "
            f"(depth={depth}, color_type={ctype}, interlace={interlace}) — "
            "plug a codec in"
        )
    nch = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
    raw = zlib.decompress(bytes(idat))
    stride = w * nch
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG pixel data")
    scan = np.frombuffer(raw, np.uint8, count=h * (stride + 1)).reshape(
        h, stride + 1
    )
    ftypes = scan[:, 0]
    if (ftypes > 4).any():
        bad = int(ftypes[ftypes > 4][0])
        raise ValueError(f"invalid PNG filter type {bad}")
    out = np.zeros((h, w, nch), dtype=np.uint8)
    prev = np.zeros((w, nch), dtype=np.uint8)
    for ri in range(h):
        ft = int(ftypes[ri])
        if ft == 0:
            cur = scan[ri, 1:].reshape(w, nch)
        elif ft == 1:  # Sub: per-lane cumsum mod 256
            cur = np.cumsum(
                scan[ri, 1:].reshape(w, nch), axis=0, dtype=np.uint64
            ).astype(np.uint8)
        elif ft == 2:  # Up: one vectorized add (uint8 wraps mod 256)
            cur = scan[ri, 1:].reshape(w, nch) + prev
        else:  # Average / Paeth: sequential left recurrence (byte loop)
            cur_b = bytearray(scan[ri, 1:].tobytes())
            prev_b = prev.tobytes()
            if ft == 3:  # Average: floor((left + up) / 2)
                for i in range(stride):
                    a = cur_b[i - nch] if i >= nch else 0
                    cur_b[i] = (cur_b[i] + ((a + prev_b[i]) >> 1)) & 0xFF
            else:  # Paeth predictor
                for i in range(stride):
                    a = cur_b[i - nch] if i >= nch else 0
                    up = prev_b[i]
                    c = prev_b[i - nch] if i >= nch else 0
                    p = a + up - c
                    pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                    pred = (
                        a if (pa <= pb and pa <= pc)
                        else (up if pb <= pc else c)
                    )
                    cur_b[i] = (cur_b[i] + pred) & 0xFF
            cur = np.frombuffer(bytes(cur_b), np.uint8).reshape(w, nch)
        out[ri] = cur
        prev = cur
    return w, h, nch, out


def decode_png_pixels(payload: bytes):
    """Tuple-list form of :func:`decode_png_array` — ``(width, height,
    channels, rows)`` with rows top-to-bottom, each a list of per-pixel
    channel tuples (the differential-test / interop surface; the feature
    path consumes the array form directly)."""
    w, h, nch, px = decode_png_array(payload)
    return w, h, nch, [[tuple(p) for p in row] for row in px.tolist()]


def decode_wav_samples(payload: bytes):
    """REAL sample decoding for PCM WAV (8-bit unsigned / 16-bit signed) —
    stdlib ``struct`` only (round-7 de-stub). Returns ``(sample_rate,
    channels, samples)`` with samples interleaved and centered (8-bit
    values shifted by -128 so silence is 0 in both widths). IEEE-float and
    compressed codecs raise NotImplementedError — the plug-in seam."""
    import struct

    b = payload or b""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, fmt_tag, channels, rate, bits = 12, None, None, None, None
    data = None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        size = struct.unpack("<I", b[pos + 4 : pos + 8])[0]
        if cid == b"fmt " and pos + 24 <= len(b):
            fmt_tag, channels, rate = struct.unpack("<HHI", b[pos + 8 : pos + 16])
            bits = struct.unpack("<H", b[pos + 22 : pos + 24])[0]
        elif cid == b"data":
            data = b[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    if fmt_tag is None or data is None:
        raise ValueError("WAV missing fmt/data chunks")
    if fmt_tag != 1 or bits not in (8, 16):
        raise NotImplementedError(
            f"stdlib decode covers PCM 8/16-bit only (fmt={fmt_tag}, "
            f"bits={bits}) — plug a codec in"
        )
    if bits == 16:
        n = len(data) // 2
        samples = list(struct.unpack(f"<{n}h", data[: n * 2]))
    else:
        samples = [x - 128 for x in data]
    return rate, channels, samples


def _pixel_stats(w: int, h: int, rgb) -> list[float]:
    """Shared numpy pixel statistics: [width, height, n_pixels, mean_r,
    mean_g, mean_b, min_luma, max_luma] over an ``(h, w, 3)`` uint8 array
    (luma = BT.601 integer milli-weights, exact before the final /1000;
    sums in int64 so a gigapixel image cannot overflow)."""
    import numpy as np

    n = w * h
    if n == 0:
        return [float(w), float(h), 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    px = rgb.astype(np.int64)
    sums = px.reshape(-1, 3).sum(axis=0)
    luma = px[:, :, 0] * 299 + px[:, :, 1] * 587 + px[:, :, 2] * 114
    return [
        float(w), float(h), float(n),
        float(sums[0] / n), float(sums[1] / n), float(sums[2] / n),
        float(luma.min() / 1000.0), float(luma.max() / 1000.0),
    ]


def _bmp_features(payload: bytes) -> list[float]:
    """True pixel statistics for BMP (see :func:`_pixel_stats`) — fully
    vectorized: no per-pixel Python anywhere on this path (round 9)."""
    return _pixel_stats(*decode_bmp_array(payload))


def _png_features(payload: bytes) -> list[float]:
    """True pixel statistics for PNG, same shape as the BMP row.
    Grayscale maps v→(v,v,v); alpha is ignored for the statistics (the
    features describe the color signal, not compositing)."""
    w, h, nch, px = decode_png_array(payload)
    rgb = px[:, :, :3] if nch >= 3 else px[:, :, :1].repeat(3, axis=2)
    return _pixel_stats(w, h, rgb)


def _wav_features(payload: bytes) -> list[float]:
    """True sample statistics: [sample_rate, channels, n_samples, mean,
    min, max, rms, zero_crossings]."""
    import math

    rate, channels, samples = decode_wav_samples(payload)
    n = len(samples)
    if n == 0:
        return [float(rate), float(channels), 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    zc = sum(
        1 for a, b in zip(samples, samples[1:]) if (a < 0) != (b < 0)
    )
    return [
        float(rate), float(channels), float(n),
        sum(samples) / n, float(min(samples)), float(max(samples)),
        math.sqrt(sum(s * s for s in samples) / n), float(zc),
    ]


# containers whose CONTENT decodes with the standard library alone — BMP
# (raw pixels), WAV (raw PCM), PNG (DEFLATE, which Python ships as zlib +
# the five scanline filters); GIF's LZW remains the documented plug-in seam
CONTENT_DECODERS: dict[str, Callable[[bytes], list[float]]] = {
    "bmp": _bmp_features,
    "wav": _wav_features,
    "png": _png_features,
}


def stdlib_content_decoder(payload: bytes, media_type: str) -> list[float]:
    """The REAL entries in the decoder registry: true pixel/sample
    statistics for stdlib-decodable containers (uncompressed 24-bit BMP,
    PCM WAV, non-interlaced 8-bit PNG), loud NotImplementedError for the
    rest (GIF/LZW, palette/16-bit/interlaced PNG — captured as per-row
    error rows by :func:`extract_features`, never silent fakes). Drop-in
    for the ``decoder`` parameter."""
    meta = parse_container_header(payload or b"")
    if meta is None:
        raise ValueError("unrecognized container")
    dec = CONTENT_DECODERS.get(meta["container"])
    if dec is None:
        raise NotImplementedError(
            f"{meta['container']} content is compressed — no codec library "
            "in this environment; plug one into CONTENT_DECODERS"
        )
    return dec(payload)


def extract_features(
    df: DataFrame,
    decoder: Callable[[bytes, str], list[float]] | None = None,
    payload_col: str = "payload",
    id_col: str = "media_id",
    type_col: str = "media_type",
) -> DataFrame:
    """Decode + featurize via mapInPandas (Arrow batches, per-row error
    isolation — an undecodable payload yields an error row, never a failed
    task; the manifest-loader philosophy applied to media)."""
    decoder = decoder or _fake_decoder
    df = fan_out(df)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                payload = row[payload_col]
                try:
                    payload_bytes = bytes(payload) if payload is not None else b""
                    feat = decoder(payload_bytes, row[type_col])
                    out.append(
                        {
                            "media_id": row[id_col],
                            "media_type": row[type_col],
                            "n_bytes": len(payload_bytes),
                            "sha256": hashlib.sha256(payload_bytes).hexdigest(),
                            "feature": feat,
                            "error": None,
                        }
                    )
                except Exception as e:  # noqa: BLE001 — per-row isolation
                    out.append(
                        {
                            "media_id": row[id_col],
                            "media_type": row[type_col],
                            "n_bytes": 0,
                            "sha256": None,
                            "feature": None,
                            "error": f"{type(e).__name__}: {e}"[:200],
                        }
                    )
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_stub(
    df: DataFrame,
    target_w: int,
    target_h: int,
    resizer: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Resize plumbing: same mapInPandas shape, payload→payload. The default
    'resizer' raises NotImplementedError per row (captured as error rows) —
    deliberately loud, per the no-silent-drop rule, until a real codec is
    plugged in."""

    def _no_codec(payload: bytes, w: int, h: int) -> bytes:
        raise NotImplementedError("no image codec in this environment")

    resizer = resizer or _no_codec
    out_schema = "media_id BIGINT, payload BINARY, error STRING"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                try:
                    rows.append(
                        {
                            "media_id": row["media_id"],
                            "payload": resizer(bytes(row["payload"]), target_w, target_h),
                            "error": None,
                        }
                    )
                except Exception as e:  # noqa: BLE001
                    rows.append(
                        {
                            "media_id": row["media_id"],
                            "payload": None,
                            "error": f"{type(e).__name__}: {e}"[:200],
                        }
                    )
            yield pd.DataFrame(rows)

    return fan_out(df).mapInPandas(run, schema=out_schema)


def sample_frames(
    df: DataFrame,
    every_ms: int,
    id_col: str = "media_id",
) -> DataFrame:
    """Frame-sampling plumbing: one input row → many (media_id, frame_idx,
    ts_ms) rows, JVM-side via sequence+explode from the duration metadata —
    no Python involved until actual frame extraction, which plugs into
    extract_features on the exploded rows."""
    # explicit floor: engines disagree on double->int cast (truncate vs round)
    n = F.greatest(F.floor(F.col("duration_ms") / every_ms).cast("int"), F.lit(1))
    return df.select(
        F.col(id_col),
        F.posexplode(F.sequence(F.lit(0), n - 1)).alias("_i", "frame_idx"),
    ).select(
        id_col, "frame_idx", (F.col("frame_idx") * every_ms).alias("ts_ms")
    )


def encode_bmp(w: int, h: int, rgb) -> bytes:
    """Minimal uncompressed 24-bit BI_RGB encoder (bottom-up, padded
    stride) — the inverse of :func:`decode_bmp_array`, so pipelines and
    tests can synthesize REAL image payloads deterministically without a
    codec library. ``rgb`` is an ``(h, w, 3)`` uint8 array (or nested
    list), rows top-to-bottom."""
    import struct

    import numpy as np

    px = np.asarray(rgb, dtype=np.uint8).reshape(h, w, 3)
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    # bottom-up rows, RGB -> BGR channel order
    body[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)
    data = body.tobytes()
    file_header = b"BM" + struct.pack("<IHHI", 14 + 40 + len(data), 0, 0, 54)
    # info header: size, w, h (positive = bottom-up), planes, bpp,
    # BI_RGB, image size, x/y pixels-per-meter, palette counts
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return file_header + info_header + data


def _gray_plane(payload: bytes):
    """Decode a stdlib-decodable image to an integer luma plane
    ``(h, w) int64``: BT.601 integer milli-weights ``(299r+587g+114b)
    div 1000`` for color (the _pixel_stats convention — exact before
    any division), the raw channel for grayscale PNG; alpha ignored."""
    import numpy as np

    meta = parse_container_header(payload or b"")
    if meta is None:
        raise ValueError("unrecognized container")
    if meta["container"] == "bmp":
        _w, _h, px = decode_bmp_array(payload)
        rgb = px.astype(np.int64)
    elif meta["container"] == "png":
        _w, _h, nch, px = decode_png_array(payload)
        p = px.astype(np.int64)
        if nch >= 3:
            rgb = p[:, :, :3]
        else:
            return p[:, :, 0]
    else:
        raise NotImplementedError(
            f"{meta['container']} content is compressed — no codec "
            "library in this environment; plug one into CONTENT_DECODERS"
        )
    return (rgb[:, :, 0] * 299 + rgb[:, :, 1] * 587 + rgb[:, :, 2] * 114) // 1000


DHASH_COLS, DHASH_ROWS = 9, 8  # the standard 64-bit difference-hash grid


def dhash_halves(payload: bytes) -> tuple:
    """64-bit perceptual difference hash (dHash: Krawetz's
    kindofbluesky/hackerfactor scheme — box-downsample the luma plane to
    9×8, emit bit r*8+c = 1 iff cell[r][c] > cell[r][c+1]) as TWO 32-bit
    halves (sig_lo = bits 0-31, sig_hi = bits 32-63) — the
    dedup.hamming_near_pairs signature convention, every value in
    [0, 2^32). All-integer arithmetic: exact box edges ``i*h div 8`` /
    ``j*w div 9``, integer box means (sum div count), strict-greater
    bits — bit-reproducible across hosts, no float resampling. Images
    smaller than the 9×8 grid raise (a 4-pixel hash is noise, not a
    fingerprint)."""
    import numpy as np

    g = _gray_plane(payload)
    h, w = g.shape
    if h < DHASH_ROWS or w < DHASH_COLS:
        raise ValueError(
            f"image {w}x{h} smaller than the {DHASH_COLS}x{DHASH_ROWS} "
            "dhash grid"
        )
    ys = [r * h // DHASH_ROWS for r in range(DHASH_ROWS)]
    xs = [c * w // DHASH_COLS for c in range(DHASH_COLS)]
    # box sums via two reduceat passes (whole-plane numpy, no per-cell
    # Python); exact integer means with driver-side box areas
    row_cut = np.add.reduceat(g, ys, axis=0)
    cells = np.add.reduceat(row_cut, xs, axis=1)
    y_edges = ys + [h]
    x_edges = xs + [w]
    areas = np.outer(np.diff(y_edges), np.diff(x_edges)).astype(np.int64)
    means = cells // areas
    lo = hi = 0
    for r in range(DHASH_ROWS):
        for c in range(DHASH_COLS - 1):
            if means[r][c] > means[r][c + 1]:
                i = r * (DHASH_COLS - 1) + c
                if i < 32:
                    lo |= 1 << i
                else:
                    hi |= 1 << (i - 32)
    return lo, hi


def perceptual_dhash(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Per-image dHash signatures via mapInPandas (Arrow batches, per-row
    error isolation — an undecodable/too-small payload yields an error
    row, never a failed task): (id, sig_lo, sig_hi, error). Map-side
    only — the signature is 16 bytes however large the image, so the
    downstream near-dup join never shuffles pixels."""
    df = fan_out(df)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                try:
                    payload = row[payload_col]
                    lo, hi = dhash_halves(
                        bytes(payload) if payload is not None else b""
                    )
                    out.append(
                        {"id": row[id_col], "sig_lo": lo, "sig_hi": hi,
                         "error": None}
                    )
                except Exception as e:  # noqa: BLE001 — per-row isolation
                    out.append(
                        {"id": row[id_col], "sig_lo": None, "sig_hi": None,
                         "error": f"{type(e).__name__}: {e}"[:200]}
                    )
            yield pd.DataFrame(out)

    return df.mapInPandas(
        run, schema="id LONG, sig_lo LONG, sig_hi LONG, error STRING"
    )


def image_near_dup_pairs(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    max_hamming: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-duplicate IMAGES (re-encoded thumbnails, brightness tweaks,
    re-crawled assets) — the multimodal sibling of text near-dup dedup:
    dHash signatures (map-side, 16 bytes per image) into the SAME
    pigeonhole-banded Hamming self-join the text path uses
    (dedup.hamming_near_pairs — one machinery, not a fork). Output
    (id_a, id_b, hamming); undecodable payloads drop here (their error
    rows are perceptual_dhash's to report — run it directly for the
    accounting)."""
    from database_migration_spark.operators.dedup import hamming_near_pairs

    sigs = perceptual_dhash(df, payload_col, id_col).where(
        F.col("error").isNull()
    ).select("id", "sig_lo", "sig_hi")
    return hamming_near_pairs(
        sigs, bits=64, max_hamming=max_hamming, max_bucket=max_bucket
    )
