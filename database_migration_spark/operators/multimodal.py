"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference flattens every complex type to text (README.md:123-127); a
training-data pipeline instead carries media as ``BinaryType`` payloads with
a typed metadata struct, and runs decode / feature-extraction / resize /
frame-sampling as Arrow-batched pandas stages over ``mapInPandas``.

Everything Spark-side here is real and tested: schemas, partitioning, UDF
signatures, batch shapes, error rows. The codec calls themselves are STUBS
(``decoder=None`` uses a deterministic fake) because no image/audio
libraries exist in this environment — a production deployment passes
``decoder=`` a function that calls PIL/ffmpeg/torchaudio on each payload.

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


def attach_media_metadata(
    df: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """Cheap JVM-side metadata that needs no decode: byte length + sha-ready
    prefix. Container-format sniffing (magic bytes) stays JVM-side too."""
    p = F.col(payload_col)
    magic = F.hex(F.substring(p, 1, 4))
    return df.withColumn("n_bytes", F.length(p).cast("long")).withColumn(
        "container_magic", magic
    )


def _fake_decoder(payload: bytes, media_type: str) -> list[float]:
    """Deterministic stand-in for a real decoder: 8 floats derived from the
    payload digest. Replace with PIL/ffmpeg in production — the Spark
    plumbing (batching, schema, error capture) is identical."""
    h = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in h[:8]]


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
