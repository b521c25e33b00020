"""Multimodal column plumbing: images/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side architecture is real and tested — schema, partition sizing,
UDF signatures, batch shapes; only the media codecs are stubbed because this
container ships no image/audio libraries. Each stub is a deterministic fake
behind ``_HAS_CODECS`` so the pipeline runs end-to-end in tests; a
deployment swaps the fake for Pillow/torchaudio/pyav inside the same
``mapInPandas`` body (the Spark plan is unchanged).

Scale notes: media rows are large (MBs) — the iterator-of-batches form of
``mapInPandas`` keeps memory bounded to one Arrow batch per task
(``spark.sql.execution.arrow.maxRecordsPerBatch`` sized down for media), and
``repartition`` before decode spreads variable-size blobs evenly.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_HAS_CODECS = False  # no PIL/libav in this container; deterministic fakes

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),  # opaque encoded bytes
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def _fake_decode_features(payload: bytes | None, dim: int = 8) -> list[float] | None:
    """Deterministic stand-in for decode→feature-extract. A real deployment
    replaces this with e.g. PIL.Image.open + a vision model preprocessor;
    everything around it (batching, schema, partitioning) stays identical.

    feature[d] = (int(md5(payload[:256] || ':' || d)[:8], 16) % 1000)/1000 —
    md5 over the raw byte prefix, so the DuckDB oracle replicates it
    bit-for-bit over the same blob (``__spark_entry__`` media_features)."""
    if payload is None:
        return None
    if _HAS_CODECS:  # pragma: no cover
        raise NotImplementedError("real codecs are not available in this container")
    import hashlib

    prefix = bytes(payload[:256])
    out = []
    for d in range(dim):
        h = int(hashlib.md5(prefix + f":{d}".encode()).hexdigest()[:8], 16)
        out.append(round((h % 1000) / 1000.0, 4))
    return out


def extract_features(df: DataFrame, batch_rows: int | None = None) -> DataFrame:
    """Decode + feature-extract via Arrow-batched mapInPandas (the F4-style
    escape hatch for logic Catalyst can't express). One Arrow batch in
    memory per task. Pass ``batch_rows`` to cap the Arrow batch size for fat
    media rows — note this sets the SESSION-wide
    ``arrow.maxRecordsPerBatch`` (Spark has no per-query knob), so it
    affects later pandas-UDF jobs too; leave None to keep the session
    setting."""
    if batch_rows is not None:
        df.sparkSession.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_rows)
        )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(_fake_decode_features)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: 0 if p is None else len(p)
                    ).astype("int32"),
                    "feature": feats,
                    "decode_ok": feats.map(lambda f: f is not None),
                }
            )

    return df.mapInPandas(process, schema=FEATURE_SCHEMA)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize plumbing: passes metadata through, marks the payload as
    re-encoded (deterministic fake: payload truncated/padded tag). Real impl
    swaps the lambda for PIL resize inside the same mapInPandas."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tag = f"resized:{width}x{height}:".encode()
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = out["payload"].map(
                lambda p: None if p is None else tag + p[:64]
            )
            out["width"] = width
            out["height"] = height
            yield out

    return df.mapInPandas(process, schema=MEDIA_SCHEMA)


def frame_sample_stub(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    (explodes duration / every_ms). The sampling itself is pure Spark —
    only the per-frame decode is faked."""
    frames = df.filter(F.col("kind") == "video").withColumn(
        "frame_ms",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ),
    )
    return frames.select(
        "media_id",
        "frame_ms",
        F.concat(F.col("media_id"), F.lit("#"), F.col("frame_ms")).alias("frame_id"),
    )


def synthetic_media(spark, n: int = 64, seed: int = 5) -> DataFrame:
    """Deterministic fake media table for tests (payload bytes derived from
    xxhash64 — stands in for real encoded blobs)."""
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64(F.lit(seed), F.col("id")), F.lit(3)) + 1).cast("int"),
    )
    payload = F.expr(
        f"CAST(concat('blob-', id, '-', repeat(substr(md5(CAST(id + {seed} AS STRING)), 1, 8), 40)) AS BINARY)"
    )
    return spark.range(n).select(
        F.format_string("m-%04d", F.col("id")).alias("media_id"),
        kinds.alias("kind"),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(64).alias("width").cast("int"),
        F.lit(64).cast("int").alias("height"),
        (F.pmod(F.xxhash64(F.lit(seed + 1), F.col("id")), F.lit(5000)) + 500)
        .cast("int")
        .alias("duration_ms"),
    )
