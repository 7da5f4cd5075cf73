"""Multimodal-column operators (SURVEY.md §2.B row ``multimodal_columns``
+ charter extension ``multimodal_decode_stub``).

North-star contract: image/audio/video are opaque ``binary`` columns
with typed metadata travelling beside them.  Two tiers:

- ``multimodal_columns`` — nested-type plumbing on built-in Catalyst
  expressions: struct/array/map columns constructed, carried through a
  join + filter, and projected back out to flat scalars (what the
  DuckDB oracle can check).  Nested columns are first-class in
  Parquet + Tungsten; nothing here leaves the JVM.
- ``multimodal_decode_stub`` — the Python-side decode path: binary
  payload → ``mapInPandas`` batch decoder → typed metadata struct.
  The real decoder (PIL/ffmpeg/torchaudio) is NOT in this container,
  so the decode is a clearly-marked deterministic fake; the Spark
  plumbing — binary column, Arrow batch transfer, output schema,
  partition-preserving narrow execution — is real and is what the
  operator contract tests.  At 100 TB the decode is the textbook
  ``mapInPandas`` use case: per-batch Python, no shuffle, scales with
  input splits.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduceplusplus_spark.registry import query
from mapreduceplusplus_spark.session import ensure_utc
from mapreduceplusplus_spark.sources.tables import load_table


@query(
    "multimodal_columns",
    oracle="""
    SELECT d.doc_id,
           d.lang                         AS meta_lang,
           d.source                       AS meta_source,
           CAST(len(e.embedding) AS BIGINT) AS emb_dim,
           round(list_aggregate(list_transform(e.embedding[1:8], x -> CAST(x AS DOUBLE)),
                                'sum'), 3) + 0 AS head_sum,
           round(CAST(e.embedding[1] AS DOUBLE), 3) + 0 AS first_val
    FROM documents d
    JOIN embeddings e ON e.vec_id = d.doc_id
    WHERE d.n_chars > 100
    """,
)
def multimodal_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct/array/map columns carried through a join and a filter,
    then flattened: metadata struct (lang, source), a string→string
    map probed with element_at, and array ops (size, slice-sum,
    element_at) on the embedding.  The join keys align doc_id=vec_id
    (1:1 in the fixtures).

    NO broadcast hint: in a real multimodal pipeline the embeddings
    side is row-for-row as large as documents (a fact table, not a
    dim), so a forced broadcast would OOM executors at scale.  A plain
    equi-join lets Catalyst/AQE pick shuffled-hash or sort-merge — and
    still auto-broadcasts if runtime stats show one side is genuinely
    small."""
    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    enriched = (
        docs.withColumn("meta", F.struct("lang", "source"))
        .withColumn(
            "attrs",
            F.create_map(
                F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
            ),
        )
        .join(emb, F.col("vec_id") == F.col("doc_id"))
        .where(F.col("n_chars") > 100)
    )
    head = F.transform(F.slice("embedding", 1, 8), lambda x: x.cast("double"))
    return enriched.select(
        "doc_id",
        F.col("meta.lang").alias("meta_lang"),
        F.element_at("attrs", "source").alias("meta_source"),
        F.size("embedding").cast("bigint").alias("emb_dim"),
        (F.round(F.aggregate(head, F.lit(0.0), lambda a, x: a + x), 3) + F.lit(0.0))
        .alias("head_sum"),
        (F.round(F.element_at("embedding", 1).cast("double"), 3) + F.lit(0.0))
        .alias("first_val"),
    )


#: output schema of the (stubbed) decoder — the real contract a PIL/
#: ffmpeg-backed implementation would fill
DECODE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, format string, width int, height int, ok boolean"
)


def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched fake decoder.  DETERMINISTIC STUB: derives
    metadata from the payload length/first byte instead of decoding —
    the container has no image/audio libraries.  A real implementation
    replaces ONLY the body marked below; schema, batching, and
    distribution are already production-shaped."""
    for pdf in batches:
        payloads = pdf["payload"]
        n_bytes = payloads.map(len)
        first = payloads.map(lambda b: b[0] if len(b) else 0)
        # --- real decode goes here (PIL.Image.open etc.); stub: ---
        out = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes,
                "format": first.map(lambda x: ["png", "jpeg", "webp"][x % 3]),
                "width": (n_bytes % 640 + 16).astype("int32"),
                "height": (first * 7 % 480 + 16).astype("int32"),
                "ok": n_bytes > 0,
            }
        )
        yield out


def decode_images(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Public decode operator: (doc_id, payload binary) → typed
    metadata.  Narrow ``mapInPandas`` — no shuffle, one Python worker
    per input split, Arrow both ways."""
    return df.select("doc_id", F.col(payload_col).alias("payload")).mapInPandas(
        _decode_batch, schema=DECODE_SCHEMA
    )


@query("multimodal_decode_stub")  # no SQL oracle: the decode is a
# Python mapInPandas stage; determinism + formula pinned by
# tests/test_llm_ops.py
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column decode pipeline on the documents fixture: text
    bytes stand in for an image payload (``cast(text AS BINARY)``),
    flowing through the Arrow decode stage.  Returns one metadata row
    per document."""
    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    return decode_images(docs)


#: output schema of the (stubbed) frame sampler: one row PER SAMPLED
#: FRAME — the 1→N batch shape a video pipeline needs
FRAME_SCHEMA = (
    "doc_id bigint, frame_idx int, ts_ms bigint, frame_bytes bigint, "
    "width int, height int"
)


def _sample_frames_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched fake frame sampler.  DETERMINISTIC STUB (no ffmpeg
    in the container): frame count / size / dims derive from payload
    bytes.  The REAL contract demonstrated: one input row fans out to
    N output rows inside a single Arrow batch (generator/UDTF shape in
    pandas), no shuffle, output row count data-dependent."""
    for pdf in batches:
        out = {k: [] for k in ("doc_id", "frame_idx", "ts_ms", "frame_bytes", "width", "height")}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n = len(payload)
            # --- real decode+sample goes here (ffmpeg keyframes); stub: ---
            n_frames = n % 5 + 1          # "video length" from payload
            for i in range(n_frames):
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(i)
                out["ts_ms"].append(i * 1000)
                out["frame_bytes"].append(max(n - i, 0))
                out["width"].append(n % 640 + 16)
                out["height"].append((payload[0] if n else 0) * 7 % 480 + 16)
        yield pd.DataFrame(out)


def sample_frames(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Public frame-sampling operator: (doc_id, payload binary) → one
    typed row per sampled frame.  Narrow ``mapInPandas`` (1→N inside
    the batch): at 100 TB this is the correct shape for frame
    extraction — parallel per input split, output volume scales with
    frames sampled, never a shuffle."""
    return df.select("doc_id", F.col(payload_col).alias("payload")).mapInPandas(
        _sample_frames_batch, schema=FRAME_SCHEMA
    )


@query("multimodal_frame_sample")  # no SQL oracle: Python mapInPandas
# stage; determinism + fan-out formula pinned by tests/test_llm_ops.py
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling pipeline on the documents fixture (text bytes
    stand in for a video payload), aggregated per document so the
    result is compact: frame count, total frame bytes, first/last
    frame timestamps.  Exercises the full 1→N Arrow path plus a
    downstream shuffle over the fanned-out rows."""
    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    frames = sample_frames(docs)
    return frames.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_frames"),
        F.sum("frame_bytes").cast("bigint").alias("total_frame_bytes"),
        F.min("ts_ms").cast("bigint").alias("first_ts_ms"),
        F.max("ts_ms").cast("bigint").alias("last_ts_ms"),
    )


RESIZE_SCHEMA = (
    "doc_id bigint, payload binary, width int, height int, orig_bytes bigint"
)
FEATURE_DIM = 16
FEATURE_SCHEMA = f"doc_id bigint, feature array<float>"


def _resize_batch(target_w: int, target_h: int):
    """Factory for the Arrow-batched fake resizer.  DETERMINISTIC STUB
    (no PIL): 'resizes' by truncating the payload proportionally to the
    pixel-count ratio — a real implementation swaps ONLY the marked
    body; the binary-in/binary-out schema and batching are the real
    contract (resize is the canonical pre-training image normalization
    stage)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf["payload"].map(len)
            # --- real decode→resize→encode goes here (PIL); stub: ---
            src_px = (n_bytes % 640 + 16) * (n_bytes % 480 + 16)
            ratio = (target_w * target_h) / src_px
            keep = (n_bytes * ratio.clip(upper=1.0)).astype("int64").clip(lower=1)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        p[:k] for p, k in zip(pdf["payload"], keep)
                    ],
                    "width": target_w,
                    "height": target_h,
                    "orig_bytes": n_bytes,
                }
            )

    return fn


def resize_images(
    df: DataFrame, target_w: int = 224, target_h: int = 224, payload_col: str = "payload"
) -> DataFrame:
    """Public resize operator: (doc_id, payload binary) → resized
    payload + new dims.  Narrow ``mapInPandas``, binary in/binary out —
    at scale this runs decode→resize→re-encode per Arrow batch with no
    shuffle."""
    return df.select("doc_id", F.col(payload_col).alias("payload")).mapInPandas(
        _resize_batch(target_w, target_h), schema=RESIZE_SCHEMA
    )


def _feature_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched fake feature extractor.  DETERMINISTIC STUB (no
    torch/onnx): emits a FEATURE_DIM vector derived from payload byte
    statistics; a real encoder (CLIP/ViT) replaces ONLY the marked
    body.  The array<float> output column is exactly what the
    similarity-search operators consume downstream."""
    import numpy as np

    for pdf in batches:
        feats = []
        for p in pdf["payload"]:
            # --- real model forward pass goes here; stub: ---
            arr = np.frombuffer(p[: FEATURE_DIM * 4], dtype=np.uint8)
            v = np.zeros(FEATURE_DIM, dtype=np.float32)
            v[: min(FEATURE_DIM, len(arr))] = arr[:FEATURE_DIM]
            nrm = float(np.linalg.norm(v))
            feats.append((v / nrm if nrm else v).tolist())
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "feature": feats})


def extract_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Public feature-extraction operator: (doc_id, payload binary) →
    unit-norm ``array<float>`` embedding (stub body).  Completes the
    multimodal pipeline: decode → resize → feature-extract feeds the
    embedding dedup/similarity operators in ``llm/dedup.py`` /
    ``llm/similarity.py``."""
    return df.select("doc_id", F.col(payload_col).alias("payload")).mapInPandas(
        _feature_batch, schema=FEATURE_SCHEMA
    )


@query("multimodal_resize")  # no SQL oracle: Python mapInPandas stage;
# proportional-truncation formula + dims pinned by tests/test_llm_ops.py
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered form of ``resize_images`` on the documents fixture
    (text bytes as payload): binary→binary Arrow ``mapInPandas``
    resize to 224×224, surfaced as (doc_id, dims, payload size + md5)
    so the result is hashable and deterministic."""
    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    out = resize_images(docs)
    return out.select(
        "doc_id",
        "width",
        "height",
        F.length("payload").cast("bigint").alias("payload_bytes"),
        F.md5("payload").alias("payload_fp"),
    )


@query("multimodal_features")  # no SQL oracle: Python mapInPandas stage;
# unit-norm + byte-statistics formula pinned by tests/test_llm_ops.py
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered form of ``extract_features``: binary payload →
    unit-norm ``array<float>`` embedding (stub body, real Arrow
    plumbing), surfaced as (doc_id, dim, norm, head values) — the
    column shape the similarity/dedup operators consume."""
    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    out = extract_features(docs)
    norm = F.sqrt(F.aggregate("feature", F.lit(0.0), lambda a, x: a + x * x))
    return out.select(
        "doc_id",
        F.size("feature").cast("int").alias("dim"),
        F.round(norm, 3).alias("norm"),
        F.round(F.element_at("feature", 1), 3).alias("f0"),
    )
