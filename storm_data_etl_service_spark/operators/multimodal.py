"""Multimodal column operators: opaque binary payloads + typed
metadata, with decode / feature-extraction plumbing.

Beyond-reference surface (BASELINE.json north star).  Media bytes are
an opaque ``binary`` column with a typed metadata struct; decode and
feature extraction run as Arrow-batched ``mapInPandas`` stages — the
correct shape for CPU-heavy per-item Python work at 100 TB (the batch
iterator amortizes serialization; partitioning is untouched, so the
stage is embarrassingly parallel).

The actual image/audio decoding libraries are not available in this
environment, so the decode kernels are STUBBED: real library calls
are gated behind import-try and raise ``NotImplementedError``; the
deterministic fallback extracts byte-level features (size, sha256,
leading-byte signature) so the Spark-side plumbing — schema, batch
iteration, UDF signatures — is real and oracle-testable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Media table contract: opaque bytes + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("data", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

DECODE_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_sha", T.StringType()),
        T.StructField("byte_signature", T.StringType()),
    ]
)


def media_from_documents(t) -> DataFrame:
    """Deterministic media table derived from ``documents``: the
    UTF-8 text bytes stand in for encoded media payloads (kind cycles
    by doc_id).  Lets the multimodal plumbing be driven — and
    oracle-checked — from the standard tables."""
    docs = t["documents"]
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    meta = F.struct(
        F.lit("synthetic").alias("format"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        F.lit(16000).alias("sample_rate"),
        F.lit(1000).alias("duration_ms"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("data"),
        meta.alias("meta"),
    )


def decode_media(media: DataFrame) -> DataFrame:
    """Decode/feature-extract stage: ``mapInPandas`` over the media
    table.  Column pruning still applies upstream (only the selected
    columns cross the Arrow boundary).

    The kernel is a CLOSURE, not a module-level function: cloudpickle
    serializes closures by value, so Python workers need neither this
    package on their path nor any particular working directory —
    module-level kernels are pickled by reference and die with
    ModuleNotFoundError when the driver runs outside the repo."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        for pdf in batches:
            data = pdf["data"]
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": data.map(len).astype("int64"),
                    "content_sha": data.map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "byte_signature": data.map(lambda b: bytes(b)[:4].hex()),
                }
            )

    return media.select("media_id", "kind", "data").mapInPandas(
        kernel, schema=DECODE_RESULT_SCHEMA
    )


def multimodal_decode_stats(t) -> DataFrame:
    """Registry entry: media derived from documents → Arrow-batched
    decode → byte-level features.  The DuckDB oracle recomputes
    n_bytes/sha/signature from the same text bytes, so the whole
    Python path (Arrow transfer, batch iteration, hashing) is
    value-checked."""
    return decode_media(media_from_documents(t))


def image_resize(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize plumbing: real kernel requires PIL (absent here) —
    the stub validates the pipeline shape and fails loudly if reached
    without the library."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            from PIL import Image  # noqa: F401
        except ImportError as exc:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "image decode requires Pillow, which is not available in "
                "this environment; plumbing (schema/batching) is real"
            ) from exc
        raise NotImplementedError("real resize kernel not implemented")

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("data", T.BinaryType()),
        ]
    )
    return media.select("media_id", "data").mapInPandas(kernel, schema=schema)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: emits (media_id, frame_idx,
    frame_sha) per sampled frame.  Deterministic fake: 'frames' are
    fixed-size windows over the payload bytes — the fan-out shape
    (1 row → N frame rows through the batch iterator) is the real
    contract; a codec-backed kernel drops in behind the same schema."""
    import hashlib

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_sha": []}
            for mid, blob in zip(pdf["media_id"], pdf["data"]):
                b = bytes(blob)
                window = max(64, every_ms // 10)
                for idx, start in enumerate(range(0, len(b), window)):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(idx)
                    out["frame_sha"].append(
                        hashlib.sha256(b[start : start + window]).hexdigest()
                    )
            yield pd.DataFrame(out)

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.LongType()),
            T.StructField("frame_sha", T.StringType()),
        ]
    )
    return media.select("media_id", "data").mapInPandas(kernel, schema=schema)


def media_manifest_report(t) -> DataFrame:
    """Per-kind media inventory: counts, byte totals/extremes, and
    distinct-content cardinality — the manifest pass a multimodal
    pipeline runs BEFORE any decode (sizing batches, spotting
    truncated payloads, estimating dedup yield).

    Pure JVM-side expressions over the binary column (length, sha2) —
    no Python, one partial-aggregated shuffle on kind."""
    m = media_from_documents(t)
    nb = F.length("data").cast("long")
    return m.groupBy("kind").agg(
        F.count("*").alias("n_items"),
        F.sum(nb).alias("total_bytes"),
        F.min(nb).alias("min_bytes"),
        F.max(nb).alias("max_bytes"),
        F.countDistinct(F.sha2("data", 256)).alias("n_distinct_contents"),
    )


def decode_media_arrow(media: DataFrame) -> DataFrame:
    """The ``mapInArrow`` twin of ``decode_media``: the kernel
    receives raw ``pyarrow.RecordBatch``es — no Arrow→pandas
    materialization, no object boxing of the binary payloads.  For
    byte-level feature kernels this is the cheaper Python boundary
    (pandas conversion would copy every blob into Python objects);
    pandas stays the right tool when the kernel genuinely wants
    Series/NumPy semantics."""

    def kernel(batches):
        import hashlib

        import pyarrow as pa

        for batch in batches:
            ids = batch.column(0)
            kinds = batch.column(1)
            blobs = batch.column(2)
            shas, sigs, sizes = [], [], []
            for blob in blobs:
                b = blob.as_py()
                sizes.append(len(b))
                shas.append(hashlib.sha256(b).hexdigest())
                sigs.append(b[:4].hex())
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    kinds,
                    pa.array(sizes, pa.int64()),
                    pa.array(shas, pa.string()),
                    pa.array(sigs, pa.string()),
                ],
                names=[
                    "media_id",
                    "kind",
                    "n_bytes",
                    "content_sha",
                    "byte_signature",
                ],
            )

    return media.select("media_id", "kind", "data").mapInArrow(
        kernel, schema=DECODE_RESULT_SCHEMA
    )
