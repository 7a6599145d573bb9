"""Multimodal column operators: opaque binary payloads + typed
metadata, with decode / feature-extraction plumbing.

Beyond-reference surface (BASELINE.json north star).  Media bytes are
an opaque ``binary`` column with a typed metadata struct; decode and
feature extraction run as Arrow-batched ``mapInPandas`` stages — the
correct shape for CPU-heavy per-item Python work at 100 TB (the batch
iterator amortizes serialization; partitioning is untouched, so the
stage is embarrassingly parallel).

Codec libraries (JPEG/PNG/audio decoders) are not available in this
environment, so format *decoding* runs on deterministic fallbacks:
byte-level features (size, sha256, leading-byte signature) for
``decode_media``, raw-RGB8 buffers for the geometric ops.  The
geometric kernel itself is REAL: ``image_resize`` is a complete
NumPy nearest-neighbor resampler over raw pixel buffers (Pillow is
an optional fast path for bilinear), value-tested byte-for-byte —
so the Spark-side plumbing — schema, batch iteration, UDF
signatures — and the pixel math are both exercised.
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


#: Channels in the raw-image contract (interleaved RGB8).
IMAGE_CHANNELS = 3

RESIZE_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("data", T.BinaryType()),
    ]
)


def raw_images_from_documents(t, width: int = 8, height: int = 8) -> DataFrame:
    """Deterministic RAW images from ``documents``: interleaved RGB8
    pixel buffers (``width*height*3`` bytes) tiled from the UTF-8 text
    bytes, with the dimensions carried in ``meta`` — the
    post-decode representation a real image pipeline hands to
    geometric ops.  Pure expressions (repeat/substr/encode), so the
    source stays JVM-side and column-prunable."""
    n = width * height * IMAGE_CHANNELS
    # an empty text cannot tile into pixels; mirror the filter in oracles
    docs = t["documents"].filter(F.length("text") > 0)
    reps = F.ceil(F.lit(n) / F.greatest(F.length("text"), F.lit(1))).cast("int")
    pixels = F.encode(F.substring(F.repeat(F.col("text"), reps), 1, n), "UTF-8")
    meta = F.struct(
        F.lit("raw-rgb8").alias("format"),
        F.lit(width).alias("width"),
        F.lit(height).alias("height"),
        F.lit(None).cast("int").alias("sample_rate"),
        F.lit(None).cast("int").alias("duration_ms"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        pixels.alias("data"),
        meta.alias("meta"),
    )


def image_resize(
    media: DataFrame, width: int, height: int, method: str = "nearest"
) -> DataFrame:
    """Real image resize over raw RGB8 payloads (``media_id, data,
    meta.width, meta.height`` → ``media_id, width, height, data``).

    ``method="nearest"`` is a vectorized NumPy gather — always
    available, deterministic (sample index ``floor(i * src/dst)``,
    the classic nearest-neighbor grid), and tested byte-for-byte
    against an independent golden.  ``method="bilinear"`` uses Pillow
    when installed (optional dependency — raises ImportError with
    install guidance, not NotImplementedError: the default path is a
    complete kernel without it).

    A payload shorter than ``meta.width*meta.height*3`` is a contract
    violation and raises — silently padding would hide upstream
    truncation.  Arrow-batched ``mapInPandas``; partitioning is
    untouched, so the stage scales embarrassingly at 100 TB."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        if method == "bilinear":
            try:
                from PIL import Image
            except ImportError as exc:
                raise ImportError(
                    "image_resize(method='bilinear') requires Pillow "
                    "(pip install pillow); method='nearest' has no "
                    "dependency"
                ) from exc

        ch = IMAGE_CHANNELS
        ys = (np.arange(height) * 1.0).astype(np.int64)
        xs = (np.arange(width) * 1.0).astype(np.int64)
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "data": []}
            for mid, blob, sw, sh in zip(
                pdf["media_id"], pdf["data"], pdf["src_w"], pdf["src_h"]
            ):
                sw, sh = int(sw), int(sh)
                b = bytes(blob)
                need = sw * sh * ch
                if len(b) < need:
                    raise ValueError(
                        f"media {mid}: payload {len(b)} B < "
                        f"{sw}x{sh}x{ch} = {need} B raw-RGB8 contract"
                    )
                img = np.frombuffer(b, dtype=np.uint8, count=need).reshape(
                    sh, sw, ch
                )
                if method == "bilinear":
                    from PIL import Image

                    resized = np.asarray(
                        Image.fromarray(img, "RGB").resize(
                            (width, height), Image.BILINEAR
                        )
                    )
                else:
                    ri = ys * sh // height
                    ci = xs * sw // width
                    resized = img[ri][:, ci]
                out["media_id"].append(mid)
                out["width"].append(width)
                out["height"].append(height)
                out["data"].append(resized.tobytes())
            yield pd.DataFrame(out)

    return media.select(
        "media_id",
        "data",
        F.col("meta.width").alias("src_w"),
        F.col("meta.height").alias("src_h"),
    ).mapInPandas(kernel, schema=RESIZE_RESULT_SCHEMA)


def image_resize_stats(t, out_width: int = 4, out_height: int = 4) -> DataFrame:
    """Registry surface for the resize kernel: raw images from
    ``documents`` → nearest-neighbor resize → per-corpus shape report.
    The oracle checks the full fan-in (count + exact output byte
    volume); the pixel-exact golden lives in pytest (DuckDB has no
    BLOB hashing to value-check bytes in SQL)."""
    resized = image_resize(raw_images_from_documents(t), out_width, out_height)
    return resized.agg(
        F.count("*").alias("n_images"),
        F.sum(F.length("data")).alias("total_out_bytes"),
        F.min(F.length("data")).alias("min_out_bytes"),
        F.max(F.length("data")).alias("max_out_bytes"),
    )


#: Hard cap on frames sampled per media item.  Matches the registered
#: oracle's range(0, 64) bound AND is the scale-safe posture: an
#: uncapped per-row fan-out is a skew bomb (one 10 GB video would emit
#: millions of rows from a single input row); real samplers bound
#: frames-per-clip for the same reason.
MAX_FRAMES = 64


def frame_sample(
    media: DataFrame, every_ms: int = 1000, max_frames: int = MAX_FRAMES
) -> DataFrame:
    """Video frame-sampling plumbing: emits (media_id, frame_idx,
    frame_sha) per sampled frame, at most ``max_frames`` per item.
    Deterministic fake: 'frames' are fixed-size windows over the
    payload bytes — the fan-out shape (1 row → N bounded frame rows
    through the batch iterator) is the real contract; a codec-backed
    kernel drops in behind the same schema.

    Oracle-parity note: the DuckDB oracle slices the document TEXT
    (char windows) while this kernel slices the payload BYTES; the
    two coincide exactly iff the fixture text is ASCII — asserted by
    tests/test_sources_multimodal_windows.py over every test SF, so a
    non-ASCII fixture fails loudly instead of silently diverging."""
    import hashlib

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_sha": []}
            for mid, blob in zip(pdf["media_id"], pdf["data"]):
                b = bytes(blob)
                window = max(64, every_ms // 10)
                for idx, start in enumerate(range(0, len(b), window)):
                    if idx >= max_frames:
                        break
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
