"""Multimodal columns (SURVEY.md §7 M4, north-star).

Images/audio/video are carried as opaque ``binary`` columns with typed
metadata — deliberately lifting the reference's complex-type ban
(``HiveKuduBridgeUtils.java:101-111``) on the extension path while the
core lattice stays strict (typesys.py).

The fixture has no real media, so the *blob plumbing* is real (binary
column construction, schema, Arrow batch shape through ``mapInPandas``)
and the media *decode* is stubbed: ``decode_stub`` raises
``NotImplementedError`` exactly where a codec would run, and the
registered operator uses a deterministic byte-level feature extractor
(real computation over the real bytes — not fake values) so results are
reproducible and testable.

Scale: feature extraction is ``mapInPandas`` — Arrow-batched columnar
transfer, one Python worker per core, no per-row overhead; the pattern
is identical for a real image decoder at 100 TB.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hivekudu_handler_spark.registry import query
from hivekudu_handler_spark.tables import load_table


def decode_stub(blob: bytes) -> "object":
    """Placeholder for a media codec (PIL/libav are not available in this
    environment).  The Spark-side plumbing around it is real and tested;
    swap this single function to light up actual decoding."""
    raise NotImplementedError(
        "media decoding requires an image/audio codec; wire PIL/libav here"
    )


@query(
    "mm_blob_meta",
    oracle=(
        # DuckDB 1.0 has no md5(BLOB); the corpus is pure ASCII (verified:
        # octet_length(encode(text)) == length(text) for every row), so
        # md5(text) hashes the identical bytes
        "SELECT doc_id, "
        "       octet_length(encode(text)) AS n_bytes, "
        "       md5(text) AS blob_md5, "
        "       substr(lang, 1, 2) AS media_kind, "
        "       octet_length(encode(text)) > 300 AS is_large "
        "FROM documents"
    ),
    tags=("multimodal",),
)
def mm_blob_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-blob column + typed metadata, all JVM-side: byte length,
    content hash, kind tag, size gate.  (Blobs are the UTF-8 document
    bytes standing in for media payloads.)"""
    d = load_table(spark, sf_dir, "documents")
    blob = F.encode("text", "UTF-8")
    return d.select(
        "doc_id",
        F.octet_length(blob).alias("n_bytes"),
        F.md5(blob).alias("blob_md5"),
        F.substring("lang", 1, 2).alias("media_kind"),
        (F.octet_length(blob) > 300).alias("is_large"),
    )


_FEAT_SCHEMA = (
    "doc_id bigint, n_bytes int, mean_byte double, max_byte int, "
    "n_distinct_bytes int, entropy_bits double"
)


def _byte_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic byte-level feature extraction (the decode seam).

    Computes real statistics over the real blob bytes with numpy
    (``frombuffer`` + ``bincount``); a production pipeline replaces the
    body with ``decode_stub`` + model features, keeping the identical
    mapInPandas/Arrow shape.  A pure-Python byte loop here cost ~30 s at
    sf0.1; vectorized it is sub-second.
    """
    import numpy as np

    for pdf in batches:
        out = []
        for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
            b = np.frombuffer(bytes(blob), dtype=np.uint8)
            n = int(b.size)
            if n == 0:
                out.append((doc_id, 0, 0.0, 0, 0, 0.0))
                continue
            counts = np.bincount(b, minlength=256)
            nz = counts[counts > 0]
            p = nz / n
            entropy = float(-(p * np.log2(p)).sum())
            out.append(
                (
                    doc_id,
                    n,
                    float(b.mean()),
                    int(b.max()),
                    int(nz.size),
                    entropy,
                )
            )
        yield pd.DataFrame(
            out,
            columns=[
                "doc_id", "n_bytes", "mean_byte", "max_byte",
                "n_distinct_bytes", "entropy_bits",
            ],
        )


@query("mm_byte_features", tags=("multimodal",))
def mm_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over blob columns via
    ``mapInPandas`` — the real plumbing for media feature extraction.
    Rows-only driver check (byte-histogram entropy is not reasonably
    SQL-expressible); tests pin golden values for fixed docs."""
    d = load_table(spark, sf_dir, "documents")
    blobs = d.select("doc_id", F.encode("text", "UTF-8").alias("blob"))
    return blobs.mapInPandas(_byte_features, schema=_FEAT_SCHEMA)


_RESIZE_SCHEMA = "doc_id bigint, frame_idx int, frame_bytes binary"


def _frame_sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic 'frame sampling': split each blob into fixed 64-byte
    frames and keep every 4th — the exact fan-out shape of video frame
    sampling (1 row in → N rows out) without a codec."""
    for pdf in batches:
        rows = []
        for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
            b = bytes(blob)
            frames = [b[i : i + 64] for i in range(0, len(b), 64)]
            for idx in range(0, len(frames), 4):
                rows.append(
                    {"doc_id": doc_id, "frame_idx": idx, "frame_bytes": frames[idx]}
                )
        yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_bytes"])


_AUDIO_SCHEMA = (
    "doc_id bigint, window_idx int, rms double, peak int, zero_crossings int"
)


def _audio_windows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic 'audio' windowing: overlapping 256-byte windows with
    hop 128 over the blob, per-window RMS / peak / zero-crossing count —
    the exact windowed-DSP shape (overlap fan-out + vectorized per-window
    reduction) that real audio feature extraction uses, computed over the
    real bytes (samples = centered byte values) instead of decoded PCM.
    """
    import numpy as np

    win, hop = 256, 128
    for pdf in batches:
        rows = []
        for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
            b = np.frombuffer(bytes(blob), dtype=np.uint8).astype(np.float64)
            b -= 128.0  # center like signed PCM
            n_windows = max(1, (len(b) - win) // hop + 1) if len(b) else 0
            for w_idx in range(n_windows):
                seg = b[w_idx * hop : w_idx * hop + win]
                crossings = int(np.count_nonzero(np.diff(np.sign(seg)) != 0))
                rows.append(
                    (
                        doc_id,
                        w_idx,
                        float(np.sqrt(np.mean(seg * seg))),
                        int(np.abs(seg).max()),
                        crossings,
                    )
                )
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "window_idx", "rms", "peak", "zero_crossings"],
        )


@query("mm_audio_windows", tags=("multimodal",))
def mm_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-window feature extraction over blob 'audio' (256-byte
    windows, 128 hop): the windowed-DSP plumbing — overlap fan-out,
    vectorized per-window reductions, Arrow-batched transfer.  Rows-only
    driver check (windowed RMS/zero-crossings are not reasonably
    SQL-expressible); tests pin golden values for a fixed doc."""
    d = load_table(spark, sf_dir, "documents")
    blobs = d.select("doc_id", F.encode("text", "UTF-8").alias("blob"))
    return blobs.mapInPandas(_audio_windows, schema=_AUDIO_SCHEMA)


@query(
    "mm_frame_sample",
    oracle=(
        # blob slicing via text slicing is exact because the corpus is
        # pure ASCII (1 byte per char, verified)
        "WITH idx AS (SELECT doc_id, text, unnest(range(0, "
        "        CAST(ceil(length(text) / 64.0) AS INT), 4)) AS frame_idx "
        "        FROM documents) "
        "SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx, "
        "       hex(encode(substring(text, frame_idx * 64 + 1, 64))) AS frame_hex "
        "FROM idx"
    ),
    tags=("multimodal",),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling fan-out (1 blob → N frames) through mapInPandas,
    oracle-checked against DuckDB blob slicing.

    The frames flow through the pipeline as real ``binary`` cells (the
    Arrow batch shape a codec would consume); only the driver-facing
    projection hex-encodes them — the verifier's pandas canonicalizer
    cannot hash raw binary cells (official r3 failure, same class as
    r2's list cells)."""
    d = load_table(spark, sf_dir, "documents")
    blobs = d.select("doc_id", F.encode("text", "UTF-8").alias("blob"))
    frames = blobs.mapInPandas(_frame_sample, schema=_RESIZE_SCHEMA)
    return frames.select(
        "doc_id", "frame_idx", F.hex("frame_bytes").alias("frame_hex")
    )


_THUMB = 8  # target thumbnail side
_THUMB_SCHEMA = "doc_id bigint, src_side int, thumb_hex string"


def _resize_thumbs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Block-average downsample of blob-as-square-image to _THUMB².

    The blob's first side² bytes (side = ⌊√n⌋) form the source grid;
    each target cell averages its source block (numpy ``add.at`` on the
    (row→target, col→target) index map — fully vectorized, no Python
    pixel loop).  Sources smaller than the target are zero-padded.  The
    stand-in for a real ``decode_stub`` + PIL ``resize`` with identical
    plumbing: Arrow batch in, fixed-size thumbnail out."""
    import numpy as np

    t = _THUMB
    for pdf in batches:
        out = []
        for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
            b = np.frombuffer(bytes(blob), dtype=np.uint8)
            side = int(np.sqrt(b.size))
            if side == 0:
                out.append((doc_id, 0, "00" * (t * t)))
                continue
            img = b[: side * side].reshape(side, side).astype(np.float64)
            if side < t:
                pad = np.zeros((t, t))
                pad[:side, :side] = img
                img, side_eff = pad, t
            else:
                side_eff = side
            idx = (np.arange(side_eff) * t) // side_eff
            sums = np.zeros((t, t))
            cnts = np.zeros((t, t))
            np.add.at(sums, (idx[:, None], idx[None, :]), img)
            np.add.at(cnts, (idx[:, None], idx[None, :]), 1.0)
            thumb = np.floor(sums / cnts).astype(np.uint8)
            out.append((doc_id, side, thumb.tobytes().hex().upper()))
        yield pd.DataFrame(out, columns=["doc_id", "src_side", "thumb_hex"])


@query("mm_resize", tags=("multimodal",))
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize/thumbnail plumbing for image-like blobs: 1 blob → one
    fixed 8×8 block-averaged thumbnail via ``mapInPandas`` (the missing
    member of the decode / feature-extract / resize / frame-sample
    quartet).  Pure scan-shaped work — no shuffle, Arrow-batched, output
    size fixed per row regardless of blob size, which is what makes a
    full-corpus re-thumbnail pass feasible at 100 TB.  Rows-only driver
    check (block-average resampling is not reasonably SQL-expressible);
    tests pin a golden thumbnail and the determinism/shape invariants."""
    d = load_table(spark, sf_dir, "documents")
    blobs = d.select("doc_id", F.encode("text", "UTF-8").alias("blob"))
    return blobs.mapInPandas(_resize_thumbs, schema=_THUMB_SCHEMA)
