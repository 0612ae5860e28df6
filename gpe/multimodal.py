"""Multimodal column plumbing (BASELINE.json:6 mandate): image/audio/video
as opaque BINARY columns with typed metadata, processed through
Arrow-batched mapInPandas.

The container has no image/audio codecs, so the DECODE step is stubbed
(deterministic fake features / NotImplementedError for real codecs) per the
build brief — but everything Spark-side is real and tested: the binary
column schema, the metadata struct, partition-preserving mapInPandas with
fixed Arrow batch shapes, and the feature schema. Swapping the stub for
PIL/libav is a one-function change that doesn't touch the plan.

One declared query (q_multimodal_features) exercises the full Arrow binary
round-trip with an exact SQL oracle: the "payload" is the document text as
bytes — a stand-in for an image blob with the identical plumbing.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpe.io import load_table

FEATURE_DIM = 8

MEDIA_SCHEMA = (
    "media_id long, payload binary, "
    "meta struct<mime:string, width:int, height:int, n_bytes:long>"
)


def attach_payload(d: DataFrame) -> DataFrame:
    """documents → media-shaped frame: text bytes as the opaque payload +
    typed metadata struct (the at-rest layout for a 100 TB media lake:
    payload in parquet binary columns, prunable metadata alongside)."""
    payload = F.col("text").cast("binary")
    return d.select(
        F.col("doc_id").alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.lit(0).alias("width"),
            F.lit(0).alias("height"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_stub(payload: bytes, mime: str) -> list[float]:
    """STUB decoder. Real codecs (PIL, libav) are not in this container —
    for non-text mimes this raises, exactly where the real decode plugs in.
    For the text stand-in it emits deterministic byte-statistics features."""
    if mime != "text/plain":
        raise NotImplementedError(
            f"no codec for {mime!r} in this environment; "
            "swap decode_stub for a real decoder on a full image"
        )
    n = len(payload)
    head = payload[:FEATURE_DIM].ljust(FEATURE_DIM, b"\x00")
    return [float(n)] + [float(b) for b in head[: FEATURE_DIM - 1]]


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads — Arrow batches
    in, fixed-width feature arrays out. Partition-preserving (no shuffle):
    the decode cost parallelizes with the scan."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                decode_stub(p, m["mime"])
                for p, m in zip(pdf["payload"], pdf["meta"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "features": feats,
                }
            )

    return media.mapInPandas(
        batches, "media_id long, n_bytes long, features array<double>"
    )


# frame-sampling layout for q_multimodal_frames: fixed-size "frames" of
# the payload, keeping every _FRAME_STRIDE-th one — the video frame-sample
# access pattern with a byte-slice standing in for the codec.
_FRAME_BYTES = 16
_FRAME_STRIDE = 4


def frame_sample(
    media: DataFrame,
    frame_bytes: int = _FRAME_BYTES,
    stride: int = _FRAME_STRIDE,
) -> DataFrame:
    """mapInPandas frame sampler: one payload row in, one row per SAMPLED
    frame out (the 1→N explode shape of video frame extraction). The
    "decode" is a byte slice (codec-less container); the Spark plumbing —
    binary Arrow batches, row multiplication inside the Python worker,
    integer feature columns — is the real thing and partition-preserving,
    so sampling cost parallelizes with the scan at 100 TB."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict = {
                "media_id": [], "frame_idx": [], "n_frame_bytes": [],
                "sum_bytes": [], "first_byte": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = (len(b) + frame_bytes - 1) // frame_bytes
                for fidx in range(0, n_frames, stride):
                    fr = b[fidx * frame_bytes : (fidx + 1) * frame_bytes]
                    out["media_id"].append(mid)
                    out["frame_idx"].append(fidx)
                    out["n_frame_bytes"].append(len(fr))
                    out["sum_bytes"].append(sum(fr))
                    out["first_byte"].append(fr[0])
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="int64") for k, v in out.items()}
            )

    return media.mapInPandas(
        batches,
        "media_id long, frame_idx long, n_frame_bytes long,"
        " sum_bytes long, first_byte long",
    )


# audio-window layout for q_multimodal_audio_windows: the payload bytes
# read as 8-bit unsigned PCM samples, energy computed per fixed window —
# the STFT/feature-frame access pattern with byte arithmetic standing in
# for the codec (the decode swap point is identical to decode_stub).
_AUDIO_WIN = 32
_AUDIO_HOP = 16


def audio_windows(
    media: DataFrame, win: int = _AUDIO_WIN, hop: int = _AUDIO_HOP
) -> DataFrame:
    """mapInPandas windowed-energy extraction: one payload row in, one row
    per FULL analysis window out (50% overlap) — the audio feature-frame
    shape (RMS/energy contours, VAD front-ends). Samples center at 128
    (unsigned→signed), energy = Σv² and peak = max|v| stay all-integer so
    the oracle recomputes them exactly. Partition-preserving — window
    extraction parallelizes with the scan at 100 TB."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict = {
                "media_id": [], "window_idx": [], "energy": [], "peak": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                n = len(b)
                if n < win:
                    continue
                for widx in range((n - win) // hop + 1):
                    seg = b[widx * hop : widx * hop + win]
                    vs = [x - 128 for x in seg]
                    out["media_id"].append(mid)
                    out["window_idx"].append(widx)
                    out["energy"].append(sum(v * v for v in vs))
                    out["peak"].append(max(abs(v) for v in vs))
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="int64") for k, v in out.items()}
            )

    return media.mapInPandas(
        batches,
        "media_id long, window_idx long, energy long, peak long",
    )


def resize_pool(media: DataFrame, factor: int = 2) -> DataFrame:
    """mapInPandas downsample/resize: the payload bytes average-pooled in
    non-overlapping pairs (factor 2) — the image-resize access pattern
    (decode → pool → re-encode) with integer byte pooling standing in
    for the codec; a real resizer plugs in at the pooling line exactly
    like decode_stub. One row in, one row out with the resized length
    and integer features of the pooled signal (checksum, min, max,
    first value) so the oracle recomputes them exactly. A trailing
    odd byte is dropped (only full pools emit); payloads shorter than
    one pool drop entirely. Partition-preserving — resize cost
    parallelizes with the scan at 100 TB."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict = {
                "media_id": [], "n_in": [], "n_out": [],
                "checksum": [], "p_min": [], "p_max": [], "p_first": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                n_pools = len(b) // factor
                if n_pools == 0:
                    continue
                pooled = [
                    sum(b[i * factor : (i + 1) * factor]) // factor
                    for i in range(n_pools)
                ]
                out["media_id"].append(mid)
                out["n_in"].append(len(b))
                out["n_out"].append(n_pools)
                out["checksum"].append(sum(pooled))
                out["p_min"].append(min(pooled))
                out["p_max"].append(max(pooled))
                out["p_first"].append(pooled[0])
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="int64") for k, v in out.items()}
            )

    return media.mapInPandas(
        batches,
        "media_id long, n_in long, n_out long, checksum long,"
        " p_min long, p_max long, p_first long",
    )


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared query: factor-2 average-pool downsample over binary
    payloads — the resize leg that completes the multimodal access-
    pattern quartet (features ≈ image decode, frames ≈ video sampling,
    windows ≈ audio framing, resize ≈ image scaling). All-integer
    output; the oracle recomputes the pooling with SQL substring + ord
    arithmetic (ASCII corpus: byte == codepoint)."""
    d = load_table(spark, sf_dir, "documents")
    return resize_pool(attach_payload(d))


def q_multimodal_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared query: windowed audio-energy extraction over binary
    payloads (32-sample windows, 16-sample hop) — completes the
    multimodal triad (features ≈ image, frames ≈ video, windows ≈ audio).
    All-integer output; the oracle recomputes energy/peak with SQL
    substring + ord arithmetic (ASCII corpus: byte == codepoint)."""
    d = load_table(spark, sf_dir, "documents")
    return audio_windows(attach_payload(d))


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared query: frame-sampling over binary payloads — every 4th
    16-byte frame with integer byte features (frame length, byte sum,
    first byte), so the oracle recomputes them exactly with SQL substring
    arithmetic (ASCII corpus: byte == codepoint) and no float appears
    anywhere."""
    d = load_table(spark, sf_dir, "documents")
    return frame_sample(attach_payload(d))


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared query: full binary→Arrow→features round trip. Features are
    byte statistics (length + first 7 byte values) so the oracle can
    recompute them with SQL byte functions."""
    d = load_table(spark, sf_dir, "documents")
    feats = extract_features(attach_payload(d))
    return feats.select(
        "media_id",
        "n_bytes",
        F.round(F.element_at("features", 1), 1).alias("f_len"),
        F.round(F.element_at("features", 2), 1).alias("f_b1"),
        F.round(F.element_at("features", 3), 1).alias("f_b2"),
    )


_DEDUP_BLOCK = 256  # fixed-size dedup block (bytes)


def q_multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared query: BLOCK-level storage dedup over the opaque BINARY
    payloads — split every payload into fixed 256-byte blocks, sha2-256
    each block, and report blocks stored ≥2 times with the bytes a
    dedup-aware store reclaims ((copies−1)·blocksize) — the
    content-addressed-storage model (Venti, ZFS dedup; production
    systems swap fixed blocks for content-defined Rabin chunking with
    the identical plan shape). Catches shared headers/prefixes across
    media that whole-file hashing misses, and needs no codec — unlike
    the decode legs there is NO stub anywhere in this path.

    Scale notes: block explode is map-side over the payload scan → one
    shuffle on the block hash with map-side partials (q_dedup_exact's
    shape at block granularity); only duplicated blocks reach the
    output."""
    d = load_table(spark, sf_dir, "documents")
    # empty-payload guard (ADVICE r9): Spark's `(n_bytes - 1) DIV 256`
    # truncates toward zero so a 0-byte payload would yield sequence(0,0)
    # and emit one spurious empty block, while DuckDB's `//` floors to -1
    # and emits none — filter n_bytes >= 1 on BOTH sides so zero bytes
    # deterministically means zero blocks in both engines.
    m = attach_payload(d).filter(F.col("meta.n_bytes") >= 1)
    blocks = m.select(
        "media_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, CAST((meta.n_bytes - 1) DIV "
                f"{_DEDUP_BLOCK} AS INT)), "
                f"i -> substring(payload, i * {_DEDUP_BLOCK} + 1, "
                f"{_DEDUP_BLOCK}))"
            )
        ).alias("block"),
    )
    return (
        blocks.select(
            F.sha2(F.col("block"), 256).alias("block_hash"),
            "media_id",
            F.octet_length("block").cast("long").alias("n_bytes"),
        )
        .groupBy("block_hash")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_copies"),
            F.count_distinct("media_id").cast("long").alias("n_media"),
            F.min("media_id").cast("long").alias("keeper_media_id"),
            F.min("n_bytes").cast("long").alias("bytes_each"),
            (F.sum("n_bytes") - F.min("n_bytes"))
            .cast("long")
            .alias("bytes_reclaimable"),
        )
        .filter(F.col("n_copies") >= 2)
    )


QUERIES = {
    "q_multimodal_dedup": q_multimodal_dedup,
    "q_multimodal_features": q_multimodal_features,
    "q_multimodal_frames": q_multimodal_frames,
    "q_multimodal_audio_windows": q_multimodal_audio_windows,
    "q_multimodal_resize": q_multimodal_resize,
}

ORACLES = {
    # same 256-byte blocks over the same bytes (payload IS the text
    # bytes; ASCII corpus: substr-by-char == substr-by-byte), same
    # sha2-256 hex, exact integer group stats
    "q_multimodal_dedup": f"""
        WITH m AS (
          SELECT doc_id AS media_id, text,
                 CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
          FROM documents
          WHERE octet_length(encode(text)) >= 1),
        b AS (
          SELECT media_id,
                 sha256(substr(text, i * {_DEDUP_BLOCK} + 1,
                               {_DEDUP_BLOCK})) AS block_hash,
                 CAST(octet_length(encode(substr(text,
                   i * {_DEDUP_BLOCK} + 1, {_DEDUP_BLOCK}))) AS BIGINT)
                   AS bn
          FROM m, unnest(generate_series(0,
                 CAST((n_bytes - 1) // {_DEDUP_BLOCK} AS INTEGER)))
               AS t(i))
        SELECT block_hash,
               CAST(COUNT(*) AS BIGINT) AS n_copies,
               CAST(COUNT(DISTINCT media_id) AS BIGINT) AS n_media,
               CAST(MIN(media_id) AS BIGINT) AS keeper_media_id,
               CAST(MIN(bn) AS BIGINT) AS bytes_each,
               CAST(SUM(bn) - MIN(bn) AS BIGINT) AS bytes_reclaimable
        FROM b
        GROUP BY block_hash
        HAVING COUNT(*) >= 2""",
    # integer pair-pooling recomputed with substring + ord arithmetic
    # (ASCII corpus: byte == codepoint); // is DuckDB integer division,
    # matching the builder's Python floor division on non-negative bytes
    "q_multimodal_resize": """
        WITH d AS (
          SELECT doc_id, text, LENGTH(text) AS n FROM documents
          WHERE LENGTH(text) >= 2),
        p AS (
          SELECT doc_id, n,
                 unnest(generate_series(0,
                   CAST(n // 2 AS INTEGER) - 1)) AS i, text
          FROM d),
        v AS (
          SELECT doc_id, n, i,
                 (ord(substr(text, i * 2 + 1, 1))
                  + ord(substr(text, i * 2 + 2, 1))) // 2 AS pooled
          FROM p)
        SELECT doc_id AS media_id,
               CAST(MAX(n) AS BIGINT) AS n_in,
               CAST(COUNT(*) AS BIGINT) AS n_out,
               CAST(SUM(pooled) AS BIGINT) AS checksum,
               CAST(MIN(pooled) AS BIGINT) AS p_min,
               CAST(MAX(pooled) AS BIGINT) AS p_max,
               CAST(MAX(CASE WHEN i = 0 THEN pooled END) AS BIGINT)
                 AS p_first
        FROM v GROUP BY 1""",
    "q_multimodal_audio_windows": f"""
        WITH d AS (
          SELECT doc_id, text, LENGTH(text) AS n FROM documents
          WHERE LENGTH(text) >= {_AUDIO_WIN}),
        w AS (
          SELECT doc_id, text,
                 unnest(generate_series(
                   0, CAST(FLOOR((n - {_AUDIO_WIN}) / {_AUDIO_HOP}.0)
                           AS INTEGER))) AS widx
          FROM d),
        s AS (
          SELECT doc_id, widx,
                 unnest(generate_series(1, {_AUDIO_WIN})) AS off, text
          FROM w),
        v AS (
          SELECT doc_id, widx,
                 ord(substr(text, widx * {_AUDIO_HOP} + off, 1)) - 128 AS x
          FROM s)
        SELECT doc_id AS media_id,
               CAST(widx AS BIGINT) AS window_idx,
               CAST(SUM(x * x) AS BIGINT) AS energy,
               CAST(MAX(ABS(x)) AS BIGINT) AS peak
        FROM v GROUP BY 1, 2""",
    # same ASCII byte==codepoint note as q_multimodal_features; frames are
    # substrings at fixed offsets, features are pure integer arithmetic
    "q_multimodal_frames": f"""
        WITH d AS (
          SELECT doc_id, text, LENGTH(text) AS n FROM documents),
        idx AS (
          SELECT doc_id, text,
                 unnest(generate_series(
                   0, CAST(CEIL(n / {_FRAME_BYTES}.0) AS INTEGER) - 1))
                   AS fidx
          FROM d),
        s AS (
          SELECT doc_id, fidx,
                 substr(text, fidx * {_FRAME_BYTES} + 1, {_FRAME_BYTES})
                   AS frame
          FROM idx WHERE fidx % {_FRAME_STRIDE} = 0),
        c AS (
          SELECT doc_id, fidx, frame,
                 unnest(generate_series(1, LENGTH(frame))) AS pos
          FROM s)
        SELECT doc_id AS media_id,
               CAST(fidx AS BIGINT) AS frame_idx,
               CAST(MAX(LENGTH(frame)) AS BIGINT) AS n_frame_bytes,
               CAST(SUM(ord(substr(frame, pos, 1))) AS BIGINT) AS sum_bytes,
               CAST(MAX(ord(substr(frame, 1, 1))) AS BIGINT) AS first_byte
        FROM c GROUP BY doc_id, fidx""",
    # byte == codepoint holds because the corpus is ASCII (closed 31-word
    # vocabulary); out-of-range positions mirror the builder's zero-padding
    # (DuckDB ord('') is -1, so the CASE guard is load-bearing for docs
    # shorter than 2 chars)
    "q_multimodal_features": """
        SELECT doc_id AS media_id,
               CAST(LENGTH(text) AS BIGINT) AS n_bytes,
               ROUND(CAST(LENGTH(text) AS DOUBLE), 1) AS f_len,
               ROUND(CASE WHEN LENGTH(text) >= 1
                          THEN CAST(ord(substr(text, 1, 1)) AS DOUBLE)
                          ELSE 0.0 END, 1) AS f_b1,
               ROUND(CASE WHEN LENGTH(text) >= 2
                          THEN CAST(ord(substr(text, 2, 1)) AS DOUBLE)
                          ELSE 0.0 END, 1) AS f_b2
        FROM documents""",
}
