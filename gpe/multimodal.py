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


_PHASH_MIN_BYTES = 64  # payloads shorter than one bit per segment skip
_PHASH_BANDS = 4  # 64-bit signature banded 4 × 16 bits
_PHASH_MAX_HAMMING = 12


def _phash_bands(media: DataFrame) -> DataFrame:
    """Block-mean perceptual-hash signature over the opaque payload
    (aHash family: Zauner 2010 'Implementation and Benchmarking of
    Perceptual Image Hash Functions'): split the payload into 64
    equal segments (byte p → segment (p·64) DIV n — every segment
    nonempty at n ≥ 64), set bit i iff segment i's mean byte EXCEEDS
    the payload mean (decided by the exact integer cross-multiply
    seg_sum·n > total·seg_len), and emit the signature as FOUR 16-bit
    band integers (bit k of band j has weight 2^(15−k)) — the
    sign-safe layout for banding and XOR. Runs in mapInPandas like
    every decode-side step in this module: Arrow batches in, one
    signature row out, partition-preserving, so the 'decode' cost
    parallelizes with the scan. A real image pHash (DCT of pixels)
    swaps only the Python body; the banding plan is unchanged."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict = {
                "media_id": [], "n_bytes": [],
                "b0": [], "b1": [], "b2": [], "b3": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                n = len(b)
                if n < _PHASH_MIN_BYTES:
                    continue
                tot = sum(b)
                seg_sum = [0] * 64
                seg_len = [0] * 64
                for p, bv in enumerate(b):
                    i = p * 64 // n
                    seg_sum[i] += bv
                    seg_len[i] += 1
                bits = [
                    1 if seg_sum[i] * n > tot * seg_len[i] else 0
                    for i in range(64)
                ]
                bands = []
                for j in range(_PHASH_BANDS):
                    v = 0
                    for k in range(16):
                        v = v * 2 + bits[j * 16 + k]
                    bands.append(v)
                out["media_id"].append(mid)
                out["n_bytes"].append(n)
                for j in range(_PHASH_BANDS):
                    out[f"b{j}"].append(bands[j])
            yield pd.DataFrame(out)

    return media.mapInPandas(
        batches,
        "media_id long, n_bytes long, b0 int, b1 int, b2 int, b3 int",
    )


def q_multimodal_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate pairs over the binary payloads:
    block-mean 64-bit signatures (_phash_bands), LSH-banded candidate
    generation (two media are candidates iff they agree EXACTLY on at
    least one of the four 16-bit bands), and an exact popcount Hamming
    verify at ≤ 12. Pigeonhole makes recall PERFECT for pairs within
    Hamming 3 (4 bands, so ≤3 differing bits leave some band clean);
    pairs at 4-12 are found iff their differences cluster away from one
    band — the standard banded-LSH recall trade-off
    (q_dedup_minhash_lsh's), tuned toward precision here because
    signature bits of byte-mean profiles are heavily correlated across
    media; more/narrower bands buys recall at candidate-volume cost.
    The near-dup complement to q_multimodal_dedup's exact block
    matching — what catches re-encoded/slightly-edited media that
    shares no exact block.

    Determinism: signatures, band joins, and popcounts are all exact
    integers; no float exists anywhere in this operator.

    Scale notes (100 TB): signatures are one mapInPandas pass over the
    payload scan (64 ints per medium — the only thing that ever
    shuffles; payloads never leave their scan); candidates come from
    4 equality-joins on (band, value) with map-side partials — never
    all-pairs — and the verify runs on the banded candidate set only
    (the q_dedup_minhash_lsh shape on bit signatures)."""
    d = load_table(spark, sf_dir, "documents")
    from gpe.common import persist_tracked

    sig = persist_tracked(_phash_bands(attach_payload(d)))
    long_form = sig.select(
        "media_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"), F.col(f"b{j}").alias("v")
                    )
                    for j in range(_PHASH_BANDS)
                ]
            )
        ).alias("band"),
    ).select("media_id", F.col("band.j").alias("j"), F.col("band.v").alias("v"))
    cand = (
        long_form.alias("x")
        .join(
            long_form.alias("y"),
            (F.col("x.j") == F.col("y.j"))
            & (F.col("x.v") == F.col("y.v"))
            & (F.col("x.media_id") < F.col("y.media_id")),
        )
        .select(
            F.col("x.media_id").alias("media_a"),
            F.col("y.media_id").alias("media_b"),
        )
        .distinct()
    )
    sa = sig.select(
        F.col("media_id").alias("media_a"),
        *[F.col(f"b{j}").alias(f"a{j}") for j in range(_PHASH_BANDS)],
    )
    sb = sig.select(
        F.col("media_id").alias("media_b"),
        *[F.col(f"b{j}").alias(f"bb{j}") for j in range(_PHASH_BANDS)],
    )
    hamming = sum(
        F.expr(f"bit_count(a{j} ^ bb{j})") for j in range(_PHASH_BANDS)
    )
    return (
        cand.join(sa, "media_a")
        .join(sb, "media_b")
        .withColumn("hamming", hamming.cast("long"))
        .filter(F.col("hamming") <= _PHASH_MAX_HAMMING)
        .select("media_a", "media_b", "hamming")
    )


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
    "q_multimodal_phash": q_multimodal_phash,
    "q_multimodal_dedup": q_multimodal_dedup,
    "q_multimodal_features": q_multimodal_features,
    "q_multimodal_frames": q_multimodal_frames,
    "q_multimodal_audio_windows": q_multimodal_audio_windows,
    "q_multimodal_resize": q_multimodal_resize,
}

ORACLES = {
    # same forward segmentation (byte p -> segment (p*64) DIV n), exact
    # cross-multiply bit rule, 2^(15-k) band weights, band-equality
    # candidates, and popcount verify — ord over the ASCII corpus
    # (byte == codepoint, the q_multimodal_resize precedent)
    "q_multimodal_phash": f"""
        WITH m AS (
          SELECT doc_id AS media_id, text,
                 CAST(octet_length(encode(text)) AS BIGINT) AS n
          FROM documents
          WHERE octet_length(encode(text)) >= {_PHASH_MIN_BYTES}),
        p AS (
          SELECT media_id, n, text,
                 unnest(generate_series(0, CAST(n - 1 AS INTEGER)))
                   AS p0
          FROM m),
        byv AS (
          SELECT media_id, n, (p0 * 64) // n AS i,
                 ord(substr(text, CAST(p0 + 1 AS INTEGER), 1)) AS bv
          FROM p),
        seg AS (
          SELECT media_id, n, i, SUM(bv) AS s, COUNT(*) AS c
          FROM byv GROUP BY 1, 2, 3),
        tot AS (SELECT media_id, SUM(bv) AS t FROM byv GROUP BY 1),
        bits AS (
          SELECT seg.media_id, seg.i,
                 CASE WHEN seg.s * seg.n > tot.t * seg.c
                      THEN 1 ELSE 0 END AS bit
          FROM seg JOIN tot ON seg.media_id = tot.media_id),
        bandl AS (
          SELECT media_id, CAST(i // 16 AS INTEGER) AS j,
                 CAST(SUM(bit * (1 << CAST(15 - (i % 16) AS INTEGER)))
                      AS INTEGER) AS v
          FROM bits GROUP BY 1, 2),
        sig AS (
          SELECT media_id,
                 MAX(CASE WHEN j = 0 THEN v END) AS b0,
                 MAX(CASE WHEN j = 1 THEN v END) AS b1,
                 MAX(CASE WHEN j = 2 THEN v END) AS b2,
                 MAX(CASE WHEN j = 3 THEN v END) AS b3
          FROM bandl GROUP BY 1),
        cand AS (
          SELECT DISTINCT x.media_id AS media_a, y.media_id AS media_b
          FROM bandl x JOIN bandl y
            ON x.j = y.j AND x.v = y.v
               AND x.media_id < y.media_id),
        verified AS (
          SELECT media_a, media_b,
                 CAST(bit_count(xor(sa.b0, sb.b0))
                      + bit_count(xor(sa.b1, sb.b1))
                      + bit_count(xor(sa.b2, sb.b2))
                      + bit_count(xor(sa.b3, sb.b3)) AS BIGINT)
                   AS hamming
          FROM cand
          JOIN sig sa ON cand.media_a = sa.media_id
          JOIN sig sb ON cand.media_b = sb.media_id)
        SELECT media_a, media_b, hamming
        FROM verified WHERE hamming <= {_PHASH_MAX_HAMMING}""",
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
