"""Multimodal (binary-payload) operators — training-data pipeline
extensions beyond the reference surface (SURVEY.md §7 phase E).

Model: image/audio/video are opaque ``binary`` columns with typed metadata
alongside. Since no decode libraries ship in this container, the decode
step is STUBBED (``decode_image`` below raises ``NotImplementedError``
unless PIL appears), but everything Spark-side is real and tested: the
binary column, the Arrow `mapInPandas` batch plumbing (payload crosses the
JVM→Python boundary as Arrow binary arrays, processed a whole record-batch
at a time), the typed output schema, and the deterministic fake
feature-extraction the tests and oracles pin down.

Scale notes:
- Payload and metadata are separate columns so metadata-only queries prune
  the binary column out of the parquet scan entirely (ReadSchema check).
- ``mapInPandas`` is a narrow map — no shuffle; partition sizing for big
  blobs is governed by ``spark.sql.files.maxPartitionBytes``, and the
  iterator-of-batches signature means Python never materializes a whole
  partition, only one Arrow batch at a time.
- The corpus is ASCII text re-encoded as bytes, so the DuckDB oracle can
  recompute every fake feature exactly with ``ascii()`` arithmetic.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._registry import make_registry
from ._tables import load

QUERIES: dict = {}
_q = make_registry(QUERIES)

_FRAME_STRIDE = 16  # "frame sample": every 16th byte of the payload


def decode_image(data: bytes):
    """Real image decode — STUB. The container has no imaging libraries;
    at deployment, install pillow and this works unchanged. Tests assert
    the NotImplementedError contract."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires pillow, which is not installed in this "
            "environment; mm_* queries use the deterministic fake features"
        ) from exc
    import io

    from PIL import Image

    return Image.open(io.BytesIO(data))


def _payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with the text re-encoded as an opaque binary payload.

    Deliberately NOT spread to cluster width: A/B at sf0.1 measured a
    round-robin repartition a net loss for the mapInPandas consumers
    (0.65 -> 0.82 s on mm_dedup_ahash — dispatching 32 Python worker
    batches costs more than the single-worker decode it parallelizes at
    this payload size). At real scale the input splits wide on its own.
    """
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", F.col("text").cast("binary").alias("payload"))


# ------------------------------------------------- mm_binary_features
# Deterministic fake "decode": byte length, first byte, additive checksum.
def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        payload = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payload.map(len).astype("int64"),
                "first_byte": payload.map(lambda b: b[0] if b else None).astype(
                    "int64"
                ),
                "checksum": payload.map(lambda b: sum(b) % 65536).astype("int64"),
            }
        )


@_q(
    "mm_binary_features",
    """
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           ascii(substr(text, 1, 1)) AS first_byte,
           CAST(list_sum([ascii(text[i]) FOR i IN range(1, length(text) + 1)])
                % 65536 AS BIGINT) AS checksum
    FROM documents
    """,
)
def mm_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _payload(spark, sf_dir).mapInPandas(
        _extract_features,
        "doc_id long, n_bytes long, first_byte long, checksum long",
    )


# --------------------------------------------------- mm_frame_sample
# "Video frame sampling" over the payload: every 16th byte is a frame;
# emit the frame count and the checksum of the sampled frames.
def _sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        frames = pdf["payload"].map(lambda b: b[::_FRAME_STRIDE])
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_frames": frames.map(len).astype("int64"),
                "frame_checksum": frames.map(lambda f: sum(f) % 65536).astype(
                    "int64"
                ),
            }
        )


@_q(
    "mm_frame_sample",
    f"""
    SELECT doc_id,
           len(range(1, length(text) + 1, {_FRAME_STRIDE})) AS n_frames,
           CAST(list_sum([ascii(text[i])
                          FOR i IN range(1, length(text) + 1, {_FRAME_STRIDE})])
                % 65536 AS BIGINT) AS frame_checksum
    FROM documents
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _payload(spark, sf_dir).mapInPandas(
        _sample_frames,
        "doc_id long, n_frames long, frame_checksum long",
    )


# ------------------------------------------------------ mm_resize_pool
# "Resize" over the opaque payload: mean-pool the byte stream into a
# fixed THUMB-cell thumbnail (cell k covers bytes [k*n/T, (k+1)*n/T));
# the real-image analogue is area-interpolation resize, and the Spark
# plumbing (Arrow batch in, exploded typed rows out, narrow map) is
# exactly what a pillow-backed resize would use. Cells are integer means
# (floor), so the DuckDB oracle matches bit-for-bit; payloads shorter
# than THUMB bytes leave their empty cells NULL.
_THUMB = 32


def _resize_pool(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    rows: dict[str, list] = {"doc_id": [], "cell": [], "v": []}
    for pdf in batches:
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n = len(payload)
            for k in range(_THUMB):
                lo = (k * n) // _THUMB
                hi = ((k + 1) * n) // _THUMB
                rows["doc_id"].append(doc_id)
                rows["cell"].append(k)
                rows["v"].append(
                    sum(payload[lo:hi]) // (hi - lo) if hi > lo else None
                )
        yield pd.DataFrame(rows)
        rows = {"doc_id": [], "cell": [], "v": []}


@_q(
    "mm_resize_pool",
    f"""
    SELECT doc_id, cell,
           CASE WHEN hi > lo
                THEN CAST(list_sum([ascii(text[i])
                                    FOR i IN range(lo + 1, hi + 1)])
                          // (hi - lo) AS BIGINT)
           END AS v
    FROM (
        SELECT doc_id, text, cell,
               (cell * length(text)) // {_THUMB} AS lo,
               ((cell + 1) * length(text)) // {_THUMB} AS hi
        FROM (
            SELECT doc_id, text,
                   unnest(generate_series(0, {_THUMB} - 1)) AS cell
            FROM documents
        )
    )
    """,
)
def mm_resize_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _payload(spark, sf_dir).mapInPandas(
        _resize_pool, "doc_id long, cell int, v long"
    )


# ---------------------------------------------------------- mm_ahash
# Perceptual average-hash over the pooled thumbnail (the classic aHash
# image near-dup signature): bit k = 1 iff cell k's mean exceeds the
# mean of the cells — re-encoded payloads with small local edits land on
# the same 32-bit signature. Emits each doc's signature plus its
# signature-bucket size (docs sharing a hash = near-dup candidates): the
# multimodal twin of dedup_exact's hash-groupBy, with the signature
# shuffle carrying 8-byte hashes only. Cell means integer-floor like
# mm_resize_pool; the cells-mean threshold is an exact int-sum/count
# double, bit-identical in both engines; strict > leaves NULL (short
# payload) cells as 0-bits.
def _ahash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out: dict[str, list] = {"doc_id": [], "ahash": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n = len(payload)
            cells = []
            for k in range(_THUMB):
                lo = (k * n) // _THUMB
                hi = ((k + 1) * n) // _THUMB
                cells.append(
                    sum(payload[lo:hi]) // (hi - lo) if hi > lo else None
                )
            present = [c for c in cells if c is not None]
            m = sum(present) / len(present) if present else 0.0
            sig = 0
            for k, c in enumerate(cells):
                if c is not None and c > m:
                    sig |= 1 << k
            out["doc_id"].append(doc_id)
            out["ahash"].append(sig)
        yield pd.DataFrame(out)


@_q(
    "mm_ahash",
    f"""
    WITH cells AS (
        SELECT doc_id, cell,
               CASE WHEN hi > lo
                    THEN CAST(list_sum([ascii(text[i])
                                        FOR i IN range(lo + 1, hi + 1)])
                              // (hi - lo) AS BIGINT)
               END AS v
        FROM (
            SELECT doc_id, text, cell,
                   (cell * length(text)) // {_THUMB} AS lo,
                   ((cell + 1) * length(text)) // {_THUMB} AS hi
            FROM (
                SELECT doc_id, text,
                       unnest(generate_series(0, {_THUMB} - 1)) AS cell
                FROM documents
            )
        )
    ),
    sig AS (
        SELECT doc_id,
               CAST(sum(CASE WHEN v IS NOT NULL AND v > m
                             THEN 1 << cell ELSE 0 END) AS BIGINT) AS ahash
        FROM (
            SELECT doc_id, cell, v,
                   avg(v) OVER (PARTITION BY doc_id) AS m
            FROM cells
        )
        GROUP BY doc_id
    )
    SELECT doc_id, ahash,
           count(*) OVER (PARTITION BY ahash) AS n_same_hash
    FROM sig
    """,
)
def mm_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    sig = _payload(spark, sf_dir).mapInPandas(
        _ahash, "doc_id long, ahash long"
    )
    return sig.select(
        "doc_id", "ahash",
        F.count("*").over(Window.partitionBy("ahash")).alias("n_same_hash"),
    )


# ----------------------------------------------------- mm_audio_energy
# "Audio" frame-energy analysis over the opaque payload: bytes are PCM
# samples (bias 96 ≈ the lowercase-ASCII center), cut into full W=32
# sample frames; per-frame RMS energy drives a VAD-style voiced flag.
# This is the energy/VAD pass an audio curation pipeline runs before
# transcription — here with the deterministic byte "decode" standing in
# for a real codec (swap `_frame_energy`'s inner loop for soundfile/
# librosa at deployment; the Spark plumbing is identical).
#
# Scale shape: a narrow `mapInPandas` pass (Arrow batches in, one typed
# row per doc out — no shuffle, no collect); the `n_chars >= W` guard is
# a PUSHED parquet filter, so undersized payloads never cross the
# JVM→Python boundary. Float parity with the oracle: per-frame energy
# accumulates in exact int arithmetic, /W is a power-of-two division,
# sqrt is IEEE-correct in both engines, the per-doc mean folds frames
# left-to-right in frame order, and rounding is explicit half-up (both
# engines' round() on positive doubles).
_AUDIO_W = 32
_AUDIO_VOICED_RMS = 25.0


def _round6(x: float) -> float:
    import math

    return math.floor(x * 1e6 + 0.5) / 1e6


def _frame_energy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import math

    for pdf in batches:
        out = {"doc_id": [], "n_frames": [], "n_voiced": [],
               "avg_rms": [], "peak_rms": []}
        for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
            n = len(b) // _AUDIO_W
            acc, peak, voiced = 0.0, 0.0, 0
            for w in range(n):
                e = 0
                for x in b[w * _AUDIO_W : (w + 1) * _AUDIO_W]:
                    e += (x - 96) * (x - 96)
                rms = math.sqrt(e / float(_AUDIO_W))
                acc += rms
                peak = rms if rms > peak else peak
                voiced += rms >= _AUDIO_VOICED_RMS
            out["doc_id"].append(doc_id)
            out["n_frames"].append(n)
            out["n_voiced"].append(voiced)
            out["avg_rms"].append(_round6(acc / n))
            out["peak_rms"].append(_round6(peak))
        yield pd.DataFrame(out)


@_q(
    "mm_audio_energy",
    f"""
    WITH w AS (
      SELECT doc_id, wi.w AS w,
             sqrt(list_sum([(ascii(text[wi.w * {_AUDIO_W} + i]) - 96)
                            * (ascii(text[wi.w * {_AUDIO_W} + i]) - 96)
                            FOR i IN range(1, {_AUDIO_W} + 1)])
                  / {_AUDIO_W}.0) AS rms
      FROM documents,
           LATERAL (SELECT unnest(range(0, length(text) // {_AUDIO_W})) AS w) wi
      WHERE n_chars >= {_AUDIO_W})
    SELECT doc_id,
           count(*) AS n_frames,
           CAST(count(CASE WHEN rms >= {_AUDIO_VOICED_RMS} THEN 1 END)
                AS BIGINT) AS n_voiced,
           round(list_sum(list(rms ORDER BY w)) / count(*), 6) AS avg_rms,
           round(max(rms), 6) AS peak_rms
    FROM w GROUP BY doc_id
    """,
)
def mm_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(
        F.col("n_chars") >= _AUDIO_W
    )
    return d.select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    ).mapInPandas(
        _frame_energy,
        "doc_id long, n_frames long, n_voiced long, "
        "avg_rms double, peak_rms double",
    )


# ---------------------------------------------------- mm_scene_detect
# "Video" scene-cut detection over the opaque payload: consecutive
# _SCENE_W-byte blocks are frames, each frame's intensity is its integer
# mean byte (floor), and a SCENE CUT fires where the intensity jumps by
# >= _SCENE_CUT between adjacent frames — the shot-boundary pass a video
# curation pipeline runs to pick one keyframe per scene instead of
# blindly striding (mm_frame_sample). Per doc: frame count, scene count
# (cuts + 1), and the longest scene run — the inputs a frame-sampling
# budget needs. A real decoder slots into the same loop (the per-frame
# feature becomes a histogram/HSV delta; the Spark plumbing is
# identical).
#
# Scale shape: one narrow `mapInPandas` pass — the cut logic is
# per-doc-sequential (frames live INSIDE the row), so it runs in the
# Arrow batch with zero shuffle and one typed row out per doc; the
# n_chars guard is a pushed parquet filter. All-integer frame means and
# deltas, so the oracle replays the cuts exactly.
_SCENE_W = 32   # bytes per frame
_SCENE_CUT = 2  # abs(mean delta) >= this starts a new scene


def _scene_detect(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {"doc_id": [], "n_frames": [], "n_scenes": [], "max_scene": []}
        for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
            n = len(b) // _SCENE_W
            means = [
                sum(b[w * _SCENE_W : (w + 1) * _SCENE_W]) // _SCENE_W
                for w in range(n)
            ]
            scenes, run, max_run = 1, 1, 1
            for i in range(1, n):
                if abs(means[i] - means[i - 1]) >= _SCENE_CUT:
                    scenes += 1
                    run = 1
                else:
                    run += 1
                max_run = run if run > max_run else max_run
            out["doc_id"].append(doc_id)
            out["n_frames"].append(n)
            out["n_scenes"].append(scenes)
            out["max_scene"].append(max_run)
        yield pd.DataFrame(out)


@_q(
    "mm_scene_detect",
    f"""
    WITH f AS (
      SELECT doc_id, wi.w AS w,
             list_sum([ascii(text[wi.w * {_SCENE_W} + i])
                       FOR i IN range(1, {_SCENE_W} + 1)]) // {_SCENE_W} AS m
      FROM documents,
           LATERAL (SELECT unnest(range(0, length(text) // {_SCENE_W})) AS w) wi
      WHERE n_chars >= {_SCENE_W}),
    d AS (
      SELECT doc_id, w,
             CASE WHEN w = 0 THEN 0
                  WHEN abs(m - lag(m) OVER (PARTITION BY doc_id ORDER BY w))
                       >= {_SCENE_CUT} THEN 1
                  ELSE 0 END AS cut
      FROM f),
    s AS (
      SELECT doc_id, w, cut,
             sum(cut) OVER (PARTITION BY doc_id ORDER BY w
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS scene_id
      FROM d)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_frames,
           CAST(count(DISTINCT scene_id) AS BIGINT) AS n_scenes,
           CAST(max(scene_len) AS BIGINT) AS max_scene
    FROM (
      SELECT doc_id, scene_id,
             count(*) OVER (PARTITION BY doc_id, scene_id) AS scene_len
      FROM s) t
    GROUP BY doc_id
    """,
)
def mm_scene_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(
        F.col("n_chars") >= _SCENE_W
    )
    return d.select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    ).mapInPandas(
        _scene_detect,
        "doc_id long, n_frames long, n_scenes long, max_scene long",
    )


# ----------------------------------------------------- mm_clip_filter
# Image-caption alignment filtering — the CLIP-score gate a multimodal
# pair corpus runs before training (LAION-style: score every
# (image, caption) pair, keep the aligned ones). The caption is the
# document's leading 64 bytes; the "CLIP" embeddings are the declared
# deterministic fake (real encoders are a model-serving concern, not a
# Spark one): each modality maps to a 4-dim integer vector
# [sum % 97, len % 101, first_byte, sum % 53] and the score is their
# cosine in parts-per-million, floored to an exact BIGINT so both
# engines agree bit-for-bit (inputs are exact ints; sqrt/divide/floor
# run in the same order on the same doubles).
#
# Scale shape: identical to the other decodes — the n_chars guard is a
# PUSHED parquet filter, the scan reads only doc_id/text/n_chars, and
# the whole scorer is ONE narrow Arrow map (no shuffle); the keep/drop
# verdict is a flag, not a filter, so downstream can audit the
# rejected half (the curation_verdict contract).
_CLIP_MIN_PPM = 940_000  # ~median of the corpus score distribution


def _clip_vec(b: bytes) -> tuple[int, int, int, int]:
    s = sum(b)
    return (s % 97, len(b) % 101, b[0], s % 53)


def _clip_score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import math

    def score(b: bytes) -> int:
        a = _clip_vec(b)
        c = _clip_vec(b[:64])
        dot = sum(x * y for x, y in zip(a, c))
        na = math.sqrt(sum(x * x for x in a))
        nc = math.sqrt(sum(x * x for x in c))
        return math.floor(1000000.0 * dot / (na * nc))

    for pdf in batches:
        ppm = pdf["payload"].map(score).astype("int64")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "score_ppm": ppm,
                "is_aligned": ppm >= _CLIP_MIN_PPM,
            }
        )


@_q(
    "mm_clip_filter",
    f"""
    WITH c AS (
      SELECT doc_id, text, substr(text, 1, 64) AS cap
      FROM documents WHERE n_chars >= 1),
    v AS (
      SELECT doc_id,
             CAST(list_sum([ascii(text[i]) FOR i IN range(1, length(text) + 1)])
                  AS BIGINT) AS ps,
             CAST(length(text) AS BIGINT) AS pl,
             ascii(substr(text, 1, 1)) AS pf,
             CAST(list_sum([ascii(cap[i]) FOR i IN range(1, length(cap) + 1)])
                  AS BIGINT) AS cs,
             CAST(length(cap) AS BIGINT) AS cl,
             ascii(substr(cap, 1, 1)) AS cf
      FROM c),
    w AS (
      SELECT doc_id,
             ps % 97 AS a1, pl % 101 AS a2, pf AS a3, ps % 53 AS a4,
             cs % 97 AS b1, cl % 101 AS b2, cf AS b3, cs % 53 AS b4
      FROM v)
    SELECT doc_id,
           CAST(floor(1000000.0 * (a1*b1 + a2*b2 + a3*b3 + a4*b4)
                / (sqrt(a1*a1 + a2*a2 + a3*a3 + a4*a4)
                   * sqrt(b1*b1 + b2*b2 + b3*b3 + b4*b4))) AS BIGINT)
             AS score_ppm,
           CAST(floor(1000000.0 * (a1*b1 + a2*b2 + a3*b3 + a4*b4)
                / (sqrt(a1*a1 + a2*a2 + a3*a3 + a4*a4)
                   * sqrt(b1*b1 + b2*b2 + b3*b3 + b4*b4))) AS BIGINT)
             >= {_CLIP_MIN_PPM} AS is_aligned
    FROM w
    """,
)
def mm_clip_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    pairs = d.filter(F.col("n_chars") >= 1).select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    return pairs.mapInPandas(
        _clip_score, "doc_id long, score_ppm long, is_aligned boolean"
    )


# ------------------------------------------------------ mm_dedup_ahash
# Image near-duplicate detection over the aHash signatures: banded
# hamming LSH, the image twin of dedup_minhash_lsh. The 32-bit signature
# splits into 4 disjoint 8-bit bands; by pigeonhole, any pair within
# hamming radius 3 shares at least one UNTOUCHED band — so an exact
# equi-join per band finds every candidate (the banding is EXACT for
# r <= 3, not approximate), and bit_count(xor) verifies the true distance
# on candidates only. Scale shape: the Python aHash pass runs ONCE into a
# localCheckpoint (per-doc 12-byte rows — the minhash signature-table
# contract; re-deriving it per join side would re-decode every payload
# twice), the band probe is a hash equi-join on (band, 8-bit value) — no
# all-pairs path anywhere — and pair dedup (a pair can collide in up to 4
# bands) is deferred PAST the cheap verify. Engine parity: signatures,
# xor, and popcount are exact integer ops in both engines.
_AHASH_BANDS = 4
_AHASH_RADIUS = 3


@_q(
    "mm_dedup_ahash",
    f"""
    WITH cells AS (
        SELECT doc_id, cell,
               CASE WHEN hi > lo
                    THEN CAST(list_sum([ascii(text[i])
                                        FOR i IN range(lo + 1, hi + 1)])
                              // (hi - lo) AS BIGINT)
               END AS v
        FROM (
            SELECT doc_id, text, cell,
                   (cell * length(text)) // {_THUMB} AS lo,
                   ((cell + 1) * length(text)) // {_THUMB} AS hi
            FROM (
                SELECT doc_id, text,
                       unnest(generate_series(0, {_THUMB} - 1)) AS cell
                FROM documents
            )
        )
    ),
    sig AS (
        SELECT doc_id,
               CAST(sum(CASE WHEN v IS NOT NULL AND v > m
                             THEN 1 << cell ELSE 0 END) AS BIGINT) AS ahash
        FROM (
            SELECT doc_id, cell, v,
                   avg(v) OVER (PARTITION BY doc_id) AS m
            FROM cells
        )
        GROUP BY doc_id
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.ahash, b.ahash)) AS BIGINT) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.ahash, b.ahash)) <= {_AHASH_RADIUS}
    """,
)
def mm_dedup_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = (
        _payload(spark, sf_dir)
        .mapInPandas(_ahash, "doc_id long, ahash long")
        .localCheckpoint(eager=False)
    )
    bands = sig.select(
        "doc_id", "ahash",
        F.posexplode(
            F.array(*[
                F.expr(f"CAST((ahash >> {8 * k}) & 255 AS INT)")
                for k in range(_AHASH_BANDS)
            ])
        ).alias("band", "bval"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bval") == F.col("b.bval"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr(
                "CAST(bit_count(a.ahash ^ b.ahash) AS BIGINT)"
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= _AHASH_RADIUS)
        .distinct()
    )
