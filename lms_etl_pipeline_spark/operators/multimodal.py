"""Multimodal column operators: opaque binary payloads + typed metadata,
processed with Arrow-batched ``mapInPandas`` (SURVEY.md §2.12 last row).

The container ships no image/audio codecs (PIL/ffmpeg/librosa), so the
*decode* step is stubbed two ways, per the build contract:

- ``decode=\"real\"`` raises ``NotImplementedError`` with the exact
  dependency needed — the seam where PIL/torchvision plugs in;
- ``decode=\"fake\"`` (default) derives deterministic pseudo-features from
  the bytes themselves (length, md5, byte-histogram stats).  Deliberately
  SQL-expressible so the whole mapInPandas pipeline — schema handling,
  Arrow batch transfer, per-batch vectorized compute — is differentially
  testable against DuckDB (see ``plans.multimodal``).

Everything Spark-side is real and scale-shaped: explicit output schemas,
bounded Arrow batches (``spark.sql.execution.arrow.maxRecordsPerBatch``),
per-partition streaming iteration (never a full-partition materialization),
and fan-out (frame sampling) emitted incrementally per batch.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _segment_stat(payloads: pd.Series, lengths: pd.Series, stat: str) -> pd.Series:
    """Vectorized per-payload byte statistic for one Arrow batch.

    Concatenates the batch's payloads into ONE uint8 array and reduces
    each payload's segment with ``np.add.reduceat`` — no per-byte Python
    loop, so the fake featurizer's cost profile matches the module's
    batch-compute story (a real codec would likewise crunch the whole
    batch in native code).  Empty payloads yield NaN (NULL after Arrow).
    """
    n = lengths.to_numpy()
    if len(n) == 0:
        return pd.Series([], dtype="float64")
    arr = np.frombuffer(b"".join(payloads), dtype=np.uint8)
    vals = arr.astype(np.float64)
    if stat == "rms":
        vals = vals * vals
    # reduceat needs each segment's start offset; an empty segment at
    # offset i would wrongly grab the next segment's first element, so
    # compute on the nonempty subset and scatter back.
    nonempty = n > 0
    starts = np.concatenate(([0], np.cumsum(n)[:-1]))[nonempty]
    out = np.full(len(n), np.nan)
    if starts.size:
        sums = np.add.reduceat(vals, starts)
        means = sums / n[nonempty]
        out[nonempty] = np.sqrt(means) if stat == "rms" else means
    return pd.Series(out)

#: Output schema of ``decode_image_features``.
IMAGE_FEATURES_SCHEMA = (
    "id BIGINT, payload_bytes BIGINT, payload_md5 STRING, "
    "pseudo_width INT, pseudo_height INT, mean_byte DOUBLE"
)

#: Output schema of ``sample_frames`` (fan-out: one row per sampled frame).
FRAME_SAMPLE_SCHEMA = "id BIGINT, frame_idx INT, frame_bytes BIGINT, frame_md5 STRING"


def with_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Adapter: treat a text column as an opaque binary payload column —
    the fixture stand-in for real image/audio bytes.

    No forced repartition: mapInPandas parallelism follows the source's
    splits, which is right at scale (a 100 TB table arrives well-split) —
    and measured locally, shuffling a small input to 32 Python workers
    costs more in worker spin-up than the parallelism buys.
    """
    return df.select(
        F.col(id_col).alias("id"), F.encode(F.col(text_col), "UTF-8").alias("payload")
    )


def decode_image_features(df: DataFrame, decode: str = "fake") -> DataFrame:
    """Per-image feature extraction over a binary column via mapInPandas.

    ``fake`` decode derives: payload size, content md5, a deterministic
    pseudo width/height (bytes mod 509 / mod 293 — coprime so the pair
    varies), and the mean byte value (the vectorized-batch-compute part).
    """
    if decode == "real":  # pragma: no cover - codec not shipped in this env
        raise NotImplementedError(
            "real image decode requires PIL/torchvision; install one and "
            "replace _fake_image_batch with Image.open over io.BytesIO"
        )
    if decode != "fake":
        raise ValueError(f"decode must be 'fake' or 'real', got {decode!r}")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            n = payloads.str.len().astype("int64")
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "payload_bytes": n,
                    "payload_md5": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
                    "pseudo_width": (n % 509).astype("int32"),
                    "pseudo_height": (n % 293).astype("int32"),
                    "mean_byte": _segment_stat(payloads, n, "mean"),
                }
            )

    return df.mapInPandas(extract, IMAGE_FEATURES_SCHEMA)


def sample_frames(df: DataFrame, frame_size: int = 256, max_frames: int = 8) -> DataFrame:
    """Frame sampling for video-like payloads: split the byte stream into
    fixed-size frames, keep the first ``max_frames``, one output row each.

    The mapInPandas generator emits each input batch's frames incrementally
    — fan-out never materializes more than one Arrow batch of output, which
    is what makes this safe when one 'video' is large.
    """

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"id": [], "frame_idx": [], "frame_bytes": [], "frame_md5": []}
            for vid, payload in zip(pdf["id"], pdf["payload"]):
                n_frames = min((len(payload) + frame_size - 1) // frame_size, max_frames)
                for i in range(n_frames):
                    chunk = payload[i * frame_size : (i + 1) * frame_size]
                    out["id"].append(vid)
                    out["frame_idx"].append(i)
                    out["frame_bytes"].append(len(chunk))
                    out["frame_md5"].append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(out)

    return df.mapInPandas(frames, FRAME_SAMPLE_SCHEMA)


def resize_images(df: DataFrame, target_bytes: int = 1024, decode: str = "fake") -> DataFrame:
    """Resize stub: real path names its dependency; fake path 'resizes' by
    deterministic stride subsampling of the byte stream to ``target_bytes``
    — preserving the mapInPandas shape of a real resize (binary in,
    smaller binary out, per-batch vectorized)."""
    if decode == "real":  # pragma: no cover
        raise NotImplementedError(
            "real image resize requires PIL (Image.resize); install it and "
            "replace the stride subsampler"
        )
    schema = "id BIGINT, payload BINARY, orig_bytes BIGINT, resized_bytes BIGINT"

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"id": [], "payload": [], "orig_bytes": [], "resized_bytes": []}
            for vid, payload in zip(pdf["id"], pdf["payload"]):
                n = len(payload)
                stride = max(n // target_bytes, 1)
                small = payload[::stride][:target_bytes]
                out["id"].append(vid)
                out["payload"].append(small)
                out["orig_bytes"].append(n)
                out["resized_bytes"].append(len(small))
            yield pd.DataFrame(out)

    return df.mapInPandas(resize, schema)


def decode_audio_features(df: DataFrame, decode: str = "fake") -> DataFrame:
    """Audio stub: same contract as images (real path names its dependency)."""
    if decode == "real":  # pragma: no cover
        raise NotImplementedError(
            "real audio decode requires soundfile/librosa; install one and "
            "replace the fake featureizer"
        )
    schema = "id BIGINT, payload_bytes BIGINT, pseudo_duration_s DOUBLE, rms_byte DOUBLE"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["payload"].str.len().astype("int64")
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "payload_bytes": n,
                    # pretend 16 kHz 16-bit mono
                    "pseudo_duration_s": n / 32000.0,
                    "rms_byte": _segment_stat(pdf["payload"], n, "rms"),
                }
            )

    return df.mapInPandas(extract, schema)
