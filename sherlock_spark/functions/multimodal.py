"""Multimodal (image/audio/video) column plumbing.

Opaque media live as ``binary`` columns with typed metadata; decode and
feature extraction run as Arrow-batched ``mapInPandas`` stages. The
decode step is pluggable: ``default_image_decoder`` resolves to PIL
when the library is importable and to the deterministic md5 stub
otherwise, so a real cluster upgrades in place by installing PIL — the
schema, partitioning, UDF signature and batch shape are production
code either way and are tested (the swap point itself is pinned by
``tests/test_preprocess_and_sources.py``).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("feature", T.ArrayType(T.DoubleType()), False),
        T.StructField("content_hash", T.StringType(), False),
    ]
)

FEATURE_DIM = 16


def _decode_image_bytes(payload: bytes) -> np.ndarray:
    """STUB decode (the default when no real decoder is installed).
    Deterministic fake: a 16-dim feature from the payload's md5 bytes,
    L2-normalized, double precision — keeps downstream similarity
    search exercisable AND SQL-replayable (the driver oracle recomputes
    it from the md5 hex in DuckDB)."""
    digest = hashlib.md5(payload or b"").digest()
    vec = np.frombuffer(digest, dtype=np.uint8).astype(np.float64)
    norm = float(np.linalg.norm(vec)) or 1.0
    return vec / norm


def pil_image_decoder(side: int = 4):
    """Real image decoder factory: PIL if importable, else ImportError.
    Decodes to grayscale, resizes to ``side``x``side``, flattens and
    L2-normalizes — same output contract as the stub (1-D float64,
    unit norm), so the swap is transparent to every downstream stage.
    """
    import io

    from PIL import Image  # raises ImportError when PIL is absent

    def decode(payload: bytes) -> np.ndarray:
        # only image-kind rows reach this decoder (kind dispatch in
        # extract_media_features); a genuinely corrupt image payload
        # should FAIL the task visibly, not silently hash-feature it
        image = Image.open(io.BytesIO(payload)).convert("L").resize((side, side))
        vec = np.asarray(image, dtype=np.float64).reshape(-1)
        norm = float(np.linalg.norm(vec)) or 1.0
        return vec / norm

    return decode


def default_image_decoder():
    """The decoder ``extract_media_features`` uses when none is passed:
    PIL when the library is importable, the md5 stub otherwise — the
    in-place upgrade path for a real cluster (no code change, just
    install PIL). Pass ``decoder=_decode_image_bytes`` explicitly where
    the stub's SQL-replayable output is the contract (driver oracle).
    """
    try:
        return pil_image_decoder()
    except ImportError:
        return _decode_image_bytes


def extract_media_features(
    media: DataFrame, batch_hint: int = 256, decoder=None
) -> DataFrame:
    """media (MEDIA_SCHEMA) -> per-item feature rows (FEATURE_SCHEMA).

    ``mapInPandas``: whole-batch processing so a real decoder can
    vectorize/pin threads per batch; binary payloads never leave the
    executor as Python objects row-by-row. ``decoder`` defaults to
    ``default_image_decoder()`` (PIL when available, stub otherwise);
    it must map bytes -> 1-D float64 ndarray.
    """
    if decoder is None:
        decoder = default_image_decoder()

    # explicit projection BEFORE the opaque Python stage: Spark cannot
    # see which columns ``process`` touches, so without this every
    # media column (mime, dims, duration) would cross the Arrow
    # boundary — and column pruning at the scan would be defeated
    # (guide §4: pass only the columns the function needs). spread():
    # a single-row-group scan otherwise serializes the whole decode
    # stage on one core.
    from sherlock_spark.functions.spread import spread

    media = spread(media.select("media_id", "kind", "payload"))

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            features = []
            hashes = []
            sizes = []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                data = bytes(payload) if payload is not None else b""
                sizes.append(len(data))
                hashes.append(hashlib.md5(data).hexdigest())
                # kind dispatch: the decoder is an IMAGE decoder; audio/
                # video (and empty payloads) take the deterministic stub
                # so a real PIL install never feeds non-image bytes to
                # Image.open — and never silently mixes pixel features
                # with hash features within the image kind (a corrupt
                # image raises in the decoder instead)
                if kind == "image" and data:
                    vec = decoder(data)
                else:
                    vec = _decode_image_bytes(data)
                features.append(vec.tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pd.Series(sizes, dtype="int32"),
                    "feature": features,
                    "content_hash": hashes,
                }
            )

    return media.mapInPandas(process, schema=FEATURE_SCHEMA)


def resize_plan(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Aspect-preserving resize plumbing: computes the real target
    dimensions per image JVM-side (the decision logic a resize stage
    needs); the pixel transform itself is the stubbed decode step. Rows
    without known dimensions pass through unplanned (target = NULL).
    """
    from pyspark.sql import functions as F

    w = F.col("width").cast("double")
    h = F.col("height").cast("double")
    scale = F.lit(float(max_side)) / F.greatest(w, h)
    needs = (F.col("width") > max_side) | (F.col("height") > max_side)
    target_w = F.when(needs, F.round(w * scale)).otherwise(w).cast("int")
    target_h = F.when(needs, F.round(h * scale)).otherwise(h).cast("int")
    return media.withColumn(
        "target_width", F.when(w.isNotNull() & h.isNotNull(), target_w)
    ).withColumn(
        "target_height", F.when(w.isNotNull() & h.isNotNull(), target_h)
    )


def chunk_audio(
    media: DataFrame, window_ms: int = 5000, hop_ms: int = 2500
) -> DataFrame:
    """Audio windowing plumbing: one row per (overlapping) analysis
    window — the batch shape a real torchaudio featurizer consumes."""
    from pyspark.sql import functions as F

    audio = media.filter(F.col("kind") == "audio")
    starts = F.sequence(
        F.lit(0),
        F.greatest(
            F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)
        ),
        F.lit(hop_ms),
    )
    return audio.select(
        "media_id",
        F.explode(starts).alias("chunk_start_ms"),
        F.coalesce(F.col("duration_ms"), F.lit(0)).alias("_dur"),
    ).select(
        "media_id",
        "chunk_start_ms",
        F.least(
            F.col("chunk_start_ms") + window_ms, F.col("_dur")
        ).alias("chunk_end_ms"),
    )


def media_similarity_topk(media: DataFrame, k: int = 5) -> DataFrame:
    """Embedding-similarity over media features end-to-end: decode ->
    feature vector -> exact cosine top-k (swap in lsh_topk_cosine at
    corpus scale). Near-duplicate media surface as cos ≈ 1 pairs."""
    from sherlock_spark.functions.similarity import cosine_topk

    features = extract_media_features(media).select(
        "media_id", "feature"
    )
    return cosine_topk(
        features, features, k=k, id_col="media_id", vec_col="feature"
    )


def sample_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video rows: one output row per
    sampled timestamp (real decoder would attach the frame payload).
    """
    from pyspark.sql import functions as F

    video = media.filter(F.col("kind") == "video")
    return video.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )
