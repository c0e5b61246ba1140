"""Multimodal column plumbing (LLM-pipeline extension).

Images / audio / video travel through the engine as opaque ``binary``
columns with typed metadata — the lakehouse pattern for 100 TB media
corpora: the relational plane carries (id, media BLOB, media_type,
metadata MAP) while decode / feature-extraction runs as Arrow-batched
``mapInPandas`` stages on the executors, so bytes never hit the driver
and each batch amortizes the Python crossing.

The actual codec step is environment-dependent (no image/audio libs in
this container); ``decode_fn`` is therefore pluggable:

- ``fake_image_decoder``  deterministic stand-in (hash-seeded "pixels")
  that exercises the full plumbing — schema, batching, feature shapes;
- the default decoder raises ``NotImplementedError`` with instructions,
  clearly marking the stub boundary.

Everything around the decode — schema handling, batch iteration, output
shapes, partition fan-out — is real and tested (tests/test_multimodal.py).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA_DDL = ("media_id bigint, media binary, media_type string, "
                    "width int, height int, metadata map<string,string>")

FEATURE_DIM = 16
_FEATURE_SCHEMA = f"media_id bigint, media_type string, feature array<float>, n_bytes int"


def real_decoder(blob: bytes, media_type: str) -> np.ndarray:
    """Decode media bytes into an array (pixels / samples / frames).

    STUB: the container has no codec libraries (PIL/ffmpeg/torchaudio).
    Plug a real implementation via ``extract_features(..., decode_fn=)``.
    """
    raise NotImplementedError(
        "media decode requires codec libraries not present in this "
        "environment; inject a decode_fn (see fake_image_decoder)")


def fake_image_decoder(blob: bytes, media_type: str) -> np.ndarray:
    """Deterministic decode stand-in: md5-seeded pseudo-pixels.

    Produces a stable (8, 8) float array from the bytes so the
    downstream feature pipeline is fully exercisable and test-stable.
    """
    seed = int.from_bytes(hashlib.md5(blob).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.random((8, 8), dtype=np.float64)


def extract_features(media: DataFrame,
                     decode_fn: Callable[[bytes, str], np.ndarray] = real_decoder,
                     ) -> DataFrame:
    """binary media -> fixed-dim feature vectors, executor-side.

    One Arrow batch in, one out; the decode runs per row but inside the
    batch loop (no per-row Python UDF dispatch). Output schema is fixed
    so downstream similarity/dedup operators consume it directly.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats, nbytes = [], []
            for blob, mtype in zip(pdf["media"], pdf["media_type"]):
                raw = bytes(blob)
                arr = decode_fn(raw, mtype)
                flat = arr.ravel()[:FEATURE_DIM]
                vec = np.zeros(FEATURE_DIM, dtype=np.float32)
                vec[:len(flat)] = flat.astype(np.float32)
                feats.append(vec)
                nbytes.append(len(raw))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "feature": feats,
                "n_bytes": nbytes,
            })

    return media.mapInPandas(run, _FEATURE_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: passes bytes through with updated declared dims.

    A real implementation decodes + resamples inside the same
    mapInPandas pattern as ``extract_features``; the relational contract
    (same schema, updated width/height metadata) is what matters here.
    """
    return media.withColumn("width", F.lit(width)) \
                .withColumn("height", F.lit(height))


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plan: one output row per sampled frame index.

    Demonstrates the explode-shaped contract (media row -> frame rows);
    the decode of each frame is the pluggable stub.
    """
    n_frames = F.coalesce(
        F.element_at(F.col("metadata"), "n_frames").cast("int"), F.lit(1))
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    return (media.select("media_id", "media_type",
                         F.explode(idx).alias("frame_index")))
