"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schemas, partition strategy,
Arrow-batched mapInPandas kernels with correct batch shapes. The actual
codec calls (PIL/ffmpeg/soundfile) are NOT in this container, so the decode
kernel is swappable: ``decoder=None`` uses a deterministic fake (content-
addressed pseudo-pixels) and a real implementation drops in behind the same
signature without touching any Spark code.

Scale design: binary payloads never pass through Python row-at-a-time —
mapInPandas streams Arrow record batches; metadata-only queries prune the
binary column entirely (columnar projection means a `WHERE meta.width >
1024` scan never reads image bytes). Partition by (modality, ingest
bucket); huge blobs would go to out-of-line object-store pointers, modeled
here by the `uri` field.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("uri", T.StringType()),  # out-of-line pointer (may be null)
        T.StructField("payload", T.BinaryType()),  # inline blob (may be null)
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("duration_s", T.DoubleType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, modality string, feat_dim int, features array<float>, "
    "decode_ok boolean"
)

DecodeFn = Callable[[bytes, str], "list[float]"]


def _fake_decode(payload: bytes, modality: str) -> list[float]:
    """Deterministic content-addressed stand-in for a real decoder: 16
    pseudo-features from the md5 of the payload. Real decoders (PIL image
    -> pixel stats, soundfile -> spectral stats) replace this function
    only."""
    digest = hashlib.md5(payload).digest()
    return [b / 255.0 for b in digest]


def decode_features(
    media: DataFrame, decoder: DecodeFn | None = None, batch_note: bool = True
) -> DataFrame:
    """mapInPandas feature extraction. Arrow streams (media_id, modality,
    payload) batches into Python; each batch yields a features frame.
    The binary column is projected only here — metadata queries never pay
    for it."""
    decode = decoder or _fake_decode

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, ok = [], []
            for payload, modality in zip(pdf["payload"], pdf["modality"]):
                if payload is None:
                    feats.append(None)
                    ok.append(False)
                    continue
                try:
                    feats.append(decode(bytes(payload), modality))
                    ok.append(True)
                except Exception:  # noqa: BLE001 — corrupt payloads must
                    # flag decode_ok=False, not fail the task after retries
                    feats.append(None)
                    ok.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "feat_dim": [len(f) if f else 0 for f in feats],
                    "features": feats,
                    "decode_ok": ok,
                }
            )

    return media.select("media_id", "modality", "payload").mapInPandas(
        kernel, FEATURE_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame index,
    computed from metadata only (no decode): sequence + explode. The
    downstream decode kernel receives (media_id, frame_idx) work units —
    this is the shape that parallelizes frame extraction across executors."""
    return (
        media.filter(F.col("modality") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0), F.greatest(F.col("meta.n_frames") - 1, F.lit(0)), F.lit(every_n)
                )
            ).alias("frame_idx"),
        )
    )


def resize_spec(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning from metadata: target dims preserving aspect ratio.
    Pure expressions; the pixel work happens in the (stubbed) kernel."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.least(F.lit(1.0), max_side / F.greatest(w, h).cast("double"))
    return media.filter(F.col("modality") == "image").select(
        "media_id",
        w.alias("src_w"),
        h.alias("src_h"),
        F.round(w * scale).cast("int").alias("dst_w"),
        F.round(h * scale).cast("int").alias("dst_h"),
    )


def synthesize_media(spark, n: int = 64, seed: int = 11) -> DataFrame:
    """Deterministic fixture: n media rows across modalities with real
    binary payloads (content-addressed bytes)."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        modality = ("image", "audio", "video")[i % 3]
        payload = hashlib.sha256(f"media-{seed}-{i}".encode()).digest() * (
            1 + rng.randint(0, 4)
        )
        meta = {
            "width": rng.choice([320, 640, 1024, 1920]) if modality != "audio" else None,
            "height": rng.choice([240, 480, 768, 1080]) if modality != "audio" else None,
            "n_frames": rng.randint(24, 240) if modality == "video" else None,
            "sample_rate": 16000 if modality == "audio" else None,
            "duration_s": round(rng.uniform(1, 60), 2) if modality != "image" else None,
            "codec": {"image": "png", "audio": "pcm16", "video": "h264-stub"}[modality],
        }
        rows.append(
            {
                "media_id": i,
                "modality": modality,
                "uri": f"synthetic://media/{i}",
                "payload": payload,
                "meta": meta,
            }
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
