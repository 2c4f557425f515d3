"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schemas, partition strategy,
Arrow-batched mapInPandas kernels with correct batch shapes. The decode
kernel is swappable behind one signature: ``wav_decode`` (stdlib ``wave``)
and ``ppm_decode`` (hand-parsed binary PPM) are REAL codecs that run
end-to-end in this container; richer formats (JPEG/MP3/H264) need
PIL/ffmpeg, which are NOT installed, so ``decoder=None`` falls back to a
deterministic content-addressed fake and a real implementation drops in
without touching any Spark code.

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

# features are f64: the decoders compute float64 statistics and a float32
# column would quantize them (~6e-8 absolute on unit-scale values — enough
# to flip a 6-dp rounding, which the multimodal_decode_stats oracle
# compares at). An 8-element stats vector costs nothing at double width.
FEATURE_SCHEMA = (
    "media_id long, modality string, feat_dim int, features array<double>, "
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


def wav_decode(payload: bytes, modality: str = "audio") -> list[float]:
    """REAL audio decoder — pure stdlib ``wave`` + numpy, no external libs.

    Parses an actual RIFF/WAVE container and returns 8 features from the
    PCM16 samples: [n_channels, sample_rate, n_samples, duration_s, mean,
    rms, peak, zero_crossing_rate]. This is the proof that the
    decode_features plumbing carries a true codec, not only the
    deterministic fake."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as w:
        nch = w.getnchannels()
        if w.getsampwidth() != 2:
            raise ValueError("only PCM16 supported")
        sr = w.getframerate()
        nf = w.getnframes()
        raw = w.readframes(nf)
    x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    if nch > 1:  # downmix for the stats
        x = x.reshape(-1, nch).mean(axis=1)
    n = len(x)
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if n > 1 else 0.0
    return [
        float(nch),
        float(sr),
        float(n),
        n / sr if sr else 0.0,
        float(x.mean()) if n else 0.0,
        float(np.sqrt((x**2).mean())) if n else 0.0,
        float(np.abs(x).max()) if n else 0.0,
        zcr,
    ]


def ppm_decode(payload: bytes, modality: str = "image") -> list[float]:
    """REAL image decoder — binary PPM (P6), parsed by hand + numpy.

    Returns 8 features: [width, height, maxval, mean_r, mean_g, mean_b,
    luma_mean, luma_std]."""
    import numpy as np

    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM")
    # header: magic, width, height, maxval — whitespace/comment separated
    tokens, pos = [], 2
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to EOL
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = tokens
    if not 0 < maxval <= 255:
        # 2-byte-per-sample PPMs (maxval > 255) store 6 bytes/pixel; reading
        # them as uint8 would return garbage flagged as a good decode —
        # raise so the kernel routes the row to decode_ok=False instead
        raise ValueError(f"unsupported PPM maxval {maxval} (PCM8 only)")
    px = np.frombuffer(payload, dtype=np.uint8, count=width * height * 3, offset=pos)
    img = px.reshape(height, width, 3).astype(np.float64) / maxval
    luma = 0.2126 * img[..., 0] + 0.7152 * img[..., 1] + 0.0722 * img[..., 2]
    return [
        float(width),
        float(height),
        float(maxval),
        float(img[..., 0].mean()),
        float(img[..., 1].mean()),
        float(img[..., 2].mean()),
        float(luma.mean()),
        float(luma.std()),
    ]


def stdlib_decode(payload: bytes, modality: str) -> list[float]:
    """Dispatching decoder: real WAV for audio, real PPM for image; video
    frame decode genuinely needs ffmpeg (absent from this container) and
    stays on the declared deterministic fake."""
    if modality == "audio":
        return wav_decode(payload, modality)
    if modality == "image":
        return ppm_decode(payload, modality)
    return _fake_decode(payload, modality)


def encode_wav_pcm16(samples, sample_rate: int = 16000, n_channels: int = 1) -> bytes:
    """Fixture helper: float samples in [-1, 1] -> real PCM16 WAV bytes."""
    import io
    import wave

    import numpy as np

    x = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm = (x * 32767.0).astype("<i2").tobytes()
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm)
    return buf.getvalue()


def encode_ppm(pixels) -> bytes:
    """Fixture helper: uint8 array (h, w, 3) -> real binary PPM bytes."""
    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def synthesize_deterministic_media(
    docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic REAL media payloads derived from an id column, fully
    in-plan (mapInPandas — no driver-side fixture): per id ``d``, one
    PCM16 WAV of ``100 + d % 50`` constant-amplitude samples at 8 kHz
    (amplitude ``((d % 9) + 1)/10``) and one solid-color binary PPM of
    ``(4 + d % 5) x (3 + d % 3)`` pixels (RGB ``(37d, 59d, 83d) % 256``).
    Every decoded statistic is therefore closed-form in ``d`` — what lets
    the multimodal_decode_stats gate value-check the real codecs against
    a SQL oracle that never sees the bytes."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, modalities, payloads = [], [], []
            for d in pdf[id_col]:
                d = int(d)
                n = 100 + d % 50
                amp = ((d % 9) + 1) / 10.0
                ids.append(d)
                modalities.append("audio")
                payloads.append(encode_wav_pcm16([amp] * n, sample_rate=8000))
                w, h = 4 + d % 5, 3 + d % 3
                rgb = [(37 * d) % 256, (59 * d) % 256, (83 * d) % 256]
                px = np.tile(np.array(rgb, dtype=np.uint8), (h, w, 1))
                ids.append(d)
                modalities.append("image")
                payloads.append(encode_ppm(px))
            yield pd.DataFrame(
                {"media_id": ids, "modality": modalities, "payload": payloads}
            )

    return docs.select(id_col).mapInPandas(
        kernel, "media_id long, modality string, payload binary"
    )


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
