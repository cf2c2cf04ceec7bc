"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads travel as ``binary`` columns with a metadata
struct; decode / feature-extract stages run as Arrow-batched
``mapInPandas`` so each batch moves one Arrow buffer, never per-row Python.
The actual media decoding libraries are not available in this container, so
the decode step is a clearly marked STUB: ``decode_stub=True`` produces a
deterministic fake feature vector (seeded by payload hash) with the real
schema/batching/partitioning; ``decode_stub=False`` raises
NotImplementedError where a real decoder (PIL/ffmpeg/torchaudio) would go.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video | text
        StructField("payload", BinaryType(), True),
        StructField("n_bytes", LongType(), False),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        # float64: uint32/2^32 is exact in double, which keeps the stub
        # bit-identical to the SQL oracle (a float32 cast would round the
        # low 8 bits and flip 6-dp comparisons ~6% of the time)
        StructField("feature", ArrayType(DoubleType()), False),
    ]
)


def media_frame(docs: DataFrame, payload_col: str = "html", kind: str = "html") -> DataFrame:
    """Wrap a binary column as a typed media frame (doc_id, kind, payload, n_bytes)."""
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.lit(kind).alias("kind"),
        F.col(payload_col).alias("payload"),
        F.octet_length(F.col(payload_col)).cast("long").alias("n_bytes"),
    )


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_no", LongType(), False),
        StructField("frame_off", LongType(), False),
        StructField("frame_md5", StringType(), False),
    ]
)


def sample_frames(media: DataFrame, n_frames: int = 4, decode_stub: bool = True) -> DataFrame:
    """Frame sampling for video payloads — the ONE-TO-MANY media shape
    (each payload row expands to up to ``n_frames`` frame rows inside one
    Arrow batch; no per-row Python, no shuffle).

    STUB decode: a 'frame' is a 16-byte window at ``k * stride`` (stride =
    len/n_frames), fingerprinted with md5 — deterministic plumbing standing
    in for ffmpeg keyframe extraction; ``decode_stub=False`` raises where
    the real decoder would go.
    """
    import pandas as pd  # noqa: F811 (module-level import exists)

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            if not decode_stub:
                raise NotImplementedError("real frame decode requires ffmpeg — not in this container")
            rows = {"doc_id": [], "frame_no": [], "frame_off": [], "frame_md5": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload or b"")
                stride = max(len(buf) // n_frames, 1)
                for k in range(n_frames):
                    off = k * stride
                    if off >= len(buf):
                        break
                    rows["doc_id"].append(doc_id)
                    rows["frame_no"].append(k)
                    rows["frame_off"].append(off)
                    rows["frame_md5"].append(hashlib.md5(buf[off : off + 16]).hexdigest())
            yield pd.DataFrame(rows)

    return media.mapInPandas(frames, FRAME_SCHEMA)


def pil_available() -> bool:
    """Probe for a real image decoder. This sandbox ships none (PIL, cv2,
    ffmpeg and soundfile are all absent — probed 2026-08-17), so the stub
    path is the only executable one here; on a cluster with Pillow in the
    executor image ``decode_stub=False`` runs the real path below."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def _image_feature_real(payload: bytes, dim: int) -> list[float]:
    """Real decode path (runs where Pillow is installed): decode ->
    grayscale -> resize to a dim-pixel strip -> normalized intensities.
    A stand-in for a learned embedding with the identical Spark contract."""
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(payload)).convert("L").resize((dim, 1))
    return (np.asarray(img, dtype=np.float64).ravel() / 255.0).tolist()


def extract_features(media: DataFrame, dim: int = 8, decode_stub: bool = True) -> DataFrame:
    """Decode + featurize binary payloads via Arrow-batched mapInPandas.

    STUB decode (default): feature = dim floats derived from
    sha256(payload) — a deterministic fake standing in for (decode image ->
    resize -> embed). The Spark-side plumbing (schema, batch shape,
    partition parallelism) is the real thing and is what the tests cover.

    ``decode_stub=False``: the REAL Pillow decode path
    (``_image_feature_real``; pytest-gated on ``pil_available()``); raises
    ImportError where Pillow is absent — this sandbox, see the probe note.
    """

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = []
            for payload in pdf["payload"]:
                buf = bytes(payload or b"")
                if decode_stub:
                    h = hashlib.sha256(buf).digest()
                    arr = np.frombuffer(h[: dim * 4], dtype="<u4").astype(np.float64)
                    feats.append((arr / 2.0**32).tolist())
                else:
                    feats.append(_image_feature_real(buf, dim))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["n_bytes"],
                    "feature": feats,
                }
            )

    return media.mapInPandas(featurize, FEATURE_SCHEMA)
