"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages. The decode kernels themselves are STUBBED in this
container (no image/audio libraries available): ``decode="fake"`` produces
a deterministic fake decode (byte-statistics features) so the Spark-side
plumbing — schema, batch shape, partitioning — is real and tested;
``decode="real"`` raises ``NotImplementedError`` at the exact spot where a
PIL/ffmpeg kernel would plug in.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, "
    "meta struct<width:int,height:int,duration_ms:int,mime:string>"
)

FEATURES_SCHEMA = "media_id string, kind string, n_bytes int, features array<float>"


def media_table(df: DataFrame, payload_col: str, kind: str, id_col: str) -> DataFrame:
    """Normalize any binary column into the media table shape."""
    return df.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col(payload_col).cast("binary").alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit(None).cast("string").alias("mime"),
        ).alias("meta"),
    )


def extract_features(
    media: DataFrame, n_features: int = 16, decode: str = "fake"
) -> DataFrame:
    """Per-payload feature vectors via ``mapInPandas`` (Arrow binary batches).

    ``fake``: deterministic byte-histogram features (tests the full
    distributed path). ``real``: the integration point for an actual
    decoder — raises NotImplementedError in this container.
    """

    def feat_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for media_id, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                buf = bytes(payload or b"")
                if decode == "real":
                    raise NotImplementedError(
                        "real media decode requires PIL/ffmpeg — not in container"
                    )
                arr = np.frombuffer(buf, dtype=np.uint8)
                if arr.size:
                    hist, _ = np.histogram(arr, bins=n_features, range=(0, 256))
                    feats = (hist / arr.size).astype(np.float32)
                else:
                    feats = np.zeros(n_features, dtype=np.float32)
                rows.append((media_id, kind, len(buf), [float(x) for x in feats]))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "n_bytes", "features"]
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        feat_batches, schema=FEATURES_SCHEMA
    )


def frame_sample(
    media: DataFrame, every_n_bytes: int = 1024, frame_bytes: int = 64
) -> DataFrame:
    """Deterministic "frame" sampling: one sample per ``every_n_bytes`` of
    payload (the video-frame-sampling batch shape with a byte-window kernel
    standing in for a real frame decoder)."""

    def frames(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                buf = bytes(payload or b"")
                for frame_idx, off in enumerate(range(0, len(buf), every_n_bytes)):
                    rows.append(
                        (media_id, frame_idx, off, buf[off:off + frame_bytes])
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "offset", "frame"]
            )

    return media.select("media_id", "payload").mapInPandas(
        frames, schema="media_id string, frame_idx int, offset int, frame binary"
    )
