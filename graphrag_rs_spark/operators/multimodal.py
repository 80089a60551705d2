"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages. ``decode="fake"`` produces a deterministic fake
decode (byte-statistics features) that exercises the full distributed
path for ANY payload; ``decode="real"`` runs actual pure-stdlib decoders
(rules/media.py: PNG via zlib inflate + scanline de-filter, baseline
JPEG via rules/jpeg.py huffman + IDCT, WAV via the ``wave`` module) —
formats needing external codecs (MP4, progressive JPEG, …) raise
``ValueError`` at the same integration point where a PIL/ffmpeg kernel
would plug in.
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
    media: DataFrame,
    n_features: int = 16,
    decode: str = "fake",
    on_error: str = "raise",
) -> DataFrame:
    """Per-payload feature vectors via ``mapInPandas`` (Arrow binary batches).

    ``fake``: deterministic byte-histogram features (tests the full
    distributed path on any payload). ``real``: decodes the payload with
    the stdlib kernels (PNG → normalized luminance histogram over decoded
    pixels; WAV → normalized amplitude histogram over decoded samples);
    unsupported formats raise ``ValueError`` — the PIL/ffmpeg plug point.

    ``on_error`` (real decode only): ``"raise"`` fails the stage on the
    first undecodable payload (fail-fast default, matches the plug-point
    contract above); ``"skip"`` isolates failures per payload — corrupt
    or unsupported media simply emit no features row, so one bad blob
    cannot kill a 100-TB job (diagnose the skipped ids by joining
    ``decode_media``'s ``ok = false`` rows).
    """
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def feat_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        from graphrag_rs_spark.rules import media as media_rules

        def real_features(buf: bytes) -> "np.ndarray":
            mime = media_rules.sniff_mime(buf)
            if mime == "image/png":
                px = media_rules.decode_png(buf)["pixels"]
                lum = px.mean(axis=2).ravel()  # luminance proxy
                hist, _ = np.histogram(lum, bins=n_features, range=(0, 256))
                return (hist / max(1, lum.size)).astype(np.float32)
            if mime == "audio/wav":
                s = media_rules.decode_wav(buf)["samples"].astype(np.float64)
                hist, _ = np.histogram(
                    s.ravel(), bins=n_features, range=(-32768, 32768)
                )
                return (hist / max(1, s.size)).astype(np.float32)
            if mime == "image/jpeg":
                px = media_rules.decode_jpeg(buf)["pixels"]
                lum = px.mean(axis=2).ravel()
                hist, _ = np.histogram(lum, bins=n_features, range=(0, 256))
                return (hist / max(1, lum.size)).astype(np.float32)
            raise ValueError(
                "real decode supports PNG/JPEG/WAV in this container; "
                f"got unrecognized payload ({len(buf)} bytes) — plug a "
                "PIL/ffmpeg kernel here for other formats"
            )

        for pdf in batches:
            rows = []
            for media_id, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                buf = bytes(payload or b"")
                if decode == "real":
                    # a sniffed-but-corrupt payload raises zlib/struct
                    # errors from the kernel, not just ValueError — catch
                    # everything so "skip" truly isolates per payload
                    try:
                        feats = real_features(buf)
                    except Exception as e:  # noqa: BLE001
                        if on_error == "raise":
                            raise ValueError(
                                f"media_id={media_id}: {e}"
                            ) from e
                        continue
                else:
                    arr = np.frombuffer(buf, dtype=np.uint8)
                    if arr.size:
                        hist, _ = np.histogram(
                            arr, bins=n_features, range=(0, 256)
                        )
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


DECODED_SCHEMA = (
    "media_id string, kind string, mime string, width int, height int, "
    "channels int, duration_ms int, sample_rate int, ok boolean, err string"
)


def decode_media(media: DataFrame) -> DataFrame:
    """Real decode pass: fills the typed metadata the ``media_table`` stub
    leaves NULL — PNG dimensions/channels, WAV duration/sample-rate — via
    the pure-stdlib kernels (rules/media.py). Undecodable payloads come
    back with ``ok=false`` and the error string instead of failing the
    stage (at 100 TB a corrupt payload must not kill the job)."""

    def decode_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from graphrag_rs_spark.rules import media as media_rules

        for pdf in batches:
            rows = []
            for media_id, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                buf = bytes(payload or b"")
                try:
                    mime = media_rules.sniff_mime(buf)
                    if mime == "image/png":
                        d = media_rules.decode_png(buf)
                        rows.append((media_id, kind, mime, d["width"],
                                     d["height"], d["channels"], None, None,
                                     True, None))
                    elif mime == "audio/wav":
                        d = media_rules.decode_wav(buf)
                        rows.append((media_id, kind, mime, None, None,
                                     d["channels"], d["duration_ms"],
                                     d["sample_rate"], True, None))
                    elif mime == "image/jpeg":
                        d = media_rules.decode_jpeg(buf)
                        rows.append((media_id, kind, mime, d["width"],
                                     d["height"], 3, None, None,
                                     True, None))
                    else:
                        rows.append((media_id, kind, None, None, None, None,
                                     None, None, False,
                                     "unrecognized format "
                                     "(PNG/JPEG/WAV supported)"))
                except Exception as e:  # noqa: BLE001 — per-payload isolation
                    rows.append((media_id, kind, None, None, None, None,
                                 None, None, False, str(e)[:200]))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "mime", "width", "height",
                         "channels", "duration_ms", "sample_rate", "ok",
                         "err"],
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        decode_batches, schema=DECODED_SCHEMA
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
