"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: the payload is an opaque
``binary`` column (or a reference to object storage), metadata is a
typed struct, and decode/feature-extraction runs as Arrow-batched
Pandas UDFs via ``mapInPandas`` — Python touches each batch once,
everything else stays columnar.

The actual media codecs are NOT in this container, so ``decode_*``
raise ``NotImplementedError`` unless ``fake=True``, which substitutes
a deterministic byte-level feature extractor. The Spark-side plumbing
— schema, batching, partitioning, UDF signatures — is real and
tested; swapping the fake for PIL/libav is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = "doc_id bigint, n_bytes int, features array<double>"


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Simulate a multimodal table: payload = utf-8 bytes of the text,
    metadata struct alongside. With real media this is the raw file
    content + probed container metadata."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        id_col,
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(payload).alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image(payload: bytes, fake: bool = False) -> list[float]:
    """STUB: real implementation requires an image codec (PIL/turbojpeg),
    not installed here. ``fake=True`` → deterministic byte histogram."""
    if not fake:
        raise NotImplementedError(
            "image decode requires an image codec; not available in this "
            "container — pass fake=True for the deterministic stand-in"
        )
    return _byte_features(payload)


def _byte_features(payload: bytes, n: int = 8) -> list[float]:
    """Deterministic fake feature vector: n-bin byte histogram,
    normalized. Stands in for CNN features / mel spectrograms."""
    bins = [0] * n
    for b in payload:
        bins[b % n] += 1
    total = float(len(payload)) or 1.0
    return [c / total for c in bins]


def resize_images(
    df: DataFrame,
    width: int = 64,
    height: int = 64,
    fake: bool = True,
) -> DataFrame:
    """Arrow-batched image resize over the binary payload
    (``mapInPandas``). The fake path emits a deterministic payload —
    first ``width*height`` bytes cycled — standing in for a real
    resampler, so the schema/batch plumbing (what actually matters on
    Spark's side) is exercised end-to-end. Real codec = replace
    ``_fake_resize`` with PIL, nothing else changes."""
    import pandas as pd

    if not fake:
        raise NotImplementedError(
            "image resize requires an image codec; not available in this "
            "container — pass fake=True for the deterministic stand-in"
        )
    n = width * height

    def _fake_resize(p: bytes) -> bytes:
        if not p:
            return bytes(n)
        reps = (n // len(p)) + 1
        return (p * reps)[:n]

    schema = "doc_id bigint, payload binary, width int, height int"

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": pdf["payload"].map(
                        lambda p: _fake_resize(bytes(p))
                    ),
                    "width": width,
                    "height": height,
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, schema)


def sample_frames(
    df: DataFrame,
    n_frames: int = 4,
    fake: bool = True,
) -> DataFrame:
    """Frame sampling for video payloads: one output row PER FRAME
    (``mapInPandas`` fan-out — batch in, multiple rows out, the shape
    a real decoder uses). Fake path slices the payload into
    ``n_frames`` even chunks; a real implementation decodes with
    libav/ffmpeg at evenly spaced timestamps."""
    import pandas as pd

    if not fake:
        raise NotImplementedError(
            "frame sampling requires a video codec; not available in this "
            "container — pass fake=True for the deterministic stand-in"
        )
    schema = "doc_id bigint, frame_idx int, frame binary"

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                p = bytes(payload)
                step = max(1, len(p) // n_frames)
                for i in range(n_frames):
                    out.append(
                        {
                            "doc_id": int(doc_id),
                            "frame_idx": i,
                            "frame": p[i * step : (i + 1) * step],
                        }
                    )
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(run, schema)


def extract_features(
    df: DataFrame,
    fake: bool = True,
    batch_features: int = 8,
) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload
    (``mapInPandas``): the scale-path shape for any decode step.
    Batches stream through Python; nothing driver-side."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "features": pdf["payload"].map(
                        lambda p: decode_image(bytes(p), fake=fake)
                    ),
                }
            )
            yield out

    return df.select("doc_id", "payload").mapInPandas(run, FEATURE_SCHEMA)
