"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with
typed metadata extracted by Arrow-batched ``mapInPandas`` UDFs. The
actual codec libraries (PIL/ffmpeg/librosa) are not available in this
container, so the decode step is STUBBED behind ``decode_payload`` — a
deterministic fake that derives metadata from the byte stream alone.
The Spark-side plumbing (schema contract, Arrow batch shape, partition
behavior) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, width bigint, height bigint, n_frames bigint"
)


def decode_payload(payload: bytes) -> dict:
    """STUB decoder. A real deployment plugs a codec in here.

    Deterministic fake: metadata derived arithmetically from byte
    length, so tests/oracles can verify the plumbing end-to-end.
    """
    if payload[:4] in (b"\x89PNG", b"RIFF", b"\x00\x00\x00\x18"):
        raise NotImplementedError(
            "real image/audio/video decoding requires codec libraries "
            "not present in this environment; plug a decoder into "
            "decode_payload()"
        )
    n = len(payload)
    return {"n_bytes": n, "width": n % 640, "height": (n * 7) % 480, "n_frames": n % 30 + 1}


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        metas = pdf["payload"].map(decode_payload)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": metas.map(lambda m: m["n_bytes"]),
                "width": metas.map(lambda m: m["width"]),
                "height": metas.map(lambda m: m["height"]),
                "n_frames": metas.map(lambda m: m["n_frames"]),
            }
        )


def decode_metadata(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Arrow-batched decode of a binary payload column → typed metadata.

    Input: ``(id_col, payload_col binary)``; runs one Python worker per
    partition with vectorized Arrow transfer (never per-row pickling).
    """
    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))
    return src.mapInPandas(_decode_batches, DECODE_SCHEMA)
