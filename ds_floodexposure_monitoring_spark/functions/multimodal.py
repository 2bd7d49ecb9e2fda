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


_CODEC_MAGICS = (b"\x89PNG", b"RIFF", b"\x00\x00\x00\x18")

# Pluggable decoders, tried in registration order. Each takes the raw
# payload bytes and returns a metadata dict (n_bytes/width/height/
# n_frames) or None to pass. Registered on the driver; decode_metadata
# captures the list BY VALUE at plan-build time so executors see it
# (a module-global lookup inside the worker would read the worker's own
# freshly-imported, empty module instead).
_DECODERS: list = []


def register_decoder(fn) -> None:
    """Plug a real codec in: ``fn(payload: bytes) -> dict | None``.
    Return None to decline a payload (the next decoder is tried)."""
    _DECODERS.append(fn)


def _pil_decoder(payload: bytes) -> dict | None:
    """Built-in real-codec hook: used automatically wherever Pillow is
    importable (import-tried per worker; this container lacks it)."""
    try:
        import io

        from PIL import Image
    except ImportError:
        return None
    try:
        im = Image.open(io.BytesIO(payload))
        im.load()
    except Exception:
        return None
    return {
        "n_bytes": len(payload),
        "width": im.width,
        "height": im.height,
        "n_frames": int(getattr(im, "n_frames", 1)),
    }


def decode_payload(payload: bytes, decoders: tuple = ()) -> dict:
    """Decode one payload: registered decoders first, then the built-in
    PIL hook for real codec payloads, then — for codec payloads with no
    decoder available in the environment — a loud NotImplementedError.
    Non-codec payloads fall through to the deterministic fake (metadata
    derived arithmetically from the byte stream) so tests/oracles can
    verify the plumbing end-to-end in a codec-less container.
    """
    for dec in decoders:
        meta = dec(payload)
        if meta is not None:
            return meta
    if payload[:4] in _CODEC_MAGICS:
        meta = _pil_decoder(payload)
        if meta is not None:
            return meta
        raise NotImplementedError(
            "real image/audio/video decoding requires codec libraries "
            "not present in this environment; plug one in with "
            "register_decoder()"
        )
    n = len(payload)
    return {"n_bytes": n, "width": n % 640, "height": (n * 7) % 480, "n_frames": n % 30 + 1}


def decode_metadata(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Arrow-batched decode of a binary payload column → typed metadata.

    Input: ``(id_col, payload_col binary)``; runs one Python worker per
    partition with vectorized Arrow transfer (never per-row pickling).
    """
    decoders = tuple(_DECODERS)  # shipped by value inside the closure

    def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = pdf["payload"].map(lambda p: decode_payload(p, decoders))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": metas.map(lambda m: m["n_bytes"]),
                    "width": metas.map(lambda m: m["width"]),
                    "height": metas.map(lambda m: m["height"]),
                    "n_frames": metas.map(lambda m: m["n_frames"]),
                }
            )

    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))
    return src.mapInPandas(_decode_batches, DECODE_SCHEMA)


# ---------------------------------------------------------------------------
# Feature-extract / resize / frame-sample over opaque payloads.
#
# These three run in the CODE-POINT domain (the payloads in this sandbox
# are text bytes) so the math is exact and oracle-checkable, but the
# operator shape — Arrow batch in, vectorized numpy kernel per row
# sequence, long-format typed rows out — is exactly what a real
# image/audio deployment uses with a codec plugged in. Code points are
# obtained VECTORIZED via utf-32-le reinterpretation (one encode + one
# frombuffer per document, no Python char loop).

FEATURES_SCHEMA = "doc_id bigint, feat_idx bigint, n bigint"
RESIZE_SCHEMA = "doc_id bigint, n_in bigint, n_out bigint, checksum bigint"
FRAMES_SCHEMA = "doc_id bigint, frame_idx bigint, frame_len bigint, checksum bigint"


def _codepoints(s):
    """Code points of ``s`` as an int64 array; NULL payloads (None / NaN
    from Arrow) yield an empty array — the kernels then skip the row,
    matching the oracles (SQL length(NULL) generates no positions)."""
    import numpy as np

    if not isinstance(s, str):
        return np.empty(0, dtype=np.int64)
    return np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)


def histogram_features(df: DataFrame, dim: int = 64,
                       id_col: str = "doc_id", payload_col: str = "text") -> DataFrame:
    """Fixed-dimension content histogram (feature-extract stage): counts
    of code points folded mod ``dim``, emitted long-format (only nonzero
    bins) — the sparse feature layout a downstream trainer joins on."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, feats, counts = [], [], []
            for doc_id, s in zip(pdf[id_col], pdf[payload_col]):
                cp = _codepoints(s)
                if len(cp) == 0:
                    continue
                hist = np.bincount(cp % dim, minlength=dim)
                nz = np.nonzero(hist)[0]
                ids.extend([doc_id] * len(nz))
                feats.extend(nz.tolist())
                counts.extend(hist[nz].tolist())
            yield pd.DataFrame({"doc_id": ids, "feat_idx": feats, "n": counts})

    return df.select(id_col, payload_col).mapInPandas(fn, FEATURES_SCHEMA)


def resample_payload(df: DataFrame, out_len: int = 256,
                     id_col: str = "doc_id", payload_col: str = "text") -> DataFrame:
    """Nearest-neighbor down-sample (the resize stage): pick
    ``n_out = min(n, out_len)`` positions at indices floor(j*n/n_out),
    return the structural result + an exact integer checksum of the
    sampled content (sum of sampled code points)."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, s in zip(pdf[id_col], pdf[payload_col]):
                cp = _codepoints(s)
                n = len(cp)
                if n == 0:
                    continue
                n_out = min(n, out_len)
                idx = (np.arange(n_out, dtype=np.int64) * n) // n_out
                rows.append((doc_id, n, n_out, int(cp[idx].sum())))
            yield pd.DataFrame(rows, columns=["doc_id", "n_in", "n_out", "checksum"])

    return df.select(id_col, payload_col).mapInPandas(fn, RESIZE_SCHEMA)


def sample_frames(df: DataFrame, stride: int = 2,
                  id_col: str = "doc_id", payload_col: str = "text") -> DataFrame:
    """Frame sampling (the video stage): chunk the payload into
    ``n_frames = n % 30 + 1`` frames of ``ceil(n / n_frames)`` positions
    (the stub decoder's frame count), keep every ``stride``-th frame,
    and emit one typed row per kept frame with its exact length and
    content checksum."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, s in zip(pdf[id_col], pdf[payload_col]):
                cp = _codepoints(s)
                n = len(cp)
                if n == 0:
                    continue
                n_frames = n % 30 + 1
                fs = -(-n // n_frames)
                for k in range(0, n_frames, stride):
                    frame = cp[k * fs:(k + 1) * fs]
                    if len(frame):
                        rows.append((doc_id, k, len(frame), int(frame.sum())))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_len", "checksum"])

    return df.select(id_col, payload_col).mapInPandas(fn, FRAMES_SCHEMA)
