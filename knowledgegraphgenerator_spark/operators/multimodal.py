"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride the pipeline as ``binary`` columns with a typed
metadata struct — the same pattern as the ``html:binary`` corpus column.
The Spark-side plumbing (schemas, batch iteration, partition sizing,
output shapes) is real and tested; the actual codec work is STUBBED
because no image/audio libraries exist in this container:

  * ``decode_image`` raises NotImplementedError unless
    ``deterministic_fake=True``, in which case it derives a fake
    (width, height, channels, feature vector) purely from the payload
    bytes — stable across runs/executors, so downstream join/partition
    logic is testable end-to-end.

Scale notes: binary payloads blow past Arrow's default batch sizing on
row count alone, so ``mapInPandas`` batches are re-chunked by BYTE budget
(``max_batch_bytes``) before decode; decoded features are small and
follow the normal columnar path afterwards.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, "
    "meta struct<mime:string, n_bytes:long, source:string>"
)

_FEATURE_DIM = 8


def _fake_decode(payload: bytes | None) -> tuple[int, int, int, list[float]]:
    """Deterministic stand-in decode: dims + feature vector derived from
    the bytes themselves. NOT a real codec — a stable test double."""
    if not payload:
        return 0, 0, 0, [0.0] * _FEATURE_DIM
    n = len(payload)
    width = 16 + (payload[0] if n > 0 else 0) % 240
    height = 16 + (payload[n // 2] if n > 1 else 0) % 240
    acc = [0] * _FEATURE_DIM
    for i, b in enumerate(payload[:4096]):
        acc[i % _FEATURE_DIM] = (acc[i % _FEATURE_DIM] * 31 + b) % 65536
    return width, height, 3, [a / 65536.0 for a in acc]


def decode_and_featurize(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    deterministic_fake: bool = False,
    max_batch_bytes: int = 64 << 20,
) -> DataFrame:
    """(id, payload) -> (id, width, height, channels, features).

    Real decoders (PIL/ffmpeg) plug in here; absent those libs this
    raises unless ``deterministic_fake`` is set.
    """
    if not deterministic_fake:
        raise NotImplementedError(
            "no image/audio codecs in this environment; pass "
            "deterministic_fake=True for the stable test double"
        )
    src = df.select(id_col, payload_col)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # re-chunk by byte budget: binary rows can be huge
            sizes = pdf[payload_col].map(lambda b: len(b) if b is not None else 0)
            start = 0
            while start < len(pdf):
                acc, end = 0, start
                while end < len(pdf) and (acc == 0 or acc + sizes.iloc[end] <= max_batch_bytes):
                    acc += sizes.iloc[end]
                    end += 1
                chunk = pdf.iloc[start:end]
                decoded = [ _fake_decode(b) for b in chunk[payload_col] ]
                yield pd.DataFrame(
                    {
                        id_col: chunk[id_col].values,
                        "width": [d[0] for d in decoded],
                        "height": [d[1] for d in decoded],
                        "channels": [d[2] for d in decoded],
                        "features": [d[3] for d in decoded],
                    }
                )
                start = end

    return src.mapInPandas(
        gen,
        schema=f"{id_col} long, width int, height int, channels int, "
               "features array<double>",
    )
