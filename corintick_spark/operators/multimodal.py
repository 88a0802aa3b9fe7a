"""Multimodal column support: opaque binary payloads + typed metadata.

Design (SURVEY.md / north_star "multimodal columns"): media travels as a
``binary`` column next to typed metadata columns; decode / feature-extract /
resize / frame-sample run as Arrow-batched functions over ``mapInPandas`` —
the plumbing (schema, batch iteration, partition sizing) is real and tested;
the actual codecs are STUBBED because image/audio libraries are not in this
container. Each stub raises NotImplementedError unless ``fake=True``, in
which case it derives deterministic metadata from the bytes so the Spark-side
contract can be exercised end-to-end.

Scale notes: binary payloads make rows wide — repartition so batches stay
within executor memory (``target_rows_per_batch``), and never collect
payloads to the driver. mapInPandas streams Arrow record batches, so peak
memory is one batch per core, not one partition.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

DECODE_SCHEMA = (
    "doc_id long, n_bytes long, width long, height long, format string"
)


def attach_payload(df: DataFrame, text: str = "text", out: str = "payload") -> DataFrame:
    """Demo payload: utf-8 bytes of the text column (stands in for real media
    bytes; schema/partitioning behavior is identical)."""
    return df.withColumn(out, F.encode(F.col(text), "utf-8"))


def decode_image_meta(
    df: DataFrame,
    id_col: str = "doc_id",
    payload: str = "payload",
    fake: bool = False,
    target_rows_per_batch: int = 1024,
) -> DataFrame:
    """Extract (width, height, format) from an image payload column.

    Real decode would use PIL/libvips here — not present in this container,
    so ``fake=True`` derives deterministic pseudo-metadata from byte length;
    ``fake=False`` raises NotImplementedError (clearly-marked stub).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "image decoding requires PIL/libvips (not in container); "
                    "pass fake=True to exercise the plumbing"
                )
            # null payloads (a 100 TB corpus has them) must null-propagate
            # through the metadata, not TypeError the batch
            n = pdf[payload].map(
                lambda b: len(b) if b is not None else None
            ).astype("Int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": n,
                    "width": n % 640 + 1,
                    "height": n % 480 + 1,
                    "format": ["fake/raw"] * len(pdf),
                }
            )

    prepared = df.select(id_col, payload)
    return prepared.mapInPandas(batches, schema=DECODE_SCHEMA)


def frame_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    payload: str = "payload",
    every_n: int = 10,
    fake: bool = False,
) -> DataFrame:
    """Sample every-Nth 'frame' of a video payload → one row per frame.

    Stub codec: with fake=True, frames are fixed-size byte slices; real
    implementation would use pyav/ffmpeg (not in container).

    Batch shape note (this stub is the template for real codecs): columns
    come off the Arrow batch as numpy arrays and the output rows are built
    with ``np.repeat``/``np.concatenate`` — never ``pdf.iterrows()``, which
    boxes every row into a dtype-erased Series and dominates batch time.
    The only per-blob Python is the codec call itself (here a byte slice;
    in a real implementation the decoder), which is inherent to opaque
    binary payloads.
    """
    schema = "doc_id long, frame_idx long, frame binary"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        chunk = max(1, every_n) * 16
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "video decoding requires pyav/ffmpeg (not in container); "
                    "pass fake=True to exercise the plumbing"
                )
            ids = pdf[id_col].to_numpy(dtype="int64")
            blobs = pdf[payload].to_list()
            frames = [
                [bytes(b[off : off + 16]) for off in range(0, len(b), chunk)]
                for b in blobs
            ]
            counts = np.fromiter((len(f) for f in frames), dtype="int64", count=len(frames))
            yield pd.DataFrame(
                {
                    "doc_id": np.repeat(ids, counts),
                    "frame_idx": (
                        np.concatenate([np.arange(c, dtype="int64") for c in counts])
                        if len(counts)
                        else np.array([], dtype="int64")
                    ),
                    "frame": [f for fs in frames for f in fs],
                }
            )

    return df.select(id_col, payload).mapInPandas(batches, schema=schema)
