"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with typed metadata
columns alongside. Decode / feature-extraction runs as Arrow-batched
``mapInPandas`` — the Spark-side plumbing (schema contract, batch
iteration, partition parallelism) is real and tested; the actual media
decode is STUBBED deterministically because no image/audio libraries
exist in this environment (see ``_decode_stub``). Swap ``_decode_stub``
for a real decoder (PIL/librosa/av) in production — the operator
signature and plan shape do not change.

At 100 TB: mapInPandas streams Arrow batches per partition — memory is
bounded by batch size, not partition size; no shuffle is introduced.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

FEATURE_SCHEMA_TAIL = [
    StructField("n_bytes", IntegerType(), False),
    StructField("fake_width", IntegerType(), False),
    StructField("fake_height", IntegerType(), False),
]


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a media column: utf-8 bytes of the text as ``payload``."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def _decode_stub(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake decode: (n_bytes, width, height).

    A real implementation would be e.g.::

        img = PIL.Image.open(io.BytesIO(payload))   # not available here
        return len(payload), img.width, img.height

    The fake derives stable pseudo-dimensions from the byte length so
    the full pipeline (including the oracle) stays deterministic.
    """
    n = len(payload)
    return n, n % 640, (n * 7) % 480


def extract_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """mapInPandas feature extraction over a binary column.

    Output schema: (id_col, n_bytes, fake_width, fake_height).
    """
    id_field = [f for f in df.schema.fields if f.name == id_col]
    assert id_field, f"{id_col} missing from input"
    out_schema = StructType(
        [StructField(id_col, id_field[0].dataType, True), *FEATURE_SCHEMA_TAIL]
    )

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in it:
            # one Python call per payload (a real decoder is per-item
            # anyway), one unzip — no repeated Series.map passes
            feats = [_decode_stub(p) for p in pdf[payload_col]]
            n_bytes, widths, heights = (
                zip(*feats) if feats else ((), (), ())
            )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "n_bytes": pd.array(n_bytes, dtype="int32"),
                    "fake_width": pd.array(widths, dtype="int32"),
                    "fake_height": pd.array(heights, dtype="int32"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, schema=out_schema)


def frame_sample_stub(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every_n_bytes: int = 64,
) -> DataFrame:
    """Video-frame-sampling shaped operator: one output row per sampled
    offset of the payload (stand-in for per-frame rows). Demonstrates the
    1->N mapInPandas expansion the real frame sampler would use.
    """
    import pandas as pd  # noqa: F401

    out_schema = StructType(
        [
            StructField(id_col, LongType(), True),
            StructField("frame_no", IntegerType(), False),
            StructField("offset", IntegerType(), False),
        ]
    )

    def batches(it):
        import pandas as pd

        for pdf in it:
            rows = {id_col: [], "frame_no": [], "offset": []}
            for _, r in pdf.iterrows():
                n = len(r[payload_col])
                for fi, off in enumerate(range(0, n, every_n_bytes)):
                    rows[id_col].append(r[id_col])
                    rows["frame_no"].append(fi)
                    rows["offset"].append(off)
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(batches, schema=out_schema)
