"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with typed metadata
columns alongside. Decode / feature-extraction runs as Arrow-batched
``mapInPandas`` — the Spark-side plumbing (schema contract, batch
iteration, partition parallelism) is real and tested. The decode step is
PLUGGABLE (``extract_features(decoder=...)``): the default
``_decode_stub`` keeps the catalog entries deterministic and
oracle-gated with no media libraries; ``png_image_decoder`` and
``wav_audio_decoder`` are REAL codecs on the stdlib alone (struct+zlib
chunk walk with pixel-stream verification; ``wave`` full-frame read) and
run in any environment; ``pil_image_decoder`` is the full-codec path,
import-gated like the Kafka smoke (its agreement with the stdlib PNG
decode is pinned by a test that skips where Pillow is absent). The
operator signature and plan shape are identical on every path.

At 100 TB: mapInPandas streams Arrow batches per partition — memory is
bounded by batch size, not partition size; no shuffle is introduced.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
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
    """Simulate a media column: utf-8 bytes of the text as ``payload``.

    Null text becomes empty bytes (not a null payload) so downstream
    decoders see a total function of the column — matching the oracle,
    which coalesces to '' before encode.
    """
    return df.withColumn(
        "payload", F.encode(F.coalesce(F.col(text_col), F.lit("")), "utf-8")
    )


def _decode_stub(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake decode: (n_bytes, width, height).

    Derives stable pseudo-dimensions from the byte length so the full
    pipeline (including the oracle) stays deterministic. Swap in
    ``pil_image_decoder`` (or any ``bytes -> (n, w, h)`` callable) via
    ``extract_features(decoder=...)`` where real media libs exist.
    """
    n = len(payload)
    return n, n % 640, (n * 7) % 480


def pil_image_decoder(payload: bytes) -> tuple[int, int, int]:
    """Real image decode via PIL, for environments that have it.

    Import-guarded at call time: raises ImportError with a clear message
    where PIL is absent (this sandbox), so the default stub path never
    depends on it.
    """
    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover - PIL absent in sandbox
        raise ImportError(
            "pil_image_decoder requires Pillow; use the default stub "
            "decoder where media libraries are unavailable"
        ) from e
    import io

    img = Image.open(io.BytesIO(payload))
    return len(payload), img.width, img.height


def png_image_decoder(payload: bytes) -> tuple[int, int, int]:
    """Real PNG decode on the stdlib alone (struct + zlib) — the
    codec-present path that is exercisable in ANY environment, unlike
    ``pil_image_decoder``. Verifies the signature, walks the chunk
    stream for IHDR dimensions, and zlib-decompresses the concatenated
    IDAT pixel stream with a scanline-length check — actual decode
    work, not header peeking: a truncated or corrupted payload raises
    instead of returning plausible dimensions. Returns
    (n_bytes, width, height), the ``extract_features`` contract."""
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload (bad signature)")
    pos = 8
    width = height = None
    bit_depth = color_type = 0
    idat = b""
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if ctype == b"IHDR":
            width, height, bit_depth, color_type = struct.unpack(
                ">IIBB", data[:10]
            )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc32
    if width is None or height is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(idat)
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    bytes_per_px = max(1, bit_depth // 8) * channels
    expected = height * (1 + width * bytes_per_px)  # +1 filter byte/row
    if len(raw) != expected:
        raise ValueError(
            f"PNG pixel stream decodes to {len(raw)} bytes, "
            f"expected {expected}"
        )
    return len(payload), int(width), int(height)


def wav_audio_decoder(payload: bytes) -> tuple[int, int, int]:
    """Real audio decode via the stdlib ``wave`` module (RIFF/PCM):
    returns (n_bytes, n_channels, n_frames) mapped onto the generic
    ``extract_features`` int triple — the audio face of the same
    plumbing contract. Reads ALL frames (decode work + length check),
    not just the header."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        n_channels = w.getnchannels()
        n_frames = w.getnframes()
        frames = w.readframes(n_frames)
        if len(frames) != n_frames * n_channels * w.getsampwidth():
            raise ValueError("WAV frame stream shorter than declared")
    return len(payload), n_channels, n_frames


def extract_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decoder: Callable[[bytes], tuple[int, int, int]] | None = None,
) -> DataFrame:
    """mapInPandas feature extraction over a binary column.

    Output schema: (id_col, n_bytes, fake_width, fake_height).
    ``decoder`` defaults to the deterministic stub; pass
    ``pil_image_decoder`` (or any ``bytes -> (n_bytes, w, h)``) for real
    media. Null payloads decode as empty bytes rather than crashing the
    batch — agreeing with the oracle's coalesce-to-'' semantics.
    """
    decode = decoder or _decode_stub
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
            feats = [decode(p if p is not None else b"") for p in pdf[payload_col]]
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
    1->N mapInPandas expansion the real frame sampler would use; the
    expansion itself is vectorized (numpy repeat + ragged arange), no
    per-row Python inside the Arrow batch.
    """
    out_schema = StructType(
        [
            StructField(id_col, LongType(), True),
            StructField("frame_no", IntegerType(), False),
            StructField("offset", IntegerType(), False),
        ]
    )

    def batches(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            lens = pdf[payload_col].map(len).to_numpy(dtype="int64")
            n_frames = (lens + every_n_bytes - 1) // every_n_bytes
            total = int(n_frames.sum())
            # ragged arange: 0..k_i-1 per row, flattened
            starts = np.cumsum(n_frames) - n_frames
            frame_no = np.arange(total) - np.repeat(starts, n_frames)
            yield pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].to_numpy(), n_frames),
                    "frame_no": frame_no.astype("int32"),
                    "offset": (frame_no * every_n_bytes).astype("int32"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, schema=out_schema)


def resize_stub(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    target_w: int = 8,
    target_h: int = 8,
) -> DataFrame:
    """Image-resize shaped operator: payload -> fixed target_w*target_h
    byte buffer (stand-in for resampled pixels), plus the recorded
    output dims. The real plumbing a resize needs — binary in, binary
    out, dims as typed metadata, Arrow batches — with the resample
    itself a deterministic stub (truncate or zero-pad to w*h bytes,
    vectorized via numpy). Swap the kernel for PIL's ``Image.resize``
    where media libs exist; every Spark-side piece stays identical.
    """
    out_schema = StructType(
        [
            StructField(id_col, LongType(), True),
            StructField("payload", BinaryType(), True),
            StructField("width", IntegerType(), False),
            StructField("height", IntegerType(), False),
        ]
    )
    size = target_w * target_h

    def batches(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            out = []
            for p in pdf[payload_col]:
                buf = np.frombuffer(p if p is not None else b"", dtype=np.uint8)
                fixed = np.zeros(size, dtype=np.uint8)
                fixed[: min(len(buf), size)] = buf[:size]
                out.append(fixed.tobytes())
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "payload": out,
                    "width": np.full(len(out), target_w, dtype="int32"),
                    "height": np.full(len(out), target_h, dtype="int32"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, schema=out_schema)


def frame_slices(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every_n_bytes: int = 64,
) -> DataFrame:
    """One row per fixed-size byte slice ("frame") of a binary payload.

    Unlike ``frame_sample_stub`` (which demonstrates the mapInPandas
    expansion), this emits the actual frame BYTES via pure native
    expressions — sequence/explode + binary substring, fully inside
    whole-stage codegen with no Python boundary and no shuffle. Empty
    payloads produce zero frames.
    """
    n = F.length(F.col(payload_col))
    k = F.floor((n + every_n_bytes - 1) / every_n_bytes).cast("int")
    frames = F.when(n > 0, F.sequence(F.lit(0), k - 1)).otherwise(
        F.array().cast("array<int>")
    )
    exploded = df.select(
        id_col, payload_col, F.explode(frames).alias("frame_no")
    )
    return exploded.select(
        id_col,
        "frame_no",
        F.expr(
            f"substring({payload_col}, frame_no * {every_n_bytes} + 1, "
            f"{every_n_bytes})"
        ).alias("frame_bytes"),
    )


def frame_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every_n_bytes: int = 64,
    min_count: int = 2,
) -> DataFrame:
    """Frame-grain exact dedup: which payload slices repeat corpus-wide.

    The video-pipeline version of document dedup — identical frames
    across assets (intro cards, test patterns, re-hosted clips) are
    found by hashing each fixed-size slice and grouping. One shuffle on
    the frame fingerprint; canonical = the lowest (doc, frame) pair,
    carried through the aggregation as one composite int64 so no
    second pass or window is needed.

    Composite bounds (validated in-plan): frame_no must stay below
    1_000_000 (payloads up to ~61 MB at the 64-byte default — far
    above any media frame) and doc ids in [0, ~9.2e12) so the
    composite fits int64 and decodes unambiguously; a violated bound
    raises rather than silently aliasing first_doc_id/first_frame_no.
    The check is a per-row comparison inside codegen (no extra shuffle
    or scan). The decode uses INTEGER division (`div`), matching the
    oracle's `//` exactly at any magnitude.
    """
    frames = frame_slices(df, id_col, payload_col, every_n_bytes)
    # assert_true returns NULL when the bound holds (raises otherwise);
    # adding that NULL-typed zero to the composite keeps the guard in
    # the projection without changing any passing row's value
    bounds_ok = F.assert_true(
        (F.col("frame_no") < 1_000_000)
        & (F.col(id_col) >= 0)
        & (F.col(id_col) < (1 << 63) // 1_000_000 - 1),
        F.lit(
            "frame_dedup: composite key bounds violated "
            f"(need 0 <= {id_col} < ~9.2e12 and frame_no < 1e6)"
        ),
    )
    composite = (
        F.col(id_col) * 1_000_000
        + F.col("frame_no")
        + F.coalesce(bounds_ok.cast("long"), F.lit(0))
    )
    return (
        frames.select(
            F.md5(F.col("frame_bytes")).alias("fingerprint"),
            composite.alias("__pos"),
        )
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.min("__pos").alias("__first"),
        )
        .filter(F.col("n_frames") >= min_count)
        .select(
            "fingerprint",
            "n_frames",
            F.expr("__first div 1000000").alias("first_doc_id"),
            (F.col("__first") % 1_000_000).alias("first_frame_no"),
        )
    )
