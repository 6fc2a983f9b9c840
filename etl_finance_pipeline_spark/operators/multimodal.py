"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs
over ``mapInPandas``.

The container has no image/audio codecs (no PIL/ffmpeg), so the actual
decode kernels are STUBBED: ``decode="real"`` raises
``NotImplementedError`` with the dependency named, and the default
``decode="fake"`` is a deterministic byte-level kernel so the
Spark-side plumbing — schema evolution, Arrow batch shapes, partition
preservation, UDF signatures — is real and fully tested. Swapping in a
real codec is a one-function change per modality.

Scale notes (100 TB design point):
 * ``mapInPandas`` streams Arrow record batches through the Python
   worker — memory is bounded by
   ``spark.sql.execution.arrow.maxRecordsPerBatch`` regardless of
   partition size; binary payloads never land on the driver.
 * Decode is a narrow transformation: no shuffle, parallelism = input
   file splits. Repartition UPSTREAM by a cheap column (e.g. content
   length bucket) if payload sizes are pathologically skewed.
 * Feature extraction emits fixed-width ``array<float>`` columns —
   downstream ANN/dedup operators (operators.similarity) consume them
   directly.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

#: Canonical multimodal schema fragment: payload + typed metadata.
MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("format", T.StringType()),  # png|wav|mp4|...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)

IMAGE_STATS_TYPE = T.StructType(
    [
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mean_intensity", T.DoubleType()),
        T.StructField("min_byte", T.IntegerType()),
        T.StructField("max_byte", T.IntegerType()),
    ]
)


def with_media_metadata(
    df: DataFrame,
    content_col: str = "content",
    media_type: str = "image",
    fmt: str = "raw",
    width: int | None = None,
    height: int | None = None,
) -> DataFrame:
    """Attach the canonical typed-metadata struct next to a binary
    payload column."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.lit(width).cast("int").alias("width"),
            F.lit(height).cast("int").alias("height"),
            F.lit(None).cast("int").alias("n_frames"),
            F.lit(None).cast("int").alias("sample_rate"),
        ),
    )


def _require_real_codec(modality: str, lib: str) -> None:
    raise NotImplementedError(
        f"real {modality} decode requires {lib}, which is not installed "
        f"in this environment — use decode='fake' (deterministic stub) "
        f"or install {lib} and extend the kernel"
    )


def decode_image_stats(
    df: DataFrame,
    content_col: str = "content",
    id_cols: tuple[str, ...] = ("media_id",),
    decode: str = "fake",
) -> DataFrame:
    """Per-image decode → summary stats, as an Arrow-batched
    ``mapInPandas``.

    ``decode="fake"``: deterministic byte-level kernel (treats the
    payload as raw 8-bit intensities) — exercises the full plumbing.
    ``decode="real"``: would decode with PIL; raises
    ``NotImplementedError`` here (codec not installed).

    Output: id columns + ``stats`` struct (IMAGE_STATS_TYPE).
    """
    if decode == "real":  # pragma: no cover - environment-dependent
        _require_real_codec("image", "PIL")

    out_schema = T.StructType(
        [df.schema[c] for c in id_cols] + [T.StructField("stats", IMAGE_STATS_TYPE)]
    )
    id_list = list(id_cols)

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            stats = []
            for payload in pdf[content_col]:
                if payload is None or len(payload) == 0:
                    stats.append(
                        {"n_bytes": 0, "mean_intensity": None, "min_byte": None, "max_byte": None}
                    )
                    continue
                b = bytes(payload)
                stats.append(
                    {
                        "n_bytes": len(b),
                        "mean_intensity": sum(b) / len(b),
                        "min_byte": min(b),
                        "max_byte": max(b),
                    }
                )
            out = pdf[id_list].copy()
            out["stats"] = stats
            yield out

    return df.select(*id_cols, content_col).mapInPandas(kernel, out_schema)


def image_byte_histogram(
    df: DataFrame,
    content_col: str = "content",
    id_cols: tuple[str, ...] = ("media_id",),
    n_bins: int = 16,
) -> DataFrame:
    """Fixed-width byte-histogram feature vector per payload
    (normalized to sum 1) — a deterministic stand-in for an embedding
    model, shaped exactly like one: ``array<double>`` of *n_bins*.

    Output feeds operators.similarity directly (cosine_topk etc.).
    """
    out_schema = T.StructType(
        [df.schema[c] for c in id_cols]
        + [T.StructField("features", T.ArrayType(T.DoubleType()))]
    )
    id_list = list(id_cols)
    width = 256 // n_bins

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            feats = []
            for payload in pdf[content_col]:
                if payload is None or len(payload) == 0:
                    feats.append([0.0] * n_bins)
                    continue
                b = bytes(payload)
                hist = [0] * n_bins
                for byte in b:
                    hist[byte // width] += 1
                total = float(len(b))
                feats.append([h / total for h in hist])
            out = pdf[id_list].copy()
            out["features"] = feats
            yield out

    return df.select(*id_cols, content_col).mapInPandas(kernel, out_schema)


def resize_images(
    df: DataFrame,
    content_col: str = "content",
    target_width: int = 224,
    target_height: int = 224,
    decode: str = "fake",
) -> DataFrame:
    """Resize stub. ``fake`` mode truncates/pads the payload to
    ``target_width*target_height`` bytes (deterministic, preserves the
    binary-in/binary-out contract); ``real`` mode raises (needs PIL)."""
    if decode == "real":  # pragma: no cover
        _require_real_codec("image", "PIL")
    n = target_width * target_height
    # BINARY rpad with a byte pad is supported since Spark 3.3
    resized = F.rpad(
        F.substring(F.col(content_col), 1, n).cast("binary"), n, bytes([0])
    )
    out = df.withColumn(content_col, resized)
    if "media_meta" in df.columns:
        out = out.withColumn(
            "media_meta",
            F.col("media_meta")
            .withField("width", F.lit(target_width))
            .withField("height", F.lit(target_height)),
        )
    return out


AUDIO_STATS_TYPE = T.StructType(
    [
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.IntegerType()),
    ]
)


def decode_audio_stats(
    df: DataFrame,
    content_col: str = "content",
    id_cols: tuple[str, ...] = ("media_id",),
    sample_rate: int = 16_000,
    decode: str = "fake",
) -> DataFrame:
    """Per-clip audio decode → summary stats (RMS, peak, duration) as
    an Arrow-batched ``mapInPandas``.

    ``fake`` mode treats the payload as signed 8-bit PCM mono at
    *sample_rate* — deterministic, exercises the full plumbing;
    ``real`` mode would use soundfile/ffmpeg (not installed → raises).
    """
    if decode == "real":  # pragma: no cover
        _require_real_codec("audio", "soundfile/ffmpeg")

    out_schema = T.StructType(
        [df.schema[c] for c in id_cols] + [T.StructField("stats", AUDIO_STATS_TYPE)]
    )
    id_list = list(id_cols)

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            stats = []
            for payload in pdf[content_col]:
                if payload is None or len(payload) == 0:
                    stats.append(
                        {"n_samples": 0, "duration_s": 0.0, "rms": None, "peak": None}
                    )
                    continue
                # signed 8-bit PCM: byte -> [-128, 127]
                samples = [b - 256 if b > 127 else b for b in bytes(payload)]
                n = len(samples)
                stats.append(
                    {
                        "n_samples": n,
                        "duration_s": n / sample_rate,
                        "rms": (sum(s * s for s in samples) / n) ** 0.5,
                        "peak": max(abs(s) for s in samples),
                    }
                )
            out = pdf[id_list].copy()
            out["stats"] = stats
            yield out

    return df.select(*id_cols, content_col).mapInPandas(kernel, out_schema)


def sample_video_frames(
    df: DataFrame,
    content_col: str = "content",
    id_cols: tuple[str, ...] = ("media_id",),
    every_n: int = 10,
    frame_bytes: int = 64,
    decode: str = "fake",
) -> DataFrame:
    """Frame-sampling stub: ``fake`` mode treats the payload as
    concatenated *frame_bytes*-sized frames and emits every *every_n*-th
    one (one output row per sampled frame — a 1→N mapInPandas, the real
    shape of video frame extraction). ``real`` mode raises (ffmpeg)."""
    if decode == "real":  # pragma: no cover
        _require_real_codec("video", "ffmpeg/pyav")

    out_schema = T.StructType(
        [df.schema[c] for c in id_cols]
        + [
            T.StructField("frame_index", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )
    id_list = list(id_cols)

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = r[content_col]
                if payload is None:
                    continue
                b = bytes(payload)
                n_frames = len(b) // frame_bytes
                for i in range(0, n_frames, every_n):
                    rows.append(
                        {
                            **{c: r[c] for c in id_list},
                            "frame_index": i,
                            "frame": b[i * frame_bytes : (i + 1) * frame_bytes],
                        }
                    )
            yield pd.DataFrame(
                rows, columns=id_list + ["frame_index", "frame"]
            )

    return df.select(*id_cols, content_col).mapInPandas(kernel, out_schema)
