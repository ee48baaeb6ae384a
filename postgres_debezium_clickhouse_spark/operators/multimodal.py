"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched pandas functions.

The container ships no image/audio codecs, so the DECODE step is stubbed
(deterministic fake features / NotImplementedError for real codecs) — but
everything Spark-side is real and tested: schemas, binary encoding, the
``mapInPandas`` batch shape, partition sizing.  Swapping the stub for
PIL/librosa/ffmpeg is a one-function change.

Scale notes: media blobs are large → ``mapInPandas`` (Arrow batches) keeps
transfer columnar; partition sizing must target
``spark.sql.files.maxPartitionBytes`` worth of BLOBS not rows — callers
should store media in parquet binary columns with row-group sizes tuned to
a few hundred MB, or (beyond ~1 MB/blob) as object-store files referenced
by URI, which is what the metadata struct carries.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from ._pipe import pipe_map

#: typed metadata carried next to every media blob.
MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("format", T.StringType()),  # png|wav|mp4|...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("uri", T.StringType()),  # object-store pointer for >1MB blobs
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def attach_fake_media(documents: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Fixture builder: deterministic binary 'media' derived from text (the
    utf-8 bytes) + a metadata struct — stands in for real decoded blobs."""
    return documents.select(
        F.col(id_col),
        F.col(text_col).cast("binary").alias("media"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("fake").alias("format"),
            (F.length(text_col) % 64).cast("int").alias("width"),
            (F.length(text_col) % 48).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.concat(F.lit("memory://doc/"), F.col(id_col).cast("string")).alias("uri"),
        ).alias("media_meta"),
    )


def decode_media(blob: bytes, media_type: str):
    """Media decode dispatch.  PNG (full stdlib decode), JPEG (header
    dims), WAV (16-bit PCM), and Y4M (C444 frames) decode for REAL —
    operators/imaging.py, audio.py, video.py.  Error contract: corrupt
    input in a recognized container raises ValueError (uniform across
    modalities); formats needing codec libraries the container lacks
    raise NotImplementedError (honest swap-in points for Pillow/pyav)."""
    if media_type == "image":
        from .imaging import decode_image

        return decode_image(bytes(blob))
    if media_type == "audio":
        from .audio import decode_audio

        return decode_audio(bytes(blob))
    if media_type == "video":
        from .video import decode_video

        return decode_video(bytes(blob))
    raise NotImplementedError(
        f"no stdlib codec for media_type={media_type!r}; "
        "wire in soundfile/pyav inside the same mapInPandas batch loop"
    )


def extract_features(media_df: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over binary media columns.

    The pandas function receives columnar batches (media bytes as Python
    ``bytes``) — the exact shape a real decoder needs.  The fake 'decode'
    is a deterministic byte-histogram projection, so tests can assert
    values."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for blob in pdf["media"]:
                b = bytes(blob)
                # deterministic fake decode: 4-bin byte histogram, normalized
                hist = [0, 0, 0, 0]
                for byte in b:
                    hist[byte % 4] += 1
                n = max(len(b), 1)
                feats.append([h / n for h in hist])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["media"].map(lambda x: len(bytes(x))),
                    "feature": feats,
                }
            )

    return pipe_map(media_df, _extract, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("thumb", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_media(media_df: DataFrame, width: int = 8, height: int = 8) -> DataFrame:
    """Resize plumbing over ``mapInPandas``: emits a fixed-size thumbnail
    per blob.  The fake 'resampler' truncates/right-pads the byte stream to
    ``width*height`` bytes — a real deployment swaps in PIL's
    ``Image.resize`` inside the same batch loop; schema, Arrow transfer,
    and output sizing are the real contract."""
    n = width * height

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = [bytes(b)[:n].ljust(n, b"\0") for b in pdf["media"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "thumb": thumbs,
                    "width": width,
                    "height": height,
                }
            )

    return pipe_map(media_df, _resize, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(media_df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling (one blob → N rows) over ``mapInPandas`` — the video
    path's row-expansion shape.  The fake 'decoder' slices the byte stream
    into ``n_frames`` evenly-spaced chunks; a real deployment decodes with
    pyav/ffmpeg at the same evenly-spaced timestamps.  Output cardinality =
    input × n_frames (empty blobs yield zero frames)."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                b = bytes(blob)
                if not b:
                    continue
                step = max(len(b) // n_frames, 1)
                for i in range(n_frames):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(b[i * step : i * step + step] or b[-step:])
            yield pd.DataFrame({"doc_id": ids, "frame_index": idxs, "frame": frames})

    return pipe_map(media_df, _sample, schema=FRAME_SCHEMA)


def media_byte_stats(media_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Pure-SQL metadata pass (no Python): byte length + meta projection —
    the cheap pre-filter that runs BEFORE any decode at scale."""
    return media_df.select(
        F.col(id_col),
        F.length("media").cast("long").alias("n_bytes"),
        F.col("media_meta.media_type").alias("media_type"),
        F.col("media_meta.uri").alias("uri"),
    )


def read_media_from_uris(
    df: DataFrame, uri_col: str = "uri", out_col: str = "media"
) -> DataFrame:
    """Fetch out-of-band media blobs by URI — the >1 MB pattern where
    parquet carries only a pointer (MEDIA_META.uri) and bytes live in an
    object store.  ``file://`` URIs are read directly (works against any
    fuse/NFS mount); other schemes raise until a fetcher is wired in.

    mapInPandas so fetches batch per partition and bytes move back
    Arrow-columnar; partition count should track blob bytes, not rows
    (repartition upstream by expected size class)."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(df.schema.fields + [T.StructField(out_col, T.BinaryType())])

    def _fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for uri in pdf[uri_col]:
                if uri is None:
                    blobs.append(None)
                elif uri.startswith("file://"):
                    with open(uri[len("file://"):], "rb") as f:
                        blobs.append(f.read())
                else:
                    raise NotImplementedError(f"no fetcher for scheme of {uri!r}")
            pdf = pdf.copy()
            pdf[out_col] = blobs
            yield pdf

    return df.mapInPandas(_fetch, schema=schema)
