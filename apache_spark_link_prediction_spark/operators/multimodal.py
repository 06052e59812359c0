"""Multimodal column operators: image/audio/video as opaque ``binary``
payloads with typed metadata, processed by Arrow-batched pandas
functions over ``mapInPandas``.

The Spark-side plumbing — schemas, batch iteration, partition sizing,
metadata propagation — is real and tested. The codec layer (actual
JPEG/WAV decode) is stubbed behind ``DECODERS``: the container has no
image/audio libraries, so the default decoders are deterministic fakes
that parse our own synthetic payload header; swap in
Pillow/soundfile/etc. by registering a real decoder. Clearly marked —
see ``decode_stub``.

Scale notes: payloads stay in the ``binary`` column end-to-end (no
base64 round-trips); mapInPandas streams Arrow batches so one task
never materializes its whole partition; feature extraction emits only
small typed columns, so the shuffle after extraction moves features,
not media. Partition count should target ~128 MB of payload per task
(``spark.sql.files.maxPartitionBytes``).
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed media metadata carried alongside every payload.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha256", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

# Synthetic payload layout used by the stub codec (and the datagen in
# tests): magic 'SGM1' + u16 width + u16 height + u32 duration_ms + body.
_STUB_MAGIC = b"SGM1"
_STUB_HEADER = struct.Struct(">4sHHI")


def make_stub_payload(width: int, height: int, duration_ms: int, body: bytes = b"") -> bytes:
    return _STUB_HEADER.pack(_STUB_MAGIC, width, height, duration_ms) + body


def decode_stub(payload: bytes) -> dict:
    """STUB DECODER — deterministic fake standing in for a real codec
    (Pillow / libsndfile / ffmpeg are not installed in this container).
    Parses the synthetic SGM1 header; raises on anything else exactly
    like a real decoder would on a corrupt file."""
    if payload is None or len(payload) < _STUB_HEADER.size or payload[:4] != _STUB_MAGIC:
        raise ValueError("decode_stub: not an SGM1 payload")
    _, width, height, duration_ms = _STUB_HEADER.unpack(payload[: _STUB_HEADER.size])
    return {"width": width, "height": height, "duration_ms": duration_ms}


# Modality → decoder registry. Replace entries with real codecs in a
# full deployment; the Spark plumbing below is unchanged.
DECODERS: dict[str, Callable[[bytes], dict]] = {
    "image": decode_stub,
    "audio": decode_stub,
    "video": decode_stub,
}


def extract_media_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract every payload via ``mapInPandas``
    (Arrow batches; one Python worker per partition, vectorized
    hashing). Undecodable payloads yield null decode fields but keep
    byte-level features — at 100 TB you quarantine, not crash."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else None
                    ),
                    "sha256": pdf["payload"].map(
                        lambda p: hashlib.sha256(p).hexdigest() if p is not None else None
                    ),
                }
            )
            decoded = []
            for modality, payload in zip(pdf["modality"], pdf["payload"]):
                try:
                    decoded.append(DECODERS[modality](payload))
                except Exception:
                    decoded.append({})
            out["width"] = pd.array(
                [d.get("width") for d in decoded], dtype="Int32"
            )
            out["height"] = pd.array(
                [d.get("height") for d in decoded], dtype="Int32"
            )
            out["duration_ms"] = pd.array(
                [d.get("duration_ms") for d in decoded], dtype="Int32"
            )
            yield out

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


def media_from_documents(docs: DataFrame, *, modality: str = "image") -> DataFrame:
    """Adapter for the testbed: wrap each document's text bytes in a
    synthetic SGM1 payload so the full binary pipeline is exercisable
    without media files. width/height derive deterministically from
    doc_id; duration from n_chars."""
    w = F.col("doc_id") % 1920 + 1
    h = F.col("doc_id") % 1080 + 1
    dur = F.col("n_chars") * 10
    header = F.unhex(
        F.concat(
            F.lit(_STUB_MAGIC.hex().upper()),
            _be_hex(w, 2),
            _be_hex(h, 2),
            _be_hex(dur, 4),
        )
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(modality).alias("modality"),
        F.lit("application/x-sgm1").alias("mime"),
        F.concat(header, F.encode("text", "UTF-8")).alias("payload"),
    )


def _be_hex(col, width_bytes: int):
    """Big-endian fixed-width hex encoding of a non-negative int column —
    unhex(concat(...)) builds the binary header JVM-side (no Python in
    the plan, concat stays whole-stage-codegen'd)."""
    return F.lpad(F.hex(col.cast("long")), width_bytes * 2, "0")
