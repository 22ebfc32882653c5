"""Multimodal column plumbing: image/audio/video as opaque BINARY columns
with typed metadata, processed by Arrow-batched ``mapInPandas``.

No reference analogue (the reference is tabular-only); this is the
training-data-pipeline surface for multimodal corpora. The Spark-side
plumbing — schema, partition-parallel mapInPandas, batch shapes, metadata
extraction — is real and tested; the actual codec work is STUBBED behind
``DecoderRegistry`` because no image/audio libraries exist in this container:
the default decoder is a deterministic fake (parses the synthetic header
below); swapping in Pillow/torchaudio is a one-line registry change on a
real cluster.

Synthetic blob format (deterministic, used by tests):
  b"FAKEIMG1" + width:4LE + height:4LE + channels:1 + payload
"""

from __future__ import annotations

import struct
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA_DDL = (
    "media_id bigint, kind string, blob binary, mime string"
)

FAKE_MAGIC = b"FAKEIMG1"


def make_fake_image(media_id: int, width: int, height: int,
                    channels: int = 3) -> bytes:
    payload_len = min(width * height * channels, 64)
    rng = np.random.RandomState(media_id % (2**31))
    payload = rng.bytes(payload_len)
    return (FAKE_MAGIC + struct.pack("<IIB", width, height, channels)
            + payload)


def _decode_fake(blob: bytes) -> dict:
    """Deterministic stand-in for a real image decode."""
    if blob is None or not blob.startswith(FAKE_MAGIC):
        raise ValueError("unknown media format")
    w, h, c = struct.unpack_from("<IIB", blob, len(FAKE_MAGIC))
    return {"width": int(w), "height": int(h), "channels": int(c)}


def _decode_real(blob: bytes) -> dict:
    """Real decoder slot — wire Pillow / torchaudio / pyav here on a real
    cluster. Deliberately unimplemented in this container."""
    raise NotImplementedError(
        "real media decoding requires image/audio libraries not present "
        "in this environment; register one via DecoderRegistry.register")


class DecoderRegistry:
    _decoders: dict[str, Callable[[bytes], dict]] = {
        "fake-image": _decode_fake,
        "image": _decode_real,
        "audio": _decode_real,
        "video": _decode_real,
    }

    @classmethod
    def register(cls, kind: str, fn: Callable[[bytes], dict]) -> None:
        cls._decoders[kind] = fn

    @classmethod
    def get(cls, kind: str) -> Callable[[bytes], dict]:
        return cls._decoders[kind]


MEDIA_META_SCHEMA = (
    "media_id bigint, kind string, mime string, n_bytes bigint, "
    "width int, height int, channels int, decode_ok boolean"
)


def extract_media_metadata(df: DataFrame) -> DataFrame:
    """Partition-parallel metadata extraction over the binary column.

    mapInPandas keeps the blob in Arrow buffers end-to-end (no per-row
    Python UDF); output drops the blob so downstream stages never carry it.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"], "kind": pdf["kind"],
                "mime": pdf["mime"],
                "n_bytes": pdf["blob"].map(
                    lambda b: len(b) if b is not None else 0).astype("int64"),
            }
            metas = []
            for kind, blob in zip(pdf["kind"], pdf["blob"]):
                try:
                    metas.append(DecoderRegistry.get(kind)(blob))
                except (NotImplementedError, ValueError, KeyError):
                    metas.append(None)
            out["width"] = pd.array(
                [m["width"] if m else None for m in metas], dtype="Int32")
            out["height"] = pd.array(
                [m["height"] if m else None for m in metas], dtype="Int32")
            out["channels"] = pd.array(
                [m["channels"] if m else None for m in metas], dtype="Int32")
            out["decode_ok"] = [m is not None for m in metas]
            yield pd.DataFrame(out)

    return df.mapInPandas(_extract, schema=MEDIA_META_SCHEMA)


def resize_plan(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize stage plumbing: routes each blob through the registered decoder
    + a resize kernel. The kernel is stubbed (NotImplementedError surfaces as
    decode_ok=false); the distribution strategy — repartition by media_id so
    hot partitions split, blob stays in Arrow — is the real deliverable."""
    meta = extract_media_metadata(df.repartition("media_id"))
    return meta.withColumn("target_width", F.lit(target_w)) \
               .withColumn("target_height", F.lit(target_h))
