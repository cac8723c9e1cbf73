"""Multimodal (image/audio/video) column plumbing.

Media is carried as opaque BINARY columns plus typed metadata, processed
with Arrow-batched mapInPandas (the right shape for per-item Python
work: batch transfer, no per-row pickling, partition-parallel). The
actual codec step is STUBBED -- image/audio libraries are not in this
container -- behind ``decode_fn``: the default deterministic fake parses
a tiny header our fixture writer emits, so schema/partitioning/batching
are fully real and tested while the codec is swappable (pass a real
PIL/ffmpeg-backed decode_fn in production).

Scale notes: mapInPandas streams Arrow batches, so peak memory is
O(batch), not O(partition); media bytes never shuffle (metadata-only
projections drop the binary column before any wide stage).
"""

from __future__ import annotations

import struct
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField("source_uri", StringType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("byte_len", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("format", StringType()),
    ]
)

MAGIC = b"FAKE"
_HEADER = struct.Struct(">4sHHH")  # magic, width, height, n_frames


def encode_fake_media(width: int, height: int, n_frames: int = 1) -> bytes:
    """Deterministic fixture payload: 10-byte header + zero body."""
    return _HEADER.pack(MAGIC, width, height, n_frames) + b"\x00" * 16


def fake_decode(content: bytes) -> tuple[int, int, int, str]:
    """STUB decode (deterministic): parse the fake header. A real
    implementation would hand bytes to PIL/libav here; swap via the
    decode_fn parameter of decode_media."""
    if content[:4] == MAGIC:
        _, w, h, f = _HEADER.unpack(content[: _HEADER.size])
        return int(w), int(h), int(f), "fake"
    raise NotImplementedError(
        "real media decoding requires PIL/ffmpeg (not in this container); "
        "pass decode_fn= to decode_media"
    )


def decode_media(
    df: DataFrame,
    decode_fn: Callable[[bytes], tuple[int, int, int, str]] = fake_decode,
    batch_size_hint: int = 256,
) -> DataFrame:
    """BINARY media -> typed metadata via Arrow-batched mapInPandas."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "byte_len": pdf["content"].map(len).astype("int64"),
            }
            decoded = pdf["content"].map(decode_fn)
            out["width"] = decoded.map(lambda t: t[0]).astype("int32")
            out["height"] = decoded.map(lambda t: t[1]).astype("int32")
            out["n_frames"] = decoded.map(lambda t: t[2]).astype("int32")
            out["format"] = decoded.map(lambda t: t[3])
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=DECODED_SCHEMA)


def frame_sample_plan(decoded: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling *plan*: one output row per sampled frame index
    (posexplode over the frame count). The per-frame pixel fetch is the
    stubbed codec step; the Spark-side shape (explode -> per-frame rows,
    binary never carried) is the real scale design."""
    return decoded.select(
        "media_id",
        "kind",
        F.explode(
            F.sequence(
                F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n)
            )
        ).alias("frame_index"),
    )


FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def fake_features(content: bytes, dim: int) -> list[float]:
    """STUB feature extractor (deterministic): derive ``dim`` floats in
    [-1, 1) by hashing (content, lane). A real implementation would run
    an encoder model here; swap via feature_fn."""
    import hashlib

    out = []
    for i in range(dim):
        h = hashlib.blake2b(content, digest_size=8, salt=i.to_bytes(8, "big"))
        out.append(int.from_bytes(h.digest(), "big") / 2**63 - 1.0)
    return out


def md5_features(content: bytes, dim: int) -> list[float]:
    """STUB feature extractor, oracle-reproducible variant: ``dim``
    floats in [-1, 1) from md5 over (hex(content), lane), truncated to
    float32 like FEATURE_SCHEMA stores them. Unlike fake_features'
    blake2b (Python-only), every step here -- md5, 60-bit prefix,
    scaling, float32 truncation -- has an exact DuckDB twin, which is
    what lets a full multimodal pipeline be value-checked cross-engine
    (plans/scale_queries.py:media_features_exact)."""
    import hashlib

    hx = content.hex()
    out = []
    for i in range(dim):
        v = int(hashlib.md5(f"{hx}-{i}".encode()).hexdigest()[:15], 16)
        # float32 truncation mirrors the Arrow float column; do it here
        # so the Python- and SQL-side values agree bit-for-bit
        out.append(struct.unpack("f", struct.pack("f", v / 2**59 - 1.0))[0])
    return out


def extract_features(
    df: DataFrame,
    dim: int = 64,
    feature_fn: Callable[[bytes, int], list[float]] = fake_features,
) -> DataFrame:
    """BINARY media -> fixed-dim embedding column via Arrow-batched
    mapInPandas: the bridge from media to the similarity operators
    (operators/similarity.py top-k / IVF run unchanged on the output).
    One model invocation per item, batch-amortized; the binary column is
    dropped in the output so downstream shuffles move only vectors."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "embedding": pdf["content"].map(
                        lambda b: feature_fn(b, dim)
                    ),
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def fake_resize(content: bytes, width: int, height: int) -> bytes:
    """STUB resize (deterministic): rewrite the fake header's dimensions,
    body untouched. A real implementation calls PIL/libswscale."""
    if content[:4] != MAGIC:
        raise NotImplementedError(
            "real media resizing requires PIL/ffmpeg (not in this "
            "container); pass resize_fn= to resize_media"
        )
    _, _, _, f = _HEADER.unpack(content[: _HEADER.size])
    return _HEADER.pack(MAGIC, width, height, f) + content[_HEADER.size :]


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    resize_fn: Callable[[bytes, int, int], bytes] = fake_resize,
) -> DataFrame:
    """BINARY -> BINARY transform preserving MEDIA_SCHEMA (so resize
    composes with decode_media/extract_features). mapInPandas keeps the
    bytes inside one partition end-to-end -- a resize never causes a
    shuffle of media payloads."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "content": pdf["content"].map(
                        lambda b: resize_fn(b, width, height)
                    ),
                    "source_uri": pdf["source_uri"],
                }
            )

    return df.mapInPandas(run, schema=MEDIA_SCHEMA)


def fake_phash(content: bytes) -> int:
    """STUB perceptual hash (deterministic, byte-space locality): 64
    bits, bit i = XOR-parity of the i-th of 64 equal byte chunks, so
    editing k bytes flips at most k bits -- honest Hamming locality
    without a pixel decode. A real implementation computes aHash/pHash
    on decoded pixels (PIL not in this container); swap via the
    phash_fn parameter."""
    n = len(content)
    bits = 0
    for i in range(64):
        lo, hi = (i * n) // 64, ((i + 1) * n) // 64
        x = 0
        for byte in content[lo:hi]:
            x ^= byte
        bits |= (bin(x).count("1") & 1) << i
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def media_phash(
    df: DataFrame,
    phash_fn: Callable[[bytes], int] = fake_phash,
    out_col: str = "phash",
) -> DataFrame:
    """BINARY media -> 64-bit perceptual fingerprint (BIGINT) via
    Arrow-batched mapInPandas -- the image-dedup front half. The
    content column is dropped on output, so everything downstream
    (banding, joins, clustering) moves 8-byte signatures, never
    payloads. NULL content propagates as NULL phash (review: the batch
    guards None BEFORE calling phash_fn, so a NULL payload row follows
    the library's NULL-propagation convention instead of raising
    TypeError mid-job -- and injected phash_fns don't each need their
    own guard)."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    out_col: pdf["content"]
                    .map(lambda b: None if b is None else phash_fn(b))
                    .astype("Int64"),  # nullable int64 -> NULL phash
                }
            )

    return df.mapInPandas(
        run, schema=f"media_id long, kind string, {out_col} long"
    )


def media_near_dups(
    df: DataFrame,
    max_hamming: int = 3,
    bands: int = 4,
    phash_fn: Callable[[bytes], int] = fake_phash,
) -> DataFrame:
    """Perceptual near-duplicate media pairs: fingerprint (media_phash)
    then Hamming-band blocking (neardup.hamming_candidates) -- the
    image twin of the text simhash pipeline, completing the multimodal
    dedup story. Pigeonhole gives EXACT recall for
    max_hamming <= bands - 1; larger radii trade recall for fewer
    buckets. Returns (id_a, id_b, hamming); bytes never shuffle. Rows
    with NULL content (NULL phash) are excluded -- no payload, nothing
    to near-match."""
    from bigdata_storage_and_proccess_job_data_spark.operators import neardup

    return neardup.hamming_candidates(
        media_phash(df, phash_fn=phash_fn).filter(
            F.col("phash").isNotNull()
        ),
        "media_id",
        "phash",
        max_hamming=max_hamming,
        bands=bands,
    )
