"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with struct metadata.
The Spark-side plumbing — schemas, Arrow batch shapes, partition-size
discipline (binary rows are fat: cap ``maxRecordsPerBatch``/file split
sizes) — is real and tested; the actual media decoding is stubbed behind
``DECODERS`` because codec libraries are not available in this
environment.  Plug a real decoder in by registering a function
``bytes -> dict`` per modality.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "id BIGINT, modality STRING, n_bytes BIGINT, header_hex STRING, "
    "width INT, height INT, duration_ms INT, ok BOOLEAN, error STRING"
)

#: modality -> decoder(bytes) -> dict(width, height, duration_ms, ...)
DECODERS: dict[str, Callable[[bytes], dict]] = {}


def _deterministic_fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a real media decoder: derives fake
    dimensions from the payload bytes so tests are stable and the full
    pipeline (schema, batching, error paths) is exercised."""
    if len(payload) == 0:
        raise ValueError("empty payload")
    h = int.from_bytes(payload[:8].ljust(8, b"\0"), "little")
    return {"width": 16 + h % 1024, "height": 16 + (h >> 10) % 1024,
            "duration_ms": int(h % 100_000)}


def decode_media_meta(df: DataFrame, payload_col: str = "html",
                      id_col: str = "doc_id", modality: str = "image",
                      use_fake: bool = True) -> DataFrame:
    """Arrow-batched metadata extraction over a binary column.

    Emits one metadata row per input row; decoder failures are captured
    per-row (ok=false, error) rather than failing the task — at corpus
    scale a fraction of payloads is always corrupt.
    """
    decoder = DECODERS.get(modality)
    if decoder is None:
        if not use_fake:
            raise NotImplementedError(
                f"no decoder registered for {modality!r}; codec libraries "
                "are unavailable in this environment — register one in "
                "tantivy_spark.pipeline.multimodal.DECODERS"
            )
        decoder = _deterministic_fake_decode

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf["_id"], pdf["_payload"]):
                payload = bytes(payload) if payload is not None else b""
                base = {
                    "id": int(rid), "modality": modality,
                    "n_bytes": len(payload),
                    "header_hex": payload[:8].hex(),
                    "width": None, "height": None, "duration_ms": None,
                    "ok": False, "error": None,
                }
                try:
                    meta = decoder(payload)
                    base.update(meta)
                    base["ok"] = True
                except Exception as e:  # per-row failure isolation
                    base["error"] = f"{type(e).__name__}: {e}"
                rows.append(base)
            yield pd.DataFrame(rows)

    src = df.select(F.col(id_col).alias("_id"), F.col(payload_col).alias("_payload"))
    return src.mapInPandas(kernel, schema=MEDIA_META_SCHEMA)


#: magic-byte signatures -> container format (format sniffing needs no
#: codec library: it reads the payload header only)
MAGIC_SIGNATURES: list[tuple[bytes, str]] = [
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"GIF87a", "gif"),
    (b"GIF89a", "gif"),
    (b"RIFF", "riff"),          # wav/avi/webp container
    (b"OggS", "ogg"),
    (b"fLaC", "flac"),
    (b"ID3", "mp3"),
    (b"\x1a\x45\xdf\xa3", "matroska"),  # mkv/webm
    (b"%PDF", "pdf"),
    (b"PK\x03\x04", "zip"),
    (b"\x1f\x8b", "gzip"),
]


def media_binary_features(df: DataFrame, payload_col: str = "payload",
                          id_col: str = "doc_id") -> DataFrame:
    """REAL (codec-free) features over an opaque binary column:
    container-format sniff by magic bytes, payload size, header hex, a
    64-bit content fingerprint, and byte-level entropy in bits/byte —
    the standard cheap filters a multimodal training pipeline applies
    before any decode (dedup by fingerprint, drop truncated/low-entropy
    payloads, route by container format).

    Execution split: format sniff, size, and header hex are PLAIN JVM
    expressions (binary substring comparisons against the magic table,
    octet_length, hex) — whole-stage-codegen'd, no Python.  Only what
    genuinely needs the payload BYTES in Python — the blake2b
    fingerprint (C-speed per call) and the numpy bincount entropy —
    runs in an Arrow-batched pandas UDF, whose per-row loop touches
    nothing else."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<fingerprint: bigint, entropy_r: double>")
    def _payload_stats(payloads: pd.Series) -> pd.DataFrame:
        import hashlib

        fps, ents = [], []
        for payload in payloads:
            b = bytes(payload) if payload is not None else b""
            fps.append(int.from_bytes(
                hashlib.blake2b(b, digest_size=8).digest(), "big",
                signed=False) - (1 << 63))
            if b:
                arr = np.frombuffer(b, dtype=np.uint8)
                counts = np.bincount(arr, minlength=256)
                p = counts[counts > 0] / len(arr)
                ents.append(round(float(-(p * np.log2(p)).sum()), 4))
            else:
                ents.append(0.0)
        return pd.DataFrame({"fingerprint": fps, "entropy_r": ents})

    payload = F.coalesce(F.col(payload_col), F.lit(b""))
    fmt = F.lit("unknown")
    # build the when-chain innermost-last so earlier signatures win,
    # matching the MAGIC_SIGNATURES priority order
    for sig, name in reversed(MAGIC_SIGNATURES):
        fmt = F.when(F.substring(payload, 1, len(sig)) == F.lit(sig),
                     F.lit(name)).otherwise(fmt)
    stats = _payload_stats(payload)
    return df.select(
        F.col(id_col).cast("bigint").alias("id"),
        fmt.alias("format"),
        F.octet_length(payload).cast("bigint").alias("n_bytes"),
        F.lower(F.hex(F.substring(payload, 1, 4))).alias("header_hex"),
        stats["fingerprint"].alias("fingerprint"),
        stats["entropy_r"].alias("entropy_r"))


#: modality registries for the transform stubs (same pattern as
#: DECODERS: register real implementations when codec libraries exist)
RESIZERS: dict[str, Callable[[bytes, int, int], bytes]] = {}
FRAME_SAMPLERS: dict[str, Callable[[bytes, int], list[bytes]]] = {}

RESIZE_SCHEMA = ("id BIGINT, n_bytes_in BIGINT, n_bytes_out BIGINT, "
                 "width INT, height INT, payload BINARY, "
                 "ok BOOLEAN, error STRING")

FRAMES_SCHEMA = ("id BIGINT, frame_idx INT, ts_ms BIGINT, "
                 "frame BINARY, ok BOOLEAN, error STRING")


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic resize stand-in: a pseudo-bitmap whose bytes derive
    from (payload digest, target dims) — stable across partitionings so
    the plumbing (schema, batch shape, size accounting) is testable
    without codec libraries."""
    import hashlib
    if len(payload) == 0:
        raise ValueError("empty payload")
    seed = hashlib.blake2b(payload, digest_size=8,
                           person=b"resize__").digest()
    n = max(1, (width * height) // 64)        # fake 1/64 byte-per-pixel
    return (seed * ((n + 7) // 8))[:n]


def resize_images(df: DataFrame, payload_col: str = "payload",
                  id_col: str = "doc_id", width: int = 224,
                  height: int = 224, modality: str = "image",
                  use_fake: bool = True) -> DataFrame:
    """Image resize plumbing: Arrow-batched mapInPandas, one output row
    per input, per-row failure isolation (ok/error columns).  The
    transform itself is a registry entry (RESIZERS) with a deterministic
    fake default — the Spark-side shape is the real deliverable here."""
    resizer = RESIZERS.get(modality)
    if resizer is None:
        if not use_fake:
            raise NotImplementedError(
                f"no resizer registered for {modality!r}; register one "
                "in tantivy_spark.pipeline.multimodal.RESIZERS")
        resizer = _fake_resize

    w, h = int(width), int(height)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf["_id"], pdf["_payload"]):
                payload = bytes(payload) if payload is not None else b""
                row = {"id": int(rid), "n_bytes_in": len(payload),
                       "n_bytes_out": 0, "width": w, "height": h,
                       "payload": b"", "ok": False, "error": None}
                try:
                    out = resizer(payload, w, h)
                    row.update(n_bytes_out=len(out), payload=out, ok=True)
                except Exception as e:
                    row["error"] = f"{type(e).__name__}: {e}"
                rows.append(row)
            yield pd.DataFrame(rows)

    src = df.select(F.col(id_col).alias("_id"),
                    F.col(payload_col).alias("_payload"))
    return src.mapInPandas(kernel, schema=RESIZE_SCHEMA)


def _fake_sample_frames(payload: bytes, every_ms: int) -> list[bytes]:
    """Deterministic frame-sampler stand-in: duration from the fake
    decoder, one pseudo-frame per interval, frame bytes derived from
    (payload digest, frame index)."""
    import hashlib
    meta = _deterministic_fake_decode(payload)
    n = max(1, int(meta["duration_ms"]) // max(1, int(every_ms)))
    seed = hashlib.blake2b(payload, digest_size=8,
                           person=b"frames__").digest()
    return [bytes(b ^ (i & 0xFF) for b in seed) for i in range(n)]


def sample_frames(df: DataFrame, payload_col: str = "payload",
                  id_col: str = "doc_id", every_ms: int = 1000,
                  max_frames: int = 8, modality: str = "video",
                  use_fake: bool = True) -> DataFrame:
    """Video frame-sampling plumbing: mapInPandas with a 1->N batch
    shape (one output row PER FRAME, capped at ``max_frames``), per-row
    failure isolation.  Registry + deterministic fake like the other
    media transforms."""
    sampler = FRAME_SAMPLERS.get(modality)
    if sampler is None:
        if not use_fake:
            raise NotImplementedError(
                f"no frame sampler registered for {modality!r}; register "
                "one in tantivy_spark.pipeline.multimodal.FRAME_SAMPLERS")
        sampler = _fake_sample_frames

    ev, cap = int(every_ms), int(max_frames)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf["_id"], pdf["_payload"]):
                payload = bytes(payload) if payload is not None else b""
                try:
                    frames = sampler(payload, ev)[:cap]
                    rows.extend(
                        {"id": int(rid), "frame_idx": i, "ts_ms": i * ev,
                         "frame": fr, "ok": True, "error": None}
                        for i, fr in enumerate(frames))
                except Exception as e:
                    rows.append({"id": int(rid), "frame_idx": -1,
                                 "ts_ms": -1, "frame": b"", "ok": False,
                                 "error": f"{type(e).__name__}: {e}"})
            yield pd.DataFrame(rows)

    src = df.select(F.col(id_col).alias("_id"),
                    F.col(payload_col).alias("_payload"))
    return src.mapInPandas(kernel, schema=FRAMES_SCHEMA)
