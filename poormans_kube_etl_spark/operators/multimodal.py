"""Multimodal (binary) column plumbing — SURVEY.md §2b.

Images/audio/video are opaque ``binary`` columns with typed metadata.
The Spark-side machinery here is real and tested: schema contracts,
Arrow-batched mapInPandas, partition-friendly shapes. The actual codec
work is stubbed (this container ships no image/audio libraries): decode
falls back to a DETERMINISTIC fake "decoder" so pipelines are testable;
``real_decode_image`` raises NotImplementedError until Pillow exists.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - not installed in this environment
    from PIL import Image  # type: ignore

    HAS_PIL = True
except Exception:  # pragma: no cover
    Image = None
    HAS_PIL = False

DECODE_SCHEMA = (
    "doc_id long, n_bytes int, width int, height int, channels int, mean_byte double"
)


def real_decode_image(data: bytes) -> tuple[int, int, int, float]:
    """Decode REAL image bytes via Pillow (r8, VERDICT r7 #3): same
    (width, height, channels, mean_byte) contract as the stub codec, so
    the two are drop-in interchangeable in every mapInPandas pipeline —
    ``mean_byte`` is the mean decoded sample value averaged over bands
    (ImageStat), the real analogue of the stub's payload-byte mean.
    Raises NotImplementedError when Pillow is absent (this dev container
    ships no image libraries; the Dockerfile installs Pillow so the
    deploy image takes the real path — tests/test_operators.py
    ``test_real_decode_*`` skip here and run there)."""
    if not HAS_PIL:
        raise NotImplementedError(
            "image decoding requires Pillow, which is not available in this "
            "environment; use fake_decode_image (deterministic stand-in)"
        )
    import io

    from PIL import ImageStat

    img = Image.open(io.BytesIO(data))
    stat = ImageStat.Stat(img)
    mean_byte = float(sum(stat.mean) / len(stat.mean))
    return img.width, img.height, len(img.getbands()), mean_byte


def fake_decode_image(data: bytes) -> tuple[int, int, int, float]:
    """Deterministic stand-in decoder: derives (width, height, channels,
    mean_byte) purely from the byte content so tests and oracles are
    stable. Replace with real_decode_image when codecs are available."""
    n = len(data)
    width = n % 64 + 1
    height = (n // 64) % 64 + 1
    mean_byte = (sum(data) / n) if n else 0.0
    return width, height, 3, mean_byte


def _check_no_null_payload(pdf, binary_col: str, id_col: str) -> None:
    """Fail the task NAMING the offending ids (checked_double_vec
    discipline) instead of an opaque TypeError from bytes(None) deep in
    a batch loop — and instead of silently diverging from the SQL
    oracles, which would emit a NULL-featured row."""
    nulls = pdf[pdf[binary_col].isna()]
    if len(nulls):
        ids = nulls[id_col].tolist()[:5]
        raise ValueError(
            f"multimodal: NULL {binary_col!r} payload for {id_col}={ids}"
            f"{' …' if len(nulls) > 5 else ''}; decode inputs must be non-null"
        )


def decode_image_features(
    df: DataFrame,
    binary_col: str = "content",
    id_col: str = "doc_id",
    real: bool = False,
) -> DataFrame:
    """Arrow-batched decode: DataFrame[id, binary] → typed metadata rows.

    mapInPandas keeps the batch shape (no per-row Python calls through
    py4j); at scale this is the pattern for any CPU-bound media
    transform — repartition upstream to balance byte volume, not rows.

    ``real=True`` decodes with Pillow (real_decode_image) — failing at
    PLAN BUILD time when Pillow is absent, not as an opaque task error
    on an executor; the default stub codec keeps pipelines testable in
    codec-less environments with identical schema and batch shape."""
    if real and not HAS_PIL:
        raise NotImplementedError(
            "decode_image_features(real=True) requires Pillow on driver "
            "and executors (the deploy Dockerfile installs it)"
        )
    codec = real_decode_image if real else fake_decode_image

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            _check_no_null_payload(pdf, binary_col, id_col)
            datas = pdf[binary_col]
            rows = {
                "doc_id": pdf[id_col].astype("int64"),
                "n_bytes": datas.map(len).astype("int32"),
            }
            decoded = [codec(bytes(d)) for d in datas]
            rows["width"] = pd.Series([d[0] for d in decoded], dtype="int32")
            rows["height"] = pd.Series([d[1] for d in decoded], dtype="int32")
            rows["channels"] = pd.Series([d[2] for d in decoded], dtype="int32")
            rows["mean_byte"] = pd.Series([d[3] for d in decoded], dtype="float64")
            yield pd.DataFrame(rows)

    return df.select(F.col(id_col), F.col(binary_col)).mapInPandas(decode, DECODE_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id long, width int, height int, new_width int, new_height int, resized binary"
)


def fake_resize_image(
    data: bytes, max_w: int = 32, max_h: int = 32
) -> tuple[int, int, int, int, bytes]:
    """Deterministic stand-in resize: fit the fake-decoded (w, h) into a
    ``max_w × max_h`` box preserving aspect ratio with INTEGER-only math
    (so a SQL oracle reproduces the dims exactly), and "resample" by
    truncating the payload to the new pixel budget. A real implementation
    replaces the body with ``Image.resize`` — the mapInPandas plumbing,
    schema, and batch shape stay identical."""
    w, h, c, _ = fake_decode_image(data)
    if w <= max_w and h <= max_h:
        nw, nh = w, h
    elif w >= h:
        nw, nh = max_w, max(1, (h * max_w) // w)
    else:
        nw, nh = max(1, (w * max_h) // h), max_h
    return w, h, nw, nh, data[: nw * nh * c]


def resize_images(
    df: DataFrame,
    max_w: int = 32,
    max_h: int = 32,
    binary_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """Arrow-batched image resize: DataFrame[id, binary] → original dims,
    fitted dims, and the resized payload. Same mapInPandas shape as
    ``decode_image_features`` — the codec is the stub, the Spark-side
    contract is real."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            _check_no_null_payload(pdf, binary_col, id_col)
            out = [fake_resize_image(bytes(d), max_w, max_h) for d in pdf[binary_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": pd.Series([o[0] for o in out], dtype="int32"),
                    "height": pd.Series([o[1] for o in out], dtype="int32"),
                    "new_width": pd.Series([o[2] for o in out], dtype="int32"),
                    "new_height": pd.Series([o[3] for o in out], dtype="int32"),
                    "resized": pd.Series([o[4] for o in out], dtype="object"),
                }
            )

    return df.select(F.col(id_col), F.col(binary_col)).mapInPandas(resize, RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_bytes int, frame_md5 string"


def sample_frames(
    df: DataFrame,
    frame_size: int = 256,
    every_k: int = 4,
    binary_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """Frame-sampling plumbing for video-like binary columns: split the
    byte stream into fixed-size frames, keep every k-th, emit per-frame
    size + content hash. Real decoders slot into the same mapInPandas
    shape (one output row per sampled frame, Arrow-batched); at scale,
    repartition upstream by byte volume so frames per task stay even."""
    import hashlib

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            _check_no_null_payload(pdf, binary_col, id_col)
            ids, idxs, sizes, hashes = [], [], [], []
            for did, data in zip(pdf[id_col], pdf[binary_col]):
                b = bytes(data)
                n_frames = (len(b) + frame_size - 1) // frame_size
                for idx in range(0, n_frames, every_k):
                    chunk = b[idx * frame_size : (idx + 1) * frame_size]
                    ids.append(did)
                    idxs.append(idx)
                    sizes.append(len(chunk))
                    hashes.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_bytes": pd.Series(sizes, dtype="int32"),
                    "frame_md5": pd.Series(hashes, dtype="object"),
                }
            )

    return df.select(F.col(id_col), F.col(binary_col)).mapInPandas(sample, FRAME_SCHEMA)


def sample_frames_jvm(
    df: DataFrame,
    frame_size: int = 256,
    every_k: int = 4,
    binary_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """Frame sampling entirely in JVM expressions — byte-identical to
    ``sample_frames`` (verified by test) but with zero Python/Arrow
    round-trips: sequence+explode for the sampled indices, substring on
    the binary column for the slice, built-in md5 for the hash.

    This is the "UDFs are the slow path" principle applied: the
    mapInPandas variant exists as the REAL-decoder plumbing shape (a
    codec needs Python); pure slicing+hashing does not, and the
    built-in form is ~3x faster and codegen-fused. Measured sf0.1:
    2.7s → <1s."""
    n_frames = F.ceil(F.octet_length(binary_col) / F.lit(frame_size)).cast("int")
    idxs = F.sequence(
        F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_k)
    )
    # Slice each sampled chunk BEFORE the explode (generator hygiene,
    # SCALING.md): exploding the index list and substring-ing afterwards
    # would carry the FULL binary payload through every generated row —
    # a 100 MB video sampled into 10^5 frames would copy 10 TB. The
    # chunk array is bounded by payload_size / every_k in one row.
    chunks = F.transform(
        idxs,
        lambda i: F.struct(
            i.cast("int").alias("frame_idx"),
            F.substring(F.col(binary_col), i * frame_size + 1, frame_size).alias(
                "chunk"
            ),
        ),
    )
    # NULL payloads fail the task with the Python sampler's named error
    # (r7 review): octet_length(NULL) > 0 is NULL, so the filter used to
    # silently DROP exactly the input class _check_no_null_payload makes
    # loud — the "byte-identical twin" claim diverged on NULLs
    payload_len = F.when(
        F.col(binary_col).isNull(),
        F.raise_error(
            F.concat(
                F.lit(f"multimodal: NULL {binary_col!r} payload for {id_col}="),
                F.col(id_col).cast("string"),
                F.lit("; decode inputs must be non-null"),
            )
        ).cast("int"),
    ).otherwise(F.octet_length(binary_col))
    framed = df.where(payload_len > 0).select(
        F.col(id_col), F.explode(chunks).alias("f")
    )  # empty payloads yield no frames, matching the Python sampler
    return framed.select(
        id_col,
        F.col("f.frame_idx").alias("frame_idx"),
        F.octet_length("f.chunk").cast("int").alias("frame_bytes"),
        F.md5("f.chunk").alias("frame_md5"),
    )
