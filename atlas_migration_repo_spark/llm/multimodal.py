"""Multimodal-column operators (north star): opaque binary payloads with
typed metadata, cross-modality joins, and Pandas-UDF feature extraction.

Design for 100 TB of mixed media: the media itself is an opaque ``binary``
column plus a typed metadata struct; decode / feature-extraction runs as
``mapInPandas`` over Arrow batches, so each executor streams batches of
(id, bytes) through Python exactly once, and everything relational stays
JVM-side. Two REAL decoders prove the path end-to-end with zero external
libs — P6 PPM image decode (header + raster parse, decode_ppm) and PCM16
WAV audio decode (RIFF container via stdlib wave, decode_wav) — while
formats that genuinely need codec libraries (JPEG/MP3/video) stay as
honest STUBS around the same batching/schema plumbing.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from atlas_migration_repo_spark.catalog import load, r4
from atlas_migration_repo_spark.oracle import sql_r4
from atlas_migration_repo_spark.registry import query
from atlas_migration_repo_spark.llm.similarity import dot, sql_dot


@query(
    "multimodal_join",
    oracle=f"""
    SELECT e.label, d.lang,
           COUNT(*) AS n,
           {sql_r4('AVG(d.n_chars)')} AS avg_chars,
           {sql_r4(f"AVG(SQRT({sql_dot('e.embedding', 'e.embedding')}))")} AS avg_l2
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    GROUP BY e.label, d.lang
    """,
)
def multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text ↔ vector modality join (doc_id = vec_id), aggregated per
    label×lang — the 'line up modalities by key' primitive."""
    d = load(spark, sf_dir, "documents")
    e = load(spark, sf_dir, "embeddings")
    l2 = F.sqrt(dot("embedding", "embedding"))
    return (
        d.join(e, d.doc_id == e.vec_id)
        .groupBy("label", "lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            r4(F.avg("n_chars")).alias("avg_chars"),
            r4(F.avg(l2)).alias("avg_l2"),
        )
    )


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.IntegerType()),
        T.StructField("head_byte", T.IntegerType()),
        T.StructField("tail_byte", T.IntegerType()),
        T.StructField("token_budget", T.LongType()),
    ]
)


def with_binary_payload(df: DataFrame) -> DataFrame:
    """Attach the multimodal envelope: opaque bytes + typed metadata.
    (Here the payload is the UTF-8 text itself; for images/audio it would
    be the raw media bytes read from object storage.)"""
    return df.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.col("lang").alias("lang"),
            F.col("n_chars").cast("long").alias("content_length"),
        ).alias("meta"),
    )


def extract_features(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: per Arrow batch, pure-numpy byte features.
    Stands in for a real decoder; the batch shape/schema contract is what
    a CV/audio extractor would use."""
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "byte_len": payloads.map(len).astype("int32"),
                "head_byte": payloads.map(lambda b: b[0] if len(b) else -1).astype("int32"),
                "tail_byte": payloads.map(lambda b: b[-1] if len(b) else -1).astype("int32"),
                "token_budget": payloads.map(lambda b: (len(b) + 3) // 4).astype("int64"),
            }
        )


@query(
    "multimodal_features",
    oracle="""
    SELECT doc_id,
           CAST(OCTET_LENGTH(ENCODE(text)) AS INT) AS byte_len,
           CAST(ASCII(SUBSTRING(text, 1, 1)) AS INT) AS head_byte,
           CAST(ASCII(SUBSTRING(text, LENGTH(text), 1)) AS INT) AS tail_byte,
           CAST(CEIL(OCTET_LENGTH(ENCODE(text)) / 4.0) AS BIGINT) AS token_budget
    FROM documents
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload feature extraction through the real multimodal
    plumbing: encode → (payload, meta) envelope → mapInPandas batch
    extractor. Oracle recomputes the same features from the text (payload
    is ASCII here, so byte features == char features)."""
    d = load(spark, sf_dir, "documents")
    return with_binary_payload(d).mapInPandas(extract_features, schema=_FEATURE_SCHEMA)


# ---- decode stubs (media libs absent in this container) ---------------------


def decode_image(payload: bytes, mime: str) -> dict:
    """STUB: real impl would decode to HxWxC uint8 (PIL/cv2) and emit
    shape/channel stats. Deliberately NotImplemented — no fake pixels."""
    raise NotImplementedError(
        "image decode requires a codec library not present in this environment; "
        "wire a real decoder into extract_media_features(decoder=...)"
    )


def decode_audio(payload: bytes, mime: str) -> dict:
    """STUB: real impl would decode PCM frames and emit duration/rate."""
    raise NotImplementedError(
        "audio decode requires a codec library not present in this environment; "
        "wire a real decoder into extract_media_features(decoder=...)"
    )


_MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("feature", T.DoubleType()),
    ]
)


def extract_media_features(
    df: DataFrame, decoder: Callable[[bytes, str], dict] | None = None
) -> DataFrame:
    """Generic media feature pipeline: (payload, meta) → mapInPandas with a
    pluggable per-item decoder. ``decoder=None`` uses a deterministic fake
    (byte-sum mod 997) so the distributed plumbing is testable without
    codecs; production passes decode_image/decode_audio equivalents."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                if decoder is None:
                    feats.append(float(sum(payload) % 997))
                else:
                    feats.append(float(decoder(payload, meta["mime"])["feature"]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "feature": feats,
                }
            )

    return df.mapInPandas(run, schema=_MEDIA_SCHEMA)


FRAME_BYTES = 16
FRAME_STRIDE = 4  # keep every 4th frame


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_head", T.IntegerType()),
    ]
)


@query(
    "multimodal_framesample",
    oracle=f"""
    WITH t AS (SELECT doc_id, text, OCTET_LENGTH(ENCODE(text)) AS n FROM documents)
    SELECT doc_id, CAST(i AS INT) AS frame_idx,
           CAST(ASCII(SUBSTRING(text, i * {FRAME_BYTES} + 1, 1)) AS INT) AS frame_head
    FROM t, UNNEST(GENERATE_SERIES(0, CAST(CEIL(n / {FRAME_BYTES}.0) AS INT) - 1,
                                   {FRAME_STRIDE})) AS u(i)
    """,
)
def multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over opaque media payloads: treat the binary as
    fixed-FRAME_BYTES frames and keep every FRAME_STRIDE-th one — the
    video keyframe-subsampling shape. The sampler is mapInPandas over
    Arrow batches emitting (doc_id, frame_idx, frame head byte): one
    Python pass per payload, fan-out bounded by len/stride, all
    downstream processing back on JVM columns. A real video pipeline
    swaps the byte-slice for a codec keyframe read at identical batch
    shape. Payloads are ASCII text here, so the oracle recomputes frames
    with SUBSTRING arithmetic."""
    d = with_binary_payload(load(spark, sf_dir, "documents"))

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, heads = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = -(-len(payload) // FRAME_BYTES)
                for i in range(0, n_frames, FRAME_STRIDE):
                    ids.append(doc_id)
                    idxs.append(i)
                    heads.append(payload[i * FRAME_BYTES])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_head": pd.Series(heads, dtype="int32"),
                }
            )

    return d.mapInPandas(sample, schema=_FRAME_SCHEMA)


def resize_image(payload: bytes, mime: str, width: int, height: int) -> bytes:
    """STUB: real impl would decode, resample to (width, height), and
    re-encode (PIL/cv2 absent here). Deliberately NotImplemented — no
    fake pixels; the distributed shape is extract_media_features with a
    decoder that returns resized bytes."""
    raise NotImplementedError(
        "image resize requires a codec library not present in this environment; "
        "wire a real resizer into extract_media_features(decoder=...)"
    )


AUDIO_WIN = 32  # bytes per analysis window ("samples")
AUDIO_HOP = 16  # hop size — 50% overlap, the standard STFT framing

_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("win_idx", T.IntegerType()),
        T.StructField("start_byte", T.IntegerType()),
        T.StructField("energy", T.LongType()),
    ]
)


@query(
    "multimodal_audio_window",
    oracle=f"""
    WITH t AS (SELECT doc_id, text, OCTET_LENGTH(ENCODE(text)) AS n FROM documents),
    w AS (
      SELECT doc_id, text, CAST(i AS INT) AS win_idx,
             CAST(i * {AUDIO_HOP} AS INT) AS start_byte
      FROM t, UNNEST(GENERATE_SERIES(
             0, CAST(FLOOR((n - {AUDIO_WIN}) / {AUDIO_HOP}.0) AS INT), 1)) u(i)
      WHERE n >= {AUDIO_WIN}
    )
    SELECT doc_id, win_idx, start_byte,
           CAST(SUM(ASCII(SUBSTRING(text, start_byte + j + 1, 1))) AS BIGINT)
             AS energy
    FROM w, UNNEST(GENERATE_SERIES(0, {AUDIO_WIN - 1}, 1)) v(j)
    GROUP BY doc_id, win_idx, start_byte
    """,
)
def multimodal_audio_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-window framing over opaque audio payloads: AUDIO_WIN
    'samples' per window, AUDIO_HOP hop (50% overlap) — the STFT /
    feature-frame shape every audio pipeline starts with. Unlike
    multimodal_framesample's disjoint strided frames, windows OVERLAP, so
    the worker computes all window sums in one vectorized numpy pass
    (prefix-sum difference) per payload instead of re-reading bytes —
    O(n + windows), the pattern that matters when a window is 25 ms of
    48 kHz float32 rather than 32 bytes. Only complete windows are
    emitted (trailing partial dropped, docs shorter than one window emit
    nothing). A real pipeline swaps byte-energy for mel/FFT per window at
    identical batch shape; payloads are ASCII here so DuckDB recomputes
    the sums with SUBSTRING arithmetic."""
    import numpy as np

    d = with_binary_payload(load(spark, sf_dir, "documents"))

    def frame(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, starts, energies = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                if n < AUDIO_WIN:
                    continue
                cs = np.concatenate(
                    ([0], np.cumsum(np.frombuffer(payload, dtype=np.uint8), dtype=np.int64))
                )
                n_win = (n - AUDIO_WIN) // AUDIO_HOP + 1
                s = np.arange(n_win, dtype=np.int64) * AUDIO_HOP
                ids.extend([doc_id] * n_win)
                idxs.extend(range(n_win))
                starts.extend(s.tolist())
                energies.extend((cs[s + AUDIO_WIN] - cs[s]).tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "win_idx": pd.Series(idxs, dtype="int32"),
                    "start_byte": pd.Series(starts, dtype="int32"),
                    "energy": pd.Series(energies, dtype="int64"),
                }
            )

    return d.mapInPandas(frame, schema=_AUDIO_SCHEMA)


@query(
    "multimodal_dedup_payload",
    oracle="""
    SELECT SHA256(text) AS digest,
           MIN(doc_id) AS keeper_doc_id,
           CAST(COUNT(*) AS INT) AS n_copies
    FROM documents
    GROUP BY SHA256(text)
    """,
)
def multimodal_dedup_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-exact dedup over the opaque binary payload column: SHA-256 of
    the raw bytes (not the decoded text) keys the groups, min doc_id is
    the keeper — the modality-agnostic first pass of any media pipeline,
    since identical files dedup without decoding. Hashing happens
    map-side; the shuffle carries only (digest, doc_id). The oracle
    hashes the same bytes (documents.text is the payload, UTF-8)."""
    d = load(spark, sf_dir, "documents")
    env = with_binary_payload(d)
    return (
        env.select("doc_id", F.sha2(F.col("payload"), 256).alias("digest"))
        .groupBy("digest")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).cast("int").alias("n_copies"),
        )
    )


PPM_W, PPM_H = 4, 8  # synthetic image dims: 4x8 RGB, one md5 digest per row


def synth_ppm(doc_id: int) -> bytes:
    """Deterministic P6 PPM payload for a doc: row r's 12 pixel bytes are
    the first 12 bytes of md5("<doc_id>:<r>") — content-addressed, no RNG,
    and recomputable by the SQL oracle byte-for-byte."""
    import hashlib

    header = f"P6\n{PPM_W} {PPM_H}\n255\n".encode()
    rows = b"".join(
        hashlib.md5(f"{doc_id}:{r}".encode()).digest()[: PPM_W * 3]
        for r in range(PPM_H)
    )
    return header + rows


def decode_ppm(payload: bytes) -> dict:
    """REAL image decode, pure stdlib+numpy — no codec library: parse the
    P6 header (magic, dims, maxval), reshape the raster to HxWx3 uint8,
    return dims + per-channel means. This is the working proof of the
    decoder injection point that decode_image/decode_audio stub out for
    formats that genuinely need external codecs."""
    import numpy as np

    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header = 4 whitespace-separated tokens: magic, width, height, maxval
    tokens, i = [], 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval, then the raster
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    px = np.frombuffer(payload[i : i + w * h * 3], dtype=np.uint8).reshape(h, w, 3)
    return {
        "width": w,
        "height": h,
        "pixels": px,
        "mean_r": float(px[:, :, 0].mean()),
        "mean_g": float(px[:, :, 1].mean()),
        "mean_b": float(px[:, :, 2].mean()),
    }


_PPM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
    ]
)


@query(
    "multimodal_decode_ppm",
    oracle=f"""
    WITH px AS (
      SELECT doc_id, j,
             CAST('0x' || SUBSTRING(MD5(doc_id || ':' || r), 2 * j + 1, 2) AS INT) AS b
      FROM documents,
           UNNEST(GENERATE_SERIES(0, {PPM_H - 1})) t(r),
           UNNEST(GENERATE_SERIES(0, {PPM_W * 3 - 1})) u(j)
    )
    SELECT doc_id,
           CAST({PPM_W} AS INT) AS width,
           CAST({PPM_H} AS INT) AS height,
           {sql_r4('AVG(CASE WHEN j % 3 = 0 THEN b END)')} AS mean_r,
           {sql_r4('AVG(CASE WHEN j % 3 = 1 THEN b END)')} AS mean_g,
           {sql_r4('AVG(CASE WHEN j % 3 = 2 THEN b END)')} AS mean_b
    FROM px GROUP BY doc_id
    """,
)
def multimodal_decode_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end REAL image decode through the multimodal plumbing: a
    deterministic P6 PPM payload per document (md5-derived pixels) rides
    the (payload, meta) envelope into mapInPandas, where decode_ppm —
    actual header parsing + raster reshape, stdlib+numpy only — emits
    dimensions and per-channel means. Proves the decoder injection point
    with a real codec path; formats needing external libraries stay
    honestly stubbed (decode_image/decode_audio). Channel means are exact
    integer sums / 32 in both engines, so the oracle (which recomputes the
    same md5 pixel bytes with hex arithmetic) matches on r4."""
    d = load(spark, sf_dir, "documents").select("doc_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in _PPM_SCHEMA.fields}
            for doc_id in pdf["doc_id"]:
                feats = decode_ppm(synth_ppm(int(doc_id)))
                out["doc_id"].append(int(doc_id))
                out["width"].append(feats["width"])
                out["height"].append(feats["height"])
                # raw means here; the HALF_UP rounding happens JVM-side in
                # r4 below (Python's round() banks to even and these means
                # are exact /32 ties, so it would split from DuckDB)
                out["mean_r"].append(feats["mean_r"])
                out["mean_g"].append(feats["mean_g"])
                out["mean_b"].append(feats["mean_b"])
            yield pd.DataFrame(out)

    return d.mapInPandas(run, schema=_PPM_SCHEMA).select(
        "doc_id",
        "width",
        "height",
        r4(F.col("mean_r")).alias("mean_r"),
        r4(F.col("mean_g")).alias("mean_g"),
        r4(F.col("mean_b")).alias("mean_b"),
    )


WAV_RATE = 8000
WAV_SAMPLES = 16  # two md5 digests' bytes = 16 little-endian int16 frames


def synth_wav(doc_id: int) -> bytes:
    """Deterministic PCM16 mono WAV payload: the frames are the bytes of
    md5("<doc_id>:0") ++ md5("<doc_id>:1") — content-addressed like
    synth_ppm, recomputable by the SQL oracle."""
    import hashlib
    import io
    import wave

    raw = (
        hashlib.md5(f"{doc_id}:0".encode()).digest()
        + hashlib.md5(f"{doc_id}:1".encode()).digest()
    )
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(WAV_RATE)
        w.writeframes(raw)
    return buf.getvalue()


def decode_wav(payload: bytes) -> dict:
    """REAL audio decode, pure stdlib+numpy: RIFF/WAVE container parse via
    the wave module, PCM16 frames to int64 samples, exact
    sum-of-squares energy. The working audio twin of decode_ppm."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload)) as w:
        rate, n = w.getframerate(), w.getnframes()
        data = np.frombuffer(w.readframes(n), dtype="<i2").astype(np.int64)
    return {
        "rate": rate,
        "n_samples": n,
        "duration_ms": n * 1000.0 / rate,
        "energy": int((data * data).sum()),
    }


_WAV_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("duration_ms", T.DoubleType()),
        T.StructField("energy", T.LongType()),
    ]
)


@query(
    "multimodal_decode_wav",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
             CAST('0x' || SUBSTRING(MD5(doc_id || ':' || (k // 8)),
                                    4 * (k % 8) + 1, 2) AS BIGINT)
             + 256 * CAST('0x' || SUBSTRING(MD5(doc_id || ':' || (k // 8)),
                                            4 * (k % 8) + 3, 2) AS BIGINT) AS v
      FROM documents, UNNEST(GENERATE_SERIES(0, {WAV_SAMPLES - 1})) t(k)
    ),
    sig AS (
      SELECT doc_id, CASE WHEN v >= 32768 THEN v - 65536 ELSE v END AS x FROM s
    )
    SELECT doc_id,
           CAST({WAV_RATE} AS INT) AS rate,
           CAST({WAV_SAMPLES} AS INT) AS n_samples,
           {sql_r4(f'{WAV_SAMPLES} * 1000.0 / {WAV_RATE}')} AS duration_ms,
           CAST(SUM(x * x) AS BIGINT) AS energy
    FROM sig GROUP BY doc_id
    """,
)
def multimodal_decode_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end REAL audio decode through the multimodal plumbing:
    deterministic PCM16 WAV payloads (md5-derived samples) are parsed by
    the stdlib wave module inside mapInPandas — actual RIFF container
    decode, not a stub — emitting rate, frame count, duration, and exact
    integer sum-of-squares energy. The oracle reconstructs the identical
    little-endian int16 samples with hex arithmetic, so every output
    column is exact (energy is a bigint; duration is one shared literal
    division)."""
    d = load(spark, sf_dir, "documents").select("doc_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in _WAV_SCHEMA.fields}
            for doc_id in pdf["doc_id"]:
                feats = decode_wav(synth_wav(int(doc_id)))
                out["doc_id"].append(int(doc_id))
                out["rate"].append(feats["rate"])
                out["n_samples"].append(feats["n_samples"])
                out["duration_ms"].append(feats["duration_ms"])
                out["energy"].append(feats["energy"])
            yield pd.DataFrame(out)

    return d.mapInPandas(run, schema=_WAV_SCHEMA).select(
        "doc_id",
        "rate",
        "n_samples",
        r4(F.col("duration_ms")).alias("duration_ms"),
        "energy",
    )


RESIZE_W, RESIZE_H = 2, 4  # nearest-neighbor target dims (half scale)


def resize_ppm(payload: bytes, out_w: int, out_h: int) -> bytes:
    """REAL nearest-neighbor image resize, stdlib+numpy only: decode the
    P6 raster, select source pixel (floor(y*H/out_h), floor(x*W/out_w))
    for every target pixel, re-encode as P6. This replaces the gated
    resize_image stub for the format the repo can genuinely decode;
    codec formats (JPEG) still require an external library."""
    import numpy as np

    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    tokens, i = [], 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(int(payload[i:j]))
        i = j
    i += 1
    w, h, maxval = tokens
    px = np.frombuffer(payload[i : i + w * h * 3], dtype=np.uint8).reshape(h, w, 3)
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    out = px[ys][:, xs]
    header = f"P6\n{out_w} {out_h}\n{maxval}\n".encode()
    return header + out.tobytes()


@query(
    "multimodal_resize_ppm",
    oracle=f"""
    WITH px AS (
      SELECT doc_id, j,
             CAST('0x' || SUBSTRING(MD5(doc_id || ':' || r), 2 * j + 1, 2) AS INT) AS b
      FROM documents,
           UNNEST(GENERATE_SERIES(0, {PPM_H - 1})) t(r),
           UNNEST(GENERATE_SERIES(0, {PPM_W * 3 - 1})) u(j)
      WHERE r % {PPM_H // RESIZE_H} = 0
        AND (j // 3) % {PPM_W // RESIZE_W} = 0
    )
    SELECT doc_id,
           CAST({RESIZE_W} AS INT) AS width,
           CAST({RESIZE_H} AS INT) AS height,
           {{r}} AS mean_r, {{g}} AS mean_g, {{b}} AS mean_b
    FROM px GROUP BY doc_id
    """.format(
        r=sql_r4("AVG(CASE WHEN j % 3 = 0 THEN b END)"),
        g=sql_r4("AVG(CASE WHEN j % 3 = 1 THEN b END)"),
        b=sql_r4("AVG(CASE WHEN j % 3 = 2 THEN b END)"),
    ),
)
def multimodal_resize_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize through the multimodal plumbing: synth P6 payload
    → nearest-neighbor resample to {RESIZE_W}x{RESIZE_H} (resize_ppm:
    decode, integer-index select, re-encode) → decode the RESIZED bytes →
    per-channel means. The oracle recomputes the identical selected-pixel
    set from the md5 byte construction with hex arithmetic, so the whole
    decode→resize→re-encode→decode chain is hash-verified — the working
    proof for the resize injection point that the JPEG stub gates.

    Scale shape: one mapInPandas stage over (doc_id), Arrow-batched; at
    100 TB payloads ride a binary column and the same stage shards by
    row-group — no shuffle until the final means (none here: per-doc)."""
    d = load(spark, sf_dir, "documents").select("doc_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in _PPM_SCHEMA.fields}
            for doc_id in pdf["doc_id"]:
                resized = resize_ppm(synth_ppm(int(doc_id)), RESIZE_W, RESIZE_H)
                feats = decode_ppm(resized)
                out["doc_id"].append(int(doc_id))
                out["width"].append(feats["width"])
                out["height"].append(feats["height"])
                out["mean_r"].append(feats["mean_r"])
                out["mean_g"].append(feats["mean_g"])
                out["mean_b"].append(feats["mean_b"])
            yield pd.DataFrame(out)

    return d.mapInPandas(run, schema=_PPM_SCHEMA).select(
        "doc_id",
        "width",
        "height",
        r4(F.col("mean_r")).alias("mean_r"),
        r4(F.col("mean_g")).alias("mean_g"),
        r4(F.col("mean_b")).alias("mean_b"),
    )


def phash_bits(payload: bytes) -> int:
    """Perceptual hash of a P6 PPM payload — the published pHash recipe
    sized to the fixture raster: BT.601 luma, orthonormal 2D DCT-II, drop
    the DC term, threshold every remaining coefficient at their MEDIAN,
    pack row-major into an int. Pure numpy float64, deterministic; scaling
    the luma by any k > 0 scales coefficients AND median by k, so the hash
    is exactly brightness-scale-invariant (unit-asserted)."""
    import numpy as np

    feats = decode_ppm(payload)
    h, w = feats["height"], feats["width"]
    px = feats["pixels"].astype(np.float64)  # (h, w, 3)
    luma = 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]

    def dct_mat(n: int) -> "np.ndarray":
        k = np.arange(n)[:, None]
        i = np.arange(n)[None, :]
        m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
        m[0] /= np.sqrt(2.0)
        return m

    coef = dct_mat(h) @ luma @ dct_mat(w).T
    flat = coef.ravel()[1:]  # drop DC
    med = float(np.median(flat))
    bits = 0
    for b in (flat > med).astype(np.int64):
        bits = (bits << 1) | int(b)
    return int(bits)


_PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("phash", T.LongType()),
        T.StructField("n_set_bits", T.IntegerType()),
    ]
)


@query("multimodal_phash", tags=("approx",))
def multimodal_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup fingerprints through the multimodal plumbing: each
    document's deterministic P6 payload (synth_ppm — the same
    content-addressed raster multimodal_decode_ppm proves the codec on)
    is decoded and pHashed inside mapInPandas. Downstream dedup is a
    hash-groupBy (exact perceptual dups) or a simhash-style banded join
    on hash chunks (hamming neighbors) — both already exist for 64-bit
    fingerprints (dedup_simhash), so this key owns only the decode→hash
    kernel. Rows-only gate (no SQL twin can run the DCT); determinism,
    brightness-scale invariance, and bit-flip sensitivity are
    unit-asserted on the pure phash_bits function."""
    d = load(spark, sf_dir, "documents").select("doc_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "phash": [], "n_set_bits": []}
            for doc_id in pdf["doc_id"]:
                hbits = phash_bits(synth_ppm(int(doc_id)))
                out["doc_id"].append(int(doc_id))
                out["phash"].append(hbits)
                out["n_set_bits"].append(bin(hbits).count("1"))
            yield pd.DataFrame(out)

    return d.mapInPandas(run, schema=_PHASH_SCHEMA)
