"""Multimodal column handling (§2.12 L11 + task-mandated decode plumbing).

Images/audio/video are opaque BINARY columns with typed metadata. The
decode/feature-extract step runs as Arrow-batched ``mapInPandas`` — the
correct Spark shape for per-blob Python work (batch in, batch out, no
per-row overhead). The actual codec is STUBBED with a deterministic fake
(no image libs in this container — see decode_stub); the schema, batching,
partitioning, and UDF signature are the real, tested plumbing: swapping in
PIL/librosa changes only the body of ``_decode_batch``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from wikidata2pg_spark.registry import query
from wikidata2pg_spark.tables import load


@query(
    "q_multimodal_binary",
    oracle="""
SELECT doc_id,
       md5(text) AS content_md5,
       octet_length(encode(text)) AS n_bytes,
       upper(hex(encode(text))[1:16]) AS head_hex
FROM documents
""",
)
def q_multimodal_binary(spark, sf_dir):
    """L11: binary payload handling — bytes from the text column stand in
    for an image blob; digest + length + head bytes as typed metadata."""
    d = load(spark, sf_dir, "documents")
    bin_col = F.encode(F.col("text"), "UTF-8")
    return d.select(
        "doc_id",
        F.md5(bin_col).alias("content_md5"),
        F.length(bin_col).cast("long").alias("n_bytes"),
        F.upper(F.substring(F.hex(bin_col), 1, 16)).alias("head_hex"),
    )


def _decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """STUB codec: a real implementation would do
    ``PIL.Image.open(io.BytesIO(blob))`` here. The deterministic fake reads
    "dimensions" from the first bytes so results are verifiable end-to-end."""
    blobs = pdf["payload"]
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "width": blobs.map(lambda b: int(b[0]) if len(b) > 0 else 0),
            "height": blobs.map(lambda b: int(b[1]) if len(b) > 1 else 0),
            "n_bytes": blobs.map(len),
        }
    )


def decode_images(df: DataFrame) -> DataFrame:
    """mapInPandas plumbing: (doc_id, payload BINARY) → typed image metadata.
    Arrow batches keep the Python boundary amortized; partitioning is
    inherited, so a repartition(N) upstream controls decode parallelism."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _decode_batch(pdf)

    return df.mapInPandas(gen, "doc_id BIGINT, width BIGINT, height BIGINT, n_bytes BIGINT")


@query(
    "q_multimodal_framesample",
    oracle="""
WITH frames AS (
  SELECT doc_id, f.i AS frame_idx,
         substring(hex(encode(text)), (f.i * 32)::INT + 1, 32) AS frame_hex
  FROM documents,
       LATERAL (SELECT unnest(range(octet_length(encode(text)) // 16))) f(i)
)
SELECT doc_id, frame_idx, frame_hex,
       CAST(length(frame_hex) // 2 AS BIGINT) AS frame_bytes
FROM frames
WHERE frame_idx % 4 = 0
""",
)
def q_multimodal_framesample(spark, sf_dir):
    """Frame sampling (r2 extra): the video path of the multimodal brief —
    a binary payload split into fixed-size "frames", keeping every Nth
    (sample-rate decimation before expensive per-frame work). The 1→N
    mapInPandas expansion IS the real plumbing (a real codec yields frames
    from a container; the deterministic fake slices 16-byte windows so the
    result hash-checks end-to-end). Sampling happens inside the kernel —
    skipped frames are never materialized as rows, which is the point at
    100 TB of video."""
    import pandas as pd

    FRAME, EVERY = 16, 4

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = len(blob) // FRAME
                for i in range(0, n_frames, EVERY):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame"].append(bytes(blob[i * FRAME : (i + 1) * FRAME]))
            yield pd.DataFrame(out)

    d = load(spark, sf_dir, "documents")
    payload = d.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    frames = payload.mapInPandas(gen, "doc_id BIGINT, frame_idx BIGINT, frame BINARY")
    # compare frames as hex (byte-exact on both sides): the kernel slices
    # UTF-8 BYTES, and this DuckDB build has no blob substring/md5, so a
    # char-based oracle would silently diverge on any non-ASCII fixture —
    # hex(frame) vs slicing DuckDB's hex(encode(text)) 32 chars per frame
    # compares the same bytes with no hash and no charset assumption.
    return frames.select(
        "doc_id",
        "frame_idx",
        F.hex("frame").alias("frame_hex"),
        F.length("frame").cast("long").alias("frame_bytes"),
    )


@query(
    "q_multimodal_decode",
    oracle="""
SELECT doc_id,
       CASE WHEN octet_length(encode(text)) >= 1
            THEN ('0x' || substring(hex(encode(text)), 1, 2))::INT
            ELSE 0 END AS width,
       CASE WHEN octet_length(encode(text)) >= 2
            THEN ('0x' || substring(hex(encode(text)), 3, 2))::INT
            ELSE 0 END AS height,
       octet_length(encode(text)) AS n_bytes
FROM documents
""",
)
def q_multimodal_decode(spark, sf_dir):
    """Decode pipeline end-to-end: binary payload → mapInPandas decode stub →
    typed metadata. Hash-checked because the stub is deterministic (first
    two BYTES as WxH) — the oracle replicates it byte-exactly via hex of
    the UTF-8 encoding (an ascii()-char oracle would diverge on any
    non-ASCII fixture text, same hazard framesample documents)."""
    d = load(spark, sf_dir, "documents")
    payload = d.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    out = decode_images(payload)
    return out.select(
        "doc_id",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        "n_bytes",
    )


@query(
    "q_multimodal_audio_energy",
    oracle="""
WITH p AS (
  SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS nb
  FROM documents WHERE doc_id < 200
), wins AS (
  SELECT doc_id, w.i AS win_idx,
         substring(h, (w.i * 16 + 1)::INT, 32) AS win_hex
  FROM p,
       LATERAL (SELECT unnest(range(CASE WHEN nb >= 16
                                         THEN (nb - 16) // 8 + 1 ELSE 0 END))) w(i)
)
SELECT doc_id, win_idx,
       CAST(list_aggregate(list_transform(range(16),
            i -> ('0x' || substring(win_hex, (i*2+1)::INT, 2))::BIGINT), 'sum')
         AS BIGINT) AS energy,
       CAST(list_aggregate(list_transform(range(16),
            i -> ('0x' || substring(win_hex, (i*2+1)::INT, 2))::BIGINT), 'max')
         AS BIGINT) AS peak
FROM wins
""",
)
def q_multimodal_audio_energy(spark, sf_dir):
    """Audio-shape windowing: OVERLAPPING 16-byte frames with hop 8 over a
    binary payload, per-window energy (byte sum) and peak — the
    frame/hop/energy plumbing of audio feature extraction (a real codec
    swaps the byte-sum kernel for RMS over PCM samples; window geometry,
    explode shape, and partitioning are identical). Differs from
    q_multimodal_framesample in BOTH dimensions that matter: windows
    overlap (hop < size) and a per-window REDUCTION is computed instead of
    a content fingerprint. Byte values go through hex-pair arithmetic so
    Spark and DuckDB compute from identical bytes with no charset or blob
    -function assumptions. Expansion + reduction all inside the scan
    task — no shuffle."""
    SIZE, HOP = 16, 8
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    p = d.select(
        "doc_id",
        F.hex(F.encode(F.col("text"), "UTF-8")).alias("h"),
        F.length(F.encode(F.col("text"), "UTF-8")).alias("nb"),
    )
    n_wins = F.when(
        F.col("nb") >= SIZE, ((F.col("nb") - SIZE) / HOP).cast("long") + 1
    ).otherwise(F.lit(0))
    # guard the sequence: Spark's sequence(start, stop) steps DOWN when
    # start > stop, so the n_wins=0 case (doc shorter than one window)
    # would yield [0, -1] and two garbage rows where the oracle emits none
    idx_seq = F.when(
        n_wins > 0, F.sequence(F.lit(0), n_wins.cast("int") - 1)
    ).otherwise(F.array().cast("array<int>"))
    wins = p.select(
        "doc_id",
        "h",
        F.explode(idx_seq).alias("win_idx"),
    ).select(
        "doc_id",
        F.col("win_idx").cast("long").alias("win_idx"),
        F.substring(F.col("h"), F.col("win_idx") * (HOP * 2) + 1, SIZE * 2).alias("win_hex"),
    )
    bytes_arr = F.transform(
        F.sequence(F.lit(0), F.lit(SIZE - 1)),
        lambda i: F.conv(F.substring("win_hex", F.lit(1) + i * 2, 2), 16, 10).cast("long"),
    )
    return wins.select(
        "doc_id",
        "win_idx",
        F.aggregate(bytes_arr, F.lit(0).cast("long"), lambda a, x: a + x).alias("energy"),
        F.array_max(bytes_arr).alias("peak"),
    )


# ViT-patch geometry shared by q_multimodal_image_tiles and
# q_pipeline_multimodal — ONE recipe (patch size, cap, grid width,
# hex-pair byte-sum) so the sibling keys cannot drift (review catch).
PATCH_BYTES = 16
PATCH_GRID_W = 4
PATCH_CAP_BYTES = 256


def _patch_byte_sum(hex_col):
    """Exact byte sum of one patch from its hex string (hex-pair
    arithmetic — no blob-function assumptions on either engine)."""
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(PATCH_BYTES - 1)),
        F.lit(0).cast("long"),
        lambda a, i: a
        + F.conv(hex_col.substr(i * 2 + 1, F.lit(2)), 16, 10).cast("long"),
    )


def _patch_bsum_sql(col: str) -> str:
    """The oracle twin of _patch_byte_sum."""
    return (
        f"CAST(list_aggregate(list_transform(range({PATCH_BYTES}), "
        f"i -> ('0x' || substring({col}, (i*2+1)::INT, 2))::BIGINT), "
        "'sum') AS BIGINT)"
    )


@query(
    "q_multimodal_image_tiles",
    oracle=f"""
WITH p AS (
  SELECT doc_id, hex(encode(text)) AS h,
         least(octet_length(encode(text)), {PATCH_CAP_BYTES})
           // {PATCH_BYTES} AS n_patches
  FROM documents WHERE doc_id < 200
), t AS (
  SELECT doc_id, n_patches, w.i AS patch_idx,
         substring(h, (w.i * {PATCH_BYTES * 2} + 1)::INT,
                   {PATCH_BYTES * 2}) AS patch_hex
  FROM p, LATERAL (SELECT unnest(range(n_patches))) w(i)
)
SELECT doc_id, CAST(n_patches AS BIGINT) AS n_patches,
       CAST(patch_idx AS INTEGER) AS patch_idx,
       CAST(patch_idx // {PATCH_GRID_W} AS INTEGER) AS tile_row,
       CAST(patch_idx % {PATCH_GRID_W} AS INTEGER) AS tile_col,
       patch_hex,
       {_patch_bsum_sql('patch_hex')} AS byte_sum
FROM t
""",
)
def q_multimodal_image_tiles(spark, sf_dir):
    """ViT-style patch tokenization: the binary payload is treated as a
    row-major image buffer and cut into NON-overlapping 16-byte
    patches on a 4-wide grid (capped at 256 bytes = a 4x4 patch grid),
    each patch emitting its grid coordinates, content hex, and exact
    byte sum — the schema/explode/partitioning plumbing of
    image-patch-embedding pipelines (a real vision stack swaps the hex
    fingerprint for a patch-embedding UDF; the patch geometry and the
    per-patch row contract are what this key pins). Completes the
    multimodal family's geometry matrix: framesample = strided 1-D
    selection, audio_energy = OVERLAPPING 1-D windows, tiles =
    non-overlapping 2-D grid. Byte values go through hex-pair
    arithmetic (no blob-function assumptions); the cap bounds the
    expansion to <=16 rows per doc regardless of payload size — at
    100 TB the explode stays inside the scan task with zero shuffle,
    and patch rows inherit the file's partitioning for a downstream
    embedding stage."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    p = d.select(
        "doc_id",
        F.hex(F.encode(F.col("text"), "UTF-8")).alias("h"),
        F.floor(
            F.least(
                F.length(F.encode(F.col("text"), "UTF-8")),
                F.lit(PATCH_CAP_BYTES),
            )
            / PATCH_BYTES
        )
        .cast("long")
        .alias("n_patches"),
    )
    idx_seq = F.when(
        F.col("n_patches") > 0,
        F.sequence(F.lit(0), F.col("n_patches").cast("int") - 1),
    ).otherwise(F.array().cast("array<int>"))
    t = p.select(
        "doc_id",
        "n_patches",
        "h",
        F.explode(idx_seq).alias("patch_idx"),
    ).select(
        "doc_id",
        "n_patches",
        "patch_idx",
        F.col("h")
        .substr(F.col("patch_idx") * (PATCH_BYTES * 2) + 1, F.lit(PATCH_BYTES * 2))
        .alias("patch_hex"),
    )
    return t.select(
        "doc_id",
        "n_patches",
        F.col("patch_idx").cast("int").alias("patch_idx"),
        F.floor(F.col("patch_idx") / PATCH_GRID_W)
        .cast("int")
        .alias("tile_row"),
        (F.col("patch_idx") % PATCH_GRID_W).cast("int").alias("tile_col"),
        "patch_hex",
        _patch_byte_sum(F.col("patch_hex")).alias("byte_sum"),
    )


@query(
    "q_pipeline_multimodal",
    oracle=f"""
WITH gated AS (
  SELECT doc_id, hex(encode(text)) AS h,
         octet_length(encode(text)) AS nb,
         least(octet_length(encode(text)), {PATCH_CAP_BYTES})
           // {PATCH_BYTES} AS np
  FROM documents
  WHERE doc_id < 200 AND octet_length(encode(text)) >= 48
), t AS (
  SELECT doc_id, np, nb, w.i AS pi,
         substring(h, (w.i * {PATCH_BYTES * 2} + 1)::INT,
                   {PATCH_BYTES * 2}) AS ph,
         doc_id * {PATCH_BYTES} + w.i AS owner_key
  FROM gated, LATERAL (SELECT unnest(range(np))) w(i)
), own AS (
  SELECT ph, CAST(min(owner_key) AS BIGINT) AS min_owner FROM t GROUP BY ph
), j AS (
  SELECT t.doc_id, t.np, t.nb, t.ph,
         CASE WHEN t.owner_key <> o.min_owner THEN 1 ELSE 0 END AS dup,
         {_patch_bsum_sql('t.ph')} AS bsum
  FROM t JOIN own o ON t.ph = o.ph
)
SELECT doc_id,
       CAST(any_value(np) AS BIGINT) AS n_patches,
       CAST(any_value(nb) AS BIGINT) AS n_bytes,
       CAST(sum(dup) AS BIGINT) AS n_dup_patches,
       CASE WHEN sum(dup) > 0 THEN 1 ELSE 0 END AS has_shared_content,
       CAST(sum(bsum) AS BIGINT) AS byte_mass,
       CAST(floor(CAST(sum(bsum) AS DOUBLE) / any_value(np) + 0.5)
            AS BIGINT) AS mean_patch_mass
FROM j GROUP BY doc_id
""",
)
def q_pipeline_multimodal(spark, sf_dir):
    """The composed multimodal-ingest audit as ONE Catalyst plan —
    payload gate (>= 48 bytes: enough for 3 patches) -> ViT patch
    extraction (the q_multimodal_image_tiles geometry) -> corpus-wide
    patch-content dedup (canonical owner = min (doc_id, patch) per
    content hex; 'dup' marks the NON-CANONICAL occurrences only — the
    first owner of a shared region keeps its patches and reports 0, so
    has_shared_content flags re-occurrences, the rows a boilerplate
    drop would remove, not every participant in a shared region) ->
    per-doc rollup (patch counts, duplicate counts, exact byte mass,
    one floored mean division). The
    multimodal sibling of q_pipeline_pretraining: stage SHAPES are the
    production ones (scan-local explode, one content-keyed combine for
    ownership, a content-hash join back, one doc rollup) and the whole
    thing stays a single lazy plan — no intermediate materialization.
    At 100 TB: the explode is split-local, the ownership combine and
    hash join shuffle ~16 rows/doc on the 32-char content key (skew-
    free by construction: dup groups are capped by real content
    repetition), and the rollup re-keys on doc_id."""
    MIN_BYTES = 48
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    payload = F.encode(F.col("text"), "UTF-8")
    gated = d.select(
        "doc_id",
        F.hex(payload).alias("h"),
        F.length(payload).alias("nb"),
        F.floor(
            F.least(F.length(payload), F.lit(PATCH_CAP_BYTES)) / PATCH_BYTES
        )
        .cast("long")
        .alias("np"),
    ).filter(F.col("nb") >= MIN_BYTES)
    t = gated.select(
        "doc_id",
        "np",
        "nb",
        F.explode(
            F.sequence(F.lit(0), F.col("np").cast("int") - 1)
        ).alias("pi"),
        "h",
    ).select(
        "doc_id",
        "np",
        "nb",
        F.col("h")
        .substr(F.col("pi") * (PATCH_BYTES * 2) + 1, F.lit(PATCH_BYTES * 2))
        .alias("ph"),
        (F.col("doc_id") * PATCH_BYTES + F.col("pi")).alias("owner_key"),
    )
    own = t.groupBy("ph").agg(
        F.min("owner_key").cast("long").alias("min_owner")
    )
    j = t.join(own, "ph").select(
        "doc_id",
        "np",
        "nb",
        F.when(F.col("owner_key") != F.col("min_owner"), 1)
        .otherwise(0)
        .alias("dup"),
        _patch_byte_sum(F.col("ph")).alias("bsum"),
    )
    return j.groupBy("doc_id").agg(
        F.first("np").cast("long").alias("n_patches"),
        F.first("nb").cast("long").alias("n_bytes"),
        F.sum("dup").cast("long").alias("n_dup_patches"),
        F.when(F.sum("dup") > 0, 1).otherwise(0).alias("has_shared_content"),
        F.sum("bsum").cast("long").alias("byte_mass"),
        F.floor(
            F.sum("bsum").cast("double") / F.first("np") + F.lit(0.5)
        ).alias("mean_patch_mass"),
    )
