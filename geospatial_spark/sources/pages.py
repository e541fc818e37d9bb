"""Spark-side builders for the derived ``pages`` / ``gazetteer`` / ``regions``
/ ``points`` tables (DataFrame API, all-JVM expressions — no UDF in the
derivation path, so Catalyst folds/pushes everything).

Mirrors ``sources.oracle`` SQL bit-for-bit: both use the exact-integer LCG
from ``sources.constants`` and IEEE double arithmetic in the same order.

At 100 TB these builders stay scale-safe: the replication is a broadcast
cross join (no shuffle), ``events`` lookup is a broadcast hash join, and the
mention model is pure column math; the only wide exchange in any derived
pipeline is the one the downstream operator (join/tile agg) actually needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from . import constants as C


def rnd_col(x: Column, salt: int) -> Column:
    """Triple-pass 31-bit LCG on a BIGINT column (exact integer math)."""
    y = x + F.lit(C.SALT_STRIDE * salt)
    for _ in range(3):
        y = (y * F.lit(C.LCG_A) + F.lit(C.LCG_C)) % F.lit(C.LCG_M)
    return y


def uniform_col(x: Column, salt: int) -> Column:
    return rnd_col(x, salt) / F.lit(float(C.LCG_M))


def _city_name_col(idx: Column) -> Column:
    # NOT a per-megacity when-chain: each when() condition re-inlines the
    # full idx tree (triple-LCG mention math), and 24 copies × 3 mentions
    # × (html + text outputs) pushed the derivation Project past the JVM's
    # 64 KB generated-method limit — the whole stage fell back to
    # interpreted eval.  element_at over an array literal references idx
    # 3×, keeping the derivation inside whole-stage codegen.  Same values:
    # _mention_idx yields either raw % N_SYNTH_CITIES (< N_SYNTH_CITIES)
    # or N_SYNTH_CITIES + k with k < N_MEGA, so the branch test is exact.
    mega = F.array(*[F.lit(name) for name, _, _ in C.MEGACITIES])
    return F.when(
        idx >= F.lit(C.N_SYNTH_CITIES),
        F.element_at(mega, (idx - F.lit(C.N_SYNTH_CITIES) + 1).cast("int")),
    ).otherwise(F.concat(F.lit("city_"), F.lpad(idx.cast("string"), 3, "0")))


def _mention_idx(raw: Column) -> Column:
    mega = F.lit(C.N_SYNTH_CITIES) + ((raw / 4).cast("bigint")) % F.lit(C.N_MEGA)
    return F.when(raw % C.MEGACITY_MOD == 0, mega).otherwise(raw % C.N_SYNTH_CITIES)


def read_split(spark: SparkSession, path: str) -> DataFrame:
    """Read parquet and guarantee >= defaultParallelism partitions.

    A 100 TB table arrives pre-split into thousands of file splits; the
    sandbox fixtures are single small files, which would pin every
    downstream zero-shuffle (broadcast-only) pipeline to ONE task.  The
    one-time repartition of the tiny base table restores the parallelism a
    real input has for free — it is a no-op when the scan is already wide.
    """
    df = spark.read.parquet(path)
    par = 4 * spark.sparkContext.defaultParallelism  # ~4 task waves/stage
    if df.rdd.getNumPartitions() < par:
        df = df.repartition(par)
    return df


def pages(spark: SparkSession, sf_dir: str, replication: int = C.REPLICATION) -> DataFrame:
    """The engine's primary input table (url, warc_ts, html, text, lang).

    text = documents.text + 0..3 deterministic ' near <City>.' mentions;
    per-url sha256(text) is the pipeline invariant (BASELINE.json:16).
    """
    docs = read_split(spark, f"{sf_dir}/documents.parquet")
    events = read_split(spark, f"{sf_dir}/events.parquet").select("event_id", "ts")
    n_events = events.count()
    reps = spark.range(replication).withColumnRenamed("id", "rep")
    df = docs.crossJoin(F.broadcast(reps))
    page_id = F.col("doc_id") * replication + F.col("rep")
    df = df.withColumn("page_id", page_id)
    df = df.withColumn("n_mentions", rnd_col(F.col("page_id"), C.SALT_N_MENTIONS) % 4)
    text = F.col("text")
    for k in range(3):
        raw = rnd_col(F.col("page_id"), C.SALT_MENTION_BASE + k)
        name = _city_name_col(_mention_idx(raw))
        text = F.concat(
            text,
            F.when(
                F.col("n_mentions") > k, F.concat(F.lit(" near "), name, F.lit("."))
            ).otherwise(F.lit("")),
        )
    df = df.withColumn("text_out", text)
    df = df.join(
        F.broadcast(events), F.col("page_id") % n_events == F.col("event_id"), "inner"
    )
    return df.select(
        F.concat(
            F.lit("https://example.org/"),
            F.col("lang"),
            F.lit("/"),
            F.col("page_id").cast("string"),
        ).alias("url"),
        F.col("ts").alias("warc_ts"),
        F.encode(
            F.concat(F.lit("<html><body>"), F.col("text_out"), F.lit("</body></html>")),
            "utf-8",
        ).alias("html"),
        F.col("text_out").alias("text"),
        F.col("lang"),
        F.col("page_id"),
    )


def gazetteer(spark: SparkSession) -> DataFrame:
    """276-row broadcast geocoding table (name → lat/lon/population)."""
    rows = C.gazetteer_rows()
    return spark.createDataFrame(
        rows, "idx bigint, name string, lat double, lon double, population bigint"
    )


def regions(spark: SparkSession) -> DataFrame:
    """64 axis-aligned regions with WKB polygon geometry (the PIP-join small
    side; rectangles so the DuckDB oracle can verify via plain comparisons
    while the engine runs its real WKB/polyfill/PIP machinery)."""
    from ..geo import geom as gm

    rows = []
    for i, region_id, cidx, minx, miny, maxx, maxy in C.region_rows():
        poly = gm.polygon([(minx, miny), (maxx, miny), (maxx, maxy), (minx, maxy)])
        rows.append((i, region_id, cidx, minx, miny, maxx, maxy, bytearray(gm.to_wkb(poly))))
    return spark.createDataFrame(
        rows,
        "region_idx bigint, region_id string, center_idx bigint, "
        "minx double, miny double, maxx double, maxy double, geometry binary",
    )


def regions_holed(spark: SparkSession) -> DataFrame:
    """The 64 region rectangles with a centered rectangular HOLE — the
    holed-SUBJECT side of the ``overlay_join`` registry entry.  Bytes come
    from ``sources.fixtures.holed_region_rows`` (the oracle VALUES map is
    generated from the SAME buffers, so overlay results are bit-identical
    by construction)."""
    from . import fixtures as FX

    rows = [(rid, bytearray(w)) for rid, w in FX.holed_region_rows()]
    return spark.createDataFrame(rows, "region_id string, geometry binary")


def star_polygons(spark: SparkSession) -> DataFrame:
    """A concave 16-vertex star polygon around every gazetteer point — the
    CLIP side of the ``overlay_join`` registry entry (real WKB geometry
    column; same star shape the clip_general entry synthesizes inside its
    UDF).  Bytes from ``sources.fixtures.star_polygon_rows``."""
    from . import fixtures as FX

    rows = [(name, bytearray(w)) for name, w in FX.star_polygon_rows()]
    return spark.createDataFrame(rows, "name string, geometry binary")


def extract_points(pages_df: DataFrame, gazetteer_df: DataFrame) -> DataFrame:
    """N4: text → geo-entity mentions → geocoded points.

    Extraction is a JVM-side regexp (vectorized, codegen'd); geocoding is a
    broadcast hash equi-join on the normalized entity name (reference U11
    analogue, gutils.py:603-660 — network geocoder replaced by gazetteer).
    ``text`` is never mutated (read-only projection).
    """
    mentions = pages_df.select(
        "url",
        F.explode(
            F.regexp_extract_all(F.col("text"), F.lit(C.ENTITY_REGEX), F.lit(1))
        ).alias("entity"),
    )
    return mentions.join(
        F.broadcast(gazetteer_df.select("name", "lat", "lon")),
        mentions.entity == F.col("name"),
        "inner",
    ).select("url", "entity", "lat", "lon")
