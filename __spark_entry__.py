"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline (pages → geo-entity extraction →
gazetteer geocode → PIP join against region polygons) at sf0.001.
``queries()`` / ``oracle_sql()`` register every oracle-checkable operator;
non-SQL-expressible ops get rows-only entries (no oracle_sql key).

All derived tables (pages/gazetteer/regions/points) are reconstructed
bit-identically on both engines — see geospatial_spark/sources/{pages,oracle}.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geospatial_spark.functions import udfs
from geospatial_spark.operators import buffer as buf_ops
from geospatial_spark.operators import dedup as dd
from geospatial_spark.operators import sessions as sess_ops
from geospatial_spark.operators import knn as knn_ops
from geospatial_spark.operators import media as med
from geospatial_spark.operators import pip_join as pj
from geospatial_spark.operators import similarity as sim
from geospatial_spark.operators import textstats as ts
from geospatial_spark.operators import tiling
from geospatial_spark.sources import constants as C
from geospatial_spark.sources import oracle as osql
from geospatial_spark.sources import oracle_text as otxt
from geospatial_spark.sources import pages as src

SF_SMOKE = "/root/testdata/sf0.001"


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    return src.extract_points(src.pages(spark, sf_dir), src.gazetteer(spark))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PIP spatial join of geocoded page mentions into regions."""
    pts = _points(spark, SF_SMOKE)
    regions = src.regions(spark)
    return pj.pip_join(
        pts,
        regions,
        poly_id="region_id",
        precision=4,
        strategy="broadcast",
        point_cols=("url", "entity", "lat", "lon"),
    )


# ---------------------------------------------------------------------------
# queries / oracles
# ---------------------------------------------------------------------------


def _q_pages_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-url sha256(text) — the byte-identical-text invariant surface."""
    return src.pages(spark, sf_dir).select(
        "url", "lang", F.sha2(F.col("text"), 256).alias("text_sha")
    )


def _q_extract_geocode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _points(spark, sf_dir)


def _q_pip_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pj.pip_join(
        _points(spark, sf_dir),
        src.regions(spark),
        poly_id="region_id",
        precision=4,
        strategy="broadcast",
        point_cols=("url", "entity"),
    )


def _q_pip_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same join through the shuffle+salting path (N5) — must agree with the
    broadcast plan AND the oracle."""
    return pj.pip_join(
        _points(spark, sf_dir),
        src.regions(spark),
        poly_id="region_id",
        precision=4,
        strategy="shuffle",
        salt=4,
        heavy_cell_rows=200,
        point_cols=("url", "entity"),
    )


def _q_pip_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pj.pip_join_counts(_q_pip_join(spark, sf_dir))


def _q_tiles_z8(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tiling.tile_assignments(_points(spark, sf_dir), zooms=(8,))


def _q_tiles_z12(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tiling.tile_assignments(_points(spark, sf_dir), zooms=(12,))


def _q_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir).select("url", "entity", "lat", "lon").distinct()
    gaz = [(n, la, lo) for _, n, la, lo, _ in C.gazetteer_rows()]
    out = knn_ops.knn_join_broadcast(pts, gaz, k=5)
    return out.select(
        "url", "entity", "neighbor_name", "rank", F.round("dist_m", 3).alias("dist_m")
    )


def _q_utm_zone(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    return (
        pts.select(udfs.utm_epsg_col(F.col("lat"), F.col("lon")).alias("epsg"))
        .groupBy("epsg")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _q_haversine_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance of every point to London, bucketed to whole km (integer
    output → float-robust oracle compare)."""
    pts = _points(spark, sf_dir)
    lond = [m for m in C.MEGACITIES if m[0] == "London"][0]
    d = udfs.haversine_col(F.col("lat"), F.col("lon"), F.lit(lond[1]), F.lit(lond[2]))
    return (
        pts.select((F.floor(d / 1000.0)).cast("long").alias("km_bucket"))
        .groupBy("km_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# cell-kernel / geometry operator queries (G1-G5, U1, K1, O2, N2, N3)
# ---------------------------------------------------------------------------


def _q_polyfill_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1 polycell over the 64 region polygons at geohash precision 4 —
    per-region covering-cell counts (oracle: closed-form quantized-grid
    count, exact for rectangles)."""
    return (
        pj.polygon_cells(src.regions(spark), "region_id", 4)
        .groupBy("region_id")
        .agg(F.count(F.lit(1)).alias("n_cells"))
    )


def _q_cell_bboxes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3 cellpoly: points → geohash-5 cell → boundary bbox (UDF decode),
    grouped.  Oracle recomputes the same bbox from raw lat/lon quantization
    (exact dyadic cell widths → bit-identical doubles)."""
    pts = _points(spark, sf_dir)
    enc = udfs.geohash_encode_udf(5)
    bb = udfs.geohash_bbox_wkb_udf()
    return (
        pts.withColumn("__cell", enc(F.col("lat"), F.col("lon")))
        .withColumn("__bb", bb(F.col("__cell")))
        .select("__bb.*")
        .groupBy("minx", "miny", "maxx", "maxy")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _q_knn_cellring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2 kNN via cell-ring expansion (geohash p2, ring 3) — oracle mirrors
    the ring semantics as a quantized-grid Chebyshev join + window rank."""
    pts = _points(spark, sf_dir).select("url", "entity", "lat", "lon").distinct()
    gaz = src.gazetteer(spark).select("name", "lat", "lon")
    out = knn_ops.knn_join_cellring(pts, gaz, k=5, precision=2, max_ring=3)
    return out.select(
        "url", "entity", "neighbor_name", "rank", F.round("dist_m", 3).alias("dist_m")
    )


def _q_color_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1 color_map: deterministic categorical color per entity (exact
    reference semantics: int(cleaned, 36) % 24 via closed form)."""
    pts = _points(spark, sf_dir)
    return (
        pts.groupBy("entity")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("color_idx", udfs.color_idx_col(F.col("entity")))
        .withColumn("color_hex", udfs.color_hex_from_idx(F.col("color_idx")))
        .select("entity", "color_idx", "color_hex", "n")
    )


def _routes_df(spark: SparkSession) -> DataFrame:
    from geospatial_spark.geo import polyline as pl

    rows = C.gazetteer_rows()
    trajs: dict[int, list] = {}
    for i, _, lat, lon, _ in rows:
        trajs.setdefault(i // 10, []).append((lon, lat))
    enc = [(t, pl.encode(coords)) for t, coords in sorted(trajs.items())]
    return spark.createDataFrame(enc, "traj_id bigint, polyline string")


def _q_polyline_routes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 polyline decode + U7 line→points explode: encoded gazetteer
    trajectories → (traj_id, seq, lon_e6, lat_e6) exact ints."""
    dec = udfs.polyline_decode_udf()
    return (
        _routes_df(spark)
        .withColumn("__pts", dec(F.col("polyline")))
        .select("traj_id", F.posexplode("__pts").alias("seq", "__p"))
        .select(
            "traj_id",
            F.col("seq").cast("int").alias("seq"),
            F.col("__p.lon_e6").alias("lon_e6"),
            F.col("__p.lat_e6").alias("lat_e6"),
        )
    )


def _q_geom_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 geom_stats over region WKB (shape columns oracle-checked; UTM
    area/perimeter golden-tested in tests/test_geo_kernels.py)."""
    stats = udfs.geom_stats_udf("m")
    return src.regions(spark).select(
        "region_id", stats(F.col("geometry")).alias("__s")
    ).select("region_id", "__s.n_shells", "__s.n_holes", "__s.n_points")


def _q_s2_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-rule tile output (z, x, y, s2_cell, n) — rows-only check (S2
    ids are validated by kernel unit tests, not SQL-expressible)."""
    return tiling.tile_cell_assignments(_points(spark, sf_dir), z=12, s2_level=12)


def _q_compact_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4 distributed compaction of the union of region covers at geohash
    p5 → cells per resulting resolution (rows-only; oracle = local numpy
    kernel in unit tests)."""
    from geospatial_spark.operators import compact as cmp_ops

    cells = pj.polygon_cells(src.regions(spark), "region_id", 5).select("cell")
    compacted = cmp_ops.compact_geohash_df(cells)
    return (
        compacted.groupBy(F.length("cell").alias("res"))
        .agg(F.count(F.lit(1)).alias("n_cells"))
    )


def _q_ways_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 ways_to_geom: node-list → Polygon (closed ring) vs LineString,
    decided PER WAY (the reference's batch variant decides from the first
    way only — osm.py:98,104 — a bug we fix).  Fixture ways = region
    rectangle rings (closed) ∪ gazetteer trajectories (open); Overpass HTTP
    source replaced per SURVEY §2.5."""
    regions = src.regions(spark)
    region_ways = regions.select(
        F.col("region_idx").alias("way_id"),
        F.lit(5).cast("bigint").alias("n_points"),
        (
            (F.col("minx") == F.col("minx")) & (F.col("miny") == F.col("miny"))
        ).alias("is_closed"),
    )
    gaz = src.gazetteer(spark)
    traj_ways = (
        gaz.groupBy((F.col("idx") / 10).cast("bigint").alias("traj"))
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min_by(F.col("lon"), F.col("idx")).alias("flon"),
            F.min_by(F.col("lat"), F.col("idx")).alias("flat"),
            F.max_by(F.col("lon"), F.col("idx")).alias("llon"),
            F.max_by(F.col("lat"), F.col("idx")).alias("llat"),
        )
        .select(
            (F.col("traj") + 1000).alias("way_id"),
            F.col("n_points"),
            ((F.col("flon") == F.col("llon")) & (F.col("flat") == F.col("llat"))).alias(
                "is_closed"
            ),
        )
    )
    return region_ways.unionByName(traj_ways).select(
        "way_id",
        "n_points",
        "is_closed",
        F.when(F.col("is_closed"), "polygon").otherwise("linestring").alias("kind"),
    )


def _q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N7 batch twin of streaming.windowed_counts: tumbling 1-hour windows
    over events (epoch-second starts, exact-cent sums → float-free)."""
    ev = src.read_split(spark, f"{sf_dir}/events.parquet")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    return (
        ev.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum(cents).alias("cents"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH").alias("hour"),
            "event_type",
            "n_events",
            "cents",
        )
    )


def _q_buffer_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5 buffer/ring paths (karta.py:806-846): 5-10 km annulus around
    every gazetteer point — exploded shell/hole vertices via spherical
    destination math (JVM trig, oracle-mirrored; rounded to 1e-6 deg to
    absorb libm-vs-JVM ulp)."""
    from geospatial_spark.operators import buffer as buf

    gaz = src.gazetteer(spark).select("name", "lat", "lon")
    out = buf.point_ring_vertices(gaz, inner_m=5000.0, outer_m=10000.0, n_vertices=16)
    return out.select(
        "name",
        "ring",
        "vertex",
        F.round("v_lat", 6).alias("v_lat"),
        F.round("v_lon", 6).alias("v_lon"),
    )


def _q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization of events (30-min gap) — window lag +
    running sum + per-session agg."""
    from geospatial_spark.operators import sessions as sess

    ev = src.read_split(spark, f"{sf_dir}/events.parquet")
    return sess.sessionize(ev, gap_seconds=1800)


def _q_s2_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 pointcell + token + center (G3/N1 S2 side) — rows-only (S2 ids
    validated by kernel golden tests; not SQL-expressible)."""
    pts = _points(spark, sf_dir)
    s2c = udfs.s2_cell_udf(12)
    latf, lonf = udfs.s2_center_udfs()
    cells = (
        pts.withColumn("cell_id", s2c(F.col("lat"), F.col("lon")))
        .groupBy("cell_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return cells.select(
        "cell_id",
        udfs.s2_token_udf(F.col("cell_id")).alias("token"),
        F.round(latf(F.col("cell_id")), 9).alias("center_lat"),
        F.round(lonf(F.col("cell_id")), 9).alias("center_lon"),
        "n",
    )


def _q_vincenty_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U5 vincenty (iterative geodesic, pandas UDF) — km buckets to London;
    rows-only (not closed-form SQL-expressible)."""
    pts = _points(spark, sf_dir)
    lond = [m for m in C.MEGACITIES if m[0] == "London"][0]
    d = udfs.vincenty_udf(
        F.col("lat"), F.col("lon"), F.lit(float(lond[1])), F.lit(float(lond[2]))
    )
    return (
        pts.select((F.floor(d / 1000.0)).cast("long").alias("km_bucket"))
        .groupBy("km_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# training-data pipeline ops (dedup / similarity / text analysis / multimodal)
# ---------------------------------------------------------------------------


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return src.read_split(spark, f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return src.read_split(spark, f"{sf_dir}/embeddings.parquet")


def _q_dedup_exact(spark, sf_dir):
    return dd.dedup_exact(src.pages(spark, sf_dir))


def _q_dedup_minhash(spark, sf_dir):
    return dd.dedup_minhash(src.pages(spark, sf_dir))


def _q_dedup_simhash(spark, sf_dir):
    return dd.dedup_simhash(src.pages(spark, sf_dir))


def _q_dedup_ngram(spark, sf_dir):
    return dd.dedup_ngram(src.pages(spark, sf_dir))


def _q_dedup_embed(spark, sf_dir):
    return dd.dedup_embed(_emb(spark, sf_dir))


def _q_ann_topk(spark, sf_dir):
    return sim.ann_topk(_emb(spark, sf_dir))


def _q_ann_lsh(spark, sf_dir):
    return sim.ann_lsh_topk(_emb(spark, sf_dir))


def _q_ann_ivf(spark, sf_dir):
    return sim.ann_ivf_topk(_emb(spark, sf_dir))


def _q_lang_id(spark, sf_dir):
    return ts.lang_id(_docs(spark, sf_dir), spark)


def _q_text_quality(spark, sf_dir):
    return ts.text_quality(_docs(spark, sf_dir))


def _q_doc_fingerprint(spark, sf_dir):
    return ts.doc_fingerprint(_docs(spark, sf_dir))


def _q_dedup_clusters(spark, sf_dir):
    """Duplicate-cluster assignment: connected components (min-label
    propagation) over SimHash near-dup pairs → cluster sizes.  Rows-only
    (iterative; the algorithm is validated against a local union-find
    oracle in tests/test_dedup_clusters.py on the MinHash pair set)."""
    pairs = dd.dedup_simhash(src.pages(spark, sf_dir))
    labels = dd.dedup_clusters(pairs)
    return labels.groupBy("cluster").agg(F.count(F.lit(1)).alias("size"))


def _q_corpus_curate(spark, sf_dir):
    """End-to-end curation: exact-dup keeper election (window min over
    sha256(text)) + quality gate → per-(lang, status) counts.  The
    capstone composition of the dedup + quality operators."""
    from pyspark.sql import Window

    from geospatial_spark.functions import texthash as TH

    pg = src.pages(spark, sf_dir)
    t = TH.tokens(F.col("text"))
    n_tok = F.size(t)
    uniq = F.size(F.array_distinct(t))
    safe = F.greatest(n_tok, F.lit(1))
    quality = F.floor(
        F.lit(1e6)
        * (F.lit(0.5) * uniq / safe + F.lit(0.5) * F.least(n_tok, F.lit(200)) / F.lit(200.0))
    ).cast("bigint")
    w = Window.partitionBy(F.sha2(F.col("text"), 256))
    keeper = F.min("url").over(w)
    status = (
        F.when(F.col("url") != keeper, "dup")
        .when(quality < 400_000, "lowq")
        .otherwise("kept")
    )
    return (
        pg.select("url", "lang", status.alias("status"))
        .groupBy("lang", "status")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _q_media_features(spark, sf_dir):
    return med.extract_features(med.media_table(spark, sf_dir))


def _q_frame_samples(spark, sf_dir):
    return med.frame_samples(_q_media_features(spark, sf_dir))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pages_invariant": _q_pages_invariant,
        "extract_geocode": _q_extract_geocode,
        "pip_join": _q_pip_join,
        "pip_join_salted": _q_pip_join_salted,
        "pip_counts": _q_pip_counts,
        "tiles_z8": _q_tiles_z8,
        "tiles_z12": _q_tiles_z12,
        "knn_k5": _q_knn,
        "utm_zone": _q_utm_zone,
        "haversine_buckets": _q_haversine_buckets,
        "polyfill_regions": _q_polyfill_regions,
        "cell_bboxes": _q_cell_bboxes,
        "knn_cellring": _q_knn_cellring,
        "color_map": _q_color_map,
        "polyline_routes": _q_polyline_routes,
        "geom_stats": _q_geom_stats,
        "s2_tiles": _q_s2_tiles,
        "compact_regions": _q_compact_regions,
        "vincenty_buckets": _q_vincenty_buckets,
        "ways_classify": _q_ways_classify,
        "events_hourly": _q_events_hourly,
        "buffer_ring": _q_buffer_ring,
        "sessionize": _q_sessionize,
        "s2_cells": _q_s2_cells,
        "dedup_exact": _q_dedup_exact,
        "dedup_minhash": _q_dedup_minhash,
        "dedup_simhash": _q_dedup_simhash,
        "dedup_ngram": _q_dedup_ngram,
        "dedup_embed": _q_dedup_embed,
        "ann_topk": _q_ann_topk,
        "ann_lsh": _q_ann_lsh,
        "ann_ivf": _q_ann_ivf,
        "lang_id": _q_lang_id,
        "text_quality": _q_text_quality,
        "doc_fingerprint": _q_doc_fingerprint,
        "media_features": _q_media_features,
        "frame_samples": _q_frame_samples,
        "dedup_clusters": _q_dedup_clusters,
        "corpus_curate": _q_corpus_curate,
    }


_B36 = "0123456789abcdefghijklmnopqrstuvwxyz"


def _quant_sql(coord: str, lo: float, span: float, cells: int) -> str:
    """The geohash quantizer (geo/geohash.py:quantize) as SQL: floor + clip."""
    return (
        f"least({cells - 1}, greatest(0, "
        f"CAST(floor((({coord}) + {lo!r}) / {span!r} * {float(cells)!r}) AS BIGINT)))"
    )


def _color_idx_sql(expr: str) -> str:
    cl = f"lower(regexp_replace({expr}, '[\\W_]', '', 'g'))"
    dig = (
        lambda ch: f"(CASE WHEN ascii({ch}) <= 57 THEN ascii({ch}) - 48 "
        f"ELSE ascii({ch}) - 87 END)"
    )
    last = dig(f"substr({cl}, length({cl}), 1)")
    second = (
        f"CASE WHEN length({cl}) >= 2 THEN {dig(f'substr({cl}, length({cl}) - 1, 1)')} "
        "ELSE 0 END"
    )
    return (
        f"CASE WHEN length({cl}) = 0 THEN 0 ELSE "
        f"(({last}) + 12 * ({second})) % 24 END"
    )


def _buffer_ring_oracle_sql() -> str:
    import math

    parts = []
    for ring, radius in (("outer", 10000.0), ("inner", 5000.0)):
        theta = f"(v * {2.0 * math.pi / 16!r})"
        vlat, vlon = buf_ops.dest_sql("g.lat", "g.lon", radius, theta)
        parts.append(
            f"SELECT g.name, '{ring}' AS ring, CAST(v AS INT) AS vertex, "
            f"round({vlat}, 6) AS v_lat, round({vlon}, 6) AS v_lon "
            "FROM gaz g, (SELECT unnest(range(0, 16)) AS v) t"
        )
    return osql.with_geo_ctes("\nUNION ALL ".join(parts))


def _palette_case_sql(idx_expr: str) -> str:
    whens = " ".join(
        f"WHEN {i} THEN '{c}'" for i, c in enumerate(udfs.COLOR_PALETTE)
    )
    return f"CASE ({idx_expr}) {whens} END"


def oracle_sql() -> dict[str, str]:
    G = osql.with_geo_ctes
    hav = udfs.HAVERSINE_SQL
    lond = [m for m in C.MEGACITIES if m[0] == "London"][0]
    d_london = hav.format(lat1="p.lat", lon1="p.lon", lat2=repr(lond[1]), lon2=repr(lond[2]))
    d_gaz = hav.format(lat1="p.lat", lon1="p.lon", lat2="g.lat", lon2="g.lon")
    pip_sql = (
        "SELECT p.url, p.entity, r.region_id FROM points p JOIN regions r ON "
        "p.lon >= r.minx AND p.lon <= r.maxx AND p.lat >= r.miny AND p.lat <= r.maxy"
    )
    return {
        "pages_invariant": G("SELECT url, lang, sha256(text) AS text_sha FROM pages"),
        "extract_geocode": G("SELECT url, entity, lat, lon FROM points"),
        "pip_join": G(pip_sql),
        "pip_join_salted": G(pip_sql),
        "pip_counts": G(
            "SELECT r.region_id, count(*) AS n_points FROM points p JOIN regions r ON "
            "p.lon >= r.minx AND p.lon <= r.maxx AND p.lat >= r.miny AND p.lat <= r.maxy "
            "GROUP BY r.region_id"
        ),
        "tiles_z8": G(
            f"SELECT 8 AS z, {udfs.tile_x_sql('lon', 8)} AS x, {udfs.tile_y_sql('lat', 8)} AS y, "
            "count(*) AS n_points FROM points GROUP BY 1, 2, 3"
        ),
        "tiles_z12": G(
            f"SELECT 12 AS z, {udfs.tile_x_sql('lon', 12)} AS x, {udfs.tile_y_sql('lat', 12)} AS y, "
            "count(*) AS n_points FROM points GROUP BY 1, 2, 3"
        ),
        "knn_k5": G(
            "SELECT url, entity, neighbor_name, CAST(rank AS INT) AS rank, round(dist_m, 3) AS dist_m FROM ("
            "  SELECT p.url, p.entity, g.name AS neighbor_name, "
            f"         {d_gaz} AS dist_m, "
            f"         row_number() OVER (PARTITION BY p.url, p.entity ORDER BY {d_gaz} ASC, g.name ASC) AS rank "
            "  FROM (SELECT DISTINCT url, entity, lat, lon FROM points) p CROSS JOIN gaz g"
            ") WHERE rank <= 5"
        ),
        "utm_zone": G(
            "SELECT CAST((CASE WHEN p.lat >= 0 THEN 32600 ELSE 32700 END) + "
            "least(60, greatest(1, CAST(ceil(30.0 + p.lon / 6.0) AS BIGINT))) AS INT) AS epsg, "
            "count(*) AS n FROM points p GROUP BY 1"
        ),
        "haversine_buckets": G(
            f"SELECT CAST(floor(({d_london}) / 1000.0) AS BIGINT) AS km_bucket, count(*) AS n "
            "FROM points p GROUP BY 1"
        ),
        "polyfill_regions": G(
            "SELECT region_id, "
            f"({_quant_sql('maxx', 180.0, 360.0, 1024)} - {_quant_sql('minx', 180.0, 360.0, 1024)} + 1) * "
            f"({_quant_sql('maxy', 90.0, 180.0, 1024)} - {_quant_sql('miny', 90.0, 180.0, 1024)} + 1) "
            "AS n_cells FROM regions"
        ),
        "cell_bboxes": G(
            f""", q AS (SELECT {_quant_sql('lon', 180.0, 360.0, 8192)} AS qx,
                  {_quant_sql('lat', 90.0, 180.0, 4096)} AS qy FROM points),
b AS (SELECT qx * (360.0 / 8192.0) - 180.0 AS minx,
             qy * (180.0 / 4096.0) - 90.0 AS miny FROM q),
b2 AS (SELECT minx, miny, minx + (360.0 / 8192.0) AS maxx,
              miny + (180.0 / 4096.0) AS maxy FROM b)
SELECT minx, miny, maxx, maxy, count(*) AS n FROM b2 GROUP BY 1, 2, 3, 4"""
        ),
        "knn_cellring": G(
            f""", dp AS (SELECT DISTINCT url, entity, lat, lon FROM points),
qp AS (SELECT url, entity, lat, lon,
       {_quant_sql('lon', 180.0, 360.0, 32)} AS qx,
       {_quant_sql('lat', 90.0, 180.0, 32)} AS qy FROM dp),
gq AS (SELECT name, lat AS glat, lon AS glon,
       {_quant_sql('lon', 180.0, 360.0, 32)} AS qx,
       {_quant_sql('lat', 90.0, 180.0, 32)} AS qy FROM gaz),
cand AS (SELECT p.url, p.entity, p.lat, p.lon, g.name, g.glat, g.glon
         FROM qp p JOIN gq g
         ON least(abs(p.qx - g.qx), 32 - abs(p.qx - g.qx)) <= 3
            AND abs(p.qy - g.qy) <= 3),
scored AS (SELECT url, entity, name AS neighbor_name,
    {hav.format(lat1='lat', lon1='lon', lat2='glat', lon2='glon')} AS dist_m
    FROM cand),
ranked AS (SELECT *, row_number() OVER (PARTITION BY url, entity
           ORDER BY dist_m ASC, neighbor_name ASC) AS rank FROM scored)
SELECT url, entity, neighbor_name, CAST(rank AS INT) AS rank,
       round(dist_m, 3) AS dist_m FROM ranked WHERE rank <= 5"""
        ),
        "color_map": G(
            f""", e AS (SELECT entity, count(*) AS n FROM points GROUP BY 1),
e2 AS (SELECT entity, {_color_idx_sql('entity')} AS color_idx, n FROM e)
SELECT entity, color_idx, {_palette_case_sql('color_idx')} AS color_hex, n FROM e2"""
        ),
        "polyline_routes": G(
            "SELECT i // 10 AS traj_id, CAST(i % 10 AS INT) AS seq, "
            "CAST(lon * 1e6 AS BIGINT) AS lon_e6, CAST(lat * 1e6 AS BIGINT) AS lat_e6 "
            "FROM gaz"
        ),
        "geom_stats": G(
            "SELECT region_id, CAST(1 AS INT) AS n_shells, CAST(0 AS INT) AS n_holes, "
            "CAST(5 AS INT) AS n_points FROM regions"
        ),
        "ways_classify": G(
            """, rw AS (SELECT region_idx AS way_id, CAST(5 AS BIGINT) AS n_points,
             (minx = minx AND miny = miny) AS is_closed FROM regions),
tw AS (SELECT CAST(i // 10 AS BIGINT) + 1000 AS way_id, count(*) AS n_points,
       (arg_min(lon, i) = arg_max(lon, i) AND arg_min(lat, i) = arg_max(lat, i)) AS is_closed
       FROM gaz GROUP BY 1),
w AS (SELECT * FROM rw UNION ALL SELECT * FROM tw)
SELECT way_id, n_points, is_closed,
       CASE WHEN is_closed THEN 'polygon' ELSE 'linestring' END AS kind FROM w"""
        ),
        "buffer_ring": _buffer_ring_oracle_sql(),
        "sessionize": sess_ops.sessionize_sql(1800),
        "events_hourly": (
            "SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour, "
            "event_type, count(*) AS n_events, "
            "CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents "
            "FROM events GROUP BY 1, 2"
        ),
        "dedup_exact": otxt.dedup_exact_sql(),
        "dedup_minhash": otxt.dedup_minhash_sql(),
        "dedup_simhash": otxt.dedup_simhash_sql(),
        "dedup_ngram": otxt.dedup_ngram_sql(),
        "dedup_embed": otxt.dedup_embed_sql(),
        "ann_topk": otxt.ann_topk_sql(),
        "ann_lsh": otxt.ann_lsh_topk_sql(),
        "ann_ivf": otxt.ann_ivf_topk_sql(),
        "lang_id": otxt.lang_id_sql(),
        "text_quality": otxt.text_quality_sql(),
        "doc_fingerprint": otxt.doc_fingerprint_sql(),
        "corpus_curate": G(
            f""", q AS (
  SELECT url, lang, sha256(text) AS sha,
    CAST(floor(1e6 * (0.5 * len(list_distinct({otxt.TH.tokens_sql('text')})) /
         greatest(len({otxt.TH.tokens_sql('text')}), 1) +
         0.5 * least(len({otxt.TH.tokens_sql('text')}), 200) / 200.0)) AS BIGINT) AS quality
  FROM pages
),
k AS (SELECT *, min(url) OVER (PARTITION BY sha) AS keeper FROM q),
s AS (SELECT lang, CASE WHEN url <> keeper THEN 'dup'
                        WHEN quality < 400000 THEN 'lowq'
                        ELSE 'kept' END AS status FROM k)
SELECT lang, status, count(*) AS n FROM s GROUP BY 1, 2"""
        ),
        "media_features": otxt.media_features_sql(),
        "frame_samples": (
            f"SELECT media_id, unnest(range(0, n_frames, 16)) AS frame_idx "
            f"FROM ({otxt.media_features_sql()}) WHERE kind = 'video'"
        ),
    }
