"""DuckDB oracle SQL builders — CTE snippets that reconstruct the derived
``pages`` / ``gaz`` / ``regions`` / ``points`` tables bit-identically to the
Spark builders in ``sources.pages`` (exact integer LCG + IEEE doubles).

Every oracle query the driver runs is self-contained: it prefixes these CTEs
onto the per-query SELECT (the driver pre-registers only the base parquet
views: documents, events, ...).
"""

from __future__ import annotations

from . import constants as C


def rnd_sql(x: str, salt: int) -> str:
    y = f"({x} + {C.SALT_STRIDE * salt})"
    for _ in range(3):
        y = f"((({y}) * {C.LCG_A} + {C.LCG_C}) % {C.LCG_M})"
    return y


def _dbl(v: float) -> str:
    return f"CAST({v!r} AS DOUBLE)"


def gaz_cte() -> str:
    mega_name = " ".join(
        f"WHEN i = {C.N_SYNTH_CITIES + k} THEN '{name}'"
        for k, (name, _, _) in enumerate(C.MEGACITIES)
    )
    mega_lat = " ".join(
        f"WHEN i = {C.N_SYNTH_CITIES + k} THEN {_dbl(lat)}"
        for k, (_, lat, _) in enumerate(C.MEGACITIES)
    )
    mega_lon = " ".join(
        f"WHEN i = {C.N_SYNTH_CITIES + k} THEN {_dbl(lon)}"
        for k, (_, _, lon) in enumerate(C.MEGACITIES)
    )
    n = C.N_SYNTH_CITIES + C.N_MEGA
    return f"""gaz AS (
  SELECT i,
    CASE {mega_name} ELSE 'city_' || lpad(CAST(i AS VARCHAR), 3, '0') END AS name,
    CASE {mega_lat} ELSE {_dbl(-60.0)} + {_dbl(130.0)} * ({rnd_sql('i', C.SALT_GAZ_LAT)} / {_dbl(float(C.LCG_M))}) END AS lat,
    CASE {mega_lon} ELSE {_dbl(-180.0)} + {_dbl(360.0)} * ({rnd_sql('i', C.SALT_GAZ_LON)} / {_dbl(float(C.LCG_M))}) END AS lon,
    1000000000 // (1 + {rnd_sql('i', C.SALT_GAZ_POP)} % {n}) AS population
  FROM (SELECT CAST(range AS BIGINT) AS i FROM range({n}))
)"""


def pages_cte(replication: int = C.REPLICATION) -> str:
    idx_exprs = []
    for k in range(3):
        raw = rnd_sql("page_id", C.SALT_MENTION_BASE + k)
        idx_exprs.append(
            f"CASE WHEN {raw} % {C.MEGACITY_MOD} = 0 "
            f"THEN {C.N_SYNTH_CITIES} + (({raw}) // 4) % {C.N_MEGA} "
            f"ELSE {raw} % {C.N_SYNTH_CITIES} END AS idx{k}"
        )
    return f"""pages_base AS (
  SELECT d.doc_id * {replication} + r.rep AS page_id, d.text AS base_text, d.lang,
         {rnd_sql(f'(d.doc_id * {replication} + r.rep)', C.SALT_N_MENTIONS)} % 4 AS n_mentions
  FROM documents d
  CROSS JOIN (SELECT CAST(range AS BIGINT) AS rep FROM range({replication})) r
),
pages_idx AS (
  SELECT *, {', '.join(idx_exprs)} FROM pages_base
),
pages AS (
  SELECT
    'https://example.org/' || p.lang || '/' || CAST(p.page_id AS VARCHAR) AS url,
    e.ts AS warc_ts,
    p.base_text
      || CASE WHEN p.n_mentions > 0 THEN ' near ' || g0.name || '.' ELSE '' END
      || CASE WHEN p.n_mentions > 1 THEN ' near ' || g1.name || '.' ELSE '' END
      || CASE WHEN p.n_mentions > 2 THEN ' near ' || g2.name || '.' ELSE '' END AS text,
    p.lang, p.page_id
  FROM pages_idx p
  LEFT JOIN gaz g0 ON g0.i = p.idx0
  LEFT JOIN gaz g1 ON g1.i = p.idx1
  LEFT JOIN gaz g2 ON g2.i = p.idx2
  JOIN events e ON e.event_id = p.page_id % (SELECT count(*) FROM events)
)"""


def regions_cte() -> str:
    return f"""regions AS (
  SELECT r.i AS region_idx,
    'region_' || lpad(CAST(r.i AS VARCHAR), 2, '0') AS region_id,
    g.lon - (0.5 + 3.0 * ({rnd_sql('r.i', C.SALT_REGION_W)} / {_dbl(float(C.LCG_M))})) AS minx,
    g.lat - (0.5 + 2.0 * ({rnd_sql('r.i', C.SALT_REGION_H)} / {_dbl(float(C.LCG_M))})) AS miny,
    g.lon + (0.5 + 3.0 * ({rnd_sql('r.i', C.SALT_REGION_W)} / {_dbl(float(C.LCG_M))})) AS maxx,
    g.lat + (0.5 + 2.0 * ({rnd_sql('r.i', C.SALT_REGION_H)} / {_dbl(float(C.LCG_M))})) AS maxy
  FROM (SELECT CAST(range AS BIGINT) AS i FROM range({C.N_REGIONS})) r
  JOIN gaz g ON g.i = CASE WHEN r.i < {C.REGION_MEGA_START} THEN (r.i * 6) % {C.N_SYNTH_CITIES}
                           ELSE {C.N_SYNTH_CITIES} + (r.i - {C.REGION_MEGA_START}) END
)"""


def points_cte() -> str:
    # DuckDB regexp_extract_all(text, pattern, group)
    pat = C.ENTITY_REGEX.replace("'", "''")
    return f"""mentions AS (
  SELECT url, unnest(regexp_extract_all(text, '{pat}', 1)) AS entity FROM pages
),
points AS (
  SELECT m.url, m.entity, g.lat, g.lon
  FROM mentions m JOIN gaz g ON g.name = m.entity
)"""


def with_geo_ctes(select_sql: str, replication: int = C.REPLICATION) -> str:
    """Wrap a SELECT with the full derivation CTE chain."""
    return (
        "WITH "
        + ",\n".join([gaz_cte(), pages_cte(replication), regions_cte(), points_cte()])
        + "\n"
        + select_sql
    )
