"""Deterministic synthetic-geo derivation constants.

The engine's primary input is an Iceberg-style table ``pages(url, warc_ts,
html, text, lang)`` of Common-Crawl-style web pages (BASELINE.json
input_hint).  The driver provides base tables (documents/events) at
/root/testdata/sf*; ``pages`` and the geocoding ``gazetteer`` are derived
from them **deterministically with exact integer arithmetic only** (a
31-bit LCG; divisions only by powers of two) so that the SAME values are
reproducible bit-identically in PySpark *and* in the DuckDB oracle SQL —
this is what makes the spatial-join/tiling pipelines oracle-checkable
end-to-end (SURVEY.md §5.2).

Nothing here is random at run time: no wall clock, no RNG state.
"""

from __future__ import annotations

# 31-bit LCG (glibc constants — public domain knowledge).  All intermediate
# products stay < 2^62, safe for int64 in Spark, DuckDB and numpy.
LCG_A = 1103515245
LCG_C = 12345
LCG_M = 2147483648  # 2^31
SALT_STRIDE = 1000003

# pages = documents × REPLICATION (distinct urls & mention draws per replica)
REPLICATION = 16

# mention model: n_mentions = rnd(page_id, SALT_N_MENTIONS) % 4  (0..3)
SALT_N_MENTIONS = 1
SALT_MENTION_BASE = 2  # mention k uses salt SALT_MENTION_BASE + k (k<3)
N_SYNTH_CITIES = 256
# skew: raw % 4 == 0 → megacity index 256 + (raw//4) % 20  (~25% of mentions
# concentrate on 20 megacities — the "megacity cells" skew of the north rule)
MEGACITY_MOD = 4
N_MEGA = 20

SALT_GAZ_LAT = 11
SALT_GAZ_LON = 12
SALT_GAZ_POP = 13
SALT_REGION_W = 21
SALT_REGION_H = 22

N_REGIONS = 64
REGION_MEGA_START = 44  # regions 44..63 center on the 20 megacities (skew)

# (name, lat, lon) — fixed public approximate city coordinates; used as
# exact constants on both engines.  Single-token names (regex-friendly).
MEGACITIES: list[tuple[str, float, float]] = [
    ("London", 51.5074, -0.1278),
    ("Tokyo", 35.6895, 139.6917),
    ("Paris", 48.8566, 2.3522),
    ("Delhi", 28.6139, 77.209),
    ("Shanghai", 31.2304, 121.4737),
    ("Beijing", 39.9042, 116.4074),
    ("Mumbai", 19.076, 72.8777),
    ("Osaka", 34.6937, 135.5023),
    ("Cairo", 30.0444, 31.2357),
    ("Dhaka", 23.8103, 90.4125),
    ("Karachi", 24.8607, 67.0011),
    ("Istanbul", 41.0082, 28.9784),
    ("Moscow", 55.7558, 37.6173),
    ("Lagos", 6.5244, 3.3792),
    ("Manila", 14.5995, 120.9842),
    ("Seoul", 37.5665, 126.978),
    ("Jakarta", -6.2088, 106.8456),
    ("Bangkok", 13.7563, 100.5018),
    ("Lima", -12.0464, -77.0428),
    ("Bogota", 4.711, -74.0721),
]

ENTITY_REGEX = r" near (city_[0-9]{3}|" + "|".join(n for n, _, _ in MEGACITIES) + r")\."


def lcg(x: int) -> int:
    return (x * LCG_A + LCG_C) % LCG_M


def rnd(i: int, salt: int) -> int:
    """Triple-pass LCG — the scalar (python/numpy) reference used to build
    gazetteer constants driver-side; MUST stay in sync with rnd_col/rnd_sql."""
    return lcg(lcg(lcg(i + SALT_STRIDE * salt)))


def uniform(i: int, salt: int) -> float:
    return rnd(i, salt) / float(LCG_M)


def city_name(idx: int) -> str:
    if idx < N_SYNTH_CITIES:
        return f"city_{idx:03d}"
    return MEGACITIES[idx - N_SYNTH_CITIES][0]


def gazetteer_rows() -> list[tuple[int, str, float, float, int]]:
    """(idx, name, lat, lon, population) for all 276 gazetteer entries —
    exact same arithmetic as the SQL/Spark expressions."""
    rows = []
    for i in range(N_SYNTH_CITIES + N_MEGA):
        if i < N_SYNTH_CITIES:
            lat = -60.0 + 130.0 * uniform(i, SALT_GAZ_LAT)
            lon = -180.0 + 360.0 * uniform(i, SALT_GAZ_LON)
        else:
            _, lat, lon = MEGACITIES[i - N_SYNTH_CITIES]
        pop = 1_000_000_000 // (1 + rnd(i, SALT_GAZ_POP) % (N_SYNTH_CITIES + N_MEGA))
        rows.append((i, city_name(i), lat, lon, pop))
    return rows


def region_rows() -> list[tuple[int, str, int, float, float, float, float]]:
    """(region_idx, region_id, center_city_idx, minx, miny, maxx, maxy).

    Regions are axis-aligned boxes around gazetteer entries; 44..63 sit on
    megacities so the PIP join sees deliberately skewed cells (north rule
    N5).  Exact arithmetic, mirrored in oracle SQL.
    """
    gaz = {r[0]: r for r in gazetteer_rows()}
    out = []
    for i in range(N_REGIONS):
        cidx = (i * 6) % N_SYNTH_CITIES if i < REGION_MEGA_START else N_SYNTH_CITIES + (
            i - REGION_MEGA_START
        )
        _, _, clat, clon, _ = gaz[cidx]
        half_w = 0.5 + 3.0 * uniform(i, SALT_REGION_W)
        half_h = 0.5 + 2.0 * uniform(i, SALT_REGION_H)
        out.append(
            (
                i,
                f"region_{i:02d}",
                cidx,
                clon - half_w,
                clat - half_h,
                clon + half_w,
                clat + half_h,
            )
        )
    return out
