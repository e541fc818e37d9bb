"""Shared text-hashing primitives for the dedup / similarity / text-analysis
operators.

Every primitive exists twice — as a PySpark ``Column`` builder and as a
DuckDB-SQL string builder — generated from the SAME constants so the driver's
oracle check compares bit-identical arithmetic.  The shared 60-bit hash is
``conv(substr(md5(s),1,15),16,10)``: both engines agree exactly (verified),
it stays < 2^60 so every downstream modular product fits int64, and it is
JVM-native in Spark (whole-stage codegen — no Python in the hot path).

Scale notes: all operators built on these primitives are pure relational
algebra (explode → hash → groupBy/join); the only wide exchanges are the
ones the algorithm requires (signature agg, band self-join), all of them
partial-aggregatable and AQE-skew-splittable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..sources import constants as C

# ---------------------------------------------------------------------------
# constants (single source of truth for Spark AND oracle SQL)
# ---------------------------------------------------------------------------

MERSENNE_P = 2_147_483_647  # 2^31 - 1: minhash permutation modulus
MINHASH_K = 64  # permutations
MINHASH_BANDS = 16  # LSH bands (r = 4 rows/band)
MINHASH_R = MINHASH_K // MINHASH_BANDS
BAND_W = 37  # band-key fold multiplier (37^3 * p < 2^49)
SHINGLE_N = 3  # word shingle width
SIMHASH_BITS = 60  # simhash width (= our hash width)
SIMHASH_BANDS = 4  # 4 bands x 15 bits for hamming<=3 candidate recall
SIMHASH_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS
SALT_MH_A = 31
SALT_MH_B = 32
SALT_SRP = 33
TOKEN_RE = "[a-z0-9]+"


def minhash_perm_consts() -> list[tuple[int, int]]:
    """(a_i, b_i) for the K universal-hash permutations h_i(x)=(a*x+b)%p."""
    return [
        (1 + C.rnd(i, SALT_MH_A) % (MERSENNE_P - 1), C.rnd(i, SALT_MH_B) % MERSENNE_P)
        for i in range(MINHASH_K)
    ]


def auto_planes(n_rows: int, target_bucket: int = 64, lo: int = 8, hi: int = 24) -> int:
    """SRP plane count scaled to corpus size: 2^planes buckets ≈ n/target.

    The 100 TB knob the round-1 review flagged: a FIXED plane count means
    bucket population grows linearly with N (within-bucket pair work ~
    N²/2^planes).  Deriving planes from N keeps expected occupancy at
    ``target_bucket`` regardless of corpus size; [lo, hi] bounds keep the
    bucket id in int64 and the plane set broadcast-small."""
    import math

    if n_rows <= 0:
        return lo
    return max(lo, min(hi, math.ceil(math.log2(max(2.0, n_rows / target_bucket)))))


def srp_planes(n_planes: int, dim: int) -> list[list[int]]:
    """Signed-random-projection hyperplanes as exact ints (centered LCG)."""
    half = C.LCG_M // 2
    return [
        [C.rnd(p * dim + d, SALT_SRP) - half for d in range(dim)]
        for p in range(n_planes)
    ]


# ---------------------------------------------------------------------------
# Spark Column builders
# ---------------------------------------------------------------------------


def h60(col: Column) -> Column:
    """Shared 60-bit string hash (JVM md5 + conv; exact DuckDB parity)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def tokens(col: Column) -> Column:
    return F.regexp_extract_all(F.lower(col), F.lit(TOKEN_RE), F.lit(0))


def char_shingles_h(col: Column, k: int) -> Column:
    """Hashes of overlapping k-char shingles (array<bigint>); empty if short."""
    starts = F.sequence(F.lit(1), F.length(col) - F.lit(k - 1))
    mk = lambda i: h60(col.substr(i, F.lit(k)))
    return F.when(F.length(col) >= k, F.transform(starts, mk)).otherwise(
        F.array().cast("array<bigint>")
    )


def minhash_min_aggs(hcol: str = "h") -> list[Column]:
    """The K min-aggregate expressions over a shingle-hash column."""
    hp = F.col(hcol) % F.lit(MERSENNE_P)
    return [
        F.min((F.lit(a) * hp + F.lit(b)) % F.lit(MERSENNE_P)).alias(f"m{i}")
        for i, (a, b) in enumerate(minhash_perm_consts())
    ]


def band_key(band: int) -> Column:
    """Fold band `band`'s R signature values into one int64 key."""
    acc = None
    for j in range(MINHASH_R):
        term = F.col(f"m{band * MINHASH_R + j}") * F.lit(BAND_W**j)
        acc = term if acc is None else acc + term
    return (acc % F.lit(MERSENNE_P)).alias(f"bk{band}")


def simhash_bit_aggs(hcol: str = "h") -> list[Column]:
    """Per-bit +1/-1 vote sums (SIMHASH_BITS aggregate columns)."""
    h = F.col(hcol)
    return [
        F.sum(
            F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(SIMHASH_BITS)
    ]


def simhash_from_bits() -> Column:
    acc = F.lit(0).cast("bigint")
    for j in range(SIMHASH_BITS):
        acc = acc + F.when(F.col(f"b{j}") >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return acc


def emb_scaled(col: Column, dim: int) -> Column:
    """float[] embedding → exact-int array (floor(x*1e6 + 0.5): identical
    round-half-up in both engines; |x|<1 → products fit int64)."""
    return F.transform(
        col, lambda x: F.floor(x.cast("double") * F.lit(1e6) + F.lit(0.5)).cast("bigint")
    )


def int_dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("bigint"), lambda s, x: s + x
    )


def srp_bucket(scaled: Column, planes: list[list[int]]) -> Column:
    """SRP LSH bucket id: sign bit per hyperplane (exact-int dot)."""
    acc = F.lit(0).cast("bigint")
    for p, w in enumerate(planes):
        wlit = F.array(*[F.lit(v).cast("bigint") for v in w])
        dot = int_dot(scaled, wlit)
        acc = acc + F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return acc


# ---------------------------------------------------------------------------
# DuckDB-SQL string builders (mirror of the above, same constants)
# ---------------------------------------------------------------------------


def h60_sql(expr: str) -> str:
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


def tokens_sql(expr: str) -> str:
    return f"regexp_extract_all(lower({expr}), '{TOKEN_RE}')"


def word_shingles_sql(expr: str, n: int = SHINGLE_N) -> str:
    t = tokens_sql(expr)
    joined = " || ' ' || ".join(f"__t[i+{j}]" for j in range(n))
    # DuckDB range(a,b) is [a,b) == Spark sequence(a, b-1); empty when b<=a
    return (
        f"(SELECT list_transform(range(1, greatest(1, len(__t) - {n - 2})), "
        f"i -> {joined}) FROM (SELECT {t} AS __t) __s)"
    )


def minhash_min_aggs_sql(hcol: str = "h") -> list[str]:
    hp = f"({hcol} % {MERSENNE_P})"
    return [
        f"min(({a} * {hp} + {b}) % {MERSENNE_P}) AS m{i}"
        for i, (a, b) in enumerate(minhash_perm_consts())
    ]


def band_key_sql(band: int) -> str:
    terms = " + ".join(
        f"m{band * MINHASH_R + j} * {BAND_W**j}" for j in range(MINHASH_R)
    )
    return f"(({terms}) % {MERSENNE_P}) AS bk{band}"


def simhash_bit_aggs_sql(hcol: str = "h") -> list[str]:
    return [
        f"sum(CASE WHEN (({hcol} >> {j}) & 1) = 1 THEN 1 ELSE -1 END) AS b{j}"
        for j in range(SIMHASH_BITS)
    ]


def simhash_from_bits_sql() -> str:
    return " + ".join(
        f"CASE WHEN b{j} >= 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END"
        for j in range(SIMHASH_BITS)
    )


def emb_scaled_sql(expr: str) -> str:
    return f"list_transform({expr}, x -> CAST(floor(CAST(x AS DOUBLE) * 1e6 + 0.5) AS BIGINT))"


def int_dot_sql(a: str, b: str, dim: int) -> str:
    return f"list_sum(list_transform(range(1, {dim + 1}), i -> ({a})[i] * ({b})[i]))"


def srp_bucket_sql(scaled_expr: str, planes: list[list[int]]) -> str:
    parts = []
    for p, w in enumerate(planes):
        wl = "[" + ", ".join(str(v) for v in w) + "]"
        dot = int_dot_sql(scaled_expr, wl, len(w))
        parts.append(f"CASE WHEN ({dot}) >= 0 THEN {1 << p} ELSE 0 END")
    return "(" + " + ".join(parts) + ")"
