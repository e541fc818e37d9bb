"""Text-analysis operators over the ``documents`` corpus: language ID,
quality scoring, token counting, and winnowing document fingerprints.

All pure JVM relational plans (no Python UDF) with exact DuckDB oracles in
``sources.oracle_text`` — ratios are emitted as ``floor(1e6 * a / b)`` ppm
ints (exact-int numerators/denominators, deterministic IEEE division) so the
driver's value-hash compare is float-safe.

Scale notes: every operator is a map-side explode + one partial-aggregatable
groupBy keyed on doc_id (well distributed, no skew); the winnowing window
function sorts within doc_id partitions only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import texthash as TH

# tiny per-language marker lists (n-gram-heuristic language ID; the operator
# contract is deterministic scoring, not linguistic accuracy — the corpus is
# synthetic).  Single source of truth for Spark and oracle SQL.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr": ("le", "la", "et", "les", "des", "est", "une"),
    "zh": ("de", "shi", "bu", "le", "wo", "ni"),
}


def marker_rows() -> list[tuple[str, str]]:
    return [(w, lang) for lang, ws in LANG_MARKERS.items() for w in ws]


def lang_id(
    docs: DataFrame, spark: SparkSession, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Marker-word language ID: argmax marker hits, ties → lang asc, no hits
    → 'und'.  Output (id, pred_lang, hits)."""
    markers = spark.createDataFrame(marker_rows(), "t string, m_lang string")
    tok = docs.select(
        F.col(id_col).alias("id"), F.explode(TH.tokens(F.col(text_col))).alias("t")
    )
    hits = (
        tok.join(F.broadcast(markers), "t")
        .groupBy("id", "m_lang")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    w = Window.partitionBy("id").orderBy(F.col("hits").desc(), F.col("m_lang").asc())
    best = hits.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)
    ids = docs.select(F.col(id_col).alias("id"))
    return ids.join(best, "id", "left").select(
        "id",
        F.coalesce(F.col("m_lang"), F.lit("und")).alias("pred_lang"),
        F.coalesce(F.col("hits"), F.lit(0)).cast("bigint").alias("hits"),
    )


def text_quality(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc quality features + combined score.

    Columns: n_chars, n_ws_tokens (whitespace split), n_bpe_tokens (BPE-ish
    regex), uniq_tokens, avg_tok_len_ppm, uniq_ratio_ppm, quality_ppm.
    """
    t = TH.tokens(F.col(text_col))
    bpe = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), F.lit(0)
    )
    n_tok = F.size(t)
    uniq = F.size(F.array_distinct(t))
    tok_chars = F.aggregate(
        F.transform(t, lambda x: F.length(x).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda s, x: s + x,
    )
    safe_ntok = F.greatest(n_tok, F.lit(1))
    uniq_ratio = F.floor(F.lit(1e6) * uniq / safe_ntok).cast("bigint")
    avg_len = F.floor(F.lit(1e6) * tok_chars / safe_ntok).cast("bigint")
    quality = F.floor(
        F.lit(1e6)
        * (
            F.lit(0.5) * uniq / safe_ntok
            + F.lit(0.5) * F.least(n_tok, F.lit(200)) / F.lit(200.0)
        )
    ).cast("bigint")
    return docs.select(
        F.col(id_col).alias("id"),
        F.length(text_col).cast("bigint").alias("n_chars"),
        F.size(F.split(F.col(text_col), " ")).cast("bigint").alias("n_ws_tokens"),
        F.size(bpe).cast("bigint").alias("n_bpe_tokens"),
        uniq.cast("bigint").alias("uniq_tokens"),
        avg_len.alias("avg_tok_len_ppm"),
        uniq_ratio.alias("uniq_ratio_ppm"),
        quality.alias("quality_ppm"),
    )


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1: "fraction of
    characters in the most common n-gram"): per doc, the share of token /
    bigram occurrences taken by the most frequent token / word bigram.

    Output (docs with ≥ 2 tokens): (id, n_tokens, top_token_ppm,
    top_bigram_ppm) — exact-int ppm (floor(1e6·max/total)), oracle-exact.

    All-JVM plan: the bigram stream is built map-side with the same
    slice/arrays_zip/explode shift used by the shingle builder (no window,
    no Python); two keyed aggs per family (per-(doc, gram) count, then
    per-doc max/sum — both partial-agg'd map-side)."""
    t = TH.tokens(F.col(text_col))
    base = docs.select(F.col(id_col).alias("id"), t.alias("tk")).filter(
        F.size("tk") >= 2
    )
    m = F.size("tk") - F.lit(1)
    big = F.arrays_zip(
        F.slice("tk", 1, m).alias("a"), F.slice("tk", 2, m).alias("b")
    )
    bigrams = base.select("id", F.explode(big).alias("g")).select(
        "id", F.concat_ws(" ", F.col("g.a"), F.col("g.b")).alias("g")
    )
    big_stats = (
        bigrams.groupBy("id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("id")
        .agg(F.max("c").alias("bmx"), F.sum("c").alias("btot"))
    )
    toks = base.select("id", F.explode("tk").alias("t"))
    tok_stats = (
        toks.groupBy("id", "t")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("id")
        .agg(F.max("c").alias("tmx"), F.sum("c").alias("ttot"))
    )
    return tok_stats.join(big_stats, "id").select(
        "id",
        F.col("ttot").alias("n_tokens"),
        F.floor(F.lit(1e6) * F.col("tmx") / F.col("ttot"))
        .cast("bigint")
        .alias("top_token_ppm"),
        F.floor(F.lit(1e6) * F.col("bmx") / F.col("btot"))
        .cast("bigint")
        .alias("top_bigram_ppm"),
    )


def repetition_stats_sql() -> str:
    """DuckDB mirror of repetition_stats over the `documents` view."""
    tk = TH.tokens_sql("text")
    return f"""WITH base AS (
  SELECT doc_id AS id, {tk} AS tk FROM documents
), base2 AS (
  SELECT id, tk FROM base WHERE len(tk) >= 2
), toks AS (
  SELECT id, unnest(tk) AS t FROM base2
), tokc AS (
  SELECT id, t, count(*) AS c FROM toks GROUP BY 1, 2
), tstat AS (
  SELECT id, max(c) AS tmx, sum(c) AS ttot FROM tokc GROUP BY 1
), bigrams AS (
  SELECT id, unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i + 1])) AS g
  FROM base2
), bigc AS (
  SELECT id, g, count(*) AS c FROM bigrams GROUP BY 1, 2
), bstat AS (
  SELECT id, max(c) AS bmx, sum(c) AS btot FROM bigc GROUP BY 1
)
SELECT t.id, CAST(t.ttot AS BIGINT) AS n_tokens,
       CAST(floor(1e6 * t.tmx / t.ttot) AS BIGINT) AS top_token_ppm,
       CAST(floor(1e6 * b.bmx / b.btot) AS BIGINT) AS top_bigram_ppm
FROM tstat t JOIN bstat b ON b.id = t.id"""


def doc_fingerprint(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 16,
) -> DataFrame:
    """Winnowing fingerprint: k-char-gram hashes, min per sliding window of
    `window` grams, distinct minima per doc.  Output (id, n_fp, fp_xor) —
    the xor-fold pins the exact fingerprint set for the oracle compare."""
    grams = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(TH.char_shingles_h(F.col(text_col), k)).alias("pos", "h"),
    )
    w = (
        Window.partitionBy("id")
        .orderBy(F.col("pos").asc())
        .rowsBetween(Window.currentRow, window - 1)
    )
    mins = grams.select("id", F.min("h").over(w).alias("fp")).distinct()
    return mins.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_fp"),
        F.expr("bit_xor(fp)").alias("fp_xor"),
    )


def word_ngram_hashes(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """Distinct (id, h) word n-gram hashes at arbitrary n (the dedup
    shingle builder is fixed at SHINGLE_N; decontamination wants longer
    grams).  Same posexplode + window-lead shape — regexp runs once per
    row, everything codegen'd, one keyed shuffle."""
    tok = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(TH.tokens(F.col(text_col))).alias("pos", "t"),
    )
    w = Window.partitionBy("id").orderBy("pos")
    lead_cols = [F.lead("t", j).over(w).alias(f"t{j}") for j in range(1, n)]
    grams = (
        tok.select("id", F.col("t").alias("t0"), *lead_cols)
        .filter(F.col(f"t{n - 1}").isNotNull())
        .select(
            "id", F.concat_ws(" ", *[F.col(f"t{j}") for j in range(n)]).alias("s")
        )
    )
    return grams.select("id", TH.h60(F.col("s")).alias("h")).distinct()


def contamination(
    corpus: DataFrame,
    bench: DataFrame,
    *,
    id_col: str = "url",
    text_col: str = "text",
    bench_id: str = "doc_id",
    bench_text: str = "text",
    n: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing ≥min_hits
    word n-grams with a benchmark/eval set — the standard guard against
    test-set leakage in a training corpus (n=8..13 word grams in
    published pipelines).

    Output: (id, n_gram_hits, contaminated) — one row per corpus doc.

    Scale notes: both sides reduce to distinct (id, gram-hash) relations;
    the overlap is a hash equi-join ON THE GRAM HASH (well distributed —
    no skew key exists since grams are md5-hashed), followed by one
    partial-agg count per doc and a left join back to the corpus ids.  A
    small benchmark side broadcasts automatically under AQE."""
    cg = word_ngram_hashes(corpus, id_col, text_col, n)
    bg = word_ngram_hashes(bench, bench_id, bench_text, n).select("h").distinct()
    hits = cg.join(bg, "h").groupBy("id").agg(
        F.count(F.lit(1)).alias("n_gram_hits")
    )
    return (
        corpus.select(F.col(id_col).alias("id"))
        .join(hits, "id", "left")
        .select(
            "id",
            F.coalesce("n_gram_hits", F.lit(0)).alias("n_gram_hits"),
            (F.coalesce("n_gram_hits", F.lit(0)) >= min_hits).alias("contaminated"),
        )
    )


def split_assign(
    df: DataFrame,
    id_col: str = "url",
    buckets: int = 100,
    train_lt: int = 98,
    val_lt: int = 99,
) -> DataFrame:
    """Deterministic train/val/test assignment by content-stable hash:
    bucket = h60(id) % buckets → train if < train_lt, val if < val_lt,
    else test.  Pure map-side column math — the split survives reshuffles,
    re-runs and cluster-size changes (never use rand() for this)."""
    b = F.pmod(TH.h60(F.col(id_col)), F.lit(buckets))
    split = (
        F.when(b < train_lt, "train").when(b < val_lt, "val").otherwise("test")
    )
    return df.withColumn("split", split)
