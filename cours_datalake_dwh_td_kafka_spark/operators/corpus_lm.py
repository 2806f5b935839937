"""Corpus-level language-model statistics for training-data curation
(BASELINE.json north star; course analog: the nltk frequency analyses in
work/requirements.txt:1-7): a unigram-LM log-probability quality score
(the classic "perplexity filter" in every pretraining pipeline, here
with the corpus itself as the LM) and corpus-wide top-bigram counts.

Both are pure built-in column algebra — explode-first tokenization (see
dedup.shingle_rows for why explode-FIRST), keyed aggregations, one
broadcast scalar row — zero Python UDFs, so they ride WholeStageCodegen
and scale linearly in corpus bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cours_datalake_dwh_td_kafka_spark.io import load_table
from cours_datalake_dwh_td_kafka_spark.operators.dedup import (
    NORM_SQL,
    norm_text,
    shingle_rows,
)
from cours_datalake_dwh_td_kafka_spark.registry import register

# ---------------------------------------------------------------------------
# unigram-LM average log-probability per document
# ---------------------------------------------------------------------------
_UNIGRAM_SQL = f"""
    WITH toks AS (
      SELECT doc_id, string_split({NORM_SQL.format(c='text')}, ' ') AS t
      FROM documents
    ),
    tf AS (
      SELECT doc_id, s AS tok, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest(t) AS s FROM toks)
      GROUP BY doc_id, s
    ),
    cnts AS (SELECT tok, SUM(tf) AS cnt FROM tf GROUP BY tok),
    tot AS (SELECT SUM(cnt) AS n_corpus FROM cnts)
    SELECT tf.doc_id,
           CAST(SUM(tf) AS BIGINT) AS n_tokens,
           ROUND(CAST(SUM(CAST(
                 tf * log2(cnt / CAST(n_corpus AS DOUBLE))
               AS DECIMAL(28,6))) AS DOUBLE) / SUM(tf), 6) AS avg_logprob
    FROM tf
    JOIN cnts USING (tok)
    CROSS JOIN tot
    GROUP BY tf.doc_id
    ORDER BY tf.doc_id
"""


def unigram_logprob(d: DataFrame) -> DataFrame:
    """Per-document mean log2 probability of its tokens under the
    corpus-wide unigram MLE — low scores flag boilerplate/rare-garbage
    docs, the standard perplexity-style quality filter with the corpus
    itself as the model (no token is unseen, so no smoothing term).

    Scale shape: tokens collapse to per-doc (doc, tok, tf) BEFORE the
    corpus join, so the token-keyed shuffle carries distinct-terms-per-
    doc rows, not every occurrence; the global count table derives from
    the same tf aggregate (one tokenization pass total); the corpus
    token total rides one broadcast scalar row. The tok join key is
    Zipf-skewed (stop words) — AQE skew-join splits the hot partitions,
    and tf-weighting means the hot rows are few-per-doc anyway.
    Per-term contributions are summed as DECIMAL(28,6) (repo-wide
    dec_sum discipline) so partial-agg order can't shift the round-6
    value."""
    toks = F.split(norm_text(F.col("text")), " ")
    tokd = d.select("doc_id", toks.alias("t"))
    tf = (
        tokd.select("doc_id", F.explode("t").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        # tf feeds the corpus count table AND the scoring join:
        # materialize once so the corpus tokenizes once, not thrice
        .localCheckpoint(eager=False)
    )
    cnts = tf.groupBy("tok").agg(F.sum("tf").alias("cnt"))
    tot = cnts.agg(F.sum("cnt").alias("n_corpus"))
    term = F.col("tf") * F.log2(
        F.col("cnt") / F.col("n_corpus").cast("double")
    )
    return (
        tf.join(cnts, "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_tokens"),
            F.round(
                F.sum(term.cast("decimal(28,6)")).cast("double")
                / F.sum("tf"),
                6,
            ).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


@register("unigram_logprob", _UNIGRAM_SQL)
def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    return unigram_logprob(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# corpus-wide top bigrams
# ---------------------------------------------------------------------------
BIGRAM_TOP_N = 30

_BIGRAM_SQL = f"""
    WITH toks AS (
      SELECT doc_id, string_split({NORM_SQL.format(c='text')}, ' ') AS t
      FROM documents
    ),
    bg AS (
      SELECT unnest(list_transform(
               generate_series(1, greatest(len(t) - 1, 1)),
               i -> array_to_string(t[i:i+1], ' ')
             )) AS bigram
      FROM toks
    )
    SELECT bigram, COUNT(*) AS cnt
    FROM bg
    GROUP BY bigram
    ORDER BY cnt DESC, bigram
    LIMIT {BIGRAM_TOP_N}
"""


def bigram_top_counts(d: DataFrame, top_n: int = BIGRAM_TOP_N) -> DataFrame:
    """Most frequent word bigrams across the corpus — the collocation
    table curation teams eyeball for boilerplate ("all rights
    reserved") and that n-gram LMs start from.

    Scale shape: explode-first bigram rows (linear per doc, see
    shingle_rows), map-side partial count, ONE shuffle on the bigram
    key, TakeOrderedAndProject top-n (no global sort). Occurrence
    counting keeps duplicates (distinct=False) — no per-doc dedup
    shuffle."""
    rows = shingle_rows(d, n=2, distinct=False)
    return (
        rows.groupBy(F.col("shingle").alias("bigram"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "bigram")
        .limit(top_n)
    )


@register("bigram_top_counts", _BIGRAM_SQL)
def q_bigram_top_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bigram_top_counts(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Zipf-law fit over the token frequency spectrum
# ---------------------------------------------------------------------------
ZIPF_TOP_N = 1000

_ZIPF_SQL = f"""
    WITH toks AS (
      SELECT string_split({NORM_SQL.format(c='text')}, ' ') AS t
      FROM documents
    ),
    cnts AS (
      SELECT s AS tok, COUNT(*) AS cnt
      FROM (SELECT unnest(t) AS s FROM toks)
      GROUP BY s
    ),
    top AS (
      SELECT tok, cnt FROM cnts ORDER BY cnt DESC, tok LIMIT {ZIPF_TOP_N}
    ),
    ranked AS (
      SELECT cnt,
             row_number() OVER (ORDER BY cnt DESC, tok) AS rnk
      FROM top
    )
    SELECT COUNT(*) AS n_terms,
           ROUND(regr_slope(ln(cnt), ln(rnk)), 6) AS zipf_slope,
           ROUND(regr_intercept(ln(cnt), ln(rnk)), 6) AS zipf_intercept,
           ROUND(regr_r2(ln(cnt), ln(rnk)), 6) AS zipf_r2
    FROM ranked
"""


def zipf_fit(d: DataFrame, top_n: int = ZIPF_TOP_N) -> DataFrame:
    """Least-squares fit of log(count) ~ log(rank) over the corpus's
    top-n token frequencies — the Zipf diagnostic curation teams use to
    spot synthetic/templated corpora (natural language sits near slope
    -1 with high R²; generated boilerplate bends the curve).

    Scale shape: token counts partial-aggregate map-side and shuffle
    once on the token key; the top-n is TakeOrderedAndProject (per-
    partition heaps), so the full vocabulary never sorts globally; only
    the n surviving rows pass through the single-partition rank window
    (bounded by the constant n, not the corpus). Fit uses the native
    regr_* aggregates (same discipline as user_value_trend,
    aggregates.py): double co-moments, rounded to 6 dp — far above the
    ~1e-13 partial-order noise at these magnitudes."""
    toks = F.split(norm_text(F.col("text")), " ")
    cnts = (
        d.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = cnts.orderBy(F.desc("cnt"), "tok").limit(top_n)
    w = Window.orderBy(F.desc("cnt"), "tok")
    ranked = top.select(
        "cnt", F.row_number().over(w).alias("rnk")
    )
    y, x = F.log(F.col("cnt")), F.log(F.col("rnk"))
    return ranked.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.round(F.regr_slope(y, x), 6).alias("zipf_slope"),
        F.round(F.regr_intercept(y, x), 6).alias("zipf_intercept"),
        F.round(F.regr_r2(y, x), 6).alias("zipf_r2"),
    )


@register("zipf_law_fit", _ZIPF_SQL)
def q_zipf_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return zipf_fit(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Heaps'-law vocabulary growth: V(n) ~ K * n^beta
# ---------------------------------------------------------------------------
_HEAPS_SQL = f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split({NORM_SQL.format(c='text')}, ' ')) AS tok
      FROM documents
    ),
    per_doc AS (
      SELECT doc_id, COUNT(*) AS n_toks FROM toks GROUP BY doc_id
    ),
    first_doc AS (
      SELECT tok, MIN(doc_id) AS fd FROM toks GROUP BY tok
    ),
    news AS (
      SELECT fd AS doc_id, COUNT(*) AS new_types FROM first_doc GROUP BY fd
    ),
    series AS (
      SELECT d.doc_id,
             SUM(d.n_toks) OVER (ORDER BY d.doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum_toks,
             SUM(COALESCE(n.new_types, 0)) OVER (ORDER BY d.doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum_vocab
      FROM per_doc d LEFT JOIN news n USING (doc_id)
    )
    SELECT COUNT(*) AS n_docs,
           CAST(MAX(cum_toks) AS BIGINT) AS n_tokens,
           CAST(MAX(cum_vocab) AS BIGINT) AS vocab_size,
           ROUND(regr_slope(ln(CAST(cum_vocab AS DOUBLE)),
                            ln(CAST(cum_toks AS DOUBLE))), 6) AS heaps_beta,
           ROUND(regr_intercept(ln(CAST(cum_vocab AS DOUBLE)),
                            ln(CAST(cum_toks AS DOUBLE))), 6)
             AS heaps_log_k,
           ROUND(regr_r2(ln(CAST(cum_vocab AS DOUBLE)),
                         ln(CAST(cum_toks AS DOUBLE))), 6) AS heaps_r2
    FROM series
"""


def heaps_law_fit(d: DataFrame) -> DataFrame:
    """Vocabulary-growth diagnostic: walk the corpus in doc_id order,
    accumulate (tokens seen, distinct types seen), and fit
    log V = log K + beta * log n (Heaps'/Herdan's law; beta ~ 0.5 for
    natural text). Together with :func:`zipf_law_fit` this is the
    corpus-health pair curation teams watch: a beta collapse means the
    feed started repeating itself — dedup upstream is failing.

    Scale shape: the cumulative-vocab trick is FIRST-OCCURRENCE
    attribution — a token contributes a type exactly at its MIN(doc_id)
    — so cumulative distinct never materializes running sets: two keyed
    aggregations (per-doc token counts, per-token first doc), a
    doc-keyed left join, two running integer sums over the doc spine
    (exact — no float order hazard), and one regr_* fit over
    docs-many points. The running sums use the two-phase prefix-sum
    recipe (``scale.prefix_sums``: range-bucket, broadcast per-bucket
    offsets, sum within buckets) — NO single-partition window, so the
    doc spine parallelizes at any corpus size."""
    from cours_datalake_dwh_td_kafka_spark.operators.scale import (
        prefix_sums,
    )

    toks = d.select(
        "doc_id", F.explode(F.split(norm_text(F.col("text")), " ")).alias("tok")
    ).localCheckpoint(eager=False)  # feeds both aggregations below
    per_doc = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_toks"))
    news = (
        toks.groupBy("tok")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("new_types"))
    )
    spine = per_doc.join(news, "doc_id", "left").select(
        "doc_id",
        "n_toks",
        F.coalesce(F.col("new_types"), F.lit(0)).alias("new_types"),
    )
    series = prefix_sums(
        spine, "doc_id", {"cum_toks": "n_toks", "cum_vocab": "new_types"}
    )
    y = F.ln(F.col("cum_vocab").cast("double"))
    x = F.ln(F.col("cum_toks").cast("double"))
    return series.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("cum_toks").cast("bigint").alias("n_tokens"),
        F.max("cum_vocab").cast("bigint").alias("vocab_size"),
        F.round(F.regr_slope(y, x), 6).alias("heaps_beta"),
        F.round(F.regr_intercept(y, x), 6).alias("heaps_log_k"),
        F.round(F.regr_r2(y, x), 6).alias("heaps_r2"),
    )


@register("heaps_law_fit", _HEAPS_SQL)
def q_heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return heaps_law_fit(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# vocabulary coverage curve: what share of corpus tokens the top-V types cover
# ---------------------------------------------------------------------------
VOCAB_SIZES = (10, 30, 100)

_COVERAGE_SQL = f"""
    WITH toks AS (
      SELECT unnest(string_split({NORM_SQL.format(c='text')}, ' ')) AS tok
      FROM documents
    ),
    freq AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
    tot AS (SELECT SUM(cnt) AS n_corpus FROM freq),
    ranked AS (
      SELECT cnt,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS rnk,
             SUM(cnt) OVER (ORDER BY cnt DESC, tok
                            ROWS UNBOUNDED PRECEDING) AS cum
      FROM freq
    )
    SELECT v.vocab_size,
           CAST(MAX(CASE WHEN rnk <= v.vocab_size THEN cum END)
                AS BIGINT) AS covered_tokens,
           ROUND(CAST(MAX(CASE WHEN rnk <= v.vocab_size THEN cum END)
                      AS DOUBLE) / MAX(n_corpus), 6) AS coverage
    FROM ranked
    CROSS JOIN tot
    CROSS JOIN (VALUES {", ".join(f"({v})" for v in VOCAB_SIZES)})
      AS v(vocab_size)
    GROUP BY v.vocab_size
    ORDER BY v.vocab_size
"""


def vocab_coverage(
    d: DataFrame, sizes: tuple[int, ...] = VOCAB_SIZES
) -> DataFrame:
    """Token-coverage curve: for each candidate vocabulary size V, the
    fraction of all corpus tokens covered by the V most frequent types
    (count-desc, tok tiebreak) — the first number a tokenizer team asks
    for when sizing a vocab against a new corpus.

    Scale shape: ONE tokenization -> type-frequency table, then
    limit-first (TakeOrderedAndProject per-partition heaps) down to the
    max(sizes) most frequent types BEFORE any window — coverage is only
    ever read at rnk <= max(sizes), so the rank/cumsum window runs over
    a constant-bounded input (max(sizes) rows), never the full
    vocabulary (which is ~1e8+ types at 100 TB by Heaps' law). The
    corpus total is a separate full-freq aggregate riding one broadcast
    scalar row. Integer counts -> exact cumulative sums; one divide +
    round at output."""
    toks = d.select(
        F.explode(F.split(norm_text(F.col("text")), " ")).alias("tok")
    )
    freq = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        # feeds the rank window AND the corpus total: materialize once
        # so the corpus-scale tokenization doesn't execute twice
        .localCheckpoint(eager=False)
    )
    tot = freq.agg(F.sum("cnt").alias("n_corpus"))
    # limit-first (zipf pattern): bound the window input by the constant
    # max(sizes) so the full vocabulary never funnels into one task
    top = freq.orderBy(F.desc("cnt"), "tok").limit(max(sizes))
    w = Window.orderBy(F.desc("cnt"), "tok")
    cum = Window.orderBy(F.desc("cnt"), "tok").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = top.select(
        F.row_number().over(w).alias("rnk"),
        F.sum("cnt").over(cum).alias("cum"),
    )
    sizes_df = d.sparkSession.createDataFrame(
        [(v,) for v in sizes], "vocab_size INT"
    )
    return (
        ranked.crossJoin(F.broadcast(sizes_df))
        .crossJoin(F.broadcast(tot))
        .groupBy("vocab_size")
        .agg(
            F.max(
                F.when(F.col("rnk") <= F.col("vocab_size"), F.col("cum"))
            )
            .cast("bigint")
            .alias("covered_tokens"),
            F.round(
                F.max(
                    F.when(
                        F.col("rnk") <= F.col("vocab_size"), F.col("cum")
                    )
                ).cast("double")
                / F.max("n_corpus"),
                6,
            ).alias("coverage"),
        )
        .orderBy("vocab_size")
    )


@register("vocab_coverage", _COVERAGE_SQL)
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    return vocab_coverage(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# bigram-LM document scoring with unigram interpolation (backoff)
# ---------------------------------------------------------------------------
_BIGRAM_LAMBDA = 0.8  # interpolation weight on the bigram term

_BIGRAM_LP_SQL = f"""
    WITH toks AS (
      SELECT doc_id, string_split({NORM_SQL.format(c='text')}, ' ') AS t
      FROM documents
    ),
    uni AS (
      SELECT s AS tok, COUNT(*) AS c1
      FROM (SELECT unnest(t) AS s FROM toks)
      GROUP BY s
    ),
    tot AS (SELECT SUM(c1) AS n_corpus FROM uni),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(
               generate_series(1, greatest(len(t) - 1, 1)),
               i -> struct_pack(w1 := t[i], w2 := t[i + 1])
             )) AS p
      FROM toks
      WHERE len(t) >= 2
    ),
    bgf AS (
      SELECT doc_id, p.w1 AS w1, p.w2 AS w2, COUNT(*) AS tf
      FROM bg GROUP BY doc_id, p.w1, p.w2
    ),
    big AS (
      SELECT w1, w2, SUM(tf) AS c2 FROM bgf GROUP BY w1, w2
    )
    SELECT bgf.doc_id,
           CAST(SUM(tf) AS BIGINT) AS n_bigrams,
           ROUND(CAST(SUM(CAST(
             tf * log2({_BIGRAM_LAMBDA} * c2 / CAST(u1.c1 AS DOUBLE)
                       + {1.0 - _BIGRAM_LAMBDA} * u2.c1
                         / CAST(n_corpus AS DOUBLE))
           AS DECIMAL(28,6))) AS DOUBLE) / SUM(tf), 6) AS avg_logprob
    FROM bgf
    JOIN big USING (w1, w2)
    JOIN uni u1 ON u1.tok = bgf.w1
    JOIN uni u2 ON u2.tok = bgf.w2
    CROSS JOIN tot
    GROUP BY bgf.doc_id
    ORDER BY bgf.doc_id
"""


def bigram_logprob(
    d: DataFrame, lam: float = _BIGRAM_LAMBDA
) -> DataFrame:
    """Per-document mean log2 probability under an INTERPOLATED bigram
    LM: p(w2|w1) = lam * c(w1 w2)/c(w1) + (1-lam) * c(w2)/N. The
    context-aware upgrade of :func:`unigram_logprob` — a doc of real
    words in scrambled order scores high on unigrams but low here,
    which is exactly the shuffled-boilerplate signature a perplexity
    filter wants to catch. Interpolation (Jelinek-Mercer) keeps every
    bigram in-vocabulary without the zero-probability cliff.

    Scale shape: bigrams collapse to per-doc (w1, w2, tf) BEFORE any
    corpus join (the unigram_logprob discipline); the corpus bigram
    table derives from the same aggregate; two unigram joins ride the
    token key (Zipf-skewed -> AQE skew-join); one broadcast scalar.
    Per-term contributions round through DECIMAL(28,6) so partial-agg
    order cannot move the mean."""
    toks = F.split(norm_text(F.col("text")), " ")
    pairs = (
        d.select("doc_id", toks.alias("t"))
        .where(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0), F.size("t") - 2)
            ).alias("i"),
            "t",
        )
        .select(
            "doc_id",
            F.col("t")[F.col("i")].alias("w1"),
            F.col("t")[F.col("i") + 1].alias("w2"),
        )
    )
    bgf = (
        pairs.groupBy("doc_id", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)  # feeds corpus table + scoring
    )
    big = bgf.groupBy("w1", "w2").agg(F.sum("tf").alias("c2"))
    toks_flat = d.select(
        F.explode(F.split(norm_text(F.col("text")), " ")).alias("tok")
    )
    uni = toks_flat.groupBy("tok").agg(
        F.count(F.lit(1)).alias("c1")
    ).localCheckpoint(eager=False)  # joined twice + totalled
    tot = uni.agg(F.sum("c1").alias("n_corpus"))
    u1 = uni.select(F.col("tok").alias("w1"), F.col("c1").alias("c1_w1"))
    u2 = uni.select(F.col("tok").alias("w2"), F.col("c1").alias("c1_w2"))
    term = F.col("tf") * F.log2(
        F.lit(lam) * F.col("c2") / F.col("c1_w1").cast("double")
        + F.lit(1.0 - lam)
        * F.col("c1_w2")
        / F.col("n_corpus").cast("double")
    )
    return (
        bgf.join(big, ["w1", "w2"])
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_bigrams"),
            F.round(
                F.sum(term.cast("decimal(28,6)")).cast("double")
                / F.sum("tf"),
                6,
            ).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


@register("bigram_logprob", _BIGRAM_LP_SQL)
def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bigram_logprob(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# beyond-ref: per-source unigram KL divergence vs the corpus LM
# ---------------------------------------------------------------------------
_KL_SQL = f"""
    WITH toks AS (
      SELECT source,
             unnest(string_split({NORM_SQL.format(c='text')}, ' ')) AS tok
      FROM documents
    ),
    sc AS (
      SELECT source, tok, COUNT(*) AS c FROM toks GROUP BY source, tok
    ),
    stot AS (SELECT source, SUM(c) AS ns FROM sc GROUP BY source),
    corpus AS (SELECT tok, SUM(c) AS cc FROM sc GROUP BY tok),
    ctot AS (SELECT SUM(cc) AS n FROM corpus)
    SELECT sc.source,
           CAST(stot.ns AS BIGINT) AS n_tokens,
           ROUND(CAST(SUM(CAST(
               (sc.c / CAST(stot.ns AS DOUBLE))
               * log2((sc.c / CAST(stot.ns AS DOUBLE))
                      / (corpus.cc / CAST(ctot.n AS DOUBLE)))
             AS DECIMAL(28,6))) AS DOUBLE), 6) AS kl_bits
    FROM sc
    JOIN stot USING (source)
    JOIN corpus USING (tok)
    CROSS JOIN ctot
    GROUP BY sc.source, stot.ns
    ORDER BY sc.source
"""


def source_kl_divergence(d: DataFrame) -> DataFrame:
    """KL(source-unigram || corpus-unigram) in bits, per feed — the
    domain-shift number a mixing pipeline watches: a source whose KL
    spikes changed its content distribution (new crawl seed, template
    rot) and should trigger re-weighting (domain_mix_weights is the
    actuator; this is the sensor). No smoothing needed: every source
    term exists in the corpus distribution by construction, so the
    ratio is always finite and KL >= 0.

    Scale shape: tokens collapse to (source, tok, count) FIRST (the
    unigram_logprob discipline — the tok-keyed join carries distinct
    terms per source, not occurrences), the corpus table derives from
    the SAME aggregate (one tokenization), and the corpus total rides a
    broadcast scalar. Per-term contributions round through
    DECIMAL(28,6) before summing, so partial order cannot move the
    6-dp result (proven cross-engine by the unigram/zipf family)."""
    toks = F.split(norm_text(F.col("text")), " ")
    sc = (
        d.select("source", F.explode(toks).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)  # feeds source, corpus, and total
    )
    stot = sc.groupBy("source").agg(F.sum("c").alias("ns"))
    corpus = sc.groupBy("tok").agg(F.sum("c").alias("cc"))
    ctot = corpus.agg(F.sum("cc").alias("n"))
    p = F.col("c") / F.col("ns").cast("double")
    q = F.col("cc") / F.col("n").cast("double")
    contrib = (p * F.log2(p / q)).cast("decimal(28,6)")
    return (
        sc.join(stot, "source")
        .join(corpus, "tok")
        .crossJoin(F.broadcast(ctot))
        .groupBy("source", "ns")
        .agg(
            F.round(F.sum(contrib).cast("double"), 6).alias("kl_bits")
        )
        .select(
            "source",
            F.col("ns").cast("bigint").alias("n_tokens"),
            "kl_bits",
        )
        .orderBy("source")
    )


@register("source_kl_divergence", _KL_SQL)
def q_source_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    return source_kl_divergence(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# PMI collocations: the statistically-bound word pairs (not just frequent)
# ---------------------------------------------------------------------------
PMI_TOP_N = 30
PMI_MIN_COUNT = 5

_PMI_SQL = f"""
    WITH toks AS (
      SELECT doc_id, string_split({{norm}}, ' ') AS t
      FROM documents
    ),
    uni AS (
      SELECT s AS tok, COUNT(*) AS cnt
      FROM (SELECT unnest(t) AS s FROM toks)
      GROUP BY s
    ),
    nu AS (SELECT SUM(cnt) AS n_uni FROM uni),
    bg AS (
      SELECT unnest(list_transform(
               generate_series(1, greatest(len(t) - 1, 1)),
               i -> array_to_string(t[i:i+1], ' ')
             )) AS bigram
      FROM toks
    ),
    bgc AS (
      SELECT bigram, COUNT(*) AS cnt,
             string_split(bigram, ' ')[1] AS w1,
             string_split(bigram, ' ')[2] AS w2
      FROM bg
      GROUP BY bigram
      HAVING len(string_split(bigram, ' ')) = 2
    ),
    nb AS (SELECT SUM(cnt) AS n_bi FROM bgc),
    scored AS (
      SELECT c.bigram, c.cnt,
             ROUND(log2((c.cnt / CAST(n_bi AS DOUBLE))
                   / ((u1.cnt / CAST(n_uni AS DOUBLE))
                      * (u2.cnt / CAST(n_uni AS DOUBLE)))), 6) AS pmi
      FROM bgc c
      JOIN uni u1 ON c.w1 = u1.tok
      JOIN uni u2 ON c.w2 = u2.tok
      CROSS JOIN nu CROSS JOIN nb
      WHERE c.cnt >= {PMI_MIN_COUNT}
    )
    SELECT bigram, CAST(cnt AS BIGINT) AS cnt, pmi
    FROM scored
    ORDER BY pmi DESC, bigram
    LIMIT {PMI_TOP_N}
""".format(norm=NORM_SQL.format(c="text"))


def pmi_collocations(
    d: DataFrame,
    top_n: int = PMI_TOP_N,
    min_count: int = PMI_MIN_COUNT,
) -> DataFrame:
    """Top word pairs by pointwise mutual information,
    pmi = log2(p(ab) / (p(a) p(b))) — the collocation measure that
    surfaces STATISTICALLY bound pairs ("los angeles") rather than
    merely frequent ones ("of the"), the classic phrase-mining signal
    (Church & Hanks 1990) a tokenizer/phrase vocabulary is seeded from.
    ``min_count`` guards the estimator: PMI of a hapax pair is pure
    noise (it maximizes PMI by construction), so rare pairs are dropped
    BEFORE scoring, which also collapses the Zipf-tail candidate set to
    a sliver of the bigram vocabulary.

    Scale shape: ONE tokenization feeds both tables (unigram counts
    pinned via localCheckpoint — three consumers: total + two join
    probes); bigrams are explode-first rows (shingle_rows) partially
    aggregated map-side; the min-count filter lands before the two
    tok-keyed joins; totals ride broadcast scalar rows; the final top-n
    is limit-first (TakeOrderedAndProject on the ROUNDED score, bigram
    tiebreak — the repo's cross-engine ranking discipline)."""
    toks = F.split(norm_text(F.col("text")), " ")
    uni = (
        d.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("u_cnt"))
        .localCheckpoint(eager=False)  # total + w1 probe + w2 probe
    )
    n_uni = uni.agg(F.sum("u_cnt").alias("n_uni"))
    bgc = (
        shingle_rows(d, n=2, distinct=False)
        .groupBy(F.col("shingle").alias("bigram"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("parts", F.split("bigram", " "))
        .where(F.size("parts") == 2)  # 1-token docs yield degenerates
        .select(
            "bigram",
            "cnt",
            F.col("parts")[0].alias("w1"),
            F.col("parts")[1].alias("w2"),
        )
        .localCheckpoint(eager=False)  # feeds the total AND the scorer
    )
    n_bi = bgc.agg(F.sum("cnt").alias("n_bi"))
    u1 = uni.select(F.col("tok").alias("w1"), F.col("u_cnt").alias("c1"))
    u2 = uni.select(F.col("tok").alias("w2"), F.col("u_cnt").alias("c2"))
    scored = (
        bgc.where(F.col("cnt") >= min_count)
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
        .select(
            "bigram",
            F.col("cnt").cast("bigint").alias("cnt"),
            F.round(
                F.log2(
                    (F.col("cnt") / F.col("n_bi").cast("double"))
                    / (
                        (F.col("c1") / F.col("n_uni").cast("double"))
                        * (F.col("c2") / F.col("n_uni").cast("double"))
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), "bigram").limit(top_n)


@register("pmi_collocations", _PMI_SQL)
def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pmi_collocations(load_table(spark, sf_dir, "documents"))
