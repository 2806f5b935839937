"""Scale-technique tests: salting correctness + spread, bucketed joins
eliminating the shuffle (plan-verified)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cours_datalake_dwh_td_kafka_spark import registry
from cours_datalake_dwh_td_kafka_spark.io import load_table
from cours_datalake_dwh_td_kafka_spark.operators.scale import (
    N_SALTS,
    salted_agg,
    salted_join,
    write_bucketed,
)
from cours_datalake_dwh_td_kafka_spark.plans.inspect import plan_facts
from tests.conftest import SF_ORACLE, SF_SMOKE


def test_salted_agg_equals_plain(spark):
    e = load_table(spark, SF_ORACLE, "events")
    plain = {
        r.event_type: (r.n, round(r.s, 2))
        for r in e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("s"),
        )
        .collect()
    }
    salted = {
        r.event_type: (r.n_rows, r.sum_value)
        for r in salted_agg(e, "event_type", "value").collect()
    }
    assert salted == plain


def test_salt_actually_spreads_hot_key(spark):
    """The phase-1 partials for one key must land in many salt buckets —
    otherwise the operator silently degenerated to the skewed plan.
    Uses the operator's own salt expression, not a re-derivation."""
    from cours_datalake_dwh_td_kafka_spark.operators.scale import salt_expr

    e = load_table(spark, SF_ORACLE, "events")
    salted = e.withColumn("_salt", salt_expr())
    spread = (
        salted.groupBy("event_type")
        .agg(F.countDistinct("_salt").alias("n_buckets"))
        .collect()
    )
    assert all(r.n_buckets >= N_SALTS // 2 for r in spread)


def test_salt_spreads_constant_value_hot_key(spark):
    """The motivating skew case: one hot key whose rows all carry the SAME
    value (a constant-value spammer). A value-derived salt collapses this
    onto one bucket; the row-unique salt must still spread it."""
    from cours_datalake_dwh_td_kafka_spark.operators.scale import (
        salt_expr,
        salted_agg,
    )

    hot = spark.range(10_000).select(
        F.lit("hot").alias("k"), F.lit(42).cast("bigint").alias("v")
    )
    cold = spark.range(100).select(
        F.lit("cold").alias("k"), (F.col("id") % 7).alias("v")
    )
    df = hot.unionAll(cold)
    spread = (
        df.withColumn("_salt", salt_expr())
        .where(F.col("k") == "hot")
        .select(F.countDistinct("_salt").alias("n"))
        .collect()[0]
        .n
    )
    assert spread >= N_SALTS // 2

    got = {
        r.k: (r.n_rows, r.sum_value, r.min_value, r.max_value)
        for r in salted_agg(df, key="k", value="v").collect()
    }
    assert got["hot"] == (10_000, 420_000.0, 42, 42)
    assert got["cold"][0] == 100


def test_salted_join_equals_plain(spark):
    e = load_table(spark, SF_ORACLE, "events").select("event_id", "event_type", "value")
    m = spark.createDataFrame(
        [("click", 1.0), ("view", 0.5), ("purchase", 10.0), ("scroll", 0.1)],
        "event_type STRING, weight DOUBLE",
    )
    plain = e.join(m, "event_type").count()
    salted = salted_join(e, m, "event_type").count()
    assert salted == plain


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Both sides bucketed on the key -> the join plan contains ZERO
    exchanges; dropping bucketing on one side brings the shuffle back.
    (warehouse.dir is a static conf, so the tables land in the default
    spark-warehouse and are dropped at the end.)"""
    o = load_table(spark, SF_ORACLE, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = load_table(spark, SF_ORACLE, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    try:
        write_bucketed(o, "bt_orders", "o_orderkey")
        write_bucketed(
            li.withColumnRenamed("l_orderkey", "o_orderkey"),
            "bt_lineitem",
            "o_orderkey",
        )

        a = spark.table("bt_orders")
        b = spark.table("bt_lineitem")
        # disable auto-broadcast so the test exercises the co-located
        # path, not a broadcast that would hide a missing bucket join
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = a.join(b, "o_orderkey")
        f = plan_facts(joined)
        assert f.n_shuffles == 0, "bucketed join must not shuffle"
        assert joined.count() > 0

        # control: bucketed x unbucketed shuffles at least one side
        unbucketed = li.withColumnRenamed("l_orderkey", "o_orderkey")
        f2 = plan_facts(a.join(unbucketed, "o_orderkey"))
        assert f2.n_shuffles >= 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        spark.sql("DROP TABLE IF EXISTS bt_orders")
        spark.sql("DROP TABLE IF EXISTS bt_lineitem")


def test_range_join_bucketed_equals_nlj(spark):
    """The bucketed equi-join rewrite of the interval join must return
    exactly the NLJ's rows (same band per order), including the
    open-ended top band that the rewrite clamps to _HI_CLAMP buckets."""
    from cours_datalake_dwh_td_kafka_spark.operators.joins_advanced import (
        _BANDS,
        range_join_bucketed,
        range_join_nlj,
    )

    o = load_table(spark, SF_ORACLE, "orders").select("o_orderkey", "o_totalprice")
    bands = spark.createDataFrame(_BANDS, "band STRING, lo DOUBLE, hi DOUBLE")
    nlj = sorted(
        map(tuple, range_join_nlj(o, bands).select("o_orderkey", "band").collect())
    )
    bkt = sorted(
        map(
            tuple,
            range_join_bucketed(o, bands).select("o_orderkey", "band").collect(),
        )
    )
    assert nlj == bkt
    assert len(nlj) == o.count()  # bands partition the price domain


def test_dense_ids_invariant_to_bucket_count(spark):
    """Surrogate keys must be a pure function of the data: the same
    gap-free 1..N assignment whatever the bucket count (including the
    degenerate single-bucket = plain global window case), because
    range buckets are contiguous in key order."""
    from cours_datalake_dwh_td_kafka_spark.operators.scale import dense_ids

    c = load_table(spark, SF_ORACLE, "customer").select("c_custkey")
    ref = sorted(
        map(tuple, dense_ids(c, "c_custkey", 1).select("sk", "c_custkey").collect())
    )
    n = c.count()
    assert [r[0] for r in ref] == list(range(1, n + 1))  # gap-free 1..N
    for buckets in (7, 32):
        got = sorted(
            map(
                tuple,
                dense_ids(c, "c_custkey", buckets)
                .select("sk", "c_custkey")
                .collect(),
            )
        )
        assert got == ref, f"ids changed with n_buckets={buckets}"


def test_prefix_sums_invariant_to_bucket_count(spark):
    """prefix_sums must equal the single-partition global running sum
    for ANY bucket count (1, fewer-rows-than-buckets, many) — the
    two-phase offsets cannot depend on where the range bounds fall."""
    from pyspark.sql import Window as W

    from cours_datalake_dwh_td_kafka_spark.io import load_table
    from cours_datalake_dwh_td_kafka_spark.operators.scale import (
        prefix_sums,
    )

    c = (
        load_table(spark, "/root/testdata/sf0.001", "customer")
        .select(
            "c_custkey",
            (F.col("c_custkey") % 7).alias("a"),
            (F.col("c_custkey") % 3).alias("b"),
        )
    )
    w = W.orderBy("c_custkey").rowsBetween(W.unboundedPreceding, 0)
    want = {
        (r.c_custkey, r.ca, r.cb)
        for r in c.select(
            "c_custkey",
            F.sum("a").over(w).alias("ca"),
            F.sum("b").over(w).alias("cb"),
        ).collect()
    }
    for buckets in (1, 4, 16, 100_000):
        got = {
            (r.c_custkey, r.cum_a, r.cum_b)
            for r in prefix_sums(
                c, "c_custkey", {"cum_a": "a", "cum_b": "b"}, buckets
            ).collect()
        }
        assert got == want, f"buckets={buckets}"


def test_prefix_min_invariant_to_bucket_count(spark):
    """prefix_min must equal the single-partition global EXCLUSIVE
    running min for ANY bucket count (1, fewer-rows-than-buckets,
    many) — including the NULL prefix on the first row."""
    from pyspark.sql import Window as W

    from cours_datalake_dwh_td_kafka_spark.io import load_table
    from cours_datalake_dwh_td_kafka_spark.operators.scale import (
        prefix_min,
    )

    c = load_table(spark, "/root/testdata/sf0.001", "customer").select(
        "c_custkey",
        ((F.col("c_custkey") * 37) % 101).alias("a"),
    )
    w = W.orderBy("c_custkey").rowsBetween(W.unboundedPreceding, -1)
    want = {
        (r.c_custkey, r.m)
        for r in c.select(
            "c_custkey", F.min("a").over(w).alias("m")
        ).collect()
    }
    for buckets in (1, 4, 16, 100_000):
        got = {
            (r.c_custkey, r.prev_min)
            for r in prefix_min(
                c, "c_custkey", {"prev_min": "a"}, n_buckets=buckets
            ).collect()
        }
        assert got == want, f"n_buckets={buckets}"


def test_keyed_prefix_sums_invariant_to_bucket_count(spark):
    """partition_cols mode (the doc_pack rewrite): prefix_sums keyed by
    a low-cardinality column must equal the plain keyed running window
    for ANY bucket count — the per-group offsets cannot depend on where
    the range bounds fall or how many groups share a bucket."""
    from pyspark.sql import Window as W

    from cours_datalake_dwh_td_kafka_spark.operators.scale import (
        prefix_sums,
    )

    c = load_table(spark, "/root/testdata/sf0.001", "customer").select(
        "c_custkey",
        (F.col("c_custkey") % 4).cast("string").alias("grp"),
        (F.col("c_custkey") % 7).alias("a"),
    )
    w = (
        W.partitionBy("grp")
        .orderBy("c_custkey")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    want = {
        (r.c_custkey, r.ca)
        for r in c.select(
            "c_custkey", F.sum("a").over(w).alias("ca")
        ).collect()
    }
    for buckets in (1, 3, 16, 100_000):
        got = {
            (r.c_custkey, r.ca)
            for r in prefix_sums(
                c, "c_custkey", {"ca": "a"}, buckets, partition_cols=("grp",)
            ).collect()
        }
        assert got == want, f"buckets={buckets}"


def test_keyed_dense_ids_invariant_to_bucket_count(spark):
    """partition_cols + composite order mode (the equi-depth rewrite):
    per-group ROW_NUMBER over a composite key must equal the plain
    keyed window for ANY bucket count."""
    from pyspark.sql import Window as W

    from cours_datalake_dwh_td_kafka_spark.operators.scale import dense_ids

    c = load_table(spark, "/root/testdata/sf0.001", "customer").select(
        "c_custkey",
        (F.col("c_custkey") % 3).cast("string").alias("grp"),
        (F.col("c_custkey") * 37 % 11).alias("v"),
    )
    w = W.partitionBy("grp").orderBy("v", "c_custkey")
    want = {
        (r.c_custkey, r.rn)
        for r in c.select(
            "c_custkey", F.row_number().over(w).alias("rn")
        ).collect()
    }
    for buckets in (1, 5, 64):
        got = {
            (r.c_custkey, r.sk)
            for r in dense_ids(
                c, ("v", "c_custkey"), buckets, partition_cols=("grp",)
            ).collect()
        }
        assert got == want, f"buckets={buckets}"


def test_doc_pack_parallelism_grows_with_input_partitions(spark):
    """The round-8 verdict fix, pinned: doc_pack's per-source packing
    cumsum must run its doc_id-ordered windows partitioned by the range
    BUCKET (parallelism = bucket count, which tracks input partitions
    via _adaptive_buckets), never by bare source (parallelism =
    n_sources forever). Same plan-shape pin as the heaps_law_fit gate,
    plus the bucket-count growth itself."""
    from cours_datalake_dwh_td_kafka_spark.operators.curation import (
        pack_documents,
    )
    from cours_datalake_dwh_td_kafka_spark.operators.scale import (
        _adaptive_buckets,
    )
    from cours_datalake_dwh_td_kafka_spark.plans.inspect import (
        physical_plan,
    )

    d = load_table(spark, SF_ORACLE, "documents")
    for line in physical_plan(pack_documents(d)).splitlines():
        if "Window [" in line and "doc_id" in line and "ASC" in line:
            assert "_bucket" in line, f"per-source serialized window:\n{line}"
    # the bucket count the kernel would use grows with input splits
    sized = d.select("doc_id", "source", "n_chars")
    assert _adaptive_buckets(sized.repartition(256)) >= 256


def test_adaptive_buckets_scale_with_input_partitions(spark):
    """The default bucket count of the prefix kernels must GROW with the
    input's partitioning (the round-7 audit flagged a fixed 16-bucket
    cap as the last data-independent parallelism ceiling): a 256-split
    scan gets >=256 buckets, while tiny inputs keep the _SK_BUCKETS
    floor so the kernels never degenerate to one reducer."""
    from cours_datalake_dwh_td_kafka_spark.operators.scale import (
        _SK_BUCKETS,
        _adaptive_buckets,
    )

    c = load_table(spark, SF_ORACLE, "customer").select("c_custkey")
    wide = c.repartition(256)
    assert _adaptive_buckets(wide) >= 256
    narrow = c.coalesce(1)
    assert _adaptive_buckets(narrow) == _SK_BUCKETS
    # the default path (n_buckets=None) stays correct on a wide input:
    from cours_datalake_dwh_td_kafka_spark.operators.scale import dense_ids

    n = c.count()
    sks = [r.sk for r in dense_ids(wide, "c_custkey").select("sk").collect()]
    assert sorted(sks) == list(range(1, n + 1))


# ---------------------------------------------------------------------------
# round-10: the cross-run near-dup gate's corpus-side work must be
# candidate/persistence-bounded (the r9 verdict's last 100 TB scale-killer)
# ---------------------------------------------------------------------------
def _gate_fixture(spark):
    rows = [
        (i, " ".join(f"c{i}w{j}" for j in range(12))) for i in range(40)
    ]
    corpus = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    inc = spark.createDataFrame(
        [
            (100, rows[5][1] + " tail"),
            (101, " ".join(f"novel{j}" for j in range(12))),
        ],
        "doc_id BIGINT, text STRING",
    )
    return corpus, inc


def test_incremental_gate_corpus_side_candidate_bounded(spark, monkeypatch):
    """incremental_near_dups must shingle only band-candidate corpus
    docs on the verify side — per-increment corpus-side text work is
    O(candidates), never O(corpus). Pinned by counting the docs each
    _doc_shingles call actually receives (the doc_pack-parallelism
    pattern applied to the gate)."""
    from cours_datalake_dwh_td_kafka_spark.operators import dedup

    corpus, inc = _gate_fixture(spark)
    shingled_doc_counts = []
    orig = dedup._doc_shingles

    def spy(df):
        out = orig(df)
        shingled_doc_counts.append(out.select("doc_id").distinct().count())
        return out

    monkeypatch.setattr(dedup, "_doc_shingles", spy)
    got = dedup.incremental_near_dups(corpus, inc).collect()
    assert {(r.inc_doc, r.corpus_doc) for r in got} == {(100, 5)}
    # call 0 shingles the increment (2 docs); call 1 shingles the
    # corpus VERIFY side — the band candidates only, far below the
    # 40-doc corpus (distinct token universes, so no chance collisions)
    assert shingled_doc_counts[0] == 2
    assert 1 <= shingled_doc_counts[1] <= 3, shingled_doc_counts


def test_incremental_gate_reads_persisted_bands_not_text(spark):
    """With a persisted band table supplied, the table is AUTHORITATIVE:
    a corpus doc whose band rows are absent cannot be flagged, proving
    the gate never silently falls back to re-banding the corpus text."""
    from cours_datalake_dwh_td_kafka_spark.operators import dedup

    corpus, inc = _gate_fixture(spark)
    bands = dedup.minhash_band_rows(corpus).localCheckpoint()
    full = dedup.incremental_near_dups(
        corpus, inc, corpus_bands=bands
    ).collect()
    assert {(r.inc_doc, r.corpus_doc) for r in full} == {(100, 5)}
    pruned = dedup.incremental_near_dups(
        corpus, inc, corpus_bands=bands.where("doc_id <> 5")
    ).collect()
    assert pruned == []


def test_minhash_band_rows_match_signature_path(spark):
    """The persistable band builder equals the signature->bands batch
    path row-for-row (the two must never drift, or a persisted table
    stops matching fresh increments)."""
    from cours_datalake_dwh_td_kafka_spark.operators import dedup

    corpus, _ = _gate_fixture(spark)
    a = dedup.minhash_band_rows(corpus)
    b = dedup._band_rows(dedup.minhash_signature(corpus))
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0


def test_incremental_exact_dedup_reads_persisted_fps_not_text(spark):
    """r11 (verdict #1): with a persisted (doc_id, fp) table supplied,
    incremental_new_docs never touches the corpus — corpus=None is
    legal, structurally proving zero survivor-text reads — and the
    table is AUTHORITATIVE (a doc absent from it cannot dedup the
    increment)."""
    import pytest

    from cours_datalake_dwh_td_kafka_spark.operators import dedup

    rows = [
        (i, "s", "en", 20, " ".join(f"c{i}w{j}" for j in range(12)))
        for i in range(10)
    ]
    schema = "doc_id BIGINT, source STRING, lang STRING, n_chars INT, text STRING"
    corpus = spark.createDataFrame(rows, schema)
    inc = spark.createDataFrame(
        [(100, "s", "en", 20, rows[5][4]),      # exact dup of doc 5
         (101, "s", "en", 20, "totally new words here")],
        schema,
    )
    fps = dedup.fingerprint_rows(corpus).localCheckpoint()
    got = dedup.incremental_new_docs(None, inc, corpus_fps=fps).collect()
    assert [r.doc_id for r in got] == [101]
    # authoritative: drop doc 5's fp row and the dup sails through
    got2 = dedup.incremental_new_docs(
        None, inc, corpus_fps=fps.where("doc_id <> 5")
    ).collect()
    assert [r.doc_id for r in got2] == [100, 101]
    with pytest.raises(ValueError, match="corpus or corpus_fps"):
        dedup.incremental_new_docs(None, inc)


def test_corpus_refresh_attest_false_text_work_is_increment_bounded(
    spark, monkeypatch, tmp_path
):
    """r11 (verdict #1): the deployable refresh call (attest=False)
    must hash corpus TEXT only at the v1 bootstrap — every later
    fingerprint_rows / minhash_band_rows / postings_rows / doclen_rows
    call covers the increment only, and the attestation recomputes
    never run. Pinned by spying on every text-hashing entry point (the
    shingle-spy pattern of
    test_incremental_gate_corpus_side_candidate_bounded)."""
    from cours_datalake_dwh_td_kafka_spark.io import load_table
    from cours_datalake_dwh_td_kafka_spark.operators import refresh, text_index

    d = load_table(spark, SF_SMOKE, "documents")
    e = load_table(spark, SF_SMOKE, "embeddings")

    calls: list[tuple[str, int]] = []
    orig_fp, orig_bands = refresh.fingerprint_rows, refresh.minhash_band_rows
    orig_post, orig_dl = text_index.postings_rows, text_index.doclen_rows

    def _spy(name, orig):
        def run(df):
            calls.append((name, df.select("doc_id").distinct().count()))
            return orig(df)

        return run

    monkeypatch.setattr(refresh, "fingerprint_rows", _spy("fp", orig_fp))
    monkeypatch.setattr(
        refresh, "minhash_band_rows", _spy("bands", orig_bands)
    )
    monkeypatch.setattr(
        text_index, "postings_rows", _spy("post", orig_post)
    )
    monkeypatch.setattr(text_index, "doclen_rows", _spy("dl", orig_dl))
    row = refresh.corpus_refresh(
        spark, d, e, str(tmp_path / "w"), attest=False
    ).collect()[0]
    assert row.no_dup_ok and row.bands_table_ok and row.fps_table_ok
    assert row.text_index_serves_ok
    n_kept, n_inserted = row.n_corpus_kept, row.n_inserted
    # exactly 8 calls: the bootstrap (all four artifacts over the
    # survivor set), then ONE increment-sized call per artifact for the
    # MERGE maintenance — no v2-sized recompute anywhere
    assert sorted(calls) == sorted(
        [
            ("bands", n_kept),
            ("fp", n_kept),
            ("post", n_kept),
            ("dl", n_kept),
            ("bands", n_inserted),
            ("fp", n_inserted),
            ("post", n_inserted),
            ("dl", n_inserted),
        ]
    ), calls
