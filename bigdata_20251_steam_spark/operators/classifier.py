"""Model-based quality classification — hashed Naive-Bayes log-odds.

The heuristic quality scores (`text_analysis.quality_scores`) cover the
length/punctuation/stopword tier; real curation pipelines additionally
filter on a LEARNED classifier — "does this document look like the
reference corpus?" (the CCNet / LLaMA Wikipedia-reference shape, and the
fastText quality classifiers used for CommonCrawl filtering).  This
module supplies that tier in the engine's cross-engine-exact style:

**Training** (:func:`train_nb_weights`): features are lowercase
alphabetic words hashed into ``n_buckets`` via the engine's md5 bucket
hash (the hashing trick — vocabulary never grows the model); per-bucket
occurrence counts for positive (reference) vs negative documents
collapse through ONE bounded aggregate (map-side partials, the shuffle
carries at most ``n_buckets`` rows — the CMS/HLL posture), and the
Naive-Bayes log-odds weight per bucket

    w_b = ln((pos_b + a) / (pos_total + a*D)) -
          ln((neg_b + a) / (neg_total + a*D))

is computed driver-side over those <= D rows (bounded like the BPE
vocabulary pull; a loud cap guards it).  Weights are quantized to
INTEGER micro-nats (round(1e6 * w_b)) — this is what makes scoring
bit-exact across engines: per-document sums of integers are
order-independent, so the oracle's arbitrary aggregation order cannot
diverge from Spark's, and the only floating-point ops left (one
division, one 6dp round) are exactly reproducible.

**Scoring** (:func:`nb_score_column` / :func:`nb_quality_scores`)
applies a FIXED weights table — the production posture: classifiers are
artifacts, trained once and shipped (like the BPE merges table), so the
registered query pins its weights as a constant and the DuckDB oracle
replays scoring exactly via a list-literal lookup.  The weights ride
the plan as a ``map()`` literal (kilobytes, broadcast with the plan);
the pass is a zero-shuffle narrow projection fused into the scan —
scan-bound at any corpus size, no Python anywhere.

score = (sum of word-bucket weights in micro-nats) / 1e6 / n_words —
mean log-odds per token; > 0 reads "more reference-like than not".

No reference counterpart (the reference has no ML scoring); part of the
commissioned LLM-pipeline extension surface.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_long

#: Driver-side bucket cap: one count row per bucket comes back to the
#: driver at train time.
MAX_BUCKETS = 65_536


def _bucket(word: Column, n_buckets: int) -> Column:
    """md5-derived feature bucket (0..n_buckets-1), JVM-side, no UDF."""
    return F.pmod(md5_long(word), F.lit(n_buckets))


def train_nb_weights(
    docs: DataFrame,
    positive: Column,
    n_buckets: int = 256,
    alpha: float = 0.5,
    text_col: str = "text",
) -> list[tuple[int, int]]:
    """Learn integer micro-nat log-odds weights per feature bucket.

    ``positive`` is a boolean Column marking reference documents — the
    label is POLICY (a curated subset, a trusted source), not engine;
    rows where it is NULL are excluded from training.  Returns sorted
    ``(bucket, weight_micro_nats)`` pairs for every bucket with at
    least one occurrence; unseen buckets are unreachable when scoring
    the training corpus and score 0 via the lookup default otherwise.

    Determinism: bucket counts are exact integers, the log-odds are
    computed in one pass of IEEE-double ``math.log`` per bucket, and the
    1e-6 quantization makes every downstream consumer integer-exact —
    the pinned-artifact provenance test re-derives the table
    bit-for-bit.
    """
    if not 1 <= n_buckets <= MAX_BUCKETS:
        raise ValueError(
            f"train_nb_weights: n_buckets must be in [1, {MAX_BUCKETS}] — "
            "one count row per bucket is collected to the driver; raise "
            "MAX_BUCKETS consciously if a bigger feature space is required"
        )
    words = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit("[a-z]+"), F.lit(0)
    )
    occ = (
        docs.filter(positive.isNotNull())
        .select(positive.alias("_pos"), F.explode(words).alias("_w"))
        .select("_pos", _bucket(F.col("_w"), n_buckets).alias("_b"))
    )
    rows = (
        occ.groupBy("_b")
        .agg(
            F.sum(F.when(F.col("_pos"), 1).otherwise(0)).alias("_pc"),
            F.sum(F.when(~F.col("_pos"), 1).otherwise(0)).alias("_nc"),
        )
        .collect()
    )
    pt = sum(int(r["_pc"]) for r in rows)
    nt = sum(int(r["_nc"]) for r in rows)
    d = float(n_buckets)
    out = []
    for r in sorted(rows, key=lambda r: int(r["_b"])):
        w = math.log((int(r["_pc"]) + alpha) / (pt + alpha * d)) - math.log(
            (int(r["_nc"]) + alpha) / (nt + alpha * d)
        )
        out.append((int(r["_b"]), round(w * 1_000_000)))
    return out


def nb_score_column(
    weights: list[tuple[int, int]], n_buckets: int, text_col: Column
) -> tuple[Column, Column]:
    """``(n_words, micro_nat_sum)`` inline columns under a fixed table.

    The weights ride as one ``map()`` literal; each word costs one md5 +
    one map lookup, summed by a left-to-right array ``aggregate`` in
    exact integer arithmetic.
    """
    # lit(list) instead of array(*[lit(x).cast(..)]) (ADVICE r17: in
    # classic py4j mode lit(list) still issues one py4j call per
    # element — the win is dropping the per-element .cast calls, ~2x
    # fewer round-trips; ConstantFolding folds both forms to the same
    # Literal, so values/types/plans are identical)
    wmap = F.map_from_arrays(
        F.lit([b for b, _ in weights]).cast("array<int>"),
        F.lit([w for _, w in weights]).cast("array<long>"),
    )
    words = F.regexp_extract_all(F.lower(text_col), F.lit("[a-z]+"), F.lit(0))
    n_words = F.coalesce(F.size(words), F.lit(0))
    total = F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: acc
        + F.coalesce(
            F.element_at(wmap, F.pmod(md5_long(w), F.lit(n_buckets))),
            F.lit(0).cast("long"),
        ),
    )
    return n_words, total


def nb_quality_scores(
    docs: DataFrame,
    weights: list[tuple[int, int]],
    n_buckets: int = 256,
    text_col: str = "text",
) -> DataFrame:
    """Per-document classifier scores under a fixed weights table.

    Output: ``(doc_id, n_words, score, pred)`` — ``score`` is the 6dp
    mean log-odds per token (NULL for wordless documents), ``pred`` the
    ``score > 0`` reference-likeness flag.  Zero shuffles; the scan is
    the only stage.
    """
    n_words, total = nb_score_column(weights, n_buckets, F.col(text_col))
    score = F.when(
        n_words > 0,
        F.round(total / F.lit(1_000_000.0) / n_words, 6),
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        score.alias("score"),
        (score > 0).alias("pred"),
    )


def nb_oracle_score_sql(
    weights: list[tuple[int, int]], n_buckets: int, text_expr: str = "text"
) -> str:
    """DuckDB SQL twin of :func:`nb_score_column`'s micro-nat sum.

    The weights become a dense list literal indexed by bucket (missing
    buckets 0) — integer sums are order-free, so any aggregation order
    matches Spark bit-for-bit.
    """
    dense = [0] * n_buckets
    for b, w in weights:
        dense[b] = w
    lst = "[" + ", ".join(str(w) for w in dense) + "]"
    bucket = (
        f"CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) % {n_buckets}"
    )
    return (
        "COALESCE(list_sum(list_transform("
        f"regexp_extract_all(lower({text_expr}), '[a-z]+'), "
        f"w -> ({lst})[{bucket} + 1])), 0)"
    )


# ---------------------------------------------------------------------------
# Integer-exact logistic regression (trained, iterative)
# ---------------------------------------------------------------------------

#: Sigmoid quantile-table domain: z clamped to ±8 nats (σ saturates to
#: <3.4e-4 / >0.99966 outside), 1024 steps of 1/64 nat.
SIGMOID_CLAMP_MICRO = 8_000_000
SIGMOID_STEPS = 1024
SIGMOID_STEP_MICRO = 2 * SIGMOID_CLAMP_MICRO // SIGMOID_STEPS  # 15625


def sigmoid_micro_table() -> list[int]:
    """Pinned sigmoid lookup: entry i = round(1e6 * σ(-8 + i/64)) for
    i in 0..1024.  Driver-side libm once at plan build; both engines
    consume only the integers (the Gumbel-table convention)."""
    out = []
    for i in range(SIGMOID_STEPS + 1):
        z = -8.0 + 16.0 * i / SIGMOID_STEPS
        out.append(round(1_000_000 / (1.0 + math.exp(-z))))
    return out


def _lr_z_column(
    weights: dict[int, int], bias: int, n_buckets: int, text_col: Column
) -> Column:
    """z in micro-nats under a fixed weights table — the NB scoring
    shape (map literal + integer array aggregate, zero-shuffle)."""
    wmap = F.map_from_arrays(
        F.lit(list(range(n_buckets))).cast("array<int>"),
        F.lit([weights.get(b, 0) for b in range(n_buckets)]).cast(
            "array<long>"
        ),
    )
    words = F.regexp_extract_all(F.lower(text_col), F.lit("[a-z]+"), F.lit(0))
    return F.coalesce(
        F.aggregate(
            words,
            F.lit(int(bias)).cast("long"),
            lambda acc, w: acc
            + F.element_at(wmap, F.pmod(md5_long(w), F.lit(n_buckets))),
        ),
        F.lit(int(bias)).cast("long"),
    )


def _sigmoid_lookup(z_micro: Column, table: list[int]) -> Column:
    """σ̂(z) in micro units via the pinned table (clamp → index)."""
    c = F.lit(SIGMOID_CLAMP_MICRO)
    zc = F.greatest(-c, F.least(c, z_micro))
    idx = F.floor((zc + c) / F.lit(SIGMOID_STEP_MICRO)).cast("int")
    # lit(list) (ADVICE r17: in classic py4j mode this is still one
    # py4j call per element — the saving vs the old form is the 1025
    # dropped per-element .cast calls, ~2x; ConstantFolding folds both
    # to the same Literal).  This column is built per training
    # iteration AND per scoring pass, so the construct saving repeats.
    arr = F.lit(list(table)).cast("array<long>")
    return F.element_at(arr, idx + 1)


def train_logreg(
    docs: DataFrame,
    positive: Column,
    n_buckets: int = 64,
    iters: int = 2,
    lr_num: int = 1,
    lr_den: int = 2,
    text_col: str = "text",
) -> tuple[dict[int, int], int]:
    """Integer-exact full-batch logistic regression — the TRAINED
    iterative tier next to the closed-form NB weights, with the
    kmeans_exact determinism contract so an oracle can replay every
    iteration bit-for-bit.

    Forward: ``z_d = bias + Σ_words w[bucket(word)]`` in micro-nats
    (hashed bag-of-words counts — each occurrence adds its bucket
    weight).  ``σ̂`` is the pinned 1025-entry quantile table
    (:func:`sigmoid_micro_table`) — a documented quantization of the
    logistic link, integer in both engines, no runtime libm.  The
    per-document error ``err_d = σ̂(z_d) − y_d·1e6`` is an integer;
    the gradient ``g_b = Σ_d err_d · x_db`` is an order-free integer
    sum (ONE bucket-bounded aggregate per iteration — the exchange
    carries ≤ n_buckets+1 rows, map-side partials collapse hot
    buckets); the update ``w_b ← w_b − trunc(lr_num·g_b / (lr_den·n))``
    uses TRUNCATING integer division — DuckDB's native ``//``
    semantics, replicated exactly driver-side — so both engines agree
    on every weight with no floating point anywhere in the update
    path.

    Init = all-zero weights/bias (z=0 → σ̂ exactly 0.5e6 — no
    asymmetry to seed divergence).  Rows with NULL text or NULL label
    are excluded.  Returns ``(weights, bias)``.  At 100 TB: train on
    a deterministic hash sample (the ivf/pq posture) — per-iteration
    cost is one corpus scan + the tiny aggregate, and classifier
    quality needs thousands of docs per bucket, not the corpus.

    Eager-job contract (documented like the kmeans seeds / hot-group
    counts): this function runs ``iters`` Spark jobs at call time —
    training IS execution (one job per iteration: the gradient buckets
    and the bias/count ride the same aggregate via a sentinel bucket).
    The lazy path is :func:`logreg_scores` under precomputed/pinned
    weights.
    """
    if not 1 <= n_buckets <= MAX_BUCKETS:
        raise ValueError(
            f"train_logreg: n_buckets must be in [1, {MAX_BUCKETS}]"
        )
    if iters < 0 or lr_num < 1 or lr_den < 1:
        raise ValueError("train_logreg: iters >= 0, lr_num/lr_den >= 1")
    table = sigmoid_micro_table()
    base = docs.filter(
        F.col(text_col).isNotNull() & positive.isNotNull()
    ).select(
        F.when(positive, 1).otherwise(0).cast("long").alias("_y"),
        F.col(text_col).alias("_t"),
    )
    weights: dict[int, int] = {}
    bias = 0
    n = None
    for _ in range(iters):
        z = _lr_z_column(weights, bias, n_buckets, F.col("_t"))
        err = (_sigmoid_lookup(z, table) - F.col("_y") * F.lit(1_000_000)).alias(
            "_e"
        )
        scored = base.select("_y", "_t", err)
        words = F.regexp_extract_all(
            F.lower(F.col("_t")), F.lit("[a-z]+"), F.lit(0)
        )
        # ONE job per iteration (r17 opt; was two): each word occurrence
        # emits its gradient bucket, and every doc additionally emits
        # sentinel bucket -1 carrying the bias gradient and the doc
        # count — pmod buckets are >= 0, so -1 never collides.  Same
        # integer sums over the same rows (order-free long arithmetic),
        # but the corpus scan + the z/sigmoid per-row arithmetic — the
        # expensive term — now runs once per iteration, not twice.
        buckets = F.transform(
            words, lambda w: F.pmod(md5_long(w), F.lit(n_buckets))
        )
        rows = (
            scored.select(
                F.col("_e"),
                F.explode(
                    F.concat(buckets, F.array(F.lit(-1).cast("long")))
                ).alias("_b"),
            )
            .groupBy("_b")
            .agg(F.sum("_e").alias("_g"), F.count(F.lit(1)).alias("_c"))
            .collect()
        )
        sent = next((r for r in rows if int(r["_b"]) == -1), None)
        n = int(sent["_c"]) if sent is not None else 0
        if n == 0:
            raise ValueError("train_logreg: no labeled non-null docs")
        den = lr_den * n

        def _trunc_div(a: int, b: int) -> int:
            # DuckDB's // truncates toward zero; Python's floors.
            q = abs(a) // b
            return q if a >= 0 else -q

        for r in rows:
            b = int(r["_b"])
            if b < 0:
                continue
            g = int(r["_g"])
            weights[b] = weights.get(b, 0) - _trunc_div(lr_num * g, den)
        g0 = int(sent["_g"])
        bias = bias - _trunc_div(lr_num * g0, den)
    return weights, bias


def logreg_scores(
    docs: DataFrame,
    weights: dict[int, int],
    bias: int,
    n_buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score under fixed logreg weights: ``(doc_id, z_micro, p_micro,
    pred)`` — z the integer micro-nat logit, p the pinned-table
    sigmoid in micro units, pred = p > 0.5.  Zero-shuffle scan-fused
    projection (the NB scoring contract); NULL text scores at the
    bias alone.
    """
    table = sigmoid_micro_table()
    z = _lr_z_column(weights, bias, n_buckets, F.col(text_col))
    p = _sigmoid_lookup(z, table)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        z.alias("z_micro"),
        p.alias("p_micro"),
        (p > F.lit(500_000)).alias("pred"),
    )


def qbc_disagreement(
    docs: DataFrame,
    nb_weights: list[tuple[int, int]],
    nb_buckets: int,
    lr_weights: dict[int, int],
    lr_bias: int,
    lr_buckets: int,
    top_n: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
    cache_tracker: list | None = None,
) -> DataFrame:
    """Query-by-committee disagreement mining (Seung, Opper & Sompolinsky
    1992; uncertainty sampling, Lewis & Gale 1994) over the repo's two
    pinned classifier tiers.

    The committee is the closed-form NB log-odds table and the
    GD-trained logistic regression, both trained on the SAME target —
    where two differently-biased models CONFIDENTLY disagree is
    exactly where labels are noisy or the concept is underspecified,
    and those rows are what a curation pipeline sends to annotation /
    a stronger teacher model first (the active-learning tier of a
    training-data pipeline).

    Semantics (integer-exact end to end):

    - ``nb_micro`` = the NB micro-nat document sum; ``lr_z_micro`` =
      the logreg logit in micro-nats (bias + bucket weights);
    - a document DISAGREES when ``(nb_micro > 0) != (lr_z_micro > 0)``
      (wordless documents are excluded — neither member has evidence);
    - disagreement strength = ``least(|nb_rate|, |lr_rate|)`` where
      each rate is the member's per-token micro-nat margin
      (``x DIV n_words`` — truncating integral division, identical in
      Spark ``DIV`` and DuckDB ``//``): BOTH members must be confident
      for a row to rank high, the committee margin;
    - output = the ``top_n`` strongest disagreements under
      ``(strength DESC, doc_id ASC)``.

    Scale shape: both scores ride as map/array literals in ONE
    zero-shuffle scan-fused projection (the NB/BM25/DSIR contract);
    the final cut is :func:`~.ranking.banded_percent_rank`'s exact
    global rank (constant group, ~n/64 rows per task) — never a
    single-task window or driver top-k.  Disagreements are typically
    a small corpus fraction, so the ranked frame is already narrow.
    The narrow ``(doc_id, n_words, nb_micro, lr_z_micro,
    strength_micro)`` disagreement frame is materialized ONCE around
    the banded rank (r12 advice fix): the ranker scans its input three
    times and without a cut each scan would re-run the full document
    scan plus BOTH map-literal scoring passes — the exact
    lineage-multiplication hazard ``banded_percent_rank``'s contract
    warns about.  Lifecycle (ADVICE r12, low — the unconditional
    persist leaked: registered queries never unpersist, and Spark's
    CacheManager holds persisted frames until an explicit unpersist):
    with ``cache_tracker`` the frame is persisted MEMORY_AND_DISK and
    appended for the CALLER to unpersist after consuming; without it
    the frame is ``localCheckpoint``-ed instead — one eager bounded
    job at plan-build time (the documented eager-job contract), and
    the checkpoint storage is released by the ContextCleaner when the
    returned frame is garbage-collected, so a long-lived session
    accumulates nothing.
    """
    if top_n < 1:
        raise ValueError("qbc_disagreement: top_n must be >= 1")
    n_words, nb_total = nb_score_column(
        nb_weights, nb_buckets, F.col(text_col)
    )
    lr_z = _lr_z_column(lr_weights, lr_bias, lr_buckets, F.col(text_col))
    base = (
        docs.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("doc_id"),
            n_words.alias("n_words"),
            nb_total.alias("nb_micro"),
            lr_z.alias("lr_z_micro"),
        )
        .filter(F.col("n_words") > 0)
    )
    dis = base.filter(
        (F.col("nb_micro") > 0) != (F.col("lr_z_micro") > 0)
    ).withColumn(
        "strength_micro",
        F.least(
            F.abs(F.expr("nb_micro DIV n_words")),
            F.abs(F.expr("lr_z_micro DIV n_words")),
        ),
    )
    from .ranking import banded_percent_rank

    # cut the narrow disagreement frame ONCE: the banded ranker reads
    # it three times, and each uncut read would re-execute the corpus
    # scan + both scoring projections (lifecycle contract in docstring)
    if cache_tracker is not None:
        from pyspark import StorageLevel

        dis = dis.persist(StorageLevel.MEMORY_AND_DISK)
        cache_tracker.append(dis)
    else:
        dis = dis.localCheckpoint()
    ranked = banded_percent_rank(
        dis.withColumn("_g", F.lit(1)),
        "_g",
        "strength_micro",
        "doc_id",
        n_groups=1,
    )
    return ranked.filter(F.col("_rank") <= top_n).select(
        "doc_id",
        "n_words",
        "nb_micro",
        "lr_z_micro",
        F.col("strength_micro").cast("long").alias("strength_micro"),
        F.col("_rank").cast("int").alias("qbc_rank"),
    )


def nb_calibration_report(
    docs: DataFrame,
    weights: list[tuple[int, int]],
    n_buckets: int,
    positive: Column,
    n_bins: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    cache_tracker: list | None = None,
) -> DataFrame:
    """Reliability report for the pinned NB quality classifier (r12) —
    the calibration check every score-gated curation pipeline owes its
    thresholds: bin the corpus into ``n_bins`` equal-count bins by
    per-token score margin and report each bin's observed positive
    rate.  A well-ordered classifier shows the rate falling
    monotonically from bin 1 (highest margin) down; a flat or
    non-monotone tail says the threshold region is noise and the
    operating point should move (Zadrozny & Elkan 2002's reliability
    table, in the integer-exact idiom).

    Semantics (integer-exact cross-engine):

    - ``margin = nb_micro DIV n_words`` (truncating division,
      identical in Spark ``DIV`` and DuckDB ``//``); wordless/null
      docs excluded — no evidence, no bin;
    - bins are exact ntile(n_bins) under ``(margin DESC, doc_id
      ASC)``, computed from :func:`~.ranking.banded_percent_rank`'s
      global rank via the exact bucket-size rule (first ``n mod k``
      bins take ``ceil(n/k)`` rows) — bit-identical to the window
      ntile with no single-task window (the user_value_quartiles
      de-hazarding);
    - per bin: ``n_docs``, ``mean_margin_micro = sum DIV n`` (both
      engines truncate), margin min/max, ``positives`` under the
      caller's ``positive`` predicate, and ``pos_rate_micro =
      (1e6 * positives) DIV n``.

    Scale shape: ONE zero-shuffle scoring scan (map-literal NB), the
    banded rank's bounded exchanges, then an ``n_bins``-key aggregate.
    The narrow scored frame is cut once around the rank (the ranker
    scans it three times) under the :func:`qbc_disagreement` lifecycle
    contract: persist + track when ``cache_tracker`` is passed (caller
    unpersists), else an eager ``localCheckpoint`` whose storage the
    ContextCleaner frees on GC — no CacheManager-held leak in
    long-lived sessions (ADVICE r12).
    """
    if n_bins < 2:
        raise ValueError("nb_calibration_report: n_bins must be >= 2")
    n_words, nb_total = nb_score_column(weights, n_buckets, F.col(text_col))
    base = (
        docs.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("doc_id"),
            n_words.alias("n_words"),
            nb_total.alias("nb_micro"),
            positive.cast("int").alias("label"),
        )
        .filter(F.col("n_words") > 0)
        .select(
            "doc_id",
            "label",
            F.expr("nb_micro DIV n_words").alias("margin"),
        )
    )
    from .ranking import banded_percent_rank

    if cache_tracker is not None:
        from pyspark import StorageLevel

        base = base.persist(StorageLevel.MEMORY_AND_DISK)
        cache_tracker.append(base)
    else:
        base = base.localCheckpoint()
    ranked = banded_percent_rank(
        base.withColumn("_g", F.lit(1)),
        "_g",
        "margin",
        "doc_id",
        n_groups=1,
    )
    r, n = F.col("_rank"), F.col("_n")
    bbase = F.floor(n / n_bins).cast("long")
    rem = (n % n_bins).cast("long")
    head = rem * (bbase + 1)
    bin_col = (
        F.when(r <= head, F.ceil(r / (bbase + 1)))
        .otherwise(rem + F.ceil((r - head) / bbase))
        .cast("int")
    )
    return (
        ranked.select("label", "margin", bin_col.alias("bin"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.expr("sum(margin) DIV count(1)")
            .cast("long")
            .alias("mean_margin_micro"),
            F.min("margin").cast("long").alias("margin_min"),
            F.max("margin").cast("long").alias("margin_max"),
            F.sum("label").cast("long").alias("positives"),
            F.expr("(1000000 * sum(label)) DIV count(1)")
            .cast("long")
            .alias("pos_rate_micro"),
        )
    )
