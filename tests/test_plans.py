"""Plan-shape assertions: the physical plans must be the scale-correct
ones — broadcast joins on dims, pushdown into parquet scans, bounded
shuffle counts."""

import pyspark.sql.functions as F

from parquet_metadata_explorer_spark.operators import relational
from parquet_metadata_explorer_spark.plans import (
    count_exchanges,
    has_broadcast_join,
    pushed_filters,
    simple_plan,
)


def load(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def test_q5_broadcasts_all_dims(spark, sf_dir):
    df = relational.regional_revenue(
        load(spark, sf_dir, "lineitem"),
        load(spark, sf_dir, "orders"),
        load(spark, sf_dir, "customer"),
        load(spark, sf_dir, "nation"),
        load(spark, sf_dir, "region"),
    )
    plan = simple_plan(df)
    assert plan.count("BroadcastHashJoin") >= 3  # customer, nation, region


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 30).select(
        "l_orderkey", "l_quantity"
    )
    pf = pushed_filters(df)
    assert "l_quantity" in pf, f"expected pushdown, got: {pf or simple_plan(df)}"


def test_column_pruning(spark, sf_dir):
    df = load(spark, sf_dir, "lineitem").select("l_orderkey")
    from parquet_metadata_explorer_spark.plans import formatted_plan

    plan = formatted_plan(df)
    # ReadSchema must contain only the projected column
    read_schema_lines = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema_lines
    assert "l_extendedprice" not in read_schema_lines[0]


def test_window_top_orders_single_window_shuffle(spark, sf_dir):
    df = relational.top_orders_per_segment(
        load(spark, sf_dir, "orders"), load(spark, sf_dir, "customer")
    )
    assert has_broadcast_join(df)
    # one shuffle for the window partition + the final sort exchange at most
    assert count_exchanges(df) <= 3


def test_pricing_summary_partial_agg(spark, sf_dir):
    df = relational.pricing_summary(load(spark, sf_dir, "lineitem"))
    plan = simple_plan(df)
    # partial (map-side) + final hash aggregate around a single exchange
    assert plan.count("HashAggregate") >= 2
    assert count_exchanges(df) <= 2


def test_hash_split_adds_no_shuffle(spark, sf_dir):
    from parquet_metadata_explorer_spark.operators.sampling import hash_split

    df = hash_split(load(spark, sf_dir, "documents"), "doc_id", 100)
    assert count_exchanges(df) == 0  # pure projection: map-only at any scale


def test_sample_per_group_single_shuffle(spark, sf_dir):
    from parquet_metadata_explorer_spark.operators.sampling import sample_per_group

    df = sample_per_group(load(spark, sf_dir, "documents"), "lang", "doc_id", 5)
    assert count_exchanges(df) == 1  # the group-key window exchange only


def test_ngram_freq_partial_agg_before_shuffle(spark, sf_dir):
    from parquet_metadata_explorer_spark.operators import text

    df = text.ngram_frequencies(load(spark, sf_dir, "documents"), 2, 50)
    plan = simple_plan(df)
    # partial count must appear below the single ngram exchange
    assert plan.count("HashAggregate") >= 2
    assert count_exchanges(df) <= 2  # ngram agg + top-k sort


def test_exact_duplicates_single_shuffle(spark, sf_dir):
    from parquet_metadata_explorer_spark.operators.dedup import exact_duplicates

    df = exact_duplicates(load(spark, sf_dir, "documents"))
    # the row_number window and the groupBy share the fingerprint
    # partitioning: one exchange total
    assert count_exchanges(df) == 1


def test_embedding_dedup_census_broadcasts(spark, sf_dir):
    from parquet_metadata_explorer_spark.operators.dedup import (
        embedding_near_duplicates,
    )

    emb = load(spark, sf_dir, "embeddings")

    # corpus <= bucket_cap: the census is skipped entirely (a count proves
    # no bucket can overflow) — the fat rows shuffle exactly once for the
    # tile grouping, plus the final pair dedup: two exchanges, no join
    df = embedding_near_duplicates(emb, 0.9)
    assert not has_broadcast_join(df)
    assert count_exchanges(df) <= 2

    # corpus > bucket_cap (forced via a tiny cap): the census joins back
    # as a broadcast — the fat rows still shuffle exactly once, plus the
    # census's own small aggregation exchange and the final pair dedup
    df = embedding_near_duplicates(emb, 0.9, bucket_cap=4)
    assert has_broadcast_join(df)
    assert count_exchanges(df) <= 4


def test_q3_pushdown_and_broadcast_dim(spark, sf_dir):
    df = relational.unshipped_orders_revenue(
        load(spark, sf_dir, "lineitem"),
        load(spark, sf_dir, "orders"),
        load(spark, sf_dir, "customer"),
    )
    assert has_broadcast_join(df)  # BUILDING customers are broadcast
    pf = pushed_filters(df)
    # the date-range predicates must reach the parquet scans
    assert "l_shipdate" in pf and "o_orderdate" in pf, pf


def test_q6_all_predicates_pushed_single_scan(spark, sf_dir):
    df = relational.forecast_revenue(load(spark, sf_dir, "lineitem"))
    pf = pushed_filters(df)
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pf, pf
    plan = simple_plan(df)
    assert plan.count("Scan parquet") == 1


def test_cube_partial_agg_before_exchange(spark, sf_dir):
    df = relational.order_stats_cube(load(spark, sf_dir, "orders"))
    plan = simple_plan(df)
    # grouping-set expansion and partial HashAggregate precede the shuffle
    assert "Expand" in plan
    assert plan.index("HashAggregate") < plan.index("Exchange")


def test_salted_agg_two_stage_shape(spark, sf_dir):
    from parquet_metadata_explorer_spark.operators.skew import (
        salted_group_stats,
    )

    df = salted_group_stats(
        load(spark, sf_dir, "lineitem"),
        "l_returnflag", "l_extendedprice", "l_orderkey", n_salts=8,
    )
    plan = simple_plan(df)
    # two aggregation exchanges: (key, salt) shards then the key merge
    assert count_exchanges(df) == 2
    # Catalyst folds the salt alias into _groupingexpression; the xxhash64
    # salt must partition the FIRST exchange (deepest in the plan) and be
    # absent from the final key-only merge exchange
    assert "xxhash64(l_orderkey" in plan
    merge_exchange = plan[: plan.index("Exchange")]
    assert "xxhash64" not in merge_exchange


def test_salted_agg_equals_direct(spark, sf_dir):
    from parquet_metadata_explorer_spark.operators.skew import (
        salted_group_stats,
    )

    li = load(spark, sf_dir, "lineitem")
    got = {
        r.l_returnflag: (r.sum_value, r.n_values, r.min_value, r.max_value)
        for r in salted_group_stats(
            li, "l_returnflag", "l_extendedprice", "l_orderkey"
        ).collect()
    }
    want = {
        r.l_returnflag: (
            float(r.s), r.c, r.mn, r.mx
        )
        for r in li.groupBy("l_returnflag")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(30,10)")).alias("s"),
            F.count("l_extendedprice").alias("c"),
            F.min("l_extendedprice").alias("mn"),
            F.max("l_extendedprice").alias("mx"),
        )
        .collect()
    }
    assert got == want


def test_range_join_is_equi_not_nested_loop(spark, sf_dir):
    """The binned interval join must plan as an equi-join (SMJ or BHJ) —
    a plain BETWEEN theta join would be a BroadcastNestedLoopJoin, which
    is O(points x intervals) and unusable at scale."""
    from parquet_metadata_explorer_spark.operators.rangejoin import (
        binned_interval_join,
    )
    from parquet_metadata_explorer_spark.streaming import events as ev

    events = ev.load_events(spark, sf_dir)
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )
    joined = binned_interval_join(
        purchases, ev.session_intervals(events), keys=("user_id",)
    )
    plan = simple_plan(joined)
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    assert "Join" in plan

    # every purchase falls inside exactly one of its user's sessions
    assert joined.count() == purchases.count()
    assert joined.groupBy("purchase_id").count().filter("count > 1").count() == 0


def test_decontaminate_broadcasts_benchmark(spark, sf_dir):
    """The benchmark shingle set must broadcast: the corpus-side postings
    never shuffle for the containment check, only for the per-doc count."""
    from parquet_metadata_explorer_spark.operators import text

    docs = load(spark, sf_dir, "documents")
    df = text.decontaminate(
        docs.filter(F.col("doc_id") % 20 != 0),
        docs.filter(F.col("doc_id") % 20 == 0),
    )
    assert has_broadcast_join(df)


def test_aqe_splits_skewed_join(spark, sf_dir):
    """With AQE skew thresholds lowered to the fixture's scale, a join on
    a 90%-hot key must show skew=true handling in the adaptive plan —
    evidence that the engine's join shapes inherit AQE's skew splitting
    on a real cluster (where one hot key otherwise pins one reducer)."""
    import pyspark.sql.functions as F

    cfg = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ path
    }
    old = {k: spark.conf.get(k, None) for k in cfg}
    try:
        for k, v in cfg.items():
            spark.conf.set(k, v)
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("payload"),
        )
        right = spark.range(0, 1000).select(F.col("id").alias("k"), F.lit("dim").alias("d"))
        joined = left.join(right, "k")
        # collect() executes THIS DataFrame's queryExecution (count()
        # would plan a separate aggregate), letting AQE finalize it
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_q10_broadcasts_dims_and_topk(spark, sf_dir):
    """Q10: customer+nation broadcast; global top-k plans as
    TakeOrderedAndProject, never a full sort of the aggregate."""
    df = relational.returned_item_report(
        load(spark, sf_dir, "lineitem"),
        load(spark, sf_dir, "orders"),
        load(spark, sf_dir, "customer"),
        load(spark, sf_dir, "nation"),
    )
    plan = simple_plan(df)
    assert plan.count("BroadcastHashJoin") >= 2
    assert "TakeOrderedAndProject" in plan


def test_q15_reuses_revenue_aggregate(spark, sf_dir):
    """Q15: the revenue aggregate feeds both the max side and the join
    side — it is persisted, so BOTH sides read InMemoryTableScan and the
    quarter of lineitem is scanned+aggregated once (AQE recompiles the
    sides independently, so ReusedExchange alone cannot be relied on)."""
    df = relational.top_supplier(
        load(spark, sf_dir, "lineitem"), load(spark, sf_dir, "supplier")
    )
    from parquet_metadata_explorer_spark.plans import formatted_plan

    plan = formatted_plan(df)
    assert plan.count("InMemoryTableScan") >= 2, plan[:2000]
    assert has_broadcast_join(df)


def test_q18_big_order_keys_broadcast(spark, sf_dir):
    """Q18: the selective big-quantity key set must broadcast so the
    orders scan never shuffles on orderkey."""
    df = relational.large_volume_customers(
        load(spark, sf_dir, "lineitem"),
        load(spark, sf_dir, "orders"),
        load(spark, sf_dir, "customer"),
    )
    plan = simple_plan(df)
    assert plan.count("BroadcastHashJoin") >= 2  # big-keys + customer


def test_q19_disjunction_evaluates_after_broadcast_join(spark, sf_dir):
    df = relational.disjunctive_revenue(
        load(spark, sf_dir, "lineitem"), load(spark, sf_dir, "part")
    )
    assert has_broadcast_join(df)
    # single-row final aggregate: at most partial->final exchange pair
    assert count_exchanges(df) <= 2


def test_q4_semi_join_no_duplication(spark, sf_dir):
    df = relational.priority_order_check(
        load(spark, sf_dir, "lineitem"), load(spark, sf_dir, "orders")
    )
    plan = simple_plan(df)
    assert "LeftSemi" in plan or "BroadcastHashJoin" in plan
    # date-window predicate must reach the orders scan
    pf = pushed_filters(df)
    assert "o_orderdate" in pf, pf


def test_line_dedup_argmin_partial_agg(spark, sf_dir):
    """line_dedup's first-occurrence arg-min must plan as partial+final
    HashAggregate (map-side combine on the hot line key), not a window
    sort over the line partition."""
    from parquet_metadata_explorer_spark.operators.dedup import line_dedup
    from parquet_metadata_explorer_spark.plans import formatted_plan

    df = line_dedup(load(spark, sf_dir, "documents"), chunk_tokens=8)
    plan = formatted_plan(df)
    assert "Window" not in plan
    assert plan.count("HashAggregate") >= 2  # partial + final on line


def test_unigram_logprob_persists_freq_table(spark, sf_dir):
    """unigram_logprob_score: the vocab frequency table feeds both the
    n_total fold and the token join — it must be persisted so the corpus
    is exploded once for the vocab build (two InMemoryTableScan readers),
    not re-scanned per branch (the Catalyst no-reuse trap)."""
    from parquet_metadata_explorer_spark.operators import text
    from parquet_metadata_explorer_spark.plans import formatted_plan

    df = text.unigram_logprob_score(load(spark, sf_dir, "documents"))
    plan = formatted_plan(df)
    assert plan.count("InMemoryTableScan") >= 2, plan[:2000]
    # exactly two corpus scans: vocab build + scoring pass
    assert plan.count("documents.parquet") <= 2 or plan.count("Scan parquet") <= 2


def test_gapfill_by_type_no_global_window_sort(spark, sf_dir):
    """Multi-series gap-fill: every Window in the plan must be partitioned
    (by series, or series+month-chunk) — a Window with an empty partition
    spec would funnel the whole spine through one partition."""
    from parquet_metadata_explorer_spark.streaming import events as ev
    from parquet_metadata_explorer_spark.plans import formatted_plan

    import re

    df = ev.gapfill_hourly_by_type(ev.load_events(spark, sf_dir))
    plan = formatted_plan(df)
    lines = plan.splitlines()
    specs = [
        lines[i + 2]  # "(N) Window" / "Input ..." / "Arguments: [...]"
        for i, ln in enumerate(lines)
        if re.match(r"\(\d+\) Window$", ln.strip())
    ]
    assert specs, plan[:1500]
    for spec in specs:
        assert "windowspecdefinition(event_type" in spec, (
            f"unpartitioned window: {spec}"
        )


def test_q7_dims_broadcast_and_pushdown(spark, sf_dir):
    """Q7: both nation-resolved dims broadcast; the ship-date band is
    pushed to the lineitem scan."""
    df = relational.nation_volume_shipping(
        load(spark, sf_dir, "lineitem"),
        load(spark, sf_dir, "orders"),
        load(spark, sf_dir, "customer"),
        load(spark, sf_dir, "supplier"),
        load(spark, sf_dir, "nation"),
    )
    plan = simple_plan(df)
    assert plan.count("BroadcastHashJoin") >= 2
    assert "l_shipdate" in pushed_filters(df)


def test_q13_preaggregates_orders_before_join(spark, sf_dir):
    """Q13: the orders fact must collapse to per-customer counts BEFORE
    the customer join (partial+final agg below the join, histogram agg
    above it), and the priority exclusion must reach the orders scan."""
    df = relational.customer_order_distribution(
        load(spark, sf_dir, "customer"), load(spark, sf_dir, "orders")
    )
    plan = simple_plan(df)
    assert plan.count("HashAggregate") >= 4  # partial+final × (per-cust, histogram)
    join_pos = max(plan.find("SortMergeJoin"), plan.find("BroadcastHashJoin"))
    assert join_pos >= 0
    # at least one aggregate plans BELOW the join in the tree dump
    assert "HashAggregate" in plan[join_pos:], plan[:1500]


def test_q17_threshold_broadcast(spark, sf_dir):
    df = relational.small_quantity_revenue(
        load(spark, sf_dir, "lineitem"), load(spark, sf_dir, "part")
    )
    plan = simple_plan(df)
    assert plan.count("BroadcastHashJoin") >= 2  # brand keys + thresholds


def test_q22_anti_join_on_key_set(spark, sf_dir):
    df = relational.idle_rich_customers(
        load(spark, sf_dir, "customer"), load(spark, sf_dir, "orders")
    )
    plan = simple_plan(df)
    assert "LeftAnti" in plan
    assert "o_orderdate" in pushed_filters(df)  # cutoff reaches orders scan


def test_rolling_window_uses_range_frame(spark, sf_dir):
    """The rolling-7-day window must be a RANGE frame (calendar days, not
    rows) and partitioned by priority — no unpartitioned global sort."""
    from parquet_metadata_explorer_spark.plans import formatted_plan

    df = relational.rolling_weekly_revenue(load(spark, sf_dir, "orders"))
    plan = formatted_plan(df)
    assert "RangeFrame" in plan, plan[:1500]
    assert "windowspecdefinition(o_orderpriority" in plan


def test_q2_decorrelated_min_window(spark, sf_dir):
    """Q2: the derived-supply MIN decorrelates into one window over the
    (part,supp) aggregate — no self-join of the supply table, no second
    lineitem scan; the region supplier map and part filter broadcast."""
    df = relational.min_cost_supplier(
        load(spark, sf_dir, "lineitem"),
        load(spark, sf_dir, "part"),
        load(spark, sf_dir, "supplier"),
        load(spark, sf_dir, "nation"),
        load(spark, sf_dir, "region"),
    )
    plan = simple_plan(df)
    assert plan.count("Scan parquet") <= 5  # lineitem once + 4 dims
    assert plan.count("BroadcastHashJoin") >= 2
    assert "Window" in plan


def test_q21_no_correlated_join(spark, sf_dir):
    """Q21: the double EXISTS/NOT-EXISTS must decorrelate into order-level
    aggregates — the plan may not contain a nested-loop join, and every
    shuffle join is on orderkey (sort-merge or hash), with the supplier
    name map broadcast."""
    df = relational.waiting_suppliers(
        load(spark, sf_dir, "lineitem"),
        load(spark, sf_dir, "orders"),
        load(spark, sf_dir, "supplier"),
    )
    plan = simple_plan(df)
    assert "NestedLoop" not in plan, plan[:2000]
    assert has_broadcast_join(df)
    assert "TakeOrderedAndProject" in plan


def test_int8_topk_no_python_stage(spark, sf_dir):
    """The int8 ANN plan is JVM-only: quantization, integer dot and both
    rank windows must compile without ArrowEvalPython/BatchEvalPython/
    MapInPandas nodes."""
    from parquet_metadata_explorer_spark.operators import similarity

    df = similarity.int8_cosine_topk(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"), [0, 1], k=5
    )
    plan = simple_plan(df)
    for node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas", "FlatMapsInPandas"):
        assert node not in plan, node


def test_profiler_single_scan(spark, sf_dir):
    """The multi-column profile must fold in ONE pass over the table —
    one parquet scan regardless of how many columns are profiled."""
    from parquet_metadata_explorer_spark.operators.reports import profile_columns

    df = profile_columns(
        load(spark, sf_dir, "lineitem"),
        ["l_quantity", "l_extendedprice"],
        ["l_returnflag"],
    )
    plan = simple_plan(df)
    assert plan.count("Scan parquet") == 1, plan[:2000]


def test_attribution_is_equi_join_not_nlj(spark, sf_dir):
    """The interval self-join must ride the user_id equality — a single
    shuffle/broadcast equi-join with the time bounds as residual
    filters, never a nested loop."""
    from parquet_metadata_explorer_spark.streaming import events as ev

    df = ev.view_purchase_attribution(ev.load_events(spark, sf_dir))
    plan = simple_plan(df)
    assert "NestedLoop" not in plan, plan[:2000]
    assert "Join" in plan


def test_trending_partial_aggregates(spark, sf_dir):
    """Sliding-window counts must partial-aggregate before the exchange
    (the window explode multiplies rows at the SOURCE, map-side)."""
    from parquet_metadata_explorer_spark.streaming import events as ev

    df = ev.trending_event_types(ev.load_events(spark, sf_dir))
    plan = simple_plan(df)
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_substring_dedup_partial_agg_no_corpus_window(spark, sf_dir):
    """The first-occurrence arg-min must be a partial-aggregating
    groupBy (min of struct), never a window sort over the postings —
    a 10^9-copy boilerplate span would otherwise sort on one reducer.
    The only window in the plan is the per-document interval union."""
    from parquet_metadata_explorer_spark.operators.dedup import substring_dedup

    df = substring_dedup(load(spark, sf_dir, "documents"), window=20)
    plan = simple_plan(df)
    assert "partial_min" in plan.lower() or plan.count("HashAggregate") >= 2, plan
    # the interval-union window partitions by doc_id, never by the hash
    import re

    for m in re.finditer(r"Window \[[^\]]*partitionBy=\[([^\]]*)\]", plan):
        assert "doc_id" in m.group(1), plan


def test_bigram_logprob_no_python_in_plan(spark, sf_dir):
    """Scoring is pure JVM: joins + hash aggregates, no Python workers
    (BatchEvalPython/ArrowEvalPython) anywhere in the plan."""
    from parquet_metadata_explorer_spark.operators.text import (
        bigram_logprob_score,
    )

    plan = simple_plan(bigram_logprob_score(load(spark, sf_dir, "documents")))
    assert "EvalPython" not in plan, plan


def test_temperature_mix_broadcasts_rates(spark, sf_dir):
    """The derived rate table joins map-side (broadcast) — the corpus
    never shuffles for the keep decision."""
    from parquet_metadata_explorer_spark.operators.sampling import (
        temperature_mix,
    )

    plan = simple_plan(temperature_mix(load(spark, sf_dir, "documents"), key="lang"))
    assert plan.count("BroadcastHashJoin") >= 1, plan
    assert "SortMergeJoin" not in plan, plan


def test_pq_scoring_is_jvm_only(spark, sf_dir):
    """ADC scoring must contain no Python stage and (since the r14
    pair-packed rewrite) no hash/shuffle join at all: the packed encode
    and both decimal folds are map-side against LITERAL candidate
    tables (r15 — the former one-row broadcast crosses are gone too),
    so the ONLY join left is the |Q|-row query-table cross (the scoring
    fan-out itself) and the ranking windows; only the trainer's bounded
    collects run in Python on the driver."""
    from parquet_metadata_explorer_spark.operators.similarity import pq_ann_topk

    df = pq_ann_topk(
        load(spark, sf_dir, "embeddings"), [0, 1], k=5, n_centroids=8, iters=1
    )
    plan = simple_plan(df)
    assert "EvalPython" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") == 0, plan
    # exactly one cross: the query table; the codebook/cn2 crosses are
    # plan literals now
    assert plan.count("BroadcastNestedLoopJoin") == 1, plan


def test_ivfpq_scoring_is_jvm_only(spark, sf_dir):
    """IVF-PQ ADC scoring (codes ⋈ cells ⋈ broadcast probe tables →
    decimal folds → ranked top-k) must contain no Python stage, and the
    probe-table join must be broadcast (candidates outside probed cells
    drop map-side)."""
    from parquet_metadata_explorer_spark.operators.similarity import (
        ivfpq_ann_topk,
    )

    df = ivfpq_ann_topk(
        load(spark, sf_dir, "embeddings"), [0, 1], k=5, k_cells=4,
        n_probe=2, n_centroids=8, iters=1, coarse_iters=1,
    )
    plan = simple_plan(df)
    assert "EvalPython" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 1, plan


def test_histogram_percentiles_plan_jvm_only(spark, sf_dir):
    """The histogram sketch must be pure JVM (two partial-agg shuffles +
    broadcast range join), no Python stage."""
    from parquet_metadata_explorer_spark.streaming.events import (
        load_events,
        value_percentiles_histogram,
    )

    plan = simple_plan(value_percentiles_histogram(load_events(spark, sf_dir)))
    assert "EvalPython" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 1, plan


def test_ccnet_buckets_plan_broadcast_cuts(spark, sf_dir):
    """The tercile cut table (one row per language) must broadcast; the
    LM scoring underneath stays Python-free."""
    from parquet_metadata_explorer_spark.operators.text import ccnet_buckets

    plan = simple_plan(ccnet_buckets(load(spark, sf_dir, "documents")))
    assert "EvalPython" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 1, plan


def test_semantic_dedup_plan_shapes(spark, sf_dir):
    """The semantic-dedup hot stages must be the scale-correct plans:
    frozen-centroid assignment is a broadcast nested-loop join against
    the one-row candidate table with a MAP-SIDE array_min arg-min — no
    Window over a batch×k fan-out, no Python stage, and since r14 no
    aggregation/shuffle at all — and the within-cluster pair stage
    broadcasts the tiny cluster-size table."""
    from parquet_metadata_explorer_spark.operators.dedup import (
        _semantic_base,
        _semantic_pairs,
    )
    from parquet_metadata_explorer_spark.operators.similarity import (
        ivf_index,
    )

    e = load(spark, sf_dir, "embeddings")
    cents_nd, _ = ivf_index(e, n_centroids=8, iters=2)
    cents = {i: [float(x) for x in r] for i, r in enumerate(cents_nd)}
    base = _semantic_base(e, 0, 0, cents)
    plan_assign = simple_plan(base)
    assert "EvalPython" not in plan_assign, plan_assign
    assert "Window" not in plan_assign, plan_assign
    # the arg-min is a pure projection against the literal centroid
    # table (r15): no join of ANY kind, no shuffle, no aggregate
    assert "Join" not in plan_assign, plan_assign
    assert "Exchange hashpartitioning" not in plan_assign, plan_assign
    assert "Exchange rangepartitioning" not in plan_assign, plan_assign
    assert "HashAggregate" not in plan_assign, plan_assign
    pairs = _semantic_pairs(base, 0.45, 4096)
    plan_pairs = simple_plan(pairs)
    assert "EvalPython" not in plan_pairs, plan_pairs
    assert plan_pairs.count("BroadcastHashJoin") >= 1, plan_pairs


def test_dsir_plan_shapes(spark, sf_dir):
    """DSIR's hot path must be scale-correct: no Python stage anywhere,
    the target-id and log-ratio joins broadcast (the corpus never
    shuffles for them), and the keep_fraction variant has NO global
    single-partition Window — the sketch cut replaces the global sort."""
    from pyspark.sql import functions as F

    from parquet_metadata_explorer_spark.operators.sampling import (
        dsir_resample,
    )

    docs = load(spark, sf_dir, "documents")
    target = docs.filter(F.col("source").isin("src0", "src1"))
    topk = dsir_resample(docs, target, n_out=50)
    plan = simple_plan(topk)
    assert "EvalPython" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan  # target ids + lr

    frac = dsir_resample(docs, target, keep_fraction=0.3)
    plan_f = simple_plan(frac)
    assert "EvalPython" not in plan_f, plan_f
    # the sketch cut replaces the global rank: no row_number anywhere
    # (the only Windows left are the sketch's per-group cumulative sums
    # over <= n_buckets rows)
    assert "row_number" not in plan_f, plan_f


def test_bm25_plan_broadcast_probe_single_corpus_pass(spark, sf_dir):
    """BM25's scale contract: the postings relation is persisted (one
    corpus tokenize feeds doc lengths, document frequencies AND the
    scoring probe), every join resolves broadcast (query terms, doc
    lengths, corpus stats — no sort-merge anywhere locally), and the
    whole pipeline is JVM codegen (no Python stage)."""
    from parquet_metadata_explorer_spark.operators import text

    df = text.bm25_topk(
        load(spark, sf_dir, "documents"), [(1, "fast hash join")], k=5
    )
    plan = simple_plan(df)
    assert "SortMergeJoin" not in plan, plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan, plan
    assert plan.count("InMemoryTableScan") >= 3, plan  # postings reused
    assert plan.count("BroadcastHashJoin") >= 3, plan


def test_multimodal_neardup_codegen_after_hash(spark, sf_dir):
    """Everything after the dhash kernel is JVM codegen (banding is
    shift/mask arithmetic, the verify is bit_count), and BOTH sides of
    the band self-join read the persisted hash relation — the Arrow
    kernel materializes once, not once per join side (the r9 persist
    fix; the plan prints the cached MapInPandas inside each
    InMemoryTableScan, but the cache computes it once)."""
    from parquet_metadata_explorer_spark.operators import multimodal as mm

    pairs = mm.image_neardup_pairs(
        mm.to_binary_payloads(load(spark, sf_dir, "documents"))
    )
    plan = simple_plan(pairs)
    assert plan.count("InMemoryTableScan") == 2, plan
    assert "BatchEvalPython" not in plan, plan
    # no Python stage OUTSIDE the cached hash relation
    outside = plan.split("InMemoryTableScan")[0]
    assert "MapInPandas" not in outside, plan


def test_embedding_health_examples_are_group_limited(spark, sf_dir):
    """embedding_health's example ids must stay bounded map-side: the
    rank<=5 filter has to compile to WindowGroupLimit (per-partition
    prune BEFORE the shuffle) — a plain collect_list would hold
    corpus-sized per-defect state. Pinned so a Spark upgrade that stops
    planning the group-limit pushdown is caught here, not at 100 TB."""
    from parquet_metadata_explorer_spark.operators.similarity import (
        embedding_health,
    )

    emb = load(spark, sf_dir, "embeddings")
    plan = simple_plan(embedding_health(emb))
    assert "WindowGroupLimit" in plan


def test_quality_gate_is_map_only(spark, sf_dir):
    """r14: the rule battery + repetition metrics compute per-row (the
    sorted-gram run-length fold), so quality_filter and repetition_stats
    must plan as pure map pipelines — zero Exchanges, zero joins, one
    scan. Pinned so a future edit that reintroduces the (doc_id, gram)
    explode-shuffle or the stats doc_id self-join is caught here."""
    from parquet_metadata_explorer_spark.operators.text import (
        quality_filter,
        repetition_stats,
    )

    docs = load(spark, sf_dir, "documents")
    for df in (quality_filter(docs), repetition_stats(docs)):
        plan = simple_plan(df)
        assert count_exchanges(df) == 0, plan
        assert "Join" not in plan, plan
        assert plan.count("Scan parquet") == 1, plan


def test_preparation_chain_has_no_smj_and_single_gate_scan(spark, sf_dir):
    """r14: the preparation audit's stage chain must keep the fused gate
    (no corpus semi-joins) and the min-struct exact dedup — no
    SortMergeJoin anywhere in the 5-stage count union."""
    from parquet_metadata_explorer_spark.operators.pipelines import (
        preparation_audit,
    )
    from parquet_metadata_explorer_spark.cache import persist_scope

    docs = load(spark, sf_dir, "documents")
    with persist_scope():
        audit = preparation_audit(
            docs.filter(F.col("doc_id") % 20 != 0),
            docs.filter(F.col("doc_id") % 20 == 0),
        )
        plan = simple_plan(audit)
        assert "SortMergeJoin" not in plan, plan
