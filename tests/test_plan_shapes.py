"""Plan-shape regression tests: the scale guarantees the docs claim
(pushdown, pruning, broadcast, map-side combine, window group limits)
asserted against the actual physical plans — a correctness-preserving
refactor that silently loses a broadcast or a pushed filter fails here,
not at 100 TB.
"""

from __future__ import annotations

from etl_notifier_pipeline_spark.plans import get

SF_DIR = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = get(name).fn(spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_and_projection_pushed_to_scan(spark):
    plan = plan_of(spark, "q02_filter_project")
    assert "PushedFilters" in plan
    assert "EqualTo(event_type,error)" in plan and "GreaterThan(value,100.0)" in plan
    # column pruning: props/ts never leave the scan
    scan = [l for l in plan.splitlines() if "FileScan" in l][0]
    assert "props" not in scan and "ReadSchema" in scan


def test_point_lookup_pushes_key(spark):
    plan = plan_of(spark, "q03_point_lookup")
    assert "EqualTo(event_id,42)" in plan


def test_star_join_broadcasts_dims(spark):
    plan = plan_of(spark, "q05_revenue_by_nation")
    assert plan.count("BroadcastHashJoin") >= 4
    # the only hash-partition exchange is the final aggregation
    shuffles = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
    assert len(shuffles) == 1


def test_flagship_agg_has_partial_aggregation(spark):
    plan = plan_of(spark, "q01_pricing_summary")
    assert "partial_sum" in plan  # map-side combine before the shuffle
    scan = [l for l in plan.splitlines() if "FileScan" in l][0]
    for unused in ("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"):
        assert unused not in scan  # 7-of-11 column pruning


def test_topk_is_take_ordered(spark):
    assert "TakeOrderedAndProject" in plan_of(spark, "q04_topk_orders")


def test_topk_per_group_prunes_before_sort(spark):
    # Spark 3.5+/4.x pushes rank()<=k below the window sort
    assert "WindowGroupLimit" in plan_of(spark, "q08_topk_per_group")


def test_mutation_broadcasts_incoming_side(spark):
    plan = plan_of(spark, "m02_upsert")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_whole_stage_codegen_everywhere_hot(spark):
    df = get("q01_pricing_summary").fn(spark, SF_DIR)
    df.collect()  # AQE only shows codegen spans in the final plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    # '*(n)' node prefixes are the compact WholeStageCodegen markers
    import re

    assert re.search(r"\*\(\d+\) HashAggregate", plan)
    assert re.search(r"\*\(\d+\) (Project|Filter|ColumnarToRow)", plan)


def test_salted_agg_equals_plain_agg_and_spreads_key(spark):
    from etl_notifier_pipeline_spark.catalog import load_table
    from etl_notifier_pipeline_spark.operators.skew import salted_agg

    from pyspark.sql import functions as F

    ev = load_table(spark, SF_DIR, "events")
    plain = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.max("user_id").alias("mx")
    )
    salted = salted_agg(
        ev,
        ["event_type"],
        {"n": ("sum", F.count(F.lit(1))), "mx": ("max", F.max("user_id"))},
        n_salts=4,
        salt_source="event_id",
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    # structural: two aggregation stages — (key, salt) then key
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert plan.count("__salt") > 0


def test_salted_join_equals_plain_join(spark):
    from etl_notifier_pipeline_spark.catalog import load_table
    from etl_notifier_pipeline_spark.operators.skew import salted_join

    ev = load_table(spark, SF_DIR, "events").select("event_id", "user_id", "value")
    dim = spark.createDataFrame(
        [(u, f"seg{u % 3}") for u in range(150)], ["user_id", "segment"]
    )
    plain = ev.join(dim, "user_id").select("event_id", "segment")
    salted = salted_join(ev, dim, ["user_id"], n_salts=4).select("event_id", "segment")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_bpe_budget_prunes_and_partial_aggs(spark):
    plan = plan_of(spark, "x07_bpe_token_budget")
    scan = [l for l in plan.splitlines() if "FileScan" in l][0]
    for unused in ("doc_id", "source", "n_chars"):
        assert unused not in scan  # only lang + text leave the scan
    assert "partial_sum" in plan  # map-side combine before the lang shuffle


def test_volume_shipping_broadcasts_both_dim_bundles(spark):
    """q40: supplier+nation and customer+nation ship as broadcasts;
    the only hash shuffles belong to lineitem⨝orders + the final agg —
    no dimension-side exchange."""
    plan = plan_of(spark, "q40_volume_shipping")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_sales_opportunity_is_one_pass(spark, monkeypatch):
    """q42: the scalar average rides in as a broadcast 1-row aggregate
    (no eager count/collect at plan-construction), and the no-big-order
    predicate is a broadcast anti-join."""
    from pyspark.sql import DataFrame

    def boom(self):
        raise AssertionError("eager action during plan construction")

    monkeypatch.setattr(DataFrame, "count", boom)
    monkeypatch.setattr(DataFrame, "collect", boom)
    df = get("q42_sales_opportunity").fn(spark, SF_DIR)
    monkeypatch.undo()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan  # 1-row avg crossJoin
    assert "LeftAnti, BuildRight" in plan  # broadcast anti-join


def test_small_quantity_revenue_join_shape(spark):
    """q43: the correlated average decorrelates into a WINDOW over one
    scan — no join at all, and the final per-part aggregate reuses the
    window's l_partkey partitioning (single exchange end-to-end)."""
    plan = plan_of(spark, "q43_small_quantity_revenue")
    assert "Window" in plan and "Join" not in plan
    shuffles = [
        l for l in plan.splitlines() if "Exchange hashpartitioning" in l
    ]
    assert len(shuffles) <= 1


def test_decontamination_broadcasts_eval_side(spark):
    """x14: the eval-set shingles (tiny) broadcast; the corpus side
    never shuffles for the join."""
    plan = plan_of(spark, "x14_decontamination")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_label_centroids_partial_aggregates(spark):
    """s06: the (label, pos) aggregate partial-aggregates map-side so
    the shuffle carries |labels| x dim rows, not every element."""
    plan = plan_of(spark, "s06_label_centroids")
    assert "partial_sum" in plan


def test_tfidf_is_one_lazy_job(spark, monkeypatch):
    """x08's corpus size N must ride inside the plan (broadcast scalar
    aggregate), not run as a separate eager count() job during query
    construction — at 100 TB that was a second full (if column-pruned)
    pass scheduled before any real work."""
    from pyspark.sql import DataFrame

    def boom(self):
        raise AssertionError("eager count() during plan construction")

    monkeypatch.setattr(DataFrame, "count", boom)
    df = get("x08_tfidf_terms").fn(spark, SF_DIR)  # must stay lazy
    monkeypatch.undo()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan  # 1-row N frame crossJoin
    assert plan.count("FileScan") <= 2  # text scan + zero-column count scan


def test_interval_join_broadcasts_no_shuffle(spark):
    plan = plan_of(spark, "st08_interval_join")
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan  # equi-key carried by broadcast


def test_ivf_broadcasts_probes_over_corpus(spark):
    plan = plan_of(spark, "s04_ivf_topk")
    assert "BroadcastHashJoin" in plan  # probe set broadcast, corpus unshuffled
    # the only hash exchange is the top-k ranking window
    shuffles = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
    assert len(shuffles) == 1 and "query_id" in shuffles[0]


def test_notification_render_is_pure_projection(spark):
    plan = plan_of(spark, "st07_notification_render")
    assert "Exchange" not in plan  # scan + filter + format_string only
    assert "format_string" in plan or "Project" in plan


def test_partition_pruning_on_partitioned_layout(spark, tmp_path):
    """Hive-partitioned output (the 100 TB layout for facet columns
    like lang/date) prunes non-matching directories at planning time —
    the filter shows up as a PartitionFilter, not a data filter."""
    from etl_notifier_pipeline_spark.catalog import load_table

    path = str(tmp_path / "docs_by_lang")
    load_table(spark, SF_DIR, "documents").write.partitionBy("lang").parquet(path)
    df = spark.read.parquet(path).filter("lang = 'en'").select("doc_id")
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = [l for l in plan.splitlines() if "FileScan" in l][0]
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters")[1][:80]
    # the row-group data filters must NOT contain lang — it never
    # reaches the parquet reader
    assert df.count() > 0


def test_disjunctive_predicate_splits_per_side(spark):
    """Q19 shape: Catalyst must extract the single-side conjuncts of
    the OR-of-ANDs — the quantity envelope prunes the lineitem scan,
    the brand/size union prunes the broadcast part build."""
    plan = plan_of(spark, "q54_disjunctive_revenue")
    scans = [l for l in plan.splitlines() if "FileScan" in l]
    li_scan = [l for l in scans if "lineitem" in l][0]
    part_scan = [l for l in scans if "part.parquet" in l][0]
    assert "l_quantity" in li_scan.split("PushedFilters")[1]
    assert "p_brand" in part_scan.split("PushedFilters")[1]
    assert "BroadcastHashJoin" in plan


def test_min_per_group_is_single_scan_window(spark):
    """Q2 shape: the per-part min must come from a window over the
    aggregate, not a join-back that re-scans lineitem."""
    plan = plan_of(spark, "q49_min_cost_supplier")
    scans = [l for l in plan.splitlines() if "FileScan" in l and "lineitem" in l]
    assert len(scans) == 1
    assert "Window" in plan


def test_sole_late_supplier_single_scan_and_topk(spark):
    """Q21 shape: decorrelation must not re-scan lineitem for the
    per-order counts; top-20 collapses to TakeOrderedAndProject."""
    plan = plan_of(spark, "q56_late_sole_suppliers")
    scans = [l for l in plan.splitlines() if "FileScan" in l and "lineitem" in l]
    assert len(scans) == 1
    assert "TakeOrderedAndProject" in plan


def test_forecast_pushes_all_predicates(spark):
    """Q6 shape: discount/quantity predicates and the 4-column
    projection must reach the parquet scan."""
    plan = plan_of(spark, "q58_revenue_forecast")
    scan = [l for l in plan.splitlines() if "FileScan" in l][0]
    pushed = scan.split("PushedFilters")[1]
    assert "l_discount" in pushed and "l_quantity" in pushed
    assert "partial_sum" in plan
    assert "l_orderkey" not in scan  # column pruning


def test_returned_items_prunes_both_scans(spark):
    """Q10 shape: returnflag prunes lineitem, the year filter prunes
    orders, both BEFORE their shuffle join; top-20 is TakeOrdered."""
    plan = plan_of(spark, "q57_returned_items")
    scans = [l for l in plan.splitlines() if "FileScan" in l]
    li_scan = [l for l in scans if "lineitem" in l][0]
    assert "EqualTo(l_returnflag,R)" in li_scan
    assert "TakeOrderedAndProject" in plan


def test_no_row_python_in_any_registered_query(spark):
    """Global hygiene sweep: NO registered batch query may plan a
    row-at-a-time Python eval node (BatchEvalPython); Arrow-batched
    pandas nodes are allowed only on the explicit whitelist (the
    multimodal decode path, which is pandas by design). A UDF sneaking
    into a hot path fails here, not at 100 TB."""
    from etl_notifier_pipeline_spark.plans import specs

    PANDAS_OK = {
        "xm01_multimodal_features",
        "xm03_media_near_dup",  # same codec path as xm01 feeding s01's plan
        "xm05_media_near_dup_contract",  # xm03's fake-codec oracle twin
        "xm04_audio_stats",  # WAV header walk + decode are Arrow passes
        # Arrow-batched by design: IVF cell assignment and PQ encode are
        # numpy matmuls over the embedding column (extensions/similarity.py);
        # the surrounding join/rerank stays JVM-side.
        "s04_ivf_topk",
        "s08_pq_topk",
        "s14_ivfpq_topk",  # IVFADC: residual encode/LUTs are Arrow passes
        "s15_ivf_index_serve",  # same Arrow assign pass as s04, via ivf_build
        "s16_ivf_serve_tombstones",  # ditto, + broadcast anti-join mask
        "s17_vector_store_serve",  # ditto, mask fed by the CDC feed
        "s18_ivf_incremental_append",  # ditto, assign pass on the increment
        "st17_streaming_vector_serve",  # ditto, ivf_build assign pass
        "s19_ivfpq_incremental_append",  # ditto, assign + encode passes
        # s09 shares s04's IVF cell assignment and scores intra-cell
        # candidate pairs with an Arrow-batched numpy dot (the r4 perf fix
        # that made it sub-quadratic); the blocking join stays JVM-side.
        "s09_semantic_dedup",
        "s20_semantic_dedup_one_cell",  # same s09 machinery, one cell
        "s22_ivfpq_full_probe_serve",  # same Arrow passes as s14
        "s23_pq_exhaustive_rerank",  # same Arrow encode/LUT passes as s08
    }
    offenders = {}
    for name, sp in specs().items():
        if sp.category == "streaming" and sp.oracle is None:
            # side-effecting stream simulations: fn() RUNS a query to a
            # memory sink, so the inspectable plan is the post-hoc sink
            # scan, not the stream — their pandas-state internals are
            # covered by dedicated streaming tests instead.
            continue
        df = sp.fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().sparkPlan().toString()
        if "BatchEvalPython" in plan:
            offenders[name] = "BatchEvalPython"
        elif name not in PANDAS_OK and (
            "MapInPandas" in plan
            or "FlatMapGroupsInPandas" in plan
            or "ArrowEvalPython" in plan
        ):
            offenders[name] = "pandas node off-whitelist"
    assert not offenders, offenders


def test_scalar_max_and_correlated_avg_scan_fact_once(spark):
    """Q15/Q17 shapes: the scalar-max and per-group-average subqueries
    must not re-scan the fact table — the window-over-aggregate form
    (q44) and window-over-fact form (q43) both keep exactly one
    lineitem FileScan (the join-back rewrite scans twice: exchange
    reuse misses cross-branch pruning differences)."""
    for name in ("q44_top_supplier", "q43_small_quantity_revenue"):
        plan = plan_of(spark, name)
        scans = [
            l for l in plan.splitlines() if "FileScan" in l and "lineitem" in l
        ]
        assert len(scans) == 1, name
        assert "Window" in plan, name


def test_multi_distinct_is_one_expand_job(spark):
    """q59: two filtered DISTINCT aggregates plan as ONE Expand-based
    aggregate over a single scan — not a job per distinct column."""
    plan = plan_of(spark, "q59_multi_distinct")
    assert "Expand" in plan
    scans = [l for l in plan.splitlines() if "FileScan" in l]
    assert len(scans) == 1


def test_share_of_region_no_second_scan(spark):
    """q60: the parent (region) total is a window over the nation
    aggregate — one fact scan, no join-back."""
    plan = plan_of(spark, "q60_share_of_region")
    scans = [l for l in plan.splitlines() if "FileScan" in l and "lineitem" in l]
    assert len(scans) == 1
    assert "Window" in plan


def test_per_source_cap_partial_group_limit(spark):
    # WindowGroupLimit appears in BOTH partial (pre-shuffle) and final
    # mode — the map-side pruning that absorbs hot-domain skew.
    plan = plan_of(spark, "x24_per_source_cap")
    assert plan.count("WindowGroupLimit") == 2
    assert "Partial" in plan


def test_block_pack_big_window_is_partitioned(spark):
    # The per-row prefix-sum window must be PARTITIONED (by the key
    # group); the only single-partition exchange feeds the tiny
    # per-group offsets frame, which then broadcasts.
    plan = plan_of(spark, "x22_block_pack_spans")
    windows = [l for l in plan.splitlines() if "windowspecdefinition" in l]
    partitioned = [l for l in windows if "windowspecdefinition(__g" in l]
    assert partitioned, "big-frame window lost its partitioning"
    assert plan.count("BroadcastHashJoin") == 1
    # exact integer block arithmetic (no double division of positions)
    assert "as double) / 4096" not in plan


def test_oov_rate_broadcasts_vocab_and_reuses_token_frame(spark):
    plan = plan_of(spark, "x23_oov_rate")
    assert "BroadcastHashJoin" in plan
    assert plan.count("InMemoryTableScan") == 2  # persisted token frame
    assert "TakeOrderedAndProject" in plan  # deterministic top-k vocab


def test_large_volume_orders_shape(spark):
    # HAVING-reduced qualifying set broadcasts into the orders join;
    # one shuffle (the orderkey aggregate); global top-100 is a heap.
    plan = plan_of(spark, "q61_large_volume_orders")
    assert plan.count("BroadcastHashJoin") == 2
    assert "TakeOrderedAndProject" in plan
    shuffles = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
    assert len(shuffles) == 1


def test_ordered_export_is_range_partitioned_sort(spark):
    # a global ORDER BY must plan as a range-partition exchange (every
    # partition a disjoint sorted key range) — not a single-partition
    # sort, not a heap
    plan = plan_of(spark, "q62_ordered_export")
    assert "Exchange rangepartitioning" in plan
    assert "TakeOrderedAndProject" not in plan
    assert "Exchange SinglePartition" not in plan


def test_outer_interval_join_keeps_range_in_condition(spark):
    # the interval bounds must sit IN the join (post-join filtering
    # would drop the NULL-extended rows); unmatched signups survive
    plan = plan_of(spark, "st11_interval_join_outer")
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan
    assert "LeftOuter" in plan


def test_pareto_cumsum_has_no_single_partition_row_window(spark):
    """q80's cumulative revenue share must never sort the |parts| frame
    in one partition (the r4 verdict's escape hatch, now code): the
    per-row running sum executes as a window PARTITIONED by the range
    bucket, and the only SinglePartition exchanges in the plan carry
    aggregate-sized frames (the n_buckets-row offsets, the 1-row grand
    total) — never row data."""
    import re

    plan = plan_of(spark, "q80_pareto_abc")
    # the per-row cumulative window is bucket-partitioned ...
    assert re.search(r"windowspecdefinition\(__b#\d+, r#\d+ DESC", plan), plan
    assert "Exchange hashpartitioning(__b" in plan
    # ... and NO window orders the row frame globally (a global-order
    # window spec would start with the r DESC sort key, no partition)
    assert not re.search(r"windowspecdefinition\(r#\d+ DESC", plan), plan
    # the range repartition that defines the buckets is present
    assert re.search(r"rangepartitioning\(r#\d+ DESC", plan), plan


def test_filtered_vector_search_pushes_metadata_filter(spark):
    """s12: the metadata predicate must reach the parquet scan of the
    corpus leg (filtered search costs the selectivity, not the
    corpus) and the query side must broadcast — one corpus scan, no
    corpus shuffle before scoring."""
    plan = plan_of(spark, "s12_filtered_cosine_topk")
    assert "PushedFilters" in plan
    assert "In(label, [2,5,7])" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_x36_funnel_reuses_persisted_frames(spark):
    """x36 chains gate -> dedup -> cap -> accounting over PERSISTED
    narrow frames: all three accounting branches must read an
    InMemoryTableScan (g from the gated cache; u and the cap window
    from the uniq cache) — a branch showing a bare documents FileScan
    outside an InMemoryRelation re-derived the funnel from the source.
    The cap stays a WindowGroupLimit (partial pass absorbs per-source
    skew map-side) and no cached frame carries the document body (the
    md5 happens in the first projection)."""
    plan = plan_of(spark, "x36_prep_pipeline")
    assert plan.count("InMemoryTableScan") >= 3, plan
    assert "WindowGroupLimit" in plan
    # cached output columns are the narrow funnel schema, never text
    for chunk in plan.split("InMemoryTableScan")[1:]:
        cols = chunk.split("]", 1)[0]
        assert "text" not in cols, cols
