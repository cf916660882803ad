"""Physical-plan audits: the scale posture, enforced.

These tests pin the plan shapes that matter at 100 TB — filters reaching
the parquet scan, column pruning, broadcastable dimensions actually
broadcast, distributed top-k instead of global windows, and no
row-at-a-time Python in any query plan. A correctness-green query that
regresses here would still pass the oracle while being 10-100× slower at
scale; this suite fails it early.
"""

import pytest

import __spark_entry__ as entry


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_filters_pushed_and_columns_pruned(spark, sf_dir):
    p = plan_of(entry.q_tpch_q6(spark, sf_dir))
    assert "PushedFilters: [IsNotNull" in p
    # projection pruning: the lineitem scan reads only the 4 needed columns
    assert (
        "ReadSchema: struct<l_quantity:double,l_extendedprice:double,"
        "l_discount:double,l_shipdate:timestamp_ntz>" in p
    )


def test_q14_dimension_broadcast(spark, sf_dir):
    p = plan_of(entry.q_tpch_q14(spark, sf_dir))
    assert "BroadcastHashJoin" in p or "BroadcastExchange" in p


def test_q10_distributed_topk(spark, sf_dir):
    # TakeOrdered limits driver-side data to k rows; a global Window sort
    # would move the whole aggregate to one partition
    p = plan_of(entry.q_tpch_q10(spark, sf_dir))
    assert "TakeOrderedAndProject" in p


def test_token_topk_distributed(spark, sf_dir):
    p = plan_of(entry.q_token_topk(spark, sf_dir))
    assert "TakeOrderedAndProject" in p


def test_rolling_window_partitioned(spark, sf_dir):
    # the window must partition by user_id — a global ordered window would
    # single-task the whole table
    p = plan_of(entry.q_rolling_avg(spark, sf_dir))
    assert "Window" in p and "user_id" in p


@pytest.mark.parametrize(
    "name",
    # ivm_* excluded: building a query's frame there RUNS a full CDC cycle
    # (temp ChangeTables, merges, two drains — ~15 s each) and the returned
    # frame is a bare snapshot scan, so the plan assertion would be
    # vacuous; their Python-free-ness is covered by the operators they
    # compose, all parametrized here via their batch queries
    sorted(n for n in entry.queries() if not n.startswith("ivm_")),
)
def test_no_row_at_a_time_python(spark, sf_dir, name):
    """No query plan may contain BatchEvalPython (row-at-a-time Python UDF).
    Arrow-batched nodes (MapInPandas / ArrowEvalPython) are the sanctioned
    Python escape hatch for media decode."""
    df = entry.queries()[name](spark, sf_dir)
    assert "BatchEvalPython" not in plan_of(df), name


def test_simhash_blocked_no_cross_product(spark):
    """The default simhash_pairs path must be a bucketed equi-join —
    pigeonhole segment blocking — never the all-pairs nested-loop join
    (which is kept only behind blocked=False as the small-scale oracle)."""
    from streamjoin_spark.operators import dedup

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d f")], "doc_id long, text string"
    )
    p = plan_of(dedup.simhash_pairs(docs))
    assert "NestedLoop" not in p and "CartesianProduct" not in p
    # contrast: the oracle tier IS all-pairs
    p_oracle = plan_of(dedup.simhash_pairs(docs, blocked=False))
    assert "NestedLoop" in p_oracle or "CartesianProduct" in p_oracle


def test_ngram_jaccard_cap_in_plan(spark):
    """The shipped jaccard query keeps its hot-shingle guard: a broadcast
    anti-join prunes high-document-frequency shingles before the self-join."""
    from streamjoin_spark.operators import dedup

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d f")], "doc_id long, text string"
    )
    import re

    p = plan_of(dedup.ngram_jaccard_pairs(docs))
    assert "LeftAnti" in p, "document-frequency cap missing from the plan"
    # the pair join itself must be an equi-join keyed on the shingle (the
    # only NestedLoop allowed is the 1-row scalar corpus-count broadcast)
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \[shingle", p)


def test_ngram_jaccard_sizes_not_broadcast(spark):
    """The per-doc `sizes` frames are corpus-sized (one row per document),
    so they must never carry an unconditional broadcast hint — at 100 TB
    that broadcast OOMs the driver (VERDICT r3 finding #1). With
    auto-broadcast disabled, the id-keyed size joins must compile to
    shuffle joins; a BroadcastHashJoin on doc_a/doc_b here would mean an
    explicit hint sneaked back in (hints override the threshold)."""
    import re

    from streamjoin_spark.operators import dedup

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d f")], "doc_id long, text string"
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        p = plan_of(dedup.ngram_jaccard_pairs(docs))
        pc = plan_of(dedup.ngram_containment_pairs(docs, threshold=0.1))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    for plan in (p, pc):   # both scorers ride the shared candidate machinery
        assert re.search(r"(SortMergeJoin|ShuffledHashJoin) \[doc_a", plan)
        assert re.search(r"(SortMergeJoin|ShuffledHashJoin) \[doc_b", plan)
        assert not re.search(r"BroadcastHashJoin \[doc_[ab]", plan)


def test_q7_nation_legs_broadcast(spark, sf_dir):
    """Both 2-row nation dimensions must broadcast (they act as
    semi-filters); a shuffled 6-way chain would pay two needless exchanges."""
    p = plan_of(entry.q_tpch_q7(spark, sf_dir))
    assert p.count("BroadcastHashJoin") >= 2


def test_stratified_sample_window_partitioned(spark, sf_dir):
    """The per-stratum window must partition by event_type — a global
    ordered window would single-task the whole table."""
    p = plan_of(entry.q_stratified_sample(spark, sf_dir))
    assert "Window" in p and "event_type" in p


def test_query_oracle_key_parity():
    """Every queries() entry must have an oracle_sql() twin and vice versa
    (the driver's correctness gate covers exactly this pairing)."""
    assert set(entry.queries()) == set(entry.oracle_sql())


def test_q8_dimensions_broadcast(spark, sf_dir):
    p = plan_of(entry.q_tpch_q8(spark, sf_dir))
    assert p.count("BroadcastHashJoin") >= 4   # part, supplier-nation, cust-nation, region


def test_bm25_broadcasts_stats_and_topk(spark, sf_dir):
    """df/N/avgdl legs must broadcast and the tail must be a distributed
    TakeOrdered — BM25's only full-corpus pass is the scan+explode map."""
    p = plan_of(entry.q_bm25_topk(spark, sf_dir))
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p
    assert "TakeOrderedAndProject" in p


def test_decontaminate_broadcasts_eval(spark, sf_dir):
    """The eval shingle set must broadcast: the training corpus is never
    shuffled for the overlap check."""
    p = plan_of(entry.q_decontaminate(spark, sf_dir))
    assert "BroadcastHashJoin" in p


def test_q17_threshold_broadcast(spark, sf_dir):
    """The per-part avg-quantity threshold (correlated-subquery analog)
    must come back as a broadcast, not a shuffled join."""
    p = plan_of(entry.q_tpch_q17(spark, sf_dir))
    assert "BroadcastHashJoin" in p


def test_q21_no_cartesian(spark, sf_dir):
    """The EXISTS/NOT-EXISTS correlation must lower to semi/anti hash or
    sort-merge joins keyed on the order — never a nested-loop over
    lineitem."""
    p = plan_of(entry.q_tpch_q21(spark, sf_dir))
    assert "CartesianProduct" not in p
    assert "LeftSemi" in p and "LeftAnti" in p


def test_gap_fill_window_partitioned(spark, sf_dir):
    """The forward-fill window must partition by event_type — a global
    ordered window would single-task the densified series."""
    p = plan_of(entry.q_gap_fill(spark, sf_dir))
    assert "Window" in p and "event_type" in p


def test_fuzzy_match_blocked_no_cross_product(spark, sf_dir):
    """Blocked fuzzy matching must be a (block-key) equi-join — never a
    corpus cross product."""
    p = plan_of(entry.q_fuzzy_match(spark, sf_dir))
    assert "CartesianProduct" not in p and "NestedLoop" not in p


def test_triangle_count_equi_joins_only(spark, sf_dir):
    """Wedge closure must run as node-keyed equi-joins on the thresholded
    edge list — no nested-loop anywhere in the plan."""
    p = plan_of(entry.q_triangle_count(spark, sf_dir))
    assert "CartesianProduct" not in p and "NestedLoop" not in p


def test_ntile_window_partitioned(spark, sf_dir):
    p = plan_of(entry.q_ntile_quartiles(spark, sf_dir))
    assert "Window" in p and "o_orderpriority" in p


def test_cms_counters_broadcast_and_topk(spark, sf_dir):
    """The counter table (depth x width rows) must broadcast to the probe
    and the tail must be a distributed top-k."""
    p = plan_of(entry.q_cms_topk(spark, sf_dir))
    assert "BroadcastHashJoin" in p
    assert "TakeOrderedAndProject" in p


def test_ivf_centroid_frame_k_bounded(spark, sf_dir):
    """The IVF centroid sample must compile to a k-bounded
    TakeOrderedAndProject (fixed n_centroids rows — FAISS nlist), never an
    O(corpus) filter: the r4 VERDICT's `id % step` law grew the broadcast
    and the O(N·K) assignment without bound at 100×."""
    for q in (entry.q_ann_ivf_topk, entry.q_ann_ivf_pq):
        p = plan_of(q(spark, sf_dir))
        assert "TakeOrderedAndProject(limit=16" in p, q.__name__
        assert "BroadcastHashJoin" in p


def test_ivf_pq_probes_broadcast_no_python(spark, sf_dir):
    """IVF-PQ: the probe side of the candidate join must broadcast (the
    corpus inverted lists are the big side and stay put), and the whole
    quantize/reconstruct path must be codegen expressions — any
    BatchEvalPython here would put Python in the per-vector hot loop."""
    p = plan_of(entry.q_ann_ivf_pq(spark, sf_dir))
    assert "BroadcastHashJoin" in p
    assert "BatchEvalPython" not in p


def test_perplexity_bands_thresholds_broadcast(spark, sf_dir):
    """The per-language threshold frame (k-langs rows) must broadcast for
    the map-only banding join, and the vocab log-prob frame must broadcast
    back for scoring — no corpus re-shuffle, no Python anywhere."""
    p = plan_of(entry.q_perplexity_bands(spark, sf_dir))
    assert "BroadcastHashJoin" in p
    assert "BatchEvalPython" not in p


def test_video_hot_frame_cap_anti_join(spark, sf_dir):
    """The hot-frame guard must be a broadcast anti-join (the hot set is
    tiny by construction) and the pairing an equi-join on the fingerprint
    — no cartesian anywhere."""
    p = plan_of(entry.q_multimodal_video_neardup(spark, sf_dir))
    assert "LeftAnti" in p
    assert "BroadcastExchange" in p
    assert "CartesianProduct" not in p


def test_robust_outliers_stats_broadcast(spark, sf_dir):
    """The per-group (median, MAD) table is k-groups-sized and must
    broadcast back for map-only flagging; the cumulative windows must be
    partitioned (they run over the bin histogram, never a global sort)."""
    p = plan_of(entry.q_robust_outliers(spark, sf_dir))
    assert "BroadcastHashJoin" in p
    assert "BatchEvalPython" not in p


def test_bloom_prune_broadcast_joins(spark, sf_dir):
    """The Bloom membership checks must be broadcast joins on the probe
    side — the probe is never shuffled for the prune. r13: they are
    broadcast INNER joins (left join + not-null filter), NOT LeftSemi —
    PushDownLeftSemiAntiJoin would push semis below the spread_scan
    repartition and serialize the md5 probe hashing into the one-task
    scan stage. The repartition must sit BELOW the first probe join."""
    p = plan_of(entry.q_bloom_prune(spark, sf_dir))
    assert p.count(", Inner, BuildRight") >= 3
    assert "LeftSemi" not in p
    assert "BroadcastExchange" in p
    # single probe-side scan: the one-pass r13 shape
    assert p.count("lineitem.parquet") == 1
    # probe hashing parallelized: toString prints the tree top-down, so
    # the spread repartition (child) must appear AFTER the probe joins
    # (parents); a pushed-down join would print below the exchange
    lines = p.splitlines()
    exch_line = min(
        i for i, ln in enumerate(lines) if "REPARTITION_BY_NUM" in ln
    )
    join_lines = [i for i, ln in enumerate(lines) if ", Inner, BuildRight" in ln]
    assert len(join_lines) >= 3
    assert max(join_lines[:3]) < exch_line


def test_audio_features_arrow_batched_windows(spark, sf_dir):
    """Audio windows are sliced JVM-side ahead of the single Arrow Python
    stage: the plan has a Generate (explode) feeding MapInPandas, and the
    Python stage input carries the bounded chunk, not the whole payload."""
    p = plan_of(entry.q_multimodal_audio_features(spark, sf_dir))
    assert "MapInPandas" in p or "ArrowEvalPython" in p
    assert "Generate" in p
    assert "BatchEvalPython" not in p


def test_merge_intervals_window_partitioned(spark, sf_dir):
    """The running max-end window must partition by event_type — a global
    ordered window would single-task all spans; and there is no self-join."""
    p = plan_of(entry.q_merge_intervals(spark, sf_dir))
    assert "Window" in p and "event_type" in p
    assert "Join" not in p


def test_chunk_and_token_scans_pruned(spark, sf_dir):
    """chunk_documents reads only (doc_id, text); token_stats only
    (text, lang) — projection pruning reaches the parquet scan."""
    p1 = plan_of(entry.q_chunk_documents(spark, sf_dir))
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in p1
    p2 = plan_of(entry.q_token_stats(spark, sf_dir))
    assert "ReadSchema: struct<text:string,lang:string>" in p2


def test_approx_quantiles_no_global_sort(spark, sf_dir):
    """The sketch path must never globally sort the data: quantiles come
    from group-key hash aggregations plus a ≤n_bins-per-group window —
    a rangepartitioning exchange would mean a data-scale sort crept in."""
    p = plan_of(entry.q_approx_quantiles(spark, sf_dir))
    assert "rangepartitioning" not in p.lower(), p
    assert "HashAggregate" in p


def test_kmeans_seeds_topk_and_centroids_broadcast(spark, sf_dir):
    """Seeds come from a distributed top-k (never a full-corpus global
    window), the k-row centroid table is broadcast into every assignment
    join (map-only assignment), and the corpus is never sort-shuffled."""
    from streamjoin_spark.operators.clustering import seed_centroids

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # seeds: distributed top-k (the localCheckpoint in kmeans() hides this
    # stage from the composed query plan, so pin it on the stage itself)
    assert "TakeOrderedAndProject" in plan_of(seed_centroids(emb, 8))
    p = plan_of(entry.q_kmeans_clusters(spark, sf_dir))
    assert "BroadcastExchange" in p
    # the only range partitioning allowed is the 8-row final ORDER BY on
    # cluster_id — the corpus itself must never be sort-shuffled
    import re

    for m in re.findall(r"rangepartitioning\(([^)]*)", p):
        assert "cluster_id" in m, p


def test_expectations_single_aggregate_pass(spark, sf_dir):
    """All row rules fold into ONE aggregation over ONE orders scan — the
    report must not re-scan per rule (5 rules => still 2 scans total:
    orders once for rules, lineitem once for the FK row, plus the FK
    probe's orders read)."""
    p = plan_of(entry.q_expectations_report(spark, sf_dir))
    import re

    assert len(re.findall(r"Scan parquet.*orders", p)) <= 2, p
    assert len(re.findall(r"Scan parquet.*lineitem", p)) <= 2, p


def test_funnel_no_global_window(spark, sf_dir):
    """Every funnel step is a user-keyed join + partial MIN aggregate —
    no window over the raw event stream, no cartesian anywhere; the only
    cross-join is the 1-row broadcast base count."""
    p = plan_of(entry.q_funnel_events(spark, sf_dir))
    assert "WindowExec" not in p and "Window " not in p
    assert "CartesianProduct" not in p


def test_passage_dedup_window_on_hash(spark, sf_dir):
    """First-occurrence ranking partitions by the passage hash (uniform
    key, duplicate-set-sized groups) — never a global window."""
    p = plan_of(entry.q_passage_dedup(spark, sf_dir))
    assert "md5(" in p and "Window" in p
    # row_number's window spec must carry a partition expression that is
    # NOT the doc id (the hash lands in a projected _w0 column)
    import re

    m = re.search(r"row_number\(\) windowspecdefinition\(([^,]+),", p)
    assert m is not None and not m.group(1).startswith("doc_id"), p


def test_corr_matrix_single_scan(spark, sf_dir):
    """One lineitem scan feeds every pair's sums (single 1-row aggregate;
    the tall shape reuses that aggregate, not the scan)."""
    p = plan_of(entry.q_corr_matrix(spark, sf_dir))
    import re

    assert len(re.findall(r"Scan parquet", p)) == 1, p


def test_kmv_set_ops_distributed_topk(spark, sf_dir):
    """Every sketch is a TakeOrdered top-k — no global sort of the hash
    space reaches an exchange."""
    p = plan_of(entry.q_kmv_set_ops(spark, sf_dir))
    assert "TakeOrderedAndProject" in p
    assert "rangepartitioning" not in p.lower(), p


def test_mixture_sample_partitioned_window(spark, sf_dir):
    p = plan_of(entry.q_mixture_sample(spark, sf_dir))
    import re

    m = re.search(r"row_number\(\) windowspecdefinition\(source", p)
    assert m is not None, p
