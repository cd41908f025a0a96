"""Unit tests for pipeline operators on synthetic micro-tables:
connected-components closure (multi-hop chains, singletons) and as-of
join semantics (ties, no-prior-order NULLs, strictly-later orders).
Differential coverage at testdata scale lives in test_oracle_parity.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.dedup.clusters import connected_components


def test_connected_components_chain_and_singleton(spark):
    # 1-2-3 chain (transitive closure!), 4-5 pair, 6 singleton
    nodes = spark.createDataFrame([(i,) for i in range(1, 7)], ["doc_id"])
    edges = spark.createDataFrame(
        [(2, 3), (1, 2), (4, 5)], ["doc_a", "doc_b"]
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(nodes, edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6}


def test_connected_components_long_chain_converges(spark):
    # a 12-hop path exercises multi-round propagation + checkpointing
    # (small_graph_edges=0 forces the distributed loop past the
    # union-find escape hatch)
    n = 13
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["doc_a", "doc_b"]
    )
    got = connected_components(nodes, edges, small_graph_edges=0)
    assert got.where(F.col("cluster_id") != 0).count() == 0


def test_connected_components_paths_agree(spark):
    # driver union-find (small-graph path) and distributed min-label
    # propagation must reach the identical fixpoint on a mixed graph:
    # two chains, a clique, shared nodes, singletons
    edges_py = (
        [(i, i + 1) for i in range(0, 6)]          # 0..6 chain
        + [(10, 12), (12, 14), (10, 14)]           # triangle
        + [(20, 21)]                               # pair
    )
    node_ids = sorted({x for e in edges_py for x in e} | {30, 31})
    nodes = spark.createDataFrame([(i,) for i in node_ids], ["doc_id"])
    edges = spark.createDataFrame(edges_py, ["doc_a", "doc_b"])
    uf = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(nodes, edges).collect()
    }
    dist = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(
            nodes, edges, small_graph_edges=0
        ).collect()
    }
    # distributed path labels only edge-touched nodes; callers
    # coalesce untouched nodes to their own id — mirror that here
    dist = {d: dist.get(d, d) for d in node_ids}
    assert uf == dist
    assert uf[30] == 30 and uf[31] == 31 and uf[6] == 0 and uf[14] == 10


def test_asof_join_tie_and_null(spark, sf_dir, tmp_path):
    # build a tiny parquet fixture shaped like the testdata tables
    events = spark.createDataFrame(
        [
            (1, "2020-01-05", 10),  # order exactly at event ts -> match
            (2, "2020-01-04", 10),  # order strictly after -> prior one
            (3, "2020-01-01", 10),  # before any order -> NULL
            (4, "2020-01-09", 20),  # two orders same day -> max orderkey
        ],
        ["event_id", "d", "user_id"],
    ).select(
        "event_id",
        F.col("d").cast("timestamp").alias("ts"),
        "user_id",
        F.lit("x").alias("event_type"),
        F.lit(0.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    orders = spark.createDataFrame(
        [
            (100, 10, "2020-01-02"),
            (101, 10, "2020-01-05"),
            (102, 20, "2020-01-08"),
            (103, 20, "2020-01-08"),
        ],
        ["o_orderkey", "o_custkey", "d"],
    ).select(
        "o_orderkey",
        "o_custkey",
        F.lit("O").alias("o_orderstatus"),
        F.lit(1.0).alias("o_totalprice"),
        F.col("d").cast("timestamp").alias("o_orderdate"),
        F.lit("1-URGENT").alias("o_orderpriority"),
    )
    events.write.parquet(str(tmp_path / "events.parquet"))
    orders.write.parquet(str(tmp_path / "orders.parquet"))

    from aliyun_emapreduce_datasources_spark.operators.pipeline import asof_join_events

    got = {
        r["event_id"]: r["last_order_key"]
        for r in asof_join_events(spark, str(tmp_path)).collect()
    }
    assert got == {1: 101, 2: 100, 3: None, 4: 103}


def test_approx_quantiles_track_exact(spark, sf_dir):
    """approx_percentile(accuracy=1000) must land within the
    neighboring-rank window of the exact percentiles per language."""
    from aliyun_emapreduce_datasources_spark.operators.pipeline import (
        doc_length_quantiles,
        doc_length_quantiles_approx,
    )

    exact = {r.lang: r for r in doc_length_quantiles(spark, sf_dir).collect()}
    approx = {r.lang: r for r in doc_length_quantiles_approx(spark, sf_dir).collect()}
    assert set(exact) == set(approx)
    for lang, e in exact.items():
        a = approx[lang]
        assert a.n_docs == e.n_docs and a.mean_chars == e.mean_chars
        for col in ("p50_chars", "p90_chars", "p99_chars"):
            ev, av = getattr(e, col), getattr(a, col)
            # rank error <= n/accuracy; with n << accuracy it must sit
            # inside the value range spanned by the exact neighbors —
            # generous 10% relative window
            assert abs(av - ev) <= max(0.1 * ev, 2.0), (lang, col, av, ev)


def test_connected_components_random_differential(spark):
    """Randomized differential: arbitrary edge sets -> the hybrid's
    union-find path, the distributed min-label loop, and a pure-Python
    BFS reference must agree on every component assignment."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        edges_py=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=24),
                st.integers(min_value=0, max_value=24),
            ).map(lambda p: (min(p), max(p))).filter(lambda p: p[0] < p[1]),
            min_size=1,
            max_size=20,
            unique=True,
        )
    )
    def check(edges_py):
        node_ids = sorted({x for e in edges_py for x in e})
        # pure-Python BFS reference
        adj: dict[int, set[int]] = {n: set() for n in node_ids}
        for a, b in edges_py:
            adj[a].add(b)
            adj[b].add(a)
        expect: dict[int, int] = {}
        for start in node_ids:
            if start in expect:
                continue
            comp, stack = [], [start]
            seen = {start}
            while stack:
                x = stack.pop()
                comp.append(x)
                for y in adj[x]:
                    if y not in seen:
                        seen.add(y)
                        stack.append(y)
            root = min(comp)
            for x in comp:
                expect[x] = root
        nodes = spark.createDataFrame([(i,) for i in node_ids], ["doc_id"])
        edges = spark.createDataFrame(list(edges_py), ["doc_a", "doc_b"])
        uf = {
            r["doc_id"]: r["cluster_id"]
            for r in connected_components(nodes, edges).collect()
        }
        dist = {
            r["doc_id"]: r["cluster_id"]
            for r in connected_components(
                nodes, edges, small_graph_edges=0
            ).collect()
        }
        assert uf == expect, (edges_py, uf, expect)
        assert dist == expect, (edges_py, dist, expect)

    check()


def test_temperature_alloc_flattens_distribution(spark, sf_dir):
    """T=2 sampling: shares sum to 1, the budget is fully allocated,
    and the boost factor is strictly anti-monotone in source size —
    the whole point of temperature flattening."""
    from aliyun_emapreduce_datasources_spark.operators.pipeline import (
        TEMP_BUDGET_TOKENS,
        mix_temperature_alloc,
    )

    rows = mix_temperature_alloc(spark, sf_dir).toPandas()
    assert abs(rows["p_temp"].sum() - 1.0) < 1e-9
    assert abs(rows["p_raw"].sum() - 1.0) < 1e-9
    assert abs(rows["alloc_tokens"].sum() - TEMP_BUDGET_TOKENS) < 1e-6 * TEMP_BUDGET_TOKENS
    by_size = rows.sort_values(["n_tokens", "source"])
    boosts = by_size["boost"].to_numpy()
    toks = by_size["n_tokens"].to_numpy()
    for i in range(1, len(boosts)):
        if toks[i] > toks[i - 1]:
            assert boosts[i] < boosts[i - 1]


def test_ccnet_buckets_are_balanced_terciles(spark, sf_dir):
    """Within every language the head/middle/tail bucket sizes differ
    by at most one, and every scored document lands in a bucket."""
    from aliyun_emapreduce_datasources_spark.functions.lm import text_ccnet_buckets

    rows = text_ccnet_buckets(spark, sf_dir).toPandas()
    assert len(rows) > 0
    sizes = rows.groupby(["lang", "bucket"]).size().unstack(fill_value=0)
    for lang, r in sizes.iterrows():
        assert set(r.index) >= {"head", "middle", "tail"}
        assert r.max() - r.min() <= 1, (lang, dict(r))
    # head has the lowest scores: per lang, max(head) <= min(tail)
    for lang, grp in rows.groupby("lang"):
        head = grp[grp.bucket == "head"]["avg_surprise"]
        tail = grp[grp.bucket == "tail"]["avg_surprise"]
        assert head.max() <= tail.min()


def test_l_diversity_rollup_invariants(spark, sf_dir):
    from aliyun_emapreduce_datasources_spark.operators.analytic import (
        audit_l_diversity,
    )

    rows = audit_l_diversity(spark, sf_dir).toPandas()
    assert len(rows) == 25  # every nation has orders at sf>=0.001
    assert (rows["n_under_l"] <= rows["n_classes"]).all()
    assert (rows["rows_at_risk"] <= rows["n_rows"]).all()
    assert ((rows["suppress_milli"] >= 0) & (rows["suppress_milli"] <= 1000)).all()


def test_gopher_rules_shape_and_shuffle_free_plan(spark, sf_dir):
    """keep == conjunction of the per-rule verdicts, no NULLs anywhere,
    and the physical plan is scan -> project (no exchange): the rule
    table must run at scan speed."""
    from aliyun_emapreduce_datasources_spark.functions.text import gopher_rules

    df = gopher_rules(spark, sf_dir)
    rows = df.toPandas()
    assert len(rows) == 500 and not rows.isna().any().any()
    recomputed = (
        rows.r_word_count & rows.r_word_len & rows.r_symbol
        & rows.r_alpha & rows.r_stopwords
    )
    assert (rows.keep == recomputed).all()
    assert 0 < rows.keep.sum() < len(rows)  # non-degenerate on corpus
    plan = df._jdf.queryExecution().executedPlan().toString()
    body = plan.split("Sort", 1)[0]  # orderBy's range exchange is display-only
    assert "Exchange" not in body


def test_unimax_is_exact_waterfilling(spark, sf_dir):
    """Budget conservation, both capped and uncapped sources present,
    one common water level for the uncapped, every capped source at a
    capacity BELOW that level, epochs never above the cap — checked
    against an independent pure-Python waterfill on the same counts."""
    from aliyun_emapreduce_datasources_spark.operators.pipeline import (
        UNIMAX_EPOCH_CAP,
        mix_unimax_alloc,
    )

    rows = mix_unimax_alloc(spark, sf_dir).toPandas()
    budget = 39 * int(rows.n_tokens.sum()) // 20
    assert abs(rows.alloc_tokens.sum() - budget) < 1e-6 * budget
    capped = rows[rows.capped]
    unc = rows[~rows.capped]
    assert len(capped) > 0 and len(unc) > 0  # non-degenerate at every SF
    level = unc.alloc_tokens.unique()
    assert len(level) == 1  # uniform water level
    assert (capped.capacity < level[0]).all()
    assert (capped.alloc_tokens == capped.capacity).all()
    assert (rows.epochs <= UNIMAX_EPOCH_CAP + 1e-9).all()

    # independent waterfill: sum(min(c_i, L)) == budget at the level
    caps = sorted(rows.capacity)
    lo, hi = 0.0, float(max(caps))
    for _ in range(200):
        mid = (lo + hi) / 2
        if sum(min(c, mid) for c in caps) < budget:
            lo = mid
        else:
            hi = mid
    assert abs(hi - level[0]) < 1e-3 * level[0]


def test_t_closeness_rollup_invariants(spark, sf_dir):
    from aliyun_emapreduce_datasources_spark.operators.analytic import (
        audit_t_closeness,
    )

    rows = audit_t_closeness(spark, sf_dir).toPandas()
    assert len(rows) == 25
    assert (rows.n_over_t <= rows.n_classes).all()
    assert (rows.mean_tv_milli <= rows.max_tv_milli).all()
    assert ((rows.max_tv_milli >= 0) & (rows.max_tv_milli <= 1000)).all()
    # TV against the global distribution cannot be zero for every
    # class of a finite sample — the audit must measure something
    assert rows.max_tv_milli.max() > 0


def test_trigram_novelty_bounds_and_signal(spark, sf_dir):
    from aliyun_emapreduce_datasources_spark.functions.text import trigram_novelty

    rows = trigram_novelty(spark, sf_dir).toPandas()
    assert len(rows) > 0
    assert (rows.n_novel <= rows.n_distinct_tg).all()
    assert ((rows.novelty_milli >= 0) & (rows.novelty_milli <= 1000)).all()
    assert 0 < rows.novelty_milli.mean() < 1000  # corpus has shared AND novel text
    # exact consistency of the milli score with its integer parts
    got = (1000 * rows.n_novel) // rows.n_distinct_tg
    assert (rows.novelty_milli == got).all()
