"""pagerank_micro / degree_stats unit semantics on a hand-computed
graph: the integer micro-unit arithmetic must match the by-hand
floor-division trace exactly (that exactness is the whole contract —
see operators/graph.py)."""

from crawlspark.operators.graph import degree_stats, pagerank_micro


def _edges(spark):
    # 1 -> 2, 2 -> 1, 1 -> 3 ; node 3 is a sink
    return spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3)], "src long, dst long"
    )


def test_pagerank_micro_hand_trace(spark):
    # r0 = 1.0 everywhere; deg(1)=2, deg(2)=1
    # iter1: c(2)=c(3)=500000, c(1)=1000000
    #        r1 = {1: 1000000, 2: 575000, 3: 575000}
    # iter2: c(2)=c(3)=500000, c(1)=575000
    #        r2 = {1: 638750, 2: 575000, 3: 575000}
    got = {
        r["node"]: r["rank_micro"]
        for r in pagerank_micro(_edges(spark), n_iters=2).collect()
    }
    assert got == {1: 638750, 2: 575000, 3: 575000}


def test_pagerank_micro_deterministic_across_partitioning(spark):
    e = _edges(spark)
    a = {
        r["node"]: r["rank_micro"]
        for r in pagerank_micro(e, n_iters=3).collect()
    }
    b = {
        r["node"]: r["rank_micro"]
        for r in pagerank_micro(e.repartition(7), n_iters=3).collect()
    }
    assert a == b  # integer sums: partition order cannot leak


def test_degree_stats(spark):
    got = {
        r["node"]: (r["out_degree"], r["in_degree"])
        for r in degree_stats(_edges(spark)).collect()
    }
    assert got == {1: (2, 1), 2: (1, 1), 3: (0, 1)}


def test_pagerank_conserving_hand_trace(spark):
    """dangling='redistribute': node 3 (sink) hands its mass back
    each round, floor-exact. Trace (n=3, damping 85):
      r0 = 1e6 each; dsum0 = 1e6 (node 3)
      share = floor(85 * 1000000 / 300) = 283333
      iter1: c(2)=c(3)=500000, c(1)=1000000
        r1(1) = 150000 + 850000 + 283333 = 1283333
        r1(2) = r1(3) = 150000 + 425000 + 283333 = 858333
    """
    got = {
        r["node"]: r["rank_micro"]
        for r in pagerank_micro(
            _edges(spark), n_iters=1, dangling="redistribute"
        ).collect()
    }
    assert got == {1: 1283333, 2: 858333, 3: 858333}


def test_pagerank_conserving_total_mass(spark):
    """Redistribution keeps total mass at n*MICRO up to floor losses
    (< n micro-units per round); the leaking default loses the sink's
    damped mass every round."""
    e = _edges(spark)
    n, iters = 3, 4
    cons = sum(
        r["rank_micro"]
        for r in pagerank_micro(
            e, n_iters=iters, dangling="redistribute"
        ).collect()
    )
    leak = sum(
        r["rank_micro"]
        for r in pagerank_micro(e, n_iters=iters).collect()
    )
    assert n * 1_000_000 - cons < n * iters * 2
    assert leak < cons


def test_pagerank_early_stop(spark):
    """tol_micro: a converging chain stops before n_iters and reports
    the rounds actually run; the result equals a fixed run of that
    many rounds."""
    e = _edges(spark)
    out = pagerank_micro(e, n_iters=50, tol_micro=100)
    rows = {r["node"]: r["rank_micro"] for r in out.collect()}
    assert out._pr_iters < 50
    fixed = {
        r["node"]: r["rank_micro"]
        for r in pagerank_micro(e, n_iters=out._pr_iters).collect()
    }
    assert rows == fixed
