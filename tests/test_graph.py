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
