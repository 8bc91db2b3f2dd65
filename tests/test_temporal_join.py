

def test_interval_overlap_join_matches_bruteforce(spark):
    """Grid join == brute-force cross-join+filter on random intervals
    whose spans cross many buckets (pairs sharing several buckets must
    be emitted exactly once), including touching endpoints (half-open:
    NOT overlapping)."""
    import numpy as np
    from pyspark.sql import functions as F

    from transformio_spark.operators.temporal import interval_overlap_join

    rng = np.random.default_rng(42)
    B = 100
    ls = rng.integers(0, 5000, 300)
    ll = rng.integers(1, 900, 300)        # spans up to 9 buckets
    rs = rng.integers(0, 5000, 200)
    rl = rng.integers(1, 400, 200)
    left = spark.createDataFrame(
        [(int(i), int(s), int(s + d)) for i, (s, d) in enumerate(zip(ls, ll))],
        "lid long, l_start_us long, l_end_us long",
    )
    right = spark.createDataFrame(
        [(int(i), int(s), int(s + d)) for i, (s, d) in enumerate(zip(rs, rl))],
        "rid long, r_start_us long, r_end_us long",
    )
    got = {
        (r["lid"], r["rid"])
        for r in interval_overlap_join(left, right, B).collect()
    }
    want = {
        (int(i), int(j))
        for i in range(300) for j in range(200)
        if ls[i] < rs[j] + rl[j] and rs[j] < ls[i] + ll[i]
    }
    assert got == want
    # touching endpoints do not overlap under half-open semantics
    l1 = spark.createDataFrame([(1, 0, 100)], "lid long, l_start_us long, l_end_us long")
    r1 = spark.createDataFrame([(1, 100, 200)], "rid long, r_start_us long, r_end_us long")
    assert interval_overlap_join(l1, r1, B).count() == 0
    # empty intervals raise loudly (row-level, no validation scan)
    import pytest as _pytest

    r_bad = spark.createDataFrame(
        [(1, 100, 100)], "rid long, r_start_us long, r_end_us long"
    )
    with _pytest.raises(Exception, match="empty"):
        interval_overlap_join(l1, r_bad, B).count()
    # plan: equi-join on bucket (shuffled hash or sort-merge), never
    # a cartesian product / BNLJ
    plan = (
        interval_overlap_join(left, right, B)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
