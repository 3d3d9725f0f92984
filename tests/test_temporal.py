"""As-of and range join operators: hand-built truth tables + a naive
inequality-join differential."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from nyc_tlc_analytics_pipeline_spark.operators.temporal import asof_join, range_join

T = datetime


@pytest.fixture(scope="module")
def trades(spark):
    rows = [
        (1, T(2024, 1, 1, 10, 0, 0), 100.0),
        (1, T(2024, 1, 1, 10, 5, 0), 101.0),
        (1, T(2024, 1, 1, 9, 0, 0), 99.0),  # before any quote
        (2, T(2024, 1, 1, 10, 0, 0), 200.0),  # user with no quotes at all
    ]
    return spark.createDataFrame(rows, "user_id int, ts timestamp, price double")


@pytest.fixture(scope="module")
def quotes(spark):
    rows = [
        (1, T(2024, 1, 1, 9, 30, 0), 10.0),
        (1, T(2024, 1, 1, 10, 0, 0), 20.0),  # simultaneous with first trade
        (1, T(2024, 1, 1, 10, 4, 59), 30.0),
        (1, T(2024, 1, 1, 10, 6, 0), 40.0),  # after everything
    ]
    return spark.createDataFrame(rows, "user_id int, ts timestamp, quote double")


def test_asof_backward_semantics(trades, quotes):
    out = {
        (r.user_id, r.ts): r.asof_quote
        for r in asof_join(
            trades, quotes, on="user_id", left_ts="ts", right_ts="ts", value_cols=["quote"]
        ).collect()
    }
    assert out[(1, T(2024, 1, 1, 9, 0, 0))] is None  # no prior quote
    assert out[(1, T(2024, 1, 1, 10, 0, 0))] == 20.0  # equal ts counts
    assert out[(1, T(2024, 1, 1, 10, 5, 0))] == 30.0  # latest prior, not later
    assert out[(2, T(2024, 1, 1, 10, 0, 0))] is None  # key with no right rows


def test_asof_matches_duckdb_native(spark, trades, quotes):
    import duckdb

    con = duckdb.connect()
    con.register("trades", trades.toPandas())
    con.register("quotes", quotes.toPandas())
    duck = {
        (r[0], r[1]): r[2]
        for r in con.execute(
            """
            SELECT t.user_id, t.ts, q.quote
            FROM trades t ASOF LEFT JOIN quotes q
              ON t.user_id = q.user_id AND t.ts >= q.ts
            """
        ).fetchall()
    }
    ours = {
        (r.user_id, r.ts): r.asof_quote
        for r in asof_join(
            trades, quotes, on="user_id", left_ts="ts", right_ts="ts", value_cols=["quote"]
        ).collect()
    }
    assert ours == duck


def test_range_join_matches_naive(spark):
    import random

    rng = random.Random(11)
    base = T(2024, 1, 1).timestamp()
    left = spark.createDataFrame(
        [(rng.randint(1, 5), T.fromtimestamp(base + rng.randint(0, 86400))) for _ in range(300)],
        "k int, lts timestamp",
    )
    right = spark.createDataFrame(
        [(rng.randint(1, 5), T.fromtimestamp(base + rng.randint(0, 86400))) for _ in range(300)],
        "k int, rts timestamp",
    )
    fast = range_join(left, right, "k", "lts", "rts", 1800)
    naive = left.join(right, "k").filter(
        F.abs(F.col("lts").cast("double") - F.col("rts").cast("double")) <= 1800
    )
    assert fast.count() == naive.count()
    fs = sorted((r.k, r.lts, r.rts) for r in fast.collect())
    ns = sorted((r.k, r.lts, r.rts) for r in naive.collect())
    assert fs == ns


def test_asof_null_semantics_match_duckdb(spark):
    """NULL right timestamps/keys never match; multi-column values come
    from ONE right row even when some columns are NULL."""
    import duckdb

    trades = spark.createDataFrame(
        [(1, T(2024, 1, 1, 11, 0, 0)), (None, T(2024, 1, 1, 11, 0, 0))],
        "user_id int, ts timestamp",
    )
    quotes = spark.createDataFrame(
        [
            (1, T(2024, 1, 1, 9, 0, 0), 10.0, None),  # bid only
            (1, T(2024, 1, 1, 10, 0, 0), None, 3.0),  # ask only (later)
            (1, None, 99.0, 99.0),  # NULL ts: must never match
            (None, T(2024, 1, 1, 8, 0, 0), 7.0, 7.0),  # NULL key: never match
        ],
        "user_id int, ts timestamp, bid double, ask double",
    )
    ours = {
        r.user_id: (r.asof_bid, r.asof_ask)
        for r in asof_join(
            trades, quotes, on="user_id", left_ts="ts", right_ts="ts",
            value_cols=["bid", "ask"],
        ).collect()
    }
    # latest right row verbatim (bid NULL, ask 3.0) — never a mix of rows
    assert ours[1] == (None, 3.0)
    assert ours[None] == (None, None)
    con = duckdb.connect()
    con.register("trades", trades.toPandas())
    con.register("quotes", quotes.toPandas())
    duck = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            """
            SELECT t.user_id, q.bid, q.ask
            FROM trades t ASOF LEFT JOIN quotes q
              ON t.user_id = q.user_id AND t.ts >= q.ts
            """
        ).fetchall()
    }
    import math

    def norm(p):
        return tuple(None if v is None or (isinstance(v, float) and math.isnan(v)) else v for v in p)

    assert {k: norm(v) for k, v in ours.items()} == {k: norm(v) for k, v in duck.items()}


def test_range_join_same_ts_column_name(spark):
    left = spark.createDataFrame([(1, T(2024, 1, 1, 12, 0, 0))], "k int, ts timestamp")
    right = spark.createDataFrame([(1, T(2024, 1, 1, 12, 10, 0))], "k int, rts timestamp")
    got = range_join(left, right, "k", "ts", "rts", 3600).collect()
    assert len(got) == 1


def test_salted_join_rejects_outer(spark):
    from nyc_tlc_analytics_pipeline_spark.operators.skew import salted_join

    df = spark.createDataFrame([(1, "a")], "k int, v string")
    with pytest.raises(ValueError, match="salted_join supports"):
        salted_join(df, df, "k", how="full")


def test_range_join_boundary_inclusive(spark):
    left = spark.createDataFrame([(1, T(2024, 1, 1, 12, 0, 0))], "k int, lts timestamp")
    right = spark.createDataFrame(
        [
            (1, T(2024, 1, 1, 11, 0, 0)),  # exactly 3600s before
            (1, T(2024, 1, 1, 13, 0, 1)),  # 3601s after
        ],
        "k int, rts timestamp",
    )
    got = range_join(left, right, "k", "lts", "rts", 3600).collect()
    assert len(got) == 1 and got[0].rts == T(2024, 1, 1, 11, 0, 0)


def test_interval_overlap_keyed_matches_naive(spark):
    from nyc_tlc_analytics_pipeline_spark.operators.temporal import (
        interval_overlap_join,
    )

    left = spark.createDataFrame(
        [(1, 0.0, 10.0), (1, 20.0, 30.0), (2, 0.0, 5.0)],
        "k long, s double, e double",
    )
    right = spark.createDataFrame(
        [(1, 5.0, 15.0), (1, 30.0, 40.0), (2, 6.0, 7.0)],
        "k long, s double, e double",
    )
    got = interval_overlap_join(
        left, right, "s", "e", "s", "e", keys=["k"]
    ).collect()
    # (1, 0-10) x (1, 5-15) overlaps; (1, 20-30) x (1, 30-40) touches at
    # the boundary only (strict half-open: NOT an overlap); k=2 disjoint
    assert len(got) == 1
    assert got[0].k == 1 and got[0].s == 0.0 and got[0].s_r == 5.0


def test_interval_overlap_bucketed_matches_naive_inequality_join(spark):
    import random

    from pyspark.sql import functions as F

    from nyc_tlc_analytics_pipeline_spark.operators.temporal import (
        interval_overlap_join,
    )

    rng = random.Random(7)
    mk = lambda n, off: [  # noqa: E731
        (i + off, float(s), float(s + rng.randint(1, 120)))
        for i, s in ((j, rng.randint(0, 3600)) for j in range(n))
    ]
    left = spark.createDataFrame(mk(60, 0), "lid long, s double, e double")
    right = spark.createDataFrame(
        mk(60, 1000), "rid long, s double, e double"
    )
    bucketed = interval_overlap_join(
        left, right, "s", "e", "s", "e", bucket_seconds=60
    )
    naive = left.join(
        right.select(
            F.col("rid"), F.col("s").alias("s_r"), F.col("e").alias("e_r")
        ),
        (F.col("s") < F.col("e_r")) & (F.col("s_r") < F.col("e")),
    )
    key = lambda r: (r.lid, r.rid)  # noqa: E731
    assert {key(r) for r in bucketed.collect()} == {
        key(r) for r in naive.collect()
    }


def test_asof_forward_semantics(trades, quotes):
    out = {
        (r.user_id, r.ts): r.asof_quote
        for r in asof_join(
            trades, quotes, on="user_id", left_ts="ts", right_ts="ts",
            value_cols=["quote"], direction="forward",
        ).collect()
    }
    assert out[(1, T(2024, 1, 1, 9, 0, 0))] == 10.0  # next quote at 9:30
    assert out[(1, T(2024, 1, 1, 10, 0, 0))] == 20.0  # equal ts counts
    assert out[(1, T(2024, 1, 1, 10, 5, 0))] == 40.0  # next after, not prior
    assert out[(2, T(2024, 1, 1, 10, 0, 0))] is None  # key with no right rows


def test_asof_nearest_semantics(trades, quotes):
    out = {
        (r.user_id, r.ts): r.asof_quote
        for r in asof_join(
            trades, quotes, on="user_id", left_ts="ts", right_ts="ts",
            value_cols=["quote"], direction="nearest",
        ).collect()
    }
    # 9:00 trade: only forward exists (9:30)
    assert out[(1, T(2024, 1, 1, 9, 0, 0))] == 10.0
    # 10:00 trade: exact match at distance 0
    assert out[(1, T(2024, 1, 1, 10, 0, 0))] == 20.0
    # 10:05 trade: prior quote at 10:04:59 (1s) beats next at 10:06 (60s)
    assert out[(1, T(2024, 1, 1, 10, 5, 0))] == 30.0
    assert out[(2, T(2024, 1, 1, 10, 0, 0))] is None


def test_asof_nearest_tie_prefers_backward(spark):
    trades = spark.createDataFrame(
        [(1, T(2024, 1, 1, 10, 0, 0))], "user_id int, ts timestamp"
    )
    quotes = spark.createDataFrame(
        [
            (1, T(2024, 1, 1, 9, 59, 0), 11.0),  # 60s before
            (1, T(2024, 1, 1, 10, 1, 0), 22.0),  # 60s after
        ],
        "user_id int, ts timestamp, quote double",
    )
    [r] = asof_join(
        trades, quotes, on="user_id", left_ts="ts", right_ts="ts",
        value_cols=["quote"], direction="nearest",
    ).collect()
    assert r.asof_quote == 11.0


def test_asof_forward_nearest_match_naive(spark):
    """Randomized differential: forward == argmin over right_ts >= left_ts,
    nearest == argmin |delta| with backward tie-preference, both computed
    by a naive inequality join (the DuckDB-ASOF-can't-do-this oracle
    shape). Timestamps are made unique per key so argmin is total."""
    import random

    rng = random.Random(23)
    base = T(2024, 1, 1).timestamp()
    lrows, rrows = [], []
    for k in range(1, 6):
        lts = rng.sample(range(0, 86400, 7), 60)
        rts = rng.sample(range(3, 86400, 11), 60)
        lrows += [(k, T.fromtimestamp(base + s)) for s in lts]
        rrows += [(k, T.fromtimestamp(base + s), float(s)) for s in rts]
    left = spark.createDataFrame(lrows, "k int, lts timestamp")
    right = spark.createDataFrame(rrows, "k int, rts timestamp, v double")

    naive = {}
    for k, lts in lrows:
        cands = [(rts, v) for kk, rts, v in rrows if kk == k]
        back = [(rts, v) for rts, v in cands if rts <= lts]
        fwd = [(rts, v) for rts, v in cands if rts >= lts]
        bpick = max(back)[1] if back else None
        fpick = min(fwd)[1] if fwd else None
        if bpick is None:
            npick = fpick
        elif fpick is None:
            npick = bpick
        else:
            db = (lts - max(back)[0]).total_seconds()
            df_ = (min(fwd)[0] - lts).total_seconds()
            npick = fpick if df_ < db else bpick
        naive[(k, lts)] = (fpick, npick)

    fwd_out = {
        (r.k, r.lts): r.asof_v
        for r in asof_join(
            left, right, on="k", left_ts="lts", right_ts="rts",
            value_cols=["v"], direction="forward",
        ).collect()
    }
    near_out = {
        (r.k, r.lts): r.asof_v
        for r in asof_join(
            left, right, on="k", left_ts="lts", right_ts="rts",
            value_cols=["v"], direction="nearest",
        ).collect()
    }
    for key, (fpick, npick) in naive.items():
        assert fwd_out[key] == fpick, key
        assert near_out[key] == npick, key


def test_asof_forward_null_left_ts_never_matches(spark):
    trades = spark.createDataFrame(
        [(1, None), (1, T(2024, 1, 1, 9, 0, 0))], "user_id int, ts timestamp"
    )
    quotes = spark.createDataFrame(
        [(1, T(2024, 1, 1, 10, 0, 0), 5.0)],
        "user_id int, ts timestamp, quote double",
    )
    for d in ("forward", "nearest"):
        out = {
            r.ts: r.asof_quote
            for r in asof_join(
                trades, quotes, on="user_id", left_ts="ts", right_ts="ts",
                value_cols=["quote"], direction=d,
            ).collect()
        }
        assert out[None] is None
        assert out[T(2024, 1, 1, 9, 0, 0)] == 5.0


def test_asof_bad_direction_raises(trades, quotes):
    with pytest.raises(ValueError, match="backward/forward/nearest"):
        asof_join(
            trades, quotes, on="user_id", left_ts="ts", right_ts="ts",
            value_cols=["quote"], direction="sideways",
        )
