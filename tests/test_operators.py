"""Unit tests for library operators on small literal data (the reference's
test style: direct input → expected output, SURVEY.md §5)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from sport_data_pipeline_spark.operators.joins import asof_join, point_in_time_join
from sport_data_pipeline_spark.operators.merge import (
    merge_coalesce,
    merge_latest,
    scd2_intervals,
    upsert,
)
from sport_data_pipeline_spark.operators.sessionize import sessionize
from sport_data_pipeline_spark.operators.windows import first_last_value, last_n_per_key


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_merge_latest_keeps_one_row_per_key(spark):
    df = spark.createDataFrame(
        [(1, ts("2024-01-01T10:00"), "a"), (1, ts("2024-01-02T10:00"), "b"),
         (2, ts("2024-01-01T09:00"), "c")],
        "id long, updated timestamp, val string",
    )
    out = {r["id"]: r["val"] for r in merge_latest(df, ["id"], ["updated"]).collect()}
    assert out == {1: "b", 2: "c"}


def test_upsert_is_idempotent(spark):
    existing = spark.createDataFrame(
        [(1, 1, "old"), (2, 1, "keep")], "id long, v long, val string"
    )
    updates = spark.createDataFrame([(1, 2, "new")], "id long, v long, val string")
    once = upsert(existing, updates, ["id"], ["v"])
    twice = upsert(once, updates, ["id"], ["v"])
    got = {r["id"]: r["val"] for r in twice.collect()}
    assert got == {1: "new", 2: "keep"}


def test_merge_coalesce_partial_update(spark):
    existing = spark.createDataFrame(
        [(1, 1, "name", 100)], "id long, v long, name string, score long"
    )
    updates = spark.createDataFrame(
        [(1, 2, None, 200)], "id long, v long, name string, score long"
    )
    row = merge_coalesce(existing, updates, ["id"], ["v"]).collect()[0]
    assert row["name"] == "name"  # non-null old value survives
    assert row["score"] == 200  # newer non-null wins


def test_scd2_intervals(spark):
    df = spark.createDataFrame(
        [(1, ts("2024-01-01T00:00"), "Old FC"), (1, ts("2024-06-01T00:00"), "New FC")],
        "club long, changed timestamp, name string",
    )
    rows = {r["name"]: r for r in scd2_intervals(df, ["club"], "changed").collect()}
    assert rows["Old FC"]["valid_to"] == ts("2024-06-01T00:00")
    assert not rows["Old FC"]["is_current"]
    assert rows["New FC"]["valid_to"] is None
    assert rows["New FC"]["is_current"]


def test_point_in_time_join_matches_interval(spark):
    dim = scd2_intervals(
        spark.createDataFrame(
            [(1, ts("2024-01-01T00:00"), "Old FC"), (1, ts("2024-06-01T00:00"), "New FC")],
            "club long, changed timestamp, name string",
        ),
        ["club"],
        "changed",
    ).select("club", "name", "valid_from", "valid_to")
    facts = spark.createDataFrame(
        [(10, 1, ts("2024-03-01T00:00")), (11, 1, ts("2024-07-01T00:00"))],
        "match long, club long, kickoff timestamp",
    )
    got = {
        r["match"]: r["name"]
        for r in point_in_time_join(facts, dim, ["club"], "kickoff").collect()
    }
    assert got == {10: "Old FC", 11: "New FC"}


def test_asof_join_picks_latest_prior(spark):
    left = spark.createDataFrame(
        [(1, 100, ts("2024-01-01T12:00"))], "uid long, oid long, t timestamp"
    )
    right = spark.createDataFrame(
        [(1, ts("2024-01-01T10:00"), 1.0), (1, ts("2024-01-01T11:00"), 2.0),
         (1, ts("2024-01-01T13:00"), 9.0)],
        "uid long, t timestamp, price double",
    )
    row = asof_join(
        left, right, on=["uid"], left_ts="t", right_ts="t", right_values=["price"]
    ).collect()[0]
    assert row["asof_price"] == 2.0  # 13:00 tick is in the future → excluded


def test_asof_join_directions_and_tolerance(spark):
    # merge_asof parity: backward/forward/nearest + tolerance, with ties
    # at equal ts resolved by greatest tiebreak and equal-distance nearest
    # preferring the backward candidate.
    t = lambda s: ts(f"2024-01-01T12:{s:02d}")  # noqa: E731
    left = spark.createDataFrame(
        [(1, t(10), "p10"), (1, t(30), "p30"), (1, t(55), "p55"), (2, t(5), "q5")],
        "k long, t timestamp, name string",
    )
    right = spark.createDataFrame(
        [(1, t(8), 80, 1), (1, t(10), 100, 2), (1, t(10), 101, 3), (1, t(40), 400, 4),
         (3, t(1), 9, 5)],
        "k long, t timestamp, v long, rid long",
    )

    def run(**kw):
        df = asof_join(
            left, right, on=["k"], left_ts="t", right_ts="t",
            right_values=["v"], right_tiebreak=["rid"], **kw,
        )
        return {r["name"]: r["asof_v"] for r in df.collect()}

    assert run() == {"p10": 101, "p30": 101, "p55": 400, "q5": None}
    assert run(direction="forward") == {"p10": 101, "p30": 400, "p55": None, "q5": None}
    # p30: backward dist 20 min vs forward dist 10 min → forward wins
    assert run(direction="nearest") == {"p10": 101, "p30": 400, "p55": 400, "q5": None}
    # tolerance in seconds gates each candidate independently
    assert run(direction="nearest", tolerance=12 * 60) == {
        "p10": 101, "p30": 400, "p55": None, "q5": None,
    }
    assert run(tolerance=60) == {"p10": 101, "p30": None, "p55": None, "q5": None}


def test_asof_join_nearest_tie_prefers_backward_and_numeric_ts(spark):
    left = spark.createDataFrame([(1, 100, "L")], "k long, pos long, name string")
    right = spark.createDataFrame(
        [(1, 90, 9), (1, 110, 11)], "k long, pos long, v long"
    )
    got = asof_join(
        left, right, on=["k"], left_ts="pos", right_ts="pos",
        right_values=["v"], direction="nearest",
    ).collect()[0]
    assert got["asof_v"] == 9  # |100-90| == |110-100| → backward wins
    # numeric tolerance uses the column's own units
    got = asof_join(
        left, right, on=["k"], left_ts="pos", right_ts="pos",
        right_values=["v"], direction="forward", tolerance=5,
    ).collect()[0]
    assert got["asof_v"] is None  # 110 is 10 units away > 5


def test_last_n_and_first_last(spark):
    df = spark.createDataFrame(
        [(1, i, float(i)) for i in range(10)], "key long, seq long, v double"
    )
    last3 = last_n_per_key(df, ["key"], ["seq"], 3)
    assert sorted(r["seq"] for r in last3.collect()) == [7, 8, 9]
    fl = first_last_value(df, ["key"], ["seq"], "v").collect()[0]
    assert (fl["open_value"], fl["close_value"]) == (0.0, 9.0)


def test_sessionize_gap(spark):
    df = spark.createDataFrame(
        [(1, ts("2024-01-01T10:00")), (1, ts("2024-01-01T10:10")),
         (1, ts("2024-01-01T11:30")), (2, ts("2024-01-01T09:00"))],
        "uid long, t timestamp",
    )
    out = sessionize(df, ["uid"], "t", gap_seconds=1800)
    sess = sorted((r["uid"], r["t"].isoformat(), r["session_id"]) for r in out.collect())
    assert [s[2] for s in sess] == [0, 0, 1, 0]  # third event starts session 1


def test_sketch_profile_error_bounds(spark):
    from sport_data_pipeline_spark.plans import all_queries

    from conftest import SF_DIR

    got = {r["event_type"]: r for r in all_queries()["sketch_profile"].fn(spark, SF_DIR).collect()}
    from sport_data_pipeline_spark.catalog import load_table
    from pyspark.sql import functions as F

    e = load_table(spark, SF_DIR, "events")
    exact = {
        r["event_type"]: r
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("users"))
        .collect()
    }
    assert set(got) == set(exact)
    # the query computes its own error-bound booleans against exact
    # aggregates; every bound must hold and the exact side must agree
    for et, row in got.items():
        assert row["exact_users"] == exact[et]["users"]
        assert row["users_within_rsd"]
        assert row["p50_within_eps"] and row["p95_within_eps"] and row["p99_within_eps"]


def _entity_frames(spark):
    new = spark.createDataFrame(
        [
            (1, "DE", 1994, "Thomas Mueller"),
            (2, "DE", 1994, "Tomas Muller"),      # near-dup of an existing DE/1994
            (3, "FR", 1998, "Kylian Mbappe"),
            (4, "FR", 1998, "Antoine Griezmann"),  # same block, distinct person
            (5, "ES", 2002, "Pedri Gonzalez"),     # no existing candidate
        ],
        "nid long, country string, birth_year int, name string",
    )
    existing = spark.createDataFrame(
        [
            (10, "DE", 1994, "Thomas Müller"),
            (11, "DE", 1994, "Mats Hummels"),
            (12, "FR", 1998, "Kylian Mbappé"),
            (13, "FR", 1998, "Antoine Griezmann"),
            (14, "DE", 1990, "Manuel Neuer"),      # same country, other cohort
            (15, "FR", 1986, "Antoine Vieux"),     # same country, other cohort
        ],
        "eid long, country string, birth_year int, name string",
    )
    return new, existing


def test_resolve_entities_salted_path_matches_broadcast(spark):
    from sport_data_pipeline_spark.operators.entity import resolve_entities

    new, existing = _entity_frames(spark)
    kwargs = dict(
        new=new, existing=existing, new_id="nid", existing_id="eid",
        block_on=[("country", "country"), ("birth_year", "birth_year")],
        match_fields=[("name", "name")],
    )
    broadcast = {tuple(r) for r in resolve_entities(**kwargs).collect()}
    salted = {
        tuple(r)
        for r in resolve_entities(**kwargs, broadcast_existing=False, salt=4).collect()
    }
    assert salted == broadcast
    routes = {r[0]: r[3] for r in broadcast}
    assert routes[1] == "merged"   # Thomas Mueller ≈ Thomas Müller
    assert routes[4] == "merged"   # exact name
    assert routes[5] == "new"      # empty block


def test_composite_blocking_prunes_candidate_pairs(spark):
    """country+birth_year blocking must generate strictly fewer candidate
    pairs than country alone while routing the true matches identically —
    the measured reduction the composite key exists for."""
    from pyspark.sql import functions as F

    new, existing = _entity_frames(spark)
    coarse = new.join(existing.withColumnRenamed("country", "c2"),
                      new["country"] == F.col("c2")).count()
    composite = new.alias("n").join(
        existing.alias("e"),
        (F.col("n.country") == F.col("e.country"))
        & (F.col("n.birth_year") == F.col("e.birth_year")),
    ).count()
    assert composite < coarse


def test_interval_point_join_matches_naive_range_join(spark):
    from sport_data_pipeline_spark.operators.joins import interval_point_join

    pts = spark.createDataFrame(
        [
            (1, ts("2024-01-01T10:00"), "a"),
            (1, ts("2024-01-01T11:30"), "b"),
            (2, ts("2024-01-01T10:30"), "c"),
            (1, ts("2024-01-02T00:00"), "d"),  # in no interval
        ],
        "k long, t timestamp, tag string",
    )
    ivl = spark.createDataFrame(
        [
            (1, ts("2024-01-01T09:00"), ts("2024-01-01T10:30"), "w1"),
            (1, ts("2024-01-01T11:00"), ts("2024-01-01T12:00"), "w2"),
            (2, ts("2024-01-01T10:30"), ts("2024-01-01T10:31"), "w3"),
            # spans many buckets: still matches exactly once per point
            (1, ts("2024-01-01T00:00"), ts("2024-01-01T23:00"), "wide"),
        ],
        "k long, s timestamp, e timestamp, w string",
    )

    def pairs(df):
        # None sorts as "" so left-join rows (NULL interval) are orderable
        return sorted((r["tag"], r["w"] or "") for r in df.collect())

    def naive(how):
        cond = (pts["t"] >= ivl["s"]) & (pts["t"] < ivl["e"])
        return pairs(pts.join(ivl.drop("k"), cond, how))

    # keyless: every (point, qualifying interval) pair, exactly once —
    # including the closed-open boundaries (10:30 ∉ w1, 10:30 ∈ w3)
    got = interval_point_join(pts, ivl.drop("k"), "t", "s", "e", bucket_seconds=900)
    assert pairs(got) == naive("inner")
    # left join keeps unmatched points with NULL interval columns
    left = interval_point_join(
        pts, ivl.drop("k"), "t", "s", "e", bucket_seconds=900, how="left"
    )
    assert pairs(left) == naive("left")
    # with an equi-key, cross-key interval hits disappear
    keyed = interval_point_join(pts, ivl, "t", "s", "e", bucket_seconds=900, on=["k"])
    naive_keyed = pts.join(
        ivl, (pts["k"] == ivl["k"]) & (pts["t"] >= ivl["s"]) & (pts["t"] < ivl["e"])
    )
    assert pairs(keyed) == pairs(naive_keyed)


def test_interval_overlap_join_matches_naive(spark):
    from sport_data_pipeline_spark.operators.joins import interval_overlap_join

    left = spark.createDataFrame(
        [
            (1, ts("2024-01-01T10:00"), ts("2024-01-01T12:00"), "L1"),
            (1, ts("2024-01-01T13:00"), ts("2024-01-01T13:30"), "L2"),
            # spans many buckets: overlapping pairs still emit exactly once
            (2, ts("2024-01-01T00:00"), ts("2024-01-02T00:00"), "Lwide"),
        ],
        "k long, s timestamp, e timestamp, l string",
    )
    right = spark.createDataFrame(
        [
            (1, ts("2024-01-01T11:00"), ts("2024-01-01T14:00"), "R1"),
            (1, ts("2024-01-01T12:00"), ts("2024-01-01T12:30"), "R2"),  # touches L1 end: no overlap
            (2, ts("2024-01-01T23:00"), ts("2024-01-02T01:00"), "R3"),
            (2, ts("2024-01-02T00:00"), ts("2024-01-02T02:00"), "R4"),  # starts at Lwide end
        ],
        "k long, s2 timestamp, e2 timestamp, r string",
    )

    def pairs(df):
        return sorted((row["l"], row["r"]) for row in df.collect())

    naive_cond = F.greatest(F.col("s"), F.col("s2")) < F.least(F.col("e"), F.col("e2"))
    got = interval_overlap_join(left, right.drop("k"), "s", "e", "s2", "e2", bucket_seconds=900)
    naive = left.join(right.drop("k"), naive_cond).select("l", "r")
    assert pairs(got) == pairs(naive)
    assert ("L1", "R2") not in pairs(got)  # closed-open: max(starts)==min(ends) → no overlap
    # keyed variant restricts matches to equal keys
    keyed = interval_overlap_join(left, right, "s", "e", "s2", "e2", bucket_seconds=900, on=["k"])
    naive_keyed = left.join(right, ["k"]).filter(naive_cond).select("l", "r")
    assert pairs(keyed) == pairs(naive_keyed)
    # colliding non-key column names must fail loudly, not emit ambiguous output
    import pytest as _pytest

    with _pytest.raises(ValueError, match="colliding"):
        interval_overlap_join(left, left.drop("k"), "s", "e", "s", "e", bucket_seconds=900)


def test_interval_joins_random_fuzz_vs_naive(spark):
    """Seeded randomized sweep: 300 points × 120 intervals (zero-length,
    sub-bucket, and multi-bucket spans; boundary-aligned timestamps) must
    match the naive range join exactly for both bucket-expansion joins."""
    import random

    from sport_data_pipeline_spark.operators.joins import (
        interval_overlap_join,
        interval_point_join,
    )

    rnd = random.Random(42)
    base = int(ts("2024-03-01T00:00").timestamp())
    span = 3 * 24 * 3600
    W = 3600

    def rts(sec):
        return dt.datetime.fromtimestamp(base + sec, dt.timezone.utc).replace(tzinfo=None)

    pts_rows = []
    for i in range(300):
        # half the points land exactly on bucket/interval boundaries
        sec = rnd.randrange(span) if i % 2 else rnd.randrange(span // W) * W
        pts_rows.append((i, rts(sec)))
    ivl_rows = []
    for j in range(120):
        s = rnd.randrange(span)
        length = rnd.choice([0, 1, 59, 3600, 7200, 8 * 3600, rnd.randrange(span // 3)])
        ivl_rows.append((j, rts(s), rts(s + length)))

    pts = spark.createDataFrame(pts_rows, "pid long, t timestamp")
    ivl = spark.createDataFrame(ivl_rows, "iid long, s timestamp, e timestamp")

    got_pt = {
        (r["pid"], r["iid"])
        for r in interval_point_join(pts, ivl, "t", "s", "e", bucket_seconds=W).collect()
    }
    want_pt = {
        (r["pid"], r["iid"])
        for r in pts.join(ivl, (pts["t"] >= ivl["s"]) & (pts["t"] < ivl["e"])).collect()
    }
    assert got_pt == want_pt

    ivl2 = ivl.select(
        F.col("iid").alias("jid"), F.col("s").alias("s2"), F.col("e").alias("e2")
    )
    got_ov = [
        (r["iid"], r["jid"])
        for r in interval_overlap_join(
            ivl, ivl2, "s", "e", "s2", "e2", bucket_seconds=W
        ).collect()
    ]
    want_ov = [
        (r["iid"], r["jid"])
        for r in ivl.join(
            ivl2,
            F.greatest(F.col("s"), F.col("s2")) < F.least(F.col("e"), F.col("e2")),
        ).collect()
    ]
    # sets equal AND no duplicate emissions (each overlapping pair exactly once)
    assert sorted(got_ov) == sorted(want_ov)


def test_global_percent_rank_matches_native(spark):
    from pyspark.sql import Window

    from sport_data_pipeline_spark.operators.windows import global_percent_rank

    df = spark.createDataFrame(
        [(i, float((i * 37) % 101)) for i in range(200)], "id int, v double"
    ).repartition(7)
    got = {
        r["id"]: r["pct"]
        for r in global_percent_rank(df, ["v", "id"], out_col="pct").collect()
    }
    want = {
        r["id"]: r["pct"]
        for r in df.select(
            "id", F.percent_rank().over(Window.orderBy("v", "id")).alias("pct")
        ).collect()
    }
    assert got == want  # bit-exact: (rank-1)/(n-1) in double both ways


def test_global_percent_rank_single_row(spark):
    from sport_data_pipeline_spark.operators.windows import global_percent_rank

    df = spark.createDataFrame([(1, 5.0)], "id int, v double")
    [row] = global_percent_rank(df, ["v", "id"], out_col="pct").collect()
    assert row["pct"] == 0.0  # n == 1 → 0.0, matching percent_rank semantics


def test_asof_join_rejects_bad_inputs(spark):
    import pytest as _pytest

    from sport_data_pipeline_spark.operators.joins import asof_join

    left = spark.createDataFrame([(1, 10)], "k int, t int")
    right = spark.createDataFrame([(1, 9, 5.0)], "k int, t int, v double")
    with _pytest.raises(ValueError, match="at least one right_values"):
        asof_join(left, right, on=["k"], left_ts="t", right_ts="t", right_values=[])
    # mixed numeric-left / timestamp-right must error clearly, not cast
    right_ts = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 5.0)], "k int, t timestamp, v double"
    )
    with _pytest.raises(ValueError, match="dtypes disagree"):
        asof_join(left, right_ts, on=["k"], left_ts="t", right_ts="t", right_values=["v"])


def test_global_quantiles_validation_and_edges(spark):
    import pytest as _pytest

    from sport_data_pipeline_spark.operators.windows import global_quantiles

    df = spark.createDataFrame([(1, 5.0)], "id int, v double")
    with _pytest.raises(ValueError, match="at least one"):
        global_quantiles(df, "v", "id", [])
    with _pytest.raises(ValueError, match="in \\(0, 1\\]"):
        global_quantiles(df, "v", "id", [0.0, 0.5])
    # single row: every quantile is that row's value
    rows = global_quantiles(df, "v", "id", [0.25, 1.0]).collect()
    assert [(r["p"], r["value"]) for r in rows] == [(0.25, 5.0), (1.0, 5.0)]


def test_incident_windows_two_level_islands_merge_across_midnight(spark):
    # the r8 day-partitioned gaps-and-islands (two_level=True, the
    # long-horizon variant) must be bit-identical to the default bounded
    # global window: bursts that straddle midnight (gap <= 10 min) merge
    # into one incident, and chains may run across several days
    from sport_data_pipeline_spark.plans.eventops import _incident_windows

    def ts(s):
        return dt.datetime.fromisoformat(s)

    rows = [
        # burst A: spans midnight d1->d2 with 6-min boundary gap (merges)
        ("error", ts("2024-03-01 23:50:00")),
        ("error", ts("2024-03-01 23:58:00")),
        ("error", ts("2024-03-02 00:04:00")),
        # >10 min later the same day: burst B
        ("error", ts("2024-03-02 00:30:00")),
        # burst C: a chain across THREE days, every boundary gap <= 10 min
        ("error", ts("2024-03-04 23:55:00")),
        ("error", ts("2024-03-05 00:05:00")),
        ("error", ts("2024-03-05 23:59:00")),
        ("error", ts("2024-03-06 00:08:00")),
        # non-error events must be ignored
        ("purchase", ts("2024-03-02 00:10:00")),
    ]
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp")
    got = sorted(
        (r["w_start"], r["w_end"], r["n_error_minutes"])
        for r in _incident_windows(ev, two_level=True).collect()
    )
    got_default = sorted(
        (r["w_start"], r["w_end"], r["n_error_minutes"])
        for r in _incident_windows(ev).collect()
    )
    assert got == got_default  # both derivations agree bit-for-bit
    assert got == [
        (ts("2024-03-01 23:50:00"), ts("2024-03-02 00:14:00"), 3),
        (ts("2024-03-02 00:30:00"), ts("2024-03-02 00:40:00"), 1),
        # the C chain collapses to ONE window across three days... unless
        # the 23:59 -> next-burst gap breaks it: 00:05 -> 23:59 same day is
        # > 10 min, so C is actually two windows; the midnight merges hold
        (ts("2024-03-04 23:55:00"), ts("2024-03-05 00:15:00"), 2),
        (ts("2024-03-05 23:59:00"), ts("2024-03-06 00:18:00"), 2),
    ]


def test_systematic_weighted_sample_edges(spark):
    import pytest as _pytest

    from sport_data_pipeline_spark.operators.windows import systematic_weighted_sample

    df = spark.createDataFrame([(1, 0), (2, 100), (3, 1), (4, 0)], "id int, w int")
    got = sorted(
        (r["id"], r["w"], r["n_points"])
        for r in systematic_weighted_sample(df, "id", "w", 5).collect()
    )
    # zero-weight items never selected; the heavy item covers 4 of the 5
    # points, the last point k=5 (p == W) lands in id 3's interval
    assert got == [(2, 100, 4), (3, 1, 1)]
    assert sum(p for _, _, p in got) == 5  # sum(n_points) == n exactly
    with _pytest.raises(ValueError, match="positive"):
        systematic_weighted_sample(df, "id", "w", 0)
