"""Property-based tests (SURVEY.md §5.4) — hypothesis over small random
option batches, driving the Spark merge through arbitrary groupings.

Spark round-trips are slow, so examples are few but each covers many
rows; properties target the merge algebra where parallel execution could
silently diverge from the reference's sequential Map-merge.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from tepsonic_database_sync_spark.operators.options import merge_options

OPTION_SCHEMA = (
    "product_id string, grade string, color string, variant string, "
    "stock long, price long, discount long, uids string"
)

option_row = st.tuples(
    st.sampled_from(["p1", "p2"]),
    st.sampled_from(["A", "B"]),
    st.sampled_from(["Red", "Blue"]),
    st.sampled_from(["128GB", "256GB"]),
    st.integers(min_value=1, max_value=50),
    st.integers(min_value=1, max_value=999),
    st.sampled_from(["u1", "u2", "u3"]),
)

batches = st.lists(option_row, min_size=0, max_size=8)


def _df(spark, rows):
    data = [(p, g, c, v, s, pr, pr, u) for (p, g, c, v, s, pr, u) in rows]
    return spark.createDataFrame(data, OPTION_SCHEMA)


def _canon(df) -> list[tuple]:
    pdf = df.toPandas().sort_values(
        by=["product_id", "grade", "color", "variant"]
    )
    pdf["uids"] = pdf["uids"].map(lambda s: "|".join(sorted(s.split("|"))))
    return list(map(tuple, pdf.itertuples(index=False)))


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(a=batches, b=batches, c=batches)
def test_merge_associative_and_commutative(spark, a, b, c):
    # merge(merge(a,b),c) == merge(a,merge(b,c)) == merge over any order
    A, B, C = _df(spark, a), _df(spark, b), _df(spark, c)
    left = merge_options(merge_options(A, B), C)
    right = merge_options(A, merge_options(B, C))
    flipped = merge_options(C, merge_options(B, A))
    assert _canon(left) == _canon(right) == _canon(flipped)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(a=batches, b=batches)
def test_merge_conserves_stock_and_uids(spark, a, b):
    A, B = _df(spark, a), _df(spark, b)
    merged = merge_options(A, B).toPandas()
    total_in = sum(r[4] for r in a) + sum(r[4] for r in b)
    assert merged["stock"].sum() == total_in
    n_uids = sum(len(u.split("|")) for u in merged["uids"]) if len(merged) else 0
    assert n_uids == len(a) + len(b)


# --- q-gram-blocked substring join ≡ direct theta join ---------------------

name_strat = st.text(
    alphabet="ab c",  # tiny alphabet maximizes collisions and substrings
    min_size=0,
    max_size=10,
).map(lambda s: s.strip())


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    misses=st.lists(name_strat, min_size=0, max_size=8),
    admin=st.lists(name_strat.filter(bool), min_size=0, max_size=8),
)
def test_blocked_partial_match_equals_theta_join(spark, misses, admin):
    """The q-gram blocking rewrite must be EXACTLY equivalent to the
    direct containment theta-join for arbitrary names — zero false
    negatives from blocking, zero false positives from gram collisions."""
    from tepsonic_database_sync_spark.operators.matching import match_partial

    m = spark.createDataFrame(
        [(x,) for x in set(misses)] or [("",)], "gname string"
    )
    a = spark.createDataFrame(
        [(f"id{i}", x, "64GB 4GB RAM") for i, x in enumerate(sorted(set(admin)))]
        or [("id0", "zzz", "64GB 4GB RAM")],
        "_id string, name string, storage string",
    )
    got = sorted(map(tuple, match_partial(m, a, blocked=True).collect()))
    want = sorted(map(tuple, match_partial(m, a, blocked=False).collect()))
    assert got == want


event_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),      # user_id
        st.integers(min_value=0, max_value=20),     # ts offset (secs)
        st.sampled_from(["A", "B", "C"]),           # state
    ),
    min_size=0,
    max_size=12,
)


def _scd2_key(t):
    # None-safe total order: a same-second state flip-flop (A→B→A) yields
    # two versions of one state with IDENTICAL (user, state, valid_from),
    # one closed (int valid_to) and one open (None) — plain tuple sort
    # would compare None with int and raise
    u, s, vf, vt, cur = t
    return (u, s, vf, vt is None, vt if vt is not None else 0, cur)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@example(rows=[(1, 0, "B"), (1, 0, "A"), (1, 0, "B")])  # same-second flip-flop
@given(rows=event_rows)
def test_scd2_matches_sequential_reference(spark, rows):
    """scd2_history ≡ the obvious sequential per-user fold: sort by
    (ts, event_id), collapse consecutive repeats, version ranges tile."""
    from pyspark.sql import functions as F

    from tepsonic_database_sync_spark.operators.events import scd2_history

    data = [
        (i, f"2024-01-01 00:00:{ts:02d}", u, s)
        for i, (u, ts, s) in enumerate(rows)
    ]
    ev = spark.createDataFrame(
        data, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = sorted(
        (
            (r["user_id"], r["state"], r["valid_from"], r["valid_to"], r["is_current"])
            for r in scd2_history(ev).collect()
        ),
        key=_scd2_key,
    )

    base = 1704067200  # 2024-01-01 00:00:00 UTC
    by_user: dict[int, list] = {}
    for i, (u, ts, s) in enumerate(rows):
        by_user.setdefault(u, []).append((base + ts, i, s))
    want = []
    for u, evs in by_user.items():
        evs.sort()
        versions = []
        for es, _i, s in evs:
            if not versions or versions[-1][1] != s:
                versions.append((es, s))
        for j, (es, s) in enumerate(versions):
            vt = versions[j + 1][0] if j + 1 < len(versions) else None
            want.append((u, s, es, vt, vt is None))
    assert got == sorted(want, key=_scd2_key)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    toks=st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=10),
    ctx=st.sampled_from([8, 16, 64]),
)
def test_pack_sequences_tiling_property(spark, toks, ctx):
    """Packing coordinates tile the shard's token stream exactly: doc N's
    start is the sum of earlier docs' tokens, spans cover [start, end),
    and chunk indices are consistent with integer division."""
    from tepsonic_database_sync_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame(
        [(i, "s", " ".join(["w"] * n)) for i, n in enumerate(toks)],
        "doc_id long, source string, text string",
    )
    got = {r["doc_id"]: r for r in pack_sequences(docs, ctx_len=ctx).collect()}
    start = 0
    for i, n in enumerate(toks):
        r = got[i]
        assert r["n_toks"] == n
        assert r["start_tok"] == start
        assert r["chunk_first"] == start // ctx
        assert r["chunk_last"] == (start + n - 1) // ctx
        assert r["n_chunks"] == r["chunk_last"] - r["chunk_first"] + 1
        start += n


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    gaps=st.lists(
        st.integers(min_value=0, max_value=200_000), min_size=1, max_size=12
    ),
    n_users=st.integers(min_value=1, max_value=3),
)
def test_sessionize_partition_property(spark, gaps, n_users):
    """Gap sessionization is a PARTITION of each user's events: every
    event lands in exactly one session, sessions split exactly where a
    gap exceeds the threshold (the strategy straddles 86400 so both
    branches are exercised), and session stats (start, n_events,
    duration) are exactly the min/count/span of the member events — for
    arbitrary gap sequences shared across users."""
    from pyspark.sql import functions as F

    from tepsonic_database_sync_spark.registry import q_sessionize_batch

    GAP = 86400  # the operator's threshold
    rows = []
    eid = 0
    for u in range(n_users):
        ts = 1_000_000 + u  # stagger users so their streams differ
        rows.append((u, eid, ts)); eid += 1
        for g in gaps:
            ts += g
            rows.append((u, eid, ts)); eid += 1

    events = spark.createDataFrame(rows, "user_id long, event_id long, es long")
    events = events.withColumn("ts", F.timestamp_seconds("es"))

    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        events.select("user_id", "event_id", "ts").write.mode("overwrite").parquet(
            os.path.join(d, "events.parquet")
        )
        got = q_sessionize_batch(spark, d).collect()

    by_user = {}
    for r in got:
        by_user.setdefault(r["user_id"], []).append(
            (r["session_start"], r["n_events"], r["duration_sec"], r["session_idx"])
        )
    for u in range(n_users):
        ts = 1_000_000 + u
        sessions = [[ts]]
        for g in gaps:
            ts += g
            if g > GAP:
                sessions.append([])
            sessions[-1].append(ts)
        want = sorted((min(s), len(s), max(s) - min(s)) for s in sessions)
        got_u = sorted((a, b, c) for a, b, c, _ in by_user[u])
        assert got_u == want, (u, got_u, want)
        # session indices are 1..n in start order
        idxs = sorted(i for *_, i in by_user[u])
        assert idxs == list(range(1, len(sessions) + 1))


# ---------------------------------------------------------------------------
# Bloom decontamination: no false negatives at ANY geometry (VERDICT r6
# item 6). The double-hashing math (h2 forced odd, positions mod a
# power-of-two m) must set and find every inserted gram's k bits for
# every m — a collision-heavy tiny m produces false POSITIVES only.


bloom_gram_lists = st.lists(
    st.text(
        alphabet=st.characters(min_codepoint=33, max_codepoint=0x24F),
        min_size=1,
        max_size=12,
    ),
    min_size=1,
    max_size=40,
    unique=True,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(grams=bloom_gram_lists, m_bits=st.sampled_from([1024, 2048, 8192, 65536]))
def test_bloom_bitset_never_false_negative(spark, grams, m_bits):
    """Every inserted gram's k probe positions must be set in the bitset,
    for arbitrary gram strings and every power-of-two m — the primitive
    behind decontaminate_bloom's hard bloom_ok flag."""
    from tepsonic_database_sync_spark.operators.dedup import (
        BLOOM_K,
        _bloom_pos,
        _with_bloom_hashes,
        bloom_bitset,
    )

    gdf = spark.createDataFrame([(g,) for g in grams], "g string")
    words = {r["w"]: r["bits"] for r in bloom_bitset(gdf, m_bits).collect()}
    probes = _with_bloom_hashes(gdf, m_bits).select(
        "g", *[_bloom_pos(i, m_bits).alias(f"p{i}") for i in range(BLOOM_K)]
    ).collect()
    for r in probes:
        for i in range(BLOOM_K):
            pos = r[f"p{i}"]
            # Python ints are infinite two's-complement, so the bit-63
            # test is exact even when the Java long came back negative
            assert words.get(pos // 64, 0) & (1 << (pos % 64)), (
                r["g"], m_bits, i, pos,
            )


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    bits_per_gram=st.sampled_from([1, 2, 8, 32]),
    bench_pct=st.sampled_from([10, 40]),
)
def test_contamination_bloom_ok_across_geometries(spark, bits_per_gram, bench_pct):
    """The full operator across (bench size, bits/gram) geometries:
    bloom_ok must be TRUE on every row even at 1 bit/gram (m floored at
    1024, collisions near-certain → false positives allowed, false
    negatives never), and the exact columns must be geometry-invariant."""
    from tepsonic_database_sync_spark.operators.dedup import (
        contamination_flags,
        contamination_flags_bloom,
    )

    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    docs = spark.createDataFrame(
        [
            (
                i,
                len(" ".join(vocab[(i + j) % len(vocab)] for j in range(6))),
                " ".join(vocab[(i + j) % len(vocab)] for j in range(6)),
            )
            for i in range(40)
        ],
        "doc_id long, n_chars long, text string",
    )
    got = contamination_flags_bloom(
        docs, bench_pct=bench_pct, bits_per_gram=bits_per_gram
    ).collect()
    assert got and all(r["bloom_ok"] for r in got), (bits_per_gram, bench_pct)
    exact = {
        (r["doc_id"], r["n_hit_grams"], r["contaminated"])
        for r in contamination_flags(docs, bench_pct=bench_pct).collect()
    }
    assert {
        (r["doc_id"], r["n_hit_grams"], r["contaminated"]) for r in got
    } == exact


snapshot_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),  # key
        st.one_of(st.none(), st.integers(min_value=-5, max_value=5)),  # value
        st.sampled_from([None, "a", "b"]),  # status
    ),
    min_size=0,
    max_size=25,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(old_rows=snapshot_rows, new_rows=snapshot_rows)
def test_cdc_apply_diff_roundtrip(spark, old_rows, new_rows):
    """The CDC pair law: apply_changeset(old, snapshot_diff(old, new))
    must reproduce NEW exactly, for any snapshots — including NULL
    values, NULL→value and value→NULL flips, disjoint key sets, and
    empty sides. Keys are deduplicated (snapshots are keyed tables)."""
    from tepsonic_database_sync_spark.operators.cdc import (
        apply_changeset,
        snapshot_diff,
    )

    dedup_old = {k: (k, v, s) for k, v, s in old_rows}
    dedup_new = {k: (k, v, s) for k, v, s in new_rows}
    schema = "k long, v long, s string"
    old = spark.createDataFrame(list(dedup_old.values()) or [], schema)
    new = spark.createDataFrame(list(dedup_new.values()) or [], schema)
    diff = snapshot_diff(old, new, ["k"], ["v", "s"])
    applied = apply_changeset(old, diff, ["k"], ["v", "s"])
    assert {tuple(r) for r in applied.collect()} == set(dedup_new.values())


quantile_groups = st.lists(
    st.tuples(
        st.sampled_from(["g", "h"]),
        st.one_of(st.none(), st.integers(min_value=-50, max_value=50)),
    ),
    min_size=1,
    max_size=40,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=quantile_groups, qs=st.lists(st.integers(1, 1000), min_size=1,
                                         max_size=4, unique=True))
def test_grouped_quantiles_match_rank_definition(spark, rows, qs):
    """grouped_quantiles_exact must return, for every group and q, the
    value at rank ceil(q·n/1000) of the ascending sorted non-null values
    — checked against a direct Python sort for random groups, NULLs,
    ties, and arbitrary q grids (hypothesis)."""
    import math

    from tepsonic_database_sync_spark.operators.quantiles import (
        grouped_quantiles_exact,
    )

    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        (r["g"], r["q_permille"]): (r["n"], r["value"])
        for r in grouped_quantiles_exact(df, "g", "v", qs_permille=qs).collect()
    }
    want = {}
    by_g = {}
    for g, v in rows:
        if v is not None:
            by_g.setdefault(g, []).append(v)
    for g, vals in by_g.items():
        vals.sort()
        for q in qs:
            rank = max(1, math.ceil(q * len(vals) / 1000))
            want[(g, q)] = (len(vals), vals[rank - 1])
    assert got == want


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(old_rows=snapshot_rows, new_rows=snapshot_rows)
def test_cdc_incremental_agg_matches_full_recompute(spark, old_rows, new_rows):
    """The maintenance law: incremental_agg(agg(OLD), diff(OLD, NEW))
    must equal a full recompute of the rollup over NEW — for any
    snapshots, including NULL groups, NULL values (counted as 0),
    cross-group moves, and groups that empty out."""
    from tepsonic_database_sync_spark.operators.cdc import (
        incremental_agg,
        snapshot_diff,
    )
    import pyspark.sql.functions as FF

    dedup_old = {k: (k, v, s) for k, v, s in old_rows}
    dedup_new = {k: (k, v, s) for k, v, s in new_rows}
    schema = "k long, v long, s string"
    old = spark.createDataFrame(list(dedup_old.values()) or [], schema)
    new = spark.createDataFrame(list(dedup_new.values()) or [], schema)

    def agg(df):
        return df.groupBy("s").agg(
            FF.count("*").cast("long").alias("n_rows"),
            FF.sum(FF.coalesce(FF.col("v"), FF.lit(0))).cast("long").alias("sum_v"),
        )

    diff = snapshot_diff(old, new, ["k"], ["v", "s"])
    got = incremental_agg(agg(old), diff, group="s", value="v")
    want = {tuple(r) for r in agg(new).collect()}
    assert {tuple(r) for r in got.collect()} == want


locf_events = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),                 # key
        st.integers(min_value=0, max_value=12),       # hour offset
        st.integers(min_value=0, max_value=500),      # value
    ),
    min_size=1,
    max_size=30,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=locf_events)
def test_resample_locf_matches_python_reference(spark, rows):
    """Gap-fill + LOCF must match a direct Python replay for random
    sparse event sets: full per-key grid, max-per-bucket reduction,
    carry-forward through arbitrary gap runs, correct gap flags."""
    import datetime as dt

    from pyspark.sql import functions as FF

    from tepsonic_database_sync_spark.operators.timeseries import (
        resample_locf,
    )

    utc = dt.timezone.utc
    base = dt.datetime(2024, 1, 1, tzinfo=utc)
    df = spark.createDataFrame(
        [(k, base + dt.timedelta(hours=h, minutes=7), v) for k, h, v in rows],
        "k string, ts timestamp, v long",
    )
    got = {(r["key"], r["bucket_es"]): (r["n_events"], r["value_cents"],
                                        r["is_gap"])
           for r in resample_locf(df, "k", "ts", FF.col("v")).collect()}

    b0 = int(base.timestamp())
    want = {}
    for key in {k for k, _, _ in rows}:
        mine = [(h, v) for k, h, v in rows if k == key]
        hours = sorted({h for h, _ in mine})
        last = None
        for h in range(hours[0], hours[-1] + 1):
            obs = [v for hh, v in mine if hh == h]
            if obs:
                last = max(obs)
            want[(key, b0 + 3600 * h)] = (len(obs), last, not obs)
    assert got == want


compaction_files = st.lists(
    st.tuples(
        st.sampled_from(["p", "q"]),
        st.integers(min_value=1, max_value=3000),     # bytes
    ),
    min_size=1,
    max_size=25,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=compaction_files, target=st.integers(min_value=1, max_value=2500))
def test_compaction_plan_matches_greedy_reference(spark, rows, target):
    """The prefix-sum binning must equal the sequential greedy replay
    for random listings and targets: bin boundaries, running bin bytes,
    and the skip flag for right-sized singletons."""
    from tepsonic_database_sync_spark.operators.compaction import (
        compaction_plan,
    )

    files = [(p, i, b) for i, (p, b) in enumerate(rows)]
    df = spark.createDataFrame(files, "part string, fid long, bytes long")
    got = {r["fid"]: (r["bin"], r["bin_bytes"], r["needs_compaction"])
           for r in compaction_plan(df, "part", "fid", "bytes", target).collect()}

    want = {}
    for part in {p for p, _, _ in files}:
        cum = 0
        bins = {}
        for p, fid, b in sorted(files):
            if p != part:
                continue
            bin_id = cum // target
            cum += b
            bins.setdefault(bin_id, []).append((fid, b, cum))
        for bin_id, members in bins.items():
            start = members[0][2] - members[0][1]
            for fid, b, c in members:
                skip = len(members) == 1 and b >= target
                want[fid] = (bin_id, c - start, not skip)
    assert got == want


# ---- r8 properties -----------------------------------------------------

interval_set = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=50000),
        # durations from -2: zero/negative-length intervals exercise the
        # documented drop-degenerate path (end-exclusive semantics — they
        # can never overlap anything, and reversed spans must not fan out)
        st.integers(min_value=-2, max_value=30000),
    ),
    min_size=0,
    max_size=12,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(aset=interval_set, bset=interval_set)
def test_interval_join_blocking_equals_theta_ground_truth(spark, aset, bset):
    """The bucketed interval join must equal the quadratic ground truth
    for ANY interval geometry — spans shorter/longer than the bucket,
    boundary-straddling, duplicates, empty sides."""
    from tepsonic_database_sync_spark.operators.timeseries import (
        interval_overlap_join,
    )

    a_rows = [(f"a{i}", s, s + d) for i, (s, d) in enumerate(aset)]
    b_rows = [(i, s, s + d) for i, (s, d) in enumerate(bset)]
    a = spark.createDataFrame(
        a_rows, "a_id string, a_start long, a_end long"
    )
    b = spark.createDataFrame(b_rows, "b_id long, b_start long, b_end long")
    got = {
        (r["a_id"], r["b_id"]): r["overlap_sec"]
        for r in interval_overlap_join(a, b).collect()
    }
    want = {
        (aid, bid): min(ae, be) - max(as_, bs)
        for (aid, as_, ae) in a_rows
        for (bid, bs, be) in b_rows
        # positive-length on BOTH sides (the operator's documented
        # drop-degenerate rule), then end-exclusive overlap
        if ae > as_ and be > bs and as_ < be and bs < ae
    }
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["d1", "d2", "d3", "d4", "d5", "d6"]),
            st.sampled_from(["bm25", "cos", "recency"]),
            st.integers(min_value=1, max_value=7),
        ),
        min_size=0,
        max_size=18,
    ),
    k=st.integers(min_value=1, max_value=4),
)
def test_rrf_fusion_matches_reference_including_tie_regions(spark, rows, k):
    """rrf_fuse must match an integer reference for ANY long-form input
    — deliberately small rank/key alphabets so score TIES are common:
    equal rrf_micro must order by key ascending, the LIMIT must cut
    deterministically inside a tie run, and duplicate (key, ranker)
    rows must sum every rank while counting the ranker once."""
    from tepsonic_database_sync_spark.operators.recommend import (
        RRF_K,
        RRF_SCALE,
        rrf_fuse,
    )

    df = spark.createDataFrame(
        rows, "key string, ranker string, rank long"
    )
    got = [
        (r["key"], r["n_rankers"], r["rrf_micro"])
        for r in rrf_fuse(df, k=k).collect()
    ]

    agg: dict[str, list] = {}
    for key, ranker, rank in rows:
        cur = agg.setdefault(key, [set(), 0])
        cur[0].add(ranker)
        cur[1] += RRF_SCALE // (RRF_K + rank)
    ordered = sorted(
        ((key, len(rs), score) for key, (rs, score) in agg.items()),
        key=lambda t: (-t[2], t[0]),
    )
    assert got == ordered[:k]


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),  # user
            st.sampled_from(["signup", "view", "purchase", "click"]),
            st.integers(min_value=0, max_value=400000),  # seconds
        ),
        min_size=0,
        max_size=25,
    )
)
def test_window_funnel_matches_sequential_reference(spark, events):
    """window_funnel must match a brute-force per-anchor scan: for every
    signup anchor, greedily take the earliest strictly-later next stage
    within the INCLUSIVE horizon — ClickHouse boundary semantics
    (greedy-earliest ≡ any-subsequence)."""
    import datetime as dt

    from tepsonic_database_sync_spark.operators.events import (
        WFUNNEL_HORIZON_S,
        window_funnel,
    )

    utc = dt.timezone.utc
    base = dt.datetime(2024, 1, 1, tzinfo=utc)
    rows = [
        (u, t, base + dt.timedelta(seconds=s)) for (u, t, s) in events
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )
    got = {r["user_id"]: r["steps"] for r in window_funnel(df).collect()}

    stages = ("signup", "view", "purchase")
    by_user: dict[int, dict[str, list[int]]] = {}
    for u, t, s in events:
        by_user.setdefault(u, {}).setdefault(t, []).append(s)
    want = {}
    for u, evs in by_user.items():
        anchors = sorted(set(evs.get("signup", [])))
        if not anchors:
            continue
        best = 1
        for t0 in anchors:
            prev, steps = t0, 1
            for stage in stages[1:]:
                nxt = [
                    t
                    for t in evs.get(stage, [])
                    if t > prev and t <= t0 + WFUNNEL_HORIZON_S
                ]
                if not nxt:
                    break
                prev = min(nxt)
                steps += 1
            best = max(best, steps)
        want[u] = best
    assert got == want


@st.composite
def _milli_case(draw):
    """(num, den) inside _milli_scale's stated contract: den > 0,
    num = q·den + r with |q| < 9·10¹⁴ (quotient headroom) and
    num within int64 — the split's 1000× headroom is on the NUMERATOR,
    not the quotient (the unconstrained generator found the quotient
    overflow, now part of the documented contract)."""
    den = draw(st.integers(min_value=1, max_value=10**12))
    qmax = min(9 * 10**14, (2**63 - 1) // den - 1)
    q = draw(st.integers(min_value=-qmax, max_value=qmax))
    r = draw(st.integers(min_value=0, max_value=den - 1))
    num = q * den + (r if q >= 0 else -r)
    return num, den


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=_milli_case())
def test_milli_scale_split_is_exact(spark, case):
    """The quotient/remainder milli split must equal the true
    trunc-toward-zero of 1000·num/den for any sign of num — the
    property the regression/χ² wide scaling rests on (Python // floors,
    so adjust for trunc semantics on negatives)."""
    from tepsonic_database_sync_spark.operators.profile import _milli_scale

    num, den = case
    df = spark.createDataFrame([(num, den)], "num long, den long")
    got = df.select(_milli_scale("num", "den").alias("v")).collect()[0]["v"]
    n1000 = 1000 * num
    want = n1000 // den if n1000 >= 0 else -((-n1000) // den)
    assert got == want, (num, den, got, want)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),  # user
            st.sampled_from(["a", "b", "c"]),  # type (small: dense ties)
            st.integers(min_value=0, max_value=30),  # seconds (dup-prone)
        ),
        min_size=0,
        max_size=20,
    ),
    k=st.integers(min_value=1, max_value=6),
)
def test_event_paths_matches_trigram_reference(spark, events, k):
    """event_paths must match a per-user trigram census computed in
    Python: same (es, event_id) ordering (duplicate timestamps resolved
    by event_id), same floored context permille, same (n desc, triple
    asc) top-k cut — including inside tie runs."""
    import datetime as dt
    from collections import Counter

    from tepsonic_database_sync_spark.operators.events import event_paths

    utc = dt.timezone.utc
    base = dt.datetime(2024, 1, 1, tzinfo=utc)
    rows = [
        (u, i, t, base + dt.timedelta(seconds=s))
        for i, (u, t, s) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts timestamp"
    )
    got = [
        (r["prev2_type"], r["prev1_type"], r["event_type"],
         r["n"], r["p_permille"])
        for r in event_paths(df, k=k).collect()
    ]

    by_user: dict[int, list] = {}
    for u, eid, t, s in [(u, i, t, s) for i, (u, t, s) in enumerate(events)]:
        by_user.setdefault(u, []).append((s, eid, t))
    tri = Counter()
    for u, evs in by_user.items():
        seq = [t for _, _, t in sorted(evs)]
        for j in range(2, len(seq)):
            tri[(seq[j - 2], seq[j - 1], seq[j])] += 1
    ctx = Counter()
    for (p2, p1, _t), n in tri.items():
        ctx[(p2, p1)] += n
    scored = [
        (p2, p1, t, n, (n * 1000) // ctx[(p2, p1)])
        for (p2, p1, t), n in tri.items()
    ]
    scored.sort(key=lambda r: (-r[3], r[0], r[1], r[2]))
    assert got == scored[:k]


def _h60_py(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),  # key (dups possible)
            st.sampled_from(["web", "book", "code"]),  # domain
            st.integers(min_value=0, max_value=3),  # coarse priority: ties
        ),
        min_size=0,
        max_size=20,
        unique_by=lambda r: r[0],
    ),
    n=st.integers(min_value=1, max_value=4),
)
def test_domain_cap_matches_ranked_reference(spark, rows, n):
    """domain_cap must keep exactly the per-domain top-n by
    (priority desc, h60('cap:'+key), key) — the hash-lottery tie region
    replicated bit-for-bit in Python."""
    from pyspark.sql import functions as F

    from tepsonic_database_sync_spark.operators.sampling import domain_cap

    df = spark.createDataFrame(
        rows, "doc_id long, domain string, prio long"
    )
    got = {
        (r["doc_id"], r["domain"], r["priority"])
        for r in domain_cap(
            df, "domain", "doc_id", F.col("prio"), n
        ).collect()
    }
    want = set()
    for dom in {d for _, d, _ in rows}:
        members = sorted(
            ((k, d, p) for (k, d, p) in rows if d == dom),
            key=lambda r: (-r[2], _h60_py(f"cap:{r[0]}"), r[0]),
        )
        want |= {tuple(m) for m in members[:n]}
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=60),
            st.sampled_from(["pos", "neg", "neu"]),
        ),
        min_size=1,
        max_size=24,
        unique_by=lambda r: r[0],
    )
)
def test_class_balance_matches_min_quota_reference(spark, rows):
    """class_balance must cut every class to the smallest class's size,
    keeping the lowest (h60('bal:'+key), key) rows per class."""
    from tepsonic_database_sync_spark.operators.sampling import (
        class_balance,
    )

    df = spark.createDataFrame(rows, "doc_id long, label string")
    got = {
        (r["doc_id"], r["label"])
        for r in class_balance(df, "label", "doc_id").collect()
    }
    classes: dict[str, list[int]] = {}
    for k, lbl in rows:
        classes.setdefault(lbl, []).append(k)
    m = min(len(v) for v in classes.values())
    want = set()
    for lbl, keys in classes.items():
        keys.sort(key=lambda k: (_h60_py(f"bal:{k}"), k))
        want |= {(k, lbl) for k in keys[:m]}
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pos=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4),  # user
            st.integers(min_value=0, max_value=9),  # item
        ),
        min_size=1,
        max_size=24,
    ),
    n_candidates=st.integers(min_value=1, max_value=6),
    k=st.integers(min_value=1, max_value=4),
)
def test_negative_sample_matches_reference(spark, pos, n_candidates, k):
    """negative_sample must equal the Python reference end-to-end: the
    (pop desc, item asc) candidate pool cut, positive removal, the
    h60('neg:u:i') ranking with item tiebreak, and the up-to-k
    contract for users who interacted with most of the pool."""
    from collections import Counter

    from tepsonic_database_sync_spark.operators.recommend import (
        negative_sample,
    )

    df = spark.createDataFrame(pos, "uid long, item long")
    got = {
        (r["uid"], r["item"], r["neg_rank"])
        for r in negative_sample(
            df, "uid", "item", n_candidates=n_candidates, k=k
        ).collect()
    }

    dedup = set(pos)
    popc = Counter(i for _, i in dedup)
    top = sorted(popc.items(), key=lambda t: (-t[1], t[0]))[:n_candidates]
    pool = [i for i, _ in top]
    want = set()
    for u in {u for u, _ in dedup}:
        elig = [i for i in pool if (u, i) not in dedup]
        elig.sort(key=lambda i: (_h60_py(f"neg:{u}:{i}"), i))
        want |= {(u, i, r + 1) for r, i in enumerate(elig[:k])}
    assert got == want


# ---------------------------------------------------------------------------
# Winnowing fingerprints vs a sequential reference
# ---------------------------------------------------------------------------

def _winnow_py(text: str, k: int, w: int) -> tuple[int, str]:
    """Sequential winnowing reference: same normalize (lower, collapse
    whitespace, trim), same polynomial hash mod M, plain min per w-window,
    distinct sorted minima joined with '|'. Mirrors the documented Spark
    split semantics: split('', '') yields [''] whose ascii code is 0."""
    import re as _re

    from tepsonic_database_sync_spark.operators.text import (
        WINNOW_B,
        WINNOW_M,
    )

    s = _re.sub(r"\s+", " ", text.lower()).strip()
    codes = [ord(c) for c in s] if s else [0]
    npos = max(len(codes) - k + 1, 0)
    powers = [pow(WINNOW_B, k - 1 - j, WINNOW_M) for j in range(k)]
    hashes = [
        sum(codes[i + j] * powers[j] for j in range(k)) % WINNOW_M
        for i in range(npos)
    ]
    nw = max(len(hashes) - w + 1, 0)
    minima = [min(hashes[i : i + w]) for i in range(nw)]
    return npos, "|".join(str(v) for v in sorted(set(minima)))


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=14),
        min_size=1,
        max_size=6,
    ),
    k=st.integers(min_value=2, max_value=4),
    w=st.integers(min_value=1, max_value=3),
)
def test_winnow_fingerprints_match_sequential_reference(spark, texts, k, w):
    """winnow_fingerprints must equal the sequential MOSS-style reference
    for ANY text — around the n_grams/n_windows boundaries (len < k,
    len == k, n_hashes < w), tie-dense hashes (2-char alphabet), and
    whitespace-only docs that normalize to ''."""
    from tepsonic_database_sync_spark.operators.text import (
        winnow_fingerprints,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["fps"])
        for r in winnow_fingerprints(docs, k=k, w=w).collect()
    }
    want = {i: _winnow_py(t, k, w) for i, t in enumerate(texts)}
    assert got == want


# ---------------------------------------------------------------------------
# BM25 / TF-IDF fixed-point scoring vs an exact integer reference
# ---------------------------------------------------------------------------

def _iln_milli_py(x: int) -> int:
    """Integer twin of text.iln_milli: floor(log2) by bit_length, linear
    interpolation within the octave, ln2 fixed-point multiply."""
    k = x.bit_length() - 1
    p2k = 1 << k
    frac = ((x - p2k) * 1000) // p2k
    return ((k * 1000 + frac) * 693147) // 1000000 - 6908


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    doc_toks=st.lists(
        st.lists(
            st.sampled_from(["x", "y", "zz", "q"]), min_size=0, max_size=6
        ),
        min_size=1,
        max_size=6,
    ),
    query=st.lists(
        st.sampled_from(["x", "q", "zz", "absent"]),
        min_size=1,
        max_size=3,
        unique=True,
    ),
)
def test_bm25_tfidf_matches_integer_reference(spark, doc_toks, query):
    """bm25_tfidf must equal the exact integer reference for ANY corpus:
    df=0 terms (idf clamp + tfidf skip), empty docs (tokenizer yields
    [''] so dl=1, never 0 — avgdl can't divide by zero), single-doc
    corpora (x_bm25 = 1000//(2df+1) floors into the idf clamp), and
    tf-heavy docs saturating tf_norm."""
    from tepsonic_database_sync_spark.operators.text import bm25_tfidf

    texts = [" ".join(ts) for ts in doc_toks]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["bm25_milli"], r["tfidf_milli"])
        for r in bm25_tfidf(docs, query).collect()
    }

    # the tokenizer splits the trimmed text on \s+, so '' -> ['']
    toks = [ts if ts else [""] for ts in doc_toks]
    n = len(toks)
    dls = [len(t) for t in toks]
    avgdl = (sum(dls) * 1000) // n
    k1, b = 1200, 750
    want = {}
    for d, t in enumerate(toks):
        dl = dls[d]
        bm25 = tfidf = 0
        for q in query:
            tf = t.count(q)
            df = sum(1 for u in toks if q in u)
            x_b = ((2 * (n - df) + 1) * 1000) // (2 * df + 1)
            idf_b = max(0, _iln_milli_py(max(x_b, 1)))
            denom = tf * 1000 + (
                k1 * ((1000 - b) + (b * dl * 1000) // avgdl)
            ) // 1000
            bm25 += (idf_b * ((tf * (k1 + 1000) * 1000) // denom)) // 1000
            if df > 0:
                tfidf += tf * max(0, _iln_milli_py(max((n * 1000) // df, 1)))
        want[d] = (dl, bm25, tfidf)
    assert got == want


# ---------------------------------------------------------------------------
# Bigram LM scoring vs an exact integer reference
# ---------------------------------------------------------------------------

@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    doc_toks=st.lists(
        st.lists(st.sampled_from(["r", "s", "t"]), min_size=0, max_size=6),
        min_size=1,
        max_size=6,
    ),
)
def test_lm_score_matches_integer_reference(spark, doc_toks):
    """lm_score must equal the exact add-one bigram-LM reference for ANY
    corpus: docs with < 2 tokens (0 over 0 bigrams, but their unigrams
    still train the lexicon), repeated bigrams summing per occurrence,
    and the micro-scale clamp floor. Small alphabet so c(u,v)/c(u)/V
    interact densely."""
    from collections import Counter

    from tepsonic_database_sync_spark.operators.text import lm_score

    texts = [" ".join(ts) for ts in doc_toks]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["sum_nll_milli"], r["avg_nll_milli"])
        for r in lm_score(docs).collect()
    }

    uni = Counter(t for ts in doc_toks for t in ts)
    v_types = len(uni)
    big = Counter(
        (ts[i], ts[i + 1])
        for ts in doc_toks
        if len(ts) >= 2
        for i in range(len(ts) - 1)
    )
    want = {}
    for d, ts in enumerate(doc_toks):
        pairs = [(ts[i], ts[i + 1]) for i in range(len(ts) - 1)]
        nlls = [
            6908
            - _iln_milli_py(
                max(((big[p] + 1) * 1000000) // (uni[p[0]] + v_types), 1)
            )
            for p in pairs
        ]
        n, s = len(nlls), sum(nlls)
        want[d] = (n, s, s // n if n else 0)
    assert got == want


# ---------------------------------------------------------------------------
# tf-idf shingle cosine join vs an exact integer reference
# ---------------------------------------------------------------------------

@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    doc_toks=st.lists(
        st.lists(st.sampled_from(["u", "v", "w"]), min_size=0, max_size=6),
        min_size=2,
        max_size=6,
    ),
    df_cap=st.integers(min_value=1, max_value=6),
    tf_cap=st.integers(min_value=1, max_value=3),
)
def test_tfidf_doc_sim_matches_integer_reference(spark, doc_toks, df_cap, tf_cap):
    """tfidf_doc_sim must equal the integer reference for ANY corpus and
    cap geometry: the df-cap dropping stop-shingles, the tf cap, docs
    too short to shingle, and — the sharp edge — NEGATIVE weights when
    df == N (iln_milli(1000) = -9, the documented 0.061-nat epsilon),
    whose dot products must divide with ANSI div's truncation toward
    zero, not Python floor."""
    import math
    from collections import Counter

    from tepsonic_database_sync_spark.operators.text import tfidf_doc_sim

    texts = [" ".join(ts) for ts in doc_toks]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["a_id"], r["b_id"]): (r["dot"], r["cos_permille"])
        for r in tfidf_doc_sim(
            docs, df_cap=df_cap, min_df=1, tf_cap=tf_cap, min_cos_permille=0
        ).collect()
    }

    nd = len(doc_toks)
    per_doc = [
        Counter(
            " ".join(ts[i : i + 2]) for i in range(len(ts) - 1)
        )
        for ts in doc_toks
    ]
    dfreq = Counter(s for c in per_doc for s in c)
    kept = {s for s, f in dfreq.items() if 1 <= f <= df_cap}
    w = [
        {
            s: min(tf, tf_cap) * _iln_milli_py((1000 * nd) // dfreq[s])
            for s, tf in c.items()
            if s in kept
        }
        for c in per_doc
    ]
    want = {}
    for a in range(nd):
        for b in range(a + 1, nd):
            shared = set(w[a]) & set(w[b])
            if not shared:
                continue
            dot = sum(w[a][s] * w[b][s] for s in shared)
            sa = math.isqrt(sum(x * x for x in w[a].values()))
            sb = math.isqrt(sum(x * x for x in w[b].values()))
            q, rem = divmod(abs(1000 * dot), sa * sb)
            cos = q if dot >= 0 else -q  # ANSI div truncates toward zero
            if cos >= 0:
                want[(a, b)] = (dot, cos)
    assert got == want


# ---------------------------------------------------------------------------
# Linear-interpolation resample vs a sequential reference
# ---------------------------------------------------------------------------

@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),  # key
            st.integers(min_value=0, max_value=800),  # epoch seconds
            st.integers(min_value=0, max_value=500),  # cents
        ),
        min_size=1,
        max_size=20,
    ),
    step=st.sampled_from([60, 100, 250]),
)
def test_resample_linear_matches_sequential_reference(spark, events, step):
    """resample_linear must equal the sequential reference for ANY event
    geometry: single-observation keys (grid of one bucket, no gap),
    multi-observation buckets (v = bucket max), gaps of any width
    (convex-combination fill with truncating div), and grids whose ends
    are observations by construction."""
    from pyspark.sql import functions as F

    from tepsonic_database_sync_spark.operators.timeseries import (
        resample_linear,
    )

    df = spark.createDataFrame(
        [(k, ts, c) for k, ts, c in events],
        "k long, es long, cents long",
    ).select("k", F.timestamp_seconds("es").alias("ts"), "cents")
    got = {
        (r["key"], r["bucket_es"]): (
            r["n_events"],
            r["value_cents"],
            r["is_gap"],
        )
        for r in resample_linear(
            df, "k", "ts", F.col("cents"), step_s=step
        ).collect()
    }

    want = {}
    by_key: dict[int, list] = {}
    for k, ts, c in events:
        by_key.setdefault(k, []).append((ts // step * step, c))
    for k, obs in by_key.items():
        buckets: dict[int, list] = {}
        for b, c in obs:
            buckets.setdefault(b, []).append(c)
        lo, hi = min(buckets), max(buckets)
        grid = list(range(lo, hi + 1, step))
        observed = sorted(buckets)
        for b in grid:
            if b in buckets:
                want[(k, b)] = (len(buckets[b]), max(buckets[b]), False)
            else:
                tp = max(o for o in observed if o < b)
                tn = min(o for o in observed if o > b)
                vp, vn = max(buckets[tp]), max(buckets[tn])
                # both products non-negative -> trunc div == floor div
                v = (vp * (tn - b) + vn * (b - tp)) // (tn - tp)
                want[(k, b)] = (0, v, True)
    assert got == want


# ---------------------------------------------------------------------------
# SimHash signature vs an exact bit-vote reference
# ---------------------------------------------------------------------------

@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    doc_toks=st.lists(
        st.lists(st.sampled_from(["m", "n", "o", "p"]), min_size=0, max_size=8),
        min_size=1,
        max_size=5,
    ),
    bits=st.sampled_from([4, 16, 32]),
)
def test_simhash_matches_bit_vote_reference(spark, doc_toks, bits):
    """simhash must equal the per-token ±1 bit-vote reference for ANY
    doc: repeated tokens vote once per OCCURRENCE, exact vote ties
    (sum == 0) pack as 0, and the empty doc (tokenizer yields [''],
    which still hashes and votes) gets the h60('')-derived signature,
    not NULL."""
    from tepsonic_database_sync_spark.operators.dedup import simhash

    texts = [" ".join(ts) for ts in doc_toks]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["simhash"]
        for r in simhash(docs, bits=bits).collect()
    }

    want = {}
    for d, ts in enumerate(doc_toks):
        toks = ts if ts else [""]
        sig = 0
        for b in range(bits):
            vote = sum(
                1 if (_h60_py(t) >> b) & 1 else -1 for t in toks
            )
            if vote > 0:
                sig |= 1 << b
        want[d] = sig
    assert got == want


# ---------------------------------------------------------------------------
# Sweep-line concurrency vs a sequential reference
# ---------------------------------------------------------------------------

@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    intervals=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),   # key
            st.integers(min_value=0, max_value=30),  # start
            st.integers(min_value=0, max_value=10),  # duration (0 = empty)
        ),
        min_size=1,
        max_size=16,
    ),
)
def test_interval_concurrency_matches_sweep_reference(spark, intervals):
    """interval_concurrency must equal the sequential sweep for ANY
    geometry: zero-length intervals cancel to net 0 at their instant,
    coincident boundaries sum their deltas into one row, and the running
    count drops exactly at the EXCLUSIVE end."""
    from pyspark.sql import functions as F

    from tepsonic_database_sync_spark.operators.timeseries import (
        interval_concurrency,
    )

    df = spark.createDataFrame(
        [(k, s, s + d) for k, s, d in intervals],
        "k long, s long, e long",
    )
    got = {
        (r["key"], r["t_es"]): (r["net"], r["concurrency"])
        for r in interval_concurrency(
            df, "k", F.col("s"), F.col("e")
        ).collect()
    }

    want = {}
    by_key: dict[int, dict[int, int]] = {}
    for k, s, d in intervals:
        nets = by_key.setdefault(k, {})
        nets[s] = nets.get(s, 0) + 1
        nets[s + d] = nets.get(s + d, 0) - 1
    for k, nets in by_key.items():
        running = 0
        for t in sorted(nets):
            running += nets[t]
            want[(k, t)] = (nets[t], running)
    assert got == want


# ---------------------------------------------------------------------------
# Dyadic EWMA vs an exact integer reference
# ---------------------------------------------------------------------------

@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    readings=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=2),  # key
            st.integers(min_value=0, max_value=9),  # bucket index
            st.integers(min_value=0, max_value=40),  # value
        ),
        min_size=1,
        max_size=14,
    ),
    span=st.sampled_from([2, 4, 8]),
)
def test_ewma_dyadic_matches_integer_reference(spark, readings, span):
    """ewma_dyadic must equal the exact dyadic-weight reference for ANY
    gappy series: the denominator adapts to the readings PRESENT in the
    trailing window, duplicate (key, bucket) readings each contribute
    AND each get an output row, and 1000·Σwx DIV Σw truncates like the
    non-negative contract promises."""
    from tepsonic_database_sync_spark.operators.timeseries import (
        ewma_dyadic,
    )

    step = 100
    df = spark.createDataFrame(
        [(k, b * step, x) for k, b, x in readings],
        "k long, bucket long, x long",
    )
    got = sorted(
        (r["key"], r["bucket_es"], r["value"], r["ewma_milli"])
        for r in ewma_dyadic(
            df, "k", "bucket", "x", step_s=step, span=span
        ).collect()
    )

    # contributions: reading at bucket b weights target b+k·step by
    # 2^(span-1-k), k in [0, span)
    sums: dict[tuple, list] = {}
    for k, b, x in readings:
        for j in range(span):
            w = 1 << (span - 1 - j)
            cur = sums.setdefault((k, (b + j) * step), [0, 0])
            cur[0] += w
            cur[1] += w * x
    want = sorted(
        (k, b * step, x, (1000 * sums[(k, b * step)][1]) // sums[(k, b * step)][0])
        for k, b, x in readings
    )
    assert got == want


# ---------------------------------------------------------------------------
# OHLC bars vs a sequential reference (composite-order open/close picks)
# ---------------------------------------------------------------------------

@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=2),    # key
            st.integers(min_value=0, max_value=500),  # epoch seconds
            st.integers(min_value=0, max_value=99),   # cents
        ),
        min_size=1,
        max_size=16,
    ),
    step=st.sampled_from([60, 250]),
)
def test_ohlc_bars_match_sequential_reference(spark, events, step):
    """ohlc_bars must equal the sequential reference for ANY feed:
    open/close resolved by the (ts, id, value) composite order even when
    many readings share the SAME second (the string-encoding trick's
    whole reason to exist), high/low/volume over every reading."""
    from pyspark.sql import functions as F

    from tepsonic_database_sync_spark.operators.timeseries import ohlc_bars

    rows = [(i, k, es, c) for i, (k, es, c) in enumerate(events)]
    df = spark.createDataFrame(
        rows, "event_id long, k long, es long, cents long"
    ).select("event_id", "k", F.timestamp_seconds("es").alias("ts"), "cents")
    got = {
        (r["key"], r["bucket_es"]): (
            r["n"],
            r["open_cents"],
            r["high_cents"],
            r["low_cents"],
            r["close_cents"],
            r["volume_cents"],
        )
        for r in ohlc_bars(
            df, "k", "ts", "event_id", F.col("cents"), step_s=step
        ).collect()
    }

    by_bucket: dict[tuple, list] = {}
    for i, k, es, c in rows:
        by_bucket.setdefault((k, es // step * step), []).append(
            (es * 1_000_000, i, c)
        )
    want = {}
    for kb, evs in by_bucket.items():
        evs.sort()  # (epoch_us, id, value) — the composite total order
        vals = [c for _, _, c in evs]
        want[kb] = (
            len(evs),
            evs[0][2],
            max(vals),
            min(vals),
            evs[-1][2],
            sum(vals),
        )
    assert got == want


# ---------------------------------------------------------------------------
# Grouped OLS regression and chi-square cells vs exact integer references
# ---------------------------------------------------------------------------

def _tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero division (Spark/DuckDB div), b > 0."""
    q = abs(a) // b
    return q if a >= 0 else -q


def _milli_scale_py(num: int, den: int) -> int:
    rem = num - _tdiv(num, den) * den  # dividend-signed remainder
    return _tdiv(num, den) * 1000 + _tdiv(rem * 1000, den)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["g1", "g2"]),
            st.integers(min_value=0, max_value=20),   # x
            st.integers(min_value=0, max_value=100),  # y
        ),
        min_size=1,
        max_size=16,
    ),
)
def test_grouped_regression_matches_integer_reference(spark, rows):
    """grouped_regression must equal the exact sufficient-statistics
    reference for ANY point set: the x0 re-centering algebra, the
    quotient/remainder milli split on a possibly-NEGATIVE slope
    numerator, the degenerate zero-x-variance groups (slope 0, mean as
    intercept), and the truncating intercept division."""
    from pyspark.sql import functions as F

    from tepsonic_database_sync_spark.operators.profile import (
        grouped_regression,
    )

    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {
        r["g"]: (r["n"], r["x0"], r["slope_milli"], r["intercept_milli"])
        for r in grouped_regression(df, "g", F.col("x"), F.col("y")).collect()
    }

    want = {}
    by_g: dict[str, list] = {}
    for g, x, y in rows:
        by_g.setdefault(g, []).append((x, y))
    for g, pts in by_g.items():
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxx = sum(x * x for x, _ in pts)
        sxy = sum(x * y for x, y in pts)
        x0 = min(x for x, _ in pts)
        sxc = sx - n * x0
        sxxc = sxx - 2 * x0 * sx + n * x0 * x0
        sxyc = sxy - x0 * sy
        num = n * sxyc - sxc * sy
        den = n * sxxc - sxc * sxc
        slope = _milli_scale_py(num, den) if den > 0 else 0
        intercept = _tdiv(1000 * sy - slope * sxc, n)
        want[g] = (n, x0, slope, intercept)
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["r1", "r2", "r3"]),
            st.sampled_from(["c1", "c2"]),
        ),
        min_size=1,
        max_size=24,
    ),
    quant=st.sampled_from([1, 2, 64]),
)
def test_chi_square_cells_match_integer_reference(spark, rows, quant):
    """chi_square_cells must equal the exact integer reference for ANY
    contingency shape: the DENSE grid including never-observed zero
    cells, negative deviations under truncating div, the deviation
    quantum, and the denominator clamp when quantization floors it to
    zero (quant=64 on tiny tables)."""
    from tepsonic_database_sync_spark.operators.profile import (
        chi_square_cells,
    )

    df = spark.createDataFrame(rows, "rv string, cv string")
    got = {
        (r["rv"], r["cv"]): (
            r["observed"],
            r["expected_milli"],
            r["contrib_milli"],
        )
        for r in chi_square_cells(df, "rv", "cv", quant=quant).collect()
    }

    from collections import Counter

    obs = Counter(rows)
    rts = Counter(r for r, _ in rows)
    cts = Counter(c for _, c in rows)
    nn = len(rows)
    q = quant
    want = {}
    for rv in rts:
        for cv in cts:
            o = obs.get((rv, cv), 0)
            rt, ct = rts[rv], cts[cv]
            expected = _tdiv(1000 * rt * ct, nn)
            d = nn * o - rt * ct
            dq = _tdiv(d, q)
            den = max(_tdiv(nn * rt * ct, q * q), 1)
            want[(rv, cv)] = (o, expected, _milli_scale_py(dq * dq, den))
    assert got == want


# ---------------------------------------------------------------------------
# Feature-hashing embedder and hour-of-week seasonal profile
# ---------------------------------------------------------------------------

@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    doc_toks=st.lists(
        st.lists(st.sampled_from(["e", "f", "g", "h"]), min_size=0, max_size=8),
        min_size=1,
        max_size=5,
    ),
    dim=st.sampled_from([2, 4, 16]),
)
def test_hash_embed_matches_signed_bag_reference(spark, doc_toks, dim):
    """hash_embed must equal the signed bag-of-words reference for ANY
    doc: per-occurrence ±1 votes summed per bucket, exact cancellations
    DROPPED (weight 0 never emitted), and the empty doc's [''] token
    still hashing into a bucket."""
    from tepsonic_database_sync_spark.operators.text import hash_embed

    texts = [" ".join(ts) for ts in doc_toks]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["bucket"]): r["weight"]
        for r in hash_embed(docs, dim=dim).collect()
    }

    want: dict[tuple, int] = {}
    for d, ts in enumerate(doc_toks):
        for t in ts if ts else [""]:
            b = _h60_py(f"b:{t}") % dim
            s = 1 if _h60_py(f"s:{t}") % 2 == 0 else -1
            want[(d, b)] = want.get((d, b), 0) + s
    want = {k: v for k, v in want.items() if v != 0}
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(
        st.tuples(
            st.sampled_from(["click", "view"]),
            st.integers(min_value=0, max_value=30 * 86400),  # epoch seconds
        ),
        min_size=1,
        max_size=20,
    ),
)
def test_seasonal_profile_matches_reference(spark, events):
    """seasonal_profile must equal the reference for ANY event history:
    the epoch-arithmetic hour-of-week slotting, the max(ts)-anchored
    7-day current window (boundary INCLUSIVE at max_es - 7d), per-side
    permille normalized by each side's own total, and zero-total sides
    reporting 0."""
    from pyspark.sql import functions as F

    from tepsonic_database_sync_spark.operators.events import (
        seasonal_profile,
    )

    df = spark.createDataFrame(
        events, "event_type string, es long"
    ).select("event_type", F.timestamp_seconds("es").alias("ts"))
    got = {
        (r["event_type"], r["how"]): (
            r["base_n"],
            r["cur_n"],
            r["base_permille"],
            r["cur_permille"],
            r["delta_permille"],
        )
        for r in seasonal_profile(df).collect()
    }

    max_es = max(es for _, es in events)
    cut = max_es - 7 * 86400
    counts: dict[tuple, list] = {}
    for et, es in events:
        how = ((es // 86400 + 4) % 7) * 24 + (es % 86400) // 3600
        cur = es >= cut
        c = counts.setdefault((et, how), [0, 0])
        c[1 if cur else 0] += 1
    want = {}
    for et in {e for e, _ in events}:
        bt = sum(b for (t, _), (b, _c) in counts.items() if t == et)
        ct = sum(c for (t, _), (_b, c) in counts.items() if t == et)
        for (t, how), (b, c) in counts.items():
            if t != et:
                continue
            bp = (b * 1000) // bt if bt > 0 else 0
            cp = (c * 1000) // ct if ct > 0 else 0
            want[(t, how)] = (b, c, bp, cp, cp - bp)
    assert got == want


# ---------------------------------------------------------------------------
# Gopher/C4 repetition rules vs a sequential reference
# ---------------------------------------------------------------------------

@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    doc_lines=st.lists(
        st.lists(  # a doc = lines of tokens; "\n".join of " ".join
            st.lists(st.sampled_from(["aa", "bb"]), min_size=0, max_size=4),
            min_size=0,
            max_size=4,
        ),
        min_size=1,
        max_size=4,
    ),
)
def test_repetition_stats_match_sequential_reference(spark, doc_lines):
    """repetition_stats must equal the sequential reference for ANY doc:
    bigrams/trigrams run ACROSS line boundaries (tokens split on all
    whitespace), duplicate shares count occurrences of types with c>1,
    blank and whitespace-only lines drop from the line census, too-short
    docs report 0/0 -> 0 permille, and — the tokens() contract — trim is
    SPACE-only, so leading/trailing newlines yield phantom '' edge
    tokens that the gram census deliberately keeps."""
    import re as _re
    from collections import Counter

    from tepsonic_database_sync_spark.operators.text import repetition_stats

    texts = ["\n".join(" ".join(ln) for ln in lines) for lines in doc_lines]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (
            r["top_bigram_permille"],
            r["dup_trigram_permille"],
            r["dup_line_permille"],
        )
        for r in repetition_stats(docs).collect()
    }

    def permille(a: int, b: int) -> int:
        return (a * 1000) // b if b > 0 else 0

    want = {}
    for d, text in enumerate(texts):
        # Spark/DuckDB trim is SPACE-only: strip(' '), not strip()
        toks = _re.split(r"\s+", text.strip(" ").lower())
        big = Counter(
            " ".join(toks[i : i + 2]) for i in range(len(toks) - 1)
        ) if len(toks) >= 2 else Counter()
        tri = Counter(
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        ) if len(toks) >= 3 else Counter()
        lines = Counter(
            s for s in (ln.strip().lower() for ln in text.split("\n")) if s
        )
        want[d] = (
            permille(max(big.values(), default=0), sum(big.values())),
            permille(
                sum(c for c in tri.values() if c > 1), sum(tri.values())
            ),
            permille(
                sum(c for c in lines.values() if c > 1), sum(lines.values())
            ),
        )
    assert got == want


# ---------------------------------------------------------------------------
# Prefix-filter similarity join: threshold-completeness on random corpora
# ---------------------------------------------------------------------------

@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    doc_toks=st.lists(
        st.lists(
            st.sampled_from(["w1", "w2", "w3", "w4"]), min_size=0, max_size=8
        ),
        min_size=2,
        max_size=6,
    ),
    tau=st.sampled_from([400, 600, 800]),
)
def test_jaccard_prefix_filter_complete_on_random_corpora(spark, doc_toks, tau):
    """jaccard_pairs_prefix must emit EXACTLY the pairs with J >= tau
    for ANY corpus and threshold — the completeness proof obligation of
    prefix filtering, including docs too short to shingle (never paired),
    exact duplicates (J = 1), and prefix lengths at the ceil boundary."""
    from tepsonic_database_sync_spark.operators.dedup import (
        jaccard_pairs_prefix,
    )

    texts = [" ".join(ts) for ts in doc_toks]
    docs = spark.createDataFrame(
        [(i, t, len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, n_chars long",
    )
    got = {
        (r["a_id"], r["b_id"]): (r["inter_size"], r["union_size"])
        for r in jaccard_pairs_prefix(docs, tau_permille=tau).collect()
    }

    def sh(ts):
        return {
            " ".join(ts[i : i + 3]) for i in range(len(ts) - 2)
        }

    want = {}
    for a in range(len(doc_toks)):
        for b in range(a + 1, len(doc_toks)):
            sa, sb = sh(doc_toks[a]), sh(doc_toks[b])
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            union = len(sa | sb)
            if 1000 * inter >= tau * union:
                want[(a, b)] = (inter, union)
    assert got == want


# ---------------------------------------------------------------------------
# Weighted sampling (integer A-ES) vs an exact reference
# ---------------------------------------------------------------------------

@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),  # key
            st.sampled_from(["s1", "s2"]),           # stratum
            st.integers(min_value=0, max_value=9),   # weight (0 = dropped)
        ),
        min_size=1,
        max_size=16,
        unique_by=lambda t: t[0],
    ),
    k=st.integers(min_value=1, max_value=5),
    per_stratum=st.booleans(),
)
def test_weighted_sample_matches_aes_reference(spark, rows, k, per_stratum):
    """weighted_sample must equal the exact integer Efraimidis-Spirakis
    reference for ANY weight geometry: u_micro from the content hash,
    -ln(u) through the shared integer log, arrival = (negln*1e6) div w,
    weight-0 rows dropped BEFORE ranking, (arrival, key) tie order, and
    both the global top-k and the per-stratum window forms."""
    from pyspark.sql import functions as F

    from tepsonic_database_sync_spark.operators.sampling import (
        weighted_sample,
    )

    df = spark.createDataFrame(rows, "k long, grp string, w long")
    got = sorted(
        (r["k"], r["grp"], r["w"])
        for r in weighted_sample(
            df,
            F.col("w"),
            "k",
            k=k,
            stratum="grp" if per_stratum else None,
        ).collect()
    )

    def arrival(key: int, w: int) -> int:
        u = _h60_py(f"wsample:{key}") % 1000000 + 1
        negln = 6908 - _iln_milli_py(u)
        return (negln * 1000000) // w  # non-negative -> trunc == floor

    elig = [(key, g, w) for key, g, w in rows if w >= 1]
    want = []
    if per_stratum:
        for g in {g for _, g, _ in elig}:
            members = sorted(
                ((arrival(key, w), key, g, w) for key, gg, w in elig if gg == g)
            )
            want += [(key, g, w) for _, key, g, w in members[:k]]
    else:
        members = sorted((arrival(key, w), key, g, w) for key, g, w in elig)
        want = [(key, g, w) for _, key, g, w in members[:k]]
    assert got == sorted(want)


# ---------------------------------------------------------------------------
# Markov transitions and weekly cohort retention vs sequential references
# ---------------------------------------------------------------------------

@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),    # user
            st.integers(min_value=0, max_value=50),   # seconds
            st.sampled_from(["A", "B", "C"]),
        ),
        min_size=0,
        max_size=16,
    ),
)
def test_event_transitions_match_sequential_reference(spark, events):
    """event_transitions must equal the per-user sequential fold for ANY
    history: (ts, event_id) total order resolves same-second events,
    per-prev permille normalizes within the SOURCE state."""
    from collections import Counter

    from pyspark.sql import functions as F

    from tepsonic_database_sync_spark.operators.events import (
        event_transitions,
    )

    rows = [(i, u, es, t) for i, (u, es, t) in enumerate(events)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, es long, event_type string"
    ).select(
        "event_id", "user_id", F.timestamp_seconds("es").alias("ts"), "event_type"
    )
    got = {
        (r["prev_type"], r["event_type"]): (r["n"], r["p_permille"])
        for r in event_transitions(df).collect()
    }

    by_user: dict[int, list] = {}
    for i, u, es, t in rows:
        by_user.setdefault(u, []).append((es, i, t))
    pairs = Counter()
    for u, evs in by_user.items():
        evs.sort()
        for (_ea, _ia, a), (_eb, _ib, b) in zip(evs, evs[1:]):
            pairs[(a, b)] += 1
    want = {}
    for (a, b), n in pairs.items():
        tot = sum(c for (x, _), c in pairs.items() if x == a)
        want[(a, b)] = (n, (1000 * n) // tot)
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4),              # user
            st.integers(min_value=0, max_value=40 * 86400),    # seconds
        ),
        min_size=1,
        max_size=16,
    ),
)
def test_cohort_retention_matches_reference(spark, events):
    """cohort_retention must equal the reference for ANY activity set:
    epoch-week cohorts anchored at each user's FIRST active week,
    per-(user, week) activity deduplicated before counting."""
    from pyspark.sql import functions as F

    from tepsonic_database_sync_spark.operators.events import (
        WEEK_SECS,
        cohort_retention,
    )

    df = spark.createDataFrame(
        events, "user_id long, es long"
    ).select("user_id", F.timestamp_seconds("es").alias("ts"))
    got = {
        (r["cohort_ws"], r["week_offset"]): r["n_users"]
        for r in cohort_retention(df).collect()
    }

    uw = {(u, es // WEEK_SECS * WEEK_SECS) for u, es in events}
    first = {}
    for u, ws in uw:
        first[u] = min(first.get(u, ws), ws)
    want: dict[tuple, int] = {}
    for u, ws in uw:
        key = (first[u], (ws - first[u]) // WEEK_SECS)
        want[key] = want.get(key, 0) + 1
    assert got == want


# ---------------------------------------------------------------------------
# text_stats / lang_id / quality_score vs sequential references
# ---------------------------------------------------------------------------

_TEXT_ALPHABET = "ab1 .\n的the,of el de"  # letters, digits, punct, ws, CJK, stopwords


def _toks_py(text: str) -> list[str]:
    import re as _re

    return _re.split(r"\s+", text.strip(" ").lower())


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(alphabet=_TEXT_ALPHABET, min_size=0, max_size=30),
        min_size=1,
        max_size=5,
    ),
)
def test_text_stats_match_sequential_reference(spark, texts):
    """text_stats must equal the reference for ANY text: whitespace vs
    BPE-ish token counts, digit RUNS (not digits), punctuation as
    non-alnum-non-ws, per-occurrence stopword counting, permille floors,
    and the space-only-trim tokenizer contract."""
    import re as _re

    from tepsonic_database_sync_spark.operators.text import (
        BPE_TOKEN_RE,
        PUNCT_RE,
        STOPWORDS,
        text_stats,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: tuple(r)[1:] for r in text_stats(docs).collect()}

    def permille(a: int, b: int) -> int:
        return (a * 1000) // b if b > 0 else 0

    want = {}
    for d, text in enumerate(texts):
        toks = _toks_py(text)
        n_tok = len(toks)
        chars_no_ws = len(_re.sub(r"\s", "", text))
        n_punct = len(_re.findall(PUNCT_RE, text))
        n_digit_runs = len(_re.findall(r"[0-9]+", text))
        n_bpe = len(_re.findall(BPE_TOKEN_RE, text))
        n_uniq = len(set(toks))
        sw = sum(1 for t in toks if t in STOPWORDS["en"])
        want[d] = (
            len(text),
            n_tok,
            n_bpe,
            n_uniq,
            n_punct,
            n_digit_runs,
            permille(chars_no_ws, n_tok),
            permille(n_uniq, n_tok),
            permille(sw, n_tok),
        )
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(alphabet=_TEXT_ALPHABET, min_size=0, max_size=30),
        min_size=1,
        max_size=5,
    ),
)
def test_lang_id_and_quality_match_references(spark, texts):
    """lang_id's guess rule (CJK wins, then stopword argmax with the
    en>es>de>fr tie order, 'und' on no signal) and quality_score's four
    25-point flags must equal their references for ANY text."""
    import re as _re

    from tepsonic_database_sync_spark.operators.text import (
        PUNCT_RE,
        STOPWORDS,
        lang_id,
        quality_score,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got_lang = {
        r["doc_id"]: (r["lang_guess"], r["sw_en"], r["sw_es"], r["sw_de"], r["sw_fr"])
        for r in lang_id(docs).collect()
    }
    got_q = {r["doc_id"]: r["quality"] for r in quality_score(docs).collect()}

    def permille(a: int, b: int) -> int:
        return (a * 1000) // b if b > 0 else 0

    for d, text in enumerate(texts):
        toks = _toks_py(text)
        s = {
            lang: sum(1 for t in toks if t in words)
            for lang, words in STOPWORDS.items()
        }
        if _re.search(r"[一-鿿]", text):
            guess = "zh"
        elif s["en"] >= max(s["es"], s["de"], s["fr"]) and s["en"] > 0:
            guess = "en"
        elif s["es"] >= max(s["de"], s["fr"]) and s["es"] > 0:
            guess = "es"
        elif s["de"] >= s["fr"] and s["de"] > 0:
            guess = "de"
        elif s["fr"] > 0:
            guess = "fr"
        else:
            guess = "und"
        assert got_lang[d] == (guess, s["en"], s["es"], s["de"], s["fr"])

        n_tok = len(toks)
        n_chars = len(text)
        n_punct = len(_re.findall(PUNCT_RE, text))
        n_uniq = len(set(toks))
        q = (
            (25 if 10 <= n_tok <= 1000 else 0)
            + (25 if 20 <= permille(s["en"], n_tok) <= 600 else 0)
            + (25 if n_punct * 1000 < n_chars * 300 else 0)
            + (25 if permille(n_uniq, n_tok) > 300 else 0)
        )
        assert got_q[d] == q


# ---------------------------------------------------------------------------
# As-of join and bucketized range join vs quadratic ground truth
# ---------------------------------------------------------------------------

@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lefts=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=2),   # key
            st.integers(min_value=0, max_value=40),  # seconds
        ),
        min_size=1,
        max_size=10,
    ),
    rights=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=2),
            st.integers(min_value=0, max_value=40),
        ),
        min_size=0,
        max_size=10,
    ),
)
def test_as_of_join_matches_sequential_reference(spark, lefts, rights):
    """as_of_join must equal the sequential reference for ANY event
    geometry: equal-timestamp right rows ARE visible (as-of <=), ties
    among equal-ts right rows resolve to the max id, keys with no prior
    right row yield NULL."""
    from pyspark.sql import functions as F

    from tepsonic_database_sync_spark.operators.asof import as_of_join

    lrows = [(i, k, es) for i, (k, es) in enumerate(lefts)]
    rrows = [(1000 + i, k, es) for i, (k, es) in enumerate(rights)]
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "event_id long, user_id long, es long"
    ).select("event_id", "user_id", F.timestamp_seconds("es").alias("ts"))
    got = {
        (r["user_id"], r["event_id"]): (r["epoch_s"], r["asof_rid"])
        for r in as_of_join(mk(lrows), mk(rrows)).collect()
    }

    want = {}
    for lid, k, es in lrows:
        prior = [(re, rid) for rid, rk, re in rrows if rk == k and re <= es]
        want[(k, lid)] = (es, max(prior)[1] if prior else None)
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lefts=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=2),
            st.integers(min_value=0, max_value=100),
        ),
        min_size=0,
        max_size=10,
    ),
    rights=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=2),
            st.integers(min_value=0, max_value=100),
        ),
        min_size=0,
        max_size=10,
    ),
    lookback=st.sampled_from([7, 30]),
)
def test_range_join_matches_theta_ground_truth(spark, lefts, rights, lookback):
    """range_join_pairs' 2-bucket equi-join rewrite must equal the
    quadratic theta join for ANY geometry and lookback: the window is
    [ea - L, ea) — left-closed right-OPEN — and bucket boundaries must
    lose nothing."""
    from pyspark.sql import functions as F

    from tepsonic_database_sync_spark.operators.asof import (
        range_join_pairs,
    )

    lrows = [(i, k, es) for i, (k, es) in enumerate(lefts)]
    rrows = [(1000 + i, k, es) for i, (k, es) in enumerate(rights)]
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "event_id long, user_id long, es long"
    ).select("event_id", "user_id", F.timestamp_seconds("es").alias("ts"))
    got = {
        (r["user_id"], r["a_id"], r["b_id"])
        for r in range_join_pairs(
            mk(lrows), mk(rrows), lookback_secs=lookback
        ).collect()
    }
    want = {
        (k, a, b)
        for a, k, ea in lrows
        for b, rk, eb in rrows
        if rk == k and ea - lookback <= eb < ea
    }
    assert got == want


# ---------------------------------------------------------------------------
# Token PMI and PSI drift vs exact integer references
# ---------------------------------------------------------------------------

@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    doc_toks=st.lists(
        st.lists(st.sampled_from(["x", "y", "z"]), min_size=0, max_size=8),
        min_size=1,
        max_size=5,
    ),
    min_pair=st.sampled_from([1, 2, 5]),
    k=st.sampled_from([3, 100]),
)
def test_token_pmi_matches_integer_reference(spark, doc_toks, min_pair, k):
    """token_pmi must equal the exact integer reference for ANY corpus:
    the five-term iln decomposition, the min_pair cut, and the
    (pmi desc, a, b) deterministic top-k order."""
    from collections import Counter

    from tepsonic_database_sync_spark.operators.text import token_pmi

    texts = [" ".join(ts) for ts in doc_toks]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r["a"], r["b"], r["n_ab"], r["pmi_milli"])
        for r in token_pmi(docs, min_pair=min_pair, k=k).collect()
    ]

    uni = Counter(t for ts in doc_toks for t in ts)
    pairs = Counter(
        (ts[i], ts[i + 1])
        for ts in doc_toks
        if len(ts) >= 2
        for i in range(len(ts) - 1)
    )
    n_tok = sum(uni.values())
    n_bi = sum(pairs.values())
    scored = [
        (
            a,
            b,
            n_ab,
            _iln_milli_py(n_ab * 1000)
            - _iln_milli_py(n_bi * 1000)
            - _iln_milli_py(uni[a] * 1000)
            - _iln_milli_py(uni[b] * 1000)
            + 2 * _iln_milli_py(n_tok * 1000),
        )
        for (a, b), n_ab in pairs.items()
        if n_ab >= min_pair
    ]
    want = sorted(scored, key=lambda t: (-t[3], t[0], t[1]))[:k]
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ref=st.lists(st.integers(min_value=0, max_value=20), min_size=1, max_size=25),
    cur=st.lists(st.integers(min_value=0, max_value=20), min_size=1, max_size=25),
)
def test_psi_drift_matches_integer_reference(spark, ref, cur):
    """psi_drift must equal the exact integer reference for ANY pair of
    integral samples: decile boundaries by the smallest-value rank rule,
    buckets as boundaries-strictly-below, the >= 1 permille clamp for
    empty buckets, and the milli log-ratio contribution."""
    from tepsonic_database_sync_spark.operators.drift import (
        PSI_QS,
        psi_drift,
    )

    rdf = spark.createDataFrame([(v,) for v in ref], "v long")
    cdf = spark.createDataFrame([(v,) for v in cur], "v long")
    got = {
        r["bucket"]: (
            r["n_ref"],
            r["n_cur"],
            r["ref_permille"],
            r["cur_permille"],
            r["psi_contrib_milli"],
        )
        for r in psi_drift(rdf, cdf, "v").collect()
    }

    n = len(ref)
    sref = sorted(ref)
    bounds = sorted(
        {
            next(v for v in sref if 1000 * sum(1 for x in ref if x <= v) >= q * n)
            for q in PSI_QS
        }
    )

    def bucket(v: int) -> int:
        return sum(1 for b in bounds if b < v)

    from collections import Counter

    nr = Counter(bucket(v) for v in ref)
    nc = Counter(bucket(v) for v in cur)
    tr, tc = len(ref), len(cur)
    want = {}
    for bk in set(nr) | set(nc):
        r_n, c_n = nr.get(bk, 0), nc.get(bk, 0)
        pm = max((1000 * r_n) // max(tr, 1), 1)
        qm = max((1000 * c_n) // max(tc, 1), 1)
        lp = _iln_milli_py(pm * 1000)
        lq = _iln_milli_py(qm * 1000)
        want[bk] = (r_n, c_n, pm, qm, ((pm - qm) * (lp - lq)) // 1000)
    assert got == want


# ---------------------------------------------------------------------------
# Z-order bucket stats and PII scrub vs exact references
# ---------------------------------------------------------------------------

def _morton32_py(x16: int, y16: int) -> int:
    def spread(v: int) -> int:
        v &= 0xFFFF
        for shift, mask in [
            (8, 0x00FF00FF),
            (4, 0x0F0F0F0F),
            (2, 0x33333333),
            (1, 0x55555555),
        ]:
            v = (v | (v << shift)) & mask
        return v

    return spread(x16) | (spread(y16) << 1)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=-50, max_value=50),
            st.integers(min_value=-50, max_value=50),
        ),
        min_size=1,
        max_size=20,
    ),
    bucket_bits=st.sampled_from([2, 8]),
)
def test_zorder_stats_match_morton_reference(spark, pts, bucket_bits):
    """zorder_stats must equal the exact Morton reference for ANY point
    set: min-max normalization onto the 16-bit grid (incl. degenerate
    single-value dimensions via the greatest(...,1) guard and negative
    coordinates), the spread-bits interleave, and top-bits bucketing."""
    from pyspark.sql import functions as F

    from tepsonic_database_sync_spark.operators.layout import (
        ZORDER_DIM_BITS,
        zorder_stats,
    )

    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        r["zbucket"]: (r["n"], r["x_min"], r["x_max"], r["y_min"], r["y_max"])
        for r in zorder_stats(
            df, F.col("x"), F.col("y"), bucket_bits=bucket_bits
        ).collect()
    }

    x0, x1 = min(p[0] for p in pts), max(p[0] for p in pts)
    y0, y1 = min(p[1] for p in pts), max(p[1] for p in pts)
    g = (1 << ZORDER_DIM_BITS) - 1
    shift = 2 * ZORDER_DIM_BITS - bucket_bits
    buckets: dict[int, list] = {}
    for x, y in pts:
        x16 = ((x - x0) * g) // max(x1 - x0, 1)
        y16 = ((y - y0) * g) // max(y1 - y0, 1)
        buckets.setdefault(_morton32_py(x16, y16) >> shift, []).append((x, y))
    want = {
        b: (
            len(ps),
            min(p[0] for p in ps),
            max(p[0] for p in ps),
            min(p[1] for p in ps),
            max(p[1] for p in ps),
        )
        for b, ps in buckets.items()
    }
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(
            alphabet="ab@._-:/ \nhttp://x.co user@y.org 9",
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=5,
    ),
)
def test_scrub_pii_matches_regex_reference(spark, texts):
    """scrub_pii must equal the Python regex reference for ANY text —
    the email/URL pattern subset is deliberately restricted to syntax
    that behaves identically in Java regex, RE2, and Python re, and the
    email pass runs BEFORE the URL pass."""
    import re as _re

    from tepsonic_database_sync_spark.operators.text import (
        EMAIL_RE,
        URL_RE,
        scrub_pii,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: tuple(r)[1:] for r in scrub_pii(docs).collect()}

    want = {}
    for d, t in enumerate(texts):
        n_emails = len(_re.findall(EMAIL_RE, t))
        n_urls = len(_re.findall(URL_RE, t))
        scrubbed = _re.sub(URL_RE, "<URL>", _re.sub(EMAIL_RE, "<EMAIL>", t))
        want[d] = (n_emails, n_urls, scrubbed)
    assert got == want


# ---------------------------------------------------------------------------
# Benchmark decontamination vs a set-algebra reference
# ---------------------------------------------------------------------------

@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    doc_toks=st.lists(
        st.lists(st.sampled_from(["q", "r", "s"]), min_size=0, max_size=8),
        min_size=2,
        max_size=8,
    ),
    bench_pct=st.sampled_from([5, 30, 60]),
    min_hits=st.sampled_from([1, 2]),
)
def test_contamination_flags_match_set_reference(spark, doc_toks, bench_pct, min_hits):
    """contamination_flags must equal the set-algebra reference for ANY
    corpus: the hash-bucket benchmark slice, DISTINCT per-doc shingles
    intersected with the union of benchmark grams, the min_hits
    threshold, and docs too short to shingle (0 hits, never flagged)."""
    from tepsonic_database_sync_spark.operators.dedup import (
        contamination_flags,
    )

    texts = [" ".join(ts) for ts in doc_toks]
    docs = spark.createDataFrame(
        [(i, t, len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, n_chars long",
    )
    got = {
        r["doc_id"]: (r["n_hit_grams"], r["contaminated"])
        for r in contamination_flags(
            docs, bench_pct=bench_pct, min_hits=min_hits
        ).collect()
    }

    def sh(ts):
        return {" ".join(ts[i : i + 3]) for i in range(len(ts) - 2)}

    is_bench = {
        d: _h60_py(f"bench:{d}") % 100 < bench_pct
        for d in range(len(doc_toks))
    }
    bench_grams = set().union(
        *(sh(doc_toks[d]) for d in is_bench if is_bench[d]), set()
    )
    want = {}
    for d, ts in enumerate(doc_toks):
        if is_bench[d]:
            continue
        hits = len(sh(ts) & bench_grams)
        want[d] = (hits, hits >= min_hits)
    assert got == want


# ---------------------------------------------------------------------------
# Cross-source content overlap vs a set-algebra reference
# ---------------------------------------------------------------------------

@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs_gen=st.lists(
        st.tuples(
            st.sampled_from(["sA", "sB", "sC"]),
            st.lists(st.sampled_from(["t1", "t2", "t3"]), min_size=0, max_size=7),
        ),
        min_size=1,
        max_size=8,
    ),
)
def test_source_overlap_matches_set_reference(spark, docs_gen):
    """source_overlap must equal the set-algebra reference for ANY
    corpus: per-source DISTINCT shingle sets (duplicates within and
    across a source's docs collapse), zero-overlap pairs omitted, and
    Jaccard/containment permille floors."""
    from tepsonic_database_sync_spark.operators.dedup import source_overlap

    rows = [
        (i, src, " ".join(ts)) for i, (src, ts) in enumerate(docs_gen)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    got = {
        (r["source_a"], r["source_b"]): (
            r["n_a"],
            r["n_b"],
            r["n_common"],
            r["jaccard_permille"],
            r["containment_a_permille"],
            r["containment_b_permille"],
        )
        for r in source_overlap(docs).collect()
    }

    per_src: dict[str, set] = {}
    for _i, (src, ts) in enumerate(docs_gen):
        per_src.setdefault(src, set()).update(
            " ".join(ts[i : i + 3]) for i in range(len(ts) - 2)
        )
    want = {}
    srcs = sorted(per_src)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            common = per_src[a] & per_src[b]
            if not common:
                continue
            na, nb, nc = len(per_src[a]), len(per_src[b]), len(common)
            want[(a, b)] = (
                na,
                nb,
                nc,
                (1000 * nc) // (na + nb - nc),
                (1000 * nc) // na,
                (1000 * nc) // nb,
            )
    assert got == want


# ---------------------------------------------------------------------------
# MinHash signatures + LSH banding vs an exact integer reference
# ---------------------------------------------------------------------------

@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    doc_toks=st.lists(
        st.lists(st.sampled_from(["k1", "k2", "k3"]), min_size=0, max_size=8),
        min_size=2,
        max_size=6,
    ),
)
def test_minhash_lsh_candidates_match_integer_reference(spark, doc_toks):
    """The default dedup candidate generator must equal the exact
    reference end-to-end: h31 = h60 mod 2^31-1 per DISTINCT 3-gram
    shingle, k=16 affine min-maps folded per doc, 4-wide bands keyed by
    the SORTED slice, candidates = bucket-sharing pairs. Docs too short
    to shingle have no signature and can never pair."""
    from tepsonic_database_sync_spark.functions.hashing import (
        MERSENNE31,
        affine_coeffs,
    )
    from tepsonic_database_sync_spark.operators.dedup import (
        LSH_BAND_SIZE,
        MINHASH_K,
        lsh_candidate_pairs,
        minhash_sig_array,
    )

    texts = [" ".join(ts) for ts in doc_toks]
    docs = spark.createDataFrame(
        [(i, t, len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, n_chars long",
    )
    sigs = minhash_sig_array(docs)
    got_sigs = {r["doc_id"]: list(r["sigs"]) for r in sigs.collect()}
    got_pairs = {
        (r["a_id"], r["b_id"]) for r in lsh_candidate_pairs(sigs).collect()
    }

    coeffs = affine_coeffs(MINHASH_K)
    want_sigs = {}
    for d, ts in enumerate(doc_toks):
        sh = {" ".join(ts[i : i + 3]) for i in range(len(ts) - 2)}
        if not sh:
            continue
        hs = [_h60_py(g) % MERSENNE31 for g in sh]
        want_sigs[d] = [
            min((a * h + b) % MERSENNE31 for h in hs) for a, b in coeffs
        ]
    assert got_sigs == want_sigs

    buckets: dict[tuple, set] = {}
    for d, sig in want_sigs.items():
        for b in range(MINHASH_K // LSH_BAND_SIZE):
            key = (b, tuple(sorted(sig[b * LSH_BAND_SIZE : (b + 1) * LSH_BAND_SIZE])))
            buckets.setdefault(key, set()).add(d)
    want_pairs = {
        (a, b)
        for mem in buckets.values()
        for a in mem
        for b in mem
        if a < b
    }
    assert got_pairs == want_pairs


# ---------------------------------------------------------------------------
# Integer spherical k-means vs an exact Lloyd reference
# ---------------------------------------------------------------------------

@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vecs=st.lists(
        st.lists(st.integers(min_value=1, max_value=9), min_size=4, max_size=4),
        min_size=3,
        max_size=8,
    ),
    n_cells=st.sampled_from([2, 3]),
)
def test_kmeans_train_matches_lloyd_reference(spark, vecs, n_cells):
    """kmeans_train must equal the exact integer Lloyd reference for ANY
    positive vector set: lowest-id init, cosine assignment through
    sim_e6_sep's double pipeline (identical IEEE ops), min-cent_id ties,
    the (1000·s) DIV n fixed-point mean, and cells that lose every
    member DROPPING from the codebook."""
    import math

    from pyspark.sql import functions as F

    from tepsonic_database_sync_spark.operators.similarity import (
        kmeans_train,
    )

    emb = spark.createDataFrame(
        [(i, 0, [x / 1000 for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, label long, embedding array<double>",
    )
    got = {
        (r["cent_id"], r["dim"]): (r["c_mil"], r["n_members"])
        for r in kmeans_train(emb, n_cells=n_cells, iters=3).collect()
    }

    def half_up(x: float) -> int:
        return math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5)

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    ivs = {i: v for i, v in enumerate(vecs)}  # int_vec is exact here
    cents = {
        cid: ([x * 1000 for x in ivs[cid]], 1)
        for cid in range(n_cells)
        if cid in ivs
    }
    for _ in range(3):
        assign: dict[int, list] = {}
        for vid, iv in ivs.items():
            n2 = dot(iv, iv)
            best = None
            for cid, (c_mil, _n) in cents.items():
                c_n2 = dot(c_mil, c_mil)
                sim = half_up(
                    dot(iv, c_mil) / math.sqrt(n2) / math.sqrt(c_n2) * 1e6
                )
                if best is None or (sim, -cid) > (best[0], -best[1]):
                    best = (sim, cid)
            assign.setdefault(best[1], []).append(iv)
        cents = {
            cid: (
                [
                    (1000 * sum(m[d] for m in members)) // len(members)
                    for d in range(len(members[0]))
                ],
                len(members),
            )
            for cid, members in assign.items()
        }
    want = {
        (cid, d): (c_mil[d], n)
        for cid, (c_mil, n) in cents.items()
        for d in range(len(c_mil))
    }
    assert got == want


# ---------------------------------------------------------------------------
# Item co-occurrence (lift/confidence top-k) vs an exact reference
# ---------------------------------------------------------------------------

@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),  # basket
            st.integers(min_value=1, max_value=6),  # item
        ),
        min_size=1,
        max_size=30,
    ),
    max_basket=st.sampled_from([2, 4, 20]),
    min_support=st.sampled_from([1, 2]),
    k=st.sampled_from([2, 10]),
)
def test_item_cooccur_matches_exact_reference(spark, rows, max_basket, min_support, k):
    """item_cooccur_topk must equal the exact reference for ANY basket
    set: duplicate (basket, item) rows collapse first, oversized baskets
    drop BEFORE any count (item counts and N shrink with them), both
    pair directions emitted, the _milli_scale lift split, truncating
    confidence, and the (lift desc, support desc, item asc) top-k."""
    from collections import Counter

    from tepsonic_database_sync_spark.operators.recommend import (
        item_cooccur_topk,
    )

    df = spark.createDataFrame(rows, "basket long, item long")
    got = sorted(
        (r["item_a"], r["item_b"], r["support"], r["lift_milli"], r["conf_milli"])
        for r in item_cooccur_topk(
            df, "basket", "item",
            max_basket=max_basket, min_support=min_support, k=k,
        ).collect()
    )

    bi = set(rows)
    sizes = Counter(b for b, _ in bi)
    capped = {(b, i) for b, i in bi if sizes[b] <= max_basket}
    nb = len({b for b, _ in capped})
    item_n = Counter(i for _, i in capped)
    sup = Counter()
    for b1, i1 in capped:
        for b2, i2 in capped:
            if b1 == b2 and i1 != i2:
                sup[(i1, i2)] += 1
    scored = [
        (
            a,
            b,
            s,
            _milli_scale_py(s * nb, item_n[a] * item_n[b]),
            (1000 * s) // item_n[a],
        )
        for (a, b), s in sup.items()
        if s >= min_support
    ]
    want = []
    for a in {t[0] for t in scored}:
        mine = sorted(
            (t for t in scored if t[0] == a),
            key=lambda t: (-t[3], -t[2], t[1]),
        )
        want += mine[:k]
    assert got == sorted(want)


# ---------------------------------------------------------------------------
# Integer PageRank and triangle census vs exact references
# ---------------------------------------------------------------------------

@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=6),
            st.integers(min_value=1, max_value=6),
        ),
        min_size=1,
        max_size=16,
    ),
)
def test_pagerank_matches_integer_reference(spark, edges):
    """pagerank must equal the exact integer reference for ANY directed
    edge list: duplicate edges count in BOTH out-degree and
    contributions, source-only nodes keep contributing while receiving
    the base mass, dangling nodes receive without emitting, self-loops
    feed back, and the truncating div pipeline is replayed exactly."""
    from tepsonic_database_sync_spark.operators.graph import (
        PR_BASE_MILLI,
        PR_DAMPING_PERMILLE,
        PR_ITERS,
        pagerank,
    )

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank_milli"] for r in pagerank(df).collect()}

    from collections import Counter

    deg = Counter(s for s, _ in edges)
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    rank = {n: 1000 for n in nodes}
    for _ in range(PR_ITERS):
        sums = {n: 0 for n in nodes}
        for s, d in edges:
            sums[d] += rank[s] // deg[s]
        rank = {
            n: PR_BASE_MILLI + (PR_DAMPING_PERMILLE * c) // 1000
            for n, c in sums.items()
        }
    assert got == rank


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=7),
            st.integers(min_value=1, max_value=7),
        ),
        min_size=1,
        max_size=16,
    ),
)
def test_triangle_stats_match_exact_census(spark, edges):
    """triangle_stats must equal the exact census for ANY edge list:
    self-loops and duplicates collapse in normalization, each triangle
    credits all three corners exactly once, degree counts the
    normalized neighborhood, and clustering = 2T/(d(d-1)) permille with
    the d<2 zero."""
    from itertools import combinations

    from tepsonic_database_sync_spark.operators.graph import triangle_stats

    df = spark.createDataFrame(edges, "a long, b long")
    got = {
        r["node"]: (r["degree"], r["n_triangles"], r["clustering_permille"])
        for r in triangle_stats(df).collect()
    }

    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    if not und:
        assert got == {}
        return
    nodes = {n for e in und for n in e}
    adj = {n: set() for n in nodes}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    tri = {n: 0 for n in nodes}
    for x, y, z in combinations(sorted(nodes), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            tri[x] += 1
            tri[y] += 1
            tri[z] += 1
    want = {}
    for n in nodes:
        d = len(adj[n])
        cc = (2000 * tri[n]) // (d * (d - 1)) if d >= 2 else 0
        want[n] = (d, tri[n], cc)
    assert got == want


# ---------------------------------------------------------------------------
# Bounded BFS and star-contraction components vs exact references
# ---------------------------------------------------------------------------

@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=7),
            st.integers(min_value=1, max_value=7),
        ),
        min_size=1,
        max_size=16,
    ),
    seeds=st.lists(st.integers(min_value=1, max_value=7), min_size=1, max_size=3),
    max_hops=st.sampled_from([1, 2, 4]),
)
def test_bfs_hops_matches_min_distance_reference(spark, edges, seeds, max_hops):
    """bfs_hops must equal min directed distance <= max_hops for ANY
    graph and seed set: seeds at 0, cycles and diamond multipaths
    resolve to the minimum, unreachable-within-bound nodes absent."""
    from tepsonic_database_sync_spark.operators.graph import bfs_hops

    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(x,) for x in seeds], "node long")
    got = {
        r["node"]: r["hops"] for r in bfs_hops(e, s, max_hops=max_hops).collect()
    }

    dist = {x: 0 for x in seeds}
    frontier = set(seeds)
    for h in range(1, max_hops + 1):
        nxt = {d for sN, d in edges if sN in frontier}
        frontier = {n for n in nxt if n not in dist}
        for n in frontier:
            dist[n] = h
        # nodes already seen at a lower hop keep their minimum
    assert got == dist


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=10),
            st.integers(min_value=1, max_value=10),
        ),
        min_size=0,
        max_size=14,
    ),
    n_nodes=st.integers(min_value=10, max_value=12),
)
def test_connected_components_star_matches_union_find(spark, pairs, n_nodes):
    """connected_components_star must equal union-find for ANY pair set
    — chains, cycles, self-loops (ignored), duplicate and reversed
    edges — with comp = the component's minimum node and singletons
    mapping to themselves."""
    from pyspark.sql import functions as F

    from tepsonic_database_sync_spark.operators.dedup import (
        connected_components_star,
    )

    e = spark.createDataFrame(
        pairs or [(1, 1)], "a_id long, b_id long"
    )
    nodes = spark.range(1, n_nodes + 1).select(F.col("id").alias("node"))
    got = {
        r["node"]: r["comp"]
        for r in connected_components_star(e, nodes).collect()
    }

    parent = {n: n for n in range(1, n_nodes + 1)}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs or []:
        if a == b:
            continue
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in range(1, n_nodes + 1)}
    assert got == want


# ---------------------------------------------------------------------------
# ANN ladder: brute-force and hyperplane-LSH top-k vs exact references
# ---------------------------------------------------------------------------

def _half_up(x: float) -> int:
    import math

    return math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5)


def _sim_e6_py(dot: int, na2: int, nb2: int) -> int:
    import math

    return _half_up(dot / math.sqrt(na2 * nb2) * 1e6)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vecs=st.lists(
        st.lists(st.integers(min_value=1, max_value=9), min_size=4, max_size=4),
        min_size=2,
        max_size=8,
    ),
)
def test_ann_topk_brute_and_lsh_match_references(spark, vecs):
    """brute_force_topk and lsh_topk must equal their exact references
    for ANY vector set: the sim_e6 double pipeline (one sqrt of the
    norm product), (sim desc, neighbor asc) ranking, self-exclusion,
    and — for LSH — candidates restricted to the query's EXACT
    hyperplane sign-bucket."""
    from tepsonic_database_sync_spark.operators.similarity import (
        brute_force_topk,
        hyperplanes,
        lsh_topk,
    )

    emb = spark.createDataFrame(
        [(i, 0, [x / 1000 for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, label long, embedding array<double>",
    )
    n_q, k = 3, 3
    got_bf = {
        (r["q_id"], r["rank"]): (r["neighbor_id"], r["sim_e6"])
        for r in brute_force_topk(emb, n_queries=n_q, k=k).collect()
    }
    got_lsh = {
        (r["q_id"], r["rank"]): (r["neighbor_id"], r["sim_e6"])
        for r in lsh_topk(emb, n_queries=n_q, k=k, dim=4).collect()
    }

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    planes = hyperplanes(dim=4)
    bucket = {
        i: sum(1 << p for p, pl in enumerate(planes) if dot(v, pl) > 0)
        for i, v in enumerate(vecs)
    }

    def topk(q, candidates):
        qv = vecs[q]
        scored = sorted(
            (
                (-_sim_e6_py(dot(vecs[n], qv), dot(vecs[n], vecs[n]), dot(qv, qv)), n)
                for n in candidates
            ),
        )[:k]
        return {
            (q, r + 1): (n, -s) for r, (s, n) in enumerate(scored)
        }

    want_bf, want_lsh = {}, {}
    for q in range(min(n_q, len(vecs))):
        want_bf.update(topk(q, [n for n in range(len(vecs)) if n != q]))
        want_lsh.update(
            topk(
                q,
                [
                    n
                    for n in range(len(vecs))
                    if n != q and bucket[n] == bucket[q]
                ],
            )
        )
    assert got_bf == want_bf
    assert got_lsh == want_lsh


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vecs=st.lists(
        st.lists(st.integers(min_value=1, max_value=9), min_size=4, max_size=4),
        min_size=3,
        max_size=9,
    ),
    n_cells=st.sampled_from([2, 3]),
    n_probe=st.sampled_from([1, 2]),
)
def test_ivf_topk_matches_cell_probe_reference(spark, vecs, n_cells, n_probe):
    """ivf_topk must equal the exact cell-probe reference for ANY vector
    set: lowest-id seed centroids, nearest-cell assignment with
    min-cell-id ties, queries probing their n_probe nearest cells, and
    scoring ONLY vectors inverted under a probed cell (self excluded) —
    including queries whose own cell is not among their probes by tie
    order."""
    from tepsonic_database_sync_spark.operators.similarity import ivf_topk

    emb = spark.createDataFrame(
        [(i, 0, [x / 1000 for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, label long, embedding array<double>",
    )
    n_q, k = 3, 3
    got = {
        (r["q_id"], r["rank"]): (r["neighbor_id"], r["sim_e6"])
        for r in ivf_topk(
            emb, n_queries=n_q, k=k, n_cells=n_cells, n_probe=n_probe
        ).collect()
    }

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    cents = list(range(min(n_cells, len(vecs))))

    def nearest(vid, n):
        qv = vecs[vid]
        scored = sorted(
            (
                (-_sim_e6_py(dot(qv, vecs[c]), dot(qv, qv), dot(vecs[c], vecs[c])), c)
                for c in cents
            )
        )
        return [c for _s, c in scored[:n]]

    cell = {i: nearest(i, 1)[0] for i in range(len(vecs))}
    want = {}
    for q in range(min(n_q, len(vecs))):
        probed = set(nearest(q, n_probe))
        cand = [
            n for n in range(len(vecs)) if n != q and cell[n] in probed
        ]
        qv = vecs[q]
        scored = sorted(
            (
                (-_sim_e6_py(dot(vecs[n], qv), dot(vecs[n], vecs[n]), dot(qv, qv)), n)
                for n in cand
            )
        )[:k]
        want.update(
            {(q, r + 1): (n, -s) for r, (s, n) in enumerate(scored)}
        )
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vecs=st.lists(
        st.lists(st.integers(min_value=1, max_value=9), min_size=8, max_size=8),
        min_size=3,
        max_size=8,
    ),
    k_codes=st.sampled_from([2, 3]),
    shortlist=st.sampled_from([2, 50]),
)
def test_pq_topk_matches_adc_reference(spark, vecs, k_codes, shortlist):
    """pq_topk must equal the exact PQ reference for ANY vector set:
    subspace slicing, the single integer Lloyd round (argmin-L2 with
    (d2, cent_id) ties, fixed-point DIV means, dropped empty cells),
    re-encoding against the TRAINED codebook, per-query ADC tables
    summed by code lookup, the (adc, vec_id) shortlist cut, and the
    exact squared-L2 re-rank."""
    from tepsonic_database_sync_spark.operators.similarity import pq_topk

    dim, m_sub = 8, 2
    dsub = dim // m_sub
    emb = spark.createDataFrame(
        [(i, 0, [x / 1000 for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, label long, embedding array<double>",
    )
    n_q, k = 2, 3
    got = {
        (r["q_id"], r["rank"]): (r["neighbor_id"], r["l2_d2"])
        for r in pq_topk(
            emb, n_queries=n_q, k=k,
            m_sub=m_sub, k_codes=k_codes, dim=dim, shortlist=shortlist,
        ).collect()
    }

    def l2m(siv, c):  # milli-scaled subvector vs milli codeword
        return sum((x * 1000 - cc) ** 2 for x, cc in zip(siv, c))

    subs = {
        (i, m): vecs[i][m * dsub : (m + 1) * dsub]
        for i in range(len(vecs))
        for m in range(m_sub)
    }
    # init: lowest-id seeds, milli units
    cents = {
        (m, cid): [x * 1000 for x in subs[(cid, m)]]
        for m in range(m_sub)
        for cid in range(min(k_codes, len(vecs)))
    }
    # one Lloyd round
    members: dict[tuple, list] = {}
    for (i, m), siv in subs.items():
        best = min(
            (l2m(siv, c), cid) for (mm, cid), c in cents.items() if mm == m
        )
        members.setdefault((m, best[1]), []).append(siv)
    cents = {
        (m, cid): [
            (1000 * sum(s[d] for s in mem)) // len(mem) for d in range(dsub)
        ]
        for (m, cid), mem in members.items()
    }
    # encode against the trained codebook
    code = {}
    for (i, m), siv in subs.items():
        code[(i, m)] = min(
            (l2m(siv, c), cid) for (mm, cid), c in cents.items() if mm == m
        )[1]

    want = {}
    for q in range(min(n_q, len(vecs))):
        qd2 = {
            (m, cid): l2m(subs[(q, m)], c) for (m, cid), c in cents.items()
        }
        adc = {
            n: sum(qd2[(m, code[(n, m)])] for m in range(m_sub))
            for n in range(len(vecs))
            if n != q
        }
        short = sorted(adc, key=lambda n: (adc[n], n))[:shortlist]
        exact = sorted(
            (
                (sum((a - b) ** 2 for a, b in zip(vecs[n], vecs[q])), n)
                for n in short
            )
        )[:k]
        want.update(
            {(q, r + 1): (n, d) for r, (d, n) in enumerate(exact)}
        )
    assert got == want


# ---------------------------------------------------------------------------
# Winnowing partial-overlap pairs vs a set-algebra reference
# ---------------------------------------------------------------------------

@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    frag_picks=st.lists(
        st.lists(st.integers(min_value=0, max_value=3), min_size=0, max_size=3),
        min_size=2,
        max_size=6,
    ),
    min_shared=st.sampled_from([1, 2]),
    min_contain=st.sampled_from([0, 200, 500]),
    max_fanout=st.sampled_from([2, 64]),
)
def test_winnow_overlap_pairs_match_set_reference(
    spark, frag_picks, min_shared, min_contain, max_fanout
):
    """winnow_overlap_pairs must equal the set-algebra reference for ANY
    corpus built from shared passages: the stop-fingerprint cap removes
    boilerplate fps from BOTH the shared counts and the per-doc totals,
    min_shared cuts before the totals rejoin, and max(contain_a,
    contain_b) gates the output."""
    from collections import Counter

    from tepsonic_database_sync_spark.operators.text import (
        WINNOW_K,
        WINNOW_W,
        winnow_overlap_pairs,
    )

    pool = ["abcabcabcabcabc", "xyzxyzxyzxyzxyz", "mnopmnopmnopmnop", "qrsqrsqrsqrsqrs"]
    texts = [" ".join(pool[j] for j in picks) for picks in frag_picks]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["a_id"], r["b_id"]): (
            r["n_shared"], r["n_a"], r["n_b"],
            r["contain_a_permille"], r["contain_b_permille"],
        )
        for r in winnow_overlap_pairs(
            docs,
            min_shared=min_shared,
            min_contain_permille=min_contain,
            max_fanout=max_fanout,
        ).collect()
    }

    fps = {}
    for d, t in enumerate(texts):
        _n, joined = _winnow_py(t, WINNOW_K, WINNOW_W)
        fps[d] = {int(x) for x in joined.split("|")} if joined else set()
    fanout = Counter(fp for s in fps.values() for fp in s)
    kept = {d: {fp for fp in s if fanout[fp] <= max_fanout} for d, s in fps.items()}
    want = {}
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            shared = len(kept[a] & kept[b])
            if shared < min_shared:
                continue
            na, nb = len(kept[a]), len(kept[b])
            ca = (1000 * shared) // na
            cb = (1000 * shared) // nb
            if max(ca, cb) >= min_contain:
                want[(a, b)] = (shared, na, nb, ca, cb)
    assert got == want


# ---------------------------------------------------------------------------
# Sliding-window chunking and quality-aware exact dedup vs references
# ---------------------------------------------------------------------------

@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    doc_toks=st.lists(
        st.lists(st.sampled_from(["w", "v"]), min_size=0, max_size=20),
        min_size=1,
        max_size=4,
    ),
    chunk_tokens=st.sampled_from([4, 8]),
    overlap=st.sampled_from([0, 2]),
)
def test_chunk_documents_match_window_reference(spark, doc_toks, chunk_tokens, overlap):
    """chunk_documents must equal the sliding-window reference for ANY
    doc: windows every (chunk - overlap) tokens, the short final
    remainder, the ceil chunk count at exact boundaries, and zero chunks
    for whitespace-only texts."""
    import math

    from tepsonic_database_sync_spark.operators.text import chunk_documents

    texts = [" ".join(ts) for ts in doc_toks]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(
            docs, chunk_tokens=chunk_tokens, overlap=overlap
        ).collect()
    }

    step = chunk_tokens - overlap
    want = {}
    for d, ts in enumerate(doc_toks):
        if not ts:
            continue
        n = len(ts)
        n_chunks = (
            1 if n <= chunk_tokens else math.ceil((n - chunk_tokens) / step) + 1
        )
        for i in range(n_chunks):
            ct = ts[i * step : i * step + chunk_tokens]
            want[(d, i)] = (len(ct), " ".join(ct))
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(alphabet="ab the of. ", min_size=0, max_size=25),
        min_size=1,
        max_size=8,
    ),
)
def test_keep_best_dedup_matches_reference(spark, texts):
    """keep_best_dedup must equal the reference for ANY corpus: clusters
    keyed by md5 of the normalized text (lower + collapse whitespace +
    space-trim), the keeper = max quality with min-doc_id ties, and
    n_copies = full cluster size."""
    import hashlib
    import re as _re

    from tepsonic_database_sync_spark.operators.dedup import keep_best_dedup
    from tepsonic_database_sync_spark.operators.text import (
        PUNCT_RE,
        STOPWORDS,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["fp"]: (r["keeper_doc_id"], r["quality"], r["n_copies"])
        for r in keep_best_dedup(docs).collect()
    }

    def quality(text: str) -> int:
        toks = _toks_py(text)
        n_tok, n_chars = len(toks), len(text)
        sw = sum(1 for t in toks if t in STOPWORDS["en"])
        n_punct = len(_re.findall(PUNCT_RE, text))
        n_uniq = len(set(toks))
        pm = lambda a, b: (a * 1000) // b if b > 0 else 0  # noqa: E731
        return (
            (25 if 10 <= n_tok <= 1000 else 0)
            + (25 if 20 <= pm(sw, n_tok) <= 600 else 0)
            + (25 if n_punct * 1000 < n_chars * 300 else 0)
            + (25 if pm(n_uniq, n_tok) > 300 else 0)
        )

    clusters: dict[str, list] = {}
    for d, t in enumerate(texts):
        norm = _re.sub(r"\s+", " ", t.lower()).strip(" ")
        clusters.setdefault(
            hashlib.md5(norm.encode()).hexdigest(), []
        ).append((d, quality(t)))
    want = {}
    for fp, members in clusters.items():
        keeper = min(members, key=lambda m: (-m[1], m[0]))
        want[fp] = (keeper[0], keeper[1], len(members))
    assert got == want


# ---------------------------------------------------------------------------
# Hash-bucket membership samplers vs the h60 reference
# ---------------------------------------------------------------------------

@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    keys=st.lists(
        st.integers(min_value=0, max_value=10_000), min_size=1, max_size=20,
        unique=True,
    ),
    groups=st.data(),
    train_pct=st.sampled_from([0, 50, 80, 100]),
    val_pct=st.sampled_from([0, 10]),
)
def test_split_and_mixture_membership_match_h60_reference(
    spark, keys, groups, train_pct, val_pct
):
    """dataset_split and mixture_sample membership must be the pure hash
    function the reproducibility contract promises: split by
    h60('split:'||key)%100 against the pct fences (incl. 0 and 100
    degenerate fences), mixture keep-set by h60('mix:'||key)%100 < pct
    with the default-0 drop for unmapped groups."""
    from tepsonic_database_sync_spark.operators.sampling import (
        dataset_split,
        mixture_sample,
    )

    grp = [groups.draw(st.sampled_from(["g1", "g2", "g3"])) for _ in keys]
    df = spark.createDataFrame(
        list(zip(keys, grp)), "doc_id long, lang string"
    )
    got_split = {
        r["doc_id"]: r["split"]
        for r in dataset_split(
            df, "doc_id", train_pct=train_pct, val_pct=val_pct
        ).collect()
    }
    pcts = {"g1": 100, "g2": 37}  # g3 unmapped -> default 0
    got_mix = {
        r["doc_id"]
        for r in mixture_sample(df, "lang", "doc_id", pcts).collect()
    }

    want_split = {}
    want_mix = set()
    for k, g in zip(keys, grp):
        b_split = _h60_py(f"split:{k}") % 100
        want_split[k] = (
            "train"
            if b_split < train_pct
            else ("val" if b_split < train_pct + val_pct else "test")
        )
        if _h60_py(f"mix:{k}") % 100 < pcts.get(g, 0):
            want_mix.add(k)
    assert got_split == want_split
    assert got_mix == want_mix


# ---------------------------------------------------------------------------
# DSIR importance selection vs an exact integer reference
# ---------------------------------------------------------------------------


def _dsir_ref(docs, n_buckets: int, k: int, target_lang: str = "en"):
    """Pure-Python integer twin of text.dsir_select: same md5-h60
    buckets, same Laplace counts, same iln_milli arithmetic, same
    (weight desc, doc_id asc) top-k."""
    import hashlib
    from collections import Counter, defaultdict

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    grams = []
    for did, lang, toks in docs:
        toks = [t for t in toks if t != ""]
        gs = list(toks) + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        for g in gs:
            grams.append((did, lang == target_lang, h60(g) % n_buckets))
    t_cnt: Counter = Counter()
    r_cnt: Counter = Counter()
    for _, is_t, b in grams:
        (t_cnt if is_t else r_cnt)[b] += 1
    lam = {
        b: _iln_milli_py((t_cnt[b] + 1) * 1000)
        - _iln_milli_py((r_cnt[b] + 1) * 1000)
        for b in set(t_cnt) | set(r_cnt)
    }
    c = _iln_milli_py((sum(r_cnt.values()) + n_buckets) * 1000) - _iln_milli_py(
        (sum(t_cnt.values()) + n_buckets) * 1000
    )
    per: dict = defaultdict(lambda: [0, 0])
    for did, is_t, b in grams:
        if not is_t:
            per[did][0] += 1
            per[did][1] += lam[b]
    rows = [(did, n, s + n * c) for did, (n, s) in per.items()]
    rows.sort(key=lambda r: (-r[2], r[0]))
    return rows[:k]


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    doc_toks=st.lists(
        st.tuples(
            st.sampled_from(["en", "fr"]),
            st.lists(
                st.sampled_from(["x", "y", "zz", "q"]), min_size=0, max_size=6
            ),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_dsir_select_matches_integer_reference(spark, doc_toks):
    """dsir_select == the pure-Python integer reference on random tiny
    corpora — n_buckets=8 forces dense hash-bucket collisions, k=5
    exercises the LIMIT inside weight-tie runs (duplicate docs tie on
    weight; doc_id breaks them)."""
    from tepsonic_database_sync_spark.operators.text import dsir_select

    docs = [
        (i + 1, lang, toks) for i, (lang, toks) in enumerate(doc_toks)
    ]
    df = spark.createDataFrame(
        [(did, " ".join(toks), lang, "s", 0) for did, lang, toks in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = [
        (r["doc_id"], r["n_grams"], r["weight_milli"])
        for r in dsir_select(df, n_buckets=8, k=5).collect()
    ]
    got.sort(key=lambda r: (-r[2], r[0]))
    assert got == _dsir_ref(docs, n_buckets=8, k=5)


# ---------------------------------------------------------------------------
# substring duplication rate vs an exact set-algebra reference
# ---------------------------------------------------------------------------


def _dup_rate_ref(docs, n):
    """Pure-Python twin of dedup.substring_dup_rate: corpus n-gram
    counts, per-doc union of duplicated grams' [i, i+n) spans."""
    from collections import Counter

    grams = Counter()
    per_doc = {}
    for did, toks in docs:
        toks = [t for t in toks if t != ""]
        gs = [
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        ]
        per_doc[did] = (toks, gs)
        grams.update(gs)
    out = []
    for did, (toks, gs) in per_doc.items():
        cov = set()
        for i, g in enumerate(gs):
            if grams[g] > 1:
                cov.update(range(i, i + n))
        nt = len(toks)
        rate = (1000 * len(cov)) // nt if nt > 0 else 0
        out.append((did, nt, len(cov), rate))
    return sorted(out)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    doc_toks=st.lists(
        st.lists(st.sampled_from(["x", "y", "z"]), min_size=0, max_size=9),
        min_size=1,
        max_size=6,
    ),
    n=st.integers(min_value=2, max_value=4),
)
def test_substring_dup_rate_matches_reference(spark, doc_toks, n):
    """substring_dup_rate == the exact set-algebra reference on random
    tiny corpora — the 3-symbol alphabet makes cross-doc duplicated
    grams and overlapping covered spans dense; n spans the
    shorter-than-n, equal-to-n and longer cases."""
    from tepsonic_database_sync_spark.operators.dedup import (
        substring_dup_rate,
    )

    docs = [(i + 1, toks) for i, toks in enumerate(doc_toks)]
    df = spark.createDataFrame(
        [(did, " ".join(toks)) for did, toks in docs],
        "doc_id long, text string",
    )
    got = sorted(
        (r["doc_id"], r["n_tokens"], r["dup_covered"], r["dup_rate_permille"])
        for r in substring_dup_rate(df, n=n).collect()
    )
    assert got == _dup_rate_ref(docs, n)


# ---------------------------------------------------------------------------
# substring dedup (ExactSubstr removal) vs an exact reference
# ---------------------------------------------------------------------------


def _substring_dedup_ref(docs, n):
    """Pure-Python twin of dedup.substring_dedup: corpus n-gram counts,
    canonical occurrence = (doc_id, i)-lexicographic min, per-doc union
    of the NON-canonical occurrences' [i, i+n) spans removed."""
    from collections import defaultdict

    occs = defaultdict(list)
    per_doc = {}
    for did, toks in docs:
        toks = [t for t in toks if t != ""]
        per_doc[did] = toks
        for i in range(len(toks) - n + 1):
            occs[" ".join(toks[i : i + n])].append((did, i))
    removed = defaultdict(set)
    for g, os_ in occs.items():
        if len(os_) > 1:
            canon = min(os_)
            for did, i in os_:
                if (did, i) != canon:
                    removed[did].update(range(i, i + n))
    out = []
    for did, toks in per_doc.items():
        rm = removed[did]
        kept = [t for i, t in enumerate(toks) if i not in rm]
        out.append((did, len(toks), len(rm), len(kept), " ".join(kept)))
    return sorted(out)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    doc_toks=st.lists(
        st.lists(st.sampled_from(["x", "y", "z"]), min_size=0, max_size=9),
        min_size=1,
        max_size=6,
    ),
    n=st.integers(min_value=2, max_value=4),
)
def test_substring_dedup_matches_reference(spark, doc_toks, n):
    """substring_dedup == the exact removal reference on random tiny
    corpora — the 3-symbol alphabet makes duplicated grams dense, so
    within-doc repeats, cross-doc repeats and overlapping removal spans
    all occur; the reconstruction (kept_text) is compared verbatim."""
    from tepsonic_database_sync_spark.operators.dedup import substring_dedup

    docs = [(i + 1, toks) for i, toks in enumerate(doc_toks)]
    df = spark.createDataFrame(
        [(did, " ".join(toks)) for did, toks in docs],
        "doc_id long, text string",
    )
    got = sorted(
        (
            r["doc_id"],
            r["n_tokens"],
            r["removed_tokens"],
            r["kept_tokens"],
            r["kept_text"],
        )
        for r in substring_dedup(df, n=n).collect()
    )
    assert got == _substring_dedup_ref(docs, n)


# ---------------------------------------------------------------------------
# substring dedup SPANS (the published maximal-span removal rule)
# ---------------------------------------------------------------------------


def _substring_dedup_spans_ref(docs, n, min_span):
    """Pure-Python twin of dedup.substring_dedup_spans: the
    substring_dedup removal set, coalesced into maximal contiguous
    runs, runs < min_span kept."""
    from collections import defaultdict

    occs = defaultdict(list)
    per_doc = {}
    for did, toks in docs:
        toks = [t for t in toks if t != ""]
        per_doc[did] = toks
        for i in range(len(toks) - n + 1):
            occs[" ".join(toks[i : i + n])].append((did, i))
    dup = defaultdict(set)
    for g, os_ in occs.items():
        if len(os_) > 1:
            canon = min(os_)
            for did, i in os_:
                if (did, i) != canon:
                    dup[did].update(range(i, i + n))
    out = []
    for did, toks in per_doc.items():
        pos = sorted(dup[did])
        spans = []
        for p in pos:
            if spans and p == spans[-1][1] + 1:
                spans[-1][1] = p
            else:
                spans.append([p, p])
        qual = [(lo, hi) for lo, hi in spans if hi - lo + 1 >= min_span]
        rm = {p for lo, hi in qual for p in range(lo, hi + 1)}
        kept = [t for i, t in enumerate(toks) if i not in rm]
        out.append(
            (
                did,
                len(toks),
                len(rm),
                len(kept),
                " ".join(kept),
                len(qual),
                max((hi - lo + 1 for lo, hi in qual), default=0),
            )
        )
    return sorted(out)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    doc_toks=st.lists(
        st.lists(st.sampled_from(["x", "y", "z"]), min_size=0, max_size=9),
        min_size=1,
        max_size=6,
    ),
    n=st.integers(min_value=2, max_value=4),
    min_span=st.integers(min_value=2, max_value=6),
)
def test_substring_dedup_spans_matches_reference(
    spark, doc_toks, n, min_span
):
    """substring_dedup_spans == the maximal-span reference on random
    tiny corpora — the 3-symbol alphabet makes duplicated runs dense,
    so sub-threshold islands (kept), qualifying islands (removed) and
    multi-island docs all occur; kept_text compared verbatim. NOTE the
    1-based/0-based difference between engine positions and the
    reference's enumerate() is invisible here by design — only span
    LENGTHS and surviving tokens are compared."""
    from tepsonic_database_sync_spark.operators.dedup import (
        substring_dedup_spans,
    )

    docs = [(i + 1, toks) for i, toks in enumerate(doc_toks)]
    df = spark.createDataFrame(
        [(did, " ".join(toks)) for did, toks in docs],
        "doc_id long, text string",
    )
    got = sorted(
        (
            r["doc_id"],
            r["n_tokens"],
            r["removed_tokens"],
            r["kept_tokens"],
            r["kept_text"],
            r["n_spans"],
            r["max_span_tokens"],
        )
        for r in substring_dedup_spans(df, n=n, min_span=min_span).collect()
    )
    assert got == _substring_dedup_spans_ref(docs, n, min_span)


def test_substring_dedup_spans_threshold_branches(spark):
    """Crafted corpus pinning the published rule directly: a duplicated
    run of exactly min_span tokens is removed whole, a duplicated run
    one token shorter survives in full, and the doc that owns the
    canonical (first) occurrence keeps its copy."""
    from tepsonic_database_sync_spark.operators.dedup import (
        substring_dedup_spans,
    )

    long_dup = " ".join(f"w{i}" for i in range(6))  # 6-token run
    short_dup = " ".join(f"s{i}" for i in range(5))  # 5-token run
    rows = [
        (1, f"{long_dup} alpha {short_dup}"),  # canonical owner: kept whole
        (2, f"beta {long_dup} gamma"),  # 6-token island ≥ 6 → removed
        (3, f"delta {short_dup} epsilon"),  # 5-token island < 6 → kept
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in substring_dedup_spans(df, n=3, min_span=6).collect()
    }
    assert got[1]["removed_tokens"] == 0 and got[1]["n_spans"] == 0
    assert got[2]["removed_tokens"] == 6
    assert got[2]["n_spans"] == 1 and got[2]["max_span_tokens"] == 6
    assert got[2]["kept_text"] == "beta gamma"
    assert got[3]["removed_tokens"] == 0 and got[3]["n_spans"] == 0
    assert got[3]["kept_text"] == f"delta {short_dup} epsilon"


# ---------------------------------------------------------------------------
# fuzzy_keep_best (quality-aware keeper per LSH cluster)
# ---------------------------------------------------------------------------


def test_fuzzy_keep_best_quality_beats_min_id(spark):
    """Crafted corpus pinning the survivor policy on all three branches
    (the hashing is fixed constants, so the LSH collisions below are
    deterministic for these exact strings): a damaged LOW-id near-dup
    loses to its clean HIGH-id twin on quality; an exact-copy pair ties
    and breaks to min id; a singleton keeps itself."""
    from pyspark.sql import functions as F

    from tepsonic_database_sync_spark.operators.dedup import (
        fuzzy_keep_best,
        lsh_candidate_pairs,
        minhash_sig_array,
    )

    base = (
        "the quick brown fox jumps over a lazy dog while many people "
        "watch from the old stone bridge near town"
    )
    rows = [
        (1, base + " the" * 40),  # damaged: uniq_permille flag drops
        (2, base),  # clean twin, HIGHER id — must win on quality
        (10, "completely unrelated text about quantum tensor algebra "
             "methods and their numerical stability properties in practice"),
        (11, "completely unrelated text about quantum tensor algebra "
             "methods and their numerical stability properties in practice"),
        (20, "a lone short singleton document mentioning turtles and "
             "rivers gently flowing beneath autumn leaves forever onwards"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # precondition: the crafted near-dup pair actually LSH-collides
    # (deterministic — fixed md5 + affine coefficients)
    pairs = sorted(
        (r["a_id"], r["b_id"])
        for r in lsh_candidate_pairs(
            minhash_sig_array(
                df.withColumn("n_chars", F.length("text").cast("long"))
            )
        ).collect()
    )
    assert (1, 2) in pairs and (10, 11) in pairs
    got = sorted(
        (r["cluster_id"], r["keeper_doc_id"], r["quality"], r["n_members"])
        for r in fuzzy_keep_best(df).collect()
    )
    assert got == [(1, 2, 100, 2), (10, 10, 100, 2), (20, 20, 100, 1)]


# ---------------------------------------------------------------------------
# decontaminate_fuzzy (MinHash-LSH fuzzy eval decontamination)
# ---------------------------------------------------------------------------


def test_decontaminate_fuzzy_three_branches(spark):
    """Crafted train/bench pair pinning all three outcomes (fixed
    hashing → the LSH collisions below are deterministic for these
    exact strings): a one-token-perturbed leak verifies above tau; a
    three-token-perturbed near-match surfaces as a candidate BELOW tau
    (flagging it would be a false positive — the verify step is the
    point); a disjoint doc has no candidate at all (-1, 0, false)."""
    from tepsonic_database_sync_spark.operators.dedup import (
        decontaminate_fuzzy,
    )

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega"
    )
    second = (
        "red orange yellow green blue indigo violet crimson scarlet amber "
        "teal navy maroon olive coral salmon ivory beige"
    )
    train = spark.createDataFrame(
        [
            (1, base),
            (2, second),
            (3, "totally disjoint content about volcanic minerals and "
                "deep sea currents"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(101, base + " zzeval"), (102, second + " zz1 zz2 zz3")],
        "doc_id long, text string",
    )
    got = sorted(
        (
            r["doc_id"],
            r["best_bench_id"],
            r["best_jaccard_permille"],
            r["contaminated"],
        )
        for r in decontaminate_fuzzy(train, bench, tau_permille=900).collect()
    )
    assert got == [
        (1, 101, 956, True),
        (2, 102, 842, False),
        (3, -1, 0, False),
    ]


# ---------------------------------------------------------------------------
# boilerplate_report (per-source template-line census)
# ---------------------------------------------------------------------------


def test_boilerplate_report_census_laws(spark):
    """Crafted corpus pinning the census rules: distinct DOCS (not
    occurrences — within-doc repeats must not qualify a line), the
    min_docs cut, the (in_docs DESC, line) tie-break, and the all-zero
    row for a source with no qualifying line."""
    from tepsonic_database_sync_spark.operators.dedup import (
        boilerplate_report,
    )

    footer = "subscribe to our newsletter"
    rows = [
        # source a: footer in 3 docs; "menu home" in 3 docs (tie on
        # count → lexicographically smaller "menu home" wins top_line);
        # one doc repeats the footer 3× WITHIN itself (still 1 doc)
        (1, f"alpha one\n{footer}\nmenu home", "a"),
        (2, f"beta two\n{footer}\n{footer}\n{footer}\nmenu home", "a"),
        (3, f"gamma three\n{footer}\nmenu home", "a"),
        (4, "delta four only unique content", "a"),
        # source b: footer in only 2 distinct docs (< 3 → no boiler),
        # plus a doc that repeats a line 5× within itself only
        (5, f"epsilon five\n{footer}", "b"),
        (6, f"zeta six\n{footer}", "b"),
        (7, "eta\neta\neta\neta\neta", "b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["source"]: r for r in boilerplate_report(df, min_docs=3).collect()}
    a, b = got["a"], got["b"]
    assert a["n_docs"] == 4 and a["n_boiler_lines"] == 2
    assert a["top_line"] == "menu home"  # tie at 3 docs → smaller line
    assert a["top_line_docs"] == 3 and a["coverage_permille"] == 750
    assert a["boiler_doc_permille"] == 750  # docs 1-3 touched, 4 not
    assert b["n_docs"] == 3 and b["n_boiler_lines"] == 0
    assert b["top_line"] == "" and b["top_line_docs"] == 0
    assert b["coverage_permille"] == 0 and b["boiler_doc_permille"] == 0


# ---------------------------------------------------------------------------
# dedup_cluster_census (duplicate-cluster size distribution)
# ---------------------------------------------------------------------------


def test_dedup_cluster_census_laws(spark):
    """Crafted corpus pinning the census rules: a 3-copy cluster, a
    2-copy cluster, and singletons produce one row per size with
    n_docs = size·n_clusters summing to the corpus, integer permille
    shares, and example_cluster = the smallest label of that size.
    Exact copies guarantee the LSH collisions (J = 1)."""
    from tepsonic_database_sync_spark.operators.dedup import (
        dedup_cluster_census,
    )

    a = ("the quick brown fox jumps over a lazy dog while many people "
         "watch from the old stone bridge near town")
    b = ("completely unrelated text about quantum tensor algebra methods "
         "and their numerical stability properties in practice")
    rows = [
        (1, a), (2, a), (3, a),  # size-3 cluster, label 1
        (10, b), (11, b),  # size-2 cluster, label 10
        (20, "a lone short singleton document mentioning turtles and "
             "rivers gently flowing beneath autumn leaves onwards"),
        (21, "another singleton with entirely distinct vocabulary about "
             "medieval cartography and compass construction techniques"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["cluster_size"]: r for r in dedup_cluster_census(df).collect()}
    assert set(got) == {1, 2, 3}
    assert got[3]["n_clusters"] == 1 and got[3]["n_docs"] == 3
    assert got[3]["example_cluster"] == 1
    assert got[2]["n_clusters"] == 1 and got[2]["example_cluster"] == 10
    assert got[1]["n_clusters"] == 2 and got[1]["n_docs"] == 2
    assert sum(r["n_docs"] for r in got.values()) == 7
    assert got[3]["doc_share_permille"] == 3000 // 7
    assert got[1]["doc_share_permille"] == 2000 // 7


# ---------------------------------------------------------------------------
# SemDeDup vs an exact integer reference
# ---------------------------------------------------------------------------


def _semdedup_ref(vecs, n_cells, iters, eps):
    """Pure-Python twin of similarity.semdedup: integer Lloyd rounds
    (lowest-id seed, sim_e6_sep doubles, min-cent_id ties, truncating
    fixed-point means), final argmax assignment, then the
    keep-lowest-(cent_sim, id) removal rule with product-form pair
    cosine."""
    import math

    def half_up(x):
        return math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5)

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    def sim_sep(d, na2, nb2):
        return half_up(d / math.sqrt(na2) / math.sqrt(nb2) * 1e6)

    def sim_prod(d, na2, nb2):
        return half_up(d / math.sqrt(na2 * nb2) * 1e6)

    ivs = dict(enumerate(vecs))
    n2 = {i: dot(v, v) for i, v in ivs.items()}
    cents = {c: [x * 1000 for x in ivs[c]] for c in ivs if c < n_cells}
    for _ in range(iters):
        cn2 = {c: dot(m, m) for c, m in cents.items()}
        members = {}
        for i, v in ivs.items():
            _, negc = max(
                (sim_sep(dot(v, cents[c]), n2[i], cn2[c]), -c) for c in cents
            )
            members.setdefault(-negc, []).append(i)
        cents = {
            c: [
                (1000 * sum(ivs[i][d] for i in mem)) // len(mem)
                for d in range(len(vecs[0]))
            ]
            for c, mem in members.items()
        }
    cn2 = {c: dot(m, m) for c, m in cents.items()}
    assign = {}
    for i, v in ivs.items():
        s, negc = max(
            (sim_sep(dot(v, cents[c]), n2[i], cn2[c]), -c) for c in cents
        )
        assign[i] = (-negc, s)
    out = []
    for i, (ci, si) in assign.items():
        dup = 0
        for j, (cj, sj) in assign.items():
            if j == i or cj != ci:
                continue
            if (sj, j) < (si, i) and sim_prod(
                dot(ivs[i], ivs[j]), n2[i], n2[j]
            ) >= eps:
                dup = 1
                break
        out.append((i, ci, si, dup))
    return sorted(out)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vecs=st.lists(
        st.lists(st.integers(min_value=1, max_value=9), min_size=4, max_size=4),
        min_size=3,
        max_size=8,
    ),
    n_cells=st.sampled_from([2, 3]),
    eps=st.sampled_from([900000, 990000, 1000000]),
)
def test_semdedup_matches_integer_reference(spark, vecs, n_cells, eps):
    """semdedup == the exact integer reference for ANY positive vector
    set: Lloyd blocking, argmax-by-struct assignment (ties to the lower
    cent_id), and the keep-lowest-(cent_sim, id) removal rule. The
    4-dim 1..9 vectors make high-cosine pairs dense at every eps tier;
    duplicate vectors in the list exercise the exact-tie id rule."""
    from tepsonic_database_sync_spark.operators.similarity import semdedup

    emb = spark.createDataFrame(
        [(i, 0, [x / 1000 for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, label long, embedding array<double>",
    )
    got = sorted(
        (r["vec_id"], r["cent_id"], r["cent_sim_e6"], r["is_dup"])
        for r in semdedup(emb, n_cells=n_cells, iters=2, eps_e6=eps).collect()
    )
    assert got == _semdedup_ref(vecs, n_cells, 2, eps)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vecs=st.lists(
        st.lists(st.integers(min_value=1, max_value=9), min_size=4, max_size=4),
        min_size=3,
        max_size=8,
    ),
    n_fine=st.sampled_from([2, 3]),
    eps=st.sampled_from([900000, 990000, 1000000]),
)
def test_semdedup_two_level_degenerates_to_single_level(
    spark, vecs, n_fine, eps
):
    """The pinned degeneracy law: with n_coarse=1 on a contiguous-id
    corpus, semdedup_two_level(n_fine=k) == semdedup(n_cells=k) ==
    the exact integer reference — one coarse cell makes the fine seeds
    the globally lowest vec_ids and the grouped Lloyd a global Lloyd,
    so every centroid, assignment, cent_sim and dup flag must be
    bit-identical (fine_id plays cent_id). This is the law that keeps
    the two implementations from drifting apart; the ANY-corpus
    coverage of the reference test above carries over verbatim."""
    from tepsonic_database_sync_spark.operators.similarity import (
        semdedup_two_level,
    )

    emb = spark.createDataFrame(
        [(i, 0, [x / 1000 for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, label long, embedding array<double>",
    )
    got = sorted(
        (r["vec_id"], r["fine_id"], r["cent_sim_e6"], r["is_dup"])
        for r in semdedup_two_level(
            emb, n_coarse=1, n_fine=n_fine, iters=2, eps_e6=eps
        ).collect()
    )
    assert got == _semdedup_ref(vecs, n_fine, 2, eps)


# ---------------------------------------------------------------------------
# KMV bottom-k sketch vs an exact reference
# ---------------------------------------------------------------------------


def _kmv_ref(va, vb, k):
    """Pure-Python twin of sketches.kmv_summary + kmv_set_ops: bottom-k
    of the distinct h60 hashes per set, the (k-1)/h_(k)·2^60 double
    pipeline, union-merge, and the ρ/k intersection rule."""
    import math

    def half_up(x):
        return math.floor(x + 0.5)

    def est(lst):
        if len(lst) < k:
            return len(lst)
        return half_up((k - 1) / lst[k - 1] * float(1 << 60))

    ha = sorted({_h60_py(x) for x in va})[:k]
    hb = sorted({_h60_py(x) for x in vb})[:k]
    u = sorted(set(ha) | set(hb))[:k]
    sa, sb = set(ha), set(hb)
    rho = sum(1 for x in u if x in sa and x in sb)
    eu = est(u)
    ei = rho if len(u) < k else (rho * eu) // k
    return sorted(
        [
            ("a", len(ha), ha[-1], est(ha)),
            ("b", len(hb), hb[-1], est(hb)),
            ("union", len(u), u[-1], eu),
            ("intersect", rho, u[-1], ei),
        ]
    )


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    va=st.lists(
        st.sampled_from([f"w{i}" for i in range(12)]), min_size=1, max_size=10
    ),
    vb=st.lists(
        st.sampled_from([f"w{i}" for i in range(12)]), min_size=1, max_size=10
    ),
)
def test_kmv_matches_reference(spark, va, vb):
    """kmv_summary + kmv_set_ops == the exact bottom-k reference for
    ANY two small multisets — k=4 against a 12-symbol alphabet drives
    both estimator branches (set smaller than k → exact size; ≥ k →
    the double-pipeline estimate), overlapping and disjoint summaries,
    and ρ from 0 to k."""
    from tepsonic_database_sync_spark.operators.sketches import (
        kmv_set_ops,
        kmv_summary,
    )

    rows = [(0, v) for v in va] + [(1, v) for v in vb]
    items = spark.createDataFrame(rows, "half long, term string")
    km = kmv_summary(items, "half", "term", k=4)
    got = sorted(
        (r["set_key"], r["n_kept"], r["kth_hash"], r["est"])
        for r in kmv_set_ops(
            km.filter(km.half == 0), km.filter(km.half == 1), k=4
        ).collect()
    )
    assert got == _kmv_ref(va, vb, 4)


# ---------------------------------------------------------------------------
# MMR re-ranking vs an exact integer greedy reference
# ---------------------------------------------------------------------------


def _mmr_ref(vecs, n_queries, n_cand, k, lam):
    """Pure-Python twin of similarity.mmr_rerank: exact-cosine top-n_cand
    candidates per query (ties to the lower id), then the greedy
    λ·rel − (1−λ)·max-sim-to-selected trajectory with max_sim = 0 for
    the empty selection and ties to the lowest id."""
    import math

    def half_up(x):
        return math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5)

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    ivs = dict(enumerate(vecs))
    n2 = {i: dot(v, v) for i, v in ivs.items()}

    def sim(i, j):
        return half_up(
            dot(ivs[i], ivs[j]) / math.sqrt(n2[i] * n2[j]) * 1e6
        )

    out = []
    for qid in range(min(n_queries, len(vecs))):
        rel = {i: sim(i, qid) for i in ivs if i != qid}
        cand = sorted(rel, key=lambda i: (-rel[i], i))[:n_cand]
        sel = []
        for step in range(1, k + 1):
            remaining = [c for c in cand if c not in sel]
            if not remaining:
                break
            scores = {
                c: lam * rel[c]
                - (1000 - lam)
                * max((sim(c, s) for s in sel), default=0)
                for c in remaining
            }
            best = max(remaining, key=lambda c: (scores[c], -c))
            out.append((qid, step, best, rel[best], scores[best]))
            sel.append(best)
    return sorted(out)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vecs=st.lists(
        st.lists(st.integers(min_value=1, max_value=9), min_size=4, max_size=4),
        min_size=3,
        max_size=8,
    ),
    lam=st.sampled_from([500, 700, 1000]),
)
def test_mmr_rerank_matches_integer_reference(spark, vecs, lam):
    """mmr_rerank == the exact integer greedy for ANY positive vector
    set and λ tier: λ=1000 degenerates to pure-relevance ordering (the
    diversity term multiplies by zero), λ=500 makes the penalty bind
    hard, duplicate vectors exercise the exact-tie lowest-id rule, and
    |corpus| < n_queries+k exercises candidate exhaustion (a query
    emits fewer than k picks)."""
    from tepsonic_database_sync_spark.operators.similarity import mmr_rerank

    emb = spark.createDataFrame(
        [(i, 0, [x / 1000 for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, label long, embedding array<double>",
    )
    got = sorted(
        (r["q_id"], r["step"], r["neighbor_id"], r["rel_e6"], r["mmr_score"])
        for r in mmr_rerank(
            emb, n_queries=2, n_cand=4, k=3, lambda_milli=lam
        ).collect()
    )
    assert got == _mmr_ref(vecs, 2, 4, 3, lam)


# ---------------------------------------------------------------------------
# Binary pHash near-dup vs an exact reference
# ---------------------------------------------------------------------------


def _phash_ref(payloads, bits, bands, gram_bytes, tau):
    """Pure-Python twin of multimodal.phash_signatures +
    phash_neardup_pairs: hex byte-grams → md5-h60 ±1 votes → packed
    signature → band-bucket candidates → exact hamming verify."""
    import hashlib

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    sigs = {}
    for aid, p in payloads.items():
        if len(p) < gram_bytes:
            continue
        hx = p.hex().upper()
        grams = {
            hx[i * 2 : i * 2 + gram_bytes * 2]
            for i in range(len(p) - gram_bytes + 1)
        }
        sig = 0
        for b in range(bits):
            vote = sum(
                1 if h60(g) & (1 << b) else -1 for g in grams
            )
            if vote > 0:
                sig |= 1 << b
        sigs[aid] = sig
    width = bits // bands
    mask = (1 << width) - 1
    out = set()
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b_ in ids[i + 1 :]:
            shares = any(
                (sigs[a] >> (k * width)) & mask
                == (sigs[b_] >> (k * width)) & mask
                for k in range(bands)
            )
            ham = bin(sigs[a] ^ sigs[b_]).count("1")
            if shares and ham <= tau:
                out.add((a, b_, ham))
    return sorted(out)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    blobs=st.lists(
        st.binary(min_size=0, max_size=12),
        min_size=2,
        max_size=6,
    ),
    tau=st.sampled_from([0, 6, 48]),
)
def test_phash_neardup_matches_reference(spark, blobs, tau):
    """phash_neardup_pairs == the exact reference for ANY byte corpus
    and tau tier: tau=0 keeps only identical signatures, tau=48 keeps
    every banded candidate (isolating the banding recall), short blobs
    exercise the no-gram exclusion, duplicate blobs the hamming-0
    path."""
    from tepsonic_database_sync_spark.operators.multimodal import (
        PHASH_BANDS,
        PHASH_BITS,
        PHASH_GRAM_BYTES,
        phash_neardup_pairs,
    )

    payloads = {i + 1: p for i, p in enumerate(blobs)}
    assets = spark.createDataFrame(
        [(aid, "image", bytearray(p), None) for aid, p in payloads.items()],
        "asset_id long, kind string, payload binary, "
        "meta struct<width int, height int, n_frames int, format string>",
    )
    got = sorted(
        (r["a_id"], r["b_id"], r["hamming"])
        for r in phash_neardup_pairs(assets, tau=tau).collect()
    )
    assert got == _phash_ref(
        payloads, PHASH_BITS, PHASH_BANDS, PHASH_GRAM_BYTES, tau
    )


# ---------------------------------------------------------------------------
# Label propagation vs an exact synchronous reference
# ---------------------------------------------------------------------------


def _lpa_ref(edge_set, rounds):
    """Pure-Python twin of graph.label_propagation: symmetric edges,
    synchronous rounds, mode-of-neighbors with (count DESC, label ASC)
    ties."""
    from collections import Counter

    adj = {}
    for a, b in edge_set:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    labels = {n: n for n in adj}
    for _ in range(rounds):
        new = {}
        for n, nbrs in adj.items():
            cnt = Counter(labels[m] for m in nbrs)
            new[n] = max(cnt, key=lambda l: (cnt[l], -l))
        labels = new
    return sorted(labels.items())


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    raw=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=8),
            st.integers(min_value=1, max_value=8),
        ),
        min_size=1,
        max_size=12,
    ),
    rounds=st.sampled_from([1, 2, 4]),
)
def test_label_propagation_matches_reference(spark, raw, rounds):
    """label_propagation == the exact synchronous reference for ANY
    small multigraph-free graph and round count: triangles pull labels
    together, bipartite chains oscillate (round parity must agree
    exactly), parallel-edge inputs collapse to simple edges first."""
    from tepsonic_database_sync_spark.operators.graph import label_propagation

    edge_set = {(min(a, b), max(a, b)) for a, b in raw if a != b}
    if not edge_set:
        return
    sym = [(a, b) for a, b in edge_set] + [(b, a) for a, b in edge_set]
    edges = spark.createDataFrame(sym, "src long, dst long")
    got = sorted(
        (r["node"], r["label"])
        for r in label_propagation(edges, rounds=rounds).collect()
    )
    assert got == _lpa_ref(edge_set, rounds)


def test_label_propagation_long_trajectory_hits_lazy_checkpoint(spark):
    """rounds >= _LPA_CKPT_EVERY + 1 executes the lazy localCheckpoint
    branch (the plan-depth bound that never fires at the default 4
    rounds — ADVICE r12: no other test exercised it) and the output
    must still equal the exact synchronous reference. The graph mixes
    an odd cycle (labels keep churning, so late rounds do real work)
    with a pendant chain."""
    from tepsonic_database_sync_spark.operators.graph import (
        _LPA_CKPT_EVERY,
        label_propagation,
    )

    edge_set = {(1, 2), (2, 3), (3, 4), (4, 5), (5, 1), (5, 6), (6, 7)}
    sym = [(a, b) for a, b in edge_set] + [(b, a) for a, b in edge_set]
    edges = spark.createDataFrame(sym, "src long, dst long")
    rounds = _LPA_CKPT_EVERY + 1  # (r+1) % EVERY == 0 fires at r = EVERY-1
    got = sorted(
        (r["node"], r["label"])
        for r in label_propagation(edges, rounds=rounds).collect()
    )
    assert got == _lpa_ref(edge_set, rounds)


# ---------------------------------------------------------------------------
# Containment pairs vs the exact all-pairs reference
# ---------------------------------------------------------------------------


def _containment_ref(doc_toks, n, tau):
    """Exact all-pairs directed containment over distinct word
    n-gram shingles (the blocking-free ground truth)."""
    sh = {}
    for did, toks in doc_toks:
        sh[did] = {
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        }
    out = []
    for a, sa in sh.items():
        if not sa:
            continue
        for b, sb in sh.items():
            if a == b or not sb:
                continue
            inter = len(sa & sb)
            if inter * 1000 >= len(sa) * tau:
                out.append((a, b, inter, len(sa), (1000 * inter) // len(sa)))
    return sorted(out)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    doc_toks=st.lists(
        st.lists(st.sampled_from(["x", "y", "z"]), min_size=0, max_size=8),
        min_size=2,
        max_size=6,
    ),
    tau=st.sampled_from([300, 700, 1000]),
)
def test_containment_pairs_matches_all_pairs_reference(spark, doc_toks, tau):
    """containment_pairs == the exact blocking-free all-pairs reference
    for ANY corpus and tau tier — the one-sided prefix filter plus
    length/positional pruning must lose NOTHING: tau=1000 keeps only
    full subset containment, tau=300 floods candidates, the dense
    3-symbol alphabet forces asymmetric |a| << |b| containments, and
    sub-n docs exercise the empty-shingle exclusion."""
    from tepsonic_database_sync_spark.operators.dedup import containment_pairs

    docs = [(i + 1, toks) for i, toks in enumerate(doc_toks)]
    df = spark.createDataFrame(
        [(did, " ".join(toks), len(" ".join(toks))) for did, toks in docs],
        "doc_id long, text string, n_chars long",
    )
    got = sorted(
        (r["a_id"], r["b_id"], r["inter_size"], r["a_size"],
         r["cont_permille"])
        for r in containment_pairs(df, n=3, tau_permille=tau).collect()
    )
    assert got == _containment_ref(docs, 3, tau)


# ---------------------------------------------------------------------------
# RM3 pseudo-relevance feedback vs an exact integer reference
# ---------------------------------------------------------------------------


def _rm3_ref(doc_texts, q, fb_docs, exp_terms, lam, topn, k1=1200, b=750):
    """Pure-Python twin of text.rm3_feedback: integer BM25 pass 1,
    top-fb feedback, relevance-model expansion, posting-form pass 2,
    interpolated top-n. iln is the engine's shared integer log."""
    import math
    import re

    def iln(x):
        k = math.floor(math.log2(x))
        p = 2 ** k
        return ((k * 1000 + ((x - p) * 1000) // p) * 693147) // 1000000 - 6908

    toks = {d: re.split(r"\s+", t.strip().lower()) for d, t in doc_texts}
    dl = {d: len(t) for d, t in toks.items()}
    n = len(toks)
    avgdl = (sum(dl.values()) * 1000) // n

    def bm25_term(tf, df, d):
        if tf == 0 or df == 0:
            # tf=0 -> tf_norm=0 -> contribution 0; df=0 implies tf=0
            return 0
        x = max(((2 * (n - df) + 1) * 1000) // (2 * df + 1), 1)
        idf = max(0, iln(x))
        denom = tf * 1000 + (k1 * ((1000 - b) + (b * dl[d] * 1000) // avgdl)) // 1000
        return (idf * ((tf * (k1 + 1000) * 1000) // denom)) // 1000

    dfq = {w: sum(1 for t in toks.values() if w in t) for w in q}
    s1 = {
        d: sum(bm25_term(t.count(w), dfq[w], d) for w in q)
        for d, t in toks.items()
    }
    fb = sorted(s1, key=lambda d: (-s1[d], d))[:fb_docs]
    w_raw = {}
    for d in fb:
        for term in set(toks[d]):
            if term == "" or term in q:
                continue
            tf = toks[d].count(term)
            w_raw[term] = w_raw.get(term, 0) + ((tf * 1000) // dl[d]) * s1[d]
    cand = sorted(
        (t for t, w in w_raw.items() if w > 0),
        key=lambda t: (-w_raw[t], t),
    )[:exp_terms]
    out = {d: (s1[d], 0) for d in toks}
    if cand:
        w_tot = sum(w_raw[t] for t in cand)
        w_norm = {t: (1000 * w_raw[t]) // w_tot for t in cand}
        df2 = {t: sum(1 for tk in toks.values() if t in tk) for t in cand}
        for d in toks:
            e = sum(
                (w_norm[t] * bm25_term(toks[d].count(t), df2[t], d)) // 1000
                for t in cand
            )
            out[d] = (s1[d], e)
    ranked = sorted(
        (
            (d, bm, e, (lam * bm + (1000 - lam) * e) // 1000)
            for d, (bm, e) in out.items()
        ),
        key=lambda r: (-r[3], r[0]),
    )[:topn]
    return [
        (i + 1, d, bm, e, rm) for i, (d, bm, e, rm) in enumerate(ranked)
    ]


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    doc_toks=st.lists(
        st.lists(st.sampled_from(["x", "y", "z", "w"]), min_size=0, max_size=8),
        min_size=2,
        max_size=7,
    ),
)
def test_rm3_feedback_matches_integer_reference(spark, doc_toks):
    """rm3_feedback == the exact integer reference for ANY corpus over a
    dense alphabet: expansion terms are data-dependent (z/w get picked
    when they co-occur with the query hits), all-zero first passes
    exercise the empty-expansion path, empty docs the ''-token
    contract, and the fixed tie rules pin the full two-pass
    trajectory."""
    from tepsonic_database_sync_spark.operators.text import rm3_feedback

    docs = [(i + 1, " ".join(ts)) for i, ts in enumerate(doc_toks)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = [
        tuple(r)
        for r in rm3_feedback(
            df, ["x", "y"], fb_docs=3, exp_terms=2, lambda_milli=700, topn=5
        )
        .orderBy("rank")
        .collect()
    ]
    assert got == _rm3_ref(docs, ["x", "y"], 3, 2, 700, 5)


# ---------------------------------------------------------------------------
# l-diversity / t-closeness vs an exact reference
# ---------------------------------------------------------------------------


def _ldiv_ref(rows, l_min, t_max):
    """Exact reference: per quasi class — size, distinct sensitive
    values, closed-form integer TVD vs the global distribution."""
    from collections import Counter

    n = len(rows)
    g = Counter(s for _, s in rows)
    classes = {}
    for q, s in rows:
        classes.setdefault(q, Counter())[s] += 1
    out = []
    for q, cnt in classes.items():
        k = sum(cnt.values())
        present = sum(abs(c * n - g[s] * k) for s, c in cnt.items())
        g_present = sum(g[s] for s in cnt)
        tvd = (500 * (present + (n - g_present) * k)) // (k * n)
        out.append((q, k, len(cnt), tvd, len(cnt) < l_min, tvd > t_max))
    return sorted(out, key=lambda r: (r[0] is None, r[0]))


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", None]),
            st.sampled_from([1, 2, 3, None]),
        ),
        min_size=1,
        max_size=20,
    ),
    t_max=st.sampled_from([0, 300, 1000]),
)
def test_l_diversity_matches_reference(spark, rows, t_max):
    """l_diversity == the exact reference for ANY table incl. NULL
    quasi AND sensitive values (each groups as its own class/value):
    t_max=0 flags every class that deviates at all, t_max=1000 flags
    none (TVD ≤ 1000 by construction), homogeneous classes trip
    l_at_risk."""
    from tepsonic_database_sync_spark.operators.profile import l_diversity

    df = spark.createDataFrame(rows, "q string, s int")
    got = sorted(
        (
            (r["q"], r["class_size"], r["l_distinct"], r["tvd_permille"],
             r["l_at_risk"], r["t_at_risk"])
            for r in l_diversity(
                df, ["q"], "s", l_min=2, t_max_permille=t_max
            ).collect()
        ),
        key=lambda r: (r[0] is None, r[0]),
    )
    assert got == _ldiv_ref(rows, 2, t_max)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    caps=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4),   # url
            st.integers(min_value=0, max_value=3),   # snapshot
            st.sampled_from(["alpha text", "beta text", "Alpha  Text"]),
        ),
        min_size=1,
        max_size=16,
    ),
    split=st.integers(min_value=0, max_value=3),
)
def test_snapshot_store_merge_fold_equals_batch(spark, caps, split):
    """The mergeable-store law behind snapshot_dedup_incremental: for
    ANY capture multiset and ANY snapshot split point, folding the two
    halves through snapshot_store_merge then reducing equals the
    one-shot batch reduction — including splits where one side is
    empty, duplicate captures inside a snapshot, and versions that are
    the same modulo whitespace/case ('alpha text' vs 'Alpha  Text')."""
    from tepsonic_database_sync_spark.operators.dedup import (
        snapshot_dedup,
        snapshot_store_merge,
        snapshot_versions,
        snapshot_winners,
    )

    schema = "url long, snapshot_id long, text string"
    all_caps = spark.createDataFrame(caps, schema)
    batch = sorted(map(tuple, snapshot_dedup(all_caps).collect()))

    lo = [c for c in caps if c[1] <= split]
    hi = [c for c in caps if c[1] > split]
    store = snapshot_versions(
        spark.createDataFrame(lo, schema)
        if lo
        else spark.createDataFrame([], schema)
    )
    newer = snapshot_versions(
        spark.createDataFrame(hi, schema)
        if hi
        else spark.createDataFrame([], schema)
    )
    inc = sorted(
        map(tuple, snapshot_winners(snapshot_store_merge(store, newer)).collect())
    )
    assert inc == batch


# ---------------------------------------------------------------------------
# fuzzy_canonicalize (fuzzy tier's corpus-out form: quality keepers + rejoin)
# ---------------------------------------------------------------------------


def test_fuzzy_canonicalize_emits_surviving_corpus(spark):
    """Crafted corpus (the fuzzy_keep_best fixture with lang/source
    attached) pinning the corpus-out contract: exactly the keeper docs
    survive — the clean HIGH-id twin over its damaged LOW-id near-dup,
    min id on an exact-copy tie, singleton kept — each carrying ITS OWN
    wide columns (not the cluster-mate's) and an n_chars recomputed
    from its actual text."""
    from tepsonic_database_sync_spark.operators.dedup import (
        fuzzy_canonicalize,
    )

    base = (
        "the quick brown fox jumps over a lazy dog while many people "
        "watch from the old stone bridge near town"
    )
    dup = (
        "completely unrelated text about quantum tensor algebra "
        "methods and their numerical stability properties in practice"
    )
    single = (
        "a lone short singleton document mentioning turtles and "
        "rivers gently flowing beneath autumn leaves forever onwards"
    )
    rows = [
        (1, base + " the" * 40, "en", "srcDAMAGED"),
        (2, base, "en", "srcCLEAN"),
        (10, dup, "de", "srcT1"),
        (11, dup, "fr", "srcT2"),
        (20, single, "es", "srcS"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    got = sorted(
        (
            r["doc_id"], r["lang"], r["source"], r["n_chars"],
            r["quality"], r["cluster_size"],
        )
        for r in fuzzy_canonicalize(df).collect()
    )
    assert got == [
        (2, "en", "srcCLEAN", len(base), 100, 2),
        (10, "de", "srcT1", len(dup), 100, 2),
        (20, "es", "srcS", len(single), 100, 1),
    ]


# ---------------------------------------------------------------------------
# contamination_fuzzy_report (per-source fuzzy-contamination rollup)
# ---------------------------------------------------------------------------


def test_contamination_fuzzy_report_rollup_laws(spark):
    """Crafted train/bench (the decontaminate_fuzzy fixture with
    sources attached) pinning the rollup rules: the integer permille
    over train docs, the worst verified match per source (jaccard
    DESC, doc_id — here srcA's sub-tau candidate must NOT win over its
    contaminated sibling), and the all-clean source reporting
    (0, min-doc, -1)."""
    from tepsonic_database_sync_spark.operators.dedup import (
        contamination_fuzzy_report,
    )

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega"
    )
    second = (
        "red orange yellow green blue indigo violet crimson scarlet amber "
        "teal navy maroon olive coral salmon ivory beige"
    )
    train = spark.createDataFrame(
        [
            (1, base, "srcA"),
            (2, second, "srcA"),
            (3, "totally disjoint content about volcanic minerals and "
                "deep sea currents", "srcB"),
        ],
        "doc_id long, text string, source string",
    )
    bench = spark.createDataFrame(
        [(101, base + " zzeval"), (102, second + " zz1 zz2 zz3")],
        "doc_id long, text string",
    )
    got = sorted(
        (
            r["source"], r["n_docs"], r["n_contaminated"],
            r["contamination_permille"], r["worst_jaccard_permille"],
            r["worst_doc_id"], r["worst_bench_id"],
        )
        for r in contamination_fuzzy_report(
            train, bench, tau_permille=900
        ).collect()
    )
    assert got == [
        ("srcA", 2, 1, 500, 956, 1, 101),
        ("srcB", 1, 0, 0, 0, 3, -1),
    ]


# ---------------------------------------------------------------------------
# substring_dedup_spans_verified (paper-exact per-span verbatim verification)
# ---------------------------------------------------------------------------


def test_substring_spans_verified_rejects_splice(spark):
    """Crafted corpus pinning the verification law that separates this
    operator from substring_dedup_spans: a 60-token block duplicated
    VERBATIM across two docs is removed by both (the non-canonical
    copy), but a 30+30 splice — each half duplicated against a
    DIFFERENT doc, never adjacent anywhere else — forms a 60-token
    island that the plain operator removes and the verified one must
    KEEP (no single verbatim source spans the junction: per-source
    runs are 30 tokens, below min_span)."""
    from tepsonic_database_sync_spark.operators.dedup import (
        substring_dedup_spans,
        substring_dedup_spans_verified,
    )

    a = " ".join(f"qa{i}" for i in range(1, 61))
    c = " ".join(f"qc{i}" for i in range(1, 31))
    d = " ".join(f"qd{i}" for i in range(1, 31))
    rows = [
        (1, a + " uniq1a uniq1b"),   # canonical holder of block A
        (2, a + " uniq2a uniq2b"),   # verbatim dup of A
        (3, c + " uniq3a uniq3b"),   # canonical holder of C
        (4, "uniq4a uniq4b " + d),   # canonical holder of D
        (5, c + " " + d),            # splice: C+D never adjacent elsewhere
        (6, "totally unrelated short text here nothing repeats at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    plain = {
        r["doc_id"]: (r["removed_tokens"], r["n_spans"], r["max_span_tokens"])
        for r in substring_dedup_spans(df).collect()
    }
    ver = {
        r["doc_id"]: (
            r["removed_tokens"], r["n_spans"], r["max_span_tokens"],
            r["kept_text"],
        )
        for r in substring_dedup_spans_verified(df).collect()
    }
    # the true verbatim dup: removed identically by both operators
    assert plain[2] == (60, 1, 60)
    assert ver[2][:3] == (60, 1, 60)
    assert ver[2][3] == "uniq2a uniq2b"
    # the splice: plain removes all 60, verified keeps everything
    assert plain[5] == (60, 1, 60)
    assert ver[5] == (0, 0, 0, c + " " + d)
    # canonical holders and the singleton never lose tokens
    for did in (1, 3, 4, 6):
        assert ver[did][0] == 0


# ---------------------------------------------------------------------------
# source_neardup_matrix (cross-source near-duplicate matrix)
# ---------------------------------------------------------------------------


def test_source_neardup_matrix_normalization_and_cells(spark):
    """Crafted corpus pinning the matrix laws: the unordered source
    pair is normalized lexicographically WITH the example doc ids
    swapped in step (here the lower doc id belongs to the
    lexicographically LATER source, so the example must read
    (source_a's doc, source_b's doc) = (2, 1)); a same-source
    near-dup pair reports as a diagonal cell at jp 1000; a sub-tau
    overlap and an unrelated doc contribute nothing."""
    from tepsonic_database_sync_spark.operators.dedup import (
        source_neardup_matrix,
    )

    t1 = " ".join(f"wa{i}" for i in range(1, 21))
    t2 = " ".join(f"wb{i}" for i in range(1, 21))
    rows = [
        (1, t1, "s2"),                       # near-dup of doc 2, LATER source
        (2, t1 + " extraz", "s1"),           # 18/19 shingles shared -> jp 947
        (10, t2, "s3"),                      # identical same-source pair
        (11, t2, "s3"),
        (20, " ".join(f"wa{i}" for i in range(1, 11))
             + " " + " ".join(f"wc{i}" for i in range(1, 11)), "s4"),
        (30, "nothing here resembles anything else in this tiny corpus",
         "s5"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = sorted(
        (
            r["source_a"], r["source_b"], r["n_pairs"],
            r["max_jaccard_permille"], r["example_a_id"], r["example_b_id"],
        )
        for r in source_neardup_matrix(df, tau_permille=600).collect()
    )
    assert got == [
        ("s1", "s2", 1, 947, 2, 1),
        ("s3", "s3", 1, 1000, 10, 11),
    ]
