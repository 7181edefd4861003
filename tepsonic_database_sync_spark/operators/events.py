"""Event analytics — funnel conversion and cohort retention.

Product-analytics staples over the ``events`` stream, expressed as plain
grouped aggregations so they hold at 100 TB: each is ONE shuffle on
``user_id`` (high-cardinality, uniform) followed by a tiny rollup; no
windows over the full event table, no self-joins over raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

WEEK_SECS = 7 * 24 * 3600


def funnel_conversion(
    events: DataFrame, stages: tuple[str, ...] = ("signup", "view", "purchase")
) -> DataFrame:
    """Ordered funnel: a user reaches stage k if their earliest stage-k
    event is at-or-after their earliest stage-(k-1) event. One groupBy
    collects each user's min-timestamp per stage (map-side combined);
    the stage counts are a rollup of that per-user row.

    Returns (stage_idx, stage, n_users), n_users non-increasing.
    """
    es = F.unix_timestamp("ts").cast("long")
    per_user = events.groupBy("user_id").agg(
        *[
            F.min(F.when(F.col("event_type") == s, es)).alias(f"t{i}")
            for i, s in enumerate(stages)
        ]
    )
    reached = None
    flags = []
    for i in range(len(stages)):
        cur = F.col(f"t{i}").isNotNull()
        if i > 0:
            cur = cur & flags[i - 1] & (F.col(f"t{i}") >= F.col(f"t{i-1}"))
        flags.append(cur)
        reached = cur if reached is None else reached
    counts = per_user.agg(
        *[F.count_if(flags[i]).cast("long").alias(f"n{i}") for i in range(len(stages))]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("stage_idx"),
                F.lit(s).alias("stage"),
                F.col(f"n{i}").alias("n_users"),
            )
            for i, s in enumerate(stages)
        ]
    )
    return counts.select(F.explode(rows).alias("r")).select("r.*")


def cohort_retention(events: DataFrame) -> DataFrame:
    """Weekly cohort retention: users grouped by first-activity week,
    counted per week-offset of later activity. Two aggregations — per
    (user, week) activity, then the cohort rollup — both shuffles on
    well-spread keys. Returns (cohort_ws, week_offset, n_users)."""
    es = F.unix_timestamp("ts").cast("long")
    week = (F.floor(es / WEEK_SECS) * WEEK_SECS).cast("long")
    user_weeks = events.select("user_id", week.alias("ws")).distinct()
    first = user_weeks.groupBy("user_id").agg(F.min("ws").alias("cohort_ws"))
    return (
        user_weeks.join(first, "user_id")
        .groupBy(
            "cohort_ws",
            ((F.col("ws") - F.col("cohort_ws")) / WEEK_SECS).cast("long").alias(
                "week_offset"
            ),
        )
        .agg(F.count("*").cast("long").alias("n_users"))
    )


def event_transitions(events: DataFrame) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: count (previous event_type → event_type) pairs and their
    within-source probability in permille (integer math, engine-portable).

    Scale shape: ONE window shuffle on user_id (high-cardinality,
    uniform) to pair each event with its predecessor, then a groupBy on
    (prev, next) whose result is at most |event_types|² rows — the
    probability normalization window runs over THAT tiny frame, never
    over raw events.  Ordering is (ts, event_id) so simultaneous events
    resolve deterministically in any engine.

    Returns (prev_type, event_type, n, p_permille) where p_permille =
    floor(1000·n / Σn over the same prev_type).
    """
    es = F.unix_timestamp("ts").cast("long")
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    pairs = (
        events.select("user_id", "event_id", "event_type", es.alias("es"))
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
    )
    counts = pairs.groupBy("prev_type", "event_type").agg(
        F.count("*").cast("long").alias("n")
    )
    tot = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "event_type",
        "n",
        F.floor(F.lit(1000) * F.col("n") / F.sum("n").over(tot))
        .cast("long")
        .alias("p_permille"),
    )


# anomaly-detection geometry, shared with the DuckDB oracle (registry)
ANOMALY_BUCKET_S = 3600  # 1-hour count buckets
ANOMALY_TRAIL_BUCKETS = 24  # trailing baseline window (previous 24 h)
ANOMALY_SPIKE_FACTOR = 2  # spike ⇔ count > factor × trailing average


def hourly_type_counts(events: DataFrame) -> DataFrame:
    """(event_type, bucket_es, cnt) hourly volume buckets — the shared
    input of the batch spike detector and its streaming twin
    (streaming/ops.anomaly_stream builds the same rows incrementally via
    a watermarked window aggregate)."""
    bucket = (
        (F.floor(F.unix_timestamp("ts") / ANOMALY_BUCKET_S) * ANOMALY_BUCKET_S)
        .cast("long")
        .alias("bucket_es")
    )
    return (
        events.select("event_type", bucket)
        .groupBy("event_type", "bucket_es")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def event_anomaly(events: DataFrame) -> DataFrame:
    """Trailing-window spike detection over per-type event volume: bucket
    events into hourly counts per event_type, compare each bucket with
    the average of the PREVIOUS 24 buckets (RANGE frame on the bucket
    epoch, excluding the current bucket), and flag buckets that exceed
    ``ANOMALY_SPIKE_FACTOR`` × the trailing average.

    Integer math throughout — the flag is
    ``cnt · trailing_n > factor · trailing_sum`` (no float division), so
    Spark and any SQL oracle agree bit-for-bit.

    Scale shape: one groupBy shuffle on (event_type, bucket) — map-side
    combined, so the shuffle carries one row per non-empty bucket — then
    the RANGE window runs over the tiny per-type bucket series, never
    over raw events.  The same two-pass "aggregate first, window over
    aggregates" shape as scoring.rank_normalize(histogram).

    Returns (event_type, bucket_es, cnt, trailing_sum, trailing_n,
    is_spike); is_spike is False while fewer than one trailing bucket
    exists (cold start).
    """
    return trailing_spike_flags(hourly_type_counts(events))


def trailing_spike_flags(counts: DataFrame) -> DataFrame:
    """The windowing core of ``event_anomaly`` over pre-bucketed counts
    (event_type, bucket_es, cnt) — factored out so the streaming
    detector can run it over (history ∪ current micro-batch)."""
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_es")
        .rangeBetween(-ANOMALY_TRAIL_BUCKETS * ANOMALY_BUCKET_S, -ANOMALY_BUCKET_S)
    )
    trailing_sum = F.coalesce(F.sum("cnt").over(w), F.lit(0)).cast("long")
    trailing_n = F.count("cnt").over(w).cast("long")
    with_trail = counts.select(
        "event_type",
        "bucket_es",
        "cnt",
        trailing_sum.alias("trailing_sum"),
        trailing_n.alias("trailing_n"),
    )
    return with_trail.withColumn(
        "is_spike",
        (F.col("trailing_n") > 0)
        & (
            F.col("cnt") * F.col("trailing_n")
            > ANOMALY_SPIKE_FACTOR * F.col("trailing_sum")
        ),
    )


def scd2_history(events: DataFrame) -> DataFrame:
    """Slowly-Changing-Dimension Type 2 history build from a change
    stream: per user, collapse consecutive repeats of the tracked
    attribute (event_type here) into versioned rows with
    [valid_from, valid_to) ranges and an is_current flag — the standard
    warehouse modeling of "what was this entity's state at time T".

    Three window passes over ONE partitioning (user_id): change
    detection (lag), then validity ranges (lead); Spark plans them in a
    single shuffle + sort. Ordering is (ts, event_id) so simultaneous
    events resolve deterministically in any engine. Timestamps surface
    as epoch seconds (BIGINT) for engine-portable comparison.

    At 100 TB the shuffle key is user_id (uniform); no global ordering
    anywhere. Returns (user_id, state, valid_from, valid_to NULL for
    open versions, is_current).
    """
    es = F.unix_timestamp("ts").cast("long")
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    changes = (
        events.select("user_id", "event_id", "event_type", es.alias("es"))
        .withColumn("prev", F.lag("event_type").over(w))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
    )
    w2 = Window.partitionBy("user_id").orderBy("es", "event_id")
    versions = changes.withColumn("valid_to", F.lead("es").over(w2))
    return versions.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("es").cast("long").alias("valid_from"),
        F.col("valid_to").cast("long").alias("valid_to"),
        F.col("valid_to").isNull().alias("is_current"),
    )


ACTIVE_WINDOW_DAYS = 7


def active_users(events: DataFrame) -> DataFrame:
    """DAU / rolling-WAU — the canonical engagement metric pair: per
    calendar day, distinct active users that day and over the trailing
    ``ACTIVE_WINDOW_DAYS`` window.

    Rolling DISTINCT does not decompose like a rolling sum (a user
    active on 3 of the 7 days still counts once), so the standard scale
    shape is CONTRIBUTION EXPLODE, not a window: the distinct
    (user, day) frame — one shuffle, tiny — emits one row per window day
    it contributes to (an array generator, ×7, no join), and one
    count-distinct per window day finishes. Days with no events emit no
    row, and partial leading windows count only observed days — both
    stated, both matched by the oracle.

    Returns (day_es, dau, wau_7d) with day_es = UTC midnight epoch.
    """
    day = (F.floor(F.unix_timestamp("ts") / 86400)).cast("long")
    ud = events.select("user_id", day.alias("day")).distinct()
    dau = ud.groupBy("day").agg(
        F.count_distinct("user_id").cast("long").alias("dau")
    )
    contrib = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.col("day") + (ACTIVE_WINDOW_DAYS - 1))
        ).alias("day"),
    )
    wau = contrib.groupBy("day").agg(
        F.count_distinct("user_id").cast("long").alias("wau_7d")
    )
    return (
        dau.join(wau, "day")
        .select(
            (F.col("day") * 86400).cast("long").alias("day_es"),
            "dau",
            "wau_7d",
        )
    )


def growth_accounting(events: DataFrame) -> DataFrame:
    """Weekly growth accounting — the engagement ledger behind every
    "where did our users go" review: each (user, active-week) is NEW
    (first week ever), RETAINED (also active the immediately previous
    week) or RESURRECTED (returning after a gap), and each week is
    charged the users it CHURNED (active the previous week, absent this
    week). The identity new + retained + resurrected = weekly actives
    holds by construction.

    One shuffle: the distinct (user, week) frame, with lag/lead windows
    per user over their week series (rows = active weeks per user, tiny)
    — never over raw events. Churn for week w is counted from week w−1's
    rows via lead (absent-next-week), so quiet trailing weeks need no
    calendar scaffold; the LAST observed week in the data reports its
    own churn as 0 by definition (nothing after it to be absent from —
    stated, mirrored by the oracle).

    Returns (ws, n_new, n_retained, n_resurrected, n_churned).
    """
    es = F.unix_timestamp("ts").cast("long")
    week = (F.floor(es / WEEK_SECS) * WEEK_SECS).cast("long")
    uw = events.select("user_id", week.alias("ws")).distinct()
    w = Window.partitionBy("user_id").orderBy("ws")
    seq = uw.select(
        "user_id",
        "ws",
        F.lag("ws").over(w).alias("prev_ws"),
        F.lead("ws").over(w).alias("next_ws"),
    )
    status = (
        F.when(F.col("prev_ws").isNull(), F.lit("new"))
        .when(F.col("prev_ws") == F.col("ws") - WEEK_SECS, F.lit("retained"))
        .otherwise(F.lit("resurrected"))
    )
    per_week = seq.groupBy("ws").agg(
        F.count_if(status == "new").cast("long").alias("n_new"),
        F.count_if(status == "retained").cast("long").alias("n_retained"),
        F.count_if(status == "resurrected").cast("long").alias("n_resurrected"),
    )
    max_ws = uw.agg(F.max("ws").alias("__max_ws"))
    churn = (
        seq.crossJoin(F.broadcast(max_ws))
        .filter(
            (F.col("ws") < F.col("__max_ws"))
            & (
                F.col("next_ws").isNull()
                | (F.col("next_ws") > F.col("ws") + WEEK_SECS)
            )
        )
        .groupBy((F.col("ws") + WEEK_SECS).alias("ws"))
        .agg(F.count("*").cast("long").alias("n_churned"))
    )
    # FULL outer: a week can have churn but zero actives (total collapse)
    # — dropping that row would hide exactly the signal this exists for
    return (
        per_week.join(churn, "ws", "full_outer")
        .select(
            "ws",
            *[
                F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)
                for c in ("n_new", "n_retained", "n_resurrected", "n_churned")
            ],
        )
    )


def attribution_models(
    pairs: DataFrame, channel_col: str = "channel"
) -> DataFrame:
    """Multi-touch attribution over (purchase, view) pairs: credit each
    purchase's cents to its touch channels under the three standard
    models at once —

    - FIRST touch: everything to the earliest view in the window,
    - LAST touch: everything to the latest view,
    - LINEAR: cents DIV n per view, with the integer remainder assigned
      to the first touch (stated tie-break; keeps every model's total
      exactly equal to total attributed revenue — floats would leak
      cents).

    ``pairs`` is the attribution join output (one row per purchase ×
    in-window view — streaming.ops._attribution's shape) plus a channel
    column. Earliest/latest = (lag_sec DESC/ASC, view_id) — total order,
    deterministic under same-second views.

    Returns per channel: (channel, n_first, first_cents, n_last,
    last_cents, linear_cents).

    Scale shape: ONE window pass over the pair frame partitioned by
    purchase_id (rn + count in the same partition ordering; last touch
    is rn == n, no second sort), then one map-side-combined groupBy on
    the channel. Pairs per purchase are bounded by views-per-user-window
    — the join's own fan-out bound.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("purchase_id").orderBy(
        F.col("lag_sec").desc(), F.col("view_id")
    )
    flagged = (
        pairs.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count("*").over(Window.partitionBy("purchase_id")))
        .withColumn("__first", F.col("__rn") == 1)
        .withColumn("__last", F.col("__rn") == F.col("__n"))
        .withColumn(
            "__linear",
            F.expr("purchase_cents div __n")
            + F.when(
                F.col("__first"), F.expr("purchase_cents % __n")
            ).otherwise(F.lit(0)),
        )
    )
    zero = F.lit(0).cast("long")
    return flagged.groupBy(F.col(channel_col).alias("channel")).agg(
        F.sum(F.when(F.col("__first"), 1).otherwise(0))
        .cast("long")
        .alias("n_first"),
        F.coalesce(
            F.sum(F.when(F.col("__first"), F.col("purchase_cents"))), zero
        )
        .cast("long")
        .alias("first_cents"),
        F.sum(F.when(F.col("__last"), 1).otherwise(0))
        .cast("long")
        .alias("n_last"),
        F.coalesce(
            F.sum(F.when(F.col("__last"), F.col("purchase_cents"))), zero
        )
        .cast("long")
        .alias("last_cents"),
        F.sum("__linear").cast("long").alias("linear_cents"),
    )


def seasonal_profile(events: DataFrame) -> DataFrame:
    """Hour-of-week seasonal composition drift: per event type, compare
    the traffic DISTRIBUTION over the 168 hour-of-week slots in the
    trailing 7 days against the baseline distribution from everything
    before — the seasonal complement to ``event_anomaly`` (which flags
    level spikes on a trailing window but is blind to "Tuesday 9am
    volume moved to Saturday 3am", the shape change this surfaces).

    Slot arithmetic is epoch-based and engine-portable:
    ``dow = (epoch_day + 4) % 7`` (1970-01-01 was a Thursday; 0=Thu) and
    ``how = dow·24 + hour`` — never the engines' divergent
    dayofweek()/weekday() conventions. Each side's distribution is an
    exact integer permille of that side's own total, so the delta is a
    pure composition signal, independent of overall volume growth.

    Scale shape: one scalar max(ts) aggregate (broadcast back as a
    1-row cross join), then ONE map-side-combined groupBy of raw events
    to (type, how, side) counts; the permille normalization runs over
    the tiny (type × 168)-slot frame via per-type totals. No windows
    over raw events.

    Returns (event_type, how, base_n, cur_n, base_permille,
    cur_permille, delta_permille) for every observed (type, slot).
    """
    es = F.unix_timestamp("ts").cast("long")
    mx = events.agg(F.max(es).alias("max_es"))
    # integer div end-to-end (not floor of a double quotient): matches
    # the oracle's `//` exactly, including on pre-1970 negative epochs
    # where floor and truncation diverge (review finding)
    how = F.expr(
        "(((es div 86400) + 4) % 7) * 24 + (es % 86400) div 3600"
    ).cast("long")
    slotted = (
        events.select(es.alias("es"), "event_type")
        .crossJoin(F.broadcast(mx))
        .select(
            "event_type",
            how.alias("how"),
            (F.col("es") >= F.col("max_es") - 7 * 86400).alias("cur"),
        )
        .groupBy("event_type", "how")
        .agg(
            F.sum(F.when(~F.col("cur"), 1).otherwise(0))
            .cast("long")
            .alias("base_n"),
            F.sum(F.when(F.col("cur"), 1).otherwise(0))
            .cast("long")
            .alias("cur_n"),
        )
    )
    tot = Window.partitionBy("event_type")
    return (
        slotted.withColumn("bt", F.sum("base_n").over(tot))
        .withColumn("ct", F.sum("cur_n").over(tot))
        .select(
            "event_type",
            "how",
            "base_n",
            "cur_n",
            F.expr(
                "CASE WHEN bt > 0 THEN (base_n * 1000) div bt ELSE 0 END"
            )
            .cast("long")
            .alias("base_permille"),
            F.expr(
                "CASE WHEN ct > 0 THEN (cur_n * 1000) div ct ELSE 0 END"
            )
            .cast("long")
            .alias("cur_permille"),
        )
        .withColumn(
            "delta_permille",
            (F.col("cur_permille") - F.col("base_permille")).cast("long"),
        )
    )


WFUNNEL_HORIZON_S = 72 * 3600


def window_funnel(
    events: DataFrame,
    stages: tuple[str, ...] = ("signup", "view", "purchase"),
    horizon_s: int = WFUNNEL_HORIZON_S,
) -> DataFrame:
    """ClickHouse-style windowFunnel: per user, the longest ORDERED
    prefix of ``stages`` completed within ``horizon_s`` of some stage-0
    anchor event — the anchored-window semantics product analytics
    wants ("converted within 72h of signup"), where the plain
    ``funnel_conversion`` (global min-timestamp cascade) would credit a
    purchase made months after an unrelated signup.

    Boundary semantics (pinned, matching ClickHouse): the horizon is
    INCLUSIVE — an event landing exactly at ``anchor + horizon_s``
    counts (ClickHouse admits events within <= window of the anchor);
    inter-stage ordering is strictly increasing, i.e. ClickHouse's
    ``strict_increase`` mode (same-timestamp stage pairs don't chain).

    Mechanics: every stage-0 event is an anchor; stage k's earliest
    completion per anchor is one equi-join on user_id with the
    (t > prev, t <= anchor + horizon) residual, then a min-aggregate —
    k−1 bounded joins total, all shuffling on user_id. Per-anchor
    fan-out is the user's stage-k event count inside one horizon —
    bounded by per-user activity, the same assumption every
    sessionizer here makes. The per-user best is one final groupBy.

    Returns (user_id, steps) with steps ∈ [1, len(stages)] — users with
    no stage-0 event are absent.
    """
    es = F.unix_timestamp("ts").cast("long")
    by_stage = [
        events.filter(F.col("event_type") == s)
        .select("user_id", es.alias(f"t{i}"))
        .distinct()
        for i, s in enumerate(stages)
    ]
    anchors = by_stage[0].withColumn("deadline", F.col("t0") + horizon_s)
    cur = anchors
    for i in range(1, len(stages)):
        nxt = by_stage[i]
        joined = cur.join(nxt, "user_id").filter(
            (F.col(f"t{i}") > F.col(f"t{i-1}"))
            & (F.col(f"t{i}") <= F.col("deadline"))
        )
        best = joined.groupBy("user_id", "t0").agg(
            F.min(f"t{i}").alias(f"t{i}")
        )
        keys = ["user_id", "t0", "deadline"] + [f"t{j}" for j in range(1, i)]
        cur = (
            cur.join(best.withColumnRenamed(f"t{i}", f"__n{i}"),
                     ["user_id", "t0"], "left")
            .select(*keys, F.col(f"__n{i}").alias(f"t{i}"))
        )
    steps = F.lit(1)
    for i in range(1, len(stages)):
        steps = F.when(F.col(f"t{i}").isNotNull(), i + 1).otherwise(steps)
    return (
        cur.select("user_id", steps.cast("long").alias("s"))
        .groupBy("user_id")
        .agg(F.max("s").cast("long").alias("steps"))
    )


def funnel_steps_inmem(
    evs,
    n_stages: int,
    horizon_s: int,
    final_before: int | None = None,
) -> tuple[int, int]:
    """The ``window_funnel`` kernel over an in-memory set of
    ``(stage_idx, ts_seconds)`` pairs — per-anchor greedy-earliest with
    the same boundary semantics as the distributed form (strictly-later
    inter-stage, INCLUSIVE horizon). This is ONE USER's state inside
    ``streaming.ops.window_funnel_stream`` (bounded by per-user activity
    in the horizon, never corpus-sized) and doubles as the reference
    model shared with the property test.

    Returns ``(best_all, best_final)``: best steps over all anchors,
    and over only anchors whose inclusive window closed strictly before
    ``final_before`` (the stream's watermark — those can never improve,
    so the caller folds them into a scalar and prunes their events).
    Users with no stage-0 event score 0 (the batch op omits them).
    """
    by_stage = [
        sorted({t for s, t in evs if s == k}) for k in range(n_stages)
    ]
    best_all = 0
    best_final = 0
    for t0 in by_stage[0]:
        prev, steps = t0, 1
        for k in range(1, n_stages):
            nxt = [
                t for t in by_stage[k] if t > prev and t <= t0 + horizon_s
            ]
            if not nxt:
                break
            prev = min(nxt)
            steps += 1
        best_all = max(best_all, steps)
        if final_before is not None and t0 + horizon_s < final_before:
            best_final = max(best_final, steps)
    return best_all, best_final


PATHS_TOPK = 50


def event_paths(events: DataFrame, k: int = PATHS_TOPK) -> DataFrame:
    """Second-order path census — the (prev2 → prev1 → next) trigram
    counts and within-context probabilities that first-order
    ``event_transitions`` can't see ("view→purchase happens, but only
    when a signup came before"): the product-analytics path explorer
    and the second-order Markov model in one frame.

    Same scale contract as event_transitions: ONE window shuffle on
    user_id (two lags share the single (ts, event_id) ordering), then a
    groupBy whose result is ≤ |types|³ rows — the context normalization
    runs over THAT tiny frame, never raw events; the final top-k
    compiles to TakeOrderedAndProject.

    Returns (prev2_type, prev1_type, event_type, n, p_permille) — the k
    most frequent trigrams by (n desc, then the triple ascending);
    p_permille = floor(1000·n / Σn over the same (prev2, prev1)
    context).
    """
    es = F.unix_timestamp("ts").cast("long")
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    tri = (
        events.select("user_id", "event_id", "event_type", es.alias("es"))
        .withColumn("prev1_type", F.lag("event_type", 1).over(w))
        .withColumn("prev2_type", F.lag("event_type", 2).over(w))
        .filter(F.col("prev2_type").isNotNull())
    )
    counts = tri.groupBy("prev2_type", "prev1_type", "event_type").agg(
        F.count("*").cast("long").alias("n")
    )
    ctx = Window.partitionBy("prev2_type", "prev1_type")
    scored = counts.select(
        "prev2_type",
        "prev1_type",
        "event_type",
        "n",
        F.expr("(n * 1000)").cast("long").alias("__n1000"),
        F.sum("n").over(ctx).cast("long").alias("__ctx"),
    ).select(
        "prev2_type",
        "prev1_type",
        "event_type",
        "n",
        F.expr("__n1000 div __ctx").cast("long").alias("p_permille"),
    )
    return scored.orderBy(
        F.col("n").desc(),
        F.col("prev2_type").asc(),
        F.col("prev1_type").asc(),
        F.col("event_type").asc(),
    ).limit(k)
