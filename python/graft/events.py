"""Event-stream analytics: sessionization, funnels, cohort retention."""

from ._java import ctx, lift, to_seq


def sessionize(df, gap_us, key="user_id", ts="ts_us"):
    """Adds session_no: a new session starts after a gap > gap_us."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.events.EventOps.sessionize(
        df._jdf, int(gap_us), key, ts))


def sessions(df, gap_us, key="user_id", ts="ts_us", value="value"):
    """One row per (key, session): bounds, duration, counts, value sum."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.events.EventOps.sessions(
        df._jdf, int(gap_us), key, ts, value))


def funnel(df, steps, key="user_id", ts="ts_us", event_type="event_type"):
    """Strictly-ordered funnel: step times t_1..t_n + reached count."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.events.EventOps.funnel(
        df._jdf, to_seq(jvm, [str(s) for s in steps]), key, ts, event_type))


def retention(df, key="user_id", ts="ts_us"):
    """Cohort retention grid: (cohort day, day offset) -> distinct users."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.events.EventOps.retention(df._jdf, key, ts))


def transitions(df, gap_us, key="user_id", ts="ts_us",
                event_type="event_type"):
    """Within-session event-type Markov table: counts + mean gaps (us)."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.events.EventOps.transitions(
        df._jdf, int(gap_us), key, ts, event_type))


def inter_event_stats(df, key="user_id", ts="ts_us",
                      event_type="event_type"):
    """Idle-gap distribution per event type (gap goes to the later event)."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.events.EventOps.interEventStats(
        df._jdf, key, ts, event_type))


def bursts(df, window_us, key="user_id", ts="ts_us"):
    """Peak event count in any trailing window_us time window per key."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.events.EventOps.bursts(
        df._jdf, int(window_us), key, ts))


def stickiness(df, key="user_id", ts="ts_us"):
    """DAU/WAU engagement stickiness per 7-epoch-day window."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.events.EventOps.stickiness(df._jdf, key, ts))


def top_paths(df, gap_us, n=3, k=20, key="user_id", ts="ts_us",
              event_type="event_type", event_id="event_id"):
    """Top-k first-n-event session paths (deterministic tie-break)."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.events.EventOps.topPaths(
        df._jdf, int(gap_us), int(n), int(k), key, ts, event_type, event_id))


def decay_score(df, half_life_us, key="user_id", ts="ts_us", value="value"):
    """Exponential-decay recency score per key: sum(value * 2^(-age/half_life)),
    age from the global latest event (feature-store activity score)."""
    from ._java import ctx, lift
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.api.java.JavaPipelineOps.decayScore(
        df._jdf, int(half_life_us), key, ts, value))


def conversion_latency(df, from_type, to_type, key="user_id", ts="ts_us",
                       event_type="event_type"):
    """First-A -> first-later-B latency distribution: starters, converters,
    conversion rate, exact latency percentiles (p25/50/75/90, us)."""
    spark, jvm = ctx(df)
    return lift(spark, jvm.graft.api.java.JavaPipelineOps.conversionLatency(
        df._jdf, from_type, to_type, key, ts, event_type))


def interval_join(points, intervals, bucket_us=0, key="user_id", ts="ts_us",
                  start="start_us", end="end_us"):
    """Point-in-interval join via time bucketing: an equi-join on
    (key, bucket) + exact containment filter instead of the nested-loop
    theta join. bucket_us=0 (default) sizes the bucket from the data
    (longest interval length, fan-out <= 2 exploded rows per interval);
    pass an explicit bucket only for heavily skewed interval lengths —
    a bucket far below the longest interval is a silent fan-out blow-up."""
    spark, jvm = ctx(points)
    return lift(spark, jvm.graft.events.EventOps.intervalJoin(
        points._jdf, intervals._jdf, int(bucket_us), key, ts, start, end))
