"""Ordered-event funnel analysis over the events table — beyond-reference
analytics surface (the reference has no event semantics; this extends the
sessionize/as-of family).

"How many users did view → click → purchase, in order, within W of the
first step?"  Stage matching is GREEDY-EARLIEST with the window anchored
at the user's first occurrence of step 0 — the standard funnel
definition (and provably optimal here: taking the earliest qualifying
event at each stage maximizes the room left for later stages).

Plan shape: filter to the step types (tiny fraction of events — pushed
to the scan), one shuffle on the user key, then a pure JVM
``array_sort`` + ``aggregate`` scan over each user's bounded step-event
array.  No window function, no Python; per-user arrays hold only
funnel-relevant events, the usual cardinality assumption of every
funnel engine.  The DuckDB oracle implements the SAME semantics as a
chain of anchored min-aggregations — an independent algorithm, so a
value match checks the semantics, not the code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _step_index(type_col: str, steps: list[str]):
    expr = F.lit(None).cast("int")
    for i, s in reversed(list(enumerate(steps))):
        expr = F.when(F.col(type_col) == s, F.lit(i)).otherwise(expr)
    return expr


def funnel_users(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    within_seconds: int | None = None,
    max_events_per_user: int | None = 100_000,
) -> DataFrame:
    """Per-user funnel depth: (user, max_stage) where ``max_stage`` = how
    many consecutive steps were completed in order (0..len(steps)).
    Users with no step-0 event appear with stage 0 only if they have ANY
    step event; users with no step events at all are absent (join against
    the user dimension if you need zeros for everyone).

    ``max_events_per_user`` bounds the per-user array a hot key (bot
    traffic) can collect: the cap keeps each user's EARLIEST events via
    the skew-safe two-stage cut (`plans.topk.partial_topk` — no single
    task ever sees the hot user's full history), and since greedy
    matching anchored at the first step only ever advances on earliest
    qualifying events, truncating the latest tail can only lose stages
    completed beyond the cap — the documented trade for bounded memory
    at 100 TB.  Pass ``None`` to disable.
    """
    if len(set(steps)) != len(steps) or not steps:
        raise ValueError("steps must be a non-empty list of distinct types")
    n = len(steps)
    w_us = None if within_seconds is None else int(within_seconds) * 1_000_000

    ev = events.where(F.col(type_col).isin(steps)).select(
        F.col(user_col),
        F.unix_micros(F.col(ts_col)).alias("__t"),
        _step_index(type_col, steps).alias("__idx"),
    )
    if max_events_per_user is not None:
        from paradump_spark.plans.topk import partial_topk

        ev = partial_topk(
            ev,
            [user_col],
            [F.col("__t").asc(), F.col("__idx").asc()],
            max_events_per_user,
        )
    collected = F.array_sort(F.collect_list(F.struct("__t", "__idx")))
    if max_events_per_user is not None:
        # the partial cut kept a SUPERSET of the global earliest-n, so
        # slicing the sorted array gives exactly the earliest n events —
        # deterministic whatever the input partitioning
        collected = F.slice(collected, 1, max_events_per_user)
    seq = ev.groupBy(user_col).agg(collected.alias("__seq"))
    zero = F.struct(
        F.lit(0).cast("int").alias("stage"),
        F.lit(None).cast("long").alias("start"),
    )

    def advance(acc, e):
        can = (acc["stage"] < n) & (e["__idx"] == acc["stage"])
        if w_us is not None:
            can = can & ((acc["stage"] == 0) | (e["__t"] <= acc["start"] + w_us))
        return F.when(
            can,
            F.struct(
                (acc["stage"] + 1).cast("int").alias("stage"),
                F.when(acc["stage"] == 0, e["__t"])
                .otherwise(acc["start"])
                .cast("long")
                .alias("start"),
            ),
        ).otherwise(acc)

    return seq.select(
        F.col(user_col),
        F.aggregate(F.col("__seq"), zero, advance)["stage"]
        .cast("long")
        .alias("max_stage"),
    )


def funnel_report(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    within_seconds: int | None = None,
) -> DataFrame:
    """Corpus rollup: one row per step with the user count that reached
    at least that stage plus the conversion rate from stage 1.  Tiny
    second aggregation over the per-user depths."""
    depths = funnel_users(
        events, user_col, ts_col, type_col, steps, within_seconds
    )
    # ONE aggregation computes every stage's user count (conditional sums
    # partial-combine map-side); the per-stage rows then explode out of
    # the single result row — no re-scan per stage.
    one = depths.agg(
        *[
            F.sum((F.col("max_stage") >= i + 1).cast("long")).alias(f"__n{i}")
            for i in range(len(steps))
        ]
    )
    stages = F.array(
        *[
            F.struct(
                F.lit(i + 1).cast("long").alias("stage"),
                F.lit(s).alias("step"),
                F.coalesce(F.col(f"__n{i}"), F.lit(0)).cast("long").alias(
                    "n_users"
                ),
            )
            for i, s in enumerate(steps)
        ]
    )
    first = F.coalesce(F.col("__n0"), F.lit(0))
    return one.select(
        F.explode(stages).alias("s"), first.alias("__first")
    ).select(
        F.col("s.stage").alias("stage"),
        F.col("s.step").alias("step"),
        F.col("s.n_users").alias("n_users"),
        F.round(
            F.when(
                F.col("__first") > 0, F.col("s.n_users") / F.col("__first")
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("conversion"),
    )


def event_transitions(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    order_col: str | None = None,
) -> DataFrame:
    """Markov transition matrix of consecutive events per user:
    (from_type, to_type, n, prob) with ``prob`` normalized over each
    ``from_type`` row.

    One user-keyed window (``lead`` over (ts, tiebreak)) — a user's
    events sort within their own partition slice, the standard sessions
    shape — then a tiny (|types|²)-row aggregation.  Pass ``order_col``
    (e.g. an event id) to make same-timestamp ordering deterministic.
    """
    from pyspark.sql import Window

    order = [F.col(ts_col)]
    if order_col:
        order.append(F.col(order_col))
    w = Window.partitionBy(user_col).orderBy(*order)
    pairs = (
        events.select(
            F.col(type_col).alias("from_type"),
            F.lead(F.col(type_col)).over(w).alias("to_type"),
        )
        .where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(totals), 6).alias("prob"),
    )


def oracle_event_transitions_sql(
    table: str,
    user_col: str,
    ts_col: str,
    type_col: str,
    order_col: str | None = None,
) -> str:
    """DuckDB oracle for :func:`event_transitions`."""
    order = f"{ts_col}" + (f", {order_col}" if order_col else "")
    return f"""
WITH p AS (
  SELECT {type_col} AS from_type,
         lead({type_col}) OVER (PARTITION BY {user_col} ORDER BY {order})
           AS to_type
  FROM {table}
), c AS (
  SELECT from_type, to_type, count(*) AS n
  FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
       round(CAST(n AS DOUBLE)
             / sum(n) OVER (PARTITION BY from_type), 6) AS prob
FROM c"""


def retention_cohorts(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    period_days: int = 7,
    max_periods: int = 8,
) -> DataFrame:
    """Cohort retention: users grouped by first-seen period, then for each
    later period the fraction of the cohort still active.

    Two aggregations: min-ts per user (partial map-side) defines the
    cohort; a co-keyed join back to the events (both sides hash on the
    user) buckets every event into (cohort, periods-since-cohort); one
    final count-distinct rollup.  ``period_days`` buckets count from the
    cohort's own anchor (the user's first event), the standard product
    analytics definition.
    """
    if period_days <= 0 or max_periods <= 0:
        raise ValueError("period_days and max_periods must be positive")
    p_us = period_days * 86_400 * 1_000_000
    ev = events.select(
        F.col(user_col), F.unix_micros(F.col(ts_col)).alias("__t")
    )
    first = ev.groupBy(user_col).agg(F.min("__t").alias("__t0"))
    cohort = F.to_date(
        F.timestamp_micros((F.floor(F.col("__t0") / p_us) * p_us).cast("long"))
    )
    marked = ev.join(first, user_col).select(
        F.col(user_col),
        cohort.alias("cohort"),
        F.floor((F.col("__t") - F.col("__t0")) / p_us)
        .cast("long")
        .alias("period"),
    )
    sizes = marked.where(F.col("period") == 0).groupBy("cohort").agg(
        F.count_distinct(F.col(user_col)).alias("cohort_size")
    )
    active = (
        marked.where(F.col("period") < max_periods)
        .groupBy("cohort", "period")
        .agg(F.count_distinct(F.col(user_col)).alias("n_active"))
    )
    return (
        active.join(sizes, "cohort")
        .select(
            "cohort",
            "period",
            "n_active",
            "cohort_size",
            F.round(F.col("n_active") / F.col("cohort_size"), 6).alias(
                "retention"
            ),
        )
    )


def oracle_retention_sql(
    table: str,
    user_col: str,
    ts_col: str,
    period_days: int = 7,
    max_periods: int = 8,
) -> str:
    """DuckDB oracle for :func:`retention_cohorts`."""
    p_us = period_days * 86_400 * 1_000_000
    return f"""
WITH ev AS (SELECT {user_col} AS u, epoch_us({ts_col}) AS t FROM {table}),
f AS (SELECT u, min(t) AS t0 FROM ev GROUP BY u),
m AS (SELECT ev.u,
             CAST(make_timestamp((t0 // {p_us}) * {p_us}) AS DATE) AS cohort,
             (t - t0) // {p_us} AS period
      FROM ev JOIN f USING (u)),
sizes AS (SELECT cohort, count(DISTINCT u) AS cohort_size
          FROM m WHERE period = 0 GROUP BY cohort),
act AS (SELECT cohort, period, count(DISTINCT u) AS n_active
        FROM m WHERE period < {max_periods} GROUP BY cohort, period)
SELECT act.cohort, CAST(period AS BIGINT) AS period,
       CAST(n_active AS BIGINT) AS n_active,
       CAST(cohort_size AS BIGINT) AS cohort_size,
       round(CAST(n_active AS DOUBLE) / cohort_size, 6) AS retention
FROM act JOIN sizes USING (cohort)"""


def _oracle_chain_ctes(
    table: str,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    within_seconds: int | None,
) -> str:
    """Shared CTE chain: ev + s1..sN anchored min-aggregations."""
    q = lambda s: s.replace("'", "''")  # noqa: E731
    w_us = None if within_seconds is None else int(within_seconds) * 1_000_000
    ctes = [
        f"""ev AS (
  SELECT {user_col} AS u, epoch_us({ts_col}) AS t,
         {type_col} AS typ
  FROM {table}
  WHERE {type_col} IN ({", ".join(f"'{q(s)}'" for s in steps)})
)""",
        f"""s1 AS (
  SELECT u, min(t) AS t1 FROM ev WHERE typ = '{q(steps[0])}' GROUP BY u
)""",
    ]
    prev = "s1"
    for i, s in enumerate(steps[1:], start=2):
        cond = f"ev.t >= {prev}.t{i-1}"
        if w_us is not None:
            cond += f" AND ev.t <= s1.t1 + {w_us}"
        joins = f"JOIN {prev} USING (u)"
        if prev != "s1":
            joins += " JOIN s1 USING (u)"
        ctes.append(
            f"""s{i} AS (
  SELECT ev.u AS u, min(ev.t) AS t{i}
  FROM ev {joins}
  WHERE ev.typ = '{q(s)}' AND {cond}
  GROUP BY ev.u
)"""
        )
        prev = f"s{i}"
    return ",\n".join(ctes)


def oracle_funnel_report_sql(
    table: str,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    within_seconds: int | None = None,
) -> str:
    """DuckDB oracle with an INDEPENDENT semantics implementation:
    anchored chain-of-min aggregations (t_{i+1} = min event of step i+1
    at/after t_i, within the window of t_0) — a value match checks the
    funnel semantics, not a re-run of the same algorithm."""
    q = lambda s: s.replace("'", "''")  # noqa: E731
    chain = _oracle_chain_ctes(
        table, user_col, ts_col, type_col, steps, within_seconds
    )
    selects = [
        f"SELECT {i} AS stage, '{q(s)}' AS step,"
        f" (SELECT count(*) FROM s{i}) AS n_users"
        for i, s in enumerate(steps, start=1)
    ]
    return (
        "WITH " + chain + "\n, stages AS (\n"
        + "\nUNION ALL\n".join(selects)
        + """
)
SELECT CAST(stage AS BIGINT) AS stage, step,
       CAST(n_users AS BIGINT) AS n_users,
       round(CASE WHEN (SELECT n_users FROM stages WHERE stage = 1) > 0
                  THEN CAST(n_users AS DOUBLE)
                       / (SELECT n_users FROM stages WHERE stage = 1)
                  ELSE 0.0 END, 6) AS conversion
FROM stages"""
    )


def oracle_funnel_users_sql(
    table: str,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    within_seconds: int | None = None,
) -> str:
    """DuckDB oracle for :func:`funnel_users` (same chain CTEs)."""
    chain = _oracle_chain_ctes(
        table, user_col, ts_col, type_col, steps, within_seconds
    )
    case = " ".join(
        f"WHEN u IN (SELECT u FROM s{i}) THEN {i}"
        for i in range(len(steps), 0, -1)
    )
    return (
        "WITH " + chain + f"""
SELECT u AS {user_col},
       CAST(CASE {case} ELSE 0 END AS BIGINT) AS max_stage
FROM (SELECT DISTINCT u FROM ev)"""
    )
