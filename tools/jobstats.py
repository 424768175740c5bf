"""Per-query Spark job-count / shuffle-bytes observability (VERDICT r11
directive 8): wrap a timed callable in a job group and read the counts
back from the AppStatusStore — the same store the UI/REST API serve, but
available with ``spark.ui.enabled=false`` too.

Why a store read and not a listener: PySpark cannot register a
SparkListener without shipping a JVM class; the status store is already
maintained by AppStatusListener for every application, so reading it
adds zero overhead to the timed region.

Used by bench.py (per-query ``jobs`` / ``shuffle_bytes`` in the sidecar
detail) and by ad-hoc step profiling during optimization rounds — the
"fewer Spark jobs" claims of the round-12 media/dedup work are checked
against these numbers by a pytest (tests/test_jobcount.py).
"""

from __future__ import annotations


def job_group_stats(spark, group: str) -> dict:
    """Job count + shuffle bytes for every job submitted under
    ``group`` (``sc.setJobGroup``/``setLocalProperty('spark.jobGroup.id')``).

    Returns ``{"jobs": int, "shuffle_write": int, "shuffle_read": int}``.
    Shuffle bytes are summed over the DISTINCT stages of those jobs
    (a stage shared by two jobs — skipped/reused exchanges — counts
    once).  Never raises: on any py4j/store surprise it returns -1
    markers so the bench keeps its never-sink contract.
    """
    try:
        store = spark.sparkContext._jsc.sc().statusStore()
        jobs = store.jobsList(None)
        stage_ids: set[int] = set()
        n_jobs = 0
        for i in range(jobs.size()):
            j = jobs.apply(i)
            g = j.jobGroup()
            if g.isDefined() and g.get() == group:
                n_jobs += 1
                sids = j.stageIds()
                for k in range(sids.size()):
                    stage_ids.add(sids.apply(k))
        sread = swrite = 0
        for sid in stage_ids:
            try:
                s = store.lastStageAttempt(int(sid))
            except Exception:  # noqa: BLE001 — skipped stage, no attempt data
                continue
            swrite += s.shuffleWriteBytes()
            sread += s.shuffleReadBytes()
        return {"jobs": n_jobs, "shuffle_write": int(swrite),
                "shuffle_read": int(sread)}
    except Exception:  # noqa: BLE001 — observability must never sink a run
        return {"jobs": -1, "shuffle_write": -1, "shuffle_read": -1}


class job_group:
    """Context manager: run the body under a job group id, then expose
    ``.stats`` (see :func:`job_group_stats`).

    >>> with job_group(spark, "bench_q1") as jg:
    ...     df.count()
    >>> jg.stats["jobs"]
    """

    def __init__(self, spark, group: str):
        self._spark = spark
        self._group = group
        self.stats: dict = {}

    def __enter__(self):
        self._spark.sparkContext.setLocalProperty(
            "spark.jobGroup.id", self._group
        )
        return self

    def __exit__(self, *exc):
        self._spark.sparkContext.setLocalProperty("spark.jobGroup.id", None)
        self.stats = job_group_stats(self._spark, self._group)
        return False
