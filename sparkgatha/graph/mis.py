"""Maximal independent set via deterministic Luby rounds, and the
greedy coloring built on it (SURVEY.md §2.11 G29/G29b).

MIS is the classic symmetry-breaking primitive (Luby 1986): the
standard way to pick a non-conflicting vertex subset in parallel —
scheduling independent updates, seeding cluster centers, or thinning a
near-duplicate graph to representatives no two of which are adjacent.

Rule (pinned, engine-independent): in round r an ACTIVE vertex joins
the MIS iff its priority is a strict minimum among its active
neighbors, where

    priority_r(v) = ( md5int(v ':' r ':' seed), v )

with ``md5int`` the engine-wide first-15-hex-chars-of-md5 convention
(util.md5_long — the same hash the walk stepper and dedup signatures
use, so DuckDB replays it exactly); the vertex id itself breaks md5
ties, making the winner set unique.  Winners and their neighbors
deactivate; iterate until no active vertex remains.  Fresh priorities
per round give Luby's O(log n) expected round count; at least the
globally-smallest-priority active vertex wins every round, so
termination is unconditional.

Physical shape (the 100 TB story): the priority is a PURE EXPRESSION
of (vertex, round, seed) — no priority table, no priority join.  Per
round: one whole-stage-codegen projection over the active edge set
finds every BLOCKED vertex (the larger-priority endpoint of each
edge), one anti-join yields the winners (isolated actives win by
having no blocking row), one semi-join marks the winners' neighbors,
and a double semi-join (the k-core discipline) shrinks the edge set —
which only ever SHRINKS, geometrically in practice.  Per-round frames
go through ``checkpoint_reset_stats`` (multi-reference rounds,
util.py:60).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from sparkgatha.graph.canon import canonical_undirected
from sparkgatha.util import (
    adaptive_shuffle_partitions,
    checkpoint_reset_stats,
    md5_long,
    no_aqe,
    scoped_shuffle_partitions,
)


def _priority(v: Column, rnd: int, seed: int) -> Column:
    return md5_long(
        F.concat(v.cast("string"), F.lit(f":{rnd}:{seed}"))
    )


def maximal_independent_set(
    edges: DataFrame,
    seed: int = 0,
    max_rounds: int | None = None,
    assume_canonical: bool = False,
    vertices: DataFrame | None = None,
) -> DataFrame:
    """(vertex, round) — the deterministic-Luby MIS members of the
    undirected graph of ``edges`` and the round each joined.

    Self-loops are ignored for adjacency (a loop-only vertex is
    isolated, wins round 1).  ``max_rounds=None`` (default) runs to the
    empty-frontier fixpoint; an integer runs EXACTLY that many rounds
    and stops silently — the oracle-comparison mode (the unrolled SQL
    replay runs the same fixed rounds; MIS growth is monotone, so the
    fixed-round result is a prefix of the fixpoint).

    ``assume_canonical``: the caller guarantees ``edges`` is already
    the distinct canonical src<dst loop-free set with flat lineage
    (k_core's contract) — skips the canonicalization shuffle +
    checkpoint.  ``vertices``: optional pre-built distinct single-
    column ``x`` endpoint universe (must cover the edge endpoints);
    skips the endpoint union+distinct.  Both exist for composition
    (luby_coloring calls this once per color class)."""
    if max_rounds is not None and max_rounds < 1:
        raise ValueError(f"max_rounds must be >= 1, got {max_rounds}")
    spark = edges.sparkSession
    with no_aqe(spark):
        default_p = int(spark.conf.get("spark.sql.shuffle.partitions"))
        if assume_canonical:
            e = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
            pre = None
            entry_p = default_p
        else:
            # r6: one materialization of the (possibly expensive lazy)
            # input — canonicalization and the active-vertex universe
            # each consumed `edges`, re-running its whole upstream plan
            pre = edges.select("src", "dst").localCheckpoint(eager=True)
            entry_p = adaptive_shuffle_partitions(pre.count(), default_p)
            with scoped_shuffle_partitions(spark, entry_p):
                e = checkpoint_reset_stats(canonical_undirected(pre))
        if vertices is not None:
            active = vertices.select("x")
        else:
            src = pre if pre is not None else edges
            with scoped_shuffle_partitions(spark, entry_p):
                active = checkpoint_reset_stats(
                    src.select(F.col("src").alias("x"))
                    .unionByName(src.select(F.col("dst").alias("x")))
                    .distinct()
                )
        mis = None
        rnd = 0
        # r6: full cached counts instead of limit probes — they double
        # as the emptiness test and size each round's exchanges to the
        # CURRENT (geometrically shrinking) frontier; md5 priorities
        # and anti/semi joins are partitioning-independent, so the MIS
        # is bit-identical at any partition count
        n_active = active.count()
        n_e = e.count()
        default_p = int(spark.conf.get("spark.sql.shuffle.partitions"))
        while n_active > 0:
            rnd += 1
            with scoped_shuffle_partitions(
                spark,
                adaptive_shuffle_partitions(max(n_e, n_active), default_p),
            ):
                pu, pv = _priority(F.col("u"), rnd, seed), _priority(
                    F.col("v"), rnd, seed
                )
                u_loses = (pu > pv) | ((pu == pv) & (F.col("u") > F.col("v")))
                # the larger-priority endpoint of every active edge cannot
                # win this round — a pure projection, no join
                blocked = e.select(
                    F.when(u_loses, F.col("u")).otherwise(F.col("v")).alias("x")
                ).distinct()
                winners = checkpoint_reset_stats(
                    active.join(blocked, "x", "left_anti")
                )
                picked = winners.select("x", F.lit(rnd).alias("round"))
                mis = picked if mis is None else mis.unionByName(picked)
                if max_rounds is not None and rnd >= max_rounds:
                    break  # before the shrink: its frames would never be read
                # winners + their neighbors deactivate
                removed = (
                    winners.unionByName(
                        e.join(
                            winners.withColumnRenamed("x", "u"), "u", "left_semi"
                        ).select(F.col("v").alias("x"))
                    )
                    .unionByName(
                        e.join(
                            winners.withColumnRenamed("x", "v"), "v", "left_semi"
                        ).select(F.col("u").alias("x"))
                    )
                    .distinct()
                )
                active = checkpoint_reset_stats(
                    active.join(removed, "x", "left_anti")
                )
                n_active = active.count()
                e = checkpoint_reset_stats(
                    e.join(active.withColumnRenamed("x", "u"), "u", "left_semi")
                    .join(active.withColumnRenamed("x", "v"), "v", "left_semi")
                )
                n_e = e.count()
        if mis is None:
            return active.select(
                F.col("x").alias("vertex"), F.lit(0).alias("round")
            )
        return mis.select(F.col("x").alias("vertex"), "round")


#: colors are bounded by greedy chromatic number ≤ Δ+1; a web-scale
#: co-occurrence graph's MIS-greedy coloring runs a few dozen colors,
#: so 256 only trips on a broken shrink step.  Applies only in
#: fixpoint mode — an explicit max_colors is the caller's bound.
_COLOR_RAIL = 256


def luby_coloring(
    edges: DataFrame,
    seed: int = 0,
    max_colors: int | None = None,
) -> DataFrame:
    """(vertex, color) — a PROPER vertex coloring (no edge
    monochromatic) by iterated deterministic-Luby MIS: color c is the
    MIS of the still-uncolored induced subgraph (seeded ``seed + c`` so
    every color draws fresh priorities), colored vertices drop out,
    repeat until none remain.  The classic parallel scheduling
    primitive: each color class is an independent set whose members can
    be processed concurrently with no neighbor conflicts.

    Deterministic and partitioning-independent (everything reduces to
    the md5 priority rule), so the pure-Python replay in the tests
    matches vertex-for-vertex.  ``max_colors``: integer = stop silently
    after that many classes (prefix semantics, mirroring
    ``maximal_independent_set``'s fixed-round mode); None = run until
    every vertex is colored, with a rail at 256 classes.
    """
    if max_colors is not None and max_colors < 1:
        raise ValueError(f"max_colors must be >= 1, got {max_colors}")
    spark = edges.sparkSession
    with no_aqe(spark):
        # r6: one materialization of the lazy input (see
        # maximal_independent_set — same double-consumption), entry
        # exchanges sized to the materialized input
        pre = edges.select("src", "dst").localCheckpoint(eager=True)
        entry_p = adaptive_shuffle_partitions(
            pre.count(),
            int(spark.conf.get("spark.sql.shuffle.partitions")),
        )
        with scoped_shuffle_partitions(spark, entry_p):
            e = checkpoint_reset_stats(canonical_undirected(pre))
            remaining = checkpoint_reset_stats(
                pre.select(F.col("src").alias("x"))
                .unionByName(pre.select(F.col("dst").alias("x")))
                .distinct()
            )
        colored = None
        c = 0
        # r6: cached full counts replace the limit probes and size the
        # per-class exchanges to the shrinking uncolored subgraph (see
        # maximal_independent_set — same exactness argument)
        n_remaining = remaining.count()
        n_e = e.count()
        default_p = int(spark.conf.get("spark.sql.shuffle.partitions"))
        while n_remaining > 0:
            c += 1
            if max_colors is None and c > _COLOR_RAIL:
                raise RuntimeError(
                    f"coloring exceeded {_COLOR_RAIL} classes — the "
                    "uncolored subgraph is not shrinking (shrink-step "
                    "bug), not a legitimately dense graph"
                )
            with scoped_shuffle_partitions(
                spark,
                adaptive_shuffle_partitions(
                    max(n_e, n_remaining), default_p
                ),
            ):
                # endpoint universe of the surviving edge set, built ONCE
                # per class and shared with the MIS call
                eps = checkpoint_reset_stats(
                    e.select(F.col("u").alias("x"))
                    .unionByName(e.select(F.col("v").alias("x")))
                    .distinct()
                )
                mis = maximal_independent_set(
                    e.select(F.col("u").alias("src"), F.col("v").alias("dst")),
                    seed=seed + c,
                    assume_canonical=True,
                    vertices=eps,
                ).select("vertex")
                # isolated uncolored vertices never appear in e — they are
                # trivially independent, so the whole remainder joins this
                # class alongside the MIS of the edged part
                isolated = remaining.join(eps, "x", "left_anti")
                cls = checkpoint_reset_stats(
                    mis.withColumnRenamed("vertex", "x").unionByName(isolated)
                )
                picked = cls.select("x", F.lit(c).alias("color"))
                colored = (
                    picked if colored is None else colored.unionByName(picked)
                )
                if max_colors is not None and c >= max_colors:
                    break  # before the shrink: its frames would never be read
                remaining = checkpoint_reset_stats(
                    remaining.join(cls, "x", "left_anti")
                )
                n_remaining = remaining.count()
                e = checkpoint_reset_stats(
                    e.join(remaining.withColumnRenamed("x", "u"), "u", "left_semi")
                    .join(remaining.withColumnRenamed("x", "v"), "v", "left_semi")
                )
                n_e = e.count()
        if colored is None:
            return remaining.select(
                F.col("x").alias("vertex"), F.lit(0).alias("color")
            )
        return colored.select(F.col("x").alias("vertex"), "color")
