"""G10/J9 — explicit skew handling: hot-vertex mirroring + salted joins
(SURVEY.md §2.11 G10, §2.3 J9).

Reference analog: AGATHA's hub terms (ubiquitous lemmas / common code
identifiers in the graft) are super-nodes; the reference controls them
*semantically* with frequency cutoffs before graph construction
(SURVEY.md §4.1) — extract.extract_cooccurrence_edges(max_df=...) keeps
that lever.  At 10^12-file scale cutoffs alone don't suffice, so the
north rule adds *mechanical* mitigation: "degree-skew hot vertices are
split via high-degree vertex mirroring before the shuffle".

Two algebraically-exact tools (results identical with skew handling on
or off — test layer L7):

 * ``salted_agg`` — two-level aggregation: rows of a hot key first
   aggregate under (key, salt) across K partitions, then the K partials
   combine.  Exact for any algebraic agg (sum/min/max/count).  Note
   Spark's own map-side partial aggregation already bounds reduce skew
   for these; salting matters when the *map-side hash table* degrades
   or for high-cardinality composite aggs.

 * ``mirrored_join`` — broadcast the hot keys' build rows (they are few
   keys × small payload), shuffle-join only the cold remainder, union.
   The hot side never hits a shuffle partition at all — "mirroring": the
   hub's state is replicated to every executor instead of gathering the
   hub's edges onto one reducer.  AQE's skewJoin splits oversized
   partitions too (enabled in session.py); this is the deterministic,
   plan-visible variant.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

log = logging.getLogger(__name__)


@dataclass
class HotSrcSplit:
    """Result of :func:`split_hot_srcs` — the shuffle-strategy G10
    layout shared by PageRank and LPA."""

    cold: DataFrame                 # hash(src) layout, persisted
    hot: DataFrame | None           # (src, salt) layout, persisted
    hot_srcs: DataFrame | None      # ≤HOT_MIRROR_CAP rows (src)
    hot_w: DataFrame | None         # (src, out_w) for the hot set
    n_edges: int
    hot_threshold: int


def split_hot_srcs(
    pre: DataFrame,
    num_partitions: int,
    hot_threshold: int | None = None,
    hot_mirror_cap: int = 10_000,
    map_cold=None,
    map_hot=None,
    persist_input: bool | None = None,
) -> HotSrcSplit:
    """Shuffle-strategy G10 treatment, shared by PageRank and LPA (was
    duplicated line-for-line; one copy keeps the threshold rule, cap
    handling, and salt formula in sync).

    Detects hot SOURCE vertices (out-degree > threshold, default
    edges/partitions/4 with a 16384 floor, capped at ``hot_mirror_cap``
    with a logged warning), salts their edges across all partitions via
    ``pmod(xxhash64(src,dst,weight), P)``, hash(src)-partitions the cold
    remainder, and persists+materializes both layouts.

    ``pre`` (src, dst, weight) is persisted HERE before the stats and
    layout builds (it used to be re-scanned up to 4x when the caller
    passed raw lineage) and released once the layouts are materialized —
    UNLESS ``persist_input=False``, where the caller vouches the lineage
    is cheap (a projection of a cached table) and accepts the ~4 scans.
    A frame the caller already persisted is never unpersisted here.

    ``map_cold(df)`` / ``map_hot(df, hot_w)`` transform each branch
    AFTER its repartition but BEFORE the persist, so per-row derivations
    (PageRank's weight normalization) are computed once into the cached
    layout, not per superstep — and the partition-local window a
    map_cold may use sees the final hash(src) layout.
    """
    spark = pre.sparkSession
    # persist the input before the 3 passes below UNLESS the caller says
    # its lineage is already cheap (e.g. a projection of a cached table
    # — persisting that would duplicate the edge set in memory).  Never
    # take ownership of a frame the caller persisted itself: persist()
    # would no-op and the exit unpersist would drop THEIR cache.
    owned = (
        persist_input is not False
        and pre.storageLevel == StorageLevel.NONE
    )
    if owned:
        pre = pre.persist(StorageLevel.MEMORY_AND_DISK)
    n_edges = pre.count()
    if hot_threshold is None:
        hot_threshold = max(n_edges // num_partitions // 4, 16384)
    hot_rows = (
        pre.groupBy("src")
        .agg(F.sum("weight").alias("out_w"), F.count("*").alias("outd"))
        .filter(F.col("outd") > hot_threshold)
        .orderBy(F.col("outd").desc())
        .select("src", "out_w")
        .limit(hot_mirror_cap + 1)
        .collect()
    )
    if len(hot_rows) > hot_mirror_cap:
        hot_rows = hot_rows[:hot_mirror_cap]
        log.warning(
            "G10/shuffle: more than %d srcs exceed the hot threshold %d; "
            "salting only the %d highest-out-degree ones — the rest take "
            "the plain hash(src) path (raise hot_threshold or the cap if "
            "stragglers appear)",
            hot_mirror_cap, hot_threshold, hot_mirror_cap,
        )
    ident = lambda df: df  # noqa: E731
    map_cold = map_cold or ident
    if hot_rows:
        hot_w = spark.createDataFrame(hot_rows)  # (src, out_w), ≤ cap rows
        hot_srcs = hot_w.select("src")
        salt = F.pmod(F.xxhash64("src", "dst", "weight"), F.lit(num_partitions))
        hot = pre.join(F.broadcast(hot_srcs), "src", "left_semi").repartition(
            num_partitions, F.col("src"), salt
        )
        hot = (map_hot(hot, hot_w) if map_hot else hot).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        cold = map_cold(
            pre.join(F.broadcast(hot_srcs), "src", "left_anti")
            .repartition(num_partitions, "src")
        ).persist(StorageLevel.MEMORY_AND_DISK)
        hot.count()
    else:
        hot = hot_srcs = hot_w = None
        cold = map_cold(
            pre.repartition(num_partitions, "src")
        ).persist(StorageLevel.MEMORY_AND_DISK)
    cold.count()
    if owned:
        pre.unpersist()
    return HotSrcSplit(cold, hot, hot_srcs, hot_w, n_edges, hot_threshold)


def hot_keys(df: DataFrame, key: str, threshold: int) -> DataFrame:
    """Keys whose row count exceeds ``threshold`` (the mirror set)."""
    return (
        df.groupBy(key)
        .agg(F.count("*").alias("_cnt"))
        .filter(F.col("_cnt") > threshold)
        .select(key)
    )


def salted_agg(
    df: DataFrame,
    key: str,
    value: str,
    agg: str = "sum",
    num_salts: int = 16,
    hot: DataFrame | None = None,
) -> DataFrame:
    """Two-level exact aggregation: groupBy(key, salt) → groupBy(key).

    ``agg`` ∈ {sum, min, max, count} (algebraic decompositions).
    If ``hot`` is given, only those keys are salted; cold keys take the
    one-level path and the two unions back together.
    """
    fns = {
        "sum": (F.sum, F.sum),
        "min": (F.min, F.min),
        "max": (F.max, F.max),
        "count": (F.count, F.sum),
    }
    partial_fn, final_fn = fns[agg]

    def two_level(d: DataFrame) -> DataFrame:
        # salt from ROW CONTENT, not monotonically_increasing_id():
        # the generated id is nondeterministic under task/stage retry,
        # and a recomputed partition re-salting rows differently while
        # sibling reduce outputs are reused can double-count or drop
        # partial sums.  Content-hash salting is retry-stable; rows
        # identical in every column share a salt (acceptable: real
        # gather rows carry distinct payloads, and exactness beats a
        # marginally better spread)
        salted = d.withColumn(
            "_salt",
            F.pmod(
                F.xxhash64(*[F.col(c) for c in d.columns]),
                F.lit(num_salts),
            ),
        )
        partial = salted.groupBy(key, "_salt").agg(
            partial_fn(value).alias("_p")
        )
        return partial.groupBy(key).agg(final_fn("_p").alias(value))

    if hot is None:
        return two_level(df)
    hot_b = F.broadcast(hot)
    hot_rows = df.join(hot_b, key, "left_semi")
    cold_rows = df.join(hot_b, key, "left_anti")
    one_level = cold_rows.groupBy(key).agg(partial_fn(value).alias(value))
    return two_level(hot_rows).unionByName(one_level)


def mirrored_join(
    big: DataFrame,
    state: DataFrame,
    big_key: str,
    state_key: str,
    threshold: int = 100_000,
    hot: DataFrame | None = None,
) -> DataFrame:
    """Equi-join ``big ⋈ state`` with hub keys replicated (broadcast)
    instead of shuffled — exact same rows as a plain inner join.

    ``hot`` overrides detection (pass the precomputed mirror set at
    superstep time so detection isn't re-run per iteration).
    """
    if hot is None:
        hot = hot_keys(big, big_key, threshold)
    hot = hot.select(F.col(big_key).alias("_hk"))
    hot_b = F.broadcast(hot)

    big_hot = big.join(hot_b, big[big_key] == F.col("_hk"), "left_semi")
    big_cold = big.join(hot_b, big[big_key] == F.col("_hk"), "left_anti")
    state_hot = state.join(hot_b, state[state_key] == F.col("_hk"), "left_semi")

    joined_hot = big_hot.join(
        F.broadcast(state_hot), big_hot[big_key] == state_hot[state_key]
    )
    joined_cold = big_cold.join(state, big_cold[big_key] == state[state_key])
    return joined_hot.unionByName(joined_cold)
