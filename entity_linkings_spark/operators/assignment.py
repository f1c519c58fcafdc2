"""One-to-one bipartite assignment over scored candidate pairs — the
"linker mode" decision stage classical record linkage requires when BOTH
datasets are individually duplicate-free (clean-clean ER): each left
record may match at most one right record and vice versa, so the scored
candidate table must be reduced to a matching, not a clustering.

The reference resolves every mention independently (top-1 argmax per
mention, candidate_reranker/crossencoder/crossencoder.py:142-162), which lets two
mentions claim the same entity; that is correct for entity LINKING but
wrong for record LINKAGE between two deduplicated files — the setting
Fellegi-Sunter was built for (Jaro 1989 forced one-to-one with an LSAP
solve in the Tampa census linkage). An exact LSAP is inherently
sequential; the scalable classical substitute is GREEDY matching by
descending score, and greedy has an exactly-parallelizable form:
**locally dominant edges** (Preis 1999; Manne & Bisseling 2007). An edge
is locally dominant when it is the best remaining edge for BOTH of its
endpoints; every locally dominant edge is picked by sequential greedy,
and matching all of them simultaneously, removing their endpoints, and
repeating reaches exactly the sequential-greedy matching — provided the
edge order is a strict total order (ties broken deterministically), which
is what makes the distributed result well-defined and rerun-stable.

Per round this is two per-endpoint best-edge aggregates, one equi-join of
those two reduced tables, and two anti-joins to retire matched endpoints
— no windows, no collects, no driver-side edge materialization. The
best-edge aggregate is ``min_by`` over a (-score, partner) struct, which
plans as a PARTIAL SortAggregate below its exchange (struct orderings
exclude HashAggregate's mutable-buffer fast path), so the map side still
combines down to one row per endpoint per task before any shuffle — the
local per-task sort is the price of an id-typed tie-break, and it beats
the window-rank alternative (same sort, plus a full-width exchange).
Rounds are bounded by ``max_rounds`` and each round is guaranteed to
match at least one edge (the globally best remaining edge is always
mutually best), so fixpoint equals full greedy. Typical round counts are
O(log n) on real score distributions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def one_to_one_match(
    pairs: DataFrame,
    left_col: str = "left_id",
    right_col: str = "right_id",
    score_col: str = "score",
    max_rounds: int = 20,
    checkpoint: bool = True,
    assume_distinct: bool = False,
) -> DataFrame:
    """Reduce scored candidate pairs to a one-to-one matching by iterated
    locally-dominant-edge selection (distributed greedy matching).

    Edge order (strict total): score DESC, then right id ASC for a left's
    preference, left id ASC for a right's preference — the projection of
    the global (score DESC, left ASC, right ASC) order onto each
    endpoint's edge set, so the parallel fixpoint equals sequential
    greedy under that global order (pytest pins this against a
    pure-Python greedy model on random graphs).

    Returns (left_col, right_col, score_col, round) — ``round`` (int,
    1-based) is the iteration in which the pair became mutually best,
    i.e. a locally dominant edge. If ``max_rounds`` rounds do not drain
    the candidate set the matching so far is returned (every returned
    pair is final — later rounds can only ADD pairs on disjoint
    endpoints); callers needing the guaranteed-complete greedy matching
    raise ``max_rounds`` (rounds never exceed min(|L|, |R|)).

    Duplicate (left, right) rows are collapsed to their best score first
    so the total order is over distinct edges. ``assume_distinct=True``
    skips that collapse — at scale it is a full shuffle + materialization
    of the edge set (the measured dominant cost of the whole matching on
    pre-deduped input), so callers that already aggregated per pair (the
    epoch store's reducer, a blocking stage's groupBy) should pass it.
    """
    l, r, s = left_col, right_col, score_col
    if assume_distinct:
        rem = pairs.select(l, r, s)
    else:
        rem = pairs.groupBy(l, r).agg(F.max(s).alias(s))
    if checkpoint:
        rem = rem.localCheckpoint(eager=False)
    spark = pairs.sparkSession
    matched = spark.createDataFrame(
        [], rem.select(l, r, s).withColumn("round", F.lit(1)).schema
    )
    for rnd in range(1, max_rounds + 1):
        # Each endpoint's best remaining edge: min over the (-score, id)
        # struct = max score, smallest partner id on ties. min_by is
        # deterministic here because the ordering struct is unique per key
        # (the partner id is part of it and (l, r) rows are distinct).
        bl = rem.groupBy(l).agg(
            F.min_by(F.struct(F.col(r), F.col(s)), F.struct(-F.col(s), F.col(r))).alias("p")
        ).select(l, F.col(f"p.{r}").alias(r), F.col(f"p.{s}").alias(s))
        br = rem.groupBy(r).agg(
            F.min_by(F.col(l), F.struct(-F.col(s), F.col(l))).alias(l)
        ).select(r, l)
        mutual = bl.join(br, [l, r]).withColumn("round", F.lit(rnd))
        if checkpoint:
            mutual = mutual.localCheckpoint(eager=False)
        if mutual.limit(1).count() == 0:
            break
        matched = matched.unionByName(mutual)
        rem = (
            rem.join(mutual.select(l), l, "left_anti")
            .join(mutual.select(r), r, "left_anti")
        )
        if checkpoint:
            rem = rem.localCheckpoint(eager=False)
    return matched
