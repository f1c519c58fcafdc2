"""Training-batch shaping ops (J10) and LLM-response parsing (F9) as pure
Catalyst expressions — the data-transforming halves of reference components
whose model/LLM halves are out of scope.

  * in_batch_candidates — the collator's candidate-set construction
    (/root/reference/entity_linkings/candidate_retriever/collator.py:26-59):
    per batch, candidates = dedup(gold ids ∪ first-k hard negatives), and
    every row's label re-indexed into that batch-local list. DIVERGENCE
    (documented): the reference builds the list via Python ``set`` — order
    nondeterministic across runs; here the batch candidate list is SORTED,
    so labels are reproducible (same information, stable indexing).
  * parse_multi_choice — the multi-choice answer parser
    (candidate_reranker/chatel/utils.py:12-49): extract integer choices, the
    explicit "None of the entity match" refusal, the 2-found-first-wins rule
    and the unique-complete-string-match fallback.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def in_batch_candidates(
    rows: DataFrame,
    batch_col: str = "batch_id",
    row_col: str = "row_id",
    gold_col: str = "gold_id",
    negs_col: str = "hard_negatives",
    k: int = 2,
) -> DataFrame:
    """(batch_id, row_id, gold_id, candidate_ids array, label int):
    batch-local deduped sorted candidate list (golds ∪ first-k negatives per
    row) and each row's re-indexed gold label (collator.py:46,57-59)."""
    cand = (
        rows.select(
            batch_col,
            F.explode(
                F.array_union(
                    F.array(F.col(gold_col)),
                    F.slice(F.coalesce(F.col(negs_col), F.array()), 1, k),
                )
            ).alias("cid"),
        )
        .groupBy(batch_col)
        .agg(F.array_sort(F.collect_set("cid")).alias("candidate_ids"))
    )
    out = rows.join(cand, batch_col)
    return out.select(
        batch_col,
        row_col,
        gold_col,
        "candidate_ids",
        (F.array_position("candidate_ids", F.col(gold_col)) - 1)
        .cast("int")
        .alias("label"),
    )


def parse_multi_choice(response: Column | str, candidates: Column | str) -> Column:
    """0-based chosen index (-1 = no/none match) from an LLM-style
    multi-choice response, mirroring chatel/utils.py:12-49:

      1. empty candidate list -> -1; single candidate -> 0;
      2. 'None of the entity match' anywhere -> -1;
      3. all integers \\b\\d+\\b, 1-based, filtered to range: exactly one ->
         it; exactly two with >2 candidates -> the first;
      4. else candidates whose lowercase form appears in the lowercase
         response AND are not a substring of another candidate: exactly one
         -> it; else -1.
    """
    resp = F.col(response) if isinstance(response, str) else response
    cands = F.col(candidates) if isinstance(candidates, str) else candidates
    n = F.size(cands)
    idxs = F.filter(
        F.transform(
            F.regexp_extract_all(resp, F.lit(r"\b(\d+)\b"), 1),
            lambda s: s.cast("int") - 1,
        ),
        lambda i: (i >= 0) & (i < n),
    )
    lower_resp = F.lower(resp)
    indexed = F.transform(cands, lambda c, i: F.struct(c.alias("c"), i.alias("i")))
    contained = F.filter(
        indexed,
        lambda s: lower_resp.contains(F.lower(s["c"]))
        & ~F.exists(indexed, lambda o: (o["i"] != s["i"]) & o["c"].contains(s["c"])),
    )
    return (
        F.when(n == 0, F.lit(-1))
        .when(n == 1, F.lit(0))
        .when(resp.contains("None of the entity match"), F.lit(-1))
        .when(F.size(idxs) == 1, F.element_at(idxs, 1))
        .when((F.size(idxs) == 2) & (n > 2), F.element_at(idxs, 1))
        .when(F.size(contained) == 1, F.element_at(contained, 1)["i"])
        .otherwise(F.lit(-1))
        .cast("int")
    )


def pack_sequences(
    chunks: DataFrame,
    capacity: int,
    group_col: str = "source",
    order_cols: list[str] | None = None,
    size_col: str = "n_tokens",
) -> DataFrame:
    """Greedy in-order sequence packing for LM training: within each group,
    walk the chunks in ``order_cols`` order and assign each to the current
    bin while the running token count stays <= ``capacity``; otherwise open
    the next bin. Adds ``bin_idx`` (0-based per group) and ``bin_fill``
    (running tokens in the bin after this chunk). An oversized chunk
    (size > capacity) occupies a bin alone.

    Packing is a sequential scan with a resetting accumulator — not
    expressible as a Catalyst window (the reset makes it non-associative) —
    so this is an applyInPandas operator: one Arrow batch per group, a
    numpy loop over the group's CHUNKS (not tokens), state bounded by the
    group's chunk count. Groups partition the work, so the operator scales
    with the number of groups exactly like any keyed aggregation."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    order_cols = order_cols or ["doc_id", "chunk_idx"]
    if capacity <= 0:
        raise ValueError(f"pack_sequences: capacity must be positive, got {capacity}")
    out_schema = T.StructType(
        list(chunks.schema.fields)
        + [T.StructField("bin_idx", T.LongType()),
           T.StructField("bin_fill", T.LongType())]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
        sizes = pdf[size_col].to_numpy(dtype=np.int64)
        bins = np.zeros(len(sizes), dtype=np.int64)
        fills = np.zeros(len(sizes), dtype=np.int64)
        b, run = 0, 0
        for i, s in enumerate(sizes):
            if run + s > capacity and run > 0:
                b, run = b + 1, 0
            run += s
            bins[i], fills[i] = b, run
        pdf["bin_idx"], pdf["bin_fill"] = bins, fills
        return pdf

    return chunks.groupBy(group_col).applyInPandas(pack, out_schema)
