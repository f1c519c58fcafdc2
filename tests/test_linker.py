"""Linker mode (plans/linker.py): cross-source-only candidates, one-to-one
decisions against a planted two-file gold mapping, the bipartite block cap,
the unmatched audit, and the FS decision path."""

import pytest

from entity_linkings_spark.plans.linker import (
    LinkerConfig,
    candidate_pairs_bipartite,
    link_datasets,
)

# 12 distinct entities; right file holds a typo'd variant of each.
_ENTITIES = [
    ("acme corporation", "acme corporaton"),
    ("globex incorporated", "globex incorperated"),
    ("initech holdings", "initech holdngs"),
    ("umbrella supplies", "umbrela supplies"),
    ("stark industries", "stark industrees"),
    ("wayne enterprises", "wayne enterprizes"),
    ("tyrell systems", "tyrell systms"),
    ("weyland logistics", "weyland logistics ltd"),
    ("cyberdyne analytics", "cyberdyne analytcs"),
    ("hooli platforms", "hooli platfoms"),
    ("aperture research", "aperture reserch"),
    ("vandelay imports", "vandelay improts"),
]


def _files(spark, extra_left=(), extra_right=()):
    left = spark.createDataFrame(
        [(f"L{i}", s) for i, (s, _) in enumerate(_ENTITIES)] + list(extra_left),
        "record_id string, surface string",
    )
    right = spark.createDataFrame(
        [(f"R{i}", s) for i, (_, s) in enumerate(_ENTITIES)] + list(extra_right),
        "record_id string, surface string",
    )
    return left, right


def test_linker_recovers_gold_one_to_one(spark):
    left, right = _files(
        spark,
        extra_left=[("L90", "completely unrelated zq")],
        extra_right=[("R90", "another orphan xv")],
    )
    out = link_datasets(left, right)
    got = {(r["left_id"], r["right_id"]) for r in out["matches"].collect()}
    want = {(f"L{i}", f"R{i}") for i in range(len(_ENTITIES))}
    assert got == want
    ul = {r["left_id"]: r["reason"] for r in out["unmatched_left"].collect()}
    ur = {r["right_id"]: r["reason"] for r in out["unmatched_right"].collect()}
    assert ul == {"L90": "no_candidate"}
    assert ur == {"R90": "no_candidate"}


def test_candidates_are_cross_source_only(spark):
    # both files contain an IDENTICAL surface pair internally; a dedup-style
    # self-join would pair them — linker blocking must not
    left, right = _files(
        spark,
        extra_left=[("L50", "acme corporation")],
        extra_right=[("R50", "acme corporaton")],
    )
    pairs = link_datasets(left, right)["pairs"].collect()
    lids = {p["left_id"] for p in pairs}
    rids = {p["right_id"] for p in pairs}
    assert all(i.startswith("L") for i in lids)
    assert all(i.startswith("R") for i in rids)


def test_one_to_one_under_confusable_duplicates(spark):
    # two rights court the same left; exactly one wins, the matching stays
    # injective both ways, and the loser is audited as a DECISION loss
    left, right = _files(spark, extra_right=[("R50", "acme corporation")])
    out = link_datasets(left, right)
    matches = out["matches"].collect()
    lids = [m["left_id"] for m in matches]
    rids = [m["right_id"] for m in matches]
    assert len(set(lids)) == len(lids) and len(set(rids)) == len(rids)
    by_left = {m["left_id"]: m["right_id"] for m in matches}
    # the exact-surface copy outscores the typo variant for L0
    assert by_left["L0"] == "R50"
    ur = {r["right_id"]: r["reason"] for r in out["unmatched_right"].collect()}
    assert ur == {"R0": "below_floor_or_lost"}


def test_bipartite_block_cap_bounds_fanout(spark):
    # a hot shared token ("corp") on both sides: with a tiny cap and ONLY
    # token blocking, the hot block is dropped entirely
    left = spark.createDataFrame(
        [(f"L{i}", f"corp alpha{i}") for i in range(12)],
        "record_id string, surface string",
    )
    right = spark.createDataFrame(
        [(f"R{i}", f"corp alpha{i}") for i in range(12)],
        "record_id string, surface string",
    )
    cfg = LinkerConfig(use_lsh=False, max_block_pairs=100)
    pairs = link_datasets(left, right, config=cfg)["pairs"]
    # 'corp' block = 12*12 = 144 > 100 -> dropped; each 'alphaN' token block
    # is 1*1 and survives, so exactly the diagonal pairs remain
    got = {(p["left_id"], p["right_id"]) for p in pairs.collect()}
    assert got == {(f"L{i}", f"R{i}") for i in range(12)}


def test_fs_decision_path_recovers_gold(spark):
    left, right = _files(spark)
    cfg = LinkerConfig(fs_match=True)
    out = link_datasets(left, right, config=cfg)
    scored_cols = set(out["scored"].columns)
    assert {"fs_weight", "fs_posterior", "decision_score"} <= scored_cols
    got = {(r["left_id"], r["right_id"]) for r in out["matches"].collect()}
    want = {(f"L{i}", f"R{i}") for i in range(len(_ENTITIES))}
    assert got == want


def test_bipartite_pair_dedup_is_deterministic(spark):
    left, right = _files(spark)
    from entity_linkings_spark.plans.linker import _side_keys

    cfg = LinkerConfig()
    kl = _side_keys(left, "record_id", "surface", cfg)
    kr = _side_keys(right, "record_id", "surface", cfg)
    p = candidate_pairs_bipartite(kl, kr, cfg.max_block_pairs)
    rows = p.groupBy("left_id", "right_id").count().where("count > 1").count()
    assert rows == 0
