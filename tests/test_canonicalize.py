"""Golden-record survivorship vs a pure-Python rule model (the golden-test
pattern of SURVEY.md section 5), plus the deterministic tie-break and null
conventions the docstring promises."""

import pytest

from entity_linkings_spark.operators.canonicalize import golden_records

REC_SCHEMA = "node string, surface string, src string, ts int, ent int"


def _run(spark, labels, records, rules, order_col=None):
    ldf = spark.createDataFrame(labels, "node string, cluster_id string")
    rdf = spark.createDataFrame(records, REC_SCHEMA)
    rows = golden_records(ldf, rdf, rules, order_col=order_col).collect()
    return {r["cluster_id"]: r.asDict() for r in rows}


def test_all_rules_hand_case(spark):
    labels = [("a", "c1"), ("b", "c1"), ("c", "c1"), ("d", "c2")]
    records = [
        ("a", "acme corp", "crm", 3, 7),
        ("b", "acme corporation", "web", 1, 5),
        ("c", "acme", "crm", 2, 9),
        ("d", "zeta", "web", 9, 1),
    ]
    got = _run(
        spark, labels, records,
        {"surface": "longest", "src": "mode", "ent": "min", "ts": "max"},
    )
    c1 = got["c1"]
    assert c1["n_records"] == 3
    assert c1["surface"] == "acme corporation"  # longest wins
    assert c1["src"] == "crm"                   # 2 crm vs 1 web
    assert c1["ent"] == 5 and c1["ts"] == 3
    assert got["c2"]["surface"] == "zeta" and got["c2"]["n_records"] == 1


def test_newest_and_tie_breaks(spark):
    labels = [("a", "c1"), ("b", "c1"), ("c", "c1"), ("d", "c1")]
    records = [
        ("a", "bb", "x", 5, 1),
        ("b", "aa", "y", 5, 1),   # ts tie at 5: newest -> greatest value "bb"
        ("c", "cc", "x", 1, 1),
        ("d", "dd", "y", 2, 1),   # mode tie x=2,y=2 -> greatest value "y"
    ]
    got = _run(
        spark, labels, records,
        {"surface": "newest", "src": "mode"}, order_col="ts",
    )["c1"]
    assert got["surface"] == "bb"
    assert got["src"] == "y"
    # longest tie: equal lengths -> greatest value
    got2 = _run(spark, labels, records, {"surface": "longest"})["c1"]
    assert got2["surface"] == "dd"


def test_nulls_never_win_and_all_null_is_null(spark):
    labels = [("a", "c1"), ("b", "c1"), ("c", "c2"), ("d", "c2")]
    records = [
        ("a", None, "x", 9, 1),   # null surface on the newest row loses
        ("b", "kept", "x", 1, 1),
        ("c", None, None, 1, 1),  # all-null fields -> null outputs
        ("d", None, None, 2, 1),
    ]
    got = _run(
        spark, labels, records,
        {"surface": "newest", "src": "mode"}, order_col="ts",
    )
    assert got["c1"]["surface"] == "kept"
    assert got["c2"]["surface"] is None and got["c2"]["src"] is None
    assert got["c2"]["n_records"] == 2


def test_unlabeled_record_is_own_singleton(spark):
    labels = [("a", "c1")]
    records = [("a", "s1", "x", 1, 1), ("z", "s2", "y", 2, 2)]
    got = _run(spark, labels, records, {"surface": "longest"})
    assert got["z"]["n_records"] == 1 and got["z"]["surface"] == "s2"


def test_rule_validation(spark):
    ldf = spark.createDataFrame([("a", "c1")], "node string, cluster_id string")
    rdf = spark.createDataFrame([("a", "s", "x", 1, 1)], REC_SCHEMA)
    with pytest.raises(ValueError, match="unknown survivorship"):
        golden_records(ldf, rdf, {"surface": "best"})
    with pytest.raises(ValueError, match="requires order_col"):
        golden_records(ldf, rdf, {"surface": "newest"})


def _model(labels, records, rules, order_col=None):
    lab = dict(labels)
    cols = ["node", "surface", "src", "ts", "ent"]
    out = {}
    for rec in records:
        d = dict(zip(cols, rec))
        cid = lab.get(d["node"], d["node"])
        out.setdefault(cid, []).append(d)
    res = {}
    for cid, rows in out.items():
        r = {"cluster_id": cid, "n_records": len(rows)}
        for field, rule in rules.items():
            vals = [x[field] for x in rows if x[field] is not None]
            if not vals:
                r[field] = None
                continue
            if rule == "mode":
                counts = {}
                for v in vals:
                    counts[v] = counts.get(v, 0) + 1
                r[field] = max(vals, key=lambda v: (counts[v], v))
            elif rule == "longest":
                r[field] = max(vals, key=lambda v: (len(v), v))
            elif rule == "max":
                r[field] = max(vals)
            elif rule == "min":
                r[field] = min(vals)
            elif rule == "newest":
                r[field] = max(
                    ((x[order_col], x[field]) for x in rows
                     if x[field] is not None),
                )[1]
        res[cid] = r
    return res


def test_matches_model_random(spark):
    import random

    for seed in range(3):
        rng = random.Random(400 + seed)
        nodes = [f"n{i:02d}" for i in range(30)]
        labels = [(n, f"c{rng.randrange(6)}") for n in nodes
                  if rng.random() < 0.85]
        records = [
            (
                n,
                None if rng.random() < 0.1
                else "s" * rng.randrange(1, 5) + str(rng.randrange(3)),
                rng.choice(["crm", "web", "api"]),
                rng.randrange(10),
                rng.randrange(100),
            )
            for n in nodes
        ]
        rules = {"surface": "longest", "src": "mode", "ts": "max",
                 "ent": "min"}
        got = _run(spark, labels, records, rules)
        want = _model(labels, records, rules)
        assert got == want, f"seed={seed}"
