"""Command-line entry points — the spark-submit surface of the engine.

Mirrors the reference's console scripts
(/root/reference/pyproject.toml:59-67: entitylinkings-eval-pipeline,
entitylinkings-build-index, ...) as subcommands of one module:

    spark-submit --py-files el_spark.zip -m entity_linkings_spark.cli run ...
    python -m entity_linkings_spark.cli evaluate --scale small
    python -m entity_linkings_spark.cli build-artifacts ...
    python -m entity_linkings_spark.cli datagen --scale bench

``run`` executes the full lifecycle-managed pipeline (snapshot commits,
resume, per-partition lineage); ``evaluate`` adds the gold-based metrics
(pairwise F1 on labeled same-block pairs, top-1 accuracy, InKB micro-F1);
``build-artifacts`` precomputes the blocking artifacts only — the analogue of
the reference's build-index flow (cli/build_index.py:11-23).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

if __package__ in (None, ""):  # `spark-submit path/to/cli.py` without the
    # --py-files zip puts the package DIR on sys.path, not its parent — make
    # the deferred `entity_linkings_spark.*` imports resolve either way
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _session(args):
    from entity_linkings_spark import get_spark

    return get_spark(
        app_name=f"el-spark-{args.cmd}",
        master=getattr(args, "master", None),
    )


def _load_inputs(spark, args):
    from entity_linkings_spark.datagen import ensure_dataset
    from entity_linkings_spark.sources.dictionary import load_dictionary
    from entity_linkings_spark.sources.transcripts import load_transcripts

    if args.transcripts and args.dictionary:
        return (
            load_transcripts(spark, args.transcripts),
            load_dictionary(spark, args.dictionary),
            None,
        )
    paths = ensure_dataset(args.scale)
    gold = spark.read.parquet(paths["gold_mentions"])
    return (
        load_transcripts(spark, paths["transcripts"]),
        load_dictionary(spark, paths["entity_dictionary"]),
        gold,
    )


def cmd_run(args) -> int:
    from entity_linkings_spark.plans.lifecycle import run_linkage

    spark = _session(args)
    transcripts, dic, _ = _load_inputs(spark, args)
    out = run_linkage(
        spark, transcripts, dic, args.store, args.fingerprint or args.scale
    )
    rm = out["resolved_mentions"]
    print(
        json.dumps(
            {
                "resolved_mentions": rm.df.count(),
                "snapshot_id": rm.snapshot_id,
                "resumed_stages": [
                    k for k, v in out.items() if k != "runner" and v.resumed
                ],
                "store": args.store,
            }
        )
    )
    return 0


def cmd_evaluate(args) -> int:
    from pyspark.sql import functions as F

    from entity_linkings_spark.operators.evaluate import (
        gold_surface_pairs,
        inkb_micro_f1,
        pairwise_f1,
        top1_accuracy,
    )
    from entity_linkings_spark.plans.pipeline import LinkagePipeline

    spark = _session(args)
    transcripts, dic, gold = _load_inputs(spark, args)
    if gold is None:
        print("evaluate requires the synthetic dataset (gold labels)", file=sys.stderr)
        return 2
    out = LinkagePipeline(dic).run(transcripts)
    lp = gold_surface_pairs(gold, transcripts)
    f1 = pairwise_f1(out["clusters"], lp).collect()[0].asDict()
    acc = top1_accuracy(out["resolved_mentions"], gold).collect()[0][0]
    preds = out["resolved_mentions"].select(
        "conv_id", "turn_idx", "start", "end", F.array("entity_id").alias("labels")
    )
    inkb = inkb_micro_f1(preds, gold).collect()[0].asDict()
    print(json.dumps({"pairwise": f1, "top1_accuracy": acc, "inkb": inkb}))
    return 0 if f1["f1"] >= 0.99 else 1


def cmd_build_artifacts(args) -> int:
    """Precompute + snapshot the blocking artifacts (build-index analogue):
    distinct surfaces, token/LSH block keys, prior tier tables."""
    from entity_linkings_spark.operators import blocking as B
    from entity_linkings_spark.operators.prior import (
        alias_tier_tables,
        dictionary_alias_counts,
    )
    from entity_linkings_spark.plans.lifecycle import SnapshotStore, StageRunner
    from entity_linkings_spark.plans.pipeline import LinkagePipeline

    spark = _session(args)
    transcripts, dic, _ = _load_inputs(spark, args)
    pipe = LinkagePipeline(dic)
    store = SnapshotStore(spark, args.store)
    runner = StageRunner(store)
    fp = args.fingerprint or args.scale
    mentions = runner.run("mentions", fp, lambda: pipe.mentions(transcripts))
    surfaces = runner.run(
        "surfaces_raw", fp, lambda: B.distinct_surfaces(mentions.df)
    )
    runner.run("token_blocks", fp, lambda: B.token_block_keys(surfaces.df))
    runner.run("lsh_blocks", fp, lambda: B.lsh_block_keys(surfaces.df))
    counts = dictionary_alias_counts(dic)
    for name, tier in alias_tier_tables(counts).items():
        runner.run(f"prior_{name}", fp, lambda t=tier: t)
    print(json.dumps({"stages": [e["stage"] for e in runner.events]}))
    return 0


def cmd_link(args) -> int:
    """Clean-clean two-file linkage (linker mode, plans/linker.py): read two
    record parquet files, emit matches + unmatched audits as parquet under
    --store, print the stage row counts. The linker analogue of ``run`` —
    cross-source-only blocking, one-to-one decisions."""
    from entity_linkings_spark.plans.linker import LinkerConfig, link_datasets

    spark = _session(args)
    left = spark.read.parquet(args.left)
    right = spark.read.parquet(args.right)
    # which floor applies: --min-score gates the blended score (default
    # path); with --fs the decision floor is the POSTERIOR threshold —
    # --fs-posterior-threshold when given, else --min-score routes to it so
    # "--fs --min-score 0.9" floors the posterior at 0.9 instead of being
    # silently ignored (ADVICE r8).
    cfg = LinkerConfig(
        fs_match=args.fs,
        min_score=args.min_score,
        fs_posterior_threshold=(
            args.fs_posterior_threshold
            if args.fs_posterior_threshold is not None
            else args.min_score
        ),
    )
    out = link_datasets(
        left, right,
        id_col=args.id_col, surface_col=args.surface_col, config=cfg,
    )
    counts = {}
    for name in ("matches", "unmatched_left", "unmatched_right"):
        path = os.path.join(args.store, f"link_{name}")
        out[name].write.mode("overwrite").parquet(path)
        counts[name] = spark.read.parquet(path).count()
    print(json.dumps(counts))
    return 0


def cmd_datagen(args) -> int:
    from entity_linkings_spark.datagen import ensure_dataset

    paths = ensure_dataset(args.scale)
    print(json.dumps(paths))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="entity-linkings-spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name, fn in (
        ("run", cmd_run),
        ("evaluate", cmd_evaluate),
        ("build-artifacts", cmd_build_artifacts),
        ("link", cmd_link),
        ("datagen", cmd_datagen),
    ):
        sp = sub.add_parser(name)
        sp.set_defaults(fn=fn)
        sp.add_argument("--scale", default="tiny", choices=["tiny", "small", "bench"])
        sp.add_argument("--transcripts", help="transcript parquet path or catalog table")
        sp.add_argument("--dictionary", help="dictionary parquet path")
        sp.add_argument("--store", default="/tmp/el_spark_store")
        sp.add_argument("--fingerprint", help="input fingerprint for resume identity")
        sp.add_argument("--master", help="override spark master")
        if name == "link":
            sp.add_argument("--left", required=True, help="left record parquet")
            sp.add_argument("--right", required=True, help="right record parquet")
            sp.add_argument("--id-col", dest="id_col", default="record_id")
            sp.add_argument("--surface-col", dest="surface_col", default="surface")
            sp.add_argument("--fs", action="store_true",
                            help="Fellegi-Sunter posterior decisions")
            sp.add_argument("--min-score", dest="min_score", type=float,
                            default=0.5,
                            help="decision floor: blended score, or the FS "
                                 "posterior when --fs is set (unless "
                                 "--fs-posterior-threshold overrides)")
            sp.add_argument("--fs-posterior-threshold",
                            dest="fs_posterior_threshold", type=float,
                            default=None,
                            help="explicit FS posterior floor (with --fs)")
    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
