"""Deterministic synthetic transcript generator (seed=42, no external data).

Produces the exact input shape required by BASELINE.json ``input_hint``:

    transcripts(conv_id string, turn_idx int32, role string,
                text string, tool string, ts timestamp)

plus the evaluation artifacts FIXTURES.md specifies:

    entity_dictionary(id, name, description, aliases)   — with the NIL row,
        mirroring the reference's dictionary contract + NIL append
        (/root/reference/entity_linkings/data_utils/entity_dictionary.py:27-49)
    gold_mentions(conv_id, turn_idx, start, end, label)  — planted spans,
        the flattened dataset-row shape
        (/root/reference/entity_linkings/data_utils/preprocessor.py:113-120)
    alias_counts(mention, entity_id, count)              — exploded mention
        counter (/root/reference/.../prior/indexer.py:70-85 analogue)

Mentions are planted as surface-form variants of dictionary names — case
changes, deterministic edit-distance-1/2 typos, abbreviations, dropped/added
punctuation — so gold clusters are known by construction and pairwise F1 of
the pipeline is measurable without any reference model run.

Everything is pure-Python deterministic (random.Random(SEED) only); the same
call always produces byte-identical tables, which the resume tests rely on.
"""

from __future__ import annotations

import datetime as _dt
import os
import random
from dataclasses import dataclass

import pandas as pd

SEED = 42

_FIRST = [
    "Akira", "Haruto", "Mei", "Sora", "Yuna", "Kenji", "Nora", "Ivan", "Lena",
    "Omar", "Paula", "Ravi", "Sara", "Tomas", "Vera", "Walid", "Ximena", "Yosef",
]
_LAST = [
    "Tanaka", "Kimura", "Okada", "Novak", "Silva", "Haddad", "Moreau", "Fischer",
    "Olsen", "Petrov", "Quispe", "Rossi", "Santos", "Weber", "Zhang", "Nakamura",
]
_ORG_A = [
    "Acme", "Global", "United", "Pacific", "Northern", "Stellar", "Quantum",
    "Vertex", "Summit", "Harbor", "Cobalt", "Meridian", "Aurora", "Pioneer",
]
_ORG_B = [
    "Systems", "Industries", "Labs", "Holdings", "Networks", "Dynamics",
    "Logistics", "Analytics", "Robotics",
]
_PLACE = [
    "Osaka Bay", "Nara Valley", "Kyoto Basin", "Lake Biwa", "Mount Ikoma",
    "Yoshino River", "Asuka Plain", "Ise Shore",
]
_TOOLS = ["search", "calculator", "code_exec", "file_read", "web_fetch", ""]
_ROLES = ["user", "assistant", "tool"]

_TEMPLATES = [
    ("I was reading about {M} earlier today.", 20),
    ("Can you tell me more about {M}?", 26),
    ("The report mentions {M} twice.", 20),
    ("{M} came up in the meeting notes.", 0),
    ("We compared {M} with the previous results.", 12),
    ("According to the wiki, {M} was founded long ago.", 22),
    ("Let me look up {M} for you.", 15),
    ("The answer involves {M} and nothing else.", 20),
]
_FILLER = [
    "Thanks, that helps a lot.",
    "Understood, proceeding with the plan.",
    "Running the requested tool now.",
    "Here is the summary you asked for.",
    "No entities of interest in this turn.",
    "The weather data looks unremarkable today.",
]


@dataclass(frozen=True)
class Scale:
    n_convs: int
    turns_per_conv: int


SCALES = {
    "tiny": Scale(50, 8),
    "small": Scale(2000, 12),
    "bench": Scale(50000, 16),
}


def build_dictionary() -> pd.DataFrame:
    """~200 entities: persons, orgs, places; includes deliberately confusable
    org pairs (shared first token, different second token) and the NIL row."""
    rng = random.Random(SEED)
    rows = []
    eid = 0

    def add(name: str, desc: str | None, aliases: list[str]):
        nonlocal eid
        rows.append(
            {
                "id": f"{eid:06d}",
                "name": name,
                "description": desc,
                "aliases": aliases,
            }
        )
        eid += 1

    # persons: FIRST LAST with initial-style aliases
    for i in range(96):
        f = _FIRST[i % len(_FIRST)]
        last = _LAST[(i * 7 + i // len(_FIRST)) % len(_LAST)]
        name = f"{f} {last}"
        add(name, f"{name} is a person entity.", [f"{f[0]}. {last}", name.lower()])

    # orgs: every (A, B) drawn so several share the A token -> confusable blocks
    seen = set()
    while len(seen) < 84:
        a = rng.choice(_ORG_A)
        b = rng.choice(_ORG_B)
        if (a, b) in seen:
            continue
        seen.add((a, b))
        name = f"{a} {b}"
        add(
            name,
            None,  # exercises the description template default downstream
            [f"{a} {b[:3]}.", name.upper(), f"{a}-{b}"],
        )

    for p in _PLACE:
        add(p, f"{p} is a geographic feature.", [p.replace(" ", "")])

    # NIL row exactly as the reference appends it
    # (data_utils/entity_dictionary.py:38-42: id="-1", name="[NIL]")
    rows.append({"id": "-1", "name": "[NIL]", "description": None, "aliases": []})
    return pd.DataFrame(rows)


def _typo(s: str, rng: random.Random) -> str:
    """Deterministic edit-distance-1 typo strictly inside a word (never the
    first character of a word — keeps the capitalization signal intact, as
    real-world mention typos overwhelmingly do)."""
    if len(s) < 5:
        return s
    inner = [
        i
        for i in range(1, len(s) - 1)
        if s[i] != " " and s[i - 1] != " " and s[i + 1] != " "
    ]
    if not inner:
        return s
    i = inner[rng.randrange(len(inner))]
    kind = rng.randrange(3)
    if kind == 0:  # transpose
        return s[:i] + s[i + 1] + s[i] + s[i + 2:]
    if kind == 1:  # delete
        return s[:i] + s[i + 1:]
    return s[:i] + s[i] + s[i:]  # duplicate


def _surface(name: str, aliases: list[str], rng: random.Random) -> str:
    """Pick a surface form: exact, case-variant, alias, typo, punct-noise."""
    r = rng.random()
    if r < 0.40:
        return name
    if r < 0.55:
        return name.lower() if rng.random() < 0.5 else name.upper()
    if r < 0.72 and aliases:
        return rng.choice(aliases)
    if r < 0.90:
        return _typo(name, rng)
    return name.replace(" ", ", ") if " " in name else name + "."


def generate(scale: str = "tiny"):
    """Return (transcripts, gold_mentions, dictionary, alias_counts) as pandas
    DataFrames. Deterministic for a given scale."""
    sc = SCALES[scale]
    dic = build_dictionary()
    ents = dic[dic["id"] != "-1"].reset_index(drop=True)
    rng = random.Random(SEED * 1000003 + sc.n_convs)  # scale-stable

    base_ts = _dt.datetime(2025, 1, 1, tzinfo=_dt.timezone.utc)
    t_rows, g_rows = [], []
    n_ent = len(ents)
    for ci in range(sc.n_convs):
        conv_id = f"conv-{ci:06d}"
        # each conversation focuses on a small entity pool -> mentions of the
        # same entity recur within a conversation (co-reference pressure)
        pool = [rng.randrange(n_ent) for _ in range(4)]
        for ti in range(sc.turns_per_conv):
            role = _ROLES[ti % 3]
            tool = rng.choice(_TOOLS[:-1]) if role == "tool" else ""
            ts = base_ts + _dt.timedelta(hours=ci % 997, minutes=ti)
            if rng.random() < 0.25:
                text = rng.choice(_FILLER)
            else:
                tmpl, _off = rng.choice(_TEMPLATES)
                ent = ents.iloc[rng.choice(pool)]
                surface = _surface(ent["name"], list(ent["aliases"]), rng)
                start = tmpl.index("{M}")
                text = tmpl.replace("{M}", surface)
                g_rows.append(
                    {
                        "conv_id": conv_id,
                        "turn_idx": ti,
                        "start": start,
                        "end": start + len(surface),
                        "label": [ent["id"]],
                    }
                )
            t_rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": ti,
                    "role": role,
                    "text": text,
                    "tool": tool,
                    "ts": ts,
                }
            )

    transcripts = pd.DataFrame(t_rows)
    transcripts["turn_idx"] = transcripts["turn_idx"].astype("int32")
    gold = pd.DataFrame(g_rows)
    gold["turn_idx"] = gold["turn_idx"].astype("int32")
    gold["start"] = gold["start"].astype("int32")
    gold["end"] = gold["end"].astype("int32")

    # alias_counts: how often each surface form was planted per entity —
    # the exploded mention-counter table (prior/indexer.py analogue).
    merged = gold.merge(transcripts, on=["conv_id", "turn_idx"], how="left")
    merged["mention"] = merged.apply(lambda r: r["text"][r["start"]:r["end"]], axis=1)
    merged["entity_id"] = merged["label"].str[0]
    alias_counts = (
        merged.groupby(["mention", "entity_id"], as_index=False)
        .size()
        .rename(columns={"size": "count"})
    )
    alias_counts["count"] = alias_counts["count"].astype("int64")
    return transcripts, gold, dic, alias_counts


def write_parquet(scale: str, out_dir: str) -> dict[str, str]:
    """Materialize one scale to parquet files; returns name->path. Idempotent
    (skips if all four files exist)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {
        n: os.path.join(out_dir, f"{n}.parquet")
        for n in ("transcripts", "gold_mentions", "entity_dictionary", "alias_counts")
    }
    if all(os.path.exists(p) for p in paths.values()):
        return paths
    transcripts, gold, dic, alias_counts = generate(scale)
    # microsecond timestamps: Spark's vectorized parquet reader rejects the
    # nanosecond INT64 encoding pandas writes by default
    transcripts.to_parquet(
        paths["transcripts"], index=False,
        coerce_timestamps="us", allow_truncated_timestamps=True,
    )
    gold.to_parquet(paths["gold_mentions"], index=False)
    dic.to_parquet(paths["entity_dictionary"], index=False)
    alias_counts.to_parquet(paths["alias_counts"], index=False)
    return paths


def dataset_dir(scale: str, root: str | None = None) -> str:
    # cwd-anchored (not __file__): under spark-submit --py-files the package
    # lives inside a zip where a sibling .data/ path cannot exist
    root = root or os.environ.get("EL_SPARK_DATA_DIR", os.path.join(os.getcwd(), ".data"))
    return os.path.abspath(os.path.join(root, f"synth_{scale}"))


def ensure_dataset(scale: str, root: str | None = None) -> dict[str, str]:
    return write_parquet(scale, dataset_dir(scale, root))
