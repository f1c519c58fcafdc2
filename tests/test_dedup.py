"""Dedup-family operator tests: SimHash multi-band completeness (zero missed
pairs vs brute-force Hamming), MinHash-LSH empty-doc behavior."""

import random

import pyspark.sql.functions as F

from entity_linkings_spark.operators import dedup as D


def test_simhash_bands_cover_all_bits():
    for k in (3, 8, 15):
        bands = D.simhash_bands(k)
        assert len(bands) == k + 1
        assert sum(w for _, _, w in bands) == 60
        assert bands[0][1] == 0
        for (i, lo, w), (_, lo2, _) in zip(bands, bands[1:]):
            assert lo + w == lo2
        widths = {w for _, _, w in bands}
        assert max(widths) - min(widths) <= 1


def test_simhash_near_pairs_complete_vs_bruteforce(spark):
    """Multi-band candidates must find EVERY pair with Hamming <= k — the
    pigeonhole guarantee, asserted against a brute-force Hamming join over a
    corpus engineered to include near pairs differing in every bit region
    (including the high bits the old single-prefix bucket missed)."""
    rng = random.Random(7)
    vals = []
    for i in range(120):
        v = rng.getrandbits(60)
        vals.append(v)
        # plant a near-dup at Hamming <= 8 with flips spread anywhere,
        # including the top bits
        flips = rng.sample(range(60), rng.randint(1, 8))
        w = v
        for b in flips:
            w ^= 1 << b
        vals.append(w)
    sh = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "doc_id long, simhash long"
    )
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in D.simhash_near_pairs(sh, "doc_id", 8).collect()
    }
    exp = set()
    for i in range(len(vals)):
        for j in range(i + 1, len(vals)):
            h = bin(vals[i] ^ vals[j]).count("1")
            if h <= 8:
                exp.add((i, j, h))
    assert got == exp  # complete AND exact — no missed pairs, no extras


def test_simhash_bucket_cap_bounds_fanin_on_skew(spark):
    """VERDICT r2 item 5: on a skewed corpus (one value repeated n times =>
    one bucket of n in EVERY band => ~n^2/2 joined pairs), max_bucket_size
    bounds the self-join fan-in, and the drop set is observable via
    simhash_bucket_stats."""
    hot = [(i, 0xABCDEF) for i in range(200)]  # one n=200 bucket per band
    # a small cold cluster that must SURVIVE the cap
    cold = [(1000, 0b1), (1001, 0b11)]  # hamming 1
    sh = spark.createDataFrame(hot + cold, "doc_id long, simhash long")

    capped = D.simhash_near_pairs(sh, "doc_id", 8, max_bucket_size=50).collect()
    got = {(r["id_a"], r["id_b"]) for r in capped}
    assert (1000, 1001) in got          # under-cap buckets keep their pairs
    assert not any(a < 1000 and b < 1000 for a, b in got)  # hot bucket dropped

    # the drop is a queryable number, not a guess
    stats = D.simhash_bucket_stats(sh, 8)
    dropped = stats.where(F.col("bucket_size") > 50).collect()
    assert len(dropped) == 9            # k+1 = 9 bands, all holding the hot value
    # low bands hold the 200 hot docs; high bands' zero-value buckets also
    # absorb the 2 cold docs (hot value has no bits there)
    assert all(r["bucket_size"] in (200, 202) for r in dropped)

    # uncapped stays exact on the same input (the cap is opt-in)
    exact = D.simhash_near_pairs(sh, "doc_id", 8).count()
    assert exact == 200 * 199 // 2 + 1


def test_minhash_empty_docs_never_pair(spark):
    """Empty shingle sets must not band together (NULL signature, not a
    shared sentinel): a corpus of many empty-feature docs yields zero
    candidate pairs among them. (Note word_shingles('') is [''] — a real
    single-token set; this guards the genuinely-empty-array path, e.g.
    filtered/tokenized features.)"""
    rows = [(i, "") for i in range(20)] + [(100, "a b c d e f"), (101, "a b c d e f")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    shingles = F.filter(D.word_shingles("text", 5), lambda s: F.length(s) > 0)
    pairs = D.minhash_band_pairs(df, "doc_id", shingles).collect()
    ids = {(r["id_a"], r["id_b"]) for r in pairs}
    assert ids == {(100, 101)}


def test_ngram_decontaminate_finds_planted_overlap(spark):
    from entity_linkings_spark.operators.dedup import ngram_decontaminate

    mk = " ".join(f"w{i}" for i in range(20))
    corpus = spark.createDataFrame(
        [(1, mk), (2, mk.replace("w3", "XX")), (3, "totally different words " * 5)],
        "doc_id long, text string",
    )
    benchmark = spark.createDataFrame([(mk,)], "text string")
    got = {r["doc_id"]: r["n_hits"] for r in
           ngram_decontaminate(corpus, benchmark, n=13).collect()}
    # doc 1 is an exact copy: all 8 distinct 13-grams collide. doc 2 differs
    # at word 3: only the 13-grams starting past it survive (positions 5-8).
    assert got == {1: 8, 2: 4}


def test_ngram_decontaminate_short_docs_whole_text(spark):
    from entity_linkings_spark.operators.dedup import ngram_decontaminate

    corpus = spark.createDataFrame([(1, "tiny doc"), (2, "other")],
                                   "doc_id long, text string")
    benchmark = spark.createDataFrame([("tiny doc",)], "text string")
    got = {r["doc_id"]: r["n_hits"] for r in
           ngram_decontaminate(corpus, benchmark, n=13).collect()}
    assert got == {1: 1}  # sub-n docs shingle to the whole text, both sides


def test_duplicate_spans_flags_shared_50grams(spark):
    from entity_linkings_spark.operators.dedup import duplicate_spans

    shared = " ".join(f"t{i}" for i in range(60))
    corpus = spark.createDataFrame(
        [(1, shared + " tailA tailB"),
         (2, "headX headY " + shared),
         (3, " ".join(f"u{i}" for i in range(80)))],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["n_dup_grams"] for r in
           duplicate_spans(corpus, n=50).collect()}
    # docs 1 and 2 share the 11 distinct 50-grams inside the 60-token block;
    # doc 3 shares nothing and must be absent
    assert set(got) == {1, 2}
    assert got[1] == got[2] == 11


def test_remove_boilerplate_lines_order_and_threshold(spark):
    from entity_linkings_spark.operators.dedup import remove_boilerplate_lines

    rows = [
        (1, "unique one\nSUBSCRIBE NOW\nalpha 1"),
        (2, "unique two\nSUBSCRIBE NOW\nalpha 2"),
        (3, "unique three\nSUBSCRIBE NOW\nalpha 3"),
        # trimming unifies the key: padded variant still counts as the same line
        (4, "unique four\n  SUBSCRIBE NOW  \nalpha 4"),
        # entirely boilerplate: must come back EMPTY, not vanish (ADVICE r5)
        (5, "SUBSCRIBE NOW"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["text"]
           for r in remove_boilerplate_lines(df, min_docs=3).collect()}
    assert out == {
        1: "unique one\nalpha 1",
        2: "unique two\nalpha 2",
        3: "unique three\nalpha 3",
        4: "unique four\nalpha 4",
        5: "",
    }
    # below threshold nothing is removed, order preserved under repartition
    # (SUBSCRIBE NOW is in 5 distinct docs: min_docs=6 keeps it)
    out2 = {r["doc_id"]: r["text"] for r in remove_boilerplate_lines(
        df.repartition(5), min_docs=6).collect()}
    assert out2 == {i: t for i, t in rows}


def test_explode_paragraphs_and_paragraph_near_dups(spark):
    from entity_linkings_spark.operators.dedup import (
        band_pairs,
        explode_paragraphs,
        minhash_bands,
        shingle_jaccard,
        word_shingles,
    )

    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    rows = [
        (1, f"{base} one\n\nunique prose of document one"),
        (2, f"{base} two\n\nother prose entirely different here"),
        (3, "\n\nlonely paragraph after blank"),  # leading blank is dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    paras = explode_paragraphs(df)
    got = {(r["doc_id"], r["para_idx"]): r["text"] for r in paras.collect()}
    # blank paragraphs never get a row; indices keep their original slot
    assert (3, 0) not in got and got[(3, 1)] == "lonely paragraph after blank"
    assert got[(1, 0)].startswith("alpha") and got[(2, 1)].startswith("other")
    # pid arithmetic: doc_id * 1_000_000 + para_idx
    assert {r["pid"] for r in paras.where("doc_id = 1").collect()} == {1_000_000, 1_000_001}
    # the generic band machinery finds the near-dup paragraph pair (docs 1/2
    # share 10 of 11 words in paragraph 0) and nothing else cross-doc
    bands = minhash_bands(paras, "pid", word_shingles("text", 5)).localCheckpoint()
    cand = band_pairs(bands, "pid").select("id_a", "id_b")
    v = shingle_jaccard(paras, cand, id_col="pid", text_col="text", n=5)
    hits = {(r["id_a"], r["id_b"]) for r in v.where("jaccard >= 0.5").collect()}
    assert hits == {(1_000_000, 2_000_000)}


def test_containment_pairs_find_embedded_docs(spark):
    from entity_linkings_spark.operators.dedup import containment_pairs

    long = " ".join(f"w{i}" for i in range(40))
    rows = [
        (1, long),
        (2, " ".join(f"w{i}" for i in range(14))),   # prefix of doc 1
        (3, "totally different words " + " ".join(f"u{i}" for i in range(30))),
        (4, long + " tail tail"),                     # symmetric near-dup of 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["id_a"], r["id_b"]): r for r in
           containment_pairs(df, min_shared=5, max_df=10).collect()}
    # the embedded prefix: containment 1.0 at low jaccard
    assert out[(1, 2)]["containment"] == 1.0 and out[(1, 2)]["jaccard"] < 0.4
    # the symmetric near-dup: both high
    assert out[(1, 4)]["containment"] == 1.0 and out[(1, 4)]["jaccard"] > 0.8
    assert not any(3 in k for k in out)  # unrelated doc never pairs


def test_duplicate_substring_runs_flags_long_quote_containment_misses(spark):
    """VERDICT r6 #5: a 30-token verbatim quote inside two otherwise-unique
    full-size documents escapes containment_pairs' verify (neither doc is
    mostly contained in the other) but duplicate_substring_runs flags the
    exact token interval in BOTH docs."""
    import random

    from entity_linkings_spark.operators.dedup import (
        containment_pairs,
        duplicate_substring_runs,
    )

    rng = random.Random(7)
    mk = lambda p, n: " ".join(f"{p}{rng.randint(0, 10**9)}" for _ in range(n))  # noqa: E731
    quote = " ".join(f"q{i}" for i in range(30))
    a = mk("a", 20) + " " + quote + " " + mk("z", 30)   # quote at tokens 21-50
    b = quote + " " + mk("b", 50)                       # quote at tokens 1-30
    c = mk("c", 60)                                     # unrelated
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id long, text string"
    )
    runs = {r["doc_id"]: (r["span_start"], r["span_end"], r["span_len"])
            for r in duplicate_substring_runs(df, k=10, min_len=25).collect()}
    assert runs == {1: (21, 51, 30), 2: (1, 31, 30)}
    # ...and the containment cascade really does miss this shape
    cont = containment_pairs(df, min_shared=8, max_df=20)
    assert cont.where("containment >= 0.9").count() == 0


def test_duplicate_substring_runs_merges_and_thresholds(spark):
    from entity_linkings_spark.operators.dedup import duplicate_substring_runs

    shared = " ".join(f"s{i}" for i in range(24))       # 24 < min_len 25
    d1 = shared + " " + " ".join(f"x{i}" for i in range(40))
    d2 = shared + " " + " ".join(f"y{i}" for i in range(40))
    df = spark.createDataFrame([(1, d1), (2, d2)], "doc_id long, text string")
    # a 24-token shared run merges to one 24-long span -> below threshold
    assert duplicate_substring_runs(df, k=10, min_len=25).count() == 0
    # at min_len 20 the same span surfaces once per doc, exact extent
    got = {r["doc_id"]: r["span_len"]
           for r in duplicate_substring_runs(df, k=10, min_len=20).collect()}
    assert got == {1: 24, 2: 24}
    # intra-doc repetition alone is NOT flagged (distinct-doc contract)
    rep = " ".join(f"r{i % 12}" for i in range(48))
    solo = spark.createDataFrame([(9, rep)], "doc_id long, text string")
    assert duplicate_substring_runs(solo, k=10, min_len=20).count() == 0


def test_cut_duplicate_substring_runs_earliest_holder_keeps(spark):
    from entity_linkings_spark.operators.dedup import (
        cut_duplicate_substring_runs,
    )

    quote = " ".join(f"q{i}" for i in range(30))
    a_head = " ".join(f"a{i}" for i in range(10))
    a_tail = " ".join(f"z{i}" for i in range(15))
    b_tail = " ".join(f"b{i}" for i in range(40))
    rows = [
        (1, a_head + " " + quote + " " + a_tail),  # earliest holder: keeps
        (2, quote + " " + b_tail),                 # later copy: span cut
        (3, " ".join(f"c{i}" for i in range(20))), # untouched
        (4, quote),                                # later copy, ALL tokens cut
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["text"]
           for r in cut_duplicate_substring_runs(df, k=10, min_len=25).collect()}
    assert got[1] == rows[0][1]          # keeper byte-identical
    assert got[2] == b_tail              # span excised, unique text kept
    assert got[3] == rows[2][1]          # no shared grams -> untouched
    assert got[4] == ""                  # fully-duplicated doc -> empty, not missing
    # below min_len nothing is cut even though grams are shared
    short = " ".join(f"s{i}" for i in range(20))
    df2 = spark.createDataFrame(
        [(1, short + " " + " ".join(f"x{i}" for i in range(30))),
         (2, short + " " + " ".join(f"y{i}" for i in range(30)))],
        "doc_id long, text string",
    )
    got2 = {r["doc_id"]: r["text"]
            for r in cut_duplicate_substring_runs(df2, k=10, min_len=25).collect()}
    assert got2[2].startswith(short)


def test_substring_family_matches_python_model(spark):
    """Spark == pure-Python model (tests/test_properties.py
    substring_runs_py / substring_cut_py) over seeded random corpora with
    heavy gram sharing — 12 independent corpora swept in ONE Spark job
    (tokens corpus-prefixed so no gram crosses corpora and the global run
    decomposes per corpus)."""
    import random

    from entity_linkings_spark.operators.dedup import (
        cut_duplicate_substring_runs,
        duplicate_substring_runs,
    )
    from tests.test_properties import substring_cut_py, substring_runs_py

    rng = random.Random(20260817)
    docs = {}
    for c in range(12):
        # small alphabet -> natural shared k-grams; plus one planted run
        alpha = [f"c{c}w{i}" for i in range(rng.randint(4, 7))]
        run = [f"c{c}r{i}" for i in range(rng.randint(6, 14))]
        ids = [c * 100 + i for i in range(1, rng.randint(3, 6))]
        for d in ids:
            docs[d] = [rng.choice(alpha) for _ in range(rng.randint(8, 28))]
        a, b = rng.sample(ids, 2)
        docs[a] = docs[a][:rng.randint(0, len(docs[a]))] + run + docs[a]
        docs[b] = run + docs[b]
    texts = {d: " ".join(w) for d, w in docs.items()}
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    k, min_len = 3, 5
    got_runs = {(r["doc_id"], r["span_start"], r["span_end"])
                for r in duplicate_substring_runs(df, k=k, min_len=min_len).collect()}
    want_runs = {(d, s, e) for d, s, e, _ in substring_runs_py(texts, k, min_len)}
    assert got_runs == want_runs
    got_cut = {r["doc_id"]: r["text"]
               for r in cut_duplicate_substring_runs(df, k=k, min_len=min_len).collect()}
    assert got_cut == substring_cut_py(texts, k, min_len)
