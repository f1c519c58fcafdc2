"""DuckDB SQL replica of the full linkage pipeline (the flagship
``pipeline_linkage`` driver query) — stage-for-stage:

    derived transcripts  -> mention extraction (regex cores, gaps-and-islands)
    -> distinct surfaces -> prior cascade (3-tier argmax)
    -> blocking (token keys + MinHash-LSH bands, capped)
    -> pair scoring (jw + OSA-DP + 3-gram jaccard blend)
    -> resolution (prior fast path, else blocked+scored argmax vs dictionary)
    -> clustering (entity clusters + NIL connected components, singletons)
    -> resolved mention instances

Every fragment mirrors the exact Catalyst expression of the corresponding
engine stage (see the stage comments referencing the Spark sources). The only
deliberate divergence: stage-4 pair scoring is computed here ONLY for
NIL-NIL pairs, because that is the only consumer of stage-4 scores in the
output (clusters); scoring is a deterministic pure function so filter-then-
score equals score-then-filter.

Assumption checked by tests: the dictionary derived from part names contains
no abbreviation-dot surface forms (letters+spaces only), so the extractor's
abbrev-dot span extension is a no-op on this corpus.
"""

from __future__ import annotations

from entity_linkings_spark.functions.hashing import MINHASH_PRIME
from entity_linkings_spark.functions.oracle_sql import combined_sql, osa_dp_sql
from entity_linkings_spark.operators.mentions import STOPWORDS

# ---------------------------------------------------------------------------
# stage fragments
# ---------------------------------------------------------------------------

# __spark_entry__._derived_transcripts: doc_id picks a part (row_number over
# p_partkey), doc_id % 4 picks the surface form, clause appended to the text
_TX = """
    tc_part AS MATERIALIZED (
        SELECT row_number() OVER (ORDER BY p_partkey) - 1 AS pidx, p_name,
               array_to_string(list_transform(string_split(lower(p_name), ' '),
                   w -> upper(w[1]) || w[2:]), ' ') AS tcname
        FROM part),
    tx AS MATERIALIZED (
        SELECT d.source AS conv_id,
               CAST(row_number() OVER (PARTITION BY d.source ORDER BY d.doc_id) - 1 AS INT) AS turn_idx,
               concat_ws(' ', d.text,
                 CASE d.doc_id % 4
                   WHEN 0 THEN p.tcname
                   WHEN 1 THEN upper(p.p_name)
                   WHEN 2 THEN substr(p.tcname, 1, 1) || substr(p.tcname, 3, 1)
                            || substr(p.tcname, 2, 1) || substr(p.tcname, 4)
                   ELSE lower(p.p_name) END,
                 'arrived.') AS text
        FROM documents d
        JOIN tc_part p ON p.pidx = d.doc_id % (SELECT count(*) FROM part))
"""

# __spark_entry__._part_dictionary + sources.dictionary: id = %06d min
# partkey, aliases = [UPPER, despaced]; prior.dictionary_alias_counts:
# explode(array_union([name], aliases)), count = 1
_DIC = """
    dic AS MATERIALIZED (SELECT printf('%06d', CAST(min(p_partkey) AS INT)) AS id, p_name AS name,
                   [upper(p_name), replace(p_name, ' ', '')] AS aliases
            FROM part GROUP BY p_name),
    dsurf AS MATERIALIZED (SELECT id AS entity_id,
                     unnest(list_distinct(list_prepend(name, aliases))) AS mention
              FROM dic),
    dtoks AS (SELECT DISTINCT tok FROM (
                SELECT unnest(regexp_extract_all(lower(mention), '[\\w#]+')) AS tok
                FROM dsurf)
              WHERE length(tok) >= 2),
    dtok_list AS MATERIALIZED (SELECT list(tok ORDER BY tok) AS toks FROM dtoks)
"""

_STOPWORDS_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)

# operators/mentions.py extract_mentions: word offsets (empty tokens advance
# the offset, emit nothing), regex core/trail split, anchor / capitalized /
# initial-dot classification, stopword guard only at widx 0, islands by
# widx - row_number, keep islands containing an anchor
_MENTIONS = f"""
    rawtoks AS MATERIALIZED (
        SELECT conv_id, turn_idx, pos, token,
               CAST(coalesce(sum(length(token) + 1) OVER (
                   PARTITION BY conv_id, turn_idx ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS INT) AS s
        FROM (SELECT conv_id, turn_idx,
                     generate_subscripts(string_split(text, ' '), 1) AS pos,
                     unnest(string_split(text, ' ')) AS token
              FROM tx)),
    words AS MATERIALIZED (SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY pos) - 1 AS widx
              FROM rawtoks WHERE token <> ''),
    cls AS MATERIALIZED (SELECT conv_id, turn_idx, widx,
                   regexp_extract(token, '^[^\\w]*([\\w](?:[\\w-]*[\\w])?)', 1) AS core,
                   s + length(regexp_extract(token, '^[^\\w]*', 0)) AS core_start,
                   substr(token,
                          length(regexp_extract(token, '^[^\\w]*', 0))
                          + length(regexp_extract(token, '^[^\\w]*([\\w](?:[\\w-]*[\\w])?)', 1)) + 1,
                          8) AS trail
            FROM words),
    flagged AS MATERIALIZED (
        SELECT cls.*, list_has_any(regexp_extract_all(lower(core), '[\\w]+'),
                                   dl.toks) AS anchor,
                  regexp_matches(core, '^[A-Z]') AS capitalized
        FROM cls, dtok_list dl),
    namelike AS MATERIALIZED (
        SELECT * FROM flagged
        WHERE anchor
           OR (length(core) = 1 AND capitalized AND starts_with(trail, '.'))
           OR (capitalized AND length(core) > 1
               AND (widx > 0 OR lower(core) NOT IN ({_STOPWORDS_SQL})))),
    isl AS MATERIALIZED (SELECT *, widx - row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY widx) AS grp
            FROM namelike),
    spans AS MATERIALIZED (
        SELECT conv_id, turn_idx,
               CAST(min(core_start) AS INT) AS start,
               CAST(max(core_start + length(core)) AS INT) AS "end"
        FROM isl GROUP BY conv_id, turn_idx, grp
        HAVING max(CASE WHEN anchor THEN 1 ELSE 0 END) = 1),
    mentions AS MATERIALIZED (
        SELECT s.conv_id, s.turn_idx, s.start, s."end",
               substr(t.text, s.start + 1, s."end" - s.start) AS mention,
               md5(s.conv_id || ':' || s.turn_idx || ':' || s.start || ':' || s."end") AS mention_id,
               md5(lower(trim(substr(t.text, s.start + 1, s."end" - s.start)))) AS skey
        FROM spans s JOIN tx t ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx)
"""

# operators/prior.py: 3 normalized tier aggregates, argmax per key with
# prior = count/total, cascade of left joins with coalesce
_PRIOR = """
    ac AS MATERIALIZED (SELECT entity_id, mention, CAST(1 AS BIGINT) AS cnt FROM dsurf),
    tiers AS MATERIALIZED (
        SELECT 'exact' AS tier, lower(trim(mention)) AS key, entity_id, sum(cnt) AS cnt
        FROM ac WHERE length(lower(trim(mention))) > 0 GROUP BY 2, 3
        UNION ALL
        SELECT 'despace', regexp_replace(lower(mention), '\\s+', '', 'g'), entity_id, sum(cnt)
        FROM ac WHERE length(regexp_replace(lower(mention), '\\s+', '', 'g')) > 0 GROUP BY 2, 3
        UNION ALL
        SELECT 'alnum', regexp_replace(lower(mention), '[\\W]+', '', 'g'), entity_id, sum(cnt)
        FROM ac WHERE length(regexp_replace(lower(mention), '[\\W]+', '', 'g')) > 0 GROUP BY 2, 3),
    best AS MATERIALIZED (
        SELECT tier, key, entity_id, cnt::DOUBLE / total AS prior FROM (
            SELECT *, row_number() OVER (PARTITION BY tier, key ORDER BY cnt DESC, entity_id ASC) AS rn,
                   sum(cnt) OVER (PARTITION BY tier, key) AS total
            FROM tiers) WHERE rn = 1),
    surf AS MATERIALIZED (SELECT surface, md5(surface) AS skey FROM (
                 SELECT DISTINCT lower(trim(mention)) AS surface FROM mentions)),
    spr AS MATERIALIZED (
        SELECT s.surface, s.skey,
               COALESCE(e.entity_id, d.entity_id, a.entity_id) AS prior_entity,
               COALESCE(e.prior, d.prior, a.prior) AS prior_score
        FROM surf s
        LEFT JOIN (SELECT * FROM best WHERE tier = 'exact') e
               ON lower(trim(s.surface)) = e.key
        LEFT JOIN (SELECT * FROM best WHERE tier = 'despace') d
               ON regexp_replace(lower(s.surface), '\\s+', '', 'g') = d.key
        LEFT JOIN (SELECT * FROM best WHERE tier = 'alnum') a
               ON regexp_replace(lower(s.surface), '[\\W]+', '', 'g') = a.key)
"""


def _blocking_keys(prefix: str, src: str, cap: int, num_bands: int = 8, rows_per_band: int = 4) -> str:
    """operators/blocking.py token_block_keys + lsh_block_keys + cap_blocks
    over a CTE ``src(skey, surface)``; emits ``{prefix}_capped``."""
    k = num_bands * rows_per_band
    sig_cols = ",\n               ".join(
        f"min((h1 + {i} * h2) % {MINHASH_PRIME}) AS s{i}" for i in range(k)
    )
    bands = ", ".join(
        "'mh{b}:' || md5({body})".format(
            b=b,
            body=" || ',' || ".join(
                f"s{b * rows_per_band + r}::VARCHAR" for r in range(rows_per_band)
            ),
        )
        for b in range(num_bands)
    )
    return f"""
    {prefix}_tok AS MATERIALIZED (
        SELECT skey, surface, 'tok:' || tok AS block_key FROM (
            SELECT skey, surface,
                   unnest(list_distinct(regexp_extract_all(lower(surface), '[\\w#]+'))) AS tok
            FROM {src})
        WHERE length(tok) >= 2),
    {prefix}_gh AS MATERIALIZED (
        SELECT skey, surface, unnest(
            CASE WHEN length(surface) <= 3 THEN [surface]
                 ELSE list_transform(generate_series(1, length(surface) - 2),
                                     i -> substr(surface, i, 3)) END) AS g
        FROM {src}),
    {prefix}_h AS MATERIALIZED (
        SELECT skey, surface,
               CAST(('0x' || substr(md5('mh1:' || g), 1, 7)) AS BIGINT) AS h1,
               CAST(('0x' || substr(md5('mh2:' || g), 1, 7)) AS BIGINT) AS h2
        FROM {prefix}_gh),
    {prefix}_sig AS MATERIALIZED (
        SELECT skey, surface,
               {sig_cols}
        FROM {prefix}_h GROUP BY skey, surface),
    {prefix}_lsh AS MATERIALIZED (
        SELECT skey, surface, unnest([{bands}]) AS block_key FROM {prefix}_sig),
    {prefix}_capped AS MATERIALIZED (
        SELECT skey, surface, block_key FROM (
            SELECT *, count(*) OVER (PARTITION BY block_key) AS bsize
            FROM (SELECT * FROM {prefix}_tok UNION ALL SELECT * FROM {prefix}_lsh))
        WHERE bsize >= 2 AND bsize <= {cap})
"""


# plans/pipeline.py pairs() -> candidate pairs; scoring only the NIL-NIL
# subset (the sole stage-4 consumer; see module docstring)
_PAIRS_CTE = """
    pairs AS MATERIALIZED (
        SELECT a.skey AS skey_a, b.skey AS skey_b,
               min(a.surface) AS surface_a, min(b.surface) AS surface_b
        FROM s3_capped a JOIN s3_capped b
          ON a.block_key = b.block_key AND a.skey < b.skey
        GROUP BY 1, 2)"""


def _pairs_and_nil_edges(match_threshold: float) -> str:
    return f"""
    {_PAIRS_CTE.strip()},
    nilpairs AS MATERIALIZED (
        SELECT p.skey_a || p.skey_b AS pair_id, p.surface_a AS a, p.surface_b AS b,
               p.skey_a, p.skey_b
        FROM pairs p
        JOIN resolved ra ON ra.skey = p.skey_a AND ra.entity_id = '-1'
        JOIN resolved rb ON rb.skey = p.skey_b AND rb.entity_id = '-1'),
    {osa_dp_sql("nilpairs", "p1")},
    niledges AS MATERIALIZED (
        SELECT np.skey_a AS u, np.skey_b AS v
        FROM nilpairs np JOIN p1_out o ON o.pair_id = np.pair_id
        WHERE {combined_sql("np.a", "np.b", "o.osa_dist")} >= {match_threshold})
"""


# plans/pipeline.py resolve(): mention surfaces without a prior blocked
# against dictionary surfaces (tagged union), scored, windowed argmax,
# threshold acceptance, NIL fallback
def _resolve(resolve_threshold: float, cap: int) -> str:
    return f"""
    dict_sk AS MATERIALIZED (
        SELECT surface, entity_id, md5(surface) AS skey FROM (
            SELECT DISTINCT lower(trim(mention)) AS surface, entity_id FROM ac)),
    need AS MATERIALIZED (SELECT skey, surface FROM spr WHERE prior_entity IS NULL),
    rtagged AS MATERIALIZED (SELECT skey, surface FROM need
                UNION ALL SELECT skey, surface FROM dict_sk),
    rside AS MATERIALIZED (SELECT DISTINCT skey, side FROM (
                  SELECT skey, 'm' AS side FROM need
                  UNION ALL SELECT skey, 'd' AS side FROM dict_sk)),
    {_blocking_keys("rk", "rtagged", cap)},
    rkeyed AS MATERIALIZED (SELECT k.*, s.side FROM rk_capped k JOIN rside s USING (skey)),
    rcand AS MATERIALIZED (
        SELECT m.skey AS skey_a, d.skey AS skey_b,
               min(m.surface) AS surface_a, min(d.surface) AS surface_b
        FROM (SELECT * FROM rkeyed WHERE side = 'm') m
        JOIN (SELECT * FROM rkeyed WHERE side = 'd') d USING (block_key)
        GROUP BY 1, 2),
    rcand_p AS MATERIALIZED (SELECT skey_a || skey_b AS pair_id, surface_a AS a, surface_b AS b,
                       skey_a, skey_b
                FROM rcand),
    {osa_dp_sql("rcand_p", "p2")},
    rbest AS MATERIALIZED (
        SELECT skey_a AS skey, entity_id AS scored_entity, combined AS scored_score FROM (
            SELECT rp.skey_a, ds.entity_id,
                   {combined_sql("rp.a", "rp.b", "o.osa_dist")} AS combined,
                   row_number() OVER (
                       PARTITION BY rp.skey_a
                       ORDER BY {combined_sql("rp.a", "rp.b", "o.osa_dist")} DESC,
                                ds.entity_id ASC) AS rn
            FROM rcand_p rp
            JOIN p2_out o ON o.pair_id = rp.pair_id
            JOIN dict_sk ds ON ds.skey = rp.skey_b) WHERE rn = 1),
    resolved AS MATERIALIZED (
        SELECT p.skey, p.surface,
               COALESCE(p.prior_entity,
                        CASE WHEN b.scored_score >= {resolve_threshold}
                             THEN b.scored_entity END,
                        '-1') AS entity_id,
               COALESCE(p.prior_score, b.scored_score, 0.0) AS score
        FROM spr p LEFT JOIN rbest b USING (skey))
"""


# plans/pipeline.py clusters() + operators/clustering.py: entity clusters for
# resolved surfaces, recursive-closure connected components over NIL-NIL
# match edges (cluster id = min skey), singletons via the final coalesce
_CLUSTERS = """
    entcl AS (SELECT skey AS node, 'ent:' || entity_id AS cluster_id
              FROM resolved WHERE entity_id <> '-1'),
    ccedges AS MATERIALIZED (SELECT u, v FROM niledges UNION SELECT v, u FROM niledges),
    ccnodes AS MATERIALIZED (SELECT DISTINCT u AS node FROM ccedges),
    reach(src, dst) AS (
        SELECT u, v FROM ccedges
        UNION
        SELECT r.src, e.v FROM reach r JOIN ccedges e ON r.dst = e.u),
    cc AS MATERIALIZED (SELECT n.node, least(n.node, min(r.dst)) AS cluster_id
           FROM ccnodes n LEFT JOIN reach r ON r.src = n.node
           GROUP BY n.node),
    clusters AS MATERIALIZED (SELECT * FROM entcl UNION ALL SELECT * FROM cc)
"""

_FINAL = """
    SELECT m.conv_id, m.turn_idx, m.start, m."end", m.mention, m.mention_id,
           COALESCE(cl.cluster_id, m.skey) AS cluster_id,
           r.entity_id,
           round(r.score, 6) AS score
    FROM mentions m
    LEFT JOIN clusters cl ON cl.node = m.skey
    LEFT JOIN resolved r ON r.skey = m.skey
"""


def _pipeline_ctes(
    match_threshold: float = 0.90,
    resolve_threshold: float = 0.62,
    max_block_size: int = 1000,
) -> str:
    return "WITH RECURSIVE\n" + ",\n".join(
        [
            _TX.strip().rstrip(","),
            _DIC.strip(),
            _MENTIONS.strip(),
            _PRIOR.strip(),
            _blocking_keys("s3", "spr", max_block_size).strip(),
            _resolve(resolve_threshold, max_block_size * 2).strip(),
            _pairs_and_nil_edges(match_threshold).strip(),
            _CLUSTERS.strip(),
        ]
    )


def pipeline_linkage_sql(
    match_threshold: float = 0.90,
    resolve_threshold: float = 0.62,
    max_block_size: int = 1000,
) -> str:
    """The complete flagship oracle (LinkageConfig defaults)."""
    return (
        _pipeline_ctes(match_threshold, resolve_threshold, max_block_size)
        + "\n"
        + _FINAL
    )


def blocking_pairs_sql(max_block_size: int = 1000) -> str:
    """J8 candidate x mention pairing as its own oracle: the pipeline's
    blocking stage (token + MinHash-LSH keys, capped blocks, canonical
    skey_a < skey_b pairs) over the derived corpus — the exact pairs CTE the
    flagship consumes, selected as the result instead of feeding scoring."""
    return (
        "WITH RECURSIVE\n"
        + ",\n".join(
            [
                _TX.strip().rstrip(","),
                _DIC.strip(),
                _MENTIONS.strip(),
                _PRIOR.strip(),
                _blocking_keys("s3", "spr", max_block_size).strip(),
                _PAIRS_CTE.strip(),
            ]
        )
        + "\nSELECT skey_a, skey_b, surface_a, surface_b FROM pairs"
    )


def top1_accuracy_sql() -> str:
    """A4 top-1 accuracy of the FULL pipeline against the planted gold: the
    derived corpus appends one part-name mention clause per turn
    (__spark_entry__._derived_transcripts — doc_id picks the part, doc_id%4
    the surface form), so each turn's gold entity is the %06d min-partkey of
    that part name. A turn scores a hit when any of its resolved mentions
    carries the gold entity id (utils.py:132-135 corrects/golds, lifted to
    turn level because the planted clause's char span depends on the base
    text)."""
    return (
        _pipeline_ctes()
        + ",\n"
        + """
    final AS MATERIALIZED (
        SELECT m.conv_id, m.turn_idx, r.entity_id
        FROM mentions m LEFT JOIN resolved r ON r.skey = m.skey),
    gold AS (
        SELECT d.source AS conv_id,
               CAST(row_number() OVER (PARTITION BY d.source ORDER BY d.doc_id) - 1 AS INT) AS turn_idx,
               pg.gold_entity
        FROM documents d
        JOIN (SELECT row_number() OVER (ORDER BY p_partkey) - 1 AS pidx, p_name
              FROM part) pp ON pp.pidx = d.doc_id % (SELECT count(*) FROM part)
        JOIN (SELECT p_name, printf('%06d', CAST(min(p_partkey) AS INT)) AS gold_entity
              FROM part GROUP BY p_name) pg ON pg.p_name = pp.p_name),
    per_turn AS (
        SELECT g.conv_id, g.turn_idx,
               max(CASE WHEN f.entity_id = g.gold_entity THEN 1 ELSE 0 END) AS hit
        FROM gold g
        LEFT JOIN final f ON f.conv_id = g.conv_id AND f.turn_idx = g.turn_idx
        GROUP BY 1, 2)
    SELECT CAST(count(*) AS BIGINT) AS n_turns,
           round(avg(hit), 6) AS top1_accuracy
    FROM per_turn
"""
    )
