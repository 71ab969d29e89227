"""Driver-contract queries + DuckDB oracle SQL (consumed by __spark_entry__.py).

The driver pre-registers only the generic tables (region nation customer supplier
part orders lineitem events documents embeddings) as DuckDB views, so the KG
pipeline's input tables (transcripts/dico/kb_edges/gold — FIXTURES.md shapes) are
*derived deterministically* from events+nation here, in both engines:

  * transcripts: one turn per event; conv_id = user bucket; text embeds two
    nation names (the dictionary aliases) in a fixed French template;
  * dico: one candidate group per nation; every 5th nation gets a second
    "shadow" group => ambiguous aliases exercising the graph path;
  * kb_edges: region-shared resources hanging off alt-URI subjects (the
    alias-folding path), solo resources (pruned), owl:sameAs to ext URIs for
    even keys, a shadow cluster resource;
  * gold: the intended nation entity per occurrence.

Every queries() entry calls the production operators; every oracle_sql() entry
restates the same semantics in ANSI-ish DuckDB SQL over the same derivation.
Hash-sensitive outputs avoid arrays and raw floats (joined strings / rounded
doubles / ranks instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .checkpointing import checkpoint
from .functions.text import SAME_AS
from .operators.candidates import conversation_cases, generate_candidates
from .operators.canonicalize import connected_components, materialize_triples, sameas_edge_frame
from .operators.disambiguate import (
    NELConfig,
    choose_links,
    fuse_edges,
    prune_and_degree,
)
from .operators.disambiguate import disambiguate as disambiguate_relational
from .operators.evaluate import eval_records, hachey_metrics
from .operators.mentions import detect_mentions

BASE = "http://kb.test/base"
CFG = NELConfig(base_prefix=BASE, preferred_uri=BASE)
PRED_KNOWS = "http://kb.test/pred/knows"
PRED_ASSOC = "http://kb.test/pred/assoc"

# ---------------------------------------------------------------------------
# Spark-side derivation (events + nation -> KG input tables)
# ---------------------------------------------------------------------------


# every contract cache registers here so sf_dir-recency eviction (see
# _evict_stale) can sweep all of them at once
_ALL_CACHES: list[dict] = []
# the 2 most-recently-touched sf_dirs; older dirs' entries are evicted from
# every cache (a multi-dir sweep would otherwise pin each dir's
# localCheckpoint blocks for the life of the session — round-4 ADVICE)
_SFDIR_LRU: list[str] = []

_READ_CACHE: dict[tuple, DataFrame] = {}
_ALL_CACHES.append(_READ_CACHE)


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Plan-level memo of the table scans: every `spark.read.parquet` call
    pays a driver-side listing + footer schema read (~0.2-0.4 s each on this
    host), and one contract query's derivation chain re-reads events/nation
    several times. The cached object is just the unexecuted scan plan —
    results are identical; the fingerprint key invalidates on regenerated
    files (same discipline as _kg_stack)."""
    key = (
        spark.sparkContext.applicationId,
        str(sf_dir),
        name,
        _sf_fingerprint(str(sf_dir)),
    )
    hit = _READ_CACHE.get(key)
    if hit is None:
        _evict_stale(_READ_CACHE, key[0], key)
        hit = _READ_CACHE[key] = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    else:
        _touch_sfdir(key[1])
    return hit


def derive_turns_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _read(spark, sf_dir, "events")
    nat = _read(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    base = ev.select(
        F.concat(F.lit("c"), (F.col("user_id") % 40).cast("string")).alias("conv_id"),
        "ts",
        "event_id",
        (F.col("event_id") % 25).cast("int").alias("k1"),
        ((F.col("event_id") % 25 + 1 + F.col("event_id") % 13) % 25).cast("int").alias("k2"),
        F.when(F.col("event_id") % 3 == 0, "user")
        .when(F.col("event_id") % 3 == 1, "assistant")
        .otherwise("tool")
        .alias("role"),
    )
    w = Window.partitionBy("conv_id").orderBy("ts", "event_id")
    # 'X' suffix => no alias is a prefix/substring of another (NATION_1 vs NATION_12)
    n1 = nat.select(F.col("n_nationkey").alias("k1"), F.concat("n_name", F.lit("X")).alias("n1"))
    n2 = nat.select(F.col("n_nationkey").alias("k2"), F.concat("n_name", F.lit("X")).alias("n2"))
    return (
        base.join(F.broadcast(n1), "k1")
        .join(F.broadcast(n2), "k2")
        .withColumn("turn_idx", (F.row_number().over(w) - F.lit(1)).cast("int"))
        .withColumn(
            "text",
            F.concat(F.lit("On parla de "), "n1", F.lit(" puis de "), "n2", F.lit(" ensemble.")),
        )
    )


def derive_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return derive_turns_raw(spark, sf_dir).select(
        "conv_id", "turn_idx", "role", "text", F.lit(None).cast("string").alias("tool"), "ts"
    )


def derive_dico(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = _read(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    k = F.col("n_nationkey").cast("string")
    alias = F.concat("n_name", F.lit("X"))
    main = nat.select(
        alias.alias("alias"),
        F.lower(F.regexp_replace(alias, r"\s|'|-", "")).alias("alias_norm"),
        alias.alias("name"),
        F.lit("LOC").alias("ne_type"),
        F.array(F.concat(F.lit(f"{BASE}/nat/"), k), F.concat(F.lit("http://kb.test/alt/nat/"), k)).alias("uris"),
    )
    shadow = nat.filter(F.col("n_nationkey") % 5 == 0).select(
        alias.alias("alias"),
        F.lower(F.regexp_replace(alias, r"\s|'|-", "")).alias("alias_norm"),
        alias.alias("name"),
        F.lit("LOC").alias("ne_type"),
        F.array(
            F.concat(F.lit(f"{BASE}/shadow/"), k), F.concat(F.lit("http://kb.test/alt/shadow/"), k)
        ).alias("uris"),
    )
    return main.unionByName(shadow)


def derive_mention_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return derive_dico(spark, sf_dir).select(F.col("alias").alias("term"), "ne_type").distinct()


def derive_kb_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = _read(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    k = F.col("n_nationkey").cast("string")
    r = F.col("n_regionkey").cast("string")
    alt = F.concat(F.lit("http://kb.test/alt/nat/"), k)
    base = F.concat(F.lit(f"{BASE}/nat/"), k)
    ext = F.concat(F.lit("http://ext.kb/nat/"), k)
    reg_res = F.concat(F.lit("http://kb.test/res/reg/"), r)
    reg_res2 = F.concat(F.lit("http://kb.test/res/reg/"), r, F.lit("/x"), (F.col("n_nationkey") % 2).cast("string"))
    one = F.lit(1.0)
    parts = [
        nat.select(alt.alias("subj"), F.lit(PRED_KNOWS).alias("pred"), reg_res.alias("obj"), one.alias("weight")),
        nat.select(alt.alias("subj"), F.lit(PRED_KNOWS).alias("pred"), reg_res2.alias("obj"), one.alias("weight")),
        nat.select(
            alt.alias("subj"),
            F.lit(PRED_ASSOC).alias("pred"),
            F.concat(F.lit("http://kb.test/res/solo/"), k).alias("obj"),
            one.alias("weight"),
        ),
        nat.filter(F.col("n_nationkey") % 2 == 0).select(
            base.alias("subj"), F.lit(SAME_AS).alias("pred"), ext.alias("obj"), one.alias("weight")
        ),
        nat.filter(F.col("n_nationkey") % 2 == 0).select(
            ext.alias("subj"), F.lit(PRED_ASSOC).alias("pred"), reg_res.alias("obj"), one.alias("weight")
        ),
        nat.filter(F.col("n_nationkey") % 5 == 0).select(
            F.concat(F.lit("http://kb.test/alt/shadow/"), k).alias("subj"),
            F.lit(PRED_KNOWS).alias("pred"),
            F.lit("http://kb.test/res/shadowland").alias("obj"),
            one.alias("weight"),
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def derive_gold(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = derive_turns_raw(spark, sf_dir)
    g1 = raw.select(
        "conv_id",
        "turn_idx",
        F.lit(0).cast("int").alias("occ_idx"),
        F.col("n1").alias("mention"),
        F.concat(F.lit(f"{BASE}/nat/"), F.col("k1").cast("string")).alias("gold_uri"),
    )
    g2 = raw.select(
        "conv_id",
        "turn_idx",
        F.lit(1).cast("int").alias("occ_idx"),
        F.col("n2").alias("mention"),
        F.concat(F.lit(f"{BASE}/nat/"), F.col("k2").cast("string")).alias("gold_uri"),
    )
    return g1.unionByName(g2)


def empty_rel_weights(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], "pred string, weight double")


_STACK_CACHE: dict[tuple, dict[str, DataFrame]] = {}
_ALL_CACHES.append(_STACK_CACHE)


def _sf_fingerprint(sf_dir: str) -> tuple:
    """Cheap content fingerprint of the parquet files under sf_dir (name, size,
    mtime). Regenerating the data in-place within one application changes the
    fingerprint, so memoized stacks derived from the old files are not served
    stale."""
    import os

    out = []
    try:
        for name in sorted(os.listdir(sf_dir)):
            if name.endswith(".parquet"):
                st = os.stat(os.path.join(sf_dir, name))
                out.append((name, st.st_size, int(st.st_mtime_ns)))
    except OSError:
        pass
    return tuple(out)


def _unpersist_frames(obj) -> None:
    """Best-effort release of an evicted entry's eagerly-checkpointed blocks so
    they don't pin executor memory until GC."""
    frames = obj.values() if isinstance(obj, dict) else [obj]
    for df in frames:
        try:
            df.unpersist()
        except Exception:
            pass


def _evict_stale(cache: dict, app_id: str, key=None) -> None:
    """Drop cache entries keyed by other applicationIds (stopped sessions whose
    checkpointed frames are unusable) or by an outdated sf_dir fingerprint,
    unpersisting their frames on the way out. Also bounds ALL caches to the 2
    most-recently-touched sf_dirs (key[1] is always the sf_dir) so a
    multi-dir sweep cannot accumulate localCheckpoint blocks without limit."""
    # fingerprint is always the LAST key element: an entry matching on
    # everything but the fingerprint was derived from since-regenerated data
    for stale in [
        k for k in cache if k[0] != app_id or (key is not None and k[:-1] == key[:-1] and k != key)
    ]:
        _unpersist_frames(cache.pop(stale))
    if key is not None:
        _touch_sfdir(key[1])


def _touch_sfdir(sf_dir: str) -> None:
    """Mark sf_dir most-recently-used and sweep beyond-bound dirs from ALL
    caches. Called on cache HITS as well as misses — otherwise a dir served
    purely from hits never refreshes its LRU slot and one query on a new dir
    would evict the hot dir's localCheckpoint blocks out from under callers
    still holding its frames."""
    if sf_dir in _SFDIR_LRU:
        _SFDIR_LRU.remove(sf_dir)
    _SFDIR_LRU.insert(0, sf_dir)
    for dropped in _SFDIR_LRU[2:]:
        for c in _ALL_CACHES:
            for k in [k for k in c if k[1] == dropped]:
                _unpersist_frames(c.pop(k))
    del _SFDIR_LRU[2:]


def _kg_stack(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Derive the KG input stack once per (application, sf_dir).

    Dozens of contract queries share this derivation; the shared stage outputs
    (mentions, candidates, cases) are pinned as eager local checkpoints so the
    mention-detection UDF and candidate join run once per session, not once
    per query (eager also prevents AQE's concurrent stage submission from
    re-executing a lazily-checkpointed frame per consumer). Results are
    unchanged — the cache stores the exact DataFrames a fresh derivation
    would return."""
    key = (spark.sparkContext.applicationId, str(sf_dir), _sf_fingerprint(str(sf_dir)))
    hit = _STACK_CACHE.get(key)
    if hit is not None:
        _touch_sfdir(key[1])
        return hit
    _evict_stale(_STACK_CACHE, key[0], key)
    transcripts = derive_transcripts(spark, sf_dir)
    terms = derive_mention_terms(spark, sf_dir)
    dico = derive_dico(spark, sf_dir)
    kb = derive_kb_edges(spark, sf_dir)
    rels = empty_rel_weights(spark)
    mentions = checkpoint(detect_mentions(transcripts, terms))
    candidates = checkpoint(generate_candidates(mentions, dico))
    cases = checkpoint(conversation_cases(mentions, candidates))
    stack = {
        "transcripts": transcripts,
        "dico": dico,
        "kb_edges": kb,
        "rel_weights": rels,
        "mentions": mentions,
        "candidates": candidates,
        "cases": cases,
    }
    _STACK_CACHE[key] = stack
    return stack


# ---------------------------------------------------------------------------
# The SQL twin: one CTE chain restating the derivation + every pipeline stage
# ---------------------------------------------------------------------------

SQL_PREFIX = f"""
WITH RECURSIVE turns_raw AS (
  SELECT 'c' || CAST(user_id % 40 AS VARCHAR) AS conv_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id % 40 ORDER BY ts, event_id) - 1 AS INTEGER) AS turn_idx,
         CASE CAST(event_id % 3 AS INTEGER) WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
         CAST(event_id % 25 AS INTEGER) AS k1,
         CAST((event_id % 25 + 1 + event_id % 13) % 25 AS INTEGER) AS k2,
         n1.n_name || 'X' AS n1, n2.n_name || 'X' AS n2,
         'On parla de ' || n1.n_name || 'X puis de ' || n2.n_name || 'X ensemble.' AS text
  FROM events e
  JOIN nation n1 ON n1.n_nationkey = CAST(e.event_id % 25 AS INTEGER)
  JOIN nation n2 ON n2.n_nationkey = CAST((e.event_id % 25 + 1 + e.event_id % 13) % 25 AS INTEGER)
),
transcripts AS (SELECT conv_id, turn_idx, role, text FROM turns_raw),
dico AS (
  SELECT n_name || 'X' AS alias, lower(regexp_replace(n_name || 'X', '[\\s\\x0b\\xa0 ]|''|-', '', 'g')) AS alias_norm,
         n_name || 'X' AS name, 'LOC' AS ne_type,
         ['{BASE}/nat/' || CAST(n_nationkey AS VARCHAR),
          'http://kb.test/alt/nat/' || CAST(n_nationkey AS VARCHAR)] AS uris
  FROM nation
  UNION ALL
  SELECT n_name || 'X', lower(regexp_replace(n_name || 'X', '[\\s\\x0b\\xa0 ]|''|-', '', 'g')), n_name || 'X', 'LOC',
         ['{BASE}/shadow/' || CAST(n_nationkey AS VARCHAR),
          'http://kb.test/alt/shadow/' || CAST(n_nationkey AS VARCHAR)]
  FROM nation WHERE n_nationkey % 5 = 0
),
kb_edges AS (
  SELECT 'http://kb.test/alt/nat/' || CAST(n_nationkey AS VARCHAR) AS subj,
         '{PRED_KNOWS}' AS pred,
         'http://kb.test/res/reg/' || CAST(n_regionkey AS VARCHAR) AS obj, 1.0 AS weight FROM nation
  UNION ALL
  SELECT 'http://kb.test/alt/nat/' || CAST(n_nationkey AS VARCHAR), '{PRED_KNOWS}',
         'http://kb.test/res/reg/' || CAST(n_regionkey AS VARCHAR) || '/x' || CAST(n_nationkey % 2 AS VARCHAR), 1.0 FROM nation
  UNION ALL
  SELECT 'http://kb.test/alt/nat/' || CAST(n_nationkey AS VARCHAR), '{PRED_ASSOC}',
         'http://kb.test/res/solo/' || CAST(n_nationkey AS VARCHAR), 1.0 FROM nation
  UNION ALL
  SELECT '{BASE}/nat/' || CAST(n_nationkey AS VARCHAR), '{SAME_AS}',
         'http://ext.kb/nat/' || CAST(n_nationkey AS VARCHAR), 1.0 FROM nation WHERE n_nationkey % 2 = 0
  UNION ALL
  SELECT 'http://ext.kb/nat/' || CAST(n_nationkey AS VARCHAR), '{PRED_ASSOC}',
         'http://kb.test/res/reg/' || CAST(n_regionkey AS VARCHAR), 1.0 FROM nation WHERE n_nationkey % 2 = 0
  UNION ALL
  SELECT 'http://kb.test/alt/shadow/' || CAST(n_nationkey AS VARCHAR), '{PRED_KNOWS}',
         'http://kb.test/res/shadowland', 1.0 FROM nation WHERE n_nationkey % 5 = 0
),
gold AS (
  SELECT conv_id, turn_idx, CAST(0 AS INTEGER) AS occ_idx, n1 AS mention,
         '{BASE}/nat/' || CAST(k1 AS VARCHAR) AS gold_uri FROM turns_raw
  UNION ALL
  SELECT conv_id, turn_idx, CAST(1 AS INTEGER), n2,
         '{BASE}/nat/' || CAST(k2 AS VARCHAR) FROM turns_raw
),
mentions AS (
  SELECT conv_id, turn_idx,
         CAST(ROW_NUMBER() OVER (PARTITION BY conv_id, turn_idx ORDER BY strpos(text, alias)) - 1 AS INTEGER) AS occ_idx,
         alias AS mention,
         CAST(strpos(text, alias) - 1 AS INTEGER) AS start_pos
  FROM transcripts t JOIN (SELECT DISTINCT alias FROM dico) d
    ON strpos(t.text, d.alias) > 0
   -- whole-word boundaries (NATION_1 must not match inside NATION_12)
   AND NOT regexp_matches(substring(t.text, strpos(t.text, d.alias) + length(d.alias), 1), '\\w')
   AND (strpos(t.text, d.alias) = 1
        OR NOT regexp_matches(substring(t.text, strpos(t.text, d.alias) - 1, 1), '\\w'))
),
candidates AS (
  SELECT conv_id, mention,
         CAST(ROW_NUMBER() OVER (PARTITION BY conv_id, mention ORDER BY uris) - 1 AS INTEGER) AS group_idx,
         uris
  FROM (SELECT DISTINCT m.conv_id, m.mention, d.uris
        FROM (SELECT DISTINCT conv_id, mention FROM mentions) m
        JOIN dico d ON lower(regexp_replace(m.mention, '[\\s\\x0b\\xa0 ]|''|-', '', 'g')) = d.alias_norm)
),
cases AS (
  SELECT m.conv_id, CASE WHEN MAX(COALESCE(g.n_groups, 0)) > 1 THEN 'Ok' ELSE 'NoAmbiguity' END AS route
  FROM (SELECT DISTINCT conv_id, mention FROM mentions) m
  LEFT JOIN (SELECT conv_id, mention, COUNT(*) AS n_groups FROM candidates GROUP BY 1, 2) g
    USING (conv_id, mention)
  GROUP BY 1
),
cand_ok AS (SELECT c.* FROM candidates c JOIN cases USING (conv_id) WHERE route = 'Ok'),
members AS (SELECT conv_id, mention, group_idx, uris, unnest(uris) AS member FROM cand_ok),
with_base AS (
  SELECT *, list_filter(uris, u -> contains(u, '{BASE}'))[-1] AS base_uri FROM members
),
sameas AS (SELECT subj AS member, obj AS sameas_obj FROM kb_edges WHERE pred = '{SAME_AS}'),
alias_pairs AS (
  SELECT DISTINCT conv_id, base_uri, alias FROM (
    SELECT w.conv_id, w.base_uri, s.sameas_obj AS alias
    FROM with_base w JOIN sameas s ON w.member = s.member
    WHERE contains(w.member, '{BASE}')
    UNION ALL
    SELECT conv_id, base_uri, member FROM with_base WHERE NOT contains(member, '{BASE}')
  ) WHERE lower(alias) != lower(base_uri)
),
fused_raw AS (
  SELECT a.conv_id, a.base_uri AS src, k.obj AS dst, k.pred
  FROM alias_pairs a JOIN kb_edges k ON a.alias = k.subj
  WHERE k.pred != '{SAME_AS}' AND lower(a.base_uri) != lower(k.obj)
),
edges AS (
  SELECT conv_id, src, dst, MIN(pred) AS pred, 1.0 AS weight FROM fused_raw GROUP BY 1, 2, 3
),
colored AS (SELECT DISTINCT conv_id, member AS v FROM members WHERE contains(member, '{BASE}')),
inv AS (SELECT conv_id, member AS v, MAX(mention) AS inv_mention FROM members GROUP BY 1, 2),
ends AS (
  SELECT conv_id, src AS v, dst AS other FROM edges
  UNION ALL SELECT conv_id, dst, src FROM edges
),
bridge AS (
  SELECT e.conv_id, e.v, COUNT(DISTINCT i.inv_mention) AS n_mentions
  FROM ends e
  LEFT JOIN colored cv ON cv.conv_id = e.conv_id AND cv.v = e.v
  JOIN colored co ON co.conv_id = e.conv_id AND co.v = e.other
  LEFT JOIN inv i ON i.conv_id = e.conv_id AND i.v = e.other
  WHERE cv.v IS NULL AND e.v != e.other
  GROUP BY 1, 2
),
survivors AS (
  SELECT conv_id, v FROM colored UNION SELECT conv_id, v FROM bridge WHERE n_mentions >= 2
),
pruned AS (
  SELECT e.* FROM edges e
  JOIN survivors s1 ON s1.conv_id = e.conv_id AND s1.v = e.src
  JOIN survivors s2 ON s2.conv_id = e.conv_id AND s2.v = e.dst
),
degrees AS (
  SELECT conv_id, v, CAST(COUNT(*) AS DOUBLE) AS degree FROM (
    SELECT conv_id, src AS v FROM pruned UNION ALL SELECT conv_id, dst FROM pruned
  ) GROUP BY 1, 2
),
scored AS (
  SELECT m.conv_id, m.mention, m.member AS dec, COALESCE(d.degree, 0.0) AS score
  FROM members m
  JOIN colored c ON c.conv_id = m.conv_id AND c.v = m.member
  LEFT JOIN degrees d ON d.conv_id = m.conv_id AND d.v = m.member
),
winners AS (
  SELECT conv_id, mention, dec AS winner, score FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY conv_id, mention ORDER BY score DESC, dec DESC) AS rn
    FROM (SELECT DISTINCT conv_id, mention, dec, score FROM scored)
  ) WHERE rn = 1
),
matching AS (
  SELECT DISTINCT m.conv_id, m.mention, m.group_idx, m.uris, w.winner, w.score
  FROM members m JOIN winners w ON w.conv_id = m.conv_id AND w.mention = m.mention AND m.member = w.winner
),
graph_chosen AS (
  SELECT conv_id, mention,
         COALESCE(list_filter(uris, u -> contains(u, '{BASE}'))[-1], winner) AS chosen_uris,
         score, 'graph' AS path
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY conv_id, mention ORDER BY group_idx DESC) AS rn FROM matching)
  WHERE rn = 1
),
simple_chosen AS (
  SELECT c.conv_id, c.mention, array_to_string(uris, ' ') AS chosen_uris,
         CAST(NULL AS DOUBLE) AS score, 'simple' AS path
  FROM candidates c JOIN cases ca USING (conv_id)
  WHERE ca.route = 'NoAmbiguity' AND group_idx = 0
),
links AS (
  SELECT m.conv_id, m.turn_idx, m.occ_idx, m.mention, ch.chosen_uris, ch.score, ch.path
  FROM mentions m
  JOIN (SELECT * FROM graph_chosen UNION ALL SELECT * FROM simple_chosen) ch
    USING (conv_id, mention)
),
eq_edges AS (
  SELECT subj AS a, obj AS b FROM kb_edges WHERE pred = '{SAME_AS}'
  UNION
  SELECT uris[1] AS a, unnest(uris) AS b FROM dico
),
sym AS (
  SELECT a, b FROM eq_edges WHERE a != b
  UNION SELECT b, a FROM eq_edges WHERE a != b
),
reach(v, lab) AS (
  SELECT v, v FROM (SELECT a AS v FROM sym UNION SELECT b FROM sym)
  UNION
  SELECT s.a, r.lab FROM sym s JOIN reach r ON s.b = r.v
),
canon AS (SELECT v AS uri, MIN(lab) AS canonical FROM reach GROUP BY 1),
chosen_flat AS (
  SELECT conv_id, turn_idx, occ_idx, unnest(string_split(chosen_uris, ' ')) AS uri
  FROM links WHERE chosen_uris != ''
),
canon_chosen AS (
  SELECT conv_id, turn_idx, occ_idx, MIN(COALESCE(c.canonical, f.uri)) AS entity
  FROM chosen_flat f LEFT JOIN canon c ON c.uri = f.uri
  GROUP BY 1, 2, 3
),
link_triples AS (
  SELECT 'urn:mention:' || conv_id || ':' || CAST(turn_idx AS VARCHAR) || ':' || CAST(occ_idx AS VARCHAR) AS subj,
         'http://kg.test/linksTo' AS pred, entity AS obj
  FROM canon_chosen
),
kbc AS (
  SELECT COALESCE(cs.canonical, k.subj) AS subj, k.pred, COALESCE(co.canonical, k.obj) AS obj
  FROM kb_edges k
  LEFT JOIN canon cs ON cs.uri = k.subj
  LEFT JOIN canon co ON co.uri = k.obj
  WHERE k.pred != '{SAME_AS}'
),
triples AS (
  SELECT DISTINCT subj, pred, obj FROM (
    SELECT * FROM link_triples
    UNION ALL
    SELECT kbc.* FROM kbc JOIN (SELECT DISTINCT entity FROM canon_chosen) e ON kbc.subj = e.entity
  )
),
eval_flags AS (
  SELECT g.conv_id, g.mention, g.gold_uri,
         COUNT(c.group_idx) AS n_groups,
         MAX(CASE WHEN g.gold_uri IS NOT NULL AND c.uris IS NOT NULL
                  AND len(list_filter(c.uris, u -> contains(lower(u), lower(g.gold_uri)))) > 0
                  THEN TRUE ELSE FALSE END) AS correct_in_cand
  FROM (SELECT DISTINCT conv_id, mention, gold_uri FROM gold) g
  LEFT JOIN candidates c ON c.conv_id = g.conv_id AND c.mention = g.mention
  GROUP BY 1, 2, 3
),
eval_recs AS (
  SELECT g.conv_id, g.turn_idx, g.occ_idx, g.mention, g.gold_uri,
         COALESCE(f.n_groups, 0) AS n_groups,
         COALESCE(f.correct_in_cand, FALSE) AS correct_in_cand,
         l.chosen_uris,
         (g.gold_uri IS NOT NULL AND l.chosen_uris IS NOT NULL
          AND contains(l.chosen_uris, g.gold_uri)) AS choice_correct
  FROM gold g
  LEFT JOIN eval_flags f ON f.conv_id = g.conv_id AND f.mention = g.mention
       AND (f.gold_uri = g.gold_uri OR (f.gold_uri IS NULL AND g.gold_uri IS NULL))
  LEFT JOIN links l ON l.conv_id = g.conv_id AND l.turn_idx = g.turn_idx AND l.occ_idx = g.occ_idx
)
"""


# ---------------------------------------------------------------------------
# queries() / oracle_sql() registries
# ---------------------------------------------------------------------------


def q_kg_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _kg_stack(spark, sf_dir)
    return s["mentions"].select("conv_id", "turn_idx", "occ_idx", "mention", "start_pos")


O_KG_MENTIONS = SQL_PREFIX + "SELECT conv_id, turn_idx, occ_idx, mention, start_pos FROM mentions"


def q_kg_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _kg_stack(spark, sf_dir)
    return s["candidates"].select(
        "conv_id", "mention", "group_idx", F.concat_ws(" ", "uris").alias("uris_joined")
    )


O_KG_CANDIDATES = (
    SQL_PREFIX
    + "SELECT conv_id, mention, group_idx, array_to_string(uris, ' ') AS uris_joined FROM candidates"
)


def q_kg_cases(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _kg_stack(spark, sf_dir)
    return s["cases"].select("conv_id", F.col("case").alias("route"))


O_KG_CASES = SQL_PREFIX + "SELECT conv_id, route FROM cases"


def q_kg_fused_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _kg_stack(spark, sf_dir)
    ok = s["cases"].filter(F.col("case") == "Ok").select("conv_id")
    cand_ok = s["candidates"].join(ok, "conv_id", "left_semi")
    return fuse_edges(cand_ok, s["kb_edges"], s["rel_weights"], CFG)


O_KG_FUSED_EDGES = SQL_PREFIX + "SELECT conv_id, src, dst, pred, weight FROM edges"


def q_kg_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _kg_stack(spark, sf_dir)
    ok = s["cases"].filter(F.col("case") == "Ok").select("conv_id")
    cand_ok = s["candidates"].join(ok, "conv_id", "left_semi")
    edges = fuse_edges(cand_ok, s["kb_edges"], s["rel_weights"], CFG)
    return prune_and_degree(edges, cand_ok, CFG)


O_KG_DEGREES = SQL_PREFIX + "SELECT conv_id, v, degree FROM degrees"


_LINKS_CACHE: dict[tuple, DataFrame] = {}
_ALL_CACHES.append(_LINKS_CACHE)


def _links(spark: SparkSession, sf_dir: str, grouped: bool = False) -> DataFrame:
    """LINKS, memoized like :func:`_kg_stack` — consumed by the links/triples/
    annotate/eval/occurrence query families."""
    key = (spark.sparkContext.applicationId, str(sf_dir), grouped, _sf_fingerprint(str(sf_dir)))
    hit = _LINKS_CACHE.get(key)
    if hit is not None:
        _touch_sfdir(key[1])
        return hit
    _evict_stale(_LINKS_CACHE, key[0], key)
    s = _kg_stack(spark, sf_dir)
    if grouped:
        from .operators.grouped import disambiguate_grouped

        links = disambiguate_grouped(
            s["mentions"], s["candidates"], s["kb_edges"], s["rel_weights"], s["cases"], CFG
        )
    else:
        links = disambiguate_relational(
            s["mentions"], s["candidates"], s["kb_edges"], s["rel_weights"], s["cases"], CFG
        )
    links = checkpoint(links)
    _LINKS_CACHE[key] = links
    return links


def q_kg_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _links(spark, sf_dir).select(
        "conv_id", "turn_idx", "occ_idx", "mention", "chosen_uris", "score", "path"
    )


O_KG_LINKS = (
    SQL_PREFIX
    + "SELECT conv_id, turn_idx, occ_idx, mention, chosen_uris, score, path FROM links"
)


def q_kg_links_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _links(spark, sf_dir, grouped=True).select(
        "conv_id", "turn_idx", "occ_idx", "mention", "chosen_uris", "score", "path"
    )


def q_kg_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _kg_stack(spark, sf_dir)
    return connected_components(sameas_edge_frame(s["kb_edges"], s["dico"]))


O_KG_CANONICAL = SQL_PREFIX + "SELECT uri, canonical FROM canon"


def q_kg_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _kg_stack(spark, sf_dir)
    # _links() already returns an eagerly-checkpointed, memoized frame — the
    # multi-branch consumption inside materialize_triples reads those blocks
    return materialize_triples(_links(spark, sf_dir), s["kb_edges"], s["dico"])


O_KG_TRIPLES = SQL_PREFIX + "SELECT subj, pred, obj FROM triples"


def q_kg_preannotate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline SemiAutomaticTEIAnnotation (SemiAutomaticTEIAnnotation.java:44-110):
    per gold mention, ref_new = sorted equivalence-class URIs in the base KB
    (sameAs closure + dico co-membership replaces the sameas.org API)."""
    from .operators.preannotate import preannotate

    s = _kg_stack(spark, sf_dir)
    gold = derive_gold(spark, sf_dir)
    return preannotate(gold, s["kb_edges"], s["dico"], BASE)


O_KG_PREANNOTATE = (
    SQL_PREFIX
    + f""",
pg AS (
  SELECT g.*, coalesce(c.canonical, g.gold_uri) AS comp
  FROM gold g LEFT JOIN canon c ON c.uri = g.gold_uri
),
eqm AS (SELECT canonical AS comp, uri FROM canon),
pa AS (
  SELECT conv_id, turn_idx, occ_idx, mention, gold_uri,
         list_sort(list_filter(
           list_distinct(coalesce(list(uri), []) || [gold_uri]),
           x -> x IS NOT NULL AND contains(x, '{BASE}'))) AS eq
  FROM pg LEFT JOIN eqm USING (comp)
  GROUP BY 1, 2, 3, 4, 5
)
SELECT conv_id, turn_idx, occ_idx, mention, gold_uri,
       CASE WHEN len(eq) > 0 THEN array_to_string(eq, ' ') END AS ref_new
FROM pa
"""
)


def q_kg_correct_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-mention count of correctly-linked occurrences
    (ResultsAndEvaluationNEL.java:295-301,334-337 — the -resCorrectMentions sink)."""
    s = _kg_stack(spark, sf_dir)
    links = _links(spark, sf_dir)
    gold = derive_gold(spark, sf_dir)
    recs = eval_records(gold, links, s["candidates"])
    return (
        recs.filter(F.col("choice_correct"))
        .groupBy("mention")
        .agg(F.count("*").alias("n_correct"))
    )


O_KG_CORRECT_MENTIONS = (
    SQL_PREFIX
    + "SELECT mention, count(*) AS n_correct FROM eval_recs WHERE choice_correct GROUP BY 1"
)


def q_kg_eval_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-mention verdict report — the -resEvalV3.txt sink
    (ResultsAndEvaluationNEL.java:282-318)."""
    from .operators.evaluate import eval_verdicts

    s = _kg_stack(spark, sf_dir)
    links = _links(spark, sf_dir)
    gold = derive_gold(spark, sf_dir)
    return eval_verdicts(eval_records(gold, links, s["candidates"]))


O_KG_EVAL_VERDICTS = (
    SQL_PREFIX
    + """
SELECT conv_id, turn_idx, occ_idx, mention,
       CASE WHEN gold_uri IS NULL THEN 'No manual annotation'
            WHEN chosen_uris IS NULL THEN 'Empty choice'
            WHEN choice_correct THEN 'Good choice'
            ELSE 'Wrong choice' END AS verdict,
       (correct_in_cand AND NOT choice_correct) AS right_in_cand_but_wrong
FROM eval_recs
"""
)


_RATIOS = [
    "candidate_cardinality_mean",
    "candidate_precision",
    "candidate_recall",
    "nil_precision",
    "nil_recall",
    "disambiguation_accuracy",
    "overall_linking_accuracy",
]


def q_kg_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _kg_stack(spark, sf_dir)
    links = _links(spark, sf_dir)
    gold = derive_gold(spark, sf_dir)
    m = hachey_metrics(eval_records(gold, links, s["candidates"]))
    return m.select(
        "nb_mentions",
        "nb_manual",
        "nb_nil",
        *[F.round(F.coalesce(F.col(c), F.lit(-1.0)), 6).alias(c) for c in _RATIOS],
    )


O_KG_EVAL_METRICS = (
    SQL_PREFIX
    + """
SELECT COUNT(*) AS nb_mentions,
       COUNT(CASE WHEN gold_uri IS NOT NULL THEN 1 END) AS nb_manual,
       COUNT(CASE WHEN gold_uri IS NULL THEN 1 END) AS nb_nil,
       round(COALESCE(SUM(CASE WHEN n_groups > 0 THEN n_groups ELSE 0 END)::DOUBLE / COUNT(*), -1.0), 6) AS candidate_cardinality_mean,
       round(COALESCE(SUM(CASE WHEN n_groups > 0 AND correct_in_cand THEN 1 ELSE 0 END)::DOUBLE
             / NULLIF(SUM(CASE WHEN n_groups > 0 THEN 1 ELSE 0 END), 0), -1.0), 6) AS candidate_precision,
       round(COALESCE(SUM(CASE WHEN gold_uri IS NOT NULL AND correct_in_cand THEN 1 ELSE 0 END)::DOUBLE
             / NULLIF(SUM(CASE WHEN gold_uri IS NOT NULL THEN 1 ELSE 0 END), 0), -1.0), 6) AS candidate_recall,
       round(COALESCE(SUM(CASE WHEN n_groups = 0 AND gold_uri IS NULL THEN 1 ELSE 0 END)::DOUBLE
             / NULLIF(SUM(CASE WHEN n_groups = 0 THEN 1 ELSE 0 END), 0), -1.0), 6) AS nil_precision,
       round(COALESCE(SUM(CASE WHEN n_groups = 0 AND gold_uri IS NULL THEN 1 ELSE 0 END)::DOUBLE
             / NULLIF(SUM(CASE WHEN gold_uri IS NULL THEN 1 ELSE 0 END), 0), -1.0), 6) AS nil_recall,
       round(COALESCE(SUM(CASE WHEN n_groups > 1 AND correct_in_cand AND choice_correct THEN 1 ELSE 0 END)::DOUBLE
             / NULLIF(SUM(CASE WHEN n_groups > 1 AND correct_in_cand THEN 1 ELSE 0 END), 0), -1.0), 6) AS disambiguation_accuracy,
       round(COALESCE((SUM(CASE WHEN gold_uri IS NOT NULL AND choice_correct THEN 1 ELSE 0 END)
            + SUM(CASE WHEN n_groups = 0 AND gold_uri IS NULL AND chosen_uris IS NULL THEN 1 ELSE 0 END))::DOUBLE
             / NULLIF(COUNT(*), 0), -1.0), 6) AS overall_linking_accuracy
FROM eval_recs
"""
)


# ---------------------------------------------------------------------------
# Training-data extras (documents/embeddings are pre-registered DuckDB views)
# ---------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import exact_dedup

    return exact_dedup(_read(spark, sf_dir, "documents"))


O_DEDUP_EXACT = """
SELECT min(doc_id) AS doc_id,
       md5(trim(regexp_replace(lower(COALESCE(text, '')), '\\W+', ' ', 'g'))) AS content_key,
       count(*) AS n_copies
FROM documents GROUP BY 2
"""

_DUCK_SHINGLES = """
WITH toks AS (
  SELECT doc_id, string_split(trim(regexp_replace(lower(COALESCE(text, '')), '\\W+', ' ', 'g')), ' ') AS words
  FROM documents
), sh AS (
  SELECT doc_id,
         list_sort(list_distinct(
           [array_to_string(list_slice(words, i, i + {nm1}), ' ')
            for i in generate_series(1, greatest(len(words) - {nm1}, 0))])) AS shingles
  FROM toks
)
"""


_PAIRS_CACHE: dict[tuple, DataFrame] = {}
_ALL_CACHES.append(_PAIRS_CACHE)


def _minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs (12 hashes, 3-shingles, 4 bands, J>=0.5),
    memoized like :func:`_kg_stack`: the pair generation — the dominant cost of
    every dedup-composition query — runs once per (application, sf_dir) and the
    eagerly-checkpointed pair frame is shared by dedup_minhash_lsh,
    dedup_clusters and curation_pipeline (a real 100 TB curation run likewise
    materializes the pair table once and feeds every downstream policy from
    it)."""
    from .operators.dedup import minhash_lsh_pairs

    key = (spark.sparkContext.applicationId, str(sf_dir), _sf_fingerprint(str(sf_dir)))
    hit = _PAIRS_CACHE.get(key)
    if hit is not None:
        _touch_sfdir(key[1])
        return hit
    _evict_stale(_PAIRS_CACHE, key[0], key)
    pairs = checkpoint(minhash_lsh_pairs(_read(spark, sf_dir, "documents"), 12, 3, 4, 0.5))
    _PAIRS_CACHE[key] = pairs
    return pairs


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _minhash_pairs(spark, sf_dir)


O_DEDUP_MINHASH = (
    _DUCK_SHINGLES.format(nm1=2)
    + """
, sigbase AS (
  SELECT doc_id, shingles,
         [('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647 FOR s IN shingles] AS hv
  FROM sh WHERE len(shingles) > 0
), sig AS (
  SELECT doc_id, shingles,
         [list_min([((1 + h*1000003) * b + 12345 + h*7919) % 2147483647 FOR b IN hv]) FOR h IN range(0, 12)] AS sig
  FROM sigbase
), banded AS (
  SELECT doc_id, shingles, unnest(
    [md5(b::VARCHAR || '#' || array_to_string(list_slice(sig, b*3+1, b*3+3), ',')) FOR b IN range(0, 4)]
  ) AS band_key FROM sig
), pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.shingles AS sh_a, b.shingles AS sh_b
  FROM banded a JOIN banded b USING (band_key) WHERE a.doc_id < b.doc_id
)
SELECT * FROM (
  SELECT doc_a, doc_b,
         round(len(list_intersect(sh_a, sh_b))::DOUBLE /
               (len(sh_a) + len(sh_b) - len(list_intersect(sh_a, sh_b))), 6) AS jaccard
  FROM pairs
) WHERE jaccard >= 0.5
"""
)


def q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_read(spark, sf_dir, "documents"), 3, 0.8)


# 2-of-4 min-shingle band keys — mirrors dedup._min_shingle_band_keys exactly
_DUCK_NGRAM_BANDS = """
, keyed0 AS (
  SELECT doc_id, shingles, list_slice(list_sort([md5(s) FOR s IN shingles]), 1, 4) AS m
  FROM sh WHERE len(shingles) > 0
), keyed AS (
  SELECT doc_id, unnest(list_filter([
      CASE WHEN len(m) = 1 THEN m[1] || '|' || m[1] END,
      CASE WHEN len(m) >= 2 THEN m[1] || '|' || m[2] END,
      CASE WHEN len(m) >= 3 THEN m[1] || '|' || m[3] END,
      CASE WHEN len(m) >= 3 THEN m[2] || '|' || m[3] END,
      CASE WHEN len(m) >= 4 THEN m[1] || '|' || m[4] END,
      CASE WHEN len(m) >= 4 THEN m[2] || '|' || m[4] END,
      CASE WHEN len(m) >= 4 THEN m[3] || '|' || m[4] END
    ], x -> x IS NOT NULL)) AS block
  FROM keyed0
)
"""

O_DEDUP_NGRAM = (
    _DUCK_SHINGLES.format(nm1=2)
    + _DUCK_NGRAM_BANDS
    + """
, pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM keyed a JOIN keyed b USING (block) WHERE a.doc_id < b.doc_id
), paired AS (
  SELECT p.doc_a, p.doc_b, sa.shingles AS sh_a, sb.shingles AS sh_b
  FROM pairs p JOIN sh sa ON sa.doc_id = p.doc_a JOIN sh sb ON sb.doc_id = p.doc_b
)
SELECT * FROM (
  SELECT doc_a, doc_b,
         round(len(list_intersect(sh_a, sh_b))::DOUBLE /
               (len(sh_a) + len(sh_b) - len(list_intersect(sh_a, sh_b))), 6) AS jaccard
  FROM paired
) WHERE jaccard >= 0.8
"""
)


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive dedup clustering + keep-best-doc policy over the MinHash-LSH
    pair set of dedup_minhash_lsh (operators/curation.py — reuses the KG
    connected-components operator on the pair graph; the pair frame itself is
    the shared memoized :func:`_minhash_pairs`, so this query's incremental
    cost over dedup_minhash_lsh is just CC + the keep-window + anti-join)."""
    from .operators.curation import dedup_clusters

    docs = _read(spark, sf_dir, "documents")
    return dedup_clusters(docs, _minhash_pairs(spark, sf_dir))


# Same pair derivation as O_DEDUP_MINHASH, then connected components as a
# recursive reachability CTE (min reachable id = cluster label — identical to
# the Spark operator's min-URI-of-component semantics), keep = argmax
# (n_chars, -doc_id) per cluster, singletons their own kept cluster.
_DUCK_MINHASH_JP = """
, sigbase AS (
  SELECT doc_id, shingles,
         [('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647 FOR s IN shingles] AS hv
  FROM sh WHERE len(shingles) > 0
), sig AS (
  SELECT doc_id, shingles,
         [list_min([((1 + h*1000003) * b + 12345 + h*7919) % 2147483647 FOR b IN hv]) FOR h IN range(0, 12)] AS sig
  FROM sigbase
), banded AS (
  SELECT doc_id, shingles, unnest(
    [md5(b::VARCHAR || '#' || array_to_string(list_slice(sig, b*3+1, b*3+3), ',')) FOR b IN range(0, 4)]
  ) AS band_key FROM sig
), cand_pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.shingles AS sh_a, b.shingles AS sh_b
  FROM banded a JOIN banded b USING (band_key) WHERE a.doc_id < b.doc_id
), jp AS (
  SELECT doc_a, doc_b FROM (
    SELECT doc_a, doc_b,
           round(len(list_intersect(sh_a, sh_b))::DOUBLE /
                 (len(sh_a) + len(sh_b) - len(list_intersect(sh_a, sh_b))), 6) AS jaccard
    FROM cand_pairs
  ) WHERE jaccard >= 0.5
)"""

# Connected components of a pair set `jp(doc_a, doc_b)` as a recursive
# reachability CTE + the keep-best-doc policy — the shared tail of every
# dedup-clustering oracle (min reachable id = cluster label, identical to the
# Spark operator's min-URI-of-component semantics; keep = argmax
# (n_chars, -doc_id); singletons their own kept cluster).
# CTE-only form (ends with a `clusters` CTE) so composite oracles
# (O_CURATION_PIPELINE) can keep chaining; _DUCK_CC_KEEP_TAIL adds the final
# select for the standalone clustering oracles.
_DUCK_CC_CLUSTERS = """
, dedges AS (
  SELECT doc_a AS a, doc_b AS b FROM jp UNION SELECT doc_b, doc_a FROM jp
), dnodes AS (
  SELECT DISTINCT a AS v FROM dedges
), reach(src, dst) AS (
  SELECT v, v FROM dnodes
  UNION
  SELECT r.src, e.b FROM reach r JOIN dedges e ON r.dst = e.a
), lbl AS (
  SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src
), asg AS (
  SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS cluster_id, d.n_chars
  FROM documents d LEFT JOIN lbl l USING (doc_id)
), csz AS (
  SELECT cluster_id, count(*) AS cluster_size FROM asg GROUP BY 1
), clusters AS (
  SELECT a.doc_id, a.cluster_id, s.cluster_size,
         row_number() OVER (PARTITION BY a.cluster_id ORDER BY a.n_chars DESC, a.doc_id ASC) = 1 AS keep
  FROM asg a JOIN csz s USING (cluster_id)
)"""

_DUCK_CC_KEEP_TAIL = (
    _DUCK_CC_CLUSTERS + "\nSELECT doc_id, cluster_id, cluster_size, keep FROM clusters\n"
)

O_DEDUP_CLUSTERS = (
    _DUCK_SHINGLES.format(nm1=2).replace("WITH toks AS", "WITH RECURSIVE toks AS", 1)
    + _DUCK_MINHASH_JP
    + _DUCK_CC_KEEP_TAIL
)


def q_text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.textstats import tfidf_topk

    return tfidf_topk(_read(spark, sf_dir, "documents"), k=3)


O_TEXT_TFIDF_TOPK = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(trim(regexp_replace(lower(COALESCE(text, '')), '\\W+', ' ', 'g')), ' ')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks WHERE term <> '' GROUP BY 1, 2
), dfd AS (
  SELECT term, count(*) AS df_docs FROM tf GROUP BY 1
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfd.df_docs,
         round(tf.tf * ln((SELECT count(*) FROM documents)::DOUBLE / dfd.df_docs), 6) AS tfidf
  FROM tf JOIN dfd USING (term)
)
SELECT doc_id, term, tf, df_docs, tfidf, rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rnk
  FROM scored
) WHERE rnk <= 3
"""


def q_doc_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.curation import stratified_sample

    return stratified_sample(_read(spark, sf_dir, "documents"), fraction=0.2, stratum_col="lang")


O_DOC_SAMPLE_STRATIFIED = """
WITH hashed AS (
  SELECT doc_id, lang AS stratum,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT AS h
  FROM documents
), cnt AS (
  SELECT stratum, count(*) AS n_stratum, ceil(count(*) * 0.2)::BIGINT AS n_take
  FROM hashed GROUP BY 1
), ranked AS (
  SELECT hashed.*, row_number() OVER (PARTITION BY stratum ORDER BY h ASC, doc_id ASC) AS sample_rank
  FROM hashed
)
SELECT r.doc_id, r.stratum, r.sample_rank, c.n_stratum, c.n_take
FROM ranked r JOIN cnt c USING (stratum)
WHERE r.sample_rank <= c.n_take
"""


def q_doc_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.curation import pack_sequences

    return pack_sequences(_read(spark, sf_dir, "documents"), budget=512, n_shards=8)


O_DOC_PACK_SEQUENCES = """
WITH toks AS (
  SELECT doc_id,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 8 AS shard,
         len(list_filter(string_split(trim(regexp_replace(lower(COALESCE(text, '')), '\\W+', ' ', 'g')), ' '),
                         t -> t <> '')) AS n_tokens
  FROM documents
), packed AS (
  -- ::BIGINT casts: DuckDB's window sum yields HUGEINT (rendered 23.0) while
  -- Spark emits long — the driver's value hash needs identical renderings
  SELECT doc_id, shard, n_tokens,
         COALESCE(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS start_offset
  FROM toks
)
SELECT doc_id, shard, n_tokens::INT AS n_tokens, start_offset,
       (start_offset // 512)::BIGINT AS seq_idx FROM packed
"""


def q_doc_pack_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boundary-respecting greedy packing (applyInPandas kernel — the per-shard
    fill state is a prefix-dependent recursion no window frame expresses; the
    oracle states the identical recursion as a recursive CTE)."""
    from .operators.curation import pack_sequences_greedy

    return pack_sequences_greedy(_read(spark, sf_dir, "documents"), budget=512, n_shards=8)


O_DOC_PACK_GREEDY = """
WITH RECURSIVE toks AS (
  SELECT doc_id,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 8 AS shard,
         len(list_filter(string_split(trim(regexp_replace(lower(COALESCE(text, '')), '\\W+', ' ', 'g')), ' '),
                         t -> t <> '')) AS n_tokens
  FROM documents
), ordered AS (
  SELECT *, row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn FROM toks
), packed(shard, rn, doc_id, n_tokens, seq_idx, off, fill) AS (
  SELECT shard, rn, doc_id, n_tokens, 0::BIGINT, 0::BIGINT, n_tokens::BIGINT
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.shard, o.rn, o.doc_id, o.n_tokens,
         CASE WHEN p.fill + o.n_tokens <= 512 THEN p.seq_idx ELSE p.seq_idx + 1 END,
         CASE WHEN p.fill + o.n_tokens <= 512 THEN p.fill ELSE 0 END,
         CASE WHEN p.fill + o.n_tokens <= 512 THEN p.fill + o.n_tokens ELSE o.n_tokens::BIGINT END
  FROM packed p JOIN ordered o ON o.shard = p.shard AND o.rn = p.rn + 1
)
SELECT doc_id, shard, n_tokens::INT AS n_tokens, seq_idx, off AS offset_in_seq FROM packed
"""


def q_text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composition of the curation operators: the 20% stratified sample is the
    eval holdout; the remaining 80% is the training corpus, decontaminated
    against the holdout's word 8-grams."""
    from .operators.curation import decontaminate, stratified_sample

    docs = _read(spark, sf_dir, "documents")
    samp = stratified_sample(docs, fraction=0.2, stratum_col="lang").select("doc_id")
    train = docs.join(samp, "doc_id", "left_anti")
    holdout = docs.join(samp, "doc_id", "inner")
    return decontaminate(train, holdout, shingle_n=8)


O_TEXT_DECONTAMINATE = (
    _DUCK_SHINGLES.format(nm1=7)
    + """
, hashed AS (
  SELECT doc_id, lang AS stratum,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT AS h
  FROM documents
), cnt AS (
  SELECT stratum, count(*) AS n_stratum, ceil(count(*) * 0.2)::BIGINT AS n_take
  FROM hashed GROUP BY 1
), ranked AS (
  SELECT hashed.*, row_number() OVER (PARTITION BY stratum ORDER BY h ASC, doc_id ASC) AS sample_rank
  FROM hashed
), samp AS (
  SELECT r.doc_id FROM ranked r JOIN cnt c USING (stratum) WHERE r.sample_rank <= c.n_take
), hold AS (
  SELECT DISTINCT unnest(shingles) AS shingle FROM sh
  WHERE doc_id IN (SELECT doc_id FROM samp)
), train_sh AS (
  SELECT doc_id, unnest(shingles) AS shingle FROM sh
  WHERE doc_id NOT IN (SELECT doc_id FROM samp)
), hits AS (
  SELECT doc_id, count(*) AS n_hit_shingles FROM train_sh JOIN hold USING (shingle) GROUP BY 1
)
SELECT d.doc_id,
       COALESCE(h.n_hit_shingles, 0) AS n_hit_shingles,
       COALESCE(h.n_hit_shingles, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id NOT IN (SELECT doc_id FROM samp)
"""
)


# The synthetic documents text contains no URLs, so URL-curation oracles over
# the raw table would pass vacuously; every 5th doc gains two deterministic
# URLs in BOTH engines (mixed-case host + www. prefix exercise normalization;
# blocked{0,1,2}.net rotates one-third of the injected hosts onto/off the
# 2-entry blocklist so `blocked` is non-vacuously true AND false).
_URL_SUFFIX_SQL = (
    "' see https://www.Example' || CAST(doc_id % 7 AS VARCHAR) || '.com/p/' "
    "|| CAST(doc_id AS VARCHAR) || ' and http://blocked' "
    "|| CAST(doc_id % 3 AS VARCHAR) || '.net/x?q=1'"
)
_DUCK_URL_DOCS = f"""
url_docs AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN COALESCE(text, '') || {_URL_SUFFIX_SQL}
              ELSE COALESCE(text, '') END AS text
  FROM documents
)
"""


def _url_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = F.coalesce(F.col("text"), F.lit(""))
    injected = F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(
            base,
            F.lit(" see https://www.Example"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".com/p/"),
            F.col("doc_id").cast("string"),
            F.lit(" and http://blocked"),
            (F.col("doc_id") % 3).cast("string"),
            F.lit(".net/x?q=1"),
        ),
    ).otherwise(base)
    return _read(spark, sf_dir, "documents").withColumn("text", injected)


# DuckDB twin of textstats._domains (lowercased, www.-stripped host list)
_DUCK_DOMAINS = (
    "list_transform(regexp_extract_all(text, '{dom_re}', 1), "
    "x -> regexp_replace(lower(x), '^www\\.', ''))"
)


def q_text_url_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.textstats import url_extract

    return url_extract(_url_docs(spark, sf_dir))


def _o_text_url_extract() -> str:
    from .operators.textstats import URL_DOMAIN_RE, URL_RE

    doms = _DUCK_DOMAINS.format(dom_re=URL_DOMAIN_RE)
    return f"""
WITH {_DUCK_URL_DOCS},
u AS (
  SELECT doc_id, text, list_sort(list_distinct({doms})) AS doms FROM url_docs
)
SELECT doc_id,
       len(regexp_extract_all(text, '{URL_RE}'))::INT AS n_urls,
       len(doms)::INT AS n_domains,
       COALESCE(array_to_string(doms, ','), '') AS domains
FROM u
"""


def q_doc_domain_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.curation import domain_filter

    blocklist = spark.createDataFrame(
        [("blocked0.net",), ("blocked1.net",)], "domain string"
    )
    return domain_filter(_url_docs(spark, sf_dir), blocklist)


def _o_doc_domain_filter() -> str:
    from .operators.textstats import URL_DOMAIN_RE

    doms = _DUCK_DOMAINS.format(dom_re=URL_DOMAIN_RE)
    return f"""
WITH {_DUCK_URL_DOCS},
u AS (
  SELECT doc_id, unnest(list_distinct({doms})) AS domain FROM url_docs
)
SELECT doc_id, domain, domain IN ('blocked0.net', 'blocked1.net') AS blocked
FROM u
"""


def q_doc_shuffle_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.curation import shuffle_deterministic

    return shuffle_deterministic(_read(spark, sf_dir, "documents"), seed=42)


# The oracle states the SEMANTICS (one global ORDER BY); the operator computes
# the identical ranks via the 256-bucket distributed-rank plan — the bucket is
# a prefix of the sort key, so (bucket, key) order IS key order.
O_DOC_SHUFFLE = """
SELECT doc_id,
       row_number() OVER (ORDER BY md5('42:' || CAST(doc_id AS VARCHAR)), doc_id) AS position
FROM documents
"""


def q_doc_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.curation import chunk_windows

    return chunk_windows(_read(spark, sf_dir, "documents"), window=24, stride=16)


# DuckDB twin of the overlapping-window rule: k_last = 0 if n <= window else
# ceil((n - window) / stride); list_slice is 1-based INCLUSIVE so chunk k is
# toks[k*stride + 1 .. k*stride + window].
O_DOC_CHUNK_WINDOWS = """
WITH t AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(COALESCE(text, '')), '\\W+', ' ', 'g')), ' ') AS toks
  FROM documents
), b AS (
  SELECT doc_id, toks, len(toks) AS n,
         CASE WHEN len(toks) <= 24 THEN 0
              ELSE ceil((len(toks) - 24) / 16.0)::INT END AS k_last
  FROM t
), c AS (
  SELECT doc_id, toks, n, unnest(generate_series(0, k_last)) AS chunk_idx FROM b
)
SELECT doc_id, chunk_idx::INT AS chunk_idx,
       least(24, n - chunk_idx * 16)::INT AS n_chunk_words,
       md5(array_to_string(list_slice(toks, chunk_idx * 16 + 1, chunk_idx * 16 + 24), ' ')) AS chunk_hash
FROM c
"""


def q_text_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.textstats import ngram_topk

    return ngram_topk(_read(spark, sf_dir, "documents"), n=2, k=20)


O_TEXT_NGRAM_TOPK = """
WITH t AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(COALESCE(text, '')), '\\W+', ' ', 'g')), ' ') AS toks
  FROM documents
), g AS (
  SELECT doc_id,
         unnest([array_to_string(list_slice(toks, i, i + 1), ' ')
                 FOR i IN generate_series(1, greatest(len(toks) - 1, 0))]) AS ngram
  FROM t
), pd AS (
  SELECT ngram, doc_id, count(*) AS c FROM g GROUP BY 1, 2
)
SELECT ngram, sum(c)::BIGINT AS total_count, count(*)::BIGINT AS doc_freq
FROM pd GROUP BY 1
ORDER BY total_count DESC, ngram
LIMIT 20
"""


def q_text_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.textstats import perplexity

    return perplexity(_read(spark, sf_dir, "documents"))


# DuckDB twin of the add-one bigram LM: the zipped unnest of toks[1:n-1] and
# toks[2:n] is the (prev, cur) occurrence table; both engines compute the same
# (c_ab + 1) / (c_prev + V) doubles so ln/round agree bit-for-bit.
O_TEXT_PERPLEXITY = r"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split(trim(regexp_replace(lower(COALESCE(text, '')), '\W+', ' ', 'g')), ' '),
                     x -> x <> '') AS toks
  FROM documents
), b AS (
  SELECT doc_id, unnest(toks[1:len(toks)-1]) AS prev, unnest(toks[2:len(toks)]) AS cur
  FROM t WHERE len(toks) >= 2
), pd AS (
  SELECT doc_id, prev, cur, count(*) AS k FROM b GROUP BY 1, 2, 3
), cab AS (
  SELECT prev, cur, sum(k) AS c_ab FROM pd GROUP BY 1, 2
), cp AS (
  SELECT prev, sum(c_ab) AS c_prev FROM cab GROUP BY 1
), v AS (
  SELECT count(DISTINCT x) AS v FROM (SELECT unnest(toks) AS x FROM t)
), term AS (
  SELECT doc_id, k, c_ab, c_prev, v
  FROM pd JOIN cab USING (prev, cur) JOIN cp USING (prev) CROSS JOIN v
), agg AS (
  SELECT doc_id, sum(k)::BIGINT AS n_bigrams,
         -sum(k * ln((c_ab + 1)::DOUBLE / (c_prev + v))) / sum(k) AS nll
  FROM term GROUP BY 1
)
SELECT d.doc_id, COALESCE(a.n_bigrams, 0)::BIGINT AS n_bigrams,
       round(COALESCE(a.nll, -1.0), 6) AS nll
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


def q_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import duplicated_spans

    return duplicated_spans(_read(spark, sf_dir, "documents"), n=8)


O_DEDUP_SPANS = r"""
WITH t AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(COALESCE(text, '')), '\W+', ' ', 'g')), ' ') AS toks
  FROM documents
), g AS (
  SELECT doc_id,
         unnest([md5(array_to_string(list_slice(toks, i, i + 7), ' '))
                 FOR i IN generate_series(1, greatest(len(toks) - 7, 0))]) AS gram
  FROM t
), pd AS (
  SELECT doc_id, gram, count(*) AS k FROM g GROUP BY 1, 2
), dupg AS (
  SELECT gram FROM pd GROUP BY gram HAVING count(*) > 1
), dup AS (
  SELECT doc_id, sum(k) AS n_dup FROM pd JOIN dupg USING (gram) GROUP BY 1
), base AS (
  SELECT doc_id, greatest(len(toks) - 7, 0) AS n_grams FROM t
)
SELECT b.doc_id, b.n_grams::BIGINT AS n_grams,
       COALESCE(d.n_dup, 0)::BIGINT AS n_dup_grams,
       CASE WHEN b.n_grams > 0 THEN round(COALESCE(d.n_dup, 0)::DOUBLE / b.n_grams, 6)
            ELSE -1.0 END AS dup_fraction
FROM base b LEFT JOIN dup d USING (doc_id)
"""


def q_doc_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.curation import domain_cap

    return domain_cap(_url_docs(spark, sf_dir), cap=3, n_salt=8)


def _o_doc_domain_cap() -> str:
    from .operators.textstats import URL_DOMAIN_RE

    doms = _DUCK_DOMAINS.format(dom_re=URL_DOMAIN_RE)
    # The oracle states the SEMANTICS (global first-3-per-domain by doc_id);
    # the operator's two-phase salted rank is provably equivalent (stage 1
    # keeps each salt shard's first 3, a superset of the domain's first 3).
    return f"""
WITH {_DUCK_URL_DOCS},
u AS (
  SELECT doc_id, unnest(list_distinct({doms})) AS domain FROM url_docs
), r AS (
  SELECT doc_id, domain,
         row_number() OVER (PARTITION BY domain ORDER BY doc_id) AS domain_rank
  FROM u
)
SELECT doc_id, domain, domain_rank::INT AS domain_rank FROM r WHERE domain_rank <= 3
"""


def q_kg_entity_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.enrich import entity_pmi

    return entity_pmi(_links(spark, sf_dir), min_pairs=2)


O_KG_ENTITY_PMI = (
    SQL_PREFIX
    + """,
ents AS (SELECT DISTINCT conv_id, uri FROM chosen_flat),
pmi_pairs AS (
  SELECT a.uri AS uri_a, b.uri AS uri_b, count(*) AS n_ab
  FROM ents a JOIN ents b ON a.conv_id = b.conv_id AND a.uri < b.uri
  GROUP BY 1, 2 HAVING count(*) >= 2
),
marg AS (SELECT uri, count(*) AS n FROM ents GROUP BY 1),
nc AS (SELECT count(DISTINCT conv_id) AS n_convs FROM ents)
SELECT p.uri_a, p.uri_b, p.n_ab::BIGINT AS n_ab, ma.n::BIGINT AS n_a, mb.n::BIGINT AS n_b,
       round(ln(p.n_ab::DOUBLE * nc.n_convs / (ma.n * mb.n)), 6) AS pmi
FROM pmi_pairs p
JOIN marg ma ON ma.uri = p.uri_a
JOIN marg mb ON mb.uri = p.uri_b
CROSS JOIN nc
"""
)


def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The chained end-to-end curation recipe a 100 TB training-data run
    executes (plans/curation.py is the checkpointed/resumable production
    driver; this contract row pins the same dataflow against one exact oracle):

        minhash pairs -> transitive clusters -> keep-best doc
        -> holdout carve-out (stratified sample) -> decontaminate vs holdout
        -> pack clean survivors into training sequences

    One output row per packed training doc, carrying its provenance
    (cluster id/size) and its packed position (shard, offsets). The pair frame
    is the shared memoized :func:`_minhash_pairs`."""
    from .operators.curation import dedup_clusters, decontaminate, pack_sequences, stratified_sample

    docs = _read(spark, sf_dir, "documents")
    clusters = checkpoint(dedup_clusters(docs, _minhash_pairs(spark, sf_dir)))
    kept = clusters.filter("keep").select("doc_id")
    samp = stratified_sample(docs, 0.2, "lang").select("doc_id")
    # holdout = eval carve-out over the FULL corpus (eval membership is decided
    # before dedup policy); train = kept representatives minus holdout
    train = docs.join(kept, "doc_id", "left_semi").join(samp, "doc_id", "left_anti")
    holdout = docs.join(samp, "doc_id", "left_semi")
    decon = decontaminate(train, holdout, shingle_n=8)
    clean = train.join(
        decon.filter(~F.col("contaminated")).select("doc_id"), "doc_id", "left_semi"
    )
    return pack_sequences(clean, budget=512, n_shards=8).join(
        clusters.select("doc_id", "cluster_id", "cluster_size"), "doc_id"
    ).select("doc_id", "cluster_id", "cluster_size", "shard", "n_tokens", "start_offset", "seq_idx")


O_CURATION_PIPELINE = (
    _DUCK_SHINGLES.format(nm1=2).replace("WITH toks AS", "WITH RECURSIVE toks AS", 1)
    + _DUCK_MINHASH_JP
    + _DUCK_CC_CLUSTERS
    + """
, hashed AS (
  SELECT doc_id, lang AS stratum,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT AS h
  FROM documents
), cnt AS (
  SELECT stratum, ceil(count(*) * 0.2)::BIGINT AS n_take FROM hashed GROUP BY 1
), ranked AS (
  SELECT hashed.*, row_number() OVER (PARTITION BY stratum ORDER BY h ASC, doc_id ASC) AS sample_rank
  FROM hashed
), samp AS (
  SELECT r.doc_id FROM ranked r JOIN cnt c USING (stratum) WHERE r.sample_rank <= c.n_take
), train_ids AS (
  SELECT doc_id FROM clusters
  WHERE keep AND doc_id NOT IN (SELECT doc_id FROM samp)
), sh8 AS (
  SELECT doc_id,
         list_sort(list_distinct(
           [array_to_string(list_slice(words, i, i + 7), ' ')
            for i in generate_series(1, greatest(len(words) - 7, 0))])) AS shingles
  FROM toks
), hold AS (
  SELECT DISTINCT unnest(shingles) AS shingle FROM sh8
  WHERE doc_id IN (SELECT doc_id FROM samp)
), train_sh AS (
  SELECT doc_id, unnest(shingles) AS shingle FROM sh8
  WHERE doc_id IN (SELECT doc_id FROM train_ids)
), hits AS (
  SELECT doc_id, count(*) AS n_hit FROM train_sh JOIN hold USING (shingle) GROUP BY 1
), clean AS (
  SELECT t.doc_id FROM train_ids t LEFT JOIN hits h USING (doc_id)
  WHERE COALESCE(h.n_hit, 0) = 0
), ptoks AS (
  SELECT c.doc_id,
         ('0x' || substr(md5(c.doc_id::VARCHAR), 1, 8))::BIGINT % 8 AS shard,
         len(list_filter(string_split(trim(regexp_replace(lower(d.text), '\\W+', ' ', 'g')), ' '),
                         t -> t <> '')) AS n_tokens
  FROM clean c JOIN documents d USING (doc_id)
), packed AS (
  SELECT doc_id, shard, n_tokens,
         COALESCE(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS start_offset
  FROM ptoks
)
SELECT p.doc_id, c.cluster_id, c.cluster_size, p.shard, p.n_tokens::INT AS n_tokens,
       p.start_offset, (p.start_offset // 512)::BIGINT AS seq_idx
FROM packed p JOIN clusters c USING (doc_id)
"""
)


def q_text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over documents with deterministically injected PII (every 3rd
    doc gains an email + phone + IPv4 in both engines — the synthetic corpus
    contains none, so the injection is what makes the oracle exercise the
    redaction rather than pass vacuously)."""
    from .operators.textstats import redact_pii

    docs = _read(spark, sf_dir, "documents")
    k = F.col("doc_id").cast("string")
    base = F.coalesce(F.col("text"), F.lit(""))
    injected = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(
            base,
            F.lit(" contact user"),
            k,
            F.lit("@mail.example.com or +1 555 010 "),
            (F.col("doc_id") % 100).cast("string"),
            F.lit(" at 10."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".0.1 now"),
        ),
    ).otherwise(base)
    return redact_pii(docs.withColumn("text", injected))


def _o_text_redact_pii() -> str:
    from .operators.textstats import PII_EMAIL, PII_IPV4, PII_PHONE

    return f"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN
           COALESCE(text, '') || ' contact user' || CAST(doc_id AS VARCHAR)
           || '@mail.example.com or +1 555 010 ' || CAST(doc_id % 100 AS VARCHAR)
           || ' at 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1 now'
         ELSE COALESCE(text, '') END AS t0
  FROM documents
), r1 AS (
  SELECT doc_id, t0, regexp_replace(t0, '{PII_EMAIL}', '<EMAIL>', 'g') AS t1 FROM d
), r2 AS (
  SELECT *, regexp_replace(t1, '{PII_IPV4}', '<IP>', 'g') AS t2 FROM r1
), r3 AS (
  SELECT *, regexp_replace(t2, '{PII_PHONE}', '<PHONE>', 'g') AS t3 FROM r2
)
SELECT doc_id,
       len(regexp_extract_all(t0, '{PII_EMAIL}'))::INT AS n_emails,
       len(regexp_extract_all(t1, '{PII_IPV4}'))::INT AS n_ips,
       len(regexp_extract_all(t2, '{PII_PHONE}'))::INT AS n_phones,
       md5(t3) AS redacted_md5
FROM r3
"""


# The synthetic documents text is pure lowercase [a-z ]: no newlines, digits,
# apostrophes or punctuation, so oracles over the raw table would exercise
# only the letter-run branch of the pretokenizer and leave dup_line_frac
# identically zero (vacuous parity). Every 4th doc therefore gains a
# deterministic adversarial suffix — contractions, digits, symbol runs,
# newlines, and a repeated line — in BOTH engines.
_ADV_SUFFIX = "\nIt's 2024: price 1,234 -- 50% off!\nsame line\nsame line"
_ADV_SUFFIX_SQL = (
    "chr(10) || 'It''s 2024: price 1,234 -- 50% off!' || chr(10) || "
    "'same line' || chr(10) || 'same line'"
)
_DUCK_ADV_DOCS = f"""
adv_docs AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0 THEN COALESCE(text, '') || {_ADV_SUFFIX_SQL}
              ELSE COALESCE(text, '') END AS text
  FROM documents
)
"""


def _adv_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = F.coalesce(F.col("text"), F.lit(""))
    return _read(spark, sf_dir, "documents").withColumn(
        "text",
        F.when(F.col("doc_id") % 4 == 0, F.concat(base, F.lit(_ADV_SUFFIX))).otherwise(base),
    )


def q_text_pretoken_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.textstats import pretoken_count

    return pretoken_count(_adv_docs(spark, sf_dir))


def _o_text_pretoken_count() -> str:
    from .operators.textstats import BPE_PRETOKEN_RE

    pat = BPE_PRETOKEN_RE.replace("'", "''")
    return f"""
WITH {_DUCK_ADV_DOCS}
SELECT doc_id,
       len(regexp_extract_all(text, '{pat}'))::INT AS n_pretokens,
       len(string_split(trim(regexp_replace(lower(text), '\\W+', ' ', 'g')), ' '))::INT AS n_words,
       ceil(length(text) / 4)::INT AS n_subwords_est
FROM adv_docs
"""


def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.textstats import repetition_signals

    return repetition_signals(_adv_docs(spark, sf_dir))


O_TEXT_REPETITION = f"""
WITH {_DUCK_ADV_DOCS},
t AS (
  SELECT doc_id, text,
         string_split(trim(regexp_replace(lower(text), '\\W+', ' ', 'g')), ' ') AS toks,
         string_split(text, chr(10)) AS lns
  FROM adv_docs
), base AS (
  SELECT doc_id, toks,
         len(toks)::INT AS n_words,
         CASE WHEN len(toks) > 0 THEN
           round((len(toks) - len(list_distinct(toks)))::DOUBLE / len(toks), 6)
         ELSE 0.0 END AS dup_word_frac,
         CASE WHEN len(lns) > 0 THEN
           round((len(lns) - len(list_distinct(lns)))::DOUBLE / len(lns), 6)
         ELSE 0.0 END AS dup_line_frac
  FROM t
), bge AS (
  SELECT doc_id,
         unnest([toks[i] || ' ' || toks[i+1]
                 FOR i IN generate_series(1, greatest(len(toks) - 1, 0))]) AS bg
  FROM base
), bgc AS (
  SELECT doc_id, bg, count(*) AS c FROM bge GROUP BY 1, 2
), tp AS (
  SELECT doc_id, round(max(c)::DOUBLE / sum(c), 6) AS top_bigram_frac FROM bgc GROUP BY 1
)
SELECT b.doc_id, b.n_words, b.dup_word_frac, b.dup_line_frac,
       COALESCE(tp.top_bigram_frac, 0.0) AS top_bigram_frac
FROM base b LEFT JOIN tp USING (doc_id)
"""


def q_text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.textstats import quality_filter

    return quality_filter(_read(spark, sf_dir, "documents"))


def _o_text_quality_filter() -> str:
    from .operators.textstats import STOPWORDS

    stoplist = ", ".join(f"'{w}'" for w in sorted({w for ws in STOPWORDS.values() for w in ws}))
    return f"""
WITH t AS (
  SELECT doc_id, COALESCE(text, '') AS text,
         string_split(trim(regexp_replace(lower(COALESCE(text, '')), '\\W+', ' ', 'g')), ' ') AS toks
  FROM documents
), m AS (
  SELECT doc_id,
         len(toks)::INT AS n_words,
         round(list_sum([len(x) FOR x IN toks])::DOUBLE / greatest(len(toks), 1), 6) AS mean_word_len,
         round(len(regexp_replace(text, '[\\w\\s]', '', 'g'))::DOUBLE / greatest(len(text), 1), 6) AS punct_ratio,
         round(len(list_filter(toks, x -> x IN ({stoplist})))::DOUBLE / greatest(len(toks), 1), 6) AS stopword_ratio
  FROM t
)
SELECT *,
       (n_words BETWEEN 5 AND 100000 AND mean_word_len BETWEEN 2.0 AND 12.0
        AND punct_ratio <= 0.3 AND stopword_ratio >= 0.01) AS passes
FROM m
"""


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import simhash_near_pairs

    return simhash_near_pairs(_read(spark, sf_dir, "documents"), 2, 12)


# Mirrors operators.dedup.simhash64/simhash_near_pairs exactly: 60-bit
# md5-derived token hash, bit votes, max_hamming=12 -> 15 chunks of 4 bits.
O_DEDUP_SIMHASH = (
    _DUCK_SHINGLES.format(nm1=1)
    + """
, th AS (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
  FROM (SELECT doc_id, unnest(shingles) AS tok FROM sh WHERE len(shingles) > 0)
), votes AS (
  SELECT doc_id, bit, sum(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM th CROSS JOIN generate_series(0, 59) AS gs(bit)
  GROUP BY doc_id, bit
), hashes AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT) AS simhash
  FROM votes GROUP BY doc_id
), chunks AS (
  SELECT doc_id, simhash, c, (simhash >> (c * 4)) & 15 AS chunk_val
  FROM hashes CROSS JOIN generate_series(0, 14) AS gc(c)
), pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  a.simhash AS h_a, b.simhash AS h_b
  FROM chunks a JOIN chunks b USING (c, chunk_val) WHERE a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, bit_count(xor(h_a, h_b))::INT AS hamming
FROM pairs WHERE bit_count(xor(h_a, h_b)) <= 12
"""
)


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import cosine_topk

    return cosine_topk(_read(spark, sf_dir, "embeddings"), [0, 1, 2, 3, 4], k=5)


O_ANN_COSINE = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id IN (0,1,2,3,4)),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         round(
           list_sum(list_transform(list_zip(qv, e.embedding), p -> p[1]::DOUBLE * p[2]::DOUBLE)) /
           (sqrt(list_sum([ (x::DOUBLE)*(x::DOUBLE) FOR x IN qv ])) *
            sqrt(list_sum([ (x::DOUBLE)*(x::DOUBLE) FOR x IN e.embedding ]))), 6) AS sim
  FROM q, embeddings e WHERE e.vec_id != q.query_id
)
SELECT query_id, rank, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 5
"""


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketed top-k with the codegen integer-plane bucketer — the
    bucket ids (and therefore the candidate cut) are reproduced exactly by the
    DuckDB oracle; recall vs the exact baseline is additionally pinned in
    tests/test_extras.py."""
    from .operators.similarity import lsh_topk

    return lsh_topk(_read(spark, sf_dir, "embeddings"), [0, 1, 2, 3, 4], k=5, n_planes=4)


def _o_ann_lsh_topk() -> str:
    from .operators.similarity import EMB_DIM, signlsh_bucket_sql

    bucket = signlsh_bucket_sql("embedding", EMB_DIM, n_planes=4)
    cos = _sql_cosine("q.qv", "c.embedding")
    return f"""
WITH e AS (SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings),
q AS (SELECT vec_id AS query_id, embedding AS qv, bucket FROM e WHERE vec_id IN (0,1,2,3,4)),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id, {cos} AS sim
  FROM q JOIN e c USING (bucket) WHERE c.vec_id != q.query_id
)
SELECT query_id, rank, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 5
"""


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import ivf_topk

    return ivf_topk(_read(spark, sf_dir, "embeddings"), [0, 1, 2, 3, 4], k=5, n_list=8, n_probe=2)


def q_ann_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with the Lloyd-trained quantizer (train_iters=2). The trainer
    quantizes each iteration's per-cell means to 6 decimals
    (similarity.train_centroids), which makes the trained centroids — and the
    resulting cell assignment/probe — exactly reproducible in SQL: the oracle
    unrolls both Lloyd iterations as CTEs. Determinism + full-probe-equals-exact
    remain pinned in tests/test_extras.py."""
    from .operators.similarity import ivf_topk

    return ivf_topk(
        _read(spark, sf_dir, "embeddings"), [0, 1, 2, 3, 4], k=5, n_list=8, n_probe=2, train_iters=2
    )


def _o_ann_ivf_trained(n_list: int = 8, n_probe: int = 2, iters: int = 2) -> str:
    """DuckDB twin of ivf_topk(train_iters=2): unrolled quantized-Lloyd.

    Each iteration CTE pair mirrors similarity.train_centroids exactly —
    assign every vector to its nearest current centroid (cosine rounded to 6
    decimals, ties to the lower cid), then recompute per-cell element-wise
    means rounded to 6 decimals. list(... ORDER BY pos) rebuilds the centroid
    vector in element order like Spark's array_sort(collect_list(struct))."""
    from .operators.similarity import EMB_DIM

    def assign(cent: str, name: str) -> str:
        cos = _sql_cosine("e.embedding", "c.cvec")
        return f"""{name} AS (
  SELECT vec_id, embedding, cid FROM (
    SELECT e.vec_id, e.embedding, c.cid,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY {cos} DESC, c.cid) AS crn
    FROM embeddings e, {cent} c
  ) WHERE crn = 1
)"""

    def recompute(assigned: str, name: str) -> str:
        return f"""{name} AS (
  SELECT cid, list(m ORDER BY pos) AS cvec FROM (
    SELECT cid, pos, round(avg(embedding[pos]), 6) AS m
    FROM {assigned}, unnest(range(1, {EMB_DIM} + 1)) AS g(pos)
    GROUP BY cid, pos
  ) GROUP BY cid
)"""

    ctes = [f"cent0 AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings ORDER BY vec_id LIMIT {n_list})"]
    for i in range(iters):
        ctes.append(assign(f"cent{i}", f"a{i + 1}"))
        ctes.append(recompute(f"a{i + 1}", f"cent{i + 1}"))
    final = f"cent{iters}"
    cos = _sql_cosine("e.embedding", "c.cvec")
    ctes.append(
        f"""ranked AS (
  SELECT e.vec_id, e.embedding, c.cid,
         row_number() OVER (PARTITION BY e.vec_id ORDER BY {cos} DESC, c.cid) AS crn
  FROM embeddings e, {final} c
)"""
    )
    ctes.append("assigned AS (SELECT vec_id AS neighbor_id, embedding AS cv, cid FROM ranked WHERE crn = 1)")
    ctes.append(
        f"""probes AS (
  SELECT vec_id AS query_id, embedding AS qv, cid FROM ranked
  WHERE crn <= {n_probe} AND vec_id IN (0, 1, 2, 3, 4)
)"""
    )
    scored_cos = _sql_cosine("p.qv", "a.cv")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
scored AS (
  SELECT p.query_id, a.neighbor_id, {scored_cos} AS sim
  FROM probes p JOIN assigned a USING (cid)
  WHERE a.neighbor_id != p.query_id
)
SELECT query_id, rank, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 5
"""
    )


def _sql_cosine(a: str, b: str) -> str:
    return (
        f"round(list_sum(list_transform(list_zip({a}, {b}), p -> p[1]::DOUBLE * p[2]::DOUBLE)) /"
        f" (sqrt(list_sum([ (x::DOUBLE)*(x::DOUBLE) FOR x IN {a} ])) *"
        f"  sqrt(list_sum([ (x::DOUBLE)*(x::DOUBLE) FOR x IN {b} ]))), 6)"
    )


O_ANN_IVF = f"""
WITH cent AS (
  SELECT vec_id AS cid, embedding AS cvec FROM embeddings ORDER BY vec_id LIMIT 8
), csim AS (
  SELECT e.vec_id, e.embedding, c.cid, {_sql_cosine('e.embedding', 'c.cvec')} AS csim
  FROM embeddings e, cent c
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS crn FROM csim
), assigned AS (
  SELECT vec_id AS neighbor_id, embedding AS cv, cid FROM ranked WHERE crn = 1
), probes AS (
  SELECT vec_id AS query_id, embedding AS qv, cid FROM ranked
  WHERE crn <= 2 AND vec_id IN (0, 1, 2, 3, 4)
), scored AS (
  SELECT p.query_id, a.neighbor_id, {_sql_cosine('p.qv', 'a.cv')} AS sim
  FROM probes p JOIN assigned a USING (cid)
  WHERE a.neighbor_id != p.query_id
)
SELECT query_id, rank, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 5
"""


def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Sign-LSH with integer hyperplanes evaluated as Column expressions: fully
    # oracle-checkable (round 1 ran threshold=0.9 which yields 0 rows on the
    # synthetic random-vector corpus — an empty result validates nothing; 0.3
    # yields ~150 verified pairs at sf0.01).
    from .operators.similarity import EMB_DIM, pairwise_dup_candidates

    return pairwise_dup_candidates(
        _read(spark, sf_dir, "embeddings"), threshold=0.3, n_planes=4, expect_dim=EMB_DIM
    )


def _o_dedup_embedding() -> str:
    from .operators.similarity import EMB_DIM, signlsh_bucket_sql

    bucket = signlsh_bucket_sql("embedding", EMB_DIM, n_planes=4)
    cos = _sql_cosine("a.embedding", "b.embedding")
    return f"""
WITH e AS (SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings)
SELECT id_a, id_b, sim FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, {cos} AS sim
  FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
) WHERE sim >= 0.3
"""


def q_ann_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ: coarse cells + product-quantized ADC scan
    (operators/similarity.ivf_pq_topk) — build and probe both restated exactly
    by the oracle (deterministic first-n codebooks, 6-decimal-quantized
    distances, fixed-order ADC sum)."""
    from .operators.similarity import ivf_pq_topk

    return ivf_pq_topk(
        _read(spark, sf_dir, "embeddings"), [0, 1, 2, 3, 4], k=5, n_list=8, n_probe=2, m=4, n_codes=8
    )


def _sql_l2sq(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(list_zip({a}, {b}), "
        "p -> (p[1]::DOUBLE - p[2]::DOUBLE) * (p[1]::DOUBLE - p[2]::DOUBLE)))"
    )


def _o_ann_ivf_pq() -> str:
    from .operators.similarity import EMB_DIM

    m = 4
    sw = EMB_DIM // m  # subvector width follows the fixture's embedding width
    cos = _sql_cosine("e.embedding", "c.cvec")
    return f"""
WITH cent AS (
  SELECT vec_id AS cid, embedding AS cvec FROM embeddings ORDER BY vec_id LIMIT 8
), csim AS (
  SELECT e.vec_id, e.embedding, c.cid, {cos} AS csim
  FROM embeddings e, cent c
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS crn FROM csim
), assigned AS (
  SELECT vec_id, embedding, cid FROM ranked WHERE crn = 1
), subsrc AS (SELECT unnest(range(0, {m})) AS sub),
cwsrc AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, embedding
  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)
), cw AS (
  SELECT s.sub, w.code, list_slice(w.embedding, s.sub*{sw}+1, s.sub*{sw}+{sw}) AS cwvec
  FROM cwsrc w, subsrc s
), enc AS (
  SELECT vec_id, cid, sub, code FROM (
    SELECT a.vec_id, a.cid, w.sub, w.code,
           round({_sql_l2sq(f"list_slice(a.embedding, w.sub*{sw}+1, w.sub*{sw}+{sw})", "w.cwvec")}, 6) AS dist,
           row_number() OVER (
             PARTITION BY a.vec_id, w.sub
             ORDER BY round({_sql_l2sq(f"list_slice(a.embedding, w.sub*{sw}+1, w.sub*{sw}+{sw})", "w.cwvec")}, 6), w.code
           ) AS rn
    FROM assigned a, cw w
  ) WHERE rn = 1
), codes AS (
  SELECT vec_id, cid,
         min(CASE WHEN sub = 0 THEN code END) AS c0,
         min(CASE WHEN sub = 1 THEN code END) AS c1,
         min(CASE WHEN sub = 2 THEN code END) AS c2,
         min(CASE WHEN sub = 3 THEN code END) AS c3
  FROM enc GROUP BY 1, 2
), dt AS (
  SELECT q.vec_id AS query_id, w.sub, w.code,
         round({_sql_l2sq(f"list_slice(q.embedding, w.sub*{sw}+1, w.sub*{sw}+{sw})", "w.cwvec")}, 6) AS qd
  FROM embeddings q, cw w WHERE q.vec_id IN (0, 1, 2, 3, 4)
), probes AS (
  SELECT vec_id AS query_id, cid FROM ranked WHERE crn <= 2 AND vec_id IN (0, 1, 2, 3, 4)
), cand AS (
  SELECT p.query_id, k.vec_id AS neighbor_id,
         round(d0.qd + d1.qd + d2.qd + d3.qd, 6) AS adist
  FROM probes p
  JOIN codes k USING (cid)
  JOIN dt d0 ON d0.query_id = p.query_id AND d0.sub = 0 AND d0.code = k.c0
  JOIN dt d1 ON d1.query_id = p.query_id AND d1.sub = 1 AND d1.code = k.c1
  JOIN dt d2 ON d2.query_id = p.query_id AND d2.sub = 2 AND d2.code = k.c2
  JOIN dt d3 ON d3.query_id = p.query_id AND d3.sub = 3 AND d3.code = k.c3
  WHERE k.vec_id != p.query_id
)
SELECT query_id, rank, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY adist ASC, neighbor_id ASC) AS rank
  FROM cand
) WHERE rank <= 5
"""


def q_dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023 shape): the
    near-dup pair graph comes from EMBEDDING similarity (sign-LSH blocked,
    verified cosine — operators/similarity.pairwise_dup_candidates) instead of
    lexical shingles, then the same transitive-clustering + keep-best-doc
    policy as dedup_clusters. vec_id is the corpus doc_id (one embedding per
    document). Catches paraphrase-level duplicates MinHash cannot see; at
    100 TB the pair stage is the IVF/LSH-bucketed similarity join, never
    all-pairs."""
    from .operators.curation import dedup_clusters
    from .operators.similarity import EMB_DIM, pairwise_dup_candidates

    docs = _read(spark, sf_dir, "documents")
    pairs = pairwise_dup_candidates(
        _read(spark, sf_dir, "embeddings"), threshold=0.3, n_planes=4, expect_dim=EMB_DIM
    ).select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
    return dedup_clusters(docs, pairs)


def _o_dedup_semantic_clusters() -> str:
    from .operators.similarity import EMB_DIM, signlsh_bucket_sql

    bucket = signlsh_bucket_sql("embedding", EMB_DIM, n_planes=4)
    cos = _sql_cosine("a.embedding", "b.embedding")
    return (
        f"""
WITH RECURSIVE e AS (SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings),
jp AS (
  SELECT id_a AS doc_a, id_b AS doc_b FROM (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, {cos} AS sim
    FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  ) WHERE sim >= 0.3
)"""
        + _DUCK_CC_KEEP_TAIL
    )


def q_text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.textstats import token_count

    return token_count(_read(spark, sf_dir, "documents"))


O_TEXT_TOKEN_COUNT = """
SELECT doc_id,
       len(string_split(trim(regexp_replace(lower(COALESCE(text, '')), '\\W+', ' ', 'g')), ' '))::INT AS n_words,
       ceil(length(COALESCE(text, '')) / 4)::INT AS n_subwords_est
FROM documents
"""


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.textstats import quality_score

    return quality_score(_read(spark, sf_dir, "documents"))


_ALL_STOPWORDS_SQL = "('a','and','das','de','der','die','el','est','et','ein','in','is','ist','la','le','of','the','to','un','una','une','und','y','zu','es')"

O_TEXT_QUALITY = f"""
WITH t AS (
  SELECT doc_id, COALESCE(text, '') AS text,
         string_split(trim(regexp_replace(lower(COALESCE(text, '')), '\\W+', ' ', 'g')), ' ') AS toks
  FROM documents
), m AS (
  SELECT doc_id,
         len(toks)::INT AS n_words,
         len(list_filter(toks, t -> t IN {_ALL_STOPWORDS_SQL})) AS stop_hits,
         length(regexp_replace(text, '[\\w\\s]', '', 'g')) AS punct,
         length(text) AS n_chars
  FROM t
)
SELECT doc_id, n_words,
       round(stop_hits::DOUBLE / greatest(n_words, 1), 6) AS stopword_ratio,
       round(punct::DOUBLE / greatest(n_chars, 1), 6) AS punct_ratio,
       round(0.4 * (stop_hits::DOUBLE / greatest(n_words, 1))
           + 0.3 * least(n_words::DOUBLE / 100.0, 1.0)
           + 0.3 * (1.0 - punct::DOUBLE / greatest(n_chars, 1)), 6) AS quality
FROM m
"""


def q_text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.textstats import language_id

    return language_id(_read(spark, sf_dir, "documents"))


O_TEXT_LANGUAGE_ID = """
WITH t AS (
  SELECT doc_id, string_split(trim(regexp_replace(lower(COALESCE(text, '')), '\\W+', ' ', 'g')), ' ') AS toks
  FROM documents
), hits AS (
  SELECT doc_id, lang, CAST(CASE lang
           WHEN 'de' THEN len(list_filter(toks, x -> x IN ('der','die','das','und','ein','ist','zu')))
           WHEN 'en' THEN len(list_filter(toks, x -> x IN ('the','a','and','of','to','in','is')))
           WHEN 'es' THEN len(list_filter(toks, x -> x IN ('el','la','y','de','un','una','es')))
           WHEN 'fr' THEN len(list_filter(toks, x -> x IN ('le','la','et','de','un','une','est')))
         END AS INTEGER) AS n
  FROM t, (SELECT unnest(['de','en','es','fr']) AS lang)
), best AS (
  SELECT doc_id, lang, n FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, lang ASC) AS rn FROM hits
  ) WHERE rn = 1
)
SELECT doc_id, CASE WHEN n > 0 THEN lang ELSE 'und' END AS lang_pred, n AS lang_hits FROM best
"""


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.textstats import fingerprint

    return fingerprint(_read(spark, sf_dir, "documents"), 5)


O_TEXT_FINGERPRINT = (
    _DUCK_SHINGLES.format(nm1=4)
    + """
SELECT s.doc_id,
       md5(trim(regexp_replace(lower(COALESCE(d.text, '')), '\\W+', ' ', 'g'))) AS content_md5,
       CASE WHEN len(s.shingles) > 0 THEN list_min([md5(x) FOR x IN s.shingles]) END AS min_shingle_md5
FROM sh s JOIN documents d USING (doc_id)
"""
)


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload plumbing through mapInPandas. The payload is
    ``unhex(md5(text))`` (attach_fake_media), so every output column is
    arithmetically reconstructible in DuckDB: n_bytes = 16, payload_md5 =
    md5(hex(payload)) = md5(md5(text)), feature_0 = first digest byte decoded
    from the leading hex pair — an exact oracle on the mapInPandas plumbing."""
    from .operators.multimodal import attach_fake_media, extract_features

    return extract_features(attach_fake_media(_read(spark, sf_dir, "documents")))


O_MEDIA_FEATURES = """
WITH d AS (
  SELECT doc_id, md5(coalesce(text, '')) AS hx FROM documents
)
SELECT doc_id,
       ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
       CAST(16 AS INT) AS n_bytes,
       md5(hx) AS payload_md5,
       CAST(16 * (position(substr(hx, 1, 1) IN '0123456789abcdef') - 1)
          + (position(substr(hx, 2, 1) IN '0123456789abcdef') - 1) AS INT) AS feature_0
FROM d
"""


def q_media_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL end-to-end image decode (no codec libs): worker-side binary PPM
    encode from each document, then mapInPandas header-parse + per-channel
    pixel means. The oracle recreates the pixel bytes arithmetically from
    DuckDB's md5 hex — an exact-value check on a genuine binary decoder."""
    from .operators.multimodal import attach_ppm_media, image_stats

    return image_stats(attach_ppm_media(_read(spark, sf_dir, "documents")))


O_MEDIA_IMAGE_STATS = """
WITH d AS (
  SELECT doc_id, md5(coalesce(text,'')) AS hx,
         CAST(doc_id % 7 + 2 AS INT) AS width, CAST(doc_id % 5 + 2 AS INT) AS height
  FROM documents
), b AS (
  -- byte k of the payload = byte (k mod 16) of the md5 digest, decoded from
  -- the hex pair by alphabet position; channel = k mod 3
  SELECT doc_id, width, height,
         (16 * (position(substr(hx, 2*(k%16)+1, 1) IN '0123456789abcdef') - 1)
             + (position(substr(hx, 2*(k%16)+2, 1) IN '0123456789abcdef') - 1)) AS v,
         k % 3 AS c
  FROM d, unnest(range(width*height*3)) AS u(k)
)
SELECT doc_id, width, height,
       CAST(SUM(CASE WHEN c=0 THEN v END) // (width*height) AS INT) AS mean_r,
       CAST(SUM(CASE WHEN c=1 THEN v END) // (width*height) AS INT) AS mean_g,
       CAST(SUM(CASE WHEN c=2 THEN v END) // (width*height) AS INT) AS mean_b
FROM b GROUP BY doc_id, width, height
"""


def q_media_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL end-to-end audio decode (no codec libs): worker-side PCM WAV encode
    from each document, then mapInPandas RIFF-header parse + RMS amplitude over
    the samples. Oracle recreates the little-endian signed 16-bit samples from
    DuckDB's md5 hex; sums of squares stay under 2^53 so the double arithmetic
    is bit-identical across engines."""
    from .operators.multimodal import attach_wav_media, audio_stats

    return audio_stats(attach_wav_media(_read(spark, sf_dir, "documents")))


O_MEDIA_AUDIO_STATS = """
WITH d AS (
  SELECT doc_id, md5(coalesce(text,'')) AS hx,
         CAST(doc_id % 50 + 10 AS INT) AS n,
         CAST(8000 + doc_id % 4 * 4000 AS INT) AS sample_rate
  FROM documents
), raw AS (
  -- sample k = little-endian signed int16 of payload bytes (2k, 2k+1), each
  -- byte = digest byte (j mod 16) decoded from the hex pair
  SELECT doc_id, n, sample_rate,
         ((16 * (position(substr(hx, 2*((2*k)%16)+1, 1) IN '0123456789abcdef') - 1)
              + (position(substr(hx, 2*((2*k)%16)+2, 1) IN '0123456789abcdef') - 1))
        + 256 * (16 * (position(substr(hx, 2*((2*k+1)%16)+1, 1) IN '0123456789abcdef') - 1)
              + (position(substr(hx, 2*((2*k+1)%16)+2, 1) IN '0123456789abcdef') - 1))) AS u
  FROM d, unnest(range(n)) AS t(k)
), s AS (
  SELECT doc_id, n, sample_rate,
         CAST(CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS DOUBLE) AS v
  FROM raw
)
SELECT doc_id, sample_rate, n AS n_samples,
       CAST(floor(sqrt(SUM(v * v) / n)) AS INT) AS rms
FROM s GROUP BY doc_id, sample_rate, n
"""


def q_media_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL end-to-end video frame sampling (no codec libs): worker-side raw
    YUV4MPEG2 encode from each document, then mapInPandas FRAME-marker parse
    fanning out one row per frame with its Y-plane luma mean. Oracle recreates
    each frame's luma bytes arithmetically from DuckDB's md5 hex."""
    from .operators.multimodal import attach_y4m_media, frame_luma_stats

    return frame_luma_stats(attach_y4m_media(_read(spark, sf_dir, "documents")))


O_MEDIA_FRAME_STATS = """
WITH d AS (
  SELECT doc_id, md5(coalesce(text,'')) AS hx,
         CAST(doc_id % 3 * 2 + 4 AS INT) AS width,
         CAST(doc_id % 2 * 2 + 2 AS INT) AS height,
         CAST(doc_id % 4 + 1 AS INT) AS n_frames
  FROM documents
), fr AS (
  SELECT *, width*height + 2*(width*height//4) AS plane FROM d
), px AS (
  -- Y-plane byte j of frame f = stream byte (f*plane + j) = digest byte
  -- ((f*plane + j) mod 16), decoded from the hex pair
  SELECT doc_id, width, height, CAST(f AS INT) AS frame_idx,
         (16 * (position(substr(hx, 2*((f*plane + j) % 16)+1, 1) IN '0123456789abcdef') - 1)
             + (position(substr(hx, 2*((f*plane + j) % 16)+2, 1) IN '0123456789abcdef') - 1)) AS v
  FROM fr, unnest(range(n_frames)) AS a(f), unnest(range(width*height)) AS b(j)
)
SELECT doc_id, frame_idx, width, height,
       CAST(SUM(v) // (width*height) AS INT) AS mean_y
FROM px GROUP BY doc_id, frame_idx, width, height
"""


# ---------------------------------------------------------------------------
# Enrichment mode (reference §3.3: occurrence counts + property assignment)
# ---------------------------------------------------------------------------


def q_kg_occurrences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.enrich import occurrence_counts

    return occurrence_counts(_links(spark, sf_dir))


O_KG_OCCURRENCES = (
    SQL_PREFIX
    + """
SELECT uri, count(*) AS occurrences FROM (
  SELECT unnest(string_split(chosen_uris, ' ')) AS uri FROM links
  WHERE chosen_uris IS NOT NULL AND chosen_uris != ''
) GROUP BY 1
"""
)

PROP_LAT = "http://kb.test/prop/lat"
PROP_LAT2 = "http://kb.test/prop/lat_fallback"
PROP_LON = "http://kb.test/prop/long"
PROP_LON2 = "http://kb.test/prop/long_fallback"


def q_kg_geo_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Property-priority assignment (GeodataGeneration.java:53-55 semantics):
    primary lat/long properties exist for nationkey % 3 != 0, the fallback
    property for everyone — the coalesce order decides."""
    from .operators.enrich import assign_property

    nat = _read(spark, sf_dir, "nation")
    k = F.col("n_nationkey").cast("string")
    uri = F.concat(F.lit(f"{BASE}/nat/"), k)
    entities = nat.select(uri.alias("uri"), F.concat("n_name", F.lit("X")).alias("name"))
    primary = nat.filter(F.col("n_nationkey") % 3 != 0)
    geo_parts = [
        primary.select(uri.alias("subj"), F.lit(PROP_LAT).alias("pred"), F.concat(F.lit("4"), k, F.lit(".5")).alias("obj")),
        nat.select(uri.alias("subj"), F.lit(PROP_LAT2).alias("pred"), F.concat(F.lit("0."), k).alias("obj")),
        primary.select(uri.alias("subj"), F.lit(PROP_LON).alias("pred"), F.concat(F.lit("-"), k, F.lit(".25")).alias("obj")),
        nat.select(uri.alias("subj"), F.lit(PROP_LON2).alias("pred"), F.concat(F.lit("1."), k).alias("obj")),
    ]
    geo = geo_parts[0]
    for p in geo_parts[1:]:
        geo = geo.unionByName(p)
    out = assign_property(entities, geo, [PROP_LAT, PROP_LAT2], "lat")
    out = assign_property(out, geo, [PROP_LON, PROP_LON2], "lon")
    return out.select("uri", "name", "lat", "lon")


O_KG_GEO_ENRICH = f"""
WITH ent AS (
  SELECT '{BASE}/nat/' || CAST(n_nationkey AS VARCHAR) AS uri,
         n_name || 'X' AS name, n_nationkey AS k
  FROM nation
)
SELECT uri, name,
       CASE WHEN k % 3 != 0 THEN '4' || CAST(k AS VARCHAR) || '.5'
            ELSE '0.' || CAST(k AS VARCHAR) END AS lat,
       CASE WHEN k % 3 != 0 THEN '-' || CAST(k AS VARCHAR) || '.25'
            ELSE '1.' || CAST(k AS VARCHAR) END AS lon
FROM ent
"""


PROP_PIC = "http://kb.test/prop/depiction"
PROP_PIC2 = "http://kb.test/prop/image_fallback"
PROP_DOM = "http://kb.test/prop/fieldOfActivity"
PROP_DOM2 = "http://kb.test/prop/domain_fallback"
COMMONS = "http://commons.wikimedia.org"


def q_kg_author_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """persName enrichment (AuthorsEnrichment.java:29-75): depiction via the
    picProperties priority list restricted to commons.wikimedia values,
    field of activity via domaineProperties. Fixture: primary depiction
    property present for k % 5 != 0 (with a commons value only for even k),
    fallback (always commons) for everyone; primary domain for k % 3 != 0."""
    from .operators.enrich import author_enrichment

    nat = _read(spark, sf_dir, "nation")
    k = F.col("n_nationkey").cast("string")
    uri = F.concat(F.lit(f"{BASE}/per/"), k)
    entities = nat.select(uri.alias("uri"), F.concat("n_name", F.lit("X")).alias("name"))
    primary = nat.filter(F.col("n_nationkey") % 5 != 0)
    even = primary.filter(F.col("n_nationkey") % 2 == 0)
    parts = [
        primary.select(uri.alias("subj"), F.lit(PROP_PIC).alias("pred"), F.concat(F.lit("http://example.org/pic/"), k, F.lit(".jpg")).alias("obj")),
        even.select(uri.alias("subj"), F.lit(PROP_PIC).alias("pred"), F.concat(F.lit(f"{COMMONS}/pic/"), k, F.lit(".jpg")).alias("obj")),
        nat.select(uri.alias("subj"), F.lit(PROP_PIC2).alias("pred"), F.concat(F.lit(f"{COMMONS}/alt/"), k, F.lit(".jpg")).alias("obj")),
        nat.filter(F.col("n_nationkey") % 3 != 0).select(uri.alias("subj"), F.lit(PROP_DOM).alias("pred"), F.concat(F.lit("Literature"), k).alias("obj")),
        nat.select(uri.alias("subj"), F.lit(PROP_DOM2).alias("pred"), F.concat(F.lit("Domain"), k).alias("obj")),
    ]
    kb = parts[0]
    for p in parts[1:]:
        kb = kb.unionByName(p)
    out = author_enrichment(entities, kb, [PROP_PIC, PROP_PIC2], [PROP_DOM, PROP_DOM2])
    return out.select("uri", "name", "depiction", "field_of_activity")


O_KG_AUTHOR_ENRICH = f"""
WITH ent AS (
  SELECT '{BASE}/per/' || CAST(n_nationkey AS VARCHAR) AS uri,
         n_name || 'X' AS name, n_nationkey AS k
  FROM nation
)
SELECT uri, name,
       CASE WHEN k % 5 = 0 THEN '{COMMONS}/alt/' || CAST(k AS VARCHAR) || '.jpg'
            WHEN k % 2 = 0 THEN '{COMMONS}/pic/' || CAST(k AS VARCHAR) || '.jpg'
            ELSE 'http://example.org/pic/' || CAST(k AS VARCHAR) || '.jpg' END AS depiction,
       CASE WHEN k % 3 != 0 THEN 'Literature' || CAST(k AS VARCHAR)
            ELSE 'Domain' || CAST(k AS VARCHAR) END AS field_of_activity
FROM ent
"""


# ---------------------------------------------------------------------------
# Generic relational operators (scan/filter pushdown, join, agg, window)
# ---------------------------------------------------------------------------


def q_rel_pushdown_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("bigint").alias("sum_qty"),
            F.count("*").alias("n_rows"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        )
    )


O_REL_PUSHDOWN_AGG = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
       count(*) AS n_rows,
       count(DISTINCT l_partkey) AS n_parts,
       round(avg(l_discount), 4) AS avg_disc
FROM lineitem WHERE l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY 1, 2
"""


def q_rel_join_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _read(spark, sf_dir, "orders")
    c = _read(spark, sf_dir, "customer")
    counts = o.groupBy("o_custkey").agg(F.count("*").alias("n_orders"))
    w = Window.orderBy(F.desc("n_orders"), F.asc("o_custkey"))
    top = counts.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 10)
    return top.join(F.broadcast(c), top.o_custkey == c.c_custkey).select(
        "rnk", "c_custkey", "c_mktsegment", "n_orders"
    )


O_REL_JOIN_TOPK = """
WITH counts AS (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY 1),
top AS (
  SELECT *, row_number() OVER (ORDER BY n_orders DESC, o_custkey ASC) AS rnk FROM counts
)
SELECT rnk, c_custkey, c_mktsegment, n_orders
FROM top JOIN customer ON o_custkey = c_custkey WHERE rnk <= 10
"""


def q_rel_significance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired t + Wilcoxon signed-rank over positionally-paired scores of two
    runs (SignificanceTesting.java:23-113 prepares the pairs, defers the test
    to R; here the statistics are computed in-engine). Scores derived
    deterministically from events as two pseudo-runs."""
    from .operators.compare import paired_t_test, wilcoxon_signed_rank

    ev = _read(spark, sf_dir, "events")
    paired = ev.select(
        ((F.col("event_id") % 13).cast("double") / 2).alias("score_a"),
        ((F.col("event_id") % 11).cast("double") / 2).alias("score_b"),
    )
    return paired_t_test(paired).crossJoin(wilcoxon_signed_rank(paired))


O_REL_SIGNIFICANCE = """
WITH d0 AS (
  SELECT (event_id % 13)::DOUBLE / 2 - (event_id % 11)::DOUBLE / 2 AS d FROM events
), t AS (
  -- count(d) skips null pairs, matching the null-skipping avg/stddev sample
  SELECT count(d) AS n, round(avg(d), 9) AS mean_diff, round(stddev_samp(d), 9) AS sd_diff
  FROM d0
), ranked AS (
  SELECT d, abs(d) AS abs_d, row_number() OVER (ORDER BY abs(d)) AS rn
  FROM d0 WHERE d != 0
), ar AS (
  SELECT d, avg(rn::DOUBLE) OVER (PARTITION BY abs_d) AS arank FROM ranked
), w AS (
  SELECT count(*) AS n_nonzero,
         round(sum(CASE WHEN d > 0 THEN arank ELSE 0 END), 6) AS w_plus
  FROM ar
)
SELECT n, mean_diff, sd_diff,
       round(mean_diff / (sd_diff / sqrt(n)), 6) AS t_stat,
       n_nonzero, w_plus
FROM t, w
"""


def q_rel_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    return (
        ev.withColumn("prev_ts", prev)
        # Gap on truncated epoch seconds: Spark's timestampdiff(SECOND,...)
        # counts *complete elapsed* seconds while DuckDB's date_diff('second')
        # counts second-boundary crossings; with fractional-µs timestamps a
        # borderline 1800s gap classifies differently (round-1 hash fail).
        # unix_timestamp() truncates to the epoch second in both engines.
        .withColumn("gap_s", F.unix_timestamp("ts") - F.unix_timestamp("prev_ts"))
        .withColumn("new_sess", F.when(F.col("prev_ts").isNull() | (F.col("gap_s") > 1800), 1).otherwise(0))
        .groupBy("user_id")
        .agg(F.sum("new_sess").alias("n_sessions"), F.count("*").alias("n_events"))
    )


O_REL_SESSIONIZE = """
WITH g AS (
  SELECT user_id,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                OR date_diff('second', lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
)
SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions, count(*) AS n_events FROM g GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Annotated-output sink + diagnostics (produceResults / printRelationFrequency)
# ---------------------------------------------------------------------------


def q_kg_annotated_refs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-occurrence ref_auto values with the uri(score) suffix
    (produceResults, ResultsAndEvaluationNEL.java:86-91)."""
    from .operators.annotate import annotate_links

    return annotate_links(_links(spark, sf_dir), add_scores=True)


O_KG_ANNOTATED_REFS = (
    SQL_PREFIX
    + """
SELECT conv_id, turn_idx, occ_idx, mention,
       CASE WHEN score IS NOT NULL
            THEN chosen_uris || '(' || CAST(score AS VARCHAR) || ')'
            ELSE chosen_uris END AS ref_auto
FROM links
"""
)


def q_kg_annotated_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turn text with [ref] markers after each linked mention — the transcript
    analogue of the -outV3.xml sink."""
    from .operators.annotate import annotate_turns

    s = _kg_stack(spark, sf_dir)
    links = _links(spark, sf_dir)
    return annotate_turns(s["transcripts"], s["mentions"], links)


O_KG_ANNOTATED_TURNS = (
    SQL_PREFIX
    + """
SELECT t.conv_id, t.turn_idx,
       'On parla de ' || t.n1 || '[' || l0.chosen_uris || '] puis de ' || t.n2
        || '[' || l1.chosen_uris || '] ensemble.' AS annotated_text
FROM turns_raw t
JOIN links l0 ON l0.conv_id = t.conv_id AND l0.turn_idx = t.turn_idx AND l0.occ_idx = 0
JOIN links l1 ON l1.conv_id = t.conv_id AND l1.turn_idx = t.turn_idx AND l1.occ_idx = 1
"""
)


def q_kg_relation_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global predicate frequency over the fused conversation graphs
    (printRelationFrequency)."""
    from .operators.annotate import relation_frequency

    s = _kg_stack(spark, sf_dir)
    ok = s["cases"].filter(F.col("case") == "Ok").select("conv_id")
    cand_ok = s["candidates"].join(ok, "conv_id", "left_semi")
    edges = fuse_edges(cand_ok, s["kb_edges"], s["rel_weights"], CFG)
    return relation_frequency(edges)


O_KG_RELATION_FREQUENCY = SQL_PREFIX + "SELECT pred, count(*) AS n_edges FROM edges GROUP BY 1"


def q_dico_regex_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp dictionary probe (Lucene RegexpQuery path)."""
    from .operators.candidates import dico_regex_lookup

    d = derive_dico(spark, sf_dir)
    return dico_regex_lookup(d, "^nation_1[0-9]x$").select(
        "alias", "alias_norm", F.concat_ws(" ", "uris").alias("uris_joined")
    )


O_DICO_REGEX_LOOKUP = (
    SQL_PREFIX
    + """
SELECT alias, alias_norm, array_to_string(uris, ' ') AS uris_joined
FROM dico WHERE regexp_matches(alias_norm, '^nation_1[0-9]x$')
"""
)


def q_dico_build_places(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Place-source dictionary build (QueryPlaceDBpedia/WikiData semantics:
    language filter, letter shard, type gate, sameAs prefix filter, alt-label
    aliases, lat/lon typed columns) over a nation-derived place dump. The dump
    is multi-row per URI — every third place arrives as TWO SPARQL result rows
    (different alt-label/sameAs bindings), exercising the merge-by-URI fold."""
    from .plans.dico_build import build_place_dico

    n = _read(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    ks = k.cast("string")
    places = n.select(
        F.concat(F.lit("http://kb.test/place/"), ks).alias("uri"),
        F.col("n_name").alias("label"),
        F.when(k % 5 == 0, "en").otherwise("fr").alias("label_lang"),
        F.when(k % 2 == 0, F.concat(F.lit("Alt "), F.col("n_name"))).alias("alt_label"),
        F.when(k % 4 == 0, "en").otherwise("fr").alias("alt_lang"),
        (k % 7 != 0).alias("is_place"),
        (k.cast("double") * 1.5).alias("lat"),
        (k.cast("double") * -0.5).alias("lon"),
        F.when(k % 3 == 0, F.concat(F.lit("http://dbpedia.org/resource/P"), ks))
        .otherwise(F.concat(F.lit("http://other.kb/P"), ks))
        .alias("sameas"),
    )
    second = n.filter(k % 3 == 0).select(
        F.concat(F.lit("http://kb.test/place/"), ks).alias("uri"),
        F.col("n_name").alias("label"),
        F.when(k % 5 == 0, "en").otherwise("fr").alias("label_lang"),
        F.concat(F.lit("Aka "), F.col("n_name")).alias("alt_label"),
        F.lit("fr").alias("alt_lang"),
        (k % 7 != 0).alias("is_place"),
        (k.cast("double") * 1.5).alias("lat"),
        (k.cast("double") * -0.5).alias("lon"),
        F.concat(F.lit("http://dbpedia.org/resource/Q"), ks).alias("sameas"),
    )
    return build_place_dico(places.unionByName(second)).select(
        "alias", "alias_norm", "name", "letter", "lat", "lon",
        F.concat_ws(" ", "uris").alias("uris_joined"),
    )


O_DICO_BUILD_PLACES = """
WITH places AS (
  SELECT 'http://kb.test/place/' || CAST(n_nationkey AS VARCHAR) AS uri,
         n_name AS label,
         CASE WHEN n_nationkey % 5 = 0 THEN 'en' ELSE 'fr' END AS label_lang,
         CASE WHEN n_nationkey % 2 = 0 THEN 'Alt ' || n_name END AS alt_label,
         CASE WHEN n_nationkey % 4 = 0 THEN 'en' ELSE 'fr' END AS alt_lang,
         n_nationkey % 7 != 0 AS is_place,
         CAST(n_nationkey AS DOUBLE) * 1.5 AS lat,
         CAST(n_nationkey AS DOUBLE) * -0.5 AS lon,
         CASE WHEN n_nationkey % 3 = 0 THEN 'http://dbpedia.org/resource/P' || CAST(n_nationkey AS VARCHAR)
              ELSE 'http://other.kb/P' || CAST(n_nationkey AS VARCHAR) END AS sameas
  FROM nation
  UNION ALL
  SELECT 'http://kb.test/place/' || CAST(n_nationkey AS VARCHAR),
         n_name,
         CASE WHEN n_nationkey % 5 = 0 THEN 'en' ELSE 'fr' END,
         'Aka ' || n_name,
         'fr',
         n_nationkey % 7 != 0,
         CAST(n_nationkey AS DOUBLE) * 1.5,
         CAST(n_nationkey AS DOUBLE) * -0.5,
         'http://dbpedia.org/resource/Q' || CAST(n_nationkey AS VARCHAR)
  FROM nation WHERE n_nationkey % 3 = 0
), filtered AS (
  SELECT * FROM places WHERE is_place AND lower(label_lang) = 'fr'
), merged AS (
  -- merge-by-URI: fold alt-label / sameAs bindings of one place into sets,
  -- mirroring the Spark builder's groupBy('uri') + collect_set; the
  -- representative (label, lat, lon) is one struct-min = a coherent binding
  -- row, coordinate-bearing bindings first (+inf sentinel for null coords)
  SELECT uri,
         min({'m': (lat IS NULL OR lon IS NULL), 'label': label,
              'klat': coalesce(lat, 'infinity'::DOUBLE),
              'klon': coalesce(lon, 'infinity'::DOUBLE)}) AS rep,
         list_sort(list_distinct(list(CASE WHEN sameas LIKE 'http://dbpedia.org/%' THEN sameas END))) AS sameas_refs,
         list_sort(list_distinct(list(CASE WHEN lower(alt_lang) = 'fr' THEN alt_label END))) AS alt_labels
  FROM filtered GROUP BY uri
), lettered AS (
  SELECT uri, rep.label AS label,
         CASE WHEN rep.klat = 'infinity'::DOUBLE THEN NULL ELSE rep.klat END AS lat,
         CASE WHEN rep.klon = 'infinity'::DOUBLE THEN NULL ELSE rep.klon END AS lon,
         sameas_refs, alt_labels,
         CASE WHEN regexp_matches(lower(substr(label, 1, 1)), '^[a-z]$')
              THEN lower(substr(label, 1, 1)) ELSE 'other' END AS letter,
         CASE WHEN len(sameas_refs) > 0 THEN uri || ' ' || array_to_string(sameas_refs, ' ')
              ELSE uri END AS uris_joined
  FROM merged
), exploded AS (
  SELECT unnest(list_distinct([label] || alt_labels)) AS alias,
         label, letter, lat, lon, uris_joined
  FROM lettered
)
SELECT alias,
       lower(regexp_replace(alias, '[\\s\\x0b\\xa0 ]|''|-', '', 'g')) AS alias_norm,
       label AS name, letter, lat, lon, uris_joined
FROM exploded WHERE alias != ''
"""


def q_dico_geonames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geonames-dump -> dico transform over a nation-derived dump shape."""
    from .plans.dico_build import geonames_to_dico

    nat = _read(spark, sf_dir, "nation")
    k = F.col("n_nationkey").cast("string")
    raw = nat.select(
        F.col("n_nationkey").alias("geonameid"),
        F.col("n_name").alias("name"),
        F.when(
            F.col("n_nationkey") % 4 != 0, F.concat(F.lit("Alt"), k, F.lit(",Aka"), k)
        ).alias("alternatenames"),
    )
    return geonames_to_dico(raw).select(
        "alias", "alias_norm", "name", "ne_type", F.concat_ws(" ", "uris").alias("uris_joined")
    )


O_DICO_GEONAMES = """
WITH raw AS (
  SELECT n_nationkey AS geonameid, n_name AS name,
         CASE WHEN n_nationkey % 4 != 0
              THEN 'Alt' || CAST(n_nationkey AS VARCHAR) || ',Aka' || CAST(n_nationkey AS VARCHAR)
         END AS alternatenames
  FROM nation
), names AS (
  SELECT 'http://sws.geonames.org/' || CAST(geonameid AS VARCHAR) || '/' AS uri, name AS alias FROM raw
  UNION ALL
  SELECT 'http://sws.geonames.org/' || CAST(geonameid AS VARCHAR) || '/',
         unnest(string_split(COALESCE(alternatenames, ''), ','))
  FROM raw
)
SELECT DISTINCT alias,
       lower(regexp_replace(alias, '[\\s\\x0b\\xa0 ]|''|-', '', 'g')) AS alias_norm,
       alias AS name, 'LOC' AS ne_type, uri AS uris_joined
FROM names WHERE alias != ''
"""


# ---------------------------------------------------------------------------
# Comparison / analysis extras (reference extra/ package)
# ---------------------------------------------------------------------------


def q_kg_mentions_relational(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-DataFrame gazetteer twin (broadcast join + boundary predicates +
    maximality anti-join) — must match the pandas-UDF path's oracle exactly on
    the derived corpus (no term repeats within a turn)."""
    from .operators.mentions import detect_mentions_relational

    transcripts = derive_transcripts(spark, sf_dir)
    terms = derive_mention_terms(spark, sf_dir)
    return detect_mentions_relational(transcripts, terms).select(
        "conv_id", "turn_idx", "occ_idx", "mention", "start_pos"
    )


def q_kg_population_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gold entities covered by the crawled KB subjects
    (CalculatePopulationCompletenessLD semantics; even nation keys only have
    base-URI subjects in kb_edges => completeness < 1)."""
    from .operators.compare import population_completeness

    gold = derive_gold(spark, sf_dir)
    kb_uris = derive_kb_edges(spark, sf_dir).select(F.col("subj").alias("uri"))
    out = population_completeness(gold, kb_uris)
    return out.select(
        "n_gold_entities", "n_covered", F.round("completeness", 6).alias("completeness")
    )


O_KG_POPULATION = (
    SQL_PREFIX
    + """
SELECT g.n AS n_gold_entities, c.n AS n_covered,
       round(c.n::DOUBLE / g.n, 6) AS completeness
FROM (SELECT count(*) AS n FROM (SELECT DISTINCT gold_uri FROM gold WHERE gold_uri IS NOT NULL)) g,
     (SELECT count(*) AS n FROM (SELECT DISTINCT gold_uri FROM gold WHERE gold_uri IS NOT NULL)
      WHERE gold_uri IN (SELECT subj FROM kb_edges)) c
"""
)


def q_kg_score_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score recovery from 'uri(0.123)'-style annotations
    (SignificanceTesting.prepareData)."""
    from .operators.compare import scores_from_annotations

    nat = _read(spark, sf_dir, "nation")
    k = F.col("n_nationkey").cast("string")
    annotated = nat.select(
        F.col("n_nationkey").cast("int").alias("key"),
        F.concat(F.lit(f"{BASE}/nat/"), k, F.lit("(0."), k, F.lit(")")).alias("ref_auto"),
    )
    return scores_from_annotations(annotated).select("key", F.round("score", 6).alias("score"))


O_KG_SCORE_EXTRACT = f"""
SELECT CAST(n_nationkey AS INTEGER) AS key,
       round(CAST(regexp_extract('{BASE}/nat/' || CAST(n_nationkey AS VARCHAR)
                  || '(0.' || CAST(n_nationkey AS VARCHAR) || ')', '\\((\\d[\\d.]*)\\)', 1) AS DOUBLE), 6) AS score
FROM nation
"""


def q_rel_lifespan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date->year extraction over the reference's accepted masks ('yyyy',
    'yyyy-MM-dd', 'dd..' century mask) + pairwise life-span overlap
    (DateSpecificProcessingNEL.java:15-63)."""
    from .functions.text import life_span_overlap, year_from_date

    c = _read(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    k = F.col("c_custkey")
    birth_raw = (
        F.when(k % 3 == 0, F.concat((F.lit(1800) + k % 80).cast("string"), F.lit("-06-15")))
        .when(k % 3 == 1, (F.lit(1800) + k % 80).cast("string"))
        .otherwise(F.lit("18.."))
    )
    death_raw = (F.lit(1850) + k % 80).cast("string")
    df = c.select(
        k.cast("int").alias("key"),
        birth_raw.alias("birth_raw"),
        death_raw.alias("death_raw"),
        year_from_date(birth_raw).alias("birth_year"),
        year_from_date(death_raw).alias("death_year"),
    )
    ref_b = F.lit(1820)
    ref_d = F.lit(1870)
    return df.select(
        "key",
        "birth_year",
        "death_year",
        life_span_overlap(F.col("birth_year"), F.col("death_year"), ref_b, ref_d).alias("overlap_1820_1870"),
    )


O_REL_LIFESPAN = """
WITH p AS (
  SELECT CAST(c_custkey AS INTEGER) AS key,
         CASE WHEN c_custkey % 3 = 0 THEN CAST(1800 + c_custkey % 80 AS VARCHAR) || '-06-15'
              WHEN c_custkey % 3 = 1 THEN CAST(1800 + c_custkey % 80 AS VARCHAR)
              ELSE '18..' END AS birth_raw,
         CAST(1850 + c_custkey % 80 AS VARCHAR) AS death_raw
  FROM customer WHERE c_custkey <= 200
), y AS (
  SELECT key,
         CASE WHEN regexp_extract(birth_raw, '^(\\d{4})', 1) != ''
                THEN CAST(regexp_extract(birth_raw, '^(\\d{4})', 1) AS INTEGER)
              WHEN regexp_extract(birth_raw, '^(\\d{2})\\.\\.', 1) != ''
                THEN CAST(regexp_extract(birth_raw, '^(\\d{2})\\.\\.', 1) AS INTEGER) * 100
         END AS birth_year,
         CAST(regexp_extract(death_raw, '^(\\d{4})', 1) AS INTEGER) AS death_year
  FROM p
)
SELECT key, birth_year, death_year,
       greatest(0, least(death_year, 1870) - greatest(birth_year, 1820)) AS overlap_1820_1870
FROM y
"""


# ---------------------------------------------------------------------------
# Dictionary-build job over a derived person table
# ---------------------------------------------------------------------------


def q_dico_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .plans.dico_build import build_dico

    c = _read(spark, sf_dir, "customer")
    persons = c.select(
        F.concat(F.lit("http://kb.test/person/"), F.col("c_custkey").cast("string")).alias("uri"),
        F.concat(F.lit("Jean"), (F.col("c_custkey") % 7).cast("string")).alias("first_name"),
        F.concat(F.lit("Martin"), F.col("c_custkey").cast("string")).alias("last_name"),
        F.when(F.col("c_custkey") % 2 == 0, "male").otherwise("female").alias("gender"),
        (F.lit(1800) + F.col("c_custkey") % 100).cast("string").alias("birth_date"),
        (F.lit(1850) + F.col("c_custkey") % 100).cast("string").alias("death_date"),
        F.when(
            F.col("c_custkey") % 3 == 0,
            F.concat(F.lit("http://ext.kb/person/"), F.col("c_custkey").cast("string")),
        ).alias("ref"),
        F.when(
            F.col("c_custkey") % 4 == 0,
            # the ' (pseudonyme)' suffix on every 8th key exercises the
            # reference's truncate-at-'(' of rejected forms (BNF :176-178)
            F.concat(
                F.lit("Rejected"),
                F.col("c_custkey").cast("string"),
                F.when(F.col("c_custkey") % 8 == 0, F.lit(" (pseudonyme)")).otherwise(F.lit("")),
            ),
        ).alias("rejected_form"),
    )
    d = build_dico(persons, greater_than=1820, lesser_than=1880)
    return d.select("alias", "alias_norm", "name", "letter", F.concat_ws(" ", "uris").alias("uris_joined"))


O_DICO_BUILD = """
WITH persons AS (
  SELECT 'http://kb.test/person/' || CAST(c_custkey AS VARCHAR) AS uri,
         'Jean' || CAST(c_custkey % 7 AS VARCHAR) AS first_name,
         'Martin' || CAST(c_custkey AS VARCHAR) AS last_name,
         CASE WHEN c_custkey % 2 = 0 THEN 'M' ELSE 'Mme' END AS title,
         CAST(1800 + c_custkey % 100 AS VARCHAR) AS birth_date,
         CAST(1850 + c_custkey % 100 AS VARCHAR) AS death_date,
         CASE WHEN c_custkey % 3 = 0 THEN 'http://ext.kb/person/' || CAST(c_custkey AS VARCHAR) END AS ref,
         -- truncate-at-'(' applied here mirrors clean_label on the Spark side
         CASE WHEN c_custkey % 4 = 0 THEN trim(split_part(
           'Rejected' || CAST(c_custkey AS VARCHAR) ||
           CASE WHEN c_custkey % 8 = 0 THEN ' (pseudonyme)' ELSE '' END, '(', 1)) END AS rejected_form,
         1800 + c_custkey % 100 AS birth_year
  FROM customer
), filtered AS (
  SELECT * FROM persons WHERE birth_year > 1820 AND birth_year < 1880
), exploded AS (
  SELECT unnest(list_distinct(
           [first_name || ' ' || last_name,
            last_name,
            title || ' ' || last_name,
            title || '. ' || last_name,
            title || ' ' || first_name || ' ' || last_name,
            title || '. ' || first_name || ' ' || last_name,
            'J ' || last_name,
            'J. ' || last_name] ||
           CASE WHEN rejected_form IS NOT NULL THEN [rejected_form] ELSE [] END
         )) AS alias,
         last_name || ', ' || first_name || ' (' || birth_date || '-' || death_date || ')' AS name,
         lower(substring(last_name, 1, 1)) AS letter,
         uri || CASE WHEN ref IS NOT NULL THEN ' ' || ref ELSE '' END AS uris_joined
  FROM filtered
)
SELECT alias, lower(regexp_replace(alias, '[\\s\\x0b\\xa0 ]|''|-', '', 'g')) AS alias_norm, name, letter, uris_joined
FROM exploded WHERE alias != ''
"""


def q_dico_build_bne(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BNE-source builder over a synthetic author dump derived from supplier:
    two SPARQL-style result rows per author (different rejected form / ref),
    a has-work gate via n_works, hyphenated accepted forms (display-name
    normalization), a digit-initial subset (the 'other' letter bucket) and a
    '(seudonimo)' suffix exercising the truncate-at-'(' path."""
    from .plans.dico_build import build_bne_dico

    s = _read(spark, sf_dir, "supplier")
    k = F.col("s_suppkey")
    ks = k.cast("string")
    base = s.select(
        F.concat(F.lit("http://kb.test/bne/author/"), ks).alias("uri"),
        F.concat(
            F.when(k % 10 == 0, F.lit("3")).otherwise(F.lit("")),
            F.lit("Garcia-Marquez"),
            ks,
        ).alias("accepted_form"),
        (k % 5).alias("n_works"),
        k.alias("k"),
    )
    kk = F.col("k")
    kks = kk.cast("string")
    row1 = base.select(
        "uri",
        "accepted_form",
        "n_works",
        F.when(kk % 3 == 0, F.concat(F.lit("Gabo"), kks, F.lit(" (seudonimo)")))
        .when(kk % 3 == 1, F.concat(F.lit("G. Marquez "), kks))
        .alias("rejected_form"),
        F.when(kk % 2 == 0, F.concat(F.lit("http://ext.kb/bne/"), kks)).alias("ref"),
    )
    row2 = base.select(
        "uri",
        "accepted_form",
        "n_works",
        F.when(kk % 4 == 0, F.concat(F.lit("El Maestro "), kks)).alias("rejected_form"),
        F.when(kk % 3 == 0, F.concat(F.lit("http://other.kb/bne/"), kks)).alias("ref"),
    )
    d = build_bne_dico(row1.unionByName(row2))
    return d.select("alias", "alias_norm", "name", "letter", F.concat_ws(" ", "uris").alias("uris_joined"))


O_DICO_BUILD_BNE = """
WITH base AS (
  SELECT 'http://kb.test/bne/author/' || CAST(s_suppkey AS VARCHAR) AS uri,
         CASE WHEN s_suppkey % 10 = 0 THEN '3' ELSE '' END
           || 'Garcia-Marquez' || CAST(s_suppkey AS VARCHAR) AS accepted_form,
         s_suppkey % 5 AS n_works,
         s_suppkey AS k
  FROM supplier
), rows_ AS (
  SELECT uri, accepted_form, n_works,
         CASE WHEN k % 3 = 0 THEN 'Gabo' || CAST(k AS VARCHAR) || ' (seudonimo)'
              WHEN k % 3 = 1 THEN 'G. Marquez ' || CAST(k AS VARCHAR) END AS rejected_form,
         CASE WHEN k % 2 = 0 THEN 'http://ext.kb/bne/' || CAST(k AS VARCHAR) END AS ref
  FROM base
  UNION ALL
  SELECT uri, accepted_form, n_works,
         CASE WHEN k % 4 = 0 THEN 'El Maestro ' || CAST(k AS VARCHAR) END,
         CASE WHEN k % 3 = 0 THEN 'http://other.kb/bne/' || CAST(k AS VARCHAR) END
  FROM base
), sharded AS (
  SELECT *, CASE WHEN lower(substring(accepted_form, 1, 1)) BETWEEN 'a' AND 'z'
                 THEN lower(substring(accepted_form, 1, 1)) ELSE 'other' END AS letter
  FROM rows_ WHERE n_works > 0
), merged AS (
  SELECT uri, any_value(accepted_form) AS accepted_form, any_value(letter) AS letter,
         list_sort(list_distinct(list(trim(split_part(rejected_form, '(', 1))))) AS rejected_forms,
         list_sort(list_distinct(list(ref))) AS refs
  FROM sharded GROUP BY uri
)
SELECT alias,
       lower(regexp_replace(alias, '[\\s\\x0b\\xa0 ]|''|-', '', 'g')) AS alias_norm,
       regexp_replace(regexp_replace(trim(replace(accepted_form, '-', ' ')),
                                     '''', ''' ', 'g'), '  ', ' ', 'g') AS name,
       letter,
       array_to_string([uri] || refs, ' ') AS uris_joined
FROM merged, unnest(rejected_forms) AS t(alias)
WHERE alias != ''
"""


def q_dico_build_dbpediafr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBpedia-fr person builder over a synthetic dump derived from orders
    (keys cut to ~1/3 by modulo): FR/EN primary-label mix (lang filter),
    parenthesised primary labels kept VERBATIM while redirects truncate at
    '(', dbpedia.org vs wikidata sameAs targets (prefix inclusion), and a
    digit-initial subset for the 'other' letter bucket."""
    from .plans.dico_build import build_dbpediafr_person_dico

    o = _read(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 < 3)
    k = F.col("o_orderkey")
    ks = k.cast("string")
    base = o.select(
        F.concat(F.lit("http://fr.dbpedia.org/resource/p"), ks).alias("uri"),
        F.when(k % 9 == 0, F.concat(F.lit("9Moliere"), ks))
        .when(k % 4 == 0, F.concat(F.lit("Jean-Racine"), ks, F.lit(" (dramaturge)")))
        .otherwise(F.concat(F.lit("Corneille"), ks))
        .alias("label"),
        F.when(k % 7 == 0, F.lit("en")).otherwise(F.lit("fr")).alias("label_lang"),
        k.alias("k"),
    )
    kk = F.col("k")
    kks = kk.cast("string")
    row1 = base.select(
        "uri",
        "label",
        "label_lang",
        F.when(kk % 2 == 0, F.concat(F.lit("Le Grand "), kks, F.lit(" (homonymie)"))).alias(
            "redirect_label"
        ),
        F.when(kk % 6 == 0, F.lit("en")).otherwise(F.lit("fr")).alias("redirect_lang"),
        F.when(kk % 3 == 0, F.concat(F.lit("http://dbpedia.org/resource/P"), kks)).alias("sameas"),
    )
    row2 = base.select(
        "uri",
        "label",
        "label_lang",
        F.when(kk % 5 == 0, F.concat(F.lit("L'Auteur "), kks)).alias("redirect_label"),
        F.lit("fr").alias("redirect_lang"),
        F.when(kk % 4 == 0, F.concat(F.lit("http://www.wikidata.org/entity/Q"), kks)).alias(
            "sameas"
        ),
    )
    d = build_dbpediafr_person_dico(row1.unionByName(row2))
    return d.select("alias", "alias_norm", "name", "letter", F.concat_ws(" ", "uris").alias("uris_joined"))


O_DICO_BUILD_DBPEDIAFR = """
WITH base AS (
  SELECT 'http://fr.dbpedia.org/resource/p' || CAST(o_orderkey AS VARCHAR) AS uri,
         CASE WHEN o_orderkey % 9 = 0 THEN '9Moliere' || CAST(o_orderkey AS VARCHAR)
              WHEN o_orderkey % 4 = 0 THEN 'Jean-Racine' || CAST(o_orderkey AS VARCHAR) || ' (dramaturge)'
              ELSE 'Corneille' || CAST(o_orderkey AS VARCHAR) END AS label,
         CASE WHEN o_orderkey % 7 = 0 THEN 'en' ELSE 'fr' END AS label_lang,
         o_orderkey AS k
  FROM orders WHERE o_orderkey % 10 < 3
), rows_ AS (
  SELECT uri, label, label_lang,
         CASE WHEN k % 2 = 0 THEN 'Le Grand ' || CAST(k AS VARCHAR) || ' (homonymie)' END AS redirect_label,
         CASE WHEN k % 6 = 0 THEN 'en' ELSE 'fr' END AS redirect_lang,
         CASE WHEN k % 3 = 0 THEN 'http://dbpedia.org/resource/P' || CAST(k AS VARCHAR) END AS sameas
  FROM base
  UNION ALL
  SELECT uri, label, label_lang,
         CASE WHEN k % 5 = 0 THEN 'L''Auteur ' || CAST(k AS VARCHAR) END,
         'fr',
         CASE WHEN k % 4 = 0 THEN 'http://www.wikidata.org/entity/Q' || CAST(k AS VARCHAR) END
  FROM base
), filtered AS (
  SELECT *, CASE WHEN lower(substring(label, 1, 1)) BETWEEN 'a' AND 'z'
                 THEN lower(substring(label, 1, 1)) ELSE 'other' END AS letter
  FROM rows_ WHERE lower(label_lang) = 'fr'
), merged AS (
  SELECT uri, any_value(label) AS label, any_value(letter) AS letter,
         list_sort(list_distinct(list(CASE WHEN sameas LIKE 'http://dbpedia.org/%' THEN sameas END))) AS refs,
         list_sort(list_distinct(list(CASE WHEN lower(redirect_lang) = 'fr'
                                           THEN trim(split_part(redirect_label, '(', 1)) END))) AS redirects
  FROM filtered GROUP BY uri
)
SELECT alias,
       lower(regexp_replace(alias, '[\\s\\x0b\\xa0 ]|''|-', '', 'g')) AS alias_norm,
       regexp_replace(regexp_replace(trim(replace(label, '-', ' ')),
                                     '''', ''' ', 'g'), '  ', ' ', 'g') AS name,
       letter,
       array_to_string([uri] || refs, ' ') AS uris_joined
FROM merged, unnest(list_distinct([label] || redirects)) AS t(alias)
WHERE alias != ''
"""


def q_dico_build_getty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Getty ULAN builder over a synthetic concept dump derived from part:
    comma-split prefLabels (incl. no-comma and hyphenated variants), an
    'other'-bucket digit-initial subset, AAT gender codes (incl. missing),
    own-vocab exactMatch refs (excluded) vs external refs (kept), and a
    '(pittore)' alt label kept VERBATIM — the no-truncation semantics that
    distinguish Getty from BNF/BNE."""
    from .plans.dico_build import GETTY_FEMALE_CODE, build_getty_dico

    male = "http://vocab.getty.edu/aat/300189559"
    p = _read(spark, sf_dir, "part")
    k = F.col("p_partkey")
    ks = k.cast("string")
    base = p.select(
        F.concat(F.lit("http://vocab.getty.edu/ulan/"), ks).alias("uri"),
        F.when(k % 10 == 0, F.concat(F.lit("3Vinci"), ks))
        .when(k % 5 == 0, F.concat(F.lit("Rembrandt"), ks))
        .when(k % 7 == 0, F.concat(F.lit("Van-Dyck"), ks, F.lit(", Antoon"), ks))
        .otherwise(F.concat(F.lit("Vermeer"), ks, F.lit(", Johannes"), ks))
        .alias("pref_label"),
        F.when(k % 3 == 0, F.lit(GETTY_FEMALE_CODE))
        .when(k % 11 == 0, F.lit(None).cast("string"))
        .otherwise(F.lit(male))
        .alias("gender"),
        k.alias("k"),
    )
    kk = F.col("k")
    kks = kk.cast("string")
    row1 = base.select(
        "uri",
        "pref_label",
        F.when(kk % 4 == 0, F.concat(F.lit("Il Maestro (pittore) "), kks)).alias("alt_label"),
        F.when(kk % 2 == 0, F.concat(F.lit("http://vocab.getty.edu/aat/3001"), kks)).alias("ref"),
        "gender",
    )
    row2 = base.select(
        "uri",
        "pref_label",
        F.when(kk % 6 == 0, F.concat(F.lit("Le Peintre "), kks)).alias("alt_label"),
        F.when(kk % 3 == 0, F.concat(F.lit("http://ext.kb/ulan/"), kks)).alias("ref"),
        "gender",
    )
    d = build_getty_dico(row1.unionByName(row2))
    return d.select("alias", "alias_norm", "name", "letter", F.concat_ws(" ", "uris").alias("uris_joined"))


O_DICO_BUILD_GETTY = """
WITH base AS (
  SELECT 'http://vocab.getty.edu/ulan/' || CAST(p_partkey AS VARCHAR) AS uri,
         CASE WHEN p_partkey % 10 = 0 THEN '3Vinci' || CAST(p_partkey AS VARCHAR)
              WHEN p_partkey % 5 = 0 THEN 'Rembrandt' || CAST(p_partkey AS VARCHAR)
              WHEN p_partkey % 7 = 0 THEN 'Van-Dyck' || CAST(p_partkey AS VARCHAR)
                                          || ', Antoon' || CAST(p_partkey AS VARCHAR)
              ELSE 'Vermeer' || CAST(p_partkey AS VARCHAR)
                   || ', Johannes' || CAST(p_partkey AS VARCHAR) END AS nom,
         CASE WHEN p_partkey % 3 = 0 THEN 'http://vocab.getty.edu/aat/300189557'
              WHEN p_partkey % 11 = 0 THEN NULL
              ELSE 'http://vocab.getty.edu/aat/300189559' END AS gender,
         p_partkey AS k
  FROM part
), rows_ AS (
  SELECT uri, nom, gender,
         CASE WHEN k % 4 = 0 THEN 'Il Maestro (pittore) ' || CAST(k AS VARCHAR) END AS alt,
         CASE WHEN k % 2 = 0 THEN 'http://vocab.getty.edu/aat/3001' || CAST(k AS VARCHAR) END AS ref
  FROM base
  UNION ALL
  SELECT uri, nom, gender,
         CASE WHEN k % 6 = 0 THEN 'Le Peintre ' || CAST(k AS VARCHAR) END,
         CASE WHEN k % 3 = 0 THEN 'http://ext.kb/ulan/' || CAST(k AS VARCHAR) END
  FROM base
), named AS (
  SELECT uri, alt, ref,
         trim(replace(split_part(nom, ',', 1), '-', ' ')) AS last,
         trim(replace(CASE WHEN instr(nom, ',') > 0
                           THEN split_part(nom, ',', 2) ELSE '' END, '-', ' ')) AS first,
         CASE WHEN gender = 'http://vocab.getty.edu/aat/300189557' THEN 'Mme' ELSE 'M' END AS title,
         CASE WHEN lower(substring(nom, 1, 1)) BETWEEN 'a' AND 'z'
              THEN lower(substring(nom, 1, 1)) ELSE 'other' END AS letter
  FROM rows_
), merged AS (
  SELECT uri, any_value(last) AS last, any_value(first) AS first,
         any_value(title) AS title, any_value(letter) AS letter,
         list_sort(list_distinct(list(CASE WHEN ref NOT LIKE 'http://vocab.getty.edu%' THEN ref END))) AS refs,
         list_sort(list_distinct(list(alt))) AS alts
  FROM named GROUP BY uri
), aliased AS (
  SELECT *,
         CASE WHEN first != '' THEN
           list_value(first || ' ' || last, last,
                      title || ' ' || last, title || '. ' || last,
                      title || ' ' || first || ' ' || last,
                      title || '. ' || first || ' ' || last,
                      substring(first, 1, 1) || ' ' || last,
                      substring(first, 1, 1) || '. ' || last)
         ELSE list_value(last, title || ' ' || last, title || '. ' || last) END AS gen
  FROM merged
)
SELECT alias,
       lower(regexp_replace(alias, '[\\s\\x0b\\xa0 ]|''|-', '', 'g')) AS alias_norm,
       CASE WHEN first = '' THEN last ELSE last || ', ' || first END AS name,
       letter,
       array_to_string([uri] || refs, ' ') AS uris_joined
FROM aliased, unnest(list_distinct(gen || alts)) AS t(alias)
WHERE alias != ''
"""


# Driver-facing contract: EXACTLY 50 rows — the driver oracles at most 50
# queries per round (round 3 ran a 56-row contract and the 6 dict-tail rows
# went unevidenced), so the contract is kept at the check budget and rows
# ROTATE between the driver window and the pytest window so every query
# earns a driver CORRECTNESS artifact at least once (round-5 rotation,
# VERDICT r4 task #1):
#   round 5 IN  — the 14 rows that had only pytest evidence through r4
#     (7 retired twins + the 7 round-4 operators);
#   round 5 OUT — 14 stable rows green in BOTH r3 and r4 driver artifacts
#     (kg_preannotate, kg_annotated_refs, kg_relation_frequency,
#     kg_geo_enrich, kg_population_completeness, kg_eval_verdicts,
#     dico_build_{places,bne,getty,dbpediafr}, dico_regex_lookup,
#     dico_geonames, rel_lifespan, media_image_stats) — now pytest-pinned in
#     PYTEST_QUERIES below against their unchanged oracles.
# Ordered defensively: never-driver-evidenced rows first.
QUERIES = {
    # --- rotated IN this round: first-ever driver evidence for these 14
    # round-4 rows and (second swap, same round) the 9 round-5 operators;
    # with this swap every one of the 73 contract rows has appeared in a
    # driver CORRECTNESS window at least once across rounds 1-5 ---
    "text_url_extract": q_text_url_extract,
    "doc_domain_filter": q_doc_domain_filter,
    "doc_shuffle_deterministic": q_doc_shuffle_deterministic,
    "doc_chunk_windows": q_doc_chunk_windows,
    "text_ngram_topk": q_text_ngram_topk,
    "text_perplexity": q_text_perplexity,
    "dedup_spans": q_dedup_spans,
    "doc_domain_cap": q_doc_domain_cap,
    "kg_entity_pmi": q_kg_entity_pmi,
    "text_redact_pii": q_text_redact_pii,
    "text_quality_filter": q_text_quality_filter,
    "text_pretoken_count": q_text_pretoken_count,
    "text_repetition": q_text_repetition,
    "doc_pack_greedy": q_doc_pack_greedy,
    "dedup_semantic_clusters": q_dedup_semantic_clusters,
    "ann_ivf_pq": q_ann_ivf_pq,
    "kg_links_grouped": q_kg_links_grouped,
    "kg_mentions_relational": q_kg_mentions_relational,
    "kg_annotated_turns": q_kg_annotated_turns,
    "kg_correct_mentions": q_kg_correct_mentions,
    "kg_score_extract": q_kg_score_extract,
    "kg_occurrences": q_kg_occurrences,
    "kg_author_enrich": q_kg_author_enrich,
    # --- stable body (driver-green r3+r4) ---
    "rel_pushdown_agg": q_rel_pushdown_agg,
    "rel_join_topk": q_rel_join_topk,
    "rel_sessionize": q_rel_sessionize,
    "rel_significance": q_rel_significance,
    "curation_pipeline": q_curation_pipeline,
    "doc_pack_sequences": q_doc_pack_sequences,
    "dedup_clusters": q_dedup_clusters,
    "dedup_minhash_lsh": q_dedup_minhash,
    "kg_mentions": q_kg_mentions,
    "kg_candidates": q_kg_candidates,
    "kg_conversation_cases": q_kg_cases,
    "kg_fused_edges": q_kg_fused_edges,
    "kg_pruned_degrees": q_kg_degrees,
    "kg_links": q_kg_links,
    "kg_canonical_components": q_kg_canonical,
    "kg_triples": q_kg_triples,
    "kg_eval_metrics": q_kg_eval_metrics,
    "dico_build": q_dico_build,
    "dedup_exact": q_dedup_exact,
    "dedup_ngram_jaccard": q_dedup_ngram,
    "dedup_simhash": q_dedup_simhash,
    "dedup_embedding": q_dedup_embedding,
    "text_tfidf_topk": q_text_tfidf_topk,
    "doc_sample_stratified": q_doc_sample_stratified,
    "text_decontaminate": q_text_decontaminate,
    "ann_cosine_topk": q_ann_cosine_topk,
    "text_quality": q_text_quality,
}

ORACLES = {
    "text_url_extract": _o_text_url_extract(),
    "doc_domain_filter": _o_doc_domain_filter(),
    "doc_shuffle_deterministic": O_DOC_SHUFFLE,
    "doc_chunk_windows": O_DOC_CHUNK_WINDOWS,
    "text_ngram_topk": O_TEXT_NGRAM_TOPK,
    "text_perplexity": O_TEXT_PERPLEXITY,
    "dedup_spans": O_DEDUP_SPANS,
    "doc_domain_cap": _o_doc_domain_cap(),
    "kg_entity_pmi": O_KG_ENTITY_PMI,
    "text_redact_pii": _o_text_redact_pii(),
    "text_quality_filter": _o_text_quality_filter(),
    "text_pretoken_count": _o_text_pretoken_count(),
    "text_repetition": O_TEXT_REPETITION,
    "doc_pack_greedy": O_DOC_PACK_GREEDY,
    "dedup_semantic_clusters": _o_dedup_semantic_clusters(),
    "ann_ivf_pq": _o_ann_ivf_pq(),
    "kg_links_grouped": O_KG_LINKS,  # the grouped variant must match the same oracle
    "kg_mentions_relational": O_KG_MENTIONS,  # both detectors must match the same oracle
    "kg_annotated_turns": O_KG_ANNOTATED_TURNS,
    "kg_correct_mentions": O_KG_CORRECT_MENTIONS,
    "kg_score_extract": O_KG_SCORE_EXTRACT,
    "kg_occurrences": O_KG_OCCURRENCES,
    "kg_author_enrich": O_KG_AUTHOR_ENRICH,
    "rel_pushdown_agg": O_REL_PUSHDOWN_AGG,
    "rel_join_topk": O_REL_JOIN_TOPK,
    "rel_sessionize": O_REL_SESSIONIZE,
    "rel_significance": O_REL_SIGNIFICANCE,
    "curation_pipeline": O_CURATION_PIPELINE,
    "doc_pack_sequences": O_DOC_PACK_SEQUENCES,
    "dedup_clusters": O_DEDUP_CLUSTERS,
    "dedup_minhash_lsh": O_DEDUP_MINHASH,
    "kg_mentions": O_KG_MENTIONS,
    "kg_candidates": O_KG_CANDIDATES,
    "kg_conversation_cases": O_KG_CASES,
    "kg_fused_edges": O_KG_FUSED_EDGES,
    "kg_pruned_degrees": O_KG_DEGREES,
    "kg_links": O_KG_LINKS,
    "kg_canonical_components": O_KG_CANONICAL,
    "kg_triples": O_KG_TRIPLES,
    "kg_eval_metrics": O_KG_EVAL_METRICS,
    "dico_build": O_DICO_BUILD,
    "dedup_exact": O_DEDUP_EXACT,
    "dedup_ngram_jaccard": O_DEDUP_NGRAM,
    "dedup_simhash": O_DEDUP_SIMHASH,
    "dedup_embedding": _o_dedup_embedding(),
    "text_tfidf_topk": O_TEXT_TFIDF_TOPK,
    "doc_sample_stratified": O_DOC_SAMPLE_STRATIFIED,
    "text_decontaminate": O_TEXT_DECONTAMINATE,
    "ann_cosine_topk": O_ANN_COSINE,
    "text_quality": O_TEXT_QUALITY,
}

assert len(QUERIES) == 50 and set(QUERIES) == set(ORACLES), (
    len(QUERIES),
    set(QUERIES) ^ set(ORACLES),
)

# Oracle-checked by PYTEST this round (tests/test_driver_contract.py runs the
# union of both registries through the identical comparison): 23 rows that
# are all driver-green in at least one prior CORRECTNESS artifact (the 14
# rotated out at round-5 start, plus 9 stable r3+r4-green rows demoted when
# the round-5 operators were promoted into the driver window above).
PYTEST_QUERIES = {
    "kg_eval_verdicts": q_kg_eval_verdicts,
    "kg_preannotate": q_kg_preannotate,
    "kg_annotated_refs": q_kg_annotated_refs,
    "kg_relation_frequency": q_kg_relation_frequency,
    "kg_geo_enrich": q_kg_geo_enrich,
    "kg_population_completeness": q_kg_population_completeness,
    "dico_build_places": q_dico_build_places,
    "dico_build_bne": q_dico_build_bne,
    "dico_build_getty": q_dico_build_getty,
    "dico_build_dbpediafr": q_dico_build_dbpediafr,
    "dico_regex_lookup": q_dico_regex_lookup,
    "dico_geonames": q_dico_geonames,
    "rel_lifespan": q_rel_lifespan,
    "media_image_stats": q_media_image_stats,
    # --- demoted when the 9 round-5 operators were promoted (driver-green
    # in both the r3 and r4 CORRECTNESS artifacts, oracles unchanged) ---
    "media_audio_stats": q_media_audio_stats,
    "media_frame_stats": q_media_frame_stats,
    "media_features": q_media_features,
    "ann_lsh_topk": q_ann_lsh_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "ann_ivf_trained": q_ann_ivf_trained,
    "text_token_count": q_text_token_count,
    "text_language_id": q_text_language_id,
    "text_fingerprint": q_text_fingerprint,
}

PYTEST_ORACLES = {
    "kg_eval_verdicts": O_KG_EVAL_VERDICTS,
    "kg_preannotate": O_KG_PREANNOTATE,
    "kg_annotated_refs": O_KG_ANNOTATED_REFS,
    "kg_relation_frequency": O_KG_RELATION_FREQUENCY,
    "kg_geo_enrich": O_KG_GEO_ENRICH,
    "kg_population_completeness": O_KG_POPULATION,
    "dico_build_places": O_DICO_BUILD_PLACES,
    "dico_build_bne": O_DICO_BUILD_BNE,
    "dico_build_getty": O_DICO_BUILD_GETTY,
    "dico_build_dbpediafr": O_DICO_BUILD_DBPEDIAFR,
    "dico_regex_lookup": O_DICO_REGEX_LOOKUP,
    "dico_geonames": O_DICO_GEONAMES,
    "rel_lifespan": O_REL_LIFESPAN,
    "media_image_stats": O_MEDIA_IMAGE_STATS,
    "media_audio_stats": O_MEDIA_AUDIO_STATS,
    "media_frame_stats": O_MEDIA_FRAME_STATS,
    "media_features": O_MEDIA_FEATURES,
    "ann_lsh_topk": _o_ann_lsh_topk(),
    "ann_ivf_topk": O_ANN_IVF,
    "ann_ivf_trained": _o_ann_ivf_trained(),
    "text_token_count": O_TEXT_TOKEN_COUNT,
    "text_language_id": O_TEXT_LANGUAGE_ID,
    "text_fingerprint": O_TEXT_FINGERPRINT,
}

# Union view for consumers that time/run queries regardless of which evidence
# window a row currently sits in (bench.py PER_QUERY survives rotations).
ALL_QUERIES = {**QUERIES, **PYTEST_QUERIES}
ALL_ORACLES = {**ORACLES, **PYTEST_ORACLES}

assert len(PYTEST_QUERIES) == 23 and set(PYTEST_QUERIES) == set(PYTEST_ORACLES)

# back-compat alias (round-4 docs referred to these as the retired rows)
RETIRED_QUERIES = PYTEST_QUERIES
RETIRED_ORACLES = PYTEST_ORACLES
