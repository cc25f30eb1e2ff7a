package graft

import scala.collection.immutable.ListMap

/** DuckDB-dialect oracle SQL for each [[SparkEntry.queries]] entry.
  *
  * Written to reproduce the Spark result bit-for-bit: identical column
  * names, identical ORDER BY, exact decimal accumulation for double sums,
  * regexp flags ('g') matching Spark's replace-all semantics, and epoch-ms
  * bigints instead of raw timestamps. Queries DuckDB cannot express
  * (SHA-1-based uuid5/timeuuid) are intentionally absent — the driver
  * records a rows-only check for those; their md5-based twin (q08) and
  * ScalaTest RFC vectors carry the correctness load.
  */
object OracleSql {

  /** The containment posting cap, derived from the SAME Dedup constants the
    * engine's default parameters use (ADVICE r10: a literal 409 here would
    * silently diverge if the Spark-side defaults moved). The SQL bodies
    * stay raw strings (they contain regex backslashes, so s-interpolation
    * is unsafe); [[capped]] substitutes the token.
    */
  private val PostCap: Int = graft.operators.Dedup.defaultPostCap

  private def capped(sql: String): String =
    sql.replace("__POSTCAP__", PostCap.toString)

  /** Shared cosine-similarity fragment over two list<float> columns. */
  private def cosSql(a: String, b: String): String =
    s"""(list_sum(list_transform(generate_series(1, len($a)), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))) /
       | (sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
       |  sqrt(list_sum(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))))""".stripMargin

  /** q49/q64 share this: the bloom-pruned path is exact, not a twin. */
  private val DecontaminateSql: String =
    """WITH w AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
      |g AS (
      |  SELECT doc_id,
      |    unnest(list_distinct(list_transform(
      |      generate_series(1, greatest(len(ws) - 3, 1)),
      |      i -> array_to_string(ws[i:i+3], ' ')))) AS gram
      |  FROM w),
      |b AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0)
      |SELECT DISTINCT doc_id FROM g
      |WHERE doc_id % 97 <> 0 AND gram IN (SELECT gram FROM b)
      |ORDER BY doc_id""".stripMargin

  /** Shared q33/q65 pipeline prefix (exact dedup -> gates -> shingles ->
    * md5 minhash -> LSH band candidates -> Jaccard-confirmed PAIRS). The
    * two queries differ only in the survivor rule applied to `cpairs`.
    */
  private val CurationPrefixSql: String =
    """fp AS (SELECT doc_id, text, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS f FROM documents),
      |winners AS (SELECT f, min(doc_id) AS doc_id FROM fp GROUP BY f),
      |exact_kept AS (SELECT fp.doc_id, fp.text FROM fp JOIN winners ON fp.f = winners.f AND fp.doc_id = winners.doc_id),
      |gated AS (
      |  SELECT doc_id, text FROM (
      |    SELECT doc_id, text,
      |      (CAST(len(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / CAST(greatest(len(text), 1) AS DOUBLE)) * 0.5
      |      + least((CAST(len(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE) /
      |          CAST(greatest(CASE WHEN text IS NULL OR trim(text) = '' THEN 0 ELSE len(regexp_split_to_array(trim(text), '\s+')) END, 1) AS DOUBLE)) / 8.0, 1.0) * 0.25
      |      + (1.0 - least((CAST(len(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) / CAST(greatest(len(text), 1) AS DOUBLE)) * 4.0, 1.0)) * 0.25 AS q,
      |      len(list_filter(lw, x -> x IN ('the','and','of','to','is','a'))) AS s_en,
      |      len(list_filter(lw, x -> x IN ('el','la','de','que','y','los'))) AS s_es,
      |      len(list_filter(lw, x -> x IN ('le','la','les','des','est','et'))) AS s_fr,
      |      len(list_filter(lw, x -> x IN ('der','die','das','und','ist','nicht'))) AS s_de,
      |      len(list_filter(lw, x -> x IN ('的','是','了','在','我','不'))) AS s_zh
      |    FROM (SELECT doc_id, text, regexp_split_to_array(lower(trim(text)), '\s+') AS lw FROM exact_kept))
      |  WHERE q >= 0.3 AND greatest(s_en, s_es, s_fr, s_de, s_zh) > 0),
      |w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM gated),
      |sh AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, greatest(len(ws)-1, 1)),
      |  i -> array_to_string(ws[i:i+1], ' '))) AS s FROM w),
      |sig AS (SELECT doc_id, list_transform(generate_series(0, 15),
      |  k -> list_aggregate(list_transform(s, x -> md5(concat(k, ':', x))), 'min')) AS g FROM sh),
      |bandsq AS (SELECT doc_id, list_transform(generate_series(0, 3),
      |  b -> md5(array_to_string(g[b*4+1:b*4+4], '|'))) AS bl FROM sig),
      |bexp AS (SELECT doc_id, t.b AS band, bl[t.b] AS bucket
      |  FROM bandsq, generate_series(1, 4) t(b)),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2 FROM bexp a JOIN bexp b
      |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
      |cpairs AS (
      |  SELECT c.id1, c.id2 FROM cand c
      |  JOIN sh s1 ON s1.doc_id = c.id1 JOIN sh s2 ON s2.doc_id = c.id2
      |  WHERE (CASE WHEN CAST(len(list_distinct(list_concat(s1.s, s2.s))) AS DOUBLE) = 0.0 THEN 0.0
      |         ELSE CAST(len(list_intersect(s1.s, s2.s)) AS DOUBLE) / CAST(len(list_distinct(list_concat(s1.s, s2.s))) AS DOUBLE) END) >= 0.6)""".stripMargin

  /** Shared q73/q75 pipeline CTEs (appended after `CurationPrefixSql`):
    * the recursive curation closure, q69's c-prefixed containment stages,
    * the one-shot containment drop rule (drop the contained id1; symmetric
    * pairs keep min id), then q71's s-prefixed substring-clean CTEs over
    * the REMAINING corpus — ending in `clean(doc_id, clean_text)`.
    * Mirrors SparkEntry.trainPrep stage-for-stage; q75 packs `clean`.
    */
  private val CurationClosureSql: String =
    """edges AS (SELECT id1 AS a, id2 AS b FROM cpairs UNION SELECT id2, id1 FROM cpairs),
      |reach AS (
      |  SELECT a AS id, b AS r FROM edges
      |  UNION
      |  SELECT reach.id, e.b FROM reach JOIN edges e ON reach.r = e.a),
      |comp AS (SELECT id, least(id, min(r)) AS comp FROM reach GROUP BY id),
      |dropped AS (SELECT id AS doc_id FROM comp WHERE comp <> id)""".stripMargin

  /** Containment + substring tail of the prep mirror; `excl` names the CTE
    * holding every doc id dropped BEFORE containment (curation closure
    * alone for q73/q75; closure ∪ LM-gate drops for q94).
    */
  private def prepTailSql(excl: String): String =
    """csh AS (SELECT s1.doc_id, s1.s FROM sh s1
      |  WHERE NOT EXISTS (SELECT 1 FROM __EXCL__ c WHERE c.doc_id = s1.doc_id)),
      |ccap AS (SELECT greatest(CAST(ceil(0.2 * count(*)) AS BIGINT), 16) AS v FROM csh),
      |cex AS (SELECT doc_id, unnest(s) AS g FROM csh),
      |cdfreq AS (SELECT g, count(*) AS df FROM cex GROUP BY g),
      |cranked AS (SELECT e.doc_id, e.g, d.df,
      |    row_number() OVER (PARTITION BY e.doc_id ORDER BY d.df, e.g) AS rn
      |  FROM cex e JOIN cdfreq d ON e.g = d.g WHERE d.df <= (SELECT v FROM ccap)),
      |canchors AS (SELECT doc_id, g FROM cranked WHERE rn <= 10),
      |cpostings AS (SELECT e.g, e.doc_id,
      |    row_number() OVER (PARTITION BY e.g ORDER BY e.doc_id) AS prn
      |  FROM cex e WHERE e.g IN (SELECT g FROM canchors)),
      |ckept AS (SELECT g, doc_id FROM cpostings WHERE prn <= __POSTCAP__),
      |ccand AS (SELECT a.doc_id AS ida, k.doc_id AS idb
      |  FROM canchors a JOIN ckept k ON a.g = k.g WHERE a.doc_id <> k.doc_id
      |  GROUP BY a.doc_id, k.doc_id HAVING count(*) >= 4),
      |cver AS (SELECT c.ida, c.idb,
      |    round(CAST(len(list_intersect(s1.s, s2.s)) AS DOUBLE) / CAST(greatest(len(s1.s), 1) AS DOUBLE), 6) AS containment
      |  FROM ccand c JOIN csh s1 ON s1.doc_id = c.ida JOIN csh s2 ON s2.doc_id = c.idb),
      |cpok AS (SELECT ida, idb FROM cver WHERE containment >= 0.8),
      |cdropped AS (SELECT DISTINCT p.ida AS doc_id FROM cpok p
      |  WHERE NOT EXISTS (SELECT 1 FROM cpok q WHERE q.ida = p.idb AND q.idb = p.ida)
      |    OR p.ida > p.idb),
      |rdocs AS (SELECT d.doc_id, d.text FROM documents d
      |  JOIN csh r ON d.doc_id = r.doc_id
      |  WHERE NOT EXISTS (SELECT 1 FROM cdropped cd WHERE cd.doc_id = d.doc_id)),
      |sw AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM rdocs),
      |swins AS (SELECT doc_id, u.pos AS pos, u.g AS g FROM (
      |  SELECT doc_id, unnest(list_transform(generate_series(0, len(ws) - 8),
      |      i -> struct_pack(pos := i, g := array_to_string(ws[i+1:i+8], ' ')))) AS u
      |  FROM sw WHERE len(ws) >= 8)),
      |sgrp AS (SELECT g, count(*) AS c,
      |    min(struct_pack(d := doc_id, p := pos)) AS first FROM swins GROUP BY g),
      |sdup AS (SELECT g, first FROM sgrp WHERE c > 1),
      |smarked AS (SELECT w3.doc_id, w3.pos FROM swins w3
      |  JOIN sdup ON w3.g = sdup.g
      |  WHERE NOT (w3.doc_id = sdup.first.d AND w3.pos = sdup.first.p)),
      |sflag AS (SELECT doc_id, pos,
      |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 8
      |         THEN 1 ELSE 0 END AS nw
      |  FROM smarked),
      |ssid AS (SELECT doc_id, pos,
      |    sum(nw) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM sflag),
      |sspans AS (SELECT doc_id, sid, min(pos) AS s, max(pos) + 8 AS e
      |  FROM ssid GROUP BY doc_id, sid),
      |sspanlist AS (SELECT doc_id AS sdoc, list(struct_pack(s := s, e := e)) AS sp
      |  FROM sspans GROUP BY doc_id),
      |clean AS (SELECT sw.doc_id, coalesce(array_to_string(
      |  list_transform(
      |    list_filter(
      |      list_transform(generate_series(1, len(sw.ws)), i -> struct_pack(w := sw.ws[i], i := i - 1)),
      |      x -> coalesce(len(list_filter(sl.sp, spn -> x.i >= spn.s AND x.i < spn.e)), 0) = 0),
      |    x -> x.w), ' '), '') AS clean_text
      |FROM sw LEFT JOIN sspanlist sl ON sw.doc_id = sl.sdoc)""".stripMargin
      .replace("__EXCL__", excl)

  private val TrainPrepCtesSql: String =
    CurationClosureSql + ",\n" + prepTailSql("dropped")

  /** q69/q102 shared tail (appended directly after [[CurationPrefixSql]]):
    * the recursive curation closure, then the c-prefixed containment
    * stages over the survivors, ending in the verified
    * (id1, id2, containment) pair set.
    */
  private val ContainCuratedTailSql: String = """,
    |edges AS (SELECT id1 AS a, id2 AS b FROM cpairs UNION SELECT id2, id1 FROM cpairs),
    |reach AS (
    |  SELECT a AS id, b AS r FROM edges
    |  UNION
    |  SELECT reach.id, e.b FROM reach JOIN edges e ON reach.r = e.a),
    |comp AS (SELECT id, least(id, min(r)) AS comp FROM reach GROUP BY id),
    |dropped AS (SELECT id AS doc_id FROM comp WHERE comp <> id),
    |csh AS (SELECT s1.doc_id, s1.s FROM sh s1
    |  WHERE NOT EXISTS (SELECT 1 FROM dropped c WHERE c.doc_id = s1.doc_id)),
    |ccap AS (SELECT greatest(CAST(ceil(0.2 * count(*)) AS BIGINT), 16) AS v FROM csh),
    |cex AS (SELECT doc_id, unnest(s) AS g FROM csh),
    |cdfreq AS (SELECT g, count(*) AS df FROM cex GROUP BY g),
    |cranked AS (SELECT e.doc_id, e.g, d.df,
    |    row_number() OVER (PARTITION BY e.doc_id ORDER BY d.df, e.g) AS rn
    |  FROM cex e JOIN cdfreq d ON e.g = d.g WHERE d.df <= (SELECT v FROM ccap)),
    |canchors AS (SELECT doc_id, g FROM cranked WHERE rn <= 10),
    |cpostings AS (SELECT e.g, e.doc_id,
    |    row_number() OVER (PARTITION BY e.g ORDER BY e.doc_id) AS prn
    |  FROM cex e WHERE e.g IN (SELECT g FROM canchors)),
    |ckept AS (SELECT g, doc_id FROM cpostings WHERE prn <= __POSTCAP__),
    |ccand AS (SELECT a.doc_id AS ida, k.doc_id AS idb
    |  FROM canchors a JOIN ckept k ON a.g = k.g WHERE a.doc_id <> k.doc_id
    |  GROUP BY a.doc_id, k.doc_id HAVING count(*) >= 4),
    |cver AS (SELECT c.ida, c.idb,
    |    round(CAST(len(list_intersect(s1.s, s2.s)) AS DOUBLE) / CAST(greatest(len(s1.s), 1) AS DOUBLE), 6) AS containment
    |  FROM ccand c JOIN csh s1 ON s1.doc_id = c.ida JOIN csh s2 ON s2.doc_id = c.idb)
    |SELECT ida AS id1, idb AS id2, containment FROM cver
    |WHERE containment >= 0.8 ORDER BY id1, id2""".stripMargin

  /** DuckDB `MATERIALIZED` hints on every stage CTE of the stitched prep
    * mirrors (q73/q75/q94). DuckDB re-inlines a CTE body once PER
    * REFERENCE, so in a monolith whose tail references `csh` ~8 times the
    * minhash prefix + recursive closure re-evaluate multiplicatively —
    * the r10 campaign had to declare the q73 monolith infeasible at 10×
    * and fall back to compositional validation. With every stage pinned
    * to one evaluation the same monolith runs at 10× in ~50 s and
    * row-matches the engine (round-13 measurement). Names are anchored on
    * the preceding newline so `sh` cannot rewrite `csh`; `fp` (the first
    * CTE) anchors on the WITH RECURSIVE header. Hint-only: zero semantics.
    */
  private def materializedPrep(sql: String): String = {
    val ctes = Seq("gated", "sh", "cpairs", "dropped", "csh", "cex",
      "cdfreq", "canchors", "ckept", "cver", "cpok", "cdropped", "rdocs",
      "sw", "swins", "smarked", "sspanlist")
    val anchored = ctes.foldLeft(sql)((s, c) =>
      s.replace("\n" + c + " AS (", "\n" + c + " AS MATERIALIZED ("))
    anchored.replace("WITH RECURSIVE fp AS (", "WITH RECURSIVE fp AS MATERIALIZED (")
  }

  /** q94's LM-gate CTE block (between the curation closure and the
    * containment tail): the q92 bigram-LM mirror retrained on the CURATED
    * corpus (gated minus closure drops), ending in `lmexcl` = closure
    * drops ∪ perplexity drops. Docs with no bigrams never enter `lmsc`,
    * so they are kept — the engine's null-ppl rule. The threshold
    * compares the ROUNDED perplexity in both engines. Multi-reference
    * CTEs are MATERIALIZED inline (ADVICE r13: `lmbase` feeds lmtok AND
    * lmpos, `lmbi`/`lmbc` each feed two consumers — DuckDB re-inlines a
    * plain CTE per reference, so the corpus-scale tokenize would run
    * twice; the same hazard materializedPrep pins for the stage CTEs).
    */
  private def lmGateSql(maxPpl: String): String =
    """lmdocs AS (SELECT g.doc_id, g.text FROM gated g
      |  WHERE NOT EXISTS (SELECT 1 FROM dropped d WHERE d.doc_id = g.doc_id)),
      |lmbase AS MATERIALIZED (SELECT doc_id,
      |    string_split_regex(lower(trim(coalesce(text, ''))), '\s+') AS l
      |  FROM lmdocs),
      |lmtok AS (SELECT unnest(l) AS w FROM lmbase),
      |lmv AS (SELECT count(DISTINCT w) AS v FROM lmtok WHERE w <> ''),
      |lmpos AS (SELECT doc_id, l, unnest(range(1, len(l))) AS i FROM lmbase),
      |lmbi AS MATERIALIZED (SELECT doc_id, l[i] AS p, l[i + 1] AS w, count(*) AS cnt
      |  FROM lmpos WHERE l[i] <> '' AND l[i + 1] <> '' GROUP BY 1, 2, 3),
      |lmbc AS MATERIALIZED (SELECT p, w, sum(cnt) AS c FROM lmbi GROUP BY 1, 2),
      |lmcx AS (SELECT p, sum(c) AS cc FROM lmbc GROUP BY 1),
      |lmsc AS (SELECT lmbi.doc_id, sum(lmbi.cnt) AS nb,
      |    sum(lmbi.cnt * CAST(round(ln((lmbc.c + 1.0) / (lmcx.cc + 1.0 * lmv.v)), 6)
      |      AS DECIMAL(18,6))) AS slp
      |  FROM lmbi, lmbc, lmcx, lmv
      |  WHERE lmbi.p = lmbc.p AND lmbi.w = lmbc.w AND lmbc.p = lmcx.p
      |  GROUP BY 1),
      |lmdrop AS (SELECT doc_id FROM lmsc
      |  WHERE round(exp(-CAST(slp AS DOUBLE) / nb), 6) > __LMMAXPPL__),
      |lmexcl AS MATERIALIZED (
      |  SELECT doc_id FROM dropped UNION SELECT doc_id FROM lmdrop)"""
      .stripMargin.replace("__LMMAXPPL__", maxPpl)

  /** q105's SemDeDup-gate CTE block (between the curation closure and the
    * containment tail — the [[lmGateSql]] pattern for the embedding
    * modality): the q103 semantic-dedup mirror restricted to the CURATED
    * corpus's embeddings, ending in `semexcl` = closure drops ∪ semantic
    * drops. Docs with no embedding row never enter `semuni`, so they are
    * kept — the engine's no-evidence rule. Closure CTE names are
    * sem-prefixed (the WITH RECURSIVE list already holds the curation
    * closure's `reach`). Multi-reference CTEs are MATERIALIZED inline.
    */
  private def semGateSql(k: Int, threshold: String): String =
    s"""semuni AS MATERIALIZED (SELECT e.vec_id AS doc_id, e.embedding AS vec
      |  FROM embeddings e JOIN gated g ON g.doc_id = e.vec_id
      |  WHERE NOT EXISTS (SELECT 1 FROM dropped d WHERE d.doc_id = e.vec_id)),
      |semc AS MATERIALIZED (
      |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS centroid_id,
      |         embedding AS cvec
      |  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT $k)),
      |semscored AS (
      |  SELECT u.doc_id, u.vec, c.centroid_id,
      |         round(${cosSql("u.vec", "c.cvec")}, 6) AS cosc
      |  FROM semuni u CROSS JOIN semc c),
      |semasg AS MATERIALIZED (
      |  SELECT doc_id, vec, centroid_id, cosc FROM (
      |    SELECT *, row_number() OVER (PARTITION BY doc_id
      |      ORDER BY cosc DESC, centroid_id ASC) AS rn FROM semscored)
      |  WHERE rn = 1),
      |sempairs AS (
      |  SELECT a.doc_id AS id1, b.doc_id AS id2
      |  FROM semasg a JOIN semasg b
      |    ON a.centroid_id = b.centroid_id AND a.doc_id < b.doc_id
      |  WHERE ${cosSql("a.vec", "b.vec")} > $threshold),
      |semedges AS (SELECT id1 AS a, id2 AS e2 FROM sempairs
      |  UNION SELECT id2, id1 FROM sempairs),
      |semreach AS (
      |  SELECT a AS id, e2 AS r FROM semedges
      |  UNION
      |  SELECT semreach.id, e.e2 FROM semreach JOIN semedges e ON semreach.r = e.a),
      |semcomp AS (SELECT id, least(id, min(r)) AS comp FROM semreach GROUP BY id),
      |semlab AS (
      |  SELECT semasg.doc_id, semasg.cosc,
      |         coalesce(semcomp.comp, semasg.doc_id) AS comp
      |  FROM semasg LEFT JOIN semcomp ON semasg.doc_id = semcomp.id),
      |semkeep AS (SELECT doc_id FROM (
      |    SELECT doc_id, row_number() OVER (PARTITION BY comp
      |      ORDER BY cosc ASC, doc_id ASC) AS rn FROM semlab)
      |  WHERE rn = 1),
      |semdrop AS (SELECT u.doc_id FROM semuni u
      |  WHERE NOT EXISTS (SELECT 1 FROM semkeep s WHERE s.doc_id = u.doc_id)),
      |semexcl AS MATERIALIZED (
      |  SELECT doc_id FROM dropped UNION SELECT doc_id FROM semdrop)"""
      .stripMargin

  /** q95/q96 shared BPE mirror: word counts → char-symbol arrays → one
    * (pair-count, argmax, recursive greedy-merge) stage per iteration.
    * Every stage CTE that is read more than once is MATERIALIZED (the
    * per-reference re-inlining hazard); the per-word merge is a recursive
    * scan with position state — emit one symbol per step, or the merged
    * pair and skip two — whose terminal rows sit at i = len + 1.
    */
  private def bpeStageSql(i: Int): String =
    s"""pc$i AS MATERIALIZED (
      |  SELECT syms[j] AS a, syms[j + 1] AS b, sum(cnt) AS c
      |  FROM (SELECT cnt, syms, unnest(range(1, len(syms))) AS j FROM st$i)
      |  GROUP BY 1, 2),
      |top$i AS MATERIALIZED (
      |  SELECT a, b, c FROM pc$i ORDER BY c DESC, a, b LIMIT 1),
      |m$i AS (
      |  SELECT w, cnt, syms, 1 AS i, CAST([] AS VARCHAR[]) AS out FROM st$i
      |  UNION ALL
      |  SELECT w, cnt, syms,
      |    CASE WHEN i < len(syms) AND syms[i] = (SELECT a FROM top$i)
      |              AND syms[i + 1] = (SELECT b FROM top$i)
      |         THEN i + 2 ELSE i + 1 END,
      |    CASE WHEN i < len(syms) AND syms[i] = (SELECT a FROM top$i)
      |              AND syms[i + 1] = (SELECT b FROM top$i)
      |         THEN list_append(out, syms[i] || syms[i + 1])
      |         ELSE list_append(out, syms[i]) END
      |  FROM m$i WHERE i <= len(syms)),
      |st${i + 1} AS MATERIALIZED (
      |  SELECT w, cnt, out AS syms FROM m$i WHERE i = len(syms) + 1)""".stripMargin

  /** q98/q99 shared encode mirror (appended after [[bpeCtes]]): the q97
    * vocabulary rank over the final symbol state, each word's ordered
    * token-id array, the per-doc token positions, and the flattened
    * per-doc id sequences (`dids`). Multi-consumer CTEs MATERIALIZED (the
    * per-reference re-inlining hazard).
    */
  private val BpeEncodeCtesSql: String =
    """voc AS MATERIALIZED (SELECT subword,
      |    CAST(row_number() OVER (ORDER BY subword) AS BIGINT) AS token_id
      |  FROM (SELECT DISTINCT unnest(syms) AS subword FROM st5)),
      |wids AS MATERIALIZED (
      |  SELECT w, list(token_id ORDER BY j) AS ids FROM (
      |    SELECT u.w, u.j, v.token_id
      |    FROM (SELECT w, syms, unnest(range(1, len(syms) + 1)) AS j FROM st5) u
      |    JOIN voc v ON u.syms[u.j] = v.subword)
      |  GROUP BY w),
      |dbase AS (SELECT doc_id,
      |    string_split_regex(lower(trim(coalesce(text, ''))), '\s+') AS l
      |  FROM documents),
      |dtok AS (SELECT doc_id, j AS i, l[j] AS w
      |  FROM (SELECT doc_id, l, unnest(range(1, len(l) + 1)) AS j FROM dbase)
      |  WHERE l[j] <> ''),
      |dids AS MATERIALIZED (SELECT d.doc_id, flatten(list(w2.ids ORDER BY d.i)) AS ids
      |  FROM dtok d JOIN wids w2 ON d.w = w2.w GROUP BY d.doc_id)""".stripMargin

  private def bpeCtes(k: Int): String =
    """WITH RECURSIVE
      |wc AS (SELECT w, count(*) AS cnt FROM (
      |  SELECT unnest(string_split_regex(lower(trim(coalesce(text, ''))), '\s+')) AS w
      |  FROM documents) WHERE w <> '' GROUP BY 1),
      |st0 AS MATERIALIZED (SELECT w, cnt,
      |  list_transform(range(1, len(w) + 1), i -> substr(w, CAST(i AS INT), 1)) AS syms
      |  FROM wc),""".stripMargin + "\n" +
      (0 until k).map(bpeStageSql).mkString(",\n")

  val all: Map[String, String] = ListMap(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filtered_scan" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |WHERE event_type NOT IN ('error', 'signup') AND (value IS NULL OR value > 5.0)
        |ORDER BY event_id""".stripMargin,

    "q03_part_revenue" ->
      """SELECT p.p_brand AS brand,
        |  CAST(sum(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items,
        |  count(DISTINCT s.s_name) AS n_suppliers
        |FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
        |LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |GROUP BY p.p_brand ORDER BY brand""".stripMargin,

    "q04_geo_rollup" ->
      """SELECT r.r_name AS region_name, n.n_name AS nation_name,
        |  count(*) AS n_customers,
        |  CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS sum_acctbal
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY region_name, nation_name ORDER BY region_name, nation_name""".stripMargin,

    "q05_last_item_denorm" ->
      """WITH last AS (
        |  SELECT *, row_number() OVER (PARTITION BY l_orderkey ORDER BY l_shipdate DESC, l_linenumber DESC) AS rn
        |  FROM lineitem)
        |SELECT o.o_orderkey, l.l_linenumber AS last_linenumber, epoch_ms(l.l_shipdate) AS last_ship_ms,
        |  o.o_custkey, c.c_mktsegment
        |FROM last l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE l.rn = 1 ORDER BY o.o_orderkey""".stripMargin,

    "q06_sequential_ids" ->
      """SELECT n_nationkey, n_name, row_number() OVER (ORDER BY n_name) + 100 AS seq_id
        |FROM nation ORDER BY seq_id""".stripMargin,

    "q08_uuid3_ids" ->
      """SELECT o_orderkey,
        |  substr(d,1,8) || '-' || substr(d,9,4) || '-3' || substr(d,14,3) || '-' ||
        |  CASE WHEN substr(d,17,1) IN ('0','4','8','c') THEN '8'
        |       WHEN substr(d,17,1) IN ('1','5','9','d') THEN '9'
        |       WHEN substr(d,17,1) IN ('2','6','a','e') THEN 'a'
        |       ELSE 'b' END || substr(d,18,3) || '-' || substr(d,21,12) AS id_uuid
        |FROM (SELECT o_orderkey, md5(concat('graft3:namespace', CAST(o_orderkey AS VARCHAR))) AS d FROM orders)
        |ORDER BY o_orderkey""".stripMargin,

    "q10_anti_join_orphans" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,

    "q11_semi_join" ->
      """SELECT o_orderkey, o_orderstatus FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
        |ORDER BY o_orderkey""".stripMargin,

    "q12_explode_m2m" ->
      """SELECT p_partkey, word, p_partkey || '_' || word AS link_key
        |FROM (SELECT p_partkey, unnest(string_split(p_type, ' ')) AS word FROM part)
        |ORDER BY p_partkey, word""".stripMargin,

    "q13_group_pairs" ->
      """WITH two AS (
        |  SELECT l_orderkey, min(l_suppkey) AS m1, max(l_suppkey) AS m2
        |  FROM lineitem GROUP BY l_orderkey HAVING count(DISTINCT l_suppkey) = 2)
        |SELECT l_orderkey, m1 AS member_a, m2 AS member_b FROM two
        |UNION ALL SELECT l_orderkey, m2, m1 FROM two
        |ORDER BY l_orderkey, member_a""".stripMargin,

    "q14_union_distinct" ->
      """SELECT DISTINCT nationkey FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  UNION ALL SELECT s_nationkey FROM supplier)
        |ORDER BY nationkey""".stripMargin,

    "q15_except_diff" ->
      """SELECT n_nationkey AS nationkey FROM nation
        |EXCEPT SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal < 0
        |ORDER BY nationkey""".stripMargin,

    "q16_dedup_exact" ->
      """SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS dedup_key,
        |  min(doc_id) AS keep_id, count(*) AS n_dups
        |FROM documents GROUP BY dedup_key ORDER BY dedup_key""".stripMargin,

    "q17_minhash_lsh_pairs" ->
      """WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
        |sh AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, greatest(len(ws)-1, 1)),
        |  i -> array_to_string(ws[i:i+1], ' '))) AS s FROM w),
        |sig AS (SELECT doc_id, list_transform(generate_series(0, 15),
        |  k -> list_aggregate(list_transform(s, x -> md5(concat(k, ':', x))), 'min')) AS g FROM sh),
        |bands AS (SELECT doc_id, list_transform(generate_series(0, 3),
        |  b -> md5(array_to_string(g[b*4+1:b*4+4], '|'))) AS bl FROM sig),
        |bexp AS (SELECT doc_id, t.b AS band, bl[t.b] AS bucket
        |  FROM bands, generate_series(1, 4) t(b))
        |SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
        |FROM bexp a JOIN bexp b
        |  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
        |ORDER BY id1, id2""".stripMargin,

    "q18_ngram_jaccard" ->
      """WITH w AS (SELECT doc_id, list_distinct(regexp_split_to_array(trim(text), '\s+')) AS ws FROM documents)
        |SELECT a.doc_id AS id1, b.doc_id AS id2,
        |  CASE WHEN CAST(len(list_distinct(list_concat(a.ws, b.ws))) AS DOUBLE) = 0.0 THEN 0.0
        |       ELSE CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE) / CAST(len(list_distinct(list_concat(a.ws, b.ws))) AS DOUBLE)
        |  END AS jaccard
        |FROM w a JOIN w b ON b.doc_id = a.doc_id + 1
        |ORDER BY id1""".stripMargin,

    "q19_simhash" ->
      """SELECT doc_id, array_to_string(list_transform(generate_series(1, 16),
        |  j -> CASE WHEN list_sum(list_transform(regexp_split_to_array(trim(text), '\s+'),
        |    t -> CASE WHEN substr(md5(t), j, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END)) >= 0
        |  THEN '1' ELSE '0' END), '') AS simhash
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q20_text_stats" ->
      """SELECT doc_id,
        |  CASE WHEN text IS NULL OR trim(text) = '' THEN 0 ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
        |  CAST(list_sum(list_transform(regexp_split_to_array(trim(text), '\s+'),
        |    x -> greatest(CAST(ceil(len(x) / 6.0) AS INTEGER), 1))) AS BIGINT) AS n_subwords,
        |  CAST(len(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / CAST(greatest(len(text), 1) AS DOUBLE) AS alpha_ratio,
        |  CAST(len(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) / CAST(greatest(len(text), 1) AS DOUBLE) AS punct_ratio,
        |  CAST(len(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE) /
        |    CAST(greatest(CASE WHEN text IS NULL OR trim(text) = '' THEN 0 ELSE len(regexp_split_to_array(trim(text), '\s+')) END, 1) AS DOUBLE) AS mean_word_len,
        |  (CAST(len(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / CAST(greatest(len(text), 1) AS DOUBLE)) * 0.5
        |  + least((CAST(len(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE) /
        |      CAST(greatest(CASE WHEN text IS NULL OR trim(text) = '' THEN 0 ELSE len(regexp_split_to_array(trim(text), '\s+')) END, 1) AS DOUBLE)) / 8.0, 1.0) * 0.25
        |  + (1.0 - least((CAST(len(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) / CAST(greatest(len(text), 1) AS DOUBLE)) * 4.0, 1.0)) * 0.25 AS quality,
        |  CASE WHEN lw IS NULL THEN 'und'
        |       WHEN greatest(s_en, s_es, s_fr, s_de, s_zh) = 0 THEN 'und'
        |       WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de AND s_en >= s_zh THEN 'en'
        |       WHEN s_es >= s_fr AND s_es >= s_de AND s_es >= s_zh THEN 'es'
        |       WHEN s_fr >= s_de AND s_fr >= s_zh THEN 'fr'
        |       WHEN s_de >= s_zh THEN 'de' ELSE 'zh' END AS lang_id,
        |  CAST(s_en AS DOUBLE) / CAST(greatest(len(lw), 1) AS DOUBLE) AS stopword_ratio,
        |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |FROM (
        |  SELECT *,
        |    len(list_filter(lw, x -> x IN ('the','and','of','to','is','a'))) AS s_en,
        |    len(list_filter(lw, x -> x IN ('el','la','de','que','y','los'))) AS s_es,
        |    len(list_filter(lw, x -> x IN ('le','la','les','des','est','et'))) AS s_fr,
        |    len(list_filter(lw, x -> x IN ('der','die','das','und','ist','nicht'))) AS s_de,
        |    len(list_filter(lw, x -> x IN ('的','是','了','在','我','不'))) AS s_zh
        |  FROM (SELECT *, regexp_split_to_array(lower(trim(text)), '\s+') AS lw FROM documents))
        |ORDER BY doc_id""".stripMargin,

    "q21_tumbling_window" ->
      """SELECT epoch_ms(time_bucket(INTERVAL '10 minutes', ts)) AS window_ms, event_type,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY window_ms, event_type ORDER BY window_ms, event_type""".stripMargin,

    "q22_sliding_window" ->
      """SELECT epoch_ms(time_bucket(INTERVAL '10 minutes', ts) - k * INTERVAL '10 minutes') AS window_ms,
        |  event_type, count(*) AS n_events
        |FROM events CROSS JOIN (SELECT unnest([0, 1, 2]) AS k) ks
        |GROUP BY window_ms, event_type ORDER BY window_ms, event_type""".stripMargin,

    "q23_sessionize" ->
      """SELECT event_id, user_id,
        |  CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        |FROM (
        |  SELECT event_id, user_id, ts,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |           OR CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) > 1800
        |    THEN 1 ELSE 0 END AS brk
        |  FROM events)
        |ORDER BY event_id""".stripMargin,

    "q24_similarity_topk" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 20),
         |c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
         |scored AS (
         |  SELECT query_id, neighbor_id, round(${cosSql("qv", "cv")}, 6) AS cos
         |  FROM q CROSS JOIN c WHERE query_id <> neighbor_id),
         |r AS (SELECT query_id, neighbor_id,
         |  row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk FROM scored)
         |SELECT query_id, rnk, neighbor_id FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,

    "q25_embedding_neardup" ->
      // bits mirrors graft Dedup.autoSignBits(count, target=64, max=24)
      // .min(dim) EXACTLY, in integer arithmetic: m = ceil(n/64) via
      // (n+63)//64, needed = bit length of (m-1) — so the bucket geometry
      // (and the pair set) matches the Spark side at every scale factor.
      s"""WITH p AS (
         |  SELECT CASE WHEN m <= 1 THEN least(1, d)
         |              ELSE least(length(printf('%b', m - 1)), 24, d) END AS bits
         |  FROM (SELECT (count(*) + 63) // 64 AS m,
         |               (SELECT len(embedding) FROM embeddings LIMIT 1) AS d
         |        FROM embeddings)),
         |b AS (SELECT vec_id, embedding,
         |  array_to_string(list_transform(generate_series(1, (SELECT bits FROM p)),
         |    i -> CASE WHEN embedding[i] >= 0 THEN '1' ELSE '0' END), '') AS bucket
         |  FROM embeddings)
         |SELECT a.vec_id AS id1, bb.vec_id AS id2
         |FROM b a JOIN b bb ON a.bucket = bb.bucket AND a.vec_id < bb.vec_id
         |WHERE ${cosSql("a.embedding", "bb.embedding")} > 0.2
         |ORDER BY id1, id2""".stripMargin,

    "q26_scalar_library" ->
      """SELECT c_custkey,
        |  lower(trim(concat('  ', c_name, '@EXAMPLE.com '))) AS email,
        |  regexp_replace(concat('(', CAST(c_custkey % 1000 AS VARCHAR), ') 555-00', CAST(c_nationkey AS VARCHAR)), '[^0-9]', '', 'g') AS phone,
        |  CASE WHEN len(regexp_replace(concat('(', CAST(c_custkey % 1000 AS VARCHAR), ') 555-00', CAST(c_nationkey AS VARCHAR)), '[^0-9]', '', 'g')) > 0
        |       THEN concat('+', regexp_replace(concat('(', CAST(c_custkey % 1000 AS VARCHAR), ') 555-00', CAST(c_nationkey AS VARCHAR)), '[^0-9]', '', 'g'))
        |       ELSE '' END AS phone_intl,
        |  regexp_replace(concat('gs://sibci-devel.appspot.com/avatars/', CAST(c_custkey AS VARCHAR), '.png'),
        |    '^gs://sibci-(devel|2f7fc)\.appspot\.com/?', 'siscom_old/', 'g') AS avatar_url,
        |  CASE WHEN len(upper(regexp_replace(concat('v-', CAST(c_custkey AS VARCHAR), '88'), '[^A-Za-z0-9]', '', 'g'))) < 7
        |       THEN upper(regexp_replace(concat('v-', CAST(c_custkey AS VARCHAR), '88'), '[^A-Za-z0-9]', '', 'g'))
        |       WHEN substr(upper(regexp_replace(concat('v-', CAST(c_custkey AS VARCHAR), '88'), '[^A-Za-z0-9]', '', 'g')), 1, 1) IN ('V','E','J','G','P')
        |       THEN concat(substr(upper(regexp_replace(concat('v-', CAST(c_custkey AS VARCHAR), '88'), '[^A-Za-z0-9]', '', 'g')), 1, 1), '-',
        |            substr(upper(regexp_replace(concat('v-', CAST(c_custkey AS VARCHAR), '88'), '[^A-Za-z0-9]', '', 'g')), 2))
        |       ELSE concat('V-', upper(regexp_replace(concat('v-', CAST(c_custkey AS VARCHAR), '88'), '[^A-Za-z0-9]', '', 'g'))) END AS dni,
        |  CASE WHEN (CASE WHEN c_custkey % 3 = 0 THEN 'Masculino' WHEN c_custkey % 3 = 1 THEN 'Femenino' ELSE 'x' END) IN ('Masculino', 'M') THEN 'M'
        |       WHEN (CASE WHEN c_custkey % 3 = 0 THEN 'Masculino' WHEN c_custkey % 3 = 1 THEN 'Femenino' ELSE 'x' END) IN ('Femenino', 'F') THEN 'F'
        |       ELSE '' END AS gender,
        |  CASE WHEN c_custkey % 4 = 0 THEN 'image/png' WHEN c_custkey % 4 = 1 THEN 'video/mp4'
        |       WHEN c_custkey % 4 = 2 THEN 'audio/mp3' ELSE 'application/pdf' END AS mime,
        |  CAST(len(string_split(regexp_replace(concat('/', c_mktsegment, '/', c_name), '^/|/$', '', 'g'), '/')) AS BIGINT) AS depth,
        |  concat('/', c_mktsegment, '/', c_name) AS full_path,
        |  substr(c_name, 1, 12) AS name_short
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q27_crypto_roundtrip" ->
      "SELECT doc_id, text AS aes_rt, text AS salsa_rt FROM documents ORDER BY doc_id",

    "q28_reencrypt_migration" ->
      """SELECT doc_id, text AS decrypted, (doc_id % 2 = 0) AS was_encrypted
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q29_hierarchy_resolve" ->
      """WITH langs AS (SELECT DISTINCT lang FROM documents),
        |srcs AS (SELECT DISTINCT lang, source FROM documents),
        |dirs AS (
        |  SELECT path, row_number() OVER (ORDER BY path) + 1000 AS id, depth, parent_path FROM (
        |    SELECT concat('/', lang) AS path, 1 AS depth, '/' AS parent_path FROM langs
        |    UNION ALL SELECT concat('/', lang, '/', source), 2, concat('/', lang) FROM srcs)),
        |nodes AS (
        |  SELECT '/' AS path, CAST(0 AS BIGINT) AS id, 0 AS depth, NULL AS parent_path
        |  UNION ALL SELECT path, id, depth, parent_path FROM dirs
        |  UNION ALL SELECT concat('/', lang, '/', source, '/', CAST(doc_id AS VARCHAR)),
        |    doc_id + 10000, 3, concat('/', lang, '/', source) FROM documents)
        |SELECT n.id, n.path, CASE WHEN n.depth = 0 THEN 0 ELSE coalesce(p.id, 0) END AS parent_id
        |FROM nodes n LEFT JOIN nodes p ON n.parent_path = p.path
        |ORDER BY n.id""".stripMargin,

    "q30_overwrite_by_join" ->
      """WITH u AS (
        |  SELECT o_custkey AS c_custkey, concat('PRIO::', max(o_orderpriority)) AS seg
        |  FROM orders GROUP BY o_custkey HAVING count(*) >= 15)
        |SELECT c.c_custkey, coalesce(u.seg, c.c_mktsegment) AS c_mktsegment, c.c_acctbal
        |FROM customer c LEFT JOIN u USING (c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q32_json_props" ->
      """SELECT CAST(props->>'k' AS INTEGER) % 10 AS k_bucket, count(*) AS n,
        |  CAST(sum(CAST(props->>'k' AS INTEGER)) AS BIGINT) AS sum_k
        |FROM events WHERE CAST(props->>'k' AS INTEGER) IS NOT NULL
        |GROUP BY k_bucket ORDER BY k_bucket""".stripMargin,

    "q34_rolling_window" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) OVER (
        |    PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rolling_qty
        |FROM lineitem ORDER BY l_suppkey, l_orderkey, l_linenumber, rolling_qty""".stripMargin,

    "q36_exact_quantiles" ->
      """WITH ranked AS (
        |  SELECT o_orderpriority, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS rn,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM orders)
        |SELECT o_orderpriority, p, o_totalprice AS quantile FROM (
        |  SELECT o_orderpriority, CAST(0.5 AS DOUBLE) AS p, o_totalprice, rn, n FROM ranked
        |  UNION ALL SELECT o_orderpriority, CAST(0.9 AS DOUBLE), o_totalprice, rn, n FROM ranked)
        |WHERE rn = CAST(ceil(p * n) AS BIGINT)
        |ORDER BY o_orderpriority, p""".stripMargin,

    "q35_hll_distinct" ->
      """WITH h AS (SELECT md5(CAST(o_custkey AS VARCHAR)) AS x FROM orders),
        |br AS (SELECT substr(x, 1, 2) AS bucket,
        |  least(4 * length(regexp_extract(substr(x, 3, 30), '^(0*)', 1)) +
        |    (CASE WHEN substr(substr(x, 3, 30), length(regexp_extract(substr(x, 3, 30), '^(0*)', 1)) + 1, 1) = '1' THEN 3
        |          WHEN substr(substr(x, 3, 30), length(regexp_extract(substr(x, 3, 30), '^(0*)', 1)) + 1, 1) IN ('2','3') THEN 2
        |          WHEN substr(substr(x, 3, 30), length(regexp_extract(substr(x, 3, 30), '^(0*)', 1)) + 1, 1) IN ('4','5','6','7') THEN 1
        |          ELSE 0 END) + 1, 50) AS rho
        |  FROM h),
        |regs AS (SELECT bucket, max(rho) AS register FROM br GROUP BY bucket),
        |agg AS (SELECT CAST(sum(CAST(pow(2.0, 50 - register) AS BIGINT)) AS BIGINT) AS s_present,
        |  count(*) AS present FROM regs),
        |est AS (SELECT (0.7213 / (1.0 + 1.079 / 256)) * CAST(256.0 * 256 AS DOUBLE) * pow(2.0, 50) /
        |    CAST(s_present + (256 - present) * CAST(pow(2.0, 50) AS BIGINT) AS DOUBLE) AS raw_estimate,
        |  256 - present AS zero_buckets FROM agg)
        |SELECT est.raw_estimate, est.zero_buckets, e.exact_distinct
        |FROM est CROSS JOIN (SELECT count(DISTINCT o_custkey) AS exact_distinct FROM orders) e""".stripMargin,

    "q33_curation_pipeline" ->
      ("WITH " + CurationPrefixSql + """,
        |confirmed AS (SELECT DISTINCT id2 AS doc_id FROM cpairs)
        |SELECT doc_id FROM gated g WHERE NOT EXISTS (SELECT 1 FROM confirmed c WHERE c.doc_id = g.doc_id)
        |ORDER BY doc_id""".stripMargin),

    // Same pipeline, transitive survivor rule: close the confirmed-pair
    // graph (recursive reachability over symmetrized edges), keep the min
    // id per component. Feasible in DuckDB at the driver's sf0.01 oracle
    // scale; the engine runs connectedComponents (pointer jumping).
    "q65_curation_transitive" ->
      ("WITH RECURSIVE " + CurationPrefixSql + """,
        |edges AS (SELECT id1 AS a, id2 AS b FROM cpairs UNION SELECT id2, id1 FROM cpairs),
        |reach AS (
        |  SELECT a AS id, b AS r FROM edges
        |  UNION
        |  SELECT reach.id, e.b FROM reach JOIN edges e ON reach.r = e.a),
        |comp AS (SELECT id, least(id, min(r)) AS comp FROM reach GROUP BY id),
        |dropped AS (SELECT id AS doc_id FROM comp WHERE comp <> id)
        |SELECT doc_id FROM gated g WHERE NOT EXISTS (SELECT 1 FROM dropped c WHERE c.doc_id = g.doc_id)
        |ORDER BY doc_id""".stripMargin),

    // Near-superset containment pairs — mirrors Dedup.containmentPairs
    // step-for-step: same shingles, same df, same corpus-relative anchor
    // cap (greatest(ceil(0.2·n), 16)), same (df, shingle)-ordered anchor
    // top-k (k=10), same candidate-budget posting cap (prn <= 409, which
    // is Dedup.defaultPostCap = DefaultMaxCandidatesPerDoc /
    // DefaultAnchorsPerDoc = 4096/10 — interpolated via capped(), never a
    // drifting literal; each anchor-vocabulary gram keeps its cap-many
    // lowest doc ids — inert below ~2k-doc near-dup clusters, measured 0
    // drops at sf0.01/sf0.1), same m-of-k co-occurrence rule (HAVING
    // count >= 4), same containment division (denominator
    // greatest(|A|,1) exactly as the engine's containment()).
    "q67_containment_pairs" -> capped(
      """WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
        |cap AS (SELECT greatest(CAST(ceil(0.2 * count(*)) AS BIGINT), 16) AS v FROM documents),
        |sh AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, greatest(len(ws)-1, 1)),
        |  i -> array_to_string(ws[i:i+1], ' '))) AS s FROM w),
        |ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |dfreq AS (SELECT g, count(*) AS df FROM ex GROUP BY g),
        |ranked AS (SELECT e.doc_id, e.g, d.df,
        |    row_number() OVER (PARTITION BY e.doc_id ORDER BY d.df, e.g) AS rn
        |  FROM ex e JOIN dfreq d ON e.g = d.g WHERE d.df <= (SELECT v FROM cap)),
        |anchors AS (SELECT doc_id, g FROM ranked WHERE rn <= 10),
        |postings AS (SELECT e.g, e.doc_id,
        |    row_number() OVER (PARTITION BY e.g ORDER BY e.doc_id) AS prn
        |  FROM ex e WHERE e.g IN (SELECT g FROM anchors)),
        |kept AS (SELECT g, doc_id FROM postings WHERE prn <= __POSTCAP__),
        |cand AS (SELECT a.doc_id AS ida, k.doc_id AS idb
        |  FROM anchors a JOIN kept k ON a.g = k.g WHERE a.doc_id <> k.doc_id
        |  GROUP BY a.doc_id, k.doc_id HAVING count(*) >= 4),
        |ver AS (SELECT c.ida, c.idb,
        |    round(CAST(len(list_intersect(s1.s, s2.s)) AS DOUBLE) / CAST(greatest(len(s1.s), 1) AS DOUBLE), 6) AS containment
        |  FROM cand c JOIN sh s1 ON s1.doc_id = c.ida JOIN sh s2 ON s2.doc_id = c.idb)
        |SELECT ida AS id1, idb AS id2, containment FROM ver
        |WHERE containment >= 0.8 ORDER BY id1, id2""".stripMargin),

    // Containment dedup in production order: q65's transitive-curation
    // survivors (CurationPrefixSql + recursive closure — `sh` already
    // holds gated docs' shingle arrays, so the containment tier reuses it
    // semi-joined to the survivor set) feeding q67's containment pipeline
    // (c-prefixed CTEs; same corpus-relative cap computed over SURVIVORS,
    // same anchor top-k, same m-of-k rule, same division).
    "q69_containment_curated" -> capped(
      "WITH RECURSIVE " + CurationPrefixSql + ContainCuratedTailSql),

    // q69's production-order stack over documents ∪ the PLANTED
    // near-superset pair (PlantedFixture — both engines union the same
    // literals; see the q102 entry point for the construction): the one
    // oracle-checked production-order run where containment FIRES. Same
    // CTEs as q69 with the base corpus swapped to `pdocs`.
    "q102_containment_planted" -> capped(
      "WITH RECURSIVE pdocs AS (SELECT doc_id, text FROM documents UNION ALL " +
        graft.PlantedFixture.unionSql + "),\n" +
        CurationPrefixSql.replace("FROM documents", "FROM pdocs") +
        ContainCuratedTailSql),

    // SemDeDup (q103): deterministic Forgy centroids (the 4 lowest
    // vec_ids' embeddings, re-keyed 0..3), argmax-cosine assignment
    // (round-6 + centroid-id tie-break — the q25 ordering discipline),
    // intra-cell pairs above the cosine bar, recursive transitive closure,
    // then the PAPER's survivor rule: per component keep the member with
    // the lowest cosine to its own centroid (6-dp, then min id) — the
    // least prototypical copy, not min id.
    "q103_sem_dedup" ->
      s"""WITH RECURSIVE c AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS centroid_id,
         |         embedding AS cvec
         |  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 8)),
         |scored AS (
         |  SELECT v.vec_id AS id, v.embedding AS vec, c.centroid_id,
         |         round(${cosSql("v.embedding", "c.cvec")}, 6) AS cosc
         |  FROM embeddings v CROSS JOIN c),
         |asg AS (
         |  SELECT id, vec, centroid_id, cosc FROM (
         |    SELECT *, row_number() OVER (PARTITION BY id
         |      ORDER BY cosc DESC, centroid_id ASC) AS rn FROM scored)
         |  WHERE rn = 1),
         |pairs AS (
         |  SELECT a.id AS id1, b.id AS id2
         |  FROM asg a JOIN asg b ON a.centroid_id = b.centroid_id AND a.id < b.id
         |  WHERE ${cosSql("a.vec", "b.vec")} > 0.35),
         |edges AS (SELECT id1 AS a, id2 AS e2 FROM pairs UNION SELECT id2, id1 FROM pairs),
         |reach AS (
         |  SELECT a AS id, e2 AS r FROM edges
         |  UNION
         |  SELECT reach.id, e.e2 FROM reach JOIN edges e ON reach.r = e.a),
         |comp AS (SELECT id, least(id, min(r)) AS comp FROM reach GROUP BY id),
         |lab AS (
         |  SELECT asg.id, asg.cosc, coalesce(comp.comp, asg.id) AS comp
         |  FROM asg LEFT JOIN comp ON asg.id = comp.id)
         |SELECT id AS vec_id FROM (
         |  SELECT id, row_number() OVER (PARTITION BY comp
         |    ORDER BY cosc ASC, id ASC) AS rn FROM lab)
         |WHERE rn = 1 ORDER BY vec_id""".stripMargin,

    // The full training-data prep pipeline (q73) — q69's stitched
    // curation→containment stages (identical CTEs through cver), then the
    // one-shot containment drop rule (drop the contained id1; symmetric
    // pairs keep min id), then q71's substring-clean CTEs (s-prefixed)
    // computed over the REMAINING corpus. Mirrors SparkEntry.trainPrep
    // stage-for-stage.
    "q73_train_prep" -> capped(materializedPrep(
      "WITH RECURSIVE " + CurationPrefixSql + ",\n" + TrainPrepCtesSql +
      "\nSELECT doc_id, clean_text FROM clean ORDER BY doc_id")),

    // Distributed BPE vocabulary learning: the merge table after five
    // iterations. Each oracle stage replays pair counting (all adjacent
    // positions, overlap included), the (count DESC, lhs, rhs) argmax,
    // and the greedy non-overlapping left-to-right rewrite.
    "q95_bpe_merges" ->
      (bpeCtes(5) + "\nSELECT * FROM (" +
        (0 until 5).map(i =>
          s"SELECT CAST(${i + 1} AS INTEGER) AS merge_idx, a AS lhs, b AS rhs, " +
            s"CAST(c AS BIGINT) AS pair_count FROM top$i").mkString(" UNION ALL ") +
        ") ORDER BY merge_idx"),

    // The learned vocabulary applied: per-doc token/subword counts = each
    // doc's tokens joined to the FINAL symbol state (word -> merged
    // symbols) of the q95 chain.
    "q96_bpe_subwords" ->
      (bpeCtes(5) + """,
        |dtok AS (SELECT doc_id,
        |    unnest(string_split_regex(lower(trim(coalesce(text, ''))), '\s+')) AS w
        |  FROM documents)
        |SELECT t.doc_id, count(*) AS n_tokens,
        |  CAST(sum(len(s.syms)) AS BIGINT) AS n_subwords
        |FROM dtok t JOIN st5 s ON t.w = s.w
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin),

    // The BPE vocabulary under the q95 merges: distinct subwords of the
    // final symbol state, token ids by lexicographic rank.
    "q97_bpe_vocab" ->
      (bpeCtes(5) + """,
        |voc AS (SELECT DISTINCT unnest(syms) AS subword FROM st5)
        |SELECT CAST(row_number() OVER (ORDER BY subword) AS BIGINT) AS token_id,
        |  subword
        |FROM voc ORDER BY token_id""".stripMargin),

    // BPE encode: per-doc token-id sequences under the q95 merges and the
    // q97 id assignment, pinned per doc via md5 of the space-joined
    // decimal ids (plus the count). Docs with no tokens keep an empty
    // sequence (md5 of the empty string).
    "q98_bpe_encode" ->
      (bpeCtes(5) + ",\n" + BpeEncodeCtesSql + """
        |SELECT b.doc_id,
        |  CAST(coalesce(len(i.ids), 0) AS BIGINT) AS n_ids,
        |  md5(array_to_string(coalesce(i.ids, CAST([] AS BIGINT[])), ' ')) AS ids_md5
        |FROM (SELECT doc_id FROM documents) b LEFT JOIN dids i USING (doc_id)
        |ORDER BY doc_id""".stripMargin),

    // BPE encode → pack-split composition: the q98 sequences' lengths fed
    // through the q78 capacity-split packer, lang-sharded — the packer
    // binning REAL tokenizer counts, so a BPE/packing stage-interaction
    // bug (dropped subword shifting the cumulative sums) breaks this hash.
    "q99_bpe_pack" ->
      (bpeCtes(5) + ",\n" + BpeEncodeCtesSql + """,
        |dcnt AS (SELECT d.doc_id, d.lang,
        |    CAST(coalesce(len(i.ids), 0) AS BIGINT) AS n_ids
        |  FROM documents d LEFT JOIN dids i ON d.doc_id = i.doc_id),
        |pseqs AS (SELECT doc_id, lang, n_ids,
        |    GREATEST(CAST(CEIL(n_ids / 256.0) AS BIGINT), 1) AS nseq,
        |    UNNEST(generate_series(0,
        |      GREATEST(CAST(CEIL(n_ids / 256.0) AS BIGINT), 1) - 1)) AS seq_idx
        |  FROM dcnt),
        |pst AS (SELECT doc_id, lang, n_ids, seq_idx,
        |    CAST(CASE WHEN seq_idx < nseq - 1 THEN 256
        |      ELSE n_ids - (nseq - 1) * 256 END AS BIGINT) AS seq_tokens
        |  FROM pseqs)
        |SELECT doc_id, lang, n_ids, seq_idx, seq_tokens,
        |  CAST(FLOOR((SUM(seq_tokens) OVER (PARTITION BY lang
        |    ORDER BY doc_id, seq_idx
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - seq_tokens)
        |    / 256.0) AS BIGINT) AS bin_id
        |FROM pst ORDER BY doc_id, seq_idx""".stripMargin),

    // q73 with the CCNet-family perplexity gate armed (lmMaxPpl = 31):
    // the q92 LM mirror retrained on the curated corpus slots between the
    // curation closure and the containment tail, and the tail's exclusion
    // set becomes closure ∪ LM drops. One stitched hash pins the stage
    // INTERACTION: the LM trains on exactly the closure's survivors, and
    // containment prices exactly the LM's survivors.
    "q94_train_prep_lm" -> capped(materializedPrep(
      "WITH RECURSIVE " + CurationPrefixSql + ",\n" + CurationClosureSql +
      ",\n" + lmGateSql("31.0") + ",\n" + prepTailSql("lmexcl") +
      "\nSELECT doc_id, clean_text FROM clean ORDER BY doc_id")),

    // q73 with the SemDeDup stage armed (Forgy centroids, threshold .35):
    // the q103 semantic-dedup mirror over the curated survivors'
    // embeddings slots between the curation closure and the containment
    // tail; the tail's exclusion set becomes closure ∪ semantic drops —
    // the q94 stitching pattern for the embedding modality.
    "q105_train_prep_sem" -> capped(materializedPrep(
      "WITH RECURSIVE " + CurationPrefixSql + ",\n" + CurationClosureSql +
      ",\n" + semGateSql(8, "0.35") + ",\n" + prepTailSql("semexcl") +
      "\nSELECT doc_id, clean_text FROM clean ORDER BY doc_id")),

    // prep -> pack: the clean corpus (q73's CTEs verbatim) re-tokenized
    // (whitespace token count of clean_text; empty docs = 0 tokens, both
    // engines' splitters return [''] on '' so the CASE is explicit),
    // joined back for the shard key (lang), packed with q40/q60's
    // cumulative-sum bin rule at 1024 tokens/bin. The last stage a
    // training-data pipeline runs, composed over the prep output so
    // stage-interaction bugs (span removal shifting token counts under
    // the packer's bin arithmetic) surface in THIS hash compare.
    "q75_prep_pack" -> capped(materializedPrep(
      "WITH RECURSIVE " + CurationPrefixSql + ",\n" + TrainPrepCtesSql) + """,
        |packd AS (SELECT c.doc_id, d.lang,
        |    CASE WHEN c.clean_text = '' THEN 0
        |         ELSE len(regexp_split_to_array(c.clean_text, '\s+')) END AS n_tokens
        |  FROM clean c JOIN documents d ON c.doc_id = d.doc_id)
        |SELECT doc_id, lang, n_tokens,
        |  CAST(floor((sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |    ROWS UNBOUNDED PRECEDING) - n_tokens) / 1024.0) AS BIGINT) AS bin_id
        |FROM packd ORDER BY doc_id""".stripMargin),

    // Substring-level duplication report — mirrors Dedup.duplicatedSpans
    // step-for-step: same stride-1 8-token windows over the same
    // tokenizer, same lexicographic min(doc, pos) global-first rule (min doc_id, then min
    // pos within that doc), same span-merge rule (a gap > 8 between
    // consecutive marked positions starts a new span, gap <= 8 merges;
    // null lag folds to 0 in both engines), same [pos, pos+8) arithmetic.
    "q70_substring_dedup" ->
      """WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
        |wins AS (SELECT doc_id, u.pos AS pos, u.g AS g FROM (
        |  SELECT doc_id, unnest(list_transform(generate_series(0, len(ws) - 8),
        |      i -> struct_pack(pos := i, g := array_to_string(ws[i+1:i+8], ' ')))) AS u
        |  FROM w WHERE len(ws) >= 8)),
        |grp AS (SELECT g, count(*) AS c,
        |    min(struct_pack(d := doc_id, p := pos)) AS first FROM wins GROUP BY g),
        |dup AS (SELECT g, first FROM grp WHERE c > 1),
        |marked AS (SELECT w3.doc_id, w3.pos FROM wins w3
        |  JOIN dup ON w3.g = dup.g
        |  WHERE NOT (w3.doc_id = dup.first.d AND w3.pos = dup.first.p)),
        |flag AS (SELECT doc_id, pos,
        |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 8
        |         THEN 1 ELSE 0 END AS nw
        |  FROM marked),
        |sid AS (SELECT doc_id, pos,
        |    sum(nw) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flag),
        |spans AS (SELECT doc_id, sid, min(pos) AS s, max(pos) + 8 AS e
        |  FROM sid GROUP BY doc_id, sid)
        |SELECT doc_id, count(*) AS dup_spans, CAST(sum(e - s) AS BIGINT) AS dup_tokens
        |FROM spans GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Actionable substring dedup (q70's removal form) — same CTEs through
    // `spans`, then every doc rebuilt from its kept token positions (the
    // [s, e) containment test mirrors the engine's exists() lambda; null
    // span list folds to "keep everything" via the coalesce).
    "q71_substring_clean" ->
      """WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
        |wins AS (SELECT doc_id, u.pos AS pos, u.g AS g FROM (
        |  SELECT doc_id, unnest(list_transform(generate_series(0, len(ws) - 8),
        |      i -> struct_pack(pos := i, g := array_to_string(ws[i+1:i+8], ' ')))) AS u
        |  FROM w WHERE len(ws) >= 8)),
        |grp AS (SELECT g, count(*) AS c,
        |    min(struct_pack(d := doc_id, p := pos)) AS first FROM wins GROUP BY g),
        |dup AS (SELECT g, first FROM grp WHERE c > 1),
        |marked AS (SELECT w3.doc_id, w3.pos FROM wins w3
        |  JOIN dup ON w3.g = dup.g
        |  WHERE NOT (w3.doc_id = dup.first.d AND w3.pos = dup.first.p)),
        |flag AS (SELECT doc_id, pos,
        |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 8
        |         THEN 1 ELSE 0 END AS nw
        |  FROM marked),
        |sid AS (SELECT doc_id, pos,
        |    sum(nw) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flag),
        |spans AS (SELECT doc_id, sid, min(pos) AS s, max(pos) + 8 AS e
        |  FROM sid GROUP BY doc_id, sid),
        |spanlist AS (SELECT doc_id AS sdoc, list(struct_pack(s := s, e := e)) AS sp
        |  FROM spans GROUP BY doc_id)
        |SELECT w.doc_id, coalesce(array_to_string(
        |  list_transform(
        |    list_filter(
        |      list_transform(generate_series(1, len(w.ws)), i -> struct_pack(w := w.ws[i], i := i - 1)),
        |      x -> coalesce(len(list_filter(sl.sp, spn -> x.i >= spn.s AND x.i < spn.e)), 0) = 0),
        |    x -> x.w), ' '), '') AS clean_text
        |FROM w LEFT JOIN spanlist sl ON w.doc_id = sl.sdoc ORDER BY w.doc_id""".stripMargin,

    // Embedding dedup, transitive survivors — q25's auto-geometry bucket
    // pairs closed with the q65-style recursive reachability; survivors =
    // every vec_id not dropped (min id per component survives).
    "q68_embedding_dedup" ->
      s"""WITH RECURSIVE p AS (
         |  SELECT CASE WHEN m <= 1 THEN least(1, d)
         |              ELSE least(length(printf('%b', m - 1)), 24, d) END AS bits
         |  FROM (SELECT (count(*) + 63) // 64 AS m,
         |               (SELECT len(embedding) FROM embeddings LIMIT 1) AS d
         |        FROM embeddings)),
         |b AS (SELECT vec_id, embedding,
         |  array_to_string(list_transform(generate_series(1, (SELECT bits FROM p)),
         |    i -> CASE WHEN embedding[i] >= 0 THEN '1' ELSE '0' END), '') AS bucket
         |  FROM embeddings),
         |pairs AS (SELECT a.vec_id AS id1, bb.vec_id AS id2
         |  FROM b a JOIN b bb ON a.bucket = bb.bucket AND a.vec_id < bb.vec_id
         |  WHERE ${cosSql("a.embedding", "bb.embedding")} > 0.2),
         |edges AS (SELECT id1 AS a, id2 AS e2 FROM pairs UNION SELECT id2, id1 FROM pairs),
         |reach AS (
         |  SELECT a AS id, e2 AS r FROM edges
         |  UNION
         |  SELECT reach.id, e.e2 FROM reach JOIN edges e ON reach.r = e.a),
         |comp AS (SELECT id, least(id, min(r)) AS comp FROM reach GROUP BY id),
         |dropped AS (SELECT id FROM comp WHERE comp <> id)
         |SELECT vec_id FROM embeddings v
         |WHERE NOT EXISTS (SELECT 1 FROM dropped c WHERE c.id = v.vec_id)
         |ORDER BY vec_id""".stripMargin,

    "q31_table_counts" ->
      Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem",
        "events", "documents", "embeddings")
        .map(t => s"SELECT '$t' AS tbl, count(*) AS n FROM $t")
        .mkString("", " UNION ALL ", " ORDER BY tbl"),

    // X12 — both engines emit compact JSON ({"k":v}, no separator spaces),
    // so the serialized text hash-matches byte-for-byte.
    "q37_json_serialize" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 <> 0 THEN CAST(to_json([
        |    struct_pack(emoji := 'like', user_id := doc_id*7%100),
        |    struct_pack(emoji := 'heart', user_id := doc_id*11%100)]) AS VARCHAR)
        |  ELSE '[]' END AS reactions_json,
        |  CAST(to_json(struct_pack(lang := lang, source := source)) AS VARCHAR) AS meta_json
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q38_embedding_band_lsh" ->
      s"""WITH b AS (
         |  SELECT vec_id, band,
         |    array_to_string(list_transform(generate_series(1, 12),
         |      i -> CASE WHEN embedding[band*12 + i] >= 0 THEN '1' ELSE '0' END), '') AS bucket
         |  FROM embeddings CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band) bands),
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS id1, bb.vec_id AS id2
         |  FROM b a JOIN b bb ON a.band = bb.band AND a.bucket = bb.bucket AND a.vec_id < bb.vec_id),
         |v AS (SELECT vec_id, embedding FROM embeddings)
         |SELECT id1, id2 FROM cand
         |JOIN v v1 ON v1.vec_id = id1 JOIN v v2 ON v2.vec_id = id2
         |WHERE ${cosSql("v1.embedding", "v2.embedding")} > 0.2
         |ORDER BY id1, id2""".stripMargin,

    // deterministic md5-derived uniform: identical digest semantics in both
    // engines, so the sampled id set matches exactly (never rand())
    "q39_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) / 4294967296.0
        |  < (CASE WHEN lang = 'en' THEN 0.8 WHEN lang = 'zh' THEN 0.2 ELSE 0.5 END)
        |ORDER BY doc_id""".stripMargin,

    "q40_pack_bins" ->
      """SELECT doc_id, lang, n_chars,
        |  CAST(floor((sum(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
        |    ROWS UNBOUNDED PRECEDING) - n_chars) / 4096.0) AS BIGINT) AS bin_id
        |FROM documents ORDER BY doc_id""".stripMargin,

    // the engine's union+window as-of join vs DuckDB's native ASOF JOIN —
    // two entirely different algorithms, same relation
    "q41_asof_join" ->
      """WITH b AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS tus FROM events),
        |s AS (SELECT user_id, tus, max(event_id) AS sid FROM b
        |      WHERE event_type = 'signup' GROUP BY user_id, tus)
        |SELECT e.event_id, e.user_id, s.sid AS last_signup_id
        |FROM (SELECT event_id, user_id, tus FROM b) e
        |ASOF LEFT JOIN s ON e.user_id = s.user_id AND s.tus <= e.tus
        |ORDER BY e.event_id""".stripMargin,

    "q42_range_join" ->
      """WITH b AS (SELECT event_id, event_type, epoch_us(ts) AS tus FROM events),
        |w AS (SELECT event_id AS err_id, tus AS w_start, tus + 600000000 AS w_end
        |      FROM b WHERE event_type = 'error')
        |SELECT w.err_id, count(*) AS n_events_in_window
        |FROM b e JOIN w ON e.tus >= w.w_start AND e.tus < w.w_end
        |GROUP BY w.err_id ORDER BY w.err_id""".stripMargin,

    // the sweep-form interval count must hash-match the SAME pair-join SQL
    // q42 is checked against — one aggregate, two engine algorithms
    "q62_interval_count" ->
      """WITH b AS (SELECT event_id, event_type, epoch_us(ts) AS tus FROM events),
        |w AS (SELECT event_id AS err_id, tus AS w_start, tus + 600000000 AS w_end
        |      FROM b WHERE event_type = 'error')
        |SELECT w.err_id, count(*) AS n_events_in_window
        |FROM b e JOIN w ON e.tus >= w.w_start AND e.tus < w.w_end
        |GROUP BY w.err_id ORDER BY w.err_id""".stripMargin,

    // single-phase reference for the engine's salted two-phase aggregation
    "q43_salted_agg" ->
      """SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q44_exact_moments" ->
      """SELECT event_type, count(value) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE) / count(value) AS mean,
        |  CASE WHEN count(value) > 1 THEN
        |    round((CAST(sum(CAST(value * value AS DECIMAL(38,12))) AS DOUBLE)
        |      - CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE)
        |        * CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE) / count(value))
        |    / (count(value) - 1), 6) END AS variance
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // q17's pair generation + a recursive-CTE transitive closure: min
    // reachable id per node ≡ the engine's min-label propagation fixpoint
    "q45_dedup_components" ->
      """WITH RECURSIVE w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
        |sh AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, greatest(len(ws)-1, 1)),
        |  i -> array_to_string(ws[i:i+1], ' '))) AS s FROM w),
        |sig AS (SELECT doc_id, list_transform(generate_series(0, 15),
        |  k -> list_aggregate(list_transform(s, x -> md5(concat(k, ':', x))), 'min')) AS g FROM sh),
        |bands AS (SELECT doc_id, list_transform(generate_series(0, 3),
        |  b -> md5(array_to_string(g[b*4+1:b*4+4], '|'))) AS bl FROM sig),
        |bexp AS (SELECT doc_id, t.b AS band, bl[t.b] AS bucket
        |  FROM bands, generate_series(1, 4) t(b)),
        |pairs AS (
        |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
        |  FROM bexp a JOIN bexp b
        |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
        |edges AS (SELECT id1 AS a, id2 AS b FROM pairs UNION SELECT id2, id1 FROM pairs),
        |r(src, dst) AS (
        |  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
        |  UNION
        |  SELECT r.src, e.b FROM r JOIN edges e ON e.a = r.dst
        |)
        |SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS comp
        |FROM documents d LEFT JOIN (SELECT src AS id, min(dst) AS comp FROM r GROUP BY src) c
        |  ON c.id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "q46_top_words" ->
      """WITH words AS (
        |  SELECT lang, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS word
        |  FROM documents),
        |counts AS (
        |  SELECT lang, word, count(*) AS n FROM words WHERE word <> '' GROUP BY lang, word),
        |ranked AS (
        |  SELECT lang, word, n,
        |    row_number() OVER (PARTITION BY lang ORDER BY n DESC, word) AS rnk
        |  FROM counts)
        |SELECT lang, rnk, word, n FROM ranked WHERE rnk <= 3
        |ORDER BY lang, rnk""".stripMargin,

    "q48_repetition" ->
      """WITH w AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
        |s AS (SELECT doc_id, len(ws) AS word_cnt, len(list_distinct(ws)) AS dc FROM w),
        |g AS (
        |  SELECT doc_id,
        |    unnest(list_transform(generate_series(1, len(ws) - 1),
        |      i -> array_to_string(ws[i:i+1], ' '))) AS gram
        |  FROM w WHERE len(ws) >= 2),
        |c AS (SELECT doc_id, gram, count(*) AS n FROM g GROUP BY doc_id, gram),
        |t AS (SELECT doc_id, max(n) AS top_ngram_cnt FROM c GROUP BY doc_id)
        |SELECT s.doc_id, word_cnt,
        |  round(1 - dc / CAST(word_cnt AS DOUBLE), 6) AS dup_word_frac,
        |  coalesce(top_ngram_cnt, 0) AS top_ngram_cnt,
        |  round(coalesce(top_ngram_cnt, 0) * 2 / CAST(word_cnt AS DOUBLE), 6)
        |    AS top_ngram_frac
        |FROM s LEFT JOIN t ON s.doc_id = t.doc_id
        |ORDER BY s.doc_id""".stripMargin,

    "q49_decontaminate" -> DecontaminateSql,

    // Bloom-pruned decontamination is exact (prune + verify), so it shares
    // q49's oracle verbatim — same fixture, same output contract.
    "q64_decontaminate_bloom" -> DecontaminateSql,

    "q50_quantized_topk" ->
      """WITH e AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(floor(
        |      CAST(x AS DOUBLE) /
        |      (greatest(list_max(list_transform(embedding,
        |         y -> abs(CAST(y AS DOUBLE)))), 1e-30) / 127.0) + 0.5) AS BIGINT)) AS qv
        |  FROM embeddings),
        |q AS (SELECT vec_id AS query_id, qv AS qa FROM e WHERE vec_id < 20),
        |c AS (SELECT vec_id AS neighbor_id, qv AS qb FROM e),
        |scored AS (
        |  SELECT query_id, neighbor_id,
        |    round(CASE WHEN list_sum(list_transform(qa, x -> x * x)) = 0
        |            OR list_sum(list_transform(qb, x -> x * x)) = 0 THEN 0.0
        |      ELSE CAST(list_sum(list_transform(generate_series(1, len(qa)),
        |             i -> qa[i] * qb[i])) AS DOUBLE) /
        |        (sqrt(CAST(list_sum(list_transform(qa, x -> x * x)) AS DOUBLE)) *
        |         sqrt(CAST(list_sum(list_transform(qb, x -> x * x)) AS DOUBLE)))
        |      END, 6) AS cos
        |  FROM q CROSS JOIN c WHERE query_id <> neighbor_id),
        |r AS (SELECT query_id, neighbor_id,
        |  row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
        |  FROM scored)
        |SELECT query_id, rnk, neighbor_id FROM r WHERE rnk <= 5
        |ORDER BY query_id, rnk""".stripMargin,

    "q51_epoch_shuffle" ->
      """SELECT doc_id,
        |  md5(CAST(doc_id AS VARCHAR) || '#epoch1') AS shuffle_order
        |FROM documents
        |ORDER BY shuffle_order""".stripMargin,

    "q52_mixture" ->
      """WITH en AS (
        |  SELECT doc_id FROM documents WHERE lang = 'en'
        |    AND CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#mix0'), 1, 8)
        |      AS UBIGINT) / 4294967296.0 < 0.6),
        |r0 AS (SELECT doc_id FROM documents WHERE lang <> 'en'),
        |r1 AS (
        |  SELECT doc_id FROM documents WHERE lang <> 'en'
        |    AND CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#mix1'), 1, 8)
        |      AS UBIGINT) / 4294967296.0 < 0.5),
        |mix AS (SELECT doc_id FROM en UNION ALL SELECT doc_id FROM r0
        |  UNION ALL SELECT doc_id FROM r1)
        |SELECT doc_id, count(*) AS n_copies FROM mix GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    "q53_salted_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "q54_minmax_stats" ->
      Seq(("orders", "o_orderkey"), ("orders", "o_totalprice"),
        ("lineitem", "l_orderkey"), ("lineitem", "l_extendedprice"),
        ("part", "p_partkey"), ("customer", "c_custkey"))
        .map { case (t, c) =>
          s"""SELECT '$t' AS tbl, '$c' AS col_name,
             |  CAST(min($c) AS DOUBLE) AS min_v, CAST(max($c) AS DOUBLE) AS max_v
             |FROM $t""".stripMargin
        }
        .mkString("", " UNION ALL ", " ORDER BY tbl, col_name"),

    // span-level exact dedup: winner chunk = min (doc_id, position) per md5,
    // identified by the globally-unique packed rank on both engines
    "q55_chunk_dedup" ->
      """WITH w AS (SELECT doc_id, regexp_split_to_array(trim(coalesce(text, '')), '\s+') AS ws FROM documents),
        |c0 AS (SELECT doc_id,
        |    unnest(list_transform(generate_series(0, CAST(ceil(len(ws)/8.0) AS BIGINT) - 1),
        |      i -> struct_pack(idx := i, chunk := array_to_string(ws[i*8+1 : i*8+8], ' ')))) AS u
        |  FROM w),
        |c AS (SELECT doc_id, u.idx AS idx, u.chunk AS chunk,
        |    doc_id*1000000 + u.idx AS rank FROM c0),
        |winners AS (SELECT min(rank) AS rank FROM c GROUP BY md5(chunk)),
        |kept AS (SELECT c.* FROM c JOIN winners USING (rank)),
        |rebuilt AS (SELECT doc_id, count(*) AS n_kept,
        |    string_agg(chunk, ' ' ORDER BY idx) AS cleaned_text
        |  FROM kept GROUP BY doc_id)
        |SELECT w.doc_id, CAST(ceil(len(w.ws)/8.0) AS BIGINT) AS n_chunks,
        |  coalesce(r.n_kept, 0) AS n_kept,
        |  coalesce(r.cleaned_text, '') AS cleaned_text
        |FROM w LEFT JOIN rebuilt r ON r.doc_id = w.doc_id
        |ORDER BY w.doc_id""".stripMargin,

    // PII scrub: identical regexes (plain classes + bounded quantifiers —
    // Java regex and RE2 agree), applied in the same order on the
    // progressively-redacted text; DuckDB needs the explicit 'g' flag
    "q56_pii_redact" ->
      """WITH p AS (SELECT doc_id,
        |    text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
        |      || CASE WHEN doc_id % 3 = 0
        |           THEN ' call +1 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |           ELSE '' END
        |      || CASE WHEN doc_id % 2 = 0
        |           THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.7'
        |           ELSE '' END
        |      || ' acct 9' || lpad(CAST(doc_id % 100000000 AS VARCHAR), 8, '0') AS payload
        |  FROM documents),
        |s1 AS (SELECT doc_id, payload,
        |    len(regexp_extract_all(payload, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
        |    regexp_replace(payload, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
        |  FROM p),
        |s2 AS (SELECT doc_id, n_email,
        |    len(regexp_extract_all(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ip,
        |    regexp_replace(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS t2
        |  FROM s1),
        |s3 AS (SELECT doc_id, n_email, n_ip,
        |    len(regexp_extract_all(t2, '\+\d{1,3} \d{3}-\d{4}')) AS n_phone,
        |    regexp_replace(t2, '\+\d{1,3} \d{3}-\d{4}', '<PHONE>', 'g') AS t3
        |  FROM s2)
        |SELECT doc_id,
        |  regexp_replace(t3, '\b\d{9,}\b', '<ID>', 'g') AS redacted,
        |  n_email, n_ip, n_phone,
        |  len(regexp_extract_all(t3, '\b\d{9,}\b')) AS n_id
        |FROM s3 ORDER BY doc_id""".stripMargin,

    // per-source quota: the two-stage salted window composes to exactly the
    // single-window rule, so the oracle states the rule directly
    "q57_source_quota" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk
        |  FROM documents)
        |WHERE rnk <= 15 ORDER BY doc_id""".stripMargin,

    // TF-IDF with log-free idf (N/df): ranking is log-monotone-identical
    // and the score is one correctly-rounded IEEE division + multiply,
    // bit-equal across engines (libm ln is not)
    "q58_tfidf_terms" ->
      """WITH words AS (SELECT doc_id,
        |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS w FROM documents),
        |tf AS (SELECT doc_id, w, count(*) AS tf FROM words WHERE w <> '' GROUP BY 1, 2),
        |dfreq AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents)
        |SELECT doc_id, rnk, w AS term, round(score, 6) AS score FROM (
        |  SELECT tf.doc_id, tf.w,
        |    tf.tf * (n.n / dfreq.df) AS score,
        |    row_number() OVER (PARTITION BY tf.doc_id
        |      ORDER BY tf.tf * (n.n / dfreq.df) DESC, tf.w) AS rnk
        |  FROM tf, dfreq, n WHERE tf.w = dfreq.w)
        |WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,

    // PGM decode round-trip: the engine really encodes + parses P5 bytes;
    // the oracle recomputes the pixel sum of the synthetic gradient in
    // closed form — pixels are (7·id + i) mod 256 for i in 0..127, i.e.
    // 128 consecutive residues starting at a = 7·id mod 256, whose sum is
    // 128a + 8128 minus 256 per wrapped element (max(a-128, 0) of them)
    "q59_pgm_decode" ->
      """SELECT doc_id, 16 AS width, 8 AS height,
        |  128*a + 8128 - 256*GREATEST(a - 128, 0) AS sum_px
        |FROM (SELECT doc_id, (doc_id*7) % 256 AS a FROM documents)
        |ORDER BY doc_id""".stripMargin,

    // WAV decode round-trip: the engine really encodes + parses RIFF PCM16
    // bytes through javax.sound.sampled; the oracle recomputes the stats of
    // the synthetic ramp in closed form — samples are (7·id + i) mod 256
    // for i in 0..159, i.e. 160 consecutive residues starting at
    // a = 7·id mod 256: sum = 160a + 12720 minus 256 per wrapped element
    // (max(a-96, 0) of them); peak = min(a+159, 255); 160 mono frames at
    // 8 kHz = 20 ms exactly (integer frame arithmetic in both engines)
    "q76_wav_decode" ->
      """SELECT doc_id, 8000 AS sample_rate, 1 AS channels,
        |  CAST(160 AS BIGINT) AS n_samples, CAST(20 AS BIGINT) AS duration_ms,
        |  160*a + 12720 - 256*GREATEST(a - 96, 0) AS sum_samples,
        |  CAST(LEAST(a + 159, 255) AS INTEGER) AS peak
        |FROM (SELECT doc_id, (doc_id*7) % 256 AS a FROM documents)
        |ORDER BY doc_id""".stripMargin,

    // PNG decode round-trip: the engine really compresses + decompresses
    // zlib/IDAT bytes through javax.imageio; the oracle recomputes the
    // synthetic ramp's stats in closed form — pixels are (11·id + i) mod
    // 256 for i in 0..199, i.e. 200 consecutive residues starting at
    // a = 11·id mod 256: sum = 200a + 19900 minus 256 per wrapped element
    // (max(a - 56, 0) of them; a ≤ 255 so no element wraps twice)
    "q77_png_decode" ->
      """SELECT doc_id, 20 AS width, 10 AS height,
        |  200*a + 19900 - 256*GREATEST(a - 56, 0) AS sum_px
        |FROM (SELECT doc_id, (doc_id*11) % 256 AS a FROM documents)
        |ORDER BY doc_id""".stripMargin,

    // perceptual aHash: mirror the engine's whole pipeline in closed form —
    // the 8×8 nearest-neighbor downsample of the 16×8 synthetic image picks
    // source offset 2·pos (sy=y, sx=2x), so sampled value =
    // (doc_id·(2·pos+1)) mod 256; bit = exact-integer mean rule 64·v > Σv;
    // the 64 bits pack into (hi = bits 32..63, lo = bits 0..31) as two
    // BIGINTs (bit 63 in one signed column would overflow DuckDB's
    // checked <<). The PNG encode/decode the engine really performs is
    // pinned by q77; here the oracle pins the sampling + threshold + pack
    "q79_image_ahash" ->
      """WITH px AS (
        |  SELECT doc_id, UNNEST(generate_series(0, 63)) AS pos FROM documents
        |), v AS (
        |  SELECT doc_id, pos, (doc_id * (2*pos + 1)) % 256 AS val FROM px
        |), s AS (
        |  SELECT doc_id, SUM(val) AS total FROM v GROUP BY doc_id
        |), b AS (
        |  SELECT v.doc_id, v.pos, CASE WHEN 64*v.val > s.total THEN 1 ELSE 0 END AS bit
        |  FROM v JOIN s USING (doc_id)
        |)
        |SELECT doc_id,
        |  CAST(SUM(CASE WHEN pos >= 32 THEN bit * (1::BIGINT << (pos-32))
        |    ELSE 0 END) AS BIGINT) AS ahash_hi,
        |  CAST(SUM(CASE WHEN pos < 32 THEN bit * (1::BIGINT << pos)
        |    ELSE 0 END) AS BIGINT) AS ahash_lo
        |FROM b GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // image near-dup pairs: recompute the q79 hashes, then mirror the
    // banded join (four 16-bit bands from the hi/lo halves) and the
    // hamming ≤ 6 verify via bit_count(xor) per half
    "q80_image_neardup" ->
      """WITH px AS (
        |  SELECT doc_id, UNNEST(generate_series(0, 63)) AS pos FROM documents
        |), v AS (
        |  SELECT doc_id, pos, (doc_id * (2*pos + 1)) % 256 AS val FROM px
        |), s AS (
        |  SELECT doc_id, SUM(val) AS total FROM v GROUP BY doc_id
        |), b AS (
        |  SELECT v.doc_id, v.pos, CASE WHEN 64*v.val > s.total THEN 1 ELSE 0 END AS bit
        |  FROM v JOIN s USING (doc_id)
        |), hashes AS (
        |  SELECT doc_id,
        |    CAST(SUM(CASE WHEN pos >= 32 THEN bit * (1::BIGINT << (pos-32))
        |      ELSE 0 END) AS BIGINT) AS hi,
        |    CAST(SUM(CASE WHEN pos < 32 THEN bit * (1::BIGINT << pos)
        |      ELSE 0 END) AS BIGINT) AS lo
        |  FROM b GROUP BY doc_id
        |), bands AS (
        |  SELECT doc_id, hi, lo, band_idx,
        |    CASE band_idx WHEN 0 THEN lo % 65536 WHEN 1 THEN lo // 65536
        |                  WHEN 2 THEN hi % 65536 ELSE hi // 65536 END AS band_val
        |  FROM hashes, (SELECT UNNEST(generate_series(0, 3)) AS band_idx)
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS id1, c.doc_id AS id2,
        |    a.hi AS hi1, a.lo AS lo1, c.hi AS hi2, c.lo AS lo2
        |  FROM bands a JOIN bands c
        |    ON a.band_idx = c.band_idx AND a.band_val = c.band_val
        |    AND a.doc_id < c.doc_id
        |)
        |SELECT id1, id2,
        |  CAST(bit_count(xor(hi1, hi2)) + bit_count(xor(lo1, lo2)) AS INTEGER) AS hamming
        |FROM cand
        |WHERE bit_count(xor(hi1, hi2)) + bit_count(xor(lo1, lo2)) <= 6
        |ORDER BY id1, id2""".stripMargin,

    // audio fingerprint: mirror the engine's energy-envelope pipeline in
    // closed form — 160 synthetic samples (doc_id·(i+3)) mod 256, 32 equal
    // windows of 5, bit = 32·window-energy > clip-total (the equal-window
    // reduction of the exact cross-multiply rule; samples are non-negative
    // so |s| = s), packed little-endian into one BIGINT (bit 31 max —
    // never the sign bit). The WAV encode/decode the engine really
    // performs is pinned by q76; here the oracle pins windowing +
    // threshold + packing
    "q81_audio_fingerprint" ->
      """WITH s AS (
        |  SELECT doc_id, UNNEST(generate_series(0, 159)) AS i FROM documents
        |), v AS (
        |  SELECT doc_id, i // 5 AS w, (doc_id * (i + 3)) % 256 AS val FROM s
        |), e AS (
        |  SELECT doc_id, w, SUM(val) AS ew FROM v GROUP BY doc_id, w
        |), t AS (
        |  SELECT doc_id, SUM(ew) AS total FROM e GROUP BY doc_id
        |)
        |SELECT e.doc_id AS doc_id,
        |  CAST(SUM(CASE WHEN 32*e.ew > t.total THEN (1::BIGINT << w)
        |    ELSE 0 END) AS BIGINT) AS afp
        |FROM e JOIN t ON e.doc_id = t.doc_id GROUP BY e.doc_id
        |ORDER BY doc_id""".stripMargin,

    // audio near-dup pairs: recompute the q81 fingerprints, then mirror
    // the four 8-bit bands and the hamming ≤ 3 verify via bit_count(xor)
    "q82_audio_neardup" ->
      """WITH s AS (
        |  SELECT doc_id, UNNEST(generate_series(0, 159)) AS i FROM documents
        |), v AS (
        |  SELECT doc_id, i // 5 AS w, (doc_id * (i + 3)) % 256 AS val FROM s
        |), e AS (
        |  SELECT doc_id, w, SUM(val) AS ew FROM v GROUP BY doc_id, w
        |), t AS (
        |  SELECT doc_id, SUM(ew) AS total FROM e GROUP BY doc_id
        |), fp AS (
        |  SELECT e.doc_id AS doc_id,
        |    CAST(SUM(CASE WHEN 32*e.ew > t.total THEN (1::BIGINT << w)
        |      ELSE 0 END) AS BIGINT) AS afp
        |  FROM e JOIN t ON e.doc_id = t.doc_id GROUP BY e.doc_id
        |), bands AS (
        |  SELECT doc_id, afp, band_idx,
        |    (afp // (1::BIGINT << (8*band_idx))) % 256 AS band_val
        |  FROM fp, (SELECT UNNEST(generate_series(0, 3)) AS band_idx)
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS id1, c.doc_id AS id2,
        |    a.afp AS fp1, c.afp AS fp2
        |  FROM bands a JOIN bands c
        |    ON a.band_idx = c.band_idx AND a.band_val = c.band_val
        |    AND a.doc_id < c.doc_id
        |)
        |SELECT id1, id2, CAST(bit_count(xor(fp1, fp2)) AS INTEGER) AS hamming
        |FROM cand WHERE bit_count(xor(fp1, fp2)) <= 3
        |ORDER BY id1, id2""".stripMargin,

    // video fingerprint: mirror per-frame aHash + majority pooling in
    // closed form — 4 frames, frame f sampled pixel (offset 2·pos) =
    // (doc_id·(2·pos+1) + 17·f) mod 256, per-frame bit = 64·v > frame
    // sum, clip bit = per-bit majority (2·count ≥ 4), packed hi/lo as in
    // q79. The multi-frame P5 container decode the engine really performs
    // is pinned by q59's codec specs; here the oracle pins framing +
    // thresholds + pooling
    "q83_video_fingerprint" ->
      """WITH px AS (
        |  SELECT doc_id, f, UNNEST(generate_series(0, 63)) AS pos
        |  FROM documents, (SELECT UNNEST(generate_series(0, 3)) AS f)
        |), v AS (
        |  SELECT doc_id, f, pos, (doc_id * (2*pos + 1) + 17*f) % 256 AS val FROM px
        |), fs AS (
        |  SELECT doc_id, f, SUM(val) AS fsum FROM v GROUP BY doc_id, f
        |), fb AS (
        |  SELECT v.doc_id, v.f, v.pos,
        |    CASE WHEN 64*v.val > fs.fsum THEN 1 ELSE 0 END AS bit
        |  FROM v JOIN fs ON v.doc_id = fs.doc_id AND v.f = fs.f
        |), cnt AS (
        |  SELECT doc_id, pos, SUM(bit) AS c FROM fb GROUP BY doc_id, pos
        |), cb AS (
        |  SELECT doc_id, pos, CASE WHEN 2*c >= 4 THEN 1 ELSE 0 END AS bit FROM cnt
        |)
        |SELECT doc_id,
        |  CAST(SUM(CASE WHEN pos >= 32 THEN bit * (1::BIGINT << (pos-32))
        |    ELSE 0 END) AS BIGINT) AS ahash_hi,
        |  CAST(SUM(CASE WHEN pos < 32 THEN bit * (1::BIGINT << pos)
        |    ELSE 0 END) AS BIGINT) AS ahash_lo,
        |  CAST(4 AS BIGINT) AS n_frames
        |FROM cb GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // video near-dup pairs: recompute the q83 clip hashes, then the q80
    // band + hamming mirror (video rides the image pair tier unchanged)
    "q84_video_neardup" ->
      """WITH px AS (
        |  SELECT doc_id, f, UNNEST(generate_series(0, 63)) AS pos
        |  FROM documents, (SELECT UNNEST(generate_series(0, 3)) AS f)
        |), v AS (
        |  SELECT doc_id, f, pos, (doc_id * (2*pos + 1) + 17*f) % 256 AS val FROM px
        |), fs AS (
        |  SELECT doc_id, f, SUM(val) AS fsum FROM v GROUP BY doc_id, f
        |), fb AS (
        |  SELECT v.doc_id, v.f, v.pos,
        |    CASE WHEN 64*v.val > fs.fsum THEN 1 ELSE 0 END AS bit
        |  FROM v JOIN fs ON v.doc_id = fs.doc_id AND v.f = fs.f
        |), cnt AS (
        |  SELECT doc_id, pos, SUM(bit) AS c FROM fb GROUP BY doc_id, pos
        |), cb AS (
        |  SELECT doc_id, pos, CASE WHEN 2*c >= 4 THEN 1 ELSE 0 END AS bit FROM cnt
        |), hashes AS (
        |  SELECT doc_id,
        |    CAST(SUM(CASE WHEN pos >= 32 THEN bit * (1::BIGINT << (pos-32))
        |      ELSE 0 END) AS BIGINT) AS hi,
        |    CAST(SUM(CASE WHEN pos < 32 THEN bit * (1::BIGINT << pos)
        |      ELSE 0 END) AS BIGINT) AS lo
        |  FROM cb GROUP BY doc_id
        |), bands AS (
        |  SELECT doc_id, hi, lo, band_idx,
        |    CASE band_idx WHEN 0 THEN lo % 65536 WHEN 1 THEN lo // 65536
        |                  WHEN 2 THEN hi % 65536 ELSE hi // 65536 END AS band_val
        |  FROM hashes, (SELECT UNNEST(generate_series(0, 3)) AS band_idx)
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS id1, c.doc_id AS id2,
        |    a.hi AS hi1, a.lo AS lo1, c.hi AS hi2, c.lo AS lo2
        |  FROM bands a JOIN bands c
        |    ON a.band_idx = c.band_idx AND a.band_val = c.band_val
        |    AND a.doc_id < c.doc_id
        |)
        |SELECT id1, id2,
        |  CAST(bit_count(xor(hi1, hi2)) + bit_count(xor(lo1, lo2)) AS INTEGER) AS hamming
        |FROM cand
        |WHERE bit_count(xor(hi1, hi2)) + bit_count(xor(lo1, lo2)) <= 6
        |ORDER BY id1, id2""".stripMargin,

    // image dedup survivors: the q80 hash + banded-pair recipe closed into
    // components by the q68-style recursive reachability; survivors = every
    // doc not dropped (min id per perceptual cluster survives, unpaired
    // docs are their own singletons)
    "q85_image_dedup" ->
      """WITH RECURSIVE px AS (
        |  SELECT doc_id, UNNEST(generate_series(0, 63)) AS pos FROM documents
        |), v AS (
        |  SELECT doc_id, pos, (doc_id * (2*pos + 1)) % 256 AS val FROM px
        |), s AS (
        |  SELECT doc_id, SUM(val) AS total FROM v GROUP BY doc_id
        |), b AS (
        |  SELECT v.doc_id, v.pos, CASE WHEN 64*v.val > s.total THEN 1 ELSE 0 END AS bit
        |  FROM v JOIN s USING (doc_id)
        |), hashes AS (
        |  SELECT doc_id,
        |    CAST(SUM(CASE WHEN pos >= 32 THEN bit * (1::BIGINT << (pos-32))
        |      ELSE 0 END) AS BIGINT) AS hi,
        |    CAST(SUM(CASE WHEN pos < 32 THEN bit * (1::BIGINT << pos)
        |      ELSE 0 END) AS BIGINT) AS lo
        |  FROM b GROUP BY doc_id
        |), bands AS (
        |  SELECT doc_id, hi, lo, band_idx,
        |    CASE band_idx WHEN 0 THEN lo % 65536 WHEN 1 THEN lo // 65536
        |                  WHEN 2 THEN hi % 65536 ELSE hi // 65536 END AS band_val
        |  FROM hashes, (SELECT UNNEST(generate_series(0, 3)) AS band_idx)
        |), pairs AS (
        |  SELECT DISTINCT a.doc_id AS id1, c.doc_id AS id2
        |  FROM bands a JOIN bands c
        |    ON a.band_idx = c.band_idx AND a.band_val = c.band_val
        |    AND a.doc_id < c.doc_id
        |  WHERE bit_count(xor(a.hi, c.hi)) + bit_count(xor(a.lo, c.lo)) <= 6
        |), edges AS (
        |  SELECT id1 AS a, id2 AS e2 FROM pairs UNION SELECT id2, id1 FROM pairs
        |), reach AS (
        |  SELECT a AS id, e2 AS r FROM edges
        |  UNION
        |  SELECT reach.id, e.e2 FROM reach JOIN edges e ON reach.r = e.a
        |), comp AS (
        |  SELECT id, LEAST(id, MIN(r)) AS comp FROM reach GROUP BY id
        |), dropped AS (SELECT id FROM comp WHERE comp <> id)
        |SELECT doc_id FROM documents dd
        |WHERE NOT EXISTS (SELECT 1 FROM dropped c WHERE c.id = dd.doc_id)
        |ORDER BY doc_id""".stripMargin,

    // BMP decode round-trip: q77's closed-form ramp recipe, multiplier 13 —
    // the engine really writes + sniffs + decodes JDK BMP bytes through
    // AutoImageCodec; the oracle recomputes the 200-consecutive-residue
    // stats starting at a = 13·id mod 256
    "q86_bmp_decode" ->
      """SELECT doc_id, 20 AS width, 10 AS height,
        |  200*a + 19900 - 256*GREATEST(a - 56, 0) AS sum_px
        |FROM (SELECT doc_id, (doc_id*13) % 256 AS a FROM documents)
        |ORDER BY doc_id""".stripMargin,

    // GUARD-ACTIVE image near-dup pairs: the oracle mirrors
    // guardedBandPairs' star-collapse at maxBucketSize = 6 — per-band
    // bucket counts; buckets ≤ 6 pair plainly; oversized buckets collapse
    // to (min-id rep per fingerprint → stars) + a rep-level clique where
    // ≤ 6 distinct fingerprints share the bucket (the sub-split level
    // emits nothing here: sub = fp, so its groups are singletons by
    // construction); then the same DISTINCT + hamming ≤ 6 verify as q80
    "q87_guarded_image_neardup" ->
      """WITH px AS (
        |  SELECT doc_id, UNNEST(generate_series(0, 63)) AS pos FROM documents
        |), v AS (
        |  SELECT doc_id, pos, (doc_id * (2*pos + 1)) % 256 AS val FROM px
        |), s AS (
        |  SELECT doc_id, SUM(val) AS total FROM v GROUP BY doc_id
        |), b AS (
        |  SELECT v.doc_id, v.pos, CASE WHEN 64*v.val > s.total THEN 1 ELSE 0 END AS bit
        |  FROM v JOIN s USING (doc_id)
        |), hashes AS (
        |  SELECT doc_id,
        |    CAST(SUM(CASE WHEN pos >= 32 THEN bit * (1::BIGINT << (pos-32))
        |      ELSE 0 END) AS BIGINT) AS hi,
        |    CAST(SUM(CASE WHEN pos < 32 THEN bit * (1::BIGINT << pos)
        |      ELSE 0 END) AS BIGINT) AS lo
        |  FROM b GROUP BY doc_id
        |), bands AS (
        |  SELECT doc_id, hi, lo, band_idx,
        |    CASE band_idx WHEN 0 THEN lo % 65536 WHEN 1 THEN lo // 65536
        |                  WHEN 2 THEN hi % 65536 ELSE hi // 65536 END AS band_val
        |  FROM hashes, (SELECT UNNEST(generate_series(0, 3)) AS band_idx)
        |), bcnt AS (
        |  SELECT band_idx, band_val, COUNT(*) AS n FROM bands GROUP BY 1, 2
        |), small AS (
        |  SELECT b2.* FROM bands b2 JOIN bcnt USING (band_idx, band_val) WHERE n <= 6
        |), normal AS (
        |  SELECT a.doc_id AS id1, c.doc_id AS id2
        |  FROM small a JOIN small c USING (band_idx, band_val)
        |  WHERE a.doc_id < c.doc_id
        |), big AS (
        |  SELECT b2.* FROM bands b2 JOIN bcnt USING (band_idx, band_val) WHERE n > 6
        |), grp AS (
        |  SELECT band_idx, band_val, hi, lo, MIN(doc_id) AS rep
        |  FROM big GROUP BY 1, 2, 3, 4
        |), stars AS (
        |  SELECT g.rep AS id1, b2.doc_id AS id2
        |  FROM big b2 JOIN grp g USING (band_idx, band_val, hi, lo)
        |  WHERE b2.doc_id <> g.rep
        |), rcnt AS (
        |  SELECT band_idx, band_val, COUNT(*) AS r FROM grp GROUP BY 1, 2
        |), reps AS (
        |  SELECT g.* FROM grp g JOIN rcnt USING (band_idx, band_val) WHERE r <= 6
        |), reppairs AS (
        |  SELECT a.rep AS id1, c.rep AS id2
        |  FROM reps a JOIN reps c USING (band_idx, band_val)
        |  WHERE a.rep < c.rep
        |), cand AS (
        |  SELECT DISTINCT id1, id2 FROM (
        |    SELECT id1, id2 FROM normal
        |    UNION ALL SELECT id1, id2 FROM stars
        |    UNION ALL SELECT id1, id2 FROM reppairs)
        |)
        |SELECT cand.id1, cand.id2,
        |  CAST(bit_count(xor(h1.hi, h2.hi)) + bit_count(xor(h1.lo, h2.lo))
        |    AS INTEGER) AS hamming
        |FROM cand
        |JOIN hashes h1 ON h1.doc_id = cand.id1
        |JOIN hashes h2 ON h2.doc_id = cand.id2
        |WHERE bit_count(xor(h1.hi, h2.hi)) + bit_count(xor(h1.lo, h2.lo)) <= 6
        |ORDER BY id1, id2""".stripMargin,

    // GIF decode round-trip: q86's closed-form ramp recipe, multiplier 17 —
    // the engine really writes + sniffs + LZW-decodes JDK GIF bytes through
    // AutoImageCodec; lossless, so the residue arithmetic holds exactly
    "q88_gif_decode" ->
      """SELECT doc_id, 20 AS width, 10 AS height,
        |  200*a + 19900 - 256*GREATEST(a - 56, 0) AS sum_px
        |FROM (SELECT doc_id, (doc_id*17) % 256 AS a FROM documents)
        |ORDER BY doc_id""".stripMargin,

    // strided video fingerprint: q83's per-frame recipe restricted to the
    // sampled frames f ∈ {0, 2} (frameStride = 2 over the 4-frame clip),
    // majority over the 2 hashed frames (2·c ≥ 2), n_frames = hashed count
    "q89_video_strided" ->
      """WITH px AS (
        |  SELECT doc_id, f, UNNEST(generate_series(0, 63)) AS pos
        |  FROM documents, (SELECT UNNEST([0, 2]) AS f)
        |), v AS (
        |  SELECT doc_id, f, pos, (doc_id * (2*pos + 1) + 17*f) % 256 AS val FROM px
        |), fs AS (
        |  SELECT doc_id, f, SUM(val) AS fsum FROM v GROUP BY doc_id, f
        |), fb AS (
        |  SELECT v.doc_id, v.f, v.pos,
        |    CASE WHEN 64*v.val > fs.fsum THEN 1 ELSE 0 END AS bit
        |  FROM v JOIN fs ON v.doc_id = fs.doc_id AND v.f = fs.f
        |), cnt AS (
        |  SELECT doc_id, pos, SUM(bit) AS c FROM fb GROUP BY doc_id, pos
        |), cb AS (
        |  SELECT doc_id, pos, CASE WHEN 2*c >= 2 THEN 1 ELSE 0 END AS bit FROM cnt
        |)
        |SELECT doc_id,
        |  CAST(SUM(CASE WHEN pos >= 32 THEN bit * (1::BIGINT << (pos-32))
        |    ELSE 0 END) AS BIGINT) AS ahash_hi,
        |  CAST(SUM(CASE WHEN pos < 32 THEN bit * (1::BIGINT << pos)
        |    ELSE 0 END) AS BIGINT) AS ahash_lo,
        |  CAST(2 AS BIGINT) AS n_frames
        |FROM cb GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // GUARD-ACTIVE audio near-dup pairs: q82's fingerprint recipe + the
    // q87-style star-collapse mirror at maxBucketSize = 6 over the four
    // 8-bit bands (sub = fp ⇒ the sub-split level emits nothing; rep
    // cliques only where ≤ 6 distinct fingerprints share the bucket)
    "q90_guarded_audio_neardup" ->
      """WITH s AS (
        |  SELECT doc_id, UNNEST(generate_series(0, 159)) AS i FROM documents
        |), v AS (
        |  SELECT doc_id, i // 5 AS w, (doc_id * (i + 3)) % 256 AS val FROM s
        |), e AS (
        |  SELECT doc_id, w, SUM(val) AS ew FROM v GROUP BY doc_id, w
        |), t AS (
        |  SELECT doc_id, SUM(ew) AS total FROM e GROUP BY doc_id
        |), fp AS (
        |  SELECT e.doc_id AS doc_id,
        |    CAST(SUM(CASE WHEN 32*e.ew > t.total THEN (1::BIGINT << w)
        |      ELSE 0 END) AS BIGINT) AS afp
        |  FROM e JOIN t ON e.doc_id = t.doc_id GROUP BY e.doc_id
        |), bands AS (
        |  SELECT doc_id, afp, band_idx,
        |    (afp // (1::BIGINT << (8*band_idx))) % 256 AS band_val
        |  FROM fp, (SELECT UNNEST(generate_series(0, 3)) AS band_idx)
        |), bcnt AS (
        |  SELECT band_idx, band_val, COUNT(*) AS n FROM bands GROUP BY 1, 2
        |), small AS (
        |  SELECT b2.* FROM bands b2 JOIN bcnt USING (band_idx, band_val) WHERE n <= 6
        |), normal AS (
        |  SELECT a.doc_id AS id1, c.doc_id AS id2
        |  FROM small a JOIN small c USING (band_idx, band_val)
        |  WHERE a.doc_id < c.doc_id
        |), big AS (
        |  SELECT b2.* FROM bands b2 JOIN bcnt USING (band_idx, band_val) WHERE n > 6
        |), grp AS (
        |  SELECT band_idx, band_val, afp, MIN(doc_id) AS rep
        |  FROM big GROUP BY 1, 2, 3
        |), stars AS (
        |  SELECT g.rep AS id1, b2.doc_id AS id2
        |  FROM big b2 JOIN grp g USING (band_idx, band_val, afp)
        |  WHERE b2.doc_id <> g.rep
        |), rcnt AS (
        |  SELECT band_idx, band_val, COUNT(*) AS r FROM grp GROUP BY 1, 2
        |), reps AS (
        |  SELECT g.* FROM grp g JOIN rcnt USING (band_idx, band_val) WHERE r <= 6
        |), reppairs AS (
        |  SELECT a.rep AS id1, c.rep AS id2
        |  FROM reps a JOIN reps c USING (band_idx, band_val)
        |  WHERE a.rep < c.rep
        |), cand AS (
        |  SELECT DISTINCT id1, id2 FROM (
        |    SELECT id1, id2 FROM normal
        |    UNION ALL SELECT id1, id2 FROM stars
        |    UNION ALL SELECT id1, id2 FROM reppairs)
        |)
        |SELECT cand.id1, cand.id2,
        |  CAST(bit_count(xor(f1.afp, f2.afp)) AS INTEGER) AS hamming
        |FROM cand
        |JOIN fp f1 ON f1.doc_id = cand.id1
        |JOIN fp f2 ON f2.doc_id = cand.id2
        |WHERE bit_count(xor(f1.afp, f2.afp)) <= 3
        |ORDER BY id1, id2""".stripMargin,

    // audio resample round-trip: the engine decodes the q81 clip, picks
    // nearest frames at 3 kHz (output frame j ← source ⌊8j/3⌋ of the
    // 8 kHz original), re-encodes canonical RIFF, decodes again, and
    // aggregates exact stats; the oracle recomputes the 60 picked samples
    // ((id·(⌊8j/3⌋+3)) mod 256, non-negative so peak = max) in closed form
    "q91_audio_resample" ->
      """WITH j AS (
        |  SELECT doc_id, UNNEST(generate_series(0, 59)) AS j FROM documents
        |), v AS (
        |  SELECT doc_id, (doc_id * ((8*j) // 3 + 3)) % 256 AS val FROM j
        |)
        |SELECT doc_id, 3000 AS sample_rate, 1 AS channels,
        |  CAST(60 AS BIGINT) AS n_samples, CAST(20 AS BIGINT) AS duration_ms,
        |  CAST(SUM(val) AS BIGINT) AS sum_samples,
        |  CAST(MAX(val) AS INTEGER) AS peak
        |FROM v GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // capacity-overflow packing: each doc splits into ⌈n/200⌉ sequences
    // (full 200-token chunks + remainder; 0-token docs keep one 0-token
    // sequence), then the SEQUENCES bin by the q60 cumulative-sum rule
    // ordered by (doc_id, seq_idx) within each source shard. Token
    // conservation (Σ seq_tokens = n_chars per doc) and the ≤-capacity
    // piece bound are structural in both formulations.
    "q78_pack_split" ->
      """WITH seqs AS (
        |  SELECT doc_id, source, n_chars,
        |    GREATEST(CAST(CEIL(n_chars / 200.0) AS BIGINT), 1) AS nseq,
        |    UNNEST(generate_series(0,
        |      GREATEST(CAST(CEIL(n_chars / 200.0) AS BIGINT), 1) - 1)) AS seq_idx
        |  FROM documents
        |), st AS (
        |  SELECT doc_id, source, seq_idx,
        |    CAST(CASE WHEN seq_idx < nseq - 1 THEN 200
        |      ELSE n_chars - (nseq - 1) * 200 END AS BIGINT) AS seq_tokens
        |  FROM seqs
        |)
        |SELECT doc_id, source, seq_idx, seq_tokens,
        |  CAST(FLOOR((SUM(seq_tokens) OVER (PARTITION BY source
        |    ORDER BY doc_id, seq_idx
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - seq_tokens)
        |    / 200.0) AS BIGINT) AS bin_id
        |FROM st ORDER BY doc_id, seq_idx""".stripMargin,

    // shard-local packing: bin = floor(running-total-BEFORE-this-row /
    // capacity) — the cumulative-sum formulation both engines compute in
    // one window pass (a doc crossing the boundary stays in its start bin)
    "q60_pack_bins" ->
      """SELECT doc_id, source,
        |  CAST(FLOOR((SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_chars)
        |    / 2000.0) AS BIGINT) AS bin_id
        |FROM documents ORDER BY doc_id""".stripMargin,

    // corpus-trained add-1 bigram LM cross-entropy (CCNet-style quality
    // filter): the oracle RETRAINS the identical model — bigram counts,
    // context counts, unigram vocab size — and replays the smoothing
    // arithmetic. Each position's ln P is a double of exact integer
    // arguments rounded to 6 dp into DECIMAL(18,6); per-doc sums are then
    // exact, and cross_entropy = exact-decimal → double → one IEEE
    // division, shipped UNROUNDED (bit-identical across engines; rounding
    // the quotient flipped half-boundary rows between the two engines'
    // round implementations at 10×). ppl keeps round-6 to absorb libm
    // exp() ulp differences.
    "q92_lm_quality" ->
      """WITH base AS (SELECT doc_id,
        |    string_split_regex(lower(trim(coalesce(text, ''))), '\s+') AS l
        |  FROM documents),
        |tok AS (SELECT unnest(l) AS w FROM base),
        |v AS (SELECT count(DISTINCT w) AS v FROM tok WHERE w <> ''),
        |pos AS (SELECT doc_id, l, unnest(range(1, len(l))) AS i FROM base),
        |bi AS (SELECT doc_id, l[i] AS p, l[i + 1] AS w, count(*) AS cnt
        |  FROM pos WHERE l[i] <> '' AND l[i + 1] <> '' GROUP BY 1, 2, 3),
        |bc AS (SELECT p, w, sum(cnt) AS c FROM bi GROUP BY 1, 2),
        |cx AS (SELECT p, sum(c) AS cc FROM bc GROUP BY 1),
        |sc AS (SELECT bi.doc_id, sum(bi.cnt) AS nb,
        |    sum(bi.cnt * CAST(round(ln((bc.c + 1.0) / (cx.cc + 1.0 * v.v)), 6)
        |      AS DECIMAL(18,6))) AS slp
        |  FROM bi, bc, cx, v
        |  WHERE bi.p = bc.p AND bi.w = bc.w AND bc.p = cx.p
        |  GROUP BY 1)
        |SELECT d.doc_id, CAST(coalesce(sc.nb, 0) AS BIGINT) AS n_bigrams,
        |  -CAST(sc.slp AS DOUBLE) / sc.nb AS cross_entropy,
        |  round(exp(-CAST(sc.slp AS DOUBLE) / sc.nb), 6) AS ppl
        |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // Interpolated Kneser-Ney bigram perplexity (q104): same corpus counts
    // as q92, plus the continuation statistics (n1p = distinct
    // continuations of p, n1w = distinct left contexts of w, n1all =
    // distinct bigrams). The KN probability is spelled in the SAME fixed
    // operation order as the engine — ((c − D) + D·n1p·n1w/n1all)/cc —
    // so every per-position double is IEEE-identical before round-6.
    // bi/bc are MATERIALIZED (multiple consumers — the ADVICE r13
    // re-inlining hazard: without the hint DuckDB re-runs the corpus
    // tokenize once per reference).
    "q104_lm_kn" ->
      """WITH base AS (SELECT doc_id,
        |    string_split_regex(lower(trim(coalesce(text, ''))), '\s+') AS l
        |  FROM documents),
        |pos AS (SELECT doc_id, l, unnest(range(1, len(l))) AS i FROM base),
        |bi AS MATERIALIZED (SELECT doc_id, l[i] AS p, l[i + 1] AS w, count(*) AS cnt
        |  FROM pos WHERE l[i] <> '' AND l[i + 1] <> '' GROUP BY 1, 2, 3),
        |bc AS MATERIALIZED (SELECT p, w, sum(cnt) AS c FROM bi GROUP BY 1, 2),
        |cx AS (SELECT p, sum(c) AS cc, count(*) AS n1p FROM bc GROUP BY 1),
        |cw AS (SELECT w, count(*) AS n1w FROM bc GROUP BY 1),
        |na AS (SELECT count(*) AS n1all FROM bc),
        |sc AS (SELECT bi.doc_id, sum(bi.cnt) AS nb,
        |    sum(bi.cnt * CAST(round(ln(
        |      ((bc.c - 0.75) + 0.75 * cx.n1p * cw.n1w / na.n1all) / cx.cc), 6)
        |      AS DECIMAL(18,6))) AS slp
        |  FROM bi, bc, cx, cw, na
        |  WHERE bi.p = bc.p AND bi.w = bc.w AND bc.p = cx.p AND bc.w = cw.w
        |  GROUP BY 1)
        |SELECT d.doc_id, CAST(coalesce(sc.nb, 0) AS BIGINT) AS n_bigrams,
        |  -CAST(sc.slp AS DOUBLE) / sc.nb AS cross_entropy,
        |  round(exp(-CAST(sc.slp AS DOUBLE) / sc.nb), 6) AS ppl
        |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // DSIR importance-weighted selection: the oracle retrains BOTH hashed
    // unigram distributions (target = src0 docs, raw = whole corpus;
    // 1024 md5 buckets — the engine-portable hash family), rounds each
    // bucket's log-likelihood ratio to DECIMAL(18,6), and replays the
    // exact decimal ranking with the same (score DESC, doc_id) tiebreak —
    // the top-100 boundary is deterministic in both engines.
    "q93_importance_select" -> ImportanceSelectSql,

    // Fixed-reference-model LM scoring: the bigram model trains on the
    // src0 slice only, the whole corpus scores against it through LEFT
    // joins (out-of-model bigram → count 0, context → 0: an OOV position
    // prices at ln(k/(k·V)) = −ln V), V = the SLICE's unigram vocabulary.
    // Same decimal-sum/unrounded-quotient discipline as q92.
    "q101_lm_ref" ->
      """WITH rbase AS (SELECT
        |    string_split_regex(lower(trim(coalesce(text, ''))), '\s+') AS l
        |  FROM documents WHERE source = 'src0'),
        |rtok AS (SELECT unnest(l) AS w FROM rbase),
        |v AS (SELECT count(DISTINCT w) AS v FROM rtok WHERE w <> ''),
        |rpos AS (SELECT l, unnest(range(1, len(l))) AS i FROM rbase),
        |bc AS MATERIALIZED (SELECT l[i] AS p, l[i + 1] AS w, count(*) AS c
        |  FROM rpos WHERE l[i] <> '' AND l[i + 1] <> '' GROUP BY 1, 2),
        |cx AS MATERIALIZED (SELECT p, sum(c) AS cc FROM bc GROUP BY 1),
        |base AS (SELECT doc_id,
        |    string_split_regex(lower(trim(coalesce(text, ''))), '\s+') AS l
        |  FROM documents),
        |pos AS (SELECT doc_id, l, unnest(range(1, len(l))) AS i FROM base),
        |bi AS (SELECT doc_id, l[i] AS p, l[i + 1] AS w, count(*) AS cnt
        |  FROM pos WHERE l[i] <> '' AND l[i + 1] <> '' GROUP BY 1, 2, 3),
        |sc AS (SELECT bi.doc_id, sum(bi.cnt) AS nb,
        |    sum(bi.cnt * CAST(round(ln(
        |      (coalesce(bc.c, 0) + 1.0) /
        |      (coalesce(cx.cc, 0) + 1.0 * (SELECT v FROM v))), 6)
        |      AS DECIMAL(18,6))) AS slp
        |  FROM bi
        |  LEFT JOIN bc ON bi.p = bc.p AND bi.w = bc.w
        |  LEFT JOIN cx ON bi.p = cx.p
        |  GROUP BY 1)
        |SELECT d.doc_id, CAST(coalesce(sc.nb, 0) AS BIGINT) AS n_bigrams,
        |  -CAST(sc.slp AS DOUBLE) / sc.nb AS cross_entropy,
        |  round(exp(-CAST(sc.slp AS DOUBLE) / sc.nb), 6) AS ppl
        |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // The cutoff-path twin of q93 (VERDICT r13 next #3): the engine runs
    // the fully distributed boundary-location + filter + distributed-rank
    // selection instead of TakeOrdered; the SEMANTICS are identical by
    // construction, so the oracle is q93's SQL verbatim — one hash pins
    // the two paths to the same total order on real corpus scores.
    "q100_select_cutoff" -> ImportanceSelectSql,

    // Interpolated Kneser-Ney at the TRIGRAM order (q106): the q104
    // family one order up, with KenLM's adjusted-count derivation — every
    // lower-order statistic is a TYPE count over the trigram table (md =
    // adjusted bigrams N1+(·p2w); cm/cw/na its context, continuation, and
    // total type counts). The probability is spelled in the SAME fixed
    // operation order as the engine —
    // ((c−D) + D·n1p·(((n2−D) + D·nmid·(n1w/n1all))/ccmid))/cc — so every
    // per-position double is IEEE-identical before round-6. tri/tc/md are
    // MATERIALIZED (multiple consumers — the re-inlining hazard).
    "q106_lm_kn3" ->
      """WITH base AS (SELECT doc_id,
        |    string_split_regex(lower(trim(coalesce(text, ''))), '\s+') AS l
        |  FROM documents),
        |pos AS (SELECT doc_id, l, unnest(range(1, len(l) - 1)) AS i FROM base),
        |tri AS MATERIALIZED (SELECT doc_id, l[i] AS p1, l[i + 1] AS p2,
        |    l[i + 2] AS w, count(*) AS cnt
        |  FROM pos WHERE l[i] <> '' AND l[i + 1] <> '' AND l[i + 2] <> ''
        |  GROUP BY 1, 2, 3, 4),
        |tc AS MATERIALIZED (SELECT p1, p2, w, sum(cnt) AS c FROM tri GROUP BY 1, 2, 3),
        |cx AS (SELECT p1, p2, sum(c) AS cc, count(*) AS n1p FROM tc GROUP BY 1, 2),
        |md AS MATERIALIZED (SELECT p2, w, count(*) AS n2 FROM tc GROUP BY 1, 2),
        |cm AS (SELECT p2, sum(n2) AS ccmid, count(*) AS nmid FROM md GROUP BY 1),
        |cw AS (SELECT w, count(*) AS n1w FROM md GROUP BY 1),
        |na AS (SELECT count(*) AS n1all FROM md),
        |sc AS (SELECT tri.doc_id, sum(tri.cnt) AS nb,
        |    sum(tri.cnt * CAST(round(ln(
        |      ((tc.c - 0.75) + 0.75 * cx.n1p *
        |        (((md.n2 - 0.75) + 0.75 * cm.nmid * (cw.n1w / na.n1all)) / cm.ccmid))
        |      / cx.cc), 6)
        |      AS DECIMAL(18,6))) AS slp
        |  FROM tri, tc, cx, md, cm, cw, na
        |  WHERE tri.p1 = tc.p1 AND tri.p2 = tc.p2 AND tri.w = tc.w
        |    AND tc.p1 = cx.p1 AND tc.p2 = cx.p2
        |    AND tc.p2 = md.p2 AND tc.w = md.w
        |    AND md.p2 = cm.p2 AND md.w = cw.w
        |  GROUP BY 1)
        |SELECT d.doc_id, CAST(coalesce(sc.nb, 0) AS BIGINT) AS n_trigrams,
        |  -CAST(sc.slp AS DOUBLE) / sc.nb AS cross_entropy,
        |  round(exp(-CAST(sc.slp AS DOUBLE) / sc.nb), 6) AS ppl
        |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // Interpolated Kneser-Ney at order 4 (q108) and order 5 (q109) — the
    // orders KenLM deploys. The q106 derivation chain extended one TYPE
    // level per order: raw n-gram counts at the top, each adjusted level
    // the type count of the level above grouped on its rightmost columns,
    // unigram continuation at the bottom. The probability is spelled in
    // the engine's exact fixed operation order at every level —
    // ((a_k − D) + D·nctx_k·p_{k-1})/cc_k, innermost a1/tot — so every
    // per-position double is IEEE-identical before round-6. The n-gram
    // and type tables are MATERIALIZED (multiple consumers).
    "q108_lm_kn4" ->
      """WITH base AS (SELECT doc_id,
        |    string_split_regex(lower(trim(coalesce(text, ''))), '\s+') AS l
        |  FROM documents),
        |pos AS (SELECT doc_id, l, unnest(range(1, len(l) - 2)) AS i FROM base),
        |ng AS MATERIALIZED (SELECT doc_id, l[i] AS g0, l[i + 1] AS g1,
        |    l[i + 2] AS g2, l[i + 3] AS g3, count(*) AS cnt
        |  FROM pos WHERE l[i] <> '' AND l[i + 1] <> '' AND l[i + 2] <> ''
        |    AND l[i + 3] <> ''
        |  GROUP BY 1, 2, 3, 4, 5),
        |tc AS MATERIALIZED (SELECT g0, g1, g2, g3, sum(cnt) AS c
        |  FROM ng GROUP BY 1, 2, 3, 4),
        |cx AS (SELECT g0, g1, g2, sum(c) AS cc, count(*) AS n1p
        |  FROM tc GROUP BY 1, 2, 3),
        |a3 AS MATERIALIZED (SELECT g1, g2, g3, count(*) AS a3
        |  FROM tc GROUP BY 1, 2, 3),
        |c3 AS (SELECT g1, g2, sum(a3) AS cc3, count(*) AS nc3
        |  FROM a3 GROUP BY 1, 2),
        |a2 AS MATERIALIZED (SELECT g2, g3, count(*) AS a2 FROM a3 GROUP BY 1, 2),
        |c2 AS (SELECT g2, sum(a2) AS cc2, count(*) AS nc2 FROM a2 GROUP BY 1),
        |a1 AS (SELECT g3, count(*) AS a1 FROM a2 GROUP BY 1),
        |na AS (SELECT count(*) AS tot FROM a2),
        |sc AS (SELECT ng.doc_id, sum(ng.cnt) AS nb,
        |    sum(ng.cnt * CAST(round(ln(
        |      ((tc.c - 0.75) + 0.75 * cx.n1p *
        |        (((a3.a3 - 0.75) + 0.75 * c3.nc3 *
        |          (((a2.a2 - 0.75) + 0.75 * c2.nc2 * (a1.a1 / na.tot)) / c2.cc2))
        |          / c3.cc3))
        |      / cx.cc), 6)
        |      AS DECIMAL(18,6))) AS slp
        |  FROM ng, tc, cx, a3, c3, a2, c2, a1, na
        |  WHERE ng.g0 = tc.g0 AND ng.g1 = tc.g1 AND ng.g2 = tc.g2 AND ng.g3 = tc.g3
        |    AND tc.g0 = cx.g0 AND tc.g1 = cx.g1 AND tc.g2 = cx.g2
        |    AND tc.g1 = a3.g1 AND tc.g2 = a3.g2 AND tc.g3 = a3.g3
        |    AND a3.g1 = c3.g1 AND a3.g2 = c3.g2
        |    AND a3.g2 = a2.g2 AND a3.g3 = a2.g3
        |    AND a2.g2 = c2.g2 AND a2.g3 = a1.g3
        |  GROUP BY 1)
        |SELECT d.doc_id, CAST(coalesce(sc.nb, 0) AS BIGINT) AS n_ngrams,
        |  -CAST(sc.slp AS DOUBLE) / sc.nb AS cross_entropy,
        |  round(exp(-CAST(sc.slp AS DOUBLE) / sc.nb), 6) AS ppl
        |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "q109_lm_kn5" ->
      """WITH base AS (SELECT doc_id,
        |    string_split_regex(lower(trim(coalesce(text, ''))), '\s+') AS l
        |  FROM documents),
        |pos AS (SELECT doc_id, l, unnest(range(1, len(l) - 3)) AS i FROM base),
        |ng AS MATERIALIZED (SELECT doc_id, l[i] AS g0, l[i + 1] AS g1,
        |    l[i + 2] AS g2, l[i + 3] AS g3, l[i + 4] AS g4, count(*) AS cnt
        |  FROM pos WHERE l[i] <> '' AND l[i + 1] <> '' AND l[i + 2] <> ''
        |    AND l[i + 3] <> '' AND l[i + 4] <> ''
        |  GROUP BY 1, 2, 3, 4, 5, 6),
        |tc AS MATERIALIZED (SELECT g0, g1, g2, g3, g4, sum(cnt) AS c
        |  FROM ng GROUP BY 1, 2, 3, 4, 5),
        |cx AS (SELECT g0, g1, g2, g3, sum(c) AS cc, count(*) AS n1p
        |  FROM tc GROUP BY 1, 2, 3, 4),
        |a4 AS MATERIALIZED (SELECT g1, g2, g3, g4, count(*) AS a4
        |  FROM tc GROUP BY 1, 2, 3, 4),
        |c4 AS (SELECT g1, g2, g3, sum(a4) AS cc4, count(*) AS nc4
        |  FROM a4 GROUP BY 1, 2, 3),
        |a3 AS MATERIALIZED (SELECT g2, g3, g4, count(*) AS a3
        |  FROM a4 GROUP BY 1, 2, 3),
        |c3 AS (SELECT g2, g3, sum(a3) AS cc3, count(*) AS nc3
        |  FROM a3 GROUP BY 1, 2),
        |a2 AS MATERIALIZED (SELECT g3, g4, count(*) AS a2 FROM a3 GROUP BY 1, 2),
        |c2 AS (SELECT g3, sum(a2) AS cc2, count(*) AS nc2 FROM a2 GROUP BY 1),
        |a1 AS (SELECT g4, count(*) AS a1 FROM a2 GROUP BY 1),
        |na AS (SELECT count(*) AS tot FROM a2),
        |sc AS (SELECT ng.doc_id, sum(ng.cnt) AS nb,
        |    sum(ng.cnt * CAST(round(ln(
        |      ((tc.c - 0.75) + 0.75 * cx.n1p *
        |        (((a4.a4 - 0.75) + 0.75 * c4.nc4 *
        |          (((a3.a3 - 0.75) + 0.75 * c3.nc3 *
        |            (((a2.a2 - 0.75) + 0.75 * c2.nc2 * (a1.a1 / na.tot)) / c2.cc2))
        |            / c3.cc3))
        |          / c4.cc4))
        |      / cx.cc), 6)
        |      AS DECIMAL(18,6))) AS slp
        |  FROM ng, tc, cx, a4, c4, a3, c3, a2, c2, a1, na
        |  WHERE ng.g0 = tc.g0 AND ng.g1 = tc.g1 AND ng.g2 = tc.g2
        |    AND ng.g3 = tc.g3 AND ng.g4 = tc.g4
        |    AND tc.g0 = cx.g0 AND tc.g1 = cx.g1 AND tc.g2 = cx.g2 AND tc.g3 = cx.g3
        |    AND tc.g1 = a4.g1 AND tc.g2 = a4.g2 AND tc.g3 = a4.g3 AND tc.g4 = a4.g4
        |    AND a4.g1 = c4.g1 AND a4.g2 = c4.g2 AND a4.g3 = c4.g3
        |    AND a4.g2 = a3.g2 AND a4.g3 = a3.g3 AND a4.g4 = a3.g4
        |    AND a3.g2 = c3.g2 AND a3.g3 = c3.g3
        |    AND a3.g3 = a2.g3 AND a3.g4 = a2.g4
        |    AND a2.g3 = c2.g3 AND a2.g4 = a1.g4
        |  GROUP BY 1)
        |SELECT d.doc_id, CAST(coalesce(sc.nb, 0) AS BIGINT) AS n_ngrams,
        |  -CAST(sc.slp AS DOUBLE) / sc.nb AS cross_entropy,
        |  round(exp(-CAST(sc.slp AS DOUBLE) / sc.nb), 6) AS ppl
        |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // Pruned two-level assignment on a CLUSTERED manifold (q110): the
    // engine runs semAssignPruned (triangle-inequality groups + the
    // adaptive gate, which measures kept ≪ K on this geometry and keeps
    // the pruned path); pruning is EXACT, so the oracle replays the plain
    // exhaustive argmax — round-6 cosine, lower-centroid-id tie-break (the
    // q25/q103 ordering discipline) — over the SAME derived vectors. The
    // derivation literals match SparkEntry.q110 token-for-token: a unit
    // spike at (vec_id mod 8) over ±k/64 integer pseudo-noise, every
    // component a dyadic rational so the float casts agree bit-for-bit.
    "q110_sem_pruned_clustered" ->
      s"""WITH dv AS (SELECT vec_id,
         |    list_transform(range(0, 16), j -> CAST(
         |      CASE WHEN j = vec_id % 8 THEN 1.0
         |           ELSE ((vec_id * (j + 7)) % 11 - 5) / 64.0 END AS FLOAT)) AS vec
         |  FROM embeddings),
         |c AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER)
         |    AS centroid_id, vec AS cvec
         |  FROM (SELECT vec_id, vec FROM dv ORDER BY vec_id LIMIT 64)),
         |scored AS (SELECT dv.vec_id, c.centroid_id,
         |    round(${cosSql("dv.vec", "c.cvec")}, 6) AS cosc
         |  FROM dv CROSS JOIN c)
         |SELECT vec_id, centroid_id, cosc FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY cosc DESC, centroid_id ASC) AS rn FROM scored)
         |WHERE rn = 1 ORDER BY vec_id""".stripMargin,

    // fasttext-family quality-classifier selection (q107): closed-form
    // multinomial Naive Bayes over the q93 hashed-unigram buckets, trained
    // target-vs-REST (the discriminative contrast, where DSIR's
    // denominator is the raw mixture) plus an add-1 doc-count class prior.
    // The oracle retrains both class distributions, rounds each bucket's
    // log-odds weight and the prior to DECIMAL(18,6), and replays the
    // exact decimal ranking with the (score DESC, doc_id) tiebreak.
    "q107_quality_select" ->
      """WITH tok AS (SELECT doc_id, source = 'src0' AS tgt,
        |    unnest(string_split_regex(lower(trim(coalesce(text, ''))), '\s+')) AS w
        |  FROM documents),
        |f AS (SELECT doc_id, tgt,
        |    ('0x' || substr(md5(w), 1, 8))::BIGINT % 1024 AS b, count(*) AS cnt
        |  FROM tok WHERE w <> '' GROUP BY 1, 2, 3),
        |pos AS (SELECT b, sum(cnt) AS cp FROM f WHERE tgt GROUP BY 1),
        |neg AS (SELECT b, sum(cnt) AS cn FROM f WHERE tgt IS NOT TRUE GROUP BY 1),
        |tot AS (SELECT (SELECT coalesce(sum(cp), 0) FROM pos) AS np,
        |               (SELECT coalesce(sum(cn), 0) FROM neg) AS nn),
        |prior AS (SELECT CAST(round(ln(
        |    (sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) + 1.0) /
        |    (sum(CASE WHEN source = 'src0' THEN 0 ELSE 1 END) + 1.0)), 6)
        |  AS DECIMAL(18,6)) AS bias FROM documents),
        |model AS (SELECT u.b,
        |    CAST(round(ln((coalesce(pos.cp, 0) + 1.0) / (tot.np + 1024.0)) -
        |               ln((coalesce(neg.cn, 0) + 1.0) / (tot.nn + 1024.0)), 6)
        |      AS DECIMAL(18,6)) AS w8
        |  FROM (SELECT DISTINCT b FROM f) u
        |  LEFT JOIN pos ON u.b = pos.b LEFT JOIN neg ON u.b = neg.b, tot),
        |sc AS (SELECT f.doc_id, prior.bias + sum(f.cnt * model.w8) AS score
        |  FROM f JOIN model ON f.b = model.b, prior GROUP BY 1, prior.bias),
        |top AS (SELECT doc_id, score,
        |    row_number() OVER (ORDER BY score DESC, doc_id) AS rnk FROM sc)
        |SELECT CAST(rnk AS INTEGER) AS rnk, doc_id,
        |  round(CAST(score AS DOUBLE), 6) AS score
        |FROM top WHERE rnk <= 100 ORDER BY rnk""".stripMargin
  )

  /** q93/q100 shared DSIR selection mirror (both engine paths realize the
    * same (score DESC, doc_id) total order; see q100's comment).
    */
  private lazy val ImportanceSelectSql: String =
      """WITH tok AS (SELECT doc_id, source = 'src0' AS tgt,
        |    unnest(string_split_regex(lower(trim(coalesce(text, ''))), '\s+')) AS w
        |  FROM documents),
        |f AS (SELECT doc_id, tgt,
        |    ('0x' || substr(md5(w), 1, 8))::BIGINT % 1024 AS b, count(*) AS cnt
        |  FROM tok WHERE w <> '' GROUP BY 1, 2, 3),
        |raw AS (SELECT b, sum(cnt) AS cr FROM f GROUP BY 1),
        |tg AS (SELECT b, sum(cnt) AS ct FROM f WHERE tgt GROUP BY 1),
        |tot AS (SELECT (SELECT sum(cr) FROM raw) AS nr,
        |               (SELECT coalesce(sum(ct), 0) FROM tg) AS nt),
        |model AS (SELECT raw.b,
        |    CAST(round(ln((coalesce(tg.ct, 0) + 1.0) / (tot.nt + 1024.0)) -
        |               ln((raw.cr + 1.0) / (tot.nr + 1024.0)), 6)
        |      AS DECIMAL(18,6)) AS lr
        |  FROM raw LEFT JOIN tg ON raw.b = tg.b, tot),
        |sc AS (SELECT f.doc_id, sum(f.cnt * model.lr) AS score
        |  FROM f JOIN model ON f.b = model.b GROUP BY 1),
        |top AS (SELECT doc_id, score,
        |    row_number() OVER (ORDER BY score DESC, doc_id) AS rnk FROM sc)
        |SELECT CAST(rnk AS INTEGER) AS rnk, doc_id,
        |  round(CAST(score AS DOUBLE), 6) AS score
        |FROM top WHERE rnk <= 100 ORDER BY rnk""".stripMargin
}
