package graft

/** The planted doc-inside-doc pair for q102 (VERDICT r13 next #5): on the
  * driver's synthetic `documents` corpus, production-order containment
  * (curate first, then hunt near-supersets) verifiably finds NOTHING —
  * every raw containment pair is a symmetric near-dup curation removes
  * first, so q69/q72 pass on empty results and the containment stage has
  * never dropped a doc in an oracle-checked production-order run. The
  * test corpus is read-only, so the structure is planted IN-QUERY: two
  * deterministic literal docs unioned onto `documents` in both engines
  * (the Spark query and the DuckDB oracle reference these exact strings).
  *
  * Construction, chosen so the pair SURVIVES curation and TRIPS
  * containment:
  *   - the superset is the contained text plus a same-length extension of
  *     disjoint vocabulary → unigram Jaccard ≈ 0.48 < the 0.6 near-dup
  *     bar (curation keeps both), while word-bigram containment
  *     C(contained → superset) = 1.0 ≥ 0.8 (the contained text appears
  *     verbatim, so every bigram shingle survives, and the doc-inside-doc
  *     detector must fire);
  *   - the contained doc's shingles have document frequency 2 (itself +
  *     the superset) — rare, so its anchor top-10 all hit the superset's
  *     postings (≥ the 4-hit rule); the superset's own anchors are its
  *     df=1 extension shingles, which hit nothing, so only the
  *     (contained, superset) direction verifies;
  *   - plain lowercase English with stopwords: passes the quality and
  *     language gates at default thresholds; vocabulary is distinct
  *     enough from the synthetic corpus that no cross-pair forms;
  *   - ids sit far above any scale factor's id range, and the texts
  *     contain no quote characters (they embed in SQL literals verbatim).
  */
object PlantedFixture {

  val ContainedId: Long = 9000001L
  val SupersetId: Long = 9000002L

  val ContainedText: String =
    "the amber zircon caravan moved across the dusty plateau and seven " +
      "silent cartographers charted every winding canyon before dusk while " +
      "the patient quartermaster counted crates of juniper resin near the " +
      "northern trailhead under a pale harvest moon"

  private val Extension: String =
    "meanwhile nine weathered lighthouse keepers polished brass lanterns " +
      "along the eastern breakwater and traded salted mackerel with roaming " +
      "tinsmiths who sold copper kettles woven baskets and painted compasses " +
      "to curious pilgrims wandering toward the distant basalt cliffs beyond " +
      "the foggy harbor gates"

  val SupersetText: String = ContainedText + " " + Extension

  /** The two rows as SQL literals (DuckDB dialect), for the oracle's
    * planted UNION — kept here so the engine and the oracle can never
    * drift on the fixture.
    */
  def unionSql: String =
    s"SELECT CAST($ContainedId AS BIGINT) AS doc_id, '$ContainedText' AS text" +
      s" UNION ALL SELECT CAST($SupersetId AS BIGINT), '$SupersetText'"
}
