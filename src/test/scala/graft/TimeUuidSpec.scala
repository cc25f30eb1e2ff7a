package graft

import graft.functions.TimeUuid

/** K2: deterministic v1-shaped UUIDs whose 60-bit timestamp preserves event
  * order (target clustering contract `backups/create_scylla_database.cql:46`),
  * with clockseq/node derived from the seed so regeneration is stable
  * (SURVEY.md §7.4 risk 2 — the reference's wall-clock variant is not).
  */
class TimeUuidSpec extends SparkSpecBase {

  test("layout: version 1, RFC variant, canonical text form") {
    val u = TimeUuid.compute(1700000000000000L, "seed")
    assert(u.matches("[0-9a-f]{8}-[0-9a-f]{4}-1[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}"))
  }

  test("timestamp round-trips through the uuid") {
    for (micros <- Seq(0L, 1L, 1700000000000000L, 4102444800000000L))
      assert(TimeUuid.extractEpochMicros(TimeUuid.compute(micros, "x")) === micros)
  }

  test("deterministic in (time, seed); distinct seeds give distinct node bits") {
    val a = TimeUuid.compute(123456789L, "mongo-id-1")
    assert(a === TimeUuid.compute(123456789L, "mongo-id-1"))
    assert(a !== TimeUuid.compute(123456789L, "mongo-id-2"))
  }

  test("extracted timestamps order like event times") {
    val times = Seq(5L, 50L, 500L, 5000L, 50000L)
    val extracted = times.map(t => TimeUuid.extractEpochMicros(TimeUuid.compute(t, "s")))
    assert(extracted === extracted.sorted)
  }

  test("SQL graft_timeuuid coerces int literal to long on codegen and interpreted paths") {
    // graft_timeuuid(42, s): 42 is an IntegerType literal; ExpectsInputTypes
    // must insert the int→long cast so both evaluation modes agree with the
    // Scala-side compute(42L, s) — the interpreted path used to throw
    // ClassCastException without the inputTypes declaration.
    val expected = TimeUuid.compute(42L, "seed")
    for (codegen <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try {
        val got = spark.sql("SELECT graft_timeuuid(42, 'seed') AS u").collect()(0).getString(0)
        assert(got === expected, s"mode=$codegen")
      } finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
