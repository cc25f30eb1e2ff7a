package graft.functions

import java.security.MessageDigest

/** Deterministic RFC 4122 version-1 (time-based) UUIDs.
  *
  * The reference mints a v1 TimeUUID per message from its `created_at`
  * (reference `etl/utils/cassandra_id_mapper.py:116-138`) and caches it per
  * mongo_id; the wall-clock/node parts make its output unreproducible across
  * runs. We keep the contract that matters — the 60-bit timestamp orders ids
  * by event time (target DDL `backups/create_scylla_database.cql:46` clusters
  * `ORDER BY message_id DESC`) — and make the clock-sequence + node fields a
  * hash of a caller-supplied seed (the mongo_id), so regeneration is stable
  * and oracle-testable (SURVEY.md §7.4 risk 2).
  */
object TimeUuid {

  /** 100-ns intervals between 1582-10-15 (Gregorian epoch) and 1970-01-01. */
  val GregorianOffset100Ns: Long = 122192928000000000L

  /** @param epochMicros event time in microseconds since the Unix epoch
    * @param seed        entropy source for clockseq+node (e.g. the source id)
    */
  def compute(epochMicros: Long, seed: String): String = {
    val t = epochMicros * 10L + GregorianOffset100Ns // 100-ns units
    val timeLow = t & 0xffffffffL
    val timeMid = (t >>> 32) & 0xffffL
    val timeHiVersion = ((t >>> 48) & 0x0fffL) | 0x1000L

    val md = MessageDigest.getInstance("SHA-1").digest(seed.getBytes("UTF-8"))
    val clockSeq = (((md(0) & 0x3f) | 0x80) << 8) | (md(1) & 0xff) // variant 10xx
    val node = ((md(2) & 0xffL) << 40) | ((md(3) & 0xffL) << 32) |
      ((md(4) & 0xffL) << 24) | ((md(5) & 0xffL) << 16) |
      ((md(6) & 0xffL) << 8) | (md(7) & 0xffL)

    f"$timeLow%08x-$timeMid%04x-$timeHiVersion%04x-$clockSeq%04x-$node%012x"
  }

  /** Inverse of the timestamp part — lets tests assert order preservation. */
  def extractEpochMicros(uuid: String): Long = {
    val p = uuid.split("-")
    val timeLow = java.lang.Long.parseLong(p(0), 16)
    val timeMid = java.lang.Long.parseLong(p(1), 16)
    val timeHi = java.lang.Long.parseLong(p(2), 16) & 0x0fffL
    val t = (timeHi << 48) | (timeMid << 32) | timeLow
    (t - GregorianOffset100Ns) / 10L
  }
}
