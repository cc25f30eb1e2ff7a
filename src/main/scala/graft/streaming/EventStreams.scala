package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY.md §2.10: the reference is batch-only;
  * this is the engine's incremental extension, not parity). The batch
  * operators in [[graft.operators.Windows]] share these aggregation shapes —
  * pure `DataFrame => DataFrame` stages compose into `foreachBatch` below.
  */
object EventStreams {

  /** Watermarked tumbling-window aggregation over an event stream. Late data
    * beyond `lateness` is dropped; state is bounded by the watermark.
    */
  def tumbling(
      stream: DataFrame,
      tsCol: String,
      width: String,
      lateness: String,
      keys: Seq[String],
      aggs: Seq[Column]): DataFrame = {
    val agged = stream
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), width) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    agged.select(col("window.start").as("window_start") +:
      agged.columns.filter(_ != "window").map(col).toSeq: _*)
  }

  /** Dedup-on-ingest for at-least-once sources: drops repeats of `keys`
    * while bounding state by the watermark — the streaming counterpart of
    * exact dedup (a change-stream redelivering a mongo_id is the normal
    * case, not an error).
    */
  def dedupWithinWatermark(
      stream: DataFrame,
      keys: Seq[String],
      tsCol: String,
      lateness: String): DataFrame =
    stream.withWatermark(tsCol, lateness).dropDuplicatesWithinWatermark(keys)

  /** Watermarked stream-stream inner join on `key` with an event-time bound:
    * right rows must fall within [left.ts, left.ts + windowSeconds]. Both
    * watermarks bound the join state.
    */
  def streamStreamJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      lateness: String,
      windowSeconds: Long): DataFrame = {
    val l = left.withWatermark(leftTs, lateness)
    val r = right.withWatermark(rightTs, lateness)
    l.join(r,
      l(key) === r(key) &&
        r(rightTs) >= l(leftTs) &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $windowSeconds seconds"))
  }

  /** Sliding-window variant. */
  def sliding(
      stream: DataFrame,
      tsCol: String,
      width: String,
      slide: String,
      lateness: String,
      keys: Seq[String],
      aggs: Seq[Column]): DataFrame =
    stream
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), width, slide) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
}

/** Typed input for stateful sessionization. */
final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)

/** Accumulating per-key session state. */
final case class SessionState(
    start: java.sql.Timestamp, last: java.sql.Timestamp, n: Long, sum: Double)

/** Emitted when a session closes (gap exceeded via event-time timeout). */
final case class SessionSummary(
    user_id: Long,
    session_start: java.sql.Timestamp,
    session_end: java.sql.Timestamp,
    n_events: Long,
    sum_value: Double)

object SessionizeStream {
  import org.apache.spark.sql.{Dataset, Encoders}

  /** Gap-based streaming sessionization with `flatMapGroupsWithState` +
    * event-time timeout — the stateful-operator path the batch
    * [[graft.operators.Windows.sessionize]] mirrors with window functions.
    * A session closes when the watermark passes last-event + gap.
    */
  def apply(events: Dataset[SessionEvent], gapSeconds: Long, lateness: String)
      : Dataset[SessionSummary] = {
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[SessionSummary]
    implicit val longEnc = Encoders.scalaLong
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionSummary](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionSummary(userId, s.start, s.last, s.n, s.sum))
          } else {
            val events = batch.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[SessionSummary]
            var cur = state.getOption
            for (e <- events) {
              cur match {
                case Some(s) if e.ts.getTime - s.last.getTime <= gapSeconds * 1000 =>
                  cur = Some(s.copy(last = e.ts, n = s.n + 1, sum = s.sum + e.value))
                case Some(s) =>
                  closed ::= SessionSummary(userId, s.start, s.last, s.n, s.sum)
                  cur = Some(SessionState(e.ts, e.ts, 1, e.value))
                case None =>
                  cur = Some(SessionState(e.ts, e.ts, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last.getTime + gapSeconds * 1000)
            }
            closed.reverseIterator
          }
      }
  }
}

/** One banded document arrival (input to the stateful LSH dedup). */
final case class BandedDoc(doc: Long, band: Int, bucket: String, ts: java.sql.Timestamp)

/** Doc ids seen in one (band, bucket), most recent event time last. */
final case class BucketState(ids: List[Long], lastTs: Long)

/** A near-duplicate candidate pair (id1 < id2). */
final case class CandidatePair(id1: Long, id2: Long)

/** Streaming MinHash-LSH near-duplicate detection — the continuous-ingest
  * counterpart of [[graft.operators.Dedup.minHashLshPairs]]: each arriving
  * document is shingled, MinHash-signed, and banded with the SAME column
  * pipeline as the batch operator; per-(band, bucket) state remembers the
  * ids already seen, so an arrival emits a candidate pair against every
  * prior member of any matching bucket — including matches ACROSS
  * micro-batches, which a per-batch `foreachBatch` dedup cannot see.
  *
  * State is bounded two ways: an event-time timeout expires buckets idle
  * past `idleTimeout` (watermark-driven, like the reference-shaped
  * sessionization above), and `maxBucket` caps members per bucket (an LSH
  * bucket that keeps growing is a degenerate band — at that point its pairs
  * are no longer "near duplicates" but a hash collision flood).
  *
  * A pair colliding in several bands is emitted once PER band (the batch
  * operator's `.distinct()` would need a second stateful op here) —
  * downstream consumers dedup, e.g. [[EventStreams.dedupWithinWatermark]]
  * on (id1, id2) or an idempotent upsert sink.
  */
object StreamingLshDedup {
  import org.apache.spark.sql.{Dataset, Encoders}

  def nearDupCandidates(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      tsCol: String,
      shingleLen: Int = 3,
      bands: Int = 8,
      rowsPerBand: Int = 2,
      lateness: String = "10 minutes",
      idleTimeoutMs: Long = 3600L * 1000,
      maxBucket: Int = 64): Dataset[CandidatePair] = {
    import graft.operators.Dedup
    implicit val bandedEnc = Encoders.product[BandedDoc]
    implicit val stateEnc = Encoders.product[BucketState]
    implicit val outEnc = Encoders.product[CandidatePair]
    implicit val keyEnc = Encoders.tuple(Encoders.scalaInt, Encoders.STRING)

    val sig = Dedup.minHashSignature(
      Dedup.wordShingles(col(textCol), shingleLen), bands * rowsPerBand)
    val banded = docs
      .withWatermark(tsCol, lateness)
      .select(col(idCol).as("doc"), col(tsCol).as("ts"), posexplode(
        Dedup.lshBands(sig, bands, rowsPerBand)))
      .toDF("doc", "ts", "band", "bucket")
      .select("doc", "band", "bucket", "ts")
      .as[BandedDoc]

    banded
      .groupByKey(b => (b.band, b.bucket))
      .flatMapGroupsWithState[BucketState, CandidatePair](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_, arrivals: Iterator[BandedDoc], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(BucketState(Nil, 0L))
            val out = List.newBuilder[CandidatePair]
            for (a <- arrivals.toSeq.sortBy(b => (b.ts.getTime, b.doc))) {
              if (!st.ids.contains(a.doc)) {
                for (other <- st.ids)
                  out += (if (a.doc < other) CandidatePair(a.doc, other)
                  else CandidatePair(other, a.doc))
                st = BucketState((a.doc :: st.ids).take(maxBucket), st.lastTs)
              }
              // duplicate arrivals REFRESH the idle clock too — a bucket fed
              // only redeliveries must not let its timeout fall behind
              st = st.copy(lastTs = math.max(st.lastTs, a.ts.getTime))
            }
            state.update(st)
            // clamp above the current watermark: a timeout timestamp at or
            // below the watermark is rejected by GroupState and would kill
            // the whole query on a long-idle bucket
            state.setTimeoutTimestamp(
              math.max(st.lastTs + idleTimeoutMs, state.getCurrentWatermarkMs() + 1))
            out.result().iterator
          }
      }
  }
}

/** Incremental-migration extension (SURVEY.md §2.10): the batch transform
  * stages are pure `DataFrame => DataFrame`, so a change-stream source can
  * reuse them unchanged inside `foreachBatch` with idempotent upsert-shaped
  * sinks (dedup on mongo_id inside each batch; deterministic ids make
  * re-delivery safe by construction).
  */
object IncrementalMigration {
  import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

  /** `catchUp = true` runs with `Trigger.AvailableNow`: process everything
    * the source has accumulated in rate-limited micro-batches, then STOP —
    * the backfill mode for resuming after downtime (drain the change-stream
    * backlog as a batch job, restart continuous mode afterwards). The
    * checkpoint carries offsets across the mode switch.
    */
  def run(
      changeStream: DataFrame,
      transform: DataFrame => DataFrame,
      sink: (DataFrame, Long) => Unit,
      checkpoint: String,
      catchUp: Boolean = false): StreamingQuery = {
    val writer = changeStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // at-least-once delivery → dedup within the batch; deterministic ids
        // (uuid5/timeuuid) make cross-batch replays converge at the sink
        sink(transform(batch.dropDuplicates("_id")), id)
      }
    (if (catchUp) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }
}
