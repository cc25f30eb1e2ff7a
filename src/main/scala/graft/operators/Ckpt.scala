package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Serialized local checkpoints for operator-path intermediates.
  *
  * `Dataset.localCheckpoint`'s default storage level keeps the cached rows
  * as deserialized JVM objects. For the corpus-sized intermediates the
  * dedup/curation operators pin (symmetrized pair-graph edges, shingle
  * arrays, exploded term rows), that representation is 3-5x the on-wire
  * bytes and — worse — millions of long-lived objects that both defeat the
  * unified memory manager's size accounting and stall the collector: the
  * 100x corpus' 57M-row edge checkpoint OOM'd an 8 GiB driver JVM outright
  * (connectedComponents, round-8 ladder run) while its serialized form is
  * ~1.4 GiB of UnsafeRow bytes.
  *
  * MEMORY_AND_DISK_SER stores the compact serialized blocks, spills them to
  * disk under pressure, and costs only a per-read copy — the right trade
  * for blocks that are written once and scanned a handful of times, which
  * is exactly what an iterative operator's per-round snapshots are. Only
  * the BIG-OBJECT checkpoints use it (pair-graph edges/labels, shingle and
  * chunk arrays, exploded term rows); the thin `(id, fp, band, bucket,
  * sub)` banded tables and driver-facing tiny tables (hierarchy path maps)
  * keep the plain default — serialization buys nothing on a few MB of
  * numeric rows.
  */
private[graft] object Ckpt {

  implicit class CkptOps(private val df: DataFrame) extends AnyVal {

    /** Lazy serialized checkpoint: materializes inside the first consuming
      * action, later consumers read the blocks.
      */
    def lazySerCkpt: DataFrame =
      df.localCheckpoint(false, StorageLevel.MEMORY_AND_DISK_SER)

    /** Eager serialized checkpoint: materializes now (its own job); use
      * when the caller immediately needs an observed metric or frees
      * predecessors.
      */
    def eagerSerCkpt: DataFrame =
      df.localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
  }

  /** The RDD a `localCheckpoint` persisted — so an iterative operator can
    * free a superseded snapshot's blocks eagerly instead of waiting for
    * GC + ContextCleaner (at 100x each snapshot is tens of millions of
    * rows; 5-8 retained generations is exactly the block-manager pressure
    * that sent the round-8 spill path into missing-shuffle-file
    * territory). Shared by every checkpoint-loop operator (connected
    * components, BPE merge learning) so a change in the checkpoint plan
    * shape — the `LogicalRDD` match silently no-ops and leaks blocks if
    * it ever stops holding — is fixed in ONE place (ADVICE r13).
    */
  private[graft] def ckptRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.logical.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }
}
