package graft.operators

import org.apache.spark.sql.DataFrame

/** Write surface the streaming rider drives — implemented by both
  * persisted ANN indexes ([[IvfIndex]], [[LshIndex]]), whose replay-safe
  * `addBatch` carries the same contract as [[TextIndex.addBatch]]: a batch
  * id at or below the persisted high-water mark is a no-op, so
  * at-least-once redelivery never doubles postings.
  */
trait VectorIndexWriter {
  /** Append `batch` under external id `batchId` iff not already applied;
    * returns whether the batch was applied.
    */
  def addBatch(batchId: Long, batch: DataFrame, idCol: String,
               vecCol: String): Boolean

  /** Highest applied external batch id (−1 before any [[addBatch]]). */
  def lastBatch: Int

  /** Live generation count (`batches − base`) — the fragmentation signal
    * the streaming rider's periodic compaction watches: every appended
    * batch lays down its own generation, so a long-running stream without
    * compaction fragments each probed list into thousands of small files.
    */
  def liveGenerations: Int

  /** Fold every live generation into one, with the family's reader-grace
    * contract (superseded generations stay readable for one full cycle;
    * the NEXT compact vacuums them). Idempotent when already compact.
    */
  def compact(): Unit
}
