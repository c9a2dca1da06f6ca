package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.expressions.{BloomMightContain, NativeFunctions}

/** Build-side of the broadcast Bloom pre-filter (probe side:
  * [[graft.expressions.BloomMightContain]]).
  *
  * The pattern: when one side of a semi/equi join is too big to broadcast
  * as a hash table but its KEY SET fits a few-MB bit array, build a Bloom
  * filter over it, broadcast the bytes, and cut the other (huge) side at
  * the scan with `mightContain` BEFORE the shuffle. No false negatives, so
  * an exact join downstream returns exactly what it would have without the
  * filter — the fpp only controls how many doomed rows still pay the
  * shuffle. This is the explicit, reusable form of the runtime bloom
  * filters engines inject automatically, for frames whose small-key-set
  * nature the optimizer cannot know (a shingled eval set, a sanctioned-id
  * list, yesterday's changed keys).
  */
object Bloom {

  /** Aggregate `df[colName]` (string) into a serialized Bloom filter and
    * broadcast it. `expectedItems` sizes the bit array (overestimating is
    * safe: it only lowers the realized fpp); ~1.2 MB per million items at
    * fpp 0.01.
    *
    * Built with a `treeAggregate` so partial filters merge executor-side
    * in log depth instead of all landing on the driver — the driver
    * receives O(depth-1 fan-in) filters, never one per partition.
    */
  def buildString(df: DataFrame, colName: String, expectedItems: Long,
                  fpp: Double = 0.01): Broadcast[Array[Byte]] = {
    require(expectedItems >= 0, s"bad expectedItems=$expectedItems")
    require(fpp > 0 && fpp < 1, s"bad fpp=$fpp")
    val items = df.select(col(colName).cast("string")).na.drop()
      .rdd.map(_.getString(0))
    val zero = BloomFilter.create(math.max(expectedItems, 64L), fpp)
    val bf = items.treeAggregate(zero)(
      (f, s) => { f.putBinary(s.getBytes(StandardCharsets.UTF_8)); f },
      (a, b) => { a.mergeInPlace(b); a })
    df.sparkSession.sparkContext.broadcast(BloomMightContain.serialize(bf))
  }

  /** The probe column: true iff `c` might be in the broadcast filter. */
  def mightContain(c: Column, bloom: Broadcast[Array[Byte]]): Column =
    NativeFunctions.bloomMightContain(c, bloom)
}
