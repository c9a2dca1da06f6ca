package graft

import org.apache.spark.sql.functions._

/** Theta-sketch set algebra used by `users_overlap_theta`: below the
  * sketch's nominal entry count (default 2^12 = 4096) a theta sketch is in
  * EXACT mode — it stores every hash — so intersection/union/difference
  * estimates are exactly the true cardinalities. The driver query is
  * rows-only (approximate by design at corpus scale); this spec anchors it
  * bit-exactly against the exact twin at test scale, the same
  * exact-beside-approx pattern as `uniq_users_hll`.
  */
class SetSketchSpec extends SparkSpec {
  import spark.implicits._

  private val dirSf = "/root/testdata/sf0.001"

  test("theta pair overlaps equal the exact join below nominal entries") {
    val exact = SparkEntry.queries("users_overlap_exact")(spark, dirSf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val theta = SparkEntry.queries("users_overlap_theta")(spark, dirSf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(theta.keySet == exact.keySet && theta.keySet.size == 10)
    assert(theta == exact)
  }

  test("theta union and difference agree with exact set ops in exact mode") {
    val ev = Tables.load(spark, dirSf, "events")
    def users(t: String) =
      ev.where(col("event_type") === t).select(col("user_id")).distinct()
    val sk = ev.where(col("event_type").isin("click", "purchase"))
      .groupBy(col("event_type")).agg(theta_sketch_agg(col("user_id")).as("sk"))
    val Seq(c, p) = Seq("click", "purchase").map(t =>
      sk.where(col("event_type") === t).select(col("sk")))
    val pair = c.crossJoin(p.withColumnRenamed("sk", "sk2"))
    def est(cN: org.apache.spark.sql.Column) =
      pair.select(theta_sketch_estimate(cN)).collect().head.getLong(0)
    assert(est(theta_union(col("sk"), col("sk2"))) ==
      users("click").union(users("purchase")).distinct().count())
    assert(est(theta_difference(col("sk"), col("sk2"))) ==
      users("click").except(users("purchase")).count())
  }
}
