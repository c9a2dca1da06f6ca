package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Edit-distance similarity self-join with a blocking scheme whose key
  * space GROWS with the data instead of being a fixed semantic attribute.
  *
  * Soundness (no missed pair) comes from two classic filters composed:
  *
  *  - q-gram count filtering (Gravano et al. 2001, "Approximate String
  *    Joins in a Database (Almost) for Free"): one character edit alters at
  *    most q of a string's distinct q-grams, so ed(a,b) ≤ d implies the
  *    gram sets share ≥ |G| − d·q elements.
  *  - prefix filtering (Chaudhuri et al. 2006) on that overlap bound: under
  *    a global gram order (ascending document frequency, ties by gram), two
  *    sets meeting the overlap must share a gram within each one's first
  *    d·q + 1 grams. Joining on rare-first prefix grams therefore loses
  *    nothing, and the block key space is the gram vocabulary × any caller
  *    block columns.
  *
  * The gram guarantee needs |G| = len − q + 1 ≥ d·q + 1, i.e. len ≥
  * (d+1)·q. Shorter strings fall back to a length-banded check (band width
  * d+1, neighbor-band probing — sound because ed ≤ d bounds the length
  * difference by d), and strings within d of that boundary join BOTH paths
  * so cross-boundary pairs still meet. (In domains that are mostly
  * sub-(d+1)·q-character strings, pick a smaller q.)
  *
  * Candidates are verified inline with the thresholded `levenshtein` —
  * early-exit on distance > d — inside the join's codegen pipeline, so the
  * only post-join shuffle carries surviving (id_a, id_b, dist) triples.
  */
object Fuzzy {

  /** All pairs (id_a < id_b) with identical `blockCols` values and
    * edit distance ≤ `maxDist`, as (id_a, id_b, dist).
    */
  def editPairs(df: DataFrame, idCol: String, strCol: String, maxDist: Int,
                blockCols: Seq[String] = Nil, q: Int = 4): DataFrame = {
    require(maxDist >= 0 && q >= 1, s"bad maxDist=$maxDist / q=$q")
    val minGramLen = (maxDist + 1) * q // shortest length the gram path covers
    val blocks = blockCols.map(col)
    val base = df.select(
      (col(idCol).as("id") +: col(strCol).as("s") +:
        length(col(strCol)).as("len") +: blocks): _*)

    def verified(cands: DataFrame): DataFrame = {
      val d = levenshtein(col("l.s"), col("r.s"), maxDist)
      cands.where(d >= 0)
        .select(col("l.id").as("id_a"), col("r.id").as("id_b"), d.cast("int").as("dist"))
    }
    def sameBlock = blockCols.map(c => col(s"l.$c") === col(s"r.$c"))
      .foldLeft(lit(true))(_ && _)

    // gram path: rare-first prefix grams of strings long enough for the
    // count-filter guarantee
    val longs = base.where(col("len") >= minGramLen)
    val grams = array_distinct(transform(
      sequence(lit(0), col("len") - q), i => col("s").substr(i + lit(1), lit(q))))
    val tok = longs.withColumn("g", explode(grams))
    val dfreq = tok.groupBy(col("g")).agg(count(lit(1)).as("gdf"))
    val prefix = tok.join(dfreq, "g")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("gdf"), col("g"))))
      .where(col("rn") <= maxDist * q + 1)
      .drop("gdf", "rn", "len")
    // r20: EXPLICIT repartition of the probe side (the jaccardPairsPrefix
    // idiom): the prefix-posting frames are byte-wise tiny, the other join
    // side broadcasts, and the join inherits the probe's partitioning — so
    // AQE's coalescing ran the whole gram join + inline levenshtein verify
    // in ONE task (measured 2.38 s single-task job, ~80% of
    // fuzzy_part_names' wall). A user repartition is coalescing-exempt;
    // pair output is partitioning-independent.
    val floorParts = graft.GraftSession.parallelismFloor(df.sparkSession)
    val gramPairs = verified(
      prefix.repartition(floorParts, col("id")).as("l").join(prefix.as("r"),
        col("l.g") === col("r.g") && col("l.id") < col("r.id") && sameBlock))

    // short path: strings below the guarantee, plus the straddle band so a
    // short×long pair within maxDist still meets in one block. Blocked by a
    // LENGTH BAND (width maxDist+1) so the fallback pair space is bounded
    // even on corpora dominated by short strings: ed(a,b) ≤ d implies
    // |len(a)−len(b)| ≤ d, hence band ids differing by ≤ 1 — the probe side
    // explodes to its three neighbor bands and equi-joins, meeting every
    // qualifying pair exactly once (never an all-pairs nested loop).
    val bandW = maxDist + 1
    val shorts = base.where(col("len") < minGramLen + maxDist)
      .withColumn("lb", floor(col("len") / bandW))
    val probe = shorts.withColumn("lb",
      explode(array(col("lb") - 1, col("lb"), col("lb") + 1)))
    val shortPairs = verified(
      probe.repartition(floorParts, col("id")).as("l").join(shorts.as("r"),
        col("l.lb") === col("r.lb") && col("l.id") < col("r.id") && sameBlock &&
          abs(col("l.len") - col("r.len")) <= maxDist))

    gramPairs.unionByName(shortPairs).distinct()
  }
}
