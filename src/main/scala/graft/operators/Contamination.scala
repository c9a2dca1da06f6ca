package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train→test decontamination: flag training documents that share distinctive
  * word shingles with held-out evaluation documents — the standard n-gram
  * contamination check LLM data pipelines run before training (GPT-3
  * appendix C; BigCode's decontamination tooling uses the same bounded-df
  * n-gram matching).
  *
  * Scale design: shingles are exploded once per side, shingles whose total
  * document frequency exceeds `maxDf` are dropped BEFORE the join —
  * boilerplate n-grams carry no contamination signal but would create the
  * hot-key quadratic blowup — and the remaining match is a hash equi-join on
  * the shingle followed by a per-pair count. No all-pairs comparison at any
  * size; skewed shingles within the cap are split by AQE.
  */
object Contamination {

  private def shingled(df: DataFrame, idCol: String, textCol: String,
                       side: String, width: Int) = {
    val ws = split(lower(col(textCol)), " ")
    // r20: single-row-group inputs serialize the shingle explode into
    // the scan task (guide: repartition unsplittable inputs after read)
    Dedup.widen(df).select(col(idCol).as(side), ws.as("ws"))
      .where(size(col("ws")) >= width)
      .select(col(side), explode(array_distinct(transform(
        sequence(lit(0), size(col("ws")) - width),
        i => array_join(slice(col("ws"), i + lit(1), lit(width)), " ")))).as("sh"))
  }

  /** Corpus novelty curve — per document the share of its distinct
    * `width`-word shingles whose FIRST appearance (minimum doc id over
    * the whole corpus) is this document: the "how much genuinely new
    * text does each successive document add" readout a curation pipeline
    * tracks as a dataset grows (a falling novelty curve means the crawl
    * is re-collecting itself; near-zero marginal novelty is the stop
    * signal for that source). Documents shorter than one shingle carry
    * no signal and are excluded, same as [[report]].
    *
    * Scale shape: shingle explode (linear) → ONE map-side-combined
    * min-per-shingle pass → hash join back at the shingle grain → doc
    * rollup. No pairwise step of any kind; the first-seen frame is
    * shingle-vocabulary-scale.
    */
  def noveltyCurve(docs: DataFrame, idCol: String, textCol: String,
                   width: Int = 4): DataFrame = {
    val sh = shingled(docs, idCol, textCol, "id", width)
    val firstSeen = sh.groupBy(col("sh")).agg(min(col("id")).as("first_id"))
    sh.join(firstSeen, Seq("sh"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("first_id") === col("id"), 1L).otherwise(0L))
          .as("n_novel"))
      .select(col("id").as(idCol), col("n_shingles"), col("n_novel"),
        round(col("n_novel").cast("double") /
          col("n_shingles").cast("double"), 6).as("novelty"))
  }

  /** (train_id, test_id, n_shared): pairs sharing ≥ `minShared` distinct
    * `width`-word shingles, after dropping shingles with total df > `maxDf`.
    */
  def report(train: DataFrame, test: DataFrame, idCol: String, textCol: String,
             width: Int = 4, minShared: Int = 3, maxDf: Int = 100): DataFrame = {
    val tr = shingled(train, idCol, textCol, "train_id", width)
    val te = shingled(test, idCol, textCol, "test_id", width)
    // df cap over BOTH sides so the pruning is symmetric and reproducible
    val rare = tr.select(col("sh")).unionAll(te.select(col("sh")))
      .groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .where(col("df") <= maxDf)
      .select(col("sh"))
    // semijoining the rare set on one side is enough — a pruned shingle
    // can't produce a pair regardless of the other side
    tr.join(rare, "sh").join(te, "sh")
      .groupBy(col("train_id"), col("test_id"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** [[report]] with a broadcast Bloom pre-filter on the TRAIN side — the
    * 100 TB shape. `report` shuffles every train shingle into the df count
    * and the join; here a Bloom filter over the (small) test side's
    * shingles cuts train shingles at the scan, so the train-side shuffle
    * carries only shingles that might match the eval set (+fpp riders)
    * instead of the whole corpus' n-grams.
    *
    * The result is EXACTLY `report`'s, not an approximation:
    *  - no false negatives — every train occurrence of a test-side shingle
    *    hashes identically, so all survive the filter;
    *  - the df cut stays exact for every shingle that can pair: a test-side
    *    shingle keeps ALL its train occurrences (df exact); a train-only
    *    shingle is either dropped (it could never pair) or rides through as
    *    a false positive with all its occurrences intact (df exact, joins
    *    nothing);
    *  - the equi-join itself discards the false positives.
    *
    * Two eager passes over the test side happen at CALL time (a row count
    * to size the bit array, then the filter build); the test side is the
    * small side by construction, and both passes are scans, not shuffles.
    */
  def reportBloom(train: DataFrame, test: DataFrame, idCol: String,
                  textCol: String, width: Int = 4, minShared: Int = 3,
                  maxDf: Int = 100, fpp: Double = 0.01): DataFrame = {
    val tr = shingled(train, idCol, textCol, "train_id", width)
    val te = shingled(test, idCol, textCol, "test_id", width)
    // row count upper-bounds the distinct-shingle count; oversizing only
    // lowers the realized fpp
    val bloom = Bloom.buildString(te, "sh", te.count(), fpp)
    val trF = tr.where(Bloom.mightContain(col("sh"), bloom))
    val rare = trF.select(col("sh")).unionAll(te.select(col("sh")))
      .groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .where(col("df") <= maxDf)
      .select(col("sh"))
    trF.join(rare, "sh").join(te, "sh")
      .groupBy(col("train_id"), col("test_id"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }
}
