package graft.operators

import org.apache.spark.sql.{DataFrame}
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

  /** (train_id, test_id, n_shared): pairs sharing ≥ `minShared` distinct
    * `width`-word shingles, after dropping shingles with total df > `maxDf`.
    */
  def report(train: DataFrame, test: DataFrame, idCol: String, textCol: String,
             width: Int = 4, minShared: Int = 3, maxDf: Int = 100): DataFrame = {
    def shingled(df: DataFrame, side: String) = {
      val ws = split(lower(col(textCol)), " ")
      df.select(col(idCol).as(side), ws.as("ws"))
        .where(size(col("ws")) >= width)
        .select(col(side), explode(array_distinct(transform(
          sequence(lit(0), size(col("ws")) - width),
          i => array_join(slice(col("ws"), i + lit(1), lit(width)), " ")))).as("sh"))
    }
    val tr = shingled(train, "train_id")
    val te = shingled(test, "test_id")
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
}
