package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking for training pipelines: split each document into
  * fixed-size word windows with overlap — the step that turns raw mirrored
  * text into context-length-bounded training examples (the reference's
  * pipeline ends at the replicated table; a data pipeline consuming it
  * starts here).
  *
  * Entirely columnar: one `split`, one `explode` of the computed window
  * starts, one `slice` per chunk — no UDFs, no shuffle at all (chunking is
  * embarrassingly parallel per document; the downstream global shuffle for
  * training-order randomization is [[Sampling]]'s job). At 100 TB the
  * output row count is input words / (chunkSize − overlap), and the
  * projection carries only the sliced words, so output IO tracks the text
  * volume, not a blow-up of it.
  */
object Chunking {

  /** One row per (doc, window): (idCol, chunk_idx, chunk_text, n_words).
    * Windows start every `chunkSize − overlap` words; the final window is
    * clipped to the document end (so trailing words are never dropped and
    * every window has ≥ 1 word). Documents with no words yield no rows.
    *
    * @param chunkSize window width, in words
    * @param overlap   words shared between consecutive windows
    */
  def wordChunks(docs: DataFrame, idCol: String, textCol: String,
                 chunkSize: Int, overlap: Int = 0): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize, got chunkSize=$chunkSize overlap=$overlap")
    val step = (chunkSize - overlap).toLong
    val words: Column = split(col(textCol), " ")
    val n: Column = size(words)
    docs
      .select(col(idCol), words.as("_graft_words"), n.as("_graft_n"))
      .where(col("_graft_n") > 0)
      .select(col(idCol), col("_graft_words"), col("_graft_n"),
        explode(sequence(lit(0L), (col("_graft_n") - 1).cast("long"), lit(step)))
          .as("_graft_start"))
      .select(
        col(idCol),
        (col("_graft_start") / step).cast("bigint").as("chunk_idx"),
        array_join(slice(col("_graft_words"),
          (col("_graft_start") + 1).cast("int"), lit(chunkSize)), " ").as("chunk_text"),
        least(lit(chunkSize.toLong), col("_graft_n") - col("_graft_start"))
          .cast("bigint").as("n_words"))
  }
}
