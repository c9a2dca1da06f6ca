package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
    * Windows start every `chunkSize − overlap` words under the corpus-wide
    * tokenization ([[graft.functions.TextFunctions.tokens]]); the final
    * window is clipped to the document end, and a start whose window would
    * contribute ONLY already-covered words (tail length ≤ overlap) is not
    * emitted — every chunk adds at least one new word, and every word
    * appears in some chunk. Blank documents yield no rows.
    *
    * @param chunkSize window width, in words
    * @param overlap   words shared between consecutive windows
    */
  def wordChunks(docs: DataFrame, idCol: String, textCol: String,
                 chunkSize: Int, overlap: Int = 0): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize, got chunkSize=$chunkSize overlap=$overlap")
    val step = (chunkSize - overlap).toLong
    val words: Column = graft.functions.TextFunctions.tokens(col(textCol))
    docs
      .select(col(idCol), words.as("_graft_words"),
        size(words).as("_graft_n"))
      .where(length(trim(col(textCol))) > 0) // split("") is [""], not []
      .select(col(idCol), col("_graft_words"), col("_graft_n"),
        explode(sequence(lit(0L),
          greatest(col("_graft_n") - 1 - overlap, lit(0)).cast("long"), lit(step)))
          .as("_graft_start"))
      .select(
        col(idCol),
        (col("_graft_start") / step).cast("bigint").as("chunk_idx"),
        array_join(slice(col("_graft_words"),
          (col("_graft_start") + 1).cast("int"), lit(chunkSize)), " ").as("chunk_text"),
        least(lit(chunkSize.toLong), col("_graft_n") - col("_graft_start"))
          .cast("bigint").as("n_words"))
  }

  /** Contiguous sequence packing: assign each chunk to a fixed-budget
    * training sequence — the pretraining step after [[wordChunks]] (fill
    * sequences back-to-back; document boundaries do not reset a sequence,
    * the standard packing for causal-LM data). A chunk belongs to the
    * sequence its FIRST word lands in (`floor(running_total_before / budget)`),
    * so sequences can overrun the budget by at most one chunk rather than
    * splitting chunks mid-window. (With a chunk LARGER than the whole
    * budget — not produced by [[wordChunks]] under a budget ≥ chunkSize —
    * assigned seq ids skip numbers; they remain monotone per shard.)
    *
    * Scale: a single global running sum would serialize onto one task, so
    * packing runs per SHARD — `shard = id mod shards`, one window partition
    * each, all shards in parallel; a training job reads (shard, seq_id)
    * groups. Deterministic for a fixed (ids, shards): the order inside a
    * shard is (id, chunk_idx).
    */
  def packChunks(chunks: DataFrame, idCol: String, idxCol: String,
                 nWordsCol: String, budget: Int, shards: Int): DataFrame = {
    require(budget > 0 && shards > 0, s"bad budget=$budget shards=$shards")
    val shard = pmod(col(idCol), lit(shards.toLong)).cast("bigint")
    val w = Window.partitionBy(shard).orderBy(col(idCol), col(idxCol))
    val before = coalesce(
      sum(col(nWordsCol)).over(w.rowsBetween(Window.unboundedPreceding, -1)),
      lit(0L))
    // `div` (IntegralDivide) stays in long arithmetic — floor(a / b) routes
    // through double and would misassign seq ids once a shard's running
    // word total passes 2^53; the operator advertises exact semantics.
    chunks.select(col(idCol), col(idxCol), col(nWordsCol),
        shard.as("shard"), before.as("_graft_before"))
      .select(col(idCol), col(idxCol), col(nWordsCol), col("shard"),
        expr(s"_graft_before div ${budget}L").cast("bigint").as("seq_id"))
  }
}
