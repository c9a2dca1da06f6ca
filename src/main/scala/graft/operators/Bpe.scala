package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary training over the corpus (Sennrich,
  * Haddow & Birch, ACL 2016 — the public BPE-for-NMT formulation every
  * modern subword tokenizer descends from): learn the `nMerges` most
  * frequent adjacent symbol merges, then greedily encode text with them.
  * This is the "train the tokenizer on the corpus" stage of a pretraining
  * data pipeline — the real counterpart of the ~4-chars/token estimate in
  * [[graft.functions.TextFunctions]].
  *
  * Distribution shape (the reason BPE training is feasible at 100 TB):
  * everything after the first pass operates on the WORD-FREQUENCY table,
  * not the corpus — the classic compression. One corpus-sized `groupBy`
  * builds `(word, freq)`; each merge iteration is then a narrow map +
  * one map-side-combined pair aggregation over the vocabulary, with ONLY
  * the single argmax pair row ever reaching the driver
  * (`TakeOrderedAndProject`-bounded, like [[Vocabulary.topVocabulary]]).
  * The per-iteration job count is `nMerges` — a driver LOOP, not
  * driver DATA.
  *
  * Determinism: the argmax tie-break is total (freq desc, then left,
  * then right lexicographically), and the merge application is the
  * standard leftmost-non-overlapping scan, so the learned merge table is
  * identical across partitionings and engines.
  */
object Bpe {

  /** End-of-word marker, appended as its own symbol so merges can learn
    * word-final units (Sennrich's `</w>`). */
  val EndOfWord = "</w>"

  // Seq (not IndexedSeq) field: the implicit product encoder covers it
  private[graft] final case class SymWord(freq: Long, syms: Seq[String])

  /** Word → initial symbol sequence, split by CODE POINT (not UTF-16
    * unit): lone surrogates would not survive the Dataset round-trip
    * (UTF-8 encoding replaces them), silently diverging the two merge
    * paths on emoji-bearing corpora.
    */
  private[graft] def initialSyms(w: String): IndexedSeq[String] = {
    val out = IndexedSeq.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    (out += EndOfWord).result()
  }

  /** Code-POINT lexicographic comparison — the order UTF8String's binary
    * comparison (the distributed `orderBy`) induces; Java's
    * `String.compareTo` is code-UNIT order and disagrees beyond the BMP.
    */
  private[graft] def cpLess(a: String, b: String): Boolean = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return ca < cb
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    a.length - i < b.length - j
  }

  /** One learned merge. */
  final case class Merge(step: Int, left: String, right: String, freq: Long)

  private def words(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(graft.functions.TextFunctions
      .tokens(lower(col(textCol)))).as("w"))
      .where(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))

  /** Leftmost-non-overlapping application of one merge to a symbol
    * sequence — the textbook scan. */
  private[graft] def applyMerge(syms: IndexedSeq[String], a: String,
                                b: String): IndexedSeq[String] = {
    val out = IndexedSeq.newBuilder[String]
    var i = 0
    val n = syms.length
    while (i < n) {
      if (i + 1 < n && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Learn `nMerges` merges from the corpus' word-frequency table.
    * Returns them in learned order; stops early when no adjacent pair
    * remains (fully merged vocabulary).
    *
    * Hybrid execution (the bounded-collect-with-distributed-fallback
    * pattern of `Dedup.clusters`): when the DISTINCT-WORD table fits
    * under `driverWordCap`, it is collected once and the merge loop runs
    * in memory — the classic single-machine BPE trainer, `nMerges` scans
    * over the word list instead of `nMerges` Spark jobs (the word table
    * is corpus-vocabulary-sized, ≪ corpus; this is also how public
    * tokenizer trainers operate on pre-counted words). Past the cap the
    * loop runs distributed, one narrow map + pair aggregation per step.
    * Both paths share the same tie-break and the same leftmost scan, so
    * they agree exactly (spec-pinned).
    */
  def learnMerges(docs: DataFrame, textCol: String, nMerges: Int,
                  driverWordCap: Int = 1 << 20): Seq[Merge] = {
    require(nMerges > 0, s"bad nMerges=$nMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    // pinned: the over-cap path would otherwise pay the corpus-sized
    // word aggregation twice (once for the bounded probe, once to seed
    // the distributed vocab)
    val wf = words(docs, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    if (driverWordCap > 0) {
      // bounded detection: limit(cap+1) never ships more than cap+1 rows
      val sample = wf.select(col("freq"), col("w")).limit(driverWordCap + 1)
        .as[(Long, String)].collect()
      if (sample.length <= driverWordCap) {
        wf.unpersist(false)
        return learnMergesLocal(sample, nMerges)
      }
    }
    var vocab: Dataset[SymWord] = wf
      .select(col("freq"), col("w"))
      .as[(Long, String)]
      .map { case (f, w) => SymWord(f, initialSyms(w)) }
    // localCheckpoint per iteration: truncates the lineage a 50-deep loop
    // would otherwise grow quadratic analysis cost on (the table is
    // vocabulary-sized — cheap to materialize)
    vocab = vocab.localCheckpoint()
    wf.unpersist(false)
    val merges = Seq.newBuilder[Merge]
    var step = 0
    var exhausted = false
    while (step < nMerges && !exhausted) {
      val top = vocab.toDF("freq", "syms")
        .where(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(0, size(syms) - 2)," +
            " i -> struct(syms[i] AS l, syms[i+1] AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("pf"))
        .orderBy(col("pf").desc, col("l"), col("r"))
        .limit(1)
        .as[(String, String, Long)]
        .collect()
      top.headOption match {
        case None => exhausted = true
        case Some((a, b, pf)) =>
          step += 1
          merges += Merge(step, a, b, pf)
          val prev = vocab
          vocab = prev
            .map(sw => SymWord(sw.freq, applyMerge(sw.syms.toIndexedSeq, a, b)))
            .localCheckpoint()
          prev.unpersist(false)
      }
    }
    vocab.unpersist(false)
    merges.result()
  }

  /** The in-memory merge loop — identical tie-break and scan as the
    * distributed path. `wordFreqs` is the collected (freq, word) table.
    */
  private def learnMergesLocal(wordFreqs: Array[(Long, String)],
                               nMerges: Int): Seq[Merge] = {
    var vocab: Array[(Long, IndexedSeq[String])] = wordFreqs.map {
      case (f, w) => (f, initialSyms(w))
    }
    val merges = Seq.newBuilder[Merge]
    var step = 0
    var exhausted = false
    while (step < nMerges && !exhausted) {
      val counts = new java.util.HashMap[(String, String), Long]()
      vocab.foreach { case (f, syms) =>
        var i = 0
        while (i + 1 < syms.length) {
          counts.merge((syms(i), syms(i + 1)), f, _ + _)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        // argmax with the SAME total order as the distributed orderBy:
        // freq desc, then left, then right
        var best: ((String, String), Long) = null
        counts.forEach { (k, v) =>
          if (best == null || v > best._2 ||
            (v == best._2 && (cpLess(k._1, best._1._1) ||
              (k._1 == best._1._1 && cpLess(k._2, best._1._2))))) best = (k, v)
        }
        val ((a, b), pf) = best
        step += 1
        merges += Merge(step, a, b, pf)
        vocab = vocab.map { case (f, syms) =>
          (f, if (syms.length >= 2) applyMerge(syms, a, b) else syms)
        }
      }
    }
    merges.result()
  }

  /** Greedy-encode each document with a learned merge table: per word,
    * apply the merges in learned (priority) order — the standard BPE
    * inference — and report per-document subword statistics (token count
    * and mean subword length, end-markers excluded from length). The
    * merge table broadcasts; encoding is one narrow `mapPartitions`-shaped
    * pass, never a shuffle.
    */
  def encodeStats(docs: DataFrame, idCol: String, textCol: String,
                  merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val mergeList = merges.sortBy(_.step).map(m => (m.left, m.right))
    val mb = spark.sparkContext.broadcast(mergeList)
    docs.select(col(idCol).cast("long").as("doc_id"),
      // a null text is an ordinary dirty row (zero subwords), not a crash
      coalesce(lower(col(textCol)), lit("")).as("text"))
      .where(col("doc_id").isNotNull)
      .as[(Long, String)]
      .mapPartitions { it =>
        // per-word memo: Zipf repetition means the same word re-encodes
        // constantly — cache (n_subwords, payload_chars) per distinct word
        // seen in this partition (the training half's word-frequency
        // compression, applied to inference)
        val memo = new java.util.HashMap[String, (Long, Long)]()
        val mergeList = mb.value
        def encodeWord(w: String): (Long, Long) = {
          var r = memo.get(w)
          if (r == null) {
            var syms: IndexedSeq[String] = initialSyms(w)
            mergeList.foreach { case (a, b) =>
              if (syms.length >= 2) syms = applyMerge(syms, a, b)
            }
            var n = 0L; var chars = 0L
            syms.foreach { t =>
              n += 1
              chars += (t.length -
                (if (t.endsWith(EndOfWord)) EndOfWord.length else 0))
            }
            r = (n, chars)
            if (memo.size < (1 << 20)) memo.put(w, r)
          }
          r
        }
        it.map { case (id, text) =>
          var n = 0L; var chars = 0L
          text.split(" ").foreach { w =>
            if (w.nonEmpty) {
              val (wn, wc) = encodeWord(w)
              n += wn; chars += wc
            }
          }
          (id, n, chars)
        }
      }
      .toDF("doc_id", "n_subwords", "n_chars_encoded")
  }

  /** [[learnMerges]] as a query-shaped result: one row per learned merge
    * in priority order. */
  def mergeTable(spark: SparkSession, docs: DataFrame, textCol: String,
                 nMerges: Int): DataFrame = {
    import spark.implicits._
    learnMerges(docs, textCol, nMerges)
      .toDF("step", "left", "right", "freq")
  }
}
