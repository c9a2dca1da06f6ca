package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Readability counters of a string — `[n_words, n_sentences,
  * n_syllables]` — in ONE linear character pass inside whole-stage
  * codegen, replacing the four regex scans the declarative formulation
  * runs per document (`regexp_extract_all` over the text for words,
  * sentence runs, vowel runs, plus a lambda `rlike` per word for the
  * all-consonant floor).
  *
  * Semantics match the regex formulation exactly on its own terms:
  * words = maximal ASCII-letter runs, sentences = max([.!?]+ runs, 1),
  * syllables = [aeiouy]+ runs in the lowercased text + 1 per letter run
  * containing no vowel. Classification is deliberately ASCII-only —
  * identical to the regex classes `[A-Za-z]`/`[aeiouy]`/`[.!?]`; code
  * points outside ASCII never start or extend a run on either
  * formulation (the two exotic uppercase points that LOWERCASE into
  * ASCII, U+0130 and U+212A, are the only divergence surface and are
  * documented, not defended). TextStatsSpec property-pins equivalence
  * against the regex build on randomized text.
  */
case class TextStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"text_stats needs a string child, got ${child.dataType}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(TextStats.compute(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.expressions.TextStats.compute($c));")

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)

  override def prettyName: String = "text_stats"
}

object TextStats {

  private def isLetter(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')

  private def isVowel(c: Char): Boolean = {
    val l = (c | 0x20).toChar
    l == 'a' || l == 'e' || l == 'i' || l == 'o' || l == 'u' || l == 'y'
  }

  private def isSentMark(c: Char): Boolean = c == '.' || c == '!' || c == '?'

  /** One char pass: letter-run / sentence-run / vowel-run state machines
    * plus the per-word vowel flag, fused. ASCII classification only —
    * see the class doc. Returns [words, max(sentenceRuns, 1), vowelRuns +
    * vowelless words].
    */
  def compute(text: UTF8String): Array[Long] = {
    val s = text.toString
    val n = s.length
    var words = 0L
    var sentRuns = 0L
    var vowelRuns = 0L
    var consonantWords = 0L
    var inWord = false
    var inSent = false
    var inVowel = false
    var wordHasVowel = false
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      val letter = isLetter(c)
      val vowel = letter && isVowel(c)
      val sent = isSentMark(c)
      if (letter && !inWord) { words += 1; wordHasVowel = false }
      if (!letter && inWord && !wordHasVowel) consonantWords += 1
      if (vowel) { if (!inVowel) vowelRuns += 1; wordHasVowel = true }
      if (sent && !inSent) sentRuns += 1
      inWord = letter
      inVowel = vowel
      inSent = sent
      i += 1
    }
    if (inWord && !wordHasVowel) consonantWords += 1
    Array(words, math.max(sentRuns, 1L), vowelRuns + consonantWords)
  }
}
