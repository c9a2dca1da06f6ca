package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** The engine's SparkSessionExtensions: SQL functions for the native
  * expressions, the as-of-join planner strategy, and its filter-pushdown
  * optimizer rule. Injectable two ways:
  *
  *  - config: `spark.sql.extensions=graft.expressions.GraftExtensions`
  *  - imperative: `org.apache.spark.sql.graft.bridge.registerFunctions(spark)`
  *    (functions only; the as-of API registers its own strategy/rule on use)
  *
  * After either, `spark.sql` understands `token_minhash(tokens, w, k[,
  * bands])`, `simhash64(hashes)`, `sorted_jaccard(a, b)`, `cosine_sim(a, b)`,
  * `rolling_fingerprint(text[, k, w])`, `pack_int8(vec)`,
  * `int8_cosine_sim(codes, vec)`, `media_info(payload)`, and the behavior
  * aggregates `window_funnel(w_us, ts, cond…)`, `window_funnel_strict(w_us,
  * ts, cond…)` (the 'strict_order' mode), `window_funnel_dedup(w_us,
  * ts, cond…)` (the 'strict_dedup' mode), `sequence_match(gap_us,
  * ts, cond…)`, `sequence_level(gap_us, ts, cond…)`,
  * `sequence_count(gap_us, ts, cond…)`, `retention(cond…)`
  * ([[BehaviorAggregates]]), and the stat tests `welch_ttest` /
  * `student_ttest` / `mann_whitney_u` (y, cond_a, cond_b) with real
  * p-values (StatAggregates.scala, [[StatMath]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.PushFilterThroughAsOfJoin)
  }
}

object GraftExtensions {

  private def intLit(args: Seq[Expression], i: Int, name: String): Int =
    args(i) match {
      case e if e.foldable => e.eval().asInstanceOf[Number].intValue()
      case other => throw new IllegalArgumentException(
        s"$name: argument ${i + 1} must be a literal integer, got $other")
    }

  private def longLit(args: Seq[Expression], i: Int, name: String): Long =
    args(i) match {
      case e if e.foldable => e.eval().asInstanceOf[Number].longValue()
      case other => throw new IllegalArgumentException(
        s"$name: argument ${i + 1} must be a literal integer, got $other")
    }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("token_minhash"),
      new ExpressionInfo(classOf[TokenMinHash].getName, "token_minhash"),
      (args: Seq[Expression]) => TokenMinHash(args.head,
        intLit(args, 1, "token_minhash"), intLit(args, 2, "token_minhash"),
        if (args.size > 3) intLit(args, 3, "token_minhash") else 0)),
    (FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => SimHash64(args.head)),
    (FunctionIdentifier("sorted_jaccard"),
      new ExpressionInfo(classOf[SortedJaccard].getName, "sorted_jaccard"),
      (args: Seq[Expression]) => SortedJaccard(args.head, args(1),
        if (args.size > 2) args(2) match {
          case e if e.foldable => e.eval() match {
            case d: org.apache.spark.sql.types.Decimal => d.toDouble
            case n: Number => n.doubleValue()
            case other => throw new IllegalArgumentException(
              s"sorted_jaccard: non-numeric threshold literal $other")
          }
          case other => throw new IllegalArgumentException(
            s"sorted_jaccard: argument 3 must be a literal threshold, got $other")
        } else -1.0)),
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (args: Seq[Expression]) => CosineSim(args.head, args(1))),
    (FunctionIdentifier("rolling_fingerprint"),
      new ExpressionInfo(classOf[RollingFingerprint].getName, "rolling_fingerprint"),
      (args: Seq[Expression]) => RollingFingerprint(args.head,
        if (args.size > 1) intLit(args, 1, "rolling_fingerprint") else 8,
        if (args.size > 2) intLit(args, 2, "rolling_fingerprint") else 16)),
    (FunctionIdentifier("pack_int8"),
      new ExpressionInfo(classOf[PackInt8].getName, "pack_int8"),
      (args: Seq[Expression]) => PackInt8(args.head)),
    (FunctionIdentifier("int8_cosine_sim"),
      new ExpressionInfo(classOf[Int8CosineSim].getName, "int8_cosine_sim"),
      (args: Seq[Expression]) => Int8CosineSim(args.head, args(1))),
    (FunctionIdentifier("media_info"),
      new ExpressionInfo(classOf[MediaInfoExpr].getName, "media_info"),
      (args: Seq[Expression]) => MediaInfoExpr(args.head)),
    (FunctionIdentifier("text_stats"),
      new ExpressionInfo(classOf[TextStats].getName, "text_stats"),
      (args: Seq[Expression]) => TextStats(args.head)),
    (FunctionIdentifier("deflate_size"),
      new ExpressionInfo(classOf[DeflateSize].getName, "deflate_size"),
      (args: Seq[Expression]) => DeflateSize(args.head)),
    // the ClickHouse behavior suite in its native SQL shape:
    //   window_funnel(window_us, ts, cond1, …)  — bigint level
    //   sequence_match(gap_us, ts, cond1, …)    — boolean
    //   sequence_level(gap_us, ts, cond1, …)    — bigint level
    //   retention(cond0, cond1, …)              — array<boolean>
    (FunctionIdentifier("window_funnel"),
      new ExpressionInfo(classOf[WindowFunnelAgg].getName, "window_funnel"),
      (args: Seq[Expression]) => WindowFunnelAgg(
        chainBound(args, "window_funnel"), args(1),
        chainConds(args.drop(2), "window_funnel"))),
    (FunctionIdentifier("window_funnel_strict"),
      new ExpressionInfo(classOf[WindowFunnelStrictAgg].getName, "window_funnel_strict"),
      (args: Seq[Expression]) => WindowFunnelStrictAgg(
        chainBound(args, "window_funnel_strict"), args(1),
        chainConds(args.drop(2), "window_funnel_strict"))),
    (FunctionIdentifier("window_funnel_dedup"),
      new ExpressionInfo(classOf[WindowFunnelDedupAgg].getName, "window_funnel_dedup"),
      (args: Seq[Expression]) => WindowFunnelDedupAgg(
        chainBound(args, "window_funnel_dedup"), args(1),
        chainConds(args.drop(2), "window_funnel_dedup"))),
    (FunctionIdentifier("sequence_match"),
      new ExpressionInfo(classOf[SequenceLevelAgg].getName, "sequence_match"),
      (args: Seq[Expression]) => SequenceLevelAgg(
        chainBound(args, "sequence_match"), args(1),
        chainConds(args.drop(2), "sequence_match"), matched = true)),
    (FunctionIdentifier("sequence_level"),
      new ExpressionInfo(classOf[SequenceLevelAgg].getName, "sequence_level"),
      (args: Seq[Expression]) => SequenceLevelAgg(
        chainBound(args, "sequence_level"), args(1),
        chainConds(args.drop(2), "sequence_level"), matched = false)),
    //   sequence_match_pattern('(?1)(?t>=X)(?2)…', ts, cond1, …) — boolean
    //   (ClickHouse's literal pattern-string call shape; min gaps incl.)
    (FunctionIdentifier("sequence_match_pattern"),
      new ExpressionInfo(classOf[SequencePatternAgg].getName, "sequence_match_pattern"),
      (args: Seq[Expression]) => {
        require(args.size >= 3,
          "sequence_match_pattern: need (pattern, ts, cond1, …)")
        val pattern = args.head match {
          case e if e.foldable => e.eval() match {
            case s: org.apache.spark.unsafe.types.UTF8String => s.toString
            case other => throw new IllegalArgumentException(
              s"sequence_match_pattern: pattern must be a string literal, got $other")
          }
          case other => throw new IllegalArgumentException(
            s"sequence_match_pattern: argument 1 must be a literal pattern, got $other")
        }
        val conds = args.drop(2)
        require(conds.size <= 30,
          "sequence_match_pattern: at most 30 conditions supported")
        val hops = graft.operators.Behavior.parsePattern(pattern, conds.size)
        require(hops.size <= 62,
          "sequence_match_pattern: at most 62 step refs supported")
        SequencePatternAgg(hops.map(h => (h.step, h.loMicros, h.hiMicros)),
          args(1), conds)
      }),
    //   sequence_count(gap_us, ts, cond1, …)    — bigint disjoint chains
    (FunctionIdentifier("sequence_count"),
      new ExpressionInfo(classOf[SequenceCountAgg].getName, "sequence_count"),
      (args: Seq[Expression]) => SequenceCountAgg(
        chainBound(args, "sequence_count"), args(1),
        chainConds(args.drop(2), "sequence_count"))),
    (FunctionIdentifier("retention"),
      new ExpressionInfo(classOf[RetentionAgg].getName, "retention"),
      (args: Seq[Expression]) => {
        require(args.size >= 2, "retention: need at least two condition arguments")
        require(args.size <= 62, "retention: at most 62 conditions supported")
        RetentionAgg(args)
      }),
    // the ClickHouse stat-test call shapes (conditions instead of a 0/1
    // sample index; integral-valued y):
    //   welch_ttest(y, cond_a, cond_b)    — struct(t, df, p_value)
    //   student_ttest(y, cond_a, cond_b)  — struct(t, df, p_value)
    //   mann_whitney_u(y, cond_a, cond_b) — struct(u1, z, p_value)
    (FunctionIdentifier("welch_ttest"),
      new ExpressionInfo(classOf[WelchTTestAgg].getName, "welch_ttest"),
      (args: Seq[Expression]) => {
        require(args.size == 3, "welch_ttest: need (y, cond_a, cond_b)")
        WelchTTestAgg(args(0), args(1), args(2))
      }),
    (FunctionIdentifier("student_ttest"),
      new ExpressionInfo(classOf[StudentTTestAgg].getName, "student_ttest"),
      (args: Seq[Expression]) => {
        require(args.size == 3, "student_ttest: need (y, cond_a, cond_b)")
        StudentTTestAgg(args(0), args(1), args(2))
      }),
    (FunctionIdentifier("mann_whitney_u"),
      new ExpressionInfo(classOf[MannWhitneyUAgg].getName, "mann_whitney_u"),
      (args: Seq[Expression]) => {
        require(args.size == 3, "mann_whitney_u: need (y, cond_a, cond_b)")
        MannWhitneyUAgg(args(0), args(1), args(2))
      }),
    //   kolmogorov_smirnov(y, cond_a, cond_b) — struct(d, p_value)
    //   rank_corr(x, y)                       — double ρ
    //   simple_linreg(x, y)                   — struct(slope, intercept, r2)
    //   anova_f(y, grp)                       — struct(f, dfs, p_value)
    (FunctionIdentifier("kolmogorov_smirnov"),
      new ExpressionInfo(classOf[KolmogorovSmirnovAgg].getName, "kolmogorov_smirnov"),
      (args: Seq[Expression]) => {
        require(args.size == 3, "kolmogorov_smirnov: need (y, cond_a, cond_b)")
        KolmogorovSmirnovAgg(args(0), args(1), args(2))
      }),
    (FunctionIdentifier("rank_corr"),
      new ExpressionInfo(classOf[RankCorrAgg].getName, "rank_corr"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "rank_corr: need (x, y)")
        RankCorrAgg(args(0), args(1))
      }),
    (FunctionIdentifier("simple_linreg"),
      new ExpressionInfo(classOf[SimpleLinRegAgg].getName, "simple_linreg"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "simple_linreg: need (x, y)")
        SimpleLinRegAgg(args(0), args(1))
      }),
    (FunctionIdentifier("anova_f"),
      new ExpressionInfo(classOf[AnovaFAgg].getName, "anova_f"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "anova_f: need (y, grp)")
        AnovaFAgg(args(0), args(1))
      }),
    // categorical association (ClickHouse cramersV / cramersVBiasCorrected
    // / theilsU): buffered contingency map, sorted-cell deterministic eval
    (FunctionIdentifier("cramers_v"),
      new ExpressionInfo(classOf[CramersVAgg].getName, "cramers_v"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "cramers_v: need (a, b)")
        CramersVAgg(args(0), args(1), corrected = false)
      }),
    (FunctionIdentifier("cramers_v_bias_corrected"),
      new ExpressionInfo(classOf[CramersVAgg].getName, "cramers_v_bias_corrected"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "cramers_v_bias_corrected: need (a, b)")
        CramersVAgg(args(0), args(1), corrected = true)
      }),
    (FunctionIdentifier("theils_u"),
      new ExpressionInfo(classOf[TheilsUAgg].getName, "theils_u"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "theils_u: need (a, b)")
        TheilsUAgg(args(0), args(1))
      }))

  /** Shared argument validation of the chain aggregates (construction-time,
    * NOT in the expression constructors — those also run during executor
    * deserialization with null fields).
    */
  private def chainBound(args: Seq[Expression], name: String): Long = {
    val bound = longLit(args, 0, name)
    require(bound > 0, s"$name: the window/gap must be positive microseconds")
    bound
  }

  private def chainConds(conds: Seq[Expression], name: String): Seq[Expression] = {
    require(conds.size >= 2, s"$name: need at least two condition arguments")
    require(conds.size <= 30, s"$name: at most 30 conditions supported")
    conds
  }
}
