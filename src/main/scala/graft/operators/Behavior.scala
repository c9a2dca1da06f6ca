package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral analytics over the event log — the ClickHouse
  * `windowFunnel` / retention-matrix surface.
  *
  * Both operators aggregate per user first (one hash shuffle on the key,
  * map-side combined), then work on the per-user frame — the event log
  * itself is never re-shuffled or self-joined row-to-row.
  */
object Behavior {

  /** Ordered funnel: for each key, how many of `steps` happened in order
    * (step i+1 strictly after the earliest completion of step i).
    * Returns (key, funnel_level). Implemented as successive conditional
    * min-timestamps inside ONE aggregation pass: min ts of step0, then min
    * ts of step1 after that, etc. — no joins, one shuffle.
    *
    * All step timestamps come from conditional aggregates of the same
    * grouped pass, so the whole funnel is a single `groupBy(key)`.
    */
  def funnelLevels(events: DataFrame, keyCol: String, opCol: String,
                   tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, "need at least two funnel steps")
    // per-key min ts per step (unconditional), computed in one pass
    val perStepMin = steps.zipWithIndex.map { case (s, i) =>
      min(when(col(opCol) === s, col(tsCol))).as(s"_t$i")
    }
    val agged = events.groupBy(col(keyCol)).agg(perStepMin.head, perStepMin.tail: _*)
    // fold the ordering constraint: level i reached if t_i exists and is
    // after the reach-time of level i-1. With min-ts semantics the reach
    // chain uses each step's earliest occurrence AFTER the previous reach —
    // conservative formulation below uses earliest global occurrence, which
    // matches ClickHouse windowFunnel(strict_order=0) on distinct steps.
    var reach = col("_t0")
    var level = when(col("_t0").isNotNull, 1).otherwise(0)
    for (i <- 1 until steps.size) {
      val ok = col(s"_t$i").isNotNull && col(s"_t$i") > reach && level === i
      level = when(ok, i + 1).otherwise(level)
      reach = when(ok, col(s"_t$i")).otherwise(reach)
    }
    agged.select(col(keyCol), level.cast("bigint").as("funnel_level"))
  }

  /** Time-bounded EXACT funnel — ClickHouse `windowFunnel(window)(ts,
    * cond1, cond2, …)`: the per-key level is the largest k such that SOME
    * chain of events matches steps 1..k at strictly increasing timestamps
    * t₁ < t₂ < … < t_k with t_k ≤ t₁ + window. Unlike [[funnelLevels]]
    * (earliest-occurrence greedy, unbounded window), every possible chain
    * start counts: a late signup can complete a funnel an early one
    * missed.
    *
    * Exactness without enumerating chains: process events in time order
    * and, per row, let `start_i` = the chain START of the best i-chain
    * ENDING at this row. `start_1` = own ts on a step-1 row; `start_i` =
    * the max `start_{i-1}` among strictly-earlier rows, kept if ≥ ts −
    * window. Taking the MAX start is optimal — the only downstream
    * constraint is t_k ≤ start + window, monotone in start — so a row's
    * `start_i` is non-null iff ANY valid i-chain ends there (an exchange
    * argument over chains, not a greedy heuristic). The strictly-before
    * RANGE frame over integer microseconds enforces t_{i-1} < t_i
    * identically in any engine; window arithmetic is integer microseconds
    * throughout, so the result is engine-exact.
    *
    * Shape: all k−1 window passes share one (key, ts) partitioning+sort —
    * ONE shuffle of the event log, then k−1 linear running-max scans and a
    * grouped max. No self-joins, no per-chain blowup, no driver state.
    * Returns (key, funnel_level ∈ [0, k]) for every key in `events`.
    */
  def windowFunnel(events: DataFrame, keyCol: String, opCol: String,
                   tsCol: String, steps: Seq[String],
                   windowMicros: Long): DataFrame = {
    val before = Window.partitionBy(col(keyCol)).orderBy(col("__tsl"))
      .rangeBetween(Window.unboundedPreceding, -1)
    funnelChassis(events, keyCol, opCol, tsCol, steps, windowMicros) { i =>
      val prev = max(col(s"__start${i - 1}")).over(before)
      when(col("__op") === steps(i - 1) &&
        prev >= col("__tsl") - windowMicros, prev)
    }
  }

  /** Shared chassis of the windowFunnel modes: project (key, epoch-micros
    * ts, op), seed `__start1` on first-step rows, apply the mode's
    * per-step start builder for steps 2..k (the ONLY varying piece: how a
    * row sees its predecessor chain start), then fold the reached level
    * and aggregate per key. Catalyst collapses the identical window specs,
    * so both modes keep the single (key, ts) shuffle+sort.
    */
  private def funnelChassis(events: DataFrame, keyCol: String, opCol: String,
                            tsCol: String, steps: Seq[String],
                            windowMicros: Long,
                            tieCol: Option[String] = None)(
                            stepStart: Int => Column): DataFrame = {
    require(steps.size >= 2, "need at least two funnel steps")
    require(windowMicros > 0, s"bad windowMicros=$windowMicros")
    val base = col(keyCol) +:
      graft.functions.TimeCols.micros(col(tsCol)).as("__tsl") +:
      col(opCol).as("__op") +:
      tieCol.map(c => col(c).as("__tie")).toSeq
    var df = events.select(base: _*)
      .withColumn("__start1", when(col("__op") === steps.head, col("__tsl")))
    for (i <- 2 to steps.size)
      df = df.withColumn(s"__start$i", stepStart(i))
    val level = (steps.size to 1 by -1).foldLeft(lit(null).cast("int")) {
      (acc, i) => coalesce(acc, when(col(s"__start$i").isNotNull, i))
    }
    df.groupBy(col(keyCol))
      .agg(coalesce(max(level), lit(0)).cast("bigint").as("funnel_level"))
  }

  /** ClickHouse `windowFunnel(window, 'strict_order')`: like
    * [[windowFunnel]], but ANY intervening event of another type breaks
    * the chain — steps must occur on CONSECUTIVE rows of the key's
    * timeline. The formulation therefore swaps the running-max window for
    * a `lag(1)`: a row's `start_i` exists only when the IMMEDIATELY
    * preceding event carried `start_{i-1}` (and the window still covers
    * this row). Same single (key, ts) shuffle + sort, k−1 linear lag
    * passes; per-key ties in `ts` make `lag` order-dependent, so pass a
    * `tieCol` that totally orders same-timestamp rows (like [[deltaSum]]'s)
    * — or guarantee distinct micros per key, as the test log's event ids
    * do, and omit it.
    */
  def windowFunnelStrictOrder(events: DataFrame, keyCol: String, opCol: String,
                              tsCol: String, steps: Seq[String],
                              windowMicros: Long,
                              tieCol: Option[String] = None): DataFrame = {
    val order = col("__tsl") +: tieCol.map(_ => col("__tie")).toSeq
    val byKey = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    funnelChassis(events, keyCol, opCol, tsCol, steps, windowMicros, tieCol) { i =>
      val prev = lag(col(s"__start${i - 1}"), 1).over(byKey)
      when(col("__op") === steps(i - 1) &&
        prev >= col("__tsl") - windowMicros, prev)
    }
  }

  /** ClickHouse `sequenceMatch('(?1)(?t<=gap)(?2)(?t<=gap)(?3)…')(ts,
    * cond₁, …)` per key: does SOME event chain match the steps in time
    * order with each CONSECUTIVE gap ≤ `maxGapMicros`? Differs from
    * [[windowFunnel]]'s single window over the whole chain — here every
    * hop is bounded separately, the pattern of session-ish sequence
    * queries ("click within 2 h of signup, purchase within 2 h of the
    * click").
    *
    * Same exactness argument as [[windowFunnel]], with the DP carrying
    * each row's OWN timestamp instead of the chain start: `reach_i` = own
    * ts on a step-i row whose predecessor max `reach_{i-1}` (over
    * strictly-earlier rows) lies within the gap — the max predecessor is
    * optimal because the only downstream constraint (next gap) is monotone
    * in it. k−1 running-max passes over ONE (key, ts) shuffle+sort.
    * Returns (key, matched) for every key.
    */
  def sequenceMatch(events: DataFrame, keyCol: String, opCol: String,
                    tsCol: String, steps: Seq[String],
                    maxGapMicros: Long): DataFrame =
    sequenceLevels(events, keyCol, opCol, tsCol, steps, maxGapMicros)
      .select(col(keyCol), (col("seq_level") === steps.size).as("matched"))

  /** The level form of [[sequenceMatch]]: the deepest step some gap-bounded
    * chain reaches per key (0 = first step never seen). Shares the exact
    * DP; [[sequenceMatch]] is `seq_level == k`. This is also the batch
    * anchor of the STREAMING funnel ([[graft.streaming.FunnelStream]]),
    * whose per-key state is precisely this DP's reach vector.
    */
  def sequenceLevels(events: DataFrame, keyCol: String, opCol: String,
                     tsCol: String, steps: Seq[String],
                     maxGapMicros: Long): DataFrame = {
    require(steps.size >= 2, "need at least two sequence steps")
    require(maxGapMicros > 0, s"bad maxGapMicros=$maxGapMicros")
    val before = Window.partitionBy(col(keyCol)).orderBy(col("__tsl"))
      .rangeBetween(Window.unboundedPreceding, -1)
    var df = events.select(col(keyCol),
        graft.functions.TimeCols.micros(col(tsCol)).as("__tsl"),
        col(opCol).as("__op"))
      .withColumn("__reach1", when(col("__op") === steps.head, col("__tsl")))
    for (i <- 2 to steps.size) {
      df = df.withColumn(s"__reach$i",
        when(col("__op") === steps(i - 1) &&
          max(col(s"__reach${i - 1}")).over(before) >= col("__tsl") - maxGapMicros,
          col("__tsl")))
    }
    val level = (steps.size to 1 by -1).foldLeft(lit(null).cast("int")) {
      (acc, i) => coalesce(acc, when(count(col(s"__reach$i")) > 0, i))
    }
    df.groupBy(col(keyCol))
      .agg(coalesce(level, lit(0)).cast("bigint").as("seq_level"))
  }

  /** One parsed hop of a sequenceMatch pattern: which step it matches and
    * the allowed gap interval [loMicros, hiMicros] from the PREVIOUS
    * matched event (lo defaults to 1 — strictly after — and hi to
    * unbounded, the plain `(?1)(?2)` adjacency).
    */
  private[graft] final case class PatternHop(step: Int, loMicros: Long,
                                             hiMicros: Long)

  private val RefTok = """\(\?(\d+)\)""".r
  private val TimeTok = """\(\?t(<=|>=|<|>)(\d+)\)""".r

  /** Parse the ClickHouse `sequenceMatch` pattern grammar — `(?N)` step
    * refs, `(?t<=X)`/`(?t<X)`/`(?t>=X)`/`(?t>X)` gap constraints BETWEEN
    * refs (micros here; combine freely, tightest wins), `.*` (a no-op:
    * intervening events are always allowed in this DP). Loud on garbage,
    * out-of-range refs, leading constraints, or an empty gap interval.
    */
  private[graft] def parsePattern(pattern: String,
                                  nSteps: Int): Seq[PatternHop] = {
    var i = 0
    var lo = 1L
    var hi = Long.MaxValue
    val hops = Seq.newBuilder[PatternHop]
    var nRefs = 0
    while (i < pattern.length) {
      val rest = pattern.substring(i)
      val m = RefTok.findPrefixMatchOf(rest)
        .orElse(TimeTok.findPrefixMatchOf(rest))
      if (m.isDefined) {
        val tok = m.get
        tok.matched match {
          case RefTok(n) =>
            val step = n.toInt
            require(step >= 1 && step <= nSteps,
              s"pattern ref (?$step) outside 1..$nSteps")
            require(lo <= hi,
              s"empty gap interval before (?$step): lo=$lo hi=$hi micros")
            hops += PatternHop(step - 1, lo, hi)
            nRefs += 1
            lo = 1L; hi = Long.MaxValue
          case TimeTok(op, v) =>
            require(nRefs > 0,
              s"pattern starts with a time constraint ($op$v) — nothing precedes it")
            val x = v.toLong
            op match {
              case "<=" => hi = math.min(hi, x)
              case "<" => hi = math.min(hi, x - 1)
              case ">=" => lo = math.max(lo, x)
              case ">" => lo = math.max(lo, x + 1)
            }
        }
        i += tok.matched.length
      } else if (rest.startsWith(".*")) i += 2
      else throw new IllegalArgumentException(
        s"unparsable pattern at offset $i: '$rest'")
    }
    require(lo == 1L && hi == Long.MaxValue,
      "pattern ends with a dangling time constraint — nothing follows it")
    val out = hops.result()
    require(out.size >= 2, s"pattern needs at least two step refs: $pattern")
    out
  }

  /** ClickHouse `sequenceMatch('(?1)(?t>=X)(?t<=Y)(?2)…')(ts, cond…)` with
    * the FULL pattern grammar: per-hop gap INTERVALS, including minimum
    * gaps (`(?t>X)` — "click at least ten minutes after signup"), repeated
    * and out-of-order step refs, and `.*`. [[sequenceMatch]] is the
    * uniform-`(?t<=gap)` special case (spec-pinned equal there).
    *
    * The DP generalizes [[sequenceLevels]]: each hop's predecessor window
    * becomes a RANGE frame `[ts − hi, ts − lo]` over the same (key, ts)
    * sort, and reach_i fires on EXISTENCE of a reach_{i−1} inside it
    * (max-over-frame is non-null ⟺ some valid predecessor) — exact, not
    * greedy, because each constraint binds only the CONSECUTIVE pair.
    * Still ONE shuffle; n−1 window passes sharing the sort. Note a
    * min-gap hop is exactly what the running-max DP of [[sequenceLevels]]
    * cannot express (a larger predecessor reach is worse there), which is
    * why the frame carries the interval instead.
    */
  def sequenceMatchPattern(events: DataFrame, keyCol: String, opCol: String,
                           tsCol: String, pattern: String,
                           steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "need at least one step condition")
    val hops = parsePattern(pattern, steps.size)
    var df = events.select(col(keyCol),
        graft.functions.TimeCols.micros(col(tsCol)).as("__tsl"),
        col(opCol).as("__op"))
      .withColumn("__reach1",
        when(col("__op") === steps(hops.head.step), col("__tsl")))
    for (i <- 2 to hops.size) {
      val h = hops(i - 1)
      val frame = Window.partitionBy(col(keyCol)).orderBy(col("__tsl"))
        .rangeBetween(
          if (h.hiMicros == Long.MaxValue) Window.unboundedPreceding
          else -h.hiMicros,
          -h.loMicros)
      df = df.withColumn(s"__reach$i",
        when(col("__op") === steps(h.step) &&
          max(col(s"__reach${i - 1}")).over(frame).isNotNull, col("__tsl")))
    }
    df.groupBy(col(keyCol))
      .agg((count(col(s"__reach${hops.size}")) > 0).as("matched"))
  }

  /** ClickHouse `deltaSum`: per key, the sum of POSITIVE deltas between
    * consecutive values in time order — monotone-counter rate accounting
    * that tolerates counter resets (a reset's negative delta contributes
    * nothing instead of poisoning the total). `tieCol` totally orders
    * same-timestamp rows so the result is deterministic on any layout.
    * One (key, ts) shuffle shared by the lag window and the aggregation.
    */
  def deltaSum(events: DataFrame, keyCol: String, tsCol: String,
               valueCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val prev = lag(col(valueCol), 1).over(w)
    events
      .withColumn("__d",
        when(col(valueCol) > prev, col(valueCol) - prev).otherwise(lit(0.0)))
      .groupBy(col(keyCol))
      .agg(sum(col("__d")).as("delta_sum"))
  }

  /** ClickHouse `sequenceCount`-style NON-OVERLAPPING chain counting: how
    * many disjoint chains of `steps` (time order, each consecutive gap ≤
    * `maxGapMicros`, no event reused) does each key's timeline contain?
    * Greedy with a refresh rule: a repeat of the just-matched step slides
    * the chain forward to the later occurrence (never worse for the next
    * gap — the exchange argument), a completed chain resets the scan, a
    * dead chain restarts at the next first-step event.
    *
    * Counting disjoint chains is inherently SEQUENTIAL per key (each event
    * is consumed by at most one chain), so this is the one Behavior
    * operator on the `mapPartitions` rung: repartition by key + in-
    * partition (key, ts, op) sort — the secondary-sort pattern, ONE
    * shuffle, streaming iteration with O(1) state per key run and one
    * output row per key. Keys are compared as strings (cast, lossless)
    * so the operator stays type-agnostic.
    */
  /** ClickHouse `windowFunnel(window, 'strict_dedup')`: the funnel mode
    * where a REPEAT of a condition already matched in the active chain
    * INTERRUPTS it (the chain's level is final; a repeat of the first
    * step starts a fresh chain at that event). The per-key answer is the
    * maximum level any chain reached. Steps must be distinct ops — the
    * same precondition the streaming funnel documents — so "already
    * matched" is well-defined.
    *
    * Inherently sequential (the interruption depends on chain membership,
    * which the window DP cannot carry), so it rides the [[sequenceCount]]
    * mapPartitions rung: repartition by key + in-partition (key, ts, op)
    * sort — ONE shuffle — and an O(1) automaton per key run. The DuckDB
    * oracle steps the IDENTICAL (lvl, start_ts, best) automaton per
    * ordered event via a recursive CTE (the sequence_count pattern).
    */
  def windowFunnelStrictDedup(events: DataFrame, keyCol: String,
                              opCol: String, tsCol: String,
                              steps: Seq[String],
                              windowMicros: Long): DataFrame = {
    require(steps.size >= 2, "need at least two funnel steps")
    require(steps.distinct.size == steps.size,
      "strict_dedup needs distinct step ops")
    require(windowMicros > 0, s"bad windowMicros=$windowMicros")
    val spark = events.sparkSession
    import spark.implicits._
    val nSteps = steps.size
    val stepIdx = steps.zipWithIndex.toMap
    val parts = graft.GraftSession.parallelismFloor(spark)
    val prepared = events.select(col(keyCol).cast("string").as("k"),
        graft.functions.TimeCols.micros(col(tsCol)).as("t"),
        col(opCol).cast("string").as("o"))
      .repartition(parts, col("k"))
      .sortWithinPartitions(col("k"), col("t"), col("o"))
      .as[(String, Long, String)]
    prepared.mapPartitions { rows =>
      var started = false
      var curKey: String = null
      var lvl = 0
      var st = 0L
      var best = 0L
      def step(o: String, t: Long): Unit = {
        if (lvl < nSteps && o == steps(lvl) &&
            (lvl == 0 || t - st <= windowMicros)) {
          if (lvl == 0) st = t
          lvl += 1
          if (lvl == nSteps) { best = nSteps.toLong; lvl = 0 }
          else if (lvl > best) best = lvl
        } else stepIdx.get(o) match {
          case Some(i) if lvl > 0 && i < lvl =>
            // dedup interruption: the chain dies at its current level; a
            // first-step repeat starts a fresh chain at this event
            if (lvl > best) best = lvl
            if (i == 0) { lvl = 1; st = t } else lvl = 0
          case Some(i) if lvl > 0 && i == lvl =>
            // the next expected step, but outside the window: chain expired
            if (lvl > best) best = lvl
            lvl = 0
          case _ => () // unrelated op (or steps past lvl): no effect
        }
      }
      val main = rows.flatMap { case (key, t, o) =>
        if (!started || key != curKey) {
          val flush =
            if (started) Iterator.single((curKey, math.max(best, lvl.toLong)))
            else Iterator.empty
          started = true; curKey = key; lvl = 0; st = 0L; best = 0L
          step(o, t)
          flush
        } else { step(o, t); Iterator.empty }
      }
      main ++ (if (started)
        Iterator.single((curKey, math.max(best, lvl.toLong)))
      else Iterator.empty)
    }.toDF("key", "funnel_level")
  }

  def sequenceCount(events: DataFrame, keyCol: String, opCol: String,
                    tsCol: String, steps: Seq[String],
                    maxGapMicros: Long): DataFrame = {
    require(steps.size >= 2, "need at least two sequence steps")
    require(maxGapMicros > 0, s"bad maxGapMicros=$maxGapMicros")
    val spark = events.sparkSession
    import spark.implicits._
    val nSteps = steps.size
    val parts = graft.GraftSession.parallelismFloor(spark)
    val prepared = events.select(col(keyCol).cast("string").as("k"),
        graft.functions.TimeCols.micros(col(tsCol)).as("t"),
        col(opCol).cast("string").as("o"))
      .repartition(parts, col("k"))
      .sortWithinPartitions(col("k"), col("t"), col("o"))
      .as[(String, Long, String)]
    prepared.mapPartitions { rows =>
      var started = false // a null key is a real group, not the sentinel
      var curKey: String = null
      var level = 0
      var lastTs = 0L
      var count = 0L
      def step(o: String, t: Long): Unit =
        if (level < nSteps && o == steps(level) &&
            (level == 0 || t - lastTs <= maxGapMicros)) {
          level += 1; lastTs = t
          if (level == nSteps) { count += 1; level = 0 }
        } else if (level > 0 && o == steps(level - 1)) {
          lastTs = t // refresh to the later occurrence
        } else if (o == steps.head) {
          level = 1; lastTs = t // dead chain; restart here
        }
      val main = rows.flatMap { case (key, t, o) =>
        if (!started || key != curKey) {
          val flush =
            if (started) Iterator.single((curKey, count))
            else Iterator.empty
          started = true; curKey = key; level = 0; count = 0
          step(o, t)
          flush
        } else { step(o, t); Iterator.empty }
      }
      // lazy concat: the tail flush runs only after `main` is exhausted
      main ++ (if (started) Iterator.single((curKey, count))
               else Iterator.empty)
    }.toDF("key", "n_chains")
  }

  /** ClickHouse `retention(cond₀, cond₁, …)` rolled up across keys: per
    * key, flag₀ = cond₀ held on ANY of its events, flagᵢ = cond₀ AND
    * condᵢ (order-free, unlike the funnels — "did the signed-up user ever
    * also click / purchase"); the result is ONE row of per-condition
    * retained-key counts r0..r{n−1}, the numerators of a retention table.
    *
    * One grouped aggregation (map-side combined booleans) then a scalar
    * fold — two shuffles, the second over one row per key with n flags.
    */
  def retention(events: DataFrame, keyCol: String, conds: Seq[Column]): DataFrame = {
    require(conds.size >= 2, "need at least two retention conditions")
    val flags = conds.zipWithIndex.map { case (c, i) =>
      max(when(c, 1L).otherwise(0L)).as(s"__c$i")
    }
    val perKey = events.groupBy(col(keyCol)).agg(flags.head, flags.tail: _*)
    val counts = conds.indices.map { i =>
      if (i == 0) sum(col("__c0")).as("r0")
      else sum(col("__c0") * col(s"__c$i")).as(s"r$i")
    }
    perKey.agg(counts.head, counts.tail: _*)
  }

  /** Hour-of-week seasonality profile: event count and mean value per
    * (ISO day-of-week, hour-of-day) cell — the 7×24 load heatmap capacity
    * planning reads over a mirrored event stream. `dow` is ISO (Monday=1 …
    * Sunday=7).
    *
    * One grouped aggregation into at most 168 cells at any scale; partial
    * aggregation collapses the log map-side, so the shuffle carries ≤168
    * rows per mapper. The mean is `sum(value)/count` rather than a float
    * `avg` — pass a decimal-cast measure and the sum is EXACT, making the
    * mean reproducible across engines and partitionings (a float avg's
    * partial-sum order isn't).
    */
  def hourOfWeekProfile(events: DataFrame, tsCol: String,
                        value: Column): DataFrame =
    events.groupBy(
      (weekday(col(tsCol)) + 1).cast("long").as("dow"),
      hour(col(tsCol)).cast("long").as("hod"))
      .agg(count(lit(1)).as("n_events"),
        (sum(value).cast("double") / count(lit(1))).as("avg_value"))

  /** Per-group min-max feature scaling: every row gains
    * `scaled = (value − min) / (max − min)` within its group — the
    * normalization stage of a feature pipeline (a constant group maps to
    * 0.5). The group stats frame is one row PER GROUP, aggregated
    * map-side and BROADCAST back onto the rows — no per-row window sort,
    * no second shuffle of the input at any scale where group cardinality
    * is bounded (event types, languages, sources…).
    */
  def minMaxScaled(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val stats = df.groupBy(col(groupCol))
      .agg(min(col(valueCol)).as("_mn"), max(col(valueCol)).as("_mx"))
    df.join(broadcast(stats), groupCol)
      .withColumn("scaled",
        when(col("_mx") === col("_mn"), 0.5)
          .otherwise((col(valueCol) - col("_mn")) / (col("_mx") - col("_mn"))))
      .drop("_mn", "_mx")
  }

  /** Exact quantile-bucket feature binning: every row gains the index of
    * its `buckets`-quantile bin (0-based; a value EQUAL to a boundary
    * lands in the lower bin) — equi-depth discretization for feature
    * pipelines, where [[minMaxScaled]] is the equi-width continuous twin.
    *
    * Boundaries come from ONE exact `percentile` aggregation (buckets−1
    * values) broadcast back onto the rows; the bin is `|{b : value > b}|`
    * computed row-level over that tiny array — no per-row window, no
    * global sort, no second shuffle of the input. At extreme scale swap
    * the exact percentile for `approx_percentile` and keep the rest.
    */
  def quantileBuckets(df: DataFrame, valueCol: String, buckets: Int): DataFrame = {
    require(buckets >= 2, s"bad buckets=$buckets")
    val ps = (1 until buckets).map(_.toDouble / buckets)
    val bounds = df.agg(
      expr(s"percentile($valueCol, array(${ps.mkString(",")}))").as("_b"))
    df.crossJoin(broadcast(bounds))
      .withColumn("bucket",
        expr(s"size(filter(_b, x -> $valueCol > x))").cast("long"))
      .drop("_b")
  }

  /** Robust outlier screen via median/MAD (median absolute deviation) —
    * the heavy-tail-safe twin of the 3σ z-score cut: one extreme value
    * shifts a mean/std gate but leaves the median and MAD untouched, so
    * this flags genuine anomalies even when the anomalies themselves
    * contaminate the fit. Rows whose |value − median| > k·MAD survive,
    * carrying `med`, `mad`, and the rounded modified score
    * `m_score = (value − med)/mad`. A group with MAD = 0 (over half its
    * values identical) flags every non-median row — by design — with a
    * null `m_score` (the score is undefined there, and ANSI-mode division
    * would refuse the literal 0 divide).
    *
    * Two grouped exact-percentile aggregations (group-cardinality-sized,
    * broadcast back onto the rows) — the fact table is scanned, never
    * shuffled on its own rows. Exact `percentile` sorts per group; at
    * extreme per-group cardinality swap in `approx_percentile` and keep
    * the shape.
    */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
                  k: Double): DataFrame = {
    require(k > 0, s"bad k=$k")
    val med = df.groupBy(col(groupCol))
      .agg(expr(s"percentile($valueCol, 0.5)").as("med"))
    val withMed = df.join(broadcast(med), groupCol)
    val mad = withMed.groupBy(col(groupCol))
      .agg(expr(s"percentile(abs($valueCol - med), 0.5)").as("mad"))
    withMed.join(broadcast(mad), groupCol)
      .where(abs(col(valueCol) - col("med")) > lit(k) * col("mad"))
      .withColumn("m_score", when(col("mad") =!= 0,
        round((col(valueCol) - col("med")) / col("mad"), 4)))
  }

  /** Cohort retention matrix: cohort = week of the key's first event;
    * one row per (cohort_week, active_week) with distinct active keys.
    */
  def cohortRetention(events: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val cohorts = events.groupBy(col(keyCol))
      .agg(date_trunc("WEEK", min(col(tsCol))).as("cohort_week"))
    events.select(col(keyCol), date_trunc("WEEK", col(tsCol)).as("active_week"))
      .join(cohorts, keyCol)
      .groupBy(col("cohort_week"), col("active_week"))
      .agg(countDistinct(col(keyCol)).as("active_keys"))
  }

  /** Per-key exponential smoothing (ClickHouse `exponentialMovingAverage`
    * by event order; pandas `ewm(alpha, adjust=False).mean()`): one EMA row
    * per event, `ema₀ = v₀`, `emaᵢ = α·vᵢ + (1−α)·emaᵢ₋₁` in (ts, id)
    * order. Inherently sequential (each row depends on the previous
    * result), so it rides the same secondary-sort `mapPartitions` rung as
    * [[sequenceCount]]: repartition by key + in-partition (key, ts, id)
    * sort — ONE shuffle, streaming iteration, O(1) state per key run,
    * one output row per input row.
    *
    * Cross-engine float determinism: the recurrence is evaluated as
    * literally `α·v + (1−α)·prev` — two exact-or-correctly-rounded IEEE
    * ops per row in a fixed order — so any engine stepping the same
    * recurrence over the same doubles reproduces the identical bits
    * (the DuckDB oracle steps it as a recursive CTE). No row-order
    * nondeterminism: `idCol` totally orders same-timestamp rows.
    */
  def exponentialMovingAvg(events: DataFrame, keyCol: String, idCol: String,
                           valCol: String, tsCol: String,
                           alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"bad alpha=$alpha")
    val spark = events.sparkSession
    import spark.implicits._
    val parts = graft.GraftSession.parallelismFloor(spark)
    val prepared = events.select(col(keyCol).cast("long").as("k"),
        graft.functions.TimeCols.micros(col(tsCol)).as("t"),
        col(idCol).cast("long").as("i"),
        col(valCol).cast("double").as("v"))
      .repartition(parts, col("k"))
      .sortWithinPartitions(col("k"), col("t"), col("i"))
      .as[(Long, Long, Long, Double)]
    val oneMinus = 1.0 - alpha
    prepared.mapPartitions { rows =>
      var started = false
      var curKey = 0L
      var prev = 0.0
      rows.map { case (key, _, id, v) =>
        val ema =
          if (!started || key != curKey) { started = true; curKey = key; v }
          else alpha * v + oneMinus * prev
        prev = ema
        (key, id, ema)
      }
    }.toDF("key", "id", "ema")
  }

  /** ClickHouse `exponentialTimeDecayedAvg`: per-event time-decayed mean
    * of the key's value series — `ema = Σvᵢ·2^(−kᵢ) / Σ2^(−kᵢ)` carried
    * as the num/den recurrence `num = v + num·d`, `den = 1 + den·d` with
    * `d = 2^(−Δ div halfLife)` (whole half-lives elapsed since the
    * previous event).
    *
    * Determinism contract, and why the decay quantizes to WHOLE
    * half-lives: `2^(−k)` for integer k is a power of two, and
    * multiplying a double by a power of two is EXACT (exponent shift) —
    * so the only rounded op per row is the one addition, and any IEEE-754
    * engine stepping the same recurrence reproduces identical bits (the
    * DuckDB oracle does, as a recursive CTE). A continuous
    * `exp(−Δ/τ)` would hostage the hash to last-ulp `exp` agreement
    * across libms. Same secondary-sort `mapPartitions` rung as
    * [[exponentialMovingAvg]]: ONE key shuffle, O(1) state per key run.
    */
  def timeDecayedAvg(events: DataFrame, keyCol: String, idCol: String,
                     valCol: String, tsCol: String,
                     halfLifeMicros: Long): DataFrame = {
    require(halfLifeMicros > 0, s"bad halfLifeMicros=$halfLifeMicros")
    val spark = events.sparkSession
    import spark.implicits._
    val parts = graft.GraftSession.parallelismFloor(spark)
    val prepared = events.select(col(keyCol).cast("long").as("k"),
        graft.functions.TimeCols.micros(col(tsCol)).as("t"),
        col(idCol).cast("long").as("i"),
        col(valCol).cast("double").as("v"))
      .repartition(parts, col("k"))
      .sortWithinPartitions(col("k"), col("t"), col("i"))
      .as[(Long, Long, Long, Double)]
    val hl = halfLifeMicros
    prepared.mapPartitions { rows =>
      var started = false
      var curKey = 0L
      var num = 0.0
      var den = 0.0
      var lastT = 0L
      rows.map { case (key, t, id, v) =>
        if (!started || key != curKey) {
          started = true; curKey = key; num = v; den = 1.0; lastT = t
        } else {
          // whole half-lives since the previous event; 2^(−k) is exact,
          // ·2^(−k) is an exponent shift — no mantissa rounding
          val k = math.min((t - lastT) / hl, 2000L).toInt
          val decay = java.lang.Math.scalb(1.0, -k)
          num = v + num * decay
          den = 1.0 + den * decay
          lastT = t
        }
        (key, id, num / den)
      }
    }.toDF("key", "id", "ema_t")
  }

  /** Largest-Triangle-Three-Buckets downsampling (ClickHouse
    * `largestTriangleThreeBuckets(n)`; Steinarsson 2013, public): per key,
    * reduce the (ts, y) series to `nBuckets` visually-representative
    * points — first and last always kept, the middle split into equal
    * count-range buckets, each bucket contributing the point that forms
    * the largest triangle with the PREVIOUSLY selected point and the NEXT
    * bucket's average. Series of ≤ `nBuckets` points pass through whole.
    *
    * Selection is sequential (each pick depends on the previous), so it
    * rides the secondary-sort `mapPartitions` rung like
    * [[exponentialMovingAvg]] — ONE key shuffle — but buffers each key's
    * RUN (LTTB needs the length for bucketing and the next bucket's
    * average before selecting; ClickHouse's aggregate buffers the same).
    * Per-key memory is the series, the cost class of any per-series
    * downsampler — pre-thin giant keys first if a key's series outgrows
    * an executor.
    *
    * Determinism contract: `y` must be INTEGRAL (pass cents, counts, …):
    * bucket averages then divide exact integer sums, and the triangle
    * areas are products of exactly-representable differences — every
    * engine stepping the same rule picks identical points (ties break to
    * the earlier point). A float `y` would make bucket sums
    * accumulation-order-dependent.
    */
  def lttbDownsample(events: DataFrame, keyCol: String, idCol: String,
                     tsCol: String, yCol: Column, nBuckets: Int): DataFrame = {
    require(nBuckets >= 3, s"bad nBuckets=$nBuckets")
    val spark = events.sparkSession
    import spark.implicits._
    val parts = graft.GraftSession.parallelismFloor(spark)
    val prepared = events.select(col(keyCol).cast("string").as("k"),
        graft.functions.TimeCols.micros(col(tsCol)).as("t"),
        col(idCol).cast("long").as("i"),
        yCol.cast("long").as("y"))
      .repartition(parts, col("k"))
      .sortWithinPartitions(col("k"), col("t"), col("i"))
      .as[(String, Long, Long, Long)]
    val nb = nBuckets
    prepared.mapPartitions { rows =>
      def select(key: String,
                 pts: IndexedSeq[(Long, Long, Long)]): Iterator[(String, Long, Long, Long)] = {
        val n = pts.length
        if (n <= nb) pts.iterator.map(p => (key, p._2, p._1, p._3))
        else {
          val m = n - 2
          // bucket of 0-based middle index i; buckets may be EMPTY when a
          // boundary rounds past them — an empty bucket selects nothing
          // and the previous pick carries forward, exactly the reference
          // rule
          val bucketOf = (i: Int) => (i.toLong * (nb - 2) / m).toInt
          val starts = Array.fill(nb - 2 + 1)(-1)
          var i = 0
          while (i < m) {
            val b = bucketOf(i)
            if (starts(b) < 0) starts(b) = i
            i += 1
          }
          starts(nb - 2) = m
          // fill ends: next non-empty start
          def range(b: Int): (Int, Int) = {
            if (starts(b) < 0) return (0, 0)
            var e = b + 1
            while (starts(e) < 0) e += 1
            (starts(b), starts(e))
          }
          val out = IndexedSeq.newBuilder[(Long, Long, Long)]
          out += pts(0)
          var prev = pts(0)
          var b = 0
          while (b < nb - 2) {
            val (s, e) = range(b)
            if (e > s) {
              // next representative: bucket b+1's integer-exact average,
              // or the last point when b+1 is empty / past the end
              val (ns, ne) = if (b + 1 < nb - 2) range(b + 1) else (0, 0)
              val (xn, yn) =
                if (ne > ns) {
                  var sx = 0L; var sy = 0L
                  var j = ns
                  while (j < ne) { sx += pts(1 + j)._1; sy += pts(1 + j)._3; j += 1 }
                  val cnt = (ne - ns).toDouble
                  (sx.toDouble / cnt, sy.toDouble / cnt)
                } else (pts(n - 1)._1.toDouble, pts(n - 1)._3.toDouble)
              val xp = prev._1; val yp = prev._3
              var best = -1; var bestA = -1.0
              var j = s
              while (j < e) {
                val p = pts(1 + j)
                val a = math.abs((xp.toDouble - xn) * (p._3 - yp).toDouble -
                  (xp - p._1).toDouble * (yn - yp.toDouble))
                if (a > bestA) { bestA = a; best = j }
                j += 1
              }
              val sel = pts(1 + best)
              out += sel
              prev = sel
            }
            b += 1
          }
          out += pts(n - 1)
          out.result().iterator.map(p => (key, p._2, p._1, p._3))
        }
      }
      var curKey: String = null
      var started = false
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      val main = rows.flatMap { case (key, t, id, y) =>
        if (!started || key != curKey) {
          val flush =
            if (started) select(curKey, buf.toIndexedSeq) else Iterator.empty
          started = true; curKey = key; buf.clear()
          buf += ((t, id, y))
          flush
        } else { buf += ((t, id, y)); Iterator.empty }
      }
      main ++ new Iterator[(String, Long, Long, Long)] {
        private var inner: Iterator[(String, Long, Long, Long)] = _
        private def it = {
          if (inner == null)
            inner = if (started) select(curKey, buf.toIndexedSeq) else Iterator.empty
          inner
        }
        def hasNext = it.hasNext
        def next() = it.next()
      }
    }.toDF("key", "id", "x", "y")
  }

  /** Per-key union-of-intervals length (ClickHouse `intervalLengthSum`):
    * each event spans `[t, t + dur)` in integer microseconds; overlapping
    * spans merge, and the result is the total covered time per key — the
    * "how long was this user actually active" statistic that naive
    * duration sums double-count.
    *
    * Classic sweep, but expressed as windows so it stays distributed and
    * exact: order spans by start within the key, carry the running max of
    * PRIOR ends; a span whose start clears that max begins a new island
    * (flag cumsum = island id); each island contributes
    * `max(end) − min(start)`. ONE (key, start) shuffle shared by both
    * window passes + one island-sized aggregation — the event log is
    * never self-joined. All arithmetic is integer micros → exact on any
    * engine.
    */
  def intervalUnionLength(events: DataFrame, keyCol: String, tsCol: String,
                          durMicrosCol: Column): DataFrame = {
    val spans = events.select(col(keyCol).as("k"),
        graft.functions.TimeCols.micros(col(tsCol)).as("s"),
        (graft.functions.TimeCols.micros(col(tsCol)) +
          greatest(durMicrosCol, lit(0L))).as("e"))
    val byStart = Window.partitionBy(col("k")).orderBy(col("s"), col("e"))
    val prevMax = max(col("e")).over(
      byStart.rowsBetween(Window.unboundedPreceding, -1))
    val islanded = spans
      .withColumn("__new_island",
        when(prevMax.isNull || col("s") > prevMax, 1L).otherwise(0L))
      .withColumn("__island",
        sum(col("__new_island")).over(
          byStart.rowsBetween(Window.unboundedPreceding, 0)))
    islanded.groupBy(col("k"), col("__island"))
      .agg((max(col("e")) - min(col("s"))).as("__len"))
      .groupBy(col("k"))
      .agg(sum(col("__len")).as("covered_micros"),
        count(lit(1)).as("n_islands"))
  }

  /** ClickHouse `maxIntersections` / `maxIntersectionsPosition`: the peak
    * number of simultaneously-open spans per key, and the sweep position
    * (integer micros) where that peak is FIRST reached. Spans are
    * half-open `[t, t + dur)` — at a shared boundary the closing span
    * closes before the opening one opens, so touching spans never count
    * as concurrent and a zero-length span intersects nothing.
    *
    * The classic sweep stays distributed: every span contributes a +1
    * delta at its start and a −1 at its end, the running delta sum over
    * (point, delta) order is the live span count, and one grouped pass
    * takes its max and the earliest point attaining it
    * (`max_by(point, (active, −point))`). Ties in the window order are
    * harmless: equal-delta rows at one point produce the same multiset of
    * running sums whatever their order, and rows tying on
    * (active, −point) carry the same point. ONE (key, point) shuffle,
    * integer arithmetic throughout → exact on any engine.
    */
  def maxIntersections(events: DataFrame, keyCol: String, tsCol: String,
                       durMicrosCol: Column): DataFrame = {
    val s = graft.functions.TimeCols.micros(col(tsCol))
    // a null duration is a zero-length span (not a null sweep point that
    // would sort nondeterministically)
    val dur = greatest(coalesce(durMicrosCol, lit(0L)), lit(0L))
    val starts = events.select(col(keyCol).as("k"), s.as("p"), lit(1L).as("delta"))
    val ends = events.select(col(keyCol).as("k"),
      (s + dur).as("p"), lit(-1L).as("delta"))
    val byPoint = Window.partitionBy(col("k")).orderBy(col("p"), col("delta"))
    starts.unionAll(ends)
      .withColumn("__active",
        sum(col("delta")).over(byPoint.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("k"))
      .agg(max(col("__active")).as("max_concurrent"),
        max_by(col("p"), struct(col("__active"), (-col("p")).as("np")))
          .as("peak_at_micros"))
  }

  /** First-order Markov transition matrix of `opCol` per key stream: one
    * row per observed (from_op, to_op) of CONSECUTIVE events within a key
    * (ordered by ts, id-tiebroken), with the transition count and the
    * row-normalized probability P(to | from).
    *
    * One key-partitioned lead window (the per-key sort every sequence
    * operator here pays, parallel across keys), one pair-key aggregate
    * map-side combined, and the row normalization is a window over the
    * aggregated type×type matrix itself (op-cardinality² rows — the
    * third exchange moves the ANSWER, and the pair pipeline executes
    * once; a marginals join would re-run it for the build side). The
    * event log itself shuffles twice, never self-joins.
    */
  def markovTransitions(events: DataFrame, keyCol: String, opCol: String,
                        tsCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val pairs = events
      .select(col(keyCol), col(opCol).as("from_op"), col(tsCol), col(idCol))
      .withColumn("to_op", lead(col("from_op"), 1).over(w))
      .where(col("to_op").isNotNull)
      .groupBy(col("from_op"), col("to_op")).agg(count(lit(1)).as("n"))
    val byFrom = Window.partitionBy(col("from_op"))
    pairs
      .withColumn("p", col("n").cast("double")
        / sum(col("n")).over(byFrom).cast("double"))
      .select(col("from_op"), col("to_op"), col("n"), col("p"))
  }

  /** Empirical entropy rate of the first-order behavior chain —
    * H(next | current) over [[markovTransitions]]' consecutive-pair
    * frame: how PREDICTABLE is the next event type given the current
    * one, in nats (0 = deterministic flows, ln(k) = uniform chaos). The
    * single-scalar health readout over the transition matrix (which
    * stays the drill-down), reported with H(next) and the predictability
    * ratio 1 − H(next|cur)/H(next).
    *
    * Implementation delegates the entropy folds to
    * [[graft.operators.StatTests.theilsU]] on the pair frame (rowC =
    * next, colC = current): the exact cell counts, the nested
    * fixed-order cumulative folds, and the degenerate-input drops are
    * already pinned there — this adds only the ONE key-partitioned lead
    * window that builds consecutive pairs. Output one row:
    * (n_transitions, h_next, h_rate, predictability).
    */
  def entropyRate(events: DataFrame, keyCol: String, opCol: String,
                  tsCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val pairs = events
      .select(col(keyCol), col(opCol).as("from_op"), col(tsCol), col(idCol))
      .withColumn("to_op", lead(col("from_op"), 1).over(w))
      .where(col("to_op").isNotNull)
    StatTests.theilsU(pairs, col("to_op"), col("from_op"))
      .select(col("n").as("n_transitions"), col("h_x").as("h_next"),
        col("h_x_given_y").as("h_rate"),
        col("theils_u").as("predictability"))
  }

  /** Lag-k autocorrelations of the hourly event-count series: one row per
    * requested lag with (lag, n pairs, Pearson r of count_t vs count_{t−k})
    * over hours ON the observed hourly grid (sequence-densified between
    * the observed min and max hour, absent hours counting 0 — a lag is a
    * real k-hour step, not k observed rows).
    *
    * Exact by construction: counts are integers, so all six moments per
    * lag are exact longs from ONE aggregate over the lagged frame; the
    * single double expression at the end is engine-reproducible (same
    * moment form as the corr family). The series is an hour-grained
    * aggregate — window sorts hours, not events.
    */
  def hourlyAutocorr(events: DataFrame, tsCol: String, lags: Seq[Int]): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ >= 1), s"bad lags=$lags")
    val observed = events
      .groupBy(date_trunc("HOUR", col(tsCol)).as("h"))
      .agg(count(lit(1)).as("x"))
    val spine = observed
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(explode(sequence(col("h0"), col("h1"),
        expr("INTERVAL 1 HOUR"))).as("h"))
    val series = spine.join(observed, Seq("h"), "left")
      .select(col("h"), coalesce(col("x"), lit(0L)).as("x"))
      // feeds both sides of the lag join below — materialize once
      .localCheckpoint(true)
    // r20: the old form computed |lags| window-lag columns over ONE global
    // window partition and aggregated 6·|lags| moment fields in that same
    // single task (measured: a 1.38 s one-task job holding most of
    // events_period_detect's wall; whole-stage codegen is also off past
    // 100 fields). Same exact pairs via a lag-exploded equi-join instead:
    // each hour row re-keys to h+k for every k and inner-joins the dense
    // series — (x_t, x_{t−k}) pairs for t−k inside the span, identical to
    // lag(x, k) over the dense grid. Moments are exact integer sums
    // (order-free), so the per-lag results are bit-identical; lags whose
    // span yields no pairs keep their (n = 0, NULL autocorr) row via the
    // left join from the lag list. Distributed: the explode fans the
    // span-sized series ×|lags| and the moment aggregate combines
    // map-side — no global window, no single-task stage.
    val lagList = lags.map(k => lit(k)) // one row per requested lag
    val shifted = series.select(
        explode(array(lagList: _*)).as("lag"), col("h"), col("x").as("y"))
      .select(col("lag"), expr("timestampadd(HOUR, lag, h)").as("h"),
        col("y"))
    val moments = series.join(shifted, Seq("h"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    // the lag list is a LITERAL frame (not derived from the series), so an
    // empty series still yields one (n = 0, NULL autocorr) row per lag —
    // the old global-aggregate behavior
    events.sparkSession.range(1)
      .select(explode(array(lagList: _*)).as("lag"))
      .join(moments, Seq("lag"), "left")
      .select(struct(col("lag"), coalesce(col("n"), lit(0L)).as("n"),
        col("sx"), col("sy"), col("sxy"), col("sxx"), col("syy")).as("m"))
      .select(col("m.lag").as("lag"), col("m.n").as("n"),
        round((col("m.n").cast("double") * col("m.sxy").cast("double")
          - col("m.sx").cast("double") * col("m.sy").cast("double"))
          / sqrt((col("m.n").cast("double") * col("m.sxx").cast("double")
            - col("m.sx").cast("double") * col("m.sx").cast("double"))
            * (col("m.n").cast("double") * col("m.syy").cast("double")
              - col("m.sy").cast("double") * col("m.sy").cast("double"))), 6)
          .as("autocorr"))
  }

  /** Lead-lag cross-correlation between TWO event types' hourly count
    * series — "do views lead purchases, and by how many hours": one row
    * per requested lag k with the Pearson r of (x_t, y_{t+k}) over the
    * SHARED dense hourly grid (sequence-densified across the union span
    * of both series, absent hours counting 0 — the [[hourlyAutocorr]]
    * grid convention, without which a sparse series would phantom-shift).
    * The argmax row is the lead estimate; a flat profile says the pair
    * is not temporally coupled.
    *
    * Exact by construction: both series are integer counts, each lag's
    * six moments are exact longs from ONE aggregate over the lead-shifted
    * frame, and the single double expression at the end is
    * engine-reproducible (the corr-family moment form). Scale: two
    * hour-grain aggregates + one window over HOURS (span-sized, never
    * event-sized) — the same shape at 10⁹ events as at 10⁵.
    */
  def hourlyCrossCorr(events: DataFrame, tsCol: String, opCol: String,
                      typeX: String, typeY: String,
                      lags: Seq[Int]): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ >= 0), s"bad lags=$lags")
    val byType = events.where(col(opCol).isin(typeX, typeY))
      .groupBy(date_trunc("HOUR", col(tsCol)).as("h"))
      .agg(sum(when(col(opCol) === typeX, 1L).otherwise(0L)).as("x"),
        sum(when(col(opCol) === typeY, 1L).otherwise(0L)).as("y"))
    val spine = byType
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(explode(sequence(col("h0"), col("h1"),
        expr("INTERVAL 1 HOUR"))).as("h"))
    val series = spine.join(byType, Seq("h"), "left")
      .select(col("h"), coalesce(col("x"), lit(0L)).as("x"),
        coalesce(col("y"), lit(0L)).as("y"))
    val w = Window.orderBy(col("h"))
    val shifted = lags.foldLeft(series) { (df, k) =>
      df.withColumn(s"_f$k", lead(col("y"), k).over(w))
    }
    val perLag = lags.map { k =>
      val y = col(s"_f$k")
      struct(lit(k).as("lag"),
        count(y).as("n"),
        sum(when(y.isNotNull, col("x"))).as("sx"), sum(y).as("sy"),
        sum(col("x") * y).as("sxy"),
        sum(when(y.isNotNull, col("x") * col("x"))).as("sxx"),
        sum(y * y).as("syy")).as(s"_m$k")
    }
    shifted.agg(perLag.head, perLag.tail: _*)
      .select(explode(array(lags.map(k => col(s"_m$k")): _*)).as("m"))
      .select(col("m.lag").as("lag"), col("m.n").as("n"), {
        // a zero-variance window (one series silent in the overlap)
        // has no defined correlation: null, never an ANSI divide error
        val denom = sqrt((col("m.n").cast("double")
          * col("m.sxx").cast("double")
          - col("m.sx").cast("double") * col("m.sx").cast("double"))
          * (col("m.n").cast("double") * col("m.syy").cast("double")
            - col("m.sy").cast("double") * col("m.sy").cast("double")))
        when(denom > 0.0,
          round((col("m.n").cast("double") * col("m.sxy").cast("double")
            - col("m.sx").cast("double") * col("m.sy").cast("double"))
            / denom, 6)).as("crosscorr")
      })
  }

  /** Classical additive seasonal decomposition of the hourly traffic
    * series at the daily period — the moving-average half of ClickHouse
    * `seriesDecomposeSTL` (trend via the standard CENTERED 2×24 MA,
    * seasonal = per-hour-of-day mean of the detrended series): the
    * seasonal PROFILE a capacity planner reads ("3am runs 40 below
    * trend"), where `events_seasonal_strength` only scores its existence.
    *
    * Exact to the last division: the grid is integer counts (dense,
    * 0-filled, the [[hourlyAutocorr]] spine), the 2×24 MA is kept as the
    * exact INTEGER numerator n48 = Σ₋₁₂..₊₁₁ x + Σ₋₁₁..₊₁₂ x (trend =
    * n48/48 never materializes as a float), the detrended value is the
    * integer 48·x − n48, and each hour-of-day's seasonal mean is one
    * division of exact integer sums Σd48 / (48·n) — order-independent,
    * engine-reproducible. Edge hours without a full MA window drop (no
    * phantom trend). Output 24 rows: hod, n_hours, seasonal, raw_mean
    * (6dp).
    *
    * Scale: one hour-grain aggregate; the MA windows sort the
    * calendar-bounded grid, never events.
    */
  def seasonalDecompose(events: DataFrame, tsCol: String): DataFrame = {
    val observed = events
      .groupBy(date_trunc("HOUR", col(tsCol)).as("h"))
      .agg(count(lit(1)).as("x"))
    val spine = observed
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(explode(sequence(col("h0"), col("h1"),
        expr("INTERVAL 1 HOUR"))).as("h"))
    val series = spine.join(observed, Seq("h"), "left")
      .select(col("h"), coalesce(col("x"), lit(0L)).as("x"))
    val w = Window.orderBy(col("h"))
    val staged = series
      .withColumn("na", sum(col("x")).over(w.rowsBetween(-12, 11)))
      .withColumn("ca", count(lit(1)).over(w.rowsBetween(-12, 11)))
      .withColumn("nb", sum(col("x")).over(w.rowsBetween(-11, 12)))
      .withColumn("cb", count(lit(1)).over(w.rowsBetween(-11, 12)))
      .where(col("ca") === 24 && col("cb") === 24)
      .withColumn("d48", lit(48L) * col("x") - (col("na") + col("nb")))
    staged.groupBy(hour(col("h")).cast("long").as("hod"))
      .agg(count(lit(1)).as("n_hours"), sum(col("d48")).as("sd48"),
        sum(col("x")).as("sx"))
      .select(col("hod"), col("n_hours"),
        round(col("sd48").cast("double")
          / (lit(48.0) * col("n_hours").cast("double")), 6).as("seasonal"),
        round(col("sx").cast("double") / col("n_hours").cast("double"), 6)
          .as("raw_mean"))
  }

  /** Top session journeys: sessionize each key's stream
    * ([[CdcOps.sessionize]] gap semantics), render the first `maxSteps`
    * event types of every session as a `>`-joined path, and count
    * sessions and distinct keys per path — the "what do users actually
    * do" report over the replicated event log.
    *
    * Session ids are tie-insensitive (equal-timestamp rows land in the
    * same session whatever their internal order), and the path itself
    * sorts (ts, id) so it is deterministic. Per-session state is bounded
    * by session length; two key-grained shuffles, no self-join.
    */
  def sessionPaths(events: DataFrame, keyCol: String, opCol: String,
                   tsCol: String, idCol: String, gapSeconds: Long,
                   maxSteps: Int = 5): DataFrame = {
    require(maxSteps >= 1, s"bad maxSteps=$maxSteps")
    val s = CdcOps.sessionize(events, Seq(keyCol), tsCol, gapSeconds)
    val paths = s.groupBy(col(keyCol), col("session_seq"))
      .agg(collect_list(struct(col(tsCol).as("s"), col(idCol).as("i"),
        col(opCol).as("t"))).as("evs"))
      .select(col(keyCol), expr("concat_ws('>', " +
        s"slice(transform(array_sort(evs), e -> e.t), 1, $maxSteps))")
        .as("path"))
    paths.groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"),
        count_distinct(col(keyCol)).as("n_users"))
  }

  /** Last-touch conversion attribution: each `convertOp` event attributes
    * to the LATEST preceding non-conversion event of the same key within
    * `windowMicros` (the marketing last-touch model), rolled up per
    * channel with exact-decimal attributed value. A composition of the
    * engine's own [[AsOfJoin]] — one backward as-of (its union-sort
    * shape, one shuffle) plus a channel rollup; conversions with no
    * touch in the window drop (unattributed).
    */
  def lastTouchAttribution(events: DataFrame, keyCol: String, opCol: String,
                           tsCol: String, valueCol: String, convertOp: String,
                           windowMicros: Long): DataFrame = {
    val conv = events.where(col(opCol) === convertOp)
      .select(col(keyCol), col(tsCol),
        col(valueCol).cast("decimal(18,2)").as("_v"))
    val touch = events.where(col(opCol) =!= convertOp)
      .select(col(keyCol), col(tsCol), col(opCol))
    AsOfJoin.backward(conv, touch, Seq(keyCol), tsCol, tsCol,
        toleranceMicros = Some(windowMicros))
      .groupBy(col(s"r_$opCol").as("channel"))
      .agg(count(lit(1)).as("n_conversions"),
        sum(col("_v")).cast("double").as("attributed_value"))
  }

  /** Linear multi-touch conversion attribution: each `convertOp` event
    * splits its credit EQUALLY across ALL preceding non-conversion
    * touches of the same key within `windowMicros` — the multi-touch
    * complement of [[lastTouchAttribution]] (last-touch hands the whole
    * conversion to whoever closed it; linear pays the touches that built
    * it). Credit is EXACT integer basis points: each touch takes
    * `10000 DIV n`, the remainder `10000 MOD n` goes to the LAST touch
    * ((ts, id)-latest — the deterministic largest-remainder convention),
    * so every attributed conversion distributes exactly 10 000 bp and
    * per-channel sums are order-independent integer sums — no float
    * credit fractions to drift across partitionings. Conversions with no
    * touch in the window drop (unattributed), as in last-touch.
    *
    * Scale shape: one equi-join on the key with the window range as a
    * post-join filter (per-key fan-out = conversions × touches inside
    * the window — bounded by per-key activity), then one
    * (key, conversion)-grain window for rank/size. The hub-key quadratic
    * is [[graft.operators.Graph.coOccurrenceEdges]]'s failure mode and
    * takes the same guard: keys with more than `maxKeyTouches` touch
    * events are EXCLUDED from attribution, counted, and reported loudly
    * (or fatally with `failOnOversized`) — a bot key with 10⁶ touches
    * and 10⁵ conversions must not silently fan out 10¹¹ join rows.
    * Output: (channel, n_conversions, n_touches, credit_bp).
    */
  def linearAttribution(events: DataFrame, keyCol: String, opCol: String,
                        tsCol: String, idCol: String, convertOp: String,
                        windowMicros: Long,
                        maxKeyTouches: Int = 1 << 16,
                        failOnOversized: Boolean = false): DataFrame = {
    require(windowMicros > 0, s"bad windowMicros=$windowMicros")
    require(maxKeyTouches >= 1, s"bad maxKeyTouches=$maxKeyTouches")
    val conv = events.where(col(opCol) === convertOp)
      .select(col(keyCol).as("__k"),
        graft.functions.TimeCols.micros(col(tsCol)).as("__cts"),
        col(idCol).as("__cid"))
    val touch = events.where(col(opCol) =!= convertOp)
      .select(col(keyCol).as("__k"),
        graft.functions.TimeCols.micros(col(tsCol)).as("__tts"),
        col(idCol).as("__tid"), col(opCol).as("channel"))
    val sizes = touch.groupBy(col("__k")).agg(count(lit(1)).as("__ksz"))
    val over = sizes.where(col("__ksz") > maxKeyTouches)
      .agg(count(lit(1)).as("n"), coalesce(sum(col("__ksz")), lit(0L)).as("rows"))
      .collect()(0)
    if (over.getLong(0) > 0) {
      val msg = s"linearAttribution: ${over.getLong(0)} key(s) exceed " +
        s"maxKeyTouches=$maxKeyTouches (${over.getLong(1)} touch rows " +
        "excluded) — cap hub keys upstream or raise the limit"
      if (failOnOversized) throw new IllegalStateException(msg)
      Console.err.println(s"[graft] WARN $msg")
    }
    val touchIn = touch.join(
      sizes.where(col("__ksz") <= maxKeyTouches).select(col("__k")), "__k")
    val j = conv.join(touchIn, Seq("__k"))
      .where(col("__tts") <= col("__cts") &&
        col("__tts") >= col("__cts") - windowMicros)
    val part = Window.partitionBy(col("__k"), col("__cid"))
    val ranked = j
      .withColumn("__rn", row_number().over(
        part.orderBy(col("__tts").desc, col("__tid").desc)))
      .withColumn("__n", count(lit(1)).over(part))
    ranked
      .withColumn("__bp", expr("10000L DIV __n") +
        when(col("__rn") === 1, expr("10000L % __n")).otherwise(0L))
      .groupBy(col("channel"))
      .agg(count_distinct(col("__cid")).as("n_conversions"),
        count(lit(1)).as("n_touches"),
        sum(col("__bp")).as("credit_bp"))
  }

  /** ClickHouse `sequenceNextNode('forward', 'first_match')`: per key
    * (events ordered by ts, tie), find the FIRST run of CONSECUTIVE
    * events matching `chain` and report the event type immediately after
    * it — the "where do users go after view→click" readout. A chain that
    * ends the key's stream reports `(end)`; keys whose chain never occurs
    * contribute no row. Output: (next_type, n_keys).
    *
    * Deterministic and exact: the per-key order is total ((ts, tie) with
    * a unique tie column), the first match is picked by `min_by` on the
    * row number, and the `(end)` sentinel is applied BEFORE the pick so a
    * stream-ending first match can never be skipped in favor of a later
    * one. Scale: chain-length `lead`s over per-key windows (never a
    * global order), then two key-grain aggregations — state per key is
    * one row, the same shape at 10⁹ keys as at 10³.
    */
  def sequenceNextNode(events: DataFrame, keyCol: String, opCol: String,
                       tsCol: String, tieCol: String,
                       chain: Seq[String]): DataFrame = {
    require(chain.nonEmpty, "need a non-empty chain")
    val w = Window.partitionBy(col("__k")).orderBy(col("__tsl"), col("__tie"))
    var df = events.select(col(keyCol).as("__k"),
        graft.functions.TimeCols.micros(col(tsCol)).as("__tsl"),
        col(tieCol).as("__tie"), col(opCol).as("__op"))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__next",
        coalesce(lead(col("__op"), chain.size).over(w), lit("(end)")))
    for (i <- 1 until chain.size)
      df = df.withColumn(s"__l$i", lead(col("__op"), i).over(w))
    val matched = chain.zipWithIndex.map { case (c, i) =>
      (if (i == 0) col("__op") else col(s"__l$i")) === c
    }.reduce(_ && _)
    df.where(matched)
      .groupBy(col("__k"))
      .agg(min_by(col("__next"), col("__rn")).as("next_type"))
      .groupBy(col("next_type"))
      .agg(count(lit(1)).as("n_keys"))
  }

  /** ClickHouse `deltaSum` over per-key counters, aggregated to the group
    * grain: the sum of POSITIVE increments of `cents` per key in (ts,
    * tie) order — decreases (counter resets) contribute nothing rather
    * than subtracting, the standard monotone-counter rate readout. Exact:
    * integer cents deltas summed as int64; one per-(group, key) lag
    * window, then one grouped pass (map-side combined). Output: (group,
    * n_keys — keys with ≥ 2 observations, n_increments, delta_sum =
    * cents/100 as one exact-long-over-constant division).
    */
  def deltaSumCents(events: DataFrame, groupCol: String, keyCol: String,
                    cents: Column, tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col("__g"), col("__k"))
      .orderBy(col("__tsl"), col("__tie"))
    events.select(col(groupCol).as("__g"), col(keyCol).as("__k"),
        graft.functions.TimeCols.micros(col(tsCol)).as("__tsl"),
        col(tieCol).as("__tie"), cents.cast("long").as("__c"))
      .where(col("__c").isNotNull)
      .withColumn("__prev", lag(col("__c"), 1).over(w))
      .where(col("__prev").isNotNull)
      .withColumn("__d", when(col("__c") > col("__prev"),
        col("__c") - col("__prev")).otherwise(lit(0L)))
      .groupBy(col("__g"))
      .agg(countDistinct(col("__k")).as("n_keys"),
        sum(when(col("__d") > 0, 1L).otherwise(0L)).as("n_increments"),
        (sum(col("__d")).cast("double") / lit(100.0)).as("delta_sum"))
      .withColumnRenamed("__g", groupCol)
  }

  /** Burstiness coefficient of each key's inter-event gaps — Goh &
    * Barabási's B = (σ−μ)/(σ+μ) over the gap distribution: −1 for a
    * metronome, 0 for a Poisson process, →1 for extreme bursts. Gaps are
    * exact integer microseconds from one key-partitioned lead window;
    * the population moments accumulate exactly (Σg as long, Σg² as
    * decimal(38,0) — gap squares overflow a long), and the closed form
    * at the end is the only floating-point step, rounded to 6dp because
    * Σg² can exceed 2⁵³ (the decimal→double cast is the one
    * engine-specific ulp). Keys need ≥ 2 gaps.
    */
  def burstiness(events: DataFrame, keyCol: String, tsCol: String,
                 idCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val us = graft.functions.TimeCols.micros(col(tsCol))
    events
      .select(col(keyCol), col(tsCol), col(idCol), us.as("_t"))
      .withColumn("_gap", lead(col("_t"), 1).over(w) - col("_t"))
      .where(col("_gap").isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_gaps"), sum(col("_gap")).as("_sg"),
        sum(col("_gap").cast("decimal(38,0)") * col("_gap")).as("_sg2"))
      .where(col("n_gaps") >= 2 && col("_sg") > 0)
      .select(col(keyCol), col("n_gaps"), {
        val n = col("n_gaps").cast("double")
        val mu = col("_sg").cast("double") / n
        val sd = sqrt(col("_sg2").cast("double") / n - mu * mu)
        round((sd - mu) / (sd + mu), 6).as("burstiness")
      })
  }

  /** Dickey–Fuller stationarity statistic of the dense hourly
    * event-count series (the zero-lag, no-drift form): regress
    * Δxₜ = γ·xₜ₋₁ + ε through the origin and report γ̂ and its
    * t-statistic — strongly negative t ⇒ mean-reverting (stationary)
    * traffic, t near 0 ⇒ a unit root (drifting level). The companion of
    * [[hourlyAutocorr]] on the same sequence-densified hourly grid.
    *
    * Counts are integers, so Σzy, Σz², Σy² are exact longs from one
    * aggregate over the lagged frame; γ̂ = Σzy/Σz², SE² =
    * ((Σy²−γ̂Σzy)/(n−1))/Σz², and the two output doubles round to 6dp —
    * engine-reproducible (the stat-moment convention).
    */
  def hourlyAdf(events: DataFrame, tsCol: String): DataFrame = {
    val observed = events
      .groupBy(date_trunc("HOUR", col(tsCol)).as("h"))
      .agg(count(lit(1)).as("x"))
    val spine = observed
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(explode(sequence(col("h0"), col("h1"),
        expr("INTERVAL 1 HOUR"))).as("h"))
    val series = spine.join(observed, Seq("h"), "left")
      .select(col("h"), coalesce(col("x"), lit(0L)).as("x"))
    val w = Window.orderBy(col("h"))
    val lagged = series.withColumn("z", lag(col("x"), 1).over(w))
      .where(col("z").isNotNull)
      .select((col("x") - col("z")).as("y"), col("z"))
    lagged.agg(count(lit(1)).as("n"), sum(col("z") * col("y")).as("szy"),
        sum(col("z") * col("z")).as("szz"), sum(col("y") * col("y")).as("syy"))
      .where(col("szz") > 0 && col("n") > 1)
      .select(col("n") +: {
        val g = col("szy").cast("double") / col("szz").cast("double")
        val ss = col("syy").cast("double") - g * col("szy").cast("double")
        val se = sqrt((ss / (col("n").cast("double") - 1.0))
          / col("szz").cast("double"))
        Seq(round(g, 6).as("gamma"), round(g / se, 6).as("df_t"))
      }: _*)
  }

  /** Holt linear-trend (double-exponential) smoothing of the dense hourly
    * event-count series, α = β = 1/2. Both smoothing constants are EXACT
    * binary doubles on purpose — a recurrence ACCUMULATES representation
    * error, so the textbook 0.3 (inexact in binary) would make the fold
    * engine-visible; with dyadic constants every step is an
    * order-determined IEEE expression any engine reproduces bit-for-bit.
    *
    * lₜ = α·xₜ + (1−α)(lₜ₋₁+bₜ₋₁); bₜ = β(lₜ−lₜ₋₁) + (1−β)bₜ₋₁ is
    * inherently sequential — but the SERIES is time-grained, bounded by
    * the observed hour span, never by row count. So the raw events
    * collapse in one grouped pass, and the recurrence folds over a
    * single `array_sort(collect_list(...))` with the Catalyst
    * higher-order `aggregate` — 3-scalar fold state, no driver loop, no
    * UDF. Init l₁ = x₁, b₁ = 0 (zero-trend prior). Output one row:
    * hour count, final level/trend, linear forecasts level + h·trend.
    * (At an unbounded series length the same fold runs per bounded
    * window — the state is 2 scalars, so it streams.)
    */
  def hourlyHolt(events: DataFrame, tsCol: String): DataFrame = {
    val observed = events
      .groupBy(date_trunc("HOUR", col(tsCol)).as("h"))
      .agg(count(lit(1)).as("x"))
    val spine = observed
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(explode(sequence(col("h0"), col("h1"),
        expr("INTERVAL 1 HOUR"))).as("h"))
    val series = spine.join(observed, Seq("h"), "left")
      .select(col("h"), coalesce(col("x"), lit(0L)).as("x"))
    series
      .agg(array_sort(collect_list(struct(col("h"), col("x")))).as("s"))
      .select(size(col("s")).cast("long").as("n_hours"),
        expr("""aggregate(
            slice(transform(s, e -> CAST(e.x AS DOUBLE)), 2, size(s) - 1),
            named_struct('l', CAST(s[0].x AS DOUBLE), 'b', CAST(0.0 AS DOUBLE)),
            (acc, x) -> named_struct(
              'l', 0.5D * x + 0.5D * (acc.l + acc.b),
              'b', 0.5D * ((0.5D * x + 0.5D * (acc.l + acc.b)) - acc.l)
                   + 0.5D * acc.b))""").as("st"))
      .select(col("n_hours"),
        round(col("st.l"), 6).as("level"),
        round(col("st.b"), 6).as("trend"),
        round(col("st.l") + col("st.b"), 6).as("forecast_1h"),
        round(col("st.l") + lit(24.0) * col("st.b"), 6).as("forecast_24h"))
  }

  /** Additive Holt–Winters (triple-exponential) forecast of the dense
    * hourly series — [[hourlyHolt]] plus the SEASONAL component, the
    * member of the smoothing family that actually fits diurnal traffic:
    * level/trend/season recurrences with α = β = γ = 1/2 (dyadic on
    * purpose — every IEEE step of the recurrence is order-determined, so
    * the DuckDB oracle replays it in a recursive CTE and hash-matches
    * bit-for-bit, the [[hourlyHolt]] argument extended to a `period`-slot
    * seasonal state vector).
    *
    * Init is the textbook one, exact by construction: season[j] = x[j] −
    * mean(first period); level = that mean; trend = (mean of period 2 −
    * mean of period 1)/period when two full periods exist, else 0 — all
    * sums of integer counts in doubles (exact below 2⁵³), so the handoff
    * into the recurrence is bit-identical on any engine. Series shorter
    * than one period yield an empty frame (nothing to init from).
    *
    * Scale shape: identical to [[hourlyHolt]] — the raw log collapses to
    * the hour grain in one map-side-combined pass; the fold runs over the
    * TIME-grained array (state = 2 scalars + `period` doubles), never row
    * volume; output is `horizon` rows of (h, forecast).
    */
  def hourlyHoltWinters(events: DataFrame, tsCol: String,
                        period: Int = 24, horizon: Int = 24): DataFrame = {
    require(period >= 2 && period <= 8760, s"bad period=$period")
    require(horizon >= 1 && horizon <= 8760, s"bad horizon=$horizon")
    val observed = events
      .groupBy(date_trunc("HOUR", col(tsCol)).as("h"))
      .agg(count(lit(1)).as("x"))
    val spine = observed
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(explode(sequence(col("h0"), col("h1"),
        expr("INTERVAL 1 HOUR"))).as("h"))
    val series = spine.join(observed, Seq("h"), "left")
      .select(col("h"), coalesce(col("x"), lit(0L)).as("x"))
    val p = period
    // one row holding the whole time-grained series, ascending
    val arr = series
      .agg(array_sort(collect_list(struct(col("h"), col("x")))).as("s"))
      .select(expr("transform(s, e -> CAST(e.x AS DOUBLE))").as("xs"))
      .where(size(col("xs")) >= lit(p))
    // slot of element index i (0-based) is i % p; element_at is 1-based.
    // lnew is repeated textually inside bnew/snew — a fold lambda has no
    // let-binding, and the VALUE is what must match the oracle, not the
    // syntax (same expression tree ⇒ same IEEE result)
    val lnew = s"0.5D * (x - element_at(acc.s, pmod(acc.i, $p) + 1)) " +
      s"+ 0.5D * (acc.l + acc.b)"
    val folded = arr.select(size(col("xs")).cast("long").as("n_hours"),
      expr(
        s"""aggregate(
            slice(xs, $p + 1, size(xs) - $p),
            named_struct(
              'l', aggregate(slice(xs, 1, $p), 0.0D, (a, v) -> a + v) / $p.0D,
              'b', IF(size(xs) >= 2 * $p,
                (aggregate(slice(xs, $p + 1, $p), 0.0D, (a, v) -> a + v) / $p.0D
                 - aggregate(slice(xs, 1, $p), 0.0D, (a, v) -> a + v) / $p.0D)
                / $p.0D,
                0.0D),
              's', transform(slice(xs, 1, $p), v ->
                v - aggregate(slice(xs, 1, $p), 0.0D, (a, v2) -> a + v2) / $p.0D),
              'i', $p),
            (acc, x) -> named_struct(
              'l', $lnew,
              'b', 0.5D * (($lnew) - acc.l) + 0.5D * acc.b,
              's', transform(acc.s, (v, j) -> IF(j = pmod(acc.i, $p),
                     0.5D * (x - ($lnew)) + 0.5D * v, v)),
              'i', acc.i + 1))""").as("st"))
    folded
      .select(col("n_hours"), col("st"),
        explode(sequence(lit(1), lit(horizon))).as("h"))
      .select(col("h").cast("long").as("h"),
        round(col("st.l") + col("h").cast("double") * col("st.b") +
          expr(s"element_at(st.s, CAST(pmod(n_hours + h - 1, $p) + 1 AS INT))"),
          6).as("forecast"))
  }

  /** Dominant-period detection over the dense hourly series — the
    * ClickHouse `seriesPeriodDetectFFT` intent, deliberately re-expressed
    * by the AUTOCORRELATION method: the lag in [minLag, maxLag] whose
    * Pearson autocorrelation is highest (6dp-rounded, lowest lag on
    * ties). An FFT answers the same question but in engine-specific
    * float butterflies; the autocorrelation sweep is exact integer
    * moments per lag ([[hourlyAutocorr]]) and one deterministic argmax —
    * cross-engine reproducible, and O(lags × T) on the TIME-grained
    * series (never row volume). One row: (period_hours, n, autocorr).
    */
  def periodDetect(events: DataFrame, tsCol: String,
                   minLag: Int, maxLag: Int): DataFrame = {
    require(2 <= minLag && minLag <= maxLag && maxLag <= 1024,
      s"bad lag range [$minLag,$maxLag]")
    hourlyAutocorr(events, tsCol, minLag to maxLag)
      .orderBy(col("autocorr").desc_nulls_last, col("lag"))
      .limit(1)
      .select(col("lag").as("period_hours"), col("n"), col("autocorr"))
  }

  /** Theil–Sen robust trend of the daily event-count series: the MEDIAN
    * of all pairwise slopes (xⱼ−xᵢ)/(tⱼ−tᵢ) over day indices, plus the
    * matching median intercept — the outlier-immune answer to "is
    * traffic growing" (a single anomalous day drags OLS, not this).
    *
    * Slopes are rationals of exact integers evaluated in ONE double
    * division each; the median interpolation is the `percentile` ≡
    * `quantile_cont` convention. Pair count is O(T²) in the DAY span T
    * — a time-grained bound independent of row volume (150 days = 11k
    * pairs whether the log holds 10⁴ or 10¹² events); the raw log
    * collapses to the day grain in one map-side-combined pass first.
    * Output one row: n_days, n_pairs, slope, intercept.
    */
  def dailyTheilSen(events: DataFrame, tsCol: String): DataFrame = {
    val daily = events.groupBy(to_date(col(tsCol)).as("d"))
      .agg(count(lit(1)).as("x"))
    val indexed = daily
      .crossJoin(broadcast(daily.agg(min(col("d")).as("d0"))))
      .select(datediff(col("d"), col("d0")).as("t"), col("x"))
      .localCheckpoint(true) // feeds the pair join twice + intercept pass
    val pairs = indexed.as("a")
      .join(indexed.as("b"), col("a.t") < col("b.t"))
      .select(((col("b.x") - col("a.x")).cast("double")
        / (col("b.t") - col("a.t")).cast("double")).as("slope"))
    val sl = pairs.agg(count(lit(1)).as("n_pairs"),
      expr("percentile(slope, 0.5)").as("m"))
    indexed.crossJoin(broadcast(sl))
      .agg(count(lit(1)).as("n_days"), max(col("n_pairs")).as("n_pairs"),
        round(max(col("m")), 6).as("slope"),
        round(expr("percentile(CAST(x AS DOUBLE) - m * CAST(t AS DOUBLE), 0.5)"),
          6).as("intercept"))
  }

  /** Mann–Kendall trend test of the daily series — [[dailyTheilSen]]'s
    * hypothesis-test sibling (Theil–Sen estimates HOW steep, this says
    * whether a monotone trend EXISTS at all, distribution-free):
    * S = Σ_{i<j} sign(xⱼ − xᵢ), Var(S) = [n(n−1)(2n+5) −
    * Σₜ t(t−1)(2t+5)]/18 with the tie correction over equal values, and
    * the continuity-corrected z = (S ∓ 1)/√Var (0 when S = 0); two-sided
    * p via the shared A&S Φ ([[StatTests]] convention).
    *
    * All exact integers until the final two divisions: S from an exact
    * sign-pair count, both Var terms integer products. Pair count is
    * O(T²) in the DAY span (time-grained — the [[dailyTheilSen]]
    * argument), the tie term one grouped pass over distinct counts.
    * Output one row: n_days, s, z, p, trend (+1/−1/0 at α = 0.05).
    */
  def dailyMannKendall(events: DataFrame, tsCol: String): DataFrame = {
    val daily = events.groupBy(to_date(col(tsCol)).as("d"))
      .agg(count(lit(1)).as("x"))
    val indexed = daily
      .crossJoin(broadcast(daily.agg(min(col("d")).as("d0"))))
      .select(datediff(col("d"), col("d0")).as("t"), col("x"))
      .localCheckpoint(true) // feeds the pair join twice + the tie pass
    val s = indexed.as("a").join(indexed.as("b"), col("a.t") < col("b.t"))
      .agg(sum(signum(col("b.x") - col("a.x")).cast("long")).as("s"),
        count(lit(1)).as("n_pairs"))
    val ties = indexed.groupBy(col("x")).agg(count(lit(1)).as("tk"))
      .agg(coalesce(sum(col("tk") * (col("tk") - 1L) *
        (lit(2L) * col("tk") + 5L)), lit(0L)).as("tie_term"))
    val n = indexed.agg(count(lit(1)).as("n_days"))
    val varS = (col("n_days") * (col("n_days") - 1L) *
      (lit(2L) * col("n_days") + 5L) - col("tie_term")).cast("double") /
      lit(18.0)
    val z = when(col("s") > 0L, (col("s").cast("double") - 1.0) / sqrt(varS))
      .when(col("s") < 0L, (col("s").cast("double") + 1.0) / sqrt(varS))
      .otherwise(lit(0.0))
    n.crossJoin(broadcast(s)).crossJoin(broadcast(ties))
      .where(col("n_days") >= 3 && varS > 0.0)
      .select(col("n_days"), col("s"), round(z, 6).as("z"),
        round(StatTests.normalTwoSidedP(z), 6).as("p"),
        when(round(StatTests.normalTwoSidedP(z), 6) >= 0.05, 0L)
          .otherwise(signum(col("s")).cast("long")).as("trend"))
  }

  /** Wald–Wolfowitz runs test of the daily series against its median —
    * "is day-to-day traffic RANDOM around its level, or does it stick in
    * regimes": too few runs of consecutive above/below-median days means
    * autocorrelated regimes, too many means oscillation. R = number of
    * sign runs over the day-ordered sequence (median-equal days are
    * excluded, the standard convention); E[R] = 2n₁n₂/(n₁+n₂) + 1,
    * Var(R) = 2n₁n₂(2n₁n₂−n₁−n₂)/((n₁+n₂)²(n₁+n₂−1)); z = (R−E)/√Var,
    * two-sided p via the shared Φ.
    *
    * The median is the [[dailyTheilSen]] `percentile` convention; runs
    * count via one lag window over the TIME-grained day frame; every
    * Var/E term is an exact integer ratio evaluated in one fixed double
    * tree. Output one row: n_days, n_above, n_below, n_runs, z, p.
    */
  def dailyRunsTest(events: DataFrame, tsCol: String): DataFrame = {
    val daily = events.groupBy(to_date(col(tsCol)).as("d"))
      .agg(count(lit(1)).as("x"))
    val med = daily.agg(expr("percentile(CAST(x AS DOUBLE), 0.5)").as("m"))
    val signed = daily.crossJoin(broadcast(med))
      .where(col("x").cast("double") =!= col("m"))
      .select(col("d"), (col("x").cast("double") > col("m")).as("up"))
    val w = Window.orderBy(col("d"))
    val runs = signed
      .withColumn("brk",
        when(lag(col("up"), 1).over(w).isNull ||
          lag(col("up"), 1).over(w) =!= col("up"), 1L).otherwise(0L))
      .agg(count(lit(1)).as("n_days"),
        sum(when(col("up"), 1L).otherwise(0L)).as("n1"),
        sum(when(!col("up"), 1L).otherwise(0L)).as("n2"),
        sum(col("brk")).as("r"))
      .where(col("n1") >= 1 && col("n2") >= 1 && col("n1") + col("n2") >= 3)
    val n1d = col("n1").cast("double"); val n2d = col("n2").cast("double")
    val nd = n1d + n2d
    val eR = lit(2.0) * n1d * n2d / nd + lit(1.0)
    val varR = lit(2.0) * n1d * n2d * (lit(2.0) * n1d * n2d - n1d - n2d) /
      (nd * nd * (nd - lit(1.0)))
    val z = (col("r").cast("double") - eR) / sqrt(varR)
    runs.where(varR > 0.0)
      .select(col("n_days"), col("n1").as("n_above"),
        col("n2").as("n_below"), col("r").as("n_runs"),
        round(z, 6).as("z"),
        round(StatTests.normalTwoSidedP(z), 6).as("p"))
  }

  /** Time-weighted average of `valueCol` per key — each observation
    * weighted by how long it HELD (until the next event), the
    * step-function mean a metrics store reports for irregularly-sampled
    * gauges (last observation carries no weight; keys with one event drop).
    *
    * Exact until the last step: value is decimal(18,2), hold duration is
    * integer microseconds, the weighted sum is an exact decimal, and the
    * single final division is the only floating-point op. One key-
    * partitioned window (parallel across keys), one aggregate.
    */
  def timeWeightedAvg(events: DataFrame, keyCol: String, tsCol: String,
                      idCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val us = graft.functions.TimeCols.micros(col(tsCol))
    events
      .select(col(keyCol), col(tsCol), col(idCol),
        col(valueCol).cast("decimal(18,2)").as("_v"), us.as("_t"))
      .withColumn("_hold", lead(col("_t"), 1).over(w) - col("_t"))
      .where(col("_hold").isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_holds"),
        sum(col("_v") * col("_hold")).as("_wsum"),
        sum(col("_hold")).as("_wtot"))
      .where(col("_wtot") > 0)
      // rounded: the exact decimal weighted sum can exceed 2^53, so the
      // one decimal→double cast rounds engine-specifically at the last ulp
      .select(col(keyCol), col("n_holds"),
        round(col("_wsum").cast("double") / col("_wtot").cast("double"), 6)
          .as("twa_value"))
  }
}
