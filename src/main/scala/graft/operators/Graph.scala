package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{bridge => sqlBridge}

/** Graph analytics over co-occurrence edges — the PageRank sibling of the
  * label-propagation connected components in [[Dedup]].
  *
  * Determinism design: classic float PageRank is NOT engine-reproducible
  * (each iteration's contribution sum is an order-dependent float
  * reduction), so this implementation runs in FIXED-POINT INTEGER
  * arithmetic — ranks are longs in nano-units (1.0 = 10⁹), every
  * contribution is an integer division `p DIV deg` (the dropped remainder
  * is dropped identically on any engine), sums are exact longs, and the
  * damping step is `150·10⁶ + (sum·850) DIV 1000`. Bit-for-bit equal on
  * any engine and any partitioning — a float PageRank can only ever be
  * compared approximately; this one hash-matches an independent engine.
  */
object Graph {

  /** Run an iterative fixed-point loop with its input rebound into an
    * ITERATION CHILD SESSION: shared SparkContext/cache/catalog, own
    * SQLConf with AQE off and fixed shuffle parallelism — the
    * [[MaterializedJoin]] maintenance-session finding (round 15, measured
    * 50→15 driver jobs per batch) applied to the synchronous-Pregel
    * operators. Rationale: AQE materializes EVERY exchange of EVERY
    * round's plan as its own driver job to re-plan it; a k-round loop with
    * 2-3 exchanges per round pays 2-3k extra job round-trips for runtime
    * re-planning that buys nothing on fixed-shape node/edge-sized
    * exchanges. On a real cluster each job round-trip is ~200-500 ms of
    * driver latency — the job chain, not data volume, is the wall-clock
    * of an iterative round at high k. The caller's session and its AQE
    * settings are untouched; results are bit-identical (all-integer
    * operators, partition-count-independent).
    *
    * Shuffle parallelism defaults to the caller's `shuffle.partitions`
    * (AQE's coalescing is what normally shrinks it; without AQE the fixed
    * count is the right knob) — override with `graft.graph.iterPartitions`.
    */
  private def inIterSession(df: DataFrame)(
      body: DataFrame => DataFrame): DataFrame = {
    val spark = df.sparkSession
    if (spark.conf.getOption("graft.graph.iterSession").contains("false"))
      return body(df) // escape hatch: run in the caller's session as-is
    // CLONE (not newSession): the child inherits the caller's full
    // runtime SQLConf (ANSI mode, caseSensitive, session timezone, …)
    // and temp-view catalog, so a view-backed edge frame re-resolves and
    // runtime-set caller confs survive — only the two iteration knobs
    // below are overridden (r17 advice: a bare newSession silently reset
    // caller confs to startup defaults inside the loops)
    val child = org.apache.spark.sql.graft.bridge.cloneSession(spark)
    child.conf.set("spark.sql.adaptive.enabled", "false")
    // r20: the fixed caller floor made every pre-loop stage (edge
    // distinct, degree join, node census) run 32-partition task waves on
    // few-MB frames — size the INITIAL parallelism from the input's
    // actual leaf bytes (materialized checkpoint blocks / scan stats, ×4
    // for the pair fan-out) at the same 8 MB compute-dense target the
    // per-round refinement uses; [[tuneIterParallelism]] replaces the
    // estimate with the materialized edge frame's exact bytes before the
    // rounds run. The explicit knob still wins.
    val parts = spark.conf.getOption("graft.graph.iterPartitions")
      .getOrElse {
        val bytes = org.apache.spark.sql.graft.bridge.leafInputBytes(df)
        if (bytes <= 0) spark.conf.get("spark.sql.shuffle.partitions")
        else {
          val target = 8L << 20
          val cap = graft.GraftSession.parallelismFloor(spark).toLong *
            graft.GraftSession.PartitionCeilingFactor
          math.max(2L, math.min((bytes * 4 + target - 1) / target, cap))
            .toString
        }
      }
    child.conf.set("spark.sql.shuffle.partitions", parts)
    // rebind the ANALYZED plan: resolution already happened against the
    // caller's catalog, so session-local relations (temp views, cached
    // lookups) carry over instead of failing to re-resolve
    body(org.apache.spark.sql.graft.bridge.ofRows(child,
      df.queryExecution.analyzed))
  }

  /** Per-round exchange sizing for the iteration loops (r20, guide §2.2:
    * fewer, larger partitions): a synchronous-Pregel round's exchanges
    * carry EDGE-sized frames, and the loop pays every round's task count
    * k times — at the session floor (32) a few-MB edge list ran 64-96
    * tiny tasks per round whose fixed cost dominated (measured: pagerank's
    * per-round task time fell 12 s → 1.7 s and its wall 0.48 → 0.27 s per
    * round when the rounds ran at 8 partitions). Sized from the
    * MATERIALIZED edge frame's actual block bytes (known for free — every
    * loop materializes its edge list before iterating) at the 8 MB
    * compute-dense target: small graphs get few round-tasks, and past
    * ~256 MB of edges the count crosses the old floor and keeps growing
    * to the standard ceiling — the GraftSession self-sizing rule applied
    * to the loop's implicit exchanges, byte-driven rather than
    * box-shaped. The explicit `graft.graph.iterPartitions` knob still
    * wins when set ([[inIterSession]] applied it before the body ran).
    * Results are partition-count independent (all-integer operators,
    * spec-pinned), so only the plan shape moves.
    */
  private def tuneIterParallelism(materialized: DataFrame): Unit = {
    val spark = materialized.sparkSession
    if (spark.conf.getOption("graft.graph.iterPartitions").isDefined) return
    val bytes = sqlBridge.materializedBytes(materialized)
    if (bytes <= 0) return
    val target = 8L << 20
    val cap = graft.GraftSession.parallelismFloor(spark).toLong *
      graft.GraftSession.PartitionCeilingFactor
    val parts = math.max(2L, math.min((bytes + target - 1) / target, cap))
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
  }

  /** Broadcast hint gated on an EXACT driver-known row count — the
    * iteration loops re-create AQE's runtime broadcast decision (lost
    * with AQE off in the iteration session) from counts they already pay
    * for as loop guards, and do it better: an exact count, not a byte
    * estimate. Below `graft.graph.broadcastNodes` rows (default 1M —
    * ~2-byte-long rows land at tens of MB in a driver-built
    * HashedRelation replicated to every executor; the earlier 4M default
    * allowed multi-hundred-MB builds rebuilt every round with AQE off
    * and nothing to back them out — r17 advice) the node-sized frame
    * broadcast-joins the cached edge list, so a round shuffles NOTHING;
    * past the cap the operator falls back to its documented k
    * edge-sized-shuffle synchronous-Pregel cost.
    */
  private def hintIfSmall(df: DataFrame, knownRows: Long): DataFrame = {
    val cap = df.sparkSession.conf.getOption("graft.graph.broadcastNodes")
      .map(_.toLong).getOrElse(1L << 20)
    if (knownRows >= 0 && knownRows < cap) broadcast(df) else df
  }

  /** Directed co-occurrence edge list: an edge (a → b) for every ordered
    * pair of DISTINCT items sharing a group (order → suppliers, basket →
    * brands, doc → entities) — the standard edge build for [[
    * pageRankFixedPoint]] / [[triangleStats]] inputs.
    *
    * The self-join fans out as per-group size², so one hub group (a
    * container order with 10⁵ items) quadratically dominates the whole
    * build — the same failure mode as [[Dedup.semanticPairs]]'s oversized
    * cluster, guarded the same way: groups past `maxGroupSize` distinct
    * items are EXCLUDED from pairing, counted, and reported loudly (or
    * fatally with `failOnOversized`) — never silently paired at 10¹⁰
    * edges or silently dropped. Size-1 groups pair with nothing and are
    * skipped for free. On bounded-fanout data (TPC-H orders hold ≤ 7
    * lineitems) no group ever nears a sane cap and the output equals the
    * unguarded self-join.
    */
  def coOccurrenceEdges(df: DataFrame, groupCol: String, itemCol: String,
                        maxGroupSize: Int = 1 << 12,
                        failOnOversized: Boolean = false): DataFrame = {
    require(maxGroupSize >= 2, s"bad maxGroupSize=$maxGroupSize")
    // r20 (optimization guide §2.3/§2.4): ONE aggregation replaces the
    // old distinct → sizes → guard-join → self-join chain. collect_set
    // dedups each group's items inside the aggregate (the distinct and
    // the size frame for free), the guard reads the group-count-sized
    // array frame, and the ordered-pair fan-out is a NARROW double
    // explode — the pair multiset never shuffles at all. Old shape: 3
    // group-keyed exchanges (distinct, sizes, self-join) + 2 checkpoints
    // + the pair self-join; new shape: 1 exchange + 1 group-count-sized
    // checkpoint. Measured at sf0.1 (supplier co-order graph): the edge
    // build inside supplier_graph_stats dropped ~1 s of its ~1.2 s.
    // Per-group state is bounded by maxGroupSize items (the same bound
    // the old size guard enforced before pairing), so the aggregation
    // buffer cannot hub-blow: a group past the cap still collects once
    // (maxGroupSize ≪ memory), is counted, reported, and excluded.
    // Output multiset is IDENTICAL: per group with distinct in-play item
    // set S, every ordered pair (a, b), a ≠ b — collect_set drops NULL
    // items, which the old path also never paired (src =!= dst is NULL
    // on a NULL side, so the WHERE dropped them).
    // explicit group-keyed exchange BEFORE the aggregate (the
    // sizedDistinctPairs plan contract): the user exchange satisfies the
    // aggregate's required distribution, so the set-building runs POST-
    // shuffle at the parallelism floor — left implicit, the partial
    // collect_set ran inside the scan task (one task on a single-split
    // input, measured 0.65 s serial) and the map-side partial barely
    // reduces bytes anyway (co-occurrence groups are small and rarely
    // span input splits).
    val grouped = df.select(col(groupCol).as("g"), col(itemCol).as("i"))
      .repartition(graft.GraftSession.parallelismFloor(df.sparkSession),
        col("g"))
      .groupBy(col("g")).agg(collect_set(col("i")).as("items"))
      .select(col("items"), size(col("items")).as("gsz"))
      .where(col("gsz") >= 2)
      .localCheckpoint(true)
    val over = grouped.where(col("gsz") > maxGroupSize)
      .agg(count(lit(1)).as("n"), coalesce(sum(col("gsz")), lit(0L)).as("rows"))
      .collect()(0)
    if (over.getLong(0) > 0) {
      val msg = s"coOccurrenceEdges: ${over.getLong(0)} group(s) exceed " +
        s"maxGroupSize=$maxGroupSize (${over.getLong(1)} member rows " +
        "excluded from pairing) — cap hub groups upstream or raise the limit"
      if (failOnOversized) throw new IllegalStateException(msg)
      Console.err.println(s"[graft] WARN $msg")
    }
    grouped.where(col("gsz") <= maxGroupSize)
      .select(explode(col("items")).as("src"), col("items"))
      .select(col("src"), explode(col("items")).as("dst"))
      .where(col("src") =!= col("dst"))
  }

  /** `iterations` rounds of damped PageRank (d = 0.85) over DIRECTED
    * `edges` (srcCol, dstCol; for an undirected graph pass both
    * directions). Nodes are the edge endpoints — an isolated node has no
    * edges to carry rank and is out of scope; a node with no in-edges
    * holds the bare damping floor. Every node starts at 10⁹ nano-units;
    * output (node, rank_nano).
    *
    * Scale shape: per iteration ONE join of the node-sized rank frame
    * against the cached edge list and one map-side-combined sum per dst —
    * k iterations = k edge-sized shuffles, the standard synchronous-
    * Pregel cost. Every FIFTH iteration (and the final one) materializes
    * eagerly via `localCheckpoint` — the iterative-algorithm idiom,
    * paced: lineage and planning cost stay bounded at high k without
    * paying one driver action per iteration at low k, and the final
    * checkpoint unpins the cached inputs from the returned plan. Skewed
    * high-degree nodes behave like any skewed aggregation key — salting
    * applies unchanged.
    *
    * Round 17: the loop runs in the ITERATION CHILD SESSION
    * ([[inIterSession]] — AQE off, fixed parallelism) with the rank/node
    * frames broadcast-joined against the cached edges whenever the exact
    * node count proves them small ([[hintIfSmall]]) — a round then
    * shuffles nothing; past the cap the k edge-sized-shuffle cost above
    * is the documented envelope. Driver-job budget pinned in
    * GraphJobBudgetSpec.
    */
  def pageRankFixedPoint(edges: DataFrame, srcCol: String, dstCol: String,
                         iterations: Int,
                         longLaneMaxNodes: Long = 10000000L): DataFrame = {
    require(iterations >= 1 && iterations <= 50, s"bad iterations=$iterations")
    inIterSession(edges) { edges =>
    val store = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // r20: materialize the distinct edge list ONCE (checkpoint) — it
    // feeds the degree aggregate, the node census, and the degree join;
    // un-checkpointed, the distinct re-ran inside each consumer. The
    // degree join then goes through [[hintIfSmall]] gated on the node
    // count (already paid as the loop's lane guard), so at broadcastable
    // node counts the prologue never exchanges the edge list by src —
    // measured as the largest single job of the old prologue. Past the
    // cap it falls back to the documented edge-sized-shuffle join.
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().localCheckpoint(true)
    tuneIterParallelism(e) // eager checkpoint: block bytes known now
    try {
      // node-sized and referenced by every iteration's floor join: cached
      val nodes = e.select(col("src").as("node"))
        .union(e.select(col("dst"))).distinct().persist(store)
      // overflow-path selection, PROVEN once instead of paid every row:
      // total rank mass never exceeds nodeCount·10⁹ nano-units (damping
      // only ever redistributes or leaks mass), so a hub's contribution
      // sum is bounded by it too — below `longLaneMaxNodes` (10⁷ keeps
      // Σc·850 under int64) the plain long sum is safe AND ~20% faster
      // than the decimal lane (measured on the bench graph); at or past
      // the bound, route through decimal(38,0), which stays exact and
      // nulls loudly (never wraps) on a 10¹⁶+-node absurdity. The two
      // lanes are bit-equal wherever both are defined (spec-pinned).
      val nodeN = nodes.count()
      // the degree side is at most node-sized: the SAME count that picks
      // the sum lane gates its broadcast, so at broadcastable node counts
      // the prologue never exchanges the edge list by src (measured as
      // the old prologue's largest job); past the cap it falls back to
      // the documented edge-sized-shuffle join
      val withDeg = e.join(
          hintIfSmall(e.groupBy(col("src")).agg(count(lit(1)).as("deg")),
            nodeN),
          Seq("src"))
        .persist(store)
      val sumAgg = if (nodeN < longLaneMaxNodes)
        expr("150000000 + (sum(c) * 850) DIV 1000")
      else
        expr("CAST(150000000 + (sum(CAST(c AS DECIMAL(38,0))) * 850)" +
          " DIV 1000 AS BIGINT)")
      var cur = nodes.withColumn("p", lit(1000000000L))
      var pinned: Option[DataFrame] = None
      for (i <- 1 to iterations) {
        val next = withDeg
          .join(hintIfSmall(cur.withColumnRenamed("node", "src"), nodeN),
            Seq("src"))
          .select(col("dst").as("node"), expr("p DIV deg").as("c"))
          // a node with in-edges gets damped contributions; in-edge-less
          // nodes keep the floor via the left join below. The damping sum
          // uses the lane picked above: plain long when the node count
          // PROVES no wrap is possible, decimal(38,0) otherwise
          .groupBy(col("node"))
          .agg(sumAgg.as("p"))
        cur = nodes
          .join(hintIfSmall(next, nodeN), Seq("node"), "left")
          .select(col("node"), coalesce(col("p"), lit(150000000L)).as("p"))
        if (i % 5 == 0 || i == iterations) {
          val stepped = cur.localCheckpoint(true)
          // stepped has MATERIALIZED, so the previous checkpoint's blocks
          // are dead — free them NOW via the underlying RDD (r20:
          // Dataset.unpersist is a no-op for checkpoint blocks, which is
          // why they used to squat on the heap until a GC noticed — the
          // SCALING rep-2 heap-aging tail)
          pinned.foreach(sqlBridge.dropCheckpoint(_))
          pinned = Some(stepped)
          cur = stepped
        }
      }
      val out = cur.select(col("node"), col("p").as("rank_nano"))
      nodes.unpersist(false)
      withDeg.unpersist(false)
      out
    } finally sqlBridge.dropCheckpoint(e) // out reads its own checkpoint
    }
  }

  /** Exact per-node triangle counts + local clustering coefficient over an
    * UNDIRECTED graph given as a (possibly both-direction, possibly
    * duplicated) edge list — the "how clubby is the co-supply network"
    * metric (Watts–Strogatz local clustering).
    *
    * Algorithm: degree-ordered orientation ("compact-forward"). Each
    * canonical undirected edge {a,b} is oriented from its lower endpoint
    * to its higher endpoint under the total order (degree, id); a wedge
    * join of the oriented list with itself on the shared source, keeping
    * only ordered out-neighbor pairs, enumerates each triangle EXACTLY
    * once at its lowest-order vertex, and one inner join against the
    * oriented list checks the closing edge. Orientation is the
    * scale-defining choice: out-degree under the (deg, id) order is
    * O(√m), so total wedge fan-out is O(m^1.5) worst case and output-
    * bound in practice — the naive unoriented wedge join is Σdeg² and
    * dies on hub nodes, this one cannot. All three joins shuffle on node
    * keys (AQE skew handling applies unchanged); the triangle→node
    * explode is a bounded ×3 fan-out aggregated with map-side combine.
    *
    * Output: (node, degree, triangles, clustering) for every node, where
    * clustering = 2·T / (deg·(deg−1)) rounded to 6 (NULL for deg < 2 —
    * undefined, loudly not 0). Exact integers throughout; the one double
    * is the final ratio, so any engine hash-matches.
    */
  def triangleStats(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    // canonical undirected edge list feeds degree, orientation, wedge and
    // closing-edge subplans: materialize the distinct once
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b"))
      .distinct().localCheckpoint(true)
    val deg = und.select(col("a").as("node"))
      .union(und.select(col("b")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val withDeg = und
      .join(deg.select(col("node").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("db")), Seq("b"))
    // orient low → high under (deg, id); carry the head's order key so the
    // wedge pair can be ordered without re-joining degrees
    val lowFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg.select(
      when(lowFirst, col("a")).otherwise(col("b")).as("src"),
      when(lowFirst, col("b")).otherwise(col("a")).as("dst"),
      when(lowFirst, col("db")).otherwise(col("da")).as("dd"))
      .localCheckpoint(true)
    val wedges = oriented.select(col("src"), col("dst").as("v"), col("dd").as("dv"))
      .join(oriented.select(col("src"), col("dst").as("w"), col("dd").as("dw")),
        Seq("src"))
      .where(col("dv") < col("dw") ||
        (col("dv") === col("dw") && col("v") < col("w")))
    val tris = wedges
      .join(oriented.select(col("src").as("v"), col("dst").as("w")),
        Seq("v", "w"))
      .select(explode(array(col("src"), col("v"), col("w"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("triangles"))
    deg.join(tris, Seq("node"), "left")
      .select(col("node"), col("deg").as("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        when(col("deg") >= 2,
          round(lit(2.0) * coalesce(col("triangles"), lit(0L)).cast("double")
            / (col("deg").cast("double") * (col("deg").cast("double") - 1.0)), 6))
          .as("clustering"))
  }

  /** One-row topology profile of a directed edge list: node/edge counts,
    * degree extremes, and the DEGREE ASSORTATIVITY — the Pearson
    * correlation of (out-degree(src), out-degree(dst)) over edges, the
    * classic "do hubs link to hubs" coefficient (Newman 2002). Exact by
    * the engine's stat-moment convention: degrees are exact longs, all
    * six correlation moments accumulate as exact integers (decimal(38,0)
    * for the products), and the closed form is one rounded double.
    * Shape: one distinct + one degree aggregate + one co-partitioned join
    * back to edges + one scalar fold. The distinct edge list feeds four
    * subplans (pairing, degree, node count, edge count) — it checkpoints
    * eagerly so the distinct runs once, and the returned plan reads the
    * materialized blocks (reclaimed by the context cleaner when the frame
    * goes unreachable).
    */
  def degreeStats(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().localCheckpoint(true)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // r20 (guide §2.4 — share one pass): keep the degree join LEFT and
    // fold the edge total into the SAME scalar aggregate as the six
    // correlation moments (condition every moment on `dd` being present,
    // count(*) for n_edges) — the old separate `totals` aggregate was a
    // fourth full consumer of the checkpointed edge list (measured 0.43 s
    // of supplier_graph_stats). Moment values are unchanged: rows with no
    // dst out-degree contributed nothing before and contribute NULL-skipped
    // terms now.
    val paired = e
      .join(deg, Seq("src"))
      .join(deg.select(col("src").as("dst"), col("deg").as("dd")),
        Seq("dst"), "left")
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val m = paired.agg(count(col("dd")).as("n"),
      sum(when(col("dd").isNotNull, col("deg"))).as("sx"), sum(col("dd")).as("sy"),
      sum(dec(col("deg")) * dec(col("dd"))).as("sxy"),
      sum(when(col("dd").isNotNull, dec(col("deg")) * dec(col("deg")))).as("sxx"),
      sum(dec(col("dd")) * dec(col("dd"))).as("syy"),
      count(lit(1)).as("n_edges"))
    val nodeTot = e.select(col("src").as("node"))
      .union(e.select(col("dst"))).distinct()
      .agg(count(lit(1)).as("n_nodes"))
    val degTot = deg.agg(max(col("deg")).as("max_out_deg"))
    def d(c: String) = col(c).cast("double")
    // a zero-variance degree distribution (e.g. a complete graph — every
    // node the same degree) has no defined assortativity: NULL, loudly
    // not a division error and not a fake 0
    val denom = sqrt((d("n") * d("sxx") - d("sx") * d("sx"))
      * (d("n") * d("syy") - d("sy") * d("sy")))
    m.crossJoin(broadcast(nodeTot))
      .crossJoin(broadcast(degTot))
      .select(col("n_nodes"), col("n_edges"), col("max_out_deg"),
        when(denom === 0.0, lit(null).cast("double"))
          .otherwise(round((d("n") * d("sxy") - d("sx") * d("sy")) / denom, 6))
          .as("assortativity"))
  }

  /** k-core of a directed-both-ways edge list (the [[coOccurrenceEdges]]
    * shape): iteratively peel nodes of degree < k until the survivor set
    * stops shrinking, then return each survivor with its in-core degree —
    * the standard "dense backbone" extraction (Seidman 1983), the graph
    * twin of SemDeDup's oversized-cluster triage: which suppliers sit in a
    * mutually-reinforcing co-order cluster no single removal breaks.
    *
    * Shape per round: ONE join of the edge list against the alive set on
    * each endpoint + one map-side-combined degree count — an edge-sized
    * shuffle, the same synchronous-Pregel cost class as
    * [[pageRankFixedPoint]]; the driver holds only the per-round survivor
    * COUNT (the loop guard — alive sets shrink monotonically, so an equal
    * count IS the fixed point). Rounds are bounded by `maxRounds` and
    * non-convergence THROWS loudly: the DuckDB oracle unrolls exactly
    * `maxRounds` peels, so a silently-truncated peel would diverge from it
    * — and on any real graph the peel converges in a handful of rounds
    * (each round removes every node currently under-degree, not one node).
    *
    * Determinism: degrees are exact longs over a distinct edge list —
    * bit-equal on any engine and any partitioning. Output
    * (node, core_degree), one row per k-core member.
    */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
            maxRounds: Int = 12): DataFrame = {
    require(k >= 1, s"bad k=$k")
    require(maxRounds >= 1 && maxRounds <= 32, s"bad maxRounds=$maxRounds")
    inIterSession(edges) { edges =>
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .where(col("src") =!= col("dst")).distinct().localCheckpoint(true)
    tuneIterParallelism(e) // eager checkpoint: block bytes known now
    var alive = e.select(col("src").as("node")).union(e.select(col("dst")))
      .distinct().persist()
    var aliveN = alive.count()
    var deg: DataFrame = null
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      round += 1
      deg = e
        .join(hintIfSmall(alive.select(col("node").as("src")), aliveN),
          Seq("src"))
        .join(hintIfSmall(alive.select(col("node").as("dst")), aliveN),
          Seq("dst"))
        .groupBy(col("src")).agg(count(lit(1)).as("deg"))
      val next = deg.where(col("deg") >= k).select(col("src").as("node"))
        .persist()
      val n = next.count()
      alive.unpersist(false)
      alive = next
      converged = n == aliveN
      aliveN = n
    }
    if (!converged) {
      alive.unpersist(false)
      throw new IllegalStateException(
        s"kCore: no fixed point within maxRounds=$maxRounds (last survivor " +
          s"count $aliveN) — raise maxRounds (and the oracle's unroll depth)")
    }
    // converged: the last degree frame was computed over the final alive
    // set, so its >= k rows ARE the core members with their core degrees
    val out = deg.where(col("deg") >= k)
      .select(col("src").as("node"), col("deg").as("core_degree"))
      .localCheckpoint(true)
    alive.unpersist(false)
    // out is materialized via its own checkpoint — the edge list's blocks
    // are dead; free them now instead of waiting for a GC (r20)
    sqlBridge.dropCheckpoint(e)
    out
    }
  }

  /** Breadth-first hop census from the graph's minimum node id: how many
    * nodes sit at shortest-path distance 0, 1, … maxHops from the seed —
    * the "blast radius" readout (how far does an outage/defect at one
    * supplier propagate through shared orders).
    *
    * Implementation is frontier-iterated set BFS, the only shape that
    * survives scale: each of the ≤ maxHops rounds is ONE distributed
    * join of the edge list against the current frontier plus an
    * anti-join against the visited set — never an all-pairs or
    * path-enumerating pass (paths proliferate exponentially in a dense
    * graph; STATES are bounded by the node count, and that is what the
    * visited-set dedup keeps). The driver holds only loop control (a
    * per-round emptiness check), never node data; the edge list is
    * materialized once and reused by every round.
    *
    * Determinism: the seed is min(src); hop levels are unique per node
    * (first visit wins = min hop, the BFS invariant). Output:
    * (hop, n_nodes), hop 0 = the seed row.
    */
  def bfsHops(edges: DataFrame, srcCol: String, dstCol: String,
              maxHops: Int): DataFrame = {
    require(maxHops >= 1 && maxHops <= 16, s"bad maxHops=$maxHops")
    inIterSession(edges) { edges =>
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct().localCheckpoint(true)
    tuneIterParallelism(e) // eager checkpoint: block bytes known now
    val spark = edges.sparkSession
    import spark.implicits._
    val seed = e.agg(min(col("src"))).as[Option[Long]].head() match {
      case Some(s) => s
      case None =>
        sqlBridge.dropCheckpoint(e)
        return Seq.empty[(Long, Long)].toDF("hop", "n_nodes")
    }
    // ONE driver action per round: count() both materializes the level's
    // cache and is the loop guard. The visited set is the plain union of
    // the ≤ maxHops cached levels — each level's plan reads the previous
    // level's CACHE, so lineage stays one-hop deep and nothing recomputes;
    // re-checkpointing visited every round would cost a second job per hop
    val levels = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var visited = Seq((seed, 0L)).toDF("node", "hop").persist()
    levels += visited
    var frontier = visited
    var frontierN = 1L
    var visitedN = 1L
    var hop = 0L
    var grew = true
    while (hop < maxHops && grew) {
      hop += 1
      val next = e.join(
          hintIfSmall(frontier.select(col("node").as("src")), frontierN),
          Seq("src"))
        .select(col("dst").as("node")).distinct()
        .join(hintIfSmall(visited, visitedN), Seq("node"), "left_anti")
        .select(col("node"), lit(hop).as("hop"))
        .persist()
      frontierN = next.count()
      grew = frontierN > 0
      levels += next
      visited = visited.union(next)
      visitedN += frontierN
      frontier = next
    }
    val census = visited.groupBy(col("hop")).agg(count(lit(1)).as("n_nodes"))
      .orderBy(col("hop")).localCheckpoint(true)
    levels.foreach(_.unpersist(false))
    // census is checkpoint-materialized — the edge list's blocks are dead
    sqlBridge.dropCheckpoint(e)
    census
    }
  }

  /** `rounds` SYNCHRONOUS rounds of label propagation (Raghavan 2007)
    * over DIRECTED `edges` (pass both directions for an undirected
    * graph): every node starts labeled with its own id; each round it
    * adopts the most frequent label among its in-neighbors, ties broken
    * by the SMALLEST label — the deterministic variant (classic LPA
    * breaks ties randomly and is irreproducible; pinned rounds + min-tie
    * make every round a pure function of the edge list, so an unrolled
    * k-round CTE in an independent engine reproduces the labels
    * bit-for-bit). A node with no in-edges keeps its current label.
    * Output after round k: (node, label) — nodes sharing a label are one
    * (emerging) community.
    *
    * Scale shape: per round ONE join of the node-sized label frame
    * against the cached edge list, one map-side-combined (dst, label)
    * count, and one per-dst max_by pick — k rounds = k edge-sized
    * shuffles, the same synchronous-Pregel cost envelope as
    * [[pageRankFixedPoint]], with the same paced localCheckpoint
    * lineage discipline. The vote pick `max_by(label, (count, −label))`
    * is all-integer — nothing order-dependent ever sums in floating
    * point.
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 32, s"bad rounds=$rounds")
    inIterSession(edges) { edges =>
    val store = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct().persist(store)
    try {
      val nodes = e.select(col("src").as("node"))
        .union(e.select(col("dst"))).distinct().persist(store)
      val nodeN = nodes.count()
      tuneIterParallelism(e) // e materialized by the node count above
      var cur = nodes.withColumn("lbl", col("node"))
      var pinned: Option[DataFrame] = None
      for (i <- 1 to rounds) {
        val votes = e
          .join(hintIfSmall(cur.withColumnRenamed("node", "src"), nodeN),
            Seq("src"))
          .groupBy(col("dst").as("node"), col("lbl"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("node"))
          .agg(max_by(col("lbl"), struct(col("c"), (lit(0L) - col("lbl"))))
            .as("vote"))
        cur = cur.join(hintIfSmall(votes, nodeN), Seq("node"), "left")
          .select(col("node"), coalesce(col("vote"), col("lbl")).as("lbl"))
        // pace at every SECOND round (tighter than pageRank's fifth): an
        // LPA round is two exchanges, so unpinned lineage re-executes
        // quadratically fast — measured 7.7 → ~3 s at rounds = 4
        if (i % 2 == 0 || i == rounds) {
          val stepped = cur.localCheckpoint(true)
          // free the superseded checkpoint's blocks now (see pageRank)
          pinned.foreach(sqlBridge.dropCheckpoint(_))
          pinned = Some(stepped)
          cur = stepped
        }
      }
      val out = cur.select(col("node"), col("lbl").as("label"))
      nodes.unpersist(false)
      out
    } finally e.unpersist(false)
    }
  }

  /** Common-neighbor link scores over a BIPARTITE relation (left, right)
    * — collaborative filtering's "items bought by the same users" shape:
    * for every right-side pair sharing at least one left node, the
    * common-neighbor count and the Adamic–Adar score
    * Σ_{c ∈ common} 1/ln(deg c) (rare shared neighbors weigh more), then
    * ONE row per right node: its best partner by (cn, smallest id) — an
    * all-integer argmax, so the output set is deterministic even though
    * the AA score is a float payload.
    *
    * Scale: the wedge join fans out as Σ_left deg², so it wedges through
    * the LEFT side — pass the naturally-bounded side (a customer's
    * purchase breadth, not a supplier's market reach) as `left`. Hub
    * left-nodes past `maxLeftDegree` are EXCLUDED, counted, and reported
    * loudly (the [[coOccurrenceEdges]] guard idiom) — a 10⁶-degree hub
    * contributes ~1/ln(10⁶) ≈ 0.07 per pair but 10¹² wedges, the classic
    * skip-the-hub trade every production AA makes.
    *
    * Determinism design (round 18): the AA term is QUANTIZED to
    * fixed-point integer — each wedge center contributes
    * `floor(10⁶ / ln(deg c))` micro-units — making the per-pair score an
    * order-independent EXACT LONG SUM, the [[pageRankFixedPoint]] damping
    * idiom applied to link prediction. The previous float fold was
    * order-sensitive and rode a per-pair cumulative window in fixed
    * left-id order; that window's wedge-grain SORT was the engine's one
    * spill-fragile operator at 100× (rep-to-rep band 2-6× from GC luck,
    * r17 verdict). The sum needs no sort and combines MAP-SIDE, so the
    * pair exchange carries pair-grain partials instead of wedge-grain
    * rows. Quantization error is ≤ 10⁻⁶ relative per term — a definition
    * choice, not an approximation bug: the oracle replays the identical
    * `floor(1e6/ln(deg))` table (deg is an integer ≤ maxLeftDegree, so
    * the table has ≤ 4095 entries; a 1-ulp libm disagreement on ln would
    * need to land within ~2·10⁻¹⁰ of a floor boundary to flip one —
    * checked empirically across the full domain in InsightsSpec). deg ≥ 2
    * for every wedge center by construction, so ln never vanishes.
    */
  def bipartiteBestPartner(rel: DataFrame, leftCol: String, rightCol: String,
                           maxLeftDegree: Int = 4096,
                           relRows: Long = -1L): DataFrame = {
    require(maxLeftDegree >= 2, s"bad maxLeftDegree=$maxLeftDegree")
    val targetBytes = 16L << 20
    val floorParts = graft.GraftSession.parallelismFloor(rel.sparkSession)
    val raw = rel.select(col(leftCol).cast("long").as("c"),
      col(rightCol).cast("long").as("s"))
    // r19 — the r18 in-stage-fan-out cure applied one stage UP: the
    // (c, s) DISTINCT's map-side partial agg runs INSIDE whatever stage
    // produces `rel`. At 100x that producer is a 32-task fact⋈dim join
    // emitting ~600M rows; AQE sizes the stage by its (small) INPUT
    // bytes, and the in-stage partial hash map blew the 8g heap (r18
    // SCALING note — the residual OOM upstream of the wedge fix). The
    // caller usually KNOWS the producer's output volume (`relRows` —
    // for a fact⋈dim join, the fact side's row count): shuffle the raw
    // pairs BY (c, s) into 16 MB tasks FIRST, so the producing stage
    // feeds a spillable shuffle write instead of an in-stage hash map,
    // and the distinct's partial+final aggregates BOTH run post-shuffle
    // on bounded input (the explicit hash(c, s) exchange satisfies the
    // aggregate's required distribution, so Catalyst plans no further
    // exchange — spec-pinned in ShuffleShapeSpec). Identity below the
    // parallelism floor: bench-SF plans are unchanged, and the distinct
    // SET is partitioning-independent so results never move.
    val (distinctPairs, sized) =
      Graph.sizedDistinctPairs(raw, relRows, targetBytes, floorParts)
    // at scale, checkpoint `b` DISK_ONLY: the eager MEMORY_AND_DISK
    // default parks the (possibly hundreds-of-MB) distinct pair set in
    // the unified pool's PROTECTED storage region for the whole query,
    // and the wedge stage's partial-agg maps + shuffle sorters then
    // starve at exactly the heap the executor-sizing note said should
    // fit (measured at 100x/8g: UNABLE_TO_ACQUIRE in the pair agg with
    // the pair set resident). `b` is re-read a handful of times at scan
    // speed — IO the join stage overlaps — while execution memory is
    // the contended resource.
    val bLevel =
      if (sized) org.apache.spark.storage.StorageLevel.DISK_ONLY
      else org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val b = distinctPairs.localCheckpoint(true, bLevel)
    val deg = b.groupBy(col("c")).agg(count(lit(1)).as("degc"))
    // one tiny action serves both the hub guard AND the exchange sizing:
    // the wedge volume Σ deg² over in-play customers is EXACT here, and
    // it is what the pair-grain window/aggregate downstream must absorb —
    // at 100x data the fixed parallelism floor put ~80M wedge rows into
    // each pair-aggregation task and OOM'd (measured); sizing the
    // implicit exchanges from the wedge estimate is precisely the
    // GraftSession self-sizing rule's job (8 MB compute-dense target)
    val g = deg.agg(
        coalesce(sum(when(col("degc") > maxLeftDegree, 1L)), lit(0L)),
        coalesce(sum(when(col("degc").between(2, maxLeftDegree),
          col("degc") * col("degc"))), lit(0L)))
      .collect()(0)
    val (over, wedgeRows) = (g.getLong(0), g.getLong(1))
    if (over > 0)
      Console.err.println(s"[graft] WARN bipartiteBestPartner: $over hub " +
        s"left-node(s) exceed maxLeftDegree=$maxLeftDegree — excluded from " +
        "wedge enumeration (their AA terms are near zero; raise the limit " +
        "to include them)")
    // the quantized AA weight rides the s1 side only — the s2 side of the
    // wedge join carries just (c, s), shrinking the join's probe input
    val inPlay = b.join(deg.where(col("degc").between(2, maxLeftDegree)),
      Seq("c"))
    val weighted = inPlay.withColumn("w",
      floor(lit(1e6) / log(col("degc").cast("double"))).cast("long"))
    // the wedge fan-out happens INSIDE the join stage, so AQE sizes that
    // stage by its (small) INPUT bytes and cannot see the emission: at
    // 100x a 32-task join stage fed ~42M wedges into each task's
    // partial-agg hash map and threw AGGREGATE_OUT_OF_MEMORY at the 8g
    // heap (measured, r18). Partition the join input EXPLICITLY from the
    // exact wedge volume the guard aggregate already paid for —
    // REPARTITION_BY_NUM exchanges are exempt from AQE coalescing, so
    // each task's wedge emission (and thus its partial-agg map) stays
    // bounded by the 16 MB compute-dense target. Forfeiting AQE's
    // skew-split on this join is safe: per-key emission is already
    // capped by the hub guard (≤ maxLeftDegree² wedges per customer).
    // At bench SF the sized count sits under the floor and both
    // repartitions (and sizedExchanges below) are the identity.
    val parts = graft.GraftSession.sizedPartitionsFromBytes(
      rel.sparkSession, BigInt(wedgeRows / 2) * 40, 1.0, targetBytes)
    val (s1Side, s2Side) =
      if (parts > floorParts)
        (weighted.repartition(parts, col("c")),
          inPlay.repartition(parts, col("c")))
      else (weighted, inPlay)
    val wedges = s1Side.select(col("c"), col("w"), col("s").as("s1"))
      .join(s2Side.select(col("c"), col("s").as("s2")), Seq("c"))
      .where(col("s1") < col("s2"))
    // r20: materialize the pair aggregate ONCE before mirroring — the
    // union's two branches otherwise EACH re-ran the final aggregation
    // over the full wedge shuffle (measured: the mirror job shuffle-read
    // 2× the 105 MB pair-partial exchange at sf0.1). persist, not
    // checkpoint: the columnar cache compresses the pair rows ~4× vs raw
    // checkpoint blocks (an eager checkpoint was ALSO measured — its
    // uncompressed block write cost more than the saved duplicate
    // aggregation). DISK_ONLY at scale, the pair-set memory discipline.
    val pairs = wedges
      .groupBy(col("s1"), col("s2"))
      .agg(count(lit(1)).as("cn"), sum(col("w")).as("aaq"))
      .persist(if (sized) org.apache.spark.storage.StorageLevel.DISK_ONLY
        else org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mirrored = pairs.select(col("s1").as("node"), col("s2").as("partner"),
        col("cn"), col("aaq"))
      .union(pairs.select(col("s2"), col("s1"), col("cn"), col("aaq")))
    val out = mirrored.groupBy(col("node"))
      .agg(max_by(struct(col("partner"), col("cn"), col("aaq")),
        struct(col("cn"), lit(0L) - col("partner"))).as("best"))
      .select(col("node"), col("best.partner").as("partner"),
        col("best.cn").as("common_neighbors"),
        round(col("best.aaq").cast("double") / lit(1e6), 6)
          .as("adamic_adar"))
    // downstream exchanges (pair partials → mirror → per-node argmax)
    // carry pair-grain rows bounded by the same wedge count: reuse the
    // wedge-sized budget as their initialPartitionNum; AQE coalesces them
    // back down by ACTUAL bytes (map-side combine usually collapses the
    // partials far below the wedge bound)
    val sizedOut = graft.GraftSession.sizedExchanges(out, parts, targetBytes)
    // r20 (the SCALING rep-2 heap-aging fix): materialize the NODE-SIZED
    // result via its own checkpoint, then free the pair-set checkpoint's
    // (possibly GB-scale at 100x) blocks immediately — they otherwise
    // squat on the heap until a GC notices the RDD is unreachable, which
    // is exactly the rep-2 +232 s tail the between-rep bench GC used to
    // paper over. One execution either way: the caller's action reads
    // the small checkpoint instead of re-running the plan.
    val result = sizedOut.localCheckpoint(true)
    sqlBridge.dropCheckpoint(b)
    pairs.unpersist(false)
    result
  }

  /** The r19 pre-distinct shuffle fragment (see [[bipartiteBestPartner]]),
    * factored so its plan contract is testable: when the caller-known
    * producer volume clears the parallelism floor, the raw (c, s) pairs
    * shuffle by key into `targetBytes` tasks BEFORE the distinct, and
    * Catalyst then plans BOTH distinct aggregates post-shuffle — the
    * fragment carries exactly ONE exchange (ShuffleShapeSpec), so the
    * producing stage feeds a spillable shuffle write, never an in-stage
    * partial hash map. Returns (distinct frame, whether sizing engaged).
    */
  private[graft] def sizedDistinctPairs(raw: DataFrame, relRows: Long,
      targetBytes: Long, floorParts: Int): (DataFrame, Boolean) = {
    val relParts =
      if (relRows > 0)
        graft.GraftSession.sizedPartitionsFromBytes(
          raw.sparkSession, BigInt(relRows) * 16, 1.0, targetBytes)
      else floorParts
    val sized = relParts > floorParts
    ((if (sized) raw.repartition(relParts, col("c"), col("s")) else raw)
      .distinct(), sized)
  }
}
