package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cluster-quality evaluation over an embedding column — the readout that
  * decides whether a clustering (k-means labels, SemDeDup communities, a
  * taxonomy) is tight enough to act on before dedup/sampling decisions key
  * off it.
  *
  * Determinism design (the engine's exact-or-loud convention applied to
  * float vectors): every cross-row reduction happens on EXACT integers.
  * Vectors are projected once onto a fixed micro grid (`⌊x·10⁶⌋` per
  * component — the same double on any engine, floored identically), so
  * per-(label, dim) component sums are exact integer sums, and per-point
  * distances to a centroid S/n are evaluated in the multiplied-out form
  * `Σ(n·x − S)² / n²` whose numerator is an exact decimal(38,0) integer —
  * order-independent under any partitioning, AQE re-plan, or retry. The
  * only floats are per-row (sqrt, one ratio), which are IEEE-deterministic
  * given exact inputs, and per-point silhouettes re-enter integer land as
  * micro-units before the final mean. A float centroid mean would make the
  * whole readout partitioning-dependent — the classic nondeterminism that
  * keeps float k-means evaluations from ever hash-matching across engines.
  */
object ClusterEval {

  /** Simplified (centroid-based) silhouette per label: for each point,
    * `a` = distance to its own label centroid, `b` = distance to the
    * nearest OTHER centroid, `s = (b − a) / max(a, b)` (Rousseeuw 1987's
    * silhouette with centroid distances standing in for mean pairwise
    * distances — the O(n·k·d) form that scales where the O(n²) classic
    * cannot), averaged per label in exact micro-units.
    *
    * Shape: one posexploded map-side-combined pass builds the per-(label,
    * dim) sums; the centroid codebook (k·d longs + k counts) is collected
    * to the driver — the bounded-codebook pattern IVF/iforest already use
    * — and scoring is ONE scan with a per-row HOF fold over the broadcast
    * literal, zero joins, zero extra shuffles; the finale is one grouped
    * aggregation at the label grain. Loud guards: refuses > `maxLabels`
    * labels (the codebook must stay driver-bounded) and component sums
    * past the exact-long range.
    *
    * Output: (label, n_points, mean_silhouette) — labels with no OTHER
    * label to compare against yield an empty frame (a 1-cluster silhouette
    * is undefined; loudly absent, not a fake 0).
    */
  def centroidSilhouette(emb: DataFrame, idCol: String, vecCol: String,
                         labelCol: String, maxLabels: Int = 4096): DataFrame = {
    val spark = emb.sparkSession
    val base = emb.select(col(idCol).as("id"),
        col(labelCol).cast("long").as("lbl"),
        expr(s"transform($vecCol, x -> " +
          "CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))").as("v"))
      .where(col("lbl").isNotNull && col("v").isNotNull)
    val sums = base
      .select(col("lbl"), posexplode(col("v")).as(Seq("d", "x")))
      .groupBy(col("lbl"), col("d"))
      // decimal, not long: a silent int64 wrap on a huge cluster would
      // corrupt every distance; decimal either stays exact or nulls loudly
      .agg(sum(col("x").cast("decimal(38,0)")).as("s"))
      .collect()
    val counts = base.groupBy(col("lbl")).agg(count(lit(1)).as("n")).collect()
    val nByLbl = counts.map(r => r.getLong(0) -> r.getLong(1)).toMap
    require(nByLbl.size <= maxLabels,
      s"centroidSilhouette: ${nByLbl.size} labels exceed maxLabels=" +
        s"$maxLabels — the centroid codebook must stay driver-bounded")
    if (nByLbl.size < 2) {
      import spark.implicits._
      return Seq.empty[(Long, Long, Double)]
        .toDF("label", "n_points", "mean_silhouette")
    }
    val sByLbl = sums.groupBy(_.getLong(0)).map { case (l, rows) =>
      l -> rows.map { r =>
        val s = r.getDecimal(2)
        // a NULL component sum means some vector carried a NULL element —
        // refuse loudly rather than NPE (or silently skew the centroid)
        require(s != null, s"centroidSilhouette: label $l has a NULL " +
          s"component sum at dim ${r.getInt(1)} — a vector carries NULL " +
          "elements; clean or drop them upstream")
        // n·x − S must fit the per-element long math below: bound loudly
        require(s.abs.compareTo(new java.math.BigDecimal(Long.MaxValue / 4)) < 0,
          s"centroidSilhouette: component sum $s of label $l exceeds the " +
            "exact-long bound — shrink the micro scale or split the corpus")
        (r.getInt(1), s.longValueExact())
      }.sortBy(_._1).map(_._2)
    }
    // literal codebook: k structs of (label, n, component-sum array) baked
    // into the plan — broadcast by construction, no join
    val entries = sByLbl.toSeq.sortBy(_._1).map { case (l, arr) =>
      struct(lit(l).as("l"), lit(nByLbl(l)).as("n"),
        array(arr.map(lit(_)): _*).as("s"))
    }
    val cb = array(entries: _*)
    // per-row: distances to every centroid from the multiplied-out exact
    // numerator; then a = own, b = nearest other, s = (b−a)/max(a,b)
    val scored = base.withColumn("cb", cb)
      .withColumn("ds", expr(
        """transform(cb, k -> named_struct('l', k.l, 'd',
             sqrt(CAST(aggregate(zip_with(v, k.s,
                    (x, sc) -> CAST(k.n AS DECIMAL(38,0)) * x - sc),
                  CAST(0 AS DECIMAL(38,0)), (acc, t) -> acc + t * t)
                AS DOUBLE)) / CAST(k.n AS DOUBLE)))"""))
      .withColumn("a", expr("filter(ds, p -> p.l = lbl)[0].d"))
      .withColumn("b", expr(
        "array_min(transform(filter(ds, p -> p.l != lbl), p -> p.d))"))
      .withColumn("sil", when(greatest(col("a"), col("b")) === 0.0, lit(0.0))
        .otherwise((col("b") - col("a")) / greatest(col("a"), col("b"))))
      // back to exact integers BEFORE the cross-row mean: micro-unit
      // silhouettes sum exactly under any partitioning
      .withColumn("sm",
        floor(col("sil") * 1000000 + 0.5).cast("long"))
    scored.groupBy(col("lbl").as("label"))
      .agg(count(lit(1)).as("n_points"), sum(col("sm")).as("ssm"))
      .select(col("label"), col("n_points"),
        round(col("ssm").cast("double") / col("n_points") / 1e6, 6)
          .as("mean_silhouette"))
  }

  /** DBSCAN point classification (Ester 1996) over the embedding space:
    * core (≥ minPts neighbors within ε, the point itself included),
    * border (non-core with a core neighbor), noise — the density
    * screen that tells a dedup/sampling pipeline which embeddings sit
    * in dense semantic mass vs isolated space, without committing to a
    * k like the k-means family.
    *
    * Exact by quantization (the class convention): components project
    * once onto the `⌊x·scale+0.5⌋` integer grid, so every pairwise
    * distance² is an exact int64 sum and the ε² test is integer
    * comparison — any engine classifies identically. This is the
    * brute-force EXACT-ORACLE ANCHOR (the `knn_brute_force` role): the
    * pair join is O(n²) by definition and earns its keep as the
    * fixture approximate paths are judged against; at corpus scale the
    * candidate pairs come from the persisted LSH/IVF index
    * (`LshIndex`/`IvfIndex` probes) with the SAME integer distance
    * test, so only candidate generation, never the classification
    * rule, changes. Neighbor counting is one map-side-combined
    * aggregation over the mirrored pair frame; the border resolution
    * is one semi-join against the core set.
    */
  def dbscanClassify(emb: DataFrame, idCol: String, vecCol: String,
                     eps2: Long, minPts: Int,
                     scale: Int = 1024): DataFrame = {
    require(eps2 > 0 && minPts >= 1, s"bad eps2=$eps2 minPts=$minPts")
    val q = emb.select(col(idCol).as("i"),
      expr(s"transform($vecCol, x -> CAST(floor(CAST(x AS DOUBLE) * $scale" +
        " + 0.5) AS BIGINT))").as("q")).localCheckpoint(true)
    // the distance kernel is the native codegen QuantL2Sq loop — the
    // aggregate(zip_with(...)) tree is interpreted per pair and measured
    // 28 s vs ~2 s on the sf0.1 pair volume, value-identical
    val bridge = org.apache.spark.sql.graft.bridge
    val d2 = bridge.column(graft.expressions.QuantL2Sq(
      bridge.expression(col("qa")), bridge.expression(col("qb"))))
    val pairs = q.select(col("i").as("a"), col("q").as("qa"))
      .join(q.select(col("i").as("b"), col("q").as("qb")),
        col("a") < col("b"))
      .where(d2 <= eps2)
      .select(col("a"), col("b"))
    val mirrored = pairs.union(pairs.select(col("b"), col("a")))
      .localCheckpoint(true)
    val counts = q.select(col("i"))
      .join(mirrored.groupBy(col("a").as("i"))
        .agg(count(lit(1)).as("nb")), Seq("i"), "left")
      .select(col("i"), (coalesce(col("nb"), lit(0L)) + 1L)
        .as("n_neighbors"))
    val core = counts.where(col("n_neighbors") >= minPts)
      .select(col("i").as("c"))
    val borderIds = mirrored
      .join(core, mirrored("b") === core("c"), "left_semi")
      .select(col("a").as("i")).distinct()
    counts
      .join(core.withColumnRenamed("c", "i").withColumn("is_core", lit(1)),
        Seq("i"), "left")
      .join(borderIds.withColumn("near_core", lit(1)), Seq("i"), "left")
      .select(col("i").as(idCol), col("n_neighbors"),
        when(col("is_core") === 1, "core")
          .when(col("near_core") === 1, "border")
          .otherwise("noise").as("cls"))
  }
}
