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
}
