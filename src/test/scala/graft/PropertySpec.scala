package graft

import graft.operators.{Behavior, CdcOps, Dedup, Sampling, StatTests, Survival}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property layer: operator invariants checked on RANDOMIZED (but
  * seed-pinned, fully deterministic) datasets against independent plain-
  * Scala replicas — the complement of the hand-case specs (which pin
  * exact known answers) and the DuckDB oracles (which pin cross-engine
  * agreement). Each property samples several generated datasets; a
  * failure prints the seed index so the case reproduces exactly.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic sample of `gen` under seed `i` — scalacheck as a pure
    * generator library, no forAll runner dependency.
    */
  private def sample[A](gen: Gen[A], i: Long): A =
    gen.apply(Gen.Parameters.default, Seed(i)).get

  private val rounds = 8L

  test("property: latestSnapshot is idempotent and partitioning-invariant") {
    val gen = Gen.listOfN(120, for {
      k <- Gen.choose(1L, 12L)
      v <- Gen.choose(1L, 40L)
      x <- Gen.choose(0L, 999L)
    } yield (k, v, x))
    for (i <- 1L to rounds) {
      val rows = sample(gen, i)
      val log = rows.toDF("user_id", "event_id", "value")
      def snap(df: org.apache.spark.sql.DataFrame) =
        CdcOps.latestSnapshot(df, Seq("user_id"), "event_id")
      val once = snap(log).as[(Long, Long, Long)].collect().toSet
      // the replica compares on version-unique logs (max_by ties on the
      // version are unspecified on both sides); the raw log still runs
      // above to prove ties never crash
      val uniq = rows.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val ulog = uniq.toDF("user_id", "event_id", "value")
      val got = snap(ulog).as[(Long, Long, Long)].collect().toSet
      val want = uniq.groupBy(_._1).map { case (_, g) =>
        g.maxBy(r => (r._2, r._3))
      }.toSet
      assert(got.map(r => (r._1, r._2)) == want.map(r => (r._1, r._2)),
        s"seed $i")
      // idempotent: collapsing the collapsed snapshot changes nothing
      assert(snap(snap(ulog)).as[(Long, Long, Long)].collect().toSet == got,
        s"seed $i")
      // partitioning-invariant
      assert(snap(ulog.repartition(7)).as[(Long, Long, Long)]
        .collect().toSet == got, s"seed $i")
      assert(once.nonEmpty)
    }
  }

  test("property: windowFunnel level is monotone in the window size") {
    val steps = Seq("a", "b", "c")
    val gen = Gen.listOfN(150, for {
      u <- Gen.choose(1L, 10L)
      t <- Gen.choose(0L, 100L)
      s <- Gen.oneOf("a", "b", "c", "x")
    } yield (u, t, s))
    for (i <- 1L to rounds) {
      val rows = sample(gen, i).zipWithIndex
        .map { case ((u, t, s), j) => (u, t * 1000000L, s, j.toLong) }
      val ev = rows.toDF("u", "us", "etype", "eid")
        .select(col("u"), timestamp_micros(col("us")).as("ts"),
          col("etype"), col("eid"))
      def levels(windowUs: Long) =
        Behavior.windowFunnel(ev, "u", "etype", "ts", steps, windowUs)
          .as[(Long, Long)].collect().toMap
      val small = levels(10L * 1000000L)
      val big = levels(200L * 1000000L)
      assert(small.keySet == big.keySet, s"seed $i")
      small.foreach { case (u, lv) =>
        assert(lv <= big(u), s"seed $i user $u: $lv > ${big(u)}")
        assert(lv >= 0L && lv <= steps.length.toLong, s"seed $i")
      }
    }
  }

  test("property: trimmedMean equals the sort-drop-average replica") {
    val gen = for {
      n <- Gen.choose(5, 60)
      ys <- Gen.listOfN(n, Gen.choose(-500L, 500L))
    } yield ys
    for (i <- 1L to rounds) {
      val ys = sample(gen, i)
      val got = StatTests.trimmedMean(
        ys.map(("g", _)).toDF("grp", "y"), col("grp"), col("y"), 0.1)
        .collect()(0)
      val k = math.floor(ys.length * 0.1).toLong
      val kept = ys.sorted.drop(k.toInt).dropRight(k.toInt)
      val want = BigDecimal(kept.sum.toDouble / kept.length / 100.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got.getLong(2) == k, s"seed $i")
      assert(got.getDouble(3) == want, s"seed $i: ${got.getDouble(3)} != $want")
    }
  }

  test("property: wilcoxonSignedRank equals the midrank replica") {
    val gen = Gen.listOfN(40, for {
      u <- Gen.choose(1L, 10L)
      us <- Gen.choose(0L, 1000L)
      y <- Gen.choose(-50L, 50L)
    } yield (u, us, y))
    for (i <- 1L to rounds) {
      val rows = sample(gen, i)
      val got = StatTests.wilcoxonSignedRank(rows.toDF("u", "us", "y"),
        col("u"), col("y"), col("us")).collect()
      // plain-Scala replica of the whole chain
      val mid = (rows.map(_._2).min + rows.map(_._2).max) / 2
      val diffs = rows.groupBy(_._1).values.flatMap { rs =>
        val post = rs.filter(_._2 >= mid).map(_._3).sum
        val pre = rs.filter(_._2 < mid).map(_._3).sum
        if (rs.exists(_._2 >= mid) && rs.exists(_._2 < mid) &&
          post - pre != 0L) Some(post - pre) else None
      }.toSeq
      if (diffs.size < 2) assert(got.isEmpty, s"seed $i")
      else {
        val n = diffs.size
        var below = 0L; var wplus = 0.0; var tsum = 0L
        diffs.map(d => (math.abs(d), d > 0L)).groupBy(_._1).toSeq
          .sortBy(_._1).foreach { case (_, grp) =>
            val cn = grp.size
            val midrank = below + (cn + 1) / 2.0
            wplus += grp.count(_._2) * midrank
            tsum += cn.toLong * cn * cn - cn
            below += cn
          }
        val mu = n * (n + 1) / 4.0
        val s2 = n * (n + 1.0) * (2.0 * n + 1.0) / 24.0 - tsum / 48.0
        val r = got(0)
        assert(r.getLong(0) == n.toLong, s"seed $i")
        assert(r.getDouble(1) == wplus, s"seed $i")
        assert(math.abs(r.getDouble(2) - (wplus - mu) / math.sqrt(s2))
          <= 2e-6, s"seed $i: ${r.getDouble(2)}")
      }
    }
  }

  test("property: kaplanMeier matches a direct replica; survival is monotone") {
    val DAY = 86400000000L
    val gen = Gen.listOfN(40, for {
      c <- Gen.choose(1L, 8L)
      d <- Gen.choose(0L, 30L)
    } yield (c, d))
    for (i <- 1L to rounds) {
      val rows = sample(gen, i).distinct
      val orders = rows.map { case (c, d) => (c, d * DAY) }
        .toDF("cust", "us")
        .select(col("cust"), timestamp_micros(col("us")).as("ots"))
      val got = Survival.kaplanMeier(orders, "cust", "ots")
        .as[(Long, Long, Long, Long, Double)].collect().toSeq
      // replica: per customer sorted days → gaps (events) + final censor
      val horizon = rows.map(_._2).max
      val durs = rows.groupBy(_._1).values.flatMap { g =>
        val ds = g.map(_._2).sorted
        ds.zip(ds.tail).map { case (a, b) => (b - a, true) } :+
          ((horizon - ds.last, false))
      }.toSeq
      val n = durs.size
      val eventTimes = durs.filter(_._2).map(_._1).distinct.sorted
      var logS = 0.0
      var absorbed = false
      val want = eventTimes.map { t =>
        val nRisk = durs.count(_._1 >= t).toLong
        val d = durs.count(x => x._2 && x._1 == t).toLong
        val s =
          if (absorbed || d >= nRisk) { absorbed = true; 0.0 }
          else {
            logS += math.log((nRisk - d).toDouble / nRisk.toDouble)
            BigDecimal(math.exp(logS))
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          }
        (t, nRisk, d, s)
      }
      assert(got.map(r => (r._1, r._2, r._3, r._5)) == want, s"seed $i")
      // survival never increases along durations
      got.map(_._5).sliding(2).foreach {
        case Seq(a, b) => assert(b <= a, s"seed $i")
        case _ => ()
      }
      assert(n == durs.size)
    }
  }

  test("property: sentenceDedup is idempotent (removal never creates work)") {
    val pieceGen = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff", "gg")
    val gen = Gen.listOfN(25, Gen.choose(1, 4).flatMap(n =>
      Gen.listOfN(n, pieceGen).map(_.mkString(". "))))
    for (i <- 1L to rounds) {
      val texts = sample(gen, i).zipWithIndex
        .map { case (t, j) => (j.toLong, t) }
      val docs = texts.toDF("doc_id", "text")
      // idempotence holds on docs that survive non-empty: their kept
      // pieces' corpus frequency can only DROP when other docs shed
      // pieces. (Docs that empty introduce a new "" piece — the one
      // legitimate second-pass removal — so they are excluded here.)
      val once = Dedup.sentenceDedup(docs, "doc_id", "text")
        .where(col("clean_text") =!= "")
        .select(col("doc_id"), col("clean_text").as("text"))
      val onceRows = once.as[(Long, String)].collect().toMap
      val twice = Dedup.sentenceDedup(once, "doc_id", "text")
        .as[(Long, Long, Long, String)].collect()
      twice.foreach { case (id, _, removed, clean) =>
        assert(removed == 0L, s"seed $i doc $id: second pass removed rows")
        assert(clean == onceRows(id), s"seed $i doc $id")
      }
    }
  }

  test("property: weightedSample equals the exact A-ES top-k replica") {
    val gen = Gen.listOfN(30, for {
      id <- Gen.choose(1L, 10000L)
      w <- Gen.choose(1L, 5000L)
    } yield (id, w))
    for (i <- 1L to rounds) {
      val rows = sample(gen, i).distinctBy(_._1)
      def es(id: Long, w: Long): Double =
        math.log((Math.floorMod(id * 2654435761L, 10000L) + 1).toDouble
          / 10001.0) / w.toDouble
      val want = rows.sortBy { case (id, w) => (-es(id, w), id) }
        .take(10).map(_._1).toSet
      val got = Sampling.weightedSample(rows.toDF("id", "w"),
        col("id"), col("w"), 10).select("id").as[Long].collect().toSet
      assert(got == want, s"seed $i")
    }
  }

  test("property: weightedSamplePerGroup decomposes to per-group draws") {
    val gen = Gen.listOfN(40, for {
      id <- Gen.choose(1L, 10000L)
      g <- Gen.oneOf("a", "b", "c")
      w <- Gen.choose(1L, 5000L)
    } yield (id, g, w))
    for (i <- 1L to rounds) {
      val rows = sample(gen, i).distinctBy(_._1)
      val df = rows.toDF("id", "g", "w")
      val got = Sampling.weightedSamplePerGroup(df, col("g"), col("id"),
        col("w"), 5).select("g", "id").as[(String, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      for (g <- rows.map(_._2).distinct) {
        val sub = rows.filter(_._2 == g).map(r => (r._1, r._3))
        val want = Sampling.weightedSample(sub.toDF("id", "w"),
          col("id"), col("w"), 5).select("id").as[Long].collect().toSet
        assert(got.getOrElse(g, Set.empty) == want, s"seed $i group $g")
      }
    }
  }

  test("property: kCore members have >= k in-core neighbors, outsiders don't") {
    // the defining property of the k-core (unique maximal subgraph of
    // min-degree k): every member keeps >= k neighbors INSIDE the core,
    // and no removed node has >= k core neighbors (else the peel was
    // wrong). Self-consistency on seeded random graphs, plus
    // partitioning invariance.
    val gen = Gen.listOfN(60, for {
      a <- Gen.choose(1L, 20L)
      b <- Gen.choose(1L, 20L)
    } yield (a, b))
    for (i <- 1L to rounds) {
      val und = sample(gen, i).filter(e => e._1 != e._2)
      val edges = (und ++ und.map(_.swap)).distinct
      val df = edges.toDF("src", "dst")
      val core = graft.operators.Graph.kCore(df, "src", "dst", 3)
        .as[(Long, Long)].collect().toMap
      val adj = edges.groupBy(_._1).map { case (n, es) =>
        n -> es.map(_._2).toSet
      }
      core.foreach { case (n, deg) =>
        val inCore = adj(n).count(core.contains)
        assert(inCore >= 3 && inCore.toLong == deg, s"seed $i node $n")
      }
      adj.keys.filterNot(core.contains).foreach { n =>
        assert(adj(n).count(core.contains) < 3, s"seed $i outsider $n")
      }
      val reGot = graft.operators.Graph
        .kCore(df.repartition(7), "src", "dst", 3)
        .as[(Long, Long)].collect().toMap
      assert(reGot == core, s"seed $i partitioning")
    }
  }

  test("property: tukeyOutliers equals the sort-rank-fence replica") {
    val gen = Gen.listOfN(40, for {
      b <- Gen.choose(1L, 15L)
      c <- Gen.choose(-500L, 2000L)
    } yield (b, c))
    for (i <- 1L to rounds) {
      val rows = sample(gen, i)
      val df = rows.toDF("b", "c").withColumn("g", lit("g"))
      val got = graft.operators.Profiler
        .tukeyOutliers(df, "g", col("b"), col("c"))
        .as[(String, Long, Long, String)].collect()
        .map(r => (r._2, r._3, r._4)).toSet
      // replica: bucket totals, order-statistic quartiles, deci-fences
      val totals = rows.groupBy(_._1).map { case (b, g) =>
        b -> g.map(_._2).sum
      }.toMap
      val sorted = totals.values.toSeq.sorted
      val n = sorted.size
      val q1 = sorted((n - 1) / 4)
      val q3 = sorted((n - 1) * 3 / 4)
      val want = totals.collect {
        case (b, t) if 10 * t < 10 * q1 - 15 * (q3 - q1) => (b, t, "low")
        case (b, t) if 10 * t > 10 * q3 + 15 * (q3 - q1) => (b, t, "high")
      }.toSet
      assert(got == want, s"seed $i")
    }
  }

  test("property: centroidSilhouette equals a plain-Scala replica") {
    val gen = Gen.listOfN(30, for {
      lbl <- Gen.choose(0, 2)
      x <- Gen.choose(-300, 300)
      y <- Gen.choose(-300, 300)
    } yield (lbl, x / 100.0f, y / 100.0f))
    for (i <- 1L to rounds) {
      val pts = sample(gen, i).zipWithIndex
        .map { case ((l, x, y), id) => (id.toLong, Array(x, y), l) }
      val df = pts.toDF("vec_id", "embedding", "label")
      val got = graft.operators.ClusterEval
        .centroidSilhouette(df, "vec_id", "embedding", "label")
        .as[(Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      // replica on the same micro grid / multiplied-out integer form
      val micro = pts.map { case (id, v, l) =>
        (id, v.map(x => math.floor(x.toDouble * 1000000).toLong), l.toLong)
      }
      val byL = micro.groupBy(_._3)
      if (byL.size >= 2) {
        val sums = byL.map { case (l, g) =>
          l -> (g.size.toLong, Array(g.map(_._2(0)).sum, g.map(_._2(1)).sum))
        }
        val sil = micro.map { case (_, v, own) =>
          val ds = sums.map { case (l, (n, s)) =>
            // exact integer numerator first, ONE cast to double after the
            // fold — the operator's decimal(38,0) aggregate, replicated
            val num = v.indices.map { j =>
              val t = BigDecimal(n) * BigDecimal(v(j)) - BigDecimal(s(j))
              t * t
            }.sum
            l -> math.sqrt(num.toDouble) / n.toDouble
          }
          val a = ds(own)
          val b = (ds - own).values.min
          val s = if (math.max(a, b) == 0.0) 0.0
            else (b - a) / math.max(a, b)
          own -> math.floor(s * 1000000 + 0.5).toLong
        }
        val want = sil.groupBy(_._1).map { case (l, g) =>
          val mean = BigDecimal(g.map(_._2).sum.toDouble / g.size / 1e6)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          l -> ((g.size.toLong, mean))
        }
        assert(got == want, s"seed $i")
      }
    }
  }

  test("property: weightedQuantiles equals the cumulative-weight replica") {
    val gen = Gen.listOfN(150, for {
      g <- Gen.oneOf("a", "b")
      v <- Gen.choose(0L, 25L)
      w <- Gen.choose(0L, 5L) // zeros exercise the invisible-row rule
    } yield (g, v, w))
    val qs = Seq(100, 500, 901, 1000)
    for (i <- 1L to rounds) {
      val rows = sample(gen, i)
      val got = StatTests.weightedQuantiles(rows.toDF("g", "v", "w"),
        col("g"), col("v"), col("w"), qs)
        .as[(String, Long, Long)].collect().toSet
      val want = rows.filter(_._3 > 0).groupBy(_._1).flatMap { case (g, rs) =>
        val grain = rs.groupBy(_._2).view.mapValues(_.map(_._3).sum)
          .toSeq.sortBy(_._1)
        val tot = grain.map(_._2).sum
        qs.flatMap { q =>
          var cum = 0L
          grain.collectFirst {
            case (v, w) if { cum += w; cum * 1000 >= q * tot } =>
              (g, q.toLong, v)
          }
        }
      }.toSet
      assert(got == want, s"seed $i")
    }
  }

  test("property: labelPropagation equals the synchronous min-tie replica") {
    val gen = Gen.listOfN(60, for {
      a <- Gen.choose(1L, 18L)
      b <- Gen.choose(1L, 18L)
    } yield (a, b))
    for (i <- 1L to rounds) {
      val und = sample(gen, i).filter(t => t._1 != t._2).distinct
      if (und.nonEmpty) {
        val edges = (und ++ und.map(_.swap)).distinct
        val got = graft.operators.Graph
          .labelPropagation(edges.toDF("src", "dst"), "src", "dst", 3)
          .as[(Long, Long)].collect().toMap
        val inN = edges.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
        var lbl = edges.flatMap(e => Seq(e._1, e._2)).distinct
          .map(n => n -> n).toMap
        for (_ <- 1 to 3) {
          lbl = lbl.map { case (n, l) =>
            inN.get(n) match {
              case None | Some(Nil) => n -> l
              case Some(nbrs) =>
                val votes = nbrs.map(lbl).groupBy(identity).view
                  .mapValues(_.size).toSeq
                n -> votes.minBy { case (cand, c) => (-c, cand) }._1
            }
          }
        }
        assert(got == lbl, s"seed $i")
      }
    }
  }

  test("property: bipartiteBestPartner's pick maximizes (cn, -partner) " +
    "over the wedge-derived candidates") {
    val gen = Gen.listOfN(80, for {
      c <- Gen.choose(1L, 15L)
      s <- Gen.choose(1L, 10L)
    } yield (c, s))
    for (i <- 1L to rounds) {
      val rel = sample(gen, i).distinct
      val got = graft.operators.Graph
        .bipartiteBestPartner(rel.toDF("c", "s"), "c", "s")
        .as[(Long, Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      val byC = rel.groupBy(_._1).view.mapValues(_.map(_._2).distinct)
        .filter(_._2.size >= 2).toMap
      val cn = scala.collection.mutable.Map.empty[(Long, Long), Long]
      byC.values.foreach { ss =>
        for (a <- ss; b <- ss if a < b)
          cn((a, b)) = cn.getOrElse((a, b), 0L) + 1L
      }
      val want = cn.toSeq.flatMap { case ((a, b), n) =>
        Seq(a -> ((b, n)), b -> ((a, n))) }
        .groupBy(_._1).map { case (node, cands) =>
          node -> cands.map(_._2).minBy { case (p, n) => (-n, p) }
        }
      assert(got == want, s"seed $i")
    }
  }

  test("byte-level hash formulation (r19 ASCII lift): engine token/gram " +
    "kernels equal hex-pair UTF-8 byte replicas of the DuckDB oracle on " +
    "NON-ASCII text") {
    import org.apache.spark.unsafe.types.UTF8String
    // the SQL's byte enumeration, replicated literally: DuckDB
    // hex(encode(s)) decoded pair-by-pair via strpos arithmetic — on any
    // text (accents, CJK, emoji) this yields Java's `getBytes & 0xff`
    def hexBytes(t: String): Array[Int] = {
      val hx = t.getBytes("UTF-8").map(b => f"${b & 0xff}%02X").mkString
      hx.grouped(2).map(pr => "0123456789ABCDEF".indexOf(pr(0)) * 16 +
        "0123456789ABCDEF".indexOf(pr(1))).toArray
    }
    // mod-2^64 arithmetic = Long wraparound, as the HUGEINT % 2^64 SQL
    def splitmix(h0: Long): Long = {
      var x = h0 + 0x9e3779b97f4a7c15L
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      x ^ (x >>> 31)
    }
    def polyMix(bs: Array[Int]): Long =
      splitmix(bs.foldLeft(0L)((h, b) => h * 1000003L + b))
    def fnvRep(bs: Array[Int]): Long =
      bs.foldLeft(0xcbf29ce484222325L)((h, b) => (h ^ b.toLong) * 0x100000001b3L)
    val toks = Seq("héllo", "naïve", "日本語テキスト", "🚀rocket",
      "mixedΩmega", "plainascii", "ß", "ẞ\u00a0nbsp")
    toks.foreach { t =>
      val u = UTF8String.fromString(t)
      assert(graft.expressions.RollingFingerprint.hashString(u) ===
        polyMix(hexBytes(t)), s"polyhash diverges on '$t'")
      assert(graft.expressions.TokenMinHash.fnv64(u) ===
        fnvRep(hexBytes(t)), s"fnv64 diverges on '$t'")
    }
    // winnow fingerprints: the engine's ROLLING k-gram form equals the
    // oracle's DIRECT per-gram polynomial over the same byte stream
    // (equality in the mod-2^64 ring), then the same window minima +
    // sorted distinct
    def winnowRep(text: String, k: Int, w: Int): Array[Long] = {
      val bs = hexBytes(text)
      if (bs.length < k) return Array(polyMix(bs))
      val grams = (0 to bs.length - k)
        .map(i => polyMix(bs.slice(i, i + k))).toArray
      val mins =
        if (grams.length <= w) Seq(grams.min)
        else (0 to grams.length - w).map(st => grams.slice(st, st + w).min)
      mins.distinct.sorted.toArray
    }
    val texts = Seq(
      "héllo naïve 日本語 🚀 long enough for sixteen byte grams indeed",
      "çédille and ümlauts mixed with 漢字 across the gram boundary",
      "short𐍈") // one 4-byte supplementary char
    texts.foreach { txt =>
      val eng = graft.expressions.RollingFingerprint
        .compute(UTF8String.fromString(txt), 16, 8).toSeq
      assert(eng === winnowRep(txt, 16, 8).toSeq, s"winnow diverges on '$txt'")
    }
  }
}
