package graft

import graft.operators.Profiler
import org.apache.spark.sql.functions

class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  test("referentialOrphans counts child rows whose key has no parent") {
    val parent = Seq((1L, "a"), (2L, "b")).toDF("pk", "name")
    val child = Seq((10L, 1L), (11L, 1L), (12L, 2L), (13L, 99L), (14L, 99L))
      .toDF("id", "fk")
    val row = Profiler.referentialOrphans(child, "fk", parent, "pk", "child->parent")
      .as[(String, Long, Long)].head()
    assert(row == (("child->parent", 5L, 2L)))
  }

  test("referentialOrphans treats a NULL child key as an orphan") {
    val parent = Seq(Tuple1(1L)).toDF("pk")
    val child = Seq(Some(1L), None, None).toDF("fk")
    val row = Profiler.referentialOrphans(child, "fk", parent, "pk", "r")
      .as[(String, Long, Long)].head()
    assert(row == (("r", 3L, 2L)))
  }

  test("groupEntropy: exact bits for uniform and skewed groups") {
    val df = Seq(
      ("u", "a"), ("u", "b"), ("u", "c"), ("u", "d"),   // uniform over 4 → 2 bits
      ("s", "a"), ("s", "a"), ("s", "a"), ("s", "b"),   // 3:1 → ~0.8113 bits
      ("m", "a"), ("m", "a")                            // single value → 0 bits
    ).toDF("source", "lang")
    val out = Profiler.groupEntropy(df, "source", "lang")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("u") == ((4L, 4L, 2.0)))
    assert(out("m") == ((2L, 1L, 0.0)))
    val expS = math.round((2.0 - (3.0 * math.log(3.0) / math.log(2.0)) / 4.0) * 1e4) / 1e4
    assert(out("s") == ((4L, 2L, expS)))
  }

  test("schemaDrift reports added, removed, and retyped columns; empty when equal") {
    val a = Seq((1L, "x", 1.0)).toDF("id", "name", "v")
    val b = Seq((1L, 1, true)).toDF("id", "v", "flag")
    val out = Profiler.schemaDrift(a, b)
      .as[(String, String, String, String)].collect().toSet
    assert(out == Set(
      ("name", "removed", "string", null),
      ("flag", "added", null, "boolean"),
      ("v", "retyped", "double", "int")))
    assert(Profiler.schemaDrift(a, a).count() == 0L)
  }

  test("benfordFirstDigit extracts leading digits and normalized shares") {
    // values spanning magnitudes; 0 and negatives are excluded
    val df = Seq(1.0, 19.5, 123.4, 0.034, 2.0, 250.0, 999.99, 0.0, -5.0)
      .toDF("v")
    val out = Profiler.benfordFirstDigit(df, "v")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out == Map(
      1L -> ((3L, 3.0 / 7)), 2L -> ((2L, 2.0 / 7)),
      3L -> ((1L, 1.0 / 7)), 9L -> ((1L, 1.0 / 7))))
  }

  test("changepointCusum finds the level-shift hour; stable on any layout") {
    // type "a": 6 hours at value ~1 then 6 hours at ~10 — the classic
    // offline CUSUM estimate peaks at the LAST pre-shift hour; type "b"
    // has a single hour and must be filtered (no variance to standardize)
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:30:00")
    val rows =
      (0 until 6).flatMap(h => Seq(("a", ts(h), 1.0), ("a", ts(h), 1.2))) ++
      (6 until 12).flatMap(h => Seq(("a", ts(h), 10.0), ("a", ts(h), 9.8))) ++
      Seq(("b", ts(0), 5.0))
    val df = rows.toDF("event_type", "ts", "value").repartition(5)
    val got = Profiler.changepointCusum(df, "event_type", "ts", "value")
      .as[(String, Long, java.sql.Timestamp, Double)].collect()
    assert(got.map(_._1).toSeq == Seq("a")) // "b" filtered
    val (_, nHours, cp, cusum) = got.head
    assert(nHours == 12)
    assert(cp == java.sql.Timestamp.valueOf("2024-01-01 05:00:00"),
      s"changepoint at $cp")
    assert(cusum < 0) // pre-shift hours sit below the grand mean
    // exact decimal moments + fixed-order running sum: layout-stable
    val again = Profiler.changepointCusum(df.repartition(11), "event_type",
      "ts", "value")
      .as[(String, Long, java.sql.Timestamp, Double)].collect().toSeq
    assert(again == got.toSeq)
  }

  test("corrMatrix: all pairs from one pass equal per-pair corr; scan count pinned") {
    // hand-checkable: b = 2a (corr 1), c = -a (corr -1), d uncorrelated-ish
    val df = Seq(
      (1.0, 2.0, -1.0, 5.0), (2.0, 4.0, -2.0, 1.0),
      (3.0, 6.0, -3.0, 4.0), (4.0, 8.0, -4.0, 2.0), (5.0, 10.0, -5.0, 9.0))
      .toDF("a", "b", "c", "d").repartition(3)
    val got = Profiler.corrMatrix(df, Seq("a", "b", "c", "d"))
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    assert(got.size == 6)
    assert(got(("a", "b")) == 1.0)
    assert(got(("a", "c")) == -1.0)
    assert(got(("b", "c")) == -1.0)
    // the off pairs agree with the engine's own per-pair corr to 6dp
    for ((x, y) <- Seq(("a", "d"), ("b", "d"), ("c", "d"))) {
      val want = df.agg(functions.round(functions.corr(
        functions.col(x), functions.col(y)), 6)).head().getDouble(0)
      assert(got((x, y)) == want, s"($x,$y): ${got((x, y))} vs $want")
    }
    // ONE scan no matter how many pairs: the plan reads the source once
    val scans = Profiler.corrMatrix(df, Seq("a", "b", "c", "d"))
      .queryExecution.executedPlan.toString
      .split("\n").count(_.contains("Scan"))
    assert(scans <= 1, s"corrMatrix plan scans the source $scans times")
  }

  test("tukeyOutliers: order-statistic quartiles, deci-cent fences, nulls") {
    import org.apache.spark.sql.functions._
    // group g: 12 buckets totaling 10, 100..109, 1000 cents. n=12 →
    // q1 = value at rank (11 DIV 4)+1 = 3 → 101; q3 = rank (33 DIV 4)+1
    // = 9 → 107; IQR 6 → 1.5-fences [92, 116] in cents: 10 low, 1000
    // high. group q: flat totals → no outliers. NULL cents rows must
    // not poison a bucket's sum (b10 would total NULL, not 1000).
    val rows =
      (0 to 9).map(i => ("g", s"b$i", Some(100L + i))) ++
        Seq(("g", "b10", Some(1000L)), ("g", "b10", None),
          ("g", "b11", Some(10L))) ++
        (0 to 3).map(i => ("q", s"b$i", Some(50L)))
    val df = rows.toDF("grp", "bucket", "c")
    val got = Profiler.tukeyOutliers(df, "grp", col("bucket"), col("c"))
      .as[(String, String, Long, String)].collect().toSet
    assert(got === Set(("g", "b11", 10L, "low"), ("g", "b10", 1000L, "high")))
    // fence 0.1·IQR: [100.4, 107.6] — the deci-cent comparison catches
    // the half-cent-resolution fence exactly
    val tight = Profiler.tukeyOutliers(df, "grp", col("bucket"), col("c"),
      fenceTenths = 1).as[(String, String, Long, String)].collect().toSet
    assert(tight === Set(
      ("g", "b11", 10L, "low"), ("g", "b0", 100L, "low"),
      ("g", "b8", 108L, "high"), ("g", "b9", 109L, "high"),
      ("g", "b10", 1000L, "high")))
  }
}
