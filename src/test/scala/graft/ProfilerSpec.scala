package graft

import graft.operators.Profiler

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
}
