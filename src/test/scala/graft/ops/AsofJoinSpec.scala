package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  // left: (key, ts, tag) — right: (key, ts, v)
  private lazy val left = Seq(
    ("a", 10L, "l1"), ("a", 20L, "l2"), ("a", 5L, "l0"),
    ("b", 7L, "l3"), ("c", 1L, "l4")
  ).toDF("k", "t", "tag")
  private lazy val right = Seq(
    ("a", 10L, 1.0), ("a", 15L, 2.0), ("b", 3L, 3.0), ("d", 1L, 4.0)
  ).toDF("k", "t", "v")

  private def run = AsofJoin.asofLeft(left, right, "k", "t", Seq("v"))
    .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
      Option(r.get(3)).map(_.asInstanceOf[Double])))
    .sortBy(r => (r._1, r._2))

  test("asofLeft picks the latest right row at-or-before each left ts") {
    assert(run.toSeq == Seq(
      ("a", 5L, "l0", None),          // nothing at-or-before 5
      ("a", 10L, "l1", Some(1.0)),    // equal ts is inclusive
      ("a", 20L, "l2", Some(2.0)),    // 15 < 20, latest wins
      ("b", 7L, "l3", Some(3.0)),
      ("c", 1L, "l4", None)))         // key with no right rows
  }

  test("asofLeft preserves left cardinality (no fan-out, no loss)") {
    assert(run.length == left.count())
  }

  test("asofLeftForward picks the earliest right row at-or-after each left ts") {
    val got = AsofJoin.asofLeftForward(left, right, "k", "t", Seq("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
      .sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(
      ("a", 5L, "l0", Some(1.0)),     // next at-or-after 5 is 10
      ("a", 10L, "l1", Some(1.0)),    // equal ts is inclusive
      ("a", 20L, "l2", None),         // nothing after 20
      ("b", 7L, "l3", None),          // b's only right row is before
      ("c", 1L, "l4", None)))
  }

  test("null right values are carried over (treated as no observation)") {
    val r2 = Seq(("a", 8L, Some(9.0)), ("a", 12L, Option.empty[Double]))
      .toDF("k", "t", "v")
    val got = AsofJoin.asofLeft(Seq(("a", 15L)).toDF("k", "t"), r2, "k", "t", Seq("v"))
      .collect()
    assert(got.length == 1 && got(0).getDouble(2) == 9.0)
  }
}
