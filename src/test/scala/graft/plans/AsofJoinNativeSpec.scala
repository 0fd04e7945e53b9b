package graft.plans

import graft.SparkSpec
import graft.ops.AsofJoin

class AsofJoinNativeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val left = Seq(
    ("a", 10L, "l1"), ("a", 20L, "l2"), ("a", 5L, "l0"),
    ("b", 7L, "l3"), ("c", 1L, "l4")
  ).toDF("k", "t", "tag")
  private lazy val right = Seq(
    ("a", 10L, 1.0), ("a", 15L, 2.0), ("b", 3L, 3.0), ("d", 1L, 4.0)
  ).toDF("k", "t", "v")

  private def run = AsofJoinNative.asofLeft(left, right, "k", "t", Seq("v"))
    .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
      Option(r.get(3)).map(_.asInstanceOf[Double])))
    .sortBy(r => (r._1, r._2))

  test("native asof join picks the latest right row at-or-before each left ts") {
    assert(run.toSeq == Seq(
      ("a", 5L, "l0", None),
      ("a", 10L, "l1", Some(1.0)),   // equal ts is inclusive
      ("a", 20L, "l2", Some(2.0)),
      ("b", 7L, "l3", Some(3.0)),
      ("c", 1L, "l4", None)))
  }

  test("plans to AsofJoinExec with one exchange+sort per side") {
    val df = AsofJoinNative.asofLeft(left, right, "k", "t", Seq("v"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan)
    // Each child sorts only its own schema — the union+window form
    // instead sorts one padded run of both sides.
    assert("(?s)Sort".r.findAllIn(plan).size >= 2, plan)
  }

  test("matched right row's values are returned verbatim (DuckDB ASOF semantics)") {
    // A null in the matched row stays null — unlike the window
    // formulation, which carries the previous non-null forward.
    val r2 = Seq(("a", 8L, Some(9.0)), ("a", 12L, Option.empty[Double]))
      .toDF("k", "t", "v")
    val got = AsofJoinNative
      .asofLeft(Seq(("a", 15L)).toDF("k", "t"), r2, "k", "t", Seq("v"))
      .collect()
    assert(got.length == 1 && got(0).isNullAt(2))
  }

  test("agrees with the compositional asofLeft on random keyed series") {
    val rnd = new scala.util.Random(42)
    val l = Seq.fill(400)((s"k${rnd.nextInt(20)}", rnd.nextInt(1000).toLong,
      rnd.nextInt(100))).toDF("k", "t", "tag")
    // unique (k, t) on the right, non-null values (where the two
    // formulations are defined to agree)
    val r = Seq.fill(300)((s"k${rnd.nextInt(25)}", rnd.nextInt(1000).toLong))
      .distinct.map { case (k, t) => (k, t, rnd.nextDouble()) }
      .toDF("k", "t", "v")
    val a = AsofJoinNative.asofLeft(l, r, "k", "t", Seq("v"))
      .collect().map(x => (x.getString(0), x.getLong(1), x.getInt(2),
        Option(x.get(3)))).toSet
    val b = AsofJoin.asofLeft(l, r, "k", "t", Seq("v"))
      .collect().map(x => (x.getString(0), x.getLong(1), x.getInt(2),
        Option(x.get(3)))).toSet
    assert(a == b)
  }

  test("NULL join keys never match (SQL ON-equality, DuckDB ASOF semantics)") {
    val l = Seq((Option("a"), 10L, "la"), (Option.empty[String], 10L, "ln"),
      (Option.empty[String], 20L, "ln2")).toDF("k", "t", "tag")
    val r = Seq((Option("a"), 5L, 1.0), (Option.empty[String], 5L, 99.0))
      .toDF("k", "t", "v")
    val got = AsofJoinNative.asofLeft(l, r, "k", "t", Seq("v"))
      .collect().map(x => (Option(x.getString(0)), x.getString(2),
        Option(x.get(3)))).toSet
    // null-key left rows come back unmatched; the null-key right row
    // matches nothing
    assert(got == Set(
      (Some("a"), "la", Some(1.0)),
      (None, "ln", None),
      (None, "ln2", None)))
  }

  test("multi-partition merge: results independent of partitioning") {
    val l = (1 to 500).map(i => (s"k${i % 7}", (i * 13 % 997).toLong, i))
      .toDF("k", "t", "tag")
    val r = (1 to 300).map(i => (s"k${i % 9}", (i * 29 % 997).toLong))
      .distinct.map { case (k, t) => (k, t, k + ":" + t) }
      .toDF("k", "t", "v")
    val once = AsofJoinNative.asofLeft(l.coalesce(1), r.coalesce(1),
      "k", "t", Seq("v")).collect().map(_.toSeq).toSet
    val many = AsofJoinNative.asofLeft(l.repartition(11), r.repartition(5),
      "k", "t", Seq("v")).collect().map(_.toSeq).toSet
    assert(once == many)
  }
}
