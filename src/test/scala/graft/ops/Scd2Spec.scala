package graft.ops

import graft.SparkSpec
import graft.queries.Maintenance
import org.apache.spark.sql.functions._

/** SCD2 history: interval-chain integrity per key, hand-checked version
  * chains for every change class, and cross-face consistency — the
  * current rows must be exactly what latest-wins CDC merge leaves
  * behind for the same feed.
  */
class Scd2Spec extends SparkSpec {

  private lazy val hist = Maintenance.scd2History(spark, sf)

  test("interval chains are well-formed: ordered, contiguous, ≤1 current; deletes close without reopening") {
    val rows = hist.collect().map(r => (r.getLong(0), r.getDouble(1),
        r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getBoolean(4)))
      .groupBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (k, vs) =>
      val sorted = vs.sortBy(_._3)
      sorted.sliding(2).foreach {
        case Array((_, _, _, Some(to), _), (_, _, from, _, _)) =>
          assert(to === from, s"key $k: interval gap ($to vs $from)")
        case Array((_, _, _, None, _), _) =>
          fail(s"key $k: an open interval is followed by another version")
        case _ => ()
      }
      val current = sorted.count(_._5)
      assert(current <= 1, s"key $k has $current current versions")
      sorted.foreach { case (_, _, from, to, cur) =>
        to.foreach(t => assert(from < t, s"key $k: empty interval [$from,$t)"))
        assert(cur === to.isEmpty, s"key $k: is_current disagrees with valid_to")
      }
      // deleted keys (%10==3, never re-inserted) end closed
      if (k % 10 === 3) assert(current === 0, s"deleted key $k still current")
    }
  }

  test("hand chains: double-update, delete, and insert classes") {
    val byKey = hist.collect().map(r => (r.getLong(0), r.getDouble(1),
        r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .groupBy(_._1)
    val base = graft.Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val k20 = base.keys.filter(_ % 20 == 4).head
    assert(byKey(k20).sortBy(_._3) === Seq(
      (k20, base(k20), 0L, Some(1L)),
      (k20, base(k20) + 1000.0, 1L, Some(2L)),
      (k20, base(k20) + 5000.0, 2L, None)))
    val kDel = base.keys.filter(_ % 10 == 3).head
    assert(byKey(kDel) === Seq((kDel, base(kDel), 0L, Some(1L))))
    val kIns = base.keys.filter(_ % 10 == 7).head
    assert(byKey(kIns + 10000000L) === Seq(
      (kIns + 10000000L, base(kIns), 1L, None)))
  }

  test("as-of probes bracket the change: t=0 is the pre-change snapshot, t=2 agrees with the current rows") {
    val asOf = Maintenance.scd2AsOf(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // t = 0: every changed key's initial version is live (inserted keys
    // arrive at seq 1, so they are absent)
    val changedBase = hist.filter(col("valid_from") === 0L)
      .agg(count(lit(1)), sum(col("price").cast("decimal(18,2)")).cast("double"))
      .head
    assert(asOf(0L)._1 === changedBase.getLong(0))
    assert(math.abs(asOf(0L)._2 - changedBase.getDouble(1)) < 1e-6)
    // t = 2: exactly the current rows (nothing in this feed opens after 2)
    val current = hist.filter(col("is_current"))
      .agg(count(lit(1)), sum(col("price").cast("decimal(18,2)")).cast("double"))
      .head
    assert(asOf(2L)._1 === current.getLong(0))
    assert(math.abs(asOf(2L)._2 - current.getDouble(1)) < 1e-6)
    // live counts move monotonically as deletes outnumber inserts here
    assert(asOf.keySet === Set(0L, 1L, 2L))
  }

  test("cross-face: current versions ≡ the latest-wins CDC merge, on the changed slice") {
    val current = hist.filter(col("is_current"))
      .select(col("o_orderkey"), col("price"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val merged = Maintenance.cdcMerge(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    current.foreach { case (k, v) =>
      assert(merged.get(k) === Some(v),
        s"key $k: SCD2 current $v vs CDC merge ${merged.get(k)}")
    }
    // and the deleted keys' absence agrees too
    val deleted = hist.collect().map(_.getLong(0)).filter(_ % 10 == 3)
    deleted.foreach(k => assert(!merged.contains(k), s"deleted key $k survived the merge"))
  }
}
