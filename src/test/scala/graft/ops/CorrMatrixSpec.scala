package graft.ops

import graft.SparkSpec
import graft.queries.Analytics
import java.sql.Timestamp

/** Correlation matrix: exact ±1 on constructed linear/anti-linear
  * columns, and bounds + symmetry sanity on the real table.
  */
class CorrMatrixSpec extends SparkSpec {
  import spark.implicits._

  test("r = +1 for qty∝price, −1 for qty vs discount on a constructed line table") {
    val dir = java.nio.file.Files.createTempDirectory("corr").toString
    val ts = Timestamp.valueOf("1995-01-01 00:00:00")
    // price = 10·qty (r=+1); discount = 1 − 0.01·qty (r=−1)
    (1 to 50).map(q => (q.toLong, q.toLong, q.toLong, q, q.toDouble,
        10.0 * q, 1.0 - 0.01 * q, 0.0, "A", "O", ts))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Analytics.corrMatrix(spark, dir).collect()(0)
    assert(r.getDouble(2) === 1.0)  // r_qty_price
    assert(r.getDouble(3) === -1.0) // r_qty_disc
    assert(r.getDouble(4) === -1.0) // r_price_disc (price∝qty)
  }

  test("real table: every r in [−1, 1], one row per return flag") {
    val rows = Analytics.corrMatrix(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet.size === rows.length)
    rows.foreach { r =>
      (2 to 4).foreach { i =>
        val v = r.getDouble(i)
        assert(v >= -1.0 && v <= 1.0, s"r out of range: $v")
      }
    }
  }
}
