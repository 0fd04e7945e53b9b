package graft.ops

import graft.SparkSpec
import graft.queries.Analytics

/** WITH RECURSIVE (UnionLoop): the custkey binary-tree walk must
  * produce the complete-tree level census — 2^d nodes per full level,
  * the remainder on the last — and cover every customer exactly once.
  */
class SqlRecursiveSpec extends SparkSpec {

  test("recursive depth census is the complete binary tree over all customers") {
    val rows = Analytics.sqlRecursive(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val n = graft.Tables.load(spark, sf, "customer").count()
    assert(rows.values.sum === n, "recursion must reach every customer exactly once")
    // depth 0 = key 0 alone; depth d >= 1 holds keys [2^(d-1), 2^d) —
    // exactly 2^(d-1) nodes on full levels, partial only at the deepest
    val maxD = rows.keys.max
    assert(rows(0) === 1L)
    (1 until maxD).foreach { d =>
      assert(rows(d) === (1L << (d - 1)), s"depth $d: ${rows(d)} != ${1L << (d - 1)}")
    }
    assert(rows(maxD) <= (1L << (maxD - 1)) && rows(maxD) >= 1)
  }

  test("closed-form tree census ≡ WITH RECURSIVE on a gapped corpus") {
    // keys 0..63 with 5 and 22 deleted: the recursion cannot pass a
    // missing ancestor, so the subtrees under 5 (10,11,20..23,40..47)
    // and under 22 (44,45 — already gone via 5's subtree) vanish in
    // BOTH formulations; the closed form must drop exactly the same
    // nodes (chain-existence, not key-contiguity, is the invariant).
    import spark.implicits._
    val holed = (0L to 63L).filterNot(k => k == 5L || k == 22L)
      .map(k => (k, BigDecimal(k) + 0.25)).toDF("c_custkey", "c_acctbal")
    holed.createOrReplaceTempView("customer")
    val closed = spark.sql(Analytics.sqlRecursiveEngineSql).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    val recursive = spark.sql(
      """WITH RECURSIVE tree AS (
        |  SELECT c_custkey AS k, 0 AS depth, c_acctbal FROM customer
        |  WHERE c_custkey = 0
        |  UNION ALL
        |  SELECT c.c_custkey, t.depth + 1, c.c_acctbal
        |  FROM tree t JOIN customer c
        |    ON c.c_custkey div 2 = t.k
        |    AND c.c_custkey > t.k)
        |SELECT depth, CAST(count(*) AS BIGINT) AS n_nodes,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal_usd
        |FROM tree GROUP BY 1 ORDER BY 1""".stripMargin).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(closed.toSeq === recursive.toSeq)
    // and the gaps actually bit: depth 5 lost 10,11 and 20..23 were
    // never reached, so the full-level counts differ from 2^(d-1)
    val byDepth = closed.map(t => t._1 -> t._2).toMap
    assert(byDepth(4) < 8L)
  }
}
