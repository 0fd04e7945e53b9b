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
}
