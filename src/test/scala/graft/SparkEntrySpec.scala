package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: every declared query carries a DuckDB
  * oracle (a missing oracle silently downgrades the driver's check to
  * rows-only), and every oracle points at a declared query.
  */
class SparkEntrySpec extends AnyFunSuite {

  test("queries and oracleSql cover exactly the same names") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries missing an oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without a query: ${(o -- q).toSeq.sorted}")
  }

  test("oracle SQL strings are non-empty and mention a table or literal source") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, name)
      assert(sql.toUpperCase.contains("SELECT"), s"$name oracle has no SELECT")
    }
  }
}
