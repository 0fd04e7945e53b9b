package graft.ops

import graft.SparkSpec
import graft.queries.Events
import org.apache.spark.sql.functions._

/** Linear attribution: credit conservation, model agreement on the
  * 'direct' class with the last-touch face, and a driver replay of the
  * equal-split rule.
  */
class LinearAttributionSpec extends SparkSpec {

  private lazy val linear = Events.linearAttribution(spark, sf).collect()
    .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap

  test("credit is conserved: attributed totals sum to total purchase value (± rounding)") {
    val total = graft.Tables.loadEvents(spark, sf)
      .filter(col("event_type") === "purchase")
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double"))
      .head.getDouble(0)
    val attributed = linear.values.map(_._2).sum
    val purchases = graft.Tables.loadEvents(spark, sf)
      .filter(col("event_type") === "purchase").count()
    // each purchase's shares are rounded to 4 dp, so drift ≤ n·1e-4
    assert(math.abs(attributed - total) <= purchases * 1e-4 + 1e-6,
      s"credit leak: $attributed vs $total")
  }

  test("'direct' agrees with the last-touch model: same purchases have no touch under either") {
    val lt = Events.lastTouchAttribution(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // a purchase is 'direct' in the linear model iff its lookback
    // window holds zero touches — the same condition as last-touch
    assert(linear.get("direct").map(_._1) === lt.get("direct").map(_._1),
      s"models disagree on direct purchases: ${linear.get("direct")} vs ${lt.get("direct")}")
    assert(linear.get("direct").map(_._2) === lt.get("direct").map(_._2))
  }

  test("touch shares beat winner-takes-all spread: every non-purchase type credited by linear ⊇ last-touch") {
    val lt = Events.lastTouchAttribution(spark, sf).collect()
      .map(_.getString(0)).toSet
    assert(lt.subsetOf(linear.keySet),
      s"a type won last-touch but got zero linear credit: ${lt -- linear.keySet}")
    assert(linear.keySet.size >= 2, "degenerate: only one touch type credited")
  }
}
