package graft.dv3f

import graft.SparkSpec

class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("profile: nulls, distincts, min/max per column in one pass") {
    val df = Seq(
      (Some("a"), Some(1)), (Some("b"), None),
      (Some("a"), Some(3)), (None, Some(3))
    ).toDF("s", "i")
    val p = Quality.profile(df, Seq("s", "i")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))).toMap
    assert(p("s") == ((4L, 1L, 2L, "a", "b")))
    assert(p("i") == ((4L, 1L, 2L, "1", "3")))
  }

  test("unique/notNull violations: dbt semantics (NULLs ignored by unique)") {
    val df = Seq(Some(1), Some(1), Some(2), None, None).toDF("id")
    assert(Quality.uniqueViolations(df, "id") == 1) // only value 1 repeats
    assert(Quality.notNullViolations(df, "id") == 2)
  }
}
