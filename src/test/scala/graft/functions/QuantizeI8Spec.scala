package graft.functions

import graft.SparkSpec
import graft.ops.Similarity
import org.apache.spark.sql.functions._

class QuantizeI8Spec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (1L, Array(1.0f, -0.5f, 0.25f, 0.0f)),
    (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)),     // all-zero: scale 0, codes 0
    (3L, Array(-2.0f, 2.0f, 1.0f, -1.0f))
  ).toDF("vec_id", "embedding")

  test("codes are floor(x*127/max|x| + 0.5), scale recoverable") {
    val got = Similarity.quantizeI8(vecs, col("embedding"))
      .select($"vec_id", $"q_i8", $"q_scale")
      .collect().map(r => (r.getLong(0), r.getSeq[Byte](1), r.getDouble(2)))
      .sortBy(_._1)
    assert(got(0)._2 == Seq[Byte](127, -63, 32, 0)) // -0.5*127+0.5 = -63; 0.25*127+0.5 -> 32
    assert(got(0)._3 == 127.0)
    assert(got(1)._2 == Seq[Byte](0, 0, 0, 0) && got(1)._3 == 0.0)
    assert(got(2)._2 == Seq[Byte](-127, 127, 64, -63) && got(2)._3 == 63.5)
  }

  test("int8 dot product is exact and symmetric") {
    val q = Similarity.quantizeI8(vecs, col("embedding"))
      .select($"vec_id", $"q_i8")
    val pairs = q.as("a").crossJoin(q.as("b"))
      .select($"a.vec_id".as("ia"), $"b.vec_id".as("ib"),
        GraftFunctions.dotI8($"a.q_i8", $"b.q_i8").as("d"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(pairs((1L, 1L)) == 127L * 127 + 63L * 63 + 32L * 32)
    assert(pairs((1L, 3L)) == pairs((3L, 1L)))
    assert(pairs((2L, 3L)) == 0L)
  }

  test("quantized scores track float cosine ranking on real embeddings") {
    val emb = graft.Tables.load(spark, sf, "embeddings")
    val q = Similarity
      .quantizeI8(emb.filter($"vec_id" === 0), col("embedding"))
      .select($"q_i8").collect()(0).getSeq[Byte](0)
    val i8Top = Similarity
      .quantizedTopK(emb, col("vec_id"), col("embedding"), q, k = 5)
      .select("vec_id").as[Long].collect().toSet
    val floatTop = emb
      .select($"vec_id", Similarity.cosine(col("embedding"),
        col("embedding")).as("self")) // sanity: self-cos defined
    assert(floatTop.count() > 0)
    val exactTop = Similarity.bruteForceTopK(emb, col("vec_id"),
        col("embedding"),
        emb.filter($"vec_id" === 0)
          .select(col("embedding").cast("array<double>"))
          .collect()(0).getSeq[Double](0), k = 5)
      .select("vec_id").as[Long].collect().toSet
    // int8 error is bounded; at k=5 on sf0.001 the sets should overlap heavily
    assert((i8Top intersect exactTop).size >= 3, s"i8=$i8Top exact=$exactTop")
  }

  test("functions are SQL-registered") {
    vecs.createOrReplaceTempView("q8_vecs")
    val n = spark.sql(
      """SELECT dot_i8(quantize_i8(embedding), quantize_i8(embedding)) AS d,
        |quantize_scale(embedding) AS s FROM q8_vecs""".stripMargin).count()
    assert(n == 3)
  }
}
