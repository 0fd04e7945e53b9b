package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("payload metadata: byte length and sha over UTF-8 bytes") {
    val got = Multimodal.withPayloadMeta(
      Seq("héllo").toDF("text").select(col("text"),
        Multimodal.fakePayload(col("text")).as("payload")),
      col("payload")).collect()(0)
    assert(got.getInt(got.fieldIndex("n_bytes")) === 6) // é is 2 bytes
    val exp = java.security.MessageDigest.getInstance("SHA-256")
      .digest("héllo".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got.getString(got.fieldIndex("sha")) === exp)
  }

  test("mediaMeta: one row per doc, stub dims in range") {
    val df = Multimodal.mediaMeta(spark, sf)
    assert(df.count() === graft.Tables.load(spark, sf, "documents").count())
    val bad = df.filter(col("width") < 1 || col("width") > 640 ||
      col("height") < 1 || col("height") > 480 ||
      col("n_frames") < 1 || col("n_frames") > 30).count()
    assert(bad === 0)
  }

  test("decodeFeatures: per-partition batch decode yields one feature row per doc") {
    val media = Seq((1L, "abcdefghij"), (2L, "xy")).toDF("doc_id", "text")
      .select(col("doc_id"), Multimodal.fakePayload(col("text")).as("payload"))
    val got = Multimodal.decodeFeatures(spark, media).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(got(1L) === "abcdefgh".getBytes.map(_.toDouble).toSeq) // first 8 bytes
    assert(got(2L) === "xy".getBytes.map(_.toDouble).toSeq)
  }

  test("sampleFrameOffsets: stride sequence over payload bytes") {
    val got = Seq(10).toDF("n")
      .select(Multimodal.sampleFrameOffsets(col("n"), 4).as("o"))
      .collect()(0).getSeq[Int](0)
    assert(got === Seq(0, 4, 8))
  }

  test("resizeStub: binary→binary projection truncates to the target size") {
    val got = Seq("abcdefghij").toDF("text")
      .select(Multimodal.resizeStub(Multimodal.fakePayload(col("text")), 4))
      .collect()(0).getAs[Array[Byte]](0)
    assert(new String(got, "UTF-8") === "abcd")
  }

  test("explodeFrames: one row per sampled frame with the right slice") {
    val media = Seq((7L, "abcdefghij")).toDF("doc_id", "text")
      .select(col("doc_id"), Multimodal.fakePayload(col("text")).as("payload"))
    val got = Multimodal.explodeFrames(media, col("doc_id"), col("payload"),
      stride = 4, frameBytes = 3)
      .collect().map(r => (r.getInt(1), r.getInt(2),
        new String(r.getAs[Array[Byte]](3), "UTF-8")))
    assert(got.toSeq === Seq((0, 0, "abc"), (1, 4, "efg"), (2, 8, "ij")))
  }
}
