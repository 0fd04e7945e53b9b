package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("payload metadata: byte length and sha over the payload hex") {
    val got = Multimodal.withPayloadMeta(
      Seq("héllo").toDF("text").select(col("text"),
        Multimodal.fakePayload(col("text")).as("payload")),
      col("payload")).collect()(0)
    assert(got.getInt(got.fieldIndex("n_bytes")) === 6) // é is 2 bytes
    val hexUpper = "héllo".getBytes("UTF-8").map("%02X".format(_)).mkString
    val exp = java.security.MessageDigest.getInstance("SHA-256")
      .digest(hexUpper.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got.getString(got.fieldIndex("sha")) === exp)
  }

  test("mediaMeta: one row per doc, dims parsed from real headers") {
    val df = Multimodal.mediaMeta(spark, sf)
    assert(df.count() === graft.Tables.load(spark, sf, "documents").count())
    // every fixture payload carries a genuine header: nothing unparsed,
    // dims match the id-derived values the fixture encoded
    val bad = df.filter(col("format").isNull ||
      col("width") =!= pmod(col("doc_id"), lit(640)) + 1 ||
      col("height") =!= pmod(col("doc_id"), lit(480)) + 1 ||
      col("format") =!= pmod(col("doc_id"), lit(3)) + 1).count()
    assert(bad === 0)
    // all three container formats are exercised
    assert(df.select("format").distinct().collect().map(_.getInt(0)).sorted
      === Array(1, 2, 3))
  }

  test("GraftMedia: parses real PNG/JPEG/GIF header bytes, rejects junk") {
    import graft.functions.GraftMedia
    // 1x1 transparent PNG (standard minimal example, public knowledge)
    val png = java.util.Base64.getDecoder.decode(
      "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNk" +
        "YPhfDwAChwGA60e6kgAAAABJRU5ErkJggg==")
    assert(GraftMedia.dims(png).toSeq === Seq(GraftMedia.FMT_PNG, 1, 1))
    // minimal JPEG: SOI, APP0 stub, SOF0 with h=8 w=16, then EOI
    val jpg = Array(0xFF, 0xD8, 0xFF, 0xE0, 0x00, 0x04, 0x4A, 0x46,
      0xFF, 0xC0, 0x00, 0x0B, 0x08, 0x00, 0x08, 0x00, 0x10, 0x01,
      0x01, 0x11, 0x00, 0xFF, 0xD9).map(_.toByte)
    assert(GraftMedia.dims(jpg).toSeq === Seq(GraftMedia.FMT_JPEG, 16, 8))
    // GIF89a, 3x2 logical screen
    val gif = ("GIF89a".getBytes("US-ASCII") ++
      Array(0x03, 0x00, 0x02, 0x00, 0xF7, 0x00, 0x00).map(_.toByte))
    assert(GraftMedia.dims(gif).toSeq === Seq(GraftMedia.FMT_GIF, 3, 2))
    assert(GraftMedia.dims("not an image at all".getBytes) === null)
    assert(GraftMedia.dims(Array[Byte]()) === null)
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
