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

  test("decodeFeatures: real ImageIO decode recovers dims and exact channel means") {
    // ids chosen to hit different (w, h, base) combos incl. id 0 (1x1)
    val ids = Seq(0L, 1L, 17L, 123L, 4095L)
    val media = ids.toDF("doc_id")
      .select(col("doc_id"), udf((id: Long) => Multimodal.encodePng(id))
        .apply(col("doc_id")).as("payload"))
    val got = Multimodal.decodeFeatures(spark, media).collect()
      .map(r => r.getLong(0) -> r).toMap
    ids.foreach { id =>
      val r = got(id)
      val (w, h) = ((id % 16).toInt + 1, (id % 8).toInt + 1)
      assert(r.getInt(1) === w && r.getInt(2) === h, s"dims for $id")
      // gradient means in closed form: base + mean(x) / mean(y)
      assert(r.getDouble(3) === id % 200 + (w - 1) / 2.0, s"mean_r for $id")
      assert(r.getDouble(4) === id * 7 % 200 + (h - 1) / 2.0, s"mean_g for $id")
      assert(r.getDouble(5) === id * 13 % 200 + (w - 1) / 2.0 + (h - 1) / 2.0,
        s"mean_b for $id")
    }
  }

  test("decodeFeatures: junk payload yields NULL features, not a task failure") {
    val media = Seq((1L, "this is not a png"), (2L, "")).toDF("doc_id", "text")
      .select(col("doc_id"), Multimodal.fakePayload(col("text")).as("payload"))
    val got = Multimodal.decodeFeatures(spark, media).collect()
    assert(got.length === 2)
    got.foreach(r => (1 to 5).foreach(i => assert(r.isNullAt(i), s"col $i of $r")))
  }

  test("decodeAudioFeatures: real WAV decode recovers rate, length and exact RMS") {
    val ids = Seq(0L, 3L, 49L, 123L, 9999L)
    val media = ids.toDF("doc_id")
      .select(col("doc_id"), udf((id: Long) => Multimodal.encodeWav(id))
        .apply(col("doc_id")).as("payload"))
    val got = Multimodal.decodeAudioFeatures(spark, media).collect()
      .map(r => r.getLong(0) -> r).toMap
    ids.foreach { id =>
      val r = got(id)
      val n = (id % 50 + 10) * 100
      assert(r.getInt(1) === 8000, s"rate for $id")
      assert(r.getLong(2) === n, s"n_samples for $id")
      assert(r.getDouble(3) === n / 8000.0, s"duration for $id")
      assert(r.getDouble(4) === ((id % 100 + 1) * 100).toDouble, s"rms for $id")
    }
  }

  test("decodeAudioFeatures: junk payload yields NULL features") {
    val media = Seq((1L, "not audio")).toDF("doc_id", "text")
      .select(col("doc_id"), Multimodal.fakePayload(col("text")).as("payload"))
    val got = Multimodal.decodeAudioFeatures(spark, media).collect()(0)
    (1 to 4).foreach(i => assert(got.isNullAt(i)))
  }

  test("resizePng: decode → bilinear scale → re-encode round trips the codec") {
    val resized = Multimodal.resizePng(Multimodal.encodePng(123L), 4, 3).get
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(resized))
    assert(img.getWidth === 4 && img.getHeight === 3)
    assert(Multimodal.resizePng("junk".getBytes, 4, 3) === None)
  }

  test("APNG codec: hand-written chunks are a valid PNG and frames round-trip exactly") {
    val ids = Seq(0L, 3L, 17L, 123L)
    ids.foreach { id =>
      val bytes = Multimodal.encodeApng(id)
      // independent conformance check: the JDK's own PNG decoder accepts
      // the file (decoding frame 0 with the right dims)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO rejected APNG for $id")
      assert(img.getWidth === (id % 8 + 1).toInt && img.getHeight === (id % 4 + 1).toInt)
      // our chunk-walk decoder recovers every sampled frame's exact means
      val Some((w, h, nf, feats)) = Multimodal.decodeApngFrames(bytes, stride = 2)
      assert(w === (id % 8 + 1).toInt && h === (id % 4 + 1).toInt)
      assert(nf === (id % 4 + 2).toInt)
      assert(feats.map(_.frame_idx) === (0 until nf by 2))
      feats.foreach { f =>
        assert(f.mean_r === id % 100 + 3 * f.frame_idx + (w - 1) / 2.0)
        assert(f.mean_g === id * 7 % 100 + 3 * f.frame_idx + (h - 1) / 2.0)
        assert(f.mean_b === (id * 13 % 100 + 3 * f.frame_idx).toDouble)
      }
    }
    assert(Multimodal.decodeApngFrames("junk".getBytes, 2) === None)
    // truncated zlib stream: must return None, not hang the task
    val whole = Multimodal.encodeApng(3L)
    assert(Multimodal.decodeApngFrames(whole.dropRight(30), 2) === None)
  }

  test("apngFrameFeatures: one row per sampled frame through the batch path") {
    val ids = Seq(5L, 10L)
    val media = ids.toDF("doc_id")
      .select(col("doc_id"), udf((id: Long) => Multimodal.encodeApng(id))
        .apply(col("doc_id")).as("payload"))
    val got = Multimodal.apngFrameFeatures(spark, media, stride = 2).collect()
    val expRows = ids.map(id => ((id % 4 + 2).toInt + 1) / 2).sum
    assert(got.length === expRows)
    assert(got.forall(r => r.getInt(4) % 2 == 0)) // only sampled frames
  }

  test("MJPEG/AVI codec: RIFF walk + JPEG decode recover exact frame means") {
    val ids = Seq(0L, 5L, 40L, 125L, 255L)
    ids.foreach { id =>
      val bytes = Multimodal.encodeAviMjpeg(id)
      val Some((w, h, nf, feats)) = Multimodal.decodeAviFrames(bytes, stride = 2)
      assert(w === (id % 8 + 1).toInt && h === (id % 4 + 1).toInt)
      assert(nf === (id % 4 + 2).toInt)
      assert(feats.map(_.frame_idx) === (0 until nf by 2))
      // uniform gray at JPEG quality 1.0 survives the lossy pipeline
      // EXACTLY — the closed-form oracle depends on this
      feats.foreach { f =>
        val v = ((id * 3 + f.frame_idx * 7) % 256).toDouble
        assert(f.mean_r === v && f.mean_g === v && f.mean_b === v,
          s"id=$id frame=${f.frame_idx}: got ${f.mean_r},${f.mean_g},${f.mean_b} want $v")
      }
      // every frame when stride=1
      val Some((_, _, _, all)) = Multimodal.decodeAviFrames(bytes, stride = 1)
      assert(all.map(_.frame_idx) === (0 until nf))
    }
    // trailing bytes after the declared RIFF payload (muxer padding,
    // appended junk) must not break a valid video
    val padded = Multimodal.encodeAviMjpeg(5L) ++ "garbage after the container".getBytes
    assert(Multimodal.decodeAviFrames(padded, 2).map(_._3) === Some((5 % 4 + 2).toInt))
    // corrupt input: None, never an exception or a huge allocation
    assert(Multimodal.decodeAviFrames("junk".getBytes, 2) === None)
    val whole = Multimodal.encodeAviMjpeg(5L)
    assert(Multimodal.decodeAviFrames(whole.take(40), 2) === None)
    // a frame chunk that declares a length past the end of the payload
    // must take the None path, never attempt the oversized read
    val lied = whole.clone()
    val dc = lied.indices.find(i => lied(i) == '0' && lied(i + 1) == '0' &&
      lied(i + 2) == 'd' && lied(i + 3) == 'c').get
    lied(dc + 4) = -1; lied(dc + 5) = -1; lied(dc + 6) = -1; lied(dc + 7) = 0x7f
    assert(Multimodal.decodeAviFrames(lied, 2) === None)
  }

  test("aviFrameFeatures: one row per sampled frame through the batch path") {
    val ids = Seq(5L, 10L, 11L)
    val media = ids.toDF("doc_id")
      .select(col("doc_id"), udf((id: Long) => Multimodal.encodeAviMjpeg(id))
        .apply(col("doc_id")).as("payload"))
    val got = Multimodal.aviFrameFeatures(spark, media, stride = 2).collect()
    val expRows = ids.map(id => ((id % 4 + 2).toInt + 1) / 2).sum
    assert(got.length === expRows)
    assert(got.forall(r => r.getInt(4) % 2 == 0)) // only sampled frames
  }

  test("sampleFrameOffsets: stride sequence over payload bytes") {
    val got = Seq(10).toDF("n")
      .select(Multimodal.sampleFrameOffsets(col("n"), 4).as("o"))
      .collect()(0).getSeq[Int](0)
    assert(got === Seq(0, 4, 8))
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

  test("histogram dHash: codec round trip matches a driver-side recompute") {
    import graft.functions.GraftStrings
    val text = "join hash scan join filter vector"
    val Some((w, h, bits)) = Multimodal.dHashBits(Multimodal.histogramPng(text))
    assert(w == 9 && h == 8 && bits.length == 64)
    // recompute the histogram and bits without the codec
    val counts = new Array[Int](72)
    text.trim.split("\\s+").foreach { t =>
      counts((GraftStrings.hash60(t) % 72).toInt) += 1 }
    val want = (for (y <- 0 until 8; x <- 0 until 8) yield {
      val l = math.min(255, counts(y * 9 + x))
      val r = math.min(255, counts(y * 9 + x + 1))
      if (r > l) '1' else '0'
    }).mkString
    assert(bits == want, s"codec bits $bits != recompute $want")
  }

  test("histogram dHash is perceptual: a one-token edit moves few bits, disjoint text many") {
    def sig(t: String) =
      Multimodal.dHashBits(Multimodal.histogramPng(t)).get._3
    def ham(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    val base = "join hash scan filter vector merge table group order batch"
    val nearDup = base.replace("batch", "window") // one token swapped
    val disjoint = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val (hNear, hFar) = (ham(sig(base), sig(nearDup)), ham(sig(base), sig(disjoint)))
    assert(hNear < hFar,
      s"one-token edit ($hNear bits) must move less than disjoint text ($hFar)")
    assert(hNear <= 6, s"a one-token edit flipped $hNear of 64 bits")
  }

  test("image-signature agreement separates true near-dups from banding false positives") {
    val rows = graft.queries.LlmOps.multimodalNearDup(spark, sf).collect()
      .map(r => (r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val trueDups = rows.filter(_._2 >= 0.5).map(_._1)
    val falsePos = rows.filter(_._2 < 0.1).map(_._1)
    assert(trueDups.nonEmpty)
    if (falsePos.nonEmpty)
      assert(trueDups.max < falsePos.min,
        s"image distance failed to separate: true ${trueDups.max} vs false ${falsePos.min}")
  }

  test("audio frame-energy signature: codec round trip matches a driver-side recompute") {
    import graft.functions.GraftStrings
    val text = "join hash scan join filter vector batch window"
    val Some(bits) = Multimodal.audioDHashBits(Multimodal.audioFingerprintWav(text))
    assert(bits.length == 64)
    val counts = new Array[Int](65)
    text.trim.split("\\s+").foreach { t =>
      counts((GraftStrings.hash60(t) % 65).toInt) += 1 }
    val want = (0 until 64).map { f =>
      if (math.min(255, counts(f + 1)) > math.min(255, counts(f))) '1' else '0'
    }.mkString
    assert(bits == want, s"decoded bits $bits != recompute $want")
    // identical text → identical signature; junk/mis-shaped payloads → None
    assert(Multimodal.audioDHashBits(
      Multimodal.audioFingerprintWav(text)).contains(bits))
    assert(Multimodal.audioDHashBits("not a wav".getBytes).isEmpty)
    assert(Multimodal.audioDHashBits(Multimodal.encodeWav(7L)).isEmpty,
      "a WAV with the wrong frame count must not yield a signature")
  }

  test("audio signature is perceptual: a one-token edit moves few bits, disjoint text many") {
    def sig(t: String) =
      Multimodal.audioDHashBits(Multimodal.audioFingerprintWav(t)).get
    def ham(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    val base = "join hash scan filter vector merge table group order batch"
    val nearDup = base.replace("batch", "window")
    val disjoint = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val (hNear, hFar) = (ham(sig(base), sig(nearDup)), ham(sig(base), sig(disjoint)))
    assert(hNear < hFar,
      s"one-token edit ($hNear bits) must move less than disjoint text ($hFar)")
    assert(hNear <= 6, s"a one-token edit flipped $hNear of 64 bits")
  }

  test("audio-signature agreement separates true near-dups from banding false positives") {
    val rows = graft.queries.LlmOps.multimodalAudioNearDup(spark, sf).collect()
      .map(r => (r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val trueDups = rows.filter(_._2 >= 0.5).map(_._1)
    val falsePos = rows.filter(_._2 < 0.1).map(_._1)
    assert(trueDups.nonEmpty)
    if (falsePos.nonEmpty)
      assert(trueDups.max < falsePos.min,
        s"audio distance failed to separate: true ${trueDups.max} vs false ${falsePos.min}")
  }

  test("video temporal dHash: MJPEG/AVI codec round trip matches a driver-side recompute") {
    import graft.functions.GraftStrings
    val text = "join hash scan join filter vector batch window"
    val Some(bits) = Multimodal.videoDHashBits(Multimodal.videoFingerprintAvi(text))
    assert(bits.length == 64)
    val counts = new Array[Int](65)
    text.trim.split("\\s+").foreach { t =>
      counts((GraftStrings.hash60(t) % 65).toInt) += 1 }
    val want = (0 until 64).map { f =>
      if (math.min(255, counts(f + 1)) > math.min(255, counts(f))) '1' else '0'
    }.mkString
    assert(bits == want, s"decoded bits $bits != recompute $want")
    // junk / mis-shaped payloads → None (a 5-frame id-keyed AVI is a
    // valid video but not a 65-frame fingerprint)
    assert(Multimodal.videoDHashBits("not an avi".getBytes).isEmpty)
    assert(Multimodal.videoDHashBits(Multimodal.encodeAviMjpeg(7L)).isEmpty,
      "an AVI with the wrong frame count must not yield a signature")
  }

  test("video signature equals the audio signature on the same text (cross-codec agreement)") {
    // both signatures compare monotone maps of the same capped 65-cell
    // counts — through two entirely disjoint codec paths (RIFF/WAVE +
    // PCM energy vs RIFF/AVI + JPEG + pixel means); equality here is the
    // strongest end-to-end check either codec leg has
    Seq("join hash scan filter vector merge table group order batch",
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "one two three four five six seven eight nine ten one two") .foreach { t =>
      val v = Multimodal.videoDHashBits(Multimodal.videoFingerprintAvi(t))
      val a = Multimodal.audioDHashBits(Multimodal.audioFingerprintWav(t))
      assert(v.isDefined && v == a, s"video $v != audio $a for: $t")
    }
  }

  test("video signature is perceptual: a one-token edit moves few bits, disjoint text many") {
    def sig(t: String) =
      Multimodal.videoDHashBits(Multimodal.videoFingerprintAvi(t)).get
    def ham(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    val base = "join hash scan filter vector merge table group order batch"
    val nearDup = base.replace("batch", "window")
    val disjoint = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val (hNear, hFar) = (ham(sig(base), sig(nearDup)), ham(sig(base), sig(disjoint)))
    assert(hNear < hFar,
      s"one-token edit ($hNear bits) must move less than disjoint text ($hFar)")
    assert(hNear <= 6, s"a one-token edit flipped $hNear of 64 bits")
  }

  test("video-signature agreement separates true near-dups from banding false positives") {
    val rows = graft.queries.LlmOps.multimodalVideoNearDup(spark, sf).collect()
      .map(r => (r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val trueDups = rows.filter(_._2 >= 0.5).map(_._1)
    val falsePos = rows.filter(_._2 < 0.1).map(_._1)
    assert(trueDups.nonEmpty)
    if (falsePos.nonEmpty)
      assert(trueDups.max < falsePos.min,
        s"video distance failed to separate: true ${trueDups.max} vs false ${falsePos.min}")
  }
}
