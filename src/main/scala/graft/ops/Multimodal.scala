package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns plus typed metadata, with decode/feature steps as
  * per-partition batch functions.
  *
  * The IMAGE HEADER DECODE IS REAL: graft.functions.GraftMedia parses
  * width/height out of genuine PNG/JPEG/GIF header bytes (public
  * container formats, no codec deps) as one codegen'd kernel call per
  * payload. The testdata carries no media, so the fixture payloads are
  * SYNTHESIZED — but with real format headers, which the decode then
  * actually parses (and the DuckDB oracle independently predicts).
  * Deeper decode stages (pixel/feature extraction, resize) would need a
  * codec library the container lacks and remain CLEARLY-MARKED STUBS.
  * The Spark-side plumbing is what matters at 100 TB:
  *  - payloads never enter a shuffle (metadata is extracted map-side,
  *    joins/groupBys run on the metadata, payload columns are pruned
  *    unless selected);
  *  - decode runs batched per partition via mapPartitions (the Scala
  *    analogue of mapInPandas: one library/model init per partition, not
  *    per row);
  *  - frame sampling / resizing are expressed over the binary column so
  *    Catalyst prunes them when unused.
  */
object Multimodal {

  final case class MediaMeta(doc_id: Long, n_bytes: Int, sha: String,
      format: Int, width: Int, height: Int)

  private def hex4(v: Column) = lpad(hex(v), 4, "0")
  private def hex8(v: Column) = lpad(hex(v), 8, "0")
  // little-endian u16 as hex: swap the two bytes of the BE form
  private def le16hex(v: Column) =
    concat(substring(hex4(v), 3, 2), substring(hex4(v), 1, 2))

  /** Opaque binary payload from text — the generic stand-in for any
    * non-image media bytes (audio buffers, serialized tensors).
    */
  def fakePayload(text: Column): Column = encode(text, "UTF-8")

  /** Synthesize an image payload from an id + text: a REAL format header
    * (PNG / JPEG SOF0 / GIF89a by id mod 3) whose dimensions derive from
    * the id, followed by the text bytes as the stand-in body. The header
    * bytes are genuine enough that any header parser recovers the
    * dimensions — which is exactly what mediaMeta then does.
    */
  def fakeImagePayload(id: Column, text: Column): Column = {
    val w = pmod(id, lit(640)) + 1
    val h = pmod(id, lit(480)) + 1
    // PNG: signature + IHDR(len=13, w, h, depth 8, color 6, ...) + CRC
    val png = concat(lit("89504E470D0A1A0A0000000D49484452"),
      hex8(w), hex8(h), lit("080600000000000000"))
    // JPEG: SOI + SOF0 (len 0x000B, precision 8, h, w, 1 component)
    val jpg = concat(lit("FFD8FFC0000B08"), hex4(h), hex4(w), lit("01011100"))
    // GIF89a: signature + logical screen descriptor (w, h LE) + flags
    val gif = concat(lit("474946383961"), le16hex(w), le16hex(h), lit("F70000"))
    val hdr = when(pmod(id, lit(3)) === 0, png)
      .when(pmod(id, lit(3)) === 1, jpg)
      .otherwise(gif)
    concat(unhex(hdr), encode(text, "UTF-8"))
  }

  /** Map-side metadata extraction: size + content hash (sha-256 over the
    * payload's hex form — both engines print binary-as-hex identically,
    * so the oracle reproduces it bit-for-bit).
    */
  def withPayloadMeta(df: DataFrame, payload: Column): DataFrame =
    df.withColumn("n_bytes", octet_length(payload))
      .withColumn("sha", sha2(hex(payload), 256))

  /** REAL decode of image dimensions from payload header bytes:
    * [format, width, height] via the GraftMedia PNG/JPEG/GIF parsers,
    * NULL for unrecognized payloads. Codegen'd, map-only.
    */
  def decodeDims(payload: Column): Column =
    graft.functions.GraftFunctions.imageDims(payload)

  /** Metadata relation over documents-as-media: payload → (bytes, sha,
    * parsed format/dims). Pure projection — no shuffle, payload pruned
    * after; the dims come from actually parsing the header bytes.
    */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        fakeImagePayload(col("doc_id"), col("text")).as("payload"))
    val base = withPayloadMeta(docs, col("payload"))
    val dims = decodeDims(col("payload"))
    base.select(col("doc_id"), col("n_bytes"), col("sha"),
      dims.getItem(0).as("format"),
      dims.getItem(1).as("width"), dims.getItem(2).as("height"))
  }

  /** Per-partition batched "decode" — the mapInPandas-shaped hot path.
    * `decodeBatch` is invoked once per partition with the full iterator
    * so a real implementation can amortize codec/model initialization.
    * STUB: feature = first 8 payload bytes as doubles.
    */
  def decodeFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    val ds = media.select(col("doc_id").cast(LongType),
      col("payload").cast(BinaryType)).as[(Long, Array[Byte])]
    ds.mapPartitions { it =>
      // real impl: init codec/model HERE, once per partition
      it.map { case (id, bytes) =>
        val feat = bytes.take(8).map(_.toDouble) // STUB decode
        (id, feat)
      }
    }.toDF("doc_id", "feature")
  }

  /** Frame sampling plumbing: every `stride`-th byte as a "frame"
    * offset list (STUB for video frame extraction; the slice/transform
    * shape is the real plumbing).
    */
  def sampleFrameOffsets(nBytes: Column, stride: Int): Column =
    sequence(lit(0), nBytes - 1, lit(stride))

  /** STUB — resize. A real implementation decodes, scales to
    * `targetBytes`-ish, re-encodes; the stub truncates the payload. The
    * plumbing that matters is the shape: a map-side binary→binary
    * projection (codegen'd substring on BinaryType) that downstream ops
    * treat exactly like the original payload column.
    */
  def resizeStub(payload: Column, targetBytes: Int): Column =
    substring(payload, 1, targetBytes)

  /** Per-frame fan-out: one row per sampled frame with its payload
    * slice — the video shape (decode → sample frames → per-frame
    * features). Generate (posexplode) is the only fan-out; slicing is
    * map-side on the already-loaded payload, so no shuffle and the
    * frame rows flow straight into per-partition feature extraction
    * (decodeFeatures). `frameBytes` bounds each slice (STUB for a
    * decoded frame).
    */
  def explodeFrames(df: DataFrame, id: Column, payload: Column,
      stride: Int, frameBytes: Int): DataFrame =
    df.select(id.as("doc_id"), payload.as("payload"),
      posexplode(sampleFrameOffsets(octet_length(payload), stride))
        .as(Seq("frame_idx", "frame_off")))
      .select(col("doc_id"), col("frame_idx"), col("frame_off"),
        col("payload").substr(col("frame_off") + 1, lit(frameBytes)).as("frame"))
}
