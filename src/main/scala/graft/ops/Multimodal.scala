package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns plus typed metadata, with decode/feature steps as
  * per-partition batch functions.
  *
  * The container has no image/audio codecs, so the DECODE ITSELF IS A
  * CLEARLY-MARKED STUB (deterministic fake derived from the bytes). The
  * Spark-side plumbing is real and what actually matters at 100 TB:
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
      width: Int, height: Int, n_frames: Int)

  /** Synthesize a binary payload column from text (the testdata carries
    * no real media; this stands in for reading e.g. image bytes).
    */
  def fakePayload(text: Column): Column = encode(text, "UTF-8")

  /** Map-side metadata extraction: size + content hash — the part that is
    * NOT stubbed (binary built-ins).
    */
  def withPayloadMeta(df: DataFrame, payload: Column): DataFrame =
    df.withColumn("n_bytes", octet_length(payload))
      .withColumn("sha", sha2(payload, 256))

  /** STUB — decode dimensions from payload bytes. A real deployment
    * replaces the body with an actual codec call (e.g. javax.imageio /
    * ffmpeg); everything around it (batching, schema, pruning) stays.
    * Deterministic fake: dimensions derived from byte length.
    */
  def stubDecodeDims(nBytes: Column): (Column, Column, Column) =
    (pmod(nBytes, lit(640)) + 1,           // width
      pmod(nBytes, lit(480)) + 1,          // height
      pmod(nBytes, lit(30)) + 1)           // n_frames

  /** Metadata relation over documents-as-media: payload → (bytes, sha,
    * stub dims). Pure projection — no shuffle, payload pruned after.
    */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), fakePayload(col("text")).as("payload"))
    val base = withPayloadMeta(docs, col("payload"))
    val (w, h, f) = stubDecodeDims(col("n_bytes"))
    base.select(col("doc_id"), col("n_bytes"), col("sha"),
      w.as("width"), h.as("height"), f.as("n_frames"))
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
