package graft.sources

import java.util.{Map => JMap}

import scala.collection.JavaConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Native Avro OBJECT CONTAINER FILE source. The Spark distribution in
  * this environment ships avro-core/avro-mapred but NOT the spark-avro
  * connector module, so `format("avro")` would otherwise be a
  * ClassNotFound suggestion to install a package that cannot be
  * installed offline; Avro OCF is the interchange format half the
  * training-data world emits (Kafka archive dumps, Hive exports,
  * GCS/BigQuery extracts), so the engine carries its own DSv2 reader —
  * the [[DbfSource]] pattern applied to a block-compressed format.
  * Registered as `format("avrofile")`: Spark's `lookupDataSource`
  * special-cases the literal name "avro" (a hardcoded install-the-
  * package error) BEFORE consulting the ServiceLoader, so the bare
  * name is unclaimable by a third-party source.
  *
  * What makes Avro worth a NATIVE source at 100 TB:
  *
  *  - **Sync-marker splits.** An OCF is a stream of independent blocks
  *    separated by 16-byte random sync markers. A byte-range split
  *    [start, end) is exact without scanning: the reader seeks to the
  *    first sync PAST start and stops at the first block whose start
  *    is past end (`DataFileReader.sync/pastSync` — the Hadoop input-
  *    split contract), so a 100 GB file fans out into balanced
  *    partitions with zero coordination, exactly like parquet row
  *    groups.
  *  - **Decode-level column pruning.** Avro resolves a projected
  *    READER schema against the writer schema (schema resolution,
  *    Avro spec §Schema Resolution): fields absent from the reader
  *    schema are SKIPPED during decode — string/bytes columns the
  *    query never touches are never materialized, the binary-format
  *    analogue of parquet column pruning (`SupportsPushDownRequiredColumns`
  *    wires Spark's pruned schema straight into the datum reader).
  *
  * Type mapping (both directions): long↔long, int↔int, double↔double,
  * float↔float, boolean↔boolean, string↔string, bytes↔binary;
  * nullability via the standard `["null", T]` union. Complex types
  * (arrays/maps/nested records) are out of the parity surface and
  * rejected loudly at schema conversion.
  *
  * The writer is the staging half ([[DbfSource.write]]'s contract):
  * dim-scale, driver-streamed (`toLocalIterator`), one file — it
  * exists to produce fixtures and lookup sidecars, while fact-scale
  * data belongs in parquet.
  */
object AvroSource {

  /** Avro → Spark for the supported scalar subset; nullable via
    * 2-branch null unions.
    */
  def sparkField(f: Schema.Field): StructField = {
    def convert(s: Schema): (DataType, Boolean) = s.getType match {
      case Schema.Type.UNION =>
        val branches = s.getTypes.asScala
        val nonNull = branches.filterNot(_.getType == Schema.Type.NULL)
        require(nonNull.size == 1 && branches.size == 2,
          s"unsupported avro union ${s} for field ${f.name} " +
            "(only [null, T] is in the parity surface)")
        (convert(nonNull.head)._1, true)
      case Schema.Type.LONG => (LongType, false)
      case Schema.Type.INT => (IntegerType, false)
      case Schema.Type.DOUBLE => (DoubleType, false)
      case Schema.Type.FLOAT => (FloatType, false)
      case Schema.Type.BOOLEAN => (BooleanType, false)
      case Schema.Type.STRING => (StringType, false)
      case Schema.Type.BYTES => (BinaryType, false)
      case other => throw new IllegalArgumentException(
        s"unsupported avro type $other for field ${f.name}")
    }
    val (dt, nullable) = convert(f.schema)
    StructField(f.name, dt, nullable)
  }

  def sparkSchema(avro: Schema): StructType = {
    require(avro.getType == Schema.Type.RECORD,
      s"top-level avro schema must be a record, got ${avro.getType}")
    StructType(avro.getFields.asScala.map(sparkField).toSeq)
  }

  /** Spark → Avro for the writer (nullable columns become
    * `["null", T]`).
    */
  def avroSchema(schema: StructType, name: String): Schema = {
    def base(dt: DataType): Schema = dt match {
      case LongType => Schema.create(Schema.Type.LONG)
      case IntegerType => Schema.create(Schema.Type.INT)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case StringType => Schema.create(Schema.Type.STRING)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case other => throw new IllegalArgumentException(
        s"unsupported avro write type $other")
    }
    val fields = schema.fields.map { f =>
      val s = if (f.nullable)
        Schema.createUnion(java.util.Arrays.asList(
          Schema.create(Schema.Type.NULL), base(f.dataType)))
      else base(f.dataType)
      new Schema.Field(f.name, s, null, null)
    }
    Schema.createRecord(name, null, "graft", false, fields.toList.asJava)
  }

  /** The projected READER schema: the writer schema's fields restricted
    * to (and reordered as) the pruned Spark schema — Avro's schema
    * resolution then skips everything else at decode time.
    */
  def projectedSchema(writer: Schema, required: StructType): Schema = {
    val byName = writer.getFields.asScala.map(f => f.name -> f).toMap
    val fields = required.fieldNames.map { n =>
      val f = byName.getOrElse(n, throw new IllegalArgumentException(
        s"avro field not in writer schema: $n"))
      new Schema.Field(f.name, f.schema, f.doc, f.defaultVal)
    }
    Schema.createRecord(writer.getName, writer.getDoc, writer.getNamespace,
      false, fields.toList.asJava)
  }

  private[sources] def hadoopConf(): org.apache.hadoop.conf.Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  def readWriterSchema(file: org.apache.hadoop.fs.Path): Schema = {
    val in = new org.apache.avro.mapred.FsInput(file, hadoopConf())
    val r = new DataFileReader[GenericRecord](in,
      new GenericDatumReader[GenericRecord]())
    try r.getSchema finally r.close()
  }

  /** The .avro files behind a load path, sorted for deterministic
    * planning.
    */
  def listFiles(path: String): Seq[org.apache.hadoop.fs.Path] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hadoopConf())
    val files =
      if (fs.getFileStatus(p).isFile) Seq(p)
      else fs.listStatus(p).toSeq
        .filter(s => s.isFile && s.getPath.getName.toLowerCase.endsWith(".avro"))
        .map(_.getPath).sortBy(_.getName)
    require(files.nonEmpty, s"no .avro files under $path")
    files
  }

  // ------------------------------------------------------------- writer

  /** Write a DataFrame as ONE Avro OCF — the dim-scale staging writer
    * ([[DbfSource.write]]'s contract): driver-streamed, never
    * materialized. `syncIntervalBytes` sizes the blocks (small values
    * force many sync points, which is how the split spec exercises
    * multi-partition reads on small fixtures; production leaves the
    * 64 KB default).
    */
  def write(df: DataFrame, file: String,
      syncIntervalBytes: Int = 64 * 1024): Unit = {
    val schema = avroSchema(df.schema, "row")
    val fieldTypes = df.schema.fields.map(_.dataType)
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.setSyncInterval(syncIntervalBytes)
    val out = new java.io.File(file)
    Option(out.getParentFile).foreach(_.mkdirs())
    w.create(schema, out)
    try {
      df.toLocalIterator().asScala.foreach { row =>
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < fieldTypes.length) {
          if (row.isNullAt(i)) rec.put(i, null)
          else fieldTypes(i) match {
            case BinaryType =>
              rec.put(i, java.nio.ByteBuffer.wrap(row.getAs[Array[Byte]](i)))
            case _ => rec.put(i, row.get(i))
          }
          i += 1
        }
        w.append(rec)
      }
    } finally w.close()
  }
}

class AvroDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "avrofile"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("avro source requires a load path"))
    AvroSource.sparkSchema(
      AvroSource.readWriterSchema(AvroSource.listFiles(path).head))
  }
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new AvroTable(properties.asScala.toMap)
}

class AvroTable(props: Map[String, String]) extends Table with SupportsRead {
  private val path = props.getOrElse("path",
    throw new IllegalArgumentException("avro source requires a load path"))
  override def name(): String = s"avro($path)"
  override def schema(): StructType =
    AvroSource.sparkSchema(
      AvroSource.readWriterSchema(AvroSource.listFiles(path).head))
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AvroScanBuilder(path, options.asScala.toMap)
}

class AvroScanBuilder(path: String, options: Map[String, String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: Option[StructType] = None
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = Some(requiredSchema)
  override def build(): Scan = new AvroScan(path, options, required)
}

class AvroScan(path: String, options: Map[String, String],
    required: Option[StructType]) extends Scan with Batch {

  private val files = AvroSource.listFiles(path)
  private val writerSchema = AvroSource.readWriterSchema(files.head)
  private val fullSchema = AvroSource.sparkSchema(writerSchema)
  private val prunedSchema = required.getOrElse(fullSchema)

  override def readSchema(): StructType = prunedSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"avro path=$path columns=[${prunedSchema.fieldNames.mkString(", ")}]"

  /** Byte-range splits; the reader's sync/pastSync walk makes any cut
    * points exact (blocks are never torn). `blockBytesPerSplit` is the
    * test hook; production defaults to 128 MB chunks.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val perSplit = options.get("blockbytespersplit").map(_.toLong)
      .getOrElse(128L << 20)
    val fs = files.head.getFileSystem(AvroSource.hadoopConf())
    files.flatMap { f =>
      val len = fs.getFileStatus(f).getLen
      (0L until len by perSplit).map { start =>
        AvroInputPartition(f.toString, start, math.min(len, start + perSplit))
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new AvroReaderFactory(writerSchema.toString, prunedSchema)
}

case class AvroInputPartition(file: String, start: Long, end: Long)
    extends InputPartition

class AvroReaderFactory(writerSchemaJson: String, pruned: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new AvroPartitionReader(p.asInstanceOf[AvroInputPartition],
      writerSchemaJson, pruned)
}

/** Seeks to the first sync marker past `start` and reads whole blocks
  * until the first block whose start passes `end` — the Hadoop
  * input-split contract, so consecutive splits partition the record
  * stream exactly. Decoding resolves the writer schema against the
  * PRUNED reader schema, so unprojected columns are skipped, not
  * materialized.
  */
class AvroPartitionReader(p: AvroInputPartition, writerSchemaJson: String,
    pruned: StructType) extends PartitionReader[InternalRow] {

  private val writerSchema = new Schema.Parser().parse(writerSchemaJson)
  private val readerSchema = AvroSource.projectedSchema(writerSchema, pruned)
  private val reader = {
    val path = new org.apache.hadoop.fs.Path(p.file)
    val in = new org.apache.avro.mapred.FsInput(path,
      new org.apache.hadoop.conf.Configuration())
    val r = new DataFileReader[GenericRecord](in,
      new GenericDatumReader[GenericRecord](null, readerSchema))
    r.sync(p.start)
    r
  }
  private val fieldTypes = pruned.fields.map(_.dataType)
  private var rec: GenericRecord = _
  private var row: GenericInternalRow = _

  override def next(): Boolean = {
    if (!reader.hasNext || reader.pastSync(p.end)) return false
    rec = reader.next(rec)
    row = new GenericInternalRow(fieldTypes.length)
    var i = 0
    while (i < fieldTypes.length) {
      val v = rec.get(i)
      if (v == null) row.update(i, null)
      else row.update(i, fieldTypes(i) match {
        case StringType => UTF8String.fromString(v.toString)
        case BinaryType =>
          val bb = v.asInstanceOf[java.nio.ByteBuffer]
          val arr = new Array[Byte](bb.remaining()); bb.duplicate().get(arr); arr
        case _ => v
      })
      i += 1
    }
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = reader.close()
}
