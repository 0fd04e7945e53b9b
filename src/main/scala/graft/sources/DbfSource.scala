package graft.sources

import java.io.{DataOutputStream, File, FileOutputStream, RandomAccessFile}
import java.util.{Map => JMap}

import scala.collection.JavaConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.functions.{col, length, max}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** dBase III (.dbf) file format core, shared by the DSv2 reader and the
  * staging writer. The reference repo's one input the engine could not
  * previously read natively is the communes lookup table it ships (only)
  * as a missing large blob — `ressources/v_commune_2023.dbf`
  * (`/root/reference/.MISSING_LARGE_BLOBS:2`): France's official COG
  * commune register, distributed as the dBase sidecar of a shapefile.
  * This source makes that shape first-class: `spark.read.format("dbf")
  * .load(path)` with column pruning, limit pushdown and — the part CSV
  * cannot have — PLANNING-TIME record-range splits, because dBase
  * records are fixed-width: record i lives at byte
  * `headerSize + i*recordSize`, so a 100 GB file splits into balanced
  * partitions with zero scanning (no newline hunting, no codec sync
  * markers).
  *
  * Layout (public dBase III spec, as in Clipper/FoxBase interchange):
  * 32-byte header — [0] version 0x03, [1..3] last-update Y-1900/M/D,
  * [4..7] record count (LE u32), [8..9] header size (LE u16), [10..11]
  * record size (LE u16) — then 32-byte field descriptors (name in an
  * 11-byte NUL-padded block; we accept all 11 bytes used, the Clipper
  * extension, so `n_nationkey` fits; type byte; length at [16]; decimal
  * count at [17]) terminated by 0x0D, then records: a deletion-flag
  * byte (0x20 live, 0x2A deleted) followed by fixed-width latin-1
  * fields, right-space-padded text, left-space-padded numbers.
  *
  * Type mapping (chosen for exact cross-engine equality — no floats):
  * C→string (right-trimmed; all-blank reads as null), N dec=0→long,
  * N dec>0→decimal(len-2,dec), D→date (yyyymmdd), L→boolean
  * (T/t/Y/y, F/f/N/n, else null). Blank numeric/date fields read as
  * null; nulls write as all-blank.
  */
object DbfSource {

  /** One field descriptor: byte offset is within the record (after the
    * deletion flag).
    */
  case class DbfField(name: String, typ: Char, len: Int, dec: Int,
      offset: Int) {
    def sparkType: DataType = typ match {
      case 'C' => StringType
      case 'N' if dec == 0 => LongType
      case 'N' => DecimalType(math.min(len - 2, 38), dec)
      case 'D' => DateType
      case 'L' => BooleanType
      case other => throw new IllegalArgumentException(
        s"unsupported dbf field type '$other' for field $name")
    }
  }

  case class DbfHeader(numRecords: Long, headerSize: Int, recordSize: Int,
      fields: Seq[DbfField]) {
    def schema: StructType = StructType(fields.map(f =>
      StructField(f.name, f.sparkType, nullable = true)))
  }

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  /** All file access goes through Hadoop's FileSystem API, so the
    * source reads local paths in tests and hdfs://-s3a://-style DFS
    * paths on a cluster with the same code; readers get the default
    * executor-side Configuration (core-site.xml on the classpath).
    */
  private[sources] def fileSystem(path: org.apache.hadoop.fs.Path)
      : org.apache.hadoop.fs.FileSystem = {
    val conf = org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    path.getFileSystem(conf)
  }

  def readHeader(file: File): DbfHeader =
    readHeader(new org.apache.hadoop.fs.Path(file.getAbsolutePath))

  def readHeader(file: org.apache.hadoop.fs.Path): DbfHeader = {
    val in = fileSystem(file).open(file)
    try {
      val head = new Array[Byte](32)
      in.readFully(head)
      val version = head(0) & 0xff
      require((version & 0x07) == 0x03,
        s"not a dBase III file (version byte 0x${version.toHexString}): $file")
      val numRecords = u32(head, 4)
      val headerSize = u16(head, 8)
      val recordSize = u16(head, 10)
      val nFields = (headerSize - 32 - 1) / 32
      val fields = Seq.newBuilder[DbfField]
      var off = 1 // record byte 0 is the deletion flag
      val fd = new Array[Byte](32)
      var i = 0
      var done = false
      while (i < nFields && !done) {
        in.readFully(fd)
        if ((fd(0) & 0xff) == 0x0d) done = true
        else {
          val nameLen = fd.take(11).indexOf(0.toByte) match {
            case -1 => 11
            case n => n
          }
          val name = new String(fd, 0, nameLen, "ISO-8859-1")
          val len = fd(16) & 0xff
          fields += DbfField(name, (fd(11) & 0xff).toChar, len, fd(17) & 0xff, off)
          off += len
          i += 1
        }
      }
      val h = DbfHeader(numRecords, headerSize, recordSize, fields.result())
      require(h.recordSize == off,
        s"header record size ${h.recordSize} != 1 + sum(field lengths) $off: $file")
      h
    } finally in.close()
  }

  /** The .dbf files behind a load path (a single file or a directory of
    * same-schema files), sorted for deterministic planning.
    */
  def listFiles(path: String): Seq[org.apache.hadoop.fs.Path] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = fileSystem(p)
    val files =
      if (fs.getFileStatus(p).isFile) Seq(p)
      else fs.listStatus(p).toSeq
        .filter(s => s.isFile && s.getPath.getName.toLowerCase.endsWith(".dbf"))
        .map(_.getPath).sortBy(_.getName)
    require(files.nonEmpty, s"no .dbf files under $path")
    files
  }

  // ------------------------------------------------------------- writer

  /** Write a DataFrame as ONE dBase III file. This is a DIM-TABLE
    * exchange format by construction — the header carries a u32 record
    * count and the body is a single sequential byte stream, so the write
    * is inherently one-file/one-writer (the communes register is ~35k
    * rows). The driver STREAMS rows (`toLocalIterator`, one partition in
    * memory at a time) and back-patches the record count — it never
    * materializes the relation. Fact-scale data belongs in parquet; this
    * exists to produce/refresh the lookup sidecars other tools consume.
    *
    * Char widths are measured with one Spark aggregate over the input
    * (`max(length(c))`), not assumed, so values can never truncate.
    * The record count is established with a `count()` BEFORE writing
    * (two passes over a dim) so the write stream is APPEND-ONLY — no
    * seek-back-patching, which HDFS/object stores cannot do — and the
    * output goes through Hadoop's FileSystem like the read side.
    */
  def write(df: DataFrame, file: String): Unit = {
    val fields = df.schema.fields.map { f =>
      require(f.name.getBytes("ISO-8859-1").length <= 11,
        s"dbf field name limit is 11 bytes: ${f.name}")
      f
    }
    val charCols = fields.filter(_.dataType == StringType).map(_.name)
    val widths: Map[String, Int] =
      if (charCols.isEmpty) Map.empty
      else {
        val row = df.agg(
          max(length(col(charCols.head))).as(charCols.head),
          charCols.tail.map(c => max(length(col(c))).as(c)): _*).head()
        charCols.map(c => c -> math.max(1,
          if (row.isNullAt(row.fieldIndex(c))) 1
          else row.getInt(row.fieldIndex(c)))).toMap
      }
    def fieldLen(f: StructField): Int = f.dataType match {
      case StringType =>
        val w = widths(f.name)
        require(w <= 254, s"dbf C field limit is 254 bytes: ${f.name} ($w)")
        w
      case LongType => 20
      case IntegerType => 11
      case d: DecimalType => d.precision + 2
      case DateType => 8
      case BooleanType => 1
      case other => throw new IllegalArgumentException(
        s"unsupported dbf write type $other for ${f.name}")
    }
    val lens = fields.map(fieldLen)
    val recordSize = 1 + lens.sum
    val headerSize = 32 + 32 * fields.length + 1
    val n = df.count() // count first: the write stream stays append-only
    require(n <= 0xffffffffL, s"dbf record count overflows u32: $n")
    val target = new org.apache.hadoop.fs.Path(file)
    val out = new DataOutputStream(new java.io.BufferedOutputStream(
      fileSystem(target).create(target, true)))
    try {
      val head = new Array[Byte](32)
      head(0) = 0x03
      head(1) = 120; head(2) = 1; head(3) = 1 // fixed 2020-01-01: staged output stays byte-stable
      head(4) = (n & 0xff).toByte
      head(5) = ((n >> 8) & 0xff).toByte
      head(6) = ((n >> 16) & 0xff).toByte
      head(7) = ((n >> 24) & 0xff).toByte
      head(8) = (headerSize & 0xff).toByte
      head(9) = ((headerSize >> 8) & 0xff).toByte
      head(10) = (recordSize & 0xff).toByte
      head(11) = ((recordSize >> 8) & 0xff).toByte
      out.write(head)
      fields.zip(lens).foreach { case (f, len) =>
        val fd = new Array[Byte](32)
        val nb = f.name.getBytes("ISO-8859-1")
        System.arraycopy(nb, 0, fd, 0, nb.length)
        fd(11) = (f.dataType match {
          case StringType => 'C'
          case LongType | IntegerType => 'N'
          case _: DecimalType => 'N'
          case DateType => 'D'
          case BooleanType => 'L'
          case _ => '?'
        }).toByte
        fd(16) = len.toByte
        fd(17) = (f.dataType match {
          case d: DecimalType => d.scale
          case _ => 0
        }).toByte
        out.write(fd)
      }
      out.write(0x0d)
      val rec = new Array[Byte](recordSize)
      var written = 0L
      val it = df.toLocalIterator()
      while (it.hasNext) {
        val row = it.next()
        java.util.Arrays.fill(rec, ' '.toByte)
        rec(0) = 0x20
        var i = 0
        var off = 1
        while (i < fields.length) {
          val len = lens(i)
          if (!row.isNullAt(i)) {
            val s = fields(i).dataType match {
              case StringType => row.getString(i)
              case LongType => row.getLong(i).toString
              case IntegerType => row.getInt(i).toString
              case _: DecimalType => row.getDecimal(i).toPlainString
              case DateType => row.getDate(i).toLocalDate
                .format(java.time.format.DateTimeFormatter.BASIC_ISO_DATE)
              case BooleanType => if (row.getBoolean(i)) "T" else "F"
              case _ => ""
            }
            val b = s.getBytes("ISO-8859-1")
            require(b.length <= len,
              s"value wider than measured field ${fields(i).name}: $s")
            fields(i).dataType match {
              case StringType => System.arraycopy(b, 0, rec, off, b.length)
              case _ => // numbers/dates right-justified per spec
                System.arraycopy(b, 0, rec, off + len - b.length, b.length)
            }
          }
          off += len
          i += 1
        }
        out.write(rec)
        written += 1
      }
      require(written == n,
        s"input changed between count ($n) and write ($written): $file")
      out.write(0x1a)
    } finally out.close()
  }
}

class DbfDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "dbf"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("dbf source requires a load path"))
    DbfSource.readHeader(DbfSource.listFiles(path).head).schema
  }
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new DbfTable(properties.asScala.toMap)
}

class DbfTable(props: Map[String, String]) extends Table with SupportsRead {
  private val path = props.getOrElse("path",
    throw new IllegalArgumentException("dbf source requires a load path"))
  override def name(): String = s"dbf($path)"
  override def schema(): StructType =
    DbfSource.readHeader(DbfSource.listFiles(path).head).schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DbfScanBuilder(path, options.asScala.toMap)
}

/** Column pruning: only the requested fields are parsed (each field's
  * record offset is known from the header, so skipped columns cost
  * nothing). Limit pushdown caps each partition's record range at
  * planning time — on a fixed-width format that truncates the BYTE
  * RANGE read, not just the rows emitted; Spark's global limit stays as
  * the residual.
  */
class DbfScanBuilder(path: String, options: Map[String, String])
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit {
  private var required: Option[StructType] = None
  private var limit: Option[Int] = None
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = Some(requiredSchema)
  override def pushLimit(l: Int): Boolean = { limit = Some(l); false }
  override def build(): Scan = new DbfScan(path, options, required, limit)
}

class DbfScan(path: String, options: Map[String, String],
    required: Option[StructType], limit: Option[Int]) extends Scan with Batch
    with SupportsReportStatistics {

  private val files = DbfSource.listFiles(path)
  private val header = DbfSource.readHeader(files.head)
  private val requiredFields: Seq[DbfSource.DbfField] = required match {
    case None => header.fields
    case Some(s) => s.fieldNames.toSeq.map(n =>
      header.fields.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"dbf field not in header: $n")))
  }

  override def readSchema(): StructType =
    StructType(requiredFields.map(f => StructField(f.name, f.sparkType)))
  override def toBatch: Batch = this
  override def description(): String =
    s"dbf path=$path pushed=[${limit.map("limit=" + _).getOrElse("")}] " +
      s"columns=[${requiredFields.map(_.name).mkString(", ")}]"

  /** Record-range splits per file: fixed-width records make the split
    * points exact byte offsets at PLANNING time. Split size targets
    * `spark.sql.files.maxPartitionBytes`-style chunks via the
    * `recordsPerSplit` option (default sized so a split is ~128 MB).
    *
    * A pushed LIMIT switches to one split per file whose READER stops
    * after `limit` LIVE rows — a `LIMIT 10` probe against a 100 GB file
    * still reads ~10 records' worth of bytes. The record RANGE is never
    * truncated to the limit: header record counts include deleted rows
    * (flag 0x2A), which the reader skips, so a range capped at `limit`
    * physical slots would silently under-deliver on files with
    * deletions among their first `limit` records (pushLimit returns
    * false — Spark only re-applies the limit, it cannot recover rows
    * the scan never produced). Worst case (a mostly-deleted file) the
    * reader scans to end-of-file, which is the minimum work any correct
    * reader must do to find `limit` live rows.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    // read options arrive through CaseInsensitiveStringMap: keys are lowercased
    val perSplit = options.get("recordspersplit").map(_.toLong)
      .getOrElse(math.max(1L, (128L << 20) / header.recordSize))
    files.flatMap { f =>
      val h = DbfSource.readHeader(f)
      require(h.schema == header.schema,
        s"dbf schema mismatch across files: $f")
      limit match {
        case Some(l) =>
          // single sequential split; stops at l live rows (see scaladoc)
          Seq(DbfInputPartition(f.toString, h.headerSize, h.recordSize,
            0L, h.numRecords, Some(l.toLong)))
        case None =>
          (0L until h.numRecords by perSplit).map { start =>
            val end = math.min(h.numRecords, start + perSplit)
            DbfInputPartition(f.toString, h.headerSize, h.recordSize,
              start, end, None)
          }
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new DbfReaderFactory(requiredFields)

  /** Header-derived statistics (record count × record size — no
    * sampling, no file scan). These are an UPPER BOUND, not exact:
    * dBase header counts include deleted records (flag 0x2A), which the
    * reader skips, so a file with deletions reports more rows/bytes
    * than it yields. The error direction is safe for planning — an
    * overestimate can only make Catalyst skip a broadcast it might have
    * done, never broadcast something too big — and on deletion-free
    * files (all files this engine writes) the numbers are exact, so a
    * dim-table .dbf falls under autoBroadcastJoinThreshold on its own
    * with no broadcast() hint needed for the lookup-join shape.
    */
  override def estimateStatistics(): Statistics = new Statistics {
    private val perFile = files.map(f => DbfSource.readHeader(f))
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(
        perFile.map(h => h.numRecords * h.recordSize).sum)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(perFile.map(_.numRecords).sum)
  }
}

case class DbfInputPartition(file: String, headerSize: Int, recordSize: Int,
    startRecord: Long, endRecord: Long,
    liveLimit: Option[Long] = None) extends InputPartition

class DbfReaderFactory(fields: Seq[DbfSource.DbfField])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new DbfPartitionReader(p.asInstanceOf[DbfInputPartition], fields)
}

/** Seeks straight to `headerSize + start*recordSize` and reads whole
  * records; deleted rows (flag 0x2A) occupy their fixed-width slot —
  * they are skipped in the output but never disturb the seek math.
  * `liveLimit` (set for pushed-LIMIT scans) stops the read after that
  * many LIVE rows, so the byte range consumed adapts to however many
  * deleted slots are interleaved.
  */
class DbfPartitionReader(p: DbfInputPartition,
    fields: Seq[DbfSource.DbfField]) extends PartitionReader[InternalRow] {

  private val in = {
    val path = new org.apache.hadoop.fs.Path(p.file)
    DbfSource.fileSystem(path).open(path)
  }
  in.seek(p.headerSize + p.startRecord * p.recordSize)
  private val rec = new Array[Byte](p.recordSize)
  private var i = p.startRecord
  private var emitted = 0L
  private var row: GenericInternalRow = _
  private val fmt = java.time.format.DateTimeFormatter.BASIC_ISO_DATE

  override def next(): Boolean = {
    if (p.liveLimit.exists(emitted >= _)) return false
    while (i < p.endRecord) {
      in.readFully(rec)
      i += 1
      if (rec(0) != '*') { parse(); emitted += 1; return true }
    }
    false
  }

  // a fresh row per record: operators above the scan may buffer rows
  private def parse(): Unit = {
    row = new GenericInternalRow(fields.length)
    var j = 0
    while (j < fields.length) {
      val f = fields(j)
      var lo = f.offset
      var hi = f.offset + f.len
      // trim the blank padding off both ends (left-pad numbers, right-pad text)
      while (lo < hi && rec(lo) == ' ') lo += 1
      while (hi > lo && rec(hi - 1) == ' ') hi -= 1
      if (hi == lo) row.update(j, null)
      else {
        val s = new String(rec, lo, hi - lo, "ISO-8859-1")
        row.update(j, f.typ match {
          case 'C' => UTF8String.fromString(
            new String(rec, f.offset, f.len, "ISO-8859-1")
              .replaceAll("\\s+$", ""))
          case 'N' if f.dec == 0 => s.toLong
          case 'N' => Decimal(new java.math.BigDecimal(s),
            math.min(f.len - 2, 38), f.dec)
          case 'D' => java.time.LocalDate.parse(s, fmt).toEpochDay.toInt
          case 'L' => s.charAt(0) match {
            case 'T' | 't' | 'Y' | 'y' => true
            case 'F' | 'f' | 'N' | 'n' => false
            case _ => null
          }
          case other => throw new IllegalStateException(
            s"unsupported dbf type $other")
        })
      }
      j += 1
    }
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}
