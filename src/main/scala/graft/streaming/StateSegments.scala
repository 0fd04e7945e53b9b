package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Segment listing for the versioned stream-state directories
  * ([[ForgetStream]] tombstones, [[PpjoinStream]] generations /
  * admitted batches): resolved through the Hadoop FileSystem API —
  * not `java.io.File` — so the state model works on any
  * Hadoop-compatible store (HDFS, S3A, local), matching the
  * convention of [[graft.dv3f.Upsert]] and
  * [[graft.ops.IncrementalAgg]].
  */
object StateSegments {

  /** Child DIRECTORIES of `stateDir` whose name starts with `prefix`,
    * as (name, fully-qualified path) pairs sorted by name. A missing
    * state dir lists as empty (the caller decides whether that is an
    * error), mirroring `listFiles`'s null contract.
    */
  def list(spark: SparkSession, stateDir: String,
      prefix: String): Seq[(String, String)] = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(stateDir)
    val fs = FileSystem.get(p.toUri, conf)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
      .map(s => (s.getPath.getName, s.getPath.toString))
      .sortBy(_._1)
  }

  /** The numeric suffixes of `prefix<v>` segments, ascending. */
  def versions(spark: SparkSession, stateDir: String,
      prefix: String): Seq[Long] =
    list(spark, stateDir, prefix)
      .map(_._1.stripPrefix(prefix).toLong).sorted
}
