package graft.ops

/** Write-once-per-JVM staging guard for queries that must first lay data
  * out in a specific physical form (connector exports, partitioned /
  * bucketed tables). The first invocation pays the write; every later
  * one — e.g. bench iterations 2..n — only reads, so timings measure
  * the scan, not a write+read round trip. Paths embed the JVM pid so
  * two sessions on one host never race on a shared tmp dir.
  */
object StageOnce {
  val pid: Long = ProcessHandle.current().pid()

  def tmp(name: String, dir: String): String =
    new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_${name}_${pid}_${Integer.toHexString(dir.hashCode)}").getAbsolutePath

  private val staged = scala.collection.mutable.Set.empty[String]
  def apply(key: String)(write: => Unit): Unit = synchronized {
    if (!staged.contains(key)) { write; staged += key }
  }
}
