package graft

import org.apache.spark.sql.SparkSession

/** The library's session factory — one place for every config the engine
  * needs (used by Bench/Verify/Explain and recommended for users):
  *
  *  - `spark.sql.extensions=graft.GraftExtensions` (SQL access to the
  *    custom expressions);
  *  - nanosecond-parquet compatibility for the events table;
  *  - shuffle partitions sized to the core count for local runs — on a
  *    real cluster leave the default / AQE coalescing in charge;
  *  - UTC session timezone (determinism across hosts).
  *
  * `smallInputTuning` shrinks file-split sizes so MB-scale inputs still
  * parallelize across all cores; production 128 MB+ splits are correct
  * for TB-scale inputs, so it is opt-in.
  */
object EngineSession {

  def builder(cores: Int = Runtime.getRuntime.availableProcessors,
      smallInputTuning: Boolean = false): SparkSession.Builder = {
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    if (smallInputTuning)
      b.config("spark.sql.files.maxPartitionBytes", "1m")
        .config("spark.sql.files.openCostInBytes", "65536")
    else b
  }
}
