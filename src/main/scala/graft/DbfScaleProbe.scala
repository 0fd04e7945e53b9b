package graft
import org.apache.spark.sql.functions._

/** One-off receipt for SCALE_r11 §4d: a multi-million-row .dbf read
  * through the record-range splits — split count, scan time, and the
  * LIMIT byte-range truncation, measured.
  */
object DbfScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = EngineSession.builder(32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/tmp/graft-dbf-scale"
    new java.io.File(dir).mkdirs()
    val f = s"$dir/big.dbf"
    if (!new java.io.File(f).exists()) {
      val df = spark.range(0, 2500000).select(col("id").as("k"),
        concat(lit("payload_"), col("id") % 1000).as("v"))
      graft.sources.DbfSource.write(df, f)
    }
    println(s"file bytes: ${new java.io.File(f).length()}")
    def time[T](what: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      println(f"$what: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val whole = spark.read.format("dbf").load(f)
    println(s"default splits: ${whole.rdd.getNumPartitions}")
    time("count, default splits")(println("rows: " + whole.count()))
    val split = spark.read.format("dbf")
      .option("recordsPerSplit", "100000").load(f)
    println(s"forced splits: ${split.rdd.getNumPartitions}")
    time("count, 25 splits")(println("rows: " + split.count()))
    time("agg over pruned column, 25 splits")(
      println(split.groupBy("v").count().count()))
    time("LIMIT 10 probe")(println(split.limit(10).collect().length))
    spark.stop()
  }
}
