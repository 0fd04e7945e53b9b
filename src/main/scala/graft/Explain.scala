package graft
import org.apache.spark.sql.SparkSession

/** Plan-audit tool: `runMain graft.Explain [query ...]` prints the
  * formatted physical plan of each named SparkEntry query (all if no
  * args). Checklist per plan: PushedFilters reach the scan, ReadSchema
  * is pruned to used columns, small dims broadcast, WholeStageCodegen
  * spans are wide, no unexpected Exchange.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = EngineSession.builder(8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wanted = if (args.isEmpty) SparkEntry.queries.keys.toSeq.sorted
      else args.toSeq
    wanted.foreach { name =>
      println(s"\n========== $name ==========")
      SparkEntry.queries.get(name) match {
        case Some(fn) => fn(spark, sfDir).explain("formatted")
        case None => println(s"unknown query: $name")
      }
    }
    spark.stop()
  }
}
