package graft.dv3f

import org.apache.spark.sql.types._

/** Declarative schema/config for the DV3F staging pipeline — the Scala
  * equivalent of the reference's YAML config
  * (reference: scripts/config/config.yaml:14-119). One entry per staging
  * table: id columns (differ by scope), the fixed metric column set, and
  * the primary key used by the keyed upsert.
  *
  * The pivot value list is derived from `metrics` so the pivot never has
  * to distinct-scan the data (deterministic schema at any scale — see
  * SURVEY.md §2 T3).
  */
final case class StagingTable(
    name: String,           // e.g. "src_departement"
    scope: String,          // "departement" | "region" — routing key (K4)
    idVars: Seq[String],    // unpivot id columns, e.g. annee, dep, libdep
    codeCol: String,        // dep | reg — second component of the uid hash
    primaryKey: String = "uid",
    // declared check constraints: column -> max string length
    // (reference: scripts/config/config.yaml:22, annee maxLength 4)
    maxLengths: Map[String, Int] = Map("annee" -> 4)) {

  /** Fixed metric columns (post-pivot), in declared order.
    * reference: scripts/config/config.yaml:37-67 — nbtrans is int64,
    * the rest double.
    */
  def metricFields: Seq[StructField] =
    StructField("nbtrans", LongType) +:
      Seq("valeurfonc_sum", "valeurfonc_q25", "valeurfonc_median",
        "valeurfonc_q75", "pxm2_q25", "pxm2_median", "pxm2_q75",
        "sbati_sum", "sbati_median").map(StructField(_, DoubleType))

  def metricNames: Seq[String] = metricFields.map(_.name)

  /** Full staging schema: uid + string id vars + cod + typed metrics. */
  def schema: StructType = StructType(
    StructField("uid", StringType, nullable = false) +:
      idVars.map(StructField(_, StringType)) :+
      StructField("cod", StringType) :++
      metricFields.map(_.copy(nullable = true)))
}

object Dv3fConfig {
  val departement: StagingTable = StagingTable(
    name = "src_departement", scope = "departement",
    idVars = Seq("annee", "dep", "libdep"), codeCol = "dep")

  val region: StagingTable = StagingTable(
    name = "src_region", scope = "region",
    idVars = Seq("annee", "reg", "libreg"), codeCol = "reg")

  val staging: Seq[StagingTable] = Seq(departement, region)

  /** Config-driven table routing (reference: scripts/extract_load.py:207-211
    * — substring match of scope over staging table names).
    */
  def route(scope: String): StagingTable =
    staging.find(t => t.name.contains(scope))
      .getOrElse(throw new IllegalArgumentException(s"no staging table for scope '$scope'"))

  /** The 119 fan-out partitions: 18 régions + 101 départements
    * (reference: scripts/config/config.yaml:5-8). Codes are opaque strings;
    * the exact list is config, not logic — this default mirrors the
    * reference's cardinality with INSEE-style codes.
    */
  val defaultScopes: Seq[(String, String)] = {
    val regions = Seq("01", "02", "03", "04", "06", "11", "24", "27", "28",
      "32", "44", "52", "53", "75", "76", "84", "93", "94").map("region" -> _)
    val deps = ((1 to 19) ++ (21 to 95)).map(n => f"$n%02d") ++
      Seq("2A", "2B") ++ (971 to 974).map(_.toString) :+ "976"
    regions ++ deps.map("departement" -> _)
  }
}
