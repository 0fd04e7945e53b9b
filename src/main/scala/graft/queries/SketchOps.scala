package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.ops.{CacheBin, KCore, LabelPropagation, PortableSketches, Sampling, Triangles}

/** Query faces for the engine-portable sketches, graph stats and
  * weighted sampling (see graft.ops.PortableSketches / Triangles /
  * Sampling for the designs and the 100 TB rationale). All of these are
  * oracle-hashable — the whole point of md5-deterministic sketches —
  * so unlike the built-in approximate aggregates each face has a full
  * DuckDB oracle row, not just a spec bound.
  */
object SketchOps {

  private def toks(c: org.apache.spark.sql.Column) = split(trim(c), "\\s+")

  // ------------------------------------------------------------- HLL

  /** Distinct tokens per language, HyperLogLog-estimated: the register
    * table is <= 256 rows per language however big the corpus, built by
    * a two-level max-aggregation that map-side combines — vs exact
    * count(DISTINCT token), which shuffles every distinct token. The
    * estimate is bit-reproducible (dyadic harmonic sum), so an engine
    * fleet can share persisted register tables.
    */
  def sketchHllTokens(spark: SparkSession, dir: String): DataFrame = {
    val occ = Tables.load(spark, dir, "documents")
      .select(col("lang"), explode(toks(col("text"))).as("token"))
    val regs = PortableSketches.hllRegisters(occ, Seq("lang"), col("token"))
    PortableSketches.hllEstimate(regs, Seq("lang"))
  }

  /** Sketch ROLLUP — the distributed-sketch contract as a query: each
    * source's HLL register table is built once (the per-shard artifact
    * a 100 TB fleet persists), and the corpus-wide 'ALL' row is
    * estimated by MERGING those register tables (max per register) —
    * never by re-scanning the corpus. Max-merge is associative and
    * lossless for HLL, so rollup-from-sketches ≡ direct build exactly
    * (`SketchesSpec` pins the equality); the oracle replays both the
    * per-source sketches and the merge, hash-checking the whole
    * daily-sketch → monthly-rollup pattern.
    */
  def sketchHllRollup(spark: SparkSession, dir: String): DataFrame = {
    val occ = Tables.load(spark, dir, "documents")
      .select(col("source"), explode(toks(col("text"))).as("token"))
    val regs = graft.ops.CacheBin.pin(
      PortableSketches.hllRegisters(occ, Seq("source"), col("token")))
    val perSource = PortableSketches.hllEstimate(
        regs.withColumnRenamed("source", "scope"), Seq("scope"))
    val merged = regs.groupBy(col("reg")).agg(max(col("r")).as("r"))
      .withColumn("scope", lit("ALL"))
    perSource.unionAll(PortableSketches.hllEstimate(merged, Seq("scope")))
      .orderBy(col("scope"))
  }

  val sketchHllRollupSql: String =
    """WITH occ AS (
      |  SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS token
      |  FROM documents),
      |regs AS (
      |  SELECT source,
      |    ('0x' || substr(md5(token), 1, 2))::BIGINT AS reg,
      |    max(CASE WHEN ('0x' || substr(md5(token), 3, 8))::BIGINT = 0 THEN 33
      |        ELSE 33 - length(bin(('0x' || substr(md5(token), 3, 8))::BIGINT)) END)
      |      AS r
      |  FROM occ GROUP BY 1, 2),
      |allregs AS (
      |  SELECT 'ALL' AS scope, reg, max(r) AS r FROM regs GROUP BY 2),
      |u AS (
      |  SELECT source AS scope, reg, r FROM regs
      |  UNION ALL SELECT scope, reg, r FROM allregs),
      |z AS (
      |  SELECT scope,
      |    sum(CAST(1.0 AS DOUBLE) / CAST(1::BIGINT << r AS DOUBLE)) AS z_occ,
      |    count(*) AS n_occ
      |  FROM u GROUP BY 1)
      |SELECT scope,
      |  round(CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(256.0 AS DOUBLE)) * CAST(65536.0 AS DOUBLE)
      |        / (z_occ + CAST(256 - n_occ AS DOUBLE)), 6) AS hll_nd
      |FROM z ORDER BY 1""".stripMargin

  /** Q-DIGEST quantile sketch + rollup ([[graft.ops.QDigest]] —
    * Shrivastava et al., SenSys 2004), completing the portable-sketch
    * algebra with the fourth classic: percentiles. Per event type, the
    * integerized value stream (⌊value⌋ clamped to [1, 1024]) compresses
    * into a ≤ O(K·log U)-node digest; the corpus-wide 'ALL' row is the
    * MERGE of the per-type digests (count addition + recompress) —
    * never a re-scan — and every estimated percentile is reported NEXT
    * TO its exact counterpart, so the sketch's rank error (≤ log₂U·n/K)
    * is a query result, the KMV-overlap error-exposure convention.
    *
    * Shape: ONE corpus exchange — the (type, value-bucket) count
    * aggregate, map-side combined, ≤ |types|·U rows out; compression,
    * merge and both quantile walks are exact-int64 driver math on the
    * collected sketch-sized table (the codebook-collect class). At
    * 100 TB the per-shard digests are what a fleet persists; the merge
    * IS the daily→monthly rollup. Unlike t-digest/KLL's randomized
    * compaction the fit is bit-deterministic, so the oracle replays
    * the entire build (10 unrolled family-merge rounds per chain) and
    * the face is hash-gated, not bound-gated.
    */
  def sketchQdigest(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.QDigest
    val dist = Tables.loadEvents(spark, dir)
      .select(col("event_type").as("scope"),
        least(greatest(floor(col("value")).cast(LongType), lit(1L)),
          lit(QDigest.U.toLong)).as("v"))
      .groupBy(col("scope"), col("v")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byScope = dist.groupBy(_._1).toSeq.sortBy(_._1)
    val perScope = byScope.map { case (scope, rows) =>
      val d = rows.map { case (_, v, c) => v -> c }.toMap
      val n = d.values.sum
      val digest = QDigest.compress(d.map { case (v, c) => QDigest.leafOf(v) -> c }, n)
      (scope, n, d, digest)
    }
    val allDist = dist.groupBy(_._2).map { case (v, rs) => v -> rs.map(_._3).sum }
    val allN = allDist.values.sum
    val allDigest = QDigest.merge(perScope.map(_._4))
    val out = (perScope :+ (("ALL", allN, allDist, allDigest))).map {
      case (scope, n, d, digest) =>
        (scope, n, digest.size.toLong,
          QDigest.quantile(digest, n, 50), QDigest.exactQuantile(d, n, 50),
          QDigest.quantile(digest, n, 90), QDigest.exactQuantile(d, n, 90),
          QDigest.quantile(digest, n, 99), QDigest.exactQuantile(d, n, 99))
    }
    import spark.implicits._
    out.toDF("scope", "n_events", "nodes", "p50_est", "p50_exact",
      "p90_est", "p90_exact", "p99_est", "p99_exact").orderBy(col("scope"))
  }

  /** One unrolled q-digest family-merge round (child level `d`) for
    * the oracle: families (parent, child-sum) at this level, the
    * strict < τ merge decision, and the rewritten node set.
    */
  private def qdRound(pre: String, d: Int): String = {
    val lo = 1L << d
    val hi = (1L << (d + 1)) - 1
    s"""fam$pre$d AS MATERIALIZED (
       |  SELECT scope, id // 2 AS p, CAST(sum(cnt) AS BIGINT) AS cs
       |  FROM $pre$d WHERE id BETWEEN $lo AND $hi GROUP BY 1, 2),
       |mg$pre$d AS MATERIALIZED (
       |  SELECT t.scope, t.p, t.tot FROM (
       |    SELECT f.scope, f.p, f.cs + coalesce(pc.cnt, 0) AS tot
       |    FROM fam$pre$d f LEFT JOIN $pre$d pc
       |      ON pc.scope = f.scope AND pc.id = f.p) t
       |  JOIN tau$pre u ON u.scope = t.scope WHERE t.tot < u.tau),
       |$pre${d - 1} AS MATERIALIZED (
       |  SELECT r.scope, r.id, r.cnt FROM $pre$d r
       |  WHERE NOT EXISTS (SELECT 1 FROM mg$pre$d m WHERE m.scope = r.scope
       |    AND (m.p = r.id OR (m.p = r.id // 2 AND r.id BETWEEN $lo AND $hi)))
       |  UNION ALL
       |  SELECT scope, p AS id, tot AS cnt FROM mg$pre$d)""".stripMargin
  }

  /** Node geometry + percentile walks for a finished chain `${pre}0`:
    * hi/width from the heap id, cumulative in (hi ASC, width ASC)
    * order, first hi reaching the (n·pct+99)//100 target.
    */
  private def qdQuantiles(pre: String): String =
    s"""geom$pre AS MATERIALIZED (
       |  SELECT scope, id, cnt,
       |    (id - (1::BIGINT << (len(bin(id)) - 1)))
       |      * (1024 >> (len(bin(id)) - 1))
       |      + (1024 >> (len(bin(id)) - 1)) AS hi,
       |    1024 >> (len(bin(id)) - 1) AS w
       |  FROM ${pre}0),
       |cum$pre AS MATERIALIZED (
       |  SELECT g.scope, g.hi,
       |    sum(g.cnt) OVER (PARTITION BY g.scope ORDER BY g.hi, g.w
       |      ROWS UNBOUNDED PRECEDING) AS cum, ns.n
       |  FROM geom$pre g JOIN ns$pre ns USING (scope)),
       |est$pre AS MATERIALIZED (
       |  SELECT scope,
       |    min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN hi END) AS p50,
       |    min(CASE WHEN cum >= (n * 90 + 99) // 100 THEN hi END) AS p90,
       |    min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN hi END) AS p99
       |  FROM cum$pre GROUP BY 1),
       |nodes$pre AS MATERIALIZED (
       |  SELECT scope, CAST(count(*) AS BIGINT) AS nodes FROM ${pre}0 GROUP BY 1)""".stripMargin

  lazy val sketchQdigestSql: String = {
    val roundsS = (10 to 1 by -1).map(qdRound("r", _)).mkString(",\n")
    val roundsA = (10 to 1 by -1).map(qdRound("a", _)).mkString(",\n")
    s"""WITH dist AS MATERIALIZED (
       |  SELECT event_type AS scope,
       |    least(greatest(CAST(floor(value) AS BIGINT), 1), 1024) AS v,
       |    CAST(count(*) AS BIGINT) AS cnt
       |  FROM events GROUP BY 1, 2),
       |nsr AS MATERIALIZED (
       |  SELECT scope, CAST(sum(cnt) AS BIGINT) AS n FROM dist GROUP BY 1),
       |taur AS MATERIALIZED (SELECT scope, n // 256 AS tau FROM nsr),
       |r10 AS MATERIALIZED (SELECT scope, 1024 + v - 1 AS id, cnt FROM dist),
       |$roundsS,
       |a10 AS MATERIALIZED (
       |  SELECT 'ALL' AS scope, id, CAST(sum(cnt) AS BIGINT) AS cnt
       |  FROM r0 GROUP BY 2),
       |nsa AS MATERIALIZED (
       |  SELECT scope, CAST(sum(cnt) AS BIGINT) AS n FROM a10 GROUP BY 1),
       |taua AS MATERIALIZED (SELECT scope, n // 256 AS tau FROM nsa),
       |$roundsA,
       |${qdQuantiles("r")},
       |${qdQuantiles("a")},
       |adist AS MATERIALIZED (
       |  SELECT 'ALL' AS scope, v, CAST(sum(cnt) AS BIGINT) AS cnt
       |  FROM dist GROUP BY 2),
       |xcum AS MATERIALIZED (
       |  SELECT d.scope, d.v,
       |    sum(d.cnt) OVER (PARTITION BY d.scope ORDER BY d.v
       |      ROWS UNBOUNDED PRECEDING) AS cum, t.n
       |  FROM (SELECT scope, v, cnt FROM dist
       |        UNION ALL SELECT scope, v, cnt FROM adist) d
       |  JOIN (SELECT scope, n FROM nsr UNION ALL SELECT scope, n FROM nsa) t
       |    USING (scope)),
       |exact AS MATERIALIZED (
       |  SELECT scope,
       |    min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN v END) AS p50,
       |    min(CASE WHEN cum >= (n * 90 + 99) // 100 THEN v END) AS p90,
       |    min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN v END) AS p99
       |  FROM xcum GROUP BY 1),
       |ests AS (
       |  SELECT scope, p50, p90, p99 FROM estr
       |  UNION ALL SELECT scope, p50, p90, p99 FROM esta),
       |counts AS (
       |  SELECT scope, nodes FROM nodesr UNION ALL SELECT scope, nodes FROM nodesa),
       |alln AS (SELECT scope, n FROM nsr UNION ALL SELECT scope, n FROM nsa)
       |SELECT e.scope, alln.n AS n_events, counts.nodes,
       |  e.p50 AS p50_est, x.p50 AS p50_exact,
       |  e.p90 AS p90_est, x.p90 AS p90_exact,
       |  e.p99 AS p99_est, x.p99 AS p99_exact
       |FROM ests e JOIN exact x USING (scope)
       |JOIN counts USING (scope) JOIN alln USING (scope)
       |ORDER BY e.scope""".stripMargin
  }

  /** KMV set-OVERLAP estimation between sources (the Beyer et al.
    * k-min-values intersection estimator): each source keeps only its
    * k = 16 smallest distinct token hashes, and a pair's Jaccard is
    * estimated as the in-both fraction of the k smallest hashes of the
    * pooled sketches — reported NEXT TO the exact posting-join Jaccard
    * so the estimator's error is a query result. k = 16 sits BELOW the
    * per-source vocabularies, so the sketch genuinely estimates
    * (at k ≥ |set| KMV degenerates to the exact set — the face would
    * compare a number to itself). All arithmetic is exact: 40-bit
    * hashes, integer memberships, one rounded division per column.
    *
    * Shape: the sketch table is ≤ |sources|·k rows (distinct-hash
    * aggregate + per-source window over ≤ vocabulary rows) and the
    * pairwise estimation runs on the COLLECTED sketches — parameter
    * math, the codebook class; the exact side is the vocabOverlap
    * posting join. At 100 TB only the exact side touches the corpus —
    * which is the estimator's selling point, measured here.
    */
  def sketchKmvOverlap(spark: SparkSession, dir: String,
      k: Int = 16): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val dtok = graft.ops.CacheBin.pin(
      Tables.load(spark, dir, "documents")
        .select(col("source"), explode(toks(col("text"))).as("token"))
        .distinct())
    // per-source k-min sketch, collected (≤ |sources|·k longs)
    val kmins = dtok
      .select(col("source"), PortableSketches.hash40(col("token")).as("h"))
      .distinct()
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("h"))))
      .filter(col("rk") <= k)
      .select(col("source"), col("h"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (s, rs) => s -> rs.map(_._2).toSet }
    val est = kmins.keys.toSeq.sorted.combinations(2).map { case Seq(a, b) =>
      val pooled = (kmins(a) ++ kmins(b)).toSeq.sorted.take(k)
      val inBoth = pooled.count(h => kmins(a)(h) && kmins(b)(h))
      // denominator is |U_k| — the k smallest of the POOLED sets, or
      // all of them when the union is smaller than k (the exactness
      // regime): dividing by a fixed k would deflate small unions
      (a, b, BigDecimal(inBoth.toDouble / pooled.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.toDF("src_a", "src_b", "kmv_jaccard")
    // exact side: posting join over the pinned distinct tokens
    val cnt = dtok.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val inter = dtok.as("a")
      .join(dtok.as("b"), col("a.token") === col("b.token") &&
        col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(cnt.select(col("source").as("src_a"), col("n").as("na")), Seq("src_a"))
      .join(cnt.select(col("source").as("src_b"), col("n").as("nb")), Seq("src_b"))
      .join(broadcast(est), Seq("src_a", "src_b"))
      .select(col("src_a"), col("src_b"), col("kmv_jaccard"),
        round(col("inter").cast(DoubleType) /
          (col("na") + col("nb") - col("inter")).cast(DoubleType), 6)
          .as("jaccard"))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** KMV set ALGEBRA between sources — the full Beyer et al. estimator
    * family from ONE pooled sketch, completing [[sketchKmvOverlap]]'s
    * Jaccard with SIZE estimates for union, intersection, and the
    * one-sided difference (the "how much of A is not in B" triage
    * number a source-dedup decision actually needs): with h_(k) the
    * k-th smallest pooled 40-bit hash, |A∪B|_est = (k−1)·2⁴⁰/h_(k)
    * (the classic KMV cardinality estimator; when the pooled sketch is
    * smaller than k it IS the union — the exactness regime, branch
    * mirrored in both engines), and the membership fractions of the
    * pooled k smallest scale it into |A∩B|_est and |A\B|_est. Every
    * estimate is reported NEXT TO its exact posting-join counterpart,
    * so all three estimators' errors are query results. Arithmetic:
    * integer hashes and memberships, an identical double tree both
    * engines (one division for the union, fraction·union for the
    * rest), round-6 at the output only.
    *
    * Shape: sketch table ≤ |sources|·k rows, pairwise math on the
    * COLLECTED sketches (codebook class); only the exact side touches
    * the corpus.
    */
  def sketchKmvSetops(spark: SparkSession, dir: String,
      k: Int = 16): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val dtok = graft.ops.CacheBin.pin(
      Tables.load(spark, dir, "documents")
        .select(col("source"), explode(toks(col("text"))).as("token"))
        .distinct())
    val kmins = dtok
      .select(col("source"), PortableSketches.hash40(col("token")).as("h"))
      .distinct()
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("h"))))
      .filter(col("rk") <= k)
      .select(col("source"), col("h"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (s, rs) => s -> rs.map(_._2).toSet }
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val est = kmins.keys.toSeq.sorted.combinations(2).map { case Seq(a, b) =>
      val pooled = (kmins(a) ++ kmins(b)).toSeq.sorted.take(k)
      val m = pooled.size
      val estUnion =
        if (m < k) m.toDouble
        else (k - 1).toDouble * math.pow(2.0, 40) / pooled.last.toDouble
      val inBoth = pooled.count(h => kmins(a)(h) && kmins(b)(h))
      val aOnly = pooled.count(h => kmins(a)(h) && !kmins(b)(h))
      (a, b, r6(estUnion),
        r6(inBoth.toDouble / m.toDouble * estUnion),
        r6(aOnly.toDouble / m.toDouble * estUnion))
    }.toSeq.toDF("src_a", "src_b", "est_union", "est_inter", "est_diff_ab")
    val cnt = dtok.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val inter = dtok.as("a")
      .join(dtok.as("b"), col("a.token") === col("b.token") &&
        col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(cnt.select(col("source").as("src_a"), col("n").as("na")), Seq("src_a"))
      .join(cnt.select(col("source").as("src_b"), col("n").as("nb")), Seq("src_b"))
      .join(broadcast(est), Seq("src_a", "src_b"))
      .select(col("src_a"), col("src_b"),
        col("est_union"), (col("na") + col("nb") - col("n_inter")).as("n_union"),
        col("est_inter"), col("n_inter"),
        col("est_diff_ab"), (col("na") - col("n_inter")).as("n_diff_ab"))
      .orderBy(col("src_a"), col("src_b"))
  }

  def sketchKmvSetopsSql(k: Int = 16): String =
    s"""WITH dtok AS MATERIALIZED (
       |  SELECT DISTINCT source, token FROM (
       |    SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS token
       |    FROM documents)),
       |h AS (SELECT DISTINCT source,
       |  ('0x' || substr(md5(token), 1, 10))::BIGINT AS h FROM dtok),
       |kmins AS MATERIALIZED (SELECT source, h FROM (
       |  SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rk
       |  FROM h) WHERE rk <= $k),
       |srcs AS (SELECT DISTINCT source FROM dtok),
       |pairs AS (SELECT a.source AS sa, b.source AS sb
       |  FROM srcs a JOIN srcs b ON a.source < b.source),
       |uni AS (SELECT p.sa, p.sb, m.h,
       |  max(CASE WHEN m.source = p.sa THEN 1 ELSE 0 END) AS ina,
       |  max(CASE WHEN m.source = p.sb THEN 1 ELSE 0 END) AS inb
       |  FROM pairs p JOIN kmins m ON m.source IN (p.sa, p.sb)
       |  GROUP BY 1, 2, 3),
       |topu AS MATERIALIZED (SELECT * FROM (
       |  SELECT *, row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS rk
       |  FROM uni) WHERE rk <= $k),
       |eu AS (SELECT sa, sb,
       |  CASE WHEN count(*) < $k THEN count(*)::DOUBLE
       |       ELSE ${k - 1}::DOUBLE * 1099511627776.0 / max(h)::DOUBLE
       |  END AS est_union_raw,
       |  count(*)::DOUBLE AS m,
       |  sum(CASE WHEN ina = 1 AND inb = 1 THEN 1 ELSE 0 END)::DOUBLE AS inboth,
       |  sum(CASE WHEN ina = 1 AND inb = 0 THEN 1 ELSE 0 END)::DOUBLE AS aonly
       |  FROM topu GROUP BY 1, 2),
       |c AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM dtok GROUP BY 1),
       |i AS (SELECT a.source AS sa, b.source AS sb, CAST(count(*) AS BIGINT) AS n_inter
       |  FROM dtok a JOIN dtok b ON a.token = b.token AND a.source < b.source
       |  GROUP BY 1, 2)
       |SELECT i.sa AS src_a, i.sb AS src_b,
       |  round(e.est_union_raw, 6) AS est_union,
       |  CAST(ca.n + cb.n - i.n_inter AS BIGINT) AS n_union,
       |  round(e.inboth / e.m * e.est_union_raw, 6) AS est_inter,
       |  i.n_inter,
       |  round(e.aonly / e.m * e.est_union_raw, 6) AS est_diff_ab,
       |  CAST(ca.n - i.n_inter AS BIGINT) AS n_diff_ab
       |FROM i JOIN eu e ON e.sa = i.sa AND e.sb = i.sb
       |  JOIN c ca ON ca.source = i.sa JOIN c cb ON cb.source = i.sb
       |ORDER BY 1, 2""".stripMargin

  def sketchKmvOverlapSql(k: Int = 16): String =
    s"""WITH dtok AS MATERIALIZED (
       |  SELECT DISTINCT source, token FROM (
       |    SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS token
       |    FROM documents)),
       |h AS (SELECT DISTINCT source,
       |  ('0x' || substr(md5(token), 1, 10))::BIGINT AS h FROM dtok),
       |kmins AS MATERIALIZED (SELECT source, h FROM (
       |  SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rk
       |  FROM h) WHERE rk <= $k),
       |srcs AS (SELECT DISTINCT source FROM dtok),
       |pairs AS (SELECT a.source AS sa, b.source AS sb
       |  FROM srcs a JOIN srcs b ON a.source < b.source),
       |uni AS (SELECT p.sa, p.sb, m.h,
       |  max(CASE WHEN m.source = p.sa THEN 1 ELSE 0 END) AS ina,
       |  max(CASE WHEN m.source = p.sb THEN 1 ELSE 0 END) AS inb
       |  FROM pairs p JOIN kmins m ON m.source IN (p.sa, p.sb)
       |  GROUP BY 1, 2, 3),
       |topu AS (SELECT * FROM (
       |  SELECT *, row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS rk
       |  FROM uni) WHERE rk <= $k),
       |est AS (SELECT sa, sb,
       |  round(sum(CASE WHEN ina = 1 AND inb = 1 THEN 1 ELSE 0 END)::DOUBLE
       |    / count(*)::DOUBLE, 6) AS kmv_jaccard
       |  FROM topu GROUP BY 1, 2),
       |c AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM dtok GROUP BY 1),
       |i AS (SELECT a.source AS sa, b.source AS sb, CAST(count(*) AS BIGINT) AS inter
       |  FROM dtok a JOIN dtok b ON a.token = b.token AND a.source < b.source
       |  GROUP BY 1, 2)
       |SELECT i.sa AS src_a, i.sb AS src_b, e.kmv_jaccard,
       |  round(i.inter::DOUBLE / (ca.n + cb.n - i.inter)::DOUBLE, 6) AS jaccard
       |FROM i JOIN est e ON e.sa = i.sa AND e.sb = i.sb
       |  JOIN c ca ON ca.source = i.sa JOIN c cb ON cb.source = i.sb
       |ORDER BY 1, 2""".stripMargin

  val sketchHllTokensSql: String =
    """WITH occ AS (
      |  SELECT lang, unnest(string_split_regex(trim(text), '\s+')) AS token
      |  FROM documents),
      |regs AS (
      |  SELECT lang,
      |    ('0x' || substr(md5(token), 1, 2))::BIGINT AS reg,
      |    max(CASE WHEN ('0x' || substr(md5(token), 3, 8))::BIGINT = 0 THEN 33
      |        ELSE 33 - length(bin(('0x' || substr(md5(token), 3, 8))::BIGINT)) END)
      |      AS r
      |  FROM occ GROUP BY 1, 2),
      |z AS (
      |  SELECT lang,
      |    sum(CAST(1.0 AS DOUBLE) / CAST(1::BIGINT << r AS DOUBLE)) AS z_occ,
      |    count(*) AS n_occ
      |  FROM regs GROUP BY lang)
      |SELECT lang,
      |  round(CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(256.0 AS DOUBLE)) * CAST(65536.0 AS DOUBLE)
      |        / (z_occ + CAST(256 - n_occ AS DOUBLE)), 6) AS hll_nd
      |FROM z""".stripMargin

  // ------------------------------------------------------------- KMV

  /** Distinct tokens per language via the KMV bounded aggregator:
    * O(k=64) state per group, partial-aggregated — the k smallest
    * distinct 40-bit hashes ARE the sketch, and merging two sketches is
    * the distinct-union-truncate the aggregator's merge implements.
    * Exact below k (the sketch holds the whole distinct set), the
    * (k-1)/kth-min estimator above.
    */
  def sketchKmvTokens(spark: SparkSession, dir: String): DataFrame = {
    val k = 64
    val kmv = udaf(new graft.functions.KmvAggregator(k))
    val d = Tables.load(spark, dir, "documents")
      .select(col("lang"), explode(toks(col("text"))).as("token"))
      .select(col("lang"), PortableSketches.hash40(col("token")).as("h"))
    d.groupBy(col("lang"))
      .agg(kmv(col("h")).as("s"))
      .select(col("lang"),
        round(
          when(col("s.n") < k, col("s.n").cast(DoubleType))
            .otherwise(lit((k - 1).toDouble) * lit(1099511627776.0) /
              col("s.kth").cast(DoubleType)),
          6).as("kmv_nd"))
  }

  val sketchKmvTokensSql: String =
    """WITH occ AS (
      |  SELECT lang, unnest(string_split_regex(trim(text), '\s+')) AS token
      |  FROM documents),
      |d AS (
      |  SELECT DISTINCT lang, ('0x' || substr(md5(token), 1, 10))::BIGINT AS h
      |  FROM occ),
      |r AS (
      |  SELECT lang, h,
      |    row_number() OVER (PARTITION BY lang ORDER BY h) AS rk,
      |    count(*) OVER (PARTITION BY lang) AS nd
      |  FROM d)
      |SELECT lang,
      |  round(CASE WHEN max(nd) < 64 THEN CAST(max(nd) AS DOUBLE)
      |    ELSE CAST(63.0 AS DOUBLE) * CAST(1099511627776.0 AS DOUBLE)
      |         / CAST(max(CASE WHEN rk = 64 THEN h END) AS DOUBLE) END, 6)
      |    AS kmv_nd
      |FROM r GROUP BY lang""".stripMargin

  // ------------------------------------------------------------- CMS

  /** Count-min point estimates for the corpus's 20 hottest tokens:
    * the sketch is depth 4 x width 512 integer counters built in one
    * map-side-combined pass; estimation probes it by broadcast join.
    * Integer-only, so over-estimates are EXACTLY the bucket collisions
    * the oracle reproduces.
    */
  def sketchCmsTokens(spark: SparkSession, dir: String): DataFrame = {
    val (depth, width) = (4, 512)
    val occ = CacheBin.pin(Tables.load(spark, dir, "documents")
      .select(explode(toks(col("text"))).as("token")))
    val sketch = PortableSketches.cmsSketch(occ, col("token"), depth, width)
    val truth = occ.groupBy(col("token"))
      .agg(count(lit(1)).as("true_ct"))
      .orderBy(col("true_ct").desc, col("token"))
      .limit(20)
      .withColumnRenamed("token", "key")
    PortableSketches.cmsEstimate(truth, sketch, depth, width)
      .withColumnRenamed("key", "token")
  }

  val sketchCmsTokensSql: String =
    """WITH occ AS (
      |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
      |  FROM documents),
      |rows_ AS (SELECT unnest(generate_series(0, 3)) AS r),
      |sketch AS (
      |  SELECT r,
      |    ('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || token), 1, 10))::BIGINT % 512 AS b,
      |    count(*) AS ct
      |  FROM occ, rows_ GROUP BY 1, 2),
      |truth AS (
      |  SELECT token, count(*) AS true_ct FROM occ GROUP BY token
      |  ORDER BY true_ct DESC, token LIMIT 20)
      |SELECT t.token, t.true_ct, min(s.ct) AS cms_ct
      |FROM truth t CROSS JOIN rows_ i
      |JOIN sketch s ON s.r = i.r
      |  AND s.b = ('0x' || substr(md5(CAST(i.r AS VARCHAR) || ':' || t.token), 1, 10))::BIGINT % 512
      |GROUP BY t.token, t.true_ct""".stripMargin

  // ---------------------------------------------------- heavy hitters

  /** Heavy hitters over the corpus CHARACTER-TRIGRAM stream (the one
    * naturally Zipfian stream in this synthetic corpus — word and
    * shingle frequencies are near-uniform by construction): all grams
    * with frequency ≥ N/200, found via the Misra-Gries sketch
    * ([[graft.functions.MisraGriesAggregator]], k = 256 counters over
    * ~377 gram types, so evictions genuinely occur) and then EXACTLY
    * verified: candidates (≤ k, broadcast-class) semi-join back to the
    * gram stream for true counts, and the θ gate is the integer
    * compare cnt·200 ≥ N. The MG guarantee (every item > N/257
    * retained) strictly covers θ = N/200 at any scale, so the
    * deterministic output never depends on sketch merge order.
    *
    * Shape: one map-side MG pass (k-sized partials, ONE k-sized row to
    * the final reducer — no vocab-sized exchange), then a
    * candidate-pruned exact count (the semi-join side is k rows,
    * broadcast) and the 1-row N broadcast. The oracle pays the full
    * vocab groupBy instead.
    */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame = {
    // the MG pass keys on xxhash64(gram) — one cheap long per gram, no
    // per-gram packing arithmetic. A hash COLLISION is harmless at
    // every step: it can only merge two grams' counts in the sketch
    // (the true heavy gram's merged counter is ≥ its own count, so the
    // superset guarantee strengthens) and the candidate semi-join then
    // admits both colliding grams into the EXACT string-keyed count,
    // which separates them again. Deliberately NOT pinned: the gram
    // stream is token-stream-sized (a cache would be corpus-
    // proportional memory); the passes re-run the map-side explode,
    // which is the cheap leg.
    // The gram walk is a PER-DOC char loop, not explode+substring: the
    // generator formulation was measured at 1.1 s of pure
    // substring(text, i, 3) at sf0.1 — UTF8String substring is O(i)
    // per call (codepoint walk), so a whole-doc gram sweep through it
    // is O(len²). The imperative sweep packs each trigram into an
    // EXACT 48-bit code ((c1<<32)|(c2<<16)|c3 — bijective for BMP
    // strings, no hash, no collision budget) at O(len) per doc.
    // PER-PARTITION MG, not an Aggregator: the union of per-partition
    // sketch keys is itself a superset of the global ≥ N/(k+1) items
    // (if a key misses EVERY partition sketch then count_p ≤ N_p/(k+1)
    // for all p, so its total ≤ N/(k+1)) — no merge rule needed for
    // the candidate contract. (The Aggregator-with-udaf formulation
    // re-serializes its kryo buffer per input row — measured ~8 µs/row
    // — and a string-keyed groupBy verify costs ~2 s vs these passes'
    // ~0.3 s.) Pass 1 emits ≤ k sketch keys per partition plus the
    // partition gram count (sentinel key); pass 2 re-counts ONLY
    // candidate codes — primitive LongMap probes end to end — and
    // decodes the ≤ |cand| surviving codes back to gram strings.
    // Explode-amplification guard: gram work is ~300× the input bytes,
    // so small inputs (sf0.1 = one ~700 KB file) get doc-row
    // repartitioning; a 100 TB scan already has ≥ parallelism splits.
    import org.apache.spark.sql.{Encoders => Encs}
    val docs0 = Tables.load(spark, dir, "documents")
    val par = spark.sparkContext.defaultParallelism
    val docs =
      (if (docs0.rdd.getNumPartitions < par) docs0.repartition(par) else docs0)
        .select(col("text")).as(Encs.STRING)
    val k = 256
    val sentinel = Long.MinValue
    def codesOf(t: String)(f: Long => Unit): Unit = {
      var i = 0
      val n = t.length - 2
      while (i < n) {
        val c = t.charAt(i)
        // Corpus-drift guard (same spirit as Tables.assertShape, applied
        // at the only pass that walks every char): the 48-bit gram code
        // is bijective only for BMP strings, and this charAt walk
        // matches the oracle's codepoint-based substr() only when no
        // surrogate pairs exist. A regenerated non-BMP corpus must fail
        // HERE with the cause named, not hash-mismatch downstream.
        if (Character.isSurrogate(c)) throw new IllegalStateException(
          s"testdata drift: documents.text contains a non-BMP codepoint " +
            s"(surrogate 0x${c.toInt.toHexString} at index $i); the " +
            "heavyHitters 48-bit trigram code and its UTF-16 charAt walk " +
            "assume BMP text — switch codesOf to a codePointAt walk with " +
            "a 63-bit pack (21 bits/cp) before trusting results.")
        f((c.toLong << 32) | (t.charAt(i + 1).toLong << 16)
          | t.charAt(i + 2).toLong)
        i += 1
      }
    }
    val pass1 = docs.mapPartitions { it =>
      val b = scala.collection.mutable.LongMap.empty[Long]
      var np = 0L
      it.foreach { t =>
        codesOf(t) { key =>
          np += 1
          val cur = b.getOrElse(key, -1L)
          if (cur >= 0) b(key) = cur + 1
          else if (b.size < k) b(key) = 1L
          else { // decrement-all; amortized O(1) per gram
            val keys = b.keysIterator.toArray
            var i = 0
            while (i < keys.length) {
              val kk = keys(i); val v = b(kk) - 1
              if (v <= 0) b -= kk else b(kk) = v
              i += 1
            }
          }
        }
      }
      b.keysIterator.map(h => (h, 0L)) ++ Iterator((sentinel, np))
    }(Encs.tuple(Encs.scalaLong, Encs.scalaLong))
      .toDF("code", "np")
    val candSet = pass1.filter(col("code") =!= sentinel)
      .select(col("code")).distinct()
      .collect().map(_.getLong(0)).toSet // ≤ k·|partitions| keys
    val n = pass1.filter(col("code") === sentinel)
      .agg(sum(col("np")).as("n"))
    val candB = spark.sparkContext.broadcast(candSet)
    val exact = docs.mapPartitions { it =>
      val cand = candB.value
      val cnt = scala.collection.mutable.LongMap.empty[Long]
      it.foreach(t => codesOf(t) { code =>
        if (cand.contains(code)) cnt(code) = cnt.getOrElse(code, 0L) + 1
      })
      cnt.iterator.map { case (code, c) =>
        (new String(Array(((code >> 32) & 0xFFFF).toChar,
          ((code >> 16) & 0xFFFF).toChar, (code & 0xFFFF).toChar)), c)
      }
    }(Encs.tuple(Encs.STRING, Encs.scalaLong))
      .toDF("gram", "cnt")
      .groupBy(col("gram")).agg(sum(col("cnt")).as("cnt"))
    exact.crossJoin(broadcast(n))
      .filter(col("cnt") * 200 >= col("n"))
      .select(col("gram"), col("cnt"),
        round(col("cnt") * lit(100.0) / col("n"), 6).as("pct"))
  }

  val heavyHittersSql: String =
    """WITH g AS (SELECT substr(text, i, 3) AS gram
      |  FROM documents, unnest(range(1, length(text) - 1)) z(i)
      |  WHERE length(text) >= 3),
      |c AS (SELECT gram, count(*) AS cnt FROM g GROUP BY 1),
      |n AS (SELECT count(*) AS n FROM g)
      |SELECT gram, CAST(cnt AS BIGINT) AS cnt,
      |  round(cnt * 100.0 / n, 6) AS pct
      |FROM c CROSS JOIN n WHERE cnt * 200 >= n""".stripMargin

  /** Streaming face of [[heavyHitters]] (see
    * [[graft.streaming.HeavyHittersStream]]): three doc-ordered
    * micro-batches through a real StreamingQuery WITH kill-and-resume
    * maintain the k-counter MG state generation chain; the converged
    * report candidate-restricts the exact recount and must equal the
    * batch face — oracle = heavyHittersSql VERBATIM.
    */
  def heavyHittersStreamMaterialize(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.ops.StageOnce.tmp("hh_stream", dir)
    graft.ops.StageOnce(root) {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val rows = Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("text"), col("source"))
        .orderBy(col("doc_id"))
        .collect().map(r => graft.queries.BlocklistDoc(r.getLong(0),
          r.getString(1), r.getString(2)))
      val ckpt = graft.ops.StageOnce.tmp("hh_stream_ckpt", dir)
      val mem = MemoryStream[graft.queries.BlocklistDoc]
      def start() = graft.streaming.HeavyHittersStream.start(
        mem.toDS().toDF(), root, ckpt)
      val third = (rows.length + 2) / 3
      val q1 = start()
      try {
        mem.addData(rows.slice(0, third).toIndexedSeq)
        q1.processAllAvailable()
        mem.addData(rows.slice(third, 2 * third).toIndexedSeq)
        q1.processAllAvailable()
      } finally q1.stop()
      val q2 = start() // kill-and-resume from the checkpoint
      try {
        mem.addData(rows.slice(2 * third, rows.length).toIndexedSeq)
        q2.processAllAvailable()
      } finally q2.stop()
    }
    graft.streaming.HeavyHittersStream.report(spark, root, dir)
  }

  // ------------------------------------------------------- triangles

  /** Graph-shape stats of the LSH near-dup graph (edges = the verified
    * minhash-LSH pairs): edge/wedge/triangle counts via degree-ordered
    * orientation — see graft.ops.Triangles. The edge list is pinned so
    * the LSH pipeline runs once, not once per join branch.
    */
  def dedupGraphStats(spark: SparkSession, dir: String): DataFrame = {
    val edges = CacheBin.pin(
      LlmOps.minhashLshDedup(spark, dir).select(col("doc_a"), col("doc_b")))
    Triangles.stats(edges)
  }

  lazy val dedupGraphStatsSql: String =
    s"""WITH edges AS (SELECT doc_a, doc_b FROM (${LlmOps.minhashLshSql})),
       |deg AS (
       |  SELECT v, count(*) AS deg FROM (
       |    SELECT doc_a AS v FROM edges
       |    UNION ALL SELECT doc_b AS v FROM edges)
       |  GROUP BY v),
       |o AS (
       |  SELECT
       |    CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e.doc_a < e.doc_b)
       |         THEN e.doc_a ELSE e.doc_b END AS src,
       |    CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e.doc_a < e.doc_b)
       |         THEN e.doc_b ELSE e.doc_a END AS dst
       |  FROM edges e
       |  JOIN deg da ON da.v = e.doc_a
       |  JOIN deg db ON db.v = e.doc_b),
       |wed AS (
       |  SELECT x.dst AS u, y.dst AS w
       |  FROM o x JOIN o y ON x.src = y.src AND x.dst < y.dst),
       |closed AS (
       |  SELECT count(*) AS n_wedges,
       |    CAST(coalesce(sum(CASE WHEN e.doc_a IS NULL THEN 0 ELSE 1 END), 0) AS BIGINT)
       |      AS n_triangles
       |  FROM wed LEFT JOIN edges e
       |    ON e.doc_a = least(u, w) AND e.doc_b = greatest(u, w))
       |SELECT (SELECT count(*) FROM edges) AS n_edges,
       |  n_wedges, n_triangles
       |FROM closed""".stripMargin

  /** 2-core of the near-dup graph via a 3-round bulk-synchronous peel
    * ([[KCore]]): the densely-duplicated heart — every surviving doc
    * near-duplicates ≥ 2 other survivors, recursively, which separates
    * template farms from incidental pairs. Three rounds converge at
    * every test sf (the dedup graph is cliques + pendants; round 3 is
    * the idempotence witness), and the oracle unrolls the SAME three
    * rounds as CTEs over the shared LSH edge set — round-for-round
    * equivalence is hash-checked, not just the final core.
    */
  def dedupKcore(spark: SparkSession, dir: String): DataFrame = {
    val edges = CacheBin.pin(
      LlmOps.minhashLshDedup(spark, dir).select(col("doc_a"), col("doc_b")))
    KCore.peel(edges, k = 2, rounds = 3)
  }

  /** Every CTE is MATERIALIZED: each round references its predecessor
    * 3× (edge source + both degree probes), so DuckDB's default CTE
    * INLINING re-evaluates the whole chain multiplicatively — measured
    * at sf0.1 the inlined form ran for minutes and spilled tens of GB,
    * while the materialized form is 0.6 s. The hint changes evaluation
    * strategy only, never results.
    */
  lazy val dedupKcoreSql: String = {
    val k = 2
    val rounds = 3
    val sb = new StringBuilder
    sb.append(
      s"WITH e0 AS MATERIALIZED (SELECT doc_a, doc_b FROM (${LlmOps.minhashLshSql}) q)")
    for (r <- 1 to rounds) {
      sb.append(s""",
d$r AS MATERIALIZED (SELECT v, count(*) AS deg FROM (
  SELECT doc_a AS v FROM e${r - 1} UNION ALL SELECT doc_b AS v FROM e${r - 1}) GROUP BY v),
e$r AS MATERIALIZED (SELECT e.doc_a, e.doc_b FROM e${r - 1} e
  JOIN d$r da ON da.v = e.doc_a AND da.deg >= $k
  JOIN d$r db ON db.v = e.doc_b AND db.deg >= $k)""")
    }
    sb.append(s"""
SELECT v, count(*)::BIGINT AS deg_in_core FROM (
  SELECT doc_a AS v FROM e$rounds UNION ALL SELECT doc_b AS v FROM e$rounds) GROUP BY v""")
    sb.toString
  }

  // -------------------------------------------------- weighted sample

  /** Length-weighted document sample, expected ~120 docs: every doc kept
    * with probability proportional to n_chars (so sampled TOKENS are
    * ~uniform over the corpus). Selection is exact cross-multiplied
    * integer arithmetic — the oracle picks the identical rows.
    */
  def sampleWeighted(spark: SparkSession, dir: String): DataFrame =
    Sampling.weightedSample(
      Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars")),
      col("doc_id"), col("n_chars"), targetN = 120)

  val sampleWeightedSql: String =
    """WITH t AS (SELECT CAST(sum(n_chars) AS BIGINT) AS tw FROM documents)
      |SELECT doc_id, lang, n_chars FROM documents, t
      |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 10))::BIGINT AS HUGEINT)
      |        * CAST(tw AS HUGEINT)
      |      < CAST(n_chars AS HUGEINT) * 120 * 1099511627776""".stripMargin

  // ---------------------------------------------- temperature sample

  /** Temperature-flattened language mix (α = 1/2): the dominant
    * language (~42% of the corpus) is downsampled toward the smallest
    * one, rare languages kept whole — the UniMax-style alternative to
    * the hard per-language budgets of q_corpus_mix. Membership is the
    * exact squared-hash integer comparison, so the oracle selects the
    * identical documents.
    */
  def sampleTemperature(spark: SparkSession, dir: String): DataFrame =
    Sampling.temperatureSample(
      Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("lang")),
      col("doc_id"), col("lang"))

  val sampleTemperatureSql: String =
    """WITH n AS (SELECT lang, count(*) AS n_g FROM documents GROUP BY 1),
      |mn AS (SELECT min(n_g) AS n_min FROM n)
      |SELECT d.doc_id, d.lang FROM documents d JOIN n USING (lang), mn
      |WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 10))::BIGINT AS HUGEINT)
      |      * CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 10))::BIGINT AS HUGEINT)
      |      * CAST(n_g AS HUGEINT)
      |    < CAST(n_min AS HUGEINT) * CAST('1208925819614629174706176' AS HUGEINT)""".stripMargin

  // --------------------------------------------- built-in sketch bounds

  /** The BUILT-IN approximate aggregates — HLL++ `approx_count_distinct`,
    * Greenwald-Khanna `percentile_approx`, Karp-heuristic `freqItems` —
    * under an ORACLE-HASHABLE face. Their estimates are engine-internal
    * (a DuckDB oracle cannot reproduce Spark's register layout), so each
    * leg emits the group, an EXACT reference value, and a boolean
    * asserting the estimate honors its documented error bound; for a
    * fixed input the estimates are deterministic, so the booleans hash
    * identically to the oracle's literal TRUE while the Spark side
    * genuinely executes the sketch — an estimate drifting past its bound
    * flips the flag and fails the driver's hash gate. Scale shape: each
    * sketch is its own two-stage hash aggregate with constant per-group
    * state (the POINT of sketches at 100 TB — the exact references here
    * exist only to check the bound and would be dropped in production);
    * the bound joins are group-cardinality-sized and broadcast.
    *
    * Bounds checked:
    *  - HLL++ at rsd=0.05: |est − exact| ≤ 4·rsd·exact (4σ);
    *  - GK at accuracy=10000: the rank of the returned p50 value is
    *    within n/accuracy (+1 discreteness slop) of n/2;
    *  - freqItems at support=0.3: every value with true frequency >
    *    support appears in the returned candidate array (the algorithm's
    *    one-sided guarantee; false positives are allowed and ignored).
    */
  def sketchBuiltinBounds(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Sketches
    val li = Tables.load(spark, dir, "lineitem")
    val rsd = 0.05
    val hllRow = Sketches
      .exactDistinct(li, Seq(col("l_returnflag")), col("l_partkey"))
      .join(Sketches.approxDistinct(li, Seq(col("l_returnflag")),
        col("l_partkey"), rsd), "l_returnflag")
      .select(lit("hllpp").as("sketch"), col("l_returnflag").as("grp"),
        col("exact_nd").as("exact_n"),
        (abs(col("approx_nd") - col("exact_nd")) <=
          lit(4 * rsd) * col("exact_nd")).as("ok"))
    val acc = 10000
    val q50 = Sketches.approxQuantiles(li, Seq(col("l_returnflag")),
        col("l_extendedprice"), Seq(0.5), acc)
      .select(col("l_returnflag"), element_at(col("approx_q"), 1).as("q50"))
    // GK's guarantee is about SOME rank of the returned value: with ties,
    // the value occupies ranks [rank_lt+1, rank_le], and the sketch only
    // promises that interval intersects [n/2 - n/acc, n/2 + n/acc]. A
    // one-sided check on rank_le alone would spuriously fail on tie-heavy
    // columns (many rows equal to the true median push rank_le far past
    // n/2 while the value is still a legitimate answer).
    val gkRow = li.join(broadcast(q50), "l_returnflag")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_extendedprice") < col("q50"), 1L).otherwise(0L))
          .as("rank_lt"),
        sum(when(col("l_extendedprice") <= col("q50"), 1L).otherwise(0L))
          .as("rank_le"))
      .select(lit("gk").as("sketch"), col("l_returnflag").as("grp"),
        col("n").as("exact_n"),
        (col("rank_lt").cast(DoubleType) <
          col("n") * 0.5 + col("n").cast(DoubleType) / acc + 1.0).as("lo_ok"),
        (col("rank_le").cast(DoubleType) >=
          col("n") * 0.5 - col("n").cast(DoubleType) / acc - 1.0).as("hi_ok"))
      .select(col("sketch"), col("grp"), col("exact_n"),
        (col("lo_ok") && col("hi_ok")).as("ok"))
    val support = 0.3
    val fi = Sketches.frequentItems(li, Seq("l_linestatus"), support)
    val freqRow = li.groupBy(col("l_linestatus")).agg(count(lit(1)).as("c"))
      .crossJoin(broadcast(li.agg(count(lit(1)).as("tot"))))
      .filter(col("c") > col("tot") * support)
      .crossJoin(broadcast(fi))
      .select(array_contains(col("l_linestatus_freqItems"),
        col("l_linestatus")).as("found"))
      .agg(count(lit(1)).as("exact_n"), min(col("found")).as("ok"))
      .select(lit("freq").as("sketch"), lit("l_linestatus").as("grp"),
        col("exact_n"), col("ok"))
    hllRow.unionByName(gkRow).unionByName(freqRow)
  }

  val sketchBuiltinBoundsSql: String =
    """SELECT 'hllpp' AS sketch, l_returnflag AS grp,
      |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_n, TRUE AS ok
      |FROM lineitem GROUP BY l_returnflag
      |UNION ALL
      |SELECT 'gk', l_returnflag, CAST(count(*) AS BIGINT), TRUE
      |FROM lineitem GROUP BY l_returnflag
      |UNION ALL
      |SELECT 'freq', 'l_linestatus', CAST(count(*) AS BIGINT), TRUE
      |FROM (SELECT l_linestatus FROM lineitem GROUP BY l_linestatus
      |      HAVING count(*) > 0.3 * (SELECT count(*) FROM lineitem))""".stripMargin

  /** LPA community structure of the near-dup graph as a size
    * histogram: (community_size, n_communities) after 3 synchronous
    * label-propagation rounds over the LSH pair relation — the dense-
    * cluster census beside the CC component census ([[dedupKcore]]'s
    * scaladoc has the family argument). Oracle unrolls the identical
    * 3 rounds as materialized CTEs (round-for-round equivalence, the
    * KCore convention).
    */
  def graphLpa(spark: SparkSession, dir: String): DataFrame = {
    val edges = CacheBin.pin(
      LlmOps.minhashLshDedup(spark, dir).select(col("doc_a"), col("doc_b")))
    LabelPropagation.run(edges, rounds = 3)
      .groupBy(col("lbl")).agg(count(lit(1)).as("sz"))
      .groupBy(col("sz").as("community_size"))
      .agg(count(lit(1)).as("n_communities"))
      .orderBy(col("community_size"))
  }

  /** Multi-source BFS hop census over the same pinned near-dup pair
    * graph (see [[graphLpa]]): seeds are the audit-flagged vertex set
    * (id % 5 = 0 — a deterministic stand-in for a takedown/contaminated
    * list), 4 relaxation rounds, output = (hop distance → vertex
    * count) with -1 for vertices farther than 4 hops. The oracle
    * unrolls the identical 4 rounds (round-for-round equivalence, the
    * KCore convention). Scale: graft.ops.Bfs — graph-sized keyed
    * exchanges per round, never corpus-sized.
    */
  def graphBfs(spark: SparkSession, dir: String): DataFrame = {
    val edges = CacheBin.pin(
      LlmOps.minhashLshDedup(spark, dir).select(col("doc_a"), col("doc_b")))
    graft.ops.Bfs.run(edges, v => v % 5 === 0, rounds = 4)
      .groupBy(coalesce(col("dist"), lit(-1L)).as("dist"))
      .agg(count(lit(1)).as("n_vertices"))
      .orderBy(col("dist"))
  }

  lazy val graphBfsSql: String = {
    val rounds = 4
    val sb = new StringBuilder
    sb.append(
      s"WITH e0 AS MATERIALIZED (SELECT doc_a, doc_b FROM (${LlmOps.minhashLshSql}) q),")
    sb.append("""
und AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM e0
  UNION ALL SELECT doc_b, doc_a FROM e0),
d0 AS MATERIALIZED (SELECT DISTINCT src AS v,
  CASE WHEN src % 5 = 0 THEN CAST(0 AS BIGINT) ELSE NULL END AS dist
  FROM und)""")
    for (r <- 1 to rounds) {
      sb.append(s""",
n$r AS MATERIALIZED (SELECT u.src AS v, min(d.dist + 1) AS nd
  FROM und u JOIN d${r - 1} d ON d.v = u.dst
  WHERE d.dist IS NOT NULL GROUP BY 1),
d$r AS MATERIALIZED (SELECT d.v,
  least(coalesce(d.dist, n.nd), coalesce(n.nd, d.dist)) AS dist
  FROM d${r - 1} d LEFT JOIN n$r n ON n.v = d.v)""")
    }
    sb.append(s"""
SELECT CAST(coalesce(dist, -1) AS BIGINT) AS dist,
  CAST(count(*) AS BIGINT) AS n_vertices
FROM d$rounds GROUP BY 1 ORDER BY 1""")
    sb.toString
  }

  /** Materialized like [[dedupKcoreSql]]: each round references its
    * predecessor label CTE from the neighbor join; inlining would
    * re-evaluate the chain multiplicatively.
    */
  lazy val graphLpaSql: String = {
    val rounds = 3
    val sb = new StringBuilder
    sb.append(
      s"WITH e0 AS MATERIALIZED (SELECT doc_a, doc_b FROM (${LlmOps.minhashLshSql}) q),")
    sb.append("""
und AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM e0
  UNION ALL SELECT doc_b, doc_a FROM e0),
l0 AS MATERIALIZED (SELECT DISTINCT src AS v, src AS lbl FROM und)""")
    for (r <- 1 to rounds) {
      sb.append(s""",
n$r AS MATERIALIZED (SELECT u.src, l.lbl, count(*) AS cnt
  FROM und u JOIN l${r - 1} l ON l.v = u.dst GROUP BY 1, 2),
l$r AS MATERIALIZED (SELECT src AS v, lbl FROM (
  SELECT src, lbl, row_number() OVER (PARTITION BY src
    ORDER BY cnt DESC, lbl) AS rn FROM n$r) WHERE rn = 1)""")
    }
    sb.append(s"""
, sizes AS (SELECT lbl, count(*) AS sz FROM l$rounds GROUP BY 1)
SELECT CAST(sz AS BIGINT) AS community_size,
  CAST(count(*) AS BIGINT) AS n_communities
FROM sizes GROUP BY 1 ORDER BY 1""")
    sb.toString
  }

}
