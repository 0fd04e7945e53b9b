package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over an embedding column (Array[Float]).
  *
  * Three tiers, by scale:
  *  - brute-force cosine top-k: the exact baseline. Map-only score +
  *    TakeOrderedAndProject — distributed, no shuffle of the corpus,
  *    O(n·d) work. Right answer at any sf when k is small.
  *  - LSH (random hyperplane / sign) buckets: candidate generation by
  *    equality join on bucket id — the scale path for pairwise near-dup.
  *  - IVF: coarse quantization to nVectors/centroid inverted lists;
  *    query probes only the closest lists. Centroid assignment is one
  *    broadcast join; at 100 TB the lists become the partitioning key
  *    (write bucketed by centroid → searches touch few partitions).
  *
  * All vector math is done in double precision via zip_with/aggregate
  * (codegen'd higher-order functions, no UDF).
  */
object Similarity {

  /** Dot product of two array columns, in double — codegen'd custom
    * expression (the zip_with+aggregate formulation evaluates
    * interpreted; the kernel keeps the identical left-fold IEEE order).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.dotProd(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine = dot/(|a||b|) in ONE kernel call per row. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.cosineSim(a, b)

  /** Exact top-k by cosine to one query vector. The literal query vector
    * ships with the plan (broadcast by definition); orderBy+limit
    * compiles to TakeOrderedAndProject — each partition keeps k rows,
    * driver merges. No full sort, no shuffle.
    */
  def bruteForceTopK(corpus: DataFrame, id: Column, emb: Column,
      queryVec: Seq[Double], k: Int): DataFrame = {
    val q = array(queryVec.map(lit): _*)
    corpus.select(id.as("vec_id"), cosine(emb, q).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** Deterministic random hyperplanes: `nPlanes` × `dim` gaussian weights
    * from a fixed seed. Small (nPlanes·dim doubles) → plan literal.
    */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(nPlanes, dim)(rng.nextGaussian())
  }

  /** Sign-LSH bucket id: bit i = (v · plane_i) >= 0. Buckets group
    * vectors by angular region; cosine-close vectors collide with high
    * probability. Map-only.
    */
  def lshBucket(emb: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(emb, array(p.toIndexedSeq.map(lit): _*)) >= 0,
        shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce[Column]((a, b) => a.bitwiseOR(b))

  /** Near-duplicate embedding pairs via BANDED sign-LSH (the minhash
    * band construction transplanted to hyperplane signatures): draw
    * `bands × planesPerBand` planes, bucket each vector once per band
    * on that band's plane signs, take candidates that collide in ANY
    * band (OR over bands), verify by exact cosine, de-duplicate pairs.
    *
    * The two knobs decouple what a single plane set ties together:
    *  - `planesPerBand` controls OCCUPANCY (≈ n/2^p vectors per bucket
    *    per band — the within-bucket join stays linear-ish at corpus
    *    scale);
    *  - `bands` controls RECALL (a θ-close pair collides in a band with
    *    prob (1−θ/π)^p, so missing ALL b bands decays exponentially in
    *    b) — without paying for it in bucket size.
    * Shuffle shape: ONE (band, bucket)-keyed exchange of b×n narrow
    * rows, then the bucket-local join — same scale story as minhash LSH.
    */
  /** (vec_id, e, band, bucket) rows: one row per band, bucket = that
    * band's plane-sign bits. The shared candidate-generation half of
    * the banded LSH family below.
    */
  def bandedBuckets(df: DataFrame, id: Column, emb: Column,
      bands: Int, planesPerBand: Int, dim: Int): DataFrame = {
    val planes = hyperplanes(bands * planesPerBand, dim)
    val bandBuckets = (0 until bands).map { b =>
      lshBucket(col("e"),
        planes.slice(b * planesPerBand, (b + 1) * planesPerBand))
    }
    df.select(id.as("vec_id"), emb.as("e"))
      .select(col("vec_id"), col("e"),
        posexplode(array(bandBuckets: _*)).as(Seq("band", "bucket")))
  }

  def cosineNearDupPairs(corpus: DataFrame, id: Column, emb: Column,
      threshold: Double, bands: Int = 4, planesPerBand: Int = 6,
      dim: Int = 64): DataFrame = {
    val banded = bandedBuckets(corpus, id, emb, bands, planesPerBand, dim)
    val l = banded.as("l"); val r = banded.as("r")
    l.join(r, col("l.band") === col("r.band") &&
        col("l.bucket") === col("r.bucket") &&
        col("l.vec_id") < col("r.vec_id"))
      .select(col("l.vec_id").as("vec_a"), col("r.vec_id").as("vec_b"),
        cosine(col("l.e"), col("r.e")).as("cos"))
      .filter(col("cos") >= threshold)
      .distinct() // a pair may collide in several bands
  }

  /** Incremental-gate variant: banded candidates BETWEEN two sides only
    * (batch × corpus — never within a side), verified by exact cosine.
    * The crawl-delta shape: cost ∝ batch × bucket-occupancy, the corpus
    * is bucketed once and never self-joined.
    */
  def cosineCrossNearDupPairs(batch: DataFrame, corpus: DataFrame,
      id: Column, emb: Column, threshold: Double, bands: Int = 4,
      planesPerBand: Int = 6, dim: Int = 64): DataFrame = {
    val l = bandedBuckets(batch, id, emb, bands, planesPerBand, dim).as("l")
    val r = bandedBuckets(corpus, id, emb, bands, planesPerBand, dim).as("r")
    l.join(r, col("l.band") === col("r.band") &&
        col("l.bucket") === col("r.bucket"))
      .select(col("l.vec_id").as("vec_a"), col("r.vec_id").as("vec_b"),
        cosine(col("l.e"), col("r.e")).as("cos"))
      .filter(col("cos") >= threshold)
      .distinct()
  }

  /** IVF index: assign every vector to its nearest centroid (broadcast
    * the centroids — they are tiny), producing inverted lists keyed by
    * centroid id. Deterministic centroids: callers pass them (e.g. a
    * k-means fit, or a fixed sample).
    */
  def ivfAssign(corpus: DataFrame, id: Column, emb: Column,
      centroids: Seq[(Int, Seq[Double])]): DataFrame = {
    // score against each centroid; argmax via greatest-chain keeps it
    // one projection (centroid count is small by construction)
    val scored = centroids.map { case (cid, c) =>
      struct(cosine(emb, array(c.map(lit): _*)).as("cos"),
        lit(cid).as("cid"))
    }
    corpus.select(id.as("vec_id"), emb.as("e"),
      greatest(scored: _*).getField("cid").as("centroid"))
  }

  /** One Lloyd's (k-means) iteration over the corpus: assign every
    * vector to its nearest centroid (broadcast — tiny by construction),
    * then the new centroid is the elementwise mean per cluster. Output
    * is long-form (centroid, pos, v) — one row per (cluster, dimension).
    * Shape at 100 TB: one broadcast join + ONE shuffle keyed on
    * (centroid, pos) with map-side partial averaging; no vector ever
    * leaves its partition un-aggregated. Iterating = re-calling with the
    * collected (small) centroid table.
    */
  def kmeansStep(corpus: DataFrame, id: Column, emb: Column,
      centroids: Seq[(Int, Seq[Double])]): DataFrame =
    ivfAssign(corpus, id, emb, centroids)
      .select(col("centroid"),
        posexplode(col("e").cast(ArrayType(DoubleType))).as(Seq("pos", "v")))
      .groupBy(col("centroid"), col("pos"))
      .agg(avg(col("v")).as("v"))

  /** Fixed-iteration Lloyd's (k-means) fit: iterate [[kmeansStep]]
    * `iters` times from `init`, collecting the parameter-sized k×d
    * centroid table between rounds (the only driver-side data — the
    * per-round work is the one broadcast join + one (centroid,pos)
    * shuffle of kmeansStep). Intermediate means are rounded to 6
    * decimals, which makes the fit ENGINE-PORTABLE: a SQL replica that
    * rounds the same way lands on bit-identical centroids, so the
    * trained index can be verified end-to-end by an external oracle.
    * Clusters that lose every member drop out (the groupBy emits no row
    * for them — same behavior as a SQL GROUP BY replica). Deterministic
    * given a deterministic `init`: assignment ties break by centroid id.
    */
  def kmeansFit(corpus: DataFrame, id: Column, emb: Column,
      init: Seq[(Int, Seq[Double])], iters: Int): Seq[(Int, Seq[Double])] = {
    var cents = init
    for (_ <- 1 to iters) {
      cents = kmeansStep(corpus, id, emb, cents)
        .select(col("centroid"), col("pos"), round(col("v"), 6).as("v"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cid, rows) =>
          (cid, rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq)
        }
        .toSeq.sortBy(_._1)
    }
    cents
  }

  /** Persist the IVF index partitioned by centroid: each inverted list
    * becomes its own partition directory, so a probe-limited search is a
    * PARTITION-PRUNED scan (touches nProbe/|C| of the files, verified in
    * SimilaritySpec via inputFiles).
    */
  def ivfWriteIndex(assigned: DataFrame, path: String): Unit =
    assigned.write.mode("overwrite").partitionBy("centroid").parquet(path)

  /** APPEND a pre-assigned delta batch to a persisted IVF index — the
    * index-maintenance move for a growing corpus: new vectors are
    * quantized against the EXISTING (frozen) centroids and their files
    * land only under the centroid partitions the delta actually
    * touches; base files are never read, rewritten, or moved. Cost is
    * delta-proportional (one assignment projection + one partitioned
    * write), vs rebuild's full-corpus scan — the same
    * delta-vs-recompute contract as the incremental dedup gates.
    * Searches over an appended index are IDENTICAL to a full rebuild
    * with the same centroids (the index is a row set partitioned by a
    * pure function of (vector, centroids)); periodic re-TRAINING of
    * the centroids as drift accumulates is a separate, deliberate
    * maintenance action — exactly how IVF deployments (FAISS et al.)
    * stage ingest between refits.
    */
  def ivfAppendIndex(assignedDelta: DataFrame, path: String): Unit =
    assignedDelta.write.mode("append").partitionBy("centroid").parquet(path)

  /** Compact ONE centroid partition of a persisted IVF index in place —
    * the small-file follow-up to [[ivfAppendIndex]]: every append adds
    * files to the partitions its delta touches, and after many ingest
    * cycles a hot inverted list is dozens of row-group-sized files
    * whose per-file open/footer cost dominates a probe. Compaction
    * rewrites exactly that partition's rows into one file; every other
    * partition is untouched (maintenance cost stays proportional to
    * the compacted list, like append's delta-proportionality), and the
    * row set is unchanged, so searches before ≡ after. Contract: a
    * stop-the-world maintenance step like [[Layout.compact]] — no
    * concurrent reader/writer on the index during the swap (the
    * OCC-versioned Upsert is the engine's concurrent-publish path; an
    * index needing lock-free compaction would live behind it).
    * Returns (files before, files after).
    */
  def ivfCompactPartition(spark: org.apache.spark.sql.SparkSession,
      path: String, centroid: Int): (Int, Int) = {
    import org.apache.hadoop.fs.Path
    val part = new Path(s"$path/centroid=$centroid")
    val fs = part.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles() = fs.listStatus(part)
      .filter(_.getPath.getName.endsWith(".parquet")).map(_.getPath)
    val originals = dataFiles()
    val tmp = new Path(s"$path/.compact_tmp_centroid_$centroid")
    spark.read.parquet(part.toString).coalesce(1)
      .write.mode("overwrite").parquet(tmp.toString)
    // publish order: compacted file in first (distinct name), originals
    // out after — a crash in between leaves duplicate rows, which the
    // stop-the-world contract makes unobservable (re-run the compaction
    // or delete the compact- file to recover; no data is ever lost)
    fs.listStatus(tmp).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).zipWithIndex.foreach {
        case (f, i) =>
          val dest = new Path(part, s"compact-${System.nanoTime()}-$i.parquet")
          require(fs.rename(f, dest), s"compaction publish failed: $f -> $dest")
      }
    originals.foreach(f => fs.delete(f, false))
    fs.delete(tmp, true)
    (originals.length, dataFiles().length)
  }

  /** DELETE tombstoned vectors from a persisted IVF index — the forget
    * cascade's ANN leg ([[graft.ops.Forget]]), and the one artifact
    * where a physical delete is BOUNDED WITHOUT tombstone probing:
    * every vector lives in exactly ONE centroid partition (assignment
    * is a pure function of (vector, frozen centroids)), so the caller
    * assigns the tombstoned vectors against the same frozen centroids
    * (delta-sized work) and only those partitions are rewritten —
    * every other inverted list is byte-untouched (spec-pinned).
    * Centroids stay frozen: forgetting vectors must not retrain the
    * model (retraining is the separate deliberate action, as for
    * append). Deleting from a list uses the compaction machinery's
    * stop-the-world swap contract. Returns the touched centroid ids
    * (≤ min(|tombstones|, |C|), parameter-sized).
    *
    * Correctness contract: the index row set after delete is IDENTICAL
    * to a rebuild from the filtered corpus with the same centroids, so
    * searches answer as if the vectors never existed.
    */
  def ivfDeletePartitioned(spark: org.apache.spark.sql.SparkSession,
      path: String, assignedTombstones: DataFrame): Seq[Int] = {
    import org.apache.hadoop.fs.Path
    // only the touched-centroid ID LIST is collected (≤ |C| rows); the
    // tombstone ids themselves stay distributed and reach each rewrite
    // as a broadcast anti-join side (bounded by the forget request,
    // the same class as the probe-time tombstone broadcast)
    val touched = assignedTombstones.select(col("centroid")).distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    touched.map { cid =>
      val part = new Path(s"$path/centroid=$cid")
      def dataFiles() = fs.listStatus(part)
        .filter(_.getPath.getName.endsWith(".parquet")).map(_.getPath)
      val originals = dataFiles()
      val tmp = new Path(s"$path/.delete_tmp_centroid_$cid")
      spark.read.parquet(part.toString)
        .join(broadcast(assignedTombstones
          .filter(col("centroid") === cid).select(col("vec_id"))),
          Seq("vec_id"), "left_anti")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      fs.listStatus(tmp).map(_.getPath)
        .filter(_.getName.endsWith(".parquet")).zipWithIndex.foreach {
          case (f, i) =>
            val dest = new Path(part, s"deleted-${System.nanoTime()}-$i.parquet")
            require(fs.rename(f, dest), s"delete publish failed: $f -> $dest")
        }
      originals.foreach(f => fs.delete(f, false))
      fs.delete(tmp, true)
      cid
    }
  }

  /** Search a persisted IVF index: the centroid filter prunes partitions
    * before any file is opened; exact top-k inside the probed lists.
    */
  def ivfSearchIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
      centroids: Seq[(Int, Seq[Double])], queryVec: Seq[Double], k: Int,
      nProbe: Int = 2): DataFrame =
    ivfSearch(spark.read.parquet(path), centroids, queryVec, k, nProbe)

  /** IVF search: find the `nProbe` centroids closest to the query, scan
    * only their lists, exact top-k within. At scale the lists are
    * bucketed files — the scan prunes to nProbe/|C| of the data.
    */
  /** Driver-side coarse probe: ids of the `nProbe` centroids nearest
    * the query (cosine desc, cid asc) — parameter-sized math over the
    * centroid table, no job.
    */
  def probeCids(centroids: Seq[(Int, Seq[Double])], queryVec: Seq[Double],
      nProbe: Int): Seq[Int] = {
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    centroids.map { case (cid, c) => (cid, cos(c, queryVec)) }
      .sortBy { case (cid, s) => (-s, cid) }.take(nProbe).map(_._1)
  }

  /** MULTI-PROBE order with a scan BUDGET — the production nProbe
    * lever between "2 lists" and "full scan" (the multi-probe LSH
    * ranking of Lv et al., VLDB 2007, applied to IVF; FAISS's nprobe
    * generalized to a row budget): rank every centroid list by the
    * query-centroid cosine MARGIN (cos_best − cos_i, ascending — the
    * same order as cosine descending, spelled as the margin because
    * that is the quantity the multi-probe literature budgets), then
    * take ranked lists while the CUMULATIVE list size stays within
    * `budgetRows` (the first list always probes — a budget below the
    * hottest list must still answer). Driver parameter math over the
    * centroid table and the per-list sizes a real index keeps as
    * metadata; the search plan itself is unchanged — still one
    * partition-pruned scan of the probed lists + exact top-k.
    *
    * Because the cumulative size is nondecreasing in margin rank, the
    * kept set is a PREFIX of the ranked lists: recall@k is monotone
    * nondecreasing in the budget, reaching exact brute-force at
    * budget = N (spec-pinned via the recall monitor).
    */
  def probeCidsBudget(centroids: Seq[(Int, Seq[Double])],
      listSizes: Map[Int, Long], queryVec: Seq[Double],
      budgetRows: Long): Seq[Int] = {
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val scored = centroids.map { case (cid, c) => (cid, cos(c, queryVec)) }
    // Rank by cosine descending directly (the probeCids convention), which
    // IS the multi-probe margin order (best − s ascending) without the
    // floating subtraction, which can collapse two distinct cosines into
    // equal margins and flip the tie-break away from the oracle's
    // `cosine DESC, cid` ordering.
    val ranked = scored.sortBy { case (cid, s) => (-s, cid) }
    var cum = 0L
    ranked.zipWithIndex.flatMap { case ((cid, _), i) =>
      cum += listSizes.getOrElse(cid, 0L)
      if (i == 0 || cum <= budgetRows) Some(cid) else None
    }
  }

  /** IVF search under a probe-row budget: [[probeCidsBudget]] order,
    * same pruned-scan plan as [[ivfSearch]].
    */
  def ivfSearchBudget(assigned: DataFrame, centroids: Seq[(Int, Seq[Double])],
      listSizes: Map[Int, Long], queryVec: Seq[Double], k: Int,
      budgetRows: Long): DataFrame = {
    val probed = probeCidsBudget(centroids, listSizes, queryVec, budgetRows)
    val q = array(queryVec.map(lit): _*)
    assigned.filter(col("centroid").isin(probed: _*))
      .select(col("vec_id"), cosine(col("e"), q).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  def ivfSearch(assigned: DataFrame, centroids: Seq[(Int, Seq[Double])],
      queryVec: Seq[Double], k: Int, nProbe: Int = 2): DataFrame = {
    val probed = probeCids(centroids, queryVec, nProbe)
    val q = array(queryVec.map(lit): _*)
    assigned.filter(col("centroid").isin(probed: _*))
      .select(col("vec_id"), cosine(col("e"), q).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  // ------------------------------------------------------- quantization

  /** Int8 scalar quantization of the embedding column: adds `q_i8`
    * (array<tinyint> codes) and `q_scale` (the 127/max|x| factor). The
    * 100 TB lever for vector search: codes are 4× narrower than float32
    * on disk, in shuffle records, and in executor memory, so a
    * brute-force or IVF scan streams 4× the vectors per second at a
    * recall cost bounded by 1/254 per-component error. Scores come back
    * approximately real-valued via dot_i8/(scale_a·scale_b).
    */
  def quantizeI8(df: DataFrame, emb: Column): DataFrame =
    df.withColumn("q_i8", graft.functions.GraftFunctions.quantizeI8(emb))
      .withColumn("q_scale", graft.functions.GraftFunctions.quantizeScale(emb))

  /** Exact top-k by int8-quantized dot product against one quantized
    * query vector (codes ship as plan literals). Same
    * TakeOrderedAndProject shape as bruteForceTopK — map-only scoring,
    * per-partition k, driver merge — over 4×-narrower data. The score
    * column is the exact integer dot product: deterministic and
    * engine-portable, unlike a re-floated cosine.
    */
  def quantizedTopK(corpus: DataFrame, id: Column, emb: Column,
      queryCodes: Seq[Byte], k: Int): DataFrame = {
    val q = array(queryCodes.map(b => lit(b)): _*)
    quantizeI8(corpus, emb)
      .select(id.as("vec_id"),
        graft.functions.GraftFunctions.dotI8(col("q_i8"), q).as("dot_i8"))
      .orderBy(col("dot_i8").desc, col("vec_id"))
      .limit(k)
  }

  // ——— Product quantization (the PQ half of IVF-PQ) ———————————————————
  //
  // The 100 TB ANN compression tier: each vector is cut into `m`
  // subspaces and each subspace is replaced by the id of its nearest
  // codeword, so a 64-float (256 B) embedding becomes m=8 small ints.
  // Search then never touches the floats: a query precomputes one
  // m×k distance table (driver-side, parameter-sized) and scores a
  // candidate with m table lookups + (m−1) integer adds — the
  // asymmetric-distance computation (ADC) of Jégou et al., "Product
  // Quantization for Nearest Neighbor Search" (TPAMI 2011).
  //
  // Everything here runs on the int8 quantization grid so all
  // distances are exact int64 arithmetic: deterministic under any
  // partitioning, any engine — the DuckDB oracle matches bit-for-bit
  // with no float-rounding escape hatch. At cluster scale the encode
  // is a once-per-corpus map-only job whose output (the codes table)
  // is what searches scan; the codebook itself is a plan literal
  // (m·k·d longs), broadcast by definition, never shuffled.

  /** Codebook from the first `k` corpus vectors' int8 codes (the same
    * deterministic seed-as-fit stand-in as `seedCentroids` for IVF):
    * cb(ms)(kk) = dims [ms·d, ms·d+d) of vector kk's codes. A
    * parameter-sized collect — k vectors, never data-proportional.
    */
  def pqSeedCodebook(corpus: DataFrame, id: Column, emb: Column,
      m: Int = 8, k: Int = 16): Array[Array[Array[Long]]] = {
    val rows = quantizeI8(corpus.filter(id < k), emb)
      .select(id.cast(LongType).as("i"), col("q_i8"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Byte](1).map(_.toLong).toArray))
      .sortBy(_._1).map(_._2)
    require(rows.length == k, s"pqSeedCodebook: need ids 0..${k - 1}")
    val d = rows(0).length / m
    Array.tabulate(m, k)((ms, kk) => rows(kk).slice(ms * d, ms * d + d))
  }

  /** TRAINED PQ codebook: `iters` rounds of integer k-means per
    * subspace on the int8 grid, seeded from [[pqSeedCodebook]] — the
    * sampled-fit production recipe (Jégou et al. 2011 train codebooks
    * per subspace on a corpus sample; the bench corpora are small
    * enough to use whole) replacing the seed-as-fit stand-in. Each
    * round reuses the [[graft.functions.PqEncode]] kernel for the
    * assignment (one map-only pass), then ONE exchange keyed on
    * (subspace, codeword, dim) aggregates exact int64 sums/counts —
    * m·k·d rows, parameter-sized, collected like [[kmeansFit]]'s
    * centroid table. The codeword update stays ON the int8 grid:
    * round-half-away-from-zero of the exact rational mean, computed in
    * truncating int64 division — (2s ± c) / 2c — which Scala, Spark
    * and DuckDB all define identically (toward zero), so an oracle SQL
    * replica lands on bit-identical codebooks with no float anywhere.
    * A codeword that loses every member keeps its previous value (the
    * codebook must stay k entries — codes index into it).
    */
  def pqTrainCodebook(corpus: DataFrame, id: Column, emb: Column,
      m: Int = 8, k: Int = 16, iters: Int = 2): Array[Array[Array[Long]]] = {
    var cb = pqSeedCodebook(corpus, id, emb, m, k)
    val d = cb(0)(0).length
    for (_ <- 1 to iters) {
      val stats = quantizeI8(corpus, emb)
        .select(graft.functions.GraftFunctions
            .pqEncode(col("q_i8"), cb.flatten.flatten, m, k).as("codes"),
          posexplode(col("q_i8").cast(ArrayType(LongType))).as(Seq("j", "v")))
        .select(expr(s"j DIV $d").cast(IntegerType).as("ms"),
          expr(s"j % $d").cast(IntegerType).as("jj"),
          element_at(col("codes"), expr(s"CAST(j DIV $d AS INT) + 1")).as("cw"),
          col("v"))
        .groupBy(col("ms"), col("cw"), col("jj"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("c"))
        .collect()
        .map(r => ((r.getInt(0), r.getInt(1), r.getInt(2)),
          (r.getLong(3), r.getLong(4))))
        .toMap
      cb = Array.tabulate(m, k, d) { (ms, kk, j) =>
        stats.get((ms, kk, j)) match {
          case Some((s, c)) => (2 * s + (if (s >= 0) c else -c)) / (2 * c)
          case None => cb(ms)(kk)(j)
        }
      }
    }
    cb
  }

  /** Encode every vector as its per-subspace nearest codeword id
    * (squared-L2 on the int8 grid; ties → smallest codeword id), as
    * one `codes` array<int> column. The argmin runs in the PqEncode
    * kernel — a single static call inside whole-stage codegen (a
    * column-expression formulation is m·k·d nodes and knocks the
    * stage to interpreted eval). Map-only: at corpus scale this
    * output is WRITTEN once (m small ints per vector) and searches
    * read codes only.
    */
  def pqEncode(corpus: DataFrame, id: Column, emb: Column,
      cb: Array[Array[Array[Long]]]): DataFrame = {
    val m = cb.length; val k = cb(0).length
    quantizeI8(corpus, emb).select(id.as("vec_id"),
      graft.functions.GraftFunctions
        .pqEncode(col("q_i8"), cb.flatten.flatten, m, k).as("codes"))
  }

  /** ADC top-k: build the query's m×k distance table driver-side, then
    * score each encoded vector with m literal-array lookups — no
    * floats, no join, TakeOrderedAndProject merge like the other
    * top-k faces. `queryCodes` is the query's full int8 code vector.
    */
  def pqAdcTopK(corpus: DataFrame, id: Column, emb: Column,
      cb: Array[Array[Array[Long]]], queryCodes: Array[Long],
      topK: Int): DataFrame =
    pqAdcScoreCodes(pqEncode(corpus, id, emb, cb), cb, queryCodes, topK)

  /** ADC top-k over STORED codes — the search path of a persisted
    * codes-only PQ index ([[pqEncode]] output written partitioned by
    * centroid): the query's m×k distance table is driver math, each
    * stored code row is scored with m literal-array lookups, and the
    * TakeOrdered merge returns k — identical scores to encoding
    * in-flight (codes are a pure function of (vector, codebook)), but
    * the scan streams the 8×-narrower code rows and never touches the
    * float vectors.
    */
  def pqAdcScoreCodes(encoded: DataFrame, cb: Array[Array[Array[Long]]],
      queryCodes: Array[Long], topK: Int): DataFrame = {
    val m = cb.length; val k = cb(0).length; val d = cb(0)(0).length
    val dt = Array.tabulate(m, k) { (ms, kk) =>
      (0 until d).map { j =>
        val e = queryCodes(ms * d + j) - cb(ms)(kk)(j); e * e
      }.sum
    }
    val adist = (0 until m).map { ms =>
      element_at(array(dt(ms).toIndexedSeq.map(lit): _*),
        element_at(col("codes"), ms + 1) + 1)
    }.reduce(_ + _)
    encoded.select(col("vec_id"), adist.as("adist_i8"))
      .orderBy(col("adist_i8"), col("vec_id"))
      .limit(topK)
  }
}
