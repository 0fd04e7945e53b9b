package graft.ops

import graft.SparkSpec
import graft.queries.LlmOps
import org.apache.spark.sql.functions._

/** Invariants of the retrieval-fusion and curation-bucket faces that the
  * DuckDB oracle cannot express as directly: RRF recomputed driver-side
  * from the two input rankings, and the tercile-census arithmetic.
  */
class RetrievalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("hybridRrf equals a driver-side fusion of the two rankings") {
    val lex = LlmOps.bm25TopK(spark, dir, k = 50)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, s) => (-s, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
    val qv = LlmOps.queryVector(spark, dir)
    val dense = Similarity.bruteForceTopK(
        spark.read.parquet(s"$dir/embeddings.parquet"),
        col("vec_id"), col("embedding"), qv, 50)
      .withColumn("cos", round(col("cos"), 6))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, s) => (-s, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
    val want = (lex.keySet ++ dense.keySet).toSeq.map { id =>
      val s = lex.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        dense.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0)
      (id, math.round(s * 1e6) / 1e6)
    }.sortBy { case (id, s) => (-s, id) }.take(20)

    val got = LlmOps.hybridRrf(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    assert(got.toSeq === want)
  }

  test("hybridRrf: a doc in both lists outscores a same-rank single-list doc") {
    val rows = LlmOps.hybridRrf(spark, dir).collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    val both = rows.filter(r => !r.isNullAt(1) && !r.isNullAt(2))
    val single = rows.filter(r => r.isNullAt(1) || r.isNullAt(2))
    if (both.nonEmpty && single.nonEmpty) {
      // any doc present in both lists beats any doc whose best rank is
      // no better than that doc's worst rank
      val b = both.head
      val worst = math.max(b.getInt(1), b.getInt(2))
      single.filter(r => math.min(
          if (r.isNullAt(1)) Int.MaxValue else r.getInt(1),
          if (r.isNullAt(2)) Int.MaxValue else r.getInt(2)) >= worst)
        .foreach(r => assert(b.getDouble(3) > r.getDouble(3)))
    }
  }

  test("tokenDrift equals a driver-side recomputation over exact counts") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val oA = scala.collection.mutable.Map.empty[String, Long]
    val oB = scala.collection.mutable.Map.empty[String, Long]
    // mirror the query's explicit malformed-source exclusion: a source
    // with no trailing digits is in neither cohort
    docs.filter(_._1.matches(".*\\d+$")).foreach { case (src, text) =>
      val a = src.replaceAll("^\\D+", "").toInt < 10
      text.trim.split("\\s+").foreach { t =>
        val m = if (a) oA else oB
        m(t) = m.getOrElse(t, 0L) + 1
      }
    }
    val (nA, nB) = (oA.values.sum.toDouble, oB.values.sum.toDouble)
    val want = (oA.keySet ++ oB.keySet).toSeq
      .map { t =>
        val (a, b) = (oA.getOrElse(t, 0L), oB.getOrElse(t, 0L))
        val d = a.toDouble * nB - b.toDouble * nA
        (t, a, b, math.round(d * d / (nA * nB * (a + b).toDouble) * 1e6) / 1e6)
      }
      .filter { case (_, a, b, _) => a + b >= 20 }
      .sortBy { case (t, _, _, s) => (-s, t) }
      .take(25)
    val got = LlmOps.tokenDrift(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === want)
  }

  test("tokenDrift excludes sources with no trailing cohort digits") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("drift_docs").toString
    val word = "w"
    // 40 tokens of cohort A, 20 of cohort B, 100 of a malformed source:
    // if the malformed source leaked into either cohort the counts (and
    // the null-comparison bug would put them in B) change the result
    (Seq.fill(4)(("crawl-3", Seq.fill(10)(word).mkString(" "))) ++
      Seq.fill(2)(("crawl-13", Seq.fill(10)(word).mkString(" "))) ++
      Seq.fill(10)(("adhoc", Seq.fill(10)(word).mkString(" "))))
      .zipWithIndex.map { case ((s, t), i) =>
        (i.toLong, t, "en", s, t.length.toLong)
      }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = LlmOps.tokenDrift(spark, tmp).collect()
    assert(rows.length == 1)
    assert(rows(0).getString(0) == word)
    assert(rows(0).getLong(1) == 40L && rows(0).getLong(2) == 20L,
      s"malformed source leaked into a cohort: ${rows(0)}")
  }

  test("pplBuckets: rank-based terciles are balanced, exhaustive and ordered") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = LlmOps.pplBuckets(spark, dir).collect()
    val byLang = rows.groupBy(_.getString(0))
    assert(byLang.keySet === docs.keySet)
    byLang.foreach { case (lang, bs) =>
      val sizes = bs.map(r => r.getInt(1) -> r.getLong(2)).toMap
      assert(sizes.keySet.subsetOf(Set(1, 2, 3)), lang)
      assert(sizes.values.sum === docs(lang), lang)
      // ntile balance: sizes differ by at most 1
      assert(sizes.values.max - sizes.values.min <= 1, s"$lang: $sizes")
      // bucket 1 holds the highest scores: ranges must not interleave
      val ordered = bs.sortBy(_.getInt(1))
      ordered.sliding(2).foreach {
        case Array(hi, lo) =>
          assert(hi.getDouble(4) >= hi.getDouble(3), lang) // max >= min
          assert(hi.getDouble(3) >= lo.getDouble(4) ||
            math.abs(hi.getDouble(3) - lo.getDouble(4)) < 1e-15,
            s"$lang: bucket ranges interleave")
        case _ =>
      }
    }
  }

  test("hard negatives: never from the query's relevant source, hardest-first, n per query") {
    import org.apache.spark.sql.functions.col
    val negs = graft.queries.LlmOps.hardNegatives(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val posSource = Map(1L -> "src0", 2L -> "src1", 3L -> "src2")
    val sourceOf = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    negs.groupBy(_._1).foreach { case (qid, rows) =>
      assert(rows.length == 5, s"query $qid: ${rows.length} negatives")
      rows.foreach { case (_, doc, _) =>
        assert(sourceOf(doc) != posSource(qid),
          s"query $qid mined a positive-source doc $doc")
      }
      // hardest-first: scores non-increasing in the aggregator's order
      val scores = rows.map(_._3)
      assert(scores.sameElements(scores.sortBy(-_)),
        s"query $qid negatives not hardest-first")
    }
  }

  test("retrieval MRR: rank arithmetic is internally consistent per query") {
    val rows = graft.queries.LlmOps.retrievalMrr(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L), "one row per panel query")
    rows.foreach { case (qid, firstRank, relInTopk, rr) =>
      assert(firstRank >= 0 && firstRank <= 50, s"query $qid: rank $firstRank")
      assert((firstRank == 0) == (relInTopk == 0),
        s"query $qid: no-first-rank iff no relevant in top-k")
      if (firstRank > 0)
        assert(math.abs(rr - BigDecimal(1.0 / firstRank)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) == 0.0,
          s"query $qid: rr $rr != round(1/$firstRank, 6)")
      else assert(rr == 0.0, s"query $qid: rr must be 0 when nothing relevant")
    }
    // the eval measures something on this corpus: not all queries find
    // a relevant doc at rank 1, and not all miss entirely
    assert(rows.exists(_._4 > 0.0) && rows.exists(_._4 < 1.0))
  }

  test("retrieval MRR agrees with a driver-side BM25 rank recompute") {
    // replay the scoring on the collected corpus (panel terms only):
    // exact same log-free idf tree, rounded to 6dp, (score desc, id)
    // order — the engine's encoded-id trick must not perturb ranks
    val docs = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).trim.split("\\s+", -1)))
    val panel = Map(
      1L -> (Seq("join", "hash"), "src0"),
      2L -> (Seq("scan", "filter"), "src1"),
      3L -> (Seq("vector", "merge"), "src2"))
    val n = docs.length.toDouble
    val avgdl = docs.map(_._3.length).sum.toDouble / n
    val terms = panel.values.flatMap(_._1).toSeq.distinct
    val df = terms.map(t => t -> docs.count(_._3.contains(t)).toDouble).toMap
    val got = graft.queries.LlmOps.retrievalMrr(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    panel.foreach { case (qid, (toks, pos)) =>
      val scored = docs.flatMap { case (id, src, t) =>
        val dl = t.length.toDouble
        val s = toks.map { tok =>
          val tf = t.count(_ == tok).toDouble
          if (tf == 0) 0.0
          else ((n - df(tok) + 0.5) / (df(tok) + 0.5)) * (tf * 2.2) /
            (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
        }.sum
        if (s == 0.0) None
        else Some((id, src, BigDecimal(s)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
      val top = scored.sortBy { case (id, _, s) => (-s, id) }.take(50)
      val want = top.zipWithIndex.collect {
        case ((_, src, _), i) if src == pos => i + 1L
      }
      assert(got(qid)._1 == want.headOption.getOrElse(0L),
        s"query $qid first_rel_rank: got ${got(qid)._1}, want $want")
      assert(got(qid)._2 == want.length.toLong,
        s"query $qid rel_in_topk: got ${got(qid)._2}, want ${want.length}")
    }
  }

  test("rm3: zero expansion weight degenerates to plain BM25; real weight reorders") {
    import org.apache.spark.sql.functions.col
    val plain = graft.queries.LlmOps.bm25TopK(spark, sf, k = 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    // expWeight=0: expansion terms contribute nothing, and no
    // expansion-only doc can outscore a real match — the final list
    // must be exactly the plain BM25 top-10
    val zero = graft.queries.LlmOps.rm3TopK(spark, sf, expWeight = 0.0)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(zero.toSeq == plain.toSeq,
      s"expWeight=0 must reproduce BM25: ${zero.toSeq} vs ${plain.toSeq}")
    // the real recipe must CHANGE the result — expansion is the point
    val rm3 = graft.queries.LlmOps.rm3TopK(spark, sf).collect()
      .map(_.getLong(0))
    assert(rm3.length == 10 && rm3.distinct.length == 10)
    assert(!rm3.sameElements(plain.map(_._1)),
      "expansion changed nothing — feedback terms are dead on this corpus")
  }

  test("embedMarginPairs equals a driver-side margin recompute over the candidate graph") {
    // rebuild the same banded cross-parity candidate set, then replay
    // the margin arithmetic (sorted top-k left-fold means, ratio
    // margin) in plain Scala and compare the full mined slice
    val emb = graft.Tables.load(spark, dir, "embeddings")
    val cands = Similarity.cosineCrossNearDupPairs(
      emb.filter(col("vec_id") % 2 === 0),
      emb.filter(col("vec_id") % 2 =!= 0),
      col("vec_id"), col("embedding"), threshold = 0.1,
      bands = LlmOps.lshBands, planesPerBand = LlmOps.lshPlanesPerBand,
      dim = 64)
      .withColumn("cos", round(col("cos"), 6))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(cands.nonEmpty)
    // every candidate is cross-parity, A-side even
    assert(cands.forall { case (a, b, _) => a % 2 == 0 && b % 2 == 1 })
    def meanTopK(xs: Seq[(Long, Double)]): Double = {
      val top = xs.sortBy { case (o, c) => (-c, o) }.take(4).map(_._2)
      top.foldLeft(0.0)(_ + _) / top.size
    }
    val ma = cands.groupBy(_._1).map { case (a, ps) =>
      a -> meanTopK(ps.map(p => (p._2, p._3)).toSeq) }
    val mb = cands.groupBy(_._2).map { case (b, ps) =>
      b -> meanTopK(ps.map(p => (p._1, p._3)).toSeq) }
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = cands.map { case (a, b, c) =>
      (a, b, c, r6(c / ((ma(a) + mb(b)) / 2.0))) }
      .sortBy { case (a, b, _, m) => (-m, a, b) }.take(20).toSeq
    val byName = LlmOps.embedMarginPairs(spark, dir)
      .select(col("vec_a"), col("vec_b"), col("cos"), col("margin"))
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(byName == expect, s"mined slice diverges from the replay")
  }
}
