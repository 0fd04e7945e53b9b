package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("shingles: word 3-grams, distinct, short docs drop out") {
    val got = docs((1L, "a b c d"), (2L, "x y"))
      .select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) === Seq("a b c", "b c d"))
    assert(got(2L) === Seq())
  }

  test("exactDedup groups identical texts, keeper is min id") {
    val got = Dedup.exactDedup(
      docs((5L, "same text"), (2L, "same text"), (9L, "other")),
      col("doc_id"), col("text"))
      .orderBy("keeper_id").collect()
    assert(got.map(r => (r.getLong(1), r.getLong(2))).toSeq ===
      Seq((2L, 2L), (9L, 1L)))
  }

  test("minhash: identical texts get identical signatures, disjoint don't") {
    val sig = Dedup.minHash(
      docs((1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "q r s t u v")),
      col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
    val s = (i: Int) => sig(i).toSeq.drop(1)
    assert(s(0) === s(1))
    assert(s(0) !== s(2))
  }

  test("minhash LSH candidates find near-identical pairs") {
    val d = docs(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"),
      (3L, "completely different words appear within this very document here"))
    val sig = Dedup.minHash(d, col("doc_id"), col("text"))
    val cand = Dedup.minHashLshCandidates(sig, bands = 4, rowsPerBand = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cand.contains((1L, 2L)))
    assert(!cand.contains((1L, 3L)) && !cand.contains((2L, 3L)))
  }

  test("simhash: equal for identical text, near for near-identical, far for disjoint") {
    val sigs = docs(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"),
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w13"),
      (4L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10 z11 z12"))
      .select(col("doc_id"), Dedup.simHash(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(1L), sigs(2L)) === 0)
    assert(ham(sigs(1L), sigs(3L)) < ham(sigs(1L), sigs(4L)))
  }

  test("incrementalExactDups: batch vs corpus only, by content") {
    val corpus = docs((1L, "the quick brown fox"), (2L, "hello world"))
    val batch = docs((10L, "the quick brown fox"), // dup of corpus 1
      (11L, "something new entirely"),
      (12L, "hello world")) // dup of corpus 2
    val got = Dedup.incrementalExactDups(batch, corpus,
      col("doc_id"), col("text")).collect().map(_.getLong(0)).sorted
    assert(got === Array(10L, 12L))
  }

  test("crossLshCandidates: pairs span batch×corpus, never within a side") {
    val all = docs(
      (1L, "a b c d e f g h i j"), (2L, "totally different words here now ok"),
      (10L, "a b c d e f g h i j"), // near-identical to corpus 1
      (11L, "a b c d e f g h i j")) // and to each other — must NOT pair
    val sigB = Dedup.minHash(all.filter(col("doc_id") >= 10), col("doc_id"), col("text"))
    val sigC = Dedup.minHash(all.filter(col("doc_id") < 10), col("doc_id"), col("text"))
    val got = Dedup.crossLshCandidates(sigB, sigC, 4, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((10L, 1L), (11L, 1L))) // no (10,11), no (1,2)
  }

  test("ngramJaccardPairs computes exact jaccard") {
    // doc1: shingles {a b c, b c d, c d e}; doc2: {a b c, b c d, c d x}
    // inter=2, union=4 → 0.5
    val got = Dedup.ngramJaccardPairs(
      docs((1L, "a b c d e"), (2L, "a b c d x")),
      col("doc_id"), col("text"), n = 3, threshold = 0.1)
      .collect()
    assert(got.length === 1)
    assert(got(0).getLong(2) === 2L) // inter
    assert(got(0).getDouble(3) === 0.5)
  }

  test("ngramContainmentPairs: subset doc scores 1.0 where jaccard hides it") {
    // doc2's text is doc1 plus a long suffix: every doc1 shingle is in
    // doc2 → containment 1.0, while jaccard = 3/12 = 0.25 sits under a
    // 0.5 threshold. doc3 shares nothing.
    val corpus = docs(
      (1L, "a b c d e"),
      (2L, "a b c d e f g h i j k l m n"),
      (3L, "totally different words entirely here"))
    val got = Dedup.ngramContainmentPairs(corpus,
      col("doc_id"), col("text"), n = 3, threshold = 0.5).collect()
    assert(got.length === 1)
    assert((got(0).getLong(0), got(0).getLong(1)) === ((1L, 2L)))
    assert(got(0).getLong(2) === 3L) // inter = doc1's 3 shingles
    assert(got(0).getDouble(3) === 1.0)
    // same corpus under jaccard at the same threshold: nothing
    assert(Dedup.ngramJaccardPairs(corpus,
      col("doc_id"), col("text"), n = 3, threshold = 0.5).count() === 0)
  }

  test("ngramJaccardPairs: maxDocFreq drops hot shingles (no blowup)") {
    val hot = (1L to 20L).map(i => (i, s"hot shingle here unique$i tail"))
    val got = Dedup.ngramJaccardPairs(hot.toDF("doc_id", "text"),
      col("doc_id"), col("text"), n = 3, threshold = 0.01, maxDocFreq = 5)
    // 'hot shingle here' appears in 20 docs > 5 → dropped → no pairs via it
    assert(got.count() === 0)
  }

  test("boundedPostings: exact df, list capped at cap+1, weights ride with ids") {
    val rows = (1L to 10L).map(i => (if (i <= 7) 100L else 200L, i, i * 10L))
    val got = rows.toDF("h", "doc_id", "w").repartition(4)
      .groupBy("h")
      .agg(graft.functions.GraftFunctions
        .boundedPostings(col("doc_id"), col("w"), 4).as("p"))
      .select(col("h"), col("p.df"), col("p.ids"), col("p.ws"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Long](2), r.getSeq[Long](3)))
      .toList.sortBy(_._1)
    val (h1, df1, ids1, ws1) = got(0) // 7 ids at cap=4 → exact df, capped at 5
    assert(h1 == 100L && df1 == 7L && ids1.length == 5 &&
      ids1.toSet.subsetOf((1L to 7L).toSet))
    assert(ws1 == ids1.map(_ * 10L), "weights must stay aligned with ids")
    val (h2, df2, ids2, ws2) = got(1) // 3 ids under cap → complete list
    assert(h2 == 200L && df2 == 3L && ids2.toSet == Set(8L, 9L, 10L))
    assert(ws2 == ids2.map(_ * 10L))
  }

  test("longPairsWeighted: sorted a<b pairs with aligned weights") {
    val got = Seq((Seq(3L, 1L, 2L), Seq(30L, 10L, 20L)),
        (Seq(5L), Seq(50L)), (Seq.empty[Long], Seq.empty[Long]))
      .toDF("ds", "ns")
      .select(graft.functions.GraftFunctions
        .longPairsWeighted(col("ds"), col("ns"))
        .as(Seq("a", "wa", "b", "wb")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toList
    assert(got == List((1L, 10L, 2L, 20L), (1L, 10L, 3L, 30L),
      (2L, 20L, 3L, 30L)))
  }

  test("pairExchangeParallelism: floor on small/unknown stats, grows with file bytes") {
    val base = spark.sessionState.conf.numShufflePartitions
    // small parquet input → session floor
    assert(Dedup.pairExchangeParallelism(
      graft.Tables.load(spark, sf, "documents")) === base)
    // in-memory relation with accurate tiny stats → floor
    assert(Dedup.pairExchangeParallelism(
      Seq(1L, 2L).toDF("x")) === base)
    // an RDD-backed relation reports the "cannot size" sentinel
    // (spark.sql.defaultSizeInBytes ≈ Long.MaxValue); the sizing must
    // read that as UNKNOWN → floor, not as huge → 4096 tiny tasks
    val rdd = spark.sparkContext.parallelize(Seq(
      org.apache.spark.sql.Row(1L), org.apache.spark.sql.Row(2L)))
    val sentinel = spark.createDataFrame(rdd,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("x",
          org.apache.spark.sql.types.LongType))))
    assert(sentinel.queryExecution.optimizedPlan.stats.sizeInBytes
      >= BigInt(1L << 50), "precondition: RDD relation reports sentinel stats")
    assert(Dedup.pairExchangeParallelism(sentinel) === base)
  }

  test("longPairsWeighted rejects misaligned ids/ws lengths loudly") {
    // a silent zip would emit pairs with the WRONG doc's weight — wrong
    // jaccard denominators downstream; require the generator to throw
    val ex = intercept[Exception] {
      Seq((Seq(1L, 2L), Seq(10L)))
        .toDF("ds", "ns")
        .select(graft.functions.GraftFunctions
          .longPairsWeighted(col("ds"), col("ns"))
          .as(Seq("a", "wa", "b", "wb")))
        .collect()
    }
    assert(ex.getMessage != null)
  }

  test("simHashPairs banding is LOSSLESS: equals brute-force hamming pairs") {
    // pigeonhole: maxDist+1 disjoint bands -> any pair within maxDist
    // agrees exactly on >= 1 band, so candidates cover every true pair
    val docs = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    for (maxDist <- Seq(4, 8)) {
      val banded = Dedup.simHashPairs(docs, col("doc_id"), col("text"), maxDist)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val sigs = docs.select(col("doc_id"), Dedup.simHash(col("text")).as("sig"))
        .collect().map(r => r.getLong(0) -> r.getLong(1))
      val brute = (for {
        (a, sa) <- sigs; (b, sb) <- sigs if a < b
        d = java.lang.Long.bitCount(sa ^ sb) if d <= maxDist
      } yield (a, b, d)).toSet
      assert(banded === brute, s"maxDist=$maxDist")
      CacheBin.releaseAll()
    }
  }

  test("simhashBands: disjoint, cover all 60 bits, maxDist+1 of them") {
    for (maxDist <- Seq(0, 3, 8, 59)) {
      val bands = Dedup.simhashBands(maxDist)
      assert(bands.length === maxDist + 1)
      val bits = bands.flatMap { case (shift, w) => shift until (shift + w) }
      assert(bits.sorted === (0 until 60), s"maxDist=$maxDist")
    }
  }

  test("longPairs: sorted a<b pairs, empty for null/size<2 arrays") {
    val got = Seq(Seq(3L, 1L, 2L), Seq(5L), Seq.empty[Long])
      .toDF("ds")
      .select(graft.functions.GraftFunctions.longPairs(col("ds"))
        .as(Seq("a", "b")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList
    assert(got == List((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("hammingSigPairs: inline verify emits exactly the ≤maxDist pairs, a<b") {
    // bucket of four: ids 10,20,30,40 with sigs 0b0000, 0b0011, 0b0111,
    // 0b110000 — pairwise distances (10,20)=2 (10,30)=3 (10,40)=2
    // (20,30)=1 (20,40)=4 (30,40)=5
    val entries = Seq(Seq((10L, 0L), (20L, 3L), (30L, 7L), (40L, 48L)))
      .toDF("es")
      .select(graft.functions.GraftFunctions
        .hammingSigPairs(col("es"), maxDist = 2)
        .as(Seq("a", "b", "d")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(entries === Set((10L, 20L, 2), (10L, 40L, 2), (20L, 30L, 1)))
    // degenerate buckets emit nothing
    val empty = Seq(Seq((1L, 0L)), Seq.empty[(Long, Long)])
      .toDF("es")
      .select(graft.functions.GraftFunctions
        .hammingSigPairs(col("es"), maxDist = 60))
      .collect()
    assert(empty.isEmpty)
    // pair order is (min, max) regardless of array order
    val rev = Seq(Seq((9L, 0L), (2L, 1L)))
      .toDF("es")
      .select(graft.functions.GraftFunctions
        .hammingSigPairs(col("es"), maxDist = 60)
        .as(Seq("a", "b", "d")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList
    assert(rev == List((2L, 9L)))
  }

  test("span removal: later docs lose shared 8-grams, canonical and unique docs keep theirs") {
    val docs = Seq(
      (1L, "a b c d e f g h X"),     // canonical owner of [a..h]
      (2L, "p q a b c d e f g h r"), // loses the span mid-document
      (3L, "u v w"),                 // unique, untouched
      (4L, "a b c d e f g h i")      // loses the span at the start
    ).toDF("doc_id", "text")
    val out = graft.queries.LlmOps.removeDuplicateSpans(docs, n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(out === Set((2L, 8L, "p q r"), (4L, 8L, "i")))
  }

  test("cdc chunk dedup: content-defined boundaries survive an insertion; dup chunks counted") {
    val dir = java.nio.file.Files.createTempDirectory("cdc_chunk").toString
    val sfDocs = spark.read.parquet(s"$sf/documents.parquet")
    // doc B = doc A with junk PREPENDED: every fixed-window chunk of A
    // would shift, but content-defined boundaries re-synchronize, so at
    // least one multi-token chunk of A must recur verbatim in B
    val a = sfDocs.orderBy($"n_chars".desc, $"doc_id")
      .select($"text").limit(1).collect()(0).getString(0)
    Seq((1L, a), (2L, "zzz qqq xxx " + a), (3L, "totally different words here"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("spec"))
      .withColumn("n_chars", length($"text").cast("bigint"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val dups = graft.queries.LlmOps.cdcChunkDedup(spark, dir).collect()
    assert(dups.nonEmpty, "no chunk re-synchronized after the insertion")
    // every reported duplicate has >= 2 occurrences and first_doc is doc 1
    dups.foreach { r =>
      assert(r.getLong(2) >= 2L)
      assert(r.getLong(3) === 1L)
    }
  }

  test("b-bit estimate: correction arithmetic, monotonicity, and a live spread") {
    import org.apache.spark.sql.functions.col
    val rows = graft.queries.LlmOps.bbitMinhashEstimate(spark, sf).collect()
      .map(r => (r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (m, est, _) =>
      assert(m >= 0 && m <= 16)
      val want = BigDecimal((m.toDouble / 16 - 0.0625) / 0.9375)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(est == want, s"est $est != corrected $want for m=$m")
    }
    // full-match pairs read exactly 1.0 after correction
    rows.filter(_._1 == 16).foreach { case (_, est, _) => assert(est == 1.0) }
    // the face is live on this corpus: the match spectrum is not a point
    assert(rows.map(_._1).distinct.length >= 3,
      s"match spectrum collapsed: ${rows.map(_._1).distinct.toSeq}")
  }
}
