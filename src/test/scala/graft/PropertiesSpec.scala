package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.dv3f.{Dv3fConfig, Reshape, Upsert}
import graft.ops.Dedup

/** ScalaCheck properties promised by SURVEY.md §5:
  *  - unpivot ∘ pivot identity on non-null wide data
  *  - upsert idempotence and last-writer-wins
  *  - uid determinism/injectivity over the key space
  *  - custom codegen expressions ≡ the built-in HOF formulations they
  *    replaced (bit-exactness regression guard)
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic property driver: N samples of `gen` via fixed seeds
    * (raw ScalaCheck Gen — scalatestplus isn't a declared dependency).
    */
  private def forAllSeeded[A](gen: Gen[A], n: Int = 20)(body: A => Unit): Unit = {
    val params = Gen.Parameters.default
    (1 to n).foreach { i => body(gen.pureApply(params, Seed(i.toLong))) }
  }

  private val word = Gen.oneOf("the", "quick", "brown", "fox", "über",
    "déjà", "x1", "y2", "09", "a")
  private val text: Gen[String] = for {
    n <- Gen.choose(0, 12)
    ws <- Gen.listOfN(n, word)
    sep <- Gen.oneOf(" ", "  ", " \t ")
  } yield ws.mkString(sep)

  test("property: WordShingles ≡ HOF transform/slice/array_distinct formulation") {
    def hofShingles(c: org.apache.spark.sql.Column, n: Int) = {
      val toks = split(trim(c), "\\s+")
      array_distinct(filter(
        transform(toks, (_, i) => when(i <= size(toks) - n,
          concat_ws(" ", slice(toks, i + 1, lit(n))))),
        s => s.isNotNull))
    }
    forAllSeeded(Gen.listOfN(20, text), n = 10) { texts =>
      val df = texts.toDF("t")
      val got = df.select(hofShingles(col("t"), 3).as("h"),
        Dedup.shingles(col("t"), 3).as("k")).collect()
      got.foreach(r => assert(r.getSeq[String](0) === r.getSeq[String](1)))
    }
  }

  test("property: WordShingleHashes ≡ hash60 over WordShingles (byte-level kernel parity)") {
    // the byte-level kernel re-implements trim/split/gram/md5 on UTF-8
    // bytes; this pins it to the String-based reference formulation on
    // adversarial inputs: leading/trailing non-space whitespace (which
    // split(-1) turns into EMPTY edge tokens), multi-byte UTF-8, empty
    // and whitespace-only strings
    val edgy: Gen[String] = for {
      pre <- Gen.oneOf("", " ", "\t", "\n", " \t")
      n <- Gen.choose(0, 12)
      ws <- Gen.listOfN(n, word)
      sep <- Gen.oneOf(" ", "  ", " \t ", "\n")
      post <- Gen.oneOf("", " ", "\t", "\r\n")
    } yield pre + ws.mkString(sep) + post
    forAllSeeded(Gen.listOfN(25, edgy), n = 10) { texts =>
      val rows = texts.toDF("t").select(
        graft.functions.GraftFunctions.wordShingleHashes(col("t"), 3).as("fast"),
        transform(Dedup.shingles(col("t"), 3),
          s => Dedup.hash60(s)).as("ref")).collect()
      rows.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
    }
    // the positional sibling against the chunk-string formulation it
    // replaced (full-length windows, position order, duplicates kept)
    forAllSeeded(Gen.listOfN(25, edgy), n = 6) { texts =>
      val toksCol = split(trim(col("t")), "\\s+")
      val rows = texts.toDF("t").select(
        graft.functions.GraftFunctions.tokenGramHashes(col("t"), 3).as("fast"),
        transform(graft.functions.GraftFunctions
            .tokenChunks(col("t"), window = 3, stride = 1),
          s => Dedup.hash60(s)).as("refAll"),
        size(toksCol).as("m")).collect()
      rows.foreach { r =>
        val fast = r.getSeq[Long](0)
        val m = r.getInt(2)
        val refAll = if (r.isNullAt(1)) Seq.empty[Long] else r.getSeq[Long](1)
        val ref = refAll.take(math.max(0, m - 3 + 1))
        assert(fast === ref, s"m=$m")
      }
    }
    // and the md5 core directly against MessageDigest semantics,
    // across the single-block/two-block padding boundary (55/56 bytes)
    // and multi-block lengths
    (0 to 200).foreach { len =>
      val s = ("abcdefgh" * 26).take(len) + "é".take(if (len % 3 == 0) 1 else 0)
      val bytes = s.getBytes("UTF-8")
      assert(graft.functions.GraftMd5.hash60(bytes, 0, bytes.length) ===
        graft.functions.GraftStrings.hash60(s), s"len=$len")
    }
  }

  test("property: RepetitionStats kernel ≡ independent Scala oracle") {
    // replicate the kernel's exact tokenization: ASCII-space trim (what
    // UTF8String.trim does), then java-regex \s+ split
    def toks(text: String): Array[String] =
      text.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ')
        .reverse.split("\\s+", -1)
    def expected(text: String, nS: Int, nL: Int) = {
      val t = toks(text)
      def grams(n: Int) = (0 to t.length - n).map(i => t.slice(i, i + n).mkString(" "))
      val gs = grams(nS); val gl = grams(nL)
      (if (gs.isEmpty) None
       else Some(gs.groupBy(identity).values.map(_.size).max.toDouble / gs.size),
       if (gs.isEmpty) None
       else Some(1 - gs.distinct.size.toDouble / gs.size),
       if (gl.isEmpty) None
       else Some(1 - gl.distinct.size.toDouble / gl.size))
    }
    forAllSeeded(Gen.listOfN(12, text), n = 10) { texts =>
      val rep = graft.functions.GraftFunctions.repetitionStats(col("t"), 2, 4)
      val rows = texts.toDF("t").select(col("t"),
        rep.getField("top_frac"), rep.getField("dup_frac"),
        rep.getField("dup_large_frac")).collect()
      rows.foreach { r =>
        def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getDouble(i))
        assert((opt(1), opt(2), opt(3)) === expected(r.getString(0), 2, 4),
          s"text='${r.getString(0)}'")
      }
    }
  }

  test("property: TokenChunks ≡ HOF sequence/slice formulation; disjoint chunks rebuild the text") {
    def hofChunks(c: org.apache.spark.sql.Column, w: Int, s: Int) = {
      val toks = split(trim(c), "\\s+")
      transform(sequence(lit(0), size(toks) - 1, lit(s)),
        start => concat_ws(" ", slice(toks, start + 1, lit(w))))
    }
    forAllSeeded(Gen.listOfN(15, text), n = 8) { texts =>
      val df = texts.toDF("t")
      val got = df.select(graft.functions.GraftFunctions.tokenChunks(col("t"), 5, 2))
        .collect().map(_.getSeq[String](0))
      val want = df.select(hofChunks(col("t"), 5, 2)).collect().map(_.getSeq[String](0))
      assert(got.toSeq == want.toSeq)
      // stride == window → chunks are disjoint and rebuild the token stream
      val rebuilt = df.select(
        array_join(graft.functions.GraftFunctions.tokenChunks(col("t"), 4, 4), " "),
        array_join(split(trim(col("t")), "\\s+"), " "))
        .collect().map(r => (r.getString(0), r.getString(1)))
      rebuilt.foreach { case (a, b) => assert(a == b) }
    }
  }

  test("property: asofLeft ≡ brute-force latest-at-or-before per key") {
    val row = for {
      k <- Gen.oneOf("a", "b", "c")
      t <- Gen.choose(0L, 20L)
    } yield (k, t)
    val gen = for {
      ls <- Gen.listOfN(12, row)
      rs <- Gen.listOfN(12, row)
    } yield (ls.distinct, rs.distinct.map { case (k, t) => (k, t, k.hashCode + t) })
    forAllSeeded(gen, n = 12) { case (ls, rs) =>
      val left = ls.toDF("k", "t")
      val right = rs.toDF("k", "t", "v")
      val got = graft.ops.AsofJoin.asofLeft(left, right, "k", "t", Seq("v"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1),
          Option(r.get(2)).map(_.asInstanceOf[Long])))
        .sortBy(r => (r._1, r._2)).toSeq
      val want = ls.sorted.map { case (k, t) =>
        val m = rs.filter(r => r._1 == k && r._2 <= t)
        (k, t, m.sortBy(_._2).lastOption.map(_._3))
      }
      assert(got == want)
    }
  }

  test("property: asofLeftForward ≡ brute-force earliest-at-or-after per key") {
    val row = for {
      k <- Gen.oneOf("a", "b", "c")
      t <- Gen.choose(0L, 20L)
    } yield (k, t)
    val gen = for {
      ls <- Gen.listOfN(12, row)
      rs <- Gen.listOfN(12, row)
    } yield (ls.distinct, rs.distinct.map { case (k, t) => (k, t, k.hashCode + t) })
    forAllSeeded(gen, n = 12) { case (ls, rs) =>
      val left = ls.toDF("k", "t")
      val right = rs.toDF("k", "t", "v")
      val got = graft.ops.AsofJoin.asofLeftForward(left, right, "k", "t", Seq("v"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1),
          Option(r.get(2)).map(_.asInstanceOf[Long])))
        .sortBy(r => (r._1, r._2)).toSeq
      val want = ls.sorted.map { case (k, t) =>
        val m = rs.filter(r => r._1 == k && r._2 >= t)
        (k, t, m.sortBy(_._2).headOption.map(_._3))
      }
      assert(got == want)
    }
  }

  test("property: ngramJaccardPairs ≡ brute-force Jaccard over df-capped shingle sets") {
    val gen = for {
      nDocs <- Gen.choose(3, 10)
      texts <- Gen.listOfN(nDocs, for {
        n <- Gen.choose(3, 9)
        ws <- Gen.listOfN(n, word)
      } yield ws.mkString(" "))
      maxDf <- Gen.oneOf(2L, 3L, 1000L)
      thr <- Gen.oneOf(0.05, 0.3)
    } yield (texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }, maxDf, thr)
    forAllSeeded(gen, n = 15) { case (docs, maxDf, thr) =>
      val got = Dedup.ngramJaccardPairs(docs.toDF("doc_id", "text"),
        col("doc_id"), col("text"), n = 3, threshold = thr, maxDocFreq = maxDf)
        .collect()
        .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3))))
        .toMap
      // reference: distinct word 3-grams per doc, drop shingles in more
      // than maxDf docs, exact pairwise Jaccard on what remains
      val sets = docs.map { case (id, t) =>
        id -> t.trim.split("\\s+").filter(_.nonEmpty).sliding(3).filter(_.length == 3)
          .map(_.mkString(" ")).toSet
      }.toMap
      val df = sets.values.flatten.groupBy(identity).map { case (s, xs) => s -> xs.size }
      val kept = sets.map { case (id, s) => id -> s.filter(df(_) <= maxDf) }
      val want = (for {
        a <- docs.map(_._1); b <- docs.map(_._1) if a < b
        inter = (kept(a) intersect kept(b)).size
        if inter > 0
        union = kept(a).size + kept(b).size - inter
        j = inter.toDouble / union if j >= thr
      } yield (a, b) -> (inter.toLong, j)).toMap
      assert(got == want, s"maxDf=$maxDf thr=$thr docs=$docs")
    }
  }

  test("property: binnedIntervalJoin ≡ brute-force BETWEEN join, any bin width") {
    val gen = for {
      pts <- Gen.listOfN(15, for {
        k <- Gen.oneOf("a", "b")
        t <- Gen.choose(0L, 100L)
      } yield (k, t))
      ivs <- Gen.listOfN(6, for {
        k <- Gen.oneOf("a", "b")
        lo <- Gen.choose(0L, 90L)
        len <- Gen.choose(0L, 40L)
      } yield (k, lo, lo + len))
      bin <- Gen.oneOf(1L, 7L, 10L, 64L)
    } yield (pts.distinct, ivs.distinct, bin)
    forAllSeeded(gen, n = 12) { case (pts, ivs, bin) =>
      val points = pts.map { case (k, t) => (k, new java.sql.Timestamp(t * 1000)) }
        .toDF("k", "t")
      val intervals = ivs.map { case (k, lo, hi) =>
        (k, new java.sql.Timestamp(lo * 1000), new java.sql.Timestamp(hi * 1000))
      }.toDF("k", "lo", "hi")
      val got = graft.ops.RangeJoin
        .binnedIntervalJoin(points, intervals, "k", "t", "lo", "hi", bin)
        .collect()
        .map(r => (r.getString(0), r.getTimestamp(1).getTime / 1000,
          r.getTimestamp(2).getTime / 1000, r.getTimestamp(3).getTime / 1000))
        .sorted.toSeq
      val want = (for {
        (pk, pt) <- pts
        (ik, lo, hi) <- ivs
        if pk == ik && pt >= lo && pt <= hi
      } yield (pk, pt, lo, hi)).sorted
      assert(got == want)
    }
  }

  test("property: SimHash60 ≡ HOF vote-loop formulation") {
    def hofSimHash(c: org.apache.spark.sql.Column) = {
      val hs = transform(split(trim(c), "\\s+"),
        t => conv(substring(md5(t), 1, 15), 16, 10).cast(LongType))
      val votes = aggregate(hs, array_repeat(lit(0L), 60),
        (acc, h) => transform(acc, (v, i) =>
          v + call_function("shiftright", h, i).bitwiseAND(1L) * 2L - 1L))
      aggregate(
        transform(votes, (v, i) =>
          when(v > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
        lit(0L), (acc, bit) => acc.bitwiseOR(bit))
    }
    forAllSeeded(Gen.listOfN(10, text), n = 6) { texts =>
      val df = texts.toDF("t")
      val got = df.select(Dedup.simHash(col("t"))).collect().map(_.getLong(0))
      val want = df.select(hofSimHash(col("t"))).collect().map(_.getLong(0))
      assert(got.toSeq == want.toSeq)
    }
  }

  test("property: MinHashSig ≡ explode+groupBy formulation") {
    forAllSeeded(Gen.listOfN(15, text), n = 6) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "t")
      val got = Dedup.minHash(df, col("doc_id"), col("t"), 3, 16)
        .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
      // the pre-kernel formulation: explode shingles, 16 min-aggs
      val exploded = df.select(col("doc_id"),
          explode(Dedup.shingles(col("t"), 3)).as("shingle"))
        .withColumn("h", pmod(Dedup.hash60(col("shingle")), lit(Dedup.minhashP)))
      val aggs = Dedup.minhashParams(16).zipWithIndex.map { case ((a, b), i) =>
        min(pmod(col("h") * a + b, lit(Dedup.minhashP))).as(s"m$i")
      }
      val want = exploded.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
        .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
      assert(got == want)
    }
  }

  test("property: unpivot ∘ pivot is the identity on non-null wide rows") {
    val metric = Gen.choose(0.0, 1e6).map(v => math.rint(v * 100) / 100)
    val row = for {
      annee <- Gen.oneOf("2018", "2019", "2020")
      dep <- Gen.oneOf("44", "85")
      m1 <- metric; m2 <- metric
    } yield (annee, dep, s"lib$dep", m1, m2)
    forAllSeeded(Gen.listOfN(8, row), n = 8) { rows0 =>
      val rows: List[(String, String, String, Double, Double)] =
        rows0.distinctBy(r => (r._1, r._2))
      val wide = rows.toDF("annee", "dep", "libdep",
        "valeurfonc_sum_cod1", "pxm2_median_cod1")
      val long = Reshape.unpivotWide(wide, Seq("annee", "dep", "libdep"))
      val back = long.groupBy("annee", "dep", "libdep")
        .pivot("cod_full", Seq("valeurfonc_sum_cod1", "pxm2_median_cod1"))
        .agg(first(col("valeur"), ignoreNulls = true))
      val got = back.select("annee", "dep", "libdep",
        "valeurfonc_sum_cod1", "pxm2_median_cod1")
        .collect().map(_.toSeq).toSet
      assert(got == rows.map(t => Seq(t._1, t._2, t._3, t._4, t._5)).toSet)
    }
  }

  test("property: upsert is idempotent and last-writer-wins on uid") {
    val table = Dv3fConfig.departement
    val base = Files.tmpDir("prop_upsert")
    val batch = Seq(
      ("u1", "2019", "85", "V", "111", 1L),
      ("u2", "2019", "85", "V", "121", 2L))
      .toDF("uid", "annee", "dep", "libdep", "cod", "nbtrans")
    val overwrite = Seq(("u1", "2020", "85", "V", "111", 9L))
      .toDF("uid", "annee", "dep", "libdep", "cod", "nbtrans")

    Upsert.upsertByName(spark, base, batch, table)
    Upsert.upsertByName(spark, base, batch, table) // idempotent
    assert(Upsert.read(spark, base).count() == 2)
    Upsert.upsertByName(spark, base, overwrite, table)
    val rows = Upsert.read(spark, base)
      .select("uid", "annee", "nbtrans").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(rows == Set(("u1", "2020", 9L), ("u2", "2019", 2L)))
  }

  test("property: uid is deterministic and injective over distinct key triples") {
    val key = for {
      annee <- Gen.oneOf("2018", "2019", "2020", "2021")
      code <- Gen.oneOf("01", "2A", "85", "976")
      cod <- Gen.oneOf("111", "121", "1")
    } yield (annee, code, cod)
    forAllSeeded(Gen.listOfN(12, key), n = 10) { keys =>
      val df = keys.toDF("annee", "dep", "cod")
      val uids = Reshape.withUid(df, Dv3fConfig.departement)
        .select("uid").collect().map(_.getString(0))
      val again = Reshape.withUid(df, Dv3fConfig.departement)
        .select("uid").collect().map(_.getString(0))
      assert(uids.toSeq == again.toSeq) // deterministic
      assert(uids.distinct.length == keys.distinct.size) // injective on keys
    }
  }
}

private object Files {
  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"
}
