package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Aho-Corasick kernel: nested/overlapping match semantics, the
  * brute-force ground truth on the real corpus, and the expression
  * round trip.
  */
class AhoAutomatonSpec extends SparkSpec {

  private def counts(pats: Seq[String], text: String): Seq[Long] =
    new AhoAutomaton(pats.toArray)
      .countAll(text.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toSeq

  private def brute(text: String, p: String): Long = {
    var c = 0L; var i = text.indexOf(p)
    while (i >= 0) { c += 1; i = text.indexOf(p, i + 1) }
    c
  }

  test("nested patterns all fire at one end position via the suffix chain") {
    assert(counts(Seq("an", "can", "scan"), "scan") === Seq(1L, 1L, 1L))
    assert(counts(Seq("an", "can", "scan"), "a scan can ban") ===
      Seq(3L, 2L, 1L))
  }

  test("overlapping occurrences are all counted") {
    assert(counts(Seq("aa"), "aaaa") === Seq(3L))
    assert(counts(Seq("aba"), "ababa") === Seq(2L))
  }

  test("phrases cross token boundaries; empty text counts zero; duplicates rejected") {
    assert(counts(Seq("hash join", "join"), "a hash join b") === Seq(1L, 1L))
    assert(counts(Seq("x", "yz"), "") === Seq(0L, 0L))
    intercept[IllegalArgumentException](new AhoAutomaton(Array("a", "a")))
    intercept[IllegalArgumentException](new AhoAutomaton(Array("a", "")))
  }

  test("maskAll: span union masked exactly, nothing else touched, masked text has zero residual hits") {
    def mask(pats: Seq[String], text: String): String =
      new String(new AhoAutomaton(pats.toArray).maskAll(
        text.getBytes(java.nio.charset.StandardCharsets.UTF_8), '#'.toByte),
        java.nio.charset.StandardCharsets.UTF_8)
    // nested chain: masking "scan" must cover the embedded can/an too
    assert(mask(Seq("an", "can", "scan"), "a scan here") === "a #### here")
    // overlapping spans merge ("aba" twice in "ababa" covers all 5)
    assert(mask(Seq("aba"), "xababax") === "x#####x")
    // cross-token phrase masks the space too; neighbors untouched
    assert(mask(Seq("hash join"), "a hash join b") === "a ######### b")
    // union with a longer doc: brute-force position marking agrees
    val pats = graft.queries.LlmOps.blocklistPatterns
    val texts = graft.Tables.load(spark, sf, "documents")
      .select("text").collect().map(_.getString(0))
    assert(texts.forall(!_.contains('#')), "corpus contains the mask char")
    texts.take(100).foreach { t =>
      val covered = Array.fill(t.length)(false)
      pats.foreach { p =>
        var i = t.indexOf(p)
        while (i >= 0) { (i until i + p.length).foreach(covered(_) = true)
          i = t.indexOf(p, i + 1) }
      }
      val want = t.zipWithIndex.map { case (c, i) =>
        if (covered(i)) '#' else c }.mkString
      assert(mask(pats, t) === want)
      // and the masked text can contain no surviving pattern
      assert(pats.forall(p => !want.contains(p)))
    }
  }

  test("maskedCount ≡ span-union size, exact on text already containing the mask char") {
    val pats = Seq("an", "can", "scan", "hash join")
    val auto = new AhoAutomaton(pats.toArray)
    def cnt(t: String): Long =
      auto.maskedCount(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(cnt("a scan here") === 4L)       // nested chain, one span
    assert(cnt("a hash join b") === 9L)     // cross-token phrase
    assert(cnt("no hits") === 0L)
    // the trap the '#'-count formulation falls into: pre-existing '#'
    // must NOT count as masked
    assert(cnt("## a scan ##") === 4L)
    assert(cnt("####") === 0L)
    // against brute-force position marking + corpus texts (incl. a
    // synthetic '#'-bearing mutation of each)
    val texts = graft.Tables.load(spark, sf, "documents")
      .select("text").collect().map(_.getString(0)).take(50)
    (texts ++ texts.map("###" + _ + "#")).foreach { t =>
      val covered = Array.fill(t.length)(false)
      pats.foreach { p =>
        var i = t.indexOf(p)
        while (i >= 0) { (i until i + p.length).foreach(covered(_) = true)
          i = t.indexOf(p, i + 1) }
      }
      assert(cnt(t) === covered.count(identity).toLong)
    }
    // expression path round-trips the kernel
    val viaExpr = graft.Tables.load(spark, sf, "documents")
      .select(GraftFunctions.acMaskedCount(col("text"), pats).as("h"))
      .agg(sum("h")).collect()(0).getLong(0)
    val fullTexts = graft.Tables.load(spark, sf, "documents")
      .select("text").collect().map(_.getString(0))
    assert(viaExpr === fullTexts.map(t =>
      cnt(t)).sum)
  }

  test("kernel ≡ brute force for every face pattern over the real corpus") {
    val pats = graft.queries.LlmOps.blocklistPatterns
    val auto = new AhoAutomaton(pats.toArray)
    val texts = graft.Tables.load(spark, sf, "documents")
      .select("text").collect().map(_.getString(0))
    assert(texts.nonEmpty)
    val agg = new Array[Long](pats.length)
    texts.foreach { t =>
      val got = auto.countAll(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      pats.indices.foreach { i =>
        assert(got(i) === brute(t, pats(i)), s"mismatch on '${pats(i)}'")
        agg(i) += got(i)
      }
    }
    assert(agg.exists(_ > 0), "face patterns never hit — degenerate")
    // and the expression path agrees with the raw kernel aggregate
    val viaExpr = graft.Tables.load(spark, sf, "documents")
      .select(posexplode(GraftFunctions.acCounts(col("text"), pats))
        .as(Seq("pid", "hits")))
      .groupBy("pid").agg(sum("hits").as("h"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    pats.indices.foreach(i => assert(viaExpr(i) === agg(i)))
  }
}
