package graft.ops

import graft.SparkSpec
import graft.ops.Bpe.Merge

/** BPE trainer: tier equivalence, the Sennrich hand example, the
  * adjacent-repeat merge-semantics trap, and the encode face's
  * invariants.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def wc(rows: (String, Long)*) = rows.toDF("w", "c")

  test("Sennrich hand example: first merges are (e,s) then (es,t) by count-then-lex order") {
    // the ACL 2016 paper's vocabulary. es and st both occur 9× (newest
    // ×6 + widest ×3); the (cnt DESC, a, b) total order picks (e,s)
    // first, after which (es,t) is the unique 9-count pair.
    val v = wc("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val got = Bpe.trainMerges(v, merges = 2, localThreshold = 1 << 18)
    assert(got === Seq(Merge(1, "e", "s", 9L), Merge(2, "es", "t", 9L)))
  }

  test("adjacent repeats merge like the reference symbol scan, in BOTH tiers") {
    // the trap: a shared-separator string encoding would leave 'aaaa'
    // as [aa, a, a] after round 1 because the replace consumes the
    // boundary the second pair needs. The barred encoding must give
    // [aa, aa], so round 2's top pair is (aa, aa) with count 3.
    val v = wc("aaaa" -> 3L)
    val expect = Seq(Merge(1, "a", "a", 9L), Merge(2, "aa", "aa", 3L))
    val local = Bpe.trainMerges(v, merges = 4, localThreshold = 1 << 18)
    val dist = Bpe.trainMerges(v, merges = 4, localThreshold = 0)
    // merges=4 but pairs exhaust after round 2 (one symbol left): both
    // tiers must stop at 2 rather than error or pad
    assert(local === expect)
    assert(dist === expect)
  }

  test("local and distributed tiers produce the identical fit on the corpus vocabulary") {
    val docs = graft.Tables.load(spark, sf, "documents")
    val v = docs
      .select(org.apache.spark.sql.functions.explode(
        TextAnalysis.tokens(org.apache.spark.sql.functions.col("text"))).as("w"))
      .filter(org.apache.spark.sql.functions.col("w").rlike("^[a-z]+$") &&
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("w")) >= 2)
      .groupBy("w").count().withColumnRenamed("count", "c")
    val local = Bpe.trainMerges(v, merges = 8, localThreshold = 1 << 18)
    val dist = Bpe.trainMerges(v, merges = 8, localThreshold = 0)
    assert(local.size === 8)
    assert(local === dist)
  }

  test("byte BPE: multi-byte characters round-trip, tiers agree, and é is two symbols the char face can't see") {
    // é = C3 A9, 😀 = F0 9F 98 80 — the class an ASCII corpus hides.
    // "éé" dominates: its (C3,A9) pair count 10×2 + "café😀"'s 2 = 22.
    val v = wc("éé" -> 10L, "café😀" -> 2L, "aa" -> 3L)
    val local = Bpe.trainMergesBytes(v, merges = 3, localThreshold = 1 << 18)
    val dist = Bpe.trainMergesBytes(v, merges = 3, localThreshold = 0)
    assert(local === dist)
    assert(local.head === Merge(1, "C3", "A9", 22L),
      s"é's UTF-8 byte pair must win round 1, got ${local.head}")
    // round-trip: applying the merges to a word's hex bytes and
    // concatenating the pieces back must reproduce the exact bytes —
    // multi-byte characters are never torn or corrupted
    def encodePieces(w: String, fit: Seq[Merge]): Seq[String] = {
      var syms = w.getBytes("UTF-8").map(b => f"${b & 0xff}%02X").toSeq
      fit.foreach { m =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == m.a && syms(i + 1) == m.b) {
            out += (m.a + m.b); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.toSeq
      }
      syms
    }
    Seq("éé", "café😀", "aa").foreach { w =>
      val pieces = encodePieces(w, local)
      val bytes = pieces.mkString.grouped(2)
        .map(Integer.parseInt(_, 16).toByte).toArray
      assert(new String(bytes, "UTF-8") === w,
        s"round-trip broke for $w via $pieces")
    }
    // the char FACE's [a-z] domain filter can't even see these words:
    // only "aa" survives it, so the fit is blind to é and the emoji
    assert(Bpe.trainMerges(v.filter($"w".rlike("^[a-z]+$")), 3, 1 << 18)
      === Seq(Merge(1, "a", "a", 3L)))
  }

  test("byte BPE ≡ char BPE on a pure-ASCII lowercase vocabulary (hex codes aside)") {
    // on [a-z] words UTF-8 bytes are chars, so the two faces must learn
    // the SAME merge structure with identical counts — byte symbols are
    // just the hex spelling of the char symbols.
    val v = wc("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    def hexOf(s: String) =
      s.getBytes("UTF-8").map(b => f"${b & 0xff}%02X").mkString
    val chars = Bpe.trainMerges(v, merges = 4, localThreshold = 1 << 18)
    val bytes = Bpe.trainMergesBytes(v, merges = 4, localThreshold = 1 << 18)
    assert(bytes === chars.map(m =>
      Merge(m.rank, hexOf(m.a), hexOf(m.b), m.cnt)))
  }

  test("byte encode: merges buy compression, pieces bounded by bytes, domain strictly wider than the char face's") {
    val e0 = Bpe.encodeStatsBytes(spark, sf, merges = 0).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val e8 = Bpe.encodeStatsBytes(spark, sf, merges = 8).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(e0.nonEmpty && e0.keySet === e8.keySet)
    e0.foreach { case (src, (words0, pieces0, bytes0)) =>
      val (words8, pieces8, bytes8) = e8(src)
      assert(words0 === words8 && bytes0 === bytes8)
      assert(pieces0 === bytes0) // 0 merges: every byte is a piece
      assert(pieces8 < pieces0)  // 8 merges bought real compression
      assert(pieces8 >= words8)
    }
    // the byte domain (every >=2-byte token) strictly contains the
    // char face's [a-z]-only trained domain on this corpus
    val charWords = Bpe.encodeStats(spark, sf, merges = 0).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    e0.foreach { case (src, (words, _, _)) =>
      assert(words >= charWords(src),
        s"$src: byte domain smaller than the filtered char domain")
    }
    // (on this all-[a-z] test corpus the domains coincide; the genuine
    // widening — é/emoji words the char face cannot see — is pinned on
    // the constructed vocabulary in the multi-byte round-trip test)
  }

  test("encode: pieces shrink monotonically with merges and never beat chars") {
    val e0 = Bpe.encodeStats(spark, sf, merges = 0).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val e8 = Bpe.encodeStats(spark, sf, merges = 8).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(e0.nonEmpty && e0.keySet === e8.keySet)
    e0.foreach { case (src, (words0, pieces0, chars0)) =>
      val (words8, pieces8, chars8) = e8(src)
      assert(words0 === words8 && chars0 === chars8) // merges change only pieces
      assert(pieces0 === chars0) // 0 merges: every char is a piece
      assert(pieces8 < pieces0) // 8 merges bought real compression
      assert(pieces8 >= words8) // a word is never fewer than 1 piece
    }
  }
}
