package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** TermFreqs kernel contract: result(i) == tf of terms(i) and
  * result(last) == token count, under exactly the split(trim, "\s+")
  * token boundaries the rest of the text family uses.
  */
class TermFreqsSpec extends SparkSpec {
  import spark.implicits._

  private val terms = Seq("join", "hash", "scan")

  test("kernel equals the split-based recompute on crafted edges") {
    val cases = Seq(
      "join hash join scan",        // repeats
      "  join\thash \n scan  ",     // mixed \s separators + edge space
      "joinx xjoin jo in",          // near-misses never match
      "join",                       // single token
      "",                           // empty -> [""], count 1, no tf
      "   ",                        // spaces only -> trim -> ""
      "überjoin join über hash",    // multi-byte UTF-8 neighbors
      "a b c d e f g h",
      "join\t",                     // trailing \t survives space-only trim
      "join\n",                     //   -> ["join", ""], count 2
      "hash scan\r",                // trailing \r after a real token pair
      "\tjoin")                     // leading edge: ["", "join"], count 2
    val got = cases.toDF("text")
      .select(GraftFunctions.termFreqs(col("text"), terms).as("tfv"))
      .collect().map(_.getSeq[Int](0))
    cases.zip(got).foreach { case (text, tfv) =>
      // SQL trim() (and UTF8String.trim) strips ASCII space ONLY — Java
      // String.trim would also eat \t/\n/\r and mask the edge tokens.
      val toks = text.replaceAll("\\A +", "").replaceAll(" +\\z", "")
        .split("\\s+", -1)
      val want = terms.map(t => toks.count(_ == t)) :+ toks.length
      assert(tfv == want, s"text '$text': got $tfv want $want")
    }
  }

  test("kernel equals explode+isin tf build and tokenCount over real documents") {
    val docs = graft.Tables.load(spark, sf, "documents").limit(500)
    val kernel = docs
      .select(col("doc_id"), GraftFunctions.termFreqs(col("text"), terms).as("tfv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val reference = docs
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
      .collect().map { r =>
        val toks = r.getSeq[String](1)
        r.getLong(0) -> (terms.map(t => toks.count(_ == t)) :+ toks.size)
      }.toMap
    assert(kernel.keySet == reference.keySet)
    kernel.foreach { case (id, tfv) =>
      assert(tfv == reference(id), s"doc $id: kernel $tfv vs split ${reference(id)}")
    }
  }
}
