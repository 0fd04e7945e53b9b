package graft.functions

import org.apache.spark.sql.Column

/** Column-level API over the graft custom expressions. */
object GraftFunctions {

  /** Distinct word n-gram shingles (first-occurrence order) — codegen'd
    * replacement for the transform/slice/array_distinct HOF chain.
    */
  def wordShingles(text: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), n))

  /** 60-bit md5-derived SimHash signature — codegen'd replacement for the
    * aggregate/transform vote loop.
    */
  def simhash60(text: Column): Column =
    ColumnBridge.column(SimHash60(ColumnBridge.expression(text)))
}
