package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-pipeline primitives for large-scale training-data curation:
  * tokenization, word shingles, portable 60-bit content hashing. Everything
  * is a pure Column expression (codegen-friendly, no UDFs) with a DuckDB
  * SQL twin for oracle parity.
  */
object TextFns {

  /** Whitespace tokens of the trimmed text. */
  def wsTokens(text: Column): Column = split(trim(text), "\\s+")

  /** Space-split tokens (no trim/regex — for shingling parity with the
    * oracle's string_split).
    */
  def rawTokens(text: Column): Column = split(text, " ")

  /** Distinct word 3-gram shingles from a PRE-SPLIT token array. Empty
    * array when fewer than 3 tokens — guarded explicitly because Spark's
    * `sequence(0, n)` flips direction for negative n instead of returning
    * empty.
    *
    * The token argument MUST reach this lambda as a bound attribute (a
    * `.select(..., rawTokens(text).as("toks"))` projection boundary at the
    * call site), never as an inline `split(...)` expression: higher-order
    * lambdas re-evaluate captured non-lambda subexpressions PER ELEMENT
    * and fall outside whole-stage codegen, so an inlined split runs
    * 3·(n_tokens−2) times per row — measured as a 348 s vs ~10 s cliff on
    * a 500k-doc corpus (round-8 SCALE.md adjudication).
    */
  def shingles3FromTokens(toks: Column): Column =
    when(size(toks) >= 3,
      array_distinct(transform(sequence(lit(0), size(toks) - 3), i =>
        concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2), element_at(toks, i + 3)))))
      .otherwise(array().cast(ArrayType(StringType)))

  /** Convenience spelling of [[shingles3FromTokens]] over raw text — ONLY
    * for row-scoped/small inputs: the inline split re-evaluates per lambda
    * element (see the warning above). Corpus-scale scans must pre-project
    * the tokens.
    */
  def shingles3(text: Column): Column = shingles3FromTokens(rawTokens(text))

  /** Portable 60-bit hash — delegates to the single definition in
    * [[Keys.md5Key64]] so the Spark and DuckDB spellings that must stay
    * bit-identical live in exactly one place.
    */
  def md5Hash60(c: Column): Column = Keys.md5Key64(c)

  def md5Hash60Sql(expr: String): String = Keys.md5Key64Sql(expr)

  /** Occurrence count of tokens found in a fixed vocabulary list. */
  def vocabHits(tokens: Column, vocab: Seq[String]): Column =
    size(filter(tokens, t => t.isin(vocab.map(lit(_)): _*)))

  def vocabHitsSql(tokensExpr: String, vocab: Seq[String]): String = {
    val list = vocab.map(v => s"'$v'").mkString(", ")
    s"len(list_filter($tokensExpr, t -> t IN ($list)))"
  }
}
