package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.TextFns

/** Deterministic anchor sampling for the ground-truth fixtures — the way
  * production recall estimation scales: exact truth is computed for a
  * bounded set of ANCHOR records (each anchor still compared against the
  * FULL corpus — O(s·n)) instead of all pairs (O(n²)). A recall/metric
  * fixture that is itself quadratic cannot govern the operator it audits at
  * 100× the corpus; an anchored one costs a constant multiple of one corpus
  * scan forever.
  *
  * Selection is the engine's standard content-hash discipline (no RNG —
  * reproducible across runs/engines/topology), and the anchor COUNT, not
  * fraction, is the constant: the modulus derives from the universe size as
  * a broadcast 1-row aggregate (the IVF derived-k pattern, no driver
  * action), so expected anchors ≈ [[TargetAnchors]] at any scale —
  * 10⁹ vectors still yield ~128 anchors, and the truth side stays ~128
  * corpus comparisons. Below [[TargetAnchors]] records the modulus clamps
  * to 1 and every record is an anchor — tiny fixtures keep their full
  * exact truth (and the sf0.001 invariant specs their exact semantics).
  *
  * Division by 128 = 2⁷ is exact in binary floating point, so the floor'd
  * modulus can never straddle an engine difference; the hash is the shared
  * portable md5-60 ([[TextFns.md5Hash60]]) both engines already prove
  * bit-identical under dozens of gates.
  */
object AnchorSample {

  val TargetAnchors = 128.0d

  /** Adds `is_anchor` to `df`: true iff md5₆₀("anchor:" + id) ≡ 0 modulo
    * greatest(1, ⌊n / TargetAnchors⌋), n = row count of `df` (computed as a
    * broadcast 1-row aggregate — the plan stays fully declarative).
    */
  def withAnchors(df: DataFrame, idCol: Column): DataFrame = {
    val n = df.agg(count(lit(1)).as("n_univ"))
    df.crossJoin(broadcast(n))
      .withColumn("is_anchor",
        TextFns.md5Hash60(concat(lit("anchor:"), idCol))
          % greatest(lit(1L), floor(col("n_univ") / lit(TargetAnchors)).cast(LongType)) === 0)
      .drop("n_univ")
  }

  /** DuckDB twin of the modulus: a 1-row CTE body over `universeCte`. */
  def modSql(universeCte: String): String =
    s"SELECT greatest(1, CAST(floor(count(*) / $TargetAnchors) AS BIGINT)) AS md FROM $universeCte"

  /** DuckDB twin of the anchor predicate (expects `md` in scope). */
  def predSql(idExpr: String): String =
    s"${TextFns.md5Hash60Sql(s"concat('anchor:', $idExpr)")} % md = 0"
}
