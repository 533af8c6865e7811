package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew and co-location tools for cluster-scale joins/aggregations.
  *
  * AQE's skew-join split (on by default) handles moderate skew at runtime;
  * these are the explicit levers for the pathological cases AQE can't fix —
  * a hot grouping key that overwhelms one task, or a repeated fact⋈fact
  * join worth pre-bucketing so neither side ever shuffles.
  */
object Skew {

  /** Per-row salt in [0, salts): positional, not content-hashed — a hot key
    * usually repeats IDENTICAL rows, which a whole-row hash would all send
    * to one salt. monotonically_increasing_id is partition+offset based, so
    * task retries reproduce the same assignment (no RNG).
    */
  private def rowSalt(salts: Int): Column =
    pmod(monotonically_increasing_id(), lit(salts))

  /** Two-phase salted aggregation: partial count/sum per (key, salt) —
    * `salts` modest-sized tasks instead of one giant one — then final
    * re-aggregation per key.
    */
  def saltedCountSum(df: DataFrame, keys: Seq[String], sumCol: String,
                     salts: Int = 16): DataFrame = {
    val partial = df
      .withColumn("_salt", rowSalt(salts))
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(count(lit(1)).as("_n"), sum(col(sumCol)).as("_s"))
    partial.groupBy(keys.map(col): _*)
      .agg(sum(col("_n")).as("n"), sum(col("_s")).as(s"sum_$sumCol"))
  }

  /** Salted equi-join for a skewed probe side: the build side is replicated
    * `salts` times (build must be small enough to replicate but too big /
    * unwanted to broadcast), the probe side salts deterministically, and
    * the join key becomes (key, salt) — the hot key's rows land in `salts`
    * different tasks.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
                 salts: Int = 16, joinType: String = "inner"): DataFrame = {
    // Probe-preserving join types only. The build side is replicated once
    // per salt, so a right/full outer join would emit `salts` null-extended
    // duplicates for every unmatched build row — silently wrong results,
    // not just a bad plan. (left/semi/anti are safe: each probe row carries
    // exactly one salt, and every build key exists under every salt.)
    val allowed = Set("inner", "left", "leftouter", "leftsemi", "semi", "leftanti", "anti")
    require(allowed(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin: joinType '$joinType' would duplicate unmatched build rows " +
        s"(build is replicated ${salts}x); use inner/left/semi/anti")
    val saltedProbe = probe.withColumn("_salt", rowSalt(salts))
    val replicated = build
      .withColumn("_salt", explode(sequence(lit(0L), lit(salts - 1L))))
    saltedProbe.join(replicated, keys :+ "_salt", joinType).drop("_salt")
  }

  /** Co-located join via bucketed tables: both sides are written bucketed +
    * sorted on the join key, so the join compiles to a sort-merge over
    * pre-bucketed scans with NO shuffle exchange on either side. This is
    * the pattern for a fact⋈fact join repeated across many queries — pay
    * the bucketing write once, join shuffle-free forever after.
    */
  def bucketedJoin(spark: SparkSession, left: DataFrame, right: DataFrame,
                   key: String, buckets: Int, tablePrefix: String,
                   joinType: String = "inner"): DataFrame = {
    def save(df: DataFrame, name: String): DataFrame = {
      df.write.mode("overwrite")
        .bucketBy(buckets, key).sortBy(key)
        .option("path", s"${spark.conf.get("spark.sql.warehouse.dir")}/$name")
        .saveAsTable(name)
      spark.table(name)
    }
    val l = save(left, s"${tablePrefix}_l")
    val r = save(right, s"${tablePrefix}_r")
    l.join(r, Seq(key), joinType)
  }
}
