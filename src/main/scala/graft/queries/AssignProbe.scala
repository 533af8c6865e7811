package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Assignment-stage diagnostic: builds ONE of the shared IVF assignments
  * (`flat` | `coarse` | `imi`) over a corpus dir, noop-sinks it, and
  * prints wall seconds plus cell-population stats (distinct keys, max
  * cell, Σ within-cell pairs). This is how the round-9 10⁷ probe
  * decomposed the `sim_ann_ivf_coarse` wall into assignment vs
  * pair-verification terms and caught the starved-codebook cliff
  * (keys=9041/max=47900/pairs=7.1e10 under the dense-id seed filter vs
  * 19532/3678/1.1e10 after the hash-ranked codebook — SCALE.md).
  *
  * Usage: `sbt "runMain graft.queries.AssignProbe <sfDir> <scheme>"`.
  */
object AssignProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master(
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "8388608")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    VectorOps.register(s)
    val t0 = System.nanoTime()
    val assign = args(1) match {
      case "flat"   => VectorOps.sharedIvfAssign(s, dir)
      case "coarse" => VectorOps.sharedCoarseAssign(s, dir)
      case "imi"    => VectorOps.sharedImiAssign(s, dir)
      case other    => sys.error(s"unknown scheme: $other")
    }
    val stats = assign.groupBy(col("ck")).count()
      .agg(count(lit(1)).as("n_keys"), sum(col("count")).as("n_rows"),
        max(col("count")).as("max_key"),
        sum(col("count") * (col("count") - 1) / 2).as("n_pairs"))
      .collect()(0)
    // pairs is DOUBLE: integral `/` promotes, so the sum is a double —
    // read it as one (the erased BigDecimal cast only ever "worked"
    // because string interpolation never checks it)
    println(f"[assignprobe] scheme=${args(1)} wall=${(System.nanoTime() - t0) / 1e9}%.1f s " +
      s"keys=${stats.getLong(0)} rows=${stats.getLong(1)} max=${stats.getLong(2)} " +
      s"pairs=${stats.getDouble(3)}")
    ScratchCache.drain()
    s.stop()
  }
}
