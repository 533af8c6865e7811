package graft.queries

import org.apache.spark.sql.SparkSession

/** Prints the optimizer's size estimate for checkpoint-truncated cache
  * entries and the join strategies a shingle-family consumer plans over
  * them (round 16 — the broadcast-decision regression hunt).
  */
object StatsProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master(
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "8388608")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    val sh = TextOps.sharedShingleIndex(s, dir)
    println(s"[statsprobe] shingles stats=${sh.queryExecution.optimizedPlan.stats.sizeInBytes}")
    println(s"[statsprobe] shingles parts=${sh.rdd.getNumPartitions} rows=${sh.count()}")
    def t(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[statsprobe] $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      ScratchCache.drain()
    }
    t("warm:sh_scan")(sh)
    for (p <- 1 to 3)
      t(s"dedup_incremental/$p")(TextOps.queries("dedup_incremental")(s, dir))
    for (p <- 1 to 2)
      t(s"dedup_ngram_jaccard/$p")(TextOps.queries("dedup_ngram_jaccard")(s, dir))
    s.stop()
  }
}
