package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One-off decomposition of the sim_ann_pq_adc warm cost (round 16 —
  * the checkpoint-truncation regression hunt). MarginProbe discipline:
  * a measurement main, not a gate.
  */
object AdcProbe {
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
    def t(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[adcprobe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      ScratchCache.drain()
    }
    for (p <- 1 to 3)
      t(s"gate:pq_adc/$p")(VectorOps.ivfQueries("sim_ann_pq_adc")(s, dir))
    val codes = CorpusCache.getOrBuild(s, s"pqcodes:$dir")(sys.error("cached"))
    println(s"[adcprobe] codes parts=${codes.rdd.getNumPartitions} rows=${codes.count()}")
    t("warm:codes_scan")(codes)
    s.stop()
  }
}
