package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-node cost decomposition of the glamira_pipeline_e2e gate (round
  * 16): times each table materialization of the ModelGraph DAG, then the
  * whole gate twice. MarginProbe discipline: a measurement main, not a
  * gate.
  */
object E2eProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master(
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "8388608")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    def t(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[e2eprobe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      ScratchCache.drain()
    }
    // node-by-node: a fresh graph per round, resolving each table node in
    // dependency order so each timing isolates ONE materialization; round
    // 1 absorbs JVM/codegen warmup, round 2 is the signal
    for (round <- 1 to 2) {
      val g = GlamiraShaped.e2eGraph(s, dir)
      for (n <- Seq("customer_email_scd", "mart_dim_product",
          "mart_dim_customer", "mart_fact_order"))
        t(s"node:$n/$round")(g.resolve(n))
    }
    for (p <- 1 to 2)
      t(s"gate:e2e/$p")(GlamiraShaped.queries("glamira_pipeline_e2e")(s, dir))
    s.stop()
  }
}
