package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Governance-gate cost decomposition (round 14 — the round-13 verdict's
  * bench-cost item): times each shared build the two recall gates demand
  * (corpus twins, truth, anchors, the four index chains), then the warm
  * gates themselves, so the bench line's cost is attributable to a stage
  * instead of argued about. The MarginProbe discipline: a measurement
  * main whose numbers land in SCALE.md, not a gate.
  *
  * Usage: `tools/runmain.sh graft.queries.GovProbe <sfDir>`
  */
object GovProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master(
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "8388608")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    VectorOps.register(s)
    def t(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[govprobe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      ScratchCache.drain()
    }
    // cold shared builds, in gate demand order
    t("build:anntruth")(VectorOps.sharedAnnTruth(s, dir))
    t("build:annanchors")(VectorOps.sharedAnnAnchors(s, dir))
    t("build:lshsigs")(VectorOps.queries("sim_ann_lsh")(s, dir).limit(1))
    t("build:ivfcoarse")(VectorOps.sharedCoarseAssign(s, dir))
    t("build:ivfimi")(VectorOps.sharedImiAssign(s, dir))
    t("build:nttruth")(VectorOps.sharedNtTruth(s, dir))
    t("build:ntanchors")(VectorOps.sharedNtAnchors(s, dir))
    t("build:ivfcoarsent")(VectorOps.sharedCoarseAssignNt(s, dir))
    t("build:ivfimint")(VectorOps.sharedImiAssignNt(s, dir))
    // gates: cold-ish (builds cached) then fully warm
    for (pass <- 1 to 2) {
      t(s"gate:ann_recall/$pass")(VectorOps.ivfQueries("ann_recall")(s, dir))
      t(s"gate:neartwin/$pass")(VectorOps.ivfQueries("ann_recall_neartwin")(s, dir))
    }
    // warm sub-pieces of one gate arm, to attribute the residual
    val anchors = VectorOps.sharedNtAnchors(s, dir)
    val assign = VectorOps.sharedImiAssignNt(s, dir)
    println(s"[govprobe] assign storageLevel=${assign.storageLevel}")
    t("warm:assign_scan")(assign)
    t("warm:assign_explode")(assign
      .select(col("vec_id"), explode(col("probes")).as("pr")))
    t("cand:imint_probe")(VectorOps.probeAnchorCandidatesAt(
      assign, anchors, VectorOps.PROBE_MARGIN_T))
    t("cand:coarsent_anchor")(VectorOps.sharedCoarseAssignNt(s, dir)
      .join(anchors, Seq("vec_id"), "left_semi"))
    // warm per-arm joins of the ann_recall gate
    val truth = VectorOps.sharedAnnTruth(s, dir)
    for (k <- Seq("candivf", "candimi", "candlsh", "candmp")) {
      val cand = CorpusCache.getOrBuild(s, s"$k:$dir")(sys.error("must be cached"))
      val cachedNodes = cand.queryExecution.withCachedData.collect {
        case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r }
      println(s"[govprobe] $k rows=${cand.count()} level=${cand.storageLevel} " +
        s"topIsCached=${cand.queryExecution.withCachedData.isInstanceOf[
          org.apache.spark.sql.execution.columnar.InMemoryRelation]} imrNodes=${cachedNodes.size}")
      t(s"warm:scan_$k")(cand)
      t(s"warm:scan2_$k")(cand)
      if (k == "candimi" || k == "candivf")
        println(s"[govprobe-plan] $k:\n${cand.queryExecution.executedPlan.toString.take(4000)}")
      t(s"warm:join_$k")(truth.join(cand, Seq("i", "j"), "left").groupBy().count())
    }
    t("warm:gate_again")(VectorOps.ivfQueries("ann_recall")(s, dir))
    s.stop()
  }
}
