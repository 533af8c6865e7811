package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Band-split geometry diagnostic (round 15): measures, WITHOUT running
  * the pair join, what the (cell, band) join key can and cannot cut at a
  * given tier — the numbers the band design must be sized from rather
  * than guessed (the MarginProbe discipline). Prints, for the shared IMI
  * assignment's probe relation (home ∪ τ-gated regions):
  *
  *   - per-cell member angular extent (p50/p90 of max θ − min θ): the
  *     denominator of any window-based cut — the keep window is a FIXED
  *     ±acos(ANN_T) ≈ 2.56°, so the achievable candidate reduction is
  *     bounded by extent/window;
  *   - unbanded candidate volume (Σ cell size over probe rows) vs the
  *     quartile-band volume (what the shipped (cell, band) key actually
  *     materializes) vs the fine-bin window floor (W/8 bins — what an
  *     infinitely fine banding could reach);
  *   - the explode factor (avg bands joined per probe row) under the
  *     quartile scheme — the shuffle inflation the exploding SIDE pays,
  *     which is why the explode must ride the SMALLER side of the join.
  *
  * Usage: `tools/runmain.sh graft.queries.BandProbe <sfDir>`
  */
object BandProbe {
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
    val assign = VectorOps.sharedImiAssign(s, dir)
      .select(col("cell"), col("s1"), col("probes")).persist()

    val cw = 0.999 - 1e-9           // = ANN_T - BOUND_EPS
    val w = math.acos(cw)           // keep-window half-width in angle
    val members = assign.select(col("cell").as("pc"), col("s1").as("sv"),
      acos(least(lit(1.0d), greatest(lit(-1.0d), col("s1")))).as("tv"))

    // per-cell angular extent: how wide the member shell is vs the window
    val extent = members.groupBy(col("pc"))
      .agg((max(col("tv")) - min(col("tv"))).as("ext"), count(lit(1)).as("csz"))
    val ex = extent.agg(
      expr("percentile(ext, array(0.5, 0.9))").as("p"),
      avg(col("csz")).as("avgsz")).collect()(0)
    println(f"[bandprobe] dir=$dir window=±${math.toDegrees(w)}%.2f° " +
      f"cell_extent_deg p50=${math.toDegrees(ex.getSeq[Double](0).head)}%.2f " +
      f"p90=${math.toDegrees(ex.getSeq[Double](0)(1))}%.2f avg_cell=${ex.getDouble(1)}%.1f")

    // the probe relation: (pc, sr) for home and τ-admitted extra regions
    val probes = assign.select(col("cell").as("pc"), col("s1").as("sr"))
      .unionByName(assign
        .select(explode(col("probes")).as("pr"), col("s1"))
        .filter(col("pr").getField("mgn") <= lit(VectorOps.PROBE_MARGIN_T))
        .select(col("pr").getField("pc").as("pc"),
          (col("s1") - col("pr").getField("mgn")).as("sr")))
      .withColumn("snr", sqrt(greatest(lit(0.0d), lit(1.0d) - col("sr") * col("sr"))))
      .withColumn("lo", col("sr") * lit(cw) - col("snr") * lit(math.sqrt(1 - cw * cw)))
      .withColumn("hi", col("sr") * lit(cw) + col("snr") * lit(math.sqrt(1 - cw * cw)))

    // unbanded candidate volume: every probe row × its cell's full size
    val unb = probes.join(broadcast(extent.select(col("pc"), col("csz"))), Seq("pc"))
      .agg(count(lit(1)).as("nprobe"), sum(col("csz")).as("cand")).collect()(0)
    println(s"[bandprobe] probe_rows=${unb.getLong(0)} unbanded_cand=${unb.getLong(1)}")

    // quartile scheme, SHIPPED direction: the probe side carries its own
    // band (bandOf(sr)); each MEMBER row explodes over the bands its
    // window intersects — candidates = Σ over members of the probe-band
    // counts its [minb, maxb] covers; explode_avg is the member-side
    // row inflation the join's smaller side pays
    val bnd = assign.groupBy(col("cell").as("pc"))
      .agg(percentile(col("s1"), array(lit(0.25), lit(0.5), lit(0.75))).as("qs"))
    val pb = probes.join(broadcast(bnd), Seq("pc"))
      .withColumn("band",
        when(col("sr") > col("qs").getItem(2), lit(3))
          .when(col("sr") > col("qs").getItem(1), lit(2))
          .when(col("sr") > col("qs").getItem(0), lit(1)).otherwise(lit(0)))
      .groupBy(col("pc"), col("band")).agg(count(lit(1)).as("psz"))
    val sw = math.sqrt(1 - cw * cw)
    val mq = members.join(broadcast(bnd), Seq("pc"))
      .withColumn("snv", sqrt(greatest(lit(0.0d), lit(1.0d) - col("sv") * col("sv"))))
      .withColumn("mlo", col("sv") * lit(cw) - col("snv") * lit(sw))
      .withColumn("mhi", col("sv") * lit(cw) + col("snv") * lit(sw))
      .withColumn("minb",
        when(col("qs").getItem(0) >= col("mlo"), lit(0))
          .when(col("qs").getItem(1) >= col("mlo"), lit(1))
          .when(col("qs").getItem(2) >= col("mlo"), lit(2)).otherwise(lit(3)))
      .withColumn("maxb",
        when(col("qs").getItem(2) <= col("mhi"), lit(3))
          .when(col("qs").getItem(1) <= col("mhi"), lit(2))
          .when(col("qs").getItem(0) <= col("mhi"), lit(1)).otherwise(lit(0)))
    val q = mq.join(broadcast(pb), Seq("pc"))
      .withColumn("joined", col("band").between(col("minb"), col("maxb")))
      .agg(sum(when(col("joined"), col("psz")).otherwise(lit(0L))).as("cand"))
      .collect()(0)
    val expl = mq.agg(avg(col("maxb") - col("minb") + 1)).collect()(0).getDouble(0)
    println(f"[bandprobe] quartile_cand=${q.getLong(0)} member_explode_avg=$expl%.3f")

    // fine-bin window floor: members histogrammed at W/8; a probe row
    // admits bins overlapping [lo, hi] — what banding converges to
    val binw = w / 8.0
    val hist = members.withColumn("bin", floor(col("tv") / lit(binw)).cast("long"))
      .groupBy(col("pc"), col("bin")).agg(count(lit(1)).as("hsz"))
    val pf = probes
      .withColumn("tlo", acos(least(lit(1.0d), greatest(lit(-1.0d), col("hi")))))
      .withColumn("thi", acos(least(lit(1.0d), greatest(lit(-1.0d), col("lo")))))
      .withColumn("blo", floor(col("tlo") / lit(binw)).cast("long"))
      .withColumn("bhi", floor(col("thi") / lit(binw)).cast("long"))
    val f = pf.join(broadcast(hist), Seq("pc"))
      .filter(col("bin").between(col("blo"), col("bhi")))
      .agg(sum(col("hsz"))).collect()(0)
    println(s"[bandprobe] window_floor_cand=${f.getLong(0)}")
    println(f"[bandprobe] wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    assign.unpersist()
    ScratchCache.drain()
    s.stop()
  }
}
