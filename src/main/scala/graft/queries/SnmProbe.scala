package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage decomposition diagnostic for `er_sorted_neighborhood` (round 11):
  * times the universe build, a single pass's rank table, a single full
  * pass, and the three-pass composition separately, so the family's
  * worst-scale-ratio adjudication rests on measured stage walls instead of
  * plan theory (the AssignProbe discipline).
  *
  * Usage: `sbt "runMain graft.queries.SnmProbe <sfDir>"`.
  */
object SnmProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master(
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "8388608")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = args(0)

    def t(label: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[snmprobe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
    }

    val clean = graft.Tables.part(s, dir).select(col("p_name").as("name")).distinct()
    val dirty2nd = clean.select(
      concat(substring(col("name"), 1, 1), expr("substring(name, 3)")).as("name"))
    val dirtyLast = clean.select(
      expr("substring(name, 1, length(name) - 1)").as("name"))
    val univ = clean.unionByName(dirty2nd).unionByName(dirtyLast).distinct()

    t("univ_build")(univ)
    val nUniv = univ.count()
    println(s"[snmprobe] n_univ = $nUniv")

    // one pass decomposed (forward-order sort key)
    val parted = univ.withColumn("sk", col("name"))
      .repartitionByRange(Analytics.snmPartCount(nUniv), col("sk"))
      .withColumn("pid", spark_partition_id())
      .withColumn("pr", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("pid")).orderBy(col("sk"))))
    t("parted_window_once")(parted)
    val offsets = parted.groupBy(col("pid")).agg(count(lit(1)).as("cnt"))
      .withColumn("off", coalesce(sum(col("cnt")).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("pid"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("pid"), col("off"))
    val ranked = parted.join(broadcast(offsets), Seq("pid"))
      .select(col("name"), (col("pr") + col("off")).as("r"))
    t("ranked (window x2)")(ranked)
    t("one_pass_pairs")(Analytics.snmPairs(univ, col("name"), nUniv))
    t("one_pass_verified")(Analytics.snmPairs(univ, col("name"), nUniv)
      .filter(abs(length(col("i")) - length(col("j"))) <= 2)
      .withColumn("lev", levenshtein(col("i"), col("j")))
      .filter(col("lev") <= 2))
    t("three_pass_full")(Analytics.queries("er_sorted_neighborhood")(s, dir))
    ScratchCache.drain()
    s.stop()
  }
}
