package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Sources and sinks (SURVEY §2.1 S4/S6/S8/S9).
  *
  * The reference's chunked exports, resumable uploads, and ≤9500-URI batched
  * load jobs are artifacts of single-process Python + remote services; on
  * Spark they collapse into partitioned parquet writes where tasks
  * parallelize file IO. What remains meaningful at 100 TB:
  *  - date partitioning on write → partition pruning on read (the DAY
  *    time-partitioning of load_to_bigquery.py:61-68)
  *  - sortWithinPartitions on the cluster keys → rowgroup locality, the
  *    clustering-fields analog (min/max pruning inside parquet)
  *  - idempotent overwrite per partition → the checkpoint/resume concern
  *    becomes "re-running a partition rewrites it deterministically".
  */
object Sinks {

  /** S6: warehouse load — date-partitioned, cluster-sorted parquet. */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String,
                       clusterCols: Seq[String] = Nil): Unit = {
    val sorted =
      if (clusterCols.isEmpty) df
      else df.repartition(col(partitionCol))
        .sortWithinPartitions((partitionCol +: clusterCols).map(col): _*)
    sorted.write.mode("overwrite").partitionBy(partitionCol).parquet(path)
  }

  /** Overwrite only the partitions present in `df` (incremental reload of a
    * re-processed trailing window without touching history).
    *
    * The overwrite mode rides the WRITER (`option("partitionOverwriteMode",
    * "dynamic")` — a per-write override the datasource reads ahead of the
    * session conf), not a session-conf set/restore dance: mutating shared
    * session state races any concurrent writer on the same session
    * (round-5 advice), and the writer option is the API designed for
    * exactly this scoping.
    */
  def overwriteDynamicPartitions(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol).parquet(path)

  /** S8: CSV sink with header (crash-safety = task-level write commit). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** S6-read: schema-merged read across drifting files (BigQuery
    * autodetect analog).
    */
  def readMerged(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** Compaction: rewrite a directory of many small files into ~targetFiles
    * outputs (the small-files problem — streaming/incremental sinks
    * accumulate tiny files whose per-file open/footer costs dominate reads
    * at scale). Writes to a temp sibling then swaps, so a crash mid-compact
    * never leaves the table half-rewritten.
    */
  def compact(spark: SparkSession, path: String, targetFiles: Int): Unit = {
    val tmp = path + "_compacting"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    val bak = new org.apache.hadoop.fs.Path(path + "_precompact")
    // A leftover backup means a previous compact crashed mid-swap; refuse to
    // proceed (and above all: never delete it) until it is reconciled.
    if (fs.exists(bak))
      sys.error(s"compact: stale backup $bak exists — recover it before re-compacting")
    spark.read.parquet(path).repartition(targetFiles)
      .write.mode("overwrite").parquet(tmp)
    // rename returns false instead of throwing — check every step, and only
    // drop the backup after the new data is in place.
    if (!fs.rename(dst, bak))
      sys.error(s"compact: could not move $dst aside to $bak")
    if (!fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)) {
      fs.rename(bak, dst) // roll back so readers keep a table
      sys.error(s"compact: could not move $tmp into place; original restored")
    }
    fs.delete(bak, true)
  }
}
