package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ingest.Normalize
import graft.operators.{Merge, Multimodal}
import graft.sources.Sinks

/** Edge paths of library operators not reached by the oracle-gated queries. */
class LibraryEdgeSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents on an empty edge set converges to an empty labeling") {
    val empty = Seq.empty[(Long, Long)].toDF("i", "j")
    val labels = graft.operators.Components.connectedComponents(empty)
    assert(labels.count() === 0)
  }

  test("connectedComponents on self-loops labels each node with itself") {
    val loops = Seq((1L, 1L), (7L, 7L)).toDF("i", "j")
    val labels = graft.operators.Components.connectedComponents(loops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels === Map(1L -> 1L, 7L -> 7L))
  }

  test("readMerged unifies drifting file schemas (autodetect analog)") {
    val dir = java.nio.file.Files.createTempDirectory("merge").toString + "/t"
    Seq((1L, "a")).toDF("id", "v").write.parquet(dir + "/p1")
    Seq((2L, "b", true)).toDF("id", "v", "flag").write.parquet(dir + "/p2")
    // physically co-locate the files under one directory
    val d = new java.io.File(dir)
    for (sub <- Seq("p1", "p2"); f <- new java.io.File(dir + "/" + sub).listFiles()
         if f.getName.endsWith(".parquet"))
      java.nio.file.Files.move(f.toPath, new java.io.File(d, sub + "_" + f.getName).toPath)
    val merged = Sinks.readMerged(spark, dir)
    assert(merged.columns.toSet === Set("id", "v", "flag"))
    assert(merged.count() === 2)
    assert(merged.filter($"id" === 1).collect().head.getAs[Any]("flag") == null)
  }

  test("Normalize.repair honors extraSchemas drift and the forced set") {
    val df = Seq((1L, true)).toDF("n", "plain")
    val otherSchema = StructType(Seq(
      StructField("n", StringType),          // drifts vs LongType
      StructField("plain", BooleanType)))
    val repaired = Normalize.repair(df, extraSchemas = Seq(otherSchema))
    assert(repaired.schema("n").dataType === StringType)     // drift → string
    assert(repaired.schema("plain").dataType === BooleanType) // untouched
    val forced = Normalize.repair(df, forced = Set("plain"))
    assert(forced.schema("plain").dataType === StringType)
  }

  test("Merge.incrementalWindow only reprocesses rows past the watermark") {
    val target = Seq((1, "old", "2024-01-01"), (2, "old", "2024-01-05")).toDF("k", "v", "d")
    val source = Seq((2, "new", "2024-01-05"), (3, "new", "2024-01-06"),
      (9, "ignored", "2023-12-01")).toDF("k", "v", "d")
    val out = Merge.incrementalWindow(target, source, Seq("k"), "d", "2024-01-04")
    val m = out.collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(m === Map(1 -> "old", 2 -> "new", 3 -> "new"))   // 9 is before the watermark
  }

  test("Multimodal.decode: unknown media type is not-ok, null payload safe") {
    val media = Seq(
      (1L, "hologram", "x".getBytes("UTF-8"), "{}"),
      (2L, null.asInstanceOf[String], "y".getBytes("UTF-8"), "{}"))
      .toDF("media_id", "media_type", "payload", "meta_json")
    val out = Multimodal.decode(media).collect().map(r => r.getLong(0) -> r.getAs[Boolean]("ok")).toMap
    assert(out === Map(1L -> false, 2L -> false))
    val nullPayload = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(3L, "image", null, "{}")),
      Multimodal.mediaSchema)
    val r3 = Multimodal.decode(nullPayload).collect().head
    assert(!r3.getAs[Boolean]("ok") && r3.getAs[Int]("n_bytes") === 0)
  }

  test("stringify of timestamp column is ISO-UTC") {
    val df = Seq(java.sql.Timestamp.valueOf("2024-01-01 12:30:00")).toDF("ts")
    val out = Normalize.stringifyAll(df).collect().head.getString(0)
    assert(out.startsWith("2024-01-01T12:30:00"))
  }
}
