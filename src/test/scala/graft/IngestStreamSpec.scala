package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ingest.Normalize
import graft.sources.Sinks
import graft.streaming.EventStream

class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("stringifyAll: nested→JSON, binary→utf8-else-hex, scalars→str") {
    val schema = StructType(Seq(
      StructField("s", StringType), StructField("i", LongType),
      StructField("b", BooleanType), StructField("bin", BinaryType),
      StructField("arr", ArrayType(LongType)),
      StructField("obj", StructType(Seq(StructField("k", LongType))))))
    val rows = Seq(
      Row("x", 1L, true, "text".getBytes("UTF-8"), Seq(1L, 2L), Row(9L)),
      Row(null, null, null, Array[Byte](0xff.toByte, 0xfe.toByte), null, null))
    val df = spark.createDataFrame(new java.util.ArrayList[Row](rows.asJavaList), schema)
    val out = Normalize.stringifyAll(df)
    assert(out.schema.fields.forall(_.dataType == StringType))
    val r0 = out.collect()(0)
    assert(r0.getString(1) === "1" && r0.getString(2) === "true")
    assert(r0.getString(3) === "text")            // clean utf8 decodes
    assert(r0.getString(4) === "[1,2]" && r0.getString(5) === """{"k":9}""")
    val r1 = out.collect()(1)
    assert(r1.getString(3) === "fffe")            // junk bytes → hex
    assert(r1.getString(0) == null)
  }

  implicit class SeqOps(rows: Seq[Row]) {
    def asJavaList: java.util.List[Row] = {
      val l = new java.util.ArrayList[Row](); rows.foreach(l.add); l
    }
  }

  test("drift detection: cross-schema type conflicts ∪ suspicious names") {
    val s1 = StructType(Seq(StructField("a", LongType), StructField("is_paypal", BooleanType)))
    val s2 = StructType(Seq(StructField("a", StringType), StructField("is_paypal", BooleanType)))
    assert(Normalize.driftingColumns(Seq(s1, s2)) === Set("a"))
    assert(Normalize.suspiciousColumns(Seq("is_paypal", "cat_id", "key_search", "plain")) ===
      Set("is_paypal", "cat_id", "key_search"))
  }

  test("repair + typedIngest round-trip") {
    val df = Seq((1L, "7", """{"k":5}""", "2024-01-01 00:00:00"))
      .toDF("plain_id", "n", "obj", "ts")   // plain_id suspicious (_id)
    val repaired = Normalize.repair(df)
    assert(repaired.schema("plain_id").dataType === StringType)
    val target = StructType(Seq(
      StructField("n", LongType),
      StructField("obj", StructType(Seq(StructField("k", LongType)))),
      StructField("ts", TimestampType)))
    val typed = Normalize.typedIngest(df, target)
    val r = typed.collect().head
    assert(r.getLong(0) === 7L && r.getStruct(1).getLong(0) === 5L)
    assert(r.getTimestamp(2).toString.startsWith("2024-01-01"))
    // junk survives as null, not a job abort
    val junk = Seq(("x", "notjson", "bad")).toDF("n", "obj", "ts")
    val tj = Normalize.typedIngest(junk, target).collect().head
    assert(tj.isNullAt(0) && tj.isNullAt(2))
  }
}

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned write → partition-pruned read; dynamic overwrite") {
    val dir = java.nio.file.Files.createTempDirectory("sink").toString + "/t"
    val df = Seq(("2024-01-01", 1, "a"), ("2024-01-01", 2, "b"), ("2024-01-02", 3, "c"))
      .toDF("d", "k", "v")
    Sinks.writePartitioned(df, dir, "d", Seq("k"))
    val back = spark.read.parquet(dir)
    assert(back.count() === 3)
    val pruned = back.filter($"d" === "2024-01-01")
    assert(pruned.count() === 2)
    assert(pruned.queryExecution.executedPlan.toString.contains("PartitionFilters"))

    // dynamic overwrite: rewrite only 2024-01-02, 01-01 untouched
    Sinks.overwriteDynamicPartitions(
      Seq(("2024-01-02", 9, "z")).toDF("d", "k", "v"), dir, "d")
    val after = spark.read.parquet(dir)
    assert(after.count() === 3)
    assert(after.filter($"d" === "2024-01-02").collect().head.getAs[Int]("k") === 9)
  }

  test("compaction: many small files → target count, data intact, crash-safe swap") {
    val dir = java.nio.file.Files.createTempDirectory("compact").toString + "/t"
    val df = spark.range(0, 1000).toDF("id")
    df.repartition(50).write.parquet(dir)   // 50 tiny files
    def nFiles = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(nFiles >= 40)
    Sinks.compact(spark, dir, targetFiles = 4)
    assert(nFiles <= 4 + 1)
    val back = spark.read.parquet(dir)
    assert(back.count() === 1000)
    assert(back.agg(org.apache.spark.sql.functions.sum($"id")).as[Long].head() === 499500L)
    assert(!new java.io.File(dir + "_precompact").exists())

    // a stale backup from a crashed run must make compact refuse, not
    // silently destroy the only rollback copy
    new java.io.File(dir + "_precompact").mkdirs()
    val e = intercept[RuntimeException](Sinks.compact(spark, dir, 2))
    assert(e.getMessage.contains("stale backup"))
    new java.io.File(dir + "_precompact").delete()
  }

  test("csv sink with header round-trips") {
    val dir = java.nio.file.Files.createTempDirectory("csv").toString + "/c"
    Sinks.writeCsv(Seq((1, "x"), (2, "y")).toDF("id", "v"), dir)
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.columns.toSeq === Seq("id", "v") && back.count() === 2)
  }
}

class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  test("AvailableNow streaming agg matches the batch aggregate") {
    val inDir = java.nio.file.Files.createTempDirectory("stream_in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("stream_ck").toString
    val batch = Tables.events(spark, "/root/testdata/sf0.001")
    batch.write.mode("overwrite").parquet(inDir)

    val q = EventStream.runAvailableNow(spark, inDir, ckpt, "ev_out")
    q.awaitTermination(120000)
    val streamed = spark.table("ev_out")
    val expected = EventStream.windowedCounts(spark.read.parquet(inDir))
    assert(streamed.count() > 0)
    assert(streamed.orderBy("window_start", "event_type").collect().toSeq ===
      expected.orderBy("window_start", "event_type").collect().toSeq)
  }
}
