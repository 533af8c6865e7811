package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  private lazy val skewed = (Seq.fill(5000)(("hot", 1.0)) ++
    (1 to 500).map(i => (s"k$i", i.toDouble))).toDF("k", "v")

  test("salted aggregation equals plain groupBy") {
    val got = Skew.saltedCountSum(skewed, Seq("k"), "v", salts = 8)
      .orderBy("k").collect()
    val want = skewed.groupBy($"k")
      .agg(count(lit(1)).as("n"), sum($"v").as("sum_v"))
      .orderBy("k").collect()
    assert(got.length === want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getString(0) === w.getString(0))
      assert(g.getLong(1) === w.getLong(1))
      assert(math.abs(g.getDouble(2) - w.getDouble(2)) < 1e-6)
    }
  }

  test("salted join equals plain join; salt spreads the hot key") {
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("k", "attr")
    val got = Skew.saltedJoin(skewed, dim, Seq("k"), salts = 8)
    val want = skewed.join(dim, Seq("k"))
    assert(got.count() === want.count())
    assert(got.groupBy($"k").count().orderBy($"k").collect().toSeq ===
      want.groupBy($"k").count().orderBy($"k").collect().toSeq)
    // the hot key genuinely occupies multiple salt values
    val saltSpread = skewed.filter($"k" === "hot")
      .withColumn("_salt", pmod(monotonically_increasing_id(), lit(8)))
      .select("_salt").distinct().count()
    assert(saltSpread > 1)

    // left joins preserve probe rows; right/full would duplicate every
    // unmatched build row once per salt and must be rejected up front
    val leftGot = Skew.saltedJoin(skewed, dim, Seq("k"), salts = 8, joinType = "left")
    assert(leftGot.count() === skewed.join(dim, Seq("k"), "left").count())
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(skewed, dim, Seq("k"), salts = 8, joinType = "full_outer")
    }
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(skewed, dim, Seq("k"), salts = 8, joinType = "right")
    }
  }

  test("bucketed join: no shuffle exchange on either side") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = (1 to 2000).map(i => (i.toLong, s"a$i")).toDF("id", "va")
      val b = (1 to 2000).map(i => (i.toLong, s"b$i")).toDF("id", "vb")
      val joined = Skew.bucketedJoin(spark, a, b, "id", buckets = 4, "skewspec")
      assert(joined.count() === 2000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free plan:\n$plan")
      assert(plan.contains("SortMergeJoin"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
