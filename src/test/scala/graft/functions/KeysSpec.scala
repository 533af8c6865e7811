package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SURVEY §7.4 risk 1: every surrogate key hashes a '|'-joined,
  * COALESCE-defaulted pre-image, and any whitespace/NULL-default mismatch
  * breaks downstream joins silently. These tests pin the pre-image
  * semantics, including its known (reference-faithful) collision classes.
  */
class KeysSpec extends SparkSpec {
  import spark.implicits._

  private def key(parts: (Option[String], Option[String])*): Seq[Long] =
    parts.toSeq.toDF("a", "b")
      .select(Keys.surrogateKey($"a", $"b"))
      .as[Long].collect().toSeq

  test("distinct values produce distinct keys; keys are non-negative and stable") {
    val ks = key(Some("x") -> Some("y"), Some("y") -> Some("x"), Some("xy") -> None)
    assert(ks.distinct.length === 3)
    assert(ks.forall(_ >= 0))
    assert(key(Some("x") -> Some("y")).head === ks.head)   // deterministic
  }

  test("documented collision classes of the COALESCE('') pre-image") {
    // NULL and empty-string both default to '' — same key (the reference's
    // stg_order.sql:88-102 has the identical property; callers needing the
    // distinction must classify fake-nulls BEFORE keying, as stg_customer does)
    assert(key(None -> Some("y")).head === key(Some("") -> Some("y")).head)
    // the '|' separator also means ('a|', 'b') == ('a', '|b') — keys only
    // need internal consistency, so both classes are accepted and pinned
    assert(key(Some("a|") -> Some("b")).head === key(Some("a") -> Some("|b")).head)
  }

  test("seeded permutations: key equality iff pre-image equality") {
    val rnd = new scala.util.Random(7)
    val vals = Seq(None, Some(""), Some("a"), Some("b"), Some("a|b"), Some(" a"))
    val samples = Seq.fill(300)((vals(rnd.nextInt(vals.length)), vals(rnd.nextInt(vals.length))))
    val pre = samples.map { case (a, b) => s"${a.getOrElse("")}|${b.getOrElse("")}" }
    val ks = key(samples: _*)
    pre.zip(ks).groupBy(_._1).values.foreach { g =>
      assert(g.map(_._2).distinct.length === 1)   // same pre-image → same key
    }
    assert(pre.distinct.length === ks.distinct.length) // distinct pre-image → distinct key
  }

  test("xxhash64 engine-internal variant agrees with itself, differs from md5 key") {
    val df = Seq(("x", "y")).toDF("a", "b")
    val m = df.select(Keys.surrogateKey($"a", $"b")).as[Long].head()
    val x1 = df.select(Keys.xxhash64Key($"a", $"b")).as[Long].head()
    val x2 = df.select(Keys.xxhash64Key($"a", $"b")).as[Long].head()
    assert(x1 === x2)
    assert(x1 !== m)
  }
}

class ModelGraphSpec extends SparkSpec {
  import graft.glamira.ModelGraph

  test("cycle detection fails fast with the offending model named") {
    val g = new ModelGraph(spark, java.nio.file.Files.createTempDirectory("mg").toString)
    g.view("a", "b")(d => d("b"))
    g.view("b", "a")(d => d("a"))
    val e = intercept[RuntimeException](g.resolve("a"))
    assert(e.getMessage.contains("cycle"))
  }

  test("unknown model and unknown dependency are clear errors") {
    val g = new ModelGraph(spark, java.nio.file.Files.createTempDirectory("mg2").toString)
    val e = intercept[RuntimeException](g.resolve("nope"))
    assert(e.getMessage.contains("unknown model"))
  }
}
