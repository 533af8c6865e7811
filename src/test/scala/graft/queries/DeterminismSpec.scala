package graft.queries

import graft.SparkSpec

/** Every query must be deterministic across executions — the driver hashes
  * results, so any run-to-run drift (double-sum ordering, unstable window
  * tie-breaks, RNG) is a correctness failure even when each run "looks
  * right". Approximate (approx_*) queries are exempt from value equality
  * (sketch merge order is implementation-defined) but must keep stable
  * shape, and their accuracy is asserted against the exact answers.
  */
class DeterminismSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  // default smoke scale; set GRAFT_DETERMINISM_SF=/root/testdata/sf0.01 for
  // the deeper (slower) sweep — scale-dependent nondeterminism exists (the
  // text_quality rounding tie only appeared at sf0.1)
  private val dir = sys.env.getOrElse("GRAFT_DETERMINISM_SF", "/root/testdata/sf0.001")

  test("all queries produce identical results on re-execution") {
    val failures = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val a = fn(spark, dir).collect().map(_.toString).sorted.toSeq
      val b = fn(spark, dir).collect().map(_.toString).sorted.toSeq
      if (name.startsWith("approx_")) {
        if (a.length == b.length) None else Some(s"$name: row count drift ${a.length} vs ${b.length}")
      } else if (a == b) None
      else Some(s"$name: ${a.zip(b).count { case (x, y) => x != y }} differing rows")
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }

  test("HLL distinct within 5% of exact; approx percentiles bracket the median") {
    val approx = Approx.queries("approx_distinct_hll")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.Tables.events(spark, dir)
      .groupBy($"event_type").agg(countDistinct($"user_id").as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      assert(math.abs(approx(k) - e) <= math.max(1, 0.05 * e), s"$k: approx=${approx(k)} exact=$e")
    }

    val pct = Approx.queries("approx_percentiles")(spark, dir).collect()
    pct.foreach { r =>
      val ps = r.getSeq[Double](1)
      assert(ps.length === 3 && ps(0) <= ps(1) && ps(1) <= ps(2))
    }
  }
}
