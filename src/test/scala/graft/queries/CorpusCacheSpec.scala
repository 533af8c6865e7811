package graft.queries

import graft.SparkSpec
import org.apache.spark.storage.StorageLevel

/** Pins the shared-materialization contract the ANN/dedup index reuse is
  * built on: one persisted table per (session, key), identical reference
  * on every lookup, distinct entries per key.
  */
class CorpusCacheSpec extends SparkSpec {

  test("same (session, key) returns the same persisted table; keys are distinct") {
    import spark.implicits._
    var builds = 0
    def build(n: Int) = { builds += 1; Seq(n).toDF("v") }
    val a1 = CorpusCache.getOrBuild(spark, "cc-spec:a")(build(1))
    val a2 = CorpusCache.getOrBuild(spark, "cc-spec:a")(build(1))
    val b = CorpusCache.getOrBuild(spark, "cc-spec:b")(build(2))
    assert(a1 eq a2, "second lookup must return the cached instance, not rebuild")
    assert(builds == 2, s"one build per key, got $builds")
    assert(b.head().getInt(0) == 2)
    assert(a1.storageLevel != StorageLevel.NONE, "cached table must be persisted")
  }

  test("an externally evicted entry is re-persisted on the next lookup") {
    import spark.implicits._
    val df = CorpusCache.getOrBuild(spark, "cc-spec:evict")(Seq(3).toDF("v"))
    df.unpersist(true)
    assert(df.storageLevel == StorageLevel.NONE)
    val again = CorpusCache.getOrBuild(spark, "cc-spec:evict")(Seq(3).toDF("v"))
    assert(again.storageLevel != StorageLevel.NONE,
      "lookup after clearCache/unpersist must re-persist, not return a dead entry")
  }

  test("a new session builds its own entry for the same key") {
    import spark.implicits._
    val s2 = spark.newSession()
    val a = CorpusCache.getOrBuild(spark, "cc-spec:iso")(Seq(1).toDF("v"))
    val b = CorpusCache.getOrBuild(s2, "cc-spec:iso") {
      import s2.implicits._
      Seq(1).toDF("v")
    }
    assert(!(a eq b), "sessions must not share cached plan instances")
  }
}
