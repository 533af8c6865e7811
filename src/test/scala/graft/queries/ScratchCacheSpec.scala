package graft.queries

import org.apache.spark.storage.StorageLevel

import graft.SparkSpec

/** The registry must stay bounded for a caller that never drains: past
  * MaxLive the oldest registrations are unpersisted and dropped, newest
  * retained (round-7 verdict item — the last structural gap in the
  * round-5 scratch-persist discipline).
  */
class ScratchCacheSpec extends SparkSpec {

  test("registering past MaxLive evicts oldest-first and stays bounded") {
    ScratchCache.drain()
    val n = ScratchCache.MaxLive + 8
    val dss = (0 until n).map { i =>
      val ds = spark.range(i, i + 10L).toDF("v").persist(StorageLevel.MEMORY_ONLY)
      ds.count() // materialize so eviction releases real storage
      ScratchCache.register(ds)
    }
    assert(ScratchCache.liveCount === ScratchCache.MaxLive)
    // the 8 oldest were unpersisted by the cap...
    dss.take(8).foreach(ds => assert(ds.storageLevel === StorageLevel.NONE,
      "evicted scratch must be unpersisted"))
    // ...the newest MaxLive are still cached
    dss.drop(8).foreach(ds => assert(ds.storageLevel !== StorageLevel.NONE,
      "retained scratch must stay persisted"))
    ScratchCache.drain()
    assert(ScratchCache.liveCount === 0)
    dss.foreach(ds => assert(ds.storageLevel === StorageLevel.NONE))
  }
}
