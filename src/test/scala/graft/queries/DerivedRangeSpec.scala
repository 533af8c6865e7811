package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The derived-range discipline for the two-phase prefix-sum/rank stages
  * (round-10 verdict: shardExport's fixed 16-way hash-range split and
  * snmPairs' fixed repartitionByRange(8) capped parallelism at any corpus
  * size). These tests pin the property the fix exists for: PER-PART ROW
  * VOLUME STAYS BOUNDED AS n GROWS (parts scale; each part's work
  * doesn't), the offsets/rank side tables stay small (≤ LEVEL2_CAP rows —
  * they pass through a single-task window and a broadcast), and the
  * OUTPUT is invariant to the partition count (so the derivation is free
  * to change with corpus size without touching any oracle).
  */
class DerivedRangeSpec extends SparkSpec {
  import spark.implicits._

  private val grid: Seq[Long] = Seq(1L, 100L, 6000L, 60000L, 600000L,
    5000000L, 100000000L, 2000000000L, 20000000000L, 1000000000000L)

  test("snmPartCount: per-part volume bounded, side table capped, floors tiny universes") {
    for (n <- grid) {
      val p = Analytics.snmPartCount(n)
      assert(p >= 8, s"n=$n: floor of 8 violated (p=$p)")
      assert(p <= Curation.LEVEL2_CAP.toLong,
        s"n=$n: offsets table would exceed LEVEL2_CAP (p=$p)")
      // bounded per-part volume while under the cap: rows/part can only
      // exceed the target once the cap binds (the documented third-level
      // trade, same as packRangeSize)
      if (p < Curation.LEVEL2_CAP.toLong && p > 8)
        assert(n.toDouble / p <= Curation.SHARD_PART_ROWS + 1,
          s"n=$n: per-part volume ${n.toDouble / p} exceeds SHARD_PART_ROWS")
    }
    // monotone: more data never fewer parts
    assert(grid.map(Analytics.snmPartCount) === grid.map(Analytics.snmPartCount).sorted)
    // the gate-scale behavior is unchanged (8 parts up to 500k names)
    assert(Analytics.snmPartCount(60000L) === 8)
    // and the round-10 probe tier now fans out
    assert(Analytics.snmPartCount(5000000L) === 80)
  }

  test("shardPartCount: same bounds as a Column formula; part is monotone in hs") {
    val counts = grid.toDF("n")
      .select(col("n"), Curation.shardPartCount(col("n")).as("p"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    for ((n, p) <- counts) {
      assert(p >= 16, s"n=$n: floor of 16 violated (p=$p)")
      assert(p <= Curation.LEVEL2_CAP.toLong, s"n=$n: cap violated (p=$p)")
      if (p > 16 && p < Curation.LEVEL2_CAP.toLong)
        assert(n.toDouble / p <= Curation.SHARD_PART_ROWS + 1,
          s"n=$n: per-part volume ${n.toDouble / p} exceeds SHARD_PART_ROWS")
    }
    assert(counts.map(_._2).toSeq === counts.map(_._2).sorted.toSeq)
    // part ids: exact under double (hs·p ≤ 10⁶·LEVEL2_CAP < 2^53),
    // monotone nondecreasing in hs, and land in [0, p) — the properties
    // that make the per-part sorts compose into the global (hs, doc_id)
    // order at any derived count
    val parts = spark.range(0, 1000000L, 997L).toDF("hs")
      .crossJoin(Seq(5000000L).toDF("n"))
      .select(col("hs"),
        floor(col("hs") * Curation.shardPartCount(col("n")) / lit(1000000.0d)).as("part"))
      .orderBy("hs").collect().map(_.getLong(1))
    assert(parts.toSeq === parts.sorted.toSeq, "part must be monotone in hs")
    assert(parts.head === 0L && parts.last === 79L,
      s"parts must span [0, p): got ${parts.head}..${parts.last}")
  }

  test("sink writer splits: floors hold gate-scale counts, volume bounded, count memoized") {
    // round 12 (round-11 verdict #2): the sink-layout writers were the
    // last fixed-split members — s4/s14/s15's repartition(8) and
    // s11/s17's repartitionByRange(4|16). Their derived splits must keep
    // per-writer volume bounded as n grows, floor at the previous fixed
    // values (so gate-scale layouts are unchanged), cap at LEVEL2_CAP,
    // and pay the corpus count ONCE per (session, key).
    val s2 = spark.newSession()
    var computes = 0
    def parts(key: String, n: Long, target: Double, floor: Int): Int =
      SinkRoundTrip.derivedParts(s2, key, target, floor) { computes += 1; n }
    for (n <- grid; (target, floor) <- Seq(
        (SinkRoundTrip.CHUNK_ROWS, 8), (Curation.SHARD_PART_ROWS, 4),
        (Curation.SHARD_PART_ROWS, 8), (Curation.SHARD_PART_ROWS, 16))) {
      val p = parts(s"drs:$n:$target:$floor", n, target, floor)
      assert(p >= floor, s"n=$n target=$target: floor $floor violated (p=$p)")
      assert(p <= Curation.LEVEL2_CAP.toLong, s"n=$n: cap violated (p=$p)")
      if (p > floor && p < Curation.LEVEL2_CAP.toLong)
        assert(n.toDouble / p <= target + 1,
          s"n=$n: per-writer volume ${n.toDouble / p} exceeds $target")
    }
    // gate-scale behavior unchanged: the floors bind at every driver sf
    // (events ≤ 100k/5000-row chunks = 20 is the one scale-out at sf0.1)
    assert(parts("drs:ev001", 1000L, SinkRoundTrip.CHUNK_ROWS, 8) === 8)
    assert(parts("drs:ev01", 10000L, SinkRoundTrip.CHUNK_ROWS, 8) === 8)
    assert(parts("drs:ev1", 100000L, SinkRoundTrip.CHUNK_ROWS, 8) === 20)
    assert(parts("drs:ord1", 150000L, Curation.SHARD_PART_ROWS, 4) === 4)
    assert(parts("drs:ord1b", 150000L, Curation.SHARD_PART_ROWS, 16) === 16)
    assert(parts("drs:li1", 600000L, Curation.SHARD_PART_ROWS, 8) === 10)
    // memoization: a repeated key never recomputes, and two consumers with
    // different floors share one memoized count (the s11/s17 orders key)
    computes = 0
    val k = "drs:memo"
    val a = parts(k, 5000000L, Curation.SHARD_PART_ROWS, 4)
    val b = parts(k, 5000000L, Curation.SHARD_PART_ROWS, 4)
    val c = parts(k, 5000000L, Curation.SHARD_PART_ROWS, 16)
    assert(computes === 1, s"count must be memoized per (session, key), got $computes")
    assert(a === b && a === 80 && c === 80)
    // a NEW session re-counts from scratch (the Preconditions discipline)
    val s3 = spark.newSession()
    SinkRoundTrip.derivedParts(s3, k, Curation.SHARD_PART_ROWS, 4) { computes += 1; 1L }
    assert(computes === 2, "a new session must not inherit another session's memo")
  }

  test("snmPairs output is invariant to the derived partition count") {
    // the two-phase rank's value is the position in the TOTAL order, so
    // it cannot depend on where the range boundaries fall: force wildly
    // different partition counts through nUniv and require identical
    // pair sets
    val univ = (0 until 500).map(i => f"name${(i * 7919) % 500}%04d").distinct.toDF("name")
    def pairs(forcedN: Long): Set[(String, String)] =
      Analytics.snmPairs(univ, $"name", forcedN)
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val p8 = pairs(100L)           // → 8 partitions (floor)
    val p80 = pairs(5000000L)      // → 80 partitions
    val p1600 = pairs(100000000L)  // → 1600 partitions, far more than rows
    assert(p8 === p80, "8-way vs 80-way rank produced different pairs")
    assert(p8 === p1600, "8-way vs 1600-way rank produced different pairs")
    assert(p8.nonEmpty)
  }
}
