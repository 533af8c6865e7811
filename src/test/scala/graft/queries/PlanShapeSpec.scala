package graft.queries

import graft.SparkSpec

/** Plan-shape gates: the scale claims in SCALE.md as assertions, so a
  * regression that silently degrades a broadcast to a shuffle, an
  * equi-join to a nested loop, or pushdown to a full scan fails the build
  * rather than only changing a PLANS.md diff.
  */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, dir)
      .queryExecution.executedPlan.toString

  private def count(hay: String, needle: String): Int =
    hay.sliding(needle.length).count(_ == needle)

  test("flagship star: every dim hop broadcasts, no nested loop, no cartesian") {
    val p = plan("q0_flagship_star")
    assert(count(p, "BroadcastHashJoin") >= 4, p.take(800))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("interval lookup compiles to an equi-join on the grid cell, not a nested loop") {
    val p = plan("j13_interval_lookup")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("filtered scan pushes predicates and prunes columns at the parquet reader") {
    val p = plan("s1_filtered_scan")
    assert(p.contains("PushedFilters: [") && !p.contains("PushedFilters: []"), p.take(1200))
    // projection reaches the scan: only the 4 selected columns are read
    val readSchema = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    assert(Seq("event_id:", "user_id:", "event_type:", "value:")
      .forall(readSchema.contains), readSchema)
    assert(!readSchema.contains("props:") && !readSchema.contains("ts:"), readSchema)
  }

  test("fact_order: dim merge-backs all broadcast; no shuffle join anywhere") {
    val p = plan("glamira_fact_order")
    assert(count(p, "BroadcastHashJoin") >= 5, p.take(800))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"))
  }

  test("exact dedup: single shuffle on the content hash") {
    val p = plan("dedup_exact")
    // partial agg → one Exchange → final agg; AQE wraps but adds no extra shuffle
    assert(count(p, "Exchange hashpartitioning") === 1, p.take(1200))
  }

  test("top-k sort compiles to TakeOrderedAndProject, not a global sort") {
    val p = plan("o1_topk_sort")
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
  }

  test("incremental dedup: band candidate join is an equi-join, never a cartesian pair space") {
    val p = plan("dedup_incremental")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p.take(1200))
  }

  test("components: the gated pair chain is the banded LSH path — no cartesian pair space") {
    // the pair INPUT (lshVerifiedPairs) must stay banded; the broadcast
    // 1-row df-cap aggregate is the only BNLJ-looking node and is Cross
    // BuildRight over one row, so only CartesianProduct is forbidden
    val p = plan("dedup_components")
    assert(!p.contains("CartesianProduct"), p.take(1200))
  }

  test("incremental ANN: batch x index is a bucket equi-join, never corpus x corpus") {
    // the only nested-loop node is the constant 12x64 hyperplane table
    // build (range x range); vector-bearing joins are all equi-joins
    val p = plan("sim_ann_incremental")
    assert(!p.contains("CartesianProduct"), p.take(1200))
  }

  test("stg_order: the location join broadcasts; no shuffle join in the staging path") {
    val p = plan("glamira_stg_order")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p.take(1200))
  }

  test("domain cap: no full-corpus window on source — phase 1 partitions by (source, salt)") {
    val p = plan("curation_domain_cap")
    // two Window nodes ("Window [" excludes WindowGroupLimit): salted bucket
    // rank first, bounded per-source rank second
    assert(count(p, "Window [") === 2, p.take(1500))
    // the upstream window (last in the printed tree) partitions by the
    // salted key, so the raw corpus never feeds a single per-source sort
    val firstWindow = p.split("\n").reverse.find(_.contains("Window ["))
    assert(firstWindow.exists(_.contains("salt")), firstWindow.getOrElse(""))
    // Spark 4's group-limit pushdown caps each (source, salt) bucket at the
    // map side BEFORE the exchange — assert it stays
    assert(p.contains("WindowGroupLimit"), p.take(1500))
  }

  test("cluster sample: quota pushes into WindowGroupLimit, no cartesian, no nested loop") {
    // the scale claim in the query comment as an assertion: the rn <= Q
    // predicate caps each cell's rank map-side before the exchange, and
    // the docs ⋈ assignment recombination is an equi-join on doc_id
    val p = plan("curation_cluster_sample")
    assert(p.contains("WindowGroupLimit"), p.take(1500))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin Inner"), p.take(1500))
  }

  test("c4 pipeline: no cartesian — bounds broadcast 1-row, rep recombines by equi-join") {
    // the only nested-loop-shaped node is the broadcast 1-row percentile
    // bounds (Cross BuildRight over one row); the repetition stats must
    // come back through a doc_id equi-join, never a pair space
    val p = plan("curation_c4_pipeline")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    // map-side flags + one aggregate recombine: exactly one join carries
    // the corpus against the bigram stats, and it is an equi-join
    assert(p.contains("doc_id"), p.take(400))
  }

  test("decontaminate: the eval set broadcasts; the corpus never sort-merge shuffles") {
    val p = plan("decontaminate")
    // eval shingles + eval sizes + exact-hit semi all broadcast
    assert(count(p, "BroadcastHashJoin") >= 3, p.take(1200))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p.take(1200))
  }

  test("dim_product: the JSON payload is parsed ONCE per row, not once per field") {
    // CollapseProject inlines the struct into its 13 field reads, so the
    // plan TEXT shows 13 from_json nodes — but they are all the IDENTICAL
    // full-schema expression, which whole-stage codegen's subexpression
    // elimination evaluates once per row. The regression this guards:
    // per-field schema PRUNING (OptimizeJsonExprs) or get_json_object
    // would make the parses distinct → 13 real Jackson passes per row.
    val p = plan("glamira_dim_product")
    assert(!p.contains("get_json_object"), p.take(1500))
    val schemas = "from_json\\(StructField\\(product,StructType\\((.*?)\\),true\\)".r
      .findAllMatchIn(p).map(_.group(1)).toList
    assert(schemas.nonEmpty && schemas.distinct.size === 1,
      s"n=${schemas.size} distinct=${schemas.distinct.size}")
    // full schema (all 16 fields), not a pruned one — CSE needs identity
    assert(schemas.head.split("StructField").length > 16, schemas.head.take(300))
  }

  test("fuzzy ER: blocked candidates are an equi-join on the block key, never a cartesian") {
    val p = plan("er_fuzzy_match")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"), p.take(800))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p.take(1200))
  }

  test("entity clusters: the q-gram candidate build is a purged equi-join on the block key") {
    import org.apache.spark.sql.functions.col
    val univ = graft.Tables.part(spark, dir).select(col("p_name").as("name")).distinct()
    val p = Analytics.erCandidatePairs(univ, 4).queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p.take(1200))
    // the block-size purge happens BEFORE the pair join: the kept-block
    // aggregate must appear in the plan (count per blk filtered to the cap)
    assert(p.contains("bn"), p.take(1200))
  }

  test("outlier QA: the per-group stats broadcast back; the corpus never sort-merge shuffles") {
    val p = plan("qa_outliers")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p.take(1200))
  }

  test("funnel: per-stage joins stay equi-joins; no cartesian anywhere") {
    val p = plan("funnel_conversion")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p.take(1200))
  }

  test("temporal SCD2 join: equi-key drives the join, interval is a residual — no nested loop") {
    val p = plan("j16_temporal_scd2")
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin") ||
      p.contains("ShuffledHashJoin"), p.take(800))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p.take(1200))
  }

  test("path trigrams: the global ranking window sees the trigram aggregate, not the corpus") {
    val p = plan("path_trigrams")
    // per-user leads partition by user_id; the single-partition rank window
    // must sit ABOVE the (s1, s2, s3) aggregate in the tree
    val lines = p.split("\n")
    val rankIdx = lines.indexWhere(l => l.contains("Window [") && l.contains("row_number"))
    val aggIdx = lines.indexWhere(l => l.contains("HashAggregate") && l.contains("s1"))
    assert(rankIdx >= 0 && aggIdx >= 0 && rankIdx < aggIdx, p.take(1500))
  }

  test("salted aggregation: hot key spreads across salts before the final per-key exchange") {
    val p = plan("skew_salted_agg")
    // two-phase shape: partial agg on (k, salt) → exchange → final (k, salt)
    // → partial k → exchange → final k; no join anywhere
    assert(count(p, "Exchange hashpartitioning") === 2, p.take(1200))
    assert(p.contains("monotonically_increasing_id") || p.contains("_salt"), p.take(1200))
  }

  test("span removal: window-hash joins only — no pair join at any alignment") {
    val p = plan("dedup_span_removal")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p.take(1200))
    // the dup-hash restriction joins back on the 16-byte window hash
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("heavy hitters: candidates broadcast; the corpus never shuffles for the verify") {
    val p = plan("approx_heavy_hitters")
    // the semi-join against the candidate sliver must be broadcast — a
    // sort-merge here would shuffle the whole event stream to count a
    // handful of keys
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p.take(1200))
    assert(!p.contains("SortMergeJoin"), p.take(800))
  }

  test("bm25: top-k is TakeOrderedAndProject; query terms broadcast into the postings") {
    // the only nested-loop-shaped node is the broadcast 1-row corpus-stats
    // join (Cross BuildRight over one row), the repo's scalar pattern
    val p = plan("text_bm25_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
    assert(count(p, "BroadcastHashJoin") >= 2, p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(1200))
  }

  test("quantized rescore: code-space candidates and per-candidate fetches are equi-joins") {
    // nested-loop nodes may appear only for the broadcast 1-row derived-k
    // scalar in the IVF chain — the pair space itself must be an equi-join
    val p = plan("sim_ann_quantized_rescore")
    assert(!p.contains("CartesianProduct"), p.take(1200))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("IVF-PQ: the LUT and codebook broadcast; no cartesian pair space") {
    val p = plan("sim_ann_ivf_pq")
    assert(count(p, "BroadcastHashJoin") >= 1, p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(1200))
  }

  test("LM perplexity: no token self-join, no nested loop") {
    // (the bigram spelling itself is pinned by the window-free gate below:
    // array-shift zip, not lead() over a corpus-wide window)
    val p = plan("text_lm_perplexity")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin Inner"), p.take(1200))
  }

  test("containment: anchors broadcast into the shared index probe") {
    val p = plan("dedup_containment")
    assert(count(p, "BroadcastHashJoin") >= 2, p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("NEGATIVE CONTROL — a 1-D sort fails the z-order both-dims probe") {
    // prove s17's assertion can fail: lay the same data out sorted by
    // custkey ONLY and recompute the gate's bounding-box probes — the
    // custkey probe prunes, but the date probe must touch (nearly) every
    // file, flipping the dd_prune_ok flag the real layout passes
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    val out = TempDirs.fresh("s17neg")
    val o = graft.Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      .withColumn("dday",
        datediff(col("o_orderdate"), lit(java.sql.Date.valueOf("1992-01-01"))).cast(LongType))
    o.repartitionByRange(16, col("o_custkey"))
      .sortWithinPartitions(col("o_custkey"))
      .write.mode("overwrite").parquet(out)
    val bounds = o.agg(min(col("o_custkey")).as("ck0"), max(col("o_custkey")).as("ck1"),
      min(col("dday")).as("d0"), max(col("dday")).as("d1"))
    val perFile = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min(col("o_custkey")).as("ck_min"), max(col("o_custkey")).as("ck_max"),
        min(col("dday")).as("dd_min"), max(col("dday")).as("dd_max"))
    val r = perFile.crossJoin(broadcast(bounds))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("nf"),
        sum((col("ck_max") - col("ck_min")).cast("double")).as("cke"),
        sum((col("dd_max") - col("dd_min")).cast("double")).as("dde"),
        max((col("ck1") - col("ck0")).cast("double")).as("ckr"),
        max((col("d1") - col("d0")).cast("double")).as("ddr"))
      .head
    val (nf, cke, dde, ckr, ddr) =
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(cke < ckr * nf * 0.6, s"custkey extents should shrink under a custkey sort ($cke vs ${ckr * nf})")
    assert(dde > ddr * nf * 0.9, s"date extents must stay ~full under a custkey-only sort ($dde vs ${ddr * nf})")
  }

  test("NEGATIVE CONTROL — the same join over UNBUCKETED tables plans with exchanges") {
    // prove s16's zero-shuffle flag is earned: identical join, plain
    // parquet instead of bucketed catalog tables, broadcast off — the
    // sort-merge join must now shuffle both sides
    import org.apache.spark.sql.functions._
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    val j = graft.Tables.orders(s2, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(graft.Tables.customer(s2, dir).select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"))
    val shuffles = j.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.size
    assert(shuffles >= 2, s"unbucketed SMJ must shuffle both sides, saw $shuffles")
  }

  test("NEGATIVE CONTROL — an unpartitioned fact gets no dynamicpruning subquery") {
    // prove j18's flag is earned: the identical join over a fact written
    // WITHOUT partitionBy carries no runtime pruning subquery
    import org.apache.spark.sql.functions._
    val out = TempDirs.fresh("j18neg")
    graft.Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), to_date(col("ts")).as("event_date"))
      .write.mode("overwrite").parquet(out)
    val fact = spark.read.parquet(out)
    val perDay = graft.Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("event_date"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("nd"))
    val dim = perDay
      .withColumn("bar", avg(col("nd").cast("double"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy()))
      .filter(col("nd").cast("double") > col("bar"))
      .select(col("event_date"))
    val j = fact.join(broadcast(dim), Seq("event_date"))
    assert(!graft.queries.PlanProbe.dppFired(j.queryExecution.executedPlan),
      "an unpartitioned scan must not carry a pruning subquery")
  }

  test("NEGATIVE CONTROL — a uniform-key join is never skew-split") {
    // prove j17's typed probe is earned: the identical session confs but
    // UNIFORM keys (no hot-key collapse) must leave isSkewJoin false on
    // every shuffled join in the adaptive final plan
    import org.apache.spark.sql.functions._
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "32")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2KB")
    s2.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    val uniform = graft.Tables.events(s2, dir)
      .repartition(8, col("event_id"))
      .select(col("event_id"), (col("event_id") % 1000).as("k"), col("value"))
    val dim = graft.Tables.customer(s2, dir)
      .filter(col("c_custkey") <= 999)
      .select(col("c_custkey").as("k"), col("c_name").as("k_name"))
    val agg = uniform.join(dim, Seq("k"))
      .groupBy(col("k_name").isNotNull.as("matched"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n"))
    agg.queryExecution.toRdd.count()
    assert(!graft.queries.PlanProbe.skewJoinFired(agg.queryExecution.executedPlan),
      "uniform keys must not trigger a skew split")
  }

  test("NEGATIVE CONTROL — with runtime bloom filters disabled, no BloomFilterMightContain is injected") {
    // prove s18's typed probe is earned: the identical selective join with
    // the InjectRuntimeFilter rule off carries no bloom expression
    import org.apache.spark.sql.functions._
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    val li = graft.Tables.lineitem(s2, dir)
      .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
    val ord = graft.Tables.orders(s2, dir)
      .filter(col("o_totalprice") > 400000.0d)
      .select(col("o_orderkey"))
    val j = li.join(ord, col("l_orderkey") === col("o_orderkey"))
    assert(!graft.queries.PlanProbe.bloomFilterInjected(j.queryExecution.optimizedPlan),
      "disabled runtime bloom filters must not inject")
  }

  test("containment probe broadcasts the anchor side; the inverted index is never sorted") {
    // round-8 fix: without the hint Spark planned a sort-merge join that
    // SORTED the corpus-sized shingle index (359 s at 500k docs). The
    // anchor side is bounded by s·shingles-per-doc at any corpus size, so
    // every join in this plan must be broadcast — no SMJ, no shuffle join.
    val p = plan("dedup_containment")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "containment must not shuffle or sort the inverted index for the probe")
  }

  test("shingle-index lambda reads bound token attributes, never an inlined split") {
    // the 348 s cliff of SCALE.md round 8: a non-attribute subexpression
    // captured inside a higher-order lambda is re-evaluated PER ELEMENT
    // (and HOFs don't codegen), so an inlined split(text) inside the
    // shingle transform runs 3·(n_tokens−2) times per row. The fixed plan
    // computes the split in a Project below the Generate; a regression
    // re-inlines it into the Generate's generator expression. The explode
    // input must therefore reference the bound `toks` attribute — the
    // Generate node's own string must carry no split call.
    // raw builder, not the CorpusCache wrapper — and over a limited scan,
    // so the plan is structurally distinct from any index another suite
    // already persisted (the cache manager substitutes an InMemoryRelation
    // for a structurally-identical plan, hiding the Generate this asserts
    // on; bit exactly that way when the full suite ran after a dedup spec)
    val plan = TextOps.shingleIndex(graft.Tables.documents(spark, dir).limit(7))
      .queryExecution.optimizedPlan
    val gens = plan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }
    assert(gens.nonEmpty, "shingle index must explode through a Generate node")
    gens.foreach { g =>
      val s = g.generator.toString
      assert(!s.contains("split("),
        s"generator re-inlines the token split (per-element re-evaluation): $s")
    }
    // negative control: the pre-fix shape (split inlined into the lambda)
    // must trip the same probe — proves the guard can fail
    import org.apache.spark.sql.functions._
    val bad = graft.Tables.documents(spark, dir).select(col("doc_id"),
      explode(graft.functions.TextFns.shingles3(col("text"))).as("shingle"))
      .queryExecution.optimizedPlan
    val badGen = bad.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }
    assert(badGen.exists(_.generator.toString.contains("split(")),
      "control: the inlined-split shape should show split( in the generator")
  }

  test("coarse two-level IVF assignment materializes measurably fewer candidate rows than flat") {
    // the SCALE.md n=10⁶ claim as an executed-metrics assertion. The cost
    // that quadratizes (k ∝ n) is the CANDIDATE volume out of the
    // vector×centroid broadcast joins: flat materializes n·k rows, the
    // two-level chain n·√k (coarse pick) + n·E[k/√k] (in-group fine pick)
    // + k·√k (fgrp, tiny). Shuffle volume stays O(n) for BOTH chains —
    // Catalyst pushes the corpus shuffle below the broadcast join, so the
    // window's n·k input never crosses the wire; that is exactly why the
    // mechanism must be gated on join output rows, not shuffle records.
    // AQE off so the static plan's metrics are directly collectible.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    // (bnlj, bhj) output rows, asserted SEPARATELY (round-9 advice): the
    // cross joins (BNLJ — seed builds + vector×coarse picks) are bounded
    // O(n·√k) UNCONDITIONALLY, while the in-group fine pick (BHJ, equi on
    // gid) is bounded n·max_g k_g — a bound that DEPENDS on the fine→
    // coarse distribution. A single summed assert would let worst-case
    // fine-centroid skew (all k fine centroids in one coarse group → the
    // in-group join alone is n·k) hide behind a healthy cross-join side.
    def joinRows(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      df.collect() // executes THIS queryExecution (count() would plan its own)
      val p = df.queryExecution.executedPlan
      val bnlj = p.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec =>
          j.metrics.get("numOutputRows").map(_.value).getOrElse(0L)
      }.sum
      val bhj = p.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
          j.metrics.get("numOutputRows").map(_.value).getOrElse(0L)
      }.sum
      (bnlj, bhj)
    }
    val (flatBnlj, flatBhj) = joinRows(VectorOps.flatAssignProbe(s2, dir))
    val (coarseBnlj, coarseBhj) = joinRows(VectorOps.coarseAssignProbe(s2, dir))
    val (imiBnlj, imiBhj) = joinRows(VectorOps.imiAssignProbe(s2, dir))
    val flat = flatBnlj + flatBhj
    val coarse = coarseBnlj + coarseBhj
    info(s"join output rows: flat=$flat (bnlj=$flatBnlj bhj=$flatBhj) " +
      s"coarse=$coarse (bnlj=$coarseBnlj bhj=$coarseBhj) " +
      s"imi=${imiBnlj + imiBhj} (bnlj=$imiBnlj bhj=$imiBhj)")
    // fixture: n=1000 (augmented), nbase=500, k=16, √k=4.
    // flat: BNLJ ≥ n·k = 16000 (the quadratizing candidate set).
    assert(flat >= 16000L, s"flat probe must materialize the full n·k candidate set, saw $flat")
    // coarse cross-join side — UNCONDITIONAL bound, holds under any
    // fine-centroid distribution: seed builds 2·nbase + fgrp k·√k +
    // vector×coarse n·√k = 1000 + 64 + 4000 = 5064; assert < 8000
    assert(coarseBnlj < 8000L,
      s"coarse cross-join stage must stay O(n·√k): bnlj=$coarseBnlj")
    // coarse in-group side — bound is n·max_g k_g, which DEPENDS on the
    // fine→coarse distribution. On this fixture the seed codebook spreads
    // the 16 fine centroids across the 4 coarse groups (E[k_g]=√k), so
    // Σ n_g·k_g ≈ n·√k ≈ 4000 (+ coarseNE ≤ √k); the 8000 ceiling fails
    // if the in-group restriction is ever lost (which would put this
    // stage at the full n·k = 16000). NOT a worst-case guarantee: total
    // fine-centroid skew would re-quadratize this stage — that skew is
    // what the recall gate + CELL_CAP discipline bound in production.
    assert(coarseBhj < 8000L,
      s"in-group fine pick must stay ~n·√k on this fixture: bhj=$coarseBhj")
    // and the headline: two-level total well under flat's candidate volume
    assert(coarse < (flat * 3) / 4,
      s"two-level assignment must materialize <75% of flat's candidates: coarse=$coarse flat=$flat")
    // three-level descent, cross-join side — UNCONDITIONAL O(n·k^(1/3))
    // bound: three seed builds + l2×l1 (9·3) + fine×l1 (16·3) +
    // vector×l1 n·3 ≈ 5800, plus (round 14) the three 1-row derived-
    // width frame fan-outs (v1, v2, emission each crossJoin the
    // broadcast (p, b1) row — n rows out apiece, 3n = 3000 here; O(n)
    // constants, never candidate-quadratic): ≈ 8800 measured; assert
    // < 12000. Round 10: the descent is two-REGION at this fixture's
    // derived p = 2 (top-2 kept at levels 1 and 2 so `cell2` is the
    // second-best level-2 cell's winner — the nprobe=2 probe target),
    // which doubles the level-2 and fine BHJ stages: ceiling at this
    // fixture is 2n·(l2 per g1 ≤ 3) + 2n·(fine per g2 ≤ 2) + three
    // vec_id rejoins ≤ 2n each = 16000 (measured ≈ 13.4k). At k = 16
    // the k^(1/3)-vs-k asymptotic gap is invisible under that constant
    // 2× (k^(1/3) = 3 vs √k = 4), so the honest fixture asserts are the
    // per-side shape bounds plus total < 2·flat — the widened descent
    // may pay its constant factor but must never re-quadratize; the
    // shape's payoff is measured at the 10⁶/10⁷ probes where k^(1/3)/√k
    // is 27/140.
    assert(imiBnlj < 12000L,
      s"IMI cross-join stages must stay O(n·k^(1/3)) + O(n) frame fan-outs: bnlj=$imiBnlj")
    assert(imiBhj < 16000L,
      s"IMI two-region menu/rejoin stages must stay O(n·k^(1/3)): bhj=$imiBhj")
    assert(imiBnlj + imiBhj < 2 * flat,
      s"three-level two-region descent must stay under 2x flat's candidate volume: imi=${imiBnlj + imiBhj}")
  }

  test("LM perplexity scoring is window-free: no corpus-wide sort anywhere in the plan") {
    // round 9: bigrams now come from zipping the token array with its own
    // shift (map-only) instead of lead() over a per-doc window — the
    // window spelling SORTS the corpus-wide token table (one row per
    // token), the identical sort-spill class that killed dedup_span_removal
    // on disk at the 5M-doc probe. The occurrence-level scoring joins are
    // likewise gone (per-doc distinct-bigram counts join the LM table), so
    // no node in this plan may sort anything corpus-sized: no Window at
    // all, and no sort-merge join.
    val p = plan("text_lm_perplexity")
    assert(!p.contains("Window"),
      s"LM scoring must not window over the token table:\n${p.take(1200)}")
    val smj = p.linesIterator.filter(_.contains("SortMergeJoin")).toList
    assert(smj.isEmpty, s"LM scoring joins must not sort-merge: $smj")
  }

  test("span removal joins the duplicated-hash set hash-partitioned, never sort-merge") {
    // round 9: with no stats on the aggregated dup side the planner's
    // default sort-merge join SORTS the corpus-sized window table (one
    // row per token) — at the 5M-doc probe that sort's spill exhausted
    // the box's 75 GB scratch disk and killed the query. The SHUFFLE_HASH
    // hint streams the window table unsorted; this gate pins it, keyed on
    // the window-hash column so the doc-keyed merge-backs stay free to
    // plan however the optimizer likes.
    val p = plan("dedup_span_removal")
    assert(p.contains("ShuffledHashJoin"),
      s"dup-hash join must be a shuffled hash join:\n${p.take(1200)}")
    val smjOnHash = p.linesIterator
      .filter(l => l.contains("SortMergeJoin") && l.contains("[h#")).toList
    assert(smjOnHash.isEmpty,
      s"the window-hash join must not sort-merge the window table: $smjOnHash")
  }

  test("IVF assignment argmax is sort-free: candidates hash-aggregate, never window-sort") {
    // round 9: the centroid picks run through the ArgTop2 declarative
    // aggregate (4 primitive buffer slots → HashAggregateExec fast path),
    // so the candidate relation collapses map-side inside the stage that
    // produced it. A Window (row_number) spelling — or a buffer type that
    // demotes to SortAggregate — would re-sort the n·√k candidates: the
    // 0.4 TB spill cliff the 10⁷ probe exposed. The ONE legitimate window
    // left in these chains is the hash-seed codebook rank (orders the
    // ~4k-row oversample by the md5 hash — codebook-training scale, never
    // the corpus), so the assert is on WHAT the windows sort: no window
    // may order by a cosine score, which is what a candidate argmax
    // window would do. Assert on BOTH chains.
    for ((name, df) <- Seq(
        "coarse" -> VectorOps.coarseAssignProbe(spark, dir),
        "flat" -> VectorOps.flatAssignProbe(spark, dir),
        "imi" -> VectorOps.imiAssignProbe(spark, dir))) {
      // line-level check (TreeNode.collect does not descend through the
      // AdaptiveSparkPlanExec wrapper): a WindowExec node prints its
      // orderSpec on its own line, so a candidate-argmax window would
      // show "Window [...cos_...]"
      val p = df.queryExecution.executedPlan.toString
      val candidateWindows =
        p.linesIterator.filter(l => l.contains("Window") && l.contains("cos")).toList
      assert(candidateWindows.isEmpty,
        s"$name assignment must not window-sort the candidate relation: $candidateWindows")
      assert(!p.contains("SortAggregate"),
        s"$name assignment argmax fell off the HashAggregate fast path")
      // round 14: the IMI chain's beams are the derived-width ArgTopN
      // (same fixed-primitive-buffer HashAggregate discipline); the
      // two-level and flat chains keep the ArgTop2 argmax
      if (name == "imi")
        assert(p.contains("vec_arg_topn"), s"$name beams must rank via ArgTopN")
      else
        assert(p.contains("vec_arg_top2"), s"$name assignment must argmax via ArgTop2")
    }
  }

  test("every production IVF consumer builds ONLY the coarse assignment; flat = tagged baseline") {
    // round 9: the in-band witness that the five consumer chains run on
    // sharedCoarseAssign — constructing each query in a FRESH session must
    // register the `ivfcoarse:` cache key and never the flat `ivfassign:`
    // one. Construction is where getOrBuild fires, so this needs no
    // execution; the tagged baseline sim_ann_ivf is the positive control
    // proving the flat key would have been observed.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    val consumers = Seq("sim_ann_ivf_coarse", "sim_ann_ivf_probe",
      "sim_ann_quantized_rescore", "sim_ann_ivf_pq", "dedup_semantic",
      "ann_recall")
    consumers.foreach(n => graft.SparkEntry.queries(n)(s2, dir))
    // observedKeys, not liveKeys: cached Datasets are only weakly held
    // once construction returns, so a GC mid-suite can erase a live entry
    // and flake the witness — the demand log is GC-independent
    val keys = CorpusCache.observedKeys(s2)
    assert(keys.exists(_.startsWith("ivfcoarse:")),
      s"consumers must build the coarse assignment, keys=$keys")
    assert(!keys.exists(_.startsWith("ivfassign:")),
      s"no production consumer may build the flat assignment, keys=$keys")
    // positive control: the tagged baseline still builds (and is the only
    // builder of) the flat chain
    graft.SparkEntry.queries("sim_ann_ivf")(s2, dir)
    assert(CorpusCache.observedKeys(s2).exists(_.startsWith("ivfassign:")),
      "control: the tagged baseline must register the flat key")
  }

  test("shard export: no corpus-sized unpartitioned window; offsets broadcast") {
    // the two-level prefix sum's contract: per-part windows sort bounded
    // hash slices, the ONLY unpartitioned window runs over the 16-row
    // per-part aggregate (a regression to a global corpus cumsum —
    // the domain_cap failure mode — puts doc_id under an empty
    // partition spec), and the offset table reaches the corpus by
    // broadcast, never a shuffle join
    val df = graft.SparkEntry.queries("curation_shard_export")(spark, dir)
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty, "shard export must window (cumsum + ordinal)")
    windows.filter(_.partitionSpec.isEmpty).foreach { w =>
      val names = w.child.output.map(_.name)
      assert(!names.contains("doc_id"),
        s"an unpartitioned window may only run over the per-part aggregate, saw $names")
    }
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"per-part offsets must broadcast into the corpus:\n${p.take(800)}")
  }

  test("two-tier cell scan: the ck candidate join carries the sketch, never full vectors") {
    // round 10: the within-cell candidate join (the family's dominant
    // cost at 10⁷ — ~1.1×10¹⁰ pairs over a ~5.6 GB/side spilling shuffle)
    // must shuffle ONLY the pair sketch (16-d head + tail norm + norm);
    // full 64-float vectors may appear only in the per-survivor rescore
    // fetch. A regression that rejoins embeddings below the ck join
    // re-inflates the shuffle 3.5× and the pair dot 4×.
    import org.apache.spark.sql.functions._
    VectorOps.register(spark)
    val df = VectorOps.cellVerifiedPairs(spark, dir,
      VectorOps.sharedCoarseAssign(spark, dir))
    // the candidate PAIR join: keyed on ck AND two-sided (both pair ids in
    // its output) — the round-15 band split adds per-side boundary joins
    // that also key on ck but are one-sided k-row broadcasts, not the pair
    // space this pin guards
    def ckJoins(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      p.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join
            if j.condition.exists(_.references.exists(_.name == "ck")) &&
              Set("i", "j").subsetOf(j.output.map(_.name).toSet) => j
      }
    val joins = ckJoins(df.queryExecution.optimizedPlan)
    assert(joins.nonEmpty, "pair scan must join on the refined cell key")
    joins.foreach { j =>
      val names = j.output.map(_.name)
      assert(!names.exists(Set("ea", "eb", "embedding")),
        s"candidate join must carry the sketch, not full vectors: $names")
      assert(names.contains("ha") && names.contains("hb"),
        s"candidate join must carry the sketch heads: $names")
    }
    // the rescore fetches are equi-joins on vec_id — never a nested-loop
    // or cartesian re-expansion of the pair space
    val pstr = df.queryExecution.executedPlan.toString
    assert(!pstr.contains("CartesianProduct"), pstr.take(1200))
    // negative control: the single-tier exact shape (the pre-round-10
    // plan) must trip the same probe — proves the guard can fail
    def vdot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      call_function("vec_dot", a, b)
    val base = graft.Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val aug = base.unionByName(
      base.select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
    val n = aug.withColumn("nrm", sqrt(vdot(col("embedding"), col("embedding"))))
      .join(VectorOps.sharedCoarseAssign(spark, dir), Seq("vec_id"))
    val l = n.select(col("ck"), col("vec_id").as("i"), col("embedding").as("ea"), col("nrm").as("na"))
    val r = n.select(col("ck"), col("vec_id").as("j"), col("embedding").as("eb"), col("nrm").as("nb"))
    val exact = l.join(r, Seq("ck")).filter(col("i") < col("j"))
      .withColumn("cos", vdot(col("ea"), col("eb")) / (col("na") * col("nb")))
      .filter(col("cos") >= 0.999)
      .select(col("i"), col("j"))
    val badJoins = ckJoins(exact.queryExecution.optimizedPlan)
    assert(badJoins.exists(_.output.exists(a => Set("ea", "eb")(a.name))),
      "control: the single-tier shape should carry full vectors through the ck join")
  }
}
