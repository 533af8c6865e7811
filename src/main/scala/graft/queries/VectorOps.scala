package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Embedding similarity operators over `embeddings` (Array[Float], 64-d).
  *
  * Numeric discipline: every dot/norm accumulates exact double products of
  * float32 values via a sequential left-to-right fold (`aggregate` over
  * `zip_with`), matching the oracle's list_sum over list_zip. Display values
  * round to 6 dp; ordering uses full precision (gaps between random-vector
  * cosines are ~1e-3, far above accumulated fold error ~1e-13).
  *
  * Scale notes (100 TB design): the exact-cosine ground-truth fixtures
  * (brute-force top-k, threshold pairs, the ann_recall truth side) are
  * ANCHORED — a derived-constant sample of ~128 anchor vectors, each
  * compared against the full corpus (O(s·n), see [[AnchorSample]]) — so
  * recall governance itself survives a 100× corpus. The LSH paths are the
  * scale story:
  * random-hyperplane signatures bucket the vectors so the pair join only
  * materializes within-bucket candidates; `sim_ann_lsh_multiprobe` extends
  * recall to hamming-≤1 buckets via one-bit signature flips. The IVF path
  * (`sim_ann_ivf`) k-means the corpus (deterministic seeds + one Lloyd
  * refinement) and joins within nearest-centroid cells — same bucket-join
  * shape, nprobe as the recall lever.
  */
object VectorOps {

  private val TOPK = 5
  private val COS_T = 0.45
  private val NPLANES = 12
  private val ANN_T = 0.999

  /** Margin threshold for the gated nprobe=2 search (round 11 — the
    * FAISS refinement discipline): a vector probes its second-best
    * region's cell only when its assignment margin (cos to the winning
    * centroid minus cos to the runner-up) is at most this — i.e. only
    * BOUNDARY vectors pay the second probe; a decisive winner's
    * ≥COS_T-similar neighbors co-assign with it anyway. Calibrated with
    * [[MarginProbe]] against the anchored-truth governance at ALL THREE
    * sfs (SCALE.md round 11): τ = 0.1 holds the ivf_imi recall at
    * exactly its ungated level everywhere (0.9512 / 0.9015 / 0.8629 at
    * sf0.001/0.01/0.1) while probing only 42–49% of second regions;
    * τ = 0.05 was measured to LOSE truth pairs at sf0.01 and sf0.1
    * (0.8864 / 0.8514) — the recall-relevant probes concentrate at
    * small margins, but not under 0.05. Shared verbatim by the
    * oracle twins (the margin is a difference of the same
    * bit-reproducible cosine doubles both engines rank by, so the gate
    * decision is engine-independent).
    */
  private[queries] val PROBE_MARGIN_T = 0.1d

  /** Random-projection output dimension (`emb_random_projection`) and the
    * corpus dimension it contracts from. The ±1 sign matrix is DERIVED,
    * not random state: sign(d,k) = parity of md5("d:k") (the engine's
    * md5Key64 keyspace), so any executor — or the DuckDB oracle — can
    * regenerate the identical matrix from nothing. It is computed ONCE on
    * the driver and ships as 16 literal arrays inside the plan (~8 KB):
    * the per-row path is pure fold arithmetic, no hashing.
    */
  private val RP_K = 16
  private val RP_D = 64

  /** sign[k][d] ∈ {±1}: Scala twin of md5Key64 (md5 hex → first 15 nibbles
    * as a 60-bit long), parity-mapped. Pinned against the Column-side
    * md5Key64 in [[QueryInvariantSpec]] so the three spellings (Scala,
    * Spark md5, DuckDB md5) can never drift apart silently.
    */
  private[queries] lazy val rpSigns: IndexedSeq[IndexedSeq[Double]] =
    (0 until RP_K).map { k =>
      (0 until RP_D).map { d =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$d:$k".getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString.take(15)
        if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1.0d else -1.0d
      }
    }

  /** Exact L2² between two float subvectors — sequential fold, the
    * oracle-portable spelling (matches list_sum over list_zip).
    */
  private def pqDist2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => {
      val d = x.cast(DoubleType) - y.cast(DoubleType)
      d * d
    }), lit(0.0d), (acc, v) => acc + v)

  /** PQ codebook: entry c of subspace m = vector c's m-th subvector
    * (c < 16) — the IVF-seeds discipline; 128 rows, always broadcast.
    */
  private def pqCodebook(emb: DataFrame): DataFrame =
    emb.filter(col("vec_id") < 16)
      .select(col("vec_id").cast(IntegerType).as("code"),
        explode(sequence(lit(0), lit(7))).as("m"), col("embedding"))
      .select(col("code"), col("m"),
        slice(col("embedding"), col("m") * 8 + 1, lit(8)).as("cb"))

  /** (vec_id, m, sv): every vector exploded into its 8 subvectors. */
  private def pqSubvectors(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), explode(sequence(lit(0), lit(7))).as("m"), col("embedding"))
      .select(col("vec_id"), col("m"),
        slice(col("embedding"), col("m") * 8 + 1, lit(8)).as("sv"))

  /** PQ code table over the augmented corpus, built ONCE per (session,
    * corpus) and served to both search paths (`sim_ann_pq_adc`,
    * `sim_ann_ivf_pq`) — the same maintained-index discipline as the LSH
    * signature and IVF assignment tables.
    */
  private def sharedPqCodes(s: SparkSession, dir: String): DataFrame =
    CorpusCache.getOrBuild(s, s"pqcodes:$dir") {
      val aug = augmented(s, dir)
      pqAssign(pqSubvectors(aug), pqCodebook(aug))
        .select(col("vec_id"), col("m"), col("code"))
    }

  /** Nearest-codebook-entry assignment per (vector, subspace): exact-L2
    * argmin with (d2, code) tie-break. Returns (vec_id, m, code, d2).
    */
  private def pqAssign(sv: DataFrame, cb: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id"), col("m"))
      .orderBy(col("d2").asc, col("code").asc)
    sv.join(broadcast(cb), Seq("m"))
      .withColumn("d2", pqDist2(col("sv"), col("cb")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("m"), col("code"), col("d2"))
  }

  /** Quantized-prefilter relaxation (`sim_ann_quantized_rescore`): must
    * exceed the worst-case int8 cosine error so the code-space filter can
    * never drop a pair the exact rescore would keep. Bound at 64-d:
    * |cos_q − cos| ≤ (0.5·√d/127)·(max_a/‖a‖ + max_b/‖b‖) ≈ 0.024 for
    * random vectors (max/‖·‖ ≈ 0.38); 0.05 leaves 2× headroom.
    */
  private val QP_MARGIN = 0.05

  /** Head width of the pair-scoring sketch ([[sharedPairSketch]]) and the
    * numeric slack of its Cauchy–Schwarz candidate bound. The bound is
    * superset-safe by ALGEBRA, not by margin tuning: for any pair,
    * dot(a,b) = dot(a_h,b_h) + dot(a_t,b_t) ≤ dot(a_h,b_h) + ‖a_t‖·‖b_t‖
    * (Cauchy–Schwarz on the 48-d tails), so every pair whose exact cosine
    * clears ANN_T also clears the bound filter — the rescore can only
    * discard, never resurrect. BOUND_EPS absorbs double-fold rounding
    * (~1e-13 at these magnitudes; 1e-9 is ~10⁴× headroom and admits only
    * a vanishing sliver of extra candidates). Selectivity at ANN_T=0.999:
    * for random 64-d pairs E[‖a_t‖‖b_t‖/(‖a‖‖b‖)] ≈ 48/64 and the head
    * term concentrates at ±(1/16), so non-near-dup candidates clear the
    * bound with probability ≈ Φ(−4σ) — the within-cell pair scan does a
    * 16-d dot per candidate and a 64-d dot only per (near-)duplicate.
    */
  private val HEAD_D = 16
  private val BOUND_EPS = 1e-9

  /** Numeric slack of the NORMALIZED tier-1 bound (round 16): the sketch
    * stores x_i/‖x‖ rounded to f32, so dot(ha, hb) differs from the true
    * dot(a_h/‖a‖, b_h/‖b‖) by at most Σ(|δa_i||b_i| + |a_i||δb_i| +
    * |δa_i||δb_i|) ≤ 2·2⁻²⁴·Σ|a_i b_i|/(‖a‖‖b‖) + O(2⁻⁴⁸) ≤ 2⁻²³ by
    * Cauchy–Schwarz (unit-normalized sides) ≈ 1.2·10⁻⁷; the tail-norm
    * product and the double-fold sum add ≤ ~10⁻¹³. 10⁻⁶ is ~8× headroom
    * — and, like [[BOUND_EPS]], it only ever ADMITS a sliver of extra
    * candidates for the exact rescore to discard: the bound stays a true
    * upper bound of the exact cosine, so the verified output is
    * bit-identical (QueryInvariantSpec pins the equality).
    */
  private[queries] val SKETCH_EPS = 1e-6

  /** Exact double dot product, sequential fold (oracle-portable). Uses the
    * native FloatVecDot expression (graft.expr) — bit-identical to the
    * zip_with/aggregate spelling but allocation-free inside codegen, which
    * is what makes the quadratic similarity joins tractable.
    */
  private def dot(a: Column, b: Column): Column =
    call_function("vec_dot", a, b)

  private[queries] def register(s: SparkSession): Unit = {
    graft.expr.FloatVecDot.register(s)
    // the assignment argmax aggregate (round 9) rides the same
    // registration path as the deployment's spark.sql.extensions
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_arg_top2", graft.GraftExtensions.builder("vec_arg_top2"), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_arg_max1", graft.GraftExtensions.builder("vec_arg_max1"), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_arg_topn", graft.GraftExtensions.builder("vec_arg_topn"), "built-in")
  }

  /** Top-N (ord DESC, id ASC) rows per group as a null-padded ranked array
    * of struct(cs, cid) — the sort-free generalized beam (graft.expr
    * .ArgTopN). `cap` is the plan-static buffer width: callers pass the
    * corpus-derived width ([[staticProbeWidth]]) so a gate corpus plans
    * 2-slot buffers while the billion-vector regime gets [[PROBE_CAP]].
    */
  private def argTopN(ord: Column, id: Column, cap: Int): Column =
    call_function("vec_arg_topn", ord, id, lit(cap))

  /** Top-2 centroid ids per group under (ord DESC, id ASC) — the
    * sort-free argmax (graft.expr.ArgTop2); returns struct(cell, cell2).
    */
  private def argTop2(ord: Column, id: Column): Column =
    call_function("vec_arg_top2", ord, id)

  /** Argmax per group under (ord DESC, id ASC) CARRYING its score — the
    * sort-free score-keeping argmax (graft.expr.ArgMax1); returns
    * struct(cs, cid).
    */
  private def argMax1(ord: Column, id: Column): Column =
    call_function("vec_arg_max1", ord, id)

  private def norm(v: Column): Column = sqrt(dot(v, v))

  private def withNorm(df: DataFrame): DataFrame =
    df.withColumn("nrm", norm(col("embedding")))

  /** Anchored exact-cosine threshold pairs — the scale-safe ground-truth
    * kernel (see [[AnchorSample]]): every ANCHOR vector is compared against
    * the FULL corpus (O(s·n), s ≈ 128 at any scale, never O(n²)), and the
    * directed hits are normalized to unordered (i < j) pairs. The cosine is
    * bitwise symmetric (the fold multiplies the same components in the same
    * order), so a pair of two anchors collapses under distinct. The anchor
    * side is ~s rows → Spark broadcasts it and the corpus never shuffles.
    */
  private def anchoredCosinePairs(emb: DataFrame, thr: Double): DataFrame = {
    val n = AnchorSample.withAnchors(withNorm(emb), col("vec_id"))
    val a = n.filter(col("is_anchor"))
      .select(col("vec_id").as("u"), col("embedding").as("ea"), col("nrm").as("na"))
    val b = n.select(col("vec_id").as("v"), col("embedding").as("eb"), col("nrm").as("nb"))
    // explicit hint: the anchor side is ~s rows at any corpus size, but
    // Spark's stats can't see through the is_anchor filter — unhinted it
    // may shuffle/replicate the corpus side instead of broadcasting a
    broadcast(a).crossJoin(b).filter(col("u") =!= col("v"))
      .withColumn("cos", dot(col("ea"), col("eb")) / (col("na") * col("nb")))
      .filter(col("cos") >= thr)
      .select(least(col("u"), col("v")).as("i"),
        greatest(col("u"), col("v")).as("j"), col("cos"))
      .distinct()
  }

  /** Anchored exact-cosine governance truth over the AUGMENTED corpus,
    * cached per (session, corpus) like the indexes it audits (round 14 —
    * the round-13 verdict's bench-cost item: the truth cross-join and the
    * per-component md5 corpus derivations were rebuilt on every
    * governance evaluation; one maintained table serves `ann_recall`,
    * the margin sweep, and the band decomposition, with every consumer
    * deriving its own flags/bands from the exact cosine by projection).
    * Anchored (O(s·n)) and near-dup-sized — the same boundedness class
    * as the cached pair/signature tables.
    */
  private[queries] def sharedAnnTruth(s: SparkSession, dir: String): DataFrame =
    CorpusCache.getOrBuild(s, s"anntruth:$dir")(
      anchoredCosinePairs(augmented(s, dir), COS_T))

  /** Anchored governance truth over the NEAR-TWIN corpus, cached like
    * [[sharedAnnTruth]].
    */
  private[queries] def sharedNtTruth(s: SparkSession, dir: String): DataFrame =
    CorpusCache.getOrBuild(s, s"nttruth:$dir")(
      anchoredCosinePairs(ntAugmented(s, dir), COS_T))

  /** The governance anchor sets (vec_id rows, ~[[AnchorSample.TargetAnchors]]
    * at any scale), cached with their truth tables.
    */
  private[queries] def sharedAnnAnchors(s: SparkSession, dir: String): DataFrame =
    CorpusCache.getOrBuild(s, s"annanchors:$dir")(
      AnchorSample.withAnchors(augmented(s, dir).select(col("vec_id")), col("vec_id"))
        .filter(col("is_anchor")).select(col("vec_id")))

  private[queries] def sharedNtAnchors(s: SparkSession, dir: String): DataFrame =
    CorpusCache.getOrBuild(s, s"ntanchors:$dir")(
      AnchorSample.withAnchors(ntAugmented(s, dir).select(col("vec_id")), col("vec_id"))
        .filter(col("is_anchor")).select(col("vec_id")))

  /** Anchored banded exact-cosine truth over the near-twin corpus —
    * shared by the `ann_recall_neartwin` gate and the capture-contract
    * spec so both audit the identical truth relation.
    */
  private[queries] def anchoredNtTruthBands(s: SparkSession, dir: String): DataFrame =
    sharedNtTruth(s, dir)
      .select(col("i"), col("j"),
        when(col("cos") >= ANN_T, "a_dup")
          .when(col("cos") >= NT_BAND_LO, "b_neartwin")
          .otherwise("c_tail").as("band"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Norm/stat sanity pass over the embedding column.
    "emb_norms" -> ((s, dir) => {
      register(s)
      withNorm(Tables.embeddings(s, dir))
        .select(col("vec_id"), col("label"),
          round(col("nrm"), 6).as("l2_norm"),
          size(col("embedding")).as("dim"))
    }),

    // Brute-force cosine top-k per ANCHOR vector — exact truth for a
    // derived-constant anchor sample (see AnchorSample), each anchor ranked
    // against the FULL corpus: O(s·n) work, the production recall-estimation
    // shape, never O(n²). Anchors broadcast; the corpus never shuffles.
    "sim_topk_bruteforce" -> ((s, dir) => {
      register(s)
      val n = AnchorSample.withAnchors(withNorm(Tables.embeddings(s, dir)), col("vec_id"))
      val a = n.filter(col("is_anchor"))
        .select(col("vec_id"), col("embedding").as("ea"), col("nrm").as("na"))
      val b = n.select(col("vec_id").as("neighbor_id"), col("embedding").as("eb"), col("nrm").as("nb"))
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("cos").desc, col("neighbor_id").asc)
      // same anchor-side broadcast hint as anchoredCosinePairs
      broadcast(a).crossJoin(b).filter(col("vec_id") =!= col("neighbor_id"))
        .withColumn("cos", dot(col("ea"), col("eb")) / (col("na") * col("nb")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= TOPK)
        .select(col("vec_id"), col("rn").as("rank"), col("neighbor_id"),
          round(col("cos"), 6).as("cosine"))
    }),

    // Embedding near-duplicate pairs above a cosine threshold — anchored
    // exact truth (every anchor vs the full corpus), the labeled metric
    // twin of the bucketed ANN paths.
    "dedup_embedding_cosine" -> ((s, dir) => {
      register(s)
      anchoredCosinePairs(Tables.embeddings(s, dir), COS_T)
        .select(col("i"), col("j"), round(col("cos"), 6).as("cosine"))
    }),

    // ANN via random-hyperplane LSH: signature = sign bits of projections on
    // NPLANES pseudo-random ±1 hyperplanes (deterministic from md5 parity).
    // Near-dup search joins only within signature buckets — identical
    // vectors always collide (identical projections), so recall for true
    // duplicates is exactly 1.0 with a single table. The corpus is augmented
    // with planted duplicate vectors (vec_id + 100000) to give the operator
    // real positives; looser thresholds need L multi-probe tables (same
    // bucket-join shape, L× signatures).
    "sim_ann_lsh" -> ((s, dir) => {
      register(s)
      val emb = augmented(s, dir)
      val sigs = sharedLshSigs(s, dir)
      val e = withNorm(emb).join(sigs, Seq("vec_id"))
      val a = e.select(col("bucket"), col("vec_id").as("i"), col("embedding").as("ea"), col("nrm").as("na"))
      val b = e.select(col("bucket"), col("vec_id").as("j"), col("embedding").as("eb"), col("nrm").as("nb"))
      a.join(b, Seq("bucket")).filter(col("i") < col("j"))
        .withColumn("cos", dot(col("ea"), col("eb")) / (col("na") * col("nb")))
        .filter(col("cos") >= ANN_T)
        .select(col("i"), col("j"), round(col("cos"), 6).as("cosine"))
    }),

    // INCREMENTAL ANN — the daily-embedding-ingest pattern (the ANN twin of
    // dedup_incremental): a NEW batch of query vectors (4-multiples, ids
    // +200000, identical payloads so the gate has guaranteed positives) is
    // signed and searched against the CORPUS signature index via a bucket
    // equi-join; the corpus is never re-indexed and never self-joins.
    //
    // The corpus index lives in CorpusCache — maintained per (session,
    // corpus) like the production state it models, NOT rebuilt per search.
    // Round-7 bench finding: the previous shape signed corpus ∪ batch into
    // per-query scratch, so once ScratchCache started draining honestly
    // (round-5 advice), every run re-paid the full corpus signing — the
    // r5 "0.38 s" was an artifact of pass 2 reading pass 1's leaked
    // persist. Per-search work is now sign-the-batch + one bucket
    // equi-join, the real incremental cost. Signatures are per-vector
    // (hyperplanes derive from md5 of (plane, dim)), so signing the batch
    // alone is bit-identical to signing it inside any union.
    "sim_ann_incremental" -> ((s, dir) => {
      register(s)
      val corpus = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      val idx = CorpusCache.getOrBuild(s, s"incsigs:$dir")(
        withNorm(corpus).join(lshSigs(s, corpus), Seq("vec_id"))
          .select(col("bucket"), col("vec_id").as("match_id"),
            col("embedding").as("eb"), col("nrm").as("nb")))
      val batch = corpus.filter(col("vec_id") % 4 === 0)
        .select((col("vec_id") + 200000).as("vec_id"), col("embedding"))
      val q = withNorm(batch).join(lshSigs(s, batch), Seq("vec_id"))
        .select(col("bucket"), col("vec_id").as("query_id"),
          col("embedding").as("ea"), col("nrm").as("na"))
      q.join(idx, Seq("bucket"))
        .withColumn("cos", dot(col("ea"), col("eb")) / (col("na") * col("nb")))
        .filter(col("cos") >= ANN_T)
        .select(col("query_id"), col("match_id"), round(col("cos"), 6).as("cosine"))
    }),

    // Multi-probe LSH: each vector additionally probes every bucket at
    // hamming distance 1 from its own signature (12 one-bit flips + the
    // exact bucket). Candidate volume grows ×(NPLANES+1) but recall extends
    // from hamming-0 to hamming-≤1 collisions — the standard trade when
    // adding L independent tables is too expensive. Probe side joins
    // against EXACT signatures, so the join stays an equi-join on the
    // bucket string; exact-cosine verification unchanged.
    "sim_ann_lsh_multiprobe" -> ((s, dir) => {
      register(s)
      val emb = augmented(s, dir)
      val cand = multiprobeCandidates(sharedLshSigs(s, dir))
      val n = withNorm(emb)
      cand
        .join(n.select(col("vec_id").as("i"), col("embedding").as("ea"), col("nrm").as("na")), Seq("i"))
        .join(n.select(col("vec_id").as("j"), col("embedding").as("eb"), col("nrm").as("nb")), Seq("j"))
        .withColumn("cos", dot(col("ea"), col("eb")) / (col("na") * col("nb")))
        .filter(col("cos") >= ANN_T)
        .select(col("i"), col("j"), round(col("cos"), 6).as("cosine"))
    })
  )

  /** Distinct within-bucket candidate pairs (i < j) from exact signatures. */
  private def lshCandidates(sigs: DataFrame): DataFrame =
    sigs.select(col("bucket"), col("vec_id").as("i"))
      .join(sigs.select(col("bucket"), col("vec_id").as("j")), Seq("bucket"))
      .filter(col("i") < col("j"))
      .select(col("i"), col("j")).distinct()

  /** The one-bit-flip probe expansion shared by full and anchor-restricted
    * multiprobe: each row of `sigs` probes its exact bucket (f = 0) plus
    * every bucket at hamming distance 1.
    */
  private def probeExpansion(sigs: DataFrame): DataFrame =
    sigs.select(col("vec_id"), col("bucket"),
      explode(sequence(lit(0), lit(NPLANES))).as("f"))
      .withColumn("probe",
        when(col("f") === 0, col("bucket"))
          .otherwise(concat(
            col("bucket").substr(lit(1), col("f") - 1),
            when(col("bucket").substr(col("f"), lit(1)) === "0", "1").otherwise("0"),
            col("bucket").substr(col("f") + 1, lit(NPLANES)))))

  /** Multi-probe candidates: each vector probes its exact bucket plus every
    * bucket at hamming distance 1 (NPLANES one-bit flips); probes join
    * against EXACT signatures so the join stays an equi-join on the bucket
    * string.
    */
  private def multiprobeCandidates(sigs: DataFrame): DataFrame =
    probeExpansion(sigs)
      .select(col("probe").as("bucket"), col("vec_id").as("i"))
      .join(sigs.select(col("bucket"), col("vec_id").as("j")), Seq("bucket"))
      .filter(col("i") < col("j"))
      .select(col("i"), col("j")).distinct()

  /** Candidate pairs TOUCHING AN ANCHOR, built anchor-side-first: the
    * anchor rows of `keyed` (a semi-join against the ~s-row anchor set)
    * equi-join the full table on `key`, normalized to i < j. Because
    * "shares a bucket" / "same cell" is symmetric, this is EXACTLY the
    * touching-an-anchor subset of the full i<j candidate set
    * ([[QueryInvariantSpec]] pins the equality) — so a semi-join of
    * anchored truth against it counts the same n_found as against the full
    * set, at O(s·bucket) instead of O(Σ bucket²). Recall estimation that
    * audits a corpus-scale index must itself stay sub-quadratic, truth AND
    * candidates both.
    */
  private def anchorCandidates(keyed: DataFrame, key: String,
      anchors: DataFrame): DataFrame =
    keyed.join(anchors, Seq("vec_id"), "left_semi")
      .select(col(key), col("vec_id").as("u"))
      .join(keyed.select(col(key), col("vec_id").as("v")), Seq(key))
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("i"),
        greatest(col("u"), col("v")).as("j"))
      .distinct()

  /** Anchor-touching nprobe=2 IVF candidates (round 10 — the recall
    * governance twin of [[probeVerifiedPairs]]'s candidate shape): the
    * cell-probe relation is NOT symmetric (u probing v's home does not
    * imply v probes u's), so the anchor restriction must cover BOTH
    * directions — anchors as probers (anchor's cell ∪ cell2 × every
    * home) and anchors as homes (every prober × the anchor's cell).
    * Their union is exactly the anchor-touching subset of the full
    * probe candidate set, at O(s·cell) cost.
    */
  private def probeAnchorCandidates(assign: DataFrame,
      anchors: DataFrame): DataFrame =
    // the SAME margin gate as [[probeVerifiedPairs]]: the governance row
    // must audit exactly the candidate shape the gate searches
    probeAnchorCandidatesAt(assign, anchors, PROBE_MARGIN_T)

  /** [[probeAnchorCandidates]] at an explicit margin threshold — the
    * calibration/spec seam (τ = 2.0 ≥ any possible cosine margin =
    * ungated).
    */
  private[queries] def probeAnchorCandidatesAt(assign: DataFrame,
      anchors: DataFrame, tau: Double): DataFrame = {
    // round 14: extra regions come from the chain's ranked probe list
    // (derived width for the IMI chain, the runner-up for two-level) —
    // each gated by its OWN cross-region margin at τ
    val probes = assign.select(col("cell").as("pc"), col("vec_id"))
      .unionByName(assign
        .select(col("vec_id"), explode(col("probes")).as("pr"))
        .filter(col("pr").getField("mgn") <= lit(tau))
        .select(col("pr").getField("pc").as("pc"), col("vec_id")))
    val homes = assign.select(col("cell").as("pc"), col("vec_id"))
    val aProbes = probes.join(anchors, Seq("vec_id"), "left_semi")
    val aHomes = homes.join(anchors, Seq("vec_id"), "left_semi")
    aProbes.select(col("pc"), col("vec_id").as("u"))
      .join(homes.select(col("pc"), col("vec_id").as("v")), Seq("pc"))
      .unionByName(probes.select(col("pc"), col("vec_id").as("u"))
        .join(aHomes.select(col("pc"), col("vec_id").as("v")), Seq("pc")))
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("i"),
        greatest(col("u"), col("v")).as("j"))
      .distinct()
  }

  /** Margin-gate calibration sweep (round 11): for each candidate τ,
    * the ann_recall-shaped anchored-truth recall of the IMI nprobe=2
    * candidate set gated at τ, plus the fraction of vectors whose second
    * region is actually probed. The τ grid is evaluated against ONE
    * persisted truth/anchor/assignment build, so a sweep costs little
    * more than a single governance row. Driven by [[MarginProbe]].
    */
  private[queries] def marginSweep(s: SparkSession, dir: String,
      taus: Seq[Double], nt: Boolean = false): Seq[(Double, String, Long, Long, Double, Double)] = {
    register(s)
    // round 13: the sweep reports PER-BAND recall — the τ decision is
    // owned by the band the apparatus serves (near-twins that straddle
    // regions), and a blended number buries it under the geometric tail.
    // Round 14: truth/anchors come from the shared cached governance
    // tables ([[sharedAnnTruth]] and friends) like the assignments.
    val truth = (if (nt) sharedNtTruth(s, dir) else sharedAnnTruth(s, dir))
      .select(col("i"), col("j"),
        when(col("cos") >= ANN_T, "a_dup")
          .when(col("cos") >= NT_BAND_LO, "b_neartwin")
          .otherwise("c_tail").as("band"))
    val anchors = if (nt) sharedNtAnchors(s, dir) else sharedAnnAnchors(s, dir)
    val assign = if (nt) sharedImiAssignNt(s, dir) else sharedImiAssign(s, dir)
    val nVec = assign.count()
    taus.flatMap { tau =>
      val cand = probeAnchorCandidatesAt(assign, anchors, tau)
      val probed = assign.filter(col("cell2").isNotNull &&
        col("mgn") <= lit(tau)).count()
      val frac = probed.toDouble / math.max(nVec, 1L)
      truth.join(cand.withColumn("hit", lit(1L)), Seq("i", "j"), "left")
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n_true"),
          sum(coalesce(col("hit"), lit(0L))).as("n_found"))
        .collect()
        .map(r => (tau, r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(2).toDouble / math.max(r.getLong(1), 1L), frac))
        .sortBy(_._2)
    }
  }

  /** Recall DECOMPOSITION by truth-pair cosine band and copy locality
    * (round 12, driven by [[RecallProbe]]): the ann_recall governance
    * number is candidate recall over ALL anchored truth pairs at COS_T —
    * a mix of (a) exact/planted duplicates and strong structural pairs
    * (what the IVF consumers actually OUTPUT after the ANN_T=0.999
    * verification, and what SemDeDup-style curation acts on) and (b) the
    * random geometric tail of a 64-dim corpus (pairs at barely-COS_T
    * whose directions are independent — at k=⌈n/1024⌉ cells their
    * co-assignment probability decays like nprobe²/k, so NO bounded-probe
    * index finds them, by geometry rather than by defect). At gate sfs k
    * is 1–4 and the tail co-assigns by pigeonhole, masking the mix; at
    * 10⁶⁺ the tail dominates n_true and the blended number collapses even
    * while band (a) stays found. This decomposition separates the two so
    * the governance floor can be read against the band the production
    * consumers depend on. `copySpan` labels same-copy pairs on the
    * synth_scale probe fixtures (ID_SHIFT=10⁷); pass 0 to skip.
    */
  private[queries] def recallBands(s: SparkSession, dir: String,
      tau: Double, copySpan: Long, nt: Boolean = false): DataFrame = {
    register(s)
    val truth = if (nt) sharedNtTruth(s, dir) else sharedAnnTruth(s, dir)
    val anchors = if (nt) sharedNtAnchors(s, dir) else sharedAnnAnchors(s, dir)
    val assign = if (nt) sharedImiAssignNt(s, dir) else sharedImiAssign(s, dir)
    val cand = probeAnchorCandidatesAt(assign, anchors, tau)
      .withColumn("found", lit(1L))
    val sameCopy =
      if (copySpan > 0) floor(col("i") / copySpan) === floor(col("j") / copySpan)
      else lit(true)
    truth.join(cand, Seq("i", "j"), "left")
      .withColumn("band",
        when(col("cos") >= 0.999, "a_dup_0.999+")
          .when(col("cos") >= NT_BAND_LO, "b_ntwin_0.95+")
          .when(col("cos") >= 0.8, "c_strong_0.80+")
          .when(col("cos") >= 0.6, "d_mid_0.60+")
          .otherwise("e_tail_0.45+"))
      .withColumn("same_copy", sameCopy)
      .groupBy(col("band"), col("same_copy"))
      .agg(count(lit(1)).as("n_true"),
        sum(coalesce(col("found"), lit(0L))).as("n_found"))
      .withColumn("recall",
        round(col("n_found").cast(org.apache.spark.sql.types.DoubleType) /
          col("n_true"), 4))
      .orderBy(col("band"), col("same_copy"))
  }

  /** Anchor-touching multiprobe pairs: only ANCHORS probe (the hamming-1
    * relation is symmetric, so anchor-as-prober already covers every pair
    * with an anchor on either side), joined against the full exact
    * signature table on the bucket string.
    */
  private def multiprobeAnchorCandidates(sigs: DataFrame,
      anchors: DataFrame): DataFrame =
    probeExpansion(sigs.join(anchors, Seq("vec_id"), "left_semi"))
      .select(col("probe").as("bucket"), col("vec_id").as("u"))
      .join(sigs.select(col("bucket"), col("vec_id").as("v")), Seq("bucket"))
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("i"),
        greatest(col("u"), col("v")).as("j"))
      .distinct()

  /** Random-hyperplane signatures: w ∈ {+1,-1} from md5 parity of "p:d",
    * projections via one shuffle on (vec_id, p), bit-string bucket.
    */
  private def lshSigs(s: SparkSession, emb: DataFrame): DataFrame = {
    val planes = s.range(NPLANES).select(col("id").cast(IntegerType).as("p"))
      .crossJoin(s.range(64).select(col("id").cast(IntegerType).as("d")))
      .withColumn("w",
        (conv(substring(md5(concat_ws(":", col("p"), col("d"))), 1, 15), 16, 10)
          .cast(LongType) % 2 * 2 - 1).cast(DoubleType))
    val comps = emb.select(col("vec_id"), posexplode(col("embedding")).as(Seq("d", "x")))
    comps.join(broadcast(planes), Seq("d"))
      .groupBy(col("vec_id"), col("p"))
      .agg(sum(col("x").cast(DoubleType) * col("w")).as("proj"))
      .groupBy(col("vec_id"))
      .agg(concat_ws("", transform(array_sort(collect_list(struct(col("p"),
        when(col("proj") > 0, lit(1)).otherwise(lit(0)).as("bit")))),
        x => x.getField("bit").cast(StringType))).as("bucket"))
  }

  /** IVF scale parameters (round-5 advice: a FIXED k means cell size grows
    * O(n/k) and the within-cell pair join re-quadratizes as the corpus
    * grows). k now derives from the corpus: k = max(MIN_CENTROIDS,
    * ceil(n / TARGET_CELL)), computed as a broadcast 1-row aggregate — no
    * driver-side action — so expected cell membership stays ~TARGET_CELL at
    * any scale (10⁹ vectors → ~10⁶ cells). On the test fixture the derived
    * k is exactly MIN_CENTROIDS, so the gates pin the same partitioning.
    *
    * CELL_CAP is the hot-cell guard (SemDeDup's own split discipline): a
    * cell with more members than the cap — skewed data piling onto one
    * centroid — refines its join key with the SECOND-nearest centroid
    * (residual-quantization-style sub-split along real geometric
    * boundaries), bounding per-key pair volume without dropping the cell.
    * Identical vectors have identical (cell, cell2), so planted duplicates
    * can never be separated by the split.
    */
  private val MIN_CENTROIDS = 16
  private val TARGET_CELL = 1024.0d
  private[queries] val CELL_CAP = 4096L

  /** Hash-ranked seed codebook (round 9): EXACTLY `k` centroid rows —
    * the `k` smallest (md5-hash, vec_id) pairs of a 4×-oversampled
    * hash-threshold slice of the base corpus. Replaces `vec_id < k`,
    * which silently STARVES the codebook on any corpus whose ids are not
    * dense from 0: the n = 10⁷ probe's shifted-id fixture left only 2000
    * of the intended 19532 seeds live, cells grew 10×, and the
    * within-cell pair join exploded to 7.1·10¹⁰ candidates (1319 s vs the
    * 69 s the assignment itself costs). The fixture made it visible, but
    * production ids are NEVER dense — codebook selection must be
    * id-distribution-free, like every other derived constant in this
    * repo (AnchorSample's modulus, the sampling gates' hash buckets).
    * Scale shape: the hash threshold is a map-side filter; the exact-k
    * rank window sorts only the ~4k-row oversample (codebook-training
    * scale, never the corpus). The 4× oversample puts the undersample
    * probability below e^{-k/3} (Chernoff) — deterministic per corpus,
    * not flaky.
    */
  private def hashSeeds(base: DataFrame, kdf: DataFrame, tag: String): DataFrame = {
    val nb = base.agg(count(lit(1)).cast(DoubleType).as("nb"))
    val w = Window.orderBy(col("hs").asc, col("vec_id").asc)
    base.crossJoin(broadcast(kdf)).crossJoin(broadcast(nb))
      .withColumn("hs",
        graft.functions.TextFns.md5Hash60(
          concat(lit(tag + ":"), col("vec_id").cast(StringType))) % lit(1000000L))
      .filter(col("hs") < ceil(lit(4000000.0d) * col("k") / col("nb")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= col("k"))
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
      .withColumn("nc", norm(col("ce")))
  }

  /** Augmented corpus with planted duplicate vectors (vec_id + 100000). */
  private def augmented(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.embeddings(s, dir)
    base.select(col("vec_id"), col("embedding"))
      .unionByName(base.select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
  }

  /** Deterministically PERTURBED copy of `base`: component d of vector v
    * moves by ±delta, sign = md5-parity of "tag:v:d" — the same portable
    * hash derivation as the LSH planes/JL signs, so the DuckDB twin
    * regenerates the identical float corpus (double add, one REAL
    * rounding; both engines parse the delta literal to the same double
    * and take the same IEEE path). On a unit-norm corpus the perturbation
    * vector has norm 8·delta and a random direction, so
    * cos(v, twin) ≈ 1/√(1+64·delta²) with O(delta²) spread — the twin
    * lands in a DESIGNED cosine band without the band membership ever
    * being assumed: truth always banded by the exactly-computed cosine.
    */
  private def perturbedTwins(base: DataFrame, offset: Long, tag: String,
      delta: Double): DataFrame =
    // shift FIRST, in its own projection, so the sign key unambiguously
    // reads the twin's own (shifted) id — a single select would hit
    // Spark's lateral-column-alias resolution and key half the corpus on
    // the wrong id (found by the round-13 bitwise corpus diff)
    base.select((col("vec_id") + offset).as("vec_id"), col("embedding"))
      .select(col("vec_id"),
        transform(col("embedding"), (x, d) =>
          (x.cast(DoubleType) + lit(delta) *
            (graft.functions.TextFns.md5Hash60(
              concat_ws(":", lit(tag), col("vec_id"), d)) % 2 * 2 - 1)
          ).cast(org.apache.spark.sql.types.FloatType)).as("embedding"))

  /** Near-twin-augmented corpus — the round-13 recall-governance fixture.
    * [[augmented]]'s byte-identical copies co-assign under every index BY
    * CONSTRUCTION, so a dup-band recall of 1.0 over them cannot detect
    * boundary loss — the failure mode the margin-gated nprobe=2 apparatus
    * exists to fix (round-12 verdict). This corpus adds two PERTURBED
    * cohorts whose twins genuinely can straddle cell boundaries:
    *   - +200000: per-dim ±[[NT_DELTA_NEAR]] → cos ≈ 0.978–0.986, the
    *     near-duplicate band [0.95, 0.999) of perturbed re-uploads /
    *     paraphrase-grade pairs (BELOW the ANN_T emission threshold —
    *     these govern candidate GENERATION, not output);
    *   - +300000: per-dim ±[[NT_DELTA_DUP]] → cos ≈ 0.9996, INSIDE the
    *     ≥ANN_T emission band but not byte-identical — the first
    *     non-tautological occupant of the dup-band governance floor.
    * Offset discipline = [[augmented]]'s: distinct +k·100000 shifts stay
    * collision-free on the gate corpora and on synth_scale fixtures
    * (within-copy ids sit far below the 10⁷ copy stride).
    */
  private[queries] def ntAugmented(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    augmented(s, dir)
      .unionByName(perturbedTwins(base, 200000L, "nta", NT_DELTA_NEAR))
      .unionByName(perturbedTwins(base, 300000L, "ntb", NT_DELTA_DUP))
  }

  /** LSH signature table over the augmented corpus, built ONCE per
    * (session, corpus) and served to every ANN query — the production
    * model: an index is maintained, not rebuilt per search
    * (`sim_ann_lsh`, `sim_ann_lsh_multiprobe`, `ann_recall`).
    */
  private def sharedLshSigs(s: SparkSession, dir: String): DataFrame =
    CorpusCache.getOrBuild(s, s"lshsigs:$dir")(lshSigs(s, augmented(s, dir)))

  /** FLAT IVF cell assignment over the augmented corpus — seeds, Lloyd
    * step, final assignment, hot-cell split. Round 9: this chain serves
    * ONLY the tagged baseline `sim_ann_ivf` (bench_full.json tags it as
    * the flat O(n·k) twin). Every production consumer — probe, rescore,
    * IVF-PQ, semantic dedup, recall governance — runs on
    * [[sharedCoarseAssign]], because with the derived k ∝ n the flat
    * nearest-centroid pass is O(n²·d/1024): the round-8 n=10⁶ probe
    * measured it as the family's scale cliff (57.3 s at n=2·10⁵,
    * unrunnable at 10⁶) while the two-level path ran 3.4× wall on 5×
    * data. Kept (and still oracle-gated) as the Lloyd-refined quality
    * baseline the coarse approximation is measured against.
    */
  private[queries] def sharedIvfAssign(s: SparkSession, dir: String): DataFrame =
    CorpusCache.getOrBuild(s, s"ivfassign:$dir")(
      refinedAssign(ivfAssignments(s, dir, augmented(s, dir))))

  /** Two-level (coarse-quantized) IVF cell assignment, built ONCE per
    * (session, corpus) — the fix for the flat chain's scale cliff: with
    * k = ⌈n/TARGET_CELL⌉ fine centroids, a flat nearest-centroid pass
    * ([[assignCells]]) costs O(n·k·d) = O(n²·d/1024) — quadratic in the
    * corpus, measured as the dominant term at n = 10⁶ (SCALE.md round-8
    * probe). Here each vector first picks its nearest of ⌈√k⌉ COARSE
    * centroids, then its nearest FINE centroid within that coarse group
    * only: O(n·√k·d) total — the coarse-quantizer discipline of
    * billion-scale IVF indexes (FAISS's IVF coarse quantizer / IMI).
    * Round 9: this is THE shared production assignment — `sim_ann_ivf_coarse`,
    * `sim_ann_ivf_probe`, `sim_ann_quantized_rescore`, `sim_ann_ivf_pq`,
    * `dedup_semantic`, and `ann_recall` all build on it; the flat chain
    * survives only behind the tagged baseline `sim_ann_ivf`.
    */
  private[queries] def sharedCoarseAssign(s: SparkSession, dir: String): DataFrame =
    CorpusCache.getOrBuild(s, s"ivfcoarse:$dir")(
      refinedAssign(coarseAssignments(s, dir, augmented(s, dir))))

  /** Three-level (IMI-shaped) assignment, cached like the two chains
    * above — the next decade's shape: O(n·k^(1/3)·d) assignment for when
    * even the ⌈√k⌉ coarse table outgrows broadcast residency (k ≈ 10⁵⁺,
    * n ≈ 10⁸⁺). Gated by `sim_ann_ivf_imi`; governed by `ann_recall`'s
    * `ivf_imi` row. See [[imiAssignments]].
    */
  private[queries] def sharedImiAssign(s: SparkSession, dir: String): DataFrame =
    CorpusCache.getOrBuild(s, s"ivfimi:$dir")(
      refinedAssign(imiAssignments(s, dir, augmented(s, dir), "aug")))

  /** Two-level assignment over the NEAR-TWIN corpus ([[ntAugmented]]) —
    * the index under `ann_recall_neartwin`'s coarse row. Same codebook
    * machinery (k from this corpus's count, seeds hash-ranked from the
    * base corpus), cached once per (session, corpus) like its augmented
    * sibling.
    */
  private[queries] def sharedCoarseAssignNt(s: SparkSession, dir: String): DataFrame =
    CorpusCache.getOrBuild(s, s"ivfcoarsent:$dir")(
      refinedAssign(coarseAssignments(s, dir, ntAugmented(s, dir))))

  /** Three-level (IMI) assignment over the NEAR-TWIN corpus — the index
    * whose margin-gated nprobe=2 search `ann_recall_neartwin`'s imi row
    * governs: the first fixture on which the τ apparatus is exercised by
    * pairs that are NOT byte-identical (and so can straddle regions).
    */
  private[queries] def sharedImiAssignNt(s: SparkSession, dir: String): DataFrame =
    CorpusCache.getOrBuild(s, s"ivfimint:$dir")(
      refinedAssign(imiAssignments(s, dir, ntAugmented(s, dir), "nt")))

  /** Plain-corpus (non-augmented) two-level assignment, cached per
    * (session, corpus) — the cluster structure consumers outside the ANN
    * family ride (cluster-balanced sampling): every corpus vector
    * descends the corpus-trained codebook, no planted-duplicate
    * augmentation. Same O(n·√k·d) algebra as [[sharedCoarseAssign]].
    */
  private[queries] def corpusAssign(s: SparkSession, dir: String): DataFrame =
    CorpusCache.getOrBuild(s, s"ivfplain:$dir") {
      register(s)
      val nk = Tables.embeddings(s, dir).agg(greatest(lit(MIN_CENTROIDS.toLong),
        ceil(count(lit(1)).cast(DoubleType) / lit(TARGET_CELL))).as("k"))
      val (fgrp, coarseNE) = coarseCodebook(s, dir, nk)
      assignWithCodebook(Tables.embeddings(s, dir), fgrp, coarseNE)
    }

  /** Per-vector pair-scoring sketch over the augmented corpus, built ONCE
    * per (session, corpus) like the assignment tables it joins: the first
    * [[HEAD_D]] components (`hd`) and the 48-d tail compressed to its
    * norm (`tn`), BOTH PRE-DIVIDED by the vector's own norm (round 16 —
    * the round-15 verdict's #3 exchange-row lever): with the sketch
    * normalized at build time, the tier-1 bound needs NO norm column at
    * all (dot(ha,hb) + ta·tb ≥ T − ε directly bounds the cosine), so the
    * pair-scan exchanges stop carrying `nrm` on every row of both sides
    * — one 8-byte slot per row off the measured EXCHANGE+SORT wall of
    * the 10⁷ probe tier and the 2×10⁸ flagship's scratch peak. The
    * division quantizes each head component once to f32
    * ([[SKETCH_EPS]] carries the rounding into the bound, keeping it
    * provably superset-safe); the full-precision vectors are touched
    * again only by the per-survivor rescore fetch. See
    * [[cellVerifiedPairs]].
    */
  private[queries] def sharedPairSketch(s: SparkSession, dir: String): DataFrame =
    CorpusCache.getOrBuild(s, s"pairsketch:$dir") {
      val e = withNorm(augmented(s, dir))
      e.select(col("vec_id"),
        transform(slice(col("embedding"), 1, HEAD_D),
          x => (x.cast(DoubleType) / col("nrm")).cast(FloatType)).as("hd"),
        (norm(slice(col("embedding"), HEAD_D + 1, RP_D - HEAD_D)) / col("nrm")).as("tn"))
    }

  /** Two-tier within-cell pair verification shared by every IVF pair
    * consumer (`sim_ann_ivf_coarse`, `sim_ann_ivf_imi`, `dedup_semantic`;
    * `sim_ann_ivf_probe` rides the same sketch through its nprobe=2
    * candidate join) — the round-10 cut of the family's dominant constant,
    * the ~1.1×10¹⁰ exact-cosine candidate pairs (~320 s of every 10⁷
    * gate). Tier 1: candidates join on the refined cell key `ck` carrying
    * ONLY the sketch, and survive iff the Cauchy–Schwarz upper bound
    * clears the threshold — dot(hd_a,hd_b) + tn_a·tn_b ≥ T·nrm_a·nrm_b −
    * [[BOUND_EPS]] — a 16-d dot per candidate instead of 64-d, on a
    * ~3.5×-slimmer shuffle payload. Tier 2: the O(near-dup) survivor set
    * fetches full vectors by two vec_id equi-joins ([[rescoreExact]] —
    * unhinted sort-merge; see its scaladoc for why a hash hint OOMs under
    * the pair scan's concurrent memory pressure) and is
    * scored EXACTLY at full precision. Because the bound is a true upper
    * bound of the exact cosine (see [[HEAD_D]]'s scaladoc), the output is
    * identical to the single-tier exact join — every oracle twin stays an
    * exact-semantics replay, and [[QueryInvariantSpec]] pins the equality
    * (plus non-vacuous pruning) executably.
    */
  private[queries] def cellVerifiedPairs(s: SparkSession, dir: String,
      assign: DataFrame): DataFrame = {
    // round 15: each side also carries its ASSIGNMENT SCORE s1 = cos(v,
    // c(v)) and its sine — the angular-prune anchor (computed once per
    // ROW, before the pair-scan exchange, never per candidate). Within
    // one cell key both directions of the anchor argument hold (c(u) and
    // c(v) both live in the joined cell), so the symmetric spelling
    // applies. Deliberately NOT band-split ([[bandRange]]): a self-join
    // has no small side to carry the band explode, so the ~1.9× row
    // inflation would land on a full corpus-sized sketch exchange (+88%
    // of ~16 GB at the 2×10⁸ tier — straight against the staged run's
    // binding DISK budget) to cut join-output iteration that was never
    // this scan's measured wall (the 10⁸ flagship ran 414 s end-to-end,
    // r13). The probe search, whose probe side dwarfs its member side,
    // is where the band key pays — see [[probeVerifiedPairs]].
    // round 16 (the exchange-row narrowing): each side carries ONLY
    // (ck, id, hd, tn, s1) — the sine column and the norm column are gone
    // from the corpus-sized self-join exchange (two 8-byte slots per row
    // per side). The sine is folded into the SQUARED spelling of the
    // angular test below; the norm is pre-divided into the sketch.
    val sk = sharedPairSketch(s, dir)
      .join(assign.select(col("vec_id"), col("ck"), col("s1")), Seq("vec_id"))
    val l = sk.select(col("ck"), col("vec_id").as("i"), col("hd").as("ha"),
      col("tn").as("ta"), col("s1").as("su"))
    val r = sk.select(col("ck"), col("vec_id").as("j"), col("hd").as("hb"),
      col("tn").as("tb"), col("s1").as("sv"))
    val cand = l.join(r, Seq("ck")).filter(col("i") < col("j"))
      // tier 0 (scalar, short-circuits tier 1's 16-d dot): cos(u,v) ≤
      // cos(θ_u − θ_v) by the angular triangle inequality around the
      // shared cell anchor — prune when even that ceiling misses ANN_T.
      // SQUARED spelling (round 16): with d = T − ε − su·sv, the keep
      // test su·sv + sin_u·sin_v ≥ T − ε is equivalently d ≤ 0 ∨
      // (1−su²)(1−sv²) ≥ d² (both sides non-negative when d > 0) — the
      // sines never need computing, so they never need CARRYING across
      // the exchange either
      .filter(angularKeep(col("su"), col("sv")) &&
        (dot(col("ha"), col("hb")) + col("ta") * col("tb") >=
          lit(ANN_T) - lit(SKETCH_EPS)))
      .select(col("i"), col("j"))
    rescoreExact(s, dir, cand)
  }

  /** The tier-0 angular keep test in sine-free squared form: with
    * d = ANN_T − BOUND_EPS − su·sv, keep iff d ≤ 0 or (1−su²)(1−sv²) ≥
    * d² − BOUND_EPS. Equivalent-superset of the sqrt spelling (squaring
    * is monotone on the non-negative branch; the trailing BOUND_EPS
    * absorbs the squared form's own double rounding — it can only ADMIT,
    * never prune, relative to the real-arithmetic predicate), and free of
    * per-candidate sqrt AND of per-row carried sine columns.
    */
  private def angularKeep(su: Column, sv: Column): Column = {
    val d = lit(ANN_T) - lit(BOUND_EPS) - su * sv
    (d <= lit(0.0d)) ||
      ((lit(1.0d) - su * su) * (lit(1.0d) - sv * sv) >= d * d - lit(BOUND_EPS))
  }

  /** sin of an angle given its cosine, clamped against float overshoot
    * (a computed cosine an ulp above 1 must yield 0, not NaN — NaN would
    * silently PRUNE, breaking the superset guarantee).
    */
  private def sinFromCos(c: Column): Column =
    sqrt(greatest(lit(0.0d), lit(1.0d) - c * c))

  /** Band-split probe join (round 15 — the materialization half of the
    * angular prune): the tier-0 keep test is, for one side's score
    * fixed, a pure WINDOW in the other side's score — f(x) = a·x +
    * sin·sin = cos(θ_a − θ_x) is unimodal with its peak at x = a, so the
    * keepable partners of a row with score a are exactly x ∈
    * [cos(θ_a + W), cos(θ_a − W)] with W = acos(ANN_T). Quartile-banding
    * one side's scores per cell (three per-cell boundaries, a k-row
    * broadcast) and keying the pair join on (cell, band) — that side
    * carries its own band, the OTHER side explodes over the bands its
    * window intersects — means out-of-window candidates are never
    * MATERIALIZED by the join at all: the same algebra as the scalar
    * prune, moved from the filter into the equi-join key (at 39k-cell
    * tiers the τ margin gate admits 96% of rank-2 probes, so join-output
    * volume — not dot work — is the binding term; BandProbe measured the
    * quartile key cutting candidate volume 2.13× at a 1.88× explode at
    * 10⁷, against a 3.1× infinite-band floor — SCALE.md round 15).
    * The explode must ride the SMALLER side. Output-invariant by the
    * same superset argument as the prune: a band is skipped only when
    * every score in it fails the tier-0 window, and tier-0 is a true
    * upper bound of the exact cosine. [[BAND_PAD]] absorbs double
    * rounding between the window arithmetic and the per-candidate
    * filter.
    */
  private val BAND_PCTS = Seq(0.25d, 0.5d, 0.75d)
  private val BAND_PAD = 1e-12

  /** Per-cell quantile boundaries of the member anchor scores: one
    * broadcastable row per join key — `key` renamed to `as` — carrying
    * `qs` = [q1, q2, q3]. Derived from the (cached) assignment, so the
    * extra cost is one O(n)→k aggregate per consumer, paid once per
    * pair scan it guards.
    */
  private def bandBoundaries(assign: DataFrame, key: String, as: String): DataFrame =
    broadcast(assign.groupBy(col(key).as(as))
      .agg(percentile(col("s1"), array(BAND_PCTS.map(lit): _*)).as("qs")))

  /** Band of an anchor score against the joined `qs` boundaries: band
    * b = (q_b, q_{b+1}], open below, with band 0 unbounded below and
    * band 3 unbounded above. Carried by the side that does NOT explode.
    */
  private def bandOf(sv: Column): Column =
    when(sv > col("qs").getItem(2), lit(3))
      .when(sv > col("qs").getItem(1), lit(2))
      .when(sv > col("qs").getItem(0), lit(1))
      .otherwise(lit(0))

  /** Exploding-side band list: the contiguous run of bands whose score
    * interval intersects this row's keep window [lo, hi] = cos(θ ±
    * acos(T)). minb = first band whose UPPER boundary reaches lo, maxb =
    * last band whose LOWER boundary stays under hi; q1 ≤ q2 ≤ q3 and
    * lo ≤ hi make minb ≤ maxb always (if minb > 0 then q_minb < lo ≤ hi,
    * which forces maxb ≥ minb), so the sequence is never empty or
    * descending.
    */
  private def bandRange(sc: Column, sn: Column): Column = {
    val cw = ANN_T - BOUND_EPS
    val sw = math.sqrt(math.max(0.0, 1.0 - cw * cw))
    val lo = sc * lit(cw) - sn * lit(sw) - lit(BAND_PAD)
    val hi = sc * lit(cw) + sn * lit(sw) + lit(BAND_PAD)
    val minb = when(col("qs").getItem(0) >= lo, lit(0))
      .when(col("qs").getItem(1) >= lo, lit(1))
      .when(col("qs").getItem(2) >= lo, lit(2))
      .otherwise(lit(3))
    val maxb = when(col("qs").getItem(2) <= hi, lit(3))
      .when(col("qs").getItem(1) <= hi, lit(2))
      .when(col("qs").getItem(0) <= hi, lit(1))
      .otherwise(lit(0))
    explode(sequence(minb, maxb))
  }

  /** nprobe=2 verified pairs over an IVF assignment — the probe-search
    * shape shared by `sim_ann_ivf_probe` (coarse chain) and, round 10,
    * `sim_ann_ivf_imi` (the three-level chain's production search: a
    * deeper/cheaper descent is a coarser approximation, so it buys its
    * recall back at SEARCH time by probing the home AND second-nearest
    * cell — the FAISS-IMI discipline of pairing a multi-index descent
    * with a wider nprobe. Round 10 first tried widening the DESCENT
    * instead — top-2 at levels 1 and 2 — and measured recall at sf0.1
    * move 0.823 → 0.800/0.811: a wider menu improves each vector's own
    * assignment but not pair CO-assignment; probe candidates are instead
    * a strict SUPERSET of the nprobe=1 search, so recall can only rise).
    * Tier-1 scores the Cauchy–Schwarz sketch bound inside the probe
    * join; the distinct runs over bound survivors (O(near-dups)); tier-2
    * rescores exactly ([[rescoreExact]]).
    */
  private[queries] def probeVerifiedPairs(s: SparkSession, dir: String,
      assign: DataFrame, forceBands: Option[Boolean] = None): DataFrame = {
    val sk = sharedPairSketch(s, dir)
      .join(assign.select(col("vec_id"), col("cell"), col("s1"), col("probes")),
        Seq("vec_id"))
    // The band key engages WITH the derived width (round 15): at the
    // gate sfs the width law sits at its p = 2 floor, the probe volume
    // is the round-13 two-region shape, and the band machinery (the
    // percentile boundary pass, two broadcast joins, the ~1.9× member
    // explode, a wider join key) is pure overhead — measured at sf0.1 as
    // sim_ann_ivf_imi 6.0 → 12.9 s. Past the floor (p > 2, ≳1.6×10⁴
    // corpus rows) the widened probe volume the key exists to cut is
    // actually present. Plan-static from the memoized corpus count (the
    // staticProbeWidth discipline); `forceBands` is the spec seam that
    // pins BOTH shapes equal at the fixture sf.
    val banded = forceBands.getOrElse(staticProbeWidth(
      Preconditions.longOnce(s, s"rowcount:pairscan:$dir")(
        augmented(s, dir).count()))._1 > 2)
    val bnd = bandBoundaries(assign, "cell", "pc")
    // Each probe row carries sr = the prober's cosine TO THE PROBED
    // CELL'S OWN FINE CENTROID — s1 for the home region, s1 − mgn_r for
    // a ranked extra region. Both are EXACT, not upper bounds: regions
    // are single fine cells in every chain (the coarse chain's probe is
    // the runner-up fine centroid with s2 = cos(u, c_pc); the IMI
    // chain's ranked regions are per-explored-cell fine WINNERS, each
    // carrying cs = cos(u, c_pc) — see [[imiAssignments]]'s region
    // emission), and a member v of cell pc scores sv = cos(v, c_pc)
    // against the SAME centroid. The prune anchor is therefore shared
    // and exact on both sides, so the symmetric angular test applies to
    // every ordering — the round-15 first cut's `sv ≤ sr` vacuous-keep
    // escape (needed only if sr merely bounded cos(u, c_pc) from above)
    // is unnecessary, and each probe row's keepable members form a pure
    // sv WINDOW, which is what lets the join key on (cell, band).
    // round 16 (the exchange-row narrowing): probe rows carry ONLY
    // (pc[, band], u, ha, ta, sr) — the sine and norm slots are gone from
    // the ~6×-larger probe side of the measured EXCHANGE+SORT wall (the
    // sine via [[angularKeep]]'s squared spelling, the norm via the
    // pre-normalized sketch); the member side drops the same two slots,
    // computing its band-window sine inline BEFORE the exchange.
    val probesBase = sk.select(col("cell").as("pc"), col("vec_id").as("u"),
        col("hd").as("ha"), col("tn").as("ta"),
        col("s1").as("sr"))
      // margin-gated extra regions (round 11; round 14 — derived width):
      // the chain's ranked probe list carries each region's cross-region
      // margin, and only BOUNDARY pairings — margin ≤ PROBE_MARGIN_T —
      // pay the probe. A vector that beat a region's winner decisively
      // sits deep inside its home cell, and a ≥COS_T-similar neighbor of
      // a deep vector lands in the same cell; the recall-relevant probes
      // concentrate at small margins (the FAISS refinement discipline).
      // Candidates remain a superset of the nprobe=1 search (the home
      // branch is untouched), so probe recall ≥ nprobe=1 recall holds.
      .unionByName(sk
        .select(col("vec_id").as("u"), col("hd").as("ha"), col("tn").as("ta"),
          col("s1"), explode(col("probes")).as("pr"))
        .filter(col("pr").getField("mgn") <= lit(PROBE_MARGIN_T))
        .select(col("pr").getField("pc").as("pc"), col("u"),
          col("ha"), col("ta"),
          (col("s1") - col("pr").getField("mgn")).as("sr")))
    val homeBase = sk.select(col("cell").as("pc"), col("vec_id").as("v"),
      col("hd").as("hb"), col("tn").as("tb"),
      col("s1").as("sv"))
    // band-split (round 15, second cut): the join keys on (cell, band)
    // so out-of-window candidates are never materialized — the prune
    // moves from the filter into the equi-join key. The probe side
    // (n·(1 + τ-admitted regions) rows — ~6× the member side at the
    // 10⁷ tier) carries its OWN band; the ~1.9×-row window explode
    // ([[bandRange]], measured by BandProbe — the window is symmetric
    // in (sr, sv), so either side can carry it) rides the MEMBER side,
    // the ~6×-smaller relation — exploding the probe side instead was
    // measured to inflate its sort-merge spill past the box's disk at
    // 10⁷ (SCALE.md round 15).
    val (probes, home, joinKeys) =
      if (banded) (
        probesBase.join(bnd, Seq("pc"))
          .select(col("pc"), bandOf(col("sr")).as("band"),
            col("u"), col("ha"), col("ta"), col("sr")),
        homeBase.join(bnd, Seq("pc"))
          // the window sine is computed INLINE here, once per member row
          // before the exchange — it feeds only the band explode and is
          // never carried
          .select(col("pc"), bandRange(col("sv"), sinFromCos(col("sv"))).as("band"),
            col("v"), col("hb"), col("tb"), col("sv")),
        Seq("pc", "band"))
      else (probesBase, homeBase, Seq("pc"))
    // Tier-0 angular prune (round 15 — the derived width's cost lever,
    // output-invariant by algebra): sr·sv + sin·sin = cos(θ(u,c_pc) −
    // θ(v,c_pc)) exactly, and cos(u,v) ≤ cos(Δθ) by the spherical
    // triangle inequality around the shared anchor — prune when even
    // that ceiling misses ANN_T. A pair whose exact cosine clears ANN_T
    // always survives (its ceiling is at least its exact cosine), so the
    // verified OUTPUT is bit-identical to the unpruned search (the same
    // superset-safety as tier 1's Cauchy–Schwarz bound), every oracle
    // twin replays unchanged, and the conjunct order makes the 16-d dot
    // short-circuit behind the scalar test.
    // Deliberately UNHINTED (sort-merge), like [[rescoreExact]]: a
    // SHUFFLE_HASH hint on the member side — attractive because it would
    // skip sorting the ~6×-larger probe side — was MEASURED to fail the
    // 10⁷ run outright ("There is not enough memory to build hash map",
    // stage 137): 32 concurrent ~100 MB member-side builds demand
    // execution memory the probe side's exchange is simultaneously
    // draining, while sort-merge spills gracefully under the same
    // pressure. The round-9 rescore lesson generalizes to every join
    // that lives inside the pair-scan's memory envelope.
    val cand = probes.join(home, joinKeys)
      .filter(col("u") =!= col("v"))
      .filter(angularKeep(col("sr"), col("sv")) &&
        (dot(col("ha"), col("hb")) + col("ta") * col("tb") >=
          lit(ANN_T) - lit(SKETCH_EPS)))
      .select(least(col("u"), col("v")).as("i"),
        greatest(col("u"), col("v")).as("j"))
      .distinct()
    rescoreExact(s, dir, cand)
  }

  /** Exact-cosine rescore of a candidate (i, j) set: two vec_id equi-join
    * fetches of full-precision vectors, the 64-d fold, and the ≥ANN_T
    * verification — the `sim_ann_quantized_rescore` fetch shape, measured
    * working at n=10⁷ in round 9. Deliberately UNHINTED: a SHUFFLE_HASH
    * hint here failed the whole gate at 10⁷ ("Can't acquire 67108864
    * bytes memory to build hash relation") — 32 concurrent hash builds
    * each demand a 64 MB initial page from the execution pool the
    * upstream pair scan is simultaneously draining, while sort-merge
    * spills gracefully under the same pressure. Shared by the two-tier
    * cell scan and the nprobe=2 probe path.
    */
  private def rescoreExact(s: SparkSession, dir: String, cand: DataFrame): DataFrame = {
    val n = withNorm(augmented(s, dir))
    cand
      .join(n.select(col("vec_id").as("i"), col("embedding").as("ea"), col("nrm").as("na")), Seq("i"))
      .join(n.select(col("vec_id").as("j"), col("embedding").as("eb"), col("nrm").as("nb")), Seq("j"))
      .withColumn("cos", dot(col("ea"), col("eb")) / (col("na") * col("nb")))
      .filter(col("cos") >= ANN_T)
      .select(col("i"), col("j"), col("cos"))
  }

  /** DuckDB prelude shared by the plain-corpus assignment twins
    * ([[streamIngestOracle]], the cluster-sample oracle): normed corpus
    * universe `a` → [[coarseAssignCtes]] (terminal `assign`).
    */
  private[queries] lazy val plainAssignCtes: String =
    s"""a AS (
       |  SELECT vec_id, embedding,
       |    sqrt(${dSql("embedding", "embedding")}) AS nrm
       |  FROM embeddings),
       |${coarseAssignCtes("a", "")}""".stripMargin

  /** Streaming index ingest (`stream_ann_ingest` — registered in
    * [[StreamGate]] with the other stream gates): "today's arrivals"
    * (vec_id % 4 == 0, the [[`sim_ann_incremental`]] convention) flow
    * through a file stream and are assigned to their IVF cells inside
    * `foreachBatch` against the CORPUS-trained two-level codebook — the
    * micro-batch index-maintenance path a 100-TB deployment runs: the
    * codebook is a published artifact (trained offline, written once,
    * read per batch), arrivals never see the corpus, and per-batch cost
    * is O(batch·√k·d) regardless of history. Assignment is per-vector
    * independent given the codebook, so the result is invariant to
    * micro-batch boundaries — no single-file backlog constraint needed,
    * and the DuckDB twin can replay the same descent declaratively over
    * the arrival subset.
    */
  private[queries] def streamIngestAssign(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    register(s)
    val in = TempDirs.fresh("annin_in")
    val out = TempDirs.fresh("annin_out")
    val ckpt = TempDirs.fresh("annin_ck")
    val cb = TempDirs.fresh("annin_cb")
    val arrivals = Tables.embeddings(s, dir).filter(col("vec_id") % 4 === 0)
    arrivals.write.mode("overwrite").parquet(in)
    // train the codebook from the corpus (k from the CORPUS size — the
    // index's k, not the batch's) and publish it as the artifact the
    // per-batch assigner reads
    val nk = Tables.embeddings(s, dir).agg(greatest(lit(MIN_CENTROIDS.toLong),
      ceil(count(lit(1)).cast(DoubleType) / lit(TARGET_CELL))).as("k"))
    val (fgrp, coarseNE) = coarseCodebook(s, dir, nk)
    fgrp.write.mode("overwrite").parquet(s"$cb/fgrp")
    coarseNE.write.mode("overwrite").parquet(s"$cb/coarse")
    // backlog-derived shuffle partitions for the per-batch assignment work
    // (broadcast joins + argmax aggregates) — see [[StreamGate.streamSession]].
    // The child session has a FRESH function registry, so the vec_* temp
    // functions must be re-registered on it (the micro-batch execution
    // clones ITS state, not the parent's).
    val s2 = StreamGate.streamSession(s, in)
    register(s2)
    val q = s2.readStream
      .schema(arrivals.schema).parquet(in)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val ss = batch.sparkSession
        assignWithCodebook(batch,
          ss.read.parquet(s"$cb/fgrp"), ss.read.parquet(s"$cb/coarse"))
          .write.mode("append").parquet(out)
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    if (!q.awaitTermination(300000)) {
      q.stop(); sys.error("stream_ann_ingest did not terminate in time")
    }
    s.read.parquet(out).select(col("vec_id"), col("cell"), col("cell2"))
  }

  /** DuckDB twin of [[streamIngestAssign]]: the [[coarseAssignCtes]]
    * descent over the PLAIN corpus (k from the corpus count, matching the
    * stream's offline-trained codebook), restricted to the arrival subset
    * at the end — exact because assignment is per-vector independent.
    */
  private[queries] lazy val streamIngestOracle: String =
    s"""WITH $plainAssignCtes
       |SELECT vec_id, cell, cell2 FROM assign
       |WHERE vec_id % 4 = 0""".stripMargin

  /** Mechanism probes for the assignment-cost claim (PlanShapeSpec): the
    * FLAT seed-codebook assignment (every vector vs every fine centroid —
    * n·k candidate rows out of the broadcast join into the argmax window;
    * the corpus shuffle itself stays O(n), pushed below the broadcast
    * join) and the two-level chain over the same seeds (n·√k + n·E[k/√k]
    * candidate rows). Both
    * return the same (vec_id, cell, cell2) shape over the same augmented
    * corpus, so the spec can compare executed broadcast-join output-row
    * metrics on equal work — NOT shuffle records, which stay O(n) for both
    * chains and carry no signal. (Cell choices may differ for boundary
    * vectors — the
    * standard coarse-quantizer approximation; what both schemes guarantee,
    * and the invariant spec pins, is that identical vectors co-assign.)
    */
  private[queries] def flatAssignProbe(s: SparkSession, dir: String): DataFrame = {
    register(s)
    val emb = augmented(s, dir)
    val k = emb.agg(greatest(lit(MIN_CENTROIDS.toLong),
      ceil(count(lit(1)).cast(DoubleType) / lit(TARGET_CELL))).as("k"))
    assignCells(emb, hashSeeds(Tables.embeddings(s, dir), k, "ivfseed"))
  }

  private[queries] def coarseAssignProbe(s: SparkSession, dir: String): DataFrame = {
    register(s)
    coarseAssignments(s, dir, augmented(s, dir))
  }

  private[queries] def imiAssignProbe(s: SparkSession, dir: String): DataFrame = {
    register(s)
    imiAssignments(s, dir, augmented(s, dir), "aug")
  }

  /** The two-level assignment chain. Fine centroids are the seed codebook
    * (first k vec_ids — the PQ-codebook discipline; at scale the codebook
    * trains offline on a bounded sample, which is why this path gates
    * ASSIGNMENT cost, while the flat `sim_ann_ivf` chain gates the Lloyd
    * step). Coarse centroids are the first ⌈√k⌉ vec_ids; every fine
    * centroid joins its nearest coarse centroid (k·√k rows, tiny), and
    * vectors only ever compare against (a) the non-empty coarse table
    * (n·√k rows) and (b) the fine centroids of their own coarse group
    * (n·E[k/√k] rows). Both centroid tables broadcast — the corpus never
    * shuffles for assignment; at n = 10⁹, k = 10⁶ fine centroids × 64
    * floats ≈ 256 MB, the standard residency assumption of an IVF
    * codebook on every index node.
    *
    * Determinism: identical vectors take identical coarse and fine argmax
    * decisions (cos desc, id asc tie-break), so planted duplicates can
    * never be separated — the property the gate verifies.
    */
  private def coarseAssignments(s: SparkSession, dir: String, emb: DataFrame): DataFrame = {
    val nk = emb.agg(greatest(lit(MIN_CENTROIDS.toLong),
      ceil(count(lit(1)).cast(DoubleType) / lit(TARGET_CELL))).as("k"))
    val (fgrp, coarseNE) = coarseCodebook(s, dir, nk)
    assignWithCodebook(emb, fgrp, coarseNE)
  }

  /** The two-level codebook alone — (fine-centroids-grouped-by-coarse,
    * non-empty coarse table) for a given k frame. Split out of
    * [[coarseAssignments]] so the streaming ingest gate can train the
    * codebook once from the corpus (the offline-index discipline) and
    * assign micro-batches of arrivals against it.
    */
  private[queries] def coarseCodebook(
      s: SparkSession, dir: String, nk: DataFrame): (DataFrame, DataFrame) = {
    // fine codebook shares the flat chain's "ivfseed" hash universe (the
    // seeds-as-codebook discipline, now id-distribution-free); the coarse
    // table draws ⌈√k⌉ rows from an independent hash universe
    val fine = hashSeeds(Tables.embeddings(s, dir), nk, "ivfseed")
    val coarse = hashSeeds(Tables.embeddings(s, dir),
      nk.select(ceil(sqrt(col("k").cast(DoubleType))).cast(LongType).as("k")), "ivfgrp")
      .select(col("cid").as("gid"), col("ce").as("ge"), col("nc").as("ng"))
    // fine centroid → coarse group: k×√k candidate rows, never
    // corpus-sized. The pick is the sort-free ArgTop2 argmax (cos DESC,
    // gid ASC — same selection as the oracle's row_number twin), with a
    // tiny k-row join-back to re-attach (ce, nc).
    val fpick = fine.crossJoin(broadcast(coarse))
      .withColumn("cos_g", dot(col("ce"), col("ge")) / (col("nc") * col("ng")))
      .groupBy(col("cid"))
      .agg(argTop2(col("cos_g"), col("gid")).as("t2"))
      .select(col("cid"), col("t2").getField("cell").as("gid"))
    val fgrp = fpick.join(fine, Seq("cid"))
      .select(col("gid"), col("cid"), col("ce"), col("nc"))
    // a coarse centroid that wins no fine members must not strand the
    // vectors that would pick it: vectors choose among NON-EMPTY groups
    val coarseNE = coarse.join(broadcast(fgrp.select(col("gid")).distinct()), Seq("gid"))
    (fgrp, coarseNE)
  }

  /** The two-level descent of `emb` against a prebuilt codebook —
    * (vec_id, cell, cell2). Per-vector independent given the codebook, so
    * the result is invariant to how `emb` is batched (the property the
    * streaming ingest gate rides).
    */
  private[queries] def assignWithCodebook(
      emb: DataFrame, fgrp: DataFrame, coarseNE: DataFrame): DataFrame = {
    // vector → coarse group: the n·√k candidate relation collapses in the
    // partial aggregate above the broadcast join (round 9 — the window
    // spelling sorted these candidates: the 10⁷ probe's spill cliff); the
    // group id rejoins the corpus by vec_id, an O(n) equi-join.
    val vpick = withNorm(emb).crossJoin(broadcast(coarseNE))
      .withColumn("cos_g", dot(col("embedding"), col("ge")) / (col("nrm") * col("ng")))
      .groupBy(col("vec_id"))
      .agg(argTop2(col("cos_g"), col("gid")).as("t2"))
      .select(col("vec_id"), col("t2").getField("cell").as("gid"))
    val vg = withNorm(emb).join(vpick, Seq("vec_id"))
      .select(col("vec_id"), col("embedding"), col("nrm"), col("gid"))
    // vector → nearest fine centroid WITHIN its coarse group: the equi-join
    // on gid restricts candidates to E[k/√k] = √k per vector; the top-2
    // pick again collapses map-side, and since vg is already partitioned
    // by vec_id after its rejoin, the final aggregate needs no exchange
    vg.join(broadcast(fgrp), Seq("gid"))
      .withColumn("cos_c", dot(col("embedding"), col("ce")) / (col("nrm") * col("nc")))
      .groupBy(col("vec_id"))
      .agg(argTop2(col("cos_c"), col("cid")).as("t2"))
      .select(col("vec_id"),
        col("t2").getField("cell").as("cell"),
        col("t2").getField("cell2").as("cell2"),
        // assignment margin (round 11): how decisively the winner beat
        // the runner-up — the nprobe=2 search probes the second cell
        // only for boundary vectors (small margin); null when k = 1
        (col("t2").getField("s1") - col("t2").getField("s2")).as("mgn"),
        // cos to the winning centroid — here the cell IS one centroid, so
        // this is the exact anchor score of the round-15 angular prune
        col("t2").getField("s1").as("s1"))
      .withColumn("probes", rankTwoProbes)
  }

  /** The two-level/flat chains' probe list: exactly the runner-up cell
    * with its margin — these chains' region structure is one level deep,
    * so their probe search keeps the round-11 nprobe=2 shape, expressed
    * in the shared (pc, mgn)-array contract the probe consumers read
    * (the IMI chain's list is the derived-width [[probeWidth]] one).
    * Empty when k = 1 leaves no runner-up.
    */
  private def rankTwoProbes: Column =
    filter(array(struct(col("cell2").as("pc"), col("mgn").as("mgn"))),
      t => t.getField("pc").isNotNull)

  /** Integer-exact ⌈k^(1/3)⌉ as a 1-row (k) frame: libm `pow`/`cbrt` are
    * not correctly-rounded (unlike sqrt, which IEEE 754 requires exact),
    * so Spark's Math.pow and DuckDB's C pow may disagree by an ulp at
    * perfect cubes — enough to flip a ceil. Snapping the rounded estimate
    * with exact BIGINT cube comparisons makes both engines land on the
    * true ceiling whenever the estimate is within ±1 (any libm is).
    */
  private def cbrtCeil(kdf: DataFrame): DataFrame = {
    val c = round(pow(col("k").cast(DoubleType), lit(1.0 / 3.0))).cast(LongType)
    kdf.select(
      when((c - 1) * (c - 1) * (c - 1) >= col("k"), c - 1)
        .when(c * c * c >= col("k"), c)
        .otherwise(c + 1).as("k"))
  }

  /** Ceiling of the DERIVED probe width [[probeWidth]] — the law's clamp,
    * not a buffer width (round 15): the ArgTopN beams size their
    * plan-static buffers to the CORPUS-derived width ([[staticProbeWidth]]),
    * so the ceiling costs nothing at tiers where the law stays under it.
    * 32 covers the k^(1/4) law through k = 32⁴ = 1,048,576 cells — the
    * ~10⁹-vector regime at TARGET_CELL the law exists for (the round-14
    * cap of 16 saturated at k = 65,536, an order of magnitude under the
    * design target). ArgTopN is IMPERATIVE — a fixed primitive buffer
    * with Scala update/merge the JIT compiles once — so the lift has no
    * generated-code size to manage (the round-14 declarative spelling
    * breached the JVM 64 KB method limit at cap 16); the only bound is
    * ArgTopN's require(cap <= 64).
    */
  private[queries] val PROBE_CAP = 32

  /** Level-1 beam ceiling: b1 = ⌈√p⌉ ≤ ⌈√PROBE_CAP⌉ = 6 at the lifted
    * ceiling; 8 keeps headroom through a future PROBE_CAP = 64.
    */
  private[queries] val L1_BEAM_CAP = 8

  /** Plan-static twin of [[probeWidth]]'s law over an exact corpus count:
    * k = max(MIN_CENTROIDS, ⌈n/TARGET_CELL⌉), p = min(PROBE_CAP, max(2,
    * ⌈k^(1/4)⌉)), b1 = min(L1_BEAM_CAP, ⌈√p⌉) — the same quartic-snapped
    * integer-exact arithmetic as the Column spelling (pinned equal across
    * the law's k frames in QueryInvariantSpec). Used ONLY to size the
    * ArgTopN beam BUFFERS, which are plan-static by nature: the runtime
    * slice still reads the broadcast [[probeWidth]] frame, and both
    * derive from the same corpus count (memoized once per session/chain —
    * the erQ/Bloom-capacity discipline), so buffer width == sliced width
    * at every tier. Sizing the buffer to the tier's own p is what makes
    * the PROBE_CAP = 32 ceiling free: a gate corpus plans 2-slot buffers,
    * the 10⁷ tier 12, and only a ~10⁹-vector corpus pays the full 32 —
    * under the round-14 static PROBE_CAP-wide buffer every tier paid the
    * ceiling's per-group aggregation state.
    */
  private[queries] def staticProbeWidth(n: Long): (Int, Int) = {
    val k = math.max(MIN_CENTROIDS.toLong,
      (n + TARGET_CELL.toLong - 1L) / TARGET_CELL.toLong)
    val c = math.round(math.pow(k.toDouble, 0.25))
    val q =
      if ((c - 1) * (c - 1) * (c - 1) * (c - 1) >= k) c - 1
      else if (c * c * c * c >= k) c
      else c + 1
    val p = math.min(PROBE_CAP.toLong, math.max(2L, q)).toInt
    val b1 = math.min(L1_BEAM_CAP.toLong,
      math.ceil(math.sqrt(p.toDouble)).toLong).toInt
    (p, b1)
  }

  /** The derived probe-width frame (round 14 — replacing the fixed
    * two-region probe whose 10⁷ emission-band recall ceiling, 0.9217,
    * sat under the 0.95 governance floor; SCALE.md round 13): from the
    * cell-count frame `nk`, one broadcastable row
    *   p  = min(PROBE_CAP, max(2, ⌈k^(1/4)⌉))  — the searched regions,
    *   b1 = min(L1_BEAM_CAP, ⌈√p⌉)             — the level-1 beam.
    * The k^(1/4) law is the FAISS discipline of growing nprobe with the
    * cell count, pinned to this chain's cost algebra: the descent
    * explores b1·k^(1/3) level-2 candidates and p·k^(1/3) fine
    * candidates per vector, so assignment stays O(n·k^(1/3+1/4)·d) ≪
    * O(n·√k·d) (the two-level chain it undercuts), and the probe join's
    * candidate volume grows as p·E[cell] with the τ margin gate pruning
    * the clear-winner majority of extra regions. At k = 16 (every gate
    * sf) the law lands exactly on p = 2, b1 = 2 — the round-13 probe
    * shape, so gate outputs are bit-identical to the fixed-nprobe round.
    * ⌈k^(1/4)⌉ is quartic-snapped like [[cbrtCeil]] (libm pow is not
    * correctly rounded; exact BIGINT fourth-power comparisons make both
    * engines land on the true ceiling whenever the estimate is within
    * ±1); ⌈√p⌉ is IEEE-exact.
    */
  private[queries] def probeWidth(nk: DataFrame): DataFrame = {
    val c = round(pow(col("k").cast(DoubleType), lit(0.25))).cast(LongType)
    nk.select(
        when((c - 1) * (c - 1) * (c - 1) * (c - 1) >= col("k"), c - 1)
          .when(c * c * c * c >= col("k"), c)
          .otherwise(c + 1).as("q"))
      .select(least(lit(PROBE_CAP.toLong), greatest(lit(2L), col("q"))).as("p"))
      .select(col("p"),
        least(lit(L1_BEAM_CAP.toLong),
          ceil(sqrt(col("p").cast(DoubleType))).cast(LongType)).as("b1"))
  }

  /** The three-level (IMI-shaped) assignment chain: descend level-1
    * (⌈k^(1/3)⌉ centroids) → level-2 (k^(2/3), restricted to the chosen
    * level-1 group) → fine top-2 (restricted to the chosen level-2
    * group): O(3·n·k^(1/3)·d) candidate rows against the two-level
    * chain's O(2·n·√k·d). At the 10⁷ probe's k = 19532 that is 81 vs 280
    * candidates per vector (3.5×); at n = 10⁹, k = 10⁶ it is 300 vs 2000
    * (6.7×), and the broadcast tables a node must hold shrink from the
    * full √k-row coarse table to k^(2/3) rows — the multi-index descent
    * FAISS's IMI applies when even the coarse codebook outgrows
    * residency. The price is one extra O(n) vec_id equi-join (each
    * descent level rejoins the corpus to pick within its group): a
    * linear shuffle traded against a √k/k^(1/3)-factor of broadcast-join
    * compute, which wins whenever k outgrows ~10⁴.
    *
    * All three codebooks are hash-ranked ([[hashSeeds]]); the fine
    * codebook shares the flat and two-level chains' "ivfseed" universe,
    * so identical vectors co-assign under every scheme (the property the
    * invariant spec pins). Level sizes are k1 = ⌈k^(1/3)⌉ exactly
    * ([[cbrtCeil]]) and k2 = k1² — integer-exact in both engines.
    * Non-empty-group guards run bottom-up (a level-2 centroid with no
    * fine members, a level-1 centroid with no surviving level-2) so no
    * vector can strand, mirroring [[coarseAssignments]]'s coarseNE.
    */
  private def imiAssignments(s: SparkSession, dir: String, emb: DataFrame,
      tag: String): DataFrame = {
    val nk = emb.agg(greatest(lit(MIN_CENTROIDS.toLong),
      ceil(count(lit(1)).cast(DoubleType) / lit(TARGET_CELL))).as("k"))
    // plan-static ArgTopN buffer widths from the memoized corpus count —
    // the same law as the broadcast probeWidth frame (integer-exact twin,
    // spec-pinned equal), so the runtime slice never outruns the buffer.
    // One count job per (session, chain, corpus); column-pruned to a
    // row-count scan.
    val (capP, capB1) = staticProbeWidth(
      Preconditions.longOnce(s, s"rowcount:imi:$tag:$dir")(emb.count()))
    val k1df = cbrtCeil(nk)
    val k2df = k1df.select((col("k") * col("k")).as("k"))
    val fine = hashSeeds(Tables.embeddings(s, dir), nk, "ivfseed")
    val l1 = hashSeeds(Tables.embeddings(s, dir), k1df, "ivfl1")
      .select(col("cid").as("g1"), col("ce").as("e1"), col("nc").as("n1"))
    val l2 = hashSeeds(Tables.embeddings(s, dir), k2df, "ivfl2")
      .select(col("cid").as("g2"), col("ce").as("e2"), col("nc").as("n2"))
    // level-2 centroid → level-1 group: k2·k1 rows, codebook-scale
    val l2pick = l2.crossJoin(broadcast(l1))
      .withColumn("cs", dot(col("e2"), col("e1")) / (col("n2") * col("n1")))
      .groupBy(col("g2")).agg(argTop2(col("cs"), col("g1")).as("t2"))
      .select(col("g2"), col("t2").getField("cell").as("g1"))
    val l2g = l2pick.join(l2, Seq("g2"))
    // fine centroid → level-2, via the same descent (k·k1 + k·E[k1] rows,
    // never k·k2 = k^(5/3) — at k = 10⁶ that flat pass would be 10¹⁰ rows)
    val l1withL2 = l1.join(broadcast(l2g.select(col("g1")).distinct()), Seq("g1"))
    val fpick1 = fine.crossJoin(broadcast(l1withL2))
      .withColumn("cs", dot(col("ce"), col("e1")) / (col("nc") * col("n1")))
      .groupBy(col("cid")).agg(argTop2(col("cs"), col("g1")).as("t2"))
      .select(col("cid"), col("t2").getField("cell").as("g1"))
    val fpick2 = fpick1.join(fine, Seq("cid")).join(broadcast(l2g), Seq("g1"))
      .withColumn("cs", dot(col("ce"), col("e2")) / (col("nc") * col("n2")))
      .groupBy(col("cid")).agg(argTop2(col("cs"), col("g2")).as("t2"))
      .select(col("cid"), col("t2").getField("cell").as("g2"))
    val fgrp = fpick2.join(fine, Seq("cid"))
      .select(col("g2"), col("cid"), col("ce"), col("nc"))
    // bottom-up non-empty guards: vectors descend only into chains that
    // end at ≥1 fine centroid
    val l2ne = l2g.join(broadcast(fgrp.select(col("g2")).distinct()), Seq("g2"))
    val l1ne = l1.join(broadcast(l2ne.select(col("g1")).distinct()), Seq("g1"))
    // Vector descent (round 10 — multi-probe-shaped; round 14 — DERIVED
    // width): level-1 keeps the top-b1 groups, level-2 ranks the union
    // of those groups' centroids and keeps the top-p CELLS, and the fine
    // step picks the best centroid within EACH cell; `cell` is the
    // overall argmax and the remaining ranked cell winners are the
    // probe REGIONS — never a same-menu runner-up (round 10 measured
    // that probing one adds ZERO recall: truth pairs that separate,
    // separate at levels 1–2, where the menus don't overlap at all).
    // Round 14: the region count p derives from the cell count
    // ([[probeWidth]] — the fixed p = 2 left the 10⁷ emission-band
    // recall ceiling at 0.9217 against the 0.95 governance floor), so
    // the beams are the sort-free ArgTopN collapse sliced to (b1, p) at
    // projection time; identical vectors take identical decisions at
    // every step, so planted twins still co-assign. Cost: O((b1+p+2)·
    // n·k^(1/3)·d) chain candidates — k^(1/4+1/3) per vector, still
    // k^(1/6)/k^(1/4)-factors under the two-level chain's O(n·√k·d).
    val pb = probeWidth(nk)
    val v1 = withNorm(emb).crossJoin(broadcast(l1ne))
      .withColumn("cs", dot(col("embedding"), col("e1")) / (col("nrm") * col("n1")))
      .groupBy(col("vec_id")).agg(argTopN(col("cs"), col("g1"), capB1).as("tops"))
      .crossJoin(broadcast(pb))
      .select(col("vec_id"),
        explode(slice(col("tops"), lit(1), col("b1").cast(IntegerType))).as("t"))
      .filter(col("t").isNotNull)
      .select(col("vec_id"), col("t").getField("cid").as("g1"))
    val v2 = withNorm(emb).join(v1, Seq("vec_id")).join(broadcast(l2ne), Seq("g1"))
      .withColumn("cs", dot(col("embedding"), col("e2")) / (col("nrm") * col("n2")))
      .groupBy(col("vec_id")).agg(argTopN(col("cs"), col("g2"), capP).as("tops"))
      .crossJoin(broadcast(pb))
      .select(col("vec_id"),
        explode(slice(col("tops"), lit(1), col("p").cast(IntegerType))).as("t"))
      .filter(col("t").isNotNull)
      .select(col("vec_id"), col("t").getField("cid").as("g2"))
    val fineCand = withNorm(emb).join(v2, Seq("vec_id")).join(broadcast(fgrp), Seq("g2"))
      .withColumn("cs", dot(col("embedding"), col("ce")) / (col("nrm") * col("nc")))
    // per-(vector, cell) winner CARRYING its score for the cross-cell
    // rank: the ArgMax1 declarative aggregate — (cs DESC, cid ASC)
    // selection with two PRIMITIVE buffer slots, so the fine-candidate
    // relation collapses in a map-side HashAggregate (a max(struct(...))
    // spelling keeps the score too, but its struct buffer demotes the
    // aggregation to SortAggregateExec and re-sorts the O(n·k^(1/3))
    // candidates — the sorter tax ArgTop2 killed, caught by the
    // PlanShapeSpec sort-free gate)
    val winners = fineCand.groupBy(col("vec_id"), col("g2"))
      .agg(argMax1(col("cs"), col("cid")).as("w"))
      .select(col("vec_id"), col("w").getField("cs").as("cs"),
        col("w").getField("cid").as("cid"))
    // Region emission (round 14): the ≤p explored cells' winners rank
    // into ONE ArgTopN pass; `cell` is the overall argmax, `probes` the
    // ranked extra regions 2..p each carrying its cross-REGION margin
    // s1 − s_r — how much better the home region's best centroid fits
    // than region r's — the boundary-ness the margin-gated probe search
    // keys on, per region. cell2/mgn stay as the rank-2 columns (the
    // hot-cell split key and the margin-distribution stat).
    val s1 = col("tops").getItem(0).getField("cs")
    winners.groupBy(col("vec_id")).agg(argTopN(col("cs"), col("cid"), capP).as("tops"))
      .crossJoin(broadcast(pb))
      .select(col("vec_id"),
        col("tops").getItem(0).getField("cid").as("cell"),
        get(col("tops"), lit(1)).getField("cid").as("cell2"),
        (s1 - get(col("tops"), lit(1)).getField("cs")).as("mgn"),
        // the home-region score (cos to the winning fine centroid — by
        // construction the max over the home cell's full codebook): the
        // probe search's angular-prune anchor (round 15, see
        // [[probeVerifiedPairs]])
        s1.as("s1"),
        transform(
          filter(slice(col("tops"), lit(2), (col("p") - 1).cast(IntegerType)),
            t => t.isNotNull),
          t => struct(t.getField("cid").as("pc"),
            (s1 - t.getField("cs")).as("mgn"))).as("probes"))
  }

  /** Nearest- and second-nearest-centroid assignment by cosine (spherical
    * k-means step): broadcast the centroid table, argmax via the sort-free
    * [[graft.expr.ArgTop2]] aggregate ((cos DESC, cid ASC) — identical
    * selection to a row_number ≤ 2 window, which the oracle twins still
    * spell). `cell2` (the runner-up, null when k = 1) is the hot-cell
    * sub-split key, unused until a cell exceeds CELL_CAP. Round 9: the
    * window spelling forced the n·k candidate relation through a sort
    * (0.4 TB of sorter traffic at the 10⁷ probe); as an aggregate the
    * candidates collapse in the partial HashAggregate ABOVE the broadcast
    * join — same codegen stage, nothing sorted, one 4-slot buffer per
    * vector reaches the exchange.
    */
  private def assignCells(emb: DataFrame, cent: DataFrame): DataFrame =
    withNorm(emb).crossJoin(broadcast(cent))
      .withColumn("cos_c", dot(col("embedding"), col("ce")) / (col("nrm") * col("nc")))
      .groupBy(col("vec_id"))
      .agg(argTop2(col("cos_c"), col("cid")).as("t2"))
      .select(col("vec_id"),
        col("t2").getField("cell").as("cell"),
        col("t2").getField("cell2").as("cell2"),
        (col("t2").getField("s1") - col("t2").getField("s2")).as("mgn"),
        col("t2").getField("s1").as("s1"))
      .withColumn("probes", rankTwoProbes)

  /** Refined join key over an IVF assignment: cells at or under CELL_CAP
    * keep the plain cell id; hot cells split by the second-nearest
    * centroid. One tiny per-cell count broadcast back — the corpus-sized
    * side never reshuffles, and the candidate join stays a single equi-join
    * on `ck`.
    */
  private[queries] def refinedAssign(assign: DataFrame): DataFrame = {
    val sizes = assign.groupBy(col("cell")).agg(count(lit(1)).as("cn"))
    assign.join(broadcast(sizes), Seq("cell"))
      .withColumn("ck", when(col("cn") > CELL_CAP,
        concat_ws(":", col("cell"), coalesce(col("cell2"), col("cell"))))
        .otherwise(col("cell").cast(StringType)))
      // pass the chain's own columns through (the IMI chain adds the
      // derived-width probe list); only the size scratch column drops
      .select(assign.columns.map(col) :+ col("ck"): _*)
  }

  /** Deterministic IVF cell assignments: k-means seeds = the first vec_ids,
    * one Lloyd refinement (assign → component-wise means → re-assign).
    * Empty cells simply vanish (their members re-assign elsewhere) — the
    * standard k-means degenerate-cell behavior. Centroids re-quantize to
    * float32: vec_dot is an array<float> kernel, and the oracle applies the
    * identical DOUBLE→REAL rounding.
    */
  private def ivfAssignments(s: SparkSession, dir: String, emb: DataFrame): DataFrame = {
    // k from the corpus, not a constant: a broadcast 1-row count, the same
    // no-driver-action scalar pattern as the percentile-bounds broadcasts.
    // cid stays BIGINT (here and in coarseAssignments — the round-8 ANSI
    // overflow lesson past 2^31 vec_ids); seeds come from the hash-ranked
    // codebook (round 9 — id-distribution-free, see [[hashSeeds]]).
    val k = emb.agg(greatest(lit(MIN_CENTROIDS.toLong),
      ceil(count(lit(1)).cast(DoubleType) / lit(TARGET_CELL))).as("k"))
    val assign0 = assignCells(emb, hashSeeds(Tables.embeddings(s, dir), k, "ivfseed"))
    val refined = emb.join(assign0, Seq("vec_id"))
      .select(col("cell"), posexplode(col("embedding")).as(Seq("d", "x")))
      .groupBy(col("cell"), col("d"))
      .agg(avg(col("x").cast(DoubleType)).as("m"))
      .groupBy(col("cell"))
      .agg(transform(array_sort(collect_list(struct(col("d"), col("m")))),
        t => t.getField("m")).as("ce"))
      .select(col("cell").as("cid"), col("ce").cast(ArrayType(FloatType)).as("ce"))
      .withColumn("nc", norm(col("ce")))
    assignCells(emb, refined)
  }

  def ivfQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ANN via IVF with k-means centroids: deterministic seeds (the first
    // vec_ids) refined by one Lloyd step — assign all vectors to their
    // nearest seed, recompute each cell's component-wise mean declaratively
    // (explode → groupBy(cell, dim) → re-assemble ordered array), then the
    // FINAL assignment and the within-cell pair join use the refined
    // centroids. nprobe=1; at scale, probing the p nearest centroids trades
    // recall for p× candidate volume — the same bucket-join shape. The
    // gate's robustness does not depend on float drift in the means:
    // identical vectors assign identically under ANY centroid set, and only
    // identical (planted) pairs clear the 0.999 threshold.
    "sim_ann_ivf" -> ((s, dir) => {
      register(s)
      val emb = augmented(s, dir)
      val assign = sharedIvfAssign(s, dir)
      val e = withNorm(emb).join(assign, Seq("vec_id"))
      val l = e.select(col("ck"), col("vec_id").as("i"), col("embedding").as("ea"), col("nrm").as("na"))
      val r = e.select(col("ck"), col("vec_id").as("j"), col("embedding").as("eb"), col("nrm").as("nb"))
      l.join(r, Seq("ck")).filter(col("i") < col("j"))
        .withColumn("cos", dot(col("ea"), col("eb")) / (col("na") * col("nb")))
        .filter(col("cos") >= ANN_T)
        .select(col("i"), col("j"), round(col("cos"), 6).as("cosine"))
    }),

    // IVF search with nprobe=2 — THE recall lever the `sim_ann_ivf`
    // scaladoc names: every vector probes its nearest AND second-nearest
    // centroid's cell (`cell2` rides along from the same assignment window
    // at zero extra cost), so pairs split across a cell boundary — the
    // boundary-loss failure mode of nprobe=1 IVF — become candidates.
    // Probes join the home-cell index on the raw cell id as a plain
    // equi-join (candidate volume is nprobe× the nprobe=1 path; at
    // production scale the probed join reuses the identical CELL_CAP
    // refined-key discipline, which the home cells here already carry).
    // Round 9: runs on the COARSE two-level assignment (the production
    // index — flat assignment quadratizes with k ∝ n, see
    // [[sharedCoarseAssign]]). By construction the candidate set is a
    // superset of `sim_ann_ivf_coarse`'s same-cell pairs, so probe
    // recall ≥ nprobe=1 recall — pinned in [[QueryInvariantSpec]].
    // SCALE SHAPE (round 9, from the n=10⁶ probe): candidates are FILTERED
    // IN the probe join and deduplicated only after. The earlier
    // candidate-first plan (`.distinct()` on the raw (i, j) candidate set
    // before any scoring) shuffled the ~2·nprobe·n·E[cell] candidate rows
    // THREE times — the distinct plus both fetch joins — and measured
    // 547 s at n=10⁶ vs 40 s for the nprobe=1 gate. Filtering inline
    // keeps the candidate volume inside one codegen stage (join → bound →
    // filter), so the distinct runs over the bound survivors
    // (O(near-dups), corpus-independent). A pair found via both probe
    // routes evaluates the bound bit-identically (elementwise float dot
    // is commutative, same sum order), so the survivor distinct collapses
    // it exactly before the rescore fetch pays for it.
    // Round 10: the probe join rides the pair SKETCH ([[sharedPairSketch]])
    // — tier-1 scores the Cauchy–Schwarz bound on 16-d heads inside the
    // probe join (the same inline-scoring shape as before, so the 2·n·√k
    // candidate volume still never re-shuffles), the distinct now runs
    // over the tiny bound-survivor (i, j) set (O(near-dups), exactly the
    // post-filter-distinct discipline of round 9), and tier-2 rescores
    // survivors exactly — output identical to inline exact scoring.
    "sim_ann_ivf_probe" -> ((s, dir) => {
      register(s)
      probeVerifiedPairs(s, dir, sharedCoarseAssign(s, dir))
        .select(col("i"), col("j"), round(col("cos"), 6).as("cosine"))
    }),

    // IVF candidates scored on INT8-QUANTIZED vectors first, exact-cosine
    // rescore second — the two-tier scoring every production ANN system
    // runs at 100 TB: the index stores 4×-compressed int8 codes
    // (emb_quantize_sq's scheme: per-vector max-abs scale, q=⌊x·s+0.5⌋),
    // the within-cell candidate pass scores on codes (integer dot products,
    // exact in double), and only candidates clearing a margin-relaxed
    // threshold fetch full-precision vectors for the exact rescore. The
    // margin (QP_MARGIN) dominates the worst-case int8 cosine error
    // (~(4/127)·(max_a/‖a‖ + max_b/‖b‖) ≈ 0.024 at 64-d), so the prefilter
    // can only drop pairs whose EXACT cosine is also below ANN_T — output ≡
    // `sim_ann_ivf_coarse` (round 9: the candidate cells come from the
    // production two-level assignment, [[sharedCoarseAssign]]), pinned in
    // [[QueryInvariantSpec]]. At scale the rescore
    // fetch is O(candidates), and the candidate scan reads 1/4 the bytes.
    "sim_ann_quantized_rescore" -> ((s, dir) => {
      register(s)
      val emb = augmented(s, dir)
      val assign = sharedCoarseAssign(s, dir)
      val mx = aggregate(col("embedding"), lit(0.0d),
        (acc, x) => greatest(acc, abs(x.cast(DoubleType))))
      // The candidate join carries ONLY the int8 codes (float-exact ≤ 127,
      // so vec_dot scores them codegen'd and allocation-free), the scale,
      // and the norm — the full-precision vectors stay out of the shuffle
      // entirely, which is the actual byte saving of a quantized index.
      val q8 = withNorm(emb).join(assign, Seq("vec_id"))
        .withColumn("sc", lit(127.0d) / mx)
        .withColumn("qv", transform(col("embedding"),
          x => floor(x.cast(DoubleType) * col("sc") + 0.5d).cast(FloatType)))
        .select(col("ck"), col("vec_id"), col("qv"), col("sc"), col("nrm"))
      val l = q8.select(col("ck"), col("vec_id").as("i"), col("qv").as("qa"),
        col("sc").as("sa"), col("nrm").as("na"))
      val r = q8.select(col("ck"), col("vec_id").as("j"), col("qv").as("qb"),
        col("sc").as("sb"), col("nrm").as("nb"))
      val cand = l.join(r, Seq("ck")).filter(col("i") < col("j"))
        .withColumn("qcos",
          dot(col("qa"), col("qb")) / (col("sa") * col("sb") * col("na") * col("nb")))
        .filter(col("qcos") >= ANN_T - QP_MARGIN)
        .select(col("i"), col("j"))
      // rescore fetch: candidates are O(near-dups), so these two vec_id
      // equi-joins touch full-precision vectors for a sliver of the corpus
      val n = withNorm(emb)
      cand
        .join(n.select(col("vec_id").as("i"), col("embedding").as("ea"), col("nrm").as("na")), Seq("i"))
        .join(n.select(col("vec_id").as("j"), col("embedding").as("eb"), col("nrm").as("nb")), Seq("j"))
        .withColumn("cos", dot(col("ea"), col("eb")) / (col("na") * col("nb")))
        .filter(col("cos") >= ANN_T)
        .select(col("i"), col("j"), round(col("cos"), 6).as("cosine"))
    }),

    // IVF-PQ search — THE production trillion-vector ANN shape (FAISS's
    // IVF*,PQ*): the COARSE two-level IVF assignment (round 9 — the flat
    // assignment quadratizes with k ∝ n; [[sharedCoarseAssign]] is the
    // billion-vector discipline) restricts candidates to the anchor's
    // cell (the shared refined-key discipline), and those candidates are
    // scored from their 8 one-byte PQ codes via the anchor's broadcast
    // lookup table — so the pair scan touches neither full vectors nor
    // even int8 vectors, only codes. Composes the two shared indexes a
    // deployment maintains (cell assignment + code table); per-candidate
    // cost is 8 table adds. Planted-twin recall pinned in
    // [[QueryInvariantSpec]] (a twin shares cell AND codes).
    "sim_ann_ivf_pq" -> ((s, dir) => {
      register(s)
      val emb = augmented(s, dir)
      val assign = sharedCoarseAssign(s, dir)
      val cb = pqCodebook(emb)
      val codes = sharedPqCodes(s, dir)
        .select(col("vec_id").as("nb"), col("m"), col("code"))
      val anch = AnchorSample.withAnchors(emb, col("vec_id"))
        .filter(col("is_anchor"))
      val anchSv = anch
        .select(col("vec_id").as("q"), explode(sequence(lit(0), lit(7))).as("m"), col("embedding"))
        .select(col("q"), col("m"), slice(col("embedding"), col("m") * 8 + 1, lit(8)).as("sv"))
      val lut = anchSv.join(broadcast(cb), Seq("m"))
        .withColumn("ld2", pqDist2(col("sv"), col("cb")))
        .select(col("q"), col("m"), col("code"), col("ld2"))
      val cand = anch.select(col("vec_id").as("q"))
        .join(assign.select(col("vec_id").as("q"), col("ck")), Seq("q"))
        .join(assign.select(col("ck"), col("vec_id").as("nb")), Seq("ck"))
        .filter(col("q") =!= col("nb"))
        .select(col("q"), col("nb"))
      val w = Window.partitionBy(col("q"))
        .orderBy(col("adist").asc, col("nb").asc)
      cand.join(codes, Seq("nb"))
        .join(broadcast(lut), Seq("q", "m", "code"))
        .groupBy(col("q"), col("nb"))
        .agg(sum(col("ld2").cast(DecimalType(28, 12))).as("adist"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= TOPK)
        .select(col("q").as("vec_id"), col("rn").cast(IntegerType).as("rank"),
          col("nb").as("neighbor_id"), round(col("adist").cast(DoubleType), 6).as("adist"))
    }),

    // Int8 scalar quantization (the SQ compression step ANN infrastructure
    // runs before indexing 100 TB of embeddings — 4× smaller vectors, dot
    // products on int8): per-vector max-abs scaling, q = ⌊x·scale + 0.5⌋
    // (spelled as floor, not round(), so both engines execute the identical
    // IEEE expression — round()'s tie rule differs across engines),
    // reported with the per-vector reconstruction MSE. Map-only: one pass,
    // no shuffle at any scale.
    "emb_quantize_sq" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val mx = aggregate(col("embedding"), lit(0.0d),
        (acc, x) => greatest(acc, abs(x.cast(DoubleType))))
      val q = emb.withColumn("scale", lit(127.0d) / mx)
      val err = aggregate(
        zip_with(col("embedding"),
          transform(col("embedding"),
            x => floor(x.cast(DoubleType) * col("scale") + 0.5d)),
          (x, qv) => {
            val d = x.cast(DoubleType) - qv / col("scale")
            d * d
          }),
        lit(0.0d), (acc, d) => acc + d)
      q.select(col("vec_id"), round(col("scale"), 6).as("scale"),
        round(err / size(col("embedding")), 6).as("mse"))
    }),

    // (PQ helpers live below pqDist2; queries: emb_pq_encode, sim_ann_pq_adc)
    // Product quantization encode (M=8 subspaces × 8 dims, K=16 codes):
    // the 100-TB embedding-index compression beyond scalar quantization —
    // 8 one-byte codes per 64-d float vector (32×), with asymmetric
    // distances computable from per-query lookup tables downstream. The
    // codebook derives deterministically from the corpus (the IVF-seeds
    // discipline: entry c of subspace m = the c-th vector's m-th
    // subvector, c < 16); per (vector, subspace) the nearest entry by
    // exact L2 wins, ties to the lower code. Scale shape: the codebook is
    // 128 tiny rows → broadcast; encode is one window over (vec_id, m) —
    // candidate volume n×M×K, linear in the corpus; per-subspace
    // distortions DECIMAL-cast before the per-vector sum (exact, order
    // independent). Codebook-member vectors must self-encode at zero
    // distortion — pinned in [[QueryInvariantSpec]].
    "emb_pq_encode" -> ((s, dir) => {
      register(s)
      val emb = Tables.embeddings(s, dir)
      val enc = pqAssign(pqSubvectors(emb), pqCodebook(emb))
        .withColumn("d2x", col("d2").cast(DecimalType(28, 12)))
      val codeCols = (0 until 8).map(m =>
        max(when(col("m") === m, col("code"))).as(s"c$m"))
      enc.groupBy(col("vec_id"))
        .agg(codeCols.head, codeCols.tail :+
          round(sum(col("d2x")).cast(DoubleType) / 64.0d, 6).as("mse"): _*)
    }),

    // PQ asymmetric-distance search (the IVF-PQ scoring half): each ANCHOR
    // query builds a lookup table of exact L2² against every codebook
    // entry (s×8×16 rows — broadcast), and the coded corpus is scored by
    // summing 8 table entries per vector — the corpus side never touches
    // floats, only one-byte codes, which is why a 100 TB index scans at
    // code width. Distances are code-space approximations; top-k per
    // anchor with (adist, id) tie-break. Per-(anchor, m) entries are
    // DECIMAL-cast before the 8-way sum (exact, order independent). Runs
    // over the AUGMENTED corpus (planted exact duplicates, like every ANN
    // gate): an anchor's twin shares all 8 codes, so its adist is the
    // anchor's own reconstruction distortion — planted-duplicate recall is
    // pinned in [[QueryInvariantSpec]]. (Top-k recall on UNSTRUCTURED
    // random vectors is inherently low for any 16-entry codebook —
    // near-equidistant points — which is why the gate plants structure.)
    "sim_ann_pq_adc" -> ((s, dir) => {
      register(s)
      val emb = augmented(s, dir)
      val cb = pqCodebook(emb)
      val codes = sharedPqCodes(s, dir)
      val anchSv = AnchorSample.withAnchors(emb, col("vec_id"))
        .filter(col("is_anchor")).select(col("vec_id"), col("embedding"))
        .select(col("vec_id").as("q"), explode(sequence(lit(0), lit(7))).as("m"), col("embedding"))
        .select(col("q"), col("m"), slice(col("embedding"), col("m") * 8 + 1, lit(8)).as("sv"))
      val lut = anchSv.join(broadcast(cb), Seq("m"))
        .withColumn("ld2", pqDist2(col("sv"), col("cb")))
        .select(col("q"), col("m"), col("code"), col("ld2"))
      val w = Window.partitionBy(col("q"))
        .orderBy(col("adist").asc, col("neighbor_id").asc)
      // spread the code table across cores before the ~|anchors|× LUT
      // expansion + decimal aggregation: the cached entry's own layout is
      // 1-4 AQE-coalesced partitions (right for its size), but THIS
      // consumer amplifies every code row, so it re-spreads its input
      // where the amplification factor is known (measured: 5.7 s -> 2.0 s
      // at sf0.1 on the 1-partition entry)
      codes.repartition(s.sparkContext.defaultParallelism)
        .join(broadcast(lut), Seq("m", "code"))
        .filter(col("q") =!= col("vec_id"))
        .groupBy(col("q"), col("vec_id"))
        .agg(sum(col("ld2").cast(DecimalType(28, 12))).as("adist"))
        .withColumnRenamed("vec_id", "neighbor_id")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= TOPK)
        .select(col("q").as("vec_id"), col("rn").cast(IntegerType).as("rank"),
          col("neighbor_id"), round(col("adist").cast(DoubleType), 6).as("adist"))
    }),

    // Johnson-Lindenstrauss random projection 64 → 16 (Achlioptas ±1
    // signs / √k): THE dimensionality contraction a 100 TB embedding
    // pipeline runs before clustering or coarse ANN — 4× fewer bytes per
    // vector with pairwise distances preserved in expectation (the JL
    // concentration is pinned with a tolerance spec, not the oracle). The
    // sign matrix is derived md5 parity (see [[rpSigns]]) shipped as plan
    // literals, so the per-row path is RP_K sequential folds — map-only,
    // whole-stage codegen, zero shuffles, zero hashing. Output is the 16
    // projected components as scalar columns (the driver's hasher takes
    // no arrays), each a left-to-right fold matching DuckDB's list_sum.
    "emb_random_projection" -> ((s, dir) => {
      val scale = math.sqrt(RP_K.toDouble)
      val comps = (0 until RP_K).map { k =>
        val p = aggregate(
          zip_with(col("embedding"), typedlit(rpSigns(k)),
            (x, sg) => x.cast(DoubleType) * sg),
          lit(0.0d), (acc, v) => acc + v) / lit(scale)
        round(p, 6).as(s"p$k")
      }
      Tables.embeddings(s, dir).select(col("vec_id") +: comps: _*)
    }),

    // SemDeDup-shaped semantic dedup: cluster the corpus (round 9: the
    // COARSE two-level IVF cells — [[sharedCoarseAssign]], the assignment
    // that stays O(n·√k·d) as the corpus and the derived k grow — flat
    // assignment was the round-8 probe's scale cliff), detect within-cell
    // cosine-≥T pairs, close the pair
    // graph into groups (operators.Components, checked fixpoint), and keep
    // ONE representative per group (the min vec_id). The all-pairs space is
    // never materialized — candidates exist only within a cell — and the
    // closure iterates over the pair set, which is orders of magnitude
    // smaller than the corpus. Output is the per-vector keep/drop decision a
    // curation pipeline consumes downstream; at 100 TB the cells shard the
    // corpus so each within-cell join is an equi-join on `cell`.
    "dedup_semantic" -> ((s, dir) => {
      register(s)
      val emb = augmented(s, dir)
      // two-tier within-cell pair detection (round 10): sketch-bound
      // candidates, exact rescore — identical pair set, ~4× less pair-scan
      // compute and a ~3.5×-slimmer candidate shuffle (see
      // [[cellVerifiedPairs]])
      val pairs = cellVerifiedPairs(s, dir, sharedCoarseAssign(s, dir))
        .select(col("i"), col("j"))
      val labels = graft.operators.Components.connectedComponents(pairs)
      val w = Window.partitionBy(col("group_id"))
      emb.select(col("vec_id"))
        .join(labels.select(col("node").as("vec_id"), col("label")), Seq("vec_id"), "left")
        .select(col("vec_id"), coalesce(col("label"), col("vec_id")).as("group_id"))
        .withColumn("group_size", count(lit(1)).over(w))
        .withColumn("is_kept", col("vec_id") === col("group_id"))
    }),

    // Candidate recall of every ANN path against ANCHORED exact-cosine
    // ground truth (COS_T truth pairs touching a derived-constant anchor
    // sample of the augmented corpus — O(s·n), the production
    // recall-estimation shape), UNDER the oracle gate: a bucket-parameter
    // regression (broken banding, wrong probe expansion, degenerate
    // centroids) changes n_found and fails the hash compare, and the
    // recall_ok boolean pins the design floor the way the approx_*
    // tolerance gates do. Anchoring subsamples truth uniformly, so the
    // recall estimate is unbiased — and the planted duplicates guarantee
    // anchored positives at every sf. Round 9: the `ivf` row governs the
    // PRODUCTION index — the coarse two-level assignment every IVF
    // consumer now runs on ([[sharedCoarseAssign]]); the flat chain is
    // governed by `sim_ann_ivf`'s own exact oracle gate (a strictly
    // stronger check than a recall floor), so recall governance no longer
    // pays — or legitimizes — the quadratic flat assignment.
    "ann_recall" -> ((s, dir) => {
      register(s)
      // round 12: truth carries the cosine BAND — the blended recall over
      // all ≥COS_T pairs is composition-dominated at scale (a 64-dim
      // corpus's random geometric tail at barely-COS_T grows with n·s
      // while its per-pair co-assignment probability decays like
      // nprobe²/k, so the blended number falls with k even when the index
      // is healthy — measured and decomposed in SCALE.md round 12). The
      // ≥ANN_T duplicate band is what the production consumers actually
      // OUTPUT (every IVF/LSH gate verifies pairs at ANN_T before
      // emitting), so governance pins BOTH: the blended row (unchanged
      // floors, the historical record) and the duplicate-band recall with
      // its own floor (the quality-at-scale contract — flat at 1.0
      // through 10⁷, see SCALE.md).
      // round 14: truth and anchors are the shared per-(session, corpus)
      // cached governance tables — one maintained fixture serves this
      // gate, the near-twin gate's superset corpus twin, the margin
      // sweep, and the band decomposition (the round-13 verdict's
      // bench-cost item); is_dup derives from the exact cosine by
      // projection, so the gate's rows are bit-identical to the
      // per-query-built round-13 chain
      val truth = sharedAnnTruth(s, dir)
        .select(col("i"), col("j"), (col("cos") >= ANN_T).as("is_dup"))
      // the same anchor set the truth side samples (same universe → same
      // broadcast-derived modulus → identical membership)
      val anchors = sharedAnnAnchors(s, dir)
      val sigs = sharedLshSigs(s, dir)
      // round 14: the four anchor-candidate relations are cached per
      // (session, corpus) WITH the indexes they derive from — an anchored
      // recall estimate is maintained state in a production governance
      // pipeline (fixed anchor set, relation changes only when the index
      // does), and the decomposed warm cost of these gates was almost
      // entirely the ~10-stage self-join plans re-run per evaluation
      // (GovProbe round 14: 8.7 s for one probe-candidate action over an
      // 8000-row cached assignment — stage overhead, not data). Tiny
      // tables (O(s·cell) rows); the sweep/spec seams keep calling the
      // uncached builders, so the cache can never mask a drift between
      // the two.
      val ivfCand = CorpusCache.getOrBuild(s, s"candivf:$dir")(
        anchorCandidates(sharedCoarseAssign(s, dir), "ck", anchors))
      // round 13 (round-12 verdict #3): the BLENDED recall is a
      // composition-sensitive DIAGNOSTIC, not a gated floor — at 10⁶⁺ the
      // random geometric tail dominates n_true and the blended number
      // collapses by geometry (1/k co-assignment of independent
      // directions) even while the production band stays found, so a
      // static blended floor is a latent gate failure at any larger sf.
      // The gated boolean is dup_ok alone (scale-stable by measurement:
      // 1.0 through 10⁷); the blended design floors (RECALL_*_T) survive
      // as [[QueryInvariantSpec]] assertions pinned at the sf0.001
      // fixture, where they are meaningful.
      def recallRow(method: String, cand: DataFrame): DataFrame =
        truth.join(cand.withColumn("hit", lit(1L)), Seq("i", "j"), "left")
          .agg(count(lit(1)).as("n_true"),
            sum(coalesce(col("hit"), lit(0L))).as("n_found"),
            sum(when(col("is_dup"), lit(1L)).otherwise(lit(0L))).as("n_true_dup"),
            sum(when(col("is_dup"), coalesce(col("hit"), lit(0L)))
              .otherwise(lit(0L))).as("n_found_dup"))
          .select(lit(method).as("method"), col("n_true"), col("n_found"),
            round(col("n_found").cast(DoubleType) / col("n_true"), 6).as("recall"),
            col("n_true_dup"), col("n_found_dup"),
            round(col("n_found_dup").cast(DoubleType) / col("n_true_dup"), 6)
              .as("recall_dup"),
            (col("n_found_dup").cast(DoubleType) / col("n_true_dup") >= RECALL_DUP_T)
              .as("dup_ok"))
      // the coarse-quantized assignment is an APPROXIMATION of the flat
      // argmax (boundary vectors may land in a different cell), which is
      // exactly why the production index needs this recall governance — a
      // two-level-restriction regression fails the oracle hash here, not
      // just the wall-clock probe
      recallRow("ivf", ivfCand)
        // round 10: the imi row audits the nprobe=2 candidate shape the
        // sim_ann_ivf_imi gate actually searches (probeVerifiedPairs)
        .unionByName(recallRow("ivf_imi", CorpusCache.getOrBuild(s, s"candimi:$dir")(
          probeAnchorCandidates(sharedImiAssign(s, dir), anchors))))
        .unionByName(recallRow("lsh", CorpusCache.getOrBuild(s, s"candlsh:$dir")(
          anchorCandidates(sigs, "bucket", anchors))))
        .unionByName(recallRow("lsh_multiprobe", CorpusCache.getOrBuild(s, s"candmp:$dir")(
          multiprobeAnchorCandidates(sigs, anchors))))
    }),

    // Near-twin recall governance (round 13 — the round-12 verdict's top
    // item): [[ntAugmented]] plants two PERTURBED cohorts — near-dup twins
    // at cos ≈ 0.98 (the [0.95, 0.999) band a production corpus's
    // re-uploads/paraphrases occupy) and emission-band twins at ≈ 0.9996
    // (≥ANN_T but NOT byte-identical) — and this gate measures per-band
    // candidate recall of the two production indexes over that corpus.
    // Identical copies co-assign by construction; these twins genuinely
    // can straddle cell boundaries, so the a_dup floor here is the first
    // non-tautological evidence the margin-gated nprobe=2 apparatus
    // (τ = PROBE_MARGIN_T) earns its complexity: at 10⁶ the imi row holds
    // the emission band at 0.982 where home-only search leaves it at
    // 0.928 (SCALE.md round 13). Bands come from the exactly-computed
    // cosine, never from cohort membership; the sub-emission bands ride
    // as ungated diagnostics (band_ok = true: their absolute recall is
    // scale-dependent geometry — see the no-floor note at [[NT_BAND_LO]];
    // the τ apparatus's own contract is the spec-pinned capture ratio
    // against the ungated nprobe=2 ceiling). Truth is
    // anchored (O(s·n)); candidates are anchor-restricted (O(s·cell)); the
    // assignments are cached per (session, corpus) like every index.
    "ann_recall_neartwin" -> ((s, dir) => {
      register(s)
      val truth = anchoredNtTruthBands(s, dir)
      val anchors = sharedNtAnchors(s, dir)
      def bandRows(method: String, cand: DataFrame): DataFrame =
        truth.join(cand.withColumn("hit", lit(1L)), Seq("i", "j"), "left")
          .groupBy(col("band"))
          .agg(count(lit(1)).as("n_true"),
            sum(coalesce(col("hit"), lit(0L))).as("n_found"))
          .withColumn("recall",
            round(col("n_found").cast(DoubleType) / col("n_true"), 6))
          .select(lit(method).as("method"), col("band"), col("n_true"),
            col("n_found"), col("recall"),
            // only the EMISSION band carries a floor; the sub-emission
            // bands are scale-dependent geometry (see the no-floor note at
            // [[NT_BAND_LO]]) and ride as ungated diagnostics
            when(col("band") === "a_dup",
              col("n_found").cast(DoubleType) / col("n_true") >= RECALL_DUP_T)
              .otherwise(lit(true)).as("band_ok"))
      // the same maintained-candidate discipline as `ann_recall` (the
      // sweep/spec seams audit the uncached builders)
      bandRows("ivf", CorpusCache.getOrBuild(s, s"candivfnt:$dir")(
        anchorCandidates(sharedCoarseAssignNt(s, dir), "ck", anchors)))
        .unionByName(bandRows("ivf_imi", CorpusCache.getOrBuild(s, s"candimint:$dir")(
          probeAnchorCandidates(sharedImiAssignNt(s, dir), anchors))))
    }),

    // IVF under a COARSE QUANTIZER — the billion-vector assignment shape.
    // `sim_ann_ivf`'s flat assignment compares every vector against every
    // centroid: O(n·k·d), and since the derived k is n/1024, O(n²·d/1024)
    // — the round-8 n=10⁶ probe measured this as the family's scale cliff.
    // Here assignment is two-level (nearest coarse group of ⌈√k⌉, then
    // nearest fine centroid within the group — see [[coarseAssignments]]):
    // O(n·√k·d), sub-quadratic at any corpus size. The within-cell pair
    // join, hot-cell split, and 0.999 verification are identical to the
    // flat path; identical (planted) vectors co-assign under either
    // scheme, so both recover exactly the planted duplicate set — pinned
    // against `sim_ann_ivf` in [[QueryInvariantSpec]].
    // Round 10: the within-cell verification is two-tier ([[cellVerifiedPairs]]
    // — sketch-bound candidates, exact rescore of survivors; output
    // provably identical to the single-tier exact join, so the oracle twin
    // below stays an exact-semantics replay).
    "sim_ann_ivf_coarse" -> ((s, dir) => {
      register(s)
      cellVerifiedPairs(s, dir, sharedCoarseAssign(s, dir))
        .select(col("i"), col("j"), round(col("cos"), 6).as("cosine"))
    }),

    // IVF under a THREE-LEVEL quantizer descent (IMI-shaped) — the
    // assignment for when even the two-level chain's ⌈√k⌉ coarse table
    // outgrows broadcast residency: level-1 (⌈k^(1/3)⌉) → level-2 (k^(2/3),
    // within the chosen level-1 group) → fine top-2 (within the chosen
    // level-2 group), O(3·n·k^(1/3)·d) candidate rows vs the two-level
    // O(2·n·√k·d) — see [[imiAssignments]]. Round 10: the SEARCH is
    // nprobe=2 ([[probeVerifiedPairs]] — home ∪ second-nearest cell,
    // sketch-bound tier-1, exact rescore): the deeper descent is a
    // coarser approximation, and the FAISS-IMI discipline buys the
    // recall back with a wider probe, not a wider descent (the round-9
    // verdict's thin 0.823 margin; probe candidates strictly contain the
    // nprobe=1 set, measured 0.891 at sf0.1). Candidate recall is
    // governed by `ann_recall`'s `ivf_imi` row — which audits the SAME
    // nprobe=2 candidate shape this gate searches — and identical
    // (planted) vectors still co-assign at every level — pinned in
    // [[QueryInvariantSpec]].
    "sim_ann_ivf_imi" -> ((s, dir) => {
      register(s)
      probeVerifiedPairs(s, dir, sharedImiAssign(s, dir))
        .select(col("i"), col("j"), round(col("cos"), 6).as("cosine"))
    }),

    // Hybrid retrieval fusion via Reciprocal Rank Fusion (Cormack et al.
    // 2009 — the standard RAG-corpus curation step): the lexical arm is
    // the maintained BM25 postings index (Curation.bm25Ranked, the
    // text_bm25_topk chain at depth FUSE_N) and the semantic arm is the
    // maintained coarse IVF index (the anchor's refined cell, exact-cosine
    // ranked) — both for the SAME query-by-example anchor (min doc_id;
    // documents and embeddings share the id space). Each arm contributes
    // 1/(RRF_K + rank); absent docs contribute 0; fused top-10 by (score
    // desc, doc_id asc). Scale shape: both arms are per-candidate probes
    // of indexes a deployment already maintains — the corpus is touched
    // only through the query-term postings and the anchor's cell — and the
    // fusion itself joins two ≤FUSE_N-row lists. The semantic arm's
    // augmented-assignment rows restrict to real documents through the
    // inner score join against the BASE embeddings table (planted twins
    // drop there, id-range-free, so the restriction survives shifted-id
    // probe fixtures).
    "fusion_rrf" -> ((s, dir) => {
      register(s)
      val lex = Curation.bm25Ranked(s, dir, FUSE_N)
        .select(col("doc_id"), col("lex_rank"))
      val emb = Tables.embeddings(s, dir)
      // id-span precondition (round-9 advice): the semantic arm drops
      // planted twins through its inner join against BASE embeddings —
      // which is only sound while no two base vec_ids differ by exactly
      // the +100000 augment offset (an aliased twin would duplicate a
      // real doc in the candidate list, mirrored in the oracle, so the
      // hash gate could not catch it). Enforce eagerly at construction
      // (the Bloom-capacity `.first()` discipline): one O(n) left-semi
      // probe, failing fast on any corpus violating the assumption —
      // MEMOIZED per (session, dir) (round-10 advice: plan-only consumers
      // and repeated constructions must not pay the scan again).
      Preconditions.once(s, s"fusion_rrf:id-span:$dir") {
        require(emb.select((col("vec_id") + lit(100000L)).as("vec_id"))
            .join(emb.select(col("vec_id")), Seq("vec_id"), "left_semi").isEmpty,
          "fusion_rrf: the +100000 augment offset aliases real vec_ids in this corpus")
      }
      val assign = sharedCoarseAssign(s, dir)
      val qdoc = Tables.documents(s, dir).agg(min(col("doc_id")).as("qid"))
      val qvec = withNorm(emb).crossJoin(broadcast(qdoc))
        .filter(col("vec_id") === col("qid"))
        .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"))
      val qck = assign.join(broadcast(qvec.select(col("qid"))),
        col("vec_id") === col("qid")).select(col("ck"))
      val wsem = Window.orderBy(col("cos").desc, col("vec_id").asc)
      val sem = assign.join(broadcast(qck), Seq("ck"))
        .select(col("vec_id"))
        .join(withNorm(emb), Seq("vec_id"))
        .crossJoin(broadcast(qvec))
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("cos", dot(col("embedding"), col("qe")) / (col("nrm") * col("qn")))
        .orderBy(col("cos").desc, col("vec_id").asc).limit(FUSE_N)
        .withColumn("sem_rank", row_number().over(wsem).cast(IntegerType))
        .select(col("vec_id").as("doc_id"), col("sem_rank"))
      val wf = Window.orderBy(col("rrf").desc, col("doc_id").asc)
      lex.join(sem, Seq("doc_id"), "full_outer")
        .withColumn("rrf",
          coalesce(lit(1.0d) / (lit(RRF_K) + col("lex_rank")), lit(0.0d)) +
            coalesce(lit(1.0d) / (lit(RRF_K) + col("sem_rank")), lit(0.0d)))
        .orderBy(col("rrf").desc, col("doc_id").asc).limit(10)
        .withColumn("rank", row_number().over(wf).cast(IntegerType))
        .select(col("doc_id"), col("rank"), round(col("rrf"), 6).as("rrf"),
          coalesce(col("lex_rank"), lit(0)).as("lex_rank"),
          coalesce(col("sem_rank"), lit(0)).as("sem_rank"))
    })
  )

  /** Fusion depth per arm and the standard RRF dampening constant. */
  private[queries] val FUSE_N = 20
  private[queries] val RRF_K = 60

  /** Blended-recall design floors — ALL FOUR asserted executably at the
    * sf0.001 fixture by [[QueryInvariantSpec]]'s governance test: ivf and
    * ivf_imi at ≥ floor + 0.05 headroom, lsh and lsh_multiprobe at their
    * exact floors (the round-14 ADVICE fix — the lsh floors had silently
    * dropped out of governance when the gated boolean narrowed to
    * dup_ok). The blended number is composition-sensitive at scale (see
    * the recallRow note), which is why these live in the spec at the
    * fixture where they are meaningful rather than in the driver-sf gate.
    */
  private[queries] val RECALL_LSH_T = 0.8
  private[queries] val RECALL_MP_T = 0.8
  private[queries] val RECALL_IVF_T = 0.8
  private[queries] val RECALL_IMI_T = 0.8

  /** Floor on DUPLICATE-BAND recall (truth pairs at cos ≥ ANN_T — the band
    * the production consumers emit after verification). Identical planted
    * vectors co-assign deterministically under every method, so the
    * measured value is 1.0 at every tier (sf0.001 → 10⁷, SCALE.md round
    * 12); 0.95 leaves headroom for a fixture that plants near-exact
    * rather than bit-identical duplicates while still failing loudly on
    * any systematic assignment regression.
    */
  private val RECALL_DUP_T = 0.95

  /** Near-twin fixture constants (round 13 — making the recall governance
    * non-tautological; see [[ntAugmented]]). Deltas are per-dimension
    * perturbation magnitudes on the unit-norm corpus: ±0.025/dim → twin
    * cosine ≈ 0.978–0.986 (the [0.95, 0.999) near-duplicate band);
    * ±0.00375/dim → ≈ 0.9996 (inside the ≥ANN_T emission band, NOT
    * byte-identical). Spelled as exact decimal literals both engines
    * parse to the same double.
    */
  private[queries] val NT_DELTA_NEAR = 0.025d
  private[queries] val NT_DELTA_DUP = 0.00375d

  /** Lower edge of the near-twin governance band. */
  private[queries] val NT_BAND_LO = 0.95d

  /** Why the near-twin band carries NO recall floor (round 13): its
    * absolute recall is scale-dependent GEOMETRY, not index health —
    * measured 0.89/0.71/0.77 (coarse) and 0.80/0.88/0.86 (imi nprobe=2)
    * across the three gate sfs, then 0.66 at 10⁶ and 0.60 at 10⁷
    * (SCALE.md round 13): a [0.95, 0.999) pair straddles cell boundaries
    * with probability that grows with the derived cell count, and NO
    * bounded-probe structure pins it — the same adjudication the
    * round-12 tail decomposition made one band down. A static floor here
    * would be the exact latent-gate-failure class the round-12 verdict
    * (#3) removed from the blended number. What IS scale-stable — and
    * spec-pinned ([[QueryInvariantSpec]] "margin gate captures the
    * nprobe=2 ceiling") plus measured per-tier in SCALE.md — is the τ
    * CAPTURE contract: the margin-gated candidate set recovers 97–100%
    * of what the ungated nprobe=2 search can see (≥99.3% in the emission
    * band), at every measured tier through 10⁷, while pruning the second
    * probe for the clear-winner minority that remains at scale. The 10⁷
    * sweep also measured the emission band's own nprobe=2 ceiling at
    * 0.9217 — the named round-14 lever is a cell-count-derived nprobe,
    * not τ.
    */

  private val dotSql =
    "list_sum(list_transform(list_zip(%A, %B), q -> CAST(q[1] AS DOUBLE) * CAST(q[2] AS DOUBLE)))"

  private def dSql(a: String, b: String): String =
    dotSql.replace("%A", a).replace("%B", b)

  /** DuckDB twin of [[pqDist2]] — the exact-L2² fold between two lists. */
  private def pqD2Sql(a: String, b: String): String =
    s"""list_sum(list_transform(list_zip($a, $b),
       |      q -> (CAST(q[1] AS DOUBLE) - CAST(q[2] AS DOUBLE))
       |         * (CAST(q[1] AS DOUBLE) - CAST(q[2] AS DOUBLE))))""".stripMargin

  /** Shared PQ CTEs (codebook → subvectors → distances → argmin ranks)
    * over `src`, the oracle twin of [[pqCodebook]]/[[pqSubvectors]]/
    * [[pqAssign]] — reused by `emb_pq_encode` (base corpus) and
    * `sim_ann_pq_adc` (augmented corpus).
    */
  private def pqCtes(src: String): String =
    s"""cb AS (
       |  SELECT CAST(vec_id AS INTEGER) AS code, m,
       |    embedding[m*8+1 : m*8+8] AS cb
       |  FROM $src, generate_series(0, 7) t(m) WHERE vec_id < 16),
       |sv AS (
       |  SELECT vec_id, m, embedding[m*8+1 : m*8+8] AS sv
       |  FROM $src, generate_series(0, 7) t(m)),
       |d AS (
       |  SELECT sv.vec_id, sv.m, cb.code,
       |    ${pqD2Sql("sv.sv", "cb.cb")} AS d2
       |  FROM sv JOIN cb ON sv.m = cb.m),
       |best AS (
       |  SELECT vec_id, m, code, d2, row_number() OVER (
       |    PARTITION BY vec_id, m ORDER BY d2 ASC, code ASC) AS rn
       |  FROM d)""".stripMargin

  /** DuckDB twin of [[hashSeeds]]: emits `${out}nb` and `$out` = (cid,
    * ce, nc) — exactly k codebook rows ranked by (hash, vec_id) from the
    * 4×-oversampled hash-threshold slice of the base corpus. `kCte` must
    * be an earlier 1-row CTE exposing `k`.
    */
  private def hashSeedsSql(out: String, kCte: String, tag: String): String =
    s"""${out}nb AS (SELECT CAST(count(*) AS DOUBLE) AS nb FROM embeddings),
       |$out AS (
       |  SELECT cid, ce, sqrt(${dSql("ce", "ce")}) AS nc FROM (
       |    SELECT vec_id AS cid, embedding AS ce, k, row_number() OVER (
       |      ORDER BY hs, vec_id) AS rn
       |    FROM (
       |      SELECT e.vec_id, e.embedding, kc.k, b.nb,
       |        ${graft.functions.TextFns.md5Hash60Sql(s"concat('$tag:', vec_id)")} % 1000000 AS hs
       |      FROM embeddings e, $kCte kc, ${out}nb b) t
       |    WHERE hs < ceil(4000000.0 * k / nb)) s
       |  WHERE rn <= k)""".stripMargin

  /** Shared IVF chain CTEs (aug → seeds → assign0 → Lloyd means → refined
    * centroids → final assignment → `e`) — the oracle twin of
    * `ivfAssignments` over the augmented corpus, reused by `sim_ann_ivf`
    * and `dedup_semantic`.
    */
  private lazy val ivfCellCtes: String =
    s"""aug AS (
       |  SELECT vec_id, embedding FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings),
       |k0 AS (SELECT greatest($MIN_CENTROIDS,
       |  CAST(ceil(count(*) / $TARGET_CELL) AS BIGINT)) AS k FROM aug),
       |${hashSeedsSql("cent0", "k0", "ivfseed")},
       |a AS (
       |  SELECT vec_id, embedding,
       |    sqrt(${dSql("embedding", "embedding")}) AS nrm
       |  FROM aug),
       |assign0 AS (
       |  SELECT vec_id, cid AS cell FROM (
       |    SELECT a.vec_id, cent0.cid, row_number() OVER (
       |      PARTITION BY a.vec_id
       |      ORDER BY ${dSql("a.embedding", "cent0.ce")} / (a.nrm * cent0.nc) DESC, cent0.cid ASC) AS rn
       |    FROM a CROSS JOIN cent0)
       |  WHERE rn = 1),
       |comps AS (
       |  SELECT assign0.cell, generate_subscripts(a.embedding, 1) AS d,
       |    unnest(a.embedding) AS x
       |  FROM a JOIN assign0 ON a.vec_id = assign0.vec_id),
       |means AS (
       |  SELECT cell, d, avg(CAST(x AS DOUBLE)) AS m
       |  FROM comps GROUP BY cell, d),
       |cent1 AS (
       |  SELECT cell AS cid,
       |    list_transform(list(m ORDER BY d), v -> CAST(v AS REAL)) AS ce
       |  FROM means GROUP BY cell),
       |cent AS (
       |  SELECT cid, ce, sqrt(${dSql("ce", "ce")}) AS nc FROM cent1),
       |assign AS (
       |  SELECT vec_id,
       |    max(CASE WHEN rn = 1 THEN cid END) AS cell,
       |    max(CASE WHEN rn = 2 THEN cid END) AS cell2
       |  FROM (
       |    SELECT a.vec_id, cent.cid, row_number() OVER (
       |      PARTITION BY a.vec_id
       |      ORDER BY ${dSql("a.embedding", "cent.ce")} / (a.nrm * cent.nc) DESC, cent.cid ASC) AS rn
       |    FROM a CROSS JOIN cent)
       |  WHERE rn <= 2 GROUP BY vec_id),
       |cellsz AS (SELECT cell, count(*) AS cn FROM assign GROUP BY cell),
       |e AS (
       |  SELECT a.vec_id, a.embedding, a.nrm, assign.cell,
       |    CASE WHEN cellsz.cn > $CELL_CAP THEN
       |      CAST(assign.cell AS VARCHAR) || ':' ||
       |        CAST(coalesce(assign.cell2, assign.cell) AS VARCHAR)
       |    ELSE CAST(assign.cell AS VARCHAR) END AS ck
       |  FROM a JOIN assign ON a.vec_id = assign.vec_id
       |  JOIN cellsz ON cellsz.cell = assign.cell)""".stripMargin

  def ivfOracleSql: Map[String, String] = Map(
    "sim_ann_ivf" ->
      s"""WITH $ivfCellCtes
         |SELECT x.vec_id AS i, y.vec_id AS j,
         |  round(${dSql("x.embedding", "y.embedding")} / (x.nrm * y.nrm), 6) AS cosine
         |FROM e x JOIN e y ON x.ck = y.ck AND x.vec_id < y.vec_id
         |WHERE ${dSql("x.embedding", "y.embedding")} / (x.nrm * y.nrm) >= $ANN_T""".stripMargin,

    // the nprobe=2 twin: the same COARSE assignment chain the Spark side
    // shares, probes = home cell ∪ second-nearest cell, candidates
    // normalized to i < j, exact-cosine verification at the same threshold
    "sim_ann_ivf_probe" ->
      s"""WITH $coarseCellCtes,
         |probes AS (
         |  SELECT vec_id, cell AS pc FROM assign
         |  UNION ALL
         |  SELECT vec_id, cell2 AS pc FROM assign
         |  WHERE cell2 IS NOT NULL AND mgn <= $PROBE_MARGIN_T),
         |cand AS (
         |  SELECT DISTINCT least(p.vec_id, t.vec_id) AS i,
         |    greatest(p.vec_id, t.vec_id) AS j
         |  FROM probes p JOIN assign t ON p.pc = t.cell
         |  WHERE p.vec_id <> t.vec_id)
         |SELECT c.i, c.j,
         |  round(${dSql("x.embedding", "y.embedding")} / (x.nrm * y.nrm), 6) AS cosine
         |FROM cand c
         |JOIN a x ON x.vec_id = c.i
         |JOIN a y ON y.vec_id = c.j
         |WHERE ${dSql("x.embedding", "y.embedding")} / (x.nrm * y.nrm) >= $ANN_T""".stripMargin,

    // the PQ twin: same seeded codebook (vector c's subvector for code c),
    // same exact-L2 fold, same (d2, code) tie-break, DECIMAL distortions
    "emb_pq_encode" -> {
      val codeSel = (0 until 8).map(m =>
        s"max(CASE WHEN m = $m THEN code END) AS c$m").mkString(",\n         |  ")
      s"""WITH ${pqCtes("embeddings")},
         |enc AS (
         |  SELECT vec_id, m, code, CAST(d2 AS DECIMAL(28,12)) AS d2x
         |  FROM best WHERE rn = 1)
         |SELECT vec_id,
         |  $codeSel,
         |  round(CAST(sum(d2x) AS DOUBLE) / 64.0, 6) AS mse
         |FROM enc GROUP BY vec_id""".stripMargin
    },

    // the ADC twin: anchors via the shared modulus, per-anchor lookup
    // tables from the same fold, 8-entry DECIMAL sums, (adist, id) ranks
    "sim_ann_pq_adc" ->
      s"""WITH aug AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings),
         |${pqCtes("aug")},
         |codes AS (SELECT vec_id, m, code FROM best WHERE rn = 1),
         |m0 AS (${AnchorSample.modSql("aug")}),
         |anch AS (
         |  SELECT vec_id AS q FROM aug, m0
         |  WHERE ${AnchorSample.predSql("vec_id")}),
         |lut AS (
         |  SELECT sv.vec_id AS q, sv.m, cb.code,
         |    ${pqD2Sql("sv.sv", "cb.cb")} AS ld2
         |  FROM sv JOIN anch ON sv.vec_id = anch.q
         |  JOIN cb ON sv.m = cb.m),
         |adc AS (
         |  SELECT lut.q, codes.vec_id AS neighbor_id,
         |    sum(CAST(ld2 AS DECIMAL(28,12))) AS adist
         |  FROM codes JOIN lut ON codes.m = lut.m AND codes.code = lut.code
         |  WHERE lut.q <> codes.vec_id
         |  GROUP BY lut.q, codes.vec_id)
         |SELECT q AS vec_id, CAST(rn AS INTEGER) AS rank, neighbor_id,
         |  round(CAST(adist AS DOUBLE), 6) AS adist
         |FROM (
         |  SELECT q, neighbor_id, adist, row_number() OVER (
         |    PARTITION BY q ORDER BY adist ASC, neighbor_id ASC) AS rn
         |  FROM adc)
         |WHERE rn <= $TOPK""".stripMargin,

    // the IVF-PQ twin composes the two shared CTE chains (the COARSE cell
    // assignment and the code table, both over aug), restricts candidates
    // to the anchor's refined cell key, and replays the 8-entry DECIMAL sums
    "sim_ann_ivf_pq" ->
      s"""WITH $coarseCellCtes,
         |${pqCtes("aug")},
         |codes AS (SELECT vec_id AS nb, m, code FROM best WHERE rn = 1),
         |m0 AS (${AnchorSample.modSql("aug")}),
         |anch AS (
         |  SELECT vec_id AS q FROM aug, m0
         |  WHERE ${AnchorSample.predSql("vec_id")}),
         |lut AS (
         |  SELECT sv.vec_id AS q, sv.m, cb.code,
         |    ${pqD2Sql("sv.sv", "cb.cb")} AS ld2
         |  FROM sv JOIN anch ON sv.vec_id = anch.q
         |  JOIN cb ON sv.m = cb.m),
         |cand AS (
         |  SELECT a.q, t.vec_id AS nb
         |  FROM anch a JOIN e x ON x.vec_id = a.q
         |  JOIN e t ON t.ck = x.ck
         |  WHERE t.vec_id <> a.q),
         |adc AS (
         |  SELECT c.q, c.nb, sum(CAST(l.ld2 AS DECIMAL(28,12))) AS adist
         |  FROM cand c JOIN codes k ON k.nb = c.nb
         |  JOIN lut l ON l.q = c.q AND l.m = k.m AND l.code = k.code
         |  GROUP BY c.q, c.nb)
         |SELECT q AS vec_id, CAST(rn AS INTEGER) AS rank, nb AS neighbor_id,
         |  round(CAST(adist AS DOUBLE), 6) AS adist
         |FROM (
         |  SELECT q, nb, adist, row_number() OVER (
         |    PARTITION BY q ORDER BY adist ASC, nb ASC) AS rn
         |  FROM adc)
         |WHERE rn <= $TOPK""".stripMargin,

    // the JL twin regenerates the sign matrix from the same md5-parity
    // derivation (md5Key64 spelling), zips it against each embedding, and
    // folds — list_sum matches the Spark aggregate fold bit-for-bit
    "emb_random_projection" -> {
      val pCols = (0 until RP_K).map(k =>
        s"round(max(CASE WHEN k = $k THEN pv END), 6) AS p$k").mkString(",\n         |  ")
      s"""WITH sgn AS (
         |  SELECT k, list(CASE WHEN
         |      CAST(concat('0x', substr(md5(CAST(d AS VARCHAR) || ':' || CAST(k AS VARCHAR)), 1, 15)) AS BIGINT)
         |        % 2 = 0 THEN 1.0 ELSE -1.0 END ORDER BY d) AS sv
         |  FROM generate_series(0, ${RP_K - 1}) t(k),
         |    generate_series(0, ${RP_D - 1}) u(d)
         |  GROUP BY k),
         |p AS (
         |  SELECT e.vec_id, s.k,
         |    list_sum(list_transform(list_zip(e.embedding, s.sv),
         |      q -> CAST(q[1] AS DOUBLE) * q[2])) / ${math.sqrt(RP_K.toDouble)} AS pv
         |  FROM embeddings e CROSS JOIN sgn s)
         |SELECT vec_id,
         |  $pCols
         |FROM p GROUP BY vec_id""".stripMargin
    },

    // the two-tier twin: the same COARSE IVF chain, per-vector scale and
    // int8 codes as lateral aliases, integer code dots (exact in double)
    // for the prefilter, exact-cosine rescore at the same threshold
    "sim_ann_quantized_rescore" ->
      s"""WITH $coarseCellCtes,
         |qe AS (
         |  SELECT vec_id, embedding, nrm, ck,
         |    127.0 / list_aggregate(
         |      list_transform(embedding, x -> abs(CAST(x AS DOUBLE))), 'max') AS sc,
         |    list_transform(embedding,
         |      x -> CAST(floor(CAST(x AS DOUBLE) * sc + 0.5) AS REAL)) AS qv
         |  FROM e)
         |SELECT i, j, round(cos, 6) AS cosine FROM (
         |  SELECT x.vec_id AS i, y.vec_id AS j,
         |    ${dSql("x.qv", "y.qv")}
         |      / (x.sc * y.sc * x.nrm * y.nrm) AS qcos,
         |    ${dSql("x.embedding", "y.embedding")} / (x.nrm * y.nrm) AS cos
         |  FROM qe x JOIN qe y ON x.ck = y.ck AND x.vec_id < y.vec_id)
         |WHERE qcos >= ${ANN_T - QP_MARGIN} AND cos >= $ANN_T""".stripMargin,

    // the dedup_semantic twin replays the COARSE IVF chain, finds
    // within-cell ≥ANN_T pairs, closes them by recursive transitive
    // closure, and emits the per-vector keep/drop decision (min vec_id
    // per group kept)
    "dedup_semantic" ->
      s"""WITH RECURSIVE $coarseCellCtes,
         |pairs AS (
         |  SELECT x.vec_id AS i, y.vec_id AS j
         |  FROM e x JOIN e y ON x.ck = y.ck AND x.vec_id < y.vec_id
         |  WHERE ${dSql("x.embedding", "y.embedding")} / (x.nrm * y.nrm) >= $ANN_T),
         |edges AS (
         |  SELECT i, j FROM pairs
         |  UNION ALL
         |  SELECT j AS i, i AS j FROM pairs),
         |reach(x, y) AS (
         |  SELECT i AS x, j AS y FROM edges
         |  UNION
         |  SELECT r.x, e2.j AS y FROM reach r JOIN edges e2 ON r.y = e2.i),
         |comp AS (
         |  SELECT x AS vec_id, least(x, min(y)) AS group_id
         |  FROM reach GROUP BY x)
         |SELECT aug.vec_id,
         |  coalesce(comp.group_id, aug.vec_id) AS group_id,
         |  CAST(count(*) OVER (
         |    PARTITION BY coalesce(comp.group_id, aug.vec_id)) AS BIGINT) AS group_size,
         |  aug.vec_id = coalesce(comp.group_id, aug.vec_id) AS is_kept
         |FROM aug LEFT JOIN comp ON aug.vec_id = comp.vec_id""".stripMargin,

    // the ann_recall twin replays the full LSH signature chain AND the
    // COARSE two-level centroid chain (the production index — the flat
    // chain is governed by sim_ann_ivf's own exact oracle), then counts
    // truth ∩ candidates per method
    "ann_recall" ->
      s"""WITH $lshSigCtes,
         |m AS (${AnchorSample.modSql("n")}),
         |anch AS (SELECT n.* FROM n, m WHERE ${AnchorSample.predSql("vec_id")}),
         |truth AS (
         |  SELECT DISTINCT least(x.vec_id, y.vec_id) AS i,
         |    greatest(x.vec_id, y.vec_id) AS j,
         |    ${dSql("x.embedding", "y.embedding")} / (x.nrm * y.nrm) >= $ANN_T AS is_dup
         |  FROM anch x JOIN n y ON x.vec_id <> y.vec_id
         |  WHERE ${dSql("x.embedding", "y.embedding")} / (x.nrm * y.nrm) >= $COS_T),
         |tc AS (SELECT count(*) AS n_true,
         |  CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_true_dup
         |  FROM truth),
         |lsh_cand AS (
         |  SELECT DISTINCT x.vec_id AS i, y.vec_id AS j
         |  FROM sigs x JOIN sigs y ON x.bucket = y.bucket AND x.vec_id < y.vec_id),
         |probes AS (
         |  SELECT vec_id,
         |    CASE WHEN f = 0 THEN bucket
         |         ELSE substr(bucket, 1, f - 1)
         |           || (CASE WHEN substr(bucket, f, 1) = '0' THEN '1' ELSE '0' END)
         |           || substr(bucket, f + 1, $NPLANES)
         |    END AS probe
         |  FROM sigs, (SELECT unnest(range(0, ${NPLANES + 1})) AS f)),
         |mp_cand AS (
         |  SELECT DISTINCT p.vec_id AS i, s.vec_id AS j
         |  FROM probes p JOIN sigs s ON p.probe = s.bucket AND p.vec_id < s.vec_id),
         |${coarseAssignCtes("n", "c")},
         |ivf_cand AS (
         |  SELECT DISTINCT x.vec_id AS i, y.vec_id AS j
         |  FROM crk x JOIN crk y ON x.ck = y.ck AND x.vec_id < y.vec_id),
         |${imiAssignCtes("n", "m")},
         |imi_probes AS (
         |  SELECT vec_id, cell AS pc FROM massign
         |  UNION ALL
         |  SELECT vec_id, pc FROM mprobes WHERE mgn <= $PROBE_MARGIN_T),
         |imi_cand AS (
         |  SELECT DISTINCT least(p.vec_id, t.vec_id) AS i,
         |    greatest(p.vec_id, t.vec_id) AS j
         |  FROM imi_probes p JOIN massign t ON p.pc = t.cell
         |  WHERE p.vec_id <> t.vec_id),
         |found(method, n_found, n_found_dup) AS (
         |  SELECT 'ivf',
         |    (SELECT count(*) FROM truth t JOIN ivf_cand c ON t.i = c.i AND t.j = c.j),
         |    (SELECT count(*) FROM truth t JOIN ivf_cand c ON t.i = c.i AND t.j = c.j
         |     WHERE t.is_dup)
         |  UNION ALL SELECT 'ivf_imi',
         |    (SELECT count(*) FROM truth t JOIN imi_cand c ON t.i = c.i AND t.j = c.j),
         |    (SELECT count(*) FROM truth t JOIN imi_cand c ON t.i = c.i AND t.j = c.j
         |     WHERE t.is_dup)
         |  UNION ALL SELECT 'lsh',
         |    (SELECT count(*) FROM truth t JOIN lsh_cand c ON t.i = c.i AND t.j = c.j),
         |    (SELECT count(*) FROM truth t JOIN lsh_cand c ON t.i = c.i AND t.j = c.j
         |     WHERE t.is_dup)
         |  UNION ALL SELECT 'lsh_multiprobe',
         |    (SELECT count(*) FROM truth t JOIN mp_cand c ON t.i = c.i AND t.j = c.j),
         |    (SELECT count(*) FROM truth t JOIN mp_cand c ON t.i = c.i AND t.j = c.j
         |     WHERE t.is_dup))
         |SELECT method, (SELECT n_true FROM tc) AS n_true, n_found,
         |  round(CAST(n_found AS DOUBLE) / (SELECT n_true FROM tc), 6) AS recall,
         |  (SELECT n_true_dup FROM tc) AS n_true_dup, n_found_dup,
         |  round(CAST(n_found_dup AS DOUBLE) / (SELECT n_true_dup FROM tc), 6)
         |    AS recall_dup,
         |  CAST(n_found_dup AS DOUBLE) / (SELECT n_true_dup FROM tc) >= $RECALL_DUP_T
         |    AS dup_ok
         |FROM found""".stripMargin,

    // the near-twin governance twin regenerates the SAME perturbed corpus
    // from the shared md5-parity derivation (double add at the identically
    // parsed delta literal, one REAL rounding), replays the coarse AND IMI
    // assignment chains over it, and counts truth ∩ candidates per cosine
    // band. Candidates here are the FULL i<j sets — anchored truth only
    // ever touches anchors, so the semi-join counts match the Spark side's
    // anchor-restricted candidates exactly (the [[anchorCandidates]]
    // equality [[QueryInvariantSpec]] pins).
    "ann_recall_neartwin" ->
      s"""WITH ntp AS (
         |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
         |    unnest(embedding) AS x
         |  FROM embeddings),
         |nta AS (
         |  SELECT sid AS vec_id,
         |    list(CAST(CAST(x AS DOUBLE) + $NT_DELTA_NEAR * s AS REAL) ORDER BY d)
         |      AS embedding
         |  FROM (SELECT vec_id + 200000 AS sid, d, x,
         |      (${graft.functions.Keys.md5Key64Sql(
                  "concat('nta:', CAST(vec_id + 200000 AS VARCHAR), ':', CAST(d AS VARCHAR))")}
         |        % 2) * 2 - 1 AS s
         |    FROM ntp) t
         |  GROUP BY sid),
         |ntb AS (
         |  SELECT sid AS vec_id,
         |    list(CAST(CAST(x AS DOUBLE) + $NT_DELTA_DUP * s AS REAL) ORDER BY d)
         |      AS embedding
         |  FROM (SELECT vec_id + 300000 AS sid, d, x,
         |      (${graft.functions.Keys.md5Key64Sql(
                  "concat('ntb:', CAST(vec_id + 300000 AS VARCHAR), ':', CAST(d AS VARCHAR))")}
         |        % 2) * 2 - 1 AS s
         |    FROM ntp) t
         |  GROUP BY sid),
         |ntaug AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings
         |  UNION ALL SELECT vec_id, embedding FROM nta
         |  UNION ALL SELECT vec_id, embedding FROM ntb),
         |nu AS (
         |  SELECT vec_id, embedding,
         |    sqrt(${dSql("embedding", "embedding")}) AS nrm
         |  FROM ntaug),
         |m0 AS (${AnchorSample.modSql("nu")}),
         |truth AS (
         |  SELECT DISTINCT least(x.vec_id, y.vec_id) AS i,
         |    greatest(x.vec_id, y.vec_id) AS j,
         |    CASE WHEN ${dSql("x.embedding", "y.embedding")} / (x.nrm * y.nrm)
         |           >= $ANN_T THEN 'a_dup'
         |         WHEN ${dSql("x.embedding", "y.embedding")} / (x.nrm * y.nrm)
         |           >= $NT_BAND_LO THEN 'b_neartwin'
         |         ELSE 'c_tail' END AS band
         |  FROM nu x, nu y, m0
         |  WHERE ${AnchorSample.predSql("x.vec_id")} AND x.vec_id <> y.vec_id
         |    AND ${dSql("x.embedding", "y.embedding")} / (x.nrm * y.nrm) >= $COS_T),
         |${coarseAssignCtes("nu", "c")},
         |ivf_cand AS (
         |  SELECT DISTINCT x.vec_id AS i, y.vec_id AS j
         |  FROM crk x JOIN crk y ON x.ck = y.ck AND x.vec_id < y.vec_id),
         |${imiAssignCtes("nu", "m")},
         |imi_probes AS (
         |  SELECT vec_id, cell AS pc FROM massign
         |  UNION ALL
         |  SELECT vec_id, pc FROM mprobes WHERE mgn <= $PROBE_MARGIN_T),
         |imi_cand AS (
         |  SELECT DISTINCT least(p.vec_id, t.vec_id) AS i,
         |    greatest(p.vec_id, t.vec_id) AS j
         |  FROM imi_probes p JOIN massign t ON p.pc = t.cell
         |  WHERE p.vec_id <> t.vec_id),
         |rows0 AS (
         |  SELECT 'ivf' AS method, t.band, count(*) AS n_true,
         |    CAST(sum(CASE WHEN c.i IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_found
         |  FROM truth t LEFT JOIN ivf_cand c ON t.i = c.i AND t.j = c.j
         |  GROUP BY t.band
         |  UNION ALL
         |  SELECT 'ivf_imi' AS method, t.band, count(*) AS n_true,
         |    CAST(sum(CASE WHEN c.i IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_found
         |  FROM truth t LEFT JOIN imi_cand c ON t.i = c.i AND t.j = c.j
         |  GROUP BY t.band)
         |SELECT method, band, n_true, n_found,
         |  round(CAST(n_found AS DOUBLE) / n_true, 6) AS recall,
         |  CASE WHEN band = 'a_dup'
         |         THEN CAST(n_found AS DOUBLE) / n_true >= $RECALL_DUP_T
         |       ELSE TRUE END AS band_ok
         |FROM rows0""".stripMargin,

    // the coarse-quantizer twin: seeds-as-codebook fine centroids, first
    // ⌈√k⌉ vectors as coarse centroids, fine→coarse grouping by the same
    // (cos DESC, id ASC) argmax, vectors restricted to NON-EMPTY coarse
    // groups, then the within-group fine argmax — the exact replica of
    // [[coarseAssignments]] — and the flat path's cell-cap key and
    // 0.999-pair verification
    "sim_ann_ivf_coarse" ->
      s"""WITH $coarseCellCtes
         |SELECT x.vec_id AS i, y.vec_id AS j,
         |  round(${dSql("x.embedding", "y.embedding")} / (x.nrm * y.nrm), 6) AS cosine
         |FROM e x JOIN e y ON x.ck = y.ck AND x.vec_id < y.vec_id
         |WHERE ${dSql("x.embedding", "y.embedding")} / (x.nrm * y.nrm) >= $ANN_T""".stripMargin,

    // the three-level (IMI) twin: exact replica of [[imiAssignments]] —
    // integer-snapped ⌈k^(1/3)⌉, three hash-ranked codebooks, the
    // level-2→level-1 grouping, the fine descent, the bottom-up non-empty
    // guards, the three-step vector descent — then (round 10) the
    // nprobe=2 search: probes = home cell ∪ second-nearest cell,
    // candidates normalized to i < j, exact-cosine verification — the
    // same probe shape as the coarse chain's `sim_ann_ivf_probe` twin
    "sim_ann_ivf_imi" ->
      s"""WITH $imiCellCtes,
         |probes AS (
         |  SELECT vec_id, cell AS pc FROM massign
         |  UNION ALL
         |  SELECT vec_id, pc FROM mprobes WHERE mgn <= $PROBE_MARGIN_T),
         |cand AS (
         |  SELECT DISTINCT least(p.vec_id, t.vec_id) AS i,
         |    greatest(p.vec_id, t.vec_id) AS j
         |  FROM probes p JOIN massign t ON p.pc = t.cell
         |  WHERE p.vec_id <> t.vec_id)
         |SELECT c.i, c.j,
         |  round(${dSql("x.embedding", "y.embedding")} / (x.nrm * y.nrm), 6) AS cosine
         |FROM cand c
         |JOIN a x ON x.vec_id = c.i
         |JOIN a y ON y.vec_id = c.j
         |WHERE ${dSql("x.embedding", "y.embedding")} / (x.nrm * y.nrm) >= $ANN_T""".stripMargin,

    // the fusion twin composes the two arm chains — the shared BM25 CTE
    // ladder at depth FUSE_N and the shared coarse-assignment chain — then
    // replays the 1/(k+rank) sums and the (rrf DESC, doc_id ASC) top-10
    "fusion_rrf" ->
      s"""WITH ${graft.queries.Curation.bm25RankSql(FUSE_N)},
         |$coarseCellCtes,
         |nb AS (
         |  SELECT vec_id, embedding,
         |    sqrt(${dSql("embedding", "embedding")}) AS nrm
         |  FROM embeddings),
         |qd AS (SELECT min(doc_id) AS qid FROM documents),
         |qv AS (
         |  SELECT nb.vec_id AS qid, nb.embedding AS qe, nb.nrm AS qn
         |  FROM nb, qd WHERE nb.vec_id = qd.qid),
         |qk AS (SELECT rk.ck FROM rk, qd WHERE rk.vec_id = qd.qid),
         |sems AS (
         |  SELECT nb.vec_id,
         |    ${dSql("nb.embedding", "qv.qe")} / (nb.nrm * qv.qn) AS cos
         |  FROM rk JOIN qk ON rk.ck = qk.ck
         |  JOIN nb ON nb.vec_id = rk.vec_id, qv
         |  WHERE nb.vec_id <> qv.qid),
         |semr AS (
         |  SELECT vec_id AS doc_id, CAST(rn AS INTEGER) AS sem_rank
         |  FROM (SELECT vec_id, row_number() OVER (
         |      ORDER BY cos DESC, vec_id ASC) AS rn FROM sems)
         |  WHERE rn <= $FUSE_N),
         |fused AS (
         |  SELECT coalesce(l.doc_id, r.doc_id) AS doc_id,
         |    l.lex_rank, r.sem_rank,
         |    coalesce(CAST(1.0 AS DOUBLE) / ($RRF_K + l.lex_rank), 0.0)
         |      + coalesce(CAST(1.0 AS DOUBLE) / ($RRF_K + r.sem_rank), 0.0) AS rrf
         |  FROM lexr l FULL OUTER JOIN semr r ON l.doc_id = r.doc_id)
         |SELECT doc_id, CAST(rn AS INTEGER) AS rank, round(rrf, 6) AS rrf,
         |  coalesce(lex_rank, 0) AS lex_rank,
         |  coalesce(sem_rank, 0) AS sem_rank
         |FROM (SELECT *, row_number() OVER (
         |    ORDER BY rrf DESC, doc_id ASC) AS rn FROM fused)
         |WHERE rn <= 10""".stripMargin
  )

  def oracleSql: Map[String, String] = Map(
    "emb_norms" ->
      s"""SELECT vec_id, label,
         |  round(sqrt(${dSql("embedding", "embedding")}), 6) AS l2_norm,
         |  CAST(len(embedding) AS INTEGER) AS dim
         |FROM embeddings""".stripMargin,

    "emb_quantize_sq" ->
      """WITH m AS (
        |  SELECT vec_id, embedding,
        |    127.0 / list_aggregate(
        |      list_transform(embedding, x -> abs(CAST(x AS DOUBLE))), 'max') AS scale
        |  FROM embeddings)
        |SELECT vec_id, round(scale, 6) AS scale,
        |  round(list_sum(list_transform(embedding,
        |    x -> (CAST(x AS DOUBLE) - floor(CAST(x AS DOUBLE) * scale + 0.5) / scale)
        |       * (CAST(x AS DOUBLE) - floor(CAST(x AS DOUBLE) * scale + 0.5) / scale)))
        |    / len(embedding), 6) AS mse
        |FROM m""".stripMargin,

    "sim_topk_bruteforce" ->
      s"""WITH n AS (
         |  SELECT vec_id, embedding,
         |    sqrt(${dSql("embedding", "embedding")}) AS nrm
         |  FROM embeddings),
         |m AS (${AnchorSample.modSql("n")}),
         |anch AS (SELECT n.* FROM n, m WHERE ${AnchorSample.predSql("vec_id")}),
         |pairs AS (
         |  SELECT a.vec_id, b.vec_id AS neighbor_id,
         |    ${dSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cos
         |  FROM anch a JOIN n b ON a.vec_id <> b.vec_id),
         |ranked AS (
         |  SELECT vec_id, neighbor_id, cos, row_number() OVER (
         |    PARTITION BY vec_id ORDER BY cos DESC, neighbor_id ASC) AS rn
         |  FROM pairs)
         |SELECT vec_id, CAST(rn AS INTEGER) AS rank, neighbor_id,
         |  round(cos, 6) AS cosine
         |FROM ranked WHERE rn <= $TOPK""".stripMargin,

    "dedup_embedding_cosine" ->
      s"""WITH n AS (
         |  SELECT vec_id, embedding,
         |    sqrt(${dSql("embedding", "embedding")}) AS nrm
         |  FROM embeddings),
         |m AS (${AnchorSample.modSql("n")}),
         |anch AS (SELECT n.* FROM n, m WHERE ${AnchorSample.predSql("vec_id")})
         |SELECT DISTINCT least(a.vec_id, b.vec_id) AS i,
         |  greatest(a.vec_id, b.vec_id) AS j,
         |  round(${dSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6) AS cosine
         |FROM anch a JOIN n b ON a.vec_id <> b.vec_id
         |WHERE ${dSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= $COS_T""".stripMargin,

    "sim_ann_lsh" ->
      s"""WITH $lshSigCtes
         |SELECT a.vec_id AS i, b.vec_id AS j,
         |  round(${dSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6) AS cosine
         |FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |WHERE ${dSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= $ANN_T""".stripMargin,

    "sim_ann_incremental" -> {
      val incAug =
        """
          |  SELECT vec_id, embedding FROM embeddings
          |  UNION ALL
          |  SELECT vec_id + 200000 AS vec_id, embedding FROM embeddings
          |  WHERE vec_id % 4 = 0""".stripMargin
      s"""WITH ${sigChain(incAug)}
         |SELECT a.vec_id AS query_id, b.vec_id AS match_id,
         |  round(${dSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6) AS cosine
         |FROM n a JOIN n b ON a.bucket = b.bucket
         |  AND a.vec_id >= 200000 AND b.vec_id < 200000
         |WHERE ${dSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= $ANN_T""".stripMargin
    },

    "sim_ann_lsh_multiprobe" ->
      s"""WITH $lshSigCtes,
         |probes AS (
         |  SELECT vec_id,
         |    CASE WHEN f = 0 THEN bucket
         |         ELSE substr(bucket, 1, f - 1)
         |           || (CASE WHEN substr(bucket, f, 1) = '0' THEN '1' ELSE '0' END)
         |           || substr(bucket, f + 1, $NPLANES)
         |    END AS probe
         |  FROM sigs, (SELECT unnest(range(0, ${NPLANES + 1})) AS f)),
         |cand AS (
         |  SELECT DISTINCT p.vec_id AS i, s.vec_id AS j
         |  FROM probes p JOIN sigs s ON p.probe = s.bucket AND p.vec_id < s.vec_id)
         |SELECT a.vec_id AS i, b.vec_id AS j,
         |  round(${dSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6) AS cosine
         |FROM cand
         |JOIN n a ON cand.i = a.vec_id
         |JOIN n b ON cand.j = b.vec_id
         |WHERE ${dSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= $ANN_T""".stripMargin
  )

  /** Shared CTE chain for the LSH oracles, parameterized by the vector-set
    * CTE body: aug → planes → component projections → bit-string
    * signatures → normed vectors.
    */
  /** DuckDB twin of [[coarseAssignments]] as a reusable CTE chain: seeds
    * codebook fine centroids, first ⌈√k⌉ vectors as coarse centroids,
    * fine→coarse grouping by the (cos DESC, id ASC) argmax, vectors
    * restricted to NON-EMPTY coarse groups, then the within-group fine
    * argmax and the flat path's cell-cap key. `univ` must expose
    * (vec_id, embedding, nrm); every emitted CTE name carries `p` so two
    * chains (or a chain plus the flat one) can coexist in one oracle.
    * Terminal CTE: `${p}rk` = (vec_id, ck).
    */
  private def coarseAssignCtes(univ: String, p: String): String =
    s"""${p}nk AS (
       |  SELECT greatest($MIN_CENTROIDS,
       |    CAST(ceil(count(*) / $TARGET_CELL) AS BIGINT)) AS k FROM $univ),
       |${p}ks AS (
       |  SELECT CAST(ceil(sqrt(CAST(k AS DOUBLE))) AS BIGINT) AS k FROM ${p}nk),
       |${hashSeedsSql(s"${p}fine", s"${p}nk", "ivfseed")},
       |${hashSeedsSql(s"${p}coarse0", s"${p}ks", "ivfgrp")},
       |${p}coarse AS (
       |  SELECT cid AS gid, ce AS ge, nc AS ng FROM ${p}coarse0),
       |${p}fgrp AS (
       |  SELECT gid, cid, ce, nc FROM (
       |    SELECT c.gid, f.cid, f.ce, f.nc, row_number() OVER (
       |      PARTITION BY f.cid
       |      ORDER BY ${dSql("f.ce", "c.ge")} / (f.nc * c.ng) DESC,
       |        c.gid ASC) AS rn
       |    FROM ${p}fine f CROSS JOIN ${p}coarse c)
       |  WHERE rn = 1),
       |${p}vg AS (
       |  SELECT vec_id, gid FROM (
       |    SELECT a.vec_id, c.gid, row_number() OVER (
       |      PARTITION BY a.vec_id
       |      ORDER BY ${dSql("a.embedding", "c.ge")} / (a.nrm * c.ng) DESC,
       |        c.gid ASC) AS rn
       |    FROM $univ a CROSS JOIN ${p}coarse c
       |    WHERE c.gid IN (SELECT DISTINCT gid FROM ${p}fgrp))
       |  WHERE rn = 1),
       |${p}assign AS (
       |  SELECT vec_id,
       |    max(CASE WHEN rn = 1 THEN cid END) AS cell,
       |    max(CASE WHEN rn = 2 THEN cid END) AS cell2,
       |    max(CASE WHEN rn = 1 THEN cs END)
       |      - max(CASE WHEN rn = 2 THEN cs END) AS mgn
       |  FROM (
       |    SELECT v.vec_id, f.cid,
       |      ${dSql("ax.embedding", "f.ce")} / (ax.nrm * f.nc) AS cs,
       |      row_number() OVER (
       |      PARTITION BY v.vec_id
       |      ORDER BY ${dSql("ax.embedding", "f.ce")} / (ax.nrm * f.nc) DESC,
       |        f.cid ASC) AS rn
       |    FROM ${p}vg v JOIN $univ ax ON ax.vec_id = v.vec_id
       |    JOIN ${p}fgrp f ON f.gid = v.gid)
       |  WHERE rn <= 2 GROUP BY vec_id),
       |${p}cellsz AS (SELECT cell, count(*) AS cn FROM ${p}assign GROUP BY cell),
       |${p}rk AS (
       |  SELECT a.vec_id,
       |    CASE WHEN z.cn > $CELL_CAP THEN
       |      CAST(a.cell AS VARCHAR) || ':' ||
       |        CAST(coalesce(a.cell2, a.cell) AS VARCHAR)
       |    ELSE CAST(a.cell AS VARCHAR) END AS ck
       |  FROM ${p}assign a JOIN ${p}cellsz z ON z.cell = a.cell)""".stripMargin

  /** The full coarse-assignment oracle prelude over the AUGMENTED corpus:
    * aug → normed universe `a` → [[coarseAssignCtes]] (terminal `rk`) →
    * `e` = (vec_id, embedding, nrm, ck). Round 9: this is the shared twin
    * of [[sharedCoarseAssign]] + the refined cell key, reused by every
    * production IVF oracle (`sim_ann_ivf_coarse`, `sim_ann_ivf_probe`,
    * `sim_ann_quantized_rescore`, `sim_ann_ivf_pq`, `dedup_semantic`) the
    * same way the Spark side shares one cached assignment.
    */
  private lazy val coarseCellCtes: String =
    s"""aug AS (
       |  SELECT vec_id, embedding FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings),
       |a AS (
       |  SELECT vec_id, embedding,
       |    sqrt(${dSql("embedding", "embedding")}) AS nrm
       |  FROM aug),
       |${coarseAssignCtes("a", "")},
       |e AS (
       |  SELECT a.vec_id, a.embedding, a.nrm, rk.ck
       |  FROM a JOIN rk ON a.vec_id = rk.vec_id)""".stripMargin

  /** DuckDB twin of [[imiAssignments]] as a reusable CTE chain — the
    * three-level descent replica: integer-exact ⌈k^(1/3)⌉ (the same
    * cube-snapped correction as [[cbrtCeil]], since C pow and Math.pow
    * may disagree by an ulp), three hash-ranked codebooks, level-2→level-1
    * grouping, fine→level-2 via the descent, bottom-up non-empty guards,
    * the three-step vector descent, and the shared cell-cap key.
    * Terminal CTE: `${p}rk` = (vec_id, ck).
    */
  private def imiAssignCtes(univ: String, p: String): String =
    s"""${p}nk AS (
       |  SELECT greatest($MIN_CENTROIDS,
       |    CAST(ceil(count(*) / $TARGET_CELL) AS BIGINT)) AS k FROM $univ),
       |${p}pq AS (
       |  SELECT least($PROBE_CAP, greatest(2,
       |    CASE WHEN (c-1)*(c-1)*(c-1)*(c-1) >= k THEN c-1
       |         WHEN c*c*c*c >= k THEN c ELSE c+1 END)) AS p
       |  FROM (SELECT k, CAST(round(pow(CAST(k AS DOUBLE), 0.25)) AS BIGINT) AS c
       |        FROM ${p}nk)),
       |${p}bw AS (
       |  SELECT least($L1_BEAM_CAP,
       |    CAST(ceil(sqrt(CAST(p AS DOUBLE))) AS BIGINT)) AS b1 FROM ${p}pq),
       |${p}k1 AS (
       |  SELECT CASE WHEN (c-1)*(c-1)*(c-1) >= k THEN c-1
       |              WHEN c*c*c >= k THEN c ELSE c+1 END AS k
       |  FROM (SELECT k, CAST(round(pow(CAST(k AS DOUBLE), 1.0/3.0)) AS BIGINT) AS c
       |        FROM ${p}nk)),
       |${p}k2 AS (SELECT k * k AS k FROM ${p}k1),
       |${hashSeedsSql(s"${p}fine", s"${p}nk", "ivfseed")},
       |${hashSeedsSql(s"${p}l1s", s"${p}k1", "ivfl1")},
       |${hashSeedsSql(s"${p}l2s", s"${p}k2", "ivfl2")},
       |${p}l1 AS (SELECT cid AS g1, ce AS e1, nc AS n1 FROM ${p}l1s),
       |${p}l2 AS (SELECT cid AS g2, ce AS e2, nc AS n2 FROM ${p}l2s),
       |${p}l2g AS (
       |  SELECT g1, g2, e2, n2 FROM (
       |    SELECT a.g1, b.g2, b.e2, b.n2, row_number() OVER (
       |      PARTITION BY b.g2
       |      ORDER BY ${dSql("b.e2", "a.e1")} / (b.n2 * a.n1) DESC, a.g1 ASC) AS rn
       |    FROM ${p}l2 b CROSS JOIN ${p}l1 a)
       |  WHERE rn = 1),
       |${p}fp1 AS (
       |  SELECT cid, g1 FROM (
       |    SELECT f.cid, a.g1, row_number() OVER (
       |      PARTITION BY f.cid
       |      ORDER BY ${dSql("f.ce", "a.e1")} / (f.nc * a.n1) DESC, a.g1 ASC) AS rn
       |    FROM ${p}fine f CROSS JOIN ${p}l1 a
       |    WHERE a.g1 IN (SELECT DISTINCT g1 FROM ${p}l2g))
       |  WHERE rn = 1),
       |${p}fgrp AS (
       |  SELECT g2, cid, ce, nc FROM (
       |    SELECT b.g2, f.cid, f.ce, f.nc, row_number() OVER (
       |      PARTITION BY f.cid
       |      ORDER BY ${dSql("f.ce", "b.e2")} / (f.nc * b.n2) DESC, b.g2 ASC) AS rn
       |    FROM ${p}fine f JOIN ${p}fp1 p1 ON p1.cid = f.cid
       |    JOIN ${p}l2g b ON b.g1 = p1.g1)
       |  WHERE rn = 1),
       |${p}l2ne AS (
       |  SELECT g1, g2, e2, n2 FROM ${p}l2g
       |  WHERE g2 IN (SELECT DISTINCT g2 FROM ${p}fgrp)),
       |${p}l1ne AS (
       |  SELECT g1, e1, n1 FROM ${p}l1
       |  WHERE g1 IN (SELECT DISTINCT g1 FROM ${p}l2ne)),
       |${p}v1 AS (
       |  SELECT vec_id, g1 FROM (
       |    SELECT a.vec_id, c.g1, row_number() OVER (
       |      PARTITION BY a.vec_id
       |      ORDER BY ${dSql("a.embedding", "c.e1")} / (a.nrm * c.n1) DESC,
       |        c.g1 ASC) AS rn
       |    FROM $univ a CROSS JOIN ${p}l1ne c)
       |  WHERE rn <= (SELECT b1 FROM ${p}bw)),
       |${p}v2 AS (
       |  SELECT vec_id, g2 FROM (
       |    SELECT v.vec_id, b.g2, row_number() OVER (
       |      PARTITION BY v.vec_id
       |      ORDER BY ${dSql("ax.embedding", "b.e2")} / (ax.nrm * b.n2) DESC,
       |        b.g2 ASC) AS rn
       |    FROM ${p}v1 v JOIN $univ ax ON ax.vec_id = v.vec_id
       |    JOIN ${p}l2ne b ON b.g1 = v.g1)
       |  WHERE rn <= (SELECT p FROM ${p}pq)),
       |${p}fw AS (
       |  SELECT vec_id, g2, cid, cs FROM (
       |    SELECT v.vec_id, v.g2, f.cid,
       |      ${dSql("ax.embedding", "f.ce")} / (ax.nrm * f.nc) AS cs,
       |      row_number() OVER (
       |        PARTITION BY v.vec_id, v.g2
       |        ORDER BY ${dSql("ax.embedding", "f.ce")} / (ax.nrm * f.nc) DESC,
       |          f.cid ASC) AS rn
       |    FROM ${p}v2 v JOIN $univ ax ON ax.vec_id = v.vec_id
       |    JOIN ${p}fgrp f ON f.g2 = v.g2)
       |  WHERE rn = 1),
       |${p}rw AS (
       |  SELECT vec_id, cid, cs,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid ASC) AS rn,
       |    max(cs) OVER (PARTITION BY vec_id) AS s1
       |  FROM ${p}fw),
       |${p}probes AS (
       |  SELECT vec_id, cid AS pc, s1 - cs AS mgn FROM ${p}rw
       |  WHERE rn >= 2 AND rn <= (SELECT p FROM ${p}pq)),
       |${p}assign AS (
       |  SELECT vec_id,
       |    max(CASE WHEN rn = 1 THEN cid END) AS cell,
       |    max(CASE WHEN rn = 2 THEN cid END) AS cell2,
       |    max(CASE WHEN rn = 1 THEN cs END)
       |      - max(CASE WHEN rn = 2 THEN cs END) AS mgn
       |  FROM ${p}rw
       |  WHERE rn <= 2 GROUP BY vec_id),
       |${p}cellsz AS (SELECT cell, count(*) AS cn FROM ${p}assign GROUP BY cell),
       |${p}rk AS (
       |  SELECT a.vec_id,
       |    CASE WHEN z.cn > $CELL_CAP THEN
       |      CAST(a.cell AS VARCHAR) || ':' ||
       |        CAST(coalesce(a.cell2, a.cell) AS VARCHAR)
       |    ELSE CAST(a.cell AS VARCHAR) END AS ck
       |  FROM ${p}assign a JOIN ${p}cellsz z ON z.cell = a.cell)""".stripMargin

  /** The full IMI-assignment oracle prelude over the AUGMENTED corpus
    * (prefix `m` so it can coexist with the coarse chain in one oracle):
    * aug → normed universe → [[imiAssignCtes]] → `me` = (vec_id,
    * embedding, nrm, ck) — the twin of [[sharedImiAssign]].
    */
  private lazy val imiCellCtes: String =
    s"""aug AS (
       |  SELECT vec_id, embedding FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings),
       |a AS (
       |  SELECT vec_id, embedding,
       |    sqrt(${dSql("embedding", "embedding")}) AS nrm
       |  FROM aug),
       |${imiAssignCtes("a", "m")},
       |me AS (
       |  SELECT a.vec_id, a.embedding, a.nrm, mrk.ck
       |  FROM a JOIN mrk ON a.vec_id = mrk.vec_id)""".stripMargin

  private def sigChain(augBody: String): String =
    s"""aug AS ($augBody),
       |planes AS (
       |  SELECT p, d,
       |    CAST((CAST(concat('0x', substr(md5(concat(p, ':', d)), 1, 15)) AS BIGINT) % 2) * 2 - 1 AS DOUBLE) AS w
       |  FROM (SELECT unnest(range(0, $NPLANES)) AS p), (SELECT unnest(range(0, 64)) AS d)),
       |comps AS (
       |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
       |    unnest(embedding) AS x
       |  FROM aug),
       |projs AS (
       |  SELECT vec_id, p, sum(CAST(x AS DOUBLE) * w) AS proj
       |  FROM comps JOIN planes USING (d) GROUP BY vec_id, p),
       |sigs AS (
       |  SELECT vec_id,
       |    string_agg(CASE WHEN proj > 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS bucket
       |  FROM projs GROUP BY vec_id),
       |n AS (
       |  SELECT e.vec_id, e.embedding, s.bucket,
       |    sqrt(${dSql("e.embedding", "e.embedding")}) AS nrm
       |  FROM aug e JOIN sigs s ON e.vec_id = s.vec_id)""".stripMargin

  private lazy val lshSigCtes: String = sigChain(
    """
      |  SELECT vec_id, embedding FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings""".stripMargin)
}
