package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan quality gate: the properties that make these operators
  * viable at 100 TB are asserted on the actual plans, so a regression in
  * plan shape (lost pushdown, broadcast degraded to shuffle, partial
  * aggregation gone) fails the build — not just a perf dashboard.
  */
class PlanSpec extends AnyFunSuite with SparkSessionFixture {

  private val sfDir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    Registry.all(name)(spark, sfDir).queryExecution.executedPlan.toString()

  test("scan_filter_pushdown: predicate reaches the parquet scan") {
    val p = plan("scan_filter_pushdown")
    assert(p.contains("PushedFilters:"), p)
    assert(p.contains("GreaterThanOrEqual(l_shipdate") || p.contains("GreaterThanOrEqual(`l_shipdate`"), p)
  }

  test("scan_project: column pruning reaches the reader") {
    val p = plan("scan_project")
    assert(p.contains("ReadSchema"), p)
    // Only the 4 projected columns are read, not all 11.
    assert(!p.contains("l_extendedprice"), p)
    assert(!p.contains("l_shipdate"), p)
  }

  test("join_broadcast: dimension side is broadcast") {
    assert(plan("join_broadcast").contains("BroadcastHashJoin"))
  }

  test("join_multiway: star-join dims broadcast, no nested loop") {
    val p = plan("join_multiway")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("join_theta: equi conjunct keeps the join hash/merge-based") {
    val p = plan("join_theta")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("subq_in: IN-subquery plans as a semi join") {
    val p = plan("subq_in")
    assert(p.contains("LeftSemi"), p)
  }

  test("agg_hash_q1: partial+final hash aggregation (map-side combine)") {
    val p = plan("agg_hash_q1")
    assert(p.contains("partial_"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("topk_global: TakeOrderedAndProject, no global sort") {
    val p = plan("topk_global")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("topk_per_group: the rank filter compiles to WindowGroupLimit") {
    // Spark 4's group-limit physical optimization: each partition keeps a
    // bounded top-k heap per group BEFORE the window, so the shuffle and
    // the WindowExec see k rows per (partition, group) instead of every
    // input row — the plan property that makes rank-filter top-k viable
    // at fact-table scale.
    val p = plan("topk_per_group")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("scan_file_metadata: the provenance columns are reader-synthesized") {
    val p = plan("scan_file_metadata")
    // no UDF / input_file_name fallback anywhere in the plan
    assert(!p.toLowerCase.contains("input_file_name"), p)
    assert(p.contains("_metadata") || p.contains("file_name"), p)
  }

  test("whole-stage codegen covers the hot paths") {
    // AQE only materializes the final (codegen'd) plan after execution.
    Seq("agg_hash_q1", "project_compute", "fn_math").foreach { q =>
      val df = Registry.all(q)(spark, sfDir)
      df.collect() // executes this exact plan → AQE finalizes it
      val p = df.queryExecution.executedPlan.toString()
      // "*(n)" prefixes mark WholeStageCodegen stages in plan toString.
      assert(p.contains("*("), s"$q lost codegen:\n$p")
    }
  }

  test("sim_cosine_topk: probe side broadcast, native dot product") {
    val p = plan("sim_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin"), p) // probe × corpus is the intended shape
    assert(p.contains("graft_dot"), p)
  }

  test("sim_cosine_threshold: blocked exact pair join is an equi-join") {
    val p = plan("sim_cosine_threshold")
    // The all-pairs semantics must NOT plan as corpus×corpus NLJ: block
    // replication turns it into a shuffled equi-join on (bi, bj).
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("graft_dot"), p)
  }

  test("dedup_minhash_lsh: candidate join is an equi-join on band keys") {
    val p = plan("dedup_minhash_lsh")
    assert(p.contains("band_hash"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("dedup_simhash_banded: unbounded path is an equi-join on band bits") {
    val p = plan("dedup_simhash_banded")
    assert(p.contains("band_bits"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("sketch signatures are map-side: no aggregate, no exchange, codegen'd") {
    // graft_simhash / graft_minhash compute per-document signatures in the
    // scan's own stage — a HashAggregate or Exchange here means the
    // explode+groupBy shape crept back and signatures shuffle again.
    val sim = ops.Dedup.simhashSignatures(Tables(spark, sfDir).documents)
      .queryExecution.executedPlan.toString()
    assert(sim.contains("graft_simhash"), sim)
    assert(!sim.contains("Exchange") && !sim.contains("HashAggregate"), sim)
    val mh = ops.Dedup.minhashSignatures(Tables(spark, sfDir).documents)
      .queryExecution.executedPlan.toString()
    assert(mh.contains("graft_minhash"), mh)
    assert(!mh.contains("Exchange") && !mh.contains("HashAggregate"), mh)
  }

  test("runtime bloom filter prunes the fact scan behind a selective dim join") {
    // At 100 TB the shuffle of fact rows that will never match is the cost
    // center; Spark's runtime bloom filter (built from the filtered dim,
    // pushed into the fact scan) is the mitigation. Size thresholds are
    // tuned for production data — lower them to exercise the mechanism on
    // test-scale inputs and assert the filter is actually injected.
    import org.apache.spark.sql.functions._
    val t = Tables(spark, sfDir)
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // force the shuffle-join shape the filter exists for (at scale the
      // fact side is never broadcastable anyway)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val dim = t.orders.filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val joined = t.lineitem.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag").agg(sum("l_quantity").as("q"))
      val p = joined.queryExecution.executedPlan.toString()
      assert(p.toLowerCase.contains("bloomfilter"),
        s"expected an injected runtime bloom filter in:\n$p")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("round-5 corpus ops: gram joins stay equi, candidate sets broadcast, no cartesian") {
    // decontaminate: the train⋈eval candidate join must be gram-keyed
    // (equi), never a nested loop — at 100 TB a cartesian here is the
    // difference between a join and a catastrophe
    val d = plan("decontaminate")
    assert(!d.contains("CartesianProduct") && !d.contains("BroadcastNestedLoopJoin"), d)
    // heavy_hitters: the recount join probes the tiny candidate set — it
    // must be a broadcast, keeping pass 2 shuffle-free on the corpus side
    val h = plan("heavy_hitters")
    assert(h.contains("BroadcastHashJoin"), h)
    assert(!h.contains("CartesianProduct"), h)
    // dedup_semantic: the cosine edge source is the BLOCKED equi-join —
    // no nested loop anywhere (unlike the bounded-probe jaccard edges)
    val s = plan("dedup_semantic")
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"), s)
    // pagerank: the iteration joins are all keyed; the only nested loop
    // permitted is the bounded-probe (≤100 docs) jaccard edge builder
    val p = plan("graph_pagerank")
    assert(!p.contains("CartesianProduct"), p)
    val nlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    val probeNlj = "BroadcastNestedLoopJoin [^\n]*graft_jaccard".r.findAllIn(p).size
    assert(nlj === probeNlj, s"non-probe nested loop in pagerank:\n$p")
  }

  test("join_skew_salted: shuffle variant partitions on the composite (key, salt)") {
    val k = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.getOption(k)
    spark.conf.set(k, "-1")
    try {
      val p = Registry.all("join_skew_salted")(spark, sfDir)
        .queryExecution.executedPlan.toString()
      // no broadcast left; the exchange keys must include both user_id and
      // the salt so one hot user spreads across `salts` reducers
      assert(!p.contains("BroadcastHashJoin"), s"dim still broadcast:\n$p")
      assert("hashpartitioning\\(custkey#\\d+L?, __graft_salt_".r
        .findFirstIn(p).isDefined,
        s"expected hashpartitioning(custkey, __graft_salt_..., ...) in:\n$p")
    } finally prev match {
      case Some(v) => spark.conf.set(k, v)
      case None => spark.conf.unset(k)
    }
  }

  test("join_skew_salted rows equal the unsalted join; agg_corr tracks built-ins") {
    import org.apache.spark.sql.functions._
    val t = Tables(spark, sfDir)
    val unsalted = t.events
      .join(t.customer, col("user_id") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_ev"))
      .orderBy("c_mktsegment")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val salted = graft.ops.Skew.joinSkewSalted(t)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(salted === unsalted)

    // decimal-exact corr agrees with Spark's streaming corr to float noise
    val got = graft.ops.Aggregates.aggCorr(t)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val ref = t.lineitem.groupBy("l_returnflag")
      .agg(corr(col("l_quantity"), col("l_discount")).as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    got.foreach { case (g, v) =>
      assert(math.abs(v - ref(g)) < 1e-6, s"corr mismatch for $g: $v vs ${ref(g)}")
    }
  }

  test("tokenize_ids: map-side native encode, no join, no token shuffle") {
    val p = plan("tokenize_ids")
    // r16: one graft_word_ids kernel call per doc (vocab rides the plan
    // as a foldable literal) — no vocabulary join, and the only Exchange
    // is the final doc_id sort's range partitioning
    assert(p.contains("graft_word_ids"), p)
    assert(!p.contains("Join"), p)
    assert(!p.contains("hashpartitioning"), p)
  }

  test("quantized cosine gate: int8 dot in the pair stage, no NLJ, exact re-rank joins") {
    val p = plan("sim_cosine_threshold")
    assert(p.contains("graft_dot_i8"), p) // the gate actually runs
    assert(p.contains("graft_dot"), p) // survivors still get the exact dot
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("multimodal_frames / win_median / anomaly_mad: no nested loops anywhere") {
    for (q <- Seq("multimodal_frames", "win_median", "anomaly_mad", "graph_bfs")) {
      val p = plan(q)
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q: $p")
      assert(!p.contains("CartesianProduct"), s"$q: $p")
    }
  }

  test("profile_table: per-column aggregates, no Expand row replication") {
    // N exact countDistincts in one agg compile to a single Expand that
    // replicates every scanned row N+1 times into the shuffle — at 100 TB
    // that is a 5× scan-output amplification. The per-column unioned shape
    // must keep Expand out of the plan entirely, and each branch's scan
    // must prune to its own column.
    val p = plan("profile_table")
    assert(!p.contains("Expand"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p) // two-level, partial+final
  }

  test("chunking is generate-only before its aggregate; no joins anywhere") {
    // chunk_documents must be a pure map-side Generate over the scan (one
    // chunk row per window, tokens never shuffle); dedup_chunks adds ONLY
    // the hash-keyed aggregation on top.
    val pc = plan("chunk_documents")
    assert(pc.contains("Generate"), pc)
    assert(!pc.contains("Join") && !pc.contains("Exchange hashpartitioning"), pc)
    val pd = plan("dedup_chunks")
    assert(pd.contains("Generate"), pd)
    assert(!pd.contains("Join"), pd)
    // min(struct) forces sort-based aggregation; partial+final still holds
    assert(pd.contains("partial_"), pd)
    assert("(Hash|Sort)Aggregate".r.findAllIn(pd).size >= 2, pd)
  }

  test("hyperplane signatures plan as one native call, not a literal tree") {
    // graft_hplanes collapses bands×bits literal-array dot products into a
    // constant-size node: the ANN plans must contain the call and NOT the
    // 64-element array literals of the old Column build.
    // dedup_semantic_ann's final frame sits behind the CC lineage cut, so
    // assert on ann_cosine_topk (same expression, visible plan) and on the
    // candidate generator's own plan.
    val p = plan("ann_cosine_topk")
    assert(p.contains("graft_hplanes"), "ann_cosine_topk lost the native signature")
    // the only graft_dot calls left are the exact re-rank's (the old
    // build carried bands × bits of them, one per literal plane)
    assert("graft_dot".r.findAllIn(p).size <= 6,
      "ann_cosine_topk still computes signatures as per-plane dot products")
    val t = Tables(spark, sfDir)
    val cands = graft.ops.Ann.hyperplaneCandidates(
      graft.ops.Ann.vectorsWithNorm(t).select(
        org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("e")))
      .queryExecution.executedPlan.toString()
    assert(cands.contains("graft_hplanes"), "hyperplaneCandidates lost the native signature")
    assert(!cands.contains("graft_dot"), "candidate stage must carry no dot products at all")
  }

  test("merge_upsert/scd2: single key join, dims broadcast where legal") {
    val pu = plan("merge_upsert")
    // full outer can't broadcast — must be a shuffle hash/sort-merge join
    // (a cached InMemoryRelation may render the join twice under AQE, so
    // assert presence, not an exact count)
    assert("SortMergeJoin|ShuffledHashJoin".r.findAllIn(pu).nonEmpty, pu)
    assert(!pu.contains("CartesianProduct") && !pu.contains("BroadcastNestedLoopJoin"), pu)
    val ps = plan("merge_scd2")
    assert(!ps.contains("CartesianProduct") && !ps.contains("BroadcastNestedLoopJoin"), ps)
  }

  test("layout_partitioned: date predicate prunes partitions at the scan") {
    val p = plan("layout_partitioned")
    assert(p.contains("PartitionFilters"), p)
    // the pruned scan lists p_date bounds, not a post-scan Filter on p_date
    assert(p.contains("p_date"), p)
  }

  test("join_bucketed: the bucket layout pre-satisfies the join — no Exchange feeds it") {
    val p = plan("join_bucketed")
    assert(p.contains("SortMergeJoin"), p)
    assert(!p.contains("Exchange hashpartitioning(o_custkey") &&
      !p.contains("Exchange hashpartitioning(c_custkey"), p)
    assert(p.contains("SelectedBucketsCount") || p.contains("Bucketed: true"), p)
  }

  test("dedup_cdc: skew-safe shape — no per-hash occurrence arrays, shared grain subtree") {
    val p = plan("dedup_cdc")
    // the spread must NOT be computed by collecting per-hash occurrence
    // lists (a boilerplate chunk in millions of docs = one-key blowup)
    assert(!p.contains("collect_list"), p)
    // one chunk-expression pass: the distinct-doc spread is a window
    // over the (md5, doc) grain, not a second chunk-keyed consumer
    val gens = "graft_cdc_chunks".r.findAllIn(p).size
    assert(gens == 1, s"expected one chunking pass, got $gens:\n$p")
    assert("FileScan parquet".r.findAllIn(p).size == 1, p)
  }

  test("schema_enforce: one events scan; the only exchange is the unique_on check") {
    val p = plan("schema_enforce")
    val scans = "FileScan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected 1 events scan, got $scans:\n$p")
  }

  test("tokenize_unigram_ids: model rides the plan — no vocab-table join on the encode path") {
    val p = plan("tokenize_unigram_ids")
    assert(p.contains("graft_uniseg"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("incremental_dedup_bucketed: only the block's bands shuffle into the probe join") {
    val p = plan("incremental_dedup_bucketed")
    // The store side reads the bucketed layout (its distribution is
    // pre-satisfied); the ONLY band-key Exchange in the plan is the new
    // block's own bands — per-block data movement, never the corpus.
    assert(p.contains("SortMergeJoin"), p)
    assert(p.contains("SelectedBucketsCount") || p.contains("Bucketed: true"), p)
    val bandExchanges = "Exchange hashpartitioning\\(band_idx".r
      .findAllIn(p).size
    assert(bandExchanges == 1,
      s"expected exactly 1 band-key Exchange (the block side), got $bandExchanges:\n$p")
  }
}
