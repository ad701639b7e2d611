package graft.plans

import org.apache.spark.sql.execution.SimpleMode
import graft.{SparkSpec, SparkEntry}

/** Executable plan contracts: the "must hold" properties PLANS.md states
  * for the headline queries, asserted against the actual physical plans
  * so a plan regression (lost pushdown, lost broadcast, lost map-side
  * combine) fails the build instead of shipping silently. Substring
  * checks are deliberately coarse — they pin the plan SHAPE (which
  * operator/exchange kinds appear), not the volatile details (ids,
  * partition counts, AQE re-sizing).
  */
class PlansSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    // default 100-char metadata truncation would cut PushedFilters
    // mid-list and make the contracts vacuously fail
    val prev = spark.conf.get("spark.sql.maxMetadataStringLength")
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.explainString(SimpleMode)
    finally spark.conf.set("spark.sql.maxMetadataStringLength", prev)
  }

  private def occurrences(hay: String, needle: String): Int =
    hay.sliding(needle.length).count(_ == needle)

  test("q01: segment predicates pushed to every scan; shuffle-free until the sort") {
    val p = plan("q01_mart_cast_union")
    assert(p.contains("PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,"),
      "segment filter not pushed to the parquet scan")
    // the ONLY exchange is the determinism sort's rangepartitioning —
    // a hashpartitioning exchange here would mean the union shuffles
    assert(occurrences(p, "Exchange hashpartitioning") === 0,
      s"unexpected hash exchange in a cast-project union:\n$p")
  }

  test("q04: filter pushdown + column pruning reach the lineitem scan") {
    val p = plan("q04_filter_pushdown")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), "shipdate lower bound not pushed")
    assert(p.contains("GreaterThan(l_discount"), "discount filter not pushed")
    // pruning: the 16-column lineitem scan must read only the 5 involved
    assert(!p.contains("l_comment") && !p.contains("l_partkey"),
      "uninvolved columns not pruned from ReadSchema")
  }

  test("q09: map-side partial aggregation before a single group exchange") {
    val p = plan("q09_agg_pricing_summary")
    assert(p.contains("partial_sum"), "no map-side combine (partial_sum missing)")
    assert(p.contains("partial_avg"), "no map-side combine (partial_avg missing)")
    assert(occurrences(p, "Exchange hashpartitioning") === 1,
      s"expected exactly one group exchange:\n$p")
  }

  test("q10: dims behind BroadcastExchange; fact never shuffled before the agg") {
    val p = plan("q10_join_broadcast_dims")
    assert(p.contains("BroadcastHashJoin"), "dim joins are not broadcast joins")
    assert(occurrences(p, "BroadcastExchange") >= 2,
      "expected both dims behind BroadcastExchange")
    assert(occurrences(p, "Exchange hashpartitioning") === 1,
      s"fact side shuffled before the aggregate:\n$p")
  }

  test("q178: checksum agg shows map-side partial combine, one group exchange") {
    val p = plan("q178_table_checksum")
    assert(p.contains("partial_sum") && p.contains("partial_count"),
      "checksum aggregate lost its map-side combine")
    assert(occurrences(p, "Exchange hashpartitioning") === 1,
      s"expected exactly one |groups|-sized exchange:\n$p")
  }

  test("q179: register build collapses via partial max before its exchange") {
    val p = plan("q179_hll_registers")
    assert(p.contains("partial_max"),
      "register aggregate lost its map-side max combine")
    assert(occurrences(p, "BroadcastExchange") >= 2,
      "estimate/n_true rows must ride back as broadcasts")
  }

  test("q183: triangle closure is a LeftSemi; stats fold via partial_sum") {
    val p = plan("q183_triangle_census")
    assert(occurrences(p, "LeftSemi") === 1,
      s"wedge closure must be ONE semi-join on the (x,y) edge:\n$p")
    assert(p.contains("partial_sum"),
      "wedge/edge stats lost their map-side combine")
  }

  test("q185: per-cost partial_max; bucket-partitioned prefix window; semi-join back") {
    val p = plan("q185_pareto_frontier")
    assert(p.contains("partial_max"),
      "per-cost max lost its map-side combine — corpus reaches the window")
    assert(p.contains("LeftSemi"),
      "frontier recovery must be a semi-join, not a full join")
    // the per-cost running max must ride a window PARTITIONED by the
    // range bucket — a continuous cost domain (|costs| ≈ |rows|) must
    // never collapse the prefix scan onto one partition; the only
    // single-partition windows allowed ride the ≤ preBuckets-row
    // bucket table (Rank.globalRank's bargain)
    assert(p.contains("hashpartitioning(pf_bucket"),
      s"per-cost prefix window lost its bucket partitioning:\n$p")
  }

  test("q218: Apriori staircase — codegen fan-out, broadcast closure probes, no self-join") {
    // asserted on the unmaterialized form (the query's default
    // materializes via localCheckpoint for cache hygiene, which hides
    // the staircase behind the checkpoint scan)
    val baskets = graft.util.Tables(spark, sfDir, "lineitem")
      .select(org.apache.spark.sql.functions.col("l_orderkey"),
        (org.apache.spark.sql.functions.col("l_partkey") % 50).as("it"))
    val p = graft.operators.Itemsets.frequentTriples(baskets,
        org.apache.spark.sql.functions.col("l_orderkey"),
        org.apache.spark.sql.functions.col("it"),
        supNum = 1, supDen = 2, k = 20, materialize = false)
      .queryExecution.explainString(SimpleMode)
    assert(occurrences(p, "SortMergeJoin") === 0,
      s"pair/triple enumeration must be the codegen fan-out, not basket self-joins:\n$p")
    assert(occurrences(p, "LeftSemi") >= 3,
      "the three Apriori closure probes must be semi-joins")
    assert(occurrences(p, "Generate") >= 2,
      "pair and triple fan-outs must be explode Generates over the basket array")
    assert(p.contains("partial_count"),
      "support counts lost their map-side combine")
    assert(p.contains("TakeOrderedAndProject"),
      "top-k must not materialize a global sort")
    // the width pin before the C(w,3) fan-out (r15, the q174 emission
    // contract applied here): the basket-array table is byte-tiny, so
    // without a USER repartition AQE legally coalesces the entire
    // triple enumeration onto 1-2 tasks — the exact regression class a
    // Spark upgrade or refactor could silently reintroduce
    assert(p.contains("REPARTITION_BY_NUM"),
      s"q218 lost the explicit pre-fan-out width repartition:\n$p")
  }

  test("q237: whole-graph stats fold has no sort-merge join; edges from the array fan-out") {
    val p = plan("q237_degree_mixing_chi2")
    assert(occurrences(p, "SortMergeJoin") === 0,
      s"degree/margin joins must all broadcast; edges come from the ArrayPairs fan-out:\n$p")
    assert(occurrences(p, "Generate") >= 1,
      "edge enumeration must be the ArrayPairs explode, not a self-join")
    assert(p.contains("partial_count"),
      "the contingency agg lost its map-side combine")
  }

  test("q243: one-pass native CDC kernel; zero exchanges before the chunk agg") {
    val p = plan("q243_cdc_chunk_dedup")
    assert(p.contains("graft_cdc_chunks"),
      "the cut sweep must be the native one-pass kernel")
    assert(!p.contains("sequence("),
      "the composed per-position array program must be gone")
    // exactly the two agg exchanges ((chunk, doc_id) distinct pre-agg,
    // then (chunk)); nothing shuffles before the Generate
    assert(occurrences(p, "Exchange") === 2,
      s"unexpected exchange structure:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      "top-k must not materialize a global sort")
  }

  test("q251: incremental LSH — bucket-key joins only, retirement as a semi-join") {
    val p = plan("q251_lsh_incremental")
    assert(p.contains("LeftSemi"),
      "stored-pair retirement must be a semi-join against surviving buckets")
    assert(p.contains("bounded_long_list"),
      "the stored index's member lists must ride the bounded aggregate")
    assert(occurrences(p, "Generate") >= 1,
      "stored pairs must come from the per-row bucket fan-out, not a self-join")
    assert(!p.contains("CartesianProduct"),
      "no pair space may materialize outside bucket keys")
  }

  test("q247: IVF mining scores through TopKPerKey on a salted bucket join") {
    val p = plan("q247_mutual_nn_ivf")
    assert(p.contains("TopKPerKey"),
      "per-query top-k must run on the TopKPerKey node")
    assert(p.contains("__salt"),
      "the bucket-keyed scored join must carry the parallelism salt")
  }

  test("q250: pair sets meet in ONE full-outer join; truth side rides capped postings") {
    val p = plan("q250_lsh_quality")
    assert(p.contains("FullOuter"),
      "LSH and ground-truth pair sets must meet in a single full-outer join")
    assert(p.contains("bounded_long_list"),
      "the ground-truth side must use the capped posting machinery")
    assert(occurrences(p, "Generate") >= 2,
      "both pair sides must fan out per-row (banding / postings), not self-join")
    assert(!p.contains("CartesianProduct"),
      "no pair space may materialize outside bucket keys")
  }

  test("q252: CMS finish probes a broadcast state; top-10 without a global sort") {
    // plan() runs the streaming maintenance as a side effect; the
    // asserted plan is the FINISH query over the committed state —
    // cells must ride back as a broadcast (1024 cells), the min-probe
    // agg keeps its partial combine, top-10 is TakeOrdered
    val p = plan("q252_streaming_cms_hh")
    assert(p.contains("BroadcastExchange"),
      "the d×w cell state must broadcast against the dictionary probes")
    assert(p.contains("partial_min"),
      "the per-term min-cell probe lost its map-side combine")
    assert(p.contains("TakeOrderedAndProject"),
      "top-10 must not materialize a global sort")
  }

  test("q254: kmeans-index mining keeps the salted TopKPerKey bucket join") {
    val p = plan("q254_mutual_nn_kmeans")
    assert(p.contains("TopKPerKey"),
      "per-query top-k must run on the TopKPerKey node")
    assert(p.contains("__salt"),
      "the bucket-keyed scored join must carry the parallelism salt")
    assert(!p.contains("CartesianProduct"),
      s"no unkeyed pair space in the kmeans mining path")
  }

  test("q253: nearest-centroid assignment is a broadcast argmax fold — the corpus never shuffles") {
    // asserted on the building block (the query's fixed-round build
    // localCheckpoints per round for lineage hygiene, which hides the
    // assignment shape behind checkpoint scans): one centroid build +
    // one assignment pass, exactly what every kmeansBuckets round runs
    import org.apache.spark.sql.functions._
    val e = graft.util.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val cents = graft.operators.Similarity.centroidsWide(
      e.select((col("vec_id") % 4).as("lbl"), col("v")))
    val p = graft.operators.Similarity.assignToNearest(e, cents)
      .queryExecution.explainString(SimpleMode)
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"),
      "the 1-row centroid array must broadcast against the corpus scan")
    // the ONLY hash exchanges belong to the C-row centroid build
    // ((lbl,pos) then (lbl)); the corpus assignment branch adds none —
    // a third would mean assignment shuffles the corpus
    assert(occurrences(p, "Exchange hashpartitioning") === 2,
      s"assignment must add zero corpus exchanges:\n$p")
    assert(p.contains("partial_"),
      "the centroid aggregate lost its map-side combine")
  }

  test("q256: retire is anti-join cascade + semi-join resurrection over bucket keys") {
    val p = plan("q256_lsh_retire")
    assert(occurrences(p, "LeftAnti") >= 3,
      "cascade retirement (two delete probes) + resurrection dedup must be anti-joins")
    assert(p.contains("LeftSemi"),
      "resurrection member recovery must semi-join the affected bucket keys only")
    assert(p.contains("bounded_long_list"),
      "the stored index's member lists must ride the bounded aggregate")
    assert(occurrences(p, "Generate") >= 2,
      "stored and resurrected pairs must fan out per-row from buckets, not self-join")
    assert(!p.contains("CartesianProduct"),
      "no pair space may materialize outside bucket keys")
  }

  test("q257: auto-tuned banding runs ONE banding chain; pair sets meet in one full-outer join") {
    val p = plan("q257_lsh_autotune")
    assert(p.contains("FullOuter"),
      "truth and candidate pair sets must meet in a single full-outer join")
    assert(p.contains("bounded_long_list"),
      "truth postings and band buckets must ride the bounded aggregate")
    assert(!p.contains("CartesianProduct"),
      "no pair space may materialize outside bucket keys")
    assert(occurrences(p, "Generate") >= 2,
      "both pair sides must fan out per-row (banding / postings), not self-join")
  }

  test("q246: incremental sessionization splits replay/passthrough as semi/anti joins") {
    val p = plan("q246_incremental_sessions")
    assert(p.contains("LeftSemi"),
      "affected users' replay must be a semi-join on the delta user set")
    assert(p.contains("LeftAnti"),
      "untouched users' passthrough must be an anti-join on the delta user set")
  }

  test("q186: delta fold collapses before the day window") {
    val p = plan("q186_sweep_concurrency")
    assert(p.contains("partial_sum"),
      "day-delta aggregate lost its map-side combine")
    assert(occurrences(p, "Exchange hashpartitioning") === 1,
      s"exactly one day-keyed exchange expected before the prefix sum:\n$p")
  }

  test("q191: scored pass rides TopKPerKey with a broadcast query side") {
    val p = plan("q191_mutual_nn_margin")
    assert(p.contains("TopKPerKey"),
      "per-query top-k must run on the TopKPerKey node")
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastNestedLoopJoin"),
      "query copy must broadcast against the corpus scan")
  }

  test("q182: df/N broadcast back; no corpus self-join for candidates") {
    val p = plan("q182_tfidf_cosine_join")
    assert(occurrences(p, "BroadcastExchange") >= 2,
      "df and corpus-count tables must be broadcast")
    assert(p.contains("partial_count"),
      "tf aggregation lost its map-side combine")
  }

  test("q151: star dim chain broadcast; filters pushed; one group exchange") {
    val p = plan("q151_star_join_revenue")
    assert(occurrences(p, "BroadcastExchange") >= 3,
      "region->nation->customer chain not fully behind BroadcastExchange")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      "order-date filter not pushed to the orders scan")
    assert(p.contains("EqualTo(r_name,ASIA)"),
      "region filter not pushed to the region scan")
    // at sf0.001 even the fact join broadcasts, so the only hash
    // exchange tolerated is the revenue aggregate's
    assert(occurrences(p, "Exchange hashpartitioning") <= 1,
      s"unexpected extra shuffles in the star join:\n$p")
  }

  test("q229: bucketed join reads bucketed scans and never shuffles the join inputs") {
    // disable auto-broadcast so the contract pins the BUCKETED merge
    // join path (at sf0.001 the orders side is small enough that AQE
    // would legitimately broadcast it and hide the property)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan("q229_bucketed_colocated_join")
      assert(p.contains("SortMergeJoin"), "bucketed join did not plan as a merge join")
      assert(p.contains("SelectedBucketsCount"),
        "scans are not bucket-aware (SelectedBucketsCount missing)")
      // the ONLY hash exchange allowed is the priority aggregate's —
      // an exchange feeding the join would mean bucketing was ignored
      assert(occurrences(p, "Exchange hashpartitioning") <= 1,
        s"join inputs shuffled despite bucketing:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q129: basket pairs plan no join at all — pure agg + array fan-out") {
    val p = plan("q129_basket_pairs")
    assert(!p.contains("Join"),
      s"pair enumeration regressed to a self-join:\n$p")
    assert(p.contains("partial_collect_set") || p.contains("collect_set"),
      "basket collection lost from the plan")
    assert(p.contains("Generate explode"),
      "array fan-out explode missing from the plan")
  }

  test("q221: the peel round is a broadcast probe of the edges — never a re-keying") {
    // asserted on the building block (round state localCheckpoints,
    // hiding the loop shape behind checkpoint scans): the degree
    // correction joins the cached edge set against the SMALL drop
    // frontier map-side; the only shuffled rows are the drop-incident
    // edges reaching the per-node count
    import org.apache.spark.sql.functions._
    val e0 = graft.operators.Graph.coOccurrenceEdges(
        graft.util.Tables(spark, sfDir, "lineitem"),
        col("l_orderkey"), col("l_partkey"))
      .select("u", "v").localCheckpoint(true)
    val deg = e0.groupBy("u").agg(count(lit(1)).as("dg"))
      .localCheckpoint(true)
    val drop = deg.filter(col("dg") < 3 && col("dg") >= 1).select("u")
      .localCheckpoint(true)
    val corr = e0
      .join(broadcast(drop.select(col("u").as("v"))), "v")
      .groupBy("u").agg(count(lit(1)).as("dc"))
    val p = corr.queryExecution.explainString(SimpleMode)
    assert(p.contains("BroadcastHashJoin"),
      s"drop frontier must broadcast-probe the edge set:\n$p")
    assert(p.contains("partial_count"),
      "correction count lost its map-side combine")
    // one exchange: the |drop-incident| correction agg — the edge set
    // itself must not hash-partition
    assert(occurrences(p, "Exchange hashpartitioning") === 1,
      s"edge set re-keyed inside a peel round:\n$p")
  }

  test("q259: component rollup is one partial-combined agg + broadcast audit row, top-k finish") {
    val p = plan("q259_connected_components")
    assert(p.contains("partial_count"),
      "component size aggregate lost its map-side combine")
    assert(p.contains("TakeOrderedAndProject"),
      "top-25 must finish as TakeOrdered, not a global sort")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"),
      "the 1-row moved_last audit must ride a broadcast")
    assert(!p.contains("CartesianProduct"),
      s"cartesian in the component rollup:\n$p")
  }

  test("q261: the delta batch scores against broadcast frozen centroids — no base re-scan joins") {
    val p = plan("q261_ivf_incremental_insert")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"),
      "frozen centroid row must broadcast against the delta scan")
    // the shared bucketAudit rollup counts base/delta via signed sums
    // over the membership union — still one partial-combined agg
    assert(p.contains("partial_sum"),
      "bucket membership counts lost their map-side combine")
    assert(!p.contains("CartesianProduct"),
      s"cartesian in the insert audit:\n$p")
    // exactly one parquet scan survives in the consumer plan: the
    // DELTA assignment's embeddings read (the base build + its counts
    // ride behind the build's checkpoints)
    assert(occurrences(p, "FileScan") <= 1,
      s"base corpus re-scanned at insert time:\n$p")
  }

  test("q174: emission and verify stages carry user repartitions AQE cannot coalesce") {
    val p = plan("q174_prefix_jaccard")
    // TWO deterministic-width pins: (1) the compute-bound intersect
    // stage must never inherit the scan's split count through the
    // cached gram relation (451 s degenerate plan at sf1 when AQE
    // broadcast the pair table, r10); (2) the pair-emission stage must
    // never ride the post-groupBy exchange of the byte-tiny bucket
    // table, which AQE can coalesce to 1 partition and serialize the
    // whole C(c,2) explode (237 s in-suite vs 42 s solo at sf1, r14)
    assert(occurrences(p, "REPARTITION_BY_NUM") >= 2,
      s"q174 lost an explicit cluster-width repartition (needs both " +
        s"the emission pin and the verify probe pin):\n$p")
    assert(!p.contains("CartesianProduct"),
      s"cartesian in the prefix-join assembly:\n$p")
  }

  test("q262: every bilinear delta term joins a broadcast delta — no base-base re-join beyond V0") {
    val p = plan("q262_join_ivm")
    // dA⋈B0, A0⋈dB, dA⋈dB: three delta-sided broadcast hash joins
    assert(occurrences(p, "BroadcastHashJoin") >= 3,
      s"a bilinear delta term lost its broadcast (delta-sized cost contract):\n$p")
    assert(p.contains("partial_sum"),
      "view-state merge lost its map-side combine")
    assert(!p.contains("CartesianProduct"),
      s"cartesian in the IVM assembly:\n$p")
  }

  test("q264: distinct-IVM maintenance is join-free — aggs and a keyed merge only") {
    val p = plan("q264_distinct_ivm")
    // the support table is state, not a join product: any Join node
    // here means the maintenance re-derives what it should merge
    assert(!p.contains("Join"),
      s"distinct-IVM plan grew a join:\n$p")
    assert(p.contains("partial_sum"),
      "support merge lost its map-side combine")
    assert(!p.contains("CartesianProduct"),
      s"cartesian in the distinct-IVM plan:\n$p")
  }

  test("split kernel: broadcast probes of the flagged set; bucket-partitioned argmax; LeftAnti pass-through") {
    import org.apache.spark.sql.functions._
    val members = graft.util.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"),
        (col("vec_id") % 7).as("bucket"))
    val flagged = members.groupBy("bucket")
      .agg(count(lit(1)).as("sz")).filter(col("sz") > 10)
      .select("bucket").localCheckpoint(true)
    val p = graft.operators.Similarity
      .splitBucketsLocal(members, flagged)
      .queryExecution.explainString(SimpleMode)
    assert(occurrences(p, "BroadcastExchange") >= 3,
      s"flagged set / seeds / rank rows must all ride broadcasts:\n$p")
    assert(p.contains("LeftAnti"),
      "pass-through buckets must anti-probe the broadcast flagged set")
    assert(p.contains("hashpartitioning(bucket"),
      "the 2-means argmax window must partition by bucket (never global)")
    assert(!p.contains("CartesianProduct"),
      s"cartesian in the split kernel:\n$p")
  }

  test("q263: split cost rides broadcast probes of the flagged set; pass-through is a LeftAnti") {
    val p = plan("q263_ivf_bucket_split")
    assert(occurrences(p, "BroadcastExchange") >= 3,
      "flagged set / seeds / rank rows must all ride broadcasts")
    assert(p.contains("LeftAnti"),
      "pass-through buckets must anti-probe the broadcast flagged set")
    assert(!p.contains("CartesianProduct"),
      s"cartesian in the bucket split:\n$p")
  }

  test("q255: kmeans-index mining is the pure IVF path — TopKPerKey lists, LeftSemi mutuality") {
    val p = plan("q255_hard_negatives_kmeans")
    assert(p.contains("TopKPerKey"),
      "per-query k=2 lists must run on the TopKPerKey node")
    assert(p.contains("LeftSemi"),
      "mutuality must be a semi-join of the top-1 table against its transpose")
    assert(!p.contains("CartesianProduct"),
      s"cartesian in the kmeans mining assembly:\n$p")
  }

  test("q258: full assignment = one corpus scan + two broadcast argmax folds, no shuffle") {
    val p = plan("q258_kmeans_sampled_build")
    // the sampled TRAIN work ran behind the build's checkpoints; what
    // this consumer plan shows is exactly the full-corpus contract:
    // the corpus is scanned ONCE, assigned by TWO broadcast
    // nested-loop folds (prev + final centroid rows — bucket0 and
    // bucket for the moved audit), and never hash-shuffles
    assert(occurrences(p, "FileScan") === 1,
      s"corpus must be scanned exactly once in the final assignment:\n$p")
    assert(occurrences(p, "BroadcastNestedLoopJoin") === 2,
      "assignment must be two broadcast argmax folds (prev + final centroids)")
    assert(occurrences(p, "Exchange hashpartitioning") === 0,
      s"the corpus must never shuffle in the sampled-build assignment:\n$p")
  }

  test("q260: canonical rollup joins a broadcast, windows per cluster, no merge join") {
    val p = plan("q260_cluster_canonical_dist")
    assert(p.contains("BroadcastHashJoin"),
      "cluster table must broadcast against the doc stats — not a shuffle join")
    assert(occurrences(p, "SortMergeJoin") === 0,
      s"rollup regressed to a merge self-join:\n$p")
    assert(p.contains("hashpartitioning(cluster_id"),
      "keep-list window must partition by cluster_id (cluster-sized, never global)")
    assert(p.contains("partial_count"),
      "per-cluster rollup lost its map-side combine")
  }

  test("q265: sampled mining anchors the probe side on a broadcast semi-join") {
    val p = plan("q265_mutual_nn_kmeans_sampled")
    // the m/n cut must happen on the probe side BEFORE the scored
    // join: anchor ids ride a TakeOrdered sample (no global sort)
    // into a broadcast LeftSemi against the probe projection — the
    // corpus-sized candidate scan never sees the anchor filter
    assert(p.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("LeftSemi")),
      s"anchor restriction must be a broadcast semi-join on the probe side:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      "anchor sample must plan as TakeOrdered over the hash projection, not a global sort")
    assert(p.contains("TopKPerKey"),
      "per-anchor lists must still run on the TopKPerKey node")
    assert(!p.contains("CartesianProduct"),
      s"cartesian in the sampled mining assembly:\n$p")
  }

  test("q268: build-time cap reuses the broadcast split kernel; pass-through is a LeftAnti") {
    val p = plan("q268_kmeans_capped_build")
    assert(p.contains("LeftAnti"),
      "unflagged buckets must anti-probe the broadcast flagged set")
    assert(occurrences(p, "BroadcastExchange") >= 3,
      "flagged set / seeds / rank rows must all ride broadcasts")
    assert(p.contains("partial_count"),
      "per-bucket rollup lost its map-side combine")
    assert(!p.contains("CartesianProduct"),
      s"cartesian in the capped build:\n$p")
  }

  test("q267: int8 mining scores bytes — ByteCosine on packed BINARY, no double cosine in the scored join") {
    val p = plan("q267_mutual_nn_kmeans_int8")
    // both sides of the scored join must be the packed byte vectors:
    // the kernel is the fused long-arithmetic ByteCosine and the
    // packer appears on both the member and probe projections —
    // a graft_array_cosine on the scored side would mean the 8x
    // memory-traffic cut silently regressed to the double path
    assert(p.contains("graft_byte_cosine"),
      "scored join must run the fused ByteCosine byte kernel")
    assert(occurrences(p, "graft_pack_int8") >= 2,
      "both member and probe sides must quantize to packed int8 BINARY")
    // the double cosine legitimately appears in the probe RANKING
    // (the broadcast centroid fold — build-time work); what the
    // contract pins is that the SCORED output itself is the byte
    // kernel: cos_sim rounds a graft_byte_cosine, never a
    // graft_array_cosine
    assert(p.contains("round(graft_byte_cosine"),
      "scored cos_sim must round the ByteCosine kernel")
    assert(!p.linesIterator.exists(l =>
      l.contains("graft_array_cosine") && l.contains("cos_sim")),
      s"scored cos_sim regressed to the double cosine path:\n$p")
    assert(p.contains("TopKPerKey"),
      "per-anchor lists must still run on the TopKPerKey node")
    assert(!p.contains("CartesianProduct"),
      s"cartesian in the int8 mining assembly:\n$p")
  }

  test("q269: lifecycle serve — broadcast anchors/probes, bucket-keyed serve joins, no cartesian scan") {
    val p = plan("q269_ivf_lifecycle_roundtrip")
    // the two serves (lifecycle + fresh reference) each probe the
    // membership on a bucket-keyed BroadcastHashJoin with the anchor
    // probes on the broadcast side — the 100 TB membership is only
    // ever scanned, never shuffled against the queries, and the
    // anchor restriction itself is a broadcast join of the 8-row
    // anchor sample
    assert(occurrences(p, "BroadcastHashJoin") >= 3,
      "anchor restriction + both serves must be broadcast hash joins")
    assert(p.contains("TopKPerKey"),
      "served top-k must run on the TopKPerKey node")
    // the only cartesians allowed are the 1-row broadcast folds
    // (centroid arrays, maxb row) — never a CartesianProduct
    assert(!p.contains("CartesianProduct"),
      s"cartesian in the lifecycle serve:\n$p")
    // final scoreboard assembles per-anchor counts by left joins on
    // the 8-row anchor table — all broadcastable, no merge join
    assert(occurrences(p, "SortMergeJoin") === 0,
      s"scoreboard regressed to merge joins:\n$p")
  }

  test("q271: composed chain — anchor LeftSemi rides the post-split membership; pass-through is a LeftAnti") {
    val p = plan("q271_mining_on_capped_index")
    // the capped build's unflagged pass-through (broadcast LeftAnti
    // of the flagged set) must survive under the mining consumer
    assert(p.linesIterator.exists(l =>
      l.contains("Join") && l.contains("LeftAnti")),
      "capped-build pass-through lost its broadcast LeftAnti")
    // the m/n anchor cut must hit the probe side of the POST-SPLIT
    // membership as a broadcast semi-join, before the scored join
    assert(p.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("LeftSemi")),
      "anchor restriction must be a broadcast semi-join on the probe side")
    assert(p.contains("TopKPerKey"),
      "per-anchor lists must still run on the TopKPerKey node")
    assert(!p.contains("CartesianProduct"),
      s"cartesian in the composed capped-build mining chain:\n$p")
  }

  test("q273: top-k read routes refill by broadcast semi/anti; lists ride TopKPerKey") {
    val p = plan("q273_topk_ivm_refill")
    // (the foreachBatch maintenance ran at construction; this is the
    // READ plan): flagged groups split the sources by broadcast
    // semi/anti probes — the base is scanned only through the
    // semi-join — and the final lists run on the TopKPerKey node
    assert(p.contains("TopKPerKey"),
      "top-k read must run on the TopKPerKey node")
    assert(p.linesIterator.exists(l =>
      l.contains("Join") && l.contains("LeftSemi")),
      "refill base scan must be gated by a semi-join on flagged groups")
    assert(p.linesIterator.exists(l =>
      l.contains("Join") && l.contains("LeftAnti")),
      "buffer side must anti-probe the flagged set")
    assert(!p.contains("CartesianProduct"),
      s"cartesian in the top-k read:\n$p")
  }

  test("q274: pigeonhole candidates meet on a hash-partitioned key join; verify is per-pair levenshtein") {
    val p = plan("q274_edit_distance_join")
    assert(p.contains("levenshtein"),
      "verification must be the codegen levenshtein, not a UDF")
    assert(!p.contains("CartesianProduct"),
      s"candidate generation regressed to a cross product:\n$p")
    // both sides fan out via Generate (explode) before the key join —
    // the constant-per-string probe enumeration, never an all-pairs
    assert(occurrences(p, "Generate explode") >= 2,
      "segment/probe enumeration must be the explode fan-out")
    assert(p.contains("HashAggregate"),
      "candidate pair distinct lost its hash aggregation")
  }

  test("q275: fact scan carries a dynamicpruning partition filter from the runtime dim") {
    val p = plan("q275_dynamic_partition_pruning")
    // the qualifying priorities exist only at runtime (nation-derived)
    // — the partitioned fact scan must carry the DPP subquery filter,
    // not read all five partitions
    assert(p.contains("dynamicpruning"),
      s"partitioned fact scan lost dynamic partition pruning:\n$p")
    assert(p.contains("PartitionFilters"),
      "fact scan must prune on the partition column")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "2-row dim must broadcast")
    assert(!p.contains("CartesianProduct"),
      s"cartesian in the DPP join:\n$p")
  }

  test("q276: runtime bloom filter pushed into the fact scan of the shuffle join") {
    // built inside the conf window — the injection happens at
    // optimization time, so the frame must be EXPLAINED under the
    // same confs the query materializes under (the lazy-planning
    // subtlety q276's body documents)
    val p = graft.queries.JoinQueries.withBloomConfs(spark) {
      val prevLen = spark.conf.get("spark.sql.maxMetadataStringLength")
      spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
      try graft.queries.JoinQueries.q276Frame(spark, sfDir)
        .queryExecution.explainString(SimpleMode)
      finally spark.conf.set("spark.sql.maxMetadataStringLength", prevLen)
    }
    assert(p.contains("might_contain"),
      s"bloom filter not injected into the fact side:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      "the contracted scenario is the shuffle join (dim outgrows broadcast)")
    assert(!p.contains("CartesianProduct"),
      s"cartesian in the bloom-pruned join:\n$p")
  }

  test("q279: DPP and the runtime bloom filter fire together in one star-join plan") {
    // the q275 and q276 assertions COMPOSED: the month-partitioned
    // fact scan must carry BOTH the dynamicpruning partition filter
    // (files pruned by the runtime dim) and the injected might_contain
    // (rows pruned before the shuffle join) — the whole-scan story a
    // 100 TB star join lives on. Built inside the bloom conf window
    // (injection happens at optimization time — the q276 lazy-planning
    // subtlety).
    val p = graft.queries.JoinQueries.withBloomConfs(spark) {
      val prevLen = spark.conf.get("spark.sql.maxMetadataStringLength")
      spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
      try graft.queries.JoinQueries.q279Frame(spark, sfDir)
        .queryExecution.explainString(SimpleMode)
      finally spark.conf.set("spark.sql.maxMetadataStringLength", prevLen)
    }
    assert(p.contains("dynamicpruning"),
      s"partitioned fact scan lost dynamic partition pruning:\n$p")
    assert(p.contains("PartitionFilters"),
      "fact scan must prune on the partition column")
    assert(p.contains("might_contain"),
      s"bloom filter not injected into the fact side:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      "the part join must stay the shuffle join (dim outgrows broadcast)")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "the month dim must broadcast (DPP reuses its exchange)")
    assert(!p.contains("CartesianProduct"),
      s"cartesian in the dual-pruned star join:\n$p")
  }

  test("q270: a maintenance batch reads state + delta parquet only — no join, no base re-scan") {
    // asserted on the building block (the foreachBatch body runs
    // during query construction, so the query's own plan only shows
    // the final view derivation): one batch's maintenance = signed
    // agg over the batch file + keyed merge against the stored
    // support table. Two parquet scans, partial-combined aggs, ZERO
    // joins — scanning the base corpus here would break the
    // delta-sized cost contract.
    import org.apache.spark.sql.functions._
    val dir = graft.util.TmpDirs.perProcess("graft_q270_plan_probe")
    val ev = graft.util.Tables(spark, sfDir, "events")
      .select(col("event_type"),
        round(col("value") * 10000).cast("long").as("vbp"),
        lit(1L).as("sign"))
    graft.warehouse.Warehouse.supportState(ev, Seq("event_type"), col("vbp"))
      .write.mode("overwrite").parquet(s"$dir/state_0")
    ev.limit(50).write.mode("overwrite").parquet(s"$dir/batch_1")
    val merged = graft.warehouse.Warehouse.mergeSupportState(Seq(
      spark.read.parquet(s"$dir/state_0"),
      graft.warehouse.Warehouse.supportState(
        spark.read.parquet(s"$dir/batch_1"), Seq("event_type"), col("vbp"))),
      Seq("event_type"))
    val p = merged.queryExecution.explainString(SimpleMode)
    assert(!p.contains("Join"),
      s"distinct-IVM maintenance batch grew a join:\n$p")
    assert(occurrences(p, "FileScan") === 2,
      s"maintenance must read exactly the stored state and the batch file:\n$p")
    assert(p.contains("partial_sum"),
      "support merge lost its map-side combine")
  }

  test("q277: HLL maintenance batch reads state + batch parquet only — no join, map-side max") {
    // same discipline as the q270 contract, on the approximate state:
    // one batch's maintenance = register partial over the batch file
    // merged (register-wise max) against the stored state. Two parquet
    // scans, partial-combined max aggs, ZERO joins — and the state the
    // merge scans is ≤ m rows per group, never the corpus.
    import org.apache.spark.sql.functions._
    val dir = graft.util.TmpDirs.perProcess("graft_q277_plan_probe")
    val ev = graft.util.Tables(spark, sfDir, "events")
      .select(col("event_type"), col("user_id"))
    graft.operators.Sketches.hllState(ev, Seq("event_type"),
        col("user_id"), p = 6)
      .write.mode("overwrite").parquet(s"$dir/state_0")
    ev.limit(50).write.mode("overwrite").parquet(s"$dir/batch_1")
    val merged = graft.operators.Sketches.mergeHllState(Seq(
      spark.read.parquet(s"$dir/state_0"),
      graft.operators.Sketches.hllState(
        spark.read.parquet(s"$dir/batch_1"), Seq("event_type"),
        col("user_id"), p = 6)),
      Seq("event_type"))
    val p = merged.queryExecution.explainString(SimpleMode)
    assert(!p.contains("Join"),
      s"HLL-IVM maintenance batch grew a join:\n$p")
    assert(occurrences(p, "FileScan") === 2,
      s"maintenance must read exactly the stored state and the batch file:\n$p")
    assert(p.contains("partial_max"),
      "register merge lost its map-side combine")
  }

  test("q278: CMS maintenance batch reads state + batch parquet only — no join, map-side sum") {
    // the frequency sibling of the q270/q277 contracts: one batch's
    // maintenance = signed cell partial over the batch file merged
    // ((r, bkt) sum) against the stored ≤ d·w-cell state. Two parquet
    // scans, partial-combined sums, ZERO joins.
    import org.apache.spark.sql.functions._
    val dir = graft.util.TmpDirs.perProcess("graft_q278_plan_probe")
    val ev = graft.util.Tables(spark, sfDir, "events")
      .select(col("user_id"), lit(1L).as("sign"))
    graft.operators.Sketches.cmsState(ev, col("user_id"), 4, 256)
      .write.mode("overwrite").parquet(s"$dir/state_0")
    ev.limit(50).write.mode("overwrite").parquet(s"$dir/batch_1")
    val merged = graft.operators.Sketches.mergeCmsState(Seq(
      spark.read.parquet(s"$dir/state_0"),
      graft.operators.Sketches.cmsState(
        spark.read.parquet(s"$dir/batch_1"), col("user_id"), 4, 256)))
    val p = merged.queryExecution.explainString(SimpleMode)
    assert(!p.contains("Join"),
      s"CMS-IVM maintenance batch grew a join:\n$p")
    assert(occurrences(p, "FileScan") === 2,
      s"maintenance must read exactly the stored state and the batch file:\n$p")
    assert(p.contains("partial_sum"),
      "cell merge lost its map-side combine")
  }
}
