package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Plan-quality regression tests: the properties that make these operators
  * survive a 100× scale-up are asserted on the physical plans, so a future
  * refactor can't silently reintroduce a pathological plan. */
class PlanQualitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q_b5_multi_join: dims broadcast, filters + pruning reach the scans") {
    val p = plan("q_b5_multi_join")
    assert(p.contains("BroadcastHashJoin"), "dimension joins must broadcast")
    assert(p.contains("PushedFilters"), "join-key null filters must push down")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_extendedprice:double,l_discount:double>"),
      s"lineitem scan must prune to 3 columns:\n$p")
  }

  test("q1_agg: partial aggregation before the exchange") {
    val p = plan("q1_agg")
    // two HashAggregates around one Exchange = map-side combine
    assert("HashAggregate".r.findAllIn(p).size >= 2)
    assert("Exchange".r.findAllIn(p).size <= 2, s"too many shuffles:\n$p")
  }

  test("q_sim_topk: native dot-product kernel, no interpreted folds") {
    val p = plan("q_sim_topk")
    assert(p.contains("dotproduct") || p.contains("DotProduct"),
      s"expected the native kernel in:\n$p")
    assert(!p.contains("aggregate(zip_with"), "interpreted HOF fold crept back in")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "query side must broadcast")
  }

  test("q_sim_recall: IVF retrieval recall >= 0.9 at nprobe=4") {
    val row = SparkEntry.queries("q_sim_recall")(spark, sf).collect()(0)
    val recallM = row.getAs[Long]("recall_m")
    assert(recallM >= 900L, s"IVF recall@5 must be >= 0.9, got ${recallM / 10.0}%")
    assert(row.getAs[Long]("n_total") == 100L, "20 queries x k=5")
  }

  test("PQ + exact rerank: recall vs exact L2, codes never expand the vectors") {
    import graft.pipeline.Similarity
    import org.apache.spark.sql.functions._
    // sf0.01, not the spec-default sf0.001: recall against a 32-codeword
    // sampled codebook is only meaningful when the corpus is several times
    // the codebook (500 vectors here vs 50 at sf0.001, where the shortlist
    // is most of the corpus and the measurement is degenerate)
    val emb = graft.core.Td.embeddings(spark, "/root/testdata/sf0.01")
    val cb = Similarity.pqCodebook(emb, "vec_id", "embedding", dim = 64,
      m = 16, size = 32)
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", cb,
      dim = 64, m = 16)
    val queries = emb.filter(col("vec_id") < 10)
    val pq = Similarity.pqTopK(queries, codes, emb, "vec_id", "embedding",
      cb, k = 5, dim = 64, m = 16, rerank = 4)
    // exact L2 ground truth, same tie-break
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val c = emb.select(col("vec_id").as("n_id"), col("embedding").as("n_vec"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("q_id"))
      .orderBy(col("d2").asc, col("n_id").asc)
    val exact = c.crossJoin(broadcast(q)).filter(col("q_id") =!= col("n_id"))
      .withColumn("d2", Similarity.l2sq(col("q_vec"), col("n_vec")))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .select(col("q_id"), col("n_id"))
    val hits = exact.join(pq.select(col("q_id"), col("n_id")),
      Seq("q_id", "n_id")).count()
    val total = exact.count()
    assert(total == 50, s"10 queries x k=5, got $total")
    assert(hits * 10 >= total * 8,
      s"PQ@rerank4 recall must be >= 0.8, got $hits/$total")
    // plan: the ADC scan must move codes, not vectors, and everything
    // meets through broadcast/equi joins — no unbounded nested loop
    val p = pq.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"ADC must stay equi-joined:\n$p")
  }

  test("q_pq_ivf: cell-pruned ADC — codes scan equi-joins, no cartesian") {
    val p = plan("q_pq_ivf")
    assert(!p.contains("CartesianProduct"), s"ADC must stay equi-joined:\n$p")
    // the only nested-loop broadcasts allowed are the bounded centroid
    // table (limit-8 cells) inside assign, same allowance as q_embed_nn
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    val boundedBuilds = "PushedFilters: \\[IsNotNull\\(vec_id\\), LessThan\\(vec_id,8\\)\\]".r
      .findAllIn(p).size
    assert(bnlj <= boundedBuilds + 1,
      s"an unbounded broadcast build crept into the ADC plan:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"probes/LUT must broadcast into the codes scan:\n$p")
  }

  test("q_adt_typeof: native JSON type kernel — no ScalaUDF in the typed-filter plan") {
    val df = SparkEntry.queries("q_adt_typeof")(spark, sf)
    // collect() executes THIS QueryExecution (count() would plan a new
    // one), finalizing AQE so codegen stage markers are visible
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("UDF"),
      s"ScalaUDF crept back into the C8-C12 type-filter path:\n$p")
    // r18: with the dual-written properties_v column present the planner
    // routes IS_* through variant introspection (schema_of_variant over
    // variant_get — binary probe, no per-call JSON parse); without it,
    // the native JsonTypeOf kernel. Either way: codegen'd, never a UDF.
    val lower = p.toLowerCase
    assert(lower.contains("schemaofvariant") || lower.contains("jsontypeof"),
      s"expected variant type introspection or the native JsonTypeOf kernel in:\n$p")
    // the kernel generates code (no CodegenFallback): the type filter must
    // sit INSIDE a whole-stage-codegen span (the `*(n) Filter` marker) —
    // a fallback expression would split the stage and print a bare Filter
    assert("\\*\\(\\d+\\) Filter".r.findFirstIn(p).nonEmpty,
      s"type filter fell out of whole-stage codegen:\n$p")
  }

  test("q_dedup_minhash: no cartesian products anywhere") {
    val p = plan("q_dedup_minhash")
    assert(!p.contains("CartesianProduct"),
      s"candidate generation must stay index-joined:\n$p")
  }

  test("componentsStars: star contraction stays equi-joined, no adjacency collect") {
    import spark.implicits._
    val pairs = (1L to 50L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val p = graft.pipeline.Dedup.componentsStars(pairs)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"contraction must equi-join:\n$p")
    assert(!p.contains("collect_list") && !p.contains("collect_set"),
      "no per-node adjacency list may be collected (hub-node task overflow)")
  }

  test("streaming near-dup increment: equi-joined probe, no cartesian, no adjacency collect") {
    import spark.implicits._
    import graft.pipeline.StreamingNearDedup
    val prior = (1L to 40L).map(i => (i, s"prior doc $i with words $i ${i + 1} ${i + 2} shared"))
      .toDF("doc_id", "text")
    val batch = (100L to 120L).map(i => (i, s"new doc $i with words $i ${i + 1} ${i + 2} shared"))
      .toDF("doc_id", "text")
    val pInc = StreamingNearDedup.increment(prior, "doc_id", "text", None)
    val inc = StreamingNearDedup.increment(batch, "doc_id", "text",
      Some(StreamingNearDedup.SeenIndex(pInc.sigs, pInc.shingles)))
    val p = inc.survivors.queryExecution.executedPlan.toString
    // the candidate probe must meet the index through (band, sig) equi-joins
    // — an all-pairs stage here would scan history × batch at 100 TB
    assert(!p.contains("CartesianProduct"), s"probe must stay equi-joined:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"no unbounded broadcast may back the candidate probe:\n$p")
    assert(!p.contains("collect_list") && !p.contains("collect_set"),
      "no per-bucket member list may be collected (hot-bucket task overflow)")
  }

  test("q_embed_nn: no cartesian product, no full-corpus broadcast") {
    val p = plan("q_embed_nn")
    assert(!p.contains("CartesianProduct"),
      s"near-dup must be cell-bucketed, not all-pairs:\n$p")
    // the only nested-loop broadcasts allowed are the limit-8 centroid
    // table inside assignCells (one per side of the self-join); candidates
    // must meet through a cell_id equi-join, never an unbounded broadcast
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    val boundedBuilds = "TakeOrderedAndProject\\(limit=8".r.findAllIn(p).size
    assert(bnlj <= boundedBuilds,
      s"a broadcast with an unbounded build side crept into the plan:\n$p")
    assert(p.contains("SortMergeJoin [cell_id") || p.contains("ShuffledHashJoin [cell_id")
        || p.contains("BroadcastHashJoin [cell_id"),
      s"expected the cell_id equi-join:\n$p")
  }

  test("pipeline MATCH joins on bound ids — no cartesian, partial aggregation kept") {
    val p = plan("q_cypher_pipeline_match")
    assert(!p.contains("CartesianProduct"),
      s"the post-horizon hop must equi-join on the bound dt_id:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"the WITH aggregate must keep its map-side partial:\n$p")
  }

  test("paging N pages runs ONE sort: pages serve from the pinned snapshot") {
    val g = graft.graph.GraphViews.graph(spark, sf)
    val svc = new graft.adt.QueryService(g)
    val q = "SELECT T.$dtId AS id FROM DIGITALTWINS T"
    val p1 = svc.query(q, maxItemsPerPage = 10)
    assert(p1.continuationToken.isDefined)
    // identical snapshot object reused across pages (the sort ran once)...
    val tok = new String(
      java.util.Base64.getDecoder.decode(p1.continuationToken.get), "UTF-8")
    val pin = graft.json.Json.parse(tok).get("pin").asText()
    val snap = svc.sortedSnapshot(pin, q)
    assert(svc.sortedSnapshot(pin, q) eq snap)
    // ...and a follow-up page's plan is offset+limit over the checkpointed
    // blocks: no Sort, no Exchange, no re-scan of the source parquet
    val pagePlan = snap.offset(10).limit(11).queryExecution.executedPlan.toString
    assert(!pagePlan.contains("Sort"), s"page re-sorts:\n$pagePlan")
    assert(!pagePlan.contains("FileScan"), s"page re-scans the source:\n$pagePlan")
    val p2 = svc.query(q, maxItemsPerPage = 10, p1.continuationToken)
    assert(p2.rows.size == 10 && p2.rows.toSet.intersect(p1.rows.toSet).isEmpty)
  }

  test("twin point lookup pushes dt_id to the scan") {
    val g = graft.graph.GraphViews.graph(spark, sf)
    val p = g.twinById("N3").queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("dt_id"),
      s"dt_id filter not pushed:\n$p")
  }

  test("NOT EXISTS plans as an anti join (no fan-out, single pass)") {
    val p = plan("q_cypher_not_exists")
    assert(p.contains("LeftAnti"), s"expected anti join:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("WITH aggregation keeps map-side partial aggregation") {
    val p = plan("q_cypher_with_agg")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final aggregate pair:\n$p")
  }

  test("IS_OF_MODEL prunes model_id partitions on the GraphStore layout") {
    // The $model btree of the reference (GraphInitialization.cs:13-39)
    // becomes partition pruning here: an IS_OF_MODEL family filter over a
    // model_id-partitioned store must reach the scan as a PartitionFilter
    // (directories never read), not a post-scan Filter.
    val dir = java.nio.file.Files.createTempDirectory("graft-prune").toString
    val g = graft.graph.GraphViews.graph(spark, sf)
    graft.store.GraphStore.write(g, dir)
    val stored = graft.store.GraphStore.read(spark, dir)

    // direct API path
    val p1 = stored.ofModel(graft.graph.GraphViews.Nation, exact = true)
      .queryExecution.executedPlan.toString
    assert(p1.contains("PartitionFilters") && p1.contains("model_id"),
      s"exact ofModel must prune partitions:\n$p1")

    // through the ADT query language (IS_OF_MODEL closure → isin literal)
    val p2 = new graft.adt.AdtPlanner(stored)
      .run("SELECT COUNT() FROM DIGITALTWINS WHERE IS_OF_MODEL('dtmi:graft:Nation;1')")
      .queryExecution.executedPlan.toString
    val pf = p2.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("model_id") && pf.contains("dtmi:graft:Nation;1"),
      s"IS_OF_MODEL family filter must become a partition filter:\n$p2")
  }

  test("OPTIONAL MATCH scoped WHERE stays ONE left-outer join, no post-filter fan-out") {
    val p = plan("q_cypher_opt_where")
    // the scoped predicate must live in the join condition: exactly one
    // outer join, no Filter above it that would drop null-extended rows
    assert("LeftOuter".r.findAllIn(p).size == 1,
      s"expected exactly one left-outer join:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("curation composes in one plan: no cartesian, aggregations stay partial") {
    val p = plan("q_pipeline_curate")
    assert(!p.contains("CartesianProduct"), s"curation must stay keyed:\n$p")
    // survivor election + langid argmax both keep map-side combine
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      s"expected partial+final aggregate pairs:\n$p")
    // the language dictionary is tiny and must broadcast, never shuffle
    assert(p.contains("BroadcastHashJoin"),
      s"marker dictionary join must broadcast:\n$p")
  }

  test("WITH ... ORDER BY ... LIMIT plans as top-k, not a global sort") {
    val p = plan("q_cypher_with_topk")
    assert(p.contains("TakeOrderedAndProject"),
      s"a sorted+limited horizon must plan as TakeOrdered:\n$p")
  }

  test("Cypher arithmetic filter stays inside one scan stage (no extra exchange)") {
    val p = plan("q_cypher_arith")
    // filter + projection over one table: zero joins, shuffles only for
    // the output sort
    assert(!p.contains("Join"), s"single-table arithmetic grew a join:\n$p")
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 2, s"arithmetic filter must not add shuffles:\n$p")
  }

  test("dup-span coverage: sid equi-join only, partial aggregation kept") {
    val p = plan("q_text_dupspan")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"df-count join must meet through the sid equi-join:\n$p")
    // document-frequency count + per-doc rollup each keep map-side partials
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      s"expected partial+final aggregate pairs:\n$p")
  }

  test("repetition stats: aggregation chains, no window, no cartesian") {
    val p = plan("q_text_repetition")
    assert(!p.contains("Window"),
      s"repetition signals must not use window functions (global sort per doc):\n$p")
    assert(!p.contains("CartesianProduct"), s"no pair enumeration:\n$p")
    assert(p.contains("partial_"),
      s"token/bigram counts must partially aggregate map-side:\n$p")
  }

  test("redaction is a pure projection: zero shuffles besides the output sort") {
    val p = plan("q_pipeline_redact")
    assert(!p.contains("Join") && !p.contains("Window"),
      s"redaction must stay a scan-speed projection:\n$p")
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 1, s"redaction must not shuffle (sort excepted):\n$p")
  }

  test("contamination: bench shingle set broadcasts, corpus never self-joins") {
    val p = plan("q_pipeline_contamination")
    assert(!p.contains("CartesianProduct"), s"no all-pairs stage:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the eval-set shingle ids must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the 100 TB corpus side must never shuffle into a join:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"the per-doc overlap count must keep its map-side partial:\n$p")
  }

  test("mix: rates broadcast; the corpus is filtered, never shuffled") {
    val p = plan("q_pipeline_mix")
    assert(p.contains("BroadcastHashJoin"),
      s"the #sources rate table must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"membership must stay a per-row filter:\n$p")
  }

  test("pack: every big-side window is bucket-partitioned, offsets broadcast") {
    val p = plan("q_pipeline_pack")
    assert(!p.contains("CartesianProduct"), s"no all-pairs stage:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the 256-row offset table must broadcast:\n$p")
    // the corpus-side running sum must carry the __bucket partition spec
    // so the big side never funnels through a single-partition sort (the
    // only global window allowed is the 256-row offsets cumulation)
    assert(p.contains("windowspecdefinition(__bucket"),
      s"the corpus-side running sum must partition by bucket:\n$p")
  }

  test("shortestPath interiors: enumeration joins stay equi-joins") {
    val p = plan("q_cypher_shortest_paths")
    assert(!p.contains("CartesianProduct"),
      s"trail expansion must equi-join frontier to edges:\n$p")
  }

  test("as-of join: tagged union + window, never a nested-loop range join") {
    val p = plan("q_asof_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"the t2<=t1 predicate must not plan as a nested loop:\n$p")
    assert(p.contains("Union"), s"expected the tagged union:\n$p")
    assert(p.contains("windowspecdefinition(user_id"),
      s"the carry-forward must be one per-key window:\n$p")
  }

  test("range join: equi-join on (key, bin) with containment post-filter") {
    val p = plan("q_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"the interval predicate must meet through the bin equi-join:\n$p")
  }

  test("sessionize and kmv: one shuffle family each, partial agg kept") {
    val ps = plan("q_sessionize")
    assert(!ps.contains("Join"), s"sessionization must not self-join:\n$ps")
    assert(ps.contains("windowspecdefinition(user_id"),
      s"session numbering is a per-key window:\n$ps")
    val pk = plan("q_sketch_kmv")
    // the bounded Aggregator must keep its map-side partial
    assert("ObjectHashAggregate|SortAggregate|HashAggregate".r
      .findAllIn(pk).size >= 2, s"kmv must partial-aggregate:\n$pk")
  }

  test("co-bucketed graph layout: the hop join runs with no Exchange on bucketed sides") {
    // The q_b4_single_hop shape over GraphStore.writeBucketedTables output:
    // twins bucketed on dt_id, relationships on source_id, equal bucket
    // counts — EnsureRequirements must find both sides of the src⋈rels
    // join (and the dst side of the second join) already co-partitioned.
    // Broadcast is disabled so the assertion sees the shuffle decision a
    // 100-TB twin table would face, not the sf0.001 broadcast shortcut.
    val loc = java.nio.file.Files.createTempDirectory("graft-bucketed").toString
    val g = graft.graph.GraphViews.graph(spark, sf)
    graft.store.GraphStore.writeBucketedTables(g, "bucketed_spec", buckets = 4,
      Some(loc))
    val stored = graft.store.GraphStore.readBucketedTables(spark, "bucketed_spec")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = stored.hop(Seq("located_in")).queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"with broadcast off the hop must be a partitioned join:\n$p")
      // unbucketed parquet pays 4 Exchanges here (both sides of src⋈rels,
      // both sides of ⋈dst); the bucketed layout leaves only the re-key of
      // the first join's output onto target_id for the dst join
      val exchanges = "Exchange".r.findAllIn(p).size
      assert(exchanges <= 1,
        s"bucketed hop must elide the src/rels/dst-side shuffles, got $exchanges:\n$p")
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("bloom semi-join: probe-side bitset filter before the join, no BNLJ") {
    val p = plan("q_bloom_semijoin")
    // the membership test (element_at on the words literal) must sit in a
    // probe-side Filter — definitely-absent rows die before any exchange
    assert(p.contains("element_at"),
      s"bloom pre-filter missing from the probe side:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"residual must finish as a hash semi-join:\n$p")
    assert(p.contains("LeftSemi"), s"exactness comes from the real semi-join:\n$p")
  }

  test("triangles: wedge and closing joins stay equi-joined, no adjacency collect") {
    val p = plan("q_graph_triangles")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"degree-oriented counting must equi-join:\n$p")
    assert(!p.contains("collect_list") && !p.contains("collect_set"),
      "no per-node adjacency list (hub-node task overflow)")
  }

  test("k-core: peeling rounds are semi-joins + partial-aggregated counts") {
    // the gate's result is a per-round checkpoint (Scan ExistingRDD), so
    // assert on the actual round plan the loop materializes
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val e = (1L to 40L).map(i => (i, i % 10 + 100L)).toDF("src", "dst")
    val sym = graft.graph.KCore.symmetricView(e, "src", "dst")
    val nodes = sym.select(col("u").as("node")).distinct()
    val p = graft.graph.KCore.peelRound(sym, nodes, 3)
      .queryExecution.executedPlan.toString
    assert(p.contains("LeftSemi"), s"survivor restriction must semi-join:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(p.contains("partial_count") || p.contains("partial count"),
      s"degree count must keep map-side combine:\n$p")
  }

  test("skew join: hot list broadcasts; no nested-loop anywhere") {
    val p = plan("q_skew_join")
    assert(p.contains("BroadcastHashJoin"), s"hot split must broadcast:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), s"salted path must equi-join:\n$p")
  }

  test("unigram LM: df join is an equi-join; rollup keeps partial aggregation") {
    val p = plan("q_text_unigramlm")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(p.contains("partial_count") || p.contains("partial count"),
      s"per-doc rollup must keep map-side combine:\n$p")
  }

  test("wordpiece: pure projection over the scan — no shuffle before the sort") {
    val p = plan("q_text_wordpiece")
    // one Exchange allowed: the deterministic output orderBy
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 1, s"tokenization must not shuffle:\n$p")
    assert(p.contains("wordpiece"), s"native kernel missing from the plan:\n$p")
  }

  test("span removal: sid/position equi-joins only, no pair stage") {
    val p = plan("q_span_dedup")
    assert(!p.contains("CartesianProduct"), s"pair enumeration appeared:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested loop appeared:\n$p")
    assert(p.contains("partial_count") || p.contains("partial count"),
      s"the duplicate-sid count must map-side combine:\n$p")
  }

  test("keep-best survivor: winner pick is a CLUSTER-partitioned window") {
    val p = plan("q_dedup_keepbest")
    assert(!p.contains("CartesianProduct"), s"cartesian appeared:\n$p")
    // row_number must be partitioned by the cluster key — an empty window
    // partition spec would collapse the corpus onto one task
    assert(p.contains("windowspecdefinition(component"),
      s"window must partition by component:\n$p")
  }

  test("weighted sampling is a per-row filter: zero hash shuffles") {
    val p = plan("q_pipeline_weighted")
    assert(!p.contains("Exchange hashpartitioning"),
      s"thinning must not shuffle (only the output sort may range-partition):\n$p")
  }

  test("random walks: every step is an equi-join — no cartesian, no nested loop") {
    // the O(1)-per-step claim: the pick joins (node, idx) against the
    // indexed adjacency; a BNLJ/cartesian would mean the argmin shape
    // (O(degree) per step) sneaked back in
    val p = plan("q_graph_walks")
    assert(!p.contains("CartesianProduct"), s"cartesian appeared:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested loop appeared:\n$p")
  }

  test("heavy hitters: one partial-aggregated pass, no shuffle of raw rows") {
    val p = plan("q_sketch_heavyhitters")
    // typed MG Aggregator must combine map-side (ObjectHashAggregate
    // partial) so only sketches cross the exchange
    assert(p.contains("ObjectHashAggregate"),
      s"MG must aggregate as an object buffer:\n$p")
    assert(p.contains("partial_misragries"), s"map-side combine missing:\n$p")
  }

  test("histogram quantiles: single scan, bucket counts partial-aggregated") {
    val df = graft.operators.Stats.decHistQuantiles(
      graft.core.Td.lineitem(spark, sf), "l_extendedprice", Seq(5000L))
    // the operator runs its jobs eagerly; assert the bucket-count shape
    // on a fresh frame with the same expression
    val buckets = graft.core.Td.lineitem(spark, sf)
      .selectExpr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c")
      .selectExpr("c", "CAST(power(10, greatest(length(CAST(c AS STRING)) - 3, 0)) AS BIGINT) AS divd")
      .groupBy(org.apache.spark.sql.functions.expr("(c div divd) * divd").as("lo_c"))
      .count()
    val p = buckets.queryExecution.executedPlan.toString
    assert(p.contains("HashAggregate") && p.contains("partial_count"),
      s"bucket counts must combine map-side:\n$p")
    assert(df.count() == 1L)
  }

  test("q_pipeline_dsir: bucket-weight table broadcasts, counts combine map-side") {
    val p = plan("q_pipeline_dsir")
    assert(p.contains("BroadcastHashJoin"),
      s"the <=256-row weight table must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"no all-pairs stage:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"bucket counts must combine map-side:\n$p")
  }

  test("q_graph_lpa: every round is equi-join + combinable aggregate") {
    val p = plan("q_graph_lpa")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"vote rounds must stay equi-joins:\n$p")
    // the argmax is one min-of-struct aggregate, never a window sort
    assert(!p.contains("Window"), s"no per-node window sort:\n$p")
  }

  test("q_sim_recall_sweep: recall monotone in nprobe; full probe+shortlist is exact") {
    val rows = SparkEntry.queries("q_sim_recall_sweep")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(3))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1, 2, 4, 8))
    assert(rows.toSeq.sliding(2).forall(p => p(0)._2 <= p(1)._2),
      s"recall@5 must be monotone non-decreasing in nprobe: ${rows.toSeq}")
    // the quality dial closes: probing every cell with a shortlist wider
    // than the corpus degenerates IVF+PQ to exact search — recall 1.0
    import org.apache.spark.sql.functions._
    val emb = graft.core.Td.embeddings(spark, sf)
    val cb = graft.pipeline.Similarity.pqCodebook(emb, "vec_id", "embedding",
      dim = 64, m = 16, size = 32)
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cell_id"), col("embedding").as("cell_vec"))
    val queries = emb.filter(col("vec_id") < 10)
    val n = emb.count().toInt
    val full = graft.pipeline.Similarity.ivfpqTopK(queries, emb, cents, cb,
      "vec_id", "embedding", k = 5, dim = 64, m = 16, nprobe = 8,
      rerank = n / 5 + 1).select(col("q_id"), col("n_id"))
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("d2"), col("n_id"))
    val exact = emb.select(col("vec_id").as("n_id"), col("embedding").as("n_vec"))
      .crossJoin(broadcast(q)).filter(col("q_id") =!= col("n_id"))
      .withColumn("d2",
        graft.pipeline.Similarity.l2sq(col("q_vec"), col("n_vec")))
      .withColumn("rank", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rank") <= 5).select(col("q_id"), col("n_id"))
    val nExact = exact.count()
    val nHit = exact.join(full, Seq("q_id", "n_id")).count()
    assert(nHit == nExact,
      s"full-width IVF+PQ must recover the exact top-5: $nHit/$nExact")
  }

  test("phashNearDup: banded candidates via equi-join, no all-pairs stage") {
    import spark.implicits._
    val media = (1L to 6L).map(i =>
        (i, graft.pipeline.Multimodal.pngFixture(8 + i.toInt, 8 + i.toInt)))
      .toDF("media_id", "content")
    val p = graft.pipeline.Multimodal.phashNearDup(media, maxHamming = 2)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"banded LSH must propose candidates by equi-join:\n$p")
  }

  // The iterative graph operators checkpoint per round, so their gate
  // plans collapse to LogicalRDD unions — assert the ROUND plans on
  // representative frames built with the operators' exact join shapes.

  test("scc round: min-label propagation is an equi-join + partial-aggregated min") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
      .localCheckpoint(true)
    val lab = Seq(("a", "a"), ("b", "b"), ("c", "c")).toDF("node", "lab")
      .localCheckpoint(true)
    val round = lab.join(edges, lab("node") === edges("src"))
      .select(edges("dst").as("node"), lab("lab").as("lab"))
      .unionByName(lab)
      .groupBy(col("node")).agg(min(col("lab")).as("lab"))
    val p = round.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"round must equi-join:\n$p")
    assert(p.contains("partial_min"), s"min must combine map-side:\n$p")
  }

  test("betweenness rounds: BFS sigma and backward delta combine map-side, no cartesian") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val e = Seq(("a", "b"), ("b", "c")).toDF("a", "b").localCheckpoint(true)
    val frontier = Seq(("s1", "a", 1L)).toDF("s", "node", "sigma")
      .localCheckpoint(true)
    val bfs = frontier.join(e, frontier("node") === e("a"))
      .select(col("s"), e("b").as("node"), col("sigma"))
      .groupBy(col("s"), col("node")).agg(sum(col("sigma")).as("sigma"))
    val pb = bfs.queryExecution.executedPlan.toString
    assert(!pb.contains("CartesianProduct") &&
      !pb.contains("BroadcastNestedLoopJoin"), s"BFS round:\n$pb")
    assert(pb.contains("partial_sum"), s"sigma must combine map-side:\n$pb")
    val lw = Seq(("s1", "b", 1L, 0L)).toDF("s", "w", "sw", "dw")
      .localCheckpoint(true)
    val back = Seq(("s1", "a", 1L)).toDF("vs", "v", "sv").localCheckpoint(true)
      .join(e, col("v") === e("a"))
      .join(lw, e("b") === lw("w") && col("vs") === lw("s"))
      .select(col("vs"), col("v"),
        expr("(sv * (1000000 + dw)) div sw").as("term"))
      .groupBy(col("vs").as("s"), col("v").as("node"))
      .agg(sum(col("term")).as("delta"))
    val pd = back.queryExecution.executedPlan.toString
    assert(!pd.contains("CartesianProduct") &&
      !pd.contains("BroadcastNestedLoopJoin"), s"backward round:\n$pd")
    assert(pd.contains("partial_sum"), s"delta must combine map-side:\n$pd")
  }

  test("node2vec step: cumulative-range pick stays a (prev,cur) equi-join") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val trans = Seq(("a", "b", "c", 0L, 2L, 4L))
      .toDF("t_prev", "t_cur", "t_nxt", "cum_lo", "cum_hi", "total")
      .localCheckpoint(true)
    val drawn = Seq(("w0", "a", "b", 1L)).toDF("walk_id", "prev", "node", "r")
      .localCheckpoint(true)
    val pick = drawn.join(trans,
      col("prev") === col("t_prev") && col("node") === col("t_cur") &&
        col("r") >= col("cum_lo") && col("r") < col("cum_hi"))
      .select(col("walk_id"), col("t_nxt").as("node"))
    val p = pick.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"the range condition must ride an equi-join, not a nested loop:\n$p")
  }
}
