package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.GraphViews

/** Graph operators (SURVEY §2.A scans/lookups, §2.B joins, §2.C C1) driven
  * through the TwinGraph API over the derived place-graph (GraphViews).
  * Each oracle reconstructs the same derivation in plain SQL over the raw
  * parquet tables.
  */
object GraphQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A1 twin scan + B1 projection + B9 count-by-model.
    "q_a1_twin_scan" -> ((s, d) => {
      GraphViews.graph(s, d).twins
        .groupBy(col("model_id")).agg(count(lit(1)).as("n"))
        .orderBy(col("model_id"))
    }),

    // A2 relationship scan grouped by edge label.
    "q_a2_rel_scan" -> ((s, d) => {
      GraphViews.graph(s, d).relationships
        .groupBy(col("relationship_name")).agg(count(lit(1)).as("n"))
        .orderBy(col("relationship_name"))
    }),

    // A3 twin point lookup by primary key (the GET /digitaltwins/{id}
    // read path over the columnar layout; pushdown plan-asserted in spec).
    "q_a3_twin_lookup" -> ((s, d) => {
      GraphViews.graph(s, d).twinById("N3")
        .select(col("dt_id"), col("model_id"))
    }),

    // A4 relationship point lookup by (source, relationship id) — the
    // GET /digitaltwins/{id}/relationships/{relationshipId} read path;
    // pushdown is plan-asserted in spec, the VALUE is oracle-checked here.
    "q_a4_rel_lookup" -> ((s, d) => {
      GraphViews.graph(s, d).relationshipById("N3", "N3-R3")
        .select(col("relationship_id"), col("source_id"), col("target_id"),
          col("relationship_name"))
    }),

    // A3/A5 point lookup + outgoing edges of one twin.
    "q_a5_outgoing" -> ((s, d) => {
      GraphViews.graph(s, d).outgoing("N0")
        .select(col("relationship_id"), col("relationship_name"), col("target_id"))
        .orderBy(col("relationship_id"))
    }),

    // A6 incoming edge count of one twin (all customers+suppliers of N3).
    "q_a6_incoming" -> ((s, d) => {
      GraphViews.graph(s, d).incoming("N3")
        .groupBy(col("relationship_name")).agg(count(lit(1)).as("n"))
        .orderBy(col("relationship_name"))
    }),

    // Fixed-iteration integer PageRank over the relationship graph — the
    // link-quality curation signal (SURVEY §2.F), bit-exact vs the oracle
    // because all arithmetic is order-independent integer micro-units.
    "q_graph_pagerank" -> ((s, d) => {
      graft.graph.PageRank.ranks(
        GraphViews.graph(s, d).relationships, iterations = 3)
        .orderBy(col("node"))
    }),

    // B4 single-hop MATCH (src)-[r:located_in]->(dst): members per nation.
    "q_b4_single_hop" -> ((s, d) => {
      GraphViews.graph(s, d).hop(Seq("located_in"))
        .groupBy(col("dst_dt_id"), col("src_model_id"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("dst_dt_id"), col("src_model_id"))
    }),

    // B6 multi-label edge disjunction -[r:in_region|located_in]-> : a plain
    // IN filter on the relationship_name column.
    "q_b6_multi_label" -> ((s, d) => {
      GraphViews.graph(s, d).hop(Seq("in_region", "located_in"))
        .groupBy(col("rel_relationship_name"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("rel_relationship_name"))
    }),

    // B17 bounded neighborhood expansion (deterministic: sorted before limit).
    "q_b17_neighborhood" -> ((s, d) => {
      GraphViews.graph(s, d).neighborhood("N3", limit = Int.MaxValue)
        .orderBy(col("relationship_id")).limit(50)
    }),

    // Degree statistics: per-twin out/in/total degree, isolated twins
    // report zero — the hub-detection / skew-planning query.
    "q_graph_degrees" -> ((s, d) => {
      GraphViews.graph(s, d).degrees().orderBy(col("dt_id"))
    }),

    // Semantic model search (Models.cs:883-931): rank models by L2
    // distance between their stored embedding and a query vector, with a
    // lexical needle filtering first. Fixed-point squared distance (the
    // embeddings are dyadic rationals, exact in binary64 on any engine).
    "q_model_semantic" -> ((s, d) => {
      GraphViews.graph(s, d)
        .searchModelsSemantic(None, Seq(2.5, 0.5, 0.25), limit = 4)
        .select(col("id"),
          floor(col("l2sq") * 10000 + lit(0.5)).cast("long").as("dist_fp"))
    }),

    // C1 IS_OF_MODEL with inheritance: Nation + its descendants
    // (Customer, Supplier) — broadcast closure membership.
    "q_c1_is_of_model" -> ((s, d) => {
      GraphViews.graph(s, d).ofModel(GraphViews.Nation)
        .groupBy(col("model_id")).agg(count(lit(1)).as("n"))
        .orderBy(col("model_id"))
    }),

    // C1 exact variant.
    "q_c1_is_of_model_exact" -> ((s, d) => {
      GraphViews.graph(s, d).ofModel(GraphViews.Nation, exact = true)
        .select(col("dt_id")).orderBy(col("dt_id"))
    }),

    // B7 bounded variable-length path: C -located_in-> N -in_region-> R at
    // depth 2 = customers per region; depth histogram output.
    "q_b7_vle" -> ((s, d) => {
      GraphViews.graph(s, d).expand(None, max = 2)
        .groupBy(col("depth")).agg(count(lit(1)).as("n"))
        .orderBy(col("depth"))
    }),

    // B7 UNBOUNDED variable-length path `-[*]` (reference accepts the bare
    // star pass-through, Query.cs:122-129): run-to-fixpoint reachability
    // over a graph that is deliberately CYCLIC — a directed ring per
    // region over the nation table — so termination comes from the
    // visited-set anti-join emptying the frontier, never from a depth cap.
    // Output: minimal-depth histogram (ring of size m ⇒ depths 1..m, m
    // pairs each; the self-pair closes the cycle at depth m).
    "q_b7_vle_unbounded" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("n_regionkey")).orderBy(col("n_nationkey"))
      val ring = graft.core.Td.nation(s, d)
        .select(col("n_regionkey"), col("n_nationkey"))
        .withColumn("nxt", lead(col("n_nationkey"), 1).over(w))
        .withColumn("wrap", first(col("n_nationkey")).over(w))
        .select(
          concat(lit("N"), col("n_nationkey")).as("source_id"),
          concat(lit("N"), coalesce(col("nxt"), col("wrap"))).as("target_id"),
          lit("ring").as("relationship_name"))
      graft.graph.Vle.reachability(ring, maxIter = Int.MaxValue)
        .groupBy(col("depth")).agg(count(lit(1)).as("n"))
        .orderBy(col("depth"))
    }),

    // Per-node triangle counts on the part co-purchase graph (parts that
    // share an order, high-quantity lines only — keeps the graph sparse
    // enough for a 3-way SQL oracle while still forming real triangles).
    // Output is the triangles-per-node histogram; the place-graph itself
    // is triangle-free by construction, hence the derived graph.
    "q_graph_triangles" -> ((s, d) => {
      val li = graft.core.Td.lineitem(s, d)
        .filter(col("l_quantity") >= 30)
        .select(col("l_orderkey").as("ok"), col("l_partkey"))
      val edges = li.select(col("ok"), col("l_partkey").as("p1"))
        .join(li.select(col("ok"), col("l_partkey").as("p2")), Seq("ok"))
        .filter(col("p1") < col("p2"))
        .select(col("p1").as("src"), col("p2").as("dst"))
      graft.graph.Triangles.perNode(edges, "src", "dst")
        .groupBy(col("triangles")).agg(count(lit(1)).as("n_nodes"))
        .orderBy(col("triangles"))
    }),

    // Link prediction: Jaccard-of-neighborhoods on the co-purchase graph
    // — candidate pairs come only from wedge joins through shared
    // neighbors (two equi-joins on the center node), never an all-pairs
    // product; integer fixed-point score.
    "q_graph_linkpred" -> ((s, d) => {
      val li = graft.core.Td.lineitem(s, d)
        .filter(col("l_quantity") >= 30)
        .select(col("l_orderkey").as("ok"), col("l_partkey"))
      val edges = li.select(col("ok"), col("l_partkey").as("p1"))
        .join(li.select(col("ok"), col("l_partkey").as("p2")), Seq("ok"))
        .filter(col("p1") < col("p2"))
        .select(col("p1").as("src"), col("p2").as("dst"))
      graft.graph.LinkPrediction.jaccardNeighbors(edges, "src", "dst",
        minCommon = 2L)
        .orderBy(col("node_a"), col("node_b"))
    }),

    // k-core peeling (3 fixed rounds at k=15) on the same co-purchase
    // graph — the cohesion filter; fixed rounds for oracle parity, the
    // PageRank unrolling discipline (aggregates can't live in a
    // recursive CTE term).
    "q_graph_kcore" -> ((s, d) => {
      val li = graft.core.Td.lineitem(s, d)
        .filter(col("l_quantity") >= 30)
        .select(col("l_orderkey").as("ok"), col("l_partkey"))
      val edges = li.select(col("ok"), col("l_partkey").as("p1"))
        .join(li.select(col("ok"), col("l_partkey").as("p2")), Seq("ok"))
        .filter(col("p1") < col("p2"))
        .select(col("p1").as("src"), col("p2").as("dst"))
      graft.graph.KCore.peel(edges, "src", "dst", k = 15, rounds = 3)
        .orderBy(col("node"))
    }),

    // Referential-integrity audit: dangling endpoints / duplicate ids /
    // self-loops — the DETACH-DELETE invariants, as one metric table.
    "q_graph_integrity" -> ((s, d) => {
      GraphViews.graph(s, d).integrityReport().orderBy(col("metric"))
    }),

    // Deterministic DeepWalk corpus over the undirected place graph —
    // O(1) work per walk-step (indexed-adjacency pick, never a
    // per-neighbor argmin); the oracle replays the identical md5-nibble
    // arithmetic step by step.
    "q_graph_walks" -> ((s, d) => {
      graft.graph.RandomWalk.walks(
          GraphViews.graph(s, d).relationships, length = 4)
        .orderBy(col("walk_id"), col("step"))
    }),

    // Skip-gram (center, context) pair counts from the same walks —
    // the node2vec-style training-pair extraction (window 2).
    "q_graph_walk_pairs" -> ((s, d) => {
      val w = graft.graph.RandomWalk.walks(
        GraphViews.graph(s, d).relationships, length = 4)
      graft.graph.RandomWalk.skipGramPairs(w, window = 2)
        .orderBy(col("center"), col("context"))
    }),

    // Composition: the node-embedding corpus end-to-end — walks →
    // skip-gram pairs → typed summary (pair counts by the model pair of
    // the endpoints), i.e. the sanity profile a training run reads
    // before consuming the pair corpus.
    "q_graph_embed_corpus" -> ((s, d) => {
      val g = GraphViews.graph(s, d)
      val w = graft.graph.RandomWalk.walks(g.relationships, length = 4)
      val pairs = graft.graph.RandomWalk.skipGramPairs(w, window = 2)
      val models = g.twins.select(col("dt_id"), col("model_id"))
      pairs
        .join(models.select(col("dt_id").as("center"),
          col("model_id").as("center_model")), Seq("center"))
        .join(models.select(col("dt_id").as("context"),
          col("model_id").as("context_model")), Seq("context"))
        .groupBy(col("center_model"), col("context_model"))
        .agg(sum(col("n")).as("n_pairs"))
        .orderBy(col("center_model"), col("context_model"))
    }),

    // HITS hub/authority scores (2 synchronous rounds, integer
    // micro-units, overflow-safe two-step normalization) on the directed
    // place graph — customers/suppliers are hubs, nations/regions are
    // authorities.
    "q_graph_hits" -> ((s, d) => {
      graft.graph.Hits.scores(
          GraphViews.graph(s, d).relationships, iterations = 2)
        .orderBy(col("node"))
    }),

    // Weighted single-source shortest paths (bounded Bellman-Ford, 6
    // relaxation rounds ≥ the place-forest diameter) from region R0;
    // id-derived integer weights so the oracle rebuilds the same graph.
    "q_graph_sssp" -> ((s, d) => {
      graft.graph.Sssp.distances(
          GraphViews.graph(s, d).relationships, source = "R0", rounds = 6)
        .orderBy(col("node"))
    }),

    // Label-propagation communities: 3 deterministic mode-label rounds
    // (most frequent neighbor label, min-value tie-break) over the
    // undirected place graph — the dense-core split one level past
    // connected components; the oracle replays each round in SQL.
    "q_graph_lpa" -> ((s, d) => {
      graft.graph.LabelPropagation.communities(
          GraphViews.graph(s, d).relationships, rounds = 3)
        .orderBy(col("node"))
    }),

    // Personalized PageRank from region seeds over the REVERSED place
    // graph (trust flows root→leaf; the forward graph would strand all
    // teleport mass at the sink regions) — the TrustRank curation
    // pattern, integer micro-units, oracle replays every round.
    "q_graph_ppr" -> ((s, d) => {
      val rels = GraphViews.graph(s, d).relationships
        .select(col("target_id").as("source_id"),
          col("source_id").as("target_id"))
      graft.graph.PageRank.personalizedRanks(rels, Seq("R0", "R1"),
          iterations = 3)
        .orderBy(col("node"))
    }),

    // Strongly connected components (FW-BW-Trim coloring, Scc.scala)
    // over a deterministic digraph: each nation's suppliers chopped
    // into rings of <=5 (the SCCs), plus a one-way star from supplier
    // S1 to every ring's lex-min member — cross edges that exercise
    // the peel (S1's ring resolves pass 1, the rest pass 2) without
    // changing the component structure. scc = lex-min member id.
    "q_graph_scc" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val sup = graft.core.Td.supplier(s, d)
        .select(col("s_suppkey"), col("s_nationkey"))
      val w = Window.partitionBy(col("s_nationkey")).orderBy(col("s_suppkey"))
      val grouped = sup.withColumn("grp",
        floor((row_number().over(w) - lit(1)) / lit(5.0)).cast("long"))
      val gw = Window.partitionBy(col("s_nationkey"), col("grp"))
        .orderBy(col("s_suppkey"))
      val ring = grouped
        .withColumn("nxt", lead(col("s_suppkey"), 1).over(gw))
        .withColumn("wrap", first(col("s_suppkey")).over(gw))
        .select(concat(lit("S"), col("s_suppkey")).as("src"),
          concat(lit("S"), coalesce(col("nxt"), col("wrap"))).as("dst"))
      val star = grouped.groupBy(col("s_nationkey"), col("grp"))
        .agg(min(concat(lit("S"), col("s_suppkey"))).as("dst"))
        .select(lit("S1").as("src"), col("dst"))
      graft.graph.Scc.components(ring.unionByName(star))
        .select(col("node").as("node_id"), col("scc"))
        .orderBy(col("node_id"))
    }),

    // Weakly connected components over the full twin graph view — the
    // C→N→R / S→N topology makes each region's closure one component,
    // so the oracle is structural (min lex member per region) while the
    // engine runs the real star-contraction operator over ~16k nodes.
    "q_graph_wcc" -> ((s, d) => {
      GraphViews.graph(s, d).components()
        .select(col("dt_id").as("node_id"), col("component"))
        .orderBy(col("node_id"))
    }),

    // K-source Brandes betweenness (Betweenness.scala) over the nation
    // ring + region-attachment graph: rich sigma counts (ring chords
    // through shared regions create multiple equal shortest paths), 5
    // sampled sources, eccentricity 4 — the oracle replays the same
    // integer micro-unit dependency accumulation unrolled per depth.
    "q_graph_betweenness" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy(col("n_nationkey"))
      val nat = graft.core.Td.nation(s, d)
        .select(col("n_nationkey"), col("n_regionkey"))
      val ring = nat
        .withColumn("nxt", lead(col("n_nationkey"), 1).over(w))
        .withColumn("wrap", first(col("n_nationkey")).over(w))
        .select(concat(lit("N"), col("n_nationkey")).as("source_id"),
          concat(lit("N"), coalesce(col("nxt"), col("wrap"))).as("target_id"))
      val reg = nat.select(
        concat(lit("N"), col("n_nationkey")).as("source_id"),
        concat(lit("R"), col("n_regionkey")).as("target_id"))
      graft.graph.Betweenness.centrality(ring.unionByName(reg),
          Seq("N0", "N5", "N10", "N15", "N20"), maxDepth = 8)
        .orderBy(col("node"))
    }),

    // K-source harmonic centrality over the same fixture — inverse-
    // distance sums in micro-units, robust to disconnection.
    "q_graph_harmonic" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy(col("n_nationkey"))
      val nat = graft.core.Td.nation(s, d)
        .select(col("n_nationkey"), col("n_regionkey"))
      val ring = nat
        .withColumn("nxt", lead(col("n_nationkey"), 1).over(w))
        .withColumn("wrap", first(col("n_nationkey")).over(w))
        .select(concat(lit("N"), col("n_nationkey")).as("source_id"),
          concat(lit("N"), coalesce(col("nxt"), col("wrap"))).as("target_id"))
      val reg = nat.select(
        concat(lit("N"), col("n_nationkey")).as("source_id"),
        concat(lit("R"), col("n_regionkey")).as("target_id"))
      graft.graph.Betweenness.harmonic(ring.unionByName(reg),
          Seq("N0", "N5", "N10", "N15", "N20"), maxDepth = 8)
        .orderBy(col("node"))
    }),

    // Sampled approximate betweenness — the at-scale estimator (nobody
    // runs all-sources Brandes on 100 TB): 8 deterministic hash-ranked
    // sources, dependencies scaled by n/k (Brandes-Pich). The oracle
    // replays the same accumulation from the same md5-ranked sample,
    // unrolled past the true eccentricity (deeper empty frontiers
    // contribute zero), so the estimate itself is hash-verified.
    "q_graph_betweenness_approx" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy(col("n_nationkey"))
      val nat = graft.core.Td.nation(s, d)
        .select(col("n_nationkey"), col("n_regionkey"))
      val ring = nat
        .withColumn("nxt", lead(col("n_nationkey"), 1).over(w))
        .withColumn("wrap", first(col("n_nationkey")).over(w))
        .select(concat(lit("N"), col("n_nationkey")).as("source_id"),
          concat(lit("N"), coalesce(col("nxt"), col("wrap"))).as("target_id"))
      val reg = nat.select(
        concat(lit("N"), col("n_nationkey")).as("source_id"),
        concat(lit("R"), col("n_regionkey")).as("target_id"))
      graft.graph.Betweenness.approximate(ring.unionByName(reg),
          k = 8, seed = "r14", maxDepth = 8)
        .orderBy(col("node"))
    }),

    // Node2vec second-order walks (RandomWalk.node2vecWalks) over the
    // same ring + region fixture: weights (return 1, common 2, far 4) —
    // an outward q<1 bias — with the full cumulative-range pick replayed
    // in the oracle step by step.
    "q_graph_node2vec" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy(col("n_nationkey"))
      val nat = graft.core.Td.nation(s, d)
        .select(col("n_nationkey"), col("n_regionkey"))
      val ring = nat
        .withColumn("nxt", lead(col("n_nationkey"), 1).over(w))
        .withColumn("wrap", first(col("n_nationkey")).over(w))
        .select(concat(lit("N"), col("n_nationkey")).as("source_id"),
          concat(lit("N"), coalesce(col("nxt"), col("wrap"))).as("target_id"))
      val reg = nat.select(
        concat(lit("N"), col("n_nationkey")).as("source_id"),
        concat(lit("R"), col("n_regionkey")).as("target_id"))
      graft.graph.RandomWalk.node2vecWalks(ring.unionByName(reg),
          length = 4, wReturn = 1, wCommon = 2, wFar = 4)
        .orderBy(col("walk_id"), col("step"))
    }),

    // K-truss (KTruss.peel): 2 peel rounds at k=4 over the co-purchase
    // graph — the tighter-than-k-core cohesion filter; wedge equi-join +
    // combinable count per round, unrolled identically in the oracle.
    "q_graph_ktruss" -> ((s, d) => {
      val li = graft.core.Td.lineitem(s, d)
        .filter(col("l_quantity") >= 30)
        .select(col("l_orderkey").as("ok"), col("l_partkey"))
      val edges = li.select(col("ok"), col("l_partkey").as("p1"))
        .join(li.select(col("ok"), col("l_partkey").as("p2")), Seq("ok"))
        .filter(col("p1") < col("p2"))
        .select(col("p1").as("src"), col("p2").as("dst"))
      graft.graph.KTruss.peel(edges, k = 4, rounds = 2)
        .orderBy(col("a"), col("b"))
    }),

    // Luby MIS (Mis.independentSet) over the supplier-ring fixture (the
    // SCC rings without the star): deterministic md5 priorities, so the
    // oracle replays the identical round structure (2 rounds settle at
    // either scale factor; the oracle unrolls 3, the last a no-op).
    "q_graph_mis" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val sup = graft.core.Td.supplier(s, d)
        .select(col("s_suppkey"), col("s_nationkey"))
      val w = Window.partitionBy(col("s_nationkey")).orderBy(col("s_suppkey"))
      val grouped = sup.withColumn("grp",
        floor((row_number().over(w) - lit(1)) / lit(5.0)).cast("long"))
      val gw = Window.partitionBy(col("s_nationkey"), col("grp"))
        .orderBy(col("s_suppkey"))
      val ring = grouped
        .withColumn("nxt", lead(col("s_suppkey"), 1).over(gw))
        .withColumn("wrap", first(col("s_suppkey")).over(gw))
        .select(concat(lit("S"), col("s_suppkey")).as("src"),
          concat(lit("S"), coalesce(col("nxt"), col("wrap"))).as("dst"))
      graft.graph.Mis.independentSet(ring).orderBy(col("node"))
    }),

    // Weighted PageRank: rank flow proportional to the id-derived 1..8
    // integer edge weights (Sssp.weightSql — the oracle replays the
    // exact weighted multigraph).
    "q_graph_wpagerank" -> ((s, d) => {
      graft.graph.PageRank.weightedRanks(
          GraphViews.graph(s, d).relationships, iterations = 3)
        .orderBy(col("node"))
    }),

    // Per-source eccentricity + reach from the shared batched BFS —
    // sampled-diameter probe over the ring + region fixture.
    "q_graph_eccentricity" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy(col("n_nationkey"))
      val nat = graft.core.Td.nation(s, d)
        .select(col("n_nationkey"), col("n_regionkey"))
      val ring = nat
        .withColumn("nxt", lead(col("n_nationkey"), 1).over(w))
        .withColumn("wrap", first(col("n_nationkey")).over(w))
        .select(concat(lit("N"), col("n_nationkey")).as("source_id"),
          concat(lit("N"), coalesce(col("nxt"), col("wrap"))).as("target_id"))
      val reg = nat.select(
        concat(lit("N"), col("n_nationkey")).as("source_id"),
        concat(lit("R"), col("n_regionkey")).as("target_id"))
      graft.graph.Betweenness.eccentricity(ring.unionByName(reg),
          Seq("N0", "N5", "N10", "N15", "N20"), maxDepth = 8)
        .orderBy(col("source"))
    }),

    // Weighted bipartite projection (Projection.bipartite): the
    // co-purchase construction promoted to an operator — pairs through
    // shared orders only, weight = shared-order count >= 2.
    "q_graph_projection" -> ((s, d) => {
      val li = graft.core.Td.lineitem(s, d)
        .filter(col("l_quantity") >= 30)
        .select(col("l_orderkey").as("k"), col("l_partkey").as("item"))
      graft.graph.Projection.bipartite(li, "k", "item", minWeight = 2L)
        .orderBy(col("item_a"), col("item_b"))
    }),

    // Related items: top-3 co-occurrence partners per part over the
    // weight>=2 projection — the recommender shortlist composition.
    "q_graph_related" -> ((s, d) => {
      val li = graft.core.Td.lineitem(s, d)
        .filter(col("l_quantity") >= 30)
        .select(col("l_orderkey").as("k"), col("l_partkey").as("item"))
      graft.graph.Projection.relatedItems(li, "k", "item",
          k = 3, minWeight = 2L)
        .orderBy(col("item"), col("rank"))
    }),

    // Local clustering coefficient over the co-purchase graph — closed
    // wedge share per node in exact micro-units (Triangles.localClustering).
    "q_graph_clustering" -> ((s, d) => {
      val li = graft.core.Td.lineitem(s, d)
        .filter(col("l_quantity") >= 30)
        .select(col("l_orderkey").as("ok"), col("l_partkey"))
      val edges = li.select(col("ok"), col("l_partkey").as("p1"))
        .join(li.select(col("ok"), col("l_partkey").as("p2")), Seq("ok"))
        .filter(col("p1") < col("p2"))
        .select(col("p1").as("src"), col("p2").as("dst"))
      graft.graph.Triangles.localClustering(edges, "src", "dst")
        .orderBy(col("node"))
    })
  )

  // Shared SQL fragments reconstructing the graph view.
  private val twinsSql =
    """(SELECT 'R' || r_regionkey AS dt_id, 'dtmi:graft:Region;1' AS model_id FROM region
      | UNION ALL SELECT 'N' || n_nationkey, 'dtmi:graft:Nation;1' FROM nation
      | UNION ALL SELECT 'C' || c_custkey, 'dtmi:graft:Customer;1' FROM customer
      | UNION ALL SELECT 'S' || s_suppkey, 'dtmi:graft:Supplier;1' FROM supplier)""".stripMargin

  private val relsSql =
    """(SELECT 'N' || n_nationkey || '-R' || n_regionkey AS relationship_id,
      |        'N' || n_nationkey AS source_id, 'R' || n_regionkey AS target_id,
      |        'in_region' AS relationship_name FROM nation
      | UNION ALL
      | SELECT 'C' || c_custkey || '-N' || c_nationkey, 'C' || c_custkey,
      |        'N' || c_nationkey, 'located_in' FROM customer
      | UNION ALL
      | SELECT 'S' || s_suppkey || '-N' || s_nationkey, 'S' || s_suppkey,
      |        'N' || s_nationkey, 'located_in' FROM supplier)""".stripMargin

  /** Unrolled Brandes accumulation over the nation ring+region fixture,
    * parameterized on the source CTE and the final SELECT — generated
    * rather than hand-written so the approx gate can unroll PAST the true
    * eccentricity (an empty deeper frontier contributes exactly zero, so
    * extra levels keep the oracle exact instead of risking truncation). */
  private def brandesUnrolledSql(depth: Int, srcSql: String,
      select: String): String = {
    // MATERIALIZED: DuckDB inlines plain CTEs per reference, and this
    // chain references each level 2-3 times — plain CTEs expand (and
    // re-open the parquet) exponentially in depth, which at depth 6
    // exhausts the file-descriptor budget before it exhausts patience
    val sb = new StringBuilder
    sb ++= s"""WITH mm AS MATERIALIZED (SELECT count(*) AS m FROM nation),
      |ring AS MATERIALIZED (SELECT 'N' || n_nationkey AS a,
      |    'N' || ((n_nationkey + 1) % (SELECT m FROM mm)) AS b FROM nation
      |  UNION ALL SELECT 'N' || n_nationkey, 'R' || n_regionkey FROM nation),
      |sym AS MATERIALIZED (SELECT a, b FROM ring UNION SELECT b, a FROM ring),
      |allv AS MATERIALIZED (SELECT a AS node FROM sym UNION SELECT b FROM sym),
      |src AS MATERIALIZED ($srcSql),
      |f0 AS MATERIALIZED (SELECT s, s AS node, CAST(1 AS BIGINT) AS sigma FROM src),
      |v0 AS MATERIALIZED (SELECT s, node FROM f0),
      |""".stripMargin
    for (i <- 1 to depth) {
      sb ++= s"""f$i AS MATERIALIZED (SELECT f.s, e.b AS node, CAST(sum(f.sigma) AS BIGINT) AS sigma
        |  FROM f${i - 1} f JOIN sym e ON f.node = e.a
        |  WHERE NOT EXISTS (SELECT 1 FROM v${i - 1} x WHERE x.s = f.s AND x.node = e.b)
        |  GROUP BY 1, 2),
        |v$i AS MATERIALIZED (SELECT s, node FROM v${i - 1} UNION ALL SELECT s, node FROM f$i),
        |""".stripMargin
    }
    sb ++= s"d$depth AS MATERIALIZED (SELECT s, node, CAST(0 AS BIGINT) AS delta FROM f$depth),\n"
    for (i <- (depth - 1) to 1 by -1) {
      sb ++= s"""t$i AS MATERIALIZED (SELECT v.s, v.node,
        |    sum((CAST(v.sigma AS HUGEINT) * (1000000 + w.delta)) // fw.sigma) AS delta
        |  FROM f$i v JOIN sym e ON v.node = e.a
        |  JOIN f${i + 1} fw ON fw.s = v.s AND fw.node = e.b
        |  JOIN d${i + 1} w ON w.s = v.s AND w.node = e.b GROUP BY 1, 2),
        |d$i AS MATERIALIZED (SELECT v.s, v.node, CAST(coalesce(t.delta, 0) AS BIGINT) AS delta
        |  FROM f$i v LEFT JOIN t$i t ON t.s = v.s AND t.node = v.node),
        |""".stripMargin
    }
    val unions = (1 to depth)
      .map(i => s"SELECT s, node, delta FROM d$i")
      .mkString("\n    UNION ALL ")
    sb ++= s"""bc AS (SELECT node, CAST(sum(delta) AS BIGINT) AS bc_m FROM (
      |    $unions) GROUP BY 1)
      |$select""".stripMargin
    sb.toString
  }

  val oracles: Map[String, String] = Map(
    // sampled Brandes from the md5-ranked 8-source sample, scaled n/k —
    // unrolled to depth 6 (> the fixture's eccentricity; deeper levels
    // are empty and contribute zero)
    "q_graph_betweenness_approx" -> brandesUnrolledSql(6,
      "SELECT node AS s FROM allv ORDER BY md5('r14' || node), node LIMIT 8",
      """SELECT v.node,
        |  CAST((CAST(coalesce(bc.bc_m, 0) AS HUGEINT) *
        |    (SELECT count(*) FROM allv)) // 8 AS BIGINT) AS bc_est_m
        |FROM allv v LEFT JOIN bc USING (node) ORDER BY node""".stripMargin),
    // the same five fixed model embeddings (GraphViews.models), squared-L2
    // ranked against [2.5, 0.5, 0.25]; dyadic values → exact doubles
    "q_model_semantic" ->
      """WITH m(id, e1, e2, e3) AS (VALUES
        |  ('dtmi:graft:Place;1',    0.0,  0.0,  1.0),
        |  ('dtmi:graft:Region;1',   1.0,  0.25, 0.5),
        |  ('dtmi:graft:Nation;1',   2.0,  0.5,  0.25),
        |  ('dtmi:graft:Customer;1', 3.0,  0.75, 0.0),
        |  ('dtmi:graft:Supplier;1', 3.0, -0.75, 0.25)),
        |d AS (SELECT id,
        |  (e1-2.5)*(e1-2.5) + (e2-0.5)*(e2-0.5) + (e3-0.25)*(e3-0.25) AS l2sq
        |  FROM m)
        |SELECT id, CAST(floor(l2sq * 10000 + 0.5) AS BIGINT) AS dist_fp
        |FROM d ORDER BY l2sq, id LIMIT 4""".stripMargin,
    "q_a1_twin_scan" ->
      s"""SELECT model_id, count(*) AS n FROM $twinsSql t
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_a2_rel_scan" ->
      s"""SELECT relationship_name, count(*) AS n FROM $relsSql r
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_a3_twin_lookup" ->
      s"""SELECT dt_id, model_id FROM $twinsSql t
         |WHERE dt_id = 'N3'""".stripMargin,
    "q_a4_rel_lookup" ->
      s"""SELECT relationship_id, source_id, target_id, relationship_name
         |FROM $relsSql r
         |WHERE source_id = 'N3' AND relationship_id = 'N3-R3'""".stripMargin,
    // three unrolled synchronous rounds (aggregates are not allowed in a
    // recursive CTE term), integer micro-unit arithmetic throughout —
    // bit-identical to the Spark loop on any summation order
    "q_graph_pagerank" ->
      s"""WITH edges AS (SELECT DISTINCT source_id, target_id FROM $relsSql r),
         |nodes AS (SELECT source_id AS node FROM edges
         |          UNION SELECT target_id FROM edges),
         |outdeg AS (SELECT source_id, count(*) AS od FROM edges GROUP BY 1),
         |ew AS (SELECT e.source_id, e.target_id, od
         |       FROM edges e JOIN outdeg o USING (source_id)),
         |pr0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
         |c1 AS (SELECT target_id AS node, sum(r // od) AS c
         |       FROM ew JOIN pr0 ON pr0.node = ew.source_id GROUP BY 1),
         |pr1 AS (SELECT n.node,
         |        CAST(150000 + (85 * coalesce(c, 0)) // 100 AS BIGINT) AS r
         |        FROM nodes n LEFT JOIN c1 USING (node)),
         |c2 AS (SELECT target_id AS node, sum(r // od) AS c
         |       FROM ew JOIN pr1 ON pr1.node = ew.source_id GROUP BY 1),
         |pr2 AS (SELECT n.node,
         |        CAST(150000 + (85 * coalesce(c, 0)) // 100 AS BIGINT) AS r
         |        FROM nodes n LEFT JOIN c2 USING (node)),
         |c3 AS (SELECT target_id AS node, sum(r // od) AS c
         |       FROM ew JOIN pr2 ON pr2.node = ew.source_id GROUP BY 1),
         |pr3 AS (SELECT n.node,
         |        CAST(150000 + (85 * coalesce(c, 0)) // 100 AS BIGINT) AS r
         |        FROM nodes n LEFT JOIN c3 USING (node))
         |SELECT node, r AS rank_m FROM pr3 ORDER BY node""".stripMargin,
    "q_a5_outgoing" ->
      s"""SELECT relationship_id, relationship_name, target_id FROM $relsSql r
         |WHERE source_id = 'N0' ORDER BY 1""".stripMargin,
    "q_a6_incoming" ->
      s"""SELECT relationship_name, count(*) AS n FROM $relsSql r
         |WHERE target_id = 'N3' GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_b4_single_hop" ->
      s"""SELECT r.target_id AS dst_dt_id, t.model_id AS src_model_id, count(*) AS n
         |FROM $relsSql r JOIN $twinsSql t ON r.source_id = t.dt_id
         |WHERE r.relationship_name = 'located_in'
         |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q_b6_multi_label" ->
      s"""SELECT relationship_name AS rel_relationship_name, count(*) AS n
         |FROM $relsSql r WHERE relationship_name IN ('in_region','located_in')
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_b17_neighborhood" ->
      s"""SELECT relationship_id, relationship_name,
         |  CASE WHEN source_id = 'N3' THEN target_id ELSE source_id END AS neighbor_id,
         |  CASE WHEN source_id = 'N3' THEN 'out' ELSE 'in' END AS direction
         |FROM $relsSql r WHERE source_id = 'N3' OR target_id = 'N3'
         |ORDER BY relationship_id LIMIT 50""".stripMargin,
    "q_graph_degrees" ->
      s"""WITH o AS (SELECT source_id AS dt_id, count(*) AS out_degree
         |           FROM $relsSql r GROUP BY 1),
         |i AS (SELECT target_id AS dt_id, count(*) AS in_degree
         |      FROM $relsSql r2 GROUP BY 1)
         |SELECT t.dt_id,
         |  CAST(coalesce(o.out_degree, 0) AS BIGINT) AS out_degree,
         |  CAST(coalesce(i.in_degree, 0) AS BIGINT) AS in_degree,
         |  CAST(coalesce(o.out_degree, 0) + coalesce(i.in_degree, 0)
         |    AS BIGINT) AS degree
         |FROM $twinsSql t
         |LEFT JOIN o ON t.dt_id = o.dt_id LEFT JOIN i ON t.dt_id = i.dt_id
         |ORDER BY t.dt_id""".stripMargin,
    "q_c1_is_of_model" ->
      s"""SELECT model_id, count(*) AS n FROM $twinsSql t
         |WHERE model_id IN ('dtmi:graft:Nation;1','dtmi:graft:Customer;1','dtmi:graft:Supplier;1')
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_c1_is_of_model_exact" ->
      s"""SELECT dt_id FROM $twinsSql t
         |WHERE model_id = 'dtmi:graft:Nation;1' ORDER BY 1""".stripMargin,
    // same co-purchase graph, naive canonical x<y<z triangle join (the
    // degree orientation changes the plan, not the count)
    "q_graph_triangles" ->
      """WITH pairs AS (
        |  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        |  FROM lineitem x JOIN lineitem y
        |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        |  WHERE x.l_quantity >= 30 AND y.l_quantity >= 30),
        |nodes AS (SELECT a AS node FROM pairs UNION SELECT b FROM pairs),
        |tri AS (
        |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM pairs e1 JOIN pairs e2 ON e2.a = e1.b
        |  JOIN pairs e3 ON e3.a = e1.a AND e3.b = e2.b),
        |pn AS (SELECT node, count(*) AS t FROM (
        |    SELECT x AS node FROM tri
        |    UNION ALL SELECT y FROM tri
        |    UNION ALL SELECT z FROM tri)
        |  GROUP BY 1)
        |SELECT CAST(coalesce(p.t, 0) AS BIGINT) AS triangles,
        |       count(*) AS n_nodes
        |FROM nodes n LEFT JOIN pn p ON p.node = n.node
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // wedge join through shared neighbors over the same co-purchase graph
    "q_graph_linkpred" ->
      """WITH pairs AS (
        |  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        |  FROM lineitem x JOIN lineitem y
        |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        |  WHERE x.l_quantity >= 30 AND y.l_quantity >= 30),
        |sym AS (SELECT a AS u, b AS v FROM pairs
        |        UNION ALL SELECT b, a FROM pairs),
        |deg AS (SELECT u, count(*) AS deg FROM sym GROUP BY 1),
        |wed AS (SELECT s1.v AS a, s2.v AS b, count(*) AS n_common
        |        FROM sym s1 JOIN sym s2 ON s1.u = s2.u AND s1.v < s2.v
        |        GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT wed.a AS node_a, wed.b AS node_b,
        |  CAST(n_common AS BIGINT) AS n_common,
        |  CAST(floor(n_common*10000.0/(da.deg + db.deg - n_common) + 0.5)
        |    AS BIGINT) AS jaccard_4
        |FROM wed JOIN deg da ON da.u = wed.a JOIN deg db ON db.u = wed.b
        |ORDER BY 1, 2""".stripMargin,
    // three unrolled peeling rounds over the same co-purchase graph
    "q_graph_kcore" ->
      """WITH pairs AS (
        |  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        |  FROM lineitem x JOIN lineitem y
        |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        |  WHERE x.l_quantity >= 30 AND y.l_quantity >= 30),
        |sym AS (SELECT a AS u, b AS v FROM pairs
        |        UNION ALL SELECT b, a FROM pairs),
        |d1 AS (SELECT u, count(*) c FROM sym GROUP BY 1),
        |n1 AS (SELECT u AS node FROM d1 WHERE c >= 15),
        |s2 AS (SELECT u, v FROM sym
        |       WHERE u IN (SELECT node FROM n1) AND v IN (SELECT node FROM n1)),
        |d2 AS (SELECT u, count(*) c FROM s2 GROUP BY 1),
        |n2 AS (SELECT u AS node FROM d2 WHERE c >= 15),
        |s3 AS (SELECT u, v FROM sym
        |       WHERE u IN (SELECT node FROM n2) AND v IN (SELECT node FROM n2)),
        |d3 AS (SELECT u, count(*) c FROM s3 GROUP BY 1),
        |n3 AS (SELECT u AS node FROM d3 WHERE c >= 15)
        |SELECT node FROM n3 ORDER BY node""".stripMargin,
    "q_b7_vle" ->
      s"""WITH e AS (SELECT source_id, target_id FROM $relsSql r),
         |p1 AS (SELECT source_id AS start_id, target_id AS end_id, 1 AS depth FROM e),
         |p2 AS (SELECT p1.start_id, e.target_id AS end_id, 2 AS depth
         |       FROM p1 JOIN e ON p1.end_id = e.source_id
         |       WHERE NOT EXISTS (SELECT 1 FROM p1 q
         |         WHERE q.start_id = p1.start_id AND q.end_id = e.target_id)),
         |allp AS (SELECT * FROM p1 UNION SELECT DISTINCT * FROM p2),
         |minp AS (SELECT start_id, end_id, min(depth) AS depth FROM allp GROUP BY 1,2)
         |SELECT depth, count(*) AS n FROM minp GROUP BY 1 ORDER BY 1""".stripMargin,
    // ring positions via window; minimal depth in a simple cycle is pure
    // modular arithmetic — ((pos_y - pos_x - 1 + m) mod m) + 1, the
    // self-pair landing at m (full cycle)
    "q_b7_vle_unbounded" ->
      """WITH ring AS (
        |  SELECT n_regionkey AS rk,
        |    row_number() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS pos,
        |    count(*) OVER (PARTITION BY n_regionkey) AS m
        |  FROM nation),
        |pairs AS (
        |  SELECT ((y.pos - x.pos - 1 + x.m) % x.m) + 1 AS depth
        |  FROM ring x JOIN ring y ON x.rk = y.rk)
        |SELECT CAST(depth AS INTEGER) AS depth, count(*) AS n
        |FROM pairs GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_graph_integrity" ->
      s"""WITH r AS (SELECT * FROM $relsSql rr),
         |t AS (SELECT dt_id FROM $twinsSql tt),
         |m(metric, n) AS (
         |  SELECT 'n_rels', count(*) FROM r
         |  UNION ALL SELECT 'n_dangling_source',
         |    (SELECT count(*) FROM r WHERE source_id NOT IN (SELECT dt_id FROM t))
         |  UNION ALL SELECT 'n_dangling_target',
         |    (SELECT count(*) FROM r WHERE target_id NOT IN (SELECT dt_id FROM t))
         |  UNION ALL SELECT 'n_self_loops',
         |    (SELECT count(*) FROM r WHERE source_id = target_id)
         |  UNION ALL SELECT 'n_duplicate_ids',
         |    (SELECT count(*) FROM (SELECT relationship_id FROM r
         |       GROUP BY 1 HAVING count(*) > 1)))
         |SELECT metric, CAST(n AS BIGINT) AS n FROM m ORDER BY metric""".stripMargin,
    "q_graph_walks" ->
      s"""WITH ${walkCtes(4)}
         |${walkRowsSql(4)}
         |SELECT walk_id, step, node FROM wr ORDER BY walk_id, step""".stripMargin,
    "q_graph_walk_pairs" ->
      s"""WITH ${walkCtes(4)}
         |${walkRowsSql(4)}
         |SELECT a.node AS center, b.node AS context, count(*) AS n
         |FROM wr a JOIN wr b ON a.walk_id = b.walk_id
         |  AND a.step <> b.step AND abs(a.step - b.step) <= 2
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_graph_sssp" ->
      s"""WITH ${ssspCtes(6)}
         |SELECT node, dist FROM d6 ORDER BY node""".stripMargin,
    "q_graph_hits" ->
      s"""WITH ${hitsCtes(2)}
         |SELECT h.node, h.x AS hub_m, a.x AS auth_m
         |FROM h2 h JOIN a2 a USING (node) ORDER BY node""".stripMargin,
    "q_graph_embed_corpus" ->
      s"""WITH ${walkCtes(4)}
         |${walkRowsSql(4)},
         |pairs AS (SELECT a.node AS center, b.node AS context, count(*) AS n
         |  FROM wr a JOIN wr b ON a.walk_id = b.walk_id
         |    AND a.step <> b.step AND abs(a.step - b.step) <= 2
         |  GROUP BY 1, 2)
         |SELECT tc.model_id AS center_model, tx.model_id AS context_model,
         |  CAST(sum(n) AS BIGINT) AS n_pairs
         |FROM pairs p
         |JOIN $twinsSql tc ON tc.dt_id = p.center
         |JOIN $twinsSql tx ON tx.dt_id = p.context
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_graph_lpa" ->
      s"""WITH ${lpaCtes(3)}
         |SELECT node, lab AS community FROM l3 ORDER BY node""".stripMargin,
    "q_graph_ppr" ->
      s"""WITH edges AS (SELECT DISTINCT target_id AS source_id,
         |               source_id AS target_id FROM $relsSql r),
         |nodes AS (SELECT source_id AS node FROM edges
         |          UNION SELECT target_id FROM edges),
         |nc AS (SELECT count(*) AS n FROM nodes),
         |outdeg AS (SELECT source_id, count(*) AS od FROM edges GROUP BY 1),
         |ew AS (SELECT e.source_id, e.target_id, od
         |       FROM edges e JOIN outdeg o USING (source_id)),
         |pr0 AS (SELECT node, CAST(CASE WHEN node IN ('R0','R1')
         |        THEN 1000000 * (SELECT n FROM nc) // 2 ELSE 0 END
         |        AS BIGINT) AS r FROM nodes),
         |c1 AS (SELECT target_id AS node, sum(r // od) AS c
         |       FROM ew JOIN pr0 ON pr0.node = ew.source_id GROUP BY 1),
         |pr1 AS (SELECT n.node, CAST(CASE WHEN n.node IN ('R0','R1')
         |        THEN 150000 * (SELECT n FROM nc) // 2 ELSE 0 END
         |        + (85 * coalesce(c, 0)) // 100 AS BIGINT) AS r
         |        FROM nodes n LEFT JOIN c1 USING (node)),
         |c2 AS (SELECT target_id AS node, sum(r // od) AS c
         |       FROM ew JOIN pr1 ON pr1.node = ew.source_id GROUP BY 1),
         |pr2 AS (SELECT n.node, CAST(CASE WHEN n.node IN ('R0','R1')
         |        THEN 150000 * (SELECT n FROM nc) // 2 ELSE 0 END
         |        + (85 * coalesce(c, 0)) // 100 AS BIGINT) AS r
         |        FROM nodes n LEFT JOIN c2 USING (node)),
         |c3 AS (SELECT target_id AS node, sum(r // od) AS c
         |       FROM ew JOIN pr2 ON pr2.node = ew.source_id GROUP BY 1),
         |pr3 AS (SELECT n.node, CAST(CASE WHEN n.node IN ('R0','R1')
         |        THEN 150000 * (SELECT n FROM nc) // 2 ELSE 0 END
         |        + (85 * coalesce(c, 0)) // 100 AS BIGINT) AS r
         |        FROM nodes n LEFT JOIN c3 USING (node))
         |SELECT node, r AS rank_m FROM pr3 ORDER BY node""".stripMargin,
    // SCC ground truth on the ring fixture is structural: the one-way
    // star edges never merge components, so each (nation, grp-of-5)
    // ring is one SCC and the label is its lexicographic-min member.
    "q_graph_scc" ->
      """WITH s AS (
        |  SELECT s_suppkey, s_nationkey,
        |    CAST(floor((row_number() OVER (PARTITION BY s_nationkey
        |      ORDER BY s_suppkey) - 1) / 5.0) AS BIGINT) AS grp
        |  FROM supplier)
        |SELECT 'S' || s_suppkey AS node_id,
        |       MIN('S' || s_suppkey) OVER (PARTITION BY s_nationkey, grp) AS scc
        |FROM s ORDER BY node_id""".stripMargin,
    // every twin connects to its region through nation edges, so the
    // component of a node is the lex-min id among its region's members
    "q_graph_wcc" ->
      """WITH memb AS (
        |  SELECT n_regionkey AS rk, 'N' || n_nationkey AS id FROM nation
        |  UNION ALL SELECT r_regionkey, 'R' || r_regionkey FROM region
        |  UNION ALL SELECT n.n_regionkey, 'C' || c_custkey
        |    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  UNION ALL SELECT n.n_regionkey, 'S' || s_suppkey
        |    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey)
        |SELECT id AS node_id, MIN(id) OVER (PARTITION BY rk) AS component
        |FROM memb ORDER BY node_id""".stripMargin,
    // Brandes unrolled: forward frontiers f0..f4 (sigma = sum of
    // predecessor sigmas, visited-set anti-join), then backward deltas
    // d4..d1 with the identical (sigma_v*(1e6+delta_w)) // sigma_w
    // per-successor integer term; dist-0 rows are excluded (v != s)
    "q_graph_betweenness" ->
      """WITH mm AS (SELECT count(*) AS m FROM nation),
        |ring AS (SELECT 'N' || n_nationkey AS a,
        |    'N' || ((n_nationkey + 1) % (SELECT m FROM mm)) AS b FROM nation
        |  UNION ALL SELECT 'N' || n_nationkey, 'R' || n_regionkey FROM nation),
        |sym AS (SELECT a, b FROM ring UNION SELECT b, a FROM ring),
        |src(s) AS (VALUES ('N0'), ('N5'), ('N10'), ('N15'), ('N20')),
        |f0 AS (SELECT s, s AS node, CAST(1 AS BIGINT) AS sigma FROM src),
        |v0 AS (SELECT s, node FROM f0),
        |f1 AS (SELECT f.s, e.b AS node, CAST(sum(f.sigma) AS BIGINT) AS sigma
        |  FROM f0 f JOIN sym e ON f.node = e.a
        |  WHERE NOT EXISTS (SELECT 1 FROM v0 x WHERE x.s = f.s AND x.node = e.b)
        |  GROUP BY 1, 2),
        |v1 AS (SELECT s, node FROM v0 UNION ALL SELECT s, node FROM f1),
        |f2 AS (SELECT f.s, e.b AS node, CAST(sum(f.sigma) AS BIGINT) AS sigma
        |  FROM f1 f JOIN sym e ON f.node = e.a
        |  WHERE NOT EXISTS (SELECT 1 FROM v1 x WHERE x.s = f.s AND x.node = e.b)
        |  GROUP BY 1, 2),
        |v2 AS (SELECT s, node FROM v1 UNION ALL SELECT s, node FROM f2),
        |f3 AS (SELECT f.s, e.b AS node, CAST(sum(f.sigma) AS BIGINT) AS sigma
        |  FROM f2 f JOIN sym e ON f.node = e.a
        |  WHERE NOT EXISTS (SELECT 1 FROM v2 x WHERE x.s = f.s AND x.node = e.b)
        |  GROUP BY 1, 2),
        |v3 AS (SELECT s, node FROM v2 UNION ALL SELECT s, node FROM f3),
        |f4 AS (SELECT f.s, e.b AS node, CAST(sum(f.sigma) AS BIGINT) AS sigma
        |  FROM f3 f JOIN sym e ON f.node = e.a
        |  WHERE NOT EXISTS (SELECT 1 FROM v3 x WHERE x.s = f.s AND x.node = e.b)
        |  GROUP BY 1, 2),
        |d4 AS (SELECT s, node, CAST(0 AS BIGINT) AS delta FROM f4),
        |t3 AS (SELECT v.s, v.node,
        |    sum((CAST(v.sigma AS HUGEINT) * (1000000 + w.delta)) // fw.sigma) AS delta
        |  FROM f3 v JOIN sym e ON v.node = e.a
        |  JOIN f4 fw ON fw.s = v.s AND fw.node = e.b
        |  JOIN d4 w ON w.s = v.s AND w.node = e.b GROUP BY 1, 2),
        |d3 AS (SELECT v.s, v.node, CAST(coalesce(t.delta, 0) AS BIGINT) AS delta
        |  FROM f3 v LEFT JOIN t3 t ON t.s = v.s AND t.node = v.node),
        |t2 AS (SELECT v.s, v.node,
        |    sum((CAST(v.sigma AS HUGEINT) * (1000000 + w.delta)) // fw.sigma) AS delta
        |  FROM f2 v JOIN sym e ON v.node = e.a
        |  JOIN f3 fw ON fw.s = v.s AND fw.node = e.b
        |  JOIN d3 w ON w.s = v.s AND w.node = e.b GROUP BY 1, 2),
        |d2 AS (SELECT v.s, v.node, CAST(coalesce(t.delta, 0) AS BIGINT) AS delta
        |  FROM f2 v LEFT JOIN t2 t ON t.s = v.s AND t.node = v.node),
        |t1 AS (SELECT v.s, v.node,
        |    sum((CAST(v.sigma AS HUGEINT) * (1000000 + w.delta)) // fw.sigma) AS delta
        |  FROM f1 v JOIN sym e ON v.node = e.a
        |  JOIN f2 fw ON fw.s = v.s AND fw.node = e.b
        |  JOIN d2 w ON w.s = v.s AND w.node = e.b GROUP BY 1, 2),
        |d1 AS (SELECT v.s, v.node, CAST(coalesce(t.delta, 0) AS BIGINT) AS delta
        |  FROM f1 v LEFT JOIN t1 t ON t.s = v.s AND t.node = v.node),
        |allv AS (SELECT a AS node FROM sym UNION SELECT b FROM sym),
        |bc AS (SELECT node, CAST(sum(delta) AS BIGINT) AS bc_m FROM (
        |    SELECT s, node, delta FROM d4
        |    UNION ALL SELECT s, node, delta FROM d3
        |    UNION ALL SELECT s, node, delta FROM d2
        |    UNION ALL SELECT s, node, delta FROM d1) GROUP BY 1)
        |SELECT v.node, CAST(coalesce(bc.bc_m, 0) AS BIGINT) AS bc_m
        |FROM allv v LEFT JOIN bc USING (node) ORDER BY node""".stripMargin,
    // harmonic: the same BFS frontiers, summed as 1e6 // depth per
    // (source, node) reach
    "q_graph_harmonic" ->
      """WITH mm AS (SELECT count(*) AS m FROM nation),
        |ring AS (SELECT 'N' || n_nationkey AS a,
        |    'N' || ((n_nationkey + 1) % (SELECT m FROM mm)) AS b FROM nation
        |  UNION ALL SELECT 'N' || n_nationkey, 'R' || n_regionkey FROM nation),
        |sym AS (SELECT a, b FROM ring UNION SELECT b, a FROM ring),
        |src(s) AS (VALUES ('N0'), ('N5'), ('N10'), ('N15'), ('N20')),
        |f0 AS (SELECT s, s AS node FROM src),
        |v0 AS (SELECT s, node FROM f0),
        |f1 AS (SELECT DISTINCT f.s, e.b AS node
        |  FROM f0 f JOIN sym e ON f.node = e.a
        |  WHERE NOT EXISTS (SELECT 1 FROM v0 x WHERE x.s = f.s AND x.node = e.b)),
        |v1 AS (SELECT s, node FROM v0 UNION ALL SELECT s, node FROM f1),
        |f2 AS (SELECT DISTINCT f.s, e.b AS node
        |  FROM f1 f JOIN sym e ON f.node = e.a
        |  WHERE NOT EXISTS (SELECT 1 FROM v1 x WHERE x.s = f.s AND x.node = e.b)),
        |v2 AS (SELECT s, node FROM v1 UNION ALL SELECT s, node FROM f2),
        |f3 AS (SELECT DISTINCT f.s, e.b AS node
        |  FROM f2 f JOIN sym e ON f.node = e.a
        |  WHERE NOT EXISTS (SELECT 1 FROM v2 x WHERE x.s = f.s AND x.node = e.b)),
        |v3 AS (SELECT s, node FROM v2 UNION ALL SELECT s, node FROM f3),
        |f4 AS (SELECT DISTINCT f.s, e.b AS node
        |  FROM f3 f JOIN sym e ON f.node = e.a
        |  WHERE NOT EXISTS (SELECT 1 FROM v3 x WHERE x.s = f.s AND x.node = e.b)),
        |allv AS (SELECT a AS node FROM sym UNION SELECT b FROM sym),
        |hc AS (SELECT node, CAST(sum(h) AS BIGINT) AS hc_m FROM (
        |  SELECT node, 1000000 AS h FROM f1
        |  UNION ALL SELECT node, 500000 FROM f2
        |  UNION ALL SELECT node, 333333 FROM f3
        |  UNION ALL SELECT node, 250000 FROM f4) GROUP BY 1)
        |SELECT v.node, CAST(coalesce(hc.hc_m, 0) AS BIGINT) AS hc_m
        |FROM allv v LEFT JOIN hc USING (node) ORDER BY node""".stripMargin,
    "q_graph_node2vec" ->
      s"""WITH ${n2vCtes(4, 1, 2, 4)},
         |wrows AS (SELECT walk_id, CAST(0 AS BIGINT) AS step, node FROM w0
         |  UNION ALL SELECT walk_id, CAST(1 AS BIGINT), node FROM w1
         |  UNION ALL SELECT walk_id, CAST(2 AS BIGINT), node FROM w2
         |  UNION ALL SELECT walk_id, CAST(3 AS BIGINT), node FROM w3
         |  UNION ALL SELECT walk_id, CAST(4 AS BIGINT), node FROM w4)
         |SELECT walk_id, step, node FROM wrows ORDER BY walk_id, step""".stripMargin,
    // two unrolled peel rounds: support = common-neighbor count via the
    // same wedge join; k=4 keeps support >= 2
    "q_graph_ktruss" ->
      """WITH li AS (SELECT l_orderkey AS ok, l_partkey
        |  FROM lineitem WHERE l_quantity >= 30),
        |e0 AS (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        |  FROM li x JOIN li y ON x.ok = y.ok WHERE x.l_partkey < y.l_partkey),
        |sym0 AS (SELECT a AS u, b AS x FROM e0 UNION ALL SELECT b, a FROM e0),
        |sup1 AS (SELECT e.a, e.b, count(*) AS c FROM e0 e
        |  JOIN sym0 n1 ON n1.u = e.a
        |  JOIN sym0 n2 ON n2.u = e.b AND n2.x = n1.x
        |  GROUP BY e.a, e.b),
        |e1 AS (SELECT a, b FROM sup1 WHERE c >= 2),
        |sym1 AS (SELECT a AS u, b AS x FROM e1 UNION ALL SELECT b, a FROM e1),
        |sup2 AS (SELECT e.a, e.b, count(*) AS c FROM e1 e
        |  JOIN sym1 n1 ON n1.u = e.a
        |  JOIN sym1 n2 ON n2.u = e.b AND n2.x = n1.x
        |  GROUP BY e.a, e.b),
        |e2 AS (SELECT a, b FROM sup2 WHERE c >= 2)
        |SELECT a, b FROM e2 ORDER BY a, b""".stripMargin,
    // three unrolled Luby rounds with (md5, id) priorities — round
    // winners are undominated nodes; winners + neighbors leave
    "q_graph_mis" ->
      """WITH s AS (
        |  SELECT s_suppkey, s_nationkey,
        |    CAST(floor((row_number() OVER (PARTITION BY s_nationkey
        |      ORDER BY s_suppkey) - 1) / 5.0) AS BIGINT) AS grp
        |  FROM supplier),
        |ring AS (SELECT 'S' || s_suppkey AS a,
        |    'S' || coalesce(lead(s_suppkey) OVER w,
        |                    first_value(s_suppkey) OVER w) AS b
        |  FROM s WINDOW w AS (PARTITION BY s_nationkey, grp ORDER BY s_suppkey)),
        |e0 AS (SELECT DISTINCT u, v FROM (
        |    SELECT a AS u, b AS v FROM ring
        |    UNION ALL SELECT b, a FROM ring) WHERE u <> v),
        |r0 AS (SELECT DISTINCT u AS node FROM e0),
        |dom1 AS (SELECT DISTINCT v AS node FROM e0
        |  WHERE md5(u) < md5(v) OR (md5(u) = md5(v) AND u < v)),
        |win1 AS (SELECT node FROM r0 WHERE node NOT IN (SELECT node FROM dom1)),
        |drop1 AS (SELECT node FROM win1 UNION
        |  SELECT e.v FROM e0 e JOIN win1 w ON e.u = w.node),
        |r1 AS (SELECT node FROM r0 WHERE node NOT IN (SELECT node FROM drop1)),
        |e1 AS (SELECT u, v FROM e0 WHERE u IN (SELECT node FROM r1)
        |  AND v IN (SELECT node FROM r1)),
        |dom2 AS (SELECT DISTINCT v AS node FROM e1
        |  WHERE md5(u) < md5(v) OR (md5(u) = md5(v) AND u < v)),
        |win2 AS (SELECT node FROM r1 WHERE node NOT IN (SELECT node FROM dom2)),
        |drop2 AS (SELECT node FROM win2 UNION
        |  SELECT e.v FROM e1 e JOIN win2 w ON e.u = w.node),
        |r2 AS (SELECT node FROM r1 WHERE node NOT IN (SELECT node FROM drop2)),
        |e2 AS (SELECT u, v FROM e1 WHERE u IN (SELECT node FROM r2)
        |  AND v IN (SELECT node FROM r2)),
        |dom3 AS (SELECT DISTINCT v AS node FROM e2
        |  WHERE md5(u) < md5(v) OR (md5(u) = md5(v) AND u < v)),
        |win3 AS (SELECT node FROM r2 WHERE node NOT IN (SELECT node FROM dom3))
        |SELECT node FROM (SELECT node FROM win1
        |  UNION ALL SELECT node FROM win2
        |  UNION ALL SELECT node FROM win3)
        |ORDER BY node""".stripMargin,
    "q_graph_wpagerank" ->
      s"""WITH edges AS (SELECT DISTINCT source_id, target_id,
         |  CAST(${graft.graph.Sssp.weightSql("relationship_id")} AS BIGINT) AS w
         |  FROM $relsSql r),
         |nodes AS (SELECT source_id AS node FROM edges
         |          UNION SELECT target_id FROM edges),
         |outw AS (SELECT source_id, sum(w) AS sw FROM edges GROUP BY 1),
         |ew AS (SELECT e.source_id, e.target_id, e.w, sw
         |       FROM edges e JOIN outw o USING (source_id)),
         |pr0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
         |c1 AS (SELECT target_id AS node, sum((r * w) // sw) AS c
         |       FROM ew JOIN pr0 ON pr0.node = ew.source_id GROUP BY 1),
         |pr1 AS (SELECT n.node,
         |        CAST(150000 + (85 * coalesce(c, 0)) // 100 AS BIGINT) AS r
         |        FROM nodes n LEFT JOIN c1 USING (node)),
         |c2 AS (SELECT target_id AS node, sum((r * w) // sw) AS c
         |       FROM ew JOIN pr1 ON pr1.node = ew.source_id GROUP BY 1),
         |pr2 AS (SELECT n.node,
         |        CAST(150000 + (85 * coalesce(c, 0)) // 100 AS BIGINT) AS r
         |        FROM nodes n LEFT JOIN c2 USING (node)),
         |c3 AS (SELECT target_id AS node, sum((r * w) // sw) AS c
         |       FROM ew JOIN pr2 ON pr2.node = ew.source_id GROUP BY 1),
         |pr3 AS (SELECT n.node,
         |        CAST(150000 + (85 * coalesce(c, 0)) // 100 AS BIGINT) AS r
         |        FROM nodes n LEFT JOIN c3 USING (node))
         |SELECT node, r AS rank_m FROM pr3 ORDER BY node""".stripMargin,
    // same BFS frontiers as harmonic; ecc = deepest frontier per source
    "q_graph_eccentricity" ->
      """WITH mm AS (SELECT count(*) AS m FROM nation),
        |ring AS (SELECT 'N' || n_nationkey AS a,
        |    'N' || ((n_nationkey + 1) % (SELECT m FROM mm)) AS b FROM nation
        |  UNION ALL SELECT 'N' || n_nationkey, 'R' || n_regionkey FROM nation),
        |sym AS (SELECT a, b FROM ring UNION SELECT b, a FROM ring),
        |src(s) AS (VALUES ('N0'), ('N5'), ('N10'), ('N15'), ('N20')),
        |f0 AS (SELECT s, s AS node FROM src),
        |v0 AS (SELECT s, node FROM f0),
        |f1 AS (SELECT DISTINCT f.s, e.b AS node
        |  FROM f0 f JOIN sym e ON f.node = e.a
        |  WHERE NOT EXISTS (SELECT 1 FROM v0 x WHERE x.s = f.s AND x.node = e.b)),
        |v1 AS (SELECT s, node FROM v0 UNION ALL SELECT s, node FROM f1),
        |f2 AS (SELECT DISTINCT f.s, e.b AS node
        |  FROM f1 f JOIN sym e ON f.node = e.a
        |  WHERE NOT EXISTS (SELECT 1 FROM v1 x WHERE x.s = f.s AND x.node = e.b)),
        |v2 AS (SELECT s, node FROM v1 UNION ALL SELECT s, node FROM f2),
        |f3 AS (SELECT DISTINCT f.s, e.b AS node
        |  FROM f2 f JOIN sym e ON f.node = e.a
        |  WHERE NOT EXISTS (SELECT 1 FROM v2 x WHERE x.s = f.s AND x.node = e.b)),
        |v3 AS (SELECT s, node FROM v2 UNION ALL SELECT s, node FROM f3),
        |f4 AS (SELECT DISTINCT f.s, e.b AS node
        |  FROM f3 f JOIN sym e ON f.node = e.a
        |  WHERE NOT EXISTS (SELECT 1 FROM v3 x WHERE x.s = f.s AND x.node = e.b))
        |SELECT s AS source, CAST(max(depth) AS BIGINT) AS ecc,
        |  CAST(count(*) AS BIGINT) AS n_reached FROM (
        |  SELECT s, node, 0 AS depth FROM f0
        |  UNION ALL SELECT s, node, 1 FROM f1
        |  UNION ALL SELECT s, node, 2 FROM f2
        |  UNION ALL SELECT s, node, 3 FROM f3
        |  UNION ALL SELECT s, node, 4 FROM f4)
        |GROUP BY 1 ORDER BY source""".stripMargin,
    "q_graph_projection" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS item
        |  FROM lineitem WHERE l_quantity >= 30)
        |SELECT a.item AS item_a, b.item AS item_b,
        |  CAST(count(*) AS BIGINT) AS weight
        |FROM li a JOIN li b ON a.k = b.k AND a.item < b.item
        |GROUP BY 1, 2 HAVING count(*) >= 2
        |ORDER BY item_a, item_b""".stripMargin,
    "q_graph_related" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS item
        |  FROM lineitem WHERE l_quantity >= 30),
        |proj AS (SELECT a.item AS item_a, b.item AS item_b,
        |    CAST(count(*) AS BIGINT) AS weight
        |  FROM li a JOIN li b ON a.k = b.k AND a.item < b.item
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |sym AS (SELECT item_a AS item, item_b AS related, weight FROM proj
        |  UNION ALL SELECT item_b, item_a, weight FROM proj),
        |r AS (SELECT item, related, weight,
        |  CAST(row_number() OVER (PARTITION BY item
        |    ORDER BY weight DESC, related) AS BIGINT) AS rank FROM sym)
        |SELECT item, rank, related, weight FROM r WHERE rank <= 3
        |ORDER BY item, rank""".stripMargin,
    // per-node triangles + degree + micro-unit closed-wedge share
    "q_graph_clustering" ->
      """WITH li AS (SELECT l_orderkey AS ok, l_partkey
        |  FROM lineitem WHERE l_quantity >= 30),
        |und AS (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        |  FROM li x JOIN li y ON x.ok = y.ok WHERE x.l_partkey < y.l_partkey),
        |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM und e1 JOIN und e2 ON e2.a = e1.b
        |  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
        |corners AS (SELECT x AS node FROM tri
        |  UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri),
        |cnt AS (SELECT node, count(*) AS c FROM corners GROUP BY 1),
        |deg AS (SELECT node, count(*) AS deg FROM (
        |  SELECT a AS node FROM und UNION ALL SELECT b FROM und) GROUP BY 1)
        |SELECT d.node, CAST(coalesce(c, 0) AS BIGINT) AS triangles,
        |  CAST(deg AS BIGINT) AS deg,
        |  CAST(CASE WHEN deg >= 2
        |    THEN (2 * coalesce(c, 0) * 1000000) // (deg * (deg - 1))
        |    ELSE 0 END AS BIGINT) AS lcc_m
        |FROM deg d LEFT JOIN cnt ON cnt.node = d.node
        |ORDER BY d.node""".stripMargin
  )

  /** LPA unrolled: per round a neighbor-label vote count and a
    * (count desc, label asc) argmax — the identical deterministic
    * mode-with-min-tie-break as [[graft.graph.LabelPropagation]]. */
  private def lpaCtes(rounds: Int): String = {
    val base =
      s"""e AS (SELECT source_id AS node, target_id AS nbr FROM $relsSql r
         |      UNION SELECT target_id, source_id FROM $relsSql r2),
         |l0 AS (SELECT DISTINCT node,
         |  CAST(('0x'||substr(md5(node),1,15)) AS BIGINT) AS lab FROM e)""".stripMargin
    val steps = (1 to rounds).map { k =>
      s"""v$k AS (SELECT e.node, l.lab, count(*) AS c
         |  FROM e JOIN l${k - 1} l ON l.node = e.nbr GROUP BY 1, 2),
         |l$k AS (SELECT node, lab FROM (SELECT node, lab,
         |    row_number() OVER (PARTITION BY node ORDER BY c DESC, lab) rn
         |  FROM v$k) WHERE rn = 1)""".stripMargin
    }
    (base +: steps).mkString(",\n")
  }

  /** HITS unrolled: per iteration an authority half-step from h{k-1} and
    * a hub half-step from a{k}, each sum-normalized with the identical
    * two-step integer arithmetic as [[graft.graph.Hits.scores]]. */
  private def hitsCtes(iterations: Int): String = {
    val base =
      s"""e AS (SELECT DISTINCT source_id, target_id FROM $relsSql r),
         |nodes AS (SELECT source_id AS node FROM e
         |          UNION SELECT target_id FROM e),
         |h0 AS (SELECT node, CAST(1000000 AS BIGINT) AS x FROM nodes)""".stripMargin
    def half(out: String, in: String, joinEdge: String, groupEdge: String) =
      s"""${out}r AS (SELECT e.$groupEdge AS node, sum(i.x) AS x
         |  FROM e JOIN $in i ON i.node = e.$joinEdge GROUP BY 1),
         |${out}f AS (SELECT n.node, coalesce(x, 0) AS x
         |  FROM nodes n LEFT JOIN ${out}r USING (node)),
         |${out}t AS (SELECT CASE WHEN sum(x) = 0 THEN 1 ELSE sum(x) END AS t
         |  FROM ${out}f),
         |${out}s AS (SELECT t, t // 1000000 + 1 AS s FROM ${out}t),
         |$out AS (SELECT node,
         |  CAST(((x // s) * 1000000) // (t // s) AS BIGINT) AS x
         |  FROM ${out}f, ${out}s)""".stripMargin
    val steps = (1 to iterations).map { k =>
      half(s"a$k", s"h${k - 1}", "source_id", "target_id") + ",\n" +
        half(s"h$k", s"a$k", "target_id", "source_id")
    }
    (base +: steps).mkString(",\n")
  }

  /** The walk recurrence, unrolled: CTEs w0..w`length` where w_k holds
    * (walk_id, node after k steps). Mirrors [[graft.graph.RandomWalk
    * .walks]] expression for expression (same md5-nibble pick). */
  /** Node2vec unrolled: transition table with CASE weight classes +
    * windowed cumulative ranges, first-order step 1, then per-step
    * (prev,cur)-keyed cumulative-range picks — mirrors
    * [[graft.graph.RandomWalk.node2vecWalks]] over the nation ring +
    * region attachment graph. */
  private def n2vCtes(length: Int, wr: Long, wc: Long, wf: Long): String = {
    val nib = graft.graph.RandomWalk.nibbleValueSql("p.h")
    val base =
      s"""mm AS (SELECT count(*) AS m FROM nation),
         |fwd AS (SELECT 'N' || n_nationkey AS src,
         |    'N' || ((n_nationkey + 1) % (SELECT m FROM mm)) AS dst FROM nation
         |  UNION ALL SELECT 'N' || n_nationkey, 'R' || n_regionkey FROM nation),
         |edges AS (SELECT DISTINCT src, dst FROM
         |  (SELECT src, dst FROM fwd UNION ALL SELECT dst, src FROM fwd)),
         |adj AS (SELECT src, dst,
         |  row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS idx
         |  FROM edges),
         |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
         |tr AS (SELECT e.src AS prev, e.dst AS cur, a.idx, a.dst AS nxt,
         |  CASE WHEN a.dst = e.src THEN $wr
         |       WHEN EXISTS (SELECT 1 FROM edges e2
         |                    WHERE e2.src = e.src AND e2.dst = a.dst) THEN $wc
         |       ELSE $wf END AS w
         |  FROM edges e JOIN adj a ON a.src = e.dst),
         |trc AS (SELECT prev, cur, idx, nxt, w,
         |  CAST(sum(w) OVER (PARTITION BY prev, cur ORDER BY idx)
         |    AS BIGINT) AS cum_hi,
         |  CAST(sum(w) OVER (PARTITION BY prev, cur) AS BIGINT) AS total
         |  FROM tr),
         |w0 AS (SELECT DISTINCT src || '#0' AS walk_id, src AS node FROM edges),
         |h1 AS (SELECT w.walk_id, w.node, d.deg,
         |  md5(w.walk_id || ':1:' || w.node) AS h
         |  FROM w0 w JOIN deg d ON w.node = d.src),
         |w1 AS (SELECT p.walk_id, p.node AS prev, a.dst AS node
         |  FROM h1 p JOIN adj a
         |  ON a.src = p.node AND a.idx = ($nib % p.deg))""".stripMargin
    val steps = (2 to length).map { k =>
      s"""h$k AS (SELECT w.walk_id, w.prev, w.node, t.total,
         |  md5(w.walk_id || ':$k:' || w.node) AS h
         |  FROM w${k - 1} w JOIN (SELECT DISTINCT prev, cur, total FROM trc
         |    WHERE total > 0) t ON t.prev = w.prev AND t.cur = w.node),
         |w$k AS (SELECT p.walk_id, p.node AS prev, c.nxt AS node
         |  FROM h$k p JOIN trc c ON c.prev = p.prev AND c.cur = p.node
         |  AND c.w > 0
         |  AND ($nib % p.total) >= c.cum_hi - c.w
         |  AND ($nib % p.total) < c.cum_hi)""".stripMargin
    }
    (base +: steps).mkString(",\n")
  }

  private def walkCtes(length: Int): String = {
    val nib = graft.graph.RandomWalk.nibbleValueSql("p.h")
    val base =
      s"""fwd AS (SELECT source_id AS src, target_id AS dst FROM $relsSql r),
         |edges AS (SELECT DISTINCT src, dst FROM
         |  (SELECT src, dst FROM fwd UNION ALL SELECT dst, src FROM fwd)),
         |adj AS (SELECT src, dst,
         |  row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS idx
         |  FROM edges),
         |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
         |w0 AS (SELECT DISTINCT src || '#0' AS walk_id, src AS node
         |       FROM edges)""".stripMargin
    val steps = (1 to length).map { k =>
      s"""h$k AS (SELECT w.walk_id, w.node, d.deg,
         |  md5(w.walk_id || ':$k:' || w.node) AS h
         |  FROM w${k - 1} w JOIN deg d ON w.node = d.src),
         |w$k AS (SELECT p.walk_id, a.dst AS node FROM h$k p JOIN adj a
         |  ON a.src = p.node AND a.idx = ($nib % p.deg))""".stripMargin
    }
    (base +: steps).mkString(",\n")
  }

  /** `, wr AS (...)` — all walk rows (walk_id, step, node) unioned. */
  private def walkRowsSql(length: Int): String = {
    val unions = (1 to length)
      .map(k => s"UNION ALL SELECT walk_id, CAST($k AS BIGINT), node FROM w$k")
      .mkString("\n")
    s""", wr AS (SELECT walk_id, CAST(0 AS BIGINT) AS step, node FROM w0
       |$unions)""".stripMargin
  }

  /** Bounded Bellman-Ford, unrolled: d0..d`rounds` over the id-weighted
    * undirected edge view — mirrors [[graft.graph.Sssp.distances]]. */
  private def ssspCtes(rounds: Int): String = {
    val w = graft.graph.Sssp.weightSql("relationship_id")
    val base =
      s"""r0 AS (SELECT relationship_id, source_id, target_id FROM $relsSql r),
         |ew AS (SELECT DISTINCT src, dst, w FROM (
         |  SELECT source_id AS src, target_id AS dst, CAST($w AS BIGINT) AS w
         |  FROM r0
         |  UNION ALL
         |  SELECT target_id, source_id, CAST($w AS BIGINT) FROM r0)),
         |d0 AS (SELECT 'R0' AS node, CAST(0 AS BIGINT) AS dist)""".stripMargin
    val steps = (1 to rounds).map { k =>
      s"""d$k AS (SELECT node, min(dist) AS dist FROM (
         |  SELECT node, dist FROM d${k - 1}
         |  UNION ALL
         |  SELECT e.dst, d.dist + e.w FROM d${k - 1} d JOIN ew e ON d.node = e.src)
         |  GROUP BY node)""".stripMargin
    }
    (base +: steps).mkString(",\n")
  }
}
