package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.adt.AdtPlanner
import graft.graph.GraphViews

/** The ADT query language end-to-end: raw ADT query strings parsed by
  * [[graft.adt.AdtParser]] and planned by [[graft.adt.AdtPlanner]] over the
  * derived place-graph, oracle-checked in plain SQL. This is the primary
  * read surface of the reference (SURVEY §3.1).
  */
object AdtLangQueries {

  private def run(s: SparkSession, d: String, q: String): DataFrame =
    new AdtPlanner(GraphViews.graph(s, d)).run(q)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // B1/B3/C2 projection + filter + STARTSWITH through the ADT parser.
    "q_adt_startswith" -> ((s, d) => {
      run(s, d,
        "SELECT T.$dtId AS dt_id, T.name AS name FROM DIGITALTWINS T " +
          "WHERE IS_OF_MODEL(T, 'dtmi:graft:Nation;1', exact) AND STARTSWITH(T.name, 'A')")
        .orderBy(col("dt_id"))
    }),

    // B9 COUNT + C1 inheritance through the parser.
    "q_adt_count_model" -> ((s, d) => {
      run(s, d, "SELECT COUNT() FROM DIGITALTWINS WHERE IS_OF_MODEL('dtmi:graft:Nation;1')")
    }),

    // B4 MATCH single hop with WHERE on both endpoints.
    "q_adt_match_hop" -> ((s, d) => {
      run(s, d,
        "SELECT C.$dtId AS member_id, N.name AS nation_name FROM DIGITALTWINS " +
          "MATCH (C)-[r:located_in]->(N) WHERE N.name = 'CHINA' " +
          "AND IS_OF_MODEL(C, 'dtmi:graft:Customer;1', exact)")
        .orderBy(col("member_id"))
    }),

    // B5 JOIN RELATED two-hop chain: customer -> nation -> region.
    "q_adt_join_related" -> ((s, d) => {
      run(s, d,
        "SELECT C.$dtId AS member_id, R.name AS region_name FROM DIGITALTWINS C " +
          "JOIN N RELATED C.located_in JOIN R RELATED N.in_region " +
          "WHERE R.name = 'ASIA' AND IS_OF_MODEL(C, 'dtmi:graft:Supplier;1', exact)")
        .orderBy(col("member_id"))
    }),

    // A2/B3 relationship scan with IN filter through the parser.
    "q_adt_rel_filter" -> ((s, d) => {
      run(s, d,
        "SELECT $sourceId AS source_id, $targetId AS target_id FROM RELATIONSHIPS " +
          "WHERE $relationshipName = 'in_region' AND $targetId IN ['R0', 'R2']")
        .orderBy(col("source_id"))
    }),

    // B3 numeric comparison typing (JSON-extracted double vs literal).
    "q_adt_numeric" -> ((s, d) => {
      run(s, d,
        "SELECT T.$dtId AS dt_id FROM DIGITALTWINS T " +
          "WHERE T.acctbal > 9900 AND IS_OF_MODEL(T, 'dtmi:graft:Customer;1')")
        .orderBy(col("dt_id"))
    }),

    // C3 ENDSWITH.
    "q_adt_endswith" -> ((s, d) => {
      run(s, d,
        "SELECT T.$dtId AS dt_id, T.name AS name FROM DIGITALTWINS T " +
          "WHERE ENDSWITH(T.name, 'A') AND IS_OF_MODEL(T, 'dtmi:graft:Region;1', exact)")
        .orderBy(col("dt_id"))
    }),

    // C4 CONTAINS (substring).
    "q_adt_contains" -> ((s, d) => {
      run(s, d,
        "SELECT COUNT() FROM DIGITALTWINS WHERE CONTAINS(mktsegment, 'MACH')")
    }),

    // C5 ARRAY_CONTAINS over a JSON array property.
    "q_adt_array_contains" -> ((s, d) => {
      run(s, d,
        "SELECT T.$dtId AS dt_id FROM DIGITALTWINS T " +
          "WHERE ARRAY_CONTAINS(T.tags, 'BUILDING')")
        .orderBy(col("dt_id"))
    }),

    // C6/C7 IS_NULL / IS_DEFINED over schemaless docs.
    "q_adt_is_defined" -> ((s, d) => {
      run(s, d, "SELECT COUNT() FROM DIGITALTWINS WHERE IS_DEFINED(mktsegment)")
    }),
    "q_adt_is_null" -> ((s, d) => {
      run(s, d,
        "SELECT COUNT() FROM DIGITALTWINS " +
          "WHERE IS_NULL(acctbal) AND IS_OF_MODEL('dtmi:graft:Nation;1', exact)")
    }),

    // C8-C12 JSON type predicates through the parser: acctbal is a JSON
    // number on customers/suppliers only (absent on nations/regions), name
    // is a string everywhere, tags is an array (non-primitive) when
    // present — so the conjunction selects exactly customers + suppliers.
    "q_adt_typeof" -> ((s, d) => {
      run(s, d,
        "SELECT T.$dtId AS dt_id FROM DIGITALTWINS T " +
          "WHERE IS_NUMBER(T.acctbal) AND IS_STRING(T.name) " +
          "AND NOT IS_BOOL(T.acctbal) AND NOT IS_OBJECT(T.name) " +
          "AND NOT IS_PRIMITIVE(T.tags)")
        .orderBy(col("dt_id"))
    }),

    // B2 $-metadata access + B3 IN list.
    "q_adt_metadata_model" -> ((s, d) => {
      run(s, d,
        "SELECT COUNT() FROM DIGITALTWINS WHERE $metadata.$model = 'dtmi:graft:Supplier;1'")
    }),
    "q_adt_in_list" -> ((s, d) => {
      run(s, d,
        "SELECT T.$dtId AS dt_id FROM DIGITALTWINS T " +
          "WHERE T.$dtId IN ['R0', 'R2', 'N5', 'C10']")
        .orderBy(col("dt_id"))
    }),

    // Cypher WITH horizon: aggregate per nation, filter on the aggregate,
    // return (the Cypher-side HAVING; raw Cypher is the reference's second
    // query language, Query.cs:44-55).
    "q_cypher_with_agg" -> ((s, d) => {
      run(s, d,
        "MATCH (m:Twin)-[r:located_in]->(n:Twin) " +
          "WITH n.name AS nation, count(*) AS n_members WHERE n_members > 65 " +
          "RETURN nation, n_members ORDER BY nation")
    }),

    // Cypher UNWIND of a JSON array property + grouped count.
    "q_cypher_unwind" -> ((s, d) => {
      run(s, d,
        "MATCH (t:Twin) UNWIND t.tags AS tag " +
          "RETURN tag, count(*) AS n ORDER BY tag")
    }),

    // Cypher OPTIONAL MATCH: every nation-or-region twin with its region
    // if any (regions have no outgoing in_region edge → null).
    "q_cypher_optional" -> ((s, d) => {
      run(s, d,
        "MATCH (n:Twin) " +
          "WHERE n.`$metadata`.`$model` IN ['dtmi:graft:Region;1', 'dtmi:graft:Nation;1'] " +
          "OPTIONAL MATCH (n)-[r:in_region]->(g:Twin) " +
          "RETURN n.`$dtId` AS id, g.`$dtId` AS region_id ORDER BY id")
    }),

    // Cypher NOT EXISTS anti-join: twins that are nobody's located_in
    // target (= everything except nations).
    "q_cypher_not_exists" -> ((s, d) => {
      run(s, d,
        "MATCH (t:Twin) WHERE NOT EXISTS((t)<-[:located_in]-(x)) " +
          "RETURN t.`$dtId` AS id ORDER BY id")
    }),

    // Cypher collect() list aggregation: nations per region as a sorted
    // list (joined to a string for cross-engine hash parity — the list
    // itself is the operator under test).
    "q_cypher_collect" -> ((s, d) => {
      run(s, d,
        "MATCH (m:Twin)-[r:in_region]->(g:Twin) " +
          "RETURN g.`$dtId` AS region_id, collect(m.`$dtId`) AS nations " +
          "ORDER BY region_id")
        .select(col("region_id"), concat_ws(",", col("nations")).as("nations"))
    }),

    // Cypher DISTINCT aggregates: count(DISTINCT) and collect(DISTINCT)
    // over a fan-out join (members → nation → region), where the
    // duplicate-sensitive and duplicate-insensitive answers genuinely
    // differ — AGE executes these natively; Spark maps them to
    // count_distinct / collect_set.
    "q_cypher_count_distinct" -> ((s, d) => {
      run(s, d,
        "MATCH (m:Twin)-[r:located_in]->(n:Twin)-[r2:in_region]->(g:Twin) " +
          "RETURN g.`$dtId` AS region_id, " +
          "count(DISTINCT n.`$dtId`) AS n_nations, count(*) AS n_members, " +
          "collect(DISTINCT n.`$dtId`) AS nations ORDER BY region_id")
        .select(col("region_id"), col("n_nations"), col("n_members"),
          concat_ws(",", col("nations")).as("nations"))
    }),

    // VLE inside EXISTS (lifted r16 — AGE executes these natively): the
    // existential probe is the (start, end) reachability-pair frame of
    // the same Vle.range expansion a MATCH VLE plans, semi-joined against
    // the outer rows; the endpoint property map constrains the PATH END.
    // Members that reach the region named ASIA within 1..2 hops over
    // located_in|in_region (depth 2 = member->nation->region; depth-1
    // paths can't hit a region). Plus the NOT variant as an anti-join.
    "q_cypher_exists_vle" -> ((s, d) => {
      run(s, d,
        "MATCH (m:Twin) WHERE m.`$metadata`.`$model` = 'dtmi:graft:Customer;1' " +
          "AND EXISTS((m)-[:located_in|in_region*1..2]->(g:Twin {name: 'ASIA'})) " +
          "RETURN m.`$dtId` AS id ORDER BY id")
    }),

    // RETURN * with a live path binding (r17 — the last planner loud
    // error with a plausible user): the star expands the path as its
    // (nodes, rels, depth) columns, the same value surface
    // nodes(p)/relationships(p)/length(p) expose.
    "q_cypher_star_path" -> ((s, d) => {
      run(s, d,
        "MATCH p = (n:Twin)-[r:in_region]->(g:Twin) RETURN * ORDER BY n.`$dtId`")
        .select(col("n_dt_id"), col("g_dt_id"), col("r_relationship_id"),
          concat_ws(",", col("p_nodes")).as("path_nodes"),
          concat_ws(",", col("p_rels")).as("path_rels"),
          col("p_depth").as("depth"))
    }),

    // Frontier-seeded EXISTS-VLE (r17): a HIGHLY selective bound set — one
    // acctbal stripe of suppliers — in front of the same existential
    // expansion. The probe is seeded with the outer frame's distinct ids
    // (pure WHERE conjuncts plan before EXISTS), so the BFS does
    // O(cone-of-the-bound-set) work instead of O(graph); results must be
    // identical to the unseeded plan (the gate's oracle). Depth *1..3:
    // supplier -> nation (1) -> region (2); no depth-3 continuation exists.
    "q_cypher_exists_vle_seeded" -> ((s, d) => {
      run(s, d,
        "MATCH (m:Twin) WHERE m.`$metadata`.`$model` = 'dtmi:graft:Supplier;1' " +
          "AND m.acctbal > 7000.0 " +
          "AND EXISTS((m)-[:located_in|in_region*1..3]->(g:Twin {name: 'AMERICA'})) " +
          "RETURN m.`$dtId` AS id ORDER BY id")
    }),

    // OPTIONAL MATCH over a VLE with a null-SATISFIABLE main-WHERE
    // predicate forward-referencing the optional alias (r18, ADVICE r17):
    // nations DO reach a region (g.name set → row filtered); regions have
    // no outgoing in_region edge (genuine null-extension → kept). A plan
    // that frame-seeded the optional endpoint with `g.name IS NULL` would
    // empty the pair set, null-extend the NATIONS too, and wrongly return
    // them — the gate pins the sound result: exactly the 5 regions.
    "q_cypher_optional_vle" -> ((s, d) => {
      run(s, d,
        "MATCH (t:Twin) WHERE t.`$metadata`.`$model` IN " +
          "['dtmi:graft:Region;1', 'dtmi:graft:Nation;1'] AND g.name IS NULL " +
          "OPTIONAL MATCH (t)-[r:in_region*1..1]->(g:Twin) " +
          "RETURN t.`$dtId` AS id, g.`$dtId` AS gid ORDER BY id")
    }),

    // Numeric DISTINCT aggregates: avg/min/max/stDev over the distinct
    // value set, on a grouping where values genuinely repeat (acctbal
    // bucketed to hundreds, per nation) so avg(DISTINCT) differs from
    // avg. min/max(DISTINCT) are semantically identical to plain min/max
    // (AGE executes them; rejecting was pure friction — r16). Averages
    // are integer-valued-double ratios, rendered via the same
    // floor(x*1000 + 0.5) formula on both engines for bit parity.
    "q_cypher_avg_distinct" -> ((s, d) => {
      run(s, d,
        "MATCH (m:Twin)-[r:located_in]->(n:Twin) " +
          "WHERE m.`$metadata`.`$model` = 'dtmi:graft:Customer;1' " +
          "WITH n.`$dtId` AS nation_id, toInteger(floor(m.acctbal / 100)) AS buck " +
          "WITH nation_id, avg(buck) AS a_all, avg(DISTINCT buck) AS a_dist, " +
          "min(DISTINCT buck) AS mn, max(DISTINCT buck) AS mx, " +
          "stdev(DISTINCT buck) AS sd " +
          "RETURN nation_id, toInteger(floor(a_all * 1000 + 0.5)) AS a_all_i, " +
          "toInteger(floor(a_dist * 1000 + 0.5)) AS a_dist_i, " +
          "toInteger(mn) AS mn, toInteger(mx) AS mx, " +
          "toInteger(floor(sd * 1000 + 0.5)) AS sd_i ORDER BY nation_id")
    }),

    // Cypher RETURN * after a WITH horizon: the star projects the LIVE
    // horizon scope (retained entity bindings + flat columns), not the
    // pre-pipeline pattern bindings.
    "q_cypher_with_star" -> ((s, d) => {
      run(s, d,
        "MATCH (n:Twin)-[r:in_region]->(g:Twin) " +
          "WITH n, g.`$dtId` AS region_id " +
          "RETURN * ORDER BY n.`$dtId`")
        .select(col("n_dt_id"), col("n_model_id"), col("region_id"))
    }),

    // EXISTS pattern with an inline property map: the map constrains the
    // existential probe (semi-join against the filtered twin scan), not
    // the outer rows — members located in the nation named CHINA.
    "q_cypher_exists_props" -> ((s, d) => {
      run(s, d,
        "MATCH (t:Twin) WHERE EXISTS((t)-[:located_in]->(n {name: 'NATION_7'})) " +
          "RETURN t.`$dtId` AS id ORDER BY id")
    }),

    // Cypher shortestPath + length(p): minimal in-range hop count per
    // source reaching region R1 — the VLE pair set's depth column.
    "q_cypher_shortest" -> ((s, d) => {
      run(s, d,
        "MATCH p = shortestPath((m:Twin)-[*1..3]->(g:Twin)) " +
          "WHERE g.`$dtId` = 'R1' " +
          "RETURN m.`$dtId` AS src, length(p) AS hops ORDER BY src")
    }),

    // shortestPath with interior enumeration: one row per source reaching
    // region R1, carrying the canonical minimal path's node and edge
    // lists (deterministic tie-break, so oracle-comparable).
    "q_cypher_shortest_paths" -> ((s, d) => {
      run(s, d,
        "MATCH p = shortestPath((m:Twin)-[*1..3]->(g:Twin)) " +
          "WHERE g.`$dtId` = 'R1' " +
          "RETURN m.`$dtId` AS src, length(p) AS hops, " +
          "nodes(p) AS pnodes, relationships(p) AS prels ORDER BY src")
        .select(col("src"), col("hops"),
          concat_ws(">", col("pnodes")).as("pnodes"),
          concat_ws(">", col("prels")).as("prels"))
    }),

    // Cypher MATCH after a WITH horizon: aggregate members per nation,
    // filter on the aggregate, then hop the surviving nations to regions.
    "q_cypher_pipeline_match" -> ((s, d) => {
      run(s, d,
        "MATCH (m:Twin)-[r:located_in]->(n:Twin) " +
          "WITH n, count(*) AS members WHERE members > 65 " +
          "MATCH (n)-[r2:in_region]->(g:Twin) " +
          "RETURN n.`$dtId` AS nation, members, g.`$dtId` AS region " +
          "ORDER BY nation")
    }),

    // Cypher scalar functions in RETURN: toUpper / coalesce / size over
    // JSON docs (suppliers carry no mktsegment or tags → NONE / null).
    "q_cypher_scalar" -> ((s, d) => {
      run(s, d,
        "MATCH (t:Twin) WHERE t.`$metadata`.`$model` IN " +
          "['dtmi:graft:Customer;1', 'dtmi:graft:Supplier;1'] " +
          "RETURN t.`$dtId` AS id, toUpper(t.name) AS uname, " +
          "coalesce(t.mktsegment, 'NONE') AS seg, size(t.tags) AS n_tags " +
          "ORDER BY id")
    }),

    // Cypher arithmetic in WHERE + RETURN (precedence, parens): per-row
    // IEEE double ops are bit-deterministic on both engines, so the raw
    // doubles hash-match without fixed-point tricks.
    "q_cypher_arith" -> ((s, d) => {
      run(s, d,
        "MATCH (t:Twin) WHERE t.`$metadata`.`$model` = 'dtmi:graft:Customer;1' " +
          "AND t.acctbal >= 0 " +
          "RETURN t.`$dtId` AS id, (t.acctbal * 2 + 100) / 4 AS v ORDER BY id")
    }),

    // Cypher CASE (generic form) banding a numeric property.
    "q_cypher_case" -> ((s, d) => {
      run(s, d,
        "MATCH (t:Twin) WHERE t.`$metadata`.`$model` = 'dtmi:graft:Customer;1' " +
          "RETURN t.`$dtId` AS id, CASE WHEN t.acctbal >= 5000 THEN 'high' " +
          "WHEN t.acctbal >= 0 THEN 'mid' ELSE 'neg' END AS band ORDER BY id")
    }),

    // Cypher keys(): sorted property names of each twin doc (joined to a
    // string for cross-engine parity; per-model constants in the oracle
    // because to_json drops null struct fields).
    "q_cypher_keys" -> ((s, d) => {
      run(s, d, "MATCH (t:Twin) RETURN t.`$dtId` AS id, keys(t) AS ks ORDER BY id")
        .select(col("id"), concat_ws(",", col("ks")).as("ks"))
    }),

    // WITH ... ORDER BY ... LIMIT horizon: per-stage top-k (plans as
    // TakeOrdered, not a global sort) feeding the final projection.
    "q_cypher_with_topk" -> ((s, d) => {
      run(s, d,
        "MATCH (m:Twin)-[r:located_in]->(n:Twin) " +
          "WITH n, count(*) AS members ORDER BY members DESC, n.`$dtId` LIMIT 5 " +
          "RETURN n.`$dtId` AS nation, members ORDER BY nation")
    }),

    // OPTIONAL MATCH with a scoped WHERE: the predicate joins the
    // left-outer condition, so non-ASIA nations keep their row with a
    // null region instead of being dropped.
    "q_cypher_opt_where" -> ((s, d) => {
      run(s, d,
        "MATCH (n:Twin) WHERE n.`$metadata`.`$model` = 'dtmi:graft:Nation;1' " +
          "OPTIONAL MATCH (n)-[r:in_region]->(g:Twin) WHERE g.name = 'ASIA' " +
          "RETURN n.`$dtId` AS id, g.`$dtId` AS region_id ORDER BY id")
    }),

    // Cypher numeric/string scalar functions: toInteger (truncate toward
    // zero), abs, round, 0-based substring, literal replace, split.
    "q_cypher_strfns" -> ((s, d) => {
      run(s, d,
        "MATCH (t:Twin) WHERE t.`$metadata`.`$model` = 'dtmi:graft:Customer;1' " +
          "RETURN t.`$dtId` AS id, toInteger(t.acctbal) AS bal_int, " +
          "abs(t.acctbal) AS bal_abs, round(t.acctbal) AS bal_round, " +
          "substring(t.name, 0, 9) AS name9, " +
          "replace(t.mktsegment, 'URE', '*') AS seg2, " +
          "size(split(t.name, '#')) AS parts ORDER BY id")
    }),

    // Cypher list expressions: range(), list comprehension (filter +
    // projection), reduce(), head()/last() — oracle is the closed form of
    // each fold (triangular number, odd count), so the two engines compute
    // the answer by entirely different routes.
    "q_cypher_listexpr" -> ((s, d) => {
      run(s, d,
        "MATCH (t:Twin) WHERE t.`$metadata`.`$model` = 'dtmi:graft:Customer;1' " +
          "AND t.acctbal >= 0 " +
          "WITH t.`$dtId` AS id, toInteger(t.acctbal) % 5 + 2 AS n " +
          "RETURN id, reduce(s = 0, x IN range(1, n) | s + x) AS tri, " +
          "size([x IN range(1, n) WHERE x % 2 = 1]) AS odds, " +
          "head(range(1, n)) AS first_v, last(range(1, n)) AS last_v " +
          "ORDER BY id")
    }),

    // openCypher list-predicate quantifiers any/all/none/single —
    // desugared at parse into SIZE over list comprehensions; the WHERE
    // keeps customers whose bucket lands strictly inside 1..6 via
    // single(), and the projected flags exercise the other three.
    "q_cypher_listpred" -> ((s, d) => {
      run(s, d,
        "MATCH (t:Twin) WHERE t.`$metadata`.`$model` = 'dtmi:graft:Customer;1' " +
          "AND t.acctbal >= 0 " +
          "WITH t.`$dtId` AS id, toInteger(t.acctbal) % 7 AS n " +
          "WHERE single(x IN range(1, 6) WHERE x = n) " +
          "RETURN id, toInteger(n) AS n, " +
          "toInteger(CASE WHEN any(x IN range(1, n) WHERE x % 3 = 0) THEN 1 ELSE 0 END) AS has3, " +
          "toInteger(CASE WHEN all(x IN range(1, n) WHERE x < 4) THEN 1 ELSE 0 END) AS below4, " +
          "toInteger(CASE WHEN none(x IN range(1, n) WHERE x > 4) THEN 1 ELSE 0 END) AS none5 " +
          "ORDER BY id")
    }),

    // openCypher statistics aggregates (AGE executes these natively):
    // stdev/stdevP on exact integer cents, percentileDisc (smallest value
    // at cumulative ≥ q, row_number oracle), percentileCont (linear
    // interpolation; ×2 makes the half-point exact). Fixed-point outputs.
    "q_cypher_stats" -> ((s, d) => {
      run(s, d,
        "MATCH (t:Twin) WHERE t.`$metadata`.`$model` = 'dtmi:graft:Customer;1' " +
          "WITH toInteger(round(t.acctbal * 100)) AS cents " +
          "WITH count(*) AS n, stdev(cents) AS sd, stdevP(cents) AS sdp, " +
          "percentileDisc(cents, 0.5) AS p50d, percentileCont(cents, 0.5) AS p50c " +
          "RETURN n, toInteger(floor(sd + 0.5)) AS sd_i, " +
          "toInteger(floor(sdp + 0.5)) AS sdp_i, " +
          "toInteger(p50d) AS p50d_i, toInteger(p50c * 2) AS p50c_2")
    }),

    // openCypher small-group divergence guard: stDev over a group with a
    // single value answers 0 in Neo4j/AGE, NULL in vanilla Spark — the
    // planner coalesces. Per-customer groups are all size 1 by key.
    "q_cypher_stdev_single" -> ((s, d) => {
      run(s, d,
        "MATCH (t:Twin) WHERE t.`$metadata`.`$model` = 'dtmi:graft:Customer;1' " +
          "AND t.acctbal > 9900 " +
          "WITH t.`$dtId` AS id, toInteger(round(t.acctbal * 100)) AS cents " +
          "WITH id, stdev(cents) AS sd, stdevP(cents) AS sdp " +
          "RETURN id, sd, sdp ORDER BY id")
    }),

    // Cypher path accessors nodes(p)/relationships(p) over a bound
    // single-edge path.
    "q_cypher_nodes" -> ((s, d) => {
      run(s, d,
        "MATCH p = (n:Twin)-[r:in_region]->(g:Twin) " +
          "RETURN n.`$dtId` AS src, nodes(p) AS pnodes, relationships(p) AS prels " +
          "ORDER BY src")
        .select(col("src"), concat_ws(",", col("pnodes")).as("pnodes"),
          concat_ws(",", col("prels")).as("prels"))
    }),

    // Interior path enumeration over a bare bounded VLE (one row per
    // path, openCypher multiplicity): every *1..2 path in the place graph
    // — members>nation and member>nation>region chains — with full
    // node/edge lists. Exercises Vle.trails end to end.
    "q_cypher_path_nodes" -> ((s, d) => {
      run(s, d,
        "MATCH p = (a:Twin)-[*1..2]->(b:Twin) " +
          "RETURN nodes(p) AS pnodes, relationships(p) AS prels")
        .select(concat_ws(">", col("pnodes")).as("path_nodes"),
          concat_ws(">", col("prels")).as("path_rels"))
        .orderBy(col("path_nodes"), col("path_rels"))
    }),

    // The reference's own model-inheritance Cypher (QueryTests.cs:1201,
    // Models.cs:402-425): `_extends` edges between :Model nodes. The
    // :Model label ROUTES the plan onto the model-graph view — same
    // planner, same entry point the twin queries use (the reference's
    // unified AGE graph holds both node sets behind one endpoint).
    "q_cypher_model_extends" -> ((s, d) => {
      run(s, d,
        "MATCH (m:Model)-[e:_extends]->(p:Model) " +
          "RETURN m.id AS model, p.id AS parent")
        .orderBy(col("model"))
    }),

    // Ancestor closure = VLE over the model graph — reconstructs the
    // stored `bases` transitively from direct extends edges.
    "q_cypher_model_ancestors" -> ((s, d) => {
      run(s, d,
        "MATCH (m:Model)-[e:_extends*1..]->(a:Model) " +
          "RETURN m.id AS model, a.id AS ancestor")
        .orderBy(col("model"), col("ancestor"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_adt_startswith" ->
      """SELECT 'N' || n_nationkey AS dt_id, n_name AS name FROM nation
        |WHERE n_name LIKE 'A%' ORDER BY 1""".stripMargin,
    "q_adt_count_model" ->
      """SELECT CAST((SELECT count(*) FROM nation) + (SELECT count(*) FROM customer)
        |  + (SELECT count(*) FROM supplier) AS BIGINT) AS COUNT""".stripMargin,
    "q_adt_match_hop" ->
      """SELECT 'C' || c_custkey AS member_id, n_name AS nation_name
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE n_name = 'CHINA' ORDER BY 1""".stripMargin,
    "q_adt_join_related" ->
      """SELECT 'S' || s_suppkey AS member_id, r_name AS region_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' ORDER BY 1""".stripMargin,
    "q_adt_rel_filter" ->
      """SELECT 'N' || n_nationkey AS source_id, 'R' || n_regionkey AS target_id
        |FROM nation WHERE n_regionkey IN (0, 2) ORDER BY 1""".stripMargin,
    "q_adt_numeric" ->
      """SELECT 'C' || c_custkey AS dt_id FROM customer
        |WHERE c_acctbal > 9900 ORDER BY 1""".stripMargin,
    "q_adt_endswith" ->
      """SELECT 'R' || r_regionkey AS dt_id, r_name AS name FROM region
        |WHERE r_name LIKE '%A' ORDER BY 1""".stripMargin,
    "q_adt_contains" ->
      """SELECT CAST(count(*) AS BIGINT) AS COUNT FROM customer
        |WHERE c_mktsegment LIKE '%MACH%'""".stripMargin,
    "q_adt_array_contains" ->
      """SELECT 'C' || c_custkey AS dt_id FROM customer
        |WHERE c_mktsegment = 'BUILDING' ORDER BY 1""".stripMargin,
    "q_adt_is_defined" ->
      """SELECT CAST(count(*) AS BIGINT) AS COUNT FROM customer""".stripMargin,
    "q_adt_is_null" ->
      """SELECT CAST(count(*) AS BIGINT) AS COUNT FROM nation""".stripMargin,
    "q_adt_metadata_model" ->
      """SELECT CAST(count(*) AS BIGINT) AS COUNT FROM supplier""".stripMargin,
    "q_adt_typeof" ->
      """SELECT dt_id FROM (
        |  SELECT 'C' || c_custkey AS dt_id FROM customer
        |  UNION ALL SELECT 'S' || s_suppkey FROM supplier)
        |ORDER BY 1""".stripMargin,
    "q_adt_in_list" ->
      """SELECT dt_id FROM (
        |  SELECT 'R' || r_regionkey AS dt_id FROM region WHERE r_regionkey IN (0,2)
        |  UNION ALL SELECT 'N' || n_nationkey FROM nation WHERE n_nationkey = 5
        |  UNION ALL SELECT 'C' || c_custkey FROM customer WHERE c_custkey = 10)
        |ORDER BY 1""".stripMargin,
    "q_cypher_with_agg" ->
      """SELECT nation, n_members FROM (
        |  SELECT n_name AS nation, CAST(count(*) AS BIGINT) AS n_members
        |  FROM (SELECT c_nationkey AS k FROM customer
        |        UNION ALL SELECT s_nationkey FROM supplier) m
        |  JOIN nation ON k = n_nationkey GROUP BY 1)
        |WHERE n_members > 65 ORDER BY nation""".stripMargin,
    "q_cypher_unwind" ->
      """SELECT c_mktsegment AS tag, CAST(count(*) AS BIGINT) AS n
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_cypher_optional" ->
      """SELECT id, region_id FROM (
        |  SELECT 'R' || r_regionkey AS id, CAST(NULL AS VARCHAR) AS region_id FROM region
        |  UNION ALL SELECT 'N' || n_nationkey, 'R' || n_regionkey FROM nation)
        |ORDER BY id""".stripMargin,
    "q_cypher_not_exists" ->
      """SELECT id FROM (
        |  SELECT 'R' || r_regionkey AS id FROM region
        |  UNION ALL SELECT 'C' || c_custkey FROM customer
        |  UNION ALL SELECT 'S' || s_suppkey FROM supplier)
        |ORDER BY id""".stripMargin,
    "q_cypher_collect" ->
      """SELECT 'R' || n_regionkey AS region_id,
        |  string_agg('N' || n_nationkey, ',' ORDER BY 'N' || n_nationkey) AS nations
        |FROM nation GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_cypher_count_distinct" ->
      """WITH m2 AS (
        |  SELECT m.k, 'N' || n_nationkey AS nation_id,
        |    'R' || n_regionkey AS region_id
        |  FROM (SELECT c_nationkey AS k FROM customer
        |        UNION ALL SELECT s_nationkey FROM supplier) m
        |  JOIN nation ON m.k = n_nationkey),
        |agg AS (SELECT region_id,
        |    CAST(count(DISTINCT nation_id) AS BIGINT) AS n_nations,
        |    CAST(count(*) AS BIGINT) AS n_members
        |  FROM m2 GROUP BY 1),
        |lists AS (SELECT region_id,
        |    string_agg(nation_id, ',' ORDER BY nation_id) AS nations
        |  FROM (SELECT DISTINCT region_id, nation_id FROM m2) GROUP BY 1)
        |SELECT region_id, n_nations, n_members, nations
        |FROM agg JOIN lists USING (region_id) ORDER BY region_id""".stripMargin,
    "q_cypher_exists_vle" ->
      """SELECT 'C' || c_custkey AS id
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' ORDER BY id""".stripMargin,
    "q_cypher_star_path" ->
      """SELECT 'N' || n_nationkey AS n_dt_id,
        |  'R' || n_regionkey AS g_dt_id,
        |  'N' || n_nationkey || '-R' || n_regionkey AS r_relationship_id,
        |  'N' || n_nationkey || ',R' || n_regionkey AS path_nodes,
        |  'N' || n_nationkey || '-R' || n_regionkey AS path_rels,
        |  CAST(1 AS BIGINT) AS depth
        |FROM nation ORDER BY n_dt_id""".stripMargin,
    "q_cypher_exists_vle_seeded" ->
      """SELECT 'S' || s_suppkey AS id
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'AMERICA' AND s_acctbal > 7000.0 ORDER BY id""".stripMargin,
    "q_cypher_optional_vle" ->
      """SELECT 'R' || r_regionkey AS id, CAST(NULL AS VARCHAR) AS gid
        |FROM region ORDER BY id""".stripMargin,
    "q_cypher_avg_distinct" ->
      """WITH m2 AS (
        |  SELECT 'N' || c_nationkey AS nation_id,
        |    CAST(floor(c_acctbal / 100) AS BIGINT) AS buck
        |  FROM customer)
        |SELECT nation_id,
        |  CAST(floor(avg(buck) * 1000 + 0.5) AS BIGINT) AS a_all_i,
        |  CAST(floor(avg(DISTINCT buck) * 1000 + 0.5) AS BIGINT) AS a_dist_i,
        |  CAST(min(buck) AS BIGINT) AS mn,
        |  CAST(max(buck) AS BIGINT) AS mx,
        |  CAST(floor(stddev_samp(DISTINCT buck) * 1000 + 0.5) AS BIGINT) AS sd_i
        |FROM m2 GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_cypher_with_star" ->
      """SELECT 'N' || n_nationkey AS n_dt_id,
        |  'dtmi:graft:Nation;1' AS n_model_id,
        |  'R' || n_regionkey AS region_id
        |FROM nation ORDER BY n_dt_id""".stripMargin,
    "q_cypher_exists_props" ->
      """WITH chn AS (SELECT n_nationkey AS k FROM nation WHERE n_name = 'NATION_7'),
        |members AS (SELECT 'C' || c_custkey AS id, c_nationkey AS k FROM customer
        |  UNION ALL SELECT 'S' || s_suppkey, s_nationkey FROM supplier)
        |SELECT id FROM members JOIN chn USING (k) ORDER BY id""".stripMargin,
    "q_cypher_pipeline_match" ->
      """SELECT 'N' || n_nationkey AS nation, CAST(cnt AS BIGINT) AS members,
        |  'R' || n_regionkey AS region
        |FROM (SELECT k, count(*) AS cnt
        |      FROM (SELECT c_nationkey AS k FROM customer
        |            UNION ALL SELECT s_nationkey FROM supplier)
        |      GROUP BY 1) m
        |JOIN nation ON k = n_nationkey
        |WHERE cnt > 65 ORDER BY nation""".stripMargin,
    "q_cypher_scalar" ->
      """SELECT id, uname, seg, n_tags FROM (
        |  SELECT 'C' || c_custkey AS id, upper(c_name) AS uname,
        |    c_mktsegment AS seg, CAST(1 AS INT) AS n_tags FROM customer
        |  UNION ALL
        |  SELECT 'S' || s_suppkey, upper(s_name), 'NONE', CAST(NULL AS INT)
        |  FROM supplier)
        |ORDER BY id""".stripMargin,
    "q_cypher_arith" ->
      """SELECT 'C' || c_custkey AS id, (c_acctbal * 2 + 100) / 4 AS v
        |FROM customer WHERE c_acctbal >= 0 ORDER BY 1""".stripMargin,
    "q_cypher_case" ->
      """SELECT 'C' || c_custkey AS id,
        |  CASE WHEN c_acctbal >= 5000 THEN 'high'
        |       WHEN c_acctbal >= 0 THEN 'mid' ELSE 'neg' END AS band
        |FROM customer ORDER BY 1""".stripMargin,
    "q_cypher_keys" ->
      """SELECT id, ks FROM (
        |  SELECT 'R' || r_regionkey AS id, '$dtId,name' AS ks FROM region
        |  UNION ALL SELECT 'N' || n_nationkey, '$dtId,name' FROM nation
        |  UNION ALL SELECT 'C' || c_custkey, '$dtId,acctbal,mktsegment,name,tags'
        |    FROM customer
        |  UNION ALL SELECT 'S' || s_suppkey, '$dtId,acctbal,name' FROM supplier)
        |ORDER BY id""".stripMargin,
    "q_cypher_with_topk" ->
      """SELECT nation, members FROM (
        |  SELECT 'N' || k AS nation, CAST(cnt AS BIGINT) AS members,
        |    row_number() OVER (ORDER BY cnt DESC, 'N' || k) rn
        |  FROM (SELECT k, count(*) cnt
        |        FROM (SELECT c_nationkey AS k FROM customer
        |              UNION ALL SELECT s_nationkey FROM supplier)
        |        GROUP BY 1))
        |WHERE rn <= 5 ORDER BY nation""".stripMargin,
    "q_cypher_opt_where" ->
      """SELECT 'N' || n_nationkey AS id, 'R' || r_regionkey AS region_id
        |FROM nation LEFT JOIN region
        |  ON n_regionkey = r_regionkey AND r_name = 'ASIA'
        |ORDER BY 1""".stripMargin,
    // bal_round: + 0.0 canonicalizes IEEE negative zero — DuckDB's round
    // keeps -0.0 for balances in (-0.5, 0), Spark's BigDecimal HALF_UP
    // never emits it; the values are numerically equal and stringify
    // differently (first seen at sf1, where the generated balances hit
    // the interval)
    "q_cypher_strfns" ->
      """SELECT 'C' || c_custkey AS id,
        |  CAST(trunc(c_acctbal) AS BIGINT) AS bal_int,
        |  abs(c_acctbal) AS bal_abs,
        |  round(c_acctbal, 0) + 0.0 AS bal_round,
        |  substr(c_name, 1, 9) AS name9,
        |  replace(c_mktsegment, 'URE', '*') AS seg2,
        |  CAST(len(string_split(c_name, '#')) AS INT) AS parts
        |FROM customer ORDER BY 1""".stripMargin,
    "q_cypher_stats" ->
      """WITH c AS (SELECT CAST(round(c_acctbal * 100, 0) AS BIGINT) AS cents
        |  FROM customer),
        |ranked AS (SELECT cents, row_number() OVER (ORDER BY cents) rn,
        |  count(*) OVER () n FROM c)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM c) AS n,
        |  (SELECT CAST(floor(stddev_samp(cents) + 0.5) AS BIGINT) FROM c) AS sd_i,
        |  (SELECT CAST(floor(stddev_pop(cents) + 0.5) AS BIGINT) FROM c) AS sdp_i,
        |  (SELECT CAST(cents AS BIGINT) FROM ranked
        |   WHERE rn = greatest(CAST(ceil(0.5 * n) AS BIGINT), 1)) AS p50d_i,
        |  (SELECT CAST(quantile_cont(cents, 0.5) * 2 AS BIGINT) FROM c) AS p50c_2""".stripMargin,

    "q_cypher_stdev_single" ->
      """SELECT 'C' || c_custkey AS id,
        |  coalesce(stddev_samp(CAST(round(c_acctbal * 100, 0) AS BIGINT)), 0.0) AS sd,
        |  coalesce(stddev_pop(CAST(round(c_acctbal * 100, 0) AS BIGINT)), 0.0) AS sdp
        |FROM customer WHERE c_acctbal > 9900
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_cypher_listexpr" ->
      """WITH b AS (SELECT 'C' || c_custkey AS id,
        |  CAST(trunc(c_acctbal) AS BIGINT) % 5 + 2 AS n
        |  FROM customer WHERE c_acctbal >= 0)
        |SELECT id, n*(n+1)//2 AS tri, CAST((n+1)//2 AS INT) AS odds,
        |  CAST(1 AS BIGINT) AS first_v, n AS last_v
        |FROM b ORDER BY id""".stripMargin,

    // quantifier truth tables over range(1, n), n in 1..6:
    // any x%3=0 ⇔ n>=3; all x<4 ⇔ n<=3; none x>4 ⇔ n<=4
    "q_cypher_listpred" ->
      """WITH b AS (SELECT 'C' || c_custkey AS id,
        |  CAST(trunc(c_acctbal) AS BIGINT) % 7 AS n
        |  FROM customer WHERE c_acctbal >= 0)
        |SELECT id, n,
        |  CAST(CASE WHEN n >= 3 THEN 1 ELSE 0 END AS BIGINT) AS has3,
        |  CAST(CASE WHEN n <= 3 THEN 1 ELSE 0 END AS BIGINT) AS below4,
        |  CAST(CASE WHEN n <= 4 THEN 1 ELSE 0 END AS BIGINT) AS none5
        |FROM b WHERE n BETWEEN 1 AND 6 ORDER BY id""".stripMargin,

    "q_cypher_nodes" ->
      """SELECT 'N' || n_nationkey AS src,
        |  'N' || n_nationkey || ',R' || n_regionkey AS pnodes,
        |  'N' || n_nationkey || '-R' || n_regionkey AS prels
        |FROM nation ORDER BY 1""".stripMargin,
    "q_cypher_path_nodes" ->
      """WITH e AS (
        |  SELECT 'N' || n_nationkey AS sid, 'R' || n_regionkey AS tid,
        |         'N' || n_nationkey || '-R' || n_regionkey AS rid FROM nation
        |  UNION ALL
        |  SELECT 'C' || c_custkey, 'N' || c_nationkey,
        |         'C' || c_custkey || '-N' || c_nationkey FROM customer
        |  UNION ALL
        |  SELECT 'S' || s_suppkey, 'N' || s_nationkey,
        |         'S' || s_suppkey || '-N' || s_nationkey FROM supplier),
        |p1 AS (SELECT sid || '>' || tid AS path_nodes, rid AS path_rels,
        |              sid, tid FROM e),
        |p2 AS (SELECT p1.path_nodes || '>' || e.tid AS path_nodes,
        |              p1.path_rels || '>' || e.rid AS path_rels
        |       FROM p1 JOIN e ON p1.tid = e.sid)
        |SELECT path_nodes, path_rels FROM (
        |  SELECT path_nodes, path_rels FROM p1
        |  UNION ALL SELECT path_nodes, path_rels FROM p2)
        |ORDER BY 1, 2""".stripMargin,
    "q_cypher_shortest_paths" ->
      """SELECT src, hops, pnodes, prels FROM (
        |  SELECT 'N' || n_nationkey AS src, CAST(1 AS BIGINT) AS hops,
        |         'N' || n_nationkey || '>R1' AS pnodes,
        |         'N' || n_nationkey || '-R1' AS prels
        |  FROM nation WHERE n_regionkey = 1
        |  UNION ALL
        |  SELECT 'C' || c_custkey, CAST(2 AS BIGINT),
        |         'C' || c_custkey || '>N' || c_nationkey || '>R1',
        |         'C' || c_custkey || '-N' || c_nationkey || '>N' || c_nationkey || '-R1'
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  WHERE n_regionkey = 1
        |  UNION ALL
        |  SELECT 'S' || s_suppkey, CAST(2 AS BIGINT),
        |         'S' || s_suppkey || '>N' || s_nationkey || '>R1',
        |         'S' || s_suppkey || '-N' || s_nationkey || '>N' || s_nationkey || '-R1'
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_regionkey = 1)
        |ORDER BY src""".stripMargin,
    "q_cypher_shortest" ->
      """SELECT src, hops FROM (
        |  SELECT 'N' || n_nationkey AS src, CAST(1 AS BIGINT) AS hops
        |  FROM nation WHERE n_regionkey = 1
        |  UNION ALL
        |  SELECT 'C' || c_custkey, CAST(2 AS BIGINT)
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  WHERE n_regionkey = 1
        |  UNION ALL
        |  SELECT 'S' || s_suppkey, CAST(2 AS BIGINT)
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_regionkey = 1)
        |ORDER BY src""".stripMargin,
    // the model catalog is code-defined (GraphViews.models), so the
    // oracle is its literal direct-extends edge list
    "q_cypher_model_extends" ->
      """SELECT model, parent FROM (VALUES
        |  ('dtmi:graft:Customer;1', 'dtmi:graft:Nation;1'),
        |  ('dtmi:graft:Nation;1',   'dtmi:graft:Region;1'),
        |  ('dtmi:graft:Region;1',   'dtmi:graft:Place;1'),
        |  ('dtmi:graft:Supplier;1', 'dtmi:graft:Nation;1'))
        |  AS t(model, parent)
        |ORDER BY model""".stripMargin,
    "q_cypher_model_ancestors" ->
      """SELECT model, ancestor FROM (VALUES
        |  ('dtmi:graft:Customer;1', 'dtmi:graft:Nation;1'),
        |  ('dtmi:graft:Customer;1', 'dtmi:graft:Place;1'),
        |  ('dtmi:graft:Customer;1', 'dtmi:graft:Region;1'),
        |  ('dtmi:graft:Nation;1',   'dtmi:graft:Place;1'),
        |  ('dtmi:graft:Nation;1',   'dtmi:graft:Region;1'),
        |  ('dtmi:graft:Region;1',   'dtmi:graft:Place;1'),
        |  ('dtmi:graft:Supplier;1', 'dtmi:graft:Nation;1'),
        |  ('dtmi:graft:Supplier;1', 'dtmi:graft:Place;1'),
        |  ('dtmi:graft:Supplier;1', 'dtmi:graft:Region;1'))
        |  AS t(model, ancestor)
        |ORDER BY model, ancestor""".stripMargin
  )
}
