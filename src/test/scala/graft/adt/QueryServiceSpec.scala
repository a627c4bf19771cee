package graft.adt

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.{TwinGraph, Vle}
import graft.json.Json
import graft.store.TwinStore

/** Pagination/continuation (B18), charge (B20), read-only guard (B19),
  * component API (D12), vector search (B16), unbounded VLE (B7) — the
  * reference's QueryTests.cs:957-1076 pagination scenarios et al. */
class QueryServiceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val model =
    """{"@id":"dtmi:p;1","@type":"Interface","contents":[
      |{"@type":"Property","name":"name","schema":"string"},
      |{"@type":"Property","name":"idx","schema":"integer"},
      |{"@type":"Property","name":"emb","schema":{"@type":"Array","elementSchema":"double"}},
      |{"@type":"Component","name":"engine","schema":"dtmi:comp;1"},
      |{"@type":"Relationship","name":"next"}]}""".stripMargin
  val compModel =
    """{"@id":"dtmi:comp;1","@type":"Interface","contents":[
      |{"@type":"Property","name":"power","schema":"double"}]}""".stripMargin

  lazy val store: TwinStore = {
    val s = new TwinStore(() => "2026-01-01T00:00:00Z")
    s.createModels(Seq(model, compModel))
    for (i <- 0 until 25)
      s.createOrReplaceTwin(f"t$i%03d",
        s"""{"$$metadata":{"$$model":"dtmi:p;1"},"name":"N$i","idx":$i,
           |"emb":[${i * 1.0}, ${i * 2.0}],
           |"engine":{"power":${i * 10.0}}}""".stripMargin)
    for (i <- 0 until 24) // chain t000 -> t001 -> ... -> t024
      s.createOrReplaceRelationship(f"t$i%03d", s"r$i",
        f"""{"$$relationshipName":"next","$$targetId":"t${i + 1}%03d"}""")
    s
  }

  lazy val graph: TwinGraph = store.toGraph(spark)
  lazy val svc = new QueryService(graph)

  test("pagination: stable pages, token round-trip, full coverage") {
    val page1 = svc.query("SELECT T.$dtId AS id FROM DIGITALTWINS T", maxItemsPerPage = 10)
    assert(page1.rows.size == 10)
    assert(page1.continuationToken.isDefined)
    val page2 = svc.query("ignored-when-token-present", 10, page1.continuationToken)
    val page3 = svc.query("x", 10, page2.continuationToken)
    assert(page3.rows.size == 5 && page3.continuationToken.isEmpty)
    val all = (page1.rows ++ page2.rows ++ page3.rows)
      .map(r => Json.get(Json.parse(r), "/id").get.asText())
    assert(all == all.sorted && all.distinct.size == 25, "pages are disjoint + ordered")
  }

  test("queryAll streams every page") {
    val pages = svc.queryAll("SELECT T.$dtId AS id FROM DIGITALTWINS T", 7).toSeq
    assert(pages.map(_.rows.size).sum == 25)
    assert(pages.size == 4)
  }

  test("charge: rows + properties, +5 for COUNT/IS_OF_MODEL") {
    val p = svc.query("SELECT T.$dtId AS id, T.name AS n FROM DIGITALTWINS T", 5)
    assert(p.charge == 5 + 5 * 2) // 5 rows + 2 scalar props each
    val c = svc.query("SELECT COUNT() FROM DIGITALTWINS")
    assert(c.charge == 1 + 1 + 5) // 1 row + 1 prop + 5 agg surcharge
    val m = svc.query("SELECT COUNT() FROM DIGITALTWINS WHERE IS_OF_MODEL('dtmi:p;1')")
    assert(m.charge == 1 + 1 + 5)
    // +10 variable-length-edge surcharge (Query.cs:240-257)
    val v = svc.query(
      "SELECT T.$dtId AS id FROM DIGITALTWINS MATCH (S)-[r:next*1..2]->(T) " +
        "WHERE S.$dtId = 't000'")
    assert(v.charge == 2 + 2 + 10) // t001,t002 rows + 1 prop each + VLE
    // aggregates inside a WITH stage also trigger the +5 surcharge
    val w = svc.query(
      "MATCH (a:Twin)-[r:next]->(b:Twin) WITH count(*) AS n RETURN n")
    assert(w.charge == 1 + 1 + 5)
  }

  test("read-only guard rejects mutating keywords (B19)") {
    val e = intercept[AdtPlanException](
      svc.query("SELECT T FROM DIGITALTWINS T WHERE name = 'x' CREATE (n:Twin)"))
    assert(e.getMessage.contains("read-only"))
  }

  test("charge-weighted rate limiting (B20 policy)") {
    var now = 0L
    val limiter = new RateLimiter(budgetPerWindow = 100, windowMillis = 1000,
      clock = () => now)
    val limited = new QueryService(graph, Some(limiter))
    // each page: 25 rows × (1 + 1 prop) = 50 charge
    limited.query("SELECT T.$dtId AS id FROM DIGITALTWINS T")
    limited.query("SELECT T.$dtId AS id FROM DIGITALTWINS T")
    val e = intercept[QueryThrottledException](
      limited.query("SELECT T.$dtId AS id FROM DIGITALTWINS T"))
    assert(e.getMessage.contains("budget"))
    now = 1500 // window rolls
    limited.query("SELECT T.$dtId AS id FROM DIGITALTWINS T")
  }

  test("component get/update (D12)") {
    val c = store.getComponent("t003", "engine")
    assert(Json.get(c, "/power").get.asDouble() == 30.0)
    store.updateComponent("t003", "engine",
      """[{"op":"replace","path":"/power","value":99.5}]""")
    assert(Json.get(store.getComponent("t003", "engine"), "/power").get.asDouble() == 99.5)
    assertThrows[graft.store.StoreException](store.getComponent("t003", "noSuch"))
  }

  test("vector search (B16): nearest twins by L2 over a JSON embedding") {
    val out = graph.vectorSearch("emb", Seq(10.0, 20.0), k = 3).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("t010", "t009", "t011"))
    assert(out.head.getDouble(2) == 0.0)
  }

  test("VLE charge telemetry (B20): observed iterations + frontier peak") {
    // VLE query → telemetry shows traversal work and the +10 surcharge is
    // derived from it (Query.cs:240-257's flat flag, now observed)
    val v = svc.query(
      "SELECT T.$dtId AS id FROM DIGITALTWINS MATCH (S)-[r:next*1..2]->(T) " +
        "WHERE S.$dtId = 't000'")
    assert(v.vleIterations >= 1, s"expected observed iterations, got $v")
    assert(v.charge == 2 + 2 + 10)
    // non-VLE query: zero telemetry, no surcharge
    val p = svc.query("SELECT T.$dtId AS id FROM DIGITALTWINS T", 5)
    assert(p.vleIterations == 0 && p.vleFrontierPeak == 0L)
    // BFS regime on the 25-chain: 24 rounds to closure, the widest
    // frontier is the 24 depth-1 pairs, surcharge derives from the work
    val m = new Vle.Metrics
    val reach = Vle.withMetrics(m) {
      Vle.reachability(graph.relationships, relNames = Seq("next"))
    }
    assert(reach.count() == 25 * 24 / 2)
    assert(m.iterations == 24, s"iterations ${m.iterations}")
    assert(m.frontierPeak == 24L, s"frontier peak ${m.frontierPeak}")
    assert(m.observedVle && m.surcharge == 10.0)
  }

  test("unbounded VLE (B7): full chain reachability with minimal depths") {
    val reach = Vle.reachability(graph.relationships, relNames = Seq("next"))
    assert(reach.count() == 25 * 24 / 2) // all ordered pairs in a 25-chain
    val fromStart = reach.filter(org.apache.spark.sql.functions.col("start_id") === "t000")
    assert(fromStart.count() == 24)
    val d = fromStart.filter(org.apache.spark.sql.functions.col("end_id") === "t024")
      .collect()(0).getInt(2)
    assert(d == 24)
  }

  test("malformed continuation tokens are a typed client error, never a 500") {
    val bad = Seq(
      "not-base64!!",                                            // decode fails
      java.util.Base64.getEncoder.encodeToString(
        "this is not json".getBytes("UTF-8")),                   // parse fails
      java.util.Base64.getEncoder.encodeToString(
        "{}".getBytes("UTF-8")),                                 // fields missing
      java.util.Base64.getEncoder.encodeToString(
        """{"query": null, "rowNumber": "NaN"}""".getBytes("UTF-8")),
      // present-but-non-textual pin: Jackson asText() on an object yields
      // "" — must be the typed 400, not a silent empty snapshot key
      java.util.Base64.getEncoder.encodeToString(
        """{"query": "MATCH (t:Twin) RETURN t", "rowNumber": 1, "pin": {"a": 1}}"""
          .getBytes("UTF-8")),
      java.util.Base64.getEncoder.encodeToString(
        """{"query": "MATCH (t:Twin) RETURN t", "rowNumber": 1, "pin": [1, 2]}"""
          .getBytes("UTF-8")))
    bad.foreach { tok =>
      val e = intercept[AdtPlanException] {
        svc.query("SELECT T FROM DIGITALTWINS T", 10, Some(tok))
      }
      assert(e.getMessage.contains("continuation token"), s"token $tok: $e")
    }
  }

  test("in-memory TwinStore.graphAt: log replay reproduces a past version") {
    val st = new graft.store.TwinStore()
    st.createModels(Seq(
      """{"@id":"dtmi:gq;1","@type":"Interface","contents":[
        |  {"@type":"Property","name":"name","schema":"string"},
        |  {"@type":"Relationship","name":"next"}]}""".stripMargin))
    def twin(id: String, nm: String) =
      s"""{"$$metadata":{"$$model":"dtmi:gq;1"},"name":"$nm"}"""
    st.createOrReplaceTwin("a", twin("a", "A"))
    st.createOrReplaceTwin("b", twin("b", "B"))
    st.createOrReplaceRelationship("a", "r1",
      """{"$relationshipName":"next","$targetId":"b"}""")
    val v = st.currentSeq
    // post-version writes: a new twin, a rel delete, a patch
    st.createOrReplaceTwin("c", twin("c", "C"))
    st.deleteRelationship("a", "r1")
    st.patchTwin("a", """[{"op":"replace","path":"/name","value":"A2"}]""")
    val past = st.graphAt(spark, v)
    assert(past.twins.select("dt_id").collect().map(_.getString(0)).sorted
      .toSeq == Seq("a", "b"))
    assert(past.relationships.count() == 1)
    assert(Json.get(Json.parse(past.twins
        .filter(org.apache.spark.sql.functions.col("dt_id") === "a")
        .select("properties").collect()(0).getString(0)), "/name")
      .get.asText() == "A")
    val now = st.toGraph(spark)
    assert(now.twins.count() == 3 && now.relationships.count() == 0)
  }

  test("version-pinned continuation: page 2 survives writes AND pin eviction") {
    // a table-backed store so graphAt(seq) is available
    val dir = graft.core.Scratch.dir("graft_qs_verpin_", "a")
    val st = graft.store.TableTwinStore.open(spark, dir,
      () => "2026-01-01T00:00:00Z")
    st.createModels(Seq(
      """{"@id":"dtmi:p;1","@type":"Interface","contents":[
        |  {"@type":"Property","name":"name","schema":"string"},
        |  {"@type":"Property","name":"idx","schema":"integer"}]}""".stripMargin))
    for (i <- 0 until 12)
      st.createOrReplaceTwin(f"t$i%03d",
        s"""{"$$metadata":{"$$model":"dtmi:p;1"},"name":"N$i","idx":$i}""")
    def versionedOf(s: graft.store.TableTwinStore) = new VersionedGraphSource {
      def currentVersion: Long = s.currentSeq
      def graphAt(v: Long): TwinGraph = s.graphAt(v)
    }
    val qs1 = new QueryService(st.graph, None, new SnapshotCache(),
      Some(versionedOf(st)))
    val q = "SELECT T.$dtId AS id FROM DIGITALTWINS T"
    val page1 = qs1.query(q, maxItemsPerPage = 8)
    assert(page1.rows.size == 8 && page1.continuationToken.isDefined)
    // the token carries the pinned store version
    val tokJson = Json.parse(new String(java.util.Base64.getDecoder
      .decode(page1.continuationToken.get), "UTF-8"))
    assert(tokJson.get("v") != null && tokJson.get("v").isNumber,
      s"token must carry the pinned version: $tokJson")
    val pinnedV = tokJson.get("v").asLong()
    // writes land between pages: new twins that WOULD sort into page 2
    st.createOrReplaceTwin("t0aa",
      s"""{"$$metadata":{"$$model":"dtmi:p;1"},"name":"X","idx":99}""")
    st.createOrReplaceTwin("t999",
      s"""{"$$metadata":{"$$model":"dtmi:p;1"},"name":"Y","idx":98}""")
    assert(st.currentSeq > pinnedV)
    // the pin is LOST: a restarted service over the post-write graph with
    // a cold cache — the worst case (eviction + restart at once)
    val qs2 = new QueryService(st.graph, None, new SnapshotCache(),
      Some(versionedOf(st)))
    val page2 = qs2.query("ignored", 8, page1.continuationToken)
    val ids = (page1.rows ++ page2.rows)
      .map(r => Json.get(Json.parse(r), "/id").get.asText())
    assert(ids.toSet == (0 until 12).map(i => f"t$i%03d").toSet,
      s"pages must reflect the PINNED version, got $ids")
    assert(page2.continuationToken.isEmpty)
    // negative control: without a versioned source the rebuilt pin sees
    // current data — the new twins leak into page 2 (the degraded mode
    // this feature removes)
    val qs3 = new QueryService(st.graph, None, new SnapshotCache(), None)
    val page2cur = qs3.query("ignored", 8, page1.continuationToken)
    val idsCur = page2cur.rows
      .map(r => Json.get(Json.parse(r), "/id").get.asText())
    assert(idsCur.contains("t999") || idsCur.contains("t0aa"),
      s"control: current-data rebuild should see the writes, got $idsCur")
  }
}
