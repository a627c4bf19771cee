package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.store.TableTwinStore

/** The durable write path (SURVEY §2 B15/D1-D5/D13 at rest) as a
  * driver-contract gate: a [[TableTwinStore]] is populated with CRUD calls
  * derived deterministically from the `nation` table (batch create → JSON
  * patches → deletes), checkpointed to its columnar snapshot, then REOPENED
  * — a real restart: models, snapshot and journal all re-read from disk —
  * and queried. The oracle reconstructs the surviving state in plain SQL,
  * so the whole journal→merge→snapshot→restore cycle is value-checked, not
  * just shape-checked.
  *
  * Reference: MERGE-upsert semantics of
  * /root/reference/src/AgeDigitalTwins/AgeDigitalTwinsClient.DigitalTwins.cs:470-474
  * and Relationships.cs:384-389, re-expressed as set-wise anti-join+union
  * folds over a parquet journal (graft.store.GraphStore/TableTwinStore).
  */
object StoreQueries {

  private val NationModel = "dtmi:graft:Nation;1"

  /** Deterministic store build: same inputs → same directory contents.
    * Rebuilt from scratch on every call so repeated Verify/Bench runs are
    * idempotent. */
  private def buildRoundtripStore(s: SparkSession, d: String): String = {
    val dir = graft.core.Scratch.dir("graft_store_rt_", d)
    val clock = () => "2026-01-01T00:00:00Z"
    val st = TableTwinStore.open(s, dir, clock)
    st.createModels(Seq(
      s"""{"@id":"$NationModel","@type":"Interface","contents":[
         |{"@type":"Property","name":"name","schema":"string"}]}""".stripMargin))
    val nations = graft.core.Td.nation(s, d)
      .select(col("n_nationkey").cast("long"), col("n_name"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    // D5 batch create (one journal append for the whole batch)
    st.createOrReplaceTwins(nations.toSeq.map { case (k, name) =>
      s"""{"$$dtId":"N$k","$$metadata":{"$$model":"$NationModel"},"name":"$name"}"""
    })
    // D3 JSON-patch a deterministic subset; D4 delete another — grouped
    // into one journal append each (the batch primitive)
    st.batch {
      nations.filter(_._1 % 5 == 0).foreach { case (k, name) =>
        st.patchTwin(s"N$k",
          s"""[{"op":"replace","path":"/name","value":"$name-patched"}]""")
      }
    }
    st.batch {
      nations.filter(_._1 % 7 == 3).foreach { case (k, _) => st.deleteTwin(s"N$k") }
    }
    st.checkpoint()
    dir
  }

  /** Store with RETAINED checkpoints for the time-travel gate: create all
    * nations (seqs 1..N), retain-checkpoint, then patch/delete a subset
    * (seqs N+1..), retain-checkpoint again. Returns (dir, N) — N is the
    * seq at which the store held exactly the unmodified nation set. */
  private def buildTimeTravelStore(s: SparkSession, d: String): (String, Long) = {
    val dir = graft.core.Scratch.dir("graft_store_tt_", d)
    val clock = () => "2026-01-01T00:00:00Z"
    val st = TableTwinStore.open(s, dir, clock)
    st.createModels(Seq(
      s"""{"@id":"$NationModel","@type":"Interface","contents":[
         |{"@type":"Property","name":"name","schema":"string"}]}""".stripMargin))
    val nations = graft.core.Td.nation(s, d)
      .select(col("n_nationkey").cast("long"), col("n_name"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    st.createOrReplaceTwins(nations.toSeq.map { case (k, name) =>
      s"""{"$$dtId":"N$k","$$metadata":{"$$model":"$NationModel"},"name":"$name"}"""
    })
    st.checkpoint(retain = true) // base: pristine nation set at seq N
    st.batch {
      nations.filter(_._1 % 5 == 0).foreach { case (k, name) =>
        st.patchTwin(s"N$k",
          s"""[{"op":"replace","path":"/name","value":"$name-patched"}]""")
      }
    }
    st.batch {
      nations.filter(_._1 % 7 == 3).foreach { case (k, _) => st.deleteTwin(s"N$k") }
    }
    st.checkpoint(retain = true)
    (dir, nations.length.toLong)
  }

  private val CustomerModel = "dtmi:graft:Customer;1"

  /** Store whose mutation log carries a deterministic multi-day twin
    * LIFECYCLE: customer k (< 300) is created on day k%3 and patched on
    * day k%3 + 1 + k%2, with the injected clock advanced between batches.
    * The journal then holds one Create + one Update row per twin with
    * real per-day timestamps — the same rows the A9 CDC stream yields —
    * which the time-series operators (§2.F) consume directly. */
  private def buildLifecycleStore(s: SparkSession, d: String): String = {
    val dir = graft.core.Scratch.dir("graft_store_lc_", d)
    var today = "2026-01-01T00:00:00Z"
    val st = TableTwinStore.open(s, dir, () => today)
    st.createModels(Seq(
      s"""{"@id":"$CustomerModel","@type":"Interface","contents":[
         |{"@type":"Property","name":"name","schema":"string"}]}""".stripMargin))
    val keys = graft.core.Td.customer(s, d)
      .filter(col("c_custkey") < 300)
      .select(col("c_custkey").cast("long"))
      .collect().map(_.getLong(0)).sorted
    def doc(k: Long) =
      s"""{"$$dtId":"C$k","$$metadata":{"$$model":"$CustomerModel"},"name":"c$k"}"""
    // creates: cohort day = k % 3 (Jan 1-3), one journal append per day
    (0L to 2L).foreach { day =>
      today = s"2026-01-0${1 + day}T00:00:00Z"
      st.batch { keys.filter(_ % 3 == day).foreach(k => st.createOrReplaceTwin(s"C$k", doc(k))) }
    }
    // second activity: patch on day k%3 + 1 + k%2 (Jan 2-5)
    (1L to 4L).foreach { day =>
      today = s"2026-01-0${1 + day}T00:00:00Z"
      st.batch {
        keys.filter(k => k % 3 + 1 + k % 2 == day).foreach(k =>
          st.patchTwin(s"C$k",
            s"""[{"op":"replace","path":"/name","value":"c$k-active"}]"""))
      }
    }
    dir
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_store_roundtrip" -> ((s, d) => {
      val dir = buildRoundtripStore(s, d)
      // restart: a fresh store instance re-reads meta/models/snapshot/journal
      TableTwinStore.open(s, dir, () => "2026-01-01T00:00:01Z").graph.twins
        .select(col("dt_id"), col("model_id"),
          get_json_object(col("properties"), "$.name").as("name"))
        .orderBy(col("dt_id"))
    }),

    // Time travel (graphAt): after patches and deletes landed and were
    // checkpointed, read the store AS OF the pre-mutation seq through a
    // fresh query-only open — the historical state must be bit-identical
    // to the pristine nation set the oracle rebuilds from the raw table.
    "q_store_timetravel" -> ((s, d) => {
      val (dir, asOf) = buildTimeTravelStore(s, d)
      TableTwinStore.openQueryOnly(s, dir, () => "2026-01-01T00:00:01Z")
        .graphAt(asOf).twins
        .select(col("dt_id"),
          get_json_object(col("properties"), "$.name").as("name"))
        .orderBy(col("dt_id"))
    }),

    // The composed §2.E × §2.F path: the store's CDC surface (the same
    // mutation rows readMutationStream yields, A9) feeds cohort retention
    // directly — twin lifecycle events become (user=dt_id, ts=activity)
    // and the cohort table falls out of two keyed aggregations. Proves
    // the streaming-log schema and the analytics operators actually join,
    // not merely coexist.
    "q_mutlog_retention" -> ((s, d) => {
      val dir = buildLifecycleStore(s, d)
      val st = TableTwinStore.openQueryOnly(s, dir, () => "2026-01-09T00:00:00Z")
      graft.operators.TimeSeries.cohortRetention(
        st.mutationsDf.filter(col("entity_kind") === "Twin"),
        "entity_id", "ts")
        .orderBy(col("cohort"), col("day_offset"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_store_roundtrip" ->
      s"""SELECT 'N' || n_nationkey AS dt_id, '$NationModel' AS model_id,
         |  CASE WHEN n_nationkey % 5 = 0 THEN n_name || '-patched'
         |       ELSE n_name END AS name
         |FROM nation WHERE n_nationkey % 7 <> 3
         |ORDER BY dt_id""".stripMargin,

    "q_store_timetravel" ->
      """SELECT 'N' || n_nationkey AS dt_id, n_name AS name
        |FROM nation ORDER BY dt_id""".stripMargin,

    // Recompute the deterministic lifecycle schedule in SQL: activity
    // days (k%3) and (k%3 + 1 + k%2) per customer k < 300, cohort = the
    // first, n_users per (cohort, offset).
    "q_mutlog_retention" ->
      """WITH c AS (SELECT c_custkey AS k FROM customer WHERE c_custkey < 300),
        |acts AS (
        |  SELECT k, k % 3 AS d0, 0 AS off FROM c
        |  UNION ALL
        |  SELECT k, k % 3 AS d0, 1 + (k % 2) AS off FROM c)
        |SELECT strftime(DATE '2026-01-01' + CAST(d0 AS INT), '%Y-%m-%d') AS cohort,
        |       CAST(off AS BIGINT) AS day_offset,
        |       count(*) AS n_users
        |FROM acts GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
