package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.core.Tables
import graft.events.{CloudEvent, CloudEventFactory}
import graft.store.MutationEvent

/** The streaming events service (SURVEY §2.E / §3.3), Spark-native:
  * Structured Streaming over the mutation log replaces the reference's
  * Postgres logical-replication consumer
  * (/root/reference/src/AgeDigitalTwins.Events/Core/Services/AgeDigitalTwinsReplication.cs).
  *
  * Because the store writes ONE row per logical operation, the reference's
  * stateful WAL row-folding (E3, flatMapGroupsWithState territory) is
  * unnecessary — classification (E2), validity filter (E4), patch
  * derivation (E5) and formatting (E6/E7/E8) are per-row transforms that
  * scale embarrassingly. Routes (E9) become one output stream per
  * (format, sink); reliability (E11) is checkpointing + a DLQ capture per
  * batch.
  */
object EventPipeline {

  /** A route: which event format feeds which sink (E9). */
  final case class Route(format: String, sinkName: String)

  def mutationsToDataset(spark: SparkSession, df: DataFrame): Dataset[MutationEvent] = {
    import spark.implicits._
    df.select(col("seq"), col("ts"), col("event_type").as("eventType"),
        col("old_json").as("oldJson"), col("new_json").as("newJson"))
      .as[MutationEvent]
  }

  /** E4 validity filter: Create/Update need new, Update needs old, Delete
    * needs old (AgeDigitalTwinsReplication.cs:645-672). */
  def validMutations(ds: Dataset[MutationEvent]): Dataset[MutationEvent] =
    ds.filter { m =>
      m.eventType match {
        case "TwinCreate" | "RelationshipCreate" | "Telemetry" => m.newJson != null
        case "TwinUpdate" | "RelationshipUpdate" => m.newJson != null && m.oldJson != null
        case "TwinDelete" | "RelationshipDelete" => m.oldJson != null
        case _ => false
      }
    }

  /** E6 EventNotification frame. */
  def toEventNotifications(ds: Dataset[MutationEvent], source: String)
      : Dataset[CloudEvent] = {
    import ds.sparkSession.implicits._
    validMutations(ds).flatMap(m => CloudEventFactory.eventNotification(m, source))
  }

  /** E7 DataHistory frame (all three record kinds in one stream; split per
    * sink table with a filter on `type`). */
  def toDataHistory(ds: Dataset[MutationEvent], source: String,
      trackLastUpdatedBy: Boolean = false): Dataset[CloudEvent] = {
    import ds.sparkSession.implicits._
    validMutations(ds).flatMap(m =>
      CloudEventFactory.dataHistory(m, source, trackLastUpdatedBy))
  }

  /** The three Kusto-shaped DataHistory tables
    * (docs/how-to-guides/data-history-kusto.mdx:113-179): (data-JSON
    * path → Kusto column) specs shared by the driver and executor
    * ingest routes. */
  private val PropertyCols = Seq("timeStamp" -> "TimeStamp",
    "serviceId" -> "ServiceId", "id" -> "Id", "modelId" -> "ModelId",
    "key" -> "Key", "value" -> "Value", "relationshipId" -> "RelationshipId",
    "relationshipTarget" -> "RelationshipTarget")
  private val TwinLifecycleCols = Seq("twinId" -> "TwinId",
    "action" -> "Action", "timeStamp" -> "TimeStamp",
    "serviceId" -> "ServiceId", "modelId" -> "ModelId")
  private val RelLifecycleCols = Seq("relationshipId" -> "RelationshipId",
    "name" -> "Name", "action" -> "Action", "timeStamp" -> "TimeStamp",
    "serviceId" -> "ServiceId", "source" -> "Source", "target" -> "Target")

  private def tableColumns(cols: Seq[(String, String)]) =
    cols.map { case (path, name) =>
      get_json_object(col("data"), s"$$['$path']").as(name)
    }

  private def projectTable(events: Dataset[CloudEvent], eventType: String,
      cols: Seq[(String, String)]): DataFrame =
    events.filter(col("type") === eventType).select(tableColumns(cols): _*)

  def propertyEvents(events: Dataset[CloudEvent]): DataFrame =
    projectTable(events, CloudEventFactory.PropertyEventType, PropertyCols)

  def twinLifeCycleEvents(events: Dataset[CloudEvent]): DataFrame =
    projectTable(events, CloudEventFactory.TwinLifecycleType, TwinLifecycleCols)

  def relationshipLifeCycleEvents(events: Dataset[CloudEvent]): DataFrame =
    projectTable(events, CloudEventFactory.RelationshipLifecycleType, RelLifecycleCols)

  /** A12: Kusto route — each micro-batch splits into the three DataHistory
    * tables and queued-ingests each table's JSON rows through an injected
    * ingest function (the reference's IKustoQueuedIngestClient with
    * per-table JSON ingestion mappings, KustoEventSink.cs:31-70; no Kusto
    * client library in this zero-egress build — a deployment closes over
    * the real queued-ingest client, specs pass a recorder). Queued
    * ingestion is batch-granular, so a failed table batch dead-letters
    * that TABLE's rows; the other tables' ingestions stand. Default table
    * names per data-history-kusto.mdx:100-102. */
  def runKustoRoute(
      events: Dataset[CloudEvent],
      ingest: (String, Seq[String]) => Unit, // (table, JSON rows); throws on failure
      checkpointDir: String,
      dlqDir: Option[String] = None,
      propertyTable: String = "AdtPropertyEvents",
      twinLifecycleTable: String = "AdtTwinLifeCycleEvents",
      relLifecycleTable: String = "AdtRelationshipLifeCycleEvents"): StreamingQuery = {
    events.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[CloudEvent], batchId: Long) =>
        val cached = batch.persist()
        try kustoIngestDriverBatch(cached, batchId, ingest, dlqDir,
          propertyTable, twinLifecycleTable, relLifecycleTable)
        finally cached.unpersist()
        ()
      }
      .start()
  }

  /** Per-batch body of the driver-collected Kusto route; `batch` must
    * already be persisted by the caller (it is read three times). */
  private def kustoIngestDriverBatch(batch: Dataset[CloudEvent],
      batchId: Long, ingest: (String, Seq[String]) => Unit,
      dlqDir: Option[String], propertyTable: String,
      twinLifecycleTable: String, relLifecycleTable: String): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val tables = Seq(
      propertyTable -> propertyEvents(batch),
      twinLifecycleTable -> twinLifeCycleEvents(batch),
      relLifecycleTable -> relationshipLifeCycleEvents(batch))
    val failed = tables.flatMap { case (table, df) =>
      val rows = df.toJSON.collect().toSeq
      if (rows.isEmpty) None
      else {
        try { ingest(table, rows); None }
        catch { case e: Exception =>
          Some((table, rows, String.valueOf(e.getMessage)))
        }
      }
    }
    if (failed.nonEmpty) dlqDir match {
      case Some(d) =>
        failed.flatMap { case (table, rows, msg) =>
          rows.map(r => (table, r, msg))
        }.toDF("kusto_table", "row_json", "dlq_error")
          .withColumn("dlq_batch", lit(batchId))
          .write.mode("append").parquet(d)
      case None => throw new RuntimeException(
        s"${failed.length} Kusto table ingestions failed: ${failed.head._3}")
    }
  }

  /** A12 at scale: Kusto queued ingestion distributed over EXECUTORS —
    * the scale path for data-history volumes where the driver-collected
    * [[runKustoRoute]] becomes the bottleneck. `mkIngest` builds ONE
    * queued-ingest client per partition (the factory closure must be
    * serializable); rows are hash-partitioned by (table, subject) —
    * table-major so each executor submits few large per-table ingestions
    * (queued ingestion amortizes per-blob overhead), subject to spread
    * one table's volume across partitions — and time-sorted within each
    * partition, so any one entity's history lands in order within its
    * ingest batch. Only FAILED rows return to the driver.
    *
    * DLQ semantics refine [[runKustoRoute]]'s: a failed ingestion
    * dead-letters that (table × partition)'s rows rather than the whole
    * table's — same rows-on-failure guarantee, finer blast radius. DLQ
    * schema is identical (kusto_table, row_json, dlq_error, dlq_batch);
    * no DLQ configured → the batch throws and the checkpoint retries. */
  def runKustoRouteDistributed(
      events: Dataset[CloudEvent],
      mkIngest: () => (String, Seq[String]) => Unit,
      checkpointDir: String,
      dlqDir: Option[String] = None,
      propertyTable: String = "AdtPropertyEvents",
      twinLifecycleTable: String = "AdtTwinLifeCycleEvents",
      relLifecycleTable: String = "AdtRelationshipLifeCycleEvents",
      parallelism: Int = 0): StreamingQuery = {
    events.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[CloudEvent], batchId: Long) =>
        kustoIngestDistributedBatch(batch, batchId, mkIngest, dlqDir,
          propertyTable, twinLifecycleTable, relLifecycleTable, parallelism)
        ()
      }
      .start()
  }

  /** Per-batch body of the executor-distributed Kusto route. */
  private def kustoIngestDistributedBatch(batch: Dataset[CloudEvent],
      batchId: Long, mkIngest: () => (String, Seq[String]) => Unit,
      dlqDir: Option[String], propertyTable: String,
      twinLifecycleTable: String, relLifecycleTable: String,
      parallelism: Int): Unit = {
    {
        val spark = batch.sparkSession
        import spark.implicits._
        val slots =
          if (parallelism > 0) parallelism
          else spark.sessionState.conf.numShufflePartitions
        // (table, subject, time, row_json) — row_json built with the same
        // column specs as the driver route's projections, so both routes
        // ingest byte-identical rows
        val specs = Seq(
          (propertyTable, CloudEventFactory.PropertyEventType, PropertyCols),
          (twinLifecycleTable, CloudEventFactory.TwinLifecycleType, TwinLifecycleCols),
          (relLifecycleTable, CloudEventFactory.RelationshipLifecycleType, RelLifecycleCols))
        val tagged = specs.map { case (table, typ, cols) =>
          batch.toDF().filter(col("type") === typ)
            .select(lit(table).as("kusto_table"), col("subject"), col("time"),
              to_json(struct(tableColumns(cols): _*)).as("row_json"))
        }.reduce(_ unionAll _)
        val failed: Array[(String, String, String)] = tagged
          .repartition(slots, col("kusto_table"), col("subject"))
          .sortWithinPartitions(col("kusto_table"), col("time"))
          .as[(String, String, String, String)]
          .mapPartitions { it =>
            val ingest = mkIngest()
            // rows arrive table-contiguous (sorted); one ingestion per
            // table run keeps queued-ingest batch granularity
            val byTable = scala.collection.mutable.LinkedHashMap
              .empty[String, scala.collection.mutable.ArrayBuffer[String]]
            it.foreach { case (t, _, _, row) =>
              byTable.getOrElseUpdate(t,
                scala.collection.mutable.ArrayBuffer.empty[String]) += row
            }
            byTable.iterator.flatMap { case (t, rows) =>
              try { ingest(t, rows.toSeq); Iterator.empty }
              catch { case e: Exception =>
                val msg = String.valueOf(e.getMessage)
                rows.iterator.map(r => (t, r, msg))
              }
            }
          }
          .collect()
        if (failed.nonEmpty) dlqDir match {
          case Some(d) =>
            failed.toSeq.toDF("kusto_table", "row_json", "dlq_error")
              .withColumn("dlq_batch", lit(batchId))
              .write.mode("append").parquet(d)
          case None => throw new RuntimeException(
            s"${failed.length} Kusto row ingestions failed: ${failed.head._3}")
        }
    }
  }

  /** A12 with per-batch dispatch: small micro-batches take the
    * driver-collected route (one client, minimal scheduling overhead —
    * the steady-state data-history trickle), batches above
    * `distributedRowThreshold` take the executor route (per-partition
    * clients, only failed rows return to the driver — backfills and burst
    * replays). The threshold probe is one count over the persisted batch;
    * both bodies then reuse those cached blocks. One client factory
    * serves both paths: the driver path instantiates it locally once per
    * batch, so a deployment configures a single connection closure. */
  def runKustoRouteAuto(
      events: Dataset[CloudEvent],
      mkIngest: () => (String, Seq[String]) => Unit,
      checkpointDir: String,
      dlqDir: Option[String] = None,
      propertyTable: String = "AdtPropertyEvents",
      twinLifecycleTable: String = "AdtTwinLifeCycleEvents",
      relLifecycleTable: String = "AdtRelationshipLifeCycleEvents",
      parallelism: Int = 0,
      distributedRowThreshold: Long = 50000L): StreamingQuery = {
    events.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[CloudEvent], batchId: Long) =>
        val cached = batch.persist()
        try {
          if (cached.count() > distributedRowThreshold)
            kustoIngestDistributedBatch(cached, batchId, mkIngest, dlqDir,
              propertyTable, twinLifecycleTable, relLifecycleTable, parallelism)
          else
            kustoIngestDriverBatch(cached, batchId, mkIngest(), dlqDir,
              propertyTable, twinLifecycleTable, relLifecycleTable)
        } finally cached.unpersist()
        ()
      }
      .start()
  }

  /** One physical change-feed row (e.g. a WAL tuple): several may belong
    * to one logical operation within a transaction. */
  final case class PhysicalChange(txnId: Long, seq: Long, ts: String,
      eventType: String, entityId: String, oldJson: String, newJson: String)

  /** E3 stateful correlation for EXTERNAL change feeds: consecutive rows
    * for the same (txn, entity) fold into one logical event — first
    * OldValue + last NewValue (AgeDigitalTwinsReplication.cs:324-339,
    * 396-424 of /root/reference). Our own mutation log never needs this
    * (one row per logical op by construction), but feeds replicated from a
    * row-at-a-time WAL do. Batch form shown here groups per key with
    * map-side-combinable min_by/max_by; under `readStream` the same fold
    * runs as flatMapGroupsWithState keyed by (txnId, entityId) with the
    * transaction commit as the flush boundary. */
  def foldPhysicalRows(spark: SparkSession, rows: DataFrame): Dataset[MutationEvent] = {
    import spark.implicits._
    rows.groupBy(col("txnId"), col("entityId"))
      .agg(
        min(col("seq")).as("seq"),
        max(col("ts")).as("ts"),
        max_by(col("eventType"), col("seq")).as("eventType"),
        min_by(col("oldJson"), col("seq")).as("oldJson"),
        max_by(col("newJson"), col("seq")).as("newJson"))
      .select(col("seq"), col("ts"), col("eventType"), col("oldJson"), col("newJson"))
      .as[MutationEvent]
  }

  /** Streaming form of [[foldPhysicalRows]]: `flatMapGroupsWithState`
    * keyed by transaction id, with the commit row as the flush boundary —
    * the exact shape of the reference's replication consumer, which
    * accumulates WAL tuples per transaction and emits on COMMIT
    * (AgeDigitalTwinsReplication.cs:324-339, 396-424). Rows for a
    * transaction may arrive across micro-batches; per-entity folds live in
    * managed state until the `Commit` marker arrives, then flush in
    * first-seq order and release the state. State size is bounded by open
    * transactions × touched entities, independent of stream length. */
  /** Per-entity in-flight fold inside one open transaction. */
  final case class TxnFold(entries: Seq[MutationEvent], entityIds: Seq[String])

  def foldPhysicalRowsStream(rows: Dataset[PhysicalChange]): Dataset[MutationEvent] = {
    import rows.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    rows.groupByKey(_.txnId)
      .flatMapGroupsWithState[TxnFold, MutationEvent](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, it, state: GroupState[TxnFold]) =>
          val st = state.getOption.getOrElse(TxnFold(Nil, Nil))
          var acc = st.entityIds.zip(st.entries).toMap
          var committed = false
          for (r <- it.toSeq.sortBy(_.seq)) {
            if (r.eventType == "Commit") committed = true
            else acc += (r.entityId -> (acc.get(r.entityId) match {
              // first OldValue + last NewValue, last event type, first seq
              case None => MutationEvent(r.seq, r.ts, r.eventType, r.oldJson, r.newJson)
              case Some(prev) => MutationEvent(prev.seq, r.ts, r.eventType, prev.oldJson, r.newJson)
            }))
          }
          if (committed) {
            state.remove()
            acc.values.toSeq.sortBy(_.seq).iterator
          } else {
            val (ids, evs) = acc.toSeq.unzip
            state.update(TxnFold(evs, ids))
            Iterator.empty
          }
      }
  }

  /** Event-time windowed telemetry rollup with a watermark: per (window,
    * twin) counts over the telemetry feed. The watermark bounds state —
    * rows later than `lateness` are dropped and closed windows are
    * reclaimed, which is what lets a continuous rollup run forever over a
    * 100 TB/day feed. The same expression tree runs in batch mode (plain
    * window aggregation) and under `readStream` (stateful, append-mode
    * emission on window close). */
  def telemetryRollup(ds: Dataset[MutationEvent], windowDur: String = "1 minute",
      lateness: String = "5 minutes"): DataFrame =
    ds.toDF()
      .filter(col("eventType") === "Telemetry")
      .withColumn("event_time", to_timestamp(col("ts")))
      .withWatermark("event_time", lateness)
      .groupBy(
        window(col("event_time"), windowDur).as("w"),
        get_json_object(col("newJson"), "$['digitalTwinId']").as("twin_id"))
      .agg(count(lit(1)).as("n_messages"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("twin_id"), col("n_messages"))

  /** Open the mutation log directory as a stream (A9: the CDC source). */
  def readMutationStream(spark: SparkSession, dir: String): Dataset[MutationEvent] =
    mutationsToDataset(spark,
      spark.readStream.schema(Tables.mutationsSchema).parquet(dir))

  /** A11 Kafka sink configuration, mirroring the reference's
    * Events/Sinks/Kafka/KafkaEventSink.cs:32-166 (SASL PLAIN and
    * OAUTHBEARER over SASL_SSL; plaintext for local brokers). */
  final case class KafkaSinkConfig(
      bootstrapServers: String,
      topic: String,
      securityProtocol: Option[String] = None, // e.g. SASL_SSL
      saslMechanism: Option[String] = None,    // PLAIN | OAUTHBEARER
      saslJaasConfig: Option[String] = None)

  /** CloudEvents → Kafka records: key = subject (so all events of one
    * entity land in one partition, preserving per-entity order — the same
    * affinity the reference gets from the CloudEvents partition key),
    * value = the JSON envelope (structured content mode). */
  /** The structured-mode JSON envelope as a Column over a CloudEvent
    * frame: attributes via to_json; `data` is already JSON text, so it is
    * spliced in verbatim (structured content mode embeds data as JSON, not
    * as a quoted string). */
  private def withEnvelope(df: DataFrame): DataFrame = {
    val attrs = to_json(struct(col("id"), col("source"), col("type"),
      col("subject"), col("time"), col("datacontenttype"), col("dataschema")))
    df.withColumn("__attrs", attrs)
      .withColumn("__envelope",
        concat(expr("substring(__attrs, 1, length(__attrs) - 1)"),
          lit(",\"data\":"), coalesce(col("data"), lit("null")), lit("}")))
      .drop("__attrs")
  }

  def kafkaFrame(events: Dataset[CloudEvent]): DataFrame =
    withEnvelope(events.toDF())
      .select(col("subject").as("key"), col("__envelope").as("value"))

  /** The `writeStream.format("kafka")` option map for a config. */
  def kafkaOptions(c: KafkaSinkConfig): Map[String, String] =
    Map("kafka.bootstrap.servers" -> c.bootstrapServers, "topic" -> c.topic) ++
      c.securityProtocol.map("kafka.security.protocol" -> _) ++
      c.saslMechanism.map("kafka.sasl.mechanism" -> _) ++
      c.saslJaasConfig.map("kafka.sasl.jaas.config" -> _)

  /** A11: the real Kafka sink plan — `writeStream.format("kafka")` over
    * the keyed/serialized frame, fully configured and ready to `.start()`
    * on a deployment with the kafka connector on the classpath (this
    * zero-egress environment has neither broker nor connector, so the
    * default route keeps the parquet stand-in; the spec asserts this plan's
    * construction instead). */
  def kafkaWriter(events: Dataset[CloudEvent], config: KafkaSinkConfig,
      checkpointDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    kafkaFrame(events).writeStream
      .format("kafka")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .options(kafkaOptions(config))
  }

  /** A13 MQTT sink record frame: the reference publishes every CloudEvent
    * to ONE configured topic (Events/Sinks/Mqtt/MqttEventSink.cs:17-128);
    * payload = the structured JSON envelope. On a deployment the frame
    * feeds a foreachBatch MQTT client exactly like [[runWebhookRoute]]'s
    * injected post function. */
  def mqttFrame(events: Dataset[CloudEvent], topic: String): DataFrame =
    kafkaFrame(events).select(lit(topic).as("topic"), col("value").as("payload"))

  /** A13: MQTT route — per-event publish of the structured envelope to the
    * configured topic through an injected publish function (no MQTT client
    * library in this zero-egress environment; a deployment passes e.g. a
    * Paho client's publish, specs pass a recorder — the same treatment as
    * [[runWebhookRoute]]). A publish that throws dead-letters ONLY that
    * event; delivered events are never replayed
    * (Events/Sinks/Mqtt/MqttEventSink.cs publishes per event too). */
  def runMqttRoute(
      events: Dataset[CloudEvent],
      topic: String,
      publish: (String, String) => Unit, // (topic, payload); throws on failure
      checkpointDir: String,
      dlqDir: Option[String] = None): StreamingQuery =
    runPerEventRoute(events, checkpointDir, dlqDir, "MQTT publishes") { envelope =>
      try { publish(topic, envelope); None }
      catch { case e: Exception => Some(String.valueOf(e.getMessage)) }
    }

  /** Shared per-event delivery scaffold for the injected-client sinks
    * (webhook, MQTT): collect each micro-batch with its structured
    * envelope — event batches are small (≤100, SharedEventConsumer.cs:31)
    * and dispatch is driver-side single-consumer, like the reference —
    * attempt each event through `deliver` (None = delivered,
    * Some(error) = failed), and dead-letter ONLY the failures:
    * already-delivered events are never replayed. */
  private def runPerEventRoute(
      events: Dataset[CloudEvent],
      checkpointDir: String,
      dlqDir: Option[String],
      what: String)(deliver: String => Option[String]): StreamingQuery = {
    events.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[CloudEvent], batchId: Long) =>
        val rows = withEnvelope(batch.toDF()).collect()
        val spark = batch.sparkSession
        import spark.implicits._
        val failed = rows.flatMap { r =>
          deliver(r.getAs[String]("__envelope")).map(msg => CloudEvent(
            r.getAs[String]("id"), r.getAs[String]("source"),
            r.getAs[String]("type"), r.getAs[String]("subject"),
            r.getAs[String]("time"), r.getAs[String]("datacontenttype"),
            r.getAs[String]("data"), r.getAs[String]("dataschema")) -> msg)
        }
        if (failed.nonEmpty) dlqDir match {
          case Some(d) =>
            failed.toSeq.toDF("event", "dlq_error")
              .select(col("event.*"), col("dlq_error"))
              .withColumn("dlq_batch", lit(batchId))
              .write.mode("append").parquet(d)
          case None => throw new RuntimeException(
            s"${failed.length} $what failed: ${failed.head._2}")
        }
        ()
      }
      .start()
  }

  /** Scale path for the injected-client sinks (A13/A14 at data-history
    * volumes): delivery runs on the EXECUTORS — `mkDeliver` builds ONE
    * client per partition (one HTTP connection / MQTT session each; the
    * factory closure must be serializable), events are hash-partitioned
    * by `subject` and time-ordered within each partition (the same
    * per-entity ordering affinity [[kafkaFrame]] keys by — the per-event
    * total order of the single-consumer route weakens to per-entity
    * order, which is the guarantee consumers actually rely on), and only
    * FAILURES return to the driver. DLQ semantics are identical to
    * [[runPerEventRoute]]: failed events (and nothing else) dead-letter;
    * no DLQ configured → the batch throws and the checkpoint retries.
    *
    * The driver-side single-consumer route matches the reference's
    * semantics for its ≤100-event batches (SharedEventConsumer.cs:31);
    * this one scales delivery with partitions where a single consumer is
    * the bottleneck. */
  private def runPerEventRouteDistributed(
      events: Dataset[CloudEvent],
      checkpointDir: String,
      dlqDir: Option[String],
      what: String,
      parallelism: Int)(mkDeliver: () => String => Option[String])
      : StreamingQuery = {
    events.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[CloudEvent], batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val slots =
          if (parallelism > 0) parallelism
          else spark.sessionState.conf.numShufflePartitions
        val failed: Array[(CloudEvent, String)] = withEnvelope(batch.toDF())
          .repartition(slots, col("subject"))
          .sortWithinPartitions(col("time"), col("id"))
          .select(struct(col("id"), col("source"), col("type"),
            col("subject"), col("time"), col("datacontenttype"), col("data"),
            col("dataschema")).as("event"), col("__envelope").as("env"))
          .as[(CloudEvent, String)]
          .mapPartitions { it =>
            val deliver = mkDeliver()
            it.flatMap { case (ev, env) => deliver(env).map(msg => (ev, msg)) }
          }
          .collect()
        if (failed.nonEmpty) dlqDir match {
          case Some(d) =>
            failed.toSeq.toDF("event", "dlq_error")
              .select(col("event.*"), col("dlq_error"))
              .withColumn("dlq_batch", lit(batchId))
              .write.mode("append").parquet(d)
          case None => throw new RuntimeException(
            s"${failed.length} $what failed: ${failed.head._2}")
        }
        ()
      }
      .start()
  }

  /** A13 at scale: MQTT publishes distributed over executors — one client
    * per partition via `mkPublish`, per-subject ordering, DLQ semantics of
    * [[runMqttRoute]]. */
  def runMqttRouteDistributed(
      events: Dataset[CloudEvent],
      topic: String,
      mkPublish: () => (String, String) => Unit,
      checkpointDir: String,
      dlqDir: Option[String] = None,
      parallelism: Int = 0): StreamingQuery =
    runPerEventRouteDistributed(events, checkpointDir, dlqDir,
        "MQTT publishes", parallelism) { () =>
      val publish = mkPublish()
      env => try { publish(topic, env); None }
      catch { case e: Exception => Some(String.valueOf(e.getMessage)) }
    }

  /** A14 at scale: webhook POSTs distributed over executors — one HTTP
    * client per partition via `mkPost`, per-subject ordering, DLQ and
    * 401-retry semantics of [[runWebhookRoute]]. Auth state (including
    * the [[OAuthTokenProvider]] cache) is serialized per partition: each
    * executor client acquires and refreshes its own token, as a fleet of
    * webhook workers would. */
  def runWebhookRouteDistributed(
      events: Dataset[CloudEvent],
      url: String,
      auth: WebhookAuth,
      mkPost: () => (String, Map[String, String], String) => Int,
      checkpointDir: String,
      dlqDir: Option[String] = None,
      parallelism: Int = 0): StreamingQuery =
    runPerEventRouteDistributed(events, checkpointDir, dlqDir,
        "webhook deliveries", parallelism) { () =>
      val post = mkPost()
      def headers() = webhookHeaders(auth)
      body => try {
        var status = post(url, headers(), body)
        if (status == 401) auth match {
          // expired-token race: invalidate this partition's cache and
          // retry once with a freshly acquired token
          case WebhookAuth.OAuthRefreshed(p) =>
            p.invalidate()
            status = post(url, headers(), body)
          case _ =>
        }
        if (status < 200 || status >= 300) Some(s"webhook returned $status")
        else None
      } catch { case e: Exception => Some(String.valueOf(e.getMessage)) }
    }

  /** A14 webhook sink auth modes, mirroring the reference's
    * Events/Sinks/Webhook/WebhookEventSink.cs (Basic, Bearer, ApiKey and
    * OAuth client-credentials — the OAuth token is acquired out-of-band and
    * carried as a bearer here, like the reference's refreshed token). */
  sealed trait WebhookAuth
  object WebhookAuth {
    case object NoAuth extends WebhookAuth
    final case class Basic(username: String, password: String) extends WebhookAuth
    final case class Bearer(token: String) extends WebhookAuth
    final case class ApiKey(headerName: String, key: String) extends WebhookAuth
    final case class OAuth(accessToken: String) extends WebhookAuth
    /** OAuth client-credentials with automatic refresh: the token is
      * re-read from the provider on every request, so expiry mid-stream
      * re-acquires transparently (WebhookEventSink.cs token acquisition +
      * refresh-on-expiry). */
    final case class OAuthRefreshed(provider: OAuthTokenProvider) extends WebhookAuth
  }

  /** Client-credentials token cache: `fetch` performs the out-of-band
    * token-endpoint POST (injectable — zero egress here; a deployment
    * closes over its HTTP client and credentials) returning (accessToken,
    * expiresInSeconds). Tokens are served from cache until `refreshSkewMs`
    * before expiry, then re-fetched; a 401 from the sink calls
    * [[invalidate]] to force re-acquisition on the retry. */
  final class OAuthTokenProvider(
      fetch: () => (String, Long),
      clock: () => Long = () => System.currentTimeMillis(),
      refreshSkewMs: Long = 60000L) extends Serializable {
    private var cached: Option[(String, Long)] = None // (token, expiresAtMs)
    private[streaming] var fetchCount = 0

    def token(): String = synchronized {
      cached match {
        case Some((t, expiresAt)) if clock() < expiresAt - refreshSkewMs => t
        case _ =>
          val (t, ttlSeconds) = fetch()
          fetchCount += 1
          cached = Some((t, clock() + ttlSeconds * 1000))
          t
      }
    }

    def invalidate(): Unit = synchronized { cached = None }
  }

  /** Request headers for a webhook auth mode (+ the CloudEvents structured
    * content type). */
  def webhookHeaders(auth: WebhookAuth): Map[String, String] = {
    val base = Map("Content-Type" -> "application/cloudevents+json")
    auth match {
      case WebhookAuth.NoAuth => base
      case WebhookAuth.Basic(u, p) =>
        base + ("Authorization" -> ("Basic " + java.util.Base64.getEncoder
          .encodeToString(s"$u:$p".getBytes("UTF-8"))))
      case WebhookAuth.Bearer(t) => base + ("Authorization" -> s"Bearer $t")
      case WebhookAuth.ApiKey(h, k) => base + (h -> k)
      case WebhookAuth.OAuth(t) => base + ("Authorization" -> s"Bearer $t")
      case WebhookAuth.OAuthRefreshed(p) =>
        base + ("Authorization" -> s"Bearer ${p.token()}")
    }
  }

  /** A14: webhook route — each micro-batch's events POST one-by-one (the
    * reference posts per event, WebhookEventSink.cs SendEventsAsync)
    * through the injected `post` function; a non-2xx status or exception
    * sends the batch to the DLQ, like [[runRoute]]. `post` is injectable
    * because this environment has zero egress — a deployment passes a real
    * HTTP client; specs pass a recorder. */
  def runWebhookRoute(
      events: Dataset[CloudEvent],
      url: String,
      auth: WebhookAuth,
      post: (String, Map[String, String], String) => Int,
      checkpointDir: String,
      dlqDir: Option[String] = None): StreamingQuery = {
    // headers re-evaluate per request: a refreshed OAuth token must be the
    // CURRENT one, not the one cached at stream construction
    def headers() = webhookHeaders(auth)
    runPerEventRoute(events, checkpointDir, dlqDir, "webhook deliveries") { body =>
      try {
        var status = post(url, headers(), body)
        if (status == 401) auth match {
          // expired-token race: invalidate the cache and retry once with a
          // freshly acquired token (WebhookEventSink.cs refresh-on-401)
          case WebhookAuth.OAuthRefreshed(p) =>
            p.invalidate()
            status = post(url, headers(), body)
          case _ =>
        }
        if (status < 200 || status >= 300) Some(s"webhook returned $status")
        else None
      } catch { case e: Exception => Some(String.valueOf(e.getMessage)) }
    }
  }

  /** E9/E11: run one routed stream into a parquet "sink table" with
    * checkpointing; failures in the sink function land in a DLQ directory
    * instead of killing the stream (ResilientEventSinkWrapper + DLQService
    * semantics). */
  def runRoute(
      events: Dataset[CloudEvent],
      outDir: String,
      checkpointDir: String,
      dlqDir: Option[String] = None,
      failFor: DataFrame => Boolean = _ => false): StreamingQuery = {
    events.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[CloudEvent], batchId: Long) =>
        val df = batch.toDF()
        try {
          if (failFor(df)) throw new RuntimeException("sink failure (injected)")
          df.write.mode("append").parquet(outDir)
        } catch {
          case e: Exception =>
            dlqDir match {
              case Some(d) =>
                df.withColumn("dlq_error", lit(e.getMessage))
                  .withColumn("dlq_batch", lit(batchId))
                  .write.mode("append").parquet(d)
              case None => throw e
            }
        }
        ()
      }
      .start()
  }
}
