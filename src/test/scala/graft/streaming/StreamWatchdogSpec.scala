package graft.streaming

import java.nio.file.Files
import java.util.UUID
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryException, StreamingQueryProgress, StreamingQueryStatus}
import org.scalatest.funsuite.AnyFunSuite

/** Stream supervision: dead queries restart, silent queries are stopped
  * and restarted, healthy queries are left alone, repeated failure gives
  * up — the reference's replication watchdog semantics
  * (AgeDigitalTwinsReplication.cs:239-271, 678-813) over Structured
  * Streaming queries, driven deterministically with a fake clock. */
class StreamWatchdogSpec extends AnyFunSuite {

  /** A StreamingQuery stub whose liveness/progress the test scripts. */
  private final class FakeQuery extends StreamingQuery {
    @volatile var active = true
    @volatile var progressMs: Option[Long] = None
    @volatile var stopped = false
    override def name: String = "fake"
    override def id: UUID = UUID.randomUUID()
    override def runId: UUID = UUID.randomUUID()
    override def sparkSession: SparkSession = null
    override def isActive: Boolean = active
    override def exception: Option[StreamingQueryException] = None
    override def status: StreamingQueryStatus = null
    override def recentProgress: Array[StreamingQueryProgress] = Array.empty
    override def lastProgress: StreamingQueryProgress = null
    override def awaitTermination(): Unit = ()
    override def awaitTermination(timeoutMs: Long): Boolean = true
    override def processAllAvailable(): Unit = ()
    override def stop(): Unit = { stopped = true; active = false }
    override def explain(): Unit = ()
    override def explain(extended: Boolean): Unit = ()
  }

  test("dead query restarts; healthy query is left alone") {
    var now = 0L
    val started = collection.mutable.ListBuffer[FakeQuery]()
    val dog = new StreamWatchdog(
      () => { val q = new FakeQuery; started += q; q },
      silenceTimeoutMs = 10000L, clock = () => now,
      progressAt = q => q.asInstanceOf[FakeQuery].progressMs)
    dog.launch()
    assert(started.size == 1)
    // healthy: active with a recent (re)start watermark
    now = 5000L
    assert(!dog.check() && started.size == 1)
    // the query dies (e.g. sink exception) → restarted
    started.head.active = false
    assert(dog.check())
    assert(started.size == 2 && dog.restarts == 1)
    assert(dog.current eq started(1))
  }

  test("silent query is stopped then restarted; progress resets the clock") {
    var now = 0L
    val started = collection.mutable.ListBuffer[FakeQuery]()
    val dog = new StreamWatchdog(
      () => { val q = new FakeQuery; started += q; q },
      silenceTimeoutMs = 10000L, clock = () => now,
      progressAt = q => q.asInstanceOf[FakeQuery].progressMs)
    dog.launch()
    // progress keeps arriving → never restarted, however much time passes
    now = 9000L; started.head.progressMs = Some(8000L)
    assert(!dog.check())
    now = 17000L; started.head.progressMs = Some(16000L)
    assert(!dog.check() && started.size == 1)
    // source hangs: active but no progress past the timeout → stop + restart
    now = 27001L
    assert(dog.check())
    assert(started.head.stopped, "hung query was stopped before restart")
    assert(started.size == 2 && dog.restarts == 1)
  }

  test("maxRestarts caps the loop and flips gaveUp") {
    var now = 0L
    val started = collection.mutable.ListBuffer[FakeQuery]()
    val dog = new StreamWatchdog(
      () => { val q = new FakeQuery; q.active = false; started += q; q },
      silenceTimeoutMs = 10000L, clock = () => now, maxRestarts = 3,
      progressAt = q => q.asInstanceOf[FakeQuery].progressMs)
    dog.launch()
    // every replacement is born dead → 3 restarts then surrender
    assert(dog.check() && dog.check() && dog.check())
    assert(!dog.check() && dog.gaveUp && dog.restarts == 3)
    assert(!dog.check(), "a given-up watchdog stays down")
  }

  test("a throwing restart factory is absorbed and retried, not fatal") {
    var now = 0L
    var calls = 0
    val good = new FakeQuery
    val dog = new StreamWatchdog(
      () => {
        calls += 1
        if (calls == 2) throw new RuntimeException("checkpoint dir unreachable")
        else if (calls == 1) { good.active = false; good } // born dead
        else new FakeQuery
      },
      silenceTimeoutMs = 10000L, clock = () => now, maxRestarts = 5,
      progressAt = q => q.asInstanceOf[FakeQuery].progressMs)
    dog.launch()
    // first probe: restart attempt, factory throws — absorbed, counted
    assert(dog.check() && dog.restarts == 1 && !dog.gaveUp)
    assert(dog.current eq good, "failed factory keeps the old handle")
    // next probe retries and succeeds
    assert(dog.check() && dog.restarts == 2)
    assert(dog.current.isActive)
    assert(!dog.check(), "healthy replacement needs no further restart")
  }

  test("supervises a real query: AvailableNow termination triggers restart") {
    lazy val spark: SparkSession = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val dir = Files.createTempDirectory("graft-watchdog").toString
    import spark.implicits._
    Seq(("a", 1), ("b", 2)).toDF("k", "v").write.parquet(s"$dir/in")
    var generation = 0
    val dog = new StreamWatchdog(
      () => {
        generation += 1
        spark.readStream.schema("k string, v int").parquet(s"$dir/in")
          .writeStream
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .option("checkpointLocation", s"$dir/cp$generation")
          .format("parquet")
          .option("path", s"$dir/out$generation")
          .start()
      },
      silenceTimeoutMs = 600000L)
    val q1 = dog.launch()
    q1.awaitTermination(60000)
    assert(!q1.isActive)
    assert(dog.check(), "terminated real query restarts")
    dog.current.awaitTermination(60000)
    assert(dog.restarts == 1 && generation == 2)
    dog.shutdown()
  }
}
