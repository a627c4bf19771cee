package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contention defenses for the bench artifact: the r11 round shipped a
  * result 2x the engine's re-measured cost because a loaded host inflated
  * best-of-N timings on unchanged code. These tests drive the pure
  * sampling policy with scripted durations — including a simulated
  * "deliberately loaded host" where every sample is inflated — and the
  * prior-record parsing that anchors the 3x suspect threshold. */
class BenchNoiseSpec extends AnyFunSuite {

  private def scripted(durations: Double*): () => Either[String, Double] = {
    val it = durations.iterator
    () => if (it.hasNext) Right(it.next())
          else fail("sampler asked for more samples than scripted")
  }

  test("clean fast query: 3 samples, best wins, not noisy") {
    val (best, err, n, noisy) =
      BenchNoise.sampleQuery(scripted(1.4, 0.9, 1.1), prior = Some(1.0))
    assert(best == 0.9 && err.isEmpty && n == 3 && !noisy)
  }

  test("heavy query stays at 2 samples when consistent with its prior") {
    val (best, _, n, noisy) =
      BenchNoise.sampleQuery(scripted(5.0, 4.8), prior = Some(4.5))
    assert(best == 4.8 && n == 2 && !noisy)
  }

  test("transient spike: resample beats it, no noisy flag") {
    // both base samples contended (>3x the prior 1.0s), the first extra
    // sample lands clean — the artifact records the clean time, unflagged
    val (best, _, n, noisy) =
      BenchNoise.sampleQuery(scripted(4.0, 4.2, 1.1), prior = Some(1.0))
    assert(best == 1.1 && n == 3 && !noisy)
  }

  test("deliberately loaded host: every sample inflated -> settle phase runs, noisy flag fires") {
    // base best-of-2, BOTH immediate resamples, then all 3 settle samples
    // (each preceded by an escalating sleep), all still >3x the prior —
    // only then flagged, so a round-over-round reader doesn't call this a
    // code regression
    val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
    val (best, _, n, noisy) = BenchNoise.sampleQuery(
      scripted(9.0, 8.0, 8.5, 9.1, 8.2, 8.7, 9.3), prior = Some(1.0),
      sleeper = slept += _)
    assert(best == 8.0 && n == 7 && noisy)
    assert(slept.toSeq == BenchNoise.SettleSleepsMs,
      "each settle sample waits out the burst with an escalating sleep")
  }

  test("burst that passes mid-settle: clean sample lands, no flag, no further sleeps") {
    // 4 inflated samples (base 2 + 2 immediate resamples), then the first
    // settle sample catches the host post-burst — the artifact records the
    // clean time unflagged and stops sampling immediately
    val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
    val (best, _, n, noisy) = BenchNoise.sampleQuery(
      scripted(9.0, 8.0, 8.5, 9.1, 1.1), prior = Some(1.0),
      sleeper = slept += _)
    assert(best == 1.1 && n == 5 && !noisy)
    assert(slept.toSeq == Seq(500L), "settle stops at the first clean sample")
  }

  test("no prior record: plain best-of-N, never noisy") {
    val (best, _, n, noisy) =
      BenchNoise.sampleQuery(scripted(8.0, 9.0), prior = None)
    assert(best == 8.0 && n == 2 && !noisy)
    // sub-2s gets its third sample regardless of prior
    val (_, _, n2, _) =
      BenchNoise.sampleQuery(scripted(0.5, 0.6, 0.4), prior = None)
    assert(n2 == 3)
  }

  test("all samples fail: first error surfaces, best is -1") {
    val calls = Iterator("boom1", "boom2")
    val (best, err, _, noisy) =
      BenchNoise.sampleQuery(() => Left(calls.next()), prior = Some(1.0))
    assert(best == -1.0 && err.contains("boom1") && !noisy)
  }

  test("a timing banked before a later error survives; the error stops sampling") {
    val it = Iterator[Either[String, Double]](Right(1.2), Left("boom"))
    val (best, err, n, _) =
      BenchNoise.sampleQuery(() => it.next(), prior = None)
    assert(best == 1.2 && err.isEmpty && n == 2,
      "a query that timed once is not a failed query")
  }

  test("needsResample anchors on 3x the prior; degenerate priors ignored") {
    assert(BenchNoise.needsResample(3.1, Some(1.0)))
    assert(!BenchNoise.needsResample(2.9, Some(1.0)))
    assert(!BenchNoise.needsResample(100.0, None))
    assert(!BenchNoise.needsResample(100.0, Some(0.0)))
    assert(!BenchNoise.needsResample(100.0, Some(-1.0)), "a prior FAILURE (-1) is not a timing anchor")
  }

  test("priorTimes parses a bench record; garbage degrades to empty") {
    val f = java.nio.file.Files.createTempFile("bench-prior", ".json")
    java.nio.file.Files.writeString(f,
      """{"metric":"total","value":9.9,"queries":{"q_a":1.25,"q_fail":-1.0,"q_b":0.5},"failed":1}""")
    val m = BenchNoise.priorTimes(f.toString)
    assert(m == Map("q_a" -> 1.25, "q_b" -> 0.5),
      "failed (-1) prior entries must not become resample anchors")
    assert(BenchNoise.priorTimes("/nonexistent/path.json").isEmpty)
    val g = java.nio.file.Files.createTempFile("bench-prior", ".json")
    java.nio.file.Files.writeString(g, "not json at all")
    assert(BenchNoise.priorTimes(g.toString).isEmpty)
  }

  test("loadPerCore reports a usable normalized load on this platform") {
    val l = BenchNoise.loadPerCore()
    assert(l == -1.0 || l >= 0.0)
    assert(l < 10000, "normalized load should be a small per-core number")
  }
}
