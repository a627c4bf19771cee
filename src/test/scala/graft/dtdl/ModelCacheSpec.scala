package graft.dtdl

import org.scalatest.funsuite.AnyFunSuite
import graft.json.Json

/** TTL semantics of the model cache (reference:
  * AgeDigitalTwinsClient.cs:21-23,162 — 10 s default TTL). */
class ModelCacheSpec extends AnyFunSuite {

  private def iface(id: String, props: String*): DtdlInterface =
    Dtdl.parseInterface(
      s"""{"@id":"$id","@type":"Interface","contents":[${
        props.map(p => s"""{"@type":"Property","name":"$p","schema":"string"}""")
          .mkString(",")}]}""").toOption.get

  test("a model update becomes visible to validation after the TTL") {
    var t = 0L
    // the "authoritative source" another writer updates underneath us
    var source = Map("dtmi:x;1" -> iface("dtmi:x;1", "name"))
    val cache = new CachedModelRegistry(() => ModelRegistry(source),
      ttlMillis = 10000L, nowMs = () => t)

    val doc = Json.parse(
      """{"$dtId":"d","$metadata":{"$model":"dtmi:x;1"},"name":"a","extra":"b"}""")
    assert(cache.validateTwin(doc).isLeft, "'extra' unknown before the update")
    assert(cache.loadCount == 1)

    // another writer adds the 'extra' property; within the TTL the stale
    // snapshot still rejects, and no reload happens
    source = Map("dtmi:x;1" -> iface("dtmi:x;1", "name", "extra"))
    t += 5000
    assert(cache.validateTwin(doc).isLeft)
    assert(cache.loadCount == 1, "no reload within the TTL")

    // past the TTL the next access reloads and validation sees the update
    t += 6000
    assert(cache.validateTwin(doc).isRight)
    assert(cache.loadCount == 2)

    // own-write path: invalidate() forces the next access to reload
    source = Map("dtmi:x;1" -> iface("dtmi:x;1", "name"))
    cache.invalidate()
    assert(cache.validateTwin(doc).isLeft)
    assert(cache.loadCount == 3)
  }
}
