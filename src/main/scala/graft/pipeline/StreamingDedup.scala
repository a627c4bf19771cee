package graft.pipeline

import java.security.MessageDigest

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Exact dedup over a document STREAM — the incremental-ingestion form of
  * [[Dedup.exact]]: documents arrive in micro-batches, the first
  * occurrence of each content hash is emitted, every later copy (same
  * batch or any later one) is dropped. The continuous-crawl counterpart
  * of the batch pass: the corpus stays deduped as it grows instead of
  * being re-deduped from scratch.
  *
  * Scale shape: state is `flatMapGroupsWithState` keyed by the content
  * hash, so it shards across executors by hash and holds ONE small entry
  * per DISTINCT document ever seen — the streaming analogue of the
  * batch pass's hash shuffle. Within a micro-batch the winner is the
  * minimum id (the same survivor-election rule as [[Dedup.exact]]), so
  * replaying the same batches yields the same corpus.
  *
  * No timeout: dedup state is per-content and never expires by design
  * (a copy arriving a year later is still a copy). Callers bounding
  * state for TTL'd corpora can fork with a ProcessingTimeTimeout.
  */
object StreamingDedup {

  case class Doc(docId: Long, text: String)

  /** First id that claimed this content hash. */
  case class Claim(docId: Long)

  private[pipeline] def contentHash(text: String): String =
    MessageDigest.getInstance("MD5").digest(text.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** The deduped stream: append-mode, emits each first occurrence once.
    * Works identically under `readStream` (stateful) and over a bounded
    * Dataset (one "batch"). */
  def dedupStream(docs: Dataset[Doc]): Dataset[Doc] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(d => contentHash(d.text))
      .flatMapGroupsWithState[Claim, Doc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, it, state: GroupState[Claim]) =>
          if (state.exists) Iterator.empty
          else {
            // min-id winner within the batch: deterministic under replay
            val first = it.minBy(_.docId)
            state.update(Claim(first.docId))
            Iterator.single(first)
          }
      }
  }
}
