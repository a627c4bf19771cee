package graft.core

import java.security.MessageDigest
import java.util.UUID

/** Weak ETag generation, semantics-compatible with the reference
  * (`src/AgeDigitalTwins/ETagGenerator.cs:10-16` of /root/reference):
  * `W/"<guid>"` where the guid bytes are the MD5 of (id + ISO-8601 time).
  */
object ETag {
  def generate(id: String, isoTime: String): String = {
    val md5 = MessageDigest.getInstance("MD5").digest((id + isoTime).getBytes("UTF-8"))
    val bb = java.nio.ByteBuffer.wrap(md5)
    val guid = new UUID(bb.getLong, bb.getLong)
    s"""W/"$guid""""
  }

  /** If-Match check: `*` matches anything; otherwise exact match. */
  def matches(ifMatch: String, current: String): Boolean =
    ifMatch == "*" || ifMatch == current

  def nowIso(): String = java.time.Instant.now().toString
}
