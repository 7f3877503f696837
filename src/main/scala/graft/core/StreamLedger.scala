package graft.core

/** The `stream_batch:<tag>` commit-metadata ledger convention — ONE
  * definition shared by the DSv2 streaming sink
  * ([[graft.sources.GraftStreamingWrite]]) and the foreachBatch
  * pipelines ([[graft.streaming.StreamingView]]), so a table can move
  * between the two without the ledger changing meaning.
  *
  * Value formats, newest first (each reader accepts all three —
  * pre-upgrade ledgers parse with the absent fields unknown):
  *
  *  - `"<epoch>:<rows>:<hash>"` — sink commits: the applied epoch id,
  *    its row count, and an ORDER-INDEPENDENT content hash (sum of
  *    per-row Murmur3 value hashes, Spark's stable `hash()` semantics)
  *    so a true crash-replay is distinguishable from a pinned tag
  *    restarted over a changed source even at equal cardinality;
  *  - `"<epoch>:<rows>"` — sink commits before the hash existed;
  *  - `"<epoch>"` — foreachBatch watermarks (StreamingView).
  */
object StreamLedger {

  def key(tag: String): String = s"stream_batch:$tag"

  /** (epoch, rowCount if recorded, contentHash if recorded). */
  def parse(v: String): (Long, Option[Long], Option[Long]) =
    v.split(':') match {
      case Array(e, r, h) => (e.toLong, Some(r.toLong), Some(h.toLong))
      case Array(e, r) => (e.toLong, Some(r.toLong), None)
      case _ => (v.toLong, None, None)
    }

  /** The applied epoch/batch id alone — what a plain watermark
    * consumer (StreamingView's replay guard) needs. */
  def epochOf(v: String): Long = parse(v)._1

  def format(epoch: Long, rows: Long, hash: Long): String =
    s"$epoch:$rows:$hash"
}
