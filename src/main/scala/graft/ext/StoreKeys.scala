package graft.ext

/** Batch-key hygiene for the sketch stores' partition-directory
  * layout. Stores that OVERWRITE `batch_id=<key>` directories for
  * replay idempotence must key batches collision-free: hashing a run
  * id to 32/64 bits silently lets two distinct runs share a
  * directory, and the overwrite then DELETES the earlier run's
  * summary (the replay fix turned that collision from an overcount
  * into data loss). The run id string itself is the collision-free
  * key; it only needs sanitizing to the filesystem-safe charset. */
private[ext] object StoreKeys {

  /** Filesystem/partition-value-safe form of a batch key: characters
    * outside [A-Za-z0-9._-] become '_'. A key that needed replacement
    * also gets the raw key's 64-bit hash appended, so sanitized twins
    * ("a/b" vs "a:b") stay distinct directories — the hash is never
    * the identity on its own (an already-safe key is used verbatim),
    * it only splits keys the charset replacement merged. */
  def sanitize(key: String): String = {
    require(key.nonEmpty, "batch key must be non-empty")
    val safe = key.map { c =>
      if (c.isLetterOrDigit || c == '.' || c == '_' || c == '-') c else '_'
    }
    if (safe == key) safe
    else {
      val h = java.lang.Long.toHexString(
        key.foldLeft(1125899906842597L)((a, c) => a * 31 + c))
      s"${safe}_$h"
    }
  }
}
