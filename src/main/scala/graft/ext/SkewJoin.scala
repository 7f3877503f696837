package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit key-salting for skewed shuffle joins (§2.3 scale path,
  * sibling of `BloomJoin`): when one probe-side key owns a large
  * fraction of the rows, a plain equi-join funnels that key's whole
  * volume through one reducer. The classic fix joins on (key, salt)
  * instead — the big side gets a salt derived from its ROW identity
  * (deterministic: a re-run or re-shard salts identically, unlike
  * `rand()`), the small side is replicated once per salt value, and
  * the hot key's rows spread over `salts` reducers. Replication ×
  * salting partitions the original match set exactly, so the result
  * EQUALS the plain join (spec-pinned); the cost is a `salts`×
  * blow-up of the small side — the same trade AQE's runtime skew-join
  * makes, available here when the skew is known ahead of time, when
  * the join feeds a hash-partitioned write AQE can't re-plan, or when
  * plan stability matters more than adaptivity.
  */
object SkewJoin {

  /** Inner equi-join of `big` and `small` on `joinKeys` (bigCol →
    * smallCol pairs) with the small side salted `salts` ways. */
  def saltedInner(big: DataFrame, small: DataFrame,
      joinKeys: Seq[(String, String)], salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    require(joinKeys.nonEmpty, "need at least one join key pair")
    require(!big.columns.contains("_sj_salt") &&
      !small.columns.contains("_sj_salt_r"),
      "salt column names collide with input columns")
    // row-identity salt: xxhash64 over the whole row spreads a hot
    // KEY's many distinct rows across buckets (a key-derived salt
    // would be constant per key — no spread), and is deterministic
    // per row content, so re-runs and re-shards salt identically
    val b = big.withColumn("_sj_salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(salts.toLong)))
    val s = small.withColumn("_sj_salt_r",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    val cond = (joinKeys.map { case (bk, sk) => b(bk) === s(sk) } :+
      (b("_sj_salt") === s("_sj_salt_r"))).reduce(_ && _)
    b.join(s, cond, "inner").drop("_sj_salt", "_sj_salt_r")
  }
}
