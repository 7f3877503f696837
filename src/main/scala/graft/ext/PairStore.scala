package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** PERSISTED CO-OCCURRENCE PAIR STORE — the ingest-incremental twin of
  * the batch co-visitation query (`ev_item_cooccurrence`), following
  * the mergeable-store discipline of [[FreqSketch]] / [[QuantileSketch]]:
  * each ingest batch appends its own partial aggregates under
  * `dir/<kind>/batch=<id>`, and the serving query folds store rows
  * only — the event corpus is never re-read.
  *
  * MERGEABILITY CONTRACT (checked, not assumed): per-pair co-user
  * counts and per-item user counts are DISTINCT-user counts, which sum
  * across batches only when batches partition the USERS (a user's
  * whole history lands in one batch — the `pmod(user_id, nBatches)`
  * ingest sharding every store in this repo uses). The per-user
  * fan-out cap is a per-user property, so user-sharded batches apply
  * it identically to the corpus-wide query — store-served results are
  * EXACTLY the batch query's, not an approximation. Each batch records
  * its (shard spec, cap) in `meta`; the fold refuses mixed caps or a
  * missing shard declaration rather than merging unsoundly.
  *
  * Scale shape: a batch's pair domain is capped at C(cap, 2) per user
  * before aggregation (the capped-pair discipline — a power user's
  * fan-out is bounded, never quadratic); the fold shuffles ≤ batches ×
  * catalog² pair rows, map-side combined. New events = one addBatch
  * for their user shard + re-fold; no corpus re-cluster.
  */
object PairStore {

  /** Append one USER-SHARDED ingest batch: distinct (user, item) pairs
    * are capped at `maxItemsPerUser` items per user (deterministic
    * ascending-item cut, mirrored by the batch query and the oracle),
    * then pair / item / user partials aggregate and persist. */
  def addBatch(pairs: DataFrame, userCol: String, itemCol: String,
      dir: String, batchId: Long, shard: String,
      maxItemsPerUser: Int = 64): Unit = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val capped = pairs
      .select(col(userCol).as("user_id"), col(itemCol).as("item"))
      .distinct()
      .withColumn("_rk", row_number().over(
        Window.partitionBy("user_id").orderBy("item")))
      .filter(col("_rk") <= maxItemsPerUser).drop("_rk")
      .localCheckpoint(true) // three aggregates ride one capped set
    capped.select(col("user_id"), col("item").as("item_a"))
      .join(capped.select(col("user_id"), col("item").as("item_b")),
        Seq("user_id"))
      .filter(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("n_co")) // (user, item) distinct ⇒ exact
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/pairs/batch=$batchId")
    capped.groupBy("item").agg(count(lit(1)).as("nu"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/items/batch=$batchId")
    val nUsers = capped.select("user_id").distinct().count()
    Seq((nUsers, shard, maxItemsPerUser)).toDF("n_users", "shard", "cap")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/meta/batch=$batchId")
  }

  /** Serve the co-visitation matrix from the store alone: fold pair /
    * item / user partials across batches, keep pairs co-bought by at
    * least `minCo` users, lift = n_co·N / (n_a·n_b) (integer products,
    * one IEEE divide — the batch query's exact arithmetic). */
  def cooccurrenceFromStore(spark: SparkSession, dir: String,
      minCo: Long = 2L): DataFrame = {
    val meta = StoreRead.parquet(spark, s"$dir/meta")
    val m = meta.agg(
      countDistinct("shard").as("nShards"),
      countDistinct("cap").as("nCaps"),
      sum("n_users").as("users")).head
    require(m.getLong(0) == 1L && m.getLong(1) == 1L,
      "pair store batches disagree on shard spec or cap - " +
        "distinct-user partials only merge across user-disjoint, " +
        "equally-capped batches")
    val nUsers = m.getLong(2) // user-disjoint shards sum exactly
    val co = StoreRead.parquet(spark, s"$dir/pairs")
      .groupBy("item_a", "item_b").agg(sum("n_co").as("n_co"))
      .filter(col("n_co") >= minCo) // threshold at FOLD time, not per batch
    val items = StoreRead.parquet(spark, s"$dir/items")
      .groupBy("item").agg(sum("nu").as("nu"))
    co.join(broadcast(items
        .select(col("item").as("item_a"), col("nu").as("n_a"))), "item_a")
      .join(broadcast(items
        .select(col("item").as("item_b"), col("nu").as("n_b"))), "item_b")
      .withColumn("lift",
        round((col("n_co") * nUsers).cast(DoubleType)
          / (col("n_a") * col("n_b")).cast(DoubleType), 6))
      .select("item_a", "item_b", "n_co", "n_a", "n_b", "lift")
      .orderBy("item_a", "item_b")
  }
}
