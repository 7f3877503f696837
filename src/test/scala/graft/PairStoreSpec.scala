package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.PairStore

/** Co-occurrence pair store: user-sharded batch partials must fold to
  * EXACTLY the one-shot matrix (distinct-user mergeability), and the
  * fold must refuse unsoundly-merged stores. */
class PairStoreSpec extends SparkSpec {
  import spark.implicits._

  // users 1..20, each buying a deterministic overlapping item set;
  // duplicates included (distinctness is the store's job)
  private def purchases: DataFrame =
    (1L to 20L).flatMap { u =>
      (0 to (u % 5).toInt).map(i => (u, ((u + i) % 7).toInt)) ++
        Seq((u, (u % 7).toInt)) // duplicate
    }.toDF("user_id", "item")

  private def oneShot(minCo: Long): DataFrame = {
    val capped = purchases.distinct()
      .withColumn("_rk", row_number().over(
        Window.partitionBy("user_id").orderBy("item")))
      .filter(col("_rk") <= 64).drop("_rk")
    val co = capped.select(col("user_id"), col("item").as("item_a"))
      .join(capped.select(col("user_id"), col("item").as("item_b")),
        Seq("user_id"))
      .filter(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("n_co"))
      .filter(col("n_co") >= minCo)
    val items = capped.groupBy("item").agg(count(lit(1)).as("nu"))
    val n = capped.select("user_id").distinct().count()
    co.join(items.select(col("item").as("item_a"), col("nu").as("n_a")), "item_a")
      .join(items.select(col("item").as("item_b"), col("nu").as("n_b")), "item_b")
      .withColumn("lift", round((col("n_co") * n).cast("double")
        / (col("n_a") * col("n_b")).cast("double"), 6))
      .select("item_a", "item_b", "n_co", "n_a", "n_b", "lift")
      .orderBy("item_a", "item_b")
  }

  test("user-sharded batches fold to the one-shot matrix exactly") {
    val dir = tmpDir("pairstore")
    (0L to 2L).foreach { b =>
      PairStore.addBatch(purchases.filter(pmod($"user_id", lit(3)) === b),
        "user_id", "item", dir, batchId = b, shard = "pmod(user_id,3)")
    }
    val store = PairStore.cooccurrenceFromStore(spark, dir, minCo = 2L)
      .collect().map(_.toSeq)
    val oneshot = oneShot(2L).collect().map(_.toSeq)
    assert(store.toSeq === oneshot.toSeq)
    assert(store.nonEmpty)
  }

  test("fold refuses batches with mismatched caps or shard specs") {
    val dir = tmpDir("pairstore-bad")
    PairStore.addBatch(purchases.filter($"user_id" <= 10), "user_id", "item",
      dir, 0L, shard = "range", maxItemsPerUser = 64)
    PairStore.addBatch(purchases.filter($"user_id" > 10), "user_id", "item",
      dir, 1L, shard = "range", maxItemsPerUser = 8)
    val e = intercept[IllegalArgumentException] {
      PairStore.cooccurrenceFromStore(spark, dir).collect()
    }
    assert(e.getMessage.contains("cap"))
  }
}
