package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash BAND INDEX for continuous-ingest dedup — the
  * missing piece between batch LSH ([[Dedup.lshCandidatePairs]], which
  * re-signatures the whole corpus every run) and a production training
  * -data pipeline, where batches arrive forever and each new batch
  * must be deduped against EVERYTHING accepted so far without touching
  * the corpus again (the [[AnnIndex.append]] analog for text dedup).
  *
  * Layout: `band=<i>/` parquet partitions of (sig, id) — the corpus's
  * band signatures, written once at build and APPENDED per accepted
  * batch; a tiny `meta` sidecar pins nBands so probes can't mismatch
  * the signature scheme.
  *
  * Probe shape at 100 TB: the new batch is small, so its band rows
  * BROADCAST to the index scan — the index is read map-side (columns
  * sig+id only, never the texts), no shuffle of the corpus, no
  * re-signaturing. Bucket-size capping happens AFTER the join, so the
  * count runs over matched buckets only; capped buckets land in the
  * `dropped` recall ledger (nothing silently lost — the
  * [[Dedup.CandidateStats]] discipline). Within-batch duplicates are
  * found by the ordinary in-memory LSH pass over just the batch.
  *
  * The index stores CANDIDATE-generation state only; verification
  * (word-set or shingle Jaccard via [[Dedup.jaccardVerify]]) still
  * reads the two texts of each surviving pair, exactly like the batch
  * path.
  */
object BandIndex {

  /** Cross-batch candidate pairs (`id_new`, `id_corpus`), within-batch
    * candidate pairs (`id_a` < `id_b`), and the capped-bucket recall
    * ledger (`band`, `sig`, `size`). */
  final case class BatchCandidates(crossPairs: DataFrame,
      innerPairs: DataFrame, dropped: DataFrame)

  private def bandRows(df: DataFrame, idCol: String, textCol: String,
      nBands: Int): DataFrame = {
    val tokenized = df.select(col(idCol).as("id"),
      Dedup.words(col(textCol)).as("_ws"))
      .filter(size(col("_ws")) > 0)
    Dedup.withMinhashBands(tokenized, col("_ws"), nBands)
      .select(col("id"), explode(array((0 until nBands).map(i =>
        struct(lit(i).as("band"), col(s"band$i").as("sig"))): _*)).as("e"))
      .select(col("e.band").as("band"), col("e.sig").as("sig"), col("id"))
  }

  /** Build (overwrite) the index from the current corpus. */
  def build(df: DataFrame, idCol: String, textCol: String, nBands: Int,
      dir: String): Unit = {
    bandRows(df, idCol, textCol, nBands)
      .repartition(col("band"))
      .write.mode("overwrite").partitionBy("band").parquet(s"$dir/data")
    val spark = df.sparkSession
    import spark.implicits._
    Seq(nBands).toDF("n_bands")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  def nBands(spark: SparkSession, dir: String): Int =
    StoreRead.parquet(spark, s"$dir/meta").head.getInt(0)

  /** Append an ACCEPTED batch's band rows (call after the caller has
    * decided which new docs survive dedup — appending rejected dups
    * would only grow buckets). */
  def append(df: DataFrame, idCol: String, textCol: String,
      dir: String): Unit =
    bandRows(df, idCol, textCol, nBands(df.sparkSession, dir))
      .repartition(col("band"))
      .write.mode("append").partitionBy("band").parquet(s"$dir/data")

  /** Candidate pairs for a NEW batch against the indexed corpus plus
    * within the batch itself. The batch's band rows broadcast; the
    * index never shuffles and its texts are never read. */
  def candidateBatch(spark: SparkSession, dir: String, newDocs: DataFrame,
      idCol: String, textCol: String,
      maxBucket: Int = 1000): BatchCandidates = {
    val n = nBands(spark, dir)
    val newBands = bandRows(newDocs, idCol, textCol, n)
      .withColumnRenamed("id", "id_new")
    val index = StoreRead.parquet(spark, s"$dir/data")
      .select(col("band"), col("sig"), col("id").as("id_corpus"))
    val joined = index.join(broadcast(newBands), Seq("band", "sig"))
    // cap on bucket OCCUPANCY (distinct docs sharing the signature,
    // corpus + batch) — the same quantity the batch path caps on, so
    // index-based candidates equal a full recompute exactly. Computed
    // AFTER the join: the aggregation runs over matched buckets only,
    // not the whole index.
    val stats = joined.groupBy("band", "sig")
      .agg((countDistinct("id_corpus") + countDistinct("id_new")).as("_n"))
    val sized = joined.join(broadcast(stats), Seq("band", "sig"))
    val crossPairs = sized.filter(col("_n") <= maxBucket)
      .select(col("id_new"), col("id_corpus")).distinct()
    val dropped = stats.filter(col("_n") > maxBucket)
      .select(col("band"), col("sig"), col("_n").as("size"))
    val inner = Dedup.lshCandidatePairsWithStats(
      newDocs, idCol, textCol, nBands = n, maxBucket = maxBucket)
    BatchCandidates(crossPairs, inner.pairs,
      dropped.unionByName(inner.dropped))
  }
}
