package graft

import org.apache.spark.sql.functions._

import graft.ext.{BandIndex, Dedup}

/** Persisted band index: incremental-ingest dedup candidates must
  * match the batch LSH recompute exactly, and appended batches must
  * become probe-visible. */
class BandIndexSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet")
    .select("doc_id", "text")

  test("new batch is deduped against the corpus without re-signaturing it") {
    val idxDir = tmpDir("bandidx")
    val corpus = docs.filter(col("doc_id") < 100)
    BandIndex.build(corpus, "doc_id", "text", nBands = 4, idxDir)
    // batch: two corpus texts under NEW ids + one genuinely new doc
    val dupTexts = docs.filter(col("doc_id").isin(10L, 20L))
      .withColumn("doc_id", col("doc_id") + 10000L)
    val freshDoc = docs.filter(col("doc_id") === 400L)
    val batch = dupTexts.unionByName(freshDoc)
    val c = BandIndex.candidateBatch(spark, idxDir, batch, "doc_id", "text")
    val cross = c.crossPairs.as[(Long, Long)].collect().toSet
    // the re-ingested texts must pair with their corpus originals
    assert(cross.contains((10010L, 10L)), s"cross=$cross")
    assert(cross.contains((10020L, 20L)), s"cross=$cross")
  }

  test("index candidates == batch LSH recompute restricted to batch-touching pairs") {
    val idxDir = tmpDir("bandidx-par")
    val corpus = docs.filter(col("doc_id") < 200)
    val batch = docs.filter(col("doc_id") >= 200 && col("doc_id") < 260)
    BandIndex.build(corpus, "doc_id", "text", nBands = 4, idxDir)
    val c = BandIndex.candidateBatch(spark, idxDir, batch, "doc_id", "text")
    val crossNorm = c.crossPairs.as[(Long, Long)].collect().toSet[(Long, Long)]
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
    val got = crossNorm ++ c.innerPairs.as[(Long, Long)].collect().toSet
    val full = Dedup.lshCandidatePairs(
      corpus.unionByName(batch), "doc_id", "text", nBands = 4)
      .as[(Long, Long)].collect().toSet
    val expected = full.filter { case (a, b) => a >= 200 || b >= 200 }
    assert(got === expected)
  }

  test("appended batches become probe-visible") {
    val idxDir = tmpDir("bandidx-app")
    BandIndex.build(docs.filter(col("doc_id") < 50), "doc_id", "text",
      nBands = 4, idxDir)
    val b2 = docs.filter(col("doc_id") >= 50 && col("doc_id") < 60)
    BandIndex.append(b2, "doc_id", "text", idxDir)
    // a batch duplicating a b2 text must now hit b2 through the index
    val b3 = docs.filter(col("doc_id") === 55L)
      .withColumn("doc_id", lit(90055L))
    val c = BandIndex.candidateBatch(spark, idxDir, b3, "doc_id", "text")
    val cross = c.crossPairs.as[(Long, Long)].collect().toSet
    assert(cross.contains((90055L, 55L)), s"cross=$cross")
  }
}
