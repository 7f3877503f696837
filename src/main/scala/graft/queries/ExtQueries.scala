package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Qhelpers._
import graft.ext.{AnnIndex, Dedup, Similarity}

/** Oracle-checked queries over the `graft.ext` dedup/similarity library
  * (SimHash, hyperplane LSH, bucketed near-dup, multi-probe ANN) —
  * the scale-path operators of SURVEY §2.11, exercised end-to-end via
  * the same code paths the library exposes.
  */
object ExtQueries {

  /** X2 — SimHash near-dup pairs (hamming ≤ 3 on a portable 16-bit
    * simhash) over a bounded corpus slice; found via pigeonhole
    * blocking, never a cross join. */
  def x2_simhash_pairs(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").filter(col("doc_id") < 80)
    Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .select(col("id_a"), col("id_b"), col("hamming").cast(LongType))
      .orderBy("id_a", "id_b")
  }

  /** X1 scale path — random-hyperplane LSH bucket histogram over the
    * embedding corpus (the partition layout a cluster would persist
    * for sub-linear ANN reads). */
  def x1_lsh_buckets(s: SparkSession, dir: String): DataFrame =
    Similarity.lshBuckets(t(s, dir, "embeddings"), "embedding", nBits = 8)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min(col("vec_id")).as("min_vec_id"))
      .orderBy("bucket")

  /** X1 — multi-probe ANN top-k: query bucket ± 1 bit, exact cosine
    * within candidates only. */
  def x1_ann_topk(s: SparkSession, dir: String): DataFrame =
    Similarity.annTopK(t(s, dir, "embeddings"), "embedding",
      lit(0L), "vec_id", k = 1000, nBits = 8, probeHamming = 1)
      .select(col("vec_id"), col("label"),
        round(col("score"), 6).as("score"))
      .orderBy(desc("score"), asc("vec_id"))
      .limit(10)

  /** X1 — same ANN top-k, but served from the PERSISTED
    * bucket-partitioned index: build writes `bucket=` directories once,
    * the probe prunes its scan to query-bucket ± 1 bit via
    * `PartitionFilters` (sub-linear read; nothing recomputes
    * signatures at query time). Results must equal [[x1_ann_topk]]. */
  def x1_ann_index_topk(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val idxDir = annIndexDir(s, dir)
    val qv = emb.filter(col("vec_id") === 0L).select(col("embedding"))
      .head.getSeq[Float](0).map(_.toDouble)
    AnnIndex.topK(s, idxDir, emb.schema, "embedding", qv,
      k = 1000, nBits = 8, probeHamming = 1)
      .filter(col("vec_id") =!= 0L)
      .select(col("vec_id"), col("label"),
        round(col("score"), 6).as("score"))
      .orderBy(desc("score"), asc("vec_id"))
      .limit(10)
  }

  /** X1 — INDEX-SERVED kNN majority-label classification: the labeling
    * shape a 100 TB curation pipeline actually runs — candidates from
    * the persisted IVF-PQ index, then the SAME rounded-score cut and
    * per-label vote roll-up as the exact brute-force twin
    * ([[graft.queries.TextSim.x1_knn_label]], which is also the
    * oracle). Margin discipline as [[x1_ivfpq_topk]]: nProbe = nLists
    * on this clusterless synthetic corpus (pruning would drop true
    * neighbors — see PLANS.md); refine = 400 measured to recover the
    * FULL exact top-50 at every tested SF (refine = 200 already drops
    * one member), and the vote then cuts at 25 — a further 2×
    * candidate margin. The index changes scan bytes (codes not
    * vectors) and, on clustered data, the probed fraction — never the
    * answer. */
  def x1_knn_index_label(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val idxDir = ivfPqIndexDir(s, dir)
    val qv = emb.filter(col("vec_id") === 0L).select(col("embedding"))
      .head.getSeq[Float](0).map(_.toDouble)
    graft.ext.IvfPq.persistedTopK(s, idxDir, emb.schema, "embedding",
        "vec_id", qv, k = 50, nProbe = 8, refine = 400)
      .filter(col("vec_id") =!= 0L)
      .withColumn("score", round(col("score"), 6))
      .orderBy(desc("score"), asc("vec_id"))
      .limit(25)
      .groupBy("label")
      .agg(count(lit(1)).as("votes"))
      .orderBy(desc("votes"), asc("label"))
  }

  /** X1 — INDEX-SERVED BATCH kNN labeling: [[graft.ext.IvfPq
    * .topKBatch]] end to end — 8 probes as ONE partition-pruned job
    * over the persisted IVF-PQ index, then the per-(query, label)
    * vote. Self-INCLUSIVE vote (the query is its own nearest
    * neighbor — rank 1 by construction), which keeps the aggregator's
    * k-cut exact; the exact batch twin [[graft.queries.TextSim
    * .x1_knn_batch]] uses the self-exclusive form. nProbe = nLists on
    * this clusterless corpus (PLANS.md); exact-vector scoring inside
    * the probed lists means no refine margin is needed — the oracle
    * is the plain per-query exact rank. */
  def x1_knn_batch_index(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val idxDir = ivfPqIndexDir(s, dir)
    val queries = emb.filter(col("vec_id") <= 7L)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toSeq)
      .sortBy(_._1).toSeq
    graft.ext.IvfPq.topKBatch(s, idxDir, emb.schema, "embedding",
        "vec_id", queries, k = 25, nProbe = 8)
      .join(emb.select(col("vec_id"), col("label")), Seq("vec_id"))
      .groupBy("query_id", "label")
      .agg(count(lit(1)).as("votes"))
      .orderBy(asc("query_id"), desc("votes"), asc("label"))
      .select("query_id", "label", "votes")
  }

  /** X1 — embedding-quality curation: per label, the 3 vectors
    * farthest from their label centroid (lowest cosine — the
    * mislabeled/failed-embed detector). The centroid is an exact
    * DECIMAL element-wise sum (cosine is scale-invariant, so sum ≡
    * mean in direction and the decimal fold is independent of
    * aggregation order — a double mean would carry partition-order
    * noise into the ranking). */
  def x1_label_outliers(s: SparkSession, dir: String): DataFrame =
    Similarity.labelCentroidOutliers(t(s, dir, "embeddings"),
      "embedding", "vec_id", "label", k = 3)
      .orderBy("label", "rank")

  /** X2 — embedding-cosine near-dup pairs within LSH buckets. */
  def x2_cosine_neardup(s: SparkSession, dir: String): DataFrame =
    Similarity.cosineNearDupPairs(t(s, dir, "embeddings"), "embedding",
      "vec_id", threshold = 0.35, nBits = 4)
      .select(col("id_a"), col("id_b"), round(col("score"), 6).as("score"))
      .orderBy("id_a", "id_b")

  /** Build-once cache for persisted index layouts: an index is built
    * once and probed many times — rebuilding per query would charge
    * the one-time write to every probe. Keyed by source-file identity
    * (size + mtime), completion marked by the written `_SUCCESS`.
    *
    * NAMING CONTRACT: the `graft-$tag-$key` spelling and every tag
    * below are FROZEN — a rename orphans the cached build and
    * re-charges it to the next probe (the round-6
    * `x1_ann_index_topk` 4.2× "regression" was exactly that). A tag
    * changes ONLY when the build CONTENT changes (e.g. `pqidx`'s `-s`
    * suffix when codebook training moved to bounded samples), because
    * then the old artifact is genuinely stale. */
  private[queries] def buildOnce(dir: String, srcTable: String, tag: String,
      marker: String = "data/_SUCCESS")(build: String => Unit): String = {
    val src = new java.io.File(s"$dir/$srcTable.parquet")
    val key = Integer.toHexString(
      (dir, src.length(), src.lastModified()).hashCode())
    val idxDir = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft-$tag-$key")
    if (!new java.io.File(idxDir, marker).exists())
      build(idxDir.toString)
    idxDir.toString
  }

  // ---- shared persisted-index builders: each query's probe and the
  // Bench warm-up prebuild go through the SAME buildOnce call (same
  // tag, marker, params), so warm-up pays every build exactly once
  // and probes always cache-hit.

  private def annIndexDir(s: SparkSession, dir: String): String =
    buildOnce(dir, "embeddings", "annidx-nb8", marker = "_SUCCESS") { d =>
      AnnIndex.build(t(s, dir, "embeddings"), "embedding", nBits = 8, d)
    }

  /** Batch-appended HLL sketch store over `documents` (4 ingest
    * batches split by doc_id). Marker written LAST after a wipe, so a
    * crashed build re-runs from scratch instead of double-appending
    * (the tx_clone_read lesson). */
  private def hllSketchDir(s: SparkSession, dir: String): String =
    buildOnce(dir, "documents", "hllsk", marker = "_DONE") { d =>
      wipeDir(d)
      val docs = t(s, dir, "documents")
      (0L to 3L).foreach { b =>
        graft.ext.DistinctSketch.addBatch(
          docs.filter(pmod(col("doc_id"), lit(4)) === b),
          Seq("lang", "source"), d, batchId = b)
      }
      markDone(d)
    }

  /** Batch-appended GROUPED sketch store (distinct sources per lang)
    * and histogram store (l_quantity), same wipe-then-mark build
    * discipline as [[hllSketchDir]]. */
  private def hllGroupSketchDir(s: SparkSession, dir: String): String =
    buildOnce(dir, "documents", "hllgsk", marker = "_DONE") { d =>
      wipeDir(d)
      val docs = t(s, dir, "documents")
      (0L to 3L).foreach { b =>
        graft.ext.DistinctSketch.addBatchGrouped(
          docs.filter(pmod(col("doc_id"), lit(4)) === b),
          Seq("lang"), Seq("source"), d, batchId = b)
      }
      markDone(d)
    }

  /** Batch-appended FREQUENCY summary store (document bigrams), same
    * wipe-then-mark build discipline as [[hllSketchDir]]. */
  private def freqSketchDir(s: SparkSession, dir: String): String =
    buildOnce(dir, "documents", "freqsk", marker = "_DONE") { d =>
      wipeDir(d)
      val docs = t(s, dir, "documents")
      (0L to 3L).foreach { b =>
        graft.ext.FreqSketch.addBatch(
          TextSim.bigramStream(docs.filter(pmod(col("doc_id"), lit(4)) === b)),
          "bigram", d, batchId = b)
      }
      markDone(d)
    }

  /** GROUPED frequency store (per-language document bigrams), same
    * wipe-then-mark build discipline as [[freqSketchDir]]. */
  private def freqGroupSketchDir(s: SparkSession, dir: String): String =
    buildOnce(dir, "documents", "freqgsk", marker = "_DONE") { d =>
      wipeDir(d)
      val docs = t(s, dir, "documents")
      (0L to 3L).foreach { b =>
        graft.ext.FreqSketch.addBatchGrouped(
          TextSim.bigramStreamByLang(
            docs.filter(pmod(col("doc_id"), lit(4)) === b)),
          "lang", "bigram", d, batchId = b)
      }
      markDone(d)
    }

  private def histSketchDir(s: SparkSession, dir: String): String =
    buildOnce(dir, "lineitem", "histsk", marker = "_DONE") { d =>
      wipeDir(d)
      val li = t(s, dir, "lineitem")
      (0L to 3L).foreach { b =>
        graft.ext.HistogramSketch.addBatch(
          li.filter(pmod(col("l_orderkey"), lit(4)) === b),
          Seq("l_quantity"), d, batchId = b)
      }
      markDone(d)
    }

  /** GROUPED histogram store (per-lang content-length buckets) —
    * the quantile symmetry of [[hllGroupSketchDir]]. */
  private def histGroupSketchDir(s: SparkSession, dir: String): String =
    buildOnce(dir, "documents", "histgsk", marker = "_DONE") { d =>
      wipeDir(d)
      val docs = t(s, dir, "documents")
      (0L to 3L).foreach { b =>
        graft.ext.HistogramSketch.addBatchGrouped(
          docs.filter(pmod(col("doc_id"), lit(4)) === b)
            .select(col("lang"),
              (floor(col("n_chars") / 100) * 100).as("len_bucket")),
          Seq("lang"), Seq("len_bucket"), d, batchId = b)
      }
      markDone(d)
    }

  /** Histogram store fed through the INGEST bucketization (the exact
    * shape ScanJob appends per run: length bucketized to a bounded
    * bin domain), batched like an ingest would be. */
  private def histIngestDir(s: SparkSession, dir: String): String =
    buildOnce(dir, "documents", "histingest", marker = "_DONE") { d =>
      wipeDir(d)
      val docs = t(s, dir, "documents")
      (0L to 3L).foreach { b =>
        graft.ext.HistogramSketch.addBatch(
          docs.filter(pmod(col("doc_id"), lit(4)) === b)
            .select((floor(col("n_chars") / 100) * 100).as("len_bucket")),
          Seq("len_bucket"), d, batchId = b)
      }
      markDone(d)
    }

  /** Ingest-shaped quantile store over RAW document lengths — the
    * unbinned twin of [[histIngestDir]]: where the histogram path
    * must pre-bucketize to keep its domain bounded (100-char bins →
    * ±100-char quantile granularity), the quantile summary keeps the
    * EXACT lengths while per-batch distincts sit inside capacity
    * (≤ 474 at every SF vs capacity 1024). */
  private def quantIngestDir(s: SparkSession, dir: String): String =
    buildOnce(dir, "documents", "quantingest", marker = "_DONE") { d =>
      wipeDir(d)
      val docs = t(s, dir, "documents")
      (0L to 3L).foreach { b =>
        graft.ext.QuantileSketch.addBatch(
          docs.filter(pmod(col("doc_id"), lit(4)) === b),
          "n_chars", d, batchId = b, capacity = 1024)
      }
      markDone(d)
    }

  private def wipeDir(d: String): Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    val root = new java.io.File(d)
    if (root.exists()) rm(root)
  }

  private def markDone(d: String): Unit = {
    new java.io.File(d).mkdirs()
    new java.io.File(d, "_DONE").createNewFile()
    ()
  }

  /** X — per-group mergeable COUNT(DISTINCT): the "distinct Xs per Y"
    * dashboard ask served from the grouped sketch store — one fold
    * over ∝ batches × groups rows. Sparse-exact at these per-group
    * cardinalities (≤ 20 sources), so the differential oracle is
    * sound. */
  def x_hll_group_distinct(s: SparkSession, dir: String): DataFrame = {
    val skDir = hllGroupSketchDir(s, dir)
    graft.ext.DistinctSketch.estimateGrouped(s, skDir, Seq("lang"), "source")
      .orderBy("lang")
  }

  /** X — discrete quantiles from the mergeable histogram store:
    * l_quantity is integer-valued with a bounded domain, so the
    * batch-merged histogram is EXACT and the quantile fold costs
    * ∝ batches × domain, never a lineitem scan. q's are binary-exact
    * (0.25/0.5/0.75) so both engines compute the identical
    * `ceil(q·N)` rank. */
  def x_hist_quantiles(s: SparkSession, dir: String): DataFrame = {
    val hDir = histSketchDir(s, dir)
    graft.ext.HistogramSketch.quantiles(s, hDir, "l_quantity",
      Seq(0.25, 0.5, 0.75))
  }

  /** X — the ingest-fed twin of [[x_hist_quantiles]]: quantiles of the
    * document content-length distribution served from the histogram
    * store the ingest path appends (ScanJob tracks the same
    * length-bucket shape per run; see `jobs/ScanJob`). Bucketized to
    * 100-char bins → bounded domain → batch-merged histogram is exact
    * over the bucketized values. */
  def x_hist_quantiles_ingest(s: SparkSession, dir: String): DataFrame = {
    val hDir = histIngestDir(s, dir)
    graft.ext.HistogramSketch.quantiles(s, hDir, "len_bucket",
      Seq(0.25, 0.5, 0.75))
  }

  /** X — EXACT document-length quantiles from the ingest-shaped
    * QUANTILE store: the histogram twin above answers from 100-char
    * bins (quantile = its bin floor); this store kept the raw
    * lengths (per-batch distincts inside capacity — the meta rows
    * prove it), so p25/p50/p75/p95 come back as exact character
    * counts. Same fold economics: ∝ batches × capacity rows, never a
    * documents scan. */
  def x_quant_quantiles_ingest(s: SparkSession, dir: String): DataFrame = {
    val qDir = quantIngestDir(s, dir)
    val (exact, _) = graft.ext.QuantileSketch.exactness(s, qDir)
    require(exact, "quantile store trimmed; the oracle needs the exact regime")
    graft.ext.QuantileSketch.quantiles(s, qDir, Seq(0.25, 0.5, 0.75, 0.95))
  }

  /** X — PER-GROUP quantiles from the grouped histogram store ("p25/
    * p50/p75 doc length per language"): the fold costs ∝ batches ×
    * groups × bins, never a documents scan; per-group windows are
    * bounded by the bin domain by contract. */
  def x_hist_group_quantiles(s: SparkSession, dir: String): DataFrame = {
    val hDir = histGroupSketchDir(s, dir)
    graft.ext.HistogramSketch.quantilesGrouped(s, hDir, Seq("lang"),
      "len_bucket", Seq(0.25, 0.5, 0.75))
  }

  /** X — mergeable COUNT(DISTINCT) from the persisted sketch store:
    * the 100 TB ingest answer to "how many distinct langs/sources so
    * far?" — the probe folds one tiny sketch row per batch per
    * column (cost ∝ batches, never corpus). At these cardinalities
    * (5 langs / 20 sources) HLL sparse mode is EXACT, so a
    * differential oracle against DuckDB's exact COUNT(DISTINCT) is
    * sound; large cardinalities carry the standard ~1.6 % envelope
    * (DistinctSketchSpec) and are deliberately not oracle'd. */
  def x_hll_distinct(s: SparkSession, dir: String): DataFrame = {
    val skDir = hllSketchDir(s, dir)
    val est = graft.ext.DistinctSketch.estimateAll(s, skDir)
      .toSeq.sortBy(_._1)
    import s.implicits._
    est.toDF("col", "n_distinct").orderBy("col")
  }

  private def pqIndexDir(s: SparkSession, dir: String): String =
    buildOnce(dir, "embeddings", "pqidx-m16k32-s") { d =>
      graft.ext.Pq.buildPersistedFlat(t(s, dir, "embeddings"),
        "embedding", m = 16, k = 32, d)
      ()
    }

  private def ivfPqIndexDir(s: SparkSession, dir: String): String =
    buildOnce(dir, "embeddings", "ivfpqidx-n8m16k32") { d =>
      graft.ext.IvfPq.buildPersisted(t(s, dir, "embeddings"),
        "embedding", nLists = 8, m = 16, k = 32, d)
      ()
    }

  private def textIndexDir(s: SparkSession, dir: String): String =
    buildOnce(dir, "documents", "textidx-nb16") { d =>
      graft.ext.TextIndex.build(t(s, dir, "documents"),
        "doc_id", "text", d, nBuckets = 16)
    }

  private def trigramIndexDir(s: SparkSession, dir: String): String =
    buildOnce(dir, "documents", "trgidx-nb16") { d =>
      graft.ext.TextIndex.buildTrigram(t(s, dir, "documents"),
        "doc_id", "text", d, nBuckets = 16)
    }

  // tag bumped -bs when the build gained the BM25 doc-stats sidecar
  // (the naming contract: a tag changes exactly when build CONTENT does)
  // marker = the LAST artifact the build writes, so a crash between
  // postings and doc-stats re-runs the build instead of half-serving
  private def positionalIndexDir(s: SparkSession, dir: String): String =
    buildOnce(dir, "documents", "posidx-bs-nb16",
        marker = "docstats/_SUCCESS") { d =>
      graft.ext.TextIndex.buildPositional(t(s, dir, "documents"),
        "doc_id", "text", d, nBuckets = 16)
    }

  /** Global + grouped quantile-summary stores over lineitem.l_quantity
    * (50 distinct values — the exact regime at capacity 256), four
    * ingest batches each, same wipe-then-mark build discipline as
    * [[freqSketchDir]]. */
  private def quantSketchDir(s: SparkSession, dir: String): String =
    buildOnce(dir, "lineitem", "quantsk", marker = "_DONE") { d =>
      wipeDir(d)
      val li = t(s, dir, "lineitem")
      (0L to 3L).foreach { b =>
        graft.ext.QuantileSketch.addBatch(
          li.filter(pmod(col("l_orderkey"), lit(4)) === b),
          "l_quantity", d, batchId = b, capacity = 256)
      }
      markDone(d)
    }

  private def quantGroupSketchDir(s: SparkSession, dir: String): String =
    buildOnce(dir, "lineitem", "quantgsk", marker = "_DONE") { d =>
      wipeDir(d)
      val li = t(s, dir, "lineitem")
      (0L to 3L).foreach { b =>
        graft.ext.QuantileSketch.addBatchGrouped(
          li.filter(pmod(col("l_orderkey"), lit(4)) === b),
          "l_returnflag", "l_quantity", d, batchId = b, capacity = 256)
      }
      markDone(d)
    }

  private def fuzzyIndexDir(s: SparkSession, dir: String): String =
    // marker = the LAST artifact buildFuzzy writes (meta lands after
    // data): a crash between the two must read as "incomplete, rebuild",
    // never as a complete index whose fuzzyMeta read fails forever
    buildOnce(dir, "documents", "fuzidx-d2-nb16", marker = "meta/_SUCCESS") { d =>
      graft.ext.TextIndex.buildFuzzy(t(s, dir, "documents"),
        "text", d, nBuckets = 16, depth = 2)
    }

  /** Build every persisted index up front (the Bench warm-up path):
    * in production an index is built once and probed many times, so
    * the bench reports builds as a separate `build_seconds` map
    * instead of charging them to whichever probe runs first. Returns
    * (index, seconds) — ~0 when the cache was already warm. */
  def prebuildIndexes(s: SparkSession, dir: String): Seq[(String, Double)] = {
    def timed(name: String)(f: => Any): (String, Double) = {
      val t0 = System.nanoTime()
      f
      name -> (System.nanoTime() - t0) / 1e9
    }
    Seq(
      timed("annidx")(annIndexDir(s, dir)),
      timed("pqidx")(pqIndexDir(s, dir)),
      timed("ivfpqidx")(ivfPqIndexDir(s, dir)),
      timed("textidx")(textIndexDir(s, dir)),
      timed("trgidx")(trigramIndexDir(s, dir)),
      timed("posidx")(positionalIndexDir(s, dir)),
      timed("fuzidx")(fuzzyIndexDir(s, dir)),
      timed("ccidx")(TextSim.ccComponentsDir(s, dir)),
      timed("ccinc")(TextSim.ccIncrementalDir(s, dir)),
      timed("hllsk")(hllSketchDir(s, dir)),
      timed("hllgsk")(hllGroupSketchDir(s, dir)),
      timed("histsk")(histSketchDir(s, dir)),
      timed("histingest")(histIngestDir(s, dir)),
      timed("quantingest")(quantIngestDir(s, dir)),
      timed("histgsk")(histGroupSketchDir(s, dir)),
      timed("freqsk")(freqSketchDir(s, dir)),
      timed("freqgsk")(freqGroupSketchDir(s, dir)),
      timed("quantsk")(quantSketchDir(s, dir)),
      timed("quantgsk")(quantGroupSketchDir(s, dir)),
      timed("kmvgsk")(kmvGroupStoreDir(s, dir)),
      timed("kmvingest")(kmvIngestStoreDir(s, dir)),
      timed("pairsk")(pairStoreDir(s, dir)),
      timed("mediafeats")(mediaFeatsDir(s, dir)),
      timed("audiofeats")(audioFeatsDir(s, dir)),
      timed("videofeats")(videoFeatsDir(s, dir)),
      timed("coedges")(Graph.coEdgesDir(s, dir)))
  }

  /** X1 — product-quantized top-k (third ANN family; `ext.Pq`): the
    * corpus is PQ-encoded ONCE into a persisted flat index (16
    * subspaces × 32 codewords over 64 dims — codes are ~16 bytes/row
    * vs 256 for the raw floats), candidates come from the ADC pass
    * (m lookup-table hits/row, reads only id+code+norm columns), and
    * the exact-cosine re-rank of the top-400 recovers the TRUE
    * top-10+ties (measured worst ADC rank of an exact-top-12 member
    * under the sample-trained codebooks: 54 at sf0.01, 91 of 2000 at
    * sf0.1 — 4× margin), so the oracle is
    * brute-force cosine in DuckDB. The final cut follows the
    * x1_ann_topk pattern: take top-50 exact with margin, then ORDER BY
    * the ROUNDED score + id and LIMIT 10 — both engines cut the same
    * boundary even when 6-dp ties straddle rank 10. PqSpec covers the
    * approximation contract itself (recall, NULL norms, IVF-PQ
    * pruning). */
  def x1_pq_topk(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val idxDir = pqIndexDir(s, dir)
    val cb = graft.ext.Pq.loadCodebooks(s, s"$idxDir/codebooks")
    val stored = graft.ext.Pq.readPersistedFlat(s, idxDir, emb.schema)
    val qv = emb.filter(col("vec_id") === 0L).select(col("embedding"))
      .head.getSeq[Float](0).map(_.toDouble)
    graft.ext.Pq.topK(stored, "embedding", "vec_id", cb, qv,
      k = 50, refine = 400)
      .select(col("vec_id"), col("label"), round(col("score"), 6).as("score"))
      .orderBy(desc("score"), asc("vec_id"))
      .limit(10)
  }

  /** X1 — the flagship IVF-PQ composition ([[graft.ext.IvfPq]]):
    * coarse IVF lists as `ivf_list=` partition directories, probe
    * pruned to the `nProbe` lists nearest the query (PartitionFilters
    * — plan-asserted in PqSpec), ADC ranking over id+code+norm inside
    * the probed lists only, exact-cosine re-rank of ≤`refine` rows.
    * nProbe follows the house measured-margin discipline — and here
    * the measurement DICTATES no pruning: the synthetic embeddings
    * are near-uniform (balanced ~n/8 lists; the exact top-12's lists
    * span probe ranks up to 8 of 8 at both sf0.01 and sf0.1), so
    * any nProbe < nLists would drop true neighbors. nProbe = 8 keeps
    * the oracle sound on THIS corpus; the partition-prune mechanics
    * (`ivf_list IN` → PartitionFilters, ≤3/8 directories scanned) are
    * plan-asserted in PqSpec on CLUSTERED data where pruning is
    * actually safe. refine = 400 carries the same 4× ADC-rank margin
    * as [[x1_pq_topk]]. The oracle is therefore plain brute-force
    * cosine — the index changes scan bytes, never the answer. */
  def x1_ivfpq_topk(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val idxDir = ivfPqIndexDir(s, dir)
    val qv = emb.filter(col("vec_id") === 0L).select(col("embedding"))
      .head.getSeq[Float](0).map(_.toDouble)
    graft.ext.IvfPq.persistedTopK(s, idxDir, emb.schema, "embedding",
        "vec_id", qv, k = 50, nProbe = 8, refine = 400)
      .select(col("vec_id"), col("label"), round(col("score"), 6).as("score"))
      .orderBy(desc("score"), asc("vec_id"))
      .limit(10)
  }

  /** P6 at scale — multi-term AND search served from the persisted
    * inverted index (`ext.TextIndex`): probe prunes to the terms'
    * bucket directories (plan-asserted in TextIndexSpec), postings
    * intersect on doc_id, texts are never read. The oracle computes
    * the same answer by word-membership scan — the index changes the
    * access path, never the result. */
  def p6b_indexed_search(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val idxDir = textIndexDir(s, dir)
    graft.ext.TextIndex.searchAll(s, idxDir, "doc_id",
        Seq("spark", "table", "vector"))
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
      .orderBy("doc_id")
  }

  /** P6 substring form at scale — LIKE '%pattern%' served by the
    * TRIGRAM index (pg_trgm recipe): the pattern's char-3-grams
    * intersect in postings space (sound candidate superset,
    * partition-pruned probe), then candidates alone are verified with
    * exact `contains` — corpus texts are read only for candidate
    * rows. Oracle = the plain contains scan. */
  def p6c_substring_search(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val idxDir = trigramIndexDir(s, dir)
    graft.ext.TextIndex.substringSearch(s, idxDir, docs,
        "doc_id", "text", "fast merge")
      .select("doc_id", "lang")
      .orderBy("doc_id")
  }

  /** P6 phrase form at scale — exact token-adjacent phrase match
    * served ENTIRELY from the positional index: each term's postings
    * anchor to (pos − phrase offset), one shuffle on (id, anchor)
    * collects the offsets, and a document matches where an anchor has
    * them all — no text is read at any stage (the trigram path still
    * verifies candidates against the text; the positional path does
    * not even do that). Oracle = adjacent-word-pair scan. */
  def p6d_phrase_search(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val idxDir = positionalIndexDir(s, dir)
    graft.ext.TextIndex.phraseSearch(s, idxDir, "doc_id", "fast merge")
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
      .orderBy("doc_id")
  }

  /** P6 RANKED retrieval at scale — Okapi BM25 top-10 for a 3-term
    * query, served entirely from the positional index + its doc-stats
    * sidecar ([[graft.ext.TextIndex.bm25Search]]): tf from the
    * partition-pruned postings probe, df broadcast from the same
    * probe, length normalization from the sidecar — the corpus text
    * is never read. The DuckDB oracle recomputes the full formula
    * from raw text; both engines order by the 6-decimal rounded score
    * (ULP divergence in ln/÷ sits far below the rounding quantum). */
  def p6f_bm25_rank(s: SparkSession, dir: String): DataFrame = {
    val idxDir = positionalIndexDir(s, dir)
    graft.ext.TextIndex.bm25Search(s, idxDir, "doc_id",
      Seq("spark", "table", "vector"), k = 10)
  }

  /** The pure-SQL-text twin of `p6f_bm25_rank` through the
    * `graft_bm25` table function
    * ([[graft.functions.GraftTableFunctions]]): `spark.sql` reaches
    * the persisted postings index with no Scala entry point — the TVF
    * builder returns the SAME plan bm25Search builds, so this shares
    * p6f's oracle verbatim. */
  def p6j_bm25_sql(s: SparkSession, dir: String): DataFrame = {
    val idxDir = positionalIndexDir(s, dir)
    s.sql(s"SELECT * FROM graft_bm25('$idxDir', 'spark table vector', 10)")
  }

  /** P6 proximity form at scale — unordered NEAR/2 search ("slow"
    * within two word positions of "query") served entirely from the
    * positional index: positions quantize into slop-wide windows and
    * the terms equi-join on (doc, window ± 1) — never a per-document
    * position cross-product, never a text read
    * ([[graft.ext.TextIndex.proximitySearch]]). Oracle = the
    * position-list scan over extracted words. */
  def p6e_proximity_search(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val idxDir = positionalIndexDir(s, dir)
    graft.ext.TextIndex.proximitySearch(s, idxDir, "doc_id",
        "slow", "query", slop = 2)
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
      .orderBy("doc_id")
  }

  /** P6 FUZZY form at scale — edit-distance term search ("part" ± 2
    * edits) served by the SymSpell deletion-neighborhood index
    * ([[graft.ext.TextIndex.buildFuzzy]]): the query's own ≤ 2-deletion
    * variants equi-look-up candidate vocabulary terms (partition-pruned
    * probe — never a vocabulary scan, never a similarity join), an
    * exact `levenshtein` verify makes the expansion exact, and the
    * matched terms' documents come from the word index's postings.
    * Oracle = the full word-explode scan with DuckDB's own
    * levenshtein — the index changes the access path, never the
    * answer. */
  def p6g_fuzzy_search(s: SparkSession, dir: String): DataFrame = {
    val fDir = fuzzyIndexDir(s, dir)
    val wDir = textIndexDir(s, dir)
    graft.ext.TextIndex.fuzzySearch(s, fDir, wDir, "doc_id",
        "part", maxEdit = 2)
      .groupBy("term", "dist")
      .agg(countDistinct("doc_id").as("n_docs"))
      .orderBy("term")
  }

  /** HYBRID RETRIEVAL via Reciprocal Rank Fusion (the RAG-stack
    * default for combining lexical and semantic search): BM25 top-50
    * (served from the positional index — text never read) and exact
    * cosine top-50 fuse as Σ 1/(60 + rank), the published RRF
    * constant. Rank lists are 50-row bounded, so their row_number
    * windows are control-plane folds; each fused score is TWO IEEE
    * divides + one add (commutative — order-proof without decimal),
    * and the cut orders by the 6-dp rounded fusion + id. Documents
    * found by only one modality keep their single term (full outer
    * join) — that asymmetry is RRF's point. */
  def p6i_hybrid_rrf(s: SparkSession, dir: String): DataFrame = {
    val posDir = positionalIndexDir(s, dir)
    val bm = graft.ext.TextIndex.bm25Search(s, posDir, "doc_id",
        Seq("spark", "table", "vector"), k = 50)
      .withColumn("rb", row_number().over(
        Window.orderBy(desc("score"), asc("doc_id"))).cast(LongType))
      .select("doc_id", "rb")
    val emb = t(s, dir, "embeddings")
      .withColumn("e", col("embedding").cast("array<double>"))
    val q = emb.filter(col("vec_id") === 0).select(col("e").as("qe"))
    val vec = emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .withColumn("vscore", round(
        expr("aggregate(zip_with(e, qe, (x, y) -> x * y), 0D, (acc, v) -> acc + v)")
          / (sqrt(expr("aggregate(e, 0D, (acc, x) -> acc + x * x)"))
            * sqrt(expr("aggregate(qe, 0D, (acc, x) -> acc + x * x)"))), 6))
      .orderBy(desc("vscore"), asc("vec_id")).limit(50)
      .withColumn("rv", row_number().over(
        Window.orderBy(desc("vscore"), asc("vec_id"))).cast(LongType))
      .select(col("vec_id").as("doc_id"), col("rv"))
    bm.join(vec, Seq("doc_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (col("rb").cast(DoubleType) + lit(60.0)), lit(0.0))
          + coalesce(lit(1.0) / (col("rv").cast(DoubleType) + lit(60.0)),
            lit(0.0)), 6))
      .select("doc_id", "rb", "rv", "rrf")
      .orderBy(desc("rrf"), asc("doc_id")).limit(10)
  }

  /** VECTOR QUALITY audit — the embedding-column pre-flight every ANN
    * build should gate on (corrupt vectors break similarity search
    * SILENTLY: a zero-norm row cosines to NULL, a short vector skews
    * any fixed-dim kernel): one pass counting nulls, zero-norm rows,
    * rows off the dominant dimensionality, plus the dim extrema. All
    * integer counts; the dominant dim is an exact mode computed from
    * the bounded dim histogram. */
  def x1_vector_quality(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"),
        size(col("embedding")).as("dim"),
        expr("aggregate(embedding, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")
          .as("sq"))
    val modeDim = e.filter(col("embedding").isNotNull)
      .groupBy("dim").agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), asc("dim")).limit(1)
      .select("dim").head.getInt(0)
    e.agg(
      count(lit(1)).as("n_rows"),
      count(when(col("embedding").isNull, 1)).as("n_null"),
      count(when(col("embedding").isNotNull && col("sq") === 0.0, 1))
        .as("n_zero_norm"),
      count(when(col("embedding").isNotNull && col("dim") =!= modeDim, 1))
        .as("n_off_dim"),
      min(when(col("embedding").isNotNull, col("dim"))).as("min_dim"),
      max(when(col("embedding").isNotNull, col("dim"))).as("max_dim"))
      .withColumn("mode_dim", lit(modeDim))
  }

  /** LABEL-DISTRIBUTION DRIFT via PSI (population stability index —
    * the ML-ops "did my training mix shift?" gate): the label shares
    * of two dataset halves compared per label, psi_term =
    * (p_a − p_b)·ln(p_a/p_b) (Σ > 0.2 = actionable drift by the
    * published rule of thumb). Counts are integers, shares one divide
    * against a window total over the label × half grid (bounded —
    * never corpus rows), and the ln sits ~11 orders below the 6-dp
    * rounding quantum (the BM25 cross-engine discipline). */
  def x_label_psi(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "embeddings")
      .select(col("label"), (col("vec_id") % 2).as("half"))
      .groupBy("label", "half").agg(count(lit(1)).as("n"))
    val share = c.withColumn("share",
      col("n").cast(DoubleType) /
        sum("n").over(Window.partitionBy("half")).cast(DoubleType))
    val a = share.filter(col("half") === 0)
      .select(col("label"), col("share").as("sa"))
    val b = share.filter(col("half") === 1)
      .select(col("label"), col("share").as("sb"))
    a.join(b, Seq("label"))
      .select(col("label"), round(col("sa"), 6).as("share_a"),
        round(col("sb"), 6).as("share_b"),
        round((col("sa") - col("sb")) * log(col("sa") / col("sb")), 6)
          .as("psi_term"))
      .orderBy("label")
  }

  /** "Did you mean" ranked spell suggestion on top of the fuzzy index:
    * for each misspelled input, expand to vocabulary candidates
    * (partition-pruned SymSpell probe), score each candidate by its
    * document frequency from the word index's postings, and pick the
    * best by (edit distance, then df desc, then term) — the published
    * spell-correction ranking (closest first, most common among
    * ties). Three probes touch a handful of bucket directories; the
    * corpus text is never read. */
  def p6h_did_you_mean(s: SparkSession, dir: String): DataFrame = {
    val fDir = fuzzyIndexDir(s, dir)
    val wDir = textIndexDir(s, dir)
    val best = Window.partitionBy("input")
      .orderBy(asc("dist"), desc("n_docs"), asc("term"))
    graft.ext.TextIndex.fuzzySearchAll(s, fDir, wDir, "doc_id",
        Seq("vektor", "tabel", "qurey"), maxEdit = 2)
      .groupBy("input", "term", "dist")
      .agg(countDistinct("doc_id").as("n_docs"))
      .withColumn("_rk", row_number().over(best))
      .filter(col("_rk") === 1)
      .select(col("input"), col("term").as("suggestion"),
        col("dist"), col("n_docs"))
      .orderBy("input")
  }

  /** Segment OVERLAP via KMV/theta sketches ([[graft.ext.KmvSketch]]):
    * distinct high-value purchasers vs high-value clickers, their
    * intersection and union — the audience-overlap ask HLL cannot
    * answer (HLL only unions). Each segment is sketched in one
    * partial-distinct + TakeOrdered(k) pass; set algebra happens on
    * ≤ k driver-held hashes (control plane). The tracked cardinalities
    * (≤ 1500 users) sit far inside k = 4096, so every sketch is in its
    * exact regime — asserted, and the differential oracle against
    * DuckDB's INTERSECT/UNION of exact DISTINCT sets is sound (the
    * same sparse-exact argument as `x_hll_distinct`). */
  def x_kmv_segments(s: SparkSession, dir: String): DataFrame = {
    import graft.ext.KmvSketch
    val ev = t(s, dir, "events")
    def seg(tpe: String) = ev
      .filter(col("event_type") === tpe && col("value") >= 95.0)
      .select("user_id")
    val a = KmvSketch.sketch(seg("purchase"), "user_id", k = 4096)
    val b = KmvSketch.sketch(seg("click"), "user_id", k = 4096)
    // the MERGED sketch must be exact too: two exact sketches whose
    // union tops k would make the 'either' row an estimate while the
    // inputs still pass an inputs-only check
    val u = a.merge(b)
    require(a.isExact && b.isExact && u.isExact,
      "KMV sketches left the exact regime; the oracle would be unsound")
    val rows = Seq(
      ("both", a.intersectEstimate(b).toLong),
      ("click_hi", b.estimate.toLong),
      ("either", u.estimate.toLong),
      ("purchase_hi", a.estimate.toLong))
    import s.implicits._
    rows.toDF("segment", "n_users").orderBy("segment")
  }

  /** Batch-appended grouped KMV store over the high-value event
    * segments: 4 ingest batches (users sharded by pmod), one k-min
    * sketch per (batch, event_type). */
  private def kmvGroupStoreDir(s: SparkSession, dir: String): String =
    buildOnce(dir, "events", "kmvgsk", marker = "_DONE") { d =>
      wipeDir(d)
      val ev = t(s, dir, "events").filter(col("value") >= 95.0)
        .select(col("event_type"), col("user_id"))
      (0L to 3L).foreach { b =>
        graft.ext.KmvSketch.addBatchGrouped(
          ev.filter(pmod(col("user_id"), lit(4)) === b),
          "event_type", "user_id", d, batchId = b, k = 4096)
      }
      markDone(d)
    }

  /** Batch-appended co-occurrence pair store over purchase events: 4
    * USER-SHARDED ingest batches (a user's whole history in one batch
    * — the distinct-count mergeability contract), capped per-user
    * fan-out, pair/item/user partials persisted per batch. */
  private def pairStoreDir(s: SparkSession, dir: String): String =
    buildOnce(dir, "events", "pairsk", marker = "_DONE") { d =>
      wipeDir(d)
      val p = t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"),
          get_json_object(col("props"), "$.k").cast(IntegerType).as("item"))
        .filter(col("item").isNotNull)
      (0L to 3L).foreach { b =>
        graft.ext.PairStore.addBatch(
          p.filter(pmod(col("user_id"), lit(4)) === b),
          "user_id", "item", d, batchId = b, shard = "pmod(user_id,4)")
      }
      markDone(d)
    }

  /** The ingest-store twin of `ev_item_cooccurrence`
    * ([[graft.ext.PairStore]]): the same co-visitation matrix served
    * ENTIRELY from the persisted 4-batch pair store — the fold reads
    * ∝ batches × catalog² pair rows, the event corpus is never
    * touched. User-sharded batches make the distinct-user partials
    * sum exactly (checked by the fold), so this must equal the batch
    * query row for row and shares its oracle. */
  def ev_cooccurrence_store(s: SparkSession, dir: String): DataFrame =
    graft.ext.PairStore.cooccurrenceFromStore(s, pairStoreDir(s, dir))

  /** PAIRWISE segment-overlap matrix from the persisted grouped KMV
    * store ([[graft.ext.KmvSketch.overlapMatrix]]) — the N-segment
    * generalization of `x_kmv_segments`' fixed pair: every unordered
    * pair of high-value event segments with common / per-side
    * distinct-user counts and Jaccard, zero-overlap pairs included.
    * Served ENTIRELY from the store (segments × ≤ k longs per batch);
    * the event corpus is never re-read. Every merged sketch sits far
    * inside k = 4096 at every SF (≤ ~1310 distinct users per segment
    * at sf0.1) — the `exact` guard makes the sparse-exact argument a
    * runtime check, so the differential oracle against DuckDB's exact
    * pairwise intersections is sound. */
  def x_kmv_overlap_matrix(s: SparkSession, dir: String): DataFrame = {
    val d = kmvGroupStoreDir(s, dir)
    // requireExact gates on the checkpointed merge (one tiny
    // aggregate) instead of re-running the finished grid plan
    graft.ext.KmvSketch.overlapMatrix(s, d, requireExact = true)
      .drop("exact")
  }

  private def kmvIngestStoreDir(s: SparkSession, dir: String): String =
    buildOnce(dir, "documents", "kmvingest", marker = "_DONE") { d =>
      wipeDir(d)
      val docs = t(s, dir, "documents").select(col("lang"), col("source"))
      (0L to 3L).foreach { b =>
        graft.ext.KmvSketch.addBatchGroupedKeyed(
          docs.filter(pmod(xxhash64(col("source")), lit(4)) === b),
          "lang", "source", d, batchKey = s"run-$b", k = 4096)
      }
      markDone(d)
    }

  /** The INGEST-path twin of `x_kmv_overlap_matrix` on a second corpus
    * — the wiring [[graft.jobs.ScanJob]] runs per ingest batch
    * ([[graft.ext.KmvSketch.addBatchGroupedKeyed]], run-id-keyed for
    * replay idempotence): per-LANGUAGE source sketches appended over 4
    * batches, then the pairwise "which languages share sources?" grid
    * served entirely from the store. Source cardinalities (≤ 20 per
    * language) sit far inside k, so the runtime exactness gate holds
    * and the differential oracle against DuckDB's exact pairwise
    * intersections is sound. */
  def x_kmv_overlap_ingest(s: SparkSession, dir: String): DataFrame = {
    val d = kmvIngestStoreDir(s, dir)
    graft.ext.KmvSketch.overlapMatrix(s, d, requireExact = true)
      .drop("exact")
  }

  /** The ingest-store twin of `x_heavy_hitters`: the same >1/800
    * frequent-bigram ask served ENTIRELY from the persisted 4-batch
    * Misra–Gries store ([[graft.ext.FreqSketch]]) — the fold reads
    * ∝ batches × capacity summary rows, the corpus is never touched.
    * The store's meta rows prove no batch ever trimmed (916 bigrams
    * inside capacity 4096, checked by `frequentFromStore`), so the
    * stored counts are exact and the differential oracle — the SAME
    * naive GROUP BY + HAVING the corpus-pass twin uses — is sound.
    * Result must equal `x_heavy_hitters` row for row. */
  def x_freq_store_top(s: SparkSession, dir: String): DataFrame = {
    val skDir = freqSketchDir(s, dir)
    graft.ext.FreqSketch.frequentFromStore(s, skDir, num = 1L, den = 800L)
      .select(col("item").as("bigram"), col("cnt").as("n"))
  }

  /** The grouped-store twin of `x_heavy_hitters_grouped`: per-language
    * >1/800 frequent bigrams served entirely from the persisted
    * 4-batch grouped Misra–Gries store
    * ([[graft.ext.FreqSketch.frequentFromStoreGrouped]]) — per-group
    * meta rows prove no (batch, language) ever trimmed, so the stored
    * counts are exact and both twins share one differential oracle.
    * Must equal `x_heavy_hitters_grouped` row for row. */
  def x_freq_store_group_top(s: SparkSession, dir: String): DataFrame = {
    val skDir = freqGroupSketchDir(s, dir)
    graft.ext.FreqSketch.frequentFromStoreGrouped(s, skDir,
        num = 1L, den = 800L)
      .select(col("grp").as("lang"), col("item").as("bigram"),
        col("cnt").as("n"))
      .orderBy(asc("lang"), desc("n"), asc("bigram"))
  }

  /** Rank quantiles served ENTIRELY from the persisted 4-batch
    * quantile-summary store ([[graft.ext.QuantileSketch]]) — the
    * ingest-path answer to "what is the p50/p90 so far?": the fold
    * reads ∝ batches × capacity summary rows, the corpus is never
    * touched. l_quantity's 50 distinct values sit inside capacity 256,
    * so every batch summary is the exact weighted census (the meta
    * rows prove it — the probe `require`s the exact regime) and the
    * differential oracle — the same smallest-value-reaching-
    * ceil(q·n) rank definition in window SQL — is sound. Both
    * engines evaluate the identical IEEE `ceil(q * n)`, the BM25
    * cross-engine determinism discipline. */
  def x_quant_store_quantiles(s: SparkSession, dir: String): DataFrame = {
    val skDir = quantSketchDir(s, dir)
    val (exact, _) = graft.ext.QuantileSketch.exactness(s, skDir)
    require(exact, "quantile store trimmed; the oracle needs the exact regime")
    graft.ext.QuantileSketch.quantiles(s, skDir,
      Seq(0.25, 0.5, 0.75, 0.9))
  }

  /** The INVERSE probe on the same store — CDF at given quantities
    * ("what share of lineitems ship 25 units or fewer?"): cumulative
    * weight over the folded summary, exact in the exact regime. With
    * [[x_quant_store_quantiles]] this closes the loop: the store
    * answers value→percentile and percentile→value from one
    * artifact. */
  def x_quant_store_cdf(s: SparkSession, dir: String): DataFrame = {
    val skDir = quantSketchDir(s, dir)
    val (exact, _) = graft.ext.QuantileSketch.exactness(s, skDir)
    require(exact, "quantile store trimmed; the oracle needs the exact regime")
    graft.ext.QuantileSketch.cdfAt(s, skDir, Seq(5.0, 25.0, 45.0))
  }

  /** Per-group store twin: p50/p90 of l_quantity per return flag from
    * the grouped quantile store — per-group meta rows prove every
    * (batch, flag) summary stayed exact, so the grouped window-SQL
    * oracle is sound. */
  def x_quant_store_group_quantiles(s: SparkSession, dir: String): DataFrame = {
    val skDir = quantGroupSketchDir(s, dir)
    val (exact, _) = graft.ext.QuantileSketch.exactness(s, skDir)
    require(exact, "quantile store trimmed; the oracle needs the exact regime")
    graft.ext.QuantileSketch.quantilesGrouped(s, skDir, Seq(0.5, 0.9))
  }

  /** Static sidecar path for the image-feature dump — the DuckDB
    * oracle reads the decoded features from here, so the path must be
    * a compile-time literal in the oracle text (java.io.tmpdir is
    * stable within the verify run that writes and then checks it). */
  private val mediaFeatsSidecar: String =
    new java.io.File(sys.props("java.io.tmpdir"), "graft-media-feats")
      .toString

  /** M1 — IMAGE near-duplicate pairs through the REAL codec: 120
    * synthetic PNGs (deterministic pixels; groups of 3 consecutive
    * doc_ids share a base pattern with ~1% per-variant pixel noise —
    * in-group cosine ≈ 0.99+, cross-group ≈ 0) are decoded with
    * `javax.imageio` ([[graft.ext.ImageCodec]]), yielding real
    * dimensions + centered gray-grid features, and the features ride
    * the SAME hyperplane-LSH cosine path as the embedding X2 family —
    * media near-dup costs no media-specific dedup code.
    *
    * Differential contract: the decoded features are dumped to a
    * parquet sidecar; DuckDB recomputes the hyperplane buckets AND
    * the in-bucket cosine scores from the sidecar floats (the same
    * independent bucket arithmetic as `x2_cosine_neardup`'s oracle),
    * so the oracle checks pair enumeration, bucketing, scoring, and
    * thresholding. The decode itself (dims, aHash/dHash, grid values)
    * is pinned by ImageCodecSpec against generated ground truth. */
  /** Build the image-feature sidecar once (parquet's _SUCCESS is the
    * marker): the synthetic corpus depends only on code (doc_ids
    * 0..119 exist at every SF), so probes skip the render+decode and
    * measure the NEAR-DUP QUERY — the build bills to warm-up like
    * every other persisted artifact. */
  private[queries] def mediaFeatsDir(s: SparkSession, dir: String): String = {
    import s.implicits._
    if (!new java.io.File(mediaFeatsSidecar, "_SUCCESS").exists()) {
      val ids = t(s, dir, "documents").filter(col("doc_id") < 120)
        .select(col("doc_id")).as[Long]
      val media = ids.map { d =>
        val grp = d / 3
        val w = 32 + (grp % 4).toInt * 8 // real varying dims, group-stable
        graft.ext.Multimodal.MediaRow(f"img_$d%04d", "image", "image/png",
          graft.ext.ImageCodec.syntheticPng(grp, w, 32,
            variant = d % 3, noiseDen = 96),
          None, None, None, None)
      }
      // one decode pass; the sidecar then feeds BOTH engines, so the
      // cosine compare runs over bit-identical float inputs
      graft.ext.ImageCodec.extractImageFeatures(s, media.toDF())
        .select("media_id", "width", "height", "ahash", "dhash", "features")
        .coalesce(1)
        .write.mode("overwrite").parquet(mediaFeatsSidecar)
    }
    mediaFeatsSidecar
  }

  def m1_image_neardup(s: SparkSession, dir: String): DataFrame = {
    val stored = graft.ext.StoreRead.parquet(s, mediaFeatsDir(s, dir))
    Similarity.cosineNearDupPairs(stored, "features", "media_id",
        threshold = 0.8, nBits = 4)
      .select(col("id_a"), col("id_b"), round(col("score"), 6).as("score"))
      .orderBy("id_a", "id_b")
  }

  private val audioFeatsSidecar: String =
    new java.io.File(sys.props("java.io.tmpdir"), "graft-audio-feats")
      .toString

  /** Audio twin of [[mediaFeatsDir]]: 90 deterministic synthetic WAV
    * clips (groups of 3 share an amplitude envelope; ~1% per-variant
    * sample re-rolls) decoded ONCE through `javax.sound.sampled`
    * ([[graft.ext.AudioCodec]]) into real format metadata + centered
    * RMS-envelope features. */
  private[queries] def audioFeatsDir(s: SparkSession, dir: String): String = {
    import s.implicits._
    if (!new java.io.File(audioFeatsSidecar, "_SUCCESS").exists()) {
      val ids = t(s, dir, "documents").filter(col("doc_id") < 90)
        .select(col("doc_id")).as[Long]
      val media = ids.map { d =>
        val grp = d / 3
        val rate = 8000 + (grp % 3).toInt * 2000 // real varying rates
        graft.ext.Multimodal.MediaRow(f"clip_$d%04d", "audio", "audio/wav",
          graft.ext.AudioCodec.syntheticWav(grp, rate, nSamples = 4000,
            variant = d % 3, noiseDen = 96),
          None, None, None, None)
      }
      graft.ext.AudioCodec.extractAudioFeatures(s, media.toDF())
        .select("media_id", "sample_rate", "channels", "duration_ms",
          "features")
        .coalesce(1)
        .write.mode("overwrite").parquet(audioFeatsSidecar)
    }
    audioFeatsSidecar
  }

  /** M2 — AUDIO near-duplicate pairs through the REAL codec: the
    * audio member of the m1 family — decoded WAV envelopes ride the
    * same hyperplane-LSH cosine path, DuckDB recomputes buckets and
    * scores from the feature sidecar, AudioCodecSpec pins the decode
    * against generated ground truth. */
  def m2_audio_neardup(s: SparkSession, dir: String): DataFrame = {
    val stored = graft.ext.StoreRead.parquet(s, audioFeatsDir(s, dir))
    Similarity.cosineNearDupPairs(stored, "features", "media_id",
        threshold = 0.8, nBits = 4)
      .select(col("id_a"), col("id_b"), round(col("score"), 6).as("score"))
      .orderBy("id_a", "id_b")
  }

  private val videoFeatsSidecar: String =
    new java.io.File(sys.props("java.io.tmpdir"), "graft-video-feats")
      .toString

  /** Video member of the [[mediaFeatsDir]] family: 60 deterministic
    * synthetic animated GIFs (6 frames each; groups of 3 share a seed,
    * ~1% per-variant pixel re-rolls) decoded ONCE through the JDK's
    * multi-frame GIF codec ([[graft.ext.VideoCodec]]) into real frame
    * counts + sampled-frame mean features (every 2nd frame). */
  private[queries] def videoFeatsDir(s: SparkSession, dir: String): String = {
    import s.implicits._
    if (!new java.io.File(videoFeatsSidecar, "_SUCCESS").exists()) {
      val ids = t(s, dir, "documents").filter(col("doc_id") < 60)
        .select(col("doc_id")).as[Long]
      val media = ids.map { d =>
        val grp = d / 3
        val w = 32 + (grp % 3).toInt * 8 // real varying dims, group-stable
        graft.ext.Multimodal.MediaRow(f"vid_$d%04d", "video", "image/gif",
          graft.ext.VideoCodec.syntheticGif(grp, w, 24, nFrames = 6,
            variant = d % 3, noiseDen = 96),
          None, None, None, None)
      }
      graft.ext.VideoCodec.extractVideoFeatures(s, media.toDF(), everyK = 2)
        .select("media_id", "n_frames", "n_sampled", "width", "height",
          "features")
        .coalesce(1)
        .write.mode("overwrite").parquet(videoFeatsSidecar)
    }
    videoFeatsSidecar
  }

  /** M3 — VIDEO near-duplicate pairs through the REAL multi-frame
    * codec: clip features are the mean of every-2nd-frame centered
    * gray-grids ([[graft.ext.VideoCodec]] — frame decode, sampling
    * grid, and per-frame feature parity all pinned by VideoCodecSpec),
    * and ride the SAME hyperplane-LSH cosine path as images, audio,
    * and text embeddings; DuckDB recomputes buckets and scores from
    * the feature sidecar. */
  def m3_video_neardup(s: SparkSession, dir: String): DataFrame = {
    val stored = graft.ext.StoreRead.parquet(s, videoFeatsDir(s, dir))
    Similarity.cosineNearDupPairs(stored, "features", "media_id",
        threshold = 0.8, nBits = 4)
      .select(col("id_a"), col("id_b"), round(col("score"), 6).as("score"))
      .orderBy("id_a", "id_b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_image_neardup" -> (m1_image_neardup _),
    "m2_audio_neardup" -> (m2_audio_neardup _),
    "m3_video_neardup" -> (m3_video_neardup _),
    "x_freq_store_top" -> (x_freq_store_top _),
    "x_quant_store_quantiles" -> (x_quant_store_quantiles _),
    "x_quant_store_cdf" -> (x_quant_store_cdf _),
    "x_quant_store_group_quantiles" -> (x_quant_store_group_quantiles _),
    "x_freq_store_group_top" -> (x_freq_store_group_top _),
    "x_kmv_segments" -> (x_kmv_segments _),
    "x_kmv_overlap_matrix" -> (x_kmv_overlap_matrix _),
    "x_kmv_overlap_ingest" -> (x_kmv_overlap_ingest _),
    "ev_cooccurrence_store" -> (ev_cooccurrence_store _),
    "p6e_proximity_search" -> (p6e_proximity_search _),
    "x2_simhash_pairs" -> (x2_simhash_pairs _),
    "x1_lsh_buckets" -> (x1_lsh_buckets _),
    "x1_ann_topk" -> (x1_ann_topk _),
    "x1_ann_index_topk" -> (x1_ann_index_topk _),
    "x1_knn_index_label" -> (x1_knn_index_label _),
    "x1_knn_batch_index" -> (x1_knn_batch_index _),
    "x1_pq_topk" -> (x1_pq_topk _),
    "x1_ivfpq_topk" -> (x1_ivfpq_topk _),
    "p6b_indexed_search" -> (p6b_indexed_search _),
    "p6g_fuzzy_search" -> (p6g_fuzzy_search _),
    "p6h_did_you_mean" -> (p6h_did_you_mean _),
    "x_label_psi" -> (x_label_psi _),
    "x1_vector_quality" -> (x1_vector_quality _),
    "p6i_hybrid_rrf" -> (p6i_hybrid_rrf _),
    "p6c_substring_search" -> (p6c_substring_search _),
    "p6d_phrase_search" -> (p6d_phrase_search _),
    "p6f_bm25_rank" -> (p6f_bm25_rank _),
    "p6j_bm25_sql" -> (p6j_bm25_sql _),
    "x2_cosine_neardup" -> (x2_cosine_neardup _),
    "x1_label_outliers" -> (x1_label_outliers _),
    "x_hll_distinct" -> (x_hll_distinct _),
    "x_hll_group_distinct" -> (x_hll_group_distinct _),
    "x_hist_quantiles" -> (x_hist_quantiles _),
    "x_hist_quantiles_ingest" -> (x_hist_quantiles_ingest _),
    "x_quant_quantiles_ingest" -> (x_quant_quantiles_ingest _),
    "x_hist_group_quantiles" -> (x_hist_group_quantiles _))

  /** DuckDB equivalents. SimHash / hyperplane math is hex-char
    * arithmetic with integer sums — value-identical across engines. */
  private val simhashCte =
    """WITH d AS (
      | SELECT doc_id, list_distinct(regexp_extract_all(lower(text), '[a-z]+')) AS ws
      | FROM documents WHERE doc_id < 80),
      |s AS (
      | SELECT doc_id, CAST(list_sum(list_transform(range(0, 16), b ->
      |   CASE WHEN list_sum(list_transform(ws, w ->
      |     2 * ((strpos('0123456789abcdef',
      |         substr(md5(w), 1 + CAST(b // 4 AS INT), 1)) - 1
      |       >> (3 - b % 4)) & 1) - 1)) > 0
      |   THEN CAST(1 AS BIGINT) << b ELSE 0 END)) AS BIGINT) AS sh
      | FROM d)""".stripMargin

  private val bucketSql: String = {
    val hp = "(CAST(list_sum(list_transform(range(0, 4), p -> " +
      "(strpos('0123456789abcdef', substr(md5('hp:' || CAST(j AS VARCHAR) " +
      "|| ':' || CAST(i AS VARCHAR)), 1 + CAST(p AS INT), 1)) - 1) " +
      "* (CAST(1 AS BIGINT) << (4 * CAST(3 - p AS INT))))) AS DOUBLE) " +
      "/ 32768.0 - 1.0)"
    s"CAST(list_sum(list_transform(range(0, %NBITS%), j -> " +
      s"CASE WHEN list_sum(list_transform(range(0, len(e)), i -> " +
      s"e[CAST(i AS INT) + 1] * $hp)) > 0 " +
      s"THEN CAST(1 AS BIGINT) << j ELSE 0 END)) AS BIGINT)"
  }

  private def bucketCte(nBits: Int): String =
    s"""WITH v AS (
       | SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
       |b AS (
       | SELECT vec_id, label, e,
       |  ${bucketSql.replace("%NBITS%", nBits.toString)} AS bucket
       | FROM v)""".stripMargin

  val oracle: Map[String, String] = Map(
    "x2_simhash_pairs" ->
      s"""$simhashCte
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         | CAST(bit_count(CAST(xor(a.sh, b.sh) AS BIGINT)) AS BIGINT) AS hamming
         |FROM s a JOIN s b ON a.doc_id < b.doc_id
         |WHERE bit_count(CAST(xor(a.sh, b.sh) AS BIGINT)) <= 3
         |ORDER BY id_a, id_b""".stripMargin,
    "x1_lsh_buckets" ->
      s"""${bucketCte(8)}
         |SELECT bucket, COUNT(*) AS n, MIN(vec_id) AS min_vec_id
         |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,
    "x1_ann_topk" ->
      s"""${bucketCte(8)}
         |SELECT x.vec_id, x.label,
         | ROUND(list_cosine_similarity(x.e, q.e), 6) AS score
         |FROM b x CROSS JOIN (SELECT e, bucket FROM b WHERE vec_id = 0) q
         |WHERE x.vec_id <> 0
         |  AND bit_count(CAST(xor(x.bucket, q.bucket) AS BIGINT)) <= 1
         |ORDER BY score DESC, x.vec_id ASC LIMIT 10""".stripMargin,
    // identical semantics to x1_ann_topk — the persisted index changes
    // the access path, never the result
    "x1_ann_index_topk" ->
      s"""${bucketCte(8)}
         |SELECT x.vec_id, x.label,
         | ROUND(list_cosine_similarity(x.e, q.e), 6) AS score
         |FROM b x CROSS JOIN (SELECT e, bucket FROM b WHERE vec_id = 0) q
         |WHERE x.vec_id <> 0
         |  AND bit_count(CAST(xor(x.bucket, q.bucket) AS BIGINT)) <= 1
         |ORDER BY score DESC, x.vec_id ASC LIMIT 10""".stripMargin,
    "x2_cosine_neardup" ->
      s"""${bucketCte(4)}
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         | ROUND(list_cosine_similarity(a.e, b.e), 6) AS score
         |FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |WHERE list_cosine_similarity(a.e, b.e) >= 0.35
         |ORDER BY id_a, id_b""".stripMargin,
    "p6c_substring_search" ->
      """SELECT doc_id, lang FROM documents
        |WHERE contains(lower(text), 'fast merge')
        |ORDER BY doc_id""".stripMargin,
    // full Okapi BM25 recomputed from raw text; the top-k cut and the
    // output order use the 6-decimal ROUNDED score in both engines
    "p6f_bm25_rank" ->
      """WITH w AS (
        | SELECT doc_id, UNNEST(regexp_extract_all(lower(text), '[a-z]+'))
        |   AS term
        | FROM documents),
        |len AS (SELECT doc_id, COUNT(*) AS len FROM w GROUP BY doc_id),
        |n AS (SELECT COUNT(*) AS n_docs, SUM(len) AS total FROM len),
        |tf AS (
        | SELECT doc_id, term, COUNT(*) AS tf FROM w
        | WHERE term IN ('spark', 'table', 'vector') GROUP BY 1, 2),
        |df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
        |sc AS (
        | SELECT tf.doc_id,
        |  SUM(ln((n.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
        |      * tf.tf * 2.2
        |      / (tf.tf + 1.2 * (0.25 + 0.75 * len.len
        |          / (n.total / (n.n_docs * 1.0))))) AS score
        | FROM tf JOIN df USING (term) JOIN len USING (doc_id) CROSS JOIN n
        | GROUP BY 1)
        |SELECT doc_id, ROUND(score, 6) AS score FROM sc
        |ORDER BY ROUND(score, 6) DESC, doc_id LIMIT 10""".stripMargin,
    "p6j_bm25_sql" ->
      """WITH w AS (
        | SELECT doc_id, UNNEST(regexp_extract_all(lower(text), '[a-z]+'))
        |   AS term
        | FROM documents),
        |len AS (SELECT doc_id, COUNT(*) AS len FROM w GROUP BY doc_id),
        |n AS (SELECT COUNT(*) AS n_docs, SUM(len) AS total FROM len),
        |tf AS (
        | SELECT doc_id, term, COUNT(*) AS tf FROM w
        | WHERE term IN ('spark', 'table', 'vector') GROUP BY 1, 2),
        |df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
        |sc AS (
        | SELECT tf.doc_id,
        |  SUM(ln((n.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
        |      * tf.tf * 2.2
        |      / (tf.tf + 1.2 * (0.25 + 0.75 * len.len
        |          / (n.total / (n.n_docs * 1.0))))) AS score
        | FROM tf JOIN df USING (term) JOIN len USING (doc_id) CROSS JOIN n
        | GROUP BY 1)
        |SELECT doc_id, ROUND(score, 6) AS score FROM sc
        |ORDER BY ROUND(score, 6) DESC, doc_id LIMIT 10""".stripMargin,
    // RRF fusion: both rank lists recomputed natively, two divides +
    // one commutative add per fused score, rounded cut
    "p6i_hybrid_rrf" ->
      """WITH w AS (
        | SELECT doc_id, UNNEST(regexp_extract_all(lower(text), '[a-z]+'))
        |   AS term
        | FROM documents),
        |len AS (SELECT doc_id, COUNT(*) AS len FROM w GROUP BY doc_id),
        |n AS (SELECT COUNT(*) AS n_docs, SUM(len) AS total FROM len),
        |tf AS (
        | SELECT doc_id, term, COUNT(*) AS tf FROM w
        | WHERE term IN ('spark', 'table', 'vector') GROUP BY 1, 2),
        |df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
        |sc AS (
        | SELECT tf.doc_id,
        |  SUM(ln((n.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
        |      * tf.tf * 2.2
        |      / (tf.tf + 1.2 * (0.25 + 0.75 * len.len
        |          / (n.total / (n.n_docs * 1.0))))) AS score
        | FROM tf JOIN df USING (term) JOIN len USING (doc_id) CROSS JOIN n
        | GROUP BY 1),
        |bm AS (
        | SELECT doc_id,
        |  row_number() OVER (ORDER BY ROUND(score, 6) DESC, doc_id) AS rb
        | FROM sc ORDER BY ROUND(score, 6) DESC, doc_id LIMIT 50),
        |vs AS (
        | SELECT e.vec_id AS doc_id,
        |  ROUND(list_cosine_similarity(e.embedding::DOUBLE[],
        |    q.embedding::DOUBLE[]), 6) AS vscore
        | FROM embeddings e
        | CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        | WHERE e.vec_id <> 0),
        |vr AS (
        | SELECT doc_id,
        |  row_number() OVER (ORDER BY vscore DESC, doc_id) AS rv
        | FROM vs ORDER BY vscore DESC, doc_id LIMIT 50)
        |SELECT COALESCE(bm.doc_id, vr.doc_id) AS doc_id,
        | CAST(bm.rb AS BIGINT) AS rb, CAST(vr.rv AS BIGINT) AS rv,
        | ROUND(COALESCE(1 / (CAST(bm.rb AS DOUBLE) + 60), 0)
        |   + COALESCE(1 / (CAST(vr.rv AS DOUBLE) + 60), 0), 6) AS rrf
        |FROM bm FULL OUTER JOIN vr ON bm.doc_id = vr.doc_id
        |ORDER BY rrf DESC, COALESCE(bm.doc_id, vr.doc_id) LIMIT 10""".stripMargin,
    "p6b_indexed_search" ->
      """SELECT doc_id, lang FROM documents
        |WHERE list_contains(regexp_extract_all(lower(text), '[a-z]+'), 'spark')
        |  AND list_contains(regexp_extract_all(lower(text), '[a-z]+'), 'table')
        |  AND list_contains(regexp_extract_all(lower(text), '[a-z]+'), 'vector')
        |ORDER BY doc_id""".stripMargin,
    // fuzzy expansion + postings probe must equal the word-explode
    // scan under DuckDB's own levenshtein (both engines implement the
    // standard unit-cost Levenshtein distance)
    "p6g_fuzzy_search" ->
      """WITH w AS (
        | SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
        | FROM documents)
        |SELECT term, CAST(levenshtein(term, 'part') AS INT) AS dist,
        | count(DISTINCT doc_id) AS n_docs
        |FROM w WHERE levenshtein(term, 'part') <= 2
        |GROUP BY term ORDER BY term""".stripMargin,
    // vector quality: all integer counts; mode dim from the bounded
    // dim histogram with a deterministic (count desc, dim) tiebreak
    "x1_vector_quality" ->
      """WITH e AS (
        | SELECT vec_id, embedding, len(embedding) AS dim,
        |  list_sum(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS sq
        | FROM embeddings),
        |m AS (
        | SELECT dim AS mode_dim FROM e WHERE embedding IS NOT NULL
        | GROUP BY dim ORDER BY count(*) DESC, dim LIMIT 1)
        |SELECT count(*) AS n_rows,
        | count(*) FILTER (WHERE embedding IS NULL) AS n_null,
        | count(*) FILTER (WHERE embedding IS NOT NULL AND sq = 0.0)
        |   AS n_zero_norm,
        | count(*) FILTER (WHERE embedding IS NOT NULL
        |   AND dim <> m.mode_dim) AS n_off_dim,
        | CAST(min(dim) FILTER (WHERE embedding IS NOT NULL) AS INT)
        |   AS min_dim,
        | CAST(max(dim) FILTER (WHERE embedding IS NOT NULL) AS INT)
        |   AS max_dim,
        | CAST(m.mode_dim AS INT) AS mode_dim
        |FROM e CROSS JOIN m GROUP BY m.mode_dim""".stripMargin,
    // PSI drift: integer counts, one divide per share, ln far below
    // the rounding quantum
    "x_label_psi" ->
      """WITH c AS (
        | SELECT label, vec_id % 2 AS half, count(*) AS n
        | FROM embeddings GROUP BY 1, 2),
        |s AS (
        | SELECT label, half, CAST(n AS DOUBLE)
        |   / CAST(sum(n) OVER (PARTITION BY half) AS DOUBLE) AS share
        | FROM c)
        |SELECT a.label, ROUND(a.share, 6) AS share_a,
        | ROUND(b.share, 6) AS share_b,
        | ROUND((a.share - b.share) * ln(a.share / b.share), 6) AS psi_term
        |FROM s a JOIN s b ON a.label = b.label AND a.half = 0 AND b.half = 1
        |ORDER BY a.label""".stripMargin,
    // ranked spell suggestion: per input the (dist, df desc, term)
    // argmin over the same word-explode + levenshtein scan
    "p6h_did_you_mean" ->
      """WITH w AS (
        | SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
        | FROM documents),
        |inp AS (SELECT unnest(['vektor', 'tabel', 'qurey']) AS input),
        |cand AS (
        | SELECT i.input, w.term,
        |  CAST(levenshtein(w.term, i.input) AS INT) AS dist,
        |  count(DISTINCT w.doc_id) AS n_docs
        | FROM inp i JOIN w ON levenshtein(w.term, i.input) <= 2
        | GROUP BY 1, 2, 3),
        |r AS (
        | SELECT *, row_number() OVER (PARTITION BY input
        |   ORDER BY dist, n_docs DESC, term) AS rk
        | FROM cand)
        |SELECT input, term AS suggestion, dist, n_docs
        |FROM r WHERE rk = 1 ORDER BY input""".stripMargin,
    // store-served frequent items in the untrimmed regime must equal
    // the naive corpus GROUP BY + HAVING (the SAME oracle text as
    // x_heavy_hitters — the twins are pinned to one definition)
    "x_freq_store_top" -> TextSim.bigramFrequentOracle,
    // the store twin is pinned to the batch query's own oracle — one
    // SQL text, two serving paths
    "ev_cooccurrence_store" -> Analytics.oracle("ev_item_cooccurrence"),
    // store-served rank quantiles in the exact regime must equal the
    // window-SQL rank definition over the corpus: smallest value whose
    // cumulative count reaches ceil(q * n)
    "x_quant_quantiles_ingest" ->
      """WITH c AS (
        | SELECT CAST(n_chars AS DOUBLE) AS v, count(*) AS w
        | FROM documents WHERE n_chars IS NOT NULL GROUP BY 1),
        |cum AS (
        | SELECT v, sum(w) OVER (ORDER BY v) AS cum, sum(w) OVER () AS n
        | FROM c),
        |q AS (SELECT unnest(CAST([0.25, 0.5, 0.75, 0.95] AS DOUBLE[])) AS q)
        |SELECT q.q, min(cum.v) AS value
        |FROM q JOIN cum ON cum.cum >= CAST(ceil(q.q * cum.n) AS BIGINT)
        |GROUP BY q.q ORDER BY q.q""".stripMargin,
    "x_quant_store_quantiles" ->
      """WITH c AS (
        | SELECT CAST(l_quantity AS DOUBLE) AS v, count(*) AS w
        | FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1),
        |cum AS (
        | SELECT v, sum(w) OVER (ORDER BY v) AS cum, sum(w) OVER () AS n
        | FROM c),
        |q AS (SELECT unnest(CAST([0.25, 0.5, 0.75, 0.9] AS DOUBLE[])) AS q)
        |SELECT q.q, min(cum.v) AS value
        |FROM q JOIN cum ON cum.cum >= CAST(ceil(q.q * cum.n) AS BIGINT)
        |GROUP BY q.q ORDER BY q.q""".stripMargin,
    "x_quant_store_cdf" ->
      """WITH n AS (
        | SELECT count(*) AS n FROM lineitem WHERE l_quantity IS NOT NULL),
        |p AS (SELECT unnest(CAST([5.0, 25.0, 45.0] AS DOUBLE[])) AS value)
        |SELECT p.value,
        | (SELECT count(*) FROM lineitem
        |  WHERE CAST(l_quantity AS DOUBLE) <= p.value) AS rank,
        | n.n,
        | ROUND(CAST((SELECT count(*) FROM lineitem
        |   WHERE CAST(l_quantity AS DOUBLE) <= p.value) AS DOUBLE)
        |  / CAST(n.n AS DOUBLE), 6) AS cdf
        |FROM p CROSS JOIN n ORDER BY value""".stripMargin,
    "x_quant_store_group_quantiles" ->
      """WITH c AS (
        | SELECT CAST(l_returnflag AS VARCHAR) AS grp,
        |  CAST(l_quantity AS DOUBLE) AS v, count(*) AS w
        | FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1, 2),
        |cum AS (
        | SELECT grp, v, sum(w) OVER (PARTITION BY grp ORDER BY v) AS cum,
        |  sum(w) OVER (PARTITION BY grp) AS n
        | FROM c),
        |q AS (SELECT unnest(CAST([0.5, 0.9] AS DOUBLE[])) AS q)
        |SELECT cum.grp, q.q, min(cum.v) AS value
        |FROM q JOIN cum ON cum.cum >= CAST(ceil(q.q * cum.n) AS BIGINT)
        |GROUP BY cum.grp, q.q ORDER BY cum.grp, q.q""".stripMargin,
    "x_freq_store_group_top" -> TextSim.bigramFrequentGroupedOracle,
    // image near-dup over the decoded-feature sidecar: DuckDB
    // independently recomputes hyperplane buckets + cosine scores
    // from the dumped floats (decode ground truth is ImageCodecSpec's)
    "m2_audio_neardup" ->
      s"""WITH v AS (
         | SELECT media_id, features::DOUBLE[] AS e
         | FROM read_parquet('$audioFeatsSidecar/*.parquet')),
         |b AS (
         | SELECT media_id, e,
         |  ${bucketSql.replace("%NBITS%", "4")} AS bucket
         | FROM v)
         |SELECT a.media_id AS id_a, b2.media_id AS id_b,
         | ROUND(list_cosine_similarity(a.e, b2.e), 6) AS score
         |FROM b a JOIN b b2
         |  ON a.bucket = b2.bucket AND a.media_id < b2.media_id
         |WHERE list_cosine_similarity(a.e, b2.e) >= 0.8
         |ORDER BY id_a, id_b""".stripMargin,
    "m3_video_neardup" ->
      s"""WITH v AS (
         | SELECT media_id, features::DOUBLE[] AS e
         | FROM read_parquet('$videoFeatsSidecar/*.parquet')),
         |b AS (
         | SELECT media_id, e,
         |  ${bucketSql.replace("%NBITS%", "4")} AS bucket
         | FROM v)
         |SELECT a.media_id AS id_a, b2.media_id AS id_b,
         | ROUND(list_cosine_similarity(a.e, b2.e), 6) AS score
         |FROM b a JOIN b b2
         |  ON a.bucket = b2.bucket AND a.media_id < b2.media_id
         |WHERE list_cosine_similarity(a.e, b2.e) >= 0.8
         |ORDER BY id_a, id_b""".stripMargin,
    "m1_image_neardup" ->
      s"""WITH v AS (
         | SELECT media_id, features::DOUBLE[] AS e
         | FROM read_parquet('$mediaFeatsSidecar/*.parquet')),
         |b AS (
         | SELECT media_id, e,
         |  ${bucketSql.replace("%NBITS%", "4")} AS bucket
         | FROM v)
         |SELECT a.media_id AS id_a, b2.media_id AS id_b,
         | ROUND(list_cosine_similarity(a.e, b2.e), 6) AS score
         |FROM b a JOIN b b2
         |  ON a.bucket = b2.bucket AND a.media_id < b2.media_id
         |WHERE list_cosine_similarity(a.e, b2.e) >= 0.8
         |ORDER BY id_a, id_b""".stripMargin,
    // exact-regime KMV set algebra must equal DuckDB's INTERSECT/UNION
    // over the exact DISTINCT user sets
    "x_kmv_segments" ->
      """WITH a AS (
        | SELECT DISTINCT user_id FROM events
        | WHERE event_type = 'purchase' AND value >= 95),
        |b AS (
        | SELECT DISTINCT user_id FROM events
        | WHERE event_type = 'click' AND value >= 95)
        |SELECT 'both' AS segment, COUNT(*) AS n_users
        |FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
        |UNION ALL
        |SELECT 'click_hi', COUNT(*) FROM b
        |UNION ALL
        |SELECT 'either', COUNT(*)
        |FROM (SELECT * FROM a UNION SELECT * FROM b)
        |UNION ALL
        |SELECT 'purchase_hi', COUNT(*) FROM a
        |ORDER BY segment""".stripMargin,
    // the N-segment overlap grid: exact-regime KMV pair counts must
    // equal DuckDB's exact pairwise DISTINCT-set intersections;
    // zero-overlap pairs present with n_common 0; jaccard = integer
    // counts + one IEEE divide + round on both engines
    "x_kmv_overlap_matrix" ->
      """WITH s AS (
        | SELECT DISTINCT event_type AS seg, user_id
        | FROM events WHERE value >= 95),
        |d AS (SELECT seg, count(*) AS n FROM s GROUP BY 1),
        |p AS (
        | SELECT a.seg AS seg_a, b.seg AS seg_b, count(*) AS n_common
        | FROM s a JOIN s b ON a.user_id = b.user_id AND a.seg < b.seg
        | GROUP BY 1, 2)
        |SELECT da.seg AS seg_a, db.seg AS seg_b,
        | coalesce(p.n_common, 0) AS n_common,
        | da.n AS n_a, db.n AS n_b,
        | ROUND(CAST(coalesce(p.n_common, 0) AS DOUBLE) /
        |  CAST(da.n + db.n - coalesce(p.n_common, 0) AS DOUBLE), 6)
        |  AS jaccard
        |FROM d da JOIN d db ON da.seg < db.seg
        |LEFT JOIN p ON p.seg_a = da.seg AND p.seg_b = db.seg
        |ORDER BY seg_a, seg_b""".stripMargin,
    // the ingest-path grid over documents: exact-regime KMV pair
    // counts must equal DuckDB's exact pairwise DISTINCT-source
    // intersections per language pair
    "x_kmv_overlap_ingest" ->
      """WITH s AS (
        | SELECT DISTINCT lang AS seg, source FROM documents),
        |d AS (SELECT seg, count(*) AS n FROM s GROUP BY 1),
        |p AS (
        | SELECT a.seg AS seg_a, b.seg AS seg_b, count(*) AS n_common
        | FROM s a JOIN s b ON a.source = b.source AND a.seg < b.seg
        | GROUP BY 1, 2)
        |SELECT da.seg AS seg_a, db.seg AS seg_b,
        | coalesce(p.n_common, 0) AS n_common,
        | da.n AS n_a, db.n AS n_b,
        | ROUND(CAST(coalesce(p.n_common, 0) AS DOUBLE) /
        |  CAST(da.n + db.n - coalesce(p.n_common, 0) AS DOUBLE), 6)
        |  AS jaccard
        |FROM d da JOIN d db ON da.seg < db.seg
        |LEFT JOIN p ON p.seg_a = da.seg AND p.seg_b = db.seg
        |ORDER BY seg_a, seg_b""".stripMargin,
    // proximity = some occurrence of each term within `slop` positions
    // (unordered, distinct positions) — the oracle nests position
    // filters over the extracted word list
    "p6e_proximity_search" ->
      """SELECT doc_id, lang FROM (
        | SELECT doc_id, lang,
        |  regexp_extract_all(lower(text), '[a-z]+') AS ws
        | FROM documents)
        |WHERE len(list_filter(range(1, len(ws) + 1),
        |  i -> ws[CAST(i AS INT)] = 'slow'
        |   AND len(list_filter(range(1, len(ws) + 1),
        |     j -> ws[CAST(j AS INT)] = 'query'
        |      AND abs(i - j) <= 2 AND i <> j)) > 0)) > 0
        |ORDER BY doc_id""".stripMargin,
    // phrase = consecutive tokens of the word sequence — the oracle
    // slides a 2-word window over the extracted words
    "p6d_phrase_search" ->
      """SELECT doc_id, lang FROM (
        | SELECT doc_id, lang,
        |  regexp_extract_all(lower(text), '[a-z]+') AS ws
        | FROM documents)
        |WHERE list_contains(
        |  list_transform(range(1, len(ws)),
        |   i -> ws[CAST(i AS INT)] || ' ' || ws[CAST(i AS INT) + 1]),
        |  'fast merge')
        |ORDER BY doc_id""".stripMargin,
    // per-group sketch fold vs exact per-group distinct (sparse-exact
    // at <= 20 sources per lang)
    "x_hll_group_distinct" ->
      """SELECT lang, COUNT(DISTINCT source) AS n_distinct
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    // the batch-merged histogram is exact on this bounded integer
    // domain; q's are binary-exact so ceil(q*N) agrees across engines
    "x_hist_quantiles" ->
      """SELECT CAST(0.25 AS DOUBLE) AS q, quantile_disc(l_quantity, 0.25) AS value FROM lineitem
        |UNION ALL
        |SELECT CAST(0.5 AS DOUBLE) AS q, quantile_disc(l_quantity, 0.5) AS value FROM lineitem
        |UNION ALL
        |SELECT CAST(0.75 AS DOUBLE) AS q, quantile_disc(l_quantity, 0.75) AS value FROM lineitem
        |ORDER BY q""".stripMargin,
    // ingest-track twin: same bucketization the ScanJob ingest appends
    // (bounded bin domain → exact merged histogram over bucket values)
    "x_hist_quantiles_ingest" ->
      """SELECT CAST(0.25 AS DOUBLE) AS q,
        | quantile_disc(FLOOR(n_chars / 100) * 100, 0.25) AS value FROM documents
        |UNION ALL
        |SELECT CAST(0.5 AS DOUBLE) AS q,
        | quantile_disc(FLOOR(n_chars / 100) * 100, 0.5) AS value FROM documents
        |UNION ALL
        |SELECT CAST(0.75 AS DOUBLE) AS q,
        | quantile_disc(FLOOR(n_chars / 100) * 100, 0.75) AS value FROM documents
        |ORDER BY q""".stripMargin,
    // per-group twin: DuckDB quantile_disc per lang over the same
    // bucketization — the grouped merged histogram is exact
    "x_hist_group_quantiles" ->
      """SELECT lang, CAST(0.25 AS DOUBLE) AS q,
        | quantile_disc(FLOOR(n_chars / 100) * 100, 0.25) AS value
        |FROM documents GROUP BY lang
        |UNION ALL
        |SELECT lang, CAST(0.5 AS DOUBLE) AS q,
        | quantile_disc(FLOOR(n_chars / 100) * 100, 0.5) AS value
        |FROM documents GROUP BY lang
        |UNION ALL
        |SELECT lang, CAST(0.75 AS DOUBLE) AS q,
        | quantile_disc(FLOOR(n_chars / 100) * 100, 0.75) AS value
        |FROM documents GROUP BY lang
        |ORDER BY lang, q""".stripMargin,
    // sparse-mode HLL is exact at these cardinalities, so the sketch
    // fold must hash-match the exact distinct count
    "x_hll_distinct" ->
      """SELECT 'lang' AS col, COUNT(DISTINCT lang) AS n_distinct FROM documents
        |UNION ALL
        |SELECT 'source' AS col, COUNT(DISTINCT source) AS n_distinct FROM documents
        |ORDER BY col""".stripMargin,
    // index-served batch kNN: exact scoring inside all-lists probes ≡
    // plain exact rank; SELF-inclusive vote (see the query scaladoc)
    "x1_knn_batch_index" ->
      """WITH q AS (
        | SELECT vec_id AS qid, embedding::DOUBLE[] AS qe
        | FROM embeddings WHERE vec_id BETWEEN 0 AND 7),
        |s AS (
        | SELECT q.qid, e.vec_id, e.label,
        |  ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qe), 6) AS score
        | FROM embeddings e CROSS JOIN q),
        |r AS (
        | SELECT qid, label,
        |  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, vec_id ASC) AS rn
        | FROM s)
        |SELECT qid AS query_id, label, COUNT(*) AS votes
        |FROM r WHERE rn <= 25
        |GROUP BY qid, label
        |ORDER BY query_id ASC, votes DESC, label ASC""".stripMargin,
    // index-served kNN: the LSH candidate pool covers the exact top-25
    // with measured margin, so the oracle is the exact brute-force
    // vote — the index changes the access path, never the answer
    "x1_knn_index_label" ->
      """SELECT label, COUNT(*) AS votes FROM (
        | SELECT e.label,
        |  ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 6) AS score,
        |  e.vec_id
        | FROM embeddings e
        | CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        | WHERE e.vec_id <> 0
        | ORDER BY score DESC, e.vec_id ASC LIMIT 25)
        |GROUP BY label
        |ORDER BY votes DESC, label ASC""".stripMargin,
    // PQ re-rank with a 3×-margin refine recovers the TRUE top-k, so
    // the oracle is plain brute-force cosine — the quantizer changes
    // the access path and scan bytes, never the answer
    "x1_pq_topk" ->
      """SELECT e.vec_id, e.label,
        | ROUND(list_cosine_similarity(e.embedding::DOUBLE[],
        |   q.embedding::DOUBLE[]), 6) AS score
        |FROM embeddings e
        |CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        |ORDER BY score DESC, e.vec_id ASC LIMIT 10""".stripMargin,
    // centroid = exact DECIMAL element-wise sum (order-independent;
    // cosine is scale-invariant so sum ≡ mean in direction); ranking
    // over the ROUNDED cosine with vec_id tiebreak, as in the x1
    // top-k family
    "x1_label_outliers" ->
      """WITH e AS (
        | SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings),
        |p AS (
        | SELECT label,
        |  UNNEST(range(1, len(emb) + 1)) AS pos,
        |  UNNEST(list_transform(range(1, len(emb) + 1),
        |    i -> emb[CAST(i AS INT)])) AS x
        | FROM e),
        |c AS (
        | SELECT label, pos, SUM(CAST(x AS DECIMAL(18,9))) AS sx
        | FROM p GROUP BY label, pos),
        |cl AS (
        | SELECT label, list(CAST(sx AS DOUBLE) ORDER BY pos) AS cent
        | FROM c GROUP BY label),
        |s AS (
        | SELECT e.label, e.vec_id,
        |  ROUND(list_cosine_similarity(e.emb, cl.cent), 6) AS centroid_cos
        | FROM e JOIN cl USING (label)),
        |r AS (
        | SELECT label, vec_id, centroid_cos,
        |  ROW_NUMBER() OVER (PARTITION BY label
        |    ORDER BY centroid_cos ASC, vec_id ASC) AS rank
        | FROM s)
        |SELECT label, vec_id, centroid_cos, rank
        |FROM r WHERE rank <= 3
        |ORDER BY label, rank""".stripMargin,
    // IVF-PQ with measured-margin nProbe + refine recovers the TRUE
    // top-k — same brute-force oracle as x1_pq_topk
    "x1_ivfpq_topk" ->
      """SELECT e.vec_id, e.label,
        | ROUND(list_cosine_similarity(e.embedding::DOUBLE[],
        |   q.embedding::DOUBLE[]), 6) AS score
        |FROM embeddings e
        |CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        |ORDER BY score DESC, e.vec_id ASC LIMIT 10""".stripMargin)
}
