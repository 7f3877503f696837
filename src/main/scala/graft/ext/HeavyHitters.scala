package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT frequent-item (heavy-hitter) mining at corpus scale, the
  * two-pass sketch-then-verify recipe (Misra–Gries summaries; see the
  * published frequent-items literature, e.g. Misra & Gries 1982 and the
  * Space-Saving family):
  *
  *  1. CANDIDATES — every partition runs a bounded Misra–Gries summary
  *     of capacity `k` over its items (imperative per-partition state,
  *     the one shape `mapPartitions` is for): at most `k` counters
  *     live at any moment regardless of partition size or vocabulary,
  *     and an item with partition frequency > n_p/k is guaranteed to
  *     survive. Summing the guarantee over partitions: any item with
  *     GLOBAL frequency > n/k appears in at least one partition's
  *     summary (if it survived nowhere, its total frequency would be
  *     ≤ Σ n_p/k = n/k) — the union of per-partition candidates is a
  *     sound superset for any threshold φ ≥ 1/k.
  *  2. VERIFY — exact counts for candidates only: the per-partition
  *     summaries stay a DataFrame (at 10k+ cluster partitions the
  *     union is tens of millions of rows — executor data, not driver
  *     state), are deduplicated executor-side (≤ k distinct survivors
  *     per partition before dedup, skew-free after), then broadcast
  *     semi-join-reduce the corpus, and one hash aggregate counts the
  *     survivors exactly. The corpus size for the threshold comes from
  *     an aggregate over per-partition sentinel rows, joined in as a
  *     1-row broadcast — the driver never materializes candidates or
  *     the count.
  *
  * The output is EXACT (identical to a full GROUP BY + HAVING), but the
  * shuffled aggregate runs over candidate items only — at 100 TB the
  * full-vocabulary aggregate shuffles billions of distinct keys to find
  * the dozens above threshold; this shuffles the candidate slice.
  *
  * Reference behavior: the term-frequency analytics over scanned
  * document text (`/root/reference/services/api/src/services/scan.ts`
  * keyword extraction) — re-expressed as a distributed two-pass plan.
  */
object HeavyHitters {

  /** Per-partition Misra–Gries summary (at most `k` counters) plus the
    * number of decrement-all events — each event undercounts any
    * single item's summary count by at most 1, so the event count IS
    * the partition's per-item undercount budget (0 = the summary is an
    * exact census of the partition). */
  private[ext] def misraGriesWithStats(items: Iterator[String], k: Int)
      : (List[(String, Long)], Long) = {
    val counters = new java.util.HashMap[String, Long](k * 2)
    var decrements = 0L
    items.foreach { item =>
      val c = counters.get(item)
      if (c != 0L || counters.containsKey(item)) counters.put(item, c + 1L)
      else if (counters.size < k) counters.put(item, 1L)
      else {
        // decrement-all step: drop every counter by 1, evict zeros
        decrements += 1L
        val it = counters.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    import scala.jdk.CollectionConverters._
    (counters.asScala.toList, decrements)
  }

  private[ext] def misraGries(items: Iterator[String], k: Int)
      : Iterator[(String, Long)] =
    misraGriesWithStats(items, k)._1.iterator

  /** Items of `itemCol` whose frequency × `den` > corpus size × `num`
    * (i.e. frequency > (num/den) · n, exact rational threshold — kept
    * in integer arithmetic so engines can't disagree on a boundary).
    * Returns (item, n) with exact counts, heaviest first.
    *
    * `capacity` must satisfy capacity ≥ den/num for the candidate
    * guarantee (checked). */
  def frequentItems(items: DataFrame, itemCol: String,
      num: Long, den: Long, capacity: Int = 4096): DataFrame = {
    require(num > 0 && den > 0, "threshold must be a positive rational")
    require(capacity.toLong * num >= den,
      s"capacity $capacity < den/num = ${den / num}: Misra-Gries cannot " +
        "guarantee candidates at this threshold")
    val s = items.sparkSession
    import s.implicits._
    val col0 = col(itemCol)
    val strings = items.select(col0.cast("string").as("item"))
      .filter(col("item").isNotNull)
    // ONE pass yields BOTH the candidates and the threshold's n: each
    // partition emits its summary plus a sentinel row (null item)
    // carrying its item count — a separate count() action would
    // re-evaluate the whole upstream pipeline (explodes, regexes) a
    // third time. The summaries STAY distributed: at cluster partition
    // counts (10k+ partitions × capacity) the union of candidates is
    // tens of millions of rows — executor data, never driver state.
    // localCheckpoint materializes the bounded summary rows (≤
    // capacity + 1 per partition) exactly once so the two derived
    // subplans (candidates, total) don't re-run the upstream pipeline.
    val summaries = strings.as[String].mapPartitions { it =>
      var n = 0L
      val counted = it.map { x => n += 1; x }
      val (summary, _) = misraGriesWithStats(counted, capacity)
      (summary.map { case (i, _) => (i, 0L) } :+
        ((null: String, n))).iterator
    }.toDF("item", "n").localCheckpoint(true)
    // sentinel rows → corpus size, as a 1-row DataFrame joined in
    // below (never a driver-side literal)
    val totalDf = summaries.filter(col("item").isNull)
      .agg(coalesce(sum("n"), lit(0L)).as("hh_total"))
    // executor-side dedup of the candidate union; the deduped set is
    // ≤ capacity × partitions and skew-free (already distinct), so the
    // broadcast hint is safe at any corpus size
    val cands = summaries.filter(col("item").isNotNull)
      .select("item").distinct()
    strings.join(broadcast(cands), Seq("item"), "left_semi")
      .groupBy("item")
      .agg(count(lit(1)).as("n"))
      .join(broadcast(totalDf))
      .filter(col("n") * den > col("hh_total") * num)
      .drop("hh_total")
      .orderBy(desc("n"), asc("item"))
  }
}
