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
  *  2. VERIFY — exact counts for candidates only: the deduplicated
  *     candidate set (≤ k per partition, thousands of rows at most —
  *     broadcastable by construction) semi-join-reduces the corpus,
  *     and one hash aggregate counts the survivors exactly.
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
    // third time. The collected output is bounded by construction:
    // ≤ (capacity + 1) rows per partition, control plane.
    val partRows = strings.as[String].mapPartitions { it =>
      var n = 0L
      val counted = it.map { x => n += 1; x }
      val (summary, _) = misraGriesWithStats(counted, capacity)
      (summary.map { case (i, _) => (i, 0L) } :+
        ((null: String, n))).iterator
    }.collect()
    val total = partRows.collect { case (null, n) => n }.sum
    val cands = partRows.collect { case (i, _) if i != null => i }
      .distinct.toSeq.toDF("item")
    // candidate set is ≤ capacity × partitions by construction — small
    // enough that the hint is safe at any corpus size
    strings.join(broadcast(cands), Seq("item"), "left_semi")
      .groupBy("item")
      .agg(count(lit(1)).as("n"))
      .filter(col("n") * den > lit(total) * num)
      .orderBy(desc("n"), asc("item"))
  }
}
