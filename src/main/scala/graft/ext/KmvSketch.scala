package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct sketch with SET OPERATIONS — the
  * Theta-sketch recipe (published as the KMV/theta family; see the
  * DataSketches literature): keep the `k` smallest hash values of the
  * key domain in unsigned hash order. Because the hash is uniform, the
  * k-th smallest value estimates density, and — unlike HLL — two
  * sketches support INTERSECTION, not just union: restrict both sides
  * to the joint theta and count common survivors.
  *
  * Exactness discipline (the same one the HLL oracle rows use): while
  * fewer than `k` distinct values were seen, EVERY distinct hash is
  * retained, so cardinality, union, and intersection counts are EXACT
  * and oracle-checkable; past `k` the standard estimators apply and
  * [[KmvSketch.isExact]] reports which regime a sketch is in.
  *
  * Build shape at 100 TB: one partial-distinct aggregate feeds a
  * TakeOrdered(k) — what crosses the shuffle is each partition's
  * distinct hash set, and the driver holds ≤ k longs (control plane).
  * Sketches are mergeable (union is lossless: the k smallest of A ∪ B
  * lie inside the union of each side's k smallest), so per-batch
  * sketches roll up like the other mergeable sketch stores
  * ([[DistinctSketch]], [[HistogramSketch]]).
  *
  * Internal order: `flip(h) = h ^ Long.MinValue` maps unsigned hash
  * order onto signed order; `hashes` is sorted by `flip`.
  */
case class KmvSketch(k: Int, hashes: Array[Long]) {
  require(hashes.length <= k, s"sketch holds ${hashes.length} > k=$k hashes")
  import KmvSketch.{flip, HashSpace}

  /** True while every distinct value's hash is retained. */
  def isExact: Boolean = hashes.length < k

  /** Fraction of the hash space at or below the k-th minimum (1.0 in
    * the exact regime). */
  def theta: Double =
    if (isExact) 1.0
    else (flip(hashes.last).toDouble - Long.MinValue.toDouble) / HashSpace

  /** Distinct-count estimate: exact count below k, else (k-1)/theta. */
  def estimate: Double =
    if (isExact) hashes.length.toDouble else (k - 1) / theta

  /** Lossless union merge (result capped at min of the two k's). */
  def merge(other: KmvSketch): KmvSketch = {
    val kk = math.min(k, other.k)
    KmvSketch(kk, (hashes ++ other.hashes).distinct.sortBy(flip).take(kk))
  }

  /** Intersection-count estimate: common survivors at the joint theta
    * scaled back up; exact (a plain set intersection) when both sides
    * are exact. */
  def intersectEstimate(other: KmvSketch): Double = {
    if (isExact && other.isExact)
      hashes.toSet.intersect(other.hashes.toSet).size.toDouble
    else {
      // joint bound: the smaller of the two k-th minima (in unsigned
      // order); survivors are hashes at or below it on BOTH sides
      val bounds = Seq(this, other).filterNot(_.isExact)
        .map(s => flip(s.hashes.last))
      val cut = bounds.min
      val tJoint = (cut.toDouble - Long.MinValue.toDouble) / HashSpace
      val a = hashes.iterator.filter(flip(_) <= cut).toSet
      val b = other.hashes.iterator.filter(flip(_) <= cut).toSet
      a.intersect(b).size / tJoint
    }
  }

  /** Union-count estimate via the merged sketch. */
  def unionEstimate(other: KmvSketch): Double = merge(other).estimate
}

object KmvSketch {
  private[ext] def flip(h: Long): Long = h ^ Long.MinValue
  private val HashSpace = math.pow(2, 64)

  /** Sketch the distinct values of `keyCol`: partial-distinct
    * aggregate, then the k smallest hashes via TakeOrdered (never a
    * global sort), ≤ k longs to the driver.
    *
    * Distinctness is over xxhash64 VALUES, not keys — so the "exact
    * regime" (fewer than k distinct keys ⇒ the sketch is a census,
    * and the differential oracle in `x_kmv_segments` is sound)
    * additionally assumes no 64-bit hash collision among the distinct
    * keys: a collision undercounts by one and would fail the oracle
    * with a confusing mismatch. Same caveat class as the HLL sparse
    * mode — negligible probability (~n²/2⁶⁵), stated so an oracle
    * failure points at the right cause. */
  def sketch(df: DataFrame, keyCol: String, k: Int = 4096): KmvSketch = {
    val hs = df.select(xxhash64(col(keyCol)).as("h")).distinct()
      // signed sort on the flipped value == unsigned hash order
      .orderBy(col("h").bitwiseXOR(lit(Long.MinValue)))
      .limit(k)
      .collect().map(_.getLong(0))
    KmvSketch(k, hs)
  }
}
