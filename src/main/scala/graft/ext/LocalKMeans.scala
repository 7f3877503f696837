package graft.ext

/** Seeded single-node Lloyd's k-means with k-means++ initialization,
  * for quantizer training on BOUNDED samples (the FAISS recipe:
  * codebooks/centroids train on ~100k sampled vectors, so the fit is
  * a driver-side problem — a distributed KMeans here pays hundreds of
  * scheduler round-trips of pure overhead: m subspaces × maxIter
  * iterations of micro-jobs dominated the whole PQ index build).
  *
  * Fully deterministic given (points, k, iters, seed): sequential
  * floating-point order, no partitioning sensitivity — unlike a
  * distributed fit, whose reduce order can perturb low bits and with
  * them the measured oracle margins. Always returns EXACTLY k centers
  * (an empty cluster keeps its previous center; duplicate centers are
  * fine — the encoder's argmin breaks ties by index).
  */
private[ext] object LocalKMeans {

  private def sqDist(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  private def nearest(p: Array[Double], centers: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centers.length) {
      val d = sqDist(p, centers(c))
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** k-means++ seeding: first center uniform, each next center drawn
    * with probability ∝ squared distance to the nearest chosen one. */
  private def initPlusPlus(points: Array[Array[Double]], k: Int,
      rnd: scala.util.Random): Array[Array[Double]] = {
    val n = points.length
    val centers = Array.ofDim[Array[Double]](k)
    centers(0) = points(rnd.nextInt(n)).clone()
    val d2 = Array.fill(n)(Double.MaxValue)
    var c = 1
    while (c < k) {
      var sum = 0.0
      var i = 0
      while (i < n) {
        val d = sqDist(points(i), centers(c - 1))
        if (d < d2(i)) d2(i) = d
        sum += d2(i)
        i += 1
      }
      // weighted draw; with all-zero mass (n < k or all-duplicate
      // points) this falls through to the last point — a duplicate
      // center, handled downstream by index tie-breaks
      var target = rnd.nextDouble() * sum
      var j = 0
      while (j < n - 1 && target >= d2(j)) { target -= d2(j); j += 1 }
      centers(c) = points(j).clone()
      c += 1
    }
    centers
  }

  /** Train k centers over `points` (each of equal dimension). */
  def train(points: Array[Array[Double]], k: Int, iters: Int,
      seed: Long): Array[Array[Double]] = {
    require(points.nonEmpty, "k-means needs a non-empty training set")
    require(k > 0 && iters >= 0, s"bad k=$k / iters=$iters")
    val dim = points(0).length
    val rnd = new scala.util.Random(seed)
    var centers = initPlusPlus(points, k, rnd)
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      var i = 0
      while (i < points.length) {
        val p = points(i)
        val c = nearest(p, centers)
        val s = sums(c)
        var j = 0
        while (j < dim) { s(j) += p(j); j += 1 }
        counts(c) += 1
        i += 1
      }
      centers = Array.tabulate(k) { c =>
        if (counts(c) == 0) centers(c) // empty cluster: keep old center
        else {
          val s = sums(c)
          val out = new Array[Double](dim)
          var j = 0
          while (j < dim) { out(j) = s(j) / counts(c); j += 1 }
          out
        }
      }
      it += 1
    }
    centers
  }
}
