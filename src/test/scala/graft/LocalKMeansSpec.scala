package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** Driver-side quantizer trainer: shape, determinism, and separation
  * invariants the PQ/IVF oracle margins rely on. */
class LocalKMeansSpec extends AnyFunSuite {

  private def pts(rows: (Double, Double)*): Array[Array[Double]] =
    rows.map { case (a, b) => Array(a, b) }.toArray

  test("always returns exactly k centers, even when n < k") {
    val tiny = pts((0.0, 0.0), (1.0, 1.0))
    val cs = LocalKMeans.train(tiny, k = 8, iters = 5, seed = 1L)
    assert(cs.length === 8)
    assert(cs.forall(_.length === 2))
    // duplicates are fine; downstream argmin breaks ties by index
  }

  test("bit-deterministic for a fixed (points, k, iters, seed)") {
    val rnd = new scala.util.Random(7)
    val data = Array.fill(500)(Array.fill(4)(rnd.nextDouble()))
    val a = LocalKMeans.train(data, k = 16, iters = 10, seed = 42L)
    val b = LocalKMeans.train(data, k = 16, iters = 10, seed = 42L)
    assert(a.zip(b).forall { case (x, y) => x.sameElements(y) })
    // and a different seed genuinely moves the centers
    val c = LocalKMeans.train(data, k = 16, iters = 10, seed = 43L)
    assert(!a.zip(c).forall { case (x, y) => x.sameElements(y) })
  }

  test("well-separated clusters are recovered") {
    val rnd = new scala.util.Random(3)
    val blobs = Seq((0.0, 0.0), (100.0, 0.0), (0.0, 100.0), (100.0, 100.0))
    val data = blobs.flatMap { case (cx, cy) =>
      Array.fill(50)(Array(cx + rnd.nextGaussian(), cy + rnd.nextGaussian()))
    }.toArray
    val cs = LocalKMeans.train(data, k = 4, iters = 20, seed = 42L)
    // every blob centroid has a learned center within a small radius
    blobs.foreach { case (cx, cy) =>
      val d = cs.map(c => math.hypot(c(0) - cx, c(1) - cy)).min
      assert(d < 2.0, s"no center near ($cx,$cy): min dist $d")
    }
  }

  test("empty clusters keep their previous center (no NaNs, no loss)") {
    // all points identical: one cluster absorbs everything, the rest
    // must keep finite (duplicate) centers rather than divide by zero
    val same = Array.fill(10)(Array(5.0, 5.0))
    val cs = LocalKMeans.train(same, k = 3, iters = 5, seed = 9L)
    assert(cs.length === 3)
    assert(cs.forall(_.forall(v => !v.isNaN && !v.isInfinite)))
  }
}
