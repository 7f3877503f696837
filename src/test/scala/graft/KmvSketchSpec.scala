package graft

import graft.ext.KmvSketch

/** KMV/theta sketch: exact-regime equality, lossless union merge, and
  * sane estimation past k. */
class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  private def ids(r: Range) = r.map(_.toLong).toDF("id")

  test("exact regime: cardinality, intersection and union are exact") {
    val a = KmvSketch.sketch(ids(1 to 300), "id", k = 1024)
    val b = KmvSketch.sketch(ids(200 to 500), "id", k = 1024)
    assert(a.isExact && b.isExact)
    assert(a.estimate === 300.0)
    assert(a.intersectEstimate(b) === 101.0) // 200..300
    assert(a.unionEstimate(b) === 500.0)     // 1..500
  }

  test("merge is lossless: sketch of parts equals sketch of the whole") {
    val whole = KmvSketch.sketch(ids(1 to 5000), "id", k = 256)
    val parts = KmvSketch.sketch(ids(1 to 2500), "id", k = 256)
      .merge(KmvSketch.sketch(ids(2501 to 5000), "id", k = 256))
    assert(whole.hashes.toSeq === parts.hashes.toSeq)
  }

  test("estimator regime past k: within 15% on 20k distincts at k=512") {
    val s = KmvSketch.sketch(ids(1 to 20000), "id", k = 512)
    assert(!s.isExact)
    assert(math.abs(s.estimate - 20000.0) / 20000.0 < 0.15, s.estimate)
    // intersection of identical sketches re-estimates the same set
    assert(math.abs(s.intersectEstimate(s) - s.estimate) / s.estimate < 0.05)
  }

  test("overlap estimate past k tracks the true overlap") {
    val a = KmvSketch.sketch(ids(1 to 10000), "id", k = 512)
    val b = KmvSketch.sketch(ids(5001 to 15000), "id", k = 512)
    val est = a.intersectEstimate(b) // true overlap 5000
    assert(est > 3500 && est < 6500, est)
  }
}
