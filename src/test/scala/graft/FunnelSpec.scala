package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ext.Funnel
import graft.ext.Funnel.Step

/** Parametric N-step funnel (`ext.Funnel`). */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(hour: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-0${1 + hour / 24}%d ${hour % 24}%02d:00:00")

  private def events(rows: (Long, Int, String)*) =
    rows.map { case (u, h, t) => (u, ts(h), t) }.toDF("u", "ts", "et")

  private def run(df: org.apache.spark.sql.DataFrame, steps: Seq[Step]) =
    Funnel.fold(df, col("u"), col("ts"), col("et"), steps).head()

  private val vcp = Seq(Step("view", 0, "view"), Step("click", 24, "click"),
    Step("purchase", 24, "purchase"))

  test("sequential semantics: steps fire in order, inside their windows") {
    val df = events(
      (1L, 0, "view"), (1L, 5, "click"), (1L, 10, "purchase"), // full
      (2L, 0, "view"), (2L, 30, "click"),                      // click late
      (3L, 0, "click"), (3L, 1, "view"),                       // wrong order
      (4L, 0, "view"))                                         // stalls
    val r = run(df, vcp)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((4L, 1L, 1L)))
  }

  test("one event never satisfies two steps (distinct timestamps required)") {
    // user 1's click lands at the same instant as the view: step 2
    // requires ts STRICTLY after step 1, so it must not convert
    val df = events((1L, 0, "view"), (1L, 0, "click"))
    val r = run(df, vcp)
    assert((r.getLong(0), r.getLong(1)) === ((1L, 0L)))
  }

  test("step window is measured from the PREVIOUS step, not the first") {
    // view@0, click@20 (inside 24h), purchase@40 (20h after click —
    // inside ITS 24h window even though 40h after the view)
    val df = events((1L, 0, "view"), (1L, 20, "click"), (1L, 40, "purchase"))
    val r = run(df, vcp)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((1L, 1L, 1L)))
  }

  test("repeated step types re-enter: view -> view funnel") {
    val df = events((1L, 0, "view"), (1L, 3, "view"), (2L, 0, "view"))
    val r = run(df, Seq(Step("view", 0, "first"), Step("view", 24, "second")))
    assert((r.getLong(0), r.getLong(1)) === ((2L, 1L)))
  }

  test("bad configs are rejected at the API") {
    val df = events((1L, 0, "view"))
    intercept[IllegalArgumentException](run(df, Seq.empty))
    intercept[IllegalArgumentException](
      run(df, Seq(Step("view", 0, "a"), Step("click", 0, "b"))))
    intercept[IllegalArgumentException](
      run(df, Seq(Step("view'; --", 0, "a"))))
    intercept[IllegalArgumentException](
      run(df, Seq(Step("view", 0, "a"), Step("click", 24, "a"))))
  }

  /** Deterministic scalacheck sampling (the scalatest bridge isn't in
    * the offline cache) — same harness as PropertySpec. */
  private def forAll[T](g: Gen[T], trials: Int = 8)(body: T => Unit): Unit = {
    var seed = Seed(97L)
    (0 until trials).foreach { _ =>
      g.apply(Gen.Parameters.default, seed).foreach(body)
      seed = seed.next
    }
  }

  test("property: per-step counts are prefix-monotone (non-increasing)") {
    val types = Seq("view", "click", "purchase", "signup")
    val evGen = for {
      n <- Gen.choose(0, 60)
      rows <- Gen.listOfN(n, for {
        u <- Gen.choose(1L, 8L)
        h <- Gen.choose(0, 47)
        t <- Gen.oneOf(types)
      } yield (u, h, t))
    } yield rows
    val steps = Seq(Step("signup", 0, "s1"), Step("view", 24, "s2"),
      Step("click", 12, "s3"), Step("purchase", 6, "s4"))
    forAll(evGen) { rows =>
      val df = events(rows: _*)
      val r = run(df, steps)
      val counts = (0 until 4).map(r.getLong)
      counts.sliding(2).foreach { w =>
        assert(w(0) >= w(1), s"funnel counts not monotone: $counts")
      }
    }
  }
}
