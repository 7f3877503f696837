package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.Relational3

/** The two-phase bucketed weighted median (r21 optimization of
  * a_robust_outliers' wmedian) must equal the one-pass window form of
  * the house rank rule — smallest v whose cumulative weight reaches
  * (n+1) div 2 — on every fixture shape: even/odd totals, values AT
  * bucket boundaries (exact multiples of 1024), negatives, duplicate
  * values, and a group that fits entirely inside one bucket. */
class WeightedMedianSpec extends SparkSpec {
  import spark.implicits._

  private def referenceMedian(wdf: org.apache.spark.sql.DataFrame) =
    wdf
      .withColumn("cum",
        sum("w").over(Window.partitionBy("st").orderBy("v")))
      .withColumn("n", sum("w").over(Window.partitionBy("st")))
      .filter(col("cum") >= expr("(n + 1) div 2"))
      .groupBy("st").agg(min("v").as("m"))

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select("st", "m").as[(String, Double)].collect().toSet

  test("two-phase bucketed median equals the window form") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.newBuilder[(String, Double, Long)]
    // group A: wide domain incl. negatives and exact 1024 multiples
    (1 to 300).foreach { i =>
      val v = if (i % 17 == 0) (i / 17) * 1024.0
        else rnd.nextInt(200000) - 50000 + rnd.nextInt(100) / 100.0
      rows += (("A", v, 1L + rnd.nextInt(5)))
    }
    // group B: everything inside ONE bucket (domain < 1024)
    (1 to 40).foreach { i => rows += (("B", i * 3.25, 2L)) }
    // group C: two rows, even total (boundary of (n+1) div 2)
    rows += (("C", 10.0, 1L)); rows += (("C", 20.0, 1L))
    // group D: duplicate values across rows
    rows += (("D", 5.0, 1L)); rows += (("D", 5.0, 2L)); rows += (("D", 9.0, 1L))
    val wdf = rows.result().toDF("st", "v", "w")
    val got = canon(Relational3.weightedMedianByGroup(wdf, "m"))
    val want = canon(referenceMedian(wdf))
    assert(got === want)
    assert(got.size === 4)
    // pinned spot checks: C's k = (2+1) div 2 = 1 -> 10.0; D's k = 2 -> 5.0
    assert(got.contains(("C", 10.0)))
    assert(got.contains(("D", 5.0)))
  }
}
