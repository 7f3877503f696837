package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.GlobalRank

/** Distributed global ranking: closed forms must equal Spark's own
  * (single-partition) window functions, including tie semantics and
  * NTILE's balanced remainder buckets — and the plan must contain NO
  * unpartitioned window. */
class GlobalRankSpec extends SparkSpec {
  import spark.implicits._

  private def reference(df: org.apache.spark.sql.DataFrame) = {
    val byV = Window.orderBy("v")
    val byVId = Window.orderBy("v", "id")
    df.withColumn("row_number", row_number().over(byVId).cast("long"))
      .withColumn("rank", rank().over(byV).cast("long"))
      .withColumn("percent_rank", round(percent_rank().over(byV), 6))
      .withColumn("cume_dist", round(cume_dist().over(byV), 6))
      .withColumn("ntile", ntile(10).over(byVId))
  }

  private def collectRanks(df: org.apache.spark.sql.DataFrame) =
    df.select("id", "v", "row_number", "rank", "percent_rank",
        "cume_dist", "ntile")
      .as[(Long, Double, Long, Long, Double, Double, Int)]
      .collect().toSet

  test("all five rank columns equal the built-in window functions") {
    // heavy ties (v = i % 7) exercise rank/cume_dist peer semantics;
    // 103 % 10 != 0 exercises NTILE's remainder buckets
    val df = (1 to 103).map(i => (i.toLong, (i % 7).toDouble)).toDF("id", "v")
    val got = collectRanks(
      GlobalRank.withRanks(df, "v", "id", nTiles = 10)
        .withColumn("ntile", col("ntile").cast("int")))
    val want = collectRanks(reference(df))
    assert(got === want)

    // no-ties case and n < nTiles degenerate case
    val tiny = (1 to 7).map(i => (i.toLong, i.toDouble * 2)).toDF("id", "v")
    val got2 = collectRanks(
      GlobalRank.withRanks(tiny, "v", "id", nTiles = 10)
        .withColumn("ntile", col("ntile").cast("int")))
    assert(got2 === collectRanks(reference(tiny)))
  }

  test("the plan contains no unpartitioned window") {
    val df = (1 to 50).map(i => (i.toLong, (i % 5).toDouble)).toDF("id", "v")
    val q = GlobalRank.withRanks(df, "v", "id")
    q.collect()
    def windows(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.window.WindowExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        windows(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        windows(s.plan)
      case w: org.apache.spark.sql.execution.window.WindowExec =>
        w +: w.children.flatMap(windows)
      case _ => p.children.flatMap(windows)
    }
    val ws = windows(q.queryExecution.executedPlan)
    assert(ws.nonEmpty, "expected keyed windows in the plan")
    assert(ws.forall(_.partitionSpec.nonEmpty),
      "found an unpartitioned (single-partition) window")
  }

  test("NULL values are excluded from output and from n") {
    val df = Seq((1L, Some(1.0)), (2L, None), (3L, Some(2.0)))
      .toDF("id", "v")
    val got = GlobalRank.withRanks(df, "v", "id")
      .select("id", "rank", "cume_dist")
      .as[(Long, Long, Double)].collect().toSet
    // n = 2 (the null row neither appears nor shifts ranks)
    assert(got === Set((1L, 1L, 0.5), (3L, 2L, 1.0)))
  }

  test("empty input refuses; single row ranks trivially") {
    intercept[IllegalArgumentException] {
      GlobalRank.withRanks(
        Seq.empty[(Long, Double)].toDF("id", "v"), "v", "id")
    }
    val one = GlobalRank.withRanks(
        Seq((1L, 5.0)).toDF("id", "v"), "v", "id")
      .select("row_number", "rank", "percent_rank", "cume_dist", "ntile")
      .as[(Long, Long, Double, Double, Int)].collect().toSeq
    assert(one === Seq((1L, 1L, 0.0, 1.0, 1)))
  }
}
