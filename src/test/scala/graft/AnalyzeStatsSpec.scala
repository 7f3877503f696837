package graft

import org.apache.spark.sql.functions._

import graft.core.TxTable

/** ANALYZE column statistics (`TxTable.analyzeColumns` /
  * `CALL graft.analyze`) and their CBO surface: NDV + string lengths
  * declared in one metadata commit, served to Spark's optimizer as
  * `distinctCount`/`avgLen`/`maxLen` through the DSv2 scan. */
class AnalyzeStatsSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(tag: String): TxTable = {
    val dir = tmpDir(tag) + "/t"
    val data = (1L to 200L)
      .map(k => (k, k % 7L, s"name_${k % 13}", if (k % 10 == 0) null
        else s"g${k % 4}"))
      .toDF("k", "g", "nm", "grp")
    val t = new TxTable(spark, dir, data.schema, Seq("k"), numBuckets = 2)
    t.append(data)
    t
  }

  test("exact analyze stores true NDV + string lengths; roundtrip reads back") {
    val t = mkTable("analyze")
    val v = t.currentVersion
    val out = t.analyzeColumns(exact = true)
    assert(out("k").ndv === 200L)
    assert(out("g").ndv === 7L)
    assert(out("nm").ndv === 13L)
    assert(out("grp").ndv === 4L) // count(DISTINCT) ignores nulls
    // string lengths: name_0..name_12 -> max 7 bytes
    assert(out("nm").maxLen === Some(7L))
    assert(out("nm").avgLen.exists(x => x > 6.0 && x <= 7.0))
    assert(out("k").avgLen.isEmpty) // non-string: no length stats

    // the declaration is a metadata-only commit pinned at the
    // analyzed version
    val (ver, cols) = t.columnAnalysis.get
    assert(ver === v)
    assert(cols("g").ndv === 7L)
    assert(t.currentVersion === v + 1)
    assert(t.read.count() === 200L) // data untouched
  }

  test("approx analyze is one pass and lands within the rsd envelope") {
    val t = mkTable("analyze-ap")
    val out = t.analyzeColumns(Seq("k", "g"), exact = false, rsd = 0.05)
    assert(math.abs(out("k").ndv - 200L) <= 20L)
    assert(out("g").ndv >= 6L && out("g").ndv <= 8L)
  }

  test("CBO reads the declared NDV through the DSv2 scan") {
    val t = mkTable("analyze-cbo")
    t.analyzeColumns(exact = true)
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val df = spark.read.format("graft").load(t.dir).select("k", "g", "nm")
      val stats = df.queryExecution.optimizedPlan.stats
      assert(stats.rowCount.exists(_.toLong == 200L))
      val byName = stats.attributeStats.map { case (a, s) => a.name -> s }
      assert(byName("g").distinctCount.exists(_.toLong == 7L),
        s"expected NDV 7 for g, got ${byName.get("g")}")
      assert(byName("k").distinctCount.exists(_.toLong == 200L))
      // string column: lengths ride along even without zone-map extremes
      assert(byName("nm").distinctCount.exists(_.toLong == 13L))
      assert(byName("nm").maxLen.contains(7L))
      // zone-map extremes still present on the numeric key
      assert(byName("k").min.nonEmpty && byName("k").max.nonEmpty)
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
  }

  test("CALL graft.analyze declares stats through pure SQL") {
    val t = mkTable("analyze-sql")
    spark.conf.set(graft.sql.GraftCallCommand.AllowRawPathsKey, "true")
    try {
      val rows = spark.sql(
        s"CALL graft.analyze('${t.dir}', 'g,nm', 'exact')")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(rows("ndv_g") === "7")
      assert(rows("ndv_nm") === "13")
      val (_, cols) = t.columnAnalysis.get
      assert(cols.keySet === Set("g", "nm"))
    } finally
      spark.conf.unset(graft.sql.GraftCallCommand.AllowRawPathsKey)
  }

  test("CALL graft.maintenance auto-refreshes stale NDV by policy") {
    val t = mkTable("analyze-auto")
    spark.conf.set(graft.sql.GraftCallCommand.AllowRawPathsKey, "true")
    try {
      t.setTableProperties(Map("graft.autoAnalyze.staleVersions" -> "2"))
      def call(): Map[String, String] = spark.sql(
        s"CALL graft.maintenance('${t.dir}')")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      // no declaration yet: infinitely stale -> analyzed now
      assert(call()("analyzed_columns").toInt >= 4)
      val (ver1, _) = t.columnAnalysis.get
      // fresh declaration: below the 2-version staleness -> no-op
      assert(call()("analyzed_columns") === "0")
      assert(t.columnAnalysis.get._1 === ver1)
      // two more commits trip the threshold -> refreshed
      t.append(Seq((1001L, 1L, "a", "g0")).toDF("k", "g", "nm", "grp"))
      t.append(Seq((1002L, 2L, "b", "g1")).toDF("k", "g", "nm", "grp"))
      assert(call()("analyzed_columns").toInt >= 4)
      assert(t.columnAnalysis.get._1 > ver1)
      // a malformed property can never fail the scheduled CALL
      t.setTableProperties(Map("graft.autoAnalyze.staleVersions" -> "zz"))
      assert(call()("analyzed_columns") === "0")
    } finally
      spark.conf.unset(graft.sql.GraftCallCommand.AllowRawPathsKey)
  }

  test("autoAnalyze staleVersions=1 is stable on an idle table (no version churn)") {
    val t = mkTable("analyze-idle")
    spark.conf.set(graft.sql.GraftCallCommand.AllowRawPathsKey, "true")
    try {
      t.setTableProperties(Map("graft.autoAnalyze.staleVersions" -> "1"))
      def call(): Map[String, String] = spark.sql(
        s"CALL graft.maintenance('${t.dir}')")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(call()("analyzed_columns").toInt >= 4) // first: missing -> analyze
      val v = t.currentVersion
      // the stats commit leaves the declaration exactly 1 behind the
      // head; that must read as FRESH, or every scheduled call on an
      // idle table re-analyzes and commits forever
      assert(call()("analyzed_columns") === "0")
      assert(call()("analyzed_columns") === "0")
      assert(t.currentVersion === v, "idle maintenance must not commit")
      // one real data commit -> stale again
      t.append(Seq((2001L, 3L, "c", "g2")).toDF("k", "g", "nm", "grp"))
      assert(call()("analyzed_columns").toInt >= 4)
    } finally
      spark.conf.unset(graft.sql.GraftCallCommand.AllowRawPathsKey)
  }

  test("equi-height histograms compute, declare and round-trip") {
    val dir = tmpDir("analyze-hist") + "/t"
    // skew: 95% of rows carry g=0, the rest spread over 1..100
    val df = (1L to 2000L).map(k =>
      (k, if (k % 20 != 0) 0L else k % 100 + 1L)).toDF("k", "g")
    val t = new TxTable(spark, dir, df.schema, Seq("k"), numBuckets = 2)
    t.append(df)
    val out = t.analyzeColumns(exact = true, histogramBins = 5)
    val h = out("g").hist.get
    assert(h.bins.size === 5)
    assert(h.height === 2000.0 / 5)
    // the hot value occupies most bins (the skew the histogram is for)
    assert(h.bins.count { case (lo, hi, _) => lo == 0.0 && hi == 0.0 } >= 3)
    // tail bin reaches the max non-hot value (k%20==0 -> k%100+1,
    // max 81)
    assert(h.bins.last._2 === 81.0)
    // declaration round-trips through the metadata commit
    val (_, cols) = t.columnAnalysis.get
    val h2 = cols("g").hist.get
    assert(h2.height === h.height)
    assert(h2.bins === h.bins)
    // strings carry no histogram; ndv still declared
    assert(cols("k").hist.isDefined)
  }

  test("CBO attributeStats carry the histogram through the DSv2 scan") {
    val dir = tmpDir("analyze-hcbo") + "/t"
    val df = (1L to 1000L).map(k =>
      (k, if (k % 10 != 0) 0L else k % 50 + 1L)).toDF("k", "g")
    val t = new TxTable(spark, dir, df.schema, Seq("k"), numBuckets = 2)
    t.append(df)
    t.analyzeColumns(exact = true, histogramBins = 4)
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val rel = spark.read.format("graft").load(t.dir)
      val stats = rel.queryExecution.optimizedPlan.stats
      val gAttr = stats.attributeStats.keys.find(_.name == "g").get
      val cs = stats.attributeStats(gAttr)
      assert(cs.histogram.isDefined,
        "the declared histogram must reach catalyst attributeStats")
      assert(cs.histogram.get.bins.length === 4)
      assert(cs.distinctCount.isDefined)
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
  }

  test("the histogram flips the join side on a skewed filter (plan-asserted)") {
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
    // same data twice: one table NDV-only, one with a histogram. A
    // filter pinning the HOT value estimates rows/ndv under
    // uniformity (tiny -> broadcast the filtered side) but the hot
    // bin's true mass with a histogram (big -> shuffle join). The
    // histogram is what saves the cluster from broadcasting a hot
    // key's multi-GB slice at 100 TB.
    def mkSkew(tag: String): TxTable = {
      val dir = tmpDir(tag) + "/t"
      // hot value 0 on 95% of rows; the REST are distinct, so the
      // column's NDV is high and the uniform estimate of g=0 is tiny
      val df = (1L to 50000L).map(k =>
        (k, if (k % 20 != 0) 0L else k)).toDF("k", "g")
      val t = new TxTable(spark, dir, df.schema, Seq("k"), numBuckets = 2)
      t.append(df)
      t
    }
    val plain = mkSkew("analyze-flipA")
    plain.analyzeColumns(Seq("g", "k"), exact = true) // NDV only
    val histed = mkSkew("analyze-flipB")
    histed.analyzeColumns(Seq("g", "k"), exact = true, histogramBins = 5)
    val otherDir = tmpDir("analyze-flipC") + "/t"
    val odf = (1L to 50000L).map(k => (k, k * 2.0)).toDF("k", "v")
    val other = new TxTable(spark, otherDir, odf.schema, Seq("k"),
      numBuckets = 2)
    other.append(odf)

    spark.conf.set("spark.sql.cbo.enabled", "true")
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "51200") // 50 KB
    try {
      def joinPlan(t: TxTable): org.apache.spark.sql.execution.SparkPlan = {
        val a = spark.read.format("graft").load(t.dir)
          .filter(col("g") === 0L)
        val b = spark.read.format("graft").load(other.dir)
        a.join(b, "k").queryExecution.sparkPlan
      }
      val uniform = joinPlan(plain)
      val skewAware = joinPlan(histed)
      assert(uniform.collect { case j: BroadcastHashJoinExec => j }.nonEmpty,
        s"NDV-only stats should estimate the hot-value filter tiny and " +
          s"broadcast it:\n$uniform")
      assert(skewAware.collect { case j: SortMergeJoinExec => j }.nonEmpty,
        s"the histogram should reveal the hot value's mass and refuse " +
          s"the broadcast:\n$skewAware")
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
    }
  }

  test("autoAnalyze refresh keeps histograms when the bins property is set") {
    val t = mkTable("analyze-hbins")
    spark.conf.set(graft.sql.GraftCallCommand.AllowRawPathsKey, "true")
    try {
      t.setTableProperties(Map(
        "graft.autoAnalyze.staleVersions" -> "1",
        "graft.autoAnalyze.histogramBins" -> "4"))
      spark.sql(s"CALL graft.maintenance('${t.dir}')").collect()
      val (_, cols) = t.columnAnalysis.get
      assert(cols("g").hist.exists(_.bins.size == 4),
        "a scheduled refresh must not downgrade to NDV-only")
      assert(cols("nm").hist.isEmpty) // strings carry no histogram
    } finally
      spark.conf.unset(graft.sql.GraftCallCommand.AllowRawPathsKey)
  }

  test("re-analyze replaces the declaration; unknown column refuses") {
    val t = mkTable("analyze-re")
    t.analyzeColumns(Seq("g"), exact = true)
    assert(t.columnAnalysis.get._2.keySet === Set("g"))
    t.append(Seq((1000L, 99L, "zz", "g9")).toDF("k", "g", "nm", "grp"))
    t.analyzeColumns(Seq("g", "k"), exact = true)
    val (ver, cols) = t.columnAnalysis.get
    assert(cols.keySet === Set("g", "k"))
    assert(cols("g").ndv === 8L) // 0..6 plus 99
    assert(ver === t.currentVersion - 1)
    val e = intercept[IllegalArgumentException] {
      t.analyzeColumns(Seq("nope"))
    }
    assert(e.getMessage.contains("not in the schema"))
  }
}
