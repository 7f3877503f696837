package graft

import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.TxTable
import graft.ext.IncrementalView
import graft.plans.{MvCatalog, MvRewrite}

/** Transparent materialized-view routing: aggregate queries over a
  * TxTable's files must be rewritten onto a registered, FRESH
  * IncrementalView — and must NOT be rewritten when the view is stale,
  * the file set differs (time travel), deletion vectors are live, or
  * the aggregate shape is unsupported. Rewritten results must equal
  * the unrewritten ones bit-for-bit (integral data, so sums/avgs are
  * exact).
  */
class MvRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def mkSource(): TxTable = {
    val t = new TxTable(spark, tmpDir("mvr") + "/src", StructType(Seq(
      StructField("k", StringType), StructField("g", StringType),
      StructField("r", StringType), StructField("v", LongType),
      StructField("w", LongType))), Seq("k"), numBuckets = 4)
    t.append((1 to 60).map(i =>
      (s"k$i", s"g${i % 5}", s"r${i % 2}", i.toLong,
        if (i % 7 == 0) None else Some(i.toLong * 2)))
      .toDF("k", "g", "r", "v", "w"))
    t
  }

  private def mkView(t: TxTable): IncrementalView = {
    val view = new IncrementalView(spark, t, tmpDir("mvrv") + "/v",
      Seq("g", "r"), Seq("v", "w"), numBuckets = 2)
    view.refresh()
    view
  }

  /** Run `df`'s plan through MvRewrite and execute the result. */
  private def routed(df: DataFrame): (Boolean, Set[Row]) = {
    val before = df.queryExecution.analyzed
    val after = MvRewrite(before)
    (after ne before, GraftSqlBridge.ofRows(spark, after).collect().toSet)
  }
  private type Row = org.apache.spark.sql.Row

  /** Every file the (rewritten) plan scans lives under the view dir —
    * asserted on the optimized LOGICAL plan (AQE wraps physical plans
    * with shuffles, hiding scan leaves from collectLeaves). */
  private def scansViewNot(df: DataFrame, view: IncrementalView): Boolean =
    scanFiles(GraftSqlBridge.ofRows(spark,
      MvRewrite(df.queryExecution.analyzed))).forall(_.contains(view.dir))

  private def scanFiles(df: DataFrame): Seq[String] = {
    val fs = df.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.inputFiles.toSeq
          case _ => Nil
        }
    }.flatten
    assert(fs.nonEmpty, "plan scans no files at all")
    fs
  }

  test("exact-group aggregate rewrites to a view scan with identical results") {
    val t = mkSource()
    val view = mkView(t)
    MvCatalog.clear(); MvCatalog.register(view)
    try {
      val q = t.read.groupBy("g", "r").agg(
        count(lit(1)).as("n"), sum("v").as("sv"),
        sum("w").as("sw"), count(col("w")).as("nw"),
        avg("v").as("av"))
      val (hit, got) = routed(q)
      assert(hit, "rewrite did not fire")
      assert(scansViewNot(q, view), "rewritten plan still scans the source")
      MvCatalog.clear()
      assert(got === q.collect().toSet)
    } finally MvCatalog.clear()
  }

  test("subset grouping re-aggregates the view; filters on group cols push") {
    val t = mkSource()
    val view = mkView(t)
    MvCatalog.clear(); MvCatalog.register(view)
    try {
      val q = t.read.filter(col("r") === "r1").groupBy("g")
        .agg(count(lit(1)).as("n"), sum("w").as("sw"), avg("w").as("aw"))
      val (hit, got) = routed(q)
      assert(hit, "rewrite did not fire")
      assert(scansViewNot(q, view), "rewritten plan still scans the source")
      MvCatalog.clear()
      assert(got === q.collect().toSet)
    } finally MvCatalog.clear()
  }

  test("global (no grouping) aggregate also routes") {
    val t = mkSource()
    val view = mkView(t)
    MvCatalog.clear(); MvCatalog.register(view)
    try {
      val q = t.read.agg(count(lit(1)).as("n"), sum("v").as("sv"))
      val (hit, got) = routed(q)
      assert(hit, "rewrite did not fire")
      MvCatalog.clear()
      assert(got === q.collect().toSet)
    } finally MvCatalog.clear()
  }

  test("NULL semantics survive the route: all-null group sums read NULL") {
    val t = new TxTable(spark, tmpDir("mvrn") + "/src", StructType(Seq(
      StructField("k", StringType), StructField("g", StringType),
      StructField("v", LongType))), Seq("k"), numBuckets = 2)
    t.append(Seq(("a", "g1", Some(5L)), ("b", "g1", None),
      ("c", "g2", None), ("d", "g2", None)).toDF("k", "g", "v"))
    val view = new IncrementalView(spark, t, tmpDir("mvrnv") + "/v",
      Seq("g"), Seq("v"), numBuckets = 2)
    view.refresh()
    MvCatalog.clear(); MvCatalog.register(view)
    try {
      val q = t.read.groupBy("g").agg(
        sum("v").as("sv"), count(col("v")).as("nv"), avg("v").as("av"))
      val (hit, got) = routed(q)
      assert(hit)
      MvCatalog.clear()
      assert(got === q.collect().toSet)
      // and the NULL really is there: g2 is all-null
      assert(got.exists(r => r.getString(0) == "g2" && r.isNullAt(1)
        && r.getLong(2) == 0L && r.isNullAt(3)))
    } finally MvCatalog.clear()
  }

  test("stale view does not serve; after refresh it does") {
    val t = mkSource()
    val view = mkView(t)
    MvCatalog.clear(); MvCatalog.register(view)
    try {
      t.append(Seq(("kz", "g0", "r0", 1000L, 1L)).toDF("k", "g", "r", "v", "w"))
      val q = t.read.groupBy("g").agg(sum("v").as("sv"))
      assert(!routed(q)._1, "stale view must not serve a rewrite")
      view.refresh()
      val q2 = t.read.groupBy("g").agg(sum("v").as("sv"))
      val (hit, got) = routed(q2)
      assert(hit, "fresh view should serve again")
      MvCatalog.clear()
      assert(got === q2.collect().toSet)
    } finally MvCatalog.clear()
  }

  test("time-travel reads and unsupported aggregates are left alone") {
    val t = mkSource()
    val v0 = t.currentVersion
    t.append(Seq(("ky", "g1", "r1", 999L, 2L)).toDF("k", "g", "r", "v", "w"))
    val view = mkView(t)
    MvCatalog.clear(); MvCatalog.register(view)
    try {
      // old version's file set ≠ current live set → no rewrite
      val tt = t.readVersion(v0).groupBy("g").agg(sum("v").as("sv"))
      assert(!routed(tt)._1, "time-travel read must not route to the view")
      // max() is not derivable from the view → no rewrite
      val mx = t.read.groupBy("g").agg(max("v").as("mv"))
      assert(!routed(mx)._1)
      // distinct counts are not derivable → no rewrite
      val dc = t.read.groupBy("g").agg(countDistinct("v").as("dv"))
      assert(!routed(dc)._1)
      // filter on a NON-group column → no rewrite
      val fv = t.read.filter(col("v") > 10).groupBy("g").agg(sum("v").as("sv"))
      assert(!routed(fv)._1)
      // a SKETCH-tracking view must still decline COUNT(DISTINCT):
      // the stored estimate is approximate, the query asks for exact —
      // routing would silently change the answer
      val vd = new IncrementalView(spark, t, tmpDir("mvrd") + "/v",
        Seq("g", "r"), Seq("v"), numBuckets = 2, distinctCols = Seq("w"))
      vd.refresh()
      MvCatalog.register(vd)
      val dc2 = t.read.groupBy("g").agg(countDistinct("w").as("dw"))
      assert(!routed(dc2)._1,
        "approximate sketch must never serve exact COUNT(DISTINCT)")
    } finally MvCatalog.clear()
  }

  test("live deletion vectors disqualify the source match") {
    val t = mkSource()
    val view = mkView(t)
    // merge-on-read delete: manifest now carries DVs; a raw file scan
    // is NOT the table, so even a refreshed view must not match it
    t.deleteWhereLight(col("v") === 3L)
    view.refresh()
    MvCatalog.clear(); MvCatalog.register(view)
    try {
      assert(t.liveFileSet.isEmpty, "DV-carrying version must not expose a file set")
      val q = t.read.groupBy("g").agg(sum("v").as("sv"))
      assert(!routed(q)._1)
    } finally MvCatalog.clear()
  }

  test("min/max route from a tracking view (exact + re-aggregated), untracked declines") {
    val t = mkSource()
    val view = new IncrementalView(spark, t, tmpDir("mvmm") + "/v",
      Seq("g", "r"), Seq("v", "w"), numBuckets = 2, minMaxCols = Seq("v"))
    view.refresh()
    MvCatalog.clear(); MvCatalog.register(view)
    try {
      // exact grouping: extrema read straight off min_v/max_v
      val q = t.read.groupBy("g", "r").agg(
        min("v").as("mnv"), max("v").as("mxv"), sum("v").as("sv"))
      val (hit, got) = routed(q)
      assert(hit, "min/max rewrite did not fire on exact grouping")
      assert(scansViewNot(q, view), "rewritten plan still scans the source")
      MvCatalog.clear()
      assert(got === q.collect().toSet)

      // subset grouping: Min(min_v)/Max(max_v) re-aggregation
      MvCatalog.register(view)
      val q2 = t.read.groupBy("g").agg(max("v").as("mxv"), min("v").as("mnv"))
      val (hit2, got2) = routed(q2)
      assert(hit2, "min/max rewrite did not fire on subset grouping")
      MvCatalog.clear()
      assert(got2 === q2.collect().toSet)

      // an extremum on an UNTRACKED column still declines
      MvCatalog.register(view)
      assert(!routed(t.read.groupBy("g").agg(max("w").as("mw")))._1)
    } finally MvCatalog.clear()
  }

  test("HAVING / post-aggregate filters still route the inner aggregate") {
    val t = mkSource()
    val view = mkView(t)
    MvCatalog.clear(); MvCatalog.register(view)
    try {
      // DataFrame post-agg filter (the dashboard HAVING shape)
      val q = t.read.groupBy("g", "r")
        .agg(count(lit(1)).as("n"), sum("v").as("sv"))
        .filter(col("sv") > lit(100L) && col("n") > lit(2L))
      val (hit, got) = routed(q)
      assert(hit, "rewrite did not fire under a post-aggregate filter")
      assert(scansViewNot(q, view), "rewritten plan still scans the source")
      MvCatalog.clear()
      assert(got === q.collect().toSet)
      assert(got.nonEmpty)
    } finally MvCatalog.clear()
  }

  test("sql HAVING on an aggregate absent from the select list routes") {
    val t = mkSource()
    val view = mkView(t)
    MvCatalog.clear(); MvCatalog.register(view)
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ MvRewrite
    try {
      t.read.createOrReplaceTempView("mv_src_having")
      val sql =
        "SELECT g, sum(v) AS sv FROM mv_src_having GROUP BY g HAVING count(*) > 10"
      val q = spark.sql(sql)
      val files = scanFiles(q)
      assert(files.forall(_.contains(view.dir)),
        s"HAVING query still scans the source: $files")
      val got = q.collect().toSet
      spark.experimental.extraOptimizations = prev
      MvCatalog.clear()
      assert(got === spark.sql(sql).collect().toSet)
      assert(got.nonEmpty)
    } finally {
      spark.experimental.extraOptimizations = prev
      MvCatalog.clear()
    }
  }

  test("end-to-end: a spark.sql query over a registered temp view routes") {
    val t = mkSource()
    val view = mkView(t)
    MvCatalog.clear(); MvCatalog.register(view)
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ MvRewrite
    try {
      t.read.createOrReplaceTempView("mv_src_e2e")
      val q = spark.sql(
        "SELECT g, count(*) AS n, sum(v) AS sv FROM mv_src_e2e GROUP BY g")
      val files = scanFiles(q)
      assert(files.forall(_.contains(view.dir)),
        s"sql query still scans the source: $files")
      val got = q.collect().toSet
      spark.experimental.extraOptimizations = prev
      MvCatalog.clear()
      assert(got === spark.sql(
        "SELECT g, count(*) AS n, sum(v) AS sv FROM mv_src_e2e GROUP BY g")
        .collect().toSet)
    } finally {
      spark.experimental.extraOptimizations = prev
      MvCatalog.clear()
    }
  }

  test("join aggregate routes: view joins the dim, fact never scanned") {
    val t = mkSource()
    val view = mkView(t) // grouped by (g, r) — g is the join key
    MvCatalog.clear(); MvCatalog.register(view)
    try {
      // g1 appears TWICE in the dim: the rewrite must stay correct
      // under dim-side multiplicity (each view group replicates per
      // dim match exactly as its fact rows would have)
      val dim = Seq(("g0", "zero"), ("g1", "one"), ("g1", "uno"),
        ("g2", "two"), ("g3", "three")).toDF("gk", "name")
      val q = t.read.join(dim, col("g") === col("gk"))
        .groupBy("name")
        .agg(count(lit(1)).as("n"), sum("v").as("sv"),
          count(col("w")).as("nw"), avg("v").as("av"))
      val (hit, got) = routed(q)
      assert(hit, "join rewrite did not fire")
      assert(scansViewNot(q, view), "rewritten plan still scans the fact")
      MvCatalog.clear()
      assert(got === q.collect().toSet)
      assert(got.nonEmpty)
    } finally MvCatalog.clear()
  }

  test("join aggregate with fact-side and post-join filters routes; mixed grouping") {
    val t = mkSource()
    val view = mkView(t)
    MvCatalog.clear(); MvCatalog.register(view)
    try {
      val dim = Seq(("g0", "zero"), ("g1", "one"), ("g2", "two"))
        .toDF("gk", "name")
      val q = t.read.filter(col("r") === "r1") // fact group-col filter
        .join(dim, col("g") === col("gk"))
        .filter(col("name") =!= "two") // dim filter above the join
        .groupBy("name", "g") // dim col + fact group col
        .agg(sum("v").as("sv"), count(lit(1)).as("n"))
      val (hit, got) = routed(q)
      assert(hit, "join rewrite did not fire")
      assert(scansViewNot(q, view), "rewritten plan still scans the fact")
      MvCatalog.clear()
      assert(got === q.collect().toSet)
      assert(got.nonEmpty)
    } finally MvCatalog.clear()
  }

  test("join aggregate under HAVING routes: subset grouping + post-agg filter") {
    val t = mkSource()
    val view = mkView(t) // groups by (g, r); query groups by a SUBSET
    MvCatalog.clear(); MvCatalog.register(view)
    try {
      val dim = Seq(("g0", "zero"), ("g1", "one"), ("g2", "two"))
        .toDF("gk", "name")
      // HAVING sits ABOVE the aggregate, mixing an aggregate predicate
      // with a group-column predicate; pinned output attr ids make the
      // rewrite transparent to it
      val q = t.read.join(dim, col("g") === col("gk"))
        .groupBy("name")
        .agg(count(lit(1)).as("n"), sum("v").as("sv"), avg("v").as("av"))
        .filter(col("n") > 2 && col("name") =!= "two")
      val (hit, got) = routed(q)
      assert(hit, "join+HAVING rewrite did not fire")
      assert(scansViewNot(q, view), "rewritten plan still scans the fact")
      MvCatalog.clear()
      assert(got === q.collect().toSet)
      assert(got.nonEmpty)
    } finally MvCatalog.clear()
  }

  test("dim-side aggregates route in cnt-weighted form (NULL dim values included)") {
    val t = mkSource()
    val view = mkView(t)
    MvCatalog.clear(); MvCatalog.register(view)
    try {
      // g1 duplicated AND a NULL weight: SUM/COUNT must weight by the
      // group's fact-row count, skip NULLs, and survive multiplicity
      val dim = Seq(("g0", Some(1L)), ("g1", Some(2L)), ("g1", None),
        ("g2", Some(3L)), ("g4", None)).toDF("gk", "wt")
      val q = t.read.join(dim, col("g") === col("gk"))
        .groupBy("g")
        .agg(sum("wt").as("sw"), count(col("wt")).as("nw"),
          avg("wt").as("aw"), min("wt").as("mn"), max("wt").as("mx"),
          count(lit(1)).as("n"), sum("v").as("sv"))
      val (hit, got) = routed(q)
      assert(hit, "dim-side aggregate rewrite did not fire")
      assert(scansViewNot(q, view), "rewritten plan still scans the fact")
      MvCatalog.clear()
      assert(got === q.collect().toSet)
      assert(got.nonEmpty)
      // g4's weight is all-NULL: sum/avg NULL, count 0 — like a recompute
      assert(got.exists(r => r.getString(0) == "g4" && r.isNullAt(1)
        && r.getLong(2) == 0L && r.isNullAt(3)))
    } finally MvCatalog.clear()
  }

  test("join rewrite declines unsupported shapes (never wrong, allowed to decline)") {
    val t = mkSource()
    val view = mkView(t)
    MvCatalog.clear(); MvCatalog.register(view)
    try {
      val dim = Seq(("g0", 1L), ("g1", 2L), ("g2", 3L)).toDF("gk", "wt")
      def declines(q: DataFrame, why: String): Unit =
        assert(!routed(q)._1, s"join rewrite must decline: $why")
      declines(t.read.join(dim, col("g") === col("gk"))
        .groupBy("gk").agg(sum(col("wt") * col("v")).as("sw")),
        "mixed fact×dim aggregate argument")
      declines(t.read.join(dim, col("g") === col("gk"))
        .filter(col("v") > 3).groupBy("gk").agg(count(lit(1)).as("n")),
        "filter on a non-group fact column")
      declines(t.read.join(dim, col("k") === col("gk"))
        .groupBy("gk").agg(count(lit(1)).as("n")),
        "join key is not a view group column")
      declines(t.read.join(dim, col("g") === col("gk"), "left_outer")
        .groupBy("gk").agg(count(lit(1)).as("n")),
        "outer join changes multiplicity for unmatched groups")
    } finally MvCatalog.clear()
  }
}
