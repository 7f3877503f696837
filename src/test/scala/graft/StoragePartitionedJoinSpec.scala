package graft

import org.apache.spark.sql.functions._

import graft.core.TxTable

/** Storage-partitioned joins: two graft tables sharing keys and
  * bucket count, loaded through the catalog with
  * `spark.sql.graft.preserveDataGrouping`, must join with ZERO
  * shuffle on either side — Spark proves co-location by resolving
  * both sides' reported `bucket(n, keys…)` transform through the
  * catalog's function ([[graft.sources.GraftBucketFunction]]). At
  * 100 TB the fact-to-fact join shuffle is usually the plan's
  * largest cost; co-located layouts erase it. */
class StoragePartitionedJoinSpec extends SparkSpec {
  import spark.implicits._

  private def withSpj[A](body: => A): A = {
    val confs = Seq(
      "spark.sql.graft.preserveDataGrouping" -> "true",
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("co-bucketed equi-join runs with zero shuffle; results exact") {
    val root = tmpDir("graft-spj")
    val left = (1L to 400L).map(i => (i, s"l$i", i * 0.5))
      .toDF("k", "name", "v")
    val right = (200L to 600L).map(i => (i, i % 7L)).toDF("k", "g")
    val tl = new TxTable(spark, s"$root/l", left.schema, Seq("k"),
      numBuckets = 4)
    tl.append(left)
    val tr = new TxTable(spark, s"$root/r", right.schema, Seq("k"),
      numBuckets = 4)
    tr.append(right)
    spark.conf.set("spark.sql.catalog.spj", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.spj.root", root)

    withSpj {
      // no ORDER BY: the join itself must plan with ZERO Exchange
      val q = spark.sql(
        "SELECT l.k, l.v, r.g FROM spj.l l JOIN spj.r r ON l.k = r.k")
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"expected a shuffle-free storage-partitioned join:\n$plan")
      assert(plan.contains("SortMergeJoin"))
      val got = q.collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).sorted
      val exp = left.join(right, "k")
        .collect().map(r => (r.getLong(0), r.getDouble(2), r.getLong(3)))
        .sorted
      assert(got.toSeq === exp.toSeq)
    }

    // different bucket counts: co-location can't be proven — Spark
    // must fall back to a shuffled join with identical results
    val tr8 = new TxTable(spark, s"$root/r8", right.schema, Seq("k"),
      numBuckets = 8)
    tr8.append(right)
    withSpj {
      val q = spark.sql(
        "SELECT count(*) FROM spj.l l JOIN spj.r8 r ON l.k = r.k")
      assert(q.queryExecution.executedPlan.toString.contains("Exchange"))
      assert(q.head().getLong(0) === 201L)
    }

    // conf off: plain file-per-partition scans, shuffled join, same rows
    val q2 = spark.sql(
      "SELECT count(*) FROM spj.l l JOIN spj.r r ON l.k = r.k")
    assert(q2.head().getLong(0) === 201L)
  }

  test("grouped partitions still serve DV-masked and columnar reads") {
    val root = tmpDir("graft-spj-dv")
    val a = (1L to 100L).map(i => (i, i * 2.0)).toDF("k", "v")
    val b = (1L to 100L).map(i => (i, s"s$i")).toDF("k", "s")
    val ta = new TxTable(spark, s"$root/a", a.schema, Seq("k"), numBuckets = 2)
    ta.append(a)
    ta.deleteWhereLight(col("k") % 10 === 0) // DVs on the left side
    val tb = new TxTable(spark, s"$root/b", b.schema, Seq("k"), numBuckets = 2)
    tb.append(b)
    spark.conf.set("spark.sql.catalog.spjdv", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.spjdv.root", root)

    withSpj {
      val q = spark.sql(
        "SELECT a.k, a.v, b.s FROM spjdv.a a JOIN spjdv.b b ON a.k = b.k")
      assert(!q.queryExecution.executedPlan.toString.contains("Exchange"))
      val rows = q.collect()
      assert(rows.length === 90) // the DV'd multiples of 10 are gone
      assert(rows.forall(_.getLong(0) % 10 != 0))
    }
  }

  test("groupBy on the bucket key aggregates with zero shuffle") {
    val root = tmpDir("graft-spj-agg")
    val left = (1L to 200L).map(i => (i, i * 0.5)).toDF("k", "v")
    val tl = new TxTable(spark, s"$root/l", left.schema, Seq("k"),
      numBuckets = 4)
    tl.append(left)
    spark.conf.set("spark.sql.catalog.spja", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.spja.root", root)
    withSpj {
      // KeyGroupedPartitioning satisfies the aggregation's clustered
      // distribution: partial+final collapse into ONE stage, no
      // Exchange — a keyed rollup over a 100 TB table pays no shuffle
      val agg = spark.sql("SELECT k, sum(v) AS s FROM spja.l GROUP BY k")
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"expected a shuffle-free keyed aggregation:\n$plan")
      assert(agg.collect().map(r => (r.getLong(0), r.getDouble(1))).sorted
        .take(3).toSeq === Seq((1L, 0.5), (2L, 1.0), (3L, 1.5)))
    }
  }

  test("mixed join: only the non-graft side shuffles, INTO our buckets") {
    val root = tmpDir("graft-spj-mix")
    val left = (1L to 200L).map(i => (i, i * 0.5)).toDF("k", "v")
    val tl = new TxTable(spark, s"$root/l", left.schema, Seq("k"),
      numBuckets = 4)
    tl.append(left)
    spark.conf.set("spark.sql.catalog.spjm", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.spjm.root", root)
    withSpj {
      spark.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", "true")
      try {
        (1L to 100L).map(i => (i, i)).toDF("k", "x")
          .createOrReplaceTempView("spj_plain")
        val j = spark.sql(
          "SELECT l.k, l.v FROM spjm.l l JOIN spj_plain p ON l.k = p.k")
        val plan = j.queryExecution.executedPlan.toString
        // exactly one Exchange — keygroupedpartitioning on the plain
        // side (re-bucketed by GraftBucketFunction.produceResult);
        // the graft side never moves
        assert(plan.split("Exchange").length == 2 &&
          plan.contains("keygroupedpartitioning"),
          s"expected one keygrouped Exchange on the plain side:\n$plan")
        assert(j.count() === 100L)
        // row-correct co-location: every key matched exactly once
        assert(j.collect().map(_.getLong(0)).sorted.toSeq ===
          (1L to 100L).toSeq)
      } finally spark.conf
        .unset("spark.sql.sources.v2.bucketing.shuffle.enabled")
    }
  }

  test("SPJ survives AQE: the final adaptive plan stays shuffle-free") {
    val root = tmpDir("graft-spj-aqe")
    val l = (1L to 200L).map(i => (i, i * 0.5)).toDF("k", "v")
    val r = (1L to 200L).map(i => (i, i % 5L)).toDF("k", "g")
    val tl = new TxTable(spark, s"$root/l", l.schema, Seq("k"), numBuckets = 4)
    tl.append(l)
    val tr = new TxTable(spark, s"$root/r", r.schema, Seq("k"), numBuckets = 4)
    tr.append(r)
    spark.conf.set("spark.sql.catalog.aqespj", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.aqespj.root", root)
    val confs = Seq(
      "spark.sql.graft.preserveDataGrouping" -> "true",
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val q = spark.sql(
        "SELECT l.k FROM aqespj.l l JOIN aqespj.r r ON l.k = r.k")
      // drive q's OWN QueryExecution (count() would plan a separate
      // one and leave q's adaptive plan unexecuted = assertion vacuous)
      assert(q.collect().length === 200)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), plan.take(200))
      assert(!plan.contains("Exchange"),
        s"SPJ must survive adaptive re-planning:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
