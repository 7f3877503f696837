package graft

import org.apache.spark.sql.functions._

import graft.core.{DeltaExport, IcebergExport, TxTable}

/** Statistics on the FOREIGN-scan TVFs: `graft_delta_scan` /
  * `graft_iceberg_scan` attach catalog statistics (exact row count
  * from log/manifest metadata, Puffin NDV when published) to their
  * single parquet relation, so joins over imported trees get the
  * same broadcast planning native graft scans get. The headline
  * assertion is the planner FLIP: a small-but-wide foreign dim that
  * sort-merge-joins on raw file size broadcasts under
  * `spark.sql.cbo.enabled`, because the CBO re-sizes the dim as
  * rowCount × row width instead of total compressed bytes. */
class ForeignScanStatsSpec extends SparkSpec {
  import spark.implicits._

  private def planOf(sql: String): String = {
    val df = spark.sql(sql)
    df.collect() // finalize any adaptive plan
    df.queryExecution.executedPlan.toString
  }

  private def withConfs(kvs: (String, String)*)(body: => Unit): Unit = {
    val olds = kvs.map { case (k, _) =>
      k -> scala.util.Try(spark.conf.get(k)).toOption }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("delta dim: CBO row count flips the join from SMJ to broadcast") {
    val dir = tmpDir("fstats-delta") + "/t"
    // 4000 rows, incompressible ~512B pad: the parquet FILE is large
    // (~1 MB — over the broadcast threshold below), but the TRUE row
    // count is tiny. Raw file size says "too big to broadcast"; the
    // row count says otherwise.
    val dim = spark.range(0L, 4000L).select(col("id").as("k"),
      concat(Seq.tabulate(16)(i =>
        md5(concat_ws("-", col("id"), lit(i)))): _*).as("pad"))
    val t = new TxTable(spark, dir, dim.schema, Seq("k"), numBuckets = 1)
    t.append(dim)
    DeltaExport.writeDeltaLog(spark, t)
    val fileBytes = t.read.inputFiles.map(f =>
      new java.io.File(new java.net.URI(f)).length()).sum
    assert(fileBytes > 300000L, s"fixture too small ($fileBytes B)")

    val q = "SELECT f.id, d.pad FROM range(0, 1000000) f " +
      s"JOIN graft_delta_scan('$dir') d ON f.id = d.k"
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "262144",
      "spark.sql.adaptive.enabled" -> "false") {
      // blind planning (no CBO): the dim subtree weighs its full
      // compressed file size -> over threshold -> sort-merge
      withConfs("spark.sql.cbo.enabled" -> "false") {
        assert(planOf(q).contains("SortMergeJoin"),
          "expected SMJ when only file-size stats exist")
      }
      // CBO: catalog rowCount sizes the dim as 4000 x row width ->
      // under threshold -> broadcast
      withConfs("spark.sql.cbo.enabled" -> "true") {
        val p = planOf(q)
        assert(p.contains("BroadcastHashJoin"),
          s"expected broadcast under CBO, got:\n$p")
      }
    }
    // the attached statistics are EXACT, not file-size heuristics
    withConfs("spark.sql.cbo.enabled" -> "true") {
      val df = spark.sql(s"SELECT * FROM graft_delta_scan('$dir')")
      assert(df.queryExecution.optimizedPlan.stats.rowCount ===
        Some(BigInt(4000)))
    }
  }

  test("delta dim with DVs: masked shape keeps native stats (no double count)") {
    val dir = tmpDir("fstats-dv") + "/t"
    val dim = spark.range(0L, 100L).select(col("id").as("k"),
      col("id").cast("double").as("v"))
    val t = new TxTable(spark, dir, dim.schema, Seq("k"), numBuckets = 1)
    t.append(dim)
    t.deleteWhereLight(col("k") % 10 === 0)
    DeltaExport.syncDeltaLog(spark, t)
    // the DV-masked plan (union/anti-join legs) must not get table
    // totals attached per leg; the scan still answers correctly
    withConfs("spark.sql.cbo.enabled" -> "true") {
      assert(spark.sql(
        s"SELECT count(*) FROM graft_delta_scan('$dir')")
        .head.getLong(0) === 90L)
    }
  }

  test("iceberg dim: manifest row count + published Puffin NDV reach the CBO") {
    val dir = tmpDir("fstats-ice") + "/t"
    val dim = spark.range(0L, 2000L).select(col("id").as("k"),
      (col("id") % 50L).as("grp"),
      concat(Seq.tabulate(8)(i =>
        md5(concat_ws("-", col("id"), lit(i)))): _*).as("pad"))
    val t = new TxTable(spark, dir, dim.schema, Seq("k"), numBuckets = 1)
    t.append(dim)
    IcebergExport.writeIcebergMetadata(spark, t)
    IcebergExport.writeStatistics(spark, t)
    IcebergExport.writeIcebergMetadata(spark, t) // declare the stats
    withConfs("spark.sql.cbo.enabled" -> "true") {
      val df = spark.sql(s"SELECT * FROM graft_iceberg_scan('$dir')")
      val stats = df.queryExecution.optimizedPlan.stats
      assert(stats.rowCount === Some(BigInt(2000)))
      val ndv = stats.attributeStats.toSeq.map { case (a, s) =>
        a.name -> s.distinctCount }.toMap
      // theta sketches are exact at this cardinality
      assert(ndv.get("k").flatten === Some(BigInt(2000)))
      assert(ndv.get("grp").flatten === Some(BigInt(50)))
    }
    // and the broadcast flip, same shape as the delta case
    val q = "SELECT f.id, d.pad FROM range(0, 1000000) f " +
      s"JOIN graft_iceberg_scan('$dir') d ON f.id = d.k"
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "131072",
      "spark.sql.adaptive.enabled" -> "false") {
      withConfs("spark.sql.cbo.enabled" -> "false") {
        assert(planOf(q).contains("SortMergeJoin"))
      }
      withConfs("spark.sql.cbo.enabled" -> "true") {
        assert(planOf(q).contains("BroadcastHashJoin"))
      }
    }
  }
}
