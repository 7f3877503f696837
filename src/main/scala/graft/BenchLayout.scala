package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Storage-layout micro-benchmark (round-2 evidence item): the analog
  * of the reference's `run_logs` secondary indexes (`schema.sql:142-143`
  * — `idx_run_logs_run_id`, btree on `created_at`) for a lakehouse is
  * DATA LAYOUT: hive-partition by day + compact files, so a
  * time-scoped read prunes to one directory at planning time
  * (`PartitionFilters`) instead of scanning every file.
  *
  * Prints one JSON line:
  *   {"metric":"layout_speedup", "unpartitioned_sec":…,
  *    "partitioned_sec":…, "value":…, "files_scanned_ratio":…}
  *
  * Run: SPARK_GRAFT_CPUS=8 tools/run_main.sh graft.BenchLayout /tmp/bl
  */
object BenchLayout {
  def main(args: Array[String]): Unit = {
    val base = if (args.nonEmpty) args(0)
      else java.nio.file.Files.createTempDirectory("graft-layout").toString
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // 3M run_logs rows over 90 days, many appends → many small files
    // (256), mirroring per-run log appends.
    val n = 3L * 1000 * 1000
    val logs = spark.range(n).select(
      concat(lit("log:"), col("id")).as("id"),
      concat(lit("run-"), pmod(col("id"), lit(500))).as("run_id"),
      // hash-derived so stage is independent of the day column below
      element_at(array(lit("triage"), lit("extract"), lit("persist")),
        (pmod(xxhash64(col("id")), lit(3)) + 1).cast("int")).as("stage"),
      concat(lit("message "), pmod(col("id"), lit(1000))).as("message"),
      to_timestamp(lit("2026-01-01 00:00:00")).as("t0"),
      (col("id") % 90).as("day_off"))
      .withColumn("created_at",
        timestamp_add("DAY", col("day_off"), col("t0")))
      .withColumn("day", to_date(col("created_at")))
      .drop("t0", "day_off")

    val flat = s"$base/run_logs_flat"
    val parted = s"$base/run_logs_day"
    logs.repartition(256).write.mode("overwrite").parquet(flat)
    // partitioned + compacted: one file per day partition
    logs.repartition(90, col("day")).write.mode("overwrite")
      .partitionBy("day").parquet(parted)

    def time(f: => Long): (Double, Long) = {
      val t = System.nanoTime(); val r = f
      ((System.nanoTime() - t) / 1e9, r)
    }

    val day = "2026-02-15"
    // warm the JVM/codegen on both paths once
    spark.read.parquet(flat).filter(col("day") === day).count()
    spark.read.parquet(parted).filter(col("day") === day).count()

    val (tFlat, nFlat) = time(
      spark.read.parquet(flat)
        .filter(col("day") === day && col("stage") === "extract").count())
    val qPart = spark.read.parquet(parted)
      .filter(col("day") === day && col("stage") === "extract")
    val (tPart, nPart) = time(qPart.count())
    require(nFlat == nPart, s"row mismatch: $nFlat vs $nPart")

    val plan = qPart.queryExecution.executedPlan.toString
    val pruned = plan.contains("PartitionFilters")
    val scanned = qPart.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount
    }.headOption.getOrElse(-1)

    println(s"""{"metric":"layout_speedup","value":${tFlat / tPart},""" +
      s""""unpartitioned_sec":$tFlat,"partitioned_sec":$tPart,""" +
      s""""rows":$nFlat,"partition_filters":$pruned,""" +
      s""""partitions_scanned":$scanned,"partitions_total":90}""")
    spark.stop()
  }
}
