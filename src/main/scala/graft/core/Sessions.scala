package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Defaults chosen for the driver environment (single-JVM `local[N]`,
  * 128 GiB) but expressed so the same settings scale to a multi-executor
  * cluster: AQE on (runtime join re-planning, skew splitting, partition
  * coalescing), UTC session time zone (oracle parity), shuffle
  * partitions sized to cores rather than the 200 default.
  */
object Sessions {
  def local(appName: String = "graft", cores: Int = defaultCores): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      // split size: 128 MiB keeps a task's input inside executor memory
      // at any corpus size (scan parallelism = bytes / this, not files)
      .config("spark.sql.files.maxPartitionBytes", (128L * 1024 * 1024).toString)
      // pack many small files into one task instead of task-per-file
      // (binaryFile doc corpora and per-run log appends produce them)
      .config("spark.sql.files.openCostInBytes", (4L * 1024 * 1024).toString)
      .config("spark.sql.parquet.filterPushdown", "true")
      // INT96 (the legacy default) carries no usable footer statistics;
      // micros gives TxTable's manifest zone maps timestamp min/max
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def defaultCores: Int =
    sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(4)
}
