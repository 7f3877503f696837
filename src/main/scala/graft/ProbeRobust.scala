package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Dev-only scratch probe (deleted before seal): stage-level timing of
  * a_robust_outliers' three jobs. */
object ProbeRobust {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.Qhelpers._
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    // warm
    spark.read.parquet(s"$dir/orders.parquet").count()
    (1 to 3).foreach { i =>
      println(s"--- iter $i")
      val o = t(spark, dir, "orders").select(col("o_orderstatus").as("st"),
        money(col("o_totalprice")).cast(DoubleType).as("v"))
      val wts = time("wts checkpoint") {
        o.groupBy("st", "v").agg(count(lit(1)).as("w")).localCheckpoint()
      }
      def wmedianOld(wdf: org.apache.spark.sql.DataFrame, out: String) = {
        val cum = wdf
          .withColumn("cum",
            sum("w").over(Window.partitionBy("st").orderBy("v")))
          .withColumn("n", sum("w").over(Window.partitionBy("st")))
        cum.filter(col("cum") >= expr("(n + 1) div 2"))
          .groupBy("st").agg(min("v").as(out))
      }
      def wmedian(wdf: org.apache.spark.sql.DataFrame, out: String) = {
        val bux = wdf.groupBy(col("st"),
            floor(col("v") / lit(1024.0)).as("b"))
          .agg(sum("w").as("bw"))
        val byB = Window.partitionBy("st").orderBy("b")
        val mb = bux
          .withColumn("bcum", sum("bw").over(byB))
          .withColumn("n", sum("bw").over(Window.partitionBy("st")))
          .filter(col("bcum") >= expr("(n + 1) div 2"))
          .groupBy("st")
          .agg(min(struct(col("b"), col("bcum"), col("bw"), col("n")))
            .as("mb"))
          .select(col("st"), col("mb.b").as("b"),
            (col("mb.bcum") - col("mb.bw")).as("before"),
            expr("(mb.n + 1) div 2").as("k"))
        wdf.join(broadcast(mb), Seq("st"))
          .filter(floor(col("v") / lit(1024.0)) === col("b"))
          .withColumn("cum", col("before") +
            sum("w").over(Window.partitionBy("st").orderBy("v")))
          .filter(col("cum") >= col("k"))
          .groupBy("st").agg(min("v").as(out))
      }
      { // cross-check both forms agree
        val a = wmedianOld(wts, "m").collect().map(r => (r.getString(0), r.getDouble(1))).toSet
        val b2 = wmedian(wts, "m").collect().map(r => (r.getString(0), r.getDouble(1))).toSet
        require(a == b2, s"median mismatch: $a vs $b2")
      }
      val med = wmedian(wts, "med")
      val devw = time("devw checkpoint") {
        wts.join(broadcast(med), "st")
          .groupBy(col("st"), col("med"),
            abs(col("v") - col("med")).as("d"))
          .agg(sum("w").as("w"))
          .localCheckpoint()
      }
      val mad = wmedian(devw.select(col("st"), col("d").as("v"), col("w")),
        "mad")
      time("final census") {
        devw.join(broadcast(mad), "st")
          .groupBy(col("st").as("o_orderstatus"), col("med").as("median"),
            col("mad"))
          .agg(sum("w").as("n"),
            coalesce(sum(when(col("d") > lit(3.0) * col("mad"), col("w"))),
              lit(0L)).as("n_outliers"))
          .count()
      }
    }
    spark.stop()
  }
}
