package graft

import org.apache.spark.sql.functions._

import graft.core.TxTable

/** Model-based property test for the SQL DML surface: a random
  * sequence of UPDATE / DELETE / MERGE / INSERT statements executed
  * through the catalog must leave the table exactly where a trivial
  * in-memory map model lands — the SQL twin of PropertySpec's
  * TxTable-vs-model sequence. Every statement routes through the
  * row-level operations (DV tombstones + staged inserts) or the V1
  * write bridge, so this exercises the full guarded-commit SQL stack
  * under randomized interleavings. */
class SqlDmlPropertySpec extends SparkSpec {
  import spark.implicits._

  test("random SQL DML sequences agree with an in-memory model") {
    val rnd = new scala.util.Random(20260814)
    (1 to 3).foreach { round =>
      val root = tmpDir(s"sqldml-prop$round")
      val init = (1L to 40L).map(i => (i, i * 1.0))
      val df = init.toDF("k", "v")
      val tx = new TxTable(spark, s"$root/t", df.schema, Seq("k"),
        numBuckets = 2)
      tx.append(df)
      spark.conf.set(s"spark.sql.catalog.prop$round",
        "graft.sources.GraftCatalog")
      spark.conf.set(s"spark.sql.catalog.prop$round.root", root)
      val ident = s"prop$round.t"

      val model = scala.collection.mutable.Map(init: _*)
      (1 to 12).foreach { _ =>
        rnd.nextInt(4) match {
          case 0 => // point UPDATE
            val k = 1L + rnd.nextInt(60)
            val delta = rnd.nextInt(100).toDouble
            spark.sql(s"UPDATE $ident SET v = v + $delta WHERE k = $k")
            model.get(k).foreach(v => model(k) = v + delta)
          case 1 => // predicate DELETE (expression => row-level path)
            val m = 2 + rnd.nextInt(5)
            val r = rnd.nextInt(m)
            spark.sql(s"DELETE FROM $ident WHERE k % $m = $r AND k > 30")
            model.keys.filter(k => k % m == r && k > 30).toSeq
              .foreach(model.remove)
          case 2 => // MERGE upsert of a small random batch
            val batch = (1 to 5).map(_ =>
              (1L + rnd.nextInt(60), rnd.nextInt(1000).toDouble))
              .distinctBy(_._1)
            batch.toDF("k", "v").createOrReplaceTempView("prop_src")
            spark.sql(
              s"""MERGE INTO $ident AS t USING prop_src AS s ON t.k = s.k
                 |WHEN MATCHED THEN UPDATE SET v = s.v
                 |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)
                 |""".stripMargin)
            batch.foreach { case (k, v) => model(k) = v }
          case 3 => // plain INSERT of a fresh key
            val k = 1000L + rnd.nextInt(1000)
            if (!model.contains(k)) {
              spark.sql(
                s"INSERT INTO $ident VALUES (CAST($k AS BIGINT), 0.5)")
              model(k) = 0.5
            }
        }
      }
      val got = spark.sql(s"SELECT k, v FROM $ident")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got === model.toMap, s"round $round diverged from the model")
      // and the Scala API sees the identical end state
      assert(tx.read.collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap === model.toMap)
    }
  }
}
