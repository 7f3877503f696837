package graft

import org.apache.spark.sql.functions._

import graft.core.TxTable

/** VARIANT columns stored in a TxTable: Spark 4's binary
  * semi-structured type rides the manifest-committed table end to
  * end (append / upsert / time travel), zone maps simply skip the
  * column, and the flat-relational exports refuse honestly. */
class VariantStoreSpec extends SparkSpec {
  import spark.implicits._

  private def mk(tag: String): (TxTable, String) = {
    val dir = tmpDir(tag) + "/t"
    val df = Seq(
      (1L, """{"a": 5, "tags": ["x","y"]}"""),
      (2L, """{"a": 7, "tags": []}"""),
      (3L, """{"b": 1}"""))
      .toDF("k", "j").withColumn("v", parse_json(col("j"))).drop("j")
    val t = new TxTable(spark, dir, df.schema, Seq("k"), numBuckets = 2)
    t.append(df)
    (t, dir)
  }

  test("variant round-trips: append, typed paths, missing keys null") {
    val (t, _) = mk("varstore")
    val back = t.read
      .select(col("k"), try_variant_get(col("v"), "$.a", "int").as("a"),
        try_variant_get(col("v"), "$.tags[0]", "string").as("t0"))
      .orderBy("k").collect()
    assert(back.map(r => (r.getLong(0),
      Option(r.get(1)), Option(r.get(2)))).toSeq === Seq(
      (1L, Some(5), Some("x")), (2L, Some(7), None), (3L, None, None)))
  }

  test("upsert rewrites variant rows; time travel serves the old bytes") {
    val (t, _) = mk("varstore-up")
    val v1 = t.currentVersion
    t.upsert(Seq((2L, """{"a": 9}""")).toDF("k", "j")
      .withColumn("v", parse_json(col("j"))).drop("j"))
    def sumA(df: org.apache.spark.sql.DataFrame): Long =
      df.select(sum(try_variant_get(col("v"), "$.a", "int")))
        .head.getLong(0)
    assert(sumA(t.read) === 14L)
    assert(sumA(t.readVersion(v1)) === 12L)
  }

  test("zone maps skip the variant column; key pruning still works") {
    val (t, _) = mk("varstore-zone")
    // a key-range scanWhere must still serve exact rows (the variant
    // column simply contributes no zone-map entry)
    assert(t.scanWhere(col("k") <= 2L).count() === 2L)
  }

  test("flat-relational exports refuse variant honestly") {
    val (t, _) = mk("varstore-exp")
    val e = intercept[UnsupportedOperationException] {
      graft.core.IcebergExport.writeIcebergMetadata(spark, t)
    }
    assert(e.getMessage.contains("does not map"))
  }
}
