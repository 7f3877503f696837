package graft

import org.apache.spark.sql.functions._

import graft.core.TxTable
import graft.functions.{IcebergBucketFn, IcebergBucketFunctions}

/** The Iceberg spec's `bucket[N]` transform hash
  * ([[graft.functions.IcebergBucketFn]]) against the spec's OWN
  * published vectors (iceberg.apache.org/spec, Appendix B) — the
  * whole interop rests on byte-identical agreement with stock
  * readers — plus the `bucketHash = "iceberg"` TxTable layout. */
class IcebergBucketSpec extends SparkSpec {
  import spark.implicits._

  // ---- Appendix B published vectors ----

  test("spec vectors: int/long 34 hash to 2017239379") {
    assert(IcebergBucketFn.hashLong(34L) === 2017239379)
  }

  test("spec vector: string 'iceberg' hashes to 1210000089") {
    val b = "iceberg".getBytes("UTF-8")
    assert(IcebergBucketFn.hashBytes(b, 0, b.length) === 1210000089)
  }

  test("spec vector: date 2017-11-16 (17486 days) hashes to -653330422") {
    assert(java.time.LocalDate.of(2017, 11, 16).toEpochDay === 17486L)
    assert(IcebergBucketFn.hashLong(17486L) === -653330422)
  }

  test("spec vector: timestamp 2017-11-16T22:31:08 micros hash") {
    val micros = java.time.LocalDateTime.of(2017, 11, 16, 22, 31, 8)
      .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
    assert(IcebergBucketFn.hashLong(micros) === -2047944441)
  }

  test("bucket = (hash & Int.MaxValue) % N, expression == driver fn") {
    val df = (1L to 1000L).toDF("k")
      .withColumn("b", IcebergBucketFunctions.iceberg_bucket(col("k"), 7))
    df.collect().foreach { r =>
      val k = r.getLong(0)
      assert(r.getInt(1) === IcebergBucketFn.bucketLong(k, 7))
      assert(r.getInt(1) ===
        ((IcebergBucketFn.hashLong(k) & Int.MaxValue) % 7))
      assert(r.getInt(1) >= 0 && r.getInt(1) < 7)
    }
    // string path agrees between codegen'd expression and driver fn
    val sdf = Seq("a", "iceberg", "graft", "", "café").toDF("s")
      .withColumn("b", IcebergBucketFunctions.iceberg_bucket(col("s"), 16))
    sdf.collect().foreach { r =>
      assert(r.getInt(1) === IcebergBucketFn.bucketOf(r.getString(0),
        org.apache.spark.sql.types.StringType, 16))
    }
  }

  // ---- the iceberg-hash table layout ----

  private def schemaNonNullKey = new org.apache.spark.sql.types.StructType()
    .add("k", org.apache.spark.sql.types.LongType, nullable = false)
    .add("v", org.apache.spark.sql.types.DoubleType)

  test("iceberg-bucketed table: files land in spec buckets; lookup prunes") {
    val dir = tmpDir("iceberg-bucket-t") + "/t"
    val t = new TxTable(spark, dir, schemaNonNullKey, Seq("k"),
      numBuckets = 4, bucketHash = TxTable.IcebergBucketHash)
    val data = (1L to 200L).map(i => (i, i * 1.0)).toDF("k", "v")
    t.append(data)
    // every live file's manifest bucket equals the spec bucket of
    // every row inside it
    t.currentFileInfo.foreach { f =>
      val ks = spark.read.parquet(f.path).select("k")
        .collect().map(_.getLong(0))
      assert(ks.nonEmpty)
      ks.foreach(k =>
        assert(IcebergBucketFn.bucketLong(k, 4) === f.bucket,
          s"row k=$k in bucket-${f.bucket} file"))
    }
    // point lookup goes through the iceberg driver-side hash
    assert(t.lookup(Seq(42L)).collect().map(_.getDouble(1)).toSeq ===
      Seq(42.0))
    // upsert targets the right bucket (wrong targeting would dup keys)
    t.upsert(Seq((42L, 99.0)).toDF("k", "v"))
    assert(t.read.filter(col("k") === 42L).collect()
      .map(_.getDouble(1)).toSeq === Seq(99.0))
    assert(t.read.count() === 200L)
    // descriptor round-trip: a schema-free open keeps the hash family
    val ro = TxTable.openReadOnly(spark, dir)
    assert(ro.bucketHash === TxTable.IcebergBucketHash)
  }

  test("iceberg layout refuses multi-key, nullable key, unhashable type") {
    val dir = tmpDir("iceberg-bucket-bad")
    intercept[IllegalArgumentException] {
      new TxTable(spark, s"$dir/t1", schemaNonNullKey.add("k2",
        org.apache.spark.sql.types.LongType, nullable = false),
        Seq("k", "k2"), bucketHash = TxTable.IcebergBucketHash)
    }
    intercept[IllegalArgumentException] {
      new TxTable(spark, s"$dir/t2",
        new org.apache.spark.sql.types.StructType()
          .add("k", org.apache.spark.sql.types.LongType) // nullable
          .add("v", org.apache.spark.sql.types.DoubleType),
        Seq("k"), bucketHash = TxTable.IcebergBucketHash)
    }
    intercept[IllegalArgumentException] {
      new TxTable(spark, s"$dir/t3",
        new org.apache.spark.sql.types.StructType()
          .add("k", org.apache.spark.sql.types.DoubleType,
            nullable = false)
          .add("v", org.apache.spark.sql.types.DoubleType),
        Seq("k"), bucketHash = TxTable.IcebergBucketHash)
    }
    intercept[IllegalArgumentException] {
      new TxTable(spark, s"$dir/t4", schemaNonNullKey, Seq("k"),
        bucketHash = "md5")
    }
  }
}
