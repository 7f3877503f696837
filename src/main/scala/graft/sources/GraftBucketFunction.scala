package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The catalog-resolvable V2 form of TxTable's bucket partitioner —
  * what makes STORAGE-PARTITIONED JOINS work: when two graft tables
  * share keys and bucket count, Spark proves their co-location by
  * resolving each side's reported `bucket(n, keys…)` transform
  * through the catalog to THIS function and comparing canonical
  * names — and elides the join shuffle entirely. At 100 TB the
  * fact-to-fact equi-join shuffle is usually the single largest cost
  * in the plan; co-located layouts make it zero.
  *
  * `produceResult` replicates `TxTable.bucketExpr` exactly —
  * `pmod(hash(keys…), n)` with Spark's `hash()` = Murmur3 seed 42
  * folded across the key columns — so a runtime evaluation (e.g.
  * Spark re-bucketing a non-graft side to match under
  * `v2.bucketing.shuffle.enabled`) lands rows in the same buckets
  * the table writes them to. */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, keys...): graft's manifest bucket id - " +
      "pmod(murmur3 hash of the keys (seed 42), numBuckets)"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length >= 2,
      "bucket() takes (numBuckets, key1[, key2...])")
    require(inputType.head.dataType == IntegerType,
      s"bucket()'s first argument is the bucket count (int), got " +
        s"${inputType.head.dataType}")
    Bound(inputType.fields.map(_.dataType))
  }

  final case class Bound(argTypes: Array[DataType])
      extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = argTypes
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String = "graft.bucket"
    override def isResultNullable: Boolean = false

    override def produceResult(input: InternalRow): Integer = {
      val n = input.getInt(0)
      var h = 42L
      var i = 1
      while (i < argTypes.length) {
        val v = input.get(i, argTypes(i))
        h = Murmur3HashFunction.hash(v, argTypes(i), h)
        i += 1
      }
      val m = h.toInt % n
      Integer.valueOf(if (m < 0) m + n else m)
    }
  }
}

/** The ICEBERG-hash twin of [[GraftBucketFunction]] for tables laid
  * out with `bucketHash = "iceberg"` ([[graft.core.TxTable]]). A
  * DISTINCT canonical name is the correctness seam: SPJ proves
  * co-location by comparing both sides' resolved transform functions,
  * and a spark-hash table zipped against an iceberg-hash table would
  * pair buckets whose ids mean different rows — same-name resolution
  * must therefore be impossible. Single key column, per the spec's
  * transform arity. */
object GraftIcebergBucketFunction extends UnboundFunction {
  override def name(): String = "iceberg_bucket"
  override def description(): String =
    "iceberg_bucket(numBuckets, key): the Iceberg spec's bucket[N] " +
      "transform - (murmur3_x86_32(bytes) & Int.MaxValue) % numBuckets"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 2,
      "iceberg_bucket() takes (numBuckets, key)")
    require(inputType.head.dataType == IntegerType,
      s"iceberg_bucket()'s first argument is the bucket count (int), " +
        s"got ${inputType.head.dataType}")
    require(graft.functions.IcebergBucketFn.supported(
      inputType(1).dataType),
      s"iceberg_bucket() is undefined for ${inputType(1).dataType}")
    Bound(inputType.fields.map(_.dataType))
  }

  final case class Bound(argTypes: Array[DataType])
      extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = argTypes
    override def resultType(): DataType = IntegerType
    override def name(): String = "iceberg_bucket"
    override def canonicalName(): String = "graft.iceberg_bucket"
    override def isResultNullable: Boolean = false

    override def produceResult(input: InternalRow): Integer = {
      val n = input.getInt(0)
      Integer.valueOf(graft.functions.IcebergBucketFn.bucketOf(
        input.get(1, argTypes(1)), argTypes(1), n))
    }
  }
}
