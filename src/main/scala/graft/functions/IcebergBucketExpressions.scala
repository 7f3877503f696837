package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Apache Iceberg's `bucket[N]` partition transform (table spec,
  * "Partition Transforms" + Appendix B "32-bit Hash Requirements"):
  * `(murmur3_x86_32(icebergBytes(v)) & Int.MaxValue) % N`, where
  * integral/date/timestamp values hash as their 8-byte little-endian
  * long form and strings hash as raw UTF-8 bytes, seed 0.
  *
  * This is the ONE hash both sides of the interop must agree on: a
  * TxTable created with `bucketHash = "iceberg"` lays its manifest
  * buckets out with this function, so [[graft.core.IcebergExport]]
  * can publish the layout as a spec `bucket[N]` partition spec whose
  * per-file partition tuples a STOCK Iceberg reader prunes with its
  * own murmur3 — file-level bounds skipping was already there; this
  * adds the spec's hidden-partitioning story (manifest-level pruning
  * via field summaries) on top. Reference behavior modeled:
  * `packages/db/schema.sql` relies on Postgres hash partitioning for
  * its hot tables; the Spark-side analog is an explicitly-published,
  * spec-portable bucket function.
  *
  * Murmur3 x86 32-bit is implemented from the public algorithm
  * (Austin Appleby, public domain; also spec Appendix B) rather than
  * Spark's `hash()` — Spark's Murmur3 variant seeds with 42 and
  * diverges on byte tails, so it can never serve as the spec hash.
  * Verified against the spec's own published vectors (see
  * IcebergBucketSpec): int/long 34 → 2017239379, string "iceberg" →
  * 1210000089, date 2017-11-16 → -653330422, timestamp
  * 2017-11-16T22:31:08 → -2047944441.
  */
object IcebergBucketFn {

  private final val C1 = 0xcc9e2d51
  private final val C2 = 0x1b873593

  @inline private def mixK1(k0: Int): Int = {
    var k = k0 * C1
    k = Integer.rotateLeft(k, 15)
    k * C2
  }

  @inline private def mixH1(h0: Int, k: Int): Int = {
    var h = h0 ^ k
    h = Integer.rotateLeft(h, 13)
    h * 5 + 0xe6546b64
  }

  @inline private def fmix(h0: Int, len: Int): Int = {
    var h = h0 ^ len
    h ^= h >>> 16
    h *= 0x85ebca6b
    h ^= h >>> 13
    h *= 0xc2b2ae35
    h ^ (h >>> 16)
  }

  /** murmur3_x86_32 of the value's 8-byte little-endian form, seed 0
    * — the spec's hash for int/long/date/time/timestamp (ints widen
    * to long first, per Appendix B). Two 4-byte blocks, no
    * allocation. */
  def hashLong(v: Long): Int = {
    var h1 = 0
    h1 = mixH1(h1, mixK1(v.toInt))
    h1 = mixH1(h1, mixK1((v >>> 32).toInt))
    fmix(h1, 8)
  }

  /** murmur3_x86_32 over raw bytes, seed 0 — the spec's string/binary
    * hash (bytes are a UTF-8 encoding for strings). */
  def hashBytes(data: Array[Byte], off: Int, len: Int): Int = {
    var h1 = 0
    val nblocks = len / 4
    var i = 0
    while (i < nblocks) {
      val j = off + i * 4
      val k1 = (data(j) & 0xff) | ((data(j + 1) & 0xff) << 8) |
        ((data(j + 2) & 0xff) << 16) | ((data(j + 3) & 0xff) << 24)
      h1 = mixH1(h1, mixK1(k1))
      i += 1
    }
    var k1 = 0
    val tail = off + nblocks * 4
    (len & 3) match {
      case 3 =>
        k1 ^= (data(tail + 2) & 0xff) << 16
        k1 ^= (data(tail + 1) & 0xff) << 8
        k1 ^= data(tail) & 0xff
      case 2 =>
        k1 ^= (data(tail + 1) & 0xff) << 8
        k1 ^= data(tail) & 0xff
      case 1 =>
        k1 ^= data(tail) & 0xff
      case _ =>
    }
    if ((len & 3) != 0) h1 ^= mixK1(k1)
    fmix(h1, len)
  }

  /** `(hash & Int.MaxValue) % n` — the spec's bucket id. */
  def bucketLong(v: Long, n: Int): Int =
    (hashLong(v) & Integer.MAX_VALUE) % n

  def bucketUtf8(v: UTF8String, n: Int): Int = {
    val b = v.getBytes
    (hashBytes(b, 0, b.length) & Integer.MAX_VALUE) % n
  }

  /** Driver-side bucket of a Catalyst-domain value (the
    * [[graft.core.TxTable.lookup]] twin of the expression). */
  def bucketOf(v: Any, dt: DataType, n: Int): Int = v match {
    case s: UTF8String => bucketUtf8(s, n)
    case s: String => bucketUtf8(UTF8String.fromString(s), n)
    case i: Int => bucketLong(i.toLong, n)
    case l: Long => bucketLong(l, n)
    case s: Short => bucketLong(s.toLong, n)
    case b: Byte => bucketLong(b.toLong, n)
    case other => throw new UnsupportedOperationException(
      s"iceberg bucket does not hash $other (${dt.simpleString})")
  }

  /** True when the spec's bucket transform is defined for `dt` in
    * this engine (the flat integral/temporal/string set). */
  def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
        TimestampType | TimestampNTZType | StringType => true
    case _ => false
  }
}

/** `bucket[N]` as a codegen'd Catalyst expression over the key
  * column. Null-in/null-out like every UnaryExpression — callers that
  * must refuse NULL keys (the table layout) wrap it in a raise_error
  * branch. */
case class IcebergBucket(child: Expression, numBuckets: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (numBuckets < 1)
      TypeCheckResult.TypeCheckFailure(
        s"bucket count must be >= 1, got $numBuckets")
    else if (IcebergBucketFn.supported(child.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"iceberg bucket is undefined for ${child.dataType.simpleString} " +
        "(int, long, date, timestamp and string are supported)")

  override def dataType: DataType = IntegerType

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case StringType =>
      IcebergBucketFn.bucketUtf8(v.asInstanceOf[UTF8String], numBuckets)
    case ByteType => IcebergBucketFn.bucketLong(
      v.asInstanceOf[Byte].toLong, numBuckets)
    case ShortType => IcebergBucketFn.bucketLong(
      v.asInstanceOf[Short].toLong, numBuckets)
    case IntegerType | DateType => IcebergBucketFn.bucketLong(
      v.asInstanceOf[Int].toLong, numBuckets)
    case _ => IcebergBucketFn.bucketLong(
      v.asInstanceOf[Long], numBuckets)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val fn = "graft.functions.IcebergBucketFn"
    child.dataType match {
      case StringType =>
        defineCodeGen(ctx, ev, c => s"$fn.bucketUtf8($c, $numBuckets)")
      case LongType | TimestampType | TimestampNTZType =>
        defineCodeGen(ctx, ev, c => s"$fn.bucketLong($c, $numBuckets)")
      case _ => // int-backed (byte/short/int/date) widen to long
        defineCodeGen(ctx, ev,
          c => s"$fn.bucketLong((long) $c, $numBuckets)")
    }
  }

  override protected def withNewChildInternal(
      newChild: Expression): IcebergBucket = copy(child = newChild)
}

object IcebergBucketFunctions {
  /** User-facing Column form: `iceberg_bucket(col, n)`. */
  def iceberg_bucket(c: Column, n: Int): Column =
    GraftSqlBridge.column(IcebergBucket(GraftSqlBridge.expression(c), n))

  /** User-facing Column form: the spec's single-value serialization
    * as a BINARY column (the Puffin theta-sketch input). */
  def iceberg_value_bytes(c: Column): Column =
    GraftSqlBridge.column(IcebergValueBytes(GraftSqlBridge.expression(c)))
}

/** Iceberg's SINGLE-VALUE binary serialization (table spec, Appendix
  * D): the per-type byte form every engine must agree on before
  * hashing values into a Puffin `apache-datasketches-theta-v1`
  * sketch — little-endian fixed-width numerics, raw UTF-8 strings.
  * Matching these bytes exactly is what makes our exported NDV
  * sketches union-compatible with sketches a stock engine (Trino,
  * Spark+Iceberg) computes over the same data. */
object IcebergValueFn {
  private def le(v: Long, n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) { out(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    out
  }
  def ofInt(v: Int): Array[Byte] = le(v.toLong, 4)
  def ofLong(v: Long): Array[Byte] = le(v, 8)
  def ofFloat(v: Float): Array[Byte] =
    le(java.lang.Float.floatToIntBits(v).toLong, 4)
  def ofDouble(v: Double): Array[Byte] =
    le(java.lang.Double.doubleToLongBits(v), 8)
  def ofBool(v: Boolean): Array[Byte] =
    Array(if (v) 1.toByte else 0.toByte)
  def ofUtf8(v: UTF8String): Array[Byte] = v.getBytes

  def supported(dt: DataType): Boolean = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
        FloatType | DoubleType | DateType | TimestampType |
        TimestampNTZType | StringType | BinaryType => true
    case _ => false
  }
}

/** Appendix D single-value serialization as a codegen'd expression:
  * any supported column becomes the BINARY form a Puffin theta
  * sketch must be updated with. Null-in/null-out (null values are
  * not sketched, per the spec — NDV counts non-null values). */
case class IcebergValueBytes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (IcebergValueFn.supported(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"iceberg single-value serialization is undefined for " +
        child.dataType.simpleString)

  override def dataType: DataType = BinaryType

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case BooleanType => IcebergValueFn.ofBool(v.asInstanceOf[Boolean])
    case ByteType    => IcebergValueFn.ofInt(v.asInstanceOf[Byte].toInt)
    case ShortType   => IcebergValueFn.ofInt(v.asInstanceOf[Short].toInt)
    case IntegerType | DateType => IcebergValueFn.ofInt(v.asInstanceOf[Int])
    case LongType | TimestampType | TimestampNTZType =>
      IcebergValueFn.ofLong(v.asInstanceOf[Long])
    case FloatType   => IcebergValueFn.ofFloat(v.asInstanceOf[Float])
    case DoubleType  => IcebergValueFn.ofDouble(v.asInstanceOf[Double])
    case StringType  => IcebergValueFn.ofUtf8(v.asInstanceOf[UTF8String])
    case BinaryType  => v
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val fn = "graft.functions.IcebergValueFn"
    child.dataType match {
      case BooleanType =>
        defineCodeGen(ctx, ev, c => s"$fn.ofBool($c)")
      case ByteType | ShortType =>
        defineCodeGen(ctx, ev, c => s"$fn.ofInt((int) $c)")
      case IntegerType | DateType =>
        defineCodeGen(ctx, ev, c => s"$fn.ofInt($c)")
      case LongType | TimestampType | TimestampNTZType =>
        defineCodeGen(ctx, ev, c => s"$fn.ofLong($c)")
      case FloatType =>
        defineCodeGen(ctx, ev, c => s"$fn.ofFloat($c)")
      case DoubleType =>
        defineCodeGen(ctx, ev, c => s"$fn.ofDouble($c)")
      case StringType =>
        defineCodeGen(ctx, ev, c => s"$fn.ofUtf8($c)")
      case BinaryType =>
        defineCodeGen(ctx, ev, c => s"$c")
    }
  }

  override protected def withNewChildInternal(
      newChild: Expression): IcebergValueBytes = copy(child = newChild)
}
