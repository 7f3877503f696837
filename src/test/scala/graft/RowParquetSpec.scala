package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.RowParquet

/** The executor-side InternalRow staging writer behind row-level SQL
  * DML: randomized round-trip — rows written with RowParquet and read
  * back by Spark's own parquet reader must be value-identical across
  * every supported flat type, nulls and extremes included. */
class RowParquetSpec extends SparkSpec {

  test("randomized round-trip across all supported flat types") {
    val schema = StructType(Seq(
      StructField("b", BooleanType), StructField("i", IntegerType),
      StructField("l", LongType), StructField("f", FloatType),
      StructField("d", DoubleType), StructField("s", StringType),
      StructField("bin", BinaryType), StructField("dt", DateType),
      StructField("ts", TimestampType), StructField("m", DecimalType(12, 3))))
    val rnd = new scala.util.Random(7)
    def maybe[A](v: => A): Any = if (rnd.nextInt(5) == 0) null else v
    val rows: Seq[Array[Any]] = (1 to 300).map { _ =>
      Array[Any](
        maybe(rnd.nextBoolean()),
        maybe(Seq(Int.MinValue, Int.MaxValue, 0, rnd.nextInt())(rnd.nextInt(4))),
        maybe(Seq(Long.MinValue, Long.MaxValue, rnd.nextLong())(rnd.nextInt(3))),
        maybe(rnd.nextFloat()),
        maybe(Seq(Double.MaxValue, -0.0, rnd.nextDouble())(rnd.nextInt(3))),
        maybe(UTF8String.fromString(
          Seq("", "héllo ✓", "\ttab", rnd.nextString(6))(rnd.nextInt(4)))),
        maybe(Array.fill(rnd.nextInt(8))(rnd.nextInt().toByte)),
        maybe(rnd.nextInt(30000)),          // days
        maybe(rnd.nextLong() % (1L << 50)), // micros
        maybe(Decimal(BigDecimal(BigInt(rnd.nextLong() % 1000000000L), 3),
          12, 3)))
    }
    val path = tmpDir("rowparquet") + "/staged.parquet"
    val w = RowParquet.open(path, schema)
    try rows.foreach(vals =>
      w.write(new GenericInternalRow(vals): InternalRow))
    finally w.close()

    val back = spark.read.schema(schema).parquet(path).collect()
    assert(back.length === rows.length)
    // order is preserved (single file, single writer)
    back.zip(rows).zipWithIndex.foreach { case ((got: Row, exp), i) =>
      def expExternal(j: Int): Any = exp(j) match {
        case null => null
        case u: UTF8String => u.toString
        case d: Decimal => d.toJavaBigDecimal
        case days: Int if j == 7 => java.sql.Date.valueOf(
          java.time.LocalDate.ofEpochDay(days.toLong))
        case us: Long if j == 8 =>
          java.sql.Timestamp.from(java.time.Instant.EPOCH.plus(
            us, java.time.temporal.ChronoUnit.MICROS))
        case v => v
      }
      (0 until schema.length).foreach { j =>
        val g = got.get(j) match {
          case b: Array[Byte] => b.toSeq
          case x => x
        }
        val e = expExternal(j) match {
          case b: Array[Byte] => b.toSeq
          case x => x
        }
        assert(g === e, s"row $i col ${schema(j).name}")
      }
    }
  }

  test("nested types are refused loudly") {
    val nested = StructType(Seq(
      StructField("a", ArrayType(IntegerType))))
    val e = intercept[UnsupportedOperationException] {
      RowParquet.messageType("t", nested)
    }
    assert(e.getMessage.contains("flat"))
  }
}
