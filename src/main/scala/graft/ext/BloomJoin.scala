package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join reduction (§2.3 joins, scale path).
  *
  * The 100 TB shape this serves: a fact⋈dim join where the (filtered)
  * dim side is too large to broadcast as rows, but its KEY SET fits a
  * compact bitmap. Building the bloom is one pass over the dim keys
  * with map-side partial bitmaps (shuffle cost = partitions × bitmap
  * bytes, constant in row count); broadcasting the bitmap costs
  * `bits/8` bytes (128 KiB at the default 2²⁰); probing it is a
  * codegen'd scalar filter on the fact scan — so the expensive fact
  * shuffle moves only rows that can possibly join. False positives are
  * removed by the join itself, which makes the reduction semantically
  * invisible — the oracle for a bloom-reduced join is the PLAIN join.
  *
  * Spark's AQE has a config-gated runtime row filter with the same
  * idea; this operator makes the reduction explicit, deterministic,
  * and plan-pinnable (BloomJoinSpec asserts the pre-shuffle filter).
  *
  * Hashing: both sides compute positions with the SAME Spark-native
  * `xxhash64` column expressions (Kirsch–Mitzenmacher double hashing,
  * g_i = h1 + i·h2 mod bits). Hashes are folded to 31 bits first so
  * every intermediate stays far from Long overflow (ANSI mode throws
  * on overflow rather than wrapping).
  */
object BloomJoin {
  private val Salt = 0x5bd1e995L
  private val HashSpace = 1L << 31

  /** The k bit positions of `key` in a `bits`-wide bloom (bits must be
    * a power of two ≤ 2^30). Pure column expressions — codegen'd, and
    * identical on build and probe sides by construction. */
  private def checkShape(bits: Long, k: Int): Unit = {
    require(bits > 0 && (bits & (bits - 1)) == 0 && bits <= (1L << 30),
      s"bits must be a power of two <= 2^30, got $bits")
    require(k >= 1, s"k must be >= 1, got $k")
  }

  /** The two Kirsch–Mitzenmacher base hashes of `key`, each folded to
    * 31 bits (see class doc). Position i = (h1 + i·h2) mod bits on
    * BOTH build and probe sides by construction. */
  private def baseHashes(key: Column): (Column, Column) = {
    val h1 = pmod(xxhash64(key), lit(HashSpace))
    // +1 keeps h2 odd-ish and never 0 (h2=0 would collapse all k probes)
    val h2 = pmod(xxhash64(key, lit(Salt)), lit(HashSpace)) + lit(1L)
    (h1, h2)
  }

  def positions(key: Column, bits: Long, k: Int): Seq[Column] = {
    checkShape(bits, k)
    val (h1, h2) = baseHashes(key)
    (0 until k).map(i => pmod(h1 + lit(i.toLong) * h2, lit(bits)))
  }

  case class Buf(words: Array[Long])

  /** Global bitmap OR-aggregator: input = the key's two base hashes
    * (ONE row per dim key — all k bit positions are derived and set
    * inside `reduce`, so no k× row explosion feeds the aggregation and
    * the per-row encoder traffic is two longs). Partial bitmaps build
    * map-side; the final merge ORs one bitmap per partition — shuffle
    * volume is partitions × bits/8, independent of dim cardinality. */
  final class BitsetAggregator(words: Int, bits: Long, k: Int)
      extends Aggregator[(Long, Long), Buf, Buf] {
    override def zero: Buf = Buf(new Array[Long](words))
    override def reduce(b: Buf, in: (Long, Long)): Buf = {
      val (h1, h2) = in
      var i = 0
      while (i < k) {
        // h1, h2 < 2^31 and i < k keep h1 + i·h2 far from Long
        // overflow; both are non-negative, so % == pmod == the probe
        // side's position arithmetic
        val pos = (h1 + i.toLong * h2) % bits
        b.words((pos >> 6).toInt) |= (1L << (pos & 63L).toInt)
        i += 1
      }
      b
    }
    override def merge(a: Buf, b: Buf): Buf = {
      var i = 0
      while (i < words) { a.words(i) |= b.words(i); i += 1 }
      a
    }
    override def finish(b: Buf): Buf = b
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
  }

  /** One-row frame with `bloom: array<bigint>` covering `key` over
    * `dim`. */
  def build(dim: DataFrame, key: Column, bits: Long, k: Int): DataFrame = {
    checkShape(bits, k)
    val agg = udaf(new BitsetAggregator((bits >> 6).toInt, bits, k),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
    val (h1, h2) = baseHashes(key)
    dim.select(h1.as("h1"), h2.as("h2"))
      .agg(agg(col("h1"), col("h2")).as("b"))
      .select(col("b.words").as("bloom"))
  }

  /** Membership probe: true iff all k bits of `key` are set — may
    * false-positive (rate ~ (1 - e^(-kn/bits))^k), never
    * false-negative. Pure built-in expressions, stays in whole-stage
    * codegen. */
  def mightContain(key: Column, bloom: Column, bits: Long, k: Int): Column =
    positions(key, bits, k).map { pos =>
      val word = (pos / lit(64L)).cast("int") + lit(1)
      val bit = call_function("shiftleft", lit(1L), (pos % lit(64L)).cast("int"))
      element_at(bloom, word).bitwiseAND(bit) =!= lit(0L)
    }.reduce(_ && _)

  /** `fact` reduced to rows whose `factKey` might appear in `dim`'s
    * `dimKey` set. A superset of the joinable rows — follow with the
    * real join to drop false positives. */
  def reduced(fact: DataFrame, factKey: Column,
              dim: DataFrame, dimKey: Column,
              bits: Long = 1L << 20, k: Int = 5): DataFrame = {
    val bloom = build(dim, dimKey, bits, k)
    fact.crossJoin(broadcast(bloom))
      .filter(mightContain(factKey, col("bloom"), bits, k))
      .drop("bloom")
  }
}
