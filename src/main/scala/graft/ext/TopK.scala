package graft.ext

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Per-group top-k as a typed `Aggregator` (SURVEY §2.13 "custom
  * UDAF" upgrade path): a bounded sorted buffer merged map-side, so
  * the plan is partial-aggregate → final-aggregate — each group ships
  * at most k entries per partition across the shuffle. The window
  * formulation (`row_number <= k`) must instead shuffle EVERY row of
  * every group and sort; at 100 TB group sizes that difference is the
  * job.
  *
  * Ordering: value descending, id ascending tiebreak — fully
  * deterministic.
  */
object TopK {

  case class Entry(value: Double, id: Long)
  case class Buf(entries: Seq[Entry])

  final class TopKAggregator(k: Int) extends Aggregator[Entry, Buf, Buf] {
    private def trim(es: Seq[Entry]): Seq[Entry] =
      es.sortBy(e => (-e.value, e.id)).take(k)

    override def zero: Buf = Buf(Seq.empty)
    override def reduce(buf: Buf, e: Entry): Buf = Buf(trim(buf.entries :+ e))
    override def merge(a: Buf, b: Buf): Buf = Buf(trim(a.entries ++ b.entries))
    override def finish(buf: Buf): Buf = buf
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
  }

  /** Column form: `top_k(k)(struct(value, id))` →
    * struct<entries: array<struct<value, id>>>. */
  def top_k(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new TopKAggregator(k), Encoders.product[Entry])
}
