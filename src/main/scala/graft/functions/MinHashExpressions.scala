package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash band: `min over words of md5(salt || ':' || word)`
  * as one expression (SURVEY §2.13 upgrade path). The declarative
  * `array_min(transform(ws, w -> md5(...)))` materializes a hashed
  * copy of every word array and hex-encodes every digest; this
  * implementation streams the words, tracks the minimum 16-byte
  * digest (hex encoding is order-preserving, so comparing digests ==
  * comparing hex strings) and hex-encodes once. md5 itself still
  * dominates, but the array/string churn goes away — it is the
  * per-row constant factor that matters at 10^11 documents.
  */
case class MinSaltedMd5(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), StringType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"min_salted_md5 expects (array<string>, string), got ${l.simpleString(10)} / ${r.simpleString(10)}")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  @transient private lazy val hexChars = "0123456789abcdef".toCharArray

  override def nullSafeEval(wordsAny: Any, saltAny: Any): Any = {
    val words = wordsAny.asInstanceOf[ArrayData]
    val saltBytes = saltAny.asInstanceOf[UTF8String].getBytes
    val n = words.numElements()
    if (n == 0) return null
    val md = MessageDigest.getInstance("MD5")
    var min: Array[Byte] = null
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) {
        md.reset()
        md.update(saltBytes)
        md.update(':'.toByte)
        md.update(words.getUTF8String(i).getBytes)
        val d = md.digest()
        if (min == null || unsignedLess(d, min)) min = d
      }
      i += 1
    }
    if (min == null) return null
    val out = new Array[Char](32)
    var j = 0
    while (j < 16) {
      out(2 * j) = hexChars((min(j) >> 4) & 0xf)
      out(2 * j + 1) = hexChars(min(j) & 0xf)
      j += 1
    }
    UTF8String.fromString(new String(out))
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val ai = a(i) & 0xff
      val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinSaltedMd5 =
    copy(left = newLeft, right = newRight)
}

object MinHashFunctions {
  /** min(md5(salt:word)) over a word array — native streaming form. */
  def min_salted_md5(words: Column, salt: Column): Column =
    GraftSqlBridge.column(MinSaltedMd5(
      GraftSqlBridge.expression(words), GraftSqlBridge.expression(salt)))
}
