package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the vector hot path (SURVEY §2.13
  * upgrade path: built-ins → custom `Expression` with codegen).
  *
  * The pure-SQL formulation `aggregate(zip_with(a, b, *), 0D, +)` is a
  * higher-order function — evaluated per element through lambda
  * variables with no whole-stage codegen. At 64–1536 dims × millions
  * of candidate pairs that interpretation overhead dominates the ANN /
  * near-dup profile, so the dot product gets a real expression: a
  * tight primitive loop in both interpreted and generated code.
  *
  * Sum order is ascending index, identical to the `aggregate` fold —
  * bit-for-bit the same doubles, so DuckDB oracle parity is unchanged.
  * Edge semantics also match the fold exactly: unequal lengths yield
  * NULL (`zip_with` null-pads, the null poisons the sum) and a null
  * element yields NULL — so [[DotProductRewrite]] never changes a
  * query's result, ragged or nullable inputs included. The null-element
  * branch is only emitted when a side's type says `containsNull`.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects array<double> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  // NULL on ragged / null-element inputs, even when children are non-null
  override def nullable: Boolean = true

  private lazy val anyContainsNull: Boolean = Seq(left, right).exists {
    _.dataType match {
      case ArrayType(_, cn) => cn
      case _ => false
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (anyContainsNull && (x.isNullAt(i) || y.isNullAt(i))) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val elemNullCheck =
        if (anyContainsNull)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $elemNullCheck
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $acc;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Packed sign-bit signature ⟨e, hp_j⟩ > 0 for j < nBits over a
  * constant hyperplane matrix (random-hyperplane LSH). The pure-SQL
  * formulation evaluates nBits interpreted `aggregate(zip_with(…))`
  * folds per row; this is the same arithmetic — ascending-index
  * multiply-add per plane, strict `> 0.0` sign rule — as one fused
  * primitive loop with the matrix held as a JVM reference object.
  *
  * Fold-edge parity with the HOF form (`zip_with` null-pads):
  * an embedding longer than the matrix row, or containing a null
  * element, poisons every plane's sum to NULL → every bit 0 → the
  * signature is 0L, exactly as the SQL fold produces. */
case class HyperplaneSignature(child: Expression,
    hyperplanes: Array[Array[Double]])
    extends UnaryExpression {

  private def nBits = hyperplanes.length
  private def dim = if (nBits == 0) 0 else hyperplanes(0).length

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_signature expects array<double>, got ${t.simpleString}")
  }

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  private lazy val containsNull: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n > dim) return 0L
    if (containsNull) {
      var i = 0
      while (i < n) { if (a.isNullAt(i)) return 0L; i += 1 }
    }
    var sig = 0L
    var j = 0
    while (j < nBits) {
      val h = hyperplanes(j)
      var s = 0.0
      var i = 0
      while (i < n) { s += a.getDouble(i) * h(i); i += 1 }
      if (s > 0.0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val hp = ctx.addReferenceObj("hyperplanes", hyperplanes, "double[][]")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val ok = ctx.freshName("ok")
      val nullScan =
        if (containsNull)
          s"for (int $i = 0; $i < $n && $ok; $i++) { if ($a.isNullAt($i)) $ok = false; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |boolean $ok = $n <= ${dim};
         |$nullScan
         |${ev.value} = 0L;
         |if ($ok) {
         |  for (int $j = 0; $j < ${nBits}; $j++) {
         |    double[] $h = $hp[$j];
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $s += $a.getDouble($i) * $h[$i];
         |    }
         |    if ($s > 0.0) ${ev.value} |= (1L << $j);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): HyperplaneSignature = copy(child = newChild)
}

object VectorFunctions {
  /** ⟨a, b⟩ over two array<double> columns (codegen'd). */
  def dot_product(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProduct(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Packed LSH sign bits of an array<double> column against a
    * constant hyperplane matrix (codegen'd). */
  def hyperplane_signature(e: Column, hyperplanes: Array[Array[Double]]): Column =
    GraftSqlBridge.column(HyperplaneSignature(
      GraftSqlBridge.expression(e), hyperplanes))
}
