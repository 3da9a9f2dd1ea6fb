package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Static loops behind [[SeqDot]] — sequential left-fold accumulation,
  * bit-identical to `aggregate(zip_with(a, b, (x,y) => x*y), 0.0, _+_)`
  * and to DuckDB's `list_reduce(list_prepend(0.0, …), +)`: same operand
  * order, float widened to double before each multiply. Null on length
  * mismatch or null elements (the HOF form's null-propagation). */
object VectorMath {
  // four element-type specializations (FF/DD/FD/DF) so the hot loop has
  // no per-element branching; each float widens to double before the
  // multiply, exactly like the HOF's per-element cast("double")
  def seqDotFF(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  def seqDotDD(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  def seqDotFD(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getFloat(i).toDouble * b.getDouble(i)
      i += 1
    }
    acc
  }

  def seqDotDF(a: ArrayData, b: ArrayData): java.lang.Double =
    seqDotFD(b, a)
}

/** Native sequential dot product over two float/double array columns.
  *
  * The `aggregate(zip_with(...))` composition it replaces runs
  * INTERPRETED (higher-order lambdas never enter whole-stage codegen —
  * see NOTES.md "hard-won facts"), allocating a zipped array and a boxed
  * accumulator per row; inside an O(pairs) similarity join that lambda
  * tax dominates. This expression is one fused primitive loop, while
  * keeping the exact left-fold accumulation order, so every
  * oracle-verified cosine/dot score stays bit-identical.
  */
@ExpressionDescription(
  usage = "seq_dot(a, b) - sequential-fold dot product of two numeric arrays")
case class SeqDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "seq_dot"

  private def isFloat(dt: DataType): Boolean =
    dt.asInstanceOf[ArrayType].elementType == FloatType

  private lazy val fnName: String =
    (isFloat(left.dataType), isFloat(right.dataType)) match {
      case (true, true) => "seqDotFF"
      case (false, false) => "seqDotDD"
      case (true, false) => "seqDotFD"
      case (false, true) => "seqDotDF"
    }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"seq_dot needs array<float>/array<double> inputs, " +
          s"got ${left.dataType.sql} / ${right.dataType.sql}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = fnName match {
    case "seqDotFF" => VectorMath.seqDotFF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    case "seqDotDD" => VectorMath.seqDotDD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    case "seqDotFD" => VectorMath.seqDotFD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    case _ => VectorMath.seqDotDF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = fnName
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dot")
      s"""
         |java.lang.Double $tmp = graft.functions.VectorMath.$fn($a, $b);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SeqDot =
    copy(left = newLeft, right = newRight)
}
