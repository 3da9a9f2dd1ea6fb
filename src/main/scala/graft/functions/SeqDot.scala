package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType, IntegerType, LongType, ShortType}

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

  /** Element-type codes for the widening compat path (any numeric array
    * combination outside the four float/double fast paths above). */
  def typeCode(dt: DataType): Int = dt match {
    case FloatType => 0
    case DoubleType => 1
    case IntegerType => 2
    case LongType => 3
    case ShortType => 4
    case _ => 5 // ByteType
  }

  @inline private def elemD(arr: ArrayData, i: Int, c: Int): Double = c match {
    case 0 => arr.getFloat(i).toDouble
    case 1 => arr.getDouble(i)
    case 2 => arr.getInt(i).toDouble
    case 3 => arr.getLong(i).toDouble
    case 4 => arr.getShort(i).toDouble
    case _ => arr.getByte(i).toDouble
  }

  /** Generic widening fold: every element cast to double before the
    * multiply, exactly like the HOF form's per-element cast("double") —
    * preserves the old `aggregate(zip_with(...))` contract for integral
    * arrays (the per-element switch is on a loop-constant code; branch
    * prediction makes it near-free, and the fast paths above cover the
    * hot float/double similarity loops). */
  def seqDotGen(a: ArrayData, b: ArrayData, ac: Int, bc: Int): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += elemD(a, i, ac) * elemD(b, i, bc)
      i += 1
    }
    acc
  }

  @inline private def elemL(arr: ArrayData, i: Int, c: Int): Long = c match {
    case 2 => arr.getInt(i).toLong
    case 3 => arr.getLong(i)
    case 4 => arr.getShort(i).toLong
    case _ => arr.getByte(i).toLong
  }

  /** Exact integer dot product with a long accumulator — each element
    * widens to long BEFORE the multiply (the HOF it replaces multiplied in
    * int then cast, which could wrap on large inputs; for the int8
    * quantization domain both are exact, and integer addition is
    * order-insensitive so the result is engine-independent). */
  def seqDotLong(a: ArrayData, b: ArrayData, ac: Int, bc: Int): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      // same loud-overflow contract as seqL2Long (ADVICE r8)
      acc = Math.addExact(acc, Math.multiplyExact(elemL(a, i, ac), elemL(b, i, bc)))
      i += 1
    }
    acc
  }

  /** Exact integer squared L2 distance, long accumulator — the k-means /
    * coreset hot loop (`Σ (aᵢ − bᵢ)²` over quantized vectors): integer
    * adds are order-insensitive, so the distance (and every argmin built
    * on it) is bit-exact across engines. Null on length mismatch or null
    * elements, like the HOF composition it replaces. */
  def seqL2Long(a: ArrayData, b: ArrayData, ac: Int, bc: Int): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = elemL(a, i, ac) - elemL(b, i, bc)
      // checkInputDataTypes admits ANY array<bigint>, so a non-quantized
      // long vector must fail loudly instead of wrapping silently — the
      // scaladoc's exactness claim is a contract (ADVICE r8). The exact
      // intrinsics stay a primitive loop (no boxing, codegen-inlinable).
      acc = Math.addExact(acc, Math.multiplyExact(d, d))
      i += 1
    }
    acc
  }
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

  private def elemType(dt: DataType): DataType =
    dt.asInstanceOf[ArrayType].elementType

  // fast-path call for the four float/double combinations; widening
  // generic call (with element-type codes) for every other numeric pair
  private lazy val callSuffix: String =
    (elemType(left.dataType), elemType(right.dataType)) match {
      case (FloatType, FloatType) => "seqDotFF(%s, %s)"
      case (DoubleType, DoubleType) => "seqDotDD(%s, %s)"
      case (FloatType, DoubleType) => "seqDotFD(%s, %s)"
      case (DoubleType, FloatType) => "seqDotDF(%s, %s)"
      case (lt, rt) =>
        s"seqDotGen(%s, %s, ${VectorMath.typeCode(lt)}, ${VectorMath.typeCode(rt)})"
    }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType | IntegerType | LongType |
                     ShortType | ByteType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"seq_dot needs numeric array inputs, " +
          s"got ${left.dataType.sql} / ${right.dataType.sql}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (ad, bd) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    (elemType(left.dataType), elemType(right.dataType)) match {
      case (FloatType, FloatType) => VectorMath.seqDotFF(ad, bd)
      case (DoubleType, DoubleType) => VectorMath.seqDotDD(ad, bd)
      case (FloatType, DoubleType) => VectorMath.seqDotFD(ad, bd)
      case (DoubleType, FloatType) => VectorMath.seqDotDF(ad, bd)
      case (lt, rt) => VectorMath.seqDotGen(ad, bd,
        VectorMath.typeCode(lt), VectorMath.typeCode(rt))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val call = callSuffix
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dot")
      s"""
         |java.lang.Double $tmp = graft.functions.VectorMath.${call.format(a, b)};
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SeqDot =
    copy(left = newLeft, right = newRight)
}

/** Exact integer dot product over two integral array columns, long
  * accumulator — the codegen'd sibling of [[SeqDot]] for quantized
  * vectors (`Similarity.intDot`): integer addition is order-insensitive,
  * so the result is bit-exact in any engine, and the fused loop replaces
  * the interpreted `aggregate(zip_with(...))` HOF that dominated the
  * O(pairs) quantized ranking. Null on length mismatch / null elements. */
@ExpressionDescription(
  usage = "seq_dot_long(a, b) - exact integer dot product of two integral arrays")
case class SeqDotLong(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "seq_dot_long"

  private def code(e: Expression): Int =
    VectorMath.typeCode(e.dataType.asInstanceOf[ArrayType].elementType)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(IntegerType | LongType | ShortType | ByteType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"seq_dot_long needs integral array inputs, " +
          s"got ${left.dataType.sql} / ${right.dataType.sql}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorMath.seqDotLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      code(left), code(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (ac, bc) = (code(left), code(right))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("idot")
      s"""
         |java.lang.Long $tmp = graft.functions.VectorMath.seqDotLong($a, $b, $ac, $bc);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SeqDotLong =
    copy(left = newLeft, right = newRight)
}

/** Exact integer squared-L2 distance over two integral array columns —
  * the codegen'd hot loop behind the k-means assignment and coreset
  * medoid election ([[graft.queries.Ext.kmeansAssign]]): one fused
  * primitive loop instead of the interpreted
  * `aggregate(zip_with(a, b, (x,y) => (x−y)²))` HOF, with the same
  * null-propagation contract. Integer adds are order-insensitive, so
  * the distance is bit-exact in any engine. */
@ExpressionDescription(
  usage = "seq_l2_long(a, b) - exact integer squared L2 distance of two integral arrays")
case class SeqL2Long(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "seq_l2_long"

  private def code(e: Expression): Int =
    VectorMath.typeCode(e.dataType.asInstanceOf[ArrayType].elementType)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(IntegerType | LongType | ShortType | ByteType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"seq_l2_long needs integral array inputs, " +
          s"got ${left.dataType.sql} / ${right.dataType.sql}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorMath.seqL2Long(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      code(left), code(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (ac, bc) = (code(left), code(right))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("il2")
      s"""
         |java.lang.Long $tmp = graft.functions.VectorMath.seqL2Long($a, $b, $ac, $bc);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SeqL2Long =
    copy(left = newLeft, right = newRight)
}
