package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, ImplicitCastInputTypes, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

import graft.core.Geo

/** Native Catalyst haversine expression (great-circle meters).
  *
  * The reference ships haversine as a Scala/Python UDF three times
  * (`Parallel/Pattern Extraction.scala:56`, `Standalone/Blind Zone
  * Detection.scala:33`, `Standalone/Trajectory Clustering.py:58`) — UDFs
  * are codegen-opaque: each call boxes four doubles, breaks the
  * whole-stage pipeline, and blocks filter pushdown through the
  * projection. This expression stays inside whole-stage codegen: the
  * generated code is one static call on primitive doubles, fused into the
  * surrounding operator loop.
  *
  * `graft.core.Geo.haversineMeters` (the Column-composition form) compiles
  * to the same fused code via built-ins and is the default API; this
  * expression exists for SQL-text callers (`haversine_native(...)`) and as
  * the rewrite target of [[graft.plans.NativeHaversineRule]].
  */
@ExpressionDescription(
  usage = "haversine_native(lat1, lng1, lat2, lng2) - great-circle distance in meters")
case class Haversine(
    first: Expression, second: Expression, third: Expression, fourth: Expression)
  extends QuaternaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(DoubleType, DoubleType, DoubleType, DoubleType)

  override def dataType: DataType = DoubleType

  override def prettyName: String = "haversine_native"

  override protected def nullSafeEval(
      lat1: Any, lng1: Any, lat2: Any, lng2: Any): Any =
    Geo.haversineM(
      lat1.asInstanceOf[Double], lng1.asInstanceOf[Double],
      lat2.asInstanceOf[Double], lng2.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) =>
      s"graft.core.Geo.haversineM($a, $b, $c, $d)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Haversine =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}
