package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Frequency estimate of a long key against a broadcast count-min sketch
  * (`org.apache.spark.util.sketch.CountMinSketch`, the public Spark
  * sketch `DataFrameStatFunctions.countMinSketch` builds).
  *
  * The deployment shape: exact heavy-hitter mining shuffles every
  * distinct token; the sketch is built in ONE scan with no shuffle
  * (counter updates are commutative integer adds, so partial sketches
  * merge in any order — the estimate is deterministic), costs
  * width×depth×8 bytes regardless of corpus size, and estimates obey
  * `exact ≤ est ≤ exact + ε·N` (the upper bound with the configured
  * confidence) — never an undercount. Probing is a per-row counter-array
  * read against the broadcast copy; the corpus side stays in codegen. */
@ExpressionDescription(
  usage = "cms_estimate_long(h) - count-min-sketch frequency estimate of a long key")
case class CmsEstimateLong(child: Expression, sketch: Broadcast[CountMinSketch])
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cms_estimate_long needs a bigint input, got ${other.sql}")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "cms_estimate_long"

  override protected def nullSafeEval(h: Any): Any =
    sketch.value.estimateCount(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("cmsBc", sketch)
    nullSafeCodeGen(ctx, ev, h => {
      s"""
         |${ev.value} = ((org.apache.spark.util.sketch.CountMinSketch)
         |  (((org.apache.spark.broadcast.Broadcast) $bcRef).value()))
         |  .estimateCount(java.lang.Long.valueOf($h));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CmsEstimateLong =
    copy(child = newChild)
}
