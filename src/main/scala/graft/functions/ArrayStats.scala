package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Two-pass (mean, population-msq) over a double array in one evaluation:
  *
  *   mean = (((0 + x0) + x1) + ...) / n
  *   msq  = (((0 + (x0-mean)^2) + ...)) / n
  *
  * — the reference's `average`/`standardDeviation` arithmetic
  * (util_methods.js:10-50), left-to-right accumulation, bit-identical to
  * the explicit `list_reduce` folds in the DuckDB oracle.
  *
  * Exists as a native expression for two reasons:
  *  1. Higher-order-function folds are interpreted — a closure call per
  *     element in the window hot path.
  *  2. Referencing one fold's result (the mean) inside another fold's
  *     lambda gets inlined by CollapseProject, re-executing the mean fold
  *     per element — O(lag^2) per row (observed: 13 s for 130k rows at
  *     lag 144 vs sub-second with this expression).
  *
  * Evaluation is one call per row with two tight JVM loops
  * (CodegenFallback — the loops dominate, codegen of the call site is
  * immaterial). Returns struct(mean double, msq double); null for an
  * empty/null array.
  */
case class ArrayStats(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("mean", DoubleType, nullable = false),
    StructField("msq", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override protected def withNewChildInternal(newChild: Expression): ArrayStats =
    copy(child = newChild)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    var sum = 0.0
    var i = 0
    while (i < n) { sum += arr.getDouble(i); i += 1 }
    val mean = sum / n
    var msqs = 0.0
    i = 0
    while (i < n) {
      val d = arr.getDouble(i) - mean
      msqs += d * d
      i += 1
    }
    InternalRow(mean, msqs / n)
  }
}

object ArrayStats {
  def array_stats(c: Column): Column =
    ColumnBridge.column(ArrayStats(ColumnBridge.expression(c)))
}
