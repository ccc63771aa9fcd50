package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Exact Jaccard similarity |A∩B| / |A∪B| of two distinct-element
  * `array<long>` columns (shingle-hash sets from
  * [[ShingleHashes]]): the scalar form of the n-gram similarity the
  * reference's dedup semantics are built on (word-gram containment,
  * cf. the blocking pipeline in `Dedup.ngramJaccard`).
  *
  * Elements are ASSUMED distinct within each array (that is the
  * [[ShingleHashes]] contract); duplicates would inflate the
  * intersection count.
  *
  * This expression is also the *anchor pattern* for
  * [[graft.plans.JaccardJoinRewrite]]: a join whose condition bounds
  * `jaccard_sim(a, b)` from below is rewritten from an all-pairs
  * theta-join into an inverted-index equi-join.
  *
  * Oracle parity: DuckDB `len(list_intersect(a,b)) / (len(a)+len(b) -
  * len(list_intersect(a,b)))` — both engines produce the same two
  * integers and one IEEE double division, so results are bit-identical.
  *
  * Codegen: static call, stays inside WholeStageCodegen.
  */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSim =
    copy(left = newLeft, right = newRight)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaccardSim.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaccardSim.compute($a, $b);")
}

object JaccardSim {
  def jaccard_sim(a: Column, b: Column): Column =
    ColumnBridge.column(
      JaccardSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Static entry shared by eval and generated code. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 || nb == 0) return 0.0
    val set = new java.util.HashSet[java.lang.Long](na * 2)
    var i = 0
    while (i < na) { set.add(a.getLong(i)); i += 1 }
    var inter = 0
    var j = 0
    while (j < nb) { if (set.contains(b.getLong(j))) inter += 1; j += 1 }
    inter.toDouble / (na + nb - inter)
  }
}
