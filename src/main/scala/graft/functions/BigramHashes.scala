package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-instance bigram hasher for the hashed-LM pipeline
  * ([[graft.operators.TextAnalysis.lmScore]]): normalized text in
  * (single spaces, no leading/trailing — the [[ShingleHashes]] input
  * contract), one PACKED long per word bigram out, in document order
  * and WITH multiplicity (an LM needs counts, so no distinct — the
  * deliberate contrast with [[ShingleHashes]]).
  *
  * Packing: `k1 * 2^31 + gk` where `k1` = PolyHash of the first word
  * (the LM's context key) and `gk` = PolyHash of the full bigram
  * (`w_i + " " + w_{i+1}`). Both hashes are < 1e9+7 < 2^30, so the two
  * fields never overlap, the packed value stays positive, and consumers
  * unpack with a shift/mask (codegen'd integer ops).
  *
  * Why fused: the HOF formulation (`transform` building each bigram
  * string, then two `poly_hash` calls plus a `substring_index`) walks
  * and allocates every bigram string several times with every lambda
  * interpreted — it was the suite's heaviest CPU line. Here `gk` folds
  * CONTINUE from `k1` (the bigram string's hash prefix IS the first
  * word's hash), so each character is visited at most twice and nothing
  * is allocated per gram. Same arithmetic as the oracle's
  * `polyhash(w1)` / `polyhash(w1 || ' ' || w2)`.
  */
case class BigramHashes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def withNewChildInternal(newChild: Expression): BigramHashes =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    BigramHashes.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BigramHashes.compute($c);")
}

object BigramHashes {
  private final val Mod = 1000000007L
  final val Pack = 1L << 31

  def bigram_hashes(c: Column): Column =
    ColumnBridge.column(BigramHashes(ColumnBridge.expression(c)))

  def compute(u: UTF8String): ArrayData = {
    val s = u.toString
    var nWords = if (s.isEmpty) 0 else 1
    var i = 0
    while (i < s.length) { if (s.charAt(i) == ' ') nWords += 1; i += 1 }
    if (nWords < 2) return new GenericArrayData(Array.emptyLongArray)
    val starts = new Array[Int](nWords)
    var w = 1
    i = 0
    while (i < s.length) {
      if (s.charAt(i) == ' ') { starts(w) = i + 1; w += 1 }
      i += 1
    }
    def wordEnd(wi: Int): Int =
      if (wi + 1 < nWords) starts(wi + 1) - 1 else s.length
    val out = new Array[Long](nWords - 1)
    var g = 0
    while (g < nWords - 1) {
      // k1 = fold over word g
      var h = 0L
      var p = starts(g)
      val e1 = wordEnd(g)
      while (p < e1) {
        val cp = s.codePointAt(p)
        h = (h * 31L + cp) % Mod
        p += Character.charCount(cp)
      }
      val k1 = h
      // gk continues the same fold through the separator + word g+1
      h = (h * 31L + ' '.toInt) % Mod
      p = starts(g + 1)
      val e2 = wordEnd(g + 1)
      while (p < e2) {
        val cp = s.codePointAt(p)
        h = (h * 31L + cp) % Mod
        p += Character.charCount(cp)
      }
      out(g) = k1 * Pack + h
      g += 1
    }
    new GenericArrayData(out)
  }
}
