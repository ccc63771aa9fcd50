package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused word-k-gram shingle hasher: normalized text in, DISTINCT
  * [[PolyHash]] values of the word k-grams out (`array<long>`), in one
  * pass with zero per-gram string allocation.
  *
  * This replaces the interpreted higher-order-function chain
  * (`split -> slice/zip_with concat -> array_distinct -> transform
  * poly_hash`) that dominated the dedup family's CPU: HOF lambdas run
  * interpreted per element, and the concat shape materializes every
  * shingle string only to hash and discard it. Because the input is
  * pre-normalized to single spaces, the k-gram's joined string
  * (`w_i + " " + ... + w_{i+k-1}`) is exactly a contiguous substring of
  * the input, so the hash folds directly over that codepoint range —
  * no split, no concat, no intermediate arrays.
  *
  * Contract (mirrors the previous HOF shape, hash-distinct instead of
  * string-distinct — the hash IS the shingle identity downstream):
  *   - >= k words: distinct PolyHash of each k-gram, first-occurrence
  *     order (all consumers — explode/join, min, integer vote sums —
  *     are order-insensitive);
  *   - < k words (incl. empty): single hash of the whole string.
  *
  * Oracle parity: DuckDB computes
  * `list_distinct(list_transform(<grams>, g -> polyhash(g)))` — hashes
  * then distincts, identically (see `Dedup.shingleHashesSql`).
  *
  * Codegen: `doGenCode` emits a static call to [[ShingleHashes.compute]]
  * — the expression stays inside WholeStageCodegen (no interpreted
  * lambda dispatch); the loop itself is JIT-compiled Scala.
  */
case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1, got $k")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHashes.compute($c, $k);")
}

object ShingleHashes {
  private final val Mod = 1000000007L

  def shingle_hashes(c: Column, k: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(c), k))

  /** PolyHash fold over the codepoints of `s[from, until)`. */
  private def hashRange(s: String, from: Int, until: Int): Long = {
    var h = 0L
    var i = from
    while (i < until) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }

  /** Static entry shared by eval and generated code. */
  def compute(u: UTF8String, k: Int): ArrayData = {
    val s = u.toString
    // Word start offsets: 0 and every position after a space. Input is
    // normalized (single spaces, no leading/trailing), so this is exact.
    var nWords = 1
    var i = 0
    while (i < s.length) { if (s.charAt(i) == ' ') nWords += 1; i += 1 }
    if (nWords < k) return new GenericArrayData(Array(hashRange(s, 0, s.length)))
    val starts = new Array[Int](nWords)
    var w = 1
    i = 0
    while (i < s.length) {
      if (s.charAt(i) == ' ') { starts(w) = i + 1; w += 1 }
      i += 1
    }
    val nGrams = nWords - k + 1
    val seen = new java.util.HashSet[java.lang.Long](nGrams * 2)
    val out = new Array[Long](nGrams)
    var n = 0
    var g = 0
    while (g < nGrams) {
      // gram g spans words [g, g+k-1] == chars [starts(g), end) where end
      // is the char before the next word's separator (or EOS).
      val end = if (g + k < nWords) starts(g + k) - 1 else s.length
      val h = hashRange(s, starts(g), end)
      if (seen.add(h)) { out(n) = h; n += 1 }
      g += 1
    }
    new GenericArrayData(if (n == nGrams) out else java.util.Arrays.copyOf(out, n))
  }
}
