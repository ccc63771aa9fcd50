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

/** Positional sibling of [[ShingleHashes]]: ALL word-k-gram hashes in
  * position order (index = 0-based word offset of the gram), no distinct.
  * The exact-substring family (d10) needs positions to reconstruct
  * maximal shared runs — two grams at consecutive positions extend one
  * run — so the distinct fused variant can't serve it. Same prefix
  * decomposition, same O(chars + grams) cost. Texts with fewer than k
  * words emit an EMPTY array (they cannot host a k-token run; the
  * whole-string fallback of the distinct variant would invent spurious
  * position-0 matches between short docs).
  */
case class ShingleHashesPos(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1, got $k")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def withNewChildInternal(newChild: Expression): ShingleHashesPos =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.computePos(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHashes.computePos($c, $k);")
}

object ShingleHashes {
  private final val Mod = 1000000007L

  def shingle_hashes(c: Column, k: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(c), k))

  def shingle_hashes_pos(c: Column, k: Int): Column =
    ColumnBridge.column(ShingleHashesPos(ColumnBridge.expression(c), k))

  /** Static entry shared by eval and generated code.
    *
    * Complexity note: each gram hash comes from PREFIX decomposition —
    * `hash(s[a..b)) = (P[b] - P[a]·31^(b-a)) mod M` over prefix hashes
    * `P` and powers precomputed in one pass — so the whole call is
    * O(chars + grams), not the O(chars·k) of re-folding every gram's
    * span (at k=16 spans that re-fold dominated the dedup family's
    * CPU). The decomposition is an algebraic identity of the same
    * modular fold, so emitted values are bit-identical to the direct
    * per-gram fold (ShingleSpec pins this against an independent
    * re-derivation, including non-BMP codepoints).
    */
  def compute(u: UTF8String, k: Int): ArrayData = {
    val s = u.toString
    // decode codepoints once (prefix arrays index codepoint space)
    val nCp = s.codePointCount(0, s.length)
    val cps = new Array[Int](nCp)
    var ci = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      cps(ci) = cp; ci += 1
      i += Character.charCount(cp)
    }
    // prefix hashes P and powers of 31 (mod M): P(0)=0, P(j+1)=P(j)*31+cp
    val pre = new Array[Long](nCp + 1)
    val pow = new Array[Long](nCp + 1)
    pow(0) = 1L
    var j = 0
    while (j < nCp) {
      pre(j + 1) = (pre(j) * 31L + cps(j)) % Mod
      pow(j + 1) = pow(j) * 31L % Mod
      j += 1
    }
    def rangeHash(a: Int, b: Int): Long = {
      val x = (pre(b) - pre(a) * pow(b - a)) % Mod
      if (x < 0) x + Mod else x
    }
    // Word start offsets: 0 and every position after a space. Input is
    // normalized (single spaces, no leading/trailing), so this is exact.
    var nWords = 1
    j = 0
    while (j < nCp) { if (cps(j) == ' ') nWords += 1; j += 1 }
    if (nWords < k) return new GenericArrayData(Array(rangeHash(0, nCp)))
    val starts = new Array[Int](nWords)
    var w = 1
    j = 0
    while (j < nCp) {
      if (cps(j) == ' ') { starts(w) = j + 1; w += 1 }
      j += 1
    }
    val nGrams = nWords - k + 1
    val seen = new java.util.HashSet[java.lang.Long](nGrams * 2)
    val out = new Array[Long](nGrams)
    var n = 0
    var g = 0
    while (g < nGrams) {
      // gram g spans words [g, g+k-1] == codepoints [starts(g), end)
      // where end is the codepoint before the next word's separator
      // (or EOS).
      val end = if (g + k < nWords) starts(g + k) - 1 else nCp
      val h = rangeHash(starts(g), end)
      if (seen.add(h)) { out(n) = h; n += 1 }
      g += 1
    }
    new GenericArrayData(if (n == nGrams) out else java.util.Arrays.copyOf(out, n))
  }

  /** Positional entry: every gram hash in position order, empty when
    * fewer than k words. Shares the prefix-decomposition core.
    */
  def computePos(u: UTF8String, k: Int): ArrayData = {
    val s = u.toString
    val nCp = s.codePointCount(0, s.length)
    val cps = new Array[Int](nCp)
    var ci = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      cps(ci) = cp; ci += 1
      i += Character.charCount(cp)
    }
    val pre = new Array[Long](nCp + 1)
    val pow = new Array[Long](nCp + 1)
    pow(0) = 1L
    var j = 0
    while (j < nCp) {
      pre(j + 1) = (pre(j) * 31L + cps(j)) % Mod
      pow(j + 1) = pow(j) * 31L % Mod
      j += 1
    }
    def rangeHash(a: Int, b: Int): Long = {
      val x = (pre(b) - pre(a) * pow(b - a)) % Mod
      if (x < 0) x + Mod else x
    }
    // an empty string has ZERO words, not one — without this guard the
    // spaces+1 count below would emit one hash of the empty gram at
    // k=1, contradicting the fewer-than-k => empty-array contract
    if (nCp == 0) return new GenericArrayData(Array.emptyLongArray)
    var nWords = 1
    j = 0
    while (j < nCp) { if (cps(j) == ' ') nWords += 1; j += 1 }
    if (nWords < k) return new GenericArrayData(Array.emptyLongArray)
    val starts = new Array[Int](nWords)
    var w = 1
    j = 0
    while (j < nCp) {
      if (cps(j) == ' ') { starts(w) = j + 1; w += 1 }
      j += 1
    }
    val nGrams = nWords - k + 1
    val out = new Array[Long](nGrams)
    var g = 0
    while (g < nGrams) {
      val end = if (g + k < nWords) starts(g + k) - 1 else nCp
      out(g) = rangeHash(starts(g), end)
      g += 1
    }
    new GenericArrayData(out)
  }
}
