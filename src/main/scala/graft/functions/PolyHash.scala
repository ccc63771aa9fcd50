package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic polynomial rolling hash — `h = (h*31 + codepoint) mod
  * 1e9+7` over the string's characters. The document-fingerprinting and
  * MinHash primitives both build on it (the reference's fingerprinting
  * role is played by md5 change-detection, util_methods.js:189-208; a
  * rolling hash is the streaming-friendly, SQL-reproducible equivalent).
  *
  * Implemented as a native Catalyst `Expression` with `doGenCode` so the
  * hash participates in WholeStageCodegen (a Scala UDF here would break
  * the codegen pipeline and pay serialization per row — this is the
  * "custom Expression beats UDF" path for the hot hashing loops of
  * dedup/LSH at 100 TB).
  *
  * Cross-engine parity: the DuckDB oracle computes the same fold via
  * `list_reduce(list_prepend(0, list_transform(string_split(s,''),
  * c -> ascii(c))), (h,c) -> (h*31+c) % 1000000007)`. DuckDB's per-char
  * `ascii` yields Unicode CODEPOINTS (verified: '😀' -> 128512), so both
  * sides iterate codepoints, not UTF-16 code units — identical hashes for
  * the full multilingual range dedup/minhash target, not just the BMP.
  */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    java.lang.Long.valueOf(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
        java.lang.String $s = $c.toString();
        long ${ev.value}_h = 0L;
        int $i = 0;
        while ($i < $s.length()) {
          int $cp = $s.codePointAt($i);
          ${ev.value}_h = (${ev.value}_h * 31L + $cp) % 1000000007L;
          $i += java.lang.Character.charCount($cp);
        }
        ${ev.value} = ${ev.value}_h;
      """
    })
}

object PolyHash {
  def poly_hash(c: Column): Column = ColumnBridge.column(PolyHash(ColumnBridge.expression(c)))

  /** The matching DuckDB fragment over a string expression. */
  def sql(s: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($s, ''), c -> CAST(ascii(c) AS BIGINT))), " +
      s"(h, c) -> (h*31 + c) % 1000000007)"
}
