package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text normalization for document fingerprinting:
  * lowercase → keep only `[a-z0-9 ]` → collapse space runs → trim,
  * as one native codegen'd scalar loop.
  *
  * Replaces the chained
  * `trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))`
  * formulation: two backtracking regex passes allocate two intermediate
  * strings per row and dominate CPU on full-document inputs, while this
  * is one branchy loop over the lowercased chars. Output is
  * character-identical to the regex chain (and to the DuckDB oracle's
  * regexp formulation), so the d09 fingerprint oracle is unchanged.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  override def nullSafeEval(input: Any): Any =
    NormalizeText.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeText.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeText {
  /** One pass over the lowercased string. `pending` marks a space run;
    * it is emitted only when followed by a kept character and the output
    * is non-empty — which is exactly strip-then-collapse-then-trim.
    * Lowercasing delegates to UTF8String (same Unicode behavior as the
    * built-in `lower`).
    */
  def normalize(s: UTF8String): UTF8String = {
    val lower = s.toLowerCase.toString
    val n = lower.length
    val out = new java.lang.StringBuilder(n)
    var pending = false
    var i = 0
    while (i < n) {
      val c = lower.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (pending && out.length > 0) out.append(' ')
        pending = false
        out.append(c)
      } else if (c == ' ') {
        pending = true
      }
      i += 1
    }
    UTF8String.fromString(out.toString)
  }

  /** Column-API entry point. */
  def apply(text: Column): Column =
    shims.toColumn(NormalizeText(shims.toExpression(text)))
}
