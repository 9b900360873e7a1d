package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd Unicode normalization — the first step of every
  * text-curation pipeline over web data (mixed NFC/NFD sources hash and
  * dedup differently until normalized; accent folding feeds matching
  * and language-robust tokenization). Spark has no built-in for any of
  * this; a UDF would pay serialization per row. Seventh native
  * Expression per the SURVEY §2.9 escalation rule.
  *
  * `form` is NFC / NFD / NFKC / NFKD (java.text.Normalizer, i.e. the
  * Unicode standard annex #15 reference behavior); `strip = true`
  * additionally removes combining marks (\\p{Mn}) AFTER normalization —
  * `stripAccents` = NFD + mark removal, which matches DuckDB/utf8proc
  * `strip_accents` on Latin combining-mark accents (the q_text_normalize
  * gate differential pins parity on its planted NFC/NFD/ligature
  * variants). Non-Mn folds that utf8proc applies beyond mark removal
  * (e.g. stroked letters like 'ø', which has no decomposition) are NOT
  * mirrored — documented divergence outside the pinned surface.
  * Exposed to SQL as `unicode_normalize(s, form)` / `strip_accents(s)`
  * ([[graft.plans.TopK]] registration); the operator call site is
  * [[graft.ops.TextOps.textNormalize]].
  *
  * Hot-path shape: pure-ASCII inputs (the overwhelming majority of a
  * web corpus at byte level) short-circuit before any allocation —
  * every normalization form is the identity on ASCII and ASCII has no
  * marks. Non-ASCII rows pay one String round-trip inside whole-stage
  * codegen, same cost class as Spark's own regexp expressions.
  */
case class UnicodeNormalize(child: Expression, form: String,
    strip: Boolean) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String =
    if (strip && form == "NFD") "strip_accents" else "unicode_normalize"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${child.dataType.sql}")
    else if (!UnicodeNormalizeImpl.Forms.contains(form))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName form must be one of " +
          s"${UnicodeNormalizeImpl.Forms.mkString("/")}, got '$form'")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(v: Any): Any =
    UnicodeNormalizeImpl.norm(v.asInstanceOf[UTF8String], form, strip)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.expressions.UnicodeNormalizeImpl
         |  .norm($c, "$form", $strip);""".stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object UnicodeNormalize {
  /** `unicode_normalize(s, form)` — form NFC/NFD/NFKC/NFKD. */
  def normalize(c: Column, form: String): Column =
    Shims.column(UnicodeNormalize(Shims.expression(c),
      form.toUpperCase(java.util.Locale.ROOT), strip = false))

  /** Accent folding: NFD + combining-mark removal. */
  def stripAccents(c: Column): Column =
    Shims.column(UnicodeNormalize(Shims.expression(c), "NFD", strip = true))
}

/** Static core so the generated Java calls one method per row. */
object UnicodeNormalizeImpl {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  private val marks = java.util.regex.Pattern.compile("\\p{Mn}+")

  def norm(s: UTF8String, form: String, strip: Boolean): UTF8String = {
    // ASCII fast path: every form is the identity, ASCII has no marks
    if (s.isFullAscii) return s
    val n = java.text.Normalizer.normalize(s.toString,
      java.text.Normalizer.Form.valueOf(form))
    UTF8String.fromString(
      if (strip) marks.matcher(n).replaceAll("") else n)
  }
}
