package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text-canonicalization kernels — the normalization pass every
  * multilingual training-data pipeline runs before tokenization /
  * fingerprinting (two byte sequences rendering identically must hash
  * identically, or exact-dedup silently misses duplicates).
  *
  * Same design as [[VecDot]]: native Catalyst expressions with
  * `doGenCode`, so the per-row hot loop stays inside whole-stage
  * codegen — no UDF invocation, no boxing. The names and semantics
  * mirror DuckDB's `nfc_normalize` / `strip_accents` builtins (the
  * reference's SQL surface inherits both from DuckDB), which is also
  * what makes the gate entry exactly oracle-able.
  */
object TextNormKernel {
  def normalize(s: UTF8String, form: String): UTF8String =
    UTF8String.fromString(
      Normalizer.normalize(s.toString, Normalizer.Form.valueOf(form)))

  private val marks = java.util.regex.Pattern.compile("\\p{Mn}+")

  /** Canonical decomposition, then drop combining marks (Unicode
    * category Mn) — matches DuckDB/utf8proc `strip_accents` on the
    * Latin/Greek/Cyrillic accent range (precomposed or combining). */
  def stripAccents(s: UTF8String): UTF8String = {
    val d = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
    UTF8String.fromString(marks.matcher(d).replaceAll(""))
  }
}

/** `unicode_normalize(str)` under a fixed normalization `form`
  * (NFC/NFD/NFKC/NFKD — a constructor constant, not a runtime child,
  * so codegen embeds it as a literal). */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = s"${form.toLowerCase}_normalize"

  override protected def nullSafeEval(s: Any): Any =
    TextNormKernel.normalize(s.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"""graft.functions.TextNormKernel.normalize($c, "$form")""")

  override protected def withNewChildInternal(n: Expression): UnicodeNormalize =
    copy(child = n)
}

/** `strip_accents(str)` — DuckDB-compatible accent removal. */
case class StripAccents(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "strip_accents"

  override protected def nullSafeEval(s: Any): Any =
    TextNormKernel.stripAccents(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextNormKernel.stripAccents($c)")

  override protected def withNewChildInternal(n: Expression): StripAccents =
    copy(child = n)
}
