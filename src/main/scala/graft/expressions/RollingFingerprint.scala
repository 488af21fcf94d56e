package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expression: rolling polynomial fingerprint over the CODE
 * POINTS of a string — `acc ← (31·acc + codepoint) mod 1e9+7`, acc₀ = 0 —
 * the same value as the declarative fold
 * `aggregate(filter(split(c, ""), ch -> ch <> ""), 0L, (acc, ch) ->
 *  (acc*31 + ascii(ch)) % 1000000007)` and DuckDB's
 * `list_reduce(list_prepend(0, list_transform(string_split(text, ''),
 *  c -> unicode(c))), (a, b) -> (a*31 + b) % 1000000007)`.
 *
 * The fold formulation materializes a per-character string array and walks
 * it with an interpreted lambda tree per element (HOFs fall out of
 * whole-stage codegen) — measured as the CPU-hottest map stage in the
 * text pack. `doGenCode` compiles the same recurrence into a primitive
 * loop with zero allocation beyond one String decode. Every intermediate
 * stays below 31·(10⁹+7)+0x10FFFF < 2⁶⁵⁻¹ — ANSI-overflow-safe.
 */
case class RollingFingerprint(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"rolling_fp requires a string argument, got ${t.sql}")
  }
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    RollingFingerprint.of(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.RollingFingerprint.of($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)

  override def prettyName: String = "rolling_fp"
}

object RollingFingerprint {
  final val Mod = 1000000007L

  /** The shared kernel (interpreted + codegen paths call the same code). */
  def of(s: String): Long = {
    var acc = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      acc = (acc * 31L + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }
}
