package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expression: Unicode NFC normalization
 * (`java.text.Normalizer`, the JDK's ICU-derived implementation of
 * UAX #15 canonical composition). The multilingual-dedup front step the
 * engine otherwise lacks: "é" arrives from crawls both precomposed
 * (U+00E9) and decomposed (U+0065 U+0301) — byte-different, canonically
 * equal — so digest keys, line hashes, MinHash shingles, and exact-dup
 * groups all split unless text normalizes first. DuckDB's
 * `nfc_normalize` implements the same UAX #15 transform, which is what
 * makes the oracle replay exact.
 *
 * Spark has no built-in for this; a Scala UDF would fall out of
 * whole-stage codegen on the hottest map stage of any crawl pipeline.
 * `doGenCode` emits a direct call — one fast-path check
 * (`Normalizer.isNormalized`, O(n) scan, zero allocation for the
 * already-NFC overwhelming majority of real text) and one String
 * round-trip only when composition actually fires.
 */
case class UnicodeNormalize(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nfc requires a string argument, got ${t.sql}")
  }
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalize.of(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.UnicodeNormalize.of($c)")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)

  override def prettyName: String = "nfc"
}

object UnicodeNormalize {

  /** The shared kernel (interpreted + codegen paths call the same code).
    * Fast paths: pure-ASCII input returns the SAME UTF8String without
    * even decoding (one byte scan); already-NFC non-ASCII input decodes
    * once but allocates nothing further. */
  def of(s: UTF8String): UTF8String = {
    if (s.isFullAscii) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
