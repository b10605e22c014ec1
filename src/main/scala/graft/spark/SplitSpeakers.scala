package graft.spark

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `split_speakers(heading)` — the reference's Character-heading name
  * splitting (Analyzer.php:399-463 via graft.analyze.DocAnalyzer) as a
  * native Catalyst Expression: heading -> array<struct<speaker,modifier>>
  * with normalization and CONT'D-modifier suppression.
  *
  * A native Expression rather than a Scala UDF for the same reason as
  * [[ExtractTurn]]: no per-row Row boxing/encoder round-trip, and the
  * surrounding explode/project stages stay inside whole-stage codegen
  * (this kernel itself evaluates via CodegenFallback).
  */
case class SplitSpeakersExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = SplitSpeakers.schema
  override def prettyName: String = "split_speakers"

  override protected def nullSafeEval(input: Any): Any = {
    val heading = input.asInstanceOf[UTF8String].toString
    val pairs = Pipeline.splitSpeakerNamesWithModifiers(heading)
    val rows = new Array[Any](pairs.length)
    var i = 0
    pairs.foreach { case (name, mod) =>
      rows(i) = new GenericInternalRow(Array[Any](
        UTF8String.fromString(name), UTF8String.fromString(mod)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override protected def withNewChildInternal(c: Expression): SplitSpeakersExpr =
    copy(child = c)
}

object SplitSpeakers {
  val schema: ArrayType = ArrayType(StructType(Seq(
    StructField("speaker", StringType, nullable = false),
    StructField("modifier", StringType, nullable = false))),
    containsNull = false)

  def apply(c: Column): Column = Bridge.column(SplitSpeakersExpr(Bridge.expression(c)))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "split_speakers", e => SplitSpeakersExpr(e.head), "scala_udf")
}
