package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe shared by interpreted eval and generated code.
  *
  * Probes with the UTF-8 bytes directly (`mightContainBinary`), which is
  * bit-identical to the `putString` path `DataFrameStatFunctions
  * .bloomFilter` used at build time (both hash the UTF-8 encoding) but
  * skips the UTF8String→java.lang.String copy the old UDF paid per row. */
object BloomKernel {
  def mightContain(bc: Broadcast[BloomFilter], key: UTF8String): Boolean =
    bc.value.mightContainBinary(key.getBytes)
}

/** `might_contain(key)` against a driver-built broadcast [[BloomFilter]] as
  * a native codegen expression — the map-side Bloom prefilter of
  * [[graft.operators.Curation.bloomDedup]] without the Scala-UDF codegen
  * break (same standard as [[Simhash]] / the vector expressions).
  *
  * Holds the broadcast HANDLE, not the filter: task binaries serialize the
  * few-hundred-byte handle and executors fetch the (budget-gated, up to
  * 256 MB) filter once per JVM from the block manager, exactly as the UDF
  * closure did — but the probe call is generated inline, so the filter
  * stage stays inside whole-stage codegen. */
case class BloomMightContain(child: Expression, bloom: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_might_contain"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_might_contain requires string, got ${other.simpleString}")
    }
  }

  override def nullSafeEval(input: Any): Any =
    BloomKernel.mightContain(bloom, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBc", bloom,
      classOf[Broadcast[BloomFilter]].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BloomKernel.mightContain($bcRef, $c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BloomFunctions {
  /** Bloom membership of a string column against a broadcast filter. */
  def mightContain(key: Column, bloom: Broadcast[BloomFilter]): Column =
    Bridge.column(BloomMightContain(Bridge.expression(key), bloom))
}
