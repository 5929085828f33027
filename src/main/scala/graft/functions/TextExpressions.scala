package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Single-pass SimHash kernel, shared by interpreted eval and generated
  * code (the generated stage calls this static method — the expression
  * stays inside whole-stage codegen without inlining the md5 loop). */
object SimhashKernel {
  def compute(arr: ArrayData): Long = {
    val md = MessageDigest.getInstance("MD5")
    val seen = new java.util.HashSet[String]()
    val votes = new Array[Int](60)
    var idx = 0
    while (idx < arr.numElements()) {
      val tok = arr.getUTF8String(idx).toString
      if (tok.nonEmpty && seen.add(tok)) {
        val d = md.digest(tok.getBytes("UTF-8")) // digest() resets md
        var h = 0L
        var i = 0
        while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
        h = h >>> 4 // keep the first 15 hex chars = top 60 bits
        var j = 0
        while (j < 60) {
          votes(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
      idx += 1
    }
    var fp = 0L
    var j = 0
    while (j < 60) { if (votes(j) > 0) fp |= 1L << j; j += 1 }
    fp
  }
}

/** 60-bit SimHash of a token array as a single-pass native expression.
  *
  * Replaces the relational formulation (explode tokens × explode 60 bit
  * positions → two aggregations ≈ a 60× row blow-up through the shuffle)
  * with one per-row pass: md5 each distinct token, accumulate per-bit votes
  * locally, emit the fingerprint. No shuffle at all, and codegen-friendly
  * (the generated stage calls [[SimhashKernel.compute]] directly).
  *
  * Bit-compatible with the portable SQL definition used by the oracle:
  * token hash = first 15 hex chars of md5 (== the top 60 bits of the first
  * 8 digest bytes), fingerprint bit j set iff the vote sum over distinct
  * tokens is positive.
  */
case class Simhash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    import org.apache.spark.sql.types.{ArrayType, StringType}
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_simhash requires array<string>, got ${other.simpleString}")
    }
  }

  override def nullSafeEval(input: Any): Any =
    SimhashKernel.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimhashKernel.compute($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object TextFunctions {
  /** SimHash fingerprint of an array<string> token column. */
  def simhash(tokens: Column): Column =
    Bridge.column(Simhash(Bridge.expression(tokens)))
}
