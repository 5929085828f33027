package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Single-pass sign-LSH signature kernel, shared by interpreted eval and
  * generated code (the generated stage calls this static method — the
  * expression stays inside whole-stage codegen without inlining the plane
  * loops).
  *
  * Replaces the higher-order formulation
  * `transform(planesLit, p -> when(graft_dot(v, p) > 0, 1L)...)` + per-table
  * bit assembly: `ArrayTransform` evaluates its lambda through the
  * interpreter (HOFs have no codegen), which costs tables × bits
  * interpreted dot products PER ROW — fine at fixture scale, ruinous for a
  * billion-vector corpus. One kernel call computes every signature with the
  * planes resident in a primitive array.
  */
object LshKernel {

  /** Deterministic ±1 hyperplane component for (plane p, d): the parity of
    * the FIRST BYTE of md5("p:d") — i.e. the low bit of the second hex
    * char, exactly `('0x' || substr(md5(..), 1, 2))::INT % 2` in the DuckDB
    * oracle's plane CTE (SparkEntry q27/q56). Reproducible on any engine,
    * no RNG state to ship; the signatures, and therefore every candidate
    * set, derive from it. */
  private def planeComponent(md: MessageDigest, p: Int, d: Int): Double = {
    md.reset()
    val h = md.digest(s"$p:$d".getBytes("UTF-8"))
    if ((h(0) & 1) == 1) 1.0 else -1.0
  }

  /** Flattened plane matrix for `n` planes over `dim` components:
    * plane p component d at index p * dim + d. */
  def planes(n: Int, dim: Int): Array[Double] = {
    val md = MessageDigest.getInstance("MD5")
    val out = new Array[Double](n * dim)
    var p = 0
    while (p < n) {
      var d = 0
      while (d < dim) { out(p * dim + d) = planeComponent(md, p, d); d += 1 }
      p += 1
    }
    out
  }

  /** Per-table signatures of `v`: bit b of table t = sign of
    * dot(v, plane[t * bits + b]), summed left-to-right in index order like
    * [[DotProduct]] (bit-identical to the oracle's `list_dot_product`).
    * Vectors shorter than `dim` dot over their own length — the same
    * min-length semantics as the dot expression the HOF form used. NULL
    * elements contribute 0 to every dot (checked explicitly, so the
    * interpreted path cannot NPE and matches what unsafe rows read) —
    * kernel-level defense only: an oracle's list_dot_product would instead
    * propagate NULL, so `Similarity.sigFrame` excludes any vector carrying
    * a null element from the index BEFORE this kernel runs (both engines
    * agree by construction; the kernel's 0-contribution rule is never
    * observable through the library surface). */
  def compute(v: ArrayData, planes: Array[Double], dim: Int,
      bits: Int, tables: Int): ArrayData = {
    val n = math.min(v.numElements(), dim)
    val sigs = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var sig = 0L
      var b = 0
      while (b < bits) {
        val base = (t * bits + b) * dim
        var s = 0.0
        var i = 0
        while (i < n) {
          if (!v.isNullAt(i)) s += v.getDouble(i) * planes(base + i)
          i += 1
        }
        if (s > 0) sig |= (1L << b)
        b += 1
      }
      sigs(t) = sig
      t += 1
    }
    new GenericArrayData(sigs)
  }
}

/** array<double> → array<long> of length `tables`: element t is table t's
  * `bits`-bit sign-LSH bucket signature. Codegen-participating (the
  * generated stage makes one kernel call per row); the plane matrix is a
  * per-instance lazy primitive array, shipped to executors with the
  * expression. */
case class SignLshSigs(child: Expression, dim: Int, bits: Int, tables: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_lsh_sigs"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_lsh_sigs requires array<double>, got ${other.simpleString}")
    }
  }

  @transient private lazy val planeArr: Array[Double] =
    LshKernel.planes(tables * bits, dim)

  override def nullSafeEval(a: Any): Any =
    LshKernel.compute(a.asInstanceOf[ArrayData], planeArr, dim, bits, tables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("lshPlanes", planeArr, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |${ev.value} = graft.functions.LshKernel.compute(
         |  $v, $planesRef, $dim, $bits, $tables);
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshFunctions {
  /** Codegen'd multi-table sign-LSH signatures of an array<double> column. */
  def lshSigs(v: Column, dim: Int, bits: Int, tables: Int): Column =
    Bridge.column(SignLshSigs(Bridge.expression(v), dim, bits, tables))
}
