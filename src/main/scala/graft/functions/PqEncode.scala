package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native product-quantization encoder: maps an `array<bigint>` vector to
  * its `m` PQ codes (argmin squared-L2 codebook entry per subspace, ties
  * to the lower entry id) in one tight loop over the unboxed `ArrayData`.
  *
  * Semantically identical to the composed formulation
  * ([[graft.ops.Similarity.pqCodesComposed]]: per-entry
  * `slice`/`LongVecDot`/`array_position(array_min)`) but ~`m × k` plan
  * nodes collapse into ONE expression: the composed tree at m=16, k=64 is
  * ~10k nodes — measurably slow to *plan* (~0.4 s/query) and its codegen
  * allocates a sliced copy of the vector per codebook entry. The kernel
  * reads the subvector in place; the codebook and entry norms ride along
  * as flattened reference arrays (plan-time constants, the
  * [[graft.ops.Similarity.collectCodebook]] contract).
  *
  * The argmin metric drops the subvector's own square norm (constant per
  * subspace — cannot change the argmin): `d(c) = ‖cb_c‖² − 2⟨v_mm, cb_c⟩`.
  */
case class PqEncode(child: Expression, codebook: Array[Long],
                    norms: Array[Long], m: Int, k: Int, subDim: Int)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"requires array<bigint> input, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    PqEncode.encode(v.asInstanceOf[ArrayData], codebook, norms, m, k, subDim)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "long[]")
    val nRef = ctx.addReferenceObj("pqNorms", norms, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqEncode.encode($c, $cbRef, $nRef, $m, $k, $subDim)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)

  override def prettyName: String = "pq_encode"

  // Case-class equals/hashCode would compare the Array fields by reference,
  // so two structurally identical encoders would never be semanticEquals —
  // defeating Catalyst canonicalization / common-subexpression elimination.
  // Compare the codebook by value instead.
  override def equals(other: Any): Boolean = other match {
    case that: PqEncode =>
      child == that.child && m == that.m && k == that.k &&
        subDim == that.subDim &&
        java.util.Arrays.equals(codebook, that.codebook) &&
        java.util.Arrays.equals(norms, that.norms)
    case _ => false
  }

  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(m), Integer.valueOf(k),
      Integer.valueOf(subDim),
      Integer.valueOf(java.util.Arrays.hashCode(codebook)),
      Integer.valueOf(java.util.Arrays.hashCode(norms)))
}

object PqEncode {
  /** Static kernel for both interpreted and generated code paths.
    * `cb` is `[m][k][subDim]` flattened; `norms` is `[m][k]` flattened.
    */
  def encode(v: ArrayData, cb: Array[Long], norms: Array[Long],
             m: Int, k: Int, subDim: Int): ArrayData = {
    val out = new Array[Long](m)
    var mm = 0
    while (mm < m) {
      val vOff = mm * subDim
      var best = Long.MaxValue
      var bestC = 0L
      var c = 0
      while (c < k) {
        val cbOff = (mm * k + c) * subDim
        var dot = 0L
        var i = 0
        while (i < subDim) {
          dot += v.getLong(vOff + i) * cb(cbOff + i)
          i += 1
        }
        val d = norms(mm * k + c) - 2L * dot
        if (d < best) { best = d; bestC = c } // strict <: ties keep lower c
        c += 1
      }
      out(mm) = bestC
      mm += 1
    }
    new GenericArrayData(out)
  }

  /** Column builder over the collected codebook structure. */
  def apply(v: Column, cb: Array[Array[(Array[Long], Long)]],
            subDim: Int): Column = {
    val m = cb.length
    val k = cb(0).length
    val flat = cb.flatMap(_.flatMap(_._1))
    val norms = cb.flatMap(_.map(_._2))
    ColumnBridge.column(
      PqEncode(ColumnBridge.expression(v), flat, norms, m, k, subDim))
  }
}
