package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd INTEGER matrix-vector product
  * `graft_imatvec(x: array<long>, m: array<array<long>>) →
  * array<long>` with `out[k] = Σ_d x[d]·m[k][d]` — the hot loop of the
  * OPQ rotation encode ([[graft.operators.Ann.qPqRotate]]): rotating N
  * vectors into the eigenbasis is O(N·d²) multiply-adds, and the
  * higher-order-function formulation (`transform(m, row →
  * aggregate(zip_with(x, row, _*_), 0L, _+_))`) pays per-element
  * lambda/boxing overhead d² times per row — measured 13 s at the 10×
  * sweep where this expression runs the same arithmetic as two tight
  * primitive loops. Exact integer semantics (the rotation contract:
  * micro fixed-point, no float drift), overflow-free by construction
  * for the encode's ranges (|x| ≤ 1e3, |m| ≤ 1e6, d = 64 →
  * |out| ≤ 6.4e10).
  *
  * NULL on any row-length mismatch — the zip_with-pads-with-null
  * analogue, kept strict so a malformed rotation artifact fails loud. */
case class MatVecMicro(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(ArrayType(LongType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_imatvec expects (array<bigint>, array<array<bigint>>), got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
    }

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val m = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val k = m.numElements()
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      val row = m.getArray(i)
      if (row == null || row.numElements() != n) return null
      var s = 0L
      var d = 0
      while (d < n) { s += x.getLong(d) * row.getLong(d); d += 1 }
      out(i) = s
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val n = ctx.freshName("n")
      val kk = ctx.freshName("kk")
      val s = ctx.freshName("s")
      val out = ctx.freshName("out")
      val row = ctx.freshName("row")
      val ad = classOf[ArrayData].getName
      val gad = classOf[GenericArrayData].getName
      s"""
         |int $n = $a.numElements();
         |int $kk = $b.numElements();
         |long[] $out = new long[$kk];
         |for (int $i = 0; $i < $kk; $i++) {
         |  $ad $row = $b.getArray($i);
         |  if ($row == null || $row.numElements() != $n) {
         |    ${ev.isNull} = true; break;
         |  }
         |  long $s = 0L;
         |  for (int $d = 0; $d < $n; $d++) {
         |    $s += $a.getLong($d) * $row.getLong($d);
         |  }
         |  $out[$i] = $s;
         |}
         |if (!${ev.isNull}) ${ev.value} = new $gad($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MatVecMicro =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_imatvec"
}
