package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** All random-hyperplane LSH signatures of one vector in ONE kernel:
  * output[t] has bit h set iff `dot(vec, planes[t][h]) >= 0` — exactly the
  * semantics of the per-plane `Similarity.signature` composition, computed
  * bit-identically (sequential dot over the common prefix, `>= 0` test).
  *
  * Why an Expression and not `bits × tables` composed dot-product columns:
  * the planner-driven parameters for borderline thresholds land around
  * 4 bits × 45 tables over dim-64 vectors — as composed columns that is
  * ~180 dot expressions each carrying a 64-element DOUBLE-LITERAL array,
  * ~11k Literal nodes whose values inline into the generated Java source:
  * a huge projection to analyze, codegen, and Janino-compile (measured as
  * the dominant cost of the LSH ANN/near-dup queries, and it recompiles
  * whenever the plane values change). Here the whole [tables][bits][dim]
  * tensor rides `ctx.addReferenceObj` (the codegen `references` array), so
  * the generated source is three tiny loops, byte-identical across any
  * plane values — same codegen-stability story as [[NearestVecCentroid]].
  */
case class HyperplaneSignatures(child: Expression,
                                planes: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {
  require(planes.nonEmpty && planes.forall(_.nonEmpty),
    "graft_hyperplane_sigs needs a non-empty [tables][bits][dim] tensor")
  require(planes.forall(_.length <= 64),
    "graft_hyperplane_sigs packs one table's bits into a long: bits <= 64")

  @transient private lazy val pMat: Array[Array[Array[Double]]] =
    planes.map(_.map(_.toArray).toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<double> argument")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hyperplane_sigs"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val out = new Array[Long](pMat.length)
    var t = 0
    while (t < pMat.length) {
      val tp = pMat(t)
      var sig = 0L
      var h = 0
      while (h < tp.length) {
        val p = tp(h)
        val n = math.min(x.numElements(), p.length)
        var s = 0.0
        var i = 0
        while (i < n) { s += x.getDouble(i) * p(i); i += 1 }
        if (s >= 0.0) sig |= (1L << h)
        h += 1
      }
      out(t) = sig
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val matRef = ctx.addReferenceObj("planes", pMat, "double[][][]")
      val t = ctx.freshName("t")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val tp = ctx.freshName("tp")
      val p = ctx.freshName("p")
      val sig = ctx.freshName("sig")
      val out = ctx.freshName("out")
      s"""
         |final long[] $out = new long[$matRef.length];
         |for (int $t = 0; $t < $matRef.length; $t++) {
         |  final double[][] $tp = $matRef[$t];
         |  long $sig = 0L;
         |  for (int $h = 0; $h < $tp.length; $h++) {
         |    final double[] $p = $tp[$h];
         |    final int $n = java.lang.Math.min($a.numElements(), $p.length);
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $s += $a.getDouble($i) * $p[$i];
         |    }
         |    if ($s >= 0.0) $sig |= (1L << $h);
         |  }
         |  $out[$t] = $sig;
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): HyperplaneSignatures = copy(child = newChild)
}
