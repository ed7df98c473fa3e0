package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** Codegen-STABLE nearest-centroid assignment for the iterative Lloyd loop
  * (SURVEY.md §2.6 M2, reference KMeans.java:93–103 semantics: scan in
  * centroid-idx order, strict `<`, first minimum wins).
  *
  * Why an Expression and not `array_min` over literal distance columns: a
  * double `Literal` inlines its VALUE into the generated Java source, so a
  * Lloyd loop that bakes each iteration's centroids into the plan produces
  * DIFFERENT source every iteration — a fresh Janino compile (~100s of ms)
  * × 2 plans × 20 iterations is what made the k-means queries dominate the
  * bench. Here the centroid coordinates travel through
  * `ctx.addReferenceObj` (the codegen `references` array), so every
  * iteration generates byte-identical source and hits Spark's codegen
  * cache; only the tiny reference objects change.
  *
  * Arithmetic is kept bit-identical to the previous literal formulation
  * (`(lat−cLat)·(lat−cLat) + (lon−cLon)·(lon−cLon)`, same op order) so the
  * golden-fixture convergence traces (iterations==12) are unchanged.
  */
case class NearestCentroid2D(left: Expression, right: Expression,
                             idxs: Seq[Int], lats: Seq[Double],
                             lons: Seq[Double])
    extends BinaryExpression {
  require(idxs.nonEmpty && idxs.length == lats.length &&
    idxs.length == lons.length,
    "graft_nearest_centroid needs equal-length non-empty centroid arrays")

  @transient private lazy val idxArr: Array[Int] = idxs.toArray
  @transient private lazy val latArr: Array[Double] = lats.toArray
  @transient private lazy val lonArr: Array[Double] = lons.toArray

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two double arguments (lat, lon)")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_nearest_centroid"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val lat = a.asInstanceOf[Double]
    val lon = b.asInstanceOf[Double]
    var best = idxArr(0)
    var bd = Double.PositiveInfinity
    var i = 0
    while (i < latArr.length) {
      val dl = lat - latArr(i)
      val dn = lon - lonArr(i)
      val d = dl * dl + dn * dn
      if (d < bd) { bd = d; best = idxArr(i) }
      i += 1
    }
    best
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val idxRef = ctx.addReferenceObj("cidxs", idxArr, "int[]")
      val latRef = ctx.addReferenceObj("clats", latArr, "double[]")
      val lonRef = ctx.addReferenceObj("clons", lonArr, "double[]")
      val i = ctx.freshName("i")
      val best = ctx.freshName("best")
      val bd = ctx.freshName("bd")
      val dl = ctx.freshName("dl")
      val dn = ctx.freshName("dn")
      val d = ctx.freshName("d")
      s"""
         |int $best = $idxRef[0];
         |double $bd = Double.POSITIVE_INFINITY;
         |for (int $i = 0; $i < $latRef.length; $i++) {
         |  final double $dl = $a - $latRef[$i];
         |  final double $dn = $b - $lonRef[$i];
         |  final double $d = $dl * $dl + $dn * $dn;
         |  if ($d < $bd) { $bd = $d; $best = $idxRef[$i]; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroid2D =
    copy(left = newLeft, right = newRight)
}

/** Vector (array<double>) nearest-centroid, same codegen-stability story as
  * [[NearestCentroid2D]], for the IVF coarse quantizer's Lloyd loop
  * (ml.KMeansVec). Distances are Σ(x_i−c_i)² over the common prefix; scan
  * in centroid order, strict `<`, first minimum wins.
  */
case class NearestVecCentroid(child: Expression, idxs: Seq[Int],
                              centroids: Seq[Seq[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(idxs.nonEmpty && idxs.length == centroids.length,
    "graft_nearest_vec_centroid needs equal-length non-empty centroid arrays")

  @transient private lazy val idxArr: Array[Int] = idxs.toArray
  @transient private lazy val cMat: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<double> argument")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_nearest_vec_centroid"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    var best = idxArr(0)
    var bd = Double.PositiveInfinity
    var c = 0
    while (c < cMat.length) {
      val cv = cMat(c)
      val n = math.min(x.numElements(), cv.length)
      var s = 0.0
      var i = 0
      while (i < n) {
        val dx = x.getDouble(i) - cv(i)
        s += dx * dx
        i += 1
      }
      if (s < bd) { bd = s; best = idxArr(c) }
      c += 1
    }
    best
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val idxRef = ctx.addReferenceObj("cidxs", idxArr, "int[]")
      val matRef = ctx.addReferenceObj("cmat", cMat, "double[][]")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val dx = ctx.freshName("dx")
      val cv = ctx.freshName("cv")
      val best = ctx.freshName("best")
      val bd = ctx.freshName("bd")
      s"""
         |int $best = $idxRef[0];
         |double $bd = Double.POSITIVE_INFINITY;
         |for (int $c = 0; $c < $matRef.length; $c++) {
         |  final double[] $cv = $matRef[$c];
         |  final int $n = java.lang.Math.min($a.numElements(), $cv.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $dx = $a.getDouble($i) - $cv[$i];
         |    $s += $dx * $dx;
         |  }
         |  if ($s < $bd) { $bd = $s; $best = $idxRef[$c]; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): NearestVecCentroid = copy(child = newChild)
}

/** Top-`k` nearest centroids of an array<double> vector, as an array<int>
  * of centroid idxs ordered (distance asc, idx asc) — the IVF PROBE
  * kernel. Replaces the `array_sort(array(struct(dist_0, 0), …))` device,
  * whose expression width grows with the LIST COUNT (an nlist-element
  * struct array built and sorted per row put a hard practical ceiling on
  * nlist); here the centroid matrix rides `ctx.addReferenceObj` exactly
  * like [[NearestVecCentroid]], so the generated source is byte-identical
  * at ANY nlist and the per-row cost is one O(nlist·d) scan with a
  * k-element insertion buffer (k = nprobe, a small constant).
  *
  * Tie-breaking matches the struct-sort device it replaces: strictly
  * smaller distance displaces; equal distance keeps the earlier idx (the
  * scan runs in ascending-idx order).
  */
case class TopKVecCentroids(child: Expression, idxs: Seq[Int],
                            centroids: Seq[Seq[Double]], k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(idxs.nonEmpty && idxs.length == centroids.length,
    "graft_topk_vec_centroids needs equal-length non-empty centroid arrays")
  require(k >= 1, "graft_topk_vec_centroids needs k >= 1")

  @transient private lazy val idxArr: Array[Int] = idxs.toArray
  @transient private lazy val cMat: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<double> argument")
  }
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_topk_vec_centroids"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val kk = math.min(k, cMat.length)
    val bd = Array.fill(kk)(Double.PositiveInfinity)
    val bi = new Array[Int](kk)
    var c = 0
    while (c < cMat.length) {
      val cv = cMat(c)
      val n = math.min(x.numElements(), cv.length)
      var s = 0.0
      var i = 0
      while (i < n) {
        val dx = x.getDouble(i) - cv(i)
        s += dx * dx
        i += 1
      }
      if (s < bd(kk - 1)) {
        var p = kk - 1
        while (p > 0 && s < bd(p - 1)) {
          bd(p) = bd(p - 1); bi(p) = bi(p - 1); p -= 1
        }
        bd(p) = s; bi(p) = idxArr(c)
      }
      c += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(bi)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val idxRef = ctx.addReferenceObj("cidxs", idxArr, "int[]")
      val matRef = ctx.addReferenceObj("cmat", cMat, "double[][]")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val dx = ctx.freshName("dx")
      val cv = ctx.freshName("cv")
      val kk = ctx.freshName("kk")
      val bd = ctx.freshName("bd")
      val bi = ctx.freshName("bi")
      val p = ctx.freshName("p")
      s"""
         |final int $kk = java.lang.Math.min($k, $matRef.length);
         |final double[] $bd = new double[$kk];
         |java.util.Arrays.fill($bd, Double.POSITIVE_INFINITY);
         |final int[] $bi = new int[$kk];
         |for (int $c = 0; $c < $matRef.length; $c++) {
         |  final double[] $cv = $matRef[$c];
         |  final int $n = java.lang.Math.min($a.numElements(), $cv.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $dx = $a.getDouble($i) - $cv[$i];
         |    $s += $dx * $dx;
         |  }
         |  if ($s < $bd[$kk - 1]) {
         |    int $p = $kk - 1;
         |    while ($p > 0 && $s < $bd[$p - 1]) {
         |      $bd[$p] = $bd[$p - 1]; $bi[$p] = $bi[$p - 1]; $p--;
         |    }
         |    $bd[$p] = $s; $bi[$p] = $idxRef[$c];
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions
         |  .UnsafeArrayData.fromPrimitiveArray($bi);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): TopKVecCentroids = copy(child = newChild)
}
