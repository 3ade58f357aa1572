package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.BridgeTypes.AbstractDataType
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** IVF cell assignment: the ids of the `keep` nearest centroids (by
  * cosine) for an array<double> vector with precomputed norm, in one
  * native loop.
  *
  * The centroid set rides as CONSTRUCTOR DATA (≤ nCentroids×dim
  * doubles in the task binary — the same bytes a typedlit would
  * carry), not as child expressions: a transform/sort_array HOF
  * formulation evaluates nCentroids interpreted dot products per
  * corpus row — the exact interpreted-HOF hot-path trap the other
  * native expressions exist to avoid. Ordering matches the previous
  * formulation exactly: ascending (−dot/(norm·cnorm), centroid id),
  * sequential-order double math. */
case class NearestCells(left: Expression, right: Expression,
                        centroids: Seq[(Long, Seq[Double], Double)], keep: Int)
    extends BinaryExpression with ExpectsInputTypes {
  require(centroids.nonEmpty, "NearestCells needs at least one centroid")
  require(keep >= 1, s"keep must be >= 1, got $keep")

  // left = vector (array<double>), right = its precomputed L2 norm
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), DoubleType)
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType,
    containsNull = false)

  @transient private lazy val ids: Array[Long] = centroids.map(_._1).toArray
  @transient private lazy val vecs: Array[Array[Double]] = centroids.map(_._2.toArray).toArray
  @transient private lazy val norms: Array[Double] = centroids.map(_._3).toArray

  /** Called from both interpreted eval and generated code. */
  def cells(vec: ArrayData, norm: Double): ArrayData = {
    val m = ids.length
    val neg = new Array[Double](m)
    var c = 0
    while (c < m) {
      val cv = vecs(c)
      val n = math.min(vec.numElements(), cv.length)
      var acc = 0.0
      var i = 0
      while (i < n) { acc += vec.getDouble(i) * cv(i); i += 1 }
      neg(c) = -acc / (norm * norms(c))
      c += 1
    }
    // rank by (negsim, id) ascending — identical to sorting an array
    // of struct(negsim, cell); centroid counts are small, so a simple
    // index sort is fine
    val order = Array.range(0, m)
    val boxed = order.map(Integer.valueOf)
    java.util.Arrays.sort(boxed, (a: Integer, b: Integer) => {
      val d = java.lang.Double.compare(neg(a), neg(b))
      if (d != 0) d else java.lang.Long.compare(ids(a), ids(b))
    })
    val k = math.min(keep, m)
    val out = new Array[Long](k)
    var j = 0
    while (j < k) { out(j) = ids(boxed(j)); j += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    cells(a.asInstanceOf[ArrayData], b.asInstanceOf[java.lang.Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCells", this, classOf[NearestCells].getName)
    nullSafeCodeGen(ctx, ev, (x, y) => s"${ev.value} = $ref.cells($x, $y);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): NearestCells =
    copy(left = l, right = r)
}

object NearestCells {
  import org.apache.spark.sql.graftbridge.Bridge

  def nearestCells(vec: Column, norm: Column,
                   centroids: Seq[(Long, Seq[Double], Double)], keep: Int): Column =
    Bridge.toColumn(NearestCells(
      Bridge.toExpression(vec), Bridge.toExpression(norm), centroids, keep))
}
