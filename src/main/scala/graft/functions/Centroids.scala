package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Loop-based nearest-centroid kernels for IVF assignment/probing.
  *
  * Why not the expression-tree form (one `struct(dot(v, lit(c)), -i)`
  * per centroid inside a `sort_array`)? That unrolls O(nlist·dim)
  * CODE into the generated projection. At the legacy fixed nlist=16 it
  * was harmless; with √n-scaled cell counts (`AnnIndex.nlistFor` —
  * 1 400+ cells at the ×1000 probe) the generated method blows past
  * the JIT's method-size limits and runs INTERPRETED — the ×1000 scale
  * probe caught a single assignment task burning 27 CPU-minutes.
  * These kernels keep the centroid MATRIX as a references-array
  * object (the BpeTokens/CandidateQueries discipline) and run a tight
  * data-driven loop that stays inside whole-stage codegen and JITs at
  * any nlist — per-row cost is nlist·dim multiply-adds, code size
  * constant.
  *
  * ORDER CONTRACT (identical to the sort_array form they replace):
  * similarity dot(v, c)/nrm descending, centroid INDEX ascending on
  * ties — implemented by strict `>` while scanning indices in
  * ascending order, with the same j-ascending accumulation order, so
  * the sims are bit-identical and assignments match artifacts built
  * by either path. */
object CentroidImpl {

  def nearest(v: ArrayData, nrm: Double, cents: Array[Array[Double]]): Int = {
    var best = 0
    var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val cc = cents(c)
      var d = 0.0
      var j = 0
      while (j < cc.length) { d += v.getDouble(j) * cc(j); j += 1 }
      val s = d / nrm
      if (s > bestSim) { bestSim = s; best = c }
      c += 1
    }
    best
  }

  /** The `n` best cell indices in (sim desc, index asc) order — the
    * query-side probe list. Insertion against a size-n buffer: a tie
    * at the boundary keeps the earlier index (strict `>`), and the
    * sift stops at equal sims (earlier index stays ahead). */
  def topCells(v: ArrayData, nrm: Double, cents: Array[Array[Double]],
               n: Int): ArrayData = {
    val k = math.min(n, cents.length)
    val idx = new Array[Int](k)
    val sim = new Array[Double](k)
    var filled = 0
    var c = 0
    while (c < cents.length) {
      val cc = cents(c)
      var d = 0.0
      var j = 0
      while (j < cc.length) { d += v.getDouble(j) * cc(j); j += 1 }
      val s = d / nrm
      if (filled < k) {
        var pos = filled
        while (pos > 0 && sim(pos - 1) < s) {
          sim(pos) = sim(pos - 1); idx(pos) = idx(pos - 1); pos -= 1
        }
        sim(pos) = s; idx(pos) = c
        filled += 1
      } else if (s > sim(k - 1)) {
        var pos = k - 1
        while (pos > 0 && sim(pos - 1) < s) {
          sim(pos) = sim(pos - 1); idx(pos) = idx(pos - 1); pos -= 1
        }
        sim(pos) = s; idx(pos) = c
      }
      c += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(idx, filled))
  }
}

object Centroids {

  case class NearestCell(left: Expression, right: Expression,
                         cents: Array[Array[Double]])
      extends BinaryExpression with Serializable {
    override def dataType: DataType = IntegerType
    override def nullSafeEval(v: Any, n: Any): Any =
      CentroidImpl.nearest(v.asInstanceOf[ArrayData],
        n.asInstanceOf[Double], cents)
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode = {
      val m = ctx.addReferenceObj("cents", cents, "double[][]")
      defineCodeGen(ctx, ev,
        (a, b) => s"graft.functions.CentroidImpl.nearest($a, $b, $m)")
    }
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): NearestCell = copy(left = l, right = r)
    override def prettyName: String = "nearest_cell"
  }

  case class TopCells(left: Expression, right: Expression,
                      cents: Array[Array[Double]], n: Int)
      extends BinaryExpression with Serializable {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullSafeEval(v: Any, nr: Any): Any =
      CentroidImpl.topCells(v.asInstanceOf[ArrayData],
        nr.asInstanceOf[Double], cents, n)
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode = {
      val m = ctx.addReferenceObj("cents", cents, "double[][]")
      defineCodeGen(ctx, ev,
        (a, b) => s"graft.functions.CentroidImpl.topCells($a, $b, $m, $n)")
    }
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): TopCells = copy(left = l, right = r)
    override def prettyName: String = "top_cells"
  }

  def nearest_cell(cents: Array[Array[Double]], v: Column,
                   nrm: Column): Column =
    GraftShim.toColumn(NearestCell(GraftShim.toExpression(v),
      GraftShim.toExpression(nrm), cents))

  def top_cells(cents: Array[Array[Double]], v: Column, nrm: Column,
                n: Int): Column =
    GraftShim.toColumn(TopCells(GraftShim.toExpression(v),
      GraftShim.toExpression(nrm), cents, n))
}
