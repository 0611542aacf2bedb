package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Nearest-centroid cell assignment against a FULL centroid matrix held
  * as one codegen reference object — the large-`nlist` IVF assignment
  * kernel. The literal-unrolled formulation
  * ([[graft.operators.Similarity]]'s struct-argmax over one
  * [[FixedDot]] per centroid) is ideal up to a few dozen cells but its
  * expression tree grows LINEARLY with nlist (nlist structs inside one
  * array_max): at the auto-derived nlist ≈ √N of a real corpus
  * (hundreds to thousands of cells) analysis/codegen cost explodes and
  * whole-stage codegen falls over the 64 KB method limit. Here the
  * matrix is a single `double[][]` reference and the argmax is a tight
  * nested Java loop — per-row cost nlist·dim fused multiply-adds, tree
  * size O(1) in nlist.
  *
  * Semantics mirror the unrolled path bit for bit on finite inputs
  * (IvfSpec pins parity): per-cell score is [[FixedDot]]'s exact
  * fixed-point sum `Σ floor(x·c·1e9 + 0.5)` in a long, argmax ties
  * resolve to the LOWEST cell id, and degenerate vectors — null input,
  * dimension mismatch, or any non-finite product — yield NULL (never
  * throw, never silently land in cell 0).
  */
case class NearestCell(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {

  require(centroids.nonEmpty && centroids.head.nonEmpty,
    "centroids must be a non-empty nlist x dim matrix")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> input, got $t")
  }

  override def dataType: DataType = IntegerType

  // introduces nulls (dim mismatch, non-finite products) even on
  // non-nullable input — same contract note as FixedDot
  override def nullable: Boolean = true

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "nearest_cell"

  private def elemIsDouble: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def nullSafeEval(input: Any): Any = {
    val r = NearestCellImpl.nearest(
      input.asInstanceOf[ArrayData], centroids, elemIsDouble)
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    // freshName: emitted code can nest inside another expression's
    // generated block, where a raw local would shadow an enclosing one
    // (Janino rejects shadowing -> silent interpreted fallback)
    val cell = ctx.freshName("ncCell")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |int $cell = graft.expressions.NearestCellImpl.nearest(
         |  $c, $cRef, $elemIsDouble);
         |if ($cell < 0) { ${ev.isNull} = true; } else { ${ev.value} = $cell; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCell =
    copy(child = newChild)
}

object NearestCellImpl {
  /** Argmax cell by exact fixed-point dot; −1 encodes NULL (dimension
    * mismatch, null element, or non-finite product anywhere — one
    * corrupt value poisons the row, matching FixedDot's null result on
    * ANY cell since every centroid multiplies the same element).
    */
  def nearest(vec: ArrayData, centroids: Array[Array[Double]],
      isDouble: Boolean): Int = {
    val dim = centroids(0).length
    if (vec.numElements() != dim) return -1
    val x = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (vec.isNullAt(i)) return -1
      x(i) = if (isDouble) vec.getDouble(i) else vec.getFloat(i).toDouble
      i += 1
    }
    var best = -1
    var bestS = Long.MinValue
    var c = 0
    while (c < centroids.length) {
      val cv = centroids(c)
      var s = 0L
      var d = 0
      while (d < dim) {
        val p = x(d) * cv(d) * 1e9 + 0.5
        if (java.lang.Double.isNaN(p) || java.lang.Double.isInfinite(p))
          return -1
        s += math.floor(p).toLong
        d += 1
      }
      if (s > bestS) { bestS = s; best = c }
      c += 1
    }
    best
  }
}
