package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BoundReference, CaseWhen, GreaterThan, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.SparkSpec

/** Regression for the r9 shadowing find: graft kernels emit Java locals,
  * and when a kernel's code is inlined inside ANOTHER expression's
  * generated block (CASE WHEN branches nest child eval code), a raw
  * local name shadows the outer kernel's — Janino rejects shadowing and
  * `UnsafeProjection.create` silently fell back to INTERPRETED eval for
  * the whole projection (the banded near-dup verify ran interpreted
  * through r8). Every kernel local now goes through `ctx.freshName`;
  * this spec compiles the nesting shapes DIRECTLY via
  * `GenerateUnsafeProjection.generate`, which throws on a Janino error
  * instead of falling back — so the regression is loud.
  */
class CodegenNestingSpec extends SparkSpec {

  private val farr = ArrayType(FloatType, containsNull = true)
  private val a = BoundReference(0, farr, nullable = true)
  private val b = BoundReference(1, farr, nullable = true)

  private def nested(outer: org.apache.spark.sql.catalyst.expressions.Expression,
      inner: org.apache.spark.sql.catalyst.expressions.Expression) =
    CaseWhen(
      Seq((GreaterThan(outer, Literal(0.0)), inner)),
      Some(Literal(0.0)))

  test("CosineSim nests inside a CASE WHEN branch with another CosineSim") {
    val e = nested(CosineSim(a, b), CosineSim(b, a))
    GenerateUnsafeProjection.generate(Seq(e)) // throws on shadowing
  }

  test("FixedDot and PlaneDot nest inside CASE WHEN branches") {
    val w = Array(0.25, -0.5, 1.0)
    val e = CaseWhen(
      Seq((GreaterThan(PlaneDot(a, w), Literal(0.0)),
        FixedDot(a, b).asInstanceOf[
          org.apache.spark.sql.catalyst.expressions.Expression])),
      Some(Literal(0L)))
    GenerateUnsafeProjection.generate(Seq(e))
    // and the double-nesting: PlaneDot inside a branch guarded by PlaneDot
    val e2 = CaseWhen(
      Seq((GreaterThan(PlaneDot(a, w), Literal(0.0)), PlaneDot(b, w))),
      Some(Literal(0.0)))
    GenerateUnsafeProjection.generate(Seq(e2))
  }

  test("NearestCell nests under a CosineSim guard") {
    val cents = Array(Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0))
    val e = CaseWhen(
      Seq((GreaterThan(CosineSim(a, b), Literal(0.0)),
        org.apache.spark.sql.catalyst.expressions.Cast(
          NearestCell(a, cents), DoubleType))),
      Some(Literal(0.0)))
    GenerateUnsafeProjection.generate(Seq(e))
  }

  test("two kernels side by side in one projection compile") {
    GenerateUnsafeProjection.generate(Seq(
      CosineSim(a, b), CosineSim(b, a), FixedDot(a, b),
      PlaneDot(a, Array(1.0, 2.0, 3.0))))
  }
}
