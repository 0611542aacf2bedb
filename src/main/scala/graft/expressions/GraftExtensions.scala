package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL-surface registration of the engine's native expressions via the
  * public `SparkSessionExtensions` API:
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
  *   // or .withExtensions(new GraftExtensions)
  * ...
  * spark.sql("SELECT dot_fixed(a.embedding, b.embedding) FROM ...")
  * }}}
  *
  * The DataFrame API does not need this — [[graft.operators.Similarity]]
  * builds the expression directly.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** name → (implementing class, builder, usage) per injected function. */
  val functions: Seq[(String, String, Seq[Expression] => Expression, String)] = Seq(
    ("dot_fixed", classOf[FixedDot].getName,
      (children: Seq[Expression]) => {
        require(children.length == 2, "dot_fixed takes exactly 2 arguments")
        FixedDot(children.head, children(1))
      },
      "dot_fixed(a, b) - exact fixed-point dot product of two float arrays"),
    ("cosine_sim", classOf[CosineSim].getName,
      (children: Seq[Expression]) => {
        require(children.length == 2, "cosine_sim takes exactly 2 arguments")
        CosineSim(children.head, children(1))
      },
      "cosine_sim(a, b) - cosine similarity of two float arrays"),
    ("token_array", classOf[TokenArray].getName,
      (children: Seq[Expression]) => {
        require(children.length == 1, "token_array takes exactly 1 argument")
        TokenArray(children.head)
      },
      "token_array(text) - whitespace tokens, empties removed"),
    ("shingle_array", classOf[ShingleArray].getName,
      (children: Seq[Expression]) => {
        require(children.length == 2, "shingle_array takes exactly 2 arguments")
        ShingleArray(children.head, litInt(children(1), "shingle_array's n"))
      },
      "shingle_array(tokens, n) - word n-gram shingles over a token array"),
    ("shingle_hash64", classOf[ShingleHash64].getName,
      (children: Seq[Expression]) => {
        require(children.length == 2, "shingle_hash64 takes exactly 2 arguments")
        ShingleHash64(children.head, litInt(children(1), "shingle_hash64's n"))
      },
      "shingle_hash64(text, n) - xxhash64 of each word n-gram shingle"),
    ("token_profile", classOf[TokenProfile].getName,
      (children: Seq[Expression]) => {
        require(children.length == 1, "token_profile takes exactly 1 argument")
        // the canonical word-list vector (stopwords + language markers),
        // matching graft.functions.TextFunctions so SQL results agree
        // with the DataFrame surface
        TokenProfile(children.head,
          graft.functions.TextFunctions.stopwordsEn +:
            graft.functions.TextFunctions.langMarkers.map(_._2))
      },
      "token_profile(text) - struct<n_tokens, n_unique, n_chars, hits> in one pass"),
    ("scale_array", classOf[ScaleArray].getName,
      (children: Seq[Expression]) => {
        require(children.length == 2, "scale_array takes exactly 2 arguments")
        ScaleArray(children.head, litFloat(children(1), "scale_array's factor"))
      },
      "scale_array(vec, factor) - each element of a float array times a literal factor"),
    ("deflate_ratio", classOf[DeflateRatio].getName,
      (children: Seq[Expression]) => {
        require(children.length == 1, "deflate_ratio takes exactly 1 argument")
        DeflateRatio(children.head)
      },
      "deflate_ratio(text) - deflated/raw UTF-8 length; low = repetitive"),
    ("plane_dot", classOf[PlaneDot].getName,
      (children: Seq[Expression]) => {
        require(children.length == 2, "plane_dot takes exactly 2 arguments")
        PlaneDot(children.head,
          litDoubleArray(children(1), "plane_dot's weights"))
      },
      "plane_dot(vec, array(w0, w1, ...)) - dot of a float array with a literal plane"),
    ("theta_sketch_agg", classOf[ThetaSketchAgg].getName,
      (children: Seq[Expression]) => {
        require(children.length == 2, "theta_sketch_agg takes 2 arguments")
        ThetaSketchAgg(children.head,
          litInt(children(1), "theta_sketch_agg's lgK")).toAggregateExpression()
      },
      "theta_sketch_agg(col, lgK) - compact theta sketch of distinct values"),
    ("theta_union_agg", classOf[ThetaUnionAgg].getName,
      (children: Seq[Expression]) => {
        require(children.length == 2, "theta_union_agg takes 2 arguments")
        ThetaUnionAgg(children.head,
          litInt(children(1), "theta_union_agg's lgK")).toAggregateExpression()
      },
      "theta_union_agg(sketch, lgK) - union of stored compact sketches"),
    ("theta_estimate", classOf[ThetaEstimate].getName,
      (children: Seq[Expression]) => {
        require(children.length == 1, "theta_estimate takes 1 argument")
        ThetaEstimate(children.head)
      },
      "theta_estimate(sketch) - distinct-count estimate"),
    ("theta_intersect", classOf[ThetaIntersect].getName,
      (children: Seq[Expression]) => {
        require(children.length == 2, "theta_intersect takes 2 arguments")
        ThetaIntersect(children.head, children(1))
      },
      "theta_intersect(a, b) - sketch of the set intersection"),
    ("theta_a_not_b", classOf[ThetaANotB].getName,
      (children: Seq[Expression]) => {
        require(children.length == 2, "theta_a_not_b takes 2 arguments")
        ThetaANotB(children.head, children(1))
      },
      "theta_a_not_b(a, b) - sketch of the set difference a \\ b"),
    ("freq_sketch_agg", classOf[FreqSketchAgg].getName,
      (children: Seq[Expression]) => {
        require(children.length == 2, "freq_sketch_agg takes 2 arguments")
        FreqSketchAgg(children.head,
          litInt(children(1), "freq_sketch_agg's maxMapSize"))
          .toAggregateExpression()
      },
      "freq_sketch_agg(item, maxMapSize) - Misra-Gries frequency sketch"),
    ("freq_merge_agg", classOf[FreqMergeAgg].getName,
      (children: Seq[Expression]) => {
        require(children.length == 2, "freq_merge_agg takes 2 arguments")
        FreqMergeAgg(children.head,
          litInt(children(1), "freq_merge_agg's maxMapSize"))
          .toAggregateExpression()
      },
      "freq_merge_agg(sketch, maxMapSize) - union of frequency sketches"),
    ("freq_lower_bound", classOf[FreqLowerBound].getName,
      (children: Seq[Expression]) => {
        require(children.length == 2, "freq_lower_bound takes 2 arguments")
        FreqLowerBound(children.head, children(1))
      },
      "freq_lower_bound(sketch, item) - guaranteed lower count bound"),
    ("freq_upper_bound", classOf[FreqUpperBound].getName,
      (children: Seq[Expression]) => {
        require(children.length == 2, "freq_upper_bound takes 2 arguments")
        FreqUpperBound(children.head, children(1))
      },
      "freq_upper_bound(sketch, item) - guaranteed upper count bound"),
    ("kll_sketch_agg", classOf[KllSketchAgg].getName,
      (children: Seq[Expression]) => {
        require(children.length == 2, "kll_sketch_agg takes 2 arguments")
        KllSketchAgg(children.head,
          litInt(children(1), "kll_sketch_agg's k")).toAggregateExpression()
      },
      "kll_sketch_agg(col, k) - KLL quantile sketch of a numeric column"),
    ("kll_merge_agg", classOf[KllMergeAgg].getName,
      (children: Seq[Expression]) => {
        require(children.length == 2, "kll_merge_agg takes 2 arguments")
        KllMergeAgg(children.head,
          litInt(children(1), "kll_merge_agg's k")).toAggregateExpression()
      },
      "kll_merge_agg(sketch, k) - merge of stored KLL sketches"),
    ("kll_quantile", classOf[KllQuantile].getName,
      (children: Seq[Expression]) => {
        require(children.length == 2, "kll_quantile takes 2 arguments")
        KllQuantile(children.head, children(1))
      },
      "kll_quantile(sketch, q) - inclusive-rank quantile value"),
    ("kll_rank", classOf[KllRank].getName,
      (children: Seq[Expression]) => {
        require(children.length == 2, "kll_rank takes 2 arguments")
        KllRank(children.head, children(1))
      },
      "kll_rank(sketch, value) - inclusive normalized rank"),
    ("kll_n", classOf[KllN].getName,
      (children: Seq[Expression]) => {
        require(children.length == 1, "kll_n takes 1 argument")
        KllN(children.head)
      },
      "kll_n(sketch) - exact update count carried by a sketch"))

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case _ => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $e")
  }

  private def litFloat(e: Expression, what: String): Float = e match {
    case Literal(v: Float, _) => v
    case Literal(v: Double, _) => v.toFloat
    case Literal(v: Int, _) => v.toFloat
    case _ => throw new IllegalArgumentException(
      s"$what must be a numeric literal, got $e")
  }

  private def litDoubleArray(e: Expression, what: String): Array[Double] =
    e match {
      // array(1.0, 2.0, ...) arrives as CreateArray of literals
      case org.apache.spark.sql.catalyst.expressions.CreateArray(elems, _)
          if elems.forall(_.isInstanceOf[Literal]) =>
        elems.map {
          case Literal(v: Double, _) => v
          case Literal(v: Float, _) => v.toDouble
          case Literal(v: Int, _) => v.toDouble
          case Literal(v: Long, _) => v.toDouble
          case other => throw new IllegalArgumentException(
            s"$what must contain numeric literals, got $other")
        }.toArray
      case lit @ Literal(_, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, _)) =>
        lit.value.asInstanceOf[
          org.apache.spark.sql.catalyst.util.ArrayData].toDoubleArray()
      case _ => throw new IllegalArgumentException(
        s"$what must be a literal double array, got $e")
    }

  override def apply(ext: SparkSessionExtensions): Unit =
    functions.foreach { case (name, className, builder, usage) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(className, null, name, usage, ""),
        builder))
    }
}
