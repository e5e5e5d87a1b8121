package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for the vector kernels (SURVEY.md §4.3
  * escalation path: built-in < Expression < UDF). Unlike higher-order
  * functions AND Scala UDFs, these participate in whole-stage codegen —
  * the generated code is a primitive double loop with no boxing, no
  * encoder round-trip, and no closure dispatch.
  *
  * Inputs are `array<double>` (callers cast); element nulls are treated
  * as 0-contributing per `ArrayData.getDouble` semantics — embedding
  * columns are containsNull-free in practice.
  */
object VectorExpressions {

  /** Σ aᵢ·bᵢ over the common prefix — left-to-right accumulation (same
    * fold order as the UDF/HOF forms and DuckDB's list kernels, so results
    * are bit-identical across implementations).
    */
  case class ArrayDotProduct(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "array_dot"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += $a.getDouble($i) * $b.getDouble($i);
           |}
           |${ev.value} = $s;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  /** √(Σ aᵢ²) — L2 norm. */
  case class ArrayL2Norm(child: Expression) extends UnaryExpression {

    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "array_l2norm"

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      var s = 0.0
      var i = 0
      val n = x.numElements()
      while (i < n) { val v = x.getDouble(i); s += v * v; i += 1 }
      math.sqrt(s)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => {
        val fn = ctx.addNewFunction("graftL2Norm",
          s"""
             |private double graftL2Norm(org.apache.spark.sql.catalyst.util.ArrayData arr) {
             |  double s = 0.0;
             |  int n = arr.numElements();
             |  for (int i = 0; i < n; i++) { double v = arr.getDouble(i); s += v * v; }
             |  return java.lang.Math.sqrt(s);
             |}
           """.stripMargin)
        s"$fn($a)"
      })

    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  private def asD(c: Column): Column = c.cast("array<double>")

  /** Column API. */
  def array_dot(a: Column, b: Column): Column =
    GraftExpressionBridge.column(ArrayDotProduct(
      GraftExpressionBridge.expression(asD(a)), GraftExpressionBridge.expression(asD(b))))

  def array_l2norm(a: Column): Column =
    GraftExpressionBridge.column(ArrayL2Norm(GraftExpressionBridge.expression(asD(a))))

  def array_cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.{lit, when}
    val d = array_l2norm(a) * array_l2norm(b)
    when(d > 0, array_dot(a, b) / d).otherwise(lit(0.0))
  }

  /** SQL registration: `SELECT array_dot(a, b), array_l2norm(a) FROM ...`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_dot", exprs => ArrayDotProduct(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_l2norm", exprs => ArrayL2Norm(exprs.head), "built-in")
  }
}
