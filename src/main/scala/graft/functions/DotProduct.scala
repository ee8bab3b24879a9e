package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native dot product over two `array<double>` columns.
  *
  * Bit-identical to the declarative fold it replaces —
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)`, i.e. a strict
  * left-to-right IEEE-754 sum of products — so every DuckDB oracle
  * (`list_reduce(list_transform(...), (x,y) -> x+y)`) still matches
  * exactly. The difference is execution: higher-order-function
  * expressions are `CodegenFallback` (interpreted, per-element lambda
  * dispatch, three materialized intermediate arrays), while this
  * expression emits one fused loop into whole-stage codegen. Brute-force
  * similarity scoring is exactly the shape where that matters: the fold
  * runs once per *pair*, N×M times per query.
  *
  * Null semantics: null array → null (standard `BinaryExpression`
  * null-safety); element nulls read as 0-bits are not expected (embedding
  * arrays are dense; the fold variant would return null instead — the
  * engine never feeds element-null arrays to either form).
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  // no ExpectsInputTypes (AbstractDataType is private[sql]); this function
  // is engine-internal and always built over array<double> inputs
  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

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
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
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

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Session registration for graft's native expressions. */
object GraftFunctions {

  val dotName = "graft_dot"

  /** Idempotent per-session registration; query builders call this before
    * using [[dot]]. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(FunctionIdentifier(dotName))) {
      registry.registerFunction(
        FunctionIdentifier(dotName),
        new ExpressionInfo(classOf[DotProduct].getName, dotName),
        (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1)))
    }
  }

  /** Codegen'd dot product column; requires [[register]] on the session. */
  def dot(a: Column, b: Column): Column = call_function(dotName, a, b)
}
