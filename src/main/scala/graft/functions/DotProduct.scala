package graft.functions

import org.apache.spark.sql.{Column, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expression for float32-vector dot products — the hot
  * kernel of the similarity operators (SURVEY.md §2.2 X3).
  *
  * Why an Expression and not a UDF or higher-order function: `doGenCode`
  * emits a tight primitive loop that whole-stage codegen inlines next to
  * the join, with zero boxing, zero per-element Column-expression overhead
  * (the 64-term `element_at` chain re-checks bounds/null per term), and no
  * serialization wall like a Scala UDF.
  *
  * Determinism contract: accumulates left-to-right in double — EXACTLY the
  * same IEEE operation sequence as the generated SQL chain
  * `a[1]*b[1] + ... + a[n]*b[n]` that the DuckDB oracle runs, so results
  * stay bit-identical across engines. Interpreted `nullSafeEval` and
  * generated code paths are the same loop.
  *
  * Null elements inside the arrays are not expected (embedding columns);
  * a null array (either side) yields null via `nullIntolerant`.
  */
case class DotProductFloat(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"dot_f32 requires two array<float> arguments, got ${l.sql} and ${r.sql}")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_f32"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // mismatched lengths are DATA CORRUPTION, not a truncation request: a
    // silent min-length partial dot returns a plausible-looking score
    // that reorders similarity rankings and never surfaces the bad row
    if (x.numElements() != y.numElements())
      throw new IllegalArgumentException(
        "dot_f32: embedding length mismatch (" + x.numElements() + " vs " +
          y.numElements() + ")")
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "dot_f32: embedding length mismatch (" + $a.numElements() +
         |      " vs " + $b.numElements() + ")");
         |}
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** [[DotProductFloat]]'s exact-integer sibling for the quantized-vector
  * paths (x3k's Lloyd steps): BIGINT multiply-accumulate over two
  * `array<long>` columns. Replaces the interpreted
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (s, x) -> s + x)`
  * chain — higher-order functions are CodegenFallback and allocate an
  * intermediate array per row — with a whole-stage-codegen primitive
  * loop (guide: eliminate non-codegen expressions in the hot path).
  * BIGINT addition is associative and exact, so the result is
  * bit-identical to the HOF chain and to the oracle's SUM over unnested
  * products; overflow wraps exactly like Spark's non-ANSI `*`/`+`.
  */
case class DotProductLong(left: Expression, right: Expression)
    extends BinaryExpression {
  import org.apache.spark.sql.types.LongType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"dot_i64 requires two array<bigint> arguments, got ${l.sql} and ${r.sql}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_i64"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements())
      throw new IllegalArgumentException(
        "dot_i64: vector length mismatch (" + x.numElements() + " vs " +
          y.numElements() + ")")
    val n = x.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      s += x.getLong(i) * y.getLong(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "dot_i64: vector length mismatch (" + $a.numElements() +
         |      " vs " + $b.numElements() + ")");
         |}
         |int $n = $a.numElements();
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Column-API and SQL-registry exposure of the native expression. */
object VectorFunctions {
  /** DataFrame form: `df.select(dotF32($"a", $"b"))`. */
  def dotF32(a: Column, b: Column): Column =
    GraftBridge.column(
      DotProductFloat(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** DataFrame form: `df.select(dotI64($"a", $"b"))`. */
  def dotI64(a: Column, b: Column): Column =
    GraftBridge.column(
      DotProductLong(GraftBridge.expression(a), GraftBridge.expression(b)))

  val info = new ExpressionInfo(classOf[DotProductFloat].getName, "dot_f32")
  val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, "dot_f32 takes exactly 2 arguments")
    DotProductFloat(exprs.head, exprs(1))
  }

  /** Session-local SQL registration: `SELECT dot_f32(a.embedding, b.embedding)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_f32", builder, "built-in")
}

/** SparkSessionExtensions entry point:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("dot_f32"),
      VectorFunctions.info, VectorFunctions.builder))
    e.injectFunction((FunctionIdentifier("cms_probe"),
      CountMinProbe.info, CountMinProbe.builder))
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    e.injectOptimizerRule(_ => graft.plans.PushFilterThroughAsOfJoin)
  }
}
