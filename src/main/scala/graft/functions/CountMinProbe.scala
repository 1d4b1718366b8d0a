package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst point-query against a Count–Min sketch counter grid —
  * the codegen'd replacement for a `udf(t => cms.estimateCount(t))` probe
  * (SURVEY.md §2.2 X4m).
  *
  * Why: the probe side of a CMS frequency check is the distinct-token
  * table — 31 rows at fixture scale, but the billion-row vocabulary at
  * crawl scale. A Scala UDF there severs whole-stage codegen and pays
  * UTF8String→String conversion per row; this expression inlines a
  * seven-iteration hash-grid min next to the aggregation (the
  * `DotProductFloat` pattern) and hashes the UTF8String's bytes in place,
  * zero copies.
  *
  * Semantics contract: bit-identical to
  * `org.apache.spark.util.sketch.CountMinSketch.estimateCount(String)` —
  * `h1 = murmur3_32(bytes, seed=0)`, `h2 = murmur3_32(bytes, seed=h1)`,
  * row i probes bucket `abs((h1 + i*h2) % width)`, result is the min
  * counter (verified against the real sketch in `CountMinProbeSpec`,
  * including the codegen path). The grid is embedded as a reference
  * object — for the x4m shapes that's the same ~10 KB the broadcast
  * carried; tasks share the one deserialized array per executor.
  */
case class CountMinProbe(child: Expression, table: Array[Long],
    depth: Int, width: Int) extends UnaryExpression {
  require(table.length == depth * width,
    s"grid ${table.length} != depth $depth * width $width")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cms_probe requires a string argument, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cms_probe"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val h1 = Murmur3_x86_32.hashUnsafeBytes(
      s.getBaseObject, s.getBaseOffset, s.numBytes, 0)
    val h2 = Murmur3_x86_32.hashUnsafeBytes(
      s.getBaseObject, s.getBaseOffset, s.numBytes, h1)
    var min = Long.MaxValue
    var i = 0
    while (i < depth) {
      val b = math.abs((h1 + i * h2) % width)
      val v = table(i * width + b)
      if (v < min) min = v
      i += 1
    }
    min
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val grid = ctx.addReferenceObj("cmsGrid", table, "long[]")
    nullSafeCodeGen(ctx, ev, s => {
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val v = ctx.freshName("v")
      val min = ctx.freshName("min")
      s"""
         |int $h1 = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(
         |  $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 0);
         |int $h2 = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(
         |  $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), $h1);
         |long $min = Long.MAX_VALUE;
         |for (int $i = 0; $i < $depth; $i++) {
         |  int $b = java.lang.Math.abs(($h1 + $i * $h2) % $width);
         |  long $v = $grid[$i * $width + $b];
         |  if ($v < $min) $min = $v;
         |}
         |${ev.value} = $min;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CountMinProbe {
  /** Grid + shape parsed from `CountMinSketch.writeTo` V1 bytes. */
  final case class Grid(depth: Int, width: Int, table: Array[Long])

  /** Parse the serialized sketch the `count_min_sketch` aggregate emits.
    * V1 layout (verified empirically against `CountMinSketch.readFrom`):
    * int version, long totalCount, int depth, int width, long[depth]
    * hashA (used only for long-item hashing — the string probe derives
    * both hashes from the bytes, so hashA is skipped here), then the
    * row-major long[depth*width] counter table.
    */
  def parse(bytes: Array[Byte]): Grid = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val version = in.readInt()
    require(version == 1, s"unsupported CountMinSketch wire version $version")
    in.readLong() // totalCount
    val depth = in.readInt()
    val width = in.readInt()
    var i = 0
    while (i < depth) { in.readLong(); i += 1 } // hashA
    val table = new Array[Long](depth * width)
    i = 0
    while (i < table.length) { table(i) = in.readLong(); i += 1 }
    Grid(depth, width, table)
  }

  /** Column form: `cmsProbe(parse(sketchBytes), $"token")`. */
  def probe(grid: Grid, c: Column): Column =
    GraftBridge.column(CountMinProbe(
      GraftBridge.expression(c), grid.table, grid.depth, grid.width))

  /** SQL form: `SELECT cms_probe(token, sketch_hex)` — the grid rides as
    * a hex-string literal of the serialized sketch (SQL has no binary
    * literal that survives every client), parsed once at plan time per
    * literal. Registered by [[graft.functions.GraftExtensions]] next to
    * `dot_f32`.
    */
  val info = new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
    classOf[CountMinProbe].getName, "cms_probe")
  val builder: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
      org.apache.spark.sql.catalyst.expressions.Expression = { exprs =>
    require(exprs.length == 2,
      "cms_probe takes (token, sketch_hex_literal)")
    val hex = exprs(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v, _) if v != null =>
        v.toString
      // AnalysisException, not IllegalArgumentException: the builder runs
      // at function resolution, so a non-literal sketch argument is an
      // ANALYSIS error and must surface as one (standard error class with
      // the non-foldable-input template), not as a runtime-looking failure
      case other => throw new org.apache.spark.sql.AnalysisException(
        errorClass = "DATATYPE_MISMATCH.NON_FOLDABLE_INPUT",
        messageParameters = Map(
          "sqlExpr" -> s"cms_probe(${exprs.head.sql}, ${other.sql})",
          "inputName" -> "`sketch_hex`",
          "inputType" -> "\"STRING\" literal",
          "inputExpr" -> other.sql))
    }
    val bytes = hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val g = parse(bytes)
    CountMinProbe(exprs.head, g.table, g.depth, g.width)
  }
}
