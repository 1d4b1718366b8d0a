package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator as-of join as a first-class Catalyst citizen (SURVEY.md
  * §2.2 Q7; the tier-(c) extension path — logical node + planner strategy +
  * distributed physical operator). Spark has no native as-of join; the
  * engine's window rewrite (Relational.q7AsofJoin) expresses the semantics
  * with built-ins, while this operator executes them directly: for every
  * left row, the matching right row is the one with the greatest
  * `rightTs <= leftTs` within the same key (left outer semantics).
  *
  * Distribution contract: both children require ClusteredDistribution on
  * the key and (key, ts) ascending ordering — EnsureRequirements inserts
  * the one hash shuffle + in-partition sorts, after which each partition
  * merges its two sorted streams in a single O(n_left + n_right) pass with
  * O(1) state (the current candidate row). That is the textbook
  * merge-scan an ASOF-native engine runs, sharded by key across executors.
  *
  * Key and timestamp expressions must be LongType (the engine's id/epoch-ms
  * convention).
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    rightTieBreak: Option[Expression]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
      newRight: LogicalPlan): LogicalPlan = copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    rightTieBreak: Option[Expression]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  // the optional right tie-break makes equal-(key, ts) matches
  // deterministic (the merge keeps the LAST admissible row, i.e. the
  // greatest tie-break value — mirroring the window rewrite's ordering)
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)) ++
      rightTieBreak.map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  // zipPartitions preserves the left child's hash clustering — declaring it
  // lets a downstream groupBy/join on the key skip its shuffle
  override def outputPartitioning = left.outputPartitioning

  protected override def doExecute(): RDD[InternalRow] = {
    val lk = BindReferences.bindReference(leftKey, left.output)
    val lt = BindReferences.bindReference(leftTs, left.output)
    val rk = BindReferences.bindReference(rightKey, right.output)
    val rt = BindReferences.bindReference(rightTs, right.output)
    val rightSchema = right.output
    val allOutput = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val nullRight = new GenericInternalRow(rightSchema.length)
      val joined = new JoinedRow
      val toUnsafe = UnsafeProjection.create(allOutput, allOutput)
      val rBuf = rIter.buffered
      // candidate: last right row of the CURRENT left key with ts <= left ts
      var candidate: InternalRow = null
      var candidateKey = 0L
      lIter.map { lRow =>
        val keyV = lk.eval(lRow)
        val tsV = lt.eval(lRow)
        // SQL semantics: a NULL key or NULL ts never matches (left outer row)
        if (keyV == null || tsV == null) {
          toUnsafe(joined(lRow, nullRight))
        } else {
          val key = keyV.asInstanceOf[Long]
          val ts = tsV.asInstanceOf[Long]
          if (candidate != null && candidateKey != key) candidate = null
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val head = rBuf.head
            val hkV = rk.eval(head)
            // null right keys sort first (NULLS FIRST) and match nothing: skip
            if (hkV == null) { rBuf.next() }
            else {
              val hk = hkV.asInstanceOf[Long]
              if (hk < key) { rBuf.next() } // behind the current key: skip
              else if (hk == key) {
                val htV = rt.eval(head)
                if (htV == null) { rBuf.next() } // null ts matches nothing
                else if (htV.asInstanceOf[Long] <= ts) {
                  candidate = rBuf.next().copy() // newest admissible match
                  candidateKey = key
                } else advancing = false
              } else advancing = false // right stream is ahead; stop
            }
          }
          val r = if (candidate != null && candidateKey == key) candidate else nullRight
          toUnsafe(joined(lRow, r))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
      newRight: SparkPlan): SparkPlan = copy(left = newLeft, right = newRight)
}

/** Optimizer rule completing predicate pushdown for the custom node:
  * Catalyst's PushDownPredicates cannot see through unknown operators, so
  * `df.asofJoin(...).filter(left-only predicate)` would otherwise stop the
  * predicate above the join; splitting the conjunction and pushing the
  * left-referencing part below AsOfJoinPlan lets it keep sinking all the
  * way into the parquet scan. Right-side predicates must NOT be pushed:
  * under left-outer as-of semantics they filter match candidates, not
  * output rows.
  */
object PushFilterThroughAsOfJoin
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.plans.logical.Filter
  import org.apache.spark.sql.catalyst.expressions.And

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoinPlan) =>
      // deterministic-only, Catalyst's own PushDownPredicates contract: a
      // nondeterministic predicate (rand(), ...) evaluates against a
      // different row stream below the join, changing which rows survive
      val (pushable, kept) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic &&
          p.references.subsetOf(j.left.outputSet))
      if (pushable.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(pushable.reduce(And), j.left))
        kept.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tie) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tie) :: Nil
    case _ => Nil
  }
}

/** DataFrame-level entry point. Enable the strategy once per session via
  * `spark.experimental.extraStrategies` (done here idempotently) or
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
object AsOf {
  /** @param tieBreak right-side column ordering equal-(key, ts) rows; the
    *                 greatest value wins (None = engine order on ties)
    */
  def asofJoin(left: DataFrame, right: DataFrame,
      key: String, ts: String, tieBreak: Option[String] = None): DataFrame = {
    val spark = left.sparkSession
    // planner.strategies covers BOTH registration paths (extensions-injected
    // and experimental) — checking only extraStrategies would double-add
    // when the session came up with GraftExtensions
    val registered = spark.sessionState.planner.strategies.contains(AsOfJoinStrategy)
    if (!registered)
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    if (!spark.experimental.extraOptimizations.contains(PushFilterThroughAsOfJoin))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PushFilterThroughAsOfJoin
    val l = left.queryExecution.analyzed
    // self-join safety: when both inputs derive from one base relation the
    // attribute exprIds collide across children and Catalyst resolves/prunes
    // them against the wrong side — re-alias the right side to fresh ids
    // (the same dedup Dataset.join performs)
    val r = right.select(right.columns.map(c => right(c).as(c)): _*)
      .queryExecution.analyzed
    def attr(p: LogicalPlan, name: String,
        mustBeLong: Boolean = false): Attribute = {
      val a = p.output.find(_.name == name).getOrElse(
        sys.error(s"asofJoin: column $name not found in ${p.output.map(_.name)}"))
      // the exec casts key/ts to Long in its merge loop — enforce the
      // documented LongType contract HERE, at plan time, instead of a
      // cryptic executor-side ClassCastException per task (the tie-break
      // column only feeds a SortOrder, so any orderable type is fine there)
      require(!mustBeLong || a.dataType == org.apache.spark.sql.types.LongType,
        s"asofJoin: column $name must be LongType (epoch-ms / integral " +
          s"key), got ${a.dataType.simpleString} — cast it first")
      a
    }
    GraftBridge.ofRows(spark,
      AsOfJoinPlan(l, r,
        attr(l, key, mustBeLong = true), attr(r, key, mustBeLong = true),
        attr(l, ts, mustBeLong = true), attr(r, ts, mustBeLong = true),
        tieBreak.map(attr(r, _))))
  }
}
