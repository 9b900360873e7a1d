package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftshim.Shims

/** Whole-operator top-k-per-group as a custom Catalyst plan — the one
  * place the SURVEY escalation rule (§2.9: compose built-ins → custom
  * Expression → custom LogicalPlan + Strategy + SparkPlan) reaches tier
  * (c). The composed form (`row_number() over (partition by g order by
  * s) <= k`, W3/O3 in SURVEY §2.5) must shuffle EVERY row to its group's
  * partition and sort it there. This operator instead runs a bounded
  * per-group heap BEFORE the exchange (partial phase) and again after
  * (final phase) — the same two-phase shape as partial aggregation:
  *
  *   scan → TopKPerGroup(partial) → Exchange(hash by group) → TopKPerGroup(final)
  *
  * At 100 TB the partial phase caps shuffle volume at (groups × k) rows
  * per map partition instead of the full fact table, and nothing sorts —
  * heap maintenance is O(n log k) with k-row memory per group, no spill
  * pressure. Result rows are emitted unordered (top-k is a set); callers
  * wanting ranked output sort the ≤ groups×k survivors, which is free by
  * comparison.
  *
  * Registered via `SparkSessionExtensions.injectPlannerStrategy`
  * (Session.configure) with an idempotent `experimental.extraStrategies`
  * fallback for sessions built elsewhere.
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Plans the logical node as partial → (exchange via EnsureRequirements)
  * → final. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      val partial = TopKPerGroupExec(g, o, k, isFinal = false, planLater(child))
      TopKPerGroupExec(g, o, k, isFinal = true, partial) :: Nil
    case _ => Nil
  }
}

/** Physical bounded-heap top-k per group. The partial phase accepts any
  * input distribution; the final phase requires clustering on the group
  * key, so EnsureRequirements inserts exactly one hash exchange between
  * the two — fed only each map partition's local top-k survivors. */
case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    isFinal: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (!isFinal) UnspecifiedDistribution :: Nil
    else if (groupExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  protected override def doExecute(): RDD[InternalRow] = {
    val (g, o, attrs, kk) = (groupExprs, order, child.output, k)
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(g, attrs)
      val ord = GenerateOrdering.generate(o, attrs)
      // max-heap under `ord`: peek() is the WORST retained row, so a new
      // row enters iff it beats the worst; memory is bounded at k rows
      // per live group key.
      val worstFirst = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int = ord.compare(b, a)
      }
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kk + 1, worstFirst)
          heaps.put(key.copy(), heap) // projection reuses its buffer: copy
        }
        if (heap.size < kk) heap.add(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(row.copy())
        }
      }
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** Public API + extension registration. */
object TopK {

  /** For `SparkSession.Builder.withExtensions` (Session.configure). */
  val extensions: SparkSessionExtensions => Unit =
    _.injectPlannerStrategy(_ => TopKStrategy)

  /** Idempotent runtime registration for already-built sessions. */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(TopKStrategy))
      exp.extraStrategies = TopKStrategy +: exp.extraStrategies
  }

  /** Top `k` rows of `df` per `groupCols` group under `orderCols` (use
    * `.desc`/`.asc` Columns; a bare Column means ascending). Give the
    * order a total tie-break (unique id last) for deterministic output.
    */
  def perGroup(df: DataFrame, groupCols: Seq[Column], orderCols: Seq[Column],
      k: Int): DataFrame = {
    ensureRegistered(df.sparkSession)
    val o = orderCols.map(c => Shims.catalystExpression(c) match {
      case s: SortOrder => s
      case e => SortOrder(e, Ascending)
    })
    Shims.ofRows(df.sparkSession,
      TopKPerGroup(groupCols.map(Shims.catalystExpression), o, k,
        Shims.analyzedPlan(df)))
  }
}
