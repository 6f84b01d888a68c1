package org.apache.spark.sql.graftbridge

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.classic
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Which ranking function's `<= k` filter this top-k reproduces.
  * `RowNumber` keeps exactly k rows per key (ties broken by heap order,
  * deterministic when the SortOrder is total); `Rank` and `DenseRank`
  * keep EVERY row whose (dense) rank is ≤ k — boundary ties survive, so
  * per-key output size is data-dependent (exactly the ranking functions'
  * own semantics, which is why no "unique tiebreaker" guard is needed to
  * rewrite them soundly).
  */
sealed trait TopKMode
object TopKMode {
  case object RowNumber extends TopKMode
  case object Rank extends TopKMode
  case object DenseRank extends TopKMode
}

/** Logical "retain the first `k` child rows per distinct `keys` value
  * under `order`" — the whole-operator custom plan of the build brief's
  * (c) tier. Spark's only built-in spelling is
  * `row_number().over(Window.partitionBy(keys).orderBy(order)) <= k`,
  * whose physical plan shuffles EVERY row to its key's partition and
  * fully sorts each partition. This node plans to a two-phase bounded-heap
  * exec ([[TopKPerKeyExec]]): the map side keeps at most k rows per key
  * per input partition, so the exchange carries ≤ k·parts rows per key
  * instead of all of them and nothing is ever globally sorted — the
  * difference between "top-5 neighbors per query over 100 TB of
  * candidates" being exchange-bound or not. `mode` selects row_number
  * (exact k) or rank/dense_rank (keep boundary ties) semantics; the
  * map-side truncation stays lossless in every mode because a row's
  * (dense) rank in any subset is ≤ its rank in the full data.
  */
case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan,
    mode: TopKMode = TopKMode.RowNumber) extends UnaryNode {
  require(k > 0, s"top-k per key needs k > 0, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Physical bounded-heap top-k per key. `partial = true` instances run
  * map-side with no distribution requirement (a per-partition k-truncation
  * — top-k is associative, so truncating before the exchange is lossless);
  * the `partial = false` instance requires [[ClusteredDistribution]] on
  * the keys, which EnsureRequirements satisfies with a hash exchange of
  * the already-truncated stream. Per partition it keeps one k-bounded
  * worst-out binary heap per observed key: O(rows · log k) time,
  * O(keys · k) memory, no sort buffer. Output order within a key is
  * unspecified (heap order) — callers sequence results, same contract as
  * aggregation.
  */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan,
    mode: TopKMode = TopKMode.RowNumber) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else if (keys.isEmpty) AllTuples :: Nil // global top-k: one final heap
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = mode match {
    case TopKMode.RowNumber => executeRowNumber()
    case _ => executeRankLike()
  }

  private def executeRowNumber(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitionsInternal { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowOrd = RowOrdering.create(sortOrder, childOutput)
      // head of each heap = the WORST retained row (largest under the
      // requested order), so admission is a single O(1) peek + O(log k)
      // replace; SortOrder ties resolve exactly as a sort would.
      val worstFirst = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int =
          rowOrd.compare(b, a)
      }
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj.apply(row)
        var heap = heaps.get(key)
        if (heap == null) {
          // initial capacity is NOT k: PriorityQueue eagerly allocates the
          // backing array, and a large k would cost O(k) memory per key
          // before any row is admitted — let it grow to at most k instead
          heap = new java.util.PriorityQueue[InternalRow](
            math.min(limit, 16), worstFirst)
          heaps.put(key.copy(), heap) // copy: the projection reuses its buffer
        }
        if (heap.size < limit) {
          heap.add(row.copy()) // copy: the child iterator reuses row buffers
        } else if (rowOrd.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }
  }

  /** rank()/dense_rank() ≤ k with ties. Per key: a TreeMap ordered by the
    * SortOrder whose entries are tie-buckets (rows comparing equal). A
    * bucket survives iff its rank qualifies — for `Rank`, the row count
    * in strictly-better buckets is < k; for `DenseRank`, its bucket index
    * is < k — which prunes from the tail in O(log #buckets) amortized per
    * row. Memory is O(qualifying rows) per key: bounded by k buckets
    * (dense) / k + boundary ties (rank), exactly the operator's output —
    * ties at the boundary are semantically required output, not overhead.
    */
  private def executeRankLike(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val childOutput = child.output
    val dense = mode == TopKMode.DenseRank
    child.execute().mapPartitionsInternal { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowOrd = RowOrdering.create(sortOrder, childOutput)
      val cmp = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int =
          rowOrd.compare(a, b)
      }
      // per key: (tie-buckets ordered best-first, total retained rows)
      final class KeyState {
        val buckets = new java.util.TreeMap[InternalRow, java.util.ArrayList[InternalRow]](cmp)
        var total = 0L
      }
      val states = new java.util.HashMap[UnsafeRow, KeyState]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj.apply(row)
        var st = states.get(key)
        if (st == null) {
          st = new KeyState
          states.put(key.copy(), st)
        }
        val rc = row.copy() // the child iterator reuses row buffers
        val existing = st.buckets.get(rc)
        if (existing != null) {
          existing.add(rc)
          st.total += 1
        } else {
          val b = new java.util.ArrayList[InternalRow](1)
          b.add(rc)
          st.buckets.put(rc, b)
          st.total += 1
        }
        // prune disqualified tail buckets
        if (dense) {
          while (st.buckets.size() > limit) {
            val last = st.buckets.pollLastEntry()
            st.total -= last.getValue.size()
          }
        } else {
          var last = st.buckets.lastEntry()
          while (last != null && st.total - last.getValue.size() >= limit) {
            st.buckets.pollLastEntry()
            st.total -= last.getValue.size()
            last = st.buckets.lastEntry()
          }
        }
      }
      states.values().iterator().asScala.flatMap(
        _.buckets.values().iterator().asScala.flatMap(_.iterator().asScala))
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Plans [[TopKPerKey]] as partial-exec → (exchange) → final-exec, the
  * same shape Catalyst gives a two-phase aggregate. Injected via
  * `SparkSessionExtensions.injectPlannerStrategy` (graft.GraftExtensions).
  */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child, mode) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child), mode),
        mode) :: Nil
    case _ => Nil
  }
}

/** Optimizer rewrite: the declarative top-k idiom
  *
  * {{{
  *   df.withColumn("rn", row_number().over(Window.partitionBy(k).orderBy(o)))
  *     .filter($"rn" <= 5).drop("rn")
  * }}}
  *
  * becomes [[TopKPerKey]] whenever the rank column is discarded above the
  * filter — users keep the standard spelling, the engine substitutes the
  * bounded-heap plan. (Spark's own InsertWindowGroupLimit only *prepends*
  * a group-limit to the window; the full per-partition sort survives it.
  * This rule removes the Window node entirely, which is only sound when
  * nothing downstream reads the rank — hence the parent guard.)
  *
  * Matched shapes (round-5 widening):
  *  - ranking functions: `row_number()` (exact-k mode), `rank()` and
  *    `dense_rank()` (keep-ties modes — sound with NO uniqueness guard
  *    because [[TopKMode.Rank]]/[[TopKMode.DenseRank]] reproduce the
  *    functions' own boundary-tie semantics);
  *  - limit conjunct spelled either way around: `rn <= k`, `rn < k`,
  *    `rn = 1`, `k >= rn`, `k > rn`, `1 = rn`;
  *  - conjunctions: `rn <= k AND p(...)` splits — the rank-free residual
  *    predicates stay in a Filter ABOVE the top-k (the rank is computed
  *    before them in the original plan, so the two filters commute);
  *  - parents: a Project that drops the rank, or an Aggregate that never
  *    references it (the shape `.filter(rn <= k).groupBy(...)` leaves
  *    when built-in ColumnPruning has not inserted the projection yet).
  */
object RowNumberToTopKRule extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions._
  import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, Window}

  private def limitOf(cond: Expression, rank: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rank) => Some(k)
    case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rank) => Some(k - 1)
    case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rank) => Some(k)
    case GreaterThan(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rank) => Some(k - 1)
    case EqualTo(a: Attribute, IntegerLiteral(1)) if a.semanticEquals(rank) => Some(1)
    case EqualTo(IntegerLiteral(1), a: Attribute) if a.semanticEquals(rank) => Some(1)
    case _ => None
  }

  private def modeOf(fn: Expression): Option[TopKMode] = fn match {
    case _: RowNumber => Some(TopKMode.RowNumber)
    case _: Rank => Some(TopKMode.Rank)
    case _: DenseRank => Some(TopKMode.DenseRank)
    case _ => None
  }

  /** `Filter(cond, Window(single ranking fn))` → `[Filter(residual,)]
    * TopKPerKey` when cond contains a usable rank limit and the caller
    * guarantees the rank attribute is unreferenced above.
    */
  private def rewriteFilterOnWindow(plan: LogicalPlan): Option[(LogicalPlan, Attribute)] =
    plan match {
      case Filter(cond, Window(Seq(alias @ Alias(WindowExpression(fn, _), _)),
          partSpec, orderSpec, child, _)) if orderSpec.nonEmpty =>
        val rank = alias.toAttribute
        modeOf(fn).flatMap { mode =>
          val conjuncts = splitConjunctivePredicates(cond)
          val limits = conjuncts.flatMap(limitOf(_, rank))
          val residual = conjuncts.filter(limitOf(_, rank).isEmpty)
          if (limits.isEmpty || limits.min <= 0 ||
              residual.exists(_.references.contains(rank))) None
          else {
            val topk = TopKPerKey(partSpec, orderSpec, limits.min, child, mode)
            Some((residual.reduceOption(And).map(Filter(_, topk)).getOrElse(topk), rank))
          }
        }
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList, f: Filter) =>
      rewriteFilterOnWindow(f) match {
        case Some((rewritten, rank)) if !projectList.exists(_.references.contains(rank)) =>
          Project(projectList, rewritten)
        case _ => p
      }
    case a @ Aggregate(_, _, f: Filter, _) =>
      rewriteFilterOnWindow(f) match {
        case Some((rewritten, rank)) if !a.references.contains(rank) =>
          a.copy(child = rewritten)
        case _ => a
      }
  }
}

/** Column pruning through [[TopKPerKey]]. The node is limit-like
  * (`output = child.output`), so Spark's built-in ColumnPruning cannot see
  * which child columns are actually needed and a user selecting 2 columns
  * above a top-k still scans every column below it — on a wide 100 TB
  * table that erases the operator's exchange win. This rule supplies the
  * missing knowledge: when a Project (optionally over a Filter) sits on a
  * TopKPerKey whose child produces more columns than
  * `parent.references ∪ keys ∪ order`, it inserts a Project on the child
  * restricted to that set. Built-in ColumnPruning then pushes the inserted
  * Project the rest of the way to the scan (it runs in the same fixed
  * point when this rule is injected via GraftExtensions), and V1 file-scan
  * planning collapses it into the scan's ReadSchema. ColumnPruning also
  * makes the Project-parent shape canonical: any other parent that needs a
  * column subset (Aggregate, Join, …) gets a Project inserted directly
  * above this node by the built-in rule, which this rule then sees.
  * Idempotent: after the rewrite the child's outputSet equals the
  * required set, so the strict-superset guard stops re-firing.
  */
object TopKColumnPruningRule extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.AttributeSet
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project}

  private def prune(t: TopKPerKey, parentRefs: AttributeSet): Option[TopKPerKey] = {
    val required = parentRefs ++ AttributeSet(t.keys) ++ AttributeSet(t.order)
    val kept = t.child.output.filter(required.contains)
    // kept.nonEmpty guards the degenerate all-literal projection; Spark
    // plans zero-column scans poorly and the win there is nil anyway
    if (kept.nonEmpty && kept.size < t.child.output.size)
      Some(t.copy(child = Project(kept, t.child)))
    else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList, t: TopKPerKey) =>
      prune(t, AttributeSet(projectList)).map(nt => p.copy(child = nt)).getOrElse(p)
    case p @ Project(projectList, f @ Filter(cond, t: TopKPerKey)) =>
      // a residual Filter above the top-k (predicates are NOT pushable
      // through it — filtering before truncation changes which rows win)
      prune(t, AttributeSet(projectList) ++ cond.references)
        .map(nt => p.copy(child = f.copy(child = nt))).getOrElse(p)
  }
}

/** DataFrame-level entry point (the bridge lives in this package because
  * `Dataset.ofRows` is `private[sql]` in Spark 4).
  */
object TopKPerKeyApi {
  /** First k rows per `keyCols` group under `orderCols` (wrap columns in
    * `.asc`/`.desc`; bare columns default to ascending). `mode` selects
    * exact-k (row_number) or keep-boundary-ties (rank / dense_rank)
    * semantics.
    */
  def topKPerKey(df: DataFrame, keyCols: Seq[Column], orderCols: Seq[Column], k: Int,
      mode: TopKMode = TopKMode.RowNumber): DataFrame = {
    // Eager conversion: ExpressionUtils.expression wraps the column node
    // lazily (ColumnNodeExpression), and the analyzer does not rewrite
    // that wrapper inside third-party logical nodes — the raw (and
    // non-serializable) sql.internal AST would ride into the task
    // closure. The classic converter turns the node into a pure catalyst
    // tree up front; UnresolvedAttributes then resolve normally.
    def toExpr(c: Column) = classic.ColumnNodeToExpressionConverter(c.node)
    val keys = keyCols.map(toExpr)
    val order = orderCols.map(c => toExpr(c) match {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    })
    val session = df.sparkSession.asInstanceOf[classic.SparkSession]
    Dataset.ofRows(session, TopKPerKey(keys, order, k, df.queryExecution.analyzed, mode))
  }
}
