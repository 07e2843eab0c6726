package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.Bridge

import scala.collection.mutable

/** Native top-k-per-group — the full custom-operator ladder (logical node
  * → Strategy → physical exec), used where composing built-ins genuinely
  * leaves performance behind: the window formulation
  * (`row_number() OVER (PARTITION BY k ORDER BY v) <= n`, rq14) SORTS
  * EVERY group's full row set inside WindowExec before discarding all but
  * k rows, an O(n log n)-per-group price and (in Spark's implementation)
  * a full shuffle of raw rows. This operator keeps a bounded heap of k
  * rows per key: a PARTIAL pass runs before the exchange (map-side
  * combine — each upstream partition forwards at most k rows per local
  * key, which is what survives at 100 TB where the shuffle, not the CPU,
  * is the bottleneck), then a FINAL pass after clustering merges the
  * partials. O(n log k) comparisons, shuffle volume capped at
  * partitions × keys × k rows. Memory is bounded by local-keys × k rows
  * — the hash-aggregate class (and like map-side combine it degrades
  * gracefully: correctness never depends on the partial pass).
  *
  * Ties: callers must pass a TOTAL order (tie-break on a unique column) —
  * the same contract rq14's deterministic oracle already imposes; the
  * boundary row is otherwise arbitrary in ANY engine.
  *
  * The strategy plugs in via `spark.experimental.extraStrategies` (the
  * public injection point, mirroring extraOptimizations); planLater keeps
  * the child inside normal planning, and EnsureRequirements inserts the
  * key-clustered exchange demanded by the final exec's
  * requiredChildDistribution.
  */
object TopKPerGroup {

  case class TopKPerGroupPlan(keys: Seq[Expression], order: Seq[SortOrder],
                              k: Int, child: LogicalPlan) extends UnaryNode {
    override def output: Seq[Attribute] = child.output
    override protected def withNewChildInternal(c: LogicalPlan): TopKPerGroupPlan =
      copy(child = c)
  }

  def install(spark: SparkSession): Unit = synchronized {
    val existing = spark.experimental.extraStrategies
    if (!existing.exists(_.isInstanceOf[Strategy]))
      spark.experimental.extraStrategies = existing :+ new Strategy
  }

  final class Strategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case TopKPerGroupPlan(keys, order, k, child) =>
        val planned = planLater(child)
        TopKPerGroupExec(keys, order, k, partial = false,
          TopKPerGroupExec(keys, order, k, partial = true, planned)) :: Nil
      case _ => Nil
    }
  }

  /** Bounded-heap top-k per key over one pass of the input. `partial`
    * relaxes the distribution requirement (map-side combine); the final
    * instance demands key clustering, so EnsureRequirements inserts the
    * one exchange — of pre-pruned rows. */
  case class TopKPerGroupExec(keys: Seq[Expression], order: Seq[SortOrder],
                              k: Int, partial: Boolean, child: SparkPlan)
      extends UnaryExecNode {
    override def output: Seq[Attribute] = child.output
    override def outputPartitioning: Partitioning = child.outputPartitioning
    override def requiredChildDistribution: Seq[Distribution] =
      if (partial) UnspecifiedDistribution :: Nil
      else ClusteredDistribution(keys) :: Nil
    override protected def withNewChildInternal(c: SparkPlan): TopKPerGroupExec =
      copy(child = c)

    override protected def doExecute(): RDD[InternalRow] = {
      val keyExprs = keys
      val sortOrder = order
      val schema = child.output
      val kk = k
      child.execute().mapPartitions { iter =>
        val keyProj = UnsafeProjection.create(keyExprs, schema)
        val ord = new LazilyGeneratedOrdering(sortOrder, schema)
        // head = WORST retained row (max under the sort order): a
        // candidate beats it ⇒ evict-and-insert; O(log k) per hit.
        val heapOrd: Ordering[InternalRow] = (a, b) => ord.compare(a, b)
        val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
        iter.foreach { row =>
          val key = keyProj(row)
          heaps.get(key) match {
            case None =>
              val q = mutable.PriorityQueue.empty(heapOrd)
              q.enqueue(row.copy())
              heaps.put(key.copy(), q)
            case Some(q) =>
              if (q.size < kk) q.enqueue(row.copy())
              else if (ord.compare(row, q.head) < 0) { q.dequeue(); q.enqueue(row.copy()) }
          }
        }
        heaps.valuesIterator.flatMap(_.iterator)
      }
    }
  }

  /** Column-level API: exact top-`k` rows per `keyCols` group under
    * `orderCols` (column name → ascending?). The order must be total —
    * include a unique tie-break column. */
  def topK(spark: SparkSession, df: DataFrame, keyCols: Seq[String],
           orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    install(spark)
    val plan = Bridge.analyzed(df)
    val byName = plan.output.map(a => a.name -> a).toMap
    val keyAttrs: Seq[Expression] = keyCols.map(byName(_))
    val order = orderCols.map { case (c, asc) =>
      if (asc) SortOrder(byName(c), org.apache.spark.sql.catalyst.expressions.Ascending)
      else SortOrder(byName(c), org.apache.spark.sql.catalyst.expressions.Descending)
    }
    Bridge.ofRows(spark, TopKPerGroupPlan(keyAttrs, order, k, plan))
  }
}
