package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BaseOrdering,
  Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** TIER-(c) CUSTOM OPERATOR — top-k per group with MAP-SIDE HEAP
  * PRUNING, the whole-operator extension path (custom `LogicalPlan` +
  * `SparkStrategy` + `SparkPlan`, registered via
  * `SparkSessionExtensions` or `spark.experimental.extraStrategies`).
  *
  * Why Spark's built-ins can't express it: the idiomatic form
  * (`row_number().over(Window.partitionBy(g).orderBy(o))` + `rn <= k`)
  * SHUFFLES AND SORTS EVERY INPUT ROW — the filter runs after the
  * window, so at 100 TB a "top 3 per region" query moves the whole
  * corpus across the network. `TakeOrderedAndProject` prunes map-side
  * but only for GLOBAL top-k. This operator keeps a bounded heap of k
  * rows per group IN EACH INPUT PARTITION, so the shuffle carries at
  * most |groups|·k·|partitions| rows — for low-cardinality groups,
  * hundreds of rows instead of the corpus (q198 measures 288 vs
  * 600 000 at sf0.1).
  *
  * Determinism contract (same as every arg-extreme row, q168/q174):
  * the caller's sort order must be TOTAL (unique tie-break column) —
  * under ties the surviving row would depend on partition layout.
  * `Round12cSpec` proves result identity to the window form on the
  * fixture and on random frames.
  */
case class TopKPerGroupPlan(k: Int, groupExprs: Seq[Expression],
                            sortOrder: Seq[SortOrder], child: LogicalPlan)
    extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(c: LogicalPlan)
      : TopKPerGroupPlan = copy(child = c)
}

/** Planner strategy: one physical candidate, children planned later. */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(k, g, s, child) =>
      TopKPerGroupExec(k, g, s, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Physical operator: per-partition bounded heaps → hash shuffle of
  * the per-partition winners only → per-group merge + in-group sort.
  * Runs entirely at the RDD layer inside `doExecute` (no codegen —
  * the operator is shuffle-bound, not expression-bound; its inputs
  * and outputs are UnsafeRows).
  *
  * The winners shuffle rides the SQL EXCHANGE path (r14, retiring the
  * r12-documented trade-off): `Bridge.hashShuffleRows` builds the
  * same HashPartitioning dependency a physical exchange would —
  * partition ids from Murmur3Hash(keys), `UnsafeRowSerializer` on
  * the wire — so the pruned winner rows ship as raw row bytes with
  * zero Java/Kryo object serialization; the reduce side re-derives
  * each row's group key with the bound key projection (cheaper than
  * shipping keys). Remaining documented caveat: the `shuffledRows` /
  * `numOutputRows` SQLMetrics are APPROXIMATE under task retries /
  * stage re-execution (re-run tasks re-count); they are displayed
  * for plan insight, never used for correctness. */
case class TopKPerGroupExec(k: Int, groupExprs: Seq[Expression],
                            sortOrder: Seq[SortOrder], child: SparkPlan)
    extends UnaryExecNode {
  import org.apache.spark.sql.execution.metric.SQLMetrics

  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: SparkPlan)
      : TopKPerGroupExec = copy(child = c)

  /** The pruning claim as observable numbers (r16 completes the set —
    * a 100 TB run of this operator is now fully legible in the SQL
    * UI): `numInputRows` vs `shuffledRows` IS the map-side pruning
    * ratio (the window form would shuffle every input row);
    * `mapGroupHeaps` is the per-partition heap-state size summed
    * across tasks — each task's share bounds its retained state at
    * heaps·k rows, the number to watch when sizing task memory (the
    * UI's per-task min/med/max view localizes a skewed partition). */
  override lazy val metrics = Map(
    "numInputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of input rows"),
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"),
    "shuffledRows" -> SQLMetrics.createMetric(sparkContext,
      "per-partition winner rows shuffled"),
    "mapGroupHeaps" -> SQLMetrics.createMetric(sparkContext,
      "map-side group heaps (bounded state: heaps x k rows)"))

  override protected def doExecute(): RDD[InternalRow] = {
    import TopKPerGroupExec.topKOf
    // locals only — the closures below must not capture `this` (the
    // exec node holds the child SparkPlan, which is not serializable)
    val (kk, gExprs, order, attrs) = (k, groupExprs, sortOrder, output)
    val (outRows, shufRows) = (longMetric("numOutputRows"),
      longMetric("shuffledRows"))
    val (inRows, mapHeaps) = (longMetric("numInputRows"),
      longMetric("mapGroupHeaps"))
    val childRdd = child.execute()
    val nParts = math.max(1,
      math.min(conf.numShufflePartitions, childRdd.getNumPartitions))
    // group keys must normalize floating-point bytes (-0.0 == 0.0,
    // canonical NaN) exactly as HashAggregate/Window partitioning do —
    // raw UnsafeProjection bytes would split float groups the window
    // form merges (code-review finding, round 12)
    val normGExprs = gExprs.map(
      org.apache.spark.sql.graftbridge.Bridge.normalizeFloat)
    val partial: RDD[InternalRow] = childRdd.mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(normGExprs, attrs)
      val rowProj = UnsafeProjection.create(attrs, attrs)
      val ord = RowOrdering.create(order, attrs)
      val groups = new java.util.HashMap[UnsafeRow,
        java.util.PriorityQueue[UnsafeRow]]()
      iter.foreach { r =>
        inRows += 1
        topKOf(groups, keyProj(r), rowProj(r), kk, ord)
      }
      mapHeaps += groups.size()
      import scala.jdk.CollectionConverters._
      groups.entrySet().iterator().asScala.flatMap { e =>
        e.getValue.iterator().asScala.map { v =>
          shufRows += 1
          v: InternalRow
        }
      }
    }
    // SQL exchange path: raw UnsafeRow bytes on the wire, partitioned
    // by Murmur3Hash of the (float-normalized) group keys — see the
    // class scaladoc
    org.apache.spark.sql.graftbridge.Bridge
      .hashShuffleRows(sparkContext, partial, attrs, normGExprs, nParts)
      .mapPartitions { iter =>
        val keyProj = UnsafeProjection.create(normGExprs, attrs)
        val ord = RowOrdering.create(order, attrs)
        val groups = new java.util.HashMap[UnsafeRow,
          java.util.PriorityQueue[UnsafeRow]]()
        iter.foreach { row =>
          topKOf(groups, keyProj(row), row.asInstanceOf[UnsafeRow], kk, ord)
        }
        import scala.jdk.CollectionConverters._
        groups.entrySet().iterator().asScala.flatMap { e =>
          // emit each group's survivors in sort order (heap order is
          // worst-first — reverse after draining)
          val buf = scala.collection.mutable.ArrayBuffer.empty[UnsafeRow]
          while (!e.getValue.isEmpty) buf += e.getValue.poll()
          outRows += buf.size
          buf.reverseIterator
        }
      }
  }
}

object TopKPerGroupExec {
  /** Bounded "keep the k FIRST rows under `ord`" heap: a max-heap of
    * size ≤ k whose root is the WORST kept row, replaced when a new
    * row orders strictly before it. Rows/keys are copied on insert
    * (iterators reuse row buffers). */
  private def topKOf(groups: java.util.HashMap[UnsafeRow,
                       java.util.PriorityQueue[UnsafeRow]],
                     key: UnsafeRow, row: UnsafeRow, kk: Int,
                     ord: BaseOrdering): Unit = {
    var heap = groups.get(key)
    if (heap == null) {
      heap = new java.util.PriorityQueue[UnsafeRow](kk + 1,
        (a: UnsafeRow, b: UnsafeRow) => ord.compare(b, a)) // max-heap
      groups.put(key.copy(), heap)
    }
    if (heap.size < kk) heap.add(row.copy())
    else if (ord.compare(row, heap.peek()) < 0) {
      heap.poll(); heap.add(row.copy())
    }
  }
}
