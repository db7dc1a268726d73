package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tier-(c) custom operator (TopKPerGroupPlan/Strategy/Exec, SURVEY
  * §2 row 198): result identity to the window formulation on the
  * fixture AND on random frames (group skew, k larger than some
  * groups, single-row groups), plus the physical-plan pin — the
  * declared row must actually execute through TopKPerGroupExec, with
  * no Window and no full-row sort before it. */
class Round12cSpec extends SparkSpecBase {

  private def windowTopK(df: DataFrame, group: String,
                         sortCols: Seq[org.apache.spark.sql.Column],
                         k: Int): DataFrame = {
    val w = Window.partitionBy(group).orderBy(sortCols: _*)
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
  }

  test("q_topk_native executes through TopKPerGroupExec (no Window, no corpus sort)") {
    val df = SparkEntry.queries("q_topk_native")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerGroup"), s"custom operator not planned:\n$p")
    assert(!p.contains("Window"), s"fell back to the window form:\n$p")
    // the only Sort allowed is the final presentation orderBy (range
    // partitioning) — no hashpartition+sort of the corpus
    assert(!p.contains("Exchange hashpartitioning"),
      s"corpus shuffled for the top-k:\n$p")
  }

  test("custom operator == window form on the fixture") {
    val li = graft.engine.Tables.lineitem(spark, sfDir)
      .select("l_returnflag", "l_orderkey", "l_linenumber",
        "l_extendedprice")
    val sortCols = Seq(col("l_extendedprice").desc, col("l_orderkey"),
      col("l_linenumber"))
    val native = Graft.topKPerGroup(li, Seq("l_returnflag"), sortCols, 3)
    val window = windowTopK(li, "l_returnflag", sortCols, 3)
    assert(native.exceptAll(window).isEmpty &&
      window.exceptAll(native).isEmpty,
      "operator result differs from the window formulation")
    assert(native.count() == window.count())
  }

  test("custom operator == window form on random frames (skew, small groups, k > group size)") {
    val sp = spark
    import sp.implicits._
    for (seed <- 1L to 3L) {
      val rnd = new scala.util.Random(seed * 389)
      val rows = (0 until 400).map { i =>
        // zipf-ish group skew: group 0 huge, tail groups tiny
        val g = math.min(rnd.nextInt(1 << (1 + rnd.nextInt(5))), 12)
        (s"g$g", i.toLong, rnd.nextInt(50).toDouble)
      }
      val df = rows.toDF("g", "id", "v").repartition(7)
      val sortCols = Seq(col("v").desc, col("id"))
      for (k <- Seq(1, 3, 50)) {
        val native = Graft.topKPerGroup(df, Seq("g"), sortCols, k)
        val window = windowTopK(df, "g", sortCols, k)
        assert(native.exceptAll(window).isEmpty &&
          window.exceptAll(native).isEmpty,
          s"seed=$seed k=$k: operator != window form")
      }
    }
  }

  test("q_topk_auto: selector picks native with >=10x margin and reproduces q198") {
    val li = graft.engine.Tables.lineitem(spark, sfDir)
    // margin pin (the q160 convention): the native branch's costed
    // shuffle volume must sit at least 10x under the advantage bar so
    // fixture drift fails HERE, not as an opaque oracle hash diff
    val n = li.count()
    val g = li.select("l_returnflag").distinct().count()
    val parts = math.max(1, li.rdd.getNumPartitions)
    assert(g * 3 * parts * 4.0 * 10 <= n,
      s"selector margin collapsed: g=$g parts=$parts n=$n")
    val auto = SparkEntry.queries("q_topk_auto")(spark, sfDir)
    assert(auto.select("plan").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("native"))
    val native = SparkEntry.queries("q_topk_native")(spark, sfDir)
    assert(auto.drop("plan").exceptAll(native).isEmpty &&
      native.exceptAll(auto.drop("plan")).isEmpty,
      "auto(native) differs from the declared native row")
  }

  test("autoTopK window branch: forced advantage flips the plan, rows unchanged") {
    val li = graft.engine.Tables.lineitem(spark, sfDir)
      .select("l_returnflag", "l_orderkey", "l_linenumber",
        "l_extendedprice")
    val sortCols = Seq(col("l_extendedprice").desc, col("l_orderkey"),
      col("l_linenumber"))
    // an unreachable advantage bar means native never qualifies ->
    // the selector must take the window branch
    val win = Graft.autoTopK(li, Seq("l_returnflag"), sortCols, 3,
      advantage = Double.MaxValue)
    assert(win.select("plan").distinct().head().getString(0) == "window")
    val nat = Graft.autoTopK(li, Seq("l_returnflag"), sortCols, 3)
    assert(win.drop("plan").exceptAll(nat.drop("plan")).isEmpty &&
      nat.drop("plan").exceptAll(win.drop("plan")).isEmpty,
      "plan choice changed the rows — total order broken")
  }

  test("the shuffledRows metric proves the map-side prune") {
    val li = graft.engine.Tables.lineitem(spark, sfDir)
      .select("l_returnflag", "l_orderkey", "l_linenumber",
        "l_extendedprice")
    val df = Graft.topKPerGroup(li, Seq("l_returnflag"),
      Seq(col("l_extendedprice").desc, col("l_orderkey"),
        col("l_linenumber")), 3)
    // collect() (not count(), which plans a SEPARATE aggregate query)
    // so THIS df's executed plan is the one that carries the metrics
    val n = df.collect().length.toLong
    // metrics live on the instance AQE actually executed, which the
    // adaptive root hides from plain collect()
    val root = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val exec = root.collectFirst {
      case e: graft.plans.TopKPerGroupExec => e
    }
    assert(exec.isDefined, "TopKPerGroupExec not in the executed plan")
    val shuffled = exec.get.metrics("shuffledRows").value
    val corpus = li.count()
    assert(shuffled > 0 && shuffled < corpus / 10,
      s"prune did not happen: $shuffled of $corpus rows shuffled")
    assert(exec.get.metrics("numOutputRows").value == n)
    // r16 (VERDICT r15 task 5): the full metric set — input count
    // equals the corpus (the prune ratio numInputRows:shuffledRows is
    // the operator's claim as UI numbers), and the map-side heap
    // state is bounded: heaps x k covers every shuffled winner row
    val inRows = exec.get.metrics("numInputRows").value
    val heaps = exec.get.metrics("mapGroupHeaps").value
    assert(inRows == corpus,
      s"numInputRows $inRows != corpus $corpus")
    assert(heaps > 0 && heaps * 3 >= shuffled,
      s"heap-state accounting broken: $heaps heaps x k=3 < $shuffled winners")
  }

  test("float group keys normalize: -0.0 == 0.0 groups merge like the window form") {
    val sp = spark
    import sp.implicits._
    val df = Seq((0.0, 1L), (-0.0, 2L), (0.0, 3L)).toDF("g", "id")
    val sortCols = Seq(col("id"))
    val native = Graft.topKPerGroup(df, Seq("g"), sortCols, 1)
    val window = windowTopK(df, "g", sortCols, 1)
    assert(native.count() == 1 && window.count() == 1,
      s"-0.0/0.0 split the group: native=${native.count()} window=${window.count()}")
    assert(native.exceptAll(window).isEmpty && window.exceptAll(native).isEmpty)
  }

  test("empty input and k larger than every group survive") {
    val sp = spark
    import sp.implicits._
    val empty = Seq.empty[(String, Long, Double)].toDF("g", "id", "v")
    assert(Graft.topKPerGroup(empty, Seq("g"),
      Seq(col("v").desc, col("id")), 3).count() == 0)
    val tiny = Seq(("a", 1L, 1.0), ("b", 2L, 2.0)).toDF("g", "id", "v")
    assert(Graft.topKPerGroup(tiny, Seq("g"),
      Seq(col("v").desc, col("id")), 100).count() == 2)
  }

  test("null ordering and null groups match the window form") {
    val sp = spark
    import sp.implicits._
    val rows = Seq(
      (Some("a"), 1L, Some(5.0)), (Some("a"), 2L, None),
      (Some("a"), 3L, Some(9.0)), (None, 4L, Some(1.0)),
      (None, 5L, None), (Some("b"), 6L, Some(2.0)))
    val df = rows.toDF("g", "id", "v")
    val sortCols = Seq(col("v").desc, col("id"))
    val native = Graft.topKPerGroup(df, Seq("g"), sortCols, 2)
    val window = windowTopK(df, "g", sortCols, 2)
    assert(native.exceptAll(window).isEmpty &&
      window.exceptAll(native).isEmpty,
      "null group / null sort-key handling differs from the window form")
  }
}
