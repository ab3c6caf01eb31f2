package graft

import graft.ops.GraphOps
import org.apache.spark.sql.functions._

/** GraphOps.pageRank laws + the an20/an21 lane properties. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** In-test reference: dense power iteration over Scala maps. */
  private def refPageRank(
      edges: Seq[(String, String)], k: Int, d: Double): Map[String, Double] = {
    val out = edges.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val nodes = edges.map(_._1).distinct
    val n = nodes.size
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to k) {
      val in = edges.groupBy(_._2).view
        .mapValues(_.map { case (s, _) => r(s) / out(s) }.sum).toMap
      r = nodes.map(v => v -> ((1.0 - d) / n + d * in.getOrElse(v, 0.0))).toMap
    }
    r
  }

  test("pageRank matches dense reference on a hand graph") {
    val edges = Seq(
      "a" -> "b", "b" -> "a", "a" -> "c", "c" -> "a", "b" -> "c", "c" -> "b",
      "c" -> "d", "d" -> "c")
    val got = GraphOps.pageRank(edges.toDF("src", "dst"), iterations = 4)
      .as[(String, Double)].collect().toMap
    val want = refPageRank(edges, 4, 0.85)
    assert(got.keySet == want.keySet)
    got.foreach { case (v, r) => assert(math.abs(r - want(v)) < 1e-12, s"node $v") }
  }

  test("pageRank on a symmetric regular graph is uniform and conserves mass") {
    // 2-cycle: both nodes keep rank 0.5 at every iteration.
    val ring = Seq("x" -> "y", "y" -> "x").toDF("src", "dst")
    val r = GraphOps.pageRank(ring, iterations = 3).as[(String, Double)].collect().toMap
    assert(math.abs(r("x") - 0.5) < 1e-15 && math.abs(r("y") - 0.5) < 1e-15)
    // Lane-scale mass conservation (symmetrized graph → no dangling leak).
    val lane = SparkEntry.queries("an20_pagerank")(spark, sf("sf0.001"))
    val total = lane.agg(sum("rank")).as[Double].head()
    assert(math.abs(total - 1.0) < 1e-6, s"rank mass $total")
  }

  test("funnel counts strictly-ordered steps only") {
    // u1 completes the funnel in order; u2 clicks BEFORE its first view
    // (click must not count); u3 views only.
    val ev = Seq(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      (2L, 50L, "click"), (2L, 60L, "view"),
      (3L, 70L, "view")
    ).toDF("user_id", "ts", "event_type")
    val st1 = ev.filter($"event_type" === "view").groupBy("user_id").agg(min($"ts").as("t1"))
    val st2 = ev.filter($"event_type" === "click").join(st1, "user_id")
      .filter($"ts" > $"t1").groupBy("user_id").agg(min($"ts").as("t2"))
    val st3 = ev.filter($"event_type" === "purchase").join(st2, "user_id")
      .filter($"ts" > $"t2").groupBy("user_id").agg(min($"ts").as("t3"))
    assert(st1.count() == 3 && st2.count() == 1 && st3.count() == 1)
    // Lane shape: monotone non-increasing step counts.
    val lane = SparkEntry.queries("an21_event_funnel")(spark, sf("sf0.001"))
      .orderBy("step_idx").select("n_users").as[Long].collect()
    assert(lane.length == 3 && lane(0) >= lane(1) && lane(1) >= lane(2), lane.toSeq)
  }

  /** In-test reference: brute-force triangle listing over Scala sets. */
  private def refTriangles(edges: Seq[(Long, Long)]): Set[(Long, Long, Long)] = {
    val e = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.toSet
    val nodes = e.flatMap { case (a, b) => Seq(a, b) }.toSeq.sorted
    (for {
      i <- nodes; j <- nodes if i < j && e((i, j))
      k <- nodes if j < k && e((j, k)) && e((i, k))
    } yield (i, j, k)).toSet
  }

  test("triangles: K4 has 4, path has 0, star has 0, counted exactly once") {
    def run(edges: Seq[(Long, Long)]): Seq[(Long, Long, Long)] =
      GraphOps.triangles(edges.toDF("a", "b")).as[(Long, Long, Long)].collect().toSeq
    // K4 — every 3-subset is a triangle
    val k4 = for { i <- 1L to 4L; j <- 1L to 4L if i < j } yield (i, j)
    val gotK4 = run(k4)
    assert(gotK4.size == 4 && gotK4.toSet == refTriangles(k4)) // once each, no dups
    // path and star are triangle-free
    assert(run(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L)).isEmpty)
    assert(run((2L to 8L).map(1L -> _)).isEmpty)
  }

  test("triangles: tolerates duplicates/reversed edges/self-loops; matches brute force") {
    val rnd = new scala.util.Random(7)
    val base = (for (_ <- 1 to 120)
      yield (rnd.nextInt(18).toLong, rnd.nextInt(18).toLong)).distinct
    // adversarial input: both orientations, duplicates, self-loops
    val messy = base ++ base.map(_.swap) ++ Seq((3L, 3L), (5L, 5L)) ++ base.take(10)
    val got = GraphOps.triangles(messy.toDF("a", "b"))
      .as[(Long, Long, Long)].collect()
    assert(got.length == got.distinct.length, "each triangle listed exactly once")
    assert(got.toSet == refTriangles(base), s"got ${got.length} triangles")
  }

  test("triangles: node ids near Long.MaxValue keep an exact middle node (no sum overflow)") {
    val m = Long.MaxValue
    val tri = Seq((m, m - 1), (m - 1, m - 2), (m - 2, m)) // one triangle, huge ids
    val got = GraphOps.triangles(tri.toDF("a", "b")).as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((m - 2, m - 1, m)), got)
  }

  /** In-test reference: synchronized label propagation, modal label from
    * in-neighbors, ties to the SMALLEST label — GraphOps.labelPropagation's
    * exact contract. */
  private def refLabelProp(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    val in = edges.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val nodes = edges.map(_._1).distinct
    var lbl = nodes.map(v => v -> v).toMap
    for (_ <- 1 to k)
      lbl = nodes.map { v =>
        val counts = in(v).map(lbl).groupBy(identity).view.mapValues(_.size)
        v -> counts.toSeq.map { case (l, c) => (c, -l) }.max._2 * -1
      }.toMap
    lbl
  }

  test("labelPropagation: two cliques + bridge stay distinct communities; components merge them") {
    // two K4s bridged by one edge — ONE component, TWO dense communities
    val k4a = for { i <- 1L to 4L; j <- 1L to 4L if i != j } yield (i, j)
    val k4b = for { i <- 5L to 8L; j <- 5L to 8L if i != j } yield (i, j)
    val edges = (k4a ++ k4b ++ Seq((4L, 8L), (8L, 4L))).toSeq
    val got = GraphOps.labelPropagation(edges.toDF("src", "dst"), iterations = 5)
      .as[(Long, Long)].collect().toMap
    assert(got == refLabelProp(edges, 5), "matches the synchronized reference")
    // synchronized LPA may 2-cycle inside a clique (the documented price
    // of determinism), so the community law is label DISJOINTNESS, not
    // single-label convergence: no label crosses the bridge
    val a = (1L to 4L).map(got).toSet
    val b = (5L to 8L).map(got).toSet
    assert(a.intersect(b).isEmpty, s"cliques share no labels: $got")
    assert(a.size == 1, s"the first clique converges to one label: $got")
    // reachability sees ONE component through the bridge
    val comp = graft.ops.Dedup.connectedComponents(
        edges.toDF("doc_a", "doc_b"))
      .as[(Long, Long)].collect().toMap
    assert(comp.values.toSet.size == 1, s"one component expected: $comp")
  }

  test("clusteringCoefficient: clique = 1, star center = 0, leaves undefined (NULL)") {
    // K4 ⊕ a pendant leaf off node 4, plus a 5-leaf star at 100
    val k4 = for { i <- 1L to 4L; j <- 1L to 4L if i < j } yield (i, j)
    val edges = (k4 ++ Seq((4L, 9L)) ++ (101L to 105L).map(100L -> _)).toDF("a", "b")
    val got = GraphOps.clusteringCoefficient(edges)
      .as[(Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    (1L to 3L).foreach(v => assert(got(v) == ((3L, 3L, Some(1.0))), s"K4 interior $v"))
    assert(got(4L) == ((4L, 3L, Some(0.5))), "K4 node with pendant: 3 of C(4,2)=6 pairs closed")
    assert(got(9L) == ((1L, 0L, None)), "degree-1 leaf has no defined coefficient")
    assert(got(100L) == ((5L, 0L, Some(0.0))), "star center: open neighborhood, coeff 0")
  }

  test("clusteringCoefficient shares the canonical distinct + degree agg with triangles") {
    // The composition must pay ONE canonical-edge distinct and ONE
    // degree aggregation, shared between the orientation (inside the
    // trianglesCanonical seam) and the output degree column. Composing
    // via the public triangles() re-shuffled the data-scale edge frame
    // twice more (re-distinct + re-degree ≈ 5 shuffle map stages on
    // this graph); the shared seam executes ≈ 3 (distinct, degrees,
    // corner agg — every join broadcasts at this size). Count stages
    // that actually WROTE shuffle records during the eager run.
    import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
    val shuffleStages = new java.util.concurrent.atomic.AtomicInteger
    val listener = new SparkListener {
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
        val m = ev.stageInfo.taskMetrics
        if (m != null && m.shuffleWriteMetrics.recordsWritten > 0)
          shuffleStages.incrementAndGet(): Unit
      }
    }
    val k4 = for { i <- 1L to 4L; j <- 1L to 4L if i < j } yield (i, j)
    val edges = (k4 ++ Seq((4L, 9L)) ++ (101L to 105L).map(100L -> _)).toDF("a", "b")
    spark.sparkContext.addSparkListener(listener)
    val count =
      try {
        GraphOps.clusteringCoefficient(edges) // eager: localCheckpoints inside
        // listener delivery is async — drain the bus deterministically
        // (polling until the counter "looks stable" flaked on slow
        // runners)
        org.apache.spark.graft.ListenerBridge
          .waitUntilListenerBusEmpty(spark.sparkContext)
        shuffleStages.get
      } finally spark.sparkContext.removeSparkListener(listener)
    assert(count <= 4,
      s"clusteringCoefficient executed $count shuffle-writing stages — " +
        "the canonical/degree frames are no longer shared with triangles")
  }

  test("labelPropagation is deterministic across runs and refuses iterations < 1") {
    val rnd = new scala.util.Random(11)
    val half = (for (_ <- 1 to 60) yield (rnd.nextInt(12).toLong, rnd.nextInt(12).toLong))
      .filter { case (a, b) => a != b }.distinct
    val edges = (half ++ half.map(_.swap)).toDF("src", "dst")
    val r1 = GraphOps.labelPropagation(edges, 3).as[(Long, Long)].collect().toMap
    val r2 = GraphOps.labelPropagation(edges, 3).as[(Long, Long)].collect().toMap
    assert(r1 == r2)
    intercept[IllegalArgumentException](GraphOps.labelPropagation(edges, 0))
  }
}
