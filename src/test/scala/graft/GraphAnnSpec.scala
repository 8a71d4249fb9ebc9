package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The graph-ANN lifecycle + retrieval contract (the DuckDB oracle pins
  * end-result equality; these pins are about what a result hash cannot
  * see):
  *
  *  1. serving plans are pure: search/recall/curve scan the persisted
  *     `graph_edges` artifact and contain no NN-descent build operator —
  *     the build's signature generators (the ±3 id-ring and bucket-ring
  *     `sequence` explodes, any salted self-join) must never appear in a
  *     serve plan;
  *  2. build-once / serve-many: repeated serves reuse the one published
  *     root and return identical rows;
  *  3. the published graph is a well-formed K-NN graph: per-node degree
  *     ≤ K, ranks dense from 1, ordered by cosine;
  *  4. the rounds→recall knob curve is monotone (round r's visited set is
  *     a subset of round r+1's, so macro recall cannot decrease) and the
  *     search genuinely retrieves: final-round recall clears the seed-only
  *     round by a wide margin.
  */
class GraphAnnSpec extends SparkSpec {

  private val sfDir = SparkSpec.fixtureSf

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().toSet[org.apache.spark.sql.Row].map(_.toSeq)

  test("serving plans read graph_edges and contain no NN-descent operator") {
    GraphAnn.graphBuild(spark, sfDir).collect() // ensure built + published
    for ((name, df) <- Seq(
        "search" -> GraphAnn.graphSearch(spark, sfDir),
        "recall" -> GraphAnn.recallGraph(spark, sfDir),
        "curve" -> GraphAnn.recallGraphCurve(spark, sfDir))) {
      val plan = df.queryExecution.executedPlan.toString()
      assert(plan.contains("graph_edges"),
        s"$name: serving plan does not scan the persisted graph artifact")
      assert(plan.contains("delta=00001"),
        s"$name: serving plan does not read through the delta protocol")
      assert(!plan.toLowerCase.contains("sequence("),
        s"$name: the build's id-ring generator leaked into the serving plan")
      assert(!plan.contains("salt"),
        s"$name: a salted self-join (no build or dedup stage) leaked into the serving plan")
    }
  }

  test("build-once: repeated serves reuse the published root and agree row-for-row") {
    val first = rows(GraphAnn.graphSearch(spark, sfDir))
    val root1 = GraphAnn.rootOf(spark, sfDir)
    assert(root1.isDefined, "no published root after a serve")
    val second = rows(GraphAnn.graphSearch(spark, sfDir))
    assert(GraphAnn.rootOf(spark, sfDir) == root1, "a second serve re-published the index")
    assert(second == first, "second serve diverged")
  }

  test("published graph is a well-formed K-NN graph: degree ≤ K, dense ranks, cosine-ordered") {
    val g = GraphAnn.graphBuild(spark, sfDir).collect()
    val bySrc = g.groupBy(_.getLong(0))
    assert(bySrc.values.forall(_.length <= 16), "a node exceeds degree K")
    for ((src, edges) <- bySrc) {
      val sorted = edges.sortBy(_.getLong(2))
      assert(sorted.map(_.getLong(2)).toSeq == (1L to sorted.length).toSeq,
        s"node $src: ranks not dense from 1")
      val cos = sorted.map(_.getDouble(3))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b },
        s"node $src: neighbor ranks not cosine-ordered")
      assert(edges.forall(_.getLong(1) != src), s"node $src: self-loop")
    }
  }

  test("incremental lifecycle: insertion is search-based (no rebuild) and published as an append delta") {
    val ins = GraphAnn.graphIncremental(spark, sfDir)
    val plan = ins.queryExecution.executedPlan.toString()
    assert(plan.contains("delta=00002"),
      "the inserted edges must serve from the append delta")
    assert(!plan.toLowerCase.contains("sequence("),
      "the build's id-ring generator leaked into the append serve plan")
    val root1 = GraphAnn.incrRootOf(spark, sfDir)
    assert(root1.isDefined, "no incremental root after a serve")

    val rows1 = rows(ins)
    assert(rows(GraphAnn.graphIncremental(spark, sfDir)) == rows1,
      "second incremental serve diverged")
    assert(GraphAnn.incrRootOf(spark, sfDir) == root1,
      "a second serve re-published the incremental root")
  }

  test("inserted edges are well-formed: batch→standing only, degree ≤ K, dense cosine-ordered ranks") {
    val g = GraphAnn.graphIncremental(spark, sfDir).collect()
    assert(g.nonEmpty)
    assert(g.forall(_.getLong(0) % 7 == 0), "an inserted source is not a batch vector")
    assert(g.forall(_.getLong(1) % 7 != 0), "an inserted edge points at a batch vector")
    for ((src, edges) <- g.groupBy(_.getLong(0))) {
      assert(edges.length <= 16, s"inserted node $src exceeds degree K")
      val sorted = edges.sortBy(_.getLong(2))
      assert(sorted.map(_.getLong(2)).toSeq == (1L to sorted.length).toSeq,
        s"inserted node $src: ranks not dense from 1")
      val cos = sorted.map(_.getDouble(3))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b },
        s"inserted node $src: edges not cosine-ordered")
    }
  }

  test("delete leg: tombstoned ids are neither traversed nor returned, mask is artifact-read") {
    val out = GraphAnn.graphDeleted(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(1) % 11 != 3),
      "a tombstoned vector surfaced in the masked search")
    // the mask's source of truth is the published tombstone delta (the
    // deep search plan's toString truncates, so assert the artifact and
    // its content instead of string-matching the plan)
    val root = GraphAnn.incrRootOf(spark, sfDir)
    assert(root.isDefined)
    val ts = java.nio.file.Paths.get(s"${root.get}/delta=00003/tombstones")
    assert(java.nio.file.Files.isDirectory(ts),
      "the delete must publish a tombstone-only delta under the same root")
    val ids = spark.read.parquet(ts.toString)
      .collect().map(_.getLong(0)).toSet
    assert(ids.nonEmpty && ids.forall(_ % 11 == 3),
      s"tombstone artifact must carry exactly the deleted ids: $ids")
  }

  test("compaction: physical erasure on disk, serving identical to the masked view") {
    val masked = rows(GraphAnn.graphDeleted(spark, sfDir))
    val folded = rows(GraphAnn.graphCompacted(spark, sfDir))
    assert(folded == masked,
      "the fold moved a ranked pair relative to the tombstone mask")
    val root = GraphAnn.foldRootOf(spark, sfDir)
    assert(root.isDefined, "no folded root after a compacted serve")
    // the erasure guarantee: the folded base, read RAW, carries no edge
    // touching a tombstoned id
    val raw = spark.read.parquet(s"${root.get}/delta=00001/graph_edges").collect()
    assert(raw.nonEmpty)
    assert(raw.forall(r => r.getLong(0) % 11 != 3 && r.getLong(1) % 11 != 3),
      "a tombstoned vector's edge survived the fold on disk")
  }

  test("post-append recall: queries retrieve through the incremental graph without a rebuild") {
    val rec = GraphAnn.recallGraphIncremental(spark, sfDir)
      .agg(avg(col("recall_at_3"))).head().getDouble(0)
    assert(rec >= 0.8,
      s"post-append recall $rec below the fixture floor — inserted nodes unreachable?")
    val plan = GraphAnn.recallGraphIncremental(spark, sfDir)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("delta=00001") && plan.contains("delta=00002"),
      "the post-append search must read base AND append deltas")
  }

  test("knob curve is monotone in rounds and the search retrieves (final ≫ seed-only)") {
    val curve = GraphAnn.recallGraphCurve(spark, sfDir)
      .orderBy(col("search_rounds")).collect()
    assert(curve.length == 5, "curve must carry one row per search round")
    val recall = curve.map(_.getAs[Double]("macro_recall_at_3"))
    assert(recall.zip(recall.tail).forall { case (a, b) => b >= a },
      "macro recall decreased as rounds grew — visited sets must nest")
    val visited = curve.map(_.getAs[Double]("avg_visited"))
    assert(visited.zip(visited.tail).forall { case (a, b) => b >= a },
      "avg visited decreased as rounds grew")
    assert(recall.last >= 0.8,
      s"final-round recall ${recall.last} below the fixture floor")
    assert(recall.last > recall.head,
      "beam search added nothing over the seed round")
  }
}
