package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The persisted-index lifecycle contract:
  *
  *  1. build-once / query-many: scoring from the persisted artifacts equals
  *     the fused in-session result, and asking twice trains nothing twice;
  *  2. the scoring PLAN is pure serving — it scans the index directory and
  *     contains no training operator (no collect_list codebook rebuild, no
  *     min_by encode);
  *  3. append-equals-rebuild: a batch encoded against the FROZEN parquet
  *     quantizers lands on exactly the codes/cells in-memory standing-corpus
  *     quantizers would give it (the round-trip-frozen property that makes
  *     O(batch) appends sound);
  *  4. appends are deltas: the second delta carries no quantizers and the
  *     base delta is never rewritten.
  *
  * The DuckDB oracle already pins end-result equality; these pins are about
  * the LIFECYCLE (what trains when, what the serving plan reads), which a
  * result hash cannot see.
  */
class AnnIndexSpec extends SparkSpec {

  private val sfDir = SparkSpec.fixtureSf

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().toSet[org.apache.spark.sql.Row].map(_.toSeq)

  test("persisted scoring equals the fused IVF×PQ result, twice") {
    val fused = rows(Similarity.annIvfPq(spark, sfDir))
    val first = rows(AnnIndex.annIvfPqPersisted(spark, sfDir))
    val second = rows(AnnIndex.annIvfPqPersisted(spark, sfDir))
    assert(first == fused, "persisted scoring diverged from the fused path")
    assert(second == fused, "second serve diverged")
  }

  test("scoring plan reads the index and contains no training operator") {
    AnnIndex.annIvfPqPersisted(spark, sfDir) // ensure built
    val plan = AnnIndex.annIvfPqPersisted(spark, sfDir)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("delta=00001"),
      "scoring must scan the persisted base delta")
    assert(!plan.contains("collect_list"),
      "codebook training (collect_list rebuild) leaked into the serving plan")
    assert(!plan.contains("min_by"),
      "code encoding (min_by) leaked into the serving plan")
  }

  test("incremental: append against frozen quantizers equals in-memory standing-corpus training") {
    AnnIndex.annIvfPqIncremental(spark, sfDir) // ensure built + appended
    val root = AnnIndex.rootOf(spark, sfDir, "incr").get
    val idx = AnnIndex.load(spark, root)

    // batch codes from the index vs encoding the batch against codebooks
    // trained in-memory on the standing population
    val cbMem = Similarity.pqCodebooksTrained(
      spark, sfDir, "spec_cb_standing", AnnIndex.standingPred)
    val batchSubs = Similarity.pqSubvectors(spark, sfDir)
      .filter(expr(AnnIndex.batchPred))
    val validBatch = Similarity.vecs(spark, sfDir)
      .filter(expr(AnnIndex.batchPred)).select("vec_id")
    val codesMem = Similarity.pqEncode(batchSubs, cbMem)
      .join(validBatch, Seq("vec_id"))
    val codesIdx = idx.codes.filter(expr(AnnIndex.batchPred))
      .select("vec_id", "m", "cid")
    assert(rows(codesIdx) == rows(codesMem),
      "frozen-quantizer append produced different codes than a rebuild would")

    // batch cell assignment from the index vs assigning against the
    // persisted centroids in memory
    val assignMem = Similarity.assignTo(
      Similarity.vecs(spark, sfDir).filter(expr(AnnIndex.batchPred)),
      idx.centroids)
    val assignIdx = idx.assignments.filter(expr(AnnIndex.batchPred))
    assert(rows(assignIdx) == rows(assignMem),
      "append assigned batch vectors to different cells than the frozen centroids give")
  }

  test("appends are quantizer-free deltas; the base is immutable") {
    AnnIndex.annIvfPqIncremental(spark, sfDir)
    val root = AnnIndex.rootOf(spark, sfDir, "incr").get
    val d2 = s"$root/delta=00002"
    assert(Files.isDirectory(java.nio.file.Paths.get(d2)), "append delta missing")
    val d2Names = graft.util.Dirs.listNames(d2)
    assert(!d2Names.contains("centroids") && !d2Names.contains("pq_codebooks"),
      s"append delta must not carry quantizers: $d2Names")
    assert(d2Names.contains("pq_codes") && d2Names.contains("assignments"),
      s"append delta must carry the batch rows: $d2Names")
    val manifest = new String(Files.readAllBytes(
      java.nio.file.Paths.get(d2, "_manifest.json")), "UTF-8")
    assert(manifest.contains("\"kind\":\"append\""), manifest)

    // union across deltas partitions the corpus exactly: every valid
    // vector indexed once, none twice
    val idx = AnnIndex.load(spark, root)
    val indexed = idx.assignments.select("vec_id")
    val valid = Similarity.vecs(spark, sfDir).select("vec_id")
    assert(indexed.count() == valid.count() &&
      indexed.distinct().count() == indexed.count(),
      "deltas must partition the vector population")
  }
}
