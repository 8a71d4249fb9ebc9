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

  test("persisted scoring is the one path: fused entry ≡ lifecycle entry, stable across serves") {
    val fused = rows(Similarity.annIvfPq(spark, sfDir))
    val first = rows(AnnIndex.annIvfPqPersisted(spark, sfDir))
    val second = rows(AnnIndex.annIvfPqPersisted(spark, sfDir))
    assert(first == fused, "the fused entry diverged from the persisted path it delegates to")
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

  test("the WHOLE family serves from the index: no in-session training anywhere (r11 #2)") {
    // one probe per index family; every one must scan the persisted delta
    // and carry no training operator. semanticDedup's exemplar election
    // legitimately uses min_by — its pin is collect_list + delta scan only.
    val pinned: Seq[(String, org.apache.spark.sql.DataFrame, Boolean)] = Seq(
      ("annPq", Similarity.annPq(spark, sfDir), true),
      ("annLsh", Similarity.annLsh(spark, sfDir), true),
      ("annLshMultitable", Similarity.annLshMultitable(spark, sfDir), true),
      ("annIvf", Similarity.annIvf(spark, sfDir), true),
      ("annIvfNprobe2", Similarity.annIvfNprobe2(spark, sfDir), true),
      ("semanticDedup", Similarity.semanticDedup(spark, sfDir), false),
      ("embeddingNearDup", Similarity.embeddingNearDup(spark, sfDir), true),
      ("annFiltered", Similarity.annFiltered(spark, sfDir), true),
      ("annIvfPqDeleted", AnnIndex.annIvfPqDeleted(spark, sfDir), true),
      ("outlierReport", Similarity.outlierReport(spark, sfDir), false))
    pinned.foreach { case (name, df, noMinBy) =>
      val plan = df.queryExecution.executedPlan.toString()
      assert(plan.contains("delta=00001"),
        s"$name must serve from the persisted index")
      assert(!plan.contains("collect_list"),
        s"$name: codebook training leaked into the serving plan")
      if (noMinBy) assert(!plan.contains("min_by"),
        s"$name: assignment/encode training (min_by) leaked into the serving plan")
    }
  }

  test("the LSH scorer consumes the persisted lsh_bands artifact") {
    Similarity.annLsh(spark, sfDir).collect()
    val root = AnnIndex.rootOf(spark, sfDir, "full").get
    val plan = Similarity.annLsh(spark, sfDir).queryExecution.executedPlan.toString()
    assert(plan.contains("lsh_bands"),
      s"annLsh must scan $root/delta=00001/lsh_bands")
    val multiPlan = Similarity.annLshMultitable(spark, sfDir)
      .queryExecution.executedPlan.toString()
    assert(multiPlan.contains("lsh_bands_t1"),
      "the multi-table scorer must scan the second persisted plane family")
  }

  test("incremental: append against frozen quantizers equals in-memory standing-corpus training") {
    AnnIndex.annIvfPqIncremental(spark, sfDir) // ensure built + appended
    val root = AnnIndex.rootOf(spark, sfDir, "incr").get
    val idx = AnnIndex.load(spark, root)

    // batch codes from the index vs encoding the batch against codebooks
    // trained in-memory on the standing population
    val cbMem = Similarity.pqCodebooksTrained(spark, sfDir, AnnIndex.standingPred)
    val batchSubs = Similarity.pqSubvectors(spark, sfDir)
      .filter(expr(AnnIndex.batchPred))
    val validBatch = Similarity.vecs(spark, sfDir)
      .filter(expr(AnnIndex.batchPred)).select("vec_id")
    val codesMem = Similarity.pqEncode(batchSubs, cbMem)
      .join(validBatch, Seq("vec_id"))
    val codesIdx = idx.codes.get.filter(expr(AnnIndex.batchPred))
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

  test("incremental LSH: base ∪ append serves identically to the fused scorer") {
    // LSH has no trained state to freeze, so the appended band table must
    // be EXACTLY the full-corpus one — any drift means the append path
    // computed different planes
    val fused = rows(Similarity.annLsh(spark, sfDir))
    val incr = rows(AnnIndex.annLshIncremental(spark, sfDir))
    assert(incr == fused, "incremental band serving diverged from the fused scorer")
  }

  test("compaction folds deltas; serving is bit-identical before and after") {
    // fresh root (the shared "incr" root must stay two-delta for the other
    // pins): base on the standing corpus, append the batch, then fold
    val root = SparkSpec.tempDir("graft-ann-compact-").toString
    AnnIndex.buildBase(spark, sfDir, root, AnnIndex.standingPred)
    AnnIndex.appendBatch(spark, sfDir, root, AnnIndex.batchPred)
    val before = rows(AnnIndex.scoreIvfPq(spark, sfDir,
      AnnIndex.load(spark, root), 3))
    val lshBefore = rows(AnnIndex.scoreLsh(spark, sfDir,
      AnnIndex.load(spark, root).bands))

    AnnIndex.compact(spark, root)
    val names = graft.util.Dirs.listNames(root)
    assert(names.count(_.startsWith("delta=")) == 1,
      s"fold must leave exactly one delta: $names")
    assert(!names.contains(".tmp-compact") && !names.contains(".compact_swap"),
      s"staging residue after a clean fold: $names")
    val manifest = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/delta=00001/_manifest.json")), "UTF-8")
    assert(manifest.contains("\"kind\":\"base\"") &&
      manifest.contains("\"compactedFrom\":2"), manifest)

    val after = rows(AnnIndex.scoreIvfPq(spark, sfDir,
      AnnIndex.load(spark, root), 3))
    assert(after == before, "compaction changed the serving surface")
    assert(rows(AnnIndex.scoreLsh(spark, sfDir,
      AnnIndex.load(spark, root).bands)) == lshBefore,
      "compaction changed the LSH serving surface")

    // the lifecycle continues past a fold: an EMPTY append (a day with no
    // new vectors) lands as delta 2 with zero-row artifacts, and load
    // skips its schemaless dirs instead of failing — serving unchanged
    AnnIndex.appendBatch(spark, sfDir, root, "vec_id % 7 = 999")
    assert(graft.util.Dirs.numericSuffixes(root, "delta=").sorted == Seq(1, 2))
    assert(rows(AnnIndex.scoreIvfPq(spark, sfDir,
      AnnIndex.load(spark, root), 3)) == before)
  }

  test("deletion lifecycle: tombstones mask serving, the vacuum makes erasure physical") {
    val root = SparkSpec.tempDir("graft-ann-delete-").toString
    AnnIndex.buildBase(spark, sfDir, root, AnnIndex.standingPred)
    AnnIndex.appendBatch(spark, sfDir, root, AnnIndex.batchPred)
    val full = AnnIndex.load(spark, root)
    val liveBefore = full.assignments.count()
    val codesBefore = full.codes.get.count()
    val doomed = full.assignments.filter(expr(AnnIndex.deletedPred)).select("vec_id")
    val nDoomed = doomed.count()
    assert(nDoomed > 0, "fixture must exercise the tombstone mask")

    AnnIndex.deleteIds(spark, root, doomed)
    // the delete is a pure delta: base artifacts untouched, one new delta
    assert(graft.util.Dirs.numericSuffixes(root, "delta=").sorted == Seq(1, 2, 3))
    val masked = AnnIndex.masked(AnnIndex.load(spark, root))
    assert(masked.assignments.filter(expr(AnnIndex.deletedPred)).isEmpty,
      "a tombstoned id survived the assignment mask")
    assert(masked.codes.get.filter(expr(AnnIndex.deletedPred)).isEmpty,
      "a tombstoned id survived the code mask")
    assert(masked.bands.filter(expr(AnnIndex.deletedPred)).isEmpty,
      "a tombstoned id survived the band mask")
    val servedMasked = rows(AnnIndex.scoreIvfPq(spark, sfDir, masked, 3))
    assert(servedMasked.nonEmpty)

    // vacuum: the fold drops the rows PHYSICALLY and clears the tombstones
    AnnIndex.compact(spark, root)
    val folded = AnnIndex.load(spark, root)
    assert(folded.tombstones.isEmpty, "the fold must clear the tombstone set")
    assert(folded.assignments.count() == liveBefore - nDoomed,
      "the fold must physically drop exactly the tombstoned assignment rows")
    assert(folded.codes.get.count() < codesBefore &&
      folded.codes.get.filter(expr(AnnIndex.deletedPred)).isEmpty,
      "deleted code rows must be gone from the folded artifacts on disk")
    assert(rows(AnnIndex.scoreIvfPq(spark, sfDir, folded, 3)) == servedMasked,
      "physical erasure changed the serving surface relative to the mask")
  }

  test("compaction recovers from a crash in every window of its protocol") {
    val root = SparkSpec.tempDir("graft-ann-crash-").toString
    AnnIndex.buildBase(spark, sfDir, root, AnnIndex.standingPred)
    AnnIndex.appendBatch(spark, sfDir, root, AnnIndex.batchPred)
    val before = rows(AnnIndex.scoreIvfPq(spark, sfDir,
      AnnIndex.load(spark, root), 3))

    def copyTree(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
      Files.createDirectories(dst)
      Files.list(src).forEach { c =>
        if (Files.isDirectory(c)) copyTree(c, dst.resolve(c.getFileName))
        else { Files.copy(c, dst.resolve(c.getFileName)); () }
      }
    }

    // window 1 — pre-commit crash: a staged-but-unmarked tmp must be
    // discarded and the two deltas stay authoritative
    val tmp = java.nio.file.Paths.get(root, ".tmp-compact")
    Files.createDirectories(tmp)
    Files.write(tmp.resolve("garbage"), "torn".getBytes("UTF-8"))
    assert(rows(AnnIndex.scoreIvfPq(spark, sfDir,
      AnnIndex.load(spark, root), 3)) == before)
    assert(!Files.exists(tmp), "unmarked stage must be discarded by recovery")
    assert(graft.util.Dirs.numericSuffixes(root, "delta=").sorted == Seq(1, 2))

    // window 2 — post-commit crash before the swap: fold fully staged +
    // marker written, old deltas untouched. Manufacture it from a real
    // fold on a sibling root (identical input ⇒ identical staged bytes
    // shape), then recovery must COMPLETE the fold.
    val sib = SparkSpec.tempDir("graft-ann-crash-sib-").toString
    AnnIndex.buildBase(spark, sfDir, sib, AnnIndex.standingPred)
    AnnIndex.appendBatch(spark, sfDir, sib, AnnIndex.batchPred)
    AnnIndex.compact(spark, sib)
    copyTree(java.nio.file.Paths.get(s"$sib/delta=00001"), tmp)
    Files.createFile(java.nio.file.Paths.get(root, ".compact_swap"))
    assert(rows(AnnIndex.scoreIvfPq(spark, sfDir,
      AnnIndex.load(spark, root), 3)) == before,
      "recovery must complete a committed fold")
    assert(graft.util.Dirs.numericSuffixes(root, "delta=").sorted == Seq(1),
      "the committed fold must leave exactly the folded base")

    // window 3 — crash between the rename and the marker delete: marker
    // present, no stage. Recovery must clear ONLY the marker — deleting
    // delta=00001 here would destroy the just-folded base.
    Files.createFile(java.nio.file.Paths.get(root, ".compact_swap"))
    assert(rows(AnnIndex.scoreIvfPq(spark, sfDir,
      AnnIndex.load(spark, root), 3)) == before)
    assert(graft.util.Dirs.numericSuffixes(root, "delta=").sorted == Seq(1))
    assert(!Files.exists(java.nio.file.Paths.get(root, ".compact_swap")))
  }

  test("sq8 rides the whole lifecycle: frozen-range append, artifacts survive a fold") {
    val root = SparkSpec.tempDir("graft-ann-sq8-life-").toString
    AnnIndex.buildBase(spark, sfDir, root, AnnIndex.standingPred, withSq8 = true)
    // append encodes against the FROZEN persisted ranges (no retrain) —
    // the batch's codes must equal encoding the batch directly against the
    // base's published range table
    AnnIndex.appendBatch(spark, sfDir, root, AnnIndex.batchPred)
    val idx = AnnIndex.load(spark, root)
    assert(idx.sq8Ranges.isDefined && idx.sq8Codes.isDefined)
    val appended = rows(idx.sq8Codes.get
      .filter(col("vec_id") % 7 === 0).select(col("vec_id")))
    assert(appended.nonEmpty, "append must contribute sq8 codes for the batch")
    val before = rows(AnnIndex.scoreSq8(spark, sfDir, idx))
    // fold: sq8 artifacts must survive and serving must be bit-identical
    AnnIndex.compact(spark, root)
    assert(graft.util.Dirs.numericSuffixes(root, "delta=").sorted == Seq(1))
    val folded = AnnIndex.load(spark, root)
    assert(folded.sq8Ranges.isDefined && folded.sq8Codes.isDefined,
      "compaction dropped the sq8 artifacts")
    assert(rows(AnnIndex.scoreSq8(spark, sfDir, folded)) == before,
      "compaction changed the sq8 serving surface")
  }

  test("two-stage rerank: exact stage strictly refines the ADC shortlist, plan stays pure") {
    val reranked = Similarity.annIvfPqRerank(spark, sfDir)
    val plan = reranked.queryExecution.executedPlan.toString()
    assert(plan.contains("delta=00001"),
      "the candidate stage must scan the persisted index")
    assert(!plan.contains("collect_list") && !plan.contains("min_by"),
      "training leaked into the two-stage serving plan")
    // the refine guarantee: every (query, neighbor) the ADC top-3 got right
    // survives the exact re-rank (a true neighbor in the shortlist can only
    // be out-ranked by the true top-2)
    val exact = rows(Similarity.cosineTopK(spark, sfDir).filter(col("rank") <= 3)
      .select(col("query_id"), col("neighbor_id")))
    val adcHits = rows(Similarity.annIvfPq(spark, sfDir)
      .select(col("query_id"), col("neighbor_id"))).intersect(exact)
    val rrHits = rows(reranked.select(col("query_id"), col("neighbor_id"))).intersect(exact)
    assert(adcHits.subsetOf(rrHits),
      s"re-ranking lost true neighbors the ADC stage had: ${adcHits.diff(rrHits)}")
  }

  test("SQ8 serves from the shared index: persisted codes + ranges, no quantization operator") {
    val plan = Similarity.annSq8(spark, sfDir)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("delta=00001"),
      "SQ8 scoring must scan the shared index's persisted artifacts")
    assert(!plan.contains("collect_list"),
      "range/code building (collect_list) leaked into the SQ8 serving plan")
    assert(!plan.contains("posexplode"),
      "element-level quantization (posexplode) leaked into the SQ8 serving plan")
  }

  test("residual serving is pure: persisted scan, no training operator") {
    AnnIndex.annIvfPqResidual(spark, sfDir) // ensure built
    val plan = AnnIndex.annIvfPqResidual(spark, sfDir)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("delta=00001"),
      "residual scoring must scan its persisted base delta")
    assert(!plan.contains("collect_list"),
      "quantizer training (collect_list) leaked into the residual serving plan")
    assert(!plan.contains("min_by"),
      "code encoding (min_by) leaked into the residual serving plan")
    // and the two encodings genuinely serve different indexes: the resid
    // root is distinct from the full root
    val rr = AnnIndex.rootOf(spark, sfDir, "resid")
    val fr = AnnIndex.rootOf(spark, sfDir, "full")
    assert(rr.isDefined && rr != fr)
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
