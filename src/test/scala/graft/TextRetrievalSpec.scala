package graft

import org.apache.spark.sql.functions._

import graft.queries.{Dedup, TextOps}

/** Hand-built-frame semantics of the retrieval/substring-dedup operators:
  * the winnowing guarantee (any shared run of ≥ k+w-1 words yields a shared
  * fingerprint) and BM25's rarity/tf ordering. */
class TextRetrievalSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("winnow: a shared 8-word passage yields >= 1 shared fingerprint; unrelated docs share none") {
    val passage = "alpha beta gamma delta epsilon zeta eta theta"
    val d = docs(
      1L -> s"one two three $passage four five six",
      2L -> s"seven eight nine ten $passage eleven",
      3L -> "completely different words with no overlap at all here")
    val fps = Dedup.winnowFingerprints(d)

    val shared = fps.as("a").join(fps.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .count()
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet

    assert(shared.contains((1L, 2L)), "docs sharing the passage must share a fingerprint")
    assert(!shared.exists(p => p._1 == 3L || p._2 == 3L),
      "the unrelated doc must not pair with anything")
  }

  test("winnow: documents shorter than k+w-1 words produce no fingerprints") {
    val fps = Dedup.winnowFingerprints(docs(1L -> "only seven words are in here now"))
    assert(fps.count() == 0)
  }

  test("bm25: higher tf of a query term ranks a doc higher; equal docs tie-break on doc_id") {
    val filler = "x y z"
    val d = docs(
      1L -> s"spark $filler",               // tf(spark)=1
      2L -> s"spark spark spark $filler",   // tf(spark)=3, same length class
      3L -> s"nothing relevant here $filler")
    val top = TextOps.bm25(d, Seq("spark")).collect()

    assert(top.map(_.getLong(0)).toSeq == Seq(2L, 1L),
      "tf=3 doc first, tf=1 doc second, no-match doc absent")
    assert(top.forall(_.getDouble(1) > 0.0))
  }

  test("bm25: a rarer term outweighs a common one at equal tf") {
    // 'rare' appears in 1 of 4 docs, 'common' in 3 of 4 — idf(rare) > idf(common)
    val d = docs(
      1L -> "rare a b c",
      2L -> "common a b c",
      3L -> "common d e f",
      4L -> "common g h i")
    val scores = TextOps.bm25(d, Seq("rare", "common")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

    assert(scores(1L) > scores(2L),
      "equal tf and length: the rare-term doc must outscore a common-term doc")
  }
}
