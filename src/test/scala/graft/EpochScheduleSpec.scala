package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.queries.Sampling

/** mix_epoch_schedule: water-filling invariants on the driver fixture, and
  * the 4-epoch repetition cap actually engaging on a skewed corpus (the
  * near-uniform fixture sources all sit at the shared level). */
class EpochScheduleSpec extends SparkSpec {

  test("budget conservation and level flatness on the fixture") {
    val rows = Sampling.epochSchedule(spark, SparkSpec.fixtureSf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n_tok")).sum
    val alloc = rows.map(_.getAs[Long]("alloc")).sum
    // exact up to the integer sweep remainder (< one token per source)
    assert(alloc <= 2 * total && 2 * total - alloc < rows.length.toLong,
      s"alloc $alloc vs budget ${2 * total}")
    rows.foreach { r =>
      assert(r.getAs[Long]("alloc") <= r.getAs[Long]("cap"))
      assert(r.getAs[Long]("epochs_bp") <= 40000L, "never past 4 epochs")
      assert(r.getAs[Boolean]("at_cap") ==
        (r.getAs[Long]("alloc") == r.getAs[Long]("cap")))
    }
    // all non-capped sources share ONE water level
    val levels = rows.filter(!_.getAs[Boolean]("at_cap")).map(_.getAs[Long]("alloc")).distinct
    assert(levels.length <= 1, s"non-capped allocations not flat: ${levels.toSeq}")
  }

  test("the 4-epoch cap engages on a skewed corpus and the level absorbs the remainder") {
    val dir = SparkSpec.fixtureDirExcept("documents")
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = true),
      StructField("lang", StringType, nullable = true),
      StructField("source", StringType, nullable = true),
      StructField("n_chars", LongType, nullable = true)))
    // one dominant source (1000 tokens) + two tiny ones (10 each): at
    // B = 2T = 2040, the tiny caps (40) fill first and the giant takes the
    // rest — the data-constrained shape (small sources repeat 4x, the head
    // sits under 2 epochs)
    val docs = Seq(
      Row(1L, ("w " * 1000).trim, "en", "big", 2000L),
      Row(2L, ("x " * 10).trim, "en", "tinyA", 20L),
      Row(3L, ("y " * 10).trim, "en", "tinyB", 20L))
    spark.createDataFrame(spark.sparkContext.parallelize(docs, 1), schema)
      .write.mode("overwrite").parquet(dir.resolve("documents.parquet").toString)

    val rows = Sampling.epochSchedule(spark, dir.toString).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(rows("tinyA").getAs[Boolean]("at_cap"))
    assert(rows("tinyA").getAs[Long]("alloc") == 40L)
    assert(rows("tinyA").getAs[Long]("epochs_bp") == 40000L)
    assert(rows("tinyB").getAs[Boolean]("at_cap"))
    assert(!rows("big").getAs[Boolean]("at_cap"))
    assert(rows("big").getAs[Long]("alloc") == 2040L - 80L)
    assert(rows("big").getAs[Long]("epochs_bp") == (1960L * 10000L) / 1000L)
  }
}
