package graft

import org.apache.spark.sql.functions._

import graft.util.Salted

/** Salted two-stage aggregation law: identical results to the direct
  * groupBy, for skewed and uniform keys alike. */
class SaltedSpec extends SparkSpec {

  test("salted sum equals direct sum under heavy key skew") {
    import spark.implicits._
    // 90% of rows land on one hot key
    val rows = (1 to 10000).map { i =>
      (if (i % 10 == 0) s"k${i % 7}" else "hot", i.toLong)
    }
    val df = rows.toDF("k", "v")

    val direct = df.groupBy($"k").agg(sum($"v").as("s"))
    val salted = Salted.sum(df, Seq("k"), "v", "s", col("v"), buckets = 8)

    assert(salted.count() == direct.count())
    assert(salted.exceptAll(direct).isEmpty && direct.exceptAll(salted).isEmpty)
    // the stage-1 aggregate really fans the hot key out across buckets
    val stage1Groups = df.withColumn("__salt", pmod(col("v"), lit(8)))
      .groupBy($"k", $"__salt").count().filter($"k" === "hot").count()
    assert(stage1Groups == 8)
  }
}
