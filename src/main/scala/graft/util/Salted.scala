package graft.util

import org.apache.spark.sql.{functions, Column, DataFrame}
import org.apache.spark.sql.functions.{col, lit, pmod}

/** Two-stage salted aggregation — the standard skew lever for hot keys.
  *
  * A plain `groupBy(keys).agg(sum)` sends every row of a hot key to one
  * reducer; salting splits each key across `buckets` partial aggregates
  * (stage 1) and then merges the partials (stage 2, tiny). Results are
  * identical to the direct aggregate — `SaltedSpec` asserts the law — and
  * the salt is derived from a deterministic row expression, not rand(), so
  * plans stay reproducible.
  */
object Salted {

  /** Salted equivalent of `df.groupBy(keys).agg(sum(valueCol) as alias)`. */
  def sum(df: DataFrame, keys: Seq[String], valueCol: String, alias: String,
      saltExpr: Column, buckets: Int = 16): DataFrame = {
    val keyCols = keys.map(col)
    df.withColumn("__salt", pmod(saltExpr, lit(buckets)))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(functions.sum(col(valueCol)).as(alias))
      .groupBy(keyCols: _*)
      .agg(functions.sum(col(alias)).as(alias))
  }
}
