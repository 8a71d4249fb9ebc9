package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generalized as-of (point-in-time) join.
  *
  * For every left row, find the single most recent right row whose order
  * column is <= the left row's order column, matched on equal keys — the
  * "price as of each trade" join. Spark has no native as-of operator; the
  * classic formulations both fail at scale:
  *
  *   - range join (`l.key = r.key AND r.ord <= l.ord` + window max): the
  *     join multiplies every left row by ALL earlier right rows before the
  *     window prunes — quadratic in right-rows-per-key;
  *   - correlated scalar subquery: re-executes per left row.
  *
  * This implementation is the merge-as-union decomposition: tag both inputs,
  * union them, and run ONE window per key ordered by (ord, side) carrying
  * the last non-null right payload forward. Cost = one shuffle of
  * |left| + |right| rows on the key, one per-partition sort — linear, the
  * same asymptotics as a sort-merge join, with no row multiplication. Both
  * sides can be arbitrarily large (neither is broadcast), so the shape holds
  * when left AND right are 100 TB fact tables.
  *
  * Tie semantics: a right row at exactly the left row's order value matches
  * (inclusive <=) — right rows sort before left rows at equal `ord`. If
  * several right rows share (key, ord), the union's last one wins; callers
  * wanting determinism must make `ord` unique per key (the catalog query
  * uses the globally-unique event sequence).
  */
object AsOf {

  /** Backward as-of join, inner semantics (left rows with no earlier right
    * match are dropped; use [[backwardOuter]] to keep them with nulls).
    *
    * @param on       equality key columns (same names both sides)
    * @param leftOrd  left ordering column name
    * @param rightOrd right ordering column name
    * @param payload  right columns to bring across (prefixed in the output)
    * @param prefix   prefix for the payload columns in the output
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftOrd: String,
      rightOrd: String,
      payload: Seq[String],
      prefix: String = "asof_"): DataFrame =
    backwardOuter(left, right, on, leftOrd, rightOrd, payload, prefix)
      .na.drop(prefix + rightOrd :: Nil)

  /** Backward as-of join, left-outer semantics. */
  def backwardOuter(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftOrd: String,
      rightOrd: String,
      payload: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    // the union below merges same-named columns silently, so a left/right
    // column that collides with our scratch names would corrupt the
    // carried-forward payload (LEFT rows feeding last(__payload)) — fail
    // loudly instead
    val reserved = Set("__ord", "__payload", "__side", "__m")
    val clash = (left.columns ++ right.columns).filter(reserved)
    require(clash.isEmpty,
      s"as-of inputs must not contain reserved columns ${clash.mkString(", ")}")
    val keep = (rightOrd +: payload).distinct
    val r = right.select(
      on.map(col) ++ Seq(
        col(rightOrd).as("__ord"),
        struct(keep.map(col): _*).as("__payload"),
        lit(0).as("__side")): _*)
    val l = left
      .withColumn("__ord", col(leftOrd))
      .withColumn("__side", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)

    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("__ord"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__m", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val outCols: Seq[Column] =
      left.columns.map(col).toSeq ++
        keep.map(f => col(s"__m.$f").as(prefix + f))
    matched.select(outCols: _*)
  }
}
