package graft.util

import org.apache.spark.sql.{functions, Column, DataFrame}
import org.apache.spark.sql.functions.{col, explode, lit, pmod, sequence}

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

  /** Session config: bucket count for salted band/bucket SELF-joins. 0
    * (default) = plain equi-join, relying on AQE's runtime skew split
    * (SkewJoinSpec); > 0 = static salting below, for deployments whose
    * band-key skew is known up front (a boilerplate header shared by
    * millions of documents makes one band key quadratic BEFORE the join
    * output AQE measures — salting bounds the build itself). */
  val selfJoinBucketsKey = "spark.graft.salt.selfJoinBuckets"

  /** Candidate-pair self-join on a blocking key — `(id_a < id_b sharing
    * key)`, the shape of every band/bucket dedup join — routed through the
    * [[selfJoinBucketsKey]] gate: plain when 0, salted when set.
    * Output: one (id_a, id_b) row per shared-key co-occurrence (callers
    * aggregate per pair). Result is IDENTICAL either way; only the shuffle
    * layout changes. */
  def pairSelfJoin(df: DataFrame, key: String, idCol: String): DataFrame =
    pairSelfJoin(df, Seq(key), idCol)

  /** Composite-key form — the minhash/simhash/phash band joins block on
    * (band index, band key). One gate covers every candidate-pair join in
    * the repo, so the skew story is uniform: AQE split by default, static
    * salting via [[selfJoinBucketsKey]] when a boilerplate band key is
    * known to be hot up front. */
  def pairSelfJoin(df: DataFrame, keys: Seq[String], idCol: String): DataFrame =
    pairSelfJoinCarry(df, keys, idCol, Nil)
      .select(col(s"${idCol}_a").as("id_a"), col(s"${idCol}_b").as("id_b"))

  def saltedPairSelfJoin(df: DataFrame, key: String, idCol: String,
      buckets: Int): DataFrame = saltedPairSelfJoin(df, Seq(key), idCol, buckets)

  /** The salted variant: side A takes a deterministic per-row salt from its
    * id, side B replicates each row across ALL buckets, and the join keys
    * on (key, salt) — so a hot key's pair build spreads over `buckets`
    * reducers while every (a, b) pair still meets exactly once, at the
    * reducer owning a's salt. Cost model: a key with H rows pays H·buckets
    * replicated rows against H²/buckets per-reducer pair work — the right
    * trade exactly when one H is pathological. The salt derives from the id
    * (not rand()), so the plan stays deterministic and replayable. */
  def saltedPairSelfJoin(df: DataFrame, keys: Seq[String], idCol: String,
      buckets: Int): DataFrame =
    saltedCarry(df, keys, idCol, Nil, buckets)
      .select(col(s"${idCol}_a").as("id_a"), col(s"${idCol}_b").as("id_b"))

  /** [[pairSelfJoin]] variant that also carries per-side payload columns
    * through the gate (e.g. window POSITIONS for substring-run detection):
    * each `carry` column c surfaces as `c_a` / `c_b`. Same gate, same
    * determinism, same either-way-identical result contract. This is THE
    * implementation — the id-only forms above are carry=Nil projections of
    * it, so the gate logic exists exactly once. */
  def pairSelfJoinCarry(df: DataFrame, keys: Seq[String], idCol: String,
      carry: Seq[String]): DataFrame = {
    val buckets = df.sparkSession.conf
      .getOption(selfJoinBucketsKey).map(_.toInt).getOrElse(0)
    if (buckets <= 0)
      df.as("a").join(df.as("b"),
          keyEq(keys) && col(s"a.$idCol") < col(s"b.$idCol"))
        .select(carryCols(idCol, carry): _*)
    else saltedCarry(df, keys, idCol, carry, buckets)
  }

  private def carryCols(idCol: String, carry: Seq[String]) =
    (Seq(idCol) ++ carry).flatMap(c =>
      Seq(col(s"a.$c").as(s"${c}_a"), col(s"b.$c").as(s"${c}_b")))

  private def saltedCarry(df: DataFrame, keys: Seq[String], idCol: String,
      carry: Seq[String], buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val a = df.withColumn("__salt", pmod(functions.hash(col(idCol)), lit(buckets)))
    val b = df.withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
    a.as("a").join(b.as("b"),
        keyEq(keys) &&
          col("a.__salt") === col("b.__salt") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(carryCols(idCol, carry): _*)
  }

  private def keyEq(keys: Seq[String]): Column =
    keys.map(k => col(s"a.$k") === col(s"b.$k")).reduce(_ && _)
}
