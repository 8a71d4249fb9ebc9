package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.TextHash

/** Native per-document fingerprint expressions for the dedup operators.
  *
  * The SQL formulations of SimHash and MinHash explode every document into
  * (words × 32 bit-positions) / (shingles × 16 permutations) rows and push
  * them through shuffling hash aggregates — ~10M intermediate rows at
  * sf0.1, and row volume scales linearly with corpus size. Both
  * fingerprints are per-document folds with no cross-document state, so
  * they belong in the scan projection: one codegen'd expression call per
  * document, zero pre-join shuffles. At 100 TB this turns the fingerprint
  * stage from the dominant shuffle into a free map.
  *
  * Exactness contract: every operation is the SAME integer arithmetic the
  * DuckDB oracle runs in exploded form (char-polynomial word hash mod
  * p = 1e9+7 from [[graft.functions.TextHash]], ±1 bit votes, min over
  * permuted shingle hashes) — integer sums/mins are order-independent, so
  * the oracle SQL is unchanged and the comparison stays bit-exact. All
  * intermediates stay < 2^63 (hash < 1e9+7; largest product
  * 1e9 · 2654435761 < 2^62).
  */
object TextFingerprint {

  private val P = TextHash.P

  /** Char-polynomial word hash: acc = (acc·131 + codepoint) mod P, left to
    * right — identical to TextHash.sparkWordHash / duckWordHash (both
    * engines' `split(w, '')` + `ascii` walk codepoints). A null word (never
    * produced by split(), but the registered SQL functions accept any
    * ARRAY<STRING>) hashes like the empty string instead of crashing the
    * task from generated code. */
  def wordHash(w: UTF8String): Long = {
    if (w == null) return 0L
    val s = w.toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 131 + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }

  /** 32-bit SimHash over a words array: per word, wh2 = (hash·2654435761)
    * mod 2^32; bit j votes +1 if set else −1; fingerprint sets bit j where
    * the vote total is positive. */
  def simhash32(words: ArrayData): Long = {
    val votes = new Array[Int](32)
    val n = words.numElements()
    var i = 0
    while (i < n) {
      val wh2 = (wordHash(words.getUTF8String(i)) * 2654435761L) % 4294967296L
      var j = 0
      while (j < 32) {
        votes(j) += (if (((wh2 >>> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 32) {
      if (votes(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }

  /** 8 MinHash+LSH band keys over a words array: 16 permutation minima of
    * the word-3-gram shingle hashes (min over duplicates ≡ min over the
    * distinct set), packed pairwise into band keys mh(2b)·P + mh(2b+1).
    * A document with fewer than 3 words has no shingles: returns an empty
    * array (explodes to zero candidate rows), so callers need no separate
    * length guard. */
  def minhashBands(words: ArrayData): GenericArrayData = {
    val n = words.numElements()
    if (n < 3) return new GenericArrayData(new Array[Any](0))
    val mh = Array.fill[Long](16)(Long.MaxValue)
    val sep = UTF8String.fromString(" ")
    var i = 0
    while (i <= n - 3) {
      val shingle = UTF8String.concat(
        words.getUTF8String(i), sep, words.getUTF8String(i + 1), sep,
        words.getUTF8String(i + 2))
      val wh = wordHash(shingle)
      var k = 0
      while (k < 16) {
        val h = (wh * (97 + 31 * k) + (13 + 17 * k)) % P
        if (h < mh(k)) mh(k) = h
        k += 1
      }
      i += 1
    }
    val bands = new Array[Any](8)
    var b = 0
    while (b < 8) {
      bands(b) = mh(2 * b) * P + mh(2 * b + 1)
      b += 1
    }
    new GenericArrayData(bands)
  }

  /** 4 × 16-bit band chunks of a 64-bit SimHash. The fingerprint's low 32
    * bits vote from `(hash·2654435761) mod 2^32` (same mix as
    * [[simhash32]]), the high 32 bits from an independent multiplier
    * `(hash·2246822519) mod 2^32` — both products stay < 2^62, so the
    * DuckDB oracle runs the identical arithmetic in plain BIGINTs. Returned
    * as the four band keys (not the packed 64-bit value): bit 63 of a
    * packed fingerprint is not representable as a positive BIGINT sum in
    * SQL, and the band keys are what the blocking join consumes anyway.
    *
    * Scale rationale (vs the 8-bit bands of rounds 1-5): candidate pairs
    * grow ~N²/keyspace per band; 2^8 = 256 keys puts ~N/256 docs in a band
    * bucket (quadratic blow-up at 10⁹ docs), 2^16 = 65536 keeps the bucket
    * ~N/65536. Hot band keys (boilerplate-heavy corpora) remain possible —
    * salt the band-key join when a key's bucket exceeds the executor
    * budget. */
  def simhash64Bands(words: ArrayData): GenericArrayData = {
    val votes = new Array[Int](64)
    val n = words.numElements()
    var i = 0
    while (i < n) {
      val wh = wordHash(words.getUTF8String(i))
      val lo = (wh * 2654435761L) % 4294967296L
      val hi = (wh * 2246822519L) % 4294967296L
      var j = 0
      while (j < 32) {
        votes(j) += (if (((lo >>> j) & 1L) == 1L) 1 else -1)
        votes(32 + j) += (if (((hi >>> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      i += 1
    }
    val bands = new Array[Any](4)
    var b = 0
    while (b < 4) {
      var chunk = 0L
      var j = 0
      while (j < 16) {
        if (votes(16 * b + j) > 0) chunk |= (1L << j)
        j += 1
      }
      bands(b) = chunk
      b += 1
    }
    new GenericArrayData(bands)
  }

  /** The 16 raw MinHash permutation minima (the signature [[minhashBands]]
    * packs pairwise): position-wise equality between two signatures is an
    * unbiased estimator of shingle-set Jaccard similarity — `matches/16` —
    * so candidate pairs from the band join can be SCORED without ever
    * touching the documents' text again. Fewer than 3 words → empty. */
  def minhashSig(words: ArrayData): GenericArrayData = {
    val n = words.numElements()
    if (n < 3) return new GenericArrayData(new Array[Any](0))
    val mh = Array.fill[Long](16)(Long.MaxValue)
    val sep = UTF8String.fromString(" ")
    var i = 0
    while (i <= n - 3) {
      val shingle = UTF8String.concat(
        words.getUTF8String(i), sep, words.getUTF8String(i + 1), sep,
        words.getUTF8String(i + 2))
      val wh = wordHash(shingle)
      var k = 0
      while (k < 16) {
        val h = (wh * (97 + 31 * k) + (13 + 17 * k)) % P
        if (h < mh(k)) mh(k) = h
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mh.map(x => x: Any))
  }

  /** KMV (k-minimum-values) sketch of a document's shingle set: the k
    * smallest DISTINCT values of `(wordHash(shingle) · 2654435761) mod 2^32`
    * over word-3-gram shingles, returned sorted ascending.
    *
    * KMV sketches compose under union — the k smallest of a group's shingle
    * universe are always among the union of its documents' per-doc k
    * smallest — so corpus-level sketches aggregate from this one scan-side
    * projection: explode (≤ k longs per doc), distinct, bounded top-k. No
    * shingle strings ever shuffle, and the estimator
    * `distinct ≈ (k−1)·M/h_(k)` plus the Jaccard share `|K(A∪B)∩A∩B|/k`
    * (Beyer et al., SIGMOD'07) lets two 100 TB corpus snapshots be compared
    * for content overlap with a langs×k-long exchange instead of a
    * shingle-level join.
    *
    * Same exactness contract as the other fingerprints: identical integer
    * arithmetic to the oracle's exploded formulation (multiplied hash
    * < 2^62; distinct-set minima are order-independent). Fewer than 3 words
    * → no shingles → empty sketch. */
  def kmvSketch(words: ArrayData, k: Int): GenericArrayData = {
    val n = words.numElements()
    if (n < 3) return new GenericArrayData(new Array[Any](0))
    val set = new java.util.TreeSet[java.lang.Long]()
    val sep = UTF8String.fromString(" ")
    var i = 0
    while (i <= n - 3) {
      val shingle = UTF8String.concat(
        words.getUTF8String(i), sep, words.getUTF8String(i + 1), sep,
        words.getUTF8String(i + 2))
      val h = (wordHash(shingle) * 2654435761L) % 4294967296L
      if (set.size < k || h < set.last) {
        set.add(h)
        if (set.size > k) set.pollLast()
      }
      i += 1
    }
    val out = new Array[Any](set.size)
    var j = 0
    val it = set.iterator()
    while (it.hasNext) { out(j) = it.next().longValue(); j += 1 }
    new GenericArrayData(out)
  }

  private def checkWordsInput(name: String, child: Expression): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$name requires ARRAY<STRING> input, got ${t.simpleString}")
    }

  case class SimHash32(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      checkWordsInput("graft_simhash32", child)
    override def dataType: DataType = LongType
    override protected def nullSafeEval(input: Any): Any =
      simhash32(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.plans.TextFingerprint.simhash32($c)")
    override protected def withNewChildInternal(newChild: Expression): SimHash32 =
      copy(child = newChild)
    override def prettyName: String = "graft_simhash32"
  }

  case class MinHashBands(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      checkWordsInput("graft_minhash_bands", child)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(input: Any): Any =
      minhashBands(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.plans.TextFingerprint.minhashBands($c)")
    override protected def withNewChildInternal(newChild: Expression): MinHashBands =
      copy(child = newChild)
    override def prettyName: String = "graft_minhash_bands"
  }

  case class SimHash64Bands(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      checkWordsInput("graft_simhash64_bands", child)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(input: Any): Any =
      simhash64Bands(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.plans.TextFingerprint.simhash64Bands($c)")
    override protected def withNewChildInternal(newChild: Expression): SimHash64Bands =
      copy(child = newChild)
    override def prettyName: String = "graft_simhash64_bands"
  }

  case class MinHashSig(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      checkWordsInput("graft_minhash_sig", child)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(input: Any): Any =
      minhashSig(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.plans.TextFingerprint.minhashSig($c)")
    override protected def withNewChildInternal(newChild: Expression): MinHashSig =
      copy(child = newChild)
    override def prettyName: String = "graft_minhash_sig"
  }

  case class KmvSketch(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(StringType, _), IntegerType) if right.foldable =>
          val kv = right.eval(null)
          if (kv != null && kv.asInstanceOf[Int] > 0) TypeCheckResult.TypeCheckSuccess
          else TypeCheckResult.TypeCheckFailure(
            s"graft_kmv_sketch: k must be a positive INT literal, got $kv")
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"graft_kmv_sketch requires (ARRAY<STRING>, foldable INT) inputs, " +
            s"got ${l.simpleString}, ${r.simpleString}")
      }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(words: Any, k: Any): Any =
      kmvSketch(words.asInstanceOf[ArrayData], k.asInstanceOf[Int])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (w, k) => s"graft.plans.TextFingerprint.kmvSketch($w, $k)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): KmvSketch =
      copy(left = newLeft, right = newRight)
    override def prettyName: String = "graft_kmv_sketch"
  }

  /** Register the native function surface on an existing session
    * (idempotent; single source of truth is [[GraftExtensions.functions]]). */
  def register(spark: SparkSession): Unit =
    GraftExtensions.functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
