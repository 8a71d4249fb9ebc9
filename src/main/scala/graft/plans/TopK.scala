package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: `graft_topk(value, k)` keeps the k largest LONG
  * values per group and returns them sorted descending.
  *
  * Why an aggregate and not a window: the idiomatic "top-k per group"
  * (`row_number() OVER (PARTITION BY g ORDER BY v DESC) <= k`) sorts EVERY
  * group's full row set — at 100 TB that is a shuffle of the whole fact
  * table followed by a per-partition sort, and the sort is the cost. A
  * bounded aggregate keeps a k-element min-heap per group and — the actual
  * point — participates in partial aggregation: each map task pre-collapses
  * its rows to ≤ k values per group before the exchange, so the shuffle
  * carries `groups × k` longs instead of every row. Same reason built-in
  * `collect_list` cannot do this: it is unbounded, so Spark must disable
  * partial aggregation for it; boundedness is what buys the map-side
  * combine.
  *
  * Determinism: the result is a sorted multiset of VALUES (not rows), so
  * ties need no arbitrary row choice and the DuckDB oracle
  * (`list(v ORDER BY v DESC)[1:k]`) matches bit-for-bit.
  *
  * Nulls are skipped (SQL aggregate convention); a group with no non-null
  * input yields an empty array. `k` must be a foldable positive INT.
  */
case class TopKLongs(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKLongs.Heap] {

  private lazy val k: Int = kExpr.eval(null).asInstanceOf[Int]

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, kExpr.dataType) match {
      case (LongType, IntegerType) if kExpr.foldable =>
        val kv = kExpr.eval(null)
        if (kv != null && kv.asInstanceOf[Int] > 0) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"graft_topk: k must be a positive INT literal, got $kv")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_topk requires (BIGINT, foldable INT) inputs, got " +
          s"${l.simpleString}, ${r.simpleString}")
    }

  override def createAggregationBuffer(): TopKLongs.Heap = new TopKLongs.Heap(k)

  override def update(buf: TopKLongs.Heap, input: InternalRow): TopKLongs.Heap = {
    val v = child.eval(input)
    if (v != null) buf.offer(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKLongs.Heap, other: TopKLongs.Heap): TopKLongs.Heap = {
    buf.absorb(other)
    buf
  }

  override def eval(buf: TopKLongs.Heap): Any =
    new GenericArrayData(buf.sortedDesc)

  override def serialize(buf: TopKLongs.Heap): Array[Byte] = {
    val vals = buf.sortedDesc
    val bb = ByteBuffer.allocate(4 + 8 * vals.length)
    bb.putInt(vals.length)
    vals.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKLongs.Heap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKLongs.Heap(k)
    var i = 0
    while (i < n) { h.offer(bb.getLong); i += 1 }
    h
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child, kExpr)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKLongs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKLongs =
    copy(child = newChildren(0), kExpr = newChildren(1))

  override def prettyName: String = "graft_topk"
}

object TopKLongs {

  /** Fixed-capacity min-heap over a long array: the root is the SMALLEST of
    * the kept values, so a new value beats the heap iff it beats the root.
    * O(log k) per offer, k longs of state — the partial-aggregation buffer
    * that crosses the shuffle. */
  final class Heap(k: Int) {
    private val a = new Array[Long](k)
    private var n = 0

    def offer(v: Long): Unit =
      if (n < k) {
        a(n) = v; n += 1
        var i = n - 1 // sift up
        while (i > 0 && a((i - 1) / 2) > a(i)) {
          val t = a(i); a(i) = a((i - 1) / 2); a((i - 1) / 2) = t
          i = (i - 1) / 2
        }
      } else if (v > a(0)) {
        a(0) = v
        var i = 0 // sift down
        var done = false
        while (!done) {
          val l = 2 * i + 1; val r = l + 1
          var m = i
          if (l < n && a(l) < a(m)) m = l
          if (r < n && a(r) < a(m)) m = r
          if (m == i) done = true
          else { val t = a(i); a(i) = a(m); a(m) = t; i = m }
        }
      }

    def absorb(other: Heap): Unit = {
      var i = 0
      while (i < other.n) { offer(other.a(i)); i += 1 }
    }

    def sortedDesc: Array[Long] = {
      val out = java.util.Arrays.copyOf(a, n)
      java.util.Arrays.sort(out)
      var i = 0; var j = n - 1 // reverse in place
      while (i < j) { val t = out(i); out(i) = out(j); out(j) = t; i += 1; j -= 1 }
      out
    }
  }
}
