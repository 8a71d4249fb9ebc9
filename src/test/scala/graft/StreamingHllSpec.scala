package graft

import org.apache.spark.sql.functions._

import graft.streaming.StreamingHll
import graft.streaming.StreamingHll.State

/** The streaming HLL twin. Contract: register maxima are an order-free,
  * idempotent semilattice, so state after ANY micro-batch split equals
  * the batch sketch — bit-exact, no tolerance.
  */
class StreamingHllSpec extends SparkSpec {

  private def bruteRegs(users: Seq[Long]): Array[Byte] = {
    val regs = new Array[Byte](256)
    users.foreach { u =>
      val h = StreamingHll.hash(u)
      val j = (h % 256).toInt
      val r = StreamingHll.rho(h)
      if (r > regs(j)) regs(j) = r.toByte
    }
    regs
  }

  test("state after any split equals the one-shot register maxima") {
    val users = (0L until 3000L).map(i => i * 13 % 5000)
    val want = bruteRegs(users).toSeq
    for (m <- Seq(1, 2, 3, 7)) {
      val st = (0 until m).foldLeft(State(0L, new Array[Byte](256))) { (s, b) =>
        StreamingHll.merge(s, users.filter(_ % m == b).iterator)
      }
      assert(st.regs.toSeq == want, s"split %$m diverges")
      assert(st.seen == users.length.toLong)
    }
  }

  test("re-merging the same rows is idempotent on the registers") {
    val users = (0L until 500L)
    val once = StreamingHll.merge(State(0L, new Array[Byte](256)), users.iterator)
    val twice = StreamingHll.merge(once, users.iterator)
    assert(twice.regs.toSeq == once.regs.toSeq)
  }

  test("rho matches the batch bin-length formula; summary sums check out") {
    for (h <- Seq(0L, 1L, 255L, 256L, 511L, 1L << 20, (1L << 32) - 1)) {
      val w = h / 256
      val expect = if (w == 0) 25 else 25 - w.toBinaryString.length
      assert(StreamingHll.rho(h) == expect, s"h=$h")
    }
    val empty = StreamingHll.summarize("t", State(0L, new Array[Byte](256)))
    assert(empty.v_zero == 256 && empty.s2 == 256L * (1L << 25))
  }

  test("the replayed streaming sketch equals the batch HLL entry end-to-end") {
    val s = spark
    import s.implicits._
    val sfDir = SparkSpec.fixtureSf
    val streamed = graft.queries.StreamReplay.queries("streaming_hll_replay")(s, sfDir)
      .select($"event_type", $"exact_distinct", $"v_zero", $"s2", $"hll_raw")
      .as[(String, Long, Long, Long, Double)].collect().toSet
    val batch = graft.queries.Sessions.distinctHll(s, sfDir)
      .select($"event_type", $"exact_distinct", $"v_zero", $"s2", $"hll_raw")
      .as[(String, Long, Long, Long, Double)].collect().toSet
    assert(streamed == batch,
      s"stream minus batch: ${(streamed -- batch).take(3)}; " +
        s"batch minus stream: ${(batch -- streamed).take(3)}")
  }
}
