package graft.sources.net

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter, PrintWriter}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets

import scala.util.control.NonFatal

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.sources.v2.{BlockFeedProvider, JsonBlockFeed}

/** The network leg of the block feed: a resumable block-stream wire
  * protocol plus the bridge process that drains it into the `graft-blocks`
  * chunk-directory contract.
  *
  * The reference consumes an Apibara gRPC subscription: connect with a
  * cursor, receive an ordered message stream whose arms are
  * `data | invalidate | heartbeat` (reference `src/index.ts:16-24,127-141`
  * for the subscription, `:142-287` for the dispatch). This sandbox ships
  * no gRPC/protobuf jars, so the transport is plain TCP with one JSON
  * object per line — same message alphabet, same resume semantics, zero
  * added dependencies (Jackson is Spark's own JSON library):
  *
  *   client → server  `{"cursor": N}`             subscribe from message N
  *   server → client  `{"t":"data","rows":[{...scalar row...}, ...]}`
  *                    `{"t":"invalidate","from": B}`
  *                    `{"t":"heartbeat"}`
  *                    `{"t":"end"}`               script exhausted (finite
  *                                                replay servers only; a
  *                                                live node never sends it)
  *
  * The drainer maps messages 1:1 onto committed chunks (`data` → a data
  * chunk, `invalidate`/`heartbeat` → control marker chunks), which makes
  * the chunk DIRECTORY the drainer's durable cursor: on restart it
  * subscribes from `committed-chunk count`, so a crash between socket read
  * and chunk commit replays exactly the uncommitted message. Chunk commit
  * is an atomic rename, so the feed never exposes a torn message — the
  * drainer inherits exactly-once hand-off to Spark from the connector's
  * offset contract without any state of its own.
  */
object BlockStreamWire {
  val mapper = new ObjectMapper()

  def data(rows: Seq[Map[String, Any]]): String = {
    val o = mapper.createObjectNode()
    o.put("t", "data")
    val arr = o.putArray("rows")
    rows.foreach { r =>
      val ro = arr.addObject()
      r.foreach {
        case (k, v: Long) => ro.put(k, v)
        case (k, v: Int) => ro.put(k, v.toLong)
        case (k, v: Double) => ro.put(k, v)
        case (k, v: Boolean) => ro.put(k, v)
        case (k, v: String) => ro.put(k, v)
        case (k, v) => throw new IllegalArgumentException(s"unsupported $k=$v")
      }
    }
    o.toString
  }

  def invalidate(fromBlock: Long): String =
    s"""{"t":"invalidate","from":$fromBlock}"""

  val heartbeat: String = """{"t":"heartbeat"}"""

  val end: String = """{"t":"end"}"""

  /** One wire row back to the scalar map [[JsonBlockFeed.emit]] takes.
    * Integral JSON numbers become Long, floating become Double — the only
    * numeric shapes the chunk contract admits. */
  def rowToMap(node: JsonNode): Map[String, Any] = {
    val it = node.fields()
    val b = Map.newBuilder[String, Any]
    while (it.hasNext) {
      val e = it.next()
      val v = e.getValue
      b += e.getKey -> (
        if (v.isIntegralNumber) v.asLong()
        else if (v.isFloatingPointNumber) v.asDouble()
        else if (v.isBoolean) v.asBoolean()
        else v.asText())
    }
    b.result()
  }
}

/** A finite replay server: serves the scripted message sequence to every
  * connection, starting at the cursor the client subscribes with — the
  * deterministic-replay behavior a chain node's cursor subscription gives
  * the reference (`index.ts:16-24`). Connections are accepted sequentially
  * (the drainer is a single bridge process); the server lives until
  * [[close]] or process exit.
  *
  * As a standalone process: `graft.sources.net.BlockStreamServer <port>
  * [blocks] [reorgAt]` serves [[BlockStreamScenario.chainWithReorg]] and
  * prints `PORT=<actual>` on stdout (pass port 0 for an ephemeral pick).
  */
final class BlockStreamServer(script: Seq[String], port: Int = 0) {
  private val server = new ServerSocket(port)
  def boundPort: Int = server.getLocalPort

  private val acceptor = new Thread(() => serveLoop(), "block-stream-server")
  acceptor.setDaemon(true)
  acceptor.start()

  private def serveLoop(): Unit =
    try while (!server.isClosed) {
      val sock = server.accept()
      try serveOne(sock)
      catch { case NonFatal(_) => () } // client vanished: await the next
      finally sock.close()
    } catch { case NonFatal(_) => () } // server closed

  private def serveOne(sock: Socket): Unit = {
    val in = new BufferedReader(
      new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
    val out = new PrintWriter(
      new OutputStreamWriter(sock.getOutputStream, StandardCharsets.UTF_8))
    val sub = BlockStreamWire.mapper.readTree(in.readLine())
    val cursor = Option(sub.get("cursor")).map(_.asInt()).getOrElse(0)
    script.drop(cursor).foreach { msg => out.println(msg); out.flush() }
    out.println(BlockStreamWire.end)
    out.flush()
  }

  def close(): Unit = server.close()
}

object BlockStreamServer {
  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(0)
    val blocks = args.lift(1).map(_.toLong).getOrElse(80L)
    val reorgAt = args.lift(2).map(_.toLong).getOrElse(50L)
    val srv = new BlockStreamServer(
      BlockStreamScenario.chainWithReorg(blocks, reorgAt), port)
    // the parent process reads the ephemeral port from this line
    println(s"PORT=${srv.boundPort}")
    Console.out.flush()
    Thread.currentThread().join() // serve until killed
  }
}

/** The bridge process ("the gRPC drainer" of the connector's Scaladoc):
  * subscribes at the feed directory's committed-chunk count and appends
  * each received message as one committed chunk. Restart-safe and
  * duplicate-free by construction — see [[BlockStreamWire]]. */
object BlockStreamDrainer {

  /** One connection: subscribe at the current chunk count, drain until the
    * server's `end`, EOF, or `maxMessages` chunks this call. Returns the
    * number of chunks committed; `completed` is true iff `end` was seen. */
  def drainOnce(host: String, port: Int, dir: String,
      maxMessages: Long = Long.MaxValue): (Long, Boolean) = {
    val feed = new JsonBlockFeed(dir)
    val cursor = BlockFeedProvider.listChunks(dir).length
    val sock = new Socket(host, port)
    try {
      val out = new PrintWriter(
        new OutputStreamWriter(sock.getOutputStream, StandardCharsets.UTF_8))
      out.println(s"""{"cursor":$cursor}"""); out.flush()
      val in = new BufferedReader(
        new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
      var n = 0L
      var completed = false
      var line = if (n < maxMessages) in.readLine() else null
      while (line != null && !completed) {
        val msg = BlockStreamWire.mapper.readTree(line)
        msg.get("t").asText() match {
          case "data" =>
            val rows = msg.get("rows")
            feed.emit((0 until rows.size()).map(i =>
              BlockStreamWire.rowToMap(rows.get(i))))
            n += 1
          case "invalidate" =>
            feed.emitInvalidate(msg.get("from").asLong()); n += 1
          case "heartbeat" =>
            feed.emitHeartbeat(); n += 1
          case "end" => completed = true
          case other => throw new IllegalStateException(s"unknown message arm: $other")
        }
        line = if (!completed && n < maxMessages) in.readLine() else null
      }
      (n, completed)
    } finally sock.close()
  }

  /** Reconnecting drain: the long-lived bridge loop. Resumes from the
    * chunk count after every disconnect (the reference bridge's retry,
    * `index.ts:127-141`); `maxRetries` bounds consecutive FAILED attempts
    * (any progress resets the counter). Returns total chunks committed. */
  def drain(host: String, port: Int, dir: String,
      maxRetries: Int = 5, backoffMs: Long = 200L): Long = {
    var total = 0L
    var failures = 0
    var completed = false
    while (!completed && failures <= maxRetries) {
      try {
        val (n, done) = drainOnce(host, port, dir)
        total += n
        completed = done
        if (n > 0) failures = 0
        if (!done) { failures += 1; Thread.sleep(backoffMs) }
      } catch {
        case NonFatal(_) => failures += 1; Thread.sleep(backoffMs)
      }
    }
    if (!completed)
      throw new IllegalStateException(
        s"drain gave up after $maxRetries consecutive failed attempts")
    total
  }

  def main(args: Array[String]): Unit = {
    val Array(host, port, dir) = args.take(3)
    val n = drain(host, port.toInt, dir)
    println(s"DRAINED=$n")
  }
}

/** Deterministic wire scripts shared by the server main and the specs. */
object BlockStreamScenario {

  private def rows(blocks: Seq[Long], pending: Boolean): Seq[Map[String, Any]] =
    blocks.map(b => Map[String, Any]("block_number" -> b,
      "transaction_index" -> 0L, "event_index" -> 0L, "is_pending" -> pending))

  /** The T3/T4 chain shape: finalized 1..`blocks` plus a pending head,
    * a heartbeat, then a reorg to `reorgAt` re-emitting a shorter new
    * chain `reorgAt..reorgAt+10` with its own pending head. After a full
    * drain + ingest the canonical table holds `reorgAt + 10` blocks and
    * the pending head is `reorgAt + 11`. */
  def chainWithReorg(blocks: Long, reorgAt: Long): Seq[String] = {
    require(blocks >= 2 && reorgAt >= 1 && reorgAt <= blocks)
    val mid = (blocks / 2).max(1L)
    Seq(
      BlockStreamWire.data(rows(1L to mid, pending = false)),
      BlockStreamWire.data(
        rows((mid + 1) to blocks, pending = false) ++
          rows(Seq(blocks + 1), pending = true)),
      BlockStreamWire.heartbeat,
      BlockStreamWire.invalidate(reorgAt),
      BlockStreamWire.data(
        rows(reorgAt to (reorgAt + 10), pending = false) ++
          rows(Seq(reorgAt + 11), pending = true)))
  }
}
