package graft.streaming

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException, IOException}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Path
import java.util.concurrent.ConcurrentHashMap

/** S3/S4 over a REAL broker boundary: a single-node TCP server that owns
  * partitioned topic logs, consumer-group commits and producer fences,
  * with stateless clients ([[BrokerTopic]]) speaking a length-framed
  * binary protocol over a socket. This is the third
  * [[QueueTopic]] implementation the conformance kit
  * (QueueTopicConformance) was designed for: the same contract the
  * in-memory double and the file transport pin, but with every piece of
  * state on the OTHER SIDE of a network connection — the topology the
  * reference actually deploys (its stages talk to a broker daemon over
  * TCP, queue.js:73-78; config/apm_config.json:87-114), and the shape a
  * Kafka deployment has.
  *
  * Why not embedded Kafka: this container has no Kafka artifacts at all
  * (no jars under /opt/spark/jars, none in the offline coursier cache,
  * zero egress to fetch any), so conformance against a real broker
  * *protocol stack* is proven by owning one. The serving semantics
  * delegate to an in-process [[QueueTopic]] per topic — [[InMemoryTopic]]
  * by default (broker restart loses state, like an un-fsynced broker), or
  * [[FileTopic]] under `dataDir` (the broker persists its own log
  * segments, clients still never touch the filesystem — Kafka's
  * deployment shape).
  *
  * Concurrency: one daemon accept loop, one daemon handler thread per
  * connection; atomicity of the contract's critical sections
  * (`produceAll`, `produceFenced`, retention) is the delegate topic's —
  * requests from different connections interleave only at operation
  * granularity, exactly the broker-side serialization a real broker
  * provides.
  *
  * Protocol (all frames big-endian via DataOutputStream):
  * request = op:byte, topic:str, op-specific fields;
  * response = status:byte (0 ok / 1 error), then payload or message.
  * str = len:int (-1 = null) + UTF-8 bytes; offs = n:int + n×(int,long);
  * rows = n:int + n×(str,str); recs = n:int + n×(int,long,str,str).
  */
final class SocketBroker(port0: Int = 0,
    dataDir: Option[Path] = None) extends AutoCloseable {
  import SocketBroker._

  private val server = new ServerSocket(port0, 64,
    InetAddress.getLoopbackAddress)
  /** The bound port (`port0 = 0` lets the OS pick — test isolation). */
  val port: Int = server.getLocalPort
  /** The address clients (and QueueRegistry's `dir` option) dial. */
  def url: String = s"broker://127.0.0.1:$port"

  private val topics = new ConcurrentHashMap[String, QueueTopic]()
  private val conns = ConcurrentHashMap.newKeySet[Socket]()
  @volatile private var closed = false

  private def topicFor(name: String, nPartitions: Int): QueueTopic =
    topics.computeIfAbsent(name, _ => dataDir match {
      case Some(d) => new FileTopic(d.resolve(name), nPartitions)
      case None => new InMemoryTopic(nPartitions)
    })

  private val acceptor = new Thread(() => {
    while (!closed) {
      try {
        val s = server.accept()
        conns.add(s)
        // close() may have run between accept returning and the add: a
        // connection registered after the close-time sweep would keep
        // serving a "down" broker, so re-check and refuse it
        if (closed) { conns.remove(s); s.close() }
        else {
          val h = new Thread(() => handle(s), s"graft-broker-conn-$port")
          h.setDaemon(true)
          h.start()
        }
      } catch {
        case _: IOException if closed => () // close() unblocked accept
        case _: IOException =>
          // one bad accept must not kill the broker — but a PERSISTENT
          // accept failure (fd exhaustion) must not busy-spin a core
          // either; back off briefly before retrying
          try Thread.sleep(50) catch { case _: InterruptedException => () }
      }
    }
  }, s"graft-broker-$port")
  acceptor.setDaemon(true)
  acceptor.start()

  /** One connection's request loop, two phases per request:
    *
    *  1. PARSE the whole request off the stream. A parse failure (torn
    *     frame, oversized string) leaves unconsumed body bytes that
    *     would be misread as new operations, so it DROPS the connection
    *     (propagates out of the loop) — never answered in-band.
    *  2. EXECUTE against the delegate, with the response payload fully
    *     materialized BEFORE the status byte is written — a delegate
    *     exception therefore becomes a clean status-1 frame, never a
    *     success byte followed by an error body (which would desync the
    *     client's protocol position). The connection survives delegate
    *     errors: a failed operation is the client's problem, not the
    *     broker's.
    */
  private def handle(sock: Socket): Unit = {
    sock.setTcpNoDelay(true)
    val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
    val out = new DataOutputStream(
      new BufferedOutputStream(sock.getOutputStream))
    try {
      while (true) {
        val op = in.readByte()
        val name = readStr(in)
        // the name becomes a path component under dataDir (FileTopic
        // state dir) — a wire-supplied separator or '..' would escape
        // the broker's data directory, so it fails the PARSE phase
        // (dropping the connection) like any other hostile frame
        // ("." would resolve the topic dir onto dataDir ITSELF, splaying
        // meta/lock/segment files among the sibling topic dirs)
        require(name != null && name.nonEmpty && name.length <= 255 &&
          !name.contains('/') && !name.contains('\\') &&
          !name.contains("..") && name != ".", s"illegal topic name: $name")
        // ---- phase 1: parse the full request body (no delegate calls)
        val body: Request = op match {
          // partition width sizes O(n) arrays in the topic impls — an
          // unguarded 2^31 width from a desynced/hostile frame would
          // OOM the daemon, so it gets the same parse-phase bound as
          // readStr/checkCount (real topologies use single digits)
          case OpOpen =>
            val w = in.readInt()
            require(w >= 1 && w <= 4096, s"unreasonable partition width: $w")
            ReqOpen(w)
          case OpProduce => ReqProduce(readStr(in), readStr(in))
          case OpProduceAll => ReqProduceAll(readRows(in))
          case OpRead => ReqRead(in.readInt(), in.readLong(), in.readInt())
          case OpEnd | OpBeginning => ReqNoBody(op)
          case OpTruncate => ReqTruncate(in.readDouble())
          case OpCommitted => ReqCommitted(readStr(in))
          case OpCommit => ReqCommit(readStr(in), readOffs(in))
          case OpFence =>
            ReqFence(fused = false, readStr(in), in.readLong(), in.readInt(),
              Nil)
          case OpProduceFenced =>
            ReqFence(fused = true, readStr(in), in.readLong(), in.readInt(),
              readRows(in))
          case other => throw new IOException(s"unknown op $other")
        }
        // ---- phase 2: execute, then respond (payload before status)
        try {
          // OPEN carries the width hint; every other op joins the pinned
          // topic (first reference pins, like FileTopic's meta / the
          // registry) with the contract's default width
          val t = body match {
            case ReqOpen(n) => topicFor(name, n)
            case _ => topicFor(name, 4)
          }
          body match {
            case ReqOpen(_) =>
              val n = t.nPartitions
              out.writeByte(0); out.writeInt(n)
            case ReqProduce(k, v) =>
              val (p, o) = t.produce(k, v)
              out.writeByte(0); out.writeInt(p); out.writeLong(o)
            case ReqProduceAll(rows) =>
              t.produceAll(rows)
              out.writeByte(0)
            case ReqRead(p, from, max) =>
              val recs = t.read(p, from, max)
              out.writeByte(0); out.writeInt(recs.size)
              recs.foreach { r =>
                out.writeInt(r.partition); out.writeLong(r.offset)
                writeStr(out, r.key); writeStr(out, r.value)
              }
            case ReqNoBody(OpEnd) =>
              val m = t.endOffsets
              out.writeByte(0); writeOffs(out, m)
            case ReqNoBody(_) =>
              val m = t.beginningOffsets
              out.writeByte(0); writeOffs(out, m)
            case ReqTruncate(f) =>
              val r = t.truncateToCommitted(f)
              out.writeByte(0); writeOffs(out, r)
            case ReqCommitted(g) =>
              val m = committedAny(t, g)
              out.writeByte(0); writeOffs(out, m)
            case ReqCommit(g, offs) =>
              commitAny(t, g, offs)
              out.writeByte(0)
            case ReqFence(fused, q, e, p, rows) =>
              val took =
                if (fused) t.produceFenced(q, e, p, rows)
                else t.beginTaskEpoch(q, e, p)
              out.writeByte(0); out.writeBoolean(took)
          }
        } catch {
          case scala.util.control.NonFatal(e) =>
            out.writeByte(1)
            writeStr(out, s"${e.getClass.getSimpleName}: ${e.getMessage}")
        }
        out.flush()
      }
    } catch {
      // client hung up, torn frame, oversized frame: drop the connection
      case _: EOFException | _: IOException |
           _: IllegalArgumentException => ()
    } finally {
      conns.remove(sock)
      sock.close()
    }
  }

  override def close(): Unit = {
    closed = true
    server.close()
    // a "down" broker must not keep serving connected clients (the
    // restart test replaces it over the same dataDir): drop live
    // connections so their handler loops end
    conns.forEach(s => try s.close() catch { case _: IOException => () })
    conns.clear()
  }
}

object SocketBroker {
  /** A fully-parsed request body — materialized BEFORE any delegate
    * call so parse errors and execution errors get distinct handling
    * (drop-connection vs in-band status-1; see [[SocketBroker.handle]]).
    */
  private sealed trait Request
  private final case class ReqOpen(nPartitions: Int) extends Request
  private final case class ReqProduce(key: String, value: String)
    extends Request
  private final case class ReqProduceAll(rows: Seq[(String, String)])
    extends Request
  private final case class ReqRead(p: Int, from: Long, max: Int)
    extends Request
  private final case class ReqNoBody(op: Byte) extends Request
  private final case class ReqTruncate(minFraction: Double) extends Request
  private final case class ReqCommitted(group: String) extends Request
  private final case class ReqCommit(group: String, offs: Map[Int, Long])
    extends Request
  private final case class ReqFence(fused: Boolean, queryId: String,
      epochId: Long, partitionId: Int, rows: Seq[(String, String)])
    extends Request

  private[streaming] val OpOpen: Byte = 1
  private[streaming] val OpProduce: Byte = 2
  private[streaming] val OpProduceAll: Byte = 3
  private[streaming] val OpRead: Byte = 4
  private[streaming] val OpEnd: Byte = 5
  private[streaming] val OpBeginning: Byte = 6
  private[streaming] val OpTruncate: Byte = 7
  private[streaming] val OpCommitted: Byte = 8
  private[streaming] val OpCommit: Byte = 9
  private[streaming] val OpFence: Byte = 10
  private[streaming] val OpProduceFenced: Byte = 11

  /** The broker-side bridge into the delegate's protected raw commit
    * namespace: clients validate at the CONTRACT (QueueTopic.commit /
    * commitDurable are final and run client-side before any frame is
    * sent), so the wire carries already-validated raw group names —
    * including the reader's own `<group>.durable` line, which the final
    * methods on the delegate would re-reject. Routed through the
    * delegate's own sanctioned entry points so no new raw path exists.
    */
  private def commitAny(t: QueueTopic, group: String,
      offs: Map[Int, Long]): Unit =
    if (group.endsWith(".durable"))
      t.commitDurable(group.dropRight(".durable".length), offs)
    else t.commit(group, offs)
  private def committedAny(t: QueueTopic, group: String): Map[Int, Long] =
    if (group.endsWith(".durable"))
      t.committedDurable(group.dropRight(".durable".length))
    else t.committed(group)

  private[streaming] def writeStr(o: DataOutputStream, s: String): Unit =
    if (s == null) o.writeInt(-1)
    else {
      val b = s.getBytes(UTF_8)
      o.writeInt(b.length); o.write(b)
    }
  private[streaming] def readStr(i: DataInputStream): String = {
    val n = i.readInt()
    if (n < 0) null
    else {
      require(n <= (1 << 26), s"unreasonable string frame: $n bytes")
      val b = new Array[Byte](n)
      i.readFully(b)
      new String(b, UTF_8)
    }
  }
  private[streaming] def writeOffs(o: DataOutputStream,
      m: Map[Int, Long]): Unit = {
    o.writeInt(m.size)
    m.toSeq.sortBy(_._1).foreach { case (p, off) =>
      o.writeInt(p); o.writeLong(off)
    }
  }
  // element-count guard, like readStr's byte guard: a desynced or
  // hostile frame with a garbage count must fail the parse (dropping
  // the connection) BEFORE it can drive unbounded heap growth building
  // a collection from whatever bytes follow
  private def checkCount(n: Int): Int = {
    require(n >= 0 && n <= (1 << 24), s"unreasonable element count: $n")
    n
  }
  private[streaming] def readOffs(i: DataInputStream): Map[Int, Long] = {
    val n = checkCount(i.readInt())
    (0 until n).map(_ => i.readInt() -> i.readLong()).toMap
  }
  private[streaming] def writeRows(o: DataOutputStream,
      rows: Seq[(String, String)]): Unit = {
    o.writeInt(rows.size)
    rows.foreach { case (k, v) => writeStr(o, k); writeStr(o, v) }
  }
  private[streaming] def readRows(i: DataInputStream): Seq[(String, String)] = {
    val n = checkCount(i.readInt())
    (0 until n).map(_ => (readStr(i), readStr(i)))
  }
}

/** The broker CLIENT: a [[QueueTopic]] whose every operation is one
  * request/response round trip to a [[SocketBroker]] — no client-side
  * state beyond the socket, so any number of client processes share one
  * topic through the broker (the reference's stages all dial the same
  * daemon). Registered under `dir = "broker://host:port"` in
  * [[QueueRegistry]], so the `graftqueue` connector — and therefore every
  * graph stage — runs over it with only the option string changed.
  *
  * Thread safety: requests are serialized on the connection (Spark sink
  * tasks call [[produceFenced]] concurrently; the mutex makes each call
  * one atomic frame exchange). An IOException tears the connection down
  * and surfaces — a retry policy belongs to the caller (Spark task
  * retry), because blindly resending a possibly-applied `produce` would
  * double-append. The next call dials a fresh connection.
  */
final class BrokerTopic(host: String, port: Int, name: String,
    nPartitionsHint: Int = 4) extends QueueTopic {
  import SocketBroker._

  private[this] val mutex = new Object
  private[this] var sock: Socket = null
  private[this] var in: DataInputStream = null
  private[this] var out: DataOutputStream = null
  private[this] var pinned: Int = -1

  // must hold mutex: any failed exchange tears the connection down so
  // the NEXT call redials from scratch — `sock` is therefore either
  // null or usable, never a dead-but-present handle (a socket's
  // isConnected stays true forever once connected, so it can't gate
  // this)
  private def teardown(): Unit = {
    if (sock != null)
      try sock.close() catch { case _: IOException => () }
    sock = null; in = null; out = null
  }

  // must hold mutex
  private def ensureConnected(): Unit =
    if (sock == null) {
      val s = new Socket(host, port)
      s.setTcpNoDelay(true)
      sock = s
      in = new DataInputStream(new BufferedInputStream(s.getInputStream))
      out = new DataOutputStream(new BufferedOutputStream(s.getOutputStream))
      // OPEN pins (or joins) the topic width before any other op
      out.writeByte(OpOpen); writeStr(out, name)
      out.writeInt(nPartitionsHint)
      out.flush()
      checkStatus()
      pinned = in.readInt()
    }

  // must hold mutex, after a request flush
  private def checkStatus(): Unit = {
    val st = in.readByte()
    if (st != 0) {
      val msg = readStr(in)
      throw new IOException(s"broker error on topic '$name': $msg")
    }
  }

  private def call[T](op: Byte)(writeBody: DataOutputStream => Unit)(
      readBody: DataInputStream => T): T = mutex.synchronized {
    try {
      ensureConnected()
      out.writeByte(op); writeStr(out, name)
      writeBody(out)
      out.flush()
      checkStatus()
      readBody(in)
    } catch {
      case e: Exception =>
        // tear down so the NEXT call redials; never silently resend a
        // possibly-applied mutation (EOF mid-handshake would otherwise
        // leave a dead socket that later calls mistake for connected)
        teardown()
        throw e
    }
  }

  def nPartitions: Int = mutex.synchronized {
    try { ensureConnected(); pinned }
    catch { case e: Exception => teardown(); throw e }
  }

  /** Drop the client connection (state lives broker-side, so a closed
    * client is just a hung-up consumer; the next call on this instance
    * would redial). [[QueueRegistry.drop]] closes evicted clients so a
    * topic-cycling JVM doesn't leak one fd + broker handler thread per
    * drop.
    */
  def close(): Unit = mutex.synchronized(teardown())

  def produce(key: String, value: String): (Int, Long) =
    call(OpProduce) { o => writeStr(o, key); writeStr(o, value) } { i =>
      (i.readInt(), i.readLong())
    }

  def produceAll(rows: Seq[(String, String)]): Unit =
    call(OpProduceAll)(o => writeRows(o, rows))(_ => ())

  def endOffsets: Map[Int, Long] = call(OpEnd)(_ => ())(readOffs)

  def beginningOffsets: Map[Int, Long] = call(OpBeginning)(_ => ())(readOffs)

  def truncateToCommitted(minFraction: Double): Map[Int, Long] =
    call(OpTruncate)(_.writeDouble(minFraction))(readOffs)

  private[streaming] def read(p: Int, from: Long, max: Int): Seq[QueueRecord] =
    call(OpRead) { o =>
      o.writeInt(p); o.writeLong(from); o.writeInt(max)
    } { i =>
      val n = i.readInt()
      (0 until n).map(_ => QueueRecord(i.readInt(), i.readLong(),
        readStr(i), readStr(i)))
    }

  protected def committedRaw(group: String): Map[Int, Long] =
    call(OpCommitted)(o => writeStr(o, group))(readOffs)

  protected def commitRaw(group: String, offs: Map[Int, Long]): Unit =
    call(OpCommit) { o => writeStr(o, group); writeOffs(o, offs) }(_ => ())

  private[streaming] def beginTaskEpoch(queryId: String, epochId: Long,
      partitionId: Int): Boolean =
    call(OpFence) { o =>
      writeStr(o, queryId); o.writeLong(epochId); o.writeInt(partitionId)
    }(_.readBoolean())

  private[streaming] def produceFenced(queryId: String, epochId: Long,
      partitionId: Int, rows: Seq[(String, String)]): Boolean =
    call(OpProduceFenced) { o =>
      writeStr(o, queryId); o.writeLong(epochId); o.writeInt(partitionId)
      writeRows(o, rows)
    }(_.readBoolean())
}
