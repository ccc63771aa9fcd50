package graft.streaming

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong

/** Throughput soak for the TCP broker transport (test-classpath main;
  * `sbt "Test/runMain graft.streaming.BrokerSoak [secondsPerPhase]"`).
  * The FileTopic soak measured the global append lock's cost (953k
  * rec/s one producer, NEGATIVE scaling at two — the recorded reason
  * FileTopic is "not the throughput fabric", ARCHITECTURE.md); this is
  * the same measurement for the fabric that replaced it in that role.
  *
  * Per backend (memory-backed broker, file-backed broker) and client
  * count {1, 2, 4}: each client is its own [[BrokerTopic]] connection
  * (real TCP over loopback, one request/response per `produceAll`)
  * appending 100-row batches flat-out — the connector sink's
  * task-buffer shape — for the phase duration; then one consumer
  * drains and the row count is asserted exact (no loss, no tearing).
  * Printed per phase: aggregate append rec/s and drain rec/s. Client
  * requests serialize at the broker like any real broker, but separate
  * connections overlap network time with broker work, so client
  * scaling measures whether the protocol (not the delegate's monitor)
  * is the ceiling. Results go into the ARCHITECTURE decision record.
  */
object BrokerSoak {
  def main(args: Array[String]): Unit = {
    val phaseMs = (if (args.nonEmpty) args(0).toInt else 5) * 1000L
    val backends = Seq(
      ("mem", new SocketBroker()),
      ("file", new SocketBroker(0,
        dataDir = Some(Files.createTempDirectory("graft_bsoak")))))
    backends.foreach { case (label, broker) =>
      Seq(1, 2, 4).foreach { nClients =>
        val topicName = s"soak_${label}_$nClients"
        val produced = new AtomicLong(0L)
        // a producer failure must surface as ITSELF, not corrupt the
        // exactness assert below into a phantom loss/tearing report: the
        // count of batches that DID land is recorded in finally (a
        // produceAll that threw did not land — the client never resends),
        // the connection always closes, and the first error is rethrown
        val firstError = new java.util.concurrent.atomic.AtomicReference[Throwable]()
        val deadline = System.nanoTime() + phaseMs * 1000000L
        val t0 = System.nanoTime()
        val threads = (0 until nClients).map { c =>
          new Thread(() => {
            val t = new BrokerTopic("127.0.0.1", broker.port, topicName, 4)
            var i = 0
            try {
              while (System.nanoTime() < deadline) {
                t.produceAll((i until i + 100).map(j =>
                  (s"k${j % 8}", s"c$c:$j:payload-abcdefghijklmnopqrstuv")))
                i += 100
              }
            } catch {
              case e: Throwable => firstError.compareAndSet(null, e); ()
            } finally {
              produced.addAndGet(i.toLong)
              t.close()
            }
          })
        }
        threads.foreach(_.start()); threads.foreach(_.join())
        if (firstError.get() != null) throw firstError.get()
        val appendSec = (System.nanoTime() - t0) / 1e9
        // one consumer drains everything; count must be exact
        val reader = new BrokerTopic("127.0.0.1", broker.port, topicName, 4)
        val c = new ContractConsumer(reader, "drain")
        val d0 = System.nanoTime()
        var drained = 0L
        var got = c.poll(100000)
        while (got.nonEmpty) { drained += got.size; got = c.poll(100000) }
        val drainSec = (System.nanoTime() - d0) / 1e9
        reader.close()
        assert(drained == produced.get(),
          s"drained $drained != produced ${produced.get()}")
        println(f"BROKERSOAK backend=$label clients=$nClients " +
          f"produced=${produced.get()} append_rps=${produced.get() / appendSec}%.0f " +
          f"drain_rps=${drained / drainSec}%.0f")
      }
      broker.close()
    }
  }
}
