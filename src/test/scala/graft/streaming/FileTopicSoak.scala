package graft.streaming

import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}
import scala.jdk.CollectionConverters._

/** Contention soak for the file-backed queue transport (test-classpath
  * main; run with `sbt "Test/runMain graft.streaming.FileTopicSoak
  * [baseDir] [secondsPerPhase]"`). For each phase — producer counts
  * {1, 2, 4} plus a 1-producer fsync=true phase (the flush.messages=1
  * durability price):
  *
  *  - fork that many PRODUCER JVMs (FileTopicChild `produce-for`), each
  *    appending 100-row batches flat-out for the phase duration — the
  *    connector sink's task-buffer shape — against one shared topic;
  *  - run 3 CONSUMER GROUPS concurrently in this JVM, each polling,
  *    committing, and running `truncateToCommitted(0.5)` — live
  *    retention under producer contention;
  *  - sample on-disk log bytes throughout (the high-water mark is the
  *    disk-bounded-by-lag claim, measured).
  *
  * Asserted per phase: every producer's record sequence survives exactly
  * (dense 0..n-1 per prefix — no loss, no duplication, no tearing),
  * per-partition offsets are dense, disk high-water stays a small
  * fraction of total bytes produced, and the topic is physically empty
  * after the final trim. Printed per phase: append throughput (the
  * documented global-lock serialization cost, quantified) and the disk
  * high-water ratio. Results go into SCALING.md's SOAK section.
  */
object FileTopicSoak {

  private def fork(args: String*): Process = {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    new ProcessBuilder(
      (Seq(javaBin, "-cp", cp, "graft.streaming.FileTopicChild") ++ args): _*)
      .redirectErrorStream(true).start()
  }

  private def logBytes(dir: Path): Long = {
    val s = Files.list(dir)
    try s.iterator().asScala
      .filter(_.getFileName.toString.endsWith(".log"))
      .map(p => try Files.size(p) catch { case _: Throwable => 0L }).sum
    finally s.close()
  }

  def main(args: Array[String]): Unit = {
    val base = if (args.nonEmpty) args(0)
      else Files.createTempDirectory("graft_soak").toString
    val phaseMs = (if (args.length > 1) args(1).toInt else 20) * 1000L
    // (producers, fsync): the fourth phase prices the flush.messages=1
    // durability knob against the same single-producer baseline
    val results = Seq((1, false), (2, false), (4, false), (1, true))
      .map { case (nProd, fsync) =>
      val dir = Paths.get(base, s"soak_p$nProd${if (fsync) "f" else ""}")
      val topic = new FileTopic(dir, 4)
      val producersDone = new AtomicBoolean(false)
      val diskHwm = new AtomicLong(0L)
      val trims = new AtomicLong(0L)
      // 3 consumer groups: poll + commit + retention, concurrently
      val seen = (0 until 3).map(_ =>
        scala.collection.concurrent.TrieMap.empty[String, AtomicLong])
      val consumers = (0 until 3).map { g =>
        new Thread(() => {
          val c = new ContractConsumer(topic, s"g$g")
          var idle = 0
          var iter = 0
          while (idle < 10) { // drain until 10 empty polls after producers end
            val got = c.poll(100000)
            got.foreach { r =>
              val Array(p, _) = r.value.split(":")
              seen(g).getOrElseUpdate(p, new AtomicLong(0L)).incrementAndGet()
              ()
            }
            c.commitSync()
            iter += 1
            if (g == 0) { // one trimmer is enough; hwm sampled here too
              // trim every few commits: the 0.5 fraction already keeps
              // total rewrite work linear; spacing the calls keeps the
              // trimmer from monopolizing the append lock
              if (iter % 5 == 0) {
                topic.truncateToCommitted(0.5)
                trims.incrementAndGet()
                ()
              }
              val lb = logBytes(dir)
              var prev = diskHwm.get()
              while (lb > prev && !diskHwm.compareAndSet(prev, lb))
                prev = diskHwm.get()
            }
            if (got.isEmpty && producersDone.get()) idle += 1
            else if (got.nonEmpty) idle = 0
            Thread.sleep(if (got.isEmpty) 20 else 2)
          }
        })
      }
      consumers.foreach(_.start())
      val t0 = System.nanoTime()
      val procs = (0 until nProd).map(p =>
        fork(Seq("produce-for", dir.toString, "4", s"pr$p",
          phaseMs.toString) ++
          (if (fsync) Seq("100", "fsync") else Nil): _*))
      val produced = procs.map { pr =>
        val out = new String(pr.getInputStream.readAllBytes())
        pr.waitFor()
        require(pr.exitValue() == 0, s"producer failed:\n$out")
        out.linesIterator.collectFirst {
          case l if l.startsWith("PRODUCED=") => l.stripPrefix("PRODUCED=").toLong
        }.get
      }
      val wallSec = (System.nanoTime() - t0) / 1e9
      producersDone.set(true)
      consumers.foreach(_.join(300000))
      require(consumers.forall(!_.isAlive), "a consumer failed to drain")
      val total = produced.sum
      // every group saw every producer's full dense sequence
      (0 until 3).foreach { g =>
        (0 until nProd).foreach { p =>
          val n = seen(g).get(s"pr$p").map(_.get()).getOrElse(0L)
          require(n == produced(p),
            s"group g$g saw $n of ${produced(p)} records from pr$p")
        }
      }
      // offsets dense: ends == per-partition counts over the whole run
      require(topic.endOffsets.values.sum == total,
        s"offset line ${topic.endOffsets} != $total records")
      // final trim empties the topic (all groups committed everything)
      topic.truncateToCommitted()
      val finalBytes = logBytes(dir)
      require(finalBytes == 0L, s"final trim left $finalBytes bytes")
      // on-disk cost per record: 8 B frame lengths + ~2 B key +
      // ~11 B value + 8 B index entry
      val bytesWritten = total * 29L
      val hwmRatio = diskHwm.get().toDouble / math.max(bytesWritten, 1L)
      println(f"[soak] producers=$nProd fsync=$fsync wall=$wallSec%.1f s " +
        f"records=$total rate=${total / wallSec}%.0f rec/s " +
        f"disk_hwm=${diskHwm.get()} B (~${hwmRatio * 100}%.0f%% of bytes " +
        f"written) trims=${trims.get()}")
      (nProd, fsync, total / wallSec)
    }
    val r1 = results.head._3
    println("[soak] append-rate scaling vs 1 producer: " +
      results.map { case (n, f, r) =>
        f"${n}p${if (f) "+fsync" else ""}=${r / r1}%.2fx" }.mkString(" "))
    println("SOAK=ok")
  }
}
