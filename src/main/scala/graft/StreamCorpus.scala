package graft

import java.nio.file.{Files, Paths}

/** The synthesized log corpus shared by the bench's streaming leg
  * (Bench.scala stream block) and the scaling probe
  * (tools.StreamScaleProbe): ONE generator so the probe's rows stay
  * comparable to the bench's by construction, with the deliberate
  * divergences (host/interval counts, sentinel offset) as named
  * parameters instead of silently edited constants.
  *
  * Shape: per host, `nIntervals` 10-second intervals x 4 services x 3
  * lines; elapsed drifts into the 150 ms hard-max band late in each
  * 1200-interval block (`i % 1200 > 900`) so the vote/cooldown stages
  * do real work, and the slow band REPEATS per block so the work mix
  * is invariant when a probe scales `nIntervals` (for the bench's
  * nIntervals = 1200 the predicate equals the historical `i > 900`).
  */
object StreamCorpus {
  val t0 = 1578391200000L // 2020-01-07T10:00:00Z
  private val services = Seq("S:checkout", "S:search", "S:cart", "S:login")
  private val fmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss,SSS")
    .withZone(java.time.ZoneOffset.UTC)

  /** Write `nHosts` host logs under `logsDir/net/host<i>/server.log`;
    * returns the total line count.
    */
  def writeHosts(logsDir: String, nHosts: Int, nIntervals: Int): Long = {
    var nLines = 0L
    (0 until nHosts).foreach { s =>
      val sb = new StringBuilder
      var id = 0
      (0 until nIntervals).foreach { i =>
        services.foreach { svc =>
          (0 until 3).foreach { j =>
            val ms = t0 + i * 10000L + j * 3000L
            val elapsed =
              100L + (if (i % 1200 > 900 && j == 0) 200L else (i + j) % 40)
            sb.append(s"[$id] ${fmt.format(
              java.time.Instant.ofEpochMilli(ms))} " +
              s"[a:b:42] INFO CommonTiming::Stop $svc handled in time $elapsed\n")
            id += 1; nLines += 1
          }
        }
      }
      val p = Paths.get(logsDir, "net", s"host$s", "server.log")
      Files.createDirectories(p.getParent)
      Files.writeString(p, sb.toString)
      ()
    }
    nLines
  }

  /** The far-future sentinel that closes every real window on the next
    * stage-1 drain; `offsetMs` past `t0` must clear the corpus's whole
    * event-time span (the bench's 1200-interval corpus uses 1e8 ms; a
    * time-scaled probe corpus needs more).
    */
  def writeSentinel(logsDir: String, offsetMs: Long): Unit = {
    val p = Paths.get(logsDir, "net", "zz", "server.log")
    Files.createDirectories(p.getParent)
    Files.writeString(p, s"[999999] ${fmt.format(
      java.time.Instant.ofEpochMilli(t0 + offsetMs))} " +
      "[a:b:42] INFO CommonTiming::Stop S:checkout handled in time 1\n")
    ()
  }
}
