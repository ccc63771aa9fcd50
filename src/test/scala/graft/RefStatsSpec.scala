package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random
import graft.functions.RefStats

/** Property-style tests (seeded random, no scalatestplus needed) for the
  * pure ports that anchor the custom operators: the exact reference
  * percentile (util_methods.js:112-142) and the z-score step
  * (stream_calc_z_score.js:66-104).
  */
class RefStatsSpec extends AnyFunSuite {

  // -- percentile: independent re-derivation of the JS semantics ---------
  private def jsPercentile(sorted: Vector[Double], p: Double): Option[Double] = {
    val n = sorted.length
    if (n == 0) None
    else if (p == 0) Some(sorted.head)
    else if (p == 100) Some(sorted.last)
    else {
      val idx = (p / 100.0) * n - 1.0
      if (n == 1 || idx == math.floor(idx)) Some(sorted(idx.toInt))
      else {
        val i = math.ceil(idx).toInt
        if (i == n - 1) Some(sorted(i)) else Some((sorted(i) + sorted(i + 1)) / 2)
      }
    }
  }

  test("calcPercentileRef matches JS formula on random sorted arrays") {
    val rnd = new Random(42)
    for (_ <- 1 to 2000) {
      val n = rnd.nextInt(20)
      val a = Vector.fill(n)(rnd.nextDouble() * 10000).sorted
      val p = Seq(25.0, 50.0, 75.0, 95.0)(rnd.nextInt(4))
      assert(RefStats.calcPercentileRef(a, p) == jsPercentile(a, p),
        s"n=$n p=$p a=$a")
    }
  }

  test("percentile known cases") {
    // n=4, p=75: idx=2.0 integral -> a[2]
    assert(RefStats.calcPercentileRef(Vector(1, 2, 3, 4).map(_.toDouble), 75).contains(3.0))
    // n=5, p=75: idx=2.75 -> i=3, not last -> midpoint of a[3],a[4]
    assert(RefStats.calcPercentileRef(Vector(1, 2, 3, 4, 5).map(_.toDouble), 75).contains(4.5))
    // n=2, p=95: idx=0.9 -> i=1 == n-1 -> a[1]
    assert(RefStats.calcPercentileRef(Vector(1, 2).map(_.toDouble), 95).contains(2.0))
    // n=1 -> a[0]
    assert(RefStats.calcPercentileRef(Vector(7.0), 95).contains(7.0))
    assert(RefStats.calcPercentileRef(Vector.empty, 75).isEmpty)
  }

  // -- z-score step: re-derivation with explicit reference control flow --
  private def jsZStep(lag: Int, t: Double, infl: Double,
      x: Option[Double], prev: Vector[Option[Double]])
      : (Option[Double], Option[Double], Option[Double], Option[Double], Int) = {
    var inflV = x
    if (prev.length < lag) return (inflV, None, None, None, 0)
    val defined = prev.flatten
    val avg = if (defined.nonEmpty) Some(defined.sum / defined.size) else None
    val sd = avg.flatMap { m =>
      val msq = defined.map(v => (v - m) * (v - m)).sum / defined.size
      if (msq != 0.0) Some(math.sqrt(msq)) else None
    }
    val (lb, ub) = (avg, sd) match {
      case (Some(m), Some(s)) => (Some(m - t * s), Some(m + t * s))
      case _ => (None, None)
    }
    var signal = 0
    (avg, sd, x) match {
      case (Some(m), Some(s), Some(xv)) if math.abs(xv - m) > t * s =>
        signal = if (xv > m) 1 else -1
        prev.last.foreach(last => inflV = Some(infl * xv + (1 - infl) * last))
      case _ =>
    }
    (inflV, avg, lb, ub, signal)
  }

  test("zScoreStepRef matches reference control flow on random inputs") {
    val rnd = new Random(7)
    def optV(): Option[Double] =
      if (rnd.nextDouble() < 0.2) None else Some(rnd.nextDouble() * 100)
    for (_ <- 1 to 5000) {
      val prev = Vector.fill(rnd.nextInt(12))(optV())
      val x = optV()
      val lag = 1 + rnd.nextInt(8)
      val infl = rnd.nextDouble()
      assert(RefStats.zScoreStepRef(lag, 3.5, infl, x, prev) ==
        jsZStep(lag, 3.5, infl, x, prev), s"prev=$prev x=$x lag=$lag")
    }
  }

  test("constant series never signals (sd=0 => undefined quirk)") {
    val prev = Vector.fill(5)(Option(10.0))
    val (_, avg, lb, ub, sig) = RefStats.zScoreStepRef(5, 3.5, 0.5, Some(99.0), prev)
    assert(avg.contains(10.0) && lb.isEmpty && ub.isEmpty && sig == 0)
  }

  test("influence feedback stores blended value") {
    val prev = Vector(Some(1.0), Some(1.0), Some(2.0), Some(1.0), Some(3.0))
    val (infl, _, _, _, sig) = RefStats.zScoreStepRef(5, 1.0, 0.25, Some(100.0), prev)
    assert(sig == 1)
    assert(infl.contains(0.25 * 100.0 + 0.75 * 3.0))
  }

  // -- alert fold: vote counter + cooldown vs the interleaved reference --
  test("alerts fold matches interleaved reference control flow") {
    import graft.operators.Alerts
    val cfg = Alerts.AlertCfg(windowSz = 5, voteThreshold = 3, cooldownMs = 10000L)
    val rnd = new Random(11)
    val rows = (0 until 500).map { i =>
      val srv = s"srv${rnd.nextInt(2)}"
      val svc = s"svc${rnd.nextInt(2)}"
      val lag = Seq(6, 144)(rnd.nextInt(2))
      val bad = rnd.nextDouble() < 0.6
      (srv, svc, lag, i * 1000L, bad, if (bad) "cause" else "")
    }
    // independent naive simulation
    val counts = scala.collection.mutable.Map.empty[(String, String, Int), Int]
    val last = scala.collection.mutable.Map.empty[String, Long]
    val expected = rows.sortBy(r => (r._4, r._1, r._3)).flatMap {
      case (srv, svc, lag, ts, bad, causes) =>
        val k = (srv, svc, lag)
        var c = counts.getOrElse(k, 0)
        var fire = false
        if (bad) { if (c <= cfg.windowSz) c += 1; fire = c >= cfg.voteThreshold }
        else if (c > 0) c -= 1
        counts(k) = c
        if (fire && last.get(svc).forall(l => (ts - l) / 1000.0 > cfg.cooldownMs / 1000.0)) {
          last(svc) = ts; Some((ts, srv, svc, lag, causes))
        } else None
    }
    assert(Alerts.alertsRef(rows, cfg) == expected)
  }
}
