package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal
import graft.operators.Multimodal.MediaCodec

/** Pins [[MediaCodec]]'s parse to the PUBLIC container layouts with
  * hand-written byte fixtures (independent of the synthesizer), so a
  * consistent offset bug shared by synth and parse still fails here.
  */
class MediaCodecSpec extends AnyFunSuite {

  /** The classic 2x2 24-bpp BMP from the format's public documentation:
    * 54-byte header, rows padded to 4 bytes (2 px * 3 B = 6 -> 8), file
    * size 70. Header bytes written out literally, little-endian.
    */
  test("BMP: hand-written 2x2 fixture parses to the spec fields") {
    val b = new Array[Byte](70)
    def put(off: Int, vs: Int*): Unit =
      vs.zipWithIndex.foreach { case (v, i) => b(off + i) = v.toByte }
    put(0, 0x42, 0x4d) // 'B','M'
    put(2, 70, 0, 0, 0) // file size
    put(10, 54, 0, 0, 0) // pixel offset
    put(14, 40, 0, 0, 0) // DIB header size
    put(18, 2, 0, 0, 0) // width = 2
    put(22, 2, 0, 0, 0) // height = 2
    put(26, 1, 0) // planes
    put(28, 24, 0) // bpp
    put(34, 16, 0, 0, 0) // pixel-array size (2 rows * 8 B)
    val d = MediaCodec.decode(7L, b)
    assert(d.container == "bmp")
    assert(d.width == 2 && d.height == 2)
    assert(d.n_bytes == 70L && d.n_frames == 1L && d.sample_rate == 0)
  }

  /** Canonical 44-byte RIFF/WAVE PCM header (mono 16-bit, 44100 Hz) with
    * 4 samples, written literally from the public layout.
    */
  test("WAV: hand-written fixture parses rate and frame count") {
    val b = new Array[Byte](44 + 8)
    def asc(off: Int, s: String): Unit =
      s.zipWithIndex.foreach { case (c, i) => b(off + i) = c.toByte }
    def le32(off: Int, v: Long): Unit =
      (0 until 4).foreach(i => b(off + i) = ((v >> (8 * i)) & 0xff).toByte)
    def le16(off: Int, v: Int): Unit = {
      b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
    }
    asc(0, "RIFF"); le32(4, 36 + 8); asc(8, "WAVE")
    asc(12, "fmt "); le32(16, 16); le16(20, 1); le16(22, 1)
    le32(24, 44100L); le32(28, 88200L); le16(32, 2); le16(34, 16)
    asc(36, "data"); le32(40, 8)
    val d = MediaCodec.decode(8L, b)
    assert(d.container == "wav")
    assert(d.sample_rate == 44100 && d.n_frames == 4L)
    assert(d.width == 0 && d.height == 0 && d.n_bytes == 52L)
  }

  test("Y4M: hand-written ASCII fixture parses dims and counts frames") {
    val w = 4; val h = 2
    val frame = "FRAME\n" + ("x" * (w * h * 3 / 2))
    val s = s"YUV4MPEG2 W$w H$h F25:1\n" + frame + frame
    val d = MediaCodec.decode(9L, s.getBytes("US-ASCII"))
    assert(d.container == "y4m")
    assert(d.width == 4 && d.height == 2 && d.n_frames == 2L)
    assert(d.n_bytes == s.length.toLong)
  }

  test("unknown magic is rejected loudly") {
    intercept[IllegalArgumentException] {
      MediaCodec.decode(1L, Array[Byte](1, 2, 3, 4, 5))
    }
  }

  test("synthesis -> decode round-trips the closed-form parameters") {
    (0L until 60L).foreach { id =>
      val d = id % 3 match {
        case 0 => MediaCodec.decode(id,
          MediaCodec.bmp((id % 64).toInt + 1, (id % 48).toInt + 1, id))
        case 1 => MediaCodec.decode(id,
          MediaCodec.wav(8000 + (id % 8).toInt * 1000, (id % 1000).toInt + 1, id))
        case _ => MediaCodec.decode(id,
          MediaCodec.y4m(2 * ((id % 16).toInt + 1), 2 * ((id % 12).toInt + 1),
            (id % 24).toInt + 1, id))
      }
      id % 3 match {
        case 0 =>
          assert(d.container == "bmp" && d.width == (id % 64).toInt + 1 &&
            d.height == (id % 48).toInt + 1)
          val rowSize = ((3 * d.width + 3) / 4) * 4
          assert(d.n_bytes == 54L + rowSize.toLong * d.height)
        case 1 =>
          assert(d.container == "wav" && d.n_frames == (id % 1000) + 1 &&
            d.sample_rate == 8000 + (id % 8).toInt * 1000)
          assert(d.n_bytes == 44L + 2L * d.n_frames)
        case _ =>
          assert(d.container == "y4m" && d.n_frames == (id % 24) + 1)
          val hdr = s"YUV4MPEG2 W${d.width} H${d.height} F25:1\n".length
          assert(d.n_bytes ==
            hdr.toLong + d.n_frames * (6L + d.width * d.height * 3 / 2))
      }
    }
  }

  /** A half-bright/half-dark 16x16 BMP has a KNOWN aHash: sampled rows
    * 0-3 (image top, bright) sit above the global mean, rows 4-7 below —
    * bits 0-31 set, 32-63 clear. Exercises the bottom-up row flip: a
    * decoder that forgot `h-1-py` would return the complement.
    */
  test("aHash: top-bright gradient fixture has the exact expected bits") {
    val w = 16; val h = 16
    val rs = ((3 * w + 3) / 4) * 4
    val b = new Array[Byte](54 + rs * h)
    b(0) = 'B'; b(1) = 'M'
    def le32(off: Int, v: Long): Unit =
      (0 until 4).foreach(i => b(off + i) = ((v >> (8 * i)) & 0xff).toByte)
    le32(2, b.length.toLong); le32(10, 54); le32(14, 40)
    le32(18, w.toLong); le32(22, h.toLong)
    b(26) = 1; b(28) = 24
    le32(34, (rs * h).toLong)
    // stored bottom-up: first rs*8 bytes are image rows 15..8 (bottom,
    // dark = 10), last rs*8 bytes are rows 7..0 (top, bright = 200)
    (0 until rs * h).foreach { i =>
      b(54 + i) = (if (i < rs * 8) 10 else 200.toByte)
    }
    val (lo, hi) = Multimodal.pHashOf(b)
    assert(lo == 0xffffffffL && hi == 0L)
  }

  /** The planted-variant discipline m6 relies on, as a pure-JVM property
    * over the synthesized corpus: a +1-every-97th-byte perturbation stays
    * within Hamming 3 of the original (so the tau=3 cut keeps it), and
    * any pair at Hamming <= 3 shares at least one of the four 16-bit
    * bands (pigeonhole), so the banded equi-join has EXACT recall at the
    * cut — the join can never miss a pair the threshold admits.
    */
  test("aHash: perturbed variants stay near; Hamming<=3 implies a shared band") {
    def bands(lo: Long, hi: Long): Seq[Long] =
      Seq(lo & 0xffffL, (lo >> 16) & 0xffffL, hi & 0xffffL, (hi >> 16) & 0xffffL)
    def ham(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    val imgs = (0L until 300L by 3L).map { id =>
      id -> MediaCodec.bmp((id % 64).toInt + 1, (id % 48).toInt + 1, id)
    }
    val hashes = imgs.map { case (id, p) => id -> Multimodal.pHashOf(p) }.toMap
    imgs.filter(_._1 < 30L).foreach { case (id, p) =>
      val v = p.clone()
      (0 until v.length - 54).foreach { i =>
        if (i % 97 == 0) v(54 + i) = (v(54 + i) + 1).toByte
      }
      assert(ham(hashes(id), Multimodal.pHashOf(v)) <= 3,
        s"variant of $id drifted past tau")
    }
    for (Seq((ia, ha), (ib, hb)) <- hashes.toSeq.sortBy(_._1).combinations(2)
         if ham(ha, hb) <= 3) {
      val shared = bands(ha._1, ha._2).zip(bands(hb._1, hb._2))
        .exists { case (x, y) => x == y }
      assert(shared, s"pair ($ia,$ib) at Hamming<=3 shares no band")
    }
  }

}