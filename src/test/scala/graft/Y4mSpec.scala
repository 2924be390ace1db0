package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Multimodal, Y4m}

/** Codec-level properties of the real YUV4MPEG2 demuxer — the video
  * analog of WaveformSpec's RIFF/WAVE coverage: roundtrip identity
  * across container styles, byte-different re-muxes decoding
  * identically, robustness to truncation and corruption (Left, never
  * a crash), tag-order freedom, colorspace strictness, and the
  * evenly-spaced frame-sampling index math. */
class Y4mSpec extends AnyFunSuite {

  private def video(w: Int, h: Int, nf: Int): Y4m.Video =
    Y4m.Video(w, h, Vector.tabulate(nf)(f =>
      Array.tabulate(w * h * 3)(i => ((i * 31 + f * 7) % 256).toByte)))

  test("y4m roundtrip: decode(encode(v)) recovers dims and every frame for every style") {
    val v = video(6, 4, 5)
    (0L to 3L).foreach { style =>
      val back = Y4m.decodeY4m(Y4m.encodeY4m(v, style))
      assert(back.isRight, s"style $style: ${back.left.getOrElse("")}")
      val d = back.toOption.get
      assert(d.width == v.width && d.height == v.height)
      assert(d.frames.length == v.frames.length)
      d.frames.zip(v.frames).foreach { case (a, b) =>
        assert(a.toSeq == b.toSeq, s"style $style frame bytes differ")
      }
    }
  }

  test("re-mux: byte-different container layouts decode identically") {
    val v = video(5, 3, 3)
    val encodings = (0L to 3L).map(Y4m.encodeY4m(v, _))
    assert(encodings.map(_.toSeq).distinct.length == 4,
      "styles must produce byte-different files")
    val decoded = encodings.map(
      Y4m.decodeY4m(_).toOption.get.frames.map(_.toSeq))
    assert(decoded.distinct.length == 1, "all must demux to the same frames")
  }

  test("truncation: every prefix is a Left or an exact shorter clip, never an exception") {
    // Y4M carries no stream-level frame count (unlike RIFF's declared
    // size), so a cut at an exact frame boundary is indistinguishable
    // from a shorter clip — the only prefixes that may decode, and they
    // must decode to exactly the leading frames.
    val v = video(4, 4, 3)
    val bytes = Y4m.encodeY4m(v, style = 2)
    val okPrefixes = (1 until bytes.length).flatMap { k =>
      Y4m.decodeY4m(bytes.take(k)).toOption.map { d =>
        assert(d.frames.length < v.frames.length, s"prefix $k kept all frames")
        d.frames.zip(v.frames).foreach { case (a, b) =>
          assert(a.toSeq == b.toSeq, s"prefix $k frame bytes differ")
        }
        k
      }
    }
    assert(okPrefixes.length == v.frames.length - 1,
      s"exactly the ${v.frames.length - 1} interior frame boundaries may decode: $okPrefixes")
    assert(Y4m.decodeY4m(bytes).isRight)
  }

  test("corrupt magic, unknown tags, bad dims and wrong colorspace are rejected with reasons") {
    def dec(s: String, tail: Array[Byte] = Array.emptyByteArray) =
      Y4m.decodeY4m(s.getBytes("US-ASCII") ++ tail)
    val frame = "FRAME\n".getBytes("US-ASCII") ++ Array.fill(2 * 2 * 3)(1.toByte)
    assert(dec("NOPE4MPEG2 W2 H2\n", frame).left.exists(_.contains("magic")))
    assert(dec("YUV4MPEG2 W2 H2 Q9\n", frame).left.exists(_.contains("unknown")))
    assert(dec("YUV4MPEG2 H2 C444\n", frame).left.exists(_.contains("W")))
    assert(dec("YUV4MPEG2 W2 C444\n", frame).left.exists(_.contains("H")))
    assert(dec("YUV4MPEG2 W0 H2 C444\n", frame).left.exists(_.contains("W")))
    assert(dec("YUV4MPEG2 Wx H2 C444\n", frame).left.exists(_.contains("W")))
    // no C tag => format default C420, which this demuxer must refuse
    assert(dec("YUV4MPEG2 W2 H2\n", frame).left.exists(_.contains("C420")))
    assert(dec("YUV4MPEG2 W2 H2 C420jpeg\n", frame).left.exists(_.contains("colorspace")))
    assert(dec("YUV4MPEG2 W2 H2 C444\n").left.exists(_.contains("frames")))
    assert(dec("YUV4MPEG2 W2 H2 C444\nFRAMX\n").left.exists(_.contains("FRAME")))
    // random byte soup never throws
    val rnd = new scala.util.Random(11)
    (0 until 500).foreach { _ =>
      Y4m.decodeY4m(Array.fill(rnd.nextInt(200))(rnd.nextInt().toByte))
    }
    // ADVICE r09: W46341*H46341*3 overflows Int to a NEGATIVE frame
    // size — must be a Left (oversized frame), never a thrown
    // copyOfRange error, for any dims whose product wraps
    assert(dec("YUV4MPEG2 W46341 H46341 C444\n", frame)
      .left.exists(_.contains("exceeds")))
    assert(dec("YUV4MPEG2 W2000000 H2000000 C444\n", frame)
      .left.exists(_.contains("exceeds")))
  }

  test("stream tags parse in any order; frame parameters are skipped") {
    val frame = "FRAME Xwhatever\n".getBytes("US-ASCII") ++
      Array.tabulate(2 * 3 * 3)(_.toByte)
    val r = Y4m.decodeY4m(
      "YUV4MPEG2 C444 F30:1 H3 Ip W2 A1:1 Xcomment\n".getBytes("US-ASCII") ++ frame)
    assert(r.isRight, r.left.getOrElse(""))
    val v = r.toOption.get
    assert(v.width == 2 && v.height == 3 && v.frames.length == 1)
    assert(v.frames.head.toSeq == Array.tabulate(18)(_.toByte).toSeq)
  }

  test("sampleIndices: evenly spaced, distinct, first frame always included") {
    assert(Y4m.sampleIndices(8, 4) == Seq(0, 2, 4, 6))
    assert(Y4m.sampleIndices(4, 4) == Seq(0, 1, 2, 3))
    assert(Y4m.sampleIndices(5, 4) == Seq(0, 1, 2, 3))
    assert(Y4m.sampleIndices(6, 4) == Seq(0, 1, 3, 4))
    assert(Y4m.sampleIndices(2, 4) == Seq(0, 1))
    assert(Y4m.sampleIndices(3, 4) == Seq(0, 1, 2))
    (2 to 9).foreach { nf =>
      val s = Y4m.sampleIndices(nf, 4)
      assert(s.head == 0 && s.distinct == s && s.forall(_ < nf))
      assert(s.length == math.min(nf, 4))
    }
  }

  test("renderVideo matches the oracle's generative formula") {
    val t = "the quick brown fox jumps over the lazy dog near the river bank"
    val bs = t.getBytes("US-ASCII")
    val n = bs.length
    val v = Multimodal.renderVideo(t)
    assert(v.frames.length == n % 7 + 2)
    assert(v.width == n % 12 + 4 && v.height == (n * 5) % 10 + 4)
    v.frames.zipWithIndex.foreach { case (fb, f) =>
      fb.zipWithIndex.foreach { case (b, i) =>
        val expect = (bs((i + 13 * f) % n) + 31 * f + 7 * i) % 256
        assert((b & 0xff) == expect, s"frame $f byte $i")
      }
    }
  }
}
