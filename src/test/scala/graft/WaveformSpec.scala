package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Multimodal, Waveform}

/** Codec-level properties of the real RIFF/WAVE PCM16 parser — the
  * audio analog of MultimodalSpec's PPM coverage: roundtrip identity
  * across container styles, byte-different re-exports decoding
  * identically, robustness to truncation and corruption (Left, never
  * a crash), and the decimation resample. */
class WaveformSpec extends AnyFunSuite {

  private def clip(n: Int): Waveform.Clip =
    Waveform.Clip(8000, 1,
      Array.tabulate(n)(i => ((i * 997) % 40000 - 20000).toShort))

  test("wav roundtrip: decode(encode(clip)) recovers rate/channels/samples for every style") {
    val c = clip(277)
    (0L to 3L).foreach { style =>
      val bytes = Waveform.encodeWav(c, style)
      val back = Waveform.decodeWav(bytes)
      assert(back.isRight, s"style $style: ${back.left.getOrElse("")}")
      val d = back.toOption.get
      assert(d.sampleRate == c.sampleRate)
      assert(d.channels == c.channels)
      assert(d.samples.toSeq == c.samples.toSeq, s"style $style samples differ")
    }
  }

  test("re-export: byte-different container layouts decode identically") {
    val c = clip(64)
    val encodings = (0L to 3L).map(Waveform.encodeWav(c, _))
    assert(encodings.map(_.toSeq).distinct.length == 4,
      "styles must produce byte-different files")
    val decoded = encodings.map(Waveform.decodeWav(_).toOption.get.samples.toSeq)
    assert(decoded.distinct.length == 1, "all must decode to the same samples")
  }

  test("every truncation prefix is a Left, never an exception") {
    val bytes = Waveform.encodeWav(clip(33), style = 2)
    (0 until bytes.length).foreach { k =>
      val r = Waveform.decodeWav(bytes.take(k))
      assert(r.isLeft, s"prefix $k decoded successfully")
    }
    assert(Waveform.decodeWav(bytes).isRight)
  }

  test("corrupt magic, form type, fmt and data are rejected with reasons") {
    val good = Waveform.encodeWav(clip(20))
    def mutate(at: Int, to: Byte): Either[String, Waveform.Clip] = {
      val b = good.clone(); b(at) = to; Waveform.decodeWav(b)
    }
    assert(mutate(0, 'X').left.exists(_.contains("RIFF")))
    assert(mutate(8, 'X').left.exists(_.contains("WAVE")))
    // audioFormat lives at offset 12 (chunk hdr) + 8: patch PCM -> 2
    assert(mutate(20, 2).left.exists(_.contains("PCM")))
    // bits-per-sample at fmt body offset 14: patch 16 -> 8
    assert(mutate(34, 8).left.exists(_.contains("16-bit")))
    // declared RIFF size beyond the buffer
    val shortDecl = good.clone(); shortDecl(4) = (shortDecl(4) + 64).toByte
    assert(Waveform.decodeWav(shortDecl).isLeft)
    // random byte soup never throws
    val rnd = new scala.util.Random(7)
    (0 until 500).foreach { _ =>
      val junk = Array.fill(rnd.nextInt(200))(rnd.nextInt().toByte)
      Waveform.decodeWav(junk) // must not throw
    }
  }

  test("duplicate data and fmt chunks are rejected (strict-validation contract)") {
    val c = clip(12)
    val full = Waveform.encodeWav(c, 0) // RIFF(WAVE + fmt + data)
    val fmtC = full.slice(12, 36)
    val dataC = full.drop(36)
    def rebuild(chunks: Array[Byte]*): Array[Byte] = {
      val body = chunks.flatten.toArray
      val bb = java.nio.ByteBuffer.allocate(12 + body.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + body.length)
        .put("WAVE".getBytes("US-ASCII")).put(body)
      bb.array()
    }
    assert(Waveform.decodeWav(rebuild(fmtC, dataC, dataC))
      .left.exists(_.contains("duplicate data")))
    assert(Waveform.decodeWav(rebuild(fmtC, fmtC, dataC))
      .left.exists(_.contains("duplicate fmt")))
    assert(Waveform.decodeWav(rebuild(fmtC, dataC)).isRight)
  }

  test("unknown chunks are skipped; data before fmt is rejected") {
    val c = clip(10)
    // style 3 places a LIST chunk before fmt — decode skips it
    assert(Waveform.decodeWav(Waveform.encodeWav(c, 3)).isRight)
    // hand-build data-before-fmt: RIFF(WAVE + data + fmt)
    val full = Waveform.encodeWav(c, 0)
    // swap chunk order by re-slicing: [12..12+24) is fmt, rest is data
    val fmtC = full.slice(12, 36)
    val dataC = full.drop(36)
    val swapped = full.take(12) ++ dataC ++ fmtC
    assert(Waveform.decodeWav(swapped).left.exists(_.contains("before fmt")))
  }

  test("downsample decimates exactly and rescales the rate") {
    val c = clip(101)
    val d = Waveform.downsample(c, 4)
    assert(d.sampleRate == 2000)
    assert(d.samples.length == 26)
    assert(d.samples.toSeq == c.samples.indices.collect {
      case i if i % 4 == 0 => c.samples(i)
    }.toSeq)
    assert(Waveform.downsample(c, 1).samples.toSeq == c.samples.toSeq)
  }

  test("renderWaveform stays in int16 range and matches the oracle formula") {
    val texts = Seq("key agg row scan slow fast table value part",
      "batch window spark order data column agg join")
    texts.foreach { t =>
      val c = Multimodal.renderWaveform(t)
      val bs = t.getBytes("US-ASCII")
      assert(c.samples.length == bs.length % 96 + 32)
      c.samples.zipWithIndex.foreach { case (s, i) =>
        val expect = (bs(i % bs.length) - 64) * 400 + (i * 31) % 197
        assert(s.toInt == expect, s"sample $i")
        assert(math.abs(expect) <= Short.MaxValue)
      }
    }
  }
}
