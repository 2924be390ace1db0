package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** A real, dependency-free audio codec: RIFF/WAVE PCM16 — the
  * published canonical-WAV wire format. The audio counterpart of
  * [[Netpbm]]: the container ships no libsndfile, but WAV is a real
  * chunked container with a real parser — RIFF framing, chunk walk,
  * fmt validation, odd-size pad bytes, unknown-chunk skipping — so the
  * audio decode step exercises genuine codec behavior (two
  * byte-different encodings of the same clip decode identically) while
  * staying deterministic enough for the DuckDB oracle.
  *
  * All derived features are exact-integer (peak, clip counts, sums of
  * squares in int64) or go through the engine's round6 guard (rms), so
  * every catalog value is cross-engine checkable.
  */
object Waveform {

  /** A decoded clip: mono-interleaved 16-bit samples. */
  final case class Clip(sampleRate: Int, channels: Int, samples: Array[Short])

  /** Encode as a canonical RIFF/WAVE PCM16 file. `style` varies the
    * CONTAINER — an optional LIST/INFO comment chunk, an optional
    * `fact` chunk, their order — without changing a single sample,
    * which is how WaveformSpec plants "re-exported" duplicates:
    * byte-different files, identical audio. */
  def encodeWav(clip: Clip, style: Long = 0L): Array[Byte] = {
    val s = ((style % 4) + 4) % 4
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val padded = if (body.length % 2 == 1) body :+ 0.toByte else body
      val bb = ByteBuffer.allocate(8 + padded.length).order(ByteOrder.LITTLE_ENDIAN)
      bb.put(id.getBytes("US-ASCII")).putInt(body.length).put(padded)
      bb.array()
    }
    val fmt = {
      val bb = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      bb.putShort(1) // PCM
        .putShort(clip.channels.toShort)
        .putInt(clip.sampleRate)
        .putInt(clip.sampleRate * clip.channels * 2) // byte rate
        .putShort((clip.channels * 2).toShort)       // block align
        .putShort(16)                                // bits per sample
      chunk("fmt ", bb.array())
    }
    val data = {
      val bb = ByteBuffer.allocate(clip.samples.length * 2).order(ByteOrder.LITTLE_ENDIAN)
      clip.samples.foreach(bb.putShort)
      chunk("data", bb.array())
    }
    val fact = {
      val bb = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(clip.samples.length / clip.channels)
      chunk("fact", bb.array())
    }
    val info = chunk("LIST",
      "INFO".getBytes("US-ASCII") ++ chunk("ICMT", s"enc$s".getBytes("US-ASCII")))
    val chunks: Seq[Array[Byte]] = s match {
      case 0 => Seq(fmt, data)               // minimal canonical layout
      case 1 => Seq(fmt, fact, data)         // fact before data
      case 2 => Seq(fmt, info, data)         // metadata before data
      case _ => Seq(info, fmt, data)         // metadata first (legal RIFF)
    }
    val body = chunks.flatten.toArray
    val bb = ByteBuffer.allocate(12 + body.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + body.length)
      .put("WAVE".getBytes("US-ASCII")).put(body)
    bb.array()
  }

  /** Parse and validate a RIFF/WAVE PCM16 file: magic, declared RIFF
    * size, chunk walk with bounds checks and odd-size pad bytes,
    * unknown chunks skipped, `fmt ` validated (PCM, 16-bit, sane
    * rate/channels), `data` must follow a valid fmt. Every failure is
    * a Left, never an exception — corrupt and truncated inputs are
    * data, not crashes (the same contract as [[Netpbm.decodeP6]] and
    * the protobuf decoder). */
  def decodeWav(bytes: Array[Byte]): Either[String, Clip] = {
    if (bytes.length < 12) return Left(s"too short for RIFF header: ${bytes.length}")
    def ascii(at: Int): String = new String(bytes, at, 4, "US-ASCII")
    def u32(at: Int): Long =
      ByteBuffer.wrap(bytes, at, 4).order(ByteOrder.LITTLE_ENDIAN).getInt.toLong & 0xffffffffL
    if (ascii(0) != "RIFF") return Left("bad magic: not RIFF")
    val riffSize = u32(4)
    if (riffSize + 8 > bytes.length)
      return Left(s"declared RIFF size $riffSize overruns ${bytes.length} bytes")
    if (ascii(8) != "WAVE") return Left("bad form type: not WAVE")
    var i = 12
    var fmt: Option[(Int, Int)] = None // (sampleRate, channels)
    var clip: Option[Clip] = None
    while (i < riffSize + 8) {
      if (i + 8 > bytes.length) return Left(s"truncated chunk header at $i")
      val id = ascii(i)
      val size = u32(i + 4)
      val at = i + 8
      if (at + size > bytes.length) return Left(s"chunk $id overruns file: $size bytes at $at")
      id match {
        case "fmt " =>
          if (fmt.isDefined) return Left("duplicate fmt chunk")
          if (size < 16) return Left(s"fmt chunk too small: $size")
          val bb = ByteBuffer.wrap(bytes, at, 16).order(ByteOrder.LITTLE_ENDIAN)
          val audioFormat = bb.getShort()
          val channels = bb.getShort().toInt
          val sampleRate = bb.getInt()
          bb.getInt() // byte rate
          bb.getShort() // block align
          val bits = bb.getShort().toInt
          if (audioFormat != 1) return Left(s"not PCM: format $audioFormat")
          if (bits != 16) return Left(s"not 16-bit: $bits")
          if (channels < 1 || channels > 16) return Left(s"bad channel count $channels")
          if (sampleRate <= 0) return Left(s"bad sample rate $sampleRate")
          fmt = Some((sampleRate, channels))
        case "data" =>
          if (clip.isDefined) return Left("duplicate data chunk")
          fmt match {
            case None => return Left("data chunk before fmt")
            case Some((rate, ch)) =>
              if (size % 2 != 0) return Left(s"odd PCM16 data size $size")
              val n = (size / 2).toInt
              val out = new Array[Short](n)
              val bb = ByteBuffer.wrap(bytes, at, size.toInt).order(ByteOrder.LITTLE_ENDIAN)
              var j = 0
              while (j < n) { out(j) = bb.getShort(); j += 1 }
              clip = Some(Clip(rate, ch, out))
          }
        case _ => () // unknown chunk: skip (LIST, fact, cue, ...)
      }
      i = at + size.toInt + (size % 2).toInt // odd chunks carry a pad byte
    }
    clip.toRight("no data chunk")
  }

  /** Validity check, DEFINED as `decodeWav(bytes).isRight` — O(data),
    * since the decode materializes the sample array (ADVICE r08: an
    * earlier docstring promised a walk-only O(header) check the body
    * never delivered). One definition keeps valid == decodable from
    * ever drifting; if a genuinely cheap predicate is needed at scale,
    * add a separate walk-only validator rather than weakening this
    * contract. */
  def wavValid(bytes: Array[Byte]): Boolean =
    decodeWav(bytes).isRight

  /** Decimate by `factor`: every factor-th sample, sampleRate scaled
    * down — the cheap integer resample (no interpolation, exact in
    * both engines). */
  def downsample(clip: Clip, factor: Int): Clip = {
    require(factor >= 1, s"factor $factor")
    val out = new Array[Short]((clip.samples.length + factor - 1) / factor)
    var i = 0
    while (i < out.length) { out(i) = clip.samples(i * factor); i += 1 }
    Clip(clip.sampleRate / factor, clip.channels, out)
  }
}
