package graft.operators

/** A real, dependency-free video container codec: YUV4MPEG2 ("Y4M"),
  * the published uncompressed-video interchange format (mjpegtools).
  * This retires the LAST multimodal decode stub (VERDICT_r08 next #3):
  * image (Netpbm P6) and audio (RIFF/WAVE) already graduated to real
  * codecs; video now follows the same pattern. The container ships no
  * ffmpeg, but Y4M is a real wire format with a real parser — stream
  * magic, tagged header parameters in any order, per-frame FRAME
  * markers with optional parameters, fixed-size raw planes — so the
  * frame-sampling step exercises genuine demuxer behavior (two
  * byte-different encodings of the same clip decode to identical
  * frames) while staying deterministic enough for the DuckDB oracle.
  *
  * Only the C444 colorspace (full-resolution Y, U, V planes — w·h
  * bytes each, 3·w·h per frame) is accepted: it keeps every frame
  * byte addressable by exact integer math in both engines (C420's
  * halved chroma planes would add nothing to the demux semantics).
  * Unknown colorspaces are a parse error, not silent truncation.
  *
  * Frame-level features use the same wrapping base-31 Horner fold as
  * [[Netpbm.checksum]], so every derived value is cross-engine exact.
  */
object Y4m {

  /** A decoded clip: per-frame raw C444 plane bytes (each frame
    * exactly width·height·3 bytes: Y plane, U plane, V plane). */
  final case class Video(width: Int, height: Int, frames: Vector[Array[Byte]])

  /** Encode as a YUV4MPEG2 stream. `style` varies the CONTAINER —
    * optional interlacing/aspect/comment tags, their order, optional
    * per-frame parameters — without changing a single frame byte,
    * which is how Y4mSpec plants "re-muxed" duplicates: byte-different
    * files, identical video. */
  def encodeY4m(v: Video, style: Long = 0L): Array[Byte] = {
    val s = ((style % 4) + 4) % 4
    val base = s"W${v.width} H${v.height} F25:1 C444"
    val header = s match {
      case 0 => s"YUV4MPEG2 $base\n"                       // minimal
      case 1 => s"YUV4MPEG2 $base Ip A1:1\n"               // full tags
      case 2 => s"YUV4MPEG2 $base Xgraft-enc-${((style % 7) + 7) % 7}\n"
      case _ => s"YUV4MPEG2 C444 Ip W${v.width} A1:1 H${v.height} F25:1\n"
    } // legal: tags are tagged fields, order-free after the magic
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(header.getBytes("US-ASCII"))
    v.frames.zipWithIndex.foreach { case (f, idx) =>
      val fh =
        if (s == 2) s"FRAME Xf$idx\n" // optional per-frame parameter
        else "FRAME\n"
      bos.write(fh.getBytes("US-ASCII"))
      bos.write(f)
    }
    bos.toByteArray
  }

  /** Parse and validate a YUV4MPEG2 stream: magic, tagged stream
    * parameters (any order; W and H required; only C444 supported),
    * FRAME markers with optional parameters, exact-size plane reads,
    * clean EOF only at a frame boundary. Every failure is a Left,
    * never an exception — corrupt and truncated inputs are data, not
    * crashes (the same contract as [[Netpbm.decodeP6]] and
    * [[Waveform.decodeWav]]). */
  def decodeY4m(bytes: Array[Byte]): Either[String, Video] = {
    val magic = "YUV4MPEG2".getBytes("US-ASCII")
    if (bytes.length < magic.length + 1)
      return Left(s"too short for stream header: ${bytes.length}")
    var i = 0
    while (i < magic.length) {
      if (bytes(i) != magic(i)) return Left("bad magic: not YUV4MPEG2")
      i += 1
    }
    // stream-parameter line: space-separated tagged fields to '\n'
    var nl = i
    while (nl < bytes.length && bytes(nl) != '\n') nl += 1
    if (nl >= bytes.length) return Left("unterminated stream header")
    val params = new String(bytes, i, nl - i, "US-ASCII")
      .split(" ").filter(_.nonEmpty)
    var width = -1
    var height = -1
    var colorspace = "C420" // the format's default when no C tag is present
    def posInt(tag: String, s: String): Either[String, Int] =
      try {
        val v = s.toInt
        if (v <= 0) Left(s"bad $tag value $v") else Right(v)
      } catch { case _: NumberFormatException => Left(s"bad $tag value '$s'") }
    for (p <- params) p.charAt(0) match {
      case 'W' => posInt("W", p.substring(1)) match {
        case Right(v) => width = v
        case Left(e)  => return Left(e)
      }
      case 'H' => posInt("H", p.substring(1)) match {
        case Right(v) => height = v
        case Left(e)  => return Left(e)
      }
      case 'C' => colorspace = p
      case 'F' | 'I' | 'A' | 'X' => () // rate/interlace/aspect/comment: accepted, unused
      case c => return Left(s"unknown stream parameter '$c'")
    }
    if (width <= 0) return Left("missing W (width) stream parameter")
    if (height <= 0) return Left("missing H (height) stream parameter")
    if (colorspace != "C444")
      return Left(s"unsupported colorspace $colorspace (C444 only)")
    // Long math (ADVICE r09): W46341 H46341 overflows width*height*3 to
    // a NEGATIVE Int — the truncated-frame guard below would pass and
    // copyOfRange would THROW, breaking the error-as-value contract. A
    // frame larger than the payload can never decode, so bound it by
    // the input length before narrowing.
    val frameBytesL = width.toLong * height * 3
    if (frameBytesL > bytes.length)
      return Left(s"frame size $frameBytesL exceeds input length ${bytes.length}")
    val frameBytes = frameBytesL.toInt
    val frameMagic = "FRAME".getBytes("US-ASCII")
    val frames = Vector.newBuilder[Array[Byte]]
    i = nl + 1
    while (i < bytes.length) {
      if (i + frameMagic.length > bytes.length)
        return Left(s"truncated FRAME marker at $i")
      var k = 0
      while (k < frameMagic.length) {
        if (bytes(i + k) != frameMagic(k))
          return Left(s"expected FRAME marker at $i")
        k += 1
      }
      var fnl = i + frameMagic.length
      // optional frame parameters: must start with a space or end at '\n'
      if (fnl < bytes.length && bytes(fnl) != '\n' && bytes(fnl) != ' ')
        return Left(s"malformed FRAME header at $i")
      while (fnl < bytes.length && bytes(fnl) != '\n') fnl += 1
      if (fnl >= bytes.length) return Left(s"unterminated FRAME header at $i")
      val at = fnl + 1
      if (at.toLong + frameBytes > bytes.length) // Long: no wrap on GB-scale payloads
        return Left(s"truncated frame: need $frameBytes bytes at $at, have ${bytes.length - at}")
      frames += java.util.Arrays.copyOfRange(bytes, at, at + frameBytes)
      i = at + frameBytes
    }
    val fs = frames.result()
    if (fs.isEmpty) return Left("no frames")
    Right(Video(width, height, fs))
  }

  /** Evenly-spaced sample of up to `k` distinct frame indices:
    * idx_j = j·n div k for j = 0..k-1, deduplicated — the standard
    * stride sample (first frame always included; < k distinct indices
    * only when the clip has fewer than k frames). Exact integer math,
    * twinned by the DuckDB oracle. */
  def sampleIndices(nFrames: Int, k: Int): Seq[Int] =
    (0 until k).map(j => j * nFrames / k).distinct.filter(_ < nFrames)
}
