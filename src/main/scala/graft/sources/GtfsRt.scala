package graft.sources

import scala.collection.mutable.ArrayBuffer

/** Minimal GTFS-Realtime FeedMessage codec over the public protobuf
  * wire format (gtfs-realtime.proto, proto2). Hand-rolled because the
  * runtime ships no protobuf jars; only the fields the reference
  * extracts are decoded (ref: gtfs_rt_assets.py:26-49):
  *
  *   FeedMessage.entity(2) → FeedEntity.vehicle(4) →
  *     VehiclePosition.trip(1){trip_id(1), route_id(5)},
  *     .position(2){lat(1), lon(2), bearing(3), speed(5)},
  *     .current_stop_sequence(3), .current_status(4),
  *     .vehicle(8){id(1)}
  *
  * Null semantics mirror the reference's per-field HasField guards
  * (gtfs_rt_assets.py:38-46, SURVEY.md §4.3 #4): a field absent on the
  * wire decodes to None — never to the proto default. Unknown fields
  * are skipped by wire type, so real MTA feeds parse too.
  */
object GtfsRt {

  /** The reference's 11-column record (FIXTURES.md §B.1), minus the
    * enrichment columns (feed_id, batch timestamp) added by the
    * pipeline (P3). */
  final case class RawVehicle(
      vehicle_id: Option[String],
      latitude: Option[Double],
      longitude: Option[Double],
      speed: Option[Double],
      bearing: Option[Double],
      trip_id: Option[String],
      route_id: Option[String],
      current_stop_sequence: Option[Int],
      current_status: Option[Int])

  // ---------------------------------------------------------- decode

  /** Bounded wire reader: every read is checked against `end`, so a
    * truncated or corrupt feed (the production input is untrusted HTTP
    * bytes) raises a clear "truncated message" error instead of reading
    * across a sub-message boundary into sibling bytes — silently wrong
    * values — or crashing with ArrayIndexOutOfBounds. The fetch path
    * turns the throw into a FetchResult error (T3 isolation). */
  private final class Reader(buf: Array[Byte], var pos: Int, val end: Int) {
    private def need(n: Int): Unit =
      if (n < 0 || pos.toLong + n > end) // Long math: a hostile length
        // varint near Int.MaxValue must not wrap the comparison
        throw new IllegalArgumentException(
          s"truncated message: need $n bytes at $pos, end $end")
    def hasNext: Boolean = pos < end
    def varint(): Long = {
      var shift = 0; var res = 0L
      while (shift < 64) {
        need(1)
        val b = buf(pos); pos += 1
        res |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return res
        shift += 7
      }
      throw new IllegalArgumentException("malformed varint")
    }
    def fixed32(): Int = {
      need(4)
      val v = (buf(pos) & 0xff) | ((buf(pos + 1) & 0xff) << 8) |
        ((buf(pos + 2) & 0xff) << 16) | ((buf(pos + 3) & 0xff) << 24)
      pos += 4; v
    }
    def fixed64(): Long = {
      need(8)
      var v = 0L
      var i = 0
      while (i < 8) { v |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8; v
    }
    def bytes(len: Int): (Int, Int) = { need(len); val s = pos; pos += len; (s, pos) }
    def utf8(len: Int): String = {
      need(len)
      val s = new String(buf, pos, len, "UTF-8"); pos += len; s
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint()
      case 1 => need(8); pos += 8
      case 2 => val len = varint().toInt; need(len); pos += len
      case 5 => need(4); pos += 4
      case w => throw new IllegalArgumentException(s"unsupported wire type $w")
    }
    def sub(): Reader = {
      val len = varint().toInt
      need(len)
      val r = new Reader(buf, pos, pos + len)
      pos += len
      r
    }
  }

  /** Decode a serialized FeedMessage into vehicle records; entities
    * without a vehicle field are dropped (P1, gtfs_rt_assets.py:33). */
  def decodeFeed(payload: Array[Byte]): Seq[RawVehicle] = {
    val out = ArrayBuffer.empty[RawVehicle]
    val r = new Reader(payload, 0, payload.length)
    while (r.hasNext) {
      val tag = r.varint()
      val (field, wt) = ((tag >>> 3).toInt, (tag & 7).toInt)
      if (field == 2 && wt == 2) {
        decodeEntity(r.sub()).foreach(out += _)
      } else r.skip(wt)
    }
    out.toSeq
  }

  private def decodeEntity(r: Reader): Option[RawVehicle] = {
    var vehicle: Option[RawVehicle] = None
    while (r.hasNext) {
      val tag = r.varint()
      val (field, wt) = ((tag >>> 3).toInt, (tag & 7).toInt)
      if (field == 4 && wt == 2) vehicle = Some(decodeVehicle(r.sub()))
      else r.skip(wt)
    }
    vehicle
  }

  private def decodeVehicle(r: Reader): RawVehicle = {
    var vid: Option[String] = None
    var lat, lon, speed, bearing: Option[Double] = None
    var tripId, routeId: Option[String] = None
    var seq, status: Option[Int] = None
    while (r.hasNext) {
      val tag = r.varint()
      ((tag >>> 3).toInt, (tag & 7).toInt) match {
        case (1, 2) => // trip
          val t = r.sub()
          while (t.hasNext) {
            val tt = t.varint()
            ((tt >>> 3).toInt, (tt & 7).toInt) match {
              case (1, 2) => tripId = Some(t.utf8(t.varint().toInt))
              case (5, 2) => routeId = Some(t.utf8(t.varint().toInt))
              case (_, w) => t.skip(w)
            }
          }
        case (2, 2) => // position
          val p = r.sub()
          while (p.hasNext) {
            val pt = p.varint()
            ((pt >>> 3).toInt, (pt & 7).toInt) match {
              case (1, 5) => lat = Some(java.lang.Float.intBitsToFloat(p.fixed32()).toDouble)
              case (2, 5) => lon = Some(java.lang.Float.intBitsToFloat(p.fixed32()).toDouble)
              case (3, 5) => bearing = Some(java.lang.Float.intBitsToFloat(p.fixed32()).toDouble)
              case (5, 5) => speed = Some(java.lang.Float.intBitsToFloat(p.fixed32()).toDouble)
              case (_, w) => p.skip(w)
            }
          }
        case (3, 0) => seq = Some(r.varint().toInt)
        case (4, 0) => status = Some(r.varint().toInt)
        case (8, 2) => // vehicle descriptor
          val v = r.sub()
          while (v.hasNext) {
            val vt = v.varint()
            ((vt >>> 3).toInt, (vt & 7).toInt) match {
              case (1, 2) => vid = Some(v.utf8(v.varint().toInt))
              case (_, w) => v.skip(w)
            }
          }
        case (_, w) => r.skip(w)
      }
    }
    RawVehicle(vid, lat, lon, speed, bearing, tripId, routeId, seq, status)
  }

  // ---------------------------------------------------------- encode
  // (test-fixture writer: builds valid FeedMessage bytes so specs need
  //  no network and no protobuf dependency — FIXTURES.md §B.1)

  private def writeVarint(out: ArrayBuffer[Byte], v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out += ((v & 0x7f) | 0x80).toByte; v >>>= 7 }
    out += v.toByte
  }
  private def writeTag(out: ArrayBuffer[Byte], field: Int, wt: Int): Unit =
    writeVarint(out, (field.toLong << 3) | wt)
  private def writeBytes(out: ArrayBuffer[Byte], field: Int, b: Array[Byte]): Unit = {
    writeTag(out, field, 2); writeVarint(out, b.length); out ++= b
  }
  private def writeString(out: ArrayBuffer[Byte], field: Int, s: String): Unit =
    writeBytes(out, field, s.getBytes("UTF-8"))
  private def writeFloat(out: ArrayBuffer[Byte], field: Int, f: Double): Unit = {
    writeTag(out, field, 5)
    val bits = java.lang.Float.floatToIntBits(f.toFloat)
    out += bits.toByte += (bits >> 8).toByte += (bits >> 16).toByte += (bits >> 24).toByte
  }

  /** Encode vehicles as a FeedMessage (with a minimal header). */
  def encodeFeed(vehicles: Seq[RawVehicle]): Array[Byte] = {
    val out = ArrayBuffer.empty[Byte]
    val header = ArrayBuffer.empty[Byte]
    writeString(header, 1, "2.0")
    writeBytes(out, 1, header.toArray)
    vehicles.zipWithIndex.foreach { case (v, i) =>
      val vp = ArrayBuffer.empty[Byte]
      if (v.trip_id.isDefined || v.route_id.isDefined) {
        val t = ArrayBuffer.empty[Byte]
        v.trip_id.foreach(writeString(t, 1, _))
        v.route_id.foreach(writeString(t, 5, _))
        writeBytes(vp, 1, t.toArray)
      }
      if (v.latitude.isDefined || v.longitude.isDefined ||
          v.bearing.isDefined || v.speed.isDefined) {
        val p = ArrayBuffer.empty[Byte]
        v.latitude.foreach(writeFloat(p, 1, _))
        v.longitude.foreach(writeFloat(p, 2, _))
        v.bearing.foreach(writeFloat(p, 3, _))
        v.speed.foreach(writeFloat(p, 5, _))
        writeBytes(vp, 2, p.toArray)
      }
      v.current_stop_sequence.foreach { x => writeTag(vp, 3, 0); writeVarint(vp, x.toLong) }
      v.current_status.foreach { x => writeTag(vp, 4, 0); writeVarint(vp, x.toLong) }
      v.vehicle_id.foreach { id =>
        val d = ArrayBuffer.empty[Byte]
        writeString(d, 1, id)
        writeBytes(vp, 8, d.toArray)
      }
      val ent = ArrayBuffer.empty[Byte]
      writeString(ent, 1, s"e$i")
      writeBytes(ent, 4, vp.toArray)
      writeBytes(out, 2, ent.toArray)
    }
    out.toArray
  }
}
