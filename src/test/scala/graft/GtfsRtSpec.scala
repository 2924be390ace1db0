package graft

import graft.sources.GtfsRt
import graft.sources.GtfsRt.RawVehicle
import org.scalatest.funsuite.AnyFunSuite

/** GTFS-RT wire-format codec (SURVEY.md §2.1 S4, §4.3 #4). */
class GtfsRtSpec extends AnyFunSuite {

  private val full = RawVehicle(Some("bus-42"), Some(40.7484), Some(-73.9857),
    Some(5.5), Some(270.0), Some("trip-1"), Some("M34"), Some(7), Some(2))

  test("encode/decode roundtrip preserves every field") {
    val decoded = GtfsRt.decodeFeed(GtfsRt.encodeFeed(Seq(full)))
    assert(decoded.size == 1)
    val v = decoded.head
    assert(v.vehicle_id.contains("bus-42"))
    assert(v.latitude.exists(l => math.abs(l - 40.7484) < 1e-4)) // float32
    assert(v.longitude.exists(l => math.abs(l + 73.9857) < 1e-4))
    assert(v.speed.exists(s => math.abs(s - 5.5) < 1e-6))
    assert(v.trip_id.contains("trip-1") && v.route_id.contains("M34"))
    assert(v.current_stop_sequence.contains(7) && v.current_status.contains(2))
  }

  test("HasField semantics: absent fields are None, not proto defaults") {
    val sparse = RawVehicle(None, Some(40.0), Some(-74.0), None, None,
      None, None, None, None)
    val v = GtfsRt.decodeFeed(GtfsRt.encodeFeed(Seq(sparse))).head
    assert(v.vehicle_id.isEmpty && v.speed.isEmpty && v.bearing.isEmpty)
    assert(v.trip_id.isEmpty && v.current_status.isEmpty)
    assert(v.latitude.isDefined && v.longitude.isDefined)
  }

  test("status 0 on the wire decodes as Some(0), distinct from absent") {
    val zero = full.copy(current_status = Some(0), current_stop_sequence = Some(0))
    val v = GtfsRt.decodeFeed(GtfsRt.encodeFeed(Seq(zero))).head
    assert(v.current_status.contains(0))
    assert(v.current_stop_sequence.contains(0))
  }

  test("multiple entities and empty feeds") {
    val many = (1 to 50).map(i => full.copy(vehicle_id = Some(s"v$i")))
    assert(GtfsRt.decodeFeed(GtfsRt.encodeFeed(many)).size == 50)
    assert(GtfsRt.decodeFeed(GtfsRt.encodeFeed(Seq.empty)).isEmpty)
  }

  test("unknown fields are skipped (forward compatibility)") {
    // append an unknown length-delimited field (field 99, tag varint
    // 794 = 0x9A 0x06) at top level
    val bytes = GtfsRt.encodeFeed(Seq(full))
    val extra = Array[Byte](0x9a.toByte, 0x06, 3, 1, 2, 3)
    assert(GtfsRt.decodeFeed(bytes ++ extra).size == 1)
  }

  test("truncated and corrupt feeds raise clear errors, never garbage") {
    val bytes = GtfsRt.encodeFeed(Seq(full, full.copy(vehicle_id = Some("x"))))
    // every strict prefix either decodes fewer/equal records or throws
    // "truncated message" — it must never read past a boundary
    (1 until bytes.length).foreach { cut =>
      try {
        val decoded = GtfsRt.decodeFeed(bytes.take(cut))
        assert(decoded.size <= 2)
      } catch {
        case e: IllegalArgumentException =>
          assert(e.getMessage.contains("truncated") ||
            e.getMessage.contains("malformed"),
            s"cut=$cut unexpected: ${e.getMessage}")
      }
    }
    // a length field pointing far past the payload end must throw
    val lying = Array[Byte](0x12, 0x7f, 1, 2, 3) // entity claims 127 bytes, has 3
    val ex = intercept[IllegalArgumentException](GtfsRt.decodeFeed(lying))
    assert(ex.getMessage.contains("truncated"))
  }
}
