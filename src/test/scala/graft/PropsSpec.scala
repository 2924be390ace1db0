package graft

import graft.sources.GtfsRt
import graft.sources.GtfsRt.RawVehicle
import org.scalacheck.{Arbitrary, Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties (SURVEY.md §5.2 #3). */
object PropsSpec extends Properties("graft") {

  private val genVehicle: Gen[RawVehicle] = for {
    vid     <- Gen.option(Gen.alphaNumStr.map(_.take(12)))
    lat     <- Gen.option(Gen.choose(-90f, 90f).map(_.toDouble))
    lon     <- Gen.option(Gen.choose(-180f, 180f).map(_.toDouble))
    speed   <- Gen.option(Gen.choose(0f, 40f).map(_.toDouble))
    bearing <- Gen.option(Gen.choose(0f, 360f).map(_.toDouble))
    trip    <- Gen.option(Gen.alphaNumStr.map(_.take(8)))
    route   <- Gen.option(Gen.alphaNumStr.map(_.take(8)))
    seq     <- Gen.option(Gen.choose(0, 1000))
    status  <- Gen.option(Gen.choose(0, 3))
  } yield RawVehicle(vid, lat, lon, speed, bearing, trip, route, seq, status)

  // float32 wire round trip: compare at float precision
  private def f32(o: Option[Double]) = o.map(_.toFloat)

  property("gtfs-rt encode/decode roundtrip") =
    forAll(Gen.listOfN(5, genVehicle)) { vs =>
      val back = GtfsRt.decodeFeed(GtfsRt.encodeFeed(vs))
      back.size == vs.size && back.zip(vs).forall { case (b, v) =>
        b.vehicle_id == v.vehicle_id &&
          f32(b.latitude) == f32(v.latitude) &&
          f32(b.longitude) == f32(v.longitude) &&
          f32(b.speed) == f32(v.speed) &&
          b.trip_id == v.trip_id && b.route_id == v.route_id &&
          b.current_stop_sequence == v.current_stop_sequence &&
          b.current_status == v.current_status
      }
    }

  property("wkb point roundtrip is exact") =
    forAll(Gen.choose(-180.0, 180.0), Gen.choose(-90.0, 90.0)) { (lon, lat) =>
      val wkb = graft.functions.GeoWkb.pointWkb(lon, lat)
      graft.functions.GeoWkb.readX(wkb) == lon &&
        graft.functions.GeoWkb.readY(wkb) == lat
    }

  property("y4m decode is a pure function of the bytes (never throws)") =
    forAll(Arbitrary.arbitrary[Array[Byte]]) { bytes =>
      val a = graft.operators.Y4m.decodeY4m(bytes)
      val b = graft.operators.Y4m.decodeY4m(bytes)
      (a.isLeft == b.isLeft) && (a.left.toOption == b.left.toOption)
    }

  import graft.operators.Netpbm

  private val genImage: Gen[Netpbm.Image] = for {
    w <- Gen.choose(1, 40)
    h <- Gen.choose(1, 30)
    raster <- Gen.containerOfN[Array, Byte](w * h * 3, Arbitrary.arbitrary[Byte])
  } yield Netpbm.Image(w, h, 255, raster)

  property("ppm codec roundtrip for arbitrary images and header styles") =
    forAll(genImage, Gen.choose(0L, 20L)) { (img, style) =>
      Netpbm.decodeP6(Netpbm.encodeP6(img, style)) match {
        case Right(back) =>
          back.width == img.width && back.height == img.height &&
            back.maxval == img.maxval && back.raster.sameElements(img.raster)
        case Left(_) => false
      }
    }

  property("ppm parser never throws on arbitrary bytes (errors are values)") =
    forAll(Arbitrary.arbitrary[Array[Byte]]) { bytes =>
      // totality: malformed input must yield Left, not an exception
      Netpbm.decodeP6(bytes) match {
        case Left(_) => true
        case Right(img) =>
          img.width > 0 && img.height > 0 &&
            img.raster.length == img.width * img.height * 3
      }
    }

  property("ppm parser never throws on corrupted valid files") =
    forAll(genImage, Gen.choose(0, 1000), Arbitrary.arbitrary[Byte]) {
      (img, pos, b) =>
        val enc = Netpbm.encodeP6(img, 0L)
        val corrupted = enc.clone()
        corrupted(pos % enc.length) = b
        Netpbm.decodeP6(corrupted).isLeft ||
          Netpbm.decodeP6(corrupted).isRight // any VALUE is fine; no throw
    }

  property("header validity predicate is in lockstep with the decoder") =
    forAll(Arbitrary.arbitrary[Array[Byte]]) { bytes =>
      // ppm_valid's contract: true iff the full decode succeeds — the
      // plan filters on the cheap predicate, so the two must never
      // disagree about what "decodable" means
      Netpbm.headerValid(bytes) == Netpbm.decodeP6(bytes).isRight
    }

  property("phash is recompression-invariant for any image") =
    forAll(genImage, Gen.choose(0L, 6L), Gen.choose(7L, 13L)) { (img, s1, s2) =>
      def ph(bytes: Array[Byte]): Long =
        Netpbm.whtPhash(Netpbm.luma8x8(Netpbm.decodeP6(bytes).toOption.get))
      ph(Netpbm.encodeP6(img, s1)) == ph(Netpbm.encodeP6(img, s2))
    }
}
