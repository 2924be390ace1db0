package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import graft.pipeline._
import graft.sources.GtfsRt
import graft.sources.GtfsRt.RawVehicle

/** YAML feed-registry loading (ref api_utils.py:29-55 semantics). */
class FeedRegistrySpec extends SparkSpec {

  private val referenceShape =
    """# Custom feed configurations
      |custom_feeds:
      |  mta_bus:
      |    url: "https://example.test/vehiclePositions?key="
      |    api_token: ""  # Optional
      |    headers: {}  # Optional additional headers
      |  second:
      |    url: 'file:///tmp/x.pb'
      |    api_token: "sekrit"
      |    headers:
      |      X-Custom: "yes"
      |      Accept: application/x-protobuf
      |""".stripMargin

  test("parses the reference config shape, '' token is absent") {
    val feeds = FeedRegistry.parse(referenceShape)
    assert(feeds.map(_.id) == Seq("mta_bus", "second"))
    val mta = feeds.head
    assert(mta.url == "https://example.test/vehiclePositions?key=")
    assert(mta.apiToken.isEmpty) // "" is Python-falsy in the reference
    assert(mta.headers.isEmpty)
    val snd = feeds(1)
    assert(snd.apiToken.contains("sekrit"))
    assert(snd.headers == Map("X-Custom" -> "yes", "Accept" -> "application/x-protobuf"))
  }

  test("missing file, empty file and comment-only file yield no feeds") {
    assert(FeedRegistry.load("/nonexistent/feeds_config.yaml").isEmpty)
    assert(FeedRegistry.parse("").isEmpty)
    assert(FeedRegistry.parse("# nothing here\n\n").isEmpty)
    assert(FeedRegistry.parse("custom_feeds: {}\n").isEmpty)
    assert(FeedRegistry.parse("other_key: 1\n").isEmpty)
  }

  test("feed without a url raises a clear error") {
    val ex = intercept[IllegalArgumentException] {
      FeedRegistry.parse("custom_feeds:\n  broken:\n    api_token: x\n")
    }
    assert(ex.getMessage.contains("broken"))
  }

  test("bare url keeps its fragment; quoted hash survives") {
    val feeds = FeedRegistry.parse(
      "custom_feeds:\n  f:\n    url: http://h/x#frag\n    api_token: \"a#b\"\n")
    assert(feeds.head.url == "http://h/x#frag")
    assert(feeds.head.apiToken.contains("a#b"))
  }

  test("generated configs round-trip; junk input fails cleanly, never hangs") {
    import org.scalacheck.Gen
    def sample[A](g: Gen[A], seed: Long): A =
      g(Gen.Parameters.default, org.scalacheck.rng.Seed(seed)).get
    // round-trip: N generated feeds → YAML text → parse → same configs
    val idGen = Gen.listOfN(6, Gen.alphaLowerChar).map(_.mkString)
    (1 to 20).foreach { seed =>
      val ids = sample(Gen.listOfN(4, idGen), seed).distinct
      val yaml = "custom_feeds:\n" + ids.zipWithIndex.map { case (id, i) =>
        s"""  $id:
           |    url: "https://x.test/$id?key="
           |    api_token: "${if (i % 2 == 0) s"tok$i" else ""}"
           |    headers: {}
           |""".stripMargin
      }.mkString
      val feeds = FeedRegistry.parse(yaml)
      assert(feeds.map(_.id) == ids)
      feeds.zipWithIndex.foreach { case (f, i) =>
        assert(f.url == s"https://x.test/${ids(i)}?key=")
        assert(f.apiToken.isDefined == (i % 2 == 0))
      }
    }
    // junk: any outcome must be a clean value or IllegalArgumentException
    val junk = Gen.listOfN(200,
      Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(':', '#', '"', '\'', ' ', '\n', '{', '}', '-')))
      .map(_.mkString)
    (1 to 50).foreach { seed =>
      try FeedRegistry.parse(sample(junk, seed))
      catch { case _: IllegalArgumentException => () }
    }
  }

  test("registry file drives a real batch end-to-end through runBatch") {
    val dir = Files.createTempDirectory("registry").toString
    val pb = s"$dir/feed.pb"
    Files.write(Paths.get(pb), GtfsRt.encodeFeed(Seq(
      RawVehicle(Some("v1"), Some(40.7), Some(-74.0), Some(1.0), Some(2.0),
        Some("t1"), Some("r1"), Some(1), Some(2)))))
    val yaml =
      s"""custom_feeds:
         |  local:
         |    url: "$pb"
         |  gone:
         |    url: "$dir/missing.pb!boom"
         |""".stripMargin
    val cfg = s"$dir/feeds_config.yaml"
    Files.write(Paths.get(cfg), yaml.getBytes("UTF-8"))

    val feeds = FeedRegistry.load(cfg)
    assert(feeds.size == 2)
    val report = GtfsPipeline.runBatch(spark, feeds, new FileFeedSource,
      s"$dir/data", s"$dir/ledger",
      Timestamp.valueOf("2024-06-01 12:00:30"))
    assert(report.feedsOk == Seq("local"))
    assert(report.feedsFailed.keySet == Set("gone"))
    assert(report.recordCount == 1)
  }
}
