package graft.driver

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import graft.SparkTestBase
import graft.operators.CrawlRound
import graft.sim.FixtureWeb

/**
 * crawl-mirror export gate (reference: libcrawl/utils/crawl-mirror.c):
 * the bulk dump must reproduce, byte-for-byte, what the single-URL
 * `locatePayload` read path serves, in the disk cache's xx/yy/<hash>
 * sharded layout (caches/disk.c:349-375), and respect host / partition
 * scoping (F8).
 */
class MirrorExportSpec extends SparkTestBase {
  val T0 = 1000000L

  lazy val drv: CrawlDriver = {
    val d = new CrawlDriver(spark, FixtureWeb.config(),
      CrawlRound.webFromMap(spark, FixtureWeb.generate()), store = None,
      numBuckets = 8)
    d.seed(FixtureWeb.seeds, T0 - 1)
    d.run(T0, 12)
    d
  }

  private def filesUnder(dir: String): Seq[java.nio.file.Path] = {
    val s = Files.walk(Paths.get(dir))
    try s.iterator().asScala.filter(Files.isRegularFile(_)).toSeq
    finally s.close()
  }

  test("host-scoped export: every stored payload of the host dumped " +
       "byte-identically to locatePayload, nothing else") {
    val out = Files.createTempDirectory("graft-mirror").toString
    val root = "http://host1.example.org/"
    val n = drv.exportMirror(out, rootUrl = Some(root))
    val hostPages = drv.pages.collect().filter(_.url.startsWith(root))
    assert(hostPages.nonEmpty)
    assert(n == hostPages.length.toLong)
    // exactly payload+sidecar per object, nothing out of scope
    assert(filesUnder(out).size == 2 * hostPages.length)
    hostPages.foreach { p =>
      val f = Paths.get(out, p.url_hash.substring(0, 2),
        p.url_hash.substring(2, 4), p.url_hash)
      assert(Files.exists(f), s"missing payload for ${p.url}")
      assert(Files.readAllBytes(f).toSeq ==
        drv.locatePayload(p.url).get.toSeq, s"payload bytes ${p.url}")
      val sidecar = Files.readString(Paths.get(f.toString + ".json"))
      assert(sidecar.contains(s""""url":"${p.url}""""))
      assert(sidecar.contains(s""""updated":${p.updated}"""))
      assert(sidecar.contains("\"status\":"))
    }
  }

  test("partition-label export scopes to labeled hosts (F8)") {
    val out = Files.createTempDirectory("graft-mirror-p").toString
    drv.setHostPartition("http://host2.example.org/", Some("mirrorP"))
    val n = drv.exportMirror(out, partition = Some("mirrorP"))
    val host2Pages = drv.pages.collect()
      .filter(_.url.startsWith("http://host2.example.org/"))
    assert(n == host2Pages.length.toLong)
    assert(filesUnder(out).size == 2 * host2Pages.length)
    // unlabeled partition exports nothing
    val out2 = Files.createTempDirectory("graft-mirror-q").toString
    assert(drv.exportMirror(out2, partition = Some("noSuchLabel")) == 0L)
  }
}
