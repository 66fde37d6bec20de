package graft.operators

import graft.SparkTestBase
import graft.core.{FetchMeta, PageRow}
import graft.sim.FixtureWeb

/** S2/J4 source shape: the simulated web assembled from the at-rest tables
  * (`pages` ⋈ `fetch_meta` on url) must equal the in-memory map source —
  * proving the raw-header envelope (FetchMeta) round-trips through the
  * table layer into the X7 parser. */
class WebSourceSpec extends SparkTestBase {

  test("webFromTables(pages, fetch_meta) ≡ webFromMap") {
    import spark.implicits._
    val web   = FixtureWeb.generate()
    val pages = FixtureWeb.pagesRows(web).map { case (u, ts, html, text, lang) =>
      PageRow(u, new java.sql.Timestamp(ts * 1000L), html, text, lang)
    }.toDS()
    val meta = FixtureWeb.fetchMetaRows(web).toDS()

    val fromTables = CrawlRound.webFromTables(pages, meta).collect()
      .map(w => w.url -> ((w.warc_ts, w.body.toSeq, w.headers_raw))).toMap
    val fromMap = CrawlRound.webFromMap(spark, web).collect()
      .map(w => w.url -> ((w.warc_ts, w.body.toSeq, w.headers_raw))).toMap
    assert(fromTables == fromMap)
    assert(fromTables.nonEmpty)
    // and the parsed view exposes the wire facts (X7 in the dataflow)
    val e = graft.core.Step.WebEntry(0L, Array.emptyByteArray,
      fromTables(FixtureWeb.url(0, 1))._3)
    assert(e.status == 301 && e.location.contains(FixtureWeb.url(0, 2)))
  }
}
