package graft.queries

import graft.SparkTestBase
import graft.queries.MultimodalOps.{Asset, AssetFeatures}

class MultimodalSpec extends SparkTestBase {

  test("extractFeatures: deterministic per-partition decode plumbing") {
    import spark.implicits._
    val assets = (0 until 100).map { i =>
      Asset(i.toLong, if (i % 2 == 0) "image/png" else "audio/wav",
        Array.tabulate[Byte](16 + i)(j => ((i * 31 + j) & 0xff).toByte))
    }
    val got = MultimodalOps.extractFeatures(assets.toDS())
      .collect().sortBy(_.asset_id)
    assert(got.length == 100)
    // deterministic: identical on re-run and under different partitioning
    val again = MultimodalOps
      .extractFeatures(assets.toDS().repartition(7))
      .collect().sortBy(_.asset_id)
    assert(got.toSeq == again.toSeq)
    // features agree with the driver-side stub (no Spark in the oracle)
    got.foreach { f: AssetFeatures =>
      val a = assets(f.asset_id.toInt)
      val (w, h, fr) = MultimodalOps.decodeStub(a.payload)
      assert(f.byte_len == a.payload.length.toLong)
      assert((f.width, f.height, f.n_frames) == ((w, h, fr)))
      assert(f.media_type == a.media_type)
      assert(f.checksum.length == 32)
    }
    // bounds from the stub contract
    got.foreach { f =>
      assert(f.width >= 1 && f.width <= 640)
      assert(f.height >= 1 && f.height <= 480)
      assert(f.n_frames >= 1 && f.n_frames <= 30)
    }
  }
}
