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

  private def assets(n: Int): Seq[Asset] = (0 until n).map { i =>
    Asset(i.toLong, if (i % 2 == 0) "video/mp4" else "image/png",
      Array.tabulate[Byte](10 + i * 7)(j => ((i * 131 + j * 17) & 0xff).toByte))
  }

  test("resize: ≤maxBytes, deterministic stride sample, short payloads " +
       "pass through, composes with extractFeatures") {
    import spark.implicits._
    val in = assets(60)
    val got = MultimodalOps.resize(in.toDS().repartition(5), 64)
      .collect().sortBy(_.asset_id)
    assert(got.length == 60)
    got.foreach { r =>
      val a = in(r.asset_id.toInt)
      assert(r.orig_len == a.payload.length.toLong)
      assert(r.payload.length <= 64)
      if (a.payload.length <= 64) assert(r.payload.sameElements(a.payload))
      else {
        val stride = (a.payload.length + 63) / 64
        assert(r.payload.zipWithIndex.forall { case (b, i) =>
          b == a.payload(i * stride) })
      }
    }
    // binary column survives a round-trip into the feature extractor
    val feats = MultimodalOps.extractFeatures(
      MultimodalOps.resize(in.toDS(), 64)
        .map(r => Asset(r.asset_id, r.media_type, r.payload)))
      .collect()
    assert(feats.length == 60)
  }

  test("sampleFrames: frame slices partition the payload, `every` strides " +
       "the frame index, deterministic under repartition") {
    import spark.implicits._
    val in = assets(40)
    val all = MultimodalOps.sampleFrames(in.toDS(), 1).collect()
      .groupBy(_.asset_id)
    in.foreach { a =>
      val (_, _, n) = MultimodalOps.decodeStub(a.payload)
      val frames = all(a.asset_id).sortBy(_.frame_idx)
      assert(frames.length == n)
      assert(frames.forall(_.n_frames == n))
      // slices reassemble the exact payload
      assert(frames.flatMap(_.payload).sameElements(a.payload))
    }
    val every3 = MultimodalOps.sampleFrames(in.toDS().repartition(7), 3)
      .collect().groupBy(_.asset_id)
    in.foreach { a =>
      val (_, _, n) = MultimodalOps.decodeStub(a.payload)
      val idx = every3(a.asset_id).map(_.frame_idx).sorted.toSeq
      assert(idx == (0 until n by 3).toSeq)
    }
  }
}
