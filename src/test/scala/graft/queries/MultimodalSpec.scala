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

  // --- sniff: real container parsing over handcrafted byte fixtures ---

  private def hexBytes(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray

  test("sniff png: signature + IHDR big-endian dims") {
    val p = hexBytes(
      "89504e470d0a1a0a 0000000d 49484452 00000280 000001e0 0806000000")
    assert(MultimodalOps.sniff(p) ==
      MultimodalOps.Sniffed("png", 640, 480, 1))
  }

  test("sniff gif: GIF87a and GIF89a little-endian dims") {
    val p89 = hexBytes("474946383961 8002 e001") // 640x480 LE
    val p87 = hexBytes("474946383761 1000 0800") // 16x8
    assert(MultimodalOps.sniff(p89) ==
      MultimodalOps.Sniffed("gif", 640, 480, 1))
    assert(MultimodalOps.sniff(p87) ==
      MultimodalOps.Sniffed("gif", 16, 8, 1))
  }

  test("sniff wav: chunk walk skips odd-sized chunks (word alignment) " +
       "before fmt; data chunk yields the frame count; RIFF without fmt " +
       "yields (0,0)") {
    // JUNK chunk with ODD size 3 (+1 pad byte) before fmt : rate 44100, ch 2
    val p = hexBytes(
      "52494646 30000000 57415645" +
      "4a554e4b 03000000 aabbcc 00" + // odd body + pad
      "666d7420 10000000 0100 0200 44ac0000 10b10200 0400 1000")
    assert(MultimodalOps.sniff(p) == MultimodalOps.Sniffed("wav", 44100, 2))
    // data chunk after fmt: 24 bytes / block-align 4 = 6 sample frames
    val withData = hexBytes(
      "52494646 48000000 57415645" +
      "666d7420 10000000 0100 0200 44ac0000 10b10200 0400 1000" +
      "64617461 18000000" + "00" * 24)
    assert(MultimodalOps.sniff(withData) ==
      MultimodalOps.Sniffed("wav", 44100, 2, 6))
    // data BEFORE fmt: the walk keeps going and still pairs them up
    val dataFirst = hexBytes(
      "52494646 48000000 57415645" +
      "64617461 08000000" + "00" * 8 +
      "666d7420 10000000 0100 0100 44ac0000 88580100 0200 1000")
    assert(MultimodalOps.sniff(dataFirst) ==
      MultimodalOps.Sniffed("wav", 44100, 1, 4))
    val nofmt = hexBytes("52494646 08000000 57415645 64617461 00000000")
    assert(MultimodalOps.sniff(nofmt) == MultimodalOps.Sniffed("wav", 0, 0))
  }

  test("sniff jpeg: marker scan skips APP0/COM/DQT and fill bytes to the " +
       "first SOF (progressive SOF2 included); DHT (C4) is not a SOF") {
    // FFD8, APP0(len 4), COM(len 5), fill byte, DQT(len 3), SOF2 h=16 w=32
    val p = hexBytes(
      "ffd8 ffe0 0004 0000 fffe 0005 414243 ff ffdb 0003 00" +
      "ffc2 0011 08 0010 0020 03 011100 021101 031101 ffd9")
    assert(MultimodalOps.sniff(p) == MultimodalOps.Sniffed("jpeg", 32, 16))
    // DHT before SOF0 must be skipped, not read as a frame header
    val dht = hexBytes("ffd8 ffc4 0003 00 ffc0 0011 08 0008 0004 03" +
      "011100 021101 031101 ffd9")
    assert(MultimodalOps.sniff(dht) == MultimodalOps.Sniffed("jpeg", 4, 8))
    // bare SOI+EOI: jpeg detected, no frame header → no dims
    assert(MultimodalOps.sniff(hexBytes("ffd8ffd9")) ==
      MultimodalOps.Sniffed("jpeg", 0, 0))
  }

  test("sniff hostile inputs: garbage, empty, truncated headers, corrupt " +
       "RIFF size never throw") {
    val cases = Seq(
      Array.emptyByteArray,
      hexBytes("00"),
      hexBytes("89504e47"),                    // png magic cut short
      hexBytes("474946"),                      // gif magic cut short
      hexBytes("52494646 ffffffff 57415645"),  // negative RIFF chunk size
      Array.tabulate[Byte](64)(i => (i * 37).toByte))
    cases.foreach { p =>
      val s = MultimodalOps.sniff(p) // must not throw
      assert(s.format == "unknown" || s.dim1 == 0 || s.format.nonEmpty)
    }
    assert(MultimodalOps.sniff(hexBytes("00112233")).format == "unknown")
  }

  test("decode: real container parse on the default path, stub only for " +
       "unknown formats") {
    val png = hexBytes(
      "89504e470d0a1a0a 0000000d 49484452 00000280 000001e0 0806000000")
    assert(MultimodalOps.decode(png) ==
      MultimodalOps.Sniffed("png", 640, 480, 1))
    val wav = hexBytes(
      "52494646 48000000 57415645" +
      "666d7420 10000000 0100 0200 44ac0000 10b10200 0400 1000" +
      "64617461 18000000" + "00" * 24)
    assert(MultimodalOps.decode(wav) ==
      MultimodalOps.Sniffed("wav", 44100, 2, 6))
    // unknown container → the clearly-marked stub, frames floor 1 kept
    val junk = Array.tabulate[Byte](64)(i => (i * 37).toByte)
    val (w, h, f) = MultimodalOps.decodeStub(junk)
    assert(MultimodalOps.decode(junk) ==
      MultimodalOps.Sniffed("unknown", w, h, f))
  }

  test("q40 features round trip: real parse + oracle-shaped checksum on " +
       "every doc (parquet run)") {
    val got = MultimodalOps.mmFeatures(spark, "/root/testdata/sf0.001")
      .collect()
    assert(got.length == 500)
    got.foreach { r =>
      val id = r.getLong(0)
      val (expTyp, expW, expH, expF) = (id % 4) match {
        case 0 => ("png", id % 640 + 1, id % 480 + 1, 1L)
        case 1 => ("gif", id % 640 + 1, id % 480 + 1, 1L)
        case 2 => ("wav", id % 40000 + 8000, id % 2 + 1, id % 25 + 1)
        case _ => ("jpeg", id % 640 + 1, id % 480 + 1, 1L)
      }
      assert(r.getString(1) == expTyp, s"doc $id")
      assert(r.getLong(3) == expW, s"doc $id width")
      assert(r.getLong(4) == expH, s"doc $id height")
      assert(r.getLong(5) == expF, s"doc $id frames")
      assert(r.getString(6).length == 32)
      // wav byte_len = 56-byte header+chunks + data body
      if (expTyp == "wav")
        assert(r.getLong(2) == 56 + expF * (id % 2 + 1) * 2, s"doc $id len")
    }
  }

  test("q45 construct→parse round trip inverts on every doc (parquet run)") {
    val got = MultimodalOps.mmSniff(spark, "/root/testdata/sf0.001")
      .collect()
    assert(got.length == 500)
    got.foreach { r =>
      val id = r.getLong(0)
      val expFmt = (id % 4) match {
        case 0 => "png"; case 1 => "gif"; case 2 => "wav"; case _ => "jpeg"
      }
      assert(r.getString(1) == expFmt, s"doc $id")
      if (expFmt == "wav") {
        assert(r.getLong(2) == id % 40000 + 8000)
        assert(r.getLong(3) == id % 2 + 1)
      } else {
        assert(r.getLong(2) == id % 640 + 1)
        assert(r.getLong(3) == id % 480 + 1)
      }
    }
  }
}
