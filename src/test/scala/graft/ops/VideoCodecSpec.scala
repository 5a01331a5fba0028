package graft.ops

import graft.SparkSpec

/** The video decode tier is REAL container semantics: a RIFF/AVI byte
  * stream (avih + strl headers, movi frame list, idx1 index) with
  * MPNG (PNG-compressed) frames parses back through the chunk walker
  * and the SAME ImageIO path as the image tier, recovering every
  * pixel of every frame exactly — header metadata (fps, dims, frame
  * count) included. Mirrors ImageCodec/AudioCodec coverage for the
  * third media kind; [[Multimodal.byteFold]] is now only the fallback
  * for kinds with no decoder at all.
  */
class VideoCodecSpec extends SparkSpec {

  test("AVI roundtrip recovers header metadata and exact frame pixels") {
    val (frames, w, h, fps) = (4, 8, 6, 25)
    for (id <- Seq(0L, 1L, 17L, 499L)) {
      val avi = Multimodal.testCardAvi(id, frames, w, h, fps)
      // a real RIFF/AVI container, not a bag of concatenated frames
      assert(new String(avi.slice(0, 4), "US-ASCII") == "RIFF")
      assert(new String(avi.slice(8, 12), "US-ASCII") == "AVI ")
      val v = Multimodal.parseAvi(avi).get
      assert(v.nFrames == frames)
      assert(v.fps == fps)
      assert(v.width == w)
      assert(v.height == h)
      assert(v.frames.length == frames)
      val stats = Multimodal.decodeVideoFrameStats(id, avi)
      assert(stats.length == frames)
      stats.zipWithIndex.foreach { case (s, f) =>
        assert(s.frame == f && s.width == w && s.height == h)
        // recompute the planted formula per channel
        val fid = Multimodal.frameImageId(id, f)
        val want = Multimodal.channelCoefs.map { c =>
          (for (y <- 0 until h; x <- 0 until w)
            yield (c._1 * fid + c._2 * x + c._3 * y + c._4) % 256).sum
        }
        assert(Seq(s.sum_r, s.sum_g, s.sum_b) == want)
      }
    }
  }

  test("MJPG AVI decodes through the same path within JPEG tolerance") {
    // the scaladoc claim under test: an MJPG-fourcc AVI (JPEG frame
    // payloads) parses and decodes through the IDENTICAL chunk-walk +
    // ImageIO path as the MPNG fixtures — only the per-pixel error
    // model changes (lossy DCT), so the oracle is a mean-error BOUND
    // against the planted formula instead of an exact sum match.
    val (frames, w, h, fps) = (4, 16, 12, 25)
    for (id <- Seq(0L, 11L, 499L)) {
      val jpegs = (0 until frames).map { f =>
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(
          Multimodal.testCardImage(Multimodal.frameImageId(id, f), w, h),
          "jpg", bos)
        bos.toByteArray
      }
      // real JPEG payloads (SOI marker), not PNGs in disguise
      jpegs.foreach(j =>
        assert((j(0) & 0xff) == 0xff && (j(1) & 0xff) == 0xd8))
      val avi = Multimodal.buildAvi(jpegs, w, h, fps, fourcc = "MJPG")
      val v = Multimodal.parseAvi(avi).get
      assert(v.nFrames == frames && v.fps == fps)
      assert(v.width == w && v.height == h)
      val stats = Multimodal.decodeVideoFrameStats(id, avi)
      assert(stats.length == frames, "every JPEG frame must decode")
      var sawLoss = false
      stats.zipWithIndex.foreach { case (s, f) =>
        assert(s.frame == f && s.width == w && s.height == h)
        val fid = Multimodal.frameImageId(id, f)
        val want = Multimodal.channelCoefs.map { c =>
          (for (y <- 0 until h; x <- 0 until w)
            yield ((c._1 * fid + c._2 * x + c._3 * y + c._4) % 256).toInt)
            .sum.toLong
        }
        // per-frame per-channel MEAN pixel error bound: the planted
        // card is a wrapping gradient (hard on DCT), so the bound is
        // loose in absolute terms but far below the signal range —
        // a swapped/missing/black frame is hundreds off per pixel
        val got = Seq(s.sum_r, s.sum_g, s.sum_b)
        got.zip(want).foreach { case (g, e) =>
          val meanErr = math.abs(g - e).toDouble / (w * h)
          assert(meanErr <= 24.0,
            s"id=$id frame=$f mean per-pixel error $meanErr > 24")
        }
        if (got != want) sawLoss = true
      }
      assert(sawLoss, "JPEG roundtrip should be measurably lossy " +
        "(exact equality would mean the PNG path was exercised instead)")
    }
  }

  test("parser handles junk, truncation and non-AVI RIFF cleanly") {
    assert(Multimodal.parseAvi(null).isEmpty)
    assert(Multimodal.parseAvi(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.parseAvi("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
    val avi = Multimodal.testCardAvi(3L, 3, 8, 8, 10)
    // truncated mid-frame: the walker stops at the broken chunk
    // instead of throwing; the header (if seen) still parses
    val cut = java.util.Arrays.copyOf(avi, avi.length / 2)
    Multimodal.parseAvi(cut).foreach { v =>
      assert(v.frames.length <= 3)
    }
  }

  test("sampleFrames re-emits a valid decimated AVI") {
    val media = Multimodal.syntheticVideos(
      sf("documents", "/root/testdata/sf0.001").limit(4), "doc_id",
      frames = 6, w = 8, h = 8, fps = 10)
    val out = Multimodal.sampleFrames(media, 3).collect()
    assert(out.length == 4)
    out.foreach { r =>
      val id = r.getLong(0)
      val v = Multimodal.parseAvi(r.getAs[Array[Byte]](1)).get
      assert(v.frames.length == 2) // every 3rd of 6
      assert(v.width == 8 && v.height == 8)
      // kept frames are the ORIGINAL encoded frames 0 and 3
      val stats = Multimodal.decodeVideoFrameStats(id,
        r.getAs[Array[Byte]](1))
      val wantIds = Seq(0, 3).map(Multimodal.frameImageId(id, _))
      val wantSumR = wantIds.map { fid =>
        val c = Multimodal.channelCoefs(0)
        (for (y <- 0 until 8; x <- 0 until 8)
          yield (c._1 * fid + c._2 * x + c._3 * y + c._4) % 256).sum
      }
      assert(stats.map(_.sum_r) == wantSumR)
    }
  }

  test("video features flow through the kind-dispatched extractor") {
    val media = Multimodal.syntheticVideos(
      sf("documents", "/root/testdata/sf0.001").limit(5), "doc_id",
      frames = 3, w = 8, h = 8, fps = 10)
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == 5)
    feats.foreach { f =>
      assert(f.features.length == 7) // [n, fps, w, h, mean r/g/b]
      assert(f.features(0) == 3f)
      assert(f.features(1) == 10f)
      assert(f.features(2) == 8f && f.features(3) == 8f)
    }
  }

  test("non-AVI payloads byte-fold (the documented fallback tier)") {
    val bytes = "definitely not a container".getBytes("UTF-8")
    assert(Multimodal.videoFeatures(9L, bytes)
      .sameElements(Multimodal.byteFold(bytes)))
  }
}
