package graft.ops

import graft.SparkSpec

/** The audio decode tier is REAL: a JDK-encoded WAV byte stream
  * parses back through `javax.sound.sampled` to exactly the PCM
  * samples the tone formula generated — header negotiation included.
  * Mirrors ImageCodec coverage for the second media kind.
  */
class AudioCodecSpec extends SparkSpec {

  test("WAV roundtrip recovers exact sample statistics") {
    val n = 64
    for (id <- Seq(0L, 1L, 17L, 499L)) {
      val wav = Multimodal.testToneWav(id, n)
      // a real RIFF/WAVE container, not a raw PCM dump
      assert(new String(wav.slice(0, 4), "US-ASCII") == "RIFF")
      assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
      val st = Multimodal.decodeAudioStats(id, wav).get
      val samples = (0 until n).map(Multimodal.toneSample(id, _))
      assert(st.n_samples == n)
      assert(st.sample_rate == Multimodal.toneSampleRate)
      assert(st.sum_amp == samples.map(_.toLong).sum)
      assert(st.sum_abs == samples.map(s => math.abs(s.toLong)).sum)
    }
  }

  test("undecodable and null payloads are dropped, not crashed") {
    assert(Multimodal.decodeAudioStats(1L, null).isEmpty)
    assert(Multimodal.decodeAudioStats(1L, Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.decodeAudioStats(1L,
      "not audio at all".getBytes("UTF-8")).isEmpty)
  }

  test("q86 matches a plain-Scala recomputation of the tone stats") {
    val ids = sf("documents", "/root/testdata/sf0.001")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val n = 1000
    val expected = ids.map { id =>
      val s = (0 until n).map(Multimodal.toneSample(id, _))
      val sabs = s.map(v => math.abs(v.toLong)).sum
      Seq[Any](id, n, Multimodal.toneSampleRate,
        s.map(_.toLong).sum, sabs,
        BigDecimal(sabs.toDouble / n)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assertSameRows(graft.queries.SimilarityQueries.q86
      .run(spark, "/root/testdata/sf0.001"), expected)
  }

  test("audio features flow through the kind-dispatched extractor") {
    val media = Multimodal.syntheticAudio(
      sf("documents", "/root/testdata/sf0.001").limit(5), "doc_id", 32)
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == 5)
    feats.foreach { f =>
      assert(f.features.length == 4) // [n, rate, mean, mean_abs]
      assert(f.features(0) == 32f)
      assert(f.features(1) == Multimodal.toneSampleRate.toFloat)
    }
  }
}
